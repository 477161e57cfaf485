package graft.functions

/**
 * Integer-exact fixed-point DCT-II perceptual hash (pHash) — the REAL
 * frequency-domain signature (Zauner 2010, "Implementation and
 * Benchmarking of Perceptual Image Hash Functions"; same construction as
 * pHash.org's DCT hash), replacing the round-≤11 stripe-threshold STUB:
 *
 *   1. the decoded 16×16 grayscale image (here: the stub codec's
 *      byte-stripe "decode" — pixel (x,y) = sum of payload bytes at
 *      positions ≡ 16·x+y (mod 256); a real image decoder would hand a
 *      rescaled 16×16 luma block to the SAME entry point),
 *   2. a separable 2-D DCT-II restricted to the 8×8 LOW-FREQUENCY block
 *      (the only coefficients the signature reads, so only 8 of 16
 *      output frequencies are ever computed per axis),
 *   3. bit k = 8·u+v−1 (the 63 non-DC coefficients) set iff
 *      F[u][v]·63 > Σ non-DC F — the classic mean-threshold, integer
 *      cross-multiplied so no division ever happens.
 *
 * EXACTNESS ACROSS ENGINES: the DCT basis is a fixed-point LITERAL table
 * (round(1024·cos(π·(2x+1)·u/32)), hardcoded below — the same
 * driver-literal device the nDCG and RVQ-codebook queries use). Both the
 * JVM signature and the DuckDB oracle ([[sqlCoeffLiteral]]) read the SAME
 * 128 integers, and every downstream operation is int64 +/·/>, which is
 * associative and engine-independent — so signatures agree bit-for-bit
 * with no floating-point anywhere. Overflow audit: pixel ≤ 255·⌈L/256⌉,
 * |rowDCT| ≤ 16·1024·pix, |F| ≤ 16²·1024²·pix ≈ 2.7e8·pix, and the
 * cross-multiplied threshold ≤ 63·|F| — int64-safe for payloads up to
 * ~5·10⁸ bytes.
 */
object PhashDct {
  /** Fixed-point scale of the DCT basis (2¹⁰). */
  val Scale = 1024L

  /** C(u)(x) = round(1024·cos(π·(2x+1)·u/32)), u ∈ [0,8), x ∈ [0,16):
    * the first 8 frequency rows of the 16-point DCT-II basis. LITERAL —
    * PhashDctSpec re-derives every entry from StrictMath.cos. */
  val C: Array[Array[Long]] = Array(
    Array(1024, 1024, 1024, 1024, 1024, 1024, 1024, 1024,
      1024, 1024, 1024, 1024, 1024, 1024, 1024, 1024),
    Array(1019, 980, 903, 792, 650, 483, 297, 100,
      -100, -297, -483, -650, -792, -903, -980, -1019),
    Array(1004, 851, 569, 200, -200, -569, -851, -1004,
      -1004, -851, -569, -200, 200, 569, 851, 1004),
    Array(980, 650, 100, -483, -903, -1019, -792, -297,
      297, 792, 1019, 903, 483, -100, -650, -980),
    Array(946, 392, -392, -946, -946, -392, 392, 946,
      946, 392, -392, -946, -946, -392, 392, 946),
    Array(903, 100, -792, -980, -297, 650, 1019, 483,
      -483, -1019, -650, 297, 980, 792, -100, -903),
    Array(851, -200, -1004, -569, 569, 1004, 200, -851,
      -851, 200, 1004, 569, -569, -1004, -200, 851),
    Array(792, -483, -980, 100, 1019, 297, -903, -650,
      650, 903, -297, -1019, -100, 980, 483, -792))

  /** The 16×16 "decoded" pixel block of a payload: pixel j = sum of the
    * unsigned bytes at positions ≡ j (mod 256) — the byte-stripe decode
    * stand-in (a real codec would rescale actual luma here). */
  def pixels(content: Array[Byte]): Array[Long] = {
    val p = new Array[Long](256)
    var i = 0
    while (i < content.length) {
      p(i % 256) += (content(i) & 0xff).toLong
      i += 1
    }
    p
  }

  /** The 8×8 low-frequency DCT-II block of a 16×16 pixel array (row-major
    * flat, 256 entries), separable: rows first, then columns. Returns the
    * 64 coefficients flat as F(8·u+v). */
  def dct8x8(p: Array[Long]): Array[Long] = {
    require(p.length == 256, s"dct8x8: expected 256 pixels, got ${p.length}")
    // row pass: r(x)(v) = Σ_y C(v)(y)·p(16x+y) — 16 rows × 8 freqs
    val r = Array.ofDim[Long](16, 8)
    var x = 0
    while (x < 16) {
      var v = 0
      while (v < 8) {
        var s = 0L; var y = 0
        while (y < 16) { s += C(v)(y) * p(16 * x + y); y += 1 }
        r(x)(v) = s; v += 1
      }
      x += 1
    }
    // column pass: F(u)(v) = Σ_x C(u)(x)·r(x)(v) — 8×8 block
    val f = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L; var xx = 0
        while (xx < 16) { s += C(u)(xx) * r(xx)(v); xx += 1 }
        f(8 * u + v) = s; v += 1
      }
      u += 1
    }
    f
  }

  /** 63-bit signature: bit 8u+v−1 set iff F[u][v]·63 > Σ non-DC F. The
    * DC coefficient (u=v=0) carries only overall brightness and is
    * excluded, as in every published pHash; all 63 signature bits sit in
    * int64 positions 0..62, so signatures are non-negative in BOTH
    * engines and 16-bit banding needs no sign handling. */
  def phash(content: Array[Byte]): Long = {
    val f = dct8x8(pixels(content))
    var tot = 0L
    var k = 1
    while (k < 64) { tot += f(k); k += 1 }
    var sig = 0L
    k = 1
    while (k < 64) {
      if (f(k) * 63L > tot) sig |= 1L << (k - 1)
      k += 1
    }
    sig
  }

  /** The SAME 128 coefficients as a DuckDB flat list literal (row-major,
    * dct[16u+x+1] = C(u)(x) under 1-based list indexing) — the oracle
    * side of the driver-literal device. */
  def sqlCoeffLiteral: String =
    C.flatten.mkString("[", ", ", "]")
}
