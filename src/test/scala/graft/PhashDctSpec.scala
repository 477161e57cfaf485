package graft

import graft.functions.PhashDct
import org.scalatest.funsuite.AnyFunSuite

/** Exactness contracts of the fixed-point DCT-II pHash: the literal
  * coefficient table IS round(1024·cos(...)), the separable integer DCT
  * equals the direct quadratic definition bit-for-bit, and the signature
  * behaves like a frequency-domain hash (constant images hash to 0, bit
  * 63 is never set, bands reassemble). The oracle compare covers the
  * engine/DuckDB agreement; this covers the algorithm itself. */
class PhashDctSpec extends AnyFunSuite {

  test("literal table equals round(1024·cos(π(2x+1)u/32)) entry-for-entry") {
    for (u <- 0 until 8; x <- 0 until 16) {
      val exact = 1024.0 * StrictMath.cos(StrictMath.PI * (2 * x + 1) * u / 32.0)
      assert(math.abs(PhashDct.C(u)(x) - exact) <= 0.5 + 1e-9,
        s"C($u)($x)=${PhashDct.C(u)(x)} vs exact $exact")
    }
  }

  test("every non-DC basis row sums to exactly zero (symmetry-exact), " +
    "so constant images produce zero non-DC coefficients") {
    (1 until 8).foreach { u =>
      assert(PhashDct.C(u).sum === 0L, s"row $u sums to ${PhashDct.C(u).sum}")
    }
  }

  test("separable dct8x8 equals the direct quadratic DCT definition " +
    "bit-for-bit on a deterministic pseudo-random pixel block") {
    // integer LCG so the block is reproducible without Math.random
    var seed = 12345L
    val p = Array.fill(256) {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      ((seed >>> 33) % 4096L)
    }
    val sep = PhashDct.dct8x8(p)
    for (u <- 0 until 8; v <- 0 until 8) {
      var direct = 0L
      for (x <- 0 until 16; y <- 0 until 16)
        direct += PhashDct.C(u)(x) * PhashDct.C(v)(y) * p(16 * x + y)
      assert(sep(8 * u + v) === direct, s"F($u)($v)")
    }
  }

  test("impulse image: F(u)(v) = C(u)(0)·C(v)(0)") {
    val p = new Array[Long](256); p(0) = 1L
    val f = PhashDct.dct8x8(p)
    for (u <- 0 until 8; v <- 0 until 8)
      assert(f(8 * u + v) === PhashDct.C(u)(0) * PhashDct.C(v)(0))
  }

  test("constant payloads hash to signature 0 (all spectral mass in DC)") {
    // payload length a multiple of 256, so every pixel stripe sums the
    // same number of identical bytes — a genuinely constant image
    Seq(0x20, 0x41, 0xff).foreach { b =>
      val content = Array.fill(1024)(b.toByte)
      assert(PhashDct.phash(content) === 0L, s"byte $b")
    }
  }

  test("signatures are non-negative (63 bits) and 8-bit bands " +
    "reassemble the signature") {
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "a" * 300, "pHash DCT fixed point", "x y z " * 100)
    texts.foreach { t =>
      val sig = PhashDct.phash(t.getBytes("UTF-8"))
      assert(sig >= 0L, s"bit 63 set for '$t'")
      val reassembled = (0 until 8).map { i =>
        ((sig >> (i * 8)) & 0xffL) << (i * 8)
      }.reduce(_ | _)
      assert(reassembled === sig)
    }
  }

  test("signature discriminates: perturbing one byte of a structured " +
    "payload moves few bits; unrelated payloads move many") {
    val base = ("lorem ipsum dolor sit amet " * 40).getBytes("UTF-8")
    val near = base.clone(); near(3) = 'X'.toByte
    val far = ("completely different content 0123456789 " * 30)
      .getBytes("UTF-8")
    val s0 = PhashDct.phash(base)
    val sNear = PhashDct.phash(near)
    val sFar = PhashDct.phash(far)
    val hamNear = java.lang.Long.bitCount(s0 ^ sNear)
    val hamFar = java.lang.Long.bitCount(s0 ^ sFar)
    assert(hamNear < hamFar,
      s"near=$hamNear should be < far=$hamFar")
    assert(hamNear <= 8, s"one-byte perturbation moved $hamNear bits")
    assert(hamFar >= 10, s"unrelated payloads only $hamFar bits apart")
  }

  test("pigeonhole: any two signatures at hamming ≤ 7 share at least " +
    "one of the 8 8-bit bands") {
    val sig = PhashDct.phash(("abc def ghi " * 50).getBytes("UTF-8"))
    // flip every 7-subset drawn from one spread position per band (the
    // worst case for band survival: flips land in 7 DISTINCT bands,
    // leaving exactly one untouched), plus denser same-band subsets
    val perBand = Seq(0, 9, 18, 27, 36, 45, 54, 62)
    perBand.combinations(7).foreach { flips =>
      val other = flips.foldLeft(sig)((s, b) => s ^ (1L << b))
      val shared = (0 until 8).exists { i =>
        ((sig >> (i * 8)) & 0xffL) == ((other >> (i * 8)) & 0xffL)
      }
      assert(shared, s"no shared band flipping bits $flips")
    }
    // 7 flips concentrated in 2 bands leave 6 bands untouched
    val dense = Seq(0, 1, 2, 3, 9, 10, 11)
    val other = dense.foldLeft(sig)((s, b) => s ^ (1L << b))
    assert((0 until 8).count { i =>
      ((sig >> (i * 8)) & 0xffL) == ((other >> (i * 8)) & 0xffL)
    } === 6)
  }
}
