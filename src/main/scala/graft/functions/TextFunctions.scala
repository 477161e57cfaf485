package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge.{column => exprCol, expression => colExpr}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Text / hashing / vector-similarity building blocks for the training-data
 * pipeline operators (dedup, ANN, quality scoring). Everything is composed
 * from `org.apache.spark.sql.functions` — whole-stage-codegen'd Catalyst
 * expressions, no UDFs — and every hash is derived from MD5 so the DuckDB
 * oracle can recompute bit-identical values in SQL.
 *
 * Determinism rules shared with the oracles:
 *  - 60-bit string hash = first 15 hex chars of md5 (fits positive INT64).
 *  - MinHash permutations h_i(x) = (a_i * (x mod P) + b_i) mod P with
 *    P = 2^31 - 1; a_i < 2^31 so the product stays inside INT64.
 *  - All cross-row float reductions are either avoided, exact (integers /
 *    decimals), or sequentially folded in the same order on both engines.
 */
object TextFunctions {

  /** Mersenne prime 2^31-1 — the MinHash/LSH modulus. */
  val P: Long = 2147483647L

  /** Fixed MinHash permutation coefficients (index i): a_i odd, < 2^31. */
  val MinHashA: Seq[Long] = Seq(
    1000000007L, 1000000033L, 1000000087L, 1000000093L,
    1000000097L, 1000000103L, 1000000123L, 1000000181L,
    1000000207L, 1000000223L, 1000000241L, 1000000271L,
    1000000289L, 1000000297L, 1000000321L, 1000000349L)
  val MinHashB: Seq[Long] = Seq(
    12345L, 23456L, 34567L, 45678L, 56789L, 67890L, 78901L, 89012L,
    90123L, 13579L, 24680L, 35791L, 46802L, 57913L, 68024L, 79135L)

  /** 60-bit deterministic string hash, identical in DuckDB:
    * `CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)`. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Whitespace tokenization (documents are single-spaced; `\s+` keeps the
    * semantics total). DuckDB mirror: `string_split_regex(text, '\s+')`. */
  def words(text: Column): Column = split(trim(text), "\\s+")

  /** Shared stopword set for the quality score (and the lang heuristics
    * that reuse it). ONE definition — every consumer of the quality
    * signal (text_quality_score, top-p selection, the dedup cross-signal
    * audit) must cross-tabulate the SAME score or its conclusion is about
    * a different quantity. */
  val qualityStopwords: Seq[String] = Seq("the", "a", "of", "to", "and")

  /** The suite's document quality score: 0.5·stopword-ratio +
    * 0.5·min(n_words/50, 1), rounded 6 dp — single-division doubles of
    * exact integers, bit-identical in DuckDB via [[sqlQualityScore]]. */
  def qualityScore(text: Column): Column = {
    val ws = words(text)
    val nWords = size(ws).cast(LongType)
    val nStop = size(filter(ws, w => w.isInCollection(qualityStopwords)))
      .cast(LongType)
    val stopRatio = nStop.cast(DoubleType) / nWords.cast(DoubleType)
    val lenScore = least(nWords.cast(DoubleType) / lit(50.0d), lit(1.0d))
    round(lit(0.5d) * stopRatio + lit(0.5d) * lenScore, 6)
  }

  /** The suite's shared int8 quantization contract — ONE definition of
    * floor(x·127/scale + 0.5) so the rounding rule and the 127 bound
    * cannot silently fork between the PQ pipeline, the embedding stats,
    * the outlier filter, the class centroids, the streaming IVF index and
    * the SQ8 search. `scale` is the corpus-wide max-abs (a broadcast
    * scalar column or literal). */
  def quantizeInt8(x: Column, scale: Column): Column =
    floor(x.cast(DoubleType) * lit(127.0d) / scale + lit(0.5d))
      .cast(LongType)

  /** [[quantizeInt8]] over a whole ARRAY<FLOAT> embedding. */
  def quantizeInt8Vec(embedding: Column, scale: Column): Column =
    transform(embedding, x => quantizeInt8(x, scale))

  /** DuckDB mirror of [[qualityScore]]. */
  def sqlQualityScore(text: String): String = {
    val ws = sqlWords(text)
    val nWords = s"CAST(len($ws) AS BIGINT)"
    val nStop = s"CAST(len(list_filter($ws, w -> w IN " +
      qualityStopwords.mkString("('", "','", "')") + ")) AS BIGINT)"
    val stopRatio = s"(CAST($nStop AS DOUBLE) / CAST($nWords AS DOUBLE))"
    val lenScore = s"least(CAST($nWords AS DOUBLE) / 50.0, 1.0)"
    s"round(0.5 * $stopRatio + 0.5 * $lenScore, 6)"
  }

  /** Count of the most frequent element of `ws` — the Gopher
    * top-unigram statistic — in O(n log n): sort, then ONE run-length
    * fold tracking (previous element, current run, best run). The
    * obvious `transform(array_distinct(ws), x -> count of x)` is
    * O(n · distinct) per document — quadratic on repetitive documents,
    * exactly the ones this statistic exists to catch. NULL on an empty
    * array, matching `list_max`/`array_max` over an empty distinct set
    * so both engines agree on degenerate docs. */
  def topElementCount(ws: Column): Column = when(size(ws) > 0,
    aggregate(
      array_sort(ws),
      struct(lit(null).cast(StringType).as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + lit(1L)).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best")))

  /** Word k-shingles joined with spaces. Spark `sequence(0, n)` descends for
    * n < 0, so short docs short-circuit to an empty array.
    * DuckDB: `list_transform(range(len(w)-k+1), i -> array_to_string(w[i+1:i+k],' '))`. */
  def shingles(ws: Column, k: Int): Column =
    when(size(ws) < k, array().cast(ArrayType(StringType)))
      .otherwise(transform(
        sequence(lit(0), size(ws) - k),
        i => concat_ws(" ", slice(ws, i + 1, lit(k)))))

  /** Distinct shingle hash set — the MinHash/Jaccard input universe.
    * Native expression ([[ShingleMd5Hashes]]); [[shingleHashesHof]] is the
    * bit-identical functions-only formulation it is property-tested against. */
  def shingleHashes(text: Column, k: Int): Column =
    exprCol(ShingleMd5Hashes(colExpr(text), k))

  def shingleHashesHof(text: Column, k: Int): Column =
    array_distinct(transform(shingles(words(text), k), s => md5Long(s)))

  /** Winnowed fingerprints: struct(n_kgrams, fps) — the distinct
    * min-in-w-window selections over the positional k-shingle hash
    * sequence. Native ([[WinnowedFps]]); [[winnowedFpsHof]] is the
    * bit-identical functions-only twin it is property-tested against. */
  def winnowedFps(text: Column, k: Int, w: Int): Column =
    exprCol(WinnowedFps(colExpr(text), k, w))

  /** Exact integer dot of two ARRAY<LONG> columns (native [[VecDotLong]];
    * equals the zip_with/aggregate fold bit-for-bit). */
  def dotLong(a: Column, b: Column): Column =
    exprCol(VecDotLong(colExpr(a), colExpr(b)))

  def winnowedFpsHof(text: Column, k: Int, w: Int): Column = {
    val hs = transform(shingles(words(text), k), s => md5Long(s))
    val n = size(hs)
    val m = greatest(n - lit(w - 1), lit(1))
    struct(
      n.cast(LongType).as("n_kgrams"),
      when(n >= 1, array_distinct(transform(sequence(lit(0), m - 1),
          i => array_min(slice(hs, i + 1, lit(w))))))
        .otherwise(array().cast(ArrayType(LongType))).as("fps"))
  }

  /** MinHash signature (numHashes ≤ 16): per permutation, the minimum of
    * h_i over the element hash set. Empty sets hash to P (sentinel).
    * Native ([[MinHashSig]]); HOF twin below. */
  def minHashSignature(hashes: Column, numHashes: Int): Column =
    exprCol(MinHashSig(colExpr(hashes), numHashes))

  def minHashSignatureHof(hashes: Column, numHashes: Int): Column = {
    val sigs = (0 until numHashes).map { i =>
      val a = MinHashA(i); val b = MinHashB(i)
      coalesce(
        array_min(transform(hashes, h => (lit(a) * (h % P) + b) % P)),
        lit(P))
    }
    array(sigs: _*)
  }

  /** LSH band key: fold `rowsPerBand` consecutive signature entries into one
    * 60-bit value (sequential `acc*31+v mod 2^60` — same fold in DuckDB via
    * `list_reduce`). `sig` is 0-indexed via element_at(i+1).
    *
    * The default modulus never engages below rowsPerBand = 5 (the fold
    * grows like P·31^(r−1) < 2^60), so acc·31 stays inside int64. Wider
    * bands MUST pass a smaller modulus (2^55 keeps acc·31 + v < 2^63 for
    * any r) or the fold overflows int64 in BOTH engines before the first
    * reduction — the band sweep's 2×8 layout uses 2^55. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int,
      modulus: Long = 1152921504606846976L): Column = {
    val keys = (0 until bands).map { b =>
      (0 until rowsPerBand).foldLeft(lit(0L)) { (acc, r) =>
        (acc * 31 + element_at(sig, b * rowsPerBand + r + 1)) % modulus
      }
    }
    array(keys: _*)
  }

  /** Exact Jaccard of two pre-distinct arrays (|∩| / |∪|), as DOUBLE from an
    * exact integer ratio. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(1.0d))
      .otherwise(size(array_intersect(a, b)).cast(DoubleType) /
        size(array_union(a, b)).cast(DoubleType))

  /** `bits`-bit SimHash over a text's word-hash multiset: bit j set iff the
    * count of tokens with bit j set exceeds half the token count (the ±1-sum
    * sign test, computed in exact integer arithmetic).
    * Native ([[SimHashText]]); HOF twin takes the hash array. */
  def simHashText(text: Column, bits: Int): Column =
    exprCol(SimHashText(colExpr(text), bits))

  def simHashHof(hashes: Column, bits: Int): Column = {
    val n = size(hashes)
    (0 until bits).map { j =>
      val onesJ = aggregate(hashes, lit(0L),
        (acc, h) => acc + shiftright(h, j).bitwiseAND(1L))
      when(onesJ * 2 > n.cast(LongType), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two small integer bit-sets. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Sequential-fold dot product of two numeric vectors in DOUBLE — the same
    * left fold as DuckDB `list_reduce(list_transform(...), (a,b)->a+b)`,
    * so results are bit-identical across engines.
    * Native ([[VecDot]]); HOF twin below. */
  def dot(a: Column, b: Column): Column = exprCol(VecDot(colExpr(a), colExpr(b)))

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, rounded to 6 dp to absorb any last-ulp risk at the
    * comparison layer (the fold itself is order-identical on both engines). */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** Cosine with per-side norms precomputed BEFORE a join: each candidate
    * pair costs one fold instead of three. Bit-identical to [[cosine]] —
    * the norm fold is deterministic regardless of where it runs. */
  def cosineHoisted(a: Column, b: Column, na: Column, nb: Column): Column =
    round(dot(a, b) / (na * nb), 6)

  // ---------------------------------------------------------------- oracle
  // SQL fragments mirroring the above for the DuckDB side. Each takes SQL
  // expressions (column names / subexpressions) and returns a SQL string.

  def sqlMd5Long(x: String): String =
    s"CAST(concat('0x', substr(md5($x), 1, 15)) AS BIGINT)"

  def sqlWords(text: String): String =
    s"string_split_regex(trim($text), '\\s+')"

  def sqlShingles(ws: String, k: Int): String =
    s"list_transform(range(0, greatest(len($ws)-${k - 1}, 0)), " +
      s"i -> array_to_string($ws[i+1:i+$k], ' '))"

  def sqlShingleHashes(text: String, k: Int): String =
    s"list_distinct(list_transform(${sqlShingles(sqlWords(text), k)}, " +
      s"s -> ${sqlMd5Long("s")}))"

  def sqlMinHashSignature(hashes: String, numHashes: Int): String = {
    val sigs = (0 until numHashes).map { i =>
      s"coalesce(list_min(list_transform($hashes, " +
        s"h -> (${MinHashA(i)} * (h % $P) + ${MinHashB(i)}) % $P)), $P)"
    }
    sigs.mkString("[", ", ", "]")
  }

  def sqlBandKeys(sig: String, bands: Int, rowsPerBand: Int,
      modulus: Long = 1152921504606846976L): String = {
    val keys = (0 until bands).map { b =>
      (0 until rowsPerBand).foldLeft("CAST(0 AS BIGINT)") { (acc, r) =>
        s"(($acc * 31 + $sig[${b * rowsPerBand + r + 1}]) % $modulus)"
      }
    }
    keys.mkString("[", ", ", "]")
  }

  def sqlJaccard(a: String, b: String): String =
    s"(CASE WHEN len(list_distinct(list_concat($a, $b))) = 0 THEN 1.0 " +
      s"ELSE CAST(len(list_intersect($a, $b)) AS DOUBLE) / " +
      s"CAST(len(list_distinct(list_concat($a, $b))) AS DOUBLE) END)"

  def sqlSimHash(hashes: String, bits: Int): String =
    (0 until bits).map { j =>
      s"(CASE WHEN 2 * list_sum(list_transform($hashes, " +
        s"h -> (h >> $j) & 1)) > len($hashes) " +
        s"THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
    }.mkString("(", " + ", ")")

  def sqlDot(a: String, b: String, dim: Int): String =
    s"list_reduce(list_transform(range(1, ${dim + 1}), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x,y) -> x+y)"

  def sqlCosine(a: String, b: String, dim: Int): String =
    s"round(${sqlDot(a, b, dim)} / (sqrt(${sqlDot(a, a, dim)}) * " +
      s"sqrt(${sqlDot(b, b, dim)})), 6)"
}
