package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Properties of the hashing/similarity primitives that back the dedup and
  * ANN operators (the DuckDB oracle checks exact values; these check the
  * algebraic properties that make them correct sketches). */
class TextFunctionsSpec extends SparkSpecBase {

  import spark.implicits._

  test("md5Long is deterministic and 60-bit non-negative") {
    val rows = Seq("a", "b", "hello world", "")
      .toDF("s").select(md5Long(col("s")).as("h")).collect().map(_.getLong(0))
    assert(rows.forall(h => h >= 0 && h < (1L << 60)))
    assert(rows.distinct.length === rows.length)
    val again = Seq("a").toDF("s")
      .select(md5Long(col("s"))).collect()(0).getLong(0)
    assert(again === rows(0))
  }

  test("shingles: correct count, short docs yield empty") {
    val df = Seq("a b c d", "a b").toDF("t")
      .select(size(shingles(words(col("t")), 3)).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(2, 0))
  }

  test("topElementCount: run-length device matches the quadratic count") {
    val docs = Seq(
      "a", "a a", "a b a b a", "x y z", "b b b b",
      "the cat the dog the bird the",
      (1 to 50).map(i => s"w${i % 7}").mkString(" "),
      (1 to 200).map(i => s"t${i % 3}").mkString(" "))
    val df = docs.toDF("t").select(
      topElementCount(words(col("t"))).as("fast"),
      array_max(transform(array_distinct(words(col("t"))),
        x => size(filter(words(col("t")), w => w === x))))
        .cast("long").as("slow"))
    df.collect().foreach(r => assert(r.getLong(0) === r.getLong(1), docs))
    // empty input: NULL, matching array_max over an empty distinct set
    val e = Seq("").toDF("t")
      .select(topElementCount(array().cast("array<string>"))).collect()
    assert(e(0).isNullAt(0))
  }

  test("minhash: identical sets -> identical signatures; estimate tracks jaccard") {
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17 w18 w19 w20"
    val df = Seq(
      (1L, a), (2L, a),                                  // jaccard 1
      (3L, a.replace("w20", "x20").replace("w19", "x19")) // high overlap
    ).toDF("id", "t")
      .select(col("id"), minHashSignature(shingleHashes(col("t"), 3), 16).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L))
    val matches13 = sigs(1L).zip(sigs(3L)).count { case (x, y) => x === y }
    // true jaccard(1,3): 18 shingles, 14 shared, 22 union ~ 0.64
    assert(matches13 > 4 && matches13 < 16,
      s"minhash estimate should be between 0 and 1 exclusive: $matches13/16")
  }

  test("lsh bands: identical docs always collide in every band") {
    val a = "q r s t u v w x y z"
    val df = Seq((1L, a), (2L, a)).toDF("id", "t")
      .select(col("id"),
        bandKeys(minHashSignature(shingleHashes(col("t"), 2), 16), 4, 4)
          .as("bands"))
    val bands = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(bands(1L) === bands(2L))
  }

  test("simhash: identical texts at hamming 0, disjoint texts differ") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa lambda"))
      .toDF("id", "t")
      .select(col("id"), simHashText(col("t"), 16).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
    val ham = Seq((sigs(1L), sigs(3L))).toDF("a", "b")
      .select(hamming(col("a"), col("b"))).collect()(0).getInt(0)
    assert(ham > 0 && ham <= 16)
  }

  test("jaccard: exact on known sets") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(2L, 3L, 4L))).toDF("a", "b")
      .select(jaccard(col("a"), col("b")).as("j"))
    assert(df.collect()(0).getDouble(0) === 0.5) // |{2,3}| / |{1,2,3,4}|
  }

  test("native expressions are bit-identical to the HOF formulations") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    val cmp = df.select(
      shingleHashes(col("text"), 3).as("n_sh"),
      shingleHashesHof(col("text"), 3).as("h_sh"),
      minHashSignature(shingleHashes(col("text"), 3), 16).as("n_sig"),
      minHashSignatureHof(shingleHashesHof(col("text"), 3), 16).as("h_sig"),
      simHashText(col("text"), 16).as("n_sim"),
      simHashHof(transform(words(col("text")), w => md5Long(w)), 16)
        .as("h_sim"))
    val bad = cmp.filter(col("n_sh") =!= col("h_sh")
      || col("n_sig") =!= col("h_sig") || col("n_sim") =!= col("h_sim"))
    assert(bad.count() === 0)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(20).select(col("embedding").as("a"), col("embedding").as("b"))
    val badDot = e.filter(dot(col("a"), col("b")) =!= dotHof(col("a"), col("b")))
    assert(badDot.count() === 0)
  }

  test("VecDotLong matches the zip_with/aggregate fold") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(30)
      .select(transform(col("embedding"),
        x => (x * 100).cast("long")).as("a"))
      .withColumn("b", reverse(col("a")))
    val bad = df.filter(dotLong(col("a"), col("b")) =!=
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), _ + _))
    assert(bad.count() === 0)
  }

  test("WinnowedFps native matches the HOF winnow, incl. degenerate docs") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(60).select(col("text"))
      .union(spark.createDataFrame(Seq(
        Tuple1(""), Tuple1("one"), Tuple1("a b c"), Tuple1("a b c d"),
        Tuple1("w w w w w w w w w w w w"))).toDF("text"))
    val cmp = df.select(
      winnowedFps(col("text"), 4, 8).as("n"),
      winnowedFpsHof(col("text"), 4, 8).as("h"))
    val bad = cmp.filter(
      col("n.n_kgrams") =!= col("h.n_kgrams")
        || size(col("n.fps")) =!= size(col("h.fps"))
        || col("n.fps") =!= col("h.fps"))
    assert(bad.count() === 0)
  }

  test("SQL-registered functions match the Column API bit-for-bit") {
    graft.functions.GraftExtensions.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_shingle_hashes(text, 3) AS sh,
        |  graft_minhash(graft_shingle_hashes(text, 3), 16) AS sig,
        |  graft_simhash(text, 16) AS sim
        |FROM ext_docs""".stripMargin)
    val viaCol = docs.select(col("doc_id"),
      shingleHashes(col("text"), 3).as("sh"),
      minHashSignature(shingleHashes(col("text"), 3), 16).as("sig"),
      simHashText(col("text"), 16).as("sim"))
    assert(viaSql.exceptAll(viaCol).count() === 0)
    assert(viaCol.exceptAll(viaSql).count() === 0)
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(10)
    embs.createOrReplaceTempView("ext_embs")
    val d1 = spark.sql(
      "SELECT graft_vec_dot(embedding, embedding) AS d FROM ext_embs")
      .collect().map(_.getDouble(0)).toSeq
    val d2 = embs.select(dot(col("embedding"), col("embedding")).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    assert(d1 === d2)
    // hamming + cosine compositions
    val h1 = spark.sql(
      """SELECT graft_hamming(graft_simhash(text, 16), 0L) AS h
        |FROM ext_docs""".stripMargin)
      .collect().map(_.getInt(0)).toSeq
    val h2 = docs.select(
      hamming(simHashText(col("text"), 16), lit(0L)).as("h"))
      .collect().map(_.getInt(0)).toSeq
    assert(h1 === h2)
    val c1 = spark.sql(
      "SELECT graft_cosine(embedding, embedding) AS c FROM ext_embs")
      .collect().map(_.getDouble(0)).toSeq
    val c2 = embs.select(cosine(col("embedding"), col("embedding")).as("c"))
      .collect().map(_.getDouble(0)).toSeq
    assert(c1 === c2)
    // z-order interleave: SQL vs Column, plus known bit patterns
    val z1 = spark.sql(
      "SELECT graft_zvalue(doc_id, n_chars, 21) AS z FROM ext_docs")
      .collect().map(_.getLong(0)).toSeq
    val z2 = docs.select(graft.functions.GraftExtensions
        .zvalue(col("doc_id"), col("n_chars"), 21).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(z1 === z2)
    def zRef(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L)((acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
    val pat = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (1048575L, 7L))
      .toDF("a", "b")
      .select(graft.functions.GraftExtensions
        .zvalue(col("a"), col("b"), 21).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(pat === Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (1048575L, 7L))
      .map { case (a, b) => zRef(a, b, 21) })
  }

  test("cosine: orthogonal -> 0, identical -> 1, antiparallel -> -1") {
    val df = Seq(
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(1f, 2f), Seq(1f, 2f)),
      (Seq(1f, 0f), Seq(-1f, 0f)))
      .toDF("a", "b").select(cosine(col("a"), col("b")).as("c"))
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(0.0, 1.0, -1.0))
  }

  test("simhash banding at 64-bit/4x16 is lossless for hamming <= 3 (pigeonhole)") {
    // the corpus-scale config dedup_simhash documents: banded candidate
    // generation must find EXACTLY the brute-force ham<=3 pair set
    val rnd = new scala.util.Random(42)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    // clusters of near-identical docs (1-word mutations) → many close pairs
    val docs = (0 until 30).flatMap { c =>
      val base = Vector.fill(12)(words(rnd.nextInt(words.size)))
      (0 until 3).map { i =>
        val d = if (i == 0) base
          else base.updated(rnd.nextInt(base.size), words(rnd.nextInt(words.size)))
        (c * 3 + i).toLong -> d.mkString(" ")
      }
    }
    val bits = 64; val bandCount = 4; val bandBits = bits / bandCount
    val sigs = docs.toDF("doc_id", "text")
      .select(col("doc_id"), simHashText(col("text"), bits).as("sig"))
      .cache()
    val brute = sigs.as("a").join(sigs.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .filter(hamming(col("a.sig"), col("b.sig")) <= 3)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture must produce close pairs")
    val bandVals = array((0 until bandCount).map { i =>
      shiftright(col("sig"), i * bandBits)
        .bitwiseAND(lit((1L << bandBits) - 1))
    }: _*)
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(bandVals).as(Seq("band", "bv")))
    val viaBands = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        col("a.sig").as("sa"), col("b.sig").as("sb")).distinct()
      .filter(hamming(col("sa"), col("sb")) <= 3)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaBands === brute)
  }

  test("dedup_simhash production config: 32,768 buckets per band, spread") {
    // regression for the round-3 scale finding: a 16-bit sig with 4-bit
    // bands gave 16 buckets per band → ~O(n²/16) self-join at corpus
    // scale. The production config must keep the band domain wide and the
    // signatures must actually occupy the high bits.
    import graft.queries.DedupQueries
    val bandBits = DedupQueries.SimHashBits / DedupQueries.SimHashBands
    assert(DedupQueries.SimHashBits === 60) // full shared md5Long60 entropy
    assert(1 << bandBits === 32768, s"band domain collapsed to ${1 << bandBits}")
    // 200 distinct one-word docs: band values must scatter across the
    // domain (≫ the 16 buckets of the old config) in EVERY band, including
    // the top band (bits 45-59 — constant there would mean dead width)
    val docs = (0 until 200).map(i => i.toLong -> s"tok$i").toDF("id", "text")
    val sigs = docs.select(col("id"),
      simHashText(col("text"), DedupQueries.SimHashBits).as("sig"))
    val perBand = (0 until DedupQueries.SimHashBands).map { i =>
      sigs.select(shiftright(col("sig"), i * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1)).as("bv"))
        .distinct().count()
    }
    perBand.foreach(n => assert(n > 150, s"band bucket spread too low: $perBand"))
  }
}
