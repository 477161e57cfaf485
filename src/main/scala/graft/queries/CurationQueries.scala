package graft.queries

import graft.functions.TextFunctions._
import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Corpus-curation operators — the filtering/selection passes a training-data
 * pipeline runs between raw ingest and tokenization:
 *
 *  - benchmark DECONTAMINATION (drop training docs that overlap an eval set),
 *  - Gopher-style REPETITION filtering (drop degenerate/repetitive docs),
 *  - BOILERPLATE detection (n-grams shared across many documents),
 *  - MIXTURE resampling (subsample strata to hit a target language mix).
 *
 * All scores are exact integer arithmetic (or a single double division of
 * exact integers), so the DuckDB oracle reproduces them bit-for-bit. Scale
 * shapes: repetition is a pure map; decontamination is a map + broadcast
 * semi-join against the (small) eval-set index; boilerplate is one
 * inverted-index shuffle whose hot set is tiny; mixture is a 5-row aggregate
 * broadcast back onto a pure map.
 */
object CurationQueries {

  /** Eval-set membership for decontamination: ~1% of the corpus stands in
    * for the benchmark suite. Deterministic, derivable on both engines. */
  private val evalPred = "doc_id % 97 = 0"

  /** Language mixture targets (numerators out of 10) for `sample_mixture`. */
  private val mixWeights = Seq("en" -> 4L, "de" -> 2L, "es" -> 2L,
    "fr" -> 1L, "zh" -> 1L)

  def defs: Map[String, QueryDef] = Map(

    // Gopher-style repetition metrics + keep decision, per document:
    //   dup_word_frac  — fraction of word occurrences that repeat an
    //                    earlier occurrence (1 - distinct/total),
    //   top_unigram_frac — share of the most frequent word,
    //   dup_2gram_frac — fraction of duplicated word bigrams.
    // Pure map over the scan (the per-doc O(words · distinct_words) count
    // is bounded by document length, not data size); the keep flag is
    // decided in exact integer cross-multiplication, not float compare.
    "text_repetition_filter" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val ws = words(col("text"))
        val n = size(ws).cast(LongType)
        val nd = size(array_distinct(ws)).cast(LongType)
        val topc = topElementCount(ws)
        val gs = shingles(ws, 2)
        val n2 = size(gs).cast(LongType)
        val nd2 = size(array_distinct(gs)).cast(LongType)
        // Gopher-ish bounds: ≤70% repeated words, top word ≤30% of tokens
        val keep = ((n - nd) * 10 <= n * 7) && (topc * 10 <= n * 3)
        d.select(
            col("doc_id"),
            n.as("n_words"),
            round((n - nd).cast(DoubleType) / n.cast(DoubleType), 6)
              .as("dup_word_frac"),
            round(topc.cast(DoubleType) / n.cast(DoubleType), 6)
              .as("top_unigram_frac"),
            round(when(n2 > 0, (n2 - nd2).cast(DoubleType) / n2.cast(DoubleType))
              .otherwise(lit(0.0d)), 6).as("dup_2gram_frac"),
            keep.as("keep"))
          .orderBy(col("doc_id"))
      },
      Some {
        val ws = sqlWords("text")
        val n = s"CAST(len($ws) AS BIGINT)"
        val nd = s"CAST(len(list_distinct($ws)) AS BIGINT)"
        val topc = s"CAST(list_max(list_transform(list_distinct($ws), " +
          s"x -> len(list_filter($ws, w -> w = x)))) AS BIGINT)"
        val gs = sqlShingles(ws, 2)
        val n2 = s"CAST(len($gs) AS BIGINT)"
        val nd2 = s"CAST(len(list_distinct($gs)) AS BIGINT)"
        s"""SELECT doc_id, n AS n_words,
           |  round(CAST(n - nd AS DOUBLE) / CAST(n AS DOUBLE), 6) AS dup_word_frac,
           |  round(CAST(topc AS DOUBLE) / CAST(n AS DOUBLE), 6) AS top_unigram_frac,
           |  round(CASE WHEN n2 > 0
           |    THEN CAST(n2 - nd2 AS DOUBLE) / CAST(n2 AS DOUBLE)
           |    ELSE 0.0 END, 6) AS dup_2gram_frac,
           |  ((n - nd) * 10 <= n * 7) AND (topc * 10 <= n * 3) AS keep
           |FROM (SELECT doc_id, $n AS n, $nd AS nd, $topc AS topc,
           |             $n2 AS n2, $nd2 AS nd2
           |      FROM documents)
           |ORDER BY doc_id""".stripMargin
      }),

    // HASHED-N-GRAM IMPORTANCE SCORING (DSIR-style) — rank documents by
    // how target-like their n-gram distribution is: the target domain
    // (lang = 'en' stands in for "high-quality reference corpus") and
    // the background (everything) each yield bigram-hash document
    // frequencies, and a document scores the sum over its DISTINCT
    // bigrams of the scaled frequency ratio (cnt_target·10^6) div
    // cnt_background — the exact-integer analogue of the importance
    // log-ratio, monotone in the same direction and engine-identical.
    // Top-50 by (score, doc_id) = the importance-resampled candidates.
    // Scale shape: all joins are digest-keyed equi-joins (hash → count);
    // the corpus text is read once into the cached (doc, hash) pairs
    // that the target/background/score passes share; output is top-k.
    "sample_importance_ratio" -> QueryDef(
      (s, dir) => {
        val db = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            explode(shingleHashes(col("text"), 2)).as("h"))
          .cache()
        val cntT = db.filter(col("lang") === "en")
          .groupBy(col("h")).agg(count(lit(1)).as("ct"))
        val cntB = db.groupBy(col("h")).agg(count(lit(1)).as("cb"))
        db.join(cntT, Seq("h"), "left").join(cntB, Seq("h"))
          .groupBy(col("doc_id"))
          .agg(max(col("lang")).as("lang"),
            sum(coalesce(expr("(ct * 1000000) div cb"), lit(0L)))
              .as("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(50)
          .select(col("doc_id"), col("lang"), col("score"))
          .orderBy(col("score").desc, col("doc_id"))
      },
      Some {
        val hs = sqlShingleHashes("text", 2)
        s"""WITH db AS (
           |  SELECT doc_id, lang, unnest(hs) AS h
           |  FROM (SELECT doc_id, lang, $hs AS hs FROM documents)),
           |cnt_t AS (
           |  SELECT h, CAST(COUNT(*) AS BIGINT) AS ct FROM db
           |  WHERE lang = 'en' GROUP BY h),
           |cnt_b AS (
           |  SELECT h, CAST(COUNT(*) AS BIGINT) AS cb FROM db GROUP BY h)
           |SELECT doc_id, MAX(lang) AS lang,
           |  CAST(SUM(COALESCE((t.ct * 1000000) // b.cb, 0)) AS BIGINT)
           |    AS score
           |FROM db LEFT JOIN cnt_t t USING (h) JOIN cnt_b b USING (h)
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 50""".stripMargin
      }),

    // NEYMAN ALLOCATION — variance-optimal stratified sample sizing: a
    // 1000-document budget split across sources with n_h ∝ N_h·σ_h
    // (Neyman 1934), the statistically efficient alternative to the
    // proportional split sample_stratified uses. N_h·σ_h is carried as
    // the EXACT integer variance numerator v_h = N_h·Σy² − (Σy)² (which
    // is N_h²·σ_h², so its square root IS N_h·σ_h); the only non-integer
    // step is floor(sqrt(double)) of an exactly-representable < 2^53
    // integer — IEEE sqrt is correctly rounded, so both engines floor
    // the identical double. Allocation is one integral division against
    // the broadcast Σ√v. Scale shape: one map-side-combined moment
    // rollup to |sources| rows; everything after is sources-sized.
    "sample_neyman_allocation" -> QueryDef(
      (s, dir) => {
        val m = Tables.load(s, dir, "documents")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sy"),
            sum(col("n_chars") * col("n_chars")).as("sy2"))
          .selectExpr("source", "n_docs",
            "CAST(floor(sqrt(CAST(n_docs * sy2 - sy * sy AS DOUBLE))) " +
              "AS BIGINT) AS nh_sd")
        val tot = m.agg(sum(col("nh_sd")).as("tot_sd"))
        m.crossJoin(broadcast(tot))
          .selectExpr("source", "n_docs", "nh_sd",
            "(1000 * nh_sd) div tot_sd AS alloc")
          .orderBy(col("source"))
      },
      Some("""WITH m AS (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(SUM(n_chars) AS BIGINT) AS sy,
             |    CAST(SUM(n_chars * n_chars) AS BIGINT) AS sy2
             |  FROM documents GROUP BY source),
             |v AS (
             |  SELECT source, n_docs,
             |    CAST(floor(sqrt(CAST(n_docs * sy2 - sy * sy AS DOUBLE)))
             |      AS BIGINT) AS nh_sd
             |  FROM m),
             |t AS (SELECT CAST(SUM(nh_sd) AS BIGINT) AS tot_sd FROM v)
             |SELECT source, n_docs, nh_sd,
             |  (1000 * nh_sd) // t.tot_sd AS alloc
             |FROM v, t ORDER BY source""".stripMargin)),

    // TOKEN-BUDGET WATERFILLING ACROSS SOURCES — the data-mixing
    // allocation step when a training run's token budget is smaller than
    // the corpus: raise one water level L and give every source
    // min(tokens_s, L), so small sources keep everything and large
    // sources are capped equally (the max-min fair allocation; what a
    // mixture designer starts from before hand-tuned weights). All
    // integer: budget = 60% of total tokens, the level solves
    // Σ min(t_s, L) ≤ B exactly by segment search over the sorted source
    // sizes. Scale shape: the corpus pays ONE map-side-combined rollup to
    // |sources| rows; the window + segment search run on that tiny frame
    // (a deliberate sources-sized global window, not a corpus one).
    "sample_source_budget" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val toks = Tables.load(s, dir, "documents")
          .groupBy(col("source"))
          .agg(sum(size(words(col("text"))).cast(LongType)).as("t"))
        val w = Window.orderBy(col("t"), col("source"))
        val staged = toks
          .withColumn("rn", row_number().over(w).cast(LongType))
          .withColumn("prefix", coalesce(
            sum(col("t")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
        val stats = staged.agg(count(lit(1)).as("n"),
          sum(col("t")).as("total"))
        val staged2 = staged.crossJoin(broadcast(stats))
          .withColumn("budget", expr("(total * 6) div 10"))
          .withColumn("slots", col("n") - col("rn") + 1)
          .withColumn("f", col("prefix") + col("slots") * col("t"))
        // first segment whose fully-raised cost exceeds the budget holds
        // the level; if none, every source fits and L = max size
        val lvlRow = staged2.filter(col("f") > col("budget"))
          .agg(min_by(expr("(budget - prefix) div slots"), col("rn"))
            .as("lv0"))
        val maxT = staged2.agg(max(col("t")).as("mt"))
        staged2
          .crossJoin(broadcast(lvlRow)).crossJoin(broadcast(maxT))
          .withColumn("water_level", coalesce(col("lv0"), col("mt")))
          .select(col("source"), col("t").as("n_tokens"),
            least(col("t"), col("water_level")).as("alloc_tokens"),
            col("water_level"), col("budget"))
          .orderBy(col("source"))
      },
      Some {
        val nw = s"CAST(len(${sqlWords("text")}) AS BIGINT)"
        s"""WITH toks AS (
           |  SELECT source, CAST(SUM($nw) AS BIGINT) AS t
           |  FROM documents GROUP BY source),
           |staged AS (
           |  SELECT source, t,
           |    CAST(ROW_NUMBER() OVER (ORDER BY t, source) AS BIGINT) AS rn,
           |    CAST(COALESCE(SUM(t) OVER (ORDER BY t, source
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS BIGINT) AS prefix,
           |    CAST(COUNT(*) OVER () AS BIGINT) AS n,
           |    CAST(SUM(t) OVER () AS BIGINT) AS total
           |  FROM toks),
           |staged2 AS (
           |  SELECT *, CAST((total * 6) // 10 AS BIGINT) AS budget,
           |    n - rn + 1 AS slots,
           |    prefix + (n - rn + 1) * t AS f
           |  FROM staged),
           |lvl AS (
           |  SELECT CAST(COALESCE(
           |    (SELECT (budget - prefix) // slots FROM staged2
           |     WHERE f > budget ORDER BY rn LIMIT 1),
           |    (SELECT MAX(t) FROM staged2)) AS BIGINT) AS water_level)
           |SELECT source, t AS n_tokens,
           |  CAST(LEAST(t, water_level) AS BIGINT) AS alloc_tokens,
           |  water_level, budget
           |FROM staged2, lvl ORDER BY source""".stripMargin
      }),

    // Benchmark decontamination: a training document is contaminated if it
    // shares any word-5-gram with the eval set (doc_id % 97 = 0 stands in
    // for the benchmark suite). The eval index — DISTINCT 5-gram hashes over
    // ~1% of docs — is small by construction, so the contamination check is
    // a broadcast semi-join on the exploded training side: no shuffle
    // reaches the 100 TB table except the final per-doc count, whose input
    // is only the matching rows.
    "text_decontaminate" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val withH = d.select(col("doc_id"),
          shingleHashes(col("text"), 5).as("hs"))
        val evalH = withH.filter(col("doc_id") % 97 === 0)
          .select(explode(col("hs")).as("h")).distinct()
        val train = withH.filter(col("doc_id") % 97 =!= 0)
          .select(col("doc_id"), size(col("hs")).cast(LongType).as("n_grams"),
            explode(col("hs")).as("h"))
        train.join(broadcast(evalH), "h")
          .groupBy(col("doc_id"), col("n_grams"))
          .agg(count(lit(1)).as("n_shared"))
          .select(col("doc_id"), col("n_grams"), col("n_shared"),
            round(col("n_shared").cast(DoubleType) /
              col("n_grams").cast(DoubleType), 6).as("shared_frac"))
          .orderBy(col("doc_id"))
      },
      Some {
        val hs = sqlShingleHashes("text", 5)
        s"""WITH withh AS (
           |  SELECT doc_id, $hs AS hs FROM documents),
           |evalh AS (
           |  SELECT DISTINCT h FROM (
           |    SELECT unnest(hs) AS h FROM withh WHERE $evalPred)),
           |train AS (
           |  SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_grams,
           |         unnest(hs) AS h
           |  FROM withh WHERE NOT ($evalPred))
           |SELECT doc_id, n_grams, count(*) AS n_shared,
           |  round(CAST(count(*) AS DOUBLE) / CAST(n_grams AS DOUBLE), 6)
           |    AS shared_frac
           |FROM train JOIN evalh USING (h)
           |GROUP BY doc_id, n_grams
           |ORDER BY doc_id""".stripMargin
      }),

    // Boilerplate detection: word-3-grams appearing in ≥ 5 distinct
    // documents are "boilerplate" (headers/footers/templates at corpus
    // scale; here the planted near-dup families). Per document: how much of
    // it is boilerplate. One inverted-index shuffle builds the document
    // frequency table; the surviving hot set is tiny (frequency ≥ 5 caps
    // its size at n_grams_total/5, in practice far less), so the second
    // pass is a broadcast join back onto the exploded scan.
    "text_boilerplate_frac" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val exploded = d.select(col("doc_id"),
            shingleHashes(col("text"), 3).as("hs"))
          .select(col("doc_id"), size(col("hs")).cast(LongType).as("n_grams"),
            explode(col("hs")).as("h"))
        // shingleHashes is per-doc DISTINCT → count(*) = document frequency
        val hot = exploded.groupBy(col("h"))
          .agg(count(lit(1)).as("df")).filter(col("df") >= 5)
          .select(col("h"))
        val bp = exploded.join(broadcast(hot), "h")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_bp"))
        d.select(col("doc_id"),
            size(shingleHashes(col("text"), 3)).cast(LongType).as("n_grams"))
          .join(bp, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_grams"),
            coalesce(col("n_bp"), lit(0L)).as("n_bp"),
            round(coalesce(col("n_bp"), lit(0L)).cast(DoubleType) /
              col("n_grams").cast(DoubleType), 6).as("bp_frac"))
          .orderBy(col("doc_id"))
      },
      Some {
        val hs = sqlShingleHashes("text", 3)
        s"""WITH exploded AS (
           |  SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_grams,
           |         unnest(hs) AS h
           |  FROM (SELECT doc_id, $hs AS hs FROM documents)),
           |hot AS (
           |  SELECT h FROM exploded GROUP BY h HAVING count(*) >= 5),
           |bp AS (
           |  SELECT doc_id, count(*) AS n_bp
           |  FROM exploded JOIN hot USING (h) GROUP BY doc_id),
           |base AS (
           |  SELECT doc_id, CAST(len($hs) AS BIGINT) AS n_grams
           |  FROM documents)
           |SELECT base.doc_id, base.n_grams,
           |  coalesce(bp.n_bp, 0) AS n_bp,
           |  round(CAST(coalesce(bp.n_bp, 0) AS DOUBLE)
           |        / CAST(base.n_grams AS DOUBLE), 6) AS bp_frac
           |FROM base LEFT JOIN bp ON base.doc_id = bp.doc_id
           |ORDER BY base.doc_id""".stripMargin
      }),

    // Mixture resampling: subsample each language stratum so the selected
    // corpus approaches a target mix (en 40%, de/es 20%, fr/zh 10%) of the
    // ORIGINAL corpus size. Acceptance probability per stratum is
    // min(1, w_l/10 · total / cnt_l); the accept decision is the same
    // md5-threshold device as sample_stratified, compared by exact integer
    // cross-multiplication (h%1M · 10 · cnt_l < w_l · total · 1M — fits
    // int64 up to ~10^11-row strata; beyond that the comparison moves to
    // DECIMAL). Plan: a 5-row aggregate broadcast back onto a pure map —
    // nothing heavier than the scan itself touches the 100 TB side.
    "sample_mixture" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val cnts = d.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
        val total = d.agg(count(lit(1)).as("total"))
        val w = mixWeights.foldRight(lit(0L)) { case ((l, wl), e) =>
          when(col("lang") === l, lit(wl)).otherwise(e)
        }
        val h = md5Long(concat(lit("mix:"), col("doc_id"))) % 1000000L
        d.join(broadcast(cnts), "lang").crossJoin(broadcast(total))
          .filter(h * 10L * col("cnt") < w * col("total") * 1000000L)
          .groupBy(col("lang")).agg(
            count(lit(1)).as("n_sel"),
            min(col("doc_id")).as("first_id"))
          .join(cnts, "lang")
          .select(col("lang"), col("cnt"), col("n_sel"), col("first_id"))
          .orderBy(col("lang"))
      },
      Some {
        val h = s"(${sqlMd5Long("concat('mix:', doc_id)")} % 1000000)"
        val w = mixWeights.foldRight("CAST(0 AS BIGINT)") { case ((l, wl), e) =>
          s"CASE WHEN lang = '$l' THEN $wl ELSE $e END"
        }
        s"""WITH cnts AS (
           |  SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
           |tot AS (SELECT count(*) AS total FROM documents),
           |sel AS (
           |  SELECT d.lang, d.doc_id
           |  FROM documents d JOIN cnts USING (lang), tot
           |  WHERE $h * 10 * cnt < ($w) * total * 1000000)
           |SELECT lang, cnt, count(*) AS n_sel, min(doc_id) AS first_id
           |FROM sel JOIN cnts USING (lang)
           |GROUP BY lang, cnt ORDER BY lang""".stripMargin
      }),

    // TEMPERATURE-SCALED mixture weights (α = 0.5): the standard
    // pretraining data-mixing rule — sampling weight per source stratum
    // w_s = n_s^α / Σ_t n_t^α — that upweights small sources relative to
    // proportional sampling. sqrt is IEEE correctly-rounded in both
    // engines, and the normalizer is a SEQUENTIAL fold over the per-source
    // weights in source order (aggregate over a sorted collect_list — the
    // same order-identical-fold device as the cosine kernel), so the
    // doubles match DuckDB bit-for-bit before the 6-dp round. Plan: a
    // |sources|-row aggregate, folded on the driver side of a broadcast —
    // the 100 TB scan contributes exactly one map-side-combined count.
    "sample_temperature" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val w = d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
          .select(col("source"), col("n_docs"),
            sqrt(col("n_docs").cast(DoubleType)).as("w"))
        val tot = w.agg(
          sum(col("n_docs")).as("total"),
          aggregate(
            transform(array_sort(collect_list(struct(col("source"), col("w")))),
              p => p.getField("w")),
            lit(0.0d), (acc, x) => acc + x).as("wsum"))
        w.crossJoin(broadcast(tot))
          .select(col("source"), col("n_docs"),
            round(col("w") / col("wsum"), 6).as("weight"),
            floor(col("total").cast(DoubleType) * col("w") / col("wsum"))
              .cast(LongType).as("target_n"))
          .orderBy(col("source"))
      },
      Some("""WITH cnts AS (
             |  SELECT source, count(*) AS n_docs FROM documents
             |  GROUP BY source),
             |w AS (SELECT source, n_docs,
             |        sqrt(CAST(n_docs AS DOUBLE)) AS w FROM cnts),
             |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
             |          list_sum(list(w ORDER BY source)) AS wsum FROM w)
             |SELECT source, n_docs, round(w / wsum, 6) AS weight,
             |  CAST(FLOOR(CAST(total AS DOUBLE) * w / wsum) AS BIGINT)
             |    AS target_n
             |FROM w, tot ORDER BY source""".stripMargin)),

    // DETERMINISTIC EPOCH SHUFFLE: the global training-order shuffle every
    // epoch needs — each document gets a shard (seeded hash mod S) and a
    // dense position within its shard (rank of the hash). Same seed → same
    // order on any cluster size; next epoch = new seed. Scale shape: NO
    // global sort — the rank window partitions by shard, so the sort
    // parallelizes S-ways (S grows with the corpus; a 100 TB epoch uses
    // tens of thousands of shards and each task sorts one shard). Output is
    // the per-shard verification summary: count, the shard's first
    // document, and a position-weighted checksum any mis-ranking breaks.
    "curation_epoch_shuffle" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = Tables.load(s, dir, "documents")
        val h = d.select(col("doc_id"),
          md5Long(concat(lit("ep1:"), col("doc_id"))).as("h"))
          .withColumn("shard", col("h") % 64L)
        val pos = h.withColumn("pos",
          row_number().over(
            Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id")))
            .cast(LongType))
        pos.groupBy(col("shard")).agg(
            count(lit(1)).as("n_docs"),
            min(when(col("pos") === 1L, col("doc_id"))).as("first_doc"),
            sum(col("pos") * col("doc_id")).as("checksum"))
          .orderBy(col("shard"))
      },
      Some(s"""WITH h AS (
             |  SELECT doc_id,
             |         ${sqlMd5Long("concat('ep1:', doc_id)")} AS h
             |  FROM documents),
             |p AS (
             |  SELECT doc_id, h % 64 AS shard,
             |         ROW_NUMBER() OVER (PARTITION BY h % 64
             |                            ORDER BY h, doc_id) AS pos
             |  FROM h)
             |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |       CAST(MIN(CASE WHEN pos = 1 THEN doc_id END) AS BIGINT)
             |         AS first_doc,
             |       CAST(SUM(pos * doc_id) AS BIGINT) AS checksum
             |FROM p GROUP BY shard ORDER BY shard""".stripMargin)),

    // CORPUS COMPOSITION REPORT: the per-source audit a mixing/curation
    // pass starts from — document and character volume, language spread,
    // the dominant language, and the Simpson concentration numerator
    // Σ n_lang² (÷ n_docs² gives the probability two random docs share a
    // language — 1.0 = monolingual source). All exact integers; one
    // map-side-combined (source, lang) aggregate then a |sources×langs|-row
    // reduce — the 100 TB scan contributes counts only.
    "corpus_mix_report" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val sl = d.groupBy(col("source"), col("lang")).agg(
          count(lit(1)).as("n_l"), sum(col("n_chars")).as("chars_l"))
        sl.groupBy(col("source")).agg(
            sum(col("n_l")).as("n_docs"),
            count(lit(1)).as("n_langs"),
            sum(col("chars_l")).as("n_chars"),
            max_by(col("lang"), struct(col("n_l"), col("lang")))
              .as("top_lang"),
            sum(col("n_l") * col("n_l")).as("simpson_num"))
          .orderBy(col("source"))
      },
      Some("""WITH sl AS (
             |  SELECT source, lang, count(*) AS n_l,
             |         CAST(SUM(n_chars) AS BIGINT) AS chars_l
             |  FROM documents GROUP BY source, lang),
             |ranked AS (
             |  SELECT source, lang,
             |         ROW_NUMBER() OVER (PARTITION BY source
             |                            ORDER BY n_l DESC, lang DESC) AS rk
             |  FROM sl)
             |SELECT sl.source, CAST(SUM(n_l) AS BIGINT) AS n_docs,
             |       CAST(COUNT(*) AS BIGINT) AS n_langs,
             |       CAST(SUM(chars_l) AS BIGINT) AS n_chars,
             |       MIN(r.lang) AS top_lang,
             |       CAST(SUM(n_l * n_l) AS BIGINT) AS simpson_num
             |FROM sl JOIN ranked r ON sl.source = r.source AND r.rk = 1
             |GROUP BY sl.source ORDER BY sl.source""".stripMargin)),

    // PER-SOURCE SCORE CDF — the calibration table that turns a raw
    // quality score into a per-source percentile (quality thresholds must
    // be source-relative: "top 30% of each crawl", not one global cut that
    // empties the noisier sources). Scores bucket at width 50 (n_chars
    // stands in for the integer quality score); per (source, bucket) the
    // histogram count, the running count, and the cumulative fraction. A
    // filtering pass then BROADCASTS this table and keeps a doc by
    // comparing its bucket against the source's threshold row. Scale
    // shape: the corpus contributes ONE map-side-combined histogram
    // aggregate; the cumulative window runs over the tiny per-source
    // bucket list (score range / 50 rows), NEVER over documents — the
    // same histogram-cumsum device as text_quality_topp.
    "curation_score_cdf" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = Tables.load(s, dir, "documents")
        val hist = d
          .select(col("source"), expr("n_chars div 50").as("bucket"))
          .groupBy(col("source"), col("bucket"))
          .agg(count(lit(1)).as("n_docs"))
        val wCum = Window.partitionBy(col("source")).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wTot = Window.partitionBy(col("source"))
        hist
          .withColumn("cum_docs", sum(col("n_docs")).over(wCum))
          .withColumn("total", sum(col("n_docs")).over(wTot))
          .select(col("source"), col("bucket"), col("n_docs"),
            col("cum_docs"),
            round(col("cum_docs").cast(DoubleType) /
              col("total").cast(DoubleType), 6).as("cum_frac"))
          .orderBy(col("source"), col("bucket"))
      },
      Some("""WITH hist AS (
             |  SELECT source, n_chars // 50 AS bucket, count(*) AS n_docs
             |  FROM documents GROUP BY source, bucket)
             |SELECT source, CAST(bucket AS BIGINT) AS bucket,
             |  CAST(n_docs AS BIGINT) AS n_docs,
             |  CAST(SUM(n_docs) OVER (PARTITION BY source ORDER BY bucket
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS cum_docs,
             |  round(CAST(SUM(n_docs) OVER (PARTITION BY source
             |      ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND CURRENT ROW) AS DOUBLE)
             |    / CAST(SUM(n_docs) OVER (PARTITION BY source) AS DOUBLE),
             |    6) AS cum_frac
             |FROM hist ORDER BY source, bucket""".stripMargin)),

    // QUANTILE NORMALIZATION of quality scores across sources — the
    // distribution-alignment pass before mixing scored corpora: a raw
    // score is only comparable within its source (different crawls have
    // different score distributions), so each document's score maps to
    // its SOURCE percentile (strictly-below fraction, exact integer ppm)
    // and then through the corpus-wide inverse CDF to the equalized
    // score: eq = min global score whose cumulative fraction exceeds the
    // percentile. After this, "top 10% of source A" and "top 10% of
    // source B" mean the same equalized value — the property threshold
    // mixing silently assumes. 100 TB shape: the corpus contributes ONE
    // map-side-combined (source, score) histogram; percentiles and the
    // inverse-CDF interval table are cumsum windows over HISTOGRAM rows
    // (score domain is ppm-bounded, independent of corpus size); the
    // interval match is a histogram x histogram range join; and the
    // per-doc mapping rides a broadcast equi-join back onto the scan —
    // the corpus is never sorted.
    "curation_score_equalize" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = Tables.load(s, dir, "documents")
        val ws = words(col("text"))
        val nStop = size(filter(ws, w => w.isInCollection(qualityStopwords)))
          .cast(LongType)
        val sc = d.select(col("doc_id"), col("source"),
            (nStop * 1000000L).as("num"), size(ws).cast(LongType).as("den"))
          .selectExpr("doc_id", "source", "num div den AS score")
        val srcHist = sc.groupBy(col("source"), col("score"))
          .agg(count(lit(1)).as("c")).cache()
        val wSrc = Window.partitionBy(col("source")).orderBy(col("score"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wSrcTot = Window.partitionBy(col("source"))
        val srcPct = srcHist
          .withColumn("below", coalesce(sum(col("c")).over(wSrc), lit(0L)))
          .withColumn("n_src", sum(col("c")).over(wSrcTot))
          .selectExpr("source", "score",
            "(below * 1000000) div n_src AS src_pct_ppm")
        val gHist = sc.groupBy(col("score")).agg(count(lit(1)).as("c"))
        val wG = Window.orderBy(col("score"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val gIv = gHist
          .withColumn("cum", sum(col("c")).over(wG))
          .crossJoin(broadcast(gHist.agg(sum(col("c")).as("n_all"))))
          .selectExpr("score AS g_score",
            "((cum - c) * 1000000) div n_all AS lo_ppm",
            "(cum * 1000000) div n_all AS hi_ppm")
          .filter(col("lo_ppm") < col("hi_ppm"))
        val cellMap = srcPct.join(broadcast(gIv),
          col("lo_ppm") <= col("src_pct_ppm") &&
            col("src_pct_ppm") < col("hi_ppm"))
          .select(col("source"), col("score"), col("src_pct_ppm"),
            col("g_score").as("eq_score"))
        sc.join(broadcast(cellMap), Seq("source", "score"))
          .select(col("doc_id"), col("source"), col("score"),
            col("src_pct_ppm"), col("eq_score"))
          .orderBy(col("doc_id"))
      },
      Some {
        val ws = sqlWords("text")
        val nStop = s"CAST(len(list_filter($ws, w -> w IN " +
          qualityStopwords.mkString("('", "','", "')") + ")) AS BIGINT)"
        s"""WITH sc AS (
           |  SELECT doc_id, source,
           |    ($nStop * 1000000) // CAST(len($ws) AS BIGINT) AS score
           |  FROM documents),
           |sh AS (SELECT source, score, count(*) AS c FROM sc
           |       GROUP BY source, score),
           |sp AS (
           |  SELECT source, score,
           |    (CAST(coalesce(SUM(c) OVER (PARTITION BY source
           |       ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND
           |       1 PRECEDING), 0) AS BIGINT) * 1000000)
           |      // CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT)
           |      AS src_pct_ppm
           |  FROM sh),
           |gh AS (SELECT score, count(*) AS c FROM sc GROUP BY score),
           |gi AS (
           |  SELECT score AS g_score,
           |    (CAST(SUM(c) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED
           |       PRECEDING AND CURRENT ROW) - c AS BIGINT) * 1000000)
           |      // (SELECT CAST(SUM(c) AS BIGINT) FROM gh) AS lo_ppm,
           |    (CAST(SUM(c) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED
           |       PRECEDING AND CURRENT ROW) AS BIGINT) * 1000000)
           |      // (SELECT CAST(SUM(c) AS BIGINT) FROM gh) AS hi_ppm
           |  FROM gh),
           |cm AS (
           |  SELECT sp.source, sp.score, sp.src_pct_ppm,
           |    gi.g_score AS eq_score
           |  FROM sp JOIN gi ON gi.lo_ppm <= sp.src_pct_ppm
           |    AND sp.src_pct_ppm < gi.hi_ppm
           |  WHERE gi.lo_ppm < gi.hi_ppm)
           |SELECT sc.doc_id, sc.source, sc.score, cm.src_pct_ppm,
           |  cm.eq_score
           |FROM sc JOIN cm ON sc.source = cm.source AND sc.score = cm.score
           |ORDER BY sc.doc_id""".stripMargin
      }),

    // TOKEN-BUDGET ALLOCATION — the mixture PLAN a pretraining run is
    // actually built from: given a total token budget (half the corpus
    // here), each source gets budget·w_s/Σw by temperature weight
    // (α = 0.5, the sample_temperature rule), capped at what the source
    // actually has; the deficit column shows which small-but-upweighted
    // sources run out — the signal to re-run with epoch multipliers. The
    // Σw normalizer is the same source-ordered sequential fold as
    // sample_temperature, so the doubles agree with DuckDB bit-for-bit.
    // Scale shape: ONE map-side-combined per-source aggregate off the
    // scan; everything after runs on |sources| rows under a broadcast.
    "curation_token_budget" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val srcs = d.groupBy(col("source")).agg(
            count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
          .withColumn("w", sqrt(col("n_docs").cast(DoubleType)))
        val tot = srcs.agg(
          expr("sum(n_chars) div 2").as("budget"),
          aggregate(
            transform(array_sort(collect_list(struct(col("source"), col("w")))),
              p => p.getField("w")),
            lit(0.0d), (acc, x) => acc + x).as("wsum"))
        srcs.crossJoin(broadcast(tot))
          .withColumn("target_chars",
            floor(col("budget").cast(DoubleType) * col("w") / col("wsum"))
              .cast(LongType))
          .select(col("source"), col("n_chars"),
            round(col("w") / col("wsum"), 6).as("weight"),
            col("target_chars"),
            least(col("n_chars"), col("target_chars")).as("alloc_chars"),
            greatest(col("target_chars") - col("n_chars"), lit(0L))
              .as("deficit_chars"))
          .orderBy(col("source"))
      },
      Some("""WITH srcs AS (
             |  SELECT source, count(*) AS n_docs,
             |    CAST(SUM(n_chars) AS BIGINT) AS n_chars,
             |    sqrt(CAST(count(*) AS DOUBLE)) AS w
             |  FROM documents GROUP BY source),
             |tot AS (
             |  SELECT CAST(SUM(n_chars) // 2 AS BIGINT) AS budget,
             |    list_sum(list(w ORDER BY source)) AS wsum
             |  FROM srcs)
             |SELECT source, n_chars, round(w / wsum, 6) AS weight,
             |  CAST(FLOOR(CAST(budget AS DOUBLE) * w / wsum) AS BIGINT)
             |    AS target_chars,
             |  least(n_chars,
             |    CAST(FLOOR(CAST(budget AS DOUBLE) * w / wsum) AS BIGINT))
             |    AS alloc_chars,
             |  greatest(
             |    CAST(FLOOR(CAST(budget AS DOUBLE) * w / wsum) AS BIGINT)
             |      - n_chars, 0) AS deficit_chars
             |FROM srcs, tot ORDER BY source""".stripMargin)),

    // EFFECTIVE SAMPLE SIZE of length-proportional sampling weights, per
    // source — the Kish ESS (Σw)²/Σw² that tells a mixture designer how
    // SKEWED each source's document-length distribution is before using
    // length-weighted sampling: ess_docs ≈ n means uniform lengths (the
    // weights change nothing), ess_docs ≪ n means a few long documents
    // would dominate every batch drawn from that source. Exact integer
    // moments (Σw, Σw² through DECIMAL(38,0) — n_chars² clears int64 at
    // corpus scale), then each reported ratio is ONE double division of
    // exact quantities, round(6). Scale: a pure map-side-combined
    // |sources|-row rollup; nothing downstream scales with the corpus.
    "sample_ess_weights" -> QueryDef(
      (s, dir) => {
        val dec = (c: org.apache.spark.sql.Column) =>
          c.cast(DecimalType(38, 0))
        Tables.load(s, dir, "documents")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_w"),
            sum(dec(col("n_chars")) * dec(col("n_chars"))).as("sw2"))
          .select(col("source"), col("n_docs"), col("sum_w"),
            round((dec(col("sum_w")) * dec(col("sum_w"))).cast(DoubleType)
              / col("sw2").cast(DoubleType), 6).as("ess_docs"),
            round((dec(col("sum_w")) * dec(col("sum_w"))).cast(DoubleType)
              / (col("sw2") * dec(col("n_docs"))).cast(DoubleType), 6)
              .as("ess_ratio"))
          .orderBy(col("source"))
      },
      Some("""WITH m AS (
             |  SELECT source, count(*) AS n_docs,
             |    SUM(CAST(n_chars AS HUGEINT)) AS sum_w,
             |    SUM(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT))
             |      AS sw2
             |  FROM documents GROUP BY source)
             |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
             |  CAST(sum_w AS BIGINT) AS sum_w,
             |  round(CAST(sum_w * sum_w AS DOUBLE) / CAST(sw2 AS DOUBLE), 6)
             |    AS ess_docs,
             |  round(CAST(sum_w * sum_w AS DOUBLE)
             |    / CAST(sw2 * n_docs AS DOUBLE), 6) AS ess_ratio
             |FROM m ORDER BY source""".stripMargin)),

    // CURRICULUM PHASE ASSIGNMENT — order the corpus easy→hard and split
    // it into 4 equal-count phases (curriculum learning's standard stage
    // schedule): difficulty = mean word length in exact milli-chars
    // ((n_chars·1000) div n_tokens — long words ≈ rarer/technical text),
    // phase boundaries are the EXACT quartiles of the difficulty
    // distribution. Mechanism is the suite's scale-safe exact-quantile
    // device: difficulty collapses to a value histogram (bounded by
    // distinct milli-ratios, not corpus size), the inclusive prefix-CDF
    // rides the SequencePacking distributed prefix-sum — never a
    // single-task global window — and the three boundary scalars come
    // from ONE aggregate row broadcast back onto a pure-map phase tag.
    // Per-phase rollup reports the schedule a trainer consumes.
    "curation_curriculum_phases" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"),
            size(words(col("text"))).cast(LongType).as("n_tokens"))
          .withColumn("diff_milli",
            expr("(n_chars * 1000) div n_tokens"))
        val hist = d.groupBy(col("diff_milli"))
          .agg(count(lit(1)).as("cnt"))
        val cdf = graft.operators.SequencePacking.runningSum(
          hist, "diff_milli", "cnt", "cum")
        val bounds = cdf.crossJoin(broadcast(
            d.agg(count(lit(1)).as("n"))))
          .agg(
            min(when(col("cum") >= expr("(1 * n + 3) div 4"),
              col("diff_milli"))).as("b1"),
            min(when(col("cum") >= expr("(2 * n + 3) div 4"),
              col("diff_milli"))).as("b2"),
            min(when(col("cum") >= expr("(3 * n + 3) div 4"),
              col("diff_milli"))).as("b3"))
        d.crossJoin(broadcast(bounds))
          .withColumn("phase",
            lit(1L) + (col("diff_milli") > col("b1")).cast(LongType)
              + (col("diff_milli") > col("b2")).cast(LongType)
              + (col("diff_milli") > col("b3")).cast(LongType))
          .groupBy(col("phase"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("diff_milli")).as("min_diff"),
            max(col("diff_milli")).as("max_diff"),
            sum(col("n_tokens")).as("sum_tokens"))
          .orderBy(col("phase"))
      },
      Some(s"""WITH d AS MATERIALIZED (
             |  SELECT doc_id, n_chars,
             |    CAST(len(${sqlWords("text")}) AS BIGINT) AS n_tokens,
             |    (n_chars * 1000) // CAST(len(${sqlWords("text")}) AS BIGINT)
             |      AS diff_milli
             |  FROM documents),
             |hist AS (
             |  SELECT diff_milli, count(*) AS cnt FROM d GROUP BY 1),
             |cdf AS (
             |  SELECT diff_milli,
             |    CAST(SUM(cnt) OVER (ORDER BY diff_milli
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS cum
             |  FROM hist),
             |n AS (SELECT count(*) AS n FROM d),
             |b AS (
             |  SELECT
             |    min(CASE WHEN cum >= (1 * n.n + 3) // 4
             |      THEN diff_milli END) AS b1,
             |    min(CASE WHEN cum >= (2 * n.n + 3) // 4
             |      THEN diff_milli END) AS b2,
             |    min(CASE WHEN cum >= (3 * n.n + 3) // 4
             |      THEN diff_milli END) AS b3
             |  FROM cdf, n)
             |SELECT phase, count(*) AS n_docs,
             |  CAST(min(diff_milli) AS BIGINT) AS min_diff,
             |  CAST(max(diff_milli) AS BIGINT) AS max_diff,
             |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
             |FROM (
             |  SELECT d.*,
             |    1 + CAST(diff_milli > b.b1 AS BIGINT)
             |      + CAST(diff_milli > b.b2 AS BIGINT)
             |      + CAST(diff_milli > b.b3 AS BIGINT) AS phase
             |  FROM d, b)
             |GROUP BY phase ORDER BY phase""".stripMargin)),

    // PARETO FRONTIER (2-D skyline) over (quality score, token count) —
    // the curation question "which documents are undominated: nothing
    // else is both better-scored AND longer" answered as a proper
    // SKYLINE operator. Scale shape: the corpus first collapses to ONE
    // row per distinct score (map-side-combined max-words — score
    // cardinality is bounded by the score's 6-dp lattice, the same
    // license as the suite's other score-granularity devices), and only
    // that bounded table rides the frontier window (strictly-better
    // scores precede, keep rows whose max_words exceeds the running
    // max). Raw documents never enter a window.
    "curation_pareto_frontier" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = Tables.load(s, dir, "documents")
          .select(qualityScore(col("text")).as("quality"),
            size(words(col("text"))).cast(LongType).as("n_words"))
        val byScore = d.groupBy(col("quality"))
          .agg(max(col("n_words")).as("max_words"),
            count(lit(1)).as("n_docs"))
        val better = Window.orderBy(col("quality").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        byScore
          .withColumn("best_above", max(col("max_words")).over(better))
          .filter(col("best_above").isNull ||
            col("max_words") > col("best_above"))
          .select(col("quality"), col("max_words"), col("n_docs"))
          .orderBy(col("quality").desc)
      },
      Some {
        s"""WITH d AS (
           |  SELECT ${sqlQualityScore("text")} AS quality,
           |    CAST(len(${sqlWords("text")}) AS BIGINT) AS n_words
           |  FROM documents),
           |bs AS (
           |  SELECT quality, MAX(n_words) AS max_words,
           |    CAST(count(*) AS BIGINT) AS n_docs
           |  FROM d GROUP BY quality),
           |f AS (
           |  SELECT quality, max_words, n_docs,
           |    MAX(max_words) OVER (ORDER BY quality DESC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           |      AS best_above
           |  FROM bs)
           |SELECT quality, CAST(max_words AS BIGINT) AS max_words, n_docs
           |FROM f
           |WHERE best_above IS NULL OR max_words > best_above
           |ORDER BY quality DESC""".stripMargin
      })
  )
}
