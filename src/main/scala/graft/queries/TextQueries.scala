package graft.queries

import graft.functions.TextFunctions._
import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Text-analysis operators over the `documents` table — the per-document
 * scoring/statistics pass of a training-data pipeline (language ID, quality
 * scoring, token counting, fingerprinting). All per-row, shuffle-free except
 * the final presentation sort; at 100 TB these run as a pure map over the
 * parquet scan with full column pruning.
 *
 * Every score is exact integer arithmetic or a single double division of
 * exact integers, so the DuckDB oracle reproduces values bit-for-bit.
 */
object TextQueries {

  // ONE stopword set for every consumer of the quality signal — see
  // TextFunctions.qualityStopwords (shared with the dedup cross-signal
  // audit so both sides tabulate the same score)
  private[queries] val stopwords = qualityStopwords
  private val langs = Seq("de", "en", "es", "zh")

  /** BPE-ish token pattern: letter runs, digit runs, single other glyphs. */
  private val tokenPat = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  def defs: Map[String, QueryDef] = Map(

    // GOPHER-STYLE RULE MATRIX — the named-rule companion to the blended
    // quality score and the funnel's first-fail attribution: four
    // independent document-quality rules (word-count band, mean-word-
    // length band, minimum stopword evidence, repetition cap — the
    // Gopher/C4 filter family re-expressed on this corpus), evaluated
    // PER DOCUMENT as a bitmask, with the doc/char mass of every rule
    // COMBINATION. The combination histogram is what the score hides:
    // which rules co-fire decides whether filters are redundant or
    // complementary. All thresholds integer-cross-multiplied (no ratio
    // division anywhere). 100 TB: a pure map over the scan into a
    // ≤16-row map-side-combined rollup.
    "text_gopher_rule_matrix" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val ws = words(col("text"))
        val n = size(ws).cast(LongType)
        val sumLen = aggregate(ws, lit(0L), (acc, w) => acc + length(w))
        val nStop = size(filter(ws, w => w.isInCollection(stopwords)))
          .cast(LongType)
        val topc = topElementCount(ws)
        val rLen = n >= 25 && n <= 1000
        val rMwl = sumLen >= n * 3 && sumLen <= n * 10
        val rStop = nStop >= 2
        val rRep = topc * 10 <= n * 3
        val mask = when(rLen, 8L).otherwise(0L) +
          when(rMwl, 4L).otherwise(0L) +
          when(rStop, 2L).otherwise(0L) +
          when(rRep, 1L).otherwise(0L)
        d.select(mask.as("rule_mask"), col("n_chars"))
          .groupBy(col("rule_mask"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("n_chars_total"))
          .selectExpr("rule_mask",
            "(rule_mask div 8) % 2 = 1 AS len_ok",
            "(rule_mask div 4) % 2 = 1 AS mwl_ok",
            "(rule_mask div 2) % 2 = 1 AS stop_ok",
            "rule_mask % 2 = 1 AS rep_ok",
            "n_docs", "n_chars_total")
          .orderBy(col("rule_mask"))
      },
      Some {
        val ws = sqlWords("text")
        val n = s"CAST(len($ws) AS BIGINT)"
        val sumLen =
          s"CAST(list_sum(list_transform($ws, w -> length(w))) AS BIGINT)"
        val nStop = s"CAST(len(list_filter($ws, w -> w IN " +
          stopwords.mkString("('", "','", "')") + ")) AS BIGINT)"
        val topc = s"CAST(list_max(list_transform(list_distinct($ws), " +
          s"x -> len(list_filter($ws, w -> w = x)))) AS BIGINT)"
        s"""WITH m AS (
           |  SELECT n_chars,
           |    (CASE WHEN n >= 25 AND n <= 1000 THEN 8 ELSE 0 END
           |     + CASE WHEN sumlen >= n * 3 AND sumlen <= n * 10
           |         THEN 4 ELSE 0 END
           |     + CASE WHEN nstop >= 2 THEN 2 ELSE 0 END
           |     + CASE WHEN topc * 10 <= n * 3 THEN 1 ELSE 0 END)
           |      AS rule_mask
           |  FROM (SELECT n_chars, $n AS n, $sumLen AS sumlen,
           |          $nStop AS nstop, $topc AS topc
           |        FROM documents))
           |SELECT CAST(rule_mask AS BIGINT) AS rule_mask,
           |  (rule_mask // 8) % 2 = 1 AS len_ok,
           |  (rule_mask // 4) % 2 = 1 AS mwl_ok,
           |  (rule_mask // 2) % 2 = 1 AS stop_ok,
           |  rule_mask % 2 = 1 AS rep_ok,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS n_chars_total
           |FROM m GROUP BY 1, 2, 3, 4, 5 ORDER BY rule_mask""".stripMargin
      }),

    // Token counting: whitespace tokens + regex "BPE-ish" subword tokens.
    "text_token_count" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        d.select(
            col("doc_id"),
            size(words(col("text"))).cast(LongType).as("n_ws_tokens"),
            regexp_count(col("text"), lit(tokenPat)).cast(LongType)
              .as("n_re_tokens"),
            (length(col("text")).cast(DoubleType) / lit(4.0d))
              .as("n_est_tokens"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
              |  CAST(len(${sqlWords("text")}) AS BIGINT) AS n_ws_tokens,
              |  CAST(len(regexp_extract_all(text, '$tokenPat')) AS BIGINT) AS n_re_tokens,
              |  CAST(length(text) AS DOUBLE) / 4.0 AS n_est_tokens
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Quality scoring: length/stopword/character-class ratios + a blended
    // quality signal, as used for corpus filtering.
    "text_quality_score" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val ws = words(col("text"))
        val nWords = size(ws).cast(LongType)
        val sumLen = aggregate(ws, lit(0L), (acc, w) => acc + length(w))
        val nStop = size(filter(ws, w => w.isInCollection(stopwords)))
          .cast(LongType)
        val nAlpha = length(regexp_replace(col("text"), "[^a-z]", ""))
          .cast(LongType)
        val nChars = length(col("text")).cast(LongType)
        val stopRatio = nStop.cast(DoubleType) / nWords.cast(DoubleType)
        val lenScore = least(nWords.cast(DoubleType) / lit(50.0d), lit(1.0d))
        d.select(
            col("doc_id"),
            nWords.as("n_words"),
            round(sumLen.cast(DoubleType) / nWords.cast(DoubleType), 6)
              .as("mean_word_len"),
            round(stopRatio, 6).as("stop_ratio"),
            round(nAlpha.cast(DoubleType) / nChars.cast(DoubleType), 6)
              .as("alpha_ratio"),
            qualityScore(col("text")).as("quality"))
          .orderBy(col("doc_id"))
      },
      Some {
        val ws = sqlWords("text")
        val nWords = s"CAST(len($ws) AS BIGINT)"
        val sumLen = s"CAST(list_sum(list_transform($ws, w -> length(w))) AS BIGINT)"
        val nStop = s"CAST(len(list_filter($ws, w -> w IN " +
          stopwords.mkString("('", "','", "')") + ")) AS BIGINT)"
        val stopRatio = s"(CAST($nStop AS DOUBLE) / CAST($nWords AS DOUBLE))"
        val lenScore = s"least(CAST($nWords AS DOUBLE) / 50.0, 1.0)"
        s"""SELECT doc_id,
           |  $nWords AS n_words,
           |  round(CAST($sumLen AS DOUBLE) / CAST($nWords AS DOUBLE), 6) AS mean_word_len,
           |  round($stopRatio, 6) AS stop_ratio,
           |  round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
           |        / CAST(length(text) AS DOUBLE), 6) AS alpha_ratio,
           |  ${sqlQualityScore("text")} AS quality
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    // Language ID: unigram-profile heuristic — per language, an additive
    // score from a deterministic word→weight table (md5-derived); argmax
    // with first-wins tie-break in fixed lang order. Exact integers.
    "text_lang_id" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val ws = words(col("text"))
        val scores = langs.map { l =>
          l -> aggregate(ws, lit(0L),
            (acc, w) => acc + md5Long(concat(lit(l + ":"), w)) % 1000)
        }
        val best = greatest(scores.map(_._2): _*)
        val pred = scores.foldRight(lit("??")) { case ((l, sc), e) =>
          when(sc === best, lit(l)).otherwise(e)
        }
        d.select(
            col("doc_id"), col("lang"),
            pred.as("lang_pred"),
            best.as("best_score"))
          .orderBy(col("doc_id"))
      },
      Some {
        val ws = sqlWords("text")
        def score(l: String) =
          s"CAST(list_sum(list_transform($ws, " +
            s"w -> ${sqlMd5Long(s"concat('$l:', w)")} % 1000)) AS BIGINT)"
        val cols = langs.map(l => s"${score(l)} AS s_$l").mkString(",\n  ")
        val best = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
        val pred = langs.reverse.foldLeft("'??'") { (e, l) =>
          s"CASE WHEN s_$l = best THEN '$l' ELSE $e END"
        }
        val sNames = langs.map(l => s"s_$l").mkString(", ")
        s"""SELECT doc_id, lang, $pred AS lang_pred, best AS best_score FROM (
           |  SELECT doc_id, lang, $sNames, $best AS best FROM (
           |    SELECT doc_id, lang, $cols FROM documents))
           |ORDER BY doc_id""".stripMargin
      }),

    // Document fingerprinting: mod-p selection over word-4-gram rolling
    // hashes (0-mod-8 winnowing) — the compact sketch used for fast
    // containment checks.
    "text_fingerprint" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val fps = filter(shingleHashes(col("text"), 4), h => h % 8 === 0)
        d.select(
            col("doc_id"),
            size(fps).cast(LongType).as("n_fp"),
            coalesce(array_min(fps), lit(-1L)).as("min_fp"),
            coalesce(array_max(fps), lit(-1L)).as("max_fp"))
          .orderBy(col("doc_id"))
      },
      Some {
        val fps = s"list_filter(${sqlShingleHashes("text", 4)}, h -> h % 8 = 0)"
        s"""SELECT doc_id,
           |  CAST(len($fps) AS BIGINT) AS n_fp,
           |  coalesce(list_min($fps), -1) AS min_fp,
           |  coalesce(list_max($fps), -1) AS max_fp
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    // N-GRAM NOVELTY — the n-gram-LM-free novelty signal: per document,
    // the fraction of its word bigrams that are corpus-RARE (total corpus
    // count ≤ 2). High novelty = content unlike the rest of the corpus
    // (fresh data or noise); near-zero = boilerplate/duplication. Exact
    // integer ppm. Scale shape: corpus bigram counts are ONE map-side-
    // combined aggregate keyed by 60-bit hash; the count table joins back
    // on the hash (both sides hash-partitioned, the standard big-join) and
    // the per-doc rollup is one more combine — no per-doc state anywhere.
    "text_ngram_novelty" -> QueryDef(
      (s, dir) => {
        import graft.functions.TextFunctions.{md5Long, shingles, words}
        // the corpus arrives as few(=1 locally) input splits; the per-word
        // hashing is the dominant cost and runs BEFORE any shuffle, so
        // spread the docs first (EXPLICIT-N round-robin: AQE coalesces a
        // keyed repartition's exchange right back to ~1 partition at this
        // byte size) — and cache the hashed bigrams: both the count build
        // and the join-back consume them (uncached they'd be tokenized +
        // hashed twice)
        val d = Tables.load(s, dir, "documents")
          .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)
        val hashed = d
          .select(col("doc_id"),
            explode(shingles(words(col("text")), 2)).as("bg"))
          .select(col("doc_id"), md5Long(col("bg")).as("h"))
          .cache()
        val counts = hashed.groupBy(col("h"))
          .agg(count(lit(1)).as("cnt"))
        hashed.join(counts, "h")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            sum(when(col("cnt") <= 2, 1L).otherwise(0L)).as("n_novel"))
          .selectExpr("doc_id", "n_bigrams", "n_novel",
            "(n_novel * 1000000) div n_bigrams AS novelty_ppm")
          .orderBy(col("doc_id"))
      },
      Some {
        import graft.functions.TextFunctions.{sqlMd5Long, sqlShingles, sqlWords}
        s"""WITH toks AS (
           |  SELECT doc_id, ws
           |  FROM (SELECT doc_id, ${sqlWords("text")} AS ws FROM documents)
           |  WHERE len(ws) > 1),
           |h AS (
           |  SELECT doc_id, ${sqlMd5Long("s")} AS h
           |  FROM (SELECT doc_id, unnest(${sqlShingles("ws", 2)}) AS s
           |        FROM toks)),
           |c AS (SELECT h, COUNT(*) AS cnt FROM h GROUP BY h)
           |SELECT doc_id, COUNT(*) AS n_bigrams,
           |  CAST(SUM(CASE WHEN cnt <= 2 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_novel,
           |  CAST(CAST(SUM(CASE WHEN cnt <= 2 THEN 1 ELSE 0 END) AS BIGINT)
           |    * 1000000 // COUNT(*) AS BIGINT) AS novelty_ppm
           |FROM h JOIN c USING (h)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin
      }),

    // TOP-P QUALITY SELECTION per language — "keep the best 25% of each
    // lang by quality score" — via DISTRIBUTED SELECTION, not a full
    // per-group sort: the corpus-sized side contributes only a
    // map-side-combined groupBy(lang, score) histogram; the k-th score
    // threshold comes from a cumulative sum over that (small) histogram;
    // full-kept scores filter by broadcast threshold; and only the docs
    // TIED at the threshold score (bounded by one histogram cell) pass
    // through a row_number to fill the remaining quota by doc_id. A
    // window over whole langs (5 partitions sorting 20M rows each at
    // 100 TB) never happens. Score = ⌊10⁶ · stopword_ratio⌋ in exact
    // integer division; k = ⌈n_lang/4⌉.
    "text_quality_topp" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val ws = words(col("text"))
        val nStop = size(filter(ws, w => w.isInCollection(stopwords)))
          .cast(LongType)
        val sc = d.select(col("doc_id"), col("lang"),
            (nStop * 1000000L).as("num"), size(ws).cast(LongType).as("den"))
          .selectExpr("doc_id", "lang", "num div den AS score")
        val grp = sc.groupBy(col("lang"), col("score"))
          .agg(count(lit(1)).as("c")).cache()
        val k = grp.groupBy(col("lang"))
          .agg(sum(col("c")).as("n"))
          .selectExpr("lang", "(n + 3) div 4 AS k")
        // above = docs STRICTLY better than this score (cumsum over the
        // distinct-score histogram, not the corpus)
        val wAbove = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("score").desc)
          .rowsBetween(Long.MinValue, -1)
        val ann = grp
          .withColumn("above", coalesce(sum(col("c")).over(wAbove), lit(0L)))
          .join(k, "lang")
        val fullKept = sc.join(
          broadcast(ann.filter(col("above") + col("c") <= col("k"))
            .select(col("lang"), col("score"))),
          Seq("lang", "score"))
        val partial = ann
          .filter(col("above") < col("k") && col("above") + col("c") > col("k"))
          .select(col("lang"), col("score"), (col("k") - col("above")).as("q"))
        val wTie = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang"), col("score")).orderBy(col("doc_id"))
        val tieKept = sc.join(broadcast(partial), Seq("lang", "score"))
          .withColumn("rk", row_number().over(wTie))
          .filter(col("rk") <= col("q"))
          .select(col("doc_id"), col("lang"), col("score"))
        fullKept.select(col("doc_id"), col("lang"), col("score"))
          .union(tieKept)
          .orderBy(col("lang"), col("doc_id"))
      },
      Some {
        val ws = sqlWords("text")
        val nStop = s"CAST(len(list_filter($ws, w -> w IN " +
          stopwords.mkString("('", "','", "')") + ")) AS BIGINT)"
        s"""WITH sc AS (
           |  SELECT doc_id, lang,
           |    ($nStop * 1000000) // CAST(len($ws) AS BIGINT) AS score
           |  FROM documents),
           |grp AS (SELECT lang, score, count(*) AS c FROM sc
           |        GROUP BY lang, score),
           |k AS (SELECT lang, (CAST(SUM(c) AS BIGINT) + 3) // 4 AS k
           |      FROM grp GROUP BY lang),
           |ann AS (
           |  SELECT g.lang, g.score, g.c, k.k,
           |    COALESCE(SUM(g.c) OVER (PARTITION BY g.lang
           |      ORDER BY g.score DESC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS above
           |  FROM grp g JOIN k USING (lang)),
           |full_kept AS (
           |  SELECT sc.doc_id, sc.lang, sc.score
           |  FROM sc JOIN ann ON sc.lang = ann.lang AND sc.score = ann.score
           |  WHERE ann.above + ann.c <= ann.k),
           |tie_kept AS (
           |  SELECT doc_id, lang, score FROM (
           |    SELECT sc.doc_id, sc.lang, sc.score,
           |      ann.k - ann.above AS q,
           |      ROW_NUMBER() OVER (PARTITION BY sc.lang, sc.score
           |        ORDER BY sc.doc_id) AS rk
           |    FROM sc JOIN ann ON sc.lang = ann.lang AND sc.score = ann.score
           |    WHERE ann.above < ann.k AND ann.above + ann.c > ann.k)
           |  WHERE rk <= q)
           |SELECT doc_id, lang, score FROM full_kept
           |UNION ALL SELECT doc_id, lang, score FROM tie_kept
           |ORDER BY lang, doc_id""".stripMargin
      }),

    // LANGUAGE-ID CONFUSION MATRIX — the eval primitive for any corpus
    // classifier: predicted (text_lang_id's unigram-profile argmax)
    // against the labeled language, as (true, predicted) counts plus the
    // per-true-language row fraction. The diagonal mass IS the
    // classifier's per-language recall, and the off-diagonal cells name
    // exactly which language pairs confuse — what a curation team reads
    // before trusting lang-conditioned sampling weights. Scale shape: the
    // classifier is a pure map over the scan (in-row score fold per
    // language, argmax over |langs| columns), then ONE map-side-combined
    // |langs|²-row aggregate; the row totals broadcast back onto the
    // matrix. All exact integers plus one 6-dp division.
    "text_langid_confusion" -> QueryDef(
      (s, dir) => {
        // |langs| md5 folds per document over a sub-split-size input file:
        // spread the scan explicitly or the whole classifier runs on one
        // core (same device as corpus_bigram_kn)
        val np = s.conf.get("spark.sql.shuffle.partitions").toInt
        val d = Tables.load(s, dir, "documents").repartition(np)
        val ws = words(col("text"))
        val scores = langs.map { l =>
          l -> aggregate(ws, lit(0L),
            (acc, w) => acc + md5Long(concat(lit(l + ":"), w)) % 1000)
        }
        val best = greatest(scores.map(_._2): _*)
        val pred = scores.foldRight(lit("??")) { case ((l, sc), e) =>
          when(sc === best, lit(l)).otherwise(e)
        }
        val cm = d.select(col("lang"), pred.as("lang_pred"))
          .groupBy(col("lang"), col("lang_pred"))
          .agg(count(lit(1)).as("n"))
        val tot = cm.groupBy(col("lang")).agg(sum(col("n")).as("n_true"))
        cm.join(broadcast(tot), "lang")
          .select(col("lang"), col("lang_pred"), col("n"), col("n_true"),
            round(col("n").cast(DoubleType) /
              col("n_true").cast(DoubleType), 6).as("row_frac"))
          .orderBy(col("lang"), col("lang_pred"))
      },
      Some {
        val ws = sqlWords("text")
        def score(l: String) =
          s"CAST(list_sum(list_transform($ws, " +
            s"w -> ${sqlMd5Long(s"concat('$l:', w)")} % 1000)) AS BIGINT)"
        val cols = langs.map(l => s"${score(l)} AS s_$l").mkString(",\n  ")
        val best = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
        val pred = langs.reverse.foldLeft("'??'") { (e, l) =>
          s"CASE WHEN s_$l = best THEN '$l' ELSE $e END"
        }
        s"""WITH p AS (
           |  SELECT lang, $pred AS lang_pred FROM (
           |    SELECT lang, $cols, $best AS best FROM (
           |      SELECT lang, text FROM documents))),
           |cm AS (
           |  SELECT lang, lang_pred, count(*) AS n
           |  FROM p GROUP BY lang, lang_pred),
           |tot AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_true
           |        FROM cm GROUP BY lang)
           |SELECT cm.lang, cm.lang_pred, CAST(cm.n AS BIGINT) AS n,
           |  tot.n_true,
           |  round(CAST(cm.n AS DOUBLE) / CAST(tot.n_true AS DOUBLE), 6)
           |    AS row_frac
           |FROM cm JOIN tot USING (lang)
           |ORDER BY cm.lang, cm.lang_pred""".stripMargin
      }),

    // VITERBI SEGMENTATION SCORING (unigram-LM tokenizer, SentencePiece
    // style) — the OTHER tokenizer family next to BPE: pieces are scored
    // by a deterministic table (md5-derived, standing in for learned log
    // probabilities), every word is segmented by the max-score
    // decomposition into pieces of length <= 4 under a per-piece penalty
    // of 600 (longer pieces amortize it — the unigram-LM tradeoff), and
    // the DP value is computed by an IN-ROW forward pass: dp[i] = max
    // over l of dp[i-l] + score(piece) - 600, the array built position
    // by position inside one aggregate fold. Reported for the 100 most
    // frequent words. 100 TB shape: the corpus contributes ONE
    // map-side-combined word count; the DP runs over the VOCAB table
    // (bounded by distinct words, not occurrences) — exactly how a real
    // unigram tokenizer scores its candidate vocabulary. The oracle
    // states the same recurrence as a recursive CTE over positions.
    "text_viterbi_segment" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val vocab = d.select(explode(words(col("text"))).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("word")).limit(100)
        // dp array built left to right: acc has dp[0..i-1] (1-indexed
        // element_at), candidate for length l guarded by a -10^15
        // sentinel where i < l (greatest() must not see NULLs — the
        // engines disagree on NULL handling)
        val neg = -1000000000000000L
        val cand = (1 to 4).map { l =>
          s"""CASE WHEN i >= $l THEN element_at(acc, i - $l + 1)
             |  + CAST(conv(substring(md5(concat('ulm:',
             |      substring(word, i - $l + 1, $l))), 1, 15), 16, 10)
             |    AS BIGINT) % 1000 - 600
             |ELSE CAST($neg AS BIGINT) END""".stripMargin
        }.mkString("greatest(", ",\n", ")")
        vocab.selectExpr("word", "n", "length(word) AS len",
            s"""element_at(
               |  aggregate(sequence(1, length(word)),
               |    array(CAST(0 AS BIGINT)),
               |    (acc, i) -> concat(acc, array($cand))),
               |  length(word) + 1) AS best_score""".stripMargin)
          .orderBy(col("n").desc, col("word"))
      },
      Some {
        val ws = sqlWords("text")
        def sc(piece: String) =
          s"CAST(concat('0x', substr(md5(concat('ulm:', $piece)), 1, 15)) " +
            s"AS BIGINT) % 1000"
        val cand = (1 to 4).map { l =>
          s"""CASE WHEN dp.i + 1 >= $l THEN dp.arr[dp.i + 1 - $l + 1]
             |  + ${sc(s"substr(dp.word, dp.i + 1 - $l + 1, $l)")} - 600
             |ELSE -1000000000000000 END""".stripMargin
        }.mkString("greatest(", ",\n", ")")
        s"""WITH RECURSIVE vocab AS (
           |  SELECT word, count(*) AS n FROM (
           |    SELECT unnest($ws) AS word FROM documents)
           |  GROUP BY word ORDER BY n DESC, word LIMIT 100),
           |dp(word, n, i, arr) AS (
           |  SELECT word, n, 0, [CAST(0 AS BIGINT)] FROM vocab
           |  UNION ALL
           |  SELECT dp.word, dp.n, dp.i + 1,
           |    list_append(dp.arr, CAST($cand AS BIGINT))
           |  FROM dp WHERE dp.i < length(dp.word))
           |SELECT word, n, CAST(length(word) AS BIGINT) AS len,
           |  arr[length(word) + 1] AS best_score
           |FROM dp WHERE i = length(word)
           |ORDER BY n DESC, word""".stripMargin
      }),

    // WINNOWING FINGERPRINTS (min-in-window selection) — the other
    // canonical local fingerprinting scheme next to text_fingerprint's
    // mod-p sieve: over the POSITIONAL word-4-gram rolling-hash sequence,
    // each length-8 window contributes its minimum hash, and the distinct
    // selected set is the document's fingerprint. Unlike mod-p, winnowing
    // GUARANTEES a fingerprint within every w consecutive k-grams, so any
    // shared substring of >= w+k-1 words is always detected — the
    // detection-floor property plagiarism/overlap pipelines rely on.
    // Per-row pure map (the window slides INSIDE the row over a
    // length-bounded list); no shuffle but the presentation sort; exact
    // integers end to end. The selection runs in the native [[WinnowedFps]]
    // expression — the HOF formulation re-evaluates the positional hash
    // tree per window position (O(n²·w) digests/doc), so native here is
    // the difference between <1 s and minutes at sf0.1.
    "text_winnowing" -> QueryDef(
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val wf = d.select(col("doc_id"),
          winnowedFps(col("text"), 4, 8).as("wf"))
        wf.select(col("doc_id"),
            col("wf.n_kgrams").as("n_kgrams"),
            col("wf.fps").as("fps"),
            greatest(col("wf.n_kgrams") - lit(7L), lit(1L)).as("m"))
          .select(
            col("doc_id"),
            col("n_kgrams"),
            when(col("n_kgrams") >= 1, size(col("fps")))
              .otherwise(0).cast(LongType).as("n_fp"),
            when(col("n_kgrams") >= 1, array_min(col("fps")))
              .otherwise(-1L).as("min_fp"),
            when(col("n_kgrams") >= 1, array_max(col("fps")))
              .otherwise(-1L).as("max_fp"),
            col("m"))
          .selectExpr("doc_id", "n_kgrams", "n_fp", "min_fp", "max_fp",
            "(n_fp * 1000000) div m AS density_ppm")
          .orderBy(col("doc_id"))
      },
      Some {
        val hs = s"list_transform(${sqlShingles(sqlWords("text"), 4)}, " +
          s"s -> ${sqlMd5Long("s")})"
        s"""WITH h AS (
           |  SELECT doc_id, hs, len(hs) AS n, greatest(len(hs)-7, 1) AS m
           |  FROM (SELECT doc_id, $hs AS hs FROM documents)),
           |sel AS (
           |  SELECT doc_id, n, m,
           |    CASE WHEN n >= 1 THEN list_distinct(list_transform(
           |      range(0, m), i -> list_min(hs[i+1:i+8]))) END AS fp
           |  FROM h)
           |SELECT doc_id, CAST(n AS BIGINT) AS n_kgrams,
           |  CAST(CASE WHEN n >= 1 THEN len(fp) ELSE 0 END AS BIGINT) AS n_fp,
           |  CASE WHEN n >= 1 THEN list_min(fp) ELSE -1 END AS min_fp,
           |  CASE WHEN n >= 1 THEN list_max(fp) ELSE -1 END AS max_fp,
           |  CASE WHEN n >= 1
           |    THEN (CAST(len(fp) AS BIGINT) * 1000000) // m
           |    ELSE 0 END AS density_ppm
           |FROM sel ORDER BY doc_id""".stripMargin
      }),

    // FEATURE-HASHING COLLISION AUDIT — before a pipeline commits to the
    // hashing trick (n-gram features at a fixed 2^12 bucket width, the
    // standard vocab-free featurizer), this measures what the width
    // costs: the bucket-occupancy histogram of the corpus' distinct
    // 3-shingle feature space under the production 60-bit hash folded
    // mod 4096. occupancy = 1 buckets are collision-free; n_features at
    // occupancy ≥ 2 is exactly the feature mass that aliases. One
    // distinct shuffle (feature space), then two map-side-combined
    // aggregates — audit cost is feature-space-bounded, never
    // corpus-bounded.
    "text_hash_collision_audit" -> QueryDef(
      (s, dir) => {
        val feats = Tables.load(s, dir, "documents")
          .select(explode(shingleHashes(col("text"), 3)).as("h"))
          .distinct()
        feats.select((col("h") % 4096L).as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("occ"))
          .groupBy(col("occ"))
          .agg(count(lit(1)).as("n_buckets"),
            sum(col("occ")).as("n_features"))
          .orderBy(col("occ"))
      },
      Some {
        s"""WITH feats AS (
           |  SELECT DISTINCT unnest(${sqlShingleHashes("text", 3)}) AS h
           |  FROM documents),
           |b AS (
           |  SELECT h % 4096 AS bucket, count(*) AS occ
           |  FROM feats GROUP BY bucket)
           |SELECT CAST(occ AS BIGINT) AS occ,
           |  CAST(count(*) AS BIGINT) AS n_buckets,
           |  CAST(sum(occ) AS BIGINT) AS n_features
           |FROM b GROUP BY occ ORDER BY occ""".stripMargin
      })
  )
}
