package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Physical-plan contracts for the headline queries — the properties that
  * keep them fast at 100 TB (filter/column pushdown into the parquet scan,
  * broadcast of dimension sides, bounded shuffle counts). A regression that
  * silently turns a broadcast join into a shuffle join or stops pushing a
  * filter fails here, not in a benchmark eyeball. */
class PlanSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)

  private def executed(df: DataFrame): SparkPlan = {
    df.collect() // force AQE to finalize the plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def formatted(df: DataFrame): String = executed(df).toString

  test("q1: ship-date filter and column pruning reach the parquet scan") {
    val plan = formatted(q("q1_pricing_summary"))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "LessThanOrEqual(l_shipdate"), plan)
    // projection needs 7 of 11 lineitem columns — scan must not read e.g. l_partkey
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.contains("l_partkey"), "scan reads pruned column l_partkey")
  }

  test("q5: all dimension joins broadcast; no shuffle join of dims") {
    // string-match the final plan: AQE hides stage subtrees from collect()
    val plan = formatted(q("q5_local_supplier_volume"))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts")
    // the only non-broadcast join allowed is lineitem⋈orders (fact-fact)
    val smj = "SortMergeJoin".r.findAllIn(plan).size
    assert(smj <= 1, s"unexpected shuffle joins: $smj")
  }

  test("dedup_exact: exactly one shuffle (the hash-groupBy)") {
    val plan = executed(q("dedup_exact"))
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    // one for the groupBy, one for the presentation orderBy (range part.)
    assert(shuffles.size <= 2, s"got ${shuffles.size} shuffles")
  }

  test("text analysis queries are map-only before the presentation sort") {
    for (name <- Seq("text_token_count", "text_quality_score",
        "text_lang_id", "text_fingerprint", "text_winnowing")) {
      val plan = executed(q(name))
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.size <= 1, s"$name: ${shuffles.size} shuffles (want <=1)")
    }
  }

  test("cdc source: column pruning is pushed into the scan") {
    // build a tiny file CDC db and project 1 payload + 1 metadata column
    val dir = tmpDir("plan-cdc-prune")
    import spark.implicits._
    graft.cdc.FileCdcDatabase.write(spark, dir, "t", "graft", "id",
      snapshot = (1L to 10L).map(i => (i, s"v$i", i * 2)).toDF("id", "v", "w"),
      changes = spark.emptyDataFrame.sparkSession.createDataFrame(
        spark.sparkContext.parallelize(Seq.empty[org.apache.spark.sql.Row]),
        graft.cdc.ChangeRecord.envelopeSchema(
          org.apache.spark.sql.types.StructType.fromDDL(
            "id BIGINT, v STRING, w BIGINT"))),
      force = true)
    val df = spark.read.format("graft-cdc")
      .option("path", dir).option("table", "t")
      .option("scan.startup.mode", "initial").load()
      .select("id", "__offset")
    val scanOut = executed(df).collectLeaves().head.output.map(_.name)
    assert(scanOut === Seq("id", "__offset"),
      s"scan must emit only required columns, got $scanOut")
  }

  test("ann_bruteforce: query side broadcast, no cartesian shuffle") {
    val plan = formatted(q("ann_bruteforce_topk"))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
  }

  test("dedup_simhash: banded self-join, never a per-language cross product") {
    val plan = formatted(q("dedup_simhash"))
    // the candidate join must be an equi-join on the band key — a
    // language-only block would surface as BroadcastNestedLoopJoin/cartesian
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), plan)
  }

  test("ann queries: norms computed map-side, not per candidate pair") {
    // the join output must carry precomputed norm columns; a per-pair norm
    // recomputation would fold the 64-dim array 3x per candidate
    val plan = formatted(q("ann_ivf_topk"))
    assert(plan.contains("nrm"), plan.take(2000))
  }

  test("q10: dimension joins broadcast, single agg shuffle shape") {
    val plan = formatted(q("q10_returned_revenue"))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 2, s"expected >=2 broadcast joins, got $broadcasts")
  }

  test("q17: per-part aggregate side broadcasts back onto the fact") {
    val plan = formatted(q("q17_small_quantity_revenue"))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("dedup_embedding_cosine_ivf: centroids broadcast for assignment") {
    val plan = formatted(q("dedup_embedding_cosine_ivf"))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("sample_stratified: pure map before the presentation sort") {
    val plan = executed(q("sample_stratified"))
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 1, s"${shuffles.size} shuffles (want sort only)")
  }

  test("vec_quantize_int8: scalar scale broadcast, no shuffle join") {
    val plan = formatted(q("vec_quantize_int8"))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("q_bucketed_colocated_join: no exchange under the join") {
    val df = q("q_bucketed_colocated_join")
    val plan = executed(df)
    assert(formatted(df).contains("SortMergeJoin"), formatted(df).take(2000))
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    // only the aggregation and the presentation sort may shuffle — the
    // join itself consumes the buckets' partitioning
    assert(shuffles.size <= 2,
      s"${shuffles.size} shuffles — bucketing not consumed:\n" +
        formatted(df).take(3000))
  }

  test("pack_sequences: cumsum never collapses to a single-partition window") {
    val plan = formatted(q("pack_sequences"))
    // the two-phase cumsum windows over __pid partitions; a regression to
    // a global Window.orderBy would show an Exchange SinglePartition
    assert(!plan.contains("Exchange SinglePartition"),
      s"global single-partition window detected:\n${plan.take(3000)}")
  }

  test("text_tfidf_topk: df table and corpus size broadcast onto tf") {
    val plan = formatted(q("text_tfidf_topk"))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size +
      "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(broadcasts >= 2, s"expected >=2 broadcast joins:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("text_repetition_filter: pure map before the presentation sort") {
    val plan = executed(q("text_repetition_filter"))
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 1, s"${shuffles.size} shuffles (want <=1)")
  }

  test("text_decontaminate: eval index broadcast onto the train side") {
    // the 100 TB side (exploded train shingles) must meet the eval index
    // via broadcast — a SortMergeJoin here would shuffle the whole corpus
    val plan = formatted(q("text_decontaminate"))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("text_boilerplate_frac: no shuffle join reaches the corpus side") {
    // df-table build is the one legitimate wide shuffle; the hot-set join
    // back and the per-doc left join must broadcast their small sides. At
    // tiny SF, AQE sees the hot set is EMPTY and deletes the joins outright
    // (null-padded project) — also acceptable: the contract is only that no
    // SortMergeJoin ever lands on the corpus side.
    val plan = formatted(q("text_boilerplate_frac"))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("ann_ivf_train: centroid assignment broadcasts, never shuffle-joins") {
    // each Lloyd iteration must broadcast the K centroids onto the vector
    // scan (BroadcastNestedLoopJoin under crossJoin) — an SMJ would shuffle
    // the full vector table per iteration
    val plan = formatted(q("ann_ivf_train"))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q6: all three predicates and the projection reach the parquet scan") {
    val plan = formatted(q("q6_forecast_revenue"))
    assert(plan.contains("PushedFilters"), plan.take(2000))
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(plan.contains(s"IsNotNull($c)"), s"filter on $c not pushed:\n" +
        plan.take(2000))
    // 4-column projection must prune the other 7 lineitem columns
    assert(!plan.contains("l_partkey"), "scan reads pruned column l_partkey")
  }

  test("q8: dims broadcast; only the fact join may sort-merge") {
    val plan = formatted(q("q8_market_share"))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts")
    val smj = "SortMergeJoin".r.findAllIn(plan).size
    assert(smj <= 1, s"unexpected shuffle joins: $smj\n${plan.take(3000)}")
  }

  test("q14/q19: part side broadcasts onto the lineitem scan") {
    for (name <- Seq("q14_promo_revenue", "q19_discounted_revenue")) {
      val plan = formatted(q(name))
      assert(plan.contains("BroadcastHashJoin"), s"$name:\n${plan.take(2000)}")
      assert(!plan.contains("SortMergeJoin"), s"$name:\n${plan.take(2000)}")
    }
  }

  test("dedup_substring_spans: equi-joins only; min-combine index groupBy") {
    val plan = formatted(q("dedup_substring_spans"))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    // the span index aggregate must have a map-side partial (partial min
    // collapses hot boilerplate spans before the shuffle)
    assert(plan.contains("partial_min") || plan.contains("partial min"),
      s"span index min not partially aggregated:\n${plan.take(3000)}")
  }

  test("sketch_kmv_distinct: no single-partition collapse, bounded shuffles") {
    val df = q("sketch_kmv_distinct")
    val plan = formatted(df)
    // the k-minima merge is a two-stage grouped agg — a regression to a
    // global window/sort would show Exchange SinglePartition
    assert(!plan.contains("Exchange SinglePartition"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("sample_mixture: stratum stats broadcast onto a pure map") {
    val plan = formatted(q("sample_mixture"))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size +
      "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(broadcasts >= 2, s"expected >=2 broadcast joins:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("text_pii_redact: pure map before the presentation sort") {
    val plan = executed(q("text_pii_redact"))
    val shuffles = plan.collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.size <= 1, s"${shuffles.size} shuffles (want <=1: sort)")
  }

  test("text_rare_word_frac: common set broadcast onto the exploded scan") {
    val plan = formatted(q("text_rare_word_frac"))
    // the common-word set and the n_docs scalar must broadcast — a
    // shuffle join against the (unbounded) token stream is the regression
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 1, plan.take(2000))
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size >= 1,
      plan.take(2000))
  }

  test("sketch_source_overlap: sketch pairing never cartesians the corpus") {
    val plan = formatted(q("sketch_source_overlap"))
    // the 20×20 sketch cross join is fine (broadcast NLJ over sketch rows);
    // the corpus-side exact check must stay an equi-join on the hash
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // KMV local-minima stage: no global single-partition collapse
    assert(!plan.contains("Exchange SinglePartition"), plan.take(3000))
  }

  test("dedup_keep_best: cluster election is an aggregate, not a window") {
    val plan = formatted(q("dedup_keep_best"))
    // max_by partial-aggregates map-side; a ROW_NUMBER window regression
    // would materialize every cluster member through one partition
    assert(!plan.contains("RunningWindowFunction"), plan.take(2000))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(3000))
  }

  test("text_quality_topp: thresholds broadcast; corpus never window-sorted") {
    val plan = formatted(q("text_quality_topp"))
    // full-kept + tie-quota threshold tables must broadcast onto the
    // scored scan — a shuffle join (or a per-lang window over the whole
    // corpus) is the scale regression this query exists to avoid
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("ann_pq queries: codebook and LUT broadcast onto the corpus") {
    // train reads the stored model artifact (codebook + per-cluster
    // codes): one broadcast of the M·K-sized stats onto the codebook.
    // topk keeps two: the LUT build broadcasts the codebook onto the
    // query sub-vectors, and the search broadcasts the LUT onto the
    // stored codes — the corpus-sized side never builds a hash table.
    for ((name, minBhj) <- Seq("ann_pq_train" -> 1, "ann_pq_topk" -> 2)) {
      val plan = formatted(q(name))
      assert("BroadcastHashJoin".r.findAllIn(plan).size >= minBhj,
        s"$name: ${plan.take(3000)}")
      assert(!plan.contains("CartesianProduct"), s"$name: ${plan.take(3000)}")
    }
  }

  test("embed_power_iteration: dense-v map + one 64-key agg, " +
    "no join or shuffle of the N-sized side") {
    val plan = formatted(q("embed_power_iteration"))
    // the iterate is a literal array: Ev must be a pure map over the
    // cached vectors — any join of the big side is the scale regression
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // only dimension-sized exchanges: the 64-key aggregation (+ the 1-row
    // max broadcast); never a hashpartitioning(vec_id) of the corpus
    assert(!plan.contains("hashpartitioning(vec_id"), plan.take(3000))
  }

  test("graph_triangles: wedge close is an equi-join, never a cross product") {
    val plan = formatted(q("graph_triangles"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("chunk_content_defined: in-row array computation — one input " +
    "spread, then no further hash-shuffle, join, or window") {
    val plan = formatted(q("chunk_content_defined"))
    // the only hash exchanges allowed are the explicit doc_id spread of
    // the (few) input splits (REPARTITION_BY_COL, printed once per cached
    // -subtree render); an ENSURE_REQUIREMENTS hash exchange would mean a
    // join/aggregate shuffle of the corpus snuck in
    val ensured = "Exchange hashpartitioning[^\\n]*ENSURE_REQUIREMENTS".r
    assert(ensured.findAllIn(plan).isEmpty, plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
  }

  test("text_ngram_novelty: hash-keyed count join, no cross product") {
    val plan = formatted(q("text_ngram_novelty"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // the per-doc rollup and the count table must both partial-aggregate
    assert("partial_count|partial_sum".r.findAllIn(plan).nonEmpty,
      plan.take(3000))
  }

  test("curation_epoch_shuffle: rank parallelizes by shard — no global " +
      "single-partition sort") {
    val plan = formatted(q("curation_epoch_shuffle"))
    // the rank window must partition by shard; a missing partition spec
    // collapses the whole corpus into Exchange SinglePartition
    assert(!plan.contains("Exchange SinglePartition"), plan.take(3000))
    assert(plan.contains("Window"), plan.take(2000))
    // per-shard summary partial-aggregates before its exchange
    assert("partial_sum|partial_count".r.findAllIn(plan).nonEmpty,
      plan.take(3000))
  }

  test("embed_class_centroids: scale broadcast, one map-side-combined agg") {
    val plan = formatted(q("embed_class_centroids"))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size +
      "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(broadcasts >= 1, s"scale must broadcast:\n${plan.take(2000)}")
    assert(plan.contains("partial_sum"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("embed_outlier_filter: centroid/threshold broadcasts onto the scan " +
      "— the corpus is never single-partition sorted") {
    val plan = formatted(q("embed_outlier_filter"))
    // the histogram threshold must come back as a broadcast; a window over
    // the VECTORS (not the ≤1001-row histogram) would single-partition a
    // whole class
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size +
      "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(broadcasts >= 3, s"expected >=3 broadcast joins:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(plan.contains("partial_sum"), plan.take(3000))
  }

  test("corpus_mix_report: two-level rollup, everything partial-aggregated") {
    val plan = formatted(q("corpus_mix_report"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      plan.take(3000))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(3000))
  }

  test("text_vocab_coverage: top-V vocab broadcasts onto the token stream " +
      "— the corpus is never globally sorted") {
    val plan = formatted(q("text_vocab_coverage"))
    // top-V by count must be a TakeOrdered (bounded heap per partition),
    // not a global Sort of the word-count table
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 1, s"vocab must broadcast:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("text_oov_bigram_rate: reference membership is an equi-join, " +
      "never a broadcast of the unbounded reference set") {
    val plan = formatted(q("text_oov_bigram_rate"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // per-doc rollup is map-side combined
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      plan.take(3000))
  }

  test("retrieval_hard_negatives: query set broadcast onto the corpus scan; " +
      "ranking is the only wide shuffle") {
    val plan = formatted(q("retrieval_hard_negatives"))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size +
      "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(broadcasts >= 1, s"query side must broadcast:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("sample_cluster_downweight: keep decision is a map after keyed " +
      "joins — the corpus is never window-sorted") {
    val plan = formatted(q("sample_cluster_downweight"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(3000))
  }

  test("mm_phash_neardup: band bucket join is an equi-join — " +
      "non-colliding pairs never materialize") {
    val plan = formatted(q("mm_phash_neardup"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("corpus_filter_funnel: drop set broadcasts onto the scan; stage " +
      "attribution is a map into a tiny aggregate") {
    val plan = formatted(q("corpus_filter_funnel"))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 1, s"drop set must broadcast:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      plan.take(3000))
  }

  test("pack_balanced_shards: global size rank is the distributed prefix " +
      "device — never a single-partition window") {
    val plan = formatted(q("pack_balanced_shards"))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("text_bpe_apply: per-round corpus cost is a 1-row broadcast rule " +
      "onto a map — no shuffle join of the corpus") {
    val plan = formatted(q("text_bpe_apply"))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("embed_dim_stats: scale broadcast, one map-side-combined Dim-key agg") {
    val plan = formatted(q("embed_dim_stats"))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size +
      "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(broadcasts >= 1, s"scale must broadcast:\n${plan.take(2000)}")
    assert(plan.contains("partial_sum"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("dedup_inflation_by_source: distinct-count shuffles digests, " +
      "never the documents") {
    val plan = formatted(q("dedup_inflation_by_source"))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(3000))
    assert(plan.contains("partial_count"), plan.take(3000))
    // the distinct-count exchange hashes on (source, h) — the md5 digest —
    // so no Exchange partitions on the raw text column
    assert(!"hashpartitioning\\([^)]*text#".r.findFirstIn(plan).isDefined,
      plan.take(3000))
  }

  test("ann_radius_count: broadcast query set, conditional aggregate — " +
      "no window, no per-query sort") {
    val plan = formatted(q("ann_radius_count"))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size +
      "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(broadcasts >= 1, s"query set must broadcast:\n${plan.take(2000)}")
    assert(!plan.contains("Window"), plan.take(3000))
    assert(plan.contains("partial_sum"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("text_zipf_histogram: map-side-combined count into a tiny rollup, " +
      "no join") {
    val plan = formatted(q("text_zipf_histogram"))
    assert(plan.contains("partial_count"), plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("text_surprisal_filter: count-table membership is equi-joins — " +
      "never a cross product or unbounded broadcast") {
    val plan = formatted(q("text_surprisal_filter"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("partial_count"), plan.take(3000))
  }

  test("corpus_heaps_curve: corpus bound broadcasts; first-occurrence is " +
      "map-side-combined") {
    val plan = formatted(q("corpus_heaps_curve"))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size +
      "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(broadcasts >= 1, s"1-row bound must broadcast:\n${plan.take(2000)}")
    assert(plan.contains("partial_min"), plan.take(3000))
  }

  test("curation_score_cdf: cumulative window runs per source over the " +
      "histogram — never a single-partition corpus sort") {
    val plan = formatted(q("curation_score_cdf"))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(3000))
    assert(plan.contains("Window"), plan.take(3000))
    assert(plan.contains("partial_count"), plan.take(3000))
  }

  test("dedup_minhash_estimate: candidate generation is the banded " +
      "equi-join — non-colliding pairs never materialize") {
    val plan = formatted(q("dedup_minhash_estimate"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("q_event_transitions: lag window parallelizes by user — no " +
      "single-partition event sort") {
    val plan = formatted(q("q_event_transitions"))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(3000))
    assert(plan.contains("Window"), plan.take(2000))
    assert(plan.contains("partial_count"), plan.take(3000))
  }

  test("retrieval_rrf_topk: both rank windows share one query_id " +
      "partitioning — a single wide exchange, queries broadcast") {
    val plan = formatted(q("retrieval_rrf_topk"))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size +
      "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(broadcasts >= 1, s"query set must broadcast:\n${plan.take(2000)}")
    val qidExchanges =
      "Exchange hashpartitioning\\(query_id".r.findAllIn(plan).size
    assert(qidExchanges <= 1,
      s"rank windows must reuse one query_id exchange, got $qidExchanges")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("text_langid_confusion: classifier is a pure map; matrix is " +
      "map-side-combined; totals broadcast back") {
    val plan = formatted(q("text_langid_confusion"))
    assert(plan.contains("partial_count"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(3000))
  }

  test("pack_efficiency_report: bin fills come from the distributed " +
      "prefix device — never a single-partition corpus window") {
    val plan = formatted(q("pack_efficiency_report"))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(3000))
    assert(plan.contains("partial_count"), plan.take(3000))
  }

  test("sketch_quantile_merge: global bounds broadcast; shard histograms " +
      "partial-aggregate before any exchange") {
    val plan = formatted(q("sketch_quantile_merge"))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size +
      "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(broadcasts >= 1, s"bounds must broadcast:\n${plan.take(2000)}")
    assert(plan.contains("partial_count"), plan.take(3000))
  }

  test("curation_token_budget: one map-side-combined source aggregate; " +
      "plan math rides a broadcast") {
    val plan = formatted(q("curation_token_budget"))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size +
      "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(broadcasts >= 1, s"totals must broadcast:\n${plan.take(2000)}")
    assert(plan.contains("partial_count"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("q_interarrival_hist: the lag window partitions by user — never " +
      "a single-partition global sort") {
    val plan = formatted(q("q_interarrival_hist"))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(3000))
    assert(plan.contains("partial_count"), plan.take(3000))
  }

  test("monitoring recurrences: hourly counts map-side combine and the " +
      "firehose never hits a single-partition exchange") {
    for (name <- Seq("q_events_ewma", "q_events_cusum")) {
      val plan = formatted(q(name))
      assert(plan.contains("partial_count"), s"$name:\n${plan.take(2000)}")
      assert(!plan.contains("Exchange SinglePartition"),
        s"$name:\n${plan.take(2000)}")
    }
  }

  test("embed_covariance: in-row triangle expansion map-side combines to " +
      "2080 rows; the tri-index and dim sums broadcast") {
    val plan = formatted(q("embed_covariance"))
    assert(plan.contains("partial_count"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("embed_source_shift: one (source, dim) map-side aggregate; pair " +
      "math never re-scans or shuffle-joins the corpus") {
    val plan = formatted(q("embed_source_shift"))
    assert(plan.contains("partial_sum"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("mm_scene_cuts: codec map + one doc-partitioned window — payloads " +
      "never shuffle more than once") {
    val plan = executed(q("mm_scene_cuts"))
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    // one exchange for the doc_id window/rollup + the presentation sort
    assert(shuffles.size <= 2, s"${shuffles.size} shuffles (want <=2)")
  }

  test("cdc_scd2_history: one pk window shuffle, never a global sort " +
      "before the presentation order") {
    val plan = formatted(q("cdc_scd2_history"))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(3000))
  }

  test("q_event_zscore_anomaly: hourly counts map-side combine; the " +
      "per-type moment table broadcasts back") {
    val plan = formatted(q("q_event_zscore_anomaly"))
    assert(plan.contains("partial_count"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("corpus_pmi_topk: top-k is a TakeOrdered, never a global sort; " +
      "corpus totals ride a broadcast") {
    // the tokenize/count cascade now executes eagerly inside the
    // partition pin (the returned frame is the checkpointed top-k) —
    // assert the contracts on the INTERNAL plan it cut
    val df = q("corpus_pmi_topk")
    val plan = executed(df)
    val fileScans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(fileScans.isEmpty,
      s"final frame re-scans parquet: ${fileScans.size}")
    assert(plan.toString.contains("Scan ExistingRDD"),
      plan.toString.take(2000))
    // top-k contract survives at the row level: bounded size, sorted by
    // (lift desc, bigram), c12 >= the calibration floor
    val rows = df.collect()
    assert(rows.length <= 24) // PmiTopK
    val lifts = rows.map(r => (r.getDouble(4), r.getString(0)))
    assert(lifts.sameElements(lifts.sortBy { case (l, b) => (-l, b) }))
    assert(rows.forall(_.getLong(1) >= 8L)) // PmiMinCount floor
  }

  test("retrieval_mmr_topk: greedy rounds re-rank the cached candidate " +
      "set — the corpus is scanned for retrieval only") {
    val df = q("retrieval_mmr_topk")
    val rows = df.collect()
    val plan = executed(df)
    // every greedy round is barrier-cut and reads cand/sims from cache —
    // the final plan's leaves are the checkpointed round results (RDD
    // scans), never a fresh parquet scan of the corpus
    val fileScans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(fileScans.isEmpty,
      s"greedy rounds re-scan parquet: ${fileScans.size}")
    assert(plan.toString.contains("Scan ExistingRDD"),
      plan.toString.take(2000))
    // greedy invariants: 5 distinct picks per query, pick 1 = max relevance
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (qid, rs) =>
      assert(rs.map(_.getLong(2)).distinct.length === rs.length,
        s"query $qid repeated a pick")
      val p1 = rs.find(_.getLong(1) == 1L).get
      assert(p1.getLong(3) === rs.map(_.getLong(3)).max,
        s"query $qid pick 1 is not max relevance")
    }
  }
  test("sample_leakage_split: cluster table broadcasts; corpus never " +
    "cartesians (1-row leak count joins are nested-loop by design)") {
    val plan = formatted(q("sample_leakage_split"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 1, plan.take(3000))
  }

  test("sample_source_budget: the only corpus-sized stage is one " +
    "map-side-combined rollup; windows run on the sources-sized frame") {
    // string-match the final plan: AQE hides stage subtrees from collect()
    val plan = formatted(q("sample_source_budget"))
    // the corpus aggregate must have a partial stage (map-side combine)
    assert(plan.contains("partial_sum"),
      s"corpus rollup lost its map-side combine:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }
  test("corpus_duplicate_ngrams: one map-side-combined digest aggregate, " +
    "top-k take — no corpus-sized sort or join") {
    val plan = formatted(q("corpus_duplicate_ngrams"))
    assert(plan.contains("partial_count") || plan.contains("partial_"),
      s"spread count lost its map-side combine:\n${plan.take(3000)}")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a TakeOrdered, not a global sort:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("sample_importance_ratio: digest-keyed equi-joins only, top-k take") {
    val plan = formatted(q("sample_importance_ratio"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("dedup_bbit_minwise: banded equi-join candidates, never a " +
    "signature cross product") {
    val plan = formatted(q("dedup_bbit_minwise"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("text_bpe_compression: artifact read + one partial-agg rollup") {
    val plan = formatted(q("text_bpe_compression"))
    assert(plan.contains("partial_"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("er_blocked_match: candidates come from the block-key equi-join — " +
    "never an unblocked name x name product") {
    val plan = formatted(q("er_blocked_match"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("privacy_k_anonymity: one map-side-combined cell aggregate, " +
    "no join of the record side") {
    val plan = formatted(q("privacy_k_anonymity"))
    assert(plan.contains("partial_count"),
      s"cell count lost its map-side combine:\n${plan.take(3000)}")
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("corpus_snapshot_diff: versions meet in one full-outer equi-join " +
    "on the id; report is a map-side-combined rollup") {
    val plan = formatted(q("corpus_snapshot_diff"))
    assert(plan.contains("FullOuter"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("partial_count"), plan.take(3000))
  }

  test("retrieval_mrr_eval: composes the verified searches; the eval " +
    "join is queries-sized — no corpus product") {
    val plan = formatted(q("retrieval_mrr_eval"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("privacy_l_diversity: distinct-count shuffles (cell, band) keys, " +
    "never records; no join of the record side") {
    val plan = formatted(q("privacy_l_diversity"))
    assert(plan.contains("partial_"), plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("corpus_idf_drift: per-version df counts map-side combine; " +
    "top-50 is a TakeOrdered, never a global sort") {
    val plan = formatted(q("corpus_idf_drift"))
    assert(plan.contains("partial_count"), plan.take(3000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("q_event_attribution: one user-partitioned window — the firehose " +
    "never self-joins") {
    val plan = formatted(q("q_event_attribution"))
    assert(!plan.contains("Join"), plan.take(3000))
    assert(plan.contains("partial_count"), plan.take(3000))
  }

  test("er_entity_clusters: closure rides the star-contraction CC — " +
    "blocked candidates in, no all-pairs closure") {
    val plan = formatted(q("er_entity_clusters"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("mm_audio_vad: codec map + doc-partitioned islands — " +
    "payloads never cartesian, rollups map-side combine") {
    val plan = formatted(q("mm_audio_vad"))
    assert(plan.contains("partial_count"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("q_timeseries_gapfill: one map-side-combined count; the grid " +
    "derives from a broadcast 1-row bound, never the corpus") {
    val plan = formatted(q("q_timeseries_gapfill"))
    assert(plan.contains("partial_count"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("curation_score_equalize: histogram-level percentile/inverse-CDF; " +
    "the per-doc mapping is a broadcast equi-join — corpus never sorted") {
    val plan = formatted(q("curation_score_equalize"))
    assert(plan.contains("partial_count"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("text_viterbi_segment: the DP runs over the vocab (TakeOrdered " +
    "top-k); the corpus contributes one map-side-combined count") {
    val plan = formatted(q("text_viterbi_segment"))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(plan.contains("partial_count"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("q_concurrent_sessions: per-type sweep window; peak joins back " +
    "by broadcast — no firehose self-join") {
    val plan = formatted(q("q_concurrent_sessions"))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("q_reconciliation_audit: one map-side-combined per-order sum, " +
    "one header-lines equi-join, tiny rollup") {
    val plan = formatted(q("q_reconciliation_audit"))
    assert(plan.contains("partial_sum"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("q_referential_integrity: orphan checks are anti equi-joins " +
    "(1-row count combines are nested-loop by design)") {
    val plan = formatted(q("q_referential_integrity"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("LeftAnti"), plan.take(3000))
  }

  test("embed_pca_top2: final deflated round touches the corpus once — " +
    "one scan + one 64-row shuffle; deflation algebra on 64-row tables") {
    val df = q("embed_pca_top2")
    val plan = formatted(df)
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // deflation/renorm joins are broadcasts of 1-to-64-row tables
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(df.count() === 64)
  }

  test("q_equidepth_histogram: quartile cuts come off the bounded " +
    "histogram cumsum; buckets CASE against broadcast cuts — " +
    "never a per-type sort of the events") {
    val plan = formatted(q("q_equidepth_histogram"))
    assert(plan.contains("partial_count"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("corpus_burstiness: two chained map-side combines, top-20 " +
    "TakeOrdered — corpus scanned once, nothing sorted") {
    val plan = formatted(q("corpus_burstiness"))
    assert(plan.contains("partial_count"), plan.take(3000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("text_textrank_keywords: corpus stages ran distributed during " +
    "construction; the vocab-capped walk is driver-held, so the returned " +
    "frame is a local result — no distributed work left in its plan") {
    val plan = formatted(q("text_textrank_keywords"))
    assert(plan.contains("LocalTableScan"), plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
    assert(!plan.contains("Exchange"), plan.take(3000))
  }

  test("sample_coreset_kcenter: greedy rounds are one scan + one 1-row " +
    "argmax each; the report is a pure map into an 8-row rollup") {
    val df = q("sample_coreset_kcenter")
    val plan = formatted(df)
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // the only join anywhere is the cached quantization's 1-row scale
    // broadcast; the report itself is join-free
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"), plan.take(3000))
    val rows = df.collect()
    assert(rows.length === 8)
    // greedy invariant: every cohort is non-empty and radii are finite
    assert(rows.forall(_.getLong(2) >= 1))
  }

  test("corpus_ks_drift: per-version histograms map-side combine; " +
    "CDFs and the argmax run over ppm-bounded histogram rows") {
    val plan = formatted(q("corpus_ks_drift"))
    assert(plan.contains("partial_count"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("corpus_simpson_diversity: two chained map-side combines to " +
    "|sources| rows — corpus scanned once, nothing sorted") {
    val plan = formatted(q("corpus_simpson_diversity"))
    assert(plan.contains("partial_count"), plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("retrieval_ndcg_eval: composes the verified searches; the eval " +
    "join is queries×k-sized, never a corpus product") {
    val plan = formatted(q("retrieval_ndcg_eval"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("embed_probe_auc: histogram map-side combines; the CDF walk is " +
    "the partitioned prefix device, never a global-order window") {
    val plan = formatted(q("embed_probe_auc"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // the one-row result legitimately collapses at the very end (scalar
    // aggregate); the CDF cumsum itself must window over __pid partitions
    // — a regression to a global Window.orderBy drops the partition key
    if (plan.contains("windowspecdefinition")) {
      assert(plan.contains("windowspecdefinition(__pid"),
        s"cumsum window lost its __pid partitioning:\n${plan.take(3000)}")
    }
  }

  test("embed_probe_calibration: min/max broadcasts onto a pure map; " +
    "one map-side-combined <=16-row aggregate") {
    val plan = formatted(q("embed_probe_calibration"))
    assert(plan.contains("partial_count"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("corpus_bootstrap_stats: x16 generator on a pure map — only the " +
    "16-row combined aggregate ever shuffles, no join anywhere") {
    val plan = formatted(q("corpus_bootstrap_stats"))
    assert(plan.contains("partial_sum"), plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
    assert(plan.contains("Generate"), plan.take(3000))
  }

  test("corpus_filter_overlap: drop set broadcasts; flags are a pure " +
    "map into ONE scalar aggregate") {
    val plan = formatted(q("corpus_filter_overlap"))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("ann_cluster_silhouette: broadcast-literal seeds make scoring a " +
    "pure map — no join, no per-(vector x centroid) shuffle") {
    val plan = formatted(q("ann_cluster_silhouette"))
    // no shuffle-shaped join anywhere (the cached quantizedVecs build
    // subtree legitimately shows its broadcast-of-1-row scale factor)
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("ShuffledHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // the <=K-row cell aggregate must map-side combine
    assert(plan.contains("partial_count"), plan.take(3000))
  }

  test("corpus_chi2_terms: word-keyed aggregates join co-partitioned; " +
    "source sizes broadcast; top-20 is a TakeOrdered, never a sort") {
    val plan = formatted(q("corpus_chi2_terms"))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("dedup_winnow_pairs: posting-shaped bucket join over the sparse " +
    "winnowed set — df-capped, never corpus^2") {
    val plan = formatted(q("dedup_winnow_pairs"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // pair counting must map-side combine
    assert(plan.contains("partial_count"), plan.take(3000))
  }

  test("sketch_heavy_hitters: pass 2 re-counts <=k candidates through a " +
    "pure filter + map-side-combined count — no join in the final plan") {
    val plan = formatted(q("sketch_heavy_hitters"))
    assert(!plan.contains("Join"), plan.take(3000))
    assert(plan.contains("partial_count"), plan.take(3000))
  }

  test("q_event_mad_outliers: the firehose collapses once into the " +
    "histogram; median/MAD selections run over histogram rows") {
    // the whole cascade is ONE linear job inside the partition pin
    // (median/MAD selections are window columns carried down the
    // dataflow, report checkpointed); the returned frame must be that
    // checkpointed result, and the row-level MAD contract must hold
    val df = q("q_event_mad_outliers")
    val plan = executed(df)
    val fileScans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(fileScans.isEmpty,
      s"final frame re-scans parquet: ${fileScans.size}")
    assert(plan.toString.contains("Scan ExistingRDD"),
      plan.toString.take(2000))
    val rows = df.collect()
    // one row per event type, keyed and sorted
    val types = rows.map(_.getString(0))
    assert(types.sameElements(types.sorted) && types.distinct.length ===
      types.length)
    rows.foreach { r =>
      assert(r.getLong(1) > 0L)       // n
      assert(r.getLong(3) >= 0L)      // mad2x
      assert(r.getLong(4) >= 0L &&
        r.getLong(4) <= r.getLong(1)) // outliers bounded by n
    }
  }

  test("retrieval_bm25_topk: df/N/avgdl sides broadcast; the inverted " +
    "index is the only corpus-keyed shuffle; top-k never global-sorts") {
    val plan = formatted(q("retrieval_bm25_topk"))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k fell back to a global sort:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("graph_common_neighbors: wedge join is equi-keyed on the shared " +
    "customer (df-capped) — no cartesian/nested-loop anywhere") {
    val plan = formatted(q("graph_common_neighbors"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // pair counting map-side combines
    assert(plan.contains("partial_count"), plan.take(3000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("q_event_autocorr: the firehose collapses once into the hourly " +
    "count; the lag pass is ONE type-partitioned window, moments " +
    "map-side combine") {
    val plan = formatted(q("q_event_autocorr"))
    val w = "Window".r.findAllIn(plan).size
    assert(w >= 1, s"expected the lag window:\n${plan.take(3000)}")
    assert(plan.contains("partial_count"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("graph_degree_assortativity: degrees join back onto the edge " +
    "artifact; the moment rollup is a 1-row map-side-combined aggregate") {
    val plan = formatted(q("graph_degree_assortativity"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("partial_count"), plan.take(3000))
  }

  test("dq_uniqueness_profile: the six distinct counts ride ONE " +
    "Expand-based aggregate — a single scan, not six") {
    val plan = formatted(q("dq_uniqueness_profile"))
    assert(plan.contains("Expand"), plan.take(3000))
    // one scan of orders
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 orders scan, got $scans")
  }

  test("curation_curriculum_phases: boundaries come from the histogram " +
    "CDF broadcast back onto a pure-map phase tag — no global sort of " +
    "the corpus") {
    val plan = formatted(q("curation_curriculum_phases"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // phase tagging joins the 1-row bounds by broadcast
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(plan.contains("partial_count"), plan.take(3000))
  }

  test("sample_ess_weights: one map-side-combined rollup to |sources| " +
    "rows — nothing downstream scales with the corpus") {
    val plan = executed(q("sample_ess_weights"))
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 2,
      s"got ${shuffles.size} shuffles (agg + presentation sort allowed)")
  }

  test("er_fastss_join: deletion-key expansion meets in ONE equi-join — " +
    "no name x name product anywhere") {
    val plan = formatted(q("er_fastss_join"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("partial_count"), plan.take(3000))
  }

  test("q_event_trigrams: one user-partitioned window; support count " +
    "map-side combines; top-k is a TakeOrdered") {
    val plan = formatted(q("q_event_trigrams"))
    assert("Window".r.findAllIn(plan).size >= 1, plan.take(3000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("embed_centroid_similarity: corpus collapses once to K-by-Dim " +
    "sums; the pairwise stage is label-count-sized") {
    val plan = formatted(q("embed_centroid_similarity"))
    // the K-row self-join may be a broadcast nested loop (8x8); a
    // corpus-scale cartesian would show as CartesianProduct
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("partial_sum"), plan.take(3000))
  }

  test("sketch_ams_f2: the corpus collapses once into the vocab count; " +
    "all 16 sketches ride one posexplode over it") {
    val plan = formatted(q("sketch_ams_f2"))
    assert(plan.contains("partial_count"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("q9_product_profit: the partsupp surrogate is an in-row explode " +
    "(no shuffle to build it); dims broadcast; no cartesian") {
    val plan = formatted(q("q9_product_profit"))
    assert(plan.contains("Generate"), plan.take(3000)) // the ps explode
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("q20_promotion_parts: nested correlation decorrelates to " +
    "semi-joins; no cartesian") {
    val plan = formatted(q("q20_promotion_parts"))
    assert(plan.contains("LeftSemi"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("q2_min_cost_supplier: min-cost subquery decorrelates to an " +
    "aggregate joined back; top-k bounded; no cartesian") {
    val plan = formatted(q("q2_min_cost_supplier"))
    // at this spec's tiny SF the part filter can match nothing and AQE
    // collapses the whole tree to EmptyRelation — itself proof of
    // runtime pruning; with matches, the decorrelated min must appear
    assert(plan.contains("partial_min") || plan.contains("EmptyRelation"),
      plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("ann_nprobe_recall_sweep: sweep points re-filter the cached " +
    "candidate set — assignment runs once; no cartesian") {
    val df = q("ann_nprobe_recall_sweep")
    val plan = formatted(df)
    assert(plan.contains("InMemoryTableScan"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // recall must be monotone non-decreasing in nprobe
    val rows = df.collect().sortBy(_.getLong(0))
    val recalls = rows.map(_.getLong(2))
    assert(recalls.sameElements(recalls.sorted),
      s"recall not monotone in nprobe: ${recalls.mkString(",")}")
  }

  test("layout_pruning_benefit: the three layout ranks come from the " +
    "checkpointed prefix-sum, never a single-task global window") {
    val df = q("layout_pruning_benefit")
    val plan = executed(df)
    val fileScans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(fileScans.isEmpty, s"re-scans parquet: ${fileScans.size}")
    assert(plan.toString.contains("Scan ExistingRDD"),
      plan.toString.take(2000))
    val rows = df.collect()
    val byLayout = rows.map(r => r.getString(0) -> r).toMap
    // all layouts see the same table and the same matches
    assert(rows.map(_.getLong(1)).distinct.length === 1)
    assert(rows.map(_.getLong(2)).distinct.length === 1)
    // the clustered layouts must not touch MORE pages than natural
    val nat = byLayout("natural").getLong(4)
    assert(byLayout("zorder").getLong(4) <= nat)
    assert(byLayout("custkey").getLong(4) <= nat)
  }

  test("graph_label_propagation: community count is non-increasing " +
    "across rounds") {
    val rows = q("graph_label_propagation").collect().sortBy(_.getLong(0))
    val comms = rows.map(_.getLong(1))
    assert(comms.sameElements(comms.sorted.reverse),
      s"communities grew across rounds: ${comms.mkString(",")}")
  }

  test("graph_hits: rounds materialize behind the single eager cut; " +
    "hub/authority ranks are dense and positive") {
    val df = q("graph_hits")
    // the returned frame is the barrier itself — the four join rounds
    // ran inside ONE forcing job, not four
    assert(formatted(df).contains("Scan ExistingRDD"))
    val rows = df.collect()
    val byRole = rows.groupBy(_.getString(0))
    for ((role, rs) <- byRole) {
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to rs.length),
        s"$role ranks not dense")
      assert(rs.forall(_.getLong(3) > 0), s"$role has non-positive score")
    }
    // bipartite parity: hubs are customers (even ids), authorities odd
    assert(byRole("hub").forall(_.getLong(2) % 2 == 0))
    assert(byRole("authority").forall(_.getLong(2) % 2 == 1))
  }

  test("graph_coreness_hindex: h-index iteration can only tighten — " +
    "every core number is bounded by the max degree") {
    val df = q("graph_coreness_hindex")
    assert(formatted(df).contains("Scan ExistingRDD")) // barrier-backed
    val rows = df.collect()
    assert(rows.forall(_.getLong(1) > 0))
    val maxCore = rows.map(_.getLong(0)).max
    // c2 <= c0 = degree pointwise, so max coreness <= max degree
    val maxDeg = SparkEntry.queries("graph_degree_hist")(spark, dir)
      .collect().map(_.getAs[Number](3).longValue).max
    assert(maxCore <= maxDeg, s"coreness $maxCore exceeds max degree $maxDeg")
  }

  test("hIndexRound: histogram selection, never a per-neighbor ranking — " +
    "no row_number window; neighbor fan-in combines map-side before it") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // star: hub 1 has 5 leaves; leaves see only the hub. core = degree.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L),
      (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), (6L, 1L))
      .toDF("src", "dst")
    val core = Seq((1L, 5L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L),
      (6L, 1L)).toDF("node", "c")
    val round = graft.queries.AdvancedQueries.hIndexRound(edges, core)
    val plan = formatted(round)
    // the scale contract: the hub's 5 neighbor rows reach the window as
    // ONE histogram row (groupBy (src, cu) with partial_count), and no
    // window ranks raw neighbors
    assert(!plan.contains("row_number"), plan.take(3000))
    assert(plan.contains("partial_count"), plan.take(3000))
    // h-index of {1,1,1,1,1} is 1 (hub); of {5} is 1 (leaves)
    val got = round.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 1L), got.toString)
    // asymmetric check: values {3,2,2,1} -> h = 2
    val e2 = Seq((9L, 10L), (9L, 11L), (9L, 12L), (9L, 13L))
      .toDF("src", "dst")
    val c2 = Seq((10L, 3L), (11L, 2L), (12L, 2L), (13L, 1L))
      .toDF("node", "c")
    val h9 = graft.queries.AdvancedQueries.hIndexRound(e2, c2)
      .filter(col("node") === 9L).collect()(0).getLong(1)
    assert(h9 == 2L, s"h-index of {3,2,2,1} should be 2, got $h9")
  }

  test("graph_abcore: the peel only shrinks — alive counts and directed " +
    "edge counts are non-increasing over the four rounds") {
    val df = q("graph_abcore")
    assert(formatted(df).contains("Scan ExistingRDD")) // barrier-backed
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).sameElements(1L to 4L))
    val alive = rows.map(_.getLong(1))
    val edges = rows.map(_.getLong(2))
    assert(alive.zip(alive.tail).forall { case (x, y) => y <= x },
      s"n_alive not non-increasing: ${alive.mkString(",")}")
    assert(edges.zip(edges.tail).forall { case (x, y) => y <= x },
      s"n_dir_edges not non-increasing: ${edges.mkString(",")}")
    // the doubled symmetric edge set always has even directed count
    assert(edges.forall(_ % 2 == 0))
  }

  test("ann_graph_search_topk: dense ranks, distinct neighbors, " +
    "non-decreasing distance; the hub layer reaches a full top-k " +
    "for every query") {
    val rows = q("ann_graph_search_topk").collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 8, s"expected 8 queries, got ${byQ.size}")
    for ((qid, rs) <- byQ) {
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.length == 5, s"query $qid returned ${sorted.length}")
      assert(sorted.map(_.getLong(1)).sameElements(1L to 5L))
      val d2s = sorted.map(_.getLong(3))
      assert(d2s.zip(d2s.tail).forall { case (a, b) => a <= b },
        s"query $qid distances not sorted: ${d2s.mkString(",")}")
      assert(rs.map(_.getLong(2)).distinct.length == rs.length)
      assert(rs.forall(_.getLong(2) != qid), "self returned as neighbor")
    }
  }

  test("ann_graph_recall: candidate and truth sets are both full " +
    "query_count x k; hits bounded; recall consistent") {
    val r = q("ann_graph_recall").collect()(0)
    assert(r.getLong(0) == 40 && r.getLong(1) == 40)
    assert(r.getLong(2) >= 0 && r.getLong(2) <= 40)
    assert(math.abs(r.getDouble(3) -
      (r.getLong(2).toDouble / r.getLong(0))) < 1e-6)
  }

  test("retrieval_rank_correlation: both rankers ride ONE barriered tf " +
    "table; the pair stage is qid-keyed, never corpus-sized") {
    val plan = formatted(q("retrieval_rank_correlation"))
    // tf is an eager lineage cut — consumers read the checkpointed RDD,
    // not five re-tokenizations of the corpus
    assert(plan.contains("Scan ExistingRDD"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("corpus_tv_drift: one posting-shaped join, map-side-combined " +
    "sums, no source-by-vocab cartesian") {
    val plan = formatted(q("corpus_tv_drift"))
    assert(plan.contains("partial_sum"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("dedup_lsh_band_sweep: three configs share one signature table " +
    "and one checkpointed truth; candidates stay band-bucket equi-joins") {
    val plan = formatted(q("dedup_lsh_band_sweep"))
    assert(plan.contains("Scan ExistingRDD"), plan.take(3000)) // truth cut
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("cappedShingleIndex: hot keys leave the index before any " +
    "self-join — df combines map-side, surviving fan-in is <= cap") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, max}
    // key 100 is boilerplate (5 docs), key 200 is rare (2 docs)
    val shEx = Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L),
      (5L, 100L), (1L, 200L), (2L, 200L), (3L, 300L))
      .toDF("doc_id", "h")
    val kept = graft.queries.DedupQueries.cappedShingleIndex(shEx, 3)
    val plan = formatted(kept)
    assert(plan.contains("partial_count"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // the boilerplate key is gone; every surviving key's df <= cap
    val dfs = kept.groupBy(col("h")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).collect()(0).getLong(0)
    assert(dfs <= 3, s"surviving key df $dfs exceeds cap")
    assert(kept.filter(col("h") === 100L).count() == 0)
    assert(kept.count() == 3) // two 200-postings + one 300-posting
  }

  test("embed_margin_audit: candidates are cell-blocked; the nearest " +
    "same/other distances are map-side conditional mins, no rank window") {
    val plan = formatted(q("embed_margin_audit"))
    assert(plan.contains("partial_min"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("q_seasonal_anomalies: the report is a TakeOrdered top-10, " +
    "never a corpus-global sort; grid tables are wall-clock-bounded") {
    val plan = formatted(q("q_seasonal_anomalies"))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("q_rfm_segments: all three quintile boundaries come from one " +
    "unpivoted histogram aggregate broadcast onto the scorer") {
    val plan = formatted(q("q_rfm_segments"))
    // the unpivot is one in-row Generate (stack), the boundary row
    // reaches the scorer as a broadcast of a single aggregate
    assert(plan.contains("Generate"), plan.take(3000))
    assert(plan.contains("BroadcastNestedLoopJoin")
      || plan.contains("BroadcastExchange"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("sketch_bloom_fpr: the probe meets the position set in ONE " +
    "equi-join; nothing key-squared") {
    val plan = formatted(q("sketch_bloom_fpr"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("partial_count"), plan.take(3000))
  }

  test("q_anomaly_persistence: the island window runs over the flagged " +
    "set after the hourly rollup — one firehose shuffle") {
    val plan = formatted(q("q_anomaly_persistence"))
    assert(plan.contains("Window"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("er_cluster_shape_audit + dedup_cluster_purity: artifact-backed " +
    "closures — the census never re-runs the pair stage") {
    for (name <- Seq("er_cluster_shape_audit", "dedup_cluster_purity")) {
      val plan = formatted(q(name))
      // the closure comes back from its write-once parquet snapshot;
      // a levenshtein/jaccard recomputation would show its expression
      assert(!plan.contains("levenshtein"), s"$name: ${plan.take(2000)}")
      assert(!plan.contains("CartesianProduct"), s"$name: ${plan.take(2000)}")
    }
  }

  test("q_window_funnel: running-max windows, NO self-join — the event " +
    "log is scanned once and never joined against itself") {
    val plan = executed(q("q_window_funnel"))
    val joins = plan.collect {
      case j if j.nodeName.contains("Join") => j
    }
    assert(joins.isEmpty, s"window funnel must not self-join: " +
      s"${joins.map(_.nodeName)}")
    // both chain columns ride the same (user, ts)-ordered sort: exactly
    // one user-keyed exchange feeds the windows
    val shuffles = plan.collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.size <= 3, // user window + stage groupBy + order
      s"got ${shuffles.size} shuffles")
  }

  test("sample_horvitz_thompson: one scan, one scalar aggregate — no " +
    "join, no window, integer HT terms") {
    val plan = executed(q("sample_horvitz_thompson"))
    assert(plan.collect {
      case j if j.nodeName.contains("Join") => j
    }.isEmpty, "HT estimation must be a single-pass aggregate")
    assert(formatted(q("sample_horvitz_thompson")).contains("shiftleft"),
      "dyadic HT terms must be integer shifts, not float pow")
  }

  test("dedup_shingle_df_hist: two map-side-combined aggregates, no join") {
    val plan = executed(q("dedup_shingle_df_hist"))
    assert(plan.collect {
      case j if j.nodeName.contains("Join") => j
    }.isEmpty, "df histogram must not join")
    val partials = formatted(q("dedup_shingle_df_hist"))
    assert(partials.contains("partial_count") ||
      partials.contains("HashAggregate"), partials.take(1000))
  }

  test("graph_local_clustering: wedge close stays an equi-join — no " +
    "cartesian anywhere in the per-node rollup") {
    val plan = formatted(q("graph_local_clustering"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("dedup_scurve_validation: the pair domain rides the df-capped " +
    "index (hot-shingle cap joins BEFORE the self-join); candidates " +
    "meet the domain in an equi-join, never a product") {
    val plan = formatted(q("dedup_scurve_validation"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("sketch_theta_setops: sketch halves are one-row frames — the " +
    "only corpus-scale work is the two bounded-buffer kMinima aggregates " +
    "and the exact-count audit join on the 60-bit key") {
    val plan = formatted(q("sketch_theta_setops"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("kminima") || plan.contains("KMinima") ||
      plan.contains("k_minima"), plan.take(1500))
  }

  test("dq_pk_gap_audit: start/end ranks ride the distributed prefix " +
    "device — never a global single-partition ROW_NUMBER") {
    val plan = formatted(q("dq_pk_gap_audit"))
    assert(!plan.contains("Exchange SinglePartition"),
      s"global single-partition window detected:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("runningSum: the uniqueGuard lag rides the SAME WindowExec as the " +
    "local cumulative scan — every Window node computes both, none is " +
    "guard-only (the zero-extra-jobs claim, checked in the plan)") {
    import spark.implicits._
    val df = Seq((1L, 2L), (5L, 3L), (9L, 4L)).toDF("k", "w")
    val out = graft.operators.SequencePacking
      .runningSum(df, "k", "w", "cum", Some(2))
    // the Window sits inside a ResultQueryStage (a leaf wrapper collect()
    // does not descend into) — assert on the formatted tree instead
    val plan = formatted(out)
    val windowLines = plan.linesIterator
      .filter(_.replaceFirst("^[\\s:+\\-]*", "").startsWith("Window "))
      .toSeq
    assert(windowLines.size == 1,
      s"expected exactly ONE WindowExec (scan + guard fused):\n$plan")
    assert(windowLines.head.contains("sum(") &&
      windowLines.head.contains("lag("),
      s"guard lag not fused into the scan's WindowExec:\n${windowLines.head}")
  }

  test("text_hash_collision_audit: one vocab distinct, then map-side-" +
    "combined aggregates — no join anywhere") {
    val plan = executed(q("text_hash_collision_audit"))
    assert(plan.collect {
      case j if j.nodeName.contains("Join") => j
    }.isEmpty, "collision audit must not join")
  }

  test("q_stream_window_funnel: streaming state machine matches the " +
    "batch running-max windows row for row") {
    val stream = q("q_stream_window_funnel").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1)))
    val batch = q("q_window_funnel").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(stream == batch, s"stream=$stream batch=$batch")
  }

  test("graph_truss_support: wedge close and edge rollup are equi-joins " +
    "over edge-shaped sides — never a cross product") {
    val plan = formatted(q("graph_truss_support"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("curation_pareto_frontier: skyline invariant — walking the " +
    "frontier down in quality, max_words strictly increases (nothing " +
    "dominated survives); raw docs never enter the window (aggregate " +
    "feeds it)") {
    val rows = q("curation_pareto_frontier").collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array((qHi, wHi), (qLo, wLo)) =>
        assert(qHi > qLo, s"frontier not quality-sorted: $qHi !> $qLo")
        assert(wLo > wHi, s"dominated row survived: ($qLo,$wLo) vs ($qHi,$wHi)")
      case _ => ()
    }
    val plan = formatted(q("curation_pareto_frontier"))
    assert(plan.contains("HashAggregate") ||
      plan.contains("SortAggregate"), plan.take(1500))
  }

  test("ann_rq_distortion: the literal-codebook assigns are pure maps — " +
    "NO join of any kind (the ≤8-row codebooks ride the projection), no " +
    "cartesian; the only exchanges are the two 1-row report aggregates") {
    // ONE execution; string assertions (the formatted tree descends into
    // ResultQueryStage leaves, which SparkPlan.collect does not)
    val f = formatted(q("ann_rq_distortion"))
    assert(!f.contains("Join"),
      s"RVQ assign must not join — codebooks are literals:\n${f.take(3000)}")
    assert(!f.contains("CartesianProduct"), f.take(3000))
    assert(!f.contains("Window"), f.take(3000)) // argmin is array_position,
    // not a row_number de-dup
  }

  test("ann_binary_hamming_recall: the 64-row dim-threshold table " +
    "broadcasts onto the code build; no cartesian anywhere") {
    val plan = formatted(q("ann_binary_hamming_recall"))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("dq_mannwhitney_lengths: the rank algebra runs over the VALUE " +
    "HISTOGRAM (aggregate feeds the window), never a per-row global sort " +
    "of the corpus; no join anywhere") {
    val plan = executed(q("dq_mannwhitney_lengths"))
    assert(plan.collect {
      case j if j.nodeName.contains("Join") => j
    }.isEmpty, "U-statistic must not join")
    assert(formatted(q("dq_mannwhitney_lengths")).contains("HashAggregate"))
  }

  test("dq_watermark_lateness: the global high-water mark rides the " +
    "distributed prefix-scan — never a single-partition window") {
    val plan = formatted(q("dq_watermark_lateness"))
    assert(!plan.contains("Exchange SinglePartition"),
      s"global single-partition window detected:\n${plan.take(3000)}")
  }

  test("sample_ab_srm_audit: one corpus scan into map-side-combined " +
    "counters; the balance algebra joins only one-row frames") {
    val plan = formatted(q("sample_ab_srm_audit"))
    // events must be scanned at most twice (per-type counters + the
    // distinct-user arm census) — a third scan means the TV pass
    // re-read the corpus instead of the cached per-type frame
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans <= 2, s"got $scans corpus scans:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }
}
