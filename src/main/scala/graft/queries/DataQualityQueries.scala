package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Data-quality operators — the invariant checks a pipeline runs on every
 * ingest before anything downstream trusts the tables: money
 * reconciliation (do the line items add up to the order header?) and
 * referential integrity / key uniqueness (the "dbt tests" layer).
 *
 * Everything is exact integer arithmetic (the DECIMAL(18,2) money
 * contract widened to integer basis points, so discount x tax products
 * stay exact); every check is one equi-join or one map-side-combined
 * aggregate — a quality sweep must be cheaper than the pipeline it
 * guards.
 */
object DataQualityQueries {

  import graft.MoneyMath.dec

  /** Benford first-digit expectation, log₁₀(1 + 1/d) in ppm — driver
    * literals (neither engine evaluates a log; same device as the nDCG
    * weights). */
  private val BenfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  def defs: Map[String, QueryDef] = Map(

    // BENFORD FIRST-DIGIT AUDIT — the fraud/synthetic-data screen an
    // auditor runs on any organically-grown money column: the first
    // significant digit of o_totalprice (in cents) against Benford's
    // log₁₀(1+1/d) expectation, as observed-vs-expected ppm with the
    // absolute deviation per digit. Naturally-generated multiplicative
    // amounts follow the law; uniform or hand-seeded generators (like
    // this one — the deviation sheet SHOWS it) do not, which is exactly
    // what the audit is for. Exact integers end-to-end: cents through
    // DECIMAL(18,2), first digit via string head, observed share as one
    // integral division against a 1-row broadcast total, expectation as
    // driver-literal ppm. 100 TB: one map-side-combined 9-bucket count;
    // nothing downstream scales with row count.
    "dq_benford_first_digit" -> QueryDef(
      (s, dir) => {
        val expMap = map(BenfordPpm.flatMap { case (d, p) =>
          Seq(lit(d.toLong), lit(p)) }: _*)
        val digits = Tables.load(s, dir, "orders")
          .select((dec(col("o_totalprice")) * 100).cast(LongType)
            .as("cents"))
          .select(expr("CAST(substring(CAST(cents AS STRING), 1, 1) " +
            "AS BIGINT)").as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n"))
        val tot = digits.agg(sum(col("n")).as("total"))
        digits.crossJoin(broadcast(tot))
          .select(col("digit"), col("n"),
            expr("(n * 1000000) div total").as("obs_ppm"),
            element_at(expMap, col("digit")).as("exp_ppm"))
          .withColumn("dev_ppm", abs(col("obs_ppm") - col("exp_ppm")))
          .orderBy(col("digit"))
      },
      Some {
        val vals = BenfordPpm.map { case (d, p) => s"($d, $p)" }
          .mkString(", ")
        s"""WITH c AS (
           |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |    AS BIGINT) AS cents FROM orders),
           |d AS (
           |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
           |      AS digit,
           |    count(*) AS n
           |  FROM c GROUP BY 1),
           |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM d),
           |b(digit, exp_ppm) AS (VALUES $vals)
           |SELECT d.digit, CAST(d.n AS BIGINT) AS n,
           |  (d.n * 1000000) // t.total AS obs_ppm,
           |  CAST(b.exp_ppm AS BIGINT) AS exp_ppm,
           |  abs((d.n * 1000000) // t.total - b.exp_ppm) AS dev_ppm
           |FROM d JOIN b ON b.digit = d.digit, t
           |ORDER BY d.digit""".stripMargin
      }),

    // RECONCILIATION AUDIT — double-entry check of the order header
    // against its lines: computed total = sum of
    // extendedprice x (1-discount) x (1+tax), carried as EXACT integers
    // (cents x basis-point factors, scale 10^4), compared to the header
    // total at the same scale. The mismatch sheet buckets by decimal
    // magnitude of the difference — the shape of the discrepancy (rounding
    // dust vs missing lines) matters more than its existence. Headers
    // with no lines report digits = -1. 100 TB shape: one map-side-
    // combined per-order sum, one hash equi-join header<->lines, then a
    // <=20-row rollup.
    "q_reconciliation_audit" -> QueryDef(
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"),
            (dec(col("o_totalprice")) * 100).cast(LongType).as("tot_c"))
        val l = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"),
            ((dec(col("l_extendedprice")) * 100).cast(LongType) *
              (lit(100L) - (dec(col("l_discount")) * 100).cast(LongType)) *
              (lit(100L) + (dec(col("l_tax")) * 100).cast(LongType)))
              .as("line_s4"))
        val comp = l.groupBy(col("l_orderkey"))
          .agg(sum(col("line_s4")).as("comp_s4"))
        o.join(comp, col("o_orderkey") === col("l_orderkey"), "left")
          .selectExpr("tot_c * 10000 AS tot_s4", "comp_s4")
          .selectExpr(
            """CASE WHEN comp_s4 IS NULL THEN -1
              |     WHEN tot_s4 = comp_s4 THEN 0
              |     ELSE length(CAST(abs(tot_s4 - comp_s4) AS STRING))
              |END AS digits""".stripMargin,
            "coalesce(tot_s4 - comp_s4, CAST(0 AS BIGINT)) AS diff")
          .groupBy(col("digits"))
          .agg(count(lit(1)).as("n_orders"),
            min(col("diff")).as("min_diff_s4"),
            max(col("diff")).as("max_diff_s4"))
          .orderBy(col("digits"))
      },
      Some("""WITH o AS (
             |  SELECT o_orderkey,
             |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS tot_c
             |  FROM orders),
             |l AS (
             |  SELECT l_orderkey,
             |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
             |          AS BIGINT))
             |      * (100 + CAST(CAST(l_tax AS DECIMAL(18,2)) * 100
             |          AS BIGINT)) AS line_s4
             |  FROM lineitem),
             |comp AS (
             |  SELECT l_orderkey, CAST(SUM(line_s4) AS BIGINT) AS comp_s4
             |  FROM l GROUP BY l_orderkey),
             |j AS (
             |  SELECT o.tot_c * 10000 AS tot_s4, comp.comp_s4
             |  FROM o LEFT JOIN comp ON o.o_orderkey = comp.l_orderkey)
             |SELECT CASE WHEN comp_s4 IS NULL THEN -1
             |            WHEN tot_s4 = comp_s4 THEN 0
             |            ELSE length(CAST(abs(tot_s4 - comp_s4) AS VARCHAR))
             |       END AS digits,
             |  count(*) AS n_orders,
             |  CAST(MIN(coalesce(tot_s4 - comp_s4, 0)) AS BIGINT)
             |    AS min_diff_s4,
             |  CAST(MAX(coalesce(tot_s4 - comp_s4, 0)) AS BIGINT)
             |    AS max_diff_s4
             |FROM j GROUP BY 1 ORDER BY digits""".stripMargin)),

    // REFERENTIAL INTEGRITY + KEY UNIQUENESS — the four invariants the
    // TPC-H-shaped schema promises: lineitem.l_orderkey resolves in
    // orders, orders.o_custkey resolves in customer, and both orders and
    // customer primary keys are unique. Each check is ONE left-anti
    // equi-join (orphans) or ONE map-side-combined count (duplicate
    // keys); the sheet is a 4-row union. At 100 TB this is the per-ingest
    // gate — any non-zero row quarantines the batch.
    "q_referential_integrity" -> QueryDef(
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val l = Tables.load(s, dir, "lineitem")
        val c = Tables.load(s, dir, "customer")
        def check(name: String, viol: org.apache.spark.sql.DataFrame,
            total: org.apache.spark.sql.DataFrame) =
          viol.agg(count(lit(1)).as("n_violations"))
            .crossJoin(total.agg(count(lit(1)).as("n_checked")))
            .select(lit(name).as("check_name"), col("n_violations"),
              col("n_checked"))
        val orphanLines = l.select(col("l_orderkey"))
          .join(o.select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
        val orphanOrders = o.select(col("o_custkey"))
          .join(c.select(col("c_custkey")),
            col("o_custkey") === col("c_custkey"), "left_anti")
        val dupOrderPk = o.groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n")).filter(col("n") > 1)
        val dupCustPk = c.groupBy(col("c_custkey"))
          .agg(count(lit(1)).as("n")).filter(col("n") > 1)
        check("customer_pk_unique", dupCustPk, c)
          .union(check("lineitem_order_fk", orphanLines, l))
          .union(check("orders_custkey_fk", orphanOrders, o))
          .union(check("orders_pk_unique", dupOrderPk, o))
          .orderBy(col("check_name"))
      },
      Some("""SELECT * FROM (
             |  SELECT 'customer_pk_unique' AS check_name,
             |    (SELECT count(*) FROM (SELECT c_custkey FROM customer
             |      GROUP BY c_custkey HAVING count(*) > 1)) AS n_violations,
             |    (SELECT count(*) FROM customer) AS n_checked
             |  UNION ALL
             |  SELECT 'lineitem_order_fk',
             |    (SELECT count(*) FROM lineitem
             |     WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
             |    (SELECT count(*) FROM lineitem)
             |  UNION ALL
             |  SELECT 'orders_custkey_fk',
             |    (SELECT count(*) FROM orders
             |     WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
             |    (SELECT count(*) FROM orders)
             |  UNION ALL
             |  SELECT 'orders_pk_unique',
             |    (SELECT count(*) FROM (SELECT o_orderkey FROM orders
             |      GROUP BY o_orderkey HAVING count(*) > 1)),
             |    (SELECT count(*) FROM orders))
             |ORDER BY check_name""".stripMargin)),

    // COLUMN-STATS PROFILE — the ANALYZE-TABLE sheet a query optimizer
    // (and a data steward) reads per column: row count, nulls, exact
    // distinct count, min and max, for the lineitem measure columns —
    // money normalized to integer cents/basis points so every value is
    // BIGINT-comparable cross-engine. Each column profiles as its OWN
    // group-count branch (the four branches run inside one job, their
    // shuffles in parallel): a low-cardinality column's groupBy collapses
    // map-side to its value count, where the multi-countDistinct Expand
    // form would shuffle 5× the raw rows for every column including the
    // cheap ones — measured 2.7 s → ~1 s at sf0.1. 100 TB: per column
    // one map-side-combined count shuffle keyed by value; the summary is
    // a 1-row aggregate per branch, unioned to 4 rows.
    "dq_column_profile" -> QueryDef(
      (s, dir) => {
        val l = Tables.load(s, dir, "lineitem").select(
          col("l_quantity").cast(LongType).as("qty"),
          (dec(col("l_extendedprice")) * 100).cast(LongType).as("price_c"),
          (dec(col("l_discount")) * 100).cast(LongType).as("disc_bp"),
          (dec(col("l_tax")) * 100).cast(LongType).as("tax_bp"))
          .cache()
        def branch(c: String, name: String) =
          l.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
            .agg(
              sum(col("cnt")).as("n"),
              coalesce(sum(when(col(c).isNull, col("cnt"))), lit(0L))
                .as("n_null"),
              sum(when(col(c).isNotNull, 1L).otherwise(0L))
                .as("n_distinct"),
              min(col(c)).as("min_v"), max(col(c)).as("max_v"))
            .select(lit(name).as("column_name"), col("n"), col("n_null"),
              col("n_distinct"), col("min_v"), col("max_v"))
        branch("qty", "l_quantity")
          .unionByName(branch("price_c", "l_extendedprice_cents"))
          .unionByName(branch("disc_bp", "l_discount_bp"))
          .unionByName(branch("tax_bp", "l_tax_bp"))
          .orderBy(col("column_name"))
      },
      Some("""WITH l AS (
             |  SELECT CAST(l_quantity AS BIGINT) AS qty,
             |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
             |      AS BIGINT) AS price_c,
             |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS disc_bp,
             |    CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT)
             |      AS tax_bp
             |  FROM lineitem),
             |a AS (
             |  SELECT count(*) AS n,
             |    CAST(SUM(CASE WHEN qty IS NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS nn1,
             |    count(DISTINCT qty) AS d1,
             |    MIN(qty) AS mn1, MAX(qty) AS mx1,
             |    CAST(SUM(CASE WHEN price_c IS NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS nn2,
             |    count(DISTINCT price_c) AS d2,
             |    MIN(price_c) AS mn2, MAX(price_c) AS mx2,
             |    CAST(SUM(CASE WHEN disc_bp IS NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS nn3,
             |    count(DISTINCT disc_bp) AS d3,
             |    MIN(disc_bp) AS mn3, MAX(disc_bp) AS mx3,
             |    CAST(SUM(CASE WHEN tax_bp IS NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS nn4,
             |    count(DISTINCT tax_bp) AS d4,
             |    MIN(tax_bp) AS mn4, MAX(tax_bp) AS mx4
             |  FROM l)
             |SELECT column_name, n, n_null,
             |  CAST(n_distinct AS BIGINT) AS n_distinct, min_v, max_v
             |FROM (
             |  SELECT 'l_quantity' AS column_name, n, nn1 AS n_null,
             |    d1 AS n_distinct, mn1 AS min_v, mx1 AS max_v FROM a
             |  UNION ALL SELECT 'l_extendedprice_cents', n, nn2, d2,
             |    mn2, mx2 FROM a
             |  UNION ALL SELECT 'l_discount_bp', n, nn3, d3, mn3, mx3
             |    FROM a
             |  UNION ALL SELECT 'l_tax_bp', n, nn4, d4, mn4, mx4 FROM a)
             |ORDER BY column_name""".stripMargin)),

    // CANDIDATE-KEY / UNIQUENESS PROFILE — the schema-discovery pass of a
    // data profiler: for a lattice of column combinations, the exact
    // distinct count and uniqueness ratio (ppm), flagging combinations
    // that are candidate keys. ONE pass over the table: the six distinct
    // counts ride a single Expand-based aggregate (Spark plans
    // multi-countDistinct as one Expand + one shuffle — the profiler
    // never rescans the table per combination), then a 6-row unpivot.
    // At 100 TB the Expand multiplies rows 6× INTO a map-side-combined
    // partial aggregate, which is the intended trade: 6 combos' worth of
    // partial-distinct state per task, one shuffle total.
    "dq_uniqueness_profile" -> QueryDef(
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val a = o.agg(count(lit(1)).as("n"),
          countDistinct(col("o_orderkey")).as("d1"),
          countDistinct(col("o_custkey")).as("d2"),
          countDistinct(col("o_orderdate")).as("d3"),
          countDistinct(col("o_orderstatus")).as("d4"),
          // multi-column combos count DISTINCT over a struct, matching the
          // oracle's row-value count(DISTINCT (a, b)): a tuple with a NULL
          // field still counts (the struct itself is non-null in both
          // engines), where Spark's bare countDistinct(a, b) would skip
          // the whole row — a cross-engine divergence on nullable columns
          countDistinct(struct(col("o_custkey"), col("o_orderdate")))
            .as("d5"),
          countDistinct(struct(col("o_custkey"), col("o_orderdate"),
            col("o_totalprice"))).as("d6"))
        a.select(col("n"), expr(
            """stack(6,
              |  'o_orderkey', d1,
              |  'o_custkey', d2,
              |  'o_orderdate', d3,
              |  'o_orderstatus', d4,
              |  'o_custkey,o_orderdate', d5,
              |  'o_custkey,o_orderdate,o_totalprice', d6)""".stripMargin)
            .as(Seq("combo", "n_distinct")))
          .select(col("combo"), col("n_distinct"),
            expr("(n_distinct * 1000000) div n").as("uniq_ppm"),
            (col("n_distinct") === col("n")).as("is_key"))
          .orderBy(col("combo"))
      },
      Some("""WITH a AS (
             |  SELECT count(*) AS n,
             |    count(DISTINCT o_orderkey) AS d1,
             |    count(DISTINCT o_custkey) AS d2,
             |    count(DISTINCT o_orderdate) AS d3,
             |    count(DISTINCT o_orderstatus) AS d4,
             |    count(DISTINCT (o_custkey, o_orderdate)) AS d5,
             |    count(DISTINCT (o_custkey, o_orderdate, o_totalprice)) AS d6
             |  FROM orders),
             |u AS (
             |  SELECT 'o_orderkey' AS combo, d1 AS n_distinct, n FROM a
             |  UNION ALL SELECT 'o_custkey', d2, n FROM a
             |  UNION ALL SELECT 'o_orderdate', d3, n FROM a
             |  UNION ALL SELECT 'o_orderstatus', d4, n FROM a
             |  UNION ALL SELECT 'o_custkey,o_orderdate', d5, n FROM a
             |  UNION ALL
             |  SELECT 'o_custkey,o_orderdate,o_totalprice', d6, n FROM a)
             |SELECT combo, CAST(n_distinct AS BIGINT) AS n_distinct,
             |  CAST((n_distinct * 1000000) // n AS BIGINT) AS uniq_ppm,
             |  n_distinct = n AS is_key
             |FROM u ORDER BY combo""".stripMargin)),

    // FEED-FRESHNESS AUDIT — the staleness monitor every ingest pipeline
    // runs before anything trusts a feed: per event type (the corpus's
    // natural feed key), when did it last produce, how far behind the
    // freshest feed is it, and is its trailing-24h volume in line with
    // its 30-day daily average (rate_ratio_ppm = 10⁶ means "normal day";
    // a stale-but-recently-renamed feed shows up as ratio ≈ 0 long
    // before last_ts looks old). All integer epoch arithmetic against
    // ONE corpus-max scalar broadcast onto a single map-side-combined
    // per-type aggregate — the audit costs one scan at any corpus size.
    "dq_freshness_audit" -> QueryDef(
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .select(col("event_type"), col("ts").cast(LongType).as("tse"))
        val mx = e.agg(max(col("tse")).as("mxts"))
        e.crossJoin(broadcast(mx))
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            max(col("tse")).as("last_epoch_s"),
            ((max(col("mxts")) - max(col("tse"))) / lit(60))
              .cast(LongType).as("staleness_min"),
            sum(when(col("tse") >= col("mxts") - 86400L, 1L).otherwise(0L))
              .as("n_last_24h"))
          .select(col("event_type"), col("n_events"), col("last_epoch_s"),
            col("staleness_min"), col("n_last_24h"),
            expr("(n_last_24h * 1000000) div greatest(n_events div 30, 1)")
              .as("rate_ratio_ppm"),
            (col("staleness_min") > 30L).as("is_stale"))
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (
             |  SELECT event_type,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS tse
             |  FROM events),
             |mx AS (SELECT max(tse) AS mxts FROM e),
             |f AS (
             |  SELECT event_type,
             |    count(*) AS n_events,
             |    max(tse) AS last_epoch_s,
             |    CAST((max(mx.mxts) - max(tse)) // 60 AS BIGINT)
             |      AS staleness_min,
             |    CAST(SUM(CASE WHEN tse >= mx.mxts - 86400 THEN 1 ELSE 0
             |      END) AS BIGINT) AS n_last_24h
             |  FROM e, mx GROUP BY event_type)
             |SELECT event_type, n_events, last_epoch_s, staleness_min,
             |  n_last_24h,
             |  CAST((n_last_24h * 1000000)
             |    // greatest(n_events // 30, 1) AS BIGINT)
             |    AS rate_ratio_ppm,
             |  staleness_min > 30 AS is_stale
             |FROM f ORDER BY event_type""".stripMargin)),

    // PRIMARY-KEY GAPS-AND-ISLANDS AUDIT — sequence fragmentation of a
    // surviving keyspace (here: the open-order snapshot after completed /
    // purged rows left): contiguity of the pk space drives range-scan
    // and min/max-pruning efficiency, so the islands/gaps LENGTH
    // histogram is the number a compaction policy reads. Scale-correct
    // form of the classic gaps-and-islands device: island STARTS (no
    // k−1) and ENDS (no k+1) fall out of two left-anti equi-joins; the
    // i-th start pairs with the i-th end by the DISTRIBUTED prefix-sum
    // rank (SequencePacking.runningSum, range-partitioned — never a
    // single-task ROW_NUMBER over the corpus); gap r = start(r+1) −
    // end(r) − 1 is one more rank equi-join. Lengths band by the
    // smear+bit_count power-of-two device — everything integer.
    "dq_pk_gap_audit" -> QueryDef(
      (s, dir) => {
        val k = Tables.load(s, dir, "orders")
          .filter(col("o_orderstatus") === "O")
          .select(col("o_orderkey").as("k")).cache()
        // boundary flags per key (interior keys drop BEFORE the prefix
        // pass), then ONE packed cumsum carries both rank sequences —
        // start-rank in the low 32 bits, end-rank in the high (valid
        // while each boundary count < 2^31): half the prefix-pass fixed
        // cost of ranking starts and ends separately
        val flagged = k
          .join(k.select((col("k") + 1).as("k"), lit(1).as("hasPrev")),
            Seq("k"), "left")
          .join(k.select((col("k") - 1).as("k"), lit(1).as("hasNext")),
            Seq("k"), "left")
          .select(col("k"),
            when(col("hasPrev").isNull, 1L).otherwise(0L).as("isS"),
            when(col("hasNext").isNull, 1L).otherwise(0L).as("isE"))
          .filter(col("isS") === 1 || col("isE") === 1)
          .withColumn("wp", col("isS") + col("isE") * lit(4294967296L))
        val cum = graft.operators.SequencePacking
          .runningSum(flagged, "k", "wp", "cum", Some(8))
        val sr = cum.filter(col("isS") === 1)
          .select(col("k").as("st"), (col("cum") % 4294967296L).as("r"))
        val er = cum.filter(col("isE") === 1)
          .select(col("k").as("en"), expr("cum div 4294967296L").as("r"))
        val isl = sr.join(er, "r")
        val spans = isl.select(lit("island").as("kind"),
            (col("en") - col("st") + 1).as("len"))
          .unionByName(isl.as("a")
            .join(isl.as("b"), col("b.r") === col("a.r") + 1)
            .select(lit("gap").as("kind"),
              (col("b.st") - col("a.en") - 1).as("len")))
        spans
          .withColumn("len_band",
            expr(s"CAST(bit_count(${PipelineQueries.smearExpr("len")}) " +
              "AS BIGINT)"))
          .groupBy(col("kind"), col("len_band"))
          .agg(count(lit(1)).as("n_spans"), sum(col("len")).as("n_keys"))
          .orderBy(col("kind"), col("len_band"))
      },
      Some {
        s"""WITH k AS (
           |  SELECT o_orderkey AS k FROM orders
           |  WHERE o_orderstatus = 'O'),
           |s AS (
           |  SELECT a.k, ROW_NUMBER() OVER (ORDER BY a.k) AS r
           |  FROM k a LEFT JOIN k p ON p.k = a.k - 1 WHERE p.k IS NULL),
           |e AS (
           |  SELECT a.k, ROW_NUMBER() OVER (ORDER BY a.k) AS r
           |  FROM k a LEFT JOIN k n ON n.k = a.k + 1 WHERE n.k IS NULL),
           |isl AS (
           |  SELECT s.r, s.k AS st, e.k AS en FROM s JOIN e ON s.r = e.r),
           |spans AS (
           |  SELECT 'island' AS kind, en - st + 1 AS len FROM isl
           |  UNION ALL
           |  SELECT 'gap', b.st - a.en - 1
           |  FROM isl a JOIN isl b ON b.r = a.r + 1)
           |SELECT kind,
           |  CAST(bit_count(${PipelineQueries.smearExpr("len")}) AS BIGINT)
           |    AS len_band,
           |  CAST(count(*) AS BIGINT) AS n_spans,
           |  CAST(sum(len) AS BIGINT) AS n_keys
           |FROM spans GROUP BY kind, len_band
           |ORDER BY kind, len_band""".stripMargin
      }),

    // MANN–WHITNEY U (rank-sum) TWO-SAMPLE TEST — the nonparametric
    // "did this source's length distribution shift" check that the KS
    // and chi² drift monitors don't cover (U is the probability-scaled
    // count of cross-sample wins, robust to any monotone transform).
    // Exact integer form: both samples collapse to VALUE HISTOGRAMS
    // (map-side combine over the bounded length lattice), 2U = 2·Σ
    // hA(v)·cumB(<v) + Σ hA(v)·hB(v) rides one window over histogram
    // rows (value-lattice-bounded — the quantile-device license), and
    // the rank-biserial effect size r = 2U/(nA·nB) − 1 is the one final
    // division. No normal approximation, no sqrt — the effect size IS
    // the deliverable at corpus scale.
    "dq_mannwhitney_lengths" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = Tables.load(s, dir, "documents")
          .filter(col("source").isin("src0", "src1"))
          .select(col("source"), col("n_chars").as("v"))
        val hist = d.groupBy(col("v")).agg(
            sum(when(col("source") === "src0", 1L).otherwise(0L)).as("ca"),
            sum(when(col("source") === "src1", 1L).otherwise(0L)).as("cb"))
        val w = Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val terms = hist
          .withColumn("cumb_less", coalesce(sum(col("cb")).over(w), lit(0L)))
        terms.agg(
            sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
            sum(col("ca") * col("cumb_less") * 2 + col("ca") * col("cb"))
              .as("u2"))
          .select(col("n_a"), col("n_b"), col("u2"),
            round(col("u2").cast(DoubleType) /
              (col("n_a") * col("n_b")).cast(DoubleType) - lit(1.0d), 6)
              .as("rank_biserial"))
      },
      Some("""WITH d AS (
             |  SELECT source, n_chars AS v FROM documents
             |  WHERE source IN ('src0', 'src1')),
             |hist AS (
             |  SELECT v,
             |    CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS cb
             |  FROM d GROUP BY v),
             |terms AS (
             |  SELECT ca, cb,
             |    COALESCE(SUM(cb) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS cumb_less
             |  FROM hist)
             |SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
             |  CAST(SUM(cb) AS BIGINT) AS n_b,
             |  CAST(SUM(ca * cumb_less * 2 + ca * cb) AS BIGINT) AS u2,
             |  round(CAST(SUM(ca * cumb_less * 2 + ca * cb) AS DOUBLE)
             |    / CAST(SUM(ca) * SUM(cb) AS DOUBLE) - 1.0, 6)
             |    AS rank_biserial
             |FROM terms""".stripMargin)),

    // WATERMARK LATENESS AUDIT — the measurement that SIZES every
    // `withWatermark` delay in the streaming family: per event, its
    // lateness against the stream's running high-water mark (max event
    // time seen so far in ARRIVAL order), banded by power-of-two
    // seconds. The p-max of this histogram is exactly the smallest
    // watermark delay that drops nothing; choosing a delay from a lower
    // band quantifies the dropped mass. The corpus' ingest id is exactly
    // event-time-ordered, so arrival is simulated with a deterministic
    // 0–10-minute per-event hash delay (the transport-jitter model both
    // engines share); the arrival key packs (arrival_s, ingest id) into
    // one long via a 2^31 shift (injective while ids < 2^31; a larger
    // keyspace collides ONLY if two same-second events' ids differ by a
    // multiple of 2^31, which runningMax's duplicate-key check rejects
    // loudly rather than silently reordering). The global running max
    // rides
    // [[graft.operators.SequencePacking.runningMax]] — the distributed
    // prefix-scan device (range-partitioned, O(partitions) driver
    // prefix), never a single-task ORDER BY window.
    "dq_watermark_lateness" -> QueryDef(
      (s, dir) => {
        import graft.functions.TextFunctions.md5Long
        val e = Tables.load(s, dir, "events")
          .select(col("event_id"), col("ts").cast(LongType).as("tse"))
          .withColumn("arr", col("tse") +
            md5Long(concat(lit("wl:"), col("event_id").cast(StringType)))
              % 600L)
          .withColumn("ord",
            expr("arr * 2147483648 + event_id % 2147483648"))
        val wm = graft.operators.SequencePacking
          .runningMax(e, "ord", "tse", "wm", Some(8))
        wm.select((col("wm") - col("tse")).as("late_s"))
          .withColumn("late_band",
            expr(s"CAST(bit_count(${PipelineQueries.smearExpr("late_s")})" +
              " AS BIGINT)"))
          .groupBy(col("late_band"))
          .agg(count(lit(1)).as("n_events"),
            max(col("late_s")).as("max_late_s"))
          .orderBy(col("late_band"))
      },
      Some {
        import graft.functions.TextFunctions.sqlMd5Long
        val d = sqlMd5Long("concat('wl:', CAST(event_id AS VARCHAR))")
        s"""WITH e AS (
           |  SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS tse
           |  FROM events),
           |a AS (
           |  SELECT tse,
           |    (tse + $d % 600) * 2147483648 + event_id % 2147483648 AS ord
           |  FROM e),
           |w AS (
           |  SELECT tse,
           |    MAX(tse) OVER (ORDER BY ord
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wm
           |  FROM a),
           |l AS (SELECT wm - tse AS late_s FROM w)
           |SELECT CAST(bit_count(${PipelineQueries.smearExpr("late_s")})
           |    AS BIGINT) AS late_band,
           |  CAST(count(*) AS BIGINT) AS n_events,
           |  CAST(max(late_s) AS BIGINT) AS max_late_s
           |FROM l GROUP BY late_band ORDER BY late_band""".stripMargin
      })
  )
}
