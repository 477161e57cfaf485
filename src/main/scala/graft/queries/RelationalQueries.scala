package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * Relational capability of the engine. The reference delegates all relational
 * work to the host engine's SQL (SURVEY §2.6 note — e.g. the ITCase
 * aggregation MySqlConnectorITCase.java:214-215); here the host engine is
 * Spark SQL / Catalyst. These queries are the benchmark headliners and prove
 * joins / aggregations / windows / set ops over the standard tables.
 *
 * Cross-engine determinism rule: every SUM over a floating-point money column
 * goes through DECIMAL(18,2) (exact, order-insensitive) and is cast back to
 * DOUBLE at the end, so Spark and the DuckDB oracle hash identically.
 */
object RelationalQueries {

  import graft.MoneyMath.{dec, one, ts}

  def defs: Map[String, QueryDef] = Map(

    // TPC-H Q1 shape: scan-heavy partial-agg pipeline; filter + projection
    // push to the parquet scan, agg is one shuffle over 6 groups.
    "q1_pricing_summary" -> QueryDef(
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        li.filter(col("l_shipdate") <= ts("1998-09-01 00:00:00"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
            sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
              .cast(DoubleType).as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             |  COUNT(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // TPC-H Q7 shape: bilateral shipping volume between a nation pair per
    // year — a 6-table join where BOTH nation legs broadcast (25 rows) and
    // the supplier/customer dims hash-join onto the fact pipeline once
    // each; one agg shuffle over (nation, nation, year).
    "q7_volume_shipping" -> QueryDef(
      (s, dir) => {
        val (na, nb) = ("NATION_1", "NATION_2")
        val n = Tables.load(s, dir, "nation")
          .filter(col("n_name").isin(na, nb))
          .select(col("n_nationkey"), col("n_name"))
        val sup = Tables.load(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
          .join(broadcast(n.select(col("n_nationkey"),
            col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("supp_nation"))
        val cust = Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
          .join(broadcast(n.select(col("n_nationkey").as("nk2"),
            col("n_name").as("cust_nation"))),
            col("c_nationkey") === col("nk2"))
          .select(col("c_custkey"), col("cust_nation"))
        val o = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"),
            col("l_extendedprice"), col("l_discount"), col("l_shipdate"))
        li.join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          // only cross-nation flows, both directions
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            // LongType: DuckDB EXTRACT(year) is BIGINT — a 32-bit year
            // risks an int-vs-int64 hash mismatch in the driver compare
            year(col("l_shipdate")).cast(LongType).as("l_year"))
          .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .cast(DoubleType).as("revenue"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some("""SELECT supp_nation, cust_nation, l_year,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             |FROM (
             |  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             |    EXTRACT(year FROM l_shipdate) AS l_year,
             |    l_extendedprice, l_discount
             |  FROM lineitem
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ns ON s_nationkey = ns.n_nationkey
             |  JOIN nation nc ON c_nationkey = nc.n_nationkey
             |  WHERE ns.n_name IN ('NATION_1', 'NATION_2')
             |    AND nc.n_name IN ('NATION_1', 'NATION_2')
             |    AND ns.n_name <> nc.n_name)
             |GROUP BY supp_nation, cust_nation, l_year
             |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    // TPC-H Q18 shape: large-volume orders — aggregate-then-semijoin: the
    // per-order quantity rollup (one shuffle on l_orderkey) filters via
    // HAVING, then the small surviving key set joins back onto orders and
    // customer. At scale the HAVING output is broadcast-sized by
    // construction (it is the skew tail, not the corpus).
    "q18_large_orders" -> QueryDef(
      (s, dir) => {
        val big = Tables.load(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(dec(col("l_quantity"))).as("sum_qty"))
          .filter(col("sum_qty") > lit(250).cast(DecimalType(18, 2)))
        val o = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        val c = Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"))
        o.join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            dec(col("o_totalprice")).cast(DoubleType).as("o_totalprice"),
            col("sum_qty").cast(DoubleType).as("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT c_custkey, c_name, o_orderkey,
             |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
             |  CAST(sum_qty AS DOUBLE) AS sum_qty
             |FROM orders
             |JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
             |      FROM lineitem GROUP BY l_orderkey
             |      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250) big
             |  ON o_orderkey = big.l_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // TPC-H Q10 shape: returned-item revenue per customer — dim filters
    // before the joins, nation broadcast, one agg shuffle, deterministic
    // top-20 (tie-broken on the key).
    "q10_returned_revenue" -> QueryDef(
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val n = Tables.load(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))
        val o = Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
            col("o_orderdate") < ts("1996-07-01 00:00:00"))
          .select(col("o_orderkey"), col("o_custkey"))
        val li = Tables.load(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, n_name,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE l_returnflag = 'R'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
             |GROUP BY c_custkey, c_name, n_name
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // TPC-H Q17 shape: correlated scalar subquery (per-part average
    // quantity) re-expressed as an aggregate join — the subquery becomes a
    // broadcastable per-part (sum, count) table and the threshold test
    // 'qty < 0.2 * avg' runs in EXACT integer/decimal arithmetic
    // (5·qty·cnt < sum), so both engines decide every row identically.
    "q17_small_quantity_revenue" -> QueryDef(
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val perPart = li.groupBy(col("l_partkey").as("p_key"))
          .agg(sum(dec(col("l_quantity"))).as("qsum"),
            count(lit(1)).as("qcnt"))
        li.join(broadcast(perPart), col("l_partkey") === col("p_key"))
          .filter(dec(col("l_quantity")) * lit(5) * col("qcnt") < col("qsum"))
          .agg(sum(dec(col("l_extendedprice"))).cast(DoubleType)
            .as("small_qty_revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some("""SELECT
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue,
             |  COUNT(*) AS n_lines
             |FROM lineitem l
             |JOIN (SELECT l_partkey AS p_key,
             |        SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qsum,
             |        COUNT(*) AS qcnt
             |      FROM lineitem GROUP BY l_partkey) pp
             |  ON l.l_partkey = pp.p_key
             |WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * qcnt < qsum""".stripMargin)),

    // TPC-H Q3 shape: selective dim filter → join fact → agg → top-k.
    // customer/orders sides are filtered before the join so AQE can
    // broadcast them; tie-broken ORDER BY keeps the LIMIT deterministic.
    "q3_shipping_priority" -> QueryDef(
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val o = Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") < ts("1997-06-01 00:00:00"))
          .select("o_orderkey", "o_custkey", "o_orderdate")
        val li = Tables.load(s, dir, "lineitem")
          .filter(col("l_shipdate") > ts("1997-06-01 00:00:00"))
          .select("l_orderkey", "l_extendedprice", "l_discount")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(20)
      },
      Some("""SELECT l_orderkey, o_orderdate,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             |FROM customer, orders, lineitem
             |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
             |  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00' AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
             |GROUP BY l_orderkey, o_orderdate
             |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin)),

    // TPC-H Q5 shape: 6-way star join; all dimension chains are broadcast,
    // the only shuffle is lineitem⋈orders plus the final 1-row-per-nation agg.
    "q5_local_supplier_volume" -> QueryDef(
      (s, dir) => {
        val r = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
        val n = Tables.load(s, dir, "nation")
        val cu = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
        val su = Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val o = Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
            col("o_orderdate") < ts("1998-01-01 00:00:00"))
          .select("o_orderkey", "o_custkey")
        val li = Tables.load(s, dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(cu), col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .cast(DoubleType).as("revenue"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             |FROM customer, orders, lineitem, supplier, nation, region
             |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
             |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
             |  AND r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // Window function: top-3 orders per customer (rank with unique tiebreak).
    "q_window_top_orders" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val o = Tables.load(s, dir, "orders")
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        o.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    // Event-time tumbling aggregation (batch form of the streaming windowed
    // agg; exact integer outputs only — float sums are order-sensitive).
    "q_events_hourly" -> QueryDef(
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        e.groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("users"))
          .orderBy(col("hour"), col("event_type"))
      },
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
             |  COUNT(*) AS n, COUNT(DISTINCT user_id) AS users
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Set operation + semi/anti join capability: customers with orders in
    // 1996 but none in 1997 (anti join pattern).
    "q_semi_anti_join" -> QueryDef(
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val y96 = o.filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("1997-01-01 00:00:00")).select("o_custkey")
        val y97 = o.filter(col("o_orderdate") >= ts("1997-01-01 00:00:00") &&
          col("o_orderdate") < ts("1998-01-01 00:00:00")).select("o_custkey")
        val c = Tables.load(s, dir, "customer")
        c.join(y96, col("c_custkey") === y96("o_custkey"), "left_semi")
          .join(y97, col("c_custkey") === y97("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
             |  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
             |ORDER BY c_custkey""".stripMargin)),

    // TPC-H Q21 shape (adapted to this schema's columns): suppliers that
    // were the SOLE returning supplier on a finished multi-supplier order —
    // a doubly-correlated EXISTS / NOT EXISTS pair over the fact table.
    // Catalyst decorrelates both into one semi and one anti join keyed on
    // l_orderkey; the supplier/nation dims broadcast. The order-level
    // correlation shuffles the fact once per side at any scale — the
    // canonical plan for this query.
    "q21_sole_returner" -> QueryDef(
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val o = Tables.load(s, dir, "orders")
          .filter(col("o_orderstatus") === "F").select("o_orderkey")
        val sup = Tables.load(s, dir, "supplier")
        val l1 = li.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_suppkey"))
        val l2 = li.select(col("l_orderkey").as("l2_orderkey"),
          col("l_suppkey").as("l2_suppkey"))
        val l3 = li.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("l3_orderkey"),
            col("l_suppkey").as("l3_suppkey"))
        l1.join(o, col("l_orderkey") === col("o_orderkey"), "left_semi")
          .join(l2, col("l_orderkey") === col("l2_orderkey") &&
            col("l_suppkey") =!= col("l2_suppkey"), "left_semi")
          .join(l3, col("l_orderkey") === col("l3_orderkey") &&
            col("l_suppkey") =!= col("l3_suppkey"), "left_anti")
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
      },
      Some("""SELECT s_name, COUNT(*) AS numwait
             |FROM supplier, lineitem l1
             |WHERE s_suppkey = l1.l_suppkey AND l1.l_returnflag = 'R'
             |  AND EXISTS (SELECT 1 FROM orders
             |              WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey
             |                    AND l3.l_returnflag = 'R')
             |GROUP BY s_name
             |ORDER BY numwait DESC, s_name""".stripMargin)),

    // TPC-H Q22 shape: dormant high-balance customers (no order since
    // 2000) — a scalar aggregate subquery (global average balance) plus an
    // anti join against the recent slice of orders.
    // The average is compared by exact integer/decimal cross-multiplication
    // (bal · n > total) so both engines decide the boundary rows
    // identically; the scalar broadcast-joins onto the customer scan and
    // the anti join is the only shuffle.
    "q22_dormant_customers" -> QueryDef(
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("2000-01-01 00:00:00"))
          .select("o_custkey")
        val stats = c.filter(col("c_acctbal") > 0)
          .agg(sum(dec(col("c_acctbal"))).as("totbal"),
            count(lit(1)).as("npos"))
        c.crossJoin(broadcast(stats))
          .filter(dec(col("c_acctbal")) * col("npos") > col("totbal"))
          .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("numcust"),
            sum(dec(col("c_acctbal"))).cast(DoubleType).as("totacctbal"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""WITH stats AS (
             |  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS totbal,
             |         COUNT(*) AS npos
             |  FROM customer WHERE c_acctbal > 0)
             |SELECT c_mktsegment, COUNT(*) AS numcust,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
             |FROM customer, stats
             |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * npos > totbal
             |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
             |                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))
  )
}
