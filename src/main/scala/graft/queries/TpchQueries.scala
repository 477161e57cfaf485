package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The remaining TPC-H shapes expressible over this schema — together with
 * RelationalQueries (Q1/Q3/Q5/Q7/Q10/Q17/Q18/Q21/Q22) the engine covers
 * 17 of the 22 TPC-H query shapes. The other five (Q2/Q9/Q11/Q16/Q20)
 * require the `partsupp` table, which the driver's test schema does not
 * generate; their shapes (min-per-group scalar subquery, multi-way
 * fact/dim join, HAVING vs global scalar, distinct-count anti-join,
 * nested semi-join) are each exercised by another query here.
 *
 * Column adaptations to this schema are noted per query (no
 * l_commitdate/l_receiptdate/l_shipmode/p_container in the generator).
 * Cross-engine determinism: money math in DECIMAL(18,2) (exact,
 * order-insensitive), ratios as a single double division of exact
 * decimals rounded to 6 places — the same contract as RelationalQueries.
 */
object TpchQueries {

  import graft.MoneyMath.{dec, dzero, one, ts}

  private val discPrice = "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  def defs: Map[String, QueryDef] = Map(

    // TPC-H Q6: forecast revenue change — the canonical pushdown showcase:
    // a pure filter+aggregate with no joins. All three predicates and the
    // two-column projection must reach the parquet scan (PlanSpec asserts
    // PushedFilters); the aggregate is a map-side partial + 1-row final.
    "q6_forecast_revenue" -> QueryDef(
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        li.filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
            col("l_shipdate") < ts("1997-01-01 00:00:00") &&
            col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
            col("l_quantity") < 24)
          .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
            .cast(DoubleType).as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some("""SELECT
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             |  COUNT(*) AS n_lines
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_discount >= CAST(0.05 AS DOUBLE)
             |  AND l_discount <= CAST(0.07 AS DOUBLE)
             |  AND l_quantity < 24""".stripMargin)),

    // TPC-H Q4 shape: order-priority checking. The reference predicate
    // (l_commitdate < l_receiptdate) has no columns here; the adapted
    // correlation is "shipped after the order date" — same plan: a
    // decorrelated EXISTS = left-semi join with an equi key plus an
    // inequality residual, then a 5-group count.
    "q4_order_priority" -> QueryDef(
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1996-07-01 00:00:00") &&
            col("o_orderdate") < ts("1996-10-01 00:00:00"))
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate"))
        o.join(li, col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND l_shipdate > o_orderdate)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // TPC-H Q8 shape: national market share — the 7-table join (partsupp
    // leg dropped with the table): PROMO-part lineitems sold into ASIA
    // customers over two years, split by supplier nation. All dims
    // broadcast; the fact shuffles once onto orders; the share ratio is a
    // single double division of exact decimal sums.
    "q8_market_share" -> QueryDef(
      (s, dir) => {
        val p = Tables.load(s, dir, "part")
          .filter(col("p_type") === "PROMO").select("p_partkey")
        val r = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
        val n = Tables.load(s, dir, "nation")
        val cust = Tables.load(s, dir, "customer")
          .select("c_custkey", "c_nationkey")
          .join(broadcast(n.select(col("n_nationkey"), col("n_regionkey"))),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .select("c_custkey")
        val sup = Tables.load(s, dir, "supplier")
          .select("s_suppkey", "s_nationkey")
          .join(broadcast(n.select(col("n_nationkey").as("snk"),
            col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("snk"))
          .select("s_suppkey", "supp_nation")
        val o = Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
            col("o_orderdate") < ts("1998-01-01 00:00:00"))
          .select("o_orderkey", "o_custkey", "o_orderdate")
        val li = Tables.load(s, dir, "lineitem")
          .select("l_orderkey", "l_partkey", "l_suppkey",
            "l_extendedprice", "l_discount")
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left_semi")
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .withColumn("volume", dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
          .agg(sum(when(col("supp_nation") === "NATION_1", col("volume"))
              .otherwise(dzero)).as("nation_volume"),
            sum(col("volume")).as("total_volume"))
          .select(col("o_year"),
            col("nation_volume").cast(DoubleType).as("nation_volume"),
            col("total_volume").cast(DoubleType).as("total_volume"),
            round(col("nation_volume").cast(DoubleType) /
              col("total_volume").cast(DoubleType), 6).as("mkt_share"))
          .orderBy(col("o_year"))
      },
      Some(s"""WITH flows AS (
             |  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             |    ns.n_name AS supp_nation,
             |    $discPrice AS volume
             |  FROM lineitem
             |  JOIN part ON l_partkey = p_partkey
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation ns ON s_nationkey = ns.n_nationkey
             |  WHERE p_type = 'PROMO'
             |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             |    AND EXISTS (
             |      SELECT 1 FROM customer
             |      JOIN nation nc ON c_nationkey = nc.n_nationkey
             |      JOIN region ON nc.n_regionkey = r_regionkey
             |      WHERE c_custkey = o_custkey AND r_name = 'ASIA'))
             |SELECT o_year,
             |  CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_volume,
             |  CAST(SUM(volume) AS DOUBLE) AS total_volume,
             |  round(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
             |FROM flows GROUP BY o_year ORDER BY o_year""".stripMargin)),

    // TPC-H Q12 shape: shipping-mode priority split. No l_shipmode column —
    // l_linestatus stands in as the mode dimension; the shape is identical:
    // fact⋈orders join + conditional counts per class.
    "q12_ship_priority_class" -> QueryDef(
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_orderpriority")
        val li = Tables.load(s, dir, "lineitem")
          .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
            col("l_shipdate") < ts("1997-01-01 00:00:00"))
          .select("l_orderkey", "l_linestatus")
        val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_linestatus"))
          .agg(sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
          .orderBy(col("l_linestatus"))
      },
      Some("""SELECT l_linestatus,
             |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    // TPC-H Q13 shape: customer order-count distribution — LEFT join so
    // order-less customers count as 0, then a distribution over the count.
    // Two shuffles (per-customer count, per-count histogram); the first is
    // the only one that scales with data.
    "q13_customer_distribution" -> QueryDef(
      (s, dir) => {
        val c = Tables.load(s, dir, "customer").select("c_custkey")
        val o = Tables.load(s, dir, "orders")
          .filter(col("o_orderpriority") =!= "5-LOW")
          .select("o_orderkey", "o_custkey")
        c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, COUNT(*) AS custdist FROM (
             |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
             |  FROM customer LEFT JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
             |  GROUP BY c_custkey)
             |GROUP BY c_count
             |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // TPC-H Q14: promo revenue share — the generator emits p_type='PROMO'
    // literally, so the reference predicate survives unadapted. Part side
    // broadcasts; ratio = one double division of exact decimal sums.
    "q14_promo_revenue" -> QueryDef(
      (s, dir) => {
        val p = Tables.load(s, dir, "part").select("p_partkey", "p_type")
        val li = Tables.load(s, dir, "lineitem")
          .filter(col("l_shipdate") >= ts("1996-09-01 00:00:00") &&
            col("l_shipdate") < ts("1996-10-01 00:00:00"))
          .select("l_partkey", "l_extendedprice", "l_discount")
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .withColumn("volume", dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .agg(sum(when(col("p_type") === "PROMO", col("volume"))
              .otherwise(dzero)).as("promo"),
            sum(col("volume")).as("total"))
          .select(col("promo").cast(DoubleType).as("promo_revenue"),
            col("total").cast(DoubleType).as("total_revenue"),
            round(col("promo").cast(DoubleType) * 100.0 /
              col("total").cast(DoubleType), 6).as("promo_pct"))
      },
      Some(s"""SELECT
             |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $discPrice ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
             |  CAST(SUM($discPrice) AS DOUBLE) AS total_revenue,
             |  round(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $discPrice ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0 / CAST(SUM($discPrice) AS DOUBLE), 6) AS promo_pct
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin)),

    // TPC-H Q15: top supplier — a scalar MAX over an aggregate view joined
    // back by exact DECIMAL equality (no float boundary risk). The revenue
    // rollup is one shuffle on l_suppkey; the 1-row max broadcasts.
    "q15_top_supplier" -> QueryDef(
      (s, dir) => {
        val rev = Tables.load(s, dir, "lineitem")
          .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
            col("l_shipdate") < ts("1996-04-01 00:00:00"))
          .groupBy(col("l_suppkey"))
          .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .as("total_revenue"))
        val top = rev.agg(max(col("total_revenue")).as("max_revenue"))
        val sup = Tables.load(s, dir, "supplier").select("s_suppkey", "s_name")
        rev.crossJoin(broadcast(top))
          .filter(col("total_revenue") === col("max_revenue"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("total_revenue").cast(DoubleType).as("total_revenue"))
          .orderBy(col("s_suppkey"))
      },
      Some(s"""WITH rev AS (
             |  SELECT l_suppkey, SUM($discPrice) AS total_revenue
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
             |  GROUP BY l_suppkey)
             |SELECT s_suppkey, s_name,
             |  CAST(total_revenue AS DOUBLE) AS total_revenue
             |FROM supplier JOIN rev ON s_suppkey = l_suppkey
             |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
             |ORDER BY s_suppkey""".stripMargin)),

    // TPC-H Q19 shape: disjunctive multi-attribute predicates (brand ×
    // size-band × quantity-band; p_container replaced by p_size bands).
    // The OR-of-ANDs spans both join sides, so it cannot fully push down —
    // the plan keeps per-side prefilters (brand IN, quantity bounds) and
    // evaluates the residual on the joined row; part side broadcasts.
    "q19_discounted_revenue" -> QueryDef(
      (s, dir) => {
        val p = Tables.load(s, dir, "part")
          .select("p_partkey", "p_brand", "p_size")
        val li = Tables.load(s, dir, "lineitem")
          .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        val qty = dec(col("l_quantity"))
        val cond =
          (col("p_brand") === "Brand#11" && col("p_size").between(1, 10) &&
            qty >= lit(5) && qty <= lit(15)) ||
          (col("p_brand") === "Brand#22" && col("p_size").between(11, 25) &&
            qty >= lit(10) && qty <= lit(25)) ||
          (col("p_brand") === "Brand#13" && col("p_size").between(26, 50) &&
            qty >= lit(20) && qty <= lit(35))
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .filter(cond)
          .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .cast(DoubleType).as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some(s"""SELECT
             |  CAST(SUM($discPrice) AS DOUBLE) AS revenue,
             |  COUNT(*) AS n_lines
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 10
             |       AND CAST(l_quantity AS DECIMAL(18,2)) BETWEEN 5 AND 15)
             |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 11 AND 25
             |       AND CAST(l_quantity AS DECIMAL(18,2)) BETWEEN 10 AND 25)
             |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 26 AND 50
             |       AND CAST(l_quantity AS DECIMAL(18,2)) BETWEEN 20 AND 35)""".stripMargin))
  )
}
