package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Canon.{sig6, sig6Sql, exactSum, exactSumSql}

import RelationalInputs._

/** Third slice of the relational registry: the remaining classic TPC-H
  * query SHAPES the corpus had not yet exercised — correlated per-group
  * threshold (Q17), argmax-against-a-derived-view (Q15), group-HAVING
  * against a global scalar (Q11), and scalar-subquery + anti-join over
  * the dimension side (Q22). Adapted to the driver schema (no partsupp
  * table; mktsegment stands in for Q22's country code).
  *
  * Shared float posture: every derived threshold that feeds a comparison
  * (`0.5*avg`, `2*avg`, the revenue argmax) is rounded to the shared
  * 9-significant-digit grid on BOTH engines before comparing, so a sum
  * landing within an ulp of the cut cannot flip membership across engines
  * — same device as [[graft.Canon]] documents.
  */
object RelationalExt2 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q17 shape: revenue lost to small-quantity orders of one
    // brand's small parts. The correlated `l_quantity < 0.5*avg(qty per
    // part)` becomes a per-part aggregate joined back to the fact — and
    // because the threshold is only needed for the branded parts, the
    // fact is semi-joined to the (broadcast) part dim BEFORE the
    // per-part aggregate, so the agg input is brand-selectivity-sized,
    // not corpus-sized. Both the agg and the join key on l_partkey: one
    // hash partitioning serves both steps, no second exchange.
    "q70_small_qty_revenue" -> ((s, dir) => {
      import s.implicits._
      val pt = t(s, dir, "part")
        .filter($"p_brand" === "Brand#23" && $"p_size" <= 15)
        .select($"p_partkey")
      // cache(): the semi-joined frame has TWO consumers (the per-part
      // threshold agg and the probe) — uncached, the lineitem scan + the
      // broadcast semi join plan and execute twice. Brand-selectivity-
      // sized (~1/25 of lineitem × 3 columns), so the cache is small;
      // q71's revenue view caches for the same reason.
      val li = t(s, dir, "lineitem")
        .select($"l_partkey", $"l_quantity", $"l_extendedprice")
        .join(broadcast(pt), $"l_partkey" === $"p_partkey", "left_semi")
        .cache()
      val thr = li.groupBy($"l_partkey".as("tk"))
        .agg(sig6(avg($"l_quantity") * 0.5).as("thr"))
      li.join(thr, $"l_partkey" === $"tk")
        .filter($"l_quantity" < $"thr")
        .agg(count(lit(1)).as("n_small"),
          sig6(sum($"l_extendedprice") / 7.0).as("avg_yearly"))
    }),

    // TPC-H Q15 shape: the top-revenue supplier(s) of a quarter, found by
    // equality against the max of a derived revenue view. Revenue is
    // rounded onto the shared grid BEFORE the argmax so the equality join
    // is exact; the one-row max and the supplier dim both broadcast —
    // the only shuffle is the supplier-keyed revenue aggregate.
    "q71_top_supplier" -> ((s, dir) => {
      import s.implicits._
      // cache(): the view has TWO consumers (the argmax scalar and the
      // equality probe) — uncached, Catalyst plans the lineitem scan +
      // suppkey shuffle twice. Supplier-cardinality, so the cache is tiny.
      val rev = t(s, dir, "lineitem")
        .filter($"l_shipdate" >= "1997-01-01" && $"l_shipdate" < "1997-04-01")
        .groupBy($"l_suppkey")
        // Exact integer-ten-thousandths sum (vol is exact at 4dp): the
        // revenue is order-independent, so the argmax equality join and
        // the cross-engine hash are both exact (q76/q78-class fix).
        .agg(exactSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)
          .as("total_revenue"))
        .cache()
      val mx = rev.agg(max($"total_revenue").as("mx"))
      val sup = t(s, dir, "supplier").select($"s_suppkey", $"s_name")
      rev.join(broadcast(mx), $"total_revenue" === $"mx")
        .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
        .select($"s_suppkey", $"s_name", $"total_revenue")
    }),

    // TPC-H Q11 shape: parts whose discounted revenue through one
    // region's suppliers exceeds a global threshold. Q11's fixed
    // `sum(value) * fraction` cut goes empty as the part count scales, so
    // the cut is expressed scale-free — 2x the mean per-part value. The
    // supplier⋈nation reduction broadcasts; the per-part aggregate is the
    // one fact shuffle; the one-row threshold broadcasts back.
    "q72_part_value_share" -> ((s, dir) => {
      import s.implicits._
      val supR = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation").filter($"n_regionkey" === 1)),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey")
      // cache(): two consumers (the global threshold scalar and the probe)
      // — part-cardinality after the aggregate, so the cache is tiny and
      // saves a second fact scan + partkey shuffle (q71's pattern).
      val pv = t(s, dir, "lineitem")
        .join(broadcast(supR), $"l_suppkey" === $"s_suppkey", "left_semi")
        .groupBy($"l_partkey")
        .agg(exactSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)
          .as("value"))
        .cache()
      // Threshold from the exact per-part values via the same device, so
      // the `value > thr` cut is engine-independent.
      val thr = pv.agg(
        (exactSum($"value", 4) / count(lit(1)) * 2.0).as("thr"))
      pv.join(broadcast(thr), $"value" > $"thr")
        .select($"l_partkey", $"value")
    }),

    // TPC-H Q2 shape: the MINIMUM-COST SUPPLIER per part across one
    // region — the classic correlated-min-over-a-derived-view + multi-dim
    // join. No partsupp table in this schema, so supply cost derives from
    // the fact: cost(part, supplier) = min unit price across their
    // lineitems (grid-rounded before the argmin). Scale shape: the
    // region's supplier set reduces via a broadcast nation join and
    // semi-joins the fact BEFORE the (partkey, suppkey) aggregate — the
    // one fact shuffle — and the per-part argmin is a min(struct) reusing
    // the same partkey partitioning; dims broadcast back for names.
    "q74_min_cost_supplier" -> ((s, dir) => {
      import s.implicits._
      val supR = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation").filter($"n_regionkey" === 2)),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"s_name", $"n_name")
      val pts = t(s, dir, "part").filter($"p_size" === 15)
        .select($"p_partkey")
      val cost = t(s, dir, "lineitem")
        .select($"l_partkey", $"l_suppkey",
          ($"l_extendedprice" / $"l_quantity").as("unit"))
        .join(broadcast(pts), $"l_partkey" === $"p_partkey", "left_semi")
        .join(broadcast(supR.select($"s_suppkey")),
          $"l_suppkey" === $"s_suppkey", "left_semi")
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(sig6(min($"unit")).as("cost"))
      val best = cost
        .groupBy($"l_partkey".as("p_partkey"))
        .agg(min(struct($"cost", $"l_suppkey")).as("b"))
        .select($"p_partkey", $"b.l_suppkey".as("s_suppkey"), $"b.cost".as("cost"))
      best.join(broadcast(supR), Seq("s_suppkey"))
        .select($"p_partkey", $"s_suppkey", $"s_name", $"n_name", $"cost")
    }),

    // TPC-H Q22 shape: high-balance customers with no big order — a
    // scalar-subquery filter (global positive-balance average, broadcast
    // as a one-row cross join) composed with an anti-join against the
    // fact, grouped by segment. The anti-join side is reduced to the
    // distinct hot custkeys first, so the join probe is dim-sized.
    "q73_idle_balance" -> ((s, dir) => {
      import s.implicits._
      val cust = t(s, dir, "customer")
      val thr = cust.filter($"c_acctbal" > 0.0)
        .agg(sig6(avg($"c_acctbal")).as("thr"))
      val hot = t(s, dir, "orders").filter($"o_totalprice" > 300000.0)
        .select($"o_custkey").distinct()
      cust.crossJoin(broadcast(thr))
        .filter($"c_acctbal" > $"thr")
        .join(hot, $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("numcust"), sig6(sum($"c_acctbal")).as("totbal"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "q70_small_qty_revenue" ->
      s"""WITH thr AS (
         |  SELECT l_partkey AS tk, ${sig6Sql("avg(l_quantity) * 0.5")} AS thr
         |  FROM lineitem
         |  WHERE l_partkey IN (SELECT p_partkey FROM part
         |                      WHERE p_brand = 'Brand#23' AND p_size <= 15)
         |  GROUP BY l_partkey)
         |SELECT count(*) AS n_small,
         |       ${sig6Sql("sum(l_extendedprice) / 7.0")} AS avg_yearly
         |FROM lineitem JOIN thr ON l_partkey = tk
         |WHERE l_quantity < thr""".stripMargin,
    "q71_top_supplier" ->
      s"""WITH revenue AS (
         |  SELECT l_suppkey,
         |         ${exactSumSql("l_extendedprice * (1 - l_discount)", 4)} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""".stripMargin,
    "q72_part_value_share" ->
      s"""WITH pv AS (
         |  SELECT l_partkey,
         |         ${exactSumSql("l_extendedprice * (1 - l_discount)", 4)} AS value
         |  FROM lineitem
         |  WHERE l_suppkey IN (
         |    SELECT s_suppkey FROM supplier
         |    JOIN nation ON n_nationkey = s_nationkey WHERE n_regionkey = 1)
         |  GROUP BY l_partkey)
         |SELECT l_partkey, value FROM pv
         |WHERE value > (SELECT ${exactSumSql("value", 4)} / count(*) * 2.0
         |               FROM pv)""".stripMargin,
    "q74_min_cost_supplier" ->
      s"""WITH supr AS (
         |  SELECT s_suppkey, s_name, n_name
         |  FROM supplier JOIN nation ON n_nationkey = s_nationkey
         |  WHERE n_regionkey = 2),
         |cost AS (
         |  SELECT l_partkey, l_suppkey,
         |         ${sig6Sql("min(l_extendedprice / l_quantity)")} AS cost
         |  FROM lineitem
         |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 15)
         |    AND l_suppkey IN (SELECT s_suppkey FROM supr)
         |  GROUP BY 1, 2),
         |best AS (
         |  SELECT l_partkey, l_suppkey, cost FROM (
         |    SELECT l_partkey, l_suppkey, cost,
         |           row_number() OVER (PARTITION BY l_partkey
         |             ORDER BY cost, l_suppkey) AS rn
         |    FROM cost) t WHERE rn = 1)
         |SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
         |       s_name, n_name, cost
         |FROM best JOIN supr ON supr.s_suppkey = best.l_suppkey""".stripMargin,
    "q73_idle_balance" ->
      s"""SELECT c_mktsegment, count(*) AS numcust,
         |       ${sig6Sql("sum(c_acctbal)")} AS totbal
         |FROM customer
         |WHERE c_acctbal > (SELECT ${sig6Sql("avg(c_acctbal)")} FROM customer
         |                   WHERE c_acctbal > 0.0)
         |  AND c_custkey NOT IN (SELECT DISTINCT o_custkey FROM orders
         |                        WHERE o_totalprice > 300000.0)
         |GROUP BY c_mktsegment""".stripMargin,
  )
}
