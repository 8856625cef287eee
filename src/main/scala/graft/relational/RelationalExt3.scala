package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Canon.{sig6, sig6Sql, exactSum, exactSumSql, exactSumUnits, exactSumUnitsSql}

import RelationalInputs._

/** Fourth slice of the relational registry: the remaining classic TPC-H
  * query SHAPES (Q4, Q7, Q8, Q9, Q13, Q16, Q18, Q19, Q20) adapted to the
  * driver schema — with these, every TPC-H query whose inputs exist in
  * this star schema has a registry counterpart. Adaptations (no partsupp
  * / commitdate / receiptdate columns): Q4's "late" predicate is
  * l_shipdate > o_orderdate + 30 days; Q16/Q20's part–supplier relation
  * derives from distinct fact pairs; Q9's supply cost is a 0.6 ×
  * retail-price proxy; Q7/Q8 select nation GROUPS via n_regionkey (the
  * driver's 25 nations are sparse at sf0.001 — a single nation pair can
  * be empty there, a region pair never is).
  *
  * Scale shapes: the only fact–fact joins are lineitem⋈orders keyed on
  * the orderkey (one shuffle each side, AQE-coalesced); every dimension
  * path (part, supplier, nation, region-filtered customer projection)
  * broadcasts; per-group thresholds (Q18's having, Q20's 1.5×mean cut)
  * aggregate BEFORE joining back so the probe side is group-sized. Float
  * posture: [[graft.Canon]] — every float aggregate that crosses engines
  * or feeds a comparison is grid-rounded on both sides.
  */
object RelationalExt3 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q4 shape: order-priority counts over a quarter, EXISTS a
    // late-shipped lineitem. The correlated EXISTS is a left-semi hash
    // join on the orderkey with the lateness range as a residual
    // condition — the date filter prunes orders BEFORE the join, so the
    // build side is quarter-sized.
    "q75_order_priority" -> ((s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
        .filter($"o_orderdate" >= "1997-01-01" && $"o_orderdate" < "1997-07-01")
      val li = t(s, dir, "lineitem").select($"l_orderkey", $"l_shipdate")
      o.join(li, $"o_orderkey" === $"l_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 30 DAYS"), "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    }),

    // TPC-H Q7 shape: shipping volume between two nation GROUPS by year.
    // lineitem⋈orders is the one fact–fact shuffle; the supplier-side and
    // customer-side (nation-name) reductions both broadcast — each is a
    // region-filtered dimension projection, and the region filters land
    // in the broadcast build, so non-qualifying rows never join.
    "q76_volume_shipping" -> ((s, dir) => {
      import s.implicits._
      val n = t(s, dir, "nation")
      val supN = t(s, dir, "supplier")
        .join(broadcast(n.filter($"n_regionkey" === 0)),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_name".as("supp_nation"))
      val custN = t(s, dir, "customer")
        .join(broadcast(n.filter($"n_regionkey" === 1)),
          $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey", $"n_name".as("cust_nation"))
      t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_suppkey", $"l_shipdate",
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("vol"))
        .join(t(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .join(broadcast(supN), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(custN), $"o_custkey" === $"c_custkey")
        .groupBy($"supp_nation", $"cust_nation",
          year($"l_shipdate").as("yr"))
        // vol = 2dp price × 2dp (1−disc) is exact at 4 decimals; sum it
        // on the integer ten-thousandths grid so the revenue is
        // order-independent (the round-10 q76 hash-fail was sig6 of an
        // order-dependent double sum landing on a 9-sig half-grid point).
        .agg(exactSum($"vol", 4).as("revenue"))
    }),

    // TPC-H Q8 shape: one nation's market share inside a region's market
    // per year — the conditional-sum / total-sum ratio. Same join graph
    // as q76 plus the (broadcast) part filter; the share divides two
    // aggregates of the SAME grouped relation, so it costs one shuffle.
    "q77_market_share" -> ((s, dir) => {
      import s.implicits._
      val n = t(s, dir, "nation")
      val supN = t(s, dir, "supplier")
        .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_name".as("supp_nation"))
      val custR = t(s, dir, "customer")
        .join(broadcast(n.filter($"n_regionkey" === 1)),
          $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey")
      val promo = t(s, dir, "part").filter($"p_type" === "PROMO")
        .select($"p_partkey")
      t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_suppkey", $"l_partkey",
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("vol"))
        .join(broadcast(promo), $"l_partkey" === $"p_partkey", "left_semi")
        .join(t(s, dir, "orders").select($"o_orderkey", $"o_custkey",
          $"o_orderdate"), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(custR), $"o_custkey" === $"c_custkey", "left_semi")
        .join(broadcast(supN), $"l_suppkey" === $"s_suppkey")
        .groupBy(year($"o_orderdate").as("yr"))
        // Numerator and denominator as exact integer ten-thousandths (vol
        // is exact at 4dp), divided once: the share is a single
        // deterministic double division on both engines.
        .agg(sig6(
          exactSumUnits(when($"supp_nation" === "NATION_3", $"vol")
            .otherwise(0.0), 4).cast("double") /
            exactSumUnits($"vol", 4).cast("double")).as("mkt_share"))
    }),

    // TPC-H Q9 shape: product profit by supplier nation and year, supply
    // cost proxied by 0.6 × retail price (no partsupp in this schema).
    // The part-name filter semi-joins the fact before the orderkey
    // shuffle, so the fact–fact join runs on the filtered subset.
    "q78_product_profit" -> ((s, dir) => {
      import s.implicits._
      val pts = t(s, dir, "part").filter($"p_name".contains("widget"))
        .select($"p_partkey", $"p_retailprice")
      val supN = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_name")
      t(s, dir, "lineitem")
        .join(broadcast(pts), $"l_partkey" === $"p_partkey")
        .select($"l_orderkey", $"l_suppkey",
          ($"l_extendedprice" * (lit(1.0) - $"l_discount") -
            lit(0.6) * $"p_retailprice" * $"l_quantity").as("amount"))
        .join(t(s, dir, "orders").select($"o_orderkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .join(broadcast(supN), $"l_suppkey" === $"s_suppkey")
        .groupBy($"n_name".as("nation"), year($"o_orderdate").as("yr"))
        // amount = 4dp vol − 3dp cost×integer qty: exact at 4 decimals —
        // integer-grid sum, same device as q76 (round-10 hash-fail fix).
        .agg(exactSum($"amount", 4).as("profit"))
    }),

    // TPC-H Q13 shape: the customer order-count distribution — a left
    // outer join whose CONDITION filters the fact side (priority <>
    // '5-LOW' inside the join, not after it: a customer whose every order
    // is 5-LOW must survive with count 0), then a histogram over the
    // per-customer counts. Two shuffles (custkey agg, count histogram) —
    // the second is group-cardinality-sized.
    "q79_cust_distribution" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer").select($"c_custkey")
        .join(t(s, dir, "orders")
            .filter($"o_orderpriority" =!= "5-LOW")
            .select($"o_custkey", $"o_orderkey"),
          $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
    }),

    // TPC-H Q16 shape: supplier counts per part bucket, the part–supplier
    // relation derived from distinct fact pairs (no partsupp table). The
    // distinct and the count share the partkey-side grouping; the part
    // dimension broadcasts.
    "q80_parts_supp_relation" -> ((s, dir) => {
      import s.implicits._
      val pts = t(s, dir, "part")
        .filter($"p_brand" =!= "Brand#15" &&
          $"p_size".isin(1, 5, 9, 13, 17, 21, 25, 29))
        .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
      t(s, dir, "lineitem").select($"l_partkey", $"l_suppkey")
        .join(broadcast(pts), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand", $"p_type", $"p_size")
        .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
    }),

    // TPC-H Q18 shape: large-volume orders — the group-HAVING threshold
    // aggregates lineitem by orderkey FIRST (order-cardinality output),
    // and only qualifying orderkeys join back to orders/customer; the
    // quantities are integer-valued doubles, so their sums are exact and
    // need no grid rounding.
    "q81_large_orders" -> ((s, dir) => {
      import s.implicits._
      val big = t(s, dir, "lineitem")
        .groupBy($"l_orderkey")
        .agg(sum($"l_quantity").as("total_qty"))
        .filter($"total_qty" > 250.0)
      t(s, dir, "orders")
        .join(big, $"o_orderkey" === $"l_orderkey")
        .join(broadcast(t(s, dir, "customer")
          .select($"c_custkey", $"c_name")), $"o_custkey" === $"c_custkey")
        .select($"c_custkey", $"c_name", $"o_orderkey", $"o_orderdate",
          $"o_totalprice", $"total_qty")
    }),

    // TPC-H Q19 shape: discounted revenue under OR-ed (brand, size,
    // quantity) windows — a single broadcast-join + disjunctive residual
    // predicate, one pass over the fact, no shuffle but the final 1-row
    // aggregate.
    "q82_disc_revenue" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .select($"l_partkey", $"l_quantity",
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("vol"))
        .join(broadcast(t(s, dir, "part")
          .select($"p_partkey", $"p_brand", $"p_size")),
          $"l_partkey" === $"p_partkey")
        .filter(
          ($"p_brand" === "Brand#12" && $"p_size".between(1, 15) &&
            $"l_quantity".between(1, 21)) ||
          ($"p_brand" === "Brand#23" && $"p_size".between(10, 30) &&
            $"l_quantity".between(10, 30)) ||
          ($"p_brand" === "Brand#34" && $"p_size".between(20, 50) &&
            $"l_quantity".between(20, 50)))
        .agg(exactSum($"vol", 4).as("revenue"), count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q20 shape: suppliers shipping excess volume of one brand's
    // parts — a two-level reduction (per-(part,supplier) quantity, then a
    // per-part 1.5×mean cut) feeding a distinct-supplier projection. The
    // cut is scale-free like q72's; both aggregates key on the partkey,
    // so the threshold join reuses the first shuffle's partitioning.
    "q83_excess_suppliers" -> ((s, dir) => {
      import s.implicits._
      val brandParts = t(s, dir, "part").filter($"p_brand" === "Brand#12")
        .select($"p_partkey")
      val shipped = t(s, dir, "lineitem")
        .select($"l_partkey", $"l_suppkey", $"l_quantity")
        .join(broadcast(brandParts), $"l_partkey" === $"p_partkey", "left_semi")
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(sum($"l_quantity").as("qty"))
        // Two consumers (the per-part cut and the probe) over a
        // brand-selectivity-sized relation — q70's cache rationale.
        .cache()
      val cut = shipped.groupBy($"l_partkey".as("pk"))
        .agg(sig6(avg($"qty") * 1.5).as("thr"))
      shipped.join(cut, $"l_partkey" === $"pk")
        .filter($"qty" > $"thr")
        .join(broadcast(t(s, dir, "supplier")
          .select($"s_suppkey", $"s_name")), $"l_suppkey" === $"s_suppkey")
        .select($"s_suppkey", $"s_name").distinct()
    }),

    // Heavy hitters via the frequent-items sketch (FreqItemsAgg), gated by
    // the q12 device: a synthesized skewed key (half the stream mass on 4
    // hot keys, the rest over ~100k tail keys — purges are real), exact
    // counts computed beside the sketch, and the output is the exact top-4
    // plus the sketch's GUARANTEED verdicts (NO_FALSE_NEGATIVES capture;
    // lb ≤ exact ≤ ub), never the order-dependent estimates. Both
    // aggregates are map-side partial; the sketch relation is one row.
    "q84_heavy_hitters" -> ((s, dir) => {
      import s.implicits._
      // NOT cached: at 100 TB the two consumers should each run a
      // column-pruned fact scan rather than pin a corpus-sized key
      // projection in memory — and the lazy plan stays auditable
      // (PlanAuditSpec pins the map-side sketch partial).
      def keyed = t(s, dir, "lineitem").select(
        when($"l_orderkey" % 2 === 0, $"l_orderkey" % 8)
          .otherwise(lit(1000L) + $"l_orderkey" % 100000L).as("hk"))
      val sk = keyed
        .agg(graft.functions.GraftFunctions
          .freqItemsAgg(s, $"hk", 1024).as("sk"))
        .select($"sk.max_err".as("max_err"), explode($"sk.items").as("it"))
        .select($"it.item".as("hk"), $"it.est".as("est"),
          $"it.lb".as("lb"), $"it.ub".as("ub"), $"max_err")
      val top = keyed.groupBy($"hk").agg(count(lit(1)).as("exact_cnt"))
        .orderBy($"exact_cnt".desc, $"hk".asc).limit(4)
      top.join(sk, Seq("hk"), "left")
        .select($"hk", $"exact_cnt",
          $"est".isNotNull.as("captured"),
          ($"est".isNotNull && $"lb" <= $"exact_cnt" &&
            $"exact_cnt" <= $"ub").as("within_bound"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "q84_heavy_hitters" ->
      """WITH k AS (SELECT CASE WHEN l_orderkey % 2 = 0 THEN l_orderkey % 8
        |                       ELSE 1000 + l_orderkey % 100000 END AS hk
        |           FROM lineitem),
        |c AS (SELECT hk, CAST(count(*) AS BIGINT) AS exact_cnt
        |      FROM k GROUP BY hk)
        |SELECT hk, exact_cnt, true AS captured, true AS within_bound
        |FROM c ORDER BY exact_cnt DESC, hk ASC LIMIT 4""".stripMargin,
    "q75_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1997-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority""".stripMargin,
    "q76_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |       year(l_shipdate) AS yr,
         |       ${exactSumSql("l_extendedprice * (1 - l_discount)", 4)} AS revenue
         |FROM lineitem
         |JOIN orders ON o_orderkey = l_orderkey
         |JOIN customer ON c_custkey = o_custkey
         |JOIN supplier ON s_suppkey = l_suppkey
         |JOIN nation n1 ON n1.n_nationkey = s_nationkey
         |JOIN nation n2 ON n2.n_nationkey = c_nationkey
         |WHERE n1.n_regionkey = 0 AND n2.n_regionkey = 1
         |GROUP BY 1, 2, 3""".stripMargin,
    "q77_market_share" ->
      s"""SELECT year(o_orderdate) AS yr,
         |       ${sig6Sql(
              "CAST(" + exactSumUnitsSql("CASE WHEN n1.n_name = 'NATION_3' " +
                "THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 4) +
              " AS DOUBLE) / CAST(" +
              exactSumUnitsSql("l_extendedprice * (1 - l_discount)", 4) +
              " AS DOUBLE)")} AS mkt_share
         |FROM lineitem
         |JOIN orders ON o_orderkey = l_orderkey
         |JOIN customer ON c_custkey = o_custkey
         |JOIN supplier ON s_suppkey = l_suppkey
         |JOIN part ON p_partkey = l_partkey
         |JOIN nation n1 ON n1.n_nationkey = s_nationkey
         |JOIN nation n2 ON n2.n_nationkey = c_nationkey
         |WHERE n2.n_regionkey = 1 AND p_type = 'PROMO'
         |GROUP BY 1""".stripMargin,
    "q78_product_profit" ->
      s"""SELECT n_name AS nation, year(o_orderdate) AS yr,
         |       ${exactSumSql("l_extendedprice * (1 - l_discount) " +
            "- 0.6 * p_retailprice * l_quantity", 4)} AS profit
         |FROM lineitem
         |JOIN orders ON o_orderkey = l_orderkey
         |JOIN supplier ON s_suppkey = l_suppkey
         |JOIN part ON p_partkey = l_partkey
         |JOIN nation ON n_nationkey = s_nationkey
         |WHERE p_name LIKE '%widget%'
         |GROUP BY 1, 2""".stripMargin,
    "q79_cust_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN orders ON c_custkey = o_custkey
        |                  AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count""".stripMargin,
    "q80_parts_supp_relation" ->
      """SELECT p_brand, p_type, p_size,
        |       count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#15'
        |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q81_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |       sum(l_quantity) AS total_qty
        |FROM orders
        |JOIN customer ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY 1 HAVING sum(l_quantity) > 250)
        |GROUP BY 1, 2, 3, 4, 5""".stripMargin,
    "q82_disc_revenue" ->
      s"""SELECT ${exactSumSql("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
         |       count(*) AS n_lines
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 1 AND 21)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
         |       AND l_quantity BETWEEN 10 AND 30)
         |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50
         |       AND l_quantity BETWEEN 20 AND 50)""".stripMargin,
    "q83_excess_suppliers" ->
      s"""WITH shipped AS (
         |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
         |  FROM lineitem
         |  WHERE l_partkey IN (SELECT p_partkey FROM part
         |                      WHERE p_brand = 'Brand#12')
         |  GROUP BY 1, 2),
         |cut AS (
         |  SELECT l_partkey AS pk, ${sig6Sql("1.5 * avg(qty)")} AS thr
         |  FROM shipped GROUP BY 1)
         |SELECT DISTINCT s_suppkey, s_name
         |FROM shipped JOIN cut ON pk = l_partkey
         |JOIN supplier ON s_suppkey = l_suppkey
         |WHERE qty > thr""".stripMargin,
  )
}
