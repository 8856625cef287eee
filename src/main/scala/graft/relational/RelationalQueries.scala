package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Canon.{sig6, sig6Sql}
import graft.Tables

/** The declared relational query surface (SURVEY.md §2.4, Q1–Q14).
  *
  * Every query is a plain declarative DataFrame plan — scans, filters,
  * projections, joins, aggregates, windows, set ops — so Catalyst supplies
  * predicate pushdown, column pruning, join selection and whole-stage codegen
  * for free. Each entry has a matching ANSI-SQL oracle (run by the driver in
  * DuckDB over the same parquet files); column aliases are kept identical on
  * both sides because the driver's compare hashes columns by name.
  *
  * Scale notes (100 TB posture): all joins here either broadcast a dimension
  * table (nation/region/customer at their true cardinalities) or shuffle on
  * the natural join key; aggregates are partial (map-side) by construction;
  * no query collects to the driver.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1 — scan + filter + project. Pushdown check: both predicates reach the
    // parquet scan; ReadSchema is 5 columns, not 11.
    "q01_filter_project" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
          $"l_quantity" > 24)
        .select($"l_orderkey", $"l_linenumber",
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
    }),

    // Q2 — hash aggregate, TPC-H Q1 shape (partial agg + final agg on 2 keys).
    "q02_group_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sig6(sum($"l_quantity")).as("sum_qty"),
          sig6(sum($"l_extendedprice")).as("sum_base_price"),
          sig6(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("sum_disc_price"),
          sig6(avg($"l_quantity")).as("avg_qty"),
          sig6(avg($"l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
    }),

    // Q3 — two equi inner joins + aggregate. customer⋈nation broadcasts;
    // orders⋈customer shuffles on custkey.
    "q03_join_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(sig6(sum($"o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
    }),

    // Q4 — broadcast-join chain over the tiny dims (region 5 rows, nation 25).
    "q04_broadcast_join" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_cust"), sig6(sum($"c_acctbal")).as("total_bal"))
    }),

    // Q5a — left outer join + aggregate (customers keep their zero counts).
    "q05_left_outer" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), $"o_custkey" === $"c_custkey", "left")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("order_cnt"))
    }),

    // Q5b — left-semi join (EXISTS): customers with a >400k order.
    "q06_semi_join" -> ((s, dir) => {
      import s.implicits._
      val bigOrders = t(s, dir, "orders").filter($"o_totalprice" > 400000.0)
      t(s, dir, "customer")
        .join(bigOrders, $"o_custkey" === $"c_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
    }),

    // Q5c — left-anti join (NOT EXISTS): customers without one.
    "q07_anti_join" -> ((s, dir) => {
      import s.implicits._
      val bigOrders = t(s, dir, "orders").filter($"o_totalprice" > 400000.0)
      t(s, dir, "customer")
        .join(bigOrders, $"o_custkey" === $"c_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
    }),

    // Q6 — global sort + limit: Spark plans TakeOrderedAndProject (top-k per
    // partition, k merged on the driver — no full sort at scale).
    "q08_topk" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(10)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    }),

    // Q7 — window ranking: latest order per customer (deterministic tiebreak).
    "q09_window_rank" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate".desc, $"o_orderkey".asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
    }),

    // Q8 — window frame: 7-event running sum per user.
    "q10_window_frame" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".asc, $"event_id".asc)
        .rowsBetween(-6, Window.currentRow)
      t(s, dir, "events")
        .select($"event_id", $"user_id", $"value",
          sum($"value").over(w).as("run_sum"))
    }),

    // Q9a — exact distinct counts (expand-based multi-distinct aggregate).
    "q11_count_distinct" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .agg(
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          count(lit(1)).as("n_rows"))
    }),

    // Q9b — HyperLogLog++ sketch counterpart; no SQL oracle (algorithmic
    // estimate — the driver records a rows-only check).
    "q12_approx_distinct" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .agg(
          approx_count_distinct($"l_partkey", 0.01).as("approx_parts"),
          approx_count_distinct($"l_suppkey", 0.01).as("approx_supps"))
    }),

    // Q10 — ROLLUP over the join of orders→customer→nation.
    "q13_rollup" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .rollup($"n_name", $"o_orderpriority")
        .agg(count(lit(1)).as("cnt"), sig6(sum($"o_totalprice")).as("rev"))
    }),

    // Q11 — set operations over two customer-key selections.
    "q14_union" -> ((s, dir) => setOpInputs(s, dir) match {
      case (a, b) => a.union(b).distinct()
    }),
    "q15_union_all" -> ((s, dir) => setOpInputs(s, dir) match {
      case (a, b) => a.union(b)
    }),
    "q16_intersect" -> ((s, dir) => setOpInputs(s, dir) match {
      case (a, b) => a.intersect(b)
    }),
    "q17_except" -> ((s, dir) => setOpInputs(s, dir) match {
      case (a, b) => a.except(b)
    }),

    // Q12 — scalar function gauntlet: string/date/math, row-wise hash-checked.
    "q18_scalar_funcs" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders").select(
        $"o_orderkey",
        upper(substring($"o_orderpriority", 1, 4)).as("pri4"),
        lower($"o_orderstatus").as("st"),
        year($"o_orderdate").as("yr"),
        month($"o_orderdate").as("mon"),
        dayofmonth($"o_orderdate").as("dom"),
        date_trunc("month", $"o_orderdate").as("mstart"),
        floor($"o_totalprice").as("price_floor"),
        abs($"o_totalprice" - lit(100000.0)).as("absdiff"),
        ($"o_orderkey" % 7).as("m7"),
        $"o_orderpriority".like("%URGENT%").as("is_urgent"),
        concat($"o_orderstatus", lit("-"), $"o_orderpriority").as("tag"))
    }),

    // Q12b — conditional expressions: CASE WHEN / NULLIF / COALESCE.
    "q19_case_null" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders").select(
        $"o_orderkey",
        when($"o_totalprice" > 300000.0, "big")
          .when($"o_totalprice" > 150000.0, "mid")
          .otherwise("small").as("bucket"),
        coalesce(nullif($"o_orderstatus", lit("O")), lit("OPEN")).as("st2"))
    }),

    // Q13a — array explode with position over the embeddings table.
    "q20_explode" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "embeddings")
        .select($"vec_id", posexplode($"embedding"))
        .select($"vec_id", $"pos".cast("long").as("pos"), $"col".as("val"))
    }),

    // Q13b — JSON extraction from the events.props string column.
    "q21_json" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events").select(
        $"event_id",
        get_json_object($"props", "$.k").cast("long").as("k"))
    }),

    // Distributed matrix multiply — the reference's MatrixMultiply stub
    // (algorithms.h:200) as the classic relational rendering: A(i,k,v) ⋈
    // B(k,j,v) on the contraction index, groupBy(i,j) sum. Here: the Gram
    // matrix of the first 20 embedding vectors.
    "q25_matmul_gram" -> ((s, dir) => {
      import s.implicits._
      val m = t(s, dir, "embeddings").filter($"vec_id" < 20)
        .select($"vec_id".as("i"),
          posexplode(transform($"embedding", x => x.cast("double"))))
        .select($"i", $"pos", $"col".as("v"))
      m.as("x").join(m.as("y"), $"x.pos" === $"y.pos")
        .groupBy($"x.i".as("i"), $"y.i".as("j"))
        .agg(sig6(sum($"x.v" * $"y.v")).as("v"))
    }),

    // Exact interpolated percentiles (same linear-interpolation definition
    // as DuckDB's quantile_cont) + sketch-based approx (rows-only cousin in
    // q12's spirit would not hash-match, so only the exact one is oracled).
    "q26_percentiles" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          sig6(expr("percentile(l_quantity, 0.5)")).as("p50_qty"),
          sig6(expr("percentile(l_extendedprice, 0.9)")).as("p90_price"))
    }),

    // Sketch-based percentiles — the KLL-style counterpart of q26's exact
    // interpolated percentiles (as q12 is to q11 for distinct counts): one
    // mergeable sketch per group, constant state, map-side partials. No SQL
    // oracle (algorithm-specific estimate); OperatorsSpec pins the error
    // bound against the exact q26 values.
    "q52_approx_percentile" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          expr("approx_percentile(l_quantity, 0.5, 1000)").as("p50_qty"),
          expr("approx_percentile(l_extendedprice, 0.9, 1000)").as("p90_price"))
    }),

    // Scalar subquery: price relative to the global mean.
    "q27_scalar_subquery" -> ((s, dir) => {
      import s.implicits._
      val mean = t(s, dir, "orders").agg(avg($"o_totalprice").as("m"))
      t(s, dir, "orders").crossJoin(broadcast(mean))
        .select($"o_orderkey", sig6($"o_totalprice" / $"m").as("rel_price"))
    }),

    // CUBE — all grouping-set combinations.
    "q28_cube" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("cnt"), sig6(sum($"o_totalprice")).as("rev"))
    }),

    // Pivot: event_type columns per user (fixed value list => stable schema).
    "q29_pivot" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(sig6(sum($"value")))
    }),

    // Null semantics: three-valued logic vs null-safe equality on a
    // projection that manufactures NULLs deterministically.
    "q30_null_semantics" -> ((s, dir) => {
      import s.implicits._
      val withNulls = t(s, dir, "orders").select(
        $"o_orderkey",
        when($"o_orderkey" % 5 === 0, $"o_orderstatus").as("s1"),
        when($"o_orderkey" % 3 === 0, $"o_orderstatus").as("s2"))
      withNulls.select(
        $"o_orderkey",
        ($"s1" === $"s2").as("eq3vl"),
        ($"s1" <=> $"s2").as("eq_nullsafe"),
        $"s1".isNull.as("s1_null"),
        coalesce($"s1", $"s2", lit("none")).as("first_nonnull"))
    }),

    // Q14 — grouped string aggregation, canonicalized by in-group sort.
    "q22_string_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .groupBy($"c_nationkey")
        .agg(array_join(array_sort(collect_list($"c_name")), "|").as("names"))
    }),

    // Explicit GROUPING SETS (the general form behind rollup/cube): two
    // independent summaries in one aggregation pass over the fact table.
    "q32_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin)
    }),

    // FULL OUTER join — the one outer-join shape not yet certified (q05
    // covers left outer): per-customer order totals full-outer against a
    // filtered customer slice, so both null sides occur.
    "q34_full_outer" -> ((s, dir) => {
      import s.implicits._
      val totals = t(s, dir, "orders")
        .groupBy($"o_custkey").agg(sum($"o_totalprice").as("total"))
        .filter($"o_custkey" % 3 === 0)
      val custs = t(s, dir, "customer")
        .filter($"c_acctbal" > 5000.0)
        .select($"c_custkey", $"c_nationkey")
      custs.join(totals, $"c_custkey" === $"o_custkey", "full_outer")
        .select(coalesce($"c_custkey", $"o_custkey").as("k"),
          $"c_nationkey", sig6($"total").as("total"),
          $"c_custkey".isNull.as("no_cust"), $"o_custkey".isNull.as("no_orders"))
    }),

    // ntile quantile bucketing — per-priority order-value quartiles. The
    // window is PARTITIONED (never a global single-partition ntile: at scale
    // that serializes the table through one task; per-key quartiles shuffle
    // on the partition key like any other window).
    "q33_ntile" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice", $"o_orderkey")
      t(s, dir, "orders")
        .select($"o_orderpriority", $"o_totalprice", $"o_orderkey")
        .withColumn("quartile", ntile(4).over(w))
        .groupBy($"o_orderpriority", $"quartile")
        .agg(count(lit(1)).as("cnt"),
          sig6(min($"o_totalprice")).as("lo"),
          sig6(max($"o_totalprice")).as("hi"))
    }),

    // Navigation window functions: lag/lead plus first/last over the full
    // partition frame (the default frame stops at CURRENT ROW — last() under
    // it would just echo the current row).
    "q36_lead_lag" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders").select(
        $"o_custkey", $"o_orderkey",
        lag($"o_totalprice", 1).over(w).as("prev_price"),
        lead($"o_totalprice", 1).over(w).as("next_price"),
        first($"o_orderkey").over(wFull).as("first_key"),
        last($"o_orderkey").over(wFull).as("last_key"))
    }),

    // Correlated-subquery shape: orders above their own customer's average.
    // The oracle states the literal correlated scalar subquery; the Spark
    // plan is its decorrelated form — one window pass, no per-row re-scan
    // (the only rendering that survives at scale).
    "q37_above_cust_avg" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
      t(s, dir, "orders")
        .withColumn("cavg", avg($"o_totalprice").over(w))
        .filter($"o_totalprice" > $"cavg")
        .select($"o_orderkey", $"o_custkey",
          sig6($"o_totalprice" - $"cavg").as("above_by"))
    }),

    // RANGE frame with a time offset: per-user trailing-hour sum/count at
    // every event. Unlike a ROWS frame, peers (equal keys) enter the frame
    // together, so the result is order-independent under ties.
    "q38_range_frame" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ms")
        .rangeBetween(-3600000L, 0L)
      t(s, dir, "events")
        .select($"event_id", $"user_id", unix_millis($"ts".cast("timestamp")).as("ms"), $"value")
        .select($"event_id", $"user_id", $"ms",
          sig6(sum($"value").over(w)).as("hr_sum"),
          count(lit(1)).over(w).as("hr_cnt"))
    }),

    // Statistical aggregates: correlation, covariance, dispersion. All are
    // single-pass co-moment aggregates with map-side partials — the same
    // shuffle profile as sum/avg.
    "q39_stats_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          sig6(corr($"l_quantity", $"l_extendedprice")).as("qp_corr"),
          sig6(covar_samp($"l_quantity", $"l_extendedprice")).as("qp_covar"),
          sig6(covar_pop($"l_quantity", $"l_extendedprice")).as("qp_covarp"),
          sig6(stddev_samp($"l_extendedprice")).as("price_sd"),
          sig6(var_pop($"l_quantity")).as("qty_varp"),
          count(lit(1)).as("n"))
    }),

    // Conditional / ordered-argument aggregation: count_if, filtered sum,
    // bool_or/bool_and, and a deterministic arg-max via max(struct) — the
    // (price, key) struct is unique per group, so ties can't make the
    // answer engine-dependent.
    "q40_conditional_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(
          expr("count_if(o_totalprice > 300000.0)").as("n_big"),
          sig6(sum(when($"o_orderstatus" === "F", $"o_totalprice"))).as("rev_f"),
          expr("bool_or(o_totalprice > 500000.0)").as("any_huge"),
          expr("bool_and(o_totalprice > 1000.0)").as("all_over_1k"),
          max(struct($"o_totalprice".as("p"), $"o_orderkey".as("k")))
            .getField("k").as("best_key"))
    }),

    // Higher-order array functions over the embedding column — filter,
    // fold, exists, array_max — all codegen'd lambda expressions, no UDF.
    "q41_hof_arrays" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "embeddings").select(
        $"vec_id",
        size(filter($"embedding", x => x > 0.0f)).as("n_pos"),
        sig6(aggregate($"embedding", lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))).as("ssq"),
        exists($"embedding", x => x > 0.5f).as("has_big"),
        sig6(array_max($"embedding").cast("double")).as("mx"))
    }),

    // Bag-semantics set operations (EXCEPT ALL / INTERSECT ALL): multiplicity
    // arithmetic, not membership — both inputs carry duplicate keys.
    "q42_except_all" -> ((s, dir) => bagOpInputs(s, dir) match {
      case (a, b) => a.exceptAll(b)
    }),
    "q43_intersect_all" -> ((s, dir) => bagOpInputs(s, dir) match {
      case (a, b) => a.intersectAll(b)
    }),

    // Date/time function gauntlet: day arithmetic, calendar parts, epoch
    // extraction, formatting. Row-wise hash-checked like q18.
    "q44_datetime" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders").select(
        $"o_orderkey",
        datediff(lit("1998-01-01").cast("date"), $"o_orderdate".cast("date"))
          .as("days_to_98"),
        date_add($"o_orderdate".cast("date"), 30).as("d30"),
        quarter($"o_orderdate").as("qtr"),
        dayofweek($"o_orderdate").as("dow"),
        dayofyear($"o_orderdate").as("doy"),
        last_day($"o_orderdate".cast("date")).as("eom"),
        unix_millis($"o_orderdate".cast("timestamp")).as("o_ms"),
        date_format($"o_orderdate", "yyyy-MM").as("ym"))
    }),

    // The SQL-text front door: the same engine through spark.sql() instead
    // of the DataFrame DSL — CTE, join, HAVING (not otherwise certified),
    // ORDER BY + LIMIT, all parsed. The oracle is the IDENTICAL text modulo
    // nothing: it runs as-is in DuckDB.
    "q49_sql_text" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "nation").createOrReplaceTempView("nation")
      s.sql(sqlTextQuery)
    }),

    // MapType end-to-end: per-user (event_type → count) maps built with
    // map_from_entries, then consumed via size/try_element_at. The map is
    // internal — outputs are scalars so the oracle (which states the same
    // facts with FILTER aggregates) can hash-check the semantics.
    "q56_map_type" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"user_id", $"event_type")
        .agg(count(lit(1)).as("cnt"))
        .groupBy($"user_id")
        .agg(map_from_entries(
          array_sort(collect_list(struct($"event_type", $"cnt")))).as("m"))
        .select($"user_id",
          size($"m").as("n_types"),
          expr("try_element_at(m, 'click')").as("clicks"),
          expr("try_element_at(m, 'purchase')").as("purchases"))
    }),

    // ANSI-safe arithmetic: Spark 4 runs ANSI mode by default (division by
    // zero / bad casts THROW), so production pipelines use the try_ family —
    // NULL on failure, matching DuckDB's native TRY_CAST and NULL-on-zero
    // division.
    "q57_try_funcs" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders").select(
        $"o_orderkey",
        expr("try_cast(CASE WHEN o_orderkey % 3 = 0 THEN '12x' " +
          "ELSE CAST(o_orderkey AS STRING) END AS BIGINT)").as("maybe_key"),
        sig6(expr("try_divide(o_totalprice, o_orderkey % 5)")).as("per_mod"),
        expr("try_element_at(array(o_orderstatus), 2)").as("oob"))
    }),

    // Salted skew join behind the oracle gate: the fact side reaches the
    // join with every key split across 8 deterministic sub-keys (the dim
    // side replicated once per salt), so a pathological hot orderkey fans
    // out over 8 tasks instead of serializing one. The oracle states the
    // PLAIN join+agg — hash equality proves salting is semantics-free
    // (operators/SkewJoin; OperatorsSpec pins equivalence on a hot-key
    // fixture, this puts the operator on the driver's gate too).
    "q58_skew_join" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
        .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")
      graft.operators.SkewJoin.saltedInner(
          li, ord, "l_orderkey", salts = 8,
          saltSource = Seq($"l_linenumber", $"l_partkey"))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sig6(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")))
            .as("revenue"))
    }),

    // MERGE/UPSERT (CDC apply) — the mutation primitive warehouse engines
    // spell MERGE INTO, composed from Spark's relational algebra: a
    // deterministic change batch (updates, deletes, inserts derived from
    // the snapshot by key residue) applied as a broadcast LEFT join for
    // the matched ops — delete rows drop, update rows override with
    // COALESCE — plus a UNION of the inserts, whose keys are disjoint by
    // construction. NOT one full-outer join: Spark cannot broadcast
    // either side of full-outer, so that formulation shuffles the entire
    // snapshot; the left+union split keeps the 100 TB side exchange-free
    // with the change batch broadcast (PlanAuditSpec pins it). The
    // gate's synthetic batch is snapshot-PROPORTIONAL (key residues, so
    // every op class is exercised at any SF); real CDC batches are small
    // and absolute, and if one ever outgrew the broadcast limit the
    // split stays valid under a shuffled left join — only the broadcast()
    // hint is the small-batch choice. The oracle restates the merge as
    // set operations over the unioned CTE, so hash equality proves the
    // split implements MERGE semantics exactly.
    "q61_merge_upsert" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.CdcMerge
      val snap = t(s, dir, "customer")
        .select($"c_custkey".as("key"), $"c_name", $"c_acctbal")
      // Change batch (the SHARED CdcMerge builders — s10 drives the same
      // primitive per micro-batch): key%7==0 → +100 balance delta,
      // %7==1 → delete, %7==2 → insert past the snapshot max.
      val mx = snap.agg(max($"key")).as[Long].head()
      val changes = CdcMerge.updates(snap.filter($"key" % 7 === 0), 100.0)
        .unionByName(CdcMerge.deletes(snap.filter($"key" % 7 === 1)))
        .unionByName(CdcMerge.inserts(snap.filter($"key" % 7 === 2), mx + 1L))
      CdcMerge.apply(snap, changes)
        .select($"key", $"c_name".as("name"), sig6($"c_acctbal").as("acctbal"))
    }),

    // Data PROFILING (the ANALYZE-style pre-training audit): per-column
    // null count, exact distinct count, and numeric min/max for a column
    // set, in ONE aggregation pass — the wide one-row aggregate reshapes
    // to long (column, metric...) rows via an inline array, so adding a
    // column is one more struct entry, not another scan. Exact
    // multi-column distincts plan through Spark's Expand (one duplicated
    // stream per distinct — the oracle-able choice; a 100 TB deployment
    // swaps approx_count_distinct per column and loses the Expand, the
    // q12 trade documented there). Non-numeric columns report null
    // min/max rather than engine-specific string renderings.
    "q62_profile" -> ((s, dir) => {
      import s.implicits._
      val nul = lit(null).cast("double")
      t(s, dir, "lineitem")
        .agg(
          count(lit(1)).as("n"),
          sum($"l_quantity".isNull.cast("long")).as("null_qty"),
          countDistinct($"l_quantity").as("dist_qty"),
          sig6(min($"l_quantity")).as("min_qty"),
          sig6(max($"l_quantity")).as("max_qty"),
          sum($"l_orderkey".isNull.cast("long")).as("null_ok"),
          countDistinct($"l_orderkey").as("dist_ok"),
          min($"l_orderkey").cast("double").as("min_ok"),
          max($"l_orderkey").cast("double").as("max_ok"),
          sum($"l_returnflag".isNull.cast("long")).as("null_rf"),
          countDistinct($"l_returnflag").as("dist_rf"),
          sum($"l_shipdate".isNull.cast("long")).as("null_sd"),
          countDistinct($"l_shipdate").as("dist_sd"))
        .select(explode(array(
          struct(lit("l_quantity").as("column"), $"n", $"null_qty".as("n_null"),
            $"dist_qty".as("n_distinct"), $"min_qty".as("min_val"),
            $"max_qty".as("max_val")),
          struct(lit("l_orderkey").as("column"), $"n", $"null_ok".as("n_null"),
            $"dist_ok".as("n_distinct"), $"min_ok".as("min_val"),
            $"max_ok".as("max_val")),
          struct(lit("l_returnflag").as("column"), $"n", $"null_rf".as("n_null"),
            $"dist_rf".as("n_distinct"), nul.as("min_val"), nul.as("max_val")),
          struct(lit("l_shipdate").as("column"), $"n", $"null_sd".as("n_null"),
            $"dist_sd".as("n_distinct"), nul.as("min_val"), nul.as("max_val"))
        )).as("p"))
        .select($"p.column", $"p.n", $"p.n_null", $"p.n_distinct",
          $"p.min_val", $"p.max_val")
    }),

    // UNPIVOT — the inverse of q29's pivot: wide per-row measures melted
    // into (measure, value) long form. Pure row-local reshaping, no shuffle
    // until the final aggregation.
    "q54_unpivot" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity", $"l_discount", $"l_tax")
        .unpivot(
          ids = Array($"l_orderkey", $"l_linenumber"),
          values = Array($"l_quantity", $"l_discount", $"l_tax"),
          variableColumnName = "measure",
          valueColumnName = "val")
        .groupBy($"measure")
        .agg(count(lit(1)).as("n"), sig6(sum($"val")).as("total"))
    }),

    // LATERAL correlated subquery: per nation, the top-2 customers by
    // balance — the "top-N per outer row" shape. Spark decorrelates the
    // lateral into a ranked window (the plan that scales); DuckDB executes
    // the literal LATERAL.
    "q55_lateral" -> ((s, dir) => {
      t(s, dir, "nation").createOrReplaceTempView("nation")
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(
        """SELECT n.n_name, c.c_custkey, c.c_acctbal
          |FROM nation n,
          |LATERAL (
          |  SELECT c_custkey, c_acctbal FROM customer
          |  WHERE c_nationkey = n.n_nationkey
          |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
          |) c""".stripMargin)
    }),

    // Recursive CTE through Spark's UnionLoop operator (new in Spark 4):
    // the classic hierarchy walk — custkeys form a binary tree under
    // parent = id div 2; the recursion assigns each node its depth from
    // root 1 and aggregates per level. UNION ALL recursion only (Spark
    // does not yet support UNION-distinct in recursive CTEs), so the
    // shape is deliberately acyclic — cyclic-graph fixpoints belong to
    // the iterative operators (GraphOps/engine), not the SQL recursion.
    "q53_recursive_cte" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(
        """WITH RECURSIVE tree AS (
          |  SELECT CAST(1 AS BIGINT) AS id, CAST(0 AS BIGINT) AS depth
          |  UNION ALL
          |  SELECT c.c_custkey, t.depth + 1
          |  FROM customer c JOIN tree t ON (c.c_custkey div 2) = t.id
          |  WHERE c.c_custkey > 1
          |)
          |SELECT depth, count(*) AS n_nodes, min(id) AS min_id, max(id) AS max_id
          |FROM tree GROUP BY depth""".stripMargin)
    }),

    // Extension functions through the SQL parser: `array_dot`/`cosine_sim`
    // are graft's native Catalyst expressions, injected by GraftExtensions —
    // this certifies they resolve from SQL TEXT (the path a BI tool or SQL
    // notebook takes), not just the Scala DSL.
    "q50_sql_vector_funcs" -> ((s, dir) => {
      t(s, dir, "embeddings").createOrReplaceTempView("embeddings")
      s.sql(
        s"""SELECT vec_id,
           |  ${sig6Sql("array_dot(transform(embedding, x -> CAST(x AS DOUBLE)), transform(embedding, x -> CAST(x AS DOUBLE)))")} AS self_dot,
           |  ${sig6Sql("cosine_sim(transform(embedding, x -> CAST(x AS DOUBLE)), reverse(transform(embedding, x -> CAST(x AS DOUBLE))))")} AS rev_cos
           |FROM embeddings""".stripMargin)
    }),

    // Regex + string function gauntlet: extract/replace/match, split,
    // padding, translate, edit distance.
    "q45_regex_strings" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer").select(
        $"c_custkey",
        regexp_extract($"c_name", "([0-9]+)$", 1).as("name_num"),
        regexp_replace($"c_mktsegment", "[AEIOU]", "_").as("seg_masked"),
        $"c_name".rlike("[0-9]{3}").as("has3digits"),
        length(split($"c_name", "#")(0)).as("stem_len"),
        lpad($"c_custkey".cast("string"), 8, "0").as("padded"),
        translate($"c_mktsegment", "ABC", "abc").as("xlat"),
        levenshtein($"c_mktsegment", lit("BUILDING")).as("lev"))
    }),

    // TPC-H Q21's shape adapted to this schema — the classic optimizer
    // stress that COMPOSES semi + anti + self-join at fact scale (each
    // join type is certified separately by q17/q18; no other query chains
    // them): suppliers who were the SOLE returned-line supplier in a
    // multi-supplier finished order. Scale posture: all three fact⋈fact
    // joins (semi, anti, orders) key on l_orderkey, so one hash
    // partitioning serves every step — the partitioning-reuse discipline
    // of the superstep engine applied to a relational pipeline; the
    // supplier dim broadcasts; the top-20 cut is a total order
    // (numwait DESC, s_name) and plans as TakeOrdered. PlanAuditSpec pins
    // the semi/anti strategies and the single-exchange property.
    "q69_late_sole_supplier" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_suppkey", $"l_returnflag")
      val l1 = li.filter($"l_returnflag" === "R")
      val l2 = li.select($"l_orderkey".as("k2"), $"l_suppkey".as("s2"))
      val l3 = l1.select($"l_orderkey".as("k3"), $"l_suppkey".as("s3"))
      val sole = l1
        .join(l2, $"l_orderkey" === $"k2" && $"l_suppkey" =!= $"s2",
          "left_semi")
        .join(l3, $"l_orderkey" === $"k3" && $"l_suppkey" =!= $"s3",
          "left_anti")
      val ord = t(s, dir, "orders").filter($"o_orderstatus" === "F")
        .select($"o_orderkey")
      val sup = t(s, dir, "supplier").select($"s_suppkey", $"s_name")
      sole.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_name".asc)
        .limit(20)
    }),
  )

  /** Shared inputs for the set-operation queries: two overlapping custkey sets. */
  private def setOpInputs(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val a = t(s, dir, "customer").filter($"c_acctbal" > 1000.0)
      .select($"c_custkey".as("k"))
    val b = t(s, dir, "orders").filter($"o_orderkey" % 3 === 0)
      .select($"o_custkey".as("k"))
    (a, b)
  }

  /** Inputs for the bag-semantics set ops: both sides keep duplicate keys
    * (orders repeats custkeys), so EXCEPT/INTERSECT ALL exercise multiplicity
    * subtraction rather than degenerate to the DISTINCT forms.
    */
  private def bagOpInputs(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val a = t(s, dir, "orders").filter($"o_totalprice" > 100000.0)
      .select($"o_custkey".as("k"))
    val b = t(s, dir, "orders").filter($"o_orderkey" % 2 === 0)
      .select($"o_custkey".as("k"))
    (a, b)
  }

  /** q49's text — one string, two engines: Spark parses and executes it via
    * spark.sql(); DuckDB runs it verbatim as the oracle.
    */
  private val sqlTextQuery: String =
    s"""WITH big AS (
       |  SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 50000.0)
       |SELECT n_name, count(*) AS cnt, ${sig6Sql("sum(o_totalprice)")} AS rev
       |FROM big
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name
       |HAVING count(*) > 10
       |ORDER BY rev DESC, n_name
       |LIMIT 15""".stripMargin

  private val setA = "SELECT c_custkey AS k FROM customer WHERE c_acctbal > 1000.0"
  private val setB = "SELECT o_custkey AS k FROM orders WHERE o_orderkey % 3 = 0"
  private val bagA = "SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000.0"
  private val bagB = "SELECT o_custkey AS k FROM orders WHERE o_orderkey % 2 = 0"

  val oracles: Map[String, String] = Map(
    "q01_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * (1.0 - l_discount) AS revenue
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-01-01' AND l_quantity > 24""".stripMargin,
    "q02_group_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       ${sig6Sql("sum(l_quantity)")} AS sum_qty,
         |       ${sig6Sql("sum(l_extendedprice)")} AS sum_base_price,
         |       ${sig6Sql("sum(l_extendedprice * (1.0 - l_discount))")} AS sum_disc_price,
         |       ${sig6Sql("avg(l_quantity)")} AS avg_qty,
         |       ${sig6Sql("avg(l_extendedprice)")} AS avg_price,
         |       count(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q03_join_agg" ->
      s"""SELECT n_name, ${sig6Sql("sum(o_totalprice)")} AS revenue, count(*) AS n_orders
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name""".stripMargin,
    "q04_broadcast_join" ->
      s"""SELECT r_name, n_name, count(*) AS n_cust,
         |       ${sig6Sql("sum(c_acctbal)")} AS total_bal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name""".stripMargin,
    "q05_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS order_cnt
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey""".stripMargin,
    "q06_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""".stripMargin,
    "q07_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""".stripMargin,
    "q08_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q09_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate DESC, o_orderkey) AS rn
        |  FROM orders) q WHERE rn = 1""".stripMargin,
    "q10_window_frame" ->
      """SELECT event_id, user_id, value,
        |       sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS run_sum
        |FROM events""".stripMargin,
    "q11_count_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps,
        |       count(*) AS n_rows
        |FROM lineitem""".stripMargin,
    "q13_rollup" ->
      s"""SELECT n_name, o_orderpriority, count(*) AS cnt,
         |       ${sig6Sql("sum(o_totalprice)")} AS rev
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY ROLLUP (n_name, o_orderpriority)""".stripMargin,
    "q14_union" -> s"$setA UNION $setB",
    "q15_union_all" -> s"$setA UNION ALL $setB",
    "q16_intersect" -> s"$setA INTERSECT $setB",
    "q17_except" -> s"$setA EXCEPT $setB",
    "q18_scalar_funcs" ->
      """SELECT o_orderkey,
        |       upper(substr(o_orderpriority, 1, 4)) AS pri4,
        |       lower(o_orderstatus) AS st,
        |       year(o_orderdate) AS yr,
        |       month(o_orderdate) AS mon,
        |       day(o_orderdate) AS dom,
        |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mstart,
        |       CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
        |       abs(o_totalprice - 100000.0) AS absdiff,
        |       o_orderkey % 7 AS m7,
        |       (o_orderpriority LIKE '%URGENT%') AS is_urgent,
        |       concat(o_orderstatus, '-', o_orderpriority) AS tag
        |FROM orders""".stripMargin,
    "q19_case_null" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice > 300000.0 THEN 'big'
        |            WHEN o_totalprice > 150000.0 THEN 'mid'
        |            ELSE 'small' END AS bucket,
        |       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS st2
        |FROM orders""".stripMargin,
    "q20_explode" ->
      """SELECT vec_id,
        |       unnest(range(len(embedding))) AS pos,
        |       unnest(embedding) AS val
        |FROM embeddings""".stripMargin,
    "q21_json" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin,
    "q22_string_agg" ->
      """SELECT c_nationkey, string_agg(c_name, '|' ORDER BY c_name) AS names
        |FROM customer GROUP BY c_nationkey""".stripMargin,
    "q30_null_semantics" ->
      """WITH w AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderkey % 5 = 0 THEN o_orderstatus END AS s1,
        |         CASE WHEN o_orderkey % 3 = 0 THEN o_orderstatus END AS s2
        |  FROM orders)
        |SELECT o_orderkey,
        |       (s1 = s2) AS eq3vl,
        |       (s1 IS NOT DISTINCT FROM s2) AS eq_nullsafe,
        |       (s1 IS NULL) AS s1_null,
        |       coalesce(s1, s2, 'none') AS first_nonnull
        |FROM w""".stripMargin,
    "q26_percentiles" ->
      s"""SELECT l_returnflag,
         |       ${sig6Sql("quantile_cont(l_quantity, 0.5)")} AS p50_qty,
         |       ${sig6Sql("quantile_cont(l_extendedprice, 0.9)")} AS p90_price
         |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q27_scalar_subquery" ->
      s"""SELECT o_orderkey,
         |       ${sig6Sql("o_totalprice / (SELECT avg(o_totalprice) FROM orders)")} AS rel_price
         |FROM orders""".stripMargin,
    "q28_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
         |       ${sig6Sql("sum(o_totalprice)")} AS rev
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q29_pivot" ->
      s"""SELECT user_id,
         |       ${sig6Sql("sum(CASE WHEN event_type = 'click' THEN value END)")} AS click,
         |       ${sig6Sql("sum(CASE WHEN event_type = 'error' THEN value END)")} AS error,
         |       ${sig6Sql("sum(CASE WHEN event_type = 'purchase' THEN value END)")} AS purchase,
         |       ${sig6Sql("sum(CASE WHEN event_type = 'signup' THEN value END)")} AS signup,
         |       ${sig6Sql("sum(CASE WHEN event_type = 'view' THEN value END)")} AS view
         |FROM events GROUP BY user_id""".stripMargin,
    "q25_matmul_gram" ->
      s"""WITH m AS (
         |  SELECT vec_id AS i,
         |         unnest(range(len(embedding))) AS pos,
         |         unnest(embedding::DOUBLE[]) AS v
         |  FROM embeddings WHERE vec_id < 20)
         |SELECT x.i AS i, y.i AS j, ${sig6Sql("sum(x.v * y.v)")} AS v
         |FROM m x JOIN m y ON x.pos = y.pos
         |GROUP BY x.i, y.i""".stripMargin,
    "q32_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin,
    "q34_full_outer" ->
      s"""WITH totals AS (
         |  SELECT o_custkey, sum(o_totalprice) AS t0 FROM orders
         |  GROUP BY o_custkey HAVING o_custkey % 3 = 0),
         |custs AS (
         |  SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000.0)
         |SELECT coalesce(c_custkey, o_custkey) AS k, c_nationkey,
         |       ${sig6Sql("t0")} AS total,
         |       (c_custkey IS NULL) AS no_cust,
         |       (o_custkey IS NULL) AS no_orders
         |FROM custs FULL OUTER JOIN totals ON c_custkey = o_custkey""".stripMargin,
    "q33_ntile" ->
      s"""WITH q AS (
         |  SELECT o_orderpriority, o_totalprice,
         |         ntile(4) OVER (PARTITION BY o_orderpriority
         |                        ORDER BY o_totalprice, o_orderkey) AS quartile
         |  FROM orders)
         |SELECT o_orderpriority, quartile, count(*) AS cnt,
         |       ${sig6Sql("min(o_totalprice)")} AS lo,
         |       ${sig6Sql("max(o_totalprice)")} AS hi
         |FROM q GROUP BY 1, 2""".stripMargin,
    "q36_lead_lag" ->
      """SELECT o_custkey, o_orderkey,
        |       lag(o_totalprice) OVER (PARTITION BY o_custkey
        |                               ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |       lead(o_totalprice) OVER (PARTITION BY o_custkey
        |                                ORDER BY o_orderdate, o_orderkey) AS next_price,
        |       first_value(o_orderkey) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_key,
        |       last_value(o_orderkey) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key
        |FROM orders""".stripMargin,
    "q37_above_cust_avg" ->
      s"""SELECT o_orderkey, o_custkey,
         |       ${sig6Sql("o_totalprice - (SELECT avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)")} AS above_by
         |FROM orders o
         |WHERE o_totalprice > (SELECT avg(o2.o_totalprice) FROM orders o2
         |                      WHERE o2.o_custkey = o.o_custkey)""".stripMargin,
    "q38_range_frame" ->
      s"""SELECT event_id, user_id, epoch_ms(ts) AS ms,
         |       ${sig6Sql("sum(value) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)")} AS hr_sum,
         |       count(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
         |                      RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS hr_cnt
         |FROM events""".stripMargin,
    "q39_stats_agg" ->
      s"""SELECT l_returnflag,
         |       ${sig6Sql("corr(l_quantity, l_extendedprice)")} AS qp_corr,
         |       ${sig6Sql("covar_samp(l_quantity, l_extendedprice)")} AS qp_covar,
         |       ${sig6Sql("covar_pop(l_quantity, l_extendedprice)")} AS qp_covarp,
         |       ${sig6Sql("stddev_samp(l_extendedprice)")} AS price_sd,
         |       ${sig6Sql("var_pop(l_quantity)")} AS qty_varp,
         |       count(*) AS n
         |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q40_conditional_agg" ->
      s"""SELECT o_orderpriority,
         |       count(*) FILTER (WHERE o_totalprice > 300000.0) AS n_big,
         |       ${sig6Sql("sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END)")} AS rev_f,
         |       bool_or(o_totalprice > 500000.0) AS any_huge,
         |       bool_and(o_totalprice > 1000.0) AS all_over_1k,
         |       struct_extract(max({'p': o_totalprice, 'k': o_orderkey}), 'k') AS best_key
         |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q41_hof_arrays" ->
      s"""SELECT vec_id,
         |       len(list_filter(embedding, x -> x > 0)) AS n_pos,
         |       ${sig6Sql("list_sum(list_transform(embedding::DOUBLE[], x -> x*x))")} AS ssq,
         |       len(list_filter(embedding, x -> x > 0.5)) > 0 AS has_big,
         |       ${sig6Sql("list_max(embedding)::DOUBLE")} AS mx
         |FROM embeddings""".stripMargin,
    "q42_except_all" -> s"$bagA EXCEPT ALL $bagB",
    "q43_intersect_all" -> s"$bagA INTERSECT ALL $bagB",
    "q44_datetime" ->
      """SELECT o_orderkey,
        |       date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98,
        |       CAST(o_orderdate AS DATE) + 30 AS d30,
        |       quarter(o_orderdate) AS qtr,
        |       dayofweek(o_orderdate) + 1 AS dow,
        |       dayofyear(o_orderdate) AS doy,
        |       last_day(CAST(o_orderdate AS DATE)) AS eom,
        |       epoch_ms(o_orderdate) AS o_ms,
        |       strftime(o_orderdate, '%Y-%m') AS ym
        |FROM orders""".stripMargin,
    "q49_sql_text" -> sqlTextQuery,
    "q56_map_type" ->
      """SELECT user_id,
        |       count(DISTINCT event_type) AS n_types,
        |       nullif(count(*) FILTER (WHERE event_type = 'click'), 0) AS clicks,
        |       nullif(count(*) FILTER (WHERE event_type = 'purchase'), 0) AS purchases
        |FROM events GROUP BY user_id""".stripMargin,
    "q57_try_funcs" ->
      s"""SELECT o_orderkey,
         |       TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN '12x'
         |                     ELSE CAST(o_orderkey AS VARCHAR) END AS BIGINT) AS maybe_key,
         |       ${sig6Sql("o_totalprice / (o_orderkey % 5)")} AS per_mod,
         |       ([o_orderstatus])[2] AS oob
         |FROM orders""".stripMargin,
    // The oracle is the UNSALTED join — equality proves the salt/replicate/
    // drop dance changes nothing.
    "q58_skew_join" ->
      s"""SELECT o_orderpriority, count(*) AS n_items,
         |       ${sig6Sql("sum(l_extendedprice * (1.0 - l_discount))")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority""".stripMargin,
    // MERGE restated as set operations: survivors = (snapshot minus
    // deleted/updated keys) ∪ updated rows ∪ inserts — any divergence
    // from the Spark side's left-join+union split (NOT a full-outer
    // join; see the query comment) breaks the hash.
    "q61_merge_upsert" ->
      s"""WITH snap AS (SELECT c_custkey AS key, c_name, c_acctbal FROM customer),
         |upd AS (SELECT key, c_name, c_acctbal + 100.0 AS bal FROM snap WHERE key % 7 = 0),
         |del AS (SELECT key FROM snap WHERE key % 7 = 1),
         |mx AS (SELECT max(key) + 1 AS off FROM snap),
         |ins AS (SELECT key + off AS key,
         |               'New#' || CAST(key + off AS VARCHAR) AS c_name,
         |               0.0 AS bal
         |        FROM snap, mx WHERE key % 7 = 2)
         |SELECT key, c_name AS name, ${sig6Sql("c_acctbal")} AS acctbal
         |FROM snap WHERE key % 7 NOT IN (0, 1)
         |UNION ALL
         |SELECT key, c_name AS name, ${sig6Sql("bal")} AS acctbal FROM upd
         |UNION ALL
         |SELECT key, c_name AS name, ${sig6Sql("bal")} AS acctbal FROM ins""".stripMargin,
    // One aggregate row per metric set, reshaped long exactly like the
    // Spark side.
    "q62_profile" ->
      // Every integer sum is CAST to BIGINT: DuckDB types sum(INTEGER) as
      // HUGEINT, which the python client hands to pandas as float64 —
      // int64-vs-float64 renders differently under str()-style
      // canonicalizers even when the values are equal. Spark's side is
      // LongType, so the oracle must pin BIGINT too. Same reason the
      // min/max go through an explicit DOUBLE cast before sig6.
      s"""WITH a AS (
         |  SELECT count(*) AS n,
         |         CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_qty,
         |         count(DISTINCT l_quantity) AS dist_qty,
         |         ${sig6Sql("CAST(min(l_quantity) AS DOUBLE)")} AS min_qty,
         |         ${sig6Sql("CAST(max(l_quantity) AS DOUBLE)")} AS max_qty,
         |         CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ok,
         |         count(DISTINCT l_orderkey) AS dist_ok,
         |         CAST(min(l_orderkey) AS DOUBLE) AS min_ok,
         |         CAST(max(l_orderkey) AS DOUBLE) AS max_ok,
         |         CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_rf,
         |         count(DISTINCT l_returnflag) AS dist_rf,
         |         CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_sd,
         |         count(DISTINCT l_shipdate) AS dist_sd
         |  FROM lineitem)
         |SELECT 'l_quantity' AS "column", n, null_qty AS n_null,
         |       dist_qty AS n_distinct, min_qty AS min_val, max_qty AS max_val
         |FROM a
         |UNION ALL
         |SELECT 'l_orderkey', n, null_ok, dist_ok, min_ok, max_ok FROM a
         |UNION ALL
         |SELECT 'l_returnflag', n, null_rf, dist_rf,
         |       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM a
         |UNION ALL
         |SELECT 'l_shipdate', n, null_sd, dist_sd,
         |       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM a""".stripMargin,
    "q54_unpivot" ->
      s"""WITH u AS (
         |  SELECT l_orderkey, l_linenumber, measure, val
         |  FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
         |        FROM lineitem)
         |  UNPIVOT (val FOR measure IN (l_quantity, l_discount, l_tax)))
         |SELECT measure, count(*) AS n, ${sig6Sql("sum(val)")} AS total
         |FROM u GROUP BY measure""".stripMargin,
    "q55_lateral" ->
      """SELECT n.n_name, c.c_custkey, c.c_acctbal
        |FROM nation n,
        |LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        |) c""".stripMargin,
    "q53_recursive_cte" ->
      """WITH RECURSIVE tree AS (
        |  SELECT CAST(1 AS BIGINT) AS id, CAST(0 AS BIGINT) AS depth
        |  UNION ALL
        |  SELECT c.c_custkey, t.depth + 1
        |  FROM customer c JOIN tree t ON (c.c_custkey // 2) = t.id
        |  WHERE c.c_custkey > 1
        |)
        |SELECT depth, count(*) AS n_nodes, min(id) AS min_id, max(id) AS max_id
        |FROM tree GROUP BY depth""".stripMargin,
    "q50_sql_vector_funcs" ->
      s"""SELECT vec_id,
         |  ${sig6Sql("list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])")} AS self_dot,
         |  ${sig6Sql("list_cosine_similarity(embedding::DOUBLE[], list_reverse(embedding::DOUBLE[]))")} AS rev_cos
         |FROM embeddings""".stripMargin,
    "q45_regex_strings" ->
      """SELECT c_custkey,
        |       regexp_extract(c_name, '([0-9]+)$', 1) AS name_num,
        |       regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS seg_masked,
        |       regexp_matches(c_name, '[0-9]{3}') AS has3digits,
        |       len(string_split(c_name, '#')[1]) AS stem_len,
        |       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        |       translate(c_mktsegment, 'ABC', 'abc') AS xlat,
        |       levenshtein(c_mktsegment, 'BUILDING') AS lev
        |FROM customer""".stripMargin,
    "q69_late_sole_supplier" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.l_returnflag = 'R'
        |AND EXISTS (SELECT 1 FROM lineitem l2
        |            WHERE l2.l_orderkey = l1.l_orderkey
        |              AND l2.l_suppkey <> l1.l_suppkey)
        |AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                WHERE l3.l_orderkey = l1.l_orderkey
        |                  AND l3.l_suppkey <> l1.l_suppkey
        |                  AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
  )
}
