package graft

import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketed tables: both sides bucketed on the join key
  * join WITHOUT any shuffle exchange — the persistent form of the
  * partitioning-reuse property (OperatorsSpec), and the posture for repeated
  * 100 TB fact⋈fact joins: pay the shuffle once at write time.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed-bucketed join plans no exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    // Disable broadcast so the planner exercises the bucketed path (at
    // fact⋈fact scale neither side broadcasts and this is the real plan).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free plan:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan not used:\n$plan")
      assert(joined.count() == 6000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("cluster-bucketed embedding pair scan plans no exchange (l34 at rest)") {
    // The semantic-dedup doc (Similarity.semanticDedup) claims the at-rest
    // 100 TB layout — the corpus written bucketed by its kmeans cell —
    // makes re-runs of the within-cell pair scan shuffle-free. Prove it:
    // an l34-shaped relation bucketed on `cluster` self-joins with zero
    // exchanges. (The cell assignment here is synthetic — the property
    // under test is the layout, not the clustering.)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.sql("DROP TABLE IF EXISTS b_emb")
    Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(($"vec_id" % 8).cast("int").as("cluster"), $"vec_id",
        transform($"embedding", x => x.cast("double")).as("v"))
      .write.bucketBy(4, "cluster").sortBy("cluster")
      .mode("overwrite").saveAsTable("b_emb")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val e = spark.table("b_emb")
      val pairs = e.as("a").join(e.as("b"),
        $"a.cluster" === $"b.cluster" && $"a.vec_id" < $"b.vec_id")
      val plan = pairs.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free pair scan:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan not used:\n$plan")
      assert(pairs.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("hive-partitioned layout: a language filter prunes at the directory level") {
    // The OTHER at-rest layout lever beside bucketing: a corpus written
    // partitionBy(lang) turns per-language consumers (the l10/l19/l24
    // family) into directory-pruned scans — at 100 TB a lang='de' read
    // touches only that partition's files, decided at planning time from
    // the directory listing, before any row or footer is read.
    import spark.implicits._
    val dir = TestSpark.tempDir("graft_part_fx")
    Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .write.partitionBy("lang").mode("overwrite").parquet(dir)
    val one = spark.read.parquet(dir).filter($"lang" === "de")
    one.collect()
    val plan = one.queryExecution.executedPlan.toString
    // The predicate lands in PartitionFilters (pruning), NOT in a
    // post-scan Filter over all partitions.
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    // And the pruned scan reads strictly fewer files than the full table.
    def files(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics.get("numFiles").map(_.value).getOrElse(-1L)
      }.getOrElse(-1L)
    val all = spark.read.parquet(dir)
    all.collect()
    assert(files(one) > 0 && files(all) > files(one),
      s"pruned=${files(one)} full=${files(all)}")
    val expected = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter($"lang" === "de").count()
    assert(one.count() == expected)
  }

  test("sort-ordered layout: date filter skips row groups (q60 at rest)") {
    // The third at-rest lever beside bucketing and hive partitioning:
    // rows range-partitioned + sorted on l_shipdate give every row group
    // a narrow disjoint [min, max], so a pushed date predicate prunes at
    // the footer level. MEASURED, not assumed: recordsRead (rows actually
    // materialized from parquet) under the narrow filter must collapse on
    // the sorted copy and stay full-table on an unsorted copy of the
    // same rows — the filter itself cannot cause the difference, only
    // the layout can.
    import spark.implicits._
    import org.apache.spark.sql.functions.{count, date_trunc, lit, to_date}
    val sfDir = "/root/testdata/sf0.001"
    val raw = Tables.load(spark, sfDir, "lineitem")
    // The DATE key is faithful only because every l_shipdate is midnight —
    // pinned to the full timestamp (not just hour/minute: a stray
    // seconds field would make to_date lossy too).
    assert(raw.filter(
      $"l_shipdate" =!= date_trunc("day", $"l_shipdate")).count() == 0)
    val base = raw.select(to_date($"l_shipdate").as("l_sdate"),
      $"l_returnflag", $"l_extendedprice")
    // The PRODUCTION writer, not a private re-implementation: if the
    // registry query's layout drifts (partition count, key type — the
    // load-bearing DATE), this measurement fails with it.
    val sorted = graft.sources.FormatRoundtrip.sortedLayout(spark, sfDir)
    val shuffled = TestSpark.tempDir("graft_shuf60_fx")
    base.repartition(8).write.mode("overwrite").parquet(shuffled)

    val read = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          read.addAndGet(t.taskMetrics.inputMetrics.recordsRead): Unit
    }
    def inRange(df: org.apache.spark.sql.DataFrame) =
      df.filter($"l_sdate" >= lit("1996-01-01").cast("date") &&
        $"l_sdate" < lit("1996-04-01").cast("date"))
    def recordsRead(path: String): Long = {
      spark.sparkContext.addSparkListener(listener)
      try {
        read.set(0)
        inRange(spark.read.parquet(path)).agg(count(lit(1))).collect()
        // Listener events drain asynchronously after collect() returns;
        // poll until the counter settles (the Bench.settled pattern).
        var prev = -1L
        var tries = 0
        while (read.get != prev && tries < 40) {
          prev = read.get; Thread.sleep(25); tries += 1
        }
        read.get
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val total = base.count()
    val matching = inRange(base).count()
    val sortedRead = recordsRead(sorted)
    val shuffledRead = recordsRead(shuffled)
    // Unsorted: every row group intersects the range → full-table read.
    assert(shuffledRead >= total, s"shuffled=$shuffledRead total=$total")
    // Sorted: only the slice's row groups are materialized. At this SF a
    // row group is a whole file (1/8 of the range), so allow that
    // granularity plus one boundary group.
    assert(sortedRead < total / 2,
      s"sorted=$sortedRead total=$total matching=$matching")
    assert(sortedRead >= matching)
  }

  test("mortonZ matches the bit-interleave definition") {
    import org.apache.spark.sql.functions.lit
    def z(a: Long, b: Long): Long =
      spark.range(1).select(
        graft.sources.FormatRoundtrip.mortonZ(lit(a), lit(b), 8).as("z"))
        .head().getLong(0)
    def ref(a: Long, b: Long): Long =
      (0 until 8).map(i => (((a >> i) & 1) << (2 * i + 1)) |
        (((b >> i) & 1) << (2 * i))).reduce(_ | _)
    assert(z(0, 0) == 0)
    assert(z(1, 0) == 2) // a's bit 0 lands one position ABOVE b's
    assert(z(0, 1) == 1)
    assert(z(255, 255) == 65535)
    for (a <- Seq(3L, 77L, 200L); b <- Seq(5L, 128L, 250L))
      assert(z(a, b) == ref(a, b), s"a=$a b=$b")
  }

  test("z-ordered layout: EITHER dimension's filter prunes row groups " +
      "(q65 at rest)") {
    // The 2-D generalization of the q60 measurement: on the
    // Morton-clustered copy, a date-only filter and a quantity-only
    // filter must EACH materialize less than the full table — a 1-D sort
    // key can only ever serve its leading column — while the identical
    // filters over an unsorted copy of the same rows stay full-table, so
    // the layout (not the predicate) is what's measured. Thresholds are
    // set at the curve's granularity: with 8 z-range files ≈ 3 high z
    // bits (date, qty, date), a ~6-month date slice pins both date bits
    // (≈2/8 files + boundaries) and a qty>40 slice pins the one qty bit
    // (≈4/8 files + boundaries) — both comfortably under 3/4 of the
    // table, where an unclustered copy reads 8/8.
    import spark.implicits._
    import org.apache.spark.sql.functions.{count, lit, to_date}
    val sfDir = "/root/testdata/sf0.001"
    val base = Tables.load(spark, sfDir, "lineitem")
      .select(to_date($"l_shipdate").as("l_sdate"),
        $"l_quantity".cast("long").as("l_qty"),
        $"l_returnflag", $"l_extendedprice")
    // The PRODUCTION writer, same discipline as the q60 measurement.
    val zpath = graft.sources.FormatRoundtrip.zorderLayout(spark, sfDir)
    val shuffled = TestSpark.tempDir("graft_shuf65_fx")
    base.repartition(8).write.mode("overwrite").parquet(shuffled)

    val read = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          read.addAndGet(t.taskMetrics.inputMetrics.recordsRead): Unit
    }
    def recordsRead(path: String)(
        where: org.apache.spark.sql.DataFrame =>
          org.apache.spark.sql.DataFrame): Long = {
      spark.sparkContext.addSparkListener(listener)
      try {
        read.set(0)
        where(spark.read.parquet(path)).agg(count(lit(1))).collect()
        var prev = -1L
        var tries = 0
        while (read.get != prev && tries < 40) {
          prev = read.get; Thread.sleep(25); tries += 1
        }
        read.get
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    def dateOnly(df: org.apache.spark.sql.DataFrame) =
      df.filter($"l_sdate" >= lit("1996-01-01").cast("date") &&
        $"l_sdate" < lit("1996-07-01").cast("date"))
    def qtyOnly(df: org.apache.spark.sql.DataFrame) =
      df.filter($"l_qty" > 40)
    val total = base.count()
    // Unclustered: every row group intersects both predicates.
    assert(recordsRead(shuffled)(dateOnly) >= total)
    assert(recordsRead(shuffled)(qtyOnly) >= total)
    // Z-clustered: each dimension prunes through its OWN footer stats.
    val zDate = recordsRead(zpath)(dateOnly)
    val zQty = recordsRead(zpath)(qtyOnly)
    assert(zDate < total * 3 / 4, s"date-only read $zDate of $total")
    assert(zQty < total * 3 / 4, s"qty-only read $zQty of $total")
    // And pruning never loses a row.
    assert(dateOnly(spark.read.parquet(zpath)).count() ==
      dateOnly(base).count())
    assert(qtyOnly(spark.read.parquet(zpath)).count() ==
      qtyOnly(base).count())
  }
}
