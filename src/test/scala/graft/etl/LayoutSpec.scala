package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Plan-level proof of the physical-layout claims: partition pruning
  * reaches the scan, bucketed joins run without an exchange. At 100 TB
  * these two properties decide whether a query touches gigabytes or
  * everything, so they are locked in as tests.
  */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  private def explain(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("partitioned layout: filter on the partition column prunes at the scan") {
    val root = tmpDir("layout_part").toString + "/events"
    val days = Seq(
      (1L, "2024-01-01", 1.0), (2L, "2024-01-01", 2.0),
      (3L, "2024-01-02", 3.0), (4L, "2024-01-03", 4.0))
      .toDF("id", "day", "v").withColumn("day", col("day").cast("date"))
    Layout.writePartitioned(days, root, Seq("day"))

    val q = spark.read.parquet(root).filter(col("day") === lit("2024-01-02").cast("date"))
    val p = explain(q)
    assert(p.contains("PartitionFilters") &&
      p.matches("(?s).*PartitionFilters: \\[[^\\]]*day[^\\]]*\\].*"), p)
    assert(q.collect().map(_.getAs[Long]("id")).toSeq == Seq(3L))
    // the pruned read must touch only the matching partition directory
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .head.metrics.get("numFiles")
    q.count()
    assert(scanned.exists(_.value == 1), s"expected 1 file read, got $scanned")
  }

  test("compaction collapses small files, preserves data and partitioning") {
    val root = tmpDir("layout_compact").toString + "/t"
    val df = (0L until 1000L).map(i => (i, (i % 3).toString, i * 1.5))
      .toDF("id", "p", "v")
    // fragment: 8 writes of one partition-triple each -> many small files
    (0 until 8).foreach { _ =>
      df.sample(0.12).write.mode("append").partitionBy("p").parquet(root)
    }
    def parquetFiles(): Long = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator().asScala
        .count(f => f.toString.endsWith(".parquet"))
    }
    val beforeFiles = parquetFiles()
    val beforeData = spark.read.parquet(root).collect().map(_.toString).sorted
    Layout.compact(spark, root, partitionCols = Seq("p"))
    assert(parquetFiles() < beforeFiles)
    assert(parquetFiles() <= 3 * 1)   // ~1 task's output per partition
    val afterData = spark.read.parquet(root).collect().map(_.toString).sorted
    assert(afterData.toSeq == beforeData.toSeq)
    // partition pruning still works on the compacted layout
    val p = explain(spark.read.parquet(root).filter(col("p") === "1"))
    assert(p.contains("PartitionFilters"), p)
  }

  test("dynamic partition pruning: a dim filter prunes the fact scan at runtime") {
    val root = tmpDir("layout_dpp").toString + "/facts"
    val facts = (0L until 2000L).map(i => (i, s"d${i % 20}", i * 1.0))
      .toDF("id", "day", "v")
    Layout.writePartitioned(facts, root, Seq("day"))
    // dim must be a real relation (a LocalRelation's filter constant-folds
    // away, and DPP requires a selective predicate on the build side)
    val dimPath = tmpDir("layout_dpp_dim").toString + "/dim"
    (0 until 20).map(i => (s"d$i", if (i < 2) "keep" else "drop"))
      .toDF("day", "flag").write.parquet(dimPath)
    // at test scale the stats-based benefit estimate rejects pruning (the
    // whole fact table is a few KB); force the ratio heuristic the way a
    // real deployment with missing stats would take
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      val q = spark.read.parquet(root)
        .join(spark.read.parquet(dimPath).filter(col("flag") === "keep"), "day")
      val p = explain(q)
      assert(p.toLowerCase.contains("dynamicpruning"), p)
      assert(q.count() == 200)   // 2 of 20 days survive
    } finally spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
  }

  test("runtime bloom-filter join pruning reaches the fact scan") {
    // DPP's sibling for NON-partition join keys: a selective dim filter
    // plants a bloom filter of its join keys into the fact scan, so fact
    // rows that cannot match are dropped at the scan instead of being
    // shuffled — thresholds scaled down to test size
    val dir = tmpDir("layout_bloom")
    val facts = (0L until 50000L).map(i => (i % 5000, s"pay-$i-${"x" * 30}"))
      .toDF("k", "payload")
    facts.write.parquet(s"$dir/facts")
    (0L until 5000L).map(i => (i, if (i < 50) "hot" else "cold"))
      .toDF("k2", "temp").write.parquet(s"$dir/dim")
    val conf = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = spark.read.parquet(s"$dir/facts")
        .join(spark.read.parquet(s"$dir/dim").filter(col("temp") === "hot"),
          col("k") === col("k2"))
      val p = explain(q)
      assert(p.toLowerCase.contains("bloomfilter") ||
        p.toLowerCase.contains("might_contain"), p)
      assert(q.count() == 500)   // 50 hot keys x 10 fact rows each
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits skewed join partitions at runtime") {
    // one key carries ~90% of the fact rows; with thresholds scaled to
    // test size, adaptive execution must mark the sort-merge join skewed
    // and split the hot partition instead of letting one task drag
    val conf = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val facts = (0L until 60000L)
        .map(i => (if (i % 10 < 9) 7L else i % 1000, s"payload-$i-${"x" * 40}"))
        .toDF("k", "payload")
      val dim = (0L until 1000L).map(i => (i, s"name$i")).toDF("k", "name")
      val joined = facts.join(dim, "k")
      // materialize THROUGH this DataFrame's own query execution —
      // count() would plan a separate query and leave this one unrun
      assert(joined.collect().length == 60000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), finalPlan.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("schema evolution: mergeSchema reads old and new file generations") {
    val root = tmpDir("layout_evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "v1").write.parquet(root)
    Seq((2L, "b", 9.5)).toDF("id", "v1", "v2_added")
      .write.mode("append").parquet(root)
    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert(merged.columns.sorted.toSeq == Seq("id", "v1", "v2_added"))
    val byId = merged.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("v2_added"))) // old files: null
    assert(byId(2L).getAs[Double]("v2_added") == 9.5)
  }

  test("generic quality rules: one pass, emit-if-positive") {
    import spark.implicits._
    val df = Seq((1, "ok"), (-5, "ok"), (3, ""), (-9, "")).toDF("n", "s")
    val out = graft.etl.Quality.check(spark, df, Seq(
        graft.etl.Quality.Rule("negative_n", "error", col("n") < 0),
        graft.etl.Quality.Rule("blank_s", "warn", col("s") === ""),
        graft.etl.Quality.Rule("huge_n", "warn", col("n") > 1000)),
      jobId = "j")
      .collect().map(r => r.getAs[String]("rule_name") ->
        r.getAs[Long]("affected_rows")).toMap
    assert(out == Map("negative_n" -> 2L, "blank_s" -> 2L)) // huge_n omitted
  }

  test("z-order: morton bits interleave exactly; files get tight 2-D boxes") {
    // bit-exactness against a driver-side reference
    def ref(x: Int, y: Int, bits: Int): Long =
      (0 until bits).map { i =>
        (((x >> i) & 1).toLong << (2 * i)) |
          (((y >> i) & 1).toLong << (2 * i + 1))
      }.sum
    val pts = for (x <- 0 until 32; y <- 0 until 32) yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.mortonCode(col("x"), col("y"), bits = 5).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    for ((x, y) <- pts) assert(got((x, y)) == ref(x, y, 5), s"($x,$y)")

    // out-of-range inputs saturate at the boundary (monotone clamp),
    // never truncate-and-wrap: 40 > 31 behaves as 31, negatives as 0 —
    // a wrap would scatter the tail across the whole code space
    val clamped = Seq((40, 7), (-3, 7), (1 << 20, 40), (31, -9))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.mortonCode(col("x"), col("y"), bits = 5).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(clamped((40, 7)) == ref(31, 7, 5))
    assert(clamped((-3, 7)) == ref(0, 7, 5))
    assert(clamped((1 << 20, 40)) == ref(31, 31, 5))
    assert(clamped((31, -9)) == ref(31, 0, 5))

    // layout quality = pruning: how many files could a filter on the
    // SECOND dimension touch, judged by per-file min/max stats (what
    // parquet row-group pruning sees)? A 1-D sort by x leaves every
    // file spanning the full y-range (all files touched); z-order files
    // cover y-bands, so most files' stats exclude the probe.
    def filesTouchingY(df: org.apache.spark.sql.DataFrame,
                       lo: Int, hi: Int): Long =
      df.groupBy(spark_partition_id().as("f"))
        .agg(min("y").as("ymin"), max("y").as("ymax"))
        .filter(col("ymax") >= lo && col("ymin") <= hi)
        .count()
    val grid = pts.toDF("x", "y")
    val zTouch = filesTouchingY(Layout.zorderBy(grid, col("x"), col("y"),
      numFiles = 16, bits = 5), 8, 11)
    val xTouch = filesTouchingY(grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x")), 8, 11)
    assert(xTouch == 16L, s"linear=$xTouch") // 1-D sort prunes nothing on y
    assert(zTouch * 2 <= xTouch, s"z=$zTouch linear=$xTouch")

    // write path round-trips the data unchanged
    val dir = tmpDir("layout_z").toString + "/z"
    Layout.writeZordered(grid, dir, col("x"), col("y"), numFiles = 4,
      bits = 5)
    assert(spark.read.parquet(dir).count() == 1024L)
  }

  test("bucketed tables: equi-join on the bucket key plans with no exchange") {
    val wh = tmpDir("layout_wh")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val facts = (0L until 1000L).map(i => (i % 100, i, i * 2.0))
        .toDF("k", "id", "v")
      val dims = (0L until 100L).map(i => (i, s"name$i")).toDF("k", "name")
      spark.sql(s"CREATE DATABASE IF NOT EXISTS layoutspec LOCATION '$wh'")
      Layout.writeBucketed(facts, "layoutspec.facts_b", "k", buckets = 8)
      Layout.writeBucketed(dims, "layoutspec.dims_b", "k", buckets = 8)

      val joined = spark.table("layoutspec.facts_b")
        .join(spark.table("layoutspec.dims_b"), "k")
      val p = explain(joined)
      assert(!p.contains("Exchange"), p)   // co-located: no shuffle either side
      assert(joined.count() == 1000L)

      // identical non-bucketed join DOES shuffle — the layout is what saves it
      val plain = facts.join(dims, "k")
      assert(explain(plain).contains("Exchange"), explain(plain))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP DATABASE IF EXISTS layoutspec CASCADE")
    }
  }
}
