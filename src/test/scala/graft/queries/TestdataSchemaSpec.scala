package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Guard against driver-side testdata schema drift.
  *
  * Round-7 postmortem: `events.ts` silently changed from TIMESTAMP(NANOS)
  * to TIMESTAMP(MICROS) between driver rounds, the loader's nanos
  * workaround became a type error, and 12 of 101 driver queries died at
  * analysis time — while `sbt test` stayed 199/199 green, because nothing
  * in-repo read `/root/testdata`. This spec closes that hole two ways:
  *
  *  1. pins the post-load column name→type map of every testdata table
  *     (through [[TestdataQueries.table]], the exact path the driver
  *     queries use — so it also covers the loader's vintage branching);
  *  2. constructs (analyzes, without executing) every events-family
  *     query, the family the r7 drift killed, so an analysis-time
  *     `DATATYPE_MISMATCH` surfaces here first.
  *
  * If the driver regenerates testdata with new types, this fails with the
  * actual map in the message — update the loader first, then this pin.
  */
class TestdataSchemaSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def available = new java.io.File(dir).isDirectory

  private def types(name: String): Map[String, DataType] =
    TestdataQueries.table(spark, dir, name).schema.fields
      .map(f => f.name -> f.dataType).toMap

  private def pin(name: String, expected: Map[String, DataType]): Unit =
    test(s"$name schema matches the pinned driver contract") {
      assume(available, s"$dir not present (driver-owned testdata)")
      val actual = types(name)
      assert(actual == expected,
        s"\ntestdata schema drift in `$name` — actual:\n  " +
          actual.toSeq.sortBy(_._1).map { case (c, t) => s"$c: $t" }
            .mkString("\n  ") +
          "\nFix graft.queries.TestdataQueries.t() first, then this pin.")
    }

  // events is pinned POST-load: whatever vintage the parquet stores
  // (int64 nanos / micros NTZ / micros UTC), the loader must normalize
  // `ts` to microsecond TimestampType — everything downstream depends on it.
  pin("events", Map(
    "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
    "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType))

  pin("lineitem", Map(
    "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
    "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
    "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
    "l_tax" -> DoubleType, "l_returnflag" -> StringType,
    "l_linestatus" -> StringType, "l_shipdate" -> TimestampNTZType))

  pin("orders", Map(
    "o_orderkey" -> LongType, "o_custkey" -> LongType,
    "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
    "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType))

  pin("documents", Map(
    "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
    "source" -> StringType, "n_chars" -> LongType))

  pin("embeddings", Map(
    "vec_id" -> LongType, "embedding" -> ArrayType(FloatType, true),
    "label" -> IntegerType))

  pin("customer", Map(
    "c_custkey" -> LongType, "c_name" -> StringType,
    "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
    "c_mktsegment" -> StringType))

  pin("supplier", Map(
    "s_suppkey" -> LongType, "s_name" -> StringType,
    "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))

  pin("part", Map(
    "p_partkey" -> LongType, "p_name" -> StringType,
    "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
    "p_retailprice" -> DoubleType))

  pin("nation", Map(
    "n_nationkey" -> IntegerType, "n_name" -> StringType,
    "n_regionkey" -> IntegerType))

  pin("region", Map(
    "r_regionkey" -> IntegerType, "r_name" -> StringType))

  // The r7 failure mode was analysis-time, not execution-time: merely
  // constructing the DataFrame would have thrown. Construct every
  // events-family query (lazy — no jobs run) so that mode is caught here.
  private val eventsFamily = Seq(
    "q07_date_trend", "q16_low_value_filter", "q17_recent_window",
    "q21_stream_window", "q22_sessionize", "q25_salted_agg",
    "q26_asof_join", "q27_range_join", "q50_analytic_windows",
    "q51_pivot", "q91_series_motifs", "q92_series_outliers",
    "q107_funnel", "q108_json_extract", "q109_cohort_retention",
    "q110_transitions", "q111_rolling_active")

  // The loader must normalize EVERY vintage the driver has shipped to
  // microsecond TimestampType — including the ones the current testdata
  // no longer exercises (int64 nanos through r6; a UTC-adjusted
  // TIMESTAMP would also arrive if the generator ever sets
  // isAdjustedToUTC). Synthesized fixtures keep those branches alive.
  test("events loader: int64-nanos vintage truncates to micros") {
    val dir = java.nio.file.Files.createTempDirectory("ev-nanos")
    dir.toFile.deleteOnExit()
    import spark.implicits._
    // 2024-01-01T00:00:00.123456789Z in nanos — expect micros truncation
    val nanos = 1704067200123456789L
    Seq((1L, nanos)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = TestdataQueries.table(spark, dir.toString, "events")
    assert(out.schema("ts").dataType == TimestampType)
    val got = out.select(org.apache.spark.sql.functions.col("ts")
      .cast("string")).head.getString(0)
    assert(got == "2024-01-01 00:00:00.123456",
      s"nanos vintage mis-truncated: $got")
  }

  test("events loader: UTC-adjusted timestamp vintage passes through") {
    val dir = java.nio.file.Files.createTempDirectory("ev-utc")
    dir.toFile.deleteOnExit()
    import spark.implicits._
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00.123456")))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = TestdataQueries.table(spark, dir.toString, "events")
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(org.apache.spark.sql.functions.col("ts")
        .cast("string")).head.getString(0) == "2024-01-01 00:00:00.123456")
  }

  // The driver verifies at sf0.01 and benches at sf0.1 — a PARTIAL
  // regeneration could drift one sf dir while sf0.001 (pinned above)
  // stays intact. Spot-pin the three drift-prone tables at every sf.
  test("events/lineitem/documents load identically at every scale factor") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      assume(new java.io.File(d).isDirectory, s"$d not present")
      assert(TestdataQueries.table(spark, d, "events")
        .schema("ts").dataType == TimestampType, s"events.ts at $sf")
      assert(TestdataQueries.table(spark, d, "lineitem")
        .schema("l_shipdate").dataType == TimestampNTZType,
        s"lineitem.l_shipdate at $sf")
      assert(TestdataQueries.table(spark, d, "documents")
        .schema("text").dataType == StringType, s"documents.text at $sf")
    }
  }

  test("driver contract: every query has an oracle, every oracle a query") {
    val qs = graft.SparkEntry.queries.keySet
    val os = graft.SparkEntry.oracleSql.keySet
    assert((qs -- os).isEmpty,
      s"queries without an oracle (driver downgrades them to rows-only): ${qs -- os}")
    assert((os -- qs).isEmpty, s"orphaned oracle SQL: ${os -- qs}")
  }

  test("every events-family query analyzes against current testdata") {
    assume(available, s"$dir not present (driver-owned testdata)")
    val all = graft.SparkEntry.queries
    val missing = eventsFamily.filterNot(all.contains)
    assert(missing.isEmpty, s"renamed driver queries? missing: $missing")
    eventsFamily.foreach { name =>
      val df = all(name)(spark, dir) // analysis happens eagerly on construction
      assert(df.schema.fields.nonEmpty, s"$name produced an empty schema")
    }
  }
}
