package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed pins for the one-pass column profiler. */
class ProfilerSpec extends SparkSpec {

  import spark.implicits._

  test("profile: nulls, exact distincts, portable min/max, double opt-out") {
    val df = Seq(
      (1L, Some(2.5), Some("x"), Some("2024-01-03")),
      (2L, None, Some("y"), Some("2024-01-01")),
      (2L, Some(2.5), None, None),
      (3L, Some(7.0), Some("x"), Some("2024-01-02"))
    ).toDF("id", "v", "s", "d")
      .withColumn("d", col("d").cast("date"))
    val got = Profiler.profile(df).collect().map { r =>
      r.getString(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)), Option(r.getString(5))))
    }.toMap
    assert(got("id") == (("bigint", 0L, 3L, Some("1"), Some("3"))))
    assert(got("v") == (("double", 1L, 2L, None, None)))
    assert(got("s") == (("string", 1L, 2L, Some("x"), Some("y"))))
    assert(got("d") ==
      (("date", 1L, 3L, Some("2024-01-01"), Some("2024-01-03"))))
    // one row per column, schema order preserved by inline
    assert(Profiler.profile(df).select("col_name").collect()
      .map(_.getString(0)).toSeq == Seq("id", "v", "s", "d"))
  }

  test("profile: raw-timestamp distincts, decimal/bool/array/map contract") {
    val df = Seq(
      ("2024-01-01 09:00:00", "1.50", true, Seq(1, 2), Map("a" -> 1)),
      ("2024-01-01 17:00:00", "2.25", false, Seq(1, 2), Map("b" -> 2)),
      ("2024-01-02 00:00:00", "1.50", true, Seq(3), Map("a" -> 1))
    ).toDF("t", "dec", "b", "arr", "m")
      .withColumn("t", col("t").cast("timestamp"))
      .withColumn("dec", col("dec").cast("decimal(6,2)"))
    val got = Profiler.profile(df).collect().map { r =>
      r.getString(0) -> ((r.getString(1), r.getLong(2),
        Option(if (r.isNullAt(3)) null else java.lang.Long.valueOf(r.getLong(3))),
        Option(r.getString(4)), Option(r.getString(5))))
    }.toMap
    // two same-day timestamps stay DISTINCT (the raw value counts, not
    // its date); min/max render through the date of the extreme value
    assert(got("t") == (("timestamp", 0L, Some(3L),
      Some("2024-01-01"), Some("2024-01-02"))))
    assert(got("dec") == (("decimal(6,2)", 0L, Some(2L),
      Some("1.50"), Some("2.25"))))
    assert(got("b") == (("boolean", 0L, Some(2L),
      Some("false"), Some("true"))))
    // arrays: counted, not rendered; maps: nulls only, never dropped
    assert(got("arr") == (("array<int>", 0L, Some(2L), None, None)))
    assert(got("m") == (("map<string,int>", 0L, None, None, None)))
    assert(got.size == 5)
  }
}
