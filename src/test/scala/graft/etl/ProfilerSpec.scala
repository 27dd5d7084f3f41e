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
}
