package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hand-computed pins for the SCD2 run collapse: run boundaries, abutting
  * half-open intervals, tie order under equal timestamps, null hygiene. */
class ChangeHistorySpec extends SparkSpec {

  import spark.implicits._

  private def log(rows: Seq[(Long, Long, Long, String)]): DataFrame =
    rows.toDF("event_id", "user_id", "us", "v")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("us")).as("ts"), col("v").as("event_type"))

  private def collect(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
      r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
      r.getLong(5))).toSet

  test("runs collapse; valid_to abuts next valid_from; last run open") {
    val df = log(Seq(
      (1L, 1L, 100L, "a"), (2L, 1L, 200L, "a"), // run 1: a x2 [100, 300)
      (3L, 1L, 300L, "b"),                      // run 2: b    [300, 450)
      (4L, 1L, 450L, "a"),                      // run 3: a    [450, null)
      (5L, 2L, 10L, "x")))                      // user 2: one open run
    val got = collect(ChangeHistory.scd2(df))
    assert(got == Set(
      (1L, 1, "a", 100L, Some(300L), 2L),
      (1L, 2, "b", 300L, Some(450L), 1L),
      (1L, 3, "a", 450L, None, 1L),
      (2L, 1, "x", 10L, None, 1L)))
  }

  test("equal timestamps fold in event-id order") {
    // same us for ids 2/3: id order makes the stream a, b, a -> 3 runs;
    // if ties were unordered this could collapse to 2
    val df = log(Seq(
      (1L, 1L, 100L, "a"), (3L, 1L, 200L, "a"), (2L, 1L, 200L, "b")))
    val got = collect(ChangeHistory.scd2(df))
    assert(got == Set(
      (1L, 1, "a", 100L, Some(200L), 1L),
      (1L, 2, "b", 200L, Some(200L), 1L),
      (1L, 3, "a", 200L, None, 1L)))
  }

  test("null ts / null value excluded; partitioning never changes runs") {
    val base = Seq(
      (1L, 1L, 100L, "a"), (2L, 1L, 200L, "b"), (3L, 1L, 300L, "b"))
    val withNulls = log(base)
      .unionByName(Seq((9L, 1L)).toDF("event_id", "user_id")
        .select(col("event_id"), col("user_id"),
          lit(null).cast("timestamp").as("ts"),
          lit(null).cast("string").as("event_type")))
    val got = collect(ChangeHistory.scd2(withNulls))
    assert(got == Set(
      (1L, 1, "a", 100L, Some(200L), 1L),
      (1L, 2, "b", 200L, None, 2L)))
    assert(collect(ChangeHistory.scd2(log(base).repartition(7))) == got)
  }
}
