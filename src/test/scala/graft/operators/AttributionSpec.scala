package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hand-computed pins for last-touch attribution: latest-touch-wins,
  * gap cutoff, unattributed conversions, irrelevant types ignored. */
class AttributionSpec extends SparkSpec {

  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, Long, String)]): DataFrame =
    rows.toDF("event_id", "user_id", "us", "event_type")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("us")).as("ts"), col("event_type"))

  private def run(df: DataFrame, gap: Long = 1000L) =
    Attribution.lastTouch(df, "buy", Seq("click", "view"), gap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[String]),
        Option(r.get(5)).map(_.asInstanceOf[Long]))).toSet

  test("latest touch wins; gap cutoff; no-touch conversion kept null") {
    val df = ev(Seq(
      (1L, 1L, 100L, "view"), (2L, 1L, 300L, "click"), // two touches
      (3L, 1L, 800L, "buy"),                           // -> click@300
      (4L, 1L, 5000L, "buy"),                          // gap > 1000 -> null
      (5L, 2L, 50L, "buy")))                           // no touch at all
    assert(run(df) == Set(
      (1L, 3L, 800L, Some(2L), Some("click"), Some(500L)),
      (1L, 4L, 5000L, None, None, None),
      (2L, 5L, 50L, None, None, None)))
  }

  test("touch AFTER a conversion never credits it; state carries forward") {
    val df = ev(Seq(
      (1L, 1L, 100L, "buy"),                           // before any touch
      (2L, 1L, 200L, "view"),
      (3L, 1L, 300L, "buy"), (4L, 1L, 400L, "buy")))   // both credit view@200
    assert(run(df) == Set(
      (1L, 1L, 100L, None, None, None),
      (1L, 3L, 300L, Some(2L), Some("view"), Some(100L)),
      (1L, 4L, 400L, Some(2L), Some("view"), Some(200L))))
  }

  test("non-funnel types invisible; partitioning invariance") {
    val df = ev(Seq(
      (1L, 1L, 100L, "click"), (2L, 1L, 150L, "error"), // error ignored
      (3L, 1L, 200L, "buy")))
    val got = run(df)
    assert(got == Set((1L, 3L, 200L, Some(1L), Some("click"), Some(100L))))
    assert(run(df.repartition(5)) == got)
  }

  test("boundary: gap exactly at maxGap credits; touch tie on (us, eid)") {
    val df = ev(Seq(
      (1L, 1L, 0L, "view"),
      (2L, 1L, 1000L, "buy"),               // gap == maxGap -> credited
      // same us: touch id 3 sorts before conversion id 4 -> credited
      (3L, 1L, 2000L, "click"), (4L, 1L, 2000L, "buy")))
    assert(run(df) == Set(
      (1L, 2L, 1000L, Some(1L), Some("view"), Some(1000L)),
      (1L, 4L, 2000L, Some(3L), Some("click"), Some(0L))))
  }
}
