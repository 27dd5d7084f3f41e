package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the funnel's greedy-earliest == chained-sequential-min semantics:
  * strict ordering between steps, gap windows, ties, out-of-order noise,
  * and partitioning invariance. */
class EventFunnelSpec extends SparkSpec {

  import spark.implicits._

  // (event_id, user, ts-second, type); ts = 2024-01-01T00:00:SS + MM:00
  private def ev(rows: Seq[(Long, Long, Long, String)]): DataFrame =
    rows.toDF("event_id", "user_id", "sec", "event_type")
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(lit(1704067200L) + col("sec")).as("ts"),
        col("event_type"))

  private def run(df: DataFrame, gapSec: Long): Map[Long, (Option[Long],
      Option[Long], Option[Long], Int)] =
    EventFunnel.funnel(df, Seq("signup", "click", "purchase"),
        maxGapMicros = gapSec * 1000000L)
      .collect().map { r =>
        def t(i: Int) = if (r.isNullAt(i)) None
          else Some((r.getLong(i) - 1704067200000000L) / 1000000L)
        r.getLong(0) -> (t(1), t(2), t(3), r.getInt(4))
      }.toMap

  private val base = Seq(
    // user 1: clean completion 10 -> 20 -> 30
    (1L, 1L, 10L, "signup"), (2L, 1L, 20L, "click"), (3L, 1L, 30L, "purchase"),
    // user 2: click outside the 60 s gap -> chain breaks at step 1
    (4L, 2L, 10L, "signup"), (5L, 2L, 100L, "click"), (6L, 2L, 110L, "purchase"),
    // user 3: no signup at all -> absent from the result
    (7L, 3L, 10L, "click"), (8L, 3L, 20L, "purchase"),
    // user 4: click BEFORE its signup is noise; the later click counts,
    // and the earliest signup (not the first event) anchors the chain
    (9L, 4L, 5L, "click"), (10L, 4L, 10L, "signup"), (11L, 4L, 40L, "click"),
    // user 5: purchase between signup and click can't skip the order;
    // the purchase AFTER the click completes it
    (12L, 5L, 10L, "signup"), (13L, 5L, 15L, "purchase"),
    (14L, 5L, 20L, "click"), (15L, 5L, 25L, "purchase"),
    // user 6: click at EXACTLY the signup time is not strictly after;
    // click at exactly prev + gap is inside the closed upper bound
    (16L, 6L, 10L, "signup"), (17L, 6L, 10L, "click"), (18L, 6L, 70L, "click"),
    // user 7: two signups; the chain anchors on the EARLIEST even though
    // only the later one has a click in range (greedy == chained mins)
    (19L, 7L, 10L, "signup"), (20L, 7L, 200L, "signup"), (21L, 7L, 210L, "click")
  )

  test("funnel: chained mins, gap break, strict order, ties, noise") {
    val got = run(ev(base), gapSec = 60)
    assert(got == Map(
      1L -> (Some(10L), Some(20L), Some(30L), 3),
      2L -> (Some(10L), None, None, 1),
      4L -> (Some(10L), Some(40L), None, 2),
      5L -> (Some(10L), Some(20L), Some(25L), 3),
      6L -> (Some(10L), Some(70L), None, 2),
      7L -> (Some(10L), None, None, 1)))
  }

  test("funnel: unlimited-gap single-step and partitioning invariance") {
    val df = ev(base)
    val wide = run(df, gapSec = 1000000L)
    // with a huge gap user 2 completes and user 7's late click counts
    assert(wide(2L) == (Some(10L), Some(100L), Some(110L), 3))
    assert(wide(7L) == (Some(10L), Some(210L), None, 2))
    assert(run(df.repartition(7), 60) == run(df, 60))
    // one-step funnel: every user with the step, at its min time
    val one = EventFunnel.funnel(df, Seq("purchase"), 1000000L)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(one == Map(1L -> 1, 2L -> 1, 3L -> 1, 5L -> 1))
  }
}
