package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Behavior pins for the time-series/interval join operators. */
class JoinOpsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asof backward: greatest right time <= left time per key; >= at equal ts") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:10"), "t2"),
      (2L, ts("2024-01-01 09:59:00"), "t3"),  // before any quote for key 2
      (3L, ts("2024-01-01 10:00:00"), "t4")   // key with no quotes at all
    ).toDF("sym", "t", "trade_id")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:05"), 101.0), // equal ts as t1 -> matches (>=)
      (1L, ts("2024-01-01 10:00:09"), 102.0),
      (2L, ts("2024-01-01 10:30:00"), 200.0)  // after t3 -> no match
    ).toDF("q_sym", "q_t", "px")

    val out = AsofJoin.backward(trades, quotes,
        leftKey = "sym", rightKey = "q_sym", leftTime = "t", rightTime = "q_t",
        payload = Seq("px"))
      .collect().map(r => r.getAs[String]("trade_id") ->
        Option(r.getAs[Any]("px"))).toMap

    assert(out("t1") == Some(101.0))  // equal timestamp wins over earlier
    assert(out("t2") == Some(102.0))  // most recent preceding, not first
    assert(out("t3") == None)         // nothing at-or-before
    assert(out("t4") == None)         // key absent from right side
    assert(out.size == 4)             // left join: every left row kept once
  }

  test("asof backward: left columns pass through unchanged") {
    val left = Seq((1L, ts("2024-01-01 00:00:01"), "a", 7)).toDF("k", "t", "s", "n")
    val right = Seq((1L, ts("2024-01-01 00:00:00"), 5.5)).toDF("k2", "t2", "v")
    val row = AsofJoin.backward(left, right, "k", "k2", "t", "t2", Seq("v"))
      .collect().head
    assert(row.getAs[String]("s") == "a" && row.getAs[Int]("n") == 7 &&
      row.getAs[Double]("v") == 5.5)
  }

  test("native AsofJoinExec matches the union+window lowering on random data") {
    import graft.plans.AsofJoinPlan
    val rnd = new scala.util.Random(42)
    val left = Seq.tabulate(400)(i =>
        (rnd.nextInt(12).toLong, ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), i.toLong))
      .toDF("k", "t", "lid")
    val right = Seq.tabulate(150)(i =>
        (rnd.nextInt(15).toLong, ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:30"), i * 1.5))
      .toDF("rk", "rt", "px")
      // (key, time) must be unique on the right for determinism
      .groupBy("rk", "rt").agg(org.apache.spark.sql.functions.max("px").as("px"))

    val native = AsofJoinPlan.backward(spark, left, right, "k", "rk", "t", "rt")
      .select(col("lid"), col("px"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val lowered = AsofJoin.backward(left, right.select(col("rk"), col("rt"), col("px")),
        "k", "rk", "t", "rt", payload = Seq("px"))
      .select(col("lid"), col("px"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(native.size == 400 && native == lowered)
  }

  test("native AsofJoinExec: >= at equal ts, null on no-match, plan shape") {
    import graft.plans.AsofJoinPlan
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (2L, ts("2024-01-01 09:00:00"), "t2")).toDF("sym", "t", "trade_id")
    val quotes = Seq((1L, ts("2024-01-01 10:00:05"), 101.0)).toDF("qs", "qt", "px")
    val out = AsofJoinPlan.backward(spark, trades, quotes, "sym", "qs", "t", "qt")
    // physical nodes print without the Exec suffix
    assert(out.queryExecution.executedPlan.toString.contains("AsofJoin"))
    val rows = out.collect().map(r => r.getAs[String]("trade_id") ->
      Option(r.getAs[Any]("px"))).toMap
    assert(rows("t1") == Some(101.0))   // equal timestamp matches (>=)
    assert(rows("t2") == None)          // key with no right rows -> nulls
  }

  test("native AsofJoinExec: null keys and times never match and never crash") {
    import graft.plans.AsofJoinPlan
    val left = Seq(
      (Option(1L), Option(ts("2024-01-01 10:00:05")), "ok"),
      (None: Option[Long], Option(ts("2024-01-01 10:00:05")), "nullkey"),
      (Option(1L), None: Option[Timestamp], "nulltime"),
      (None: Option[Long], None: Option[Timestamp], "nullboth")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (Option(1L), Option(ts("2024-01-01 10:00:00")), 100.0),
      (None: Option[Long], Option(ts("2024-01-01 09:00:00")), 666.0), // null key: never matches
      (Option(1L), None: Option[Timestamp], 777.0)                    // null time: never matches
    ).toDF("rk", "rt", "px")
    val out = AsofJoinPlan.backward(spark, left, right, "k", "rk", "t", "rt")
    assert(out.queryExecution.executedPlan.toString.contains("AsofJoin"))
    val m = out.collect().map(r => r.getAs[String]("tag") ->
      Option(r.getAs[Any]("px"))).toMap
    assert(m.size == 4)                 // every left row survives exactly once
    assert(m("ok") == Some(100.0))      // skips the null-time right row
    assert(m("nullkey") == None && m("nulltime") == None && m("nullboth") == None)
  }

  test("fallback as-of attaches all payload fields from ONE right row (nulls included)") {
    // the latest right row has a NULL px; per-column last(ignoreNulls)
    // would resurrect the older row's px while taking the newer qty —
    // stitching fields from two different right rows. The struct carry
    // must deliver the latest ROW: px null, qty 7.
    val left = Seq((1L, ts("2024-01-01 10:00:10"), "t1")).toDF("k", "t", "tid")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option(100.0), Option(5L)),
      (1L, ts("2024-01-01 10:00:05"), None: Option[Double], Option(7L))
    ).toDF("rk", "rt", "px", "qty")
    val row = AsofJoin.backward(left, right, "k", "rk", "t", "rt",
      Seq("px", "qty")).collect().head
    assert(row.isNullAt(row.fieldIndex("px")),
      "px must come from the latest right row (which has px = null)")
    assert(row.getAs[Long]("qty") == 7L)
  }

  test("native == fallback on data with null keys, times, and payloads") {
    import graft.plans.AsofJoinPlan
    val rnd = new scala.util.Random(7)
    def mayb[T](v: T): Option[T] = if (rnd.nextInt(10) == 0) None else Some(v)
    val left = Seq.tabulate(300)(i => (mayb(rnd.nextInt(10).toLong),
        mayb(ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")), i.toLong))
      .toDF("k", "t", "lid")
    val right = Seq.tabulate(120)(i => (mayb(rnd.nextInt(12).toLong),
        mayb(ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:30")),
        mayb(i * 1.5)))
      .toDF("rk", "rt", "px")
      .groupBy("rk", "rt").agg(max("px").as("px")) // (key,time) unique on right
    val native = AsofJoinPlan.backward(spark, left, right, "k", "rk", "t", "rt")
      .select(col("lid"), col("px"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val lowered = AsofJoin.backward(left,
        right.select(col("rk"), col("rt"), col("px")),
        "k", "rk", "t", "rt", payload = Seq("px"))
      .select(col("lid"), col("px"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(native.size == 300 && native == lowered)
  }

  test("as-of join rejects mismatched key/time types at construction") {
    import graft.plans.AsofJoinPlan
    val left = Seq((1, ts("2024-01-01 00:00:01"), "a")).toDF("k", "t", "s") // Int key
    val right = Seq((1L, ts("2024-01-01 00:00:00"), 5.5)).toDF("rk", "rt", "v") // Long key
    intercept[IllegalArgumentException] {
      AsofJoinPlan.backward(spark, left, right, "k", "rk", "t", "rt")
    }
    val right2 = Seq((1, 42L, 5.5)).toDF("rk", "rt", "v") // Long time vs Timestamp
    intercept[IllegalArgumentException] {
      AsofJoinPlan.backward(spark, left, right2, "k", "rk", "t", "rt")
    }
  }

  test("range binned equals naive, including interval and bin boundaries") {
    val points = Seq(0.0, 49.999, 50.0, 74.9, 75.0, 100.0, 149.9, 150.0, 250.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val ivals = Seq(
      ("a", 0.0, 50.0),     // hi exactly on a bin boundary
      ("b", 50.0, 150.0),   // spans multiple bins
      ("c", 75.0, 80.0),    // interior of one bin
      ("d", 140.0, 160.0))  // overlapping b
      .toDF("name", "lo", "hi")

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
      df.select(col("id"), col("name")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet

    val naive = pairs(RangeJoin.naive(points, col("v"), ivals, col("lo"), col("hi")))
    val binned = pairs(RangeJoin.binned(points, col("v"), ivals, col("lo"), col("hi"),
      binWidth = 50.0))
    assert(binned == naive)
    assert(naive.contains((0L, "a")) && !naive.contains((2L, "a"))) // [lo, hi)
    assert(naive.contains((4L, "c")) && naive.contains((4L, "b"))) // overlaps
  }
}
