package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hand-computed pins for the event-analytics lowerings: retention
  * offsets, transition order under ties, rolling-distinct windows. */
class EventAnalyticsSpec extends SparkSpec {

  import spark.implicits._

  // day(n) = 2024-01-(n+1) 12:00 + sec
  private def ev(rows: Seq[(Long, Long, Int, Long, String)]): DataFrame =
    rows.toDF("event_id", "user_id", "day", "sec", "event_type")
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(lit(1704067200L) + col("day") * 86400 +
          lit(43200) + col("sec")).as("ts"),
        col("event_type"))

  test("cohort retention: first-seen cohort, distinct day offsets") {
    val df = ev(Seq(
      // user 1: first on day 0; active day 0 (twice) and day 2
      (1L, 1L, 0, 0L, "a"), (2L, 1L, 0, 5L, "b"), (3L, 1L, 2, 0L, "a"),
      // user 2: first on day 0; active day 0 only
      (4L, 2L, 0, 0L, "a"),
      // user 3: first on day 2; active days 2 and 3
      (5L, 3L, 2, 0L, "a"), (6L, 3L, 3, 0L, "a")))
    val got = EventAnalytics.cohortRetention(df)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
      .toSet
    assert(got == Set(
      ("2024-01-01", 0, 2L), ("2024-01-01", 2, 1L),
      ("2024-01-03", 0, 1L), ("2024-01-03", 1, 1L)))
  }

  test("transitions: (ts, id) order, tie-deterministic, singletons drop") {
    val df = ev(Seq(
      // user 1: a -> b -> b (same ts for 2/3: event_id breaks the tie)
      (1L, 1L, 0, 1L, "a"), (2L, 1L, 0, 2L, "b"), (3L, 1L, 0, 2L, "b"),
      // user 2: b -> a
      (4L, 2L, 0, 1L, "b"), (5L, 2L, 0, 9L, "a"),
      // user 3: single event -> no transitions
      (6L, 3L, 0, 0L, "a")))
    val got = EventAnalytics.transitionCounts(df)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == Set(("a", "b", 1L), ("b", "b", 1L), ("b", "a", 1L)))
    // tie order flips with the ids: 3 before 2 makes b->b still 1 but
    // a->b becomes a->b via id 3 — the SET is id-order sensitive only
    // through determinism, so a repartition never changes it
    assert(EventAnalytics.transitionCounts(df.repartition(5))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet == got)
  }

  test("densify: zero rows for silent days, full span x group grid") {
    val df = ev(Seq(
      (1L, 1L, 0, 0L, "a"), (2L, 1L, 0, 5L, "a"), // a: 2 on day 0
      (3L, 1L, 3, 0L, "a"),                       // a: 1 on day 3
      (4L, 2L, 1, 0L, "b")))                      // b: 1 on day 1 only
    val got = EventAnalytics.densifyDaily(df)
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2))).toSet
    // span is day 0..3 from the data; every (group, day) cell present
    assert(got == Set(
      ("a", "2024-01-01", 2L), ("a", "2024-01-02", 0L),
      ("a", "2024-01-03", 0L), ("a", "2024-01-04", 1L),
      ("b", "2024-01-01", 0L), ("b", "2024-01-02", 1L),
      ("b", "2024-01-03", 0L), ("b", "2024-01-04", 0L)))
  }

  test("life table: conversion day, horizon censoring, reverse at_risk") {
    val df = ev(Seq(
      // u1: signup day 0, purchase day 2 -> converts on day 2
      (1L, 1L, 0, 0L, "s"), (2L, 1L, 2, 0L, "p"),
      // u2: signup day 0, never purchases -> censored at the horizon
      (3L, 2L, 0, 0L, "s"),
      // u3: a non-funnel event sets the horizon (day 3, +10s)
      (4L, 3L, 3, 10L, "x"),
      // u4: purchase only -> never at risk, excluded
      (5L, 4L, 1, 0L, "p"),
      // u5: purchase BEFORE signup ignored; converts day 0 (86395s later)
      (6L, 5L, 0, 0L, "p"), (7L, 5L, 0, 5L, "s"), (8L, 5L, 1, 0L, "p")))
    val got = EventAnalytics.conversionLifeTable(df, "s", "p",
        maxGapMicros = 100L * 86400000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // u2's censor day: horizon (day 3 + 10s) minus signup (day 0) = day 3
    assert(got == Set((0L, 3L, 1L, 0L), (2L, 2L, 1L, 0L),
      (3L, 1L, 0L, 1L)))
  }

  test("mix drift: exact TVD numerator, absent cells contribute") {
    val df = ev(Seq(
      // day 0: a=3, b=1, c=1 (n=5); day 1: a=1, b=1, c ABSENT (n=2)
      (1L, 1L, 0, 0L, "a"), (2L, 1L, 0, 1L, "a"), (3L, 1L, 0, 2L, "a"),
      (4L, 1L, 0, 3L, "b"), (5L, 1L, 0, 4L, "c"),
      (6L, 1L, 1, 0L, "a"), (7L, 1L, 1, 1L, "b")))
    // C = (a:4, b:2, c:1), N = 7
    // day 0: |3*7-4*5| + |1*7-2*5| + |1*7-1*5| = 1 + 3 + 2 = 6
    // day 1: |1*7-4*2| + |1*7-2*2| + |0*7-1*2| = 1 + 3 + 2 = 6
    val got = EventAnalytics.mixDrift(df)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2))).toSet
    assert(got == Set(("2024-01-01", 5L, 6L), ("2024-01-02", 2L, 6L)))
  }

  test("rolling active users: trailing window, present days only") {
    val df = ev(Seq(
      (1L, 1L, 0, 0L, "a"),                       // u1 on day 0
      (2L, 2L, 0, 0L, "a"), (3L, 2L, 1, 0L, "a"), // u2 on days 0,1
      (4L, 3L, 3, 0L, "a")))                      // u3 on day 3
    val got = EventAnalytics.rollingActiveUsers(df, windowDays = 2)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSet
    // day 0: u1,u2; day 1: u1,u2 (both within 2-day window); day 2 has
    // no events -> absent; day 3: u3 only
    assert(got == Set(
      ("2024-01-01", 2L), ("2024-01-02", 2L), ("2024-01-04", 1L)))
  }
}
