package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream analytics over (user, ts, type) logs: cohort retention,
  * type-transition counts, rolling distinct actives. Each is a
  * shuffle-minimal lowering — per-user set/array state bounded by that
  * user's activity, never a corpus-wide window — and all-integer (dates
  * and counts), so every result is engine-portable and
  * DuckDB-oracle-able bit-for-bit.
  *
  * Null hygiene: rows with a null timestamp (and, for transitions, a
  * null type) are excluded up front. SQL replays of these ops (the
  * oracles) drop nulls through `min`/`lag`-skipping/`WHERE` in ways
  * Spark's `collect_set`/`sort_array` do not mirror — filtering at the
  * scan makes both engines see the same stream.
  */
object EventAnalytics {

  /** The shared per-user active-day state: ONE shuffle (mergeable
    * `collect_set` union, duplicate days collapse map-side before
    * anything moves). Both date-grained ops below start here. */
  private def perUserDays(events: DataFrame, user: Column,
                          ts: Column): DataFrame =
    events.filter(ts.isNotNull)
      .select(user.as("user_id"), to_date(ts).as("d"))
      .groupBy("user_id").agg(collect_set(col("d")).as("days"))

  /** Cohort retention matrix: users bucketed by the DATE of their first
    * event (the cohort), counted once per `(cohort, day-offset)` they
    * were active on. The classic product-analytics retention triangle.
    *
    * Plan shape: [[perUserDays]] is the only real shuffle; cohort (the
    * set min) and offsets derive per row with array algebra, and the
    * final rollup is metadata-sized (cohorts x offsets). A
    * distinct-then-join lowering would exchange the activity table
    * three times on different keys; this never re-shuffles it at all.
    * Nothing here is a window.
    */
  def cohortRetention(events: DataFrame, user: Column = col("user_id"),
                      ts: Column = col("ts")): DataFrame =
    perUserDays(events, user, ts)
      .select(array_min(col("days")).as("cohort"), explode(col("days")).as("d"))
      .groupBy(col("cohort"), datediff(col("d"), col("cohort")).as("day_offset"))
      .agg(count(lit(1)).as("users"))

  /** First-order transition counts between consecutive event types per
    * user (the empirical Markov chain of the event stream): how often
    * type A is immediately followed by type B in some user's timeline.
    *
    * Per-user event order is (ts, id) — deterministic under equal
    * timestamps. One shuffle (the per-user groupBy); consecutive pairs
    * form in a narrow zip projection over each user's sorted array, so
    * no self-join and no corpus-wide window. State is bounded by
    * per-user activity, like [[EventFunnel]].
    */
  def transitionCounts(events: DataFrame, user: Column = col("user_id"),
                       ts: Column = col("ts"), typ: Column = col("event_type"),
                       id: Column = col("event_id")): DataFrame = {
    val perUser = events
      .filter(ts.isNotNull && typ.isNotNull)
      .select(user.as("user_id"), unix_micros(ts).as("us"), id.as("eid"),
        typ.as("t"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("us"), col("eid"), col("t"))))
        .as("evs"))
      .select(transform(col("evs"), e => e.getField("t")).as("types"))
    perUser
      .select(explode(zip_with(
        slice(col("types"), lit(1), size(col("types")) - 1),
        slice(col("types"), lit(2), size(col("types")) - 1),
        (a, b) => struct(a.as("from_type"), b.as("to_type")))).as("tr"))
      .groupBy(col("tr.from_type").as("from_type"),
        col("tr.to_type").as("to_type"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Gap-filled (densified) daily series: per-group event counts with
    * an explicit ZERO row for every calendar day the group was silent,
    * over the table's full [min, max] date span — downstream
    * time-series consumers (moving averages, trend fits, charting)
    * need the dense grid, and an outer join against a generated
    * calendar is the standard lowering.
    *
    * Scale shape: the sparse per-(group, day) counts are one
    * partial-aggregated shuffle; the calendar is `sequence`-generated
    * from a 1-row global span aggregate and cross-joined with the
    * DISTINCT group list — both metadata-sized (days x groups), so the
    * dense grid is built entirely from broadcast-scale frames and the
    * fact table is never re-read or re-shuffled for it. */
  def densifyDaily(events: DataFrame, group: Column = col("event_type"),
                   ts: Column = col("ts")): DataFrame = {
    val sparse = events.filter(ts.isNotNull && group.isNotNull)
      .groupBy(group.as("g"), to_date(ts).as("d"))
      .agg(count(lit(1)).as("cnt"))
    val span = sparse.agg(min("d").as("d0"), max("d").as("d1"))
    val calendar = span
      .select(explode(sequence(col("d0"), col("d1"))).as("d"))
    val groups = sparse.select(col("g")).distinct()
    broadcast(calendar).crossJoin(broadcast(groups))
      .join(sparse, Seq("g", "d"), "left")
      .select(col("g"), col("d"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Rolling `windowDays`-day distinct active users, reported for every
    * date that has at least one event: for date d, the number of
    * distinct users with an event in `[d - windowDays + 1, d]` (the
    * rolling WAU/MAU curve).
    *
    * Lowering: a rolling-DISTINCT frame can't partial-aggregate as a
    * window (every frame re-scans `windowDays` of global history in
    * one task), so each user's day set from [[perUserDays]] expands
    * with array algebra to the distinct report dates that user serves
    * (`flatten` the per-day windows, `array_distinct` so a user counts
    * ONCE per report date), and one plain count per date finishes it.
    * The report-date set (dates with >= 1 event — a calendar, tiny by
    * nature) aggregates straight off the scan projection and
    * broadcast-joins at the end. */
  def rollingActiveUsers(events: DataFrame, windowDays: Int,
                         user: Column = col("user_id"),
                         ts: Column = col("ts")): DataFrame = {
    require(windowDays > 0, s"windowDays=$windowDays")
    val contrib = perUserDays(events, user, ts)
      .select(explode(array_distinct(flatten(transform(
        col("days"),
        d => sequence(d, date_add(d, windowDays - 1)))))).as("report_d"))
    val presentDays = events.filter(ts.isNotNull)
      .select(to_date(ts).as("report_d")).distinct()
    contrib.join(broadcast(presentDays), "report_d")
      .groupBy("report_d")
      .agg(count(lit(1)).as("active_users"))
  }
}
