package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered event-sequence (funnel) detection: for each user, the earliest
  * completion of a step chain `steps(0) -> steps(1) -> ... -> steps(k-1)`
  * where each step happens STRICTLY after the previous one and within
  * `maxGap` of it — the product-analytics funnel (Amplitude/Mixpanel
  * semantics) and the bounded flavor of SQL MATCH_RECOGNIZE.
  *
  * Semantics are greedy-earliest, which equals the sequential-min
  * definition (`t_0 = min ts of step 0; t_i = min ts of step i with
  * t_{i-1} < ts <= t_{i-1} + maxGap`): processing a user's events in
  * time order, an event can only ever complete the first incomplete
  * step, and the first qualifying event in time order IS the minimum —
  * so one linear fold per user reproduces the chained mins exactly.
  * That fold is the whole implementation: events are pre-filtered to
  * the funnel's step types, collected per user as a sorted
  * `(ts, step)` array, and folded with `aggregate` — ONE shuffle (the
  * per-user groupBy), no self-joins, no per-step join chain, and the
  * per-user state is bounded by that user's funnel-relevant events, not
  * the corpus. A k-step chained-aggregation lowering would shuffle k
  * times; a window lowering would sort every user's full history.
  *
  * All arithmetic is on `unix_micros` longs (ties broken by a
  * deterministic `(ts, id)` sort; strict `>` between steps), so results
  * are bit-identical across engines — the DuckDB oracle recomputes the
  * chained mins directly.
  */
object EventFunnel {

  /** Per-user funnel completion times.
    *
    * Output: one row per user that completed step 0, with
    * `t_0 .. t_{k-1}` as epoch-microsecond longs (null once the chain
    * breaks) and `steps_reached` (1..k).
    *
    * @param events  event table
    * @param steps   ordered step types (distinct, length >= 1)
    * @param maxGapMicros  max allowed gap between consecutive steps
    * @param user    grouping key column
    * @param ts      event-time column (timestamp)
    * @param typ     event-type column
    * @param id      unique tie-break column (event id)
    */
  def funnel(events: DataFrame, steps: Seq[String], maxGapMicros: Long,
             user: Column = col("user_id"), ts: Column = col("ts"),
             typ: Column = col("event_type"),
             id: Column = col("event_id")): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"steps must be non-empty and distinct: $steps")
    val k = steps.length
    // step index lookup as a literal map: only funnel events survive the
    // scan projection, so the fold state is per-user-activity bounded
    val stepIdx = map(steps.zipWithIndex.flatMap {
      case (s, i) => Seq(lit(s), lit(i))
    }: _*)
    // null ts excluded explicitly: without the filter, a user whose
    // step-0 events ALL have null ts folds to a null t_0 here (dropped
    // by the final filter) while a chained-min replay emits the user
    // with t_0 NULL — same rows on clean data, divergent on dirty
    val relevant = events
      .filter(typ.isInCollection(steps) && ts.isNotNull)
      .select(user.as("user_id"), unix_micros(ts).as("us"), id.as("eid"),
        element_at(stepIdx, typ).as("step"))
    // sorted (us, eid, step) per user; the eid in the sort key makes the
    // fold order deterministic under equal timestamps (strict > between
    // steps means a tie can never advance the chain anyway)
    val perUser = relevant
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("us"), col("eid"),
        col("step")))).as("evs"))
    // fold: state = k slot times (null = incomplete); an event advances
    // the chain iff it is the first incomplete step's type and lands in
    // (prev, prev + maxGap]
    val zero = array((0 until k).map(_ => lit(null).cast("long")): _*)
    val folded = perUser.select(col("user_id"),
      aggregate(col("evs"), zero, (st, e) => {
        val nxt = size(filter(st, t => t.isNotNull)) // first incomplete slot
        val prevOk = when(nxt === 0, lit(true)).otherwise(
          element_at(st, nxt) < e.getField("us") &&
            e.getField("us") <= element_at(st, nxt) + maxGapMicros)
        when(nxt < k && e.getField("step") === nxt && prevOk,
          concat(slice(st, lit(1), nxt),
            array(e.getField("us")),
            slice(st, nxt + 2, lit(k)))).otherwise(st)
      }).as("times"))
    folded
      .select(Seq(col("user_id")) ++
        (0 until k).map(i => element_at(col("times"), i + 1).as(s"t_$i")) :+
        size(filter(col("times"), t => t.isNotNull)).as("steps_reached"): _*)
      .filter(col("t_0").isNotNull)
  }
}
