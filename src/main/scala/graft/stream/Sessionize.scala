package graft.stream

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Custom stateful streaming operator: inactivity-gap sessionization via
  * `flatMapGroupsWithState` — the state API for semantics windowed
  * aggregation can't express (a session closes when the USER goes quiet,
  * not when a fixed window ends).
  *
  * State per user is one open session (start, last-seen, count) — O(users)
  * not O(events) — and is dropped through event-time timeout once the
  * watermark passes last-seen + gap, so state is bounded at any scale.
  * Emits one row per CLOSED session (append mode).
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp)
  final case class SessionState(start: Long, lastSeen: Long, nEvents: Long)
  /** Exact-mode state: EVERY session not yet provably final, not just
    * the latest open one — bounded by activity within one watermark
    * horizon per user, so still O(users), not O(events). */
  final case class PendingSessions(sessions: Seq[SessionState])
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long)

  /** The per-group merge step, pure for property testing: fold the open
    * session (if any) and the batch's event times into gap-merged
    * intervals; all but the LATEST stay closed, the latest is the new
    * open state. A late cross-batch event can land ANYWHERE relative to
    * the open session — inside the gap below start (extends the session
    * backwards), far below start (a distinct EARLIER session the gap law
    * must keep separate), or bridging an old event cluster into the
    * session — and interval merging over the sorted union is the one
    * rule that matches the batch sessionizer for every arrival order
    * (absorb-if-within-gap-of-lastSeen alone would glue a
    * t << start - gap event onto the session). */
  private[stream] def mergeStep(state: Option[SessionState], times: Seq[Long],
                                gapMillis: Long)
      : (List[SessionState], Option[SessionState]) = {
    val all = mergeIntervals(state.toSeq, times, gapMillis)
    if (all.isEmpty) (Nil, None) else (all.init, Some(all.last))
  }

  /** The gap-merge fold both modes share: sort the union of carried
    * intervals and the batch's point events, glue anything within
    * `gapMillis`, return ALL merged intervals in start order. */
  private[stream] def mergeIntervals(carried: Seq[SessionState],
                                     times: Seq[Long], gapMillis: Long)
      : List[SessionState] = {
    val items = (times.map(t => SessionState(t, t, 1)) ++ carried)
      .sortBy(s => (s.start, s.lastSeen))
    var closed = List.empty[SessionState]
    var cur: SessionState = null
    items.foreach { s =>
      if (cur == null) cur = s
      else if (s.start - cur.lastSeen <= gapMillis)
        cur = SessionState(cur.start, math.max(cur.lastSeen, s.lastSeen),
          cur.nEvents + s.nEvents)
      else {
        closed ::= cur
        cur = s
      }
    }
    (if (cur == null) closed else cur :: closed).reverse
  }

  /** Closed sessions of `events`, append mode.
    *
    * Cross-batch lateness residual (by design of EAGER append-mode
    * emission): closed-session rows are FINAL — mergeStep closes every
    * non-latest interval at the end of its micro-batch, so a late
    * event arriving in a LATER batch within `gapMillis` of an
    * already-emitted closed session starts a new (possibly
    * overlapping) session rather than retracting and extending the
    * emitted one. Batch-equivalence with the one-shot sessionizer
    * therefore holds exactly for late data arriving within the same
    * micro-batch (any arrival ORDER inside a batch is handled — see
    * [[mergeStep]]); across batches the watermark (`gapMillis`)
    * bounds how late an event can land at all. Consumers needing
    * exact batch parity under cross-batch lateness should use
    * [[sessionsExact]], which trades emission latency (one extra
    * watermark advance) for provably-final rows. */
  def sessions(spark: SparkSession, events: Dataset[Event],
               gapMillis: Long): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", s"$gapMillis milliseconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastSeen + gap: the open session is closed
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start),
              new Timestamp(s.lastSeen), s.nEvents))
          } else {
            val (closed, open) = mergeStep(state.getOption,
              batch.map(_.ts.getTime).toSeq, gapMillis)
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSeen + gapMillis)
            }
            closed.iterator.map(s => Session(userId, new Timestamp(s.start),
              new Timestamp(s.lastSeen), s.nEvents))
          }
      }
  }

  /** Exact mode: streamed output equals the batch sessionizer for ALL
    * in-watermark data, cross-batch lateness included. Emission of a
    * merged interval is gated on the event-time watermark — a session
    * leaves state only when `lastSeen + gapMillis < watermark`, at
    * which point no admissible future event (all have `ts >=
    * watermark`) can extend it forward, extend it backward (such an
    * event is after the session's end, not before its start), or
    * bridge it to a kept session (kept sessions start more than the
    * gap after its end, and any bridging event would itself be within
    * the gap of the final session — impossible by the same bound). So
    * every emitted row is provably final and the emitted set is the
    * interval-merge of everything admitted: exactly the batch law.
    *
    * The price vs [[sessions]]: rows emit one watermark advance later,
    * and state carries every not-yet-final session instead of just the
    * open one — still bounded (sessions within one gap horizon per
    * user), and timed out through the same event-time mechanism. */
  def sessionsExact(spark: SparkSession, events: Dataset[Event],
                    gapMillis: Long): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", s"$gapMillis milliseconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[PendingSessions, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event],
         state: GroupState[PendingSessions]) =>
          val w = state.getCurrentWatermarkMs()
          val carried = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          val times =
            if (state.hasTimedOut) Seq.empty[Long]
            else batch.map(_.ts.getTime).toSeq
          val all = mergeIntervals(carried, times, gapMillis)
          val (fin, keep) =
            all.partition(s => s.lastSeen + gapMillis < w)
          if (keep.isEmpty) state.remove()
          else {
            state.update(PendingSessions(keep))
            // earliest deadline re-evaluates first; strictly above the
            // current watermark or Spark rejects the timestamp
            val deadline = keep.map(_.lastSeen + gapMillis).min
            state.setTimeoutTimestamp(math.max(deadline, w + 1))
          }
          fin.iterator.map(s => Session(userId, new Timestamp(s.start),
            new Timestamp(s.lastSeen), s.nEvents))
      }
  }
}
