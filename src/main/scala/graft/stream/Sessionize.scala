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
    val items = (times.map(t => SessionState(t, t, 1)) ++ state)
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
    (closed.reverse, Option(cur))
  }

  /** Closed sessions of `events`, append mode.
    *
    * Cross-batch lateness residual (by design of append-mode emission):
    * closed-session rows are FINAL — mergeStep closes every non-latest
    * interval at the end of its micro-batch, so a late event arriving
    * in a LATER batch within `gapMillis` of an already-emitted closed
    * session starts a new (possibly overlapping) session rather than
    * retracting and extending the emitted one. Batch-equivalence with
    * the one-shot sessionizer therefore holds exactly for late data
    * arriving within the same micro-batch (any arrival ORDER inside a
    * batch is handled — see [[mergeStep]]); across batches the
    * watermark (`gapMillis`) bounds how late an event can land at all.
    * Consumers needing exact batch parity under cross-batch lateness
    * should widen the watermark or re-sessionize the emitted rows
    * offline (the gap-merge law is associative over intervals). */
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
}
