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
            val times = batch.map(_.ts.getTime).toArray.sorted
            var closed = List.empty[Session]
            var cur = state.getOption
            times.foreach { t =>
              cur match {
                case Some(s) if t - s.lastSeen <= gapMillis =>
                  // a late cross-batch event inside the gap can PREDATE
                  // the open session's start (the watermark, held by
                  // other users, still admits it): the session absorbs
                  // it, so its start must extend backwards too — or the
                  // emitted boundary is wrong by up to the gap
                  cur = Some(s.copy(start = math.min(s.start, t),
                    lastSeen = math.max(s.lastSeen, t),
                    nEvents = s.nEvents + 1))
                case Some(s) => // gap exceeded within the data itself
                  closed ::= Session(userId, new Timestamp(s.start),
                    new Timestamp(s.lastSeen), s.nEvents)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSeen + gapMillis)
            }
            closed.reverseIterator
          }
      }
  }
}
