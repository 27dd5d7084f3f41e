package graft.stream

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming event funnel: the stateful mirror of
  * [[graft.operators.EventFunnel]] — per-user step-chain state updated
  * across micro-batches with `flatMapGroupsWithState`, one COMPLETION
  * row emitted the moment a user finishes the last step (append mode).
  *
  * State per user is the completed-prefix times (at most k longs —
  * O(users), never O(events)); each micro-batch folds its events in
  * (ts, event_id) order with the exact greedy rule of the batch
  * operator: an event advances the chain iff it is the first
  * incomplete step's type and lands in `(prev, prev + gap]`. When
  * per-user event-time order is preserved across batch boundaries (the
  * usual log-ingestion contract), the streamed completions EQUAL the
  * batch funnel's completed rows — pinned in `StreamingPipelineSpec`.
  * A user who completes stays in state as a tombstone so replayed or
  * late events can never emit a duplicate completion.
  */
object StreamingFunnel {

  final case class FEvent(user_id: Long, ts: Timestamp, event_id: Long,
                          event_type: String)
  /** times = completed prefix (times(i) = step i's epoch micros);
    * emitted = completion row already produced (dedup tombstone). */
  final case class FunnelState(times: List[Long], emitted: Boolean)
  final case class Completion(user_id: Long, step_times: Seq[Long])

  def completions(spark: SparkSession, events: Dataset[FEvent],
                  steps: Seq[String], maxGapMicros: Long): Dataset[Completion] = {
    import spark.implicits._
    require(steps.nonEmpty && steps.distinct == steps,
      s"steps must be non-empty and distinct: $steps")
    val k = steps.length
    val stepIdx = steps.zipWithIndex.toMap
    events
      .filter(e => e.ts != null && stepIdx.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Completion](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[FEvent], state: GroupState[FunnelState]) =>
          val st = state.getOption.getOrElse(FunnelState(Nil, emitted = false))
          if (st.emitted) Iterator.empty
          else {
            // same fold as the batch operator: (us, eid) order, greedy
            var times = st.times
            // full microsecond precision, matching unix_micros (getTime
            // truncates nanos to millis; getNanos carries the rest)
            val evs = batch.map { e =>
              val us = e.ts.getTime / 1000 * 1000000L + e.ts.getNanos / 1000
              (us, e.event_id, stepIdx(e.event_type))
            }.toArray.sortBy(t => (t._1, t._2))
            evs.foreach { case (us, _, step) =>
              val nxt = times.length
              if (nxt < k && step == nxt &&
                  (nxt == 0 ||
                    (us > times.last && us <= times.last + maxGapMicros)))
                times = times :+ us
            }
            if (times.length == k) {
              state.update(FunnelState(times, emitted = true))
              Iterator.single(Completion(userId, times))
            } else {
              if (times != st.times) state.update(FunnelState(times, false))
              Iterator.empty
            }
          }
      }
  }
}
