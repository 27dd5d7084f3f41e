package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.etl.Warehouse

/** Deployable exact-sessionization sink: events land as JSON-lines
  * (user_id, ts) files; [[Sessionize.sessionsExact]] closes sessions
  * under the batch law (streamed output == one-shot sessionization for
  * ALL in-watermark data, cross-batch lateness included — the finality
  * proof on `sessionsExact`), and each micro-batch of closed-session
  * rows commits to the warehouse through the shared effectively-once
  * frame. Before this sink existed, exact sessions were an operator the
  * caller had to assemble (choose the output mode, pick a sink, reason
  * about replays); now they are a table.
  *
  * Effectively-once, two independent layers (the corpus-dedup
  * discipline):
  *
  *  - [[StreamCommits.effectivelyOnce]]: one warehouse transaction per
  *    micro-batch, whole-batch replays short-circuit on the high-water
  *    record;
  *  - every emitted row is provably FINAL and `(user_id,
  *    session_start)` identifies a session uniquely (finalized
  *    intervals of one user are disjoint), so the keyed
  *    [[Warehouse.appendIfAbsent]] heals any partial redelivery
  *    row-by-row even without the commit record.
  *
  * At scale: state is the not-yet-final sessions per user (bounded by
  * one watermark horizon — see `sessionsExact`), the sink write is the
  * batch's closed sessions only, and the append's anti-join reads just
  * the key columns of the sessions table. */
final class StreamingSessionize(spark: SparkSession, wh: Warehouse,
                                landingDir: String, checkpointDir: String,
                                gapMillis: Long,
                                table: String = "sessions") {

  val sessionSchema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("session_start", TimestampType),
    StructField("session_end", TimestampType),
    StructField("n_events", LongType)))

  def start(availableNow: Boolean = false): StreamingQuery = {
    import spark.implicits._
    val events = spark.readStream.schema("user_id LONG, ts TIMESTAMP")
      .json(landingDir)
      // corrupt JSON lines surface as null rows from the file source —
      // skip them before the typed boundary (a null user_id cannot
      // decode into a primitive Long), don't poison the stream
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .as[Sessionize.Event]
    val writer = Sessionize.sessionsExact(spark, events, gapMillis)
      .toDF()
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  private[stream] def processBatch(batch: DataFrame, batchId: Long): Unit =
    StreamCommits.effectivelyOnce(spark, wh, checkpointDir, batchId, batch) {
      b =>
        // one session per (user_id, session_start) within a batch by the
        // disjoint-intervals law, so no within-batch dedup is needed
        wh.appendIfAbsent(table, sessionSchema,
          b.select(col("user_id"), col("session_start"),
            col("session_end"), col("n_events")),
          keys = Seq("user_id", "session_start"), orderCol = "user_id",
          dedupWithinBatch = false)
    }
}
