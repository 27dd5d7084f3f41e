package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, max}
import org.apache.spark.sql.types._
import graft.etl.Warehouse

/** Per-stream high-water commit records — the Delta `txnAppId`/`txnVersion`
  * pattern shared by every streaming sink in this engine. The stream id is
  * its checkpoint location PLUS an identity marker created inside the
  * checkpoint directory: within one checkpoint batch ids are strictly
  * monotonic, so ONE max per stream is a complete replay record and the
  * table stays one tiny row per stream. Identity-by-path alone is not
  * enough — a wiped-and-recreated checkpoint restarts batch numbering at
  * 0, and the OLD high-water mark would silently no-op the new
  * incarnation's first N batches (data loss wearing a replay guard's
  * clothes). The marker file gives every checkpoint incarnation a fresh
  * uuid, so a recreated checkpoint is a NEW stream; replays of the old
  * incarnation's data heal through the sinks' keyed appends.
  * The merge-upsert runs under the table's writer lock, so streams
  * sharing a warehouse never clobber each other's mark. */
private[stream] object StreamCommits {

  val schema: StructType = StructType(Seq(
    StructField("stream_id", StringType), StructField("batch_id", LongType)))

  /** checkpoint path + the incarnation uuid persisted INSIDE it. */
  private def streamId(checkpointDir: String): String = {
    val p = java.nio.file.Paths.get(checkpointDir)
    java.nio.file.Files.createDirectories(p)
    val marker = p.resolve("_graft_stream_identity")
    if (!java.nio.file.Files.exists(marker))
      try java.nio.file.Files.write(marker,
        java.util.UUID.randomUUID().toString.getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE_NEW)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    checkpointDir + "#" +
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8").trim
  }

  def alreadyCommitted(wh: Warehouse, checkpointDir: String,
                       batchId: Long): Boolean = {
    val id = streamId(checkpointDir)
    wh.exists("_stream_commits") &&
      !wh.read("_stream_commits", schema)
        .filter(col("stream_id") === id && col("batch_id") >= batchId)
        .isEmpty
  }

  def record(spark: SparkSession, wh: Warehouse,
             checkpointDir: String, batchId: Long): Unit =
    wh.mergeReplace("_stream_commits", schema,
      spark.range(1).select(lit(streamId(checkpointDir)).as("stream_id"),
        lit(batchId).as("batch_id")),
      (old, incoming) => old.unionByName(incoming)
        .groupBy("stream_id").agg(max("batch_id").as("batch_id")))

  /** The effectively-once micro-batch frame every streaming sink in this
    * package shares: ONE warehouse transaction wrapping the replay
    * guard, the batch body (skipped for empty batches — no phantom
    * reports or empty generations), and the high-water record. Extracted
    * because five hand-rolled copies had drifted (one kept the guard
    * OUTSIDE the transaction); the guard's placement is now
    * un-driftable. */
  def effectivelyOnce(spark: SparkSession, wh: Warehouse,
                      checkpointDir: String, batchId: Long,
                      batch: DataFrame)(body: DataFrame => Unit): Unit =
    wh.transact {
      if (!alreadyCommitted(wh, checkpointDir, batchId)) {
        if (!batch.isEmpty) body(batch)
        record(spark, wh, checkpointDir, batchId)
      }
    }
}
