package graft.stream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit, max}
import org.apache.spark.sql.types._
import graft.etl.Warehouse

/** Per-stream high-water commit records — the Delta `txnAppId`/`txnVersion`
  * pattern shared by every streaming sink in this engine. The stream id is
  * its checkpoint location (which IS the stream's identity: a new
  * checkpoint restarts batch numbering and must not read as replayed);
  * within one checkpoint batch ids are strictly monotonic, so ONE max per
  * stream is a complete replay record and the table stays one tiny row per
  * stream. The merge-upsert runs under the table's writer lock, so streams
  * sharing a warehouse never clobber each other's mark. */
private[stream] object StreamCommits {

  val schema: StructType = StructType(Seq(
    StructField("stream_id", StringType), StructField("batch_id", LongType)))

  def alreadyCommitted(wh: Warehouse, streamId: String, batchId: Long): Boolean =
    wh.exists("_stream_commits") &&
      !wh.read("_stream_commits", schema)
        .filter(col("stream_id") === streamId && col("batch_id") >= batchId)
        .isEmpty

  def record(spark: SparkSession, wh: Warehouse,
             streamId: String, batchId: Long): Unit =
    wh.mergeReplace("_stream_commits", schema,
      spark.range(1).select(lit(streamId).as("stream_id"),
        lit(batchId).as("batch_id")),
      (old, incoming) => old.unionByName(incoming)
        .groupBy("stream_id").agg(max("batch_id").as("batch_id")))
}
