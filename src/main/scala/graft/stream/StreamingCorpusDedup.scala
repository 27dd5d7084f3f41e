package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.etl.Warehouse
import graft.llm.Dedup

/** Streaming corpus maintenance: documents land as JSON-lines files in a
  * directory; each micro-batch is near-dup-deduplicated INCREMENTALLY
  * against the warehouse-held signature store and only the survivors are
  * appended to the corpus.
  *
  * The micro-batch body reuses the batch operators verbatim
  * ([[Dedup.incrementalMinhashCandidates]] / [[Dedup.dedupCorpus]] /
  * [[Dedup.minhashTable]] through `foreachBatch`), so streaming and batch
  * dedup semantics cannot drift — the streaming layer contributes only
  * exactly-once file discovery (file-source log + checkpoint).
  *
  * At scale per micro-batch: only the batch's documents are hashed (the
  * store is never re-hashed), the store side of the candidate join never
  * shuffles (the batch's bucket rows broadcast), and the two sink appends
  * commit atomically through the warehouse generation pointer. Signatures
  * of DROPPED documents enter the store too — a later near-dup of a
  * dropped doc must still be recognized (see CorpusMaintenanceSpec for
  * the exact maintained-vs-one-shot equivalence and its limits).
  */
final class StreamingCorpusDedup(spark: SparkSession, wh: Warehouse,
                                 landingDir: String, checkpointDir: String,
                                 numHashes: Int = 32, bands: Int = 8,
                                 k: Int = 3, threshold: Double = 0.5) {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))
  private val sigSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig", ArrayType(LongType, containsNull = false))))

  def start(availableNow: Boolean = false): StreamingQuery = {
    val docs = spark.readStream.schema(docSchema).json(landingDir)
    val writer = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) => processBatch(batch) }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  private[stream] def processBatch(batch: DataFrame): Unit = if (!batch.isEmpty) {
    // corrupt JSON lines surface as null doc_id/text rows from the file
    // source — skip them rather than poison the store (one bad line must
    // not fail the batch, matching the pipeline's one-job-not-the-service
    // failure discipline). The batch is then consumed three times (edges,
    // survivors, signatures) — pin it so the source isn't re-read per
    // consumer.
    val docs = batch
      .filter(col("doc_id").isNotNull && col("text").isNotNull).cache()
    try {
      val edges =
        if (!wh.exists("sig_store"))
          Dedup.minhashCandidates(docs, numHashes, bands, k, threshold)
        else Dedup.incrementalMinhashCandidates(
          wh.read("sig_store", sigSchema), docs, numHashes, bands, k, threshold)
      wh.append("corpus", Dedup.dedupCorpus(docs, edges))
      wh.append("sig_store", Dedup.minhashTable(docs, numHashes, k))
    } finally docs.unpersist()
  }
}
