package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.etl.Warehouse
import graft.llm.Dedup

/** Streaming train/validation/test routing with the leak-safe,
  * ASSIGNMENT-STABLE law: documents land as JSON-lines files; each
  * micro-batch is near-dup-checked INCREMENTALLY against the
  * warehouse-held signature store and every document receives a split
  * through [[Dedup.incrementalLeakSafeSplit]] — a near-dup of an
  * already-routed document inherits that document's published split
  * (never re-hashes, so nothing a consumer already trained on can
  * flip), cross-split cluster merges land flagged in the assignment
  * table (`n_store_splits > 1`) for quarantine, and genuinely new
  * clusters hash by their representative exactly like the one-shot
  * [[Dedup.leakSafeSplit]].
  *
  * Micro-batch bodies reuse the batch operators verbatim through
  * `foreachBatch`, so streaming and batch routing semantics cannot
  * drift; each batch is shingled+hashed exactly once (the signature
  * table feeds the candidate generator AND the store append).
  *
  * Effectively-once under at-least-once delivery, the
  * [[StreamingCorpusDedup]] discipline: one [[Warehouse.transact]]
  * block per batch (assignments, signatures, and the high-water commit
  * record flip atomically), [[StreamCommits]] makes whole-batch
  * replays no-ops, and both sinks go through
  * [[Warehouse.appendIfAbsent]] on doc_id — which doubles as the
  * IMMUTABILITY guarantee the stability law needs: a published
  * assignment row can never be overwritten, by replay or by bug.
  *
  * At scale per micro-batch: only the batch is hashed, only store
  * signature rows in batch-touched LSH buckets shuffle, and the
  * assignment store is read only to join the touched components'
  * members — nothing rescans the corpus.
  */
final class StreamingSplitRouter(spark: SparkSession, wh: Warehouse,
                                 landingDir: String, checkpointDir: String,
                                 cuts: Seq[(String, Int)], lastSplit: String,
                                 numHashes: Int = 32, bands: Int = 8,
                                 k: Int = 3, threshold: Double = 0.5) {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))
  private val sigSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig", ArrayType(LongType, containsNull = false))))
  /** Full audit row: the split plus how it was derived. */
  private[stream] val assignSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("cluster_id", LongType),
    StructField("split", StringType),
    StructField("inherited", BooleanType),
    StructField("n_store_splits", LongType)))

  def start(availableNow: Boolean = false): StreamingQuery = {
    val docs = spark.readStream.schema(docSchema).json(landingDir)
    val writer = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  private[stream] def processBatch(batch: DataFrame, batchId: Long): Unit =
    wh.transact {
      if (!StreamCommits.alreadyCommitted(wh, checkpointDir, batchId)) {
        if (!batch.isEmpty) {
          // corrupt JSON lines surface as null rows — skip, don't poison
          val docs = batch
            .filter(col("doc_id").isNotNull && col("text").isNotNull).cache()
          val sigs = Dedup.minhashTable(docs, numHashes, k).cache()
          try {
            val edges =
              if (!wh.exists("sig_store"))
                Dedup.minhashCandidatesFromSigs(sigs, numHashes, bands,
                  threshold)
              else Dedup.incrementalMinhashCandidatesFromSigs(
                wh.read("sig_store", sigSchema), sigs, numHashes, bands,
                threshold)
            val assigned =
              if (!wh.exists("split_assign"))
                spark.createDataFrame(
                  new java.util.ArrayList[org.apache.spark.sql.Row](),
                  assignSchema)
              else wh.read("split_assign", assignSchema)
            wh.appendIfAbsent("split_assign", assignSchema,
              Dedup.incrementalLeakSafeSplit(assigned, docs, edges,
                cuts, lastSplit),
              keys = Seq("doc_id"), orderCol = "doc_id",
              dedupWithinBatch = false)
            // dropped-or-kept, every doc's signature enters the store: a
            // later near-dup of ANY routed doc must still be recognized
            wh.appendIfAbsent("sig_store", sigSchema, sigs,
              keys = Seq("doc_id"), orderCol = "doc_id",
              dedupWithinBatch = false)
          } finally { sigs.unpersist(); docs.unpersist() }
        }
        StreamCommits.record(spark, wh, checkpointDir, batchId)
      }
    }
}
