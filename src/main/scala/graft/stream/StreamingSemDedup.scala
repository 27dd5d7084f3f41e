package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, min}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.etl.Warehouse
import graft.llm.{Dedup, Similarity}

/** Streaming SEMANTIC dedup: embeddings land as JSON-lines files, each
  * micro-batch is SemDeDup'd incrementally against the warehouse-held
  * vector store, and only the survivors enter the kept corpus — the
  * embedding counterpart of [[StreamingCorpusDedup]], built on the same
  * three effectively-once layers (one [[Warehouse.transact]] per batch,
  * the [[StreamCommits]] high-water mark, `appendIfAbsent` healing).
  *
  * Centroids are FIXED at construction (from the initial corpus build,
  * e.g. [[Similarity.kmeansCentroids]]), so every batch assigns against
  * the same coarse structure and the maintained result provably equals
  * the one-shot [[Dedup.semDedupWith]] over everything that ever arrived
  * (LlmOpsSpec pins the batch equality; the streaming spec pins it
  * end-to-end across waves). Each batch is assigned exactly ONCE — the
  * assignment feeds both the dedup and the store append — and the store
  * keeps EVERY arrival's assignment, kept or dropped, so a later
  * near-dup of a dropped vector is still recognized.
  *
  * Re-clustering (new centroids as the corpus drifts) is a maintenance
  * rewrite, not a streaming concern: recompute centroids, re-assign the
  * stored vectors (never re-embedded), and publish store + corpus
  * through one transaction — the same shape as
  * [[graft.llm.CorpusMaintenance.compact]].
  */
final class StreamingSemDedup(spark: SparkSession, wh: Warehouse,
                              landingDir: String, checkpointDir: String,
                              centroids: Array[Array[Double]],
                              tau: Double) {

  private val vecSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))
  private val storeSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("cluster", IntegerType),
    StructField("embedding", ArrayType(FloatType))))
  private val keptSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("cluster", IntegerType)))

  def start(availableNow: Boolean = false): StreamingQuery = {
    val vecs = spark.readStream.schema(vecSchema).json(landingDir)
    val writer = vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  private[stream] def processBatch(batch: DataFrame, batchId: Long): Unit =
    StreamCommits.effectivelyOnce(spark, wh, checkpointDir, batchId, batch) {
      batch => {
          // corrupt lines parse to null rows — skip, never poison the
          // store. ONE row per vec_id (deterministic min(embedding)
          // winner — Spark arrays order lexicographically): the same
          // vector in two files of one micro-batch would otherwise land
          // twice in BOTH keyed sinks (appendIfAbsent anti-joins only
          // existing keys, not within-batch duplicates)
          val vecs = batch
            .filter(col("vec_id").isNotNull && col("embedding").isNotNull)
            .groupBy(col("vec_id")).agg(min(col("embedding")).as("embedding"))
          // assigned ONCE: the same DataFrame feeds the dedup and the store
          val asg = Similarity.assignTo(vecs, centroids)
            .select(col("vec_id"), col("cluster"), col("embedding")).cache()
          try {
            val kept = Dedup.semDedupIncrementalFromAssigned(
              wh.read("vec_store", storeSchema), asg, tau)
            wh.appendIfAbsent("vec_corpus", keptSchema, kept,
              keys = Seq("vec_id"), orderCol = "vec_id",
              dedupWithinBatch = false)
            wh.appendIfAbsent("vec_store", storeSchema, asg,
              keys = Seq("vec_id"), orderCol = "vec_id",
              dedupWithinBatch = false)
          } finally asg.unpersist()
        }
    }
}
