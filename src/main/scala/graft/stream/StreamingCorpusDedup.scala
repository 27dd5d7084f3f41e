package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, min}
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
  * ([[Dedup.incrementalMinhashCandidatesFromSigs]] / [[Dedup.dedupCorpus]] /
  * [[Dedup.minhashTable]] through `foreachBatch`), so streaming and batch
  * dedup semantics cannot drift. Each batch is shingled+hashed exactly
  * ONCE: the signature table is computed up front, cached, fed to the
  * candidate generator AND appended to the store.
  *
  * End-to-end effectively-once, the same discipline as the reference's
  * `ON CONFLICT DO NOTHING` sink (`db.py:41-58`): `foreachBatch` is
  * at-least-once, so the sink must absorb replays itself. Three layers do:
  *
  *  - each micro-batch commits as ONE [[Warehouse.transact]] block —
  *    corpus survivors, signatures, and the commit record flip in a
  *    single atomic catalog rename, so there is no crash window in which
  *    some sinks of a batch are visible and others are not;
  *  - a `_stream_commits` high-water mark per stream — the Delta
  *    `txnAppId`/`txnVersion` pattern — makes a whole-batch replay a
  *    fast no-op (the stream id is the checkpoint location, which IS
  *    the stream's identity: a new checkpoint restarts batch numbering
  *    and must not be treated as replayed; within one checkpoint batch
  *    ids are strictly monotonic, so the table stays one row per
  *    stream);
  *  - both data sinks go through [[Warehouse.appendIfAbsent]] on doc_id,
  *    so a crash BETWEEN the two appends (or before the commit record
  *    lands) heals on replay — re-delivered documents and signatures are
  *    anti-joined away instead of landing twice. Replayed file batches
  *    are byte-identical (the file-source offsets log pins each batch's
  *    file list), so the recomputed survivor set matches the committed
  *    one and the heal is exact.
  *
  * At scale per micro-batch: only the batch's documents are hashed (the
  * store is never re-hashed) and only store rows in batch-touched LSH
  * buckets shuffle. Signatures of DROPPED documents enter the store too —
  * a later near-dup of a dropped doc must still be recognized (see
  * CorpusMaintenanceSpec for the exact maintained-vs-one-shot
  * equivalence and its limits).
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

  // per-batch O(1) width check against the store's persisted verified-
  // width marker; one full scan only for a marker-less store — see
  // StreamCommits.SigWidthGuard
  private val sigWidthGuard = new StreamCommits.SigWidthGuard(
    "sig_store", sigSchema, numHashes, "this stream")

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
    // ONE transaction per micro-batch: survivors, signatures, and the
    // high-water commit record flip together in a single catalog rename,
    // so a crash anywhere inside the batch publishes nothing and the
    // replay starts from a clean slate — corpus rows can never land
    // without their signatures or without the commit record.
    StreamCommits.effectivelyOnce(spark, wh, checkpointDir, batchId, batch) {
      batch => {
          // corrupt JSON lines surface as null doc_id/text rows from the file
          // source — skip them rather than poison the store (one bad line must
          // not fail the batch, matching the pipeline's one-job-not-the-service
          // failure discipline). ONE row per doc_id (deterministic min(text)
          // winner, the split-router discipline): the same doc landing in two
          // files of one micro-batch would otherwise land TWICE in the keyed
          // corpus (appendIfAbsent anti-joins only existing keys) and — for a
          // differing-text duplicate — emit TWO signature rows for one id
          // (minhashSigs is one-row-in-one-row-out), double-filling LSH
          // bucket slots. Both the source batch and its
          // signature table are consumed by more than one sink — pin them so
          // neither the file read nor the shingle+hash stage runs twice.
          val docs = batch
            .filter(col("doc_id").isNotNull && col("text").isNotNull)
            .groupBy(col("doc_id")).agg(min(col("text")).as("text"))
            .cache()
          val sigs = Dedup.minhashSigs(docs, numHashes, k).cache()
          try {
            val storeExists = wh.exists("sig_store")
            sigWidthGuard.check(wh)
            val edges =
              if (!storeExists)
                Dedup.minhashCandidatesFromSigs(sigs, numHashes, bands, threshold)
              else Dedup.incrementalMinhashCandidatesFromSigs(
                wh.read("sig_store", sigSchema), sigs, numHashes, bands, threshold)
            // edgesDistinct: the candidate generators end in a
            // groupBy(id_a, id_b) — the dedup exchange is redundant
            wh.appendIfAbsent("corpus", docSchema,
              Dedup.dedupCorpus(docs, edges, edgesDistinct = true),
              keys = Seq("doc_id"), orderCol = "doc_id", dedupWithinBatch = false)
            wh.appendIfAbsent("sig_store", sigSchema, sigs,
              keys = Seq("doc_id"), orderCol = "doc_id", dedupWithinBatch = false)
          } finally { sigs.unpersist(); docs.unpersist() }
        }
        // the appendIfAbsent sinks would heal a replayed batch row-by-row
        // even WITHOUT the transaction (anti-join on doc_id); with it they
        // are belt-and-braces for streams sharing tables
    }
}
