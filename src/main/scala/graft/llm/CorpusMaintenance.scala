package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import graft.etl.Warehouse

/** Periodic compaction for an incrementally-maintained dedup corpus.
  *
  * The nightly incremental path ([[Dedup.incrementalMinhashCandidates]] +
  * an append-only signature store) computes the SEQUENTIAL-GREEDY dedup:
  * it equals a one-shot dedup of everything seen so far — except when a
  * late arrival bridges two previously-separate clusters, in which case
  * the one-shot result would drop a document the greedy path already
  * kept, and an append-only maintainer can never retract it
  * (CorpusMaintenanceSpec pins this limit).
  *
  * Compaction closes that gap without re-reading a single document body:
  * candidate edges are regenerated from the STORED fixed-width signatures
  * (one [[Dedup.minhashCandidatesFromSigs]] pass — shuffle of
  * `numHashes` longs per doc, no shingling, no text), clusters are
  * re-labelled, and every corpus document that is no longer its
  * cluster's minimum-id representative is dropped. Because document ids
  * are arrival-ordered, a cluster's minimum-id member was the first of
  * its cluster to arrive and was therefore never dropped by the greedy
  * path — so compaction only ever removes rows, and the result equals
  * the one-shot dedup exactly (spec + q67 oracle).
  */
object CorpusMaintenance {

  val corpusSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))
  val sigSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig", ArrayType(LongType, containsNull = false))))

  /** The compacted corpus: `corpus` minus every document that a full
    * recluster of the STORED signatures marks as a non-representative.
    * Pure DataFrame core shared by [[compact]] and the q67 driver query;
    * `store` may contain duplicate doc_ids (healed replays) — they are
    * collapsed before bucketing. */
  def recompacted(corpus: DataFrame, store: DataFrame,
                  numHashes: Int = 32, bands: Int = 8,
                  threshold: Double = 0.5, portable: Boolean = false,
                  maxBucket: Int = Dedup.MaxBucketMembers): DataFrame =
    Dedup.dedupCorpus(corpus,
      Dedup.minhashCandidatesFromSigs(store.dropDuplicates("doc_id"),
        numHashes, bands, threshold, portable, maxBucket),
      edgesDistinct = true)

  /** Run compaction against a warehouse-held corpus + signature store.
    * The two rewrites commit as ONE [[Warehouse.transact]] block: a
    * reader holding a [[Warehouse#snapshot]] sees either the
    * pre-compaction pair or the post-compaction pair, never a compacted
    * corpus against an uncompacted store; a crash mid-compaction
    * publishes nothing. (Compaction is also idempotent, so even a replay
    * after a post-commit crash converges to the same state.)
    */
  def compact(spark: SparkSession, wh: Warehouse,
              numHashes: Int = 32, bands: Int = 8,
              threshold: Double = 0.5): Unit = wh.transact {
    val store = wh.read("sig_store", sigSchema)
    wh.replace("corpus",
      recompacted(wh.read("corpus", corpusSchema), store, numHashes, bands,
        threshold))
    wh.replace("sig_store", store.dropDuplicates("doc_id"))
  }
}
