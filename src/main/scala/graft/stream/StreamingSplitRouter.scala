package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
  * table AND their whole membership is recorded in `split_conflicts`,
  * so the flag is STICKY: a later near-dup of any member of a
  * compromised cluster is flagged too, even when the stored splits it
  * directly touches agree. Genuinely new clusters hash by their
  * representative exactly like the one-shot [[Dedup.leakSafeSplit]].
  *
  * Documents too short to shingle (< k tokens) can never form a
  * MinHash candidate edge, so they route by the md5 bucket of their
  * NORMALIZED CONTENT ([[Dedup.contentHashSplit]]) — byte-identical
  * short docs always agree on a split with no store lookup at all.
  * They carry no signature, so they are not appended to the store
  * (nothing could ever pair against it).
  *
  * Micro-batch bodies reuse the batch operators verbatim through
  * `foreachBatch`, so streaming and batch routing semantics cannot
  * drift; each batch is shingled+hashed exactly once (the signature
  * table feeds the candidate generator AND the store append).
  *
  * Effectively-once under at-least-once delivery, the
  * [[StreamingCorpusDedup]] discipline: one [[Warehouse.transact]]
  * block per batch (assignments, signatures, conflict members, and the
  * high-water commit record flip atomically), [[StreamCommits]] makes
  * whole-batch replays no-ops, and all sinks go through
  * [[Warehouse.appendIfAbsent]] on doc_id — which doubles as the
  * IMMUTABILITY guarantee the stability law needs: a published
  * assignment row can never be overwritten, by replay or by bug.
  *
  * Streams sharing one warehouse's `sig_store` (e.g. this router next
  * to a [[StreamingCorpusDedup]]) MUST agree on (numHashes, k): the
  * signature width is validated against the store on every batch and a
  * mismatch fails loudly, but an equal-width different-k store is
  * undetectable from the data — the table-name parameters exist so
  * disagreeing pipelines can keep separate stores instead.
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
                                 k: Int = 3, threshold: Double = 0.5,
                                 sigStoreTable: String = "sig_store",
                                 assignTable: String = "split_assign",
                                 conflictTable: String = "split_conflicts") {

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
    StructField("n_store_splits", LongType),
    StructField("conflicted", BooleanType)))
  private val conflictSchema = StructType(Seq(
    StructField("doc_id", LongType)))

  // per-batch O(1) width check against the store's persisted verified-
  // width marker; one full scan only for a marker-less store — see
  // StreamCommits.SigWidthGuard
  private val sigWidthGuard = new StreamCommits.SigWidthGuard(
    sigStoreTable, sigSchema, numHashes, "this router")

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
    StreamCommits.effectivelyOnce(spark, wh, checkpointDir, batchId, batch) {
      batch => {
          // corrupt JSON lines surface as null rows — skip, don't poison.
          // One row per doc_id: the same document landing in two files
          // picked up by ONE micro-batch would otherwise flow as two
          // rows into all three appendIfAbsent sinks — whose anti-join
          // drops only keys already IN the table, not keys duplicated
          // within the batch — inflating counts and multiplying rows
          // for downstream joins. min(text), not dropDuplicates: when
          // the batch carries the same doc_id with DIFFERENT text the
          // winner must be deterministic, or the routed signature (and
          // therefore the published split) could differ across a
          // replay that recomputes the batch. Same map-side-combining
          // aggregate shape, one row per doc through the shuffle.
          // The shingle count is computed ONCE into a column (the class
          // doc's "shingled exactly once" covers hashing; the split
          // predicate must not re-run the shingle expression per filter)
          val docs = batch
            .filter(col("doc_id").isNotNull && col("text").isNotNull)
            .groupBy(col("doc_id")).agg(min(col("text")).as("text"))
            .withColumn("__n_shingles", size(Dedup.shingles(col("text"), k)))
            .cache()
          val shingled = docs.filter(col("__n_shingles") > 0)
          val short = docs.filter(col("__n_shingles") === 0)
          val sigs = Dedup.minhashSigs(shingled, numHashes, k).cache()
          var assignments: DataFrame = null
          try {
            val storeExists = wh.exists(sigStoreTable)
            sigWidthGuard.check(wh)
            val edges =
              if (!storeExists)
                Dedup.minhashCandidatesFromSigs(sigs, numHashes, bands,
                  threshold)
              else Dedup.incrementalMinhashCandidatesFromSigs(
                wh.read(sigStoreTable, sigSchema), sigs, numHashes, bands,
                threshold)
            // components computed ONCE per batch and passed to both the
            // splitter and the conflict closure below — the closure's
            // own duplicateClusters call would re-run the entire
            // candidate-edge lineage a second time per conflicted batch.
            // edgesDistinct: the incremental candidate generator ends in
            // a groupBy(id_a, id_b), so the dedup exchange is redundant
            val comps = Dedup.duplicateClusters(edges, edgesDistinct = true)
            // Warehouse.read of an absent table is the empty frame with
            // the declared schema, so first-batch reads need no guard
            val knownConflicts = wh.read(conflictTable, conflictSchema)
            // components are LOCAL on the normal path (duplicateClusters'
            // bounded probe) — then the whole touched-component store
            // state collects in one small action and the assignment plan
            // is a pure narrow map (incrementalLeakSafeSplitCollected,
            // equal by spec pin), with the conflict branch decided on
            // the DRIVER at zero Spark actions. A degenerate batch whose
            // edge graph overflowed the probe keeps the distributed
            // splitter and decides conflicts from the cached frame.
            // isLocal: collect runs on the driver with no Spark job —
            // true exactly for the probe path's literal output
            val compsLocal =
              if (comps.isLocal)
                Some(comps.collect().map(r => (r.getLong(0), r.getLong(1))))
              else None
            val (core, conflictSeed): (DataFrame, () => Option[DataFrame]) =
              compsLocal match {
                case Some(arr) =>
                  val st = Dedup.incrementalLeakSafeSplitCollected(
                    wh.read(assignTable, assignSchema), shingled, arr,
                    cuts, lastSplit, conflictedIds = Some(knownConflicts))
                  val seed = () =>
                    if (st.conflictedComps.isEmpty) None
                    else {
                      import spark.implicits._
                      Some(st.conflictedComps.toSeq
                        .flatMap(st.compMembers(_)).distinct
                        .toDF("doc_id"))
                    }
                  (st.assignments, seed)
                case None =>
                  val a = Dedup.incrementalLeakSafeSplit(
                    wh.read(assignTable, assignSchema), shingled, edges,
                    cuts, lastSplit, conflictedIds = Some(knownConflicts),
                    compsOpt = Some(comps))
                  val seed = () => {
                    val cc = assignments.filter(col("conflicted"))
                      .select(col("cluster_id")).distinct()
                    if (cc.isEmpty) None
                    else Some(comps
                      .join(cc, col("comp_id") === col("cluster_id"),
                        "left_semi")
                      .select(col("doc_id")))
                  }
                  (a, seed)
              }
            assignments = core
              .unionByName(Dedup.contentHashSplit(short, cuts, lastSplit)
                .select(col("doc_id"), col("doc_id").as("cluster_id"),
                  col("split"), lit(false).as("inherited"),
                  lit(0L).as("n_store_splits"),
                  lit(false).as("conflicted")))
              .cache()
            // BOTH unconditional sinks stage in ONE fused append: the
            // single tagged staging count materializes the cached
            // assignments chain AND the cached sigs in one Spark job
            // (two separate appendIfAbsent calls cost one count job
            // each — per-batch action count is the streaming frame's
            // fixed cost). The append runs before the conflict closure
            // so the closure's store walk sees this batch's rows;
            // within the transaction the append order is otherwise
            // invisible: the catalog flips once at commit. Dropped-or-
            // kept, every shingled doc's signature enters the store: a
            // later near-dup of ANY routed doc must still be recognized.
            wh.appendIfAbsentMany(Seq(
              wh.Append(assignTable, assignSchema, assignments,
                keys = Seq("doc_id"), orderCol = "doc_id",
                dedupWithinBatch = false),
              wh.Append(sigStoreTable, sigSchema, sigs,
                keys = Seq("doc_id"), orderCol = "doc_id",
                dedupWithinBatch = false)))
            // conflict stickiness, CLOSED over the assignment store: a
            // conflicted component's membership must include docs that
            // inherited through its members in EARLIER batches (chains
            // A <- A2 <- A3 where only (A, A2) and (A2, A3) edges were
            // ever observed — near-dup candidates are not transitive,
            // so this batch's edge components alone under-record).
            // Stored rows point at their batch-time cluster_id, so the
            // closure walks doc_id <-> cluster_id links in the store;
            // conflict sets are tiny and chains short, each step is two
            // semi-joins on the store, and the loop stops at fixpoint.
            conflictSeed().foreach { seedMembers =>
              val store = wh.read(assignTable, assignSchema)
                .select(col("doc_id"), col("cluster_id")).cache()
              var members = seedMembers.cache()
              var size0 = members.count()
              var grown = true
              var steps = 0
              // each step adds >= 1 doc while growing, so maxSteps only
              // binds on a >= 64-hop inheritance chain; exiting while
              // STILL growing would silently under-record membership
              // (the exact leak the closure exists to prevent), so that
              // case fails the batch loudly instead
              val maxSteps = 64
              while (grown && steps < maxSteps) {
                val viaCluster = store
                  .join(members.select(col("doc_id").as("__m")),
                    col("cluster_id") === col("__m"), "left_semi")
                  .select(col("doc_id"))
                val viaDoc = store
                  .join(members.select(col("doc_id").as("__m")),
                    col("doc_id") === col("__m"), "left_semi")
                  .select(col("cluster_id").as("doc_id"))
                val next = members.unionByName(viaCluster)
                  .unionByName(viaDoc).distinct().cache()
                val size1 = next.count()
                members.unpersist()
                members = next
                grown = size1 > size0
                size0 = size1
                steps += 1
              }
              require(!grown,
                s"conflict closure still growing after $maxSteps store " +
                  "walks — inheritance chains deeper than the step bound; " +
                  "raise the bound rather than under-record membership")
              wh.appendIfAbsent(conflictTable, conflictSchema, members,
                keys = Seq("doc_id"), orderCol = "doc_id",
                dedupWithinBatch = false)
              members.unpersist(); store.unpersist()
            }
          } finally {
            // unpersist in finally: a failed append (width guard, disk,
            // writer lock) must not leak the cached frames for the
            // lifetime of a per-batch-retrying stream
            if (assignments != null) assignments.unpersist()
            sigs.unpersist(); docs.unpersist()
          }
        }
    }
}
