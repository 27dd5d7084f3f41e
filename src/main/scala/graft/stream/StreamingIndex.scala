package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.etl.Warehouse
import graft.llm.TextAnalysis

/** Streaming inverted-index maintenance: documents land as JSON-lines
  * files; each micro-batch is indexed with the batch operator verbatim
  * ([[TextAnalysis.invertedIndex]] at `minDf = 1`, so batch and
  * streaming indexing can never drift) and MERGED into the warehouse
  * postings table. Both halves of an index row are mergeable summaries:
  *
  *  - `df` is additive over disjoint document sets (the stream's
  *    contract: a doc_id arrives in exactly one batch — replays are
  *    healed by the commit guard, and re-sending a document in a LATER
  *    batch would double-count df in the one-shot index too). The
  *    contract is enforced exactly, before the merge, by the ever-seen
  *    doc-id table described below;
  *  - `postings` is the min-k of the term's doc ids, and min-k is
  *    exactly mergeable: the k smallest of a union is the k smallest
  *    of the per-side k-smallest lists — so the merged index equals
  *    the one-shot index of everything ever streamed, posting arrays
  *    included, bit for bit.
  *
  * The store holds `minDf = 1` rows BECAUSE the merge needs them (a
  * term with df 1 in two batches is df 2 overall; filtering before the
  * merge would lose it forever); [[index]] applies the caller's minDf
  * at read time. Merge state per term is two arrays of <= maxPostings
  * ids — bounded metadata, never a posting blowup, and the map-side
  * WindowGroupLimit cap inside the batch operator keeps a stop-word's
  * O(corpus) posting list out of every shuffle.
  *
  * Like the Count-Min stream, df addition is not naturally idempotent,
  * so effectively-once leans on the shared [[StreamCommits]] frame: the
  * merged index and the high-water record flip in ONE transaction; a
  * replayed batch short-circuits and adds nothing twice.
  *
  * The disjoint-batch contract (a doc_id arrives in exactly one
  * committed batch) is enforced EXACTLY by an ever-seen doc-id table
  * (`inverted_index_docs`, one long per document) maintained in the
  * same transaction: each batch is semi-joined against it — the seen
  * side scanned once with the batch ids broadcast, never shuffled —
  * and any hit fails the batch loudly BEFORE the merge, closing the
  * detection floor the posting cap used to impose (a re-delivered doc
  * whose id had been capped out of the stored min-k list was invisible
  * to the in-merge duplicate check and silently double-counted df). A
  * probabilistic structure (Bloom/KMV) would be smaller but its false
  * positives would fail-fast a LEGITIMATE document with no remediation;
  * one long per doc is the sig-store's scale class (which stores
  * numHashes longs per doc) and the per-batch probe matches the
  * merge's own O(index) rewrite shape. Reset remediation must wipe
  * this table together with the index — use [[StreamingIndex.reset]]. */
final class StreamingIndex(spark: SparkSession, wh: Warehouse,
                           landingDir: String, checkpointDir: String,
                           maxPostings: Int = 10) {
  require(maxPostings >= 1, s"maxPostings=$maxPostings")

  // the posting-cap geometry only changes when the stream is
  // reconfigured, so one store scan per StreamingIndex instance
  // validates it — not one per micro-batch
  @volatile private var capChecked = false

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))
  val indexSchema: StructType = StructType(Seq(
    StructField("term", StringType), StructField("df", LongType),
    StructField("postings", ArrayType(LongType))))

  /** The maintained index at the caller's df floor. */
  def index(minDf: Long = 1): DataFrame =
    wh.read("inverted_index", indexSchema).filter(col("df") >= minDf)

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
    // additive = true: df addition cannot heal a checkpoint-wipe
    // re-read the way keyed appends do, so a new incarnation over an
    // existing commit history refuses instead of double-counting
    StreamCommits.effectivelyOnce(spark, wh, checkpointDir, batchId, batch,
      additive = true) {
      batch => {
        // corrupt JSON lines surface as null rows — skip, don't poison.
        // ONE row per doc_id (deterministic min(text) winner): the same
        // doc in two files of one micro-batch would otherwise count
        // df TWICE and duplicate its id in every touched posting list —
        // a within-batch corruption neither the commit guard nor the
        // cross-batch duplicate check can see
        val docs = batch
          .filter(col("doc_id").isNotNull && col("text").isNotNull)
          .groupBy(col("doc_id")).agg(min(col("text")).as("text"))
          .cache()
        try {
        // exact re-delivery check (class doc): any batch doc_id already
        // in the ever-seen table means a previously COMMITTED batch
        // carried it — the commit guard cannot see that, and additive
        // df cannot heal it, so fail before touching the index. Seen
        // side stays unshuffled: the batch ids broadcast into the probe.
        val seen = wh.read(StreamingIndex.SeenTable, StreamingIndex.seenSchema)
        val dup = seen.join(broadcast(docs.select(col("doc_id"))),
            Seq("doc_id"), "left_semi")
          .limit(1).collect()
        if (dup.nonEmpty) throw new IllegalStateException(
          s"doc_id ${dup(0).getLong(0)} was already indexed by a " +
            "previously committed batch — re-delivery cannot be healed " +
            "for additive df; fix the source contract or rebuild the " +
            "index (StreamingIndex.reset)")
        val batchIdx = TextAnalysis.invertedIndex(docs, minDf = 1,
          maxPostings = maxPostings)
        if (!capChecked && wh.exists("inverted_index")) {
          // geometry guard (the cm_sketch lesson): a store capped at a
          // LARGER maxPostings than this stream's would be silently
          // truncated below its own cap on every touched term; a store
          // observed to hold more than this cap is provably from a
          // wider configuration. A store whose arrays all happen to be
          // shorter than a wider historical cap is indistinguishable
          // from data — document-level contract.
          val g = wh.read("inverted_index", indexSchema)
            .agg(max(size(col("postings"))).as("w")).collect()(0)
          if (!g.isNullAt(0)) require(g.getInt(0) <= maxPostings,
            s"inverted_index holds a ${g.getInt(0)}-id posting list, " +
              s"this stream caps at $maxPostings — restart with the " +
              "original cap or start a fresh index table")
        }
        capChecked = true
        wh.mergeReplace("inverted_index", indexSchema, batchIdx,
          (old, incoming) => old.unionByName(incoming)
            .groupBy("term")
            // Defense-in-depth behind the exact ever-seen check above:
            // a duplicate id visible in the posting union (checked
            // pre-slice on <= 2*maxPostings elements per group) fails
            // the merge even if the seen table was tampered with. The
            // old detection FLOOR of this check — a re-delivered doc
            // whose id was capped OUT of the stored min-k list is
            // invisible here — no longer matters: the seen-table probe
            // catches every re-delivery exactly, cap or no cap.
            .agg(sum("df").as("df"),
              sort_array(flatten(collect_list(col("postings"))))
                .as("__all"))
            .select(col("term"), col("df"),
              when(size(array_distinct(col("__all"))) < size(col("__all")),
                raise_error(concat(
                  lit("inverted_index merge saw a duplicate doc_id for " +
                    "term '"), col("term"),
                  lit("' — a document was re-delivered in a later " +
                    "committed batch, which the commit guard cannot " +
                    "heal for additive df; fix the source contract or " +
                    "rebuild the index"))))
                .otherwise(slice(col("__all"), 1, maxPostings))
                .as("postings")))
        // all checks passed: the batch's ids become part of the ever-
        // seen set, in the SAME transaction as the merged index (plain
        // append — the semi-join above just proved them all new)
        wh.append(StreamingIndex.SeenTable,
          docs.select(col("doc_id")))
        } finally docs.unpersist()
      }
    }
}

object StreamingIndex {
  /** Ever-seen doc ids of the maintained index (see the class doc). */
  val SeenTable = "inverted_index_docs"
  val seenSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType)))

  /** Operator-confirmed reset of a streaming index: the postings, the
    * ever-seen doc-id table, and the stream's commit rows go together —
    * wiping the index alone would leave every re-read document refused
    * by the ever-seen check. */
  def reset(wh: Warehouse, checkpointDir: String): Unit =
    StreamCommits.resetAdditiveSink(wh, checkpointDir,
      "inverted_index", SeenTable)
}
