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
  *    batch would double-count df in the one-shot index too). A
  *    contract violation the merge can SEE — a re-delivered doc_id
  *    surviving in both posting lists — fails the batch loudly
  *    instead of corrupting df (see the merge comment for the
  *    detection floor the posting cap imposes);
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
  * replayed batch short-circuits and adds nothing twice. */
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
            // The disjoint-batch contract (class doc) makes duplicate
            // doc_ids impossible in a correct run, but the commit guard
            // cannot see a doc_id RE-DELIVERED in a later committed
            // batch — and addition would then double-count df silently
            // and permanently. So the merge fails FAST on the evidence
            // it can see: a duplicate id in the posting union (checked
            // pre-slice on <= 2*maxPostings elements per group). The
            // residual stays documented: a re-delivered doc whose id
            // was already capped OUT of the stored min-k list is
            // invisible here and still double-counts df — the cap
            // trades that detection floor for bounded merge state.
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
      }
    }
}
