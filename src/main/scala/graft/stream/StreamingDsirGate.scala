package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.etl.Warehouse
import graft.llm.TextAnalysis

/** DSIR-gated streaming ingestion — the continuous form of the
  * importance-resampling selector (X110): documents land as JSON-lines
  * files; every micro-batch is scored against the FROZEN warehouse-held
  * ratio table ([[graft.llm.TextAnalysis.dsirRatioTable]], landed by
  * the batch trainer) and routed — `dsir_weight >= minWeight` commits
  * to the kept table, everything else (including documents with no
  * features at all: empty or whitespace-only text carries no evidence
  * of target-likeness) to the rejected table, BOTH carrying the weight
  * so downstream mixing can re-threshold without rescoring. The data
  * is never dropped silently — the [[StreamingExpectations]]
  * discipline applied to the DSIR law.
  *
  * The trained state is FROZEN BY CONTRACT: the sink reads the ratio
  * table once at first use (pinned to the generation current at that
  * moment, cached for the sink's lifetime — a ≤buckets-row broadcast,
  * zero per-batch store reads). Retraining lands a NEW ratio
  * generation and takes effect in the next sink incarnation; a
  * mid-stream flip would otherwise make the keep law depend on batch
  * arrival timing, which no replay could reproduce.
  *
  * Effectively-once under at-least-once delivery, the shared frame:
  * one [[Warehouse.transact]] block per batch (both routed tables and
  * the high-water commit record flip atomically), [[StreamCommits]]
  * makes whole-batch replays no-ops, both sinks go through
  * [[Warehouse.appendIfAbsent]] on doc_id so a crash between the two
  * appends heals on replay, and within-batch duplicate doc_ids reduce
  * to the deterministic min(text) winner BEFORE scoring (the
  * corpus-dedup discipline — a differing-text duplicate would
  * otherwise be scored twice and race its own routing).
  *
  * At scale per micro-batch: the batch is featurized ONCE (the scored
  * frame is cached for the two routed appends), meets only the
  * broadcast ratio table, and nothing reads or shuffles the corpus. */
final class StreamingDsirGate(spark: SparkSession, wh: Warehouse,
                              landingDir: String, checkpointDir: String,
                              buckets: Int, minWeight: Long,
                              ratioTable: String = "dsir_ratio",
                              keptTable: String = "corpus_kept",
                              rejectedTable: String = "corpus_rejected") {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))
  private val ratioSchema = StructType(Seq(
    StructField("b", LongType), StructField("r", LongType)))
  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("n_feats", LongType), StructField("dsir_weight", LongType)))

  // frozen trained state: resolved on first batch, cached for the
  // sink's lifetime (see the class doc for why NOT per-batch)
  private lazy val ratio: DataFrame =
    wh.read(ratioTable, ratioSchema).cache()

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
    StreamCommits.effectivelyOnce(spark, wh, checkpointDir, batchId,
      batch) { batch =>
      // corrupt JSON lines parse to null rows — skip, never fail the
      // batch; one row per doc_id (deterministic min(text) winner)
      val docs = batch
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .groupBy(col("doc_id")).agg(min(col("text")).as("text"))
        .cache()
      try {
        val scored = docs
          .join(TextAnalysis.dsirScore(docs, ratio, buckets),
            Seq("doc_id"), "left")
          .select(col("doc_id"), col("text"), col("n_feats"),
            col("dsir_weight"))
          .cache()
        try {
          wh.appendIfAbsent(keptTable, outSchema,
            scored.filter(col("dsir_weight") >= minWeight),
            keys = Seq("doc_id"), orderCol = "doc_id",
            dedupWithinBatch = false)
          wh.appendIfAbsent(rejectedTable, outSchema,
            scored.filter(col("dsir_weight").isNull ||
              col("dsir_weight") < minWeight),
            keys = Seq("doc_id"), orderCol = "doc_id",
            dedupWithinBatch = false)
        } finally scored.unpersist()
      } finally docs.unpersist()
    }
}
