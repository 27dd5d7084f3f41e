package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.etl.Warehouse
import graft.llm.TextAnalysis

/** NB-classifier-gated streaming ingestion — the continuous form of the
  * seed quality classifier (X119), the [[StreamingDsirGate]] frame with
  * the Naive-Bayes likelihood-ratio law: documents land as JSON-lines
  * files; every micro-batch scores against the FROZEN warehouse-held
  * count table ([[graft.llm.TextAnalysis.nbCountTable]], landed by the
  * batch trainer) and routes — `nb_score >= minScore` commits to the
  * kept table, everything else (including zero-token documents, which
  * carry no evidence and score null) to the rejected table, BOTH
  * carrying the score so downstream can re-threshold without rescoring.
  * Nothing drops silently — the [[StreamingExpectations]] discipline.
  *
  * Frozen state: the count table reads once at first use (pinned to the
  * generation current at that moment, cached for the sink's lifetime)
  * and its 1-row totals are derived ONCE there — zero per-batch store
  * reads, zero per-batch O(vocab) total scans. Retraining lands a new
  * counts generation and takes effect in the next sink incarnation (a
  * mid-stream flip would make the keep law depend on batch arrival
  * timing — the X114 contract). Unlike DSIR's ≤buckets-row ratio table
  * the count table is VOCAB-sized, so it is cached, not broadcast; each
  * batch's token occurrences meet it through a term-keyed join (the
  * batch side is micro-batch-sized — the join shuffles batch tokens,
  * never the corpus).
  *
  * Effectively-once under at-least-once delivery, the shared frame:
  * one [[Warehouse.transact]] per batch, [[StreamCommits]] replay
  * guard, both sinks through [[Warehouse.appendIfAbsent]] on doc_id so
  * a crash between the appends heals, and within-batch duplicate
  * doc_ids reduce to the deterministic min(text) winner BEFORE scoring
  * (the corpus-dedup discipline). */
final class StreamingNbGate(spark: SparkSession, wh: Warehouse,
                            landingDir: String, checkpointDir: String,
                            minScore: Long = 1000000000L,
                            countsTable: String = "nb_counts",
                            keptTable: String = "corpus_kept",
                            rejectedTable: String = "corpus_rejected") {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))
  private val countsSchema = StructType(Seq(
    StructField("w", StringType), StructField("cp", LongType),
    StructField("cn", LongType)))
  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("n_tokens", LongType), StructField("nb_score", LongType)))

  // frozen trained state: counts cached + totals derived once, both for
  // the sink's lifetime (see the class doc for why NOT per-batch)
  private lazy val counts: DataFrame =
    wh.read(countsTable, countsSchema).cache()
  private lazy val totals: DataFrame = {
    import org.apache.spark.sql.Row
    val r = TextAnalysis.nbTotals(counts).collect()(0)
    spark.createDataFrame(
      java.util.Arrays.asList(Row(r.getLong(0), r.getLong(1), r.getLong(2))),
      StructType(Seq(StructField("tp", LongType, nullable = false),
        StructField("tn", LongType, nullable = false),
        StructField("v", LongType, nullable = false))))
  }

  def start(availableNow: Boolean = false): StreamingQuery = {
    // refuse to start against an UNTRAINED gate: an empty count table
    // has learned nothing (every r_scaled would be NULL and every
    // document would route to rejected by default) — starting before
    // the batch trainer lands nb_counts is a deployment-order bug and
    // must fail loudly at start, not score a corpus into the bin
    val t0 = totals.first()
    if (t0.getLong(2) == 0L)
      throw new IllegalStateException(
        s"$countsTable is empty — train the classifier " +
          "(TextAnalysis.nbCountTable) and land the counts before " +
          "starting the gate")
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
      val docs = batch
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .groupBy(col("doc_id")).agg(min(col("text")).as("text"))
        .cache()
      try {
        val scored = docs
          .join(TextAnalysis.nbScore(docs, counts, totals, minScore)
            .select(col("doc_id"), col("n_tokens"), col("nb_score")),
            Seq("doc_id"), "left")
          .select(col("doc_id"), col("text"), col("n_tokens"),
            col("nb_score"))
          .cache()
        try {
          wh.appendIfAbsent(keptTable, outSchema,
            scored.filter(col("nb_score") >= minScore),
            keys = Seq("doc_id"), orderCol = "doc_id",
            dedupWithinBatch = false)
          wh.appendIfAbsent(rejectedTable, outSchema,
            scored.filter(col("nb_score").isNull ||
              col("nb_score") < minScore),
            keys = Seq("doc_id"), orderCol = "doc_id",
            dedupWithinBatch = false)
        } finally scored.unpersist()
      } finally docs.unpersist()
    }
}
