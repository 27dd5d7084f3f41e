package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.etl.Warehouse
import graft.llm.Sketches

/** Streaming cardinality maintenance: documents land as JSON-lines
  * files and every micro-batch's HLL registers
  * ([[graft.llm.Sketches.hllRegisters]] — X137's deterministic portable
  * law, so batch and streaming sketching can never drift) MERGE into
  * the warehouse register table by per-(slice, bucket) max.
  *
  * Unlike the additive sinks (count-min, inverted index), the register
  * merge is IDEMPOTENT and commutative — max is — so a re-delivered
  * document cannot corrupt the sketch even in principle: the
  * [[StreamCommits]] guard here saves work and keeps the generation
  * chain clean, but it is NOT load-bearing for correctness (the spec
  * pins this by merging the same wave twice under fresh batch ids and
  * asserting the table unchanged). The maintained table equals the
  * one-shot `hllRegisters` of everything ever streamed, row for row,
  * and [[graft.llm.Sketches.hllEstimate]] reads it unchanged — the
  * streaming path IS the landed-sketch production shape: shards stream
  * registers in, readouts merge rows out.
  *
  * Merge state is ≤ m rows per slice — bounded metadata, never
  * corpus-sized; the per-batch rewrite is slices × m rows.
  *
  * Geometry contract (the cm_sketch lesson): a register table built at
  * a DIFFERENT m must not be merged — bucket ids and rank widths stop
  * lining up. A store observed to hold a bucket >= this stream's m is
  * provably from a wider configuration and fails loudly; a store from
  * a NARROWER m is indistinguishable from data (all its buckets are in
  * range), so the full guarantee is a document-level contract exactly
  * like the index's posting-cap geometry. */
final class StreamingHllSink(spark: SparkSession, wh: Warehouse,
                             landingDir: String, checkpointDir: String,
                             m: Int = 256) {
  require(m >= 128 && Integer.bitCount(m) == 1, s"m=$m")

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("source", StringType)))
  val registerSchema: StructType = StructType(Seq(
    StructField("source", StringType), StructField("bucket", IntegerType),
    StructField("r", IntegerType)))

  @volatile private var geometryChecked = false

  /** The maintained register table (one row per (source, bucket)). */
  def registers(): DataFrame =
    wh.read(StreamingHllSink.Table, registerSchema)

  /** Cardinality readout over the maintained table — the batch
    * estimator verbatim. */
  def estimates(): DataFrame =
    Sketches.hllEstimate(registers(), m, slices = Seq("source"))

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
        if (!geometryChecked && wh.exists(StreamingHllSink.Table)) {
          val g = registers().agg(max(col("bucket")).as("b")).collect()(0)
          if (!g.isNullAt(0)) require(g.getInt(0) < m,
            s"hll_registers holds bucket ${g.getInt(0)}, this stream's " +
              s"m=$m — the store is from a wider sketch; restart with " +
              "the original m or start a fresh register table")
        }
        geometryChecked = true
        // corrupt JSON lines surface as null rows — a null doc_id row is
        // dropped; a null text hashes nothing (hllRegisters' null
        // exclusion). No per-doc dedup is needed: a document delivered
        // twice (same batch or any later one) contributes the same
        // (bucket, r) again and max absorbs it — the sketch property.
        val regs = Sketches.hllRegisters(
          batch.filter(col("doc_id").isNotNull), col("text"), m,
          slices = Seq(coalesce(col("source"), lit("unknown")).as("source")))
        wh.mergeReplace(StreamingHllSink.Table, registerSchema, regs,
          (old, incoming) => old.unionByName(incoming)
            .groupBy("source", "bucket").agg(max(col("r")).as("r")))
      }
    }
}

object StreamingHllSink {
  val Table = "hll_registers"
}
