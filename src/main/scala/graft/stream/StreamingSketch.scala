package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.etl.Warehouse
import graft.llm.{Dedup, Sketches}

/** Streaming Count-Min maintenance: documents land as JSON-lines files;
  * each micro-batch's term occurrences are sketched
  * ([[Sketches.countMinBuild]] — the batch operator verbatim, so batch
  * and streaming sketches cannot drift) and MERGED into the warehouse
  * sketch by cell addition — the mergeable-summary contract doing real
  * work: the stream never re-reads history, the sketch never exceeds
  * `depth * width` rows, and the merged table always equals the
  * one-shot sketch of everything ever streamed.
  *
  * Cell addition is NOT naturally idempotent (unlike the dedup sinks'
  * keyed append-if-absent), so effectively-once here leans entirely on
  * the transactional high-water mark: the merged sketch and the
  * [[StreamCommits]] record flip in ONE [[Warehouse.transact]] catalog
  * rename — a crash inside the batch publishes neither, a replayed
  * batch short-circuits on `alreadyCommitted` and adds nothing twice.
  * That makes this the additive-state member of the streaming family
  * (dedup = keyed-idempotent sinks, funnel/sessionize = operator
  * state, sketch = transactional accumulator).
  */
final class StreamingSketch(spark: SparkSession, wh: Warehouse,
                            landingDir: String, checkpointDir: String,
                            depth: Int = 3, width: Int = 1024) {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))
  val sketchSchema: StructType = StructType(Seq(
    StructField("row", IntegerType), StructField("bucket", LongType),
    StructField("cnt", LongType)))

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
    // additive = true: cell addition cannot heal a checkpoint-wipe
    // re-read the way keyed appends do, so a new incarnation over an
    // existing commit history refuses instead of double-counting
    StreamCommits.effectivelyOnce(spark, wh, checkpointDir, batchId, batch,
      additive = true) {
      batch => {
          // ONE row per doc_id (deterministic min(text) winner): the
          // same doc in two files of one micro-batch would otherwise
          // double-count every one of its tokens in the additive cells
          val terms = batch
            .filter(col("doc_id").isNotNull && col("text").isNotNull)
            .groupBy(col("doc_id")).agg(min(col("text")).as("text"))
            .select(explode(Dedup.wsTokens(col("text"))).as("term"))
          val batchSketch =
            Sketches.countMinBuild(terms, col("term"), depth, width)
            .select(col("row").cast("int").as("row"), col("bucket"),
              col("cnt").cast("long").as("cnt"))
          wh.mergeReplace("cm_sketch", sketchSchema, batchSketch,
            (store, incoming) => {
              // geometry guard (the sig_store width lesson): merging a
              // batch sketched at a different depth/width into the
              // accumulated cells mixes two hash moduli — estimates
              // become garbage INCLUDING undercounts, silently, forever.
              // The stored geometry is readable from the cells: depth =
              // max(row)+1 exactly; width must exceed every stored
              // bucket (a lower probe width is provably wrong, a higher
              // one unverifiable from data — document-level contract).
              // The store is depth x width cells, so the extra scan is
              // bounded metadata.
              val g = store.agg(max(col("row")).as("d"),
                max(col("bucket")).as("b")).collect()(0)
              if (!g.isNullAt(0)) {
                require(g.getInt(0) + 1 == depth,
                  s"cm_sketch was accumulated at depth ${g.getInt(0) + 1}, " +
                    s"this stream sketches depth $depth — restart with the " +
                    "original geometry or start a fresh sketch table")
                require(g.getLong(1) < width,
                  s"cm_sketch holds bucket ${g.getLong(1)} >= width $width " +
                    "— the stored sketch used a wider modulus")
              }
              store.unionByName(incoming)
                .groupBy("row", "bucket")
                .agg(sum("cnt").as("cnt"))
            })
        }
    }
}
