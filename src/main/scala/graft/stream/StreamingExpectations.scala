package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.etl.Warehouse
import graft.operators.Expectations
import graft.operators.Expectations.Expectation

/** Quality-gated streaming ingestion: every micro-batch is evaluated
  * against a declarative expectation set
  * ([[graft.operators.Expectations]]) inside `foreachBatch`; a batch
  * whose expectations ALL pass commits to the target table, a failing
  * batch lands in a quarantine table instead, and the per-expectation
  * report is appended either way — the reference's job-fails-on-junk
  * discipline generalized to continuous ingestion, with the data never
  * dropped silently.
  *
  * All three writes of a micro-batch commit in ONE warehouse
  * transaction (the catalog flip), so a crash mid-batch publishes
  * nothing and the replay guard ([[StreamCommits]], keyed by the
  * checkpoint) makes redelivered batches no-ops: exactly-once table
  * state on at-least-once delivery.
  *
  * Scale shape: the batch is persisted once per micro-batch (the
  * evaluation aggregate and the gated append both read it — without
  * the persist, foreachBatch recomputes the source); the verdict is a
  * 1-row aggregate min over the |expectations|-row report, driver-side
  * bounded metadata. */
object StreamingExpectations {

  def gatedIngest(spark: SparkSession, stream: DataFrame, wh: Warehouse,
                  table: String, quarantine: String, report: String,
                  expectations: Seq[Expectation],
                  checkpoint: String,
                  availableNow: Boolean = false): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpoint)
    (if (availableNow)
      writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the shared effectively-once frame: replay guard INSIDE the
        // transaction (this sink's hand-rolled copy had drifted it
        // outside) and empty batches skipped — a zero-row bookkeeping
        // batch must not fail RowCountBetween and pollute the quality
        // history with a phantom quarantined "batch"
        StreamCommits.effectivelyOnce(spark, wh, checkpoint, batchId,
          batch) { b =>
          b.persist()
          try {
            val rep = Expectations.evaluate(b, expectations)
              .withColumn("batch_id", lit(batchId))
            val verdicts = rep.select(col("expectation"), col("observed"),
              col("total"), col("passed"), col("batch_id")).collect()
            val passed = verdicts.forall(_.getBoolean(3))
            val repDf = spark.createDataFrame(
              java.util.Arrays.asList(verdicts: _*), rep.schema)
            wh.append(report, repDf)
            wh.append(if (passed) table else quarantine, b)
          } finally b.unpersist()
        }
        ()
      }
      .start()
  }
}
