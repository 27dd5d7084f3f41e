package graft.stream

import graft.SparkSpec
import graft.etl.Warehouse
import graft.operators.Expectations._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Quality-gated streaming ingestion: passing micro-batches commit to
  * the target, failing ones quarantine (never dropped), the report
  * lands either way, and all of it transactionally per batch. */
class StreamingExpectationsSpec extends SparkSpec {
  import spark.implicits._

  test("passing batches commit, failing batches quarantine with a report") {
    val landing = tmpDir("expland")
    val wh = new Warehouse(spark, tmpDir("whgate").toString)
    val ckpt = tmpDir("ckptgate").toString
    val exps = Seq(
      NotNull("k_not_null", "k"),
      InRange("v_range", "v", 0L, 100L))
    val schema = StructType.fromDDL("k BIGINT, v BIGINT")
    def runOnce(): Unit =
      StreamingExpectations.gatedIngest(spark,
        spark.readStream.schema(schema).parquet(landing.toString),
        wh, "good", "bad", "report", exps, ckpt, availableNow = true)
        .awaitTermination()

    // batch 1: clean -> good
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
      .write.mode("append").parquet(landing.toString)
    runOnce()
    assert(wh.read("good", schema).count() == 2)
    assert(!wh.exists("bad"))

    // batch 2: a null key and an out-of-range value -> quarantine, with
    // the report recording exactly which expectations failed
    Seq((Some(3L), Some(999L)), (None, Some(5L))).toDF("k", "v")
      .write.mode("append").parquet(landing.toString)
    runOnce()
    assert(wh.read("good", schema).count() == 2)      // unchanged
    assert(wh.read("bad", schema).count() == 2)
    val reportSchema = StructType.fromDDL(
      "expectation STRING, observed BIGINT, total BIGINT, " +
        "passed BOOLEAN, batch_id BIGINT")
    val rep = wh.read("report", reportSchema)
    assert(rep.count() == 4)                          // 2 expectations x 2 batches
    val failing = rep.filter(!col("passed"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(failing == Set(("k_not_null", 1L), ("v_range", 1L)))

    // a replayed batch id is a no-op (exactly-once on redelivery)
    val committed = wh.read("good", schema).count() +
      wh.read("bad", schema).count()
    runOnce()                                          // nothing new to read
    assert(wh.read("good", schema).count() +
      wh.read("bad", schema).count() == committed)
    assert(rep.count() == 4)
  }
}
