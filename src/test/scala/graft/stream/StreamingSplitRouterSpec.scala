package graft.stream

import graft.SparkSpec
import graft.etl.Warehouse
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The streaming leak-safe router end-to-end: a real file-source stream
  * in waves through one checkpoint, asserting the assignment-stability
  * law that the one-shot split cannot give — a later near-dup (even a
  * SMALLER id, which would re-hash the one-shot cluster under a new
  * representative) inherits the published split, and published rows are
  * immutable across batches and replays. */
class StreamingSplitRouterSpec extends SparkSpec {
  import spark.implicits._

  private val assignDDL =
    "doc_id BIGINT, cluster_id BIGINT, split STRING, " +
      "inherited BOOLEAN, n_store_splits BIGINT"

  test("waves route once, near-dups inherit published splits, replays " +
    "are no-ops") {
    val landing = tmpDir("splitland")
    val wh = new Warehouse(spark, tmpDir("whsplit").toString)
    val ckpt = tmpDir("ckptsplit").toString
    val router = new StreamingSplitRouter(spark, wh, landing.toString,
      ckpt, cuts = Seq("train" -> 80, "validation" -> 90),
      lastSplit = "test")
    def runOnce(): Unit =
      router.start(availableNow = true).awaitTermination()
    def assignments() = wh.read("split_assign",
        StructType.fromDDL(assignDDL))
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), r.getBoolean(3), r.getLong(4))).toMap

    // wave 1: three unrelated docs
    Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (200L, "completely different content about spark engines"),
      (300L, "a third unrelated document with its own words"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("append").json(landing.toString)
    runOnce()
    val w1 = assignments()
    assert(w1.keySet == Set(100L, 200L, 300L))
    assert(w1.values.forall { case (_, inh, ns) => !inh && ns == 0L })

    // wave 2: doc 50 is a near-dup (identical text) of published doc
    // 100 — a SMALLER id, so the one-shot law would re-hash the merged
    // cluster under representative 50; the router must inherit 100's
    // published split instead, and 100's row must stay byte-identical
    Seq((50L, "the quick brown fox jumps over the lazy dog"),
        (400L, "yet another fresh document nothing like the others"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("append").json(landing.toString)
    runOnce()
    val w2 = assignments()
    assert(w2(100L) == w1(100L), "published assignment flipped")
    assert(w2(50L)._1 == w1(100L)._1, "near-dup must inherit the split")
    assert(w2(50L)._2, "inheritance must be flagged")
    assert(w2(50L)._3 == 1L)
    assert(!w2(400L)._2 && w2(400L)._3 == 0L)
    assert(w2.size == 5)

    // replay: nothing new to read -> committed state unchanged
    runOnce()
    assert(assignments() == w2)

    // the signature store kept every doc (dropped-or-kept signatures
    // both land), so future waves can recognize near-dups of ANY of them
    val sigDDL = "doc_id BIGINT, sig ARRAY<BIGINT>"
    assert(wh.read("sig_store", StructType.fromDDL(sigDDL))
      .select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(50L, 100L, 200L, 300L, 400L))
  }
}
