package graft.stream

import graft.SparkSpec
import graft.etl.Warehouse
import graft.llm.TextAnalysis
import org.apache.spark.sql.functions._

/** Streaming inverted-index maintenance end-to-end: a real file-source
  * stream in waves through one checkpoint, asserting the mergeable-
  * summary law — the maintained index equals the ONE-SHOT index of
  * everything ever streamed, df and posting arrays included — plus the
  * replay no-op and the posting-cap geometry guard. */
class StreamingIndexSpec extends SparkSpec {
  import spark.implicits._

  private def collected(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2).toList))
      .toSet

  test("the maintained index equals the one-shot index of every wave, " +
    "posting arrays included") {
    val landing = tmpDir("idxland")
    val wh = new Warehouse(spark, tmpDir("whidx").toString)
    val ckpt = tmpDir("ckptidx").toString
    val idx = new StreamingIndex(spark, wh, landing.toString, ckpt,
      maxPostings = 3)
    def runOnce(): Unit =
      idx.start(availableNow = true).awaitTermination()

    // interleaved doc ids across waves so min-k merging is exercised:
    // "shared" appears in docs 2, 9 (wave 1) and 1, 5 (wave 2) — the
    // capped posting list of the merged index must be [1, 2, 5], which
    // neither wave's own top-3 equals
    val wave1 = Seq(
      (2L, "shared alpha beta"),
      (9L, "shared gamma"),
      (4L, "alpha delta"))
    val wave2 = Seq(
      (1L, "shared epsilon"),
      (5L, "shared zeta alpha"),
      (7L, "eta theta"))
    wave1.toDF("doc_id", "text")
      .coalesce(1).write.mode("append").json(landing.toString)
    runOnce()
    wave2.toDF("doc_id", "text")
      .coalesce(1).write.mode("append").json(landing.toString)
    runOnce()

    val oneShot = TextAnalysis.invertedIndex(
      (wave1 ++ wave2).toDF("doc_id", "text"), minDf = 1, maxPostings = 3)
    assert(collected(idx.index()) == collected(oneShot))
    assert(collected(idx.index()).exists {
      case ("shared", df, ps) => df == 4L && ps == List(1L, 2L, 5L)
      case _ => false
    }, collected(idx.index()))
    // df floor applies at read time without losing merge history
    assert(collected(idx.index(minDf = 2)) ==
      collected(oneShot.filter(col("df") >= 2)))
  }

  test("a replayed batch adds nothing twice") {
    val landing = tmpDir("idxreplayland")
    val wh = new Warehouse(spark, tmpDir("whidxreplay").toString)
    val ckpt = tmpDir("ckptidxreplay").toString
    val idx = new StreamingIndex(spark, wh, landing.toString, ckpt)
    val batch = Seq((1L, "alpha beta"), (2L, "alpha")).toDF("doc_id", "text")
    idx.processBatch(batch, batchId = 0L)
    val first = collected(idx.index())
    idx.processBatch(batch, batchId = 0L) // redelivery of the same batch
    assert(collected(idx.index()) == first,
      "df addition must short-circuit on the commit record")
    assert(first.exists { case ("alpha", df, _) => df == 2L; case _ => false })
  }

  test("a wiped checkpoint REFUSES instead of double-counting: df " +
    "addition cannot heal a re-read") {
    val landing = tmpDir("idxwipeland")
    val wh = new Warehouse(spark, tmpDir("whidxwipe").toString)
    val ckpt = tmpDir("ckptidxwipe").toString
    val idx = new StreamingIndex(spark, wh, landing.toString, ckpt)
    idx.processBatch(Seq((1L, "alpha")).toDF("doc_id", "text"), batchId = 0L)
    val before = collected(idx.index())
    // operator wipes the checkpoint: the incarnation marker goes with it
    // and batch ids restart at 0 — the keyed sinks heal such a re-read,
    // but an additive merge would re-add history; the frame must refuse
    val marker = java.nio.file.Paths.get(ckpt, "_graft_stream_identity")
    java.nio.file.Files.delete(marker)
    val e = intercept[IllegalArgumentException] {
      idx.processBatch(Seq((1L, "alpha")).toDF("doc_id", "text"),
        batchId = 0L)
    }
    assert(e.getMessage.contains("double-count"), e.getMessage)
    assert(collected(idx.index()) == before,
      "the refused batch must publish nothing")
  }

  test("a store capped wider than the stream's maxPostings fails loudly") {
    val landing = tmpDir("idxcapland")
    val wh = new Warehouse(spark, tmpDir("whidxcap").toString)
    val wide = new StreamingIndex(spark, wh, landing.toString,
      tmpDir("ckptidxw").toString, maxPostings = 4)
    wide.processBatch(
      Seq((1L, "t"), (2L, "t"), (3L, "t"), (4L, "t")).toDF("doc_id", "text"),
      batchId = 0L)
    val narrow = new StreamingIndex(spark, wh, landing.toString,
      tmpDir("ckptidxn").toString, maxPostings = 2)
    val e = intercept[IllegalArgumentException] {
      narrow.processBatch(Seq((5L, "t")).toDF("doc_id", "text"), batchId = 0L)
    }
    assert(e.getMessage.contains("posting list"), e.getMessage)
  }

  test("resetAdditiveSink unblocks a wiped-checkpoint incarnation: table " +
    "AND stale commit rows clear in one transaction") {
    val landing = tmpDir("idxresetland")
    val wh = new Warehouse(spark, tmpDir("whidxreset").toString)
    val ckpt = tmpDir("ckptidxreset").toString
    val idx = new StreamingIndex(spark, wh, landing.toString, ckpt)
    idx.processBatch(Seq((1L, "alpha beta")).toDF("doc_id", "text"), 0L)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(ckpt, "_graft_stream_identity"))
    intercept[IllegalArgumentException] {
      idx.processBatch(Seq((1L, "alpha beta")).toDF("doc_id", "text"), 0L)
    }
    // a bare table wipe is NOT enough: stale commit rows keyed on the
    // old incarnation keep refusing (the ADVICE dead-end) — the helper
    // clears the postings, the ever-seen doc-id table, and the commit
    // rows in one transaction, including the CURRENT incarnation's
    // high-water, so batch 0 re-processes instead of no-oping (or
    // being refused by the ever-seen check)
    StreamingIndex.reset(wh, ckpt)
    idx.processBatch(Seq((1L, "alpha beta")).toDF("doc_id", "text"), 0L)
    val rebuilt = collected(idx.index())
    assert(rebuilt == collected(TextAnalysis.invertedIndex(
      Seq((1L, "alpha beta")).toDF("doc_id", "text"), minDf = 1,
      maxPostings = 10)), rebuilt)
  }

  test("resetAdditiveSink with a differently-spelled checkpoint path " +
    "(trailing slash, relative segments) still clears the commit rows") {
    val landing = tmpDir("idxresetnland")
    val wh = new Warehouse(spark, tmpDir("whidxresetn").toString)
    val ckpt = tmpDir("ckptidxresetn").toString
    val idx = new StreamingIndex(spark, wh, landing.toString, ckpt)
    idx.processBatch(Seq((1L, "alpha beta")).toDF("doc_id", "text"), 0L)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(ckpt, "_graft_stream_identity"))
    intercept[IllegalArgumentException] {
      idx.processBatch(Seq((1L, "alpha beta")).toDF("doc_id", "text"), 0L)
    }
    // the ADVICE failure mode: a path spelled differently from what the
    // sink used would wipe the table yet delete ZERO commit rows,
    // leaving the refusal in place with the data already gone —
    // canonicalization makes `dir/` and `dir/./` the same stream
    StreamingIndex.reset(wh, ckpt + "/./")
    idx.processBatch(Seq((1L, "alpha beta")).toDF("doc_id", "text"), 0L)
    val rebuilt = collected(idx.index())
    assert(rebuilt == collected(TextAnalysis.invertedIndex(
      Seq((1L, "alpha beta")).toDF("doc_id", "text"), minDf = 1,
      maxPostings = 10)), rebuilt)
  }

  test("a re-delivered doc_id in a later committed batch fails the merge " +
    "loudly instead of silently double-counting df") {
    val landing = tmpDir("idxdupland")
    val wh = new Warehouse(spark, tmpDir("whidxdup").toString)
    val idx = new StreamingIndex(spark, wh, landing.toString,
      tmpDir("ckptidxdup").toString, maxPostings = 2)
    // doc 1 re-delivered in a LATER (new-batch-id) batch — the commit
    // guard cannot see it, and additive df cannot heal it; the exact
    // ever-seen check must refuse the batch before the merge rather
    // than publish a double-counted df
    idx.processBatch(Seq((1L, "t"), (3L, "t")).toDF("doc_id", "text"), 0L)
    val e = intercept[Exception] {
      idx.processBatch(Seq((1L, "t")).toDF("doc_id", "text"), 1L)
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("already indexed")), e.toString)
    // the refused batch published NOTHING — the committed wave-0 index
    // is intact (the transaction rolled back, df not double-counted)
    val row = collected(idx.index()).find(_._1 == "t").get
    assert(row._2 == 2L && row._3 == List(1L, 3L), row)
  }

  test("the same doc in two files of ONE micro-batch counts df once") {
    val landing = tmpDir("idxdup1land")
    val wh = new Warehouse(spark, tmpDir("whidxdup1").toString)
    val idx = new StreamingIndex(spark, wh, landing.toString,
      tmpDir("ckptidxdup1").toString)
    // within-batch duplication is invisible to the commit guard AND to
    // the cross-batch duplicate check — the sink must collapse it
    idx.processBatch(
      Seq((1L, "alpha"), (1L, "alpha"), (2L, "alpha"))
        .toDF("doc_id", "text"), 0L)
    val row = collected(idx.index()).find(_._1 == "alpha").get
    assert(row._2 == 2L && row._3 == List(1L, 2L), row)
  }

  test("a re-delivered doc_id CAPPED OUT of the stored posting list still " +
    "fails loudly: the ever-seen table has no detection floor") {
    val landing = tmpDir("idxfloorland")
    val wh = new Warehouse(spark, tmpDir("whidxfloor").toString)
    val idx = new StreamingIndex(spark, wh, landing.toString,
      tmpDir("ckptidxfloor").toString, maxPostings = 1)
    // doc 3 is capped OUT of the stored 1-slot posting list, so the
    // in-merge duplicate check alone could never see its re-delivery —
    // the round-11 documented residual. The exact ever-seen check
    // closes it: the later committed batch is refused loudly and the
    // committed index stays intact (df NOT double-counted).
    idx.processBatch(Seq((1L, "t"), (3L, "t")).toDF("doc_id", "text"), 0L)
    val e = intercept[IllegalStateException] {
      idx.processBatch(Seq((3L, "t")).toDF("doc_id", "text"), 1L)
    }
    assert(e.getMessage.contains("already indexed"), e.getMessage)
    val row = collected(idx.index()).find(_._1 == "t").get
    assert(row._2 == 2L && row._3 == List(1L), row)
  }
}
