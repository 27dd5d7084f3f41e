package graft.stream

import graft.SparkSpec
import graft.etl.Warehouse
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The streaming leak-safe router end-to-end: a real file-source stream
  * in waves through one checkpoint, asserting the assignment-stability
  * law that the one-shot split cannot give — a later near-dup (even a
  * SMALLER id, which would re-hash the one-shot cluster under a new
  * representative) inherits the published split, published rows are
  * immutable across batches and replays, shingle-less docs route by
  * content so identical short docs can never straddle, and the
  * cross-split conflict flag is sticky across batches. */
class StreamingSplitRouterSpec extends SparkSpec {
  import spark.implicits._

  private val assignDDL =
    "doc_id BIGINT, cluster_id BIGINT, split STRING, " +
      "inherited BOOLEAN, n_store_splits BIGINT, conflicted BOOLEAN"

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
        ((r.getString(2), r.getBoolean(3), r.getLong(4), r.getBoolean(5))))
      .toMap

    // wave 1: three unrelated docs plus one too short to shingle
    Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (200L, "completely different content about spark engines"),
      (300L, "a third unrelated document with its own words"),
      (900L, "tiny  Doc"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("append").json(landing.toString)
    runOnce()
    val w1 = assignments()
    assert(w1.keySet == Set(100L, 200L, 300L, 900L))
    assert(w1.values.forall { case (_, inh, ns, c) =>
      !inh && ns == 0L && !c })

    // wave 2: doc 50 is a near-dup (identical text) of published doc
    // 100 — a SMALLER id, so the one-shot law would re-hash the merged
    // cluster under representative 50; the router must inherit 100's
    // published split instead, and 100's row must stay byte-identical.
    // Doc 901 is byte-identical (mod case/whitespace) to short doc 900:
    // no signature can ever pair them, so the content law must agree.
    Seq((50L, "the quick brown fox jumps over the lazy dog"),
        (400L, "yet another fresh document nothing like the others"),
        (901L, "TINY doc"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("append").json(landing.toString)
    runOnce()
    val w2 = assignments()
    assert(w2(100L) == w1(100L), "published assignment flipped")
    assert(w2(50L)._1 == w1(100L)._1, "near-dup must inherit the split")
    assert(w2(50L)._2, "inheritance must be flagged")
    assert(w2(50L)._3 == 1L && !w2(50L)._4)
    assert(!w2(400L)._2 && w2(400L)._3 == 0L)
    assert(w2(901L)._1 == w1(900L)._1,
      "identical short docs must share a split without any store")
    assert(w2.size == 7)

    // replay: nothing new to read -> committed state unchanged
    runOnce()
    assert(assignments() == w2)

    // the signature store kept every SHINGLED doc (dropped-or-kept both
    // land; short docs carry no signature by construction)
    val sigDDL = "doc_id BIGINT, sig ARRAY<BIGINT>"
    assert(wh.read("sig_store", StructType.fromDDL(sigDDL))
      .select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(50L, 100L, 200L, 300L, 400L))
  }

  test("cross-split merges flag their whole membership and the flag " +
    "sticks for later arrivals") {
    val landing = tmpDir("confland")
    val wh = new Warehouse(spark, tmpDir("whconf").toString)
    val ckpt = tmpDir("ckptconf").toString
    // cuts chosen so the two seed docs land in DIFFERENT splits: md5
    // bucket of 1 is 47, of 8 is 93 (precomputed) -> cut at 50
    // separates them. The bridge shares only ~1/3 of its shingles with
    // each seed, so this router instance bands at rowsPerBand = 1
    // (bands = 32: any matching signature position collides) with a
    // 0.2 screen — the standard loose-banding operating point for
    // catching partial-overlap bridges.
    val router = new StreamingSplitRouter(spark, wh, landing.toString,
      ckpt, cuts = Seq("train" -> 50), lastSplit = "test",
      bands = 32, threshold = 0.2)
    def runOnce(): Unit =
      router.start(availableNow = true).awaitTermination()
    def assignments() = wh.read("split_assign",
        StructType.fromDDL(assignDDL))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), r.getBoolean(3), r.getLong(4), r.getBoolean(5))))
      .toMap

    // wave 1: two unrelated docs -> different splits (asserted, not
    // assumed: the scenario needs a real boundary)
    Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
        (8L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("append").json(landing.toString)
    runOnce()
    val w1 = assignments()
    assert(w1(1L)._1 != w1(8L)._1,
      s"fixture broke: seeds must straddle, got $w1")

    // wave 2: a bridge doc near BOTH seeds (first 8 tokens of each,
    // true Jaccard 6/18 = 1/3 to either side) -> flagged, and the whole
    // membership recorded
    Seq((20L, "alpha beta gamma delta epsilon zeta eta theta " +
        "one two three four five six seven eight"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("append").json(landing.toString)
    runOnce()
    val w2 = assignments()
    assert(w2(20L)._4, "bridge must be flagged conflicted")
    assert(w2(20L)._3 == 2L)
    val conflictMembers = wh.read("split_conflicts",
        StructType.fromDDL("doc_id BIGINT"))
      .collect().map(_.getLong(0)).toSet
    assert(conflictMembers == Set(1L, 8L, 20L))

    // wave 3: an identical copy of seed 8 — whatever subset of
    // {8, bridge} it candidates against, its cluster is compromised and
    // the recorded membership must flag it; without stickiness a copy
    // pairing only with 8 (one stored split) sails through unflagged
    Seq((30L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("append").json(landing.toString)
    runOnce()
    val w3 = assignments()
    assert(w3(30L)._1 == w1(8L)._1, "still inherits 8's split")
    assert(w3(30L)._4, "conflict flag must stick to later arrivals")
    // and 30 itself joins the recorded membership for future waves
    assert(wh.read("split_conflicts", StructType.fromDDL("doc_id BIGINT"))
      .collect().map(_.getLong(0)).toSet == Set(1L, 8L, 20L, 30L))
  }

  test("conflict membership closes over the assignment store: an " +
    "earlier-batch inheritor with no edge this batch is still recorded") {
    val landing = tmpDir("closland")
    val wh = new Warehouse(spark, tmpDir("whclos").toString)
    val ckpt = tmpDir("ckptclos").toString
    val router = new StreamingSplitRouter(spark, wh, landing.toString,
      ckpt, cuts = Seq("train" -> 50), lastSplit = "test",
      bands = 32, threshold = 0.2)
    def runOnce(): Unit =
      router.start(availableNow = true).awaitTermination()

    // wave 1: the two straddling seeds
    Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
        (8L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("append").json(landing.toString)
    runOnce()
    // doc 40 inherited seed 1's split in some EARLIER incarnation whose
    // signature never landed (the LSH-miss / lost-sig case the closure
    // exists for): seed its assignment row directly — no signature, so
    // no future edge can ever reach it; only the store walk can
    val seeded = spark.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(40L, 1L, "train", true, 1L, false)),
      StructType.fromDDL(assignDDL))
    wh.appendIfAbsent("split_assign", StructType.fromDDL(assignDDL),
      seeded, keys = Seq("doc_id"), orderCol = "doc_id",
      dedupWithinBatch = false)

    // wave 2: the bridge flags component {1, 8, 20}; the closure over
    // split_assign must pull doc 40 in through its cluster_id = 1 link
    Seq((20L, "alpha beta gamma delta epsilon zeta eta theta " +
        "one two three four five six seven eight"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("append").json(landing.toString)
    runOnce()
    assert(wh.read("split_conflicts", StructType.fromDDL("doc_id BIGINT"))
      .collect().map(_.getLong(0)).toSet == Set(1L, 8L, 20L, 40L),
      "the store-closure must record the edgeless earlier inheritor")
  }

  test("a wiped checkpoint is a NEW stream identity: fresh batches are " +
    "not no-oped by the old high-water mark") {
    val landing = tmpDir("wipeland")
    val wh = new Warehouse(spark, tmpDir("whwipe").toString)
    val ckpt = tmpDir("ckptwipe")
    def route(): Unit =
      new StreamingSplitRouter(spark, wh, landing.toString,
        ckpt.toString, cuts = Seq("train" -> 80, "validation" -> 90),
        lastSplit = "test")
        .start(availableNow = true).awaitTermination()
    Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("append").json(landing.toString)
    route()
    def routed() = wh.read("split_assign", StructType.fromDDL(assignDDL))
      .collect().map(_.getLong(0)).toSet
    assert(routed() == Set(100L))
    // operator wipes the checkpoint (corruption recovery): batch ids
    // restart at 0 — identity-by-path alone would read the old
    // high-water mark and silently no-op the fresh data
    def rm(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    rm(ckpt)
    Seq((200L, "completely different content about spark engines"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("append").json(landing.toString)
    route()
    // the new incarnation re-reads everything (fresh file-source
    // offsets); replayed doc 100 heals via append-if-absent, NEW doc
    // 200 must land — before the identity marker it was silently lost
    assert(routed() == Set(100L, 200L))
  }

  test("the width guard catches a MIXED-width store and null sigs, not " +
    "just a lucky sampled row") {
    import org.apache.spark.sql.types.StructType
    val wh = new Warehouse(spark, tmpDir("whmixw").toString)
    val sigSchema = StructType.fromDDL("doc_id BIGINT, sig ARRAY<BIGINT>")
    // a store that became width-mixed BEFORE the guard existed: one row
    // matches numHashes=2, one does not — a single-row sample can pass
    wh.replace("sig_store", Seq(
      (1L, Seq(11L, 12L)), (2L, Seq(21L, 22L, 23L))).toDF("doc_id", "sig"))
    val e = intercept[IllegalArgumentException] {
      StreamCommits.requireSigWidth(wh, "sig_store", sigSchema, 2, "test")
    }
    assert(e.getMessage.contains("mixed 2..3"), e.getMessage)
    // null sig rows get their own message, not a confusing width
    wh.replace("sig_store",
      Seq((1L, Seq(11L, 12L))).toDF("doc_id", "sig")
        .unionByName(Seq(3L).toDF("doc_id")
          .selectExpr("doc_id", "CAST(NULL AS ARRAY<BIGINT>) AS sig")))
    val e2 = intercept[IllegalArgumentException] {
      StreamCommits.requireSigWidth(wh, "sig_store", sigSchema, 2, "test")
    }
    assert(e2.getMessage.contains("null-signature"), e2.getMessage)
    // a uniform store at the right width passes
    wh.replace("sig_store", Seq(
      (1L, Seq(11L, 12L)), (2L, Seq(21L, 22L))).toDF("doc_id", "sig"))
    StreamCommits.requireSigWidth(wh, "sig_store", sigSchema, 2, "test")
  }

  test("the verified width persists as a generation marker: a second " +
    "warehouse instance validates O(1), a mismatch refuses from the " +
    "marker, appends carry it, a replace invalidates it") {
    import org.apache.spark.sql.types.StructType
    val whRoot = tmpDir("whmark").toString
    val wh = new Warehouse(spark, whRoot)
    val sigSchema = StructType.fromDDL("doc_id BIGINT, sig ARRAY<BIGINT>")
    wh.replace("sig_store", Seq((1L, Seq(11L, 12L))).toDF("doc_id", "sig"))
    val g1 = new StreamCommits.SigWidthGuard("sig_store", sigSchema, 2, "g1")
    g1.check(wh)
    assert(g1.fullScans == 1, "marker-less store pays ONE scan")
    g1.check(wh)
    assert(g1.fullScans == 1, "marker present: the per-batch check is O(1)")
    // a SECOND Warehouse instance over the same store — the cross-JVM
    // shape the round-11 induction argument could not cover — validates
    // without any O(store) scan
    val wh2 = new Warehouse(spark, whRoot)
    val g2 = new StreamCommits.SigWidthGuard("sig_store", sigSchema, 2, "g2")
    g2.check(wh2)
    assert(g2.fullScans == 0,
      "a second instance must validate from the persisted marker")
    // a mismatched width refuses from the marker alone — still no scan
    val g3 = new StreamCommits.SigWidthGuard("sig_store", sigSchema, 3, "g3")
    val e = intercept[IllegalArgumentException] { g3.check(wh2) }
    assert(e.getMessage.contains("verified 2-wide"), e.getMessage)
    assert(g3.fullScans == 0)
    // an append's linkTree carries the marker into the next generation
    wh.appendIfAbsent("sig_store", sigSchema,
      Seq((2L, Seq(21L, 22L))).toDF("doc_id", "sig"),
      keys = Seq("doc_id"), orderCol = "doc_id")
    val g4 = new StreamCommits.SigWidthGuard("sig_store", sigSchema, 2, "g4")
    g4.check(wh)
    assert(g4.fullScans == 0, "appends must not invalidate the marker")
    // a replace (the reset path) writes a FRESH generation directory:
    // the marker goes with the old contents, and the next check
    // re-verifies the new contents by scan at the new width
    wh.replace("sig_store",
      Seq((1L, Seq(31L, 32L, 33L))).toDF("doc_id", "sig"))
    val g5 = new StreamCommits.SigWidthGuard("sig_store", sigSchema, 3, "g5")
    g5.check(wh)
    assert(g5.fullScans == 1,
      "a replaced store must be re-verified by scan, not trusted")
  }

  test("the same doc in two files of ONE micro-batch lands once in " +
    "every sink") {
    val landing = tmpDir("dupland")
    val wh = new Warehouse(spark, tmpDir("whdup").toString)
    val ckpt = tmpDir("ckptdup").toString
    val router = new StreamingSplitRouter(spark, wh, landing.toString,
      ckpt, cuts = Seq("train" -> 90), lastSplit = "test")
    val doc = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    // two landing files, one availableNow pass -> one micro-batch
    doc.coalesce(1).write.mode("append").json(landing.toString)
    doc.coalesce(1).write.mode("append").json(landing.toString)
    router.start(availableNow = true).awaitTermination()
    assert(wh.read("split_assign", StructType.fromDDL(assignDDL))
      .count() == 1L, "duplicate assignment rows within one batch")
    assert(wh.read("sig_store",
      StructType.fromDDL("doc_id BIGINT, sig ARRAY<BIGINT>"))
      .count() == 1L, "duplicate signature rows within one batch")
  }
}
