package graft.llm

import graft.SparkSpec
import graft.etl.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end corpus maintenance: documents arrive in daily batches; each
  * batch is deduplicated INCREMENTALLY against a warehouse-held signature
  * store (only the batch is hashed — the production shape at corpus
  * scale), survivors and signatures are appended, and the maintained
  * corpus must equal a one-shot dedup of everything.
  *
  * Three invariants make the equivalence hold, all exercised here:
  *  - the store keeps signatures of DROPPED documents too (a later
  *    arrival may match a dropped doc and must still be recognized as a
  *    duplicate of that doc's cluster);
  *  - doc ids increase with arrival order, so "keep the minimum id of a
  *    cluster" and "keep the earliest arrival" agree;
  *  - no LATE BRIDGE: append-only maintenance never revisits a kept doc,
  *    so if a later arrival connects two previously-separate old
  *    clusters, a one-shot dedup would retroactively drop one old
  *    survivor while the maintained corpus keeps both. That divergence
  *    is inherent to every append-only dedup (the maintained corpus is
  *    the sequential-greedy solution, not the global min-id one); the
  *    test corpus therefore keeps near-dup groups vocabulary-disjoint.
  */
class CorpusMaintenanceSpec extends SparkSpec {

  import spark.implicits._

  private val corpusSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))
  private val sigSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig", ArrayType(LongType, containsNull = false))))

  private def mkCorpus: DataFrame = (0 until 60).map { i =>
    val g = i / 3
    // group-private vocabulary: near-dups only WITHIN a group, so no late
    // arrival can bridge two earlier clusters (see the class doc)
    val base = (0 until 14).map(j => s"tok${g}x$j").mkString(" ")
    (i.toLong,
      if (i % 3 == 2) s"$base tail$g edited" else s"$base tail$g common")
  }.toDF("doc_id", "text")

  private def candidates(docs: DataFrame): DataFrame =
    Dedup.minhashCandidates(docs, numHashes = 32, bands = 8, k = 3,
      threshold = 0.3)

  test("daily incremental dedup against the store equals one-shot dedup of everything") {
    val wh = new Warehouse(spark, tmpDir("whcorpus").toString)
    val corpus = mkCorpus
    // groups of 3 near-identical docs; day boundaries split groups 6 and
    // 13 across days, so cross-day duplicates MUST flow through the store
    val days = Seq(0L until 20L, 20L until 40L, 40L until 60L)

    days.foreach { day =>
      val batch = corpus.filter(col("doc_id") >= day.start && col("doc_id") < day.end)
      val edges =
        if (!wh.exists("sig_store")) candidates(batch)
        else Dedup.incrementalMinhashCandidates(
          wh.read("sig_store", sigSchema), batch,
          numHashes = 32, bands = 8, k = 3, threshold = 0.3)
      wh.append("corpus", Dedup.dedupCorpus(batch, edges))
      // ALL of the batch's signatures enter the store — dropped docs too
      wh.append("sig_store", Dedup.minhashTable(batch, numHashes = 32, k = 3))
    }

    val maintained = wh.read("corpus", corpusSchema)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val oneShot = Dedup.dedupCorpus(corpus, candidates(corpus))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(maintained == oneShot)
    // sanity: dedup actually dropped cross-day duplicates (group of 3 ->
    // one survivor when the whole group collides)
    assert(maintained.size < 60 && maintained.size >= 20)
    assert(wh.read("sig_store", sigSchema).count() == 60) // every doc's sig kept
  }

  test("compaction retracts greedy keeps after a cluster-bridging late arrival") {
    import spark.implicits._
    val wh = new Warehouse(spark, tmpDir("whcompact").toString)
    // A (id 0) and B (id 10) share no vocabulary; C (id 20) is A's block
    // followed by B's block, so C bridges the two singleton clusters
    val aText = (0 until 12).map(j => s"brx$j").mkString(" ") + " aa tail"
    val bText = (0 until 12).map(j => s"bry$j").mkString(" ") + " bb tail"
    val day1 = Seq((0L, aText), (10L, bText)).toDF("doc_id", "text")
    // C contains BOTH documents verbatim: Jaccard(A,C) = Jaccard(B,C)
    // ~ 0.46, Jaccard(A,B) = 0 — a genuine bridge. 32 bands of 1 row so
    // LSH recall at that similarity is certain.
    val day2 = Seq((20L, s"$aText $bText")).toDF("doc_id", "text")
    val all = day1.unionByName(day2)
    val thr = 0.25
    val nBands = 32

    Seq(day1, day2).foreach { batch =>
      val sigs = Dedup.minhashTable(batch, numHashes = 32, k = 3)
      val edges =
        if (!wh.exists("sig_store"))
          Dedup.minhashCandidatesFromSigs(sigs, numHashes = 32, bands = nBands,
            threshold = thr)
        else Dedup.incrementalMinhashCandidatesFromSigs(
          wh.read("sig_store", sigSchema), sigs, numHashes = 32, bands = nBands,
          threshold = thr)
      wh.append("corpus", Dedup.dedupCorpus(batch, edges))
      wh.append("sig_store", sigs)
    }
    def corpusIds = wh.read("corpus", corpusSchema)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // greedy kept both A and B (they never compared) and dropped C;
    // one-shot dedup of everything keeps only the bridged cluster's
    // minimum — the documented append-only divergence
    val oneShot = Dedup.dedupCorpus(all,
        Dedup.minhashCandidates(all, numHashes = 32, bands = nBands, k = 3,
          threshold = thr))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(corpusIds == Set(0L, 10L))
    assert(oneShot == Set(0L))
    assert(corpusIds != oneShot)

    // compaction reclusters from STORED signatures only and closes the gap
    CorpusMaintenance.compact(spark, wh, numHashes = 32, bands = nBands,
      threshold = thr)
    assert(corpusIds == oneShot)
    // the store keeps every doc's signature through compaction — later
    // arrivals must still recognize dropped docs' clusters
    assert(wh.read("sig_store", sigSchema).count() == 3)
    // idempotent: a second compaction (e.g. re-run after a crash between
    // the two table flips) changes nothing
    CorpusMaintenance.compact(spark, wh, numHashes = 32, bands = nBands,
      threshold = thr)
    assert(corpusIds == oneShot)
    assert(wh.read("sig_store", sigSchema).count() == 3)
  }
}
