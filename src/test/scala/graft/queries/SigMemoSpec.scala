package graft.queries

import graft.SparkSpec

/** Pins the shared-signature-store memo's per-session keying.
  *
  * A DataFrame is bound to the SparkSession that built it, so a memo
  * keyed by directory alone would keep handing out frames from the
  * FIRST session that ever touched a dir — including after that session
  * is stopped in a long-lived JVM that cycles sessions. The memo keys by
  * (session, dir); this spec drives two sequential sessions over the
  * same dir and asserts each gets a frame bound to itself.
  */
class SigMemoSpec extends SparkSpec {

  private def writeDocs(): String = {
    val dir = tmpDir("sigmemo")
    import spark.implicits._
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "one two three four five six seven"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir.toString
  }

  test("two sequential sessions each get a frame bound to themselves") {
    val dir = writeDocs()
    TestdataQueries.setSharedStagesForTest(true)
    try {
      val s1 = spark.newSession()
      val s2 = spark.newSession()
      val df1 = TestdataQueries.portableSigsForTest(s1, dir)
      val df2 = TestdataQueries.portableSigsForTest(s2, dir)
      assert(df1.sparkSession eq s1,
        "session 1 must receive a frame built by itself")
      assert(df2.sparkSession eq s2,
        "session 2 must NOT receive session 1's cached frame")
      // memo hit: same session + dir returns the identical cached frame
      assert(TestdataQueries.portableSigsForTest(s1, dir) eq df1)
      // and the frames still compute (persisted, same contents)
      assert(df1.count() == df2.count() && df1.count() > 0)
    } finally {
      TestdataQueries.setSharedStagesForTest(false)
      // the memo persisted store frames on the JVM-wide shared session;
      // drop them so later suites' plan-shape assertions never inspect
      // an InMemoryTableScan where they expect the real parquet pipeline
      spark.catalog.clearCache()
    }
  }

  // Every store consumer must produce bit-identical results with shared
  // stages on and off — the driver's oracle only ever sees the isolated
  // plan, so any shared-path divergence would ship unverified.
  private def pinSharedEqualsIsolated(query: String, why: String): Unit =
    test(s"$query over its shared store equals the isolated plan") {
      val dir = "/root/testdata/sf0.001"
      assume(new java.io.File(dir).isDirectory, s"$dir not present")
      // sorted multiset, not a Set: a duplicated row in one path must
      // fail the pin (the driver's hash-compare sees multiplicity too)
      def rows() = TestdataQueries.all(query)(spark, dir)
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
      val isolated = rows()
      TestdataQueries.setSharedStagesForTest(true)
      try {
        assert(rows() == isolated, why)
        assert(isolated.nonEmpty)
      } finally {
        TestdataQueries.setSharedStagesForTest(false)
        spark.catalog.clearCache()
      }
    }

  pinSharedEqualsIsolated("q97_entity_clusters",
    "restricting the full-table ER pairs to the id prefix must equal " +
      "running the fuzzy join on the subset directly")
  pinSharedEqualsIsolated("q114_golden_records",
    "survivorship over the shared ER pair store (restricted to the id " +
      "prefix, then stem-blocked) must equal the direct subset fuzzy join")
  pinSharedEqualsIsolated("q145_funnel_latency",
    "latency percentiles over the shared funnel step-times table must " +
      "equal the per-query funnel derivation")
  pinSharedEqualsIsolated("q133_ab_readout",
    "the experiment 2x2 table over the shared funnel step-times table " +
      "must equal the per-query funnel derivation")
  pinSharedEqualsIsolated("q146_weighted_paths",
    "SPFA over the shared co-purchase pair table must equal the " +
      "per-query pair enumeration")
  pinSharedEqualsIsolated("q60_simhash_verified",
    "pairing against the resident simhash fingerprint store must equal " +
      "re-deriving the fingerprints from the corpus")
  pinSharedEqualsIsolated("q63_incremental_dedup",
    "slicing the resident signature store to the existing corpus must " +
      "equal deriving the store slice from scratch")
  pinSharedEqualsIsolated("q53_dup_clusters",
    "components over the shared candidate-pair store must equal " +
      "re-banding the signature store per query")
  pinSharedEqualsIsolated("q58_dedup_corpus",
    "corpus dedup over the shared candidate-pair store must equal " +
      "re-banding the signature store per query")
  pinSharedEqualsIsolated("q59_lsh_verified",
    "exact verification over the shared candidate-pair store must " +
      "equal re-banding the signature store per query")
  pinSharedEqualsIsolated("q79_jaccard_join",
    "the landed exact-pair table must equal running the prefix-filtered " +
      "PPJoin directly")
  pinSharedEqualsIsolated("q152_lsh_quality",
    "the precision/recall counts over the two landed pair stores must " +
      "equal deriving both pair sets from the corpus")
  pinSharedEqualsIsolated("q44_minhash_portable",
    "the landed candidate-pair table must equal banding the signature " +
      "store directly")
  pinSharedEqualsIsolated("q45_simhash_portable",
    "blocking over the resident fingerprint store must equal " +
      "re-fingerprinting the corpus")
  pinSharedEqualsIsolated("q96_fuzzy_join",
    "the landed ER pair table must equal running the deletion-blocked " +
      "edit-distance self-join directly")
  pinSharedEqualsIsolated("q93_bm25",
    "the landed BM25 ranking table must equal running retrieval directly")
  pinSharedEqualsIsolated("q99_hybrid_rrf",
    "fusion over the landed BM25 ranking table must equal re-running " +
      "retrieval inside the fusion query")
  pinSharedEqualsIsolated("q73_kmeans",
    "assignment against the landed centroid model must equal training " +
      "inside the query")
  pinSharedEqualsIsolated("q74_semdedup",
    "SemDeDup over the landed centroid model must equal training " +
      "inside the query")
  pinSharedEqualsIsolated("q153_banding_sweep",
    "the tuning curve over the landed sig + exact-pair stores must " +
      "equal deriving both from the corpus")
  pinSharedEqualsIsolated("q154_dup_source_matrix",
    "the source matrix over the landed candidate-pair store must " +
      "equal re-banding the signature store")
  pinSharedEqualsIsolated("q156_leak_safe_split",
    "split assignment over the landed candidate-pair store must " +
      "equal re-banding the signature store per query")
  pinSharedEqualsIsolated("q157_canonical_docs",
    "keep-best selection over the landed candidate-pair store must " +
      "equal re-banding the signature store per query")
  pinSharedEqualsIsolated("q160_dedup_savings",
    "the per-source savings report over the landed candidate-pair " +
      "store must equal re-banding the signature store per query")
  pinSharedEqualsIsolated("q161_cluster_sizes",
    "the cluster-size histogram over the landed candidate-pair store " +
      "must equal re-banding the signature store per query")
  pinSharedEqualsIsolated("q176_naive_bayes",
    "the landed NB scored store must equal scoring inside the query")
  pinSharedEqualsIsolated("q180_calibration",
    "calibration over the landed NB scored store must equal re-running " +
      "the scoring chain inside the query")
  pinSharedEqualsIsolated("q94_bigram_lm",
    "the landed LM scored store must equal scoring inside the query")
  pinSharedEqualsIsolated("q167_ccnet_buckets",
    "per-language cuts over the landed LM scored store must equal " +
      "re-scoring the corpus inside the query")
  pinSharedEqualsIsolated("q129_bpe_merges",
    "the landed BPE merge table must equal training inside the query")
  pinSharedEqualsIsolated("q166_bpe_encode",
    "encoding with the landed merge table must equal train-then-encode " +
      "inside the query")
  pinSharedEqualsIsolated("q170_fertility",
    "fertility under the landed merge table must equal train-then-audit " +
      "inside the query")
  pinSharedEqualsIsolated("q173_winnow",
    "the landed fingerprint table must equal winnowing inside the query")
  pinSharedEqualsIsolated("q181_winnow_matches",
    "matching over the landed fingerprint store must equal re-winnowing " +
      "both sides inside the query")
  pinSharedEqualsIsolated("q163_incremental_split",
    "split inheritance over the landed per-batch candidate table must " +
      "equal re-hashing the batch inside the query")
  pinSharedEqualsIsolated("q165_legacy_store_conflicts",
    "conflict surfacing over the landed per-batch candidate table must " +
      "equal re-hashing the batch inside the query")
  pinSharedEqualsIsolated("q168_dsir",
    "the rank cut over the landed DSIR weight table must equal " +
      "featurizing and scoring inside the query")
  pinSharedEqualsIsolated("q137_rfm",
    "binning over the landed per-user metrics table must equal " +
      "rebuilding the metrics from events inside the query")
  pinSharedEqualsIsolated("q185_moore_lewis",
    "the delta over the two landed per-model LM score tables must " +
      "equal re-scoring the candidates inside the query")
  pinSharedEqualsIsolated("q194_kneser_ney",
    "the landed Kneser-Ney scored store must equal scoring inside " +
      "the query")
  pinSharedEqualsIsolated("q183_stupid_backoff",
    "the landed Stupid Backoff scored store must equal scoring inside " +
      "the query")
  pinSharedEqualsIsolated("q103_tfidf_join",
    "the landed tf-idf cosine pair table must equal running the " +
      "similarity join inside the query")
  pinSharedEqualsIsolated("q69_tfidf_terms",
    "the landed keyword table must equal ranking tf-idf terms inside " +
      "the query")
}
