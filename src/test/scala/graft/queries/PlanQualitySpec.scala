package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan assertions for the operator inventory: these lock in the
  * scale-critical plan properties (predicate pushdown to parquet, column
  * pruning, broadcast joins for dims, true top-k) so a refactor that
  * silently loses one fails the build — at 100 TB each of these is the
  * difference between touching gigabytes and touching everything.
  */
class PlanQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String = {
    val df: DataFrame = graft.SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q01: filter pushed to parquet scan, only needed columns read") {
    val p = plan("q01_scan_project")
    assert(p.contains("PushedFilters"), p)
    assert(p.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(p_size,25\\).*"), p)
    // column pruning: retailprice+partkey+name+size only, no p_brand/p_type
    assert(!p.contains("p_brand") && !p.contains("p_type"), p)
  }

  test("q02: equality + time-range predicates all pushed down") {
    val p = plan("q02_dynamic_filter")
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
    assert(p.matches("(?s).*PushedFilters.*GreaterThanOrEqual\\(l_shipdate.*"), p)
  }

  test("q03: order+limit plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q03_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q12: all three dimension joins broadcast (no shuffle of the fact side)") {
    val p = plan("q12_join_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("q09: anti join stays a join (no driver-side collect shapes)") {
    val p = plan("q09_anti_join")
    assert(p.contains("LeftAnti"), p)
  }

  test("q06: aggregation runs partial then final (map-side combine)") {
    val p = plan("q06_agg_multi")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("whole-stage codegen spans cover the scan->project paths") {
    val p = plan("q05_value_routing")
    assert(p.contains("codegen id"), p)
  }

  test("q59: LSH verification is candidates-only equi-joins, never a cross product") {
    val p = plan("q59_lsh_verified")
    // the exact-Jaccard verify stage joins candidate pairs back to
    // shingle sets on doc id — any all-pairs shape would surface as a
    // cartesian/BNLJ here and be quadratic at scale
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // candidate generation stays the one-shuffle groupBy form: the pair
    // expansion must come from Generate over grouped buckets, not a
    // bucket self-join
    assert(p.contains("Generate"), p)
  }

  test("q60: simhash verification has the same candidates-only shape") {
    val p = plan("q60_simhash_verified")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Generate"), p)
  }

  test("q164: Hamming pairing is a block-key equi-join, never all-pairs") {
    val p = plan("q164_hamming_pairs")
    // the pigeonhole LSH's whole point: candidates come from equality
    // on (block, bval) — an all-pairs shape would be quadratic in the
    // corpus and surface here as a cartesian/BNLJ
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q168: dsir corpus occurrences meet the ratio table as a broadcast, never a cartesian") {
    val p = plan("q168_dsir")
    // the whole scale story: the <=buckets-row ratio table broadcasts to
    // the per-doc occurrences; the only nested-loop shapes are the 1-row
    // total frames (metadata crossJoins, all broadcast)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q169: margin mining's per-side top-k is a map-side group limit; no cartesian") {
    val p = plan("q169_margin_mine")
    // rank<=k over each side key rewrites to WindowGroupLimit, so the
    // two denominator passes move at most k rows per key; the pair
    // scorer itself is the documented broadcast brute-force baseline
    // (BNLJ against a broadcast side), never a non-broadcast cartesian.
    // (An r14 rewrite of both passes onto the bounded-heap
    // TopKAggregator + min_by argmaxes was measured and REVERTED: the
    // typed aggregator pays per-row buffer encoding the codegen'd
    // window never does — 8 -> 16 warm jobs, 1.05 -> 2.1 s at sf0.1.)
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q172: cluster cap ranks map-side and assigns without a shuffle of the corpus") {
    val p = plan("q172_cluster_cap")
    // the rank pass is rank<=cap -> WindowGroupLimit; the assignment is
    // a broadcast-literal projection, so no join shape can be cartesian
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q173: winnowing is explode + partial-aggregated argmin — no joins at all") {
    val p = plan("q173_winnow")
    // the law is per-(doc, window) argmin over an exploded membership
    // table: any join shape here would mean the candidate expansion
    // regressed into a self-join
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_min") || p.contains("HashAggregate"), p)
  }

  test("q56: decontamination broadcasts the eval side, fact side never shuffles for the join") {
    val p = plan("q56_decontamination")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q65: token-budget mix never windows a whole stratum through one task") {
    // every Window in the plan must involve the hash-range bucket — the
    // row-level window partitions by (__strat, __bkt) and the summary
    // window (≤ nBuckets rows per stratum) orders by __b. A Window
    // partitioned by the stratum alone — the one-task-per-language funnel
    // the two-phase form removes — would contain neither.
    val p = plan("q65_token_budget_mix")
    val windowArgs = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windowArgs.nonEmpty, p)
    assert(windowArgs.forall(a => a.contains("__bkt") || a.contains("__b")), p)
  }

  test("q63: incremental dedup filters the store by a BROADCAST semi-join on batch bucket keys") {
    // the signature store must never shuffle wholesale: rows in buckets
    // the batch doesn't touch are discarded by a broadcast left-semi
    // before the (capped) pair expansion groups anything
    val p = plan("q63_incremental_dedup")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("LeftSemi"), p)
  }

  test("q66: rank<=k rewrites to WindowGroupLimit (map-side per-group top-k)") {
    // Spark's InferWindowGroupLimit turns row_number().over(w) <= k into a
    // WindowGroupLimit that bounds each group to k rows BEFORE the window
    // shuffle — without it every group's full contents sort through one
    // task. A refactor that breaks the rewrite (e.g. a non-rank filter
    // shape) must fail here.
    val p = plan("q66_topk_per_group")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q73: kmeans assignment is a shuffle-free projection (corpus never moves)") {
    // the Lloyd-iteration centroid sums run eagerly at construction time;
    // the RETURNED plan is the final assignment — k broadcast-literal
    // dots per row, argmax in column algebra, NO Exchange anywhere
    val p = plan("q73_kmeans")
    assert(!p.contains("Exchange"), p)
    assert(p.contains("centroid_argmax"), p)
  }

  test("q75: quantized ANN broadcasts queries and survivors, never sort-merges") {
    val p = plan("q75_quantized_ann")
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("Broadcast"), p)
    // the integer hot kernel is the native expression, not a HOF chain
    assert(p.contains("vec_dot_int"), p)
  }

  test("q76: percentile cutoffs reach the corpus as a broadcast, never a corpus window") {
    val p = plan("q76_percentile_trim")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q78/q79/q81: candidate joins stay equi-joins, broadcast where one side is small") {
    // q78: rows meet their bucket offsets via broadcast
    val p78 = plan("q78_pack")
    assert(p78.contains("BroadcastHashJoin"), p78)
    // q79: prefix-filter candidates and verification are hash equi-joins —
    // an exact similarity join that never degenerates to a cross product
    val p79 = plan("q79_jaccard_join")
    assert(!p79.contains("CartesianProduct") &&
      !p79.contains("BroadcastNestedLoopJoin"), p79)
    // q81: the store prunes to batch-touched clusters via broadcast semi
    val p81 = plan("q81_incremental_semdedup")
    assert(p81.contains("LeftSemi"), p81)
    assert(p81.contains("BroadcastHashJoin"), p81)
  }

  test("q83: span detection never moves text — window hashes shuffle, docs don't") {
    // the duplicated-window count and the mark-back join must both key on
    // the precomputed hash (equi-joins/aggregates over (doc_id, pos, h)
    // rows); the token arrays stay behind the projection. A plan that
    // shuffles `text` or `__t` would carry the corpus through the wire.
    val p = plan("q83_dup_spans")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty, p)
    assert(!exchanges.exists(l => l.contains("text") || l.contains("__t#")), p)
  }

  test("q85: classifier weight table broadcasts; corpus text never joins") {
    // scoring joins doc term counts to the |vocab| x |classes| weight
    // table — metadata — which must ride a broadcast, never a sort-merge
    val p = plan("q85_centroid_classify")
    assert(p.contains("BroadcastHashJoin"), p)
    val smjLines = p.linesIterator.filter(_.contains("SortMergeJoin")).toSeq
    assert(!smjLines.exists(_.contains("term")), p)
  }

  test("q86: shard positions never window a whole shard through one task") {
    // same invariant as q65: every window must involve the hash-range
    // bucket; a Window partitioned by shard alone is the funnel the
    // two-phase form removes
    val p = plan("q86_shard_assign")
    val windowArgs = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windowArgs.nonEmpty, p)
    assert(windowArgs.forall(a => a.contains("__bkt") || a.contains("__b")), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q87: repetition metrics are a pure projection — zero shuffles") {
    // the sorted-run formulation keeps the whole computation inside the
    // scan's projection; an exploded gram-count formulation would put
    // |ns| x corpus-tokens gram strings through an Exchange
    val p = plan("q87_repetition")
    assert(!p.contains("Exchange"), p)
  }

  test("q88: bloom prune filters train grams before the verify join") {
    // the constant-size bitmap probe (element_at against the literal
    // long array) must sit under a Filter on the train side, so the
    // exact equi-join only ever sees the pruned sliver
    val p = plan("q88_decontaminate_bloom")
    assert(p.contains("element_at"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q93: bm25 broadcasts query/df sides; per-query top-k is a group limit") {
    val p = plan("q93_bm25")
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // the corpus tf table must never be cross-joined against anything
    // bigger than the one-row stats relation
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q95: pagerank iterations read cached edges, never rebuild them") {
    try {
      val p = plan("q95_pagerank")
      // the degree-augmented edge table and the node list are persisted —
      // every iteration reads the cache instead of replaying scan ->
      // distinct -> union -> degree join
      assert(p.contains("InMemoryTableScan"), p)
      assert(!p.contains("CartesianProduct"), p)
    } finally {
      // unlike the other plan-only tests, building this plan runs the
      // operator's eager node count and installs its caches — drop them
      // so later tests in the shared session start clean
      spark.catalog.clearCache()
    }
  }

  test("q96: fuzzy join is equi-join blocking + verify, never a cross product") {
    val p = plan("q96_fuzzy_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q103: df is a partial-aggregated count — no window in the plan") {
    // an r8 experiment computed df as count(*) over a term-partitioned
    // window; it measured faster at sf0.1 but buffers a stop-word
    // term's ENTIRE O(corpus) group in one task before the df cap can
    // drop it, so it was reverted to the map-side-combining aggregate.
    // Pin the skew-safe shape: no Window operator anywhere in q103.
    val p = plan("q103_tfidf_join")
    assert(!p.contains("windowspecdefinition") && !p.contains("Window ("),
      s"q103 must not compute df through a window:\n$p")
  }

  test("q68/q69: posting cap and tf-idf ranking are map-side group limits") {
    // the inverted index's posting cap and the per-document tf-idf top-k
    // both rest on the same rewrite: without WindowGroupLimit a
    // stop-word's posting list (O(corpus) rows in one group) sorts
    // through a single task before the cap applies
    assert(plan("q68_inverted_index").contains("WindowGroupLimit"))
    assert(plan("q69_tfidf_terms").contains("WindowGroupLimit"))
  }

  test("q102: the bloom probe filters the fact scan BELOW the semi-join") {
    val p = plan("q102_bloom_semijoin")
    // the tree must read: semi-join whose DIRECT fact-side child is the
    // bitmap Filter (over the scan) — rows die in the scan stage,
    // before any join exchange. In formatted explain that is the
    // "LeftSemi ..." tree line immediately followed by ":- Filter".
    val semiIdx = p.indexOf("LeftSemi")
    assert(semiIdx >= 0, p)
    val childIdx = p.indexOf(":- Filter", semiIdx)
    assert(childIdx >= 0 && childIdx - semiIdx < 120,
      s"bloom filter is not the semi-join's direct fact-side child\n$p")
    assert(p.contains("element_at"), p)        // the bitmap probe itself
    assert(!p.contains("SortMergeJoin"), p)    // tiny dim broadcasts
    spark.catalog.clearCache()
  }

  test("q103: tf-idf join is equi-join candidates, never a cross product") {
    val p = plan("q103_tfidf_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    // the df cap must reach the weight build: qualifying-term filter
    // appears as a real plan filter on the aggregated df
    assert(p.matches("(?s).*Filter.*df.*"), p)
    spark.catalog.clearCache()
  }

  test("q136: phrase meta broadcasts; postings never sort-merge for it") {
    val p = plan("q136_phrase_search")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q143: keyness top-k is a map-side window group limit") {
    val p = plan("q143_keyness")
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q125: skyline is summary-pruned — no self-join of the points") {
    val p = plan("q125_skyline")
    // the only nested-loop shapes allowed are the 1-row min/max stats
    // broadcasts (Cross with a 1-row side); a points-level product
    // would surface as CartesianProduct
    assert(!p.contains("CartesianProduct"), p)
    // the prune summary reaches the points as a broadcast
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q140: bitmap overlap joins on words, never a user-level product") {
    val p = plan("q140_segment_overlap")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p)
    // popcount of the word-wise AND is in the plan
    assert(p.contains("bit_count"), p)
  }

  test("q144: grouped quantiles land as a bounded LocalRelation") {
    // rankStatistics computes its bounded tables (group stats, bucket
    // cells, boundary histogram) driver-side and the RESULT is a
    // LocalRelation — consumers must never see a corpus-level join or
    // exchange in the cuts table's plan (the broadcast contract moved
    // into the producing actions; their corpus passes stay
    // partial-aggregated scans, pinned by AnalyticsOpsSpec equality)
    val p = plan("q144_group_quantiles")
    assert(p.contains("LocalTableScan"), p)
    assert(!p.contains("Exchange") && !p.contains("CartesianProduct"), p)
    spark.catalog.clearCache()
  }

  test("q14: rn <= 2 filter plans as WindowGroupLimit (map-side group cap)") {
    // the rank filter must push into a WindowGroupLimit so each task
    // keeps k rows per group before the window's sort — without it a
    // hot order key buffers its whole group through one task
    val p = plan("q14_row_number")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q147: per-group sample rank plans as WindowGroupLimit") {
    val p = plan("q147_group_sample")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q159: diversified top-k caps groups map-side and cuts with a " +
    "true top-k") {
    // the per-group cap must plan as WindowGroupLimit (a hot language
    // never buffers past perGroup rows per task) and the global cut as
    // TakeOrderedAndProject — a Sort+Limit would sort the survivors
    // globally
    val p = plan("q159_diversified_topk")
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q162: every n-gram size shares ONE tagged generator") {
    // the one-pass law from the round-9 review: |ns| must not multiply
    // the corpus scans — all distinct legs ride a single explode of
    // per-n tagged shingle lists, and totals are conditional sums in
    // one aggregate (no generator at all on that leg)
    val p = plan("q162_ngram_diversity")
    // exactly two generators: ONE corpus-side explode carrying every
    // n's tagged shingles, plus the metadata-sized stack melt of the
    // per-slice totals row (the AQE wrapper hides the plan tree from a
    // direct executedPlan collect, so count explain-detail nodes)
    val gens = raw"\(\d+\) Generate\b".r.findAllIn(p).size
    assert(gens == 2, s"expected explode + stack only, got $gens:\n$p")
    assert("Arguments: explode".r.findAllIn(p).size == 1, p)
    assert("Arguments: stack".r.findAllIn(p).size == 1, p)
  }

  test("q148: cross-corpus candidates expand buckets, never join corpora") {
    val p = plan("q148_cross_neardup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Generate"), p)     // capped bucket expansion
  }

  test("q149: rank transform meets the corpus only through broadcasts") {
    // group stats and bucket offsets are metadata-sized broadcasts; the
    // corpus itself must never enter a sort-merge join or a product
    val p = plan("q149_rank_transform")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q150: the expectation report is ONE scan of the table") {
    // formatted explain prints each node once in the tree and once in
    // the detail section — count distinct scan NODE ids
    val p = plan("q150_expectations")
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size == 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q179: the novelty probe broadcasts the batch; the store never products") {
    // the nightly shape: batch bucket rows broadcast against the store
    // probe, per-pair/per-doc reductions are joins + aggregates — an
    // all-pairs shape would surface as a cartesian here
    val p = plan("q179_novelty")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q181: winnow matching broadcasts the query prints; the cut is a group limit") {
    val p = plan("q181_winnow_matches")
    assert(p.contains("BroadcastHashJoin"), p)
    // rank<=topK per query rewrites to the map-side WindowGroupLimit
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q183: stupid backoff joins stay keyed — no product anywhere in the chain") {
    val p = plan("q183_stupid_backoff")
    // the five count-table joins are all term-keyed equi-joins; the
    // only nested-loop shape allowed is the 1-row total broadcast
    assert(!p.contains("CartesianProduct"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q67: exactly two LSH candidate passes — compaction reuses batch edges") {
    // the r8 regression ran a THIRD full minhashCandidatesFromSigs over
    // the whole store to derive the compaction drop-set, re-emitting
    // pairs the two batch legs had already generated; the incremental
    // contract (candidates(all) == candidates(old) ∪ incremental) makes
    // that pass pure waste, so its return is pinned out here
    graft.llm.Dedup.resetCandidatePasses()
    val df = graft.SparkEntry.queries("q67_compacted_corpus")(spark, dir)
    assert(df.count() > 0)
    assert(graft.llm.Dedup.candidatePasses == 2L,
      s"q67 ran ${graft.llm.Dedup.candidatePasses} candidate passes; " +
        "the compaction drop-set must derive from the batch legs' edges")
    spark.catalog.clearCache()
  }
}
