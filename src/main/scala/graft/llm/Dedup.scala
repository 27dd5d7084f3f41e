package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: every variant avoids the O(n²) all-pairs comparison —
  * exact dedup is a hash groupBy; MinHash/SimHash bucket with LSH so only
  * within-bucket pairs are compared (the shuffle key is the band/bucket
  * hash, so candidate generation is one shuffle + one co-partitioned
  * self-join); verification (exact n-gram Jaccard) runs only on candidate
  * pairs.
  */
object Dedup {

  // Plan-shape telemetry: counts LSH candidate-pass CONSTRUCTIONS (full
  // and incremental), so a maintenance pipeline's pass budget is
  // spec-assertable — q67's compaction regression (a third full pass
  // over pairs both batch legs had already emitted) is pinned out via
  // this counter in PlanQualitySpec. Test-only observability; never
  // read on an executor or a query path.
  private val candidatePassCount = new java.util.concurrent.atomic.AtomicLong
  private[graft] def candidatePasses: Long = candidatePassCount.get()
  private[graft] def resetCandidatePasses(): Unit = candidatePassCount.set(0L)

  /** Canonical text form shared by all fingerprints: lowercase, collapsed
    * whitespace. */
  def normalized(text: Column): Column =
    regexp_replace(lower(text), "\\s+", " ")

  /** Whitespace tokens of the normalized text — the ONE tokenization the
    * span/scrub/repetition/index operators (and their SQL oracles) share,
    * so a tokenizer change cannot drift them apart. Null text tokenizes
    * to the EMPTY array (not null): a null-text row then reports zero
    * tokens/coverage instead of legacy `size(null) = -1` artifacts, and
    * the oracles mirror it with `coalesce(normalized, '')`. */
  def wsTokens(text: Column): Column =
    coalesce(filter(split(normalized(text), " "), t => length(t) > 0),
      array().cast("array<string>"))

  // ---------------------------------------------------------------- exact

  /** Exact dedup: group by content hash, keep the smallest id as the
    * canonical representative. Output one row per distinct content with
    * its duplicate count — the survivor set is `filter($"n_dups" >= 1)`. */
  def exact(docs: DataFrame, id: Column = col("doc_id"),
            text: Column = col("text")): DataFrame =
    docs.groupBy(md5(normalized(text)).as("content_key"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  // -------------------------------------------------------------- shingles

  /** Word k-shingles of the normalized text (distinct, first-occurrence
    * order) — the native single-pass [[graft.expr.WordShingles]]
    * expression. Semantics identical to
    * `array_distinct(k zipped slices of split(normalized, " "))`; the
    * native form skips the regex engine and the per-element interpreted
    * lambda dispatch of the HOF formulation (~5x faster, one plan node).
    */
  def shingles(text: Column, k: Int = 3): Column =
    graft.expr.WordShingles(text, k)

  // --------------------------------------------------------------- minhash

  /** MinHash signatures, one row per document: (doc_id, sig array<long>).
    *
    * Relational formulation: explode shingles once, compute TWO base
    * hashes per shingle, and derive the `numHashes` family as
    * `h_i = h1 XOR rot_i(h2)` (a Kirsch-Mitzenmacher-style two-hash
    * family; XOR+rotate instead of `h1 + i*h2` because ANSI mode rejects
    * wrapping long arithmetic) — so each shingle is hashed twice, not
    * `numHashes` times, and the shingle construction runs once (a naive
    * per-column formulation re-evaluates the whole shingle pipeline per
    * hash function — measured 100x slower). The groupBy mins
    * partial-aggregate map-side: the shuffle carries `numHashes` longs per
    * document regardless of document size.
    */
  /** Modulus for the `portable` hash family: the largest prime below
    * 2^28. 28-bit base hashes keep `h1 + i*h2` far from long overflow in
    * every engine and make the family expressible in plain SQL. */
  val PortablePrime = 268435399L

  def minhashTable(docs: DataFrame, numHashes: Int = 32, k: Int = 3,
                   id: Column = col("doc_id"),
                   text: Column = col("text"),
                   portable: Boolean = false): DataFrame = {
    val base = docs.select(id.as("doc_id"), explode(shingles(text, k)).as("sh"))
    // `portable = true` swaps the xxhash64 XOR-rotate family for an
    // md5-derived `(h1 + i*h2) mod p` family that any SQL engine can
    // recompute (the DuckDB oracle re-runs the whole LSH pipeline on it);
    // production keeps xxhash64 — ~4x cheaper per shingle.
    val hashed =
      if (portable) base.select(col("doc_id"),
        conv(substring(md5(col("sh")), 1, 7), 16, 10).cast("long").as("h1"),
        conv(substring(md5(col("sh")), 8, 7), 16, 10).cast("long").as("h2"))
      else base.select(col("doc_id"),
        xxhash64(col("sh")).as("h1"), xxhash64(lit(1), col("sh")).as("h2"))
    def rot(c: Column, i: Int): Column =
      if (i % 64 == 0) c
      else shiftleft(c, i % 64).bitwiseOR(shiftrightunsigned(c, 64 - (i % 64)))
    val mins = (0 until numHashes).map { i =>
      if (portable)
        min((col("h1") + lit(i.toLong) * col("h2")) % PortablePrime).as(s"m$i")
      else
        min(col("h1").bitwiseXOR(rot(col("h2"), i * 7 + 1))).as(s"m$i")
    }
    hashed.groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** [[minhashTable]]'s NARROW form for inputs already holding ONE row
    * per document — the streaming micro-batch shape after the per-batch
    * doc_id dedup: the whole signature computes IN-ROW (two base hashes
    * per shingle inside one higher-order transform, then an `array_min`
    * per hash function over the precomputed pairs), so a batch pays
    * ZERO shuffle for hashing where the relational form shuffles every
    * (doc, shingle) hash pair into a 32-buffer aggregate. Same hash
    * family, same per-shingle work, bit-identical signatures
    * (spec-pinned against [[minhashTable]]); shingle-less docs emit no
    * row, exactly like the groupBy form. The relational form remains
    * the right shape when one document's text spans several input rows
    * (its groupBy merges shingle sets by doc_id); on one-row-per-doc
    * inputs prefer this one. */
  def minhashSigs(docs: DataFrame, numHashes: Int = 32, k: Int = 3,
                  id: Column = col("doc_id"),
                  text: Column = col("text")): DataFrame = {
    def rot(c: Column, i: Int): Column =
      if (i % 64 == 0) c
      else shiftleft(c, i % 64).bitwiseOR(shiftrightunsigned(c, 64 - (i % 64)))
    val hashed = docs
      .select(id.as("doc_id"), shingles(text, k).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(col("doc_id"),
        transform(col("__sh"), s =>
          struct(xxhash64(s).as("h1"), xxhash64(lit(1), s).as("h2")))
          .as("__h"))
    val sig = array((0 until numHashes).map { i =>
      array_min(transform(col("__h"), h =>
        h.getField("h1").bitwiseXOR(rot(h.getField("h2"), i * 7 + 1))))
    }: _*)
    hashed.select(col("doc_id"), sig.as("sig"))
  }

  /** LSH banding: split the signature into `bands` bands of `rowsPerBand`
    * and hash each band -> (band_idx, band_hash) bucket keys. With
    * `portable = true` the bucket key is the comma-joined band values
    * themselves (engine-neutral; slightly wider shuffle keys). */
  def lshBuckets(sig: Column, bands: Int, rowsPerBand: Int,
                 portable: Boolean = false): Column =
    array((0 until bands).map { b =>
      val bandStr = concat_ws(",",
        transform(slice(sig, b * rowsPerBand + 1, rowsPerBand), _.cast("string")))
      struct(lit(b).as("band"),
        (if (portable) bandStr else xxhash64(bandStr).cast("string")).as("bucket"))
    }: _*)

  /** Degenerate-LSH-bucket guard: buckets with more members than this
    * contribute NO candidate pairs; the drop is recorded on a
    * `graft_lsh_drops_*` observed metric that rides the query's own action
    * (dropped_buckets / dropped_members — readable from a
    * `QueryExecutionListener`, asserted in LlmOpsSpec). A bucket this size
    * is an LSH failure mode — near-identical boilerplate all hashing to
    * one key — and its pair count is quadratic in ANY formulation
    * (4096 members → 8.4M pairs; a 65k-member bucket → 2.1B): emitting
    * those pairs is junk work, so production dedup systems cap and move
    * on. Raise per-call when a corpus legitimately needs it. (Caveat: if
    * the WHOLE result is empty, AQE's empty-relation propagation can fold
    * the metric node away with the rest of the plan — drop counts are
    * reliable whenever any bucket survives, i.e. on any realistic corpus.)
    */
  val MaxBucketMembers = 4096

  // observe() names must be unique per query; one bucketPairs call = one name
  private val lshObserveId = new java.util.concurrent.atomic.AtomicLong

  /** Within-bucket candidate pairs, computed WITHOUT a self-join: group
    * members per bucket (one shuffle of the compact signature rows), then
    * expand ordered pairs inside each bucket. A self-join would run the
    * whole upstream signature pipeline twice — once per join side —
    * because Spark does not share scan subtrees across join inputs;
    * this formulation computes signatures exactly once.
    *
    * Scale bounds: the pair expansion is two-level — `posexplode` to one
    * row per member, then each member's partner slice — so the largest
    * single array ever materialized is O(bucket members) (the grouped
    * member list itself: ~300 B/member with a 32-hash signature, i.e. the
    * 2 GB UnsafeRow limit sits at ~7M members/bucket), never the
    * O(members²) one-row pair blow-up of a naive
    * `flatten(transform(…))` (which at 65k members already exceeds both
    * the 2 GB row and the Int.MaxValue array-length limits). Buckets over
    * `maxBucket` are dropped-and-counted before expansion, so the
    * quadratic OUTPUT is capped too. */
  /** Expand each sorted member array (column `ms`) into every (a, b)
    * pair with a strictly before b — the shared tail of all
    * group-then-pair operators (LSH buckets, tf-idf posting groups,
    * fuzzy-join variant blocks). One posexplode + tail slice; never a
    * self-join's second shuffle. */
  private[graft] def pairsFromMembers(grouped: DataFrame): DataFrame = {
    val ms = col("ms")
    grouped
      .select(ms, posexplode(ms))                       // → ms, pos, col
      .select(col("col").as("a"),
        explode(slice(ms, col("pos") + lit(2), size(ms))).as("b"))
  }

  private def bucketPairs(bucketed: DataFrame, keyCols: Seq[String],
                          payload: Column, maxBucket: Int): DataFrame = {
    val ms = col("ms")
    pairsFromMembers(bucketed
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(payload)).as("ms"))
      .filter(size(ms) >= 2)
      .observe(s"graft_lsh_drops_${lshObserveId.incrementAndGet()}",
        sum(when(size(ms) > maxBucket, 1).otherwise(0)).as("dropped_buckets"),
        sum(when(size(ms) > maxBucket, size(ms)).otherwise(0)).as("dropped_members"))
      .filter(size(ms) <= maxBucket))
  }

  /** Signature-estimated Jaccard: fraction of agreeing minhash slots. */
  private def estJaccard(a: Column, b: Column, numHashes: Int): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), e => e)).cast("double") /
      lit(numHashes)

  /** (doc_id, sig, band, bucket) rows — one per band per document. */
  private def sigBuckets(sigs: DataFrame, bands: Int, rowsPerBand: Int,
                         portable: Boolean): DataFrame =
    sigs.select(col("doc_id"), col("sig"),
        explode(lshBuckets(col("sig"), bands, rowsPerBand, portable)).as("bb"))
      .select(col("doc_id"), col("sig"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))

  /** MinHash-LSH near-duplicate candidate pairs with signature-estimated
    * Jaccard. Two docs become a candidate when they share ANY band bucket.
    * Returns (id_a < id_b, est_jaccard >= threshold).
    */
  def minhashCandidates(docs: DataFrame, numHashes: Int = 32, bands: Int = 8,
                        k: Int = 3, threshold: Double = 0.5,
                        id: Column = col("doc_id"),
                        text: Column = col("text"),
                        portable: Boolean = false,
                        maxBucket: Int = MaxBucketMembers): DataFrame =
    minhashCandidatesFromSigs(minhashTable(docs, numHashes, k, id, text, portable),
      numHashes, bands, threshold, portable, maxBucket)

  /** [[minhashCandidates]] starting from precomputed [[minhashTable]]
    * signatures — the entry point when the caller already holds (and
    * perhaps cached) the signature table, so the expensive shingle+hash
    * stage is not re-planned. */
  def minhashCandidatesFromSigs(sigs: DataFrame, numHashes: Int = 32,
                                bands: Int = 8, threshold: Double = 0.5,
                                portable: Boolean = false,
                                maxBucket: Int = MaxBucketMembers): DataFrame = {
    candidatePassCount.incrementAndGet()
    val rowsPerBand = numHashes / bands
    bucketPairs(sigBuckets(sigs, bands, rowsPerBand, portable),
        Seq("band", "bucket"), struct(col("doc_id"), col("sig")), maxBucket)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        estJaccard(col("a.sig"), col("b.sig"), numHashes).as("est_jaccard"))
      .groupBy("id_a", "id_b")            // same pair can match in >1 band
      .agg(max("est_jaccard").as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Corpus novelty scoring — the acquisition-time "does this crawl add
    * new information" audit: per NEW document, the best
    * signature-estimated Jaccard against the persisted corpus signature
    * store, probed through the same banded LSH the incremental dedup
    * runs. One row per signable new document: candidate count, the
    * best-matching store doc (ties to the smallest store id —
    * deterministic, partition-invariant), the exact signature agreement
    * (`sig_matches` of `numHashes` — an integer, no float estimate),
    * the scaled estimate `est_ji = 1e9·matches div numHashes`, and
    * `is_novel = matches·tDen < tNum·numHashes` (the threshold an exact
    * fraction, never a float compare). A document sharing NO band
    * bucket with the store is maximally novel (0 candidates, null
    * nearest). Sub-k-token docs have no signature and no row
    * ([[minhashTable]]'s contract — route them through content hashing
    * like [[contentHashSplit]]).
    *
    * Scale shape: the nightly-arrivals shape — the batch's bucket rows
    * broadcast against the store's (`broadcastNewSide`, disable for
    * huge batches), so the store never shuffles; store buckets larger
    * than `maxBucket` are excluded ([[minhashCandidatesFromSigs]]'s
    * degenerate-bucket guard — a saturated boilerplate bucket adds
    * fanout, not signal); per-pair and per-doc reductions are
    * candidate-sized groupBys. */
  def noveltyScore(existingSigs: DataFrame, newSigs: DataFrame,
                   numHashes: Int = 32, bands: Int = 8,
                   tNum: Long = 1, tDen: Long = 2,
                   portable: Boolean = false,
                   maxBucket: Int = MaxBucketMembers,
                   broadcastNewSide: Boolean = true): DataFrame = {
    require(numHashes % bands == 0, s"numHashes=$numHashes bands=$bands")
    require(tDen > 0 && tNum >= 0, s"t=$tNum/$tDen")
    val rowsPerBand = numHashes / bands
    val sb0 = sigBuckets(existingSigs, bands, rowsPerBand, portable)
    val okBuckets = sb0.groupBy("band", "bucket")
      .agg(count(lit(1)).as("__bc")).filter(col("__bc") <= maxBucket)
      .select("band", "bucket")
    val sb = sb0.join(okBuckets, Seq("band", "bucket"))
      .select(col("band"), col("bucket"),
        col("doc_id").as("__sid"), col("sig").as("__ssig"))
    val nbRaw = sigBuckets(newSigs, bands, rowsPerBand, portable)
      .select(col("band"), col("bucket"),
        col("doc_id").as("__nid"), col("sig").as("__nsig"))
    val nb = if (broadcastNewSide) broadcast(nbRaw) else nbRaw
    // the same (new, store) pair can match in several bands; agreement
    // is a pure function of the two sigs, so max == the value
    val perPair = sb.join(nb, Seq("band", "bucket"))
      .select(col("__nid"), col("__sid"),
        size(filter(zip_with(col("__nsig"), col("__ssig"),
          (x, y) => x === y), e => e)).as("__m"))
      .groupBy("__nid", "__sid").agg(max("__m").as("__m"))
    val best = perPair.groupBy("__nid").agg(
      count(lit(1)).as("n_candidates"),
      min(struct((-col("__m")).as("nm"), col("__sid").as("sid"))).as("__b"))
    newSigs.select(col("doc_id"))
      .join(best.withColumnRenamed("__nid", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        col("__b.sid").as("nearest_id"),
        coalesce((-col("__b.nm")).cast("int"), lit(0)).as("sig_matches"))
      .withColumn("est_ji", expr(
        s"(CAST(1000000000 AS BIGINT) * sig_matches) div $numHashes"))
      .withColumn("is_novel",
        expr(s"sig_matches * ${tDen}L < ${tNum}L * $numHashes"))
  }

  /** Incremental near-dup candidate generation — the shape a 100 TB
    * corpus actually runs nightly: signatures are computed for the NEW
    * batch only and compared against a persisted signature store of the
    * existing corpus ([[minhashTable]] output, fixed-width rows); the
    * store is never re-hashed and, because the (small) new side's bucket
    * rows are broadcast, never shuffled either. Emits every candidate
    * pair involving at least one new document (new-new via the capped
    * in-batch expansion, new-old via the broadcast bucket join);
    * old-old pairs were emitted when those documents arrived, so
    * `candidates(all) == candidates(old) ∪ incremental(store(old), new)`
    * — pinned exactly by LlmOpsSpec.
    *
    * @param broadcastNewSide hint the bucket join to broadcast the new
    *        batch (default — the nightly-arrivals shape, store never
    *        shuffles). Disable when the batch itself is huge; the join
    *        then falls back to the optimizer's choice (a co-partitioned
    *        shuffle join on the bucket key).
    */
  def incrementalMinhashCandidates(existingSigs: DataFrame, newDocs: DataFrame,
                                   numHashes: Int = 32, bands: Int = 8,
                                   k: Int = 3, threshold: Double = 0.5,
                                   id: Column = col("doc_id"),
                                   text: Column = col("text"),
                                   portable: Boolean = false,
                                   maxBucket: Int = MaxBucketMembers,
                                   broadcastNewSide: Boolean = true): DataFrame =
    incrementalMinhashCandidatesFromSigs(existingSigs,
      minhashTable(newDocs, numHashes, k, id, text, portable),
      numHashes, bands, threshold, portable, maxBucket, broadcastNewSide)

  /** [[incrementalMinhashCandidates]] starting from the batch's
    * precomputed signatures, so a caller that also persists them (the
    * streaming corpus maintainer) hashes each batch exactly once.
    *
    * Formulation: the batch's bucket rows union with the store's rows in
    * batch-touched buckets (store semi-filtered by the broadcast batch
    * bucket keys — untouched store buckets are never read past the scan
    * filter), each row tagged is_new, and the union goes through the SAME
    * capped [[bucketPairs]] expansion as a full recompute; old-old pairs
    * are discarded after expansion (they were emitted when those docs
    * arrived). Because the cap therefore sees the bucket's COMBINED
    * old+new size — exactly the size a full recompute would see — a
    * degenerate store bucket is dropped-and-counted here precisely when
    * the full recompute would drop it, keeping
    * `candidates(all) restricted to new-touching pairs == incremental`
    * even when the cap fires (the asymmetry ADVICE r4 flagged). The
    * matched store rows do shuffle on the bucket key (the per-bucket size
    * count needs them together), but only rows in batch-touched buckets:
    * at nightly-arrival scale that is O(batch), not O(store).
    *
    * @param broadcastNewSide hint the store-side semi-filter to broadcast
    *        the batch's distinct bucket keys (the nightly-arrivals
    *        default). Disable for huge batches; the semi-join then falls
    *        back to the optimizer's choice.
    */
  def incrementalMinhashCandidatesFromSigs(existingSigs: DataFrame,
                                           newSigs: DataFrame,
                                           numHashes: Int = 32, bands: Int = 8,
                                           threshold: Double = 0.5,
                                           portable: Boolean = false,
                                           maxBucket: Int = MaxBucketMembers,
                                           broadcastNewSide: Boolean = true): DataFrame = {
    candidatePassCount.incrementAndGet()
    val rowsPerBand = numHashes / bands
    val newBuckets = sigBuckets(newSigs, bands, rowsPerBand, portable)
      .withColumn("is_new", lit(true))
    // NO distinct on either pruning side: a semi/anti join is
    // duplicate-insensitive on its right input, and each distinct is a
    // full exchange + broadcast-materialization job per micro-batch —
    // pure fixed cost (sigs are one-row-per-doc already; band keys
    // barely collide within a batch)
    val newKeys = newBuckets.select("band", "bucket")
    val newIds = newSigs.select("doc_id")
    val oldBuckets = sigBuckets(existingSigs, bands, rowsPerBand, portable)
      .join(if (broadcastNewSide) broadcast(newKeys) else newKeys,
        Seq("band", "bucket"), "left_semi")
      // a doc present in BOTH sides (a replay healing a partial crash:
      // its signature landed, its corpus row did not) must occupy ONE
      // bucket slot, as new — two slots would inflate the bucket size,
      // and a bucket sitting exactly at `maxBucket` would be dropped on
      // the heal but not in the original run, making the heal inexact
      .join(if (broadcastNewSide) broadcast(newIds) else newIds,
        Seq("doc_id"), "left_anti")
      .withColumn("is_new", lit(false))
    bucketPairs(newBuckets.unionByName(oldBuckets), Seq("band", "bucket"),
        struct(col("doc_id"), col("sig"), col("is_new")), maxBucket)
      // old-old pairs were emitted when those docs arrived; the self-pair
      // guard is defense in depth for stores built outside appendIfAbsent
      .filter((col("a.is_new") || col("b.is_new")) &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        estJaccard(col("a.sig"), col("b.sig"), numHashes).as("est_jaccard"))
      .groupBy("id_a", "id_b")            // same pair can match in >1 band
      .agg(max("est_jaccard").as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** CROSS-corpus near-dup candidates — fuzzy decontamination: every LSH
    * candidate pair with one side in `aSigs` and the other in `bSigs`
    * (both [[minhashTable]] outputs); within-corpus pairs are NOT
    * emitted. The near-dup complement of [[decontaminate]]'s exact
    * k-gram containment — MinHash catches eval rewrites that no longer
    * share any exact k-gram with their training-set source. Emits
    * `(id_a from A, id_b from B, est_jaccard)`.
    *
    * Scale shape: the same banded one-shuffle bucketing as
    * [[minhashCandidatesFromSigs]] — the corpora meet ONLY inside shared
    * (band, bucket) keys through the capped expansion (never a
    * corpus-level join), same-side pairs are discarded after expansion,
    * and the cap sees the bucket's COMBINED two-corpus size, so a
    * degenerate bucket drops-and-counts exactly as a joint recompute
    * would. Neither side is assumed small: both shuffle once on the
    * bucket key. For a tiny eval side against a resident train store,
    * [[incrementalMinhashCandidatesFromSigs]] (then keeping only
    * new-old pairs) avoids shuffling the store at all.
    *
    * Id-space note: a doc_id present in BOTH corpora is two distinct
    * rows to this operator and emits the (id, id) pair (est 1.0 when
    * the texts match) — the correct "this exact document is in the
    * training set" signal; callers treating ids as globally unique
    * should slice disjoint id ranges, as q148 does. */
  def crossMinhashCandidates(aSigs: DataFrame, bSigs: DataFrame,
                             numHashes: Int = 32, bands: Int = 8,
                             threshold: Double = 0.5,
                             portable: Boolean = false,
                             maxBucket: Int = MaxBucketMembers): DataFrame = {
    candidatePassCount.incrementAndGet()
    val rowsPerBand = numHashes / bands
    val a = sigBuckets(aSigs, bands, rowsPerBand, portable)
      .withColumn("is_b", lit(false))
    val b = sigBuckets(bSigs, bands, rowsPerBand, portable)
      .withColumn("is_b", lit(true))
    bucketPairs(a.unionByName(b), Seq("band", "bucket"),
        struct(col("doc_id"), col("sig"), col("is_b")), maxBucket)
      .filter(col("a.is_b") =!= col("b.is_b"))
      .select(
        when(col("a.is_b"), col("b.doc_id")).otherwise(col("a.doc_id"))
          .as("id_a"),
        when(col("a.is_b"), col("a.doc_id")).otherwise(col("b.doc_id"))
          .as("id_b"),
        estJaccard(col("a.sig"), col("b.sig"), numHashes).as("est_jaccard"))
      .groupBy("id_a", "id_b")            // same pair can match in >1 band
      .agg(max("est_jaccard").as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Candidate-set quality report — the LSH analogue of the ANN recall
    * readout: precision/recall raw counts of a candidate pair generator
    * against an exact similarity join over the same corpus, as ONE row
    * `(n_true, n_candidates, hits)` of exact integers (recall =
    * hits/n_true, precision = hits/n_candidates, client-side). This is
    * how banding parameters are actually tuned: sweep (bands, rows) and
    * read the recall.
    *
    * Pure integer join algebra over the two PAIR tables — the corpus is
    * never re-touched. Pairs normalize to unordered (least, greatest)
    * form and dedup, so orientation or multiplicity differences between
    * the generators cannot fake or miss hits.
    *
    * Shape: union the flagged pair tables, ONE shuffle on the pair key
    * folds dedup + set intersection into a single groupBy, then a 1-row
    * partial aggregate. Each input plan executes exactly once —
    * separate count/intersection aggregates would re-run the candidate
    * GENERATOR (often a whole LSH chain) per readout. */
  def pairAgreement(exact: DataFrame, candidates: DataFrame,
                    idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    def norm(df: DataFrame, t: Int, c: Int) = df.select(
      least(col(idA), col(idB)).as("a"),
      greatest(col(idA), col(idB)).as("b"),
      lit(t.toLong).as("t"), lit(c.toLong).as("c"))
    norm(exact, 1, 0).unionByName(norm(candidates, 0, 1))
      .groupBy("a", "b")
      .agg(max("t").as("t"), max("c").as("c"))
      .agg(coalesce(sum("t"), lit(0L)).as("n_true"),
        coalesce(sum("c"), lit(0L)).as("n_candidates"),
        coalesce(sum(col("t") * col("c")), lit(0L)).as("hits"))
  }

  /** Banding-parameter sweep: [[pairAgreement]] evaluated at several
    * LSH operating points in one job — the full tuning curve (recall
    * and precision vs bands) a corpus owner reads before committing a
    * banding config for a 100 TB dedup run. Each setting re-bands the
    * SAME signature table (the expensive shingle+hash stage is paid
    * once, typically against a persisted store); the exact pair plan
    * is planned ONCE and fanned out to the settings with an explode
    * (not re-executed per setting); everything meets in a single
    * (bands, pair)-key groupBy. Output is one row per setting —
    * guaranteed even on empty inputs — `(bands, n_true, n_candidates,
    * hits)`, all exact integers.
    *
    * Caveat shared with the generators themselves: the degenerate-
    * bucket cap (`maxBucket`) means a loose setting that saturates a
    * bucket under-reports candidates there by design, so capped
    * candidate sets need not nest across settings on boilerplate-heavy
    * data — the sweep SURFACES that via the n_candidates column. */
  def bandingSweep(sigs: DataFrame, exact: DataFrame, bandSettings: Seq[Int],
                   numHashes: Int = 32, threshold: Double = 0.5,
                   portable: Boolean = false,
                   maxBucket: Int = MaxBucketMembers): DataFrame = {
    require(bandSettings.nonEmpty, "no band settings")
    require(bandSettings.forall(b => b > 0 && numHashes % b == 0),
      s"each bands value must divide numHashes=$numHashes: $bandSettings")
    require(bandSettings.distinct.size == bandSettings.size,
      s"duplicate band settings would duplicate output rows: $bandSettings")
    val settingsArr = array(bandSettings.map(b => lit(b)): _*)
    def norm(df: DataFrame, t: Int, c: Int, bands: Column) = df.select(
      bands.as("bands"),
      least(col("id_a"), col("id_b")).as("a"),
      greatest(col("id_a"), col("id_b")).as("b"),
      lit(t.toLong).as("t"), lit(c.toLong).as("c"))
    val exTagged = norm(exact, 1, 0, explode(settingsArr))
    val candTagged = bandSettings.map { b =>
      norm(minhashCandidatesFromSigs(sigs, numHashes, b, threshold, portable,
        maxBucket), 0, 1, lit(b))
    }.reduce(_.unionByName(_))
    val agg = exTagged.unionByName(candTagged)
      .groupBy("bands", "a", "b")
      .agg(max("t").as("t"), max("c").as("c"))
      .groupBy("bands")
      .agg(sum("t").as("n_true"), sum("c").as("n_candidates"),
        sum(expr("t * c")).as("hits"))
    // one row per requested setting even when a setting (or everything)
    // is empty — the curve's x-axis is the request, not the data
    val settingsDf = exact.sparkSession.range(1)
      .select(explode(settingsArr).as("bands"))
    settingsDf.join(agg, Seq("bands"), "left")
      .select(col("bands"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("hits"), lit(0L)).as("hits"))
  }

  /** Cross-slice duplication matrix: candidate (or verified) near-dup
    * pairs counted by the unordered pair of slices (e.g. crawl source)
    * their endpoints belong to — the "which sources duplicate each
    * other" corpus-health readout that decides what to crawl less of.
    * Two equi-joins of the bounded pair table against the `(id, slice)`
    * projection (never the text), then a count over at most
    * `slices²` unordered keys; slices compare as strings with the
    * smaller name first, so the matrix is triangular regardless of
    * pair orientation. */
  def crossSlicePairCounts(pairs: DataFrame, docs: DataFrame,
                           slice: Column = col("source"),
                           id: Column = col("doc_id"),
                           idA: String = "id_a", idB: String = "id_b")
      : DataFrame = {
    Seq("__sid", "__sa", "__sb").filter(pairs.columns.contains).foreach(r =>
      throw new IllegalArgumentException(
        s"crossSlicePairCounts reserves column name $r; rename it in pairs"))
    val m = docs.select(id.as("__sid"), slice.as("__slice"))
    pairs
      .join(m.select(col("__sid"), col("__slice").as("__sa")),
        col(idA) === col("__sid")).drop("__sid")
      .join(m.select(col("__sid"), col("__slice").as("__sb")),
        col(idB) === col("__sid")).drop("__sid")
      .select(least(col("__sa"), col("__sb")).as("slice_a"),
        greatest(col("__sa"), col("__sb")).as("slice_b"))
      .groupBy("slice_a", "slice_b")
      .agg(count(lit(1)).as("n_pairs"))
  }

  // --------------------------------------------------------------- simhash

  /** 64-bit SimHash per document: bit i of the fingerprint is the sign of
    * the sum over shingles of (bit i of xxhash64(shingle) ? +1 : -1).
    *
    * Relational formulation — explode shingles, one hash per row, then a
    * groupBy with 64 conditional sums. Map-side partial aggregation
    * reduces each document to 64 longs before any shuffle, so this scales
    * to arbitrarily large documents and corpora. Returns (doc_id, fp).
    */
  def simhashTable(docs: DataFrame, k: Int = 2,
                   id: Column = col("doc_id"),
                   text: Column = col("text"),
                   portable: Boolean = false): DataFrame = {
    val base = docs.select(id.as("doc_id"), explode(shingles(text, k)).as("sh"))
    // portable: 56-bit md5-derived hash (two 28-bit hex chunks) so the
    // DuckDB oracle can recompute every stage with plain integer SQL
    val hashed =
      if (portable) base.select(col("doc_id"),
        (conv(substring(md5(col("sh")), 1, 7), 16, 10).cast("long") * (1L << 28) +
          conv(substring(md5(col("sh")), 8, 7), 16, 10).cast("long")).as("h"))
      else base.select(col("doc_id"), xxhash64(col("sh")).as("h"))
    val nBits = if (portable) 56 else 64
    val bitSums = (0 until nBits).map { bit =>
      sum(when(shiftright(col("h"), bit).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"b$bit")
    }
    val fp = (0 until nBits).map { bit =>
      when(col(s"b$bit") > 0, lit(1L << bit)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
    hashed.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), fp.as("fp"))
  }

  /** SimHash near-dup candidates: docs whose fingerprints agree on at least
    * `64 - maxHammingDistance` bits, found via block-permutation LSH — the
    * 64-bit fingerprint splits into `blocks` blocks; Hamming distance <= d
    * implies at least one of the (blocks choose identical) blocks matches
    * exactly when blocks > d, so blocking on each 16-bit quarter finds all
    * pairs with distance <= 3.
    */
  def simhashCandidates(docs: DataFrame, maxHammingDistance: Int = 3,
                        id: Column = col("doc_id"),
                        text: Column = col("text"),
                        portable: Boolean = false,
                        maxBucket: Int = MaxBucketMembers): DataFrame =
    simhashCandidatesFromSigs(simhashTable(docs, 2, id, text, portable),
      maxHammingDistance, portable, maxBucket)

  /** [[simhashCandidates]] over an existing fingerprint table
    * (doc_id, fp) — the entry point for a maintained simhash store, so
    * consumers pair against the resident fingerprints instead of
    * re-shingling the corpus (mirrors [[minhashCandidatesFromSigs]]). */
  def simhashCandidatesFromSigs(printed: DataFrame,
                                maxHammingDistance: Int = 3,
                                portable: Boolean = false,
                                maxBucket: Int = MaxBucketMembers): DataFrame = {
    val blocks = maxHammingDistance + 1
    val bitsPerBlock = (if (portable) 56 else 64) / blocks
    val blocked = printed.select(col("doc_id"), col("fp"),
        explode(array((0 until blocks).map { blk =>
          struct(lit(blk).as("blk"),
            shiftright(col("fp"), blk * bitsPerBlock)
              .bitwiseAND((1L << bitsPerBlock) - 1).as("key"))
        }: _*)).as("bb"))
      .select(col("doc_id"), col("fp"), col("bb.blk"), col("bb.key"))
    bucketPairs(blocked, Seq("blk", "key"), struct(col("doc_id"), col("fp")),
        maxBucket)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      .groupBy("id_a", "id_b").agg(min("hamming").as("hamming"))
      .filter(col("hamming") <= maxHammingDistance)
  }

  // ------------------------------------------------------- exact verification

  /** Exact n-gram Jaccard similarity for given candidate pairs
    * (pairs: id_a, id_b). Joins the shingle sets back and computes
    * |A ∩ B| / |A ∪ B| with array algebra — only on candidates, never
    * all-pairs. */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, k: Int = 3,
                   id: Column = col("doc_id"),
                   text: Column = col("text")): DataFrame = {
    // CACHED (the dfOrderedSets discipline): both verification joins
    // read the shingle table — without the cache the corpus tokenizes
    // and shingles twice per run. CacheManager dedup keys on the
    // canonicalized plan (q59/q60 over the same corpus share one
    // materialization); blocks stay evictable, and the bench's post-
    // pair clearCache bounds the session footprint.
    val sh = docs.select(id.as("doc_id"), shingles(text, k).as("sh")).cache()
    pairs
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
  }

  /** Shared foundation of the prefix-filter joins ([[jaccardJoin]],
    * [[containmentJoin]]): per-doc distinct shingle sets as arrays in
    * ONE global total order, with set sizes.
    *
    * Tokens are xxhash64'd up front: the prefix filter only needs SOME
    * consistent global total order, so (df, hash) serves as well as
    * (df, string) — and every downstream stage (join keys, the pair
    * distinct, the verification array_intersect) runs on longs instead
    * of ~20-byte shingle strings. Outputs of both joins are set SIZES
    * only, so results stay engine-portable (a 64-bit collision, ~1e-11
    * at 1e5 distinct shingles, is the same accepted risk as the
    * xxhash64 fingerprint family). Docs with no shingles have no set
    * and join nothing.
    *
    * CACHED: each caller reads it three times (prefix/index generation
    * and the two verification joins) — without the cache the whole
    * shingle+df+sort pipeline would re-read the corpus three times.
    * cache() deliberately, not localCheckpoint: the CacheManager
    * dedupes by canonicalized plan, so repeated joins over the same
    * corpus reuse one materialization, and blocks are evictable under
    * storage-memory pressure. The trade is a session-lifetime catalog
    * entry per distinct corpus — a long-running service cycling MANY
    * corpora should spark.catalog.clearCache() between them (the bench
    * does). */
  private def dfOrderedSets(docs: DataFrame, k: Int, id: Column,
                            text: Column): DataFrame = {
    val toks = docs
      .select(id.as("doc_id"), explode(shingles(text, k)).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    toks.join(freq, "tok")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("ts"))
      .select(col("doc_id"),
        transform(col("ts"), s => s.getField("tok")).as("toks"),
        size(col("ts")).as("n"))
      .cache()
  }

  /** `|d| - ceil(t * |d|) + 1` — the prefix-filter length for a
    * rational threshold tNum/tDen over a set of size `n`. */
  private def prefixFilterLen(tNum: Int, tDen: Int): Column =
    col("n") -
      floor((lit(tNum) * col("n") + lit(tDen - 1)).cast("double") / lit(tDen))
        .cast("int") + lit(1)

  /** EXACT Jaccard set-similarity self-join via prefix filtering
    * (PPJoin-family; Chaudhuri et al. 2006, Xiao et al. 2008): every
    * pair of documents whose distinct-token Jaccard is >= tNum/tDen, and
    * ONLY those — no LSH approximation, no all-pairs blowup.
    *
    * Prefix-filter principle: order every document's tokens by one
    * GLOBAL total order (the (df asc, hash) order of [[dfOrderedSets]]
    * — rare tokens first, which minimizes candidates) and emit only its
    * first `|d| - ceil(t*|d|) + 1` tokens as join keys. Any pair with
    * J >= t must share at least one token within both prefixes, so the
    * equi-join on prefix tokens finds every qualifying pair; a length
    * filter (`min*tDen >= max*tNum`, necessary for J >= t) prunes
    * candidates before exact verification over the full token arrays.
    *
    * The threshold is a RATIONAL tNum/tDen and every filter is integer
    * arithmetic (`ceil(t*n) = (tNum*n + tDen - 1) div tDen`;
    * `inter*tDen >= union*tNum`), so the result is bit-reproducible on
    * any engine — the DuckDB oracle recomputes it as a brute-force
    * all-pairs join, which doubles as a completeness proof on the
    * driver data.
    *
    * Scale: one shuffle to build (doc, token) pairs, one tiny df
    * aggregate, one per-doc sort bounded by document length, then an
    * equi-join whose key cardinality is the token space (rare-first
    * prefixes keep bucket sizes small; a stop-word never enters a
    * prefix unless a doc is nearly all stop-words). Verification runs
    * on candidates only.
    */
  def jaccardJoin(docs: DataFrame, tNum: Int, tDen: Int, k: Int = 3,
                  id: Column = col("doc_id"),
                  text: Column = col("text")): DataFrame = {
    require(0 < tNum && tNum <= tDen, s"$tNum/$tDen")
    // set elements are the distinct k-shingles (same set the minhash
    // family approximates — this operator is its exact counterpart)
    val sorted = dfOrderedSets(docs, k, id, text)
    val prefixLen = prefixFilterLen(tNum, tDen)
    val prefixes = sorted
      .select(col("doc_id"), col("n"),
        posexplode(slice(col("toks"), lit(1), prefixLen)).as(Seq("p0", "tok")))
      .select(col("doc_id"), col("n"), col("tok"), (col("p0") + 1).as("p"))
    // PPJoin positional filter on top of the length filter: for the FIRST
    // common token of a pair (positions pa/pb in the shared global order)
    // the overlap can't exceed 1 + min(n_a - pa, n_b - pb); J >= tNum/tDen
    // needs overlap*(tNum+tDen) >= tNum*(n_a+n_b). Applying the bound to
    // EVERY matched prefix row is sound: later matches only tighten it,
    // so a pair survives iff its first-match row does — and the candidate
    // set (hence the verified result) is unchanged, just smaller before
    // the distinct and the verification joins.
    val cand = prefixes.alias("a")
      .join(prefixes.alias("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.n"), col("b.n")) * tDen >=
            greatest(col("a.n"), col("b.n")) * tNum &&
          (lit(1) + least(col("a.n") - col("a.p"), col("b.n") - col("b.p"))) *
            (tNum + tDen) >= (col("a.n") + col("b.n")) * tNum)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // exact verification over full (distinct) token arrays, candidates only
    cand
      .join(sorted.select(col("doc_id").as("id_a"), col("toks").as("t_a"),
        col("n").as("n_a")), "id_a")
      .join(sorted.select(col("doc_id").as("id_b"), col("toks").as("t_b"),
        col("n").as("n_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("t_a"), col("t_b"))))
      .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
      .filter(col("inter") * tDen >= col("uni") * tNum)
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / col("uni").cast("double")).as("jaccard"))
  }

  /** EXACT set-CONTAINMENT self-join via prefix filtering: every ORDERED
    * pair (a, b), a != b, where containment
    * `C(a in b) = |A ∩ B| / |A| >= tNum/tDen` — the asymmetric member of
    * the set-similarity family (Jaccard = resemblance, this = Broder's
    * containment). Resemblance misses a short document pasted into a long
    * one (the union is dominated by the long side); containment is the
    * operator that finds quotes, excerpts, and wrapped copies.
    *
    * Candidate generation adapts the prefix filter to asymmetry: tokens
    * ordered by the SAME global (df asc, hash) order as [[jaccardJoin]]
    * (the shared [[dfOrderedSets]] state);
    * the PROBE side (a) may miss at most `n_a - ceil(t*n_a)` of its
    * tokens, so its first `n_a - ceil(t*n_a) + 1` tokens must intersect
    * B — but B's size is unconstrained by containment, so the b side
    * joins its FULL token list (an inverted index), not a prefix. Two
    * integer filters prune before verification:
    *  - size: `|A ∩ B| <= n_b`, so `n_b * tDen >= n_a * tNum`;
    *  - positional (PPJoin-style, sound for the pair's first common
    *    token in the global order and only tightened by later ones):
    *    `1 + min(n_a - pa, n_b - pb) >= ceil(t * n_a)`.
    *
    * Everything is integer arithmetic on a rational threshold
    * (`ceil(t*n) = (tNum*n + tDen - 1) div tDen`;
    * `inter * tDen >= n_a * tNum`), so the DuckDB oracle recomputes it
    * brute-force all-pairs — a completeness proof on the driver data.
    *
    * Scale: same skeleton as [[jaccardJoin]] — one shuffle to (doc,
    * token), a tiny df aggregate, per-doc sorts bounded by doc length.
    * The asymmetric join is probe-prefix × full-index, so its cost is
    * sum over prefix tokens of posting-list length; rare-first ordering
    * keeps probe prefixes off the stop words, and the positional filter
    * kills the long-posting matches a stop word would produce. */
  def containmentJoin(docs: DataFrame, tNum: Int, tDen: Int, k: Int = 3,
                      id: Column = col("doc_id"),
                      text: Column = col("text")): DataFrame = {
    require(0 < tNum && tNum <= tDen, s"$tNum/$tDen")
    val sorted = dfOrderedSets(docs, k, id, text)
    val needA = // ceil(t * n_a), the overlap a qualifying pair must reach
      ((lit(tNum) * col("a.n") + lit(tDen - 1)) / lit(tDen)).cast("long")
    val prefixLen = prefixFilterLen(tNum, tDen)
    val probe = sorted
      .select(col("doc_id"), col("n"),
        posexplode(slice(col("toks"), lit(1), prefixLen)).as(Seq("p0", "tok")))
      .select(col("doc_id"), col("n"), col("tok"), (col("p0") + 1).as("p"))
    val index = sorted
      .select(col("doc_id"), col("n"),
        posexplode(col("toks")).as(Seq("p0", "tok")))
      .select(col("doc_id"), col("n"), col("tok"), (col("p0") + 1).as("p"))
    val cand = probe.alias("a")
      .join(index.alias("b"),
        col("a.tok") === col("b.tok") &&
          col("a.doc_id") =!= col("b.doc_id") &&
          col("b.n") * tDen >= col("a.n") * tNum &&
          lit(1) + least(col("a.n") - col("a.p"), col("b.n") - col("b.p"))
            >= needA)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    cand
      .join(sorted.select(col("doc_id").as("id_a"), col("toks").as("t_a"),
        col("n").as("n_a")), "id_a")
      .join(sorted.select(col("doc_id").as("id_b"), col("toks").as("t_b")),
        "id_b")
      .withColumn("inter", size(array_intersect(col("t_a"), col("t_b"))))
      .filter(col("inter") * tDen >= col("n_a") * tNum)
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / col("n_a").cast("double"))
          .as("containment"))
  }

  /** Embedding-cosine near-dup over LSH-bucketed candidates: vectors
    * sharing a random-hyperplane sign bucket are compared; pairs with
    * cosine >= `threshold` survive. Never all-pairs — the self-join is
    * co-partitioned on the bucket key. */
  def embeddingNearDupLsh(vectors: DataFrame, dim: Int,
                          threshold: Double, nPlanes: Int = 8): DataFrame = {
    val bucketed = vectors.select(col("vec_id"), col("embedding"),
      Similarity.norm(col("embedding")).as("nrm"),
      Similarity.rpBucket(col("embedding"), dim, nPlanes).as("bucket"))
    val a = bucketed.alias("a")
    val b = bucketed.alias("b")
    a.join(b, col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        (Similarity.dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * cluster the corpus with deterministic k-means
    * ([[Similarity.kmeansAssign]]), compare embeddings only WITHIN each
    * cluster, and drop every vector that has a smaller-id neighbor above
    * the cosine threshold. The clustering is what makes this tractable at
    * scale — the quadratic pair search runs per cluster (the k-means
    * shuffle key), never across the corpus, and the keep-lowest-id rule
    * needs only the candidate pairs, not connected components.
    *
    * SIZE `k` WITH THE CORPUS: the pair stage materializes ~n^2/(2k)
    * rows, so k must grow so that n/k (the mean cluster size) stays a
    * few thousand — the paper's own regime (50k clusters for 100M+
    * docs). k also sets the join's shuffle-key cardinality: a small k
    * over a big corpus funnels everything through k partitions.
    * EmbedBench soaks 200k vectors at k=256 (~780 vectors/cluster);
    * k=16 over the same corpus is 16x the pairs through 16 keys.
    *
    * Returns the KEPT rows (vec_id, cluster). Fully deterministic, so the
    * DuckDB oracle replays the whole chain: seeds, Lloyd iterations,
    * within-cluster pairs, the drop set.
    */
  def semDedup(vectors: DataFrame, k: Int, iters: Int, tau: Double): DataFrame =
    semDedupWith(vectors,
      Similarity.kmeansCentroids(vectors, k, iters), tau)

  /** [[semDedup]] against EXPLICIT centroids — the core both the
    * one-shot and the incremental paths share, so their equivalence is
    * structural. */
  def semDedupWith(vectors: DataFrame, centroids: Array[Array[Double]],
                   tau: Double): DataFrame = {
    // assignTo already carries the embedding — no join back to `vectors`
    // (re-attaching a column the projection just dropped would shuffle
    // the whole corpus twice for nothing)
    val withVec = Similarity.assignTo(vectors, centroids)
      .select(col("vec_id"), col("cluster"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"))
    val asg = withVec.select(col("vec_id"), col("cluster"))
    val a = withVec.alias("a")
    val b = withVec.alias("b")
    val dropped = a.join(b, col("a.cluster") === col("b.cluster") &&
        col("a.vec_id") < col("b.vec_id"))
      .filter((Similarity.dot(col("a.embedding"), col("b.embedding")) /
        (col("a.nrm") * col("b.nrm"))) >= tau)
      .select(col("b.vec_id").as("vec_id")).distinct()
    asg.join(dropped, Seq("vec_id"), "left_anti")
  }

  /** Incremental SemDeDup vs a persisted vector store — the embedding
    * mirror of [[incrementalMinhashCandidates]]: centroids are FIXED
    * (from the initial corpus build), the store holds the assignment of
    * EVERY past vector (kept or dropped — exactly like the signature
    * store retains dropped docs' signatures, so a late arrival can
    * match a document that itself lost an earlier comparison), and only
    * the batch is assigned and compared: batch-vs-store within
    * batch-touched clusters plus batch-vs-batch. A batch vector drops
    * iff it has a smaller-id neighbor >= tau in (store ∪ batch) in its
    * cluster — with arrival-ordered ids that is EXACTLY the one-shot
    * [[semDedupWith]] condition restricted to the batch, so
    * `incremental(store, batch) == semDedupWith(all) ∩ batch`
    * (LlmOpsSpec pins it). The store never recomputes a dot against
    * itself: store rows outside batch-touched clusters are
    * semi-join-pruned before any pair forms.
    *
    * @param storeAsg (vec_id, cluster, embedding) of every past vector
    *                 — persist [[Similarity.assignTo]]'s output
    */
  def semDedupIncremental(storeAsg: DataFrame, batch: DataFrame,
                          centroids: Array[Array[Double]],
                          tau: Double): DataFrame =
    semDedupIncrementalFromAssigned(storeAsg,
      Similarity.assignTo(batch, centroids)
        .select(col("vec_id"), col("cluster"), col("embedding")), tau)

  /** [[semDedupIncremental]] starting from the batch's precomputed
    * assignment — the entry point when the caller also persists the
    * assignment (the streaming maintainer), so each batch is assigned
    * exactly once. `batchAsg`: (vec_id, cluster, embedding). */
  def semDedupIncrementalFromAssigned(storeAsg: DataFrame,
                                      batchAsg: DataFrame,
                                      tau: Double): DataFrame = {
    val touched = batchAsg.select("cluster").distinct()
    val older = storeAsg
      .select(col("vec_id"), col("cluster"), col("embedding"))
      .join(broadcast(touched), Seq("cluster"), "left_semi")
      .unionByName(batchAsg)
      .select(col("vec_id"), col("cluster"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"))
    val newer = batchAsg
      .select(col("vec_id"), col("cluster"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"))
    val dropped = older.alias("a").join(newer.alias("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") < col("b.vec_id"))
      .filter((Similarity.dot(col("a.embedding"), col("b.embedding")) /
        (col("a.nrm") * col("b.nrm"))) >= tau)
      .select(col("b.vec_id").as("vec_id")).distinct()
    batchAsg.select(col("vec_id"), col("cluster"))
      .join(dropped, Seq("vec_id"), "left_anti")
  }

  /** Duplicate clusters from near-dup candidate pairs: connected
    * components by iterative min-label propagation — each doc's component
    * id converges to the smallest doc id reachable through the pair
    * graph, which is the canonical-representative choice for dedup
    * ("keep the lowest id of every duplicate cluster").
    *
    * Scale shape: per iteration one join + one aggregation over the edge
    * list; iterations bounded by the largest component's diameter (near-
    * dup clusters are shallow — a handful of rounds in practice, `maxIter`
    * as the safety bound). Deterministic regardless of partitioning, so
    * the DuckDB oracle can recompute it with a recursive CTE.
    *
    * @param edges undirected candidate pairs (id_a, id_b)
    * @return (doc_id, comp_id) for every doc appearing in any pair
    */
  def duplicateClusters(edges: DataFrame, maxIter: Int = 50,
                        localThreshold: Long = 1000000L,
                        edgesDistinct: Boolean = false): DataFrame = {
    require(localThreshold >= 0 && localThreshold < Int.MaxValue,
      s"localThreshold $localThreshold must fit a bounded collect")
    // Near-dup edge lists are normally FAR smaller than the corpus (the
    // whole point of LSH candidate generation), so when the deduplicated
    // edge list fits comfortably on the driver, a local union-find beats
    // ~log(diameter) distributed rounds of fixed scheduling overhead.
    // The distributed loop below remains the path for degenerate corpora
    // whose candidate graphs are themselves huge.
    // `edgesDistinct = true` skips the dedup exchange — every
    // minhash/simhash candidate generator already ends in a
    // groupBy(id_a, id_b), so its output is distinct BY CONSTRUCTION
    // and the extra shuffle is one more fixed-cost stage per streaming
    // micro-batch. Union-find is idempotent under duplicate edges, so a
    // wrong `true` can only waste probe budget, never change clusters.
    val dedupedEdges = {
      val e = edges.select(col("id_a").cast("long"), col("id_b").cast("long"))
      (if (edgesDistinct) e else e.distinct()).cache()
    }
    // Bounded path decision over the CACHED edge frame: count, then
    // collect when under threshold. A `limit(N+1).collect()` probe was
    // measured costing ~4 serial jobs per invocation (CollectLimit's
    // incremental partition rounds: 1, 4, 16, all — each a driver
    // round-trip; q67-style maintenance pipelines invoke this three
    // times, streaming sinks once per micro-batch). count + collect are
    // exactly TWO single-round parallel jobs over the cache the frame
    // pays for anyway, and the count doubles as the cache
    // materialization. Driver memory stays bounded: the collect only
    // runs when the count is under the threshold.
    val edgeCount = dedupedEdges.count()
    if (edgeCount <= localThreshold) {
      val probe = dedupedEdges.collect()
      val pairs = probe.map(r => (r.getLong(0), r.getLong(1)))
      dedupedEdges.unpersist()
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      pairs.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val spark = edges.sparkSession
      // a BARE LocalRelation (no renaming Project on top), so callers
      // can detect the local path via Dataset.isLocal and collect the
      // components without a Spark job (the streaming router does)
      return spark.createDataFrame(
        java.util.Arrays.asList(parent.keys.toSeq.map(id =>
          org.apache.spark.sql.Row(id, find(id))): _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("comp_id",
            org.apache.spark.sql.types.LongType, nullable = false))))
    }
    val sym = dedupedEdges.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionByName(dedupedEdges.select(col("id_b").as("u"), col("id_a").as("v")))
      .cache()
    var labels = sym.select(col("u").as("id")).distinct()
      .withColumn("comp", col("id")).cache()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // step 1: pull the minimum label across direct neighbors
      val neighborMin = sym
        .join(labels.select(col("id").as("v"), col("comp").as("vcomp")), "v")
        .groupBy(col("u").as("id")).agg(min("vcomp").as("ncomp"))
      val pulled = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
      // step 2: shortcut — jump to the label OF the label (pointer
      // halving). Plain neighbor propagation needs diameter-many rounds;
      // with shortcutting the pointer chains halve each round, so
      // convergence is O(log diameter) — the difference between ~20 and
      // ~5 rounds on long near-dup chains.
      val byComp = pulled.select(col("id").as("cid"), col("comp").as("ccomp"))
      val updated = pulled
        .join(byComp, pulled("comp") === byComp("cid"), "left")
        .select(pulled("id"),
          least(pulled("comp"), coalesce(col("ccomp"), pulled("comp"))).as("comp"))
        .cache()
      changed = updated.join(labels.withColumnRenamed("comp", "prev"), "id")
        .filter(col("comp") =!= col("prev")).count()
      labels.unpersist()
      labels = updated
      iter += 1
    }
    sym.unpersist()
    dedupedEdges.unpersist()
    labels.select(col("id").as("doc_id"), col("comp").as("comp_id"))
  }

  /** The end-to-end user-facing dedup: drop every document that belongs
    * to a near-dup cluster but is not its canonical (minimum-id)
    * representative. Composes candidate generation (caller's choice of
    * edges) with [[duplicateClusters]]; docs untouched by any pair pass
    * through — the anti-join only carries the (small) non-representative
    * id set. */
  def dedupCorpus(docs: DataFrame, edges: DataFrame,
                  id: Column = col("doc_id"),
                  edgesDistinct: Boolean = false): DataFrame = {
    val drop = duplicateClusters(edges, edgesDistinct = edgesDistinct)
      .filter(col("doc_id") =!= col("comp_id"))
      .select(col("doc_id"))
    docs.join(drop, docs(id.toString) === drop("doc_id"), "left_anti")
  }

  /** Leakage-free train/validation/test split: every document is
    * assigned a split by the md5 bucket of its duplicate-CLUSTER
    * representative, not of its own id — so all members of a near-dup
    * cluster land in the SAME split by construction. A per-doc hash
    * split (the q55 shape) leaks: two near-identical documents hash
    * independently and straddle the train/eval boundary, which is
    * exactly the contamination a decontamination pass later has to
    * claw back. Splitting on the cluster id closes that hole at
    * assignment time.
    *
    * `cuts` are ascending exclusive upper bounds over the md5 bucket
    * mod 100 (e.g. `Seq("train" -> 80, "validation" -> 90)`); buckets
    * at or above the last cut fall to `lastSplit`. Documents in no
    * near-dup pair are their own singleton cluster, so the assignment
    * law marginally matches the per-doc split on clean data.
    *
    * Scale shape: cluster labels come from [[duplicateClusters]] over
    * the (LSH-sized, far-sub-corpus) edge list; the corpus itself sees
    * ONE left equi-join against that membership table and a scan-local
    * hash CASE. Deterministic across runs, engines, and partitionings
    * — the DuckDB oracle replays label + bucket + CASE exactly.
    */
  def leakSafeSplit(docs: DataFrame, edges: DataFrame,
                    cuts: Seq[(String, Int)], lastSplit: String,
                    id: Column = col("doc_id"),
                    edgesDistinct: Boolean = false): DataFrame = {
    validateCuts(cuts)
    val comps = duplicateClusters(edges, edgesDistinct = edgesDistinct)
      .select(col("doc_id").as("__cid"), col("comp_id"))
    val withCluster = docs.select(id.cast("long").as("doc_id"))
      .join(comps, col("doc_id") === col("__cid"), "left")
      .select(col("doc_id"),
        coalesce(col("comp_id"), col("doc_id")).as("cluster_id"))
    withCluster.withColumn("split", hashSplit(col("cluster_id"), cuts, lastSplit))
  }

  private def validateCuts(cuts: Seq[(String, Int)]): Unit = {
    require(cuts.nonEmpty, "at least one cut")
    require(cuts.map(_._2) == cuts.map(_._2).sorted &&
      cuts.map(_._2).distinct == cuts.map(_._2),
      s"cuts must be strictly ascending: ${cuts.map(_._2)}")
    // a non-positive first cut is an unreachable split — a typo'd
    // percentage must fail fast, not silently empty a split
    require(cuts.head._2 >= 1 && cuts.last._2 <= 100,
      s"cuts are percentages in [1, 100]: ${cuts.map(_._2)}")
  }

  /** The shared md5-bucket split law: `bucket(key) mod 100` against the
    * ascending cut chain. */
  private def hashSplit(key: Column, cuts: Seq[(String, Int)],
                        lastSplit: String): Column = {
    val b = Sampling.hashBucket(key) % 100
    cuts.foldRight(lit(lastSplit)) { case ((name, cut), tail) =>
      when(b < cut, lit(name)).otherwise(tail)
    }
  }

  /** Incremental leak-safe split — the ASSIGNMENT-STABLE production
    * form of [[leakSafeSplit]]. The one-shot law is not stable under
    * corpus growth: a cluster's min-id representative (and so its hash
    * bucket) can change when a later batch merges clusters, silently
    * FLIPPING already-published splits — poison for any consumer that
    * has trained on them. Here prior assignments are immutable inputs:
    *
    *  - a batch doc whose near-dup component touches the store INHERITS
    *    a stored split (the split of the smallest stored member id —
    *    deterministic under any partitioning), never re-hashes;
    *  - if the component touches stored docs with CONFLICTING splits
    *    (two stored clusters, previously split apart, merged by a new
    *    bridge doc — boundary leakage that already materialized), the
    *    batch doc still takes the deterministic pick and the row is
    *    flagged `conflicted` (with the raw `n_store_splits` count) so
    *    the caller can quarantine or retrain instead of discovering the
    *    leak downstream. Conflict is STICKY across batches when the
    *    caller feeds back `conflictedIds` (the member ids of previously
    *    conflicted components, e.g. [[graft.stream.StreamingSplitRouter]]'s
    *    `split_conflicts` table): any component touching one is flagged
    *    even when the splits it directly sees agree — without this, a
    *    later near-dup of ONE side of a flagged merge sails through
    *    unflagged;
    *  - a component with no stored member is new: its members hash by
    *    the batch-local cluster representative, exactly the one-shot
    *    law (the two agree on a fresh store — spec-pinned).
    *
    * Inputs: `assigned` is the persisted (doc_id, split) store; `edges`
    * are candidate pairs with endpoints in batch ∪ store (the
    * [[incrementalMinhashCandidates]] output — batch-only hashing, the
    * store never re-shingles). Output: one row per batch doc
    * (doc_id, cluster_id, split, inherited, n_store_splits, conflicted).
    *
    * Scale shape: components over the (batch-sized) incremental edge
    * list; ONE join against the assignment store restricted to those
    * components' members (store rows outside touched components never
    * move); per-component inheritance is a groupBy over the touched
    * members, broadcast back over the batch. Nothing rescans the corpus.
    */
  def incrementalLeakSafeSplit(assigned: DataFrame, batchDocs: DataFrame,
                               edges: DataFrame, cuts: Seq[(String, Int)],
                               lastSplit: String,
                               id: Column = col("doc_id"),
                               conflictedIds: Option[DataFrame] = None,
                               compsOpt: Option[DataFrame] = None,
                               edgesDistinct: Boolean = false)
      : DataFrame = {
    validateCuts(cuts)
    // (doc_id, comp_id) for edge docs. A caller that also needs the
    // components (the streaming router's conflict closure) passes them
    // in — recomputing them here would run the whole candidate-edge
    // lineage a second time per batch.
    val comps = compsOpt.getOrElse(
      duplicateClusters(edges, edgesDistinct = edgesDistinct))
    // stored members of touched components -> per-component inherited
    // split: the split of the smallest stored member id. min(struct) is
    // the argmin with one combiner cell per component.
    val inherited = comps
      .join(assigned.select(col("doc_id"),
        col("split").as("__stored_split")), "doc_id")
      .groupBy(col("comp_id"))
      .agg(min(struct(col("doc_id").as("i"), col("__stored_split").as("s")))
          .as("__m"),
        countDistinct(col("__stored_split")).as("n_store_splits"))
      .select(col("comp_id"), col("__m.s").as("__inherit"),
        col("n_store_splits"))
    // components touching a known-compromised doc id: the conflict flag
    // must PROPAGATE — a doc joining a cluster whose boundary leak was
    // flagged in an earlier batch is itself compromised, even when the
    // stored splits it directly touches agree (the review-found hole:
    // batch 1 flags the bridge, batch 2's near-dup of one side sees one
    // split and sailed through unflagged)
    val tainted = conflictedIds.map(c => comps
      .join(c.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("comp_id")).distinct()
      .withColumn("__tainted", lit(true)))
    val b = batchDocs.select(id.cast("long").as("doc_id"))
      .join(comps.select(col("doc_id").as("__cid"), col("comp_id")),
        col("doc_id") === col("__cid"), "left")
      .select(col("doc_id"),
        coalesce(col("comp_id"), col("doc_id")).as("cluster_id"))
    val joined = b
      .join(inherited, b("cluster_id") === inherited("comp_id"), "left")
    val withTaint = tainted match {
      case None => joined.withColumn("__tainted", lit(false))
      case Some(t) =>
        joined.join(t, joined("cluster_id") === t("comp_id"), "left")
          .withColumn("__tainted", coalesce(col("__tainted"), lit(false)))
    }
    withTaint.select(col("doc_id"), col("cluster_id"),
      coalesce(col("__inherit"),
        hashSplit(col("cluster_id"), cuts, lastSplit)).as("split"),
      col("__inherit").isNotNull.as("inherited"),
      coalesce(col("n_store_splits"), lit(0L)).as("n_store_splits"),
      (coalesce(col("n_store_splits"), lit(0L)) > 1 || col("__tainted"))
        .as("conflicted"))
  }

  /** [[incrementalLeakSafeSplit]] with the TOUCHED-COMPONENT store
    * state COLLECTED to the driver — the streaming micro-batch form.
    * Same law, same outputs (spec-pinned equal): the per-component
    * inherited split (min-stored-member argmin), the distinct-stored-
    * split count, and the sticky-taint marks are all bounded by the
    * batch's components (every component holds ≥ 1 batch doc), so they
    * are METADATA — one small action fetches them (a single union'd
    * scan of the assignment + conflict stores, both pruned to the
    * broadcast edge-doc set), and the assignment plan itself becomes a
    * pure narrow map over the batch against one literal per-edge-doc
    * state table: no store scan, no groupBy, no broadcast
    * materialization inside the caller's append action. The caller
    * also gets the conflicted components FOR FREE (driver-known), so
    * deciding the conflict-closure branch costs zero Spark actions —
    * read them back via [[LeakSafeBatchState.conflictedComps]].
    *
    * `comps` must be the LOCAL (probe-path) [[duplicateClusters]]
    * output collected by the caller; degenerate batches whose edge
    * graph overflowed to the distributed path should keep using
    * [[incrementalLeakSafeSplit]]. */
  final case class LeakSafeBatchState(assignments: DataFrame,
                                      conflictedComps: Set[Long],
                                      compMembers: Map[Long, Seq[Long]])

  def incrementalLeakSafeSplitCollected(
      assigned: DataFrame, batchDocs: DataFrame,
      comps: Array[(Long, Long)], cuts: Seq[(String, Int)],
      lastSplit: String, id: Column = col("doc_id"),
      conflictedIds: Option[DataFrame] = None): LeakSafeBatchState = {
    validateCuts(cuts)
    val spark = batchDocs.sparkSession
    import org.apache.spark.sql.types._
    val docToComp = comps.toMap
    val edgeDocIds = spark.createDataFrame(
      java.util.Arrays.asList(comps.map(c =>
        org.apache.spark.sql.Row(c._1)): _*),
      StructType(Seq(StructField("doc_id", LongType, nullable = false))))
    // ONE action: inherited stats per touched component + raw taint
    // hits, union'd into one shape — both sides prune their store scan
    // with the broadcast edge-doc literal
    val inh = assigned.select(col("doc_id"), col("split"))
      .join(broadcast(edgeDocIds), Seq("doc_id"), "left_semi")
      .select(lit("inh").as("kind"), col("doc_id"), col("split"))
    val tnt = conflictedIds.map(_.select(col("doc_id"))
        .join(broadcast(edgeDocIds), Seq("doc_id"), "left_semi")
        .select(lit("tnt").as("kind"), col("doc_id"),
          lit(null).cast("string").as("split")))
    val rows = tnt.map(inh.unionByName(_)).getOrElse(inh).collect()
    // driver-side replay of the original's aggregations: inherited =
    // split of the MIN stored member id per component; n_store_splits =
    // distinct stored splits; tainted = any member in the conflict set
    val byComp = rows.filter(_.getString(0) == "inh")
      .map(r => (docToComp(r.getLong(1)), r.getLong(1), r.getString(2)))
      .groupBy(_._1)
    // (doc_id, split) lexicographic min — exactly the original's
    // min(struct(doc_id, split)), deterministic even if the caller's
    // `assigned` carries duplicate doc_id rows
    val inhSplit = byComp.map { case (c, ms) =>
      c -> ms.minBy(m => (m._2, m._3))._3 }
    val nSplits = byComp.map { case (c, ms) =>
      c -> ms.map(_._3).distinct.length.toLong }
    val taintedComps = rows.filter(_.getString(0) == "tnt")
      .map(r => docToComp(r.getLong(1))).toSet
    val conflicted = taintedComps ++
      nSplits.collect { case (c, n) if n > 1 => c }
    // literal per-edge-doc state; non-edge docs fall through the left
    // join to (own id, hash split, clean)
    val stateRows = comps.map { case (d, c) =>
      org.apache.spark.sql.Row(d, c, inhSplit.get(c).orNull,
        nSplits.getOrElse(c, 0L), conflicted.contains(c))
    }
    val state = spark.createDataFrame(
      java.util.Arrays.asList(stateRows: _*),
      StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("__comp", LongType, nullable = false),
        StructField("__inherit", StringType, nullable = true),
        StructField("__n", LongType, nullable = false),
        StructField("__conf", BooleanType, nullable = false))))
    val assignments = batchDocs.select(id.cast("long").as("doc_id"))
      .join(broadcast(state), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__comp"), col("doc_id")).as("cluster_id"),
        coalesce(col("__inherit"),
          hashSplit(coalesce(col("__comp"), col("doc_id")), cuts, lastSplit))
          .as("split"),
        col("__inherit").isNotNull.as("inherited"),
        coalesce(col("__n"), lit(0L)).as("n_store_splits"),
        coalesce(col("__conf"), lit(false)).as("conflicted"))
    LeakSafeBatchState(assignments, conflicted,
      comps.groupBy(_._2).map { case (c, ms) => c -> ms.map(_._1).toSeq })
  }

  /** Content-hash split for documents TOO SHORT to shingle (< k
    * tokens): the md5 bucket of the NORMALIZED text decides the split,
    * so byte-identical (and whitespace/case-variant) short documents
    * always land in the same split with no store and no pairing —
    * closing the hole where shingle-less docs can never form a MinHash
    * candidate edge and two identical copies would hash independently
    * by id to opposite sides of the train/eval boundary. Near-identical
    * (not identical after normalization) short docs can still straddle;
    * with fewer than k tokens n-gram similarity is undefined, so that
    * residual is inherent to the representation, not the law.
    */
  def contentHashSplit(docs: DataFrame, cuts: Seq[(String, Int)],
                       lastSplit: String, id: Column = col("doc_id"),
                       text: Column = col("text")): DataFrame = {
    validateCuts(cuts)
    docs.select(id.cast("long").as("doc_id"),
      hashSplit(normalized(text), cuts, lastSplit).as("split"))
  }

  /** Quality-aware canonical selection: one row per duplicate cluster
    * naming the member that wins on (score DESC, doc id ASC) — the
    * "keep the BEST copy" dedup policy, where [[dedupCorpus]] keeps the
    * minimum id. The score must be integral (exactness across engines);
    * length, token count, or a quality grade all fit.
    *
    * Scale shape: cluster labels over the edge list, one equi-join
    * moving only (id, score) — never text — and one groupBy whose
    * struct-max partial-aggregates map-side. No per-cluster window, no
    * sort: a struct max of (score, -id) IS the argmax with the id
    * tiebreak, and a billion-member cluster costs one combiner cell.
    */
  def canonicalDocs(docs: DataFrame, edges: DataFrame, score: Column,
                    id: Column = col("doc_id"),
                    edgesDistinct: Boolean = false): DataFrame = {
    requireIntegral(docs, score, "canonicalDocs score")
    val comps = duplicateClusters(edges, edgesDistinct = edgesDistinct)
    val members = docs
      .select(id.cast("long").as("doc_id"), score.cast("long").as("__score"))
      .join(comps, "doc_id")
    members.groupBy(col("comp_id").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("__score").as("s"), (-col("doc_id")).as("negid")))
          .as("__best"))
      .select(col("cluster_id"), (-col("__best.negid")).as("canonical_id"),
        col("__best.s").as("best_score"), col("n_members"))
  }

  /** Per-document contamination fraction (the GPT-3 appendix-C
    * "dirtiness" readout): for every training document, how many of its
    * DISTINCT word k-grams also occur anywhere in the eval corpus —
    * exact integer numerator and denominator (`n_hit`, `n_grams`); the
    * fraction itself is the caller's division. [[decontaminate]] answers
    * "which docs overlap at all"; this grades HOW MUCH, which is what
    * thresholded scrub policies ("drop if >X% dirty") act on.
    *
    * Scale shape: the per-doc denominator is the shingle-array
    * cardinality computed INSIDE the scan (no shuffle); candidate grams
    * Bloom-prune inside their scan tasks against a constant-size bitmap
    * of the eval grams (no false negatives, so the exact join result is
    * unchanged); only the surviving sliver meets the eval gram set, and
    * one count groupBy lands the numerator. The eval side is read twice
    * (bloom build + verify join) — cache it when it is expensive.
    */
  def contaminationFraction(train: DataFrame, eval: DataFrame, k: Int = 5,
                            numBits: Int = 1 << 20, numHashes: Int = 4,
                            trainId: Column = col("doc_id"),
                            evalText: Column = col("text"),
                            trainText: Column = col("text")): DataFrame = {
    // no distinct on the eval grams (the bloomSemiJoin convention):
    // bit-or makes duplicate keys a no-op in the bloom build, and a
    // left_semi output is per-train-row regardless of build-side
    // multiplicity — a distinct would only add a gram-set shuffle
    val evalGrams = eval.select(explode(shingles(evalText, k)).as("g"))
    val bits = Sketches.bloomBuild(evalGrams, col("g"), numBits, numHashes)
    val totals = train.select(trainId.as("train_id"),
      coalesce(size(shingles(trainText, k)), lit(0)).cast("long").as("n_grams"))
    val hits = train
      .select(trainId.as("train_id"), explode(shingles(trainText, k)).as("g"))
      .filter(Sketches.bloomMightContain(bits, col("g"), numHashes))
      .join(evalGrams, Seq("g"), "left_semi")
      .groupBy("train_id").agg(count(lit(1)).as("n_hit"))
    totals.join(hits, Seq("train_id"), "left")
      .select(col("train_id"), col("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
  }

  /** Contamination SPAN report — the diagnostic [[contaminationFraction]]
    * can't give: per (train doc, eval doc) pair, the length of the
    * LONGEST contiguous shared token run, plus how many distinct runs
    * and aligned grams the pair shares. Gram-count overlap says "some
    * k-grams leak"; the max-run length separates quote-level incidental
    * overlap from wholesale copying (Lee et al. 2022's exact-substring
    * framing of decontamination, reported at pair granularity).
    *
    * Law: whitespace tokens ([[wsTokens]]) → all k-gram start positions
    * on both sides → equi-join on the gram TEXT (exact, no hash
    * collision caveat) → each match lands on a diagonal
    * `d = train_pos − eval_pos`; within a (pair, diagonal) group,
    * matched start positions are chained into maximal runs and a run
    * spanning starts `[st, en]` covers `en − st + k` tokens. Matched
    * starts on one diagonal can never sit 2..k apart — two overlapping
    * matched grams force every intermediate gram to match (their token
    * ranges pairwise agree), so the intermediate start position is
    * present too and the chain cut at gap > 1 is exact, not a
    * heuristic. Output: (train_id, eval_id, max_run_tokens, n_islands,
    * n_aligned_grams), pairs with `max_run_tokens >= minRunTokens`
    * (default k — every pair sharing any gram).
    *
    * Scale shape: the eval set is the SMALL side by contract (a
    * benchmark suite, not a second corpus — the [[contaminationFraction]]
    * convention) and its positioned grams broadcast, so the corpus'
    * grams are probed in their scan tasks and never shuffle; only
    * matched (ids, positions) rows — candidate-sized — reach the
    * chain-and-aggregate stage, grouped per (pair, diagonal) with the
    * [[dupSpans]] sorted-position island fold (no per-row window). For
    * eval sets past broadcast size, pre-prune with the Bloom pass of
    * [[contaminationFraction]] and shuffle on the gram key. */
  def contaminationSpans(train: DataFrame, eval: DataFrame, k: Int = 5,
                         minRunTokens: Int = 0,
                         trainId: Column = col("doc_id"),
                         evalId: Column = col("doc_id"),
                         trainText: Column = col("text"),
                         evalText: Column = col("text")): DataFrame = {
    require(k >= 1, s"k=$k")
    // (pos, gram) pairs built IN-ROW before the explode: the naive
    // explode-then-slice shape carries the whole token array on every
    // gram row (O(doc²) projected bytes through the stage). The build is
    // the native single-pass [[graft.expr.PositionedShingles]] expression
    // (wsTokens law, all starts, duplicates kept) — the HOF chain it
    // replaces (transform(sequence) + slice + array_join per position)
    // paid interpreted lambda dispatch and an array copy per gram on the
    // CORPUS side, ~2.5x the scan cost
    def positioned(df: DataFrame, id: Column, text: Column,
                   idName: String, posName: String): DataFrame =
      df.select(id.cast("long").as(idName),
          explode(graft.expr.PositionedShingles(text, k)).as("__pg"))
        .select(col(idName), col("__pg.p").as(posName),
          col("__pg.g").as("__g"))
    val tg = positioned(train, trainId, trainText, "train_id", "__ti")
    val eg = positioned(eval, evalId, evalText, "eval_id", "__ej")
    val seeds = tg.join(broadcast(eg), Seq("__g"))
      .select(col("train_id"), col("eval_id"),
        (col("__ti") - col("__ej")).as("__diag"), col("__ti"))
    // runs per (pair, diagonal): dupSpans' sorted-list island fold with
    // the gap > 1 cut (exact — see scaladoc); start/end lists zip 1:1
    val runs = seeds
      .groupBy(col("train_id"), col("eval_id"), col("__diag"))
      .agg(sort_array(collect_list(col("__ti"))).as("__ps"))
      .withColumn("__st", filter(col("__ps"),
        (p, i) => i === 0 || p - element_at(col("__ps"), i) > 1))
      .withColumn("__en", filter(col("__ps"),
        (p, i) => i === size(col("__ps")) - 1 ||
          element_at(col("__ps"), i + 2) - p > 1))
      .select(col("train_id"), col("eval_id"),
        explode(arrays_zip(col("__st"), col("__en"))).as("__r"))
      .select(col("train_id"), col("eval_id"),
        (col("__r.__en") - col("__r.__st") + lit(k)).cast("long")
          .as("__run_tokens"),
        (col("__r.__en") - col("__r.__st") + lit(1)).cast("long")
          .as("__n_grams"))
    runs.groupBy(col("train_id"), col("eval_id"))
      .agg(max(col("__run_tokens")).as("max_run_tokens"),
        count(lit(1)).as("n_islands"),
        sum(col("__n_grams")).as("n_aligned_grams"))
      .filter(col("max_run_tokens") >= math.max(minRunTokens, k))
  }

  /** Dedup impact report: per slice (language, crawl source, shard…),
    * how many documents and how much weight (chars, tokens, bytes) the
    * keep-minimum-id dedup policy would drop — the "what did dedup buy
    * us, and where" readout that decides whether a source is worth
    * crawling at its current rate before anything is actually deleted.
    *
    * Output per slice: total docs, docs dropped, total weight, weight
    * dropped. Weight must be integral (exact sums in any engine).
    *
    * Scale shape: the drop set (non-representative cluster members) is
    * LSH-candidate-sized, far below the corpus; the corpus sees one
    * left join against it — only (id, slice, weight) move, never text —
    * and one groupBy over ≤|slices| keys with map-side partials.
    */
  /** Both contract-documented "integral" inputs fail FAST on a
    * fractional column: a silent cast("long") truncation would flip
    * argmaxes / skew sums with no error (floor(2.9) == floor(2.1)). */
  private def requireIntegral(df: DataFrame, c: Column, what: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val t = df.select(c.as("__probe")).schema.head.dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(t),
      s"$what must be an integral column (got $t); " +
        "quantize explicitly (e.g. floor(x * 100 + 0.5)) before passing")
  }

  def dedupSavings(docs: DataFrame, edges: DataFrame, slice: Column,
                   weight: Column, id: Column = col("doc_id"),
                   edgesDistinct: Boolean = false): DataFrame = {
    requireIntegral(docs, weight, "dedupSavings weight")
    val drops = duplicateClusters(edges, edgesDistinct = edgesDistinct)
      .filter(col("doc_id") =!= col("comp_id"))
      .select(col("doc_id").as("__drop_id"))
    docs.select(id.cast("long").as("__id"), slice.as("slice"),
        weight.cast("long").as("__w"))
      .join(drops, col("__id") === col("__drop_id"), "left")
      .groupBy("slice")
      .agg(count(lit(1)).as("n_docs"),
        count(col("__drop_id")).as("n_dropped"),
        sum(col("__w")).as("weight_total"),
        sum(when(col("__drop_id").isNotNull, col("__w")).otherwise(0L))
          .as("weight_dropped"))
  }

  /** Duplicate-cluster size distribution: how many clusters of each
    * size the near-dup graph contains, INCLUDING the singleton count
    * (docs untouched by any pair) — the dedup-health histogram whose
    * heavy tail says "boilerplate family" and whose singleton mass says
    * "mostly clean". Clusters from edges always have size >= 2, so the
    * size-1 row never collides with a computed one.
    *
    * Scale shape: two groupBys over the (small) cluster-membership
    * table, plus two scalar counts crossed into the singleton row —
    * the corpus contributes one count(), nothing else.
    */
  def clusterSizeHistogram(docs: DataFrame, edges: DataFrame,
                           id: Column = col("doc_id"),
                           edgesDistinct: Boolean = false): DataFrame = {
    // membership restricted to docs: an edge list wider than the doc
    // slice (the natural misuse — global pairs against a filtered
    // corpus) would otherwise subtract foreign members from the
    // singleton mass and report a negative count; sizes are measured
    // WITHIN docs, so members ⊆ docs and the arithmetic stays sound
    val members = duplicateClusters(edges, edgesDistinct = edgesDistinct)
      .join(docs.select(id.cast("long").as("doc_id")), Seq("doc_id"),
        "left_semi")
    val sizes = members
      .groupBy("comp_id").agg(count(lit(1)).as("cluster_size"))
    val multi = sizes.groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"))
    val singles = docs.agg(count(id).as("__nd"))
      .crossJoin(sizes.agg(coalesce(sum(col("cluster_size")), lit(0L))
        .as("__nc")))
      .select(lit(1L).as("cluster_size"),
        (col("__nd") - col("__nc")).as("n_clusters"))
    // a sliced cluster can shrink to one in-docs member — merge that
    // size-1 mass with the singleton row instead of emitting two keys
    multi.unionByName(singles)
      .groupBy("cluster_size").agg(sum(col("n_clusters")).as("n_clusters"))
  }

  // -------------------------------------------------- decontamination

  /** Benchmark decontamination at corpus scale: every (train doc, eval
    * doc) pair sharing at least one word k-gram — EXACT result, Bloom-
    * pruned plan. A plain exploded-shingle equi-join needs the eval gram
    * set on every executor (broadcast) or a shuffle of the FULL train
    * gram table (corpus x ~tokens rows) when the eval suite outgrows the
    * broadcast limit. Here the eval grams build a [[Sketches.bloomBuild]]
    * bitmap (numBits/64 longs — 128 KB at 2^20 bits, constant-size
    * however many eval grams), the train grams filter through
    * [[Sketches.bloomMightContain]] INSIDE their scan tasks, and only
    * the surviving sliver meets the eval grams in the exact equi-join
    * that removes Bloom false positives. No false negatives exist, so
    * the result equals the plain join's exactly — pinned by spec and by
    * the q88 oracle (which recomputes the plain form).
    *
    * The eval side is read twice (bloom build + verify join) — cache it
    * when it is itself expensive to produce. */
  def decontaminate(train: DataFrame, eval: DataFrame, k: Int = 5,
                    numBits: Int = 1 << 20, numHashes: Int = 4,
                    trainId: Column = col("doc_id"),
                    evalId: Column = col("doc_id"),
                    trainText: Column = col("text"),
                    evalText: Column = col("text")): DataFrame = {
    val evalGrams = eval.select(evalId.as("eval_id"),
      explode(shingles(evalText, k)).as("g"))
    val bits = Sketches.bloomBuild(evalGrams, col("g"), numBits, numHashes)
    train.select(trainId.as("train_id"), explode(shingles(trainText, k)).as("g"))
      .filter(Sketches.bloomMightContain(bits, col("g"), numHashes))
      .join(evalGrams, "g")
      .select(col("train_id"), col("eval_id")).distinct()
  }

  // -------------------------------------------------- duplicated spans

  /** EXACT duplicated-span detection — substring-level dedup in the
    * style of "Deduplicating Training Data Makes Language Models
    * Better" (Lee et al., 2022), relationally instead of with a suffix
    * array: every k-token window of every document is hashed at its
    * position; a window hash occurring >= `minCount` times anywhere in
    * the corpus (across documents OR repeated within one — both are
    * boilerplate) marks its k positions as duplicated; overlapping and
    * adjacent marked windows then merge into MAXIMAL spans per document.
    * Output: one row per maximal span (doc_id, span_start, span_end,
    * span_tokens), positions 0-based over the normalized token sequence.
    *
    * Scale shape: the window table has one row per corpus TOKEN carrying
    * only (doc_id, pos, hash) — the hash is computed in the projection
    * BEFORE any shuffle, so text never moves. The occurrence count
    * partial-aggregates map-side; marking is one equi-join on the hash
    * (only positions, never text, shuffle back); and the span merge is
    * ONE doc-keyed aggregation of the MARKED positions (sorted per doc,
    * islands cut where the gap exceeds k by an index-aware filter over
    * the position array) — per-task state is bounded by the longest
    * document's duplicated region, never by the corpus, exactly the
    * bound the former per-doc window had, minus the window's extra
    * sort + second shuffle. No stage is quadratic, nothing collected.
    *
    * `portable = true` hashes the joined window text with md5 (the form
    * a SQL oracle can replay); production keeps the default xxhash64 of
    * the token-array slice — no string is ever built per window.
    *
    * The gram table feeds TWO consumers (the occurrence count and the
    * mark-back join), so without materialization the corpus is
    * tokenized and window-hashed twice. `persistGrams = true` persists
    * it MEMORY_AND_DISK for the duration of the computation — the
    * Lee et al. production shape, where the suffix/window table is
    * written once and reread (it is ~1.5x the corpus; executor-local
    * spill, never the driver). The handle is reported through
    * `onPersist` so a long-lived caller can unpersist after the spans
    * are consumed; one-action callers (a query, a report) can leave the
    * default no-op and let session cache hygiene reclaim it. */
  def dupSpans(docs: DataFrame, k: Int = 8, minCount: Int = 2,
               id: Column = col("doc_id"), text: Column = col("text"),
               portable: Boolean = false, persistGrams: Boolean = false,
               onPersist: DataFrame => Unit = _ => ()): DataFrame = {
    require(k >= 1 && minCount >= 2, s"k=$k minCount=$minCount")
    val toks = docs.select(id.as("doc_id"), wsTokens(text).as("__t"))
    val n = size(col("__t"))
    val win = slice(col("__t"), col("pos") + 1, lit(k))
    val grams0 = toks
      .select(col("doc_id"), col("__t"),
        explode(when(n >= k, sequence(lit(0), n - k))
          .otherwise(array().cast("array<int>"))).as("pos"))
      .select(col("doc_id"), col("pos"),
        (if (portable) md5(array_join(win, " ")) else xxhash64(win)).as("__h"))
    val grams =
      if (!persistGrams) grams0
      else {
        val g = grams0.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        onPersist(g)
        g
      }
    val dup = grams.groupBy(col("__h"))
      .agg(count(lit(1)).as("__c")).filter(col("__c") >= minCount)
    val seeds = grams.join(dup, "__h").select(col("doc_id"), col("pos"))
    // islands: a new span starts where the gap to the previous seed
    // exceeds k (seed windows [p, p+k-1] overlap or touch iff gap <= k).
    // One doc-keyed aggregation instead of a per-doc window + second
    // groupBy: the sorted per-doc position list (bounded by the doc's
    // own length — the same buffer the window version held per frame)
    // yields island starts/ends with two index-aware filters, which zip
    // 1:1 in order. element_at is 1-based: at 0-based index i, the
    // previous position is element_at(ps, i) and the next is
    // element_at(ps, i + 2).
    seeds.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("__ps"))
      .withColumn("__st", filter(col("__ps"),
        (p, i) => i === 0 || p - element_at(col("__ps"), i) > k))
      .withColumn("__en", filter(col("__ps"),
        (p, i) => i === size(col("__ps")) - 1 ||
          element_at(col("__ps"), i + 2) - p > k))
      .select(col("doc_id"),
        explode(arrays_zip(col("__st"), col("__en"))).as("__sp"))
      .select(col("doc_id"),
        col("__sp.__st").as("span_start"),
        (col("__sp.__en") + lit(k - 1)).as("span_end"),
        (col("__sp.__en") + lit(k) - col("__sp.__st")).as("span_tokens"))
  }

  /** Per-document duplicated-token coverage from [[dupSpans]]: how much
    * of each document lies inside a corpus-duplicated span, and the
    * curation `keep` decision (`dup_frac <= maxDupFrac`). Spans are
    * disjoint by construction, so coverage is a plain sum. Documents
    * with no duplicated span (or no tokens) report zero coverage. */
  def dupSpanStats(docs: DataFrame, k: Int = 8, minCount: Int = 2,
                   maxDupFrac: Double = 0.5,
                   id: Column = col("doc_id"), text: Column = col("text"),
                   portable: Boolean = false, persistGrams: Boolean = false,
                   onPersist: DataFrame => Unit = _ => ()): DataFrame = {
    val perDoc = dupSpans(docs, k, minCount, id, text, portable,
      persistGrams, onPersist)
      .groupBy(col("doc_id")).agg(sum(col("span_tokens")).as("__dup"))
    val base = docs.select(id.as("doc_id"), size(wsTokens(text)).as("n_tokens"))
    base.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("__dup"), lit(0L)).as("dup_tokens"))
      .withColumn("dup_frac",
        when(col("n_tokens") === 0, 0.0)
          .otherwise(col("dup_tokens").cast("double") / col("n_tokens")))
      .withColumn("keep", (col("dup_frac") <= maxDupFrac).cast("int"))
  }

  /** Boilerplate scrub: rewrite every document with its duplicated spans
    * removed — the repeated headers/footers/license blocks that
    * [[dupSpans]] detects are deleted from EVERY copy (the C4-style
    * boilerplate strip; content repeated >= minCount times is treated as
    * template noise, not information). This is deliberately distinct
    * from keep-one dedup: document-level near-dup keeps a canonical
    * representative (the minhash family); span-level repetition is
    * template text, and pipelines strip all of it.
    *
    * Scale shape: [[dupSpans]] does the heavy lifting (text never
    * shuffles there); the rewrite joins each doc's few spans back —
    * span lists are per-doc metadata — and drops covered tokens with one
    * index-aware `filter` in the projection. Untouched documents pass
    * through the left join with their text rebuilt from the same
    * normalized tokens, so output text is uniformly normalized. */
  def scrubSpans(docs: DataFrame, k: Int = 8, minCount: Int = 2,
                 id: Column = col("doc_id"), text: Column = col("text"),
                 portable: Boolean = false, persistGrams: Boolean = false,
                 onPersist: DataFrame => Unit = _ => ()): DataFrame = {
    val spans = dupSpans(docs, k, minCount, id, text, portable,
      persistGrams, onPersist)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__sp"))
    val toks = docs.select(id.as("doc_id"), wsTokens(text).as("__t"))
    toks.join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("__t")).as("n_tokens"),
        when(col("__sp").isNull, col("__t")).otherwise(
          filter(col("__t"), (_, i) => !exists(col("__sp"),
            sp => i >= sp.getField("span_start") &&
              i <= sp.getField("span_end")))).as("__kept"))
      .select(col("doc_id"), col("n_tokens"),
        size(col("__kept")).as("n_kept"),
        array_join(col("__kept"), " ").as("scrubbed"))
  }

  /** Keep-first span dedup — the Lee et al. 2022 ("Deduplicating
    * Training Data Makes Language Models Better") ExactSubstr law at
    * window granularity: every k-token window that occurs ≥2 times in
    * the corpus keeps ONLY its globally-first occurrence — the
    * smallest (doc_id, pos), deterministic and partition-invariant —
    * and every LATER occurrence is scrubbed from its document. The
    * complement to [[scrubSpans]]: scrubSpans treats repetition as
    * template noise and deletes ALL copies; keep-first treats it as
    * content that deserves exactly one surviving copy (memorization
    * drops, the corpus still teaches the content once).
    *
    * Law detail: a token is scrubbed iff at least one NON-FIRST
    * duplicated-window occurrence covers it — even if a first
    * occurrence of some other window also covers it (the scrub mark
    * wins; the laws compose per window, not per document). Overlapping
    * non-first occurrences merge into islands exactly like
    * [[dupSpans]] (gap > k cuts). A document may hold the first
    * occurrence of one window and a later occurrence of another.
    *
    * Scale shape: [[dupSpans]]'s — the gram table partial-aggregates
    * to (hash → count, min occurrence); marking is one equi-join on
    * the hash shuffling positions only (never text); islands + the
    * rewrite are one doc-keyed aggregation and [[scrubSpans]]'s
    * index-aware projection filter. Nothing quadratic. `portable`
    * swaps xxhash64 window hashing for md5 of the joined window (the
    * form a SQL oracle replays). */
  def scrubSpansKeepFirst(docs: DataFrame, k: Int = 8,
                          id: Column = col("doc_id"),
                          text: Column = col("text"),
                          portable: Boolean = false): DataFrame = {
    require(k >= 1, s"k=$k")
    val toks = docs.select(id.as("doc_id"), wsTokens(text).as("__t"))
    val n = size(col("__t"))
    val win = slice(col("__t"), col("pos") + 1, lit(k))
    val grams = toks
      .select(col("doc_id"), col("__t"),
        explode(when(n >= k, sequence(lit(0), n - k))
          .otherwise(array().cast("array<int>"))).as("pos"))
      .select(col("doc_id"), col("pos"),
        (if (portable) md5(array_join(win, " ")) else xxhash64(win)).as("__h"))
    val firsts = grams.groupBy(col("__h"))
      .agg(count(lit(1)).as("__c"),
        min(struct(col("doc_id").as("d"), col("pos").as("p"))).as("__f"))
      .filter(col("__c") >= 2)
      .select(col("__h"), col("__f.d").as("__fd"), col("__f.p").as("__fp"))
    val seeds = grams.join(firsts, "__h")
      .filter(!(col("doc_id") === col("__fd") && col("pos") === col("__fp")))
      .select(col("doc_id"), col("pos"))
    // islands over the non-first seed positions, dupSpans' cut law
    val spans = seeds.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("__ps"))
      .withColumn("__st", filter(col("__ps"),
        (p, i) => i === 0 || p - element_at(col("__ps"), i) > k))
      .withColumn("__en", filter(col("__ps"),
        (p, i) => i === size(col("__ps")) - 1 ||
          element_at(col("__ps"), i + 2) - p > k))
      .select(col("doc_id"), zip_with(col("__st"), col("__en"),
        (s, e) => struct(s.as("span_start"),
          (e + lit(k - 1)).as("span_end"))).as("__sp"))
    toks.join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("__t")).as("n_tokens"),
        when(col("__sp").isNull, col("__t")).otherwise(
          filter(col("__t"), (_, i) => !exists(col("__sp"),
            sp => i >= sp.getField("span_start") &&
              i <= sp.getField("span_end")))).as("__kept"))
      .select(col("doc_id"), col("n_tokens"),
        size(col("__kept")).as("n_kept"),
        array_join(col("__kept"), " ").as("deduped"))
  }

  /** Embedding-cosine near-dup for an explicit candidate pair set
    * (id_a, id_b) — the verification stage when candidates come from
    * another generator. */
  def embeddingNearDup(vectors: DataFrame, pairs: DataFrame,
                       threshold: Double): DataFrame = {
    val v = vectors.select(col("vec_id"), col("embedding"),
      Similarity.norm(col("embedding")).as("nrm"))
    pairs
      .join(v.select(col("vec_id").as("id_a"), col("embedding").as("e_a"),
        col("nrm").as("n_a")), "id_a")
      .join(v.select(col("vec_id").as("id_b"), col("embedding").as("e_b"),
        col("nrm").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (Similarity.dot(col("e_a"), col("e_b")) / (col("n_a") * col("n_b")))
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
