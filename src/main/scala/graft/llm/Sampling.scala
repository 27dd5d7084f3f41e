package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Corpus subsampling must be REPRODUCIBLE — rerunning the pipeline (or
  * running it on another engine, or with different partitioning) has to
  * select the same rows, or downstream dedup/decontamination bookkeeping
  * breaks. So there is no RNG anywhere: a row is kept iff the md5 bucket
  * of its id falls below its stratum's rate. That makes sampling a pure
  * codegen'd filter — no shuffle, no state, trivially pushed past scans —
  * and samples are NESTED: raising a stratum's rate only ever adds rows,
  * never swaps them (the property you want when growing a data mix).
  */
object Sampling {

  /** 28-bit md5 bucket of the id — same construction as the q55 split
    * assignment, expressible in any SQL engine. */
  private val BucketSpace = 268435456.0 // 16^7

  /** Ceiling on the distinct-strata count the mixture samplers
    * ([[temperatureMix]]/[[temperatureMixAlpha]]/[[epochCappedMix]])
    * will collect to the driver: their count tables are metadata
    * (languages, domains — at most thousands), and a high-cardinality
    * stratum must fail loudly rather than OOM the driver. */
  val MaxStrata: Int = 100000

  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 7), 16, 10).cast("long")

  /** Keep each row with its stratum's probability, deterministically.
    *
    * @param stratum     column whose value selects the rate (e.g. lang)
    * @param id          stable row identity to hash
    * @param rates       stratum value -> keep fraction in [0, 1]
    * @param defaultRate keep fraction for strata not listed
    */
  def stratified(df: DataFrame, stratum: Column, id: Column,
                 rates: Map[String, Double],
                 defaultRate: Double = 0.0): DataFrame = {
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (value, r)) => when(stratum === value, lit(r)).otherwise(acc)
    }
    df.filter(hashBucket(id).cast("double") < rate * BucketSpace)
  }

  /** Deterministic weight-biased subsample: each row's priority is
    * `hashBucket(id) / weight` and the k SMALLEST priorities win, so
    * heavier rows (longer documents, higher-quality scores, …) are
    * proportionally favored while the selection stays fully
    * reproducible — rerunning, repartitioning, or recomputing on
    * another engine picks the same rows, and the selection is NESTED in
    * k. The priority is one integer-to-double cast and one IEEE
    * division, which every engine rounds identically; exact weighted
    * reservoir sampling (Efraimidis-Spirtsis) needs `pow(u, 1/w)`,
    * whose libm rounding differs across engines — this ratio form keeps
    * the weight-monotone bias with none of that nondeterminism.
    *
    * Plans as TakeOrderedAndProject (a bounded per-partition heap +
    * driver merge of k rows), never a global sort — the shape that
    * holds at corpus scale. Rows with weight <= 0 are excluded.
    */
  def weightedPriority(df: DataFrame, id: Column, weight: Column,
                       k: Int): DataFrame = {
    require(!df.columns.contains("__prio"),
      "weightedPriority reserves the column name __prio; rename the input")
    // null ids have no hash: their null __prio would sort NULLS FIRST
    // ahead of every real row with no usable tie-break — exclude them
    // like every other id-keyed op here, instead of sampling garbage
    // partition-dependently
    df.filter(weight > 0 && id.isNotNull)
      .withColumn("__prio", hashBucket(id).cast("double") / weight)
      .orderBy(col("__prio").asc, id.asc)
      .limit(k)
  }

  /** Deterministic data-mix construction by TOKEN budget: within each
    * stratum, documents are ranked by their id hash (the same stable
    * order [[stratified]] samples from) and the greedy prefix whose
    * running token total stays within the stratum's budget is kept —
    * once the cumulative sum passes the budget, everything after it in
    * hash order is out. Like [[stratified]], no RNG: rerunning, changing
    * partitioning, or recomputing on another engine selects the same
    * documents, and a doubled budget strictly extends the selection.
    *
    * Scale shape — two-phase bucket prefix, NOT a per-stratum window (a
    * window partitioned by stratum funnels each stratum through one
    * task; a training mix has ~10 language strata, so at 100 TB that is
    * a multi-TB single-task sort). Instead the id-hash space splits into
    * `nBuckets` ranges per stratum, and:
    *
    *   1. one aggregate computes each (stratum, bucket)'s token sum — a
    *      tiny summary, `strata x nBuckets` rows;
    *   2. a bounded window over the SUMMARY turns sums into per-bucket
    *      prefix offsets (≤ nBuckets rows per partition — metadata, not
    *      data), broadcast back onto the rows;
    *   3. buckets that fit entirely under their stratum's budget keep
    *      every row with a shuffle-free filter; buckets past the budget
    *      drop entirely; only the ONE boundary bucket per stratum sorts,
    *      and its window partitions by (stratum, bucket) — task size is
    *      a 1/nBuckets slice of the stratum, never the stratum.
    *
    * Because bucket ranges are prefixes of the same (id-hash, id) order
    * the old single-window form used, the selected set is IDENTICAL —
    * pinned by LlmOpsSpec against a literal windowed reference.
    *
    * @param tokens   per-row token count column (pre-computed upstream);
    *                 null-token rows are excluded explicitly
    * @param nBuckets hash-range buckets per stratum; raise for larger
    *                 corpora (max boundary-task rows ~ |stratum|/nBuckets)
    */
  def tokenBudgetMix(df: DataFrame, stratum: Column, id: Column,
                     tokens: Column, budgets: Map[String, Long],
                     defaultBudget: Long = 0L,
                     nBuckets: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Seq("__strat", "__hb", "__bkt").foreach(r =>
      require(!df.columns.contains(r),
        s"tokenBudgetMix reserves the column name $r; rename the input"))
    val outCols = df.columns.toSeq.map(col)
    def budgetOf(s: Column): Column =
      budgets.toSeq.sortBy(_._1).foldLeft(lit(defaultBudget)) {
        case (acc, (value, b)) => when(s === value, lit(b)).otherwise(acc)
      }
    // null-token rows have no place on the token axis and are excluded
    // EXPLICITLY (the packSequences convention): leaving them in makes
    // an all-null bucket's __btok sum NULL, which fails BOTH boundary
    // filters and silently drops rows the windowed reference kept.
    // CACHED (the dfOrderedSets discipline): three consumers read this
    // frame — the offsets aggregate, the fullyIn branch and the
    // boundary branch — and the caller's token column is typically a
    // full tokenize of the text (q65 splits every document), so without
    // the cache the corpus tokenizes three times per run. The frame is
    // the caller's projection plus three small columns; CacheManager
    // dedup keys on the canonicalized plan and blocks stay evictable;
    // a long-running service cycling many corpora should clearCache()
    // between them (the bench does).
    val rows = df.filter(tokens.isNotNull)
      .withColumn("__strat", stratum)
      .withColumn("__hb", hashBucket(id))
      .withColumn("__bkt",
        floor(col("__hb") / lit(BucketSpace / nBuckets)).cast("int"))
      .cache()
    // phase 1: per-(stratum, bucket) token sums -> per-bucket prefix
    // offsets. The window here runs over the SUMMARY (≤ nBuckets rows per
    // stratum), not the corpus.
    val offsets = rows.groupBy(col("__strat").as("__s"), col("__bkt").as("__b"))
      .agg(sum(tokens).as("__btok"))
      .withColumn("__off", coalesce(
        sum(col("__btok")).over(Window.partitionBy(col("__s"))
          .orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    // phase 2: annotate rows with their bucket's offset via broadcast.
    // Bucket equality is NULL-SAFE: a null id hashes to a null bucket,
    // which the old single-window form ranked first (nulls-first sort) —
    // a plain equi-join would drop those rows while still charging their
    // token sum against every later bucket's offset.
    val annotated = rows.join(broadcast(offsets),
      col("__strat") <=> col("__s") && col("__bkt") <=> col("__b"))
    val budget = budgetOf(col("__strat"))
    // whole buckets under the boundary: shuffle-free keep
    val fullyIn = annotated.filter(col("__off") + col("__btok") <= budget)
    // the single boundary bucket per stratum: exact prefix via a window
    // partitioned by (stratum, bucket) — bounded task, never the stratum.
    // `__off <= budget`, not `<`: when the preceding buckets sum EXACTLY
    // to the budget, this bucket's leading zero-token rows still satisfy
    // cum <= budget and the old window form kept them.
    val wB = Window.partitionBy(col("__strat"), col("__bkt"))
      .orderBy(col("__hb"), id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = annotated
      .filter(col("__off") <= budget && col("__off") + col("__btok") > budget)
      .withColumn("__cum", sum(tokens).over(wB))
      .filter(col("__off") + col("__cum") <= budget)
    fullyIn.select(outCols: _*).unionByName(boundary.select(outCols: _*))
  }

  /** Temperature-scaled mixture sampling at alpha = 0.5 — the standard
    * multilingual rebalance (sample stratum i proportionally to
    * sqrt(n_i), so low-resource strata are up-weighted relative to their
    * raw share): per-stratum keep rates are derived from the corpus
    * itself, then applied through [[stratified]]'s deterministic hash
    * filter. `rate_i = min(1, targetRows * w_i / W / n_i)` with
    * `w_i = floor(sqrt(n_i) * 1e6)`.
    *
    * Engine-portable by construction: IEEE-754 requires sqrt to be
    * correctly rounded (unlike pow/exp/ln, which vary by libm — the
    * reason THIS alpha carries the DuckDB oracle while the
    * general-alpha path [[temperatureMixAlpha]] is spec-pinned
    * in-Spark only), the scaled
    * weights become integers so their SUM is exact regardless of
    * order, and the rate is a fixed left-associated chain of double
    * operations both engines evaluate identically. The per-stratum
    * count pass collects |strata| rows of metadata to the driver; rows
    * with a null stratum fall to rate 0 (no size, no weight).
    *
    * Expected sample size is ~targetRows (hash sampling is Bernoulli
    * per row, exact only in expectation); strata whose rate clamps at 1
    * contribute all their rows. */
  def temperatureMix(df: DataFrame, stratum: Column, id: Column,
                     targetRows: Long): DataFrame =
    temperatureMixWeighted(df, stratum, id, targetRows,
      n => math.sqrt(n.toDouble))

  /** Temperature-scaled mixture sampling with a GENERAL alpha in (0, 1]:
    * stratum i is sampled proportionally to `n_i^alpha` (alpha = 1 is
    * the raw mix, smaller alpha flattens toward uniform — the mT5/XLM-R
    * rebalance knob). alpha = 0.5 takes the [[temperatureMix]] sqrt
    * path unchanged.
    *
    * NOT DuckDB-oracled, deliberately: IEEE-754 requires CORRECT
    * rounding only of sqrt — `pow` is libm-implementation-defined, so a
    * cross-engine replay of `n^alpha` can differ in the final ulp and
    * flip a floor/threshold, which the driver's hash-compare would
    * read as corruption. Within the JVM the weights use
    * `StrictMath.pow` (fdlibm semantics, bit-identical on every
    * platform), so the operator itself is deterministic and
    * spec-pinned in-Spark ([[LlmOpsSpec]]) instead of oracle-pinned. */
  def temperatureMixAlpha(df: DataFrame, stratum: Column, id: Column,
                          targetRows: Long, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha $alpha outside (0, 1]")
    if (alpha == 0.5) temperatureMix(df, stratum, id, targetRows)
    else temperatureMixWeighted(df, stratum, id, targetRows,
      n => StrictMath.pow(n.toDouble, alpha))
  }

  /** Shared rate derivation: per-stratum keep rates
    * `rate_i = min(1, targetRows * w_i / W / n_i)` with
    * `w_i = floor(weight(n_i) * 1e6)` — integer weights so W is an
    * exact order-independent sum — applied through [[stratified]]'s
    * deterministic hash filter. The count pass collects |strata| rows
    * of metadata; null strata fall to rate 0. */
  private def temperatureMixWeighted(df: DataFrame, stratum: Column,
                                     id: Column, targetRows: Long,
                                     weight: Long => Double): DataFrame = {
    require(targetRows >= 0, s"targetRows $targetRows")
    // the count table is DRIVER metadata — the contract is a
    // language/domain-scale stratum (tens to thousands of values). A
    // high-cardinality stratum (a doc id, a timestamp) would silently
    // OOM the driver here, so the collect is bounded and over-budget
    // fails loudly instead: pick a coarser stratum or pre-bucket it.
    val counts = df.filter(stratum.isNotNull)
      .groupBy(stratum.cast("string").as("__s")).agg(count(lit(1)).as("__n"))
      .limit(MaxStrata + 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    require(counts.length <= MaxStrata,
      s"temperature mixing saw more than $MaxStrata distinct strata — " +
        "the stratum must be language/domain-scale metadata, not a " +
        "high-cardinality key; pre-bucket it or pick a coarser column")
    val weights = counts.map { case (s, n) =>
      (s, n, math.floor(weight(n) * 1e6).toLong)
    }
    val totalW = weights.map(_._3).sum
    val rates = weights.map { case (s, n, w) =>
      s -> math.min(1.0, targetRows.toDouble * w / totalW / n)
    }.toMap
    stratified(df, stratum.cast("string"), id, rates, defaultRate = 0.0)
  }

  /** UniMax epoch-capped mixture allocation (Chung et al. 2023,
    * "UniMax: Fairer and More Effective Language Sampling for
    * Large-Scale Multilingual Pretraining") — the allocation the
    * mixing family lacked next to temperature scaling (X33),
    * token-budget mix (X14) and epoch expansion (X129): distribute a
    * token budget as UNIFORMLY across strata as possible, subject to a
    * per-stratum cap of `maxEpochs` passes over its data, and
    * redistribute every capped stratum's surplus over the rest. Unlike
    * temperature scaling there is no exponent to tune and no stratum
    * ever trains past `maxEpochs` epochs — the paper's point.
    *
    * Law (exact integers, deterministic on any engine): strata with a
    * positive token count sort ascending by `(n_tokens, stratum)`;
    * walking that order with remaining budget R over m remaining
    * strata, each stratum takes `min(n·maxEpochs, R div m)` and leaves
    * the rest. Visiting smallest-first is WHY the walk equals the
    * published waterfill: a stratum caps only if its cap is below the
    * current uniform share, and every un-capped stratum ends with the
    * final equal share (integer-division remainders roll forward to
    * the larger strata — a deterministic tie law the oracle replays
    * verbatim). `epochs_scaled = 1e9·alloc div n` is the house
    * fixed-point weight, ready for [[epochExpand]] (join back on the
    * stratum) to materialize the allocation into training copies.
    *
    * Output: (stratum, n_tokens, alloc_tokens, epochs_scaled, capped),
    * one row per positive-count stratum; null strata and zero-token
    * strata have nothing to allocate and emit no row. The count pass
    * is the [[temperatureMix]] shape — one aggregation collected to
    * the driver, bounded by [[MaxStrata]] (fails loudly beyond), the
    * walk itself is driver-side closed-form over that metadata. */
  def epochCappedMix(df: DataFrame, stratum: Column, tokens: Column,
                     budgetTokens: Long, maxEpochs: Long): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens=$budgetTokens")
    require(maxEpochs >= 1, s"maxEpochs=$maxEpochs")
    val counts = df.filter(stratum.isNotNull)
      .groupBy(stratum.cast("string").as("__s"))
      .agg(sum(tokens.cast("long")).as("__n"))
      .filter(col("__n") > 0)
      .limit(MaxStrata + 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    require(counts.length <= MaxStrata,
      s"epochCappedMix saw more than $MaxStrata distinct strata — " +
        "the stratum must be language/domain-scale metadata, not a " +
        "high-cardinality key; pre-bucket it or pick a coarser column")
    val ordered = counts.sortBy { case (s, n) => (n, s) }
    var r = budgetTokens
    var m = ordered.length
    val rows = ordered.map { case (s, n) =>
      // multiplyExact: a runaway maxEpochs × corpus-scale n must fail
      // loudly, never wrap into a negative cap
      val cap = Math.multiplyExact(n, maxEpochs)
      val share = r / m
      val a = math.min(cap, share)
      r -= a; m -= 1
      // BigInt for the fixed-point scale: 1e9 × a overflows a long
      // already at corpus-scale token counts (~1e10); the quotient
      // itself is ≤ maxEpochs × 1e9 and always fits
      org.apache.spark.sql.Row(s, n, a,
        (BigInt(a) * 1000000000L / n).toLong, a == cap)
    }
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("stratum",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n_tokens",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("alloc_tokens",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("epochs_scaled",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("capped",
          org.apache.spark.sql.types.BooleanType, nullable = false))))
  }

  /** Deterministic per-group k-sample — the "pull k examples of every
    * class for inspection / eval" op: each group keeps its k smallest
    * rows by `(md5-bucket(id), id)`, so the pick is pseudo-random but
    * reproducible across runs, partitionings and engines (no RNG, no
    * seed plumbing — the [[stratified]] discipline applied to a fixed
    * COUNT instead of a rate), and re-running after an append only
    * changes a group's sample where new ids hash below its old cut.
    * Emits the input columns plus the 1-based `sample_rank`; rows with
    * a null group or id have no deterministic place and are excluded.
    *
    * Scale shape: ONE group-partitioned shuffle, and the rank filter
    * plans as WindowGroupLimit (pinned), so every map task forwards at
    * most k rows per group — a hot group never buffers more than the k
    * rows it keeps in any task. */
  def groupSample(df: DataFrame, group: Column, id: Column,
                  k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k=$k")
    // reserved internals must not silently collide with input columns
    // (the kmvRollup __h lesson): fail loudly instead
    Seq("__g", "__hb", "sample_rank").foreach(r =>
      require(!df.columns.contains(r),
        s"groupSample reserves the column name $r; rename the input column"))
    val outCols = df.columns.toSeq.map(col)
    val w = Window.partitionBy(col("__g")).orderBy(col("__hb"), id)
    df.filter(group.isNotNull && id.isNotNull)
      .withColumn("__g", group)
      .withColumn("__hb", hashBucket(id))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
      .select(outCols :+ col("sample_rank"): _*)
  }

  /** Global top-k under a per-group diversity cap: the best `k` rows by
    * `order`, but never more than `perGroup` from any one group — the
    * eval-set / few-shot-example selection shape ("the 20 best docs, at
    * most 2 per language"), where a plain top-k collapses onto the
    * dominant group.
    *
    * Scale shape: the per-group rank plans as WindowGroupLimit (a hot
    * group never buffers past `perGroup` rows per task — pinned in
    * PlanQualitySpec) and the global cut as TakeOrderedAndProject; no
    * full sort, no corpus-wide window. The caller must make `order`
    * total (tie columns down to a unique key) or the result is
    * partition-dependent.
    */
  def diversifiedTopK(df: DataFrame, group: Column, order: Seq[Column],
                      k: Int, perGroup: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && perGroup >= 1, s"k=$k perGroup=$perGroup")
    require(!df.columns.contains("__rn"),
      "diversifiedTopK reserves the column name __rn; rename the input column")
    val w = Window.partitionBy(group).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perGroup)
      .drop("__rn")
      .sort(order: _*)
      .limit(k)
  }

  /** Deterministic shuffle-and-shard: the last stage of a training-data
    * pipeline — spread documents pseudo-randomly across `nShards` output
    * shards and give each a dense position within its shard, with no RNG
    * anywhere: shard = md5-bucket(id) mod nShards, order within a shard
    * = (bucket, id). Rerunning, repartitioning, or recomputing on
    * another engine produces the identical (shard, pos) assignment, so
    * training runs are reproducible and resumable.
    *
    * Scale shape — positions are NEVER a per-shard window over the
    * corpus (that funnels each shard through one task): the id-hash
    * space splits into `nBuckets` ranges per shard, one aggregate
    * computes per-(shard, range) counts (a `nShards x nBuckets`
    * METADATA summary), a bounded window over the summary turns counts
    * into range offsets broadcast back, and each row adds a
    * within-range rank whose window partitions by (shard, range) —
    * every task is a 1/nBuckets slice of a shard. Because ranges are
    * prefixes of the same (bucket, id) order, positions are dense
    * 0..count-1 per shard and identical to the naive windowed form.
    *
    * Rows with a null id have no hash and are excluded (a null has no
    * deterministic position). */
  def shardAssign(df: DataFrame, id: Column, nShards: Int,
                  nBuckets: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards > 0 && nBuckets > 0, s"$nShards/$nBuckets")
    Seq("__hb", "__bkt", "shard", "pos").foreach(r =>
      require(!df.columns.contains(r),
        s"shardAssign reserves the column name $r; rename the input"))
    val outCols = df.columns.toSeq.map(col)
    val rows = df.filter(id.isNotNull)
      .withColumn("__hb", hashBucket(id))
      .withColumn("shard", pmod(col("__hb"), lit(nShards.toLong)).cast("int"))
      .withColumn("__bkt",
        floor(col("__hb") / lit(BucketSpace / nBuckets)).cast("int"))
    val offsets = rows
      .groupBy(col("shard").as("__s"), col("__bkt").as("__b"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(
        sum(col("__c")).over(Window.partitionBy(col("__s"))
          .orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val wIn = Window.partitionBy(col("shard"), col("__bkt"))
      .orderBy(col("__hb"), id)
    rows.join(broadcast(offsets),
        col("shard") === col("__s") && col("__bkt") === col("__b"))
      .withColumn("pos",
        col("__off") + row_number().over(wIn).cast("long") - 1L)
      .select(outCols ++ Seq(col("shard"), col("pos")): _*)
  }

  /** Sequence packing: place every document on the concatenated token
    * stream (documents in id order, back to back) and report which
    * fixed-size context bin it starts in and at what offset — `bin =
    * floor(start / ctx)`, `bin_pos = start mod ctx`. A training loader
    * that cuts the stream every `ctx` tokens gets exactly these
    * coordinates, so the assignment is the "concat then split" packing
    * every pre-training pipeline runs.
    *
    * Scale shape — the global running sum is NEVER a single-task window:
    * ids split into fixed-width range buckets; one aggregate computes
    * per-bucket token sums; a bounded window over that SUMMARY yields
    * each bucket's global offset (broadcast back); and each row adds a
    * within-bucket prefix sum whose window partitions by bucket — every
    * task is at most `bucketWidth` rows, fully parallel. All integer
    * arithmetic; deterministic on any engine and partitioning.
    *
    * @param bucketWidth id-range width per bucket: the summary has
    *        `max_id / bucketWidth` rows (keep it metadata-sized) and no
    *        task sorts more than `bucketWidth` rows.
    */
  def packSequences(df: DataFrame, id: Column, tokens: Column, ctx: Long,
                    bucketWidth: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ctx > 0 && bucketWidth > 0, s"$ctx/$bucketWidth")
    Seq("__id", "__n", "__bkt", "__start", "bin", "bin_pos").foreach(r =>
      require(!df.columns.contains(r),
        s"packSequences reserves the column name $r; rename the input"))
    val outCols = df.columns.toSeq.map(col)
    // bucket by INTEGER floor-division (pmod keeps the floor semantics
    // for negative ids): a double division would round above 2^53 and
    // shift bucket boundaries. Rows with a null id or token count are
    // excluded EXPLICITLY (they have no place on the token axis) rather
    // than dropped silently by the summary join.
    val rows = df.withColumn("__id", id.cast("long"))
      .withColumn("__n", tokens.cast("long"))
      .filter(col("__id").isNotNull && col("__n").isNotNull)
      .withColumn("__bkt",
        expr(s"(__id - pmod(__id, ${bucketWidth}L)) div ${bucketWidth}L"))
    val offsets = rows.groupBy(col("__bkt").as("__b"))
      .agg(sum(col("__n")).as("__btok"))
      .withColumn("__off", coalesce(
        sum(col("__btok")).over(Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val wIn = Window.partitionBy(col("__bkt")).orderBy(col("__id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    rows.join(broadcast(offsets), col("__bkt") === col("__b"))
      .withColumn("__local", coalesce(sum(col("__n")).over(wIn), lit(0L)))
      .withColumn("__start", col("__off") + col("__local"))
      .withColumn("bin", expr(s"__start div ${ctx}L"))
      .withColumn("bin_pos", col("__start") - col("bin") * lit(ctx))
      .select(outCols ++ Seq(col("bin"), col("bin_pos")): _*)
  }

  /** Length-grouped training batches: rows ordered by (token count, id)
    * and cut into consecutive `batchSize` groups, so each batch holds
    * near-equal-length rows and the padding waste
    * `batchSize * max(len) - sum(len)` stays minimal — the standard
    * batching of any padded-attention trainer.
    *
    * The global rank uses the same two-phase shape as [[packSequences]]
    * (a straight `row_number` over the corpus would sort 100 TB through
    * one task): per-(n_tok, id-bucket) counts shrink to a SUMMARY whose
    * bounded window yields each group's global offset, and the within-
    * group `row_number` windows partition by (n_tok, id-bucket) — at
    * most `bucketWidth` ids per task. Integer arithmetic throughout
    * (the id bucket is an integer floor-division, exact for the full
    * 64-bit id range incl. snowflake-style ids above 2^53);
    * deterministic on any engine and partitioning. Rows with a null id
    * or token count are excluded explicitly.
    *
    * Cardinality contract (like [[packSequences]]'s bucketWidth note):
    * the broadcast summary holds one row per OCCUPIED (n_tok,
    * id-bucket) pair — bounded by distinct token lengths times
    * id-range / bucketWidth. The caller sizes `bucketWidth` so that
    * product stays metadata-sized (~1e7 rows); token lengths are
    * naturally few thousand distinct values, so a width of id-range/1e3
    * is safe at any corpus size.
    *
    * Output: (doc_id, n_tok, batch_id); only the last batch may be
    * short. */
  def lengthGroupedBatches(df: DataFrame, id: Column, tokens: Column,
                           batchSize: Int,
                           bucketWidth: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(batchSize >= 1 && bucketWidth > 0, s"$batchSize/$bucketWidth")
    val rows = df.select(id.cast("long").as("doc_id"),
        tokens.cast("long").as("n_tok"))
      .filter(col("doc_id").isNotNull && col("n_tok").isNotNull)
      .withColumn("__bkt",
        expr(s"(doc_id - pmod(doc_id, ${bucketWidth}L)) div ${bucketWidth}L"))
    val offsets = rows
      .groupBy(col("n_tok").as("__t"), col("__bkt").as("__b"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(
        sum(col("__c")).over(Window.orderBy(col("__t"), col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val wIn = Window.partitionBy(col("n_tok"), col("__bkt"))
      .orderBy(col("doc_id"))
    rows.join(broadcast(offsets),
        col("n_tok") === col("__t") && col("__bkt") === col("__b"))
      .withColumn("__rank", col("__off") + row_number().over(wIn))
      .select(col("doc_id"), col("n_tok"),
        expr(s"(__rank - 1L) div ${batchSize}L").as("batch_id"))
  }

  /** Epoch expansion — materialize per-document sampling WEIGHTS into
    * deterministic training copies: the step after a mixture/importance
    * pass ([[temperatureMix]], [[graft.llm.TextAnalysis.dsirWeights]])
    * hands back weights that can exceed 1.0 — "this domain trains for
    * 1.7 epochs" — and the trainer needs actual rows. Each document
    * emits `floor(w)` whole copies plus one more with probability
    * `frac(w)`, decided by the engine's deterministic md5 VALUE law
    * (60-bit hash of the id mod 1e9 < the weight's fractional part —
    * no RNG, partition-invariant, any SQL engine replays it); weights
    * are scaled integers (`1e9` = 1.0, the house fixed-point).
    *
    * Zero-copy documents are dropped — that IS resampling (the weight
    * said "skip this epoch"), and a document whose copy count exceeds
    * `maxCopies` is clamped WITH `clamped = true` on every emitted row
    * (visible, never silent — a runaway weight multiplying the corpus
    * is a bug upstream, not a thing to do quietly). NULL or negative
    * weights count zero. One narrow projection + a bounded
    * `explode(sequence)` — no shuffle, no RNG, `copy` is 1-based so
    * downstream shard/order laws can key on (doc_id, copy). */
  def epochExpand(docs: DataFrame, weightScaled: Column,
                  maxCopies: Int = 100,
                  id: Column = col("doc_id")): DataFrame = {
    require(maxCopies >= 1, s"maxCopies=$maxCopies")
    val w = when(weightScaled.isNull || weightScaled < 0, 0L)
      .otherwise(weightScaled.cast("long"))
    val h60 = conv(substring(md5(id.cast("string")), 1, 15), 16, 10)
      .cast("long")
    docs
      .select(id.as("doc_id"), w.as("__w"), h60.as("__h"))
      // INTEGRAL division for the whole-copy count: Column `/` is
      // double division (exact only below 2^53), while the fixed-point
      // law — and the oracle's `//` replay — is exact at any long
      .withColumn("__c0", expr("__w div 1000000000L") +
        when(col("__h") % 1000000000L < col("__w") % 1000000000L, 1L)
          .otherwise(0L))
      .select(col("doc_id"), col("__c0"))
      .withColumn("n_copies", least(col("__c0"), lit(maxCopies.toLong)))
      .withColumn("clamped", col("__c0") > maxCopies)
      .select(col("doc_id"), col("n_copies"), col("clamped"),
        // sequence(1, 0) would DESCEND, not empty — guard zero-copy docs
        explode(when(col("n_copies") >= 1L,
            sequence(lit(1L), col("n_copies")))
          .otherwise(array().cast("array<bigint>"))).as("copy"))
      .select(col("doc_id"), col("copy"), col("n_copies"), col("clamped"))
  }

  /** DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining") —
    * the mixing family's EXCESS-LOSS leg: temperature scaling (X33)
    * reweights by SIZE, UniMax (X132) by epoch caps, DoReMi by how much
    * worse a proxy model does than a reference model per DOMAIN, so
    * domains the proxy hasn't learned yet get upweighted.
    *
    * ONE-STEP DETERMINISTIC VARIANT on a base-2 grid, by design: the
    * published method runs Group-DRO mirror ascent — real-valued
    * `exp(eta * excess)` updates inside a proxy training loop, libm
    * territory an engine oracle cannot replay (the
    * [[temperatureMixAlpha]] boundary, and the same no-libm discipline
    * as [[graft.llm.UnigramLm]]'s hard EM). This variant takes the
    * per-document excess as DATA (any two score columns — here the
    * [[graft.llm.TextAnalysis.mooreLewisFromScores]] delta between a
    * reference LM and a proxy LM, both already landed tables) and does
    * one exponentiated-gradient step with the exponential on the exact
    * base-2 grid:
    *
    *  1. per-domain clipped excess: `excess_avg = Σ max(0, excess) div
    *     n_docs` (DoReMi clips per-example excess at 0 — a domain the
    *     proxy already beats the reference on contributes nothing);
    *  2. `shift = min(excess_avg div shiftUnit, maxShift)` — the
    *     learning rate as "one doubling per shiftUnit of excess",
    *     capped so a degenerate domain cannot absorb the mix;
    *  3. `w = n_docs << shift` — the natural-proportion baseline
    *     (DoReMi's initial mixture) times the exact power of two;
    *  4. normalize to the 1e9 fixed-point grid and ε-smooth with the
    *     uniform mixture: `smoothed = (1e9−smoothPpb)·w_ppb div 1e9 +
    *     smoothPpb div n_domains` — DoReMi's uniform-smoothing term,
    *     which keeps every domain sampled.
    *
    * Scale shape: the corpus-sized work is upstream in the score
    * tables (landed once per model snapshot); this operator is one
    * domain-keyed partial aggregation collapsing to ≤ [[MaxStrata]]
    * metadata rows (bounded collect, over-budget fails loudly — the
    * [[epochCappedMix]] contract), then a driver-side closed form in
    * BigInt emitted as a literal frame. Output, sorted by domain:
    * (domain, n_docs, excess_avg, shift, weight_ppb, smoothed_ppb).
    * Null domains have no place in a mixture law and are excluded. */
  def doremiWeights(scored: DataFrame, domain: Column, excess: Column,
                    shiftUnit: Long, maxShift: Int = 30,
                    smoothPpb: Long = 100000000L): DataFrame = {
    require(shiftUnit >= 1, s"shiftUnit=$shiftUnit")
    require(maxShift >= 0 && maxShift <= 62, s"maxShift=$maxShift")
    require(smoothPpb >= 0 && smoothPpb <= 1000000000L,
      s"smoothPpb=$smoothPpb")
    // clipped sum in decimal(38): per-doc excess is a scaled-integer
    // score delta (~1e9); a long sum wraps at corpus scale
    val agg = scored.filter(domain.isNotNull)
      .groupBy(domain.cast("string").as("__d"))
      .agg(count(lit(1)).as("__n"),
        sum(greatest(excess.cast("long"), lit(0L)).cast("decimal(38,0)"))
          .as("__se"))
      .limit(MaxStrata + 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        BigInt(r.getDecimal(2).toBigInteger)))
    require(agg.length <= MaxStrata,
      s"doremiWeights saw more than $MaxStrata distinct domains — " +
        "the domain must be source/language-scale metadata, not a " +
        "high-cardinality key; pre-bucket it or pick a coarser column")
    val nd = agg.length.toLong
    val terms = agg.map { case (d, n, se) =>
      val ea = (se / n).toLong
      val sh = math.min(ea / shiftUnit, maxShift.toLong)
      (d, n, ea, sh, BigInt(n) << sh.toInt)
    }
    val tot = terms.map(_._5).sum
    val rows = terms.sortBy(_._1).map { case (d, n, ea, sh, w) =>
      val ppb = if (tot == 0) 0L else (w * 1000000000L / tot).toLong
      val sm = (1000000000L - smoothPpb) * ppb / 1000000000L +
        (if (nd == 0) 0L else smoothPpb / nd)
      org.apache.spark.sql.Row(d, n, ea, sh, ppb, sm)
    }
    scored.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("domain",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n_docs",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("excess_avg",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("shift",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("weight_ppb",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("smoothed_ppb",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }
}
