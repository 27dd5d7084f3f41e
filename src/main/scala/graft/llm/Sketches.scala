package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable sketches for 100 TB-scale aggregation.
  *
  * KMV (k-minimum-values) distinct-count sketch: keep the k smallest
  * DISTINCT hash values of the group; with hashes uniform on [0, 2^60),
  * the k-th smallest normalized value u estimates the distinct count as
  * `(k-1)/u` (fewer than k distinct hashes -> the sketch IS the exact
  * answer). The buffer is k longs regardless of group size, partial
  * aggregation combines map-side, and merge is a k-way min-merge — the
  * standard mergeable-summary contract.
  *
  * Why KMV next to Spark's built-in `approx_count_distinct` (HLL++):
  * KMV with a FIXED hash is fully deterministic, so its estimate — not
  * just its error bound — is reproducible in any engine; the DuckDB
  * oracle recomputes the exact same estimate from the same md5-derived
  * hashes. HLL's estimate depends on implementation internals and can
  * only ever be checked within a tolerance.
  */
object Sketches {

  /** Hash domain: 15 md5 hex digits = 60 bits, uniform on [0, 2^60). */
  val HashBits = 60
  val HashDomain: Double = 1152921504606846976.0d // 2^60, exact in a double

  /** Portable 60-bit hash of any column (string-cast then md5). */
  def kmvHash(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Aggregation column: the k smallest distinct hashes, ascending.
    * k >= 2: the estimator divides by the k-th min and its numerator is
    * k-1, so k = 1 estimates 0 for every saturated group and k = 0
    * crashes inside executor tasks — fail on the driver instead. */
  def kmvMins(k: Int)(h: Column): Column = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val fn = udaf(new KmvAggregator(k))
    fn(h)
  }

  /** Estimate from the sketch column produced by [[kmvMins]]. */
  def kmvEstimate(k: Int, mins: Column): Column = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    when(size(mins) < k, size(mins).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        (element_at(mins, k).cast("double") / lit(HashDomain)))
  }

  /** One-stop: distinct-count estimate of `value` per `keys` group.
    * Null values are excluded before the aggregator (the countMinBuild
    * convention): `kmvHash(null)` is null, which the primitive-Long
    * aggregator would read as hash 0 — the global minimum — silently
    * corrupting every group containing a null. Grouping goes through a
    * named projection so derived/aliased key expressions resolve (the
    * kmvRollup discipline; re-resolving a raw Column's toString throws). */
  def kmvDistinct(df: DataFrame, keys: Seq[Column], value: Column,
                  k: Int = 64): DataFrame = {
    val projected = df.select(keys :+ value.as("__kmv_v"): _*)
    require(projected.columns.count(_ == "__kmv_v") == 1,
      "kmvDistinct reserves the column name __kmv_v; rename the key column")
    val keyCols = projected.columns.dropRight(1).map(col).toSeq
    projected.filter(col("__kmv_v").isNotNull)
      .groupBy(keyCols: _*)
      .agg(kmvMins(k)(kmvHash(col("__kmv_v"))).as("mins"))
      .select(keyCols :+ kmvEstimate(k, col("mins")).as("kmv_est"): _*)
  }

  /** Bloom semi-join reduction — the generic form of the
    * decontamination pruning, for any "100 TB fact ⋉ selective dim"
    * join. The dim keys build a plan-literal bitmap (128 KB at the
    * default 2^20 bits, regardless of fact size); the probe evaluates
    * INSIDE the fact's scan stage, so rows that cannot match die before
    * the join shuffle ever sees them; the exact semi-join afterwards
    * removes the bitmap's false positives — the result EQUALS the plain
    * semi-join, the bloom only prunes. Sized for dims up to ~100k keys
    * at the default (≈2.4% fp); bigger dims want more bits, and a dim
    * too big to collect as a bitmap wants a shuffle join anyway. */
  def bloomSemiJoin(fact: DataFrame, factKey: Column,
                    dim: DataFrame, dimKey: Column,
                    numBits: Int = 1 << 20): DataFrame = {
    // no distinct on either dim pass: bit_or makes duplicate keys a
    // no-op in the build, and a semi-join output is per-fact-row
    // regardless of build-side multiplicity — both would only add a
    // shuffle
    val bits = bloomBuild(dim.select(dimKey.as("__k")), col("__k"), numBits)
    fact.filter(bloomMightContain(bits, factKey))
      .join(broadcast(dim.select(dimKey.as("__k"))),
        factKey === col("__k"), "left_semi")
  }

  // ----------------------------------------------------------- quantiles

  /** Sketch-based group quantiles — the 100 TB path next to the exact
    * sort-based `percentile` (q47's shape). `percentile_approx` runs
    * Greenwald-Khanna: a mergeable bounded-memory summary with rank
    * error at most `n / accuracy` per group, aggregated partially
    * map-side — no per-group sort, no group's values ever collected in
    * one place. The result is one of the group's ACTUAL values (the
    * exact path interpolates), within that rank bound of the true
    * quantile; SketchesSpec pins the bound against the exact path.
    * Output columns are `q_<pct>` per requested percentile + `cnt`. */
  def approxQuantiles(df: DataFrame, keys: Seq[Column], value: Column,
                      percentiles: Seq[Double],
                      accuracy: Int = 10000): DataFrame = {
    require(percentiles.nonEmpty, "no percentiles requested")
    require(percentiles.forall(p => p >= 0 && p <= 1), s"$percentiles")
    require(accuracy >= 1, s"accuracy=$accuracy")
    val names = percentiles.map(p => s"q_${(p * 100).round}")
    require(names.distinct.size == names.size,
      s"percentiles $percentiles collide after rounding to $names — " +
        "space them at least a full percent apart")
    val aggs = percentiles.zip(names).map { case (p, n) =>
      percentile_approx(value, lit(p), lit(accuracy)).as(n)
    } :+ count(lit(1)).as("cnt")
    df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  // --------------------------------------------------------------- bloom

  /** Bit positions of `item` in a `numBits`-bit Bloom filter (power of
    * two), via the XOR-rotate two-hash family the minhash path uses
    * (`h1 + i*h2` would need wrapping long arithmetic, which ANSI mode
    * rejects). Pure column algebra — usable on both the build and the
    * probe side, so the two can never disagree. */
  def bloomPositions(item: Column, numBits: Int, numHashes: Int): Seq[Column] = {
    require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
      s"numBits $numBits must be a power of two >= 64")
    require(numHashes >= 1, s"numHashes $numHashes")
    val h1 = xxhash64(item)
    val h2 = xxhash64(lit(1), item)
    def rot(c: Column, i: Int): Column =
      if (i % 64 == 0) c
      else shiftleft(c, i % 64).bitwiseOR(shiftrightunsigned(c, 64 - (i % 64)))
    (0 until numHashes).map { i =>
      h1.bitwiseXOR(rot(h2, i * 7 + 1)).bitwiseAND(lit((numBits - 1).toLong))
    }
  }

  private val BitMasks: Seq[Long] = (0 until 64).map(1L << _)

  /** Build the filter: ONE partially-aggregated pass over the items
    * (word index -> OR of bit masks — at most numBits/64 groups), the
    * bitmap collected to the driver as `numBits / 64` longs. A 2^20-bit
    * filter is 16k longs = 128 KB — broadcastable as a plan literal at
    * any corpus scale, unlike the item set itself. */
  def bloomBuild(df: DataFrame, item: Column, numBits: Int,
                 numHashes: Int = 4): Array[Long] = {
    val pos = explode(array(bloomPositions(item, numBits, numHashes): _*))
    val words = df.select(pos.as("__p"))
      .select(shiftrightunsigned(col("__p"), 6).cast("int").as("__w"),
        element_at(typedLit(BitMasks),
          col("__p").bitwiseAND(lit(63L)).cast("int") + 1).as("__m"))
      .groupBy("__w").agg(expr("bit_or(__m)").as("__bits"))
      .collect()
    val arr = new Array[Long](numBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership test against a built bitmap: all `numHashes` bits set.
    * NO false negatives (every inserted item passes); false positives at
    * the standard Bloom rate — callers follow with an exact verify. The
    * bitmap and the 64 single-bit masks ride the plan as array literals;
    * the test is k `element_at` probes, fully codegen'd. */
  def bloomMightContain(bits: Array[Long], item: Column,
                        numHashes: Int = 4): Column = {
    // the probe re-derives numBits from the array length, so the array
    // must be exactly what bloomBuild returned (same numBits AND the
    // same numHashes) — a truncated/padded bitmap would silently probe
    // different positions and break the no-false-negative contract.
    // Non-power-of-two lengths are the detectable corruption: refuse.
    require(bits.nonEmpty && java.lang.Integer.bitCount(bits.length) == 1,
      s"bitmap length ${bits.length} is not a power of two — not a " +
        "bloomBuild result")
    val numBits = bits.length * 64
    val bitsLit = typedLit(bits.toSeq)
    bloomPositions(item, numBits, numHashes).map { p =>
      val word = element_at(bitsLit, shiftrightunsigned(p, 6).cast("int") + 1)
      val mask = element_at(typedLit(BitMasks),
        p.bitwiseAND(lit(63L)).cast("int") + 1)
      word.bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)
  }

  /** EXACT heavy hitters at scale: every item whose count is strictly
    * greater than `n / threshold` (n = total items), found without ever
    * shuffling the full per-item count table.
    *
    *  - pass 1: a Misra-Gries sketch ([[MisraGriesAggregator]],
    *    `sketchSize` counters of mergeable state per partition) produces
    *    a candidate set. MG guarantees every item with count > n/k
    *    survives a size-k sketch, so with `sketchSize >= threshold`
    *    there are NO false negatives — the sketch's only error mode is
    *    extra candidates;
    *  - pass 2: the <= sketchSize candidates broadcast back as a filter
    *    and are counted EXACTLY; false candidates fall out at the final
    *    `count * threshold > n` check.
    *
    * Two narrow passes, partial aggregation both times, per-task state
    * O(sketchSize) — while the result is exactly `GROUP BY item HAVING
    * count(*) > n/threshold`, which is what the DuckDB oracle runs.
    */
  def heavyHitters(items: DataFrame, item: Column, threshold: Int,
                   sketchSize: Int = 0): DataFrame = {
    val k = if (sketchSize > 0) sketchSize else 2 * threshold
    require(k >= threshold, s"sketchSize $k < threshold $threshold loses the " +
      "no-false-negative guarantee")
    val mg = udaf(new MisraGriesAggregator(k))
    // CACHED (the dfOrderedSets discipline): the sketch pass and the
    // recount pass both read the item stream, and the caller's item
    // column is typically a full tokenize+explode of the corpus (q82) —
    // without the cache that runs twice. Blocks stay evictable and the
    // bench's post-pair clearCache bounds the session footprint; a
    // deployment whose exploded item stream outweighs its storage tier
    // should prefer re-tokenizing (drop the cache) — the two-pass
    // algorithm itself is unchanged either way.
    val base = items.select(item.cast("string").as("item"))
      .filter(col("item").isNotNull)
      .cache()
    // ONE aggregation yields both the candidate set and n — keeping the
    // documented two-pass shape honest (sketch pass + recount pass)
    val head = base.agg(mg(col("item")).as("cand"), count(lit(1)).as("n"))
      .head()
    val candidates = head.getSeq[String](0).toIndexedSeq
    val n = head.getLong(1)
    base.filter(col("item").isin(candidates: _*))
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * threshold > lit(n))
  }

  /** Sketch-algebra rollup: per-fine-group KMV sketches merged into
    * coarser groups WITHOUT re-reading the data — the mergeable-summary
    * contract as an operator. Exploding each sketch's <= k mins and
    * re-aggregating through the same [[KmvAggregator]] yields exactly
    * the k smallest distinct hashes of the union (any hash in the
    * union's top-k is in its own group's top-k), so the rolled-up
    * estimate EQUALS the estimate a direct scan of the coarse group
    * would produce — which is what the oracle recomputes. Input is
    * `fine-groups` rows; the shuffle carries <= k longs per fine group. */
  def kmvRollup(sketches: DataFrame, mins: Column, coarse: Seq[Column],
                k: Int): DataFrame = {
    val exploded = sketches.select(coarse :+ explode(mins).as("__h"): _*)
    // group by the projection's OWN columns (everything but __h): a
    // derived coarse expression like date_trunc(...).as("month") keeps
    // its alias through the projection, where re-resolving the raw
    // Column's toString would throw. The internal alias must not
    // collide with a coarse column's name (a coarse column actually
    // named __h would silently merge into the hash column and break
    // the grouping) — fail loudly instead.
    require(exploded.columns.count(_ == "__h") == 1,
      "kmvRollup reserves the column name __h; rename the coarse column")
    val keys = exploded.columns.filterNot(_ == "__h").map(col).toSeq
    exploded.groupBy(keys: _*)
      .agg(kmvMins(k)(col("__h")).as("mins"))
  }

  /** Pairwise distinct-set overlap estimates from per-group KMV
    * sketches — the sketch-space answer to the bitmap overlap kernel,
    * for when exact bitmaps don't fit (user domain too large, groups
    * too many): `|A ∩ B| ≈ est(A) + est(B) - est(A ∪ B)` by
    * inclusion–exclusion, with the union sketch formed by pure column
    * algebra (k smallest of the two sorted-distinct min arrays — no
    * UDAF, no data re-read). All O(groups^2 * k) work happens on the
    * SKETCH table; negative estimates are possible for near-disjoint
    * sets and are the caller's noise floor, as with any sketch. */
  def kmvIntersectEstimates(sketches: DataFrame, group: Column,
                            mins: Column, k: Int): DataFrame = {
    val a = sketches.select(group.as("type_a"), mins.as("ma"))
    val b = sketches.select(group.as("type_b"), mins.as("mb"))
    a.join(b, col("type_a") < col("type_b"))
      .withColumn("mu",
        slice(array_sort(array_distinct(concat(col("ma"), col("mb")))),
          1, k))
      .select(col("type_a"), col("type_b"),
        kmvEstimate(k, col("ma")).as("est_a"),
        kmvEstimate(k, col("mb")).as("est_b"),
        kmvEstimate(k, col("mu")).as("est_union"),
        (kmvEstimate(k, col("ma")) + kmvEstimate(k, col("mb")) -
          kmvEstimate(k, col("mu"))).as("est_intersect"))
  }

  // ----------------------------------------------------------- count-min

  /** Bucket of `item` in row `row` of a depth x width Count-Min grid:
    * 28 bits of an md5 over the row-salted item, mod width. The same
    * md5-derived family as KMV/minhash, so estimates — not just error
    * bounds — replay bit-for-bit in any engine with md5. */
  def cmBucket(item: Column, row: Int, width: Int): Column = {
    require(width >= 2, s"width=$width")
    conv(substring(md5(concat(lit(s"$row:"), item.cast("string"))), 1, 7),
      16, 10).cast("long") % width
  }

  /** Build a Count-Min frequency sketch: `depth * width` counter cells
    * (rows `0..depth-1`), each cell the number of item occurrences
    * hashing to it. ONE partially-aggregated pass over the items (the
    * explode fans each occurrence to its `depth` cells map-side; the
    * shuffle carries at most `depth * width` groups), so the sketch
    * costs the same at 60k rows and 100 TB. Cells are plain counts, so
    * two sketches MERGE by adding cells — the mergeable-summary
    * contract, same as KMV/MG: per-day sketches roll up to per-month
    * by a `depth * width`-row union + sum, never re-reading the data. */
  def countMinBuild(items: DataFrame, item: Column,
                    depth: Int = 3, width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth=$depth")
    val cells = (0 until depth).map { r =>
      struct(lit(r).as("row"), cmBucket(col("__i"), r, width).as("bucket"))
    }
    items.select(item.cast("string").as("__i"))
      .filter(col("__i").isNotNull)
      .select(explode(array(cells: _*)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for `probes` against a built sketch:
    * min over the `depth` row counters — the classic CM upper-bounding
    * estimate (never an undercount; overcount bounded by collisions,
    * E <= n/width per row). The sketch is at most `depth * width` rows
    * regardless of corpus size, so it BROADCASTS to the probe side and
    * the lookup never shuffles the probes. */
  def countMinEstimate(probes: DataFrame, sketch: DataFrame, item: Column,
                       depth: Int = 3, width: Int = 1024): DataFrame = {
    // the sketch is depth*width metadata, so one bounded lookup can
    // validate the probe depth against what was actually built: a
    // deeper probe reads absent rows, coalesces them to 0, and returns
    // cm_est = 0 for items that ARE present — a silent violation of the
    // no-undercount guarantee. A width mismatch is undetectable from
    // the data (buckets are mod-width hashes) and stays a documented
    // build/probe contract. An empty sketch (nothing counted) passes:
    // every true count is 0 and 0 is the correct estimate.
    val builtMax = sketch.agg(max(col("row"))).head()
    if (!builtMax.isNullAt(0))
      require(builtMax.getInt(0) + 1 == depth,
        s"sketch built with depth ${builtMax.getInt(0) + 1}, probed with " +
          s"$depth — probing absent rows would return false-zero estimates")
    val cells = (0 until depth).map { r =>
      struct(lit(r).as("row"), cmBucket(col("item"), r, width).as("bucket"))
    }
    probes.select(item.cast("string").as("item")).distinct()
      .filter(col("item").isNotNull)
      .select(col("item"), explode(array(cells: _*)).as("rb"))
      .select(col("item"), col("rb.row").as("row"),
        col("rb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
  }

  // ------------------------------------------------------------ hyperloglog

  /** Deterministic portable HyperLogLog (Flajolet et al. 2007) in the
    * RELATIONAL register representation — the answer to the class-doc
    * caveat that HLL "can only ever be checked within a tolerance":
    * with the fixed md5-derived 60-bit hash ([[kmvHash]]), bucket = the
    * low b bits, rank = leading-zero position (+1) of the remaining
    * w = 60-b bits, the sketch is one row per (slice, bucket) holding
    * max(rank) — fully deterministic, so the DuckDB oracle replays
    * registers AND estimate digit for digit, no tolerance anywhere.
    *
    * Register-rows ARE the mergeable-summary contract made relational:
    * a shard lands its bounded register table (≤ m rows per slice)
    * once, and ANY union of shards/slices merges with
    * `groupBy(bucket).agg(max(r))` — the cross-shard cardinality story
    * at 100 TB with no binary blob format, no custom serialization,
    * and map-side max partials doing the combine. The corpus pays one
    * scan + one (slice, bucket)-keyed groupBy.
    *
    * Nulls are excluded before hashing (the [[kmvDistinct]]
    * convention); slice columns must be pre-aliased (the kmvRollup
    * projection discipline). */
  def hllRegisters(df: DataFrame, value: Column, m: Int = 256,
                   slices: Seq[Column] = Nil): DataFrame = {
    require(m >= 128 && Integer.bitCount(m) == 1,
      s"m must be a power of two >= 128 (the alpha_m closed form's " +
        s"validity range), got $m")
    val b = Integer.numberOfTrailingZeros(m)
    val w = HashBits - b
    val projected = df.select(slices :+ value.as("__hll_v"): _*)
    require(projected.columns.count(_ == "__hll_v") == 1,
      "hllRegisters reserves the column name __hll_v; rename the slice")
    val keyCols = projected.columns.dropRight(1).map(col).toSeq
    val h = kmvHash(col("__hll_v"))
    // h in [0, 2^60): shiftright is sign-safe; the top w bits are the
    // rank source, the low b bits the bucket
    val v = shiftright(h, b)
    val bitlen = when(v === 0L, lit(0)).otherwise(length(bin(v)))
    projected.filter(col("__hll_v").isNotNull)
      .select(keyCols
        :+ h.bitwiseAND(lit((m - 1).toLong)).cast("int").as("bucket")
        :+ (lit(w + 1) - bitlen).cast("int").as("__r"): _*)
      .groupBy(keyCols :+ col("bucket"): _*)
      .agg(max(col("__r")).as("r"))
  }

  /** The raw HLL estimate from a register table, EXACT-integer form:
    * alpha_m = 0.7213 / (1 + 1.079/m) as the exact rational
    * 7213000·m / (10000·(1000·m + 1079)), the harmonic sum cleared to
    * the 2^(w+1) grid (S = Σ 2^(w+1−r) over present registers +
    * zeros·2^(w+1) — every term an exact long, S ≤ m·2^(w+1) well
    * inside bigint), and
    * `hll_est = alpha_num·m²·2^(w+1) div (alpha_den·S)` in
    * decimal(38,0) — a BIGINT any engine reproduces. The small-range
    * linear-counting branch needs ln(m/V) and is deliberately the
    * CONSUMER's choice — `v_zero` is emitted so it is computable
    * downstream; the oracle-pinned law is the raw estimator. Output:
    * slices + (n_buckets, v_zero, sum_scaled, hll_est). */
  def hllEstimate(registers: DataFrame, m: Int = 256,
                  slices: Seq[String] = Nil): DataFrame = {
    require(m >= 128 && Integer.bitCount(m) == 1, s"m=$m")
    val b = Integer.numberOfTrailingZeros(m)
    val e = HashBits - b + 1
    val alphaNum = 7213000L * m
    val alphaDen = 10000L * (1000L * m + 1079L)
    registers
      .groupBy(slices.map(col): _*)
      .agg(count(lit(1)).as("n_buckets"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $e - r)")).as("__sp"))
      .withColumn("v_zero", lit(m.toLong) - col("n_buckets"))
      .withColumn("sum_scaled",
        col("__sp") + col("v_zero") * lit(1L << e))
      .withColumn("hll_est", expr(
        s"CAST(CAST($alphaNum AS DECIMAL(38,0)) * ${m.toLong * m} * ${1L << e}" +
          s" div (CAST($alphaDen AS DECIMAL(38,0)) * sum_scaled) AS BIGINT)"))
      .select(slices.map(col) ++ Seq(col("n_buckets"), col("v_zero"),
        col("sum_scaled"), col("hll_est")): _*)
  }
}

/** Misra-Gries frequent-items sketch: at most `k` (item, count) counters;
  * an unmatched item with a full buffer decrements every counter (the
  * classic k-way cancellation). Merge sums counters then re-caps by
  * subtracting the (k+1)-th largest count — the standard mergeable form
  * (Agarwal et al., "Mergeable Summaries"). Guarantee: any item with true
  * count > n/k is present in the final sketch; counts are undercounts by
  * at most n/k. Emitted as the candidate list for an exact recount. */
final class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {

  override def zero: Map[String, Long] = Map.empty

  private def cap(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
      m.flatMap { case (i, c) =>
        if (c - cut > 0) Some(i -> (c - cut)) else None
      }
    }

  override def reduce(m: Map[String, Long], item: String): Map[String, Long] =
    m.get(item) match {
      case Some(c) => m.updated(item, c + 1)
      case None if m.size < k => m.updated(item, 1L)
      case None =>
        m.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    cap(b.foldLeft(a) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    })

  override def finish(m: Map[String, Long]): Seq[String] = m.keys.toSeq.sorted

  override def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

/** Bounded buffer of the k smallest DISTINCT hash values (ascending).
  * Insert and merge keep the buffer sorted and capped, so partial
  * aggregation state is O(k) per group per partition. */
final class KmvAggregator(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {

  override def zero: Seq[Long] = Vector.empty

  private def insert(buf: Seq[Long], h: Long): Seq[Long] = {
    val i = buf.search(h).insertionPoint
    if (i < buf.length && buf(i) == h) buf                  // already present
    else if (buf.length < k) (buf.take(i) :+ h) ++ buf.drop(i)
    else if (h < buf.last) ((buf.take(i) :+ h) ++ buf.drop(i)).take(k)
    else buf
  }

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] = insert(buf, h)
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = b.foldLeft(a)(insert)
  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] = bufferEncoder
}
