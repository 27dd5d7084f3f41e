package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series motif similarity over event streams: which keys (users,
  * devices, sensors) exhibit the same temporal value patterns?
  * (Cf. "Time Series Similarity Search for Streaming Data in Distributed
  * Systems", EDBT 2019 — here as a SAX-style symbolize-then-index
  * pipeline instead of a distance scan.)
  *
  * Two stages, both engine-portable by construction:
  *
  *  1. [[symbolize]] — bucket each key's events into fixed time windows,
  *     average the integer-scaled values EXACTLY per window (long sum
  *     `div` count — no float accumulation), and discretize into
  *     `alphabet` equal-width global bands. Every step is integer
  *     arithmetic after one deterministic `floor(value * scale)`, so a
  *     SQL oracle replays the symbols bit-for-bit.
  *  2. [[motifPairs]] — w-symbol subsequences ("motifs") are hashed per
  *     key ([[graft.llm.Dedup.dupSpans]]'s positional-window technique on
  *     the symbol sequence); keys sharing >= `minShared` distinct motifs
  *     become candidate similar-series pairs. Ubiquitous motifs (shared
  *     by more than `maxKeys` keys — flat stretches every series has)
  *     are dropped like LSH degenerate buckets: they carry no signal and
  *     their pair expansion is quadratic.
  *
  * Scale shape: raw events reduce to one row per (key, bucket) in a
  * single partial-aggregated pass — events themselves never shuffle
  * anywhere else; the motif join keys on the motif hash with the
  * capped collect-expand of the dedup family (largest materialized array
  * is O(keys-per-motif), bounded by `maxKeys`).
  */
object SeriesMotifs {

  /** One row per (key, time bucket) with the EXACT integer mean `m` of
    * the bucket's scaled values (long sum `div` count — no float
    * accumulation anywhere). The shared first pass of [[symbolize]] and
    * [[bucketOutliers]]; events reduce here once and never shuffle raw
    * downstream. */
  def bucketMeans(events: DataFrame, key: Column, ts: Column, value: Column,
                  bucketMillis: Long, scale: Int = 1000): DataFrame = {
    require(bucketMillis > 0 && scale > 0, s"$bucketMillis/$scale")
    // bucket by FLOOR division (not truncation), so pre-1970 timestamps
    // (negative epoch millis) land in the bucket covering them — the
    // oracles mirror with floor(epoch_ms / width) rather than `//`,
    // which DuckDB truncates toward zero
    events.select(key.as("k"),
        floor(unix_millis(ts).cast("double") / bucketMillis).cast("long")
          .as("b"),
        floor(value * scale).cast("long").as("v"))
      .groupBy(col("k"), col("b"))
      .agg(sum(col("v")).as("__s"), count(lit(1)).as("__c"))
      .select(col("k"), col("b"), expr("__s div __c").as("m"))
  }

  /** One row per (key, time bucket): `sym` in [0, alphabet). Missing
    * buckets simply do not appear — motif windows run over each key's
    * OBSERVED bucket sequence (a gap joins its neighbors; callers
    * wanting strict contiguity can densify upstream). */
  def symbolize(events: DataFrame, key: Column, ts: Column, value: Column,
                bucketMillis: Long, alphabet: Int = 4,
                scale: Int = 1000): DataFrame = {
    require(alphabet >= 2, alphabet.toString)
    // both the global min/max pass and the symbol projection read the
    // bucket-means table — cache it so the raw events aggregate ONCE
    // (the jaccardJoin multi-consumer cache pattern; evictable, deduped
    // by canonicalized plan, cleared by long-running services between
    // corpora)
    val agg = bucketMeans(events, key, ts, value, bucketMillis, scale).cache()
    val mm = agg.agg(min(col("m")).as("__lo"), max(col("m")).as("__hi"))
    agg.crossJoin(broadcast(mm))
      .select(col("k"), col("b"),
        expr(s"((m - __lo) * $alphabet) div (__hi - __lo + 1)").as("sym"))
  }

  /** Per-key z-score outlier buckets, in EXACT arithmetic: bucket mean
    * `m` is an outlier of its key's series when
    * `(m - mean)^2 > (sigmaNum/sigmaDen)^2 * variance`, evaluated by
    * cross-multiplication as
    * `(n*m - S)^2 * sigmaDen^2 > sigmaNum^2 * (n*Q - S^2)` over the
    * key's bucket-mean stats (n, S = sum m, Q = sum m^2) — every term an
    * integer, the big squares in decimal(38) (HUGEINT on the oracle
    * side), so no float mean/stddev ever exists and the flag replays
    * bit-identically in SQL. Per-key stats are one extra partial
    * aggregation over the bucket-means table (metadata-sized); `n*m`
    * stays in long while n is buckets-per-key (a year of hourly buckets
    * x scaled values ~ 4e9, far under 2^63). Keys with one bucket or
    * zero variance flag nothing (0 > 0 is false). Returns only the
    * flagged (k, b, m) rows. */
  def bucketOutliers(events: DataFrame, key: Column, ts: Column,
                     value: Column, bucketMillis: Long, scale: Int = 1000,
                     sigmaNum: Int = 2, sigmaDen: Int = 1): DataFrame = {
    require(sigmaNum > 0 && sigmaDen > 0, s"$sigmaNum/$sigmaDen")
    // cached for the same two-consumer reason as in symbolize
    val agg = bucketMeans(events, key, ts, value, bucketMillis, scale).cache()
    val dec = "decimal(38,0)"
    // the square enters decimal BEFORE multiplying — a long m*m silently
    // wraps past |m| ~ 3e9, magnitudes this module's bounds allow
    val stats = agg.groupBy(col("k"))
      .agg(count(lit(1)).as("__n"), sum(col("m")).as("__S"),
        sum(col("m").cast(dec) * col("m").cast(dec)).as("__Q"))
    val dev = (col("__n") * col("m") - col("__S")).cast(dec)
    val varTerm = col("__n").cast(dec) * col("__Q").cast(dec) -
      col("__S").cast(dec) * col("__S").cast(dec)
    agg.join(stats, "k")
      .filter(dev * dev * lit(sigmaDen.toLong * sigmaDen) >
        lit(sigmaNum.toLong * sigmaNum) * varTerm)
      .select(col("k"), col("b"), col("m"))
  }

  /** Candidate similar-series pairs: (key_a < key_b, shared_motifs =
    * number of DISTINCT w-symbol subsequences both series contain),
    * filtered to pairs sharing at least `minShared`. `portable = true`
    * uses the md5 motif hash a SQL oracle can replay; production keeps
    * xxhash64 of the symbol slice. */
  def motifPairs(sym: DataFrame, w: Int = 4, minShared: Int = 2,
                 maxKeys: Int = 64, portable: Boolean = false): DataFrame = {
    require(w >= 1 && minShared >= 1 && maxKeys >= 2, s"$w/$minShared/$maxKeys")
    val seqs = sym.groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col("b"), col("sym")))).as("__t"))
      .select(col("k"),
        transform(col("__t"), x => x.getField("sym").cast("string")).as("s"))
    val n = size(col("s"))
    val win = slice(col("s"), col("p") + 1, lit(w))
    val grams = seqs
      .select(col("k"), col("s"),
        explode(when(n >= w, sequence(lit(0), n - w))
          .otherwise(array().cast("array<int>"))).as("p"))
      .select(col("k"),
        (if (portable) md5(array_join(win, " ")) else xxhash64(win)).as("__h"))
    // NO pre-distinct: collect_set dedups (k, h) by itself — partial
    // aggregation drops in-partition repeats map-side exactly like the
    // old distinct's first phase did, so the extra exchange of the gram
    // table bought nothing (guide §2.4: remove shuffles outright)
    val byMotif = grams.groupBy(col("__h"))
      .agg(sort_array(collect_set(col("k"))).as("__ks"))
      .filter(size(col("__ks")).between(2, maxKeys))
    byMotif
      .select(col("__ks"), posexplode(col("__ks")))
      .select(col("col").as("key_a"),
        explode(slice(col("__ks"), col("pos") + lit(2), size(col("__ks"))))
          .as("key_b"))
      .groupBy(col("key_a"), col("key_b"))
      .agg(count(lit(1)).as("shared_motifs"))
      .filter(col("shared_motifs") >= minShared)
  }
}
