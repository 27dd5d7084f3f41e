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

  /** One row per (key, time bucket): `sym` in [0, alphabet). Missing
    * buckets simply do not appear — motif windows run over each key's
    * OBSERVED bucket sequence (a gap joins its neighbors; callers
    * wanting strict contiguity can densify upstream). */
  def symbolize(events: DataFrame, key: Column, ts: Column, value: Column,
                bucketMillis: Long, alphabet: Int = 4,
                scale: Int = 1000): DataFrame = {
    require(bucketMillis > 0 && alphabet >= 2 && scale > 0,
      s"$bucketMillis/$alphabet/$scale")
    val rows = events.select(key.as("k"),
      floor(unix_millis(ts).cast("double") / bucketMillis).cast("long").as("b"),
      floor(value * scale).cast("long").as("v"))
    val agg = rows.groupBy(col("k"), col("b"))
      .agg(sum(col("v")).as("__s"), count(lit(1)).as("__c"))
      .select(col("k"), col("b"), expr("__s div __c").as("m"))
    val mm = agg.agg(min(col("m")).as("__lo"), max(col("m")).as("__hi"))
    agg.crossJoin(broadcast(mm))
      .select(col("k"), col("b"),
        expr(s"((m - __lo) * $alphabet) div (__hi - __lo + 1)").as("sym"))
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
      .distinct()
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
