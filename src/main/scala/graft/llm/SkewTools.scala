package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for hot keys at cluster scale.
  *
  * AQE's skew-join splitting handles sort-merge joins automatically; these
  * helpers cover the two shapes AQE does not: skewed AGGREGATIONS (one hot
  * group key melting a single reducer) and skewed broadcast-ineligible
  * joins where one side can be replicated.
  *
  * Salting is deterministic (hash of a stable column, not rand()) so
  * results are reproducible and retries are safe — important both for the
  * DuckDB oracle and for speculative execution on a real cluster.
  */
object SkewTools {

  /** Join-key skew audit — the measurement step BEFORE reaching for the
    * salting tools below: the top-k heaviest keys with their exact
    * share of the table (`share_e6 = cnt * 1e6 div n`), plus the row
    * and distinct-key totals on every row for context. One map-side-
    * combined count shuffle + a TakeOrderedAndProject over the COUNT
    * table (never the rows) + two 1-row aggregates broadcast back. A
    * top-1 share near 1e6/partitions is the "this key becomes a
    * straggler" signal that motivates [[saltedAggregate]]. */
  def keySkewAudit(df: DataFrame, key: Column, topK: Int = 5): DataFrame = {
    require(topK >= 1, s"topK=$topK")
    // null IS a key here — a hot null is the single most classic skew
    // culprit (failed joins, defaulted columns), and an audit that
    // filters it out both hides the straggler and inflates every other
    // key's share. It surfaces as the literal string below.
    val counts = df
      .select(coalesce(key.cast("string"), lit("<null>")).as("key"))
      .groupBy("key").agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum("cnt").as("n"),
      count(lit(1)).as("n_keys"))
    counts.orderBy(col("cnt").desc, col("key")).limit(topK)
      .crossJoin(broadcast(totals))
      .select(col("key"), col("cnt"), col("n"), col("n_keys"),
        expr("cnt * 1000000L div n").as("share_e6"))
  }

  /** Two-phase skew-safe aggregation: salt the group key into `salts`
    * sub-keys, partially aggregate, then combine the partials. The caller
    * provides partial and final aggregate lists; for algebraic aggregates
    * (count/sum/min/max) final = combine of partial columns.
    *
    * Example — skew-safe count+sum over a hot `user_id`:
    * {{{
    * saltedAgg(df, Seq(col("user_id")), col("event_id"), 16,
    *   partial = Seq(count(lit(1)).as("c"), sum($"value").as("s")),
    *   fin     = Seq(sum($"c").as("cnt"), sum($"s").as("sum_value")))
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[Column], saltSource: Column,
                salts: Int, partial: Seq[Column], fin: Seq[Column]): DataFrame = {
    require(salts >= 1, s"salts=$salts (pmod by 0 yields null salts)")
    val salted = df.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)))
    val phase1 = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partial.head, partial.tail: _*)
    phase1
      .groupBy(keys: _*)
      .agg(fin.head, fin.tail: _*)
  }

  /** Skew-safe inner equi-join by key replication: the skewed (big) side
    * gets a deterministic salt in [0, salts); the small side is exploded
    * `salts` times so every salted key finds its match. Total small-side
    * inflation = `salts`x — use for moderately-sized right sides that miss
    * the broadcast threshold but fit `salts`-replicated across the
    * cluster. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 salts: Int, saltSource: Column): DataFrame = {
    // salts = 0 would explode an EMPTY replication array and silently
    // return zero rows — every match lost with no error
    require(salts >= 1, s"salts=$salts")
    val saltedBig = skewed.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)))
    val replicated = other.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
