package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Item–item co-occurrence similarity — the "bought together"
  * collaborative-filtering kernel (also the co-click / co-view /
  * co-citation kernel; the graph is the same one X50's triangle count
  * walks, scored instead of closed).
  *
  * `sim(a, b) = cos^2 * 1e6 = c_ab^2 * 1e6 div (c_a * c_b)` over basket
  * incidence vectors — squaring clears the sqrt from the cosine of 0/1
  * vectors, so the score is exact integer arithmetic and replays in any
  * engine (the same no-libm trick as the tf-idf join's squared
  * threshold). log-free, monotone in true cosine.
  *
  * Shape at scale:
  *  - (basket, item) incidence is DISTINCT'd first (quantity doesn't
  *    count twice) — one map-side-combined shuffle;
  *  - pairs enumerate per basket from a sorted member array (a < b once,
  *    no self-join of the incidence table — the q112 orientation), so
  *    the generation stage is sum over baskets of size^2, NOT corpus^2;
  *  - `maxBasket` caps that square: a degenerate mega-basket (the
  *    "everything popular co-occurs with everything" pathology) would
  *    contribute O(size^2) pairs of near-zero signal, so baskets larger
  *    than the cap are EXCLUDED WHOLESALE — from pair counts AND from
  *    the per-item basket counts, keeping numerator and denominator
  *    measured on the same basket population (the dropped count is the
  *    caller's audit hook via [[droppedBaskets]]);
  *  - pair counts and item counts partial-aggregate map-side; the two
  *    denominator joins are item-keyed joins of COUNT tables, far below
  *    incidence size.
  */
object CoOccurrence {

  /** Baskets excluded by the cap — the no-silent-caps audit surface. */
  def droppedBaskets(df: DataFrame, basket: Column, item: Column,
                     maxBasket: Int): DataFrame =
    df.select(basket.as("basket"), item.as("item")).distinct()
      .groupBy("basket").agg(count(lit(1)).as("basket_size"))
      .filter(col("basket_size") > maxBasket)

  /** The retained (cap-filtered) per-basket member arrays — shared by
    * the pair and denominator stages. */
  private def members(df: DataFrame, basket: Column, item: Column,
                      maxBasket: Int): DataFrame =
    df.select(basket.as("basket"), item.as("item"))
      .filter(col("item").isNotNull && col("basket").isNotNull)
      .distinct()
      .groupBy("basket")
      .agg(sort_array(collect_set(col("item"))).as("items"))
      .filter(size(col("items")) <= maxBasket)

  /** Raw co-occurrence pair counts: (item_a, item_b, pair_n) with
    * item_a < item_b and `pair_n >= minPairs` — the graph-edge form
    * consumers that don't need similarity scores (X50 triangles, X86
    * weighted paths) use directly, skipping the denominator joins. */
  def pairCounts(df: DataFrame, basket: Column, item: Column,
                 minPairs: Long = 2L, maxBasket: Int = 64): DataFrame = {
    require(minPairs >= 1, s"minPairs=$minPairs")
    require(maxBasket >= 2, s"maxBasket=$maxBasket")
    members(df, basket, item, maxBasket)
      .select(explode(flatten(transform(col("items"), (x, i) =>
        transform(slice(col("items"), i + 2, size(col("items"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("item_a"), col("p.b").as("item_b"))
      .agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minPairs)
  }

  /** Pair similarity table: (item_a, item_b, pair_n, cos2_e6) for every
    * co-occurring pair with `pair_n >= minPairs`, item_a < item_b. */
  def cosineSimilarity(df: DataFrame, basket: Column, item: Column,
                       minPairs: Long = 2L,
                       maxBasket: Int = 64): DataFrame = {
    val itemCounts = members(df, basket, item, maxBasket)
      .select(explode(col("items")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("c"))
    pairCounts(df, basket, item, minPairs, maxBasket)
      .join(itemCounts.select(col("item").as("item_a"), col("c").as("ca")),
        Seq("item_a"))
      .join(itemCounts.select(col("item").as("item_b"), col("c").as("cb")),
        Seq("item_b"))
      .withColumn("cos2_e6", expr(
        "CAST(pair_n AS DECIMAL(38,0)) * pair_n * 1000000" +
          " div (CAST(ca AS DECIMAL(38,0)) * cb)"))
      .select(col("item_a"), col("item_b"), col("pair_n"), col("cos2_e6"))
  }
}
