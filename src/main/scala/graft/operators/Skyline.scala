package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier, minimize both dims): the rows no other
  * row strictly dominates — `q` dominates `p` iff `q.x <= p.x` and
  * `q.y <= p.y` with at least one strict. The classic
  * "cheap AND small" multi-criteria shortlist operator (Börzsönyi et
  * al., ICDE 2001) that SQL can only express as a quadratic
  * `NOT EXISTS` — which is exactly what the oracle runs, and exactly
  * what this lowering avoids.
  *
  * Three bounded phases, no self-join, no global sort:
  *  1. bucketize x by range (width from a 1-row min/max broadcast);
  *     per-bucket `min(y)` summary, prefix-min over STRICTLY EARLIER
  *     buckets — a window over the B-row summary, nothing bigger;
  *  2. prune: every point in a strictly earlier bucket has strictly
  *     smaller x, so `p` with `prefix_min_y <= p.y` is dominated and
  *     dies against the broadcast summary, inside its scan stage. What
  *     survives is at most the per-bucket skyline staircase;
  *  3. exact finish on survivors: cross-bucket dominance among
  *     survivors is already impossible (a surviving dominator in an
  *     earlier bucket would have pruned the point via the summary —
  *     dominance chains collapse transitively onto phase 2), so only
  *     SAME-BUCKET dominance remains: one b-partitioned shuffle, a
  *     `dense_rank` over x, the strictly-smaller-x running `min(y)` as
  *     a RANGE frame on the RANK (a frame on x itself computes `x - 1`
  *     and overflows at Long.MinValue; `rnk - 1` cannot wrap), and the
  *     equal-x `min(y)` as the degenerate [0, 0] range frame on x.
  *
  * Ties are strict-dominance ties: exact duplicates of a frontier point
  * all survive (no row "dominates itself" through a copy), matching the
  * NOT EXISTS form. Inputs must be integral (the range frame and the
  * exact bucket arithmetic both ride on longs); callers with decimals
  * scale to integer units first — exact, not a rounding.
  *
  * Worst case honesty: anti-correlated data where EVERYTHING is on the
  * frontier defeats phase 2 by definition (the output is the input);
  * the per-bucket windows then carry bucket-sized groups, which is
  * still the best any exact skyline can do — the operator degrades to
  * partitioned staircase scans, never to a corpus self-join. */
object Skyline {

  def skyline2d(df: DataFrame, id: Column, x: Column, y: Column,
                buckets: Int = 256): DataFrame = {
    require(buckets >= 1, s"buckets=$buckets")
    val pts = df.select(id.as("id"), x.cast("long").as("x"),
        y.cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val span = pts.agg(min("x").as("x0"), max("x").as("x1"))
    // Overflow-safe LONG bucketing ([[BucketMath.halfSpanBucketSql]]):
    // `x1 - x0` wraps when the x span exceeds Long.MaxValue, making
    // bucket ids non-monotone in x and the phase-2 "earlier bucket
    // implies strictly smaller x" invariant silently false; the shared
    // half-span form is monotone with equal x mapping to equal b — the
    // only two properties the prune needs.
    val bucketed = pts.crossJoin(broadcast(span))
      .withColumn("b", expr(
        BucketMath.halfSpanBucketSql("x", "x0", "x1", buckets)))
      .drop("x0", "x1")
    val summary = bucketed.groupBy("b").agg(min("y").as("bmin"))
      .withColumn("prefix_min", min(col("bmin")).over(
        Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("b"), col("prefix_min"))
    val survivors = bucketed
      .join(broadcast(summary), Seq("b"))
      .filter(col("prefix_min").isNull || col("y") < col("prefix_min"))
      .drop("prefix_min")
    // same-bucket dominance on survivors, ONE shuffle (partition by b):
    // a RANGE frame directly on x computes `x - 1` for its bound and
    // overflows at Long.MinValue, so the strictly-smaller-x frame rides
    // on dense_rank instead — ranks are small positives, `rnk - 1` can
    // never wrap, and rnk' < rnk iff x' < x. The equal-x minimum is the
    // degenerate [0, 0] range frame on x (no offset arithmetic). Both
    // x-ordered windows share one sort; the rnk-ordered window re-sorts
    // data already in rnk order (rnk is monotone in x — a no-op pass).
    val wx = Window.partitionBy("b").orderBy("x")
    val ltRnk = Window.partitionBy("b").orderBy("rnk")
      .rangeBetween(Window.unboundedPreceding, -1)
    survivors
      .withColumn("rnk", dense_rank().over(wx))
      .withColumn("min_eq", min(col("y")).over(wx.rangeBetween(0, 0)))
      .withColumn("min_lt", min(col("y")).over(ltRnk))
      .filter((col("min_lt").isNull || col("y") < col("min_lt")) &&
        col("y") <= col("min_eq"))
      .select(col("id"), col("x"), col("y"))
  }
}
