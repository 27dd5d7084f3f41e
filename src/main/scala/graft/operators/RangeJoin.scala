package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match each left row whose scalar `point` falls
  * inside a right-side interval `[lo, hi)`. With no equality key, Spark
  * plans the naive formulation as a broadcast-nested-loop — O(|L|·|R|)
  * comparisons, fine for a handful of intervals but fatal when the
  * interval table is large.
  *
  * `binned` is the scale path: quantize the value domain into fixed-width
  * bins, explode each interval onto every bin it overlaps, and equi-join
  * on the bin id with the exact range predicate as a residual filter.
  * The nested loop becomes a hash/sort-merge join of |L| + Σ(interval
  * width / binWidth) rows — the standard bucketed-interval-join used by
  * genomics engines and time-range joins at warehouse scale. Choose
  * `binWidth` near the median interval width so each interval lands in
  * O(1) bins.
  */
object RangeJoin {

  /** Naive formulation (broadcast-nested-loop; for tiny interval tables). */
  def naive(left: DataFrame, point: Column,
            right: DataFrame, lo: Column, hi: Column): DataFrame =
    left.join(broadcast(right), point >= lo && point < hi)

  /** Binned equi-join formulation.
    *
    * @param point     numeric column on `left` (cast to double internally)
    * @param lo        interval start (inclusive) on `right`
    * @param hi        interval end (exclusive) on `right`
    * @param binWidth  bin width in value units
    */
  def binned(left: DataFrame, point: Column,
             right: DataFrame, lo: Column, hi: Column,
             binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val loBin = floor(lo.cast("double") / binWidth).cast("long")
    // hi is exclusive, so floor(hi/w) may be one bin too far when hi sits
    // exactly on a boundary — harmless: the residual `point < hi` filter
    // drops anything matched through the extra bin
    val hiBin = floor(hi.cast("double") / binWidth).cast("long")
    val exploded = right
      .withColumn("__bin", explode(sequence(loBin, greatest(hiBin, loBin))))
    left
      .withColumn("__bin", floor(point.cast("double") / binWidth).cast("long"))
      .join(exploded, Seq("__bin"))
      .filter(point >= lo && point < hi)
      .drop("__bin")
  }
}
