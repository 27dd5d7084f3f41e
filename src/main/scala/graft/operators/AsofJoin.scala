package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the single right row
  * with the greatest `rightTime <= leftTime` for the same key (the
  * time-series "most recent fact at or before t" join; DuckDB/kdb
  * `ASOF JOIN` semantics).
  *
  * Spark has no built-in as-of join, and the naive lowering — an
  * inequality join + per-left-row max — is a quadratic blowup on skewed
  * keys. This implementation uses the union-of-sorted-streams form
  * instead: tag both sides, union them, and run ONE window pass per key
  * ordered by (time, side) where right rows sort before left rows at
  * equal timestamps (>= semantics); `last(_, ignoreNulls)` carries each
  * right payload forward to the left rows that follow it.
  *
  * Cost: one shuffle + sort of |L| + |R| rows — the same price as a
  * sort-merge join, independent of how many right rows precede each left
  * row. Window state is one row per payload column. This is the
  * standard scale-safe formulation for billion-row as-of joins.
  *
  * Requirements: `(key, time)` unique on the right side for deterministic
  * output (enforce upstream with an aggregation when needed). Left rows
  * with no preceding right row keep null payloads (LEFT as-of).
  */
object AsofJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side; `(rightKey, rightTime)`
    *                   should be unique
    * @param leftKey    join key column on the left
    * @param rightKey   join key column on the right
    * @param leftTime   event-time column on the left
    * @param rightTime  event-time column on the right
    * @param payload    right-side columns to attach to each left row
    *                   (names must not collide with left column names)
    */
  def backward(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"payload columns ${payload.intersect(leftCols)} collide with left side")

    // common layout: __k, __t, __side (0 = right so it sorts first at
    // equal time), every left column (null on right rows), every payload
    // column (null on left rows)
    val taggedLeft = left.select(
      col(leftKey).as("__k") +: col(leftTime).as("__t") +: lit(1).as("__side") +:
        (leftCols.map(col) ++
          payload.map(p => lit(null).cast(right.schema(p).dataType).as(p))): _*)
    val taggedRight = right.select(
      col(rightKey).as("__k") +: col(rightTime).as("__t") +: lit(0).as("__side") +:
        (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payload.map(col)): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(taggedLeft.unionByName(taggedRight)) {
      (d, p) => d.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select((leftCols ++ payload).map(col): _*)
  }
}
