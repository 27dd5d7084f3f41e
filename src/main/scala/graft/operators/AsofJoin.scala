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
  * equal timestamps (>= semantics); `last(_, ignoreNulls)` carries the
  * latest right row — as a single payload STRUCT, so all attached fields
  * come from the same right row — forward to the left rows that follow.
  *
  * Cost: one shuffle + sort of |L| + |R| rows — the same price as a
  * sort-merge join, independent of how many right rows precede each left
  * row. Window state is one buffered struct. This is the standard
  * scale-safe formulation for billion-row as-of joins.
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
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    require(payload.intersect(leftCols).isEmpty,
      s"payload columns ${payload.intersect(leftCols)} collide with left side")

    // common layout: __k, __t, __side (0 = right so it sorts first at
    // equal time), every left column (null on right rows), and ONE struct
    // `__p` of the whole right payload (null on left rows). Carrying the
    // payload as a single struct means `last(_, ignoreNulls)` picks one
    // ROW, never stitches fields from different right rows — a right row
    // whose payload column is null must still win as "the latest row",
    // null and all. (Per-column last() would skip the null and resurrect
    // an older row's value.) One window function instead of |payload|.
    val pType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(right.schema.fieldIndex(p))))
    val taggedLeft = left.select(
      col(leftKey).as("__k") +: col(leftTime).as("__t") +: lit(1).as("__side") +:
        (leftCols.map(col) :+ lit(null).cast(pType).as("__p")): _*)
    // null join keys/times never match (join semantics — the window's
    // partitionBy would otherwise GROUP null keys and match them); left
    // rows with nulls still pass through: nulls sort first, so no right
    // row precedes them in their window frame
    val taggedRight = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
      col(rightKey).as("__k") +: col(rightTime).as("__t") +: lit(0).as("__side") +:
        (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(payload.map(col): _*).as("__p")): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedLeft.unionByName(taggedRight)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("__p").getField(p).as(p)): _*)
  }
}
