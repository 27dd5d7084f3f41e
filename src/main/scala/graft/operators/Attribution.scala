package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Marketing-touch attribution over an event stream: each conversion is
  * credited to the LATEST touch event strictly before it (in `(ts, id)`
  * order) and within `maxGapMicros` of it — last-touch attribution, the
  * workhorse credit model of product/ads analytics. A conversion with
  * no qualifying touch stays in the output unattributed (null touch
  * columns): the unattributed rate is itself the metric people watch.
  *
  * Lowering: this is a per-user as-of join (conversions as-of touches),
  * but both sides are slices of ONE stream — so instead of two scans
  * and a join it is one scan filtered to the relevant types and one
  * per-user running-frame window (`last(touch, ignoreNulls)` over
  * `UNBOUNDED PRECEDING..CURRENT ROW` in `(us, eid)` order — a row is
  * never both touch and conversion, so "at or before current" IS
  * "strictly before"). The running frame evaluates incrementally,
  * O(1) per row, and the window partitions on the user key — the same
  * per-user task bound as the sessionize/analytic-window family, never
  * a corpus-wide frame. An `aggregate`-fold lowering carrying a
  * credits array was measured first and rejected: the per-event state
  * copy is O(events x conversions) per user. A general two-table
  * as-of join (different streams, range semantics) is [[AsofJoin]];
  * this operator is the fused single-stream special case that avoids
  * its shuffle entirely.
  *
  * All arithmetic on `unix_micros` longs; ties are impossible on the
  * full `(us, eid)` key, so results are engine-portable bit-for-bit
  * and the DuckDB oracle replays them with IGNORE NULLS windows.
  */
object Attribution {

  /** Per-conversion last-touch credit.
    *
    * Output: `user_id`, `conv_eid`, `conv_us`, `touch_eid`,
    * `touch_type`, `gap_us` (conversion minus touch, microseconds) —
    * touch columns null when no touch of `touchTypes` precedes the
    * conversion within `maxGapMicros`.
    */
  def lastTouch(events: DataFrame, conversionType: String,
                touchTypes: Seq[String], maxGapMicros: Long,
                user: Column = col("user_id"), ts: Column = col("ts"),
                typ: Column = col("event_type"),
                id: Column = col("event_id")): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(conversionType),
      s"touchTypes must be non-empty and exclude $conversionType")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("eid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def lastTouch(c: Column) =
      last(when(col("t") =!= conversionType, c), ignoreNulls = true).over(w)
    val hit = col("t_us").isNotNull &&
      col("us") - col("t_us") <= maxGapMicros
    events
      .filter(typ.isInCollection(conversionType +: touchTypes) &&
        ts.isNotNull)
      .select(user.as("user_id"), unix_micros(ts).as("us"), id.as("eid"),
        typ.as("t"))
      .withColumn("t_us", lastTouch(col("us")))
      .withColumn("t_eid", lastTouch(col("eid")))
      .withColumn("t_t", lastTouch(col("t")))
      .filter(col("t") === conversionType)
      .select(col("user_id"), col("eid").as("conv_eid"),
        col("us").as("conv_us"),
        when(hit, col("t_eid")).as("touch_eid"),
        when(hit, col("t_t")).as("touch_type"),
        when(hit, col("us") - col("t_us")).as("gap_us"))
  }
}
