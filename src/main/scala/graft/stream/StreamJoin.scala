package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

/** Watermarked stream-stream join (SURVEY §2.10 extension): correlate two
  * unbounded streams on a key within a bounded event-time interval —
  * e.g. attach to each measurement the calibration record taken for the
  * same site in the preceding window.
  *
  * Both sides carry a watermark and the join condition bounds the
  * right-side time range relative to the left, which is exactly what lets
  * Spark expire buffered state: a right row is dropped once the left
  * watermark passes `rightTime + window`, so state is bounded by
  * (lateness + window) x arrival rate, never by stream history. Without
  * the time bound a stream-stream join would have to buffer both streams
  * forever — the unbounded-state mistake this operator exists to avoid.
  */
object StreamJoin {

  /** Inner-join `left` with the `right` rows of the same key whose time
    * falls in `[leftTime - window, leftTime]`.
    *
    * @param lateness watermark delay for BOTH streams (e.g. "10 minutes")
    * @param window   how far back a right row may be (e.g. "1 hour")
    */
  def precededBy(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 leftTime: String, rightTime: String,
                 lateness: String, window: String): DataFrame =
    left.withWatermark(leftTime, lateness)
      .join(right.withWatermark(rightTime, lateness),
        col(leftKey) === col(rightKey) &&
          col(rightTime) >= expr(s"$leftTime - INTERVAL $window") &&
          col(rightTime) <= col(leftTime))
}
