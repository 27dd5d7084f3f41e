package graft.stream

import org.apache.spark.sql.DataFrame

/** Streaming form of the cross-batch observation dedup (sink discipline
  * S5, reference `db.py:88-100` / constraint `uq_pm_obs`): a re-arriving
  * observation with the same natural key is silently dropped.
  *
  * Batch-side the engine enforces this with a left-anti join against the
  * warehouse key set ([[graft.etl.Warehouse.appendIfAbsent]]). In a pure
  * streaming topology that join re-reads the sink every micro-batch;
  * `dropDuplicatesWithinWatermark` instead keeps the key set as operator
  * state and — critically for unbounded streams — DROPS state for keys
  * older than the watermark, so memory is bounded by the lateness window,
  * not by history. The trade is explicit: duplicates that arrive further
  * apart than `lateness` are NOT caught here and fall through to the
  * idempotent sink (which stays the source of truth, exactly like the
  * reference's DB constraint backstopping the application).
  */
object StreamingDedup {

  /** @param df       streaming DataFrame
    * @param timeCol  event-time column used for the watermark
    * @param lateness how long a key is remembered (e.g. "2 days")
    * @param keys     natural-key columns defining "the same observation"
    */
  def withinWatermark(df: DataFrame, timeCol: String, lateness: String,
                      keys: Seq[String]): DataFrame =
    df.withWatermark(timeCol, lateness)
      .dropDuplicatesWithinWatermark(keys)
}
