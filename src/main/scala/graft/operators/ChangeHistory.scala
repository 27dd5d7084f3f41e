package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history built from a change log:
  * consecutive runs of the same attribute value per key collapse into
  * versioned `[valid_from, valid_to)` intervals, the last run left open
  * (`valid_to` null) — the standard warehouse dimension-history shape,
  * derived here from raw events instead of snapshot diffs.
  *
  * Lowering: ONE shuffle (the per-key groupBy); each key's sorted
  * event array yields its run START positions in one linear array
  * comparison (position 1, or value differs from the previous
  * element), and each run's interval/count comes from zipping the
  * starts with their successors — every step is O(events) per key
  * with O(1) lookups, no corpus window, no self-join. An `aggregate`
  * fold that appends to a runs array was measured first and rejected:
  * the per-event state copy makes it O(events x runs) per key — a
  * straggler for keys with long, churny histories.
  *
  * All interval arithmetic is on `unix_micros` longs and the run
  * arithmetic is integral, so results are bit-identical across engines
  * — the DuckDB oracle replays the collapse with lag/lead windows.
  */
object ChangeHistory {

  /** Versioned value history per key.
    *
    * Output: one row per (key, run) — `user_id`, `version` (1-based,
    * int), `value`, `valid_from_us` / `valid_to_us` (epoch-microsecond
    * longs, `valid_to_us` null on the current run; intervals are
    * half-open and abut exactly: a run's `valid_to_us` IS the next
    * run's `valid_from_us`), `n_events` (rows observed in the run).
    *
    * Rows with a null timestamp or null value are excluded up front
    * (null is "no observation", not a value; SQL replays skip them the
    * same way through `WHERE`).
    */
  def scd2(log: DataFrame, key: Column = col("user_id"),
           ts: Column = col("ts"), value: Column = col("event_type"),
           id: Column = col("event_id")): DataFrame = {
    val perKey = log
      .filter(ts.isNotNull && value.isNotNull)
      .select(key.as("user_id"), unix_micros(ts).as("us"), id.as("eid"),
        value.cast("string").as("v"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("us"), col("eid"),
        col("v")))).as("evs"))
    // run starts: 1-based positions whose value differs from their
    // predecessor (a group always has >= 1 event, so sequence(1, n)
    // never sees the start > stop descending-step surprise)
    def at(arr: Column, i: Column) = element_at(arr, i)
    val withStarts = perKey.select(col("user_id"), col("evs"),
      filter(sequence(lit(1), size(col("evs"))), i =>
        i === 1 || at(col("evs"), i - 1).getField("v") =!=
          at(col("evs"), i).getField("v")).as("starts"))
    // each run spans [start, next start); the successor array is the
    // starts shifted left with a null sentinel for the open last run.
    // The null-index access must sit under an explicit when(): with a
    // non-null-element array, ElementAt declares itself non-nullable
    // even for a nullable index, and the sentinel's null would read
    // back as garbage downstream
    val runs = withStarts.select(col("user_id"),
      zip_with(col("starts"),
        concat(slice(col("starts"), lit(2),
          greatest(size(col("starts")) - 1, lit(0))),
          array(lit(null).cast("int"))),
        (st, nx) => struct(
          at(col("evs"), st).getField("v").as("v"),
          at(col("evs"), st).getField("us").as("from_us"),
          when(nx.isNotNull, at(col("evs"), nx).getField("us"))
            .as("to_us"),
          (coalesce(nx, size(col("evs")) + 1) - st).cast("long")
            .as("cnt"))).as("runs"))
    runs
      .select(col("user_id"), posexplode(col("runs")).as(Seq("i", "r")))
      .select(col("user_id"), (col("i") + 1).cast("int").as("version"),
        col("r.v").as("value"), col("r.from_us").as("valid_from_us"),
        col("r.to_us").as("valid_to_us"), col("r.cnt").as("n_events"))
  }
}
