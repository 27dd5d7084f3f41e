package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Survivorship (golden-record construction) — the step after entity
  * resolution: duplicate records of one entity merge into a single
  * best-of record. Completes the ER chain
  * fuzzy pairs ([[FuzzyJoin]]) -> clusters
  * ([[graft.llm.Dedup.duplicateClusters]]) -> golden records.
  *
  * Rules are the standard MDM pair:
  *  - FIELD-level: per-field min/max across the entity's members
  *    (e.g. max balance, lexicographically-first name);
  *  - RECORD-level: whole fields copied from the entity's BEST member,
  *    best = max by `(priority, id)` — the unique id makes the pick
  *    deterministic under priority ties, and `max(struct(...))` is a
  *    partial-aggregable argmax, so survivorship is one plain
  *    aggregation (no window, no self-join).
  *
  * Records in no cluster survive as their own singleton entity
  * (`entity_id = id`), so the output covers every input record exactly
  * once. One broadcast-able left join (clusters hold only DUPED ids —
  * tiny next to the record table) plus one groupBy on the entity key.
  */
object GoldenRecords {

  /** @param records   source records
    * @param clusters  (id, entity) mapping for duplicated ids only —
    *                  [[graft.llm.Dedup.duplicateClusters]] output
    * @param id        unique record id column in `records`
    * @param priority  record-level quality rank (higher wins)
    * @param minFields fields surviving as the entity-wide minimum
    * @param maxFields fields surviving as the entity-wide maximum
    * @param bestFields fields copied from the best record
    */
  def merge(records: DataFrame, clusters: DataFrame, id: Column,
            priority: Column, minFields: Seq[String], maxFields: Seq[String],
            bestFields: Seq[String]): DataFrame = {
    val withEntity = records
      .join(broadcast(clusters.select(col("doc_id").as("__id"),
        col("comp_id").as("__ent"))), id === col("__id"), "left")
      .withColumn("__entity", coalesce(col("__ent"), id))
    val best = struct(priority +: id +: bestFields.map(col): _*)
    val aggs =
      minFields.map(f => min(f).as(s"min_$f")) ++
      maxFields.map(f => max(f).as(s"max_$f")) ++
      Seq(max(best).as("__best"), count(lit(1)).as("n_members"))
    withEntity.groupBy(col("__entity").as("entity_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select((Seq(col("entity_id"), col("n_members")) ++
        minFields.map(f => col(s"min_$f")) ++
        maxFields.map(f => col(s"max_$f")) ++
        bestFields.map(f => col("__best").getField(f).as(s"best_$f"))): _*)
  }
}
