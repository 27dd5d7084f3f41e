package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Corpus subsampling must be REPRODUCIBLE — rerunning the pipeline (or
  * running it on another engine, or with different partitioning) has to
  * select the same rows, or downstream dedup/decontamination bookkeeping
  * breaks. So there is no RNG anywhere: a row is kept iff the md5 bucket
  * of its id falls below its stratum's rate. That makes sampling a pure
  * codegen'd filter — no shuffle, no state, trivially pushed past scans —
  * and samples are NESTED: raising a stratum's rate only ever adds rows,
  * never swaps them (the property you want when growing a data mix).
  */
object Sampling {

  /** 28-bit md5 bucket of the id — same construction as the q55 split
    * assignment, expressible in any SQL engine. */
  private val BucketSpace = 268435456.0 // 16^7

  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 7), 16, 10).cast("long")

  /** Keep each row with its stratum's probability, deterministically.
    *
    * @param stratum     column whose value selects the rate (e.g. lang)
    * @param id          stable row identity to hash
    * @param rates       stratum value -> keep fraction in [0, 1]
    * @param defaultRate keep fraction for strata not listed
    */
  def stratified(df: DataFrame, stratum: Column, id: Column,
                 rates: Map[String, Double],
                 defaultRate: Double = 0.0): DataFrame = {
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (value, r)) => when(stratum === value, lit(r)).otherwise(acc)
    }
    df.filter(hashBucket(id).cast("double") < rate * BucketSpace)
  }

  /** Deterministic data-mix construction by TOKEN budget: within each
    * stratum, documents are ranked by their id hash (the same stable
    * order [[stratified]] samples from) and the greedy prefix whose
    * running token total stays within the stratum's budget is kept —
    * once the cumulative sum passes the budget, everything after it in
    * hash order is out. Like [[stratified]], no RNG: rerunning, changing
    * partitioning, or recomputing on another engine selects the same
    * documents, and a doubled budget strictly extends the selection.
    *
    * Cost: one shuffle + sort per query (the window over strata). At
    * extreme corpus scale the same semantics can run pre-bucketed on the
    * hash-ranked layout; the selection itself stays a prefix scan.
    *
    * @param tokens per-row token count column (pre-computed upstream)
    */
  def tokenBudgetMix(df: DataFrame, stratum: Column, id: Column,
                     tokens: Column, budgets: Map[String, Long],
                     defaultBudget: Long = 0L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(hashBucket(id), id)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val budget = budgets.toSeq.sortBy(_._1).foldLeft(lit(defaultBudget)) {
      case (acc, (value, b)) => when(stratum === value, lit(b)).otherwise(acc)
    }
    df.withColumn("__cum", sum(tokens).over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }
}
