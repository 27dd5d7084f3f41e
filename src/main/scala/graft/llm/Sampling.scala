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
}
