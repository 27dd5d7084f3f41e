package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator inventory (SURVEY §2 + LLM-pipeline extensions) lives in
  * [[graft.queries.TestdataQueries]]; DuckDB oracles in
  * [[graft.queries.Oracles]]. The clinical engine itself is under
  * `graft.etl` / `graft.query` / `graft.stream` and is exercised by the
  * ScalaTest suite against reference-shaped CSV fixtures.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Fact-dim-dim broadcast join chain: revenue per region/nation. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.TestdataQueries.q12JoinRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.TestdataQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose hashing/recall has no
    * SQL analogue (driver records a weaker rows-only check). */
  def oracleSql: Map[String, String] = graft.queries.Oracles.all
}
