package graft

import org.apache.spark.sql.SparkSession

/** Test-scope: write the `explain("formatted")` plan of one or more
  * driver queries to `plans/<tag>/<query>_<suffix>.txt` — the round's
  * plan-evidence artifacts. Usage:
  * `Test/runMain graft.PlanDump <tag> <suffix> <query>[,<query>...]`
  * Runs under the Bench session shape (shared stages ON) so the dumped
  * plan is the one the bench sweep executes. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tag = args.headOption.getOrElse("r14")
    val suffix = args.lift(1).getOrElse("before")
    val names = args.lift(2).map(_.split(",").map(_.trim).filter(_.nonEmpty))
      .getOrElse(Array("q168_dsir"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.TestdataQueries.enableSharedStages()
    val dir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(dir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(dir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote ${dir.resolve(s"${name}_$suffix.txt")}")
    }
    spark.stop()
  }
}
