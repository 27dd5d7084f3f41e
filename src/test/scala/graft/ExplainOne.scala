package graft

import org.apache.spark.sql.SparkSession

/** Test-scope: print the POST-EXECUTION adaptive physical plan of one
  * driver query (isFinalPlan=true — shows reused stages, runtime join
  * strategies). */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.TestdataQueries.enableSharedStages()
    val name = args.headOption.getOrElse("q194_kneser_ney")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()  // execute THIS plan so AQE finalizes it
    println(df.queryExecution.executedPlan.toString.take(24000))
    spark.stop()
  }
}
