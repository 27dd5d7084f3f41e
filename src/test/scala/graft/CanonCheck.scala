package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

object CanonCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.TestdataQueries.enableSharedStages()
    val df = SparkEntry.queries("q194_kneser_ney")(spark, sfDir)
    val plan = df.queryExecution.executedPlan
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    println(s"[canon] ${exchanges.size} shuffle exchanges")
    val canon = exchanges.map(_.canonicalized)
    for (i <- canon.indices; j <- canon.indices if i < j) {
      if (canon(i) == canon(j))
        println(s"[canon] exchange $i == exchange $j")
    }
    // print the canonical forms of the (w1,w2) exchanges to diff
    Seq(2, 4).foreach { i =>
      println(s"[canon] ===== exchange $i canonical =====")
      exchanges(i).canonicalized.toString.split("\n").foreach(l => println("[canon] " + l))
    }
    spark.stop()
  }
}
