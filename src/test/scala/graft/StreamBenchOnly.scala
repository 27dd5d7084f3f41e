package graft

import org.apache.spark.sql.SparkSession

/** Test-scope: run the recorded stream_bench methodology alone (the
  * Bench session shape + StreamBench.run verbatim) — for calm-window
  * throughput recordings without a full 10-minute query sweep. */
object StreamBenchOnly {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "4")
      .config("spark.ui.retainedJobs", "40")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    StreamBench.run(spark).foreach { r =>
      val dps = if (r.sec > 0) (r.docs / r.sec).toLong else 0L
      println(f"[streambench] ${r.sink} ${dps} docs/s (${r.sec}%.2f s)" +
        r.error.map(e => s" ERROR $e").getOrElse(""))
    }
    spark.stop()
  }
}
