package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** Test-scope: per-stage wall/rows readout for one driver query. */
object StageTimes {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.TestdataQueries.enableSharedStages()
    val name = args.headOption.getOrElse("q194_kneser_ney")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count()  // warm
    fn(spark, sfDir).count()
    val stages = ArrayBuffer.empty[(Int, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        stages += ((i.stageId,
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
          i.taskMetrics.inputMetrics.recordsRead,
          i.taskMetrics.shuffleWriteMetrics.recordsWritten))
      }
    })
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[stages] total ${dt}%.3f s")
    stages.foreach { case (id, ms, in, sw) =>
      println(s"[stages] stage=$id wall=${ms}ms inputRows=$in shuffleWriteRows=$sw")
    }
    spark.stop()
  }
}
