package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Test-scope query profiling harness (the [[StreamProfile]] sibling):
  * `Test/runMain graft.QueryProfile <query> [runs]` runs one driver
  * query repeatedly under the Bench session shape (shared stages ON)
  * and prints per-run wall seconds with JOB and STAGE counts. A warm
  * run whose job count stays high tells a perf pass the residual cost
  * is scheduling overhead of the consumer's own exchanges — not store
  * rebuild, codegen, or JIT — which is the first fork in the road when
  * chasing a bench heavy. */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    @volatile var stages = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages += 1
    })
    // per-ACTION decomposition (the StreamProfile trick): funcName +
    // logical head + duration names the per-batch hog
    if (sys.env.get("SPARK_GRAFT_PROFILE_ACTIONS").contains("1"))
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = {
            val head = qe.logical.toString.linesIterator.take(1).mkString
              .take(100)
            println(f"[action] $funcName ${durationNs / 1e9}%.3f s  $head")
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              error: Exception): Unit = ()
        })
    graft.queries.TestdataQueries.enableSharedStages()
    // comma-separated names profile back-to-back in ONE session (saves
    // the 30 s sbt+session spin-up per target when sweeping a batch);
    // caches clear between queries, mirroring the bench's post-pair
    // hygiene so a later query never reads an earlier one's stores
    val names = args.headOption.getOrElse("q167_ccnet_buckets")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val runs = args.lift(1).map(_.toInt).getOrElse(4)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to runs).foreach { i =>
        val j0 = jobs; val s0 = stages
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)  // let listener events drain
        println(f"[profile] run$i $name ${dt}%.3f s " +
          s"jobs=${jobs - j0} stages=${stages - s0}")
      }
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
