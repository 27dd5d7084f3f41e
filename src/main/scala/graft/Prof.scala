package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual `SparkEntry.queries` with a warm-up run, or
  * dump a query's formatted physical plan.
  *
  * Usage: `runMain graft.Prof [--explain] [--sf DIR] name...`
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val explain = args.contains("--explain")
    val sfIdx = args.indexOf("--sf")
    val dir = if (sfIdx >= 0) args(sfIdx + 1) else "/root/testdata/sf0.1"
    val names = args.filterNot(_.startsWith("--")).filterNot(a => sfIdx >= 0 && a == dir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) {
        println(s"=== $name ===")
        fn(spark, dir).explain("formatted")
      } else {
        fn(spark, dir).count() // warm up JIT + file listing
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
      }
    }
    spark.stop()
  }
}
