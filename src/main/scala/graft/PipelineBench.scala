package graft

import org.apache.spark.sql.SparkSession
import graft.etl.{Pipeline, Warehouse}
import java.nio.file.{Files, Paths}

/** Clinical-pipeline throughput bench: synthesize an N-row measurement CSV
  * (deterministic, mixed types incl. blood-pressure splits and rule
  * violations), run the full six-stage job, report rows/sec end-to-end.
  *
  * The reference processes jobs row-by-row in pandas + per-batch SQL
  * INSERTs; this gives the comparable single-node number for the Spark
  * lowering. Usage: `runMain graft.PipelineBench [nRows]`.
  */
object PipelineBench {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toInt).getOrElse(1000000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dataDir = Files.createTempDirectory("plbench-data")
    val csv = dataDir.resolve("big_study.csv")
    val types = Array("glucose", "cholesterol", "weight", "height", "heart_rate", "blood_pressure")
    val w = Files.newBufferedWriter(csv)
    w.write("study_id,participant_id,measurement_type,value,unit,timestamp,site_id,quality_score\n")
    var i = 0
    while (i < nRows) {
      val t = types(i % types.length)
      val value = t match {
        case "blood_pressure" =>
          if (i % 97 == 0) "999/80" else s"${100 + i % 80}/${60 + i % 60}" // some malformed
        case "glucose" => if (i % 101 == 0) "900" else s"${60 + i % 200}.${i % 10}" // some OOR
        case _ => s"${20 + i % 150}.${i % 100}"
      }
      val unit = if (i % 89 == 0) "" else "u"
      val q = i % 5 match { case 0 => ""; case 1 => "null"; case _ => s"0.${50 + i % 50}" }
      // time advances with i so observation keys are (mostly) unique and
      // the cross-job dedup doesn't mask throughput
      val sec = i % 60; val min = (i / 60) % 60; val hour = (i / 3600) % 24
      val day = 1 + (i / 86400) % 28
      w.write(s"STUDY${i % 20},P${i % 5000},$t,$value,$unit,2024-01-${f"$day%02d"}T${f"$hour%02d"}:${f"$min%02d"}:${f"$sec%02d"}Z,SITE_${i % 7},$q\n")
      i += 1
    }
    w.close()

    val wh = new Warehouse(spark, Files.createTempDirectory("plbench-wh").toString)
    val pipe = new Pipeline(spark, wh)
    val t0 = System.nanoTime()
    val res = pipe.processJob("bench-job", csv.toString)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"rows":$nRows,"status":"${res.status}","staged":${res.stagedRows},"processed":${res.processedRows},"sec":$sec%.2f,"rows_per_sec":${(nRows / sec).toLong}}""")
    spark.stop()
  }
}
