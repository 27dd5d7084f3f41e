package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Throwaway profiling harness for the streaming micro-batch frame (not
  * part of the bench contract): runs one sink over the StreamBench wave
  * shape with a job listener, prints each Spark job's duration and call
  * site so the per-batch fixed cost decomposes into named actions. */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("corpus_dedup")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobs.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (t0, site) =>
          done.add((je.jobId, System.nanoTime() - t0, site))
        }
      }
    })

    val execs = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, String)]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = {
        val head = qe.logical.toString.linesIterator.take(2).mkString(" | ").take(110)
        execs.add((funcName, durationNs, head))
      }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    })

    val nDocs = 10000L
    val waves = 3
    val seed = when(col("id") % 20 === 0 && col("id") > 0, col("id") - 1)
      .otherwise(col("id"))
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
        array_join(transform(sequence(lit(0), lit(49)),
          j => concat(lit("w"), pmod(xxhash64(seed, j), lit(9973)))), " ")
          .as("text"))
      .cache()
    docs.count()
    def landWave(landing: String, w: Int): Unit =
      docs.filter(col("doc_id") >= nDocs * w / waves &&
          col("doc_id") < nDocs * (w + 1) / waves)
        .coalesce(2).write.mode("append").json(landing)
    def tmp(p: String) = Files.createTempDirectory(s"streamprof-$p").toString

    if (which == "bench") {
      StreamBench.run(spark).foreach { r =>
        val dps = if (r.sec > 0) (r.docs / r.sec).toLong else 0L
        println(f"  ${r.sink}%-16s ${r.sec}%6.2f s  $dps docs/s  ${r.error.getOrElse("")}")
      }
      spark.stop()
      return
    }

    if (which == "micro") {
      import graft.llm.Dedup
      def t(label: String)(body: => Unit): Unit = {
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          body
          println(f"  $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      }
      val third = docs.filter(col("doc_id") < nDocs / 3).cache()
      third.count()
      t("minhashTable(3.3k).count") {
        Dedup.minhashTable(third, 32, 3).count()
      }
      val sigs = Dedup.minhashTable(third, 32, 3).cache()
      sigs.count()
      t("candidatesFromSigs(cached sigs).count") {
        Dedup.minhashCandidatesFromSigs(sigs, 32, 8, 0.5).count()
      }
      val store = Dedup.minhashTable(
        docs.filter(col("doc_id") >= nDocs / 3), 32, 3).cache()
      store.count()
      t("incrementalCandidates(store 6.6k, batch 3.3k).count") {
        Dedup.incrementalMinhashCandidatesFromSigs(store, sigs, 32, 8, 0.5).count()
      }
      // full per-batch chain, fresh plans over fresh files each round —
      // the streaming shape: json scan -> groupBy dedup -> minhash ->
      // incremental LSH vs a parquet store -> duplicateClusters probe
      val landing = tmp("micro-l")
      docs.filter(col("doc_id") < nDocs / 3).coalesce(2)
        .write.mode("overwrite").json(landing)
      val storeDir = tmp("micro-s")
      Dedup.minhashTable(docs.filter(col("doc_id") >= nDocs / 3), 32, 3)
        .coalesce(2).write.mode("overwrite").parquet(storeDir)
      val docSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType)))
      t("fullChain(fresh plans, json batch, parquet store)") {
        val b = spark.read.schema(docSchema).json(landing)
          .filter(col("doc_id").isNotNull && col("text").isNotNull)
          .groupBy(col("doc_id")).agg(min(col("text")).as("text"))
          .cache()
        val s = Dedup.minhashTable(b, 32, 3).cache()
        val edges = Dedup.incrementalMinhashCandidatesFromSigs(
          spark.read.parquet(storeDir), s, 32, 8, 0.5)
        Dedup.dedupCorpus(b, edges).count()
        s.unpersist(); b.unpersist()
      }
      spark.stop()
      return
    }

    val (whd, landing, ckpt) = (tmp("wh"), tmp("l"), tmp("c"))
    val wh = new graft.etl.Warehouse(spark, whd)
    val t0 = System.nanoTime()
    val waveT = Array.ofDim[Double](waves)
    which match {
      case "corpus_dedup" =>
        val sink = new graft.stream.StreamingCorpusDedup(spark, wh, landing, ckpt)
        (0 until waves).foreach { w =>
          val tw = System.nanoTime()
          landWave(landing, w)
          sink.start(availableNow = true).awaitTermination()
          waveT(w) = (System.nanoTime() - tw) / 1e9
        }
      case "split_router" =>
        val sink = new graft.stream.StreamingSplitRouter(spark, wh, landing, ckpt,
          cuts = Seq("train" -> 80, "validation" -> 90), lastSplit = "test")
        (0 until waves).foreach { w =>
          val tw = System.nanoTime()
          landWave(landing, w)
          sink.start(availableNow = true).awaitTermination()
          waveT(w) = (System.nanoTime() - tw) / 1e9
        }
      case "dsir_gate" =>
        import graft.llm.TextAnalysis
        val buckets = 512
        wh.replace("dsir_ratio", TextAnalysis.dsirRatioTable(
          TextAnalysis.dsirFeatures(docs.filter(col("doc_id") % 2 === 0),
            buckets),
          TextAnalysis.dsirFeatures(docs.filter(col("doc_id") % 2 === 1),
            buckets), buckets))
        val sink = new graft.stream.StreamingDsirGate(spark, wh, landing,
          ckpt, buckets = buckets, minWeight = 1000000000L)
        (0 until waves).foreach { w =>
          val tw = System.nanoTime()
          landWave(landing, w)
          sink.start(availableNow = true).awaitTermination()
          waveT(w) = (System.nanoTime() - tw) / 1e9
        }
    }
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"%n=== $which: total $total%.2f s, ${nDocs / total}%.0f docs/s; waves: ${waveT.map(t => f"$t%.2f").mkString(", ")}")
    import scala.jdk.CollectionConverters._
    val all = done.asScala.toSeq.sortBy(_._1)
    println(f"=== ${all.size} spark jobs, sum ${all.map(_._2).sum / 1e9}%.2f s")
    all.groupBy(_._3).toSeq.sortBy(-_._2.map(_._2).sum).foreach { case (site, js) =>
      println(f"  ${js.map(_._2).sum / 1e9}%7.2f s  n=${js.size}%3d  $site")
    }
    // unlabeled jobs individually (job id + seconds) so a fixed per-batch
    // mystery cost can be lined up against the execution list by time
    all.filter(_._3 == "?").foreach { case (id, ns, _) =>
      println(f"      ? job#$id%-5d ${ns / 1e9}%6.3f s")
    }
    val es = execs.asScala.toSeq
    println(f"=== ${es.size} query executions, sum ${es.map(_._2).sum / 1e9}%.2f s")
    es.groupBy(e => (e._1, e._3)).toSeq.sortBy(-_._2.map(_._2).sum)
      .foreach { case ((fn, head), js) =>
        println(f"  ${js.map(_._2).sum / 1e9}%7.2f s  n=${js.size}%3d  $fn  $head")
      }
    spark.stop()
  }
}
