package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, StandardCopyOption}

/** Streaming-frame throughput numbers for the round bench artifact.
  *
  * The per-query sweep never exercises `graft.stream` (by design — a
  * one-shot SQL oracle cannot express a multi-batch stream), so a
  * regression in the micro-batch frame (per-batch transaction cost,
  * replay-guard reads, signature-store joins, state-store merges) was
  * invisible in `BENCH_r{N}.json`. This runs each production sink over
  * a small synthesized corpus arriving in waves — the DedupBench
  * phase-4/8 shape, sized for the bench budget instead of the soak —
  * and reports docs/sec per sink so round-over-round drift is visible.
  *
  * Methodology, mirroring the query sweep's best-of-pair steady-state
  * philosophy: each sink first processes an UNTIMED 2-wave warm-up
  * corpus ([[WarmupDocs]] docs through a throwaway warehouse +
  * checkpoint, exercising both the store-absent and the incremental
  * store paths), so one-time JIT, Janino codegen, and Catalyst warm-up
  * — costs that amortize to zero in any long-running deployment — are
  * excluded; the timed region then prices the steady-state frame. Wave
  * files are SYNTHESIZED AND JSON-ENCODED untimed into staging
  * directories and delivered into the landing directory by file rename
  * inside the timed region: the number measures the sink, not the
  * harness's corpus generator.
  *
  * Numbers are recorded under `stream_bench` and deliberately EXCLUDED
  * from the gated `value` total: the gate prices the query surface
  * against the round-1 baseline, which never contained streaming time.
  *
  * Sinks measured (one warehouse + checkpoint each, waves of JSON-lines
  * files, `Trigger.AvailableNow` per wave so every wave restarts the
  * stream from its checkpoint — restart cost is part of the frame):
  * corpus near-dup dedup, split router, inverted index, count-min
  * sketch, the exact-sessionize sink (event rows, watermark-gated
  * state), and the funnel state operator (one pass, noop sink — its
  * cost is operator state, not a warehouse).
  */
object StreamBench {

  /** The wave shape, named so the bench artifact can record it: a docs/s
    * delta across rounds is only attributable when the shape provably
    * did not change underneath it. */
  val DefaultDocs: Long = 10000L
  val DefaultWaves: Int = 3
  val FilesPerWave: Int = 2
  /** Untimed steady-state warm-up corpus per sink (2 waves). */
  val WarmupDocs: Long = 200L

  final case class Result(sink: String, docs: Long, sec: Double,
                          error: Option[String])

  def run(spark: SparkSession, nDocs: Long = DefaultDocs,
          waves: Int = DefaultWaves): Seq[Result] = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    // deterministic corpus, the DedupBench synthesis: every 20th doc
    // copies its predecessor (planted near-dups keep the dedup sinks'
    // store joins honest), everyone else draws 50 hash-vocab tokens
    val seed = when(col("id") % 20 === 0 && col("id") > 0, col("id") - 1)
      .otherwise(col("id"))
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
        array_join(transform(sequence(lit(0), lit(49)),
          j => concat(lit("w"), pmod(xxhash64(seed, j), lit(9973)))), " ")
          .as("text"))
      .cache()
    docs.count() // synthesis excluded from every sink's timing

    def tmp(p: String) = Files.createTempDirectory(s"streambench-$p").toString

    /** Stage `n` docs as `nWaves` JSON wave directories — untimed. */
    def stageDocWaves(n: Long, nWaves: Int): Seq[String] =
      (0 until nWaves).map { w =>
        val d = tmp(s"stage$w")
        docs.filter(col("doc_id") >= n * w / nWaves &&
            col("doc_id") < n * (w + 1) / nWaves)
          .coalesce(FilesPerWave).write.mode("overwrite").json(d)
        d
      }

    /** Deliver a staged wave into the landing dir: rename the data files
      * (cheap, constant-time — the file source sees them as new). */
    def deliver(stage: String, landing: String): Unit = {
      val s = Files.list(Path.of(stage))
      try s.iterator().asScala.foreach { p =>
        val name = p.getFileName.toString
        if (Files.isRegularFile(p) && !name.startsWith("_") &&
            !name.startsWith("."))
          Files.move(p, Path.of(landing, name), StandardCopyOption.ATOMIC_MOVE)
      } finally s.close()
    }

    def errStr(e: Throwable): String =
      (e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage)).take(200)

    /** One warehouse sink: untimed warm-up run first, then the timed
      * waves. `mk(wh, landing, ckpt)` returns the run-one-wave action. */
    def warehouseSink(name: String)(
        mk: (graft.etl.Warehouse, String, String) => () => Unit): Result = {
      def wavesRun(n: Long, nWaves: Int): Double = {
        val (whd, landing, ckpt) = (tmp(s"$name-wh"), tmp(s"$name-l"), tmp(s"$name-c"))
        val stages = stageDocWaves(n, nWaves)
        val runWave = mk(new graft.etl.Warehouse(spark, whd), landing, ckpt)
        val t0 = System.nanoTime()
        stages.foreach { st => deliver(st, landing); runWave() }
        (System.nanoTime() - t0) / 1e9
      }
      // NonFatal only: an OOM/StackOverflow in one sink must propagate —
      // swallowing it would keep benching the remaining sinks in a
      // possibly-corrupted JVM and record misleading numbers for them
      try {
        wavesRun(WarmupDocs, 2)
        Result(name, nDocs, wavesRun(nDocs, waves), None)
      } catch {
        case scala.util.control.NonFatal(e) =>
          Result(name, nDocs, 0.0, Some(errStr(e)))
      }
    }

    val results = Seq.newBuilder[Result]

    results += warehouseSink("corpus_dedup") { (wh, landing, ckpt) =>
      val sink = new graft.stream.StreamingCorpusDedup(spark, wh, landing, ckpt)
      () => sink.start(availableNow = true).awaitTermination()
    }

    results += warehouseSink("split_router") { (wh, landing, ckpt) =>
      val sink = new graft.stream.StreamingSplitRouter(spark, wh, landing, ckpt,
        cuts = Seq("train" -> 80, "validation" -> 90), lastSplit = "test")
      () => sink.start(availableNow = true).awaitTermination()
    }

    results += warehouseSink("inverted_index") { (wh, landing, ckpt) =>
      val sink = new graft.stream.StreamingIndex(spark, wh, landing, ckpt)
      () => sink.start(availableNow = true).awaitTermination()
    }

    results += warehouseSink("cm_sketch") { (wh, landing, ckpt) =>
      val sink = new graft.stream.StreamingSketch(spark, wh, landing, ckpt)
      () => sink.start(availableNow = true).awaitTermination()
    }

    results += warehouseSink("hll_sink") { (wh, landing, ckpt) =>
      val sink = new graft.stream.StreamingHllSink(spark, wh, landing, ckpt)
      () => sink.start(availableNow = true).awaitTermination()
    }

    results += warehouseSink("dsir_gate") { (wh, landing, ckpt) =>
      // trained state lands untimed (setup, like the warehouse creation
      // itself): even docs train the target model, odd docs the raw one;
      // the neutral 1e9 threshold splits a same-distribution corpus
      // roughly in half, so both routed appends run every batch
      import graft.llm.TextAnalysis
      val buckets = 512
      wh.replace("dsir_ratio", TextAnalysis.dsirRatioTable(
        TextAnalysis.dsirFeatures(docs.filter(col("doc_id") % 2 === 0),
          buckets),
        TextAnalysis.dsirFeatures(docs.filter(col("doc_id") % 2 === 1),
          buckets), buckets))
      val sink = new graft.stream.StreamingDsirGate(spark, wh, landing,
        ckpt, buckets = buckets, minWeight = 1000000000L)
      () => sink.start(availableNow = true).awaitTermination()
    }

    results += warehouseSink("nb_gate") { (wh, landing, ckpt) =>
      // trained state lands untimed: even docs are the "seed" class, odd
      // the negative — a same-distribution corpus scores around the
      // neutral 1e9 point, so both routed appends run every batch
      import graft.llm.TextAnalysis
      wh.replace("nb_counts", TextAnalysis.nbCountTable(
        docs.withColumn("__pos", col("doc_id") % 2 === 0), col("__pos")))
      val sink = new graft.stream.StreamingNbGate(spark, wh, landing,
        ckpt, minScore = 1000000000L)
      () => sink.start(availableNow = true).awaitTermination()
    }

    results += {
      // exact-sessionize sink: event rows (user_id, ts) instead of docs —
      // one event per doc id, a burst per user of 5 with a closing wave
      // far in the future so most sessions finalize inside the run
      def stageSessionWaves(n: Long, nWaves: Int): Seq[String] =
        (0 until nWaves).map { w =>
          val d = tmp(s"sess-stage$w")
          spark.range(n * w / nWaves, n * (w + 1) / nWaves).select(
              expr("id div 5").as("user_id"),
              (to_timestamp(lit("2024-01-01 00:00:00")) +
                expr("make_interval(0, 0, 0, 0, 0, 0, id * 7)")).as("ts"))
            .coalesce(FilesPerWave).write.mode("overwrite").json(d)
          d
        }
      def sessRun(n: Long, nWaves: Int): Double = {
        val (whd, landing, ckpt) =
          (tmp("sess-wh"), tmp("sess-l"), tmp("sess-c"))
        val stages = stageSessionWaves(n, nWaves)
        val sink = new graft.stream.StreamingSessionize(spark,
          new graft.etl.Warehouse(spark, whd), landing, ckpt,
          gapMillis = 60000L)
        val t0 = System.nanoTime()
        stages.foreach { st =>
          deliver(st, landing)
          sink.start(availableNow = true).awaitTermination()
        }
        (System.nanoTime() - t0) / 1e9
      }
      try {
        sessRun(WarmupDocs, 2)
        Result("sessionize", nDocs, sessRun(nDocs, waves), None)
      } catch {
        case scala.util.control.NonFatal(e) =>
          Result("sessionize", nDocs, 0.0, Some(errStr(e)))
      }
    }

    results += {
      import graft.stream.StreamingFunnel
      // one funnel event per doc-step: nDocs/3 users x signup/click/buy
      // (user u owns events 3u..3u+2 in ts order — integer div/mod, not
      // `/`, which is DOUBLE division and walks off the steps array)
      val steps = Seq("signup", "click", "purchase")
      def stageEvents(n: Long): String = {
        val d = tmp("funnel-stage")
        spark.range(n).select(
            expr("id div 3").as("user_id"),
            (to_timestamp(lit("2024-01-01 00:00:00")) +
              expr("make_interval(0, 0, 0, 0, 0, 0, id)")).as("ts"),
            col("id").as("event_id"),
            element_at(typedLit(steps),
              expr("CAST(id % 3 AS INT)") + 1).as("event_type"))
          .coalesce(FilesPerWave).write.mode("overwrite").json(d)
        d
      }
      def funnelRun(n: Long): Double = {
        val (landing, ckpt) = (tmp("funnel-l"), tmp("funnel-c"))
        val stage = stageEvents(n)
        val events = spark.readStream
          .schema("user_id LONG, ts TIMESTAMP, event_id LONG, event_type STRING")
          .json(landing).as[StreamingFunnel.FEvent]
        val t0 = System.nanoTime()
        deliver(stage, landing)
        StreamingFunnel.completions(spark, events, steps,
            maxGapMicros = 3600L * 1000000L * 24 * 365)
          .writeStream.outputMode("append").format("noop")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        funnelRun(WarmupDocs)
        Result("funnel", nDocs, funnelRun(nDocs), None)
      } catch {
        case scala.util.control.NonFatal(e) =>
          Result("funnel", nDocs, 0.0, Some(errStr(e)))
      }
    }

    docs.unpersist()
    results.result()
  }
}
