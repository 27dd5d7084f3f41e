package graft.stream

import graft.{Fixtures, SparkSpec}
import graft.etl.Warehouse
import graft.schema.Schemas
import org.apache.spark.sql.functions._

/** Streaming pipeline: same warehouse semantics as batch, driven through
  * a real file-source stream + foreachBatch. */
class StreamingPipelineSpec extends SparkSpec {

  test("files landing in the directory flow through all sinks; late file merges") {
    val landing = tmpDir("landing")
    val wh = new Warehouse(spark, tmpDir("whs").toString)
    val sp = new StreamingPipeline(spark, wh, landing.toString,
      tmpDir("ckpt").toString)

    writeCsv(landing, "study001.csv", Fixtures.study001)
    writeCsv(landing, "study002.csv", Fixtures.study002)
    sp.start(availableNow = true).awaitTermination()

    assert(wh.read("staging_clinical_measurements", Schemas.staging).count() == 10)
    assert(wh.read("processed_measurements", Schemas.processed).count() == 12) // 6 + 6 (BP splits)
    assert(wh.read("studies", Schemas.studies).count() == 2)
    val jobs = wh.read("etl_jobs", Schemas.etlJobs)
    assert(jobs.filter(col("status") === "completed").count() == 2)

    // a later file for the same study merges: cnt/avg replaced, min/max merged
    val more =
      s"""${Fixtures.header}
         |STUDY001,P001,glucose,80.0,mg/dL,2024-01-17T09:30:00Z,SITE_A,0.9
         |""".stripMargin
    writeCsv(landing, "study001_day2.csv", more)
    sp.start(availableNow = true).awaitTermination()

    val agg = wh.read("measurement_aggregations", Schemas.aggregations)
      .filter(col("participant_id") === "P001" && col("measurement_type") === "glucose")
      .head()
    assert(agg.getAs[Long]("cnt") == 1) // replaced by the day-2 job
    assert(agg.getAs[java.math.BigDecimal]("min_num").doubleValue() == 80.0)  // merged
    assert(agg.getAs[java.math.BigDecimal]("max_num").doubleValue() == 101.2) // merged

    // re-dropping an identical file is a no-op in processed (same job id,
    // same observation keys)
    val processedBefore = wh.read("processed_measurements", Schemas.processed).count()
    writeCsv(landing, "study002_copy.csv", Fixtures.study002)
    sp.start(availableNow = true).awaitTermination()
    assert(wh.read("processed_measurements", Schemas.processed).count() == processedBefore)
  }

  test("streaming corpus dedup maintains the corpus incrementally across micro-batches") {
    import graft.llm.Dedup
    import org.apache.spark.sql.types._
    import spark.implicits._
    val landing = tmpDir("docs-landing")
    val wh = new Warehouse(spark, tmpDir("whdocs").toString)
    val sd = new StreamingCorpusDedup(spark, wh, landing.toString,
      tmpDir("ckptdocs").toString, numHashes = 32, bands = 8, k = 3,
      threshold = 0.3)
    // groups of 3 near-identical docs with group-private vocabulary;
    // group 6 (ids 18-20) spans the two micro-batches, so cross-batch
    // duplicates must flow through the signature store
    def text(i: Int): String = {
      val g = i / 3
      val base = (0 until 14).map(j => s"tok${g}x$j").mkString(" ")
      if (i % 3 == 2) s"$base tail$g edited" else s"$base tail$g common"
    }
    def jsonl(ids: Range): String =
      ids.map(i => s"""{"doc_id": $i, "text": "${text(i)}"}""").mkString("\n")

    writeCsv(landing, "day1.json", jsonl(0 until 20))
    sd.start(availableNow = true).awaitTermination()
    // corrupt lines ride along with day 2: they parse to null rows and
    // must be skipped without failing the batch or entering the store
    writeCsv(landing, "day2.json",
      jsonl(20 until 40) + "\nnot json at all\n{\"doc_id\": 999}")
    sd.start(availableNow = true).awaitTermination()

    val corpusSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val sigSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("sig", ArrayType(LongType, containsNull = false))))
    val maintained = wh.read("corpus", corpusSchema)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = (0 until 40).map(i => (i.toLong, text(i))).toDF("doc_id", "text")
    val oneShot = Dedup.dedupCorpus(all,
        Dedup.minhashCandidates(all, numHashes = 32, bands = 8, k = 3,
          threshold = 0.3))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(maintained == oneShot)
    assert(maintained.size < 40)                               // dupes dropped
    assert(wh.read("sig_store", sigSchema).count() == 40)      // all sigs kept
  }

  test("streaming corpus dedup absorbs micro-batch replays (at-least-once sink)") {
    import graft.llm.Dedup
    import org.apache.spark.sql.types._
    import spark.implicits._
    val wh = new Warehouse(spark, tmpDir("whreplay").toString)
    val ckpt = tmpDir("ckpt-replay").toString
    val sd = new StreamingCorpusDedup(spark, wh, tmpDir("landing-replay").toString,
      ckpt, numHashes = 32, bands = 8, k = 3, threshold = 0.3)
    def text(i: Int): String = {
      val g = i / 3
      val base = (0 until 14).map(j => s"rtok${g}x$j").mkString(" ")
      if (i % 3 == 2) s"$base rtail$g edited" else s"$base rtail$g common"
    }
    def batch(ids: Range) =
      ids.map(i => (i.toLong, text(i))).toDF("doc_id", "text")
    val corpusSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val sigSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("sig", ArrayType(LongType, containsNull = false))))
    val commitSchema = StructType(Seq(
      StructField("stream_id", StringType), StructField("batch_id", LongType)))
    def corpusIds = wh.read("corpus", corpusSchema)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

    sd.processBatch(batch(0 until 20), 0L)
    sd.processBatch(batch(20 until 40), 1L)
    val committedCorpus = corpusIds
    assert(wh.read("sig_store", sigSchema).count() == 40)

    // whole-batch replay (crash AFTER the commit record): fast no-op via
    // the (stream id, batch id) committed-batch check
    sd.processBatch(batch(20 until 40), 1L)
    assert(corpusIds == committedCorpus)
    assert(wh.read("sig_store", sigSchema).count() == 40)

    // crash BETWEEN the two sink appends: corpus landed, signatures and
    // commit record did not. The replay must heal the store WITHOUT
    // double-landing the corpus.
    wh.replace("sig_store",
      wh.read("sig_store", sigSchema).filter(col("doc_id") < 20))
    wh.replace("_stream_commits",
      wh.read("_stream_commits", commitSchema).filter(col("batch_id") =!= 1L))
    sd.processBatch(batch(20 until 40), 1L)
    assert(corpusIds == committedCorpus)
    assert(wh.read("sig_store", sigSchema).count() == 40)

    // crash just BEFORE the commit record: both sinks landed. Replay must
    // be a full no-op through the appendIfAbsent anti-joins alone.
    wh.replace("_stream_commits",
      wh.read("_stream_commits", commitSchema).filter(col("batch_id") =!= 1L))
    sd.processBatch(batch(20 until 40), 1L)
    assert(corpusIds == committedCorpus)
    assert(wh.read("sig_store", sigSchema).count() == 40)

    // the commit record is a high-water mark: one tiny row per stream,
    // not one per batch
    assert(wh.read("_stream_commits", commitSchema).count() == 1)

    // after all the replays the maintained corpus still equals a one-shot
    // dedup of everything
    val all = batch(0 until 40)
    val oneShot = Dedup.dedupCorpus(all,
        Dedup.minhashCandidates(all, numHashes = 32, bands = 8, k = 3,
          threshold = 0.3))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(corpusIds == oneShot)
  }

  test("a contract-violating file fails its own job without killing the stream") {
    val landing = tmpDir("landing2")
    val wh = new Warehouse(spark, tmpDir("whs2").toString)
    val sp = new StreamingPipeline(spark, wh, landing.toString,
      tmpDir("ckpt2").toString)
    writeCsv(landing, "bad.csv", Fixtures.blankStudy)
    writeCsv(landing, "good.csv", Fixtures.study001)
    sp.start(availableNow = true).awaitTermination()

    val jobs = wh.read("etl_jobs", Schemas.etlJobs).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("status")).toMap
    assert(jobs("stream-bad.csv") == "failed")
    assert(jobs("stream-good.csv") == "completed")
    assert(wh.read("processed_measurements", Schemas.processed).count() == 6)
  }

  test("stateful sessionization closes sessions on inactivity gaps (flatMapGroupsWithState)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import Sessionize._

    val mem = MemoryStream[Event]
    val q = Sessionize.sessions(spark, mem.toDS(), gapMillis = 60000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions").start()

    def ev(u: Long, s: String) = Event(u, java.sql.Timestamp.valueOf(s))
    // user 1: two bursts 10 minutes apart -> two sessions
    mem.addData(
      ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:00:30"),
      ev(1, "2024-01-01 10:10:00"), ev(1, "2024-01-01 10:10:20"))
    q.processAllAvailable()
    // advance watermark far enough to time out the open session
    mem.addData(ev(2, "2024-01-01 11:00:00"))
    q.processAllAvailable()
    mem.addData(ev(2, "2024-01-01 12:00:00"))
    q.processAllAvailable()

    val out = spark.table("sessions").as[Session].collect()
      .filter(_.user_id == 1L).sortBy(_.session_start.getTime)
    assert(out.length == 2)
    assert(out(0).n_events == 2 &&
      out(0).session_end.toString.startsWith("2024-01-01 10:00:30"))
    assert(out(1).n_events == 2 &&
      out(1).session_start.toString.startsWith("2024-01-01 10:10:00"))
    q.stop()
  }

  test("sessionize: a late event cluster older than the open session's " +
    "gap stays a separate session (interval merge, not blind absorb)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import Sessionize._

    val mem = MemoryStream[Event]
    val q = Sessionize.sessions(spark, mem.toDS(), gapMillis = 60000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("late_sessions").start()
    def ev(u: Long, s: String) = Event(u, java.sql.Timestamp.valueOf(s))
    mem.addData(ev(1, "2024-01-01 12:00:00"))
    q.processAllAvailable()
    // a very late event, a full hour before the open session: whether
    // the watermark admits it or drops it, the one FORBIDDEN outcome is
    // a single merged session spanning the hour of silence
    mem.addData(ev(1, "2024-01-01 11:00:00"))
    q.processAllAvailable()
    // flush via timeout
    mem.addData(ev(2, "2024-01-01 14:00:00"))
    q.processAllAvailable()
    mem.addData(ev(2, "2024-01-01 15:00:00"))
    q.processAllAvailable()
    val out = spark.table("late_sessions").as[Session].collect()
      .filter(_.user_id == 1L)
    assert(out.nonEmpty)
    assert(!out.exists(s =>
      s.session_end.getTime - s.session_start.getTime > 60000L),
      s"a session glued across the gap: ${out.mkString(", ")}")
    q.stop()
  }

  test("sessionsExact: a cross-batch late event landing inside a " +
    "previously-open session still yields the batch sessionization") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import Sessionize._

    val mem = MemoryStream[Event]
    val q = Sessionize.sessionsExact(spark, mem.toDS(), gapMillis = 60000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("exact_sessions").start()
    def ev(u: Long, s: String) = Event(u, java.sql.Timestamp.valueOf(s))
    def ms(s: String) = java.sql.Timestamp.valueOf(s).getTime

    // batch 1: two bursts 90 s apart (gap 60 s) — the EAGER mode would
    // emit [10:00:00] closed right here; exact mode must hold it (the
    // watermark, 10:00:30, is still below its 10:01:00 deadline)
    mem.addData(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:01:30"))
    q.processAllAvailable()
    assert(spark.table("exact_sessions").isEmpty,
      "nothing is provably final yet — emission must wait for the watermark")
    // batch 2: the cross-batch late event at 10:00:45 (above the
    // 10:00:30 watermark, so admitted) bridges BOTH carried intervals
    // into one session — the exact case eager emission gets wrong by
    // design (it already published [10:00:00] as closed)
    mem.addData(ev(1, "2024-01-01 10:00:45"))
    q.processAllAvailable()
    // advance the watermark past the merged session's deadline, then
    // once more so the event-time timeout fires and flushes it
    mem.addData(ev(2, "2024-01-01 11:00:00"))
    q.processAllAvailable()
    mem.addData(ev(2, "2024-01-01 12:00:00"))
    q.processAllAvailable()

    val out = spark.table("exact_sessions").as[Session].collect()
      .filter(_.user_id == 1L)
    // the batch law over everything admitted: ONE session spanning all
    // three events (mergeIntervals IS the one-shot law, property-pinned
    // by SessionizePropSpec)
    val expected = Sessionize.mergeIntervals(Seq.empty,
      Seq(ms("2024-01-01 10:00:00"), ms("2024-01-01 10:01:30"),
        ms("2024-01-01 10:00:45")), 60000L)
    assert(out.length == expected.length && out.length == 1)
    assert(out(0).session_start.getTime == expected(0).start &&
      out(0).session_end.getTime == expected(0).lastSeen &&
      out(0).n_events == expected(0).nEvents,
      s"streamed ${out.toList} != batch $expected")
    q.stop()
  }

  test("sessionsExact: pending state survives a checkpoint RESTART — " +
    "file-source waves, the production shape") {
    import spark.implicits._
    import Sessionize._
    val landing = tmpDir("exsessland")
    val ckpt = tmpDir("exsessckpt").toString
    val outDir = tmpDir("exsessout").toString
    def ev(u: Long, s: String) = (u, java.sql.Timestamp.valueOf(s))
    var n = 0
    def wave(events: (Long, java.sql.Timestamp)*): Unit = {
      events.toSeq.toDF("user_id", "ts").coalesce(1)
        .write.mode("append").json(landing.toString + s"/w$n")
      n += 1
      val src = spark.readStream.schema("user_id LONG, ts TIMESTAMP")
        .json(landing.toString + "/*").as[Event]
      Sessionize.sessionsExact(spark, src, gapMillis = 60000L)
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    // the bridging scenario, but each wave is a FULL stream restart:
    // the kept-session list must round-trip the state store
    wave(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:01:30"))
    wave(ev(1, "2024-01-01 10:00:45"))
    wave(ev(2, "2024-01-01 11:00:00"))
    wave(ev(2, "2024-01-01 12:00:00"))
    val out = spark.read.schema(
        "user_id LONG, session_start TIMESTAMP, session_end TIMESTAMP, " +
          "n_events LONG")
      .parquet(outDir).as[Session].collect().filter(_.user_id == 1L)
    assert(out.length == 1, out.toList)
    assert(out(0).session_start.toString.startsWith("2024-01-01 10:00:00") &&
      out(0).session_end.toString.startsWith("2024-01-01 10:01:30") &&
      out(0).n_events == 3L, out.toList)
  }

  test("sessionsExact: a sub-watermark event is dropped, never merged " +
    "into an already-emitted session (the finality proof's premise)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import Sessionize._

    val mem = MemoryStream[Event]
    val q = Sessionize.sessionsExact(spark, mem.toDS(), gapMillis = 60000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("exact_sessions3").start()
    def ev(u: Long, s: String) = Event(u, java.sql.Timestamp.valueOf(s))
    mem.addData(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:01:30"))
    q.processAllAvailable()
    // push the watermark far past both sessions and fire the timeout
    mem.addData(ev(2, "2024-01-01 11:00:00"))
    q.processAllAvailable()
    mem.addData(ev(2, "2024-01-01 12:00:00"))
    q.processAllAvailable()
    val emitted = spark.table("exact_sessions3").as[Session].collect()
      .filter(_.user_id == 1L)
    assert(emitted.length == 2, emitted.toList)
    // an event far below the watermark, inside emitted session 1's gap:
    // emitted rows are FINAL, so Spark must drop it (flatMapGroups-
    // WithState filters sub-watermark rows) — admitting it would start
    // an overlapping third session and break exact == batch-of-admitted
    mem.addData(ev(1, "2024-01-01 10:00:20"))
    q.processAllAvailable()
    mem.addData(ev(2, "2024-01-01 14:00:00"))
    q.processAllAvailable()
    mem.addData(ev(2, "2024-01-01 15:00:00"))
    q.processAllAvailable()
    val after = spark.table("exact_sessions3").as[Session].collect()
      .filter(_.user_id == 1L)
    assert(after.length == 2,
      s"a sub-watermark event was admitted: ${after.toList}")
    q.stop()
  }

  test("sessionsExact: distinct sessions emit separately and event-time " +
    "timeouts flush state without batch data for the user") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import Sessionize._

    val mem = MemoryStream[Event]
    val q = Sessionize.sessionsExact(spark, mem.toDS(), gapMillis = 60000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("exact_sessions2").start()
    def ev(u: Long, s: String) = Event(u, java.sql.Timestamp.valueOf(s))
    // two bursts 10 min apart, one batch — the eager shape, but gated
    mem.addData(
      ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:00:30"),
      ev(1, "2024-01-01 10:10:00"), ev(1, "2024-01-01 10:10:20"))
    q.processAllAvailable()
    mem.addData(ev(2, "2024-01-01 11:00:00"))
    q.processAllAvailable()
    mem.addData(ev(2, "2024-01-01 12:00:00"))
    q.processAllAvailable()
    val out = spark.table("exact_sessions2").as[Session].collect()
      .filter(_.user_id == 1L).sortBy(_.session_start.getTime)
    assert(out.length == 2, out.toList)
    assert(out(0).n_events == 2 &&
      out(0).session_end.toString.startsWith("2024-01-01 10:00:30"))
    assert(out(1).n_events == 2 &&
      out(1).session_start.toString.startsWith("2024-01-01 10:10:00"))
    q.stop()
  }

  test("effectivelyOnce's AQE re-enable reaches ONLY sink-internal batch " +
    "queries — the stateful streaming plan itself stays AQE-free") {
    import spark.implicits._
    import Sessionize._
    // The frame sets spark.sql.adaptive.enabled=true on the micro-batch
    // engine's cloned session (see StreamCommits.effectivelyOnce): the
    // derived batch queries inside a sink need AQE's post-shuffle
    // coalescing, but AQE inside the STREAMING plan would re-plan the
    // exchanges stateful operators pin to the state-store partitioning.
    // This pins the split empirically so a Spark upgrade that starts
    // honoring the conf in IncrementalExecution fails HERE, not as
    // silent state corruption in production sinks.
    val landing = tmpDir("aqeland").toString
    val ckpt = tmpDir("aqeckpt").toString
    @volatile var derivedPlanHead: String = ""
    def wave(events: (Long, String)*): org.apache.spark.sql.streaming.StreamingQuery = {
      events.toSeq.map { case (u, s) => (u, java.sql.Timestamp.valueOf(s)) }
        .toDF("user_id", "ts").coalesce(1).write.mode("append").json(landing)
      val src = spark.readStream.schema("user_id LONG, ts TIMESTAMP")
        .json(landing).as[Event]
      val q = Sessionize.sessionsExact(spark, src, gapMillis = 60000L)
        .toDF().writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.sparkSession.conf.set("spark.sql.adaptive.enabled", "true")
          derivedPlanHead = b.groupBy("user_id").count()
            .queryExecution.executedPlan.toString.linesIterator
            .take(1).mkString
          // the batch must EXECUTE: a foreachBatch that runs no action
          // never loads/commits the stateful operator's state stores,
          // which Spark 4.1's commit validation rejects
          b.count()
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q
    }
    wave(1L -> "2024-01-01 10:00:00")
    // second run replans the stateful incremental plan AFTER the conf
    // flip — the case that would corrupt state if AQE leaked in
    val q2 = wave(1L -> "2024-01-01 10:00:30", 2L -> "2024-01-01 11:00:00")
    val streamingPlan = q2.asInstanceOf[
        org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan.toString
    assert(!streamingPlan.contains("AdaptiveSparkPlan"),
      s"AQE leaked into the stateful streaming plan:\n$streamingPlan")
    assert(streamingPlan.contains("REQUIRED_BY_STATEFUL_OPERATOR"),
      "expected the state-store-pinned exchange in the streaming plan")
    assert(derivedPlanHead.contains("AdaptiveSparkPlan"),
      s"sink-internal batch query did NOT get AQE: $derivedPlanHead")
  }

  test("streaming sessionize SINK: the warehouse table equals the batch " +
    "law across waves; whole-batch replays and row redeliveries no-op") {
    import spark.implicits._
    val landing = tmpDir("sesssinkland").toString
    val ckpt = tmpDir("sesssinkckpt").toString
    val wh = new graft.etl.Warehouse(spark, tmpDir("whsesssink").toString)
    val sink = new StreamingSessionize(spark, wh, landing, ckpt,
      gapMillis = 60000L)
    def wave(events: (Long, String)*): Unit = {
      events.toSeq.map { case (u, s) => (u, java.sql.Timestamp.valueOf(s)) }
        .toDF("user_id", "ts").coalesce(1)
        .write.mode("append").json(landing)
      sink.start(availableNow = true).awaitTermination()
    }
    // u1's session arrives out of order ACROSS waves (the bridging late
    // event) — exactly the case the eager `sessions` mode cannot give
    // batch parity on; the exact sink must land ONE merged session
    wave(1L -> "2024-01-01 10:00:00", 1L -> "2024-01-01 10:01:30")
    wave(1L -> "2024-01-01 10:00:45")
    wave(2L -> "2024-01-01 11:00:00")  // watermark passes u1's deadline
    wave(2L -> "2024-01-01 12:00:00")  // u1 flushed; watermark past u2#1
    wave(3L -> "2024-01-01 13:00:00")  // u2's first session flushed
    def rows() = wh.read("sessions", sink.sessionSchema).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.take(19),
        r.getTimestamp(2).toString.take(19), r.getLong(3))).toSet
    // the batch law over everything admitted and provably final:
    // u1's three events merge to one session (mergeIntervals IS the
    // one-shot law, property-pinned by SessionizePropSpec); both of
    // u2's bursts are their own closed sessions (wave 5's watermark,
    // 12:59, passes the 12:01 deadline and AvailableNow runs a final
    // timeout batch after the advance); u3's 13:00 is still pending
    // (not past the watermark) and must NOT be in the table — final
    // rows only
    val expected = Set(
      (1L, "2024-01-01 10:00:00", "2024-01-01 10:01:30", 3L),
      (2L, "2024-01-01 11:00:00", "2024-01-01 11:00:00", 1L),
      (2L, "2024-01-01 12:00:00", "2024-01-01 12:00:00", 1L))
    assert(rows() == expected, rows())
    val dup = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 10:01:30"), 3L))
      .toDF("user_id", "session_start", "session_end", "n_events")
    // whole-batch replay: an already-committed batch id no-ops on the
    // high-water record
    sink.processBatch(dup, batchId = 0L)
    assert(rows() == expected, "replayed batch must no-op")
    // row redelivery under a NEW batch id: the keyed append heals it
    sink.processBatch(dup, batchId = 999L)
    assert(rows() == expected, "redelivered session row must not duplicate")
  }

  test("streaming funnel equals the batch funnel's completions across waves") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingFunnel._

    val mem = MemoryStream[FEvent]
    val steps = Seq("signup", "click", "purchase")
    val gap = 3600L * 1000000 // 1 h in micros
    val q = StreamingFunnel.completions(spark, mem.toDS(), steps, gap)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_stream").start()

    def ev(id: Long, u: Long, s: String, t: String) =
      FEvent(u, java.sql.Timestamp.valueOf(s"2024-01-01 $t"), id, s)
    // wave 1: u1 signup+click; u2 signup; u3 full chain in ONE batch;
    //         u4 purchase-first noise
    mem.addData(
      ev(1, 1, "signup", "10:00:00"), ev(2, 1, "click", "10:05:00"),
      ev(3, 2, "signup", "10:00:00"),
      ev(4, 3, "signup", "09:00:00"), ev(5, 3, "click", "09:10:00"),
      ev(6, 3, "purchase", "09:20:00"),
      ev(7, 4, "purchase", "08:00:00"))
    q.processAllAvailable()
    // wave 2: u1 completes; u2's click arrives OUTSIDE the gap (chain
    //         stays broken); u4 signup after its noise
    mem.addData(
      ev(8, 1, "purchase", "10:30:00"),
      ev(9, 2, "click", "12:30:00"),
      ev(10, 4, "signup", "08:30:00"))
    q.processAllAvailable()
    // wave 3: replay of u3's whole chain (at-least-once source) must
    //         NOT re-emit; u4 completes
    mem.addData(
      ev(4, 3, "signup", "09:00:00"), ev(5, 3, "click", "09:10:00"),
      ev(6, 3, "purchase", "09:20:00"),
      ev(11, 4, "click", "08:45:00"), ev(12, 4, "purchase", "09:15:00"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("funnel_stream").as[Completion].collect()
    // exactly one completion row per completing user — the replayed
    // chain must not re-emit (the Map below would mask a duplicate)
    assert(rows.length == 3, rows.mkString(", "))
    val streamed = rows.map(c => c.user_id -> c.step_times.toSeq).toMap
    // batch reference over the SAME events (replays deduped by the
    // batch distinct-id semantics: same event_id, same payload)
    val all = Seq(
      (1L, 1L, "10:00:00", "signup"), (2L, 1L, "10:05:00", "click"),
      (3L, 2L, "10:00:00", "signup"), (4L, 3L, "09:00:00", "signup"),
      (5L, 3L, "09:10:00", "click"), (6L, 3L, "09:20:00", "purchase"),
      (7L, 4L, "08:00:00", "purchase"), (8L, 1L, "10:30:00", "purchase"),
      (9L, 2L, "12:30:00", "click"), (10L, 4L, "08:30:00", "signup"),
      (11L, 4L, "08:45:00", "click"), (12L, 4L, "09:15:00", "purchase"))
    val batchDf = all.toDF("event_id", "user_id", "t", "event_type")
      .select(col("event_id"), col("user_id"),
        to_timestamp(concat(lit("2024-01-01 "), col("t"))).as("ts"),
        col("event_type"))
    val batch = graft.operators.EventFunnel.funnel(batchDf, steps, gap)
      .filter(col("steps_reached") === 3)
      .collect()
      .map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(batch.keySet == Set(1L, 3L, 4L)) // u2 broken by the gap
    assert(streamed == batch)
  }

  test("JSON-lines files flow through the same ingest contract") {
    val wh = new Warehouse(spark, tmpDir("whj").toString)
    val pipe = new graft.etl.Pipeline(spark, wh)
    val dir = tmpDir("jsonl")
    val jsonl =
      """{"study_id":"SJ","participant_id":"P1","measurement_type":"glucose","value":"99.5","unit":"mg/dL","timestamp":"2024-01-15T09:30:00Z","site_id":"SITE_J","quality_score":"0.9"}
        |{"study_id":"SJ","participant_id":"P1","measurement_type":"blood_pressure","value":"120/80","unit":"mmHg","timestamp":"2024-01-15T09:31:00Z","site_id":"SITE_J","quality_score":"0.9"}
        |""".stripMargin
    val res = pipe.processJob("j-json", writeCsv(dir, "m.jsonl", jsonl), format = "json")
    assert(res.status == "completed", res.message)
    assert(wh.read("processed_measurements", Schemas.processed).count() == 3) // BP splits
  }

  test("watermarked daily rollup over a measurement stream (memory sink)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[(String, String, String, java.sql.Timestamp, java.math.BigDecimal)]
    val df = mem.toDF().toDF("study_id", "participant_id", "measurement_type",
        "measured_at", "value_num")
    val q = StreamingRollups.dailyRollup(df)
      .writeStream.outputMode("append").format("memory").queryName("rollup").start()

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def d(v: Double) = new java.math.BigDecimal(v)
    mem.addData(
      ("S1", "P1", "glucose", ts("2024-01-15 09:00:00"), d(100)),
      ("S1", "P1", "glucose", ts("2024-01-15 21:00:00"), d(110)),
      ("S1", "P1", "glucose", ts("2024-01-16 09:00:00"), d(120)))
    q.processAllAvailable()
    // advance watermark far enough to close the Jan-15 and Jan-16 windows
    mem.addData(("S1", "P1", "glucose", ts("2024-01-20 00:00:00"), d(1)))
    q.processAllAvailable()

    val out = spark.table("rollup").collect()
    val jan15 = out.find(_.getAs[java.sql.Timestamp]("day").toString.startsWith("2024-01-15")).get
    assert(jan15.getAs[Long]("cnt") == 2)
    assert(jan15.getAs[java.math.BigDecimal]("avg_num").doubleValue() == 105.0)
    q.stop()
  }

  test("streaming dedup drops in-window duplicates, bounded by the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[(String, String, java.sql.Timestamp)]
    val df = mem.toDF().toDF("study_id", "participant_id", "measured_at")
    val q = StreamingDedup.withinWatermark(df, "measured_at", "1 hour",
        Seq("study_id", "participant_id", "measured_at"))
      .writeStream.outputMode("append").format("memory").queryName("dedup").start()

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData(
      ("S1", "P1", ts("2024-01-15 09:00:00")),
      ("S1", "P1", ts("2024-01-15 09:00:00")),   // same-batch duplicate
      ("S1", "P2", ts("2024-01-15 09:10:00")))
    q.processAllAvailable()
    mem.addData(("S1", "P1", ts("2024-01-15 09:00:00")))  // cross-batch dup
    q.processAllAvailable()

    assert(spark.table("dedup").count() == 2)  // one P1 row, one P2 row
    q.stop()
  }

  test("streaming semantic dedup maintains the vector corpus across micro-batches") {
    import graft.llm.{Dedup, Similarity}
    import org.apache.spark.sql.types._
    import spark.implicits._
    // two well-separated directions; vec 25 (wave 2) duplicates vec 5
    // (wave 1), vec 30 duplicates vec 28 within wave 2
    def vec(i: Int): Array[Float] = {
      val src = if (i == 25) 5 else if (i == 30) 28 else i
      val hot = if (src % 2 == 0) 0 else 3
      Array.tabulate(6)(d =>
        (if (d == hot) 1.0f else 0.01f) + src.toFloat * 1e-4f)
    }
    def jsonl(ids: Range): String = ids.map { i =>
      s"""{"vec_id": $i, "embedding": [${vec(i).mkString(", ")}]}"""
    }.mkString("\n")
    val all = (0 until 40).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(all.filter(col("vec_id") < 20),
      k = 2, iters = 2)

    val landing = tmpDir("vec-landing")
    val wh = new Warehouse(spark, tmpDir("whvec").toString)
    val sd = new StreamingSemDedup(spark, wh, landing.toString,
      tmpDir("ckptvec").toString, cents, tau = 0.999)
    writeCsv(landing, "wave1.json", jsonl(0 until 20))
    sd.start(availableNow = true).awaitTermination()
    writeCsv(landing, "wave2.json",
      jsonl(20 until 40) + "\nnot json\n{\"vec_id\": 999}")
    sd.start(availableNow = true).awaitTermination()

    val keptSchema = StructType(Seq(StructField("vec_id", LongType),
      StructField("cluster", IntegerType)))
    val storeSchema = StructType(Seq(StructField("vec_id", LongType),
      StructField("cluster", IntegerType),
      StructField("embedding", ArrayType(FloatType))))
    val maintained = wh.read("vec_corpus", keptSchema)
      .collect().map(_.getLong(0)).toSet
    val oneShot = Dedup.semDedupWith(all, cents, tau = 0.999)
      .collect().map(_.getLong(0)).toSet
    assert(maintained == oneShot)
    assert(!maintained.contains(25L) && !maintained.contains(30L))
    assert(wh.read("vec_store", storeSchema).count() == 40)  // dropped too

    // whole-batch replay is a no-op (high-water mark)
    val batch2 = (20 until 40).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    sd.processBatch(batch2, 1L)
    assert(wh.read("vec_corpus", keptSchema).count() == maintained.size)
    assert(wh.read("vec_store", storeSchema).count() == 40)
  }

  test("stream-stream join correlates keys within the event-time window only") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val meas = MemoryStream[(String, java.sql.Timestamp, Double)]
    val calib = MemoryStream[(String, java.sql.Timestamp, String)]
    val joined = StreamJoin.precededBy(
      meas.toDF().toDF("site", "m_ts", "value"),
      calib.toDF().toDF("c_site", "c_ts", "calib_id"),
      leftKey = "site", rightKey = "c_site",
      leftTime = "m_ts", rightTime = "c_ts",
      lateness = "10 minutes", window = "1 hour")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("sjoin").start()

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    calib.addData(
      ("S_A", ts("2024-01-15 08:30:00"), "cal-in-window"),
      ("S_A", ts("2024-01-15 06:00:00"), "cal-too-old"),
      ("S_B", ts("2024-01-15 08:45:00"), "cal-wrong-site"))
    meas.addData(("S_A", ts("2024-01-15 09:00:00"), 98.5))
    q.processAllAvailable()

    val rows = spark.table("sjoin").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("calib_id") == "cal-in-window")
    q.stop()
  }

  test("streaming count-min: merged cells equal the one-shot sketch; " +
      "replay adds nothing twice") {
    import graft.llm.Sketches
    import spark.implicits._
    val wh = new Warehouse(spark, tmpDir("whcm").toString)
    val ckpt = tmpDir("ckpt-cm").toString
    val ss = new StreamingSketch(spark, wh, tmpDir("landing-cm").toString,
      ckpt, depth = 2, width = 16)
    def batch(ids: Range) =
      ids.map(i => (i.toLong, s"tok${i % 5} tok${i % 3} shared"))
        .toDF("doc_id", "text")

    ss.processBatch(batch(0 until 20), 0L)
    ss.processBatch(batch(20 until 50), 1L)

    def cells = wh.read("cm_sketch", ss.sketchSchema)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val oneShot = Sketches.countMinBuild(
        batch(0 until 50).select(explode(
          graft.llm.Dedup.wsTokens(col("text"))).as("term")),
        col("term"), depth = 2, width = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cells == oneShot)

    // whole-batch replay: the additive merge MUST NOT run again
    ss.processBatch(batch(20 until 50), 1L)
    assert(cells == oneShot)
  }

  test("streaming HLL: merged registers equal the one-shot sketch; " +
      "re-delivery is absorbed by max (idempotent even past the guard)") {
    import graft.llm.Sketches
    import spark.implicits._
    val wh = new Warehouse(spark, tmpDir("whhll").toString)
    val sink = new StreamingHllSink(spark, wh,
      tmpDir("landing-hll").toString, tmpDir("ckpt-hll").toString, m = 256)
    def batch(ids: Range) =
      ids.map(i => (i.toLong, s"payload-${i % 97}", s"s${i % 3}"))
        .toDF("doc_id", "text", "source")

    sink.processBatch(batch(0 until 40), 0L)
    sink.processBatch(batch(40 until 100), 1L)

    def regRows = sink.registers().collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val oneShot = Sketches.hllRegisters(batch(0 until 100), $"text",
        m = 256, slices = Seq($"source".as("source")))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(regRows == oneShot)
    // the estimate readout is the batch estimator verbatim
    val est = sink.estimates().collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    val direct = Sketches.hllEstimate(
        Sketches.hllRegisters(batch(0 until 100), $"text", m = 256,
          slices = Seq($"source".as("source"))), 256, Seq("source"))
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(est == direct)

    // whole-batch replay under the SAME id: the commit guard no-ops it
    sink.processBatch(batch(40 until 100), 1L)
    assert(regRows == oneShot)
    // re-delivery under a FRESH id — the guard cannot catch this, and
    // it does not have to: max absorbs every duplicate register
    // contribution (the sketch property that distinguishes this sink
    // from the additive count-min/index merges)
    sink.processBatch(batch(0 until 100), 2L)
    assert(regRows == oneShot)

    // null text rows sketch nothing; corrupt-ish rows (null doc_id) drop
    sink.processBatch(
      Seq[(java.lang.Long, String, String)]((200L, null, "s0"),
        (null, "x", "s0")).toDF("doc_id", "text", "source"), 3L)
    assert(regRows == oneShot)

    // geometry guard: a fresh NARROWER sink refuses the wider store
    // (its buckets provably exceed the narrow m; the reverse direction
    // is indistinguishable from data — document-level contract)
    val narrow = new StreamingHllSink(spark, wh,
      tmpDir("landing-hll2").toString, tmpDir("ckpt-hll2").toString,
      m = 128)
    val err = intercept[Exception] {
      narrow.processBatch(batch(100 until 110), 0L)
    }
    assert(err.getMessage != null && err.getMessage.contains("wider"),
      s"unexpected: ${err.getMessage}")
  }

  test("the same doc in two files of ONE micro-batch lands once in every " +
    "sink: corpus dedup, count-min, semantic dedup (the router discipline)") {
    import graft.llm.{Sketches, Similarity}
    import org.apache.spark.sql.types._
    import spark.implicits._

    // corpus dedup: the keyed corpus and the signature store must each
    // hold ONE row for the duplicated doc (appendIfAbsent anti-joins
    // only existing keys, so within-batch dedup is the sink's job)
    val landing = tmpDir("dupland-cd")
    val wh = new Warehouse(spark, tmpDir("whdup-cd").toString)
    val sd = new StreamingCorpusDedup(spark, wh, landing.toString,
      tmpDir("ckptdup-cd").toString)
    val doc = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    doc.coalesce(1).write.mode("append").json(landing.toString)
    doc.coalesce(1).write.mode("append").json(landing.toString)
    sd.start(availableNow = true).awaitTermination()
    val docSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    assert(wh.read("corpus", docSchema).count() == 1L,
      "duplicate corpus rows within one batch")
    assert(wh.read("sig_store",
        StructType.fromDDL("doc_id BIGINT, sig ARRAY<BIGINT>")).count() == 1L,
      "duplicate signature rows within one batch")

    // count-min: the duplicated doc's tokens must count ONCE — the
    // merged cells equal the one-shot sketch of the deduplicated batch
    val wh2 = new Warehouse(spark, tmpDir("whdup-cm").toString)
    val ss = new StreamingSketch(spark, wh2, tmpDir("dupland-cm").toString,
      tmpDir("ckptdup-cm").toString, depth = 2, width = 16)
    ss.processBatch(
      Seq((1L, "alpha beta"), (1L, "alpha beta")).toDF("doc_id", "text"), 0L)
    val cells = wh2.read("cm_sketch", ss.sketchSchema)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val oneShot = Sketches.countMinBuild(
        Seq((1L, "alpha beta")).toDF("doc_id", "text")
          .select(explode(graft.llm.Dedup.wsTokens(col("text"))).as("term")),
        col("term"), depth = 2, width = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cells == oneShot, "a within-batch duplicate double-counted tokens")

    // semantic dedup: one row per vec_id in BOTH keyed sinks
    def v(hot: Int) = Array.tabulate(4)(d => if (d == hot) 1.0f else 0.0f)
    val cents = Similarity.kmeansCentroids(
      Seq((0L, v(0)), (1L, v(2))).toDF("vec_id", "embedding"), k = 2, iters = 1)
    val wh3 = new Warehouse(spark, tmpDir("whdup-sem").toString)
    val sem = new StreamingSemDedup(spark, wh3,
      tmpDir("dupland-sem").toString, tmpDir("ckptdup-sem").toString,
      cents, tau = 0.999)
    sem.processBatch(
      Seq((7L, v(0)), (7L, v(0))).toDF("vec_id", "embedding"), 0L)
    val storeSchema = StructType(Seq(StructField("vec_id", LongType),
      StructField("cluster", IntegerType),
      StructField("embedding", ArrayType(FloatType))))
    assert(wh3.read("vec_store", storeSchema).count() == 1L,
      "duplicate vector store rows within one batch")
    assert(wh3.read("vec_corpus", StructType(Seq(
        StructField("vec_id", LongType), StructField("cluster", IntegerType))))
      .count() == 1L, "duplicate vector corpus rows within one batch")
  }

  test("streaming dsir gate: routed tables equal the batch law across " +
    "waves; scoreless docs rejected with null weight; replay no-op") {
    import graft.llm.TextAnalysis
    import org.apache.spark.sql.types._
    import spark.implicits._
    val B = 32
    val landing = tmpDir("dsir-landing")
    val wh = new Warehouse(spark, tmpDir("whdsir").toString)
    // batch trainer lands the frozen ratio table
    val target = Seq((1000L, "alpha beta gamma alpha beta"),
      (1001L, "alpha beta gamma")).toDF("doc_id", "text")
    val rawTrain = Seq((2000L, "zz qq pp rr ss"),
      (2001L, "alpha zz beta qq")).toDF("doc_id", "text")
    wh.replace("dsir_ratio", TextAnalysis.dsirRatioTable(
      TextAnalysis.dsirFeatures(target, B),
      TextAnalysis.dsirFeatures(rawTrain, B), B))

    // the streamed corpus: target-like docs score high, junk low; doc 3
    // arrives in BOTH waves (cross-wave redelivery heals via the key),
    // doc 6 is whitespace-only (no features -> rejected, null weight)
    val texts = Map(
      0L -> "alpha beta gamma alpha", 1L -> "zz qq zz qq pp",
      2L -> "alpha beta zz", 3L -> "alpha beta gamma beta",
      4L -> "pp rr ss zz", 5L -> "gamma alpha beta alpha", 6L -> " ")
    def jsonl(ids: Seq[Long]): String =
      ids.map(i => s"""{"doc_id": $i, "text": "${texts(i)}"}""")
        .mkString("\n")
    // threshold from the batch law: between junk and target-like scores
    val scores = TextAnalysis.dsirScore(
        texts.toSeq.toDF("doc_id", "text"),
        wh.read("dsir_ratio", StructType(Seq(StructField("b", LongType),
          StructField("r", LongType)))), B)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(!scores.contains(6L)) // whitespace-only doc has no features
    val minW = (scores(1L) + scores(0L)) / 2
    assert(scores.values.exists(_ >= minW) &&
      scores.values.exists(_ < minW)) // both branches live

    val gate = new StreamingDsirGate(spark, wh, landing.toString,
      tmpDir("ckpt-dsir").toString, buckets = B, minWeight = minW)
    writeCsv(landing, "w1.json", jsonl(Seq(0L, 1L, 2L, 3L)))
    gate.start(availableNow = true).awaitTermination()
    writeCsv(landing, "w2.json",
      jsonl(Seq(3L, 4L, 5L, 6L)) + "\nnot json\n{\"doc_id\": 99}")
    gate.start(availableNow = true).awaitTermination()

    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("n_feats", LongType), StructField("dsir_weight", LongType)))
    def table(t: String) = wh.read(t, outSchema).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val kept = table("corpus_kept"); val rejected = table("corpus_rejected")
    val expKept = scores.filter(_._2 >= minW).keySet
    val expRej = scores.filter(_._2 < minW).keySet + 6L
    assert(kept.keySet == expKept, s"$kept")
    assert(rejected.keySet == expRej, s"$rejected")
    kept.foreach { case (id, w) => assert(w.contains(scores(id))) }
    assert(rejected(6L).isEmpty, "scoreless doc must carry a null weight")
    rejected.collect { case (id, Some(w)) => assert(w == scores(id)) }

    // whole-batch replay: an already-committed batch id no-ops
    gate.processBatch(Seq((0L, texts(0L)), (1L, texts(1L)))
      .toDF("doc_id", "text"), 0L)
    assert(table("corpus_kept") == kept &&
      table("corpus_rejected") == rejected, "replayed batch must no-op")
  }

  test("streaming NB gate: routed tables equal the batch classifier law " +
    "across waves; zero-token docs rejected with null score; replay no-op") {
    import graft.llm.TextAnalysis
    import org.apache.spark.sql.types._
    import spark.implicits._
    val landing = tmpDir("nb-landing")
    val wh = new Warehouse(spark, tmpDir("whnb").toString)
    // batch trainer lands the frozen count table (seed = positive class)
    val labeled = Seq(
      (1000L, "alpha beta gamma alpha", true),
      (1001L, "alpha beta delta", true),
      (2000L, "zz qq pp zz", false),
      (2001L, "qq pp rr", false)).toDF("doc_id", "text", "is_seed")
    wh.replace("nb_counts",
      TextAnalysis.nbCountTable(labeled, col("is_seed")))

    // seed-like docs score above neutral, junk below; doc 3 arrives in
    // both waves; doc 6 is whitespace-only (no tokens -> null score)
    val texts = Map(
      0L -> "alpha beta alpha", 1L -> "zz qq pp",
      2L -> "alpha zz beta", 3L -> "beta gamma delta",
      4L -> "pp rr zz qq", 5L -> "alpha alpha gamma", 6L -> " ")
    def jsonl(ids: Seq[Long]): String =
      ids.map(i => s"""{"doc_id": $i, "text": "${texts(i)}"}""")
        .mkString("\n")
    val minScore = 1000000000L
    val scores = TextAnalysis.naiveBayesOdds(labeled,
        texts.toSeq.toDF("doc_id", "text"), col("is_seed"),
        minScore = minScore)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(!scores.contains(6L)) // zero tokens: never scored
    assert(scores.values.exists(_ >= minScore) &&
      scores.values.exists(_ < minScore)) // both branches live

    val gate = new StreamingNbGate(spark, wh, landing.toString,
      tmpDir("ckpt-nb").toString, minScore = minScore)
    writeCsv(landing, "w1.json", jsonl(Seq(0L, 1L, 2L, 3L)))
    gate.start(availableNow = true).awaitTermination()
    writeCsv(landing, "w2.json",
      jsonl(Seq(3L, 4L, 5L, 6L)) + "\nnot json\n{\"doc_id\": 99}")
    gate.start(availableNow = true).awaitTermination()

    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("n_tokens", LongType), StructField("nb_score", LongType)))
    def table(t: String) = wh.read(t, outSchema).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val kept = table("corpus_kept"); val rejected = table("corpus_rejected")
    val expKept = scores.filter(_._2 >= minScore).keySet
    val expRej = scores.filter(_._2 < minScore).keySet + 6L
    assert(kept.keySet == expKept, s"$kept")
    assert(rejected.keySet == expRej, s"$rejected")
    kept.foreach { case (id, s) => assert(s.contains(scores(id))) }
    assert(rejected(6L).isEmpty, "zero-token doc must carry a null score")
    rejected.collect { case (id, Some(s)) => assert(s == scores(id)) }

    // whole-batch replay no-ops
    gate.processBatch(Seq((0L, texts(0L)), (1L, texts(1L)))
      .toDF("doc_id", "text"), 0L)
    assert(table("corpus_kept") == kept &&
      table("corpus_rejected") == rejected, "replayed batch must no-op")
  }

  test("NB gate retrain rotation: a running incarnation keeps the frozen " +
    "law; a restarted sink picks up the new generation; replays across " +
    "the rotation stay no-ops") {
    import graft.llm.TextAnalysis
    import org.apache.spark.sql.types._
    import spark.implicits._
    val landing = tmpDir("nb-rot-landing")
    val wh = new Warehouse(spark, tmpDir("whnb-rot").toString)
    // gen1: alpha is the seed class; gen2 REVERSES the labels, so the
    // keep decision flips for every doc — a rotation that leaked into a
    // running incarnation would be unmissable
    def counts(alphaPositive: Boolean) = TextAnalysis.nbCountTable(
      Seq((1L, "alpha alpha alpha", alphaPositive),
        (2L, "zz zz zz", !alphaPositive)).toDF("doc_id", "text", "is_seed"),
      col("is_seed"))
    wh.replace("nb_counts", counts(alphaPositive = true))

    val texts = Map(10L -> "alpha alpha", 11L -> "zz zz",
      12L -> "alpha", 13L -> "zz", 14L -> "alpha", 15L -> "zz")
    def jsonl(ids: Seq[Long]): String =
      ids.map(i => s"""{"doc_id": $i, "text": "${texts(i)}"}""")
        .mkString("\n")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("n_tokens", LongType), StructField("nb_score", LongType)))
    def keptIds = wh.read("corpus_kept", outSchema)
      .select("doc_id").as[Long].collect().toSet
    def rejectedIds = wh.read("corpus_rejected", outSchema)
      .select("doc_id").as[Long].collect().toSet

    val ckpt = tmpDir("ckpt-nb-rot").toString
    val gate1 = new StreamingNbGate(spark, wh, landing.toString, ckpt)
    writeCsv(landing, "w1.json", jsonl(Seq(10L, 11L)))
    gate1.start(availableNow = true).awaitTermination()
    assert(keptIds == Set(10L) && rejectedIds == Set(11L))

    // RETRAIN lands mid-stream: a NEW counts generation flips the law
    wh.replace("nb_counts", counts(alphaPositive = false))

    // the same incarnation (gate1 holds its frozen state) must keep the
    // OLD law to stream end — alpha still keeps, zz still rejects
    writeCsv(landing, "w2.json", jsonl(Seq(12L, 13L)))
    gate1.start(availableNow = true).awaitTermination()
    assert(keptIds == Set(10L, 12L) && rejectedIds == Set(11L, 13L),
      "a running incarnation must NOT pick up the rotated generation")

    // a RESTARTED sink (new incarnation, same checkpoint + tables)
    // reads the new generation: the law flips for wave 3
    val gate2 = new StreamingNbGate(spark, wh, landing.toString, ckpt)
    writeCsv(landing, "w3.json", jsonl(Seq(14L, 15L)))
    gate2.start(availableNow = true).awaitTermination()
    assert(keptIds == Set(10L, 12L, 15L) &&
      rejectedIds == Set(11L, 13L, 14L),
      "a restarted incarnation must score under the new generation")

    // replays ACROSS the rotation stay no-ops: wave 1's batch id
    // re-delivered to the new incarnation must not re-route docs 10/11
    // under the new law
    val (k0, r0) = (keptIds, rejectedIds)
    gate2.processBatch(Seq((10L, texts(10L)), (11L, texts(11L)))
      .toDF("doc_id", "text"), 0L)
    assert(keptIds == k0 && rejectedIds == r0,
      "a pre-rotation batch replay must no-op on the new incarnation")
  }

  test("DSIR gate retrain rotation: a running incarnation keeps the " +
    "frozen ratio table; a restart picks up the new generation; replays " +
    "across the rotation stay no-ops") {
    import graft.llm.TextAnalysis
    import org.apache.spark.sql.types._
    import spark.implicits._
    val B = 32
    val landing = tmpDir("dsir-rot-landing")
    val wh = new Warehouse(spark, tmpDir("whdsir-rot").toString)
    // gen1: target is alpha-heavy (alpha docs importance-weight high);
    // gen2 swaps target and raw, flipping every keep decision
    val alphaCorpus = Seq((1L, "alpha alpha alpha beta")).toDF("doc_id", "text")
    val zzCorpus = Seq((2L, "zz zz zz qq")).toDF("doc_id", "text")
    def ratio(alphaTarget: Boolean) = {
      val (t, r) = if (alphaTarget) (alphaCorpus, zzCorpus)
        else (zzCorpus, alphaCorpus)
      TextAnalysis.dsirRatioTable(
        TextAnalysis.dsirFeatures(t, B), TextAnalysis.dsirFeatures(r, B), B)
    }
    wh.replace("dsir_ratio", ratio(alphaTarget = true))
    val texts = Map(10L -> "alpha alpha", 11L -> "zz zz",
      12L -> "alpha", 13L -> "zz", 14L -> "alpha", 15L -> "zz")
    def jsonl(ids: Seq[Long]): String =
      ids.map(i => s"""{"doc_id": $i, "text": "${texts(i)}"}""")
        .mkString("\n")
    // the neutral point separates the two classes under BOTH
    // generations (swap symmetry): alpha > 1e9 under gen1, < under gen2
    val minW = 1000000000L
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("n_feats", LongType), StructField("dsir_weight", LongType)))
    def keptIds = wh.read("corpus_kept", outSchema)
      .select("doc_id").as[Long].collect().toSet
    def rejectedIds = wh.read("corpus_rejected", outSchema)
      .select("doc_id").as[Long].collect().toSet
    // sanity: the law flips as designed
    val s1 = TextAnalysis.dsirScore(texts.toSeq.toDF("doc_id", "text"),
      ratio(alphaTarget = true), B).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val s2 = TextAnalysis.dsirScore(texts.toSeq.toDF("doc_id", "text"),
      ratio(alphaTarget = false), B).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s1(10L) >= minW && s1(11L) < minW &&
      s2(10L) < minW && s2(11L) >= minW, s"law not separable: $s1 / $s2")

    val ckpt = tmpDir("ckpt-dsir-rot").toString
    val gate1 = new StreamingDsirGate(spark, wh, landing.toString, ckpt,
      buckets = B, minWeight = minW)
    writeCsv(landing, "w1.json", jsonl(Seq(10L, 11L)))
    gate1.start(availableNow = true).awaitTermination()
    assert(keptIds == Set(10L) && rejectedIds == Set(11L))

    wh.replace("dsir_ratio", ratio(alphaTarget = false))   // retrain

    writeCsv(landing, "w2.json", jsonl(Seq(12L, 13L)))
    gate1.start(availableNow = true).awaitTermination()
    assert(keptIds == Set(10L, 12L) && rejectedIds == Set(11L, 13L),
      "a running incarnation must NOT pick up the rotated ratio table")

    val gate2 = new StreamingDsirGate(spark, wh, landing.toString, ckpt,
      buckets = B, minWeight = minW)
    writeCsv(landing, "w3.json", jsonl(Seq(14L, 15L)))
    gate2.start(availableNow = true).awaitTermination()
    assert(keptIds == Set(10L, 12L, 15L) &&
      rejectedIds == Set(11L, 13L, 14L),
      "a restarted incarnation must score under the new generation")

    val (k0, r0) = (keptIds, rejectedIds)
    gate2.processBatch(Seq((10L, texts(10L)), (11L, texts(11L)))
      .toDF("doc_id", "text"), 0L)
    assert(keptIds == k0 && rejectedIds == r0,
      "a pre-rotation batch replay must no-op on the new incarnation")
  }

  test("streaming NB gate: refuses to start against an UNTRAINED (empty) count table") {
    val wh = new Warehouse(spark, tmpDir("whnb-empty").toString)
    val gate = new StreamingNbGate(spark, wh, tmpDir("nb-empty").toString,
      tmpDir("ckpt-nb-empty").toString)
    val ex = intercept[IllegalStateException] {
      gate.start(availableNow = true)
    }
    assert(ex.getMessage.contains("nb_counts is empty"),
      s"got: ${ex.getMessage}")
  }
}
