package graft.etl

import graft.{Fixtures, SparkSpec}
import graft.schema.Schemas
import org.apache.spark.sql.functions._

/** End-to-end golden tests for the six-stage job pipeline and the three
  * sink disciplines, pinned to `etl-service/src/etl.py:232-266` +
  * `db.py`. */
class PipelineSpec extends SparkSpec {

  private def freshPipeline() = {
    val wh = new Warehouse(spark, tmpDir("wh").toString)
    (new Pipeline(spark, wh), wh)
  }
  private def csv(name: String, content: String): String = {
    val dir = tmpDir("data")
    writeCsv(dir, name, content)
  }

  test("happy path: staging, dims, processed, aggs all land; job completes") {
    val (pipe, wh) = freshPipeline()
    val res = pipe.processJob("job-1", csv("study001.csv", Fixtures.study001))
    assert(res.status == "completed", res.message)
    assert(res.stagedRows == 6 && res.processedRows == 6)

    assert(wh.read("studies", Schemas.studies).count() == 1)
    val parts = wh.read("participants", Schemas.participants)
    assert(parts.count() == 3)
    assert(parts.filter(col("site_id") === "SITE_A").count() == 3)

    val aggs = wh.read("measurement_aggregations", Schemas.aggregations)
    val glucoseP001 = aggs.filter(col("participant_id") === "P001" &&
      col("measurement_type") === "glucose").head()
    assert(glucoseP001.getAs[Long]("cnt") == 2)
    assert(glucoseP001.getAs[java.math.BigDecimal]("avg_num").doubleValue() == 98.35)
    assert(glucoseP001.getAs[java.math.BigDecimal]("min_num").doubleValue() == 95.5)
    assert(glucoseP001.getAs[java.math.BigDecimal]("max_num").doubleValue() == 101.2)

    // no quality rules on the happy path
    assert(wh.read("data_quality_reports", Schemas.qualityReports).isEmpty)

    val job = wh.read("etl_jobs", Schemas.etlJobs).head()
    assert(job.getAs[String]("status") == "completed")
    assert(job.getAs[java.sql.Timestamp]("completed_at") != null)
  }

  test("re-running the same file under a new job id is idempotent in processed/aggs") {
    val (pipe, wh) = freshPipeline()
    val path = csv("study001.csv", Fixtures.study001)
    pipe.processJob("job-1", path)
    val first = wh.read("processed_measurements", Schemas.processed).count()
    pipe.processJob("job-2", path)

    // staging grows (different job_id in the key), processed dedups on
    // uq_pm_obs (same observation identity across jobs)
    assert(wh.read("staging_clinical_measurements", Schemas.staging).count() == 12)
    assert(wh.read("processed_measurements", Schemas.processed).count() == first)

    // aggs: cnt/avg replaced by job-2, min/max merged, still one row per key
    val aggs = wh.read("measurement_aggregations", Schemas.aggregations)
    assert(aggs.count() == 5)
    assert(aggs.filter(col("job_id") === "job-2").count() == 5)
  }

  test("BP file: each valid BP row lands as two processed observations") {
    val (pipe, wh) = freshPipeline()
    pipe.processJob("job-1", csv("study002.csv", Fixtures.study002))
    val p = wh.read("processed_measurements", Schemas.processed)
    assert(p.count() == 6) // 2 BP rows -> 4 + heart_rate + weight
    assert(p.filter(col("measurement_type") === "blood_pressure_systolic").count() == 2)
  }

  test("quality rules: malformed BP (error), missing unit (warn), out of range (warn)") {
    val (pipe, wh) = freshPipeline()
    pipe.processJob("j-bad", csv("bad_bp.csv", Fixtures.badBp))
    pipe.processJob("j-unit", csv("missing_unit.csv", Fixtures.missingUnit))
    pipe.processJob("j-oor", csv("out_of_range.csv", Fixtures.outOfRange))
    pipe.processJob("j-oob", csv("oob_bp.csv", Fixtures.oobBp))

    val q = wh.read("data_quality_reports", Schemas.qualityReports)
    def rule(job: String) = q.filter(col("job_id") === job)
      .select("rule_name", "severity", "affected_rows").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    assert(rule("j-bad") == Set(("malformed_blood_pressure", "error", 1L)))
    assert(rule("j-unit") == Set(("missing_unit_required", "warn", 1L)))
    assert(rule("j-oor") == Set(("numeric_out_of_range", "warn", 1L)))
    // 300/80 is malformed (parse_bp bounds), NOT numeric_out_of_range
    assert(rule("j-oob") == Set(("malformed_blood_pressure", "error", 1L)))

    // out-of-range row still lands in processed + aggs (rules only count)
    val oor = wh.read("processed_measurements", Schemas.processed)
      .filter(col("study_id") === "STUDYZ")
    assert(oor.count() == 1)
    assert(oor.head().getAs[java.math.BigDecimal]("value_num").doubleValue() == 1000.0)
  }

  test("junk quality_score fails the whole job, like float() raising") {
    val (pipe, wh) = freshPipeline()
    val res = pipe.processJob("j-q", csv("junk.csv", Fixtures.junkQuality))
    assert(res.status == "failed")
    assert(res.message.exists(_.contains("could not convert")))
    assert(wh.read("etl_jobs", Schemas.etlJobs).head().getAs[String]("status") == "failed")
    assert(!wh.exists("processed_measurements"))
  }

  test("blank study_id rejects the whole file") {
    val (pipe, _) = freshPipeline()
    val res = pipe.processJob("j-b", csv("blank.csv", Fixtures.blankStudy))
    assert(res.status == "failed")
    assert(res.message.exists(_.contains("study_id is required")))
  }

  test("missing required column fails with the column named") {
    val (pipe, _) = freshPipeline()
    val res = pipe.processJob("j-m", csv("missing_col.csv", Fixtures.missingColumn))
    assert(res.status == "failed")
    assert(res.message.exists(_.contains("missing columns")))
    assert(res.message.exists(_.contains("site_id")))
  }

  test("participants merge: a later job's site_id wins (EXCLUDED semantics)") {
    val (pipe, wh) = freshPipeline()
    pipe.processJob("j-1", csv("a.csv", Fixtures.study002))
    val moved = Fixtures.study002.replace("SITE_B", "SITE_C")
    pipe.processJob("j-2", csv("b.csv", moved))
    val parts = wh.read("participants", Schemas.participants)
    assert(parts.count() == 2)
    assert(parts.filter(col("site_id") === "SITE_C").count() == 2)
  }

  test("agg merge across jobs: cnt/avg last-writer, min/max merged") {
    val (pipe, wh) = freshPipeline()
    val v1 =
      s"""${Fixtures.header}
         |S,P,glucose,100,mg/dL,2024-01-01T00:00:00Z,SITE_A,0.9
         |S,P,glucose,200,mg/dL,2024-01-02T00:00:00Z,SITE_A,0.9
         |""".stripMargin
    val v2 =
      s"""${Fixtures.header}
         |S,P,glucose,150,mg/dL,2024-01-03T00:00:00Z,SITE_A,0.9
         |""".stripMargin
    pipe.processJob("j-1", csv("v1.csv", v1))
    pipe.processJob("j-2", csv("v2.csv", v2))
    val agg = wh.read("measurement_aggregations", Schemas.aggregations).head()
    assert(agg.getAs[Long]("cnt") == 1)                 // replaced by j-2
    assert(agg.getAs[java.math.BigDecimal]("avg_num").doubleValue() == 150.0)
    assert(agg.getAs[java.math.BigDecimal]("min_num").doubleValue() == 100.0) // merged
    assert(agg.getAs[java.math.BigDecimal]("max_num").doubleValue() == 200.0) // merged
    assert(agg.getAs[String]("job_id") == "j-2")
  }

  test("agg merge is partition-scoped: other studies' files are untouched") {
    val (pipe, wh) = freshPipeline()
    val sA =
      s"""${Fixtures.header}
         |SA,P,glucose,100,mg/dL,2024-01-01T00:00:00Z,SITE_A,0.9
         |""".stripMargin
    val sB =
      s"""${Fixtures.header}
         |SB,P,glucose,150,mg/dL,2024-01-02T00:00:00Z,SITE_B,0.9
         |""".stripMargin
    pipe.processJob("j-a", csv("sa.csv", sA))
    def saDir = wh.currentDir("measurement_aggregations").get.resolve("study_id=SA")
    def filesOf(p: java.nio.file.Path): Map[String, java.nio.file.attribute.FileTime] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(f => p.relativize(f).toString -> java.nio.file.Files.getLastModifiedTime(f))
        .toMap
    }
    val before = filesOf(saDir)
    pipe.processJob("j-b", csv("sb.csv", sB))   // touches only study SB
    // SA's files carried into the new generation as hard links: same
    // names, same mtimes (same inodes) — never rewritten
    assert(filesOf(saDir) == before)
    val aggs = wh.read("measurement_aggregations", Schemas.aggregations)
    assert(aggs.count() == 2)                   // both studies present
    assert(aggs.filter(org.apache.spark.sql.functions.col("study_id") === "SA")
      .head().getAs[java.math.BigDecimal]("avg_num").doubleValue() == 100.0)
  }

  test("job status is queryable and progress milestones fire in order") {
    val seen = scala.collection.mutable.ArrayBuffer[Int]()
    val wh = new Warehouse(spark, tmpDir("wh").toString)
    val pipe = new Pipeline(spark, wh, (_, pct, _) => seen += pct)
    val jobId = java.util.UUID.randomUUID().toString
    pipe.processJob(jobId, csv("study001.csv", Fixtures.study001))
    assert(seen.toSeq == Seq(10, 30, 45, 65, 75, 90, 100))
    assert(pipe.jobStatus(jobId).isDefined)
    // valid-but-unknown UUID: empty after a table read
    assert(pipe.jobStatus(java.util.UUID.randomUUID().toString).isEmpty)
  }

  test("job inputs resolve inside the data root only (reference main.py:30-34)") {
    val wh = new Warehouse(spark, tmpDir("wh").toString)
    val dataDir = tmpDir("uploads")
    writeCsv(dataDir, "ok.csv", Fixtures.study001)
    val outside = tmpDir("elsewhere")
    writeCsv(outside, "evil.csv", Fixtures.study001)
    val pipe = new Pipeline(spark, wh, dataRoot = Some(dataDir.toString))
    // a name relative to the root works
    assert(pipe.processJob("j-ok", "ok.csv").status == "completed")
    // escapes and absolute paths outside the root fail with the
    // reference's error, without reading anything
    val esc = pipe.processJob("j-esc",
      s"../${outside.getFileName}/evil.csv")
    assert(esc.status == "failed" && esc.message.contains("Not a file."))
    val abs = pipe.processJob("j-abs", outside.resolve("evil.csv").toString)
    assert(abs.status == "failed" && abs.message.contains("Not a file."))
    // nonexistent and non-file inputs fail the same way
    assert(pipe.processJob("j-miss", "missing.csv").message.contains("Not a file."))
    assert(pipe.processJob("j-dir", ".").message.contains("Not a file."))
    // a symlink planted INSIDE the root pointing outside is the escape
    // the lexical startsWith check would miss: real-path containment
    // refuses it
    java.nio.file.Files.createSymbolicLink(
      dataDir.resolve("sneaky.csv"), outside.resolve("evil.csv"))
    val sym = pipe.processJob("j-sym", "sneaky.csv")
    assert(sym.status == "failed" && sym.message.contains("Not a file."))
  }

  test("with no data root, inputs pass through to the reader unvalidated") {
    val (pipe, _) = freshPipeline()
    // a DIRECTORY of csv files is a perfectly good Spark input in
    // library use — the regular-file gate applies only to root-relative
    // job inputs (reference main.py:30-34 guards its upload dir, not
    // arbitrary engine reads)
    val dir = tmpDir("data")
    writeCsv(dir, "study001.csv", Fixtures.study001)
    assert(pipe.processJob("j-dir-ok", dir.toString).status == "completed")
  }

  test("malformed job ids are rejected at the status edge (reference etl.service.ts:79-81)") {
    val wh = new Warehouse(spark, tmpDir("wh").toString)
    val pipe = new Pipeline(spark, wh)
    // a job row EXISTS under this non-UUID id, but the status edge
    // validates shape before reading — same as the reference returning
    // null from getJobStatus for any non-UUID id
    pipe.processJob("j-1", csv("study001.csv", Fixtures.study001))
    assert(pipe.jobStatus("j-1").isEmpty)
    assert(pipe.jobStatus("").isEmpty)
    assert(pipe.jobStatus("123e4567-e89b-12d3-a456-42661417400").isEmpty)  // 11-char tail
    assert(pipe.jobStatus("123e4567-e89b-12d3-a456-4266141740zz").isEmpty) // non-hex
    assert(pipe.jobStatus("123e4567-e89b-12d3-a456-426614174000").isEmpty) // valid shape, absent
  }
}
