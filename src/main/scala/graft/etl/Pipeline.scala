package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.Schemas
import java.nio.file.{Files, Path, Paths}

/** End-to-end job orchestration (SURVEY §3.A), reference
  * `etl-service/src/etl.py:232-266` + job control `db.py:31-67`.
  *
  * The six reference stages collapse into one lazy DataFrame DAG with one
  * Spark action per sink (staging, dims, processed, quality, aggs). Stage
  * progress (the reference's 10/30/45/65/75/90/100 milestones,
  * `etl.py:237-263`) surfaces through the `onProgress` callback; job state
  * lives in a tiny `etl_jobs` control table instead of the reference's
  * process-local dict (`state.py:3-5`) so it survives restarts — the
  * *intended* semantics of the reference's memory-then-DB fallback
  * (`main.py:71-89`, whose DB path is broken by a missing `return`,
  * `db.py:29`; we implement the intent, not the bug).
  */
final class Pipeline(spark: SparkSession, wh: Warehouse,
                     onProgress: (String, Int, String) => Unit = (_, _, _) => (),
                     dataRoot: Option[String] = None) {

  import Pipeline.JobResult

  /** Reference `main.py:30-34` (`valid_path`): job inputs are named
    * relative to a configured data dir, resolved, and must be an
    * existing regular file — rejected with "Not a file." otherwise. We
    * implement the intent and additionally refuse resolved paths that
    * escape the root: containment compares REAL paths (symlinks
    * followed), so neither `../` nor a symlink planted inside the root
    * can reach outside it — both escapes the reference's `resolve()` +
    * `is_file` would follow. With no root configured (library use) the
    * path passes straight through to the reader: directories, globs and
    * non-local URIs stay valid Spark inputs there. */
  private def resolveInput(csvPath: String): Either[String, Path] = dataRoot match {
    case None => Right(Paths.get(csvPath))
    case Some(root) =>
      try {
        val rootReal = Paths.get(root).toRealPath()
        val p = rootReal.resolve(csvPath).toRealPath()
        if (p.startsWith(rootReal) && Files.isRegularFile(p)) Right(p)
        else Left("Not a file.")
      } catch { case _: java.io.IOException => Left("Not a file.") }
  }

  def processJob(jobId: String, csvPath: String, format: String = "csv"): JobResult = {
    val filename = Paths.get(csvPath).getFileName.toString
    val input = resolveInput(csvPath) match {
      case Left(err) =>
        markStatus(jobId, "failed", Some(err), Some(filename))
        onProgress(jobId, 100, s"failed: $err")
        return JobResult(jobId, "failed", 0, 0, Some(err))
      case Right(p) => p
    }
    try {
      markStatus(jobId, "running", Some("reading csv"), Some(filename))
      onProgress(jobId, 10, "reading csv")
      val raw = Ingest.read(spark, input.toString, format)

      onProgress(jobId, 30, "staging rows")
      // one pass shared by staging, transform and quality; small enough per
      // job-file to cache (the reference holds it fully in pandas RAM)
      val withIds = Stage.assignRowIds(raw).cache()
      val stagingRows = Stage.toStagingRows(withIds, jobId, filename)
      val staged = Stage.landInStaging(wh, stagingRows)

      onProgress(jobId, 45, "upserting dimensions")
      // the reference re-selects staging WHERE job_id = :j (db.py:71-84);
      // the in-flight stagingRows ARE that set — no need to re-read disk
      Dims.upsertForJob(wh, stagingRows)

      onProgress(jobId, 65, "building processed")
      val processed = Transform.processedRows(stagingRows)
      val landed = Transform.landInProcessed(wh, processed)

      onProgress(jobId, 75, "quality checks")
      Quality.landReports(wh, Quality.ruleCounts(spark, withIds, jobId))

      onProgress(jobId, 90, "aggregations")
      // reference aggregates the job's OWN processed rows (pre-dedup),
      // etl.py:260: build_aggs_from_processed(job_id, processed)
      Aggregate.mergeIntoWarehouse(wh, Aggregate.buildForJob(processed, jobId))

      withIds.unpersist()
      markStatus(jobId, "completed", None, Some(filename))
      onProgress(jobId, 100, "completed")
      JobResult(jobId, "completed", staged, landed, None)
    } catch {
      case e: Exception =>
        markStatus(jobId, "failed", Option(e.getMessage), Some(filename))
        onProgress(jobId, 100, s"failed: ${e.getMessage}")
        JobResult(jobId, "failed", 0, 0, Option(e.getMessage))
    }
  }

  /** S8/S9: upsert into the `etl_jobs` control table. The table is tiny
    * (one row per job) — a driver-side merge + overwrite is appropriate. */
  def markStatus(jobId: String, status: String, message: Option[String],
                 filename: Option[String] = None): Unit = {
    import spark.implicits._
    val now = current_timestamp()
    val existing = wh.read("etl_jobs", Schemas.etlJobs).filter(col("id") =!= jobId)
    val old = wh.read("etl_jobs", Schemas.etlJobs).filter(col("id") === jobId)
      .select("created_at", "completed_at", "filename", "study_id").collect().headOption
    val row = Seq((jobId, filename.orElse(old.map(r => Option(r.getString(2))).flatten).orNull,
        old.map(r => Option(r.getString(3))).flatten.orNull, status,
        message.orNull))
      .toDF("id", "filename", "study_id", "status", "error_message")
      .withColumn("created_at", old.map(r => lit(r.getTimestamp(0))).getOrElse(now))
      .withColumn("updated_at", now)
      .withColumn("completed_at",
        if (status == "completed" || status == "failed") now
        else old.flatMap(r => Option(r.getTimestamp(1))).map(lit(_)).getOrElse(lit(null).cast("timestamp")))
      .select(Schemas.etlJobs.fieldNames.toSeq.map(col): _*)
    wh.replace("etl_jobs", existing.unionByName(row))
  }

  /** S10 point lookup. Malformed job ids short-circuit to None before any
    * table read — the reference's status edge validates UUID shape first
    * (`etl.service.ts:79-81`: `if (!isUuid(jobId)) return null`). */
  def jobStatus(jobId: String): Option[DataFrame] = {
    if (!Pipeline.isUuid(jobId)) return None
    val df = wh.read("etl_jobs", Schemas.etlJobs).filter(col("id") === jobId)
    if (df.isEmpty) None else Some(df)
  }
}

object Pipeline {
  final case class JobResult(jobId: String, status: String,
                             stagedRows: Long, processedRows: Long,
                             message: Option[String])

  // RFC-4122 textual shape, any version — same acceptance as the
  // reference's `isUuid` check at its status endpoint
  private val UuidRe =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$".r

  def isUuid(s: String): Boolean = s != null && UuidRe.matches(s)
}
