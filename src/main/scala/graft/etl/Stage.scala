package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.expr.ClinicalCols
import graft.schema.Schemas

/** Staging (G4 + S4 in SURVEY §2): assign file-order row numbers + row
  * UUIDs, normalize nulls, land in the staging table.
  *
  * Reference (`etl-service/src/etl.py:72-98`): `row_num = 1..n` in file
  * order, fresh `uuid4` per row, `unit` "" -> null, `quality_score`
  * ""/"null" -> null else float (junk raises -> job fails).
  *
  * File order at scale: `monotonically_increasing_id()` increases with byte
  * offset within each input split; the window below orders by it within
  * `input_file_name()`. For a single unsplit CSV this reproduces exact file
  * order; a CSV larger than `spark.sql.files.maxPartitionBytes` is split
  * into several partitions whose ordering Spark does not guarantee, so
  * [[Pipeline]] ingests one file per read (the reference's unit of work is
  * one file per job anyway, `main.py:47-69`).
  */
object Stage {

  /** Add `raw_id` + `row_num` (file order) to a validated ingest frame. */
  def assignRowIds(df: DataFrame): DataFrame = {
    val byFileOrder = Window
      .partitionBy(input_file_name())
      .orderBy(monotonically_increasing_id())
    df.withColumn("row_num", row_number().over(byFileOrder))
      .withColumn("raw_id", expr("uuid()"))
  }

  /** Project to the staging schema (typed, null-normalized). Fails the job
    * on junk quality_score, matching reference `etl.py:93` + `:264-266`. */
  def toStagingRows(df: DataFrame, jobId: String, filename: String): DataFrame = {
    val bad = df.filter(ClinicalCols.qualityScoreInvalid(col("quality_score"))).limit(1)
      .select("quality_score").collect()
    if (bad.nonEmpty)
      throw Ingest.ContractViolation(
        s"could not convert string to float: '${bad.head.getString(0)}'")
    df.select(
      col("raw_id").as("id"),
      lit(jobId).as("job_id"),
      lit(filename).as("source_filename"),
      col("row_num").cast("int").as("row_num"),
      col("study_id"),
      col("participant_id"),
      col("measurement_type"),
      col("value"),
      ClinicalCols.normUnit(col("unit")).as("unit"),
      to_timestamp(col("timestamp")).as("timestamp"),
      col("site_id"),
      ClinicalCols.normQualityScore(col("quality_score")).as("quality_score"))
  }

  /** S4: idempotent append on (job_id, source_filename, row_num). */
  def landInStaging(wh: Warehouse, stagingRows: DataFrame): Long =
    wh.appendIfAbsent("staging_clinical_measurements", Schemas.staging,
      stagingRows, Schemas.stagingKey, orderCol = "row_num")
}
