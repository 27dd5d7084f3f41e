package graft.schema

import org.apache.spark.sql.types._

/** Table schemas for the clinical measurement warehouse.
  *
  * Mirrors the reference DDL (`database/01..08_*.sql`) re-expressed as Spark
  * `StructType`s; columnar parquet at rest instead of row-oriented Postgres.
  *
  *  - measurement CSV ingest contract: reference `etl-service/src/etl.py:29`
  *    (required columns) + `etl.py:60` (all-string, "" is NOT null).
  *  - staging:   reference `database/02_staging_clinical_trials.sql`
  *  - processed: reference `database/05_processed_measurements.sql`
  *  - aggs:      reference `database/07_measurement_agg.sql`
  *  - quality:   reference `database/06_data_quality.sql`
  *  - jobs:      reference `database/01_etl_jobs.sql`
  */
object Schemas {

  /** Columns every ingest file must carry (reference `etl.py:29`). */
  val RequiredColumns: Seq[String] = Seq(
    "study_id", "participant_id", "measurement_type",
    "value", "unit", "timestamp", "site_id")

  /** Optional column defaulted to "" when absent (reference `etl.py:65-66`). */
  val OptionalColumns: Seq[String] = Seq("quality_score")

  /** All-string schema for schema-on-read ingest with late typing
    * (reference reads every column as `str`, `etl.py:60`). */
  val measurementCsv: StructType = StructType(
    (RequiredColumns ++ OptionalColumns).map(StructField(_, StringType, nullable = true)))

  /** Measurement types that must carry a unit (reference `etl.py:17`). */
  val RequiredUnitTypes: Seq[String] =
    Seq("glucose", "cholesterol", "weight", "height", "blood_pressure")

  /** Plausibility ranges per measurement type (reference `etl.py:18-26`).
    * `blood_pressure_1/_2` are the systolic/diastolic bounds used by the
    * BP parser, not match-able raw measurement types. */
  val Ranges: Seq[(String, BigDecimal, BigDecimal)] = Seq(
    ("glucose",          BigDecimal(40), BigDecimal(400)),
    ("cholesterol",      BigDecimal(50), BigDecimal(400)),
    ("weight",           BigDecimal(1),  BigDecimal(400)),
    ("height",           BigDecimal(30), BigDecimal(300)),
    ("heart_rate",       BigDecimal(20), BigDecimal(240)),
    ("blood_pressure_1", BigDecimal(50), BigDecimal(250)),
    ("blood_pressure_2", BigDecimal(30), BigDecimal(200)))

  val ValueDecimal: DecimalType = DecimalType(14, 4)
  val QualityDecimal: DecimalType = DecimalType(3, 2)

  val staging: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),              // UUID
    StructField("job_id", StringType, nullable = false),
    StructField("source_filename", StringType, nullable = false),
    StructField("row_num", IntegerType, nullable = false),
    StructField("study_id", StringType, nullable = false),
    StructField("participant_id", StringType, nullable = true),
    StructField("measurement_type", StringType, nullable = true),
    StructField("value", StringType, nullable = true),
    StructField("unit", StringType, nullable = true),             // "" -> null
    StructField("timestamp", TimestampType, nullable = true),
    StructField("site_id", StringType, nullable = true),
    StructField("quality_score", DoubleType, nullable = true)))   // ""/"null" -> null

  /** Unique key of the staging sink, `ON CONFLICT ... DO NOTHING`
    * (reference `02_staging_clinical_trials.sql:22`). */
  val stagingKey: Seq[String] = Seq("job_id", "source_filename", "row_num")

  val processed: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("study_id", StringType, nullable = false),
    StructField("participant_id", StringType, nullable = true),
    StructField("site_id", StringType, nullable = true),
    StructField("measurement_type", StringType, nullable = true),
    StructField("measured_at", TimestampType, nullable = true),
    StructField("value_num", ValueDecimal, nullable = true),
    StructField("value_text", StringType, nullable = true),
    StructField("unit", StringType, nullable = true),
    StructField("quality_score", DoubleType, nullable = true),
    StructField("raw_row_id", StringType, nullable = true),
    StructField("job_id", StringType, nullable = false)))

  /** Cross-job observation identity, `uq_pm_obs`
    * (reference `05_processed_measurements.sql:19`). */
  val processedKey: Seq[String] =
    Seq("study_id", "participant_id", "measurement_type", "measured_at", "site_id")

  val studies: StructType = StructType(Seq(
    StructField("study_id", StringType, nullable = false)))

  val participants: StructType = StructType(Seq(
    StructField("study_id", StringType, nullable = false),
    StructField("participant_id", StringType, nullable = false),
    StructField("site_id", StringType, nullable = true)))

  val aggregations: StructType = StructType(Seq(
    StructField("study_id", StringType, nullable = false),
    StructField("participant_id", StringType, nullable = true),
    StructField("site_id", StringType, nullable = true),
    StructField("measurement_type", StringType, nullable = true),
    StructField("cnt", LongType, nullable = false),
    StructField("avg_num", ValueDecimal, nullable = true),
    StructField("min_num", ValueDecimal, nullable = true),
    StructField("max_num", ValueDecimal, nullable = true),
    StructField("job_id", StringType, nullable = false)))

  /** Merge key of the rollup sink, `uq_ma_daily`
    * (reference `07_measurement_agg.sql:13` — despite the name there is no
    * day column; the reference groups without it, `etl.py:211`). */
  val aggregationKey: Seq[String] =
    Seq("study_id", "participant_id", "site_id", "measurement_type")

  val qualityReports: StructType = StructType(Seq(
    StructField("job_id", StringType, nullable = false),
    StructField("rule_name", StringType, nullable = false),
    StructField("severity", StringType, nullable = false),
    StructField("affected_rows", LongType, nullable = false)))

  val etlJobs: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("filename", StringType, nullable = true),
    StructField("study_id", StringType, nullable = true),
    StructField("status", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = true),
    StructField("updated_at", TimestampType, nullable = true),
    StructField("completed_at", TimestampType, nullable = true),
    StructField("error_message", StringType, nullable = true)))
}
