package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The `/api/data` query surface (SURVEY §3.B), reference
  * `api-service/src/services/database.service.ts:94-150`.
  *
  * The reference builds SQL by string concatenation, one `AND` per present
  * filter, over the STAGING table (raw string values — faithfully
  * preserved), capped `ORDER BY timestamp DESC LIMIT 1000`. Here the same
  * dynamic conjunctive filter folds over the DataFrame; Catalyst pushes
  * every equality and the time range into the parquet scan, and the
  * order+limit plans as `TakeOrderedAndProject` (true top-k — no global
  * sort even at cluster scale).
  */
object Measurements {

  final case class Filters(
    studyId: Option[String] = None,
    participantId: Option[String] = None,
    measurementType: Option[String] = None,
    startDate: Option[Timestamp] = None,
    endDate: Option[Timestamp] = None)

  val ResultCap = 1000 // database.service.ts:134

  def query(staging: DataFrame, f: Filters, limit: Int = ResultCap): DataFrame = {
    val conds = Seq(
      f.studyId.map(col("study_id") === _),
      f.participantId.map(col("participant_id") === _),
      f.measurementType.map(col("measurement_type") === _),
      f.startDate.map(col("timestamp") >= _),
      f.endDate.map(col("timestamp") <= _)).flatten
    conds.foldLeft(staging)((d, c) => d.filter(c))
      .orderBy(col("timestamp").desc)
      .limit(limit)
  }

  /** P10: snake_case -> camelCase DTO projection at the API edge
    * (reference `database.service.ts:138-149`). */
  def toDto(rows: DataFrame): DataFrame = rows.select(
    col("id"),
    col("study_id").as("studyId"),
    col("participant_id").as("participantId"),
    col("measurement_type").as("measurementType"),
    col("value"),
    col("unit"),
    col("timestamp"),
    col("site_id").as("siteId"),
    col("quality_score").as("qualityScore"))
}
