package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The six stored views (SURVEY §2.9), reference `database/08_views.sql`.
  *
  * Each is a named DataFrame transformation over `processed_measurements`;
  * `registerAll` also exposes them to `spark.sql` as temp views. `now` is a
  * parameter (default `current_timestamp()`) so the 30-day view is testable
  * — the only non-determinism in the reference's query library.
  */
object Views {

  /** v_study_quality (:1-4): AVG(quality_score) per study (AVG skips nulls). */
  def studyQuality(processed: DataFrame): DataFrame =
    processed.groupBy("study_id")
      .agg(avg("quality_score").as("avg_quality"))

  /** v_glucose_trend (:6-10): daily glucose average per participant. */
  def glucoseTrend(processed: DataFrame): DataFrame =
    processed
      .filter(col("measurement_type") === "glucose" && col("value_num").isNotNull)
      .groupBy(col("study_id"), col("participant_id"),
        to_date(col("measured_at")).as("day"))
      .agg(avg("value_num").as("avg_glucose"))

  /** v_counts_by_site (:12-15). */
  def countsBySite(processed: DataFrame): DataFrame =
    processed.groupBy("study_id", "site_id", "measurement_type")
      .agg(count(lit(1)).as("n"))

  /** v_low_quality (:17-20): quality_score present and below 0.95. */
  def lowQuality(processed: DataFrame): DataFrame =
    processed.filter(col("quality_score").isNotNull && col("quality_score") < 0.95)

  /** v_recent_30d (:22-25): measured within 30 days of `now`. */
  def recent30d(processed: DataFrame, now: Column = current_timestamp()): DataFrame =
    processed.filter(col("measured_at") >= now - expr("INTERVAL 30 DAYS"))

  /** v_participants_per_study (:27-30). */
  def participantsPerStudy(participants: DataFrame): DataFrame =
    participants.groupBy("study_id").agg(count(lit(1)).as("n_participants"))

  def registerAll(processed: DataFrame, participants: DataFrame): Unit = {
    studyQuality(processed).createOrReplaceTempView("v_study_quality")
    glucoseTrend(processed).createOrReplaceTempView("v_glucose_trend")
    countsBySite(processed).createOrReplaceTempView("v_counts_by_site")
    lowQuality(processed).createOrReplaceTempView("v_low_quality")
    recent30d(processed).createOrReplaceTempView("v_recent_30d")
    participantsPerStudy(participants).createOrReplaceTempView("v_participants_per_study")
  }
}
