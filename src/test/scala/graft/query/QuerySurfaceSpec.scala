package graft.query

import graft.{Fixtures, SparkSpec}
import graft.etl.{Ingest, Pipeline, Stage, Transform, Warehouse}
import graft.schema.Schemas
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The /api/data dynamic-filter surface (3.B) and the six views (§2.9). */
class QuerySurfaceSpec extends SparkSpec {

  private lazy val wh: Warehouse = {
    val w = new Warehouse(spark, tmpDir("whq").toString)
    val pipe = new Pipeline(spark, w)
    val dir = tmpDir("dataq")
    pipe.processJob("j-1", writeCsv(dir, "study001.csv", Fixtures.study001))
    pipe.processJob("j-2", writeCsv(dir, "study002.csv", Fixtures.study002))
    w
  }
  private lazy val staging = wh.read("staging_clinical_measurements", Schemas.staging)
  private lazy val processed = wh.read("processed_measurements", Schemas.processed)

  test("dynamic filters compose conjunctively; absent filters don't constrain") {
    val all = Measurements.query(staging, Measurements.Filters())
    assert(all.count() == 10)
    val one = Measurements.query(staging, Measurements.Filters(
      studyId = Some("STUDY001"), measurementType = Some("glucose")))
    assert(one.count() == 3)
    val ranged = Measurements.query(staging, Measurements.Filters(
      startDate = Some(Timestamp.valueOf("2024-02-01 00:00:00"))))
    assert(ranged.count() == 4) // study002 rows only
  }

  test("results are time-desc capped, raw strings from STAGING (not processed)") {
    val r = Measurements.query(staging, Measurements.Filters(), limit = 3).collect()
    assert(r.length == 3)
    val ts = r.map(_.getAs[Timestamp]("timestamp").getTime)
    assert(ts.sameElements(ts.sorted.reverse))
    // staging keeps the raw packed BP string — the reference queries staging
    val bp = Measurements.query(staging,
      Measurements.Filters(measurementType = Some("blood_pressure"))).collect()
    assert(bp.forall(_.getAs[String]("value").contains("/")))
  }

  test("camelCase DTO projection") {
    val dto = Measurements.toDto(Measurements.query(staging, Measurements.Filters()))
    assert(dto.columns.toSet.contains("studyId"))
    assert(dto.columns.toSet.contains("qualityScore"))
  }

  test("v_glucose_trend: daily per-participant averages") {
    val t = Views.glucoseTrend(processed)
    val p001 = t.filter(col("participant_id") === "P001").collect()
    assert(p001.length == 2) // two days
    val jan15 = p001.find(_.getAs[java.sql.Date]("day").toString == "2024-01-15").get
    assert(jan15.getAs[java.math.BigDecimal]("avg_glucose").doubleValue() == 95.5)
  }

  test("v_study_quality averages skip nulls; v_low_quality filters below 0.95") {
    val q = Views.studyQuality(processed).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("avg_quality")).toMap
    // STUDY001: (0.98+0.97+0.99+0.95)/4 — null cholesterol/height skipped
    assert(math.abs(q("STUDY001") - 0.9725) < 1e-9)
    val low = Views.lowQuality(processed)
    assert(low.filter(col("quality_score") >= 0.95).isEmpty)
    assert(low.filter(col("quality_score").isNull).isEmpty)
  }

  test("v_recent_30d with a pinned clock; v_counts_by_site; v_participants_per_study") {
    val recent = Views.recent30d(processed,
      lit("2024-02-15 00:00:00").cast("timestamp"))
    assert(recent.count() == 7) // study002 (Feb 1) + the Jan-16 glucose row
    val counts = Views.countsBySite(processed)
    assert(counts.filter(col("study_id") === "STUDY002" &&
      col("measurement_type") === "blood_pressure_systolic").head().getAs[Long]("n") == 2)
    val pps = Views.participantsPerStudy(wh.read("participants", Schemas.participants))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_participants")).toMap
    assert(pps == Map("STUDY001" -> 3L, "STUDY002" -> 2L))
  }
}
