package graft.etl

import graft.{Fixtures, SparkSpec}
import org.apache.spark.sql.functions._

/** Golden tests for the signature transform (G1-G3) pinned to the
  * reference semantics in `etl-service/src/etl.py:103-150`. */
class TransformSpec extends SparkSpec {

  private def processedFor(csv: String, name: String) = {
    val dir = tmpDir("transform")
    val path = writeCsv(dir, name, csv)
    val raw = Ingest.readCsv(spark, path)
    val staged = Stage.toStagingRows(Stage.assignRowIds(raw), "job-1", name)
    Transform.processedRows(staged)
  }

  test("valid BP splits into systolic+diastolic with forced mmHg unit") {
    val p = processedFor(Fixtures.study002, "study002.csv")
    val bp = p.filter(col("participant_id") === "P001" &&
      col("measurement_type").startsWith("blood_pressure")).collect()
    assert(bp.length == 2)
    val byType = bp.map(r => r.getAs[String]("measurement_type") ->
      r.getAs[java.math.BigDecimal]("value_num").doubleValue()).toMap
    assert(byType("blood_pressure_systolic") == 120.0)
    assert(byType("blood_pressure_diastolic") == 80.0)
    assert(bp.forall(_.getAs[String]("unit") == "mmHg"))
    assert(bp.forall(_.getAs[String]("value_text") == null))
  }

  test("both BP rows share the raw row id (lineage to the staged row)") {
    val p = processedFor(Fixtures.study002, "study002.csv")
    val rawIds = p.filter(col("measurement_type").startsWith("blood_pressure") &&
        col("participant_id") === "P002")
      .select("raw_row_id").distinct().count()
    assert(rawIds == 1)
  }

  test("malformed BP (wrong separator) falls through to ONE value_text row keeping its type") {
    val p = processedFor(Fixtures.badBp, "bad_bp.csv").collect()
    assert(p.length == 1)
    val r = p.head
    assert(r.getAs[String]("measurement_type") == "blood_pressure")
    assert(r.getAs[Any]("value_num") == null)
    assert(r.getAs[String]("value_text") == "120-80")
  }

  test("out-of-bounds BP (300/80) is malformed: both-or-neither, no partial split") {
    val p = processedFor(Fixtures.oobBp, "oob.csv").collect()
    assert(p.length == 1)
    assert(p.head.getAs[String]("value_text") == "300/80")
  }

  test("numeric value routes to value_num; non-numeric to value_text verbatim") {
    val p = processedFor(Fixtures.study001, "study001.csv")
    assert(p.filter(col("value_num").isNull).count() == 0) // all numeric
    val w = p.filter(col("measurement_type") === "weight").head()
    assert(w.getAs[java.math.BigDecimal]("value_num").doubleValue() == 70.25)
  }

  test("empty unit becomes null, quality 'null'/'' become null") {
    val p = processedFor(Fixtures.missingUnit, "missing_unit.csv").head()
    assert(p.getAs[String]("unit") == null)
    val s1 = processedFor(Fixtures.study001, "study001.csv")
    val nullQ = s1.filter(col("quality_score").isNull).count()
    assert(nullQ == 2) // cholesterol "" and height "null"
  }
}
