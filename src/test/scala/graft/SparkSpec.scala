package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** Shared session + fixture helpers for all suites (one JVM-wide session
  * keeps the suite under a minute). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def tmpDir(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }
  def writeCsv(dir: Path, name: String, content: String): String = {
    val f = dir.resolve(name)
    Files.writeString(f, content)
    f.toString
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

/** Reference-shaped CSV fixtures (see FIXTURES.md; values hand-authored to
  * the same contract: header row, ISO-8601 Z timestamps, ""-blank fields). */
object Fixtures {
  val header = "study_id,participant_id,measurement_type,value,unit,timestamp,site_id,quality_score"

  /** Happy path: 6 rows, numeric types, 3 participants, 1 site. */
  val study001: String =
    s"""$header
       |STUDY001,P001,glucose,95.5,mg/dL,2024-01-15T09:30:00Z,SITE_A,0.98
       |STUDY001,P001,glucose,101.2,mg/dL,2024-01-16T09:30:00Z,SITE_A,0.97
       |STUDY001,P002,glucose,110.0,mg/dL,2024-01-15T10:00:00Z,SITE_A,0.99
       |STUDY001,P002,cholesterol,180.5,mg/dL,2024-01-15T10:05:00Z,SITE_A,
       |STUDY001,P003,weight,70.25,kg,2024-01-15T11:00:00Z,SITE_A,0.95
       |STUDY001,P003,height,175.0,cm,2024-01-15T11:01:00Z,SITE_A,null
       |""".stripMargin

  /** Blood pressure: valid splits + heart rate. */
  val study002: String =
    s"""$header
       |STUDY002,P001,blood_pressure,120/80,mmHg,2024-02-01T08:00:00Z,SITE_B,0.96
       |STUDY002,P001,heart_rate,72,bpm,2024-02-01T08:01:00Z,SITE_B,0.98
       |STUDY002,P002,blood_pressure,135/90,mmHg,2024-02-01T09:00:00Z,SITE_B,0.93
       |STUDY002,P002,weight,82.5,kg,2024-02-01T09:01:00Z,SITE_B,
       |""".stripMargin

  /** Wrong separator -> malformed rule + value_text fallthrough. */
  val badBp: String =
    s"""$header
       |STUDYX,P001,blood_pressure,120-80,mmHg,2024-03-01T08:00:00Z,SITE_X,0.9
       |""".stripMargin

  /** Out-of-bounds BP counts as malformed, not out-of-range. */
  val oobBp: String =
    s"""$header
       |STUDYX,P001,blood_pressure,300/80,mmHg,2024-03-01T08:00:00Z,SITE_X,0.9
       |""".stripMargin

  /** Blank unit on a unit-required type. */
  val missingUnit: String =
    s"""$header
       |STUDYY,P001,glucose,100.0,,2024-03-02T08:00:00Z,SITE_X,0.9
       |""".stripMargin

  /** Numeric out of range (glucose 1000 > 400), still lands in processed. */
  val outOfRange: String =
    s"""$header
       |STUDYZ,P001,glucose,1000,mg/dL,2024-03-03T08:00:00Z,SITE_X,0.9""".stripMargin // no trailing newline, like the reference fixture

  /** Junk quality_score -> whole job must fail. */
  val junkQuality: String =
    s"""$header
       |STUDYQ,P001,glucose,100.0,mg/dL,2024-03-04T08:00:00Z,SITE_X,abc
       |""".stripMargin

  /** Blank study_id -> whole file rejected. */
  val blankStudy: String =
    s"""$header
       |,P001,glucose,100.0,mg/dL,2024-03-05T08:00:00Z,SITE_X,0.9
       |""".stripMargin

  /** Missing required column (no site_id). */
  val missingColumn: String =
    """study_id,participant_id,measurement_type,value,unit,timestamp,quality_score
      |STUDYM,P001,glucose,100.0,mg/dL,2024-03-06T08:00:00Z,0.9
      |""".stripMargin
}
