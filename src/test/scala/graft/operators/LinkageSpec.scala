package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact pins for Fellegi–Sunter scoring: agreement bits (incl. the
  * null "no decision" cell), weight sums, band cutoffs, custom
  * agreement predicates. */
class LinkageSpec extends SparkSpec {

  import spark.implicits._
  import Linkage.LinkField

  private val records = Seq(
    (1L, "ann", 10, 100.0), (2L, "ann", 10, 150.0),
    (3L, "bob", 20, 200.0), (4L, null.asInstanceOf[String], 10, 100.0))
    .toDF("id", "name", "nation", "bal")

  private val fields = Seq(
    LinkField("name", 2000, -500),
    LinkField("nation", 1000, -1500),
    LinkField("bal", 800, -300, (a, b) => abs(a - b) <= 60.0))

  private def run(pairs: Seq[(Long, Long)]) =
    Linkage.score(records, pairs.toDF("a_id", "b_id"), col("id"),
        fields, linkAt = 3000, possibleAt = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Int]),
        Option(r.get(3)).map(_.asInstanceOf[Int]),
        Option(r.get(4)).map(_.asInstanceOf[Int]),
        r.getLong(5), r.getString(6))).toSet

  test("bits, exact scores, and bands") {
    assert(run(Seq((1L, 2L), (1L, 3L), (2L, 3L))) == Set(
      // all three fields agree: 2000 + 1000 + 800 = 3800 -> link
      (1L, 2L, Some(1), Some(1), Some(1), 3800L, "link"),
      // all disagree: -500 - 1500 - 300 = -2300 -> nonlink
      (1L, 3L, Some(0), Some(0), Some(0), -2300L, "nonlink"),
      // name/nation disagree, bal within 60: -500 - 1500 + 800 -> nonlink
      (2L, 3L, Some(0), Some(0), Some(1), -1200L, "nonlink")))
  }

  test("missing field: null bit, zero weight (the F-S no-decision cell)") {
    assert(run(Seq((1L, 4L))) == Set(
      // name null -> 0; nation agree +1000; bal equal +800 -> possible
      (1L, 4L, None, Some(1), Some(1), 1800L, "possible")))
  }

  test("misconfiguration rejected") {
    intercept[IllegalArgumentException] {
      Linkage.score(records, Seq((1L, 2L)).toDF("a_id", "b_id"),
        col("id"), Seq.empty, 1, 0)
    }
    intercept[IllegalArgumentException] {
      Linkage.score(records, Seq((1L, 2L)).toDF("a_id", "b_id"),
        col("id"), fields, linkAt = 0, possibleAt = 10)
    }
  }
}
