package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed pins for ER survivorship: field vs record rules,
  * singleton passthrough, deterministic best-record ties. */
class GoldenRecordsSpec extends SparkSpec {

  import spark.implicits._

  private val records = Seq(
    // entity A = {1, 2, 3}: best by (score, id) is id 3 (score tie 2/3)
    (1L, "alpha", 5.0, "x"), (2L, "aleph", 9.0, "y"), (3L, "alef", 9.0, "z"),
    // entity B = {4, 5}
    (4L, "beta", 1.0, "p"), (5L, "bet", 2.0, "q"),
    // singleton 6: never clustered, survives as itself
    (6L, "gamma", 7.0, "s")
  ).toDF("id", "name", "score", "src")

  private val clusters = Seq(
    (1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L)
  ).toDF("doc_id", "comp_id")

  test("survivorship: min/max fields, best-record fields, singletons") {
    val got = GoldenRecords.merge(records, clusters, id = col("id"),
        priority = col("score"), minFields = Seq("name"),
        maxFields = Seq("score"), bestFields = Seq("src"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
        r.getDouble(3), r.getString(4)))).toMap
    assert(got == Map(
      1L -> ((3L, "alef", 9.0, "z")),   // score tie 2 vs 3 -> max id wins
      4L -> ((2L, "bet", 2.0, "q")),
      6L -> ((1L, "gamma", 7.0, "s")))) // singleton = its own entity
    // every input record is represented exactly once
    assert(got.values.map(_._1).sum == records.count())
  }

  test("survivorship is partitioning-invariant") {
    def run(parts: Int) = GoldenRecords.merge(records.repartition(parts),
        clusters, col("id"), col("score"), Seq("name"), Seq("score"),
        Seq("src"))
      .collect().map(_.toSeq).toSet
    assert(run(2) == run(7))
  }
}
