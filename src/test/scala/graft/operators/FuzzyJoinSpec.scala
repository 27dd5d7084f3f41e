package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Completeness + exactness pins for the deletion-neighborhood
  * edit-distance join: the blocked result must EQUAL brute force. */
class FuzzyJoinSpec extends SparkSpec {

  import spark.implicits._

  private def brute(rows: DataFrame, tau: Int): Set[(Long, Long, Int)] = {
    val a = rows.select(col("id").as("a_id"), col("s").as("sa"))
    val b = rows.select(col("id").as("b_id"), col("s").as("sb"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("dist", levenshtein(col("sa"), col("sb")))
      .filter(col("dist") <= tau)
      .select("a_id", "b_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private def blocked(rows: DataFrame, tau: Int): Set[(Long, Long, Int)] =
    FuzzyJoin.editDistanceSelfJoin(rows, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private val names = Seq(
    (0L, "kitten"), (1L, "sitten"), (2L, "sittin"),   // chained subs
    (3L, "kitte"),                                    // deletion
    (4L, "kittens"),                                  // insertion
    (5L, "ktiten"),                                   // transposition (= 2 ops)
    (6L, "mitten"), (7L, "bitten"),
    (8L, "completely-else"),
    (9L, ""), (10L, "a"), (11L, "ab"),                // short/empty band
    (12L, "kitten")                                   // exact dup of 0
  ).toDF("id", "s")

  test("tau=2 equals brute force (subs, indels, transpositions, dups)") {
    val got = blocked(names, 2)
    val want = brute(names, 2)
    assert(got == want)
    // sanity on content, not just set equality with another plan
    assert(got.contains((0L, 12L, 0)))   // exact duplicate
    assert(got.contains((0L, 1L, 1)))    // one substitution
    assert(got.contains((0L, 5L, 2)))    // transposition costs 2
    assert(got.contains((9L, 11L, 2)))   // "" vs "ab"
    assert(!got.exists { case (a, b, _) => a == 8L || b == 8L })
  }

  test("tau=1 equals brute force and excludes distance-2 pairs") {
    val got = blocked(names, 1)
    assert(got == brute(names, 1))
    assert(got.contains((0L, 1L, 1)) && !got.contains((0L, 5L, 2)))
  }

  test("maxLen guard excludes over-long strings from matching") {
    val withLong = names.unionByName(Seq(
      (13L, "kitten" + ("x" * 100)),       // over the guard, no match anyway
      (14L, "kittenx")                      // dist 1 from kitten, under guard
    ).toDF("id", "s"))
    val got = FuzzyJoin.editDistanceSelfJoin(withLong, 2, maxLen = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // the long row is filtered out; everything in-band is still exact
    assert(!got.exists { case (a, b, _) => a == 13L || b == 13L })
    assert(got.contains((0L, 14L, 1)))
    assert(got ==
      brute(withLong.filter(length(col("s")) <= 20), 2))
    intercept[IllegalArgumentException] {
      FuzzyJoin.editDistanceSelfJoin(names, 2, maxLen = 0)
    }
  }

  test("duplicate ids never produce self-pairs") {
    // dirty ER input: the same id appearing twice (even with different
    // strings) must not pair with itself — the member-array blocking
    // orders positionally, so only the strict a_id < b_id filter keeps
    // (id, id) pairs out (regression pin for the r8 blocking rewrite)
    val dirty = Seq(
      (0L, "kitten"), (0L, "kitten"),      // exact dup id + string
      (1L, "mitten"), (1L, "mittenx"),     // dup id, dist-1 strings
      (2L, "bitten")
    ).toDF("id", "s")
    val got = blocked(dirty, 2)
    assert(!got.exists { case (a, b, _) => a == b }, got)
    // cross-id pairs still found exactly once each
    assert(got.map { case (a, b, _) => (a, b) } ==
      Set((0L, 1L), (0L, 2L), (1L, 2L)))
  }

  test("partitioning-invariant; null ids and strings excluded") {
    val withNulls = names.unionByName(Seq(
      (null.asInstanceOf[java.lang.Long], "kitten"),
      (java.lang.Long.valueOf(13L), null.asInstanceOf[String])
    ).toDF("id", "s"))
    val got = FuzzyJoin.editDistanceSelfJoin(withNulls.repartition(7), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == blocked(names, 2))
    assert(!got.exists { case (a, b, _) => a == 13L || b == 13L })
  }
}
