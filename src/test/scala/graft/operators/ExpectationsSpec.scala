package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** One-pass expectation evaluation pinned against hand-counted
  * fixtures: each kind's `observed` semantics, pass/fail verdicts, the
  * empty-input degenerate case, and the single-job plan claim. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations._

  private val d = Seq(
    (Some(1L), Some("O"), Some(10L)),
    (Some(1L), Some("F"), Some(700L)),   // dup key, price too high
    (Some(2L), Some("X"), Some(-5L)),    // unknown status, price too low
    (None, Some("O"), None),             // null key, null price
    (Some(3L), None, Some(50L))          // null status (InSet ignores)
  ).toDF("k", "status", "price")

  private val exps = Seq(
    NotNull("k_not_null", "k"),
    Unique("k_unique", "k"),
    InRange("price_range", "price", 0L, 500L),
    InSet("status_known", "status", Seq("O", "F", "P")),
    RowCountBetween("rows", 1L, 4L))

  test("each kind's observed count and verdict match the hand count") {
    val got = Expectations.evaluate(d, exps).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(got("k_not_null") == ((1L, 5L, false)))   // one null key
    assert(got("k_unique") == ((1L, 5L, false)))     // 4 non-null, 3 distinct
    assert(got("price_range") == ((2L, 5L, false)))  // 700 and -5; null skipped
    assert(got("status_known") == ((1L, 5L, false))) // 'X'; null skipped
    assert(got("rows") == ((5L, 5L, false)))         // 5 outside [1, 4]
    val clean = Expectations.evaluate(d.filter(col("k") === 3L), exps)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(clean.values.forall(identity))
  }

  test("empty input: violation kinds pass vacuously, row-count gate fails") {
    val got = Expectations.evaluate(d.filter(lit(false)), exps).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(got("k_not_null") == ((0L, 0L, true)))
    assert(got("k_unique") == ((0L, 0L, true)))
    assert(got("rows") == ((0L, 0L, false)))         // below the floor
  }

  test("duplicate expectation names are rejected") {
    intercept[IllegalArgumentException] {
      Expectations.evaluate(d, Seq(NotNull("a", "k"), NotNull("a", "status")))
    }
  }

  test("the report is one aggregate pass over one scan") {
    val p = Expectations.evaluate(d, exps)
      .queryExecution.executedPlan.toString
    // one scan feeds everything: a per-expectation pass would show one
    // LocalTableScan/scan per constraint
    assert("LocalTableScan".r.findAllIn(p).size <= 2, p)
  }
}
