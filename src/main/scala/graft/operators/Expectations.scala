package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the Deequ / Great
  * Expectations kernel: a constraint set over a table evaluated in ONE
  * aggregate pass, reported one row per expectation. The reference's
  * quality rules (`etl/Quality`) are a fixed instance of this shape;
  * this is the general operator a pipeline gates its loads on.
  *
  * Scale shape: every expectation compiles to a conditional aggregate
  * over the SAME single scan — one job, map-side partial aggregation,
  * no per-expectation passes. `Unique` adds a distinct aggregate
  * (Spark rewrites multi-distinct through one Expand of the scan — still
  * a single pass of the data, at distinct-count shuffle cost); the
  * other kinds are plain conditional counts. The result is one 1-row
  * aggregate melted to (expectation, observed, total, passed) rows —
  * bounded metadata, |expectations| rows.
  *
  * All observations are exact integers, so a SQL oracle replays the
  * report bit-for-bit. `observed` semantics per kind: NotNull = null
  * count; Unique = duplicate surplus among non-null values
  * (count(non-null) - count(distinct)); InRange / InSet = violating
  * non-null count (nulls are NotNull's job); RowCountBetween = the row
  * count itself. `passed` = observed == 0, except RowCountBetween where
  * it is lo <= observed <= hi. */
object Expectations {

  sealed trait Expectation { def name: String }
  final case class NotNull(name: String, column: String) extends Expectation
  final case class Unique(name: String, column: String) extends Expectation
  final case class InRange(name: String, column: String,
                           lo: Long, hi: Long) extends Expectation
  final case class InSet(name: String, column: String,
                         values: Seq[String]) extends Expectation
  final case class RowCountBetween(name: String, lo: Long,
                                   hi: Long) extends Expectation

  def evaluate(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "no expectations given")
    require(expectations.map(_.name).distinct.size == expectations.size,
      s"expectation names must be unique: ${expectations.map(_.name)}")
    val total = count(lit(1)).as("__total")
    val obs: Seq[Column] = expectations.zipWithIndex.map { case (e, i) =>
      (e match {
        case NotNull(_, c) =>
          sum(when(col(c).isNull, 1L).otherwise(0L))
        case Unique(_, c) =>
          sum(when(col(c).isNotNull, 1L).otherwise(0L)) -
            countDistinct(col(c))
        case InRange(_, c, lo, hi) =>
          sum(when(col(c).isNotNull &&
            (col(c) < lit(lo) || col(c) > lit(hi)), 1L).otherwise(0L))
        case InSet(_, c, vs) =>
          sum(when(col(c).isNotNull && !col(c).isInCollection(vs), 1L)
            .otherwise(0L))
        case RowCountBetween(_, _, _) =>
          count(lit(1))
      }).cast("long").as(s"__o$i")
    }
    val agg = df.agg(total, obs: _*)
    // melt the 1-row aggregate: each expectation's observation + verdict
    // as a plan-side struct array (bounded metadata, no second scan)
    val rows = expectations.zipWithIndex.map { case (e, i) =>
      val o = coalesce(col(s"__o$i"), lit(0L)) // empty input: sums are null
      val passed = e match {
        case RowCountBetween(_, lo, hi) => o >= lit(lo) && o <= lit(hi)
        case _ => o === lit(0L)
      }
      struct(lit(e.name).as("expectation"), o.as("observed"),
        col("__total").as("total"), passed.as("passed"))
    }
    agg.select(explode(array(rows: _*)).as("r"))
      .select(col("r.expectation"), col("r.observed"), col("r.total"),
        col("r.passed"))
  }
}
