package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.schema.Schemas

/** Column algebra for the clinical value parsers.
  *
  * The reference implements these as per-row Python helpers
  * (`etl-service/src/etl.py:31-55`); here they are pure Catalyst column
  * expressions so the whole transform stays inside whole-stage codegen —
  * no UDFs, no per-row interpretation.
  */
object ClinicalCols {

  /** `to_decimal` (reference `etl.py:31-40`): trim; "" -> null; parse
    * failure -> null. `try_cast` to DECIMAL(14,4) is the exact Spark
    * analogue of the `Decimal(...) except InvalidOperation -> None` pattern. */
  def toDecimal(c: Column): Column =
    trim(c).try_cast(Schemas.ValueDecimal)

  /** Python `int(...)` semantics for one blood-pressure component: optional
    * sign + digits only after trim ("120.5" must NOT parse — SQL cast would
    * truncate it, Python `int()` raises). Reference `etl.py:48-50`. */
  private def strictInt(c: Column): Column = {
    val t = trim(c)
    // try_cast, not cast: whole-stage codegen's subexpression elimination
    // can evaluate the branch value eagerly, so ANSI cast would throw on
    // junk even behind the rlike guard
    when(t.rlike("^[+-]?[0-9]+$"), t.try_cast("int"))
  }

  /** Systolic component of `parse_bp` (reference `etl.py:42-55`): split on
    * "/", exactly two parts, both strict ints, and BOTH within plausibility
    * bounds (50..250 / 30..200) — both-or-neither. Null when invalid. */
  def bpSystolic(c: Column): Column = bpComponent(c, 0)

  /** Diastolic component; null unless the whole value is valid. */
  def bpDiastolic(c: Column): Column = bpComponent(c, 1)

  private def bpComponent(c: Column, idx: Int): Column = {
    val parts = split(c.cast("string"), "/", -1)
    // try_element_at: CSE evaluates these outside the size(parts)===2
    // short-circuit, so a plain element_at aborts ANSI jobs on "95.5"
    val p1 = strictInt(try_element_at(parts, lit(1)))
    val p2 = strictInt(try_element_at(parts, lit(2)))
    val valid = (size(parts) === 2) &&
      p1.isNotNull && p2.isNotNull &&
      p1.between(50, 250) && p2.between(30, 200)
    when(c.isNotNull && (c.cast("string") =!= "") && valid, if (idx == 0) p1 else p2)
  }

  /** ""-as-null normalization for `unit` (reference `etl.py:90,115`). */
  def normUnit(c: Column): Column =
    when(c.isNull || c === "", lit(null).cast("string")).otherwise(c)

  /** quality_score normalization (reference `etl.py:93,116`): ""/"null" ->
    * null, otherwise MUST parse as float — junk fails the whole job, which
    * the caller enforces with [[qualityScoreInvalid]] before applying this. */
  def normQualityScore(c: Column): Column =
    when(c.isNull || c.isin("", "null"), lit(null).cast("double"))
      .otherwise(c.try_cast("double"))

  /** True for values that would make the reference raise (`float(junk)`,
    * `etl.py:93` -> whole job fails, `etl.py:264-266`). */
  def qualityScoreInvalid(c: Column): Column =
    c.isNotNull && !c.isin("", "null") && c.try_cast("double").isNull
}
