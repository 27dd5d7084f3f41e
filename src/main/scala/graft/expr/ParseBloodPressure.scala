package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the blood-pressure parser — the
  * codegen'd fast path for the semantics of reference
  * `etl-service/src/etl.py:42-55`:
  *
  *   "S/D" with exactly one '/', both parts optional-sign integers after
  *   trim, accepted only when 50<=S<=250 and 30<=D<=200; anything else
  *   (including out-of-bounds values like "300/80") yields NULL —
  *   both-or-neither.
  *
  * Returns `struct<systolic:int, diastolic:int>` or NULL. One evaluation
  * parses both components (the pure-column-algebra formulation in
  * [[ClinicalCols]] walks the string once per component), with a
  * zero-regex single-pass byte scanner shared by interpreted eval and
  * `doGenCode`. [[ClinicalColsPropSpec]] pins the two implementations to
  * each other and to a 1:1 reimplementation of the Python reference.
  */
case class ParseBloodPressure(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ParseBloodPressure.schema
  override def nullable: Boolean = true
  override def prettyName: String = "parse_bp"

  override def nullSafeEval(input: Any): Any =
    ParseBloodPressure.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val obj = ctx.addReferenceObj("parseBp", ParseBloodPressure,
      "graft.expr.ParseBloodPressure$")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        InternalRow ${ev.value} = null;
        if (!${childGen.isNull}) {
          ${ev.value} = $obj.parse(${childGen.value});
          ${ev.isNull} = ${ev.value} == null;
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): ParseBloodPressure =
    copy(child = newChild)
}

object ParseBloodPressure {

  val schema: StructType = StructType(Seq(
    StructField("systolic", IntegerType, nullable = false),
    StructField("diastolic", IntegerType, nullable = false)))

  /** Column wrapper: `bp_parsed(col)` -> struct or null. */
  def apply(c: Column): Column =
    ColumnBridge.toColumn(ParseBloodPressure(ColumnBridge.toExpression(c)))

  /** Single-pass parser over the UTF8 bytes; semantics pinned to the
    * reference (`split('/')` exactly two parts; per-part: trim, optional
    * sign, digits only; bounds check on both). */
  def parse(s: UTF8String): InternalRow = {
    if (s == null) return null
    val bytes = s.getBytes
    val slash = {
      var i = 0; var at = -1; var count = 0
      while (i < bytes.length) {
        if (bytes(i) == '/') { if (count == 0) at = i; count += 1 }
        i += 1
      }
      if (count != 1) return null
      at
    }
    val sys = parseIntPart(bytes, 0, slash)
    if (sys < 0 || sys < 50 || sys > 250) return null
    val dia = parseIntPart(bytes, slash + 1, bytes.length)
    if (dia < 0 || dia < 30 || dia > 200) return null
    new GenericInternalRow(Array[Any](sys, dia))
  }

  /** Parse bytes[from, until) as trim + [+-]? digits+; -1 when invalid.
    * (Valid BP components are positive, so -1 is a safe sentinel.) */
  private def parseIntPart(bytes: Array[Byte], from: Int, until: Int): Int = {
    var lo = from
    var hi = until
    while (lo < hi && isSpace(bytes(lo))) lo += 1
    while (hi > lo && isSpace(bytes(hi - 1))) hi -= 1
    if (lo >= hi) return -1
    var negative = false
    bytes(lo) match {
      case '+' => lo += 1
      case '-' => negative = true; lo += 1
      case _ =>
    }
    if (lo >= hi) return -1
    var v = 0L
    var i = lo
    while (i < hi) {
      val b = bytes(i)
      if (b < '0' || b > '9') return -1
      v = v * 10 + (b - '0')
      if (v > Int.MaxValue) return -1
      i += 1
    }
    if (negative) -1 else v.toInt
  }

  // space only, matching Spark's trim() and therefore [[ClinicalCols]];
  // Python's int() additionally strips \t etc. — deliberate, documented
  // deviation kept consistent across both engine implementations
  private def isSpace(b: Byte): Boolean = b == ' '
}
