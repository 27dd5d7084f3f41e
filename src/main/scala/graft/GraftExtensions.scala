package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.expr.{ParseBloodPressure, PolyFingerprint, RpBits, RpProject, VecDot, VecDotInt, VecNorm, WordShingles}

/** Session extensions for the engine's native functions.
  *
  * Register with either
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`, after which the
  * whole native-expression surface is callable from SQL:
  *
  * {{{
  * SELECT parse_bp(value).systolic        FROM staging
  * SELECT vec_dot(a.embedding, b.embedding) / (vec_norm(a.embedding) * vec_norm(b.embedding))
  * SELECT word_shingles(text, 3), poly_fingerprint(text), rp_bits(embedding, 64, 8)
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** A function argument that must be a literal INT (shingle size, dims,
    * plane counts — plan-shape parameters, not data). */
  private def intArg(fn: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT argument, got $other")
  }

  override def apply(extensions: SparkSessionExtensions): Unit = {
    def inject(name: String, builder: Seq[Expression] => Expression): Unit =
      extensions.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))

    inject("parse_bp", ch => ParseBloodPressure(ch.head))
    inject("vec_dot", ch => VecDot(ch(0), ch(1)))
    inject("vec_dot_int", ch => VecDotInt(ch(0), ch(1)))
    inject("vec_norm", ch => VecNorm(ch.head))
    inject("poly_fingerprint", ch => PolyFingerprint(ch.head))
    inject("word_shingles", ch =>
      WordShingles(ch(0), intArg("word_shingles", ch(1))))
    inject("rp_bits", ch =>
      RpBits(ch(0), intArg("rp_bits", ch(1)), intArg("rp_bits", ch(2))))
    inject("rp_project", ch =>
      RpProject(ch(0), intArg("rp_project", ch(1)),
        intArg("rp_project", ch(2))))

    // whole-operator extension: the native as-of join physical operator
    extensions.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}
