package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.expr.ParseBloodPressure

/** Session extensions for the engine's native functions.
  *
  * Register with either
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`, after which
  * `parse_bp` is callable from SQL:
  *
  * {{{ SELECT parse_bp(value).systolic FROM staging }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("parse_bp"),
      new ExpressionInfo(classOf[ParseBloodPressure].getName, "parse_bp"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ParseBloodPressure(children.head)))
  }
}
