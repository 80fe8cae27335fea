package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, ParseLocaleNumber}

/** Session extension registering the engine's native expressions for SQL:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   // or .withExtensions(new GraftExtensions)
  * }}}
  *
  * makes `locale_num(col)` and `dot_product(a, b)` available to
  * `spark.sql(...)` on every session of the application — the supported
  * injection point (vs the per-session temp registration in
  * [[graft.functions.GraftFunctions.register]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("locale_num"),
      info("locale_num", "locale_num(str) - locale-tolerant numeric parse"),
      (args: Seq[Expression]) => ParseLocaleNumber(args.head)))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - fused array<double> dot product"),
      (args: Seq[Expression]) => DotProduct(args.head, args(1))))
  }
}
