package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, FirstEqualIndex, MinHashSignature,
  ParseLocaleNumber, SimHash64, SortedJaccard}

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
    e.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(tokens, k) - k-slot minhash of array<string> (k a literal)"),
      (args: Seq[Expression]) => {
        require(args.length == 2 && args(1).foldable,
          "minhash_signature(tokens, k): k must be a literal integer")
        MinHashSignature(args.head,
          args(1).eval().asInstanceOf[Number].intValue())
      }))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit simhash of array<string>"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    e.injectFunction((
      FunctionIdentifier("sorted_jaccard"),
      info("sorted_jaccard",
        "sorted_jaccard(a, b) - jaccard of two sorted array<long> hash sets"),
      (args: Seq[Expression]) => SortedJaccard(args.head, args(1))))
    e.injectFunction((
      FunctionIdentifier("first_equal_index"),
      info("first_equal_index",
        "first_equal_index(a, b) - first position where two array<long> agree, or -1"),
      (args: Seq[Expression]) => FirstEqualIndex(args.head, args(1))))
  }
}
