package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-unigram Shannon entropy (nats, 4-dp floor-rounded) in ONE
  * fused pass: H = ln L − (Σ_c n_c·ln n_c) / L over code-point counts.
  *
  * Replaces the composable SQL-lambda form —
  * `aggregate(filter(array_distinct(split(c,'')), ...), ...)` with a
  * per-distinct-char `replace` length-diff — which materializes a
  * one-char-string array per row and rescans the string once per
  * DISTINCT character (O(|alphabet|·L) with interpreted higher-order
  * lambdas). This expression decodes code points straight off the
  * UTF8String bytes into a count table: O(L), no arrays, whole-stage
  * codegen.
  *
  * Counts are per CODE POINT (ASCII fast path + overflow map), exactly
  * DuckDB's `string_split(text,'')`/`length()` semantics — on ASCII
  * corpora identical to the lambda form (pinned by the spec); on
  * supplementary-plane text the lambda form splits UTF-16 surrogate
  * halves while this one counts true code points. Empty string → 0.0;
  * null in, null out (the column wrapper coalesces to 0.0 for the
  * operator's blank-guard contract).
  */
case class CharEntropy(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropy.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  /** Static single kernel shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Double = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0.0
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Array[Int]] = null
    var total = 0L
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xff
      var cp = b
      var len = 1
      if (b >= 0xf0) { cp = b & 0x07; len = 4 }
      else if (b >= 0xe0) { cp = b & 0x0f; len = 3 }
      else if (b >= 0xc0) { cp = b & 0x1f; len = 2 }
      var j = 1
      while (j < len && i + j < n) {
        cp = (cp << 6) | (bytes(i + j) & 0x3f)
        j += 1
      }
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Array[Int]]()
        val slot = other.computeIfAbsent(cp, _ => new Array[Int](1))
        slot(0) += 1
      }
      total += 1
      i += len
    }
    var sum = 0.0
    var c = 0
    while (c < 128) {
      val k = ascii(c)
      if (k > 0) sum += k * math.log(k.toDouble)
      c += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val k = it.next()(0)
        sum += k * math.log(k.toDouble)
      }
    }
    val h = math.log(total.toDouble) - sum / total
    math.floor(h * 10000.0 + 0.5) / 10000.0
  }

  def apply(c: Column): Column =
    Shim.column(CharEntropy(Shim.expression(c)))
}
