package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Argmin-L2 codebook assignment of an `array<double>` subvector as ONE
  * native expression — the product-quantizer encode/assign kernel.
  *
  * The composable form builds `greatest()` over ksub `struct(-dist,
  * -code)` literals, each dist an interpreted `aggregate(zip_with(...))`
  * that allocates an intermediate array per code per row; at m·ksub
  * codes the expression tree alone is hundreds of nodes per subspace
  * (unrolling it into scalar arithmetic is WORSE: measured 3x slower
  * when the node count blew the generated-code budget and the plan fell
  * out of whole-stage codegen). This expression is two tight loops over
  * a primitive `double[]` codebook held as a codegen reference object —
  * the whole argmin costs ksub·subDim fused multiply-adds per row with
  * zero allocation.
  *
  * Exact same selection as the struct-greatest formulation on finite
  * input: distances accumulate left-to-right from 0.0, a strictly
  * smaller distance wins, ties keep the smaller code. (The formulations
  * differ only on NaN distances — struct ordering ranks NaN above
  * +Infinity so greatest would PREFER a NaN-distance code; this kernel
  * never selects one unless every distance is NaN. Embedding corpora
  * carry no NaNs; the sane semantics win.)
  *
  * `book` is the flattened `ksub x subDim` codebook. Null in, null out.
  */
case class NearestCode(child: Expression, book: Array[Double],
                       ksub: Int, subDim: Int) extends UnaryExpression {
  require(book.length == ksub * subDim,
    s"codebook length ${book.length} != ksub $ksub x subDim $subDim")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_code"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < ksub) {
      val off = c * subDim
      var acc = 0.0
      var j = 0
      while (j < subDim) {
        val d = v.getDouble(j) - book(off + j)
        acc += d * d
        j += 1
      }
      if (acc < bestD) { bestD = acc; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bookRef = ctx.addReferenceObj("book", book, "double[]")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
        int $best = 0;
        double $bestD = Double.POSITIVE_INFINITY;
        for (int $c = 0; $c < $ksub; $c++) {
          int $off = $c * $subDim;
          double $acc = 0.0;
          for (int $j = 0; $j < $subDim; $j++) {
            double $d = $v.getDouble($j) - $bookRef[$off + $j];
            $acc += $d * $d;
          }
          if ($acc < $bestD) { $bestD = $acc; $best = $c; }
        }
        ${ev.value} = $best;
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): NearestCode = copy(child = newChild)
}

object NearestCode {
  /** Column API: the nearest codebook row (0-based) for a subvector. */
  def nearest(subvec: Column, book: Seq[Seq[Double]]): Column = {
    require(book.nonEmpty && book.forall(_.length == book.head.length),
      "codebook must be rectangular")
    Shim.column(NearestCode(
      Shim.expression(subvec.cast("array<double>")),
      book.flatten.toArray, book.length, book.head.length))
  }
}
