package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve distance of a 2-D cell as a NATIVE codegen expression.
  *
  * The engine first built this transform as chained `when` columns
  * ([[graft.operators.ZOrder.hilbertD2Chained]]) — correct, but the
  * per-level rotation references BOTH running coordinates twice, so the
  * expression tree (and the generated Java) grows ~3-4x per bit level.
  * At bits=4 that is a few hundred nodes: the janino compile + C2 JIT
  * of one bloated method dominated the gate's tiny data (the round-17
  * `scalar_hilbert` drift forensics measured the same plan swinging
  * 1.9-3.3 s run-to-run on clean-calibration windows while its sibling
  * `scalar_zorder` — a linear-sized interleave chain — held steady),
  * and at the 100 TB target the per-row cost of re-evaluating a
  * duplicated-subtree `when` cascade is strictly worse than one tight
  * loop. This expression keeps the whole iterative quadrant transform
  * (reflect+swap per bit level, high to low) in a static JVM method:
  * the generated code is one call, the loop JITs like any scalar
  * kernel, and whole-stage codegen fuses it with the surrounding
  * project. Output is bit-identical to the chained version — a spec
  * pins equality over full grids and random coordinates.
  */
case class HilbertD2Expr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ImplicitCastInputTypes {

  require(bits >= 1 && 2 * bits <= 62, s"bits out of range: $bits")

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_d2"

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertD2.compute(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.HilbertD2.compute($x, $y, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertD2Expr =
    copy(left = newLeft, right = newRight)
}

object HilbertD2 {

  /** The standard iterative quadrant transform (Hilbert 1891 curve,
    * d2xy/xy2d formulation): accumulate the quadrant's contribution at
    * each bit level, then rotate the frame — in the lower half (ry=0)
    * reflect when on the right (rx=1), then swap the axes. Same loop
    * the chained-column version and the DuckDB oracle's generated CTE
    * ladder (`Round10.hilbertStepsSql`) unroll. */
  def compute(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        val nx = if (rx == 1L) s - 1L - y else y
        val ny = if (rx == 1L) s - 1L - x else x
        x = nx
        y = ny
      }
      i -= 1
    }
    d
  }

  /** Column API: Hilbert distance of rank cell (x, y), each in
    * [0, 2^bits). */
  def apply(x: Column, y: Column, bits: Int): Column =
    Shim.column(HilbertD2Expr(
      Shim.expression(x.cast("long")), Shim.expression(y.cast("long")),
      bits))
}
