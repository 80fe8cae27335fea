package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of an `array<string>` token column in ONE pass.
  *
  * Replaces the composable SQL-lambda form —
  * `aggregate(transform(tokens, xxhash64), array_repeat(0L,64),
  *   (acc,h) -> zip_with(acc, transform(sequence(0,63), ...), _+_))`
  * — which allocates a 64-slot array per token per row through
  * interpreted higher-order functions. This expression is bit-identical:
  * per token, `xxhash64(w)` = `XXH64.hashUTF8String(w, 42L)`; each of
  * the 64 bits votes +1/-1 on a local vote array; output bit i is set
  * iff votes[i] > 0. One fused, whole-stage-codegen'd loop.
  *
  * Null semantics match the composable form: a NULL token array yields
  * 0L (the vote array is all-null, every `when(vote > 0)` falls to the
  * 0 branch); a null token hashes as "seed unchanged" (42), exactly as
  * XxHash64 skips null children.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash64"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h =
        if (arr.isNullAt(j)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      var i = 0
      while (i < 64) {
        if (((h >> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val xxh = classOf[XXH64].getName
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val votes = ctx.freshName("votes")
    val h = ctx.freshName("h")
    ev.copy(
      code = childGen.code +
        code"""
        boolean ${ev.isNull} = false;
        long ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          int $n = ${childGen.value}.numElements();
          int[] $votes = new int[64];
          for (int $j = 0; $j < $n; $j++) {
            long $h = ${childGen.value}.isNullAt($j)
              ? 42L : $xxh.hashUTF8String(${childGen.value}.getUTF8String($j), 42L);
            for (int $i = 0; $i < 64; $i++) {
              if ((($h >> $i) & 1L) == 1L) { $votes[$i]++; } else { $votes[$i]--; }
            }
          }
          for (int $i = 0; $i < 64; $i++) {
            if ($votes[$i] > 0) ${ev.value} |= (1L << $i);
          }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Column API: SimHash of a token array column. */
  def apply(tokens: Column): Column =
    Shim.column(SimHash64(Shim.expression(tokens)))
}
