package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe over a BROADCAST sketch —
  * the expression form of `udf(g => bloom.mightContainString(g))`,
  * which was the codebase's last UDF and the one black-box breaking
  * whole-stage codegen in the decontamination prefilter stage.
  *
  * The broadcast handle rides in the expression (task-serialized like
  * any captured broadcast); each probe hashes the UTF8String's UTF-8
  * bytes directly via `mightContainBinary` — semantically identical to
  * `mightContainString` (which is `mightContainBinary(s.getBytes(UTF_8))`)
  * but without materializing a java.lang.String per row, and without
  * leaving the generated code. NULL probes are false, matching the
  * UDF's null guard: a null gram cannot be a benchmark member.
  */
case class BloomMightContain(child: Expression,
                             bloom: Broadcast[BloomFilter])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_might_contain"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false
    else bloom.value.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val filterRef = ctx.addReferenceObj("bloomBcast", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    val bf = classOf[BloomFilter].getName
    ev.copy(
      code = childGen.code +
        code"""
        boolean ${ev.isNull} = false;
        boolean ${ev.value} = !${childGen.isNull} &&
          (($bf) $filterRef.value()).mightContainBinary(
            ${childGen.value}.getBytes());
      """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}

object BloomMightContain {
  /** Column API: does the broadcast Bloom filter probably contain the
    * string column's value? */
  def apply(c: Column, bloom: Broadcast[BloomFilter]): Column =
    Shim.column(BloomMightContain(Shim.expression(c), bloom))
}
