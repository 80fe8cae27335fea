package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** MinHash signature of an `array<string>` shingle column in ONE pass.
  *
  * The composable form —
  * `array((0 until k).map(i => array_min(transform(sh, x => xxhash64(x, lit(i))))))`
  * — re-traverses the shingle array k times through interpreted
  * higher-order lambdas; at k=64 that was 59% of the whole sf0.1 bench.
  *
  * This expression is bit-identical to that form (so LSH candidate sets
  * are unchanged) but factors the hash family the way `xxhash64(x, lit(i))`
  * actually composes: Spark chains child hashes, so
  * `xxhash64(x, lit(i)) == XXH64.hashInt(i, XXH64.hashUTF8String(x, 42L))`.
  * The expensive string hash is computed once per shingle; the k family
  * members are k cheap integer avalanche steps, all inside one fused,
  * whole-stage-codegen'd loop updating a k-slot running-min array.
  *
  * Null semantics match the composable form exactly: a NULL or empty
  * input array yields an array of k nulls (CreateArray of null
  * array_min results is a non-null array, never NULL); a null shingle
  * element hashes as "seed unchanged" (base = 42), exactly as Spark's
  * XxHash64 skips null children.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_signature"

  private def allNulls: GenericArrayData =
    new GenericArrayData(new Array[Any](numHashes))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return allNulls
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return allNulls
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val base =
        if (arr.isNullAt(j)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashInt(i, base)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val xxh = classOf[XXH64].getName
    val gad = classOf[GenericArrayData].getName
    val uad = classOf[UnsafeArrayData].getName
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val mins = ctx.freshName("mins")
    val base = ctx.freshName("base")
    val h = ctx.freshName("h")
    ev.copy(
      code = childGen.code +
        code"""
        boolean ${ev.isNull} = false;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value};
        if (${childGen.isNull} || ${childGen.value}.numElements() == 0) {
          ${ev.value} = new $gad(new java.lang.Object[$numHashes]);
        } else {
          int $n = ${childGen.value}.numElements();
          long[] $mins = new long[$numHashes];
          java.util.Arrays.fill($mins, Long.MAX_VALUE);
          for (int $j = 0; $j < $n; $j++) {
            long $base = ${childGen.value}.isNullAt($j)
              ? 42L : $xxh.hashUTF8String(${childGen.value}.getUTF8String($j), 42L);
            for (int $i = 0; $i < $numHashes; $i++) {
              long $h = $xxh.hashInt($i, $base);
              if ($h < $mins[$i]) $mins[$i] = $h;
            }
          }
          ${ev.value} = $uad.fromPrimitiveArray($mins);
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** Column API: minhash signature of an array<string> shingle column. */
  def signature(shingles: Column, numHashes: Int): Column =
    Shim.column(MinHashSignature(Shim.expression(shingles), numHashes))
}
