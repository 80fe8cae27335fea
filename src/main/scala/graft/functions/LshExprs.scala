package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Index of the first position where two `array<long>` columns hold equal
  * values, or -1 (0-based). The LSH pair-dedup primitive: a candidate
  * pair produced by the banded self-join is kept only in the band where
  * the signatures FIRST collide, which removes duplicates inside the
  * join stage — no corpus-scale `distinct()` shuffle of the raw pair
  * stream. A 16-step primitive loop in whole-stage codegen, vs
  * interpreted `array_position(zip_with(...))` lambdas per joined row.
  *
  * Precondition (internal operator use): null-free equal-length arrays.
  */
case class FirstEqualIndex(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "first_equal_index"

  // `acceptsType` ignores nullability, so the input-type declaration alone
  // cannot reject nullable-element arrays — and a NULL slot would read as
  // 0 through getLong, silently corrupting the result. Hard analysis error
  // instead (the SQL builder compacts where nulls-ignored semantics fit).
  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (Seq(left, right).exists(
      _.dataType.asInstanceOf[ArrayType].containsNull))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires arrays with non-null elements " +
          "(apply array_compact first)")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) return i
      i += 1
    }
    -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        ${ev.value} = -1;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.getLong($i) == $b.getLong($i)) { ${ev.value} = $i; break; }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstEqualIndex =
    copy(left = newLeft, right = newRight)
}

object FirstEqualIndex {
  def apply(a: Column, b: Column): Column =
    Shim.column(FirstEqualIndex(Shim.expression(a), Shim.expression(b)))
}

/** Jaccard similarity of two SORTED `array<long>` columns (word-hash
  * sets) in ONE fused two-pointer merge:
  * `|A ∩ B| / (|A| + |B| - |A ∩ B|)`, numerator cast to double exactly
  * like `size(array_intersect).cast("double") / size(array_union)`.
  *
  * This is the verification kernel of the LSH near-dup join. Three
  * design points, each load-bearing at millions of candidate pairs:
  *  - hashes, not strings: the merge compares primitive longs straight
  *    out of the `ArrayData` buffers — no per-element `UTF8String`
  *    wrapper allocation, no byte-wise comparisons (the string-merge
  *    variant measured ~10x slower; `array_intersect`'s per-pair hash
  *    set build slower still);
  *  - one expression, one eval per evaluation site: numerator and
  *    denominator share the single merge walk (a composed
  *    `intersect/(na+nb-intersect)` column evaluates the intersection
  *    twice at EVERY site it appears in, e.g. inside a join condition);
  *  - whole-stage codegen via `nullSafeCodeGen`.
  *
  * Precondition (internal operator use): arrays sorted ascending with
  * no nulls; elements are xxhash64 word hashes, so equality matches
  * string equality except with ~2^-64 per-comparison collision odds
  * (the standard trade in production dedup pipelines — results are
  * deterministic, and equal to exact string verification w.h.p.).
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard"

  // `acceptsType` ignores nullability, so the input-type declaration alone
  // cannot reject nullable-element arrays — and a NULL slot would read as
  // 0 through getLong, silently corrupting the result. Hard analysis error
  // instead (the SQL builder compacts where nulls-ignored semantics fit).
  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (Seq(left, right).exists(
      _.dataType.asInstanceOf[ArrayType].containsNull))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires arrays with non-null elements " +
          "(apply array_compact first)")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    // J(empty, empty) is undefined; return 0.0 rather than IEEE NaN
    // (never-NaN discipline — see SURVEY.md §7.4)
    if (na + nb == 0) 0.0 else n.toDouble / (na + nb - n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        int $na = $a.numElements();
        int $nb = $b.numElements();
        int $i = 0; int $j = 0; int $n = 0;
        while ($i < $na && $j < $nb) {
          long $x = $a.getLong($i);
          long $y = $b.getLong($j);
          if ($x == $y) { $n++; $i++; $j++; }
          else if ($x < $y) { $i++; } else { $j++; }
        }
        ${ev.value} = ($na + $nb == 0)
          ? 0.0 : ((double) $n) / ($na + $nb - $n);
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)
}

object SortedJaccard {
  def apply(a: Column, b: Column): Column =
    Shim.column(SortedJaccard(Shim.expression(a), Shim.expression(b)))
}
