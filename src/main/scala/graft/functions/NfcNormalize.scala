package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the
  * canonical-composition pass every multilingual corpus needs before
  * hashing, deduplication, or tokenization: "é" as U+0065 U+0301
  * (decomposed) and as U+00E9 (precomposed) are the SAME text but
  * different bytes, so every byte-keyed operator in the engine (exact
  * dedup digests, MinHash shingles, vocab joins, group-bys) silently
  * splits them until the corpus is normalized.
  *
  * Spark has no built-in for this; a Scala UDF would leave whole-stage
  * codegen and serialize per row. This stays inside codegen via one
  * static call (the [[ParseLocaleNumber]] ladder tier). The fast path
  * costs one `Normalizer.isNormalized` check — ASCII and
  * already-composed text (the overwhelming majority of a real corpus)
  * never allocates; only genuinely decomposed strings pay the
  * normalize + re-encode. java.text.Normalizer implements Unicode
  * UAX#15 canonical composition — the same algorithm DuckDB's
  * `nfc_normalize` (utf8proc) implements, which is what lets the
  * oracle replay it. */
object NfcNormalize {
  /** Static kernel for codegen: null-safe NFC of a UTF8String. */
  def nfc(input: UTF8String): UTF8String = {
    if (input == null) return null
    val s = input.toString
    if (java.text.Normalizer.isNormalized(s,
        java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Column API: NFC-normalize a string column. */
  def apply(c: Column): Column =
    Shim.column(NfcNormalizeExpr(Shim.expression(c.cast("string"))))
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}
