package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Locale-robust numeric parsing.
  *
  * Semantics follow the reference's `_to_number`
  * (`Actualizar_Precios_de_Nexo.py:104-128`): strip spaces; when both `,`
  * and `.` are present the rightmost acts as the decimal separator and the
  * other as thousands; a string containing only `,` treats `.` as thousands
  * and `,` as decimal (es-PE); more than one `.` folds all but the last into
  * the integer part. Unparseable input yields NULL (never NaN — see the
  * NaN/NULL discipline in SURVEY.md §7.4).
  */
object LocaleNum {
  // Strict decimal grammar enforced after normalization, instead of Java's
  // wider Double.parseDouble grammar ("1.5f", hex floats, "Infinity"):
  //   [+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?   (\d = ASCII 0-9)
  // Hand-rolled single scan — this runs per row in the hot parse path, and
  // a java.util.regex match was ~half the per-value cost.
  // KernelProps pins equivalence to the regex on random inputs.
  private[graft] def validGrammar(s: String): Boolean = {
    val n = s.length
    var i = 0
    if (n == 0) return false
    if (s.charAt(i) == '+' || s.charAt(i) == '-') i += 1
    var intDigits = 0
    while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9') {
      i += 1; intDigits += 1
    }
    if (i < n && s.charAt(i) == '.') {
      i += 1
      var fracDigits = 0
      while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9') {
        i += 1; fracDigits += 1
      }
      if (intDigits == 0 && fracDigits == 0) return false
    } else if (intDigits == 0) return false
    if (i < n && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
      i += 1
      if (i < n && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
      var expDigits = 0
      while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9') {
        i += 1; expDigits += 1
      }
      if (expDigits == 0) return false
    }
    i == n
  }

  /** Codegen entry point: UTF8String in, boxed Double (or null) out. */
  def parse(u: UTF8String): java.lang.Double =
    if (u == null) null else parseString(u.toString)

  def parseString(raw: String): java.lang.Double = {
    if (raw == null) return null
    var txt = raw.trim.replace(" ", "").replace(" ", "")
    if (txt.isEmpty) return null
    val hasComma = txt.indexOf(',') >= 0
    val hasDot = txt.indexOf('.') >= 0
    if (hasComma && hasDot) {
      if (txt.lastIndexOf(',') > txt.lastIndexOf('.'))
        txt = txt.replace(".", "").replace(",", ".") // 1.234.567,89
      else
        txt = txt.replace(",", "") // 1,234,567.89
    } else if (hasComma) {
      txt = txt.replace(",", ".") // lone comma = decimal separator
    } else {
      val parts = txt.split("\\.", -1)
      if (parts.length > 2) // 1.234.567 -> thousands except last group
        txt = parts.init.mkString("") + "." + parts.last
    }
    if (!validGrammar(txt)) return null
    try {
      val d = java.lang.Double.parseDouble(txt)
      if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) null
      else java.lang.Double.valueOf(d)
    } catch { case _: NumberFormatException => null }
  }
}

/** Catalyst expression for [[LocaleNum.parse]]; stays inside whole-stage
  * codegen via a static call (no UDF serialization, no boxing in the loop
  * beyond the single return value).
  */
case class ParseLocaleNumber(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "locale_num"

  override def nullSafeEval(input: Any): Any =
    LocaleNum.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("parsed")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = -1.0;
      if (!${childGen.isNull}) {
        java.lang.Double $boxed = graft.functions.LocaleNum.parse(${childGen.value});
        if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): ParseLocaleNumber =
    copy(child = newChild)
}

object ParseLocaleNumber {
  /** Column API: parse a string column as a locale-tolerant double. */
  def localeNum(c: Column): Column =
    Shim.column(ParseLocaleNumber(Shim.expression(c.cast("string"))))
}
