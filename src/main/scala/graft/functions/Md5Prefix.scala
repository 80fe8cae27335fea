package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** The first `nHex` hex digits of an MD5 digest as an unsigned LONG —
  * a native codegen replacement for the engine-wide replayable-hash
  * idiom `conv(substring(md5(x), 1, nHex), 16, 10).cast("long")`
  * (24 call sites: qsketch row keys, Poisson-bootstrap multiplicities,
  * DSIR/Gumbel draws, minhash shingles, negative sampling, ...).
  *
  * The chained form pays, per row, on top of the digest itself: a
  * 32-char hex ENCODE into a fresh UTF8String (Spark's `Md5` returns
  * hex text), a substring copy, `conv`'s two-pass string parse into
  * ANOTHER UTF8String, and a final string→long cast parse. This
  * expression computes the identical value straight off the 16 digest
  * bytes — one thread-local `MessageDigest`, no intermediate strings —
  * and whole-stage codegen fuses it as a single static call
  * (guide §4: built-in-grade expressions in the hot path).
  *
  * VALUE-IDENTICAL by construction: the first nHex hex digits of the
  * digest read as an unsigned base-16 number are exactly the top
  * 4·nHex bits of the digest bytes (nHex ≤ 15 keeps it inside a
  * positive long, the same bound the conv idiom relied on). Null in →
  * null out, like the md5 chain. `Md5PrefixSpec` pins equality against
  * the conv form over adversarial and random inputs, and every
  * converted gate stays hash-green against its unchanged DuckDB
  * oracle (the oracles recompute the SAME md5 prefix from SQL).
  */
case class Md5PrefixExpr(child: Expression, nHex: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(nHex >= 1 && nHex <= 15, s"nHex must be in [1,15], got $nHex")

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix"

  override def nullSafeEval(bytes: Any): Any =
    Md5Prefix.compute(bytes.asInstanceOf[Array[Byte]], nHex)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      b => s"graft.functions.Md5Prefix.compute($b, $nHex)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5PrefixExpr = copy(child = newChild)
}

/** The FULL 16-byte MD5 digest as BINARY — the collision-safe key for
  * internal dedup shuffles whose oracle replays gram STRINGS (not an
  * md5 prefix): at the 100 TB target a 60-bit prefix over ~10^12 grams
  * expects 10^5-10^6 birthday collisions, each silently marking a
  * unique gram as duplicated, while the full digest's expectation is
  * ~10^-15 (round-19 verdict item 2). Same plan shape as the prefix
  * key — one grouped aggregation and one hash join, +8 bytes/key —
  * and skips the hex-encode/`unhex` round trip `unhex(md5(x))` would
  * pay. NOT for keys an oracle recomputes as a 60-bit number (the
  * span-twin and exact-substr gates replay the prefix in SQL — there
  * the prefix IS the contract). */
case class Md5BytesExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "md5_bytes"

  override def nullSafeEval(bytes: Any): Any =
    Md5Prefix.digest(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      b => s"graft.functions.Md5Prefix.digest($b)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5BytesExpr = copy(child = newChild)
}

object Md5Prefix {

  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** The raw 16-byte MD5 digest of `bytes` ([[Md5BytesExpr]]). */
  def digest(bytes: Array[Byte]): Array[Byte] = {
    val d = md.get()
    d.reset()
    d.digest(bytes)
  }

  /** Column API: full 16-byte md5 digest as BINARY. A string input
    * casts to its UTF-8 bytes, matching `md5(stringCol)`. */
  def bytes(in: Column): Column =
    Shim.column(Md5BytesExpr(Shim.expression(in)))

  /** Unsigned value of the first `nHex` hex digits of md5(bytes):
    * digest nibbles high-to-low, exactly the number
    * `conv(substring(md5(x), 1, nHex), 16, 10)` parses. */
  def compute(bytes: Array[Byte], nHex: Int): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < nHex) {
      val b = dig(i >> 1) & 0xff
      val nib = if ((i & 1) == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  /** Column API: first-nHex-hex-digits-of-md5 as a long. A string
    * input casts to its UTF-8 bytes, matching `md5(stringCol)`. */
  def apply(in: Column, nHex: Int = 15): Column =
    Shim.column(Md5PrefixExpr(Shim.expression(in), nHex))
}
