package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing minimizer selection (Schleimer, Wilkerson, Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting") over the
  * code points of a string: fingerprint every k-gram, slide a window of
  * `w` consecutive k-gram positions, and keep the LEFTMOST-minimum
  * fingerprint of each window — deduplicated, as
  * `array<struct<pos:int, fp:bigint>>` with 1-based code-point
  * positions (the same positions `substring`/`length` count, so the
  * selected grams line up with the SQL-side text ops downstream).
  *
  * The load-bearing guarantee (the winnowing theorem, plus the
  * argmin-by-content tie-break): ANY two equal substrings of length
  * L = w + k - 1 select the SAME fingerprint value at the SAME
  * relative offset in both copies — the window of w k-grams spanning
  * each copy holds an identical fingerprint sequence, so its leftmost
  * minimum is the same value at the same offset. That makes the
  * selected set an exact PRE-FILTER for duplicated-substring detection
  * at threshold L: every occurrence of every duplicated L-gram lies
  * within [p - (L - k), p] of a selected position p whose fingerprint
  * value occurs ≥ 2 times corpus-wide (see
  * `TextAnalysis.exactSubstrDedupMinimized`, which consumes this).
  * Fingerprint collisions only ever ADD candidates — they can weaken
  * the pruning, never the exactness.
  *
  * O(n) per document: one code-point decode pass, a rolling polynomial
  * k-gram hash (finalized through a murmur fmix64 so window-minimum
  * selection isn't biased by the raw polynomial's low-bit structure),
  * and the classic monotonic-deque sliding-window minimum. Selection
  * density is ~2/(w+1) on non-degenerate content, so the downstream
  * shuffle carries ~2/(w+1) of the positions a full gram explode
  * would — the whole point (round-17 verdict item 2: the full chain's
  * two gram-sized shuffles were the heaviest constant in the engine).
  *
  * DELIBERATELY NOT Schleimer's "robust winnowing": the robust
  * variant retains the previous selection across windows while it
  * stays minimal, which halves density but selects only ONE position
  * for two OVERLAPPING intra-document occurrences (e.g. a self-
  * repetitive run) — the downstream count-≥2 evidence would miss
  * them. Per-window pure selection is content-aligned instead: two
  * equal windows select the same relative offset, so distinct
  * occurrences always contribute distinct (doc, pos) selections. The
  * cost shows only on constant runs (all-tie fingerprints select
  * every window's leftmost → density 1 on "aaaa..." stretches),
  * bounded by the run's own length.
  */
case class WinnowMinimizers(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(k >= 1, s"k-gram length must be >= 1, got $k")
  require(w >= 1, s"window must be >= 1 k-gram positions, got $w")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnow_minimizers"

  override def nullSafeEval(input: Any): Any =
    WinnowMinimizers.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowMinimizers.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowMinimizers =
    copy(child = newChild)
}

object WinnowMinimizers {

  /** Odd multiplier of the rolling polynomial (Knuth's MMIX LCG
    * constant); arithmetic is mod 2^64 by Long wraparound. */
  private val B = 6364136223846793005L

  /** murmur3 fmix64 — bijective, so it cannot introduce collisions the
    * polynomial didn't already have; it only decorrelates the compare
    * order from the gram's trailing characters. */
  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** Decode UTF-8 bytes to code points — same walk as
    * [[RollingFingerprint.compute]], so positions match Spark's
    * code-point `substring`/`length` semantics. */
  private def codePoints(s: UTF8String): Array[Int] = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new Array[Int](s.numChars())
    var i = 0
    var c = 0
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
      out(c) = cp
      c += 1
      i += len
    }
    out
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val cp = codePoints(s)
    val n = cp.length
    val m = n - k + 1 // number of k-grams
    if (m < w) return new GenericArrayData(Array.empty[Any])
    // rolling k-gram fingerprints, fmix64-finalized
    var bk = 1L // B^(k-1)
    var i = 1
    while (i < k) { bk *= B; i += 1 }
    val fp = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + cp(i); i += 1 }
    fp(0) = fmix64(h)
    var j = 1
    while (j < m) {
      h = (h - cp(j - 1) * bk) * B + cp(j + k - 1)
      fp(j) = fmix64(h)
      j += 1
    }
    // sliding-window minimum, monotonic deque of indices with STRICT
    // pops (equal values keep the earlier index -> leftmost-min
    // tie-break, a pure function of the window's value sequence)
    val nW = m - w + 1
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    val selPos = new scala.collection.mutable.ArrayBuffer[Int]()
    val selFp = new scala.collection.mutable.ArrayBuffer[Long]()
    var lastSel = -1
    j = 0
    while (j < m) {
      while (tail > head && fp(deque(tail - 1)) > fp(j)) tail -= 1
      deque(tail) = j; tail += 1
      val j0 = j - w + 1 // window start when the window is full
      if (j0 >= 0) {
        while (deque(head) < j0) head += 1
        val sel = deque(head)
        if (sel != lastSel) {
          selPos += sel + 1 // 1-based char position
          selFp += fp(sel)
          lastSel = sel
        }
      }
      j += 1
    }
    val rows = new Array[Any](selPos.length)
    var r = 0
    while (r < rows.length) {
      rows(r) = InternalRow(selPos(r), selFp(r))
      r += 1
    }
    new GenericArrayData(rows)
  }

  def apply(c: Column, k: Int, w: Int): Column =
    Shim.column(WinnowMinimizers(Shim.expression(c), k, w))
}
