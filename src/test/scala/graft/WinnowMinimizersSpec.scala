package graft

import org.apache.spark.sql.functions._

import graft.functions.WinnowMinimizers

/** Pins for the winnowing selection itself — the properties
  * `exactSubstrDedupMinimized`'s exactness proof leans on. */
class WinnowMinimizersSpec extends SparkTestBase {
  import spark.implicits._

  private def select(text: String, k: Int, w: Int): Seq[(Int, Long)] =
    Seq(text).toDF("t")
      .select(explode(WinnowMinimizers(col("t"), k, w)).as("m"))
      .select(col("m.pos"), col("m.fp"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq

  test("coverage: every window of w consecutive k-gram positions " +
    "contains at least one selected position") {
    val rnd = new scala.util.Random(7L)
    for (_ <- 1 to 20) {
      val n = 30 + rnd.nextInt(120)
      val s = (1 to n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val (k, w) = (3, 7)
      val sel = select(s, k, w).map(_._1).toSet
      val m = s.length - k + 1
      for (j0 <- 1 to m - w + 1)
        assert((j0 until j0 + w).exists(sel.contains),
          s"window at $j0 uncovered in ${s.take(40)}...")
    }
  }

  test("content determinism: equal substrings of length w+k-1 select " +
    "the same fingerprint value inside both copies") {
    val span = "qwertyuiopasdfghjklz" // 20 chars
    val (k, w) = (4, 17) // guarantee threshold w+k-1 = 20 = |span|
    val a = s"###$span%%%"
    val b = s"@@@@@@$span!!"
    val selA = select(a, k, w)
    val selB = select(b, k, w)
    // positions of the span: a at 4..23, b at 7..26; grams inside the
    // span occupy [start, start+w-1]
    val inA = selA.filter(p => p._1 >= 4 && p._1 <= 4 + w - 1).map(_._2)
    val inB = selB.filter(p => p._1 >= 7 && p._1 <= 7 + w - 1).map(_._2)
    assert(inA.toSet.intersect(inB.toSet).nonEmpty,
      "the two copies must share a selected fingerprint value")
  }

  test("selection is position-deduplicated, sorted, in-range, and " +
    "empty below the threshold") {
    val s = "abcabcabcabcabcabc"
    val sel = select(s, 3, 5)
    assert(sel.map(_._1) === sel.map(_._1).distinct.sorted)
    assert(sel.forall(p => p._1 >= 1 && p._1 <= s.length - 3 + 1))
    // doc shorter than w+k-1 selects nothing
    assert(select("abcdef", 3, 5).isEmpty) // needs >= 7 chars
    assert(select("", 3, 5).isEmpty)
    // exactly at threshold: exactly one window -> exactly one selection
    assert(select("abcdefg", 3, 5).size === 1)
  }

  test("all-tie runs (aaaa...) select EVERY window's leftmost position " +
    "— per-window PURE selection, no cross-window retention (density " +
    "degrades to 1 on constant runs, the price of exact intra-doc " +
    "duplicate counting: Schleimer's robust-winnowing retention would " +
    "select ONE position for two overlapping occurrences and break " +
    "the count>=2 evidence)") {
    val (k, w) = (3, 10)
    val s = "a" * 60
    val sel = select(s, k, w)
    val m = s.length - k + 1
    val nW = m - w + 1
    // window j0 selects its own leftmost index j0 (all values equal)
    assert(sel.map(_._1) === (1 to nW))
    // all fingerprints identical
    assert(sel.map(_._2).distinct.size === 1)
  }

  test("multi-byte code points count as single positions (matches " +
    "substring/length semantics)") {
    val s = "ñ€🦤abcdefgh"
    val k = 3
    val w = 4
    val sel = select(s, k, w)
    val nChars = s.codePointCount(0, s.length)
    assert(sel.forall(p => p._1 >= 1 && p._1 <= nChars - k + 1))
    assert(sel.nonEmpty)
  }
}
