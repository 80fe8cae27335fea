package graft

import graft.textanalysis.TextAnalysis

/** Pins for character-level ExactSubstr dedup (Lee et al. 2021 §4.1
  * semantics): keep-first removal, same-doc repeats, overlap merge,
  * the exact length threshold, and the self-repetition edge. */
class ExactSubstrSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], minLen: Int) =
    TextAnalysis.exactSubstrDedup(rows.toDF("id", "text"), "id", "text",
        minLen)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap

  test("keep-first: the lexicographically first (doc, pos) occurrence " +
    "survives, every other occurrence is cut whole") {
    val shared = "ABCDEFGHIJKLMNOP" // 16 chars, minLen = 10
    val out = run(Seq(
      (1L, s"xxx${shared}yyy"),
      (2L, s"qq${shared}zzzz"),
      (3L, "totally unrelated text here")), minLen = 10)
    // doc 1 holds the canonical occurrence of every in-run gram
    assert(out(1L) === (22L, 0L, s"xxx${shared}yyy"))
    // doc 2 loses exactly the 16 shared chars (the gram-cover union)
    assert(out(2L) === (22L, 16L, "qqzzzz"))
    assert(out(3L)._2 === 0L)
    assert(out(3L)._3 === "totally unrelated text here")
  }

  test("same-doc repeat: the second occurrence inside one document is " +
    "cut, the first kept") {
    val out = run(Seq((7L, "0123456789XX0123456789")), minLen = 10)
    assert(out(7L) === (22L, 10L, "0123456789XX"))
  }

  test("threshold is exact: a 9-char shared run never marks at " +
    "minLen=10; a 10-char one does") {
    val nine = "QRSTUVWXY"
    val ten = "QRSTUVWXYZ"
    val out9 = run(Seq((1L, s"aa${nine}bb"), (2L, s"cc${nine}dd")), 10)
    assert(out9.values.forall(_._2 == 0L))
    val out10 = run(Seq((1L, s"aa${ten}bb"), (2L, s"cc${ten}dd")), 10)
    assert(out10(1L)._2 === 0L)
    assert(out10(2L) === (14L, 10L, "ccdd"))
  }

  test("overlapping marks merge: two shared runs separated by one " +
    "unshared char cut as their exact union, the separator survives") {
    val r1 = "ABCDEFGHIJKL" // 12 chars
    val r2 = "MNOPQRSTUVWX" // 12 chars
    val out = run(Seq(
      (1L, s"<<$r1>>"), (2L, s"(($r2))"),
      (3L, s"__$r1#$r2--")), minLen = 10)
    assert(out(3L)._2 === 24L)
    assert(out(3L)._3 === "__#--")
  }

  test("self-repetitive run: every non-canonical gram of an aaaa... " +
    "run cuts, including inside the canonical document (the paper " +
    "dedups self-repeats too)") {
    val out = run(Seq((1L, "a" * 15), (2L, "b" + "a" * 15)), minLen = 10)
    // doc 1: pos 1 gram is canonical; pos 2..6 grams are dup marks ->
    // merged cover [2, 15] -> one char survives
    assert(out(1L) === (15L, 14L, "a"))
    // doc 2: every gram non-canonical -> the whole run cuts
    assert(out(2L) === (16L, 15L, "b"))
  }

  test("short and empty docs pass through untouched") {
    val out = run(Seq((1L, "tiny"), (2L, "")), minLen = 10)
    assert(out(1L) === (4L, 0L, "tiny"))
    assert(out(2L) === (0L, 0L, ""))
  }

  // ---- winnowed-minimizer variant: OUTPUT-IDENTICAL by the winnowing
  //      guarantee (round-18; see exactSubstrDedupMinimized's scaladoc
  //      for the proof sketch) ----

  private def runMin(rows: Seq[(Long, String)], minLen: Int, k: Int) =
    TextAnalysis.exactSubstrDedupMinimized(rows.toDF("id", "text"), "id",
        "text", minLen, k)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap

  private def assertMinEqualsFull(rows: Seq[(Long, String)], minLen: Int,
                                  k: Int): Unit =
    assert(runMin(rows, minLen, k) === run(rows, minLen),
      s"minimized (k=$k) diverged from full chain at minLen=$minLen")

  test("minimized == full on every handcrafted fixture above, at " +
    "several k") {
    val fixtures = Seq(
      Seq((1L, "xxxABCDEFGHIJKLMNOPyyy"), (2L, "qqABCDEFGHIJKLMNOPzzzz"),
        (3L, "totally unrelated text here")),
      Seq((7L, "0123456789XX0123456789")),
      Seq((1L, "aaQRSTUVWXYbb"), (2L, "ccQRSTUVWXYdd")),
      Seq((1L, "aaQRSTUVWXYZbb"), (2L, "ccQRSTUVWXYZdd")),
      Seq((1L, "<<ABCDEFGHIJKL>>"), (2L, "((MNOPQRSTUVWX))"),
        (3L, "__ABCDEFGHIJKL#MNOPQRSTUVWX--")),
      Seq((1L, "a" * 15), (2L, "b" + "a" * 15)), // all-tie fingerprints
      Seq((1L, "tiny"), (2L, "")))
    for (f <- fixtures; k <- Seq(2, 4, 9))
      assertMinEqualsFull(f, minLen = 10, k = k)
  }

  test("minimized == full at boundaries: dup span at doc start, doc " +
    "end, exactly minLen, and doc length exactly minLen") {
    val span = "ABCDEFGHIJ" // exactly minLen = 10
    assertMinEqualsFull(Seq(
      (1L, span), // whole doc IS the span
      (2L, span + "tail..."), // span at start
      (3L, "...head" + span), // span at end
      (4L, "no relation at all here")), minLen = 10, k = 4)
  }

  test("minimized == full on a seeded random low-alphabet corpus " +
    "(heavy natural repetition + ties)") {
    val rnd = new scala.util.Random(20260816L)
    val docs = (1L to 200L).map { id =>
      val len = 40 + rnd.nextInt(160)
      (id, (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    }
    assertMinEqualsFull(docs, minLen = 12, k = 4)
    assertMinEqualsFull(docs, minLen = 12, k = 8)
  }

  test("minimized == full with multi-byte code points in and around " +
    "the duplicated span (position accounting is code-point-exact)") {
    val span = "ñandú🦤crève≠Ωabc" // 16 code points
    assertMinEqualsFull(Seq(
      (1L, s"ß×$span÷µ"),
      (2L, s"œ$span"),
      (3L, "çéüöäñ unrelated ≠≠≠")), minLen = 10, k = 3)
  }

  test("non-integral ids take the struct-min canonical path and land " +
    "the identical keep-first semantics (incl. negative-long parity " +
    "for the packed path)") {
    // string ids exercise the struct-min fallback (the packed-decimal
    // canonical only applies to integral id types); the keep-first
    // rule must read identically: 'a' keeps, 'b' cuts
    val shared = "ABCDEFGHIJKLMNOP"
    val byStr = TextAnalysis.exactSubstrDedup(
        Seq(("b", s"qq${shared}zz"), ("a", s"xx${shared}yy"))
          .toDF("id", "text"), "id", "text", minLen = 10)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byStr("a") === 0L, "lexicographically first id keeps")
    assert(byStr("b") === 16L, "second id loses the shared run")
    // negative long ids through the packed-decimal path: order must be
    // SIGNED (id * 2^32 + i packs monotonically for negative ids too)
    val byNeg = run(Seq((-5L, s"qq${shared}zz"), (3L, s"xx${shared}yy")),
      minLen = 10)
    assert(byNeg(-5L)._2 === 0L, "-5 < 3: the negative id is canonical")
    assert(byNeg(3L)._2 === 16L)
  }
}
