package graft

import org.apache.spark.sql.functions._
import graft.textanalysis.BpeTrain

/** Semantics of the distributed BPE trainer: hand-checked merges on a
  * tiny corpus, the greedy left-to-right application order (the case
  * that separates it from leftmost-longest or right-to-left), and
  * train/segment agreement. Cross-engine replay is the
  * text_bpe_train / text_bpe_segment gates. */
class BpeTrainSpec extends SparkTestBase {
  import spark.implicits._

  test("learns hand-computable merges in frequency order") {
    // "ab" occurs 5x (3 in 'abab' x ... ) — compute by hand:
    // words: "abab" x3, "abc" x2, "cc" x4
    val docs = (Seq.fill(3)("abab") ++ Seq.fill(2)("abc") ++
      Seq.fill(4)("cc")).mkString(" ")
    val got = BpeTrain.trainMerges(Seq(docs).toDF("text"), "text", 3)
      .orderBy("step")
      .select("step", "lhs", "rhs", "merged", "cnt")
      .as[(Int, String, String, String, Long)].collect().toSeq
    // pairs: (a,b) 3*2+2 = 8, (b,a) 3, (b,c) 2, (c,c) 4
    assert(got(0) === ((1, "a", "b", "ab", 8L)))
    // after merge 1: 'ab ab' x3, 'ab c' x2, 'c c' x4:
    // (ab,ab) 3, (ab,c) 2, (c,c) 4
    assert(got(1) === ((2, "c", "c", "cc", 4L)))
    // after merge 2: (ab,ab) 3, (ab,c) 2
    assert(got(2) === ((3, "ab", "ab", "abab", 3L)))
  }

  test("application order is greedy left-to-right") {
    // merge (a,a) on 'aaaa' -> [aa, aa]; on 'aaa' -> [aa, a]
    val seg = BpeTrain.segment(Seq("aaaa aaa").toDF("text"), "text",
        Seq(("a", "a")))
      .select("bpe_tokens").head().getSeq[String](0)
    assert(seg === Seq("aa", "aa", "aa", "a"))
    // chained merges compose in learned order: (a,b) then (ab,c);
    // merging never crosses word boundaries ('c ab' stays two tokens)
    val seg2 = BpeTrain.segment(Seq("ab c abc cab").toDF("text"),
        "text", Seq(("a", "b"), ("ab", "c")))
      .select("bpe_tokens").head().getSeq[String](0)
    assert(seg2 === Seq("ab", "c", "abc", "c", "ab"))
  }

  test("segmentation is lossless and emits only learned symbols") {
    val docs = queries.tbl(spark, sf, "documents")
    val merges = BpeTrain.trainMerges(docs, "text", 4)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.size === 4)
    val words = docs.select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).distinct()
    val segged = BpeTrain.segment(words, "w", merges)
    // concatenating the tokens reconstructs every word exactly
    assert(segged.filter(
      concat_ws("", col("bpe_tokens")) =!= col("w")).count() === 0L)
    // every multi-char token is a product of a learned merge
    val learned = merges.map { case (a, b) => a + b }.toSet
    val alien = segged.select(explode(col("bpe_tokens")).as("t"))
      .filter(length(col("t")) > 1)
      .filter(!col("t").isin(learned.toSeq: _*)).count()
    assert(alien === 0L)
  }
}
