package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.textanalysis.TextAnalysis

/** Property pins for the round-15c curation measures. */
class Round15cSpec extends SparkTestBase {
  import spark.implicits._

  test("exactKeepBest: argmax score wins, min id breaks ties, null " +
    "scores lose to any scored copy, count is the group size") {
    val df = Seq(
      (1L, "a b c", Some(5.0)), // same word set, three copies
      (2L, "c b a a", Some(9.0)), // best score -> keeper
      (3L, "b a c", None), // unscored
      (7L, "x y", Some(1.0)), (6L, "y x", Some(1.0)), // tie -> min id 6
      (9L, "solo", None)) // only copy, null score survives as null
      .map { case (i, t, s) => (i, t, s.map(Double.box).orNull) }
      .toDF("id", "text", "score")
    val got = Dedup.exactKeepBest(df, "id", "text", col("score"))
      .orderBy("keep_id").collect()
      .map(r => (r.getLong(1), Option(r.get(2)), r.getLong(3)))
    assert(got.toSeq === Seq(
      (2L, Some(9.0), 3L), (6L, Some(1.0), 2L), (9L, None, 1L)))
  }

  test("exactKeepBest matches exactGroups' grouping exactly (same " +
    "digest, same group sizes)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val best = Dedup.exactKeepBest(docs, "doc_id", "text", col("n_chars"))
      .select("dedup_key", "n_docs")
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
      .select("dedup_key", "n_docs")
    assert(best.except(groups).isEmpty && groups.except(best).isEmpty)
  }

  test("vocabGrowth: monotone in the prefix, exact at 100%, blank and " +
    "null docs count zero tokens") {
    val df = Seq(
      (1L, "a b c"), (2L, "b c d"), (3L, "e"), (4L, ""), (5L, null))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.vocabGrowth(df, "doc_id", "text", "t15",
        Seq(0.25, 0.5, 1.0))
      .collect().map(r => (r.getDouble(0), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length === 3)
    // full prefix: 5 docs, 7 tokens, vocab {a,b,c,d,e} = 5
    assert(rows.last === ((1.0, 5L, 7L, 5L)))
    // counters never decrease along the curve
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._2 <= hi._2 && lo._3 <= hi._3 && lo._4 <= hi._4)
    }
  }

  test("vocabGrowth prefixes nest: the p-prefix vocabulary is a subset " +
    "of the q-prefix vocabulary for p < q (hash-cutoff monotonicity)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val rows = TextAnalysis.vocabGrowth(docs, "doc_id", "text", "t15",
        Seq(0.1, 0.5, 1.0))
      .collect()
    val vocab = rows.map(_.getLong(4))
    val toks = rows.map(_.getLong(3))
    assert(vocab(0) <= vocab(1) && vocab(1) <= vocab(2))
    assert(toks(0) <= toks(1) && toks(1) <= toks(2))
    // Heaps shape on real text: vocabulary grows sublinearly vs tokens
    assert(vocab(2).toDouble / vocab(0) < toks(2).toDouble / toks(0),
      s"vocab ${vocab.toSeq} should grow slower than tokens ${toks.toSeq}")
  }
}
