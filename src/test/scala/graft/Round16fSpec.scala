package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dsir, Privacy}
import graft.textanalysis.TokenizerFertility

/** Property pins for the selection-audit tier: tokenizer fertility
  * arithmetic, DSIR KL-reduction direction, k-anonymity counting. */
class Round16fSpec extends SparkTestBase {
  import spark.implicits._

  test("fertility: with no merges every word costs its characters, " +
    "ratios are exact floor divisions") {
    val docs = Seq(
      (1L, "ab cde", "en"), // 2 words, 5 chars -> 5 tokens
      (2L, "ab ab", "en"),  // 2 words, 4 chars -> 4 tokens
      (3L, "xyzw", "fr"))   // 1 word, 4 chars -> 4 tokens
      .toDF("doc_id", "text", "lang")
    val got = TokenizerFertility.perLang(docs, "text", "lang", Seq.empty)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(5)))
    // en: 4 words, 9 bpe tokens, 9 chars; fertility = 9e6 div 4
    assert(got(0) === (("en", 4L, 9L, 9L, 2250000L)))
    assert(got(1) === (("fr", 1L, 4L, 4L, 4000000L)))
  }

  test("fertility: a merge that fuses a frequent pair lowers that " +
    "language's fertility only") {
    val docs = Seq(
      (1L, "abab abab", "en"), (2L, "cd cd", "fr"))
      .toDF("doc_id", "text", "lang")
    val before = TokenizerFertility
      .perLang(docs, "text", "lang", Seq.empty)
      .orderBy("lang").collect().map(r => r.getLong(2))
    val after = TokenizerFertility
      .perLang(docs, "text", "lang", Seq("a" -> "b"))
      .orderBy("lang").collect().map(r => r.getLong(2))
    assert(before.toSeq === Seq(8L, 4L))
    assert(after.toSeq === Seq(4L, 4L), "'ab' fuses: en halves, fr flat")
  }

  test("dsir kl: selecting exactly the target docs beats the pool " +
    "(ratio < 1) and the output is one exact row") {
    val docs = (1 to 40).map { i =>
      val lang = if (i % 4 == 0) "en" else "fr"
      val txt = if (lang == "en") "alpha beta gamma alpha"
        else s"delta epsilon zeta eta w$i"
      (i.toLong, txt, lang)
    }.toDF("doc_id", "text", "lang")
    val isTgt = col("lang") === "en"
    // hand the TRUE target ids in as the selection: KL to target must
    // drop vs the pool
    val sel = docs.where(isTgt).select(col("doc_id").as("id"))
    val row = Dsir.klReduction(docs, "doc_id", "text", isTgt, sel,
      buckets = 256).head()
    assert(row.getInt(0) === 256)
    val (klSel, klPool) = (row.getLong(1), row.getLong(2))
    assert(klSel < klPool,
      s"selected-set KL $klSel must be below pool KL $klPool")
    assert(row.getDouble(3) < 1.0)
  }

  test("dsir kl: a random (hash-spread) selection of the same size " +
    "does not beat the target-informed one") {
    val docs = (1 to 60).map { i =>
      val lang = if (i % 3 == 0) "en" else "fr"
      val txt = if (lang == "en") "alpha beta alpha gamma"
        else s"delta epsilon w$i zeta"
      (i.toLong, txt, lang)
    }.toDF("doc_id", "text", "lang")
    val isTgt = col("lang") === "en"
    val w = Dsir.importanceWeights(docs, "doc_id", "text", isTgt, 256)
    val informed = Dsir.gumbelTopK(w, k = 15).select("id")
    val arbitrary = docs.select(col("doc_id").as("id"))
      .orderBy(md5(col("id").cast("string"))).limit(15)
    val klI = Dsir.klReduction(docs, "doc_id", "text", isTgt,
      informed, 256).head().getLong(1)
    val klA = Dsir.klReduction(docs, "doc_id", "text", isTgt,
      arbitrary, 256).head().getLong(1)
    assert(klI <= klA,
      s"importance-resampled KL $klI must not lose to arbitrary $klA")
  }

  test("k-anonymity: class and row tallies, minimums, and the ppm " +
    "share are exact") {
    val df = Seq(
      // class (1, a): 3 rows, 2 sensitive values
      (1, "a", "x"), (1, "a", "y"), (1, "a", "x"),
      // class (1, b): 1 row -> below k=2
      (1, "b", "x"),
      // class (2, a): 2 rows, 1 sensitive value
      (2, "a", "z"), (2, "a", "z"))
      .toDF("q1", "q2", "s")
    val row = Privacy.kAnonymity(df, Seq("q1", "q2"), col("s"), k = 2L)
      .head()
    assert(row.getLong(0) === 3L) // classes
    assert(row.getLong(1) === 6L) // rows
    assert(row.getLong(2) === 1L) // classes below k
    assert(row.getLong(3) === 1L) // rows below k
    assert(row.getLong(4) === 1L) // min class size
    assert(row.getLong(5) === 1L) // min l-diversity
    assert(row.getLong(6) === 166666L) // 1e6 div 6
  }
}
