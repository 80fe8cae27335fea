package graft

import org.apache.spark.sql.functions._
import graft.operators.{NegativeSample, RankNormalize}
import graft.textanalysis.TermStats

/** Round-12 second batch vs brute-force oracles: negative sampling,
  * percent-rank normalization, term mutual information. */
class Round12bSpec extends SparkTestBase {
  import spark.implicits._

  test("negativeSample: k negatives, none positive, margin-stable") {
    val rnd = new scala.util.Random(61)
    val pos = Seq.fill(400)((rnd.nextInt(20).toLong,
      rnd.nextInt(50).toLong)).distinct
    val df = pos.toDF("u", "i")
    val out = NegativeSample(df, col("u"), col("i"),
        nItems = 50L, k = 5)
      .as[(Long, Long, Int)].collect()
    val posSet = pos.toSet
    out.foreach { case (u, item, _) =>
      assert(!posSet.contains((u, item)),
        s"($u, $item) is a positive")
      assert(item >= 0 && item < 50)
    }
    val perUser = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perUser.values.forall(_ <= 5))
    assert(perUser.values.exists(_ == 5), "most users should fill k")
    // no duplicate negatives per user
    assert(out.map(r => (r._1, r._2)).distinct.length === out.length)
    // downward-closed in margin: a bigger margin never changes the
    // negatives that fit without it (draw order decides)
    val wide = NegativeSample(df, col("u"), col("i"), 50L, 5,
        margin = 40)
      .as[(Long, Long, Int)].collect()
    val byUser = out.groupBy(_._1)
    wide.groupBy(_._1).foreach { case (u, ws) =>
      val narrow = byUser.getOrElse(u, Array.empty)
      assert(narrow.toSet.subsetOf(ws.toSet),
        s"user $u: margin changed early draws")
    }
    // determinism
    val again = NegativeSample(df, col("u"), col("i"), 50L, 5)
      .as[(Long, Long, Int)].collect()
    assert(out.sortBy(r => (r._1, r._3)).toSeq ===
      again.sortBy(r => (r._1, r._3)).toSeq)
  }

  test("rankNormalize equals percent_rank, ties and edges included") {
    val rnd = new scala.util.Random(67)
    val vals = Seq.fill(3000)(rnd.nextInt(200).toDouble) // heavy ties
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val got = RankNormalize(df, "v", k = 256, nLanes = 8)
      .select("id", "rank_pct").as[(Long, Double)].collect().toMap
    val win = df.withColumn("p",
        percent_rank().over(org.apache.spark.sql.expressions.Window
          .orderBy("v")))
      .select("id", "p").as[(Long, Double)].collect().toMap
    assert(got === win)
    // single row -> 0.0, not 0/0
    val one = RankNormalize(Seq((1L, 9.0)).toDF("id", "v"), "v",
      nLanes = 2).select("rank_pct").as[Double].head()
    assert(one === 0.0)
    // a non-numeric value casts to null: it must drop entirely, not
    // inflate the prefix counts and denominator of the numeric rows
    val mixed = Seq(("a", "junk"), ("b", "1"), ("c", "2"))
      .toDF("id", "v")
    val ranks = RankNormalize(mixed, "v", nLanes = 2)
      .select("id", "rank_pct").as[(String, Double)].collect().toMap
    assert(ranks === Map("b" -> 0.0, "c" -> 1.0))
  }

  test("jaroWinkler: textbook values, thresholds, edges, SQL surface") {
    import graft.functions.JaroWinkler
    // literals probed against DuckDB's jaro_winkler_similarity
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("kitten", "sitting", 0.746031746031746),
      ("abcdzzzzzzzzzz", "abcdqqqqqqqqqq", 0.5238095238095238), // <= 0.7: no boost
      ("ab", "abcdefghij", 0.7866666666666667),
      ("aaaaab", "aaaaba", 0.9666666666666667), // prefix capped at 4
      ("abc", "abc", 1.0),
      ("", "abc", 0.0), ("a", "", 0.0),
      ("ABc", "abC", 0.0)) // case-sensitive
    val got = cases.map { case (a, b, _) => (a, b) }
      .toDF("a", "b")
      .select(JaroWinkler(col("a"), col("b")))
      .as[Double].collect()
    assert(got.toSeq === cases.map(_._3))
    // null propagates
    assert(Seq((Option.empty[String], Option("x")))
      .toDF("a", "b").select(JaroWinkler(col("a"), col("b")))
      .head().isNullAt(0))
  }

  test("termMutualInfo: signal term tops, independent term near zero") {
    // 200 labeled docs: "signal" appears in 90% of positives and 10%
    // of negatives; "noise" in ~half of each
    val docs = (0 until 200).map { i =>
      val pos = i % 2 == 0
      val sig = if (pos) i % 10 != 0 else i % 10 == 1
      val noise = i % 4 < 2
      val text = Seq(Some("filler"), if (sig) Some("signal") else None,
        if (noise) Some("noise") else None).flatten.mkString(" ")
      (i.toLong, text, if (pos) "en" else "es")
    }.toDF("doc_id", "text", "lang")
    val mi = TermStats.termMutualInfo(docs, "doc_id", "text",
        col("lang") === "en")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(mi("signal")._2 > 0.15, s"signal MI too low: $mi")
    assert(mi("noise")._2 < 0.01, s"noise MI too high: $mi")
    assert(mi("filler")._2 === 0.0) // df = N -> no information
    // brute-force one term
    def brute(term: String): Double = {
      val rows = docs.select("text", "lang").as[(String, String)]
        .collect()
      val n = rows.length.toDouble
      val np = rows.count(_._2 == "en").toDouble
      val c1p = rows.count(r => r._2 == "en" &&
        r._1.split("\\s+").contains(term)).toDouble
      val c1n = rows.count(r => r._2 != "en" &&
        r._1.split("\\s+").contains(term)).toDouble
      val (df1, nn) = (c1p + c1n, n - np)
      def cell(nij: Double, ni: Double, nj: Double) =
        if (nij == 0) 0.0 else (nij / n) * math.log(n * nij / (ni * nj))
      val s = cell(c1p, df1, np) + cell(c1n, df1, nn) +
        cell(np - c1p, n - df1, np) + cell(nn - c1n, n - df1, nn)
      math.floor(s * 1e6 + 0.5) / 1e6
    }
    assert(mi("signal")._2 === brute("signal"))
    assert(mi("noise")._2 === brute("noise"))
  }
}
