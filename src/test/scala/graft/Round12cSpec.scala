package graft

import org.apache.spark.sql.functions._
import graft.graph.PageRank
import graft.textanalysis.InvertedIndex

/** Personalized PageRank + sparse-cosine pairs vs in-memory oracles. */
class Round12cSpec extends SparkTestBase {
  import spark.implicits._

  test("personalized PR: locality, zero off-component, mass at seeds") {
    // two disconnected components; seeds only in the first
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("x", "y"), ("y", "x")).toDF("s", "d")
    val pr = PageRank.personalized(edges, "s", "d", Seq("a"),
        iterations = 4)
      .as[(String, Double)].collect().toMap
    assert(pr("x") === 0.0 && pr("y") === 0.0,
      "nodes unreachable from the seeds must score exactly 0")
    assert(pr("a") > 0.0 && pr("b") > 0.0 && pr("c") > 0.0)
    // round 1 pushes the whole seed mass to b: b leads the cycle
    assert(pr("b") > pr("c"), "mass flows along the cycle from the seed")
    // global PR on the same graph ranks the second component > 0
    val global = PageRank(edges, "s", "d", iterations = 4)
      .as[(String, Double)].collect().toMap
    assert(global("x") > 0.0, "contrast: global PR has no locality")
  }

  test("auc equals brute-force Mann-Whitney, ties at half credit") {
    val rnd = new scala.util.Random(71)
    // coarse scores force heavy ties — the half-credit path matters
    val rows = Seq.fill(2000)((rnd.nextInt(20) / 20.0,
      rnd.nextBoolean()))
    val df = rows.toDF("s", "y")
    val got = graft.operators.Auc.auc(df, col("s"), col("y"),
        k = 256, nLanes = 8)
      .as[(Double, Long, Long)].head()
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; q <- neg) yield
      if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
    val want = math.floor(wins / (pos.size.toDouble * neg.size) * 1e6
      + 0.5) / 1e6
    assert(got === ((want, pos.size.toLong, neg.size.toLong)))
    // degenerate: single-class input yields an empty frame, not 0/0
    assert(graft.operators.Auc.auc(df.where(col("y")), col("s"),
      col("y")).count() === 0)
  }

  test("gini equals brute force; edges behave") {
    val rnd = new scala.util.Random(91)
    val xs = Seq.fill(3000)(rnd.nextInt(50).toLong) // heavy ties
    val got = graft.operators.Gini.gini(xs.toDF("x"), col("x"),
        k = 256, nLanes = 8)
      .as[(Double, Long, Long)].head()
    val sorted = xs.sorted
    val n = xs.size
    val t = xs.sum
    val rankSum = sorted.zipWithIndex
      .map { case (x, i) => x * (i + 1).toLong }.sum
    val want = math.floor((2.0 * rankSum / (n.toDouble * t) -
      (n + 1).toDouble / n) * 1e6 + 0.5) / 1e6
    assert(got === ((want, n.toLong, t)))
    // all-equal values -> 0
    assert(graft.operators.Gini.gini(Seq.fill(50)(7L).toDF("x"),
      col("x"), nLanes = 2).head().getDouble(0) === 0.0)
    // maximal concentration -> close to 1
    val conc = (Seq.fill(99)(0L) :+ 1000L).toDF("x")
    assert(graft.operators.Gini.gini(conc, col("x"), nLanes = 2)
      .head().getDouble(0) === 0.99)
    // negative values fail loudly
    intercept[Exception] {
      graft.operators.Gini.gini(Seq(-1L, 2L).toDF("x"), col("x"))
        .collect()
    }
    // empty -> empty, not 0/0
    assert(graft.operators.Gini.gini(
      Seq(1L).toDF("x").where(lit(false)), col("x")).count() === 0)
  }

  test("sparseCosinePairs equals the brute-force tf-idf cosine") {
    val docs = Seq(
      (1L, "apple banana cherry apple"),
      (2L, "apple banana cherry"),
      (3L, "dog cat mouse"),
      (4L, "dog cat mouse dog"),
      (5L, "apple dog zebra"))
      .toDF("doc_id", "text")
    val n = 5L
    val got = InvertedIndex.sparseCosinePairs(docs, "doc_id", "text",
        n, maxDfFrac = 1.0, minSim = 0.0)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // brute force with the same 1e6-scaled long weights
    val corpus = Seq(
      1L -> Seq("apple", "banana", "cherry", "apple"),
      2L -> Seq("apple", "banana", "cherry"),
      3L -> Seq("dog", "cat", "mouse"),
      4L -> Seq("dog", "cat", "mouse", "dog"),
      5L -> Seq("apple", "dog", "zebra"))
    val dfm = corpus.flatMap(_._2.distinct).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    def wts(toks: Seq[String]): Map[String, Long] =
      toks.groupBy(identity).view.mapValues(_.size).toMap
        .filter { case (t, _) => dfm(t) >= 2 } // df window
        .map { case (t, tf) =>
          t -> math.floor(tf * math.log(n.toDouble / dfm(t)) * 1e6
            + 0.5).toLong
        }.toMap
    val wmap = corpus.map { case (id, t) => id -> wts(t) }.toMap
    for (a <- corpus.map(_._1); b <- corpus.map(_._1) if a < b) {
      val (wa, wb) = (wmap(a), wmap(b))
      val shared = wa.keySet.intersect(wb.keySet)
      val num = shared.toSeq.map(t => wa(t) * wb(t)).sum
      val na = wa.values.map(w => w * w).sum
      val nb = wb.values.map(w => w * w).sum
      if (num > 0) {
        val cos = num.toDouble /
          (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
        assert(math.abs(got((a, b)) - cos) < 1e-12,
          s"pair ($a,$b): ${got.get((a, b))} vs $cos")
      } else assert(!got.contains((a, b)),
        s"pair ($a,$b) shares no surviving term")
    }
  }
}
