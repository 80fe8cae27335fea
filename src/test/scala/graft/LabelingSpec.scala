package graft

import org.apache.spark.sql.functions._
import graft.operators.Labeling

/** Property pins for the labeling-panel suite: consensus tie-break
  * determinism, rater accuracy against it, and Krippendorff's alpha
  * boundary/known values. */
class LabelingSpec extends SparkTestBase {
  import spark.implicits._

  test("consensus: majority wins, ties break on label ASC, confidence " +
    "and unanimity are exact") {
    val df = Seq(
      ("i1", "y"), ("i1", "y"), ("i1", "n"), // majority y, 2/3
      ("i2", "b"), ("i2", "a"), // tie -> a
      ("i3", "x")) // singleton -> unanimous
      .toDF("item", "label")
    val got = Labeling.consensus(df, col("item"), col("label"))
      .orderBy("item").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getBoolean(5)))
    assert(got.toSeq === Seq(
      ("i1", "y", 2L, 3L, 0.666667, false),
      ("i2", "a", 1L, 2L, 0.5, false),
      ("i3", "x", 1L, 1L, 1.0, true)))
  }

  test("consensus is input-order invariant (the tie-break is a rule, " +
    "not an arrival accident)") {
    val rows = Seq(("i", "b"), ("i", "a"), ("i", "c"), ("i", "a"),
      ("i", "b"))
    val fwd = Labeling.consensus(rows.toDF("item", "label"),
      col("item"), col("label")).head()
    val rev = Labeling.consensus(rows.reverse.toDF("item", "label"),
      col("item"), col("label")).head()
    assert(fwd.toSeq === rev.toSeq)
    assert(fwd.getString(1) === "a", "2-2 tie must land on 'a'")
  }

  test("rater accuracy: a rater that always matches consensus scores 1, " +
    "a contrarian scores 0") {
    val df = Seq(
      ("i1", "good", "y"), ("i1", "good", "y"), ("i1", "bad", "n"),
      ("i2", "good", "n"), ("i2", "good", "n"), ("i2", "bad", "y"))
      .toDF("item", "rater", "label")
    val got = Labeling.raterAccuracy(df, col("item"), col("rater"),
        col("label"))
      .orderBy("rater").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq(("bad", 2L, 0L, 0.0), ("good", 4L, 4L, 1.0)))
  }

  test("rater accuracy scores against the RATER-FILTERED consensus: a " +
    "null-rater rating cannot swing the consensus it is scored against") {
    // with the anonymous (null-rater) 'y' votes counted, i1's consensus
    // would be y; rater-filtered it is a 1-1 x/y tie -> x (label ASC)
    val df = Seq(
      ("i1", "A", "x"), ("i1", "B", "y"),
      ("i1", null, "y"), ("i1", null, "y"))
      .toDF("item", "rater", "label")
    val got = Labeling.raterAccuracy(df, col("item"), col("rater"),
        col("label"))
      .orderBy("rater").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq(("A", 1L, 1L, 1.0), ("B", 1L, 0L, 0.0)))
  }

  test("krippendorff alpha: perfect agreement is 1, singletons are " +
    "excluded, and the textbook mixed panel lands on its hand value") {
    val perfect = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"),
      ("c", "z")) // c is unpairable
      .toDF("item", "label")
    val p = Labeling.krippendorffAlpha(perfect, col("item"), col("label"))
      .head()
    assert(p.getAs[Long]("n_units") === 2L &&
      p.getAs[Long]("n_ratings") === 4L &&
      p.getAs[Double]("alpha") === 1.0)
    // hand example: u1 (y,y), u2 (y,n), u3 (n,n) -> n=6, margins
    // y=3,n=3; D_o = (1/6)*(0 + 2/1 + 0)... per-unit disagreements:
    // u2 contributes 1*1+1*1=2 over (2-1) -> 2; D_o = 2/6 = 1/3;
    // D_e = (36-18)/(6*5) = 0.6; alpha = 1 - (1/3)/0.6 = 0.444444...
    val mixed = Seq(("u1", "y"), ("u1", "y"), ("u2", "y"), ("u2", "n"),
      ("u3", "n"), ("u3", "n")).toDF("item", "label")
    val m = Labeling.krippendorffAlpha(mixed, col("item"), col("label"))
      .head()
    assert(m.getAs[Double]("d_o") === 0.333333 &&
      m.getAs[Double]("d_e") === 0.6 &&
      m.getAs[Double]("alpha") === 0.444444,
      s"got ${m.toSeq}")
    // order invariance
    val rev = Labeling.krippendorffAlpha(
      Seq(("u3", "n"), ("u2", "n"), ("u1", "y"), ("u1", "y"),
        ("u2", "y"), ("u3", "n")).toDF("item", "label"),
      col("item"), col("label")).head()
    assert(rev.toSeq === m.toSeq)
  }

  test("krippendorff alpha: systematic disagreement goes negative") {
    // every unit splits 1-1 across two labels: D_o maximal
    val df = (1 to 10).flatMap(i => Seq((s"u$i", "y"), (s"u$i", "n")))
      .toDF("item", "label")
    val a = Labeling.krippendorffAlpha(df, col("item"), col("label"))
      .head()
    assert(a.getAs[Double]("alpha") < 0.0,
      s"1-1 splits everywhere must be worse than chance: ${a.toSeq}")
  }
}
