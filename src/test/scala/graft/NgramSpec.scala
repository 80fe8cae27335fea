package graft

import org.apache.spark.sql.functions._
import graft.textanalysis.TextAnalysis

/** Word n-gram extraction and corpus frequency: window semantics, the
  * null/blank/short-text edges (where Spark's descending `sequence(1,0)`
  * would silently fabricate grams), and deterministic top-k ordering.
  */
class NgramSpec extends SparkTestBase {
  import spark.implicits._

  private def grams(text: Option[String], n: Int): Seq[String] = {
    val r = Seq(text).toDF("text")
      .select(TextAnalysis.ngrams(col("text"), n).as("g")).head()
    if (r.isNullAt(0)) null else r.getSeq[String](0)
  }

  test("bigrams and trigrams are consecutive token windows") {
    assert(grams(Some("a b c d"), 2) === Seq("a b", "b c", "c d"))
    assert(grams(Some("a b c d"), 3) === Seq("a b c", "b c d"))
    assert(grams(Some("  a   b  "), 2) === Seq("a b")) // whitespace runs
    assert(grams(Some("solo"), 1) === Seq("solo"))
  }

  test("null, blank, and shorter-than-n texts yield no grams") {
    assert(grams(None, 2) === null) // explode() drops it downstream
    assert(grams(Some(""), 2) === Seq.empty)
    assert(grams(Some("   "), 2) === Seq.empty)
    assert(grams(Some("one"), 2) === Seq.empty)
  }

  test("topNgrams counts occurrences with deterministic tie order") {
    val docs = Seq(
      (1L, "x y x y z"),  // "x y" twice, "y x", "y z"
      (2L, "x y q"),      // "x y" again, "y q"
      (3L, null.asInstanceOf[String]),
      (4L, "")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.topNgrams(docs, "text", 2, 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.head === ("x y", 3L))
    // remaining all count 1, ordered lexically
    assert(top.tail.toSeq === Seq(("y q", 1L), ("y x", 1L)))
  }

  test("top-k plans as TakeOrderedAndProject (no global sort)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = TextAnalysis.topNgrams(docs, "text", 2, 50)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$p")
  }
}
