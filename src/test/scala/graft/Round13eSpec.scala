package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Entropy, TokenBudget}
import graft.textanalysis.{HtmlStrip, Oov}

/** Round-13e semantic pins: the HTML-strip stage ordering, OOV vocab
  * determinism, token-budget boundary semantics, and the entropy
  * edge cases — the properties the DuckDB hash alone can't
  * articulate. */
class Round13eSpec extends SparkTestBase {
  import spark.implicits._

  private def strip1(s: String): String =
    Seq(s).toDF("h").select(HtmlStrip.strip(col("h"))).head().getString(0)

  test("HtmlStrip removes script/style CONTENT, not just the tags") {
    assert(strip1("a<script>var x = 1 < 2;</script>b") === "a b")
    assert(strip1("a<style>p{color:red}</style>b") === "a b")
    // back-to-back blocks don't fuse (non-greedy body)
    assert(strip1("<script>x</script>keep<script>y</script>") === "keep")
  }

  test("HtmlStrip decodes entities AFTER tags, &amp; last") {
    // &lt;b&gt; is text in the source -> a literal <b> in the output
    assert(strip1("&lt;b&gt;") === "<b>")
    // &amp;lt; is the ESCAPED string '&lt;' -> single decode only
    assert(strip1("&amp;lt;") === "&lt;")
    assert(strip1("""<a href="x">A&nbsp;&amp;&nbsp;B</a>""") === "A & B")
  }

  test("HtmlStrip collapses markup whitespace; tagCount sees raw tags") {
    assert(strip1("<p>\n  a\t b\r\n</p>") === "a b")
    val n = Seq("<p><b>x</b></p><script>y</script>").toDF("h")
      .select(HtmlStrip.tagCount(col("h"))).head().getInt(0)
    assert(n === 6)
  }

  test("Oov vocab is deterministic under count ties (token asc)") {
    val df = Seq("b b a a d c").toDF("text")
    val v = Oov.vocabTopK(df, "text", 2).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(v.toSeq === Seq(("a", 2L), ("b", 2L)))
  }

  test("Oov rate counts occurrences, not distinct tokens") {
    val df = Seq((1L, "a a a zzz"), (2L, "a")).toDF("id", "text")
    val r = Oov.oovRate(df, "id", "text", 1).orderBy("id").collect()
    assert(r(0).getLong(1) === 4L && r(0).getLong(2) === 1L)
    assert(r(0).getDouble(3) === 0.25)
    assert(r(1).getLong(2) === 0L)
  }

  test("TokenBudget excludes the first overflowing doc, per source") {
    val df = Seq(
      ("s1", 1L, "t t t"), ("s1", 2L, "t t t"), ("s1", 3L, "t t"),
      ("s2", 1L, "t t t t t t t")).toDF("source", "doc_id", "text")
    val kept = TokenBudget.cap(df, "source", "doc_id", "text", 6L)
      .orderBy("source", "doc_id").collect()
    // s1: 3+3 fits, doc 3 would reach 8 > 6; s2: first doc 7 > 6
    assert(kept.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("s1", 1L), ("s1", 2L)))
    assert(kept.map(_.getLong(3)).toSeq === Seq(3L, 6L))
  }

  test("TokenBudget matches the window form on the real table") {
    val docs = queries.tbl(spark, sf, "documents")
    val got = TokenBudget.cap(docs, "source", "doc_id", "text", 800L)
    val nTok = when(col("text").isNotNull &&
        length(trim(col("text"))) > 0,
      size(split(trim(col("text")), "\\s+")).cast("long")).otherwise(0L)
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = docs.select(col("source"), col("doc_id"),
        nTok.as("n_tokens"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .where(col("cum_tokens") <= 800L)
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("Entropy: uniform = ln(k), degenerate = 0, nulls bucket as __NA__") {
    val df = Seq(("g1", "a"), ("g1", "b"), ("g1", "c"), ("g1", "d"),
      ("g2", "x"), ("g2", "x"), (null, "y"))
      .toDF("g", "c")
      .union(Seq(("g3", "a")).toDF("g", "c")
        .select(col("g"), lit(null).cast("string").as("c")))
    val r = Entropy.distribution(df, col("g"), col("c"))
      .orderBy("group").collect()
    assert(r.map(_.getString(0)).toSeq === Seq("g1", "g2", "g3"))
    assert(math.abs(r(0).getDouble(3) - math.log(4)) < 1e-5)
    assert(r(1).getDouble(3) === 0.0)
    assert(r(2).getLong(2) === 1L) // the null category is one bucket
  }
}
