package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.functions.GraftFunctions._

/** Paragraph-dedup invariants + URL scalar edge cases. */
class ParagraphUrlSpec extends SparkTestBase {
  import spark.implicits._

  test("paragraphDedup: lossless accounting, global keep-first") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),         // chunks: [a..d],[e..h],[i j]
      (2L, "a b c d x y z w"),              // first chunk dups doc 1's
      (3L, "e f g h e f g h")               // both chunks dup doc 1's 2nd
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text", window = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(out.forall { case (_, n, k, d, _) => k + d === n })
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._5 === "a b c d e f g h i j") // everything first here
    assert(byId(2L)._5 === "x y z w")             // lost its first chunk
    assert(byId(3L)._5 === "")                    // fully deduped
    assert(byId(3L)._4 === 2L)
    // every distinct chunk survives exactly once across the corpus
    val keptChunks = out.flatMap(_._5.split(" ").grouped(4).map(_.mkString(" ")))
      .filter(_.nonEmpty)
    assert(keptChunks.length === keptChunks.distinct.length)
  }

  test("paragraphDedup: within-document repeats collapse too") {
    val docs = Seq((7L, "p q r s p q r s p q r s")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text", window = 4)
      .as[(Long, Long, Long, Long, String)].head()
    assert(out === ((7L, 3L, 1L, 2L, "p q r s")))
  }

  test("paragraphDedup: out-of-range ids fail loudly, never overflow") {
    // with ANSI off, doc_id·2^20 overflows SILENTLY for ids >= 2^43 —
    // keep-first would then pick a wrong canonical occurrence. The
    // runtime assert turns that corruption into an error.
    val bad = Seq((-1L, "w w w w"), (5L, "w w w w"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      graft.dedup.Dedup.paragraphDedup(bad, "doc_id", "text", 4)
        .collect()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
    assert(chain(e).exists(m => m != null && m.contains("packable")))
    val huge = Seq(((1L << 43), "w w w w")).toDF("doc_id", "text")
    intercept[Exception] {
      graft.dedup.Dedup.paragraphDedup(huge, "doc_id", "text", 4)
        .collect()
    }
  }

  test("url scalars: scheme/host/domain/path/param edges") {
    val urls = Seq(
      "https://www.example.com/a/b?ref=x&y=2#frag",
      "http://user:pw@sub.host.org:8080/only",
      "https://plain.io",
      "ftp://files.example.net/pub",
      "not a url at all",
      "https://example.com?ref=only"
    ).toDF("url")
    val got = urls.select(
      urlScheme($"url"), urlHost($"url"), urlDomain($"url"),
      urlPath($"url"), urlParam($"url", "ref"))
      .as[(String, String, String, String, String)].collect()
    assert(got(0) === (("https", "www.example.com", "example.com",
      "/a/b", "x")))
    assert(got(1) === (("http", "sub.host.org", "host.org", "/only", "")))
    assert(got(2) === (("https", "plain.io", "plain.io", "", "")))
    assert(got(3) === (("ftp", "files.example.net", "example.net",
      "/pub", "")))
    assert(got(4) === (("", "", "", "", "")))
    assert(got(5) === (("https", "example.com", "example.com", "",
      "only")))
  }
}
