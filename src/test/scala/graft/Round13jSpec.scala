package graft

import org.apache.spark.sql.functions._
import graft.functions.NfcNormalize

/** Round-13j semantic pins: NFC composition semantics and the
  * curation-3 pipeline's cut composition. */
class Round13jSpec extends SparkTestBase {
  import spark.implicits._

  private def nfc1(s: String): String =
    Seq(s).toDF("x").select(NfcNormalize(col("x"))).head().getString(0)

  test("NfcNormalize composes decomposed sequences, is a no-op on NFC text") {
    val decomp = "caf" + "é"
    val precomp = "café"
    assert(decomp !== precomp, "fixture must start decomposed")
    assert(nfc1(decomp) === precomp)
    assert(nfc1(precomp) === precomp)
    assert(nfc1("plain ascii") === "plain ascii")
    // multiple combining marks in one string
    assert(nfc1("ö ú") === "ö ú")
  }

  test("NfcNormalize: null in, null out") {
    // the SQL surface (nfc_normalize) is pinned in
    // ExtensionsRegistrationSpec, whose session carries the extensions
    val r = Seq((1, null: String)).toDF("id", "x")
      .select(NfcNormalize(col("x"))).head()
    assert(r.isNullAt(0))
  }

  test("pipeline_curation3 output satisfies both cuts") {
    val out = queries.Round13j.defs("pipeline_curation3")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    // budget cut: inclusive cumsum per source never exceeds 800
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(3)).max <= 800L)
    }
    // coverage cut: recompute dup_frac over the same cleaned corpus
    val clean = queries.tbl(spark, sf, "documents")
      .where(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        graft.textanalysis.HtmlStrip.strip(
          queries.Round13e.htmlExpr).as("text"))
    val frac = graft.dedup.NgramSpans.coverage(clean, "doc_id", "text", 4)
      .select("doc_id", "dup_frac").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.foreach { r =>
      assert(frac(r.getLong(1)) <= 0.5,
        s"doc ${r.getLong(1)} passed the cut with frac ${frac(r.getLong(1))}")
    }
  }
}
