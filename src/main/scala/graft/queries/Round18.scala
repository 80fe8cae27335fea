package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.textanalysis.TextAnalysis

/** Round-18 batch: winnowed-minimizer ExactSubstr dedup (the shuffle
  * diet for the round-17 gram chain), JPEG corruption tolerance, and
  * the composed curation capstone (exact-substr cut → near-dup →
  * importance selection — the Lee et al. 2107.06499 pipeline order). */
object Round18 {

  /** The paper's threshold: 50 characters (same as round 17). */
  private val SubstrMinLen = 50

  /** Minimizer k-gram length: w = 50 - 8 + 1 = 43, selection density
    * ~2/(w+1) ≈ 4.5% of char positions. */
  private val MinimizerK = 8

  val defs: Map[String, Q] = Map(

    // winnowed ExactSubstr: same semantics, same output, the gram
    // shuffles cut ~w/2x by minimizer pre-selection; the oracle is the
    // SAME full-chain DuckDB replay as dedup_exact_substr because the
    // minimized chain is output-identical by the winnowing guarantee
    "dedup_exact_substr_min" -> ((s, dir) =>
      TextAnalysis.exactSubstrDedupMinimized(tbl(s, dir, "documents"),
          "doc_id", "text", minLen = SubstrMinLen, k = MinimizerK)
        .orderBy("doc_id")),

    // JPEG corruption tolerance (the xls-tier contract for the lossy
    // image tier): per id the REAL JPEG bytes are corrupted through
    // three deterministically-failing classes (no-magic, garbage,
    // header-only) — corrupt rows book ok=false with null features,
    // intact rows replay dims + dHash from the fixture formula, and
    // no payload ever throws a task
    "mm_jpeg_tolerance" -> ((s, dir) =>
      Multimodal.jpegDHashesTolerant(tbl(s, dir, "documents"), "doc_id",
          quality = 0.9f)
        .toDF().orderBy("doc_id")))

  val oracles: Map[String, String] = Map(

    "dedup_exact_substr_min" ->
      s"""WITH ${Round17.exactSubstrCtes(SubstrMinLen)}
       SELECT d.id AS doc_id, d.len::BIGINT AS n_chars,
         coalesce(cut.nrem, 0)::BIGINT AS n_removed,
         CASE WHEN cut.id IS NULL THEN d.text
           ELSE cut.pre || substr(d.text, cut.laste + 1) END AS clean_text
       FROM d LEFT JOIN cut ON cut.id = d.id
       ORDER BY doc_id""",

    // replays testJpegCell/testJpegDHash for the intact class
    // (doc_id % 4 = 0) exactly as mm_jpeg_real's oracle; the three
    // corruption classes yield NULL features
    "mm_jpeg_tolerance" ->
      """WITH d AS (SELECT doc_id, CAST(3 + doc_id % 3 AS INT) AS cs,
             doc_id % 4 = 0 AS ok
           FROM documents),
         b AS (SELECT doc_id, cs, unnest(generate_series(0, 63)) AS i
           FROM d WHERE ok),
         v AS (SELECT doc_id, cs, i,
             ((doc_id // (1::BIGINT << CAST(i // 8 AS INT))) + (i % 8))
               % 2 AS bit
           FROM b),
         h AS (SELECT doc_id,
             CAST(sum(CASE WHEN bit = 1 THEN
               CASE WHEN i = 63 THEN -9223372036854775807 - 1
                 ELSE 1::BIGINT << CAST(i AS INT) END
               ELSE 0 END) AS BIGINT) AS dhash
           FROM v GROUP BY 1)
       SELECT d.doc_id, d.ok,
         CASE WHEN d.ok THEN CAST(9 * d.cs AS INT) END AS width,
         CASE WHEN d.ok THEN CAST(8 * d.cs AS INT) END AS height,
         h.dhash
       FROM d LEFT JOIN h USING (doc_id) ORDER BY doc_id""")
}
