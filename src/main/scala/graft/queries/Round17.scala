package graft.queries

import org.apache.spark.sql.functions._

import graft.textanalysis.TextAnalysis

/** Round-17 batch: character-level ExactSubstr deduplication — the
  * Lee et al. 2021 suffix-array pass's semantics (substrings ≥ 50
  * chars occurring more than once corpus-wide are cut, first
  * occurrence kept) via the exact char-gram cover reduction, no suffix
  * array. The word-granularity siblings (`dedup_ngram_spans`,
  * `text_dup_spans`) catch repeated PHRASES; this catches the
  * byte-identical boilerplate runs that cross word boundaries. */
object Round17 {

  /** The paper's threshold: 50 characters. */
  private val SubstrMinLen = 50

  val defs: Map[String, Q] = Map(

    // ExactSubstr (Lee et al. 2107.06499): cut every non-canonical
    // occurrence of a ≥50-char duplicated substring, keep-first;
    // linear char-gram explode + md5-keyed count, per-doc bounded
    // interval merge — no suffix array, no window over data
    "dedup_exact_substr" -> ((s, dir) =>
      TextAnalysis.exactSubstrDedup(tbl(s, dir, "documents"), "doc_id",
          "text", minLen = SubstrMinLen)
        .orderBy("doc_id")))

  val oracles: Map[String, String] = Map(

    "dedup_exact_substr" -> {
      val L = SubstrMinLen
      s"""WITH d AS (SELECT doc_id AS id, text, length(text) AS len
           FROM documents WHERE text IS NOT NULL),
         g AS (SELECT id, i,
             CAST(('0x' || substr(md5(substr(text, i, $L)), 1, 15))
               AS BIGINT) AS k
           FROM d, LATERAL unnest(generate_series(1, len - ${L - 1}))
             t(i)
           WHERE len >= $L),
         o AS (SELECT id, i, count(*) OVER (PARTITION BY k) AS n,
             row_number() OVER (PARTITION BY k ORDER BY id, i) AS rn
           FROM g),
         dup AS (SELECT id, i AS s, i + ${L - 1} AS e
           FROM o WHERE n >= 2 AND rn > 1),
         isl AS (SELECT id, s, e, CASE WHEN s >
               coalesce(lag(e) OVER (PARTITION BY id ORDER BY s), 0) + 1
             THEN 1 ELSE 0 END AS brk
           FROM dup),
         grpd AS (SELECT id, s, e,
             sum(brk) OVER (PARTITION BY id ORDER BY s) AS grp
           FROM isl),
         mrg AS (SELECT id, grp, min(s) AS s, max(e) AS e
           FROM grpd GROUP BY 1, 2),
         seg AS (SELECT id, s, e,
             coalesce(lag(e) OVER (PARTITION BY id ORDER BY s), 0) AS pe
           FROM mrg),
         cut AS (SELECT seg.id, sum(seg.e - seg.s + 1)::BIGINT AS nrem,
             string_agg(substr(d.text, seg.pe + 1, seg.s - seg.pe - 1),
               '' ORDER BY seg.s) AS pre,
             max(seg.e) AS laste
           FROM seg JOIN d USING (id) GROUP BY seg.id)
       SELECT d.id AS doc_id, d.len::BIGINT AS n_chars,
         coalesce(cut.nrem, 0)::BIGINT AS n_removed,
         CASE WHEN cut.id IS NULL THEN d.text
           ELSE cut.pre || substr(d.text, cut.laste + 1) END AS clean_text
       FROM d LEFT JOIN cut ON cut.id = d.id
       ORDER BY doc_id"""
    })
}
