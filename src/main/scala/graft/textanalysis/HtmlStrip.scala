package graft.textanalysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML boilerplate stripping — the first transform a web-crawl corpus
  * sees before any quality/dedup pass: drop script/style blocks, strip
  * the remaining tags, decode the handful of entities that survive
  * into training text, and collapse the whitespace the markup leaves
  * behind.
  *
  * Everything is a single-pass column expression over the scan — no
  * UDF, no per-row state — so the strip rides whole-stage codegen and
  * scales with the read. The regexes are RE2-compatible (non-greedy
  * `.*?` under an inline `(?s)`, no lookaround, no backreferences), so
  * the DuckDB oracle replays the identical transform.
  *
  * Order matters and is fixed: BLOCKS before TAGS (otherwise the
  * script's code body leaks into the text once its tags are gone),
  * TAGS before ENTITIES (so `&lt;b&gt;` decodes to a literal `<b>`
  * that is kept as text, the HTML-source behavior), `&amp;` LAST among
  * entities (else `&amp;lt;` would double-decode). */
object HtmlStrip {

  /** script/style elements whose CONTENT must go with the tags.
    * ONE pattern per element name — an alternation on both sides
    * (`<(script|style)>.*?</(script|style)>`) would let a
    * `<script>...</style>` mismatch close a script block early, and
    * RE2 (the DuckDB replay engine) has no backreferences to pair
    * them. `(?i)` because real crawls carry `<SCRIPT>`/`<Style>`;
    * `(?s)` so the body may span lines; non-greedy so back-to-back
    * blocks don't fuse; `[^>]*` tolerates attributes; `\s*` tolerates
    * whitespace before the closing `>`. */
  val BlockPatterns: Seq[String] = Seq("script", "style").map(el =>
    s"(?is)<$el[^>]*>.*?</$el\\s*>")

  /** Any remaining tag, including comments' delimiters. */
  val TagPattern = "<[^>]*>"

  /** Literal entity decodes, applied in order — `&amp;` last. */
  val Entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")

  /** Number of tags in the raw markup (audit side — a near-zero tag
    * count on a "web" source is itself a signal the upstream extractor
    * already ran). */
  def tagCount(html: Column): Column =
    size(regexp_extract_all(html, lit(TagPattern), lit(0)))

  /** The markup reduced to whitespace-normalized text. */
  def strip(html: Column): Column = {
    val noBlocks = BlockPatterns.foldLeft(html)(
      (c, p) => regexp_replace(c, p, " "))
    val noTags = regexp_replace(noBlocks, TagPattern, " ")
    val decoded = Entities.foldLeft(noTags) { case (c, (e, r)) =>
      replace(c, lit(e), lit(r))
    }
    trim(regexp_replace(decoded, "[ \\t\\r\\n]+", " "))
  }
}
