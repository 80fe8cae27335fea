package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function surface of the graft engine (SURVEY.md §2.7).
  *
  * Everything here is a composition of built-in, codegen-friendly
  * `org.apache.spark.sql.functions` — no UDFs. The single genuinely novel
  * scalar, the locale-tolerant numeric parse, is a native Catalyst
  * expression ([[ParseLocaleNumber]]).
  */
object GraftFunctions {

  /** F1 — key normalization: `str(x).strip().lower()`, null-preserving
    * (ref `Actualizar_Precios_de_Nexo.py:76-78`). */
  def normKey(c: Column): Column = lower(trim(c.cast("string")))

  /** F2 — collapse internal whitespace + trim (ref `:80-82`). */
  def cleanWs(c: Column): Column = regexp_replace(trim(c.cast("string")), "\\s+", " ")

  /** F3 — locale-tolerant numeric parse (ref `:104-128`); custom expression. */
  def localeNum(c: Column): Column = ParseLocaleNumber.localeNum(c)

  private val Sentinels = Seq("", "NA", "N/A", "#N/A", "#ND", "None", "null", "-")

  /** F4 — `_safe_num` (ref `python_json.py:64-78`): sentinel strings to
    * null, then es-PE fixed-locale parse (`.` thousands, `,` decimal). */
  def safeNum(c: Column): Column = {
    val s = trim(c.cast("string"))
    val cleaned = regexp_replace(regexp_replace(s, "\\.", ""), ",", ".")
    when(s.isNull || s.isin(Sentinels: _*), lit(null).cast("double"))
      .otherwise(cleaned.try_cast("double"))
  }

  /** F5 — integer-string canonicalization: `"101.0"` -> `"101"`; otherwise
    * the trimmed string (ref `:243-250`). Unit numbers must join as text. */
  def canonUnit(c: Column): Column = {
    val s = trim(c.cast("string"))
    when(s.rlike("^\\d+(\\.\\d+)?$"), s.cast("double").cast("long").cast("string"))
      .otherwise(s)
  }

  /** F6 — accent folding for header/metadata text (ref `python_json.py:44-48`). */
  def stripAccents(c: Column): Column =
    translate(c, "áéíóúÁÉÍÓÚ", "aeiouAEIOU")

  /** F8/F10 — tolerant casts: invalid input -> null, never an error. */
  def tryTimestamp(c: Column): Column = c.cast("string").try_cast("timestamp")
  def tryDouble(c: Column): Column = c.cast("string").try_cast("double")

  /** F13 — NumPy `isclose(a, b, equal_nan=True)` (ref `:427-434`): true when
    * both null, false when exactly one is null, else |a-b| <= atol+rtol*|b|.
    * Note the asymmetry: rtol scales `b`, matching NumPy. */
  def isClose(a: Column, b: Column, rtol: Double = 1e-5, atol: Double = 1e-8): Column = {
    val close = abs(a - b) <= lit(atol) + lit(rtol) * abs(b)
    when(a.isNull && b.isNull, lit(true))
      .when(a.isNull || b.isNull, lit(false))
      .otherwise(coalesce(close, lit(false)))
  }

  /** F14 — null-sentinel string compare: change = values differ, with
    * null==null counting as no change (ref `:435-436`). */
  def nullSafeNeq(a: Column, b: Column): Column = !(a <=> b)

  /** Document fingerprint: polynomial rolling hash over code points,
    * mod 1e9+7 — the codegen'd [[RollingFingerprint]] expression (one
    * fused byte walk per row, no shuffle). */
  def rollingFingerprint(c: Column): Column = RollingFingerprint(c)

  /** The composable SQL-lambda form the codegen expression replaced —
    * kept as the reference semantics `FingerprintSpec` pins the native
    * kernel against (same contract as `Similarity.dotHof`). */
  def rollingFingerprintHof(c: Column): Column =
    aggregate(
      split(c, ""),
      lit(0L),
      (acc, ch) => pmod(acc * lit(31L) + ascii(ch), lit(1000000007L))
    )

  /** F17 — display currency format (ref `index.html:104-106`:
    * `Intl.NumberFormat("es-PE", {currency: "PEN", maximumFractionDigits:
    * 0})`): `"S/ 1,234,567"` — es-PE groups thousands with commas — and
    * null/NaN renders the dashboard's `"–"` placeholder. Divergence from
    * the browser: Intl separates "S/" from the digits with a no-break
    * space (U+00A0); this emits a plain space for terminal/CSV
    * friendliness. `format_number` alone rounds half-EVEN (1200.5 ->
    * "1,200"), Intl's default `halfExpand` rounds half-up — so the value
    * is pre-rounded with `round()` (half-up) and format_number only
    * groups digits. Presentation-layer only — never feed the output back
    * into math.
    */
  def formatCurrency(c: Column): Column = {
    val d = c.cast("double")
    when(d.isNull || isnan(d), lit("–"))
      .otherwise(concat(lit("S/ "), format_number(round(d, 0), 0)))
  }

  /** URL scalars for web-scale curation — the per-row fields every
    * crawl pipeline groups, filters, and dedups by (per-domain quotas,
    * blocklists, host-level dedup). Pure `regexp_extract` expressions:
    * codegen'd, no UDF, and the patterns avoid lookaround so the same
    * regex replays in RE2-based engines. All return '' on no match
    * (the regexp_extract contract in both Spark and DuckDB).
    *
    * [[urlDomain]] is the last-two-labels approximation of the
    * registered domain — correct for .com/.org/.io-style TLDs; a real
    * public-suffix-list lookup needs a broadcast suffix table, out of
    * scope for a scalar. */
  def urlScheme(url: Column): Column =
    regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)

  /** Hostname without userinfo or port. */
  def urlHost(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1)

  /** Registered domain, last-two-labels approximation. */
  def urlDomain(url: Column): Column =
    regexp_extract(urlHost(url), "([^.]+\\.[^.]+)$", 1)

  /** Path component ('' when the URL has none). */
  def urlPath(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)

  /** Value of query parameter `name` ('' when absent). `name` must be
    * regex-literal (no metacharacters). */
  def urlParam(url: Column, name: String): Column =
    regexp_extract(url, s"[?&]$name=([^&#]*)", 1)

  /** Register SQL-callable names for the custom expressions on a session.
    * Idempotent; lets `spark.sql("... locale_num(col) ...")` work. */
  def register(spark: SparkSession): Unit = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(
        "locale_num", exprs => ParseLocaleNumber(exprs.head), "scala_udf")
  }
}
