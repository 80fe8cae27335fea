package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Analytics
import graft.streaming.EventWindows
import graft.textanalysis.TextAnalysis

/** Round-7 analytics batch: skew-salted aggregation, per-group top-k /
  * mode, funnel + cohort retention, quantile bucketing and filtering,
  * fixed-width histograms, set intersection, unpivot, and char-entropy
  * quality scoring. Every gate pairs the distributed Spark shape with a
  * DuckDB-replayable oracle.
  */
object Analytics7 {

  /** One week in nanoseconds (events.ts is BIGINT ns under nanosAsLong). */
  private val WeekNs = 604800L * 1000000000L

  /** Decile grid for the quantile-bucket gate. */
  private val DecileProbs: Seq[Double] = (1 to 9).map(_ / 10.0)

  /** The funnel gate's ordered steps. */
  private[graft] val FunnelSteps = Seq("view", "click", "purchase")

  val defs: Map[String, Q] = Map(
    // skewed low-cardinality key (5 event types): two-stage salted agg,
    // result row-identical to the direct groupBy the oracle computes
    "agg_salted_skew" -> ((s, dir) =>
      Analytics.saltedStats(tbl(s, dir, "events"), Seq("event_type"),
          "value", saltCols = Seq("event_id"), salts = 16)
        .orderBy("event_type")),

    // top-3 orders per status; salts=8 exercises the skew-proof two-level
    // window (per-lane local top-k, then per-group top-k over <= 8*3 rows)
    "sort_topk_group" -> ((s, dir) =>
      Analytics.topKPerGroup(tbl(s, dir, "orders"), Seq("o_orderstatus"),
          "o_totalprice", k = 3, tieCols = Seq("o_orderkey"), salts = 8)
        .select("o_orderstatus", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_orderstatus", "rk")),

    // most frequent priority per status, ties to the smallest value;
    // the rank window runs on the counted table, never raw rows
    "agg_mode" -> ((s, dir) =>
      Analytics.modePerGroup(tbl(s, dir, "orders"), Seq("o_orderstatus"),
          "o_orderpriority")
        .orderBy("o_orderstatus")),

    // view -> click -> purchase conversion, greedy earliest-match; a
    // chain of user-key equi-joins, no per-user event collection
    "funnel_steps" -> ((s, dir) =>
      Analytics.funnel(tbl(s, dir, "events"), "user_id", "event_type",
          "ts", FunnelSteps)
        .orderBy("step_idx")),

    // weekly cohort x week-offset distinct-user retention grid
    "cohort_retention" -> ((s, dir) =>
      Analytics.cohortRetention(tbl(s, dir, "events"), "user_id",
          EventWindows.nsDiv(col("ts"), WeekNs))
        .orderBy("cohort_week", "week_offset")),

    // decile assignment by exact broadcast cutpoints — the 100 TB-safe
    // replacement for a global ntile() window — then per-bucket totals
    "agg_quantile_bucket" -> ((s, dir) => {
      val orders = tbl(s, dir, "orders")
      val cuts = Analytics.quantileCutpoints(orders, "o_totalprice",
        DecileProbs)
      Analytics.bucketByCutpoints(orders, "o_totalprice", cuts)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("v_sum"))
        .orderBy("bucket")
    }),

    // keep documents at or above the corpus p75 quality: one 1-row
    // exact-percentile reduce broadcast back as a map-side filter
    "filter_quantile" -> ((s, dir) => {
      val q = tbl(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
      val cut = Analytics.quantileCutpoints(q, "quality", Seq(0.75))
      q.join(broadcast(cut))
        .filter(col("quality") >= round(element_at(col("__cuts"), 1), 6))
        .select("doc_id", "quality")
        .orderBy("doc_id")
    }),

    // fixed-width price histogram: pure-map bin id + one partial-agg
    // shuffle; constant bounds, no extra min/max pass
    "agg_histogram" -> ((s, dir) =>
      Analytics.histogram(tbl(s, dir, "lineitem"), "l_extendedprice",
          lo = 0.0, width = 5000.0)
        .orderBy("bin")),

    // customers appearing in BOTH order-status key sets (distinct
    // INTERSECT semantics, same as the SQL set operator)
    "set_intersect" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
        .intersect(
          o.filter(col("o_orderstatus") === "O")
            .select(col("o_custkey").as("custkey")))
        .orderBy("custkey")
    }),

    // wide-to-long melt of the lineitem measures (Dataset.unpivot);
    // narrow op — each input row fans out to 4, no shuffle
    "project_unpivot" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 100)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "value")
        .orderBy("l_orderkey", "l_linenumber", "measure")),

    // character-unigram entropy (gibberish/boilerplate signal); zero
    // shuffle — the whole computation happens within each row
    "text_entropy" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.charEntropy(col("text")).as("entropy"))
        .orderBy("doc_id"))
  )

  /** The text_quality oracle's scoring CTE, reused by filter_quantile so
    * the two gates cannot drift. Yields q(doc_id, quality). */
  private val QualitySql =
    """t AS (SELECT doc_id, text,
         CASE WHEN length(trim(text)) = 0 THEN 0.0
           ELSE len(regexp_split_to_array(trim(text), '\s+'))::DOUBLE
           END AS n,
         length(text)::DOUBLE AS len,
         len(list_filter(regexp_split_to_array(trim(text), '\s+'),
           x -> list_contains(['the','a','and','of','to','in'], x)))::DOUBLE AS stop,
         (length(text) - length(regexp_replace(text, '[.,;:!?''"()-]', '', 'g')))::DOUBLE AS punct,
         length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE AS nospace
         FROM documents),
       q AS (SELECT doc_id,
         floor((least(n / 50.0, 1.0) * 0.3
           + (CASE WHEN n = 0 THEN 0.0 ELSE stop / n END) * 0.3
           + (1.0 - CASE WHEN len = 0 THEN 0.0 ELSE punct / len END) * 0.2
           + least((CASE WHEN n = 0 THEN 0.0 ELSE nospace / n END) / 8.0,
               1.0) * 0.2) * 1000.0 + 0.5) / 1000.0
           AS quality
         FROM t)"""

  /** Funnel oracle CTE chain generated from [[FunnelSteps]] so the two
    * sides cannot drift. */
  private def funnelOracleSql(steps: Seq[String]): String = {
    val ctes = steps.zipWithIndex.map { case (step, i) =>
      if (i == 0)
        s"""s1 AS (SELECT user_id, min(ts) AS t FROM events
           WHERE event_type = '$step' GROUP BY user_id)"""
      else
        s"""s${i + 1} AS (SELECT e.user_id, min(e.ts) AS t FROM events e
           JOIN s$i ON e.user_id = s$i.user_id AND e.ts > s$i.t
           WHERE e.event_type = '$step' GROUP BY e.user_id)"""
    }.mkString(",\n       ")
    val selects = steps.zipWithIndex.map { case (step, i) =>
      s"""SELECT CAST(${i + 1} AS INT) AS step_idx, '$step' AS step,
         count(*) AS n_users FROM s${i + 1}"""
    }.mkString(" UNION ALL ")
    s"WITH $ctes $selects ORDER BY step_idx"
  }

  val oracles: Map[String, String] = Map(
    "agg_salted_skew" ->
      """SELECT event_type, count(*) AS n, min(value) AS v_min,
         max(value) AS v_max, round(sum(value), 2) AS v_sum,
         round(sum(value) / count(*), 2) AS v_avg
         FROM events GROUP BY event_type ORDER BY event_type""",

    "sort_topk_group" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
           CAST(rk AS INT) AS rk
         FROM (SELECT o_orderstatus, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderstatus
               ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders) r
         WHERE rk <= 3 ORDER BY o_orderstatus, rk""",

    "agg_mode" ->
      """WITH c AS (SELECT o_orderstatus, o_orderpriority, count(*) AS n
           FROM orders GROUP BY o_orderstatus, o_orderpriority)
         SELECT o_orderstatus, o_orderpriority AS mode_value,
           n AS mode_count
         FROM (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
             ORDER BY n DESC, o_orderpriority) AS rk FROM c) r
         WHERE rk = 1 ORDER BY o_orderstatus""",

    "funnel_steps" -> funnelOracleSql(FunnelSteps),

    "cohort_retention" ->
      """WITH w AS (SELECT user_id AS u,
           epoch_ns(ts) // 604800000000000 AS w FROM events),
         f AS (SELECT u, min(w) AS cohort_week FROM w GROUP BY u)
         SELECT cohort_week, w.w - cohort_week AS week_offset,
           count(DISTINCT w.u) AS n_users
         FROM w JOIN f ON w.u = f.u
         GROUP BY cohort_week, week_offset
         ORDER BY cohort_week, week_offset""",

    // cutpoints rounded to 6 dp on BOTH sides before the compare: Spark
    // interpolates (1-g)*a + g*b, DuckDB a + (b-a)*g — ulp-different
    "agg_quantile_bucket" ->
      """WITH c AS (SELECT quantile_cont(o_totalprice,
           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cuts
           FROM orders)
         SELECT CAST(1 + len(list_filter(c.cuts,
             x -> o_totalprice > round(x, 6))) AS INT) AS bucket,
           count(*) AS n, round(sum(o_totalprice), 2) AS v_sum
         FROM orders, c GROUP BY 1 ORDER BY 1""",

    "filter_quantile" ->
      s"""WITH $QualitySql,
         c AS (SELECT quantile_cont(quality, 0.75) AS cut FROM q)
         SELECT doc_id, quality FROM q, c
         WHERE quality >= round(cut, 6) ORDER BY doc_id""",

    "agg_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bin,
         count(*) AS n, round(sum(l_extendedprice), 2) AS v_sum
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "set_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
         INTERSECT
         SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
         ORDER BY custkey""",

    "project_unpivot" ->
      """SELECT l_orderkey, l_linenumber, m AS measure, v AS value
         FROM (
           SELECT l_orderkey, l_linenumber, 'l_quantity' AS m,
             l_quantity AS v FROM lineitem WHERE l_orderkey <= 100
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'l_extendedprice',
             l_extendedprice FROM lineitem WHERE l_orderkey <= 100
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
           FROM lineitem WHERE l_orderkey <= 100
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
           FROM lineitem WHERE l_orderkey <= 100) u
         ORDER BY l_orderkey, l_linenumber, measure""",

    // H = ln L - sum(n_c * ln n_c)/L over distinct chars; 4-dp floor
    // rounding, identical formula to TextAnalysis.charEntropy
    "text_entropy" ->
      """SELECT doc_id,
         CASE WHEN text IS NULL OR length(text) = 0 THEN 0.0
           ELSE floor((ln(length(text)::DOUBLE)
             - list_sum(list_transform(list_distinct(string_split(text, '')),
                 c -> (length(text) - length(replace(text, c, '')))::DOUBLE
                   * ln((length(text) - length(replace(text, c, '')))::DOUBLE)))
               / length(text)::DOUBLE) * 10000 + 0.5) / 10000
           END AS entropy
         FROM documents ORDER BY doc_id"""
  )
}
