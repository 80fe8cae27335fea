package graft.queries

import org.apache.spark.sql.functions._

/** Round-13 second batch: the per-segment forms of the exact rank
  * statistics — grouped Gini and grouped ROC AUC — on the grouped
  * laned prefix ([[graft.operators.LanedPrefix.withPrefixGrouped]]):
  * every window partitioned by (group, lane), per-group cut tables,
  * never a per-group global sort. */
object Round13b {

  /** AUC segments: four deterministic holdout slices. Must be coprime
    * with NbHoldoutMod (= 3): the holdout IS doc_id % 3 = 0, so a
    * mod-3 segment key would collapse every holdout doc into one
    * segment. */
  private val AucSegMod = 4

  val defs: Map[String, Q] = Map(

    // per-returnflag Gini of spend cents: "is the concentration a
    // property of the corpus or of one segment" — same exact integer
    // block formula as agg_gini, one row per flag
    "agg_gini_grouped" -> ((s, dir) =>
      graft.operators.Gini.giniGrouped(
        tbl(s, dir, "lineitem")
          .where(col("l_extendedprice").isNotNull &&
            col("l_returnflag").isNotNull),
        col("l_returnflag"),
        floor(col("l_extendedprice") * 100 + 0.5))
        .orderBy("g")),

    // per-slice ROC AUC of the NB classifier on its holdout — the
    // Simpson's-paradox check a single global AUC hides; slices are
    // deterministic doc_id buckets so the oracle can replay them
    "text_classifier_auc_grouped" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val model = graft.textanalysis.NaiveBayes.train(
        docs.where(col("doc_id") % Round10.NbHoldoutMod =!= 0),
        "text", col("lang") === Round10.NbPosLang, Round10.NbAlpha)
      val holdout = docs.where(col("doc_id") % Round10.NbHoldoutMod === 0)
      graft.operators.Auc.aucGrouped(
        graft.textanalysis.NaiveBayes.score(model, holdout,
            "doc_id", "text")
          .join(holdout.select("doc_id", "lang"), Seq("doc_id")),
        col("doc_id") % AucSegMod,
        col("nb_score"), col("lang") === Round10.NbPosLang)
        .orderBy("g")
    }))

  val oracles: Map[String, String] = Map(

    "agg_gini_grouped" ->
      """WITH cents AS (SELECT l_returnflag AS g,
             floor(l_extendedprice * 100 + 0.5)::BIGINT AS v
           FROM lineitem
           WHERE l_extendedprice IS NOT NULL
             AND l_returnflag IS NOT NULL),
         vals AS (SELECT g, v, count(*)::BIGINT AS c FROM cents
           GROUP BY 1, 2),
         cum AS (SELECT g, v, c,
             coalesce(sum(c) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0)::BIGINT AS p0
           FROM vals),
         s AS (SELECT g, sum(v * c * p0)::HUGEINT AS sa,
             sum(v * c * (c + 1))::HUGEINT AS sb,
             sum(v * c)::HUGEINT AS t, sum(c)::BIGINT AS n
           FROM cum GROUP BY g)
         SELECT g, floor(((2 * sa + sb)::DOUBLE
             / (n::DOUBLE * t::DOUBLE)
             - (n + 1)::DOUBLE / n::DOUBLE) * 1000000 + 0.5)
             / 1000000 AS gini,
           n, t::BIGINT AS total
         FROM s WHERE n > 0 AND t > 0 ORDER BY g""",

    "text_classifier_auc_grouped" ->
      s"""WITH ${Round10.nbModelCtes},
           sc AS (SELECT doc_id, unnest(t) AS token FROM toks
             WHERE doc_id % ${Round10.NbHoldoutMod} = 0),
           joined AS (SELECT doc_id, coalesce(m.ratio, 0.5) AS r
             FROM sc LEFT JOIN model m USING (token)),
           scored AS (SELECT doc_id,
               floor(avg(r) * 10000 + 0.5) / 10000 AS nb_score
             FROM joined GROUP BY doc_id),
           ho AS (SELECT d.doc_id, (d.doc_id % $AucSegMod)::VARCHAR AS g,
               d.lang, coalesce(s.nb_score, 0.5) AS nb_score
             FROM (SELECT doc_id, lang FROM documents
               WHERE doc_id % ${Round10.NbHoldoutMod} = 0) d
             LEFT JOIN scored s USING (doc_id)),
           vals AS (SELECT g, nb_score AS s,
               sum(CASE WHEN lang = '${Round10.NbPosLang}' THEN 1
                 ELSE 0 END)::BIGINT AS pos,
               sum(CASE WHEN lang = '${Round10.NbPosLang}' THEN 0
                 ELSE 1 END)::BIGINT AS neg
             FROM ho GROUP BY 1, 2),
           c AS (SELECT g, pos, neg,
               coalesce(sum(neg) OVER (PARTITION BY g ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0)::BIGINT AS negb
             FROM vals),
           t AS (SELECT g, sum(pos)::BIGINT AS np,
               sum(neg)::BIGINT AS nn
             FROM vals GROUP BY g)
         SELECT c.g,
           floor(sum(pos * (2 * negb + neg))::DOUBLE /
             (2.0 * np::DOUBLE * nn::DOUBLE) * 1000000 + 0.5)
             / 1000000 AS auc,
           np AS n_pos, nn AS n_neg
         FROM c JOIN t ON c.g = t.g
         GROUP BY c.g, np, nn
         HAVING np > 0 AND nn > 0
         ORDER BY c.g""")
}
