package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.similarity.{Mmr, Similarity}

/** Round-12 third batch: MMR diversified re-rank and rolling
  * autocorrelation. */
object Round12c {

  /** MMR fixture: top-12 candidate pool by cosine to query vec 0,
    * re-ranked to 5 diverse picks at λ = 0.5 (exact binary double, so
    * 1−λ is too — the score arithmetic replays bit-for-bit). */
  private val MmrPool = 12
  private val MmrK = 5
  private val MmrLambda = 0.5

  /** Rolling autocorrelation: per-user trailing window over
    * (value_cents, previous value_cents) pairs. Integer cents make
    * every window sum EXACT, so the correlation is one replayable
    * double expression per row. */
  private val CorrWindow = 8

  val defs: Map[String, Q] = Map(

    // MMR diversified re-rank: relevance-ordered pool in, diverse
    // top-k out — greedy argmax of λ·rel − (1−λ)·max-sim-to-picked,
    // ties to the smallest id. The oracle unrolls the same k greedy
    // steps as CTEs over the same 4dp-rounded rel/sim values
    "sim_mmr_rerank" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      val pool = Similarity.topK(emb, "vec_id", "embedding", q, "qvec",
          MmrPool)
        .join(emb, Seq("vec_id"))
        .select(col("vec_id"), col("sim").as("rel"), col("embedding"))
      Mmr.rerank(pool, "vec_id", "embedding", "rel", MmrK, MmrLambda)
        .orderBy("rank")
    }),

    // per-user rolling autocorrelation of the value series (trailing
    // 8 valid (x, prev-x) pairs): integer-cents sums keep every window
    // aggregate exact; the correlation is the textbook
    // (nΣxy − ΣxΣy)/√((nΣx² − (Σx)²)(nΣy² − (Σy)²)) evaluated as ONE
    // double expression from those exact longs — identical in DuckDB
    "window_rolling_corr" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
        .where(col("user_id").isNotNull && col("value").isNotNull)
        .select(col("user_id"), col("event_id"),
          floor(col("value") * 100 + 0.5).cast("long").as("x"))
      val lagW = Window.partitionBy("user_id").orderBy("event_id")
      val pairs = ev
        .withColumn("y", lag("x", 1).over(lagW))
        .where(col("y").isNotNull)
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(-(CorrWindow - 1), 0)
      val n = count(lit(1)).over(w)
      val sx = sum("x").over(w); val sy = sum("y").over(w)
      val sxy = sum(col("x") * col("y")).over(w)
      val sxx = sum(col("x") * col("x")).over(w)
      val syy = sum(col("y") * col("y")).over(w)
      val num = n * sxy - sx * sy
      val dx = n * sxx - sx * sx
      val dy = n * syy - sy * sy
      pairs.select(col("user_id"), col("event_id"),
          (floor(when(dx > 0 && dy > 0,
            num.cast("double") /
              sqrt(dx.cast("double") * dy.cast("double")))
            * 1e6 + 0.5) / 1e6).as("rcorr"))
        .orderBy("user_id", "event_id")
    }))

  /** The k greedy MMR steps unrolled as CTEs: sel_r = sel_{r-1} plus
    * the argmax of λ·rel − (1−λ)·max sim-to-sel_{r-1}. */
  private def mmrOracleSql(pool: Int, k: Int, lambda: Double): String = {
    val oneMinus = 1.0 - lambda // same Scala double the Spark plan uses
    val steps = (2 to k).map { r =>
      s"""m$r AS (SELECT p.vec_id, p.embedding,
             $lambda * p.rel - $oneMinus * (SELECT max(s.sim)
               FROM sims s JOIN sel${r - 1} t ON s.b = t.vec_id
               WHERE s.a = p.vec_id) AS score
           FROM pool p
           WHERE p.vec_id NOT IN (SELECT vec_id FROM sel${r - 1})),
         p$r AS (SELECT vec_id, embedding, $r AS rank, score
           FROM m$r ORDER BY score DESC, vec_id LIMIT 1),
         sel$r AS (SELECT * FROM sel${r - 1} UNION ALL
           SELECT * FROM p$r)"""
    }.mkString(",\n         ")
    s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
           WHERE vec_id = 0),
       pool AS (SELECT vec_id, embedding::DOUBLE[] AS embedding,
           round(list_cosine_similarity(embedding::DOUBLE[], qv), 4)
             AS rel
         FROM embeddings, q ORDER BY rel DESC, vec_id LIMIT $pool),
       sims AS (SELECT a.vec_id AS a, b.vec_id AS b,
           round(list_cosine_similarity(a.embedding, b.embedding), 4)
             AS sim
         FROM pool a, pool b WHERE a.vec_id <> b.vec_id),
       p1 AS (SELECT vec_id, embedding, 1 AS rank,
           $lambda * rel AS score
         FROM pool ORDER BY rel DESC, vec_id LIMIT 1),
       sel1 AS (SELECT * FROM p1),
       $steps
       SELECT rank, vec_id, score + 0.0 AS mmr_score
       FROM sel$k ORDER BY rank"""
  }

  val oracles: Map[String, String] = Map(

    "sim_mmr_rerank" -> mmrOracleSql(MmrPool, MmrK, MmrLambda),

    "window_rolling_corr" ->
      s"""WITH ev AS (SELECT user_id, event_id,
             floor(value * 100 + 0.5)::BIGINT AS x
           FROM events
           WHERE user_id IS NOT NULL AND value IS NOT NULL),
         pr AS (SELECT user_id, event_id, x,
             lag(x) OVER (PARTITION BY user_id ORDER BY event_id) AS y
           FROM ev),
         pairs AS (SELECT * FROM pr WHERE y IS NOT NULL),
         s AS (SELECT user_id, event_id,
             count(*) OVER w AS n,
             sum(x) OVER w AS sx, sum(y) OVER w AS sy,
             sum(x * y) OVER w AS sxy,
             sum(x * x) OVER w AS sxx,
             sum(y * y) OVER w AS syy
           FROM pairs
           WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN ${CorrWindow - 1} PRECEDING AND CURRENT ROW))
         SELECT user_id, event_id,
           floor((CASE WHEN n * sxx - sx * sx > 0
               AND n * syy - sy * sy > 0
             THEN (n * sxy - sx * sy)::DOUBLE /
               sqrt((n * sxx - sx * sx)::DOUBLE *
                 (n * syy - sy * sy)::DOUBLE)
             ELSE NULL END) * 1000000 + 0.5) / 1000000 AS rcorr
         FROM s ORDER BY user_id, event_id""")
}
