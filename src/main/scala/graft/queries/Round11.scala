package graft.queries

import org.apache.spark.sql.functions._
import graft.similarity.{ProductQuantizer, Similarity}

/** Round-11 gates. Each Spark query here has a DuckDB oracle generated
  * from the same constants, like [[Round10]]. */
object Round11 {

  /** PQ multi-iteration training constants. Training runs on a
    * deterministic quarter-sample of the corpus (`vec_id % TrainMod ==
    * 0`) — the standard PQ practice: codebook quality saturates on a
    * sample, so the Lloyd passes cost O(sample), not O(corpus),
    * however wide the encoded table grows. */
  private val PqM = 8
  private val PqKsub = 16
  private val PqIters = 3
  private val PqTrainMod = 4L
  private val PqCandidates = 600
  private val PqK = 10

  val defs: Map[String, Q] = Map(

    // PQ retrieval with CONVERGED codebooks: three Lloyd iterations per
    // subspace (vs the single-pass sim_ann_pq), trained on a
    // deterministic sample so the iteration cost is bounded by the
    // sample however large the corpus. fit()'s per-iteration driver
    // collect of the m·ksub·subDim codebook IS the lineage truncation
    // (each pass re-roots the plan at the subvector scan with literal
    // codebooks — nothing accumulates), so the converged model replays
    // bit-identically; with 600-candidate headroom retrieval is exact
    // brute-force top-10, the identity the oracle checks
    "sim_ann_pq_iters" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") === 0)
        .select(Similarity.toVec(col("embedding")))
        .head().getSeq[Double](0)
      val model = ProductQuantizer.fit(
        emb.where(col("vec_id") % PqTrainMod === 0),
        "vec_id", "embedding", dim = 64, m = PqM, ksub = PqKsub,
        iters = PqIters)
      val encoded = ProductQuantizer.encode(
        emb, "vec_id", "embedding", model)
      ProductQuantizer.adcRescoreTopK(encoded, emb, "vec_id",
          "embedding", model, qv, candidates = PqCandidates, k = PqK)
        .withColumn("sim", col("sim") + lit(0.0))
    }),

    // REAL audio decode: per doc a deterministic PCM16 fixture encodes
    // through the JVM's own RIFF/WAVE writer, decodes back through
    // javax.sound.sampled (format chunk, endianness, frame boundaries
    // all the codec's), and emits rate / length / integral duration /
    // peak / order-weighted checksum — every integer replayable by the
    // oracle straight from the sample formula, so a sign or endianness
    // mistake in the decoder flips the gate
    "mm_audio_real" -> ((s, dir) =>
      graft.multimodal.Multimodal.audioRoundTrip(
          tbl(s, dir, "documents"), "doc_id")
        .toDF().orderBy("doc_id")),

    // F17 as a verified gate, not just a spec: the dashboard's es-PE
    // currency presentation (`index.html:104-106`) — "S/ " + comma
    // thousands, half-up integer rounding, "–" placeholder for
    // null — recomposed independently by the oracle. Positive prices
    // only hit the half-up==half-away agreement zone of the two
    // engines' round(); a 97-residue slice keeps the dump bounded
    "scalar_currency_pen" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .filter(col("l_orderkey") % 7 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.functions.GraftFunctions.formatCurrency(
            when(col("l_orderkey") % 97 === 0, lit(null))
              .otherwise(col("l_extendedprice"))).as("precio_fmt"))
        .orderBy("l_orderkey", "l_linenumber")))

  val oracles: Map[String, String] = Map(

    // exact brute-force top-k — the identity the two-stage retrieval
    // must reproduce at full candidate headroom
    "sim_ann_pq_iters" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                     WHERE vec_id = 0)
         SELECT vec_id,
           round(list_cosine_similarity(embedding::DOUBLE[], qv), 4) + 0.0
             AS sim
         FROM embeddings, q
         ORDER BY sim DESC, vec_id LIMIT $PqK""",

    // the audio fixture formula replayed in SQL: sample i of doc id is
    // ((id*131 + i*i*7 + i*31) % 65536) - 32768 at 64 + id%33 samples,
    // 8/12/16 kHz by id residue
    "mm_audio_real" ->
      """SELECT d.doc_id,
           CAST(8000 + (d.doc_id % 3) * 4000 AS INT) AS sample_rate,
           CAST(64 + d.doc_id % 33 AS INT) AS n_samples,
           CAST((64 + d.doc_id % 33) * 1000
             // (8000 + (d.doc_id % 3) * 4000) AS BIGINT) AS duration_ms,
           max(abs(((d.doc_id * 131 + r.i * r.i * 7 + r.i * 31) % 65536)
             - 32768))::BIGINT AS peak,
           sum((((d.doc_id * 131 + r.i * r.i * 7 + r.i * 31) % 65536)
             - 32768) * (r.i + 1))::BIGINT AS checksum
         FROM documents d
         JOIN (SELECT range AS i FROM range(97)) r
           ON r.i < 64 + d.doc_id % 33
         GROUP BY d.doc_id ORDER BY d.doc_id""",

    // es-PE currency recomposed: fmt-style thousands grouping over the
    // half-up-rounded integer part, the en-dash placeholder on null
    "scalar_currency_pen" ->
      """SELECT l_orderkey, l_linenumber,
           CASE WHEN l_orderkey % 97 = 0 THEN '–'
                ELSE 'S/ ' || format('{:,}',
                  CAST(round(l_extendedprice, 0) AS BIGINT))
           END AS precio_fmt
         FROM lineitem WHERE l_orderkey % 7 = 0
         ORDER BY l_orderkey, l_linenumber""")
}
