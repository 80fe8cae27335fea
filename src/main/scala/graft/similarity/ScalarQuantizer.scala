package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization ANN — the simplest compressed-vector
  * retrieval tier: each dimension maps independently onto 0..255
  * between its corpus min and max, cutting the vector store 4× against
  * float32 with per-dim error ≤ step/2. The production ladder is
  * SQ8 (cheap, 4×) → PQ (Jégou et al., 32×) → IVF+PQ; this is the
  * first rung, and like the PQ gates the retrieval runs two-stage:
  * rank the int8 codes approximately, exact-rescore a candidate pool,
  * so with pool headroom the result IS brute-force top-k — the
  * identity the gate's oracle checks.
  *
  * The model is 2·dim doubles (driver-bounded at any corpus size);
  * encode/score are single-pass `zip_with`/dot expressions inside
  * codegen. The approximate score folds the affine dequantization into
  * one lookup-free dot: dot(dequant(c), q) = Σ lo_i·q_i + Σ c_i·
  * (step_i·q_i) — the constant term drops (rank-invariant) and the
  * per-dim weights `step_i·q_i` inline as a literal array. */
object ScalarQuantizer {
  case class Model(mins: Seq[Double], maxs: Seq[Double]) {
    def dim: Int = mins.length
    /** Per-dim quantization step; 0 for constant dimensions (they
      * encode 0 and dequantize to the constant). */
    def steps: Seq[Double] = mins.zip(maxs).map { case (lo, hi) =>
      if (hi > lo) (hi - lo) / 255.0 else 0.0
    }
  }

  /** Per-dimension corpus min/max — one posexplode + grouped agg; the
    * collect is `dim` rows, bounded at any corpus size. */
  def fit(corpus: DataFrame, vecCol: String, dim: Int): Model = {
    val byDim = corpus
      .where(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(posexplode(Similarity.toVec(col(vecCol))))
      .toDF("__d", "__x")
      .groupBy("__d")
      .agg(min("__x").as("__lo"), max("__x").as("__hi"))
      .orderBy("__d")
      .collect()
    require(byDim.length == dim,
      s"expected $dim dimensions, got ${byDim.length}")
    Model(byDim.map(_.getDouble(1)).toSeq, byDim.map(_.getDouble(2)).toSeq)
  }

  /** (id, codes): codes_i = clamp(round((x_i − lo_i)/step_i), 0, 255)
    * as int — a fused zip_with over the scan. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             model: Model): DataFrame = {
    val invSteps = model.steps.map(s => if (s > 0) 1.0 / s else 0.0)
    val codes = zip_with(
      zip_with(Similarity.toVec(col(vecCol)), typedLit(model.mins),
        (x, lo) => x - lo),
      typedLit(invSteps),
      (d, inv) => least(lit(255), greatest(lit(0),
        floor(d * inv + 0.5).cast("int"))))
    corpus
      .where(col(vecCol).isNotNull && size(col(vecCol)) === model.dim)
      .select(col(idCol), codes.as("codes"))
  }

  /** Two-stage retrieval: approximate dot on the int8 codes ranks a
    * `candidates` pool (TakeOrderedAndProject — no global sort), the
    * float store rescores only the pool, exact cosine, top `k`. */
  def sqRescoreTopK(encoded: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, model: Model, queryVec: Seq[Double],
                    candidates: Int, k: Int): DataFrame = {
    require(candidates >= k, "candidate pool must cover k")
    require(queryVec.length == model.dim, "query dim mismatch")
    val weights = model.steps.zip(queryVec).map { case (s, q) => s * q }
    val approx = aggregate(
      zip_with(col("codes").cast("array<double>"), typedLit(weights),
        (c, w) => c * w),
      lit(0.0), (acc, x) => acc + x)
    val pool = encoded
      .select(col(idCol), approx.as("__sq"))
      .orderBy(col("__sq").desc, col(idCol))
      .limit(candidates)
      .select(idCol)
    corpus.join(broadcast(pool), Seq(idCol))
      .select(col(idCol),
        round(Similarity.cosine(Similarity.toVec(col(vecCol)),
          typedLit(queryVec)), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Dequantized value per dimension — exposed for the error-bound
    * spec: lo_i + codes_i · step_i. */
  def dequant(codes: Column, model: Model): Column =
    zip_with(
      zip_with(codes.cast("array<double>"), typedLit(model.steps),
        (c, s) => c * s),
      typedLit(model.mins), (x, lo) => x + lo)
}
