package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization for storage/bandwidth at corpus scale.
  *
  * Symmetric per-vector int8: `scale = max(|v|) / 127`,
  * `q[i] = floor(v[i]/scale + 0.5)` — 4x smaller than float32 on disk
  * and in shuffle, with reconstruction error bounded by `scale/2` per
  * dimension. At 100 TB of float32 embeddings that is 75 TB less scan
  * and shuffle for any downstream similarity pass that tolerates the
  * quantization error (re-rank the top candidates with full-precision
  * vectors when it matters).
  *
  * Everything is a narrow per-row array expression (no UDFs, no
  * shuffle), and the rounding is `floor(x + 0.5)` — the engine-stable
  * convention every gate oracle uses — so a SQL engine replays the
  * exact bytes.
  */
object Quantize {

  /** Per-vector symmetric quantization scale (`max(|v|)/127`; 0 for the
    * all-zero vector). */
  def int8Scale(vec: Column): Column =
    array_max(transform(Similarity.toVec(vec), x => abs(x))) / 127.0

  /** Adds `qCol` (array<tinyint>) and `scaleCol` (double) columns. */
  def int8(df: DataFrame, vecCol: String, qCol: String = "qvec",
           scaleCol: String = "qscale"): DataFrame = {
    val v = Similarity.toVec(col(vecCol))
    df.withColumn(scaleCol, int8Scale(col(vecCol)))
      .withColumn(qCol,
        when(col(scaleCol) === 0.0,
          transform(v, _ => lit(0).cast("tinyint")))
          .otherwise(transform(v, x =>
            greatest(lit(-127.0), least(lit(127.0),
              floor(x / col(scaleCol) + 0.5))).cast("tinyint"))))
  }

  /** Reconstruction: `q[i] * scale` as array<double>. */
  def dequantize(qCol: Column, scaleCol: Column): Column =
    transform(qCol, x => x.cast("double") * scaleCol)
}
