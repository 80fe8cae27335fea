package graft.similarity

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Elementwise mean of fixed-dimension vectors — a typed
  * `Aggregator[IN, BUF, OUT]` (the UDAF tier of the extension ladder).
  *
  * This is the reduction inside IVF coarse quantization / k-means: one
  * pass, O(dim) state per group, map-side partial aggregation for free
  * (reduce/merge are associative), so computing centroids over 100 TB of
  * embeddings shuffles only (numGroups x dim) doubles.
  */
class VectorCentroid(dim: Int)
    extends Aggregator[Seq[Double], VectorCentroid.Buf, Seq[Double]] {
  import VectorCentroid.Buf

  override def zero: Buf = Buf(Array.fill(dim)(0.0), 0L)

  override def reduce(b: Buf, v: Seq[Double]): Buf = {
    var i = 0
    val n = math.min(dim, v.length)
    while (i < n) { b.sums(i) += v(i); i += 1 }
    Buf(b.sums, b.n + 1)
  }

  override def merge(x: Buf, y: Buf): Buf = {
    var i = 0
    while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
    Buf(x.sums, x.n + y.n)
  }

  override def finish(r: Buf): Seq[Double] =
    if (r.n == 0) Seq.fill(dim)(0.0)
    else r.sums.map(_ / r.n).toSeq

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object VectorCentroid {
  case class Buf(sums: Array[Double], n: Long)
}
