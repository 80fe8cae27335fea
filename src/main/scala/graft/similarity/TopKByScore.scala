package graft.similarity

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k by (score desc, id asc) — a typed `Aggregator` whose
  * state NEVER exceeds k entries, so a per-query top-k over a 100 TB
  * corpus aggregates map-side and shuffles only
  * (queries x partitions x k) rows instead of every scored pair. The
  * alternative — `row_number()` over a per-query window — shuffles the
  * full (corpus x queries) score table onto as many reducers as there
  * are queries, which hot-spots exactly when the batch is small.
  *
  * Input rows are (queryId, score, id); the group key (queryId) is
  * supplied by `groupByKey`, the aggregator just maintains the bounded
  * ranked list. Ties rank by ascending id, so the result is
  * deterministic and engine-replayable.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Long, Double, Long), Seq[TopKByScore.Hit],
      Seq[TopKByScore.Hit]] {
  import TopKByScore.Hit
  require(k >= 1, "k must be >= 1")

  private def ranksBefore(a: Hit, b: Hit): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def insert(b: Seq[Hit], x: Hit): Seq[Hit] =
    if (b.length >= k && !ranksBefore(x, b.last)) b
    else {
      val idx = b.indexWhere(e => ranksBefore(x, e))
      val ins =
        if (idx < 0) b :+ x
        else (b.take(idx) :+ x) ++ b.drop(idx)
      if (ins.length > k) ins.take(k) else ins
    }

  override def zero: Seq[Hit] = Vector.empty

  override def reduce(b: Seq[Hit], row: (Long, Double, Long)): Seq[Hit] =
    insert(b, Hit(row._2, row._3))

  override def merge(x: Seq[Hit], y: Seq[Hit]): Seq[Hit] =
    y.foldLeft(x)(insert)

  override def finish(r: Seq[Hit]): Seq[Hit] = r

  override def bufferEncoder: Encoder[Seq[Hit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Hit]]()
  override def outputEncoder: Encoder[Seq[Hit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Hit]]()
}

object TopKByScore {
  /** One ranked neighbor: similarity score and corpus row id. */
  case class Hit(score: Double, id: Long)
}
