package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search.
  *
  * Vectors are `array<float>` columns cast to `array<double>` for stable
  * math. The brute-force path is the correctness baseline (single scan,
  * no shuffle, broadcast query); the LSH/IVF-style bucketed path is the
  * scale path: a data-independent coarse quantizer prunes the scan to one
  * bucket, so a 100 TB corpus is probed via partition pruning on a bucket
  * column (store bucketed/partitioned by it) instead of a full scan.
  */
object Similarity {

  def toVec(c: Column): Column = c.cast("array<double>")

  /** Fused-loop native dot product (codegen) — see [[graft.functions.DotProduct]].
    * Identical result to the sequential fold, without the intermediate
    * array or interpreted lambdas. */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct.dot(a, b)

  /** The composable higher-order-function form (kept as the reference
    * semantics the native expression is tested against). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine of every row's vector against a single query vector (the query
    * side is a 1-row DataFrame, broadcast — no shuffle of the corpus). */
  def cosineToQuery(corpus: DataFrame, idCol: String, vecCol: String,
                    query: DataFrame, queryVecCol: String): DataFrame =
    corpus.crossJoin(broadcast(query))
      .select(col(idCol),
        cosine(toVec(col(vecCol)), toVec(col(queryVecCol))).as("sim"))

  /** Brute-force top-k by cosine (ties broken by id — deterministic). */
  def topK(corpus: DataFrame, idCol: String, vecCol: String,
           query: DataFrame, queryVecCol: String, k: Int): DataFrame =
    cosineToQuery(corpus, idCol, vecCol, query, queryVecCol)
      .withColumn("sim", round(col("sim"), 4))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)

  /** Random-hyperplane-style bucket id from the signs of selected
    * dimensions (axis-aligned planes chosen by `dims`, data-independent —
    * every writer/reader derives the same bucket without coordination). */
  def lshBucket(vec: Column, dims: Seq[Int]): Column =
    dims.zipWithIndex.map { case (d, i) =>
      when(element_at(vec, d + 1) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** ANN: probe only the query's coarse bucket, then exact cosine + top-k
    * within it. Recall < 1 by construction; the bucket count (2^dims.size)
    * trades recall for scan fraction.
    */
  def annTopK(corpus: DataFrame, idCol: String, vecCol: String,
              query: DataFrame, queryVecCol: String, dims: Seq[Int],
              k: Int): DataFrame = {
    val bucketed = corpus.withColumn("__bucket", lshBucket(toVec(col(vecCol)), dims))
    val q = query.withColumn("__qbucket", lshBucket(toVec(col(queryVecCol)), dims))
    bucketed.crossJoin(broadcast(q))
      .filter(col("__bucket") === col("__qbucket"))
      .select(col(idCol),
        round(cosine(toVec(col(vecCol)), toVec(col(queryVecCol))), 4).as("sim"),
        col("__bucket").as("bucket"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }
}
