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

  /** Every search function takes a SINGLE-vector query: with a multi-row
    * query frame the global orderBy/limit would mix probe lists and
    * rankings across queries and return a wrong per-query top-k.
    * Enforced (the frame is tiny, so the count is cheap) rather than
    * silently mis-answered; batch queries should loop or union results.
    */
  private def requireSingleQueryRow(query: DataFrame, fn: String): Unit = {
    val n = query.limit(2).count()
    require(n == 1, s"$fn expects exactly one query row, got " +
      (if (n > 1) "more than one" else "zero"))
  }

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
                    query: DataFrame, queryVecCol: String): DataFrame = {
    requireSingleQueryRow(query, "cosineToQuery")
    corpus.crossJoin(broadcast(query))
      .select(col(idCol),
        cosine(toVec(col(vecCol)), toVec(col(queryVecCol))).as("sim"))
  }

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
    requireSingleQueryRow(query, "annTopK")
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

  /** Multi-probe ANN: probe the query's sign-bucket AND every bucket at
    * Hamming distance 1 (one plane flipped) — the standard multi-probe
    * LSH recall recovery: near neighbors that fall just across one
    * hyperplane are found without adding hash tables. Scan fraction
    * grows from 1 to (1 + dims.size) buckets of 2^dims.size; with the
    * corpus stored partitioned by bucket this stays partition-pruned.
    */
  def annTopKMultiProbe(corpus: DataFrame, idCol: String, vecCol: String,
                        query: DataFrame, queryVecCol: String, dims: Seq[Int],
                        k: Int): DataFrame = {
    requireSingleQueryRow(query, "annTopKMultiProbe")
    val bucketed = corpus.withColumn("__bucket", lshBucket(toVec(col(vecCol)), dims))
    val qb = lshBucket(toVec(col(queryVecCol)), dims)
    // query bucket + each single-bit flip of it
    val probes = array((qb +: dims.indices.map(i =>
      qb.bitwiseXOR(lit(1 << i)))): _*)
    val q = query.withColumn("__probes", probes)
    bucketed.crossJoin(broadcast(q))
      .filter(array_contains(col("__probes"), col("__bucket")))
      .select(col(idCol),
        round(cosine(toVec(col(vecCol)), toVec(col(queryVecCol))), 4).as("sim"),
        col("__bucket").as("bucket"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  // ---------------- IVF (inverted-file) ANN ----------------

  /** Assign every vector its nearest centroid by cosine. The argmax over
    * ≤ nlist centroids is computed PER ROW: the (tiny — nlist × dim
    * doubles) centroid table is collected and inlined into the plan as
    * literal vectors, so assignment is a pure map over the corpus scan —
    * zero Exchange. (The earlier crossJoin + `max_by` groupBy shuffled
    * the full (id, cell, vec) corpus once per Lloyd iteration — at
    * 100 TB × iters that is a corpus shuffle per iteration for an argmax
    * a single expression can do.) Ties break to the smaller cell id via
    * the (sim, -cell) struct ordering, exactly as `max_by` did.
    */
  private[graft] def assign(corpus: DataFrame, idCol: String, vecCol: String,
                            centroids: DataFrame): DataFrame = {
    val cents = centroids
      .select(col("__cell").cast("int"), toVec(col("__cvec")))
      .collect()
    require(cents.nonEmpty, "assign: empty centroid table")
    val scored = cents.map { r =>
      val cell = r.getInt(0)
      val cvec = typedLit(r.getSeq[Double](1))
      struct(cosine(toVec(col(vecCol)), cvec).as("s"), lit(-cell).as("nc"))
    }
    val best =
      if (scored.length == 1) scored.head else greatest(scored.toSeq: _*)
    corpus.select(col(idCol),
      (-best.getField("nc")).as("__cell"), col(vecCol))
  }

  /** Build an IVF coarse-quantizer index: deterministic hash seeding
    * (`cell = pmod(xxhash64(id), nlist)`), then `iters` Lloyd rounds —
    * centroids via the [[VectorCentroid]] typed aggregator (map-side
    * partial agg: the shuffle carries nlist x dim doubles regardless of
    * corpus size), reassignment via [[assign]].
    *
    * Returns (corpus + `__cell`, centroids `(__cell, __cvec)`). At scale,
    * write the assigned corpus partitioned by `__cell`: queries then
    * partition-prune to `nprobe` inverted lists instead of scanning.
    */
  def ivfIndex(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
               nlist: Int, iters: Int = 1): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    def centroidsOf(assigned: DataFrame): DataFrame =
      assigned.select(col("__cell"), toVec(col(vecCol)).as("__v"))
        .as[(Int, Seq[Double])]
        .groupByKey(_._1).mapValues(_._2)
        .agg(new VectorCentroid(dim).toColumn.name("__cvec"))
        .toDF("__cell", "__cvec")

    var assigned = corpus.select(col(idCol),
      pmod(xxhash64(col(idCol)), lit(nlist)).cast("int").as("__cell"),
      col(vecCol))
    var cents = centroidsOf(assigned)
    var i = 0
    while (i < iters) {
      assigned = assign(corpus.select(col(idCol), col(vecCol)), idCol, vecCol, cents)
      cents = centroidsOf(assigned)
      i += 1
    }
    (assigned, cents)
  }

  /** IVF ANN query: score the nlist centroids against the query (tiny,
    * driver-side ordering), probe the top `nprobe` inverted lists, exact
    * cosine + top-k within them. `nprobe = nlist` degenerates to exact
    * brute force (the oracle identity the gate query checks);
    * `nprobe << nlist` is the production trade of recall for scan
    * fraction — with the corpus stored partitioned by `__cell`, the
    * non-probed lists are never read.
    */
  def ivfTopK(assigned: DataFrame, centroids: DataFrame, idCol: String,
              vecCol: String, query: DataFrame, queryVecCol: String,
              nprobe: Int, k: Int): DataFrame = {
    requireSingleQueryRow(query, "ivfTopK")
    val probed = centroids.crossJoin(broadcast(query))
      .select(col("__cell"),
        cosine(col("__cvec"), toVec(col(queryVecCol))).as("__csim"))
      .orderBy(col("__csim").desc, col("__cell"))
      .limit(nprobe)
      .select("__cell")
    assigned.join(broadcast(probed), Seq("__cell"))
      .crossJoin(broadcast(query))
      .select(col(idCol),
        round(cosine(toVec(col(vecCol)), toVec(col(queryVecCol))), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }
}
