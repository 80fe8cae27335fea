package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search"): split each dim-D vector into `m`
  * subvectors of D/m dims, k-means each subspace into `ksub` codes, and
  * store every vector as `m` small codes (m bytes at ksub ≤ 256 — a
  * 32× compression of float32 at the default 8×16 on dim 64).
  *
  * Query time is ADC (asymmetric distance computation): the query
  * builds one (m × ksub) table of partial dot products against the
  * codebooks, and every corpus vector's approximate score is m table
  * lookups over its codes — no float vector is read at all. The coarse
  * candidates then rescore against full precision, the same two-stage
  * contract as [[Similarity.int8RescoreTopK]].
  *
  * Scale shape: training reduces subvector sums per (subspace, cell) —
  * the shuffle carries m·ksub·(D/m) doubles regardless of corpus size;
  * encoding is a pure map (codebooks inlined as literals, the
  * [[Similarity.assign]] pattern); the ADC scan is a pure map +
  * TakeOrderedAndProject. The only full-precision touch is the
  * candidate rescore (broadcast semi-join).
  */
object ProductQuantizer {

  /** Trained codebooks: `books(sub)(code)` is a D/m-dim centroid. */
  case class Model(dim: Int, m: Int, ksub: Int,
                   books: Seq[Seq[Seq[Double]]]) {
    def subDim: Int = dim / m
  }

  /** One row per (vector, subspace): (id, sub, subvec). */
  private def subvectors(corpus: DataFrame, idCol: String, vecCol: String,
                         dim: Int, m: Int): DataFrame = {
    val subDim = dim / m
    corpus.select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          s => slice(Similarity.toVec(col(vecCol)), s * subDim + 1,
            lit(subDim))))
      .as(Seq("__sub", "__sv")))
  }

  /** Argmin-L2 code for a subvector against one subspace's codebook:
    * the [[graft.functions.NearestCode]] native kernel — two fused
    * loops over a primitive codebook inside whole-stage codegen, where
    * the composable struct-greatest-over-distances tree ran hundreds
    * of interpreted nodes per subspace (and a scalar unroll measured
    * 3x slower still by blowing the generated-code budget). */
  private def nearestCode(sv: Column, book: Seq[Seq[Double]]): Column =
    graft.functions.NearestCode.nearest(sv, book)

  /** Lloyd k-means per subspace, `pmod(xxhash64(id, sub), ksub)` seeded
    * (deterministic, retry-safe). Centroid reduction via
    * [[VectorCentroid]] on the composite (sub·ksub + cell) key;
    * reassignment inlines the current codebooks and picks argmin-L2 per
    * row — a pure map, mirroring [[Similarity.assign]]. */
  def fit(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
          m: Int = 8, ksub: Int = 16, iters: Int = 1): Model = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    require(ksub >= 2 && ksub <= 256, s"ksub in [2,256], got $ksub")
    val spark = corpus.sparkSession
    import spark.implicits._
    val subDim = dim / m
    val sv = subvectors(corpus, idCol, vecCol, dim, m)

    def booksOf(assigned: DataFrame): Seq[Seq[Seq[Double]]] = {
      val rows = assigned
        .select((col("__sub") * ksub + col("__cell")).cast("int").as("__key"),
          col("__sv").as("__v"))
        .as[(Int, Seq[Double])]
        .groupByKey(_._1).mapValues(_._2)
        .agg(new VectorCentroid(subDim).toColumn.name("__c"))
        .collect().toMap
      Seq.tabulate(m, ksub)((s, c) =>
        rows.getOrElse(s * ksub + c, Seq.fill(subDim)(0.0)))
    }

    var assigned = sv.withColumn("__cell",
      pmod(xxhash64(col(idCol), col("__sub")), lit(ksub)).cast("int"))
    var books = booksOf(assigned)
    var i = 0
    while (i < iters) {
      assigned = sv.withColumn("__cell", argminCell(col("__sub"), col("__sv"),
        books, ksub))
      books = booksOf(assigned)
      i += 1
    }
    Model(dim, m, ksub, books)
  }

  /** Argmin-L2 cell for a (sub, subvec) row: one [[nearestCode]] kernel
    * per subspace behind an m-way selector (ties to the smaller code,
    * same as ever). */
  private def argminCell(sub: Column, sv: Column,
                         books: Seq[Seq[Seq[Double]]], ksub: Int): Column =
    books.zipWithIndex.foldRight(lit(-1)) { case ((book, s), other) =>
      when(sub === s, nearestCode(sv, book)).otherwise(other)
    }

  /** Adds `codes` (array<int>, length m): each vector's per-subspace
    * argmin-L2 code. Pure map — the codebooks ride along as codegen
    * constants. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             model: Model): DataFrame = {
    val subDim = model.subDim
    val codeExprs = model.books.zipWithIndex.map { case (book, s) =>
      val sv = slice(Similarity.toVec(col(vecCol)), s * subDim + 1, subDim)
      nearestCode(sv, book)
    }
    corpus.withColumn("codes", array(codeExprs: _*))
  }

  /** Two-stage PQ retrieval: ADC coarse scan over the codes (the query's
    * per-subspace dot-product tables inlined as literals — m
    * `element_at` lookups per row), TakeOrderedAndProject keeps
    * `candidates` ids, exact cosine rescores only those. With enough
    * candidate headroom the result IS the exact top-k (the identity the
    * gate checks); recall degrades gracefully as the pool shrinks. */
  def adcRescoreTopK(encoded: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, model: Model, queryVec: Seq[Double],
                     candidates: Int, k: Int): DataFrame = {
    require(candidates >= k, "candidate pool must cover k")
    require(queryVec.length == model.dim, "query dim mismatch")
    val pool = encoded
      .select(col(idCol), adcScore(model, queryVec).as("__adc"))
      .orderBy(col("__adc").desc, col(idCol))
      .limit(candidates)
      .select(idCol)
    rescore(corpus, pool, idCol, vecCol, queryVec, k)
  }

  /** The ADC approximate score of a `codes` row: the query's (m × ksub)
    * partial-dot-product tables are computed once on the driver and
    * inlined as literals — m `element_at` lookups per corpus row. */
  private def adcScore(model: Model, queryVec: Seq[Double]): Column = {
    val subDim = model.subDim
    val luts: Seq[Seq[Double]] = model.books.zipWithIndex.map { case (book, s) =>
      val q = queryVec.slice(s * subDim, (s + 1) * subDim)
      book.map(c => c.iterator.zip(q.iterator).map { case (a, b) => a * b }.sum)
    }
    luts.zipWithIndex.map { case (lut, s) =>
      element_at(typedLit(lut), col("codes")(s) + 1)
    }.reduce(_ + _)
  }

  private def rescore(corpus: DataFrame, pool: DataFrame, idCol: String,
                      vecCol: String, queryVec: Seq[Double],
                      k: Int): DataFrame =
    corpus.join(broadcast(pool), Seq(idCol))
      .select(col(idCol),
        round(Similarity.cosine(Similarity.toVec(col(vecCol)),
          typedLit(queryVec)), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)

  /** IVFADC (Jégou et al., §V): the IVF coarse quantizer prunes the scan
    * to the `nprobe` most query-similar cells, and only THEIR rows pay
    * the m ADC lookups; the survivors rescore at full precision. The
    * classic three-stage retrieval layout — at 100 TB the encoded corpus
    * is stored partitioned by `__cell`, so the non-probed inverted lists
    * are never read at all (the [[Similarity.ivfTopK]] pruning contract)
    * and the float32 store is touched only for the `candidates` pool.
    *
    * `encoded` must carry `__cell` (from [[Similarity.ivfIndex]]) and
    * `codes` (from [[encode]]); with `nprobe` = nlist and candidate
    * headroom the result IS exact brute-force top-k — the identity the
    * `sim_ann_ivfpq` gate checks against DuckDB.
    */
  def ivfAdcTopK(encoded: DataFrame, centroids: DataFrame, corpus: DataFrame,
                 idCol: String, vecCol: String, model: Model,
                 queryVec: Seq[Double], nprobe: Int, candidates: Int,
                 k: Int): DataFrame = {
    require(candidates >= k, "candidate pool must cover k")
    require(queryVec.length == model.dim, "query dim mismatch")
    // probed cells resolve driver-side (the centroid table is nlist
    // rows, already collected for assignment) and land in the plan as
    // an isin LITERAL — a static partition filter a __cell-partitioned
    // store prunes at the scan, where a join would need runtime DPP
    val cells = centroids
      .select(col("__cell").cast("int"),
        round(Similarity.cosine(Similarity.toVec(col("__cvec")),
          typedLit(queryVec)), 4).as("__csim"))
      .orderBy(col("__csim").desc, col("__cell"))
      .limit(nprobe)
      .collect().map(_.getInt(0)).toSeq
    val pool = encoded.filter(col("__cell").isin(cells: _*))
      .select(col(idCol), adcScore(model, queryVec).as("__adc"))
      .orderBy(col("__adc").desc, col(idCol))
      .limit(candidates)
      .select(idCol)
    rescore(corpus, pool, idCol, vecCol, queryVec, k)
  }
}
