package graft.textanalysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted index — term → sorted posting list of document ids, the
  * retrieval structure behind every keyword search and the exact-match
  * side of hybrid retrieval (`sim_hybrid_rrf` scores BM25 by scanning
  * the corpus; an index answers the same conjunctive lookups from
  * df-bounded posting lists instead).
  *
  * Terms are lowercased whitespace tokens ([[TextAnalysis.tokens]] —
  * the convention every text operator here shares), deduplicated per
  * document BEFORE the explode (`array_distinct` keeps the exploded row
  * count at distinct-terms-per-doc, not token count). The build is
  * TWO-pass on purpose: pass one counts df per term (a map-side
  * combined count — no lists anywhere), and only terms inside
  * [minDf, maxDf] survive into pass two's posting aggregate, so no
  * task ever buffers a posting list longer than maxDf — collecting
  * first and filtering after would materialize exactly the hot-term
  * list the cap exists to prevent. Dropping df > maxDf terms entirely
  * is also the classic stopword cut; `minDf` trims hapax noise from
  * the other end.
  *
  * Output: (term, df, postings) with postings a sorted array of doc
  * ids — deterministic for hashing and for binary-merge consumers.
  *
  * [[lookupAll]] is the conjunctive (AND) query: explode the ≤ |terms|
  * matching posting lists — each ≤ maxDf entries, a broadcast-sized
  * slice fetched by term equality, never a corpus scan — and keep the
  * doc ids present in all of them. */
object InvertedIndex {
  def build(docs: DataFrame, idCol: String, textCol: String,
            minDf: Long = 1L, maxDf: Long = Long.MaxValue): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    require(maxDf >= minDf, s"maxDf ($maxDf) must be >= minDf ($minDf)")
    val td = docs
      .select(col(idCol),
        explode(array_distinct(transform(
          TextAnalysis.tokens(col(textCol)), t => lower(t)))).as("term"))
      .where(length(col("term")) > 0)
    val kept = td.groupBy("term").agg(count(lit(1)).as("df"))
      .where(col("df").between(minDf, maxDf))
    td.join(kept, "term")
      .groupBy("term")
      .agg(max("df").as("df"),
        sort_array(collect_list(col(idCol))).as("postings"))
  }

  /** Scored posting TABLE — (term, doc_id-named-`idCol`, tf) — the
    * relational layout of the index for ranked retrieval: one grouped
    * count over the exploded (doc, token) pairs, no lists anywhere.
    * Partition/bucket this by `term` in a real layout and a query's
    * terms prune to their own slices. */
  def postings(docs: DataFrame, idCol: String,
               textCol: String): DataFrame =
    docs
      .select(col(idCol),
        explode(transform(TextAnalysis.tokens(col(textCol)),
          t => lower(t))).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Per-document length table (idCol, dl) — BM25's normalizer,
    * computed once at index time instead of per query. */
  def docStats(docs: DataFrame, idCol: String,
               textCol: String): DataFrame =
    docs.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("double").as("dl"))

  /** BM25 scored from the index — bit-identical to the corpus-scan
    * scorer [[TextAnalysis.bm25]], but the only per-query work is the
    * query terms' posting slices plus the doc-length table: the text
    * never re-tokenizes and the corpus never rescans (at 100 TB the
    * postings slice for 3 terms is megabytes; the corpus is not).
    *
    * Bit-identity is engineered, not approximate: the filtered
    * postings PIVOT into one tf column per query term (plan-literal
    * pivot values), every doc joins its dl, and the score is the SAME
    * fixed-order expression tree as the scan scorer — per-term
    * df/N/avgdl from one 1-row broadcast aggregate, terms summed in
    * query order, never a double-summing aggregate whose addition
    * order could drift. Docs containing no query term score 0.0 via
    * the left join, exactly like the scan's zero tf rows. Output:
    * (idCol, bm25) — same contract, same rounding. */
  def bm25FromIndex(postings: DataFrame, docStats: DataFrame,
                    idCol: String, queryTerms: Seq[String],
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25FromIndex: empty query")
    val terms = queryTerms.map(_.toLowerCase)
    // a duplicated term would pivot into two same-named columns and
    // die with an ambiguous-reference error downstream — fail with the
    // actual problem instead (the scan scorer tolerates duplicates by
    // double-counting; dedupe the query to get the standard semantics)
    require(terms.distinct.size == terms.size,
      s"bm25FromIndex: duplicate query terms in $queryTerms")
    val tfs = postings.where(col("term").isin(terms: _*))
      .groupBy(col(idCol)).pivot("term", terms).agg(first("tf"))
    // pinned (round 19, guide §2.4): the stats reduce and the scoring
    // projection both read this slim frame
    val withTf = graft.operators.Checkpoints.pin(
      docStats.join(tfs, Seq(idCol), "left")
      .select(col(idCol) +: col("dl").as("__dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          coalesce(col(s"`$t`"), lit(0L)).cast("double").as(s"__tf$i")
        }: _*))
    val statAggs: Seq[Column] =
      count(lit(1)).cast("double").as("__n") +:
        avg("__dl").as("__avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"__tf$i") > 0, 1).otherwise(0))
            .cast("double").as(s"__df$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val score = terms.indices.map { i =>
      val tf = col(s"__tf$i")
      val idf = log(lit(1.0) +
        (col("__n") - col(s"__df$i") + lit(0.5)) /
          (col(s"__df$i") + lit(0.5)))
      idf * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") /
          col("__avgdl")))
    }.reduce(_ + _)
    scored.select(col(idCol),
      (TextAnalysis.round4(score) + lit(0.0)).as("bm25"))
  }

  /** All-pairs TF-IDF cosine ABOVE a threshold via the posting table —
    * the sparse-vector sibling of the dense `dedup_cosine_pairs`: two
    * documents meet only through terms they share, so the pair space
    * is generated by a postings self-join on the term, never a doc ×
    * doc product. The df window is the fanout bound (a term in df
    * docs contributes ≤ df²/2 pairs — cap stopwords out exactly like
    * [[build]]); `nDocs` is passed in so the operator stays lazy.
    *
    * Replayability is engineered integer-side: weights are
    * tf·ln(N/df) scaled to 1e6 and floored into LONGS, so per-pair
    * dot products and per-doc norms are EXACT integer sums (order-
    * free) and the cosine is one double expression
    * `num / (√n₁ · √n₂)` both engines evaluate identically. Output:
    * (doc_a, doc_b, cos) for pairs with cos ≥ minSim, doc_a < doc_b. */
  def sparseCosinePairs(docs: DataFrame, idCol: String, textCol: String,
                        nDocs: Long, maxDfFrac: Double,
                        minSim: Double): DataFrame = {
    require(nDocs > 0, s"nDocs must be positive, got $nDocs")
    require(maxDfFrac > 0 && maxDfFrac <= 1, s"maxDfFrac in (0,1]")
    val maxDf = math.floor(maxDfFrac * nDocs).toLong
    val tf = docs
      .select(col(idCol).as("__d"),
        explode(transform(TextAnalysis.tokens(col(textCol)),
          t => lower(t))).as("term"))
      .where(length(col("term")) > 0)
      .groupBy("__d", "term").agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .where(col("df").between(2L, maxDf)) // df 1 cannot pair
    val weighted = tf.join(dfs, "term")
      .select(col("term"), col("__d"),
        floor(col("tf").cast("double") *
          log(lit(nDocs.toDouble) / col("df").cast("double")) * 1e6
          + 0.5).cast("long").as("w"))
    // products and sums run in DECIMAL(38,0): a rare hot term at
    // billion-doc scale gives w ~ 6e9 and w² ~ 3.6e19 > Long.MaxValue —
    // with ANSI off the long product wraps, sum goes negative,
    // sqrt(negative) is NaN and the pair silently VANISHES through the
    // >= minSim filter. Decimal keeps the "exact integer sums" claim
    // true at any corpus size (DuckDB's BIGINT sum promotes to int128,
    // so the oracle is exact the same way).
    val wd = col("w").cast("decimal(38,0)")
    val norms = weighted.groupBy("__d")
      .agg(sum(wd * wd).as("nn"))
    val num = weighted.as("l")
      .join(weighted.as("r"),
        col("l.term") === col("r.term") && col("l.__d") < col("r.__d"))
      .groupBy(col("l.__d").as("doc_a"), col("r.__d").as("doc_b"))
      .agg(sum(col("l.w").cast("decimal(38,0)") *
        col("r.w").cast("decimal(38,0)")).as("num"))
    num
      .join(norms.select(col("__d").as("doc_a"), col("nn").as("n1")),
        Seq("doc_a"))
      .join(norms.select(col("__d").as("doc_b"), col("nn").as("n2")),
        Seq("doc_b"))
      .withColumn("cos", col("num").cast("double") /
        (sqrt(col("n1").cast("double")) * sqrt(col("n2").cast("double"))))
      .where(col("cos") >= minSim)
      .select(col("doc_a"), col("doc_b"), col("cos"))
  }

  def lookupAll(index: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "at least one query term")
    val distinctTerms = terms.map(_.toLowerCase).distinct
    index.where(col("term").isin(distinctTerms: _*))
      .select(col("term"), explode(col("postings")).as("doc_id"))
      .groupBy("doc_id")
      .agg(countDistinct("term").as("n_terms"))
      .where(col("n_terms") === distinctTerms.size)
      .select("doc_id")
  }
}
