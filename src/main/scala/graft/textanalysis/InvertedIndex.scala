package graft.textanalysis

import org.apache.spark.sql.DataFrame
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
