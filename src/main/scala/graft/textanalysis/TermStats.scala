package graft.textanalysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Term↔label mutual information — the classic feature-selection
  * ranking for text classifiers (which terms carry signal about the
  * label; the top of this list is what a pruned [[NaiveBayes]] model
  * or a routing heuristic keeps). MI(t; y) over the 2×2 contingency
  * of "document contains t" × "document is positive":
  * Σ p(i,j)·ln(p(i,j)/(p(i)·p(j))), empty cells contributing 0.
  *
  * One distinct (doc, term) explode, one grouped count carrying both
  * class counts as conditional sums (map-side combined), one broadcast
  * 1-row total — the corpus scans once and nothing shuffles but the
  * per-term count rows. Document totals count every LABELED document
  * (a doc with no tokens still occupies the no-term cells — dropping
  * it would bias every marginal).
  *
  * Replayability: cells are fixed-order double arithmetic over exact
  * long counts (products in the double domain, so 10^12-doc corpora
  * cannot overflow the long multiply), natural log on both engines,
  * summed in the fixed 11+10+01+00 order and floor-rounded to 1e-6 at
  * the edge. Output: (term, df, mi), df ≥ minDf. */
object TermStats {
  def termMutualInfo(docs: DataFrame, idCol: String, textCol: String,
                     posLabel: Column, minDf: Long = 1L): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val labeled = docs.select(col(idCol).as("__id"),
        col(textCol).as("__text"), posLabel.cast("boolean").as("__pos"))
      .where(col("__pos").isNotNull)
    val tot = labeled.agg(count(lit(1)).as("__N"),
      sum(when(col("__pos"), 1L).otherwise(0L)).as("__Np"))
    val td = labeled
      .select(col("__id"), col("__pos"),
        explode(array_distinct(transform(
          TextAnalysis.tokens(col("__text")), t => lower(t))))
          .as("term"))
      .where(length(col("term")) > 0)
    val cnt = td.groupBy("term")
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("__c1p"),
        sum(when(col("__pos"), 0L).otherwise(1L)).as("__c1n"))
    val nD = col("__N").cast("double")
    def cell(nij: Column, ni: Column, nj: Column): Column =
      when(nij === 0, lit(0.0))
        .otherwise((nij.cast("double") / nD) *
          log((nD * nij.cast("double")) /
            (ni.cast("double") * nj.cast("double"))))
    val c1p = col("__c1p"); val c1n = col("__c1n")
    val df1 = c1p + c1n // row marginal: docs containing the term
    val df0 = col("__N") - df1
    val np = col("__Np"); val nn = col("__N") - col("__Np")
    val mi = cell(c1p, df1, np) + cell(c1n, df1, nn) +
      cell(np - c1p, df0, np) + cell(nn - c1n, df0, nn)
    cnt.crossJoin(broadcast(tot))
      .where(df1 >= minDf)
      .select(col("term"), df1.as("df"),
        (floor(mi * 1e6 + 0.5) / 1e6).as("mi"))
  }
}
