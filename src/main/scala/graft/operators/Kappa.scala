package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohen's kappa — chance-corrected agreement between two labelers
  * over the same items: κ = (p_o − p_e)/(1 − p_e), where p_o is the
  * observed agreement rate and p_e the agreement expected from the
  * two labelers' marginal label distributions. THE quality number for
  * a labeling pipeline (human vs model, model vs model, old prompt vs
  * new prompt): raw agreement flatters any skewed label set; kappa
  * doesn't.
  *
  * Exactness: everything up to the final two divisions is INTEGER —
  * n and the diagonal count are plain counts, and p_e's numerator
  * Σ_k row_k·col_k accumulates in DECIMAL(38,0) (products of two
  * counts overflow a long near 2^31.5 rows per label; 38 digits hold
  * any 10^12-row corpus), so both engines compute identical p_o, p_e
  * and the single κ expression replays bit-for-bit, rounded at 1e-6.
  *
  * Shape: one grouped count over (labelA, labelB) — the confusion
  * matrix, map-side combined, |labels|² rows — then label-sized
  * margin aggregates and a 1-row reduce. Rows where either label is
  * null are dropped (un-labeled items don't vote). Degenerate p_e = 1
  * (both labelers constant and equal) yields κ = 1 when p_o = 1 by
  * convention. Output: one row (n, p_o, p_e, kappa). */
object Kappa {
  def cohen(df: DataFrame, labelA: Column, labelB: Column): DataFrame = {
    val cells = df.select(labelA.cast("string").as("la"),
        labelB.cast("string").as("lb"))
      .where(col("la").isNotNull && col("lb").isNotNull)
      .groupBy("la", "lb").agg(count(lit(1)).as("o"))
      .localCheckpoint() // |labels|² rows; feeds margins + diagonal
    val rowM = cells.groupBy("la").agg(sum("o").as("rown"))
    val colM = cells.groupBy("lb").agg(sum("o").as("coln"))
    // Σ_k row_k·col_k over the shared label set: the margins join on
    // the label value (a label missing from one side contributes 0)
    val peNum = rowM.join(colM, col("la") === col("lb"))
      .select((col("rown").cast("decimal(38,0)") *
        col("coln").cast("decimal(38,0)")).as("rc"))
      .agg(coalesce(sum("rc"), lit(0).cast("decimal(38,0)")).as("pe_num"))
    val agg = cells.agg(
      sum("o").as("n"),
      sum(when(col("la") === col("lb"), col("o")).otherwise(0L))
        .as("diag"))
    val po = col("diag").cast("double") / col("n").cast("double")
    val pe = col("pe_num").cast("double") /
      (col("n").cast("double") * col("n").cast("double"))
    val kappa = when(pe === 1.0, when(po === 1.0, 1.0).otherwise(0.0))
      .otherwise((po - pe) / (lit(1.0) - pe))
    agg.crossJoin(broadcast(peNum))
      .where(col("n") > 0)
      .select(col("n"),
        (floor(po * 1e6 + 0.5) / 1e6).as("p_o"),
        (floor(pe * 1e6 + 0.5) / 1e6).as("p_e"),
        (floor(kappa * 1e6 + 0.5) / 1e6).as("kappa"))
  }
}
