package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benford first-digit audit — the classic fabricated-data /
  * unit-mixup screen: naturally-occurring positive amounts follow
  * P(d) = log10(1 + 1/d); a synthetic or truncated feed doesn't. One
  * map-side-combined aggregation into at most 9 rows.
  *
  * The first significant digit is extracted WITHOUT log10 on the
  * value: the amount is scaled to integer cents with one IEEE
  * multiply + floor (deterministic on any engine), and the leading
  * digit is read off the integer's decimal string — multiplying by
  * 100 is an exact 10² shift, so the first significant digit is
  * unchanged and no `floor(log10(x))` power-of-ten knife edge ever
  * enters. Counts and shares are exact integers + one division;
  * `expected` and `dev` round at 1e-6.
  *
  * Domain: cents-precision positive amounts in (0.005, ~9.2e15).
  * Values below half a cent round to cents = 0 (no significant digit
  * at cents precision) and are excluded by the `cents >= 1` guard,
  * not emitted as a bogus digit-0 row with an undefined expected
  * share; values beyond Long.MaxValue/100 would overflow the long
  * cast and are outside the audit's monetary contract. */
object Benford {
  def firstDigit(df: DataFrame, valueCol: Column): DataFrame = {
    val cents = floor(valueCol.cast("double") * 100 + 0.5).cast("long")
    val digit = substring(cents.cast("string"), 1, 1).cast("int")
    val counts = df
      .where(valueCol.isNotNull && valueCol.cast("double") > 0 &&
        cents >= 1)
      .select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .transform(d => Checkpoints.pin(d)) // 9 rows; totals + shares share one pass (durable when the session has a checkpoint dir)
    val tot = counts.agg(sum("n").as("__t"))
    counts.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        (col("n").cast("double") / col("__t").cast("double"))
          .as("share"),
        (floor(log10(lit(1.0) + lit(1.0) / col("digit")) * 1e6 + 0.5) /
          1e6).as("expected"))
      .withColumn("dev",
        floor((col("share") - col("expected")) * 1e6 + 0.5) / 1e6)
      .select(col("digit"), col("n"),
        (floor(col("share") * 1e6 + 0.5) / 1e6).as("share"),
        col("expected"), col("dev"))
  }
}
