package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Md5Prefix

/** Z-order (Morton) clustering — the multi-column data-layout primitive
  * behind lakehouse `OPTIMIZE ZORDER BY`: rows close in the interleaved
  * bit space are close in EVERY clustered column, so a range-partitioned
  * write by z-value gives min/max file statistics that prune scans on
  * ANY of the columns, not just the first sort key (a lexicographic
  * sort clusters only its leading column).
  *
  * Shape: each column buckets into 2^bits exact-quantile ranks — the
  * [[Analytics.quantileCutpoints]] broadcast + pure-map assignment, so
  * skewed columns still spread evenly over their rank space — then the
  * rank bits interleave into one long. Everything after the one
  * cutpoint reduce per column is a pure map over the scan; the layout
  * write is `repartitionByRange` on the z-value (sampled range
  * exchange) + sort within partitions. Cutpoints round to 6 dp before
  * comparison (the [[Analytics.bucketByCutpoints]] cross-engine
  * contract), which makes the whole z-value replayable in a SQL
  * oracle.
  */
object ZOrder {

  /** Interleave `ranks` (each in [0, 2^bits)) bit by bit: output bit
    * `i * n + j` is bit `i` of column `j` — the Morton code. Pure
    * integer expression, engine-agnostic. */
  def interleave(ranks: Seq[Column], bits: Int): Column =
    (0 until bits).flatMap { i =>
      ranks.zipWithIndex.map { case (r, j) =>
        shiftleft(shiftrightunsigned(r.cast("long"), i).bitwiseAND(lit(1L)),
          i * ranks.size + j)
      }
    }.reduce(_ + _)

  /** Inverse of [[interleave]]: recover column `j`'s rank from a
    * z-value over `n` columns (file-statistics math — a z-range's
    * per-column bounding box). */
  def deinterleave(z: Column, j: Int, n: Int, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(z, i * n + j).bitwiseAND(lit(1L)), i)
    }.reduce(_ + _)

  /** Add `__rank{j}` = column j's 2^bits exact-quantile rank — the
    * shared quantization under [[withZValue]], [[withHilbertValue]],
    * and layout diagnostics. ONE fused exact-percentile reduce covers
    * every column (a per-column reduce would rescan the table once per
    * clustered column — 2× the scans for the common 2-D layout);
    * the single 1-row cutpoint frame broadcasts back and assignment is
    * a pure map. */
  def withRanks(df: DataFrame, cols: Seq[String], bits: Int): DataFrame = {
    require(bits >= 1, s"bits must be positive: $bits")
    require(cols.nonEmpty, "need at least one rank column")
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits))
    val cutCols = cols.zipWithIndex.map { case (c, j) =>
      percentile(col(c), array(probs.map(lit): _*)).as(s"__cuts$j")
    }
    val cuts = df.agg(cutCols.head, cutCols.tail: _*)
    val ranked = cols.zipWithIndex.foldLeft(df.join(broadcast(cuts))) {
      case (d, (c, j)) =>
        d.withColumn(s"__rank$j",
          aggregate(col(s"__cuts$j"), lit(0),
            (acc, x) => acc + when(col(c) > round(x, 6), 1).otherwise(0)))
    }
    ranked.drop(cols.indices.map(j => s"__cuts$j"): _*)
  }

  /** Add `zCol` = the z-value over `cols` at 2^bits quantile ranks per
    * column. One exact-percentile reduce per column (broadcast back);
    * rank + interleave are a pure map. */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int,
                 zCol: String = "__z"): DataFrame = {
    require(cols.size >= 2, "z-ordering needs at least two columns")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits=$bits x ${cols.size} cols exceeds a long")
    withRanks(df, cols, bits)
      .withColumn(zCol,
        interleave(cols.indices.map(j => col(s"__rank$j")), bits))
      .drop(cols.indices.map(j => s"__rank$j"): _*)
  }

  /** The layout operation: z-value, range-repartition on it into
    * `numFiles` output partitions, sort within partitions — each
    * written file then covers a tight z-range, i.e. a tight min/max
    * box in every clustered column. */
  def clustered(df: DataFrame, cols: Seq[String], bits: Int,
                numFiles: Int): DataFrame =
    withZValue(df, cols, bits)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")

  /** Hilbert-curve distance of a 2-D rank cell (x, y), each in
    * [0, 2^bits) — the strictly-better-locality sibling of the Morton
    * code: CONSECUTIVE curve positions are always grid neighbors
    * (Manhattan distance 1; Morton jumps across the plane at power-of-
    * two boundaries), so range-partitioned files cover even tighter
    * per-column min/max boxes. A pure map over the scan, same as
    * [[interleave]], evaluated by the native codegen expression
    * [[graft.functions.HilbertD2]] — the original chained-column
    * build ([[hilbertD2Chained]]) duplicated both running coordinates
    * into every level's rotation, growing the generated Java ~3-4x
    * per bit and making codegen compile + JIT dominate small inputs
    * (the round-17 `scalar_hilbert` drift); a spec pins the two
    * bit-identical. */
  def hilbertD2(x0: Column, y0: Column, bits: Int): Column =
    graft.functions.HilbertD2(x0, y0, bits)

  /** The same transform as chained column expressions — the
    * engine-agnostic reference build the DuckDB oracle's CTE ladder
    * mirrors, kept as the equality pin for [[hilbertD2]]'s native
    * kernel (and as documentation of the per-level rotation). The
    * standard iterative quadrant transform: at each bit level, high to
    * low, accumulate the quadrant's contribution, then in the lower
    * half (ry=0) reflect when on the right (rx=1) and swap the axes. */
  private[graft] def hilbertD2Chained(x0: Column, y0: Column,
                                      bits: Int): Column = {
    require(bits >= 1 && 2 * bits <= 62, s"bits out of range: $bits")
    var x = x0.cast("long"); var y = y0.cast("long"); var d = lit(0L)
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      val rx = when(x.bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when(y.bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      d = d + lit(s) * lit(s) * (lit(3L) * rx).bitwiseXOR(ry)
      val nx = when(ry === 0,
        when(rx === 1, lit(s - 1) - y).otherwise(y)).otherwise(x)
      val ny = when(ry === 0,
        when(rx === 1, lit(s - 1) - x).otherwise(x)).otherwise(y)
      x = nx; y = ny
    }
    d
  }

  /** Add `hCol` = the Hilbert distance over two columns at 2^bits
    * quantile ranks each — identical rank derivation to [[withZValue]]
    * (one exact-percentile reduce per column, broadcast back; the
    * transform is a pure map). */
  def withHilbertValue(df: DataFrame, xCol: String, yCol: String,
                       bits: Int, hCol: String = "__h"): DataFrame = {
    require(bits >= 1 && 2 * bits <= 62, s"bits out of range: $bits")
    withRanks(df, Seq(xCol, yCol), bits)
      .withColumn(hCol, hilbertD2(col("__rank0"), col("__rank1"), bits))
      .drop("__rank0", "__rank1")
  }

  /** Data-skipping effectiveness report — the number layout work is FOR:
    * parquet/lakehouse scans prune a file when its min/max stats exclude
    * the predicate range, so "how many files does `valueCol BETWEEN lo
    * AND hi` touch" is the direct measure of a layout. Simulates two
    * layouts of the same rows into `nFiles` files — value-clustered
    * (the [[Analytics.qsketchRangeBuckets]] equi-depth assignment, the
    * TeraSort-sampler shape a real sorted write produces) vs hash-
    * scattered (md5 mod nFiles, the layout an unsorted ingest produces)
    * — computes per-file min/max, and reports files touched + rows
    * behind those files per layout. Both assignments are pure maps
    * (sketch cuts broadcast); the per-file stats are one map-side-
    * combined aggregate each. Output: (layout, files_total,
    * files_touched, rows_scanned), 2 rows. */
  def skippingReport(df: DataFrame, rowKey: Column, valueCol: String,
                     lo: Double, hi: Double, nFiles: Int,
                     k: Int = 1024): DataFrame = {
    require(nFiles > 1, s"nFiles must exceed 1, got $nFiles")
    val nn = df.where(col(valueCol).isNotNull)
    val clustered = Analytics.qsketchRangeBuckets(nn, rowKey, valueCol,
        k, nFiles)
      .select(col(valueCol).cast("double").as("v"),
        col("bucket").as("file"))
    val scattered = nn.select(col(valueCol).cast("double").as("v"),
      pmod(Md5Prefix(rowKey.cast("string"), 15), lit(nFiles.toLong)).cast("int").as("file"))
    def layoutRow(files: DataFrame, layout: String) = {
      val touched = col("v_min") <= hi && col("v_max") >= lo
      files.groupBy("file")
        .agg(min("v").as("v_min"), max("v").as("v_max"),
          count(lit(1)).as("n"))
        .agg(count(lit(1)).as("files_total"),
          sum(when(touched, 1L).otherwise(0L)).as("files_touched"),
          coalesce(sum(when(touched, col("n"))), lit(0L))
            .as("rows_scanned"))
        .select(lit(layout).as("layout"), col("files_total"),
          col("files_touched"), col("rows_scanned"))
    }
    layoutRow(clustered, "equidepth")
      .unionByName(layoutRow(scattered, "hash"))
  }
}
