package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the OPTIMIZE/bin-packing step every
  * 100 TB table eventually needs: streaming ingest and partitioned
  * writes leave thousands of under-sized files per partition, and read
  * throughput dies on per-file open costs. The planner takes the file
  * STATS table (one row per file — ~800k rows for 100 TB of 128 MB
  * files, trivially small next to the data) and assigns each file a
  * target-sized output bin; the rewrite job then reads each bin's files
  * and writes one object.
  *
  * Bin rule: files in ascending `fileCol` order (keeps any
  * cluster-order locality the layout already paid for — compacting a
  * Z-ordered table must not interleave its files), each file's bin is
  * `floor(bytes-before-it / targetBytes)` — the greedy first-fit pack
  * in one pass. Every interior bin's total lands in
  * (target − maxFile, target + maxFile]: a file only opens bin b+1
  * once bin b has at least `target` bytes behind it.
  *
  * The exclusive running sum is [[BucketedPrefixSum]] — two-level, so
  * even a hundred-million-file stats table never sorts on one task. */
object Compaction {

  /** Adds `cum_before` (exclusive byte prefix sum) and `bin` to the
    * stats table. `fileCol` must be a unique non-negative integral id
    * (the layout order); `bytesCol` the file's size. */
  def planBins(stats: DataFrame, fileCol: String, bytesCol: String,
               targetBytes: Long, bucketWidth: Long = 1L << 16): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    BucketedPrefixSum(stats, fileCol, bytesCol, "cum_before", bucketWidth)
      .withColumn("bin", expr(s"cum_before div $targetBytes"))
  }

  /** The plan summary a compaction job consumes: one row per output
    * bin with its file count and total bytes. */
  def binSummary(stats: DataFrame, fileCol: String, bytesCol: String,
                 targetBytes: Long,
                 bucketWidth: Long = 1L << 16): DataFrame =
    planBins(stats, fileCol, bytesCol, targetBytes, bucketWidth)
      .groupBy("bin")
      .agg(count(lit(1)).as("n_files"),
        sum(bytesCol).as("total_bytes"))
}
