package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Md5Prefix

/** Class-balanced downsampling — equalize a label distribution by
  * keeping exactly `min-class-count` rows of EVERY class, selected as
  * the md5-smallest ids within each class: deterministic (any engine
  * replays the kept set), unbiased w.r.t. the data (the hash is
  * independent of every feature), and stable under re-runs — the
  * standard prep for training on skewed labels.
  *
  * Shape: the class histogram is one map-side-combined aggregation
  * (collect is |classes| rows — driver-bounded); the per-class
  * bottom-k selection runs on the custom [[graft.plans.TopKPerGroup]]
  * physical operator — bounded k-row buffers on each side of ONE hash
  * exchange, no per-class window sort, so a majority class of any
  * size never funnels through one task's sort. */
object ClassBalance {
  def downsample(df: DataFrame, classCol: String, idCol: String)
      : DataFrame = {
    val base = df.where(col(classCol).isNotNull && col(idCol).isNotNull)
    val counts = base.groupBy(col(classCol)).agg(count(lit(1)).as("c"))
      .agg(min("c")).head()
    require(!counts.isNullAt(0), "no non-null classes to balance")
    val k = counts.getLong(0)
    require(k <= Int.MaxValue, s"min class count $k exceeds Int range")
    val negh = -Md5Prefix(col(idCol).cast("string"), 15)
    Analytics.topKPerGroupExec(base.withColumn("__negh", negh),
        Seq(classCol), "__negh", k.toInt, Seq(idCol))
      .drop("__negh")
  }
}
