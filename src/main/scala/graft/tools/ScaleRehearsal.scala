package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Scale rehearsal for the dedup path: replicate the documents corpus k
  * times (fresh ids, same texts — every original doc gains k-1 exact
  * duplicates, the realistic duplicate-heavy regime of web-scale
  * training data) and measure the near-dup operators.
  *
  * The digest-collapsed design should show its shape here: the unique
  * word-set count (and so the banded candidate join) is INVARIANT in k;
  * only the membership expansion grows with corpus size, while the
  * naive doc-level banding would grow the self-join quadratically in k
  * inside each duplicate cluster.
  *
  * Run: `sbt "runMain graft.tools.ScaleRehearsal <sfDir> <k>"`.
  */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("scale-rehearsal")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val n = base.count()
    // offset derived from the actual id range: a fixed stride would
    // silently collide replicas on corpora with large ids
    val stride = base.agg(max("doc_id")).head().getLong(0) + 1L
    val corpus = (0 until k).map { i =>
      base.select((col("doc_id") + lit(i.toLong * stride)).as("doc_id"),
        col("text"))
    }.reduce(_.unionAll(_))

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[rehearsal] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($rows rows)")
    }

    println(s"[rehearsal] base=$n docs, k=$k -> ${n * k} docs")
    time("exact dedup groups") {
      Dedup.exactGroups(corpus, "doc_id", "text").count()
    }
    time("minhash keep (representatives)") {
      Dedup.minhashRepresentatives(corpus, "doc_id", "text", 64, 8).count()
    }
    time("minhash pairs (gate: t=.9, b=8)") {
      Dedup.minhashNearDups(corpus, "doc_id", "text", 0.9, 64, 8).count()
    }
    spark.stop()
  }
}
