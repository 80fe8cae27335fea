package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Dev-only stage profiler for the MinHash near-dup pipeline (the
  * heaviest bench queries). Attributes wall time to signature / banded
  * join / verification / expansion so regressions are diagnosable —
  * run with `sbt "runMain graft.tools.ProfileMinhash <sfDir>"`.
  */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("profile-minhash")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    time("docs count") { docs.count() }
    time("gate: pairs (t=.9, bands=8)") {
      Dedup.minhashNearDups(docs, "doc_id", "text", 0.9, 64, 8).count()
    }
    time("harder: pairs (t=.8, bands=16)") {
      Dedup.minhashNearDups(docs, "doc_id", "text", 0.8, 64, 16).count()
    }
    time("gate: keep (representatives)") {
      Dedup.minhashRepresentatives(docs, "doc_id", "text", 64, 8).count()
    }
    spark.stop()
  }
}
