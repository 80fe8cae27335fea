package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Forensic probe for the ExactSubstr chains' exchange structure: the
  * gram stream is supposed to shuffle ONCE per chain — the `groupBy`
  * count and the join-back both want __k partitioning, so the physical
  * plan should carry a ReusedExchange, and ScaleRehearsal5's
  * 300k→1M shuffle-byte jump (2-3x past linear) says that reuse is
  * breaking somewhere past ~300k docs. Prints the FINAL adaptive plan
  * (after execution, so AQE has settled) with Exchange/ReusedExchange
  * counts at the sizes given as args (default 300k and 1M).
  *
  * Run: `sbt "runMain graft.tools.SubstrPlanProbe [docs ...]"`. */
object SubstrPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("substr-plan-probe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val boiler = (1 to 8).map(i => s"BOILER$i..").mkString

    def synth(docs: Long): DataFrame =
      spark.range(docs).select(col("id").as("doc_id"),
        concat(
          expr("""array_join(transform(sequence(1, 12),
            j -> substr(md5(concat(id, '|', j)), 1, 10)), '')"""),
          when(pmod(col("id"), lit(2L)) === 0, lit(boiler))
            .otherwise(expr("substr(md5(concat(id, '|odd')), 1, 8)")),
          expr("substr(md5(concat(id, '|tail')), 1, 16)")).as("text"))

    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(300000L, 1000000L)
    for (docs <- sizes; (name, f) <- Seq(
      ("full", (d: DataFrame) => graft.textanalysis.TextAnalysis
        .exactSubstrDedup(d, "doc_id", "text", minLen = 50)),
      ("mini", (d: DataFrame) => graft.textanalysis.TextAnalysis
        .exactSubstrDedupMinimized(d, "doc_id", "text", minLen = 50,
          k = 8)))) {
      val out = f(synth(docs))
      out.agg(count(lit(1))).collect()
      val plan = out.queryExecution.executedPlan.toString
      val nEx = "(?<!Reused)Exchange ".r.findAllIn(plan).size
      val nReused = "ReusedExchange".r.findAllIn(plan).size
      val nAqe = "AQEShuffleRead".r.findAllIn(plan).size
      println(s"[probe] $name @ $docs docs: Exchange=$nEx " +
        s"ReusedExchange=$nReused AQEShuffleRead=$nAqe")
      if (sys.env.contains("SUBSTR_PROBE_PLAN")) println(plan)
    }
    spark.stop()
  }
}
