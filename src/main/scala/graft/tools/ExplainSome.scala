package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for a comma-separated list of gates to
  * one file per gate — the before/after plan evidence for optimization
  * rounds. Run:
  *   sbt "runMain graft.tools.ExplainSome <gates> <outdir> <suffix> [sfDir]"
  * e.g.
  *   sbt "runMain graft.tools.ExplainSome agg_gini,agg_lorenz plans/r19 before"
  * writes plans/r19/agg_gini_before.txt etc. Uses the bench's session
  * shape (local[32], shuffle partitions = cores) so plans match what
  * the bench executes, unlike ExplainAll's local[4] PLANS.md sweep.
  */
object ExplainSome {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ExplainSome <gates,csv> <outdir> <suffix> [sfDir]")
    val gates = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val outDir = Paths.get(args(1))
    val suffix = args(2)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(outDir)
    gates.foreach { name =>
      val out = outDir.resolve(s"${name}_$suffix.txt")
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(out, txt)
        println(s"[explain] wrote $out")
      } catch {
        case e: Throwable =>
          Files.writeString(out, s"ERROR: ${e.getMessage}\n")
          println(s"[explain] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
