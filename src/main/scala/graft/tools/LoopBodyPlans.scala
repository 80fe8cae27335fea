package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Checkpoints

/** Dumps the EXECUTED adaptive plan of the graph fixpoint LOOP BODIES —
  * the evidence the round-19 verdict flagged as missing: the committed
  * `graph_kcore` before/after plans captured only the final
  * degree-count stage, not the per-round semi-joins whose
  * broadcast-vs-sort-merge choice is the whole point of running the
  * loops adaptive. Each body frame is built over the SAME pinned
  * inputs the gate's loop materializes, executed once through the noop
  * sink (so AQE finalizes its runtime join choices), then explained —
  * `isFinalPlan=true` with the actual join operators.
  *
  * Run: `sbt "runMain graft.tools.LoopBodyPlans <outdir> <suffix> [sfDir]"`
  * writes `<outdir>/graph_kcore_loopbody_<suffix>.txt` and
  * `<outdir>/graph_pagerank_loopbody_<suffix>.txt`. */
object LoopBodyPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: LoopBodyPlans <outdir> <suffix> [sfDir]")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
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

    // the trade multigraph exactly as the gates encode it (lineitem ⨝
    // orders; kcore's even/odd node encoding)
    def nsOk(c: org.apache.spark.sql.Column) = c.isNotNull
    val li = spark.read
      .option("mergeSchema", "false")
      .parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val trade = Checkpoints.pin(
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp")),
      None)

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      spark.sparkContext.setJobDescription(s"loop-body: $name")
      // execute THIS QueryExecution instance (a noop write would spawn
      // its own), so AQE finalizes its runtime join choices and the
      // explain below shows isFinalPlan=true with the actual operators
      val qe = df.queryExecution
      val n = qe.executedPlan.executeCollect().length
      spark.sparkContext.setJobDescription(null)
      val out = outDir.resolve(s"${name}_loopbody_$suffix.txt")
      Files.writeString(out, qe.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println(s"[loopbody] wrote $out ($n rows)")
    }

    // ---- graph_kcore: ONE peel round over the pinned und -----------
    val e = trade.select((col("cust") * 2).as("u"),
      (col("supp") * 2 + 1).as("v"))
      .where(nsOk(col("u")) && nsOk(col("v")) && col("u") =!= col("v"))
    val und = Checkpoints.pin(
      e.union(e.select(col("v").as("u"), col("u").as("v"))).distinct(),
      None)
    val keep = und.groupBy("u").agg(count(lit(1)).as("__d"))
      .where(col("__d") >= 3).select("u")
    val block = und
      .join(keep, Seq("u"), "left_semi")
      .join(keep.toDF("v"), Seq("v"), "left_semi")
      .select("u", "v")
    dump("graph_kcore", block)

    // ---- graph_pagerank: ONE contribution + rebuild iteration ------
    val pr = trade.select(
      concat(lit("c"), col("cust").cast("string")).as("src"),
      concat(lit("s"), col("supp").cast("string")).as("dst"))
    val pe = Checkpoints.pinIfLarge(pr.distinct(), None)
    val nodes = Checkpoints.pinIfLarge(
      pe.select(col("src").as("node"))
        .union(pe.select(col("dst").as("node"))).distinct(), None)
    val outDeg = pe.groupBy("src").agg(count(lit(1)).as("out_deg"))
    val withDeg = Checkpoints.pinIfLarge(pe.join(outDeg, "src"), None)
    val ranks0 = nodes.withColumn("rank", lit(1.0))
    val contrib = withDeg
      .join(ranks0, col("src") === col("node"))
      .select(col("dst"), (col("rank") / col("out_deg")).as("c"))
      .groupBy("dst").agg(sum("c").as("in_sum"))
    val ranks1 = nodes
      .join(contrib, col("node") === col("dst"), "left")
      .select(col("node"),
        (lit(0.15) + lit(0.85) * coalesce(col("in_sum"), lit(0.0)))
          .as("rank"))
    dump("graph_pagerank", ranks1)

    spark.stop()
  }
}
