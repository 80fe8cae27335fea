package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev probe: run one gate and print every Spark JOB it launches (id,
  * stage count, call site), then the total. The r18 `jobs` telemetry
  * showed per-job scheduling constants dominate multi-job gates on a
  * contended host (`dedup_component_sizes` topped the suite at 96);
  * this tool answers WHERE those jobs come from — AQE stage jobs per
  * materialization vs fixpoint rounds vs convergence counts — so a
  * trim targets the real mass. Not part of the library surface.
  *
  * `sbt "runMain graft.tools.JobAudit dedup_component_sizes [sfDir]"`
  */
object JobAudit {
  def main(args: Array[String]): Unit = {
    val gate = args.headOption.getOrElse("dedup_component_sizes")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
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

    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("?")
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.add(f"job ${js.jobId}%3d  stages=${js.stageInfos.size}%2d" +
          f"  $site  ${desc.take(80)}")
        ()
      }
    })

    val df = graft.SparkEntry.queries(gate)(spark, sfDir)
    val n = df.count()
    // listener events are async; give the bus a moment to drain
    Thread.sleep(500)
    jobs.forEach(l => println(s"[jobaudit] $l"))
    println(s"[jobaudit] $gate: ${jobs.size} jobs, $n result rows")
    // storage telemetry (round-20 verdict item 6): what the gate left
    // pinned in the block manager — iterative loops should hold at
    // most one round's blocks after the release hygiene
    val storage = spark.sparkContext.getRDDStorageInfo
    println(f"[jobaudit] storage after run: ${storage.length} rdds, " +
      f"${storage.map(_.memSize).sum / 1024.0 / 1024}%.1f MB mem, " +
      f"${storage.map(_.diskSize).sum / 1024.0 / 1024}%.1f MB disk")
    spark.stop()
  }
}
