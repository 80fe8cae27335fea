package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query is forced through a full evaluation by hashing every output
  * column into one aggregate — `count()` alone would let Catalyst prune
  * projections and skip the actual operator work being measured.
  *
  * Every query is timed twice and the BEST run is reported: a one-shot
  * measurement has no defense against transient host contention (the
  * round-7 committed bench overstated ~16 gates by 3–14× versus a quiet
  * rerun of the identical binary). The minimum of two runs bounds the
  * noise a single contended scheduling window can inject while staying
  * cheap enough for the per-round driver run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.select(xxhash64(df.columns.map(col): _*).as("__h"))
          .agg(expr("bit_xor(__h)")).collect() // xor: no ANSI sum overflow
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // best of 2: immune to a transiently contended host window. The
    // stream_* family gets best of 3 — micro-batch scheduling adds
    // jitter batch queries don't have (observed same-gate run-pair
    // ratios up to 1.8x), and one extra sample separates a real
    // regression from a slow scheduler wakeup.
    def forceEval(name: String): Double = {
      val tries = if (name.startsWith("stream_")) 3 else 2
      var best = once(name)
      if (best < 0) return best
      var i = 1
      while (i < tries) {
        val t = once(name)
        if (t >= 0 && t < best) best = t
        i += 1
      }
      best
    }

    // warmup: JIT + codegen + filesystem caches on a trivial scan
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    // host calibration: gate seconds are only comparable across rounds
    // when the host is. Two fixed probes — a single-thread JVM hash
    // loop (CPU clock/IPC) and a parallel codegen'd range-xxhash reduce
    // (whole-machine throughput) — let a reader normalize trajectories
    // run on different hosts (observed fleet variance: ~1.5x on
    // CPU-bound gates between otherwise-identical rounds).
    val calibJvm = {
      val t0 = System.nanoTime()
      var acc = 0L; var i = 0L
      while (i < 200000000L) { acc = acc * 6364136223846793005L + i; i += 1 }
      if (acc == 42L) println(acc) // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e9
    }
    // MULTI-probe (round-14 verdict item 2): a single probe showed 40%
    // spread within one committed pair, and budget-breach adjudication
    // plus cross-round host-vs-code attribution rested on that one
    // number. Five probes, MEDIAN reported under the established key
    // (tools/check_bench.py and every prior-round comparison read
    // `spark_range_xxhash_s` — the median slots in unchanged), with the
    // raw probes alongside so a reader can see the in-run spread.
    val calibProbes = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      spark.range(200000000L).select(xxhash64(col("id")).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val calibSpark = calibProbes.sorted.apply(calibProbes.size / 2)

    // optional dev filter: `runMain graft.Bench name1,name2` times just
    // those gates (the driver passes no args — full suite)
    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(",").toSet) else None
    val results = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
      .map(n => n -> forceEval(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val calib = s""""calib":{"jvm_hash_loop_s":$calibJvm,""" +
      s""""spark_range_xxhash_s":$calibSpark,""" +
      s""""spark_range_xxhash_probes":${
        calibProbes.mkString("[", ",", "]")}}"""
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s"""$calib,"sf":"$sfDir"}"""
    // STDOUT gets a line that FITS: the driver keeps only the last
    // ~2000 chars of console output, and the full per-query map (200+
    // gates) is ~7 kB — every round's BENCH artifact parsed to null
    // because the line's head was cut off. The printed line carries
    // the suite total, calibration, and the 40 slowest gates (the ones
    // a regression reader looks at first) at 3-decimal precision —
    // ~1.3 kB, inside the window with room for sbt's trailer — plus a
    // pointer to the full-precision file below.
    def f3(v: Double): String = // Locale.ROOT: a comma separator from
      String.format(java.util.Locale.ROOT, "%.3f", // the host locale
        Double.box(v)) // would break the JSON
    val slow = results.filter(_._2 >= 0).sortBy(-_._2).take(40)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${f3(total)},"unit":"sec",""" +
        s""""n_queries":${results.size},"queries":$slow,$calib,""" +
        s""""queries_full":"see bench file","sf":"$sfDir"}""")
    // persist the FULL line (every gate, full precision): the stdout
    // tail can never carry it intact. Override the path via
    // SPARK_GRAFT_BENCH_OUT.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "target/bench.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(p, line + "\n")
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}
