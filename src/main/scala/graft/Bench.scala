package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and emits a JSON artifact with per-query seconds.
  *
  * Each query is forced through a full evaluation by hashing every output
  * column into one aggregate — `count()` alone would let Catalyst prune
  * projections and skip the actual operator work being measured.
  *
  * DESIGN: coverage first, precision second. The round-16 driver bench
  * was killed at its wall-clock cap (rc=124) before the single
  * end-of-run JSON line was printed, so the official artifact parsed to
  * null even though the engine was healthy. This version:
  *
  *   1. silences INFO/WARN log spam (the WindowExec warnings flooded
  *      the driver's ~2000-char stdout tail past the JSON line);
  *   2. optionally warms every gate once on a 1%-scale sibling dir
  *      (sf0.001) so JIT/codegen/shuffle paths are primed and run 1 is
  *      gradable (round-16 verdict item 8: contended first runs showed
  *      graph gates 2–27x; set SPARK_GRAFT_BENCH_WARMUP=off to skip);
  *   3. times every gate ONCE and re-emits the cumulative artifact —
  *      stdout compact line + full-precision file — after EVERY gate,
  *      so a kill at any instant leaves the latest parseable line in
  *      the stdout tail and a complete file on disk;
  *   4. only then refines with a second (and for stream_* a third)
  *      timing pass, keeping the best and re-emitting as it goes. A
  *      one-shot measurement has no defense against transient host
  *      contention (the round-7 committed bench overstated ~16 gates by
  *      3–14x vs a quiet rerun), so best-of-2 stays the quoted number
  *      whenever the cap allows the refinement pass to finish.
  *
  * Knobs (all env):
  *   SPARK_GRAFT_SF_DIR       data dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_BENCH_OUT    full-precision artifact path
  *                            (default target/bench.json)
  *   SPARK_GRAFT_BENCH_WARMUP "auto" (default: use the sf0.001 sibling
  *                            of SF_DIR if it exists), "off", or an
  *                            explicit warmup data dir
  *   SPARK_GRAFT_BENCH_WARMUP_BUDGET_S  warmup sweep time bound,
  *                            default 150 (0 = warm every gate)
  *   SPARK_GRAFT_BENCH_PASSES timing passes, default 2 (stream_* gates
  *                            get one extra — micro-batch scheduling
  *                            adds jitter batch queries don't have;
  *                            observed same-gate run-pair ratios to 1.8x).
  *                            Pass 1 counts: PASSES=2 means each gate is
  *                            timed twice total (best-of-2; stream_*
  *                            best-of-3)
  *   SPARK_GRAFT_BENCH_TIME_BUDGET_S  WALL-CLOCK budget in seconds,
  *                            default 3000 (0 = unbounded). Warmup +
  *                            calibration + pass 1 always run to
  *                            completion (coverage first); refinement
  *                            passes are skipped or cut short the moment
  *                            the budget is spent, so the process EXITS
  *                            ZERO with a complete artifact instead of
  *                            running into an external kill cap (the
  *                            r16/r17 driver artifacts died rc=124 with
  *                            the data already computed). Under heavy
  *                            host contention pass 1 alone can price ~9x
  *                            the quiet number — the budget is what
  *                            turns that into a slow-but-parsed artifact
  *   SPARK_GRAFT_BENCH_SHARD  "i/n" (i in 0..n-1): time only gates whose
  *                            index mod n == i in the sorted gate list,
  *                            so a time-capped harness can split the
  *                            suite across invocations and merge the
  *                            per-shard `queries` maps
  *   SPARK_GRAFT_CPUS         local[] parallelism (default all cores)
  * Dev filter: `runMain graft.Bench name1,name2` times just those gates
  * (the driver passes no args — full suite).
  *
  * The full-precision artifact also carries a per-gate Spark JOB count
  * (`"jobs"`), measured on each gate's pass-1 run: the r17 drift
  * forensics showed per-JOB constants (scheduling/IO, ~60-100 ms per
  * job on a contended host) dominate multi-job iterative gates, so the
  * job count is the denominator a reader needs to attribute drift to
  * host overhead vs code.
  */
object Bench {

  /** Gate selection: optional name filter, then the `i/n` shard slice
    * (index mod n == i over the SORTED, filtered list). Pure so the
    * shard knob is spec-testable: the n shards PARTITION the suite —
    * disjoint, complete, stable under re-invocation. */
  private[graft] def selectGates(all: Seq[String],
                                 only: Option[Set[String]],
                                 shard: Option[(Int, Int)]): Seq[String] =
    all.sorted
      .filter(n => only.forall(_.contains(n)))
      .zipWithIndex
      .filter { case (_, ix) => shard.forall { case (i, n) => ix % n == i } }
      .map(_._1)

  /** Parse "i/n" (0-indexed shard of n). */
  private[graft] def parseShard(s: String): (Int, Int) = {
    val Array(i, n) = s.split("/").map(_.trim.toInt)
    require(n > 0 && i >= 0 && i < n,
      s"SPARK_GRAFT_BENCH_SHARD must be i/n with 0 <= i < n, got $s")
    (i, n)
  }

  def main(args: Array[String]): Unit = {
    val benchT0 = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - benchT0) / 1e9
    val timeBudgetS = sys.env
      .getOrElse("SPARK_GRAFT_BENCH_TIME_BUDGET_S", "3000").toDouble
    def budgetSpent: Boolean = timeBudgetS > 0 && elapsedS >= timeBudgetS
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
    // ERROR, not WARN: per-batch WindowExec/streaming WARN lines ran to
    // hundreds of kB over 317 gates and pushed the final JSON line out
    // of the driver harness's bounded stdout tail (round-16 artifact
    // loss). Anything log-worthy for a bench run is already captured in
    // the per-gate failure handler below.
    spark.sparkContext.setLogLevel("ERROR")

    // per-gate job counter: one listener, an atomic the timing loop
    // snapshots around each gate run. Job START (not end) so a failed
    // gate still books the jobs it launched.
    val jobCounter = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCounter.incrementAndGet(); ()
        }
      })
    val jobs = scala.collection.mutable.LinkedHashMap[String, Long]()
    var trackJobs = false // pass 1 at SF_DIR only (warmup runs at 1%
    // scale where AQE can pick different plans, refinement would just
    // re-book the same number)

    def once(name: String, dir: String): Double = {
      val j0 = jobCounter.get()
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        df.select(xxhash64(df.columns.map(col): _*).as("__h"))
          .agg(expr("bit_xor(__h)")).collect() // xor: no ANSI sum overflow
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          if (trackJobs) jobs(name) = jobCounter.get() - j0
          return -1.0
      }
      if (trackJobs) jobs(name) = jobCounter.get() - j0
      (System.nanoTime() - t0) / 1e9
    }

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
    // spread within one committed pair. Five probes, MEDIAN reported
    // under the established key (tools/check_bench.py and every
    // prior-round comparison read `spark_range_xxhash_s`), raw probes
    // alongside so a reader can see the in-run spread.
    val calibProbes = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      spark.range(200000000L).select(xxhash64(col("id")).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val calibSpark = calibProbes.sorted.apply(calibProbes.size / 2)
    val calib = s""""calib":{"jvm_hash_loop_s":$calibJvm,""" +
      s""""spark_range_xxhash_s":$calibSpark,""" +
      s""""spark_range_xxhash_probes":${
        calibProbes.mkString("[", ",", "]")}}"""

    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(",").toSet) else None
    val shard: Option[(Int, Int)] =
      sys.env.get("SPARK_GRAFT_BENCH_SHARD").map(parseShard)
    val gates = selectGates(SparkEntry.queries.keys.toSeq, only, shard)

    // warmup: one untimed run per gate at 1% scale primes JIT, codegen
    // caches, and shuffle/broadcast machinery so the FIRST timed run is
    // gradable (a full-sweep warmup measured run-1 best-of-2 within
    // 1.04x of pass-1 alone). sf0.001 is ~1/100 of sf0.1. The sweep is
    // TIME-BOUNDED (SPARK_GRAFT_BENCH_WARMUP_BUDGET_S, default 150 s;
    // 0 = unbounded): a full 320-gate dry pass costs ~7 min, which
    // would push the first full-coverage artifact emission past a
    // tight harness cap — so the known contention-sensitive families
    // (graph/stream/components/pipelines, the 2–27x run-1 offenders)
    // warm first and the sweep stops when the budget runs out.
    val warmupDir: Option[String] =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "auto") match {
        case "off" => None
        case "auto" =>
          val sib = sfDir.replaceAll("sf[0-9.]+/?$", "sf0.001")
          if (sib != sfDir && java.nio.file.Files.isDirectory(
            java.nio.file.Paths.get(sib))) Some(sib)
          else None
        case dir => Some(dir)
      }
    val warmupBudgetS = sys.env
      .getOrElse("SPARK_GRAFT_BENCH_WARMUP_BUDGET_S", "150").toDouble
    // the whole sweep is best-effort: a warmup dir missing a table (an
    // explicit SPARK_GRAFT_BENCH_WARMUP pointing somewhere incomplete)
    // must cost at most a stderr line, never the artifact the bench
    // exists to produce — per-gate failures are already absorbed by
    // once(), this catch covers the dir-level touch itself
    warmupDir.foreach { wd =>
      try {
        spark.read.parquet(s"$wd/nation.parquet").count()
        val hot = (n: String) => n.startsWith("graph_") ||
          n.startsWith("stream_") || n.startsWith("pipeline_") ||
          n.contains("components")
        val ordered = gates.filter(hot) ++ gates.filterNot(hot)
        val t0 = System.nanoTime()
        var i = 0
        while (i < ordered.size && (warmupBudgetS <= 0 ||
          (System.nanoTime() - t0) / 1e9 < warmupBudgetS)) {
          once(ordered(i), wd)
          i += 1
        }
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] warmup sweep at $wd skipped: " +
            e.getMessage)
      }
    }
    // even with no warmup dir: touch the data path once
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    // ---- incremental emission ------------------------------------
    def f3(v: Double): String = // Locale.ROOT: a comma separator from
      String.format(java.util.Locale.ROOT, "%.3f", // the host locale
        Double.box(v)) // would break the JSON
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "target/bench.json")
    val best = scala.collection.mutable.LinkedHashMap[String, Double]()

    /** Rewrite the full-precision file and print the compact stdout
      * line reflecting everything timed so far. Called after EVERY
      * gate: the stdout tail then always ends on a parseable line and
      * the file on disk is never stale by more than one gate. The
      * compact line carries the suite total, calibration, and the 40
      * slowest gates at 3-decimal precision (~1.3 kB — inside the
      * harness's tail window); the file carries every gate at full
      * precision. `partial` flags an emission the suite hasn't fully
      * covered yet (pass 1 still running or a dev/shard subset).
      */
    def emit(pass: Int, done: Int): Unit = {
      val results = best.toSeq
      val total = results.map(_._2).filter(_ >= 0).sum
      val meta = s""""n_queries":${results.size},"n_gates":${gates.size},""" +
        s""""pass":$pass,"partial":${done < gates.size},""" +
        s""""elapsed_s":${f3(elapsedS)},"time_budget_s":$timeBudgetS,""" +
        shard.map { case (i, n) => s""""shard":"$i/$n",""" }.getOrElse("")
      val qsFull = results.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val jobsFull = jobs.toSeq.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val line =
        s"""{"metric":"total","value":$total,"unit":"sec",$meta""" +
          s""""queries":$qsFull,"jobs":$jobsFull,$calib,"sf":"$sfDir"}"""
      try {
        val p = java.nio.file.Paths.get(outPath)
        Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.writeString(p, line + "\n")
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
      }
      // STDOUT gets a line that FITS: the driver keeps only the last
      // ~2000 chars of console output, and the full per-query map (300+
      // gates) is ~10 kB — printed whole it would self-truncate.
      val slow = results.filter(_._2 >= 0).sortBy(-_._2).take(40)
        .map { case (k, v) => "\"" + k + "\":" + f3(v) }
        .mkString("{", ",", "}")
      println(
        s"""{"metric":"total","value":${f3(total)},"unit":"sec",$meta""" +
          s""""queries":$slow,"jobs_total":${jobs.valuesIterator.sum},""" +
          s"""$calib,"queries_full":"$outPath","sf":"$sfDir"}""")
    }

    // pass 1: full coverage as fast as possible, artifact after each gate
    var done = 0
    trackJobs = true
    gates.foreach { n =>
      best(n) = once(n, sfDir)
      done += 1
      emit(1, done)
    }
    trackJobs = false
    // refinement passes: keep the best observed time per gate, with the
    // attempts BACK-TO-BACK per gate. This matters for comparability:
    // running the whole suite between a gate's two attempts evicts the
    // codegen/plan caches (the class cache holds ~100 entries, the
    // suite has 320+ gates), so every attempt re-pays a fixed
    // compile/analyze cost — measured as +0.1–0.15 s on EVERY gate
    // (tiny gates drifted 1.55x, big ones 1.13x — the signature of a
    // constant additive term, not host throttling). A consecutive
    // second attempt runs hot, which is exactly what the pre-r17 bench
    // measured. Pass 1 already timed each gate once, so every
    // refinement pass adds ONE more attempt (TWO for stream_* —
    // micro-batch scheduling adds jitter batch queries don't have,
    // observed same-gate run-pair ratios up to 1.8x): the default
    // PASSES=2 quotes exactly best-of-2 / stream best-of-3. A gate
    // that failed transiently (-1 sentinel) gets one recovery attempt
    // per refinement pass instead — a one-off hiccup in pass 1 must
    // not book -1 into the committed artifact when a later run
    // succeeds. Refinement is OPTIONAL precision: the moment the
    // wall-clock budget is spent the loop stops (mid-pass is fine —
    // emit ran after every gate, so best-so-far is already on disk)
    // and the process exits 0 with the complete pass-1 coverage.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    var p = 2
    var lastPass = 1
    var stopped = false
    while (p <= passes && !stopped) {
      val it = gates.iterator
      while (it.hasNext && !stopped) {
        if (budgetSpent) {
          System.err.println(f"[bench] time budget ($timeBudgetS%.0f s) " +
            f"spent at ${elapsedS}%.1f s - skipping remaining refinement")
          stopped = true
        } else {
          val n = it.next()
          if (best(n) >= 0) {
            val tries = if (n.startsWith("stream_")) 2 else 1
            var i = 0
            while (i < tries) {
              val t = once(n, sfDir)
              if (t >= 0 && t < best(n)) best(n) = t
              i += 1
            }
          } else {
            val t = once(n, sfDir)
            if (t >= 0) best(n) = t
          }
          emit(p, done)
          lastPass = p
        }
      }
      p += 1
    }
    spark.stop()
    // the very LAST stdout write is one more compact artifact line: a
    // harness that keeps only the tail of the console always finds a
    // complete, parseable line ending the stream (Spark's shutdown can
    // interleave output with the last in-loop emission)
    emit(lastPass, done)
  }
}
