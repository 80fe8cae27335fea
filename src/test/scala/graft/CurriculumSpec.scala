package graft

import org.apache.spark.sql.functions._
import graft.operators.Curriculum

/** Property pins for the curriculum scheduler: band balance, schedule
  * monotonicity, and value-pure determinism. */
class CurriculumSpec extends SparkTestBase {
  import spark.implicits._

  test("interleave: equi-depth bands, each band internally ordered by " +
    "difficulty, schedule round-robins across bands") {
    val df = (1 to 80).map(i => (i.toLong, i.toDouble))
      .toDF("id", "diff")
    val out = Curriculum.interleave(df, "diff", nBands = 4)
      .select("id", "diff", "band", "within_pct").collect()
    // equi-depth: 20 rows per band, bands ordered by value range
    val byBand = out.groupBy(_.getInt(2)).view.mapValues(_.map(_.getDouble(1)))
    assert(byBand.keySet === Set(0, 1, 2, 3))
    assert(byBand.mapValues(_.length).toMap.values.toSet === Set(20))
    assert(byBand(0).max < byBand(1).min && byBand(2).max < byBand(3).min)
    // schedule order: sort by (within_pct, band) — the first 4 rows
    // must be the 4 bands' easiest rows
    val sched = out.sortBy(r => (r.getDouble(3), r.getInt(2)))
    assert(sched.take(4).map(_.getInt(2)).toSeq === Seq(0, 1, 2, 3))
    assert(sched.take(4).map(_.getDouble(1)).toSeq === Seq(1.0, 21.0, 41.0, 61.0))
    // within each band the schedule is easy -> hard
    for ((_, vs) <- out.groupBy(_.getInt(2))) {
      val ordered = vs.sortBy(_.getDouble(3)).map(_.getDouble(1))
      assert(ordered.toSeq === ordered.sortBy(identity).toSeq)
    }
  }

  test("interleave: ties share band and within-rank (value-pure, " +
    "input-order invariant)") {
    val rows = Seq((1L, 2.0), (2L, 1.0), (3L, 2.0), (4L, 3.0), (5L, 2.0))
    val fwd = Curriculum.interleave(rows.toDF("id", "diff"), "diff", 2)
      .select("id", "band", "within_pct").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
    val rev = Curriculum.interleave(rows.reverse.toDF("id", "diff"),
        "diff", 2)
      .select("id", "band", "within_pct").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
    assert(fwd.toSeq === rev.toSeq)
    val tied = fwd.filter(t => Set(1L, 3L, 5L).contains(t._1))
    assert(tied.map(_._2).distinct.length === 1, "equal values, one band")
    assert(tied.map(_._3).distinct.length === 1, "equal values, one rank")
  }

  test("interleave: reliable-checkpoint mode lands the identical " +
    "schedule (the cluster-durability path — localCheckpoint blocks " +
    "have no lineage to survive executor loss)") {
    val dir = java.nio.file.Files.createTempDirectory("curr-ckpt")
      .toString
    try {
      val df = (1 to 40).map(i => (i.toLong, (i * 7 % 40).toDouble))
        .toDF("id", "diff")
      val local = Curriculum.interleave(df, "diff", nBands = 4)
        .select("id", "band", "within_pct").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
      val reliable = Curriculum.interleave(df, "diff", nBands = 4,
          checkpointDir = Some(dir))
        .select("id", "band", "within_pct").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
      assert(local.toSeq === reliable.toSeq)
      // the reliable path actually materialized into the directory
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "checkpoint() must write to the reliable dir")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
