package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.KCore
import graft.operators.{Checkpoints, Curriculum, Labeling}
import graft.textanalysis.PerplexityBuckets

/** Pins for the reliable-checkpoint dual (round-17 verdict item 3):
  * every iterative / multi-scan operator that pins a corpus-sized
  * frame must land IDENTICAL output whether the pin is
  * `localCheckpoint()` (dev) or reliable `checkpoint(dir)` (cluster
  * durability), and the dir plumbing must never clobber a checkpoint
  * directory the session already configured (the ADVICE finding on
  * `Curriculum.interleave`). */
class CheckpointParitySpec extends SparkTestBase {
  import spark.implicits._

  private def withTmpDir[T](f: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    // self-contained under the FULL suite: an earlier suite's
    // checkpoint test leaves the session dir configured (pin never
    // unsets it — that's the non-clobbering contract), which would
    // legitimately route this test's reliable checkpoints elsewhere
    spark.sparkContext.setCheckpointDir(null)
    try f(dir.toString)
    finally {
      // restore session-global state for the other suites
      spark.sparkContext.setCheckpointDir(null)
    }
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def assertParity(run: Option[String] => DataFrame): Unit =
    withTmpDir { dir =>
      val local = sortedRows(run(None))
      val reliable = sortedRows(run(Some(dir)))
      assert(local === reliable)
      // the reliable run actually wrote checkpoint data
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .count() > 1
      assert(wrote, s"no checkpoint data under $dir")
    }

  private lazy val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (4L, 5L), (2L, 4L),
    (3L, 4L), (5L, 6L), (6L, 7L)).toDF("a", "b")

  test("KCore.peel: localCheckpoint and checkpoint(dir) land the same " +
    "core") {
    assertParity(dir => KCore.peel(edges, "a", "b", k = 3, rounds = 4,
      checkpointDir = dir))
  }

  test("KCore.peel: fused rounds (fuse=2) equal unfused (fuse=1) — " +
    "lazily chained peel steps are the same peel") {
    val unfused = sortedRows(
      KCore.peel(edges, "a", "b", k = 2, rounds = 5, fuse = 1))
    val fused = sortedRows(
      KCore.peel(edges, "a", "b", k = 2, rounds = 5, fuse = 2))
    val fused3 = sortedRows(
      KCore.peel(edges, "a", "b", k = 2, rounds = 5, fuse = 3))
    assert(fused === unfused)
    assert(fused3 === unfused)
  }

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps", "en"),
    (2L, "the quick brown dog sits", "en"),
    (3L, "a very different sentence here", "en"),
    (4L, "palabras en otro idioma aqui", "es"),
    (5L, "mas palabras del mismo idioma", "es"),
    (6L, "texto breve", "es")).toDF("doc_id", "text", "lang")

  test("PerplexityBuckets.summary: parity across the pin dual") {
    assertParity(dir =>
      PerplexityBuckets.summary(docs, "doc_id", "text", "lang", dir))
  }

  test("PerplexityBuckets.streamingSummary: parity across the pin dual") {
    assertParity(dir =>
      PerplexityBuckets.streamingSummary(docs, "doc_id", "text", "lang",
        dir))
  }

  private lazy val ratings = Seq(
    ("i1", "r1", "cat"), ("i1", "r2", "cat"), ("i1", "r3", "dog"),
    ("i2", "r1", "dog"), ("i2", "r2", "dog"),
    ("i3", "r2", "cat"), ("i3", "r3", "cat"),
    ("i4", "r1", "bird")).toDF("item", "rater", "label")

  test("Labeling.raterAccuracy / weightedConsensus / krippendorffAlpha: " +
    "parity across the pin dual") {
    assertParity(dir => Labeling.raterAccuracy(ratings, col("item"),
      col("rater"), col("label"), dir))
    assertParity(dir => Labeling.weightedConsensus(ratings, col("item"),
      col("rater"), col("label"), dir))
    assertParity(dir => Labeling.krippendorffAlpha(ratings, col("item"),
      col("label"), dir))
  }

  test("Checkpoints.pin never clobbers a session-configured checkpoint " +
    "dir: the pre-set dir wins and survives the call") {
    withTmpDir { preset =>
      withTmpDir { requested =>
        spark.sparkContext.setCheckpointDir(preset)
        val pre = spark.sparkContext.getCheckpointDir.get
        val pinned = Checkpoints.pin(Seq(1, 2, 3).toDF("x"),
          Some(requested))
        assert(pinned.collect().map(_.getInt(0)).sorted === Array(1, 2, 3))
        assert(spark.sparkContext.getCheckpointDir.get === pre,
          "session checkpoint dir was clobbered")
        // and nothing landed under the REQUESTED dir — the data went to
        // the session's pre-configured one
        val underRequested = java.nio.file.Files
          .walk(java.nio.file.Paths.get(requested)).count()
        assert(underRequested === 1L, "requested dir should stay empty")
      }
    }
  }

  test("Curriculum.interleave with a checkpointDir leaves a " +
    "pre-configured session dir untouched") {
    withTmpDir { preset =>
      withTmpDir { requested =>
        spark.sparkContext.setCheckpointDir(preset)
        val pre = spark.sparkContext.getCheckpointDir.get
        val df = spark.range(100).select(col("id"),
          (col("id") % 7).cast("double").as("difficulty"))
        Curriculum.interleave(df, "difficulty", nBands = 4,
          checkpointDir = Some(requested)).collect()
        assert(spark.sparkContext.getCheckpointDir.get === pre)
      }
    }
  }
}
