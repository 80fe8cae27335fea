package graft

import org.apache.spark.sql.functions._
import graft.ingest.XlsSheetReader
import graft.operators.{Labeling, MixPlan}
import graft.sinks.XlsWriter

/** Property pins for the round-15d batch: CFB mini-stream layout,
  * weighted consensus semantics, mixture-plan arithmetic. */
class Round15dSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("r15d").resolve(name).toString

  test("mini-CFB layout round-trips cell-exactly and really is the " +
    "mini-stream shape (sub-4096 stream, mini-FAT chained)") {
    val df = Seq((1L, "uno", 2.5), (2L, "dos", 7.25))
      .toDF("k", "s", "v").orderBy("k")
    val stream = XlsWriter.workbookStreamBytes(Seq("M" -> df))
    assert(stream.length < 4096, "fixture must sit under the cutoff")
    val bytes = XlsWriter.cfb(stream, mini = true)
    // header: first mini-FAT sector id is set (not END_OF_CHAIN)
    val miniFatFirst = java.nio.ByteBuffer.wrap(bytes, 60, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(miniFatFirst != 0xFFFFFFFE, "mini-FAT must be present")
    val path = tmp("mini.xls")
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
    val g = XlsSheetReader.readGrid(path).map(_.toSeq)
    assert(g === Seq(Seq("k", "s", "v"), Seq("1", "uno", "2.5"),
      Seq("2", "dos", "7.25")))
    // and the regular layout of the same stream has NO mini-FAT
    val reg = XlsWriter.cfb(stream)
    val regFirst = java.nio.ByteBuffer.wrap(reg, 60, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(regFirst == 0xFFFFFFFE, "regular layout must skip the mini-FAT")
    // a stream over the cutoff must refuse the mini ask, not mangle it
    val big = XlsWriter.workbookStreamBytes(Seq("B" ->
      (1 to 2000).map(i => (i.toLong, s"fila_$i")).toDF("k", "s")))
    assert(big.length >= 4096)
    intercept[IllegalArgumentException] { XlsWriter.cfb(big, mini = true) }
  }

  test("weighted consensus: a trusted rater outvotes two noisy ones " +
    "exactly where the raw majority disagrees") {
    // anchor items: two honest raters fix the consensus while N1/N2
    // accumulate misses (round-1 accuracy 1/3 each); T's track record
    // is three solo items (trivially matched) plus the contested one,
    // so T weighs 0.75 against the noisy pair's 0.333+0.333 — on i4
    // the raw majority picks the pair's 'y', the weighted vote flips
    // to T's 'x'
    val df = Seq(
      ("i1", "H1", "a"), ("i1", "H2", "a"), ("i1", "N1", "b"),
      ("i1b", "H1", "a"), ("i1b", "H2", "a"), ("i1b", "N2", "b"),
      ("i2", "H1", "c"), ("i2", "H2", "c"), ("i2", "N1", "d"),
      ("i2b", "H1", "c"), ("i2b", "H2", "c"), ("i2b", "N2", "d"),
      ("i5", "T", "k"), ("i6", "T", "k"), ("i7", "T", "k"),
      ("i4", "T", "x"), ("i4", "N1", "y"), ("i4", "N2", "y"))
      .toDF("item", "rater", "label")
    val raw = Labeling.consensus(df, col("item"), col("label"))
      .where(col("item") === "i4").head().getString(1)
    assert(raw === "y", "raw majority on i4 is the noisy pair")
    val acc = Labeling.raterAccuracy(df, col("item"), col("rater"),
        col("label")).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(acc("T") === 0.75 && acc("N1") === 0.333333 &&
      acc("N2") === 0.333333 && acc("H1") === 1.0)
    val weighted = Labeling.weightedConsensus(df, col("item"),
        col("rater"), col("label"))
      .where(col("item") === "i4").head()
    assert(weighted.getString(1) === "x",
      s"750000 beats 333333+333333 on the (w DESC, label ASC) rule: $weighted")
    assert(weighted.getAs[Long]("w_votes") === 750000L)
  }

  test("mix plan: targets share the budget by normalized weight, " +
    "epochs = target/available, absent and unweighted sources surface") {
    val df = Seq(
      ("web", "a b c d"), ("web", "e f"), // 6 tokens
      ("books", "g h i"), // 3 tokens
      ("junk", "x")) // present but unweighted
      .toDF("src", "text")
    val got = MixPlan.plan(df, col("src"), col("text"),
        Seq("web" -> 3.0, "books" -> 1.0, "wiki" -> 1.0), 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), Option(r.get(5))))
    assert(got.toSeq === Seq(
      ("books", 1L, 3L, 0.2, 200L, Some(66.666667)),
      ("junk", 1L, 1L, 0.0, 0L, Some(0.0)),
      ("web", 2L, 6L, 0.6, 600L, Some(100.0)),
      ("wiki", 0L, 0L, 0.2, 200L, None)))
  }
}
