package graft

import org.apache.spark.sql.functions._
import graft.operators.MixPlan
import graft.sinks.XlsWriter

/** Property pins for the round-16 interop/guard batch: the CFB
  * directory's declared stream size, sheet-name collision rejection,
  * and mixture-plan duplicate-source rejection. */
class Round16Spec extends SparkTestBase {
  import spark.implicits._

  /** Size field (offset 120) of the `Workbook` directory entry — the
    * entry is located by its UTF-16LE name at a 128-byte boundary, the
    * way a strict CFB reader walks the directory. */
  private def declaredWorkbookSize(bytes: Array[Byte]): Int = {
    val name = "Workbook".flatMap(c => Seq(c.toByte, 0.toByte)).toArray
    val base = Iterator.from(512, 128)
      .takeWhile(_ + 128 <= bytes.length)
      .find(off => name.indices.forall(i => bytes(off + i) == name(i)))
      .getOrElse(fail("no Workbook directory entry"))
    java.nio.ByteBuffer.wrap(bytes, base + 120, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
  }

  test("CFB declares the TRUE stream length for regular-layout streams " +
    "over the cutoff (strict readers must not see padding as content)") {
    val big = XlsWriter.workbookStreamBytes(Seq("B" ->
      (1 to 2000).map(i => (i.toLong, s"fila_$i")).toDF("k", "s")))
    assert(big.length >= 4096 && big.length % 512 != 0,
      "fixture must need padding for the claim to bite")
    assert(declaredWorkbookSize(XlsWriter.cfb(big)) === big.length)
    // under the cutoff the regular layout must declare the 4096 floor —
    // a smaller declared size sends compliant readers to the mini-stream
    val small = XlsWriter.workbookStreamBytes(Seq("S" ->
      Seq((1L, "uno")).toDF("k", "s")))
    assert(small.length < 4096)
    assert(declaredWorkbookSize(XlsWriter.cfb(small)) === 4096)
    // and the mini layout declares exactly the true length
    assert(declaredWorkbookSize(XlsWriter.cfb(small, mini = true)) ===
      small.length)
  }

  test("xls writer rejects sheet names that collide AFTER sanitization") {
    val df = Seq((1L, "a")).toDF("k", "s")
    val e = intercept[IllegalArgumentException] {
      XlsWriter.workbookStreamBytes(Seq("Plan:1" -> df, "Plan*1" -> df))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("mix plan rejects duplicate sources in the weight spec (they " +
    "would duplicate join rows and skew the normalization)") {
    val df = Seq(("en", "one two"), ("fr", "trois")).toDF("src", "text")
    intercept[IllegalArgumentException] {
      MixPlan.plan(df, col("src"), col("text"),
        Seq("en" -> 0.4, "en" -> 0.2), 100L)
    }
    // (the TVF parser's own duplicate guard is pinned in
    // ExtensionsRegistrationSpec, where the extension session exists)
  }
}
