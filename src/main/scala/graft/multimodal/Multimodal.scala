package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media payload: opaque bytes + typed metadata, the storage shape for
  * image/audio/video columns at scale (binary column + partition-friendly
  * metadata; the bytes stay opaque to the planner). */
case class MediaRecord(id: Long, kind: String, content: Array[Byte])

/** Decoded/per-item features produced by the (stubbed) decoder. */
case class MediaFeatures(id: Long, kind: String, byte_len: Long,
                         header_byte: Int, byte_sum: Long,
                         width: Int, height: Int)

/** Multimodal column plumbing. The Spark-side shape is real and tested:
  * binary payload column, typed feature schema, partition-parallel batch
  * decode via `mapPartitions` (the Scala analogue of arrow-batched
  * `mapInPandas`). The codec itself is a STUB — this container ships no
  * image/audio libraries — producing deterministic fake dimensions.
  */
object Multimodal {

  /** Wrap any string payload column as a binary media column. */
  def blobify(df: DataFrame, idCol: String, payloadCol: String,
              kind: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), lit(kind).as("kind"),
      encode(col(payloadCol), "UTF-8").as("content"))

  /** STUB DECODER — stands in for a real image/audio codec (not available
    * offline). Deterministic fake: "dimensions" derived from the first and
    * last payload bytes. A real deployment replaces ONLY this function;
    * the distributed plumbing around it is unchanged.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int) =
    if (bytes == null || bytes.isEmpty) (0, 0)
    else ((bytes.head & 0x7f) + 1, (bytes.last & 0x7f) + 1)

  /** Partition-parallel feature extraction: one decoder instance per
    * partition, streaming through records — the batch shape a GPU/native
    * codec needs. No shuffle; output is a typed Dataset.
    */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder setup would go here (codec handles, GPU ctx)
      it.map { r =>
        val (w, h) = decodeStub(r.content)
        MediaFeatures(
          id = r.id,
          kind = r.kind,
          byte_len = if (r.content == null) 0L else r.content.length.toLong,
          header_byte = if (r.content == null || r.content.isEmpty) -1
            else r.content.head & 0xff,
          byte_sum = if (r.content == null) 0L
            else r.content.foldLeft(0L)((a, b) => a + (b & 0xff)),
          width = w, height = h)
      }
    }
  }

  /** STUB RESIZE — a real image library maps (bytes, w, h) -> bytes; the
    * deterministic fake truncates/tiles the payload to w*h bytes so the
    * distributed contract (pure function, size-bounded output) is testable.
    */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val n = math.max(0, w * h)
    if (bytes == null || bytes.isEmpty) new Array[Byte](n)
    else Array.tabulate(n)(i => bytes(i % bytes.length))
  }

  /** STUB FRAME SAMPLER — a real video codec yields frame byte buffers;
    * the fake slices the payload into `frameSize` chunks and keeps every
    * `stride`-th chunk. The plumbing (one row in, N typed rows out via
    * flatMap-style explode) is the real shape for frame extraction.
    */
  def sampleFramesStub(bytes: Array[Byte], frameSize: Int,
                       stride: Int): Seq[Array[Byte]] = {
    require(frameSize > 0 && stride > 0)
    if (bytes == null || bytes.isEmpty) Nil
    else bytes.grouped(frameSize).zipWithIndex
      .collect { case (chunk, i) if i % stride == 0 => chunk }
      .toSeq
  }

  /** Per-media sampled frames as typed rows (media id, frame index,
    * frame bytes) — partition-parallel, no shuffle. */
  def explodeFrames(ds: Dataset[MediaRecord], frameSize: Int,
                    stride: Int): Dataset[(Long, Int, Array[Byte])] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      sampleFramesStub(r.content, frameSize, stride).zipWithIndex
        .map { case (f, i) => (r.id, i, f) }
    }
  }

  /** End-to-end: documents text -> binary media column -> decoded features. */
  def documentFeatures(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    extractFeatures(blobify(docs, "doc_id", "text", "text").as[MediaRecord])
  }
}
