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

/** Real-decode output row: actual decoded dimensions + a
  * position-weighted checksum of the resampled raster. */
case class AudioDecoded(doc_id: Long, sample_rate: Int, n_samples: Int,
                        duration_ms: Long, peak: Long, checksum: Long)

case class ImageDecoded(doc_id: Long, width: Int, height: Int,
                        checksum: Long)

/** Multimodal column plumbing. The Spark-side shape is real and tested:
  * binary payload column, typed feature schema, partition-parallel batch
  * decode via `mapPartitions` (the Scala analogue of arrow-batched
  * `mapInPandas`).
  *
  * The IMAGE kernel is real: [[decodeGray]] parses actual image
  * containers through the JVM's built-in `javax.imageio` registry
  * (PNG/BMP/GIF/JPEG — no external libraries), and [[resizeNearest]] /
  * [[resizePng]] resample decoded rasters with exact integer math, so
  * the whole decode→resize→checksum path is replayable cross-engine.
  * The AUDIO kernel is real too: [[decodeWavPcm16]] parses RIFF/WAVE
  * PCM through the JVM's built-in `javax.sound.sampled` codec (format
  * chunk, endianness, frame boundaries — nothing hand-rolled on the
  * read side). Only video and compressed-audio kinds (where no
  * JVM-built-in codec exists) keep the byte-derived convention of
  * [[decodeStub]] / [[sampleFramesStub]].
  */
object Multimodal {

  /** Wrap any string payload column as a binary media column. */
  def blobify(df: DataFrame, idCol: String, payloadCol: String,
              kind: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), lit(kind).as("kind"),
      encode(col(payloadCol), "UTF-8").as("content"))

  /** Byte-convention "dimensions" for payloads with no JVM-built-in
    * codec (video, compressed audio): derived from the first and last
    * payload bytes. Images use the REAL [[decodeGray]] path and WAV
    * audio the REAL [[decodeWavPcm16]] path instead. A deployment with
    * further native codecs replaces ONLY this function; the
    * distributed plumbing around it is unchanged. */
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

  // ---- real image kernel (javax.imageio — JVM built-in, offline) ----

  /** Deterministic grayscale fixture pixel — the SINGLE formula the
    * fixture generator, the specs, and the DuckDB oracle all derive
    * from, so a decoder that got row order, channel order, or bit depth
    * wrong shifts every downstream checksum. */
  def testPixel(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x.toLong * 7 + y.toLong * 13) % 256).toInt

  /** Fixture dimensions vary per id so resampling ratios differ row to
    * row (exercises the integer NN index math at many (w,h)). */
  def testDims(id: Long): (Int, Int) =
    ((16 + id % 9).toInt, (12 + id % 7).toInt)

  /** Encode a grayscale raster as a real PNG via `javax.imageio`.
    * PNG is lossless: decode returns the exact samples written. */
  def encodeGrayPng(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixel(x, y) & 0xff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL DECODE: parse an image container (any format the JVM ImageIO
    * registry handles: PNG/BMP/GIF/JPEG) into (width, height, row-major
    * gray samples). Single-band rasters are read sample-direct — NOT via
    * `getRGB`, whose sRGB color management gamma-shifts gray samples —
    * multi-band images fold to integer-luma (299r+587g+114b)/1000. */
  def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Int](w * h)
    if (img.getRaster.getNumBands == 1) {
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
    } else {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          out(y * w + x) = (r * 299 + g * 587 + b * 114 + 500) / 1000
          x += 1
        }
        y += 1
      }
    }
    (w, h, out)
  }

  /** Nearest-neighbor resample — exact integer index math
    * (`sy = y2*h/h2`, `sx = x2*w/w2`), so the resampled raster is
    * bit-replayable by any engine from the source pixels. */
  def resizeNearest(pix: Array[Int], w: Int, h: Int,
                    w2: Int, h2: Int): Array[Int] = {
    require(w > 0 && h > 0 && w2 > 0 && h2 > 0 && pix.length == w * h,
      s"bad raster: ${pix.length} for ${w}x$h -> ${w2}x$h2")
    val out = new Array[Int](w2 * h2)
    var y2 = 0
    while (y2 < h2) {
      val sy = y2 * h / h2
      var x2 = 0
      while (x2 < w2) { out(y2 * w2 + x2) = pix(sy * w + x2 * w / w2); x2 += 1 }
      y2 += 1
    }
    out
  }

  /** REAL RESIZE (bytes -> bytes, the shape a media pipeline maps over a
    * binary column): ImageIO decode, nearest-neighbor resample, PNG
    * re-encode. Pure and deterministic end to end. */
  def resizePng(bytes: Array[Byte], w2: Int, h2: Int): Array[Byte] = {
    val (w, h, pix) = decodeGray(bytes)
    val rs = resizeNearest(pix, w, h, w2, h2)
    encodeGrayPng(w2, h2, (x, y) => rs(y * w2 + x))
  }

  /** One decoded+resized image per id: synthesize the PNG fixture from
    * [[testPixel]]/[[testDims]], REAL-decode it back, resample to
    * (tw, th), and emit decoded dims plus an order-weighted checksum
    * `sum(pixel_i * (i+1))` — position-sensitive, so row/column swaps
    * don't cancel. Partition-parallel, no shuffle; the oracle replays
    * the same integers straight from the formula. */
  def imageRoundTrip(docs: DataFrame, idCol: String,
                     tw: Int, th: Int): Dataset[ImageDecoded] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val (w0, h0) = testDims(id)
        val png = encodeGrayPng(w0, h0, (x, y) => testPixel(id, x, y))
        val (w, h, pix) = decodeGray(png)
        val rs = resizeNearest(pix, w, h, tw, th)
        var cs = 0L
        var i = 0
        while (i < rs.length) { cs += rs(i).toLong * (i + 1); i += 1 }
        ImageDecoded(id, w, h, cs)
      }
    }
  }

  // ---- real audio kernel (RIFF/WAVE PCM16 via javax.sound.sampled,
  //      JVM built-in, offline) ----

  /** Deterministic PCM16 fixture sample — pure integer math (no trig),
    * the SINGLE formula the fixture writer, the decoder specs, and the
    * DuckDB oracle all derive from. Values span the full signed-16
    * range, so an endianness or sign mistake in the decoder shifts the
    * checksum immediately. */
  def testSample(id: Long, i: Int): Short =
    (((id * 131 + i.toLong * i * 7 + i.toLong * 31) % 65536) - 32768).toShort

  /** Fixture sample count and rate vary per id (exercises duration math
    * at many (n, rate) pairs; rates are the real telephony/speech
    * ladder 8/12/16 kHz). */
  def testAudioLen(id: Long): Int = (64 + id % 33).toInt
  def testAudioRate(id: Long): Int = 8000 + (id % 3).toInt * 4000

  /** Encode mono PCM16 as a REAL RIFF/WAVE file through the JDK's own
    * writer (`AudioSystem.write`) — container header, chunk layout and
    * little-endian sample packing are the JVM codec's, not ours. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL DECODE: parse a WAV container via `AudioSystem` (format chunk
    * -> rate/channels/endianness, data chunk -> frames) and return
    * (sampleRate, channels, interleaved PCM16 samples). WAV PCM is
    * lossless: decode returns the exact samples written. */
  def decodeWavPcm16(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getEncoding ==
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      s"unsupported audio format: $fmt")
    val raw = ais.readAllBytes()
    val be = fmt.isBigEndian
    val out = new Array[Short](raw.length / 2)
    var i = 0
    while (i < out.length) {
      val lo = raw(2 * i) & 0xff
      val hi = raw(2 * i + 1) & 0xff
      out(i) = (if (be) (lo << 8) | hi else (hi << 8) | lo).toShort
      i += 1
    }
    (fmt.getSampleRate.toInt, fmt.getChannels, out)
  }

  /** One decoded audio row per id: synthesize the WAV fixture from
    * [[testSample]]/[[testAudioLen]]/[[testAudioRate]], REAL-decode it
    * back through the JVM codec, and emit rate, length, integral-ms
    * duration, peak |amplitude|, and the order-weighted checksum
    * `sum(s_i * (i+1))`. Partition-parallel, no shuffle; the oracle
    * replays the same integers straight from the formula. */
  def audioRoundTrip(docs: DataFrame,
                     idCol: String): Dataset[AudioDecoded] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = testAudioLen(id)
        val rate = testAudioRate(id)
        val wav = encodeWavPcm16(rate,
          Array.tabulate(n)(i => testSample(id, i)))
        val (r2, ch, dec) = decodeWavPcm16(wav)
        require(ch == 1, s"mono fixture decoded as $ch channels")
        var cs = 0L
        var pk = 0L
        var i = 0
        while (i < dec.length) {
          cs += dec(i).toLong * (i + 1)
          val a = math.abs(dec(i).toLong)
          if (a > pk) pk = a
          i += 1
        }
        AudioDecoded(id, r2, dec.length,
          dec.length.toLong * 1000L / r2, pk, cs)
      }
    }
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
