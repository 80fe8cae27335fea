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

/** One REAL-decoded, stride-sampled, resampled video frame. */
case class FrameDecoded(doc_id: Long, frame_idx: Int, n_frames: Int,
                        width: Int, height: Int, checksum: Long)

/** Per-image 64-bit difference hash over the decoded gray raster. */
case class ImageHash(doc_id: Long, dhash: Long)

/** dHash of a REAL JPEG encode→decode round trip plus decoded dims. */
case class JpegImageHash(doc_id: Long, width: Int, height: Int,
                         dhash: Long)

/** Tolerant JPEG decode result: `ok = false` rows carry null features
  * (the payload was corrupt), never a thrown task. */
case class JpegTolerantHash(doc_id: Long, ok: Boolean,
                            width: Option[Int], height: Option[Int],
                            dhash: Option[Long])

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
  * read side). The VIDEO kernel walks a real multi-frame container:
  * [[encodeGrayGif]] / [[decodeFrames]] round-trip animated GIF through
  * the JDK's own sequence codec (lossless for 8-bit gray via the
  * identity palette), so frame counting, stride sampling and per-frame
  * resampling run against actually-decoded rasters. Only compressed
  * audio/video codecs the JVM does not ship (MP3/H.264/…) keep the
  * byte-derived convention of [[decodeStub]] / [[sampleFramesStub]].
  */
object Multimodal {

  /** Id column of a decode stage, SPREAD before the per-row codec work:
    * a compact parquet scan of the id column arrives in one or two
    * splits, which would run a CPU-bound decode stage serially on a
    * 32-core executor (and on ONE executor of a 1000-node cluster).
    * The shuffle moves only 8-byte ids — orders of magnitude cheaper
    * than the codec work it parallelizes. ADAPTIVE (round 18, same as
    * the exact-substr corpus spread): skipped when the scan already
    * arrives at cluster width, so a 100 TB media scan pays no
    * spread shuffle at all. */
  private def spreadIds(docs: DataFrame, idCol: String): Dataset[Long] = {
    import docs.sparkSession.implicits._
    val slim = docs.select(col(idCol).cast("long"))
    (if (graft.operators.ScanWidth.arrivesWide(slim)) slim
     else slim.repartition(
       docs.sparkSession.sparkContext.defaultParallelism,
       col(idCol))).as[Long]
  }

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
    * don't cancel. Partition-parallel after the [[spreadIds]] id
    * shuffle; the oracle replays the same integers from the formula. */
  def imageRoundTrip(docs: DataFrame, idCol: String,
                     tw: Int, th: Int): Dataset[ImageDecoded] = {
    import docs.sparkSession.implicits._
    spreadIds(docs, idCol).mapPartitions { it =>
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
    * `sum(s_i * (i+1))`. Partition-parallel after the [[spreadIds]] id
    * shuffle; the oracle replays the same integers from the formula. */
  def audioRoundTrip(docs: DataFrame,
                     idCol: String): Dataset[AudioDecoded] = {
    import docs.sparkSession.implicits._
    spreadIds(docs, idCol).mapPartitions { it =>
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

  // ---- perceptual image near-dup (dHash over the REAL-decoded tier —
  //      the image sibling of the SimHash text family) ----

  /** 64-bit difference hash of a decoded raster: NN-resample to 9×8,
    * then bit i = y·8+x is set iff pixel(x,y) > pixel(x+1,y). Gradient
    * SIGNS survive brightness/contrast shifts and resampling noise, so
    * perceptually-identical images land within a few Hamming bits —
    * the standard dHash construction, exact-integer end to end (NN
    * index math + a comparison), hence SQL-replayable. */
  def dHash64(pix: Array[Int], w: Int, h: Int): Long = {
    val g = resizeNearest(pix, w, h, 9, 8)
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x) > g(y * 9 + x + 1)) hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Near-dup image fixture: docs sharing `id / clusterSize` render the
    * SAME base pattern (cluster-keyed [[testPixel]]/[[testDims]]) with
    * ONE doc-specific pixel brightened by 128 — a perceptual near-dup
    * family (same image, one-pixel retouch) whose dHashes differ by
    * 0–4 bits within a cluster and ~half the bits across clusters.
    * Constant FAMILY size, so the pair count scales linearly with the
    * corpus instead of quadratically. */
  def testClusterPixel(id: Long, clusterSize: Int, x: Int, y: Int): Int = {
    val cl = id / clusterSize
    val (w0, h0) = testDims(cl)
    // the NONLINEAR mix is load-bearing, and it must be nonlinear in a
    // strong sense: dHash is brightness-shift-invariant BY DESIGN, so
    // any per-cluster map that is ~linear in the cluster id (including
    // a Knuth multiply-shift) renders distinct clusters as the same
    // pattern plus a constant offset — identical gradient signs, and
    // the pair set goes quadratic. Squaring mod 1e9+7 makes the
    // cluster difference depend on the pixel term (2tδ+δ²), so
    // cross-cluster hashes decorrelate to ~32 Hamming bits. Both
    // products stay under 2^63, so DuckDB replays it without tripping
    // its checked arithmetic.
    val t = (cl * 1000003L + x.toLong * 31 + y.toLong) % 1000000007L
    val base = ((t * t % 1000000007L) % 256).toInt
    if (x == (id % w0).toInt && y == (id * 7 % h0).toInt) (base + 128) % 256
    else base
  }

  /** One REAL-decoded dHash per id: synthesize the cluster-fixture PNG,
    * decode it back through ImageIO, and hash the actual raster.
    * Partition-parallel after the [[spreadIds]] id shuffle. */
  def imageDHashes(docs: DataFrame, idCol: String,
                   clusterSize: Int): Dataset[ImageHash] = {
    import docs.sparkSession.implicits._
    spreadIds(docs, idCol).mapPartitions { it =>
      it.map { id =>
        val (w0, h0) = testDims(id / clusterSize)
        val png = encodeGrayPng(w0, h0,
          (x, y) => testClusterPixel(id, clusterSize, x, y))
        val (w, h, pix) = decodeGray(png)
        ImageHash(id, dHash64(pix, w, h))
      }
    }
  }

  /** Hamming-banded near-dup pairs over a (doc_id, dhash) frame — the
    * image sibling of `Dedup.simhashNearDupsMd5`: the 64-bit hash
    * splits into four 16-bit bands; a pair is a CANDIDATE iff some band
    * matches exactly (one pigeonhole band survives ≤3-bit spread per
    * band — never an all-pairs product), then the exact Hamming
    * distance filters candidates to `maxHamming`. Shuffles on the
    * (band, value) bucket key; output (doc_id_a < doc_id_b, hamming).
    * At 10⁹ images the bucket join's skew ceiling is the largest
    * near-dup family, the same bound as the text families. */
  def imageNearDupPairs(hashes: DataFrame,
                        maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64, s"bad bound $maxHamming")
    val banded = hashes.select(col("doc_id"), col("dhash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("dhash"), b * 16).bitwiseAND(lit(65535L))
              .as("bval"))): _*)).as("bb"))
      .select(col("doc_id"), col("dhash"),
        col("bb.band").as("band"), col("bb.bval").as("bval"))
    val a = banded.select(col("band"), col("bval"),
      col("doc_id").as("doc_id_a"), col("dhash").as("__ha"))
    val b = banded.select(col("band").as("__band_b"),
      col("bval").as("__bval_b"),
      col("doc_id").as("doc_id_b"), col("dhash").as("__hb"))
    a.join(b, col("band") === col("__band_b") &&
        col("bval") === col("__bval_b") &&
        col("doc_id_a") < col("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"),
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("int")
          .as("hamming"))
      .where(col("hamming") <= maxHamming)
      .dropDuplicates("doc_id_a", "doc_id_b")
  }

  // ---- video near-dup: per-frame dHash fingerprints over the REAL
  //      sequence-decode tier (the video sibling of the image family) --

  /** Near-dup video fixture: videos sharing `id / clusterSize` render
    * the SAME cluster-keyed frame stack (frame count, dims and the
    * squared-hash pixel base all keyed on the cluster — see
    * [[testClusterPixel]] for why the nonlinearity is load-bearing),
    * with ONE doc-specific pixel brightened by 128 in ONE doc-specific
    * frame — a re-encode-with-one-frame-retouched family. */
  def testVideoPixel(id: Long, clusterSize: Int, f: Int, x: Int,
                     y: Int): Int = {
    val cl = id / clusterSize
    val (w0, h0) = testDims(cl)
    val n = testFrameCount(cl)
    val t = (cl * 1000003L + f.toLong * 8009 + x.toLong * 31 + y.toLong) %
      1000000007L
    val base = ((t * t % 1000000007L) % 256).toInt
    if (f == (id * 3 % n).toInt && x == (id % w0).toInt &&
      y == (id * 7 % h0).toInt) (base + 128) % 256
    else base
  }

  /** Per-(video, frame) dHash rows from the REAL sequence walk:
    * synthesize the family GIF, decode every frame back through the
    * JDK codec, dHash each decoded raster. Partition-parallel flatMap
    * after the [[spreadIds]] id shuffle.
    * Output (doc_id, frame_idx, n_frames, dhash). */
  def videoFrameHashes(docs: DataFrame, idCol: String,
                       clusterSize: Int): DataFrame = {
    import docs.sparkSession.implicits._
    spreadIds(docs, idCol).flatMap { id =>
      val cl = id / clusterSize
      val (w0, h0) = testDims(cl)
      val n = testFrameCount(cl)
      val gif = encodeGrayGif(w0, h0, n,
        (f, x, y) => testVideoPixel(id, clusterSize, f, x, y))
      decodeFrames(gif).zipWithIndex.map { case ((w, h, pix), f) =>
        (id, f, n, dHash64(pix, w, h))
      }
    }.toDF("doc_id", "frame_idx", "n_frames", "dhash")
  }

  /** Video near-dup pairs from per-frame fingerprints: two videos are
    * near-dups when at least `minMatchFrames` of their frames agree at
    * the SAME frame index within `maxHamming` dHash bits. Candidates
    * come from a (frame_idx, band, value) bucket join — a video-length
    * stack of [[imageNearDupPairs]]-shaped joins, never all-pairs —
    * then per-frame Hamming filters and one grouped count per pair.
    * At 10⁹ videos the shuffle is bounded by per-bucket occupancy,
    * exactly like the text/image band families; frame stacks are
    * bounded (≤ a few hundred frames), so the explode is a constant
    * fan-out, not a data-sized blowup.
    * Output (doc_id_a < doc_id_b, n_frames, n_match). */
  def videoNearDupPairs(frameHashes: DataFrame, maxHamming: Int,
                        minMatchFrames: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64 && minMatchFrames >= 1)
    val banded = frameHashes.select(col("doc_id"), col("frame_idx"),
        col("n_frames"), col("dhash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("dhash"), b * 16).bitwiseAND(lit(65535L))
              .as("bval"))): _*)).as("bb"))
      .select(col("doc_id"), col("frame_idx"), col("n_frames"),
        col("dhash"), col("bb.band").as("band"), col("bb.bval").as("bval"))
    val a = banded.select(col("frame_idx"), col("band"), col("bval"),
      col("doc_id").as("doc_id_a"), col("n_frames").as("n_frames_a"),
      col("dhash").as("__ha"))
    val b = banded.select(col("frame_idx").as("__f_b"),
      col("band").as("__band_b"), col("bval").as("__bval_b"),
      col("doc_id").as("doc_id_b"), col("dhash").as("__hb"))
    a.join(b, col("frame_idx") === col("__f_b") &&
        col("band") === col("__band_b") &&
        col("bval") === col("__bval_b") &&
        col("doc_id_a") < col("doc_id_b"))
      .where(bit_count(col("__ha").bitwiseXOR(col("__hb")))
        <= maxHamming)
      // a frame can band-match in up to 4 bands: count DISTINCT frames
      .groupBy("doc_id_a", "doc_id_b")
      .agg(max(col("n_frames_a")).as("n_frames"),
        countDistinct(col("frame_idx")).cast("long").as("n_match"))
      .where(col("n_match") >= minMatchFrames)
  }

  // ---- audio near-dup: energy-sign fingerprint over the REAL
  //      RIFF/WAVE decode tier (the audio sibling of dHash) ----

  /** Near-dup audio fixture: docs sharing `id / clusterSize` carry the
    * SAME cluster-keyed PCM16 track, with ONE doc-specific sample
    * replaced by the same position of a different track — a one-sample
    * dropout/click family. The track is the SQUARED-hash mix (same
    * rationale as [[testClusterPixel]]): [[testSample]]'s linear
    * `cl·131` term wraps mod 65536 with period ~500 in the cluster id,
    * so distant clusters carried near-identical energy envelopes and
    * the pair set went quadratic; squaring mod 1e9+7 decorrelates the
    * envelopes (measured: cross-family candidate rate drops ~50×). */
  def testClusterSample(id: Long, clusterSize: Int, i: Int): Short = {
    val cl = id / clusterSize
    def h(c: Long): Short = {
      val t = (c * 1000003L + i.toLong * 31 + 7) % 1000000007L
      ((t * t % 1000000007L) % 65536L - 32768L).toShort
    }
    if (i == (id % testAudioLen(cl)).toInt) h(cl + 7919L) else h(cl)
  }

  /** 31-bit energy-sign fingerprint of a PCM track: split the samples
    * into 32 contiguous windows (window w covers samples
    * [w·n/32, (w+1)·n/32)), energy = Σ s² per window as an EXACT Long,
    * bit w−1 set iff energy(w) > energy(w−1). Gradient signs of the
    * energy envelope survive level changes (volume is a positive
    * scale: s² scales uniformly) — the standard audio-fingerprint
    * construction collapsed to one band, exact-integer end to end. */
  def audioFingerprint(samples: Array[Short]): Long = {
    val n = samples.length
    require(n >= 32, s"fingerprint needs >= 32 samples, got $n")
    val energy = new Array[Long](32)
    var w = 0
    while (w < 32) {
      var i = w * n / 32
      val end = (w + 1) * n / 32
      var e = 0L
      while (i < end) {
        e += samples(i).toLong * samples(i).toLong; i += 1
      }
      energy(w) = e
      w += 1
    }
    var fp = 0L
    w = 1
    while (w < 32) {
      if (energy(w) > energy(w - 1)) fp |= 1L << (w - 1)
      w += 1
    }
    fp
  }

  /** One REAL-decoded fingerprint per id: synthesize the family WAV,
    * decode it back through the JVM codec, fingerprint the actual
    * samples. Partition-parallel after the [[spreadIds]] id shuffle.
    * Output (doc_id, n_samples, fp). */
  def audioFingerprints(docs: DataFrame, idCol: String,
                        clusterSize: Int): DataFrame = {
    import docs.sparkSession.implicits._
    spreadIds(docs, idCol).mapPartitions { it =>
      it.map { id =>
        val cl = id / clusterSize
        val n = testAudioLen(cl)
        val wav = encodeWavPcm16(testAudioRate(cl),
          Array.tabulate(n)(i => testClusterSample(id, clusterSize, i)))
        val (_, ch, dec) = decodeWavPcm16(wav)
        require(ch == 1, s"mono fixture decoded as $ch channels")
        (id, dec.length, audioFingerprint(dec))
      }
    }.toDF("doc_id", "n_samples", "fp")
  }

  /** Hamming-banded audio near-dup pairs over (doc_id, fp) — two
    * 16-bit bands of the 31-bit fingerprint bucket the join (a
    * one-sample retouch moves ≤2 adjacent energy-sign bits, so at
    * least one band always matches), exact `bit_count` filter after.
    * Output (doc_id_a < doc_id_b, hamming). */
  def audioNearDupPairs(fps: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 31, s"bad bound $maxHamming")
    val banded = fps.select(col("doc_id"), col("fp"),
        explode(array((0 until 2).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("fp"), b * 16).bitwiseAND(lit(65535L))
              .as("bval"))): _*)).as("bb"))
      .select(col("doc_id"), col("fp"),
        col("bb.band").as("band"), col("bb.bval").as("bval"))
    val a = banded.select(col("band"), col("bval"),
      col("doc_id").as("doc_id_a"), col("fp").as("__fa"))
    val b = banded.select(col("band").as("__band_b"),
      col("bval").as("__bval_b"),
      col("doc_id").as("doc_id_b"), col("fp").as("__fb"))
    a.join(b, col("band") === col("__band_b") &&
        col("bval") === col("__bval_b") &&
        col("doc_id_a") < col("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"),
        bit_count(col("__fa").bitwiseXOR(col("__fb"))).cast("int")
          .as("hamming"))
      .where(col("hamming") <= maxHamming)
      .dropDuplicates("doc_id_a", "doc_id_b")
  }

  // ---- real JPEG kernel (javax.imageio — the dominant web image
  //      container; LOSSY, so the tier asserts perceptual stability,
  //      not bit round-trip) ----

  /** Fixture cell size (3..5) — dims are 9·cs × 8·cs, so the dHash's
    * 9×8 NN resample samples exactly one pixel per cell. */
  def testJpegCell(id: Long): Int = (3 + id % 3).toInt

  /** Deterministic JPEG fixture pixel: a 9×8 grid of cs×cs cells
    * alternating 48/208 along x, with each ROW's phase taken from one
    * bit of the doc id (`(id >> cellRow) & 1`). The design is what
    * makes a LOSSY container gateable: every horizontal cell pair the
    * dHash compares differs by exactly 160 gray levels, an order of
    * magnitude above JPEG-quality-0.9 reconstruction error, so the
    * decoded gradient SIGNS — hence the whole dHash — replay from this
    * formula even though the decoded pixel VALUES don't. */
  def testJpegPixel(id: Long, x: Int, y: Int, cs: Int): Int = {
    val bit = (((id >> (y / cs)) & 1L) + (x / cs)) % 2L
    (48L + 160L * bit).toInt
  }

  /** The formula-side dHash [[jpegDHashes]] must land after the real
    * encode→decode trip: bit y·8+x set iff the (x,y) cell is the 208
    * lane, i.e. `((id >> y) + x) % 2 == 1`. */
  def testJpegDHash(id: Long): Long = {
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if ((((id >> y) & 1L) + x) % 2L == 1L) hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Encode a grayscale raster as a REAL JPEG via the JDK's own writer
    * at an explicit compression quality — DCT, quantization and
    * entropy coding are the JVM codec's, not ours. */
  def encodeGrayJpeg(w: Int, h: Int, quality: Float,
                     pixel: (Int, Int) => Int): Array[Byte] = {
    require(quality > 0f && quality <= 1f, s"bad quality $quality")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixel(x, y) & 0xff); x += 1 }
      y += 1
    }
    javax.imageio.ImageIO.setUseCache(false)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    try {
      val p = wr.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      wr.setOutput(ios)
      wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { wr.dispose(); ios.close() }
    bos.toByteArray
  }

  /** One REAL lossy round trip per id: synthesize the margin-160
    * fixture, encode through the JDK JPEG writer at `quality`, decode
    * the actual JFIF bytes back through ImageIO, dHash the decoded
    * raster. Partition-parallel after the [[spreadIds]] id shuffle.
    * The decoded dims and the dHash replay from the fixture formula
    * ([[testJpegDHash]]); the pixel values deliberately don't — that
    * lossiness is what the tier exercises. */
  def jpegDHashes(docs: DataFrame, idCol: String,
                  quality: Float): Dataset[JpegImageHash] = {
    import docs.sparkSession.implicits._
    spreadIds(docs, idCol).mapPartitions { it =>
      it.map { id =>
        val cs = testJpegCell(id)
        val (w0, h0) = (9 * cs, 8 * cs)
        val jpg = encodeGrayJpeg(w0, h0, quality,
          (x, y) => testJpegPixel(id, x, y, cs))
        val (w, h, pix) = decodeGray(jpg)
        JpegImageHash(id, w, h, dHash64(pix, w, h))
      }
    }
  }

  /** [[decodeGray]] with the xls-tier tolerance contract
    * (`ingest_xls_tolerance`): a payload the codec rejects — whether by
    * returning null (no recognized container magic) or by THROWING
    * (recognized magic, broken structure: a JFIF header cut before any
    * scan data throws `IIOException`) — yields None, never a thrown
    * task. A payload the codec can PARTIALLY decode (e.g. a JPEG
    * truncated mid-scan: the JDK reader keeps the header dims and
    * fills the missing MCU rows) decodes to Some, deterministically
    * for fixed bytes — tolerance means the pipeline books what the
    * codec salvages and nulls what it can't. */
  def decodeGrayOpt(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      if (bytes == null || bytes.isEmpty) None
      else Some(decodeGray(bytes))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic per-id corruption for the tolerance gate, cycling
    * three guaranteed-to-fail classes (probed against the JDK codec):
    * id%4=0 intact; 1 = first byte dropped (no SOI magic — ImageIO
    * returns null); 2 = 64 bytes of id-derived garbage (null); 3 = cut
    * to the first 4 bytes (SOI+marker — the JPEG reader throws "No
    * image data present"). Mid-stream truncation is deliberately NOT a
    * gate class: the JDK reader partially decodes it (header dims
    * survive, missing rows fill gray), which is deterministic but not
    * formula-replayable — the spec covers that path instead. */
  def corruptJpeg(jpg: Array[Byte], id: Long): Array[Byte] =
    (id % 4) match {
      case 0 => jpg
      case 1 => jpg.drop(1)
      case 2 => Array.tabulate[Byte](64)(i => ((id * 31 + i * 37 + 11) % 256).toByte)
      case _ => jpg.take(4)
    }

  /** The corruption-tolerance sibling of [[jpegDHashes]]: synthesize
    * the same real JPEG bytes, corrupt them per [[corruptJpeg]], and
    * decode through [[decodeGrayOpt]] — corrupt payloads book
    * `ok = false` with null features; no input ever throws a task.
    * Same spreadIds partition-parallel shape. */
  def jpegDHashesTolerant(docs: DataFrame, idCol: String,
                          quality: Float): Dataset[JpegTolerantHash] = {
    import docs.sparkSession.implicits._
    spreadIds(docs, idCol).mapPartitions { it =>
      it.map { id =>
        val cs = testJpegCell(id)
        val (w0, h0) = (9 * cs, 8 * cs)
        val jpg = encodeGrayJpeg(w0, h0, quality,
          (x, y) => testJpegPixel(id, x, y, cs))
        decodeGrayOpt(corruptJpeg(jpg, id)) match {
          case Some((w, h, pix)) =>
            JpegTolerantHash(id, ok = true, Some(w), Some(h),
              Some(dHash64(pix, w, h)))
          case None => JpegTolerantHash(id, ok = false, None, None, None)
        }
      }
    }
  }

  // ---- real video kernel (animated GIF via javax.imageio — the one
  //      multi-frame container the JVM ships a codec for, offline) ----

  /** Fixture frame count varies per id (2..6) so stride sampling keeps
    * a different number of frames row to row. */
  def testFrameCount(id: Long): Int = (2 + id % 5).toInt

  /** Deterministic fixture pixel for frame `f` of video `id` — the
    * SINGLE formula the fixture encoder, the specs, and the DuckDB
    * oracle all derive from (the frame term means a codec that drops,
    * reorders, or composites frames shifts every checksum). */
  def testFramePixel(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 31 + f.toLong * 41 + x.toLong * 7 + y.toLong * 13) % 256).toInt

  /** Encode grayscale rasters as a REAL animated GIF through the JDK's
    * own sequence writer (`prepareWriteSequence`/`writeToSequence`) —
    * container layout, local color tables and LZW are the JVM codec's,
    * not ours. The palette is the 256-gray identity ramp, so GIF's
    * indexed storage is lossless for 8-bit gray: decode returns the
    * exact samples written. */
  def encodeGrayGif(w: Int, h: Int, nFrames: Int,
                    pixel: (Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0, s"bad gif shape ${w}x$h x$nFrames")
    val ramp = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      wr.setOutput(ios)
      wr.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, pixel(f, x, y) & 0xff); x += 1
          }
          y += 1
        }
        wr.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      wr.endWriteSequence()
    } finally { wr.dispose(); ios.close() }
    bos.toByteArray
  }

  /** REAL FRAME WALK: open whatever multi-frame container the ImageIO
    * registry recognizes (animated GIF; a single-frame PNG/BMP/JPEG
    * yields one frame), count frames with `getNumImages(true)` and
    * decode each to (width, height, row-major gray samples). Indexed
    * frames read through the palette (`getRGB` on an `IndexColorModel`
    * is an exact table lookup — no color management), gray rasters
    * sample-direct, anything else folds to integer luma — the same
    * band conventions as [[decodeGray]]. */
  def decodeFrames(bytes: Array[Byte]): IndexedSeq[(Int, Int, Array[Int])] = {
    javax.imageio.ImageIO.setUseCache(false)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    require(readers.hasNext, "payload is not a decodable media container")
    val rd = readers.next()
    try {
      rd.setInput(iis)
      val n = rd.getNumImages(true)
      (0 until n).map { f =>
        val img = rd.read(f)
        val w = img.getWidth
        val h = img.getHeight
        val out = new Array[Int](w * h)
        val indexed =
          img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]
        if (!indexed && img.getRaster.getNumBands == 1) {
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
    } finally { rd.dispose(); iis.close() }
  }

  /** Stride-sampled REAL-decoded frames per id: synthesize the animated
    * GIF fixture from [[testFramePixel]]/[[testDims]]/[[testFrameCount]],
    * REAL-decode every frame back through the JVM codec
    * ([[decodeFrames]]), keep every `stride`-th frame (the frame-sample
    * step of a video pipeline), resample each kept frame to (tw, th)
    * with the exact-integer NN math, and emit one typed row per kept
    * frame with the order-weighted checksum `sum(pixel_i * (i+1))`.
    * Partition-parallel flatMap after the [[spreadIds]] id shuffle; the
    * oracle replays the integers from the formula + the NN index math. */
  def videoRoundTrip(docs: DataFrame, idCol: String, stride: Int,
                     tw: Int, th: Int): Dataset[FrameDecoded] = {
    require(stride > 0 && tw > 0 && th > 0)
    import docs.sparkSession.implicits._
    spreadIds(docs, idCol).flatMap { id =>
      val (w0, h0) = testDims(id)
      val n = testFrameCount(id)
      val gif = encodeGrayGif(w0, h0, n, (f, x, y) => testFramePixel(id, f, x, y))
      val frames = decodeFrames(gif)
      require(frames.length == n,
        s"codec returned ${frames.length} frames, wrote $n")
      frames.zipWithIndex.collect {
        case ((w, h, pix), f) if f % stride == 0 =>
          val rs = resizeNearest(pix, w, h, tw, th)
          var cs = 0L
          var i = 0
          while (i < rs.length) { cs += rs(i).toLong * (i + 1); i += 1 }
          FrameDecoded(id, f, n, w, h, cs)
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
