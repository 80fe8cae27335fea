package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.multimodal.{MediaRecord, Multimodal}
import graft.similarity.Similarity
import graft.streaming.EventWindows

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different words entirely unrelated content here"),
    (4L, "dog lazy the over jumps fox brown quick the") // same word set as 1
  ).toDF("doc_id", "text")

  test("exact dedup groups identical word sets") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(groups.length === 3) // docs 1 and 4 share a word-set digest
    val g = groups.find(_.getAs[Long]("n_docs") == 2).get
    assert(g.getAs[Long]("first_id") === 1L)
  }

  test("minhash LSH finds the near-dup pair and identical-set pair") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // jaccard 1.0 — must survive any banding
    // (1,2) has jaccard 8/10 = 0.8 — probabilistically caught; don't assert
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical word sets collide, unrelated text is distant") {
    val h = Dedup.withSimHash(docs, "text", "simhash")
      .select("doc_id", "simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // doc 4 = doc 1's words reordered + one extra "the" (same multiset votes
    // differ only via duplicate weighting) — must be very close
    assert(hamming(h(1L), h(2L)) < hamming(h(1L), h(3L)))
    assert(hamming(h(1L), h(4L)) <= 8)
  }

  test("windowed jaccard pairs match set arithmetic") {
    val got = Dedup.jaccardPairsWindowed(docs, "doc_id", "text", 10, 0.7)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // (1,2): |A|=|B|=8, intersect 7, union 9 -> 0.778
    assert(got.keySet === Set((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(got((1L, 4L)) === 1.0)
    assert(got((1L, 2L)) === 0.778)
  }
}

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("cosine: identity=1, orthogonal=0, opposite=-1") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 0).select($"embedding".as("qvec"))
    val sims = Similarity.cosineToQuery(vecs, "vec_id", "embedding", q, "qvec")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(sims(1L) - 1.0) < 1e-12)
    assert(math.abs(sims(2L)) < 1e-12)
    assert(math.abs(sims(3L) + 1.0) < 1e-12)
  }

  test("ann bucket pruning keeps the query itself and only its bucket") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qvec"))
    val top = Similarity.annTopK(emb, "vec_id", "embedding", q, "qvec",
      dims = Seq(0, 7, 19, 33), k = 10).collect()
    assert(top.head.getAs[Long]("vec_id") === 0L) // self-match ranks first
    assert(math.abs(top.head.getAs[Double]("sim") - 1.0) < 1e-9)
    assert(top.map(_.getAs[Int]("bucket")).distinct.length === 1)
  }

  test("int8 quantization: error bound, fidelity, zero-vector, narrow plan") {
    import graft.similarity.Quantize
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = Quantize.int8(emb, "embedding")
    // per-dimension reconstruction error <= scale/2 (+ fp slack), and
    // cosine(original, dequantized) stays ~1 on every real embedding
    val checked = q.select(
      Similarity.cosine(Similarity.toVec(col("embedding")),
        Quantize.dequantize(col("qvec"), col("qscale"))).as("fid"),
      array_max(zip_with(Similarity.toVec(col("embedding")),
        Quantize.dequantize(col("qvec"), col("qscale")),
        (a, b) => abs(a - b))).as("maxerr"),
      col("qscale")).collect()
    checked.foreach { r =>
      assert(r.getDouble(0) > 0.999, s"cosine fidelity ${r.getDouble(0)}")
      assert(r.getDouble(1) <= r.getDouble(2) / 2 + 1e-9,
        s"err ${r.getDouble(1)} vs scale/2 ${r.getDouble(2) / 2}")
    }
    // quantized values are int8-ranged; the max-|v| dim hits +/-127
    val bounds = q.select(array_min(col("qvec")).cast("int"),
      array_max(col("qvec")).cast("int")).collect()
    assert(bounds.forall(r => r.getInt(0) >= -127 && r.getInt(1) <= 127))
    assert(bounds.forall(r => r.getInt(0) == -127 || r.getInt(1) == 127))
    // zero vector: scale 0, all-zero bytes (no division blowup)
    import spark.implicits._
    val z = Quantize.int8(Seq((0L, Array.fill(4)(0.0f)))
      .toDF("vec_id", "embedding"), "embedding").collect().head
    assert(z.getAs[Double]("qscale") === 0.0)
    assert(z.getAs[Seq[Byte]]("qvec").forall(_ == 0))
    // narrow plan: no exchange, no UDF
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quantization must not shuffle:\n$plan")
  }

  test("batch topKJoin equals the per-query single topK loop") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val batch = Similarity.topKJoin(emb, "vec_id", "embedding",
      queries, "query_id", "qvec", k = 4)
    assert(batch.columns.toSeq === Seq("query_id", "vec_id", "sim"))
    val got = batch.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // reference: the proven single-query operator, looped
    val ref = (0L until 5L).flatMap { qid =>
      val q = emb.filter($"vec_id" === qid).select($"embedding".as("qvec"))
      Similarity.topK(emb, "vec_id", "embedding", q, "qvec", k = 4)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1)))
    }.toSet
    assert(got === ref)
    // each query's own vector ranks first with sim 1.0
    assert((0L until 5L).forall(qid => got.contains((qid, qid, 1.0))))
    // bounded-state aggregate: the plan uses ObjectHashAggregate (typed
    // partial agg), not a per-query row_number window over all pairs
    val plan = batch.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && !plan.contains("Window"),
      s"topKJoin must plan as a bounded typed aggregate:\n$plan")
  }
}

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("binary plumbing: blobify -> mapPartitions decode is deterministic") {
    val docs = Seq((7L, "abc")).toDF("doc_id", "text")
    val f = Multimodal.documentFeatures(spark, docs).collect().head
    assert(f.byte_len === 3L)
    assert(f.header_byte === 'a'.toInt)
    assert(f.byte_sum === ('a' + 'b' + 'c').toLong)
    assert(f.width === ('a' & 0x7f) + 1 && f.height === ('c' & 0x7f) + 1)
    // stub decode twice = same answer (purity contract for the real codec)
    assert(Multimodal.decodeStub("abc".getBytes) ===
      Multimodal.decodeStub("abc".getBytes))
  }

  test("empty payload handled") {
    val ds = Seq(MediaRecord(1L, "text", Array.emptyByteArray)).toDS()
    val f = Multimodal.extractFeatures(ds).collect().head
    assert(f.byte_len === 0L && f.header_byte === -1 && f.width === 0)
  }

  test("real codec: PNG encode -> ImageIO decode is pixel-exact") {
    // every sample value written comes back identical (lossless PNG,
    // sample-direct raster read — not color-managed getRGB)
    val (w, h) = (5, 4)
    val png = Multimodal.encodeGrayPng(w, h, (x, y) => (x * 50 + y * 13) % 256)
    assert(png.take(8).toSeq ===
      Seq(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)) // magic
    val (dw, dh, pix) = Multimodal.decodeGray(png)
    assert(dw === w && dh === h)
    for (y <- 0 until h; x <- 0 until w)
      assert(pix(y * w + x) === (x * 50 + y * 13) % 256,
        s"pixel ($x,$y) corrupted by the codec round trip")
  }

  test("real resize: nearest-neighbor index math + resizePng round trip") {
    // 4x2 -> 2x2 NN keeps pixels at source cols {0,2}, rows {0,1}
    val src = Array(10, 20, 30, 40,
                    50, 60, 70, 80)
    assert(Multimodal.resizeNearest(src, 4, 2, 2, 2).toSeq ===
      Seq(10, 30, 50, 70))
    // upscale 2x1 -> 4x1 duplicates each source pixel
    assert(Multimodal.resizeNearest(Array(9, 200), 2, 1, 4, 1).toSeq ===
      Seq(9, 9, 200, 200))
    // bytes->bytes real resize: decoding the output gives exactly the
    // NN-resampled raster of the input
    val png = Multimodal.encodeGrayPng(6, 6, (x, y) => x * 40 + y)
    val (rw, rh, rp) = Multimodal.decodeGray(Multimodal.resizePng(png, 3, 3))
    val (_, _, sp) = Multimodal.decodeGray(png)
    assert(rw === 3 && rh === 3)
    assert(rp.toSeq === Multimodal.resizeNearest(sp, 6, 6, 3, 3).toSeq)
  }

  test("imageRoundTrip matches the driver-side formula replay") {
    val docs = Seq(0L, 1L, 7L, 123L).toDF("doc_id")
    val got = Multimodal.imageRoundTrip(docs, "doc_id", 8, 8)
      .collect().map(r => r.doc_id -> r).toMap
    for (id <- Seq(0L, 1L, 7L, 123L)) {
      val (w, h) = Multimodal.testDims(id)
      assert(got(id).width === w && got(id).height === h,
        s"decoded dims for id=$id")
      // replay the formula + NN math directly (what the DuckDB oracle does)
      var cs = 0L
      for (y2 <- 0 until 8; x2 <- 0 until 8)
        cs += Multimodal.testPixel(id, x2 * w / 8, y2 * h / 8).toLong *
          (y2 * 8 + x2 + 1)
      assert(got(id).checksum === cs, s"checksum for id=$id")
    }
  }

  test("real audio codec: WAV PCM16 round trip is sample-exact") {
    val samples = Array.tabulate(200)(i =>
      Multimodal.testSample(42L, i))
    val wav = Multimodal.encodeWavPcm16(12000, samples)
    // a genuine RIFF container, not our bytes echoed back
    assert(new String(wav.take(4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    val (rate, ch, dec) = Multimodal.decodeWavPcm16(wav)
    assert(rate === 12000 && ch === 1)
    assert(dec.toSeq === samples.toSeq, "PCM16 must round-trip exactly")
  }

  test("audio decoder honors the container's endianness (AIFF vs WAV)") {
    // AIFF stores PCM big-endian, WAV little-endian: the same samples
    // through BOTH containers must decode identically — a decoder that
    // ignores the format flag flips every sample's byte order
    val samples = Array.tabulate(64)(i => Multimodal.testSample(7L, i))
    val fmtBe = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val bytes = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      bytes(2 * i) = ((s >> 8) & 0xff).toByte
      bytes(2 * i + 1) = (s & 0xff).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmtBe,
        samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    val (_, _, fromAiff) = Multimodal.decodeWavPcm16(bos.toByteArray)
    val (_, _, fromWav) = Multimodal.decodeWavPcm16(
      Multimodal.encodeWavPcm16(8000, samples))
    assert(fromAiff.toSeq === samples.toSeq, "AIFF (big-endian) decode")
    assert(fromWav.toSeq === fromAiff.toSeq)
  }

  test("audioRoundTrip matches the driver-side formula replay") {
    val ids = Seq(0L, 1L, 5L, 123L)
    val got = Multimodal.audioRoundTrip(ids.toDF("doc_id"), "doc_id")
      .collect().map(r => r.doc_id -> r).toMap
    for (id <- ids) {
      val n = Multimodal.testAudioLen(id)
      val rate = Multimodal.testAudioRate(id)
      assert(got(id).n_samples === n && got(id).sample_rate === rate)
      assert(got(id).duration_ms === n.toLong * 1000 / rate)
      var cs = 0L
      var pk = 0L
      for (i <- 0 until n) {
        val s = Multimodal.testSample(id, i).toLong
        cs += s * (i + 1)
        pk = math.max(pk, math.abs(s))
      }
      assert(got(id).checksum === cs, s"checksum for id=$id")
      assert(got(id).peak === pk, s"peak for id=$id")
    }
  }

  test("frame sampling explodes rows") {
    val payload = "abcdefghij".getBytes
    val ds = Seq(MediaRecord(7L, "video", payload)).toDS()
    val frames = Multimodal.explodeFrames(ds, frameSize = 3, stride = 2)
      .collect().sortBy(_._2)
    // chunks: abc def ghi j -> keep idx 0 and 2
    assert(frames.map(f => new String(f._3)).toSeq === Seq("abc", "ghi"))
    assert(frames.forall(_._1 == 7L))
  }

  test("real video codec: animated-GIF sequence round trip is " +
    "frame- and pixel-exact") {
    val (w, h, n) = (11, 7, 4)
    def px(f: Int, x: Int, y: Int): Int = (f * 31 + x * 7 + y * 13) % 256
    val gif = Multimodal.encodeGrayGif(w, h, n, px)
    assert(new String(gif, 0, 6, "US-ASCII").startsWith("GIF8"),
      "must be a real GIF container")
    val frames = Multimodal.decodeFrames(gif)
    assert(frames.length === n, "getNumImages must walk every frame")
    frames.zipWithIndex.foreach { case ((dw, dh, pix), f) =>
      assert(dw === w && dh === h)
      for (y <- 0 until h; x <- 0 until w)
        assert(pix(y * w + x) === px(f, x, y), s"frame $f pixel ($x,$y)")
    }
    // a single-frame PNG walks as one frame through the same path
    val png = Multimodal.encodeGrayPng(5, 4, (x, y) => x * 40 + y)
    assert(Multimodal.decodeFrames(png).length === 1)
  }

  test("videoRoundTrip matches the driver-side formula replay " +
    "(stride sampling + per-frame NN resample)") {
    val ids = Seq(0L, 3L, 7L, 12L)
    val got = Multimodal.videoRoundTrip(ids.toDF("doc_id"), "doc_id",
      stride = 2, 6, 6).collect()
      .map(r => (r.doc_id, r.frame_idx) -> r).toMap
    val want = ids.flatMap { id =>
      val (w, h) = Multimodal.testDims(id)
      val n = Multimodal.testFrameCount(id)
      (0 until n by 2).map { f =>
        var cs = 0L
        for (y2 <- 0 until 6; x2 <- 0 until 6)
          cs += Multimodal.testFramePixel(id, f, x2 * w / 6, y2 * h / 6)
            .toLong * (y2 * 6 + x2 + 1)
        (id, f) -> ((n, w, h, cs))
      }
    }.toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (k, (n, w, h, cs)) =>
      val r = got(k)
      assert((r.n_frames, r.width, r.height, r.checksum) === ((n, w, h, cs)),
        s"row $k")
    }
  }

  test("dHash: brightness-shift invariant, one-pixel retouch moves " +
    "few bits, family pairs surface and cross-family pairs don't") {
    val w = 13; val h = 9
    def base(x: Int, y: Int): Int = 30 + (x * 11 + y * 17) % 120
    val (_, _, p1) = Multimodal.decodeGray(
      Multimodal.encodeGrayPng(w, h, base))
    val (_, _, p2) = Multimodal.decodeGray(
      Multimodal.encodeGrayPng(w, h, (x, y) => base(x, y) + 80))
    assert(Multimodal.dHash64(p1, w, h) === Multimodal.dHash64(p2, w, h),
      "gradient signs must survive a uniform brightness shift")
    val (_, _, p3) = Multimodal.decodeGray(Multimodal.encodeGrayPng(w, h,
      (x, y) => if (x == 4 && y == 3) 255 else base(x, y)))
    val d = java.lang.Long.bitCount(
      Multimodal.dHash64(p1, w, h) ^ Multimodal.dHash64(p3, w, h))
    assert(d >= 1 && d <= 4, s"one retouched pixel moved $d bits")
    // families {0..4} and {5..9}: all within-family pairs, no cross
    val hashes = Multimodal.imageDHashes((0L to 9L).toDF("doc_id"),
      "doc_id", clusterSize = 5).toDF()
    val pairs = Multimodal.imageNearDupPairs(hashes, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val within = (for { a <- 0 to 9; b <- 0 to 9
      if a < b && a / 5 == b / 5 } yield (a.toLong, b.toLong)).toSet
    assert(pairs === within,
      s"missing ${within -- pairs}, strays ${pairs -- within}")
  }

  test("real JPEG codec: the lossy round trip is actually lossy, yet " +
    "the margin-160 fixture's dHash replays the formula exactly") {
    for (id <- 0L to 30L) {
      val cs = Multimodal.testJpegCell(id)
      val (w0, h0) = (9 * cs, 8 * cs)
      val orig = Array.tabulate(w0 * h0)(i =>
        Multimodal.testJpegPixel(id, i % w0, i / w0, cs))
      val jpg = Multimodal.encodeGrayJpeg(w0, h0, 0.9f,
        (x, y) => Multimodal.testJpegPixel(id, x, y, cs))
      val (w, h, pix) = Multimodal.decodeGray(jpg)
      assert((w, h) === (w0, h0), "JPEG must preserve dims")
      assert(Multimodal.dHash64(pix, w, h) === Multimodal.testJpegDHash(id),
        s"dHash must survive the lossy trip for id $id")
      if (id == 0L) assert(!pix.sameElements(orig),
        "quality-0.9 JPEG must NOT be pixel-exact — the tier is lossy " +
          "by construction (a lossless result means the codec was bypassed)")
    }
  }

  test("JPEG dHash is re-encode stable across qualities and a one-cell " +
    "retouch stays a near-dup (the lossy-tier near-dup assertion)") {
    val id = 7L
    val cs = Multimodal.testJpegCell(id)
    val (w0, h0) = (9 * cs, 8 * cs)
    def hashAt(q: Float, px: (Int, Int) => Int): Long = {
      val (w, h, pix) = Multimodal.decodeGray(
        Multimodal.encodeGrayJpeg(w0, h0, q, px))
      Multimodal.dHash64(pix, w, h)
    }
    val base = (x: Int, y: Int) => Multimodal.testJpegPixel(id, x, y, cs)
    assert(hashAt(0.8f, base) === hashAt(0.95f, base),
      "two lossy encodes of one image must land the same dHash")
    // flip ONE cell's lane (48 <-> 208): exactly the comparisons that
    // touch that cell move — 1..2 bits, a perceptual near-dup
    val retouch = (x: Int, y: Int) =>
      if (x / cs == 3 && y / cs == 2) 256 - base(x, y) else base(x, y)
    val d = java.lang.Long.bitCount(hashAt(0.9f, base) ^
      hashAt(0.9f, retouch))
    assert(d >= 1 && d <= 2, s"one-cell retouch moved $d bits")
  }

  test("jpegDHashes dataset matches the formula replay") {
    val rows = Multimodal.jpegDHashes((0L to 19L).toDF("doc_id"),
      "doc_id", quality = 0.9f).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val cs = Multimodal.testJpegCell(r.doc_id)
      assert((r.width, r.height) === (9 * cs, 8 * cs))
      assert(r.dhash === Multimodal.testJpegDHash(r.doc_id))
    }
  }

  test("video near-dup: families pair on every frame, frame hashes come " +
    "from the real sequence decode") {
    val fh = Multimodal.videoFrameHashes((0L to 9L).toDF("doc_id"),
      "doc_id", clusterSize = 5)
    // frame stacks are cluster-keyed: 2 + cl % 5 frames
    val counts = fh.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 4L).forall(counts(_) == 2L) &&
      (5L to 9L).forall(counts(_) == 3L))
    val pairs = Multimodal.videoNearDupPairs(fh, maxHamming = 8,
        minMatchFrames = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val within = (for { a <- 0 to 9; b <- 0 to 9
      if a < b && a / 5 == b / 5 } yield (a.toLong, b.toLong)).toSet
    assert(pairs.keySet === within,
      s"missing ${within -- pairs.keySet}, strays ${pairs.keySet -- within}")
    // a one-frame retouch never breaks a frame match: all frames agree
    assert(pairs.forall { case ((a, _), m) => m == counts(a) },
      s"every frame of a family pair must match: $pairs")
  }

  test("audio fingerprint: volume-invariant energy envelope, one-sample " +
    "click moves <= 2 adjacent bits, families pair") {
    val quiet = Array.tabulate(64)(i => ((i * 37) % 127 - 63).toShort)
    val loud = quiet.map(s => (s * 250).toShort) // uniform gain
    assert(Multimodal.audioFingerprint(quiet) ===
      Multimodal.audioFingerprint(loud),
      "energy-gradient signs must survive a uniform volume change")
    // a click at any position moves AT MOST the 2 adjacent envelope
    // bits (and may legally move none, when the window's relative order
    // survives) — both facts checked across every position
    val ds = (0 until 64).map { pos =>
      val clicked = quiet.clone(); clicked(pos) = 32000
      java.lang.Long.bitCount(Multimodal.audioFingerprint(quiet) ^
        Multimodal.audioFingerprint(clicked))
    }
    assert(ds.max <= 2, s"one click moved ${ds.max} bits")
    assert(ds.exists(_ >= 1), "no click position moved the envelope")
    val pairs = Multimodal.audioNearDupPairs(
        Multimodal.audioFingerprints((0L to 9L).toDF("doc_id"), "doc_id",
          clusterSize = 5).toDF(),
        maxHamming = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val within = (for { a <- 0 to 9; b <- 0 to 9
      if a < b && a / 5 == b / 5 } yield (a.toLong, b.toLong)).toSet
    assert(pairs === within,
      s"missing ${within -- pairs}, strays ${pairs -- within}")
  }
}

class StreamingSpec extends SparkTestBase {

  test("streaming tumbling agg equals the batch twin (memory sink)") {
    val batch = EventWindows
      .tumbling(queries.tbl(spark, sf, "events"), "1 hour")
      .collect().map(_.toSeq).toSet

    // file-stream sources need a directory: stage the events file into one
    val dir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))

    val q = EventWindows.streamingTumbling(spark, dir.toString, "1 hour", "2 hours")
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_tumbling_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_tumbling_test")
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming sliding and session twins match their batch forms") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = 1704067200L * 1000000000L // 2024-01-01
    val rows = Seq( // (event_id, ts, user_id, event_type, value, props)
      (0L, base, 1L, "a", 1.0, "{}"),
      (1L, base + 600L * 1000000000L, 1L, "b", 2.0, "{}"),
      (2L, base + 1200L * 1000000000L, 2L, "a", 3.0, "{}"),
      (3L, base + 9000L * 1000000000L, 1L, "c", 4.0, "{}"))
    val batchDf = rows.toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")

    val slideIn = MemoryStream[(Long, Long, Long, String, Double, String)]
    val slideQ = EventWindows.streamingSliding(
      slideIn.toDF().toDF("event_id", "ts", "user_id", "event_type",
        "value", "props"), "1 hour", "30 minutes", "2 hours")
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_sliding_twin").start()
    try {
      slideIn.addData(rows: _*)
      slideQ.processAllAvailable()
      val streamed = spark.table("stream_sliding_twin")
        .collect().map(_.toSeq).toSet
      val batch = EventWindows.sliding(batchDf, "1 hour", "30 minutes")
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
    } finally slideQ.stop()

    val sessIn = MemoryStream[(Long, Long, Long, String, Double, String)]
    val sessQ = EventWindows.streamingSessions(
      sessIn.toDF().toDF("event_id", "ts", "user_id", "event_type",
        "value", "props"), "30 minutes", "1 hour")
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_sessions_twin").start()
    try {
      sessIn.addData(rows: _*)
      sessQ.processAllAvailable()
      val streamed = spark.table("stream_sessions_twin")
        .collect().map(_.toSeq).toSet
      val batch = EventWindows.sessions(batchDf, "30 minutes")
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
    } finally sessQ.stop()
  }

  test("session windows merge events within the gap") {
    import spark.implicits._
    // user 1: 3 events within 30min -> one session; then a 2h jump -> new one
    val ns = Seq(0L, 600L, 1200L, 8400L).map(_ * 1000000000L)
    val df = ns.zipWithIndex
      .map { case (t, i) => (i.toLong, t, 1L, "e", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val sessions = EventWindows.sessions(df, "30 minutes")
      .orderBy("session_start").collect()
    assert(sessions.length === 2)
    assert(sessions(0).getAs[Long]("n") === 3L)
    assert(sessions(1).getAs[Long]("n") === 1L)
  }
}
