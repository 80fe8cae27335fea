package graft

import org.apache.spark.sql.functions._
import graft.operators.{ChiSquare, GlobalShuffle, JsDivergence, Kappa}

/** Round-14b semantic pins: bin packing never splits a document and
  * derives bins from the exclusive prefix; JSD hits its 0 and ln 2
  * boundary cases; Cohen's kappa matches the textbook hand example and
  * its degenerate conventions; chi-squared terms vanish exactly on a
  * product table. */
class Round14bSpec extends SparkTestBase {
  import spark.implicits._

  test("packBins: doc-granularity bins off the exclusive prefix, " +
    "pos follows the shuffle order, totals survive") {
    val docs = (1L to 200L)
      .map(i => (i, ("w " * ((i % 17).toInt + 1)).trim))
      .toDF("doc_id", "text")
    val out = GlobalShuffle.packBins(docs, col("doc_id"), col("text"),
      "pk", 4, 40L).collect()
    assert(out.length === 200)
    val byShard = out.groupBy(_.getAs[Int]("shard"))
    byShard.foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getAs[Long]("pos"))
      var cum = 0L
      ordered.foreach { r =>
        assert(r.getAs[Long]("cum_before") === cum) // exclusive prefix
        assert(r.getAs[Long]("bin") === cum / 40L) // bin = prefix div cap
        cum += r.getAs[Long]("n_tokens")
      }
    }
    // token totals survive the packing (no doc lost or split)
    assert(out.map(_.getAs[Long]("n_tokens")).sum ===
      (1L to 200L).map(i => i % 17 + 1).sum)
  }

  test("JSD: identical mixes give all-zero terms; disjoint supports " +
    "sum to ln 2") {
    val a = Seq("en", "en", "es", "fr").toDF("lang")
    val same = JsDivergence.audit(a, a, col("lang")).collect()
    assert(same.forall(_.getAs[Double]("js_term") === 0.0))
    val b = Seq("de", "de", "it", "pt").toDF("lang")
    val disjoint = JsDivergence.audit(a, b, col("lang")).collect()
    val total = disjoint.map(_.getAs[Double]("js_term")).sum
    assert(math.abs(total - math.log(2)) < 1e-4)
    assert(disjoint.forall(r => r.getAs[Double]("js_term") >= 0.0))
  }

  test("kappa: textbook 2x2 hand example, perfect agreement, and the " +
    "constant-labeler convention") {
    // classic example: po = 0.7, row/col margins (A: 25/30 yes,
    // B: 25/30... ) — use counts a=20 (yes,yes), b=5 (yes,no),
    // c=10 (no,yes), d=15 (no,no): po=0.7, pe=(30*25+20*25)/2500=0.5,
    // kappa=0.4
    val rows =
      Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
        Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val df = rows.toDF("a", "b")
    val k = Kappa.cohen(df, col("a"), col("b")).head()
    assert(k.getAs[Long]("n") === 50L)
    assert(k.getAs[Double]("p_o") === 0.7)
    assert(k.getAs[Double]("p_e") === 0.5)
    assert(k.getAs[Double]("kappa") === 0.4)
    val perfect = Kappa.cohen(Seq(("x", "x"), ("y", "y")).toDF("a", "b"),
      col("a"), col("b")).head()
    assert(perfect.getAs[Double]("kappa") === 1.0)
    // both labelers constant and equal: pe = 1, po = 1 -> kappa 1
    val const = Kappa.cohen(Seq(("x", "x"), ("x", "x")).toDF("a", "b"),
      col("a"), col("b")).head()
    assert(const.getAs[Double]("kappa") === 1.0)
  }

  test("chi2: a product table has zero terms; a skewed 2x2 matches " +
    "the hand formula") {
    // product table: P(a,b) = P(a)P(b) exactly -> every term 0
    val prod = (for {
      (a, na) <- Seq(("s1", 2), ("s2", 3))
      (b, nb) <- Seq(("en", 4), ("es", 1))
      _ <- 1 to na * nb
    } yield (a, b)).toDF("a", "b")
    val t = ChiSquare.independence(prod, col("a"), col("b")).collect()
    assert(t.forall(_.getAs[Double]("chi2_term") === 0.0))
    // 2x2 with counts 10,0 / 0,10: chi2 = n = 20, each term = 5
    val skew = (Seq.fill(10)(("s1", "en")) ++ Seq.fill(10)(("s2", "es")))
      .toDF("a", "b")
    val s = ChiSquare.independence(skew, col("a"), col("b")).collect()
    assert(s.length === 2 && s.forall(_.getAs[Double]("chi2_term") === 5.0))
  }

  test("JSD is symmetric and bounded on randomized category mixes") {
    val rnd = new scala.util.Random(0xBEEF)
    for (trial <- 1 to 4) {
      val cats = ('a' to ('a' + 2 + trial).toChar).map(_.toString)
      def mk() = Seq.fill(200)(cats(rnd.nextInt(cats.size))).toDF("c")
      val (x, y) = (mk(), mk())
      def total(a: org.apache.spark.sql.DataFrame,
                b: org.apache.spark.sql.DataFrame) =
        JsDivergence.audit(a, b, col("c")).collect()
          .map(_.getAs[Double]("js_term")).sum
      val ab = total(x, y)
      val ba = total(y, x)
      assert(math.abs(ab - ba) < 1e-5, s"trial $trial: JSD not symmetric")
      assert(ab >= -1e-6 && ab <= math.log(2) + 1e-4,
        s"trial $trial: JSD $ab outside [0, ln 2]")
    }
  }

  test("kappa is annotator-symmetric and within [-1, 1]; perfect " +
    "DISagreement on a 2-label flip lands at -1") {
    val rnd = new scala.util.Random(0xFACE)
    for (trial <- 1 to 4) {
      val labels = Seq("x", "y", "z")
      val rows = Seq.fill(300)((labels(rnd.nextInt(3)),
        labels(rnd.nextInt(3))))
      val df = rows.toDF("a", "b")
      val kab = Kappa.cohen(df, col("a"), col("b")).head()
        .getAs[Double]("kappa")
      val kba = Kappa.cohen(df, col("b"), col("a")).head()
        .getAs[Double]("kappa")
      assert(kab === kba, s"trial $trial: kappa not annotator-symmetric")
      assert(kab >= -1.0 - 1e-9 && kab <= 1.0 + 1e-9)
    }
    // balanced 2-label total flip: po = 0, pe = 0.5 -> kappa = -1
    val flip = (Seq.fill(10)(("u", "v")) ++ Seq.fill(10)(("v", "u")))
      .toDF("a", "b")
    assert(Kappa.cohen(flip, col("a"), col("b")).head()
      .getAs[Double]("kappa") === -1.0)
  }

  test("chi2 terms are non-negative and column-symmetric") {
    val rnd = new scala.util.Random(0xD00D)
    val rows = Seq.fill(400)((s"s${rnd.nextInt(4)}", s"l${rnd.nextInt(3)}"))
    val df = rows.toDF("a", "b")
    val ab = ChiSquare.independence(df, col("a"), col("b")).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Double]("chi2_term"))).toMap
    val ba = ChiSquare.independence(df, col("b"), col("a")).collect()
      .map(r => ((r.getString(1), r.getString(0)),
        r.getAs[Double]("chi2_term"))).toMap
    assert(ab.values.forall(_ >= 0.0))
    assert(ab === ba, "chi2 cell terms must not depend on column order")
  }

  test("global shuffle: seeded permutation is uniform-ish across " +
    "shards and scrambles id order") {
    import graft.operators.GlobalShuffle
    val ids = (1L to 4096L).toDF("doc_id")
    val out = GlobalShuffle.shuffle(ids, col("doc_id"), "unif", 16)
      .collect()
    val sizes = out.groupBy(_.getAs[Int]("shard")).map(_._2.size)
    assert(sizes.size === 16)
    // loose uniformity: every shard within 2x of the expected 256
    assert(sizes.min > 128 && sizes.max < 512,
      s"shard sizes ${sizes.toSeq.sorted} not near-uniform")
    // the shuffle actually scrambles: within a shard, consecutive
    // positions must not be consecutive ids (a sorted-id order would be)
    val byShard = out.groupBy(_.getAs[Int]("shard"))
    val monotone = byShard.values.forall { rows =>
      val ordered = rows.sortBy(_.getAs[Long]("pos"))
        .map(_.getAs[Long]("id")).toSeq
      ordered.sliding(2).forall {
        case Seq(x, y) => y == x + 1
        case _ => true
      }
    }
    assert(!monotone, "shuffle left ids in consecutive order")
  }

  test("keyed qsketch: fold is order-free and equals the batch end " +
    "state; the real stream lands on it across micro-batches") {
    import graft.streaming.StreamingQsketch
    import graft.streaming.StreamingQsketch.{KQEvent, KQState}
    val items = (1 to 300).map { i =>
      ("k" + (i % 3), i.toLong, (i * 37 % 101).toDouble)
    }
    val df = items.toDF("key", "rid", "v")
    val want = StreamingQsketch
      .keyedEndStates(df, "key", col("rid"), "v").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getSeq[Long](2).zip(r.getSeq[Double](3)).sorted)))
      .toMap
    // driver-side hash identical to the Column form
    def hashOf(rid: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(rid.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.map("%02x".format(_)).mkString.substring(0, 15), 16)
    }
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { _ =>
      val got = rnd.shuffle(items).groupBy(_._1).map { case (k, rows) =>
        val st = rows.foldLeft(KQState(k, 0L, Nil, Nil))((s, r) =>
          StreamingQsketch.foldKeyed(s, hashOf(r._2), r._3))
        k -> ((st.n, st.hs.zip(st.vs).sorted))
      }
      assert(got === want, "fold must be arrival-order-free")
    }
    // real stream in two micro-batches
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[KQEvent]
    val q = StreamingQsketch.keyedStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_kq_test").start()
    val streamed = try {
      val evs = items.map(r => KQEvent(r._1, hashOf(r._2), r._3))
      val (b1, b2) = evs.splitAt(140)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      spark.table("stream_kq_test").collect()
        .map(r => (r.getString(0), r.getLong(1),
          r.getSeq[Long](2).zip(r.getSeq[Double](3)).sorted))
        .groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._2) }
    } finally q.stop()
    streamed.foreach { case (k, (_, n, pairs)) =>
      assert((n, pairs) === want(k), s"stream end state diverged for $k")
    }
  }

  test("keyed qsketch: at-least-once re-delivery leaves the kept set " +
    "bit-identical between fold and batch twin (round-14 ADVICE fix — " +
    "the batch top-K now dedups (key, h, v) like the fold's SET)") {
    import graft.streaming.StreamingQsketch
    import graft.streaming.StreamingQsketch.KQState
    def hashOf(rid: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(rid.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.map("%02x".format(_)).mkString.substring(0, 15), 16)
    }
    val base = (1 to 200).map(i =>
      ("k" + (i % 2), i.toLong, (i * 53 % 97).toDouble))
    // every third row delivered twice — the at-least-once shape
    val redelivered = base ++ base.filter(_._2 % 3 == 0)
    val batch = StreamingQsketch
      .keyedEndStates(redelivered.toDF("key", "rid", "v"), "key",
        col("rid"), "v")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        r.getSeq[Long](2).zip(r.getSeq[Double](3)).sorted)))
      .toMap
    val folded = redelivered.groupBy(_._1).map { case (k, rows) =>
      val st = rows.foldLeft(KQState(k, 0L, Nil, Nil))((s, r) =>
        StreamingQsketch.foldKeyed(s, hashOf(r._2), r._3))
      k -> ((st.n, st.hs.zip(st.vs).sorted))
    }
    assert(folded === batch,
      "kept set AND delivery count must agree under duplicate rows")
    // and the kept SET equals the clean (exactly-once) input's set —
    // re-delivery cannot displace a kept pair
    val clean = StreamingQsketch
      .keyedEndStates(base.toDF("key", "rid", "v"), "key", col("rid"), "v")
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[Long](2).zip(r.getSeq[Double](3)).sorted)
      .toMap
    batch.foreach { case (k, (_, pairs)) => assert(pairs === clean(k)) }
  }
}
