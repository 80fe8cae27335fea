package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, concat_ws}
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions must make the native expressions SQL-callable on a
  * session built with the extension — the application-wide injection
  * path (`spark.sql.extensions`). Uses newSession() off the shared
  * context to avoid a second SparkContext.
  */
class ExtensionsRegistrationSpec extends AnyFunSuite {

  test("extension-built session exposes locale_num and dot_product in SQL") {
    // Under the full suite a shared session already exists and getOrCreate
    // would return it WITHOUT applying extensions. Clear the active/default
    // session first (the shared SparkContext is reused — no second JVM
    // context), and restore both afterwards so later suites see theirs.
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = spark.sql(
        """SELECT locale_num('1.234.567,89') AS v,
                  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d""")
        .head()
      assert(r.getDouble(0) === 1234567.89)
      assert(r.getDouble(1) === 11.0)
      val r2 = spark.sql(
        """SELECT size(minhash_signature(array('a','b'), 16)) AS sig_len,
                  simhash64(array('hello','world')) AS sh,
                  sorted_jaccard(array(1L,2L,3L), array(2L,3L,4L)) AS j,
                  first_equal_index(array(1L,2L), array(9L,2L)) AS fei""")
        .head()
      val expectedSh = graft.functions.SimHash64(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          Seq("hello", "world"),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)))
        .eval(null).asInstanceOf[Long]
      assert(r2.getInt(0) === 16)
      assert(r2.getLong(1) === expectedSh)
      assert(r2.getDouble(2) === 0.5)
      assert(r2.getInt(3) === 1)
      // hardening: sorted_jaccard ignores null elements (array_compact in
      // the builder) instead of misreading them as zeros; first_equal_index
      // rejects nullable-element arrays at analysis (positional semantics,
      // compaction would shift indices); oversized k rejected un-truncated
      val jNull = spark.sql(
        "SELECT sorted_jaccard(array(CAST(NULL AS LONG)), array(0L)) AS j")
        .head().getDouble(0)
      assert(jNull === 0.0) // {} vs {0}
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(
          "SELECT first_equal_index(array(CAST(NULL AS LONG)), array(0L))")
          .head()
      }
      intercept[IllegalArgumentException] {
        spark.sql("SELECT minhash_signature(array('a'), 4294967312)").head()
      }
    } finally {
      prevActive.foreach(SparkSession.setActiveSession)
      prevDefault.foreach(SparkSession.setDefaultSession)
      if (prevActive.isEmpty) SparkSession.clearActiveSession()
      if (prevDefault.isEmpty) SparkSession.clearDefaultSession()
    }
  }

  test("table-valued functions plan to the same operators as the builders") {
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-tvf-test")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import spark.implicits._
      Seq((1L, "alpha beta gamma delta epsilon"),
        (2L, "alpha beta gamma"),
        (3L, "alpha beta gamma delta epsilon"),
        (4L, "unrelated content entirely"))
        .toDF("doc_id", "text").createOrReplaceTempView("tvf_docs")
      val docs = spark.table("tvf_docs")

      // the SQL call must compute EXACTLY what the builder method
      // computes. (Until round 19 this was a plan-level sameResult
      // assertion; the eager multi-reader pins inside the operators
      // now materialize fresh checkpoint RDDs per invocation, so two
      // invocations are intentionally distinct plans over identical
      // data — row identity is the surviving contract.)
      def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.collect().map(_.toString).sorted.toSeq
      val sqlKeep = spark.sql(
        "SELECT * FROM graft_minhash_keep('tvf_docs', 'doc_id', 'text')")
      val apiKeep = graft.dedup.Dedup.minhashRepresentativesMd5(
        docs, "doc_id", "text")
      assert(rows(sqlKeep) === rows(apiKeep),
        "graft_minhash_keep must compute minhashRepresentativesMd5")

      val sqlContain = spark.sql(
        "SELECT * FROM graft_containment_keep('tvf_docs','doc_id','text',0.9)")
      val apiContain = graft.dedup.Dedup.containmentRepresentatives(
        docs, "doc_id", "text", 0.9)
      assert(rows(sqlContain) === rows(apiContain),
        "graft_containment_keep must compute containmentRepresentatives")
      // and the decision itself is right: 3 is 1's exact dup, 2 is
      // contained in 1, 4 stands alone
      val kept = sqlContain.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      assert(kept === Map(1L -> (1L, true), 2L -> (1L, false),
        3L -> (1L, false), 4L -> (4L, true)))

      val sqlDedup = spark.sql(
        "SELECT * FROM graft_exact_dedup('tvf_docs', 'doc_id', 'text')")
      val apiDedup = graft.dedup.Dedup.exactGroups(docs, "doc_id", "text")
      assert(sqlDedup.queryExecution.optimizedPlan
        .sameResult(apiDedup.queryExecution.optimizedPlan))
      assert(sqlDedup.count() === 3) // {1,3} collapse

      val sqlSplit = spark.sql(
        "SELECT * FROM graft_split('tvf_docs','doc_id',0.8,0.1,0.1)")
      val apiSplit = graft.operators.DeterministicSplit(docs,
        Seq("doc_id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      assert(sqlSplit.queryExecution.optimizedPlan
        .sameResult(apiSplit.queryExecution.optimizedPlan))

      val sqlHll = spark.sql(
        "SELECT * FROM graft_hll_distinct('tvf_docs','doc_id',10)")
      val apiHll = graft.operators.Analytics.hllEstimate(
        graft.operators.Analytics.hllRegisters(docs, "doc_id", 10), 10)
      assert(sqlHll.queryExecution.optimizedPlan
        .sameResult(apiHll.queryExecution.optimizedPlan),
        "graft_hll_distinct must plan to hllRegisters+hllEstimate")
      assert(math.abs(sqlHll.head().getDouble(0) - 4.0) < 1.0)

      val sqlTopk = spark.sql(
        "SELECT * FROM graft_topk_group('tvf_docs','text','doc_id',1,'doc_id')")
      val apiTopk = graft.operators.Analytics.topKPerGroup(docs,
        Seq("text"), "doc_id", 1, Seq("doc_id"), salts = 8)
      assert(sqlTopk.queryExecution.optimizedPlan
        .sameResult(apiTopk.queryExecution.optimizedPlan),
        "graft_topk_group must plan to topKPerGroup")

      val sqlKmv = spark.sql(
        "SELECT * FROM graft_kmv_distinct('tvf_docs','doc_id',64)")
      val apiKmv = graft.operators.Analytics.kmvEstimate(
        graft.operators.Analytics.kmvSketch(docs, "doc_id", 64), 64)
      assert(sqlKmv.queryExecution.optimizedPlan
        .sameResult(apiKmv.queryExecution.optimizedPlan),
        "graft_kmv_distinct must plan to kmvSketch+kmvEstimate")
      assert(sqlKmv.head().getDouble(0) === 4.0) // under k: exact

      Seq.tabulate(40)(i => (i.toLong, i * 2.0))
        .toDF("id", "v").createOrReplaceTempView("tvf_base")
      val sqlQs = spark.sql(
        "SELECT * FROM graft_qsketch('tvf_base','id','v',1024,'0.5,0.9')")
      val apiQs = graft.operators.Analytics.qsketchQuantiles(
        graft.operators.Analytics.qsketchSample(spark.table("tvf_base"),
          concat_ws("|", col("id")), "v", 1024),
        Seq("0.5" -> 0.5, "0.9" -> 0.9))
      assert(sqlQs.queryExecution.optimizedPlan
        .sameResult(apiQs.queryExecution.optimizedPlan),
        "graft_qsketch must plan to qsketchSample+qsketchQuantiles")
      // k >= n: the sample is the data — exact order statistics
      assert(sqlQs.orderBy("prob").collect().map(_.getDouble(1)).toSeq
        === Seq(38.0, 70.0)) // idx floor(.5*39)=19 -> v=38; floor(.9*39)=35 -> 70

      Seq.tabulate(40)(i => (i.toLong % 2, i.toLong, i * 2.0))
        .toDF("g", "id", "v").createOrReplaceTempView("tvf_baseg")
      val sqlQsg = spark.sql("SELECT * FROM graft_qsketch_grouped(" +
        "'tvf_baseg','g','id','v',1024,'0.5')")
      val apiQsg = graft.operators.Analytics.qsketchQuantilesGrouped(
        graft.operators.Analytics.qsketchSampleGrouped(
          spark.table("tvf_baseg"), Seq("g"),
          concat_ws("|", col("id")), "v", 1024),
        Seq("g"), Seq("0.5" -> 0.5))
      assert(sqlQsg.queryExecution.optimizedPlan
        .sameResult(apiQsg.queryExecution.optimizedPlan),
        "graft_qsketch_grouped must plan to the grouped sample+read-off")
      // per group k >= n: exact order stats; group 0 holds 0,4,..,76
      // (idx floor(.5*19)=9 -> 36), group 1 holds 2,6,..,78 (-> 38)
      assert(sqlQsg.orderBy("g").collect()
        .map(r => (r.getLong(0), r.getDouble(2))).toSeq
        === Seq((0L, 36.0), (1L, 38.0)))

      val sqlEq = spark.sql(
        "SELECT * FROM graft_equidepth('tvf_base','id','v',1024,4)")
      val apiEq = graft.operators.Analytics.qsketchRangeBuckets(
        spark.table("tvf_base"), concat_ws("|", col("id")), "v", 1024, 4)
      assert(sqlEq.queryExecution.optimizedPlan
        .sameResult(apiEq.queryExecution.optimizedPlan),
        "graft_equidepth must plan to qsketchRangeBuckets (same literal cuts)")
      // k >= n: exact quartile cuts of v=0,2,..,78 -> 10 rows per bucket
      assert(sqlEq.groupBy("bucket").count().collect()
        .map(r => (r.getInt(0), r.getLong(1))).toMap
        === Map(0 -> 10L, 1 -> 10L, 2 -> 10L, 3 -> 10L))

      // selection result is data, not a deferred plan: value check only
      // (p0.5 of v=0,2,..,78 interpolates (n-1)*.5=19.5 -> 39.0)
      val sqlXq = spark.sql(
        "SELECT * FROM graft_exact_quantiles('tvf_base','id','v',64,8,'0.5')")
      assert(sqlXq.collect().map(r =>
        (r.getString(0), r.getDouble(1))).toSeq === Seq(("0.5", 39.0)))
      // grouped: p0.5 per parity group of v=0..78 by 2 (even ids hold
      // v=0,4,..,76: (19)*.5=9.5 -> (36+40)/2=38; odd ids 2,6,..,78 -> 40)
      val sqlXqg = spark.sql("SELECT * FROM graft_exact_quantiles_grouped(" +
        "'tvf_baseg','g','id','v',64,4,'0.5')")
      assert(sqlXqg.orderBy("g").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
        === Seq((0L, "0.5", 38.0), (1L, "0.5", 40.0)))
      Seq.tabulate(40)(i => (i.toLong, i * 3.0))
        .toDF("id", "v").createOrReplaceTempView("tvf_cur")
      val sqlPsi = spark.sql(
        "SELECT * FROM graft_drift_psi('tvf_base','tvf_cur','v',4)")
      val apiPsi = graft.operators.Analytics.driftPsi(
        spark.table("tvf_base"), spark.table("tvf_cur"), "v", 4)
      assert(sqlPsi.queryExecution.optimizedPlan
        .sameResult(apiPsi.queryExecution.optimizedPlan),
        "graft_drift_psi must plan to driftPsi")

      // row identity, not sameResult: stripDuplicatedSpans pins its
      // token/span streams eagerly since round 19, so each invocation
      // scans its own checkpoint RDDs (see the minhash_keep note above)
      val sqlStrip = spark.sql(
        "SELECT * FROM graft_strip_dup_spans('tvf_docs','doc_id','text',3)")
      val apiStrip = graft.textanalysis.TextAnalysis.stripDuplicatedSpans(
        docs, "doc_id", "text", 3)
      assert(rows(sqlStrip) === rows(apiStrip),
        "graft_strip_dup_spans must compute stripDuplicatedSpans")

      Seq.tabulate(30)(i =>
          (i.toLong, "k" + (i % 2), if (i == 28) 50.0 else i * 1.0))
        .toDF("id", "key", "v").createOrReplaceTempView("tvf_series")
      val sqlAnom = spark.sql(
        "SELECT * FROM graft_ewma_anomaly('tvf_series','key','id','v'," +
          "0.3,5,3.0,3)")
      val apiAnom = graft.operators.Analytics.ewmaAnomaly(
        spark.table("tvf_series"), Seq("key"), Seq("id"), "v",
        0.3, 5, 3.0, 3)
      assert(sqlAnom.queryExecution.optimizedPlan
        .sameResult(apiAnom.queryExecution.optimizedPlan),
        "graft_ewma_anomaly must plan to ewmaAnomaly")
      assert(sqlAnom.where(col("is_anomaly")).collect()
        .map(_.getLong(0)).toSet === Set(28L),
        "the spiked row (and only it) must flag")

      Seq((1L, "alpha beta", "en"), (2L, "gamma delta", "en"),
        (3L, "uno dos", "es"), (4L, "alpha dos", "es"))
        .toDF("doc_id", "text", "lang")
        .createOrReplaceTempView("tvf_labeled")
      val sqlNb = spark.sql(
        "SELECT * FROM graft_nb_score('tvf_labeled','tvf_docs','doc_id'," +
          "'text','lang','en',0.5)")
      val labeled = spark.table("tvf_labeled")
      val apiNb = graft.textanalysis.NaiveBayes.score(
        graft.textanalysis.NaiveBayes.train(labeled, "text",
          col("lang") === "en", 0.5),
        docs, "doc_id", "text")
      // row identity: NaiveBayes.train pins its count table (r19)
      assert(rows(sqlNb) === rows(apiNb),
        "graft_nb_score must compute NaiveBayes.train+score")
      val nbScores = sqlNb.collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(nbScores(1L) > 0.5,
        s"all-english doc must score positive: $nbScores")

      Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)), (2L, Seq(0.0, 1.0)),
        (3L, Seq(0.7, 0.4)), (4L, Seq(0.5, 0.5)))
        .toDF("vec_id", "embedding")
        .createOrReplaceTempView("tvf_emb")
      val sqlRag = spark.sql(
        "SELECT * FROM graft_rag('tvf_docs','tvf_emb',0," +
          "'alpha,beta',10,60,5,1000)")
      val apiRag = graft.pipeline.Rag.pack(docs, spark.table("tvf_emb"),
        0L, Seq("alpha", "beta"), 10, 60, 5, 1000L)
      // row identity: the strip/bm25 stages pin eagerly (r19)
      assert(rows(sqlRag) === rows(apiRag),
        "graft_rag must compute the Rag.pack pipeline")
      assert(sqlRag.count() > 0, "the packed context must be non-empty")

      val sqlHh = spark.sql(
        "SELECT * FROM graft_heavy_hitters('tvf_docs','text',0.4)")
      val apiHh = graft.operators.HeavyHitters.exact(docs,
        col("text"), 0.4)
      assert(sqlHh.queryExecution.optimizedPlan
        .sameResult(apiHh.queryExecution.optimizedPlan),
        "graft_heavy_hitters must plan to HeavyHitters.exact")
      assert(sqlHh.collect().map(_.getString(0)).toSeq ===
        Seq("alpha beta gamma delta epsilon")) // 2/4 of rows

      val sqlPara = spark.sql(
        "SELECT * FROM graft_paragraph_dedup('tvf_docs','doc_id','text',3)")
      val apiPara = graft.dedup.Dedup.paragraphDedup(docs, "doc_id",
        "text", 3)
      assert(sqlPara.queryExecution.optimizedPlan
        .sameResult(apiPara.queryExecution.optimizedPlan),
        "graft_paragraph_dedup must plan to Dedup.paragraphDedup")
      assert(sqlPara.count() === 4)

      val sqlTemp = spark.sql(
        "SELECT * FROM graft_temperature_mix('tvf_labeled','lang',3,'doc_id')")
      val apiTemp = graft.operators.TemperatureMixture(labeled, "lang",
        3L, Seq("doc_id"), hash = graft.operators.Md5)
      assert(sqlTemp.queryExecution.optimizedPlan
        .sameResult(apiTemp.queryExecution.optimizedPlan),
        "graft_temperature_mix must plan to TemperatureMixture")

      Seq((0L, 100L), (1L, 250L), (2L, 80L), (3L, 400L))
        .toDF("file_id", "bytes").createOrReplaceTempView("tvf_stats")
      val sqlBins = spark.sql(
        "SELECT * FROM graft_compaction_bins('tvf_stats','file_id','bytes',300)")
      val apiBins = graft.operators.Compaction.planBins(
        spark.table("tvf_stats"), "file_id", "bytes", 300L)
      assert(sqlBins.queryExecution.optimizedPlan
        .sameResult(apiBins.queryExecution.optimizedPlan),
        "graft_compaction_bins must plan to Compaction.planBins")
      assert(sqlBins.select("file_id", "bin").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap ===
        Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L))

      Seq((1.0, 5.0), (2.0, 3.0), (3.0, 1.0), (4.0, 4.0), (2.5, 2.0))
        .toDF("x", "y").createOrReplaceTempView("tvf_pts")
      val sqlSky = spark.sql(
        "SELECT * FROM graft_skyline('tvf_pts','x','y')")
      val apiSky = graft.operators.Pareto.skyline2D(
        spark.table("tvf_pts"), col("x"), col("y"))
      assert(sqlSky.queryExecution.optimizedPlan
        .sameResult(apiSky.queryExecution.optimizedPlan),
        "graft_skyline must plan to Pareto.skyline2D")
      assert(sqlSky.select("x", "y").collect()
        .map(r => (r.getDouble(0), r.getDouble(1))).toSet ===
        Set((1.0, 5.0), (2.0, 3.0), (3.0, 1.0), (2.5, 2.0)))

      Seq((10L, 11L), (10L, 12L), (10L, 13L))
        .toDF("s", "d").createOrReplaceTempView("tvf_edges")
      val sqlLpa = spark.sql(
        "SELECT * FROM graft_label_prop('tvf_edges','s','d',1)")
      val apiLpa = graft.graph.LabelProp(spark.table("tvf_edges"),
        "s", "d", 1)
      // row identity: LabelProp pins und/nodes eagerly (r19)
      assert(rows(sqlLpa) === rows(apiLpa),
        "graft_label_prop must compute LabelProp")
      assert(sqlLpa.where(col("node") === 11L).head().getLong(1) === 10L)

      Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L),
        (3L, 9L)).toDF("b", "i").createOrReplaceTempView("tvf_baskets")
      val sqlCo = spark.sql(
        "SELECT * FROM graft_cooccur_pairs('tvf_baskets','b','i',2)")
      val apiCo = graft.operators.Cooccur.frequentPairs(
        spark.table("tvf_baskets"), col("b"), col("i"), 2L)
      assert(sqlCo.queryExecution.optimizedPlan
        .sameResult(apiCo.queryExecution.optimizedPlan),
        "graft_cooccur_pairs must plan to Cooccur.frequentPairs")
      assert(sqlCo.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
        Seq((1L, 2L, 3L))) // item 9 infrequent, pruned pre-join

      // KS materializes its per-lane sums (localCheckpoint), so two
      // invocations are distinct RDD plans — value check, like
      // graft_exact_quantiles above
      val sqlKs = spark.sql(
        "SELECT * FROM graft_ks_drift('tvf_base','tvf_cur','v')")
      val apiKs = graft.operators.KsDrift.ks(spark.table("tvf_base"),
        spark.table("tvf_cur"), "v")
      assert(sqlKs.head() === apiKs.head(),
        "graft_ks_drift must compute KsDrift.ks's numbers")
      assert(sqlKs.head().getDouble(0) > 0.0,
        "stretched values must show drift")

      val sqlInterp = spark.sql(
        "SELECT * FROM graft_interpolate('tvf_series','key','id','v')")
      val apiInterp = graft.operators.Resample.interpolateLinear(
        spark.table("tvf_series"), Seq("key"), "id", "v", "v_interp")
      assert(sqlInterp.queryExecution.optimizedPlan
        .sameResult(apiInterp.queryExecution.optimizedPlan),
        "graft_interpolate must plan to Resample.interpolateLinear")

      val sqlIdx = spark.sql(
        "SELECT * FROM graft_inverted_index('tvf_docs','doc_id','text',2,3)")
      val apiIdx = graft.textanalysis.InvertedIndex.build(docs,
        "doc_id", "text", 2L, 3L)
      assert(sqlIdx.queryExecution.optimizedPlan
        .sameResult(apiIdx.queryExecution.optimizedPlan),
        "graft_inverted_index must plan to InvertedIndex.build")
      assert(sqlIdx.where(col("term") === "alpha").head()
        .getAs[Seq[Long]]("postings") === Seq(1L, 2L, 3L))

      Seq((1L, 1L), (1L, 2L), (2L, 3L))
        .toDF("u", "i").createOrReplaceTempView("tvf_pos")
      val sqlNeg = spark.sql(
        "SELECT * FROM graft_negatives('tvf_pos','u','i',10,3)")
      val apiNeg = graft.operators.NegativeSample(
        spark.table("tvf_pos"), col("u"), col("i"), 10L, 3)
      assert(sqlNeg.queryExecution.optimizedPlan
        .sameResult(apiNeg.queryExecution.optimizedPlan),
        "graft_negatives must plan to NegativeSample")
      assert(sqlNeg.groupBy("user").count().collect()
        .forall(_.getLong(1) === 3L))

      // rank_pct materializes its lane sums (localCheckpoint) — value
      // check, like graft_ks_drift
      val sqlRp = spark.sql(
        "SELECT * FROM graft_rank_pct('tvf_base','v')")
      val apiRp = graft.operators.RankNormalize(
        spark.table("tvf_base"), "v")
      assert(sqlRp.select("id", "rank_pct").collect().map(r =>
        (r.getLong(0), r.getDouble(1))).toMap ===
        apiRp.select("id", "rank_pct").collect().map(r =>
          (r.getLong(0), r.getDouble(1))).toMap,
        "graft_rank_pct must compute RankNormalize's numbers")

      val sqlMi = spark.sql(
        "SELECT * FROM graft_term_mi('tvf_labeled','doc_id','text'," +
          "'lang','en',1)")
      val apiMi = graft.textanalysis.TermStats.termMutualInfo(
        labeled, "doc_id", "text", col("lang") === "en", 1L)
      assert(sqlMi.queryExecution.optimizedPlan
        .sameResult(apiMi.queryExecution.optimizedPlan),
        "graft_term_mi must plan to TermStats.termMutualInfo")
      assert(sqlMi.where(col("term") === "alpha").head().getLong(1) === 2L)

      // Auc + Mmr materialize intermediates (localCheckpoint) — value
      // checks, like graft_ks_drift
      Seq((0.9, true), (0.8, true), (0.3, false), (0.2, false),
        (0.8, false)).toDF("s", "y").createOrReplaceTempView("tvf_auc")
      val sqlAuc = spark.sql(
        "SELECT * FROM graft_auc('tvf_auc','s','y')")
      val apiAuc = graft.operators.Auc.auc(spark.table("tvf_auc"),
        col("s"), col("y"))
      assert(sqlAuc.head() === apiAuc.head(),
        "graft_auc must compute Auc.auc's numbers")
      // pairs: (0.9,0.8)=1 (0.9,0.3)=1 (0.9,0.2)=1 (0.8,0.8)=.5 ... AUC=(1+1+1+.5+1+1)/6
      assert(sqlAuc.head().getDouble(0) === math.floor(5.5 / 6 * 1e6
        + 0.5) / 1e6)

      val sqlPpr = spark.sql(
        "SELECT * FROM graft_ppr('tvf_edges','s','d','10',2)")
      val apiPpr = graft.graph.PageRank.personalized(
        spark.table("tvf_edges"), "s", "d", Seq("10"), 2)
      // row identity: PageRank pins its loop invariants (r19)
      assert(rows(sqlPpr) === rows(apiPpr),
        "graft_ppr must compute PageRank.personalized")

      val sqlSpc = spark.sql(
        "SELECT * FROM graft_sparse_cosine('tvf_docs','doc_id','text'," +
          "4,1.0,0.0)")
      val apiSpc = graft.textanalysis.InvertedIndex.sparseCosinePairs(
        docs, "doc_id", "text", 4L, 1.0, 0.0)
      assert(sqlSpc.queryExecution.optimizedPlan
        .sameResult(apiSpc.queryExecution.optimizedPlan),
        "graft_sparse_cosine must plan to sparseCosinePairs")

      // grouped AUC: the mixed segment scores like tvf_auc; a segment
      // with only negatives must drop (degenerate), not divide by zero
      Seq(("a", 0.9, true), ("a", 0.8, true), ("a", 0.3, false),
        ("a", 0.2, false), ("a", 0.8, false), ("b", 0.5, false))
        .toDF("g", "s", "y").createOrReplaceTempView("tvf_auc_g")
      val sqlAucG = spark.sql(
        "SELECT * FROM graft_auc_grouped('tvf_auc_g','g','s','y')")
      assert(sqlAucG.collect().map(r => (r.getString(0),
        r.getDouble(1))).toSeq ===
        Seq(("a", math.floor(5.5 / 6 * 1e6 + 0.5) / 1e6)),
        "graft_auc_grouped must compute Auc.aucGrouped's numbers")

      // Gini: 3x value 1 + 1x value 5 -> sorted rank sum identity;
      // G = 2*(1*1+1*2+1*3+5*4)/(4*8) - 5/4 = 52/32 - 40/32 = 0.375
      Seq(1L, 1L, 1L, 5L).toDF("v").createOrReplaceTempView("tvf_gini")
      val sqlGini = spark.sql("SELECT * FROM graft_gini('tvf_gini','v')")
      assert(sqlGini.head() === graft.operators.Gini.gini(
        spark.table("tvf_gini"), col("v")).head(),
        "graft_gini must compute Gini.gini's numbers")
      assert(sqlGini.head().getDouble(0) === 0.375)

      // grouped Gini: group a as above; group b perfectly equal -> 0
      Seq(("a", 1L), ("a", 1L), ("a", 1L), ("a", 5L),
        ("b", 2L), ("b", 2L)).toDF("g", "v")
        .createOrReplaceTempView("tvf_gini_g")
      val sqlGiniG = spark.sql(
        "SELECT * FROM graft_gini_grouped('tvf_gini_g','g','v')")
      assert(sqlGiniG.orderBy("g").collect().map(r =>
        (r.getString(0), r.getDouble(1))).toSeq ===
        Seq(("a", 0.375), ("b", 0.0)),
        "graft_gini_grouped must compute Gini.giniGrouped's numbers")

      // Lorenz: 3x1 + 1x5, deciles -> bottom 50% of 4 rows = 2 rows
      // holding 2/8 of the total; the d=10 point is exactly 1.0
      val sqlLor = spark.sql(
        "SELECT * FROM graft_lorenz('tvf_gini','v',10)")
      val lor = sqlLor.orderBy("p").collect()
        .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
      assert(lor.length === 10)
      assert(lor(4) === ((0.5, 2L, 0.25)),
        "bottom half = two 1s of total 8")
      assert(lor(9) === ((1.0, 4L, 1.0)))

      // grouped KS: segment a planted with disjoint supports (stat 1),
      // segment b identical on both sides (stat 0)
      Seq(("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 6.0))
        .toDF("g", "v").createOrReplaceTempView("tvf_ks_base")
      Seq(("a", 3.0), ("a", 4.0), ("b", 5.0), ("b", 6.0))
        .toDF("g", "v").createOrReplaceTempView("tvf_ks_cur")
      val sqlKsG = spark.sql("SELECT * FROM graft_ks_drift_grouped(" +
        "'tvf_ks_base','tvf_ks_cur','g','v')")
      assert(sqlKsG.orderBy("g").collect().map(r =>
        (r.getString(0), r.getDouble(1))).toSeq ===
        Seq(("a", 1.0), ("b", 0.0)),
        "graft_ks_drift_grouped must compute KsDrift.ksGrouped's stats")

      // grouped rank pct: window parity per group
      Seq(("a", 10.0), ("a", 20.0), ("a", 20.0), ("b", 7.0), ("b", 9.0))
        .toDF("g", "v").createOrReplaceTempView("tvf_rank_g")
      val sqlRkG = spark.sql(
        "SELECT * FROM graft_rank_pct_grouped('tvf_rank_g','g','v')")
      val winRk = spark.sql("SELECT g, v, percent_rank() OVER " +
        "(PARTITION BY g ORDER BY v) AS rank_pct FROM tvf_rank_g")
      assert(sqlRkG.orderBy("g", "v").collect().map(r =>
        (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq ===
        winRk.orderBy("g", "v").collect().map(r =>
          (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq,
        "graft_rank_pct_grouped must match the partitioned window")

      // chunker: 10 tokens, size 4, overlap 1 (stride 3) -> starts at
      // 0,3,6 (6+4 >= 10 stops) -> 3 chunks, last one 4 tokens ending
      // at the final token
      Seq((1L, (1 to 10).map("t" + _).mkString(" ")))
        .toDF("doc_id", "text").createOrReplaceTempView("tvf_chunk")
      val sqlChunk = spark.sql(
        "SELECT * FROM graft_chunk('tvf_chunk','doc_id','text',4,1)")
        .orderBy("chunk_id").collect()
      assert(sqlChunk.map(_.getString(3)).toSeq === Seq(
        "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"),
        "graft_chunk must produce the overlapped windows")

      // mixture KL: exact recipe match -> kl_term 0; source outside
      // the recipe surfaces with null target
      Seq("a", "a", "b", "c").toDF("src")
        .createOrReplaceTempView("tvf_mix")
      val mix = spark.sql("SELECT * FROM graft_mixture_kl('tvf_mix'," +
        "'src','a:0.5,b:0.25')").orderBy("source").collect()
      assert(mix.map(r => (r.getString(0),
        if (r.isNullAt(3)) None else Some(r.getDouble(4)))).toSeq ===
        Seq(("a", Some(0.0)), ("b", Some(0.0)), ("c", None)),
        "exact-recipe sources get kl 0; unplanned sources null")

      // unigram logprob: two identical one-token docs -> both score
      // ln((2+1)/(2+1)) = 0
      Seq((1L, "same"), (2L, "same")).toDF("doc_id", "text")
        .createOrReplaceTempView("tvf_uni")
      val uni = spark.sql("SELECT * FROM graft_unigram_logprob(" +
        "'tvf_uni','doc_id','text')").collect()
      assert(uni.length === 2 && uni.forall(_.getDouble(2) === 0.0),
        "ln((c+1)/(T+V)) with c=2,T=2,V=1 is ln(1) = 0")

      Seq((1L, Seq(1.0, 0.0), 0.9), (2L, Seq(0.0, 1.0), 0.8))
        .toDF("id", "vec", "rel").createOrReplaceTempView("tvf_pool")
      val sqlMmr = spark.sql(
        "SELECT * FROM graft_mmr('tvf_pool','id','vec','rel',2)")
      assert(sqlMmr.orderBy("rank").collect().map(r =>
        (r.getInt(0), r.getLong(1))).toSeq === Seq((1, 1L), (2, 2L)),
        "graft_mmr must compute Mmr.rerank's picks")

      // strip-html: blocks drop with content, entities decode once
      Seq((1L, "a<script>1 < 2</script><p>b &amp; c</p>"))
        .toDF("id", "html").createOrReplaceTempView("tvf_html")
      val sh = spark.sql(
        "SELECT * FROM graft_strip_html('tvf_html','id','html')").head()
      assert(sh.getLong(1) === 4L && sh.getString(2) === "a b & c",
        "graft_strip_html must run the block->tag->entity chain")

      // oov rate: vocab of 1 keeps only the modal token
      Seq((1L, "a a zzz")).toDF("id", "text")
        .createOrReplaceTempView("tvf_oov")
      val ov = spark.sql(
        "SELECT * FROM graft_oov_rate('tvf_oov','id','text',1)").head()
      assert(ov.getLong(1) === 3L && ov.getLong(2) === 1L,
        "graft_oov_rate must count tokens outside the top-k vocab")

      // token budget: second doc overflows and is cut
      Seq(("s", 1L, "t t"), ("s", 2L, "t t")).toDF("src", "id", "text")
        .createOrReplaceTempView("tvf_budget")
      val tb = spark.sql("SELECT * FROM graft_token_budget(" +
        "'tvf_budget','src','id','text',3)").collect()
      assert(tb.map(_.getLong(1)).toSeq === Seq(1L),
        "graft_token_budget must exclude the overflowing doc")

      // entropy: two equal categories -> ln(2)
      Seq(("g", "x"), ("g", "y")).toDF("g", "c")
        .createOrReplaceTempView("tvf_entropy")
      val en = spark.sql(
        "SELECT * FROM graft_entropy('tvf_entropy','g','c')").head()
      assert(math.abs(en.getDouble(3) - math.log(2)) < 1e-5,
        "graft_entropy must compute the Shannon entropy")

      // ngram spans: two docs sharing a 4-token prefix -> one span each
      Seq((1L, "a b c d x"), (2L, "a b c d y")).toDF("doc_id", "text")
        .createOrReplaceTempView("tvf_spans")
      val ns = spark.sql("SELECT * FROM graft_ngram_spans(" +
        "'tvf_spans','doc_id','text',4)").orderBy("doc_id").collect()
      assert(ns.map(r => (r.getLong(0), r.getLong(3))).toSeq ===
        Seq((1L, 4L), (2L, 4L)),
        "graft_ngram_spans must find the shared prefix span")
      val sc = spark.sql("SELECT * FROM graft_span_coverage(" +
        "'tvf_spans','doc_id','text',4)").orderBy("doc_id").head()
      assert(sc.getLong(1) === 5L && sc.getLong(2) === 4L && sc.getDouble(3) === 0.8,
        "graft_span_coverage must report the duplicated fraction")

      // snm pairs: identical texts sort adjacent -> jaccard 1
      Seq((1L, "x y z"), (2L, "x y z")).toDF("doc_id", "text")
        .createOrReplaceTempView("tvf_snm")
      val sp = spark.sql("SELECT * FROM graft_snm_pairs(" +
        "'tvf_snm','doc_id','text',3,0.9)").collect()
      assert(sp.length === 1 && sp.head.getDouble(2) === 1.0,
        "graft_snm_pairs must pair sorted neighbors")

      // sq8: with full-pool headroom the query vector ranks itself first
      Seq((1L, Seq(1.0, 0.2)), (2L, Seq(0.1, 1.0)), (3L, Seq(-1.0, 0.4)),
        (4L, Seq(0.5, -0.8))).toDF("id", "vec")
        .createOrReplaceTempView("tvf_vecs")
      val sq = spark.sql("SELECT * FROM graft_sq8_topk(" +
        "'tvf_vecs','id','vec',2,1,4,1)").head()
      assert(sq.getLong(0) === 1L,
        "graft_sq8_topk must return the query's own vector at k=1")

      // cusum: constant series scores 0 under the sigma guard
      Seq(("k", 0L), ("k", 1L), ("k", 2L)).toDF("k", "t")
        .createOrReplaceTempView("tvf_cusum")
      val cu = spark.sql(
        "SELECT * FROM graft_cusum('tvf_cusum','k','t')").collect()
      assert(cu.length === 3 && cu.forall(_.getDouble(3) === 0.0),
        "graft_cusum must emit the zero series for constant counts")
      val cp = spark.sql(
        "SELECT * FROM graft_cusum_peak('tvf_cusum','k','t')").head()
      assert(cp.getLong(1) === 3L && cp.getLong(2) === 0L,
        "graft_cusum_peak must break all-ties to the earliest period")

      // neighbor jaccard: the triangle-plus-tail hand graph
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
        .createOrReplaceTempView("tvf_edges")
      val nj = spark.sql("SELECT * FROM graft_neighbor_jaccard(" +
        "'tvf_edges','a','b')").count()
      assert(nj === 5L,
        "graft_neighbor_jaccard must score the 5 distance-2 pairs")

      // bootstrap: constant values -> every replicate mean is exactly 1
      spark.range(200).toDF("id")
        .withColumn("v", org.apache.spark.sql.functions.lit(1L))
        .createOrReplaceTempView("tvf_boot")
      val bm = spark.sql("SELECT * FROM graft_bootstrap_means(" +
        "'tvf_boot','id','v',4)").collect()
      assert(bm.length === 4 && bm.forall(_.getDouble(2) === 1.0),
        "graft_bootstrap_means must emit B deterministic means")
      val bc = spark.sql("SELECT * FROM graft_bootstrap_ci(" +
        "'tvf_boot','id','v',4,0.1)").head()
      assert(bc.getDouble(1) === 1.0 && bc.getDouble(2) === 1.0 &&
        bc.getDouble(3) === 1.0,
        "graft_bootstrap_ci must bracket the constant mean")

      // class balance: 3 a's and 1 b -> one row per class
      Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b")).toDF("id", "cls")
        .createOrReplaceTempView("tvf_cls")
      val cb = spark.sql("SELECT * FROM graft_class_balance(" +
        "'tvf_cls','cls','id')").collect()
      assert(cb.length === 2 &&
        cb.map(_.getString(1)).sorted.toSeq === Seq("a", "b"),
        "graft_class_balance must keep min-class-count per class")

      // streaming-hll merge: 3 distinct items per key estimate near 3
      Seq(("k", "x"), ("k", "y"), ("k", "z"), ("k", "x"))
        .toDF("k", "item").createOrReplaceTempView("tvf_hll")
      val hs = spark.sql("SELECT * FROM graft_hll_stream_merge(" +
        "'tvf_hll','k','item')").head()
      assert(hs.getLong(1) === 4L && math.abs(hs.getDouble(2) - 3.0) < 0.1,
        "graft_hll_stream_merge must estimate the distinct count")

      // global shuffle: total coverage, contiguous per-shard positions
      spark.range(1, 101).toDF("id")
        .createOrReplaceTempView("tvf_shuffle")
      val gsRows = spark.sql("SELECT * FROM graft_global_shuffle(" +
        "'tvf_shuffle','id','seed-x',4)").collect()
      assert(gsRows.length === 100 &&
        gsRows.map(_.getAs[Int]("shard")).distinct.sorted.toSeq ===
          Seq(0, 1, 2, 3),
        "graft_global_shuffle must cover the corpus across all shards")

      // shuffle-pack: 3-token docs into capacity-6 bins -> 2 docs/bin
      Seq((1L, "a b c"), (2L, "d e f"), (3L, "g h i"), (4L, "j k l"))
        .toDF("id", "text").createOrReplaceTempView("tvf_pack")
      val pk = spark.sql("SELECT * FROM graft_shuffle_pack(" +
        "'tvf_pack','id','text','s',1,6)").collect()
      assert(pk.length === 4 &&
        pk.map(_.getAs[Long]("bin")).sorted.toSeq === Seq(0L, 0L, 1L, 1L),
        "graft_shuffle_pack must fill capacity-6 bins two docs at a time")

      // JSD: identical snapshots -> zero terms
      Seq("en", "es", "en").toDF("lang")
        .createOrReplaceTempView("tvf_js")
      val js = spark.sql("SELECT * FROM graft_js_divergence(" +
        "'tvf_js','tvf_js','lang')").collect()
      assert(js.forall(_.getAs[Double]("js_term") === 0.0),
        "graft_js_divergence of a snapshot with itself must be 0")

      // kappa: the textbook 0.4 hand example
      (Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
        Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n")))
        .toDF("a", "b").createOrReplaceTempView("tvf_kappa")
      val kp = spark.sql(
        "SELECT * FROM graft_kappa('tvf_kappa','a','b')").head()
      assert(kp.getAs[Double]("kappa") === 0.4,
        "graft_kappa must reproduce the 2x2 hand example")

      // fleiss: two 3-rater items at 2-vs-1 splits with opposite
      // majorities -> P_bar = 1/3, P_e = 1/2, kappa = -1/3; the
      // 2-rating item must be dropped by the constant-panel filter
      (Seq(("i1", "y"), ("i1", "y"), ("i1", "n"),
        ("i2", "n"), ("i2", "n"), ("i2", "y"),
        ("i3", "y"), ("i3", "y"))) // only 2 ratings: ineligible
        .toDF("item", "label").createOrReplaceTempView("tvf_fleiss")
      val fl = spark.sql(
        "SELECT * FROM graft_kappa_fleiss('tvf_fleiss','item','label',3)")
        .head()
      assert(fl.getAs[Long]("n_items") === 2L &&
        fl.getAs[Double]("kappa") === -0.333333,
        "graft_kappa_fleiss must reproduce the 2-item hand example " +
          "and drop off-panel items")

      // labeling suite: consensus tie-break, rater accuracy vs it,
      // and alpha = 1 on a perfectly-agreeing two-rating panel
      Seq(("i1", "r1", "y"), ("i1", "r2", "y"),
        ("i2", "r1", "a"), ("i2", "r2", "b")) // tie -> 'a' (label ASC)
        .toDF("item", "rater", "label")
        .createOrReplaceTempView("tvf_label")
      val lc = spark.sql("SELECT * FROM graft_label_consensus(" +
        "'tvf_label','item','label') ORDER BY item").collect()
      assert(lc.map(r => (r.getString(0), r.getString(1))).toSeq ===
        Seq(("i1", "y"), ("i2", "a")),
        "consensus must break ties deterministically on label ASC")
      val ra = spark.sql("SELECT * FROM graft_rater_accuracy(" +
        "'tvf_label','item','rater','label') ORDER BY rater").collect()
      assert(ra.map(_.getAs[Long]("n_match")).toSeq === Seq(2L, 1L),
        "r1 matches both consensus labels, r2 loses the tie")
      val ka = spark.sql("SELECT * FROM graft_kripp_alpha(" +
        "'tvf_label','item','label')").head()
      assert(ka.getAs[Long]("n_units") === 2L,
        "both items are pairable (2 ratings each)")
      val wcons = spark.sql("SELECT * FROM graft_consensus_weighted(" +
        "'tvf_label','item','rater','label') ORDER BY item").collect()
      assert(wcons.map(_.getString(1)).toSeq === Seq("y", "a"),
        "weighted consensus agrees with raw on this panel")

      // mix plan: 3:1 weights over a 1000-token budget
      Seq(("w", "a b c"), ("b", "d")).toDF("src", "text")
        .createOrReplaceTempView("tvf_mix")
      val mp = spark.sql("SELECT * FROM graft_mix_plan(" +
        "'tvf_mix','src','text','w:3,b:1',1000) ORDER BY source")
        .collect()
      assert(mp.map(r => (r.getString(0), r.getLong(4))).toSeq ===
        Seq(("b", 250L), ("w", 750L)),
        "graft_mix_plan must split the budget on normalized weights")
      // duplicate sources in the spec would duplicate join rows and
      // skew every other source's normalization — rejected at parse
      val mpDup = intercept[Exception] {
        spark.sql("SELECT * FROM graft_mix_plan(" +
          "'tvf_mix','src','text','w:3,w:1',1000)").collect()
      }
      assert(mpDup.getMessage.contains("duplicate sources"))

      // chi2: product table -> all-zero terms
      (for { a <- Seq("s1", "s2"); b <- Seq("en", "es") } yield (a, b))
        .toDF("a", "b").createOrReplaceTempView("tvf_chi2")
      val c2 = spark.sql(
        "SELECT * FROM graft_chi2('tvf_chi2','a','b')").collect()
      assert(c2.forall(_.getAs[Double]("chi2_term") === 0.0),
        "graft_chi2 must vanish on a product table")

      // nfc: decomposed e + U+0301 composes to U+00E9 (spark chr() is
      // ASCII-only, so the combining mark is embedded in the literal)
      val nfcRow = spark.sql(
        "SELECT nfc_normalize('é'), nfc_normalize(NULL)")
        .head()
      assert(nfcRow.getString(0) === "é" && nfcRow.isNullAt(1),
        "nfc_normalize must compose and stay null-safe")

      // format_pen: grouping + half-up + null en-dash in one lane
      val pen = spark.sql(
        "SELECT format_pen(1234567.0), format_pen(1200.5), " +
        "format_pen(CAST(NULL AS DOUBLE))").head()
      assert(pen.getString(0) === "S/ 1,234,567" &&
        pen.getString(1) === "S/ 1,201" && pen.getString(2) === "–")

      // video frames: ids 0 (2 frames, stride keeps 1) and 1 (3, keeps 2)
      Seq(0L, 1L).toDF("doc_id").createOrReplaceTempView("tvf_frames")
      val fr = spark.sql("SELECT doc_id, frame_idx FROM graft_video_frames(" +
        "'tvf_frames','doc_id',2,6,6) ORDER BY doc_id, frame_idx").collect()
      assert(fr.map(r => (r.getLong(0), r.getInt(1))).toSeq ===
        Seq((0L, 0), (1L, 0), (1L, 2)),
        "graft_video_frames must walk + stride-sample real GIF frames")

      // image phash: one family of two -> exactly one near-dup pair
      Seq(0L, 1L, 7L).toDF("doc_id").createOrReplaceTempView("tvf_phash")
      val ph = spark.sql("SELECT * FROM graft_image_phash_pairs(" +
        "'tvf_phash','doc_id',2,8)").collect()
      assert(ph.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
        Seq((0L, 1L)),
        "graft_image_phash_pairs must pair the family, not cluster 3")

      // video/audio near-dups: one family of two, cluster 3 stays out
      val vp = spark.sql("SELECT * FROM graft_video_neardups(" +
        "'tvf_phash','doc_id',2,8,2)").collect()
      assert(vp.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
        Seq((0L, 1L)), "graft_video_neardups must pair the family")
      val ap = spark.sql("SELECT * FROM graft_audio_neardups(" +
        "'tvf_phash','doc_id',2,4)").collect()
      assert(ap.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
        Seq((0L, 1L)), "graft_audio_neardups must pair the family")

      // dup weights: 2 copies of {a,b} at 0.5, singleton at 1.0
      Seq((1L, "a b"), (2L, "b a"), (3L, "c")).toDF("doc_id", "text")
        .createOrReplaceTempView("tvf_dupw")
      val dw = spark.sql("SELECT * FROM graft_dup_weights(" +
        "'tvf_dupw','doc_id','text') ORDER BY id").collect()
      assert(dw.map(r => (r.getLong(0), r.getDouble(3))).toSeq ===
        Seq((1L, 0.5), (2L, 0.5), (3L, 1.0)))

      // split by digest: exact copies co-split, percents respected
      val spl = spark.sql("SELECT * FROM graft_split_by_digest(" +
        "'tvf_dupw','doc_id','text',80,10) ORDER BY id").collect()
      assert(spl.length === 3 && spl(0).getString(2) === spl(1).getString(2),
        "identical word sets must land in the same split")

      // kcore: pendant peels, triangle survives
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
        .createOrReplaceTempView("tvf_kcore")
      val kc = spark.sql(
        "SELECT * FROM graft_kcore('tvf_kcore','a','b',2,5)").count()
      assert(kc === 3L, "graft_kcore must keep the triangle only")

      // benford: one positive value -> one digit row
      Seq(321.0).toDF("v").createOrReplaceTempView("tvf_benford")
      val bf = spark.sql(
        "SELECT * FROM graft_benford('tvf_benford','v')").head()
      assert(bf.getInt(0) === 3 && bf.getDouble(2) === 1.0,
        "graft_benford must read the first significant digit")

      // holt: constant per-period counts -> zero trend
      Seq(("k", 0L), ("k", 1L), ("k", 2L)).toDF("k", "t")
        .createOrReplaceTempView("tvf_holt")
      val ho = spark.sql(
        "SELECT * FROM graft_holt('tvf_holt','k','t')").head()
      assert(ho.getDouble(2) === 1.0 && ho.getDouble(3) === 0.0,
        "graft_holt must smooth the constant series flat")

      // moments: the two-point distribution has kurtosis exactly -2
      Seq(("m", -1.0), ("m", 1.0)).toDF("k", "v")
        .createOrReplaceTempView("tvf_moments")
      val mo = spark.sql(
        "SELECT * FROM graft_moments('tvf_moments','k','v')").head()
      assert(mo.getDouble(3) === 0.0 && mo.getDouble(4) === -2.0,
        "graft_moments must compute the shape moments")

      // exact-substr dedup
      Seq((1L, "x" * 2 + "SHAREDRUNTWELVE" + "y" * 2),
        (2L, "a" * 3 + "SHAREDRUNTWELVE" + "b"))
        .toDF("doc_id", "text").createOrReplaceTempView("tvf_substr")
      val sqlSub = spark.sql(
        "SELECT * FROM graft_exact_substr('tvf_substr','doc_id','text',10)")
      val apiSub = graft.textanalysis.TextAnalysis.exactSubstrDedup(
        spark.table("tvf_substr"), "doc_id", "text", 10)
      // row identity: cutMarkedGrams pins the gram stream (r19)
      assert(rows(sqlSub) === rows(apiSub),
        "graft_exact_substr must compute exactSubstrDedup")
      assert(sqlSub.where(col("doc_id") === 2L).head().getLong(2) === 15L,
        "doc 2's shared run must cut")

      // jpeg dhash: every row's hash replays the fixture formula
      val sqlJpeg = spark.sql(
        "SELECT * FROM graft_jpeg_dhash('tvf_dupw','doc_id',0.9)")
      assert(sqlJpeg.collect().forall(r => r.getLong(3) ===
        graft.multimodal.Multimodal.testJpegDHash(r.getLong(0))),
        "graft_jpeg_dhash must land the real-decode dHash")

      // streaming ccnet twin: localCheckpoint-backed plan, value check
      Seq((1L, "a a b", "en"), (2L, "a b c", "en"), (3L, "c c c", "en"),
        (4L, "x y", "es"), (5L, "x x", "es"), (6L, "y y y", "es"))
        .toDF("doc_id", "text", "lang")
        .createOrReplaceTempView("tvf_ccnet")
      val sqlCc = spark.sql("SELECT * FROM graft_ccnet_stream_buckets(" +
        "'tvf_ccnet','doc_id','text','lang')")
      assert(sqlCc.agg(org.apache.spark.sql.functions.sum("n_docs"))
        .head().getLong(0) === 6L,
        "every doc must land in exactly one sketch-cut bucket")

      // importance sample: plans to gumbelTopK over the weights frame
      Seq((1L, 1000000L), (2L, -500000L), (3L, 2000000L))
        .toDF("id", "logw_ppm").createOrReplaceTempView("tvf_weights")
      val sqlImp = spark.sql(
        "SELECT * FROM graft_importance_sample('tvf_weights',2,1000000)")
      val apiImp = graft.operators.Dsir.gumbelTopK(
        spark.table("tvf_weights"), k = 2, tauPpm = 1000000L)
      assert(sqlImp.queryExecution.optimizedPlan
        .sameResult(apiImp.queryExecution.optimizedPlan),
        "graft_importance_sample must plan to Dsir.gumbelTopK")
      assert(sqlImp.count() === 2L)

      // curriculum: interleave pins its banded frame with an eager
      // localCheckpoint, so the TVF plan is data-backed (LogicalRDD) —
      // value check, not sameResult (the graft_exact_quantiles
      // precedent above)
      Seq.tabulate(8)(i => (i.toLong, i * 1.0)).toDF("doc_id", "diff")
        .createOrReplaceTempView("tvf_curr")
      val sqlCur = spark.sql(
        "SELECT * FROM graft_curriculum('tvf_curr','diff',2)")
      val apiCur = graft.operators.Curriculum.interleave(
        spark.table("tvf_curr"), "diff", 2)
      def currRows(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_id", "band", "within_pct").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
          .sortBy(_._1).toSeq
      assert(currRows(sqlCur) === currRows(apiCur),
        "graft_curriculum must land Curriculum.interleave's schedule")
      assert(sqlCur.groupBy("band").count().collect()
        .map(r => (r.getInt(0), r.getLong(1))).toMap
        === Map(0 -> 4L, 1 -> 4L))

      // winnowed exact-substr: output-identical to the full-chain TVF
      val sqlSubMin = spark.sql("SELECT * FROM graft_exact_substr_min(" +
        "'tvf_substr','doc_id','text',10,4)")
      def subRows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toString).sorted.toSeq
      assert(subRows(sqlSubMin) === subRows(sqlSub),
        "graft_exact_substr_min must equal graft_exact_substr")

      // tolerant jpeg: intact ids replay the formula, corrupt ids null
      val sqlJpegTol = spark.sql("SELECT * FROM graft_jpeg_dhash_tolerant(" +
        "'tvf_dupw','doc_id',0.9)")
      assert(sqlJpegTol.collect().forall { r =>
        val id = r.getLong(0)
        if (id % 4 == 0)
          r.getBoolean(1) && r.getLong(4) ===
            graft.multimodal.Multimodal.testJpegDHash(id)
        else !r.getBoolean(1) && r.isNullAt(2) && r.isNullAt(3) &&
          r.isNullAt(4)
      }, "graft_jpeg_dhash_tolerant must null corrupt rows only")

      // misuse: non-literal / wrong-arity calls fail at analysis with
      // the builder's message, not a planner crash
      intercept[Exception] {
        spark.sql("SELECT * FROM graft_minhash_keep('tvf_docs','doc_id')")
          .head()
      }
    } finally {
      prevActive.foreach(SparkSession.setActiveSession)
      prevDefault.foreach(SparkSession.setDefaultSession)
      if (prevActive.isEmpty) SparkSession.clearActiveSession()
      if (prevDefault.isEmpty) SparkSession.clearDefaultSession()
    }
  }

  // Note: the `spark.sql.extensions` CONFIG-string route cannot be
  // exercised under the shared test context — getOrCreate resolves that
  // static conf from the SparkContext created by the first suite, not
  // from the builder options. The withExtensions test above drives the
  // same applyExtensions path the config route uses.
}
