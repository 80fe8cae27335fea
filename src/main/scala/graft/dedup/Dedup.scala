package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All operators are shuffle-conscious: exact dedup is a single hash
  * aggregation on a digest key; MinHash/LSH shuffles once on band buckets
  * (the canonical near-dup join at scale — candidates are generated
  * per-bucket, never all-pairs); SimHash is computed in a single map pass
  * with no shuffle at all.
  */
object Dedup {

  /** Canonical word-set of a text column (order- and dup-insensitive). */
  def wordSet(text: Column): Column =
    array_distinct(split(trim(text), "\\s+"))

  /** Stable digest of the canonical word-set — the exact-dedup key. */
  def wordSetKey(text: Column): Column =
    md5(array_join(array_sort(wordSet(text)), " "))

  /** Word-level Jaccard similarity of two token-set columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Exact dedup: one representative (min id) + multiplicity per digest.
    * Map-side partial aggregation makes this a single cheap shuffle even
    * at 100 TB: the shuffled payload is (digest, partial min, partial n).
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(wordSetKey(col(textCol)).as("dedup_key"), col(idCol))
      .groupBy("dedup_key")
      .agg(min(idCol).as("first_id"), count(lit(1)).as("n_docs"))

  // ---------------- MinHash + LSH ----------------

  /** numHashes minhash values; hash family = xxhash64(shingle, seed=i). */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingles, x => xxhash64(x, lit(i))))
    }: _*)

  /** One hash per band over the signature slice (bands x rows = numHashes). */
  def bandHashes(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(array_join(slice(sig, b * rows + 1, rows), "_"), lit(b))
    }: _*)

  /** LSH candidate pairs: documents sharing at least one band bucket.
    * The self-join is keyed on (band, bucket) — a hash-partitioned join
    * whose cost scales with bucket occupancy, not n^2.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val rows = numHashes / bands
    // persisted: the band table feeds both sides of the self-join — at
    // corpus scale this is the "materialize the signature table" stage
    val sigs = df
      .withColumn("__sh", wordSet(col(textCol)))
      .withColumn("__sig", minhashSignature(col("__sh"), numHashes))
      .withColumn("__bands", bandHashes(col("__sig"), bands, rows))
      .select(col(idCol), posexplode(col("__bands")).as(Seq("band", "bucket")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = sigs.toDF(s"${idCol}_a", "band", "bucket")
    val b = sigs.toDF(s"${idCol}_b", "band_b", "bucket_b")
    a.join(b, a("band") === b("band_b") && a("bucket") === b("bucket_b")
        && a(s"${idCol}_a") < b(s"${idCol}_b"))
      .select(s"${idCol}_a", s"${idCol}_b")
      .distinct()
  }

  /** MinHash near-dup pairs, verified with the true Jaccard similarity. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double, numHashes: Int = 64,
                      bands: Int = 16): DataFrame = {
    val cand = minhashCandidates(df, idCol, textCol, numHashes, bands)
    // the candidate-pair table dwarfs the doc table: broadcast the sets so
    // the (potentially huge) pair stream never shuffles for the lookups
    val sets = df.select(col(idCol), wordSet(col(textCol)).as("__set"))
    cand
      .join(broadcast(sets.toDF(s"${idCol}_a", "__set_a")), Seq(s"${idCol}_a"))
      .join(broadcast(sets.toDF(s"${idCol}_b", "__set_b")), Seq(s"${idCol}_b"))
      .withColumn("jaccard", jaccard(col("__set_a"), col("__set_b")))
      .filter(col("jaccard") >= threshold)
      .select(col(s"${idCol}_a"), col(s"${idCol}_b"),
        round(col("jaccard"), 3).as("jaccard"))
  }

  /** Single-pass LSH dedup decision: each doc's representative is the
    * smallest id sharing any of its band buckets (self included). O(n)
    * output — the scalable alternative to materializing all near-dup
    * pairs. One groupBy per bucket + one join back; not transitively
    * closed (a chain a~b~c may keep b), which is the standard trade for
    * one-pass dedup at corpus scale.
    */
  def minhashRepresentatives(df: DataFrame, idCol: String, textCol: String,
                             numHashes: Int = 64, bands: Int = 8): DataFrame = {
    val rows = numHashes / bands
    val bandRows = df
      .withColumn("__sh", wordSet(col(textCol)))
      .withColumn("__sig", minhashSignature(col("__sh"), numHashes))
      .withColumn("__bands", bandHashes(col("__sig"), bands, rows))
      .select(col(idCol), posexplode(col("__bands")).as(Seq("band", "bucket")))
    // per-bucket min via a window, not a groupBy+join-back: signatures are
    // computed once and the data shuffles once (on the bucket key)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")
    bandRows.withColumn("__bucket_min", min(idCol).over(w))
      .groupBy(idCol)
      .agg(min("__bucket_min").as("rep_id"))
      .withColumn("is_kept", col(idCol) === col("rep_id"))
  }

  // ---------------- SimHash ----------------

  /** 64-bit SimHash computed in one pass per row (no shuffle): per-word
    * xxhash64, each bit votes +1/-1, final bit = sign of the vote sum.
    * SQL lambdas keep the hash per word evaluated once.
    */
  def withSimHash(df: DataFrame, textCol: String, out: String): DataFrame = {
    val votes = expr(
      s"""aggregate(
            transform(split(trim($textCol), '\\\\s+'), w -> xxhash64(w)),
            array_repeat(0L, 64),
            (acc, h) -> zip_with(acc,
              transform(sequence(0, 63), i -> IF(((h >> i) & 1) = 1, 1L, -1L)),
              (a, b) -> a + b))""")
    val bitsFromVotes = (0 until 64).map { i =>
      when(element_at(col("__votes"), i + 1) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.withColumn("__votes", votes)
      .withColumn(out, bitsFromVotes)
      .drop("__votes")
  }

  /** SimHash near-dup pairs: block on the high 16 bits (single shuffle),
    * then verify hamming distance <= maxHamming within each block.
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 8): DataFrame = {
    val hashed = withSimHash(df, textCol, "simhash")
      .withColumn("block", shiftrightunsigned(col("simhash"), 48))
      .select(idCol, "simhash", "block")
    val a = hashed.toDF(s"${idCol}_a", "sim_a", "block")
    val b = hashed.toDF(s"${idCol}_b", "sim_b", "block_b")
    a.join(b, a("block") === b("block_b") && a(s"${idCol}_a") < b(s"${idCol}_b"))
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(s"${idCol}_a", s"${idCol}_b", "hamming")
  }

  /** Exact windowed n-gram-Jaccard pairs (deterministic; oracle-friendly):
    * candidate blocking = id distance <= window, then true Jaccard filter.
    * The blocked join is a range join on ids — at scale, replace the window
    * with MinHash banding above; this variant exists for exact verification.
    */
  def jaccardPairsWindowed(df: DataFrame, idCol: String, textCol: String,
                           window: Int, threshold: Double): DataFrame = {
    // A raw range join (id_b <= id_a + window) plans as a nested-loop over
    // all n^2 pairs. Blocking on floor(id/window) turns it into a hash
    // equi-join: a partner within `window` lives in the same or the next
    // id-block, so the left side probes exactly two block keys.
    val sets = df.select(col(idCol), wordSet(col(textCol)).as("__set"))
    val a = sets.toDF("id_a", "__set_a")
      .withColumn("__blk", explode(array(floor(col("id_a") / window),
        floor(col("id_a") / window) + 1)))
    val b = sets.toDF("id_b", "__set_b")
      .withColumn("__blk", floor(col("id_b") / window))
    a.join(b, Seq("__blk"))
      .filter(col("id_b") > col("id_a") && col("id_b") <= col("id_a") + window)
      .withColumn("jaccard", jaccard(col("__set_a"), col("__set_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 3).as("jaccard"))
  }
}
