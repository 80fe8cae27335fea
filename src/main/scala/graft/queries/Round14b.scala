package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.GlobalShuffle

/** Round-14 operator batch: seeded global shuffle + shard assignment —
  * the reproducible-ordering stage the sampling family feeds into
  * (deterministic splits → mixture → balance → SHUFFLE+SHARD → write).
  */
object Round14b {

  private val Seed = "s14"
  private val NShards = 16

  val defs: Map[String, Q] = Map(

    // the full shuffle contract: md5(seed|id) sort key, hash-mod shard,
    // per-shard 1-based position — DuckDB replays the key, the shard
    // and the order byte-for-byte
    "sample_global_shuffle" -> ((s, dir) =>
      GlobalShuffle.shuffle(tbl(s, dir, "documents"), col("doc_id"),
          Seed, NShards)
        .select(col("shard"), col("pos"), col("id").as("doc_id"),
          col("sort_key"))
        .orderBy("shard", "pos")))

  val oracles: Map[String, String] = Map(

    "sample_global_shuffle" ->
      s"""WITH h AS (SELECT doc_id,
             md5('$Seed' || '|' || doc_id::VARCHAR) AS sort_key
           FROM documents WHERE doc_id IS NOT NULL),
         s AS (SELECT doc_id, sort_key,
             (CAST(('0x' || substr(sort_key, 1, 8)) AS BIGINT)
               % $NShards)::INT AS shard
           FROM h)
         SELECT shard,
           row_number() OVER (PARTITION BY shard
             ORDER BY sort_key, doc_id)::BIGINT AS pos,
           doc_id, sort_key
         FROM s ORDER BY shard, pos""")
}
