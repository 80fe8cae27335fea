package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peeling — the standard graph-density filter (Seidman 1983):
  * repeatedly drop nodes with degree < k; what survives is the k-core,
  * the maximal subgraph where every node keeps ≥ k neighbors. On a
  * near-dup or interaction graph this isolates the dense clusters
  * (template families, bot rings) from incidental pairs.
  *
  * Synchronous rounds, each ONE grouped degree count + two hash
  * semi-joins (drop edges touching a peeled endpoint) — no windows,
  * no driver-side graph. Rounds are deterministic, so a fixed-round
  * run replays exactly on any engine (the gate's contract, like
  * `graph_label_prop`); at fixpoint the result IS the k-core, and
  * `peel` stops early when a round removes nothing. Lineage truncates
  * per round (`localCheckpoint`) exactly like the components loop —
  * at cluster scale a reliable checkpoint. Output: the surviving
  * nodes with their in-core degree. */
object KCore {
  def peel(edges: DataFrame, aCol: String, bCol: String, k: Int,
           rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"k and rounds positive ($k, $rounds)")
    val e = edges.where(col(aCol).isNotNull && col(bCol).isNotNull &&
      col(aCol) =!= col(bCol))
    var und = e.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(e.select(col(bCol).as("u"), col(aCol).as("v")))
      .distinct()
      .localCheckpoint()
    var r = 0
    var done = false
    // ONE action per peel round: the previous round's edge count is
    // carried in a local (the initial count rides the checkpoint that
    // just materialized `und`), so each round pays exactly one job
    var prevCount = und.count()
    while (r < rounds && !done) {
      val keep = und.groupBy("u").agg(count(lit(1)).as("__d"))
        .where(col("__d") >= k)
        .select("u")
      und = und
        .join(keep, Seq("u"), "left_semi")
        .join(keep.toDF("v"), Seq("v"), "left_semi")
        .select("u", "v")
        .localCheckpoint()
      val after = und.count()
      done = after == prevCount
      prevCount = after
      r += 1
    }
    und.groupBy(col("u").as("node"))
      .agg(count(lit(1)).as("degree"))
  }
}
