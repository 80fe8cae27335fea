package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighbor-set Jaccard over distance-2 node pairs — the classic
  * link-prediction / shared-neighbor similarity score (the SNN-graph
  * building block): for every pair of nodes with at least one common
  * neighbor, `|N(a) ∩ N(b)| / |N(a) ∪ N(b)|`.
  *
  * Shape — never materializes neighbor SETS per node and never goes
  * all-pairs: the intersection size comes out of the oriented wedge
  * join ((w,a) ⋈ (w,b) on the common neighbor w, a < b — each common
  * neighbor contributes exactly one wedge, two hash joins total, the
  * same frame as `graph_triangles`), and the union size is
  * inclusion–exclusion off the per-node degree table
  * (deg(a) + deg(b) − cn). Candidate pairs are exactly the wedge
  * outputs, so the work scales with Σ_w deg(w)² — the true wedge
  * count — not |V|². All counts are exact longs; the ratio is one
  * IEEE division, floor-rounded at 1e-6.
  *
  * Input: one row per undirected edge (any orientation; duplicates
  * and self-loops are dropped). Output: (id_a, id_b, common, jaccard),
  * id_a < id_b. */
object NeighborJaccard {
  def pairs(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges
      .where(col(aCol).isNotNull && col(bCol).isNotNull &&
        col(aCol) =!= col(bCol))
    val und = e.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(e.select(col(bCol).as("u"), col(aCol).as("v")))
      .distinct()
    val deg = und.groupBy(col("u").as("node"))
      .agg(count(lit(1)).as("deg"))
    val wedges = und.toDF("w", "a").join(und.toDF("w", "b"), "w")
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
    wedges
      .join(deg.toDF("a", "__da"), "a")
      .join(deg.toDF("b", "__db"), "b")
      .select(col("a").as("id_a"), col("b").as("id_b"), col("common"),
        (floor(col("common").cast("double") /
          (col("__da") + col("__db") - col("common")).cast("double") *
          1e6 + 0.5) / 1e6).as("jaccard"))
  }
}
