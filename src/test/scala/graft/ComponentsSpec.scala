package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Connected components over near-dup pairs: transitive closure
  * semantics (chains group), isolated nodes keep singleton groups,
  * pointer doubling converges on long chains well inside the round
  * budget, and the distributed answer matches a driver-side union-find
  * on randomized graphs.
  */
class ComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)], nodes: Seq[Long]) =
    Dedup.connectedComponents(
      pairs.toDF("a", "b"), "a", "b", nodes.toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chains close transitively; isolated nodes stay singletons") {
    // a~b, b~c but never a~c — exactly the case one-pass representatives
    // trade away; components must still group all three
    val got = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L)), Seq(1L, 2L, 3L, 10L, 11L, 99L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      99L -> 99L))
  }

  test("cycles and duplicate/reversed pairs are harmless") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (1L, 2L)),
      Seq(1L, 2L, 3L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("a 60-node chain converges (pointer doubling, not O(diameter))") {
    // plain neighbor propagation would need 60 rounds > maxIters=25;
    // label-of-label shortcutting closes it in O(log 60) ≈ 6
    val n = 60L
    val pairs = (0L until n - 1).map(i => (i, i + 1))
    val got = cc(pairs, 0L until n)
    assert(got.values.toSet === Set(0L))
  }

  test("reliable-checkpoint mode matches localCheckpoint labels") {
    // the 100 TB fault-tolerance path: same fixpoint, lineage truncated
    // into a (reliable) checkpoint dir instead of executor-local blocks
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val nodes = (1L to 8L).toDF("id")
    val reliable = Dedup.connectedComponents(pairs, "a", "b", nodes, "id",
        checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = Dedup.connectedComponents(pairs, "a", "b", nodes, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable === local)
    assert(reliable === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L,
      6L -> 5L, 4L -> 4L, 7L -> 7L, 8L -> 8L))
    // the reliable files actually landed (checkpoint() really engaged)
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(wrote > 0, "no checkpoint files written — reliable mode inert")
  }

  test("matches a driver-side union-find on randomized graphs (seeded)") {
    val rnd = new scala.util.Random(7)
    (0 until 3).foreach { trial =>
      val n = 40
      val nodes = (0L until n.toLong)
      val pairs = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // reference union-find
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = nodes.map(i => i ->
        nodes.filter(j => find(j.toInt) == find(i.toInt)).min).toMap
      assert(cc(pairs, nodes) === expected, s"trial $trial")
    }
  }
}
