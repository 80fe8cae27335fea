package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the bench harness's gate-selection knobs: the i/n shards
  * must PARTITION the suite (disjoint, complete, re-invocation-stable)
  * so a time-capped harness can split a run and merge the per-shard
  * `queries` maps without loss or double-timing. */
class BenchShardSpec extends AnyFunSuite {

  private val names = Seq("q_d", "q_b", "q_a", "q_c", "q_e")

  test("shards partition the sorted suite: disjoint, complete, stable") {
    val n = 3
    val shards = (0 until n).map(i =>
      Bench.selectGates(names, None, Some((i, n))))
    assert(shards.flatten.sorted === names.sorted, "complete")
    assert(shards.flatten.distinct.size === names.size, "disjoint")
    // stability: shuffled input yields the same slices (selection
    // sorts first)
    val again = (0 until n).map(i =>
      Bench.selectGates(scala.util.Random.shuffle(names), None,
        Some((i, n))))
    assert(again === shards)
  }

  test("name filter composes with sharding (filter first, then slice)") {
    val only = Some(Set("q_a", "q_c", "q_e"))
    val s0 = Bench.selectGates(names, only, Some((0, 2)))
    val s1 = Bench.selectGates(names, only, Some((1, 2)))
    assert((s0 ++ s1).sorted === Seq("q_a", "q_c", "q_e"))
    assert(s0 === Seq("q_a", "q_e") && s1 === Seq("q_c"))
  }

  test("no shard, no filter: the full sorted suite") {
    assert(Bench.selectGates(names, None, None) ===
      Seq("q_a", "q_b", "q_c", "q_d", "q_e"))
  }

  test("shard parse: 0 <= i < n enforced, malformed rejected") {
    assert(Bench.parseShard("2/8") === ((2, 8)))
    assert(Bench.parseShard(" 0/1 ".trim) === ((0, 1)))
    intercept[IllegalArgumentException](Bench.parseShard("8/8"))
    intercept[IllegalArgumentException](Bench.parseShard("-1/4"))
    intercept[Exception](Bench.parseShard("nonsense"))
  }
}
