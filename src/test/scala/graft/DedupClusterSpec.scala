package graft.operators

import graft.{SparkEntry, SparkSpec}

/** d12: connected components by min-label propagation — the transitive
  * closure step pairwise LSH dedup is missing (A~B, B~C ⇒ {A,B,C} one
  * cluster even when A!~C directly). */
class DedupClusterSpec extends SparkSpec {
  import spark.implicits._

  private def components(pairs: (Long, Long)*): Map[Long, Long] =
    DedupOps
      .connectedComponents(pairs.toSeq.toDF("d1", "d2"))
      .as[(Long, Long)].collect().toMap

  test("a chain collapses to one cluster labelled by its min id") {
    // 1-2, 2-3, 3-4: no direct 1-4 pair, yet one component.
    val got = components((1L, 2L), (2L, 3L), (3L, 4L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint components keep distinct min labels") {
    val got = components((10L, 11L), (20L, 21L), (21L, 22L))
    assert(got == Map(10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("a long path converges within the round budget (diameter rounds)") {
    // path 0-1-2-...-9: diameter 9, worst case for label propagation.
    val path = (0L until 9L).map(i => (i, i + 1))
    val got = components(path: _*)
    assert(got.values.toSet == Set(0L))
    assert(got.size == 10)
  }

  test("pointer jumping converges a 200-node chain in O(log d) rounds") {
    // diameter 199 — plain neighbour-min propagation needs 199 rounds and
    // would throw past the default 20; label-of-label shortcutting
    // squares the reach per round, so this converges in ~8.
    val path = (0L until 199L).map(i => (i, i + 1))
    val got = components(path: _*)
    assert(got.size == 200)
    assert(got.values.toSet == Set(0L), "the whole chain collapses to min id 0")
  }

  test("d12 maps singleton docs to themselves") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("d12_dedup_clusters")(spark, dir)
      .as[(Long, Long)].collect()
    assert(out.nonEmpty)
    // every cluster label is <= its member (min-id canonical)
    assert(out.forall { case (doc, cl) => cl <= doc })
    // at least one doc is its own canonical
    assert(out.exists { case (doc, cl) => cl == doc })
  }
}
