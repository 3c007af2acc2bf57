package graft.functions

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Independent ground truth: plain driver-side union-find. */
  private def unionFind(n: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(n.map(x => x -> x): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    n.map(x => x -> find(x)).toMap
  }

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("components match union-find on a multi-component graph") {
    // two merged clusters + an isolated pair + a triangle with a tail
    val edges = Seq[(Long, Long)](
      (2L, 7L), (7L, 4L), (9L, 2L),          // {2,4,7,9} via chains
      (11L, 12L),                            // {11,12}
      (20L, 21L), (21L, 22L), (22L, 20L), (22L, 23L)) // triangle + tail
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    assert(cc(edges) == unionFind(nodes, edges))
  }

  test("a long duplicate chain converges (star contraction, not O(diameter))") {
    // path 1-2-3-...-60: min-label propagation would need ~60 rounds;
    // large/small-star must fold it well inside maxIterations
    val chain = (1L until 60L).map(i => (i + 1, i))
    val labels = cc(chain)
    assert(labels.size == 60 && labels.values.forall(_ == 1L))
  }

  test("labels are deterministic under input order and self-loop/dup noise") {
    val edges = Seq[(Long, Long)]((5L, 3L), (3L, 8L), (8L, 5L), (10L, 14L))
    val noisy = (edges ++ edges.map(_.swap) ++ Seq((3L, 3L))).reverse
    assert(cc(noisy) == cc(edges))
    assert(cc(edges) == Map(3L -> 3L, 5L -> 3L, 8L -> 3L, 10L -> 10L, 14L -> 10L))
  }

  test("roots label themselves and singletons are absent") {
    val labels = cc(Seq((4L, 2L)))
    assert(labels == Map(2L -> 2L, 4L -> 2L)) // node 2 is its own root
    assert(!labels.contains(99L))
  }

  test("totalComponents labels edge-untouched nodes as their own singleton cluster") {
    val nodes = Seq(1L, 2L, 3L, 4L, 99L).toDF("id")
    val edges = Seq((2L, 1L), (3L, 2L)).toDF("a", "b")
    val labels = Components.totalComponents(nodes, "id", edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 99L -> 99L))
  }

  test("a 500-node chain folds in O(log^2 n) rounds under the one-aggregate fixpoint check") {
    // diameter 500: label propagation would need ~500 rounds; the
    // contraction with the (count, xor-of-hashes) convergence witness
    // must still fold it in well under 20
    val chain = (1L until 500L).map(i => (i + 1, i)).toDF("a", "b")
    val (labels, rounds) =
      Components.connectedComponentsWithRounds(chain, "a", "b")
    val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 500 && out.values.forall(_ == 1L))
    assert(rounds <= 20, s"chain took $rounds rounds — contraction is not diameter-independent")
  }
}
