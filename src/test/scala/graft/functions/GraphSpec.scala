package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(String, String, Long)], iters: Int): Map[String, Double] =
    Graph.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w", iters)
      .as[(String, Double)].collect().toMap

  test("uniform cycle stays uniform at every iteration count") {
    // a -> b -> c -> a, equal weights: the stationary distribution is
    // uniform and PageRank must preserve it exactly from iteration 1
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
    for (it <- Seq(1, 3)) {
      val r = ranksOf(edges, it)
      assert(r.keySet === Set("a", "b", "c"))
      r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
    }
  }

  test("matches a hand-rolled driver-side power iteration") {
    val edges = Seq(
      ("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L),
      ("c", "a", 1L), ("d", "a", 5L)) // d is a source-only node
    val got = ranksOf(edges, 3)
    // reference: dense power iteration with the same dangling-drop rule
    val nodes = Seq("a", "b", "c", "d")
    val outW = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var rank = nodes.map(_ -> 1.0 / 4).toMap
    for (_ <- 1 to 3) {
      val in = nodes.map { n =>
        n -> edges.filter(_._2 == n)
          .map { case (s, _, w) => rank(s) * w.toDouble / outW(s).toDouble }.sum
      }.toMap
      rank = nodes.map(n => n -> ((1 - 0.85) / 4 + 0.85 * in(n))).toMap
    }
    assert(got.keySet === nodes.toSet)
    nodes.foreach(n => assert(math.abs(got(n) - rank(n)) < 1e-12, s"node $n"))
  }

  test("ranks are positive and a heavier-in-linked node outranks a lighter one") {
    val edges = Seq(("a", "hub", 9L), ("a", "leaf", 1L), ("b", "hub", 9L),
      ("b", "leaf", 1L), ("hub", "a", 1L), ("leaf", "b", 1L))
    val r = ranksOf(edges, 5)
    assert(r.values.forall(_ > 0))
    assert(r("hub") > r("leaf"))
  }
}
