package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LloydSpec extends SparkSpec {
  import spark.implicits._

  test("fitDistributed recovers planted bands with exact sizes, any partitioning") {
    // three integer bands far apart; init = 3 lowest ids (one per band
    // by construction of the ids)
    val rows = (0 until 300).map { i =>
      val band = i % 3
      (i.toLong, band * 1000L + i % 5, band * 500L + i % 7)
    }
    for (parts <- Seq(1, 4, 32)) {
      val df = rows.toDF("id", "x1", "x2").repartition(parts)
      val out = Lloyd.fitDistributed(df, "id", Seq("x1", "x2"), k = 3, iters = 3)
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      assert(out.map(_._2).toSeq == Seq(100L, 100L, 100L), s"parts=$parts sizes")
    }
  }

  test("fitDistributed: a centroid that captures nothing disappears, k shrinks") {
    // ids 0 and 1 carry IDENTICAL features -> init centroids 0 and 1
    // coincide, ties all break to cluster 0, cluster 1 empties after
    // the first assignment and must vanish from the output
    val rows = Seq((0L, 10L, 10L), (1L, 10L, 10L)) ++
      (2 until 50).map(i => (i.toLong, 10L + i % 3, 10L + i % 2))
    val out = Lloyd.fitDistributed(rows.toDF("id", "x1", "x2"),
      "id", Seq("x1", "x2"), k = 2, iters = 2).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(0))
    assert(out.head.getLong(1) == 50L)
  }
}
