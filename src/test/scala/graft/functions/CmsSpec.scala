package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CmsSpec extends SparkSpec {
  import spark.implicits._

  private def toDFcol(items: Seq[String]) = items.toDF("t")

  test("estimates never underestimate and are exact for dominant items") {
    // zipf-ish stream: 'hot' appears 5000 times among 2000 distinct cold keys
    val stream = Seq.fill(5000)("hot") ++ (1 to 2000).map(i => s"cold$i")
    val sk = Cms.sketch(toDFcol(stream), col("t"))
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val queried = Seq("hot", "cold1", "cold2", "absent")
    val est = Cms.estimate(sk, queried.toDF("t"), "t")
      .as[(String, Long)].collect().toMap
    queried.foreach { t =>
      assert(est(t) >= exact.getOrElse(t, 0L), s"underestimate for $t")
    }
    // overestimate bound: eps*N with eps = e/w; generous 4x slack for d=4
    val bound = (math.E / Cms.W * stream.size).ceil.toLong * 4
    queried.foreach { t =>
      assert(est(t) - exact.getOrElse(t, 0L) <= bound, s"wildly off for $t: ${est(t)}")
    }
  }

  test("sum-merged shard sketches equal the sketch of the concatenated stream") {
    val a = (1 to 1500).map(i => s"k${i % 97}")
    val b = (1 to 2500).map(i => s"k${i % 193}")
    val merged = Cms.sketch(toDFcol(a), col("t")).union(Cms.sketch(toDFcol(b), col("t")))
      .groupBy(col("j"), col("bucket")).agg(sum(col("c")).as("c"))
      .orderBy(col("j"), col("bucket")).as[(Int, Long, Long)].collect().toSeq
    val direct = Cms.sketch(toDFcol(a ++ b), col("t"))
      .orderBy(col("j"), col("bucket")).as[(Int, Long, Long)].collect().toSeq
    assert(merged === direct)
  }
}
