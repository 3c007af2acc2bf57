package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def estimate(n: Int, k: Int): Double = {
    val df = (1 to n).map(i => ("g", s"v$i")).toDF("g", "v")
    val sk = Kmv.sketch(df, Seq("g"), col("v"), k)
    Kmv.distinctEstimate(sk, Seq("g"), k).select(col("distinct_est")).head.getDouble(0)
  }

  test("exact below k, within ~3/sqrt(k) above") {
    assert(estimate(300, 512) === 300.0) // sketch not full -> exact
    for (n <- Seq(5000, 50000)) {
      val est = estimate(n, 512)
      val err = math.abs(est - n) / n
      assert(err < 0.14, s"n=$n est=$est err=$err") // ~3 sigma at k=512
    }
  }

  test("duplicates don't change the sketch") {
    val base = (1 to 2000).map(i => ("g", s"v$i"))
    val dup = base ++ base ++ base
    val a = Kmv.sketch(base.toDF("g", "v"), Seq("g"), col("v"), 256)
      .select("h").as[Long].collect().sorted.toSeq
    val b = Kmv.sketch(dup.toDF("g", "v"), Seq("g"), col("v"), 256)
      .select("h").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("merge = re-take bottom-k of the shard union") {
    val a = (1 to 3000).map(i => ("g", s"v$i")).toDF("g", "v")
    val b = (2000 to 7000).map(i => ("g", s"v$i")).toDF("g", "v")
    val k = 128
    val merged = Kmv.sketch(a, Seq("g"), col("v"), k)
      .select("g", "v").union(Kmv.sketch(b, Seq("g"), col("v"), k).select("g", "v"))
    val remin = Kmv.sketch(merged, Seq("g"), col("v"), k)
      .select("h").as[Long].collect().sorted.toSeq
    val direct = Kmv.sketch(a.union(b), Seq("g"), col("v"), k)
      .select("h").as[Long].collect().sorted.toSeq
    assert(remin === direct)
  }
}
