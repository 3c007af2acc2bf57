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

  test("theta set estimates: exact below k, within ~3 sigma above") {
    // A = 1..600, B = 401..1100: |A|=600, |B|=700, inter=200, union=1100
    val rows = (1 to 600).map(i => ("a", s"u$i")) ++ (401 to 1100).map(i => ("b", s"u$i"))
    val df = rows.toDF("g", "v")
    // k large enough that both sides are exact
    val skBig = Kmv.sketch(df, Seq("g"), col("v"), 2048)
    val exact = Kmv.thetaSetEstimates(skBig, "g", "a", "b", 2048)
      .select("union_est", "inter_est").head
    assert(exact.getDouble(0) === 1100.0 && exact.getDouble(1) === 200.0)
    // k = 256: sampled regime; union within ~3/sqrt(k) relative,
    // intersection looser (its variance scales with union/inter ratio)
    val sk = Kmv.sketch(df, Seq("g"), col("v"), 256)
    val est = Kmv.thetaSetEstimates(sk, "g", "a", "b", 256)
      .select("union_est", "inter_est").head
    assert(math.abs(est.getDouble(0) - 1100) / 1100.0 < 0.2,
      s"union_est=${est.getDouble(0)}")
    assert(math.abs(est.getDouble(1) - 200) / 200.0 < 0.5,
      s"inter_est=${est.getDouble(1)}")
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
