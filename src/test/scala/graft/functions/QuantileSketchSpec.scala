package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val Qs = Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))

  /** Exact nearest-rank quantile of a sorted sequence. */
  private def exactQ(sorted: IndexedSeq[Double], num: Int, den: Int): Double = {
    val rank = (num.toLong * sorted.size + den - 1) / den // ceil, 1-based
    sorted(rank.toInt - 1)
  }

  test("relative error bounded by 2^-s against exact nearest-rank") {
    // deterministic skewed positives (md5-free here is fine: spec-only)
    val vals = (1 to 20000).map(i => math.pow(1.0004, i) * 0.07)
      .map(v => math.rint(v * 100) / 100.0) // 2-decimal like events.value
    val df = vals.map(("g", _)).toDF("g", "v")
    val sk = QuantileSketch.sketch(df, Seq("g"), col("v"), s = 7, scale = 100)
    val row = QuantileSketch.quantiles(sk, Seq("g"), Qs, scale = 100).head
    val sorted = vals.sorted.toIndexedSeq
    for (((name, num, den), idx) <- Qs.zipWithIndex) {
      val est = row.getDouble(1 + idx)
      val exact = exactQ(sorted, num, den)
      // lower-edge estimate: never above the true quantile, within 2^-7
      assert(est <= exact + 1e-9, s"$name est=$est exact=$exact")
      assert((exact - est) / exact <= 1.0 / 128 + 1e-9,
        s"$name est=$est exact=$exact rel=${(exact - est) / exact}")
    }
    assert(row.getLong(4) === vals.size.toLong)
  }

  test("merge of shard sketches equals the whole-corpus sketch exactly") {
    val all = (1 to 9999).map(i => ("g" + (i % 3), (i % 977) * 0.13))
    val (a, b) = all.splitAt(4321)
    val whole = QuantileSketch.sketch(all.toDF("g", "v"), Seq("g"), col("v"))
    val merged = QuantileSketch.merge(
      QuantileSketch.sketch(a.toDF("g", "v"), Seq("g"), col("v")),
      QuantileSketch.sketch(b.toDF("g", "v"), Seq("g"), col("v")))
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("g", "okey", "cnt").as[(String, Long, Long)].collect().sorted.toSeq
    assert(key(merged) === key(whole))
  }

  test("negatives and zero: sign-mirrored buckets, full-range ordering") {
    val vals = Seq(-250.07, -0.01, 0.0, 0.01, 3.9, 250.07)
    val df = vals.map(("g", _)).toDF("g", "v")
    val sk = QuantileSketch.sketch(df, Seq("g"), col("v"), s = 7)
    // 6 distinct values, scaled cents small enough that every bucket is
    // exact (bitlen <= s+1 for all but 25007, whose bucket floors it)
    val est = QuantileSketch.quantiles(sk, Seq("g"),
      Seq(("p01", 1, 100), ("p50", 1, 2), ("p99", 99, 100))).head
    // -250.07 -> cents -25007, bitlen 15, g=7: |edge| = (25007 >> 7) << 7
    // = 24960 — the negative estimate is the bucket edge TOWARD zero
    assert(est.getDouble(1) === -249.60)
    assert(est.getDouble(2) === 0.0) // rank ceil(0.5*6)=3 -> third value (0.0)
    assert(est.getDouble(3) > 0) // top of the range is positive
    // sign mirror: the -250.07 and +250.07 buckets are exact negations
    val keys = sk.select("okey").as[Long].collect().sorted
    assert(keys.head === -keys.last)
  }

  test("bucket table stays small however many rows feed it") {
    val big = (1 to 50000).map(i => ("g", (i % 40000) * 0.01 + 0.01)).toDF("g", "v")
    val sk = QuantileSketch.sketch(big, Seq("g"), col("v"), s = 7)
    val buckets = sk.count()
    // 40k distinct cents collapse into <= (s+1 bits per octave) buckets:
    // ~128 per octave x ~22 octaves is the hard ceiling; observed ~2k
    assert(buckets < 3000, s"got $buckets buckets")
  }
}
