package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Contracts for the native bloom-probe expression: no false negatives
  * (the property the pruned-decontamination plan's CORRECTNESS rests
  * on), bounded false positives (the property its SCALE rests on), the
  * composition NULL contract, and agreement between the codegen and
  * interpreted paths.
  */
class BloomProbeSpec extends SparkSpec {

  private def filterOf(n: Int): BloomFilter = {
    val bf = BloomFilter.create(n, 0.03)
    (0 until n).foreach(i => bf.putLong(i.toLong * 7919L))
    bf
  }

  test("no false negatives: every inserted key probes true (codegen path)") {
    import spark.implicits._
    val bf = filterOf(10000)
    val hits = spark.range(10000).select((col("id") * 7919L).as("k"))
      .filter(BloomMightContain.probe(col("k"), bf))
      .count()
    assert(hits === 10000L)
  }

  test("false-positive rate stays near the configured fpp") {
    import spark.implicits._
    val bf = filterOf(10000)
    // disjoint key space: odd multiples of a different prime
    val fps = spark.range(10000).select((col("id") * 104729L + 13L).as("k"))
      .filter(BloomMightContain.probe(col("k"), bf))
      .count()
    assert(fps < 10000L * 0.03 * 3, s"fp count $fps vs fpp 0.03")
  }

  test("null key probes to null, filter drops it (both eval paths)") {
    import spark.implicits._
    val bf = filterOf(10)
    val df = Seq(Some(0L), None).toDF("k")
    assert(df.filter(BloomMightContain.probe(col("k"), bf)).count() === 1L)
    // interpreted path: eval the expression directly off-codegen
    val expr = BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(null,
        org.apache.spark.sql.types.LongType), bf)
    assert(expr.eval(null) === null)
  }

  test("interpreted eval agrees with the codegen filter") {
    val bf = filterOf(1000)
    val probe = (k: Long) => BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(k), bf).eval(null)
    assert((0 until 1000).forall(i => probe(i.toLong * 7919L) == true))
  }

  test("non-long key is an analysis-time type error, not a runtime crash") {
    import spark.implicits._
    val bf = filterOf(10)
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("a").toDF("s").filter(BloomMightContain.probe(col("s"), bf)).collect()
    }
    assert(ex.getMessage.contains("bloom_might_contain"))
  }

  test("txt_decontam_bloom prunes before the shuffle: no Exchange under the probe") {
    // the whole point of the bloom plan: the probe must pipeline with
    // the train-side gram explode, BEFORE the distinct's exchange, so
    // pruned grams never leave the scan stage. In the printed tree a
    // child subtree follows its parent line, so for the probe Filter
    // there must be a path down to its FileScan that crosses no
    // Exchange line. (Catalyst also INFERS the probe onto the eval
    // side through the semi-join's equality constraint — harmless
    // extra pruning — so we require at least ONE probe-above-scan
    // path to be exchange-free, not all.)
    val p = graft.queries.QueryLib.queries("txt_decontam_bloom")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    val lines = p.linesIterator.toVector
    val probeIdx = lines.zipWithIndex.collect {
      case (l, i) if l.contains("Filter") && l.contains("bloom_might_contain") => i
    }
    assert(probeIdx.nonEmpty, s"no Filter with bloom_might_contain in:\n$p")
    val cleanPath = probeIdx.exists { i =>
      val below = lines.drop(i + 1).takeWhile(!_.contains("FileScan parquet"))
      lines.drop(i + 1).exists(_.contains("FileScan parquet")) &&
        !below.exists(_.contains("Exchange"))
    }
    assert(cleanPath, s"bloom probe shuffles before pruning:\n$p")
    spark.catalog.clearCache()
  }
}
