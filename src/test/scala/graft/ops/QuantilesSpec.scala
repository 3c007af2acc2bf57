package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** The distributed two-phase quantile must be EXACTLY the built-in
  * `percentile()` (same interpolation, same null handling) on every
  * input shape — duplicates, singleton groups, one-distinct-value
  * groups, nulls — because the driver's oracle (`quantile_cont`)
  * certifies the same contract.
  */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(60), Seed(i.toLong)))

  private val ps = Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p100", 1.0), ("p0", 0.0))

  test("matches built-in percentile on generated groups with heavy duplication") {
    val gen = Gen.listOf(for {
      g <- Gen.choose(0, 3)
      v <- Gen.choose(0, 12) // few distinct values -> heavy ties
    } yield (s"g$g", v / 4.0))
    samples(gen, 8).foreach { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("g", "v")
        val got = Quantiles.quantileCont(df, "v", Seq("g"), ps)
          .collect().map(r => r.getString(0) -> ps.indices.map(i => r.getDouble(i + 1)))
          .toMap
        val want = df.groupBy(col("g")).agg(
            expr("percentile(v, 0.25)"), expr("percentile(v, 0.5)"),
            expr("percentile(v, 0.75)"), expr("percentile(v, 1.0)"),
            expr("percentile(v, 0.0)"))
          .collect().map(r => r.getString(0) -> ps.indices.map(i => r.getDouble(i + 1)))
          .toMap
        assert(got.keySet == want.keySet)
        got.foreach { case (g, vs) =>
          vs.zip(want(g)).zipWithIndex.foreach { case ((a, b), i) =>
            assert(math.abs(a - b) < 1e-12, s"group $g quantile ${ps(i)._1}: $a vs $b")
          }
        }
      }
    }
  }

  test("singleton and two-value groups interpolate like the built-in") {
    val df = Seq(("a", 1.0), ("b", 1.0), ("b", 2.0), ("c", 5.0), ("c", 5.0))
      .toDF("g", "v")
    val got = Quantiles.quantileCont(df, "v", Seq("g"), Seq(("p50", 0.5), ("p75", 0.75)))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(got === Array(("a", 1.0, 1.0), ("b", 1.5, 1.75), ("c", 5.0, 5.0)))
  }

  test("nulls are ignored; all-null groups are absent") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("n", None))
      .toDF("g", "v")
    val got = Quantiles.quantileCont(df, "v", Seq("g"), Seq(("p50", 0.5)))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got === Array(("a", 2.0)))
  }

  test("a NULL group key is a real group, like the built-in (null-safe rank joins)") {
    // percentile() emits a row for the NULL group; plain equi-joins in
    // the rank plumbing would silently drop it (the review catch)
    val df = Seq((Some("a"), 1.0), (Some("a"), 3.0), (None, 10.0), (None, 20.0), (None, 30.0))
      .toDF("g", "v")
    val got = Quantiles.quantileCont(df, "v", Seq("g"), Seq(("p50", 0.5)))
      .collect().map(r => (Option(r.getString(0)), r.getDouble(1))).toMap
    assert(got == Map(Some("a") -> 2.0, None -> 20.0))
    // ungrouped (global) quantiles keep working too
    val global = Quantiles.quantileCont(df, "v", Nil, Seq(("p50", 0.5)))
      .collect().map(_.getDouble(0))
    val want = df.agg(expr("percentile(v, 0.5)")).head().getDouble(0)
    assert(global.length == 1 && math.abs(global(0) - want) < 1e-12)
  }

  test("result is identical across partition counts (slice-boundary invariance)") {
    val rows = (1 to 997).map(i => (s"g${i % 3}", (i * 37 % 101) / 3.0))
    val df = rows.toDF("g", "v")
    val ref = Quantiles.quantileCont(df, "v", Seq("g"), ps, numPartitions = Some(1))
      .collect().map(r => r.getString(0) -> ps.indices.map(i => r.getDouble(i + 1))).toMap
    for (np <- Seq(2, 7, 64)) {
      val got = Quantiles.quantileCont(df, "v", Seq("g"), ps, numPartitions = Some(np))
        .collect().map(r => r.getString(0) -> ps.indices.map(i => r.getDouble(i + 1))).toMap
      assert(got == ref, s"diverged at numPartitions=$np")
    }
  }
}
