package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The binned interval join must agree row-for-row with the naive
  * non-equi formulation, and its physical plan must stay an equi-join
  * (hash or sort-merge) — never a nested loop / cartesian product.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random fixture: intervals of varied spans
  // (shorter, equal, and longer than the bin) incl. bin-edge-aligned
  // starts/ends, points on both sides of every boundary
  private def fixture = {
    val rng = new scala.util.Random(42)
    val binMs = 600L * 1000000L // 10 min in micros
    val iv = (1 to 60).map { i =>
      val key = rng.nextInt(5).toLong
      val start = rng.nextInt(50) * binMs / 5 // quarter-bin grid → edge cases
      val span = (rng.nextInt(4) + 1) * binMs / 2 // 0.5x .. 2x bin
      (i.toLong, key, new java.sql.Timestamp(start / 1000),
        new java.sql.Timestamp((start + span) / 1000))
    }.toDF("iv_id", "key", "w_start", "w_end")
    val pt = (1 to 400).map { i =>
      val key = rng.nextInt(5).toLong
      val t = rng.nextInt(60) * binMs / 6
      (i.toLong, key, new java.sql.Timestamp(t / 1000), rng.nextInt(100).toDouble)
    }.toDF("pt_id", "key", "ts", "v")
    (iv, pt, binMs)
  }

  test("binned interval join ≡ naive non-equi join") {
    val (iv, pt, binMs) = fixture
    val got = IntervalJoin.binned(iv, pt, "key", "w_start", "w_end", "ts", binMs)
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    val want = iv.join(pt.withColumnRenamed("key", "pkey"),
        col("key") === col("pkey") && col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    assert(want.nonEmpty, "fixture must produce matches")
    assert(got === want)
  }

  test("bin width independence: different grids, same answer") {
    val (iv, pt, binMs) = fixture
    val a = IntervalJoin.binned(iv, pt, "key", "w_start", "w_end", "ts", binMs)
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    val b = IntervalJoin.binned(iv, pt, "key", "w_start", "w_end", "ts", binMs / 7)
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    assert(a === b)
  }

  test("empty and inverted intervals match nothing and don't explode") {
    val iv = Seq(
      (1L, 0L, ts("2021-01-01T01:00:00"), ts("2021-01-01T01:00:00")), // empty
      (2L, 0L, ts("2021-01-01T05:00:00"), ts("2021-01-01T00:00:00")), // inverted
      (3L, 0L, ts("2021-01-01T00:00:00"), ts("2021-01-01T02:00:00"))  // valid
    ).toDF("iv_id", "key", "w_start", "w_end")
    val pt = Seq((1L, 0L, ts("2021-01-01T01:00:00"), 1.0))
      .toDF("pt_id", "key", "ts", "v")
    val got = IntervalJoin.binned(iv, pt, "key", "w_start", "w_end", "ts", 600L * 1000000L)
      .select("iv_id").as[Long].collect().toSeq
    assert(got === Seq(3L))
  }

  test("plan contract: equi-join on (key, bin), no nested loop") {
    val (iv, pt, binMs) = fixture
    val plan = IntervalJoin.binned(iv, pt, "key", "w_start", "w_end", "ts", binMs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join degraded to a nested loop:\n$plan")
  }
}
