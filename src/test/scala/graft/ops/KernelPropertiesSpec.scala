package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Algebraic properties of the kernel (SURVEY §5): dedup idempotence
  * and order-invariance, time-travel monotonicity, resample grid
  * arithmetic, distributed-ffill equivalence — over generated inputs,
  * not fixtures.
  */
class KernelPropertiesSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sampling: fixed seeds, reproducible across runs. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(40), Seed(i.toLong)))

  private def forAll[A](g: Gen[A], n: Int = 8)(f: A => Unit): Unit =
    samples(g, n).foreach(f)

  private val base = ts("2021-01-01").getTime

  private val rowsGen: Gen[List[(Int, Int, Double)]] =
    Gen.listOf(for {
      t <- Gen.choose(0, 20)  // few distinct times -> many collisions
      c <- Gen.choose(0, 10)
      v <- Gen.choose(-100, 100)
    } yield (t, c, v.toDouble))

  private def toDf(rows: List[(Int, Int, Double)]): DataFrame =
    rows.map { case (t, c, v) =>
      (new Timestamp(base + t * 3600000L), new Timestamp(base + c * 60000L), v)
    }.toDF("time", "created_time", "value")

  private def canon(df: DataFrame): List[(Timestamp, Timestamp, Double)] =
    df.collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getDouble(2)))
      .toList.sortBy(x => (x._1.getTime, x._2.getTime, x._3))

  test("dedupLatest is idempotent and input-order invariant") {
    forAll(rowsGen) { rows =>
      if (rows.nonEmpty) {
        val once = TimeseriesOps.dedupLatest(toDf(rows))
        assert(canon(TimeseriesOps.dedupLatest(once)) == canon(once))
        assert(canon(TimeseriesOps.dedupLatest(toDf(rows.reverse))) == canon(once))
        // one row per distinct time; every output row came from the input
        assert(once.count() == rows.map(_._1).distinct.size)
      }
    }
  }

  test("timeTravel is monotone: smaller delta never reveals more rows") {
    forAll(rowsGen) { rows =>
      if (rows.nonEmpty) {
        val df = toDf(rows)
        val lax = TimeseriesOps.timeTravel(df, "60min").count()
        val strict = TimeseriesOps.timeTravel(df, "-60min").count()
        assert(strict <= lax)
      }
    }
  }

  test("resample emits exactly the grid, values only from the past") {
    forAll(Gen.zip(Gen.choose(0, 10), Gen.choose(0, 10), Gen.choose(1, 5))) { case (a, b, stepH) =>
      val from = new Timestamp(base + math.min(a, b) * 3600000L)
      val to = new Timestamp(base + math.max(a, b) * 3600000L)
      val df = toDf(List((3, 0, 30.0), (7, 0, 70.0)))
      val out = TimeseriesOps.resample(df, from, to, s"${stepH}h", Seq("value"))
        .orderBy("time").collect()
      val expectedN = (to.getTime - from.getTime) / (stepH * 3600000L) + 1
      assert(out.length == expectedN)
      out.foreach { r =>
        val t = r.getTimestamp(0).getTime
        val v = Option(r.get(1))
        val expected =
          if (t >= base + 7 * 3600000L) Some(70.0)
          else if (t >= base + 3 * 3600000L) Some(30.0)
          else None
        assert(v == expected, s"at $t")
      }
    }
  }

  test("bucketed ffill equals global ffill for arbitrary sparse series") {
    val sparseGen = Gen.listOf(for {
      t <- Gen.choose(0, 200)
      v <- Gen.option(Gen.choose(-50, 50).map(_.toDouble))
    } yield (t, v))
    forAll(sparseGen, n = 4) { rows =>
      if (rows.nonEmpty) {
        // hour offsets spread over ~3 years so day, month AND year
        // bucketings all genuinely partition the series
        val df = rows.distinctBy(_._1).map { case (t, v) =>
          (new Timestamp(base + t * 130L * 3600000L), v)
        }.toDF("time", "value")
        val g = TimeseriesOps.ffill(df, Seq("value")).orderBy("time")
          .collect().map(r => Option(r.get(1))).toSeq
        for (unit <- Seq("day", "month", "year")) {
          val b = TimeseriesOps.ffillBucketed(df, Seq("value"),
              date_trunc(unit, col("time"))).orderBy("time")
            .collect().map(r => Option(r.get(1))).toSeq
          assert(g == b, s"bucket unit $unit diverged")
        }
      }
    }
  }
}
