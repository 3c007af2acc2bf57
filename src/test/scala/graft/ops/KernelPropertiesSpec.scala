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

  test("resample at duplicate timestamps: tie -> max value, input-order invariant") {
    // the round-10 ROWS fast path rests on resample's internal per-time
    // collapse; this pins that duplicate-time contributors resolve to
    // the max value (the kernel's tie rule) regardless of physical row
    // order — the property the round-9 RANGE frame bought expensively
    val dupGen = Gen.listOf(for {
      t <- Gen.choose(0, 10) // few times -> many duplicates
      v <- Gen.choose(-50, 50)
    } yield (t, v.toDouble))
    forAll(dupGen, n = 6) { rows =>
      if (rows.nonEmpty) {
        def run(rs: List[(Int, Double)]) = {
          val df = rs.map { case (t, v) =>
            (new Timestamp(base + t * 3600000L), v)
          }.toDF("time", "value")
          TimeseriesOps.resample(df,
              new Timestamp(base), new Timestamp(base + 10 * 3600000L), "1h", Seq("value"))
            .orderBy("time").collect().map(r => Option(r.get(1))).toSeq
        }
        val out = run(rows)
        assert(out == run(rows.reverse), "input order changed the fill")
        assert(out == run(scala.util.Random.shuffle(rows)), "shuffle changed the fill")
        // grid point at each time with data = max of that time's values
        val byTime = rows.groupBy(_._1)
        byTime.foreach { case (t, vs) =>
          assert(out(t) == Some(vs.map(_._2).max), s"tie at t=$t not max")
        }
      }
    }
  }

  test("asofJoin at duplicate right times: tie -> max value, keyed and un-keyed agree") {
    val dupGen = Gen.listOf(for {
      t <- Gen.choose(0, 8)
      v <- Gen.choose(-50, 50)
    } yield (t, v.toDouble))
    forAll(dupGen, n = 6) { rows =>
      if (rows.nonEmpty) {
        val left = (0 to 8).map(t => (new Timestamp(base + t * 3600000L), t.toLong))
          .toDF("time", "probe_id")
        def right(rs: List[(Int, Double)]) = rs.map { case (t, v) =>
          (new Timestamp(base + t * 3600000L), v, "k")
        }.toDF("time", "v", "k")
        def canonA(df: DataFrame) = df.select("probe_id", "v").orderBy("probe_id")
          .collect().map(r => Option(r.get(1))).toSeq
        val unkeyed = canonA(TimeseriesOps.asofJoin(left, right(rows).drop("k"), Seq("v")))
        val unkeyedRev = canonA(TimeseriesOps.asofJoin(left, right(rows.reverse).drop("k"), Seq("v")))
        val keyed = canonA(TimeseriesOps.asofJoin(left.withColumn("k", lit("k")),
          right(rows), Seq("v"), by = Seq("k")).drop("k"))
        assert(unkeyed == unkeyedRev, "right order changed un-keyed as-of")
        assert(unkeyed == keyed, "keyed and un-keyed paths disagree at ties")
        // spot the tie rule itself: each probe gets max value at latest time <= probe
        val byTime = rows.groupBy(_._1)
        (0 to 8).foreach { p =>
          val eligible = byTime.keys.filter(_ <= p)
          val expect = if (eligible.isEmpty) None
            else Some(byTime(eligible.max).map(_._2).max)
          assert(unkeyed(p) == expect, s"probe $p")
        }
      }
    }
  }

  test("asofJoin tolerance masks exactly the stale carries, keyed and un-keyed agree") {
    val dupGen = Gen.listOf(for {
      t <- Gen.choose(0, 8)
      v <- Gen.choose(-50, 50)
    } yield (t, v.toDouble))
    val tolHours = 2
    val tolUs = tolHours * 3600L * 1000000L
    forAll(dupGen, n = 6) { rows =>
      if (rows.nonEmpty) {
        val left = (0 to 8).map(t => (new Timestamp(base + t * 3600000L), t.toLong))
          .toDF("time", "probe_id")
        def right(rs: List[(Int, Double)]) = rs.map { case (t, v) =>
          (new Timestamp(base + t * 3600000L), v, "k")
        }.toDF("time", "v", "k")
        def canonA(df: DataFrame) = df.select("probe_id", "v").orderBy("probe_id")
          .collect().map(r => Option(r.get(1))).toSeq
        val unkeyed = canonA(TimeseriesOps.asofJoin(left, right(rows).drop("k"), Seq("v"),
          toleranceUs = Some(tolUs)))
        val keyed = canonA(TimeseriesOps.asofJoin(left.withColumn("k", lit("k")),
          right(rows), Seq("v"), by = Seq("k"), toleranceUs = Some(tolUs)).drop("k"))
        assert(unkeyed == keyed, "keyed and un-keyed tolerance paths disagree")
        // brute force: match = latest time <= probe; mask if older than tol
        val byTime = rows.groupBy(_._1)
        (0 to 8).foreach { p =>
          val eligible = byTime.keys.filter(_ <= p)
          val expect = eligible.toSeq.sorted.lastOption
            .filter(t => p - t <= tolHours)
            .map(t => byTime(t).map(_._2).max)
          assert(unkeyed(p) == expect, s"probe $p tol=$tolHours")
        }
        // tolerance 0: only exact-time matches survive
        val exact = canonA(TimeseriesOps.asofJoin(left, right(rows).drop("k"), Seq("v"),
          toleranceUs = Some(0L)))
        (0 to 8).foreach { p =>
          val expect = byTime.get(p).map(_.map(_._2).max)
          assert(exact(p) == expect, s"probe $p tol=0")
        }
      }
    }
  }

  test("asofJoin directions: forward and nearest match brute force, keyed and un-keyed") {
    val dupGen = Gen.listOf(for {
      t <- Gen.choose(0, 8)
      v <- Gen.choose(-50, 50)
    } yield (t, v.toDouble))
    forAll(dupGen, n = 6) { rows =>
      if (rows.nonEmpty) {
        val left = (0 to 8).map(t => (new Timestamp(base + t * 3600000L), t.toLong))
          .toDF("time", "probe_id")
        def right(rs: List[(Int, Double)]) = rs.map { case (t, v) =>
          (new Timestamp(base + t * 3600000L), v, "k")
        }.toDF("time", "v", "k")
        def canonA(df: DataFrame) = df.select("probe_id", "v").orderBy("probe_id")
          .collect().map(r => Option(r.get(1))).toSeq
        val byTime = rows.groupBy(_._1)
        for (dir <- Seq("forward", "nearest")) {
          val unkeyed = canonA(TimeseriesOps.asofJoin(left, right(rows).drop("k"), Seq("v"),
            direction = dir))
          val keyed = canonA(TimeseriesOps.asofJoin(left.withColumn("k", lit("k")),
            right(rows), Seq("v"), by = Seq("k"), direction = dir).drop("k"))
          assert(unkeyed == keyed, s"keyed/un-keyed disagree for $dir")
          (0 to 8).foreach { p =>
            val expect = dir match {
              case "forward" =>
                byTime.keys.filter(_ >= p).minOption.map(t => byTime(t).map(_._2).max)
              case _ => // nearest, equidistant -> past
                val past = byTime.keys.filter(_ <= p).maxOption
                val future = byTime.keys.filter(_ >= p).minOption
                (past, future) match {
                  case (Some(pt), Some(ft)) =>
                    Some(byTime(if (p - pt <= ft - p) pt else ft).map(_._2).max)
                  case (Some(pt), None) => Some(byTime(pt).map(_._2).max)
                  case (None, Some(ft)) => Some(byTime(ft).map(_._2).max)
                  case _ => None
                }
            }
            assert(unkeyed(p) == expect, s"$dir probe $p")
          }
        }
        // forward + tolerance: matches farther than 1h ahead read null
        val tolF = canonA(TimeseriesOps.asofJoin(left, right(rows).drop("k"), Seq("v"),
          direction = "forward", toleranceUs = Some(3600L * 1000000L)))
        (0 to 8).foreach { p =>
          val expect = byTime.keys.filter(_ >= p).minOption
            .filter(_ - p <= 1).map(t => byTime(t).map(_._2).max)
          assert(tolF(p) == expect, s"forward+tol probe $p")
        }
      }
    }
  }

  test("ewma matches the sequential recurrence exactly, per key, any partitioning") {
    val gen = Gen.listOf(for {
      k <- Gen.choose(0, 3)
      t <- Gen.choose(0, 30)
      v <- Gen.choose(-100, 100)
    } yield (k.toString, t, v.toDouble))
    forAll(gen, n = 6) { rows =>
      if (rows.nonEmpty) {
        val df = rows.map { case (k, t, v) => (k, new Timestamp(base + t * 3600000L), v) }
          .toDF("k", "time", "value").repartition(5) // scatter the input
        val out = TimeseriesOps.ewma(df, alpha = 0.3, keyCol = "k")
          .collect().map(r => ((r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2)), r.getDouble(3)))
          .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).toSet) }
        // brute force: fold each key's rows in (time, value) order;
        // equality is EXACT — the kernel fixes the IEEE op order
        rows.groupBy(_._1).foreach { case (k, rs) =>
          val sorted = rs.map { case (_, t, v) => (base + t * 3600000L, v) }.sortBy(identity)
          var acc = 0.0
          val oneMinus = 1 - 0.3 // EXACTLY the kernel's multiplier: the
          // literal 0.7 could differ from double(1 - 0.3d) by one ulp
          sorted.zipWithIndex.foreach { case ((tm, v), i) =>
            acc = if (i == 0) v else oneMinus * acc + 0.3 * v
            assert(out((k, tm, v)).contains(acc), s"key $k row $i")
          }
        }
      }
    }
  }

  test("resample backfill: next value at-or-after each grid point, exact hits exact") {
    val gen = Gen.listOf(for {
      t <- Gen.choose(0, 40)
      v <- Gen.choose(-100, 100)
    } yield (t, v.toDouble))
    forAll(gen, n = 6) { rows =>
      if (rows.nonEmpty) {
        val df = rows.map { case (t, v) => (new Timestamp(base + t * 3600000L), v) }
          .toDF("time", "value")
        val out = TimeseriesOps.resample(df,
            new Timestamp(base), new Timestamp(base + 40 * 3600000L), "90min", Seq("value"),
            backfill = true)
          .collect().map(r => (r.getTimestamp(0).getTime, Option(r.get(1)).map(_.asInstanceOf[Double])))
          .toMap
        val pts = rows.groupBy(_._1).map { case (t, vs) => (base + t * 3600000L, vs.map(_._2).max) }
          .toSeq.sortBy(_._1)
        (0L to (40 * 3600000L) by 90 * 60000L).foreach { off =>
          val g = base + off
          val expect = pts.find(_._1 >= g).map(_._2) // trailing -> null
          assert(out(g) == expect, s"grid $off")
        }
      }
    }
  }

  test("resampleInterpolated: brute-force lerp equality on generated series") {
    val gen = Gen.listOf(for {
      t <- Gen.choose(0, 40)       // hours; collisions likely
      v <- Gen.choose(-100, 100)
    } yield (t, v.toDouble))
    forAll(gen, n = 8) { rows =>
      if (rows.nonEmpty) {
        val df = rows.map { case (t, v) => (new Timestamp(base + t * 3600000L), v) }
          .toDF("time", "value")
        // grid every 90 min over [0h, 40h] — points between, at, and
        // beyond data times
        val out = TimeseriesOps.resampleInterpolated(df,
            new Timestamp(base), new Timestamp(base + 40 * 3600000L), "90min", Seq("value"))
          .collect().map(r => (r.getTimestamp(0).getTime, Option(r.get(1)).map(_.asInstanceOf[Double])))
          .toMap
        // brute force: tie -> max, lerp interior, flat trailing, null leading
        val pts = rows.groupBy(_._1).map { case (t, vs) => (base + t * 3600000L, vs.map(_._2).max) }
          .toSeq.sortBy(_._1)
        (0L to (40 * 3600000L) by 90 * 60000L).foreach { off =>
          val g = base + off
          val prev = pts.filter(_._1 <= g).lastOption
          val next = pts.find(_._1 >= g)
          val expect = (prev, next) match {
            case (Some((pt, pv)), Some((nt, nv))) =>
              if (pt == nt) Some(pv)
              else Some(pv + (nv - pv) * ((g - pt).toDouble / (nt - pt).toDouble))
            case (Some((_, pv)), None) => Some(pv) // trailing flat
            case _ => None                         // leading
          }
          val got = out(g)
          (expect, got) match {
            case (Some(e), Some(a)) => assert(math.abs(e - a) < 1e-9, s"grid $off: $e vs $a")
            case (e, a) => assert(e == a, s"grid $off: $e vs $a")
          }
        }
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
          // rows here are unique per time (distinctBy above), so the
          // caller may legitimately promise tieFree — the cheap ROWS
          // path must agree with both the RANGE path and the global fill
          val tf = TimeseriesOps.ffillBucketed(df, Seq("value"),
              date_trunc(unit, col("time")), tieFree = true).orderBy("time")
            .collect().map(r => Option(r.get(1))).toSeq
          assert(g == tf, s"tieFree ROWS path diverged at bucket unit $unit")
        }
      }
    }
  }

  test("map-typed values ride the bucketed fill and match the global form") {
    // non-orderable values can't use the struct-max fill; the max_by
    // route (keyed on the order columns alone) must still agree with
    // the exact global window on tie-free input across every bucket
    // granularity — and stay bucket-parallel (no single-task window
    // over the data; the one-row-per-bucket seed window is exempt).
    val sparseGen = Gen.listOf(for {
      t <- Gen.choose(0, 200)
      v <- Gen.option(Gen.choose(0, 50))
    } yield (t, v))
    forAll(sparseGen, n = 4) { rows =>
      if (rows.nonEmpty) {
        val df = rows.distinctBy(_._1).map { case (t, v) =>
          (new Timestamp(base + t * 130L * 3600000L), v.map(x => Map("k" -> x)).orNull)
        }.toDF("time", "value")
        val g = TimeseriesOps.ffill(df, Seq("value")).orderBy("time")
          .collect().map(r => Option(r.get(1)).map(_.toString)).toSeq
        for (unit <- Seq("day", "month", "year")) {
          val b = TimeseriesOps.ffillBucketed(df, Seq("value"),
              date_trunc(unit, col("time"))).orderBy("time")
            .collect().map(r => Option(r.get(1)).map(_.toString)).toSeq
          assert(g == b, s"map-typed bucketed fill diverged at unit $unit")
        }
      }
    }
  }

  test("un-keyed as-of with map-typed values is bucket-distributed and exact") {
    // before: map values forced the single-task global window; now the
    // bucketed route must produce the same latest-at-or-before result
    val left = (0 to 8).map(t => (new Timestamp(base + t * 3600000L), t.toLong))
      .toDF("time", "probe_id")
    val right = Seq(2, 5, 7).map(t =>
      (new Timestamp(base + t * 3600000L), Map("v" -> t))).toDF("time", "payload")
    val out = TimeseriesOps.asofJoin(left, right, Seq("payload"))
      .orderBy("probe_id").collect()
      .map(r => Option(r.getMap[String, Int](2)).map(_("v"))).toSeq
    assert(out == Seq(None, None, Some(2), Some(2), Some(2), Some(5), Some(5), Some(7), Some(7)))
    // plan: the fill window partitions by the fill bucket, never global
    val plan = TimeseriesOps.asofJoin(left, right, Seq("payload"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("__ffill_bucket"), s"map-typed as-of skipped the bucketed fill:\n$plan")
  }
}
