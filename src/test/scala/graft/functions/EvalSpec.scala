package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("aucExact matches the hand-counted pair probability, half-credit ties") {
    // pos scores {3, 2}, neg scores {2, 1}: of the 4 (pos, neg) pairs
    // three rank the positive higher and one ties -> AUC = 3.5/4
    val df = Seq((true, 3L), (true, 2L), (false, 2L), (false, 1L))
      .toDF("label", "score")
    val out = Eval.aucExact(df, col("label"), col("score")).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((2L, 2L, 0.875)))
    // a random score (all distinct, alternating) sanity-bounds in [0,1];
    // a single-class frame yields NO row instead of dividing by zero
    assert(Eval.aucExact(Seq((true, 1L), (true, 2L)).toDF("label", "score"),
      col("label"), col("score")).count() == 0L)
  }

  test("aucExact is invariant to row order and partitioning") {
    val rows = Seq((true, 3L), (true, 2L), (false, 2L), (false, 1L))
    for (perm <- Seq(rows, rows.reverse)) {
      val out = Eval.aucExact(perm.toDF("label", "score").repartition(3),
        col("label"), col("score")).collect()
      assert(out.head.getDouble(2) == 0.875)
    }
  }

  test("giniFromCounts over the pre-aggregated dictionary equals gini over rows") {
    val rows = Seq(("c", 0L), ("c", 0L), ("c", 10L), ("e", 5L), ("e", 5L), ("e", 7L))
    val df = rows.toDF("k", "v")
    val fromRows = Eval.gini(df, "k", col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val counts = df.groupBy(col("k"), col("v")).agg(count(lit(1)).as("c"))
    val fromCounts = Eval.giniFromCounts(counts, "k", "v", "c")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fromRows == fromCounts && fromRows.nonEmpty)
  }

  test("aucFromCounts over the pre-aggregated dictionary equals aucExact over rows") {
    val rows = Seq((true, 3L), (true, 2L), (false, 2L), (false, 1L), (true, 1L))
    val df = rows.toDF("label", "score")
    val fromRows = Eval.aucExact(df, col("label"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val counts = df.groupBy(col("score"))
      .agg(count(lit(1)).as("c"), sum(when(col("label"), 1L).otherwise(0L)).as("p"))
    val fromCounts = Eval.aucFromCounts(counts, "score", "c", "p")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(fromRows == fromCounts && fromRows.nonEmpty)
  }

  test("liftTable: perfect ranking front-loads capture; full population lifts 1.0") {
    // 4 positives carry the 4 highest scores of 8 rows: the 50% cut
    // (bucket 10 of 20) captures ALL positives at lift 2, and the
    // final bucket always closes at lift 1.0, capture 1.0.
    val df = (1 to 8).map(i => (i > 4, i.toLong)).toDF("label", "score")
    val out = Eval.liftTable(df, col("label"), col("score"), buckets = 20)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6))).sortBy(_._1)
    assert(out.length == 20)
    val mid = out.find(_._1 == 10).get
    assert(mid == ((10L, 4L, 4L, 2.0, 1.0)))
    val last = out.last
    assert(last._2 == 8L && last._4 == 1.0 && last._5 == 1.0)
    // capture is monotone down the table
    assert(out.map(_._5).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("gini: concentrated mass scores (n-1)/n, equal shares score 0, zeros drop") {
    val df = Seq(
      ("c", 0L), ("c", 0L), ("c", 10L), // all mass on one of three
      ("e", 5L), ("e", 5L), ("e", 5L),  // perfectly equal
      ("z", 0L), ("z", 0L))             // degenerate: no mass
      .toDF("k", "v")
    val out = Eval.gini(df, "k", col("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("c") == ((3L, 0.666667)))
    assert(out("e") == ((3L, 0.0)))
    assert(!out.contains("z"))
  }

  test("confusion: cell counts and per-class recall/precision fractions") {
    val df = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "b"), ("b", "a"), ("b", "b"))
      .toDF("actual", "pred")
    val out = Eval.confusion(df, col("actual"), col("pred"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(out(("a", "a")) == ((2L, 3L, 3L, 0.666667, 0.666667)))
    assert(out(("a", "b")) == ((1L, 3L, 3L, 0.333333, 0.333333)))
    assert(out(("b", "a"))._1 == 1L && out(("b", "b"))._1 == 2L)
    assert(out.size == 4)
  }

  test("cohenKappa: hand-computed value; perfect agreement = 1; constant sides drop") {
    val df = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "b"), ("b", "a"), ("b", "b"))
      .toDF("actual", "pred")
    // N=6, diag=4, rows a/b = 3/3, cols a/b = 3/3: kappa =
    // (6*4 - 18) / (36 - 18) = 1/3
    val out = Eval.cohenKappa(df, col("actual"), col("pred")).head
    assert(out.getLong(0) == 6L && out.getLong(1) == 4L)
    assert(out.getDouble(2) == 0.333333)
    val perfect = Seq(("a", "a"), ("b", "b")).toDF("actual", "pred")
    assert(Eval.cohenKappa(perfect, col("actual"), col("pred")).head.getDouble(2) == 1.0)
    // both sides constant: p_e = 1, kappa undefined -> no rows
    val const = Seq(("a", "a"), ("a", "a")).toDF("actual", "pred")
    assert(Eval.cohenKappa(const, col("actual"), col("pred")).isEmpty)
  }

  test("kaplanMeier matches the hand-computed product-limit curve") {
    // durations: 1(event), 2(censored), 3(event), 3(event), 4(censored)
    // t=1: n=5, d=1 -> S=4/5; t=3: n=3, d=2 -> S=0.8*(1/3)
    val df = Seq((1L, true), (2L, false), (3L, true), (3L, true), (4L, false))
      .toDF("t", "obs")
    val out = Eval.kaplanMeier(df, col("t"), col("obs"))
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 5L, 1L, 0.8), (3L, 3L, 2L, 0.266667)))
    // censored-only steps never appear; survival is non-increasing by
    // construction (every factor <= 1); all-censored input -> no rows
    val cens = Seq((1L, false), (2L, false)).toDF("t", "obs")
    assert(Eval.kaplanMeier(cens, col("t"), col("obs")).isEmpty)
    // order/partitioning invariance: the dictionary collapse makes the
    // curve independent of physical row order
    val shuffled = Seq((3L, true), (4L, false), (1L, true), (3L, true), (2L, false))
      .toDF("t", "obs").repartition(5)
    val out2 = Eval.kaplanMeier(shuffled, col("t"), col("obs"))
      .orderBy("t").collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(out2.toSeq == Seq((1L, 0.8), (3L, 0.266667)))
  }
}
