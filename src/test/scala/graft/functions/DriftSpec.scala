package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("histogramCompare bins, clamps outliers, excludes nulls, scores drift") {
    val df = Seq(
      (true, Some(5.0)), (true, Some(15.0)), (true, Some(15.0)), (true, Some(-3.0)),
      (false, Some(5.0)), (false, Some(25.0)), (false, None))
      .toDF("ref", "v")
    val out = Drift.histogramCompare(df, "v", col("ref"), binWidth = 10.0, nBins = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // ref: -3 clamps to bin 0 with 5.0 -> bin0=2, two 15s -> bin1=2
    // cur: 5.0 -> bin0=1, 25.0 -> bin2=1 (null excluded entirely)
    assert(out(0L)._1 == 2L && out(0L)._2 == 1L)
    assert(out(1L)._1 == 2L && out(1L)._2 == 0L)
    assert(out(2L)._1 == 0L && out(2L)._2 == 1L)
    assert(out(0L)._3 == 0.5 && out(0L)._4 == 0.5) // proportions per side
    val drift = Drift.histogramCompare(df, "v", col("ref"), 10.0, 3)
      .collect().map(r => r.getLong(0) -> Option(r.get(5))).toMap
    assert(drift(0L).contains(0.0))   // identical proportions: zero drift
    assert(drift(1L).contains(0.5))   // (0 - 0.5)^2 / 0.5
    assert(drift(2L).isEmpty)         // no reference mass: NULL, not infinity
  }

  test("histogramCompare yields NULL proportions when a whole window is empty") {
    // every row is reference: the current side has zero TOTAL mass, so
    // p_cur must be NULL per bin (not 0/0 -> NaN, which diverges between
    // Spark and the DuckDB oracle and poisons downstream arithmetic)
    val refOnly = Seq((true, Some(5.0)), (true, Some(15.0))).toDF("ref", "v")
    val out = Drift.histogramCompare(refOnly, "v", col("ref"), 10.0, 2)
      .collect().map(r => r.getLong(0) -> (Option(r.get(3)), Option(r.get(4)))).toMap
    assert(out.values.forall(_._2.isEmpty))          // p_cur NULL everywhere
    assert(out(0L)._1.contains(0.5) && out(1L)._1.contains(0.5))
    val curOnly = Seq((false, Some(5.0))).toDF("ref", "v")
    val flip = Drift.histogramCompare(curOnly, "v", col("ref"), 10.0, 2)
      .collect().map(r => (Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))
    assert(flip.forall(t => t._1.isEmpty))           // p_ref NULL
    assert(flip.forall(t => t._3.isEmpty))           // drift NULL, not Inf
  }

  test("ksCompare: hand-built CDF gap, zero for identical samples, one-sided drops") {
    import org.apache.spark.sql.functions.lit
    // ref {1,2} vs cur {2,3}: the scaled CDF gap peaks at 2/(2*2) = 0.5
    val df = Seq(
      ("a", 1L, true), ("a", 2L, true), ("a", 2L, false), ("a", 3L, false),
      ("b", 7L, true), ("b", 9L, true), ("b", 7L, false), ("b", 9L, false),
      ("c", 4L, true)) // no current sample: guarded out, no 0-division
      .toDF("k", "v", "ref")
    val out = Drift.ksCompare(df, "k", col("v"), col("ref"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("a") == ((2L, 2L, 0.5)))
    assert(out("b") == ((2L, 2L, 0.0)))
    assert(!out.contains("c"))
  }

  test("ksFromCounts over a pre-aggregated dictionary equals ksCompare on rows") {
    val rows = Seq(
      ("a", 1L, true), ("a", 2L, true), ("a", 2L, false), ("a", 3L, false),
      ("b", 7L, true), ("b", 9L, true), ("b", 7L, false), ("b", 9L, false))
      .toDF("k", "v", "ref")
    val fromRows = Drift.ksCompare(rows, "k", col("v"), col("ref"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // the dictionary a streaming query would close with
    val counts = rows.groupBy(col("k"), col("v"))
      .agg(
        sum(when(col("ref"), 1L).otherwise(0L)).as("c1"),
        sum(when(col("ref"), 0L).otherwise(1L)).as("c2"))
    val fromCounts = Drift.ksFromCounts(counts, "k", "v", "c1", "c2")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(fromCounts == fromRows)
  }
}
