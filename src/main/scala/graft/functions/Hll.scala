package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog registers as PLAIN ROWS — the mergeable
  * cardinality sketch for sliding windows and pre-aggregated cubes,
  * where Spark's `approx_count_distinct` can't help (its sketch is an
  * opaque aggregation buffer: not mergeable across window frames, not
  * reproducible in an external engine).
  *
  * Design: m = 256 registers (b = 8). Hash = md5 (cross-engine
  * reproducible); register index = first 2 hex nibbles, rho = leading
  * zeros of the next 60 bits + 1 (all-zero suffix → 61, the w+1 rule).
  * A register table (key…, idx, r) merges by MAX — associative and
  * commutative, so registers roll up through any groupBy or window
  * max: per-day registers → 7-day windows, per-partition → global,
  * pre-agg cube cells, etc. The RAW estimator alpha·m²/Σ2^(-r) is kept
  * libm-free: Σ2^(61-r) is an exact integer (decimal(38,0) — up to
  * 256·2^61 overflows BIGINT), and the closing constant·2^61/S is one
  * IEEE op chain — bit-reproducible in any engine, unlike the ln-based
  * small-range correction, which is deliberately omitted (the raw
  * estimator is the large-range regime a 100 TB profile lives in).
  */
object Hll {

  val B = 8
  val M = 256 // 1 << B

  /** Per-row (idx, rho) from a string expression. Prefix the input with
    * a purpose tag so unrelated sketches decorrelate. */
  def idxCol(input: Column): Column =
    conv(substring(md5(input), 1, 2), 16, 10).cast("long")

  def rhoCol(input: Column): Column = {
    val sfx = conv(substring(md5(input), 3, 15), 16, 10).cast("long")
    // bin_len = the native length(bin(x)) (graft.plans.BinLength): the
    // same integer the oracles compute from the binary print, minus
    // the per-row 64-char string allocation on this per-input path
    when(sfx === 0L, lit(61L))
      .otherwise(lit(61L) - graft.plans.BinLength.binLen(sfx).cast("long"))
  }

  /** Dense per-group register table: one row per (groupCols…, idx) for
    * EVERY group × all 256 idx — dense so downstream window/rollup
    * maxes see absent registers as r = 0 instead of missing rows.
    * Sparse observed maxes are computed first (one hash-agg over the
    * data), then left-joined onto the group × idx grid. The default
    * grid is the OBSERVED group set, derived from the tiny aggregated
    * frame (never a second scan of the input); pass `grid` explicitly
    * when the group domain is larger than what the data shows — e.g. a
    * keys × calendar-days cross product for a rolling window, where a
    * key that skips a day still needs its register rows.
    */
  def registers(
      df: DataFrame,
      groupCols: Seq[String],
      input: Column,
      grid: Option[DataFrame] = None): DataFrame = {
    val spark = df.sparkSession
    val obs = df.select(col("*"), idxCol(input).as("idx"), rhoCol(input).as("rho"))
      .groupBy((groupCols :+ "idx").map(col): _*)
      .agg(max(col("rho")).as("r"))
    // re-alias (fresh exprIds) so the grid side of the self-join below
    // doesn't share attribute ids with obs
    val groupsDf = grid.getOrElse(
      obs.select(groupCols.map(c => col(c).as(c)): _*).distinct())
    val dense = groupsDf.crossJoin(spark.range(M).select(col("id").as("idx")))
    dense.join(obs, groupCols :+ "idx", "left")
      .withColumn("r", coalesce(col("r"), lit(0L)))
  }

  /** The exact-integer register sum term: 2^(61-r) as decimal(38,0). */
  def sumTerm(rCol: String): Column =
    expr(s"cast(shiftleft(1L, cast(61 - $rCol as int)) as decimal(38,0))")

  /** Raw HLL estimate from the summed term S = Σ2^(61-r): one IEEE op
    * chain, every literal explicit so an oracle can mirror it. */
  def rawEstimate(s: Column): Column =
    (((lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))) * lit(65536.0)) *
      lit(2305843009213693952.0)) / s.cast("double")
}
