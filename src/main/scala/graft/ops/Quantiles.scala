package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles (`quantile_cont` semantics: linear
  * interpolation between the two enclosing order statistics).
  *
  * Spark's built-in exact `percentile()` is a heap-buffering aggregate:
  * one group means ALL of that group's values in one executor's
  * aggregation buffer — the single remaining memory scale-killer a
  * low-cardinality 100 TB `groupBy(percentile)` would hit. This is the
  * two-phase formulation instead, generalizing [[Pack]]'s distributed
  * prefix sum from token offsets to rank offsets:
  *
  *   1. collapse the input to distinct `(group, value)` pairs with
  *      counts — a hash aggregation with map-side partials (2-decimal
  *      metric streams collapse ~100:1; worst case the frame is the
  *      input's distinct values, never bigger);
  *   2. range-repartition the counts on `(group, value)` and sort
  *      within partitions — each slice holds a contiguous run of one
  *      or more groups' value ranges;
  *   3. per-(slice, group) count subtotals — a metadata-sized frame
  *      (slices x groups rows) whose exclusive prefix per group is each
  *      slice's starting RANK; group totals `n` fall out of the same
  *      frame;
  *   4. broadcast offsets + totals back, running-sum WITHIN each slice
  *      (parallel across slices) — every distinct value now knows its
  *      global 0-based rank interval `[cum - cnt, cum)` in its group;
  *   5. for quantile p: `h = p*(n-1)`, `k = floor(h)` — keep only the
  *      rows whose rank interval covers `k` or `k+1` (<= 2 rows per
  *      group per quantile), one tiny hash-agg, interpolate.
  *
  * Peak per-task state is one range slice of DISTINCT values —
  * independent of group sizes — and the result is exact, not an
  * approx_percentile sketch. Null values are ignored (like
  * `percentile` / `quantile_cont`); a group whose values are ALL null
  * is absent from the output (the built-in would emit a null row).
  *
  * Storage note (same discipline as [[graft.functions.Components]]):
  * the result plan is backed by the ranged frame's `localCheckpoint`,
  * whose blocks Spark's ContextCleaner frees once the returned frame
  * becomes unreachable — a long-lived application calling this per
  * batch should drop its reference between batches.
  *
  * Cardinality bound: the broadcast offsets/totals frames are
  * O(slices + groups) ROWS — independent of data volume, but NOT of
  * group count. Tens of millions of groups would hit Spark's broadcast
  * size limit / driver memory as a hard failure, not a slowdown; such
  * callers must pass `broadcastMeta = false`, which swaps the two hints
  * for plain shuffle joins (the per-task state bound is unchanged —
  * only the metadata join strategy differs).
  */
object Quantiles {

  private val PID = "__q_pid"
  private val CNT = "__q_cnt"
  private val SUB = "__q_sub"
  private val OFF = "__q_off"
  private val CUM = "__q_cum"
  private val NTOT = "__q_n"

  /** Adds one output column per `(name, p)` with the exact interpolated
    * p-quantile of `valueCol` per `groupCols` combination.
    */
  def quantileCont(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      ps: Seq[(String, Double)],
      numPartitions: Option[Int] = None,
      broadcastMeta: Boolean = true): DataFrame = {
    require(ps.nonEmpty, "no quantiles requested")
    ps.foreach { case (n, p) =>
      require(p >= 0.0 && p <= 1.0, s"quantile '$n' out of [0,1]: $p")
    }
    val internal = Seq(PID, CNT, SUB, OFF, CUM, NTOT)
    val collisions = df.columns.filter(internal.contains)
    require(collisions.isEmpty,
      s"input columns collide with quantileCont internals: ${collisions.mkString(", ")}")
    val spark = df.sparkSession
    val n = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val keys = (groupCols :+ valueCol).map(col)

    // 1) distinct values + multiplicities (nulls ignored, like the
    //    built-in), then 2) a contiguous range layout. localCheckpoint
    //    for the same reason as Pack: range partitioning SAMPLES its
    //    boundaries, and the subtotal pass and the rank pass must see
    //    the SAME physical slices — a recompute could re-draw them.
    val ranged = df
      .filter(col(valueCol).isNotNull)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as(CNT))
      .repartitionByRange(n, keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn(PID, spark_partition_id())
      .localCheckpoint(true)

    // 3) slice subtotals -> per-slice starting rank + group totals
    val slices = ranged
      .groupBy((PID +: groupCols).map(col): _*)
      .agg(sum(col(CNT)).as(SUB))
    val offW = Window.partitionBy(groupCols.map(col): _*).orderBy(col(PID))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = slices
      .withColumn(OFF, coalesce(sum(col(SUB)).over(offW), lit(0L)))
      .drop(SUB)
    val totals = slices
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col(SUB)).as(NTOT))

    // 4) global rank interval per distinct value: [CUM - CNT, CUM).
    //    Joins are NULL-SAFE (<=>): percentile()/quantile_cont emit a
    //    row for a NULL group key, and a plain using-column equi-join
    //    would silently drop that whole group (its offsets/totals rows
    //    never match back).
    val inW = Window.partitionBy((PID +: groupCols).map(col): _*)
      .orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r = ranged.alias("r")
    val o = offsets.alias("o")
    val offCond = (PID +: groupCols)
      .map(c => col(s"r.`$c`") <=> col(s"o.`$c`")).reduce(_ && _)
    val withOff = r.join(if (broadcastMeta) broadcast(o) else o, offCond)
      .select(col("r.*"), col(s"o.`$OFF`"))
      .withColumn(CUM, sum(col(CNT)).over(inW) + col(OFF))
    val c0 = withOff.alias("c")
    val t0 = totals.alias("t")
    val totCond =
      if (groupCols.isEmpty) lit(true)
      else groupCols.map(c => col(s"c.`$c`") <=> col(s"t.`$c`")).reduce(_ && _)
    val rankedAll = c0.join(if (broadcastMeta) broadcast(t0) else t0, totCond)
      .select(col("c.*"), col(s"t.`$NTOT`"))

    // 5) keep only rank-k / rank-(k+1) carriers, agg, interpolate
    def kOf(p: Double): Column =
      floor(lit(p) * (col(NTOT) - lit(1)).cast("double")).cast("long")
    def kHiOf(p: Double): Column = least(kOf(p) + lit(1), col(NTOT) - lit(1))
    def covers(r: Column): Column = col(CUM) - col(CNT) <= r && r < col(CUM)

    val anyHit = ps.map { case (_, p) => covers(kOf(p)) || covers(kHiOf(p)) }
      .reduce(_ || _)
    val tagged = rankedAll.filter(anyHit).select(
      groupCols.map(col) ++ Seq(col(NTOT)) ++ ps.flatMap { case (nm, p) =>
        Seq(
          when(covers(kOf(p)), col(valueCol)).as(s"__lo_$nm"),
          when(covers(kHiOf(p)), col(valueCol)).as(s"__hi_$nm"))
      }: _*)
    val aggd = tagged.groupBy(groupCols.map(col): _*).agg(
      max(col(NTOT)).as(NTOT),
      ps.flatMap { case (nm, _) =>
        Seq(max(col(s"__lo_$nm")).as(s"__lo_$nm"), max(col(s"__hi_$nm")).as(s"__hi_$nm"))
      }: _*)
    aggd.select(groupCols.map(col) ++ ps.map { case (nm, p) =>
      val h = lit(p) * (col(NTOT) - lit(1)).cast("double")
      val frac = h - floor(h)
      (col(s"__lo_$nm") + frac * (col(s"__hi_$nm") - col(s"__lo_$nm"))).as(nm)
    }: _*)
  }
}
