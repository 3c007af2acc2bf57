package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring (extension — the post-deploy feature
  * check a feature store runs between a reference window and the
  * current window of the same series). One hash-agg builds both
  * histograms in a single pass (conditional counts per bin); totals
  * stitch in via a bounded 1-row cross join. Per-bin drift is the
  * chi-square-style `(p_cur - p_ref)^2 / p_ref` term — squares are
  * written as plain multiplies, NOT pow(), and proportions divide
  * exact integer counts, so every output double is one fixed sequence
  * of IEEE ops reproducible across engines; there is deliberately no
  * log()-based PSI here because libm ln() is not bit-stable across
  * engines (same reason txt_keywords scores tf*N/df instead of idf).
  */
object Drift {

  /** Per-bin histogram comparison: rows where `isReference` holds form
    * the reference distribution, the rest the current one. Values below
    * 0 clamp into bin 0, values beyond the last edge into bin nBins-1,
    * so outliers are visible at the edges instead of silently dropped;
    * nulls AND NaNs are excluded (constraint-check them with
    * [[DataQuality]]) — a NaN has no meaningful bin, and engines
    * disagree on where floor/greatest/least arithmetic lands it
    * (Spark's NaN-ordering clamps differently than DuckDB's), so
    * binning it would silently corrupt counts AND break oracle parity.
    */
  def histogramCompare(
      df: DataFrame,
      valueCol: String,
      isReference: Column,
      binWidth: Double,
      nBins: Int): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val bin = least(greatest(floor(col(valueCol) / binWidth), lit(0L)),
      lit((nBins - 1).toLong)).cast("long")
    val counts = df.filter(col(valueCol).isNotNull && !isnan(col(valueCol)))
      .groupBy(bin.as("bin"))
      .agg(
        sum(when(isReference, 1L).otherwise(0L)).as("n_ref"),
        sum(when(isReference, 0L).otherwise(1L)).as("n_cur"))
    val totals = counts.agg(sum(col("n_ref")).as("__tr"), sum(col("n_cur")).as("__tc"))
    // Zero-total guard — LOAD-BEARING on both engines: under this
    // build's ANSI-on Spark default, an unguarded double division by
    // zero THROWS (DIVIDE_BY_ZERO — verified on Spark 4.1.2, despite
    // earlier comments here claiming NULL), and DuckDB's yields IEEE
    // Inf/NaN; the when(total > 0) makes the empty-window proportion
    // NULL on the Spark side, and any SQL oracle over this output must
    // carry the SAME zero-total CASE guard (q_drift_hist's does) for
    // NULL-for-NULL parity.
    def prop(n: Column, total: Column): Column =
      when(total > 0, n.cast("double") / total.cast("double"))
    counts.crossJoin(totals)
      .select(col("bin"), col("n_ref"), col("n_cur"),
        prop(col("n_ref"), col("__tr")).as("p_ref"),
        prop(col("n_cur"), col("__tc")).as("p_cur"))
      .withColumn("drift",
        when(col("n_ref") > 0,
          round((col("p_cur") - col("p_ref")) * (col("p_cur") - col("p_ref")) /
            col("p_ref"), 6)))
  }

  /** Exact two-sample Kolmogorov-Smirnov statistic per key — the
    * CONTINUOUS-value drift twin of [[histogramCompare]] (no binning
    * decision, sensitive to any CDF divergence, the classic
    * feature-drift alarm): KS = max_v |F_ref(v) − F_cur(v)|. Computed
    * entirely in integer space: the max runs over
    * |cum_ref·n_cur − cum_cur·n_ref| (the CDF difference scaled by
    * n_ref·n_cur — exact decimals, no per-step division), and KS
    * closes with ONE IEEE division, rounded at 6. The cumulative walk
    * is a per-key window over the DISTINCT values — the [[Eval]]
    * dictionary-compression contract, so a 100 TB scan collapses to
    * one hash-agg + a value-dictionary-sized walk. `valueCol` must be
    * an exact integer column (cents); keys with an empty side are
    * dropped by the integer guard rather than dividing by zero.
    */
  def ksCompare(
      df: DataFrame,
      keyCol: String,
      valueCol: Column,
      isReference: Column): DataFrame = {
    val g = df.select(col(keyCol), valueCol.cast("decimal(38,0)").as("__v"),
        when(isReference, 1L).otherwise(0L).as("__r"))
      .groupBy(col(keyCol), col("__v"))
      .agg(sum(col("__r")).as("__c1"), sum(lit(1L) - col("__r")).as("__c2"))
    ksFromCounts(g, keyCol, "__v", "__c1", "__c2")
  }

  /** [[ksCompare]] over an ALREADY-AGGREGATED per-(key, value)
    * count dictionary — the entry point for state a streaming query
    * maintains (fs_stream_drift closes its grouped (ref, cur) counts
    * through this) or for pre-rolled histograms a catalog stores. Same
    * integer-exact walk and single closing division.
    */
  def ksFromCounts(
      counts: DataFrame,
      keyCol: String,
      valueCol: String,
      refCountCol: String,
      curCountCol: String): DataFrame = {
    val g = counts.select(col(keyCol), col(valueCol).as("__v"),
      col(refCountCol).cast("decimal(38,0)").as("__c1"),
      col(curCountCol).cast("decimal(38,0)").as("__c2"))
    val cum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    g.select(col(keyCol),
        sum(col("__c1")).over(cum).as("__cum1"),
        sum(col("__c2")).over(cum).as("__cum2"),
        sum(col("__c1")).over(tot).as("__n1"),
        sum(col("__c2")).over(tot).as("__n2"))
      .groupBy(col(keyCol))
      .agg(max(abs(col("__cum1") * col("__n2") - col("__cum2") * col("__n1"))).as("__d"),
        first(col("__n1")).as("__n1"), first(col("__n2")).as("__n2"))
      .filter(col("__n1") > 0 && col("__n2") > 0)
      .select(col(keyCol),
        col("__n1").cast("long").as("n_ref"),
        col("__n2").cast("long").as("n_cur"),
        round(col("__d").cast("double") /
          (col("__n1") * col("__n2")).cast("double"), 6).as("ks"))
  }
}
