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
}
