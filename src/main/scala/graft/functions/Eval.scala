package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact model-evaluation / distribution-shape statistics, computed on
  * DICTIONARY-COMPRESSED ranks: every statistic here needs a rank or
  * cumulative over the VALUE distribution, which naively costs a
  * global sort of the corpus — but ranks only change at distinct
  * values, so one hash-agg collapses N rows to the value dictionary
  * (bounded by the value domain — ~40k cents buckets however many
  * events carry them) and the rank walk runs over that metadata-sized
  * table. Tie handling is exact by construction: a tie block's
  * aggregate rank contribution is a closed-form integer in
  * (count, cum-before), never a per-row position — so the result is
  * independent of physical row order at any parallelism.
  */
object Eval {

  /** Exact ROC-AUC via the rank-sum (Mann-Whitney) identity with
    * average ranks for ties: AUC = (Σ_pos rank − n⁺(n⁺+1)/2) ⁄ n⁺n⁻.
    * Doubled to stay integral (avg rank of a tie block is
    * cum_before + (c+1)/2 — a half-integer), the positives' doubled
    * rank-sum is Σ_v pos_v·(2·cum_before_v + c_v + 1): exact decimal
    * arithmetic end-to-end, AUC closes with ONE IEEE division, rounded
    * at 6. The cumulative walk is a single-partition window over the
    * value dictionary — metadata-sized by the object's contract.
    * `scoreCol` must be an exact integer column (cents — the repo
    * convention); `labelCol` a boolean. Returns one row
    * (n_pos, n_neg, auc); degenerate single-class input yields no rows
    * rather than a division by zero.
    */
  def aucExact(df: DataFrame, labelCol: Column, scoreCol: Column): DataFrame =
    aucFromCounts(
      df.select(scoreCol.cast("decimal(38,0)").as("__v"),
          when(labelCol, 1L).otherwise(0L).as("__pos"))
        .groupBy(col("__v"))
        .agg(count(lit(1)).as("__c"), sum(col("__pos")).as("__p")),
      "__v", "__c", "__p")

  /** [[aucExact]] from a pre-aggregated (score, count, positives)
    * dictionary — the form a STREAMING model monitor maintains:
    * per-score (count, positives) is a plain grouped streaming
    * aggregation (state bounded by the score domain however long the
    * stream runs — live AUC of a deployed model without buffering a
    * single row), and the batch-closed dictionary feeds this exact
    * same rank walk — certified by the fs_stream_auc parity gate.
    */
  def aucFromCounts(
      counts: DataFrame,
      valueCol: String,
      countCol: String,
      posCol: String): DataFrame = {
    val g = counts.select(col(valueCol).cast("decimal(38,0)").as("__v"),
      col(countCol).cast("long").as("__c"),
      col(posCol).cast("long").as("__p"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val s = g.select(col("__c"), col("__p"),
        coalesce(sum(col("__c")).over(w), lit(0L)).as("__cb"))
      .agg(
        sum(col("__p") * (lit(2) * col("__cb") + col("__c") + 1)).as("__s2"),
        sum(col("__p")).as("__np"),
        sum(col("__c") - col("__p")).as("__nn"))
    s.filter(col("__np") > 0 && col("__nn") > 0)
      .select(col("__np").cast("long").as("n_pos"),
        col("__nn").cast("long").as("n_neg"),
        round((col("__s2") - col("__np") * (col("__np") + 1)).cast("double") /
          (lit(2) * col("__np") * col("__nn")).cast("double"), 6).as("auc"))
  }

  /** Exact Gini concentration coefficient per key over a NON-NEGATIVE
    * exact-integer value column: G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) ⁄ (n·Σx)
    * on the ascending sort — the revenue/usage-concentration statistic.
    * A tie block of c copies of v after cum_before smaller rows
    * contributes v·(2·c·cum_before + c·(c+1)) to the doubled rank-sum
    * (invariant under any within-tie permutation), so the walk runs
    * per key over the value dictionary, never over raw rows. One
    * closing IEEE division, rounded at 6; all-zero keys are dropped by
    * the exact integer guard rather than dividing by zero.
    */
  def gini(df: DataFrame, keyCol: String, valueCol: Column): DataFrame =
    giniFromCounts(
      df.select(col(keyCol), valueCol.cast("decimal(38,0)").as("__v"))
        .groupBy(col(keyCol), col("__v"))
        .agg(count(lit(1)).as("__c")),
      keyCol, "__v", "__c")

  /** [[gini]] from a pre-aggregated (key, value, count) dictionary —
    * the form a STREAMING pipeline maintains: per-(key, value) counts
    * are a plain grouped streaming aggregation (state = the value
    * dictionary, bounded by the value domain however long the stream
    * runs), and the batch-closed dictionary feeds this exact same rank
    * walk — certified by the fs_stream_gini stream/batch-parity gate.
    */
  def giniFromCounts(
      counts: DataFrame,
      keyCol: String,
      valueCol: String,
      countCol: String): DataFrame = {
    val g = counts.select(col(keyCol), col(valueCol).cast("decimal(38,0)").as("__v"),
      col(countCol).cast("long").as("__c"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.select(col(keyCol), col("__v"), col("__c"),
        coalesce(sum(col("__c")).over(w), lit(0L)).as("__cb"))
      .groupBy(col(keyCol))
      .agg(
        sum(col("__c")).as("__n"),
        sum(col("__c") * col("__v")).as("__sv"),
        sum(col("__v") * (lit(2) * col("__c") * col("__cb") +
          col("__c") * (col("__c") + 1))).as("__num"))
      .filter(col("__n") * col("__sv") > 0)
      .select(col(keyCol), col("__n").cast("long").as("n"),
        round((col("__num") - (col("__n") + 1) * col("__sv")).cast("double") /
          (col("__n") * col("__sv")).cast("double"), 6).as("gini"))
  }

  /** Exact gains/lift table at `buckets` evenly-spaced population cuts
    * (the model-targeting complement of [[aucExact]]: "mail the top 5%
    * scored by the model — how many converters does that capture, and
    * at what lift over random?"). Per the object's contract everything
    * runs on the score DICTIONARY: cumulative (count, positives) walk
    * down the descending scores, then each cut k resolves to the ONE
    * dictionary block whose cumulative count crosses the rational rank
    * ceil(k·n/buckets) — floor((k·n + buckets−1)/buckets) in exact
    * integer arithmetic, never 0.05·n. The `buckets`-row spine rides a
    * broadcast non-equi join against the dictionary (metadata ×
    * constant — the 1-row-scalar pattern, allow-listed in the plan
    * contract). lift = (cum_pos·n)/(cum_n·total_pos) cross-multiplied
    * in exact integers with ONE closing IEEE division, rounded at 6.
    * Tie blocks straddling a cut report the block-closing cum_n — the
    * honest "score threshold" semantics (you cannot mail half a tie).
    */
  def liftTable(df: DataFrame, labelCol: Column, scoreCol: Column,
      buckets: Int = 20): DataFrame = {
    val g = df.select(scoreCol.cast("decimal(38,0)").as("__v"),
        when(labelCol, 1L).otherwise(0L).as("__pos"))
      .groupBy(col("__v"))
      .agg(count(lit(1)).as("__cnt"), sum(col("__pos")).as("__p"))
    val wOrd = Window.orderBy(col("__v").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g.select(col("__v"), col("__cnt"),
      sum(col("__cnt")).over(wOrd).as("cum_n"),
      sum(col("__p")).over(wOrd).as("cum_pos"))
    val totals = g.agg(sum(col("__cnt")).as("__n"), sum(col("__p")).as("__np"))
    val spine = df.sparkSession.range(1, buckets + 1L).toDF("bucket")
    val cut = expr(s"(bucket * __n + ${buckets - 1}) div $buckets")
    cum.crossJoin(broadcast(totals))
      .join(broadcast(spine),
        (col("cum_n") - col("__cnt") < cut) && (cut <= col("cum_n")))
      .select(col("bucket").cast("long").as("bucket"),
        cut.cast("long").as("cut"),
        col("__v").cast("long").as("score_cents"),
        col("cum_n").cast("long").as("cum_n"),
        col("cum_pos").cast("long").as("cum_pos"),
        round((col("cum_pos") * col("__n")).cast("double") /
          (col("cum_n") * col("__np")).cast("double"), 6).as("lift"),
        round(col("cum_pos").cast("double") /
          col("__np").cast("double"), 6).as("capture"))
  }

  /** Multiclass confusion matrix with per-cell rates: one row per
    * OBSERVED (actual, pred) pair — (actual, pred, n, n_actual,
    * n_pred, recall_frac, precision_frac). recall_frac on the diagonal
    * is per-class recall, precision_frac per-class precision; off-
    * diagonal cells read as "share of actual-c mass leaking to pred".
    * One hash-agg to the |classes|² dictionary, two dictionary-sized
    * self-rollups joined back — the corpus is touched ONCE. Exact
    * integer counts, two closing divisions rounded at 6.
    */
  def confusion(df: DataFrame, actualCol: Column, predCol: Column): DataFrame =
    confusionFromCounts(
      df.select(actualCol.as("actual"), predCol.as("pred"))
        .groupBy(col("actual"), col("pred")).agg(count(lit(1)).as("n")),
      "actual", "pred", "n")

  /** [[confusion]] over an ALREADY-AGGREGATED (actual, pred, count)
    * cell dictionary — the streaming-state entry point (a grouped
    * running count IS the matrix; fs_stream_confusion closes through
    * this), mirroring aucFromCounts / giniFromCounts / ksFromCounts.
    */
  def confusionFromCounts(
      cells0: DataFrame,
      actualCol: String,
      predCol: String,
      countCol: String): DataFrame = {
    val cells = cells0.select(col(actualCol).as("actual"),
      col(predCol).as("pred"), col(countCol).cast("long").as("n"))
    val rows = cells.groupBy(col("actual")).agg(sum(col("n")).as("n_actual"))
    val cols_ = cells.groupBy(col("pred")).agg(sum(col("n")).as("n_pred"))
    cells.join(broadcast(rows), Seq("actual")).join(broadcast(cols_), Seq("pred"))
      .select(col("actual"), col("pred"), col("n"),
        col("n_actual"), col("n_pred"),
        round(col("n").cast("double") / col("n_actual").cast("double"), 6)
          .as("recall_frac"),
        round(col("n").cast("double") / col("n_pred").cast("double"), 6)
          .as("precision_frac"))
  }

  /** Cohen's kappa — chance-corrected agreement between two labelings
    * (classifier vs gold, or two annotators): κ = (p_o − p_e)/(1 − p_e)
    * computed as the all-integer identity (N·Σdiag − Σ_c row_c·col_c) ⁄
    * (N² − Σ_c row_c·col_c), so no per-step proportion can drift
    * cross-engine; ONE closing division, rounded at 6. Everything
    * downstream of the one corpus hash-agg is |classes|-dictionary-
    * sized. Returns one row (n, n_agree, kappa); the degenerate
    * p_e = 1 case (both sides constant) yields no rows rather than 0/0.
    */
  def cohenKappa(df: DataFrame, actualCol: Column, predCol: Column): DataFrame = {
    val cells = df.select(actualCol.as("actual"), predCol.as("pred"))
      .groupBy(col("actual"), col("pred")).agg(count(lit(1)).as("__n"))
    val rows = cells.groupBy(col("actual")).agg(sum(col("__n")).as("__r"))
    val cols_ = cells.groupBy(col("pred")).agg(sum(col("__n")).as("__c"))
    // row·col products in decimal BEFORE the sum: two classes over a
    // multi-billion-row corpus push Σ row·col past Long.MaxValue, and a
    // long wrap here corrupts the p_e = 1 guard and kappa silently
    val e = rows.join(cols_, col("actual") === col("pred"))
      .agg(sum(col("__r").cast("decimal(38,0)") * col("__c").cast("decimal(38,0)"))
        .as("__e"))
    val d = cells.agg(
      sum(col("__n")).as("__nn"),
      sum(when(col("actual") === col("pred"), col("__n")).otherwise(lit(0L))).as("__diag"))
    d.crossJoin(e)
      // classes missing from one side contribute 0 to Σ row·col — the
      // inner join drops them, matching the closed-form convention
      .select(col("__nn").cast("long").as("n"),
        col("__diag").cast("long").as("n_agree"),
        col("__nn").cast("decimal(38,0)").as("__nd"),
        col("__diag").cast("decimal(38,0)").as("__dd"),
        coalesce(col("__e"), lit(0L)).cast("decimal(38,0)").as("__ee"))
      .filter(col("__nd") * col("__nd") =!= col("__ee"))
      .select(col("n"), col("n_agree"),
        round((col("__nd") * col("__dd") - col("__ee")).cast("double") /
          (col("__nd") * col("__nd") - col("__ee")).cast("double"), 6).as("kappa"))
  }

  /** Kaplan-Meier product-limit survival estimator over
    * (duration, observed) rows — the time-to-event readout behind every
    * retention / churn / time-to-failure analysis. Input: one row per
    * subject with an exact-INTEGER `durationCol` (the repo convention:
    * pre-bucketed hours/days, never raw floats) and a boolean
    * `observedCol` (false = right-censored at that duration). Output:
    * one row per distinct duration with ≥1 observed event —
    * (t, n_risk, n_event, survival) where survival = Π_{u≤t}
    * (1 − d_u/n_u).
    *
    * Shape: one hash-agg collapses N subjects to the duration
    * dictionary (metadata-sized — the object's contract), then the
    * risk-set walk and the product run as windows over that dictionary,
    * never the corpus. Determinism: n/d are exact integers (the
    * cumulative risk set is total − running-sum, all integer); each
    * step factor (n−d)/n is ONE IEEE division; the running product is
    * exp∘Σ∘ln in ascending-t order — the same transcendental doctrine
    * as PSI/surprisal — closed by one round(6).
    */
  def kaplanMeier(
      df: DataFrame, durationCol: Column, observedCol: Column): DataFrame = {
    val steps = df.select(durationCol.cast("long").as("t"),
        observedCol.cast("boolean").as("obs"))
      .groupBy(col("t")).agg(
        count(lit(1)).as("c"),
        sum(when(col("obs"), 1L).otherwise(0L)).as("d"))
    val wt = Window.orderBy(col("t"))
    steps
      .withColumn("n_risk",
        sum(col("c")).over(wt.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .filter(col("d") > 0)
      .withColumn("survival", round(exp(sum(
        log((col("n_risk") - col("d")).cast("double") / col("n_risk").cast("double")))
        .over(wt.rowsBetween(Window.unboundedPreceding, Window.currentRow))), 6))
      .select(col("t"), col("n_risk"), col("d").as("n_event"), col("survival"))
  }
}
