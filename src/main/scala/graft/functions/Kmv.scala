package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-minimum-values sketch (Bar-Yossef et al. 2002) — the third leg of
  * the deterministic sketch suite ([[Hll]] cardinality, [[Cms]]
  * frequency): bottom-k md5 hashes of the DISTINCT values per group.
  * Because md5 induces one global, engine-independent order, the
  * sketch doubles as a deterministic uniform sample of the distinct
  * values — usable for quantile estimation on data too wide to sort —
  * and merges by re-taking the bottom k of a union (min-k is
  * associative). Distinct-count estimator: (k-1) · 2^60 / h_k with h_k
  * the k-th smallest 60-bit hash; below k distinct values the sketch
  * IS the value set and the count is exact. All arithmetic is one IEEE
  * division over exact integers — bit-reproducible cross-engine.
  *
  * Scale shape: one distinct (hash-agg) pass, then a per-group
  * bottom-k via row_number — Spark plans the rank filter as a
  * WindowGroupLimit partial top-k, so no group ever materializes
  * beyond k rows per task.
  */
object Kmv {

  /** 2^60 as an exact long (the hash domain size). */
  val HashDomain = 1152921504606846976L

  def hash(input: Column): Column =
    conv(substring(md5(concat(lit("kmv:"), input)), 1, 15), 16, 10).cast("long")

  /** Bottom-k sketch rows: (groupCols…, v, h, rk), rk in [1, k]. */
  def sketch(df: DataFrame, groupCols: Seq[String], input: Column, k: Int): DataFrame = {
    require(k > 1, s"k must be > 1, got $k")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("h"), col("v"))
    df.select((groupCols.map(col) :+ input.as("v")): _*).distinct()
      .withColumn("h", hash(col("v")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Per-group distinct-count estimate from a [[sketch]] result:
    * exact when the sketch holds fewer than k values. */
  def distinctEstimate(sk: DataFrame, groupCols: Seq[String], k: Int): DataFrame =
    sk.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_sample"), max(col("h")).as("h_k"))
      .select((groupCols.map(col) :+
        when(col("n_sample") < k, col("n_sample").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(HashDomain.toDouble) / col("h_k").cast("double"))
          .as("distinct_est")): _*)

  /** Theta-sketch set-operation estimates between TWO groups of one
    * [[sketch]] build (the DataSketches theta formulation grown out of
    * KMV): union / intersection cardinalities WITHOUT ever joining the
    * underlying sets — at 100 TB, overlap of two billion-member ID
    * sets from two k-row sketches.
    *
    * theta_X = h_k(X) when the group filled its k slots, else the full
    * hash domain (the sketch IS the set — estimates degrade to exact
    * counts, the same documented small-side branch as
    * [[distinctEstimate]]). With theta = min(theta_A, theta_B), every
    * sketch hash below theta is a fixed-rate uniform sample of BOTH
    * sets, so |sample ∩| and |sample ∪| scale by domain/theta.
    * Counts are exact integers and md5 gives one global order, so the
    * two closing IEEE ops reproduce bit-for-bit cross-engine.
    *
    * Returns one row: (union_est, inter_est, containment jaccard_est =
    * i/u on the sample — exact rational over sampled ints, closed with
    * one division).
    */
  def thetaSetEstimates(
      sk: DataFrame,
      groupCol: String,
      gA: String,
      gB: String,
      k: Int): DataFrame = {
    val two = sk.filter(col(groupCol).isin(gA, gB))
    val theta = two.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), max(col("h")).as("hk"))
      .select(min(when(col("n") < k, lit(HashDomain)).otherwise(col("hk"))).as("theta"))
    val scale = lit(HashDomain.toDouble)
    two.crossJoin(broadcast(theta)).filter(col("h") < col("theta"))
      .groupBy(col("h"), col("theta"))
      .agg(countDistinct(col(groupCol)).as("ng"))
      .groupBy(col("theta"))
      .agg(count(lit(1)).as("u"),
        sum(when(col("ng") === 2, 1L).otherwise(0L)).as("i"))
      .select(
        (col("u").cast("double") * scale / col("theta").cast("double")).as("union_est"),
        (col("i").cast("double") * scale / col("theta").cast("double")).as("inter_est"),
        (col("i").cast("double") / col("u").cast("double")).as("jaccard_est"))
  }
}
