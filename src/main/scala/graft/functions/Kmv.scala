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
}
