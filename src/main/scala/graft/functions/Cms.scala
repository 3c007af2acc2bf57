package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Count-Min sketch as plain rows (Cormode & Muthukrishnan
  * 2005) — the frequency-estimate companion to [[Hll]]: a (j, bucket,
  * c) counter table of d·w rows, built in ONE pass over the stream
  * (posexplode of the d bucket ids + hash-agg, map-side combinable),
  * mergeable across shards/partitions/days by plain SUM, point-queried
  * by MIN over the d row estimates. Counts never underestimate; the
  * overestimate is bounded by εN with ε = e/w at confidence 1-e^-d.
  * Everything is integer arithmetic on md5-derived buckets, so sketch
  * AND estimates reproduce bit-for-bit in any engine — a CMS stored as
  * parquet is queryable by the warehouse, not just by Spark.
  */
object Cms {

  val D = 4
  val W = 1024

  /** Bucket id of `input` under hash row j. */
  def bucket(j: Int, input: Column): Column =
    pmod(conv(substring(md5(concat(lit(s"cms$j:"), input)), 1, 8), 16, 10).cast("long"),
      lit(W.toLong))

  /** Build the (j, bucket, c) counter table over one string column. */
  def sketch(df: DataFrame, input: Column): DataFrame =
    df.select(posexplode(array((0 until D).map(j => bucket(j, input)): _*)).as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("c"))

  /** Point-query the sketch for each row of `terms`: min over the d
    * counter rows (absent bucket → 0). Returns (termCol, cms_est). */
  def estimate(sketch: DataFrame, terms: DataFrame, termCol: String): DataFrame =
    terms.select(col(termCol),
        posexplode(array((0 until D).map(j => bucket(j, col(termCol))): _*)).as(Seq("j", "bucket")))
      .join(sketch, Seq("j", "bucket"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .groupBy(col(termCol)).agg(min(col("c")).as("cms_est"))
}
