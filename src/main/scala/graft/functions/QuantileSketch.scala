package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log-linear quantile sketch — the fourth leg of the deterministic
  * sketch suite ([[Hll]] cardinality, [[Cms]] frequency, [[Kmv]]
  * distinct sampling): a mergeable histogram whose buckets guarantee a
  * RELATIVE error bound, the DDSketch / HdrHistogram family (Masson,
  * Rim & Lee, VLDB 2019) re-derived in exact integer arithmetic.
  *
  * Why not the textbook formulation: DDSketch buckets on
  * ceil(ln(x)/ln(gamma)) — a libm double round-trip whose last-ulp
  * behavior differs across engines, so a value sitting on a bucket
  * boundary can land differently in Spark and DuckDB and a hash gate
  * would need a tolerance crutch. Here the bucket is derived from the
  * BIT LENGTH of the integer-scaled value: keep the top `s+1`
  * significant bits, zero the rest —
  *
  *   okey(v) = sign(v) * ((|v| >> g) << g),  g = max(0, bitlen(|v|)-1-s)
  *
  * pure shifts and comparisons, bit-identical in every engine
  * (bitlen = length(bin(x)) — both Spark and DuckDB print unpadded
  * binary). Bucket width is 2^g <= |v| * 2^-s, so the lower-edge
  * estimate under-reports a true quantile by at most a factor 2^-s
  * (s=7 -> 0.79%); estimates are EXACTLY reproducible, not just
  * approximately close.
  *
  * The sketch IS a plain row table (group, okey, cnt) — the suite's
  * doctrine: merging is a SUM over okey (associative, commutative), so
  * it pre-aggregates map-side, rolls across windows, and persists as a
  * tiny table (<= 64*2^s buckets per sign per group regardless of
  * corpus size). On a stream it is exactly the grouped running count
  * Structured Streaming already maintains — bounded state where a
  * sorted-quantile operator would buffer the unbounded input
  * (`fs_stream_quantile` certifies stream/batch parity).
  *
  * Quantiles use the nearest-rank definition rank = ceil(q*n) with q a
  * RATIONAL num/den: the rank is floor((num*n + den-1)/den) — integer
  * arithmetic, so no 0.9*n float product can straddle an integer
  * differently across engines. (Exact interpolated quantiles live in
  * `ops/Quantiles`; this sketch trades their full (group, value)
  * shuffle for a fixed-size mergeable summary.)
  *
  * Scale shape (100 TB): one narrow projection computes okey inline
  * with the scan, one hash-agg with map-side partial combine shuffles
  * only (group, okey) pairs — at most a few thousand distinct okeys
  * per group however many rows feed them. Quantile extraction runs on
  * the sketch table alone (window cumsum over <= 8k rows per group).
  *
  * Reference frame: the bytehub reference exposes pandas `describe`-
  * style percentiles post-load (`bytehub/_timeseries.py` leaves stats
  * to the client); at 100 TB the client-side sort that implies is the
  * operator this sketch replaces.
  */
object QuantileSketch {

  /** Signed log-linear bucket key of an integer-scaled value: the
    * value with all but its top `s`+1 significant bits zeroed, sign
    * preserved. Deterministic integer arithmetic end-to-end.
    */
  def bucketKey(scaled: Column, s: Int): Column = {
    require(s >= 1 && s <= 20, s"sub-bucket bits must be in [1, 20], got $s")
    val av = abs(scaled)
    // bitlen via the native bin-length (graft.plans.BinLength — the
    // codegen'd 64-nlz twin of length(bin(x)), no per-row string):
    // bin(0)="0" -> length 1 -> msb 0 -> g = 0
    val msb = (graft.plans.BinLength.binLen(av) - lit(1)).cast("int")
    val g = greatest(lit(0), msb - lit(s))
    val edge = call_function("shiftleft", call_function("shiftright", av, g), g)
    when(scaled > 0, edge).when(scaled < 0, -edge).otherwise(lit(0L))
  }

  /** Build the sketch: (groupCols…, okey, cnt). `input` is a numeric
    * column scaled by `scale` into integer space (the repo's 2-decimal
    * doubles use scale=100); `round` absorbs float representation fuzz
    * (0.07*100 = 7.000000000000001) before the integer cast.
    */
  def sketch(
      df: DataFrame,
      groupCols: Seq[String],
      input: Column,
      s: Int = 7,
      scale: Int = 100): DataFrame = {
    val scaled = round(input * lit(scale), 0).cast("long")
    df.select(groupCols.map(col) :+ bucketKey(scaled, s).as("okey"): _*)
      .groupBy((groupCols :+ "okey").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches over the same grouping: union + re-sum. Counts are
    * additive per bucket, so merge(sketch(A), sketch(B)) ==
    * sketch(A ∪ B) EXACTLY (asserted by QuantileSketchSpec).
    */
  def merge(sketches: DataFrame*): DataFrame = {
    val u = sketches.reduce(_ unionByName _)
    val groupCols = u.columns.filterNot(c => c == "okey" || c == "cnt").toSeq
    u.groupBy((groupCols :+ "okey").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Nearest-rank quantile estimates from a sketch: one row per group,
    * one double column per requested (name, num, den) rational
    * quantile, plus `n` (exact total count). The estimate is the
    * bucket's signed lower edge / scale — a deterministic
    * under-estimate within relative 2^-s of the true quantile.
    */
  def quantiles(
      sk: DataFrame,
      groupCols: Seq[String],
      qs: Seq[(String, Int, Int)],
      scale: Int = 100): DataFrame = {
    require(qs.nonEmpty, "at least one quantile")
    qs.foreach { case (name, num, den) =>
      require(num >= 1 && num <= den, s"quantile $name: need 1 <= num <= den, got $num/$den")
    }
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("okey"))
    val wt = Window.partitionBy(groupCols.map(col): _*)
    val cum = sk
      .withColumn("__cum", sum(col("cnt")).over(w))
      .withColumn("__n", sum(col("cnt")).over(wt))
    val aggs = qs.map { case (name, num, den) =>
      // rank = ceil(num*n/den) = floor((num*n + den-1)/den); the double
      // division is exact here (operands are exact integers < 2^53 and
      // an integer-valued quotient divides exactly in IEEE)
      val rank = floor((lit(num.toLong) * col("__n") + lit((den - 1).toLong)) / lit(den.toDouble)).cast("long")
      min(when(col("__cum") >= rank, col("okey"))).as(s"__k_$name")
    } :+ max(col("__n")).as("n")
    cum.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(groupCols.map(col) ++
        qs.map { case (name, _, _) =>
          (col(s"__k_$name").cast("double") / lit(scale.toDouble)).as(name)
        } :+ col("n"): _*)
  }

  /** The oracle-side replay of [[bucketKey]]+[[sketch]] as DuckDB CTEs:
    * kept HERE so the Spark build and the SQL twin can never drift
    * apart silently — QueryLib's gates interpolate this string.
    * `src` must expose (groupCol, `v`).
    */
  def oracleSketchCtes(src: String, groupCol: String, s: Int, scale: Int): String =
    s"""c AS (SELECT $groupCol, CAST(round(v * $scale) AS BIGINT) AS cents FROM $src),
       |g AS (SELECT $groupCol, cents, greatest(0, length(bin(abs(cents))) - 1 - $s) AS gg FROM c),
       |k AS (SELECT $groupCol,
       |    CASE WHEN cents > 0 THEN 1 WHEN cents < 0 THEN -1 ELSE 0 END
       |      * ((abs(cents) >> gg) << gg) AS okey FROM g),
       |sk AS (SELECT $groupCol, okey, count(*) AS cnt FROM k GROUP BY 1, 2),
       |cum AS (SELECT $groupCol, okey, cnt,
       |    sum(cnt) OVER (PARTITION BY $groupCol ORDER BY okey) AS cum,
       |    sum(cnt) OVER (PARTITION BY $groupCol) AS n FROM sk)""".stripMargin
}
