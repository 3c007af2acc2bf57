package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed interval (range) join that never degrades to a nested-loop
  * plan. Spark resolves `a.key = b.key AND b.ts BETWEEN a.start AND
  * a.end` as a SortMergeJoin on the equi-key with the range as a
  * post-join residual — correct, but each key group is an all-pairs
  * product: a hot key with 10^5 intervals × 10^6 points materializes
  * 10^11 candidate rows before the filter. The bucketed form bounds the
  * candidate set structurally: both sides are binned on a fixed time
  * grid, the interval side is exploded into every bin its [start, end)
  * span overlaps, and the join becomes an equi-join on (key, bin) with
  * the exact range check left as a residual. A point lives in exactly
  * one bin, so no post-join dedup is needed; the fan-out cost is
  * ceil(span / binWidth) + 1 rows per interval — chosen close to the
  * typical span, that's ~2×, and the (key, bin) hash spreads a hot key
  * across every bin it covers instead of one shuffle partition.
  *
  * Bin ids use `div` (truncation): identical to floor for the
  * post-epoch timestamps this engine stores (micros >= 0).
  */
object IntervalJoin {

  /** Join `points` (key, ts, …) to `intervals` (key, start, end, …) on
    * key equality and `start <= ts < end`. Column names must not
    * collide apart from `key`. `binMicros` is the bucketing grid width;
    * size it near the typical interval span.
    */
  def binned(
      intervals: DataFrame,
      points: DataFrame,
      key: String,
      start: String,
      end: String,
      ts: String,
      binMicros: Long): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    // end is exclusive: an interval ending exactly on a bin edge does
    // not overlap that bin, hence the -1 before the div. Empty and
    // inverted intervals (end <= start) can match nothing by definition
    // — drop them BEFORE the explode, where Spark's descending
    // sequence(a, b) for b < a would otherwise fabricate |span|/bin
    // candidate rows per bad interval.
    val iv = intervals.filter(col(end) > col(start)).withColumn("_bin",
      explode(sequence(
        expr(s"unix_micros($start) div ${binMicros}L"),
        expr(s"(unix_micros($end) - 1) div ${binMicros}L"))))
    val pt = points.withColumn("_bin", expr(s"unix_micros($ts) div ${binMicros}L"))
    iv.join(pt, Seq(key, "_bin"))
      .filter(col(ts) >= col(start) && col(ts) < col(end))
      .drop("_bin")
  }
}
