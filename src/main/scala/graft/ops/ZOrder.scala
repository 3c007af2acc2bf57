package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimensional file-layout
  * primitive behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleave the
  * bits of several dimensions into ONE sort key, so that range-sorting
  * files by that key gives EVERY dimension locality. A file then covers
  * a small hyper-rectangle of the dim space instead of a thin slab of
  * the first sort column, and min/max footer stats prune files for
  * predicates on ANY z-dimension — a linear sort prunes perfectly on
  * its leading column and not at all on the others (ZOrderSpec measures
  * exactly this trade on a 2-dim layout).
  *
  * The interleave is pure integer shifts/masks — bit-identical in every
  * engine (the DuckDB oracle replays it term-for-term via
  * [[oracleInterleaveExpr]]), no hashing, no floats. Dimensions are
  * masked to `bits` low bits; callers bucketize skewed/wide dims first
  * (day numbers, range-bucket ids, `user_id % 2^bits` — the classic
  * formulation interleaves range-partition ranks, which is just a
  * pre-computed bucket column here).
  *
  * Scale shape (100 TB): computing the key is a narrow per-row
  * projection fused into the scan; `cluster` is ONE
  * repartitionByRange(zkey) shuffle + in-partition sort — the same
  * cost as the linear-sort layout it replaces, and the write path's
  * per-file min/max stats (TimeseriesStore.timeStatsMicros shape) do
  * the rest at read time. Re-clustering after appends is the txlog
  * compaction with `cluster` as its layout stage.
  */
object ZOrder {

  /** Morton-interleave `dims` (longs, masked to `bits` low bits each)
    * into one long: bit j of dim d lands at position j*dims.size + d.
    * dims.size * bits <= 62 keeps every intermediate in a signed long.
    */
  def interleave(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty, "at least one dimension")
    require(bits >= 1 && dims.size * bits <= 62,
      s"need 1 <= bits and dims*bits <= 62, got ${dims.size} x $bits")
    val n = dims.size
    val terms = for {
      (dim, d) <- dims.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(dim, j).bitwiseAND(lit(1L)), j * n + d)
    terms.reduce(_ bitwiseOR _)
  }

  /** The SAME interleave as a DuckDB SQL expression over pre-named
    * integer columns — kept here so gate SQL can never drift from the
    * Spark build. */
  def oracleInterleaveExpr(dims: Seq[String], bits: Int): String = {
    val n = dims.size
    (for {
      (dim, d) <- dims.zipWithIndex
      j <- 0 until bits
    } yield s"((($dim >> $j) & 1) << ${j * n + d})").mkString(" | ")
  }

  /** Cluster `df` for writing: one range shuffle on the z-key into
    * `numFiles` output splits, sorted within each so parquet row-group
    * stats stay tight on every dimension. The z-key is dropped — it is
    * a layout device, not data.
    */
  def cluster(df: DataFrame, dims: Seq[Column], bits: Int, numFiles: Int): DataFrame =
    df.withColumn("__zkey", interleave(dims, bits))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
}
