package graft.ops

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row}
import org.apache.spark.sql.functions._

/** Skew and co-location utilities — the knobs a 100 TB deployment turns
  * when AQE's automatic skew handling isn't enough or when repeated
  * joins justify physical co-location.
  */
object Scale {

  /** Two-phase salted last-writer-wins dedup for pathologically hot
    * keys (one `time`/entity receiving millions of upserts). Phase 1
    * aggregates per (keys, salt) — spreading one hot key over `salts`
    * reducers; phase 2 merges the per-salt winners. Correct because
    * max_by is associative: the winner of winners is the global winner.
    * Same contract as `TimeseriesOps.dedupLatest`; prefer the unsalted
    * form until a key is provably hot (it is one shuffle, this is two).
    */
  def dedupLatestSalted(
      df: DataFrame,
      salts: Int,
      timeCol: String = TimeseriesOps.TimeCol,
      createdCol: String = TimeseriesOps.CreatedCol,
      keyCols: Seq[String] = Nil): DataFrame = {
    require(salts > 1, s"salts must be > 1, got $salts")
    val S = "__salt"
    // deterministic spread: hash of the non-key columns mod salts;
    // hash() rejects MapType, so map-typed columns ride through to_json
    val others = df.columns.filterNot(c => (keyCols :+ timeCol).contains(c)).toSeq
    val saltInputs = others.map { c =>
      if (TimeseriesOps.isOrderable(df.schema(c).dataType)) col(c)
      else to_json(col(c))
    }
    // a frame with ONLY (keys, time) columns has nothing to salt on —
    // and nothing to dedup either (dedupLatest needs createdCol among
    // the non-key columns). Fail here with the real reason instead of
    // hash()'s cryptic zero-argument analysis error.
    require(saltInputs.nonEmpty,
      s"dedupLatestSalted needs at least one non-key column to salt on " +
        s"(is '$createdCol' present and not listed in keyCols?)")
    val salted = df.withColumn(S, pmod(hash(saltInputs: _*), lit(salts)))
    val phase1 = TimeseriesOps.dedupLatest(
      salted, timeCol, createdCol, keyCols = keyCols :+ S)
    TimeseriesOps.dedupLatest(phase1.drop(S), timeCol, createdCol, keyCols = keyCols)
  }

  /** Salted equi-join for a skewed big side against a dimension too
    * large (or hinted not) to broadcast: the big side gets a
    * deterministic salt in [0, salts) derived from `saltOn` (any
    * well-distributed big-side column — a row id, not the join key),
    * the small side is replicated once per salt value, and the join
    * runs on (key, salt) — so one hot key spreads over `salts` shuffle
    * partitions instead of serializing on one reducer. Output equals
    * the plain join bit-for-bit (the salt never reaches the result);
    * replication costs `salts` × |small|, so keep salts at the skew
    * factor, not in the hundreds. AQE's skew-join handles SORTS of
    * skew after the fact; salting is the structural fix when the skew
    * is known (low-cardinality keys, power-law ids).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int,
      saltOn: String): DataFrame = {
    require(salts > 1, s"salts must be > 1, got $salts")
    require(keys.nonEmpty, "saltedJoin needs at least one join key")
    val S = "__jsalt"
    val bigS = big.withColumn(S, pmod(hash(col(saltOn)), lit(salts)))
    val smallS = small.withColumn(S, explode(sequence(lit(0), lit(salts - 1))))
      // the point is the shuffled path: un-hinted, Catalyst would
      // broadcast a small dim and the salt would be pure overhead
      .hint("SHUFFLE_HASH")
    bigS.join(smallS, keys :+ S).drop(S)
  }

  /** Write a DataFrame as a bucketed+sorted table so repeated equi-joins
    * and aggregations on `keys` run with NO shuffle (bucket-local).
    * Bucketing requires the table catalog (`saveAsTable`), not a bare
    * path — Spark's shuffle-free co-location lives in table metadata.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      buckets: Int,
      keys: Seq[String],
      path: Option[String] = None): Unit = {
    val w: DataFrameWriter[Row] = df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
    // explicit location -> external table (callers owning their scratch
    // or lake layout); otherwise the session warehouse
    path.foreach(p => w.option("path", p))
    w.saveAsTable(table)
  }
}
