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

  /** Frequency cap with a hash-threshold PRE-PRUNE: keep at most `cap`
    * rows per key, selected by the seeded multiplicative-hash order
    * `h = (id * 2654435761) mod (2^31-1)` with (h, id) ties — EXACTLY
    * the rows the naive per-key `row_number() <= cap` window keeps,
    * but the window only ever sees `~cap * margin` candidate rows per
    * key instead of the key's full population.
    *
    * Why it matters: the naive cap sorts every row of the hottest key
    * through one task's window. Here per-key counts (one cheap
    * hash-agg) pick a hash threshold `thr ~= P * cap * margin / n`,
    * the stream is filtered to `h <= thr` BEFORE the exchange — on a
    * 2M-row domain capped at 1k with margin 4 the window input drops
    * 500x — and the exact rank runs on the survivors.
    *
    * EXACT by construction, not with high probability: the top-`cap`
    * rows in (h, id) order all satisfy `h <= thr` whenever at least
    * `cap` candidates survive, so keys whose candidate count fell
    * short (a tail-probability event at margin 4) are detected by one
    * more count and routed through the full window — the fast path
    * can mis-prune NOTHING, it can only fall back.
    *
    * COST MODEL — when to use which: this is a MEMORY/TAIL tool, not a
    * CPU saver. It pays ~3 corpus scans (counts, prune, fallback
    * probe) where the naive window pays one scan + one sort, so on a
    * corpus whose hottest key's rows FIT one task it is strictly
    * slower (probed: 10M rows / 6M-row hot key sorts in ~1 s on one
    * local core — the naive window wins 3x). Reach for it when the
    * hot key does NOT fit: the naive window's hot task buffers the
    * key's entire population (a 2B-row domain at 100 TB = one
    * spilling, hour-long straggler), while this window's input is
    * bounded at ~cap x margin rows per key regardless of skew — the
    * probed bound, 4,000 vs 6,000,000 on the same data.
    */
  def capByKey(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      cap: Int,
      margin: Double = 4.0): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    require(margin > 1.0, s"margin must be > 1, got $margin")
    val P = 2147483647L
    val h = (col(idCol) * lit(2654435761L)) % lit(P)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__h"), col(idCol))

    // per-key thresholds are METADATA (one row per key) and must ride
    // a broadcast: joining the full stream against an un-broadcast
    // aggregate of itself shuffles the corpus before the prune — a
    // probed 10x REGRESSION vs the naive window at 10M rows, because
    // Catalyst can't see that the agg output is tiny. With the
    // broadcast the prune is map-side and only survivors shuffle.
    val counts = broadcast(df.groupBy(col(keyCol)).agg(count(lit(1)).as("__n")))
    val withThr = df.withColumn("__h", h)
      .join(counts, Seq(keyCol))
      .withColumn("__thr",
        when(col("__n") <= lit(cap.toLong), lit(P))
          .otherwise(least(lit(P),
            ceil(lit(P.toDouble * cap * margin) / col("__n").cast("double"))
              .cast("long"))))
    // the candidate set is ~cap x margin rows per over-cap key (plus
    // below-cap keys whole) — persist it: it feeds the exactness
    // check, the fast window AND the fallback decision, and without
    // the pin each consumer would re-scan the corpus
    val cand = withThr.filter(col("__h") <= col("__thr"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // exactness check: a key is fast-path eligible iff enough
    // candidates survived its threshold
    val short = broadcast(cand.groupBy(col(keyCol)).agg(count(lit(1)).as("__m"))
      .join(counts, Seq(keyCol))
      .filter(col("__m") < least(lit(cap.toLong), col("__n")))
      .select(col(keyCol)))
    val fast = cand.join(short, Seq(keyCol), "left_anti")
      .withColumn("__rk", row_number().over(w)).filter(col("__rk") <= cap)
    val slow = df.withColumn("__h", h)
      .join(short, Seq(keyCol), "left_semi")
      .withColumn("__rk", row_number().over(w)).filter(col("__rk") <= cap)

    val cols = df.columns.map(col).toSeq
    fast.select(cols: _*).union(slow.select(cols: _*))
  }

  /** Exact heavy hitters WITHOUT a full key-space shuffle: per-partition
    * Misra-Gries summaries (capacity counters each) nominate a bounded
    * candidate set, and only candidates are exactly recounted. The MG
    * guarantee makes the output EXACT, not approximate: any key with
    * global count > n/(capacity+1) survives some partition's summary
    * (pigeonhole over Σ per-partition thresholds), so with
    * minShare ≥ 1/(capacity+1) the candidate set provably contains
    * every qualifying key — the recount then restores exact counts and
    * applies the cut. Output is partitioning-INVARIANT by construction
    * (ScaleSpec pins it): candidates may differ per layout, qualifiers
    * never. Shape at 100 TB: scan 1 emits ≤ capacity keys + 1 count
    * per partition (driver-size metadata); scan 2's agg carries only
    * candidate-key rows — the shuffle key space is ≤ partitions ×
    * capacity, never the key dictionary. The naive alternative
    * (groupBy.count over all keys, then filter) shuffles the full
    * dictionary — this is the tool when keys are power-law-many
    * (tokens, URLs, user ids) and only the head matters.
    */
  def heavyHitters(
      df: DataFrame,
      keyCol: String,
      capacity: Int,
      minShare: Double): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(minShare * (capacity + 1) >= 1.0,
      s"minShare $minShare below the MG guarantee 1/(capacity+1) " +
        s"= ${1.0 / (capacity + 1)} — candidates could miss qualifying keys")
    val spark = df.sparkSession
    import spark.implicits._
    // pass 1: per-partition MG; each partition emits its candidate
    // keys (null count) plus one (null key, rows-seen) tally row.
    // Null keys are REJECTED loudly: the tally row overloads the null
    // slot, and the candidate semi-join below is not null-safe — a
    // null heavy hitter would be silently dropped while still counting
    // in the denominator. Callers filter or coalesce nulls upstream.
    val summaries = df.select(col(keyCol).cast("string")).as[String]
      .mapPartitions { it =>
        val counters = scala.collection.mutable.HashMap.empty[String, Long]
        var seen = 0L
        it.foreach { k =>
          require(k != null,
            s"heavyHitters: null key in '$keyCol' — filter or coalesce " +
              "nulls upstream (null overloads the tally-row sentinel)")
          seen += 1
          counters.get(k) match {
            case Some(c) => counters.update(k, c + 1)
            case None =>
              if (counters.size < capacity) counters.update(k, 1L)
              else {
                // decrement-all eviction: O(capacity) amortized per
                // non-resident key — the classic MG step
                val dead = List.newBuilder[String]
                counters.foreach { case (key, c) =>
                  if (c == 1L) dead += key else counters.update(key, c - 1)
                }
                dead.result().foreach(counters.remove)
              }
          }
        }
        Iterator.single((Option.empty[String], seen)) ++
          counters.keysIterator.map(k => (Option(k), 0L))
      }.toDF("k", "c")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = summaries.filter(col("k").isNull)
      .agg(sum(col("c")).as("n"))
    val cands = summaries.filter(col("k").isNotNull)
      .select(col("k").as(keyCol)).distinct()
    // pass 2: exact recount of candidates only; the broadcast semi-join
    // prunes map-side so the agg shuffle carries candidate rows alone
    // the pin stays until the harness cache sweep: total and cands are
    // both consumed lazily inside `out`, so an eager unpersist here
    // would force the MG pass to run twice
    df.select(col(keyCol).cast("string").as(keyCol))
      .join(broadcast(cands), Seq(keyCol), "left_semi")
      .groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt").cast("double") > col("n").cast("double") * lit(minShare))
      .select(col(keyCol), col("cnt"),
        round(col("cnt").cast("double") / col("n").cast("double"), 6).as("share"))
  }
}
