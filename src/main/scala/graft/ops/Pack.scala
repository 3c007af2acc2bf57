package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing — the "concatenate the corpus, then cut it
  * into fixed-token-budget shards" step of a training-data pipeline:
  * documents are laid out in a deterministic order and each doc is
  * assigned to the shard its FIRST token lands in
  * (`shard = start_offset div budget`), exactly the layout a
  * concat-then-chunk tokenizer run would produce.
  *
  * Scale: the obvious formulation — one running sum windowed by the
  * group column — is a single sort task per group, so a 5-language
  * 100 TB corpus would grind through 5 tasks. This is instead an exact
  * two-phase distributed prefix sum:
  *
  *   1. range-repartition on (group, order) and sort within partitions
  *      — every partition holds a contiguous slice of the global order;
  *   2. per-(partition, group) token subtotals — a metadata-sized frame
  *      (numPartitions x groups rows) whose exclusive running sum per
  *      group yields each slice's starting offset;
  *   3. broadcast the offsets back and window WITHIN each partition
  *      slice — thousands of parallel tasks, none larger than one
  *      repartition slice.
  *
  * The output is bit-identical to the single-window formulation (the
  * per-slice offset restores the global prefix), which the spec pins.
  * The ranged frame is `localCheckpoint`ed for CORRECTNESS, not speed:
  * range partitioning samples its boundaries, so the subtotal pass and
  * the final pass must observe the SAME physical partitioning — a
  * recomputation between the two could re-draw boundaries and attribute
  * rows to the wrong offset.
  */
object Pack {

  private val PID = "__pack_pid"

  /** Adds `shardCol`: the 0-based shard index of each row under
    * `budget` tokens per shard, streams running independently per
    * `groupCols` combination in `orderCols` order. `orderCols` must
    * totally order rows within a group (e.g. a unique id) — ties under
    * a ROWS-frame running sum would be nondeterministic. Docs longer
    * than the budget belong to the shard where they start.
    *
    * PRECONDITION (like the ordering contract above, the caller's to
    * meet): `tokenCol` must be non-null and non-negative. A NULL count
    * would silently null out that row's `shardCol` (sum() skips it but
    * the closing start-offset subtraction propagates the NULL), and a
    * negative count breaks the monotone-offset invariant, misassigning
    * every later row in the group. Counts come from a tokenizer — run
    * [[graft.functions.DataQuality]] NotNull/InRange upstream if the
    * source is untrusted; an unconditional per-row assert here would
    * tax every row of a 100 TB pass for a pipeline-authoring bug.
    */
  def packByBudget(
      df: DataFrame,
      tokenCol: String,
      budget: Long,
      groupCols: Seq[String],
      orderCols: Seq[String],
      shardCol: String = "shard_idx",
      numPartitions: Option[Int] = None): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(orderCols.nonEmpty, "packByBudget needs ordering columns")
    val internal = Seq(PID, "__ptoks", "__off", "__cum")
    val collisions = df.columns.filter(internal.contains)
    require(collisions.isEmpty,
      s"input columns collide with packByBudget internals: ${collisions.mkString(", ")}")
    val spark = df.sparkSession
    val n = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val layout = (groupCols ++ orderCols).map(col)

    val ranged = df
      .repartitionByRange(n, layout: _*)
      .sortWithinPartitions(layout: _*)
      .withColumn(PID, spark_partition_id())
      .localCheckpoint(true)

    // per-slice subtotals -> exclusive prefix per group across slices;
    // numPartitions x groups rows, so the window here is metadata-sized
    val offW = Window.partitionBy(groupCols.map(col): _*).orderBy(col(PID))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged
      .groupBy((PID +: groupCols).map(col): _*)
      .agg(sum(col(tokenCol).cast("long")).as("__ptoks"))
      .withColumn("__off", coalesce(sum(col("__ptoks")).over(offW), lit(0L)))
      .drop("__ptoks")

    val inW = Window.partitionBy((PID +: groupCols).map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .join(broadcast(offsets), PID +: groupCols)
      .withColumn("__cum", sum(col(tokenCol).cast("long")).over(inW) + col("__off"))
      // exact integer division: start offset of the row div budget
      .withColumn(shardCol,
        expr(s"(__cum - CAST(`$tokenCol` AS BIGINT)) div CAST($budget AS BIGINT)"))
      // the USING-join moved groupCols to the front — restore the
      // caller's column order so the contract really is "df + shardCol"
      .select((df.columns.toSeq :+ shardCol).map(col): _*)
  }

  /** Training-context SEQUENCE PACKING (sample packing): the corpus is
    * laid out as one token stream per `groupCols` combination in
    * `orderCols` order and cut into fixed `contextLen`-token windows;
    * each document is emitted once per context it OVERLAPS, with its
    * in-doc slice bounds — exactly the (context, doc, span) manifest a
    * packed-pretraining data loader materializes. Documents SPLIT
    * across context boundaries (the attention-mask boundary is the
    * consumer's concern); zero-token documents emit nothing.
    *
    * Output = `df` plus:
    *   `ctxCol`         0-based context index within the group stream
    *   `ctx_doc_start`  inclusive in-doc token offset of the slice
    *   `ctx_doc_end`    exclusive in-doc token offset
    * Every context except a group's last covers exactly `contextLen`
    * tokens across its slices — the packing invariant the spec pins.
    *
    * Scale: token offsets come from the same exact two-phase
    * distributed prefix sum as [[packByBudget]] (never one global-sort
    * task), and the explode fans each doc to ceil(len/L)+1 rows, so
    * output size ∝ corpus tokens / contextLen. Same `tokenCol`
    * non-null/non-negative precondition as packByBudget.
    */
  def packContexts(
      df: DataFrame,
      tokenCol: String,
      contextLen: Long,
      orderCols: Seq[String],
      groupCols: Seq[String] = Nil,
      ctxCol: String = "ctx_id",
      numPartitions: Option[Int] = None): DataFrame = {
    require(contextLen > 0, s"context length must be positive, got $contextLen")
    require(orderCols.nonEmpty, "packContexts needs ordering columns")
    val internal = Seq(PID, "__ptoks", "__off", "__cum", "__start", "__n")
    val collisions = df.columns.filter(internal.contains)
    require(collisions.isEmpty,
      s"input columns collide with packContexts internals: ${collisions.mkString(", ")}")
    val spark = df.sparkSession
    val n = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val layout = (groupCols ++ orderCols).map(col)

    val ranged = df
      .repartitionByRange(n, layout: _*)
      .sortWithinPartitions(layout: _*)
      .withColumn(PID, spark_partition_id())
      .localCheckpoint(true)

    val offW = Window.partitionBy(groupCols.map(col): _*).orderBy(col(PID))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged
      .groupBy((PID +: groupCols).map(col): _*)
      .agg(sum(col(tokenCol).cast("long")).as("__ptoks"))
      .withColumn("__off", coalesce(sum(col("__ptoks")).over(offW), lit(0L)))
      .drop("__ptoks")

    val inW = Window.partitionBy((PID +: groupCols).map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val L = contextLen
    ranged
      .join(broadcast(offsets), PID +: groupCols)
      .withColumn("__cum", sum(col(tokenCol).cast("long")).over(inW) + col("__off"))
      .withColumn("__n", col(tokenCol).cast("long"))
      .withColumn("__start", col("__cum") - col("__n"))
      .filter(col("__n") > 0)
      // one row per context the doc overlaps: floor-div window indices
      .withColumn(ctxCol, explode(sequence(
        expr(s"__start div CAST($L AS BIGINT)"),
        expr(s"(__cum - 1) div CAST($L AS BIGINT)"))))
      .withColumn("ctx_doc_start", greatest(lit(0L), col(ctxCol) * L - col("__start")))
      .withColumn("ctx_doc_end", least(col("__n"), (col(ctxCol) + 1) * L - col("__start")))
      .select((df.columns.toSeq ++ Seq(ctxCol, "ctx_doc_start", "ctx_doc_end")).map(col): _*)
  }
}
