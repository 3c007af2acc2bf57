package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackSpec extends SparkSpec {
  import spark.implicits._

  test("packByBudget assigns docs to the shard where their first token lands") {
    val df = Seq(
      ("en", 1L, 4L), ("en", 2L, 4L), ("en", 3L, 4L),  // offsets 0,4,8
      ("en", 4L, 15L),                                 // starts at 12 -> shard 1
      ("en", 5L, 1L),                                  // starts at 27 -> shard 2
      ("de", 9L, 30L), ("de", 10L, 1L))                // independent stream
      .toDF("lang", "doc_id", "n_tokens")
    val out = Pack.packByBudget(df, "n_tokens", budget = 10L,
        groupCols = Seq("lang"), orderCols = Seq("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(out == Map(
      ("en", 1L) -> 0L, ("en", 2L) -> 0L, ("en", 3L) -> 0L,
      ("en", 4L) -> 1L, ("en", 5L) -> 2L,
      ("de", 9L) -> 0L, ("de", 10L) -> 3L))
  }

  test("packContexts slices docs across fixed context windows; invariant holds") {
    // stream: 4+4+15+1 tokens, L=10 -> contexts 0..2
    val df = Seq((1L, 4L), (2L, 4L), (3L, 15L), (4L, 1L), (5L, 0L))
      .toDF("doc_id", "n_tokens")
    val out = Pack.packContexts(df, "n_tokens", contextLen = 10L, orderCols = Seq("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    // doc 3 spans tokens [8, 23): ctx0 gets [0,2), ctx1 [2,12), ctx2 [12,15)
    assert(out == Set(
      (1L, 0L, 0L, 4L), (2L, 0L, 0L, 4L),
      (3L, 0L, 0L, 2L), (3L, 1L, 2L, 12L), (3L, 2L, 12L, 15L),
      (4L, 2L, 0L, 1L))) // zero-token doc 5 emits nothing
    // invariant: every context except the last carries exactly L tokens
    val perCtx = Pack.packContexts(df, "n_tokens", 10L, Seq("doc_id"))
      .groupBy("ctx_id").agg(sum(col("ctx_doc_end") - col("ctx_doc_start")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perCtx == Map(0L -> 10L, 1L -> 10L, 2L -> 4L))
    // and it matches a plain single-window formulation on a bigger corpus
    val rows = (1L to 400L).map(i => (i, (i * 2654435761L % 50L)))
      .toDF("doc_id", "n_tokens")
    val got = Pack.packContexts(rows, "n_tokens", 512L, Seq("doc_id"), numPartitions = Some(7))
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    val ref = rows.withColumn("s", coalesce(sum("n_tokens").over(w), lit(0L)))
      .filter(col("n_tokens") > 0)
      .withColumn("ctx_id", explode(sequence(
        expr("s div 512"), expr("(s + n_tokens - 1) div 512"))))
      .select(col("doc_id"), col("ctx_id"),
        greatest(lit(0L), col("ctx_id") * 512 - col("s")).as("a"),
        least(col("n_tokens"), (col("ctx_id") + 1) * 512 - col("s")).as("b"))
    assert(got.select("doc_id", "ctx_id", "ctx_doc_start", "ctx_doc_end")
      .except(ref).isEmpty && ref.except(
        got.select("doc_id", "ctx_id", "ctx_doc_start", "ctx_doc_end")).isEmpty)
  }

  test("two-phase packing is bit-identical to a single global window at any partitioning") {
    // pseudo-random but deterministic token lengths over 3 groups
    val rows = (1L to 500L).map { i =>
      (s"g${i % 3}", i, (i * 2654435761L % 97L) + 1L)
    }
    val df = rows.toDF("g", "id", "n").repartition(7)
    val w = Window.partitionBy(col("g")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val reference = df
      .withColumn("c", sum(col("n")).over(w))
      .select(col("g"), col("id"),
        expr("(c - n) div CAST(256 AS BIGINT)").as("shard_idx"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (parts <- Seq(1, 3, 11)) {
      val packed = Pack.packByBudget(df, "n", 256L, Seq("g"), Seq("id"),
          numPartitions = Some(parts))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
      assert(packed == reference, s"mismatch at numPartitions=$parts")
    }
  }

  test("rejects non-positive budgets and missing ordering") {
    val df = Seq(("en", 1L, 4L)).toDF("lang", "doc_id", "n_tokens")
    intercept[IllegalArgumentException](
      Pack.packByBudget(df, "n_tokens", 0L, Seq("lang"), Seq("doc_id")))
    intercept[IllegalArgumentException](
      Pack.packByBudget(df, "n_tokens", 10L, Seq("lang"), Nil))
  }

  test("rejects input columns that collide with internal working names") {
    // a caller's __pack_pid column would be silently overwritten and
    // returned corrupted by the closing column-order restore
    val df = Seq(("en", 1L, 4L)).toDF("__pack_pid", "doc_id", "n_tokens")
    val e = intercept[IllegalArgumentException](
      Pack.packByBudget(df, "n_tokens", 10L, Seq("__pack_pid"), Seq("doc_id")))
    assert(e.getMessage.contains("__pack_pid"))
  }

  test("preserves the caller's column order: output is exactly df + shardCol") {
    val df = Seq(("en", 1L, 4L)).toDF("lang", "doc_id", "n_tokens")
    val out = Pack.packByBudget(df, "n_tokens", 10L, Seq("lang"), Seq("doc_id"))
    assert(out.columns.toSeq == Seq("lang", "doc_id", "n_tokens", "shard_idx"))
  }
}
