package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge training (Sennrich et al. 2016)
  * — the tokenizer-training step of an LLM data pipeline, shaped for a
  * 100 TB corpus:
  *
  *  1. ONE corpus pass reduces text to the weighted word-type table
  *     (word, count) — a hash-agg carrying O(|vocab|) rows, the classic
  *     BPE-trainer reduction (merges depend only on word TYPES and
  *     their frequencies, never on the corpus again).
  *  2. Each merge round runs entirely on that vocab table: explode
  *     adjacent symbol pairs weighted by count, hash-agg, take the
  *     argmax pair (ONE driver-size row), and rewrite the symbol
  *     strings. k merges = k tiny jobs, zero further corpus scans.
  *
  * Symbol-sequence representation: symbols joined by ' ' with every
  * symbol prefixed by the \u0001 marker ("§a §b …"). Pair rewrite is
  * then plain `replace("§p1 §p2" -> "§p1p2")`: the marker makes a
  * match start only at a symbol boundary (symbols contain neither the
  * marker nor spaces), and left-to-right non-overlapping `replace` IS
  * greedy BPE merge order ("a a a" + (a,a) -> "aa a"). Both the
  * representation and the rewrite are reproducible verbatim in ANSI
  * SQL, so merge training is oracle-verifiable cross-engine.
  */
object Bpe {

  val Marker = "\u0001"

  /** (word, cnt) table from whitespace text — the one corpus-wide pass. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Initial marker-prefixed symbol string: "abc" -> "§a §b §c". */
  private def initSymbols(word: org.apache.spark.sql.Column) =
    concat(lit(Marker), array_join(split(word, ""), " " + Marker))

  final case class Merge(left: String, right: String, count: Long)

  /** Train `k` merges over a (word, cnt) table — EXACT sequential BPE
    * (recount between every merge). Returns the merge list in rank
    * order; ties on pair count break lexicographically (both
    * deterministic and SQL-mirrorable). Each round collects exactly
    * one row (the argmax pair) — driver-size by construction.
    *
    * SCALE RULE: this path costs ONE driver round (pair-count job +
    * 1-row collect + rewrite) PER MERGE — exactly right for a
    * handful of merges and for oracle verification, and the wrong
    * shape for a production vocabulary: 32k merges = 32k sequential
    * Spark jobs. Past k ≈ 100, call [[trainMergesBatched]], which
    * lands `batch` non-interfering merges per driver round (~k/batch
    * rounds; ScaleProbe certifies 500 merges within 60 driver
    * rounds). The batched list may diverge from the sequential one
    * ONLY where top pairs interfere — the standard fast-trainer
    * trade; it is NOT a drop-in default because sequential greedy
    * recount IS the BPE definition the specs and oracles pin.
    */
  def trainMerges(wordCounts: DataFrame, k: Int): Seq[Merge] = {
    // hard guard behind the scale rule above: a 32k-merge vocabulary
    // through this path is 32k sequential Spark jobs — a mistake no
    // doc comment reliably prevents. Large-k callers must CHOOSE
    // between exact-sequential (raise the cap consciously via
    // trainMergesExact) and the batched fast trainer.
    require(k <= 1024,
      s"trainMerges(k=$k) is one driver round PER MERGE — past ~100 merges " +
        "call trainMergesBatched (the fast-trainer shape; ScaleProbe-certified) " +
        "or trainMergesExact directly if sequential-greedy semantics are required")
    trainMergesExact(wordCounts, k)
  }

  /** The 1-merge-per-driver-round exact trainer behind [[trainMerges]]
    * — named so call sites can state the intent explicitly when both
    * trainers are in scope. */
  def trainMergesExact(wordCounts: DataFrame, k: Int): Seq[Merge] = {
    require(k >= 1, s"k must be >= 1, got $k")
    var vocab = wordCounts.select(
      initSymbols(col("word")).as("w"), col("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vocab.count() // materialize before the loop so rounds don't recompute
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    try {
      for (_ <- 1 to k) {
        val top = pairCounts(vocab)
          .orderBy(col("pc").desc, col("p1"), col("p2"))
          .limit(1).collect()
        if (top.nonEmpty) {
          val (p1, p2, pc) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += Merge(p1, p2, pc)
          val next = vocab.select(
            regexp_replace(col("w"),
              // literal (non-regex) pattern: quote both symbols
              java.util.regex.Pattern.quote(s"$Marker$p1 $Marker$p2"),
              java.util.regex.Matcher.quoteReplacement(s"$Marker$p1$p2")).as("w"),
            col("cnt"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          next.count()
          vocab.unpersist(blocking = false)
          vocab = next
        }
      }
    } finally vocab.unpersist(blocking = false)
    merges.toSeq
  }

  /** Adjacent-pair counts over the current symbol strings, marker
    * stripped: (p1, p2, pc). */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(expr(s"transform(split(w, ' '), s -> substring(s, 2))").as("syms"), col("cnt"))
      // the >= 2 guard matters: Spark's sequence(1, 0) is a DESCENDING
      // [1, 0], not empty — a 1-symbol word would fabricate null pairs
      .filter(size(col("syms")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(syms) - 1), i -> struct(syms[i-1] AS p1, syms[i] AS p2))")).as("p"),
        col("cnt"))
      .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
      .agg(sum(col("cnt")).as("pc"))

  /** Batched-trainer result: merges in rank order plus the number of
    * driver rounds (collect+materialize cycles) it took — the metric a
    * 32k-merge production vocabulary is graded on. */
  final case class BatchedTrain(merges: Seq[Merge], rounds: Int)

  /** How many of the top pair-count rows one batched round examines:
    * the greedy selection scans this prefix of the (pc DESC, p1, p2)
    * ordering, so the cap is part of the ALGORITHM (an oracle replaying
    * the selection must use the same window), not just a driver-memory
    * bound. 8× the batch size fills batches reliably on natural text,
    * where high-frequency pairs share letters and interfere often. */
  def scanCap(batch: Int): Int = math.max(8 * batch, 24)

  /** Batched BPE merge training: per driver round, ONE pair-count job
    * and ONE vocab rewrite apply up to `batch` merges, so a 32k-merge
    * production vocabulary costs ~32k/batch sequential Spark jobs
    * instead of 32k (the [[trainMerges]] loop's driver-round bound —
    * fine for a 3-merge gate, the scale ceiling for a real tokenizer).
    *
    * Within a round the greedy selection walks the [[scanCap]]-row
    * prefix of the (pc DESC, p1, p2) pair ordering and takes a pair
    * only if its symbol set {left, right, left+right} is disjoint from
    * every already-selected pair's — under that NON-INTERFERENCE rule
    * the merges commute and each selected pair's snapshot count is
    * EXACTLY what sequential training would have recorded for it
    * (rewriting (a,b) can neither create nor destroy occurrences of a
    * disjoint (c,d); the concatenation is included in the set because
    * merging a+b mints new "ab" symbols, which WOULD perturb any pair
    * mentioning "ab"). `batch = 1` degenerates to exactly
    * [[trainMerges]] (asserted in spec); larger batches may diverge
    * from the sequential merge LIST order — the standard fast-trainer
    * trade — but stay deterministic and oracle-replayable.
    */
  def trainMergesBatched(wordCounts: DataFrame, k: Int, batch: Int): BatchedTrain = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(batch >= 1, s"batch must be >= 1, got $batch")
    var vocab = wordCounts.select(
      initSymbols(col("word")).as("w"), col("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vocab.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rounds = 0
    try {
      var exhausted = false
      while (merges.length < k && !exhausted) {
        val take = math.min(batch, k - merges.length)
        val cand = pairCounts(vocab)
          .orderBy(col("pc").desc, col("p1"), col("p2"))
          .limit(scanCap(batch)).collect()
        rounds += 1
        val picked = scala.collection.mutable.ArrayBuffer.empty[Merge]
        val blocked = scala.collection.mutable.Set.empty[String]
        var i = 0
        while (i < cand.length && picked.length < take) {
          val (p1, p2) = (cand(i).getString(0), cand(i).getString(1))
          if (!blocked(p1) && !blocked(p2) && !blocked(p1 + p2)) {
            picked += Merge(p1, p2, cand(i).getLong(2))
            blocked ++= Seq(p1, p2, p1 + p2)
          }
          i += 1
        }
        if (picked.isEmpty) exhausted = true
        else {
          merges ++= picked
          val rewritten = picked.foldLeft(col("w")) { (acc, m) =>
            regexp_replace(acc,
              java.util.regex.Pattern.quote(s"$Marker${m.left} $Marker${m.right}"),
              java.util.regex.Matcher.quoteReplacement(s"$Marker${m.left}${m.right}"))
          }
          // periodic lineage cut: the logical plan otherwise nests one
          // replace per TOTAL merge — ~500 deep by round 32, past any
          // codegen/analysis comfort. localCheckpoint keeps plan depth
          // bounded by 8 rounds of replaces while staying materialized.
          val next0 = vocab.select(rewritten.as("w"), col("cnt"))
          val next =
            if (rounds % 8 == 0) next0.localCheckpoint(true)
            else {
              val p = next0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
              p.count(); p
            }
          vocab.unpersist(blocking = false)
          vocab = next
        }
      }
    } finally vocab.unpersist(blocking = false)
    BatchedTrain(merges.toSeq, rounds)
  }

  /** Word-boundary separator used by [[encode]]'s whole-document symbol
    * string: words joined by " \u0002 " — merge patterns ("§p1 §p2")
    * can never match across it, so merges stay word-local exactly as
    * in training. */
  val WordSep = "\u0002"

  /** Apply trained merges to a text column: returns the BPE token count
    * per row as ONE narrow projection (k nested literal replaces — no
    * shuffle, no per-row UDF; the merge list is a driver-side constant
    * folded into the plan, the degenerate broadcast). */
  def encodeTokenCount(text: org.apache.spark.sql.Column, merges: Seq[Merge]): org.apache.spark.sql.Column = {
    // empty words (leading/double spaces) are dropped, matching
    // wordCounts — and sidestepping the engines' disagreement on
    // splitting the empty string
    val words = filter(split(text, " "), w => length(w) > 0)
    val init = array_join(transform(words, w => initSymbols(w)), s" $WordSep ")
    val merged = merges.foldLeft(init) { (acc, m) =>
      regexp_replace(acc,
        java.util.regex.Pattern.quote(s"$Marker${m.left} $Marker${m.right}"),
        java.util.regex.Matcher.quoteReplacement(s"$Marker${m.left}${m.right}"))
    }
    // empty/whitespace-only text: split("", " ") yields [""] and would
    // read as one phantom token — report 0
    when(size(words) === 0, lit(0))
      .otherwise(size(filter(split(merged, " "), s => s =!= WordSep)))
  }

  /** Convenience: end-to-end from text to the k-merge table the gate
    * dumps: (rank, p1, p2, pc). */
  def trainFromText(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    trainMerges(wordCounts(df, textCol), k).zipWithIndex
      .map { case (m, i) => (i + 1L, m.left, m.right, m.count) }
      .toDF("rank", "p1", "p2", "pc")
  }
}
