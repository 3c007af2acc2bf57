package graft.functions

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference single-node BPE: greedy leftmost merges over weighted
    * word types, ties broken (count desc, pair lexicographic). */
  private def refBpe(words: Map[String, Long], k: Int): Seq[Bpe.Merge] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, c) => w.toVector.map(_.toString) -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[Bpe.Merge]
    for (_ <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      if (counts.nonEmpty) {
        val ((p1, p2), pc) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += Bpe.Merge(p1, p2, pc)
        vocab = vocab.groupMapReduce(kv => mergeGreedy(kv._1, p1, p2))(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  private def mergeGreedy(syms: Vector[String], p1: String, p2: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == p1 && syms(i + 1) == p2) {
        out += p1 + p2; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toVector
  }

  private def train(words: Map[String, Long], k: Int): Seq[Bpe.Merge] =
    Bpe.trainMerges(words.toSeq.toDF("word", "cnt"), k)

  test("matches the reference trainer on the classic low/lower/newest corpus") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    for (k <- Seq(1, 4)) assert(train(words, k) === refBpe(words, k))
  }

  test("greedy leftmost: 'aaaa' merges to (a,a) pairs without overlap") {
    val words = Map("aaaa" -> 1L)
    val m = train(words, 2)
    assert(m === refBpe(words, 2))
    // first merge (a,a) counts 3 adjacent occurrences but rewrites
    // non-overlapping: 'aaaa' -> 'aa aa', so merge 2 is (aa,aa)
    assert(m.head === Bpe.Merge("a", "a", 3L))
    assert(m(1) === Bpe.Merge("aa", "aa", 1L))
  }

  test("tie-break is lexicographic on the pair") {
    val words = Map("ab" -> 2L, "cd" -> 2L)
    assert(train(words, 1).head === Bpe.Merge("a", "b", 2L))
  }

  test("encodeTokenCount: counts match a by-hand merge; empty text reads 0") {
    import org.apache.spark.sql.functions.col
    val merges = Seq(Bpe.Merge("t", "h", 0L), Bpe.Merge("th", "e", 0L))
    val got = Seq("the cat", "thethe", "", "   ", "a")
      .toDF("text")
      .select(col("text"), Bpe.encodeTokenCount(col("text"), merges).as("n"))
      .as[(String, Int)].collect().toMap
    // "the cat" -> [the] [c a t] = 4; "thethe" -> [the the] = 2
    assert(got("the cat") === 4)
    assert(got("thethe") === 2)
    assert(got("") === 0)
    assert(got("   ") === 0)
    assert(got("a") === 1)
  }

  test("batched trainer with batch=1 degenerates to the sequential trainer") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val bt = Bpe.trainMergesBatched(words.toSeq.toDF("word", "cnt"), 4, batch = 1)
    assert(bt.merges === train(words, 4))
    assert(bt.rounds === 4) // one driver round per merge, by definition
  }

  test("batched selection takes only mutually non-interfering pairs per round") {
    // 'abab' makes (a,b) top; (b,a) shares both symbols and must be
    // deferred to round 2, where the rewrite has changed its count
    val words = Map("abab" -> 10L, "cd" -> 7L, "ce" -> 6L)
    val bt = Bpe.trainMergesBatched(words.toSeq.toDF("word", "cnt"), 3, batch = 3)
    // round 1 greedy over (pc desc, p1, p2): (a,b) 20 picked; (b,a) 10
    // blocked on both symbols; (c,d) 7 picked; (c,e) blocked on c
    assert(bt.merges.take(2) === Seq(Bpe.Merge("a", "b", 20L), Bpe.Merge("c", "d", 7L)))
    assert(bt.rounds === 2)
    // round 2: 'abab' is now 'ab ab', so the top surviving pair is
    // (ab,ab) 10 — exactly what sequential training would see next
    assert(bt.merges(2) === Bpe.Merge("ab", "ab", 10L))
    // and the non-interference guarantee: each recorded count equals
    // what the sequential trainer records when fed the same merge order
    val counts = bt.merges.map(m => (m.left, m.right) -> m.count).toMap
    val seq = train(words, 3)
    seq.filter(m => counts.contains((m.left, m.right)))
      .foreach(m => assert(counts((m.left, m.right)) === m.count))
  }

  test("wordCounts + trainFromText end-to-end agrees with the reference") {
    val docs = Seq("the cat sat", "the bat", "the cat").toDF("text")
    val wc = Bpe.wordCounts(docs, "text").as[(String, Long)].collect().toMap
    assert(wc === Map("the" -> 3L, "cat" -> 2L, "sat" -> 1L, "bat" -> 1L))
    val got = Bpe.trainFromText(docs, "text", 3)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
      .map { case (_, a, b, c) => Bpe.Merge(a, b, c) }
    assert(got === refBpe(wc, 3))
  }
}
