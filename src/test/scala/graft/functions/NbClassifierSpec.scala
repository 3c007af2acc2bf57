package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NbClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("classify recovers the class whose vocabulary a doc uses") {
    // two classes with disjoint vocabularies: self-classification must
    // recover every label (the smoothed cost of an in-class token is
    // strictly below the out-of-class backoff cost)
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog ran to the cat"),
      (3L, "fr", "le chat est sur le tapis"),
      (4L, "fr", "le chien court vers le chat"))
      .toDF("doc_id", "lang", "text")
    val out = NbClassifier.classify(docs, "doc_id", "lang", split(col("text"), " "))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out.size == 4)
    assert(out.forall { case (_, (actual, pred)) => actual == pred })
  }

  test("whole-bit arithmetic matches the hand formula on a tiny model") {
    // one class "a" with tokens {x:2, y:1} (N_a=3), one class "b" with
    // {z:3} (N_b=3); V=3 global; 2 docs per... build: docs a1="x x y",
    // b1="z z z". Classify doc "x": class a cost =
    // floor(log2((3+3) div (2+1))) = 1; class b cost =
    // floor(log2((3+3) div (0+1))) = 2; priors equal (floor(log2(2/1))=1)
    val docs = Seq((1L, "a", "x x y"), (2L, "b", "z z z")).toDF("doc_id", "lang", "text")
    val out = NbClassifier.classify(docs, "doc_id", "lang", split(col("text"), " "))
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(out(1L)._1 == "a")
    // doc 1 "x x y": class a = 1 + 1 + floor(log2(6 div 2)) + prior 1 = 2+1+1 = 4
    assert(out(1L)._2 == 4L)
    assert(out(2L)._1 == "b")
  }

  test("ties break to the lexicographically smallest class") {
    // perfectly symmetric classes (identical texts): every doc scores
    // identically against both, so every prediction must be the
    // smaller label "a"
    val docs = Seq((1L, "a", "x"), (2L, "b", "x")).toDF("doc_id", "lang", "text")
    val out = NbClassifier.classify(docs, "doc_id", "lang", split(col("text"), " "))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == "a" && out(2L) == "a")
  }

  test("docs with no non-empty tokens are excluded, not scored vacuously") {
    val docs = Seq((1L, "a", "x y"), (2L, "a", ""), (3L, "b", "z"))
      .toDF("doc_id", "lang", "text")
    val out = NbClassifier.classify(docs, "doc_id", "lang", split(col("text"), " "))
    assert(out.collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }
}
