package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for the hashed-feature logistic-regression trainer: the gates
  * certify the arithmetic; this certifies it LEARNS (the oracle would
  * happily hash-match a classifier that never separates anything) and
  * that training is partitioning-invariant at gate rounding.
  */
class LogRegSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies -> linearly separable by construction
  private def docs = spark.range(400).select(
    col("id").as("doc_id"),
    (col("id") % 2 === 0).as("good"),
    concat_ws(" ", (0 until 12).map(j =>
      concat(
        when(col("id") % 2 === 0, lit("good")).otherwise(lit("junk")),
        pmod(col("id") * (j + 1), lit(40)))): _*).as("text"))

  test("separable corpus trains to >0.95 in-sample accuracy") {
    val m = LogReg.train(docs, "doc_id", TextOps.tokens(col("text")),
      col("good"), epochs = 8, lrate = 1.0)
    val acc = m.scores
      .join(docs.select(col("doc_id"), col("good")), "doc_id")
      .select(avg(when((col("score") >= 0.5) === col("good"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    m.unpersist()
    assert(acc > 0.95, s"classifier failed to separate a separable corpus: acc=$acc")
  }

  test("weights are partitioning-invariant at gate rounding") {
    def run(df: org.apache.spark.sql.DataFrame) = {
      val m = LogReg.train(df, "doc_id", TextOps.tokens(col("text")), col("good"))
      val w = m.weightsDF.select(col("b"), round(col("w"), 6))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      m.unpersist(); w
    }
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("intercept rides bucket `buckets` and every doc contributes one") {
    val f = LogReg.docFeatures(docs, "doc_id", TextOps.tokens(col("text")), buckets = 64)
    val intercepts = f.filter(col("__b") === 64).agg(count(lit(1)), sum("__c")).head()
    assert(intercepts.getLong(0) == 400 && intercepts.getDouble(1) == 400.0)
    // and no token bucket escapes the range
    val mx = f.filter(col("__b") =!= 64).agg(max("__b"), min("__b")).head()
    assert(mx.getLong(0) < 64 && mx.getLong(1) >= 0)
  }
}
