package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for the DSIR importance-weight kernel — the properties the
  * DuckDB hash gate can't state (it certifies values, not semantics).
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    // target-flavored docs share a vocabulary; raw-only docs use another
    (1L, "en", "alpha beta gamma alpha beta"),
    (2L, "en", "alpha beta beta gamma gamma"),
    (3L, "en", "beta gamma alpha alpha gamma"),
    (4L, "de", "zeta eta theta zeta eta"),
    (5L, "de", "eta theta zeta theta zeta"),
    (6L, "es", "alpha beta gamma beta alpha")
  ).toDF("doc_id", "lang", "text")

  private def weights =
    Dsir.weights(docs, "doc_id", TextOps.tokens(col("text")), col("lang") === "en")

  test("target-vocabulary docs outscore off-target docs") {
    val w = weights.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 6 is NOT in the target slice but shares its vocabulary — DSIR's
    // entire point is that it scores high anyway (selection is by
    // distribution, not by the label that defined the target fit)
    assert(w(6) > w(4) && w(6) > w(5))
    // every target-vocab doc beats every off-target doc
    assert(Seq(1L, 2L, 3L, 6L).map(w).min > Seq(4L, 5L).map(w).max)
  }

  test("n_feats is 2n-1 (unigrams + bigrams) and weights are deterministic") {
    val rows = weights.orderBy("doc_id").collect()
    assert(rows.forall(r => r.getLong(1) == 2 * 5 - 1)) // all docs have 5 tokens
    val again = weights.orderBy("doc_id").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("bucket hash lands in [0, Buckets)") {
    val b = docs
      .select(explode(TextOps.tokens(col("text"))).as("ng"))
      .select(Dsir.bucket(col("ng")).as("b"))
      .agg(min("b"), max("b"))
      .head()
    assert(b.getLong(0) >= 0 && b.getLong(1) < Dsir.Buckets)
  }

  test("weight is invariant to input partitioning") {
    val w1 = weights.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val w8 = Dsir
      .weights(docs.repartition(8), "doc_id", TextOps.tokens(col("text")),
        col("lang") === "en")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(w1 == w8)
  }
}
