package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{SimilarityOps, TextOps}

/** The SQL surface of the similarity/text primitives: every registered
  * function must be the SAME Column composition the Scala API builds,
  * so each test asserts SQL ≡ Column-API on identical inputs.
  */
class GraftSqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    GraftSqlFunctions.register(spark)
    val df = Seq(
      (1L, "the cat sat on the mat today"),
      (2L, "the cat sat on the mat yesterday"),
      (3L, "zebras gallop across open plains quickly")).toDF("doc_id", "text")
    df.createOrReplaceTempView("sqlfn_docs")
    df
  }

  test("jaccard + word_shingles from SQL match the Column API") {
    docs
    val viaSql = spark.sql(
      """SELECT a.doc_id, b.doc_id,
        |  jaccard(word_shingles(split(a.text, ' '), 2),
        |          word_shingles(split(b.text, ' '), 2)) AS j
        |FROM sqlfn_docs a JOIN sqlfn_docs b ON a.doc_id < b.doc_id
        |ORDER BY 1, 2""".stripMargin).collect().map(_.getDouble(2))
    val sh = TextOps.wordShingles(split(col("text"), " "), 2)
    val s = docs.select(col("doc_id"), sh.as("sh"))
    val viaCol = s.as("a").join(s.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        SimilarityOps.jaccard(col("a.sh"), col("b.sh")).as("j"))
      .orderBy(col("a.doc_id"), col("b.doc_id")).collect().map(_.getDouble(2))
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaSql.head > 0.5) // docs 1 and 2 really are near-duplicates
  }

  test("minhash_sig + lsh_band_key from SQL match the Column API") {
    docs
    val viaSql = spark.sql(
      """SELECT doc_id, lsh_band_key(minhash_sig(split(text, ' '), 12), 1, 2) AS bk
        |FROM sqlfn_docs ORDER BY doc_id""".stripMargin)
      .collect().map(_.getString(1))
    val viaCol = docs.select(col("doc_id"),
        SimilarityOps.bandKey(
          SimilarityOps.minhashSig(split(col("text"), " "), 12), 1, 2).as("bk"))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("simhash16 / hamming / token_count / alpha_ratio / lang_id / doc_fingerprint") {
    docs
    val row = spark.sql(
      """SELECT token_count(text) AS n, alpha_ratio(text) AS ar,
        |  lang_id(split(text, ' ')) AS lang,
        |  doc_fingerprint(split(text, ' ')) AS fp,
        |  hamming(simhash16(split(text, ' ')), 0) AS bits
        |FROM sqlfn_docs WHERE doc_id = 1""".stripMargin).collect()(0)
    val exp = docs.filter(col("doc_id") === 1).select(
      TextOps.tokenCount(col("text")),
      TextOps.alphaRatio(col("text")),
      TextOps.langId(split(col("text"), " ")),
      TextOps.fingerprint(split(col("text"), " ")),
      SimilarityOps.hamming(SimilarityOps.simhash16(split(col("text"), " ")), lit(0))
    ).collect()(0)
    assert(row.toSeq == exp.toSeq)
  }

  test("qsketch_bucket / zorder_key from SQL match the Column API") {
    docs
    val viaSql = spark.sql(
      """SELECT qsketch_bucket(doc_id * 12345, 7) AS qb,
        |  zorder_key(doc_id, doc_id * 3, 10) AS zk
        |FROM sqlfn_docs ORDER BY doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaCol = docs.select(
        graft.functions.QuantileSketch.bucketKey(col("doc_id") * 12345, 7).as("qb"),
        graft.ops.ZOrder.interleave(Seq(col("doc_id"), col("doc_id") * 3), 10).as("zk"))
      .orderBy(col("qb"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql.sortBy(_._1).toSeq == viaCol.toSeq)
  }

  test("sizing arguments must be literals; arity is checked") {
    docs
    intercept[Exception](
      spark.sql("SELECT minhash_sig(split(text, ' '), doc_id) FROM sqlfn_docs").collect())
    intercept[Exception](
      spark.sql("SELECT jaccard(split(text, ' ')) FROM sqlfn_docs").collect())
  }
}
