package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IVF+PQ composition invariants. The sim_ann_ivfpq gate certifies
  * engine parity of the composed pipeline at one (nProbe, topK); this
  * spec pins the composition LAWS a refactor could silently break:
  * exhaustive probe degenerates to pure PQ, results are partitioning-
  * invariant, and pruning is monotone in nProbe.
  */
class AnnIvfPqSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.01/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private lazy val corpus = emb.filter(col("vec_id") >= 10)
  private lazy val queries = emb.filter(col("vec_id") < 10)

  private lazy val ivf = AnnIvf.buildFixed(corpus, "v", idCol = "vec_id", k = 16)
  private lazy val pq = AnnPq.buildFixed(corpus, "v", idCol = "vec_id", m = 8, k = 16)
  private lazy val encoded = ivf.assigned.select(col("vec_id"), col("cell"),
    AnnPq.encodeExpr(pq, col("v")).as("code"))

  private def run(nProbe: Int, topK: Int = 5) =
    AnnIvfPq.query(ivf, pq, encoded, queries,
      qIdCol = "vec_id", embCol = "v", cIdCol = "vec_id", codeCol = "code",
      topK = topK, nProbe = nProbe)
      .select(col("vec_id_q"), col("vec_id_c"), col("adc"), col("rank"))

  test("exhaustive probe (nProbe = k) degenerates to pure PQ ADC ranking") {
    val composed = run(nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val purePq = AnnPq.query(pq,
      encoded.select(col("vec_id"), col("code")), queries,
      qIdCol = "vec_id", embCol = "v", cIdCol = "vec_id", codeCol = "code",
      topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(composed === purePq)
  }

  test("results are invariant to corpus partitioning") {
    val a = run(nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val shuffled = encoded.repartition(13, col("code"))
    val b = AnnIvfPq.query(ivf, pq, shuffled, queries,
      qIdCol = "vec_id", embCol = "v", cIdCol = "vec_id", codeCol = "code",
      topK = 5, nProbe = 4)
      .select(col("vec_id_q"), col("vec_id_c"), col("adc"), col("rank"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(a === b)
  }

  test("pruning is monotone: top-1 hit set can only grow with nProbe") {
    // widening the probe never removes a previously reachable candidate,
    // so each query's top-1 under nProbe=8 must score >= its top-1
    // under nProbe=2 (more cells searched => an equal-or-better best)
    def best(n: Int): Map[Long, Double] = run(nProbe = n)
      .filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val narrow = best(2)
    val wide = best(8)
    assert(narrow.keySet === wide.keySet)
    narrow.foreach { case (q, s) => assert(wide(q) >= s - 1e-9) }
  }
}
