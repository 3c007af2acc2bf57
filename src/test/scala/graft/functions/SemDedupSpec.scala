package graft.functions

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // tiny 4-dim corpus: ids 0..3 seed the (k=4) deterministic codebook;
  // id 10 is a near-copy of id 0 (same direction, scaled), id 11 is a
  // near-copy of id 1, id 12 is far from everything
  private def corpus = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 0.0f, 1.0f)),
    (10L, Array(2.0f, 0.1f, 0.0f, 0.0f)),
    (11L, Array(0.1f, 2.0f, 0.0f, 0.0f)),
    (12L, Array(0.5f, 0.5f, 0.5f, 0.5f)))
    .toDF("vec_id", "embedding")

  test("prune drops the higher id of each within-cell near-dup pair") {
    val index = AnnIvf.buildFixed(corpus, "embedding", idCol = "vec_id", k = 4)
    val out = SemDedup.prune(index, "vec_id", tau = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out.size == 7)
    assert(!out(10L), "near-copy of id 0 must be dropped")
    assert(!out(11L), "near-copy of id 1 must be dropped")
    assert(out(0L) && out(1L), "lower-id representatives survive")
    assert(out(2L) && out(3L) && out(12L), "non-duplicates survive")
  }

  test("tau = 1.0 over distinct directions keeps everything") {
    val index = AnnIvf.buildFixed(corpus, "embedding", idCol = "vec_id", k = 4)
    val out = SemDedup.prune(index, "vec_id", tau = 1.0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // cosine of the scaled near-copies is < 1 after round-6, so nothing
    // clears an exact-1.0 threshold
    assert(out.values.forall(identity))
  }

  test("dropSide restricts which rows can be dropped (incremental asymmetry)") {
    val index = AnnIvf.buildFixed(corpus, "embedding", idCol = "vec_id", k = 4)
    // batch = ids >= 10: the near-copies are droppable and drop
    val batch = SemDedup.prune(index, "vec_id", tau = 0.95,
        dropSide = Some(col("vec_id") >= 10))
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(!batch(10L) && !batch(11L) && batch(0L) && batch(1L))
    // inverted predicate: the droppable side (ids < 10) is never the
    // HIGHER id of a near-dup pair here, so nothing drops at all
    val inverted = SemDedup.prune(index, "vec_id", tau = 0.95,
        dropSide = Some(col("vec_id") < 10))
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(inverted.values.forall(identity))
  }

  test("pruneWithCentroids matches prune given the same codebook") {
    val index = AnnIvf.buildFixed(corpus, "embedding", idCol = "vec_id", k = 4)
    val viaExpr = SemDedup.prune(index, "vec_id", tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // the same 4 lowest-id vectors as a centroid TABLE
    val cents = corpus.filter(col("vec_id") < 4)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    val viaLoop = SemDedup.pruneWithCentroids(
        corpus, "vec_id", "embedding", cents, "c_id", "cv", tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(viaLoop == viaExpr)
  }

  test("nProbe=2 catches a near-dup pair straddling a cell boundary") {
    // two cells; v1/v2 sit just either side of the boundary (nearest
    // cells differ) at cosine ~0.998 — invisible to single assignment,
    // paired through the shared second-choice cell under multi-probe
    val cents = Seq(
      (0L, Array(2.0f, 0.0f)), (1L, Array(1.5f, 1.5f)))
      .toDF("c_id", "cv")
    val vecs = Seq(
      (1L, Array(2.0f, 0.75f)), (2L, Array(2.0f, 0.9f)))
      .toDF("vec_id", "v")
    val single = SemDedup.pruneWithCentroids(
        vecs, "vec_id", "v", cents, "c_id", "cv", tau = 0.99)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(single(1L)._1 != single(2L)._1, "fixture must straddle the boundary")
    assert(single(1L)._2 && single(2L)._2, "single assignment misses the pair")
    val multi = SemDedup.pruneWithCentroids(
        vecs, "vec_id", "v", cents, "c_id", "cv", tau = 0.99, nProbe = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(multi(1L)._2 && !multi(2L)._2, "multi-probe pairs them; higher id drops")
    assert(multi(1L)._1 == single(1L)._1, "primary cell is unchanged")
  }

  test("cells come from the nearest deterministic centroid") {
    val index = AnnIvf.buildFixed(corpus, "embedding", idCol = "vec_id", k = 4)
    val cells = SemDedup.prune(index, "vec_id", tau = 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each basis vector is its own centroid; the near-copies land with
    // their originals (centroid order = id order: 0,1,2,3)
    assert(cells(10L) == cells(0L))
    assert(cells(11L) == cells(1L))
  }
}
