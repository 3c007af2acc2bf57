package graft.queries

import graft.SparkSpec

/** The raw numbers behind the `sim_ann_recall` gate: the gate itself
  * hashes only floor-pass bits (the only deterministic oracle an
  * iterative trainer admits), so THIS spec is where the measured
  * recalls live — with enough headroom over the gate floors that
  * partitioning-dependent KMeans initialization cannot flip the gate.
  */
class AnnRecallGateSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("trained IVF, PQ and composed IVF+PQ recalls clear the gate floors with headroom") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val (ivf, pq, ivfpq, rerank, total) = QueryLib.annTrainedRecalls(spark, sfDir)
    info(f"trained-IVF recall@10 (nProbe=8/16):    $ivf%.3f (gate floor 0.70)")
    info(f"trained-PQ shortlist recall@10-in-50:   $pq%.3f (gate floor 0.75)")
    info(f"composed IVF+PQ recall@10-in-50:        $ivfpq%.3f (gate floor 0.70)")
    info(f"shipped IVF+PQ+rerank recall@10:        $rerank%.3f (gate floor 0.85)")
    assert(total == 100, s"expected 10 queries x top-10 = 100 truth pairs, got $total")
    // spec floors sit ABOVE the gate floors: if recall erodes to within
    // 0.05 of the gate, this fails first, before the driver gate can flake
    assert(ivf >= 0.75, f"trained-IVF recall $ivf%.3f within 0.05 of the 0.70 gate floor")
    assert(pq >= 0.80, f"trained-PQ recall $pq%.3f within 0.05 of the 0.75 gate floor")
    assert(ivfpq >= 0.75, f"composed IVF+PQ recall $ivfpq%.3f within 0.05 of the 0.70 gate floor")
    assert(rerank >= 0.90, f"shipped rerank recall $rerank%.3f within 0.05 of the 0.85 gate floor")
    // composition sanity: the composed leg searches a SUBSET of the
    // pure-PQ leg's candidates (probed cells only, same codes, same
    // shortlist size), so it can never exceed pure PQ
    assert(ivfpq <= pq + 1e-9,
      f"composed recall $ivfpq%.3f exceeds pure-PQ $pq%.3f — probe not pruning?")
    // the shipped configuration must strictly dominate the narrow
    // composed top-k it replaces as the quality bar
    assert(rerank >= ivfpq - 1e-9,
      f"rerank recall $rerank%.3f below the narrow composed leg $ivfpq%.3f")
  }

  test("gate query emits the exact oracle rows at sf0.001") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val rows = QueryLib.queries("sim_ann_recall")(spark, sfDir)
      .orderBy("method").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("ivf_trained", "ivfpq_rerank", "ivfpq_trained", "pq_trained"))
    assert(rows.forall(_.getInt(3) == 1), "a trained ANN path fell below its recall floor")
    assert(rows.forall(_.getInt(1) == 100))
  }
}
