package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.CosineSimilarity

/** Semantic deduplication (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
  * cluster the embedding corpus with a coarse quantizer, then compare
  * pairs ONLY within a cluster — near-duplicate semantics ("two docs say
  * the same thing") live at high cosine, and high-cosine pairs land in
  * the same cell with overwhelming probability, so the quadratic pair
  * search shrinks from O(n²) to O(Σ_c n_c²) with n_c ≈ n/k.
  *
  * Scale shape (100 TB): the cluster assignment is one narrow pass (the
  * centroid table rides along as literals / a broadcast); the candidate
  * stage is a self-equi-join ON THE CELL ID — shuffle-partitionable at
  * any corpus size, never an all-pairs scan — and k grows with the
  * corpus (k ≈ n/target_cell_size) so per-cell work stays bounded.
  * Survivor choice is deterministic: within a cell, a vector is dropped
  * iff some LOWER-id vector sits within the cosine threshold — the
  * min-id chain representative, no RNG to disagree across engines.
  *
  * Verification: with [[AnnIvf.buildFixed]]'s deterministic codebook
  * (k lowest-id vectors, zero Lloyd iterations) every step — codebook,
  * nearest-centroid assignment (round-6 before the argmax, ties toward
  * the larger centroid index), within-cell cosine (round-6 before the
  * threshold) — is closed-form and recomputable in ANSI SQL, so the
  * whole prune is hash-gateable; [[AnnIvf.build]] (trained KMeans) is
  * the quality path, spec-verified statistically like sim_ann_recall.
  */
object SemDedup {

  /** Mark every row kept/dropped. Returns (idCol, cell, kept) — one row
    * per input vector; `kept = false` iff a lower-id same-cell vector
    * has round-6 cosine >= tau with it.
    */
  def prune(index: AnnIvf.Index, idCol: String, tau: Double): DataFrame = {
    val a = index.assigned.select(
      col(idCol).as("__ida"), col("cell"),
      col(index.embCol).cast("array<double>").as("__va"))
    val b = index.assigned.select(
      col(idCol).as("__idb"), col("cell"),
      col(index.embCol).cast("array<double>").as("__vb"))
    // each dropped id appears once no matter how many lower-id
    // neighbors it has: aggregate the pair join by the higher id
    val dropped = a.join(b,
        a("cell") === b("cell") && col("__ida") < col("__idb") &&
          round(CosineSimilarity.cosineSim(col("__va"), col("__vb")), 6) >= tau)
      .select(col("__idb").as(idCol)).distinct()
      .withColumn("__drop", lit(true))
    index.assigned.select(col(idCol), col("cell").cast("long").as("cell"))
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cell"),
        coalesce(!col("__drop"), lit(true)).as("kept"))
  }
}
