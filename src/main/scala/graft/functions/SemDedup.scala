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
    *
    * `dropSide` restricts which rows can be DROPPED (the higher-id
    * pair side) — the incremental-dedup asymmetry of
    * [[SimilarityOps.lshCandidatePairs]]'s bSideFilter: judging a new
    * batch against corpus + itself filters the join's b side from the
    * whole corpus to the batch, so at 100 TB the historical cells only
    * ever pair against new-batch rows instead of re-pairing themselves
    * every run; rows outside the predicate always come back kept.
    */
  def prune(index: AnnIvf.Index, idCol: String, tau: Double,
      dropSide: Option[Column] = None): DataFrame = {
    val a = index.assigned.select(
      col(idCol).as("__ida"), col("cell"),
      col(index.embCol).cast("array<double>").as("__va"))
    val b = dropSide.fold(index.assigned)(index.assigned.filter).select(
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

  /** Corpus-scale variant: k must grow with the corpus (k ≈
    * n / target_cell_size keeps the within-cell quadratic flat — the
    * 1M-vector probe measured k=256 at 195 s; k=4096 collapses the
    * pair volume 256×), but [[AnnIvf]]'s embedded-literal assignment
    * expression caps k at tens of centroids before the codegen tree
    * explodes, a row fan-out (n × k rows through a broadcast join)
    * shuffles the corpus k-fold, and a higher-order-function fold is
    * interpreted per element. Flat-quantizer assignment is O(n·k·d)
    * arithmetic with NO data movement, so the right Spark shape is the
    * documented mapPartitions last resort: a tight JVM argmax loop per
    * row against the driver-collected codebook (k·d doubles — tiny),
    * pipelined with the scan. Same round-6-before-argmax and
    * tie-toward-larger-centroid-id semantics as AnnIvf.probeCells
    * (SemDedupSpec pins parity with [[prune]] on a shared corpus).
    *
    * `centroids` carries (cidCol: numeric id, cvecCol: float/double
    * array). Returns (idCol, cell, kept) like [[prune]] — `cell` is
    * the primary (nearest) cell.
    *
    * `nProbe` > 1 multi-assigns each vector to its nProbe nearest
    * cells and pairs vectors sharing ANY of them — the standard
    * multi-probe refinement for the single-assignment boundary miss
    * (a near-dup pair straddling a cell boundary is invisible to
    * nProbe = 1: the probe plants 10,000 scaled copies and single
    * assignment misses 23). Candidate volume grows ≤ nProbe× — still
    * an equi-join on the cell key, never all-pairs. nProbe = 1 keeps
    * the exact round-6 argmax parity with [[prune]] (spec-pinned);
    * the multi-probe ranking uses raw scores (it has no SQL-oracle
    * twin to stay bit-parallel with).
    */
  def pruneWithCentroids(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      cidCol: String,
      cvecCol: String,
      tau: Double,
      nProbe: Int = 1): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val spark = vecs.sparkSession
    import spark.implicits._
    // codebook to the driver once: ids ascending so the argmax loop's
    // ">= best" update realizes the tie-toward-larger-id convention
    val cents: Array[(Long, Array[Double], Double)] = centroids
      .select(col(cidCol).cast("long"), col(cvecCol).cast("array<double>"))
      .collect()
      .map(r => {
        val v = r.getSeq[Double](1).toArray
        (r.getLong(0), v, v.map(x => x * x).sum / 2)
      })
      .sortBy(_._1)
    require(cents.nonEmpty, "pruneWithCentroids: the centroid table is empty")
    val dim = cents.head._2.length
    require(cents.forall(_._2.length == dim),
      s"pruneWithCentroids: centroid dimensions differ (expected $dim)")
    val bc = spark.sparkContext.broadcast(cents)
    val assigned = vecs
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val cb = bc.value
        val scores = new Array[Double](cb.length) // reused across rows
        def round6(x: Double): Double = java.math.BigDecimal.valueOf(x)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        it.map { case (id, v) =>
          // loud per-row input validation: a truncated vector would
          // silently score a PARTIAL dot and land in the wrong cell;
          // a NaN component makes every comparison false and the
          // argmax would index -1 two screens later with no hint why
          if (v == null || v.length != cb.head._2.length)
            throw new IllegalArgumentException(
              s"pruneWithCentroids: id=$id embedding has dim " +
                s"${if (v == null) "null" else v.length}, codebook has ${cb.head._2.length}")
          // pass 1: raw scores + raw max — NO per-candidate decimal
          // rounding (a BigDecimal per (row, centroid) dominated the
          // probe: 4e9 allocations ≈ 5x the dot-product arithmetic)
          var maxRaw = Double.NegativeInfinity
          var i = 0
          while (i < cb.length) {
            val cv = cb(i)._2
            var d = 0.0
            var j = 0
            while (j < v.length) { d += v(j) * cv(j); j += 1 }
            val s = d - cb(i)._3
            scores(i) = s
            if (s > maxRaw) maxRaw = s
            i += 1
          }
          // pass 2: the SAME HALF_UP round-at-6 argmax Spark's round()
          // gives prune() — but only candidates close enough to the
          // raw max to possibly round equal to it (two values > 1e-6
          // apart, plus representation slack, can never round to the
          // same 6-decimal grid point) pay the decimal conversion.
          // nProbe > 1 then fills the remaining slots by raw score
          // (descending, ties toward larger cid like everything else)
          var bestS = Double.NegativeInfinity
          var bestJ = -1
          val cut = maxRaw - 1.01e-6
          i = 0
          while (i < cb.length) {
            if (scores(i) >= cut) {
              val s = round6(scores(i))
              if (s >= bestS) { bestS = s; bestJ = i }
            }
            i += 1
          }
          // all-NaN scores (a NaN embedding component) leave bestJ at
          // -1: fail with the cause, not an index error downstream
          if (bestJ < 0)
            throw new IllegalArgumentException(
              s"pruneWithCentroids: id=$id scored no centroid (NaN embedding component?)")
          val cells = new Array[Long](math.min(nProbe, cb.length))
          cells(0) = cb(bestJ)._1
          if (cells.length > 1) {
            scores(bestJ) = Double.NegativeInfinity // consumed
            var slot = 1
            while (slot < cells.length) {
              var mi = 0
              var m = Double.NegativeInfinity
              i = 0
              while (i < cb.length) {
                if (scores(i) >= m) { m = scores(i); mi = i }
                i += 1
              }
              cells(slot) = cb(mi)._1
              scores(mi) = Double.NegativeInfinity
              slot += 1
            }
          }
          (id, v, cells)
        }
      }
      .toDF(idCol, "__v", "__cells")
      // pin: BOTH pair-join sides and the final survivor select read
      // this frame — unpinned, the O(n·k·d) assignment loop re-runs
      // once per reference (measured 3x = ~50 s of the 65 s probe)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val byCell = assigned.select(col(idCol), col("__v"),
      explode(col("__cells")).as("cell"))
    val a = byCell.select(col(idCol).as("__ida"), col("cell"), col("__v").as("__va"))
    val b = byCell.select(col(idCol).as("__idb"), col("cell"), col("__v").as("__vb"))
    val dropped = a.join(b,
        a("cell") === b("cell") && col("__ida") < col("__idb") &&
          round(CosineSimilarity.cosineSim(col("__va"), col("__vb")), 6) >= tau)
      .select(col("__idb").as(idCol)).distinct()
      .withColumn("__drop", lit(true))
    assigned.select(col(idCol), element_at(col("__cells"), 1).as("cell"))
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cell"),
        coalesce(!col("__drop"), lit(true)).as("kept"))
  }
}
