package graft.functions

/** Driver-local seeded k-means (k-means++ init, Lloyd refinement) over
  * a BOUNDED training sample — the production codebook-training shape
  * for ANN indexes: quantizer quality needs only a few hundred points
  * per centroid (the Faiss training doctrine), so at 100 TB the
  * correct plan is ONE bounded deterministic sample collect + local
  * arithmetic, never a distributed job per Lloyd iteration. A k=16
  * codebook fit as spark.ml KMeans costs ~15 scheduler round-trips of
  * pure overhead at any corpus size; fit on a 4k-point sample here it
  * is microseconds of driver math, and the resulting centroids ride
  * into the plan as literals exactly like the closed-form codebooks
  * ([[AnnIvf.buildFixed]]).
  *
  * Everything is deterministic under (input order, seed): k-means++
  * draws through a seeded generator, Lloyd assignment ties break to
  * the lowest centroid index, and an emptied cluster reseeds to the
  * point farthest from its assigned centroid (lowest index on ties).
  */
object Lloyd {

  /** Deterministic bounded training sample: the `maxSample` rows with
    * the smallest xxhash64 of the vector itself — a distributed
    * TakeOrdered (one job, no full sort), stable under repartitioning
    * and engine-replayable, returning driver-size arrays by
    * construction. This is the ONE corpus touch codebook training
    * makes at any scale.
    */
  def sampleVectors(df: org.apache.spark.sql.DataFrame, embCol: String,
                    maxSample: Int): Array[Array[Double]] = {
    import org.apache.spark.sql.functions._
    df.filter(col(embCol).isNotNull)
      .select(col(embCol).cast("array<double>").as("__v"))
      .orderBy(xxhash64(col("__v")), col("__v"))
      .limit(maxSample)
      .collect().map(_.getSeq[Double](0).toArray)
  }

  /** Train `k` centroids with `restarts` independent seeded runs,
    * keeping the lowest within-cluster SSE — the standard guard
    * against one unlucky k-means++ draw (spark.ml buys the same
    * robustness with k-means|| init's extra distributed passes; here
    * a restart is microseconds of driver math). Deterministic: run r
    * uses seed + r, and the comparison is exact on SSE with the
    * lowest run index winning ties.
    */
  def fit(points: Array[Array[Double]], k: Int, seed: Long, maxIter: Int,
          restarts: Int = 4): Array[Array[Double]] = {
    require(restarts >= 1, s"restarts must be >= 1, got $restarts")
    // restarts are seed-independent runs — evaluate them CONCURRENTLY
    // (driver cores are idle while Lloyd spins); determinism is
    // untouched because each run's seed is fixed by its index and the
    // winner is selected by (sse, lowest index), never completion order
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val runs = Await.result(
      Future.sequence((0 until restarts).map { r => Future {
        val cs = fitOnce(points, k, seed + r, maxIter)
        val sse = points.iterator.map { p =>
          var m = Double.PositiveInfinity; var j = 0
          while (j < k) {
            var s = 0.0; var i = 0
            while (i < p.length) { val d = p(i) - cs(j)(i); s += d * d; i += 1 }
            if (s < m) m = s
            j += 1
          }
          m
        }.sum
        (sse, r, cs)
      }}), Duration.Inf)
    runs.minBy(t => (t._1, t._2))._3
  }

  /** One seeded k-means++ + Lloyd run. `points` must be non-empty rows
    * of equal dimension; if there are fewer distinct points than `k`
    * the extra centroids duplicate sampled points (harmless for
    * assignment: ties break to the lowest index).
    */
  private def fitOnce(points: Array[Array[Double]], k: Int,
                      seed: Long, maxIter: Int): Array[Array[Double]] = {
    require(points.nonEmpty, "cannot fit a codebook on an empty sample")
    require(k >= 1, s"k must be >= 1, got $k")
    val n = points.length
    val dim = points(0).length
    val rnd = new scala.util.Random(seed)

    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }

    // k-means++ seeding: first centroid uniform, each next drawn with
    // probability proportional to squared distance from the chosen set
    val centers = new Array[Array[Double]](k)
    centers(0) = points(rnd.nextInt(n)).clone()
    val minD2 = Array.tabulate(n)(i => d2(points(i), centers(0)))
    var c = 1
    while (c < k) {
      val total = minD2.sum
      val pick =
        if (total <= 0) rnd.nextInt(n) // all mass at chosen points: uniform
        else {
          var r = rnd.nextDouble() * total
          var i = 0
          while (i < n - 1 && r >= minD2(i)) { r -= minD2(i); i += 1 }
          i
        }
      centers(c) = points(pick).clone()
      var i = 0
      while (i < n) {
        val d = d2(points(i), centers(c))
        if (d < minD2(i)) minD2(i) = d
        i += 1
      }
      c += 1
    }

    // Lloyd: assign (ties -> lowest index), recompute, reseed empties
    val assign = new Array[Int](n)
    var iter = 0
    var changed = true
    while (iter < maxIter && changed) {
      changed = false
      var i = 0
      while (i < n) {
        var best = 0; var bestD = d2(points(i), centers(0)); var j = 1
        while (j < k) {
          val d = d2(points(i), centers(j))
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        if (assign(i) != best || iter == 0) { assign(i) = best; changed = true }
        i += 1
      }
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      i = 0
      while (i < n) {
        val a = assign(i); counts(a) += 1
        var j = 0
        while (j < dim) { sums(a)(j) += points(i)(j); j += 1 }
        i += 1
      }
      var j = 0
      while (j < k) {
        if (counts(j) > 0) {
          var t = 0
          while (t < dim) { centers(j)(t) = sums(j)(t) / counts(j); t += 1 }
        } else {
          // deterministic reseed: the point farthest from its centroid
          var far = 0; var farD = -1.0; var i2 = 0
          while (i2 < n) {
            val d = d2(points(i2), centers(assign(i2)))
            if (d > farD) { farD = d; far = i2 }
            i2 += 1
          }
          centers(j) = points(far).clone()
        }
        j += 1
      }
      iter += 1
    }
    centers
  }

  /** Distributed Lloyd over the FULL frame — the complement of the
    * bounded-sample [[fit]]: when the OUTPUT is the clustering itself
    * (segmentation, not a quantizer codebook), every row must be
    * assigned, so each iteration is one map-side argmin against k
    * broadcast-literal centroids plus one k-key hash-agg (map-side
    * partials — the shuffle carries k×(d+1) numbers per task, never
    * rows). The driver round per iteration collects exactly k rows.
    * At 100 TB: iters scans, zero row-shuffles, driver state = k
    * centroids — the textbook scalable Lloyd.
    *
    * Fully deterministic, engine-replayable (the ml_kmeans oracle
    * unrolls it in SQL): init is the k lowest-`idCol` rows' features;
    * the distance is a fixed IEEE sequence over exact-integer features
    * and round(6) centroids; ties break to the lowest cluster id; new
    * centroids are exact integer sums closed by one division and
    * round(6). A cluster that empties simply disappears from the next
    * argmin (both engines derive the survivor set from the same
    * grouped assignment). Returns the final (cluster, n, per-column
    * means) frame.
    */
  def fitDistributed(
      feats: org.apache.spark.sql.DataFrame,
      idCol: String,
      xCols: Seq[String],
      k: Int,
      iters: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    require(k >= 1 && iters >= 1, s"need k >= 1 and iters >= 1, got $k/$iters")
    val xd = xCols.map(c => col(c).cast("double"))
    var centers: Seq[(Int, Seq[Double])] = feats.orderBy(col(idCol)).limit(k)
      .select(xCols.map(c => col(c).cast("double")): _*)
      .collect().toSeq.zipWithIndex
      .map { case (r, j) => (j, xCols.indices.map(r.getDouble)) }
    def assignExpr: Column = {
      val scored = centers.map { case (j, cvec) =>
        val d = xCols.indices
          .map(i => (xd(i) - lit(cvec(i))) * (xd(i) - lit(cvec(i))))
          .reduce(_ + _)
        struct(d.as("d"), lit(j).as("c"))
      }
      array_min(array(scored: _*)).getField("c")
    }
    var out: org.apache.spark.sql.DataFrame = null
    var finalRows: Array[org.apache.spark.sql.Row] = Array.empty
    for (_ <- 0 until iters) {
      val meanCols = xCols.map(c =>
        round(sum(col(c)).cast("double") / count(lit(1)).cast("double"), 6)
          .as(s"c_$c"))
      out = feats.withColumn("__c", assignExpr)
        .groupBy(col("__c").as("cluster"))
        .agg(count(lit(1)).as("n"), meanCols: _*)
      finalRows = out.collect()
      centers = finalRows.toSeq.map(r =>
        (r.getInt(0), xCols.indices.map(i => r.getDouble(2 + i))))
    }
    // return the k rows already collected by the last driver round as
    // a local frame — a caller action on the lazy `out` plan would
    // otherwise re-run the final full-corpus assign+agg scan, one
    // whole extra scan under the iters-scans cost model
    feats.sparkSession.createDataFrame(
      java.util.Arrays.asList(finalRows: _*), out.schema)
  }
}
