package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ML feature-preparation operators (extension — no reference analogue;
  * the standard last-mile transforms between a curated corpus and a
  * trainer's input).
  *
  * Both are built on the repo's cross-engine-determinism conventions:
  * hashing rides md5 (reproducible in any engine, unlike murmur3 whose
  * seeds differ), and encodings do ALL arithmetic in exact integer/
  * decimal space with ONE double division at the very end — so a DuckDB
  * oracle can reproduce results bit-for-bit.
  */
object MlPrep {

  /** The hashing trick: a categorical/string column into one of
    * `buckets` indices, plus the ±1 sign that unbiases collisions
    * (Weinberger et al., "Feature Hashing for Large Scale Multitask
    * Learning", ICML 2009). Index = first 8 md5 nibbles mod buckets;
    * sign = parity of the 9th nibble. Pure narrow expressions — no
    * shuffle, vocabulary-free (the point: no fit step, no dictionary
    * to ship to 1000 executors).
    */
  def featureHash(input: Column, buckets: Int, seed: String = "fh"): Column = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    pmod(conv(substring(md5(concat(lit(s"$seed:"), input)), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))
  }

  /** The collision-unbiasing sign for [[featureHash]]: +1 or -1. */
  def featureHashSign(input: Column, seed: String = "fh"): Column =
    when(conv(substring(md5(concat(lit(s"$seed:"), input)), 9, 1), 16, 10)
      .cast("int") % 2 === 0, lit(1)).otherwise(lit(-1))

  /** Leave-one-out target encoding with additive smoothing toward the
    * global mean: for row i of category c,
    *
    *   enc_i = ((sum_c - t_i) + prior * m) / ((cnt_c - 1) + m)
    *
    * with prior = global_sum / N and smoothing strength `m`. Leaving
    * the row's own target out removes the self-leakage that makes
    * naive target encoding overfit; `m` shrinks rare categories toward
    * the prior.
    *
    * Determinism: prior is itself a division, so the formula is
    * algebraically rearranged to ONE double division of two exactly-
    * computed quantities:
    *
    *   enc_i = ((sum_c - t_i) * N + global_sum * m) /
    *           (((cnt_c - 1) + m) * N)
    *
    * numerator and denominator both INTEGER-exact: targets quantize to
    * cents (scale-2 fixed point) and every operation stays in wide
    * integers (decimal(38,0) here, HUGEINT in a DuckDB oracle) — the
    * engines' decimal-width promotion rules differ, integer arithmetic
    * does not. Shape: one per-category hash-agg (tiny),
    * one global 1-row agg over it (broadcast), one join back on the
    * category (broadcast when the category table is small, which it is
    * by construction — categories, not rows). A pathologically hot
    * category skews the join-back like any key join; the standard salt
    * applies (ops/Scale.scala).
    */
  def targetEncode(
      df: DataFrame,
      catCol: String,
      targetCol: String,
      m: Int = 10,
      outCol: String = "target_enc"): DataFrame = {
    require(m >= 0, s"smoothing strength must be >= 0, got $m")
    def cents(c: Column) = (c.cast("decimal(18,2)") * 100).cast("decimal(38,0)")
    val t = cents(col(targetCol))
    // the global 1-row aggregate attaches to the category table via an
    // equi-join on a constant key, NOT a crossJoin: same plan cost, but
    // it stays a BroadcastHashJoin — the repo's plan contract bans
    // nested-loop joins outright rather than carving out "benign" ones
    // the key must be OPTIMIZER-OPAQUE: a lit(1) = lit(1) condition
    // constant-folds to `true` and the join degenerates to the nested
    // loop again — pmod(hash(<non-null col>), 1) is 0 on every row but
    // references a column, so no rewrite rule folds it (the same
    // device as ffillBucketed's seed window partition key)
    val K = "__te_one"
    val perCat = df.groupBy(col(catCol))
      .agg(count(t).as("__cnt"), sum(t).as("__sum"))
      .withColumn(K, pmod(hash(col("__cnt")), lit(1)))
    val global = perCat.agg(
      sum(col("__cnt")).as("__n"), sum(col("__sum")).as("__gsum"))
      .withColumn(K, pmod(hash(col("__n")), lit(1)))
    val stats = broadcast(perCat.join(broadcast(global), Seq(K)).drop(K))
    df.join(stats, Seq(catCol))
      .withColumn(outCol,
        (((col("__sum") - t) * col("__n") + col("__gsum") * lit(m)).cast("double")) /
          (((col("__cnt") - 1 + lit(m)) * col("__n")).cast("double")))
      .drop("__cnt", "__sum", "__n", "__gsum")
  }

  /** Exact population covariance matrix over `cols` (the PCA/whitening
    * precursor), long format: one row per unordered pair `(x, y, cov)`
    * including the diagonal variances. ONE aggregation pass computes
    * every Σxᵢ and Σxᵢxⱼ as exact integer-cents decimals (values are
    * read at 2-decimal precision — the repo's cents convention), so
    * k columns cost one scan and a 1-row reduce however many pairs
    * there are — never k² passes, never a collect. Each covariance is
    * cov = (n·Σxy − Σx·Σy) / (n²·10⁴), all-integer numerator, with the
    * two casts and one division as the only IEEE steps, rounded at 6 —
    * the [[targetEncode]] determinism convention. The pair explode runs
    * on the single aggregate row: metadata-sized.
    */
  def covarianceMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least 2 columns, got ${cols.size}")
    val cents = cols.map(f => round(col(f) * 100).cast("decimal(38,0)"))
    val pairs = for { i <- cols.indices; j <- i until cols.size } yield (i, j)
    val aggs = cols.indices.map(i => sum(cents(i)).as(s"__s_$i")) ++
      pairs.map { case (i, j) => sum(cents(i) * cents(j)).as(s"__p_${i}_$j") }
    val stats = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = pairs.map { case (i, j) =>
      struct(lit(cols(i)).as("x"), lit(cols(j)).as("y"),
        round((col("__n") * col(s"__p_${i}_$j") - col(s"__s_$i") * col(s"__s_$j"))
            .cast("double") /
          (col("__n").cast("double") * col("__n").cast("double") * lit(10000.0)), 6)
          .as("cov"))
    }
    stats.select(explode(array(entries: _*)).as("e"))
      .select(col("e.x").as("x"), col("e.y").as("y"), col("e.cov").as("cov"))
  }
}
