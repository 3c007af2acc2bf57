package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Similarity / deduplication primitives for training-data pipelines:
  * MinHash+LSH banding, n-gram Jaccard, SimHash, and embedding cosine.
  * All pure Catalyst `Column` expressions over array/string built-ins —
  * no UDFs, so everything stays inside whole-stage codegen and the only
  * shuffles are the ones the *caller* introduces (the LSH band-bucket
  * join, the ANN bucket join).
  *
  * Hashing is MD5-based throughout: MD5 is engine-independent (the same
  * bytes hash identically in Spark, DuckDB, or anything else), which
  * makes every signature reproducible across systems — unlike
  * `hash()`/`xxhash64` whose seeds and mixing are engine-specific.
  *
  * Scale notes (100 TB): minhash signatures are O(docLen) per row with
  * no shuffle; candidate generation is an equi-join on (band, bandKey)
  * — a standard shuffle join whose key space grows with corpus size, so
  * it parallelizes across executors; the exact-Jaccard verification
  * only runs on candidate pairs (LSH's whole point).
  */
object SimilarityOps {

  // ------------------------------------------------------------ MinHash

  /** K min-hash values of a shingle-set column. Each hash family member
    * is `md5(i + "|" + shingle)`; the minimum is taken in STRING order,
    * which is a uniform random permutation of the shingle universe just
    * like a numeric minhash. Returns one Column per hash function.
    */
  def minhashSig(shingles: Column, k: Int): Seq[Column] =
    (0 until k).map { i =>
      array_min(transform(shingles, s => md5(concat(lit(s"$i|"), s))))
    }

  /** LSH band keys: the signature grouped into bands of `rowsPerBand`,
    * each band hashed to one bucket key. Docs sharing ANY band key are
    * candidate pairs.
    */
  def bandKeys(sig: Seq[Column], rowsPerBand: Int): Seq[Column] =
    sig.grouped(rowsPerBand).map(g => md5(g.reduce((a, b) => concat(a, lit("|"), b)))).toSeq

  // ------------------------------------------------------------ Jaccard

  /** Exact Jaccard similarity of two array columns treated as sets. */
  def jaccard(a: Column, b: Column): Column = {
    val ad = array_distinct(a)
    val bd = array_distinct(b)
    val inter = size(array_intersect(ad, bd)).cast("double")
    inter / (size(ad) + size(bd) - size(array_intersect(ad, bd))).cast("double")
  }

  // ------------------------------------------------------------ SimHash

  /** 16-bit SimHash of a token array: bit j of the fingerprint is set
    * iff the sum over tokens of ±1 (sign = bit j of md5(token)) is
    * positive. 16 bits keeps the expression tree small while still
    * demonstrating the sketch; widen by calling twice with different
    * seeds and concatenating.
    */
  def simhash16(toks: Column, seed: String = ""): Column = {
    // per-token 16-bit hash from the md5 hex prefix
    val h = transform(toks, t => conv(substring(md5(concat(lit(seed), t)), 1, 4), 16, 10).cast("int"))
    val bits = (0 until 16).map { j =>
      val votes = aggregate(h, lit(0),
        (acc, x) => acc + when(shiftright(x, j).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(votes > 0, lit(1 << j)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Hamming distance between two small integer fingerprints. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  // ------------------------------------------------------------- Cosine

  /** Dot product of two double-array columns (sequential left fold —
    * deterministic summation order).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity of two double-array columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  // ----------------------------------------------- random-hyperplane LSH

  /** Deterministic pseudo-random hyperplanes for sign-LSH: plane j's
    * component d is ±1 derived from md5("j_d") — computed driver-side,
    * embedded as literals, identical across runs and engines.
    */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { j =>
      Array.tabulate(dim) { d =>
        val h = md.digest(s"${j}_$d".getBytes("UTF-8"))
        if ((h(0) & 1) == 1) 1.0 else -1.0
      }
    }
  }

  /** Sign-LSH bucket id of an embedding: one bit per hyperplane (sign of
    * the dot product), packed into an int. Vectors in the same bucket
    * are ANN candidates.
    */
  def signBucket(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(v, planeCol) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
}
