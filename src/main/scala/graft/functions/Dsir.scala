package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): rank a raw corpus by how target-like each
  * document's hashed-n-gram distribution is, then keep the top of the
  * ranking. The published recipe fits two bag-of-hashed-n-grams unigram
  * models — p over a trusted TARGET slice, q over the RAW pool — and
  * scores every document by its log importance weight
  * `log p(doc)/q(doc) = Σ_b c_b · log(p_b/q_b)` (c_b = the doc's count
  * in hash bucket b). Documents that look like the target distribution
  * score high; boilerplate and off-domain text score low.
  *
  * Scale shape (the whole point of the hashed formulation):
  *  - Features are unigrams + bigrams hashed into [[Buckets]] buckets
  *    INSIDE the map-side projection, so the first (and only corpus-
  *    sized) shuffle carries `(doc_id, bucket:int, count)` triples —
  *    never n-gram text. The "shuffles never carry corpus text"
  *    doctrine holds by construction.
  *  - Both language models together are ONE [[Buckets]]-row table
  *    (target + raw counts per bucket, Laplace-smoothed into a single
  *    per-bucket log-ratio), broadcast to the scorers. At 100 TB the
  *    plan is scan → narrow explode/hash → partial-agg →
  *    (doc,bucket)-agg → broadcast-join → per-doc sum: no driver data,
  *    no sort, nothing quadratic.
  *  - Selection is a distributed top-k (TakeOrdered), not a global
  *    sort.
  *
  * Determinism: the bucket hash is the repo's cross-engine md5-prefix
  * idiom, counts are exact integers, and the only transcendental is
  * `ln` over those integers; the final weight is rounded to 6 decimals
  * (the `ml_ndcg` doctrine) so last-ulp `ln` differences between
  * engines can never surface in the hash gate, and rank ties at the
  * rounded weight break on doc_id.
  */
object Dsir {

  /** Hash-feature space size. 1024 keeps the oracle's recomputation
    * cheap while leaving ~2 docs/bucket collision pressure at fixture
    * scale; production DSIR uses 10k–1M — a config knob, not a shape
    * change (the model table stays a broadcast either way).
    */
  val Buckets: Int = 1024

  /** Cross-engine hash bucket of one n-gram: 32-bit md5 prefix mod B. */
  def bucket(ngram: Column): Column =
    pmod(
      conv(substring(md5(concat(lit("dsir:"), ngram)), 1, 8), 16, 10).cast("long"),
      lit(Buckets.toLong))

  /** Per-(doc, bucket) feature counts over unigrams + bigrams. The
    * explode is narrow and the bucket is computed in the same
    * projection, so exploded n-gram TEXT never reaches an exchange.
    */
  def docBucketCounts(docs: DataFrame, idCol: String, toks: Column): DataFrame =
    docs
      .select(col(idCol), explode(concat(toks, TextOps.wordShingles(toks, 2))).as("ng"))
      .select(col(idCol), bucket(col("ng")).as("b"))
      .groupBy(col(idCol), col("b"))
      .agg(count(lit(1)).as("c"))

  /** Per-document DSIR log importance weights.
    *
    * @param docs      raw pool; must carry `idCol` and the text column
    *                  `toks` is built from
    * @param idCol     document id column name
    * @param toks      tokenizer expression over `docs`
    * @param isTarget  row predicate marking the trusted target slice
    *                  (e.g. `col("lang") === "en"`); the target model
    *                  is fit on exactly these rows, the raw model on all
    * @return (idCol, n_feats, weight) — weight rounded to 6 decimals
    */
  def weights(docs: DataFrame, idCol: String, toks: Column, isTarget: Column): DataFrame = {
    // pin the (doc, bucket) counts: they feed BOTH the bucket-total
    // aggregation and the final weight join, and without the pin
    // Catalyst replans — and re-executes — the explode+md5 stage (the
    // expensive part, one hash per n-gram) once per consumer. The
    // pinned frame is (id, int, count) rows — tiny relative to text.
    val perDoc = docBucketCounts(docs, idCol, toks)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Bucket totals for BOTH models in one pass over the (doc,bucket)
    // counts: raw = everyone, target = the flagged slice. The result is
    // a ≤Buckets-row frame — broadcast by construction.
    val flagged = docs.select(col(idCol), isTarget.as("_tgt"))
    val bucketTotals = perDoc
      .join(flagged, idCol)
      .groupBy("b")
      .agg(
        sum("c").as("r"),
        sum(when(col("_tgt"), col("c")).otherwise(0L)).as("t"))

    // Fold the Laplace normalizers into one per-bucket log-ratio:
    //   lr_b = ln(t_b+1) - ln(T+B) - (ln(r_b+1) - ln(R+B))
    // Buckets never seen in raw can't be referenced by any doc (every
    // doc's n-grams ARE part of raw), so the join below never misses.
    val consts = bucketTotals.agg(
      sum("r").as("rTot"), sum("t").as("tTot"))
    val logRatios = bucketTotals
      .crossJoin(broadcast(consts))
      .select(
        col("b"),
        (log(col("t") + lit(1.0)) - log(col("tTot") + lit(Buckets.toDouble))
          - log(col("r") + lit(1.0)) + log(col("rTot") + lit(Buckets.toDouble))).as("lr"))

    perDoc
      .join(broadcast(logRatios), "b")
      .groupBy(idCol)
      .agg(
        sum("c").as("n_feats"),
        round(sum(col("c") * col("lr")), 6).as("weight"))
  }
}
