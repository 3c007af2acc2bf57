package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.BinLength

/** Multinomial Naive Bayes document classifier in WHOLE BITS — the
  * fastText-shaped quality/language classifier every curation pipeline
  * runs over its corpus, made hash-gateable: class scores are integer
  * sums of whole-bit surprisals (the txt_unigram_surprisal doctrine
  * lifted from scoring to CLASSIFICATION), so training and inference
  * are each one aggregation pass with zero libm-log parity hazard.
  *
  * Model: for class c with token total N_c over global vocabulary V,
  * an add-one-smoothed token cost bits(t, c) =
  * floor(log2((N_c + V) / (cnt(t, c) + 1))) — floor-log2 of the
  * integer quotient, computed as bin-length − 1 ([[BinLength]]); the
  * class prior adds floor(log2(N_docs / N_docs_c)). Lower total bits =
  * higher class probability (the costs are negative log-probs at
  * whole-bit resolution); prediction is the min-bits class, ties to
  * the lexicographically smallest class label — total order, no RNG.
  *
  * Scale shape (100 TB): training = ONE hash-agg over (class, token)
  * plus a class-dictionary-sized rollup; inference joins each token
  * occurrence against the class-token table on the token key — a
  * shuffle whose key space is the vocabulary — fanned out by the class
  * dimension (a tiny broadcast: |classes| rows). Nothing driver-side:
  * both passes are plain distributed aggregations, and the model
  * itself is a DataFrame (persistable as a feature table).
  *
  * The self-training shape (fit and predict over the same corpus) is
  * what the gate exercises; splitting train/apply frames is the
  * caller's one-line variation.
  */
object NbClassifier {

  /** Fit on (idCol, labelCol, explode(toksCol)) and classify every
    * document. Returns one row per document that has at least one
    * non-empty token: (idCol, labelCol, pred, bits) where `bits` is
    * the winning class's total cost and `pred` its label.
    */
  def classify(
      docs: DataFrame,
      idCol: String,
      labelCol: String,
      toksCol: Column): DataFrame = {
    val tok = docs
      .select(col(idCol), col(labelCol), explode(toksCol).as("__t"))
      .filter(length(col("__t")) > 0)
    // class-token counts: the model's bulk, keyed on the token
    val cnt = tok.groupBy(col(labelCol).as("__c"), col("__t"))
      .agg(count(lit(1)).as("__cnt"))
    // per-class totals + doc priors + the 1-row corpus scalars — all
    // class-dictionary-sized, broadcast into the inference join
    val nc = cnt.groupBy(col("__c")).agg(sum(col("__cnt")).as("__nc"))
    val dc = docs.groupBy(col(labelCol).as("__c")).agg(count(lit(1)).as("__dc"))
    val scalars = tok.agg(count_distinct(col("__t")).as("__vv"))
      .crossJoin(docs.agg(count(lit(1)).as("__n")))
    val classes = nc.join(dc, Seq("__c")).crossJoin(scalars)
    // inference: every token occurrence scores against EVERY class —
    // the class fan-out is a broadcast nested loop over |classes|
    // rows; absent (t, c) pairs fall through the left join to the
    // full smoothed cost binLen((nc + V) div 1) − 1. Divisions are
    // integer `div` — a double-divide could round UP across the floor
    // boundary the whole-bit cost sits on
    val scored = tok
      .crossJoin(broadcast(classes))
      .join(cnt, Seq("__c", "__t"), "left")
      .withColumn("__bits",
        (BinLength.binLen(
          expr("(__nc + __vv) div (coalesce(__cnt, 0L) + 1L)")) - 1).cast("long"))
      .groupBy(col(idCol), col(labelCol), col("__c"), col("__dc"), col("__n"))
      .agg(sum(col("__bits")).as("__tokbits"))
      .withColumn("__score",
        col("__tokbits") + (BinLength.binLen(expr("__n div __dc")) - 1).cast("long"))
    scored
      .groupBy(col(idCol), col(labelCol))
      .agg(min(struct(col("__score"), col("__c"))).as("__best"))
      .select(col(idCol), col(labelCol),
        col("__best.__c").as("pred"),
        col("__best.__score").as("bits"))
  }
}
