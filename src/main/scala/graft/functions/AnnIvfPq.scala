package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ composition — the production retrieval stack in one query:
  * the coarse quantizer prunes the corpus to `nProbe` cells
  * ([[AnnIvf]]), and ONLY those cells' PQ codes are ADC-scored against
  * the query's lookup table ([[AnnPq]]). At 100 TB this is the plan
  * that makes similarity search an equi-join problem twice over: the
  * probe is a broadcast equi-join on cell id (corpus-side scan prunes
  * to nProbe/k of the files when the index is cell-partitioned), and
  * the scan inside a cell reads 8-byte codes, not 256-byte floats —
  * both the IO term and the candidate term drop multiplicatively.
  * Deterministic with fixed codebooks (the oracle-gated configuration,
  * `sim_ann_ivfpq`); swap in [[Lloyd]]-trained codebooks for the
  * quality path with the identical plan shape.
  */
object AnnIvfPq {

  /** Top-`topK` per query by ADC score, searched only in each query's
    * `nProbe` nearest cells. `encoded` must carry (cIdCol, cell,
    * codeCol) — i.e. the corpus codes WITH their coarse assignment
    * (`ivf.assigned` is exactly that frame plus the embedding).
    */
  /** Top-`topK` per query by ADC score, searched only in each query's
    * `nProbe` nearest cells. `matchCols` adds FILTERED vector search —
    * the production metadata-constrained retrieval pattern ("nearest
    * neighbors WHERE label = X"): columns present on BOTH `encoded`
    * and `queries` become extra equi-join keys next to the cell id, so
    * the filter is not a post-hoc cut that starves the shortlist but
    * part of the candidate join key itself — at scale, with the index
    * (cell, matchCols)-partitioned, pruning gets STRONGER, never a
    * scan-then-discard.
    */
  def query(
      ivf: AnnIvf.Index,
      cb: AnnPq.Codebooks,
      encoded: DataFrame,
      queries: DataFrame, // (qIdCol, embCol)
      qIdCol: String, embCol: String, cIdCol: String, codeCol: String,
      topK: Int, nProbe: Int, matchCols: Seq[String] = Nil,
      lutCol: Option[String] = None): DataFrame = {
    val (qOut, cOut) =
      if (qIdCol == cIdCol) (s"${qIdCol}_q", s"${cIdCol}_c") else (qIdCol, cIdCol)
    val qv: Column = col(embCol).cast("array<double>")
    val q = queries.select(Seq(
      col(qIdCol).as("__qid"),
      // big-k path: a precomputed AnnPq.lutOf column beats 1,024 dot
      // subtrees riding the plan (codegen compile dominates small runs)
      lutCol.map(col).getOrElse(AnnPq.lutExpr(cb, qv)).as("__lut"),
      explode(AnnIvf.probeCells(ivf, qv, nProbe)).as("cell")) ++
      matchCols.map(col): _*)
    val scored = encoded
      .select(Seq(col(cIdCol).as("__cid"), col("cell"), col(codeCol).as("__code")) ++
        matchCols.map(col): _*)
      .join(broadcast(q), "cell" +: matchCols)
      .select(col("__qid").as(qOut), col("__cid").as(cOut),
        AnnPq.adcScoreLut(cb, col("__lut"), col("__code")).as("adc"))
    val w = Window.partitionBy(col(qOut)).orderBy(col("adc").desc, col(cOut))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
  }

  /** The SHIPPED retrieval configuration: ADC shortlist (`shortlist`
    * candidates from the `nProbe` probed cells) closed by an EXACT
    * full-vector cosine re-rank to `topK` — the sim_prefix_rerank
    * stage-2 kernel applied to the IVF+PQ shortlist. ADC mis-ranking
    * inside the shortlist stops costing recall entirely; what remains
    * is pure shortlist membership (probe + shortlist width), which is
    * why this leg carries the quality bar the composed ADC-only top-k
    * cannot. Shape at 100 TB: stage 1 is [[query]] (code-width scan of
    * probed cells); stage 2 touches `|queries| x shortlist` rows — the
    * shortlist and the query vectors broadcast, and the full-vector
    * fetch is a semi-join-pruned point read of shortlisted ids only
    * (with a cell-partitioned store, nProbe/k of the files), never a
    * corpus rescan.
    */
  def queryRerank(
      ivf: AnnIvf.Index,
      cb: AnnPq.Codebooks,
      encoded: DataFrame, // (cIdCol, cell, codeCol)
      corpus: DataFrame, // (cIdCol, embCol) — full-width vectors
      queries: DataFrame, // (qIdCol, embCol)
      qIdCol: String, embCol: String, cIdCol: String, codeCol: String,
      topK: Int, shortlist: Int, nProbe: Int,
      matchCols: Seq[String] = Nil,
      lutCol: Option[String] = None): DataFrame = {
    require(shortlist >= topK,
      s"shortlist $shortlist must be >= topK $topK — the re-rank only reorders")
    val (qOut, cOut) =
      if (qIdCol == cIdCol) (s"${qIdCol}_q", s"${cIdCol}_c") else (qIdCol, cIdCol)
    val short = query(ivf, cb, encoded, queries,
        qIdCol, embCol, cIdCol, codeCol, shortlist, nProbe, matchCols, lutCol)
      .select(col(qOut), col(cOut))
    val qv = queries.select(
      col(qIdCol).as(qOut), col(embCol).cast("array<double>").as("__qv"))
    val scored = corpus
      .select(col(cIdCol).as(cOut), col(embCol).cast("array<double>").as("__cv"))
      .join(broadcast(short), Seq(cOut))
      .join(broadcast(qv), Seq(qOut))
      .select(col(qOut), col(cOut),
        round(graft.plans.CosineSimilarity.cosineSim(col("__qv"), col("__cv")), 6)
          .as("cosine"))
    val w = Window.partitionBy(col(qOut)).orderBy(col("cosine").desc, col(cOut))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
  }
}
