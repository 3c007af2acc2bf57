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
  def query(
      ivf: AnnIvf.Index,
      cb: AnnPq.Codebooks,
      encoded: DataFrame,
      queries: DataFrame, // (qIdCol, embCol)
      qIdCol: String, embCol: String, cIdCol: String, codeCol: String,
      topK: Int, nProbe: Int): DataFrame = {
    val (qOut, cOut) =
      if (qIdCol == cIdCol) (s"${qIdCol}_q", s"${cIdCol}_c") else (qIdCol, cIdCol)
    val qv: Column = col(embCol).cast("array<double>")
    val q = queries.select(
      col(qIdCol).as("__qid"),
      AnnPq.lutExpr(cb, qv).as("__lut"),
      explode(AnnIvf.probeCells(ivf, qv, nProbe)).as("cell"))
    val scored = encoded
      .select(col(cIdCol).as("__cid"), col("cell"), col(codeCol).as("__code"))
      .join(broadcast(q), Seq("cell"))
      .select(col("__qid").as(qOut), col("__cid").as(cOut),
        AnnPq.adcScoreLut(cb, col("__lut"), col("__code")).as("adc"))
    val w = Window.partitionBy(col(qOut)).orderBy(col("adc").desc, col(cOut))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
  }
}
