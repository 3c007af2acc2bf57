package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The r17 verdict's quality note for txt_perplexity3: how much does
  * upgrading the CCNet-style filter from a bigram LM to interpolated
  * trigram with stupid backoff actually CHANGE the kept set? Both
  * filters rank the scored slice by perplexity and keep the best half
  * (the production shape: a quality-budget cut, not a fixed
  * threshold); the spec measures kept-set Jaccard overlap and prints
  * it — the number a data-curation owner reads before swapping
  * filters. Sanity floors only: the two LMs share the training slice
  * and the unigram floor, so they must agree far above chance (random
  * half-keeps of n docs overlap ≈ 1/3 by Jaccard), but they must NOT
  * be identical — a 1.0 overlap would mean the trigram context added
  * nothing and the upgrade is dead weight.
  */
class PerplexityFilterSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("trigram filter reranks meaningfully but agrees with bigram far above chance") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    // the cut rule lives in ONE place (QueryLib.perplexityKeptHalf) so
    // the probe's reported overlap is exactly what this spec asserts
    val bi = QueryLib.perplexityKeptHalf(spark, sfDir, "txt_perplexity")
    val tri = QueryLib.perplexityKeptHalf(spark, sfDir, "txt_perplexity3")
    assert(bi.size == tri.size, s"same budget cut: ${bi.size} vs ${tri.size}")
    val jac = (bi & tri).size.toDouble / (bi | tri).size
    info(f"kept-set Jaccard overlap (best-half cut): $jac%.3f (${(bi & tri).size} of ${(bi | tri).size})")
    // measured (tools/PerplexityProbe): 0.429 / 0.449 / 0.446 at
    // sf0.001/0.01/0.1 — stable above the 1/3 chance level of two
    // random half-keeps but far from 1.0, which is the EXPECTED shape
    // on this synthetic corpus: per-doc perplexity differences are
    // mostly sampling noise (no real linguistic structure for the
    // longer context to exploit), so the trigram filter re-ranks
    // heavily. On real text the two filters would agree much more;
    // the floor here only guards "not broken" (≈ chance) and "not
    // dead weight" (identical)
    assert(jac > 0.38, f"filters agree at chance level ($jac%.3f) — trigram LM looks broken")
    assert(jac < 1.0, "kept sets identical — the trigram context changed nothing")
  }
}
