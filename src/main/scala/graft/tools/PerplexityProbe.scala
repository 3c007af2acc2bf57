package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement runner behind PerplexityFilterSpec's floors: kept-set
  * overlap of the bigram vs trigram perplexity filters at a given SF.
  */
object PerplexityProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .appName("ppxprobe").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one cut rule, shared with PerplexityFilterSpec
    val bi = graft.queries.QueryLib.perplexityKeptHalf(spark, dir, "txt_perplexity")
    val tri = graft.queries.QueryLib.perplexityKeptHalf(spark, dir, "txt_perplexity3")
    val jac = (bi & tri).size.toDouble / (bi | tri).size
    println(f"[ppxprobe] dir=$dir n_kept=${bi.size} overlap=${(bi & tri).size} jaccard=$jac%.3f")
    spark.stop()
  }
}
