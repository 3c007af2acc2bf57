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
    def kept(gate: String): Set[Long] = {
      val df = graft.queries.QueryLib.queries(gate)(spark, dir)
        .select(col("doc_id").cast("long"), col("perplexity"))
      val n = df.count().toInt
      df.orderBy(col("perplexity"), col("doc_id")).limit(n / 2)
        .collect().map(_.getLong(0)).toSet
    }
    val bi = kept("txt_perplexity")
    val tri = kept("txt_perplexity3")
    val jac = (bi & tri).size.toDouble / (bi | tri).size
    println(f"[ppxprobe] dir=$dir n_kept=${bi.size} overlap=${(bi & tri).size} jaccard=$jac%.3f")
    spark.stop()
  }
}
