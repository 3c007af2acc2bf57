package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan/latency probe for individual driver queries: times the full
  * materialization (same bit_xor(xxhash64) sink as Bench) and reports
  * how many parquet scans and cache reads the FORMATTED plan contains —
  * the direct evidence for whether a shared sketch/fingerprint frame is
  * built once or replayed per branch.
  * `runMain graft.tools.PlanProbe <sfDir> <query> [query...]`
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Seq("dedup_winnow", "dedup_simhash")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      spark.catalog.clearCache()
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.agg(org.apache.spark.sql.functions.expr("bit_xor(xxhash64(struct(*)))")).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString
      val scans = "Scan parquet".r.findAllIn(plan).size
      val cacheReads = "InMemoryTableScan".r.findAllIn(plan).size
      val reused = "ReusedExchange".r.findAllIn(plan).size
      println(f"[probe] $name: $sec%.2fs scans=$scans cacheReads=$cacheReads reusedExchange=$reused")
      if (sys.env.contains("PROBE_WINDOWS"))
        plan.linesIterator.filter(_.contains("Window")).foreach(l => println("[probe-w] " + l.trim.take(200)))
    }
    spark.stop()
  }
}
