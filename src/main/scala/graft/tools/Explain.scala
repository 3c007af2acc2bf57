package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspection + single-query timing:
  * `runMain graft.tools.Explain <queryName> [sfDir] [--plan]`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1 && !args(1).startsWith("--")) args(1)
              else "/root/testdata/sf0.1"
    val showPlan = args.contains("--plan")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    if (showPlan) df.explain("formatted")
    // warm run then timed run, like the driver's steady state
    df.count()
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"[explain] $name rows=$n warm=${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
