package graft.tools
import org.apache.spark.sql.SparkSession
/** Time one named driver query standalone: runMain graft.tools.TimeQuery <name> [sfDir] */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup
    // cold + 3 warm with min-of-warm, mirroring Bench's methodology
    val ts = (1 to 4).map { i =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      val df = graft.queries.QueryLib.queries(name)(spark, sfDir)
      df.agg(org.apache.spark.sql.functions.expr("bit_xor(xxhash64(struct(*)))")).collect()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[time] $name run$i: $s%.2fs")
      s
    }
    println(f"[time] $name warm-min: ${ts.tail.min}%.2fs")
    spark.stop()
  }
}
