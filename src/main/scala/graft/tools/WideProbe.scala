package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.TimeseriesOps

/** Phase-level profile of the alignJoinWide wall (r19 verdict item 1).
  * Splits the wall into: input build, spine, per-block plan construction
  * (the alignJoin call), per-block localCheckpoint (analysis +
  * optimization + physical planning + execute()-RDD creation), and the
  * final join assembly + count. A SparkListener sums job wall-time so
  * driver-side gaps (wall - jobs) are visible per phase.
  *
  * runMain graft.tools.WideProbe [nSeries] [nTs] [blockSize]
  */
object WideProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 3072
    val nTs = if (args.length > 1) args(1).toInt else 100
    val blockSize = if (args.length > 2) args(2).toInt else 1024
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobNanos = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.remove(j.jobId)
        if (s != null) jobNanos += System.nanoTime() - s
      }
    })
    def phase[A](label: String)(f: => A): A = {
      val j0 = jobNanos
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      val jobs = (jobNanos - j0) / 1e9
      println(f"[wide] $label: wall=$wall%.2fs jobs=$jobs%.2fs driver=${wall - jobs}%.2fs")
      r
    }

    val base = java.time.Instant.parse("2015-01-01T00:00:00Z").toEpochMilli
    val series = phase(s"build $k series x $nTs ts") {
      (0 until k).map { i =>
        spark.range(0, nTs, 1, 1).select(
          timestamp_millis(lit(base) + col("id") * 3600000L).as("time"),
          (col("id") + lit(i)).cast("double").as(s"f$i"))
      }
    }
    val total0 = System.nanoTime()
    // mirror alignJoinWide's phases so each is separately attributable
    val spine = phase("spine (union+distinct+eager localCheckpoint)") {
      TimeseriesOps.wideSpine(series)
    }
    val blocks = series.grouped(blockSize).toSeq.zipWithIndex.map { case (block, bi) =>
      val planned = phase(s"block $bi alignJoin() plan build") {
        TimeseriesOps.wideBlock(block, spine)
      }
      phase(s"block $bi localCheckpoint(lazy)") { planned.localCheckpoint(false) }
    }
    val out = phase("final join assembly (plan only)") {
      blocks.reduce((a, b) => a.join(b, Seq("time"))).orderBy(col("time"))
    }
    phase("final count (materializes checkpoints + join)") {
      val rows = out.count()
      require(rows == nTs.toLong, s"expected $nTs rows, got $rows")
    }
    println(f"[wide] TOTAL: ${(System.nanoTime() - total0) / 1e9}%.2fs ($k series, blockSize $blockSize)")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    spark.stop()
  }
}
