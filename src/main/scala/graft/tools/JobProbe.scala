package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-level profile of one named driver query: runs it cold + warm with
  * Bench's exact methodology (clearCache + unpersist between runs, the
  * bit_xor(xxhash64) materializer) and prints, for the WARM run, every
  * Spark job with its wall time, call site, and the driver-side gap
  * since the previous job ended — the gap is where planning, footer
  * reads, log replay and file renames live, invisible to stage metrics.
  *
  *   runMain graft.tools.JobProbe <queryName> [sfDir]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    final case class J(id: Int, t0: Long, var t1: Long, site: String, desc: String)
    val jobs = new scala.collection.mutable.ArrayBuffer[J]()
    var capture = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (capture) synchronized {
        val site = Option(e.properties.getProperty("callSite.short"))
          // callSite is absent on many internally-submitted jobs; the
          // final stage's name carries the operator (e.g. "parquet at",
          // "collect at", "$anonfun$...") — far more useful than "?"
          .orElse(e.stageInfos.lastOption.map(_.name))
          .getOrElse("?")
        val desc = Option(e.properties.getProperty("spark.job.description")).getOrElse("")
        jobs += J(e.jobId, System.nanoTime(), -1L, site, desc)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
        jobs.find(_.id == e.jobId).foreach(_.t1 = System.nanoTime())
      }
    })

    def once(): Double = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      val df = graft.queries.QueryLib.queries(name)(spark, sfDir)
      try df.agg(org.apache.spark.sql.functions.expr("bit_xor(xxhash64(struct(*)))")).collect()
      catch { case _: org.apache.spark.sql.AnalysisException => df.count() }
      (System.nanoTime() - t0) / 1e9
    }

    val cold = once()
    val w1 = once() // first warm, uncaptured
    jobs.clear()
    capture = true
    val t0 = System.nanoTime()
    val warm = once()
    capture = false
    // listener bus is async; give it a beat to drain
    Thread.sleep(500)
    println(f"[jobprobe] $name cold=$cold%.2fs warm1=$w1%.2fs warm2(captured)=$warm%.2fs jobs=${jobs.size}")
    var prevEnd = t0
    val sorted = jobs.sortBy(_.t0)
    sorted.foreach { j =>
      val gap = (j.t0 - prevEnd) / 1e9
      val dur = if (j.t1 > 0) (j.t1 - j.t0) / 1e9 else -1.0
      val d = if (j.desc.nonEmpty && j.desc != j.site) s" :: ${j.desc.take(60)}" else ""
      println(f"[jobprobe]   gap=$gap%7.3fs  job=${j.id}%4d dur=$dur%7.3fs  ${j.site.take(70)}$d")
      if (j.t1 > prevEnd) prevEnd = j.t1
    }
    println(f"[jobprobe] tail gap=${(t0 + (warm * 1e9).toLong - prevEnd) / 1e9}%.3fs (after last job end)")
    val jobSum = sorted.collect { case j if j.t1 > 0 => (j.t1 - j.t0) / 1e9 }.sum
    println(f"[jobprobe] sum(job dur)=$jobSum%.3fs of $warm%.3fs wall — rest is driver-side")
    spark.stop()
  }
}
