package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PathProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("pathprobe").toString
    Seq(1).toDF("v").coalesce(1).write.parquet(s"$root/plain")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/a b"))
    val listing = java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/plain"))
    import scala.jdk.CollectionConverters._
    val part = try listing.iterator().asScala.map(_.toString)
      .find(p => p.endsWith(".parquet") && p.contains("part-")).get finally listing.close()
    java.nio.file.Files.copy(java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(s"$root/a b/x.parquet"))
    val hc = spark.sessionState.newHadoopConf()
    for (p <- Seq(part, s"$root/a b/x.parquet")) {
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(hc)
      val q = fs.makeQualified(hp)
      val meta = spark.read.parquet(p).select(col("_metadata.file_path")).head().getString(0)
      println(s"[pathprobe] raw=$p")
      println(s"[pathprobe]   qualified.toString = ${q.toString}")
      println(s"[pathprobe]   qualified.toUri    = ${q.toUri.toString}")
      println(s"[pathprobe]   _metadata.file_path= $meta")
    }
    spark.stop()
  }
}
