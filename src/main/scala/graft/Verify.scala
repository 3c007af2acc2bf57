package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: substring filter for fast single-query local
    // iteration. check.py only compares the dumps that exist, so a
    // filtered run is a valid partial gate; the DRIVER never passes a
    // filter, so its gate always covers every query.
    val nameFilter: String => Boolean =
      if (args.length > 2) _.contains(args(2)) else _ => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // INT64 micros so DuckDB/pyarrow read the dumps losslessly
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.TimestampType
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.filter(kv => nameFilter(kv._1)).foreach { case (name, fn) =>
      // DuckDB reads Spark's instant-semantics timestamps (parquet
      // isAdjustedToUTC=true) as TIMESTAMPTZ while the oracle SQL yields
      // naive TIMESTAMP → schema/hash mismatch. Session TZ is UTC, so
      // casting to timestamp_ntz preserves values and fixes the annotation.
      try {
        val df = fn(spark, sfDir)
        val naive = df.select(df.schema.fields.map { f =>
          if (f.dataType == TimestampType)
            col(f.name).cast("timestamp_ntz").as(f.name)
          else col(f.name)
        }.toIndexedSeq: _*)
        naive.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures(name) = s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(500)}"
        // a reused outDir may hold this query's dump from a PREVIOUS run
        // (overwrite only happens on success) — delete it so a failed
        // query leaves nothing stale for check.py to compare against.
        try {
          val stale = java.nio.file.Paths.get(s"$outDir/$name")
          if (Files.exists(stale)) {
            import scala.jdk.CollectionConverters._
            Files.walk(stale).iterator().asScala.toSeq.reverse.foreach(Files.delete)
          }
        } catch { case _: Throwable => }
      }
      // pinned LSH sketch frames (QueryLib.mat) are per-query working
      // sets; without this they accumulate across all queries and the
      // dump's memory footprint grows with the inventory instead of the
      // largest single query. localCheckpoint blocks (Pack, the
      // contraction) live outside the CacheManager — drop those too.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Round-12 lesson: a query that throws here used to vanish from the
    // correctness file entirely (31 gates silently dropped). Record every
    // failure explicitly alongside the dumps AND fail the run, so coverage
    // shrinkage is loud instead of invisible.
    val errJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"), errJson)
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(s"[verify] ${failures.size} queries FAILED: ${failures.keys.mkString(",")}")
      sys.exit(1)
    }
  }
}
