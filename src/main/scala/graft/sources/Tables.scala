package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver's testdata tables. One quirk: `events.ts` is
  * parquet TIMESTAMP(NANOS), which Spark's vectorized reader rejects
  * ([PARQUET_TYPE_ILLEGAL]). We read nanos as raw longs
  * (`spark.sql.legacy.parquet.nanosAsLong`) and floor-divide to
  * microseconds — exactly DuckDB's ns→µs truncation, so oracle
  * comparisons agree to the microsecond.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else
      spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
