package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver's testdata tables. One quirk: `events.ts` is
  * parquet TIMESTAMP(NANOS), which Spark's vectorized reader rejects
  * ([PARQUET_TYPE_ILLEGAL]). We read nanos as raw longs
  * (`spark.sql.legacy.parquet.nanosAsLong`) and `div 1000` to
  * microseconds — integral division truncating toward zero, the same
  * rule DuckDB applies converting ns→µs, so oracle comparisons agree
  * to the microsecond (for the post-epoch harness data the toward-zero
  * vs floor distinction never arises; pre-1970 nanos would differ by
  * 1µs on sub-µs remainders in BOTH engines identically).
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else
      spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    // scope the legacy flag to THIS read: left set session-wide, every
    // later nanos-parquet read would silently return LongType where it
    // previously failed loudly. Schema resolution happens eagerly at
    // spark.read.parquet, and the resolved relation carries its own
    // conf snapshot, so restoring immediately after is safe.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
