package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Text-format ingestion for raw landing zones — the formats a user
  * switching from the reference still has to land (exports, event
  * dumps, API pulls) before anything becomes parquet. Two rules, both
  * scale-driven:
  *
  *  - **Schemas are DECLARED, never inferred.** Inference is a full
  *    extra pass over the input (at 100 TB, a second 100 TB read
  *    before the first useful one) and its verdict can drift between
  *    loads (one day's file with an all-null column flips a type and
  *    breaks every downstream cast). Callers pass the StructType.
  *  - **Bad lines quarantine, they don't kill.** PERMISSIVE mode with
  *    an explicit corrupt-record column: a single mangled row in
  *    terabytes of input lands in `_corrupt` for inspection while the
  *    other billions of rows load; [[quarantine]] splits the two.
  *
  * Timestamps round-trip at MICROSECOND precision (the store's
  * resolution) via an explicit 6-digit-fraction format with offset —
  * the default format truncates to millis and would silently corrupt
  * event times on a write+read cycle.
  */
object Ingest {

  /** Micro-precision, offset-explicit — identical semantics in any
    * session timezone on both the write and read side. */
  val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  val CorruptCol = "_corrupt"

  private def withCorrupt(schema: StructType): StructType =
    StructType(schema.fields :+ StructField(CorruptCol, StringType, nullable = true))

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.option("header", "true").option("timestampFormat", TsFormat).csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", "true")
      .option("timestampFormat", TsFormat)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** JSON Lines — one object per line, splittable, the streaming-safe
    * text format (a pretty-printed multi-line array is neither). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.option("timestampFormat", TsFormat).json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("timestampFormat", TsFormat)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** ORC — the columnar landing format Hive/Trino shops export.
    * Self-describing like parquet (schema + stats travel in the file
    * footer, so there is no corrupt-record lane: a torn file fails the
    * task, not a row) and splittable by stripe. The reader still takes
    * the DECLARED schema — a drifted upstream export fails loudly at
    * analysis time instead of flipping a type mid-load — and ORC
    * timestamps carry nanosecond precision natively, so micro-precision
    * event times round-trip without the text formats' explicit
    * 6-digit-fraction format.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** (clean rows without the corrupt column, quarantined raw lines).
    *
    * The parsed frame is pinned first: Spark refuses a projection that
    * reads ONLY the corrupt column straight off raw text files
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — parsing
    * is lazy and a corrupt-only scan would re-parse with a different
    * column set), and its documented contract is to materialize the
    * parse once and split from that. MEMORY_AND_DISK, so a 100 TB load
    * spills rather than re-parses; callers that consume both sides
    * should unpersist the GOOD side's source when done.
    */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val pinned = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (pinned.filter(col(CorruptCol).isNull).drop(CorruptCol),
      pinned.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw")))
  }
}
