package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Pins the contract that took down 31 gates in round 12: whatever parquet
  * generation the harness ships for `events.ts` (int64 NANOS read as long,
  * or MICROS annotated NTZ or UTC), `Tables.events` must resolve it to
  * instant-semantics TimestampType microseconds with unshifted values.
  */
class TablesSpec extends SparkSpec {

  test("events.ts resolves to TimestampType on the live harness data") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType == TimestampType)
    // values are sane instants, not epoch-garbage from a misread annotation
    val r = df.agg(min("ts").cast("long"), max("ts").cast("long")).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    assert(lo >= 946684800L && hi < 4102444800L, // 2000-01-01 .. 2100-01-01
      s"ts range [$lo, $hi] epoch-seconds looks shifted or misscaled")
  }

  test("events reader accepts a micros/NTZ generation without shifting values") {
    // write a µs-NTZ file the way the round-12 regeneration did
    val dir = tmpDir("ev-us")
    val t = java.time.LocalDateTime.of(2024, 3, 1, 12, 30, 15, 123456000)
    spark.sql(s"SELECT 1L AS event_id, TIMESTAMP_NTZ '$t' AS ts, " +
        "7L AS user_id, 'click' AS event_type, 1.5 AS value, '{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    // UTC session: the stored micros must surface as the same wall instant
    assert(df.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .head().getString(0) == "2024-03-01 12:30:15.123456")
  }

  test("events reader still accepts the legacy int64-nanos generation") {
    // nanos can't be written via Spark; emulate by what nanosAsLong yields:
    // a raw long column named ts. The reader must div to µs and type it.
    val dir = tmpDir("ev-ns")
    val nanos = 1709296215123456789L // 2024-03-01T12:30:15.123456789Z
    spark.sql(s"SELECT 1L AS event_id, ${nanos}L AS ts, 7L AS user_id, " +
        "'click' AS event_type, 1.5 AS value, '{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros(col("ts"))).head().getLong(0) == nanos / 1000)
  }

  test("reader flags are restored after the scoped read") {
    // getOption surfaces registered defaults, so compare before/after
    // values rather than expecting emptiness
    val keys = Seq("spark.sql.legacy.parquet.nanosAsLong",
                   "spark.sql.parquet.inferTimestampNTZ.enabled",
                   "spark.sql.session.timeZone")
    val before = keys.map(k => k -> spark.conf.getOption(k))
    Tables.events(spark, "/root/testdata/sf0.001")
    val after = keys.map(k => k -> spark.conf.getOption(k))
    assert(after == before)
  }
}
