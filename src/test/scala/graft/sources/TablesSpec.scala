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

  test("a third parquet generation fails loudly at the read boundary") {
    val dir = tmpDir("ev-bad")
    spark.sql("SELECT 1L AS event_id, 'not-a-time' AS ts, 7L AS user_id, " +
        "'click' AS event_type, 1.5 AS value, '{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] { Tables.events(spark, dir) }
    assert(e.getMessage.contains("unsupported type"))
    assert(e.getMessage.contains("StringType"), "error must name the resolved type")
  }

  test("concurrent Tables reads don't leak the scoped reader flags") {
    // events() mutates session confs (nanosAsLong / inferTimestampNTZ /
    // session TZ) under Tables' lock; 16 threads hammering events + a
    // plain table concurrently must all resolve identical schemas — a
    // leak would flip orders.o_orderdate to NTZ or shift events.ts.
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(16)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val dir = "/root/testdata/sf0.001"
      // steady-state baseline from sequential reads: events.ts is always
      // normalized to TimestampType; o_orderdate keeps whatever the default
      // conf infers for the driver's µs-naive parquet (NTZ on Spark 4).
      // The leak this pins: during events()'s inferTimestampNTZ=false
      // window, an unsynchronized concurrent orders read would resolve
      // o_orderdate as TimestampType instead — i.e. a NON-singleton type
      // set per table.
      val ordersBase = Tables.table(spark, dir, "orders").schema("o_orderdate").dataType.toString
      val futs = (1 to 32).map { i =>
        Future {
          if (i % 2 == 0) ("events", Tables.events(spark, dir).schema("ts").dataType.toString)
          else ("orders", Tables.table(spark, dir, "orders").schema("o_orderdate").dataType.toString)
        }
      }
      val byTable = Await.result(Future.sequence(futs), 120.seconds)
        .groupMap(_._1)(_._2).view.mapValues(_.toSet).toMap
      assert(byTable("events") == Set("TimestampType"),
        s"events.ts drifted under concurrency: ${byTable("events")}")
      assert(byTable("orders") == Set(ordersBase),
        s"o_orderdate drifted under concurrency: ${byTable("orders")} vs baseline $ordersBase")
    } finally pool.shutdown()
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
