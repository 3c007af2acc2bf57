package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.FeatureStore
import graft.queries.QueryLib

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * End-to-end feature-store slice (SURVEY §7.3): create catalog +
    * namespace + feature, save the `purchase` event series through the
    * normalizing writer (hive-partitioned parquet), then load it back
    * resampled to a daily grid with forward fill — exercising scan,
    * partition pruning, dedup-latest, spine join and ffill in one plan.
    */
  def entry(spark: SparkSession): DataFrame = {
    val tmp = QueryLib.scratchDir("entry") // fixed slot: reruns reuse, never leak
    val fs = new FeatureStore(spark, s"$tmp/catalog.json")
    fs.createNamespace("demo", s"$tmp/warehouse")
    fs.createFeature("demo/purchase_value")
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    fs.saveDataFrame(
      events.filter(col("event_type") === "purchase")
        .select(col("ts").as("time"), col("value")),
      name = Some("demo/purchase_value"))
    fs.loadDataFrame(
      Seq("demo/purchase_value"),
      fromDate = Some(Timestamp.from(Instant.parse("2024-01-01T00:00:00Z"))),
      toDate = Some(Timestamp.from(Instant.parse("2024-01-30T00:00:00Z"))),
      freq = Some("1d"))
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = QueryLib.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = QueryLib.oracleSql
}
