package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.TimeseriesStore

class DerivePartitionFiltersSpec extends SparkSpec {
  import spark.implicits._

  private def writeFeature(): String = {
    val dir = tmpDir("graft-dpf")
    val st = new TimeseriesStore(spark, dir)
    st.save("f", (0 until 60).map { i =>
      (new java.sql.Timestamp(ts("2021-01-01").getTime + i * 86400000L),
        new java.sql.Timestamp(ts("2021-01-01").getTime), i.toDouble)
    }.toDF("time", "created_time", "value"))
    s"$dir/feature/f"
  }

  test("ad-hoc time filters gain partition pruning; results unchanged") {
    val path = writeFeature()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DerivePartitionFilters
    try {
      val q = spark.read.parquet(path)
        .filter(col("time") >= lit("2021-02-10 00:00:00").cast("timestamp") &&
          col("time") < lit("2021-02-15 00:00:00").cast("timestamp"))
      val plan = q.queryExecution.executedPlan.toString
      // the derived predicate must land in the scan's PartitionFilters
      val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
      assert(pf.contains(">= 2021-02-09") && pf.contains("<= 2021-02-16"), s"got: $pf")
      assert(q.count() == 5)
      // actual directory pruning: scanned partitions < total partitions
      val scan = q.queryExecution.executedPlan.collectLeaves().head
        .asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
      assert(scan.selectedPartitions.partitionCount <= 8) // 5 days + 2 widening < 60
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DerivePartitionFilters)
    }
  }

  test("year-style integer partitions derive widened year bounds") {
    val dir = tmpDir("graft-dpf-y")
    val st = new TimeseriesStore(spark, dir)
    st.save("f", (0 until 8).map { i =>
      (new java.sql.Timestamp(ts("2015-06-01").getTime + i * 365L * 86400000L),
        new java.sql.Timestamp(0L), i.toDouble)
    }.toDF("time", "created_time", "value"), partitionStyle = "year")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DerivePartitionFilters
    try {
      val q = spark.read.parquet(s"$dir/feature/f")
        .filter(col("time") >= lit("2019-01-01 00:00:00").cast("timestamp"))
      val pf = q.queryExecution.executedPlan.toString
        .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
      assert(pf.contains(">= 2018"), s"got: $pf")
      assert(q.count() == 4) // 2019..2022 midyears
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DerivePartitionFilters)
    }
  }

  test("rule leaves filters that already mention partition untouched") {
    val path = writeFeature()
    val df = spark.read.parquet(path)
      .filter(col("partition") === "2021-01-05" && col("time").isNotNull)
    val optimized = DerivePartitionFilters(df.queryExecution.analyzed)
    assert(optimized == df.queryExecution.analyzed)
  }
}
