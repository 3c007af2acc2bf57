package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan, Project, Range, SubqueryAlias, Union}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.{FilePartition, HadoopFsRelation, LogicalRelation}

/** Estimate a DataFrame's SCAN partition count from its analyzed plan,
  * without converting it to an RDD. `df.rdd.getNumPartitions` — the
  * probe r19's `spread`/`compactUnion` guards used — forces a full
  * physical-planning pass whose result is then thrown away; on the very
  * wide-align shapes those guards protect, that doubles the union
  * subtree's planning cost (ADVICE r19). The estimate walks only
  * NARROW nodes (union/project/filter/alias) over recognizable leaves;
  * anything that could introduce an exchange (join, aggregate, window,
  * repartition, ...) returns None and the caller falls back to the
  * exact planned-RDD probe.
  *
  * File-scan estimate: ceil(total adjusted bytes / maxSplitBytes) — the
  * greedy-packing lower bound with Spark's exact split-size formula.
  * The guards this feeds have generous margins (&lt; cores, &gt; 4x
  * cores), so the bound's ≤2x error only moves borderline cases, where
  * either choice is benign.
  */
object PartitionEstimate {

  def leafScanPartitions(df: DataFrame): Option[Long] = {
    val spark = df.queryExecution.sparkSession
    def est(p: LogicalPlan): Option[Long] = p match {
      case u: Union =>
        u.children.foldLeft(Option(0L)) { (acc, c) =>
          for (a <- acc; e <- est(c)) yield a + e
        }
      case pr: Project       => est(pr.child)
      case f: Filter         => est(f.child)
      case s: SubqueryAlias  => est(s.child)
      case r: Range =>
        Some(r.numSlices.getOrElse(spark.sparkContext.defaultParallelism).toLong)
      case l: LogicalRDD => Some(l.rdd.getNumPartitions.toLong)
      case l: LocalRelation =>
        // LocalTableScanExec parallelism: min(rows, defaultParallelism), >= 1
        Some(math.max(1L,
          math.min(l.data.length.toLong, spark.sparkContext.defaultParallelism.toLong)))
      case lr: LogicalRelation =>
        lr.relation match {
          case fsr: HadoopFsRelation =>
            // the listing is the same (cached) one physical planning uses
            val openCost = spark.sessionState.conf.filesOpenCostInBytes
            val sizes = fsr.location.listFiles(Nil, Nil).flatMap(_.files.map(_.getLen))
            val total = sizes.map(_ + openCost).sum
            val maxSplit = FilePartition.maxSplitBytes(spark, total)
            Some(math.max(1L, (total + maxSplit - 1) / maxSplit))
          case _ => None
        }
      case _ => None
    }
    est(df.queryExecution.analyzed)
  }
}
