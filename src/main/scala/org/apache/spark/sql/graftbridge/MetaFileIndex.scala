package org.apache.spark.sql.graftbridge

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** A [[FileIndex]] materialized from TABLE-LOG METADATA instead of a
  * filesystem listing — the Delta/TahoeFileIndex idea for this repo's
  * txlog tables: the transaction log already knows every live file's
  * path, size and hive-partition value, so handing Spark a pre-built
  * index removes the per-read listing pass entirely (locally a
  * "Listing leaf files and directories for N paths" job per open; on an
  * object store a LIST round-trip storm that grows with file count —
  * exactly the cost table formats exist to avoid, guide §6).
  *
  * Partition pruning contract: `FileSourceStrategy` REMOVES
  * partition-column predicates from the post-scan filters on the
  * assumption the index applies them, so [[listFiles]] must honor
  * `partitionFilters` — they are bound to [[partitionSchema]] ordinals
  * and evaluated per directory, the same contract
  * `PartitioningAwareFileIndex` implements.
  */
final class MetaFileIndex(
    files: Seq[(Path, Long, Any)], // (absolute path, byte size, partition value)
    override val partitionSchema: StructType) extends FileIndex {
  require(partitionSchema.fields.length == 1, "MetaFileIndex carries one partition column")

  private def internalValue(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case other     => other // Int year partitions &c. — already internal-form
  }

  private val dirs: Seq[PartitionDirectory] =
    files.groupBy(_._3).toSeq.sortBy(_._1.toString).map { case (pv, fsOfP) =>
      PartitionDirectory(
        InternalRow(internalValue(pv)),
        fsOfP.map { case (p, len, _) =>
          // mtime 0: nothing downstream of a parquet split reads it
          // (it exists for listing caches this index replaces)
          new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, p)
        }.toArray)
    }

  override def rootPaths: Seq[Path] = files.map(_._1.getParent).distinct

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    if (partitionFilters.isEmpty) dirs
    else {
      val bound = partitionFilters.reduce(And).transform {
        case a: Attribute =>
          BoundReference(partitionSchema.fieldIndex(a.name), a.dataType, nullable = true)
      }
      // interpreted, not codegen: a read prunes a handful of partition
      // values — compiling a predicate class would cost more than it saves
      val pred = Predicate.createInterpreted(bound)
      pred.initialize(0)
      dirs.filter(d => pred.eval(d.values))
    }

  override def inputFiles: Array[String] = files.map(_._1.toString).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = files.map(_._2).sum
}

object MetaFileIndex {

  /** Open `files` as one parquet relation with `dataSchema` (the files'
    * physical schema — no footer inference) and the single-column
    * `partitionSchema` whose values come from the log, not from
    * directory-name parsing. Zero filesystem calls on the driver; scan
    * tasks open exactly the named files.
    */
  def read(
      spark: SparkSession,
      files: Seq[(Path, Long, Any)],
      partitionSchema: StructType,
      dataSchema: StructType,
      options: Map[String, String]): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val relation = HadoopFsRelation(
      new MetaFileIndex(files, partitionSchema),
      partitionSchema = partitionSchema,
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = options)(cs)
    org.apache.spark.sql.classic.Dataset.ofRows(cs, LogicalRelation(relation))
  }
}
