package graft.store

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.TimeseriesOps._

/** Metadata-only table statistics ([[TimeseriesStore.tableStatsFast]]):
  * exact stored-row count, event-time bounds in epoch micros, and —
  * for numeric tables whose every live file carries them — value
  * bounds. */
final case class TableStats(
    rows: Long,
    tminMicros: Option[Long],
    tmaxMicros: Option[Long],
    vmin: Option[Double] = None,
    vmax: Option[Double] = None)

/** Physical storage of one namespace: each feature is a hive-partitioned
  * snappy-parquet directory `<url>/feature/<name>/partition=<p>/...`,
  * mirroring the reference layout (`/root/reference/bytehub/_storage/
  * dask.py:62-83`). All IO through the Hadoop FileSystem API so any
  * `fs.defaultFS`-reachable store works (local, HDFS, S3A, ...).
  *
  * Scale notes: reads carry BOTH the `time` range predicate (parquet
  * row-group pushdown) and the derived `partition` predicate (directory
  * pruning) — the derived-predicate rewrite the reference hand-rolls at
  * dask.py:89-106. Writes append hive partitions so a 100 TB feature is
  * split across ~days × files and a bounded load touches only its range.
  *
  * Backends: `"spark"` (default) is the plain hive-layout store above.
  * `"txlog"` layers a per-feature transaction log ([[TxLog]], the
  * Delta-protocol idea) over the SAME file layout: appends and
  * compactions become atomic commits, readers replay the log to a
  * consistent file set (never a half-applied compaction), old versions
  * stay readable until `vacuum`, and partition pruning happens against
  * log metadata instead of directory listings (one small-file read vs
  * an object-store LIST per load). A log-backed feature directory must
  * be read THROUGH the store — raw `spark.read.parquet` on it would
  * see compacted-away duplicates that the log has retired.
  */
class TimeseriesStore(
    spark: SparkSession,
    url: String,
    storageOptions: Map[String, String] = Map.empty,
    backend: String = "spark") {

  private val logBacked = backend == "txlog"

  /** Per-namespace Hadoop configuration: the namespace's storage
    * options laid over the session conf. The reference threads
    * `storage_options` into fsspec per namespace (`/root/reference/
    * bytehub/_model.py:102-112`); here they become Hadoop conf keys
    * (e.g. `fs.s3a.access.key`) scoped to THIS store only — two
    * namespaces on different buckets with different credentials
    * coexist in one session. DataFrame reads/writes get the same
    * options via `.options(...)`, which Spark folds into the
    * relation-scoped Hadoop conf.
    */
  private[graft] val hadoopConf: org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(spark.sparkContext.hadoopConfiguration)
    storageOptions.foreach { case (k, v) => c.set(k, v) }
    c
  }

  private def featurePath(name: String): String = s"$url/feature/$name"

  /** FileSystem handles honoring `storageOptions`. With no per-store
    * options the process-wide Hadoop cache is correct and cheapest.
    * With options it is a TRAP: `FileSystem.get` caches by (scheme,
    * authority, user) and IGNORES the Configuration — whoever touches
    * the bucket first wins, so this store's credentials would either
    * be silently dropped (a cached credential-less instance) or leak
    * to every other user of the bucket. Options-bearing stores
    * therefore hold one PRIVATE instance per (scheme, authority),
    * created with `newInstance` (cache-bypassing), living for the
    * store's lifetime.
    */
  private val fsInstances =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.hadoop.fs.FileSystem]

  private def fs(p: String): org.apache.hadoop.fs.FileSystem = {
    val path = new Path(p)
    if (storageOptions.isEmpty) path.getFileSystem(hadoopConf)
    else {
      val uri = path.toUri
      val key = s"${uri.getScheme}://${Option(uri.getAuthority).getOrElse("")}"
      fsInstances.getOrElseUpdate(key,
        org.apache.hadoop.fs.FileSystem.newInstance(uri, hadoopConf))
    }
  }

  /** Release the options-scoped FileSystem instances this store owns.
    * No-op for option-less stores — their handles come from the shared
    * process cache, which must never be closed from here. Call when
    * the store is replaced (e.g. after a credential rotation).
    */
  def close(): Unit = {
    fsInstances.values.foreach(f =>
      try f.close() catch { case _: java.io.IOException => () })
    fsInstances.clear()
  }

  def exists(name: String): Boolean = {
    val p = featurePath(name)
    fs(p).exists(new Path(p))
  }

  /** Empty-feature fallback schema (dask.py:110-115 semantics). */
  def emptySchema(valueType: DataType): StructType = StructType(Seq(
    StructField(TimeCol, TimestampType),
    StructField(CreatedCol, TimestampType),
    StructField(ValueCol, valueType)))

  /** The documented empty-feature contract: a 0-row 3-column envelope. */
  private def emptyFrame(valueType: DataType): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], emptySchema(valueType))

  /** Plain-backend parquet open honoring the empty contract: a feature
    * directory can exist with no data files (a crashed first append's
    * `_temporary`, an external mkdir) — schema inference then throws
    * where the documented behavior is the empty envelope.
    */
  private def parquetOrEmpty(name: String, valueType: DataType): DataFrame =
    try spark.read.options(storageOptions).parquet(featurePath(name))
    catch {
      case e: org.apache.spark.sql.AnalysisException
        if Option(e.getCondition).exists(_.startsWith("UNABLE_TO_INFER_SCHEMA")) =>
        emptyFrame(valueType)
    }

  /** S3 (save validation + normalization, dask.py:223-263):
    *  - `time` and `value` columns required, nothing else but
    *    `created_time` allowed;
    *  - timestamps cast; `created_time` defaults to now();
    *  - `partition` derived from `time` ("date" → yyyy-MM-dd string,
    *    "year" → int year).
    */
  def normalizeForSave(df: DataFrame, partitionStyle: String): DataFrame =
    TimeseriesStore.normalize(df, partitionStyle)

  private def txLog(name: String): TxLog =
    new TxLog(hadoopConf, featurePath(name), Some(fs(featurePath(name))))

  // ---- schema evolution (txlog backend) -------------------------------
  //
  // The table's logical schema (time, created_time, value[, extras...])
  // is DECLARED in the log — first write records the batch's schema as
  // epoch 0, evolveSchema appends widened/extended epochs — and every
  // add carries the epoch it was written under. Reads open each epoch's
  // file group with its own physical schema and align to the epoch in
  // effect at the requested version (widening casts, nulls for
  // later-added columns): old snapshots read the old schema, and the
  // parquet reader is never asked for a widening it cannot do (probe:
  // int32→long reads natively, int64→double does not).

  private def schemaOf(json: String): StructType =
    DataType.fromJson(json).asInstanceOf[StructType]

  /** Logical table schema of a staged frame: everything but the derived
    * partition column, field order preserved. */
  private def structJson(normalized: DataFrame): String =
    StructType(normalized.schema.fields.filterNot(_.name == "partition").toIndexedSeq).json

  /** The allowed type-widening lattice (the Delta type-widening set
    * restricted to what the feature pipeline uses): a value written at
    * the narrow type reads back EXACTLY under the wide one. */
  private def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (ByteType, ShortType | IntegerType | LongType | DoubleType) => true
    case (ShortType, IntegerType | LongType | DoubleType)            => true
    case (IntegerType, LongType | DoubleType)                        => true
    case (LongType, DoubleType)                                      => true
    case (FloatType, DoubleType)                                     => true
    case _                                                           => false
  }

  /** Current (or as-of) declared logical schema, if the table has one.
    * None = legacy table (pre-evolution log) — uniform files, inferred
    * schema, exactly today's read path. */
  def tableSchema(name: String, asOfVersion: Option[Long] = None): Option[StructType] = {
    require(logBacked, "tableSchema requires the txlog backend")
    if (!exists(name)) None
    else txLog(name).schemaHistory(asOfVersion).lastOption.map(schemaOf)
  }

  /** Declare a new schema epoch: existing columns may only WIDEN (the
    * lattice above), new columns append (old files read them as null),
    * drops are rejected. Returns the committed log version. On a legacy
    * table the current file schema is declared as epoch 0 first, so the
    * existing files keep a truthful physical schema to be opened with.
    * Rare admin operation — racing declarations follow the same
    * optimistic-commit discipline as racing compactions.
    */
  def evolveSchema(name: String, newSchema: StructType): Long = {
    require(logBacked, "schema evolution requires the txlog backend")
    require(exists(name), s"no such feature: $name")
    require(!newSchema.fieldNames.contains("partition"),
      "the derived partition column cannot be part of the declared schema")
    Seq(TimeCol, CreatedCol, ValueCol).foreach(c =>
      require(newSchema.fieldNames.contains(c), s"schema must keep the '$c' column"))
    val log = txLog(name)
    val current: StructType = log.schemaHistory().lastOption.map(schemaOf).getOrElse {
      // legacy: pin the files' actual schema as epoch 0 before evolving
      val inferred = StructType(
        spark.read.options(storageOptions).option("basePath", featurePath(name))
          .parquet(log.snapshot().map(a => s"${featurePath(name)}/${a.path}"): _*)
          .schema.fields.filterNot(_.name == "partition").toIndexedSeq)
      log.commit(Nil, schema = Some(inferred.json))
      inferred
    }
    current.fields.foreach { f =>
      val nf = newSchema.fields.find(_.name == f.name).getOrElse(
        throw new IllegalArgumentException(
          s"schema evolution cannot drop column '${f.name}'"))
      require(nf.dataType == f.dataType || widens(f.dataType, nf.dataType),
        s"column '${f.name}': ${f.dataType.simpleString} does not widen to ${nf.dataType.simpleString}")
    }
    log.commit(Nil, schema = Some(newSchema.json))
  }

  /** Convenience: widen just the value column's type. */
  def evolveValueType(name: String, to: DataType): Long = {
    require(logBacked, "schema evolution requires the txlog backend")
    val cur = tableSchema(name).getOrElse(emptySchema(DoubleType))
    evolveSchema(name, StructType(cur.fields.map(f =>
      if (f.name == ValueCol) f.copy(dataType = to) else f).toIndexedSeq))
  }

  /** Conform a write batch to the declared schema: widening casts only
    * (a silently narrowing write is a data-loss bug), nulls for
    * declared columns the batch omits, loud rejection of columns the
    * schema does not know. */
  private def conformForWrite(normalized: DataFrame, target: StructType): DataFrame = {
    val dfTypes = normalized.schema.fields.map(f => f.name -> f.dataType).toMap
    val unknown = dfTypes.keySet - "partition" -- target.fieldNames
    require(unknown.isEmpty,
      s"batch columns not in the table schema: ${unknown.mkString(", ")} — evolveSchema first")
    val cols = target.fields.map { f =>
      dfTypes.get(f.name) match {
        case Some(dt) if dt == f.dataType => col(f.name)
        case Some(dt) =>
          require(widens(dt, f.dataType),
            s"column '${f.name}': batch type ${dt.simpleString} does not widen to " +
              s"table type ${f.dataType.simpleString} — evolveSchema to widen the table")
          col(f.name).cast(f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }
    normalized.select((cols :+ col("partition")).toIndexedSeq: _*)
  }

  /** Declare (or replace) a named CHECK constraint on a txlog table
    * (the Delta table-constraint idea): from this commit on, every
    * save/merge batch must satisfy `boolExpr` (a SQL boolean over the
    * normalized columns) on EVERY row or the write is rejected before
    * anything becomes visible. Existing rows are validated NOW — a
    * constraint the current table already violates refuses to land,
    * exactly like ALTER TABLE ADD CONSTRAINT. Declare `"true"` to
    * effectively drop a constraint. Returns the committed version. */
  def addCheck(name: String, constraintName: String, boolExpr: String): Long = {
    require(logBacked, "CHECK constraints require the txlog backend")
    require(constraintName.nonEmpty, "constraint name must be non-empty")
    if (exists(name)) {
      val log = txLog(name)
      val live = log.snapshot()
      if (live.nonEmpty) {
        val cur = openAdds(name, live, log.schemaHistory(), partitionStyle = "date")
        val bad = cur.filter(!expr(boolExpr) || expr(boolExpr).isNull).count()
        require(bad == 0,
          s"cannot add CHECK '$constraintName' ($boolExpr): $bad existing rows violate it")
      }
    }
    txLog(name).commit(Nil, check = Some((constraintName, boolExpr)))
  }

  /** Active CHECK constraints on a txlog table, declaration-ordered. */
  def tableChecks(name: String): Seq[(String, String)] = {
    require(logBacked, "CHECK constraints require the txlog backend")
    if (!exists(name)) Seq.empty else txLog(name).checks()
  }

  /** Writer-side constraint enforcement: every active check must hold
    * on EVERY batch row (nulls count as violations, the ANSI CHECK
    * reading a data pipeline wants — a null-dodging row is a bug, not
    * a pass). One combined filter job; rejection names the first
    * violated constraint and the row count. */
  private def enforceChecks(log: TxLog, name: String, batch: DataFrame): Unit = {
    val active = log.checks().filterNot(_._2.trim.equalsIgnoreCase("true"))
    active.foreach { case (cn, ce) =>
      val bad = batch.filter(!expr(ce) || expr(ce).isNull).count()
      if (bad > 0)
        throw new IllegalArgumentException(
          s"CHECK constraint '$cn' ($ce) violated by $bad rows of the incoming batch for '$name'")
    }
  }

  /** Stage a batch under the table's CURRENT schema epoch: first write
    * declares the batch's own schema as epoch 0; later writes conform
    * to the declared epoch and their adds carry its index. Returns the
    * installed adds plus the schema to declare in the same commit.
    * Active CHECK constraints are enforced HERE — before any file is
    * staged, so a rejected batch leaves nothing to vacuum. */
  private def stageForCommit(log: TxLog, name: String, normalized: DataFrame)
      : (Seq[TxAdd], Option[String]) = {
    enforceChecks(log, name, normalized)
    log.schemaHistory() match {
      case Seq() =>
        (stageInstall(log, name, normalized).map(_.copy(sv = Some(0L))),
          Some(structJson(normalized)))
      case schemas =>
        (stageInstall(log, name, conformForWrite(normalized, schemaOf(schemas.last)))
          .map(_.copy(sv = Some(schemas.size - 1L))), None)
    }
  }

  /** Epoch of internally REWRITTEN files (compaction/optimize/delete —
    * frames already aligned to the latest declared schema). */
  private def svTag(schemas: Seq[String]): Option[Long] =
    if (schemas.isEmpty) None else Some(schemas.size - 1L)

  /** Epoch-aware open of a live-file subset: each schema epoch's file
    * group is read with the physical schema it was WRITTEN under, then
    * aligned to the newest visible epoch (widening casts; later-added
    * columns null), and the groups union. Legacy tables (no declared
    * schema) keep the inferred uniform read. Always includes the
    * `partition` column; `withFilePath` adds `_f` = the source file
    * path (resolved inside each group — `_metadata` cannot be
    * referenced across a union).
    */
  private def openAdds(
      name: String,
      adds: Seq[TxAdd],
      schemas: Seq[String],
      partitionStyle: String,
      withFilePath: Boolean = false): DataFrame = {
    val root = featurePath(name)
    def path(a: TxAdd) = s"$root/${a.path}"
    if (schemas.isEmpty) {
      val df = spark.read.options(storageOptions).option("basePath", root)
        .parquet(adds.map(path): _*)
      if (withFilePath) df.withColumn("_f", col("_metadata.file_path")) else df
    } else {
      val pType = if (partitionStyle == "year") IntegerType else StringType
      val target = schemaOf(schemas.last)
      adds.groupBy(_.sv.getOrElse(0L)).toSeq.sortBy(_._1).map { case (sv, group) =>
        val fileSchema = schemaOf(schemas(sv.toInt))
        // log-metadata scan (Delta's TahoeFileIndex shape): when every
        // add carries its byte size, the FileIndex is built straight
        // from the log — partition values from the add, no driver
        // listing pass, no "Listing leaf files" job (guide §6: manifest
        // metadata beats directory listing; this closes the half of
        // that promise the old spark.read.parquet(paths) open left on
        // the table). Pre-upgrade adds (no fsize) keep the listing read.
        val df =
          if (group.forall(_.fsize.isDefined))
            org.apache.spark.sql.graftbridge.MetaFileIndex.read(
              spark,
              group.map(a => (new Path(path(a)), a.fsize.get,
                if (pType == IntegerType) a.partition.toInt else a.partition)),
              partitionSchema = StructType(Seq(StructField("partition", pType))),
              dataSchema = fileSchema,
              options = storageOptions)
          else spark.read.options(storageOptions).option("basePath", root)
            .schema(StructType(fileSchema.fields.toIndexedSeq :+ StructField("partition", pType)))
            .parquet(group.map(path): _*)
        val aligned = target.fields.map { f =>
          if (fileSchema.fieldNames.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        } :+ col("partition")
        val base = if (withFilePath) aligned :+ col("_metadata.file_path").as("_f") else aligned
        df.select(base.toIndexedSeq: _*)
      }.reduce(_ unionByName _)
    }
  }

  /** Data columns a read should surface: the declared schema's fields,
    * or the classic 3-column envelope for legacy tables. */
  private def dataCols(schemas: Seq[String]): Seq[String] =
    schemas.lastOption.map(schemaOf(_).fieldNames.toSeq)
      .getOrElse(Seq(TimeCol, CreatedCol, ValueCol))
  // ---------------------------------------------------------------------

  /** Write-side layout: one ranged exchange so each task owns a
    * contiguous (partition, time) slice. Without it every shuffle task
    * writes a file into EVERY hive partition it touches — up to
    * parallelism × #partitions small files per append, the
    * object-store small-files disease that turns reads into LIST/open
    * storms. Ranged, an append caps at ~(parallelism + #partitions)
    * files, big loads keep full write parallelism (a hot partition
    * spans several contiguous slices), and each parquet file covers a
    * tight time range so row-group min/max pruning bites on read.
    */
  private def layoutForWrite(normalized: DataFrame, outPartitions: Option[Int] = None): DataFrame =
    outPartitions match {
      case Some(n) => normalized.repartitionByRange(n, col("partition"), col(TimeCol))
      case None    => normalized.repartitionByRange(col("partition"), col(TimeCol))
    }

  /** Write `normalized` (with its `partition` column) as new parquet
    * files INSIDE the feature's hive layout and return the log actions
    * describing them: the batch is staged in `<url>/.stage/`, then each
    * part file is moved into its `partition=<p>/` directory under its
    * job-unique name. Files are invisible to log readers until the
    * caller commits the returned adds — the stage/install split is what
    * makes append and compaction atomic.
    */
  private def stageInstall(
      log: TxLog, // the caller's instance — its replay cache is warm;
                  // a fresh one here would cold-replay the log PER
                  // WRITE for the bloom-config lookup (measured 1.8x
                  // on the multi-commit certification lifecycles)
      name: String,
      normalized: DataFrame,
      outPartitions: Option[Int] = None,
      preLaid: Boolean = false): Seq[TxAdd] = {
    val stage = new Path(s"$url/.stage/$name/${java.util.UUID.randomUUID()}")
    // INT64 micros, not the session default INT96: INT96 carries no
    // usable footer statistics (deprecated), and the per-file time
    // bounds below are what make log-metadata FILE skipping possible.
    // Scoped set/restore so caller sessions keep their own setting.
    val tsKey = "spark.sql.parquet.outputTimestampType"
    val prevTs = spark.conf.get(tsKey)
    spark.conf.set(tsKey, "TIMESTAMP_MICROS")
    // Writer parallelism on SMALL batches (guide §2.2/§6): AQE's
    // partition coalescer targets advisoryPartitionSizeInBytes (64 MB),
    // so a micro-batch-sized append collapses the ranged exchange to ONE
    // task that then opens every hive-partition parquet writer
    // SERIALLY — ~10-15 ms/file locally, a full network round-trip per
    // file on an object store. A 16k floor makes the coalescer honor
    // parallelismFirst below the advisory target (post-shuffle target =
    // max(shuffleBytes / parallelism, 16k)), so a medium batch keeps
    // several write tasks and the per-partition writer opens run in
    // parallel; a TINY batch (≤16 KB — a few hundred rows) still
    // coalesces to one task, keeping each day's rows co-located in one
    // file instead of shattering row-per-file; LARGE batches are
    // unaffected (their bytes/parallelism exceeds the advisory cap,
    // which still bounds the target). Scoped set/restore like the
    // timestamp type above.
    val minKey = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    val prevMin = spark.conf.getOption(minKey)
    spark.conf.set(minKey, "16k")
    // preLaid: the caller already chose the row layout (a z-order
    // clustered rewrite) — re-ranging by (partition, time) here would
    // destroy exactly the multi-dimensional locality being installed
    val laid = if (preLaid) normalized else layoutForWrite(normalized, outPartitions)
    try laid.write
      .options(storageOptions).option("compression", "snappy")
      .partitionBy("partition").parquet(stage.toString)
    finally {
      spark.conf.set(tsKey, prevTs)
      prevMin match {
        case Some(v) => spark.conf.set(minKey, v)
        case None    => spark.conf.unset(minKey)
      }
    }
    // per-file bloom build BEFORE the renames (one Spark job over the
    // staged tree, page-cached bytes): rewrites (DELETE/UPDATE/merge/
    // optimize) route through here too, so blooms survive them the
    // same way the footer stats do. A build failure degrades to
    // never-skipped files, never to a failed install.
    val bloomCfg: Option[(String, Int, Int)] =
      try log.bloomConfig() catch { case _: Throwable => None }
    val blooms: Map[String, String] = bloomCfg match {
      case Some((bcol, bits, k)) if laid.columns.contains(bcol) =>
        try FileBloom.buildForStage(spark, stage.toString, bcol, bits, k)
        catch { case _: Throwable => Map.empty }
      case _ => Map.empty
    }
    val f = fs(url)
    val featureRoot = new Path(featurePath(name))
    // per-file footer read + install rename, PARALLELIZED on the bridges'
    // bounded driver pool (guide §1/§5: the sequential loop was the
    // measured driver-side gap after every staged write — ~10 ms/file of
    // footer IO plus a rename round-trip, ×(files per append) on the
    // commit path of every save/stream micro-batch; on an object store
    // each round-trip is 10-100× worse). mkdirs stays serial (one per
    // partition dir); per-thread Configuration clones as everywhere else.
    // Order, rel paths and add contents are identical to the sequential
    // loop — parMapOrderedConf preserves input order.
    val staged: Seq[(String, org.apache.hadoop.fs.FileStatus, Path)] =
      f.listStatus(stage).filter(_.isDirectory).toSeq.flatMap { pdir =>
        val pname = pdir.getPath.getName // "partition=<p>"
        val destDir = new Path(featureRoot, pname)
        if (!f.exists(destDir)) f.mkdirs(destDir)
        f.listStatus(pdir.getPath).toSeq
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          .map(st => (pname, st, new Path(destDir, st.getPath.getName)))
      }
    val adds = DeltaBridge.parMapOrderedConf(staged, hadoopConf) {
      case ((pname, st, dest), conf) =>
        val src = st.getPath
        // footer stats BEFORE the rename: the file was just written,
        // the footer is page-cached, and a stats failure degrades to
        // a never-skipped file, never to a failed install
        val fst = footerStats(src, conf)
        if (!f.rename(src, dest))
          throw new java.io.IOException(s"stage install failed: $src -> $dest")
        val rel = s"$pname/${src.getName}"
        TxAdd(rel, pname.stripPrefix("partition="),
          tmin = fst.tmin, tmax = fst.tmax, vmin = fst.vmin, vmax = fst.vmax,
          nrec = fst.nrec,
          blc = blooms.get(rel).flatMap(_ => bloomCfg.map(_._1)),
          bl = blooms.get(rel),
          fsize = Some(st.getLen))
    }
    f.delete(stage, true)
    adds
  }

  /** Per-file statistics from ONE footer read: event-time bounds
    * (epoch micros, TIMESTAMP_MICROS physical int64), exact row count,
    * and — when the value column's physical type is DOUBLE — value
    * bounds. Each dimension degrades independently: unusable time
    * stats only lose time skipping, a non-double value (serialized
    * features, pre-widening epochs) only loses value skipping, and
    * the row count needs nothing but a readable footer. A file
    * without a stat is simply never skipped on that dimension. */
  private case class FooterStats(
      tmin: Option[Long], tmax: Option[Long], nrec: Option[Long],
      vmin: Option[Double], vmax: Option[Double])

  private def footerStats(
      p: Path,
      conf: org.apache.hadoop.conf.Configuration = hadoopConf): FooterStats =
    try {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        var mn = Long.MaxValue
        var mx = Long.MinValue
        var vmn = Double.MaxValue
        var vmx = Double.MinValue
        var rows = 0L
        var tOk = true
        var vOk = true
        val blocks = r.getFooter.getBlocks
        if (blocks.isEmpty) { tOk = false; vOk = false }
        blocks.forEach { b =>
          rows += b.getRowCount
          b.getColumns.asScala.find(_.getPath.toDotString == TimeCol) match {
            case Some(c) =>
              val st = c.getStatistics
              if (st == null || st.isEmpty || !st.hasNonNullValue) tOk = false
              else (st.genericGetMin, st.genericGetMax) match {
                case (a: java.lang.Long, z: java.lang.Long) =>
                  mn = math.min(mn, a.longValue); mx = math.max(mx, z.longValue)
                case _ => tOk = false
              }
            case None => tOk = false
          }
          b.getColumns.asScala.find(_.getPath.toDotString == ValueCol) match {
            case Some(c) =>
              val st = c.getStatistics
              if (st == null || st.isEmpty || !st.hasNonNullValue) vOk = false
              else (st.genericGetMin, st.genericGetMax) match {
                case (a: java.lang.Double, z: java.lang.Double) =>
                  vmn = math.min(vmn, a.doubleValue); vmx = math.max(vmx, z.doubleValue)
                case _ => vOk = false
              }
            case None => vOk = false
          }
        }
        FooterStats(
          if (tOk && mn != Long.MaxValue) Some(mn) else None,
          if (tOk && mn != Long.MaxValue) Some(mx) else None,
          Some(rows),
          if (vOk && vmn != Double.MaxValue) Some(vmn) else None,
          if (vOk && vmn != Double.MaxValue) Some(vmx) else None)
      } finally r.close()
    } catch { case _: Throwable => FooterStats(None, None, None, None, None) }

  /** S2: hive-partitioned snappy parquet append; on the txlog backend
    * the new files become visible in ONE atomic log commit.
    */
  def write(name: String, normalized: DataFrame): Unit =
    if (logBacked) {
      val log = txLog(name)
      val (adds, schemaDecl) = stageForCommit(log, name, normalized)
      if (adds.nonEmpty) { log.commit(adds, schema = schemaDecl); () }
    } else
      layoutForWrite(normalized).write
        .options(storageOptions)
        .mode("append")
        .option("compression", "snappy")
        .partitionBy("partition")
        .parquet(featurePath(name))

  def save(name: String, df: DataFrame, partitionStyle: String = "date"): Unit = {
    // no-op on empty, dask.py:231-232. The txlog backend gets this FREE
    // from the stage/commit split (an empty batch stages no partition
    // dirs → no adds → no commit, and the feature tree is untouched), so
    // only the plain backend pays the take(1) probe — on the log backend
    // the probe was a full extra execution of the source plan in front
    // of EVERY save (guide §1.2: don't compute things you throw away).
    // INTENTIONAL parity deviation (r19/ADVICE): on the log backend an
    // EMPTY batch carrying undeclared extra columns now FAILS
    // normalize's column validation instead of silently no-op'ing — the
    // stricter behavior (a malformed writer should not pass just
    // because its first batch was empty); the plain backend keeps the
    // reference's empty-before-validate order.
    if (!logBacked && df.isEmpty) return
    // columns beyond the 3-column envelope pass validation ONLY when a
    // declared (evolved) schema names them — Delta-without-autoMerge:
    // new columns enter through evolveSchema, never through a save
    val declaredExtras: Set[String] =
      if (logBacked && exists(name))
        tableSchema(name).map(_.fieldNames.toSet -- Set(TimeCol, CreatedCol, ValueCol))
          .getOrElse(Set.empty)
      else Set.empty
    write(name, TimeseriesStore.normalize(df, partitionStyle, declaredExtras))
  }

  /** Idempotent transactional append (txlog backend): commits the batch
    * tagged with `txnId` UNLESS a commit with that id already landed —
    * the exactly-once primitive for restartable writers (a streaming
    * micro-batch re-delivered after a checkpoint recovery re-offers the
    * same txnId and becomes a no-op). Returns true iff this call
    * committed.
    */
  def writeTx(name: String, normalized: DataFrame, txnId: String): Boolean = {
    require(logBacked, "writeTx requires the txlog backend")
    val log = txLog(name)
    if (log.txnSeen(txnId)) false // fast path: skip the staging work
    else {
      val (adds, schemaDecl) = stageForCommit(log, name, normalized)
      // commit re-checks the txn id on every rename attempt — if a
      // concurrent writer (zombie driver + replacement replaying the
      // same micro-batch) landed it between the check above and here,
      // this returns -1 and the staged files are left unreferenced for
      // vacuum, instead of committing the batch twice
      adds.nonEmpty && log.commit(adds, Nil, Some(txnId), schema = schemaDecl) >= 0
    }
  }

  /** Structured exactly-once write: (streamId, batchId) instead of an
    * opaque txn id, so the log keeps one high-water mark per stream —
    * O(#streams) checkpoint state however many batches ever committed
    * (the Delta appId/version contract). Batch ids must be monotonic
    * per stream, which Structured Streaming's are.
    */
  def writeTx(name: String, normalized: DataFrame, streamId: String, batchId: Long): Boolean = {
    require(logBacked, "writeTx requires the txlog backend")
    val log = txLog(name)
    if (log.txnSeen(streamId, batchId)) false // fast path: skip staging
    else {
      val (adds, schemaDecl) = stageForCommit(log, name, normalized)
      adds.nonEmpty &&
        log.commit(adds, Nil, txnAppVer = Some((streamId, batchId)), schema = schemaDecl) >= 0
    }
  }

  /** S1 + P1/P2: scan with time-range predicate AND the derived partition
    * predicate so directory pruning kicks in before row-group pushdown.
    * Returns the 3-column envelope (partition dropped, dask.py:116-117).
    */
  def read(
      name: String,
      from: Option[Timestamp] = None,
      to: Option[Timestamp] = None,
      valueType: DataType = DoubleType,
      partitionStyle: String = "date",
      asOfVersion: Option[Long] = None): DataFrame = {
    if (!exists(name)) return emptyFrame(valueType)
    if (logBacked) return txRead(name, from, to, valueType, partitionStyle, asOfVersion)
    require(asOfVersion.isEmpty, "asOfVersion requires the txlog backend")
    val df = parquetOrEmpty(name, valueType)
    if (!df.columns.contains("partition")) return df // empty-contract frame
    // Partition bounds are widened by one unit each side and anchored on
    // UTC — NOT the reader's session zone. Partition strings were derived
    // in the WRITER's session zone; writer and reader can sit up to 26h
    // apart (UTC+14 vs UTC-12), which crosses TWO date boundaries, so a
    // reader-zone ±1-day widening can still prune a boundary partition
    // holding in-range rows. Every session zone is within 14h of UTC, so
    // UTC ±1 day covers all writer/reader combinations (the same
    // contract as the txlog path's prunePartitionValues). The bounds are
    // driver-side literals, so Catalyst prunes directories with them;
    // the exact `time` predicate then drops any extra rows.
    val ptype = df.schema("partition").dataType
    val partLo: Timestamp => Column = partitionStyle match {
      case "date" => ts => lit(PartitionBounds.dateString(ts.toInstant, -1)).cast(ptype)
      case _      => ts => lit(PartitionBounds.year(ts.toInstant, -1)).cast(ptype)
    }
    val partHi: Timestamp => Column = partitionStyle match {
      case "date" => ts => lit(PartitionBounds.dateString(ts.toInstant, 1)).cast(ptype)
      case _      => ts => lit(PartitionBounds.year(ts.toInstant, 1)).cast(ptype)
    }
    val preds =
      from.map(f => col(TimeCol) >= lit(f) && col("partition") >= partLo(f)) ++
      to.map(t => col(TimeCol) <= lit(t) && col("partition") <= partHi(t))
    preds.reduceOption(_ && _).map(df.filter).getOrElse(df)
      .select(TimeCol, CreatedCol, ValueCol)
  }

  /** Log-backed scan: the live file set comes from a snapshot replay,
    * and file-level partition pruning happens against the LOG's
    * partition values (Delta-style metadata skipping) before Spark ever
    * lists or opens anything — the widened ±1-unit bounds mirror the
    * directory-pruning path below. Old snapshots stay readable through
    * `asOfVersion` until vacuumed.
    */
  private def txRead(
      name: String,
      from: Option[Timestamp],
      to: Option[Timestamp],
      valueType: DataType,
      partitionStyle: String,
      asOfVersion: Option[Long]): DataFrame = {
    val log = txLog(name)
    val adds = log.snapshot(asOfVersion)
    // the schema in effect AT THE READ VERSION: an old snapshot reads
    // the old (pre-evolution) schema — columns added later are absent,
    // the value keeps its narrow type
    val schemas = log.schemaHistory(asOfVersion)
    // two-level metadata skipping: partition values first, then
    // per-file time bounds (Delta data-skipping shape) — a
    // micro-batch-accumulated day holds many narrow files, and a
    // ranged read drops the non-overlapping ones from the LOG alone,
    // before Spark lists or opens anything
    val pruned = prunePartitionValues(adds, from, to, partitionStyle)
      .filter(fileStatsOverlap(_, from, to))
    if (pruned.isEmpty)
      return schemas.lastOption.map(sj =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schemaOf(sj)))
        .getOrElse(emptyFrame(valueType))
    val df = openAdds(name, pruned, schemas, partitionStyle)
    val preds = from.map(f => col(TimeCol) >= lit(f)) ++ to.map(t => col(TimeCol) <= lit(t))
    preds.reduceOption(_ && _).map(df.filter).getOrElse(df)
      .select(dataCols(schemas).map(col).toIndexedSeq: _*)
  }

  /** File-level data skipping over log metadata: does the add's
    * recorded event-time range intersect [from, to]? Files without
    * stats (pre-upgrade, or unusable footers) always qualify. Exact
    * micros — no widening needed, the bounds are the file's actual
    * min/max of the same column the read filters on. */
  private def fileStatsOverlap(
      a: TxAdd, from: Option[Timestamp], to: Option[Timestamp]): Boolean = {
    def micros(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
    from.forall(f => a.tmax.forall(_ >= micros(f))) &&
      to.forall(t => a.tmin.forall(_ <= micros(t)))
  }

  /** Driver-side partition-value pruning over log metadata, widened one
    * unit each side for writer/reader timezone skew (UTC-interpreted
    * bounds ±1 day cover any session zone, same contract as the
    * foldable-predicate path).
    */
  private def prunePartitionValues(
      adds: Seq[TxAdd],
      from: Option[Timestamp],
      to: Option[Timestamp],
      partitionStyle: String): Seq[TxAdd] = partitionStyle match {
    case "date" =>
      val lo = from.map(f => PartitionBounds.dateString(f.toInstant, -1))
      val hi = to.map(t => PartitionBounds.dateString(t.toInstant, 1))
      adds.filter(a => lo.forall(a.partition >= _) && hi.forall(a.partition <= _))
    case "year" =>
      val lo = from.map(f => PartitionBounds.year(f.toInstant, -1))
      val hi = to.map(t => PartitionBounds.year(t.toInstant, 1))
      adds.filter(a => lo.forall(a.partition.toInt >= _) && hi.forall(a.partition.toInt <= _))
    case other => throw new IllegalArgumentException(s"unknown partition style: $other")
  }

  /** Scan restricted to an explicit partition subset — the tail-read
    * primitive behind `last()` (the reference's "restrict scan to the
    * final partition(s)" intent, _model.py:251-254): a point lookup on a
    * 100 TB feature touches one day's directory, not the history.
    */
  def readPartitions(name: String, parts: Seq[String], valueType: DataType): DataFrame = {
    if (!exists(name) || parts.isEmpty) return emptyFrame(valueType)
    if (logBacked) {
      val wanted = parts.toSet
      val log = txLog(name)
      val adds = log.snapshot().filter(a => wanted(a.partition))
      if (adds.isEmpty) return emptyFrame(valueType)
      val schemas = log.schemaHistory()
      return openAdds(name, adds, schemas, partitionStyle = "date")
        .select(dataCols(schemas).map(col).toIndexedSeq: _*)
    }
    val df = parquetOrEmpty(name, valueType)
    if (!df.columns.contains("partition")) return df // empty-contract frame
    df.filter(col("partition").cast(StringType).isin(parts: _*))
      .select(TimeCol, CreatedCol, ValueCol)
  }

  /** S4: feature directories present in storage. */
  def ls(): Seq[String] = {
    val base = new Path(s"$url/feature")
    val f = fs(url)
    if (!f.exists(base)) Seq.empty
    else f.listStatus(base).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }

  /** S4: hive partition values for a feature, sorted; `reverse` + `n` give
    * the "last n partitions" read used by last() (dask.py:38-50).
    */
  def listPartitions(name: String, n: Int = Int.MaxValue, reverse: Boolean = false): Seq[String] = {
    val p = new Path(featurePath(name))
    val f = fs(url)
    if (!f.exists(p)) Seq.empty
    else if (logBacked) {
      // log metadata, not directory listing: one small-file replay
      // instead of an object-store LIST, and retired partitions (all
      // files removed) disappear from the listing immediately
      val parts = txLog(name).snapshot().map(_.partition).distinct.sorted
      (if (reverse) parts.reverse else parts).take(n)
    } else {
      val parts = f.listStatus(p).filter(_.isDirectory)
        .map(_.getPath.getName).filter(_.startsWith("partition="))
        .map(_.stripPrefix("partition=")).toSeq.sorted
      (if (reverse) parts.reverse else parts).take(n)
    }
  }

  /** Compaction: collapse a feature's append history to one deduped row
    * per time (the reference never compacts and pays the dedup on every
    * read, SURVEY §7.5.3). Restricted to `partitions` when given, so a
    * years-deep feature with a few fresh appends rewrites only the
    * affected day directories, never the history. The deduped output is
    * staged in a sibling directory and swapped in per partition through
    * a trash dir, so no committed row is ever deleted before its
    * replacement exists: a crash mid-swap can leave a partition
    * temporarily missing from listings but its bytes recoverable from
    * `.compact-trash`. Contract: single writer per feature during
    * compaction — an append racing the swap can be trashed with the old
    * generation (the reference has no compaction at all; full
    * transactionality is table-format territory, e.g. Delta).
    */
  def compact(name: String, partitions: Seq[String] = Nil): Unit = {
    if (!exists(name)) return
    if (logBacked) return compactTx(name, partitions)
    val targetParts = if (partitions.nonEmpty) partitions else listPartitions(name)
    if (targetParts.isEmpty) return
    val src = spark.read.options(storageOptions).parquet(featurePath(name))
      .filter(col("partition").cast(StringType).isin(targetParts: _*))
    // group by (partition, time): time determines partition, so this is
    // plain per-time dedup with the partition column carried through
    val deduped = graft.ops.TimeseriesOps.dedupLatest(src, keyCols = Seq("partition"))
    val f = fs(url)
    // staged outside feature/ so listings and namespace GC never see it
    val tmp = new Path(s"$url/.compact/$name")
    f.delete(tmp, true)
    deduped.select(col(TimeCol), col(CreatedCol), col(ValueCol), col("partition"))
      .write.options(storageOptions).option("compression", "snappy")
      .partitionBy("partition")
      .parquet(tmp.toString)
    val trash = new Path(s"$url/.compact-trash/$name")
    f.delete(trash, true)
    f.mkdirs(trash)
    targetParts.foreach { p =>
      val newDir = new Path(tmp, s"partition=$p")
      val liveDir = new Path(featurePath(name), s"partition=$p")
      val trashDir = new Path(trash, s"partition=$p")
      if (f.exists(newDir)) {
        // FileSystem.rename signals failure by RETURNING false, not by
        // throwing — every step is checked so a failed swap aborts with
        // the data intact (restored from trash if already moved) rather
        // than silently deleting a partition's only copy
        if (f.exists(liveDir) && !f.rename(liveDir, trashDir))
          throw new java.io.IOException(
            s"compact aborted: could not stage $liveDir to $trashDir")
        if (!f.rename(newDir, liveDir)) {
          if (f.exists(trashDir)) f.rename(trashDir, liveDir) // restore
          throw new java.io.IOException(
            s"compact aborted: could not install $newDir as $liveDir (old data restored)")
        }
      }
    }
    f.delete(tmp, true)
    f.delete(trash, true)
  }

  /** Transactional compaction (txlog backend): dedup the target
    * partitions' live files into new files, then retire old + publish
    * new in ONE commit — a reader replaying the log sees the
    * pre-compaction or post-compaction file set, never a partition with
    * its replacement missing (the window the rename-swap protocol below
    * documents away). Old files stay on disk for time travel until
    * `vacuum`.
    */
  private def compactTx(name: String, partitions: Seq[String]): Unit = {
    val log = txLog(name)
    val all = log.snapshot()
    if (all.isEmpty) return
    val targetParts: Set[String] =
      if (partitions.nonEmpty) partitions.toSet else all.map(_.partition).toSet
    val victims = all.filter(a => targetParts(a.partition))
    if (victims.isEmpty) return
    val schemas = log.schemaHistory()
    // epoch-aware open + rewrite at the LATEST schema (the Delta
    // rewrite convention); pre-compaction versions still read their
    // own epochs from the retired files until vacuum
    val src = openAdds(name, victims, schemas, partitionStyle = "date")
    val deduped = graft.ops.TimeseriesOps.dedupLatest(src, keyCols = Seq("partition"))
    val adds = stageInstall(log, name,
      deduped.select((dataCols(schemas).map(col) :+ col("partition")).toIndexedSeq: _*))
      .map(_.copy(sv = svTag(schemas)))
    log.commit(adds, victims.map(a => TxRemove(a.path)))
  }

  /** Small-file bin-packing compaction (the Delta paper's OPTIMIZE;
    * txlog backend): coalesce each partition's undersized live files
    * into ~`targetBytes` outputs WITHOUT changing a single row — unlike
    * `compact` there is no dedup, so row counts, generation history and
    * every `asOfVersion` read are preserved exactly; only the file
    * layout changes. The cure for a 10-second micro-batch sink's
    * file-per-commit accumulation: a day of small commits re-packs into
    * row-group-sized files and every subsequent scan opens N/100 files.
    *
    * Retire + publish happen in ONE commit (a reader replays the old or
    * the new layout, never a mix), and the commit's remove-validation
    * makes a race with a concurrent compaction/optimize fail loudly
    * instead of double-publishing the data. Old bytes reclaim on
    * `vacuum`. Output files keep the ranged (partition, time) layout,
    * sized by input bytes to ~targetBytes each; only files under HALF
    * the target count as pack-worthy, so optimize's own outputs never
    * re-qualify and repeated maintenance runs converge to a no-op.
    * Returns the number of files retired (0 = nothing worth packing).
    */
  def optimize(name: String, targetBytes: Long = 128L * 1024 * 1024): Long = {
    require(logBacked, "optimize requires the txlog backend")
    if (!exists(name)) return 0L
    val log = txLog(name)
    val live = log.snapshot()
    if (live.isEmpty) return 0L
    val f = fs(url)
    val root = featurePath(name)
    // Sizes come from ONE listStatus per partition directory (statuses
    // carry lengths), not a stat RPC per live file — the many-small-
    // files table this feature exists for would otherwise pay thousands
    // of sequential HEAD requests before any repack work starts. A file
    // that vanished before the listing (racing vacuum of an older
    // layout) drops out of the plan here; one that vanishes between
    // this listing and the rewrite read fails the Spark job LOUDLY —
    // correct, since a live file can only vanish through external
    // deletion or a concurrent retirement that the commit's
    // remove-validation would have rejected anyway.
    val sizesByPath: Map[String, Long] =
      live.map(_.partition).distinct.flatMap { p =>
        try f.listStatus(new Path(root, s"partition=$p")).toSeq
          .filter(_.isFile)
          .map(st => s"partition=$p/${st.getPath.getName}" -> st.getLen)
        catch { case _: java.io.FileNotFoundException => Nil }
      }.toMap
    // Victims per partition: files under HALF the target (outputs
    // average >= targetBytes/2 by construction, so a repack's own
    // outputs are never re-selected — without the half floor a
    // partition bigger than the target would be rewritten in full on
    // every maintenance run forever), at least 2 of them, and only
    // when packing can actually REDUCE the partition's file count.
    // (A range boundary can still split one partition's pack across
    // two output files and re-qualify it next run — bounded to the
    // straddling partitions, and the count-improvement guard stops
    // re-selecting once the achievable count is reached.)
    val victims = live.groupBy(_.partition).values.flatMap { adds =>
      val sized = adds.flatMap(a => sizesByPath.get(a.path).filter(_ < targetBytes / 2).map((a, _)))
      val achievable = math.max(1L, (sized.map(_._2).sum + targetBytes - 1) / targetBytes)
      if (sized.length >= 2 && sized.length > achievable) sized else Nil
    }.toSeq
    if (victims.isEmpty) return 0L
    val totalBytes = victims.map(_._2).sum
    val outParts = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val schemas = log.schemaHistory()
    val src = openAdds(name, victims.map(_._1), schemas, partitionStyle = "date")
      .select((dataCols(schemas).map(col) :+ col("partition")).toIndexedSeq: _*)
    val adds = stageInstall(log, name, src, outPartitions = Some(outParts))
      .map(_.copy(sv = svTag(schemas)))
    log.commit(adds, victims.map(v => TxRemove(v._1.path)))
    victims.size.toLong
  }

  /** OPTIMIZE ZORDER (txlog backend): rewrite the table's live files
    * clustered on the Morton interleave of (event-day, value) so that
    * per-file min/max stats get tight on BOTH dimensions — after the
    * rewrite, a ranged read skips files by time (as always) AND a
    * value-predicate scan ([[readValueRange]]) skips files by the
    * recorded value bounds, where the append layout (time-ranged, value
    * random per file) can skip nothing on value. Delta's OPTIMIZE
    * ZORDER BY in the store's shape.
    *
    * The rewrite is ONE repartitionByRange((partition, zkey)) shuffle +
    * per-task sort — the same cost as the linear re-layout `optimize`
    * performs; within a single date partition the day bits are constant
    * so the interleave orders by value, giving value-sorted files per
    * directory. Rows never change (no dedup — `asOfVersion` reads and
    * generation history are preserved exactly); retire + publish in ONE
    * commit; old bytes reclaim on `vacuum`. Value stats come from the
    * freshly-written parquet footers, the same page-cached read as the
    * time bounds. Numeric (double) values only. Returns files retired.
    */
  def optimizeZorder(
      name: String,
      bits: Int = 16,
      targetBytes: Long = 128L * 1024 * 1024): Long = {
    require(logBacked, "optimizeZorder requires the txlog backend")
    if (!exists(name)) return 0L
    val log = txLog(name)
    val live = log.snapshot()
    if (live.isEmpty) return 0L
    val f = fs(url)
    val root = featurePath(name)
    val totalBytes = live.map(_.partition).distinct.map { p =>
      try f.listStatus(new Path(root, s"partition=$p")).toSeq
        .filter(_.isFile).map(_.getLen).sum
      catch { case _: java.io.FileNotFoundException => 0L }
    }.sum
    val outFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val schemas = log.schemaHistory()
    val src = openAdds(name, live, schemas, partitionStyle = "date")
      .select((dataCols(schemas).map(col) :+ col("partition")).toIndexedSeq: _*)
    require(src.schema(ValueCol).dataType == org.apache.spark.sql.types.DoubleType,
      s"optimizeZorder clusters on a numeric value; '$name' stores ${src.schema(ValueCol).dataType}")
    val mask = (1L << bits) - 1
    val day = expr(s"unix_micros($TimeCol) div 86400000000").bitwiseAND(lit(mask))
    val cents = greatest(lit(0L),
      least(lit(mask), round(col(ValueCol) * 100, 0).cast("long")))
    val laid = src
      .withColumn("__zkey", graft.ops.ZOrder.interleave(Seq(day, cents), bits))
      .repartitionByRange(outFiles, col("partition"), col("__zkey"))
      .sortWithinPartitions(col("partition"), col("__zkey"))
      .drop("__zkey")
    val adds = stageInstall(log, name, laid, preLaid = true)
      .map(_.copy(sv = svTag(schemas)))
    log.commit(adds, live.map(a => TxRemove(a.path)))
    live.size.toLong
  }

  /** Live files whose recorded value bounds intersect [vlo, vhi] (and
    * whose time bounds intersect [from, to]) — the skipping decision
    * [[readValueRange]] applies, exposed for tests/diagnostics. Files
    * without value stats always qualify. */
  private[graft] def candidateFilesForValueRange(
      name: String,
      vlo: Double,
      vhi: Double,
      from: Option[Timestamp] = None,
      to: Option[Timestamp] = None): Seq[TxAdd] = {
    require(logBacked, "value-range skipping requires the txlog backend")
    txLog(name).snapshot()
      .filter(fileStatsOverlap(_, from, to))
      .filter(a => a.vmax.forall(_ >= vlo) && a.vmin.forall(_ <= vhi))
  }

  /** Ranged scan with VALUE data skipping (txlog backend): prune files
    * by partition values + time bounds + recorded value bounds from
    * the LOG alone, then apply the exact residual predicates. On a
    * z-ordered table ([[optimizeZorder]]) a narrow value slice opens a
    * small fraction of the files; on an append layout each file's
    * recorded value range typically spans the whole domain (values
    * arrive time-ordered, not value-ordered), so little skips — but
    * nothing breaks, and extreme-value probes (beyond most files'
    * ranges) still prune even un-clustered tables. The anomaly-hunt
    * shape: "value in [x, y] anywhere in history" without a full scan.
    */
  def readValueRange(
      name: String,
      vlo: Double,
      vhi: Double,
      from: Option[Timestamp] = None,
      to: Option[Timestamp] = None): DataFrame = {
    require(logBacked, "readValueRange requires the txlog backend")
    if (!exists(name)) return emptyFrame(org.apache.spark.sql.types.DoubleType)
    val log = txLog(name)
    val schemas = log.schemaHistory()
    val pruned = prunePartitionValues(
      candidateFilesForValueRange(name, vlo, vhi, from, to), from, to, "date")
    if (pruned.isEmpty)
      return schemas.lastOption.map(sj =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schemaOf(sj)))
        .getOrElse(emptyFrame(org.apache.spark.sql.types.DoubleType))
    val df = openAdds(name, pruned, schemas, partitionStyle = "date")
    val preds = Seq(col(ValueCol) >= lit(vlo), col(ValueCol) <= lit(vhi)) ++
      from.map(t => col(TimeCol) >= lit(t)) ++ to.map(t => col(TimeCol) <= lit(t))
    df.filter(preds.reduce(_ && _))
      .select(dataCols(schemas).map(col).toIndexedSeq: _*)
  }

  /** Declare a Bloom-filter index over `column` (txlog backend; the
    * Delta bloom-filter-index table property): every subsequent write
    * — appends AND rewrite ops, since both route through the staged
    * install — attaches a `bits`-bit / `k`-hash [[FileBloom]] over the
    * column to each added file. Existing files keep no bloom and are
    * simply never skipped; `optimizeCompact`/`optimizeZorder` rewrite
    * them through the install path and pick blooms up. Declaring
    * `bits = 0` drops the index. Returns the committed log version.
    */
  def declareBloomIndex(name: String, column: String, bits: Int = 8192, k: Int = 6): Long = {
    require(logBacked, "bloom indexes require the txlog backend")
    require(bits == 0 || (bits % 64 == 0 && bits > 0),
      s"bloom bits must be 0 (drop) or a positive multiple of 64: $bits")
    txLog(name).commit(Nil, bloom = Some((column, bits, k)))
  }

  /** Live files whose bloom (over `column`) admits `value`, intersected
    * with the time-bounds skip — the decision [[readKeyEquals]]
    * applies, exposed for tests/diagnostics. Files without a bloom on
    * this column always qualify (pre-declaration epochs, null-only
    * files, foreign-column blooms).
    */
  private[graft] def candidateFilesForKey(
      name: String,
      column: String,
      value: String,
      from: Option[Timestamp] = None,
      to: Option[Timestamp] = None): Seq[TxAdd] = {
    require(logBacked, "bloom skipping requires the txlog backend")
    txLog(name).snapshot()
      .filter(fileStatsOverlap(_, from, to))
      .filter(FileBloom.addMightContain(_, column, value))
  }

  /** Point-lookup scan with BLOOM file skipping (txlog backend): prune
    * files by partition values + time bounds + per-file blooms from the
    * log alone, then apply the exact equality predicate. The shape
    * min/max stats cannot give: on an append-ordered table every file's
    * value range straddles every probe, but a key's bloom bits identify
    * the handful of files that can contain it — "all history for entity
    * X" without a full scan, the GDPR-subject-access / entity-audit
    * query. `value` must be a non-null String/Long/Int/Boolean — types
    * whose Spark string cast equals their JVM rendering, the contract
    * the build side hashed under (fractional types round-trip
    * ambiguously; range-probe those via [[readValueRange]]).
    */
  def readKeyEquals(
      name: String,
      column: String,
      value: Any,
      from: Option[Timestamp] = None,
      to: Option[Timestamp] = None): DataFrame = {
    require(value != null, "bloom point lookup requires a non-null probe value")
    require(
      value.isInstanceOf[String] || value.isInstanceOf[Long] || value.isInstanceOf[Int] ||
        value.isInstanceOf[Boolean],
      s"unsupported probe type ${value.getClass.getName}: the bloom hashed the column's " +
        "STRING rendering, which only integral/string/boolean types reproduce exactly")
    require(logBacked, "readKeyEquals requires the txlog backend")
    if (!exists(name)) return emptyFrame(org.apache.spark.sql.types.DoubleType)
    val log = txLog(name)
    val schemas = log.schemaHistory()
    val pruned = prunePartitionValues(
      candidateFilesForKey(name, column, value.toString, from, to), from, to, "date")
    if (pruned.isEmpty)
      return schemas.lastOption.map(sj =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schemaOf(sj)))
        .getOrElse(emptyFrame(org.apache.spark.sql.types.DoubleType))
    val df = openAdds(name, pruned, schemas, partitionStyle = "date")
    val preds = Seq(col(column) === lit(value)) ++
      from.map(t => col(TimeCol) >= lit(t)) ++ to.map(t => col(TimeCol) <= lit(t))
    df.filter(preds.reduce(_ && _))
      .select(dataCols(schemas).map(col).toIndexedSeq: _*)
  }

  /** Metadata-only table statistics (txlog backend): exact stored-row
    * count and event-time bounds computed from the LOG alone — zero
    * Spark jobs, zero file opens; at 100 TB this is the difference
    * between an O(1) driver answer and a full-table count scan
    * (Delta's numRecords fast path). Returns None when any live file
    * predates the stats upgrade for the requested dimension: the row
    * count needs every add to carry `nrec`, each bound needs every add
    * to carry it — callers fall back to a scan, never get a wrong
    * number. Counts are STORED rows (every generation the log
    * references, exactly what `read` returns); logical rows after
    * last-writer-wins dedup are a downstream aggregation.
    */
  def tableStatsFast(
      name: String,
      asOfVersion: Option[Long] = None): Option[TableStats] = {
    require(logBacked, "tableStatsFast requires the txlog backend")
    if (!exists(name)) return None
    val adds = txLog(name).snapshot(asOfVersion)
    if (adds.isEmpty) return Some(TableStats(0L, None, None))
    val rows =
      if (adds.forall(_.nrec.nonEmpty)) Some(adds.flatMap(_.nrec).sum) else None
    rows.map { n =>
      TableStats(n,
        if (adds.forall(_.tmin.nonEmpty)) Some(adds.flatMap(_.tmin).min) else None,
        if (adds.forall(_.tmax.nonEmpty)) Some(adds.flatMap(_.tmax).max) else None,
        if (adds.forall(_.vmin.nonEmpty)) Some(adds.flatMap(_.vmin).min) else None,
        if (adds.forall(_.vmax.nonEmpty)) Some(adds.flatMap(_.vmax).max) else None)
    }
  }

  /** Row-level transactional delete (the lakehouse DELETE / GDPR
    * right-to-be-forgotten op; txlog backend): rewrite ONLY the live
    * files that contain matching rows, drop the matches, and retire +
    * publish in ONE commit — a reader replays the pre- or post-delete
    * file set, never a mix. Files without matches are untouched (no
    * full-table rewrite), found by one predicate scan carrying
    * `_metadata.file_path` — the scan itself prunes via parquet
    * row-group stats where the predicate allows. The predicate sees
    * the normalized columns (time, created_time, value, partition).
    * Old bytes remain for time travel until `vacuum` — an `asOfVersion`
    * read still reproduces the pre-delete table, so a STRICT erasure
    * must also vacuum. Returns the number of rows deleted.
    */
  def deleteWhere(name: String, predicate: Column): Long =
    rewriteMatchingFiles(name, predicate) { vsrc =>
      // a fully-emptied file set publishes removes only (commit accepts it)
      vsrc.filter(!predicate || predicate.isNull)
    }

  /** Row-level transactional UPDATE (txlog backend): rows matching the
    * predicate get `newValue` as their value; same only-matching-files
    * rewrite + single retire/publish commit as [[deleteWhere]].
    * `newValue` may reference the normalized columns (e.g.
    * `col("value") * 2`). Returns rows updated.
    */
  def updateWhere(name: String, predicate: Column, newValue: Column): Long =
    rewriteMatchingFiles(name, predicate) { vsrc =>
      vsrc.withColumn(ValueCol,
        when(predicate, newValue.cast(vsrc.schema(ValueCol).dataType))
          .otherwise(col(ValueCol)))
    }

  /** Shared victim-discovery / rewrite / commit body of [[deleteWhere]]
    * and [[updateWhere]]: ONE file-pruned predicate scan finds the live
    * files containing matches, the victim set is read ONCE (persisted,
    * so the matched-row count and the rewrite share a single parquet
    * pass), `rewrite` produces the replacement rows, and retire +
    * publish land in one atomic commit. Returns the matched-row count.
    */
  private def rewriteMatchingFiles(name: String, predicate: Column)(
      rewrite: DataFrame => DataFrame): Long = {
    require(logBacked, "row-level rewrites require the txlog backend")
    if (!exists(name)) return 0L
    val log = txLog(name)
    val live = log.snapshot()
    if (live.isEmpty) return 0L
    val schemas = log.schemaHistory()
    // driver-size by construction: one row per LIVE FILE with a match,
    // bounded by the snapshot size (same class as snapshot() itself)
    val victimUris =
      openAdds(name, live, schemas, partitionStyle = "date", withFilePath = true)
        .filter(predicate).select(col("_f")).distinct()
        .collect().map(_.getString(0)).toSet
    if (victimUris.isEmpty) return 0L
    val victims = live.filter(a => victimUris.exists(_.endsWith("/" + a.path)))
    val vsrc = openAdds(name, victims, schemas, partitionStyle = "date")
      .select((dataCols(schemas).map(col) :+ col("partition")).toIndexedSeq: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val matched = vsrc.filter(predicate).count() // materializes the cache
      val out = rewrite(vsrc)
      val adds =
        if (out.isEmpty) Nil
        else stageInstall(log, name, out).map(_.copy(sv = svTag(schemas)))
      log.commit(adds, victims.map(a => TxRemove(a.path)))
      matched
    } finally vsrc.unpersist(blocking = false)
  }

  /** Lakehouse MERGE INTO (txlog backend): physical upsert keyed on
    * `time` — target rows whose time appears in `source` are REPLACED
    * by the source rows (every stored generation of a matched time
    * collapses), times the target has never seen insert, and the whole
    * operation lands as ONE retire+publish commit (a reader replays the
    * pre- or post-merge table, never a mix). This is the in-place
    * alternative to the store's usual append+last-writer-wins upsert:
    * no history accumulates and no compaction is owed afterwards —
    * the right tool for reference/dimension-style features where old
    * generations are noise, while event-style features keep using
    * `save` (append) + time travel.
    *
    * Only live files CONTAINING a matched time rewrite (victim
    * discovery is one file-pruned semi-join of the scan against the
    * source's distinct times — never an IN-list, so a million-row
    * source works); untouched files are not rewritten, so merge cost
    * is proportional to the overlap's file footprint plus the insert
    * volume. Pre-merge versions stay time-travelable until `vacuum`.
    * Returns (updatedTimes, insertedRows).
    */
  def mergeInto(
      name: String,
      source: DataFrame, // time, value [, created_time, declared extras]
      partitionStyle: String = "date"): (Long, Long) = {
    require(logBacked, "mergeInto requires the txlog backend")
    val declaredExtras: Set[String] =
      if (exists(name))
        tableSchema(name).map(_.fieldNames.toSet -- Set(TimeCol, CreatedCol, ValueCol))
          .getOrElse(Set.empty)
      else Set.empty
    val normalized = TimeseriesStore.normalize(source, partitionStyle, declaredExtras)
    val log = txLog(name)
    // the MERGE source is new data like any save batch — same CHECKs
    enforceChecks(log, name, normalized)
    val live = if (exists(name)) log.snapshot() else Seq.empty
    if (live.isEmpty) {
      // empty target: MERGE degenerates to plain insert
      val n = normalized.count()
      if (n > 0) write(name, normalized)
      return (0L, n)
    }
    val schemas = log.schemaHistory()
    val srcTimes = normalized.select(col(TimeCol)).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE scan finds both the victim files and the matched-time count
      val hits = openAdds(name, live, schemas, partitionStyle = "date", withFilePath = true)
        .join(srcTimes, Seq(TimeCol), "left_semi")
        .select(col("_f"), col(TimeCol))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val victimUris = hits.select(col("_f")).distinct()
          .collect().map(_.getString(0)).toSet // driver-size: one row per live file
        val updated = hits.select(col(TimeCol)).distinct().count()
        val inserted = normalized.count() - updated
        if (victimUris.isEmpty) {
          // no overlap: MERGE is a plain transactional append
          write(name, normalized)
          return (0L, inserted)
        }
        val victims = live.filter(a => victimUris.exists(_.endsWith("/" + a.path)))
        val keep = openAdds(name, victims, schemas, partitionStyle = "date")
          .join(srcTimes, Seq(TimeCol), "left_anti")
        val target = schemas.lastOption.map(schemaOf)
        val conformedSrc = target.map(conformForWrite(normalized, _)).getOrElse(normalized)
        val keepCols = (dataCols(schemas).map(col) :+ col("partition")).toIndexedSeq
        val adds = stageInstall(log, name,
          keep.select(keepCols: _*).unionByName(conformedSrc.select(keepCols: _*)))
          .map(_.copy(sv = svTag(schemas)))
        log.commit(adds, victims.map(a => TxRemove(a.path)))
        (updated, inserted)
      } finally hits.unpersist(blocking = false)
    } finally srcTimes.unpersist(blocking = false)
  }

  /** Incremental change feed (CDC-lite; txlog backend): the rows ADDED
    * between two table versions — the files `toVersion`'s snapshot
    * references that `fromVersion`'s does not. For the append-dominant
    * feature-store workload this is exactly the new data, letting a
    * downstream pipeline consume a 100 TB table incrementally (read
    * only the new files) instead of re-scanning; compaction/optimize
    * rewrites reappear here by design (they publish new files — a
    * consumer keyed on (time, created_time) dedups them away, the same
    * LWW contract as every read).
    */
  def readChanges(
      name: String,
      fromVersion: Long,
      toVersion: Option[Long] = None,
      valueType: DataType = DoubleType): DataFrame = {
    require(logBacked, "readChanges requires the txlog backend")
    if (!exists(name)) return emptyFrame(valueType)
    val log = txLog(name)
    val before = log.snapshot(Some(fromVersion)).map(_.path).toSet
    val after = log.snapshot(toVersion)
    val fresh = after.filterNot(a => before(a.path))
    if (fresh.isEmpty) return emptyFrame(valueType)
    val schemas = log.schemaHistory(toVersion)
    openAdds(name, fresh, schemas, partitionStyle = "date")
      .select(dataCols(schemas).map(col).toIndexedSeq: _*)
  }

  /** Lakehouse RESTORE (txlog backend): make version `v`'s file set
    * the LATEST state again — as a NEW commit (removes of files v
    * doesn't reference + re-adds of files it does), so the rollback is
    * itself time-travelable and nothing is ever rewritten: the
    * restored files are the ORIGINAL bytes, still on disk as long as
    * vacuum hasn't reclaimed them (a vacuumed restore fails loudly
    * up front, listing the first missing file, rather than committing
    * dangling adds). The undo button for a bad merge/delete/append.
    * Schema epochs only ever append, so a restore never "un-declares"
    * a schema: re-added files keep their original write epochs and
    * read back under the CURRENT epoch with the usual widening/null
    * alignment. Returns the new version (or the current one if v's
    * file set is already live).
    */
  def restore(name: String, v: Long): Long = {
    require(logBacked, "restore requires the txlog backend")
    require(exists(name), s"no such feature: $name")
    val log = txLog(name)
    val target = log.snapshot(Some(v))
    val current = log.snapshot()
    val targetPaths = target.map(_.path).toSet
    val currentPaths = current.map(_.path).toSet
    val adds = target.filterNot(a => currentPaths(a.path))
    val removes = current.filterNot(a => targetPaths(a.path)).map(a => TxRemove(a.path))
    if (adds.isEmpty && removes.isEmpty) return log.latestVersion()
    val f = fs(url)
    adds.find(a => !f.exists(new Path(s"${featurePath(name)}/${a.path}"))).foreach { a =>
      throw new IllegalStateException(
        s"cannot restore '$name' to version $v: ${a.path} was vacuumed")
    }
    log.commit(adds, removes)
  }

  /** Resolve an AS OF TIMESTAMP instant to a table version (txlog
    * backend) — feed the result to `read(asOfVersion = …)` /
    * `readChanges`. Delta's commit-mtime fallback rule; see
    * [[TxLog.versionAt]] for the portability caveat. */
  def versionAt(name: String, tsMillis: Long): Long = {
    require(logBacked, "versionAt requires the txlog backend")
    txLog(name).versionAt(tsMillis)
  }

  /** Garbage-collect files retired by compaction (txlog backend):
    * deletes bytes unreferenced by the LATEST snapshot. Time travel to
    * vacuumed versions stops working — the standard retention trade.
    */
  def vacuum(name: String, retentionMs: Long = 3600000L): Long = {
    require(logBacked, "vacuum requires the txlog backend")
    if (!exists(name)) return 0L
    var removed = txLog(name).vacuum(retentionMs)
    // a writer that crashed between staging and install leaves its
    // whole batch under <url>/.stage/<name>/<uuid>, OUTSIDE the table
    // dir the log vacuum walks — reap stale stage dirs on the same
    // horizon (a live writer's stage is younger than the retention)
    val stageRoot = new Path(s"$url/.stage/$name")
    val f = fs(url)
    val horizon = System.currentTimeMillis() - retentionMs
    // staleness = the NEWEST mtime anywhere under the stage tree, not
    // the root dir's: the root's mtime reflects job START (Spark creates
    // _temporary immediately; task files land much later), so a write
    // job still running past the horizon would have its stage yanked
    // mid-write by a concurrent vacuum — its freshly written task files
    // prove it alive. Recurses on the FileStatus already in hand (no
    // re-stat RPC per directory), and a path that vanishes mid-walk —
    // the live writer just committed/renamed it — reads as maximally
    // FRESH so the stage is skipped this cycle rather than aborting the
    // whole vacuum with FileNotFoundException.
    def treeMaxMtime(st: org.apache.hadoop.fs.FileStatus): Long =
      if (!st.isDirectory) st.getModificationTime
      else
        try (st.getModificationTime +:
          f.listStatus(st.getPath).toSeq.map(treeMaxMtime)).max
        catch { case _: java.io.FileNotFoundException => Long.MaxValue }
    if (f.exists(stageRoot))
      f.listStatus(stageRoot)
        .filter(st => st.isDirectory && treeMaxMtime(st) <= horizon)
        .foreach(st => if (f.delete(st.getPath, true)) removed += 1)
    removed
  }

  /** Latest committed table version of a log-backed feature (-1 if no
    * commits yet) — the handle `read(asOfVersion = ...)` time-travels to.
    */
  def tableVersion(name: String): Long = {
    require(logBacked, "tableVersion requires the txlog backend")
    txLog(name).latestVersion()
  }

  /** S5: recursive delete of a feature's data. */
  def delete(name: String): Unit = {
    val p = new Path(featurePath(name))
    val f = fs(url)
    if (f.exists(p)) { f.delete(p, true); () }
  }

  /** S6: clone data between stores (export/import, _base.py:46-57).
    * Backend-aware on both ends: a log-backed source reads its LIVE
    * snapshot (raw directory parquet would resurrect compacted-away
    * duplicates), and the destination's `write` commits through its own
    * backend.
    */
  def copy(name: String, toName: String, dest: TimeseriesStore): Unit = {
    if (exists(name)) {
      val df =
        if (logBacked) {
          val log = txLog(name)
          val adds = log.snapshot()
          if (adds.isEmpty) return
          openAdds(name, adds, log.schemaHistory(), partitionStyle = "date")
        } else parquetOrEmpty(name, DoubleType)
      if (!df.columns.contains("partition")) return // file-less dir: nothing to copy
      // carry every data column (an evolved source clones its full
      // latest schema; the destination declares it on first write)
      dest.write(toName, df.select(
        (df.columns.filterNot(_ == "partition").map(col) :+ col("partition")).toIndexedSeq: _*))
    }
  }

  // --- open-format bridge -----------------------------------------------

  /** Export a txlog snapshot as a PLAIN hive-partitioned parquet tree
    * any engine reads directly (DuckDB, another Spark, pandas — no
    * graft code, no log): the open-format escape hatch the bespoke
    * log protocol otherwise lacks. Two paths, chosen by what the
    * snapshot physically is:
    *
    *  - VERBATIM (single schema epoch): every live file is byte-copied
    *    into `dstDir` under its `partition=<p>/` directory — zero
    *    recompute, bit-identical pages, and the copy parallelism is
    *    the file count (at 100 TB this is an object-store server-side
    *    copy per file, no data through compute).
    *  - ALIGNED (mixed schema epochs): raw mixed-epoch files would
    *    force every external reader to solve schema merge, so the
    *    snapshot is read epoch-aware (`openAdds`), aligned to the
    *    version's declared schema, and rewritten as one partitioned
    *    write — the same one-exchange layout the store itself writes.
    *
    * A `_graft_manifest.json` lands last (underscore-prefixed: Spark
    * and Hadoop globbing ignore it) recording table, version, mode,
    * schema and row count — enough for [[importSnapshot]] to rebuild a
    * log-backed table, and for an auditor to tie the tree to its
    * source version. Returns the exported version.
    */
  def exportSnapshot(name: String, dstDir: String, asOfVersion: Option[Long] = None): Long = {
    require(logBacked, "exportSnapshot requires the txlog backend")
    val log = txLog(name)
    val v = asOfVersion.getOrElse(log.latestVersion())
    require(v >= 0, s"feature '$name' has no committed version to export")
    val adds = log.snapshot(Some(v))
    val schemas = log.schemaHistory(Some(v))
    val f = fs(url)
    val dst = new Path(dstDir)
    val dstFs = dst.getFileSystem(hadoopConf)
    require(!dstFs.exists(dst) || dstFs.listStatus(dst).isEmpty,
      s"export destination $dstDir exists and is not empty")
    dstFs.mkdirs(dst)
    val verbatim = adds.map(_.sv.getOrElse(0L)).distinct.size <= 1
    if (verbatim) {
      val root = new Path(featurePath(name))
      adds.foreach { a =>
        val to = new Path(dst, a.path)
        if (!dstFs.exists(to.getParent)) dstFs.mkdirs(to.getParent)
        org.apache.hadoop.fs.FileUtil.copy(
          f, new Path(root, a.path), dstFs, to, false, hadoopConf)
      }
    } else if (adds.nonEmpty) {
      val df = openAdds(name, adds, schemas, partitionStyle = "date")
      val tsKey = "spark.sql.parquet.outputTimestampType"
      val prevTs = spark.conf.get(tsKey)
      spark.conf.set(tsKey, "TIMESTAMP_MICROS")
      try layoutForWrite(df).write
        .options(storageOptions).option("compression", "snappy")
        .partitionBy("partition").mode("append").parquet(dstDir)
      finally spark.conf.set(tsKey, prevTs)
      // drop Spark's _SUCCESS marker: the tree should carry ONLY data
      // files and the manifest
      dstFs.delete(new Path(dst, "_SUCCESS"), false)
    }
    val manifest = Map[String, Any](
      "table" -> name, "version" -> v,
      "mode" -> (if (verbatim) "verbatim" else "aligned"),
      "files" -> (if (verbatim) adds.map(_.path) else Nil),
      "rows" -> adds.flatMap(_.nrec).sum,
      "schemaJson" -> schemas.lastOption.orNull)
    val out = dstFs.create(new Path(dst, TimeseriesStore.ManifestName), true)
    try out.write(TimeseriesStore.manifestMapper.writeValueAsBytes(manifest))
    finally out.close()
    v
  }

  /** [[exportSnapshot]] plus a Delta-protocol `_delta_log` describing
    * the exported tree ([[DeltaBridge.writeLog]]): the snapshot becomes
    * a table any Delta reader opens natively — the open-STANDARD hop
    * the plain-parquet export alone lacks (readers that want a table,
    * not a directory). Returns the exported txlog version; the Delta
    * table id is derived from (table, version) so identical exports
    * produce byte-identical logs.
    */
  def exportSnapshotDelta(name: String, dstDir: String, asOfVersion: Option[Long] = None): Long = {
    val v = exportSnapshot(name, dstDir, asOfVersion)
    DeltaBridge.writeLog(spark, dstDir, s"$name@$v", hadoopConf)
    v
  }

  /** [[exportSnapshot]] plus Iceberg v2 table metadata describing the
    * exported tree ([[IcebergBridge.writeTable]]): the snapshot becomes
    * a table any Iceberg reader opens natively (Spark+iceberg-runtime,
    * Trino, DuckDB's iceberg extension, pyiceberg) — the second
    * open-standard leg next to [[exportSnapshotDelta]]. Returns the
    * exported txlog version; the Iceberg table uuid / snapshot id are
    * derived from (table, version), so identical exports produce
    * byte-identical metadata trees.
    */
  def exportSnapshotIceberg(name: String, dstDir: String, asOfVersion: Option[Long] = None): Long = {
    val v = exportSnapshot(name, dstDir, asOfVersion)
    IcebergBridge.writeTable(spark, dstDir, s"$name@$v", hadoopConf)
    v
  }

  /** ONE new Iceberg snapshot on an [[exportSnapshotIceberg]] tree —
    * the continuous leg, [[syncSnapshotDelta]]'s twin: new txlog files
    * are byte-copied and become ADDED manifest entries, retired files
    * drop out of the new snapshot (bytes stay for time travel), and
    * the published metadata advances one version. Same preconditions
    * as the Delta sync: verbatim export, same table, no schema epoch
    * drift. Returns the synced txlog version; no-ops when idle.
    */
  def syncSnapshotIceberg(name: String, dstDir: String): Long = {
    require(logBacked, "syncSnapshotIceberg requires the txlog backend")
    val dst = new Path(dstDir)
    val dstFs = dst.getFileSystem(hadoopConf)
    val manifestPath = new Path(dst, TimeseriesStore.ManifestName)
    require(dstFs.exists(manifestPath),
      s"$dstDir carries no manifest — exportSnapshotIceberg first, then sync")
    val in = dstFs.open(manifestPath)
    val node = try TimeseriesStore.manifestMapper.readTree(
      new java.io.InputStreamReader(in, "UTF-8")) finally in.close()
    require(node.get("table").asText() == name,
      s"$dstDir was exported from '${node.get("table").asText()}', not '$name'")
    require(node.get("mode").asText() == "verbatim",
      s"$dstDir is an aligned (rewritten) export; sync needs verbatim — re-export")
    val prevV = node.get("version").asLong()
    val prevFiles = {
      val fn = node.get("files")
      (0 until fn.size()).map(fn.get(_).asText()).toSet
    }
    val prevSchema = Option(node.get("schemaJson")).filterNot(_.isNull).map(_.asText())

    val log = txLog(name)
    val v = log.latestVersion()
    if (v == prevV) return v
    require(v > prevV, s"table '$name' is at version $v but $dstDir was " +
      s"exported at $prevV — a newer tree cannot sync backwards")
    val adds = log.snapshot(Some(v))
    val schemas = log.schemaHistory(Some(v))
    // schema drift since the export: ADD-COLUMN-only evolution syncs —
    // Iceberg's own evolution semantics make the mixed-epoch tree
    // readable (old files lack the new column; readers null-fill via
    // the name mapping, and appendSnapshot publishes a new schema-id
    // so pinned snapshots keep their epoch) — while type changes or
    // drops refuse: the verbatim-copied parquet cannot satisfy a
    // widened read
    val schemaChanged = schemas.lastOption != prevSchema
    val newDataSchema: Option[StructType] =
      if (!schemaChanged) None
      else {
        val prevSt = prevSchema.map(s =>
          DataType.fromJson(s).asInstanceOf[StructType])
        val newSt = schemas.lastOption.map(s =>
          DataType.fromJson(s).asInstanceOf[StructType])
        require(prevSt.isDefined && newSt.isDefined,
          s"schema of '$name' changed since the export and one side is " +
            "unreadable; re-export")
        val newByName = newSt.get.fields.map(f => f.name -> f.dataType).toMap
        val bad = prevSt.get.fields.filterNot(f =>
          newByName.get(f.name).contains(f.dataType))
        require(bad.isEmpty,
          s"schema of '$name' changed beyond column adds since the export " +
            s"(${bad.map(_.name).mkString(", ")}); re-export (a type change " +
            "cannot be satisfied by the verbatim-copied parquet)")
        newSt
      }

    val newFiles = adds.filterNot(a => prevFiles(a.path))
    val goneFiles = (prevFiles -- adds.map(_.path)).toSeq.sorted
    val f = fs(url)
    val root = new Path(featurePath(name))
    newFiles.foreach { a =>
      val to = new Path(dst, a.path)
      if (!dstFs.exists(to.getParent)) dstFs.mkdirs(to.getParent)
      org.apache.hadoop.fs.FileUtil.copy(
        f, new Path(root, a.path), dstFs, to, false, hadoopConf)
    }
    IcebergBridge.appendSnapshot(
      spark, dstDir, newFiles.map(_.path), goneFiles, hadoopConf,
      newDataSchema = newDataSchema)

    val manifest = Map[String, Any](
      "table" -> name, "version" -> v, "mode" -> "verbatim",
      "files" -> adds.map(_.path),
      "rows" -> adds.flatMap(_.nrec).sum,
      "schemaJson" -> schemas.lastOption.orNull)
    val out = dstFs.create(manifestPath, true)
    try out.write(TimeseriesStore.manifestMapper.writeValueAsBytes(manifest))
    finally out.close()
    v
  }

  /** Incrementally publish txlog commits SINCE the last export/sync as
    * ONE new Delta commit on an [[exportSnapshotDelta]] tree: new
    * snapshot files are byte-copied (at object-store scale:
    * server-side copies, zero compute) and become `add` actions with
    * per-file stats; files no longer live become `remove` tombstones —
    * their bytes stay, so Delta readers pinned to older versions keep
    * working. This is the continuous-sync story the full re-export
    * lacks: a daily sync of a 100 TB table moves only the day's delta,
    * never the table, and compaction/DELETE rewrites flow through as
    * plain add/remove pairs. Every `checkpointEvery`-th Delta commit
    * also writes a protocol parquet checkpoint so open-the-table stays
    * O(1) files read as the sync history grows. No-ops (returns the
    * current version) when the table hasn't moved. Requires the export
    * to be verbatim (single schema epoch) and the schema unchanged —
    * evolved tables re-export, because mixing physical epochs in one
    * plain-parquet tree would hand external readers a schema merge the
    * format doesn't promise.
    */
  def syncSnapshotDelta(name: String, dstDir: String, checkpointEvery: Int = 10): Long = {
    require(logBacked, "syncSnapshotDelta requires the txlog backend")
    val dst = new Path(dstDir)
    val dstFs = dst.getFileSystem(hadoopConf)
    val manifestPath = new Path(dst, TimeseriesStore.ManifestName)
    require(dstFs.exists(manifestPath),
      s"$dstDir carries no manifest — exportSnapshotDelta first, then sync")
    val in = dstFs.open(manifestPath)
    val node = try TimeseriesStore.manifestMapper.readTree(
      new java.io.InputStreamReader(in, "UTF-8")) finally in.close()
    require(node.get("table").asText() == name,
      s"$dstDir was exported from '${node.get("table").asText()}', not '$name'")
    require(node.get("mode").asText() == "verbatim",
      s"$dstDir is an aligned (rewritten) export; sync needs verbatim — re-export")
    val prevV = node.get("version").asLong()
    val prevFiles = {
      val fn = node.get("files")
      (0 until fn.size()).map(fn.get(_).asText()).toSet
    }
    val prevSchema = Option(node.get("schemaJson")).filterNot(_.isNull).map(_.asText())

    val log = txLog(name)
    val v = log.latestVersion()
    if (v == prevV) return v
    require(v > prevV, s"table '$name' is at version $v but $dstDir was " +
      s"exported at $prevV — a newer tree cannot sync backwards")
    val adds = log.snapshot(Some(v))
    val schemas = log.schemaHistory(Some(v))
    require(schemas.lastOption == prevSchema,
      s"schema of '$name' changed since the export; re-export (sync " +
        "cannot mix physical schema epochs in a plain-parquet tree)")
    require(adds.map(_.sv.getOrElse(0L)).distinct.size <= 1,
      s"snapshot of '$name' spans schema epochs; re-export aligned")

    val newFiles = adds.filterNot(a => prevFiles(a.path))
    val goneFiles = (prevFiles -- adds.map(_.path)).toSeq.sorted
    val f = fs(url)
    val root = new Path(featurePath(name))
    newFiles.foreach { a =>
      val to = new Path(dst, a.path)
      if (!dstFs.exists(to.getParent)) dstFs.mkdirs(to.getParent)
      org.apache.hadoop.fs.FileUtil.copy(
        f, new Path(root, a.path), dstFs, to, false, hadoopConf)
    }
    val deltaV = DeltaBridge.appendCommit(
      spark, dstDir, newFiles.map(_.path), goneFiles, hadoopConf)

    val manifest = Map[String, Any](
      "table" -> name, "version" -> v, "mode" -> "verbatim",
      "files" -> adds.map(_.path),
      "rows" -> adds.flatMap(_.nrec).sum,
      "schemaJson" -> schemas.lastOption.orNull)
    val out = dstFs.create(manifestPath, true)
    try out.write(TimeseriesStore.manifestMapper.writeValueAsBytes(manifest))
    finally out.close()

    if (checkpointEvery > 0 && deltaV % checkpointEvery == 0)
      DeltaBridge.writeCheckpoint(spark, dstDir, hadoopConf)
    v
  }

  /** Import an [[exportSnapshot]] tree (or any plain hive-partitioned
    * `partition=<p>/` parquet tree) as feature `name`: ONE atomic
    * commit containing every staged file, declaring the manifest's
    * schema when present (an aligned export re-declares its evolved
    * columns; a bare tree infers). The inverse bridge: a warehouse
    * handed around as plain parquet re-enters log management without
    * a row of rewrite beyond the staging copy. Returns the committed
    * version.
    */
  def importSnapshot(name: String, srcDir: String): Long = {
    require(logBacked, "importSnapshot requires the txlog backend")
    require(!exists(name) || txLog(name).latestVersion() < 0,
      s"feature '$name' already has commits; import into a fresh name")
    val src = new Path(srcDir)
    val srcFs = src.getFileSystem(hadoopConf)
    val manifestPath = new Path(src, TimeseriesStore.ManifestName)
    val schemaJson: Option[String] =
      if (srcFs.exists(manifestPath)) {
        val in = srcFs.open(manifestPath)
        val node = try TimeseriesStore.manifestMapper.readTree(
          new java.io.InputStreamReader(in, "UTF-8")) finally in.close()
        Option(node.get("schemaJson")).filterNot(_.isNull).map(_.asText())
      } else None
    // a tree carrying table-format metadata imports THROUGH it (only
    // live files, partition values from the log/manifests) — the
    // return leg for exportSnapshotDelta/-Iceberg trees and for tables
    // other format writers produced, as long as they carry the store's
    // `partition` column. Delta wins when both are present (it is the
    // bridge's own sync format and always current on exported trees).
    val df =
      if (srcFs.exists(new Path(src, "_delta_log")))
        DeltaBridge.read(spark, srcDir, hadoopConf)
      else if (srcFs.exists(new Path(src, "metadata/version-hint.text")))
        IcebergBridge.read(spark, srcDir, hadoopConf)
      else spark.read.options(storageOptions)
        .option("basePath", srcDir).parquet(srcDir)
    require(df.columns.contains("partition"),
      s"$srcDir is not a hive-partitioned export (no partition= directories)")
    val log = txLog(name)
    val adds = stageInstall(log, name,
      df.withColumn("partition", col("partition").cast(StringType)))
      .map(_.copy(sv = Some(0L)))
    require(adds.nonEmpty, s"no rows found under $srcDir")
    log.commit(adds, schema = schemaJson.orElse(Some(structJson(
      df.drop("partition")))))
  }

}

object TimeseriesStore {

  /** Manifest file of an exported snapshot — underscore-prefixed so
    * parquet directory listings (Spark, Hadoop globs) skip it. */
  val ManifestName = "_graft_manifest.json"

  private[store] val manifestMapper =
    com.fasterxml.jackson.databind.json.JsonMapper.builder()
      .addModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
      .build()

  /** S3 envelope normalization, STATIC so the streaming feature sink
    * applies the exact same casts, extraneous-column rejection, and
    * partition derivation as the batch writer — two normalizers would
    * inevitably drift and a stream could write a layout the batch
    * reader rejects.
    */
  private[graft] def normalize(
      df: DataFrame,
      partitionStyle: String,
      allowedExtras: Set[String] = Set.empty): DataFrame = {
    val cols = df.columns.toSet
    require(cols.contains(TimeCol), s"DataFrame must contain a '$TimeCol' column")
    require(cols.contains(ValueCol), s"DataFrame must contain a '$ValueCol' column")
    val extraneous = cols -- Set(TimeCol, CreatedCol, ValueCol) -- allowedExtras
    require(extraneous.isEmpty, s"DataFrame contains extraneous columns: ${extraneous.mkString(", ")}")
    val withCreated =
      if (cols.contains(CreatedCol)) df.withColumn(CreatedCol, col(CreatedCol).cast(TimestampType))
      else df.withColumn(CreatedCol, current_timestamp())
    val partitionCol = partitionStyle match {
      case "date" => date_format(col(TimeCol), "yyyy-MM-dd")
      case "year" => year(col(TimeCol))
      case other  => throw new IllegalArgumentException(s"unknown partition style: $other")
    }
    // deterministic envelope order; extras (declared evolved columns,
    // present in this batch) ride between value and partition — the
    // write path's conformForWrite re-aligns to the declared order
    val extraCols = df.columns.filter(c => allowedExtras.contains(c)).toSeq
    withCreated
      .withColumn(TimeCol, col(TimeCol).cast(TimestampType))
      .withColumn("partition", partitionCol)
      .select((Seq(TimeCol, CreatedCol, ValueCol) ++ extraCols :+ "partition").map(col): _*)
  }
}
