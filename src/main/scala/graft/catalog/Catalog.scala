package graft.catalog

import com.fasterxml.jackson.databind.json.JsonMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Metadata catalog: namespaces + features with versioning, mirroring the
  * reference's SQLAlchemy model (`/root/reference/bytehub/_model.py`) —
  * but as a small JSON document on any Hadoop-reachable filesystem.
  * This is bookkeeping, not dataflow: catalog CRUD never launches a
  * Spark job, so FeatureStore metadata calls stay O(ms) regardless of
  * data scale.
  */

/** A transform: how a virtual feature computes its data from others
  * (_model.py:133,186-228). Two portable kinds replace cloudpickle:
  *  - "sql":      a Spark SQL expression over the arg feature columns
  *  - "registry": a key into a session-registered DataFrame => DataFrame
  */
case class TransformSpec(kind: String, body: String, args: Seq[String])

case class Namespace(
    name: String,
    url: String,
    description: String = "",
    storageOptions: Map[String, String] = Map.empty,
    backend: String = "spark",
    meta: Map[String, String] = Map.empty,
    version: Int = 1)

case class Feature(
    namespace: String,
    name: String,
    description: String = "",
    partition: String = "date", // "date" | "year" (_model.py:19)
    serialized: Boolean = false,
    transform: Option[TransformSpec] = None,
    valueType: Option[String] = None, // Spark DataType JSON, pinned at first write
    meta: Map[String, String] = Map.empty,
    version: Int = 1) {
  def fullName: String = s"$namespace/$name"
}

case class CatalogState(
    namespaces: Seq[Namespace] = Seq.empty,
    features: Seq[Feature] = Seq.empty,
    formatVersion: Int = Catalog.CurrentFormatVersion)

/** The catalog verbs `FeatureStore` needs, factored so metadata can live
  * locally (`Catalog`: a JSON document on any Hadoop filesystem) or
  * remotely (`CloudCatalog`: REST + bearer token, the reference's hosted
  * mode, cloud.py:22-361) while the Spark compute path stays identical —
  * the reference's cloud store likewise only swaps the metadata client
  * and keeps the data backends local (cloud.py:176-181).
  */
trait CatalogApi {
  def listNamespaces(regex: Option[String] = None): Seq[Namespace]
  def getNamespace(name: String): Option[Namespace]
  def createNamespace(ns: Namespace): Unit
  def updateNamespace(
      name: String,
      description: Option[String] = None,
      meta: Map[String, Option[String]] = Map.empty,
      storageOptions: Option[Map[String, String]] = None): Unit
  def deleteNamespace(name: String): Unit
  def listFeatures(
      namespace: Option[String] = None,
      regex: Option[String] = None): Seq[Feature]
  def getFeature(namespace: String, name: String): Option[Feature]
  def createFeature(f: Feature): Unit
  def updateFeature(
      namespace: String,
      name: String,
      description: Option[String] = None,
      meta: Map[String, Option[String]] = Map.empty,
      transform: Option[TransformSpec] = None,
      valueType: Option[String] = None): Unit
  def deleteFeature(namespace: String, name: String): Unit
  def cloneFeature(srcNs: String, srcName: String, dstNs: String, dstName: String): Feature
  private[graft] def pinValueType(namespace: String, name: String, dtJson: String): Unit

  /** Register many features as one metadata transaction. The default
    * loops (correct everywhere, including over HTTP); the local catalog
    * overrides it with a single read-modify-write — registering n
    * features into a document catalog is otherwise O(n²) bytes
    * (every create re-persists the whole document), which is the cost
    * that bites when a training pipeline registers thousands of
    * features in one deployment step.
    */
  def createFeatures(fs: Seq[Feature]): Unit = fs.foreach(createFeature)
}

object Catalog {
  /** On-disk catalog format version (the reference version-stamps its
    * metadata DB and migrates old layouts, _upgrade.py:12-47). History:
    *  - 1: the unstamped original — no formatVersion field;
    *  - 2: identical structure plus the stamp itself.
    * A catalog from a NEWER library refuses to load (fields this build
    * doesn't know could be silently dropped on the next persist); an
    * OLDER one is migrated stepwise and rewritten in place on open.
    */
  val CurrentFormatVersion = 2

  /** Stepwise migrations: key v upgrades a version-v JSON document to
    * v+1. Each step edits the raw tree, so a future field rename can be
    * expressed here without the case classes ever knowing old spellings.
    */
  private[catalog] val migrations:
      Map[Int, com.fasterxml.jackson.databind.node.ObjectNode =>
        com.fasterxml.jackson.databind.node.ObjectNode] = Map(
    1 -> (tree => tree) // v1 -> v2: structure unchanged, stamp added
  )
  /** Identity charset from _model.py:18,28-32. */
  val NamePattern = "^[a-zA-Z0-9.#_-]+$".r

  // One lock OBJECT per catalog path, process-wide: the read-modify-
  // write in `mutate` must serialize across every Catalog INSTANCE on
  // the same file (two FeatureStores in one JVM would otherwise both
  // load base version v, apply different creates, and the second
  // persist silently drops the first's entry). Cross-process conflicts
  // remain out of scope (the reference delegates those to SQL).
  private val pathLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[catalog] def lockFor(key: String): Object =
    pathLocks.computeIfAbsent(key, _ => new Object)

  def validName(s: String): Boolean = NamePattern.matches(s)

  /** "ns/name" split on the FIRST '/' (_base.py:8-14). */
  def parseName(full: String, namespace: Option[String] = None): (String, String) =
    full.indexOf('/') match {
      case -1 =>
        (namespace.getOrElse(throw new IllegalArgumentException(
          s"feature name '$full' has no namespace and none was given")), full)
      case i => (full.substring(0, i), full.substring(i + 1))
    }
}

class Catalog(location: String, hadoopConf: Configuration = new Configuration())
    extends CatalogApi {
  import Catalog._

  private val mapper = JsonMapper.builder().addModule(DefaultScalaModule).build()
  private val path = new Path(location)
  private val catLock = Catalog.lockFor(path.toUri.toString)
  private def fs = path.getFileSystem(hadoopConf)

  private var state: CatalogState = catLock.synchronized {
    // Upgrade-on-OPEN, and only on open: a legacy-format file is
    // rewritten at the current format exactly once, from the
    // constructor under the path lock. Read paths (fresh()) must never
    // write — a reader persisting its freshly-migrated copy could
    // clobber a concurrent writer's just-committed mutation with the
    // older tree it had parsed (read paths re-migrate a legacy file
    // in memory instead, which only matters if one appears mid-session).
    // The rewrite re-validates the (mtime, length) stamp captured just
    // before the read: the JVM-local path lock can't see OTHER
    // processes, and persisting the parsed tree over a file that moved
    // since we read it would silently revert the foreign commit —
    // including entries unrelated to the migration. On mismatch the
    // rewrite is skipped; the file stays legacy-format on disk (reads
    // keep migrating it in memory) until the next mutate() persists it
    // at the current version through the read-modify-write path.
    // The stamp NARROWS the cross-process window (to check->persist,
    // and to the filesystem's mtime granularity) rather than closing
    // it — closing it needs a lock file or CAS rename, which the
    // documented cross-process single-writer assumption doesn't buy;
    // within that assumption the one legacy-upgrade write is safe.
    val stampAtLoad = currentStamp()
    val (st, onDisk) = loadStateVersioned()
    if (onDisk < CurrentFormatVersion && fs.exists(path)
        && currentStamp() == stampAtLoad) persistState(st)
    st
  }
  private var loadedStamp: Option[(Long, Long)] = currentStamp()
  private var inMutation: Boolean = false

  private def loadState(): CatalogState = loadStateVersioned()._1

  /** Parsed state plus the format version found ON DISK (migrations
    * applied in memory; persisting is the caller's decision).
    */
  private def loadStateVersioned(): (CatalogState, Int) =
    if (!fs.exists(path)) (CatalogState(), CurrentFormatVersion)
    else {
      val in = fs.open(path)
      val tree = try mapper.readTree(in: java.io.InputStream) finally in.close()
      val obj = tree.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      // the stamp is read off the raw tree, NOT the case class: Jackson
      // fills a missing Int with 0, so legacy unstamped files must be
      // recognized before binding (absent field = format 1)
      val onDisk = Option(obj.get("formatVersion")).map(_.asInt).getOrElse(1)
      if (onDisk > CurrentFormatVersion)
        throw new IllegalStateException(
          s"catalog $path has format version $onDisk, newer than this " +
            s"library's $CurrentFormatVersion — refusing to load (a persist " +
            "would silently drop fields this build does not know); upgrade " +
            "the library instead")
      val migrated = (onDisk until CurrentFormatVersion).foldLeft(obj) { (t, v) =>
        Catalog.migrations.getOrElse(v, throw new IllegalStateException(
          s"catalog $path: no migration from format version $v"))(t)
      }
      (mapper.treeToValue(migrated, classOf[CatalogState])
        .copy(formatVersion = CurrentFormatVersion), onDisk)
    }

  private def currentStamp(): Option[(Long, Long)] =
    if (!fs.exists(path)) None
    else {
      val st = fs.getFileStatus(path)
      Some((st.getModificationTime, st.getLen))
    }

  /** Read freshness: every read op goes through here, reloading the
    * persisted state whenever the file's (mtime, length) stamp moved —
    * so a second Catalog/FeatureStore on the same file sees prior
    * creates WITHOUT having to mutate first (the two-instance read
    * contract). The stamp is taken BEFORE the load, so a concurrent
    * write between stamp and load at worst causes one extra reload,
    * never a stale serve. No reload happens mid-mutation: `mutate`
    * already re-read under the lock, and swapping the state out from
    * under an in-flight read-modify-write would drop its edits.
    */
  private def fresh(): CatalogState = catLock.synchronized {
    if (!inMutation) {
      val stamp = currentStamp()
      if (stamp != loadedStamp) {
        loadedStamp = stamp
        state = loadState()
      }
    }
    state
  }

  /** Concurrency contract: each mutation re-reads the persisted state
    * under the lock before applying its change (read-modify-write), so
    * two FeatureStore instances on one catalog file no longer clobber
    * each other's unrelated entries; and the write goes to a temp file
    * followed by a rename, so a crash mid-write leaves either the old
    * or the new catalog, never a torn file. Single-writer-per-mutation
    * is still assumed across PROCESSES for same-entry conflicts (the
    * reference delegates this to a transactional SQL DB, core.py:38-43).
    */
  private def mutate[A](f: => A): A = catLock.synchronized {
    state = loadState()
    inMutation = true
    try {
      val result = f
      persist()
      loadedStamp = currentStamp()
      result
    } catch {
      case e: Throwable =>
        // un-apply the in-memory mutation: a failed validation or a
        // persist that died mid-rename must not leave phantom entries
        // that reads would serve while disk disagrees
        state = loadState()
        loadedStamp = currentStamp()
        throw e
    } finally inMutation = false
  }

  private def persist(): Unit = persistState(state)

  private def persistState(st: CatalogState): Unit = {
    val tmp = new Path(path.getParent, s".${path.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(st))
    finally out.close()
    // overwrite-rename with the strongest primitive the scheme offers:
    // POSIX atomic move for local files, FileContext overwrite-rename
    // for HDFS-like stores, and a (windowed) delete+rename fallback for
    // connectors with no AbstractFileSystem binding
    val scheme = Option(path.toUri.getScheme).getOrElse("file")
    if (scheme == "file") {
      val local = new java.io.File(path.toUri.getPath)
      java.nio.file.Files.move(
        new java.io.File(tmp.toUri.getPath).toPath, local.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(path.toUri, hadoopConf)
        fc.rename(tmp, path, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch {
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          if (fs.exists(path)) fs.delete(path, false)
          if (!fs.rename(tmp, path))
            throw new java.io.IOException(s"catalog persist failed: rename $tmp -> $path")
      }
    }
  }

  // ------------------------------------------------------------ namespaces

  override def listNamespaces(regex: Option[String]): Seq[Namespace] = {
    val r = regex.map(_.r)
    fresh().namespaces.filter(ns => r.forall(_.findFirstIn(ns.name).isDefined))
  }

  override def getNamespace(name: String): Option[Namespace] =
    fresh().namespaces.find(_.name == name)

  override def createNamespace(ns: Namespace): Unit = mutate {
    require(validName(ns.name), s"invalid namespace name: '${ns.name}'")
    require(ns.url.nonEmpty, "namespace url is mandatory") // core.py:129-135
    require(getNamespace(ns.name).isEmpty, s"namespace '${ns.name}' already exists")
    // url is unique like the reference's column (_model.py:86): two
    // namespaces sharing a directory would cross-GC each other's
    // features via cleanNamespace. Compared NORMALIZED — a trailing
    // slash or file:/-vs-file:/// spelling of the same directory must
    // not slip past the guard whose whole point is that hazard.
    def normUrl(u: String): String = new Path(u).toUri.toString.stripSuffix("/")
    val clash = state.namespaces.find(o => normUrl(o.url) == normUrl(ns.url))
    require(clash.isEmpty,
      s"namespace url '${ns.url}' is already used by namespace " +
        s"'${clash.map(_.name).getOrElse("")}'")
    state = state.copy(namespaces = state.namespaces :+ ns)
  }

  /** Meta merge with None-delete semantics + version bump
    * (_model.py:41-45,58-68). `storageOptions`, when provided, REPLACES
    * the stored map wholesale — the reference's update_from_dict treats
    * every non-meta field as a plain assignment (_model.py:68-70,
    * core.py:136-142), which is what credential rotation needs.
    */
  override def updateNamespace(
      name: String,
      description: Option[String],
      meta: Map[String, Option[String]],
      storageOptions: Option[Map[String, String]]): Unit = mutate {
    val ns = getNamespace(name).getOrElse(
      throw new graft.api.MissingFeatureException(s"namespace '$name' does not exist"))
    val merged = mergeMeta(ns.meta, meta)
    val updated = ns.copy(
      description = description.getOrElse(ns.description),
      meta = merged,
      storageOptions = storageOptions.getOrElse(ns.storageOptions),
      version = ns.version + 1)
    state = state.copy(namespaces = state.namespaces.map(n => if (n.name == name) updated else n))
  }

  override def deleteNamespace(name: String): Unit = mutate {
    require(getNamespace(name).isDefined, s"namespace '$name' does not exist")
    // refuse if non-empty (core.py:144-149)
    require(listFeatures(namespace = Some(name)).isEmpty,
      s"namespace '$name' still contains features")
    state = state.copy(namespaces = state.namespaces.filterNot(_.name == name))
  }

  // ------------------------------------------------------------- features

  override def listFeatures(
      namespace: Option[String],
      regex: Option[String]): Seq[Feature] = {
    val r = regex.map(_.r)
    fresh().features
      .filter(f => namespace.forall(_ == f.namespace))
      .filter(f => r.forall(_.findFirstIn(f.name).isDefined))
  }

  override def getFeature(namespace: String, name: String): Option[Feature] =
    fresh().features.find(f => f.namespace == namespace && f.name == name)

  override def createFeature(f: Feature): Unit = createFeatures(Seq(f))

  /** One read-modify-write for the whole batch: n creates cost one
    * document parse + one persist instead of n of each (the loop form
    * is O(n²) bytes on a document catalog). All-or-nothing like a SQL
    * transaction — any invalid entry rejects the batch before persist.
    */
  override def createFeatures(fs: Seq[Feature]): Unit = if (fs.nonEmpty) mutate {
    val dupIn = fs.groupBy(f => (f.namespace, f.name)).collectFirst {
      case (k, vs) if vs.size > 1 => k }
    require(dupIn.isEmpty, s"duplicate feature in batch: '${dupIn.get._1}/${dupIn.get._2}'")
    fs.foreach { f =>
      require(validName(f.name), s"invalid feature name: '${f.name}'")
      require(Set("date", "year").contains(f.partition),
        s"partition must be 'date' or 'year', got '${f.partition}'")
      require(getNamespace(f.namespace).isDefined,
        s"namespace '${f.namespace}' does not exist")
      require(getFeature(f.namespace, f.name).isEmpty,
        s"feature '${f.fullName}' already exists")
    }
    state = state.copy(features = state.features ++ fs)
  }

  override def updateFeature(
      namespace: String,
      name: String,
      description: Option[String],
      meta: Map[String, Option[String]],
      transform: Option[TransformSpec],
      valueType: Option[String]): Unit = mutate {
    val f = getFeature(namespace, name).getOrElse(
      throw new graft.api.MissingFeatureException(s"feature '$namespace/$name' does not exist"))
    val updated = f.copy(
      description = description.getOrElse(f.description),
      meta = mergeMeta(f.meta, meta),
      transform = transform.orElse(f.transform),
      valueType = valueType.orElse(f.valueType),
      version = f.version + 1)
    replaceFeature(updated)
  }

  /** Internal: pin the inferred value type at first write (the Spark
    * analogue of the reference's write-schema pinning, dask.py:66-69).
    */
  override private[graft] def pinValueType(namespace: String, name: String, dtJson: String): Unit =
    mutate {
      val f = getFeature(namespace, name).get
      replaceFeature(f.copy(valueType = Some(dtJson))) // no version bump: not a user edit
    }

  private def replaceFeature(updated: Feature): Unit =
    state = state.copy(features = state.features.map(f =>
      if (f.namespace == updated.namespace && f.name == updated.name) updated else f))

  override def deleteFeature(namespace: String, name: String): Unit = mutate {
    require(getFeature(namespace, name).isDefined,
      s"feature '$namespace/$name' does not exist")
    state = state.copy(features = state.features.filterNot(f =>
      f.namespace == namespace && f.name == name))
  }

  override def cloneFeature(srcNs: String, srcName: String, dstNs: String, dstName: String): Feature =
    mutate {
      val src = getFeature(srcNs, srcName).getOrElse(
        throw new graft.api.MissingFeatureException(s"feature '$srcNs/$srcName' does not exist"))
      require(validName(dstName), s"invalid feature name: '$dstName'")
      require(getNamespace(dstNs).isDefined, s"namespace '$dstNs' does not exist")
      require(getFeature(dstNs, dstName).isEmpty, s"feature '$dstNs/$dstName' already exists")
      val clone = src.copy(namespace = dstNs, name = dstName, version = 1)
      state = state.copy(features = state.features :+ clone)
      clone
    }

  private def mergeMeta(
      base: Map[String, String],
      patch: Map[String, Option[String]]): Map[String, String] =
    patch.foldLeft(base) {
      case (m, (k, Some(v))) => m + (k -> v)
      case (m, (k, None))    => m - k
    }
}
