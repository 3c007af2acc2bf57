package graft.transform

import org.apache.spark.sql.DataFrame

/** JVM-GLOBAL registry of named `DataFrame => DataFrame` transforms —
  * one namespace per process, NOT per SparkSession: two sessions in one
  * JVM (parallel test suites, a shared long-running driver) share these
  * keys, and a re-register overwrites. Prefix keys per application when
  * cohabiting. It is the trusted-code replacement for the reference's
  * cloudpickled closures
  * (`/root/reference/bytehub/_utils.py:14-19`, `_model.py:145-165`).
  * Arbitrary pickled functions don't port to a JVM engine (and are a
  * security hole the reference itself gates behind `enable_transforms`,
  * cloud.py:37-53); a registry key stored in the catalog plus a function
  * registered at session start is the honest Scala analogue. SQL-expression
  * transforms (TransformSpec kind "sql") need no registration at all and
  * stay fully Catalyst-optimizable.
  *
  * Input contract: the wide DataFrame has columns `time, f0..fN` — the
  * transform's arg features in declaration order (mirroring the positional
  * pandas frame the reference passes, _model.py:224-225). Output must keep
  * `time` and produce a single `value` column.
  */
object TransformRegistry {
  private val fns = scala.collection.concurrent.TrieMap.empty[String, DataFrame => DataFrame]

  def register(key: String, fn: DataFrame => DataFrame): Unit = fns.put(key, fn)

  def get(key: String): DataFrame => DataFrame =
    fns.getOrElse(key, throw new NoSuchElementException(
      s"transform '$key' is not registered in this JVM"))

  def contains(key: String): Boolean = fns.contains(key)
}
