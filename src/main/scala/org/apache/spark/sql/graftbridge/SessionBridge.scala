package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession

/** `SparkSession.cloneSession()` is `private[sql]`; this minimal bridge
  * (same technique as [[ColumnBridge]]) re-exports it for scan-scoped
  * SQL-conf pinning.
  */
object SessionBridge {

  /** A full clone of `s` — runtime conf, registered functions, temp
    * views, session timezone — sharing the SparkContext and cache.
    *
    * Why a clone instead of set-then-restore on the caller's session:
    * `HadoopFsRelation` captures the session that CREATED it, and
    * `FileSourceScanExec` builds its readers from
    * `relation.sparkSession`'s conf at execution time (verified against
    * the Spark 4.1 bytecode), so a conf set on the clone rides the scan
    * wherever the resulting frame is later composed — while the
    * caller's session conf is never mutated, and a restore-before-action
    * race (the conf is read lazily, at first execution) cannot occur.
    */
  def cloneSession(s: SparkSession): SparkSession =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
}
