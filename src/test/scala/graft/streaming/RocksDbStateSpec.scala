package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.queries.QueryLib

/** State-store-provider invariance: at 100 TB the production state
  * backend is RocksDB (`RocksDBStateStoreProvider`, in-box since Spark
  * 3.2) — HDFSBackedStateStoreProvider keeps every version of every
  * key on the executor HEAP and is the known memory ceiling for large
  * stateful streams. These tests re-run two heavy stateful gates under
  * BOTH providers and require identical results: one built on
  * session_window aggregation with watermark eviction
  * (fs_stream_session_wm), one on custom flatMapGroupsWithState state
  * (fs_stream_dedup_lsh) — the two state shapes every other streaming
  * gate reduces to. Identical output certifies the queries encode no
  * provider-specific assumption (ordering, eviction timing, state
  * round-trip fidelity), so the RocksDB production configuration is a
  * pure conf swap.
  */
class RocksDbStateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def underRocksDb[A](body: => A): A = {
    spark.conf.set(ProviderKey, RocksDb)
    try body finally spark.conf.unset(ProviderKey)
  }

  test("fs_stream_session_wm (watermarked session_window) is provider-invariant") {
    val q = QueryLib.queries("fs_stream_session_wm")
    val hdfs = canon(q(spark, dir))
    val rocks = underRocksDb(canon(q(spark, dir)))
    assert(hdfs.nonEmpty)
    assert(rocks === hdfs)
  }

  test("fs_stream_dedup_lsh (flatMapGroupsWithState LSH state) is provider-invariant") {
    val q = QueryLib.queries("fs_stream_dedup_lsh")
    val hdfs = canon(q(spark, dir))
    val rocks = underRocksDb(canon(q(spark, dir)))
    assert(hdfs.nonEmpty)
    assert(rocks === hdfs)
  }
}
