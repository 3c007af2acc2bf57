package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** OPTIMIZE ZORDER on the txlog backend: rows unchanged, time travel
  * intact, and — the point — per-file value bounds tight enough that a
  * narrow value slice skips most files, where the append layout (time-
  * ranged files, values random within each) can skip none.
  */
class ZOrderStoreSpec extends SparkSpec {
  import spark.implicits._

  test("optimizeZorder: value skipping, unchanged rows, time travel") {
    val dir = tmpDir("graft-zorder")
    val st = new TimeseriesStore(spark, s"$dir/tx", backend = "txlog")
    // 30 days x 400 rows, values uniform in [0, 500) — each append file
    // spans a narrow time range but the FULL value range
    val rnd = new java.util.Random(7)
    val rows = for (d <- 0 until 30; i <- 0 until 400) yield (
      new java.sql.Timestamp(ts("2021-03-01").getTime + d * 86400000L + i * 60000L),
      math.rint(rnd.nextDouble() * 50000) / 100.0)
    rows.grouped(4000).foreach { b =>
      st.save("zf", b.toSeq.toDF("time", "value"))
    }
    val preVersion = st.tableVersion("zf")
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("time"), col("value"))
        .as[(java.sql.Timestamp, Double)].collect().sortBy(r => (r._1.getTime, r._2)).toSeq
    val before = key(st.read("zf"))
    assert(before.size === 12000)

    // append layout: no value stats — a value slice can skip NOTHING,
    // but the read is still correct (graceful degradation)
    val preLive = st.candidateFilesForValueRange("zf", 100.0, 110.0)
    assert(preLive.forall(_.vmin.isEmpty))
    val expectSlice = before.filter(r => r._2 >= 100.0 && r._2 <= 110.0)
    assert(key(st.readValueRange("zf", 100.0, 110.0)) === expectSlice)

    // tiny target bytes => several value-banded files per partition
    val retired = st.optimizeZorder("zf", bits = 16, targetBytes = 4096)
    assert(retired > 0)

    // rows unchanged by the rewrite (no dedup, exact multiset)
    assert(key(st.read("zf")) === before)
    // pre-rewrite version still readable (old files live until vacuum)
    assert(key(st.read("zf", asOfVersion = Some(preVersion))) === before)

    // value skipping: the 2% value slice must drop most files
    val live = st.candidateFilesForValueRange("zf", 0.0, 500.0)
    assert(live.forall(a => a.vmin.nonEmpty && a.vmax.nonEmpty))
    val sliced = st.candidateFilesForValueRange("zf", 100.0, 110.0)
    assert(sliced.size.toDouble / live.size < 0.55,
      s"value slice hit ${sliced.size} of ${live.size} files")
    // and the skipped read is still exactly right
    assert(key(st.readValueRange("zf", 100.0, 110.0)) === expectSlice)

    // time bounds survive the rewrite: a 3-day window prunes files too
    val tSliced = st.candidateFilesForValueRange("zf", 0.0, 500.0,
      from = Some(ts("2021-03-05")), to = Some(ts("2021-03-07")))
    assert(tSliced.size < live.size / 2,
      s"time slice hit ${tSliced.size} of ${live.size} files")
    // combined time+value pruning composes
    val both = st.candidateFilesForValueRange("zf", 100.0, 110.0,
      from = Some(ts("2021-03-05")), to = Some(ts("2021-03-07")))
    assert(both.size <= math.min(sliced.size, tSliced.size))
  }
}
