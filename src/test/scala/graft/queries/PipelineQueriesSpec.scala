package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the event-analytics and holdout-pipeline
  * queries, checked against an independent driver-side recomputation on
  * the sf0.001 testdata (1k events / 50 docs — collect-friendly). The
  * DuckDB gate proves Spark and the oracle agree; these prove both mean
  * what the operator is supposed to mean (the oracle mirrors the same
  * formulation, so a shared misformulation would pass the gate).
  */
class PipelineQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val GapUs = 1800000000L // 30 min

  private def q(name: String) = QueryLib.queries(name)(spark, dir)

  /** Exact event-time micros — Timestamp.getTime is millis and would
    * truncate the sub-millisecond components the 30-min gap compares.
    */
  private def micros(t: Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  test("q_sessionize partitions each user's events into >30min-separated runs") {
    val sessions = q("q_sessionize")
      .select("user_id", "session_idx", "n_events", "session_start", "session_end")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4)))

    val raw = graft.sources.Tables.table(spark, dir, "events")
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(micros)).toMap

    // independent recomputation: fold each user's sorted timestamps into
    // gap-delimited runs and compare (count, start, end, size) per run
    val expected = raw.flatMap { case (u, tss) =>
      val runs = tss.tail.foldLeft(Vector(Vector(tss.head))) { (acc, t) =>
        if (micros(t) - micros(acc.last.last) > GapUs) acc :+ Vector(t)
        else acc.init :+ (acc.last :+ t)
      }
      runs.zipWithIndex.map { case (run, i) =>
        (u, i + 1L, run.size.toLong, run.head, run.last)
      }
    }.toSet
    assert(sessions.toSet === expected)
    assert(sessions.map(_._3).sum === raw.values.map(_.size).sum)
  }

  test("q_funnel stages are strictly ordered and monotonically shrinking") {
    val rows = q("q_funnel").collect().map(r =>
      (r.getLong(0), r.getTimestamp(1),
        Option(r.getTimestamp(2)), Option(r.getTimestamp(3))))
    assert(rows.nonEmpty)
    rows.foreach { case (u, v, c, p) =>
      c.foreach(tc => assert(tc.after(v), s"user $u: t_click !> t_view"))
      (c, p) match {
        case (Some(tc), Some(tp)) => assert(tp.after(tc), s"user $u: t_purchase !> t_click")
        case (None, Some(_))      => fail(s"user $u purchased without a click stage")
        case _                    =>
      }
    }
    val (nV, nC, nP) = (rows.size, rows.count(_._3.isDefined), rows.count(_._4.isDefined))
    assert(nV >= nC && nC >= nP)
  }

  test("q_retention: offset-0 cell equals cohort size, later cells never exceed it") {
    val cells = q("q_retention").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(cells.forall(_._2 >= 0L))
    val atZero = cells.collect { case (cw, 0L, n) => cw -> n }.toMap
    cells.groupBy(_._1).foreach { case (cw, rows) =>
      val size = atZero.getOrElse(cw, fail(s"cohort $cw has no offset-0 cell"))
      rows.foreach { case (_, off, n) =>
        assert(n <= size, s"cohort $cw offset $off: $n users > cohort size $size")
      }
    }
  }

  test("doc_holdout is a pure function of doc_id, stable across corpus scale") {
    val small = q("doc_holdout").select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rerun = q("doc_holdout").select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(small === rerun)
    // growth stability: a doc keeps its split when the corpus around it
    // grows 10x — the property that makes hash splits reproducible
    val large = QueryLib.queries("doc_holdout")(spark, "/root/testdata/sf0.01")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    small.foreach { case (id, s) => assert(large(id) === s, s"doc $id flipped split") }
    assert(small.valuesIterator.toSet.subsetOf(Set("train", "eval")))
  }

  test("txt_contamination reports exactly the eval docs sharing a 5-gram with train") {
    val reported = q("txt_contamination").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val docs = graft.sources.Tables.table(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
    def isEval(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$id".getBytes("UTF-8"))
      f"${md(0) & 0xff}%02x" < "1a"
    }
    def grams(t: Seq[String]): Set[String] =
      t.sliding(5).filter(_.size == 5).map(_.mkString(" ")).toSet
    val trainGrams = docs.filterNot(d => isEval(d._1)).flatMap(d => grams(d._2)).toSet
    val expected = docs.filter(d => isEval(d._1))
      .map(d => d._1 -> (grams(d._2) & trainGrams).size.toLong)
      .filter(_._2 > 0L).toMap
    assert(reported === expected)
  }
}
