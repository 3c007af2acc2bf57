package graft.functions

import graft.SparkSpec

class DataQualitySpec extends SparkSpec {
  import spark.implicits._
  import DataQuality._

  private val constraints = Seq(
    NotNull("v"), InRange("v", 0.0, 10.0), InSet("kind", Seq("a", "b")),
    Unique(Seq("id")))

  test("report counts each planted violation class exactly once") {
    val df = Seq(
      (1L, Some(1.0), "a"),   // clean
      (2L, None, "a"),        // null v
      (3L, Some(99.0), "b"),  // out of range
      (4L, Some(2.0), "zz"),  // out of domain
      (4L, Some(3.0), "a"),   // duplicate id
      (4L, Some(4.0), "b"))   // duplicate id again
      .toDF("id", "v", "kind")
    val r = report(df, constraints).collect().head
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("null_v") == 1L)
    assert(r.getAs[Long]("range_v") == 1L)
    assert(r.getAs[Long]("domain_kind") == 1L)
    assert(r.getAs[Long]("dup_id") == 2L) // three id=4 rows -> 2 excess
    assert(!passes(df, constraints))
  }

  test("a clean frame passes; nulls don't count against range or domain") {
    val clean = Seq((1L, Some(5.0), "a"), (2L, None, "b"))
      .toDF("id", "v", "kind")
    // null v violates NotNull but must NOT also count as a range breach
    val r = report(clean, constraints).collect().head
    assert(r.getAs[Long]("range_v") == 0L && r.getAs[Long]("domain_kind") == 0L)
    assert(passes(clean, Seq(InRange("v", 0.0, 10.0), Unique(Seq("id")))))
  }

  test("constraints compile into a single scan plus one agg per Unique") {
    val df = Seq((1L, Some(1.0), "a")).toDF("id", "v", "kind")
    val plan = report(df, constraints).queryExecution.optimizedPlan.toString
    // scalar constraints share ONE Aggregate; Unique adds its own two
    val aggs = "Aggregate".r.findAllIn(plan).size
    assert(aggs == 3, s"expected 3 Aggregate nodes (1 scalar + 2 unique), got $aggs:\n$plan")
  }

  test("MatchesRegex counts non-null mismatches; nulls are NotNull's business") {
    val df = Seq((1L, Some("ab12")), (2L, Some("xx")), (3L, None))
      .toDF("id", "code")
    val r = report(df, Seq(MatchesRegex("code", "^[a-z]{2}[0-9]{2}$"))).collect().head
    assert(r.getAs[Long]("regex_code") == 1L) // "xx" only; null skipped
  }

  test("ForeignKey counts orphans via an anti-join; null keys are skipped") {
    val facts = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, Some(99L)), (4L, None))
      .toDF("id", "custkey")
    val dim = Seq(10L, 20L, 30L).toDF("c_id")
    val r = report(facts, Seq(ForeignKey("custkey", dim, "c_id"))).collect().head
    assert(r.getAs[Long]("fk_custkey") == 1L) // 99 only; null skipped
  }

  test("suite emits one long-format row per declared expectation with pass flags") {
    val orders = Seq((1L, Some(5.0)), (2L, Some(99.0)), (2L, None)).toDF("id", "v")
    val dim = Seq(1L).toDF("k")
    val rows = suite(Seq(
        ("orders", orders, Seq(NotNull("v"), InRange("v", 0.0, 10.0),
          Unique(Seq("id")), ForeignKey("id", dim, "k"))),
        ("dim", dim, Seq(NotNull("k")))))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(rows.length == 5)
    val byKey = rows.map(t => (t._1, t._2) -> t).toMap
    assert(byKey(("orders", "not_null")) == ("orders", "not_null", "v", 1L, 3L, false))
    assert(byKey(("orders", "in_range")) == ("orders", "in_range", "v", 1L, 3L, false))
    assert(byKey(("orders", "unique")) == ("orders", "unique", "id", 1L, 3L, false))
    assert(byKey(("orders", "foreign_key")) == ("orders", "foreign_key", "id", 2L, 3L, false))
    assert(byKey(("dim", "not_null")) == ("dim", "not_null", "k", 0L, 1L, true))
  }
}
