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
}
