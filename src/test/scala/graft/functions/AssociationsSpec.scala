package graft.functions

import graft.SparkSpec

class AssociationsSpec extends SparkSpec {
  import spark.implicits._

  test("coOccurrence counts each basket once, prunes by support, rates exactly") {
    // b3 lists p2 twice — one occurrence; N=4 baskets,
    // count(p1)=3, count(p2)=3 -> (p1,p2): co=3, conf=1.0,
    // lift = 3*4/(3*3) = 1.333333; the co=1 pairs die at minCo=2
    val lines = Seq(
      ("b1", "p1"), ("b1", "p2"), ("b1", "p3"),
      ("b2", "p1"), ("b2", "p2"),
      ("b3", "p1"), ("b3", "p2"), ("b3", "p2"),
      ("b4", "p3")).toDF("basket", "item")
    val out = Associations.coOccurrence(lines, "basket", "item", minCo = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(out.toSeq == Seq(("p1", "p2", 3L, 3L, 3L, 1.0, 1.333333)))
    intercept[IllegalArgumentException](
      Associations.coOccurrence(lines, "basket", "item", minCo = 0L))
  }
}
