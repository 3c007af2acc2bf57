package graft.functions

import graft.SparkSpec

class MlPrepSpec extends SparkSpec {
  import spark.implicits._

  test("covarianceMatrix matches the hand-computed population covariances") {
    // x = 1,2,3 ; y = 2x -> var(x) = 2/3, cov(x,y) = 4/3, var(y) = 8/3
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0)).toDF("x", "y")
    val out = MlPrep.covarianceMatrix(df, Seq("x", "y"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out(("x", "x")) == 0.666667)
    assert(out(("x", "y")) == 1.333333)
    assert(out(("y", "y")) == 2.666667)
    assert(out.size == 3) // unordered pairs incl. the diagonal, no (y, x) twin
  }

  test("covarianceMatrix is one aggregation pass however many pairs") {
    val df = Seq((1.0, 2.0, 3.0), (4.0, 5.0, 6.0)).toDF("a", "b", "c")
    val lp = MlPrep.covarianceMatrix(df, Seq("a", "b", "c"))
      .queryExecution.optimizedPlan.toString
    val aggs = "Aggregate".r.findAllIn(lp).size
    assert(aggs == 1, s"k columns must cost ONE scan + ONE reduce, got $aggs:\n$lp")
    intercept[IllegalArgumentException](MlPrep.covarianceMatrix(df, Seq("a")))
  }
}
