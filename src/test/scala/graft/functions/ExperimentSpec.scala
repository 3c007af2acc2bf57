package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  test("assignVariant is deterministic, salt-independent, and roughly balanced") {
    val users = spark.range(0, 1000).toDF("u")
    val a = users.select(col("u"),
      Experiment.assignVariant(col("u"), "exp1").as("v1"),
      Experiment.assignVariant(col("u"), "exp1").as("v1b"),
      Experiment.assignVariant(col("u"), "exp2").as("v2"))
    // same salt -> identical assignment on every evaluation
    assert(a.filter(col("v1") =!= col("v1b")).count() == 0)
    val nControl = a.filter(col("v1") === "control").count()
    assert(nControl > 400 && nControl < 600, s"50/50 split off: $nControl/1000")
    // different salts assign independently: the arms must not coincide
    val agree = a.filter(col("v1") === col("v2")).count()
    assert(agree > 400 && agree < 600, s"salts correlated: $agree/1000 agree")
  }

  test("assignVariant hex cut widens the control share") {
    val users = spark.range(0, 2000).toDF("u")
    val quarter = users
      .filter(Experiment.assignVariant(col("u"), "e", "4") === "control").count()
    assert(quarter > 380 && quarter < 620, s"25% cut off: $quarter/2000")
  }

  test("cuped recovers theta exactly and adjusts means by hand-checked amounts") {
    // y = 2x exactly -> theta = 2.0 and the adjusted means collapse to
    // the GLOBAL mean of y: ybar_v - 2*(xbar_v - xbar) = 2*xbar.
    val rows = Seq(("control", 10L, 20L), ("control", 20L, 40L),
      ("treatment", 30L, 60L), ("treatment", 40L, 80L))
    val out = Experiment.cuped(rows.toDF("variant", "x", "y"), "variant", "x", "y")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(4)))
      .sortBy(_._1)
    // xbar = 25 -> global ybar = 50 for both arms after adjustment
    assert(out.toSeq == Seq(("control", 2L, 2.0, 50.0), ("treatment", 2L, 2.0, 50.0)))
  }

  test("welchT matches the hand-computed statistic on a tiny experiment") {
    // control {1, 3}: mean 2, var 2; treatment {4, 8}: mean 6, var 8.
    // se = sqrt(2/2 + 8/2) = sqrt(5); t = 4/sqrt(5) = 1.788854;
    // df = 25/(1/1 + 16/1) = 1.470588.
    val rows = Seq(("control", 1L), ("control", 3L),
      ("treatment", 4L), ("treatment", 8L))
    val out = Experiment.welchT(rows.toDF("variant", "y"), "variant", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(out.toSeq == Seq((2L, 2L, 2.0, 6.0, 4.0, 1.788854, 1.470588)))
  }
}
