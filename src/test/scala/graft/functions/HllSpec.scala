package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HllSpec extends SparkSpec {
  import spark.implicits._

  private def estimate(ids: Seq[Long]): Double = {
    val df = ids.map(i => ("g", i)).toDF("g", "id")
      .select(col("g"), concat(lit("t:"), col("id").cast("string")).as("hin"))
    Hll.registers(df, Seq("g"), col("hin"))
      .groupBy(col("g")).agg(sum(Hll.sumTerm("r")).as("s"))
      .select(Hll.rawEstimate(col("s"))).head.getDouble(0)
  }

  test("raw estimate lands within ~2/sqrt(m) of the true cardinality") {
    // raw HLL (no small-range correction) is biased high below ~3m;
    // test in the regime the estimator targets: n >> m = 256
    for (n <- Seq(2000, 20000)) {
      val est = estimate(1L to n.toLong)
      val err = math.abs(est - n) / n
      assert(err < 0.13, s"n=$n est=$est err=$err") // 2σ at m=256 is ~0.13
    }
  }

  test("duplicates don't move the registers") {
    val once = estimate(1L to 5000L)
    val thrice = estimate((1L to 5000L) ++ (1L to 5000L) ++ (1L to 5000L))
    assert(once === thrice)
  }

  test("register merge by max equals the sketch of the union") {
    val a = (1L to 3000L).map(i => ("x", i)).toDF("g", "id")
    val b = (2000L to 6000L).map(i => ("x", i)).toDF("g", "id")
    def regs(df: org.apache.spark.sql.DataFrame) =
      Hll.registers(df.select(col("g"),
        concat(lit("t:"), col("id").cast("string")).as("hin")), Seq("g"), col("hin"))
    val merged = regs(a).union(regs(b))
      .groupBy(col("g"), col("idx")).agg(max(col("r")).as("r"))
      .groupBy(col("g")).agg(sum(Hll.sumTerm("r")).as("s"))
      .select(Hll.rawEstimate(col("s"))).head.getDouble(0)
    val direct = regs(a.union(b))
      .groupBy(col("g")).agg(sum(Hll.sumTerm("r")).as("s"))
      .select(Hll.rawEstimate(col("s"))).head.getDouble(0)
    assert(merged === direct)
  }
}
