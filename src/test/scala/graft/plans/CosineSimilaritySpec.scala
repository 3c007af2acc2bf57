package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.SimilarityOps

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("matches the built-in zip_with/aggregate composition bit-for-bit") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.filter(col("vec_id") < 20).select(col("vec_id").as("ia"), col("v").as("va"))
    val b = e.filter(col("vec_id").between(20, 60)).select(col("vec_id").as("ib"), col("v").as("vb"))
    val both = a.crossJoin(b).select(
      SimilarityOps.cosine(col("va"), col("vb")).as("builtin"),
      CosineSimilarity.cosineSim(col("va"), col("vb")).as("native"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // exact equality
  }

  test("usable from SQL after registration; nulls propagate") {
    CosineSimilarity.register(spark)
    Seq((Seq(1.0, 0.0), Seq(0.0, 2.0)), (Seq(3.0, 4.0), Seq(3.0, 4.0)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val out = spark.sql("SELECT cosine_sim(a, b) AS c FROM vecs ORDER BY c").collect()
    assert(out(0).getDouble(0) == 0.0 && out(1).getDouble(0) == 1.0)
    val n = spark.sql("SELECT cosine_sim(a, CAST(NULL AS ARRAY<DOUBLE>)) FROM vecs").collect()
    assert(n.forall(_.isNullAt(0)))
    // builtin-composition parity: mismatched lengths and null ELEMENTS
    // are NULL, not a truncated/zero-padded number
    val edge = spark.sql(
      """SELECT cosine_sim(array(1.0d), array(1.0d, 5.0d)) AS mism,
        |       cosine_sim(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS nullel
        |""".stripMargin).collect().head
    assert(edge.isNullAt(0) && edge.isNullAt(1))
  }

  test("installs via SparkSessionExtensions") {
    import org.apache.spark.sql.SparkSession
    spark.sparkContext // ensure the shared context exists before detaching
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql("SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d))").collect()
      assert(r.head.getDouble(0) == 1.0)
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
