package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measurement runner for the trained-ANN recall legs at an arbitrary
  * SF dir (the gate only exposes floor-pass bits), plus a
  * (nProbe, shortlist) sweep of the shipped rerank configuration —
  * the evidence behind the gate's parameter choice.
  * Usage: runMain graft.tools.AnnProbe /root/testdata/sf0.1 [sweep]
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .appName("annprobe").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.length > 1 && args(1) == "sweep") sweep(spark, dir)
    else {
      val (ivf, pq, ivfpq, rerank, total) =
        graft.queries.QueryLib.annTrainedRecalls(spark, dir)
      println(f"[annprobe] dir=$dir ivf=$ivf%.3f pq=$pq%.3f ivfpq=$ivfpq%.3f rerank=$rerank%.3f total=$total")
    }
    spark.stop()
  }

  /** Replicates annTrainedRecalls' shared setup (same sample, same
    * Lloyd parameters, same PQ training) and sweeps the shipped
    * rerank leg's (nProbe, shortlist); also prints the probe CEILING
    * (recall of "true neighbor's cell is probed") per nProbe — the
    * bound no shortlist width can beat.
    */
  private def sweep(spark: SparkSession, dir: String): Unit = {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val corpus = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("c_id"), col("embedding").cast("array<double>").as("cv"))
      .persist()
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").cast("array<double>").as("qv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("s").desc, col("c_id"))
    val truth = corpus.crossJoin(broadcast(queries))
      .select(col("q_id"), col("c_id"),
        round(graft.plans.CosineSimilarity.cosineSim(col("qv"), col("cv")), 6).as("s"))
      .withColumn("r", row_number().over(w)).filter(col("r") <= 10)
      .select(col("q_id"), col("c_id")).persist()
    val total = truth.count()
    val sample = graft.functions.Lloyd.sampleVectors(corpus, "cv", maxSample = 4096)
    val centers = graft.functions.Lloyd.fit(
      sample, 16, seed = 42L, maxIter = 20, restarts = 8).toSeq
    val pqK = sys.env.getOrElse("ANN_PROBE_PQ_K", "64").toInt
    val pq = graft.functions.AnnPq.buildTrainedFromSample(
      sample, m = 16, k = pqK, seed = 42L, maxIter = 20)
    println(s"[sweep] pq m=16 k=$pqK")
    val ivfIndex0 = graft.functions.AnnIvf.withCenters(
      corpus.withColumnRenamed("cv", "emb"), "emb", centers)
    val encodedAll = ivfIndex0.assigned.select(
      col("c_id"), col("cell"), col("emb"),
      graft.functions.AnnPq.encodeExpr(pq, col("emb")).as("code")).persist()
    val ivfIndex = ivfIndex0.copy(assigned = encodedAll)
    for (nProbe <- Seq(8, 12, 14, 16)) {
      // probe ceiling: truth pair recall where the true neighbor's
      // assigned cell is among the query's probed cells
      val probed = queries.select(col("q_id"),
        explode(graft.functions.AnnIvf.probeCells(ivfIndex, col("qv"), nProbe)).as("cell"))
      val ceiling = truth
        .join(encodedAll.select(col("c_id"), col("cell")), Seq("c_id"))
        .join(probed, Seq("q_id", "cell"), "left_semi")
        .count().toDouble / total
      println(f"[sweep] nProbe=$nProbe%2d ceiling=$ceiling%.3f")
      for (shortlist <- Seq(50, 100, 200, 400)) {
        val got = graft.functions.AnnIvfPq.queryRerank(ivfIndex, pq,
            encodedAll.select(col("c_id"), col("cell"), col("code")),
            encodedAll.select(col("c_id"), col("emb")),
            queries.withColumnRenamed("qv", "emb"),
            qIdCol = "q_id", embCol = "emb", cIdCol = "c_id", codeCol = "code",
            topK = 10, shortlist = shortlist, nProbe = nProbe)
          .select(col("q_id"), col("c_id"))
        val r = truth.join(got, Seq("q_id", "c_id"), "left_semi").count().toDouble / total
        println(f"[sweep] nProbe=$nProbe%2d shortlist=$shortlist%4d rerank_recall=$r%.3f")
      }
    }
    corpus.unpersist(); truth.unpersist(); encodedAll.unpersist()
  }
}
