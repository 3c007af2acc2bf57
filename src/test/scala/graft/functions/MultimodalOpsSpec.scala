package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docsAsBinary = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text").cast("binary").as("payload"))

  test("decodeImages: partition-parallel stub decode over binary payloads") {
    val out = MultimodalOps.decodeImages(docsAsBinary, "doc_id", "payload")
    val rows = out.orderBy("id").collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.width >= 1 && r.width <= 640 && r.height >= 1 && r.height <= 480))
    assert(rows.forall(r => r.meanLuma > 0)) // text bytes are never all-zero
    // deterministic: same payload -> same features
    val again = MultimodalOps.decodeImages(docsAsBinary, "doc_id", "payload")
      .orderBy("id").collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("sampleFrames fans out frame references without shuffling") {
    val frames = MultimodalOps.sampleFrames(docsAsBinary, "doc_id", "payload", stride = 2)
    val byDoc = frames.groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.nonEmpty && byDoc.values.forall(_ >= 1))
    // no Exchange in the plan: decode fan-out is a narrow map
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("resizeMeta rescales the metadata struct only") {
    val meta = MultimodalOps.decodeImages(docsAsBinary, "doc_id", "payload").toDF()
    val out = MultimodalOps.resizeMeta(meta, maxSide = 100).collect()
    assert(out.forall { r =>
      val ow = r.getAs[Int]("out_width"); val oh = r.getAs[Int]("out_height")
      ow <= 100 && oh <= 100 && ow >= 0 && oh >= 0
    })
  }
}
