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

  test("codec seam: swapping the stub for a 'real' decoder changes no plan shape") {
    // a stand-in for the production JNI/opencv decode — different math,
    // same (bytes in, features out) signature through the seam
    val realish: (Long, Array[Byte]) => MultimodalOps.ImageFeatures =
      (id, bytes) => MultimodalOps.ImageFeatures(
        id, 224, 224, 3,
        if (bytes.isEmpty) 0.0 else bytes.map(b => (b & 0xff) * 0.299).sum / bytes.length)
    val stubbed = MultimodalOps.decodeImages(docsAsBinary, "doc_id", "payload")
    val injected = MultimodalOps.decodeImages(docsAsBinary, "doc_id", "payload", realish)
    // Catalyst sees both codecs as the same opaque closure inside a
    // narrow MapPartitions: normalized for expression ids and closure
    // identities, the physical plans must be IDENTICAL — proving a
    // production swap-in changes schema, partitioning, and shuffle
    // structure not at all
    def normalized(ds: org.apache.spark.sql.Dataset[_]): String =
      ds.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .replaceAll("#\\d+", "#_")                   // expression ids differ per plan
        .replaceAll("\\$Lambda[^,\\s)\\]]*", "<fn>") // JVM lambda identities
        .replaceAll("@[0-9a-f]+", "@_")              // object hash addresses
    assert(normalized(stubbed) == normalized(injected))
    // still narrow end-to-end: no Exchange either way
    assert(!injected.queryExecution.executedPlan.toString.contains("Exchange"))
    // and the injected codec actually ran (different features than the stub)
    val a = stubbed.orderBy("id").head()
    val b = injected.orderBy("id").head()
    assert(b.width == 224 && a.width != 224)
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
