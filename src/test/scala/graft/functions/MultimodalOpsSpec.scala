package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docsAsBinary = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text").cast("binary").as("payload"))

  // ---- hand-built container fixtures with KNOWN header fields: the
  // parsers must read these offsets big-endian, independent of any
  // generator arithmetic (the mm_image_headers gate builds its bytes
  // with hex-string expressions — a different code path entirely)
  private def be(v: Int, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte).toArray

  private def png(w: Int, h: Int, colorType: Int): Array[Byte] =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be(13, 4) ++ "IHDR".getBytes ++ be(w, 4) ++ be(h, 4) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0) ++ be(0, 4) // CRC (unchecked)

  private def jpeg(w: Int, h: Int, nComp: Int): Array[Byte] =
    Array[Byte](0xff.toByte, 0xd8.toByte) ++
      // APP0 the parser must SKIP via its length field
      Array[Byte](0xff.toByte, 0xe0.toByte) ++ be(16, 2) ++
      "JFIF".getBytes ++ Array[Byte](0, 1, 1, 0) ++ be(72, 2) ++ be(72, 2) ++
      Array[Byte](0, 0) ++
      // SOF0: len(2)=8+3*nComp, precision, height, width, components
      Array[Byte](0xff.toByte, 0xc0.toByte) ++ be(8 + 3 * nComp, 2) ++
      Array[Byte](8) ++ be(h, 2) ++ be(w, 2) ++ Array[Byte](nComp.toByte)

  test("headerDecode parses real PNG IHDR fields big-endian") {
    val f = MultimodalOps.headerDecode(7L, png(w = 1920, h = 1080, colorType = 6))
    assert(f.width == 1920 && f.height == 1080 && f.nChannels == 4)
    val grey = MultimodalOps.headerDecode(8L, png(w = 300, h = 70000, colorType = 0))
    assert(grey.width == 300 && grey.height == 70000 && grey.nChannels == 1)
  }

  test("headerDecode skips spec-legal 0xFF fill bytes before JPEG markers") {
    // ITU T.81 B.1.1.2: any number of FF fill bytes may precede a
    // marker; the scanner must not read the real marker byte as a
    // segment length (the failure mode: jump to a garbage offset and
    // throw on a well-formed image)
    val base = jpeg(w = 640, h = 480, nComp = 3)
    val padded = base.take(2) ++
      Array.fill(3)(0xff.toByte) ++ base.drop(2) // pad before APP0
    val f = MultimodalOps.headerDecode(11L, padded)
    assert(f.width == 640 && f.height == 480 && f.nChannels == 3)
  }

  test("headerDecode scans JPEG markers to SOFn, skipping APP segments") {
    val f = MultimodalOps.headerDecode(9L, jpeg(w = 640, h = 480, nComp = 3))
    assert(f.width == 640 && f.height == 480 && f.nChannels == 3)
    val cmyk = MultimodalOps.headerDecode(10L, jpeg(w = 65535, h = 1, nComp = 4))
    assert(cmyk.width == 65535 && cmyk.height == 1 && cmyk.nChannels == 4)
  }

  test("headerDecode refuses unknown and truncated payloads loudly") {
    val e = intercept[IllegalArgumentException] {
      MultimodalOps.headerDecode(1L, "plain text".getBytes)
    }
    assert(e.getMessage.contains("unrecognized"))
    intercept[IllegalArgumentException] {
      MultimodalOps.headerDecode(2L, png(10, 10, 6).take(20)) // cut inside IHDR
    }
  }

  test("decodeImages: partition-parallel decode over binary payloads") {
    // text bytes are NOT an image container, so this path exercises the
    // seam with the stub codec (the documented fallback for payload
    // types with no pure-JVM parser)
    val out = MultimodalOps.decodeImages(docsAsBinary, "doc_id", "payload",
      MultimodalOps.stubDecode)
    val rows = out.orderBy("id").collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.width >= 1 && r.width <= 640 && r.height >= 1 && r.height <= 480))
    assert(rows.forall(r => r.meanLuma > 0)) // text bytes are never all-zero
    // deterministic: same payload -> same features
    val again = MultimodalOps.decodeImages(docsAsBinary, "doc_id", "payload",
      MultimodalOps.stubDecode)
      .orderBy("id").collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("decodeImages default codec parses synthesized image payloads") {
    val rows = Seq(
      (1L, png(128, 64, 2)),
      (2L, jpeg(320, 200, 3)),
      (3L, png(16, 16, 3))).toDF("doc_id", "payload")
    val out = MultimodalOps.decodeImages(rows, "doc_id", "payload")
      .orderBy("id").collect()
    assert(out.map(f => (f.width, f.height, f.nChannels)).toSeq ==
      Seq((128, 64, 3), (320, 200, 3), (16, 16, 1)))
  }

  test("sampleFrames fans out frame references without shuffling") {
    val frames = MultimodalOps.sampleFrames(docsAsBinary, "doc_id", "payload", stride = 2)
    val byDoc = frames.groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.nonEmpty && byDoc.values.forall(_ >= 1))
    // no Exchange in the plan: decode fan-out is a narrow map
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("codec seam: swapping the codec changes no plan shape") {
    // a stand-in for the production JNI/opencv decode — different math,
    // same (bytes in, features out) signature through the seam
    val realish: (Long, Array[Byte]) => MultimodalOps.ImageFeatures =
      (id, bytes) => MultimodalOps.ImageFeatures(
        id, 224, 224, 3,
        if (bytes.isEmpty) 0.0 else bytes.map(b => (b & 0xff) * 0.299).sum / bytes.length)
    val stubbed = MultimodalOps.decodeImages(docsAsBinary, "doc_id", "payload",
      MultimodalOps.stubDecode)
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

  test("pixelDecode reads real PNG rasters back bit-exactly (closed-form oracle)") {
    // syntheticPng encodes formula pixels through ImageIO; PNG is
    // lossless, so the decode must recover the formula EXACTLY —
    // recompute the expected statistics here from the closed form,
    // sharing no code with either the encoder or the decoder loops
    for (id <- Seq(0L, 7L, 123L, 4999L)) {
      val w = (id % 24 + 8).toInt
      val h = (id % 16 + 8).toInt
      val lumas = for (y <- 0 until h; x <- 0 until w) yield
        299L * ((31 * id + 7 * x + 13 * y) % 256) +
          587L * ((17 * id + 5 * x + 11 * y) % 256) +
          114L * ((23 * id + 3 * x + 19 * y) % 256)
      val p = MultimodalOps.pixelDecode(id, MultimodalOps.syntheticPng(id))
      assert(p.width == w && p.height == h && p.nChannels == 3)
      assert(p.sumLumaMilli == lumas.sum, s"id=$id sum")
      assert(p.minLumaMilli == lumas.min && p.maxLumaMilli == lumas.max, s"id=$id extrema")
      assert(p.meanLuma == lumas.sum.toDouble / (1000.0 * w * h), s"id=$id mean")
    }
  }

  test("resizeNearestLuma samples the exact nearest-neighbor source pixels") {
    val ids = Seq(2L, 9L, 77L)
    val payloads = ids.map(id => (id, MultimodalOps.syntheticPng(id))).toDF("id", "payload")
    val got = MultimodalOps.resizeNearestLuma(payloads, "id", "payload", 4, 4)
      .collect().map(c => (c.id, c.gx, c.gy) -> c.lumaMilli).toMap
    for (id <- ids; gy <- 0 until 4; gx <- 0 until 4) {
      val w = (id % 24 + 8).toInt
      val h = (id % 16 + 8).toInt
      val x = gx * w / 4
      val y = gy * h / 4
      val exp = 299L * ((31 * id + 7 * x + 13 * y) % 256) +
        587L * ((17 * id + 5 * x + 11 * y) % 256) +
        114L * ((23 * id + 3 * x + 19 * y) % 256)
      assert(got((id, gx, gy)) === exp, s"id=$id cell=($gx,$gy)")
    }
    // identity grid: a w x h resize of a w x h image IS the raster
    val id0 = 2L
    val (w0, h0) = ((id0 % 24 + 8).toInt, (id0 % 16 + 8).toInt)
    val full = MultimodalOps.resizeNearestLuma(
      payloads.filter(col("id") === id0), "id", "payload", w0, h0).collect()
    assert(full.length === w0 * h0)
    assert(full.map(_.lumaMilli).sum ===
      MultimodalOps.pixelDecode(id0, MultimodalOps.syntheticPng(id0)).sumLumaMilli)
    // corrupt payload: loud refusal (no raster to sample)
    val bad = Seq((1L, "nope".getBytes)).toDF("id", "payload")
    intercept[org.apache.spark.SparkException](
      MultimodalOps.resizeNearestLuma(bad, "id", "payload", 4, 4).collect())
  }

  test("pixelDecode refuses corrupt and non-image payloads loudly") {
    // no reader at all (text bytes)
    val e1 = intercept[IllegalArgumentException](
      MultimodalOps.pixelDecode(1L, "definitely not an image".getBytes))
    assert(e1.getMessage.contains("id=1"))
    // a real PNG signature with a truncated/garbage body must throw,
    // not decode to garbage statistics
    val truncated = MultimodalOps.syntheticPng(3L).take(40)
    intercept[IllegalArgumentException](MultimodalOps.pixelDecode(3L, truncated))
  }

  test("imageIoDecode: full pixel decode for real images, header fallback otherwise") {
    // a REAL png -> ImageIO path: meanLuma is true Rec.601 pixel luma
    val real = MultimodalOps.imageIoDecode(5L, MultimodalOps.syntheticPng(5L))
    val expected = MultimodalOps.pixelDecode(5L, MultimodalOps.syntheticPng(5L))
    assert(real.meanLuma == expected.meanLuma && real.width == expected.width)
    // a header-only fixture (fake CRC, no IDAT) -> headerDecode path:
    // dimensions from the container header, luma from the byte mean
    val fallback = MultimodalOps.imageIoDecode(6L, png(128, 64, 2))
    assert(fallback.width == 128 && fallback.height == 64 && fallback.nChannels == 3)
  }

  test("wavDecode: round-trips the synthetic fixture with exact integer frames") {
    for (id <- Seq(0L, 3L, 11L, 23L)) {
      val n = ((id % 5 + 1) * 1600 + (id % 7) * 3).toInt
      val samples = (0 until n).map(i =>
        (((2654435761L * id + 40503L * i) % 2003L) - 1001L).toInt)
      val frames = MultimodalOps.wavDecode(id, MultimodalOps.syntheticWav(id), 1600)
      assert(frames.map(_.nSamples).sum == n, s"id=$id sample count")
      assert(frames.length == (n + 1599) / 1600, s"id=$id frame count")
      frames.foreach { f =>
        val sl = samples.slice(f.frameIdx * 1600, f.frameIdx * 1600 + f.nSamples)
        assert(f.sumSq == sl.map(s => s.toLong * s).sum, s"id=$id frame ${f.frameIdx} energy")
        assert(f.peakAbs == sl.map(math.abs).max, s"id=$id frame ${f.frameIdx} peak")
      }
    }
  }

  test("wavDecode refuses non-WAV, compressed, stereo and truncated payloads") {
    intercept[IllegalArgumentException](
      MultimodalOps.wavDecode(1L, "not audio at all..............................".getBytes, 1600))
    val wav = MultimodalOps.syntheticWav(2L)
    // flip the channel count to stereo: must refuse, not misparse
    val stereo = wav.clone(); stereo(22) = 2
    val e = intercept[IllegalArgumentException](MultimodalOps.wavDecode(2L, stereo, 1600))
    assert(e.getMessage.contains("channels"))
    // flip the codec to non-PCM
    val comp = wav.clone(); comp(20) = 85.toByte
    intercept[IllegalArgumentException](MultimodalOps.wavDecode(2L, comp, 1600))
    // truncate the data chunk: overrun must throw
    intercept[IllegalArgumentException](MultimodalOps.wavDecode(2L, wav.take(100), 1600))
  }

  test("resizeMeta rescales the metadata struct only") {
    val meta = MultimodalOps.decodeImages(docsAsBinary, "doc_id", "payload",
      MultimodalOps.stubDecode).toDF()
    val out = MultimodalOps.resizeMeta(meta, maxSide = 100).collect()
    assert(out.forall { r =>
      val ow = r.getAs[Int]("out_width"); val oh = r.getAs[Int]("out_height")
      ow <= 100 && oh <= 100 && ow >= 0 && oh >= 0
    })
  }

  test("aHash16 sets exactly the brighter-than-mean bits, any row order") {
    import spark.implicits._
    // bottom half (pos 8..15) bright: mean test sets bits 8..15 -> 0xFF00
    val cells = for (gy <- 0 until 4; gx <- 0 until 4)
      yield (1L, gx, gy, if (gy >= 2) 1000L else 0L)
    for (perm <- Seq(cells, cells.reverse)) {
      val out = MultimodalOps.aHash16(
        perm.toDF("id", "gx", "gy", "lumaMilli").repartition(3), "id").collect()
      assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 0xFF00L)))
    }
    // perfectly flat image: no cell is STRICTLY brighter than the mean
    val flat = (for (gy <- 0 until 4; gx <- 0 until 4) yield (2L, gx, gy, 500L))
      .toDF("id", "gx", "gy", "lumaMilli")
    assert(MultimodalOps.aHash16(flat, "id").collect().head.getLong(1) == 0L)
  }
}
