package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: images/audio/video ride through the engine as
  * opaque `binary` payloads plus a typed metadata struct, exactly like a
  * 100 TB training-data lake stores them (parquet binary + sidecar
  * fields). The Spark-side plumbing — schema, partition-parallel decode,
  * per-row feature structs, frame fan-out — is real and tested, and so
  * is the decode: [[pixelDecode]] reads full pixel rasters through the
  * JDK's own `javax.imageio` (PNG/baseline JPEG, no external library),
  * with [[headerDecode]]'s pure byte-level PNG/JPEG container parsing
  * as the fallback for payloads ImageIO rejects. Swapping the codec
  * for a JNI/opencv/ffmpeg call changes no plan shape: decode stays a
  * narrow `mapPartitions` (no shuffle), so it scales linearly with
  * input splits and pipelines with the parquet scan.
  */
object MultimodalOps {

  /** Decoded-image feature row produced by the codec. */
  final case class ImageFeatures(
      id: Long,
      width: Int,
      height: Int,
      nChannels: Int,
      meanLuma: Double)

  /** Full per-image pixel statistics from a REAL decode. Luma is
    * integer Rec.601 in MILLI units (299·R + 587·G + 114·B per pixel,
    * range 0..255000): the sum/min/max stay in exact integer space and
    * the mean is ONE closing IEEE division, so the statistics hash
    * bit-for-bit against an oracle that recomputes them arithmetically
    * — no tolerance needed.
    */
  final case class PixelStats(
      id: Long,
      width: Int,
      height: Int,
      nChannels: Int,
      sumLumaMilli: Long,
      minLumaMilli: Long,
      maxLumaMilli: Long,
      meanLuma: Double)

  // ImageIO's default stream cache writes a temp FILE per decode —
  // per-row disk IO inside a hot mapPartitions. Payloads here are
  // in-memory byte arrays; keep the cache in memory too.
  javax.imageio.ImageIO.setUseCache(false)

  /** Sampled video frame reference. */
  final case class FrameRef(id: Long, frameIdx: Int, offsetBytes: Long)

  /** One demuxed video sample (frame) reference: `dts` in `timescale`
    * ticks, `offset`/`size` locating the coded bytes in the payload. */
  final case class VideoSample(
      id: Long, sampleIdx: Int, dts: Long, size: Long, offset: Long, timescale: Long)

  /** REAL header codec: parses PNG (IHDR) and JPEG (SOFn) headers from
    * the raw bytes — pure JVM, no image library. Width/height/channels
    * are decoded from the actual container structure:
    *
    *  - PNG: 8-byte signature, then the IHDR chunk (always first, per
    *    the spec): big-endian width at offset 16, height at 20, bit
    *    depth at 24, color type at 25 (0 grey=1ch, 2 RGB=3, 3
    *    palette=1, 4 grey+alpha=2, 6 RGBA=4).
    *  - JPEG: SOI (FFD8), then marker segments scanned by their 2-byte
    *    big-endian lengths until a start-of-frame SOFn (C0-CF minus
    *    C4/C8/CC which are not frames): precision(1), height(2),
    *    width(2), component count(1).
    *
    * `meanLuma` here is the mean payload byte — a header-only parser
    * cannot see pixels; real luma comes from [[pixelDecode]], and the
    * default codec ([[imageIoDecode]]) only reaches this fallback when
    * a full decode is impossible. Unknown or truncated payloads throw
    * with the leading bytes named — a silent fallback would let a
    * corrupted 100 TB lake decode to garbage dimensions.
    */
  private[graft] def headerDecode(id: Long, payload: Array[Byte]): ImageFeatures = {
    def be(i: Int, n: Int): Int = {
      require(i + n <= payload.length,
        s"truncated header: need ${i + n} bytes, have ${payload.length}")
      var v = 0; var j = 0
      while (j < n) { v = (v << 8) | (payload(i + j) & 0xff); j += 1 }
      v
    }
    val isPng = payload.length >= 26 &&
      (payload(0) & 0xff) == 0x89 && payload(1) == 'P' && payload(2) == 'N' &&
      payload(3) == 'G' && (payload(4) & 0xff) == 0x0d && (payload(5) & 0xff) == 0x0a &&
      (payload(6) & 0xff) == 0x1a && (payload(7) & 0xff) == 0x0a
    val isJpeg = payload.length >= 4 &&
      (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8
    val (w, h, ch) =
      if (isPng) {
        // bytes 8-15 are the IHDR chunk header (length + "IHDR"); the
        // spec REQUIRES IHDR first, so offsets are fixed
        require(payload(12) == 'I' && payload(13) == 'H' &&
          payload(14) == 'D' && payload(15) == 'R',
          "PNG signature without leading IHDR chunk")
        val channels = (payload(25) & 0xff) match {
          case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
          case c => throw new IllegalArgumentException(s"PNG color type $c")
        }
        (be(16, 4), be(20, 4), channels)
      } else if (isJpeg) {
        var i = 2
        var sof = -1
        while (sof < 0) {
          require(i + 4 <= payload.length, s"JPEG without SOF marker (scanned $i bytes)")
          require((payload(i) & 0xff) == 0xff, f"expected JPEG marker at $i, got 0x${payload(i) & 0xff}%02x")
          // ITU T.81 B.1.1.2: a marker may be preceded by any number of
          // 0xFF fill bytes — skip them, or a legal padded stream reads
          // the real marker byte as a segment length and derails
          while ((payload(i + 1) & 0xff) == 0xff) {
            i += 1
            require(i + 4 <= payload.length, s"JPEG without SOF marker (scanned $i bytes)")
          }
          val m = payload(i + 1) & 0xff
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) sof = i
          else i += 2 + be(i + 2, 2) // skip segment: length includes its own 2 bytes
        }
        (be(sof + 7, 2), be(sof + 5, 2), payload(sof + 9) & 0xff)
      } else {
        val head = payload.take(4).map(b => f"${b & 0xff}%02x").mkString(" ")
        throw new IllegalArgumentException(
          s"unrecognized image payload for id=$id (leading bytes: $head)")
      }
    var acc = 0L
    var i = 0
    while (i < payload.length) { acc += payload(i) & 0xff; i += 1 }
    ImageFeatures(id, w, h, ch,
      if (payload.isEmpty) 0.0 else acc.toDouble / payload.length)
  }

  /** REAL pixel decode via the JDK's own `javax.imageio` — ImageIO
    * ships with every JVM and fully decodes PNG and baseline JPEG, so
    * pixel statistics need no external codec library. Per pixel the
    * integer Rec.601 milli-luma (299·R + 587·G + 114·B) accumulates
    * into an exact long sum with running min/max; the mean is the one
    * closing division, making every field bit-reproducible. Undecodable
    * payloads throw with the leading bytes named — a silent fallback
    * would let a corrupted 100 TB lake decode to garbage statistics.
    */
  private[graft] def pixelDecode(id: Long, payload: Array[Byte]): PixelStats = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case e: Exception =>
        throw new IllegalArgumentException(
          s"ImageIO failed decoding payload for id=$id: ${e.getMessage}", e)
      }
    if (img == null) {
      val head = payload.take(4).map(b => f"${b & 0xff}%02x").mkString(" ")
      throw new IllegalArgumentException(
        s"ImageIO has no reader for payload of id=$id (leading bytes: $head)")
    }
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val l = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
        sum += l
        if (l < mn) mn = l
        if (l > mx) mx = l
        x += 1
      }
      y += 1
    }
    PixelStats(id, w, h, img.getColorModel.getNumComponents,
      sum, mn, mx, sum.toDouble / (1000.0 * w * h))
  }

  /** One cell of an executed nearest-neighbor resize: integer
    * milli-luma of the source pixel the (gx, gy) grid cell samples. */
  final case class ResizedCell(id: Long, gx: Int, gy: Int, lumaMilli: Long)

  /** EXECUTED nearest-neighbor resize — the step [[ImageFeatures]]'
    * resize *planning* sizes, actually run: decode the raster
    * (ImageIO, the same codec seam), sample the gridW × gridH
    * nearest-neighbor grid (source pixel = (gx·w ∕ gridW, gy·h ∕
    * gridH), integer floor division — deterministic, interpolation-
    * free), and emit each cell's integer milli-luma. The thumbnail
    * fingerprint an image-curation pipeline feeds to perceptual
    * near-dedup. Narrow flatMap per input split; only (id, 2 ints,
    * 1 long) × grid cells move — never rasters. Payloads ImageIO
    * cannot decode throw (resize has no header fallback: there is no
    * raster to sample); pre-filter with [[decodeImages]] where inputs
    * are untrusted.
    */
  def resizeNearestLuma(
      df: DataFrame,
      idCol: String,
      binCol: String,
      gridW: Int,
      gridH: Int): Dataset[ResizedCell] = {
    require(gridW > 0 && gridH > 0, s"grid must be positive, got $gridW x $gridH")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case e: Exception =>
            throw new IllegalArgumentException(
              s"ImageIO failed decoding payload for id=$id: ${e.getMessage}", e)
          }
        if (img == null)
          throw new IllegalArgumentException(s"ImageIO has no reader for payload of id=$id")
        val w = img.getWidth
        val h = img.getHeight
        for (gy <- 0 until gridH; gx <- 0 until gridW) yield {
          val rgb = img.getRGB(gx * w / gridW, gy * h / gridH)
          val l = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
          ResizedCell(id, gx, gy, l)
        }
      })
  }

  /** Partition-parallel REAL pixel decode — same narrow-mapPartitions
    * shape as [[decodeImages]] (no shuffle; scales with input splits),
    * but through [[pixelDecode]]'s full ImageIO raster read.
    */
  def decodePixels(df: DataFrame, idCol: String, binCol: String): Dataset[PixelStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => pixelDecode(id, bytes) })
  }

  /** Deterministic RGB PNG fixture encoder (gate/spec fixture): image
    * `id` is (id%24+8) × (id%16+8) with pixel (x, y) channels
    * r = (31·id + 7x + 13y) % 256, g = (17·id + 5x + 11y) % 256,
    * b = (23·id + 3x + 19y) % 256, written as a REAL PNG through
    * ImageIO. PNG is lossless, so [[pixelDecode]] must read back
    * exactly these values — and the mm_pixel_stats DuckDB oracle
    * recomputes the statistics from this closed form arithmetically,
    * certifying the encode→decode→aggregate path end-to-end with zero
    * shared code between fixture formula and verification.
    */
  private[graft] def syntheticPng(id: Long): Array[Byte] = {
    val w = (id % 24 + 8).toInt
    val h = (id % 16 + 8).toInt
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((31 * id + 7 * x + 13 * y) % 256).toInt
        val g = ((17 * id + 5 * x + 11 * y) % 256).toInt
        val b = ((23 * id + 3 * x + 19 * y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** One 100ms-ish audio analysis frame: exact integer energy
    * (sum of squared PCM16 samples fits a long: 32767² × frameLen ≪
    * 2^63) plus the peak absolute sample — the loudness/clipping
    * signals an audio-curation pipeline filters on, all
    * bit-reproducible (no float accumulation anywhere). */
  final case class AudioFrame(
      id: Long,
      frameIdx: Int,
      nSamples: Int,
      sumSq: Long,
      peakAbs: Int)

  /** REAL RIFF/WAVE parsing — pure JVM, no codec library: walk the
    * chunk list (fmt must declare PCM16 mono — anything else throws
    * with the offending field named; compressed audio needs an external
    * decoder and must not silently parse as garbage), then window the
    * little-endian samples into `frameLen`-sample frames (the last
    * frame may be partial). Per frame: exact Σ s² and max |s|.
    */
  /** Shared RIFF chunk walk: locate the PCM16-mono data chunk (or
    * throw naming the offending field). Returns (dataOff, dataLen,
    * sampleRate). Used by [[wavDecode]] and [[decimateAudio]] so the
    * two parsers can never drift.
    */
  private[graft] def wavPcmRange(id: Long, payload: Array[Byte]): (Int, Int, Int) = {
    def le32(o: Int): Int =
      (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8) |
        ((payload(o + 2) & 0xff) << 16) | ((payload(o + 3) & 0xff) << 24)
    def le16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def tag(o: Int): String = new String(payload, o, 4, "US-ASCII")
    require(payload.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE",
      s"id=$id: not a RIFF/WAVE payload (${payload.take(4).map(b => f"${b & 0xff}%02x").mkString(" ")})")
    var off = 12
    var dataOff = -1
    var dataLen = -1
    var fmtSeen = false
    var rate = 0
    while (off + 8 <= payload.length && (dataOff < 0 || !fmtSeen)) {
      val ct = tag(off)
      val cl = le32(off + 4)
      if (ct == "fmt ") {
        val codec = le16(off + 8)
        val channels = le16(off + 10)
        val bits = le16(off + 22)
        require(codec == 1, s"id=$id: WAVE codec $codec is not PCM — decode upstream")
        require(channels == 1, s"id=$id: $channels channels; this parser handles mono")
        require(bits == 16, s"id=$id: $bits-bit samples; this parser handles PCM16")
        rate = le32(off + 12)
        fmtSeen = true
      } else if (ct == "data") {
        dataOff = off + 8
        dataLen = cl
      }
      off += 8 + cl + (cl & 1) // chunks are word-aligned
    }
    require(fmtSeen && dataOff >= 0, s"id=$id: WAVE missing fmt/data chunk")
    require(dataOff + dataLen <= payload.length, s"id=$id: data chunk overruns payload")
    (dataOff, dataLen, rate)
  }

  private[graft] def wavDecode(id: Long, payload: Array[Byte], frameLen: Int): Seq[AudioFrame] = {
    def le16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    val (dataOff, dataLen, _) = wavPcmRange(id, payload)
    val nSamples = dataLen / 2
    val out = Seq.newBuilder[AudioFrame]
    var f = 0
    var i = 0
    while (i < nSamples) {
      val end = math.min(i + frameLen, nSamples)
      var sumSq = 0L
      var peak = 0
      var j = i
      while (j < end) {
        val s = le16(dataOff + 2 * j).toShort.toInt
        sumSq += s.toLong * s
        val a = math.abs(s)
        if (a > peak) peak = a
        j += 1
      }
      out += AudioFrame(id, f, end - i, sumSq, peak)
      f += 1
      i = end
    }
    out.result()
  }

  /** Partition-parallel audio framing: one narrow mapPartitions from
    * (id, wav bytes) to per-frame energy rows — no shuffle, scales
    * with input splits; only (id, 2 ints, long, int) rows ever move.
    */
  def decodeAudio(
      df: DataFrame, idCol: String, binCol: String, frameLen: Int): Dataset[AudioFrame] = {
    require(frameLen > 0, s"frameLen must be positive, got $frameLen")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => wavDecode(id, bytes, frameLen) })
  }

  /** Audio decimation resample — keep every `factor`-th sample and
    * REBUILD a valid PCM16 mono WAV (canonical 44-byte header, rate
    * divided by `factor`, word-aligned data). The audio analogue of
    * the image resize leg: the WRITE path of the binary column, not
    * just the parse — downstream consumers (including [[decodeAudio]]
    * itself, which the gate round-trips through) must read the
    * rewritten container. Anti-aliasing deliberately out of scope
    * (documented): a proper low-pass needs a filter kernel; naive
    * decimation is the honest pure-JVM step and the fixture signal is
    * closed-form either way. One narrow mapPartitions — payloads never
    * shuffle, only the (id, rebuilt-bytes) rows of this map move.
    */
  def decimateAudio(
      df: DataFrame, idCol: String, binCol: String, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (dataOff, dataLen, rate) = wavPcmRange(id, bytes)
        val nIn = dataLen / 2
        val nOut = (nIn + factor - 1) / factor
        val outLen = nOut * 2
        val bb = java.nio.ByteBuffer.allocate(44 + outLen + (outLen & 1))
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + outLen)
          .put("WAVE".getBytes("US-ASCII"))
        bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1)
          .putInt(rate / factor).putInt(2 * (rate / factor))
          .putShort(2).putShort(16)
        bb.put("data".getBytes("US-ASCII")).putInt(outLen)
        var i = 0
        while (i < nIn) {
          bb.put(bytes(dataOff + 2 * i)).put(bytes(dataOff + 2 * i + 1))
          i += factor
        }
        (id, bb.array())
      })
      .toDF(idCol, binCol)
  }

  /** Deterministic PCM16 mono WAV fixture (gate/spec fixture): id's
    * clip is `id % 5 + 1` full 1600-sample frames plus `id % 7` extra
    * samples (so partial tails occur), sample i =
    * ((2654435761·id + 40503·i) mod 2003) − 1001 — a closed form the
    * oracle can re-aggregate arithmetically, sharing zero code with
    * the parser. Canonical 44-byte header, word-aligned data. */
  private[graft] def syntheticWav(id: Long): Array[Byte] = {
    val n = ((id % 5 + 1) * 1600 + (id % 7) * 3).toInt
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen + (dataLen & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(16000).putInt(32000) // rate, byte rate
      .putShort(2).putShort(16) // block align, bits
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0L
    while (i < n) {
      bb.putShort((((2654435761L * id + 40503L * i) % 2003L) - 1001L).toShort)
      i += 1
    }
    bb.array()
  }

  /** STUB codec — deterministic fake for payloads that are NOT real
    * image containers (the spec corpus reuses text bytes as opaque
    * binary). [[headerDecode]] is the real default; this remains the
    * seam's test stand-in and the documented fallback for payload types
    * with no pure-JVM parser (video containers).
    */
  private[graft] def stubDecode(id: Long, payload: Array[Byte]): ImageFeatures = {
    val n = payload.length
    var acc = 0L
    var i = 0
    while (i < n) { acc += payload(i) & 0xff; i += 1 }
    ImageFeatures(
      id = id,
      width = (n * 7) % 640 + 1,
      height = (n * 13) % 480 + 1,
      nChannels = 3,
      meanLuma = if (n == 0) 0.0 else acc.toDouble / n)
  }

  /** Default codec: a FULL ImageIO pixel decode when the JDK can read
    * the payload (real PNG/JPEG → real dimensions, channel count, and
    * Rec.601 mean luma), falling back to pure header parsing
    * ([[headerDecode]]) for containers ImageIO rejects — e.g. header
    * fixtures with synthetic chunk bytes, or formats with a parseable
    * header but no JVM reader. Payloads neither decodable nor
    * header-parseable still throw loudly (headerDecode's contract).
    */
  private[graft] def imageIoDecode(id: Long, payload: Array[Byte]): ImageFeatures =
    try {
      val p = pixelDecode(id, payload)
      ImageFeatures(p.id, p.width, p.height, p.nChannels, p.meanLuma)
    } catch { case _: IllegalArgumentException => headerDecode(id, payload) }

  /** Partition-parallel decode of a binary column into typed features.
    * Narrow transformation: each task decodes its own parquet split's
    * rows; nothing shuffles.
    *
    * `codec` is the real-library seam: the default is [[imageIoDecode]]
    * (full JDK pixel decode, header-parse fallback); a production
    * build passes a heavier decode (JNI/opencv/ffmpeg) here and
    * NOTHING else changes — the closure is opaque to Catalyst, so the
    * physical plan is byte-identical in shape whichever implementation
    * rides inside (MultimodalSpec pins that invariance against explain
    * output).
    */
  def decodeImages(
      df: DataFrame,
      idCol: String,
      binCol: String,
      codec: (Long, Array[Byte]) => ImageFeatures = imageIoDecode): Dataset[ImageFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => codec(id, bytes) })
  }

  /** REAL video container index: walk each payload's ISO BMFF sample
    * tables ([[Mp4]] — stts/stsz/stsc/stco box math, no codec decode)
    * and emit one row per sample with timestamp, size and absolute
    * byte offset. Narrow mapPartitions over the scan, same seam shape
    * as [[decodeImages]]: only (id, 4 longs) rows leave the stage —
    * rasters and coded bytes never ride a shuffle. This is the
    * metadata pass that makes strided frame extraction at 100 TB read
    * the index plus the chosen samples instead of the whole stream.
    */
  def videoIndex(df: DataFrame, idCol: String, binCol: String): Dataset[VideoSample] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val ix =
          try Mp4.sampleIndex(bytes)
          catch { case e: IllegalArgumentException =>
            throw new IllegalArgumentException(s"id=$id: ${e.getMessage}", e) }
        ix.samples.map(s => VideoSample(id, s.idx, s.dts, s.size, s.offset, ix.timescale))
      }
  }

  /** Frame sampling: fan each video payload out to every `stride`-th
    * frame reference (flatMap — still narrow). Real MP4 payloads walk
    * their actual container index ([[Mp4.sampleIndex]]: true offsets,
    * true frame count); payloads that are not ISO BMFF containers fall
    * back to a deterministic synthetic index (the spec corpus reuses
    * text bytes as opaque binary), keeping the codec-seam contract:
    * swap nothing, the plan shape is identical either way.
    */
  def sampleFrames(
      df: DataFrame,
      idCol: String,
      binCol: String,
      stride: Int): Dataset[FrameRef] = {
    // validate on the driver: stride 0 would throw per-TASK inside the
    // flatMap (an opaque stage failure) and a negative stride would
    // silently drop every frame
    require(stride > 0, s"stride must be positive, got $stride")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (Mp4.isMp4(bytes)) {
          val ix = Mp4.sampleIndex(bytes)
          ix.samples.indices.by(stride).map { f =>
            val s = ix.samples(f); FrameRef(id, s.idx, s.offset)
          }
        } else {
          val nFrames = bytes.length / 64 + 1 // synthetic fallback index
          (0 until nFrames by stride).map(f => FrameRef(id, f, f.toLong * 64))
        }
      }
  }

  /** One DECODED video frame: dimensions and exact mean luma. */
  final case class DecodedFrame(
      id: Long, frameIdx: Int, width: Int, height: Int, lumaMean: Double)

  /** REAL video frame decode for MJPEG tracks — the one codec a pure
    * JVM can honestly decode: in Motion-JPEG every sample IS a
    * standalone JPEG, so the [[Mp4.sampleIndex]] byte ranges feed the
    * same ImageIO seam [[decodeImages]] uses for stills. Every
    * `stride`-th sample's bytes are sliced out of the payload, decoded,
    * and reduced to (dims, mean luma) — a narrow flatMap over the scan;
    * rasters and coded bytes never leave the stage, only (id, 2 ints,
    * 2 ints, 1 double) rows do. At 100 TB with range-readable storage
    * this is the plan that reads the index plus every Nth sample's
    * bytes, never the stream. Luma: band 0 for single-band (grayscale)
    * frames; the integer ITU-R BT.601 round for RGB. Samples that are
    * not JPEG bytes REFUSE with the sample's id/index (an MJPEG track
    * never contains them; inter-frame codecs — H.264+ — remain the
    * documented seam: no conformant pure-JVM decoder exists).
    */
  def decodeVideoFrames(
      df: DataFrame,
      idCol: String,
      binCol: String,
      stride: Int): Dataset[DecodedFrame] = {
    require(stride > 0, s"stride must be positive, got $stride")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val ix =
          try Mp4.sampleIndex(bytes)
          catch { case e: IllegalArgumentException =>
            throw new IllegalArgumentException(s"id=$id: ${e.getMessage}", e) }
        ix.samples.indices.by(stride).map { f =>
          val s = ix.samples(f)
          require(s.offset >= 0 && s.offset + s.size <= bytes.length,
            s"id=$id sample ${s.idx}: byte range [${s.offset}, ${s.offset + s.size}) " +
              s"outside payload of ${bytes.length}")
          val coded = java.util.Arrays.copyOfRange(
            bytes, s.offset.toInt, (s.offset + s.size).toInt)
          require(coded.length >= 2 &&
            (coded(0) & 0xff) == 0xff && (coded(1) & 0xff) == 0xd8,
            s"id=$id sample ${s.idx}: not JPEG bytes — not an MJPEG track " +
              "(inter-frame codecs are a documented seam, refusing)")
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(coded))
            catch { case e: Exception => throw new IllegalArgumentException(
              s"id=$id sample ${s.idx}: JPEG decode failed: ${e.getMessage}", e) }
          require(img != null, s"id=$id sample ${s.idx}: ImageIO returned no raster")
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              sum += (if (raster.getNumBands == 1) raster.getSample(x, y, 0)
              else {
                val rgb = img.getRGB(x, y)
                val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
                math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt
              })
              x += 1
            }
            y += 1
          }
          DecodedFrame(id, s.idx, w, h, sum.toDouble / (w.toLong * h))
        }
      }
  }

  /** Metadata-only "resize": rescales the typed struct without touching
    * payloads — the cheap planning pass a real pipeline runs before the
    * expensive decode, entirely in Catalyst expressions.
    */
  def resizeMeta(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(1.0),
      lit(maxSide) / greatest(col("width"), col("height")).cast("double"))
    df.withColumn("out_width", (col("width") * scale).cast("int"))
      .withColumn("out_height", (col("height") * scale).cast("int"))
  }

  /** 16-bit perceptual average-hash from a [[resizeNearestLuma]] 4×4
    * grid: bit (gy·4 + gx) is set iff that cell's luma exceeds the
    * image mean — the classic aHash, robust to re-encoding and mild
    * edits because only the thumbnail's bright/dark PATTERN survives
    * into the fingerprint. The comparison is the exact integer test
    * 16·l > Σl (no mean division), and the bit fold is an
    * order-independent SUM of disjoint powers of two, so the hash is
    * identical at any partitioning. One hash-agg over 16-row groups;
    * output is (id, ahash) — 2 longs per image, never rasters.
    */
  def aHash16(cells: DataFrame, idCol: String = "id"): DataFrame =
    cells.groupBy(col(idCol)).agg(
        sum(col("lumaMilli")).as("__tot"),
        collect_list(struct((col("gy") * 4 + col("gx")).cast("int").as("pos"),
          col("lumaMilli").as("l"))).as("__cs"))
      .select(col(idCol), aggregate(col("__cs"), lit(0L),
        (acc, c) => acc + when(lit(16L) * c.getField("l") > col("__tot"),
          call_function("shiftleft", lit(1L), c.getField("pos"))).otherwise(0L)).as("ahash"))
}
