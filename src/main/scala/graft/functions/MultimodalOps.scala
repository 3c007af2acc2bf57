package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: images/audio/video ride through the engine as
  * opaque `binary` payloads plus a typed metadata struct, exactly like a
  * 100 TB training-data lake stores them (parquet binary + sidecar
  * fields). The Spark-side plumbing — schema, partition-parallel decode,
  * per-row feature structs, frame fan-out — is real and tested; the
  * codec itself is a clearly-marked deterministic STUB because no
  * image/audio library ships in this environment. Swapping `stubDecode`
  * for a JNI/opencv call changes no plan shape: decode stays a
  * narrow `mapPartitions` (no shuffle), so it scales linearly with
  * input splits and pipelines with the parquet scan.
  */
object MultimodalOps {

  /** Decoded-image feature row produced by the (stubbed) codec. */
  final case class ImageFeatures(
      id: Long,
      width: Int,
      height: Int,
      nChannels: Int,
      meanLuma: Double)

  /** Sampled video frame reference. */
  final case class FrameRef(id: Long, frameIdx: Int, offsetBytes: Long)

  /** STUB codec — deterministic fake in place of a real image decode.
    * A production build replaces the body with the actual library call;
    * the signature (bytes in, features out) and everything downstream
    * stay identical.
    */
  private[functions] def stubDecode(id: Long, payload: Array[Byte]): ImageFeatures = {
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

  /** Partition-parallel decode of a binary column into typed features.
    * Narrow transformation: each task decodes its own parquet split's
    * rows; nothing shuffles.
    *
    * `codec` is the real-library seam: a production build passes the
    * actual decode (JNI/opencv/ffmpeg) here and NOTHING else changes —
    * the closure is opaque to Catalyst, so the physical plan is
    * byte-identical in shape whichever implementation rides inside
    * (MultimodalSpec pins that invariance against explain output).
    */
  def decodeImages(
      df: DataFrame,
      idCol: String,
      binCol: String,
      codec: (Long, Array[Byte]) => ImageFeatures = stubDecode): Dataset[ImageFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => codec(id, bytes) })
  }

  /** Frame sampling: fan each "video" payload out to every `stride`-th
    * frame reference (flatMap — still narrow). A real implementation
    * would read container metadata; the stub derives a deterministic
    * frame count from payload size.
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
        val nFrames = bytes.length / 64 + 1 // STUB: fake container index
        (0 until nFrames by stride).map(f => FrameRef(id, f, f.toLong * 64))
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
}
