package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The ISO BMFF box walk's edges beyond the mm_video_index gate's
  * closed-form fixtures: hdlr-based video-track selection, co64,
  * uniform stsz, version-1 mdhd, 64-bit largesize headers, and the
  * malformed-payload refusals.
  */
class Mp4Spec extends AnyFunSuite {

  private def u32s(vs: Long*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
    vs.foreach(v => bb.putInt(v.toInt))
    bb.array()
  }
  private def u64(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(v).array()
  private def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
    val len = 8 + payload.map(_.length).sum
    val bb = java.nio.ByteBuffer.allocate(len)
    bb.putInt(len).put(tpe.getBytes("ISO-8859-1"))
    payload.foreach(bb.put)
    bb.array()
  }
  private val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1"), u32s(0))

  /** Minimal stbl: 2 samples, sizes (10, 20), one chunk at `base`. */
  private def stbl2(base: Long, uniformSize: Long = 0L): Array[Byte] = box("stbl",
    box("stts", u32s(0, 1, 2, 100)),
    if (uniformSize != 0) box("stsz", u32s(0, uniformSize, 2))
    else box("stsz", u32s(0, 0, 2, 10, 20)),
    box("stsc", u32s(0, 1, 1, 2, 1)),
    box("stco", u32s(0, 1, base)))

  private def mdhdV0(timescale: Long) = box("mdhd", u32s(0, 0, 0, timescale, 200, 0))

  test("hdlr 'vide' picks the video track over an earlier sound track") {
    def hdlr(kind: String) = box("hdlr",
      u32s(0, 0), kind.getBytes("ISO-8859-1"), u32s(0, 0, 0), Array[Byte](0))
    val soun = box("trak", box("mdia", mdhdV0(1000), hdlr("soun"), box("minf", stbl2(500))))
    val vide = box("trak", box("mdia", mdhdV0(9000), hdlr("vide"), box("minf", stbl2(700))))
    val ix = Mp4.sampleIndex(ftyp ++ box("moov", soun, vide))
    assert(ix.timescale == 9000)
    assert(ix.samples.map(_.offset) == Seq(700L, 710L))
    assert(ix.samples.map(_.dts) == Seq(0L, 100L))
  }

  test("uniform stsz and co64 chunk bases") {
    val stbl = box("stbl",
      box("stts", u32s(0, 2, 1, 40, 2, 60)), // 3 samples: deltas 40,60,60
      box("stsz", u32s(0, 25, 3)),           // uniform 25-byte samples
      box("stsc", u32s(0, 1, 1, 3, 1)),
      box("co64", u32s(0, 1), u64(1L << 33))) // base beyond 32 bits
    val mp4 = ftyp ++ box("moov", box("trak", box("mdia", mdhdV0(30), box("minf", stbl))))
    val ix = Mp4.sampleIndex(mp4)
    assert(ix.samples.map(_.dts) == Seq(0L, 40L, 100L))
    assert(ix.samples.map(_.size) == Seq(25L, 25L, 25L))
    assert(ix.samples.map(_.offset) == Seq(1L << 33, (1L << 33) + 25, (1L << 33) + 50))
  }

  test("version-1 mdhd reads the 64-bit-times layout's timescale") {
    val mdhd1 = box("mdhd",
      Array[Byte](1, 0, 0, 0), u64(0), u64(0), u32s(48000), u64(200), u32s(0))
    val mp4 = ftyp ++ box("moov", box("trak", box("mdia", mdhd1, box("minf", stbl2(300)))))
    assert(Mp4.sampleIndex(mp4).timescale == 48000)
  }

  test("largesize (size==1) header walks correctly") {
    val inner = box("trak", box("mdia", mdhdV0(600), box("minf", stbl2(444))))
    val large = {
      val bb = java.nio.ByteBuffer.allocate(16 + inner.length)
      bb.putInt(1).put("moov".getBytes("ISO-8859-1")).putLong(16L + inner.length).put(inner)
      bb.array()
    }
    val ix = Mp4.sampleIndex(ftyp ++ large)
    assert(ix.samples.map(_.offset) == Seq(444L, 454L))
  }

  test("refusals: no ftyp, no moov, stsz/stts disagreement") {
    intercept[IllegalArgumentException](Mp4.sampleIndex(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](Mp4.sampleIndex(ftyp ++ box("free")))
    val bad = box("stbl",
      box("stts", u32s(0, 1, 3, 100)), // 3 samples...
      box("stsz", u32s(0, 0, 2, 10, 20)), // ...but 2 sizes
      box("stsc", u32s(0, 1, 1, 3, 1)),
      box("stco", u32s(0, 1, 100)))
    intercept[IllegalArgumentException](Mp4.sampleIndex(
      ftyp ++ box("moov", box("trak", box("mdia", mdhdV0(600), box("minf", bad))))))
  }

  test("isMp4 sniff") {
    assert(Mp4.isMp4(ftyp))
    assert(!Mp4.isMp4("plain text bytes".getBytes("UTF-8")))
  }
}
