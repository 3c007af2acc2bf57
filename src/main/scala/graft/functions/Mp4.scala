package graft.functions

/** Pure-JVM ISO BMFF (MP4/MOV) container walk — the sample-index side
  * of a video demuxer, with NO codec decode: walk `moov/trak/mdia/
  * minf/stbl`, expand the four sample-table boxes, and emit one row
  * per sample with its decode timestamp, byte size and absolute file
  * offset. That table is exactly what a frame-sampling pipeline needs
  * to plan strided reads (seek offsets + timestamps) before any
  * decoder runs — the metadata pass that makes 100 TB of video
  * SKIPPABLE: sampling every Nth frame reads the index (KBs) plus the
  * chosen samples, never the stream.
  *
  * Box math implemented from the published ISO/IEC 14496-12 layout:
  *  - `stts`  run-length (count, delta) pairs → per-sample DTS
  *  - `stsz`  uniform-or-per-sample byte sizes
  *  - `stsc`  (first_chunk, samples_per_chunk) runs → chunk of sample
  *  - `stco`/`co64` chunk base offsets; sample offset = chunk base +
  *    sizes of its predecessors in the chunk
  *  - `mdhd`  v0/v1 timescale (ticks per second for the DTS values)
  * 64-bit `size==1` largesize headers and `size==0` to-end boxes are
  * handled; unknown sibling boxes are skipped by size, so real-world
  * files (tkhd/edts/udta/free...) walk fine. The VIDEO track is
  * chosen by `hdlr` handler `vide` when declared, else the first
  * track carrying a sample table.
  */
object Mp4 {

  /** One demuxed sample reference: `dts` in `timescale` ticks. */
  final case class Sample(idx: Int, dts: Long, size: Long, offset: Long)

  final case class TrackIndex(timescale: Long, samples: Seq[Sample])

  /** Cheap container sniff: a top-level `ftyp` box in front. */
  def isMp4(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p'

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def u64(b: Array[Byte], off: Int): Long =
    (u32(b, off) << 32) | u32(b, off + 4)

  private def boxType(b: Array[Byte], off: Int): String =
    new String(b, off + 4, 4, "ISO-8859-1")

  /** (payloadStart, payloadEnd) pairs of every child box named `name`
    * inside [from, to). */
  private def children(b: Array[Byte], from: Int, to: Int, name: String): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    var off = from
    while (off + 8 <= to) {
      val size0 = u32(b, off)
      val (size, hdr) =
        if (size0 == 1L) (u64(b, off + 8), 16)
        else if (size0 == 0L) ((to - off).toLong, 8)
        else (size0, 8)
      require(size >= hdr && off + size <= to,
        s"malformed box '${boxType(b, off)}' at $off: size $size exceeds enclosure $to")
      if (boxType(b, off) == name) out += ((off + hdr, off + size.toInt))
      off += size.toInt
    }
    out.result()
  }

  private def child(b: Array[Byte], span: (Int, Int), name: String): Option[(Int, Int)] =
    children(b, span._1, span._2, name).headOption

  /** Sample index of the video track (hdlr `vide` preferred, else the
    * first track with a sample table). Throws IllegalArgumentException
    * on non-MP4 or structurally broken payloads — the caller decides
    * whether that is fatal or routes to a fallback.
    */
  def sampleIndex(bytes: Array[Byte]): TrackIndex = {
    require(isMp4(bytes), "payload is not an ISO BMFF container (no ftyp)")
    val whole = (0, bytes.length)
    val moov = child(bytes, whole, "moov")
      .getOrElse(throw new IllegalArgumentException("no moov box"))
    val traks = children(bytes, moov._1, moov._2, "trak")
    require(traks.nonEmpty, "moov carries no trak")
    def mdiaOf(trak: (Int, Int)) = child(bytes, trak, "mdia")
    def handlerOf(mdia: (Int, Int)): Option[String] =
      child(bytes, mdia, "hdlr").map { case (s, _) =>
        new String(bytes, s + 8, 4, "ISO-8859-1") // ver/flags 4 + pre_defined 4
      }
    val withMdia = traks.flatMap(t => mdiaOf(t).map(t -> _))
    val picked = withMdia.find(t => handlerOf(t._2).contains("vide"))
      .orElse(withMdia.find(t => child(bytes, t._2, "minf")
        .flatMap(child(bytes, _, "stbl")).isDefined))
      .getOrElse(throw new IllegalArgumentException("no track with a sample table"))
    val mdia = picked._2
    val mdhd = child(bytes, mdia, "mdhd")
      .getOrElse(throw new IllegalArgumentException("no mdhd box"))
    val timescale = {
      val v = bytes(mdhd._1) & 0xff // version byte
      if (v == 1) u32(bytes, mdhd._1 + 4 + 8 + 8) else u32(bytes, mdhd._1 + 4 + 4 + 4)
    }
    val stbl = child(bytes, mdia, "minf").flatMap(child(bytes, _, "stbl"))
      .getOrElse(throw new IllegalArgumentException("no stbl box"))
    def full(name: String): (Int, Int) = child(bytes, stbl, name)
      .getOrElse(throw new IllegalArgumentException(s"no $name box"))

    // stts -> per-sample DTS
    val stts = full("stts")
    val sttsN = u32(bytes, stts._1 + 4).toInt
    val dts = Seq.newBuilder[Long]
    var t = 0L
    var e = 0
    while (e < sttsN) {
      val cnt = u32(bytes, stts._1 + 8 + e * 8).toInt
      val delta = u32(bytes, stts._1 + 12 + e * 8)
      var i = 0
      while (i < cnt) { dts += t; t += delta; i += 1 }
      e += 1
    }
    val dtsArr = dts.result()
    val n = dtsArr.length

    // stsz -> sizes
    val stsz = full("stsz")
    val uniform = u32(bytes, stsz._1 + 4)
    val stszN = u32(bytes, stsz._1 + 8).toInt
    require(stszN == n, s"stsz count $stszN != stts sample count $n")
    val sizes: IndexedSeq[Long] =
      if (uniform != 0) IndexedSeq.fill(n)(uniform)
      else (0 until n).map(i => u32(bytes, stsz._1 + 12 + i * 4))

    // stco/co64 -> chunk bases
    val chunkBases: IndexedSeq[Long] =
      child(bytes, stbl, "stco") match {
        case Some((s, _)) =>
          (0 until u32(bytes, s + 4).toInt).map(i => u32(bytes, s + 8 + i * 4))
        case None =>
          val (s, _) = full("co64")
          (0 until u32(bytes, s + 4).toInt).map(i => u64(bytes, s + 8 + i * 8))
      }

    // stsc runs -> samples per chunk, expanded over the chunk list
    val stsc = full("stsc")
    val stscN = u32(bytes, stsc._1 + 4).toInt
    val runs = (0 until stscN).map { i =>
      (u32(bytes, stsc._1 + 8 + i * 12).toInt, // first_chunk (1-based)
        u32(bytes, stsc._1 + 12 + i * 12).toInt) // samples_per_chunk
    }
    require(runs.headOption.forall(_._1 == 1), "stsc must start at chunk 1")

    // walk chunks in order, assigning samples and absolute offsets
    val out = Seq.newBuilder[Sample]
    var sampleIdx = 0
    var run = 0
    var chunk = 0
    while (chunk < chunkBases.length && sampleIdx < n) {
      while (run + 1 < runs.length && runs(run + 1)._1 <= chunk + 1) run += 1
      val spc = runs(run)._2
      var within = 0
      var off = chunkBases(chunk)
      while (within < spc && sampleIdx < n) {
        out += Sample(sampleIdx, dtsArr(sampleIdx), sizes(sampleIdx), off)
        off += sizes(sampleIdx)
        sampleIdx += 1
        within += 1
      }
      chunk += 1
    }
    require(sampleIdx == n,
      s"chunk walk placed $sampleIdx of $n samples — stsc/stco disagree with stsz")
    TrackIndex(timescale, out.result())
  }
}
