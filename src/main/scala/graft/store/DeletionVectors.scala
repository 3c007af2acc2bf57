package graft.store

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Delta deletion vectors (PROTOCOL.md "Deletion Vectors"): a per-file
  * bitmap of DEAD physical row indexes, carried on the `add` action as
  * a descriptor — inline (z85 text in the log) or in a sidecar
  * `deletion_vector_<uuid>.bin` file. DVs are default-on for new
  * Databricks tables, so reading them is the difference between
  * opening a current table and refusing it.
  *
  * Everything here is implemented from the PUBLIC specs alone:
  *  - the Z85 text codec (ZeroMQ RFC 32; Delta pads to 4-byte groups
  *    and trims by the descriptor's sizeInBytes),
  *  - the 64-bit "portable" Roaring bitmap layout
  *    (RoaringFormatSpec: magic 1681511377 LE, uint64 bitmap count,
  *    per bitmap a uint32 high key + the standard 32-bit roaring
  *    serialization with array / bitmap / run containers),
  *  - the DV file framing (1 version byte, then per DV:
  *    [size int BE][data][crc32 BE] — the size/checksum ints are
  *    big-endian while the roaring data itself is little-endian).
  *
  * Scale shape: descriptors are log METADATA (tiny), but a bitmap can
  * hold millions of positions per file — so decoding happens on
  * EXECUTORS ([[positions]] is task-callable), never expanded on the
  * driver. The serializer exists for tests/fixtures and future write
  * support; [[deserialize]]([[serialize]](x)) == x is spec-pinned.
  */
object DeletionVectors {

  /** The descriptor as it appears on `add.deletionVector`. */
  final case class Descriptor(
      storageType: String, // "i" inline | "u" relative uuid | "p" absolute
      pathOrInlineDv: String,
      offset: Option[Int],
      sizeInBytes: Int,
      cardinality: Long)
      extends Serializable

  /** Magic number of the portable RoaringBitmapArray serialization. */
  val Magic: Int = 1681511377

  // ---------------------------------------------------------------
  // Z85 (ZeroMQ base85) — Delta's text codec for inline DVs and the
  // uuid in "u"-storage paths
  // ---------------------------------------------------------------

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Byte] = {
    val t = Array.fill[Byte](128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => t(c.toInt) = i.toByte }
    t
  }

  /** Encode bytes as Z85, zero-padding the input to a 4-byte multiple
    * (Delta's convention — the descriptor's sizeInBytes recovers the
    * true length on decode). */
  def z85Encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else java.util.Arrays.copyOf(bytes, bytes.length + (4 - bytes.length % 4))
    val sb = new java.lang.StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = ((padded(i) & 0xFFL) << 24) | ((padded(i + 1) & 0xFFL) << 16) |
        ((padded(i + 2) & 0xFFL) << 8) | (padded(i + 3) & 0xFFL)
      val chunk = new Array[Char](5)
      var j = 4
      while (j >= 0) { chunk(j) = Z85Alphabet((v % 85).toInt); v /= 85; j -= 1 }
      sb.append(chunk)
      i += 4
    }
    sb.toString
  }

  /** Decode a Z85 string (length must be a multiple of 5) to its
    * 4-byte-per-group binary form; trailing pad bytes stay — callers
    * trim with the known true length. */
  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0,
      s"z85: length ${s.length} is not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Decode(c.toInt) else -1
        require(d >= 0, s"z85: invalid character '$c'")
        v = v * 85 + d
        j += 1
      }
      require(v <= 0xFFFFFFFFL, "z85: group overflows 32 bits")
      out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
      i += 5; o += 4
    }
    out
  }

  /** The 20-char Z85 form of a UUID (16 big-endian bytes). */
  def encodeUuid(u: java.util.UUID): String = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
    z85Encode(bb.array())
  }

  private def decodeUuid(s: String): java.util.UUID = {
    val bytes = z85Decode(s)
    val bb = ByteBuffer.wrap(bytes)
    new java.util.UUID(bb.getLong(), bb.getLong())
  }

  /** Resolve a "u"/"p" descriptor to the DV file path: "p" is
    * absolute; "u" is `<root>/<randomPrefix>/deletion_vector_<uuid>
    * .bin` where pathOrInlineDv = randomPrefix ++ z85(uuid) and the
    * uuid is always the LAST 20 characters. */
  def sidecarPath(d: Descriptor, tableRoot: String): Path = d.storageType match {
    case "p" => new Path(d.pathOrInlineDv)
    case "u" =>
      require(d.pathOrInlineDv.length >= 20,
        s"DV path '${d.pathOrInlineDv}' shorter than a z85 uuid")
      val prefix = d.pathOrInlineDv.dropRight(20)
      val uuid = decodeUuid(d.pathOrInlineDv.takeRight(20))
      val name = s"deletion_vector_$uuid.bin"
      if (prefix.isEmpty) new Path(tableRoot, name)
      else new Path(new Path(tableRoot, prefix), name)
    case other => throw new IllegalArgumentException(
      s"DV storageType '$other' has no file path")
  }

  // ---------------------------------------------------------------
  // Portable 64-bit roaring (de)serialization
  // ---------------------------------------------------------------

  /** Decode the DV data bytes (magic + portable bitmap) to the sorted
    * array of dead row indexes. */
  def deserialize(data: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt()
    require(magic == Magic,
      s"DV data: magic $magic != $Magic — not a portable roaring bitmap")
    val n = bb.getLong()
    require(n >= 0 && n <= Int.MaxValue, s"DV data: bitmap count $n out of range")
    val out = new mutable.ArrayBuilder.ofLong
    var i = 0
    while (i < n) {
      val key = bb.getInt()
      require(key >= 0, s"DV data: negative high key $key")
      read32(bb, key.toLong << 32, out)
      i += 1
    }
    out.result()
  }

  /** One standard 32-bit roaring serialization, positions offset by
    * `base` (the 64-bit high key). */
  private def read32(bb: ByteBuffer, base: Long, out: mutable.ArrayBuilder.ofLong): Unit = {
    val cookie = bb.getInt()
    val hasRun = (cookie & 0xFFFF) == 12347
    val size =
      if (hasRun) (cookie >>> 16) + 1
      else {
        require((cookie & 0xFFFF) == 12346,
          s"roaring cookie ${cookie & 0xFFFF} unsupported")
        bb.getInt()
      }
    require(size >= 0 && size <= 65536, s"roaring container count $size out of range")
    val runFlags = new Array[Boolean](size)
    if (hasRun) {
      val flags = new Array[Byte]((size + 7) / 8)
      bb.get(flags)
      var i = 0
      while (i < size) {
        runFlags(i) = (flags(i / 8) & (1 << (i % 8))) != 0
        i += 1
      }
    }
    val keys = new Array[Int](size)
    val cards = new Array[Int](size)
    var i = 0
    while (i < size) {
      keys(i) = bb.getShort() & 0xFFFF
      cards(i) = (bb.getShort() & 0xFFFF) + 1
      i += 1
    }
    // offset header present iff the no-run cookie, or >= 4 containers
    if (!hasRun || size >= 4) bb.position(bb.position() + 4 * size)
    i = 0
    while (i < size) {
      val hi = base | (keys(i).toLong << 16)
      if (runFlags(i)) {
        val nRuns = bb.getShort() & 0xFFFF
        var r = 0
        while (r < nRuns) {
          val start = bb.getShort() & 0xFFFF
          val len = bb.getShort() & 0xFFFF
          var v = start
          while (v <= start + len) { out += (hi | v); v += 1 }
          r += 1
        }
      } else if (cards(i) > 4096) {
        var w = 0
        while (w < 1024) {
          var word = bb.getLong()
          val wBase = hi | (w.toLong << 6)
          while (word != 0) {
            out += (wBase | java.lang.Long.numberOfTrailingZeros(word))
            word &= word - 1
          }
          w += 1
        }
      } else {
        var j = 0
        while (j < cards(i)) { out += (hi | (bb.getShort() & 0xFFFF)); j += 1 }
      }
      i += 1
    }
  }

  /** Serialize sorted distinct non-negative positions to the portable
    * form (magic included) — array containers up to 4096 values, dense
    * chunks as bitmap containers, cookie 12346 with a valid offset
    * header, everything little-endian per the format spec. */
  def serialize(positions: Seq[Long]): Array[Byte] = {
    val sorted = positions.distinct.sorted
    sorted.foreach(p => require(p >= 0, s"negative position $p"))
    // high-32 key -> (high-16 chunk -> low-16 values)
    val byKey = mutable.LinkedHashMap.empty[Int, mutable.LinkedHashMap[Int, mutable.ArrayBuffer[Int]]]
    sorted.foreach { p =>
      val key = (p >>> 32).toInt
      val chunk = ((p >>> 16) & 0xFFFF).toInt
      val low = (p & 0xFFFF).toInt
      byKey.getOrElseUpdate(key, mutable.LinkedHashMap.empty)
        .getOrElseUpdate(chunk, mutable.ArrayBuffer.empty) += low
    }
    def containerBytes(vals: mutable.ArrayBuffer[Int]): Int =
      if (vals.size > 4096) 8192 else 2 * vals.size
    def bitmap32Bytes(chunks: mutable.LinkedHashMap[Int, mutable.ArrayBuffer[Int]]): Int =
      4 + 4 + 4 * chunks.size + 4 * chunks.size +
        chunks.valuesIterator.map(containerBytes).sum
    val total = 4 + 8 + byKey.valuesIterator.map(c => 4 + bitmap32Bytes(c)).sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(Magic)
    bb.putLong(byKey.size.toLong)
    byKey.foreach { case (key, chunks) =>
      bb.putInt(key)
      bb.putInt(12346) // SERIAL_COOKIE_NO_RUNCONTAINER
      bb.putInt(chunks.size)
      chunks.foreach { case (chunk, vals) =>
        bb.putShort(chunk.toShort)
        bb.putShort((vals.size - 1).toShort)
      }
      // offset header: container start relative to the cookie
      var off = 4 + 4 + 4 * chunks.size + 4 * chunks.size
      chunks.foreach { case (_, vals) =>
        bb.putInt(off)
        off += containerBytes(vals)
      }
      chunks.foreach { case (_, vals) =>
        if (vals.size > 4096) {
          val words = new Array[Long](1024)
          vals.foreach(v => words(v >>> 6) |= (1L << (v & 63)))
          words.foreach(bb.putLong)
        } else vals.foreach(v => bb.putShort(v.toShort))
      }
    }
    bb.array()
  }

  /** The full sidecar-file bytes holding ONE DV at offset 1:
    * [version 1][size BE][data][crc32-of-data BE]. */
  def sidecarFileBytes(data: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32()
    crc.update(data)
    val bb = ByteBuffer.allocate(1 + 4 + data.length + 4) // BIG endian framing
    bb.put(1.toByte).putInt(data.length).put(data).putInt(crc.getValue.toInt)
    bb.array()
  }

  /** Executor-callable: the dead row indexes of one descriptor. */
  def positions(d: Descriptor, tableRoot: String, hc: Configuration): Array[Long] = {
    val data: Array[Byte] = d.storageType match {
      case "i" =>
        val raw = z85Decode(d.pathOrInlineDv)
        require(raw.length >= d.sizeInBytes,
          s"inline DV decodes to ${raw.length} bytes < sizeInBytes ${d.sizeInBytes}")
        java.util.Arrays.copyOf(raw, d.sizeInBytes)
      case "u" | "p" =>
        val p = sidecarPath(d, tableRoot)
        val fs = p.getFileSystem(hc)
        val len = fs.getFileStatus(p).getLen
        require(len <= 256L * 1024 * 1024, s"$p: DV file over 256 MB — refusing")
        val bytes = new Array[Byte](len.toInt)
        val in = fs.open(p)
        try in.readFully(0, bytes) finally in.close()
        require(bytes.nonEmpty && bytes(0) == 1,
          s"$p: DV file format version ${if (bytes.isEmpty) "?" else bytes(0)} unsupported")
        slice(bytes, d.offset.getOrElse(1), d.sizeInBytes, p.toString)
      case other => throw new IllegalArgumentException(
        s"DV storageType '$other' unsupported — refusing rather than resurrecting rows")
    }
    val pos = deserialize(data)
    require(pos.length == d.cardinality,
      s"DV decodes to ${pos.length} positions but the descriptor declares " +
        s"cardinality ${d.cardinality} — refusing (corrupt or misread vector)")
    pos
  }

  /** Slice one DV out of a sidecar file. Primary layout per the Delta
    * writer: `offset` points at the 4-byte BIG-endian size prefix,
    * data follows, then a crc. Fallback (some writers point offset at
    * the data itself): the little-endian magic sits at `offset`
    * directly. Anything else refuses loudly. */
  private def slice(bytes: Array[Byte], offset: Int, size: Int, where: String): Array[Byte] = {
    require(offset >= 0 && offset + 4 <= bytes.length,
      s"$where: DV offset $offset out of bounds (${bytes.length} bytes)")
    def intBE(i: Int): Int =
      ((bytes(i) & 0xFF) << 24) | ((bytes(i + 1) & 0xFF) << 16) |
        ((bytes(i + 2) & 0xFF) << 8) | (bytes(i + 3) & 0xFF)
    def intLE(i: Int): Int =
      (bytes(i) & 0xFF) | ((bytes(i + 1) & 0xFF) << 8) |
        ((bytes(i + 2) & 0xFF) << 16) | ((bytes(i + 3) & 0xFF) << 24)
    if (intBE(offset) == size && offset.toLong + 4 + size <= bytes.length &&
        intLE(offset + 4) == Magic)
      java.util.Arrays.copyOfRange(bytes, offset + 4, offset + 4 + size)
    else if (intLE(offset) == Magic && offset.toLong + size <= bytes.length)
      java.util.Arrays.copyOfRange(bytes, offset, offset + size)
    else throw new IllegalArgumentException(
      s"$where: no deletion vector of $size bytes at offset $offset " +
        "(neither size-prefixed nor bare) — refusing rather than misreading")
  }
}
