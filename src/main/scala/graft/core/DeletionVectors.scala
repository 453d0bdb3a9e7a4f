package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Deletion-vector support for the Delta CONSUMER (reader protocol
  * feature `deletionVectors`, minReaderVersion 3): parse the
  * `deletionVector` descriptor a writer attaches to an `add` action,
  * resolve its bytes (inline or from a DV file), deserialize the
  * 64-bit roaring bitmap, and hand the reader the deleted ROW
  * POSITIONS of that file. All formats here are the public Delta
  * protocol's (PROTOCOL.md "Deletion Vectors") and the public roaring
  * interchange format (RoaringFormatSpec):
  *
  *  - descriptor: `{"storageType":"u"|"i"|"p","pathOrInlineDv":…,
  *    "offset":…,"sizeInBytes":…,"cardinality":…}`
  *  - `i` — the serialized bitmap itself, Z85-encoded inline
  *  - `u` — `<optional random prefix><Z85-encoded 16-byte uuid>`,
  *    naming `<prefix>/deletion_vector_<uuid>.bin` under the table
  *  - `p` — an explicit path
  *  - DV FILE framing: 1-byte format version (1); at `offset` a
  *    4-byte BIG-endian size, the bitmap bytes, then a 4-byte
  *    BIG-endian CRC-32 of those bytes (the framing ints are
  *    java.io.DataOutputStream's, unlike the bitmap's interior)
  *  - bitmap: "RoaringBitmapArray portable" — 4-byte LE magic
  *    1681511377, 8-byte LE bitmap count, then per 32-bit key-range a
  *    standard portable 32-bit roaring bitmap (cookie 12346/12347,
  *    array / bitmap / run containers, everything little-endian)
  *
  * Scale shape: ONE descriptor parse + ONE bounded byte read per
  * DV-carrying file, on the driver — the same O(files-with-DVs)
  * planning metadata every Delta reader holds. A DV's cardinality is
  * bounded by the rows of its single file (writers compact a file once
  * its DV grows dense), so materializing the positions of one file as
  * a join side is bounded by that file's own row count. */
object DeletionVectors {

  /** One add action's deletionVector descriptor. `offset` is only
    * present for on-disk storage. */
  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Long], sizeInBytes: Long, cardinality: Long)

  private val dvObjRe =
    """"deletionVector":\{((?:[^{}"]|"(?:[^"\\]|\\.)*")*)\}""".r
  private val strField = """"(\w+)":"((?:[^"\\]|\\.)*)"""".r
  private val numField = """"(\w+)":(-?\d+)""".r

  /** Parse the deletionVector descriptor off an add/remove action
    * line; None when the action carries none. The object regex admits
    * quoted strings containing braces (paths), but no nested objects —
    * the descriptor schema is flat. */
  def descriptorOf(line: String): Option[Descriptor] =
    dvObjRe.findFirstMatchIn(line).map { m =>
      val body = m.group(1)
      // JSON-unescape string values like every extractor in
      // DeltaExport — a foreign writer may escape slashes or unicode
      // in a 'p' path, and using the raw escapes would miss the file
      // (and let vacuum reclaim a still-referenced .bin)
      val strs = strField.findAllMatchIn(body)
        .map(e => e.group(1) -> DeltaExport.unescapeJson(e.group(2))).toMap
      val nums = numField.findAllMatchIn(body)
        .map(e => e.group(1) -> e.group(2).toLong).toMap
      Descriptor(
        strs.getOrElse("storageType",
          throw new IllegalStateException(s"deletionVector without storageType: $line")),
        strs.getOrElse("pathOrInlineDv",
          throw new IllegalStateException(s"deletionVector without pathOrInlineDv: $line")),
        nums.get("offset"),
        nums.getOrElse("sizeInBytes", -1L),
        nums.getOrElse("cardinality", -1L))
    }

  /** JSON form of a descriptor — the writer side of [[descriptorOf]],
    * used by the spec fixtures (graft itself never writes DVs). */
  def descriptorJson(d: Descriptor): String = {
    // descriptorOf unescapes on parse, so rendering must escape — a
    // foreign 'p'-storage path (or a 'u' prefix) carrying a quote or
    // backslash would otherwise corrupt the commit line RESTORE
    // re-serializes it into
    val off = d.offset.map(o => s""","offset":$o""").getOrElse("")
    s"""{"storageType":"${DeltaExport.esc(d.storageType)}","pathOrInlineDv":"${DeltaExport.esc(d.pathOrInlineDv)}"$off,"sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}"""
  }

  // ---- Z85 (the base85 variant Delta uses for inline DVs and uuids) ----

  private val z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val z85Decode: Array[Int] = {
    val a = Array.fill(128)(-1)
    z85Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def z85decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 length not a multiple of 5: ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var acc = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val v = if (c < 128) z85Decode(c.toInt) else -1
        require(v >= 0, s"invalid Z85 character '$c'")
        acc = acc * 85 + v
        j += 1
      }
      val o = i / 5 * 4
      out(o) = (acc >>> 24).toByte
      out(o + 1) = (acc >>> 16).toByte
      out(o + 2) = (acc >>> 8).toByte
      out(o + 3) = acc.toByte
      i += 5
    }
    out
  }

  /** Z85 encode, zero-padding to 4-byte alignment (the codec requires
    * it; a decoder truncates back via the descriptor's sizeInBytes). */
  def z85encode(b0: Array[Byte]): String = {
    val b = if (b0.length % 4 == 0) b0
      else java.util.Arrays.copyOf(b0, (b0.length / 4 + 1) * 4)
    val sb = new StringBuilder(b.length / 4 * 5)
    var i = 0
    while (i < b.length) {
      var acc = ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
      val chunk = new Array[Char](5)
      var j = 4
      while (j >= 0) { chunk(j) = z85Alphabet(((acc % 85).toInt)); acc /= 85; j -= 1 }
      sb.appendAll(chunk)
      i += 4
    }
    sb.toString
  }

  // ---- portable RoaringBitmapArray (the 64-bit serialization) ----

  private val PortableMagic = 1681511377
  private val SerialCookie = 12347
  private val SerialCookieNoRuns = 12346
  private val NoOffsetThreshold = 4

  private final class Reader(val b: Array[Byte]) {
    var pos = 0
    def u8(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    def u16le(): Int = { val v = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8); pos += 2; v }
    def i32le(): Int = {
      val v = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) |
        ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    def i64le(): Long = {
      val lo = i32le() & 0xffffffffL
      val hi = i32le() & 0xffffffffL
      lo | (hi << 32)
    }
  }

  /** Deserialize a portable RoaringBitmapArray into its sorted member
    * values (each = key-range index << 32 | low-32 value) — the row
    * positions a DV deletes. Containers are read SEQUENTIALLY; the
    * optional offset header (a seek aid) is skipped. */
  def deserializePortable(bytes: Array[Byte]): Array[Long] = {
    val r = new Reader(bytes)
    val magic = r.i32le()
    require(magic == PortableMagic,
      s"not a portable RoaringBitmapArray (magic $magic != $PortableMagic)")
    val nBitmaps = r.i64le()
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue,
      s"implausible bitmap count $nBitmaps")
    val out = Array.newBuilder[Long]
    var bm = 0L
    while (bm < nBitmaps) {
      val high = bm << 32
      val cookie = r.i32le()
      val (nContainers, runFlags) =
        if ((cookie & 0xffff) == SerialCookie) {
          val n = (cookie >>> 16) + 1
          val flags = new Array[Byte]((n + 7) / 8)
          var i = 0
          while (i < flags.length) { flags(i) = r.u8().toByte; i += 1 }
          (n, flags)
        } else {
          require(cookie == SerialCookieNoRuns,
            s"unrecognized roaring cookie $cookie")
          (r.i32le(), Array.empty[Byte])
        }
      val keys = new Array[Int](nContainers)
      val cards = new Array[Int](nContainers)
      var i = 0
      while (i < nContainers) {
        keys(i) = r.u16le(); cards(i) = r.u16le() + 1; i += 1
      }
      val hasOffsets = (cookie & 0xffff) == SerialCookieNoRuns ||
        nContainers >= NoOffsetThreshold
      if (hasOffsets) r.pos += 4 * nContainers // seek aid, unused
      def isRun(c: Int): Boolean =
        runFlags.nonEmpty && ((runFlags(c / 8) & (1 << (c % 8))) != 0)
      i = 0
      while (i < nContainers) {
        val base = high | (keys(i).toLong << 16)
        if (isRun(i)) {
          val nRuns = r.u16le()
          var j = 0
          while (j < nRuns) {
            val start = r.u16le(); val len = r.u16le()
            var v = 0
            while (v <= len) { out += (base | (start + v).toLong); v += 1 }
            j += 1
          }
        } else if (cards(i) <= 4096) {
          var j = 0
          while (j < cards(i)) { out += (base | r.u16le().toLong); j += 1 }
        } else {
          var w = 0
          while (w < 1024) {
            val word = r.i64le()
            if (word != 0L) {
              var bit = 0
              while (bit < 64) {
                if ((word & (1L << bit)) != 0L)
                  out += (base | ((w * 64 + bit).toLong))
                bit += 1
              }
            }
            w += 1
          }
        }
        i += 1
      }
      bm += 1
    }
    out.result()
  }

  /** Serialize sorted non-negative positions as a portable
    * RoaringBitmapArray (no-run cookie; ARRAY containers up to 4096
    * values per 16-bit key, BITMAP containers past that — the density
    * rule of the format). The writer side of the DV-writing DELETE and
    * the spec fixtures; the reader above additionally handles run
    * containers other writers emit. */
  def serializePortable(positions: Seq[Long]): Array[Byte] = {
    require(positions.forall(_ >= 0), "positions must be non-negative")
    val sorted = positions.distinct.sorted
    val byBitmap = sorted.groupBy(_ >>> 32).toSeq.sortBy(_._1)
    val nBitmaps = if (byBitmap.isEmpty) 0L else byBitmap.last._1 + 1
    val bos = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = bos.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >>> 8) }
    def w32(v: Int): Unit = { w16(v); w16(v >>> 16) }
    def w64(v: Long): Unit = { w32(v.toInt); w32((v >>> 32).toInt) }
    w32(PortableMagic)
    w64(nBitmaps)
    val map = byBitmap.toMap
    (0L until nBitmaps).foreach { bm =>
      val vals = map.getOrElse(bm, Seq.empty).map(v => (v & 0xffffffffL).toInt)
      val byKey = vals.groupBy(v => v >>> 16).toSeq.sortBy(_._1)
      w32(SerialCookieNoRuns)
      w32(byKey.size)
      byKey.foreach { case (k, vs) => w16(k); w16(vs.size - 1) }
      // offset header (mandatory with the no-run cookie)
      var off = 4 + 4 + 4 * byKey.size + 4 * byKey.size
      byKey.foreach { case (_, vs) =>
        w32(off); off += (if (vs.size <= 4096) 2 * vs.size else 8192)
      }
      byKey.foreach { case (_, vs) =>
        if (vs.size <= 4096) vs.foreach(v => w16(v & 0xffff))
        else {
          val words = new Array[Long](1024)
          vs.foreach { v =>
            val low = v & 0xffff
            words(low / 64) |= (1L << (low % 64))
          }
          words.foreach(w64)
        }
      }
    }
    bos.toByteArray
  }

  /** Resolve a descriptor to its bitmap bytes. On-disk reads verify
    * the file framing (format version, size, CRC-32). */
  def resolveBytes(tableDir: String, d: Descriptor): Array[Byte] =
    d.storageType match {
      case "i" =>
        val b = z85decode(d.pathOrInlineDv)
        // the encoder zero-pads to Z85's 4-byte alignment; sizeInBytes
        // names the true length, so strip at most 3 padding bytes
        require(d.sizeInBytes < 0 ||
            (b.length >= d.sizeInBytes && b.length - d.sizeInBytes < 4),
          s"inline DV decodes to ${b.length} bytes, descriptor says ${d.sizeInBytes}")
        if (d.sizeInBytes >= 0 && b.length != d.sizeInBytes)
          java.util.Arrays.copyOf(b, d.sizeInBytes.toInt)
        else b
      case "u" =>
        readFromFile(
          Paths.get(tableDir, referencedRelPath(d).get).toString, d)
      case "p" =>
        val p = d.pathOrInlineDv
        readFromFile(
          if (p.startsWith("/")) p else Paths.get(tableDir, p).toString, d)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported deletionVector storageType '$other'")
    }

  /** The table-RELATIVE file a descriptor references — None for
    * inline storage and for absolute 'p' paths (which live outside
    * the table and are never this table's to reclaim). The vacuum
    * surface: a `.bin` the latest snapshot does not reference through
    * this is reclaimable. */
  def referencedRelPath(d: Descriptor): Option[String] = d.storageType match {
    case "u" =>
      val enc = d.pathOrInlineDv
      require(enc.length >= 20, s"uuid DV path too short: ${enc.length}")
      val prefix = enc.substring(0, enc.length - 20)
      val uuidBytes = z85decode(enc.substring(enc.length - 20))
      val bb = java.nio.ByteBuffer.wrap(uuidBytes)
      val uuid = new java.util.UUID(bb.getLong, bb.getLong)
      Some((if (prefix.nonEmpty) prefix + "/" else "") +
        s"deletion_vector_$uuid.bin")
    case "p" if !d.pathOrInlineDv.startsWith("/") =>
      Some(d.pathOrInlineDv)
    case _ => None
  }

  private def readFromFile(path: String, d: Descriptor): Array[Byte] = {
    val all = Files.readAllBytes(Paths.get(path))
    require(all.nonEmpty && all(0) == 1,
      s"unsupported DV file format version ${if (all.isEmpty) "<empty>" else all(0)} in $path")
    val off = d.offset.getOrElse(
      throw new IllegalArgumentException(
        s"on-disk deletionVector without offset: $path")).toInt
    def i32be(p: Int): Int =
      ((all(p) & 0xff) << 24) | ((all(p + 1) & 0xff) << 16) |
        ((all(p + 2) & 0xff) << 8) | (all(p + 3) & 0xff)
    val size = i32be(off)
    require(d.sizeInBytes < 0 || size == d.sizeInBytes,
      s"DV at $path:$off has size $size, descriptor says ${d.sizeInBytes}")
    val data = java.util.Arrays.copyOfRange(all, off + 4, off + 4 + size)
    val crc = new java.util.zip.CRC32()
    crc.update(data)
    val stored = i32be(off + 4 + size) & 0xffffffffL
    require(crc.getValue == stored,
      s"DV checksum mismatch at $path:$off (computed ${crc.getValue}, stored $stored)")
    data
  }

  /** The deleted row positions a descriptor denotes, cardinality-
    * checked against the descriptor's own claim. */
  def positions(tableDir: String, d: Descriptor): Array[Long] = {
    val out = deserializePortable(resolveBytes(tableDir, d))
    require(d.cardinality < 0 || out.length == d.cardinality,
      s"DV decodes to ${out.length} positions, descriptor says ${d.cardinality}")
    out
  }

  /** Write a DV FILE holding one vector (spec fixtures): returns the
    * descriptor pointing at it with `u` storage. */
  def writeDvFile(tableDir: String, positions: Seq[Long]): Descriptor = {
    val data = serializePortable(positions)
    val uuid = java.util.UUID.randomUUID()
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(1) // format version
    val offset = 1
    def w32be(v: Int): Unit = {
      bos.write((v >>> 24) & 0xff); bos.write((v >>> 16) & 0xff)
      bos.write((v >>> 8) & 0xff); bos.write(v & 0xff)
    }
    w32be(data.length)
    bos.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(data)
    w32be(crc.getValue.toInt)
    Files.write(Paths.get(tableDir, s"deletion_vector_$uuid.bin"),
      bos.toByteArray)
    Descriptor("u", z85encode(bb.array()), Some(offset.toLong),
      data.length.toLong, positions.distinct.size.toLong)
  }
}
