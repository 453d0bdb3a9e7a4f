package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata (north-star surface).
  *
  * The Spark-side machinery — schema, partition sizing, batch-shaped
  * per-partition processing — is real, and so is HEADER decoding for
  * actual JPEG files ([[Multimodal.JpegCodec]], a T.81 marker walk over
  * real magic bytes, fed by the JDK's own JPEG encoder in tests). The
  * remaining stand-in is pixel-DATA decoding (`FakeCodec` payloads),
  * because full media codecs aren't in this container. Swap the payload
  * branch for a real decoder (or a `mapInPandas`/`mapInArrow` stage in
  * the Python API) and nothing else changes.
  */
object Multimodal {

  /** Typed metadata carried alongside every blob. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("content", BinaryType),
    StructField("meta", mediaMetaType)))

  /** Deterministic stand-in codec: "media" blobs carry a 12-byte header
    * (3×int32 big-endian: magic, width, height). Real decoders plug in
    * here — the contract is bytes in, typed struct out. */
  object FakeCodec {
    val Magic = 0x47524654 // "GRFT"

    def encode(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + payload.length)
      bb.putInt(Magic).putInt(width).putInt(height).put(payload)
      bb.array()
    }

    /** bytes → (width, height) or null on bad magic (dirty-data policy:
      * NULL, never throw — same posture as try_cast). */
    def decodeHeader(bytes: Array[Byte]): Option[(Int, Int)] = {
      if (bytes == null || bytes.length < 12) None
      else {
        val bb = java.nio.ByteBuffer.wrap(bytes)
        if (bb.getInt() != Magic) None else Some((bb.getInt(), bb.getInt()))
      }
    }
  }

  /** REAL JPEG header decode (ITU T.81 §B.2, the public interchange
    * format): walk the marker segments from SOI to the first SOFn frame
    * header and read the true pixel dimensions. This is an actual-bytes
    * parser — JFIF and EXIF files both pass through it, because APPn
    * segments are length-skipped like any other — so the one remaining
    * stand-in in the multimodal path is pixel DATA decoding (the
    * entropy-coded scan), not header metadata. Same never-throw policy
    * as [[FakeCodec]]: anything malformed is None, not an exception. */
  object JpegCodec {
    def decodeHeader(bytes: Array[Byte]): Option[(Int, Int)] = {
      if (bytes == null || bytes.length < 4) return None
      def u8(i: Int) = bytes(i) & 0xFF
      def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
      if (u8(0) != 0xFF || u8(1) != 0xD8) return None // not SOI
      var i = 2
      while (i + 3 < bytes.length) {
        if (u8(i) != 0xFF) return None // lost marker sync
        u8(i + 1) match {
          case 0xFF => i += 1 // fill byte before a marker
          case m if m == 0x01 || (m >= 0xD0 && m <= 0xD7) =>
            i += 2 // standalone markers carry no length
          case 0xDA | 0xD9 => return None // scan data / EOI before any SOF
          case m =>
            val len = u16(i + 2)
            if (len < 2 || i + 2 + len > bytes.length) return None
            // SOFn = C0..CF minus DHT(C4)/JPG(C8)/DAC(CC); payload is
            // [precision:1][height:2][width:2][components...]
            if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
              if (len < 7) return None
              return Some((u16(i + 7), u16(i + 5)))
            }
            i += 2 + len
        }
      }
      None
    }
  }

  /** REAL PNG header decode (RFC 2083 / ISO 15948): the 8-byte
    * signature followed by the mandatory first IHDR chunk, whose
    * payload leads with width and height as big-endian uint32. The
    * spec REQUIRES IHDR first, so a fixed-offset read after validating
    * both the signature and the chunk tag is a conforming parse, not a
    * shortcut. Same never-throw policy as the other codecs. */
  object PngCodec {
    private val Signature =
      Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

    def decodeHeader(bytes: Array[Byte]): Option[(Int, Int)] = {
      if (bytes == null || bytes.length < 24) return None
      var i = 0
      while (i < 8) {
        if (bytes(i) != Signature(i)) return None
        i += 1
      }
      def u32(o: Int): Long =
        ((bytes(o) & 0xFFL) << 24) | ((bytes(o + 1) & 0xFFL) << 16) |
          ((bytes(o + 2) & 0xFFL) << 8) | (bytes(o + 3) & 0xFFL)
      // chunk at 8: [len:4]["IHDR"][width:4][height:4]...
      if (new String(bytes, 12, 4, "US-ASCII") != "IHDR") return None
      val (w, h) = (u32(16), u32(20))
      if (w < 1 || h < 1 || w > Int.MaxValue || h > Int.MaxValue) None
      else Some((w.toInt, h.toInt))
    }
  }

  /** REAL AVI header decode (the public RIFF/AVI container — the same
    * word-aligned chunk walk as [[WavCodec]], with `RIFF…AVI ` in place
    * of `RIFF…WAVE`): descend into `LIST/hdrl` for the mandatory `avih`
    * main header (dwMicroSecPerFrame at +0, dwTotalFrames at +16,
    * dwStreams at +24, dwWidth/dwHeight at +32/+36 — the public
    * AVIMAINHEADER layout) and locate `LIST/movi`, whose `##db`/`##dc`
    * sub-chunks are the video frames. Headers are fully real here;
    * frame PAYLOAD decoding (the DIB/codec bits) stays out of scope
    * like JPEG's entropy scan. Never-throw policy like every codec:
    * malformed input is None. */
  object AviCodec {
    final case class AviInfo(width: Int, height: Int, totalFrames: Int,
        microSecPerFrame: Long, streams: Int, moviOffset: Int, moviBytes: Int)

    def decodeHeader(bytes: Array[Byte]): Option[AviInfo] = {
      if (bytes == null || bytes.length < 24) return None
      def u8(i: Int) = bytes(i) & 0xFF
      def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
      def u32(i: Int): Long = u16(i).toLong | (u16(i + 2).toLong << 16)
      def tag(i: Int) = new String(bytes, i, 4, "US-ASCII")
      if (tag(0) != "RIFF" || tag(8) != "AVI ") return None
      var avih: Option[(Int, Int, Int, Long, Int)] = None
      var movi: Option[(Int, Int)] = None
      // iterative walk over (chunkStart, rangeEnd) — LIST/hdrl pushes
      // its sub-range, every chunk pushes its own successor
      var stack = List((12, bytes.length))
      while (stack.nonEmpty) {
        val (i, end) = stack.head
        stack = stack.tail
        if (i + 8 <= end) {
          val id = tag(i)
          val len = u32(i + 4)
          if (len < 0 || i + 8 + len > end) return None
          stack = (i + 8 + len.toInt + (len.toInt & 1), end) :: stack
          if (id == "LIST" && len >= 4) {
            tag(i + 8) match {
              case "hdrl" => stack = (i + 12, i + 8 + len.toInt) :: stack
              case "movi" => movi = Some((i + 12, len.toInt - 4))
              case _ => ()
            }
          } else if (id == "avih") {
            if (len < 40) return None
            avih = Some((u32(i + 8 + 32).toInt, u32(i + 8 + 36).toInt,
              u32(i + 8 + 16).toInt, u32(i + 8), u32(i + 8 + 24).toInt))
          }
        }
      }
      for ((w, h, tf, uspf, st) <- avih; (mo, mb) <- movi)
        yield AviInfo(w, h, tf, uspf, st, mo, mb)
    }

    /** (offset, length) of each video frame chunk (`##db`
      * uncompressed / `##dc` compressed) in movi order — the real
      * frame index. Offsets point AT the payload, not the chunk
      * header. Empty on any malformed sub-chunk (never-throw). */
    def frameChunks(bytes: Array[Byte],
        info: AviInfo): Array[(Int, Int)] = {
      def u16(i: Int) = (bytes(i) & 0xFF) | ((bytes(i + 1) & 0xFF) << 8)
      def u32(i: Int): Long = u16(i).toLong | (u16(i + 2).toLong << 16)
      val out = Array.newBuilder[(Int, Int)]
      var i = info.moviOffset
      val end = math.min(info.moviOffset + info.moviBytes, bytes.length)
      while (i + 8 <= end) {
        val id = new String(bytes, i, 4, "US-ASCII")
        val len = u32(i + 4)
        if (len < 0 || i + 8 + len > end) return Array.empty
        if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
            (id.endsWith("db") || id.endsWith("dc")))
          out += ((i + 8, len.toInt))
        i += 8 + len.toInt + (len.toInt & 1)
      }
      out.result()
    }
  }

  /** REAL MP4 / ISO-BMFF header decode (ISO/IEC 14496-12, the public
    * base-media spec — the modern container beside [[AviCodec]]'s
    * RIFF): the length-prefixed big-endian box walk with the 64-bit
    * `largesize` and size-0 to-EOF forms, descending `moov` → `mvhd`
    * (timescale/duration, version 0 and 1 layouts) and `moov` → `trak`
    * → { `tkhd` (16.16 fixed-point dims, both versions), `mdia` →
    * `hdlr` (track kind: vide/soun) }. Sample tables and mdat codec
    * payloads stay out of scope like JPEG's entropy scan and AVI's DIB
    * frames. Never-throw policy like every codec: truncated or
    * malformed boxes yield None, never a partial guess. */
  object Mp4Codec {
    final case class Mp4Info(majorBrand: String, timescale: Long,
        duration: Long, trackCount: Int, videoTracks: Int,
        audioTracks: Int, width: Int, height: Int)

    def decodeHeader(bytes: Array[Byte]): Option[Mp4Info] = {
      if (bytes == null || bytes.length < 16) return None
      def u8(i: Int) = bytes(i) & 0xFF
      def u32(i: Int): Long = (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
        (u8(i + 2).toLong << 8) | u8(i + 3).toLong
      def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
      def tag(i: Int) = new String(bytes, i, 4, "US-ASCII")
      var ok = true
      // (type, payloadStart, payloadEnd) of every box in [from, to) —
      // a box that overruns its range, or trailing slack that is not a
      // whole box, marks the file malformed
      def children(from: Int, to: Int): Seq[(String, Int, Int)] = {
        val out = Seq.newBuilder[(String, Int, Int)]
        var i = from
        while (ok && i < to) {
          if (i + 8 > to) { ok = false }
          else {
            val size0 = u32(i)
            val t = tag(i + 4)
            if (size0 == 0L) { out += ((t, i + 8, to)); i = to }
            else if (size0 == 1L) {
              if (i + 16 > to) ok = false
              else {
                val ls = u64(i + 8)
                if (ls < 16 || i.toLong + ls > to) ok = false
                else { out += ((t, i + 16, i + ls.toInt)); i += ls.toInt }
              }
            } else if (size0 < 8 || i.toLong + size0 > to) ok = false
            else { out += ((t, i + 8, i + size0.toInt)); i += size0.toInt }
          }
        }
        if (!ok) Seq.empty else out.result()
      }
      var brand: Option[String] = None
      var timescale = 0L
      var duration = 0L
      var tracks = 0; var vide = 0; var soun = 0
      var width = 0; var height = 0
      for ((t, p, e) <- children(0, bytes.length)) t match {
        case "ftyp" =>
          if (p + 4 > e) ok = false else brand = Some(tag(p))
        case "moov" =>
          for ((t2, p2, e2) <- children(p, e)) t2 match {
            case "mvhd" =>
              if (p2 + 4 > e2) ok = false
              else if (u8(p2) == 0) {
                if (p2 + 20 > e2) ok = false
                else { timescale = u32(p2 + 12); duration = u32(p2 + 16) }
              } else {
                if (p2 + 32 > e2) ok = false
                else { timescale = u32(p2 + 20); duration = u64(p2 + 24) }
              }
            case "trak" =>
              tracks += 1
              var tw = 0; var th = 0; var kind = ""
              for ((t3, p3, e3) <- children(p2, e2)) t3 match {
                case "tkhd" =>
                  if (p3 + 4 > e3) ok = false
                  else {
                    // width/height are 16.16 fixed at the END of the
                    // payload: v0 offsets 76/80, v1 (64-bit times) 88/92
                    val off = if (u8(p3) == 0) 76 else 88
                    if (p3 + off + 8 > e3) ok = false
                    else {
                      tw = (u32(p3 + off) >> 16).toInt
                      th = (u32(p3 + off + 4) >> 16).toInt
                    }
                  }
                case "mdia" =>
                  for ((t4, p4, e4) <- children(p3, e3)) t4 match {
                    case "hdlr" =>
                      if (p4 + 12 > e4) ok = false else kind = tag(p4 + 8)
                    case _ => ()
                  }
                case _ => ()
              }
              if (kind == "vide") {
                vide += 1
                if (width == 0) { width = tw; height = th }
              } else if (kind == "soun") soun += 1
            case _ => ()
          }
        case _ => ()
      }
      if (!ok || brand.isEmpty || timescale <= 0) None
      else Some(Mp4Info(brand.get, timescale, duration, tracks, vide,
        soun, width, height))
    }
  }

  /** Assemble a spec-shaped MP4: ftyp + moov(mvhd v0 + one trak per
    * (kind, w, h) with tkhd dims and an mdia/hdlr kind) + a small mdat.
    * Big-endian throughout (the ISO-BMFF rule, unlike RIFF). */
  def mp4Bytes(timescale: Int, durationTicks: Int,
      tracks: Seq[(String, Int, Int)]): Array[Byte] = {
    def box(t: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(t.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0) ++ "isom".getBytes("US-ASCII") ++
      "mp42".getBytes("US-ASCII"))
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100) // v0 payload
      bb.putInt(0)                       // version + flags
        .putInt(0).putInt(0)             // creation / modification
        .putInt(timescale).putInt(durationTicks)
        .putInt(0x00010000)              // rate 1.0
        .putShort(0x0100.toShort)        // volume
      bb.array()                         // matrix/reserved stay zero
    }
    val traks = tracks.zipWithIndex.map { case ((kind, w, h), ix) =>
      val tkhd = {
        val bb = java.nio.ByteBuffer.allocate(84) // v0 payload
        bb.putInt(0x00000007)            // version 0, enabled flags
          .putInt(0).putInt(0)           // creation / modification
          .putInt(ix + 1)                // track id
          .putInt(0)                     // reserved
          .putInt(durationTicks)
        bb.position(76)
        bb.putInt(w << 16).putInt(h << 16) // 16.16 fixed dims
        bb.array()
      }
      val hdlr = {
        val bb = java.nio.ByteBuffer.allocate(25)
        bb.putInt(0).putInt(0).put(kind.getBytes("US-ASCII"))
        bb.array()                       // reserved + empty name
      }
      box("trak", box("tkhd", tkhd) ++ box("mdia", box("hdlr", hdlr)))
    }
    val moov = box("moov", box("mvhd", mvhd) ++ traks.flatten)
    val mdat = box("mdat", Array.fill(8)(0.toByte))
    ftyp ++ moov ++ mdat
  }

  /** MP4-typed metadata per blob (one narrow per-partition pass like
    * [[decodeMeta]], fields container-typed rather than width/height
    * alone): (media_id, brand, timescale, duration_ticks, tracks,
    * video_tracks, audio_tracks, width, height, n_bytes, valid). */
  def decodeMp4Meta(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("brand", StringType, nullable = true),
      StructField("timescale", LongType, nullable = true),
      StructField("duration_ticks", LongType, nullable = true),
      StructField("tracks", IntegerType, nullable = true),
      StructField("video_tracks", IntegerType, nullable = true),
      StructField("audio_tracks", IntegerType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_bytes", LongType),
      StructField("valid", BooleanType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          Mp4Codec.decodeHeader(bytes) match {
            case Some(m) => Row(id, m.majorBrand, m.timescale, m.duration,
              m.trackCount, m.videoTracks, m.audioTracks, m.width,
              m.height, bytes.length.toLong, true)
            case None => Row(id, null, null, null, null, null, null, null,
              null, if (bytes == null) 0L else bytes.length.toLong, false)
          }
        }
      }(enc)
      .toDF()
  }

  /** Deterministic MP4 media table from the documents table: one
    * container per doc with closed-form parameters (dims from
    * doc_id % 7, duration seconds from doc_id % 13, one video track
    * plus doc_id % 3 audio tracks) — synthesis runs executor-side in
    * the same narrow pass shape as decode, so the fixture scales with
    * the table. The closed forms let a DuckDB oracle replay the whole
    * decode analytically (q171). */
  def syntheticMp4MediaFromDocs(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType))))
    docs.select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val k = (id % 7).toInt
          val durS = (id % 13).toInt + 1
          val audio = (id % 3).toInt
          val tracks = ("vide", 16 * (k + 1), 9 * (k + 1)) +:
            Seq.fill(audio)(("soun", 0, 0))
          Row(id, mp4Bytes(600, 600 * durS, tracks))
        }
      }(enc)
      .toDF()
  }

  /** Codec dispatch on real magic bytes: JPEG SOI (FF D8) routes to the
    * [[JpegCodec]] marker walk, the PNG signature to [[PngCodec]]'s
    * IHDR read, `RIFF…AVI ` to [[AviCodec]]'s chunk descent, the
    * stand-in magic to [[FakeCodec]]. Returns (codec, width, height) —
    * with the AVI branch, every modality's header path parses actual
    * container bytes (WAV dispatches separately via
    * [[decodeAudioFeatures]], where the fields are audio-typed rather
    * than width/height). */
  def decodeHeaderAny(bytes: Array[Byte]): Option[(String, Int, Int)] =
    if (bytes != null && bytes.length >= 2 &&
        (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8)
      JpegCodec.decodeHeader(bytes).map { case (w, h) => ("jpeg", w, h) }
    else if (bytes != null && bytes.length >= 8 &&
        (bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P'.toByte)
      PngCodec.decodeHeader(bytes).map { case (w, h) => ("png", w, h) }
    else if (bytes != null && bytes.length >= 12 &&
        new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 4, "US-ASCII") == "AVI ")
      AviCodec.decodeHeader(bytes).map(a => ("avi", a.width, a.height))
    else if (bytes != null && bytes.length >= 12 &&
        new String(bytes, 4, 4, "US-ASCII") == "ftyp")
      Mp4Codec.decodeHeader(bytes).map(m => ("mp4", m.width, m.height))
    else
      FakeCodec.decodeHeader(bytes).map { case (w, h) => ("grft", w, h) }

  /** Decode headers per partition — the batch-shaped processing pattern:
    * one iterator pass per partition, no per-row task overhead, identical
    * shape to an Arrow-batch UDF. Emits (media_id, width, height, n_bytes,
    * valid). Dispatches per blob on REAL magic bytes
    * ([[decodeHeaderAny]]): actual JPEG files decode their true SOF
    * dimensions, stand-in blobs their declared ones — one mixed corpus,
    * one pass. */
  def decodeMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_bytes", LongType),
      StructField("valid", BooleanType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          decodeHeaderAny(bytes) match {
            case Some((_, w, h)) => Row(id, w, h, bytes.length.toLong, true)
            case None =>
              Row(id, null, null,
                if (bytes == null) 0L else bytes.length.toLong, false)
          }
        }
      }(enc)
      .toDF()
  }

  /** Header decode in PURE Catalyst expressions (no mapPartitions): the
    * 12-byte header is three big-endian int32 fields, readable with
    * substring/hex/conv — fully codegen'd and column-prunable, so a
    * metadata-only audit never leaves whole-stage codegen. Variable-
    * length marker formats (JPEG's segment walk) need [[decodeMeta]]'s
    * per-partition shape; this is the fast path for the fixed-header
    * stand-in format only. Output-identical to decodeMeta on stand-in
    * corpora (asserted in MultimodalSpec). */
  def decodeMetaExpr(media: DataFrame): DataFrame = {
    def be32(from: Int) =
      conv(hex(substring(col("content"), from, 4)), 16, 10).cast("long").cast("int")
    val valid = length(col("content")) >= 12 && be32(1) === FakeCodec.Magic
    media.select(
      col("media_id"),
      when(valid, be32(5)).as("width"),
      when(valid, be32(9)).as("height"),
      coalesce(length(col("content")).cast("long"), lit(0L)).as("n_bytes"),
      coalesce(valid, lit(false)).as("valid"))
  }

  /** "Resize": deterministic downsample stub — halves declared dims and
    * truncates payload, preserving the header contract. Runs as a narrow
    * per-partition pass like a real transform would. */
  def resizeHalf(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    media.select(col("media_id"), col("content"), col("meta"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          FakeCodec.decodeHeader(bytes) match {
            case Some((w, h)) =>
              val body = bytes.drop(12)
              val half = FakeCodec.encode(w / 2, h / 2,
                body.take(math.max(1, body.length / 4)))
              Row(id, half, Row("image", w / 2, h / 2, half.length.toLong))
            case None => Row(id, bytes, Row("unknown", null, null,
              if (bytes == null) 0L else bytes.length.toLong))
          }
        }
      }(enc)
      .toDF()
  }

  /** REAL pixel decode via the JDK's own ImageIO (JPEG/PNG/BMP/GIF —
    * every format the JRE ships a reader for): one iterator pass per
    * partition, each blob fully entropy-decoded to a BufferedImage and
    * reduced to per-channel mean intensities + true pixel dimensions.
    * This is the feature-extraction shape a vision pipeline runs
    * (decode → pool → embed), with the pooling here a deterministic
    * mean so the result is assertable. Blobs no JRE reader accepts
    * (including the GRFT stand-in format) emit valid=false with their
    * byte length — the mixed-corpus NULL policy of [[decodeMeta]].
    * Emits (media_id, width, height, mean_r, mean_g, mean_b, valid). */
  def decodePixels(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("mean_r", DoubleType, nullable = true),
      StructField("mean_g", DoubleType, nullable = true),
      StructField("mean_b", DoubleType, nullable = true),
      StructField("valid", BooleanType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img =
            if (bytes == null) null
            else
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes))
              catch { case _: java.io.IOException => null }
          if (img == null) Row(id, null, null, null, null, null, false)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF
                sb += rgb & 0xFF
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            Row(id, w, h, sr.toDouble / n, sg.toDouble / n,
              sb.toDouble / n, true)
          }
        }
      }(enc)
      .toDF()
  }

  /** Perceptual difference-hash (dHash) over the REAL pixel decode:
    * grayscale block means on a 9×8 grid (area averaging — every pixel
    * contributes once, no interpolation ambiguity), one bit per
    * horizontally adjacent cell pair (left < right), row-major — the
    * standard 64-bit dHash. Gradient-based, so it is invariant to
    * uniform brightness shifts and robust to re-encoding noise, which
    * is exactly what the exact-hash stage (q144) cannot catch: this is
    * the NEAR-dup second stage of an image dedup pipeline. Banding the
    * 64 bits (the SimHash machinery) gives corpus-scale candidate
    * generation without image×image pairs. Undecodable blobs come back
    * valid=false, never a throw — same never-throw posture as every
    * codec path here. */
  def dHash(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("dhash", LongType, nullable = true),
      StructField("valid", BooleanType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img =
            if (bytes == null) null
            else
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes))
              catch { case _: java.io.IOException => null }
          if (img == null || img.getWidth < 9 || img.getHeight < 8)
            Row(id, null, false)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            // 9x8 grid of grayscale block means (long sums, exact)
            val sums = Array.ofDim[Long](8, 9)
            val counts = Array.ofDim[Long](8, 9)
            var y = 0
            while (y < h) {
              val cy = math.min(y * 8 / h, 7)
              var x = 0
              while (x < w) {
                val cx = math.min(x * 9 / w, 8)
                val rgb = img.getRGB(x, y)
                val gray = (((rgb >> 16) & 0xFF) * 299 +
                  ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
                sums(cy)(cx) += gray
                counts(cy)(cx) += 1
                x += 1
              }
              y += 1
            }
            var bits = 0L
            var cy = 0
            while (cy < 8) {
              var cx = 0
              while (cx < 8) {
                // left < right compared exactly via cross-multiplication
                // (no double division)
                val lt = sums(cy)(cx) * counts(cy)(cx + 1) <
                  sums(cy)(cx + 1) * counts(cy)(cx)
                if (lt) bits |= 1L << (cy * 8 + cx)
                cx += 1
              }
              cy += 1
            }
            Row(id, bits, true)
          }
        }
      }(enc)
      .toDF()
  }

  /** [[syntheticJpegMedia]] plus a perceptual near-duplicate of every
    * image: the copy is the SAME gradient rendered `shift` brighter on
    * every channel (clamped) and re-encoded through the JDK JPEG
    * writer — different bytes (q144's exact hash misses it), same
    * gradients (dHash should catch it). Copy ids are original + 1000. */
  def syntheticJpegPairMedia(spark: SparkSession, n: Int = 3,
      idBase: Long = 9700000L, shift: Int = 12): DataFrame = {
    def render(i: Int, lift: Int): Array[Byte] = {
      val (w, h) = (64 + 32 * i, 48 + 24 * i)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      // per-image CONTENT must differ (dHash is scale-invariant, so
      // the same gradient at different sizes hashes identically):
      // rising gradient, falling gradient, grid-aligned checkerboard
      for (x <- 0 until w; y <- 0 until h) {
        val base = (i % 3) match {
          case 0 => x * 255 / w
          case 1 => 255 - x * 255 / w
          case _ => ((x * 9 / w + y * 8 / h) % 2) * 220
        }
        val r = math.min(base + lift, 255)
        val g = math.min(y * 255 / h + lift, 255)
        val b = math.min(lift, 255)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val rows = (0 until n).flatMap { i =>
      val (w, h) = (64 + 32 * i, 48 + 24 * i)
      val orig = render(i, 0)
      val near = render(i, shift)
      Seq(
        Row(idBase + i, orig, Row("image", w, h, orig.length.toLong)),
        Row(idBase + i + 1000L, near,
          Row("image", w, h, near.length.toLong)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), mediaSchema)
  }

  /** REAL image resample: ImageIO decode → area-preserving bilinear
    * scale to half dimensions (Graphics2D, RenderingHints.BILINEAR) →
    * re-encode JPEG with the JDK writer. The output blob is a genuine
    * JFIF file whose decoded dimensions are exactly (w/2, h/2) and
    * whose channel means track the source's (MultimodalSpec pins both)
    * — the thumbnail/preprocess stage of a multimodal training
    * pipeline, run as the same narrow per-partition pass as every
    * other media transform. Non-image blobs fall back to
    * [[resizeHalf]]'s stand-in header arithmetic, so a mixed corpus
    * resizes in one pass. */
  def resizeJpegHalf(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    media.select(col("media_id"), col("content"), col("meta"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img =
            if (bytes == null) null
            else
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes))
              catch { case _: java.io.IOException => null }
          if (img != null && img.getWidth >= 2 && img.getHeight >= 2) {
            val (w2, h2) = (img.getWidth / 2, img.getHeight / 2)
            val scaled = new java.awt.image.BufferedImage(
              w2, h2, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = scaled.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w2, h2, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(scaled, "jpg", bos)
            val out = bos.toByteArray
            Row(id, out, Row("image", w2, h2, out.length.toLong))
          } else FakeCodec.decodeHeader(bytes) match {
            case Some((w, h)) =>
              val body = bytes.drop(12)
              val half = FakeCodec.encode(w / 2, h / 2,
                body.take(math.max(1, body.length / 4)))
              Row(id, half, Row("image", w / 2, h / 2, half.length.toLong))
            case None => Row(id, bytes, Row("unknown", null, null,
              if (bytes == null) 0L else bytes.length.toLong))
          }
        }
      }(enc)
      .toDF()
  }

  /** REAL WAV/RIFF header decode (the public RIFF container + PCM
    * format chunk — microsoft multimedia file format, as documented in
    * every public WAV spec): walk the chunk list, read `fmt ` (PCM
    * only), locate `data`. PCM needs NO codec — the samples are right
    * there — so unlike video, the audio modality is fully real in this
    * container: header, features, and resampling all operate on
    * genuine playable bytes. Never-throw policy like the other codecs:
    * malformed/compressed input is None. */
  object WavCodec {
    final case class WavInfo(channels: Int, sampleRate: Int,
        bitsPerSample: Int, nFrames: Int, dataOffset: Int, dataBytes: Int)

    def decodeHeader(bytes: Array[Byte]): Option[WavInfo] = {
      if (bytes == null || bytes.length < 44) return None
      def u8(i: Int) = bytes(i) & 0xFF
      def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
      def u32(i: Int) = u16(i).toLong | (u16(i + 2).toLong << 16)
      def tag(i: Int) = new String(bytes, i, 4, "US-ASCII")
      if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var i = 12
      var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
      while (i + 8 <= bytes.length) {
        val id = tag(i)
        val len = u32(i + 4)
        if (len < 0 || i + 8 + len > bytes.length) return None
        if (id == "fmt ") {
          if (len < 16 || u16(i + 8) != 1) return None // PCM only
          fmt = Some((u16(i + 10), u32(i + 12).toInt, u16(i + 22)))
        } else if (id == "data") {
          return fmt.flatMap { case (ch, rate, bits) =>
            val blockAlign = ch * bits / 8
            if (blockAlign <= 0 || ch <= 0 || rate <= 0) None
            else Some(WavInfo(ch, rate, bits, len.toInt / blockAlign,
              i + 8, len.toInt))
          }
        }
        i += 8 + len.toInt + (len.toInt & 1) // RIFF chunks are word-aligned
      }
      None
    }
  }

  /** REAL audio feature extraction over PCM16 WAV blobs: one iterator
    * pass per partition decoding the actual samples into RMS energy and
    * peak amplitude (normalized to [0,1]) plus the true duration — the
    * silence/clipping screen an audio-curation pipeline runs before
    * transcription. Non-WAV / non-PCM16 blobs emit valid=false (mixed
    * corpora pass through in one pass, the decodeMeta NULL policy).
    * Emits (media_id, channels, sample_rate, n_frames, duration_sec,
    * rms, peak, valid). */
  def decodeAudioFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("channels", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("duration_sec", DoubleType, nullable = true),
      StructField("rms", DoubleType, nullable = true),
      StructField("peak", DoubleType, nullable = true),
      StructField("valid", BooleanType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          WavCodec.decodeHeader(bytes) match {
            case Some(w) if w.bitsPerSample == 16 =>
              var sumSq = 0.0
              var peak = 0L
              val nSamples = w.dataBytes / 2
              var i = 0
              while (i < nSamples) {
                val off = w.dataOffset + i * 2
                val s = ((bytes(off) & 0xFF) |
                  (bytes(off + 1) << 8)).toShort.toLong
                sumSq += s.toDouble * s
                if (math.abs(s) > peak) peak = math.abs(s)
                i += 1
              }
              Row(id, w.channels, w.sampleRate, w.nFrames,
                w.nFrames.toDouble / w.sampleRate,
                math.sqrt(sumSq / math.max(nSamples, 1)) / 32768.0,
                peak.toDouble / 32768.0, true)
            case _ => Row(id, null, null, null, null, null, null, false)
          }
        }
      }(enc)
      .toDF()
  }

  /** REAL audio downsample: decimate PCM16 frames by `factor` (keep
    * every factor-th frame across all channels) and re-emit a VALID
    * RIFF/WAVE blob at sampleRate/factor — naive-but-correct decimation
    * (a production pipeline adds an anti-alias filter; the container
    * arithmetic is identical). Output blobs round-trip through
    * [[WavCodec.decodeHeader]] and [[decodeAudioFeatures]]
    * (MultimodalSpec pins duration and energy preservation). Non-WAV
    * blobs pass through untouched.
    *
    * `factor` must divide each WAV's sample rate exactly: integer
    * division would otherwise silently skew the emitted rate (8000/3 →
    * 2666 Hz changes duration/pitch), so a non-divisor factor fails
    * loudly at the offending blob instead. */
  def downsampleWav(spark: SparkSession, media: DataFrame,
      factor: Int = 2): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    media.select(col("media_id"), col("content"), col("meta"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          WavCodec.decodeHeader(bytes) match {
            case Some(w) if w.bitsPerSample == 16 =>
              require(w.sampleRate % factor == 0,
                s"downsample factor $factor does not divide sample rate " +
                  s"${w.sampleRate} (media_id $id) — the emitted rate would " +
                  "be silently skewed")
              val blockAlign = w.channels * 2
              val kept = Iterator.range(0, w.nFrames, factor).toArray
              val body = new Array[Byte](kept.length * blockAlign)
              var j = 0
              while (j < kept.length) {
                System.arraycopy(bytes, w.dataOffset + kept(j) * blockAlign,
                  body, j * blockAlign, blockAlign)
                j += 1
              }
              val out = wavBytes(w.channels, w.sampleRate / factor, body)
              Row(id, out, Row("audio", null, null, out.length.toLong))
            case _ => Row(id, bytes, r.getStruct(2))
          }
        }
      }(enc)
      .toDF()
  }

  /** Assemble a canonical 44-byte-header PCM16 WAV blob. */
  private def wavBytes(channels: Int, sampleRate: Int,
      pcm: Array[Byte]): Array[Byte] = {
    val blockAlign = channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + pcm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort) // PCM
      .putInt(sampleRate).putInt(sampleRate * blockAlign)
      .putShort(blockAlign.toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(pcm.length)
      .put(pcm)
    bb.array()
  }

  /** Deterministic REAL-WAV media table: `n` mono PCM16 sine tones
    * (440·(i+1) Hz, 0.1 s at 8 kHz, half-scale amplitude) assembled as
    * genuine RIFF/WAVE bytes — the audio twin of
    * [[syntheticJpegMedia]], driver-built at fixture size. Known
    * analytic ground truth: RMS = amp/√2, duration = 0.1 s.
    *
    * Quantization rounds HALF AWAY FROM ZERO (std::round / DuckDB
    * round() semantics), not Scala's math.round (half toward +∞): the
    * two differ at exact negative .5 boundaries (-0.5 → -1 vs 0), and
    * q137's oracle replays this synthesis with DuckDB round(), so the
    * fixture must use the oracle's rounding mode. The only remaining
    * cross-engine exposure is the documented ≤1-ulp libm sin class. */
  def syntheticWavMedia(spark: SparkSession, n: Int = 3,
      idBase: Long = 9500000L): DataFrame = {
    val rate = 8000
    val frames = rate / 10
    val amp = 16384.0 // half scale
    def roundAway(x: Double): Short =
      (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toShort
    val rows = (0 until n).map { i =>
      val hz = 440.0 * (i + 1)
      val pcm = java.nio.ByteBuffer.allocate(frames * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until frames).foreach { t =>
        pcm.putShort(roundAway(
          amp * math.sin(2 * math.Pi * hz * t / rate)))
      }
      val bytes = wavBytes(1, rate, pcm.array())
      Row(idBase + i, bytes, Row("audio", null, null, bytes.length.toLong))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), mediaSchema)
  }

  /** Frame sampling — the video path's explode-shaped transform: every
    * `stride`-th frame becomes its own row (media_id, frame_idx,
    * frame). REAL AVI blobs demux their actual `movi` frame chunks
    * ([[AviCodec.frameChunks]] — genuine container boundaries, so
    * `frameBytes` doesn't apply; frame_idx is the movi-order video
    * frame ordinal); stand-in blobs slice the post-header payload into
    * fixed `frameBytes` windows. One iterator pass per partition with a
    * flatMap, so a blob fans out to rows without materializing all
    * frames per row first. Invalid blobs emit nothing (NULL-policy
    * consistent with decodeMeta). */
  def sampleFrames(
      spark: SparkSession, media: DataFrame,
      frameBytes: Int = 16, stride: Int = 4): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val avi =
            if (bytes != null && bytes.length >= 12 &&
                new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
                new String(bytes, 8, 4, "US-ASCII") == "AVI ")
              AviCodec.decodeHeader(bytes)
            else None
          avi match {
            case Some(info) =>
              val frames = AviCodec.frameChunks(bytes, info)
              Iterator.range(0, frames.length, stride).map { idx =>
                val (off, len) = frames(idx)
                Row(id, idx, java.util.Arrays.copyOfRange(bytes, off, off + len))
              }
            case None => FakeCodec.decodeHeader(bytes) match {
              case Some(_) =>
                val body = bytes.drop(12)
                Iterator.range(0, body.length, frameBytes * stride).map { off =>
                  Row(id, off / frameBytes,
                    body.slice(off, math.min(off + frameBytes, body.length)))
                }
              case None => Iterator.empty
            }
          }
        }
      }(enc)
      .toDF()
  }

  /** Deterministic REAL-AVI media table: `n` videos assembled as
    * genuine RIFF/AVI bytes — `LIST/hdrl` with a spec-layout `avih`
    * (and a minimal `vids` stream header pair, as every writer emits)
    * and a `LIST/movi` of `00db` frame chunks. Video i is
    * (32+16i)×(24+8i) with 8+4i frames at 30 fps (dwMicroSecPerFrame
    * 33333); frame j carries 16 + 4·(j mod 3) payload bytes filled
    * with (31·i + 7·j) mod 256 — deterministic closed-form ground
    * truth for both the header fields and the frame accounting (the
    * q139b oracle replays them analytically). The video twin of
    * [[syntheticJpegMedia]]/[[syntheticWavMedia]], driver-built at
    * fixture size. */
  def syntheticAviMedia(spark: SparkSession, n: Int = 3,
      idBase: Long = 9600000L,
      payloadByte: (Int, Int) => Int = (i, j) => (31 * i + 7 * j) % 256)
      : DataFrame = {
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length + (payload.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      bb.array() // trailing pad byte (if odd) stays zero
    }
    def list(listType: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ children)
    val rows = (0 until n).map { i =>
      val (w, h) = (32 + 16 * i, 24 + 8 * i)
      val nf = 8 + 4 * i
      val avih = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(33333) // dwMicroSecPerFrame (30 fps)
        .putInt(0).putInt(0).putInt(0)
        .putInt(nf) // dwTotalFrames
        .putInt(0)
        .putInt(1) // dwStreams
        .putInt(0)
        .putInt(w).putInt(h)
        .array()
      val strh = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .put("vids".getBytes("US-ASCII")).put("DIB ".getBytes("US-ASCII"))
        .putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(1).putInt(30) // dwScale / dwRate = 30 fps
        .putInt(0).putInt(nf) // dwStart / dwLength
        .putInt(0).putInt(0).putInt(0)
        .putShort(0).putShort(0)
        .putShort(w.toShort).putShort(h.toShort) // rcFrame
        .array()
      val strf = java.nio.ByteBuffer.allocate(40) // BITMAPINFOHEADER
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(0).putInt(w * h * 3).putInt(0).putInt(0).putInt(0).putInt(0)
        .array()
      val frames = (0 until nf).flatMap { j =>
        val payload =
          Array.fill(16 + 4 * (j % 3))(payloadByte(i, j).toByte)
        chunk("00db", payload)
      }.toArray
      val body = list("hdrl", chunk("avih", avih) ++
          list("strl", chunk("strh", strh) ++ chunk("strf", strf))) ++
        list("movi", frames)
      val bytes = java.nio.ByteBuffer.allocate(12 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
        .put("AVI ".getBytes("US-ASCII")).put(body)
        .array()
      Row(idBase + i, bytes, Row("video", w, h, bytes.length.toLong))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), mediaSchema)
  }

  /** Deterministic REAL-JPEG media table: `n` images rendered and
    * JPEG-encoded with the JDK's own ImageIO writer (a true JFIF
    * encoder — SOI/APP0/DQT/SOF0/DHT/SOS markers, real entropy-coded
    * data), sized (64+32i) × (48+24i), ids offset by `idBase`. Encoding
    * runs once on the driver — the blobs are fixture-sized — and gives
    * [[decodeMeta]]'s JPEG branch actual camera-format bytes to parse
    * instead of the stand-in header. The declared `meta` carries the
    * encode-time dimensions, so a decode-vs-declared comparison is an
    * end-to-end check of the real parser against the real encoder. */
  def syntheticJpegMedia(spark: SparkSession, n: Int = 3,
      idBase: Long = 9000000L): DataFrame = {
    val rows = (0 until n).map { i =>
      val (w, h) = (64 + 32 * i, 48 + 24 * i)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      // deterministic gradient — content doesn't matter, bytes must
      // just be a real encoder's output
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / h) << 8))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      val bytes = bos.toByteArray
      Row(idBase + i, bytes, Row("image", w, h, bytes.length.toLong))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), mediaSchema)
  }

  /** Build a deterministic media table from the documents table (text
    * bytes as payload) — gives the plumbing real data to chew on in tests
    * and queries without shipping binaries. */
  def syntheticMediaFromDocs(docs: DataFrame): DataFrame = {
    val payload = encode_(col("doc_id"), col("text"))
    docs.select(col("doc_id").as("media_id"), payload.as("content"),
      struct(lit("image").as("media_type"),
        (pmod(col("doc_id"), lit(1920)) + 1).cast("int").as("width"),
        (pmod(col("doc_id"), lit(1080)) + 1).cast("int").as("height"),
        length(col("text")).cast("long").as("n_bytes")).as("meta"))
  }

  /** Header || text bytes, all in codegen'd expressions: int32 big-endian
    * fields via conv/unhex of zero-padded hex. */
  private def encode_(id: org.apache.spark.sql.Column, text: org.apache.spark.sql.Column) = {
    def be32(c: org.apache.spark.sql.Column) =
      unhex(lpad(hex(c.cast("int")), 8, "0"))
    concat(be32(lit(FakeCodec.Magic)),
      be32(pmod(id, lit(1920)) + 1),
      be32(pmod(id, lit(1080)) + 1),
      encode(text, "UTF-8"))
  }
}
