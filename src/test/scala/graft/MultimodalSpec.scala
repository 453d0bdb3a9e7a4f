package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Multimodal

/** Multimodal column plumbing: byte-level codec round-trip, the
  * per-partition decode pass, dirty-data policy (NULL, never throw), and
  * the resize transform's header contract. */
class MultimodalSpec extends SparkTestBase {

  test("dHash: brightness-shifted re-encoded copies stay near, distinct images stay far, junk never throws") {
    import graft.ops.Multimodal
    val media = Multimodal.syntheticJpegPairMedia(spark, n = 3)
    val hs = Multimodal.dHash(spark, media).collect()
      .map(r => r.getLong(0) -> (if (r.getBoolean(2)) Some(r.getLong(1)) else None))
      .toMap
    assert(hs.values.forall(_.isDefined), "all fixture images must decode")
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = 9700000L
    (0 until 3).foreach { i =>
      val d = ham(hs(base + i).get, hs(base + i + 1000L).get)
      assert(d <= 2,
        s"near-dup pair $i drifted $d bits — dHash should shrug off a brightness shift + re-encode (probed 0)")
    }
    for (i <- 0 until 3; j <- 0 until 3 if i != j) {
      val d = ham(hs(base + i).get, hs(base + j).get)
      assert(d >= 16, s"distinct patterns $i,$j too close at $d bits (probed 32-64)")
    }
    // never-throw posture: garbage bytes and a sub-grid image report
    // valid=false instead of failing the pass
    val junkRows = Seq(
      org.apache.spark.sql.Row(1L, Array.fill[Byte](64)(0x5A),
        org.apache.spark.sql.Row("image", 0, 0, 64L)),
      org.apache.spark.sql.Row(2L, null,
        org.apache.spark.sql.Row("image", 0, 0, 0L)))
    val junk = spark.createDataFrame(
      spark.sparkContext.parallelize(junkRows, 1), Multimodal.mediaSchema)
    val decoded = Multimodal.dHash(spark, junk).collect()
    assert(decoded.forall(!_.getBoolean(2)))
  }

  private lazy val media = Multimodal.syntheticMediaFromDocs(
    Tables.load(spark, sfDir, "documents")).cache()

  test("codec round-trip: encode → decodeHeader recovers dimensions") {
    val bytes = Multimodal.FakeCodec.encode(640, 480, "payload".getBytes("UTF-8"))
    assert(Multimodal.FakeCodec.decodeHeader(bytes) === Some((640, 480)))
    assert(Multimodal.FakeCodec.decodeHeader(Array[Byte](1, 2, 3)) === None)
    assert(Multimodal.FakeCodec.decodeHeader(null) === None)
  }

  test("real JPEG fixture: the T.81 marker walk decodes the encoder's true dimensions") {
    // a REAL JFIF file from the JDK's own JPEG encoder — SOI/APP0/DQT/
    // SOF0/DHT/SOS markers and entropy-coded data, not the stand-in
    val img = new java.awt.image.BufferedImage(
      37, 23, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val bytes = bos.toByteArray
    assert((bytes(0) & 0xFF) === 0xFF && (bytes(1) & 0xFF) === 0xD8,
      "ImageIO must have produced a real SOI header")
    assert(Multimodal.JpegCodec.decodeHeader(bytes) === Some((37, 23)))
    assert(Multimodal.decodeHeaderAny(bytes) === Some(("jpeg", 37, 23)))
    // malformed variants: truncated mid-segment, bad SOI, scan-before-
    // SOF — all None, never a throw
    assert(Multimodal.JpegCodec.decodeHeader(bytes.take(6)) === None)
    assert(Multimodal.JpegCodec.decodeHeader(
      Array[Byte](0x12, 0x34, 0x56, 0x78)) === None)
    assert(Multimodal.JpegCodec.decodeHeader(
      Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)) === None)
    assert(Multimodal.JpegCodec.decodeHeader(null) === None)
    // stand-in blobs still route to FakeCodec through the dispatcher
    val grft = Multimodal.FakeCodec.encode(640, 480, Array[Byte](1, 2))
    assert(Multimodal.decodeHeaderAny(grft) === Some(("grft", 640, 480)))
  }

  test("decodeMeta over a mixed real-JPEG + stand-in corpus decodes both, dims exact") {
    val jpeg = Multimodal.syntheticJpegMedia(spark, n = 3)
    val mixed = media.limit(5).unionByName(jpeg)
    val decoded = Multimodal.decodeMeta(spark, mixed)
    assert(decoded.filter(!col("valid")).count() === 0L)
    val mismatches = decoded.join(mixed, Seq("media_id"))
      .filter(col("width") =!= col("meta.width") ||
        col("height") =!= col("meta.height")).count()
    assert(mismatches === 0L,
      "decoded dims must equal encode-time dims for BOTH codecs")
    // the JPEG rows specifically: 64x48, 96x72, 128x96
    val j = decoded.filter(col("media_id") >= 9000000L)
      .orderBy(col("media_id")).collect()
    assert(j.map(r => (r.getInt(1), r.getInt(2))).toSeq ===
      Seq((64, 48), (96, 72), (128, 96)))
  }

  test("decodeMeta: every synthesized blob decodes valid with the declared dims") {
    val decoded = Multimodal.decodeMeta(spark, media).cache()
    assert(decoded.count() === media.count())
    assert(decoded.filter(!col("valid")).count() === 0L)
    // decoded dims must equal the declared metadata (expression-encoded
    // header vs JVM-decoded header — two independent implementations)
    val mismatches = decoded.join(media, Seq("media_id"))
      .filter(col("width") =!= col("meta.width") ||
        col("height") =!= col("meta.height")).count()
    assert(mismatches === 0L)
    // n_bytes = 12-byte header + text payload
    val badLen = decoded.join(media, Seq("media_id"))
      .filter(col("n_bytes") =!= col("meta.n_bytes") + 12L).count()
    assert(badLen === 0L)
  }

  test("corrupt blobs decode as invalid, never throw") {
    val corrupted = media.withColumn("content",
      expr("substring(content, 1, 8)")) // truncated below header size
    val decoded = Multimodal.decodeMeta(spark, corrupted)
    assert(decoded.filter(col("valid")).count() === 0L)
    assert(decoded.filter(col("width").isNotNull).count() === 0L)
  }

  test("expression-based header decode is output-identical to the mapPartitions path") {
    val corrupted = media.withColumn("content",
      when(col("media_id") % 3 === 0, expr("substring(content, 1, 8)"))
        .otherwise(col("content")))
    Seq(media, corrupted).foreach { input =>
      val viaPartitions = Multimodal.decodeMeta(spark, input)
      val viaExpr = Multimodal.decodeMetaExpr(input)
      // compare names+types; the expression path proves tighter
      // nullability than the opaque mapPartitions encoder can declare
      assert(viaExpr.schema.map(f => (f.name, f.dataType)) ===
        viaPartitions.schema.map(f => (f.name, f.dataType)))
      assert(viaPartitions.exceptAll(viaExpr).count() === 0L)
      assert(viaExpr.exceptAll(viaPartitions).count() === 0L)
    }
  }

  test("sampleFrames emits every stride-th fixed-size frame, skips corrupt blobs") {
    import spark.implicits._
    // 40-byte payload, 8-byte frames, stride 2 → frames 0, 2, 4 of 5
    val payload = Array.tabulate(40)(_.toByte)
    val blob = Multimodal.FakeCodec.encode(64, 48, payload)
    val one = Seq((7L, blob), (8L, Array[Byte](1, 2, 3)))
      .toDF("media_id", "content")
    val frames = Multimodal.sampleFrames(spark, one, frameBytes = 8, stride = 2)
      .orderBy("media_id", "frame_idx").collect()
    assert(frames.map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((7L, 0), (7L, 2), (7L, 4)))
    // frame content is the right byte slice
    assert(frames.head.getAs[Array[Byte]]("frame").toSeq === payload.slice(0, 8).toSeq)
    assert(frames.last.getAs[Array[Byte]]("frame").toSeq === payload.slice(32, 40).toSeq)
    // whole corpus: every valid blob contributes ceil(nframes/stride) rows
    val total = Multimodal.sampleFrames(spark, media, 16, 4)
      .groupBy("media_id").agg(count(lit(1)).as("n"))
    val expected = Multimodal.decodeMeta(spark, media)
      .select(col("media_id"),
        ceil((ceil((col("n_bytes") - 12) / 16.0)) / 4.0).cast("long").as("e"))
    val bad = total.join(expected, Seq("media_id"))
      .filter(col("n") =!= col("e")).count()
    assert(bad === 0L)
  }

  test("resizeHalf halves declared dimensions and keeps blobs decodable") {
    val resized = Multimodal.resizeHalf(spark, media)
    val redecoded = Multimodal.decodeMeta(spark, resized)
    assert(redecoded.filter(!col("valid")).count() === 0L)
    val bad = redecoded.join(media, Seq("media_id"))
      .filter(col("width") =!= (col("meta.width") / 2).cast("int") ||
        col("height") =!= (col("meta.height") / 2).cast("int")).count()
    assert(bad === 0L)
  }

  test("REAL pixel decode: a solid-color JPEG decodes to its fill color; resample halves dims and keeps the color") {
    import org.apache.spark.sql.Row
    // one solid-color image: JPEG is lossy but a uniform field survives
    // the DCT almost exactly, so the channel means pin the whole
    // entropy-decode path tightly
    val (w, h, r0, g0, b0) = (64, 48, 200, 30, 60)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2d = img.createGraphics()
    g2d.setColor(new java.awt.Color(r0, g0, b0))
    g2d.fillRect(0, 0, w, h); g2d.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val bytes = bos.toByteArray
    val media1 = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, bytes, Row("image", w, h, bytes.length.toLong))), 1),
      Multimodal.mediaSchema)
    val px = Multimodal.decodePixels(spark, media1).head()
    assert(px.getBoolean(6), "solid JPEG must decode")
    assert(px.getInt(1) === w && px.getInt(2) === h)
    assert(math.abs(px.getDouble(3) - r0) <= 4, s"mean_r ${px.getDouble(3)}")
    assert(math.abs(px.getDouble(4) - g0) <= 4, s"mean_g ${px.getDouble(4)}")
    assert(math.abs(px.getDouble(5) - b0) <= 4, s"mean_b ${px.getDouble(5)}")
    // real resample: half dims, color preserved, output a real JFIF
    val res = Multimodal.resizeJpegHalf(spark, media1)
    val px2 = Multimodal.decodePixels(spark, res).head()
    assert(px2.getInt(1) === w / 2 && px2.getInt(2) === h / 2)
    assert(math.abs(px2.getDouble(3) - r0) <= 6)
    assert(math.abs(px2.getDouble(5) - b0) <= 6)
    val hdr = Multimodal.decodeMeta(spark, res).head()
    assert(hdr.getBoolean(4) && hdr.getInt(1) === w / 2,
      "resized blob must parse through the independent T.81 walk")
    // mixed corpus: the GRFT stand-in blob has no JRE reader —
    // decodePixels marks it invalid, resizeJpegHalf falls back to the
    // header arithmetic instead of dropping it
    val mixed = media1.unionByName(media.limit(1))
    assert(Multimodal.decodePixels(spark, mixed)
      .filter(!col("valid")).count() === 1L)
    assert(Multimodal.resizeJpegHalf(spark, mixed).count() === 2L)
  }

  test("REAL PNG fixture: IHDR decode matches the JDK encoder's dimensions; pixels decode through ImageIO") {
    import org.apache.spark.sql.Row
    val (w, h) = (37, 91)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, 0x336699)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val bytes = bos.toByteArray
    assert(Multimodal.PngCodec.decodeHeader(bytes) === Some((w, h)))
    assert(Multimodal.decodeHeaderAny(bytes) === Some(("png", w, h)))
    // the mixed-corpus meta pass routes the PNG through the same
    // dispatch and decodes its true dimensions
    val m = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(42L, bytes, Row("image", w, h, bytes.length.toLong))), 1),
      Multimodal.mediaSchema)
    val meta = Multimodal.decodeMeta(spark, m).head()
    assert(meta.getBoolean(4) && meta.getInt(1) === w && meta.getInt(2) === h)
    // and the JDK ships a PNG reader, so the pixel path is real too
    val px = Multimodal.decodePixels(spark, m).head()
    assert(px.getBoolean(6) && math.abs(px.getDouble(3) - 0x33) <= 1)
    // corrupt: signature ok but IHDR missing → None, never a throw
    val broken = bytes.clone(); broken(12) = 'X'.toByte
    assert(Multimodal.PngCodec.decodeHeader(broken).isEmpty)
    assert(Multimodal.PngCodec.decodeHeader(bytes.take(20)).isEmpty)
  }

  test("REAL AVI path: hdrl/avih decode exact dims+frames, movi demux samples true chunks, corrupt variants never throw") {
    val avi = Multimodal.syntheticAviMedia(spark, n = 3)
    val blobs = avi.orderBy(col("media_id")).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    // header: the chunk descent reads the spec-layout avih fields
    blobs.zipWithIndex.foreach { case ((id, bytes), i) =>
      val info = Multimodal.AviCodec.decodeHeader(bytes)
        .getOrElse(fail(s"AVI $id must decode"))
      assert(info.width === 32 + 16 * i && info.height === 24 + 8 * i)
      assert(info.totalFrames === 8 + 4 * i)
      assert(info.microSecPerFrame === 33333L && info.streams === 1)
      assert(Multimodal.decodeHeaderAny(bytes) ===
        Some(("avi", 32 + 16 * i, 24 + 8 * i)))
      // frame chunks: count matches avih, lengths match the synthesis
      val frames = Multimodal.AviCodec.frameChunks(bytes, info)
      assert(frames.length === info.totalFrames)
      frames.zipWithIndex.foreach { case ((_, len), j) =>
        assert(len === 16 + 4 * (j % 3), s"frame $j length")
      }
    }
    // the mixed-corpus meta pass decodes AVI dims through the dispatcher
    val meta = Multimodal.decodeMeta(spark, avi.unionByName(media.limit(2)))
    assert(meta.filter(col("valid")).count() === 5L)
    val badDims = meta.join(avi, Seq("media_id"))
      .filter(col("width") =!= col("meta.width") ||
        col("height") =!= col("meta.height")).count()
    assert(badDims === 0L)
    // sampleFrames demuxes REAL movi chunks: every stride-th video
    // frame, idx = movi ordinal, bytes = the true chunk payload
    val sampled = Multimodal.sampleFrames(spark, avi, stride = 3)
      .orderBy(col("media_id"), col("frame_idx")).collect()
    val expected = blobs.zipWithIndex.flatMap { case ((id, _), i) =>
      (0 until (8 + 4 * i) by 3).map(j => (id, j, 16 + 4 * (j % 3)))
    }
    assert(sampled.map(r => (r.getLong(0), r.getInt(1),
      r.getAs[Array[Byte]](2).length)).toSeq === expected.toSeq)
    // payload bytes are the synthesis fill, not header bytes
    val f0 = sampled.head.getAs[Array[Byte]](2)
    assert(f0.forall(_ === 0.toByte) && f0.length === 16)
    // corrupt variants: truncated mid-chunk, wrong form type, avih too
    // short — all None / empty, never a throw
    val bytes0 = blobs.head._2
    assert(Multimodal.AviCodec.decodeHeader(bytes0.take(40)).isEmpty)
    val wrongForm = bytes0.clone(); wrongForm(8) = 'W'.toByte
    assert(Multimodal.AviCodec.decodeHeader(wrongForm).isEmpty)
    assert(Multimodal.AviCodec.decodeHeader("RIFF   AVI ".getBytes("ISO-8859-1")).isEmpty)
    assert(Multimodal.AviCodec.decodeHeader(null).isEmpty)
    // a corrupt blob in a corpus emits no frames and kills nothing
    import spark.implicits._
    val mixedBad = Seq((99L, bytes0.take(60))).toDF("media_id", "content")
    assert(Multimodal.sampleFrames(spark, mixedBad).count() === 0L)
  }

  test("REAL WAV path: header fields exact, sine RMS/peak analytic, decimation halves rate and preserves energy") {
    val wav = Multimodal.syntheticWavMedia(spark, n = 3)
    // header decode: genuine RIFF bytes through the chunk walk
    val feats = Multimodal.decodeAudioFeatures(spark, wav)
      .orderBy(col("media_id")).collect()
    assert(feats.length === 3 && feats.forall(_.getBoolean(7)))
    feats.foreach { f =>
      assert(f.getInt(1) === 1 && f.getInt(2) === 8000 && f.getInt(3) === 800)
      assert(math.abs(f.getDouble(4) - 0.1) <= 1e-9, "duration")
      // sine ground truth: RMS = amp/√2 = 0.5/√2 ≈ 0.3536 (±1% for
      // sample-phase effects), peak ≈ amp
      assert(math.abs(f.getDouble(5) - 0.5 / math.sqrt(2)) <= 0.005,
        s"rms ${f.getDouble(5)}")
      assert(f.getDouble(6) >= 0.49 && f.getDouble(6) <= 0.501,
        s"peak ${f.getDouble(6)}")
    }
    // decimation by 2: output is a VALID WAV at half rate, half frames,
    // same duration, energy preserved (a sine decimated by 2 is a sine)
    val down = Multimodal.downsampleWav(spark, wav, factor = 2)
    val df2 = Multimodal.decodeAudioFeatures(spark, down)
      .orderBy(col("media_id")).collect()
    assert(df2.length === 3 && df2.forall(_.getBoolean(7)))
    df2.foreach { f =>
      assert(f.getInt(2) === 4000 && f.getInt(3) === 400)
      assert(math.abs(f.getDouble(4) - 0.1) <= 1e-9, "duration preserved")
      assert(math.abs(f.getDouble(5) - 0.5 / math.sqrt(2)) <= 0.01,
        s"decimated rms ${f.getDouble(5)}")
    }
    // mixed corpus: non-WAV blobs flow through as invalid / untouched
    val mixed = wav.unionByName(media.limit(2))
    assert(Multimodal.decodeAudioFeatures(spark, mixed)
      .filter(!col("valid")).count() === 2L)
    assert(Multimodal.downsampleWav(spark, mixed).count() === 5L)
    // corrupt RIFF (truncated mid-chunk) is None, never a throw
    val truncated = wav.limit(1).collect().head.getAs[Array[Byte]](1).take(50)
    assert(Multimodal.WavCodec.decodeHeader(truncated).isEmpty)
    assert(Multimodal.WavCodec.decodeHeader("RIFFxxxxWAVE".getBytes).isEmpty)
    // a non-divisor decimation factor fails LOUDLY (8000/3 would silently
    // emit a 2666 Hz blob with skewed duration/pitch)
    val bad = intercept[Exception] {
      Multimodal.downsampleWav(spark, wav, factor = 3).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(bad).exists(c => c.getMessage != null &&
      c.getMessage.contains("does not divide sample rate")))
  }

  test("MP4 box walk: synthesized boxes decode exactly; largesize and to-EOF forms parse; truncation is None, never a throw (r20)") {
    import graft.ops.Multimodal
    // a two-track container with v0 boxes
    val bytes = Multimodal.mp4Bytes(600, 600 * 7,
      Seq(("vide", 640, 360), ("soun", 0, 0)))
    val m = Multimodal.Mp4Codec.decodeHeader(bytes).get
    assert(m.majorBrand === "isom")
    assert(m.timescale === 600L && m.duration === 4200L)
    assert(m.trackCount === 2 && m.videoTracks === 1 && m.audioTracks === 1)
    assert(m.width === 640 && m.height === 360)
    // LARGESIZE form: re-wrap mdat as a size-1 box with a 64-bit length
    val mdatAt = bytes.length - 16 // box("mdat", 8 zero bytes)
    val largesize = {
      val head = bytes.take(mdatAt)
      val bb = java.nio.ByteBuffer.allocate(16 + 8)
      bb.putInt(1).put("mdat".getBytes("US-ASCII")).putLong(16 + 8)
      head ++ bb.array()
    }
    assert(Multimodal.Mp4Codec.decodeHeader(largesize).contains(m))
    // TO-EOF form: mdat with size 0 extends to the end of the file
    val toEof = {
      val head = bytes.take(mdatAt)
      val bb = java.nio.ByteBuffer.allocate(8 + 20)
      bb.putInt(0).put("mdat".getBytes("US-ASCII"))
      head ++ bb.array()
    }
    assert(Multimodal.Mp4Codec.decodeHeader(toEof).contains(m))
    // never-throw: truncation at every prefix length is None or a
    // successful parse of a still-complete prefix — no exception path
    (0 until bytes.length).foreach { n =>
      Multimodal.Mp4Codec.decodeHeader(bytes.take(n))
      ()
    }
    assert(Multimodal.Mp4Codec.decodeHeader(bytes.take(30)).isEmpty)
    // a box whose declared size overruns the file is malformed
    val overrun = bytes.clone()
    overrun(0) = 0x7F.toByte // ftyp size becomes enormous
    assert(Multimodal.Mp4Codec.decodeHeader(overrun).isEmpty)
    assert(Multimodal.Mp4Codec.decodeHeader(null).isEmpty)
    assert(Multimodal.Mp4Codec.decodeHeader("ftypnotabox".getBytes).isEmpty)
    // the v1 layouts: widen mvhd/tkhd to 64-bit times by hand
    val v1 = {
      def box(t: String, p: Array[Byte]) = {
        val bb = java.nio.ByteBuffer.allocate(8 + p.length)
        bb.putInt(8 + p.length).put(t.getBytes("US-ASCII")).put(p)
        bb.array()
      }
      val mvhd = {
        val bb = java.nio.ByteBuffer.allocate(112)
        bb.putInt(0x01000000) // version 1
          .putLong(0L).putLong(0L).putInt(48000).putLong(96000L)
        bb.array()
      }
      val tkhd = {
        val bb = java.nio.ByteBuffer.allocate(96)
        bb.putInt(0x01000007).putLong(0L).putLong(0L).putInt(1)
        bb.position(88)
        bb.putInt(320 << 16).putInt(240 << 16)
        bb.array()
      }
      val hdlr = {
        val bb = java.nio.ByteBuffer.allocate(25)
        bb.putInt(0).putInt(0).put("vide".getBytes("US-ASCII"))
        bb.array()
      }
      box("ftyp", "mp42".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0)) ++
        box("moov", box("mvhd", mvhd) ++
          box("trak", box("tkhd", tkhd) ++ box("mdia", box("hdlr", hdlr))))
    }
    val m1 = Multimodal.Mp4Codec.decodeHeader(v1).get
    assert(m1.majorBrand === "mp42")
    assert(m1.timescale === 48000L && m1.duration === 96000L)
    assert(m1.width === 320 && m1.height === 240 && m1.videoTracks === 1)
    // the distributed pass agrees with the driver-side decode per blob
    val media = Multimodal.syntheticMp4MediaFromDocs(spark,
      spark.range(20).selectExpr("id as doc_id"))
    val got = Multimodal.decodeMp4Meta(spark, media)
      .select(col("media_id"), col("width"), col("height"),
        col("tracks"), col("duration_ticks"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getLong(4))).toSet
    val want = (0L until 20L).map { id =>
      (id, 16 * ((id % 7).toInt + 1), 9 * ((id % 7).toInt + 1),
        1 + (id % 3).toInt, 600L * ((id % 13) + 1))
    }.toSet
    assert(got === want)
  }
}
