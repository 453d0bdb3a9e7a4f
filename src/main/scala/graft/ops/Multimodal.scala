package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata (north-star surface).
  *
  * The Spark-side machinery — schema, partition sizing, batch-shaped
  * per-partition processing — is real; the codec itself is a
  * deterministic stand-in (`FakeCodec`) because media libraries aren't in
  * this container. Swap `FakeCodec.decodeHeader` for a real decoder (or a
  * `mapInPandas`/`mapInArrow` stage in the Python API) and nothing else
  * changes.
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

  /** Decode headers per partition — the batch-shaped processing pattern:
    * one iterator pass per partition, no per-row task overhead, identical
    * shape to an Arrow-batch UDF. Emits (media_id, width, height, n_bytes,
    * valid). */
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
          FakeCodec.decodeHeader(bytes) match {
            case Some((w, h)) => Row(id, w, h, bytes.length.toLong, true)
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
    * metadata-only audit never leaves whole-stage codegen. Real codecs
    * (JPEG/audio frames) need [[decodeMeta]]'s per-partition shape; this
    * is the fast path for header-level work. Output-identical to
    * decodeMeta (asserted in MultimodalSpec). */
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

  /** Frame sampling — the video path's explode-shaped transform: the
    * payload after the header is treated as fixed-size frames and every
    * `stride`-th frame becomes its own row (media_id, frame_idx, frame).
    * One iterator pass per partition with a flatMap, so a blob fans out
    * to rows without materializing all frames per row first; a real
    * video demuxer slots into the frame extraction. Invalid blobs emit
    * nothing (NULL-policy consistent with decodeMeta). */
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
          FakeCodec.decodeHeader(bytes) match {
            case Some(_) =>
              val body = bytes.drop(12)
              Iterator.range(0, body.length, frameBytes * stride).map { off =>
                Row(id, off / frameBytes,
                  body.slice(off, math.min(off + frameBytes, body.length)))
              }
            case None => Iterator.empty
          }
        }
      }(enc)
      .toDF()
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
