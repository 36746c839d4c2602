package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (SURVEY.md §2.11 L8): image/audio/video payloads
  * modeled as an opaque binary column plus typed metadata —
  * `struct<uri:string, bytes:binary, meta:map<string,string>>`.
  *
  * The DECODE step is a stub by design: no codec libraries exist in
  * this container (and none may be added), so `StubDecoder` derives
  * deterministic pseudo-features from the raw bytes. Everything around
  * it — the schema, the typed Dataset plumbing, per-partition decoder
  * lifecycle, batch shape, and partition sizing — is the real 100 TB
  * pipeline shape: swap `StubDecoder` for a JNI/codec-backed
  * implementation and nothing else changes.
  *
  * Scale notes: media rows are large (MBs of bytes each), so
  * `maxPartitionBytes`-driven splits keep partitions bounded; decode is
  * mapPartitions (one decoder init per partition, not per row — codec
  * contexts are expensive); features detach from bytes immediately so
  * downstream plans never shuffle the binary payload.
  */
object Multimodal {

  /** The canonical media column type. */
  val mediaType: StructType = StructType(Seq(
    StructField("uri", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", MapType(StringType, StringType), nullable = false)))

  /** Extracted per-media features (decode output). */
  case class MediaFeatures(width: Int, height: Int, format: String,
      n_bytes: Long, checksum: Long)

  /** Decoder contract: `open()` once per partition (codec contexts are
    * expensive to create), then `decode` per row.
    */
  trait MediaDecoder extends Serializable {
    def open(): Unit = ()
    def decode(uri: String, bytes: Array[Byte],
        meta: Map[String, String]): MediaFeatures
  }

  /** Deterministic fake decode: features are pure functions of the
    * payload bytes. Stands in for the real codec call (unavailable
    * here); keeps tests and downstream plumbing fully exercisable.
    */
  class StubDecoder extends MediaDecoder {
    override def decode(uri: String, bytes: Array[Byte],
        meta: Map[String, String]): MediaFeatures = {
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      val fmt = meta.getOrElse("format",
        uri.split('.').lastOption.getOrElse("bin"))
      MediaFeatures(
        width = 16 + math.floorMod(h, 1024L).toInt,
        height = 16 + math.floorMod(h >> 10, 1024L).toInt,
        format = fmt, n_bytes = bytes.length.toLong, checksum = h)
    }
  }

  /** REAL decoder for BMP payloads: the BMP container is a fixed
    * little-endian header (magic 'BM'; BITMAPINFOHEADER width/height at
    * byte offsets 18/22), so decoding needs byte arithmetic only — no
    * codec library. This proves the decoder SLOT carries real decoders,
    * not just the stub: formats whose decode genuinely needs a codec
    * (jpeg/mp3/mp4) plug into the same `MediaDecoder` contract.
    * Malformed payloads fail loudly (a media pipeline must surface
    * corrupt inputs, not fabricate features for them).
    */
  class BmpDecoder extends MediaDecoder {
    override def decode(uri: String, bytes: Array[Byte],
        meta: Map[String, String]): MediaFeatures = {
      require(bytes.length >= 54 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
        s"not a BMP payload: $uri (${bytes.length} bytes)")
      def le32(off: Int): Int =
        (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8) |
          ((bytes(off + 2) & 0xFF) << 16) | ((bytes(off + 3) & 0xFF) << 24)
      // width/height offsets below assume BITMAPINFOHEADER (DIB header
      // size 40 at offset 14); OS/2 BITMAPCOREHEADER stores 16-bit dims
      // at different offsets, so reading it here would fabricate values
      require(le32(14) == 40,
        s"unsupported BMP DIB header (size ${le32(14)}) in $uri: " +
          "only BITMAPINFOHEADER is decoded")
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      // negative height is the valid top-down encoding; magnitude is
      // the pixel height either way
      MediaFeatures(width = le32(18), height = math.abs(le32(22)),
        format = "bmp", n_bytes = bytes.length.toLong, checksum = h)
    }
  }

  /** Valid 24-bit BMP payloads built per row (deterministic pixels from
    * the id): real bytes for the real decoder, generated in-plan so no
    * binary fixture files are needed.
    */
  def withSyntheticBmp(df: DataFrame, idCol: String,
      w: Int = 4, h: Int = 4): DataFrame = {
    val mk = udf { (id: Long) =>
      val rowSize = (3 * w + 3) / 4 * 4 // pixel rows pad to 4 bytes
      val dataSize = rowSize * h
      val b = java.nio.ByteBuffer.allocate(54 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
        .putInt(0).putInt(54) // reserved, pixel-data offset
      b.putInt(40).putInt(w).putInt(h) // BITMAPINFOHEADER
        .putShort(1).putShort(24)      // planes, bpp
        .putInt(0).putInt(dataSize)    // no compression
        .putInt(2835).putInt(2835).putInt(0).putInt(0)
      var i = 0
      while (i < dataSize) { b.put((31 * id + i).toByte); i += 1 }
      b.array()
    }
    df.withColumn("media", struct(
      concat(lit("mem://doc/"), col(idCol), lit(".bmp")).as("uri"),
      mk(col(idCol).cast("long")).as("bytes"),
      map(lit("format"), lit("bmp"),
        lit("origin"), lit("synthetic")).as("meta")))
  }

  /** Attach a synthetic media struct derived from an id column —
    * fixture builder (no binary testdata exists); deterministic bytes
    * from the id so tests can assert exact checksums.
    */
  def withSyntheticMedia(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("media", struct(
      concat(lit("mem://doc/"), col(idCol), lit(".img")).as("uri"),
      // 32 deterministic bytes per row: sha2 of the id, unhexed
      unhex(sha2(col(idCol).cast("string").cast("binary"), 256)).as("bytes"),
      map(lit("format"), lit("img"),
        lit("origin"), lit("synthetic")).as("meta")))

  /** Decode/feature-extract: streams each partition through one decoder
    * instance and drops the heavy bytes from the output. Input must
    * have (idCol: bigint, mediaCol: mediaType).
    */
  def extractFeatures(df: DataFrame, idCol: String, mediaCol: String,
      decoder: MediaDecoder): DataFrame = {
    val outSchema = StructType(
      StructField("id", LongType, nullable = false) +:
      Encoders.product[MediaFeatures].schema.fields.toIndexedSeq)
    val input = df.select(
      col(idCol).cast("long").as("id"),
      col(s"$mediaCol.uri").as("uri"),
      col(s"$mediaCol.bytes").as("bytes"),
      col(s"$mediaCol.meta").as("meta"))
    input.mapPartitions { rows =>
      decoder.open() // once per partition: codec context init
      rows.map { r =>
        val meta = r.getMap[String, String](3).toMap
        val f = decoder.decode(r.getString(1), r.getAs[Array[Byte]](2), meta)
        Row(r.getLong(0), f.width, f.height, f.format, f.n_bytes, f.checksum)
      }
    }(Encoders.row(outSchema))
  }

  /** Resize stub: the real implementation hands bytes to a codec and
    * re-encodes at (w, h); here the transform deterministically derives
    * the resized payload (truncated checksum-stamped bytes) and updates
    * the meta map — the Spark-side shape (per-row binary transform, new
    * meta, NO shuffle, bytes never leave the row) is the tested part.
    */
  def resize(df: DataFrame, mediaCol: String, w: Int, h: Int): DataFrame = {
    val resizeUdf = udf { (bytes: Array[Byte]) =>
      val n = math.max(4, bytes.length / 4) // "smaller" payload
      bytes.take(n)
    }
    df.withColumn(mediaCol, struct(
      col(s"$mediaCol.uri").as("uri"),
      resizeUdf(col(s"$mediaCol.bytes")).as("bytes"),
      map_concat(col(s"$mediaCol.meta"),
        map(lit("resized"), concat_ws("x", lit(w), lit(h)))).as("meta")))
  }

  /** Frame sampling stub for video payloads: emits every `stride`-th
    * frame offset with a deterministic pseudo-frame checksum. The real
    * implementation seeks the container index; the Spark shape (one
    * input row -> many frame rows, no shuffle) is what's tested.
    */
  def sampleFrames(df: DataFrame, idCol: String, mediaCol: String,
      nFrames: Int, stride: Int): DataFrame =
    df.select(
        col(idCol).cast("long").as("id"),
        col(s"$mediaCol.bytes").as("bytes"))
      .withColumn("frame_no",
        explode(sequence(lit(0), lit((nFrames - 1) * stride), lit(stride))))
      .withColumn("frame_checksum",
        xxhash64(col("bytes"), col("frame_no")))
      .select("id", "frame_no", "frame_checksum")
}
