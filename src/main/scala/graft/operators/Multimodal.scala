package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (SURVEY.md §2.11 L8): image/audio/video payloads
  * modeled as an opaque binary column plus typed metadata —
  * `struct<uri:string, bytes:binary, meta:map<string,string>>`.
  *
  * Decode is REAL and library-free across the board: PNG (full
  * inflate + unfilter, [[PngDecoder]]), baseline JPEG (Huffman +
  * IDCT, [[JpegDecoder]]), BMP header geometry ([[BmpDecoder]]), WAV
  * PCM ([[WavDecoder]]), MP3 frame-header walking and MP4 box walking
  * ([[MediaContainers]] — container-level sample rate/channels/
  * duration/track dims; only their SAMPLE decode needs an external
  * codec and stays a loud stub); everything around the slot —
  * the schema, typed Dataset plumbing, per-partition decoder
  * lifecycle, batch shape, partition sizing — is the real 100 TB
  * pipeline shape, so a JNI/codec-backed decoder drops in with
  * nothing else changing.
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

  /** The one checksum definition every decoder stamps its features
    * with: a polynomial byte hash, so equal payloads give equal
    * checksums ACROSS decoder classes (three divergent copies would
    * silently break that comparability).
    */
  private[operators] def byteChecksum(bytes: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    h
  }

  /** Deterministic fake decode: features are pure functions of the
    * payload bytes. Stands in for the real codec call (unavailable
    * here); keeps tests and downstream plumbing fully exercisable.
    */
  class StubDecoder extends MediaDecoder {
    override def decode(uri: String, bytes: Array[Byte],
        meta: Map[String, String]): MediaFeatures = {
      val h = byteChecksum(bytes)
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
    * (mp3/mp4) plug into the same `MediaDecoder` contract.
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
      // negative height is the valid top-down encoding; magnitude is
      // the pixel height either way
      MediaFeatures(width = le32(18), height = math.abs(le32(22)),
        format = "bmp", n_bytes = bytes.length.toLong,
        checksum = byteChecksum(bytes))
    }
  }

  /** REAL decoder for PNG payloads — a full pixel decode, not just a
    * header parse: chunk walk (IHDR geometry, IDAT concatenation, IEND
    * terminator), zlib inflate via `java.util.zip.Inflater` (stock
    * JVM — the one compressed image format needing no codec library),
    * and per-scanline UNFILTERING of all five PNG filter types (None/
    * Sub/Up/Average/Paeth). 8-bit gray/RGB/RGBA, non-interlaced;
    * anything else fails loudly, as do truncated streams, wrong
    * inflate lengths, and unknown filter bytes. [[decodePixels]]
    * exposes the raw pixel buffer (tests round-trip every filter type
    * through it); `decode` reports geometry features.
    */
  class PngDecoder extends MediaDecoder {
    override def decode(uri: String, bytes: Array[Byte],
        meta: Map[String, String]): MediaFeatures = {
      val (w, h, _) = PngDecoder.decodePixels(uri, bytes)
      MediaFeatures(width = w, height = h, format = "png",
        n_bytes = bytes.length.toLong, checksum = byteChecksum(bytes))
    }
  }

  object PngDecoder {
    private val Sig: Array[Int] = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

    private[operators] def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    private[operators] def channels(colorType: Int): Int = colorType match {
      case 0 => 1 // gray
      case 2 => 3 // rgb
      case 6 => 4 // rgba
      case t => throw new IllegalArgumentException(
        s"PNG color type $t (palette/gray+alpha) not supported")
    }

    /** PNG textual metadata: every `tEXt` chunk's (keyword, text) pair
      * in stream order — the image-side analog of the WAV/mp4
      * container walks: author/title/software/comment tags ride PNG
      * files as latin-1 keyword\0text payloads, and a corpus pipeline
      * wants them WITHOUT decoding pixels. Same strict chunk-walk
      * discipline as [[decodePixels]] (truncated/overrunning chunks
      * fail loudly); compressed `zTXt`/`iTXt` are skipped by
      * documented contract (rarely load-bearing; the zlib plumbing
      * exists if a corpus needs them). Returns Nil for a PNG with no
      * text chunks; rejects non-PNG payloads.
      */
    def textChunks(uri: String, bytes: Array[Byte]): Seq[(String, String)] = {
      require(bytes.length >= 8 && Sig.indices.forall(i =>
          (bytes(i) & 0xFF) == Sig(i)), s"not a PNG payload: $uri")
      def be32(off: Int): Int =
        ((bytes(off) & 0xFF) << 24) | ((bytes(off + 1) & 0xFF) << 16) |
          ((bytes(off + 2) & 0xFF) << 8) | (bytes(off + 3) & 0xFF)
      var off = 8
      var seenIend = false
      val out = Seq.newBuilder[(String, String)]
      while (!seenIend && off < bytes.length) {
        require(off + 8 <= bytes.length, s"PNG $uri: truncated chunk header")
        val len = be32(off)
        require(len >= 0 && off + 12L + len <= bytes.length,
          s"PNG $uri: chunk overruns payload")
        new String(bytes, off + 4, 4, "US-ASCII") match {
          case "tEXt" =>
            val body = bytes.slice(off + 8, off + 8 + len)
            val nul = body.indexOf(0.toByte)
            require(nul > 0, s"PNG $uri: tEXt chunk missing keyword NUL")
            out += ((new String(body, 0, nul, "ISO-8859-1"),
              new String(body, nul + 1, body.length - nul - 1,
                "ISO-8859-1")))
          case "IEND" => seenIend = true
          case _ => ()
        }
        off += 12 + len
      }
      out.result()
    }

    /** (width, height, unfiltered pixel bytes, row-major, w*channels
      * per row).
      */
    def decodePixels(uri: String, bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      require(bytes.length >= 8 && Sig.indices.forall(i =>
          (bytes(i) & 0xFF) == Sig(i)), s"not a PNG payload: $uri")
      def be32(off: Int): Int =
        ((bytes(off) & 0xFF) << 24) | ((bytes(off + 1) & 0xFF) << 16) |
          ((bytes(off + 2) & 0xFF) << 8) | (bytes(off + 3) & 0xFF)
      var off = 8
      var w = 0; var h = 0; var colorType = -1
      var seenIhdr = false; var seenIend = false
      val idat = new java.io.ByteArrayOutputStream()
      while (!seenIend) {
        require(off + 8 <= bytes.length, s"PNG $uri: truncated chunk header")
        val len = be32(off)
        require(len >= 0 && off + 12L + len <= bytes.length,
          s"PNG $uri: chunk overruns payload")
        new String(bytes, off + 4, 4, "US-ASCII") match {
          case "IHDR" =>
            require(len == 13, s"PNG $uri: IHDR length $len")
            w = be32(off + 8); h = be32(off + 12)
            require((bytes(off + 16) & 0xFF) == 8,
              s"PNG $uri: only bit depth 8 is decoded")
            colorType = bytes(off + 17) & 0xFF
            require((bytes(off + 20) & 0xFF) == 0,
              s"PNG $uri: interlaced streams not supported")
            seenIhdr = true
          case "IDAT" =>
            require(seenIhdr, s"PNG $uri: IDAT before IHDR")
            idat.write(bytes, off + 8, len)
          case "IEND" => seenIend = true
          case _ => () // ancillary chunks skip
        }
        off += 12 + len
      }
      require(seenIhdr && w > 0 && h > 0, s"PNG $uri: missing/empty IHDR")
      val bpp = channels(colorType)
      val stride = w * bpp
      val raw = new Array[Byte]((stride + 1) * h)
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        require(n > 0 || !inf.needsInput(),
          s"PNG $uri: IDAT stream truncated at $got/${raw.length}")
        got += n
      }
      inf.end()
      require(got == raw.length,
        s"PNG $uri: inflated $got bytes, geometry needs ${raw.length}")
      val out = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        val filter = raw(y * (stride + 1)) & 0xFF
        val in = y * (stride + 1) + 1
        val o = y * stride
        var i = 0
        while (i < stride) {
          val x = raw(in + i) & 0xFF
          val left = if (i >= bpp) out(o + i - bpp) & 0xFF else 0
          val up = if (y > 0) out(o + i - stride) & 0xFF else 0
          val upLeft = if (y > 0 && i >= bpp) out(o + i - stride - bpp) & 0xFF else 0
          val recon = filter match {
            case 0 => x
            case 1 => x + left
            case 2 => x + up
            case 3 => x + (left + up) / 2
            case 4 => x + paeth(left, up, upLeft)
            case f => throw new IllegalArgumentException(
              s"PNG $uri: unknown filter $f on row $y")
          }
          out(o + i) = (recon & 0xFF).toByte
          i += 1
        }
        y += 1
      }
      (w, h, out)
    }
  }

  /** Valid 8-bit RGB PNG payloads built per row (deterministic pixels
    * from the id; every scanline encoded with `filter`, exercising the
    * decoder's unfilter path for that type): real zlib-compressed
    * bytes for the real decoder, generated in-plan like
    * [[withSyntheticBmp]]/[[withSyntheticWav]].
    */
  def withSyntheticPng(df: DataFrame, idCol: String,
      w: Int = 4, h: Int = 4, filter: Int = 0): DataFrame = {
    require(filter >= 0 && filter <= 4, s"PNG filter $filter")
    val mk = udf { (id: Long) => Multimodal.encodePng(id, w, h, filter) }
    df.withColumn("media", struct(
      concat(lit("mem://doc/"), col(idCol), lit(".png")).as("uri"),
      mk(col(idCol).cast("long")).as("bytes"),
      map(lit("format"), lit("png"),
        lit("origin"), lit("synthetic")).as("meta")))
  }

  /** Deterministic RGB pixels for row `id`. */
  private[graft] def syntheticPixels(id: Long, w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => (id * 31 + i * 7).toByte)

  /** Real PNG encoding (signature, IHDR/IDAT/IEND with CRC32, deflate
    * of filter-prefixed scanlines) — the fixture-side inverse of
    * [[PngDecoder]]; the filter math here is the encoder direction of
    * the decoder's unfilter, so round-trip tests pin both.
    */
  private[graft] def encodePng(id: Long, w: Int, h: Int, filter: Int): Array[Byte] =
    encodePngPixels(w, h, syntheticPixels(id, w, h), filter)

  /** General pixel encoder: channel count (1/3/4 → gray/RGB/RGBA) is
    * inferred from the buffer size. [[resizePng]] re-encodes through
    * this, so resized payloads are REAL PNGs the decoder round-trips.
    */
  private[graft] def encodePngPixels(w: Int, h: Int, pix: Array[Byte],
      filter: Int): Array[Byte] = {
    require(w > 0 && h > 0 && pix.length % (w * h) == 0,
      s"pixel buffer ${pix.length} does not tile ${w}x$h")
    val bpp = pix.length / (w * h)
    val colorType = bpp match {
      case 1 => 0
      case 3 => 2
      case 4 => 6
      case n => throw new IllegalArgumentException(s"$n channels unsupported")
    }
    val stride = w * bpp
    val filtered = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      filtered(y * (stride + 1)) = filter.toByte
      var i = 0
      while (i < stride) {
        val cur = pix(y * stride + i) & 0xFF
        val left = if (i >= bpp) pix(y * stride + i - bpp) & 0xFF else 0
        val up = if (y > 0) pix((y - 1) * stride + i) & 0xFF else 0
        val upLeft = if (y > 0 && i >= bpp) pix((y - 1) * stride + i - bpp) & 0xFF else 0
        val pred = filter match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => PngDecoder.paeth(left, up, upLeft)
        }
        filtered(y * (stride + 1) + 1 + i) = ((cur - pred) & 0xFF).toByte
        i += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(filtered); defl.finish()
    val buf = new Array[Byte](filtered.length + 64)
    val compLen = defl.deflate(buf)
    require(defl.finished(), "PNG encode: deflate buffer undersized")
    defl.end()
    def chunk(typ: String, body: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + body.length)
      out.putInt(body.length).put(typ.getBytes("US-ASCII")).put(body)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(body)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(colorType.toByte) // depth 8
      .put(0.toByte).put(0.toByte).put(0.toByte)       // deflate, std, no interlace
      .array()
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", buf.take(compLen)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Extracted per-audio features: the audio analogue of
    * [[MediaFeatures]] (duration and sample geometry instead of pixel
    * geometry).
    */
  case class AudioFeatures(sample_rate: Int, channels: Int,
      bits_per_sample: Int, n_samples: Long, duration_ms: Long,
      checksum: Long)

  /** Audio decoder contract — same lifecycle as [[MediaDecoder]]. */
  trait AudioDecoder extends Serializable {
    def open(): Unit = ()
    def decode(uri: String, bytes: Array[Byte],
        meta: Map[String, String]): AudioFeatures
  }

  /** REAL decoder for WAV (RIFF/PCM) payloads: the container is a
    * little-endian chunk list ('RIFF'..'WAVE', then 'fmt ' carrying
    * sample rate/channels/bit depth and 'data' carrying the PCM
    * payload), so decoding is byte arithmetic only — the second
    * codec-free format proving the decoder slot is real (after
    * [[BmpDecoder]]). Compressed audio (mp3/aac) would plug into the
    * same contract behind a codec library. Malformed payloads and
    * non-PCM WAVs fail loudly.
    */
  class WavDecoder extends AudioDecoder {
    override def decode(uri: String, bytes: Array[Byte],
        meta: Map[String, String]): AudioFeatures = {
      val p = WavDecoder.parse(uri, bytes)
      AudioFeatures(p.sampleRate, p.channels, p.bits, p.nSamples,
        p.nSamples * 1000L / p.sampleRate, byteChecksum(bytes))
    }
  }

  object WavDecoder {
    /** Parsed PCM geometry plus the data chunk's location, so sample
      * readers ([[extractWavFrameRms]]) share one chunk-walk
      * definition with the feature decoder.
      */
    case class Pcm(sampleRate: Int, channels: Int, bits: Int,
        blockAlign: Int, dataOff: Int, dataSize: Long) {
      def nSamples: Long = dataSize / blockAlign
    }

    def parse(uri: String, bytes: Array[Byte]): Pcm = {
      def ascii(off: Int, s: String): Boolean =
        s.indices.forall(i => bytes(off + i) == s.charAt(i).toByte)
      require(bytes.length >= 44 && ascii(0, "RIFF") && ascii(8, "WAVE"),
        s"not a WAV payload: $uri (${bytes.length} bytes)")
      def le32(off: Int): Int =
        (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8) |
          ((bytes(off + 2) & 0xFF) << 16) | ((bytes(off + 3) & 0xFF) << 24)
      def le16(off: Int): Int = (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8)
      // walk the chunk list: 'fmt ' then 'data' (other chunks legal).
      // Long offsets: a corrupt 32-bit size would wrap Int arithmetic
      // and could walk BACKWARDS (hanging the task); as a Long the
      // offset strictly increases and the loop bound ends the walk.
      var off = 12L
      var fmtOff = -1
      var dataOff = -1
      var dataSize = -1L
      while (off + 8 <= bytes.length && (fmtOff < 0 || dataSize < 0)) {
        val size = le32(off.toInt + 4).toLong & 0xFFFFFFFFL
        if (ascii(off.toInt, "fmt ")) {
          // a PCM fmt chunk carries 16 bytes of fields; a shorter or
          // truncated one must fail here, not fabricate geometry from
          // whatever bytes follow (or throw a raw out-of-bounds later)
          require(size >= 16 && off + 8 + 16 <= bytes.length,
            s"WAV $uri fmt chunk truncated (declared $size bytes, " +
              s"${bytes.length - off - 8} remain)")
          fmtOff = off.toInt + 8
        } else if (ascii(off.toInt, "data")) {
          require(off + 8 + size <= bytes.length,
            s"WAV $uri data chunk ($size bytes) overruns the payload")
          dataOff = off.toInt + 8
          dataSize = size
        }
        off += 8 + size + (size & 1) // chunks pad to even
      }
      require(fmtOff >= 0 && dataSize >= 0,
        s"WAV $uri missing fmt/data chunk")
      require(le16(fmtOff) == 1,
        s"WAV $uri is not uncompressed PCM (format tag ${le16(fmtOff)}): " +
          "compressed audio needs a codec-backed AudioDecoder")
      val channels = le16(fmtOff + 2)
      val sampleRate = le32(fmtOff + 4)
      val bits = le16(fmtOff + 14)
      val blockAlign = le16(fmtOff + 12)
      require(channels > 0 && sampleRate > 0 && blockAlign > 0,
        s"WAV $uri has degenerate fmt fields")
      Pcm(sampleRate, channels, bits, blockAlign, dataOff, dataSize)
    }
  }

  /** Per-frame RMS energy from the REAL PCM samples — the first-pass
    * audio quality/segmentation signal (silence and clipping stand
    * out), computed over `samplesPerFrame`-sample frames of 16-bit PCM
    * (all channels interleaved; the trailing short frame is emitted
    * with its actual sample count). One input row fans out to
    * ceil(nSamples/frame) rows — per-row generation, no shuffle, bytes
    * never leave the row.
    */
  /** PNG textual metadata per media row: one output row per `tEXt`
    * chunk (id, keyword, text) via [[PngDecoder.textChunks]] — the
    * "harvest author/software/comment tags across a 100 TB image
    * corpus" op: per-row chunk walk only (no pixel decode, no
    * inflate), bytes never leave the row, no shuffle. Rows whose
    * payload has no text chunks emit nothing; non-PNG payloads fail
    * loudly (filter upstream by container type).
    */
  def extractPngText(df: DataFrame, idCol: String,
      mediaCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("keyword", StringType, nullable = false),
      StructField("text", StringType, nullable = false)))
    val input = df.select(
      col(idCol).cast("long").as("id"),
      col(s"$mediaCol.uri").as("uri"),
      col(s"$mediaCol.bytes").as("bytes"))
    input.mapPartitions { rows =>
      rows.flatMap { r =>
        PngDecoder.textChunks(r.getString(1), r.getAs[Array[Byte]](2))
          .map { case (k, v) => Row(r.getLong(0), k, v) }
      }
    }(Encoders.row(outSchema))
  }

  def extractWavFrameRms(df: DataFrame, idCol: String, mediaCol: String,
      samplesPerFrame: Int): DataFrame = {
    require(samplesPerFrame >= 1)
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("frame_no", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("rms", DoubleType, nullable = false)))
    val input = df.select(
      col(idCol).cast("long").as("id"),
      col(s"$mediaCol.uri").as("uri"),
      col(s"$mediaCol.bytes").as("bytes"))
    input.mapPartitions { rows =>
      rows.flatMap { r =>
        val uri = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        val p = WavDecoder.parse(uri, bytes)
        require(p.bits == 16, s"WAV $uri: frame RMS reads 16-bit PCM, got ${p.bits}")
        val totalShorts = (p.dataSize / 2).toInt // all channels interleaved
        val frameShorts = samplesPerFrame * p.channels
        (0 until (totalShorts + frameShorts - 1) / frameShorts).map { f =>
          val start = f * frameShorts
          val n = math.min(frameShorts, totalShorts - start)
          var sum = 0.0
          var i = 0
          while (i < n) {
            val o = p.dataOff + (start + i) * 2
            val s = ((bytes(o) & 0xFF) | (bytes(o + 1) << 8)).toShort.toDouble
            sum += s * s
            i += 1
          }
          Row(r.getLong(0), f.toLong, (n / p.channels).toLong,
            math.sqrt(sum / n))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Valid 16-bit mono PCM WAV payloads built per row (deterministic
    * samples from the id): real bytes for the real decoder, generated
    * in-plan — the audio counterpart of [[withSyntheticBmp]].
    */
  def withSyntheticWav(df: DataFrame, idCol: String,
      sampleRate: Int = 8000, nSamples: Int = 400): DataFrame = {
    val mk = udf { (id: Long) =>
      val dataSize = nSamples * 2
      val b = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
        .put("WAVE".getBytes("US-ASCII"))
      b.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1)        // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
        .putShort(2).putShort(16)       // block align, bits
      b.put("data".getBytes("US-ASCII")).putInt(dataSize)
      var i = 0
      while (i < nSamples) { b.putShort((id * 131 + i * 7).toShort); i += 1 }
      b.array()
    }
    df.withColumn("media", struct(
      concat(lit("mem://doc/"), col(idCol), lit(".wav")).as("uri"),
      mk(col(idCol).cast("long")).as("bytes"),
      map(lit("format"), lit("wav"),
        lit("origin"), lit("synthetic")).as("meta")))
  }

  /** Audio decode/feature-extract: same per-partition decoder lifecycle
    * and bytes-dropped output as [[extractFeatures]].
    */
  def extractAudioFeatures(df: DataFrame, idCol: String, mediaCol: String,
      decoder: AudioDecoder): DataFrame =
    extractWith(df, idCol, mediaCol,
      Encoders.product[AudioFeatures].schema, () => decoder.open(),
      (uri, bytes, meta) => decoder.decode(uri, bytes, meta))

  /** The one definition of the decode plumbing both extractors ride:
    * project (id, uri, bytes, meta), stream each partition through a
    * single decoder init, emit `id +:` the feature product's fields,
    * dropping the heavy bytes from the output. Fixes to the shape
    * (projection, lifecycle, meta decoding) land once, for every
    * modality.
    */
  private def extractWith(df: DataFrame, idCol: String, mediaCol: String,
      featSchema: StructType, open: () => Unit,
      decodeRow: (String, Array[Byte], Map[String, String]) => Product)
      : DataFrame = {
    val outSchema = StructType(
      StructField("id", LongType, nullable = false) +:
      featSchema.fields.toIndexedSeq)
    val input = df.select(
      col(idCol).cast("long").as("id"),
      col(s"$mediaCol.uri").as("uri"),
      col(s"$mediaCol.bytes").as("bytes"),
      col(s"$mediaCol.meta").as("meta"))
    input.mapPartitions { rows =>
      open() // once per partition: codec context init
      rows.map { r =>
        val meta = r.getMap[String, String](3).toMap
        val f = decodeRow(r.getString(1), r.getAs[Array[Byte]](2), meta)
        Row.fromSeq(r.getLong(0) +: f.productIterator.toIndexedSeq)
      }
    }(Encoders.row(outSchema))
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
      decoder: MediaDecoder): DataFrame =
    extractWith(df, idCol, mediaCol,
      Encoders.product[MediaFeatures].schema, () => decoder.open(),
      (uri, bytes, meta) => decoder.decode(uri, bytes, meta))

  /** REAL resize for PNG payloads: decode pixels ([[PngDecoder]]),
    * nearest-neighbor sample to (w, h), re-encode as a real PNG
    * ([[encodePngPixels]]) — decode → transform → encode entirely
    * stock-JVM, per row, no shuffle, bytes never leave the row. The
    * output payload is itself decodable, so resize chains compose.
    * (Nearest-neighbor, not area-average: the standard cheap policy
    * when downsampling features for thumbnailing/dedup sketches;
    * swap the kernel inside the same shape for bilinear.)
    */
  def resizePng(df: DataFrame, mediaCol: String, w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0)
    val resizeUdf = udf { (uri: String, bytes: Array[Byte]) =>
      val (sw, sh, pix) = PngDecoder.decodePixels(uri, bytes)
      val bpp = pix.length / (sw * sh)
      val out = new Array[Byte](w * h * bpp)
      var y = 0
      while (y < h) {
        val sy = (y.toLong * sh / h).toInt
        var x = 0
        while (x < w) {
          val sx = (x.toLong * sw / w).toInt
          System.arraycopy(pix, (sy * sw + sx) * bpp, out, (y * w + x) * bpp, bpp)
          x += 1
        }
        y += 1
      }
      encodePngPixels(w, h, out, filter = 0)
    }
    df.withColumn(mediaCol, struct(
      col(s"$mediaCol.uri").as("uri"),
      resizeUdf(col(s"$mediaCol.uri"), col(s"$mediaCol.bytes")).as("bytes"),
      stampMeta(col(s"$mediaCol.meta"), w, h)))
  }

  /** Replace (not duplicate) the `resized` meta key — resizes compose,
    * and map_concat on a repeated key is a runtime error under Spark's
    * default EXCEPTION dedup policy.
    */
  private def stampMeta(meta: org.apache.spark.sql.Column, w: Int, h: Int) =
    map_concat(
      map_filter(meta, (k, _) => k =!= "resized"),
      map(lit("resized"), concat_ws("x", lit(w), lit(h)))).as("meta")

  /** Per-image pixel statistics from the REAL decode: geometry plus
    * per-channel mean values — the cheap quality/filtering signal
    * (all-black, blown-out, or single-color images stand out) computed
    * without any codec library. Same per-partition lifecycle and
    * bytes-dropped output as [[extractFeatures]].
    */
  def extractPngStats(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("channel_means", ArrayType(DoubleType, containsNull = false),
        nullable = false)))
    val input = df.select(
      col(idCol).cast("long").as("id"),
      col(s"$mediaCol.uri").as("uri"),
      col(s"$mediaCol.bytes").as("bytes"))
    input.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, pix) = PngDecoder.decodePixels(r.getString(1),
          r.getAs[Array[Byte]](2))
        val bpp = pix.length / (w * h)
        val sums = new Array[Long](bpp)
        var i = 0
        while (i < pix.length) { sums(i % bpp) += pix(i) & 0xFF; i += 1 }
        Row(r.getLong(0), w, h, bpp,
          sums.map(_.toDouble / (w.toLong * h)).toIndexedSeq)
      }
    }(Encoders.row(outSchema))
  }

  /** Perceptual difference-hash (dHash) over the REAL pixel decode:
    * gray-convert (integer Rec.601 luma), nearest-neighbor sample to a
    * 9×8 grid, emit bit (x,y) = 1 iff gray(x+1,y) > gray(x,y) — a
    * 64-bit signature stable under re-encoding, scaling, and small
    * edits, which is what byte-level hashing can never give for
    * images. Output column is named `simhash` ON PURPOSE: the
    * signature plugs straight into [[Dedup.simHashNearDupFromSigs]]'s
    * pigeonhole banding + exact-Hamming verify, so IMAGE near-dup
    * rides the same candidate-pruned equi-join machinery as text
    * near-dup ([[imageNearDup]] is that one-liner).
    */
  /** Magic-byte dispatch over the REAL pixel decoders: JPEG SOI →
    * [[JpegDecoder]], PNG signature (and everything else, which
    * PngDecoder rejects loudly) → [[PngDecoder]]. Both return the
    * same (w, h, row-major 1/3/4-bpp) contract, so every consumer
    * (dHash, stats) is format-agnostic.
    */
  private[operators] def decodeImagePixels(uri: String,
      bytes: Array[Byte]): (Int, Int, Array[Byte]) =
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF
      && (bytes(1) & 0xFF) == 0xD8) JpegDecoder.decodePixels(uri, bytes)
    else PngDecoder.decodePixels(uri, bytes)

  def imageDHash(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val hashUdf = udf { (uri: String, bytes: Array[Byte]) =>
      val (w, h, pix) = decodeImagePixels(uri, bytes)
      val bpp = pix.length / (w * h)
      def gray(x: Int, y: Int): Int = {
        val o = (y * w + x) * bpp
        if (bpp == 1) pix(o) & 0xFF
        else ((pix(o) & 0xFF) * 299 + (pix(o + 1) & 0xFF) * 587 +
          (pix(o + 2) & 0xFF) * 114) / 1000
      }
      var sig = 0L
      var y = 0
      while (y < 8) {
        val sy = (y.toLong * h / 8).toInt
        var x = 0
        while (x < 8) {
          val sxa = (x.toLong * w / 9).toInt
          val sxb = ((x + 1).toLong * w / 9).toInt
          if (gray(sxb, sy) > gray(sxa, sy)) sig |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      sig
    }
    df.select(col(idCol).cast("long").as("doc_id"),
      hashUdf(col(s"$mediaCol.uri"), col(s"$mediaCol.bytes")).as("simhash"))
  }

  /** Image near-dup pairs within a Hamming radius of dHash signatures —
    * the pigeonhole-banded equi-join, shared verbatim with text
    * SimHash dedup.
    */
  def imageNearDup(df: DataFrame, idCol: String, mediaCol: String,
      maxHamming: Int = 6): DataFrame =
    Dedup.simHashNearDupFromSigs(imageDHash(df, idCol, mediaCol), maxHamming)

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
      stampMeta(col(s"$mediaCol.meta"), w, h)))
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
