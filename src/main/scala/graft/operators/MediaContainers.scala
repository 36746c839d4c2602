package graft.operators

/** Pure-JVM CONTAINER parsers for the two compressed-media formats
  * whose SAMPLE decode genuinely needs a codec library (none exists in
  * this container): MP3 frame-header walking and MP4/ISO-BMFF box
  * walking. The split is principled — geometry, duration, sample rate,
  * channel count, and frame structure live in the CONTAINER and are
  * plain byte arithmetic; only the audio samples / video pixels need
  * mpg123/ffmpeg-class code. So the metadata features a curation
  * pipeline filters on (duration caps, sample-rate gates, resolution
  * gates) are REAL here, and only the sample-level transforms remain
  * honest loud stubs.
  *
  * Both parsers fail loudly on malformed payloads — the
  * [[Multimodal.BmpDecoder]] corrupt-input contract.
  */
object MediaContainers {

  // ---- MP3 (MPEG-1/2/2.5 Layer III) ----

  /** Bitrate table (kbps) for Layer III, indexed [versionIdx][brIdx];
    * versionIdx 0 = MPEG-1, 1 = MPEG-2/2.5. Index 0 ("free") and 15
    * are rejected.
    */
  private val Mp3Bitrates: Array[Array[Int]] = Array(
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1),
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, -1))

  /** Sample rates by version bits (00=MPEG2.5, 10=MPEG2, 11=MPEG1). */
  private def mp3SampleRate(versionBits: Int, srIdx: Int): Int = {
    val base = Array(44100, 48000, 32000)
    require(srIdx < 3, s"MP3 reserved sample-rate index $srIdx")
    versionBits match {
      case 3 => base(srIdx)       // MPEG-1
      case 2 => base(srIdx) / 2   // MPEG-2
      case 0 => base(srIdx) / 4   // MPEG-2.5
      case v => throw new IllegalArgumentException(
        s"MP3 reserved version bits $v")
    }
  }

  /** Parsed whole-stream MP3 geometry. */
  case class Mp3Info(sampleRate: Int, channels: Int, nFrames: Long,
      samplesPerFrame: Int) {
    def nSamples: Long = nFrames * samplesPerFrame
    def durationMs: Long = nSamples * 1000L / sampleRate
  }

  /** Walk every Layer-III frame header in the payload: skip an ID3v2
    * prefix (syncsafe size) and an ID3v1 'TAG' trailer, then require
    * frames to tile the stream contiguously — a broken frame chain is
    * corrupt data, not a shorter song. VBR streams work by
    * construction (each frame declares its own length).
    */
  def parseMp3(uri: String, bytes: Array[Byte]): Mp3Info = {
    require(bytes.length >= 4, s"not an MP3 payload: $uri (${bytes.length} bytes)")
    var off = 0L
    // ID3v2: "ID3" + ver(2) + flags(1) + syncsafe size(4), then body
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val size = ((bytes(6) & 0x7F) << 21) | ((bytes(7) & 0x7F) << 14) |
        ((bytes(8) & 0x7F) << 7) | (bytes(9) & 0x7F)
      off = 10L + size
    }
    var end = bytes.length.toLong
    // ID3v1 trailer: fixed 128 bytes starting "TAG"
    if (end - off >= 128 && bytes((end - 128).toInt) == 'T'
      && bytes((end - 127).toInt) == 'A' && bytes((end - 126).toInt) == 'G')
      end -= 128

    var nFrames = 0L
    var sampleRate = -1
    var channels = -1
    var spf = -1
    while (off + 4 <= end) {
      val o = off.toInt
      val b1 = bytes(o) & 0xFF
      val b2 = bytes(o + 1) & 0xFF
      require(b1 == 0xFF && (b2 & 0xE0) == 0xE0,
        f"MP3 $uri: frame sync lost at byte $o (found $b1%02X $b2%02X) — corrupt or not MPEG audio")
      val versionBits = (b2 >> 3) & 0x3
      val layerBits = (b2 >> 1) & 0x3
      require(layerBits == 1,
        s"MP3 $uri: only Layer III is parsed (layer bits $layerBits)")
      val b3 = bytes(o + 2) & 0xFF
      val brIdx = b3 >> 4
      require(brIdx >= 1 && brIdx <= 14,
        s"MP3 $uri: bitrate index $brIdx (free/bad) not supported")
      val srIdx = (b3 >> 2) & 0x3
      val padding = (b3 >> 1) & 0x1
      val sr = mp3SampleRate(versionBits, srIdx)
      val isV1 = versionBits == 3
      val kbps = Mp3Bitrates(if (isV1) 0 else 1)(brIdx)
      val thisSpf = if (isV1) 1152 else 576
      val frameLen = (if (isV1) 144 else 72) * kbps * 1000 / sr + padding
      val ch = if (((bytes(o + 3) & 0xFF) >> 6) == 3) 1 else 2
      if (sampleRate < 0) { sampleRate = sr; channels = ch; spf = thisSpf }
      require(sr == sampleRate,
        s"MP3 $uri: mid-stream sample-rate change ($sampleRate -> $sr)")
      require(off + frameLen <= end,
        s"MP3 $uri: truncated final frame (needs $frameLen bytes, " +
          s"${end - off} remain)")
      nFrames += 1
      off += frameLen
    }
    require(nFrames > 0, s"MP3 $uri: no audio frames found")
    require(off == end,
      s"MP3 $uri: ${end - off} trailing bytes after the last frame")
    Mp3Info(sampleRate, channels, nFrames, spf)
  }

  // ---- MP4 / ISO BMFF ----

  /** Parsed MP4 presentation-level metadata. */
  case class Mp4Info(timescale: Long, duration: Long, width: Int,
      height: Int, nTracks: Int, brands: String) {
    def durationMs: Long =
      if (timescale > 0) duration * 1000L / timescale else 0L
  }

  /** Walk the top-level box list (big-endian [size][fourcc]), require
    * an 'ftyp' leader, then read moov/mvhd (timescale + duration,
    * versions 0 and 1) and each trak/tkhd (16.16 fixed-point width/
    * height — the video track carries nonzero dims). Box sizes that
    * overrun the payload, a missing moov, and version-reserved fields
    * all fail loudly.
    */
  def parseMp4(uri: String, bytes: Array[Byte]): Mp4Info = {
    def be32(o: Int): Long =
      ((bytes(o) & 0xFFL) << 24) | ((bytes(o + 1) & 0xFFL) << 16) |
        ((bytes(o + 2) & 0xFFL) << 8) | (bytes(o + 3) & 0xFFL)
    def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
    def fourcc(o: Int): String =
      new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    require(bytes.length >= 16 && fourcc(4) == "ftyp",
      s"not an MP4/ISO-BMFF payload (no ftyp leader): $uri")
    val brands = fourcc(8)

    var timescale = -1L
    var duration = -1L
    var width = 0
    var height = 0
    var nTracks = 0

    def walk(start: Long, limit: Long, depth: Int): Unit = {
      var off = start
      while (off + 8 <= limit) {
        val o = off.toInt
        var size = be32(o)
        var hdr = 8L
        if (size == 1) { size = be64(o + 8); hdr = 16L }
        else if (size == 0) size = limit - off // box runs to the end
        require(size >= hdr && off + size <= limit,
          s"MP4 $uri: box '${fourcc(o + 4)}' size $size overruns the payload")
        fourcc(o + 4) match {
          case "moov" | "trak" if depth < 4 =>
            if (fourcc(o + 4) == "trak") nTracks += 1
            walk(off + hdr, off + size, depth + 1)
          case "mvhd" =>
            val v = bytes(o + 8) & 0xFF
            if (v == 1) { timescale = be32(o + 28); duration = be64(o + 32) }
            else { timescale = be32(o + 20); duration = be32(o + 24) }
            require(timescale > 0, s"MP4 $uri: mvhd timescale 0")
          case "tkhd" =>
            val v = bytes(o + 8) & 0xFF
            val base = if (v == 1) o + 96 else o + 84
            // 16.16 fixed point; video tracks carry nonzero dims
            val w = (be32(base) >> 16).toInt
            val h = (be32(base + 4) >> 16).toInt
            if (w > 0 && h > 0) { width = math.max(width, w); height = math.max(height, h) }
          case _ => ()
        }
        off += size
      }
    }
    walk(0L, bytes.length.toLong, 0)
    require(timescale > 0 && duration >= 0,
      s"MP4 $uri: no moov/mvhd box — not a complete presentation")
    Mp4Info(timescale, duration, width, height, nTracks, brands)
  }
}

/** [[Multimodal.AudioDecoder]] over [[MediaContainers.parseMp3]]:
  * REAL sample-rate/channel/duration features from the frame-header
  * walk; `bits_per_sample` is 0 by contract (compressed audio has no
  * container bit depth — decoding samples needs a codec library).
  */
class Mp3Decoder extends Multimodal.AudioDecoder {
  override def decode(uri: String, bytes: Array[Byte],
      meta: Map[String, String]): Multimodal.AudioFeatures = {
    val p = MediaContainers.parseMp3(uri, bytes)
    Multimodal.AudioFeatures(p.sampleRate, p.channels,
      bits_per_sample = 0, n_samples = p.nSamples,
      duration_ms = p.durationMs,
      checksum = Multimodal.byteChecksum(bytes))
  }
}

/** [[Multimodal.MediaDecoder]] over [[MediaContainers.parseMp4]]:
  * REAL presentation geometry from the box walk (frame pixels need a
  * codec; the container carries the track dims).
  */
class Mp4Decoder extends Multimodal.MediaDecoder {
  override def decode(uri: String, bytes: Array[Byte],
      meta: Map[String, String]): Multimodal.MediaFeatures = {
    val p = MediaContainers.parseMp4(uri, bytes)
    Multimodal.MediaFeatures(width = p.width, height = p.height,
      format = "mp4", n_bytes = bytes.length.toLong,
      checksum = Multimodal.byteChecksum(bytes))
  }
}
