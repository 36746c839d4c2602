package graft

import java.nio.ByteBuffer

import org.apache.spark.sql.functions.{col, concat, lit, map, struct}

import graft.operators.{MediaContainers, Mp3Decoder, Mp4Decoder, Multimodal}

/** Hand-built REAL container fixtures for the MP3 frame-header and
  * MP4 box parsers: every byte below is constructed to the published
  * container layouts (MPEG audio frame header bit fields; ISO-BMFF
  * big-endian boxes), so the parsers are exercised on genuine
  * structure, not mocks.
  */
class MediaContainersSpec extends SparkTestBase {

  /** One MPEG-1 Layer III frame: 128 kbps, 44100 Hz, stereo, no
    * padding → header FF FB 90 00, frame length 144·128000/44100 = 417.
    */
  private def mp3Frame(): Array[Byte] = {
    val f = new Array[Byte](417)
    f(0) = 0xFF.toByte; f(1) = 0xFB.toByte; f(2) = 0x90.toByte; f(3) = 0x00
    f
  }

  private def id3v2(bodySize: Int): Array[Byte] = {
    val h = new Array[Byte](10 + bodySize)
    h(0) = 'I'; h(1) = 'D'; h(2) = '3'; h(3) = 4; h(4) = 0; h(5) = 0
    // syncsafe size
    h(6) = ((bodySize >> 21) & 0x7F).toByte; h(7) = ((bodySize >> 14) & 0x7F).toByte
    h(8) = ((bodySize >> 7) & 0x7F).toByte; h(9) = (bodySize & 0x7F).toByte
    h
  }

  test("mp3: frame walk counts frames, exact duration, ID3v2/v1 skipped") {
    val frames = Array.fill(10)(mp3Frame()).flatten
    val tag1 = new Array[Byte](128)
    tag1(0) = 'T'; tag1(1) = 'A'; tag1(2) = 'G'
    val payload = id3v2(33) ++ frames ++ tag1
    val p = MediaContainers.parseMp3("a.mp3", payload)
    assert(p.sampleRate == 44100 && p.channels == 2 && p.nFrames == 10L)
    assert(p.samplesPerFrame == 1152)
    // 10·1152 samples at 44100 Hz = 261.22 ms, floor to 261
    assert(p.durationMs == 261L, p.toString)
  }

  test("mp3: corrupt sync, truncation, and layer gates fail loudly") {
    val good = Array.fill(3)(mp3Frame()).flatten
    intercept[IllegalArgumentException] { // garbage between frames
      MediaContainers.parseMp3("x.mp3",
        good ++ Array[Byte](0x00, 0x01, 0x02, 0x03, 0x04))
    }
    intercept[IllegalArgumentException] { // truncated final frame
      MediaContainers.parseMp3("x.mp3", good.dropRight(10))
    }
    intercept[IllegalArgumentException] { // Layer I header (layer bits 11)
      val f = mp3Frame(); f(1) = 0xFF.toByte
      MediaContainers.parseMp3("x.mp3", f)
    }
    intercept[IllegalArgumentException] { // not audio at all
      MediaContainers.parseMp3("x.mp3", "plainly text".getBytes)
    }
  }

  /** Minimal valid MP4: ftyp + moov(mvhd v0 + trak(tkhd v0 640×360)). */
  private def mp4Fixture(timescale: Int, duration: Int): Array[Byte] = {
    def box(fourcc: String, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + body.length)
      b.putInt(8 + body.length).put(fourcc.getBytes("US-ASCII")).put(body)
      b.array()
    }
    val ftyp = box("ftyp", "isomiso2".getBytes("US-ASCII"))
    val mvhd = {
      val b = ByteBuffer.allocate(100)
      b.putInt(0)          // version 0 + flags
      b.putInt(0).putInt(0) // creation, modification
      b.putInt(timescale).putInt(duration)
      b.array()            // rate/volume/matrix left zero: not read
    }
    val tkhd = {
      val b = ByteBuffer.allocate(84)
      b.putInt(0)                       // version 0 + flags
      b.position(76)                    // skip to width/height (o+84-8)
      b.putInt(640 << 16).putInt(360 << 16)
      b.array()
    }
    ftyp ++ box("moov", box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd)))
  }

  test("mp4: box walk reads timescale/duration and 16.16 track dims") {
    val p = MediaContainers.parseMp4("v.mp4", mp4Fixture(1000, 5000))
    assert(p.timescale == 1000L && p.duration == 5000L)
    assert(p.durationMs == 5000L)
    assert(p.width == 640 && p.height == 360 && p.nTracks == 1)
    assert(p.brands == "isom")
  }

  test("mp4: missing moov, overrun box, and non-mp4 fail loudly") {
    intercept[IllegalArgumentException] { // ftyp only
      MediaContainers.parseMp4("v.mp4",
        mp4Fixture(1000, 5000).take(16))
    }
    intercept[IllegalArgumentException] { // box size overruns payload
      val f = mp4Fixture(1000, 5000)
      val b = ByteBuffer.wrap(f)
      b.putInt(16, 1 << 30) // moov size absurd
      MediaContainers.parseMp4("v.mp4", f)
    }
    intercept[IllegalArgumentException] {
      MediaContainers.parseMp4("v.mp4", "RIFFxxxxWAVE".getBytes)
    }
  }

  test("Mp3Decoder/Mp4Decoder ride the extract plumbing end-to-end") {
    import spark.implicits._
    val mp3 = id3v2(0) ++ Array.fill(5)(mp3Frame()).flatten
    val dfA = Seq((1L, mp3)).toDF("doc_id", "b")
      .select(col("doc_id"), struct(
        concat(lit("mem://"), col("doc_id"), lit(".mp3")).as("uri"),
        col("b").as("bytes"),
        map(lit("format"), lit("mp3")).as("meta")).as("media"))
    val a = Multimodal.extractAudioFeatures(dfA, "doc_id", "media",
      new Mp3Decoder).collect().head
    assert(a.getInt(1) == 44100 && a.getInt(2) == 2)
    assert(a.getLong(4) == 5L * 1152L, a.toString)
    assert(a.getLong(5) == 5L * 1152L * 1000L / 44100L, a.toString)

    val dfV = Seq((2L, mp4Fixture(600, 1200))).toDF("doc_id", "b")
      .select(col("doc_id"), struct(
        concat(lit("mem://"), col("doc_id"), lit(".mp4")).as("uri"),
        col("b").as("bytes"),
        map(lit("format"), lit("mp4")).as("meta")).as("media"))
    val v = Multimodal.extractFeatures(dfV, "doc_id", "media",
      new Mp4Decoder).collect().head
    assert(v.getInt(1) == 640 && v.getInt(2) == 360
      && v.getString(3) == "mp4", v.toString)
  }
}
