package graft

import org.apache.spark.sql.functions.{col, concat, lit, map, struct}
import org.apache.spark.sql.types._

import graft.operators.Multimodal

/** L8 multimodal columns: typed media struct, per-partition decode,
  * frame sampling. The decode itself is a deterministic stub (no codec
  * libs in this container); the Spark plumbing under test is real.
  */
class MultimodalSpec extends SparkTestBase {

  private def mediaDf = {
    import spark.implicits._
    Multimodal.withSyntheticMedia(
      (0L until 20L).toDF("doc_id"), "doc_id")
  }

  test("media column has the canonical struct<uri,bytes,meta> type") {
    val mt = mediaDf.schema("media").dataType.asInstanceOf[StructType]
    assert(mt("uri").dataType === StringType)
    assert(mt("bytes").dataType === BinaryType)
    assert(mt("meta").dataType.asInstanceOf[MapType].keyType === StringType)
    assert(mt("meta").dataType.asInstanceOf[MapType].valueType === StringType)
  }

  test("binaryFile source: on-disk PNGs ingest into the media struct and decode") {
    // THE 100 TB ingestion path: media lands as FILES, not parquet —
    // spark.read.format("binaryFile") gives (path, content, length) and
    // maps straight into the canonical struct<uri,bytes,meta>; the real
    // PNG decoder then recovers the pixel dimensions from disk bytes.
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    (0L until 6L).foreach { id =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/img$id.png"),
        Multimodal.encodePng(id, 5, 3, filter = 0))
    }
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png").load(dir)
    assert(files.count() === 6)
    val media = files.select(
      org.apache.spark.sql.functions.regexp_extract(
        col("path"), "img(\\d+)\\.png", 1).cast("long").as("doc_id"),
      struct(col("path").as("uri"), col("content").as("bytes"),
        map(lit("format"), lit("png")).as("meta")).as("media"))
    val feats = Multimodal.extractFeatures(
      media, "doc_id", "media", new Multimodal.PngDecoder)
    val dims = feats.collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[Int]("width"), r.getAs[Int]("height")))
    assert(dims.length === 6)
    assert(dims.forall { case (_, w, h) => w === 5 && h === 3 },
      s"decoded dims from disk bytes: ${dims.mkString(",")}")
  }

  test("extractFeatures decodes every row, deterministically, in parallel") {
    val df = mediaDf.repartition(4) // decode must not depend on layout
    val feats = Multimodal.extractFeatures(
      df, "doc_id", "media", new Multimodal.StubDecoder)
    assert(feats.columns.toSeq ===
      Seq("id", "width", "height", "format", "n_bytes", "checksum"))
    val rows = feats.collect()
    assert(rows.length === 20)
    assert(rows.forall(_.getLong(4) === 32L), "sha256-derived payload is 32 bytes")
    assert(rows.forall(_.getString(3) === "img"), "format from meta map")

    // deterministic: same input, different partitioning => same features
    val again = Multimodal.extractFeatures(
      mediaDf.repartition(7), "doc_id", "media", new Multimodal.StubDecoder)
    assert(again.collect().toSet === rows.toSet)

    // bytes column must NOT survive into the feature output (never
    // shuffle the payload downstream)
    assert(!feats.columns.contains("bytes"))
  }

  test("BmpDecoder REALLY decodes: header width/height recovered, corrupt fails") {
    import spark.implicits._
    val bmps = Multimodal.withSyntheticBmp(
      (0L until 12L).toDF("doc_id"), "doc_id", w = 7, h = 5)
    val feats = Multimodal.extractFeatures(
        bmps.repartition(3), "doc_id", "media", new Multimodal.BmpDecoder)
      .collect()
    assert(feats.length === 12)
    feats.foreach { r =>
      assert(r.getInt(1) === 7 && r.getInt(2) === 5,
        s"decoded dims ${r.getInt(1)}x${r.getInt(2)} != written 7x5")
      assert(r.getString(3) === "bmp")
    }
    // corrupt payload (not a BMP) must fail loudly, not yield features
    val bad = Multimodal.withSyntheticMedia((0L until 2L).toDF("doc_id"), "doc_id")
    val e = intercept[Exception] {
      Multimodal.extractFeatures(bad, "doc_id", "media",
        new Multimodal.BmpDecoder).collect()
    }
    assert(e.getMessage != null)
  }

  test("WavDecoder REALLY decodes: PCM geometry recovered, non-WAV fails") {
    import spark.implicits._
    val wavs = Multimodal.withSyntheticWav(
      (0L until 10L).toDF("doc_id"), "doc_id", sampleRate = 16000, nSamples = 320)
    val feats = Multimodal.extractAudioFeatures(
        wavs.repartition(3), "doc_id", "media", new Multimodal.WavDecoder)
      .collect()
    assert(feats.length === 10)
    feats.foreach { r =>
      assert(r.getInt(1) === 16000, s"sample rate ${r.getInt(1)}")
      assert(r.getInt(2) === 1 && r.getInt(3) === 16, "mono 16-bit")
      assert(r.getLong(4) === 320L, s"n_samples ${r.getLong(4)}")
      assert(r.getLong(5) === 320L * 1000 / 16000, "duration from geometry")
    }
    // determinism: same id => same checksum across runs/partitionings
    val again = Multimodal.extractAudioFeatures(
        wavs.repartition(7), "doc_id", "media", new Multimodal.WavDecoder)
      .collect().map(r => r.getLong(0) -> r.getLong(6)).toMap
    val first = feats.map(r => r.getLong(0) -> r.getLong(6)).toMap
    assert(first === again)
    // a non-WAV payload must fail loudly
    val bad = Multimodal.withSyntheticMedia((0L until 2L).toDF("doc_id"), "doc_id")
    val e = intercept[Exception] {
      Multimodal.extractAudioFeatures(bad, "doc_id", "media",
        new Multimodal.WavDecoder).collect()
    }
    assert(e.getMessage != null)
    // a TRUNCATED fmt chunk must fail with the decoder's own message,
    // not fabricate geometry from following bytes (review finding): a
    // 4-byte fmt chunk whose payload starts 0x01 0x00 would otherwise
    // pass the PCM check and read sampleRate out of the 'data' tag
    val dec = new Multimodal.WavDecoder
    val riff = "RIFF".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0, 1, 0, 1, 0) ++
      "data".getBytes("US-ASCII") ++ Array[Byte](12, 0, 0, 0) ++
      Array.fill[Byte](12)(7) // pad past the 44-byte floor
    val e2 = intercept[IllegalArgumentException] {
      dec.decode("mem://trunc.wav", riff, Map.empty)
    }
    assert(e2.getMessage.contains("fmt chunk truncated"), e2.getMessage)
  }

  test("PNG decode: full pixel round-trip through every filter type") {
    // encode with each of the five PNG filters, decode, and require the
    // EXACT original pixels back — this exercises inflate plus all five
    // unfilter branches, not just the header walk
    for (filter <- 0 to 4) {
      val bytes = Multimodal.encodePng(7L, w = 5, h = 4, filter = filter)
      val (w, h, pix) = Multimodal.PngDecoder.decodePixels(s"mem://f$filter.png", bytes)
      assert(w === 5 && h === 4)
      assert(pix.toSeq === Multimodal.syntheticPixels(7L, 5, 4).toSeq,
        s"filter $filter pixels did not round-trip")
    }
  }

  test("PNG features flow through the shared extract plumbing") {
    import spark.implicits._
    val df = Multimodal.withSyntheticPng(
      (1L to 6L).toDF("doc_id"), "doc_id", w = 7, h = 3, filter = 4)
    val feats = Multimodal.extractFeatures(df, "doc_id", "media",
      new Multimodal.PngDecoder)
    val rows = feats.collect()
    assert(rows.length === 6)
    assert(rows.forall(r => r.getInt(1) === 7 && r.getInt(2) === 3
      && r.getString(3) === "png"))
  }

  test("PNG decoder fails loudly on corrupt payloads") {
    val dec = new Multimodal.PngDecoder
    val good = Multimodal.encodePng(1L, 4, 4, 0)
    // not a PNG at all
    val e1 = intercept[IllegalArgumentException] {
      dec.decode("mem://x.png", Array[Byte](1, 2, 3), Map.empty)
    }
    assert(e1.getMessage.contains("not a PNG payload"))
    // truncated IDAT: drop the tail (inflate cannot fill the geometry)
    val e2 = intercept[IllegalArgumentException] {
      dec.decode("mem://t.png", good.take(good.length - 20), Map.empty)
    }
    assert(e2.getMessage.contains("truncated") || e2.getMessage.contains("overruns"),
      e2.getMessage)
    // interlaced flag set: rejected, not silently mis-decoded
    val interlaced = good.clone()
    interlaced(8 + 8 + 12) = 1 // IHDR interlace byte
    val e3 = intercept[IllegalArgumentException] {
      dec.decode("mem://i.png", interlaced, Map.empty)
    }
    assert(e3.getMessage.contains("interlaced"), e3.getMessage)
  }

  test("resizePng: real decode -> nearest-neighbor -> re-encode, output is itself decodable") {
    import spark.implicits._
    val df = Multimodal.withSyntheticPng(
      Seq(9L).toDF("doc_id"), "doc_id", w = 8, h = 8, filter = 2)
    val resized = Multimodal.resizePng(df, "media", 4, 4)
    val r = resized.selectExpr("media.uri", "media.bytes", "media.meta['resized']").head()
    assert(r.getString(2) === "4x4")
    val (w, h, pix) = Multimodal.PngDecoder.decodePixels(r.getString(0),
      r.getAs[Array[Byte]](1))
    assert(w === 4 && h === 4)
    // nearest-neighbor at exactly half scale samples every second pixel
    val orig = Multimodal.syntheticPixels(9L, 8, 8)
    for (y <- 0 until 4; x <- 0 until 4; c <- 0 until 3) {
      assert(pix((y * 4 + x) * 3 + c) === orig(((y * 2) * 8 + x * 2) * 3 + c),
        s"pixel ($x,$y) channel $c not the nearest-neighbor sample")
    }
    // composes: resizing the resized payload decodes again
    val again = Multimodal.resizePng(resized, "media", 2, 2)
      .selectExpr("media.uri", "media.bytes").head()
    val (w2, h2, _) = Multimodal.PngDecoder.decodePixels(again.getString(0),
      again.getAs[Array[Byte]](1))
    assert(w2 === 2 && h2 === 2)
  }

  test("extractPngStats: exact per-channel means from decoded pixels") {
    import spark.implicits._
    val df = Multimodal.withSyntheticPng(
      (1L to 3L).toDF("doc_id"), "doc_id", w = 6, h = 5, filter = 3)
    val stats = Multimodal.extractPngStats(df, "doc_id", "media").collect()
    assert(stats.length === 3)
    stats.foreach { r =>
      assert(r.getInt(1) === 6 && r.getInt(2) === 5 && r.getInt(3) === 3)
      val means = r.getSeq[Double](4)
      val pix = Multimodal.syntheticPixels(r.getLong(0), 6, 5)
      for (c <- 0 until 3) {
        val want = (c until pix.length by 3).map(i => (pix(i) & 0xFF).toLong).sum / 30.0
        assert(math.abs(means(c) - want) < 1e-12, s"channel $c mean")
      }
    }
  }

  test("extractPngText: tEXt key/values harvested without pixel decode") {
    import spark.implicits._
    // splice real tEXt chunks (length + type + keyword\0text + CRC32)
    // before IEND of an encoder-built PNG
    def textChunk(k: String, v: String): Array[Byte] = {
      val body = k.getBytes("ISO-8859-1") ++ Array(0.toByte) ++
        v.getBytes("ISO-8859-1")
      val typ = "tEXt".getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(typ); crc.update(body)
      val len = body.length
      Array((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte,
        len.toByte) ++ typ ++ body ++ {
        val c = crc.getValue
        Array((c >>> 24).toByte, (c >>> 16).toByte, (c >>> 8).toByte,
          c.toByte)
      }
    }
    val plain = Multimodal.encodePng(1L, 4, 4, 0)
    val iendAt = plain.length - 12 // IEND is the final 12-byte chunk
    val tagged = plain.take(iendAt) ++ textChunk("Author", "ada") ++
      textChunk("Comment", "hello png") ++ plain.drop(iendAt)
    // direct walk
    assert(Multimodal.PngDecoder.textChunks("t", tagged)
      === Seq("Author" -> "ada", "Comment" -> "hello png"))
    assert(Multimodal.PngDecoder.textChunks("t", plain) === Nil)
    // pixels still decode with the spliced chunks in place
    val (w, h, _) = Multimodal.PngDecoder.decodePixels("t", tagged)
    assert(w === 4 && h === 4)
    // frame-level: one row per tag, untagged rows emit nothing
    val df = Seq((1L, tagged), (2L, plain)).toDF("doc_id", "bytes")
      .select(col("doc_id"), struct(
        concat(lit("mem://"), col("doc_id")).as("uri"),
        col("bytes").as("bytes"),
        map().cast("map<string,string>").as("meta")).as("media"))
    val rows = Multimodal.extractPngText(df, "doc_id", "media")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    assert(rows === Set((1L, "Author", "ada"), (1L, "Comment", "hello png")))
    // corrupt: keyword without NUL fails loudly
    val badBody = "NoNulHere".getBytes("ISO-8859-1")
    val bad = plain.take(iendAt) ++ {
      val typ = "tEXt".getBytes("US-ASCII")
      val len = badBody.length
      Array((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte,
        len.toByte) ++ typ ++ badBody ++ Array.fill(4)(0.toByte)
    } ++ plain.drop(iendAt)
    intercept[IllegalArgumentException](
      Multimodal.PngDecoder.textChunks("t", bad))
    intercept[IllegalArgumentException](
      Multimodal.PngDecoder.textChunks("t", Array[Byte](1, 2, 3)))
  }

  test("image dHash near-dup: brightness-shifted re-encodes pair up, distinct images don't") {
    import spark.implicits._
    // image 1: synthetic pixels; image 2: SAME pixels +8 brightness per
    // channel (every adjacent-gray comparison unchanged => dHash
    // IDENTICAL although every byte of the payload differs); image 3:
    // different pixels entirely
    val base = Multimodal.syntheticPixels(1L, 16, 16)
      .map(b => ((b & 0xFF) % 200).toByte) // headroom: +8 can't clamp/wrap
    val shifted = base.map(b => ((b & 0xFF) + 8).toByte)
    val other = Multimodal.syntheticPixels(99L, 16, 16)
    val rows = Seq(
      (1L, Multimodal.encodePngPixels(16, 16, base, 0)),
      (2L, Multimodal.encodePngPixels(16, 16, shifted, 4)), // different filter too
      (3L, Multimodal.encodePngPixels(16, 16, other, 0)))
    val df = rows.toDF("doc_id", "bytes").select(col("doc_id"), struct(
      concat(lit("mem://img/"), col("doc_id"), lit(".png")).as("uri"),
      col("bytes"),
      map(lit("format"), lit("png")).as("meta")).as("media"))
    val pairs = Multimodal.imageNearDup(df, "doc_id", "media", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)),
      s"only the brightness-shifted pair is a near-dup, got ${pairs.toSeq}")
    assert(pairs.head._3 === 0L,
      "a uniform brightness shift leaves every dHash comparison unchanged")
  }

  test("extractWavFrameRms: exact per-frame energy from the real PCM samples") {
    import spark.implicits._
    val df = Multimodal.withSyntheticWav(Seq(5L).toDF("doc_id"), "doc_id",
      sampleRate = 8000, nSamples = 100)
    val frames = Multimodal.extractWavFrameRms(df, "doc_id", "media",
      samplesPerFrame = 40).collect().sortBy(_.getLong(1))
    assert(frames.length === 3, "100 samples at 40/frame => 2 full + 1 short")
    assert(frames.map(_.getLong(2)).toSeq === Seq(40L, 40L, 20L))
    // exact expectation from the generator's sample formula
    val samples = (0 until 100).map(i => (5L * 131 + i * 7).toShort.toDouble)
    for ((f, idx) <- frames.zipWithIndex) {
      val slice = samples.slice(idx * 40, idx * 40 + 40)
      val want = math.sqrt(slice.map(s => s * s).sum / slice.length)
      assert(math.abs(f.getDouble(3) - want) < 1e-9, s"frame $idx rms")
    }
  }

  test("resize shrinks the payload, stamps meta, keeps the struct shape") {
    val resized = Multimodal.resize(mediaDf, "media", 224, 224)
    assert(resized.schema("media").dataType === mediaDf.schema("media").dataType)
    val r = resized.selectExpr("media.bytes", "media.meta['resized']").head()
    assert(r.getAs[Array[Byte]](0).length === 8, "32-byte payload quarters")
    assert(r.getString(1) === "224x224")
    val plan = resized.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "per-row transform must not shuffle")
  }

  test("sampleFrames fans out n frame rows per video, no shuffle") {
    val frames = Multimodal.sampleFrames(mediaDf, "doc_id", "media",
      nFrames = 5, stride = 10)
    assert(frames.count() === 20 * 5)
    val byDoc = frames.groupBy("id").count().collect()
    assert(byDoc.forall(_.getLong(1) === 5L))
    val offsets = frames.filter(frames("id") === 3L)
      .select("frame_no").collect().map(_.getInt(0)).sorted
    assert(offsets.toSeq === Seq(0, 10, 20, 30, 40))
    // plan has no exchange: pure per-row fan-out
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"frame sampling must not shuffle:\n$plan")
  }
}
