package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.apache.spark.sql.functions.{col, concat, lit, map, struct}

import graft.operators.{JpegDecoder, Multimodal}

/** The baseline-JPEG decoder cross-checked against the STOCK JDK's
  * independent codec (javax.imageio ships a libjpeg-derived reader/
  * writer in every JDK): fixtures are REAL JPEGs produced by the JDK
  * writer, and decoded pixels must agree with the JDK reader within
  * an IDCT-rounding tolerance — two spec-conformant IDCTs may differ
  * by ±1 per sample (IEEE 1180), and the JDK's fancy (triangle)
  * chroma upsampling vs our replication adds a few counts at chroma
  * gradients, so color images get a slightly wider band than gray.
  */
class JpegSpec extends SparkTestBase {

  private def encodeJpeg(img: BufferedImage, quality: Float,
      progressive: Boolean = false): Array[Byte] = {
    val w = ImageIO.getImageWritersByFormatName("jpg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    if (progressive) p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new IIOImage(img, null, null), p)
    ios.close()
    w.dispose()
    bos.toByteArray
  }

  private def jdkDecode(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  /** Max per-channel abs diff between our RGB decode and the JDK's. */
  private def maxDiffRgb(bytes: Array[Byte]): Int = {
    val (w, h, pix) = JpegDecoder.decodePixels("t.jpg", bytes)
    val ref = jdkDecode(bytes)
    assert(ref.getWidth == w && ref.getHeight == h)
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      worst = math.max(worst, math.abs(((rgb >> 16) & 0xFF) - (pix(o) & 0xFF)))
      worst = math.max(worst, math.abs(((rgb >> 8) & 0xFF) - (pix(o + 1) & 0xFF)))
      worst = math.max(worst, math.abs((rgb & 0xFF) - (pix(o + 2) & 0xFF)))
    }
    worst
  }

  test("solid-color RGB JPEG decodes to the flat color (vs JDK, ±2)") {
    val img = new BufferedImage(32, 24, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 32) img.setRGB(x, y, 0xC86432) // (200,100,50)
    val d = maxDiffRgb(encodeJpeg(img, 0.95f))
    assert(d <= 2, s"solid color max diff $d")
  }

  test("smooth gradient RGB, dims not multiples of 8/16 (vs JDK)") {
    val img = new BufferedImage(37, 23, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 23; x <- 0 until 37) {
      val r = 40 + x * 4
      val g = 30 + y * 6
      val b = 128
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val d = maxDiffRgb(encodeJpeg(img, 0.95f))
    assert(d <= 8, s"gradient max diff $d (chroma upsampling band)")
  }

  test("grayscale JPEG: single component, tight agreement (±2)") {
    val img = new BufferedImage(64, 48, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 48; x <- 0 until 64)
      img.getRaster.setSample(x, y, 0, (x * 3 + y * 2) % 256)
    val bytes = encodeJpeg(img, 0.9f)
    val (w, h, pix) = JpegDecoder.decodePixels("g.jpg", bytes)
    assert(w == 64 && h == 48 && pix.length == 64 * 48, "1 byte/pixel gray")
    // raster samples, not getRGB: getRGB on TYPE_BYTE_GRAY routes the
    // sample through a linear-gray→sRGB gamma conversion
    val ref = jdkDecode(bytes)
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val g = ref.getRaster.getSample(x, y, 0)
      worst = math.max(worst, math.abs(g - (pix(y * w + x) & 0xFF)))
    }
    assert(worst <= 2, s"gray max diff $worst")
  }

  test("progressive JPEG is rejected loudly, not mis-decoded") {
    val img = new BufferedImage(24, 24, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 24) img.setRGB(x, y, x * 10 << 16)
    val bytes = encodeJpeg(img, 0.8f, progressive = true)
    val e = intercept[IllegalArgumentException] {
      JpegDecoder.decodePixels("p.jpg", bytes)
    }
    assert(e.getMessage.contains("PROGRESSIVE"), e.getMessage)
  }

  test("truncated entropy stream fails loudly") {
    val img = new BufferedImage(48, 48, BufferedImage.TYPE_INT_RGB)
    val rng = new scala.util.Random(7)
    for (y <- 0 until 48; x <- 0 until 48) img.setRGB(x, y, rng.nextInt(1 << 24))
    val bytes = encodeJpeg(img, 0.9f)
    val cut = bytes.take(bytes.length * 2 / 3)
    intercept[IllegalArgumentException] {
      JpegDecoder.decodePixels("cut.jpg", cut)
    }
  }

  test("non-JPEG payload fails on the SOI check") {
    val e = intercept[IllegalArgumentException] {
      JpegDecoder.decodePixels("x.png", Array[Byte](0x89.toByte, 'P', 'N', 'G'))
    }
    assert(e.getMessage.contains("SOI"), e.getMessage)
  }

  test("JpegDecoder rides extractFeatures: real geometry, bytes dropped") {
    import spark.implicits._
    val payload = {
      val img = new BufferedImage(40, 30, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 30; x <- 0 until 40)
        img.setRGB(x, y, (x * 6 << 16) | (y * 8 << 8) | 77)
      encodeJpeg(img, 0.9f)
    }
    val df = Seq((1L, payload), (2L, payload)).toDF("doc_id", "b")
      .select(col("doc_id"), struct(
        concat(lit("mem://"), col("doc_id"), lit(".jpg")).as("uri"),
        col("b").as("bytes"),
        map(lit("format"), lit("jpeg")).as("meta")).as("media"))
    val out = Multimodal.extractFeatures(df, "doc_id", "media",
      new graft.operators.JpegDecoder)
    val r = out.orderBy("id").collect()
    assert(r.length == 2)
    assert(r(0).getInt(1) == 40 && r(0).getInt(2) == 30)
    assert(r(0).getString(3) == "jpeg")
    assert(!out.columns.contains("bytes"), "heavy payload must be dropped")
  }

  test("dHash is stable across PNG/JPEG re-encoding of the same image") {
    import spark.implicits._
    // the property byte-level hashing can never give: the SAME picture
    // saved as PNG and as JPEG lands within a small Hamming radius
    val w0 = 32
    val h0 = 32
    val pix = new Array[Byte](w0 * h0 * 3)
    for (y <- 0 until h0; x <- 0 until w0) {
      val o = (y * w0 + x) * 3
      pix(o) = (x * 8).toByte
      pix(o + 1) = (y * 8).toByte
      pix(o + 2) = ((x + y) * 4).toByte
    }
    val png = Multimodal.encodePngPixels(w0, h0, pix, 0)
    val img = new BufferedImage(w0, h0, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h0; x <- 0 until w0) {
      val o = (y * w0 + x) * 3
      img.setRGB(x, y, ((pix(o) & 0xFF) << 16) | ((pix(o + 1) & 0xFF) << 8)
        | (pix(o + 2) & 0xFF))
    }
    val jpg = encodeJpeg(img, 0.95f)
    val df = Seq((1L, png, "png"), (2L, jpg, "jpg")).toDF("doc_id", "b", "fmt")
      .select(col("doc_id"), struct(
        concat(lit("mem://"), col("doc_id"), lit("."), col("fmt")).as("uri"),
        col("b").as("bytes"),
        map(lit("format"), col("fmt")).as("meta")).as("media"))
    val sigs = Multimodal.imageDHash(df, "doc_id", "media")
      .orderBy("doc_id").collect().map(_.getLong(1))
    val hamming = java.lang.Long.bitCount(sigs(0) ^ sigs(1))
    assert(hamming <= 6, s"png-vs-jpeg dHash Hamming distance $hamming")
  }
}
