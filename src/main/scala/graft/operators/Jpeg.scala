package graft.operators

/** Pure-JVM BASELINE JPEG decoder (ITU-T T.81 sequential DCT, Huffman
  * entropy coding) — closes the one image-format gap the container's
  * lack of codec libraries left open: JFIF/EXIF baseline JPEG is what
  * real image corpora overwhelmingly carry, and decoding it needs no
  * library beyond byte arithmetic, a canonical Huffman walk, and an
  * 8×8 inverse DCT, all stock JVM.
  *
  * Supported: 8-bit precision, 1-component (grayscale) and
  * 3-component (YCbCr) sequential baseline streams, any sampling
  * factors up to 4 (4:4:4, 4:2:2, 4:2:0, …), restart intervals
  * (DRI/RSTn), stuffed bytes, single interleaved scan. Deliberately
  * rejected with loud errors: progressive (SOF2) and every other
  * SOFn, arithmetic coding (DAC), 12-bit precision, multi-scan
  * streams, truncated entropy data — a media pipeline must surface
  * exotic or corrupt inputs, not fabricate features for them
  * (the [[Multimodal.BmpDecoder]] contract).
  *
  * Determinism: the IDCT is the reference separable float transform
  * over a fixed cosine table — same doubles on every JVM, so decoded
  * pixels (and everything derived: dHash signatures, channel means)
  * are bit-stable across executors. Chroma upsampling is nearest/
  * replication (the cheap standard policy; swap the kernel in
  * `upsample` for triangle filtering inside the same shape).
  *
  * Scale shape: decode runs per row inside `mapPartitions` /
  * codegen'd UDFs ([[Multimodal.extractFeatures]] lifecycle); one
  * decoder instance per partition, no state shared across rows, bytes
  * never leave the row.
  */
object JpegDecoder {

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // cos((2x+1)·u·π/16) · (u == 0 ? 1/√2 : 1) — the 1-D basis with the
  // DC normalization folded in; the separable 2-D IDCT applies it to
  // rows then columns with a final ÷4.
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    // canonical code tables: for each length l (1-based), the first
    // code value, one past the last, and the symbol-array offset
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // exclusive
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        maxCode(l) = code
        k += counts(l - 1)
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = 0
      var l = 0
      while (l < 16) {
        code = (code << 1) | br.bit()
        l += 1
        if (code < maxCode(l)) return symbols(valPtr(l) + code - minCode(l))
      }
      throw new IllegalArgumentException(
        "JPEG entropy stream: no Huffman code matched in 16 bits (corrupt data)")
    }
  }

  /** Entropy-segment bit reader: unstuffs FF00; a REAL marker reached
    * while a block still wants bits is a truncated/corrupt scan and
    * throws loudly (on a valid stream, blocks exhaust their bits
    * inside the data bytes and the MCU loop consumes RSTn via
    * [[restart]] before asking for more).
    */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0

    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= bytes.length)
          throw new IllegalArgumentException(
            "JPEG entropy stream truncated (ran off the payload)")
        val b = bytes(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          val b2 = if (pos < bytes.length) bytes(pos) & 0xFF else -1
          if (b2 == 0x00) pos += 1 // stuffed byte: data FF
          else throw new IllegalArgumentException(
            f"JPEG entropy stream ran into marker FF$b2%02X mid-block " +
              "(truncated scan)")
        }
        acc = b
        nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** Drop partial-byte padding bits and consume an expected RSTn
      * marker (tolerating T.81 optional FF fill bytes before it). */
    def restart(expected: Int): Unit = {
      nBits = 0
      if (pos + 1 >= bytes.length || (bytes(pos) & 0xFF) != 0xFF)
        throw new IllegalArgumentException(
          "JPEG: expected restart marker, found entropy data")
      while (pos + 1 < bytes.length && (bytes(pos + 1) & 0xFF) == 0xFF)
        pos += 1 // fill bytes
      val m = bytes(pos + 1) & 0xFF
      pos += 2
      if (m != 0xD0 + expected)
        throw new IllegalArgumentException(
          f"JPEG: expected RST$expected%d, found FF$m%02X (corrupt restart sequence)")
    }
  }

  private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  private final case class Component(id: Int, hS: Int, vS: Int, tq: Int) {
    var dcTable: Huff = null
    var acTable: Huff = null
    var plane: Array[Byte] = null // planeW × planeH samples
    var planeW: Int = 0
    var planeH: Int = 0
    var pred: Int = 0
  }

  /** Decode a baseline JPEG payload to (width, height, pixels):
    * 3 bytes/pixel RGB row-major for YCbCr streams, 1 byte/pixel for
    * grayscale — the [[Multimodal.PngDecoder.decodePixels]] contract,
    * so dHash/stats/resize consume either format identically.
    */
  def decodePixels(uri: String, bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length >= 4 && (bytes(0) & 0xFF) == 0xFF
      && (bytes(1) & 0xFF) == 0xD8,
      s"not a JPEG payload (no SOI): $uri (${bytes.length} bytes)")

    def u16(off: Int): Int =
      ((bytes(off) & 0xFF) << 8) | (bytes(off + 1) & 0xFF)

    val qt = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var pos = 2

    var scanStart = -1
    var scanComps: Array[Component] = null
    while (scanStart < 0) {
      require(pos + 4 <= bytes.length, s"JPEG $uri truncated before SOS")
      require((bytes(pos) & 0xFF) == 0xFF,
        f"JPEG $uri: expected marker at $pos, got ${bytes(pos) & 0xFF}%02X")
      val marker = bytes(pos + 1) & 0xFF
      pos += 2
      marker match {
        case 0xD8 => // stray SOI: ignore
        case 0xC0 | 0xC1 => // baseline (and extended-sequential Huffman)
          val len = u16(pos)
          val precision = bytes(pos + 2) & 0xFF
          require(precision == 8,
            s"JPEG $uri: $precision-bit precision not supported (8 only)")
          height = u16(pos + 3)
          width = u16(pos + 5)
          require(width > 0 && height > 0, s"JPEG $uri: zero dimensions")
          val n = bytes(pos + 7) & 0xFF
          require(n == 1 || n == 3,
            s"JPEG $uri: $n components not supported (grayscale or YCbCr)")
          comps = Array.tabulate(n) { i =>
            val o = pos + 8 + 3 * i
            val hv = bytes(o + 1) & 0xFF
            val c = Component(bytes(o) & 0xFF, hv >> 4, hv & 0xF,
              bytes(o + 2) & 0xFF)
            require(c.hS >= 1 && c.hS <= 4 && c.vS >= 1 && c.vS <= 4,
              s"JPEG $uri: sampling ${c.hS}x${c.vS} out of range")
            c
          }
          pos += len
        case 0xC2 =>
          throw new IllegalArgumentException(
            s"JPEG $uri is PROGRESSIVE (SOF2): only baseline sequential is decoded")
        case m if m >= 0xC3 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC =>
          throw new IllegalArgumentException(
            f"JPEG $uri: SOF FF$m%02X (lossless/hierarchical/arithmetic) not supported")
        case 0xCC =>
          throw new IllegalArgumentException(
            s"JPEG $uri uses arithmetic coding (DAC): not supported")
        case 0xC4 => // DHT
          val len = u16(pos)
          var o = pos + 2
          while (o < pos + len) {
            val tcth = bytes(o) & 0xFF
            val counts = Array.tabulate(16)(i => bytes(o + 1 + i) & 0xFF)
            val total = counts.sum
            require(o + 17 + total <= pos + len,
              s"JPEG $uri: DHT table overruns its segment")
            val syms = Array.tabulate(total)(i => bytes(o + 17 + i) & 0xFF)
            val h = new Huff(counts, syms)
            if ((tcth >> 4) == 0) dcTabs(tcth & 0xF) = h
            else acTabs(tcth & 0xF) = h
            o += 17 + total
          }
          pos += len
        case 0xDB => // DQT
          val len = u16(pos)
          var o = pos + 2
          while (o < pos + len) {
            val pqtq = bytes(o) & 0xFF
            val pq = pqtq >> 4
            require(pq <= 1, s"JPEG $uri: DQT precision $pq invalid")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) {
              t(i) = if (pq == 0) bytes(o + 1 + i) & 0xFF
                     else u16(o + 1 + 2 * i)
              i += 1
            }
            qt(pqtq & 0xF) = t
            o += 1 + (if (pq == 0) 64 else 128)
          }
          pos += len
        case 0xDD => // DRI
          restartInterval = u16(pos + 2)
          pos += u16(pos)
        case 0xDA => // SOS
          val len = u16(pos)
          require(comps != null, s"JPEG $uri: SOS before SOF")
          val ns = bytes(pos + 2) & 0xFF
          require(ns == comps.length,
            s"JPEG $uri: multi-scan streams not supported " +
              s"(scan has $ns of ${comps.length} components)")
          scanComps = Array.tabulate(ns) { i =>
            val cs = bytes(pos + 3 + 2 * i) & 0xFF
            val tdta = bytes(pos + 4 + 2 * i) & 0xFF
            val c = comps.find(_.id == cs).getOrElse(
              throw new IllegalArgumentException(
                s"JPEG $uri: scan names unknown component $cs"))
            c.dcTable = dcTabs(tdta >> 4)
            c.acTable = acTabs(tdta & 0xF)
            require(c.dcTable != null && c.acTable != null,
              s"JPEG $uri: scan uses undefined Huffman table")
            require(qt(c.tq) != null,
              s"JPEG $uri: component uses undefined quant table ${c.tq}")
            c
          }
          scanStart = pos + len
        case 0xD9 =>
          throw new IllegalArgumentException(s"JPEG $uri: EOI before any scan")
        case _ => // APPn, COM, anything else with a length: skip
          pos += u16(pos)
      }
    }

    val hMax = comps.map(_.hS).max
    val vMax = comps.map(_.vS).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { c =>
      c.planeW = mcusX * 8 * c.hS
      c.planeH = mcusY * 8 * c.vS
      c.plane = new Array[Byte](c.planeW * c.planeH)
    }

    val br = new BitReader(bytes, scanStart)
    val coefs = new Array[Int](64)
    val tmp = new Array[Double](64)

    def decodeBlock(c: Component, bx: Int, by: Int): Unit = {
      java.util.Arrays.fill(coefs, 0)
      val q = qt(c.tq)
      val t = c.dcTable.decode(br)
      c.pred += extend(br.receive(t), t)
      coefs(0) = c.pred * q(0)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = c.acTable.decode(br)
        val r = rs >> 4
        val s = rs & 0xF
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else eob = true
        } else {
          k += r
          require(k < 64, s"JPEG $uri: AC coefficient index $k out of range")
          coefs(ZigZag(k)) = extend(br.receive(s), s) * q(k)
          k += 1
        }
      }
      // separable IDCT: columns then rows over the cosine table
      var x = 0
      while (x < 8) {
        var y = 0
        while (y < 8) {
          var sum = 0.0
          var u = 0
          while (u < 8) { sum += Cos(y)(u) * coefs(u * 8 + x); u += 1 }
          tmp(y * 8 + x) = sum
          y += 1
        }
        x += 1
      }
      var y2 = 0
      while (y2 < 8) {
        var x2 = 0
        while (x2 < 8) {
          var sum = 0.0
          var u = 0
          while (u < 8) { sum += Cos(x2)(u) * tmp(y2 * 8 + u); u += 1 }
          val v = math.round(sum / 4.0 + 128.0).toInt
          val px = bx + x2
          val py = by + y2
          if (px < c.planeW && py < c.planeH)
            c.plane(py * c.planeW + px) =
              (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          x2 += 1
        }
        y2 += 1
      }
    }

    var mcu = 0
    val nMcus = mcusX * mcusY
    var rstIdx = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart(rstIdx)
        rstIdx = (rstIdx + 1) % 8
        scanComps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      scanComps.foreach { c =>
        var v = 0
        while (v < c.vS) {
          var h = 0
          while (h < c.hS) {
            decodeBlock(c, (mx * c.hS + h) * 8, (my * c.vS + v) * 8)
            h += 1
          }
          v += 1
        }
      }
      mcu += 1
    }

    // sample the (possibly subsampled) planes at full resolution
    def planeAt(c: Component, x: Int, y: Int): Int = {
      val px = x * c.hS / hMax
      val py = y * c.vS / vMax
      c.plane(py * c.planeW + px) & 0xFF
    }

    if (comps.length == 1) {
      val out = new Array[Byte](width * height)
      val c = comps(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          out(y * width + x) = planeAt(c, x, y).toByte
          x += 1
        }
        y += 1
      }
      (width, height, out)
    } else {
      val out = new Array[Byte](width * height * 3)
      val (cy, cb, cr) = (comps(0), comps(1), comps(2))
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = planeAt(cy, x, y).toDouble
          val b = planeAt(cb, x, y) - 128.0
          val r = planeAt(cr, x, y) - 128.0
          def clamp(v: Double): Byte = {
            val i = math.round(v).toInt
            (if (i < 0) 0 else if (i > 255) 255 else i).toByte
          }
          val o = (y * width + x) * 3
          out(o) = clamp(yy + 1.402 * r)
          out(o + 1) = clamp(yy - 0.344136 * b - 0.714136 * r)
          out(o + 2) = clamp(yy + 1.772 * b)
          x += 1
        }
        y += 1
      }
      (width, height, out)
    }
  }
}

/** [[Multimodal.MediaDecoder]] over [[JpegDecoder.decodePixels]]: the
  * jpeg slot of the media pipeline, geometry from the REAL pixel
  * decode (a header-only parse would accept streams whose entropy
  * data is garbage).
  */
class JpegDecoder extends Multimodal.MediaDecoder {
  override def decode(uri: String, bytes: Array[Byte],
      meta: Map[String, String]): Multimodal.MediaFeatures = {
    val (w, h, _) = JpegDecoder.decodePixels(uri, bytes)
    Multimodal.MediaFeatures(width = w, height = h, format = "jpeg",
      n_bytes = bytes.length.toLong,
      checksum = Multimodal.byteChecksum(bytes))
  }
}
