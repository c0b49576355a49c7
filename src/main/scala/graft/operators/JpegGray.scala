package graft.operators

/** Baseline JPEG (ITU-T T.81) codec for single-component 8-bit grayscale
  * — a REAL DCT codec with no external library: forward/inverse 8×8 DCT,
  * Annex K.1 luminance quantization, Annex K.3 canonical Huffman tables,
  * zigzag run-length entropy coding, 0xFF byte stuffing, and a marker
  * parser that skips ancillary segments and handles restart markers.
  *
  * The decoder is a compliant baseline-sequential gray8 reader for any
  * encoder's output within that subset (single scan, one component,
  * 8-bit, Huffman); progressive (SOF2) and multi-component streams are
  * rejected loudly. The encoder emits the simplest valid stream: one
  * DQT, SOF0, two DHTs, one SOS, no restarts.
  *
  * Lossy by design — EXCEPT for images made of constant 8×8 tiles whose
  * value has an even offset from 128: such blocks quantize to a DC-only
  * spectrum with zero rounding error (DC = 8·(v−128), quantizer 16), so
  * the round-trip is bit-exact. The m6 catalog query pins that path to
  * a DuckDB oracle; the lossy AC path is spec-bound by PSNR.
  */
object JpegGray {

  /** Annex K.1 luminance quantization table, natural (row-major) order. */
  private val QTable: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Zigzag position → natural-order index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.3.1: luminance DC code lengths + symbols. */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).map(_.toByte).toArray

  /** Annex K.3.2: luminance AC code lengths + symbols. */
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA).map(_.toByte)

  /** cosT(x)(u) = cos((2x+1)·u·π / 16), shared by FDCT and IDCT. */
  private val CosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val C: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2) else 1.0)

  // ------------------------------------------------------------ encode --

  /** Canonical Huffman assignment: symbol → (code, length). */
  private def buildCodes(bits: Array[Int], vals: Array[Byte]): Array[(Int, Int)] = {
    val codes = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        codes(vals(k) & 0xFF) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    codes
  }

  private class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) { // pad with 1s per T.81
      acc = (acc << (8 - n)) | ((1 << (8 - n)) - 1)
      out.write(acc)
      if (acc == 0xFF) out.write(0x00)
      acc = 0; n = 0
    }
  }

  @inline private def category(v: Int): Int = {
    var a = math.abs(v); var t = 0
    while (a != 0) { a >>= 1; t += 1 }
    t
  }

  /** Encode an 8-bit grayscale plane as baseline JPEG. Edge blocks pad
    * by edge replication (no ringing into the image). */
  def encode(w: Int, h: Int, luma: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xFFFF && h <= 0xFFFF &&
      luma.length == w * h, s"bad plane ${luma.length} for $w x $h")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xFF)
      body.foreach(b => out.write(b & 0xFF))
    }
    marker(0xD8) // SOI
    seg(0xDB, 0 +: Zigzag.map(QTable(_))) // DQT table 0, zigzag order
    seg(0xC0, Array(8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, 1, 1, 0x11, 0))
    seg(0xC4, 0x00 +: (DcBits ++ DcVals.map(_.toInt)))
    seg(0xC4, 0x10 +: (AcBits ++ AcVals.map(_.toInt)))
    seg(0xDA, Array(1, 1, 0x00, 0, 63, 0))

    val dcCodes = buildCodes(DcBits, DcVals)
    val acCodes = buildCodes(AcBits, AcVals)
    val bw = new BitWriter(out)
    val coef = new Array[Int](64)
    val block = new Array[Double](64)
    var pred = 0
    var by = 0
    while (by < h) {
      var bx = 0
      while (bx < w) {
        // level-shifted samples with edge replication
        var y = 0
        while (y < 8) {
          val sy = math.min(by + y, h - 1)
          var x = 0
          while (x < 8) {
            val sx = math.min(bx + x, w - 1)
            block(y * 8 + x) = (luma(sy * w + sx) & 0xFF) - 128.0
            x += 1
          }
          y += 1
        }
        // FDCT + quantize, natural order
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            var acc = 0.0
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                acc += block(yy * 8 + xx) * CosT(xx)(v) * CosT(yy)(u)
                xx += 1
              }
              yy += 1
            }
            val f = 0.25 * C(u) * C(v) * acc
            coef(u * 8 + v) = math.round(f / QTable(u * 8 + v)).toInt
            v += 1
          }
          u += 1
        }
        // DC difference
        val dc = coef(0)
        val diff = dc - pred
        pred = dc
        val t = category(diff)
        val (dcode, dlen) = dcCodes(t)
        bw.put(dcode, dlen)
        if (t > 0) bw.put(if (diff >= 0) diff else diff + (1 << t) - 1, t)
        // AC run-length over zigzag positions 1..63
        var run = 0
        var k = 1
        while (k < 64) {
          val ac = coef(Zigzag(k))
          if (ac == 0) run += 1
          else {
            while (run >= 16) {
              val (zc, zl) = acCodes(0xF0); bw.put(zc, zl); run -= 16
            }
            val s = category(ac)
            val (c2, l2) = acCodes((run << 4) | s)
            bw.put(c2, l2)
            bw.put(if (ac >= 0) ac else ac + (1 << s) - 1, s)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (ec, el) = acCodes(0x00); bw.put(ec, el) } // EOB
        bx += 8
      }
      by += 8
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------------ decode --

  /** T.81 F.2.2.3 decode tables: mincode/maxcode/valptr per length. */
  private class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    val huffVal: Array[Byte] = vals
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  private class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    var sawEoi = false
    /** Drop partial pad bits at a restart boundary; the following fetch
      * consumes the RSTn marker itself. */
    def align(): Unit = n = 0
    /** Next scan bit, transparently unstuffing 0xFF00, consuming RSTn,
      * and zero-padding past EOI. */
    def nextBit(): Int = {
      if (n == 0) {
        require(pos < data.length, "truncated entropy stream")
        var b = data(pos) & 0xFF; pos += 1
        if (b == 0xFF) {
          require(pos < data.length, "truncated marker in scan")
          val m = data(pos) & 0xFF; pos += 1
          if (m == 0x00) { /* stuffed 0xFF data byte */ }
          else if (m >= 0xD0 && m <= 0xD7) return nextBit() // RSTn consumed
          else if (m == 0xD9) { sawEoi = true; b = 0 } // EOI: pad bits
          else throw new IllegalArgumentException(
            f"unexpected marker 0xFF$m%02X inside scan")
        }
        acc = b; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def receive(len: Int): Int = {
      var v = 0; var i = 0
      while (i < len) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    def decode(t: HuffTable): Int = {
      var code = nextBit()
      var l = 1
      while (code > t.maxCode(l)) {
        require(l < 16, "corrupt Huffman code")
        code = (code << 1) | nextBit()
        l += 1
      }
      t.huffVal(t.valPtr(l) + code - t.minCode(l)) & 0xFF
    }
  }

  @inline private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Decode a baseline gray8 JPEG from any conforming encoder.
    * Returns (w, h, top-down row-major luma). */
  def decode(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(payload.length > 4 && (payload(0) & 0xFF) == 0xFF &&
      (payload(1) & 0xFF) == 0xD8, "not a JPEG payload")
    var pos = 2
    var w = -1; var h = -1
    var qt: Array[Int] = null // natural order
    var dcT: HuffTable = null
    var acT: HuffTable = null
    var restartInterval = 0
    var scanStart = -1
    def u16(p: Int): Int = ((payload(p) & 0xFF) << 8) | (payload(p + 1) & 0xFF)
    while (scanStart < 0) {
      require(pos + 4 <= payload.length, "truncated JPEG header")
      require((payload(pos) & 0xFF) == 0xFF, "marker expected")
      val m = payload(pos + 1) & 0xFF
      val len = u16(pos + 2)
      val body = pos + 4
      m match {
        case 0xDB =>
          var p = body
          while (p < pos + 2 + len) {
            val pq = (payload(p) & 0xFF) >> 4
            val tq = payload(p) & 0x0F
            require(pq == 0, "16-bit quant tables not supported")
            if (tq == 0) {
              qt = new Array[Int](64)
              var i = 0
              while (i < 64) { qt(Zigzag(i)) = payload(p + 1 + i) & 0xFF; i += 1 }
            }
            p += 65
          }
        case 0xC0 | 0xC1 => // baseline / extended sequential
          require((payload(body) & 0xFF) == 8, "not 8-bit precision")
          h = u16(body + 1); w = u16(body + 3)
          require((payload(body + 5) & 0xFF) == 1,
            "multi-component JPEG not supported (gray8 subset)")
        case 0xC2 =>
          throw new IllegalArgumentException("progressive JPEG not supported")
        case 0xC4 =>
          var p = body
          while (p < pos + 2 + len) {
            val tc = (payload(p) & 0xFF) >> 4
            val th = payload(p) & 0x0F
            val bits = Array.tabulate(16)(i => payload(p + 1 + i) & 0xFF)
            val nv = bits.sum
            val vals = java.util.Arrays.copyOfRange(payload, p + 17, p + 17 + nv)
            if (th == 0) {
              if (tc == 0) dcT = new HuffTable(bits, vals)
              else acT = new HuffTable(bits, vals)
            }
            p += 17 + nv
          }
        case 0xDD => restartInterval = u16(body)
        case 0xDA => scanStart = body + (payload(body) & 0xFF) * 2 + 4
        case _ => // APPn / COM / other ancillary: skip
      }
      if (scanStart < 0) pos += 2 + len
    }
    require(w > 0 && h > 0, "missing SOF")
    require(qt != null && dcT != null && acT != null, "missing DQT/DHT")

    val luma = new Array[Byte](w * h)
    val br = new BitReader(payload, scanStart)
    val coef = new Array[Int](64)
    var pred = 0
    var mcu = 0
    var by = 0
    while (by < h) {
      var bx = 0
      while (bx < w) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.align() // pad bits die at the boundary; fetch eats the RSTn
          pred = 0
        }
        java.util.Arrays.fill(coef, 0)
        val t = br.decode(dcT)
        pred += extend(br.receive(t), t)
        coef(0) = pred * qt(0)
        var k = 1
        var done = false
        while (k < 64 && !done) {
          val rs = br.decode(acT)
          val r = rs >> 4
          val s = rs & 0x0F
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else done = true // EOB
          } else {
            k += r
            require(k < 64, "AC index overflow")
            coef(Zigzag(k)) = extend(br.receive(s), s) * qt(Zigzag(k))
            k += 1
          }
        }
        // IDCT + level shift + clamp, cropped to the image
        var y = 0
        while (y < 8 && by + y < h) {
          var x = 0
          while (x < 8 && bx + x < w) {
            var acc = 0.0
            var u = 0
            while (u < 8) {
              var v = 0
              while (v < 8) {
                val c = coef(u * 8 + v)
                if (c != 0) acc += C(u) * C(v) * c * CosT(x)(v) * CosT(y)(u)
                v += 1
              }
              u += 1
            }
            val px = math.round(acc / 4.0 + 128.0).toInt
            luma((by + y) * w + bx + x) =
              math.max(0, math.min(255, px)).toByte
            x += 1
          }
          y += 1
        }
        mcu += 1
        bx += 8
      }
      by += 8
    }
    (w, h, luma)
  }
}
