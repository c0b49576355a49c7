package graft.operators

import scala.collection.mutable.ArrayBuffer

/** REAL GIF87a grayscale codec — the third raster container in the
  * multimodal family (after BMP and PNG) and the engine's LZW
  * implementation: variable-width codes (9..12 bits for an 8-bit
  * palette), LSB-FIRST bit packing (GIF is little-endian at the bit
  * level, the opposite of the H.264/PNG byte order), clear/EOI
  * control codes, dictionary growth to 4096 entries with an emitted
  * CLEAR + reset when full, and the KwKwK corner case on decode. The
  * container carries a 256-entry gray global color table, so a pixel
  * byte IS its palette index and the codec is lossless on gray
  * planes.
  *
  * Format per the public CompuServe GIF87a specification (the GIF89a
  * spec, Appendix F, documents the identical LZW layer): header,
  * logical screen descriptor, GCT, image descriptor, LZW minimum code
  * size byte, <=255-byte data sub-blocks, block terminator, trailer.
  * The width-increase rule is the spec's non-early-change variant:
  * the code width grows when the NEXT code to be assigned reaches
  * 1 << width (capped at 12). GifGraySpec pins the container bytes
  * and the LSB-first packing of a hand-derived 2-pixel stream, so the
  * bit order is checked against the spec rule, not just round-trip.
  */
object GifGray {

  private val MinCodeSize = 8
  private val ClearCode = 1 << MinCodeSize // 256
  private val EoiCode = ClearCode + 1 // 257
  private val MaxDictSize = 4096

  /** Encode an 8-bit gray plane as a GIF87a stream. */
  def encode(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && width <= 0xFFFF && height > 0 && height <= 0xFFFF)
    require(pixels.length == width * height,
      s"plane ${pixels.length} != $width x $height")
    val out = new ArrayBuffer[Byte]()
    out ++= "GIF87a".getBytes("US-ASCII")
    def le16(v: Int): Unit = { out += (v & 0xFF).toByte; out += ((v >> 8) & 0xFF).toByte }
    le16(width); le16(height)
    // GCT present, colour resolution 8 bits, 2^(7+1) = 256 entries
    out += 0xF7.toByte
    out += 0 // background colour index
    out += 0 // pixel aspect ratio
    var i = 0
    while (i < 256) { // gray palette: entry i = (i, i, i)
      out += i.toByte; out += i.toByte; out += i.toByte
      i += 1
    }
    out += 0x2C // image descriptor
    le16(0); le16(0); le16(width); le16(height)
    out += 0 // no local colour table, not interlaced
    out += MinCodeSize.toByte
    val data = lzwEncode(pixels)
    var off = 0
    while (off < data.length) { // <=255-byte sub-blocks
      val n = math.min(255, data.length - off)
      out += n.toByte
      out ++= data.slice(off, off + n)
      off += n
    }
    out += 0 // block terminator
    out += 0x3B // trailer
    out.toArray
  }

  /** Decode a GIF87a/89a gray stream produced by [[encode]] (or any
    * single-image, 256-entry-GCT, non-interlaced 8-bit GIF whose
    * palette entry i has red channel i — the gray identity this codec
    * reads back as the pixel byte). Smaller colour tables are refused
    * (8-bit root codes could index past them). Returns
    * (width, height, pixels). */
  def decode(gif: Array[Byte]): (Int, Int, Array[Byte]) = {
    var p = 0
    def u8(): Int = {
      require(p < gif.length, "truncated GIF stream")
      val v = gif(p) & 0xFF; p += 1; v
    }
    def u16(): Int = {
      require(p + 1 < gif.length, "truncated GIF stream")
      val v = (gif(p) & 0xFF) | ((gif(p + 1) & 0xFF) << 8); p += 2; v
    }
    val sig = new String(gif.slice(0, 6), "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a", s"not a GIF: $sig")
    p = 6
    val sw = u16(); val sh = u16()
    val packed = u8()
    u8(); u8() // background index, aspect ratio
    require((packed & 0x80) != 0, "global colour table required")
    val gctSize = 2 << (packed & 7)
    // 8-bit LZW root codes address 0..255: a GCT smaller than 256
    // entries would let a valid foreign stream index past the palette
    // (ArrayIndexOutOfBounds instead of a clean refusal) — require the
    // full table, like every other unsupported-shape path here
    require(gctSize == 256,
      s"only 256-entry global colour tables supported, got $gctSize")
    require(p + 3 * gctSize <= gif.length, "truncated GIF colour table")
    val palette = new Array[Byte](gctSize)
    var i = 0
    while (i < gctSize) { // keep red channel: gray palettes are (i,i,i)
      palette(i) = gif(p); p += 3
      i += 1
    }
    require(u8() == 0x2C, "single-image streams only (no extensions)")
    u16(); u16() // image left, top
    val w = u16(); val h = u16()
    require(w == sw && h == sh, "image must fill the logical screen")
    require((u8() & 0xC0) == 0, "local colour table / interlace unsupported")
    val minCode = u8()
    require(minCode == MinCodeSize, s"expected 8-bit LZW, got $minCode")
    val data = new ArrayBuffer[Byte]()
    var bs = u8()
    while (bs != 0) {
      require(p + bs <= gif.length, "truncated GIF sub-block")
      data ++= gif.slice(p, p + bs)
      p += bs
      bs = u8()
    }
    val idx = lzwDecode(data.toArray, w * h)
    val px = new Array[Byte](w * h)
    i = 0
    while (i < px.length) { px(i) = palette(idx(i) & 0xFF); i += 1 }
    (w, h, px)
  }

  /** GIF-LZW encode of a byte stream: emit CLEAR, build (prefix, byte)
    * chains, grow the code width when the next free code reaches
    * 1 << width, emit CLEAR + reset at 4096 entries, finish with the
    * last prefix + EOI. LSB-first packing. */
  private def lzwEncode(bytes: Array[Byte]): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    var acc = 0L
    var nAcc = 0
    var width = MinCodeSize + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << nAcc
      nAcc += width
      while (nAcc >= 8) {
        out += (acc & 0xFF).toByte
        acc >>>= 8
        nAcc -= 8
      }
    }
    // dictionary: (prefix code, next byte) -> code; roots implicit
    var dict = new java.util.HashMap[Int, Int]()
    var next = EoiCode + 1
    def key(prefix: Int, b: Int): Int = (prefix << 8) | b
    put(ClearCode)
    var wCode = -1
    var i = 0
    while (i < bytes.length) {
      val c = bytes(i) & 0xFF
      if (wCode < 0) wCode = c
      else {
        val k = key(wCode, c)
        val hit = dict.getOrDefault(k, -1)
        if (hit >= 0) wCode = hit
        else {
          put(wCode)
          if (next < MaxDictSize) {
            dict.put(k, next)
            next += 1
            if (next == (1 << width) && width < 12) width += 1
          } else { // full: reset, mirrored by the decoder
            put(ClearCode)
            dict = new java.util.HashMap[Int, Int]()
            next = EoiCode + 1
            width = MinCodeSize + 1
          }
          wCode = c
        }
      }
      i += 1
    }
    if (wCode >= 0) put(wCode)
    put(EoiCode)
    if (nAcc > 0) out += (acc & 0xFF).toByte
    out.toArray
  }

  /** GIF-LZW decode (LSB-first): dictionary of (prefix, byte) entries
    * rebuilt one step behind the encoder, including the KwKwK case
    * (code == next free entry -> w + w[0]) and in-stream CLEAR
    * resets. */
  private def lzwDecode(data: Array[Byte], maxPixels: Int): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    var acc = 0L
    var nAcc = 0
    var pos = 0
    var width = MinCodeSize + 1
    def read(): Int = {
      while (nAcc < width && pos < data.length) {
        acc |= (data(pos) & 0xFFL) << nAcc
        nAcc += 8
        pos += 1
      }
      require(nAcc >= width, "LZW stream truncated")
      val v = (acc & ((1L << width) - 1)).toInt
      acc >>>= width
      nAcc -= width
      v
    }
    // entries: prefix code and final byte per code; roots are code < 256
    val prefix = new Array[Int](MaxDictSize)
    val last = new Array[Byte](MaxDictSize)
    var next = EoiCode + 1
    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= ClearCode) c = prefix(c) // 256/257 are never stored
      c.toByte
    }
    def emit(code: Int): Unit = {
      var stack = List.empty[Byte]
      var c = code
      while (c >= ClearCode) {
        stack = last(c) :: stack
        c = prefix(c)
      }
      out += c.toByte
      stack.foreach(out += _)
    }
    // The decoder materializes each dictionary entry ONE CODE LATER
    // than the encoder created it (it needs the next code's first
    // byte), so it must widen one entry earlier: at (1 << width) - 1
    // where the encoder widens at (1 << width). Non-early-change
    // otherwise (GIF, not TIFF).
    def addEntry(p: Int, fb: Byte): Unit =
      if (next < MaxDictSize) {
        prefix(next) = p
        last(next) = fb
        next += 1
        if (next == (1 << width) - 1 && width < 12) width += 1
      }
    var prev = -1
    var done = false
    while (!done) {
      val code = read()
      if (code == EoiCode) done = true
      else if (code == ClearCode) {
        next = EoiCode + 1
        width = MinCodeSize + 1
        prev = -1
      } else if (prev < 0) { // first code after a clear: always a root
        require(code < 256, s"non-root LZW code $code after clear")
        emit(code)
        prev = code
      } else if (code == next && next < MaxDictSize) {
        // KwKwK: the code names the entry being defined right now —
        // its expansion is prev's expansion plus prev's first byte
        addEntry(prev, firstByte(prev))
        emit(code)
        prev = code
      } else {
        require(code < next && (code < 256 || code > EoiCode),
          s"LZW code $code out of range (next=$next)")
        addEntry(prev, firstByte(code))
        emit(code)
        prev = code
      }
      require(out.length <= maxPixels, "LZW expansion exceeds the plane")
    }
    require(out.length == maxPixels,
      s"decoded ${out.length} pixels, expected $maxPixels")
    out.toArray
  }
}
