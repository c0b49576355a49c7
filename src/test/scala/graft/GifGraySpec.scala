package graft

import graft.operators.GifGray
import org.scalatest.funsuite.AnyFunSuite

/** GIF87a/LZW codec: container bytes and LSB-first bit packing pinned
  * by a hand-derived vector (spec rules applied longhand, not the
  * codec's own output), round-trips across the variable-width
  * boundaries (512/1024/2048) and the 4096-entry dictionary reset,
  * and the KwKwK decode corner. */
class GifGraySpec extends AnyFunSuite {

  test("container + hand-packed LZW bytes for a 2-pixel image") {
    // Pixels [5, 5], min code size 8: codes are CLEAR(256), 5
    // ((5,5) not in dict -> emit 5, add entry 258), 5 (final prefix),
    // EOI(257), all at width 9. LSB-first packing by hand:
    //   256 -> bits 0..8 = 000000001
    //   5   -> 101000000, 5 -> 101000000, 257 -> 100000001
    // byte0 = 0x00, byte1 = 0x0B, byte2 = 0x14, byte3 = 0x08,
    // byte4 = 0x08 (36 bits -> 5 bytes).
    val gif = GifGray.encode(2, 1, Array[Byte](5, 5))
    assert(new String(gif.take(6), "US-ASCII") === "GIF87a")
    // logical screen descriptor: 2x1 little-endian, GCT 256, bg 0
    assert(gif.slice(6, 13).toSeq ===
      Seq[Byte](2, 0, 1, 0, 0xF7.toByte, 0, 0))
    // gray palette: entry i = (i, i, i)
    assert(gif(13 + 3 * 5) === 5 && gif(13 + 3 * 5 + 1) === 5 &&
      gif(13 + 3 * 5 + 2) === 5)
    val id = 13 + 768 // image descriptor offset
    assert(gif(id) === 0x2C.toByte)
    assert(gif.slice(id + 1, id + 9).toSeq ===
      Seq[Byte](0, 0, 0, 0, 2, 0, 1, 0))
    assert(gif(id + 9) === 0) // no LCT, no interlace
    assert(gif(id + 10) === 8) // LZW minimum code size
    assert(gif(id + 11) === 5) // one 5-byte sub-block
    assert(gif.slice(id + 12, id + 17).toSeq ===
      Seq(0x00, 0x0B, 0x14, 0x08, 0x08).map(_.toByte))
    assert(gif(id + 17) === 0) // block terminator
    assert(gif(id + 18) === 0x3B.toByte) // trailer
    assert(gif.length === id + 19)
    val (w, h, px) = GifGray.decode(gif)
    assert(w === 2 && h === 1 && px.toSeq === Seq[Byte](5, 5))
  }

  test("round-trip across code-width boundaries and the 4096-entry reset") {
    val rnd = new scala.util.Random(12L)
    // random 256-alphabet data grows the dictionary ~1 entry per ~2
    // pixels: 128x96 = 12288 pixels crosses 512/1024/2048/4096 and
    // forces at least one in-stream CLEAR + rebuild
    for ((w, h) <- Seq((24, 16), (64, 64), (128, 96))) {
      val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val gif = GifGray.encode(w, h, px)
      val (dw, dh, dec) = GifGray.decode(gif)
      assert(dw === w && dh === h)
      assert(dec.toSeq === px.toSeq, s"round-trip drift at ${w}x$h")
    }
  }

  test("KwKwK: constant and two-symbol periodic planes") {
    // all-same-byte input emits code == next-free-entry immediately —
    // the decoder's w + w[0] materialization path
    for (v <- Seq(0, 7, 255)) {
      val px = Array.fill(32 * 32)(v.toByte)
      val (w, h, dec) = GifGray.decode(GifGray.encode(32, 32, px))
      assert(w === 32 && h === 32 && dec.toSeq === px.toSeq)
    }
    val ab = Array.tabulate(48 * 8)(i => (if (i % 2 == 0) 200 else 9).toByte)
    assert(GifGray.decode(GifGray.encode(48, 8, ab))._3.toSeq === ab.toSeq)
  }

  test("gradients and structured planes round-trip losslessly") {
    val grad = Array.tabulate(40 * 30)(i => ((i % 40) * 255 / 39).toByte)
    assert(GifGray.decode(GifGray.encode(40, 30, grad))._3.toSeq === grad.toSeq)
    val tiles = Array.tabulate(32 * 32)(i =>
      (((i / 256) * 85 + (i % 16) / 8 * 40) % 256).toByte)
    assert(GifGray.decode(GifGray.encode(32, 32, tiles))._3.toSeq === tiles.toSeq)
  }

  test("compression is real: constant plane much smaller than random") {
    val n = 64 * 64
    val const = GifGray.encode(64, 64, Array.fill(n)(42.toByte)).length
    val rnd = new scala.util.Random(5L)
    val noise = GifGray.encode(64, 64,
      Array.fill(n)(rnd.nextInt(256).toByte)).length
    assert(const < noise / 4, s"const=$const noise=$noise")
  }

  test("corrupt streams fail loudly") {
    val gif = GifGray.encode(8, 8, Array.fill(64)(3.toByte))
    intercept[IllegalArgumentException] {
      GifGray.decode(gif.take(gif.length - 6)) // drop trailer + data tail
    }
    intercept[IllegalArgumentException] {
      GifGray.decode("NOTGIF86".getBytes("US-ASCII"))
    }
    // a sub-256-entry GCT is a VALID foreign GIF whose 8-bit root codes
    // can index past the palette: must refuse cleanly, not AIOOBE
    val small = gif.clone()
    small(10) = (small(10) & 0xF8 | 0x03).toByte // GCT size 2<<3 = 16
    val e = intercept[IllegalArgumentException] { GifGray.decode(small) }
    assert(e.getMessage.contains("256-entry"), e.getMessage)
    // a GCT promised by the header but truncated mid-table: clean refusal
    intercept[IllegalArgumentException] { GifGray.decode(gif.take(13 + 90)) }
  }
}
