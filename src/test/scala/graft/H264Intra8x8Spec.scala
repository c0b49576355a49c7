package graft

import graft.operators.{H264, H264Cavlc}
import org.scalatest.funsuite.AnyFunSuite

/** I_8x8 (mb_type 0 + transform_size_8x8_flag) conformance: every
  * decoded picture is compared against an INDEPENDENT straight-line
  * reconstruction written here from the spec text — its own reference
  * filtering (8.3.2.2.1), its own nine 8x8 prediction formulas
  * (8.3.2.2.2-10), its own MPM bookkeeping across the 4x4/8x8 shapes,
  * its own 8x8 dequant table and butterfly (8.5.13) and its own
  * CAVLC de-interleave (7.3.5.3.2) — sharing nothing with the codec
  * but the z-scan constant. A wrong bit in the scan, dequant classes,
  * filter edge cases or availability rules desyncs the two
  * reconstructions immediately.
  */
class H264Intra8x8Spec extends AnyFunSuite {

  // independent transcription of the 8x8 zig-zag (raster positions)
  private val Scan8: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val ZZ4: Array[(Int, Int)] = Array(
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (3, 1), (2, 2), (1, 3), (2, 3), (3, 2), (3, 3))
  private val ZPos4: Array[(Int, Int)] = Array.tabulate(16) { b =>
    (((b >> 2) & 1) * 8 + (b & 1) * 4, ((b >> 3) & 1) * 8 + ((b >> 1) & 1) * 4)
  }
  private val ZIdx4: Array[Array[Int]] = {
    val z = Array.ofDim[Int](4, 4)
    for (b <- 0 until 16) { val (ox, oy) = ZPos4(b); z(oy / 4)(ox / 4) = b }
    z
  }

  private def clip(v: Int) = math.max(0, math.min(255, v))

  /** Independent 8.5.13 replay: classed dequant then the two-pass
    * butterfly, longhand from the spec. `lvl` is 64 zig-zag levels. */
  private def refResidual8(lvl: Array[Int], qp: Int): Array[Array[Int]] = {
    val v: Array[Int] = Array(
      Array(20, 18, 32, 19, 25, 24), Array(22, 19, 35, 21, 28, 26),
      Array(26, 23, 42, 24, 33, 31), Array(28, 25, 45, 26, 35, 33),
      Array(32, 28, 51, 30, 40, 38), Array(36, 32, 58, 34, 43, 41))
      .apply(qp % 6)
    def cls(i: Int, j: Int): Int =
      if (i % 4 == 0 && j % 4 == 0) 0
      else if (i % 2 == 1 && j % 2 == 1) 1
      else if (i % 4 == 2 && j % 4 == 2) 2
      else if ((i % 4 == 0 && j % 2 == 1) || (i % 2 == 1 && j % 4 == 0)) 3
      else if ((i % 4 == 0 && j % 4 == 2) || (i % 4 == 2 && j % 4 == 0)) 4
      else 5
    val d = Array.ofDim[Int](8, 8)
    for (p <- 0 until 64 if lvl(p) != 0) {
      val i = Scan8(p) / 8; val j = Scan8(p) % 8
      val ls = 16 * v(cls(i, j))
      d(i)(j) =
        if (qp >= 36) (lvl(p) * ls) << (qp / 6 - 6)
        else (lvl(p) * ls + (1 << (5 - qp / 6))) >> (6 - qp / 6)
    }
    def pass(x: Array[Int]): Array[Int] = {
      val e = Array(
        x(0) + x(4),
        -x(3) + x(5) - x(7) - (x(7) >> 1),
        x(0) - x(4),
        x(1) + x(7) - x(3) - (x(3) >> 1),
        (x(2) >> 1) - x(6),
        -x(1) + x(7) + x(5) + (x(5) >> 1),
        x(2) + (x(6) >> 1),
        x(3) + x(5) + x(1) + (x(1) >> 1))
      val f = Array(
        e(0) + e(6), e(1) + (e(7) >> 2), e(2) + e(4), e(3) + (e(5) >> 2),
        e(2) - e(4), (e(3) >> 2) - e(5), e(0) - e(6), e(7) - (e(1) >> 2))
      Array(f(0) + f(7), f(2) + f(5), f(4) + f(3), f(6) + f(1),
        f(6) - f(1), f(4) - f(3), f(2) - f(5), f(0) - f(7))
    }
    val rows = d.map(pass)
    val out = Array.ofDim[Int](8, 8)
    for (j <- 0 until 8) {
      val col = pass(Array.tabulate(8)(i => rows(i)(j)))
      for (i <- 0 until 8) out(i)(j) = (col(i) + 32) >> 6
    }
    out
  }

  private def refResidual4(scan: Array[Int], qp: Int): Array[Array[Int]] = {
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
      val (i, j) = ZZ4(k); d(i)(j) = deq(scan(k), i, j)
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

  /** Independent full-frame reconstruction over mixed kinds.
    * kinds: 0 = I_8x8, 1 = I_4x4, 2 = all-zero DC I_16x16. */
  private def refFrame(wMbs: Int, hMbs: Int, kinds: Array[Int],
      modes8: Array[Array[Int]], coeffs8: Array[Array[Array[Int]]],
      modes4: Array[Array[Int]], coeffs4: Array[Array[Array[Int]]],
      qp: Int, sliceOf: Array[Int]): Array[Byte] = {
    val w16 = wMbs * 16
    val h16 = hMbs * 16
    val plane = new Array[Byte](w16 * h16)
    def px(x: Int, y: Int): Int = plane(y * w16 + x) & 0xFF
    for (m <- 0 until wMbs * hMbs) {
      val mbX = m % wMbs; val mbY = m / wMbs
      def mbAv(x: Int, y: Int) =
        x >= 0 && y >= 0 && x < wMbs && y < hMbs && {
          val n = y * wMbs + x; n < m && sliceOf(n) == sliceOf(m)
        }
      kinds(m) match {
        case 2 =>
          val lAv = mbAv(mbX - 1, mbY); val tAv = mbAv(mbX, mbY - 1)
          var s = 0; var n = 0
          if (lAv) { for (y <- 0 until 16) s += px(mbX * 16 - 1, mbY * 16 + y); n += 16 }
          if (tAv) { for (x <- 0 until 16) s += px(mbX * 16 + x, mbY * 16 - 1); n += 16 }
          val dc = if (n == 32) (s + 16) >> 5 else if (n == 16) (s + 8) >> 4 else 128
          for (y <- 0 until 16; x <- 0 until 16)
            plane((mbY * 16 + y) * w16 + mbX * 16 + x) = dc.toByte
        case 1 =>
          for (blk <- 0 until 16) {
            val (ox, oy) = ZPos4(blk)
            val gx = mbX * 16 + ox; val gy = mbY * 16 + oy
            def sAv(sx: Int, sy: Int): Boolean =
              sx >= 0 && sy >= 0 && sx < w16 && sy < h16 && {
                val bmx = sx / 16; val bmy = sy / 16
                if (bmy * wMbs + bmx == m) ZIdx4((sy % 16) / 4)((sx % 16) / 4) < blk
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
            val pred: (Int, Int) => Int = modes4(m)(blk) match {
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
              case 8 => (x, y) => x + 2 * y match {
                case z if z == 0 || z == 2 || z == 4 =>
                  (l(y + (x >> 1)) + l(y + (x >> 1) + 1) + 1) >> 1
                case z if z == 1 || z == 3 =>
                  (l(y + (x >> 1)) + 2 * l(y + (x >> 1) + 1) +
                    l(y + (x >> 1) + 2) + 2) >> 2
                case 5 => (l(2) + 3 * l(3) + 2) >> 2
                case _ => l(3)
              }
              case other => throw new IllegalArgumentException(
                s"ref I_4x4 subset here covers 0-4, 8; got $other")
            }
            val res = refResidual4(coeffs4(m)(blk), qp)
            for (rr <- 0 until 4; cc <- 0 until 4)
              plane((gy + rr) * w16 + gx + cc) =
                clip(pred(cc, rr) + res(rr)(cc)).toByte
          }
        case _ =>
          for (b8 <- 0 until 4) {
            val gx = mbX * 16 + (b8 & 1) * 8
            val gy = mbY * 16 + (b8 >> 1) * 8
            def sAv(sx: Int, sy: Int): Boolean =
              sx >= 0 && sy >= 0 && sx < w16 && sy < h16 && {
                val bmx = sx / 16; val bmy = sy / 16
                if (bmy * wMbs + bmx == m)
                  ((sy % 16) / 8) * 2 + ((sx % 16) / 8) < b8
                else mbAv(bmx, bmy)
              }
            val lAv = sAv(gx - 1, gy); val tAv = sAv(gx, gy - 1)
            val tlAv = sAv(gx - 1, gy - 1); val trAv = sAv(gx + 8, gy - 1)
            val lR = Array.tabulate(8)(y => if (lAv) px(gx - 1, gy + y) else 0)
            val tlR = if (tlAv) px(gx - 1, gy - 1) else 0
            val tR = Array.tabulate(16) { x =>
              if (!tAv) 0
              else if (x < 8) px(gx + x, gy - 1)
              else if (trAv) px(gx + x, gy - 1)
              else px(gx + 7, gy - 1)
            }
            // 8.3.2.2.1 filtering, longhand
            val t = new Array[Int](16)
            if (tAv) {
              t(0) = if (tlAv) (tlR + 2 * tR(0) + tR(1) + 2) >> 2
                else (3 * tR(0) + tR(1) + 2) >> 2
              for (x <- 1 until 15)
                t(x) = (tR(x - 1) + 2 * tR(x) + tR(x + 1) + 2) >> 2
              t(15) = (tR(14) + 3 * tR(15) + 2) >> 2
            }
            val l = new Array[Int](8)
            if (lAv) {
              l(0) = if (tlAv) (tlR + 2 * lR(0) + lR(1) + 2) >> 2
                else (3 * lR(0) + lR(1) + 2) >> 2
              for (y <- 1 until 7)
                l(y) = (lR(y - 1) + 2 * lR(y) + lR(y + 1) + 2) >> 2
              l(7) = (lR(6) + 3 * lR(7) + 2) >> 2
            }
            val tl =
              if (!tlAv) tlR
              else if (tAv && lAv) (tR(0) + 2 * tlR + lR(0) + 2) >> 2
              else if (tAv) (3 * tlR + tR(0) + 2) >> 2
              else if (lAv) (3 * tlR + lR(0) + 2) >> 2
              else tlR
            def tA(i: Int) = if (i >= 0) t(i) else tl
            def lA(i: Int) = if (i >= 0) l(i) else tl
            val pred: (Int, Int) => Int = modes8(m)(b8) match {
              case 0 => (x, _) => t(x)
              case 1 => (_, y) => l(y)
              case 2 =>
                val v = if (lAv && tAv) (t.take(8).sum + l.sum + 8) >> 4
                  else if (lAv) (l.sum + 4) >> 3
                  else if (tAv) (t.take(8).sum + 4) >> 3 else 128
                (_, _) => v
              case 3 => (x, y) =>
                if (x == 7 && y == 7) (t(14) + 3 * t(15) + 2) >> 2
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
                case z if z < 13 && z % 2 == 0 =>
                  (l(y + (x >> 1)) + l(y + (x >> 1) + 1) + 1) >> 1
                case z if z < 13 =>
                  (l(y + (x >> 1)) + 2 * l(y + (x >> 1) + 1) +
                    l(y + (x >> 1) + 2) + 2) >> 2
                case 13 => (l(6) + 3 * l(7) + 2) >> 2
                case _ => l(7)
              }
            }
            val res = refResidual8(coeffs8(m)(b8), qp)
            for (rr <- 0 until 8; cc <- 0 until 8)
              plane((gy + rr) * w16 + gx + cc) =
                clip(pred(cc, rr) + res(rr)(cc)).toByte
          }
      }
    }
    plane
  }

  /** Legal 8x8 modes per block from the reference availability rules. */
  private def legalModes8(wMbs: Int, hMbs: Int, kinds: Array[Int],
      sliceOf: Array[Int], rnd: scala.util.Random): Array[Array[Int]] =
    Array.tabulate(wMbs * hMbs) { m =>
      val mbX = m % wMbs; val mbY = m / wMbs
      def mbAv(x: Int, y: Int) =
        x >= 0 && y >= 0 && x < wMbs && y < hMbs && {
          val n = y * wMbs + x; n < m && sliceOf(n) == sliceOf(m)
        }
      Array.tabulate(4) { b8 =>
        val gx = mbX * 16 + (b8 & 1) * 8
        val gy = mbY * 16 + (b8 >> 1) * 8
        def sAv(sx: Int, sy: Int): Boolean =
          sx >= 0 && sy >= 0 && sx < wMbs * 16 && sy < hMbs * 16 && {
            val bmx = sx / 16; val bmy = sy / 16
            if (bmy * wMbs + bmx == m)
              ((sy % 16) / 8) * 2 + ((sx % 16) / 8) < b8
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

  private def randomCoeffs8(n: Int, rnd: scala.util.Random,
      density: Double = 0.6): Array[Array[Array[Int]]] =
    Array.fill(n)(Array.tabulate(4) { _ =>
      val a = new Array[Int](64)
      if (rnd.nextDouble() < density) {
        val nnz = 1 + rnd.nextInt(20)
        rnd.shuffle((0 until 64).toList).take(nnz).foreach { p =>
          a(p) = (if (rnd.nextBoolean()) 1 else -1) * (1 + rnd.nextInt(6))
        }
      }
      a
    })

  private def emptyC4(n: Int) = Array.fill(n)(Array.fill(16)(new Array[Int](16)))
  private def dcModes4(n: Int) = Array.fill(n)(Array.fill(16)(2))

  test("all nine 8x8 modes reconstruct against the independent reference") {
    val rnd = new scala.util.Random(20260815L)
    for (qp <- Seq(10, 22, 28, 36, 40, 51); trial <- 0 until 4) {
      val (wMbs, hMbs) = (3, 2)
      val n = wMbs * hMbs
      val sliceOf = Array.fill(n)(0)
      val kinds = Array.fill(n)(0)
      val modes8 = legalModes8(wMbs, hMbs, kinds, sliceOf, rnd)
      val coeffs8 = randomCoeffs8(n, rnd)
      val es = H264.encodeSpsHigh(wMbs, hMbs, 0) ++ H264.encodePpsT8() ++
        H264Cavlc.encodeIntra8x8Frame(wMbs, hMbs, kinds, modes8, coeffs8,
          dcModes4(n), emptyC4(n), qp, idrPicId = trial)
      val fr = H264Cavlc.decodeIntra16Frames(es)
      assert(fr.size === 1)
      assert(fr.head._3.toSeq ===
        refFrame(wMbs, hMbs, kinds, modes8, coeffs8, dcModes4(n),
          emptyC4(n), qp, sliceOf).toSeq, s"qp=$qp trial=$trial")
    }
  }

  test("mixed I_8x8 / I_4x4 / I_16x16 pictures: MPM crosses shapes correctly") {
    val rnd = new scala.util.Random(7L)
    for (trial <- 0 until 8) {
      val (wMbs, hMbs) = (3, 2)
      val n = wMbs * hMbs
      val sliceOf = Array.fill(n)(0)
      val kinds = Array.tabulate(n)(m => (m + trial) % 3)
      val modes8 = legalModes8(wMbs, hMbs, kinds, sliceOf, rnd)
      val coeffs8 = randomCoeffs8(n, rnd)
      // I_4x4 MBs use the DC-heavy safe subset (always legal) with
      // sparse residuals, exercising the 4x4 path inside a t8x8 stream
      val modes4 = dcModes4(n)
      val coeffs4 = Array.fill(n)(Array.tabulate(16) { _ =>
        val a = new Array[Int](16)
        if (rnd.nextDouble() < 0.4) a(rnd.nextInt(16)) =
          (if (rnd.nextBoolean()) 1 else -1) * (1 + rnd.nextInt(4))
        a
      })
      val es = H264.encodeSpsHigh(wMbs, hMbs, 0) ++ H264.encodePpsT8() ++
        H264Cavlc.encodeIntra8x8Frame(wMbs, hMbs, kinds, modes8, coeffs8,
          modes4, coeffs4, qp = 28, idrPicId = trial)
      val fr = H264Cavlc.decodeIntra16Frames(es)
      assert(fr.size === 1)
      assert(fr.head._3.toSeq ===
        refFrame(wMbs, hMbs, kinds, modes8, coeffs8, modes4, coeffs4,
          28, sliceOf).toSeq, s"trial=$trial")
    }
  }

  test("multi-slice I_8x8: availability and MPM stop at the boundary") {
    val rnd = new scala.util.Random(11L)
    val (wMbs, hMbs) = (2, 2)
    val n = wMbs * hMbs
    val sliceOf = Array(0, 0, 1, 1)
    val kinds = Array.fill(n)(0)
    val modes8 = legalModes8(wMbs, hMbs, kinds, sliceOf, rnd)
    val coeffs8 = randomCoeffs8(n, rnd)
    val es = H264.encodeSpsHigh(wMbs, hMbs, 0) ++ H264.encodePpsT8() ++
      H264Cavlc.encodeIntra8x8Frame(wMbs, hMbs, kinds, modes8, coeffs8,
        dcModes4(n), emptyC4(n), qp = 30, sliceStarts = Array(0, 2))
    val fr = H264Cavlc.decodeIntra16Frames(es)
    assert(fr.size === 1)
    assert(fr.head._3.toSeq ===
      refFrame(wMbs, hMbs, kinds, modes8, coeffs8, dcModes4(n),
        emptyC4(n), 30, sliceOf).toSeq)
  }

  test("DC-only 8x8 residual is the exact flat spread at every qp") {
    // pins the dequant table's class-0 column and the transform's
    // DC path: a lone scan-0 level must land as (d00 + 32) >> 6 flat
    for (qp <- 0 to 51; c <- Seq(-3, -1, 1, 2)) {
      val lvl = new Array[Int](64); lvl(0) = c
      val v0 = Array(20, 22, 26, 28, 32, 36)(qp % 6)
      val d00 = if (qp >= 36) (c * 16 * v0) << (qp / 6 - 6)
        else (c * 16 * v0 + (1 << (5 - qp / 6))) >> (6 - qp / 6)
      val res = refResidual8(lvl, qp)
      assert(res.flatten.toSet === Set((d00 + 32) >> 6), s"qp=$qp c=$c")
    }
  }

  test("legacy PPS without the tail still decodes (flag absent => I_4x4 only)") {
    // the old baseline SPS+PPS pair must keep decoding unchanged
    val modes = Array(Array.fill(16)(2))
    val coeffs = Array.fill(1)(Array.fill(16)(new Array[Int](16)))
    val es = H264.encodeSps(1, 1, 0) ++ H264.encodePps() ++
      H264Cavlc.encodeIntra4x4Frame(1, 1, modes, coeffs, qp = 28)
    assert(H264Cavlc.decodeIntra16Frames(es).size === 1)
  }

  test("illegal 8x8 streams fail loudly") {
    val kinds = Array(0)
    val modes8 = Array(Array(0, 2, 2, 2)) // vertical in the top row
    val coeffs8 = Array(Array.fill(4)(new Array[Int](64)))
    val ex = intercept[IllegalArgumentException] {
      H264Cavlc.encodeIntra8x8Frame(1, 1, kinds, modes8, coeffs8,
        dcModes4(1), emptyC4(1), qp = 28)
    }
    assert(ex.getMessage.contains("top neighbour"))
  }
}
