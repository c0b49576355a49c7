package graft

import graft.operators.{H264, H264Cavlc}
import org.scalatest.funsuite.AnyFunSuite

/** CAVLC entropy codec conformance + round-trip. The worked-example
  * test pins the codec to an EXTERNAL vector: the widely-published
  * H.264 CAVLC example (reproduced in I. Richardson, "The H.264
  * Advanced Video Compression Standard", and many public codec
  * tutorials) whose exact output bitstring is known — so the VLC
  * tables are checked against the spec, not just against themselves.
  */
class H264CavlcSpec extends AnyFunSuite {

  private def bitsOf(bytes: Array[Byte], n: Int): String =
    bytes.flatMap(b => (7 to 0 by -1).map(i => (b >> i) & 1))
      .take(n).mkString

  test("published CAVLC worked example encodes to the known bitstring") {
    // Zig-zag-ordered coefficients 0,3,0,1,-1,-1,0,1,0... :
    // TotalCoeff 5, TrailingOnes 3, total_zeros 3. Published coding
    // (nC < 2): coeff_token 0000100, T1 signs 0,1,1, levels "1" and
    // "0010", total_zeros 111, run_before 10,1,1,01.
    val scan = Array(0, 3, 0, 1, -1, -1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0)
    val w = new H264.BitWriter
    H264Cavlc.encodeBlock(scan, w)
    w.u(0, 7) // pad for byte extraction (trailing() would add a stop bit)
    val bytes = w.trailing()
    assert(bitsOf(bytes, 24) === "000010001110010111101101")
  }

  test("published worked example decodes back to the coefficients") {
    // Feed the known bitstring (plus padding) straight to the decoder.
    val bits = "000010001110010111101101"
    val padded = bits + "0" * (32 - bits.length)
    val bytes = padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    val r = new H264.BitReader(bytes)
    val scan = H264Cavlc.decodeBlock(r)
    assert(scan.toSeq === Seq(0, 3, 0, 1, -1, -1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0))
    assert(r.posBits === 24) // consumed exactly the published code length
  }

  test("block round-trip over randomized sparsity and magnitudes") {
    val rnd = new scala.util.Random(20260814L)
    (0 until 2000).foreach { _ =>
      val scan = new Array[Int](16)
      val nnz = rnd.nextInt(17)
      rnd.shuffle((0 until 16).toList).take(nnz).foreach { p =>
        // Mix of trailing-one candidates and large levels so
        // suffixLength adaptation and both prefix escapes are hit.
        val mag = rnd.nextInt(4) match {
          case 0 => 1
          case 1 => 1 + rnd.nextInt(3)
          case 2 => 1 + rnd.nextInt(40)
          case _ => 1 + rnd.nextInt(2000) // deep into prefix-15 escape
        }
        scan(p) = if (rnd.nextBoolean()) mag else -mag
      }
      val w = new H264.BitWriter
      H264Cavlc.encodeBlock(scan, w)
      w.u(1, 1) // sentinel so trailing() padding can't be misread
      val r = new H264.BitReader(w.trailing())
      val back = H264Cavlc.decodeBlock(r)
      assert(back.toSeq === scan.toSeq)
    }
  }

  test("all-zero block codes as the single coeff_token bit") {
    val w = new H264.BitWriter
    H264Cavlc.encodeBlock(new Array[Int](16), w)
    val r = new H264.BitReader(w.trailing())
    assert(H264Cavlc.decodeBlock(r).forall(_ == 0))
    assert(r.posBits === 1) // (0,0) -> "1"
  }

  /** Independent straight-line reference reconstruction for one
    * all-I_16x16_2_0_0 frame — separate code path from the decoder
    * (no shared transform/pred helpers beyond the Hadamard matrix
    * definition, recomputed here longhand). */
  private def referenceFrame(widthMbs: Int, mapUnits: Int,
      dc: Array[Array[Array[Int]]], qp: Int,
      modes: Array[Int] = null,
      ac: Array[Array[Array[Int]]] = null): Array[Byte] = {
    val md = if (modes == null) Array.fill(dc.length)(2) else modes
    val w16 = widthMbs * 16
    val plane = new Array[Byte](w16 * mapUnits * 16)
    val h = Array(Array(1, 1, 1, 1), Array(1, 1, -1, -1),
      Array(1, -1, -1, 1), Array(1, -1, 1, -1))
    val v = Array(10, 11, 13, 14, 16, 18)(qp % 6) * 16
    def clip(x: Int) = math.max(0, math.min(255, x))
    for (mb <- dc.indices) {
      val mbX = mb % widthMbs
      val mbY = mb / widthMbs
      // f = H c H
      val f = Array.tabulate(4, 4) { (i, j) =>
        (for (m <- 0 until 4; n <- 0 until 4)
          yield h(i)(m) * dc(mb)(m)(n) * h(n)(j)).sum
      }
      def lft(y: Int) = plane((mbY * 16 + y) * w16 + mbX * 16 - 1) & 0xFF
      def top(x: Int) = plane((mbY * 16 - 1) * w16 + mbX * 16 + x) & 0xFF
      def tl = plane((mbY * 16 - 1) * w16 + mbX * 16 - 1) & 0xFF
      val pred: (Int, Int) => Int = md(mb) match {
        case 0 => (x, _) => top(x)
        case 1 => (_, y) => lft(y)
        case 2 =>
          var sum = 0; var cnt = 0
          if (mbX > 0) { for (r <- 0 until 16) sum += lft(r); cnt += 16 }
          if (mbY > 0) { for (c <- 0 until 16) sum += top(c); cnt += 16 }
          val p = if (cnt == 32) (sum + 16) >> 5
            else if (cnt == 16) (sum + 8) >> 4 else 128
          (_, _) => p
        case _ =>
          // plane, recomputed longhand from 8.3.3.4
          val hh = (0 until 8).map(i =>
            (i + 1) * (top(8 + i) - (if (6 - i >= 0) top(6 - i) else tl))).sum
          val vv = (0 until 8).map(i =>
            (i + 1) * (lft(8 + i) - (if (6 - i >= 0) lft(6 - i) else tl))).sum
          val a = 16 * (lft(15) + top(15))
          val b = (5 * hh + 32) >> 6
          val c = (5 * vv + 32) >> 6
          (x, y) => clip((a + b * (x - 7) + c * (y - 7) + 16) >> 5)
      }
      for (bi <- 0 until 4; bj <- 0 until 4) {
        val dcY = if (qp >= 36) (f(bi)(bj) * v) << (qp / 6 - 6)
          else (f(bi)(bj) * v + (1 << (5 - qp / 6))) >> (6 - qp / 6)
        // z-scan index of the 4x4 block at raster (bi, bj), 6.4.3
        val blkIdx = (bi / 2) * 8 + (bi % 2) * 2 + (bj / 2) * 4 + (bj % 2)
        val blockAc =
          if (ac == null) new Array[Int](15) else ac(mb)(blkIdx)
        val res: (Int, Int) => Int =
          if (blockAc.forall(_ == 0)) { val flat = (dcY + 32) >> 6; (_, _) => flat }
          else {
            // longhand 8.5.12: zig-zag place, Table 8-15 dequant,
            // row/column butterfly with the spec's >>1 halvings
            val zz = Seq((0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2),
              (0, 3), (1, 2), (2, 1), (3, 0), (3, 1), (2, 2), (1, 3),
              (2, 3), (3, 2), (3, 3))
            val vTab = Array(
              Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
              Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))
            val d = Array.ofDim[Int](4, 4)
            d(0)(0) = dcY
            for (k <- 1 until 16; if blockAc(k - 1) != 0) {
              val (i, j) = zz(k)
              val cls = if (i % 2 == 0 && j % 2 == 0) 0
                else if (i % 2 == 1 && j % 2 == 1) 1 else 2
              val ls = 16 * vTab(qp % 6)(cls)
              d(i)(j) = if (qp >= 24) (blockAc(k - 1) * ls) << (qp / 6 - 4)
                else (blockAc(k - 1) * ls + (1 << (3 - qp / 6))) >> (4 - qp / 6)
            }
            val fr = Array.tabulate(4) { i =>
              val e0 = d(i)(0) + d(i)(2); val e1 = d(i)(0) - d(i)(2)
              val e2 = (d(i)(1) >> 1) - d(i)(3); val e3 = d(i)(1) + (d(i)(3) >> 1)
              Array(e0 + e3, e1 + e2, e1 - e2, e0 - e3)
            }
            val hm = Array.ofDim[Int](4, 4)
            for (j <- 0 until 4) {
              val g0 = fr(0)(j) + fr(2)(j); val g1 = fr(0)(j) - fr(2)(j)
              val g2 = (fr(1)(j) >> 1) - fr(3)(j); val g3 = fr(1)(j) + (fr(3)(j) >> 1)
              hm(0)(j) = g0 + g3; hm(1)(j) = g1 + g2
              hm(2)(j) = g1 - g2; hm(3)(j) = g0 - g3
            }
            (r, c) => (hm(r)(c) + 32) >> 6
          }
        for (r <- 0 until 4; c <- 0 until 4)
          plane((mbY * 16 + bi * 4 + r) * w16 + mbX * 16 + bj * 4 + c) =
            clip(pred(bj * 4 + c, bi * 4 + r) + res(r, c)).toByte
      }
    }
    plane
  }

  test("all four Intra_16x16 luma prediction modes match the reference " +
      "(multi-MB chains across modes and QPs)") {
    val rnd = new scala.util.Random(23L)
    for (qp <- Seq(10, 24, 38); trial <- 0 until 6) {
      val (wMbs, hMus) = (3, 3)
      val dc = Array.fill(wMbs * hMus)(Array.fill(4, 4)(rnd.nextInt(9) - 4))
      // legal mode per position: top row can't be vertical/plane,
      // left column can't be horizontal/plane
      val modes = Array.tabulate(wMbs * hMus) { m =>
        val mx = m % wMbs; val my = m / wMbs
        val legal =
          if (mx > 0 && my > 0) Seq(0, 1, 2, 3)
          else if (my > 0) Seq(0, 2)
          else if (mx > 0) Seq(1, 2)
          else Seq(2)
        legal(rnd.nextInt(legal.length))
      }
      val es = H264.encodeSps(wMbs, hMus, 0) ++ H264.encodePps() ++
        H264Cavlc.encodeIntra16Frame(wMbs, hMus, dc, qp, idrPicId = trial,
          predModes = modes)
      val frames = H264Cavlc.decodeIntra16Frames(es)
      assert(frames.size === 1)
      assert(frames.head._3.toSeq ===
        referenceFrame(wMbs, hMus, dc, qp, modes).toSeq)
    }
    // an illegal mode is refused at encode time
    intercept[IllegalArgumentException] {
      H264Cavlc.encodeIntra16Frame(1, 1,
        Array(Array.fill(4, 4)(0)), qp = 24, predModes = Array(3))
    }
  }

  test("intra-16x16-DC frame decode matches independent reference " +
      "(multi-MB, DC pred chains, several QPs)") {
    val rnd = new scala.util.Random(7L)
    for (qp <- Seq(10, 24, 30, 38, 51); trial <- 0 until 6) {
      val (wMbs, hMus) = (2, 2)
      val dc = Array.fill(wMbs * hMus)(
        Array.fill(4, 4)(rnd.nextInt(13) - 6))
      val es = H264.encodeSps(wMbs, hMus, 0) ++ H264.encodePps() ++
        H264Cavlc.encodeIntra16Frame(wMbs, hMus, dc, qp, idrPicId = trial)
      val frames = H264Cavlc.decodeIntra16Frames(es)
      assert(frames.size === 1)
      val (w, h, luma) = frames.head
      assert(w === 32 && h === 32)
      assert(luma.toSeq === referenceFrame(wMbs, hMus, dc, qp).toSeq)
    }
  }

  test("multi-frame stream decodes every picture; SPS crop applies") {
    val dcA = Array.fill(1)(Array.tabulate(4, 4)((i, j) => i - j))
    val dcB = Array.fill(1)(Array.fill(4, 4)(2))
    val es = H264.encodeSps(1, 1, cropBottom = 2) ++ H264.encodePps() ++
      H264Cavlc.encodeIntra16Frame(1, 1, dcA, qp = 24, idrPicId = 0) ++
      H264Cavlc.encodeIntra16Frame(1, 1, dcB, qp = 24, idrPicId = 1)
    val frames = H264Cavlc.decodeIntra16Frames(es)
    assert(frames.size === 2)
    assert(frames.forall { case (w, h, p) =>
      w === 16 && h === 12 && p.length === 16 * 12 })
    val ref = referenceFrame(1, 1, dcB, 24)
    assert(frames(1)._3.toSeq === ref.take(16 * 12).toSeq)
  }

  test("chroma DC block: hand-derived vector from the public tables") {
    // scan (-2, 1, 0, -1): TotalCoeff 3, TrailingOnes 2 ->
    // coeff_token(nC=-1) "0000010"; T1 signs "1","0" (idx3 then idx1);
    // level -2 with the t1<3 +2 adjust -> levelCode 1 -> "01";
    // total_zeros(3) 1 -> "0"; run_before(zerosLeft 1) run 1 -> "0".
    val scan = Array(-2, 1, 0, -1)
    val w = new H264.BitWriter
    H264Cavlc.encodeChromaDcBlock(scan, w)
    w.u(0, 3) // pad to a byte boundary without trailing()'s stop bit
    val bytes = w.trailing()
    assert(bitsOf(bytes, 13) === "0000010100100")
    val r = new H264.BitReader(bytes)
    assert(H264Cavlc.decodeChromaDcBlock(r).toSeq === scan.toSeq)
    assert(r.posBits === 13)
  }

  test("chroma DC block round-trip over all sparsities and magnitudes") {
    val rnd = new scala.util.Random(20260815L)
    (0 until 2000).foreach { _ =>
      val scan = new Array[Int](4)
      val nnz = rnd.nextInt(5)
      rnd.shuffle((0 until 4).toList).take(nnz).foreach { p =>
        val mag = rnd.nextInt(3) match {
          case 0 => 1
          case 1 => 1 + rnd.nextInt(6)
          case _ => 1 + rnd.nextInt(2000) // prefix escapes
        }
        scan(p) = if (rnd.nextBoolean()) mag else -mag
      }
      val w = new H264.BitWriter
      H264Cavlc.encodeChromaDcBlock(scan, w)
      w.u(1, 1)
      val r = new H264.BitReader(w.trailing())
      assert(H264Cavlc.decodeChromaDcBlock(r).toSeq === scan.toSeq)
    }
  }

  /** Independent chroma-plane reference: Table 8-12 QPc, 2x2 Hadamard,
    * 8.5.10 chroma DC dequant, DC-only core transform, 8.3.4.1 DC
    * prediction — all recomputed longhand (raster MB order so the
    * prediction chains over reconstructed neighbours). */
  private def referenceChromaPlane(widthMbs: Int, mapUnits: Int,
      dcC: Array[Array[Array[Int]]], qpy: Int,
      ac: Array[Array[Array[Int]]] = null): Array[Byte] = {
    val qpcTab = Array(29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36,
      36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39)
    val qpc = if (qpy < 30) qpy else qpcTab(qpy - 30)
    val v = Array(10, 11, 13, 14, 16, 18)(qpc % 6) * 16
    val w8 = widthMbs * 8
    val plane = new Array[Byte](w8 * mapUnits * 8)
    for (mb <- dcC.indices) {
      val mbX = mb % widthMbs
      val mbY = mb / widthMbs
      val cM = dcC(mb)
      val f = Array(
        Array(cM(0)(0) + cM(0)(1) + cM(1)(0) + cM(1)(1),
          cM(0)(0) - cM(0)(1) + cM(1)(0) - cM(1)(1)),
        Array(cM(0)(0) + cM(0)(1) - cM(1)(0) - cM(1)(1),
          cM(0)(0) - cM(0)(1) - cM(1)(0) + cM(1)(1)))
      def sTop(off: Int) = (0 until 4).map(c =>
        plane((mbY * 8 - 1) * w8 + mbX * 8 + off * 4 + c) & 0xFF).sum
      def sLeft(off: Int) = (0 until 4).map(r =>
        plane((mbY * 8 + off * 4 + r) * w8 + mbX * 8 - 1) & 0xFF).sum
      val top = mbY > 0; val left = mbX > 0
      for (bi <- 0 until 2; bj <- 0 until 2) {
        val pred = (bj, bi) match {
          case (0, 0) =>
            if (top && left) (sTop(0) + sLeft(0) + 4) >> 3
            else if (left) (sLeft(0) + 2) >> 2
            else if (top) (sTop(0) + 2) >> 2 else 128
          case (1, 0) =>
            if (top) (sTop(1) + 2) >> 2
            else if (left) (sLeft(0) + 2) >> 2 else 128
          case (0, 1) =>
            if (left) (sLeft(1) + 2) >> 2
            else if (top) (sTop(0) + 2) >> 2 else 128
          case _ =>
            if (top && left) (sTop(1) + sLeft(1) + 4) >> 3
            else if (left) (sLeft(1) + 2) >> 2
            else if (top) (sTop(1) + 2) >> 2 else 128
        }
        val dcCv = ((f(bi)(bj) * v) << (qpc / 6)) >> 5
        val blockAc = if (ac == null) new Array[Int](15) else ac(mb)(bi * 2 + bj)
        if (blockAc.forall(_ == 0)) {
          val res = (dcCv + 32) >> 6
          val px = math.max(0, math.min(255, pred + res)).toByte
          for (r <- 0 until 4; c <- 0 until 4)
            plane((mbY * 8 + bi * 4 + r) * w8 + mbX * 8 + bj * 4 + c) = px
        } else {
          // longhand chroma AC: zig-zag place, Table 8-15 dequant at
          // QPc, row/column butterfly — independent of the decoder
          val zz = Seq((0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2),
            (0, 3), (1, 2), (2, 1), (3, 0), (3, 1), (2, 2), (1, 3),
            (2, 3), (3, 2), (3, 3))
          val vTab = Array(
            Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
            Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))
          val d = Array.ofDim[Int](4, 4)
          d(0)(0) = dcCv
          for (k <- 1 until 16; if blockAc(k - 1) != 0) {
            val (i, j) = zz(k)
            val cls = if (i % 2 == 0 && j % 2 == 0) 0
              else if (i % 2 == 1 && j % 2 == 1) 1 else 2
            val ls = 16 * vTab(qpc % 6)(cls)
            d(i)(j) = if (qpc >= 24) (blockAc(k - 1) * ls) << (qpc / 6 - 4)
              else (blockAc(k - 1) * ls + (1 << (3 - qpc / 6))) >> (4 - qpc / 6)
          }
          val fr = Array.tabulate(4) { i =>
            val e0 = d(i)(0) + d(i)(2); val e1 = d(i)(0) - d(i)(2)
            val e2 = (d(i)(1) >> 1) - d(i)(3); val e3 = d(i)(1) + (d(i)(3) >> 1)
            Array(e0 + e3, e1 + e2, e1 - e2, e0 - e3)
          }
          for (c <- 0 until 4) {
            val g0 = fr(0)(c) + fr(2)(c); val g1 = fr(0)(c) - fr(2)(c)
            val g2 = (fr(1)(c) >> 1) - fr(3)(c); val g3 = fr(1)(c) + (fr(3)(c) >> 1)
            val hcol = Array(g0 + g3, g1 + g2, g1 - g2, g0 - g3)
            for (r <- 0 until 4)
              plane((mbY * 8 + bi * 4 + r) * w8 + mbX * 8 + bj * 4 + c) =
                math.max(0, math.min(255, pred + ((hcol(r) + 32) >> 6))).toByte
          }
        }
      }
    }
    plane
  }

  test("chroma-DC frame decode matches independent reference " +
      "(multi-MB pred chains, QPs across the QPc map)") {
    val rnd = new scala.util.Random(11L)
    for (qp <- Seq(10, 24, 30, 38, 51); trial <- 0 until 4) {
      val (wMbs, hMus) = (2, 2)
      val dc = Array.fill(wMbs * hMus)(Array.fill(4, 4)(rnd.nextInt(9) - 4))
      val cb = Array.fill(wMbs * hMus)(Array.fill(2, 2)(rnd.nextInt(7) - 3))
      val cr = Array.fill(wMbs * hMus)(Array.fill(2, 2)(rnd.nextInt(7) - 3))
      val es = H264.encodeSps(wMbs, hMus, 0) ++ H264.encodePps() ++
        H264Cavlc.encodeIntra16Frame(wMbs, hMus, dc, qp, idrPicId = trial,
          cbDc = cb, crDc = cr)
      val frames = H264Cavlc.decodeIntra16FramesYuv(es)
      assert(frames.size === 1)
      val (w, h, luma, cbP, crP) = frames.head
      assert(w === 32 && h === 32)
      assert(cbP.length === 16 * 16 && crP.length === 16 * 16)
      assert(luma.toSeq === referenceFrame(wMbs, hMus, dc, qp).toSeq)
      assert(cbP.toSeq === referenceChromaPlane(wMbs, hMus, cb, qp).toSeq)
      assert(crP.toSeq === referenceChromaPlane(wMbs, hMus, cr, qp).toSeq)
    }
  }

  test("mb_type 3 streams decode flat-128 chroma through the YUV API") {
    val dc = Array.fill(1)(Array.tabulate(4, 4)((i, j) => i - j))
    val es = H264.encodeSps(1, 1, 0) ++ H264.encodePps() ++
      H264Cavlc.encodeIntra16Frame(1, 1, dc, qp = 24)
    val frames = H264Cavlc.decodeIntra16FramesYuv(es)
    assert(frames.size === 1)
    val (_, _, luma, cbP, crP) = frames.head
    assert(luma.toSeq === referenceFrame(1, 1, dc, 24).toSeq)
    assert(cbP.forall(b => (b & 0xFF) == 128))
    assert(crP.forall(b => (b & 0xFF) == 128))
  }

  test("Intra16x16AC residuals reconstruct against the longhand reference " +
      "(single-coefficient blocks across positions, signs, QPs)") {
    val rnd = new scala.util.Random(2026L)
    for (qp <- Seq(10, 24, 30, 38, 51); trial <- 0 until 6) {
      val (wMbs, hMus) = (2, 2)
      val dc = Array.fill(wMbs * hMus)(Array.fill(4, 4)(rnd.nextInt(9) - 4))
      // one nonzero AC level per block at most (some blocks zero):
      // every neighbour TotalCoeff sum stays <= 2, so the stream lives
      // inside the conformance-pinned nC < 2 coeff_token column while
      // still exercising all 15 scan positions, both signs, level
      // magnitudes past the trailing-one range, total_zeros and the
      // position-classed dequant + full butterfly
      val ac = Array.fill(wMbs * hMus)(Array.tabulate(16) { _ =>
        val a = new Array[Int](15)
        if (rnd.nextInt(5) > 0) {
          val mag = 1 + rnd.nextInt(6)
          a(rnd.nextInt(15)) = if (rnd.nextBoolean()) mag else -mag
        }
        a
      })
      val es = H264.encodeSps(wMbs, hMus, 0) ++ H264.encodePps() ++
        H264Cavlc.encodeIntra16Frame(wMbs, hMus, dc, qp, idrPicId = trial,
          acLevels = ac)
      val frames = H264Cavlc.decodeIntra16Frames(es)
      assert(frames.size === 1)
      assert(frames.head._3.toSeq ===
        referenceFrame(wMbs, hMus, dc, qp, ac = ac).toSeq)
    }
  }

  test("mixed CodedBlockPatternLuma: AC MBs chain with DC-only MBs " +
      "and with non-DC prediction modes") {
    val rnd = new scala.util.Random(99L)
    val (wMbs, hMus) = (3, 1)
    val dc = Array.fill(3)(Array.fill(4, 4)(rnd.nextInt(7) - 3))
    val ac = Array.tabulate(3) { mb =>
      Array.tabulate(16) { blk =>
        val a = new Array[Int](15)
        // MB1 all-zero -> emitted as CodedBlockPatternLuma = 0
        if (mb != 1) a((mb * 3 + blk) % 15) = (blk % 3) - 1
        a
      }
    }
    // MB1/MB2 use horizontal prediction: their predictors read MB0's
    // AC-reconstructed right edge, so the chain breaks if either the
    // CBP-0 passthrough or the AC reconstruction drifts
    val modes = Array(2, 1, 1)
    val es = H264.encodeSps(wMbs, hMus, 0) ++ H264.encodePps() ++
      H264Cavlc.encodeIntra16Frame(wMbs, hMus, dc, qp = 24,
        predModes = modes, acLevels = ac)
    val frames = H264Cavlc.decodeIntra16Frames(es)
    assert(frames.size === 1)
    assert(frames.head._3.toSeq ===
      referenceFrame(wMbs, hMus, dc, 24, modes = modes, ac = ac).toSeq)
  }

  test("ChromaACLevel (CBP chroma 2) reconstructs against the longhand " +
      "reference across positions, signs, QPs") {
    val rnd = new scala.util.Random(4242L)
    for (qp <- Seq(10, 24, 30, 38, 51); trial <- 0 until 4) {
      val (wMbs, hMus) = (2, 2)
      val dc = Array.fill(wMbs * hMus)(Array.fill(4, 4)(rnd.nextInt(9) - 4))
      val cb = Array.fill(wMbs * hMus)(Array.fill(2, 2)(rnd.nextInt(7) - 3))
      val cr = Array.fill(wMbs * hMus)(Array.fill(2, 2)(rnd.nextInt(7) - 3))
      def oneAc() = Array.fill(wMbs * hMus)(Array.tabulate(4) { _ =>
        val a = new Array[Int](15)
        if (rnd.nextInt(4) > 0) { // <=1 nonzero per block: nC stays < 2
          val mag = 1 + rnd.nextInt(5)
          a(rnd.nextInt(15)) = if (rnd.nextBoolean()) mag else -mag
        }
        a
      })
      val cbAc = oneAc(); val crAc = oneAc()
      val es = H264.encodeSps(wMbs, hMus, 0) ++ H264.encodePps() ++
        H264Cavlc.encodeIntra16Frame(wMbs, hMus, dc, qp, idrPicId = trial,
          cbDc = cb, crDc = cr, cbAc = cbAc, crAc = crAc)
      val frames = H264Cavlc.decodeIntra16FramesYuv(es)
      assert(frames.size === 1)
      val (_, _, luma, cbP, crP) = frames.head
      assert(luma.toSeq === referenceFrame(wMbs, hMus, dc, qp).toSeq)
      assert(cbP.toSeq ===
        referenceChromaPlane(wMbs, hMus, cb, qp, ac = cbAc).toSeq)
      assert(crP.toSeq ===
        referenceChromaPlane(wMbs, hMus, cr, qp, ac = crAc).toSeq)
    }
  }

  test("all Table 9-5 luma columns are prefix-free with distinct codes") {
    // a single mis-transcribed bit that collides with or prefixes
    // another code would make some bitstream undecodable or ambiguous;
    // every column must be a valid prefix code
    val cols = H264Cavlc.lumaCoeffTokenColumns :+
      H264Cavlc.chromaDcCoeffTokenColumn
    for ((tab, ci) <- cols.zipWithIndex) {
      val codes = tab.flatten.filter(_ >= 0).map { p =>
        val len = p >>> 16
        val bits = p & 0xFFFF
        String.format("%" + len + "s", Integer.toBinaryString(bits))
          .replace(' ', '0')
      }
      assert(codes.distinct.length === codes.length, s"column $ci duplicates")
      for (a <- codes; b <- codes if a != b)
        assert(!b.startsWith(a), s"column $ci: '$a' prefixes '$b'")
    }
  }

  test("new Table 9-5 columns match an independently transcribed length profile") {
    // the code LENGTHS of Table 9-5 as transcribed separately (4
    // entries per TotalCoeff row: TrailingOnes 0..3, 0 = impossible).
    // Two independent transcriptions of the spec agreeing on all 62
    // entries per column is the strongest cross-check available —
    // unlike the nC < 2 column, no worked-example bitstring for these
    // columns is published to pin single codes externally.
    val len24 = Array(
      2, 0, 0, 0, 6, 2, 0, 0, 6, 5, 3, 0, 7, 6, 6, 4,
      8, 6, 6, 4, 8, 7, 7, 5, 9, 8, 8, 6, 11, 9, 9, 6,
      11, 11, 11, 7, 12, 11, 11, 9, 12, 12, 12, 11, 12, 12, 12, 11,
      13, 13, 13, 12, 13, 13, 13, 13, 13, 14, 13, 13, 14, 14, 14, 13,
      14, 14, 14, 14)
    val len48 = Array(
      4, 0, 0, 0, 6, 4, 0, 0, 6, 5, 4, 0, 6, 5, 5, 4,
      7, 5, 5, 4, 7, 5, 5, 4, 7, 6, 6, 4, 7, 6, 6, 4,
      8, 7, 7, 5, 8, 8, 7, 6, 9, 8, 8, 7, 9, 9, 8, 8,
      9, 9, 9, 8, 10, 9, 9, 9, 10, 10, 10, 10, 10, 10, 10, 10,
      10, 10, 10, 10)
    val Seq(_, t24, t48, flc) = H264Cavlc.lumaCoeffTokenColumns
    for ((tab, lens) <- Seq((t24, len24), (t48, len48)); tc <- 0 to 16;
        t1 <- 0 to 3) {
      val want = lens(4 * tc + t1)
      val got = tab(t1)(tc)
      if (want == 0) assert(got === -1, s"(t1=$t1, tc=$tc) should be absent")
      else assert(got >>> 16 === want,
        s"(t1=$t1, tc=$tc): len ${got >>> 16}, expected $want")
    }
    // FLC column: 6-bit codes, value ((tc-1) << 2) | t1, tc=0 -> 3
    assert(flc(0)(0) === ((6 << 16) | 3))
    for (tc <- 1 to 16; t1 <- 0 to math.min(3, tc))
      assert(flc(t1)(tc) === ((6 << 16) | (((tc - 1) << 2) | t1)),
        s"FLC (t1=$t1, tc=$tc)")
  }

  test("block round-trip through every nC column") {
    val rnd = new scala.util.Random(20260815L)
    for (nC <- Seq(0, 1, 2, 3, 4, 7, 8, 16); trial <- 0 until 400) {
      val scan = new Array[Int](16)
      val nnz = rnd.nextInt(17)
      rnd.shuffle((0 until 16).toList).take(nnz).foreach { p =>
        val mag = rnd.nextInt(3) match {
          case 0 => 1
          case 1 => 1 + rnd.nextInt(5)
          case _ => 1 + rnd.nextInt(500)
        }
        scan(p) = if (rnd.nextBoolean()) mag else -mag
      }
      val w = new H264.BitWriter
      H264Cavlc.encodeBlockNc(scan, nC, w)
      w.u(1, 1)
      val r = new H264.BitReader(w.trailing())
      assert(H264Cavlc.decodeBlockNc(r, nC).toSeq === scan.toSeq,
        s"nC=$nC trial=$trial")
    }
  }

  test("dense neighbours reconstruct: fixtures crossing nC 2/4/8 both ways") {
    // graded density drives the 9.2.1 neighbour average through every
    // Table 9-5 column and back down: blocks with 0, 2, 5 and 12
    // nonzero AC levels give nC values on both sides of each boundary
    // within one picture. Reconstruction is checked against the
    // longhand referenceFrame path, which never touches the VLC
    // tables — a wrong code would desync the bit reader and corrupt
    // the comparison.
    val rnd = new scala.util.Random(77L)
    for (qp <- Seq(18, 30, 44); trial <- 0 until 4) {
      val (wMbs, hMus) = (2, 2)
      val dc = Array.fill(wMbs * hMus)(Array.fill(4, 4)(rnd.nextInt(9) - 4))
      val density = Array(12, 5, 2, 0) // per-MB block density classes
      val ac = Array.tabulate(wMbs * hMus) { mb =>
        Array.tabulate(16) { blk =>
          val a = new Array[Int](15)
          val n = density((mb + blk) % 4)
          rnd.shuffle((0 until 15).toList).take(n).foreach { p =>
            a(p) = (if (rnd.nextBoolean()) 1 else -1) * (1 + rnd.nextInt(4))
          }
          a
        }
      }
      val es = H264.encodeSps(wMbs, hMus, 0) ++ H264.encodePps() ++
        H264Cavlc.encodeIntra16Frame(wMbs, hMus, dc, qp, idrPicId = trial,
          acLevels = ac)
      val frames = H264Cavlc.decodeIntra16Frames(es)
      assert(frames.size === 1)
      assert(frames.head._3.toSeq ===
        referenceFrame(wMbs, hMus, dc, qp, ac = ac).toSeq)
    }
  }

  test("saturated residuals reach the nC >= 8 FLC column and reconstruct") {
    // every block carries 14-15 nonzero levels: by the second block
    // row the neighbour average is >= 8 in both luma and chroma-AC
    // grids, so the FLC column carries real traffic
    val rnd = new scala.util.Random(88L)
    val (wMbs, hMus) = (2, 2)
    val dc = Array.fill(wMbs * hMus)(Array.fill(4, 4)(rnd.nextInt(5) - 2))
    val ac = Array.fill(wMbs * hMus)(Array.tabulate(16) { _ =>
      Array.tabulate(15)(_ =>
        (if (rnd.nextBoolean()) 1 else -1) * (1 + rnd.nextInt(3)))
    })
    val cb = Array.fill(wMbs * hMus)(Array.fill(2, 2)(rnd.nextInt(5) - 2))
    val cr = Array.fill(wMbs * hMus)(Array.fill(2, 2)(rnd.nextInt(5) - 2))
    def denseChroma() = Array.fill(wMbs * hMus)(Array.tabulate(4) { _ =>
      Array.tabulate(15)(_ =>
        (if (rnd.nextBoolean()) 1 else -1) * (1 + rnd.nextInt(2)))
    })
    val cbAc = denseChroma(); val crAc = denseChroma()
    val es = H264.encodeSps(wMbs, hMus, 0) ++ H264.encodePps() ++
      H264Cavlc.encodeIntra16Frame(wMbs, hMus, dc, qp = 28,
        cbDc = cb, crDc = cr, cbAc = cbAc, crAc = crAc, acLevels = ac)
    val frames = H264Cavlc.decodeIntra16FramesYuv(es)
    assert(frames.size === 1)
    val (_, _, luma, cbP, crP) = frames.head
    assert(luma.toSeq === referenceFrame(wMbs, hMus, dc, 28, ac = ac).toSeq)
    assert(cbP.toSeq ===
      referenceChromaPlane(wMbs, hMus, cb, 28, ac = cbAc).toSeq)
    assert(crP.toSeq ===
      referenceChromaPlane(wMbs, hMus, cr, 28, ac = crAc).toSeq)
  }

  test("multi-slice pictures: availability stops at the slice boundary " +
      "and each slice re-anchors QPy") {
    // 2x2 MBs, DC prediction, slices {MB0,MB1} and {MB2,MB3}. In the
    // two-slice picture MB2 must NOT see MB0 above it (other slice:
    // pred falls back to 128) and MB3 must predict from MB2 only; the
    // single-slice picture chains through all four. Uniform per-MB
    // values make both expectations closed-form.
    val dcs = Seq(3, -5, 6, -2)
    val dc = dcs.map { a =>
      val m = Array.fill(4, 4)(0); m(0)(0) = a; m
    }.toArray
    def r(a: Int) = ((40 * a + 32 + 6400) >> 6) - 100
    def clip(v: Int) = math.max(0, math.min(255, v))
    val es2 = H264.encodeSps(2, 2, 0) ++ H264.encodePps() ++
      H264Cavlc.encodeIntra16Frame(2, 2, dc, qp = 24,
        sliceStarts = Array(0, 2))
    val fr2 = H264Cavlc.decodeIntra16Frames(es2)
    assert(fr2.size === 1)
    val y2 = fr2.head._3
    val v0 = clip(128 + r(dcs(0)))
    val v1 = clip(v0 + r(dcs(1)))
    val v2 = clip(128 + r(dcs(2))) // NOT clip(v0 + r2): slice boundary
    val v3 = clip(v2 + r(dcs(3))) // left (same slice) only
    def px(mx: Int, my: Int) = y2((my * 16 + 8) * 32 + mx * 16 + 8) & 0xFF
    assert((px(0, 0), px(1, 0), px(0, 1), px(1, 1)) === (v0, v1, v2, v3))
    assert(y2.toSeq.map(_ & 0xFF).distinct.sorted ===
      Seq(v0, v1, v2, v3).distinct.sorted)
    // the single-slice decode of the same levels differs at MB2/MB3
    val es1 = H264.encodeSps(2, 2, 0) ++ H264.encodePps() ++
      H264Cavlc.encodeIntra16Frame(2, 2, dc, qp = 24)
    val y1 = H264Cavlc.decodeIntra16Frames(es1).head._3
    val v2s = clip(v0 + r(dcs(2)))
    assert((y1((24) * 32 + 8) & 0xFF) === v2s)
    assert(v2s !== v2)
  }

  test("multi-slice with AC residuals: nC grids respect the boundary; " +
      "three-slice tiling round-trips") {
    val rnd = new scala.util.Random(777L)
    val (wMbs, hMus) = (3, 2)
    val dc = Array.fill(6)(Array.fill(4, 4)(rnd.nextInt(7) - 3))
    val ac = Array.fill(6)(Array.tabulate(16) { _ =>
      val a = new Array[Int](15)
      if (rnd.nextInt(3) > 0) a(rnd.nextInt(15)) = rnd.nextInt(7) - 3
      a
    })
    val es = H264.encodeSps(wMbs, hMus, 0) ++ H264.encodePps() ++
      H264Cavlc.encodeIntra16Frame(wMbs, hMus, dc, qp = 24,
        acLevels = ac, sliceStarts = Array(0, 2, 4))
    val frames = H264Cavlc.decodeIntra16Frames(es)
    assert(frames.size === 1 && frames.head._1 === 48)
    // decode must consume every slice's MBs exactly once — a dropped
    // slice is an incomplete picture, a leading non-zero slice is
    // rejected
    val nals = H264.nalUnits(es)
    assert(nals.count(_._2 == 5) === 3)
    val ex = intercept[IllegalArgumentException] {
      // rebuild the raw stream without the middle slice NAL: split on
      // start codes, drop the 4th unit (SPS, PPS, slice0, slice1,
      // slice2)
      val starts = (0 until es.length - 3).filter(i =>
        es(i) == 0 && es(i + 1) == 0 &&
          (es(i + 2) == 1 || (es(i + 2) == 0 && i + 3 < es.length && es(i + 3) == 1)))
        .foldLeft(List.empty[Int])((acc, i) =>
          if (acc.nonEmpty && i - acc.head < 3) acc else i :: acc)
        .reverse
      assert(starts.length === 5)
      val units = starts.zipAll(starts.drop(1), -1, es.length).map {
        case (a, b) => es.slice(a, b)
      }
      H264Cavlc.decodeIntra16Frames(
        (units.take(3) ++ units.drop(4)).flatten.toArray)
    }
    assert(ex.getMessage.contains("tile") || ex.getMessage.contains("incomplete"))
  }

  test("I_PCM frames decode bit-exactly in the general path (r15: in subset)") {
    // I_PCM joined the decode subset with the P-slice work (it is the
    // conformance suite's bit-exact reference picture); the general
    // path must reproduce the raw samples untouched.
    val plane = Array.tabulate(16 * 16)(i => (i % 256).toByte)
    val es = H264.encodeSps(1, 1, 0) ++ H264.encodePps() ++
      H264.encodeIPcmFrame(1, 1, plane)
    val fr = H264Cavlc.decodeIntra16Frames(es)
    assert(fr.size === 1)
    assert(fr.head._3.toSeq === plane.toSeq)
  }

  test("streams outside the decode subset still fail loudly") {
    // mb_type 26 does not exist in an I slice (Table 7-11 ends at 25)
    val w = new graft.operators.H264.BitWriter
    w.ue(0); w.ue(7); w.ue(0) // first_mb, slice_type I, pps id
    w.u(0, 8); w.ue(0) // frame_num, idr_pic_id
    w.u(0, 1); w.u(0, 1) // dec_ref_pic_marking
    w.se(0) // slice_qp_delta
    w.ue(26) // bogus mb_type
    val bad = H264.encodeSps(1, 1, 0) ++ H264.encodePps() ++
      (Array[Byte](0, 0, 1, 0x65.toByte) ++ H264.rbspToEbsp(w.trailing()))
    val ex = intercept[IllegalArgumentException] {
      H264Cavlc.decodeIntra16Frames(bad)
    }
    assert(ex.getMessage.contains("mb_type"))
  }
}
