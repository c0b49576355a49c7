package graft

import graft.operators.{H264, H264Cavlc}
import org.scalatest.funsuite.AnyFunSuite

/** Conformance for constrained_intra_pred (PPS flag, clause 8.3):
  * intra prediction in P/B slices treats INTER-coded neighbours as
  * unavailable — reference samples and the Intra_NxN most-probable-
  * mode — while nC (9.2.1) keeps the plain same-slice availability
  * (its constrained-intra special case requires slice data
  * partitioning, outside the subset).
  *
  * Method: the SAME slice payload bytes are decoded under two PPS
  * that differ only in the flag. Predictions may move; the parse must
  * not — which is exactly what the dense-neighbour nC test pins (a
  * decoder that wrongly constrained nC would pick a different Table
  * 9-5 column than the encoder and desync loudly).
  *
  * Subset note: fixture-reachable constrained paths are I_16x16 luma
  * DC + chroma DC (P kind 2 / B kind 3) and, via P kind 6 (all-DC
  * cbp-0 I_4x4), the I_4x4 SAMPLE availability. The I_4x4/I_8x8 MPM
  * sites take the same predicate but are semantically inert under it:
  * an inter neighbour predicts as DC whether it is excluded by the
  * flag or merely recorded as a non-I_NxN cell, so no stream can
  * distinguish the two rules there. I_8x8 sample availability shares
  * the I_4x4 code shape and stays encoder-unreachable in P/B. */
class H264ConstrainedIntraSpec extends AnyFunSuite {

  private def dcArr(v: Int): Array[Array[Int]] = {
    val d = Array.ofDim[Int](4, 4)
    d(0)(0) = v
    d
  }

  private def decode(es: Array[Byte]) =
    H264Cavlc.decodeIntra16FramesYuv(es)

  test("P-slice intra I_16x16: constrained flag flips the DC source " +
    "from the inter neighbour to 128, luma and both chroma components") {
    // IDR MB0 dc 4 -> va = 128 + (160*4+32)>>6 = 138; P = [P_L0 mv
    // (0,0) with chroma DC residuals (+8 Cb, +12 Cr at QP 36) |
    // I_16x16_2_0_0]
    val sps = H264.encodeSps(2, 1, 0)
    val idr = H264Cavlc.encodeIntra16Frame(2, 1,
      Array(dcArr(4), dcArr(0)), qp = 36, idrPicId = 7)
    val cbDc = Array(Array(Array(2, 0), Array(0, 0)),
      Array(Array(0, 0), Array(0, 0)))
    val crDc = Array(Array(Array(3, 0), Array(0, 0)),
      Array(Array(0, 0), Array(0, 0)))
    val pf = H264Cavlc.encodePFrame(2, 1,
      Array(0, 2), Array(Array(Array(0, 0)), Array[Array[Int]]()),
      Array.fill(2)(Array.fill(16)(new Array[Int](16))),
      qp = 36, frameNum = 1, cbDc = cbDc, crDc = crDc)
    def frame(constrained: Boolean) = {
      val pps = H264.encodePps(constrainedIntra = constrained)
      val fr = decode(sps ++ pps ++ idr ++ pf)
      assert(fr.size == 2)
      fr(1)
    }
    val (_, _, yu, cbu, cru) = frame(false)
    val (_, _, yc, cbc, crc) = frame(true)
    // unconstrained: the whole luma plane is 138 (inter copy + intra
    // DC prediction off it); chroma follows the inter MB's residual
    assert(yu.forall(b => (b & 0xFF) == 138))
    for (y <- 0 until 8; x <- 0 until 16) {
      assert((cbu(y * 16 + x) & 0xFF) == 136, s"U Cb ($x,$y)")
      assert((cru(y * 16 + x) & 0xFF) == 140, s"U Cr ($x,$y)")
    }
    // constrained: the inter half is untouched, the intra half falls
    // back to the no-neighbour default on all three components
    for (y <- 0 until 16; x <- 0 until 32) {
      val want = if (x < 16) 138 else 128
      assert((yc(y * 32 + x) & 0xFF) == want, s"C luma ($x,$y)")
    }
    for (y <- 0 until 8; x <- 0 until 16) {
      assert((cbc(y * 16 + x) & 0xFF) == (if (x < 8) 136 else 128),
        s"C Cb ($x,$y)")
      assert((crc(y * 16 + x) & 0xFF) == (if (x < 8) 140 else 128),
        s"C Cr ($x,$y)")
    }
  }

  test("nC is NOT constrained: a dense inter neighbour still feeds the " +
    "intra macroblock's coeff_token column selection") {
    // MB0's right-column blocks (5/7/13/15) carry TWO coefficients
    // each, so MB1's Intra16x16DCLevel decodes with nC = 2 — the
    // CoeffToken24 column. The encoder's nC mirror always uses plain
    // availability; a decoder that constrained nC would read nC = 0
    // under the flag, pick the wrong Table 9-5 column, and desync.
    val sps = H264.encodeSps(2, 1, 0)
    val idr = H264Cavlc.encodeIntra16Frame(2, 1,
      Array(dcArr(4), dcArr(0)), qp = 36, idrPicId = 8)
    val coeffs = Array.fill(2)(Array.fill(16)(new Array[Int](16)))
    Seq(5, 7, 13, 15).foreach { blk =>
      coeffs(0)(blk)(0) = 3
      coeffs(0)(blk)(1) = 2
    }
    val pf = H264Cavlc.encodePFrame(2, 1,
      Array(0, 2), Array(Array(Array(0, 0)), Array[Array[Int]]()),
      coeffs, qp = 36, frameNum = 1)
    def lumaOf(constrained: Boolean) = {
      val pps = H264.encodePps(constrainedIntra = constrained)
      decode(sps ++ pps ++ idr ++ pf)(1)._3
    }
    val yc = lumaOf(true)
    // constrained: the intra half is exactly 128 whatever the (now
    // non-flat) inter neighbour reconstructs to
    for (y <- 0 until 16; x <- 16 until 32)
      assert((yc(y * 32 + x) & 0xFF) == 128, s"C luma ($x,$y)")
    // and the same bytes carry a REAL neighbour signal: unconstrained,
    // the DC prediction is the (residual-shifted) right-edge mean
    val yu = lumaOf(false)
    assert((yu(16) & 0xFF) != 128, "unconstrained prediction should " +
      "read the inter neighbour's reconstruction")
  }

  test("P-slice I_4x4: constrained sample availability reaches the " +
    "NxN path (all-DC I_4x4 macroblock beside an inter neighbour)") {
    // kind 6: I_4x4, every block mode DC, cbp 0. The 8.3.1.1 MPM is
    // DC under every availability rule here (inter/unavailable
    // neighbours predict as DC and every coded cell IS DC), so the
    // SAME bytes decode under both flags and only the per-block DC
    // SAMPLE availability moves: unconstrained, block (0,0) reads the
    // inter MB's right edge and the rest chain off it -> all va;
    // constrained, block (0,0) has no usable neighbour -> 128, and
    // the within-MB chain (never constrained) spreads 128.
    val sps = H264.encodeSps(2, 1, 0)
    val idr = H264Cavlc.encodeIntra16Frame(2, 1,
      Array(dcArr(4), dcArr(0)), qp = 36, idrPicId = 11)
    val pf = H264Cavlc.encodePFrame(2, 1,
      Array(0, 6), Array(Array(Array(0, 0)), Array[Array[Int]]()),
      Array.fill(2)(Array.fill(16)(new Array[Int](16))),
      qp = 36, frameNum = 1)
    def luma(constrained: Boolean) = {
      val pps = H264.encodePps(constrainedIntra = constrained)
      val fr = decode(sps ++ pps ++ idr ++ pf)
      assert(fr.size == 2)
      fr(1)._3
    }
    val yu = luma(false)
    val yc = luma(true)
    for (y <- 0 until 16; x <- 0 until 32) {
      assert((yu(y * 32 + x) & 0xFF) == 138, s"U ($x,$y)")
      assert((yc(y * 32 + x) & 0xFF) == (if (x < 16) 138 else 128),
        s"C ($x,$y)")
    }
  }

  test("randomized P pictures mixing inter copies, I_16x16 and I_4x4 " +
    "reconstruct against a longhand model under BOTH flag settings") {
    // Differential interaction fuzz: a random I_PCM reference, then a
    // P picture whose macroblocks are randomly P_L0 (random full-pel
    // MV, no residual), I_16x16_2_0_0, or the all-DC I_4x4 (kind 6),
    // decoded with constrained_intra_pred 0 AND 1. The expected luma
    // is rebuilt here from first principles: inter MBs are clamped
    // reference copies; intra MBs run the 8.3 DC rules with
    // availability = same-picture raster order, gated on neighbour
    // intra-ness only under the flag. Any desync between the three
    // kinds' bitstream layouts, the per-kind grids (refG/i4/tcGrid),
    // or the two availability predicates shifts some pixel.
    val rnd = new scala.util.Random(20260816L)
    val (wMbs, hMbs) = (3, 2)
    val w16 = wMbs * 16
    val h16 = hMbs * 16
    val n = wMbs * hMbs
    def zIdx(cx: Int, cy: Int): Int = { // inverse of Blk4x4Pos
      var b = 0
      while (b < 16) {
        val ox = ((b >> 2) & 1) * 8 + (b & 1) * 4
        val oy = ((b >> 3) & 1) * 8 + ((b >> 1) & 1) * 4
        if (ox / 4 == cx && oy / 4 == cy) return b
        b += 1
      }
      -1
    }
    for (iter <- 0 until 10) {
      val fA = Array.fill(w16 * h16)(rnd.nextInt(256))
      val kinds = Array.fill(n)(Seq(0, 2, 6)(rnd.nextInt(3)))
      if (!kinds.contains(0)) kinds(0) = 0 // keep an inter MB around
      val mvs = Array.tabulate(n)(m =>
        if (kinds(m) == 0)
          Array(Array(4 * rnd.between(-6, 7), 4 * rnd.between(-6, 7)))
        else Array[Array[Int]]())
      val zero = Array.fill(n)(Array.fill(16)(new Array[Int](16)))
      val es = H264.encodeSps(wMbs, hMbs, 0) ++
        H264.encodeIPcmFrame(wMbs, hMbs, fA.map(_.toByte), frameNum = 0) ++
        H264Cavlc.encodePFrame(wMbs, hMbs, kinds, mvs, zero, qp = 30,
          frameNum = 1)
      for (con <- Seq(false, true)) {
        val pps = H264.encodePps(constrainedIntra = con)
        // PPS between SPS and slices: splice it in
        val sps = H264.encodeSps(wMbs, hMbs, 0)
        val stream = sps ++ pps ++ es.drop(sps.length)
        val fr = decode(stream)
        assert(fr.size == 2, s"iter $iter con=$con")
        val got = fr(1)._3.map(_ & 0xFF)
        // longhand expected luma
        val exp = new Array[Int](w16 * h16)
        val isIntra = kinds.map(_ != 0)
        def predOK(nm: Int): Boolean = !con || isIntra(nm)
        for (m <- 0 until n) {
          val mbX = m % wMbs
          val mbY = m / wMbs
          kinds(m) match {
            case 0 =>
              val mvx = mvs(m)(0)(0) / 4
              val mvy = mvs(m)(0)(1) / 4
              for (y <- 0 until 16; x <- 0 until 16) {
                val sx = math.max(0, math.min(w16 - 1, mbX * 16 + x + mvx))
                val sy = math.max(0, math.min(h16 - 1, mbY * 16 + y + mvy))
                exp((mbY * 16 + y) * w16 + mbX * 16 + x) = fA(sy * w16 + sx)
              }
            case 2 =>
              val leftAv = mbX > 0 && predOK(m - 1)
              val topAv = mbY > 0 && predOK(m - wMbs)
              var s = 0
              if (leftAv) for (y <- 0 until 16)
                s += exp((mbY * 16 + y) * w16 + mbX * 16 - 1)
              if (topAv) for (x <- 0 until 16)
                s += exp((mbY * 16 - 1) * w16 + mbX * 16 + x)
              val dc =
                if (leftAv && topAv) (s + 16) >> 5
                else if (leftAv || topAv) (s + 8) >> 4
                else 128
              for (y <- 0 until 16; x <- 0 until 16)
                exp((mbY * 16 + y) * w16 + mbX * 16 + x) = dc
            case _ => // kind 6: all-DC I_4x4, cbp 0, z-scan order
              def sAv(px: Int, py: Int, curBlk: Int): Boolean =
                px >= 0 && py >= 0 && px < w16 && py < h16 && {
                  val bmx = px / 16
                  val bmy = py / 16
                  if (bmy * wMbs + bmx == m)
                    zIdx((px % 16) / 4, (py % 16) / 4) < curBlk
                  else predOK(bmy * wMbs + bmx)
                }
              for (blk <- 0 until 16) {
                val ox = ((blk >> 2) & 1) * 8 + (blk & 1) * 4
                val oy = ((blk >> 3) & 1) * 8 + ((blk >> 1) & 1) * 4
                val gx = mbX * 16 + ox
                val gy = mbY * 16 + oy
                val leftAv = sAv(gx - 1, gy, blk)
                val topAv = sAv(gx, gy - 1, blk)
                var s = 0
                if (leftAv) for (y <- 0 until 4)
                  s += exp((gy + y) * w16 + gx - 1)
                if (topAv) for (x <- 0 until 4)
                  s += exp((gy - 1) * w16 + gx + x)
                val dc =
                  if (leftAv && topAv) (s + 4) >> 3
                  else if (leftAv || topAv) (s + 2) >> 2
                  else 128
                for (y <- 0 until 4; x <- 0 until 4)
                  exp((gy + y) * w16 + gx + x) = dc
              }
          }
        }
        for (i <- 0 until w16 * h16)
          assert(got(i) == exp(i),
            s"iter $iter con=$con pixel (${i % w16}, ${i / w16}) " +
              s"kinds=${kinds.mkString(",")}")
      }
    }
  }

  test("B-slice intra I_16x16 honours the flag too") {
    // I (flat 138) -> P (copies) -> B = [B_L0 mv (0,0) | intra]
    val sps = H264.encodeSps(2, 1, 0, numRefFrames = 2)
    val idr = H264Cavlc.encodeIntra16Frame(2, 1,
      Array(dcArr(4), dcArr(4)), qp = 36, idrPicId = 9)
    val pKinds = Array(0, 0)
    val pMvs = Array.tabulate(2)(_ => Array(Array(0, 0)))
    val pCoeffs = Array.fill(2)(Array.fill(16)(new Array[Int](16)))
    val pf = H264Cavlc.encodePFrame(2, 1, pKinds, pMvs, pCoeffs,
      qp = 36, frameNum = 1)
    val bKinds = Array(0, 3) // B_L0_16x16 | intra
    val bMvs0 = Array(Array(0, 0), Array(0, 0))
    val bMvs1 = Array(Array(0, 0), Array(0, 0))
    val bCoeffs = Array.fill(2)(Array.fill(16)(new Array[Int](16)))
    val bf = H264Cavlc.encodeBFrame(2, 1, bKinds, bMvs0, bMvs1, bCoeffs,
      qp = 36, frameNum = 2)
    def bLuma(constrained: Boolean) = {
      val pps = H264.encodePps(constrainedIntra = constrained)
      val fr = decode(sps ++ pps ++ idr ++ pf ++ bf)
      assert(fr.size == 3)
      fr(2)._3
    }
    val yu = bLuma(false)
    val yc = bLuma(true)
    // IDR MB1's dc 4 chains off MB0: 138 + 10 = 148 — the B intra MB
    // reads its LEFT neighbour (the B_L0 copy of MB0 = 138) when
    // unconstrained, 128 when constrained
    for (y <- 0 until 16; x <- 16 until 32) {
      assert((yu(y * 32 + x) & 0xFF) == 138, s"U B luma ($x,$y)")
      assert((yc(y * 32 + x) & 0xFF) == 128, s"C B luma ($x,$y)")
    }
  }
}
