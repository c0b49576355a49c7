package graft

import graft.operators.{H264, H264Cavlc, H264Deblock}
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Conformance for the 8.7 in-loop deblocking filter.
  *
  * Method: every fixture is encoded TWICE — once with
  * disable_deblocking_filter_idc = 1 (filter off; the decode is the
  * pre-filter picture) and once with the idc under test. A longhand
  * reference filter written straight from spec text — own edge walk,
  * own boundary-strength derivation (8.7.2.1), own filterSamplesFlag
  * and strong/normal sample equations (8.7.2.3/8.7.2.4), own
  * sequential in-place macroblock order — is applied to the
  * pre-filter decode and must match the filter-enabled decode
  * bit-exactly, luma and both chroma planes. The entropy/recon
  * decoder is identical in both decodes (pinned by its own suites),
  * so the comparison isolates exactly the filter.
  *
  * The alpha/beta constant tables are SHARED DATA read through
  * H264Deblock.tableRow by declared policy — no independent source
  * exists in this environment; their values are pinned separately by
  * the generator-law property test at the bottom and, for alpha(36),
  * end-to-end by the m33 DuckDB oracle. tC0 additionally has an
  * INDEPENDENT entry-by-entry transcription pinned in the final test
  * (two transcriptions reconciled — see the provenance note in
  * H264Deblock) and rides the oracle-gated m39 fixture live. All
  * logic around the tables is re-derived here. */
class H264DeblockSpec extends AnyFunSuite {

  private def alphaT(i: Int) = H264Deblock.tableRow(i)._1
  private def betaT(i: Int) = H264Deblock.tableRow(i)._2
  private def tc0T(i: Int, bS: Int) = bS match {
    case 1 => H264Deblock.tableRow(i)._3
    case 2 => H264Deblock.tableRow(i)._4
    case _ => H264Deblock.tableRow(i)._5
  }
  private def clip3(a: Int, b: Int, x: Int) = math.max(a, math.min(b, x))
  private def clip1(x: Int) = clip3(0, 255, x)

  // ------------------------------------------------------------------
  // Longhand reference, written from the spec clauses named inline.
  // ------------------------------------------------------------------

  /** Fixture-derived view of one macroblock for bS derivation:
    * `coded(cx, cy)` = the 4x4 luma block at MB-relative cell (cx, cy)
    * carries non-zero coefficient levels; `preds(cx, cy)` = the list
    * of (dpbSlot, mvx, mvy) predictions of that cell (empty = intra
    * never consulted). */
  private case class RefMb(intra: Boolean, qp: Int,
      coded: (Int, Int) => Boolean,
      preds: (Int, Int) => List[(Int, Int, Int)])

  /** 8.7.2.1 (frame pictures): boundary strength between the 4x4
    * blocks holding p0 and q0. */
  private def refBs(p: RefMb, q: RefMb, pCell: (Int, Int),
      qCell: (Int, Int), mbEdge: Boolean): Int = {
    if (p.intra || q.intra) { if (mbEdge) 4 else 3 }
    else if (p.coded(pCell._1, pCell._2) || q.coded(qCell._1, qCell._2)) 2
    else {
      val pp = p.preds(pCell._1, pCell._2)
      val qq = q.preds(qCell._1, qCell._2)
      def differ(a: (Int, Int, Int), b: (Int, Int, Int)) =
        math.abs(a._2 - b._2) >= 4 || math.abs(a._3 - b._3) >= 4
      if (pp.size != qq.size) 1
      else if (pp.size == 1) {
        if (pp.head._1 != qq.head._1 || differ(pp.head, qq.head)) 1 else 0
      } else {
        if (pp.map(_._1).sorted != qq.map(_._1).sorted) 1
        else if (pp(0)._1 != pp(1)._1) {
          // distinct pictures: pair by picture
          val qByPic = qq.map(v => v._1 -> v).toMap
          if (differ(pp(0), qByPic(pp(0)._1)) ||
            differ(pp(1), qByPic(pp(1)._1))) 1 else 0
        } else {
          // both predictions from one picture on both sides
          val ok = (!differ(pp(0), qq(0)) && !differ(pp(1), qq(1))) ||
            (!differ(pp(0), qq(1)) && !differ(pp(1), qq(0)))
          if (ok) 0 else 1
        }
      }
    }
  }

  /** One filtered line. `s` = (p3, p2, p1, p0, q0, q1, q2, q3);
    * returns the filtered eight samples (spec equations quoted). */
  private def refLine(s: IndexedSeq[Int], bS: Int, iA: Int, iB: Int,
      chroma: Boolean): IndexedSeq[Int] = {
    val p = Array(s(3), s(2), s(1), s(0)) // p0, p1, p2, p3
    val q = Array(s(4), s(5), s(6), s(7))
    val alpha = alphaT(iA)
    val beta = betaT(iB)
    val filterSamplesFlag = bS > 0 &&
      math.abs(p(0) - q(0)) < alpha &&
      math.abs(p(1) - p(0)) < beta &&
      math.abs(q(1) - q(0)) < beta
    if (!filterSamplesFlag) return s
    val aP = math.abs(p(2) - p(0))
    val aQ = math.abs(q(2) - q(0))
    val fp = p.clone()
    val fq = q.clone()
    if (bS == 4) {
      if (chroma) {
        // 8-361/8-362
        fp(0) = (2 * p(1) + p(0) + q(1) + 2) >> 2
        fq(0) = (2 * q(1) + q(0) + p(1) + 2) >> 2
      } else {
        val smallGap = math.abs(p(0) - q(0)) < (alpha >> 2) + 2
        if (smallGap && aP < beta) { // 8-354..8-356
          fp(0) = (p(2) + 2 * p(1) + 2 * p(0) + 2 * q(0) + q(1) + 4) >> 3
          fp(1) = (p(2) + p(1) + p(0) + q(0) + 2) >> 2
          fp(2) = (2 * p(3) + 3 * p(2) + p(1) + p(0) + q(0) + 4) >> 3
        } else // 8-357
          fp(0) = (2 * p(1) + p(0) + q(1) + 2) >> 2
        if (smallGap && aQ < beta) { // 8-358..8-360
          fq(0) = (q(2) + 2 * q(1) + 2 * q(0) + 2 * p(0) + p(1) + 4) >> 3
          fq(1) = (q(2) + q(1) + q(0) + p(0) + 2) >> 2
          fq(2) = (2 * q(3) + 3 * q(2) + q(1) + q(0) + p(0) + 4) >> 3
        } else // 8-361 (luma shape)
          fq(0) = (2 * q(1) + q(0) + p(1) + 2) >> 2
      }
    } else {
      // 8.7.2.3: tC from tC0 plus the aP/aQ increments (luma) or +1
      // (chroma); delta clipped, p0/q0 Clip1'd, p1/q1 luma-only
      val t0 = tc0T(iA, bS)
      val tC =
        if (chroma) t0 + 1
        else t0 + (if (aP < beta) 1 else 0) + (if (aQ < beta) 1 else 0)
      val delta = clip3(-tC, tC,
        ((q(0) - p(0)) * 4 + (p(1) - q(1)) + 4) >> 3)
      fp(0) = clip1(p(0) + delta)
      fq(0) = clip1(q(0) - delta)
      if (!chroma && aP < beta)
        fp(1) = p(1) + clip3(-t0, t0,
          (p(2) + ((p(0) + q(0) + 1) >> 1) - 2 * p(1)) >> 1)
      if (!chroma && aQ < beta)
        fq(1) = q(1) + clip3(-t0, t0,
          (q(2) + ((p(0) + q(0) + 1) >> 1) - 2 * q(1)) >> 1)
    }
    IndexedSeq(fp(3), fp(2), fp(1), fp(0), fq(0), fq(1), fq(2), fq(3))
  }

  /** The whole-picture reference walk: macroblocks in raster order;
    * per macroblock all vertical edges left-to-right then all
    * horizontal edges top-to-bottom, mutating the planes in place so
    * later edges see earlier outputs (8.7's availability clause).
    * Uniform idc/offsets-0 per slice id via `idcOf`; all fixtures
    * here are 4x4-transform, so internal edges sit at every 4-sample
    * offset. */
  private def refDeblock(y: Array[Byte], cb: Array[Byte], cr: Array[Byte],
      wMbs: Int, hMbs: Int, mbs: Array[RefMb], mbSliceId: Array[Int],
      idcOf: Int => Int): Unit = {
    val w16 = wMbs * 16
    val w8 = wMbs * 8
    // own Table 8-15 transcription (identity below 30)
    def refQpc(qPi: Int): Int =
      if (qPi < 30) qPi
      else Array(29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37,
        37, 37, 38, 38, 38, 39, 39, 39, 39)(qPi - 30)
    def qpCAvg(a: RefMb, b: RefMb, off: Int): Int =
      (refQpc(clip3(0, 51, a.qp + off)) +
        refQpc(clip3(0, 51, b.qp + off)) + 1) >> 1
    for (m <- 0 until wMbs * hMbs) {
      val idc = idcOf(mbSliceId(m))
      if (idc != 1) {
        val bx = m % wMbs
        val by = m / wMbs
        def crossOk(n: Int) = idc != 2 || mbSliceId(n) == mbSliceId(m)
        // ---- all vertical edges, then all horizontal edges ----
        for (vertical <- Seq(true, false); e <- 0 until 4) {
          val mbEdge = e == 0
          val neighbour =
            if (!mbEdge) m
            else if (vertical) m - 1
            else m - wMbs
          val exists =
            if (!mbEdge) true
            else if (vertical) bx > 0 && crossOk(neighbour)
            else by > 0 && crossOk(neighbour)
          if (exists) {
            val pMb = mbs(neighbour)
            val qMb = mbs(m)
            val qpAv = (pMb.qp + qMb.qp + 1) >> 1
            val iA = clip3(0, 51, qpAv) // offsets 0 in every fixture
            val iB = iA
            // luma: 16 lines; per line the 4x4 cells give the bS
            for (k <- 0 until 16) {
              val (pCell, qCell, coords) =
                if (vertical) {
                  val xq = bx * 16 + e * 4
                  val yA = by * 16 + k
                  (((xq - 1) % 16) / 4 -> (yA % 16) / 4,
                    ((xq % 16) / 4, (yA % 16) / 4),
                    (0 until 8).map(i => (yA, xq - 4 + i)))
                } else {
                  val yq = by * 16 + e * 4
                  val xA = bx * 16 + k
                  (((xA % 16) / 4) -> ((yq - 1) % 16) / 4,
                    ((xA % 16) / 4, (yq % 16) / 4),
                    (0 until 8).map(i => (yq - 4 + i, xA)))
                }
              val bS = refBs(pMb, qMb,
                (pCell._1, pCell._2), qCell, mbEdge)
              if (bS > 0) {
                val in = coords.map { case (yy, xx) => y(yy * w16 + xx) & 0xFF }
                val out = refLine(in, bS, iA, iB, chroma = false)
                coords.zipWithIndex.foreach { case ((yy, xx), i) =>
                  y(yy * w16 + xx) = out(i).toByte
                }
              }
            }
            // chroma: only edges co-located with chroma block bounds
            if (e == 0 || e == 2) {
              for (comp <- 0 until 2) {
                val cp = if (comp == 0) cb else cr
                val off = 0 // both PPS chroma offsets are 0 here
                val iAc = clip3(0, 51, qpCAvg(pMb, qMb, off))
                for (k <- 0 until 8) {
                  val (pCell, qCell, coords) =
                    if (vertical) {
                      val xq = bx * 8 + e * 2
                      val yA = by * 8 + k
                      // co-located luma cells pick the bS
                      ((((xq * 2 - 1) % 16) / 4, ((yA * 2) % 16) / 4),
                        (((xq * 2) % 16) / 4, ((yA * 2) % 16) / 4),
                        (0 until 8).map(i => (yA, xq - 4 + i)))
                    } else {
                      val yq = by * 8 + e * 2
                      val xA = bx * 8 + k
                      ((((xA * 2) % 16) / 4, ((yq * 2 - 1) % 16) / 4),
                        (((xA * 2) % 16) / 4, ((yq * 2) % 16) / 4),
                        (0 until 8).map(i => (yq - 4 + i, xA)))
                    }
                  val bS = refBs(pMb, qMb, pCell, qCell, mbEdge)
                  if (bS > 0) {
                    // chroma lines only touch p1..q1; p3/p2/q2/q3
                    // reads may fall outside the 8-wide MB pair — the
                    // filter never uses them for chroma, so clamp
                    val in = coords.map { case (yy, xx) =>
                      val xxx = clip3(0, w8 - 1, xx)
                      val yyy = clip3(0, hMbs * 8 - 1, yy)
                      cp(yyy * w8 + xxx) & 0xFF
                    }
                    val out = refLine(in, bS, iAc, iAc, chroma = true)
                    coords.zipWithIndex.foreach { case ((yy, xx), i) =>
                      if (i >= 2 && i <= 5) // p1, p0, q0, q1 only
                        cp(yy * w8 + xx) = out(i).toByte
                    }
                  }
                }
              }
            }
          }
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // Fixture plumbing
  // ------------------------------------------------------------------

  private def decodeAll(es: Array[Byte]) =
    H264Cavlc.decodeIntra16FramesYuv(es)

  private val intraMb: Int => RefMb =
    qp => RefMb(intra = true, qp = qp, coded = (_, _) => true,
      preds = (_, _) => Nil)

  // ------------------------------------------------------------------
  // Tests
  // ------------------------------------------------------------------

  test("intra grids: strong + internal filtering matches the longhand " +
    "reference, luma and chroma, across random steps and 2D corners") {
    val rnd = new Random(20260816L)
    for (iter <- 0 until 12) {
      val wMbs = 3
      val hMbs = 3
      val n = wMbs * hMbs
      val dc = Array.tabulate(n) { _ =>
        val d = Array.ofDim[Int](4, 4)
        d(0)(0) = rnd.between(-10, 31)
        d
      }
      val cbDc = Array.fill(n)(Array.fill(2, 2)(0))
      val crDc = Array.fill(n)(Array.fill(2, 2)(0))
      for (m <- 0 until n) {
        cbDc(m)(0)(0) = rnd.between(-4, 5)
        crDc(m)(0)(0) = rnd.between(-4, 5)
      }
      val qp = 30 + iter // sweep indexA 30..41 across iterations
      def stream(idc: Int) =
        H264.encodeSps(wMbs, hMbs, 0) ++
          H264.encodePps(deblockingControl = true) ++
          H264Cavlc.encodeIntra16Frame(wMbs, hMbs, dc, qp = qp,
            idrPicId = iter, cbDc = cbDc, crDc = crDc, deblockIdc = idc)
      val pre = decodeAll(stream(1)).head
      val post = decodeAll(stream(0)).head
      val (y, cbP, crP) = (pre._3.clone(), pre._4.clone(), pre._5.clone())
      refDeblock(y, cbP, crP, wMbs, hMbs,
        Array.fill(n)(intraMb(qp)), Array.fill(n)(0), _ => 0)
      assert(y.toSeq == post._3.toSeq, s"iter $iter: luma mismatch")
      assert(cbP.toSeq == post._4.toSeq, s"iter $iter: Cb mismatch")
      assert(crP.toSeq == post._5.toSeq, s"iter $iter: Cr mismatch")
    }
  }

  test("P picture: bS 2/1/0 derivation and the normal filter match " +
    "the longhand reference") {
    // IDR (filter off in BOTH streams, so references agree): four flat
    // macroblocks of distinct values. P picture (filter under test):
    //   MB0 P_L0 mv (0,0)     — uncoded, zero motion
    //   MB1 P_L0 mv (0,0)     — CODED residual  -> bS 2 edges
    //   MB2 P_L0 mv (64,0)    — uncoded, far mv -> bS 1 vs MB0
    //   MB3 P_L0 mv (62,0)    — uncoded, |62-64| < 4 -> bS 0 vs MB2
    val dc = Array.tabulate(4) { mb =>
      val d = Array.ofDim[Int](4, 4)
      d(0)(0) = mb * 7
      d
    }
    val kinds = Array(0, 0, 0, 0)
    val mvs = Array(Array(Array(0, 0)), Array(Array(0, 0)),
      Array(Array(64, 0)), Array(Array(62, 0)))
    val coeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
    for (blk <- 0 until 16) coeffs(1)(blk)(0) = 2
    def stream(idc: Int) =
      H264.encodeSps(2, 2, 0) ++
        H264.encodePps(deblockingControl = true) ++
        H264Cavlc.encodeIntra16Frame(2, 2, dc, qp = 36, idrPicId = 9,
          deblockIdc = 1) ++
        H264Cavlc.encodePFrame(2, 2, kinds, mvs, coeffs, qp = 36,
          frameNum = 1, deblockIdc = idc)
    // NOTE the encoder writes mvd against the MVP, so MB0's skip and
    // the explicit mvs above reconstruct to exactly these vectors.
    val pre = decodeAll(stream(1))(1)
    val post = decodeAll(stream(0))(1)
    val mbs: Array[RefMb] = Array(
      RefMb(intra = false, 36, (_, _) => false, (_, _) => List((0, 0, 0))),
      RefMb(intra = false, 36, (_, _) => true, (_, _) => List((0, 0, 0))),
      RefMb(intra = false, 36, (_, _) => false, (_, _) => List((0, 64, 0))),
      RefMb(intra = false, 36, (_, _) => false, (_, _) => List((0, 62, 0))))
    val (y, cbP, crP) = (pre._3.clone(), pre._4.clone(), pre._5.clone())
    refDeblock(y, cbP, crP, 2, 2, mbs, Array.fill(4)(0), _ => 0)
    assert(y.toSeq == post._3.toSeq, "luma mismatch")
    assert(cbP.toSeq == post._4.toSeq, "Cb mismatch")
    assert(crP.toSeq == post._5.toSeq, "Cr mismatch")
    // and the bS=0 edge really was a no-op: the MB2|MB3 vertical edge
    // ring (rows below the filtered y=16 horizontal band) agrees
    // between pre and post
    for (row <- 19 until 32; x <- 13 until 19)
      assert((pre._3(row * 32 + x) & 0xFF) == (post._3(row * 32 + x) & 0xFF),
        s"bS=0 edge touched at ($x, $row)")
  }

  test("B picture: per-list motion identity (slot, not index) drives " +
    "bS; mixed L0/L1/Bi edges match the longhand reference") {
    // I (off) -> P (off) -> B (under test): B mixes B_L0, B_L1, B_Bi,
    // and an intra MB, giving mv-count mismatches (1 vs 2), slot
    // mismatches (slot 0 vs slot 1) and an intra bS=4 edge.
    val dc = Array.tabulate(4) { mb =>
      val d = Array.ofDim[Int](4, 4)
      d(0)(0) = mb * 5
      d
    }
    val pKinds = Array(0, 0, 0, 0)
    val pMvs = Array.tabulate(4)(_ => Array(Array(0, 0)))
    val pCoeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
    for (m <- 0 until 4; blk <- 0 until 16) pCoeffs(m)(blk)(0) = m - 2
    val bKinds = Array(0, 1, 2, 3) // L0 | L1 | Bi | intra
    val bMvs0 = Array(Array(0, 0), Array(0, 0), Array(64, 0), Array(0, 0))
    val bMvs1 = Array(Array(0, 0), Array(4, 0), Array(0, 64), Array(0, 0))
    val bCoeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
    def stream(idc: Int) =
      H264.encodeSps(2, 2, 0, numRefFrames = 2) ++
        H264.encodePps(deblockingControl = true) ++
        H264Cavlc.encodeIntra16Frame(2, 2, dc, qp = 36, idrPicId = 4,
          deblockIdc = 1) ++
        H264Cavlc.encodePFrame(2, 2, pKinds, pMvs, pCoeffs, qp = 36,
          frameNum = 1, deblockIdc = 1) ++
        H264Cavlc.encodeBFrame(2, 2, bKinds, bMvs0, bMvs1, bCoeffs,
          qp = 36, frameNum = 2, deblockIdc = idc)
    val pre = decodeAll(stream(1))(2)
    val post = decodeAll(stream(0))(2)
    val mbs: Array[RefMb] = Array(
      RefMb(intra = false, 36, (_, _) => false, (_, _) => List((0, 0, 0))),
      RefMb(intra = false, 36, (_, _) => false, (_, _) => List((1, 4, 0))),
      RefMb(intra = false, 36, (_, _) => false,
        (_, _) => List((0, 64, 0), (1, 0, 64))),
      RefMb(intra = true, 36, (_, _) => true, (_, _) => Nil))
    val (y, cbP, crP) = (pre._3.clone(), pre._4.clone(), pre._5.clone())
    refDeblock(y, cbP, crP, 2, 2, mbs, Array.fill(4)(0), _ => 0)
    assert(y.toSeq == post._3.toSeq, "luma mismatch")
    assert(cbP.toSeq == post._4.toSeq, "Cb mismatch")
    assert(crP.toSeq == post._5.toSeq, "Cr mismatch")
  }

  test("idc semantics: 2 isolates slice boundaries, 1 disables, " +
    "control-absent equals idc 1") {
    val dc = Array.tabulate(4) { mb =>
      val d = Array.ofDim[Int](4, 4)
      d(0)(0) = mb * 4
      d
    }
    def stream(idc: Int, ctl: Boolean = true) =
      H264.encodeSps(2, 2, 0) ++
        H264.encodePps(deblockingControl = ctl) ++
        H264Cavlc.encodeIntra16Frame(2, 2, dc, qp = 36, idrPicId = 5,
          sliceStarts = Array(0, 2), // slice 0 = top row, 1 = bottom
          deblockIdc = if (ctl) idc else -1)
    val off = decodeAll(stream(1)).head
    val absent = decodeAll(stream(0, ctl = false)).head
    assert(off._3.toSeq == absent._3.toSeq,
      "control-absent stream must decode to the pre-filter picture")
    val on = decodeAll(stream(0)).head
    val iso = decodeAll(stream(2)).head
    assert(on._3.toSeq != off._3.toSeq, "idc 0 must filter")
    // idc 2: the horizontal macroblock edge at y = 16 crosses the
    // slice boundary and must stay untouched; the vertical edges
    // inside each slice must still be filtered
    val refIso = (off._3.clone(), off._4.clone(), off._5.clone())
    val sliceOf = Array(0, 0, 1, 1)
    refDeblock(refIso._1, refIso._2, refIso._3, 2, 2,
      Array.fill(4)(intraMb(36)), sliceOf, _ => 2)
    assert(refIso._1.toSeq == iso._3.toSeq, "idc 2 luma mismatch")
    // rows straddling the slice boundary: identical to pre-filter
    // away from the (legitimately filtered, same-slice) vertical
    // macroblock edge at x = 16
    for (x <- (0 until 13) ++ (19 until 32); row <- 13 until 19)
      assert((iso._3(row * 32 + x) & 0xFF) == (off._3(row * 32 + x) & 0xFF),
        s"idc 2 touched the cross-slice edge at ($x, $row)")
  }

  test("transform_size_8x8 macroblocks skip the 4x4 internal edges " +
    "(offsets 4 and 12) but filter the 8x8 edge and macroblock edges") {
    // Two I_8x8 macroblocks; MB0's top-left 8x8 block carries a
    // horizontal-frequency AC coefficient, so a 4x4-grid filter
    // WOULD smooth the x = 4 column ring. The spec says an 8x8
    // transform has no edge there: those pixels must be identical
    // between the filtered and unfiltered decodes, while the x = 8
    // (8x8 boundary) and x = 16 (macroblock) edges do filter.
    val kinds = Array(0, 0) // both I_8x8
    val modes8 = Array.fill(2)(Array(2, 2, 2, 2)) // DC everywhere
    val coeffs8 = Array.fill(2)(Array.fill(4)(new Array[Int](64)))
    coeffs8(0)(0)(0) = 6
    coeffs8(0)(0)(1) = 8 // first two AC positions: gradients in both
    coeffs8(0)(0)(2) = 6 // orientations, whatever the zig-zag order
    coeffs8(0)(1)(0) = 6
    coeffs8(1)(0)(0) = -6 // MB1 level steps at the x = 16 MB edge
    val modes4 = Array.fill(2)(new Array[Int](16))
    val coeffs4 = Array.fill(2)(Array.fill(16)(new Array[Int](16)))
    def stream(idc: Int) =
      H264.encodeSpsHigh(2, 1, 0) ++
        H264.encodePpsT8(deblockingControl = true) ++
        H264Cavlc.encodeIntra8x8Frame(2, 1, kinds, modes8, coeffs8,
          modes4, coeffs4, qp = 36, idrPicId = 3, deblockIdc = idc)
    val off = H264Cavlc.decodeIntra16FramesYuv(stream(1)).head
    val on = H264Cavlc.decodeIntra16FramesYuv(stream(0)).head
    assert(off._3.toSeq != on._3.toSeq, "the filter must do something")
    // the x = 8 ring must have filtered somewhere (the gradient is
    // filterable), proving the x = 4 equality below is meaningful
    val ring8 = for (y <- 0 until 16; x <- 6 to 9)
      yield (off._3(y * 32 + x) & 0xFF) != (on._3(y * 32 + x) & 0xFF)
    assert(ring8.contains(true), "8x8-boundary edge should filter")
    // x = 4: NOT a transform edge under T8 — untouched (away from
    // the filtered y = 8 horizontal band, rows 6..9)
    for (y <- (0 until 6) ++ (10 until 16); x <- 2 to 5)
      assert((off._3(y * 32 + x) & 0xFF) === (on._3(y * 32 + x) & 0xFF),
        s"T8 4x4-offset edge touched at ($x,$y)")
    // and the macroblock edge at x = 16 filtered the level step
    val ring16 = for (y <- 0 until 16; x <- 13 to 18)
      yield (off._3(y * 32 + x) & 0xFF) != (on._3(y * 32 + x) & 0xFF)
    assert(ring16.contains(true), "macroblock edge should filter")
  }

  test("tables follow their published generator laws") {
    // alpha(x) ~ 0.8 * (2^(x/6) - 1) capped at 255 (List et al. 2003);
    // the published table was hand-rounded, so allow max(1.5, 2%) —
    // tight enough to catch any transposed or shifted entry
    for (i <- 16 to 51) {
      val gen = math.min(255.0, 0.8 * (math.pow(2.0, i / 6.0) - 1.0))
      assert(math.abs(alphaT(i) - gen) <= math.max(1.5, 0.02 * gen) + 1e-9,
        s"alpha($i) = ${alphaT(i)} vs generator $gen")
    }
    // beta(x) ~ x/2 - 7, within 1.5 (the table plateaus in pairs)
    for (i <- 18 to 51)
      assert(math.abs(betaT(i) - (0.5 * i - 7)) <= 1.5,
        s"beta($i) = ${betaT(i)}")
    // zero below the filtering floor; monotone in index and in bS
    for (i <- 0 until 16) {
      assert(alphaT(i) == 0 && betaT(i) == 0)
      assert(tc0T(i, 1) == 0 && tc0T(i, 2) == 0 && tc0T(i, 3) == 0)
    }
    for (i <- 1 to 51; b <- 1 to 3) {
      assert(tc0T(i, b) >= tc0T(i - 1, b), s"tc0 not monotone at $i/$b")
      if (b > 1) assert(tc0T(i, b) >= tc0T(i, b - 1))
      assert(alphaT(i) >= alphaT(i - 1) && betaT(i) >= betaT(i - 1))
    }
    // the single tC0 fact the m33 oracle leans on
    assert(tc0T(36, 3) >= 1)
  }

  test("tC0 matches Table 8-17 entry-by-entry") {
    // An INDEPENDENT transcription of the published table (indexA
    // 16..51, columns bS 1..3), written here from the standard's own
    // row listing rather than read back through tableRow, so a
    // transcription slip in the shared data cannot self-certify. The
    // two transcriptions were reconciled once (13 rows of the original
    // shared table corrected) and have separate provenance notes.
    val expected = Array(
      (16, 0, 0, 0), (17, 0, 0, 1), (18, 0, 0, 1), (19, 0, 0, 1),
      (20, 0, 0, 1), (21, 0, 1, 1), (22, 0, 1, 1), (23, 1, 1, 1),
      (24, 1, 1, 1), (25, 1, 1, 1), (26, 1, 1, 1), (27, 1, 1, 2),
      (28, 1, 1, 2), (29, 1, 1, 2), (30, 1, 1, 2), (31, 1, 2, 3),
      (32, 1, 2, 3), (33, 2, 2, 3), (34, 2, 2, 4), (35, 2, 3, 4),
      (36, 2, 3, 4), (37, 3, 3, 5), (38, 3, 4, 6), (39, 3, 4, 6),
      (40, 4, 5, 7), (41, 4, 5, 8), (42, 5, 6, 9), (43, 6, 7, 10),
      (44, 6, 8, 11), (45, 7, 9, 13), (46, 8, 10, 14), (47, 9, 12, 16),
      (48, 10, 13, 18), (49, 11, 15, 20), (50, 13, 17, 23),
      (51, 14, 19, 25))
    for ((i, t1, t2, t3) <- expected) {
      assert(tc0T(i, 1) == t1, s"tC0($i, bS=1)")
      assert(tc0T(i, 2) == t2, s"tC0($i, bS=2)")
      assert(tc0T(i, 3) == t3, s"tC0($i, bS=3)")
    }
  }
}
