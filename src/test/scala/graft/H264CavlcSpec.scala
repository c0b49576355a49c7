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
      dc: Array[Array[Array[Int]]], qp: Int): Array[Byte] = {
    val w16 = widthMbs * 16
    val plane = new Array[Byte](w16 * mapUnits * 16)
    val h = Array(Array(1, 1, 1, 1), Array(1, 1, -1, -1),
      Array(1, -1, -1, 1), Array(1, -1, 1, -1))
    val v = Array(10, 11, 13, 14, 16, 18)(qp % 6) * 16
    for (mb <- dc.indices) {
      val mbX = mb % widthMbs
      val mbY = mb / widthMbs
      // f = H c H
      val f = Array.tabulate(4, 4) { (i, j) =>
        (for (m <- 0 until 4; n <- 0 until 4)
          yield h(i)(m) * dc(mb)(m)(n) * h(n)(j)).sum
      }
      var sum = 0; var cnt = 0
      if (mbX > 0) {
        for (r <- 0 until 16) {
          sum += plane((mbY * 16 + r) * w16 + mbX * 16 - 1) & 0xFF
        }
        cnt += 16
      }
      if (mbY > 0) {
        for (c <- 0 until 16) {
          sum += plane((mbY * 16 - 1) * w16 + mbX * 16 + c) & 0xFF
        }
        cnt += 16
      }
      val pred = if (cnt == 32) (sum + 16) >> 5
        else if (cnt == 16) (sum + 8) >> 4 else 128
      for (bi <- 0 until 4; bj <- 0 until 4) {
        val dcY = if (qp >= 36) (f(bi)(bj) * v) << (qp / 6 - 6)
          else (f(bi)(bj) * v + (1 << (5 - qp / 6))) >> (6 - qp / 6)
        val res = (dcY + 32) >> 6
        val px = math.max(0, math.min(255, pred + res)).toByte
        for (r <- 0 until 4; c <- 0 until 4)
          plane((mbY * 16 + bi * 4 + r) * w16 + mbX * 16 + bj * 4 + c) = px
      }
    }
    plane
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

  test("streams outside the intra-DC subset fail loudly") {
    // An I_PCM frame is a valid stream but not in this decoder's subset.
    val plane = Array.tabulate(16 * 16)(i => (i % 256).toByte)
    val es = H264.encodeSps(1, 1, 0) ++ H264.encodePps() ++
      H264.encodeIPcmFrame(1, 1, plane)
    val ex = intercept[IllegalArgumentException] {
      H264Cavlc.decodeIntra16Frames(es)
    }
    assert(ex.getMessage.contains("mb_type"))
  }
}
