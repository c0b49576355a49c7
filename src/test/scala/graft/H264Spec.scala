package graft

import graft.operators.{H264, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

class H264Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("exp-golomb round trip: ue/se survive the writer→reader path") {
    val w = new H264.BitWriter
    Seq(0, 1, 2, 5, 31, 255, 4096).foreach(w.ue)
    Seq(0, 1, -1, 7, -128, 300).foreach(w.se)
    val r = new H264.BitReader(w.trailing())
    Seq(0, 1, 2, 5, 31, 255, 4096).foreach(v => assert(r.ue() === v))
    Seq(0, 1, -1, 7, -128, 300).foreach(v => assert(r.se() === v))
  }

  test("ue(v) rejects codes that would overflow Int instead of wrapping") {
    // 31 leading zero bits would make (1 << 31) - 1 + u(31) wrap negative;
    // a malformed/adversarial stream must fail loudly, not yield garbage.
    val bytes = Array.fill[Byte](9)(0) // 72 zero bits: lz runs past 30
    val r = new H264.BitReader(bytes)
    val e = intercept[IllegalArgumentException](r.ue())
    assert(e.getMessage.contains("overflow"))
    // Largest representable code still parses: 30 zeros, 1, 30 payload
    // bits → (2^30 - 1) + (2^30 - 1) = 2^31 - 2.
    val w = new H264.BitWriter
    w.u(0, 30).u(1, 1).u((1 << 30) - 1, 30)
    assert(new H264.BitReader(w.trailing()).ue() === Int.MaxValue - 1)
  }

  test("emulation prevention: ebsp↔rbsp round trip on hostile byte runs") {
    // payloads that contain raw start-code / zero-run patterns MUST be
    // escaped on the wire and restored exactly on parse
    val hostile = Array[Byte](0, 0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 9, 0, 0, 0)
    val ebsp = H264.rbspToEbsp(hostile)
    // no un-escaped start code or 00 00 03 survives in the wire form
    assert(!ebsp.sliding(3).exists(s => s(0) == 0 && s(1) == 0 &&
      (s(2) == 0 || s(2) == 1 || s(2) == 2)), ebsp.mkString(","))
    assert(H264.ebspToRbsp(ebsp).toSeq === hostile.toSeq)
  }

  test("SPS parse: 1920x1080 needs bottom cropping through 4:2:0 crop units") {
    // 120x68 macroblocks = 1920x1088; crop_bottom=4 removes 4*2=8 rows
    val sps = H264.encodeSps(widthMbs = 120, heightMapUnits = 68,
      cropBottom = 4, levelIdc = 40)
    val Seq((refIdc, tpe, ebsp)) = H264.nalUnits(sps)
    assert(refIdc === 3 && tpe === 7)
    val info = H264.parseSps(H264.ebspToRbsp(ebsp))
    assert(info.width === 1920)
    assert(info.height === 1080)
    assert(info.profileIdc === 66 && info.levelIdc === 40)
    assert(info.frameMbsOnly)
  }

  test("SPS parse: high-profile chroma branch (4:2:2, 10-bit)") {
    // hand-built profile-100 SPS exercising the branch encodeSps skips
    val w = new H264.BitWriter
    w.u(100, 8).u(0, 8).u(41, 8) // profile high, level 4.1
    w.ue(0) // sps id
    w.ue(2) // chroma_format_idc: 4:2:2 (SubWidthC=2, SubHeightC=1)
    w.ue(2).ue(2) // bit_depth_luma/chroma_minus8 = 10-bit
    w.u(0, 1) // qpprime
    w.u(0, 1) // no scaling matrix
    w.ue(4) // log2_max_frame_num_minus4
    w.ue(2) // poc type 2
    w.ue(1) // max_num_ref_frames
    w.u(0, 1)
    w.ue(79) // 80 MBs wide = 1280
    w.ue(45) // 46 map units = 736
    w.u(1, 1) // frame_mbs_only
    w.u(1, 1) // direct_8x8
    w.u(1, 1) // cropping: 4:2:2 → CropUnitX=2, CropUnitY=1
    w.ue(0); w.ue(0); w.ue(0); w.ue(16) // crop_bottom=16 → -16 rows
    w.u(0, 1) // no vui
    val info = H264.parseSps(w.trailing())
    assert(info.profileIdc === 100)
    assert(info.chromaFormatIdc === 2)
    assert(info.width === 1280)
    assert(info.height === 720)
  }

  test("I_PCM: pixel round trip is bit-exact, zero runs survive emulation prevention") {
    // an all-zero plane makes the raw sample payload one long 00 run —
    // the EBSP escaper must insert 00 00 03 sequences and the decoder
    // must strip them without disturbing sample values
    val zeros = new Array[Byte](32 * 16)
    val esZ = H264.encodeSps(2, 1, 0) ++ H264.encodePps() ++
      H264.encodeIPcmFrame(2, 1, zeros)
    assert(esZ.containsSlice(Array[Byte](0, 0, 3)), "no EP bytes inserted")
    val (wz, hz, decZ) = H264.decodeIPcm(esZ)
    assert((wz, hz) === ((32, 16)))
    assert(decZ.toSeq === zeros.toSeq)
    // a structured plane round-trips exactly too
    val plane = Array.tabulate(32 * 16)(i => ((i * 7 + 3) % 256).toByte)
    val es = H264.encodeSps(2, 1, 0) ++ H264.encodePps() ++
      H264.encodeIPcmFrame(2, 1, plane)
    val (_, _, dec) = H264.decodeIPcm(es)
    assert(dec.toSeq === plane.toSeq)
    // probe still reads the same stream's metadata
    val info = H264.probe(es)
    assert(info.width === 32 && info.height === 16 && info.frames === 1)
  }

  test("I_PCM: SPS bottom crop shrinks the displayed plane") {
    val plane = Array.tabulate(32 * 16)(i => (i % 251).toByte)
    val es = H264.encodeSps(2, 1, 2) ++ H264.encodePps() ++
      H264.encodeIPcmFrame(2, 1, plane)
    val (w, h, dec) = H264.decodeIPcm(es)
    // crop unit y = 2 for 4:2:0 frame coding: 2 crop units = 4 rows
    assert((w, h) === ((32, 12)))
    assert(dec.length === 32 * 12)
    assert(dec.toSeq === plane.take(32 * 12).toSeq)
  }

  test("I_PCM decoder rejects what it cannot reconstruct, loudly") {
    // transform-coded (non-I_PCM) slice data must fail, not produce
    // garbage pixels — the synthetic filler stream is exactly that
    intercept[Exception] {
      H264.decodeIPcm(H264.syntheticStream(2, 1, 0, 1))
    }
    // a slice with no preceding PPS is rejected
    val plane = new Array[Byte](32 * 16)
    intercept[Exception] {
      H264.decodeIPcm(
        H264.encodeSps(2, 1, 0) ++ H264.encodeIPcmFrame(2, 1, plane))
    }
  }

  test("probe counts frames, IDR sync points, and NALs from real slice headers") {
    val es = H264.syntheticStream(widthMbs = 5, heightMapUnits = 4,
      cropBottom = 1, frames = 12)
    val info = H264.probe(es)
    assert(info.width === 80)
    assert(info.height === 64 - 2)
    assert(info.frames === 12)
    assert(info.idrFrames === 2) // f=0 and f=8
    assert(info.nNals === 1 + 2 * 12)
  }

  test("multi-slice pictures are not double-counted") {
    // a second slice of the SAME picture has first_mb_in_slice > 0
    val es = H264.encodeSps(4, 3, 0) ++
      H264.encodeSliceNal(idr = true, firstMb = 0, frameNum = 0, fillerBytes = 8) ++
      H264.encodeSliceNal(idr = true, firstMb = 6, frameNum = 0, fillerBytes = 8) ++
      H264.encodeSliceNal(idr = false, firstMb = 0, frameNum = 1, fillerBytes = 8) ++
      H264.encodeSliceNal(idr = false, firstMb = 6, frameNum = 1, fillerBytes = 8)
    val info = H264.probe(es)
    assert(info.frames === 2)
    assert(info.idrFrames === 1)
    assert(info.nNals === 5)
  }

  test("videoProbe: distributed probe matches the planted geometry") {
    import spark.implicits._
    val fixtures = (0L until 40L).map { id =>
      (id, H264.syntheticStream((4 + id % 7).toInt, (3 + id % 5).toInt,
        (id % 3).toInt, (3 + id % 11).toInt))
    }.toDF("asset_id", "payload")
    val got = Multimodal.videoProbe(fixtures).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    (0L until 40L).foreach { id =>
      val frames = 3 + id % 11
      assert(got(id) === ((16 * (4 + id % 7), 16 * (3 + id % 5) - 2 * (id % 3),
        frames, (frames - 1) / 8 + 1, 1 + 2 * frames)), s"asset $id")
    }
  }
}
