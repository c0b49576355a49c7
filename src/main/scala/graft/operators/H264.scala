package graft.operators

import scala.collection.mutable.ArrayBuffer

/** REAL H.264 (ITU-T Rec. H.264 / MPEG-4 AVC) bitstream-level parsing —
  * the metadata layer a video pipeline needs before any pixel work:
  * Annex-B NAL unit framing (B.1.1), emulation-prevention removal
  * (7.4.1.1), Exp-Golomb bit parsing (9.1), the full sequence parameter
  * set (7.3.2.1.1) including high-profile chroma/scaling-list paths and
  * frame cropping, and picture counting from slice headers
  * (first_mb_in_slice == 0 starts a new picture, 7.3.3/7.4.3).
  *
  * Pixel reconstruction is REAL for two slice shapes: all-I_PCM
  * pictures ([[decodeIPcmFrames]] — raw samples, 7.3.5) and
  * all-I_16x16_2_0_0 pictures ([[H264Cavlc.decodeIntra16Frames]] —
  * CAVLC-entropy-coded luma DC residuals, clause 9.2, with inverse
  * Hadamard, dequant, and DC intra prediction). What stays out of
  * scope is the rest of the entropy layer (CAVLC AC residuals /
  * other nC columns, CABAC) and inter prediction — a full codec, not
  * buildable in an environment without codec libraries; everything
  * metadata-shaped is parsed from real conformant bits, so
  * dimensions, frame counts, IDR (sync-point) counts, and NAL
  * inventories are exact. The matching [[BitWriter]]/encode side
  * exists for fixtures, like [[Multimodal.encodeBmp24]] and the WAV
  * encoder: tests and catalog fixtures round-trip encode→parse
  * through spec-conformant bytes.
  */
object H264 {

  /** MSB-first bit reader over an RBSP (9.1 parsing process). */
  final class BitReader(bytes: Array[Byte]) {
    private var pos = 0 // bit position
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = pos >> 3
        require(b < bytes.length, s"bit read past RBSP end ($pos)")
        v = (v << 1) | ((bytes(b) >> (7 - (pos & 7))) & 1)
        pos += 1; i += 1
      }
      v
    }
    /** ue(v): Exp-Golomb, 9.1. */
    def ue(): Int = {
      var lz = 0
      // lz == 31 would make (1 << lz) - 1 + u(lz) overflow Int and wrap
      // to garbage; codes above 2^31-2 are unrepresentable, so fail loudly.
      while (u(1) == 0) { lz += 1; require(lz <= 30, "ue(v) overflow") }
      (1 << lz) - 1 + u(lz)
    }
    /** se(v): signed Exp-Golomb, 9.1.1. */
    def se(): Int = {
      val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }
    /** pcm_alignment_zero_bit run (7.3.5): skip to the next byte
      * boundary, requiring every skipped bit to be zero. */
    def alignZero(): Unit =
      while ((posBits & 7) != 0) require(u(1) == 0,
        "non-zero pcm_alignment bit")
    def posBits: Int = pos
    /** more_rbsp_data() (7.2): true while the read position is before
      * the rbsp_stop_one_bit — the LAST 1 bit of the buffer. Slices
      * carry no explicit macroblock count; parsing continues while
      * this holds. */
    def moreRbspData: Boolean = {
      var b = bytes.length - 1
      while (b >= 0 && bytes(b) == 0) b -= 1
      if (b < 0) false
      else {
        val stop = b * 8 + (7 - java.lang.Integer.numberOfTrailingZeros(bytes(b) & 0xFF))
        pos < stop
      }
    }
  }

  /** MSB-first bit writer producing an RBSP (fixture/encode side). */
  final class BitWriter {
    private val out = ArrayBuffer[Byte]()
    private var cur = 0
    private var nbits = 0
    def u(v: Int, n: Int): this.type = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nbits += 1
        if (nbits == 8) { out += cur.toByte; cur = 0; nbits = 0 }
        i -= 1
      }
      this
    }
    def ue(v: Int): this.type = {
      val code = v + 1
      val lz = 31 - Integer.numberOfLeadingZeros(code)
      u(0, lz); u(code, lz + 1)
    }
    def se(v: Int): this.type = ue(if (v > 0) 2 * v - 1 else -2 * v)
    /** pcm_alignment_zero_bit: zero-pad to the next byte boundary. */
    def align(): this.type = { while (nbits != 0) u(0, 1); this }
    /** rbsp_trailing_bits: stop bit + zero-pad to a byte (7.3.2.11). */
    def trailing(): Array[Byte] = {
      u(1, 1)
      if (nbits != 0) u(0, 8 - nbits)
      out.toArray
    }
  }

  /** EBSP → RBSP: drop emulation_prevention_three_byte (7.4.1.1:
    * 00 00 03 followed by 00/01/02/03). */
  def ebspToRbsp(b: Array[Byte]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](b.length)
    var i = 0
    while (i < b.length) {
      if (i >= 2 && b(i) == 3 && b(i - 1) == 0 && b(i - 2) == 0 &&
          i + 1 < b.length && (b(i + 1) & 0xFF) <= 3) ()
      else out += b(i)
      i += 1
    }
    out.toArray
  }

  /** RBSP → EBSP: insert the emulation-prevention byte wherever two
    * zeros would otherwise be followed by 00/01/02/03. */
  def rbspToEbsp(b: Array[Byte]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](b.length + 8)
    var zeros = 0
    var i = 0
    while (i < b.length) {
      if (zeros >= 2 && (b(i) & 0xFF) <= 3) { out += 3; zeros = 0 }
      out += b(i)
      zeros = if (b(i) == 0) zeros + 1 else 0
      i += 1
    }
    out.toArray
  }

  /** Annex-B framing: split on 00 00 01 / 00 00 00 01 start codes into
    * (nal_ref_idc, nal_unit_type, ebspPayload) — header per 7.3.1. */
  def nalUnits(es: Array[Byte]): Seq[(Int, Int, Array[Byte])] = {
    val starts = ArrayBuffer[Int]() // index of first byte AFTER start code
    var i = 0
    while (i + 2 < es.length) {
      if (es(i) == 0 && es(i + 1) == 0 && es(i + 2) == 1) {
        starts += i + 3; i += 3
      } else i += 1
    }
    starts.toSeq.zipWithIndex.map { case (s, k) =>
      var e = if (k + 1 < starts.length) starts(k + 1) - 3 else es.length
      while (e > s && es(e - 1) == 0) e -= 1 // trailing_zero_8bits
      val header = es(s) & 0xFF
      require((header & 0x80) == 0, "forbidden_zero_bit set")
      ((header >> 5) & 3, header & 0x1F, es.slice(s + 1, e))
    }
  }

  /** Parsed SPS — the fields a pipeline filters on, plus the POC
    * machinery the decoder needs (pic_order_cnt_type and, for type 0,
    * MaxPicOrderCntLsb = 2^(log2_max_pic_order_cnt_lsb_minus4 + 4)). */
  case class SpsInfo(profileIdc: Int, levelIdc: Int, spsId: Int,
      chromaFormatIdc: Int, width: Int, height: Int, frameMbsOnly: Boolean,
      pocType: Int = 2, maxPocLsb: Int = 16, maxFrameNum: Int = 256) {
    /** Width of the frame_num slice-header field (7.4.3: fixed at
      * log2_max_frame_num bits) — every slice parser must read exactly
      * this many bits or desync. */
    def frameNumBits: Int = Integer.numberOfTrailingZeros(maxFrameNum)
  }

  private val HighProfiles =
    Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)

  /** seq_parameter_set_rbsp, 7.3.2.1.1 — full parse including the
    * high-profile chroma/bit-depth/scaling-list branch and cropping. */
  def parseSps(rbsp: Array[Byte]): SpsInfo = {
    val r = new BitReader(rbsp)
    val profile = r.u(8)
    r.u(8) // constraint_set flags + reserved
    val level = r.u(8)
    val spsId = r.ue()
    var chromaFormatIdc = 1 // 4:2:0 default for non-high profiles
    var separateColour = false
    if (HighProfiles.contains(profile)) {
      chromaFormatIdc = r.ue()
      if (chromaFormatIdc == 3) separateColour = r.u(1) == 1
      r.ue(); r.ue() // bit_depth_luma/chroma_minus8
      r.u(1) // qpprime_y_zero_transform_bypass
      if (r.u(1) == 1) { // seq_scaling_matrix_present
        val lists = if (chromaFormatIdc != 3) 8 else 12
        var i = 0
        while (i < lists) {
          if (r.u(1) == 1) skipScalingList(r, if (i < 6) 16 else 64)
          i += 1
        }
      }
    }
    // frame_num is a FIXED-WIDTH u(log2_max_frame_num) field: every
    // slice parser must size its read (and the 8.2.1.3 FrameNumOffset
    // wrap constant) from this value, so it rides SpsInfo rather than
    // being hardwired to u(8).
    val log2MaxFrameNumMinus4 = r.ue()
    require(log2MaxFrameNumMinus4 <= 12,
      s"log2_max_frame_num_minus4=$log2MaxFrameNumMinus4 out of range (7.4.2.1.1)")
    val maxFrameNum = 1 << (log2MaxFrameNumMinus4 + 4)
    val pocType = r.ue() // pic_order_cnt_type
    var maxPocLsb = 16
    pocType match {
      case 0 => maxPocLsb = 1 << (r.ue() + 4)
      case 1 =>
        r.u(1); r.se(); r.se()
        val n = r.ue()
        var i = 0
        while (i < n) { r.se(); i += 1 }
      case _ => ()
    }
    r.ue() // max_num_ref_frames
    r.u(1) // gaps_in_frame_num_value_allowed
    val picWidthInMbs = r.ue() + 1
    val picHeightInMapUnits = r.ue() + 1
    val frameMbsOnly = r.u(1) == 1
    if (!frameMbsOnly) r.u(1) // mb_adaptive_frame_field
    r.u(1) // direct_8x8_inference
    var cropL, cropR, cropT, cropB = 0
    if (r.u(1) == 1) { cropL = r.ue(); cropR = r.ue(); cropT = r.ue(); cropB = r.ue() }
    // 7.4.2.1.1 cropping arithmetic
    val chromaArrayType = if (separateColour) 0 else chromaFormatIdc
    val (subW, subH) = chromaFormatIdc match {
      case 1 => (2, 2); case 2 => (2, 1); case _ => (1, 1)
    }
    val cropUnitX = if (chromaArrayType == 0) 1 else subW
    val cropUnitY = (if (chromaArrayType == 0) 1 else subH) *
      (if (frameMbsOnly) 1 else 2)
    val width = picWidthInMbs * 16 - cropUnitX * (cropL + cropR)
    val height = (if (frameMbsOnly) 1 else 2) * picHeightInMapUnits * 16 -
      cropUnitY * (cropT + cropB)
    SpsInfo(profile, level, spsId, chromaFormatIdc, width, height,
      frameMbsOnly, pocType, maxPocLsb, maxFrameNum)
  }

  private def skipScalingList(r: BitReader, size: Int): Unit = {
    var lastScale = 8
    var nextScale = 8
    var j = 0
    while (j < size) {
      if (nextScale != 0) nextScale = (lastScale + r.se() + 256) % 256
      lastScale = if (nextScale == 0) lastScale else nextScale
      j += 1
    }
  }

  /** Stream summary from one Annex-B pass. Frame counting: a slice NAL
    * (type 1/5) with first_mb_in_slice == 0 starts a new picture —
    * exact for the frame-coded, non-ASO streams this pipeline targets.
    */
  case class StreamInfo(width: Int, height: Int, frames: Int,
      idrFrames: Int, nNals: Int, profileIdc: Int, levelIdc: Int)

  def probe(es: Array[Byte]): StreamInfo = {
    val nals = nalUnits(es)
    var sps: Option[SpsInfo] = None
    var frames = 0
    var idr = 0
    nals.foreach { case (_, tpe, ebsp) =>
      tpe match {
        case 7 => if (sps.isEmpty) sps = Some(parseSps(ebspToRbsp(ebsp)))
        case 1 | 5 =>
          val firstMb = new BitReader(ebspToRbsp(ebsp)).ue()
          if (firstMb == 0) { frames += 1; if (tpe == 5) idr += 1 }
        case _ => ()
      }
    }
    val s = sps.getOrElse(
      throw new IllegalArgumentException("no SPS NAL in stream"))
    StreamInfo(s.width, s.height, frames, idr, nals.size, s.profileIdc,
      s.levelIdc)
  }

  // -------------------------------------------------------------------
  // Encode side (fixtures): spec-conformant SPS + minimal slice NALs.
  // -------------------------------------------------------------------

  private[operators] def nal(refIdc: Int, tpe: Int, rbsp: Array[Byte],
      longStart: Boolean): Array[Byte] = {
    val start = if (longStart) Array[Byte](0, 0, 0, 1) else Array[Byte](0, 0, 1)
    start ++ Array(((refIdc << 5) | tpe).toByte) ++ rbspToEbsp(rbsp)
  }

  /** Baseline-profile SPS for the given MB geometry + bottom crop.
    * `numRefFrames` = 2 enables the low-delay B GOP shape (two past
    * references; pic_order_cnt_type 2 keeps output order = decode
    * order, so no POC syntax is needed). */
  def encodeSps(widthMbs: Int, heightMapUnits: Int, cropBottom: Int,
      levelIdc: Int = 30, numRefFrames: Int = 1,
      pocType: Int = 2, log2MaxFrameNumMinus4: Int = 4): Array[Byte] = {
    require(pocType == 0 || pocType == 2, s"pocType $pocType unsupported")
    require(log2MaxFrameNumMinus4 >= 0 && log2MaxFrameNumMinus4 <= 12,
      s"log2_max_frame_num_minus4 $log2MaxFrameNumMinus4 out of range")
    val w = new BitWriter
    w.u(66, 8) // profile_idc: baseline (no chroma branch in SPS)
    w.u(0, 8).u(levelIdc, 8)
    w.ue(0) // sps id
    w.ue(log2MaxFrameNumMinus4) // log2_max_frame_num_minus4
    w.ue(pocType) // pic_order_cnt_type: 2 = decode order IS output
    // order (the low-delay subset); 0 = explicit pic_order_cnt_lsb in
    // every slice header (display-reordered B pictures)
    if (pocType == 0) w.ue(0) // log2_max_pic_order_cnt_lsb_minus4 -> 16
    w.ue(numRefFrames) // max_num_ref_frames
    w.u(0, 1) // gaps_in_frame_num
    w.ue(widthMbs - 1)
    w.ue(heightMapUnits - 1)
    w.u(1, 1) // frame_mbs_only
    w.u(1, 1) // direct_8x8_inference
    if (cropBottom > 0) { w.u(1, 1); w.ue(0); w.ue(0); w.ue(0); w.ue(cropBottom) }
    else w.u(0, 1)
    w.u(0, 1) // vui_parameters_present
    nal(3, 7, w.trailing(), longStart = true)
  }

  /** High-profile SPS (profile_idc 100) for the given MB geometry:
    * the [[encodeSps]] shape plus the 7.3.2.1.1 high-profile branch
    * (chroma_format_idc 1, 8-bit depths, no transform bypass, no
    * scaling matrices) — the profile gate for transform_size_8x8_flag
    * streams (A.2.4: the 8x8 transform is High profile and above). */
  def encodeSpsHigh(widthMbs: Int, heightMapUnits: Int, cropBottom: Int,
      levelIdc: Int = 30): Array[Byte] = {
    val w = new BitWriter
    w.u(100, 8) // profile_idc: High
    w.u(0, 8).u(levelIdc, 8)
    w.ue(0) // sps id
    w.ue(1) // chroma_format_idc: 4:2:0
    w.ue(0).ue(0) // bit_depth_luma/chroma_minus8
    w.u(0, 1) // qpprime_y_zero_transform_bypass
    w.u(0, 1) // seq_scaling_matrix_present (flat 16 weights)
    w.ue(4) // log2_max_frame_num_minus4
    w.ue(2) // pic_order_cnt_type 2
    w.ue(1) // max_num_ref_frames
    w.u(0, 1) // gaps_in_frame_num
    w.ue(widthMbs - 1)
    w.ue(heightMapUnits - 1)
    w.u(1, 1) // frame_mbs_only
    w.u(1, 1) // direct_8x8_inference
    if (cropBottom > 0) { w.u(1, 1); w.ue(0); w.ue(0); w.ue(0); w.ue(cropBottom) }
    else w.u(0, 1)
    w.u(0, 1) // vui_parameters_present
    nal(3, 7, w.trailing(), longStart = true)
  }

  /** Minimal slice NAL: real header fields (first_mb_in_slice,
    * slice_type, pps id, frame_num), arbitrary payload bits standing in
    * for entropy-coded slice data the parser never needs to touch. */
  def encodeSliceNal(idr: Boolean, firstMb: Int, frameNum: Int,
      fillerBytes: Int): Array[Byte] = {
    val w = new BitWriter
    w.ue(firstMb)
    w.ue(if (idr) 7 else 5) // slice_type: I / P (all-slices form)
    w.ue(0) // pps id
    w.u(frameNum & 0xFF, 8) // frame_num with log2_max_frame_num = 8
    var i = 0
    while (i < fillerBytes) { w.u((i * 37 + frameNum) & 0xFF, 8); i += 1 }
    nal(if (idr) 3 else 2, if (idr) 5 else 1, w.trailing(),
      longStart = false)
  }

  /** Minimal pic_parameter_set_rbsp (7.3.2.2): CAVLC, one slice group,
    * no redundant-count flag — the fields the I_PCM slice header below
    * depends on. `deblockingControl` sets
    * deblocking_filter_control_present, so slice headers carry
    * disable_deblocking_filter_idc and the in-loop 8.7 filter can be
    * switched per slice (legacy fixtures leave it absent and decode to
    * the pre-filter picture). */
  def encodePps(deblockingControl: Boolean = false,
      weightedPred: Boolean = false,
      weightedBipredIdc: Int = 0,
      constrainedIntra: Boolean = false): Array[Byte] = {
    require(weightedBipredIdc >= 0 && weightedBipredIdc <= 2,
      s"weighted_bipred_idc $weightedBipredIdc out of range")
    val w = new BitWriter
    w.ue(0) // pps id
    w.ue(0) // sps id
    w.u(0, 1) // entropy_coding_mode: CAVLC
    w.u(0, 1) // bottom_field_pic_order_in_frame_present
    w.ue(0) // num_slice_groups_minus1
    w.ue(0).ue(0) // num_ref_idx_l0/l1_default_active_minus1
    w.u(if (weightedPred) 1 else 0, 1) // weighted_pred
    w.u(weightedBipredIdc, 2) // weighted_bipred_idc
    w.se(0) // pic_init_qp_minus26
    w.se(0) // pic_init_qs_minus26
    w.se(0) // chroma_qp_index_offset
    w.u(if (deblockingControl) 1 else 0, 1) // deblocking_filter_control_present
    w.u(if (constrainedIntra) 1 else 0, 1) // constrained_intra_pred
    w.u(0, 1) // redundant_pic_cnt_present
    nal(3, 8, w.trailing(), longStart = true)
  }

  /** [[encodePps]] plus the 7.3.2.2 optional tail that enables the
    * 8x8 transform: transform_8x8_mode_flag = 1,
    * pic_scaling_matrix_present = 0 (flat weights), and an explicit
    * second_chroma_qp_index_offset (7.4.2.2: Cr uses the second
    * offset when the tail is present; Cb keeps the first). */
  def encodePpsT8(secondChromaQpOffset: Int = 0,
      deblockingControl: Boolean = false): Array[Byte] = {
    val w = new BitWriter
    w.ue(0) // pps id
    w.ue(0) // sps id
    w.u(0, 1) // entropy_coding_mode: CAVLC
    w.u(0, 1) // bottom_field_pic_order_in_frame_present
    w.ue(0) // num_slice_groups_minus1
    w.ue(0).ue(0) // num_ref_idx_l0/l1_default_active_minus1
    w.u(0, 1) // weighted_pred
    w.u(0, 2) // weighted_bipred_idc
    w.se(0) // pic_init_qp_minus26
    w.se(0) // pic_init_qs_minus26
    w.se(0) // chroma_qp_index_offset
    w.u(if (deblockingControl) 1 else 0, 1) // deblocking_filter_control_present
    w.u(0, 1) // constrained_intra_pred
    w.u(0, 1) // redundant_pic_cnt_present
    w.u(1, 1) // transform_8x8_mode_flag
    w.u(0, 1) // pic_scaling_matrix_present
    w.se(secondChromaQpOffset)
    nal(3, 8, w.trailing(), longStart = true)
  }

  /** One REAL decodable IDR frame coded entirely as I_PCM macroblocks
    * (7.3.5: mb_type 25 in an I slice = raw samples in the bitstream,
    * no prediction, no transform, no entropy coding) — full slice
    * header (7.3.3: idr_pic_id, dec_ref_pic_marking, slice_qp_delta)
    * plus per-MB pcm_alignment_zero_bits, 256 luma and 128 4:2:0
    * chroma samples. `luma` is the row-major widthMbs*16 x
    * heightMapUnits*16 plane; chroma planes are flat 128 (gray). The
    * zero-heavy sample payloads routinely form 00 00 0x runs, so this
    * path exercises emulation prevention with REAL pixel data.
    *
    * Every picture is an IDR, so frame_num is ALWAYS 0 (7.4.3: "If the
    * current picture is an IDR picture, frame_num shall be equal to
    * 0") and consecutive pictures are distinguished by idr_pic_id
    * instead, which 7.4.3 requires to DIFFER between consecutive IDR
    * access units — `frameNum` feeds idr_pic_id (mod its 0..65535
    * range), keeping multi-frame streams reference-decoder
    * conformant. */
  def encodeIPcmFrame(widthMbs: Int, heightMapUnits: Int,
      luma: Array[Byte], frameNum: Int = 0): Array[Byte] = {
    val w16 = widthMbs * 16
    require(luma.length == w16 * heightMapUnits * 16,
      s"luma plane must be ${w16}x${heightMapUnits * 16}")
    val w = new BitWriter
    w.ue(0) // first_mb_in_slice
    w.ue(7) // slice_type: I (all slices of the picture are I)
    w.ue(0) // pps id
    w.u(0, 8) // frame_num: 0 — mandatory for IDR (7.4.3)
    w.ue(frameNum & 0xFFFF) // idr_pic_id: distinct per consecutive IDR
    // pic_order_cnt_type 2: no POC fields
    w.u(0, 1) // no_output_of_prior_pics_flag   (dec_ref_pic_marking,
    w.u(0, 1) // long_term_reference_flag        IDR form)
    w.se(0) // slice_qp_delta
    var m = 0
    val nMbs = widthMbs * heightMapUnits
    while (m < nMbs) {
      w.ue(25) // mb_type: I_PCM
      w.align() // pcm_alignment_zero_bits
      val mbX = m % widthMbs
      val mbY = m / widthMbs
      var r = 0
      while (r < 16) {
        var c = 0
        while (c < 16) {
          w.u(luma((mbY * 16 + r) * w16 + mbX * 16 + c) & 0xFF, 8)
          c += 1
        }
        r += 1
      }
      var i = 0
      while (i < 128) { w.u(128, 8); i += 1 } // Cb then Cr, flat gray
      m += 1
    }
    nal(3, 5, w.trailing(), longStart = false)
  }

  /** REAL pixel reconstruction for the I_PCM-coded stream shape this
    * engine emits (SPS + PPS + one all-I_PCM IDR slice, poc type 2,
    * CAVLC mode, frame_mbs_only): parse SPS geometry, require a CAVLC
    * PPS, walk the slice header and every macroblock_layer, and
    * rebuild the luma plane from the raw pcm samples, cropped to the
    * SPS display window. Returns (width, height, luma). Transform-
    * coded macroblocks (mb_type != 25) are out of scope and fail
    * loudly — the boundary is the entropy decoder, not the pixel
    * path. */
  def decodeIPcm(es: Array[Byte]): (Int, Int, Array[Byte]) = {
    val frames = decodeIPcmFrames(es)
    require(frames.nonEmpty, "no IDR slice")
    frames.head
  }

  /** Decode EVERY I_PCM-coded picture in the stream (the multi-frame
    * form of [[decodeIPcm]] — real decoded-pixel input for frame-level
    * analysis like SAD shot detection). */
  def decodeIPcmFrames(es: Array[Byte]): Seq[(Int, Int, Array[Byte])] = {
    val nals = nalUnits(es)
    var sps: Option[SpsInfo] = None
    var ppsSeen = false
    val out = ArrayBuffer[(Int, Int, Array[Byte])]()
    nals.foreach { case (_, tpe, ebsp) =>
      tpe match {
        case 7 => if (sps.isEmpty) sps = Some(parseSps(ebspToRbsp(ebsp)))
        case 8 =>
          val r = new BitReader(ebspToRbsp(ebsp))
          r.ue(); r.ue()
          require(r.u(1) == 0, "CABAC slice data not supported (CAVLC only)")
          ppsSeen = true
        case 5 =>
          val s = sps.getOrElse(
            throw new IllegalArgumentException("slice before SPS"))
          require(ppsSeen, "slice before PPS")
          out += decodeIPcmSlice(s, ebspToRbsp(ebsp))
        case _ => ()
      }
    }
    out.toSeq
  }

  private def decodeIPcmSlice(s: SpsInfo,
      rbsp: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(s.frameMbsOnly, "field coding not supported")
    val widthMbs = (s.width + 15) / 16
    val mapUnits = (s.height + 15) / 16
    val w16 = widthMbs * 16
    val r = new BitReader(rbsp)
    require(r.ue() == 0, "multi-slice pictures not supported")
    val sliceType = r.ue()
    require(sliceType == 2 || sliceType == 7, s"not an I slice: $sliceType")
    r.ue() // pps id
    r.u(s.frameNumBits) // frame_num
    r.ue() // idr_pic_id
    r.u(1); r.u(1) // IDR dec_ref_pic_marking
    r.se() // slice_qp_delta
    val plane = new Array[Byte](w16 * mapUnits * 16)
    var m = 0
    val nMbs = widthMbs * mapUnits
    while (m < nMbs) {
      val mbType = r.ue()
      require(mbType == 25, s"mb $m is not I_PCM (mb_type $mbType)")
      r.alignZero()
      val mbX = m % widthMbs
      val mbY = m / widthMbs
      var i = 0
      while (i < 256) {
        plane((mbY * 16 + i / 16) * w16 + mbX * 16 + i % 16) =
          r.u(8).toByte
        i += 1
      }
      i = 0
      while (i < 128) { r.u(8); i += 1 } // chroma, discarded
      m += 1
    }
    // 7.4.2.1.1 display-window crop (bottom/right)
    val cropped = new Array[Byte](s.width * s.height)
    var row = 0
    while (row < s.height) {
      System.arraycopy(plane, row * w16, cropped, row * s.width, s.width)
      row += 1
    }
    (s.width, s.height, cropped)
  }

  /** access_unit_delimiter_rbsp (7.3.2.4). */
  def encodeAud(): Array[Byte] = {
    val w = new BitWriter
    w.u(7, 3) // primary_pic_type: any
    nal(0, 9, w.trailing(), longStart = false)
  }

  /** Deterministic fixture stream: SPS + (AUD + slice)×frames, every
    * 8th frame an IDR, with emulation-prevention-triggering filler. */
  def syntheticStream(widthMbs: Int, heightMapUnits: Int, cropBottom: Int,
      frames: Int): Array[Byte] = {
    val out = ArrayBuffer[Byte]()
    out ++= encodeSps(widthMbs, heightMapUnits, cropBottom)
    var f = 0
    while (f < frames) {
      out ++= encodeAud()
      out ++= encodeSliceNal(idr = f % 8 == 0, firstMb = 0, frameNum = f,
        fillerBytes = 16 + (f % 5))
      f += 1
    }
    out.toArray
  }
}
