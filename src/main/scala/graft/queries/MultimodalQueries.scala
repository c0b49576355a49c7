package graft.queries

import graft.Tables._
import graft.operators.{JpegGray, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-pipeline queries. Real multimodal test assets don't exist
  * in the fixture set, so the oracle-checked query treats document text
  * bytes as opaque binary payloads — every binary-column operator on the
  * checked path (octet length, content digest, fixed-size chunk count,
  * chunk reassembly) behaves identically on real media bytes. The codec
  * stubs are covered by MultimodalSpec. */
object MultimodalQueries {

  /** The per-asset compute spine: the documents table's doc_ids SPREAD
    * over the session's default parallelism before the decode map. The
    * base-scale tables arrive as ONE parquet file with one row group —
    * one input partition — so without this exchange every per-asset
    * codec map in the family would run on a single core at bench
    * scale. The exchange moves 8-byte ids only; at cluster scale a
    * multi-file corpus already arrives spread (the multi-file stress
    * corpora measure exactly that), so the repartition is a no-op-cost
    * guard, not a scale crutch. */
  private def docIds(spark: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[java.lang.Long] = {
    t(spark, dir, "documents").select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[java.lang.Long](org.apache.spark.sql.Encoders.LONG)
  }


  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "m1_binary_assets" -> m1,
    "m2_frame_sample" -> m2,
    "m3_wav_roundtrip" -> m3,
    "m4_bmp_roundtrip" -> m4,
    "m5_png_roundtrip" -> m5,
    "m6_jpeg_roundtrip" -> m6,
    "m7_audio_frames" -> m7,
    "m8_scene_cuts" -> m8,
    "m9_image_dhash" -> m9,
    "m10_video_probe" -> m10,
    "m11_image_dedup_groups" -> m11,
    "m12_image_resize" -> m12,
    "m13_audio_resample" -> m13,
    "m14_video_pixels" -> m14,
    "m15_decoded_scene_cuts" -> m15,
    "m16_video_cavlc_pixels" -> m16,
    "m17_video_chroma_pixels" -> m17,
    "m18_audio_wht_features" -> m18,
    "m19_png_color" -> m19,
    "m20_video_pred_modes" -> m20,
    "m21_video_ac_residuals" -> m21,
    "m22_gif_lzw_roundtrip" -> m22,
    "m23_video_chroma_ac" -> m23,
    "m24_video_multi_slice" -> m24,
    "m25_video_dense_cavlc" -> m25,
    "m26_video_intra4x4" -> m26,
    "m27_video_intra8x8" -> m27,
    "m28_video_inter_p" -> m28,
    "m29_video_inter_parts" -> m29,
    "m30_video_bipred" -> m30,
    "m31_video_multiref" -> m31,
    "m32_video_direct" -> m32,
    "m33_video_deblock" -> m33,
    "m34_video_bparts" -> m34,
    "m35_video_b8x8" -> m35,
    "m36_video_temporal_direct" -> m36,
    "m37_video_weighted_pred" -> m37,
    "m38_video_implicit_wp" -> m38,
    "m39_video_deblock_tc0" -> m39,
    "m40_video_constrained_intra" -> m40,
    "m41_video_slice_deblock" -> m41,
    "m42_video_poc_order" -> m42,
    "m43_video_frame_num_wrap" -> m43,
    "m44_audio_fingerprint" -> m44,
    "m45_video_phash_dedup" -> m45)

  /** Inter prediction on the oracle gate (m28): each asset is a
    * two-frame GOP — an I_16x16-DC IDR whose four macroblocks settle
    * to per-MB flat values through the DC-prediction chain, then a
    * non-IDR P picture exercising every supported inter shape:
    * P_Skip (the 8.4.1.1 zero-MV edge rule — bit-copy of the
    * co-located reference MB), a P_L0_16x16 whose integer MV selects
    * its source MB by doc (mvd coded against the real 8.4.1.3
    * median predictor), a P_L0_16x16 with a FRACTIONAL
    * far-out-of-bounds MV — the full quarter-pel tap path runs with
    * every read clamped to the reference corner, so all 16 (xFrac,
    * yFrac) combinations cycle through the oracle while the 6-tap
    * output stays closed-form — and an intra I_16x16 inside the P
    * slice (its DC prediction reads the MC'd neighbours). Inter luma
    * residuals are uniform per-MB DC levels (QPy 36: exactly 10c),
    * inter chroma DC residuals land through the MC'd chroma path
    * (exactly 4c at QPc 34); the frame-0 DC spread (160f + 32) >> 6
    * replays as positive floor division. A wrong bit in mb_skip_run,
    * the MVP median, the Table 9-4 inter CBP column or the
    * interpolator desyncs the chain.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]), like every codec query. */
  private def m28: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      // frame 0: I_16x16 DC picture, per-MB flat values
      val dc = Array.tabulate(4) { mb =>
        val d = Array.ofDim[Int](4, 4)
        d(0)(0) = ((id + mb) % 4).toInt
        d
      }
      // frame 1: skip | moved | clamped-fractional | intra
      val kinds = Array(1, 0, 0, 2)
      val s1 = (id % 3).toInt
      val mv1 = Seq(Array(0, 0), Array(-64, 0), Array(0, 64))(s1)
      val fx = (id % 4).toInt
      val fy = ((id / 4) % 4).toInt
      val mvs = Array(Array(Array(0, 0)), Array(mv1),
        Array(Array(-400 - fx, -400 - fy)), Array(Array(0, 0)))
      val g1 = id % 2 == 1
      val g2 = (id / 2) % 2 == 1
      val c1 = (((id + 2) % 7) - 3).toInt
      val c2 = (((id + 4) % 7) - 3).toInt
      val coeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
      if (g1) for (blk <- 0 until 16) coeffs(1)(blk)(0) = c1
      if (g2) for (blk <- 0 until 16) coeffs(2)(blk)(0) = c2
      val cbDc = Array.fill(4)(Array.fill(2, 2)(0))
      val crDc = Array.fill(4)(Array.fill(2, 2)(0))
      cbDc(1)(0)(0) = (((id + 1) % 5) - 2).toInt
      crDc(1)(0)(0) = (((id + 3) % 5) - 2).toInt
      cbDc(2)(0)(0) = (((id + 5) % 5) - 2).toInt
      crDc(2)(0)(0) = (((id + 7) % 5) - 2).toInt
      val es = graft.operators.H264.encodeSps(2, 2, 0) ++
        graft.operators.H264.encodePps() ++
        graft.operators.H264Cavlc.encodeIntra16Frame(2, 2, dc, qp = 36,
          idrPicId = (id % 65536).toInt) ++
        graft.operators.H264Cavlc.encodePFrame(2, 2, kinds, mvs, coeffs,
          qp = 36, frameNum = 1, cbDc = cbDc, crDc = crDc)
      val frames = graft.operators.H264Cavlc.decodeIntra16FramesYuv(es)
      require(frames.size == 2)
      val (w, h, y0, _, _) = frames(0)
      val (_, _, y1, cb1, cr1) = frames(1)
      def mbVal(y: Array[Byte], mb: Int): Int =
        y(((mb >> 1) * 16) * 32 + (mb & 1) * 16) & 0xFF
      var ys = 0L
      var i = 0
      while (i < y0.length) { ys += (y0(i) & 0xFF) + (y1(i) & 0xFF); i += 1 }
      def csum(p: Array[Byte]): Long = {
        var s = 0L; var k = 0
        while (k < p.length) { s += p(k) & 0xFF; k += 1 }
        s
      }
      (id, w, h, mbVal(y0, 0), mbVal(y0, 1), mbVal(y0, 2), mbVal(y0, 3),
        mbVal(y1, 0), mbVal(y1, 1), mbVal(y1, 2), mbVal(y1, 3),
        csum(cb1), csum(cr1), ys)
    }.toDF("doc_id", "width", "height", "v0", "v1", "v2", "v3",
      "w0", "w1", "w2", "w3", "cb_sum", "cr_sum", "y_sum")
  }

  /** Sub-16x16 inter partitions on the oracle gate (m29): frame 0 is
    * m28's I_16x16-DC picture (four flat MBs v0..v3); frame 1 carries
    * one macroblock of EVERY partition shape — 16x8 (two MVs), 8x16
    * (two MVs), P_8x8 (four MVs + a uniform luma DC residual), and
    * P_L0_16x16 (with its own residual) — with every motion vector
    * MB-grid-aligned (multiples of 64 quarter-pels), so each
    * partition's prediction is the flat value of the frame-0 MB its
    * doc-selected source index names. Each mvd is coded against the
    * REAL partition predictor (8.4.1.3's directional 16x8/8x16 rules
    * and the cell-granular neighbour derivation run on every
    * partition), so a wrong rule shifts every later bit. QPy 36 keeps
    * the residuals exactly linear (10c).
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]), like every codec query. */
  private def m29: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      val dc = Array.tabulate(4) { mb =>
        val d = Array.ofDim[Int](4, 4)
        d(0)(0) = ((id + mb) % 4).toInt
        d
      }
      // source MB index per partition, by doc (periods co-prime-ish)
      def src(k: Int): Int = ((id / k) % 4).toInt
      val s = Array(src(1), src(3), src(5), src(7), src(9), src(11),
        src(13), src(17), src(19))
      // aligned MV from dest MB (mx,my) to source MB index sIdx
      def mv(mx: Int, my: Int, sIdx: Int): Array[Int] =
        Array(((sIdx & 1) - mx) * 64, ((sIdx >> 1) - my) * 64)
      val kinds = Array(3, 4, 5, 0) // 16x8 | 8x16 | P_8x8 | 16x16
      // MB2's four 8x8 blocks carry 8x4 / 4x8 / 4x4 / 8x8 sub_mb_types
      // (Table 7-17), nine sub-partitions in decoding order
      val subTypes = Array(Array(0, 0, 0, 0), Array(0, 0, 0, 0),
        Array(1, 2, 3, 0), Array(0, 0, 0, 0))
      val s9 = Array(23, 29, 31, 37, 41, 43, 47, 53, 59).map(k => src(k))
      val mvs = Array(
        Array(mv(0, 0, s(0)), mv(0, 0, s(1))),
        Array(mv(1, 0, s(2)), mv(1, 0, s(3))),
        s9.map(si => mv(0, 1, si)),
        Array(mv(1, 1, s(8))))
      val g2 = (id / 2) % 2 == 1
      val g3 = id % 2 == 1
      val c2 = (((id + 4) % 7) - 3).toInt
      val c3 = (((id + 2) % 7) - 3).toInt
      val coeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
      if (g2) for (blk <- 0 until 16) coeffs(2)(blk)(0) = c2
      if (g3) for (blk <- 0 until 16) coeffs(3)(blk)(0) = c3
      val es = graft.operators.H264.encodeSps(2, 2, 0) ++
        graft.operators.H264.encodePps() ++
        graft.operators.H264Cavlc.encodeIntra16Frame(2, 2, dc, qp = 36,
          idrPicId = (id % 65536).toInt) ++
        graft.operators.H264Cavlc.encodePFrame(2, 2, kinds, mvs, coeffs,
          qp = 36, frameNum = 1, subTypes = subTypes)
      val frames = graft.operators.H264Cavlc.decodeIntra16FramesYuv(es)
      require(frames.size == 2)
      val (w, h, y1) = (frames(1)._1, frames(1)._2, frames(1)._3)
      def px(x: Int, yy: Int): Int = y1(yy * 32 + x) & 0xFF
      var ys = 0L
      var i = 0
      while (i < y1.length) { ys += y1(i) & 0xFF; i += 1 }
      (id, w, h,
        px(0, 0), px(0, 8),          // 16x8 partitions
        px(16, 0), px(24, 0),        // 8x16 partitions
        // the nine MB2 sub-partitions in decoding order: 8x4 pair,
        // 4x8 pair, 4x4 quad, trailing 8x8
        px(0, 16), px(0, 20), px(8, 16), px(12, 16),
        px(0, 24), px(4, 24), px(0, 28), px(4, 28), px(8, 24),
        px(16, 16),                  // 16x16
        ys)
    }.toDF("doc_id", "width", "height", "a0", "a1", "b0", "b1",
      "q0", "q1", "q2", "q3", "q4", "q5", "q6", "q7", "q8",
      "w3", "y1_sum")
  }

  /** Bi-prediction on the oracle gate (m30): a three-frame low-delay
    * IPB GOP. Frame 0: the m28 I_16x16-DC chain (flat v0..v3); frame
    * 1: a P picture whose four 16x16 MBs copy doc-selected source MBs
    * (aligned MVs) plus uniform 10c residuals (p0..p3); frame 2: a
    * NON-REFERENCE B picture — B_L0_16x16 reads the P frame
    * (list0[0] = most recent reference), B_L1_16x16 reads the I frame
    * (list1[0] = the older one, the 8.2.4.2.5 swap's net effect),
    * B_Bi_16x16 lands the exact (L0 + L1 + 1) >> 1 rounded average of
    * two doc-selected flat sources, and an intra I_16x16 closes the
    * chain off its MC'd neighbours. Every mvd rides the real per-list
    * 8.4.1.3 predictors; a wrong reference-list order, averaging rule
    * or per-list MVP desyncs the chain.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]), like every codec query. */
  private def m30: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      val dc = Array.tabulate(4) { mb =>
        val d = Array.ofDim[Int](4, 4)
        d(0)(0) = ((id + mb) % 4).toInt
        d
      }
      def src(k: Int): Int = ((id / k) % 4).toInt
      def mv(mx: Int, my: Int, sIdx: Int): Array[Int] =
        Array(((sIdx & 1) - mx) * 64, ((sIdx >> 1) - my) * 64)
      // frame 1 (P): four P_L0_16x16, uniform DC residuals
      val pKinds = Array(0, 0, 0, 0)
      val pMvs = Array.tabulate(4)(m2 =>
        Array(mv(m2 & 1, m2 >> 1, src(Seq(1, 3, 5, 7)(m2)))))
      val pCoeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
      val cP = Array.tabulate(4)(m2 => (((id + m2) % 5) - 2).toInt)
      for (m2 <- 0 until 4; blk <- 0 until 16)
        pCoeffs(m2)(blk)(0) = cP(m2)
      // frame 2 (B): L0 | L1 | Bi | intra
      val bKinds = Array(0, 1, 2, 3)
      val bMvs0 = Array(
        mv(0, 0, src(9)), Array(0, 0), mv(0, 1, src(13)), Array(0, 0))
      val bMvs1 = Array(
        Array(0, 0), mv(1, 0, src(11)), mv(0, 1, src(17)), Array(0, 0))
      val dB = Array.tabulate(4)(m2 => (((id + 3 + m2) % 5) - 2).toInt)
      val bCoeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
      for (m2 <- 0 until 3; blk <- 0 until 16)
        bCoeffs(m2)(blk)(0) = dB(m2)
      val es = graft.operators.H264.encodeSps(2, 2, 0, numRefFrames = 2) ++
        graft.operators.H264.encodePps() ++
        graft.operators.H264Cavlc.encodeIntra16Frame(2, 2, dc, qp = 36,
          idrPicId = (id % 65536).toInt) ++
        graft.operators.H264Cavlc.encodePFrame(2, 2, pKinds, pMvs,
          pCoeffs, qp = 36, frameNum = 1) ++
        graft.operators.H264Cavlc.encodeBFrame(2, 2, bKinds, bMvs0,
          bMvs1, bCoeffs, qp = 36, frameNum = 2)
      val frames = graft.operators.H264Cavlc.decodeIntra16FramesYuv(es)
      require(frames.size == 3)
      val y1 = frames(1)._3
      val y2 = frames(2)._3
      def mbVal(y: Array[Byte], mb: Int): Int =
        y(((mb >> 1) * 16) * 32 + (mb & 1) * 16) & 0xFF
      var ys = 0L
      var i = 0
      while (i < y2.length) { ys += y2(i) & 0xFF; i += 1 }
      (id, frames(2)._1, frames(2)._2,
        mbVal(y1, 0), mbVal(y1, 1), mbVal(y1, 2), mbVal(y1, 3),
        mbVal(y2, 0), mbVal(y2, 1), mbVal(y2, 2), mbVal(y2, 3), ys)
    }.toDF("doc_id", "width", "height", "p0", "p1", "p2", "p3",
      "w0", "w1", "w2", "w3", "y2_sum")
  }

  /** Multi-reference lists on the oracle gate (m31): a three-frame
    * I-P-P GOP where the THIRD picture's list0 holds two entries
    * ([the P frame, the I frame], descending recency per 8.2.4.2.1)
    * and every partition names its reference through the te(v)-coded
    * ref_idx_l0 — a 16x16, a 16x8 pair, a P_8x8 quad (ref_idx per 8x8
    * block) and a second 16x16, each copying a doc-selected flat MB
    * from its doc-selected REFERENCE with an MB-aligned vector, so a
    * te(v) polarity slip, a list-order slip or a refIdx-matching slip
    * in the 8.4.1.3 predictor shifts values or desyncs the parse.
    * QPy 36 keeps MB0's residual exactly linear (10c).
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]), like every codec query. */
  private def m31: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      val dc = Array.tabulate(4) { mb =>
        val d = Array.ofDim[Int](4, 4)
        d(0)(0) = ((id + mb) % 4).toInt
        d
      }
      def src(k: Int): Int = ((id / k) % 4).toInt
      def ref(k: Int): Int = ((id / k) % 2).toInt
      def mv(mx: Int, my: Int, sIdx: Int): Array[Int] =
        Array(((sIdx & 1) - mx) * 64, ((sIdx >> 1) - my) * 64)
      // frame 1 (reference P): m30's shape — flat p0..p3
      val pKinds = Array(0, 0, 0, 0)
      val pMvs = Array.tabulate(4)(m2 =>
        Array(mv(m2 & 1, m2 >> 1, src(Seq(1, 3, 5, 7)(m2)))))
      val pCoeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
      for (m2 <- 0 until 4; blk <- 0 until 16)
        pCoeffs(m2)(blk)(0) = (((id + m2) % 5) - 2).toInt
      // frame 2 (two-entry list0)
      val kinds2 = Array(0, 3, 5, 0)
      val mvs2 = Array(
        Array(mv(0, 0, src(3))),
        Array(mv(1, 0, src(7)), mv(1, 0, src(11))),
        Array(mv(0, 1, src(23)), mv(0, 1, src(25)), mv(0, 1, src(27)),
          mv(0, 1, src(29))),
        Array(mv(1, 1, src(33))))
      val refIdxs2 = Array(
        Array(ref(2)),
        Array(ref(5), ref(9)),
        Array(ref(13), ref(15), ref(17), ref(19)),
        Array(ref(31)))
      val c0 = (((id + 6) % 5) - 2).toInt
      val coeffs2 = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
      for (blk <- 0 until 16) coeffs2(0)(blk)(0) = c0
      val es = graft.operators.H264.encodeSps(2, 2, 0, numRefFrames = 2) ++
        graft.operators.H264.encodePps() ++
        graft.operators.H264Cavlc.encodeIntra16Frame(2, 2, dc, qp = 36,
          idrPicId = (id % 65536).toInt) ++
        graft.operators.H264Cavlc.encodePFrame(2, 2, pKinds, pMvs,
          pCoeffs, qp = 36, frameNum = 1) ++
        graft.operators.H264Cavlc.encodePFrame(2, 2, kinds2, mvs2,
          coeffs2, qp = 36, frameNum = 2, numRefIdxL0 = 2,
          refIdxs = refIdxs2)
      val frames = graft.operators.H264Cavlc.decodeIntra16FramesYuv(es)
      require(frames.size == 3)
      val y2 = frames(2)._3
      def px(x: Int, yy: Int): Int = y2(yy * 32 + x) & 0xFF
      var ys = 0L
      var i = 0
      while (i < y2.length) { ys += y2(i) & 0xFF; i += 1 }
      (id, frames(2)._1, frames(2)._2,
        px(0, 0),                      // MB0 16x16
        px(16, 0), px(16, 8),          // MB1 16x8 pair
        px(0, 16), px(8, 16), px(0, 24), px(8, 24), // MB2 quads
        px(16, 16),                    // MB3 16x16
        ys)
    }.toDF("doc_id", "width", "height", "e0", "e1a", "e1b",
      "f0", "f1", "f2", "f3", "e3", "y2_sum")
  }

  /** Spatial direct prediction on the oracle gate (m32): a four-frame
    * I-P1-P2-B GOP in which the B picture's CO-LOCATED picture
    * (list1[0] = P1, the older of the two sliding-window references)
    * carries a real motion field, so the 8.4.1.2.2 colZeroFlag fires
    * doc-dependently: a P1 macroblock whose doc-selected source equals
    * its own position has a zero motion vector, and any direct/skip
    * quadrant co-located with it must zero its list-0 motion. The B
    * mixes all four macroblock classes:
    *
    *  - MB0 B_L0_16x16 explicit (source in P2 by doc, +10c residual);
    *  - MB1 B_Direct_16x16 WITH residual — refIdxL0 = MinPositive over
    *    {A=MB0:0, B/C/D unavailable} = 0, refIdxL1 = -1 (L0-only
    *    direct), MVP = mvA (8.4.1.3.1 left-only rule), so the MB reads
    *    P2 at MB0's vector shifted one MB right (column clamp makes
    *    both horizontal sources land in MB column 1) — UNLESS
    *    colZero(P1 MB1) zeroes it onto P2's co-located MB1;
    *  - MB2 B_Skip — refIdx via B=MB0, C=MB1's quadrant-2 cell, whose
    *    motion is itself colZero-dependent: the median MVP collapses
    *    to 0 when MB1 was zeroed (median(0, mv, 0)) and to MB0's mv
    *    otherwise, then MB2's own colZero(P1 MB2) may zero it again —
    *    a two-deep dependence on the co-located motion field;
    *  - MB3 B_Bi_16x16 explicit: exact (P2[sa] + P1[sb] + 1) >> 1
    *    rounded average plus residual.
    *
    * A colZero polarity slip, a wrong co-located picture (list0[0]
    * instead of list1[0]), a skip-run parse slip or a direct-MVP slip
    * moves w1/w2 between q-values the oracle distinguishes.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]), like every codec query. */
  private def m32: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      val dc = Array.tabulate(4) { mb =>
        val d = Array.ofDim[Int](4, 4)
        d(0)(0) = ((id + mb) % 4).toInt
        d
      }
      def src(k: Int): Int = ((id / k) % 4).toInt
      def mv(mx: Int, my: Int, sIdx: Int): Array[Int] =
        Array(((sIdx & 1) - mx) * 64, ((sIdx >> 1) - my) * 64)
      // frame 1 (reference P1, the future co-located picture): four
      // P_L0_16x16 with doc-selected aligned sources + 10c residuals
      val pKinds = Array(0, 0, 0, 0)
      val p1Src = Array.tabulate(4)(m2 => src(Seq(1, 3, 5, 7)(m2)))
      val pMvs = Array.tabulate(4)(m2 =>
        Array(mv(m2 & 1, m2 >> 1, p1Src(m2))))
      val pCoeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
      for (m2 <- 0 until 4; blk <- 0 until 16)
        pCoeffs(m2)(blk)(0) = (((id + m2) % 5) - 2).toInt
      // frame 2 (reference P2 = the B's list0[0]): same shape off P1
      val qMvs = Array.tabulate(4)(m2 =>
        Array(mv(m2 & 1, m2 >> 1, src(Seq(9, 11, 13, 15)(m2)))))
      val qCoeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
      for (m2 <- 0 until 4; blk <- 0 until 16)
        qCoeffs(m2)(blk)(0) = (((id + 4 + m2) % 5) - 2).toInt
      // frame 3 (non-reference B): explicit | direct | skip | bi
      val bKinds = Array(0, 4, 5, 2)
      val s0 = src(17)
      val bMvs0 = Array(
        mv(0, 0, s0), Array(0, 0), Array(0, 0), mv(1, 1, src(19)))
      val bMvs1 = Array(
        Array(0, 0), Array(0, 0), Array(0, 0), mv(1, 1, src(21)))
      val bCoeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
      for (blk <- 0 until 16) {
        bCoeffs(0)(blk)(0) = (((id + 8) % 5) - 2).toInt
        bCoeffs(1)(blk)(0) = (((id + 9) % 5) - 2).toInt
        bCoeffs(3)(blk)(0) = (((id + 11) % 5) - 2).toInt
      }
      // P1's list-0 motion field at 4x4-cell granularity — the
      // co-located data the encoder's direct mirror needs
      val colRef = Array.fill(8, 8)(0)
      val colMvx = Array.ofDim[Int](8, 8)
      val colMvy = Array.ofDim[Int](8, 8)
      for (m2 <- 0 until 4; cy <- 0 until 4; cx <- 0 until 4) {
        colMvx((m2 >> 1) * 4 + cy)((m2 & 1) * 4 + cx) = pMvs(m2)(0)(0)
        colMvy((m2 >> 1) * 4 + cy)((m2 & 1) * 4 + cx) = pMvs(m2)(0)(1)
      }
      val es = graft.operators.H264.encodeSps(2, 2, 0, numRefFrames = 2) ++
        graft.operators.H264.encodePps() ++
        graft.operators.H264Cavlc.encodeIntra16Frame(2, 2, dc, qp = 36,
          idrPicId = (id % 65536).toInt) ++
        graft.operators.H264Cavlc.encodePFrame(2, 2, pKinds, pMvs,
          pCoeffs, qp = 36, frameNum = 1) ++
        graft.operators.H264Cavlc.encodePFrame(2, 2, pKinds, qMvs,
          qCoeffs, qp = 36, frameNum = 2) ++
        graft.operators.H264Cavlc.encodeBFrame(2, 2, bKinds, bMvs0,
          bMvs1, bCoeffs, qp = 36, frameNum = 3,
          colRef = colRef, colMvx = colMvx, colMvy = colMvy)
      val frames = graft.operators.H264Cavlc.decodeIntra16FramesYuv(es)
      require(frames.size == 4)
      val y2 = frames(2)._3
      val y3 = frames(3)._3
      def mbVal(y: Array[Byte], mb: Int): Int =
        y(((mb >> 1) * 16) * 32 + (mb & 1) * 16) & 0xFF
      var ys = 0L
      var i = 0
      while (i < y3.length) { ys += y3(i) & 0xFF; i += 1 }
      (id, frames(3)._1, frames(3)._2,
        mbVal(y2, 0), mbVal(y2, 1), mbVal(y2, 2), mbVal(y2, 3),
        mbVal(y3, 0), mbVal(y3, 1), mbVal(y3, 2), mbVal(y3, 3), ys)
    }.toDF("doc_id", "width", "height", "q0", "q1", "q2", "q3",
      "w0", "w1", "w2", "w3", "y3_sum")
  }

  /** IMPLICIT weighted bi-prediction on the oracle gate (m38,
    * weighted_bipred_idc = 2): no weight table in the bitstream —
    * the weights fall out of POC distances through the same
    * DistScaleFactor machinery as temporal direct. The B picture's
    * doc-selected POC t in 1..7 sits between its references (I poc
    * 0, P poc 8), giving w1 = 8t toward the FUTURE picture and
    * w0 = 64 - 8t toward the past one: every Bi macroblock lands
    * ((L0*(64-8t) + L1*8t + 32) >> 6) — a sliding POC-proportional
    * blend the plain rounded average cannot reproduce for t != 4 —
    * while the uni L0/L1 macroblocks must stay UNWEIGHTED (8.4.2.3.1
    * weights only bi-predicted partitions). A POC slip, a
    * DistScaleFactor slip, or weighting the uni paths all move
    * oracle-separated outputs.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]), like every codec query. */
  private def m38: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      val dc = Array.tabulate(4) { mb =>
        val d = Array.ofDim[Int](4, 4)
        d(0)(0) = ((id + mb) % 4).toInt
        d
      }
      def src(k: Int): Int = ((id / k) % 4).toInt
      def mv(mx: Int, my: Int, sIdx: Int): Array[Int] =
        Array(((sIdx & 1) - mx) * 64, ((sIdx >> 1) - my) * 64)
      val tPoc = (1 + id % 7).toInt
      val pKinds = Array(0, 0, 0, 0)
      val pMvs = Array.tabulate(4)(m2 =>
        Array(mv(m2 & 1, m2 >> 1, src(Seq(1, 3, 5, 7)(m2)))))
      val pCoeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
      for (m2 <- 0 until 4; blk <- 0 until 16)
        pCoeffs(m2)(blk)(0) = (((id + m2) % 5) - 2).toInt
      // B (poc t, reordered lists: list0 = [I, P], list1 = [P, I])
      val bKinds = Array(2, 2, 0, 1) // Bi | Bi | L0 uni | L1 uni
      val bMvs0 = Array(
        mv(0, 0, src(9)), mv(1, 0, src(13)), mv(0, 1, src(19)),
        Array(0, 0))
      val bMvs1 = Array(
        mv(0, 0, src(11)), mv(1, 0, src(17)), Array(0, 0),
        mv(1, 1, src(21)))
      val bCoeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
      for (blk <- 0 until 16)
        bCoeffs(0)(blk)(0) = (((id + 6) % 5) - 2).toInt
      val es = graft.operators.H264.encodeSps(2, 2, 0, numRefFrames = 2,
        pocType = 0) ++
        graft.operators.H264.encodePps(weightedBipredIdc = 2) ++
        graft.operators.H264Cavlc.encodeIntra16Frame(2, 2, dc, qp = 36,
          idrPicId = (id % 65536).toInt, pocLsb = 0) ++
        graft.operators.H264Cavlc.encodePFrame(2, 2, pKinds, pMvs,
          pCoeffs, qp = 36, frameNum = 1, pocLsb = 8) ++
        graft.operators.H264Cavlc.encodeBFrame(2, 2, bKinds, bMvs0,
          bMvs1, bCoeffs, qp = 36, frameNum = 2, pocLsb = tPoc)
      val frames = graft.operators.H264Cavlc.decodeIntra16FramesYuv(es)
      require(frames.size == 3)
      val y1 = frames(1)._3
      val y2 = frames(2)._3
      def mbVal(y: Array[Byte], mb: Int): Int =
        y(((mb >> 1) * 16) * 32 + (mb & 1) * 16) & 0xFF
      var ys = 0L
      var i = 0
      while (i < y2.length) { ys += y2(i) & 0xFF; i += 1 }
      (id, frames(2)._1, frames(2)._2,
        mbVal(y1, 0), mbVal(y1, 1), mbVal(y1, 2), mbVal(y1, 3),
        mbVal(y2, 0), mbVal(y2, 1), mbVal(y2, 2), mbVal(y2, 3), ys)
    }.toDF("doc_id", "width", "height", "p0", "p1", "p2", "p3",
      "w0", "w1", "w2", "w3", "y2_sum")
  }

  /** Explicit weighted prediction on the oracle gate (m37): the
    * fade-handling tool real encoders reach for. The PPS sets
    * weighted_pred AND weighted_bipred_idc = 1, so the P and B slice
    * headers carry pred_weight_table (7.3.3.1) with doc-selected
    * luma weights/offsets at denominator 32, and every inter
    * prediction runs 8.4.2.3.2:
    *
    *  - P picture: p_m = ((v[src]*wP + 16) >> 5) + oP (+10c
    *    residual) — P_L0 copies are SCALED, so a decoder that skips
    *    the table desyncs the parse and one that ignores the weights
    *    shifts every P value;
    *  - B picture: B_L0 and a second B_L0 at the list-0 weights, a
    *    B_L1 at the list-1 weights, and a B_Bi landing the exact
    *    two-weight formula ((p*w0 + v*w1 + 32) >> 6) +
    *    ((o0 + o1 + 1) >> 1) — NOT the plain rounded average.
    *
    * Weights/offsets are chosen so no Clip1 binds; the oracle is
    * exact integer arithmetic end to end.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]), like every codec query. */
  private def m37: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      val dc = Array.tabulate(4) { mb =>
        val d = Array.ofDim[Int](4, 4)
        d(0)(0) = ((id + mb) % 4).toInt
        d
      }
      def src(k: Int): Int = ((id / k) % 4).toInt
      def mv(mx: Int, my: Int, sIdx: Int): Array[Int] =
        Array(((sIdx & 1) - mx) * 64, ((sIdx >> 1) - my) * 64)
      val wP = (24 + id % 17).toInt
      val oP = ((id % 11) - 5).toInt * 2
      val w0 = (26 + id % 7).toInt
      val o0 = ((id % 7) - 3).toInt
      val w1 = (30 + id % 5).toInt
      val o1 = ((id % 5) - 2).toInt
      val pKinds = Array(0, 0, 0, 0)
      val pMvs = Array.tabulate(4)(m2 =>
        Array(mv(m2 & 1, m2 >> 1, src(Seq(1, 3, 5, 7)(m2)))))
      val pCoeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
      for (m2 <- 0 until 4; blk <- 0 until 16)
        pCoeffs(m2)(blk)(0) = (((id + m2) % 5) - 2).toInt
      val bKinds = Array(0, 1, 2, 0) // L0 | L1 | Bi | L0
      val bMvs0 = Array(
        mv(0, 0, src(9)), Array(0, 0), mv(0, 1, src(13)),
        mv(1, 1, src(19)))
      val bMvs1 = Array(
        Array(0, 0), mv(1, 0, src(11)), mv(0, 1, src(17)), Array(0, 0))
      val bCoeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
      for (blk <- 0 until 16) {
        bCoeffs(0)(blk)(0) = (((id + 6) % 5) - 2).toInt
        bCoeffs(2)(blk)(0) = (((id + 8) % 5) - 2).toInt
      }
      val es = graft.operators.H264.encodeSps(2, 2, 0, numRefFrames = 2) ++
        graft.operators.H264.encodePps(weightedPred = true,
          weightedBipredIdc = 1) ++
        graft.operators.H264Cavlc.encodeIntra16Frame(2, 2, dc, qp = 36,
          idrPicId = (id % 65536).toInt) ++
        graft.operators.H264Cavlc.encodePFrame(2, 2, pKinds, pMvs,
          pCoeffs, qp = 36, frameNum = 1,
          wpDenom = 5, wpLuma = Array(Array(wP, oP))) ++
        graft.operators.H264Cavlc.encodeBFrame(2, 2, bKinds, bMvs0,
          bMvs1, bCoeffs, qp = 36, frameNum = 2,
          wpDenom = 5, wpLumaL0 = Array(Array(w0, o0)),
          wpLumaL1 = Array(Array(w1, o1)))
      val frames = graft.operators.H264Cavlc.decodeIntra16FramesYuv(es)
      require(frames.size == 3)
      val y1 = frames(1)._3
      val y2 = frames(2)._3
      def mbVal(y: Array[Byte], mb: Int): Int =
        y(((mb >> 1) * 16) * 32 + (mb & 1) * 16) & 0xFF
      var ys = 0L
      var i = 0
      while (i < y2.length) { ys += y2(i) & 0xFF; i += 1 }
      (id, frames(2)._1, frames(2)._2,
        mbVal(y1, 0), mbVal(y1, 1), mbVal(y1, 2), mbVal(y1, 3),
        mbVal(y2, 0), mbVal(y2, 1), mbVal(y2, 2), mbVal(y2, 3), ys)
    }.toDF("doc_id", "width", "height", "p0", "p1", "p2", "p3",
      "w0", "w1", "w2", "w3", "y2_sum")
  }

  /** Temporal direct prediction on the oracle gate (m36): the first
    * DISPLAY-REORDERED fixture — a pic_order_cnt_type 0 stream whose
    * B picture sits BETWEEN its references in output order (I poc 0,
    * P poc 8, B poc 2 decoded last), so the POC-bucketed list
    * initialisation puts the PAST picture in list0 and the FUTURE
    * picture in list1 (the co-located side), and
    * direct_spatial_mv_pred_flag = 0 selects the 8.4.1.2.3 TEMPORAL
    * derivation: tb = 2, td = 8, tx = (16384+4)/8 = 2048,
    * DistScaleFactor = (2*2048 + 32) >> 6 = 64, so mvL0 = mvCol/4
    * and mvL1 = -3*mvCol/4 exactly.
    *
    *  - MB0 B_Direct_16x16 over a ZERO co-located vector (+residual):
    *    the exact (I + P + 1) >> 1 co-located average;
    *  - MB1 B_Skip over co-located vector (-64, 0): mvL0 = (-16, 0)
    *    shifts the list0 (I) read 4 px LEFT — the leftmost four
    *    columns read v0, the rest v1 (a wrong DistScaleFactor moves
    *    the split or the values) — while mvL1 = (48, 0) clamps into
    *    flat p1;
    *  - MB2 explicit B_L0_16x16: reads the I frame — list0[0] is the
    *    PAST picture here, so a decoder that kept the low-delay
    *    most-recent-first order fails this macroblock;
    *  - MB3 explicit B_Bi_16x16 across both lists (+residual).
    *
    * pic_order_cnt_lsb rides every slice header (4 bits, MaxPocLsb
    * 16) and the B's POC is NOT derivable from decode order — a POC
    * slip reorders the lists and moves every output.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]), like every codec query. */
  private def m36: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      val dc = Array.tabulate(4) { mb =>
        val d = Array.ofDim[Int](4, 4)
        d(0)(0) = ((id + mb) % 4).toInt
        d
      }
      def src(k: Int): Int = ((id / k) % 4).toInt
      def mv(mx: Int, my: Int, sIdx: Int): Array[Int] =
        Array(((sIdx & 1) - mx) * 64, ((sIdx >> 1) - my) * 64)
      // P (poc 8): MB0/MB1 pinned to source 0 (zero / (-64,0) vectors
      // — the co-located motion the temporal derivation scales);
      // MB2/MB3 doc-selected
      val pKinds = Array(0, 0, 0, 0)
      val pSrc = Array(0, 0, src(5), src(7))
      val pMvs = Array.tabulate(4)(m2 =>
        Array(mv(m2 & 1, m2 >> 1, pSrc(m2))))
      val pCoeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
      for (m2 <- 0 until 4; blk <- 0 until 16)
        pCoeffs(m2)(blk)(0) = (((id + m2) % 5) - 2).toInt
      // B (poc 2): temporal direct | temporal skip | L0 | Bi
      val bKinds = Array(4, 5, 0, 2)
      val bMvs0 = Array(
        Array(0, 0), Array(0, 0), mv(0, 1, src(9)), mv(1, 1, src(11)))
      val bMvs1 = Array(
        Array(0, 0), Array(0, 0), Array(0, 0), mv(1, 1, src(13)))
      val bCoeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
      for (blk <- 0 until 16) {
        bCoeffs(0)(blk)(0) = (((id + 6) % 5) - 2).toInt
        bCoeffs(3)(blk)(0) = (((id + 9) % 5) - 2).toInt
      }
      val colRef = Array.fill(8, 8)(0)
      val colMvx = Array.ofDim[Int](8, 8)
      val colMvy = Array.ofDim[Int](8, 8)
      for (m2 <- 0 until 4; cy <- 0 until 4; cx <- 0 until 4) {
        colMvx((m2 >> 1) * 4 + cy)((m2 & 1) * 4 + cx) = pMvs(m2)(0)(0)
        colMvy((m2 >> 1) * 4 + cy)((m2 & 1) * 4 + cx) = pMvs(m2)(0)(1)
      }
      val es = graft.operators.H264.encodeSps(2, 2, 0, numRefFrames = 2,
        pocType = 0) ++
        graft.operators.H264.encodePps() ++
        graft.operators.H264Cavlc.encodeIntra16Frame(2, 2, dc, qp = 36,
          idrPicId = (id % 65536).toInt, pocLsb = 0) ++
        graft.operators.H264Cavlc.encodePFrame(2, 2, pKinds, pMvs,
          pCoeffs, qp = 36, frameNum = 1, pocLsb = 8) ++
        graft.operators.H264Cavlc.encodeBFrame(2, 2, bKinds, bMvs0,
          bMvs1, bCoeffs, qp = 36, frameNum = 2,
          colRef = colRef, colMvx = colMvx, colMvy = colMvy,
          directSpatial = false, pocLsb = 2, curPoc = 2,
          list0Pocs = Array(0, 8), list1Poc = 8,
          colL0Pocs = Array(0))
      val frames = graft.operators.H264Cavlc.decodeIntra16FramesYuv(es)
      require(frames.size == 3)
      val y1 = frames(1)._3
      val y2 = frames(2)._3
      def mbVal(y: Array[Byte], mb: Int): Int =
        y(((mb >> 1) * 16) * 32 + (mb & 1) * 16) & 0xFF
      def px(x: Int, yy: Int): Int = y2(yy * 32 + x) & 0xFF
      var ys = 0L
      var i = 0
      while (i < y2.length) { ys += y2(i) & 0xFF; i += 1 }
      (id, frames(2)._1, frames(2)._2,
        mbVal(y1, 0), mbVal(y1, 1), mbVal(y1, 2), mbVal(y1, 3),
        px(0, 0),            // MB0 temporal direct
        px(16, 0), px(24, 0), // MB1 skip: the DSF split columns
        px(0, 16), px(16, 16), ys)
    }.toDF("doc_id", "width", "height", "p0", "p1", "p2", "p3",
      "w0", "w1a", "w1b", "w2", "w3", "y2_sum")
  }

  /** B_8x8 sub-partitions on the oracle gate (m35): an I-P-B GOP
    * whose B picture is four B_8x8 macroblocks sweeping the whole
    * Table 7-17 B column —
    *
    *  - MB0: L0_8x8 | L1_8x8 | Bi_8x8 | DIRECT_8x8 (the corner MB has
    *    no neighbours, so the 8.4.1.2.2 derivation lands
    *    directZeroPrediction: BOTH lists at refIdx 0, zero motion —
    *    the quadrant is the exact bi-average of the two co-located
    *    reference areas);
    *  - MB1: 8x4 pair | 4x8 pair | 4x4 quad | 8x8, ALL Pred_L0 (nine
    *    doc-selected sources from the P frame);
    *  - MB2: the same geometry, ALL Pred_L1 (nine sources from the I
    *    frame — a list-routing mirror of MB1);
    *  - MB3: the same geometry, ALL BiPred (nine exact rounded
    *    averages, two doc-selected sources each).
    *
    * Each mvd rides its per-list 8.4.1.3 predictor under the
    * 6.4.10.7 sub-partition decoding-order availability (the direct
    * quadrant's derived cells included); 7.3.5.2's per-list mvd order
    * is load-bearing. Probes pin each macroblock's four 8x8-block
    * corners; the y-sum pins all 31 sub-partitions.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]), like every codec query. */
  private def m35: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      val dc = Array.tabulate(4) { mb =>
        val d = Array.ofDim[Int](4, 4)
        d(0)(0) = ((id + mb) % 4).toInt
        d
      }
      def src(k: Int): Int = ((id / k) % 4).toInt
      def mv(mx: Int, my: Int, sIdx: Int): Array[Int] =
        Array(((sIdx & 1) - mx) * 64, ((sIdx >> 1) - my) * 64)
      val pKinds = Array(0, 0, 0, 0)
      val pMvs = Array.tabulate(4)(m2 =>
        Array(mv(m2 & 1, m2 >> 1, src(Seq(1, 3, 5, 7)(m2)))))
      val pCoeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
      for (m2 <- 0 until 4; blk <- 0 until 16)
        pCoeffs(m2)(blk)(0) = (((id + m2) % 5) - 2).toInt
      val bKinds = Array(24, 24, 24, 24)
      val bSubTypes = Array(
        Array(1, 2, 3, 0),    // L0 | L1 | Bi | direct
        Array(4, 5, 10, 1),   // L0: 8x4 | 4x8 | 4x4 | 8x8
        Array(6, 7, 11, 2),   // L1 mirror
        Array(8, 9, 12, 3))   // Bi mirror
      val k1 = Seq(19, 21, 23, 25, 29, 31, 37, 41, 43)
      val k2 = Seq(47, 53, 59, 61, 67, 71, 73, 79, 83)
      val k3a = Seq(89, 97, 101, 103, 107, 109, 113, 127, 131)
      val k3b = Seq(137, 139, 149, 151, 157, 163, 167, 173, 179)
      val mvsL0S = Array(
        Array(mv(0, 0, src(9)), mv(0, 0, src(13))),
        k1.map(k => mv(1, 0, src(k))).toArray,
        Array.empty[Array[Int]],
        k3a.map(k => mv(1, 1, src(k))).toArray)
      val mvsL1S = Array(
        Array(mv(0, 0, src(11)), mv(0, 0, src(17))),
        Array.empty[Array[Int]],
        k2.map(k => mv(0, 1, src(k))).toArray,
        k3b.map(k => mv(1, 1, src(k))).toArray)
      val bCoeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
      val zz = Array(0, 0)
      val es = graft.operators.H264.encodeSps(2, 2, 0, numRefFrames = 2) ++
        graft.operators.H264.encodePps() ++
        graft.operators.H264Cavlc.encodeIntra16Frame(2, 2, dc, qp = 36,
          idrPicId = (id % 65536).toInt) ++
        graft.operators.H264Cavlc.encodePFrame(2, 2, pKinds, pMvs,
          pCoeffs, qp = 36, frameNum = 1) ++
        graft.operators.H264Cavlc.encodeBFrame(2, 2, bKinds,
          Array(zz, zz, zz, zz), Array(zz, zz, zz, zz), bCoeffs,
          qp = 36, frameNum = 2, bSubTypes = bSubTypes,
          mvsL0S = mvsL0S, mvsL1S = mvsL1S)
      val frames = graft.operators.H264Cavlc.decodeIntra16FramesYuv(es)
      require(frames.size == 3)
      val y2 = frames(2)._3
      def px(x: Int, yy: Int): Int = y2(yy * 32 + x) & 0xFF
      var ys = 0L
      var i = 0
      while (i < y2.length) { ys += y2(i) & 0xFF; i += 1 }
      // the four 8x8-block corners of each macroblock
      def mbCorners(mx: Int, my: Int): (Int, Int, Int, Int) =
        (px(mx * 16, my * 16), px(mx * 16 + 8, my * 16),
          px(mx * 16, my * 16 + 8), px(mx * 16 + 8, my * 16 + 8))
      val (a1, a2, a3, a4) = mbCorners(0, 0)
      val (u0, u1, u2, u3) = mbCorners(1, 0)
      val (w0, w1, w2, w3) = mbCorners(0, 1)
      val (b0, b1, b2, b3) = mbCorners(1, 1)
      (id, frames(2)._1, frames(2)._2, a1, a2, a3, a4,
        u0, u1, u2, u3, w0, w1, w2, w3, b0, b1, b2, b3, ys)
    }.toDF("doc_id", "width", "height", "a1", "a2", "a3", "a4",
      "u0", "u1", "u2", "u3", "w0", "w1", "w2", "w3",
      "b0", "b1", "b2", "b3", "y2_sum")
  }

  /** B two-partition types on the oracle gate (m34): an I-P-B GOP
    * whose B picture is four Table 7-14 two-partition macroblocks,
    * one per geometry/prediction family — B_L0_L1_16x8 (each half
    * names a DIFFERENT list: top reads the P frame, bottom the I
    * frame), B_Bi_L0_8x16 (exact rounded bi-average on the left
    * half only), B_L1_Bi_16x8 (the mirror), and B_L0_L0_8x16. Every
    * partition copies a doc-selected flat macroblock half with an
    * aligned vector, each mvd rides the per-list 8.4.1.3 predictor
    * at the partition's own geometry (the 16x8/8x16 directional
    * shortcuts bind per list), and 7.3.5.1's list-major mvd order
    * (all mvd_l0 before any mvd_l1) is load-bearing for the parse —
    * a swapped order, a Table 7-14 pair slip, or a per-partition
    * list-routing slip moves outputs between oracle-separated
    * values. Uniform 10c residuals ride MB0 and MB3.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]), like every codec query. */
  private def m34: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      val dc = Array.tabulate(4) { mb =>
        val d = Array.ofDim[Int](4, 4)
        d(0)(0) = ((id + mb) % 4).toInt
        d
      }
      def src(k: Int): Int = ((id / k) % 4).toInt
      def mv(mx: Int, my: Int, sIdx: Int): Array[Int] =
        Array(((sIdx & 1) - mx) * 64, ((sIdx >> 1) - my) * 64)
      // frame 1 (reference P): m30's shape — flat p0..p3
      val pKinds = Array(0, 0, 0, 0)
      val pMvs = Array.tabulate(4)(m2 =>
        Array(mv(m2 & 1, m2 >> 1, src(Seq(1, 3, 5, 7)(m2)))))
      val pCoeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
      for (m2 <- 0 until 4; blk <- 0 until 16)
        pCoeffs(m2)(blk)(0) = (((id + m2) % 5) - 2).toInt
      // frame 2 (B): kind = mb_type + 2
      val bKinds = Array(10, 19, 16, 7) // L0_L1_16x8 | Bi_L0_8x16 |
      // L1_Bi_16x8 | L0_L0_8x16
      val zz = Array(0, 0)
      val mvsL0P = Array(
        Array[Array[Int]](mv(0, 0, src(9)), null),
        Array[Array[Int]](mv(1, 0, src(13)), mv(1, 0, src(19))),
        Array[Array[Int]](null, mv(0, 1, src(23))),
        Array[Array[Int]](mv(1, 1, src(29)), mv(1, 1, src(31))))
      val mvsL1P = Array(
        Array[Array[Int]](null, mv(0, 0, src(11))),
        Array[Array[Int]](mv(1, 0, src(17)), null),
        Array[Array[Int]](mv(0, 1, src(21)), mv(0, 1, src(27))),
        Array[Array[Int]](null, null))
      val d0 = (((id + 8) % 5) - 2).toInt
      val d3 = (((id + 9) % 5) - 2).toInt
      val bCoeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
      for (blk <- 0 until 16) {
        bCoeffs(0)(blk)(0) = d0
        bCoeffs(3)(blk)(0) = d3
      }
      val es = graft.operators.H264.encodeSps(2, 2, 0, numRefFrames = 2) ++
        graft.operators.H264.encodePps() ++
        graft.operators.H264Cavlc.encodeIntra16Frame(2, 2, dc, qp = 36,
          idrPicId = (id % 65536).toInt) ++
        graft.operators.H264Cavlc.encodePFrame(2, 2, pKinds, pMvs,
          pCoeffs, qp = 36, frameNum = 1) ++
        graft.operators.H264Cavlc.encodeBFrame(2, 2, bKinds,
          Array(zz, zz, zz, zz), Array(zz, zz, zz, zz), bCoeffs,
          qp = 36, frameNum = 2, mvsL0P = mvsL0P, mvsL1P = mvsL1P)
      val frames = graft.operators.H264Cavlc.decodeIntra16FramesYuv(es)
      require(frames.size == 3)
      val y2 = frames(2)._3
      def px(x: Int, yy: Int): Int = y2(yy * 32 + x) & 0xFF
      var ys = 0L
      var i = 0
      while (i < y2.length) { ys += y2(i) & 0xFF; i += 1 }
      (id, frames(2)._1, frames(2)._2,
        px(0, 0), px(0, 8),    // MB0 top | bottom 16x8
        px(16, 0), px(24, 0),  // MB1 left | right 8x16
        px(0, 16), px(0, 24),  // MB2 top | bottom 16x8
        px(16, 16), px(24, 16), // MB3 left | right 8x16
        ys)
    }.toDF("doc_id", "width", "height", "w0t", "w0b", "w1l", "w1r",
      "w2t", "w2b", "w3l", "w3r", "y2_sum")
  }

  /** In-loop deblocking on the oracle gate (m33): two one-frame IDR
    * streams per doc whose PPS codes deblocking_filter_control_present
    * and whose slice enables the 8.7 filter (idc 0, zero offsets) —
    * unlike every other codec fixture, whose control-absent streams
    * decode to the pre-filter picture. Stream V is a 32x16 picture of
    * two flat I_16x16 macroblocks A | B (one vertical bS=4 macroblock
    * edge); stream H is its 16x32 transpose (one horizontal edge). The
    * doc-selected step |A - B| sweeps 0..60, crossing BOTH strong-
    * filter thresholds at QP 36: (alpha >> 2) + 2 = 14 (the 3-tap vs
    * 1-tap branch) and alpha = 50 (the filterSamplesFlag gate), so the
    * oracle pins alpha(36) = 50 — the table value anchored by the
    * published generator 0.8 * (2^(idx/6) - 1) — plus every strong-
    * filter tap sum, the p/q asymmetry, and the no-filter branch.
    * The chroma edges and almost every internal bS=3 edge are
    * arithmetic no-ops on flat content — EXCEPT the internal edge one
    * 4x4 ring into the q-side macroblock, which runs AFTER the
    * macroblock-edge strong filter (8.7 filters each macroblock's
    * edges sequentially in place) and whose p1-adjustment re-touches
    * the q2 sample by -1 for s in {3, 4, 11, 12}: the oracle models
    * that aftershock, pinning the sequential order itself, while of
    * the tC0 table it needs only tC0(36, bS=3) >= 1 (the raw
    * adjustment is already +-1 before the clip; full provenance note
    * in H264Deblock). Probes vp3..vq3 / hp3..hq3 are the eight
    * samples straddling each edge (p3/q3 must come back UNfiltered);
    * the y-sums pin every remaining pixel.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]), like every codec query. */
  private def m33: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      def dcArr(v: Int): Array[Array[Int]] = {
        val d = Array.ofDim[Int](4, 4)
        d(0)(0) = v
        d
      }
      def stream(wMbs: Int, hMbs: Int, f0: Int, f1: Int): Array[Byte] =
        graft.operators.H264.encodeSps(wMbs, hMbs, 0) ++
          graft.operators.H264.encodePps(deblockingControl = true) ++
          graft.operators.H264Cavlc.encodeIntra16Frame(wMbs, hMbs,
            Array(dcArr(f0), dcArr(f1)), qp = 36,
            idrPicId = (id % 65536).toInt, deblockIdc = 0)
      val a = (id % 7).toInt
      val b = (id % 25).toInt
      val a2 = ((id / 7) % 7).toInt
      val b2 = ((id / 25) % 25).toInt
      val fv = graft.operators.H264Cavlc
        .decodeIntra16FramesYuv(stream(2, 1, a, b))
      val fh = graft.operators.H264Cavlc
        .decodeIntra16FramesYuv(stream(1, 2, a2, b2))
      require(fv.size == 1 && fh.size == 1)
      val yv = fv(0)._3
      val yh = fh(0)._3
      var sv = 0L
      var i = 0
      while (i < yv.length) { sv += yv(i) & 0xFF; i += 1 }
      var sh = 0L
      i = 0
      while (i < yh.length) { sh += yh(i) & 0xFF; i += 1 }
      def vp(x: Int): Int = yv(x) & 0xFF // row 0 of the 32-wide V pic
      def hp(y: Int): Int = yh(y * 16) & 0xFF // col 0 of the H pic
      (id, fv(0)._1, fv(0)._2,
        vp(12), vp(13), vp(14), vp(15), vp(16), vp(17), vp(18), vp(19), sv,
        hp(12), hp(13), hp(14), hp(15), hp(16), hp(17), hp(18), hp(19), sh)
    }.toDF("doc_id", "width", "height",
      "vp3", "vp2", "vp1", "vp0", "vq0", "vq1", "vq2", "vq3", "ysum_v",
      "hp3", "hp2", "hp1", "hp0", "hq0", "hq1", "hq2", "hq3", "ysum_h")
  }

  /** LIVE-tC0 normal-filter deblocking on the oracle gate (m39):
    * closes r16 VERDICT "What's missing #1" — m33 certified the
    * strong filter end-to-end but kept the tC0 table off every oracle
    * path while it was a best-effort transcription. The table has
    * since been corrected against a second independent transcription
    * of Table 8-17 (13 rows changed) and is pinned entry-by-entry in
    * H264DeblockSpec; this fixture puts it LIVE on the DuckDB gate.
    *
    * Two two-frame streams per doc, each 32x16 (two macroblocks A | B
    * side by side), IDR filtered OFF (idc 1) then a P picture
    * filtered ON (idc 0) at QP 36:
    *  - stream A: both P MBs uncoded; MB0 mv (0,0), MB1 mv (0,4) — a
    *    pure motion discontinuity (|dmv_y| = 4 quarter-pel), so the
    *    MB edge is bS = 1 and every internal edge is bS = 0. The
    *    8.7.2.4 normal filter runs with tC0(36, 1) = 2, tC = 4 (flat
    *    sides), on the step s = vb - va swept 0..60 by the doc's DC
    *    choices: raw delta (3s+4)>>3 below the clip, the tC clamp
    *    from s ~ 12, the p1/q1 tC0 clamp from s ~ 9, and the
    *    filterSamplesFlag alpha(36) = 50 gate at s >= 50 — table
    *    VALUE and clip STRUCTURE both decide the pixels.
    *  - stream B: zero motion, MB1's LEFT-COLUMN 4x4 blocks carry a
    *    DC residual (+10c, c in 1..3), so cbp marks quadrants 0|2 and
    *    TWO bS = 2 edges run with tC0(36, 2) = 3: the MB edge (step
    *    sv + 10c, positive) and the internal x = 20 edge (step -10c,
    *    negative, reading the MB edge's q1 output as its p2 — the
    *    in-place sequential order again). c = 2 drives the q1
    *    adjustment's raw value to 5 > tC0: with the r15 table's
    *    inflated tC0(36, 2) = 4 this row hashes DIFFERENTLY, so the
    *    oracle now distinguishes the corrected table from the old one.
    * Probes are the eight samples straddling each live edge on row 0;
    * the plane sums pin row-uniformity and every untouched pixel.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]), like every codec query. */
  private def m39: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      def dcArr(v: Int): Array[Array[Int]] = {
        val d = Array.ofDim[Int](4, 4)
        d(0)(0) = v
        d
      }
      val a = (id % 7).toInt
      val b = (id % 25).toInt
      val c = 1 + ((id / 175) % 3).toInt
      val idr = graft.operators.H264.encodeSps(2, 1, 0) ++
        graft.operators.H264.encodePps(deblockingControl = true) ++
        graft.operators.H264Cavlc.encodeIntra16Frame(2, 1,
          Array(dcArr(a), dcArr(b)), qp = 36,
          idrPicId = (id % 65536).toInt, deblockIdc = 1)
      val zeroCoeffs = Array.fill(2)(Array.fill(16)(new Array[Int](16)))
      val pA = graft.operators.H264Cavlc.encodePFrame(2, 1,
        Array(0, 0), Array(Array(Array(0, 0)), Array(Array(0, 4))),
        zeroCoeffs, qp = 36, frameNum = 1, deblockIdc = 0)
      val coeffsB = Array.fill(2)(Array.fill(16)(new Array[Int](16)))
      Seq(0, 2, 8, 10).foreach(blk => coeffsB(1)(blk)(0) = c)
      val pB = graft.operators.H264Cavlc.encodePFrame(2, 1,
        Array(0, 0), Array(Array(Array(0, 0)), Array(Array(0, 0))),
        coeffsB, qp = 36, frameNum = 1, deblockIdc = 0)
      val fa = graft.operators.H264Cavlc.decodeIntra16FramesYuv(idr ++ pA)
      val fb = graft.operators.H264Cavlc.decodeIntra16FramesYuv(idr ++ pB)
      require(fa.size == 2 && fb.size == 2)
      val ya = fa(1)._3
      val yb = fb(1)._3
      var sa = 0L
      var i = 0
      while (i < ya.length) { sa += ya(i) & 0xFF; i += 1 }
      var sb = 0L
      i = 0
      while (i < yb.length) { sb += yb(i) & 0xFF; i += 1 }
      def pa(x: Int): Int = ya(x) & 0xFF // row 0
      def pb(x: Int): Int = yb(x) & 0xFF
      (id, fa(1)._1, fa(1)._2,
        pa(13), pa(14), pa(15), pa(16), pa(17), pa(18), sa,
        pb(14), pb(15), pb(16), pb(17), pb(18), pb(19), pb(20), pb(21), sb)
    }.toDF("doc_id", "width", "height",
      "ap2", "ap1", "ap0", "aq0", "aq1", "aq2", "ysum_a",
      "bp1a", "bp0a", "bq0a", "bq1a", "bp1b", "bp0b", "bq0b", "bq1b",
      "ysum_b")
  }

  /** Constrained intra prediction on the oracle gate (m40): PPS
    * constrained_intra_pred_flag makes intra prediction in P/B slices
    * treat INTER-coded neighbours as unavailable (samples and
    * Intra_NxN most-probable-mode), while nC (9.2.1) keeps the plain
    * same-slice availability. Two streams per doc share the SAME
    * slice payload bytes — only the PPS flag differs, which is itself
    * the 9.2.1 point: the entropy layer must not move. Each stream is
    * an IDR (flat va | anything) then a P picture [P_L0 mv (0,0) with
    * a chroma DC residual | intra I_16x16_2_0_0]:
    *  - unconstrained: the intra MB's luma DC prediction reads the
    *    inter MB's reconstructed right edge -> va; its chroma DC
    *    prediction reads the inter MB's chroma -> 128 + 4*level.
    *  - constrained: the left neighbour is inter, so both fall back
    *    to the no-neighbour DC default 128.
    * The probes pin the intra MB's luma and both chroma components
    * under each flag plus the inter MB's copy (unchanged by the
    * flag); the plane sums pin every remaining pixel.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]), like every codec query. */
  private def m40: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      def dcArr(v: Int): Array[Array[Int]] = {
        val d = Array.ofDim[Int](4, 4)
        d(0)(0) = v
        d
      }
      val a = (id % 7).toInt
      val cbL = (id % 5).toInt
      val crL = ((id / 5) % 5).toInt
      val sps = graft.operators.H264.encodeSps(2, 1, 0)
      val idr = graft.operators.H264Cavlc.encodeIntra16Frame(2, 1,
        Array(dcArr(a), dcArr(0)), qp = 36, idrPicId = (id % 65536).toInt)
      val cbDc = Array(Array(Array(cbL, 0), Array(0, 0)),
        Array(Array(0, 0), Array(0, 0)))
      val crDc = Array(Array(Array(crL, 0), Array(0, 0)),
        Array(Array(0, 0), Array(0, 0)))
      val pf = graft.operators.H264Cavlc.encodePFrame(2, 1,
        Array(0, 2), Array(Array(Array(0, 0)), Array[Array[Int]]()),
        Array.fill(2)(Array.fill(16)(new Array[Int](16))),
        qp = 36, frameNum = 1, cbDc = cbDc, crDc = crDc)
      def decode(constrained: Boolean) = {
        val pps = graft.operators.H264.encodePps(
          constrainedIntra = constrained)
        val fr = graft.operators.H264Cavlc
          .decodeIntra16FramesYuv(sps ++ pps ++ idr ++ pf)
        require(fr.size == 2)
        fr(1)
      }
      val (_, _, yu, cbu, cru) = decode(false)
      val (_, _, yc, cbc, crc) = decode(true)
      def sum(p: Array[Byte]): Long = {
        var s = 0L
        var i = 0
        while (i < p.length) { s += p(i) & 0xFF; i += 1 }
        s
      }
      (id, 32, 16,
        yu(0) & 0xFF, yu(16) & 0xFF, cbu(8) & 0xFF, cru(8) & 0xFF,
        sum(yu), sum(cbu), sum(cru),
        yc(16) & 0xFF, cbc(8) & 0xFF, crc(8) & 0xFF,
        sum(yc), sum(cbc), sum(crc))
    }.toDF("doc_id", "width", "height",
      "u_y0", "u_y1", "u_cb1", "u_cr1", "ysum_u", "cbsum_u", "crsum_u",
      "c_y1", "c_cb1", "c_cr1", "ysum_c", "cbsum_c", "crsum_c")
  }

  /** Multi-slice P deblocking with PER-SLICE idc on the oracle gate
    * (m41): 8.7 applies the idc/offsets of the slice containing q0,
    * and idc 2 isolates only CROSS-slice macroblock edges — semantics
    * m33 pinned for intra slices in spec tests only. One 16x32
    * two-macroblock column per doc, the P picture split into two
    * slices (one MB each), MB1 carrying a (4,0) motion discontinuity
    * against MB0's (0,0) — a bS = 1 horizontal MB edge at y = 16 that
    * is also the slice boundary. Three streams per doc share the same
    * macroblock payloads and differ only in the two slices' idc:
    *  - A = (0, 0): the edge filters — the m39 normal-filter closed
    *    form on step vb - va with live tC0(36, 1).
    *  - B = (0, 2): q0's slice says 2 and the p side is another
    *    slice -> the edge is SKIPPED, every row comes back raw.
    *  - C = (2, 0): the p-side slice's idc 2 is IRRELEVANT — q0's
    *    slice says 0, so the edge filters exactly like A.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]), like every codec query. */
  private def m41: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      def dcArr(v: Int): Array[Array[Int]] = {
        val d = Array.ofDim[Int](4, 4)
        d(0)(0) = v
        d
      }
      val a = (id % 7).toInt
      val b = (id % 25).toInt
      val head = graft.operators.H264.encodeSps(1, 2, 0) ++
        graft.operators.H264.encodePps(deblockingControl = true) ++
        graft.operators.H264Cavlc.encodeIntra16Frame(1, 2,
          Array(dcArr(a), dcArr(b)), qp = 36,
          idrPicId = (id % 65536).toInt, deblockIdc = 1)
      val zero = Array.fill(2)(Array.fill(16)(new Array[Int](16)))
      def stream(idcs: Array[Int]): Array[Byte] =
        head ++ graft.operators.H264Cavlc.encodePFrame(1, 2,
          Array(0, 0), Array(Array(Array(0, 0)), Array(Array(4, 0))),
          zero, qp = 36, frameNum = 1, sliceStarts = Array(0, 1),
          deblockIdcBySlice = idcs)
      def lumaOf(idcs: Array[Int]): Array[Byte] = {
        val fr = graft.operators.H264Cavlc
          .decodeIntra16FramesYuv(stream(idcs))
        require(fr.size == 2)
        fr(1)._3
      }
      val ya = lumaOf(Array(0, 0))
      val yb = lumaOf(Array(0, 2))
      val ycs = lumaOf(Array(2, 0))
      def sum(p: Array[Byte]): Long = {
        var s = 0L
        var i = 0
        while (i < p.length) { s += p(i) & 0xFF; i += 1 }
        s
      }
      def row(p: Array[Byte], r: Int): Int = p(r * 16) & 0xFF
      (id, 16, 32,
        row(ya, 13), row(ya, 14), row(ya, 15), row(ya, 16), row(ya, 17),
        row(ya, 18), sum(ya),
        row(yb, 14), row(yb, 15), row(yb, 16), row(yb, 17), sum(yb),
        row(ycs, 16), sum(ycs))
    }.toDF("doc_id", "width", "height",
      "ap2", "ap1", "ap0", "aq0", "aq1", "aq2", "ysum_a",
      "b14", "b15", "b16", "b17", "ysum_b", "c_q0", "ysum_c")
  }

  /** The m42 three-frame GOP: pocType-0 with DELIBERATELY non-monotone
    * POC in decode order (IDR poc 8, P1 poc 2, P2 poc 4), so the
    * decode-recency list0 [P1, IDR] the 8.2.4.2.1 init prescribes for
    * P slices DIFFERS from a POC-descending order [IDR, P1] — every
    * refIdx then decides which PICTURE a partition copies. `flipRefs`
    * inverts every ref_idx_l0 (what a POC-ordered list0 would have
    * resolved each index to), and `monotonePoc` re-poses the same
    * payload with in-order POCs (0, 2, 4); H264InterSpec uses both to
    * pin that P-list0 ignores POC entirely. */
  private[graft] def m42Stream(id: Long, flipRefs: Boolean = false,
      monotonePoc: Boolean = false): Array[Byte] = {
    val dc = Array.tabulate(4) { mb =>
      val d = Array.ofDim[Int](4, 4)
      d(0)(0) = ((id + mb) % 4).toInt
      d
    }
    def mv(mx: Int, my: Int, sIdx: Int): Array[Int] =
      Array(((sIdx & 1) - mx) * 64, ((sIdx >> 1) - my) * 64)
    // frame 1 (reference P, poc 2): flat p0..p3, residual NEVER zero
    // (10..40) so p[s] differs from its own source v[s] on every doc
    val pKinds = Array(0, 0, 0, 0)
    val pSrcK = Seq(2L, 3L, 5L, 7L)
    val pMvs = Array.tabulate(4)(m =>
      Array(mv(m & 1, m >> 1, ((id / pSrcK(m)) % 4).toInt)))
    val pCoeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
    for (m <- 0 until 4; blk <- 0 until 16)
      pCoeffs(m)(blk)(0) = (((id + 2 * m) % 4) + 1).toInt
    // frame 2 (poc 4, BETWEEN its two references): four P_L0_16x16,
    // each naming its reference through te(v) ref_idx_l0
    val refJ = Seq(2L, 5L, 7L, 11L)
    val srcQ = Seq(3L, 7L, 11L, 13L)
    val kinds2 = Array(0, 0, 0, 0)
    val mvs2 = Array.tabulate(4)(m =>
      Array(mv(m & 1, m >> 1, ((id / srcQ(m)) % 4).toInt)))
    val refIdxs2 = Array.tabulate(4) { m =>
      val r = ((id / refJ(m)) % 2).toInt
      Array(if (flipRefs) 1 - r else r)
    }
    val c6 = (((id + 6) % 5) - 2).toInt
    val coeffs2 = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
    for (blk <- 0 until 16) coeffs2(0)(blk)(0) = c6
    graft.operators.H264.encodeSps(2, 2, 0, numRefFrames = 2,
      pocType = 0) ++
      graft.operators.H264.encodePps() ++
      graft.operators.H264Cavlc.encodeIntra16Frame(2, 2, dc, qp = 36,
        idrPicId = (id % 65536).toInt,
        pocLsb = if (monotonePoc) 0 else 8) ++
      graft.operators.H264Cavlc.encodePFrame(2, 2, pKinds, pMvs,
        pCoeffs, qp = 36, frameNum = 1, pocLsb = 2) ++
      graft.operators.H264Cavlc.encodePFrame(2, 2, kinds2, mvs2,
        coeffs2, qp = 36, frameNum = 2, numRefIdxL0 = 2,
        refIdxs = refIdxs2, pocLsb = 4)
  }

  /** Decode-order vs POC-order reference lists on the oracle gate
    * (m42): the round-17 P-list0 fix (8.2.4.2.1 orders by descending
    * PicNum — decode recency — never POC) certified spec-to-spec only,
    * because every earlier fixture's decode order agreed with its POC
    * order. This GOP breaks the tie: the IDR's POC (8) is HIGHER than
    * the first P reference's (2), so when the third picture (poc 4,
    * display-between its references) builds list0, recency says
    * [P1, IDR] while a POC-descending implementation says [IDR, P1] —
    * and all four macroblocks name references through te(v) ref_idx_l0,
    * so either order decides which picture every partition copies and
    * the DuckDB gate hash-mismatches a POC-ordered list0 (the flipped
    * twin in [[m42Stream]], pinned by H264InterSpec).
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]), like every codec query. */
  private def m42: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      val frames = graft.operators.H264Cavlc
        .decodeIntra16FramesYuv(m42Stream(id))
      require(frames.size == 3)
      val y2 = frames(2)._3
      def px(x: Int, yy: Int): Int = y2(yy * 32 + x) & 0xFF
      var ys = 0L
      var i = 0
      while (i < y2.length) { ys += y2(i) & 0xFF; i += 1 }
      (id, frames(2)._1, frames(2)._2,
        px(0, 0), px(16, 0), px(0, 16), px(16, 16), ys)
    }.toDF("doc_id", "width", "height", "e0", "e1", "e2", "e3",
      "y2_sum")
  }

  /** The m43 GOP: IDR + 14 all-skip P pictures walk frame_num to 15
    * (the SPS sets log2_max_frame_num_minus4 = 0, so MaxFrameNum = 16
    * and every slice header carries a 4-bit frame_num), then a
    * reference P picture with frame_num 0 fires the 8.2.1.3
    * FrameNumOffset += MaxFrameNum wrap, and a non-reference temporal-
    * direct B (frame_num 0 again, poc 2*(16+0)-1 = 31) sits BETWEEN
    * the two wrapped-side references in output order. Built by the
    * fixture and by H264InterSpec's closed-form replay. */
  /** m43's doc-INDEPENDENT bytes, encoded once per executor JVM: the
    * SPS/PPS head and the 14 all-skip P pictures that walk frame_num
    * 1..14 (each is just a slice header + mb_skip_run 4, but encoding
    * them 5,000 times per task was pure waste). */
  private lazy val m43Head: Array[Byte] =
    graft.operators.H264.encodeSps(2, 2, 0, numRefFrames = 2,
      log2MaxFrameNumMinus4 = 0) ++ graft.operators.H264.encodePps()

  private lazy val m43SkipRun: Array[Byte] = {
    val skipMvs = Array.fill(4)(Array.empty[Array[Int]])
    val skipCoeffs = Array.fill(4)(Array.empty[Array[Int]])
    (1 to 14).toArray.flatMap(fn =>
      graft.operators.H264Cavlc.encodePFrame(2, 2, Array(1, 1, 1, 1),
        skipMvs, skipCoeffs, qp = 36, frameNum = fn, frameNumBits = 4))
  }

  private[graft] def m43Stream(id: Long): Array[Byte] = {
    val dc = Array.tabulate(4) { mb =>
      val d = Array.ofDim[Int](4, 4)
      d(0)(0) = ((id + mb) % 4).toInt
      d
    }
    def mv(mx: Int, my: Int, sIdx: Int): Array[Int] =
      Array(((sIdx & 1) - mx) * 64, ((sIdx >> 1) - my) * 64)
    val kF = Seq(3L, 5L, 7L, 11L)
    val gA = Seq(2L, 3L, 5L, 7L)
    val gB = Seq(11L, 13L, 17L, 19L)
    def ax(m: Int): Int = ((id / gA(m)) % 2).toInt
    def ay(m: Int): Int = ((id / gB(m)) % 2).toInt
    // f15 (poc 30): doc-selected copies of the (still-IDR-valued)
    // plane, residual never zero
    val fKinds = Array(0, 0, 0, 0)
    val fMvs = Array.tabulate(4)(m =>
      Array(mv(m & 1, m >> 1, ((id / kF(m)) % 4).toInt)))
    val fCoeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
    for (m <- 0 until 4; blk <- 0 until 16)
      fCoeffs(m)(blk)(0) = (((id + 3 * m) % 4) + 1).toInt
    // f0w (the WRAPPED reference, poc 2*(16+0) = 32): MB-pair-aligned
    // vectors (128 qpel = 32 px, clamping into f15's right/bottom
    // macroblocks) — the co-located motion the B's 8.4.1.2.3 scales
    val wKinds = Array(0, 0, 0, 0)
    val wMvs = Array.tabulate(4)(m =>
      Array(Array(128 * ax(m), 128 * ay(m))))
    val wCoeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
    for (m <- 0 until 4; blk <- 0 until 16)
      wCoeffs(m)(blk)(0) = (((id + 1 + 2 * m) % 4) + 1).toInt
    // B (poc 31): all four macroblocks B_Direct_16x16; tb = 1, td = 2
    // EXIST only because the wrap put f0w at 32 — DSF = 128, so
    // mvL0 = mvCol/2 (16 px) and mvL1 = -mvCol/2
    val bKinds = Array(4, 4, 4, 4)
    val bZero = Array.fill(4)(Array(0, 0))
    val bCoeffs = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
    for (blk <- 0 until 16)
      bCoeffs(0)(blk)(0) = (((id + 6) % 5) - 2).toInt
    val colRef = Array.fill(8, 8)(0)
    val colMvx = Array.ofDim[Int](8, 8)
    val colMvy = Array.ofDim[Int](8, 8)
    for (m <- 0 until 4; cy <- 0 until 4; cx <- 0 until 4) {
      colMvx((m >> 1) * 4 + cy)((m & 1) * 4 + cx) = 128 * ax(m)
      colMvy((m >> 1) * 4 + cy)((m & 1) * 4 + cx) = 128 * ay(m)
    }
    val nals = scala.collection.mutable.ArrayBuffer.empty[Byte]
    nals ++= m43Head
    nals ++= graft.operators.H264Cavlc.encodeIntra16Frame(2, 2, dc,
      qp = 36, idrPicId = (id % 65536).toInt, frameNumBits = 4)
    nals ++= m43SkipRun
    nals ++= graft.operators.H264Cavlc.encodePFrame(2, 2, fKinds, fMvs,
      fCoeffs, qp = 36, frameNum = 15, frameNumBits = 4)
    nals ++= graft.operators.H264Cavlc.encodePFrame(2, 2, wKinds, wMvs,
      wCoeffs, qp = 36, frameNum = 0, frameNumBits = 4)
    nals ++= graft.operators.H264Cavlc.encodeBFrame(2, 2, bKinds, bZero,
      bZero, bCoeffs, qp = 36, frameNum = 0, frameNumBits = 4,
      colRef = colRef, colMvx = colMvx, colMvy = colMvy,
      directSpatial = false, curPoc = 31,
      list0Pocs = Array(30, 32), list1Poc = 32,
      colL0Pocs = Array(30, 28))
    nals.toArray
  }

  /** frame_num wrap on the oracle gate (m43): the 8.2.1.3
    * FrameNumOffset += MaxFrameNum step (round-17 fix, previously
    * spec-test-pinned only) decides pixels — and MaxFrameNum itself is
    * SPS-driven (log2_max_frame_num_minus4 = 0 here, so frame_num is a
    * 4-BIT field wrapping at 16; a decoder hardwired to u(8) desyncs
    * on the first slice header). frame_num walks 0..15 (14 all-skip P
    * pictures keep the plane constant), a reference P with frame_num 0
    * WRAPS (FrameNumOffset 16 -> poc 32, one MORE than the pre-wrap
    * f15's 30 instead of 0), and a non-reference temporal-direct B
    * lands at poc 31 — BETWEEN its references only because the wrap
    * fired. Its 8.4.1.2.3 scaling (tb = 31-30 = 1, td = 32-30 = 2,
    * DSF = 128 -> mvL0 = mvCol/2, mvL1 = -mvCol/2) and the POC-identity
    * refIdxL0 lookup both read wrapped POCs. A decoder that drops the
    * offset computes poc(f0w) = 0 and poc(B) = -1: both references
    * become "future", the identical-list swap flips the co-located
    * side to f15, and the co-located reference POC (28) resolves
    * nowhere in [0, 30] — the 8.4.1.2.3 derivation fails loudly
    * instead of limping, so the gate distinguishes the wrap as hard as
    * a hash mismatch.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]); 18 pictures of 4 macroblocks
    * each keep the per-row cost flat. */
  private def m43: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      val frames = graft.operators.H264Cavlc
        .decodeIntra16FramesYuv(m43Stream(id))
      require(frames.size == 18)
      val yp = frames(15)._3
      val yw = frames(16)._3
      val yb = frames(17)._3
      def mbVal(y: Array[Byte], mb: Int): Int =
        y(((mb >> 1) * 16) * 32 + (mb & 1) * 16) & 0xFF
      var ys = 0L
      var i = 0
      while (i < yb.length) { ys += yb(i) & 0xFF; i += 1 }
      (id, frames(17)._1, frames(17)._2,
        mbVal(yp, 0), mbVal(yp, 1), mbVal(yp, 2), mbVal(yp, 3),
        mbVal(yw, 0), mbVal(yw, 1), mbVal(yw, 2), mbVal(yw, 3),
        mbVal(yb, 0), mbVal(yb, 1), mbVal(yb, 2), mbVal(yb, 3), ys)
    }.toDF("doc_id", "width", "height", "p0", "p1", "p2", "p3",
      "w0", "w1", "w2", "w3", "b0", "b1", "b2", "b3", "yb_sum")
  }

  /** Audio fingerprint dedup (m44): the Haitsma-Kalker idea — quantize
    * each frame's spectral BAND-ENERGY DISTRIBUTION, not its absolute
    * energies — over the WAV + FWHT stack m3/m18 pinned, then exact-dup
    * audio by grouping on the fingerprint. Per doc: a 96-sample PCM
    * track (docs come in groups of four: an original, a 2x-GAIN copy,
    * a structural perturbation, different content), WAV round-trip,
    * three 32-sample FWHT frames, four band energies each, and per
    * band r = (16*e) // total — a RATIO, so the g^2 energy scale of a
    * gain change cancels EXACTLY in integer division and the gain copy
    * fingerprints identically while the perturbed/different tracks
    * diverge. The 12 five-bit ratios pack into one 60-bit BIGINT; a
    * single hash shuffle on it yields keeper/duplicate-count per doc.
    *
    * Scale: the fingerprint is an id-spread per-asset map (the codec
    * class); the dedup is d1's groupBy-on-fingerprint shape — one
    * map-side-combinable exchange on a 8-byte key, at 100 TB the same
    * plan with more partitions. */
  private def m44: Q = (spark, dir) => {
    import spark.implicits._
    val fps = docIds(spark, dir).as[Long]
      .map { id =>
        val group = id / 4
        val role = (id % 4).toInt
        val n = 96
        val base = Array.tabulate(n)(i =>
          ((group * 997 + i * i * 31 + i * 13) % 15000).toInt)
        val pcm = role match {
          case 0 => base
          case 1 => base.map(_ * 2) // gain x2: fingerprint-invariant
          case 2 => Array.tabulate(n)(i => base(i) + (i % 5) * 900)
          case _ => Array.tabulate(n)(i =>
            ((group * 997 + 1234 + i * i * 17 + i * 29) % 15000).toInt)
        }
        val wav = Multimodal.encodeWavPcm16(8000, pcm.map(_.toShort))
        val (_, _, dec) = Multimodal.decodeWavPcm16(wav)
        var fp = 0L
        var f = 0
        while (f < 3) {
          val frame = Array.tabulate(32)(i => dec(f * 32 + i).toLong)
          val c = Multimodal.fwht(frame)
          val e = new Array[Long](4)
          var k = 0
          while (k < 32) { e(k / 8) += c(k) * c(k); k += 1 }
          val tot = e(0) + e(1) + e(2) + e(3)
          k = 0
          while (k < 4) {
            fp |= (16L * e(k) / tot) << (5 * (f * 4 + k))
            k += 1
          }
          f += 1
        }
        (id, fp)
      }.toDF("doc_id", "fp")
    val groups = fps.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_dups"))
    fps.join(groups, "fp")
      .select(col("doc_id"), col("fp"), col("keeper"), col("n_dups"),
        (col("doc_id") > col("keeper")).as("is_dup"))
  }

  /** Video perceptual-hash dedup (m45): m44's dedup idea on the VISUAL
    * stack — per doc a short video (3-6 frames of 9×8 gray, frame
    * count and content keyed by group g = doc_id % 200), every frame
    * round-tripped through the REAL 24bpp BMP codec (m4's) and
    * perceptually hashed with m9's dHash, then the per-frame hashes
    * fold order-weighted ((f+1)·hash, disjoint 32-bit halves so the
    * sums stay overflow-free) into one video fingerprint, and exact-dup
    * videos group on it. Docs sharing g differ by a CONSTANT BRIGHTNESS
    * offset ((doc_id / 200) % 100, bounded so no pixel wraps): dHash
    * compares adjacent pixels, a constant offset cancels in every
    * comparison, so re-encodes at different brightness fingerprint
    * identically — the visual analogue of m44's gain invariance —
    * while different-g content diverges. The oracle replays pixel
    * formula, comparisons, bit packing and the weighted fold exactly.
    *
    * Scale: id-spread per-asset decode map (the codec class), then
    * d1's groupBy-on-fingerprint — one map-side-combinable exchange
    * on a 16-byte key. */
  private def m45: Q = (spark, dir) => {
    import spark.implicits._
    val W = 9
    val H = 8
    val fps = docIds(spark, dir).as[Long].map { id =>
      val g = (id % 200).toInt
      val off = ((id / 200) % 100).toInt
      val nf = 3 + g % 4
      var vlo = 0L
      var vhi = 0L
      var f = 0
      while (f < nf) {
        val plane = Array.tabulate(W * H)(i =>
          (off + (g * 131 + f * 17 + i * 7) % 156).toByte)
        val bmp = Multimodal.encodeBmp24(W, H, plane)
        val (_, _, dec) = Multimodal.decodeBmp24(bmp)
        var lo = 0L
        var hi = 0L
        var r = 0
        while (r < H) {
          var c = 0
          while (c < 8) {
            val a = dec(r * W + c) & 0xFF
            val b = dec(r * W + c + 1) & 0xFF
            if (b > a) {
              val bit = r * 8 + c
              if (bit < 32) lo |= 1L << bit else hi |= 1L << (bit - 32)
            }
            c += 1
          }
          r += 1
        }
        vlo += (f + 1) * lo
        vhi += (f + 1) * hi
        f += 1
      }
      (id, vlo, vhi, nf)
    }.toDF("doc_id", "v_lo", "v_hi", "n_frames")
    val groups = fps.groupBy(col("v_lo"), col("v_hi"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_dups"))
    fps.join(groups, Seq("v_lo", "v_hi"))
      .select(col("doc_id"), col("v_lo"), col("v_hi"), col("n_frames"),
        col("keeper"), col("n_dups"),
        (col("doc_id") > col("keeper")).as("is_dup"))
  }

  /** m27's 23 output columns (one past the Tuple22 ceiling). MUST stay
    * non-private: a `private` nested case class is JVM-private, Janino-
    * generated serializer code cannot call its accessors, and the
    * encoder silently degrades every m27 run to interpreted projection
    * (round-17 verdict; CodegenGuardSpec keeps the failing shape as a
    * positive control and the test session runs CODEGEN_ONLY so a
    * regression is red, not a WARN). The oracle-facing column names
    * (u0/b0../y_sum) are restored by an explicit toDF. */
  case class M27Row(docId: Long, widthPx: Int, heightPx: Int,
      up0: Int, up2: Int, up3: Int, blk0: Int, blk1: Int, blk2: Int,
      blk3: Int, blk4: Int, blk5: Int, blk6: Int, blk7: Int, blk8: Int,
      blk9: Int, blk10: Int, blk11: Int, blk12: Int, blk13: Int,
      blk14: Int, blk15: Int, lumaSum: Long)

  /** I_8x8 (transform_size_8x8) decode on the oracle gate (m27): each
    * asset is one High-profile IDR picture of 2x2 MIXED macroblocks —
    * an all-zero I_16x16 (flat 128), an I_8x8 with cbp 0 whose four
    * blocks walk the MPM flag/rem syntax through ALL NINE 8.3.2 modes
    * over a uniform-128 neighbourhood (any desync in the
    * transform_size_8x8_flag, mode syntax or reference filtering
    * shifts every later bit), an I_8x8 carrying DC residuals through
    * the 7.3.5.3.2 CAVLC interleave + 8.5.13 dequant/transform, and an
    * I_4x4 whose 16-block recurrence reads the I_8x8 MB's
    * reconstruction (cross-shape MPM and prediction). Closed form by
    * construction: QPy 36 makes both residual paths exactly linear
    * (8x8 DC: (320c+32)>>6 = 5c; 4x4 DC: (640c+32)>>6 = 10c), the
    * I_8x8 residual MB pairs its top blocks' coefficients so the
    * (1,2,1) reference filter always sees flat edges, and every
    * prediction reduces to a neighbour value or the rounded average —
    * an integer recurrence DuckDB replays with lateral column
    * references, clip never binding.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]), like every codec query. */
  private def m27: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      def zpos4(b: Int): (Int, Int) =
        (((b >> 2) & 1) * 8 + (b & 1) * 4, ((b >> 3) & 1) * 8 + ((b >> 1) & 1) * 4)
      val kinds = Array(2, 0, 0, 1) // I_16x16 | I_8x8 syntax | I_8x8 res | I_4x4
      // MB1: uniform-128 neighbourhood — top row left-only modes,
      // bottom row all nine
      val modes8 = Array.ofDim[Int](4, 4)
      modes8(1) = Array(
        Array(1, 2, 8)((id % 3).toInt),
        Array(1, 2, 8)(((id + 1) % 3).toInt),
        ((id + 2) % 9).toInt,
        ((id + 3) % 9).toInt)
      // MB2: top-only flat modes; blocks 0/1 share a coefficient so
      // the filtered top of blocks 2/3 stays flat
      modes8(2) = Array(
        Array(0, 2, 3, 7)((id % 4).toInt),
        Array(0, 3, 7)(((id + 1) % 3).toInt),
        Array(0, 2, 3, 7)(((id + 2) % 4).toInt),
        Array(0, 3, 7)(((id + 3) % 3).toInt))
      val coeffs8 = Array.fill(4)(Array.fill(4)(new Array[Int](64)))
      val g0 = id % 2 == 1
      val g2 = (id / 2) % 2 == 1
      val g3 = (id / 4) % 2 == 1
      val c0 = ((id % 7) - 3).toInt
      val c2 = (((id + 10) % 7) - 3).toInt
      val c3 = (((id + 15) % 7) - 3).toInt
      if (g0) { coeffs8(2)(0)(0) = c0; coeffs8(2)(1)(0) = c0 }
      if (g2) coeffs8(2)(2)(0) = c2
      if (g3) coeffs8(2)(3)(0) = c3
      // MB3 (I_4x4): every block has both neighbours — interior rule
      // T / L / (T+L+1)>>1 / L by (id+blk)%4, small +-1 DC residuals
      val modes4 = Array.fill(4)(Array.fill(16)(2))
      modes4(3) = Array.tabulate(16)(blk => Array(0, 1, 2, 8)(((id + blk) % 4).toInt))
      val cbp4 = 1 + (id % 15).toInt
      val coeffs4 = Array.fill(4)(Array.fill(16)(new Array[Int](16)))
      for (blk <- 0 until 16 if ((cbp4 >> (blk >> 2)) & 1) == 1)
        coeffs4(3)(blk)(0) = (((id + 3 * blk) % 3) - 1).toInt
      val es = graft.operators.H264.encodeSpsHigh(2, 2, 0) ++
        graft.operators.H264.encodePpsT8() ++
        graft.operators.H264Cavlc.encodeIntra8x8Frame(2, 2, kinds,
          modes8, coeffs8, modes4, coeffs4, qp = 36,
          idrPicId = (id % 65536).toInt)
      val frames = graft.operators.H264Cavlc.decodeIntra16Frames(es)
      require(frames.size == 1)
      val (w, h, y) = frames.head
      // probes: the three distinct I_8x8 residual-block values and the
      // full I_4x4 chain
      def u(b8: Int): Int = {
        val gx = (b8 & 1) * 8
        val gy = 16 + (b8 >> 1) * 8
        y(gy * 32 + gx) & 0xFF
      }
      def bval(blk: Int): Int = {
        val (ox, oy) = zpos4(blk)
        y((16 + oy) * 32 + 16 + ox) & 0xFF
      }
      var s = 0L; var i = 0
      while (i < y.length) { s += y(i) & 0xFF; i += 1 }
      M27Row(id, w, h, u(0), u(2), u(3), bval(0), bval(1), bval(2),
        bval(3), bval(4), bval(5), bval(6), bval(7), bval(8), bval(9),
        bval(10), bval(11), bval(12), bval(13), bval(14), bval(15), s)
    }.toDF("doc_id", "width", "height", "u0", "u2", "u3",
      "b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7", "b8", "b9",
      "b10", "b11", "b12", "b13", "b14", "b15", "y_sum")
  }

  /** I_4x4 spatial decode on the oracle gate (m26): each asset is one
    * IDR picture whose single macroblock is mb_type 0 — per-4x4-block
    * spatial prediction with per-block modes, the most-probable-mode
    * flag/rem syntax (8.3.1.1), the Table 9-4 me(v) coded_block_pattern
    * (mask 1 + doc_id % 15 walks all 15 nonzero luma patterns, so
    * whole 8x8 groups come and go), and per-coded-block LumaLevel4x4
    * residuals. The fixture keeps every reconstruction step
    * closed-form: each coded block carries ONE DC coefficient (flat
    * residual, exactly 4c at QPy 28) and every assigned mode reads a
    * FLAT already-reconstructed edge — top-row blocks see only their
    * left block (modes 1/2/8 all reduce to vL), left-column blocks
    * only their top (modes 0/2 -> vT), interior blocks pick
    * T / L / (vL+vT+1)>>1 / L by doc parity — so each block's value is
    * an integer recurrence over the z-scan chain that DuckDB replays
    * with lateral column references, no clip ever binding (drift is
    * bounded well inside [0,255]). A wrong bit in the mode syntax, CBP
    * mapping, nC bookkeeping or prediction source desyncs the chain
    * and every later block.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]), like every codec query. */
  private def m26: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      def zpos(b: Int): (Int, Int) =
        (((b >> 2) & 1) * 8 + (b & 1) * 4, ((b >> 3) & 1) * 8 + ((b >> 1) & 1) * 4)
      val cbpMask = 1 + (id % 15).toInt
      val modes = Array.tabulate(16) { blk =>
        val (ox, oy) = zpos(blk)
        val bx = ox / 4; val by = oy / 4
        if (bx == 0 && by == 0) 2
        else if (by == 0) Array(1, 2, 8)(((id + blk) % 3).toInt)
        else if (bx == 0) Array(0, 2)(((id + blk) % 2).toInt)
        else Array(0, 1, 2, 8)(((id + blk) % 4).toInt)
      }
      val coeffs = Array.tabulate(16) { blk =>
        val a = new Array[Int](16)
        if (((cbpMask >> (blk >> 2)) & 1) == 1)
          a(0) = ((id + 5 * blk) % 7).toInt - 3
        a
      }
      val es = graft.operators.H264.encodeSps(1, 1, 0) ++
        graft.operators.H264.encodePps() ++
        graft.operators.H264Cavlc.encodeIntra4x4Frame(1, 1,
          Array(modes), Array(coeffs), qp = 28,
          idrPicId = (id % 65536).toInt)
      val frames = graft.operators.H264Cavlc.decodeIntra16Frames(es)
      require(frames.size == 1)
      val (w, h, y) = frames.head
      def bval(blk: Int): Int = {
        val (ox, oy) = zpos(blk)
        y(oy * 16 + ox) & 0xFF
      }
      var s = 0L; var i = 0
      while (i < y.length) { s += y(i) & 0xFF; i += 1 }
      (id, w, h, bval(0), bval(1), bval(2), bval(3), bval(4), bval(5),
        bval(6), bval(7), bval(8), bval(9), bval(10), bval(11), bval(12),
        bval(13), bval(14), bval(15), s)
    }.toDF("doc_id", "width", "height", "v0", "v1", "v2", "v3", "v4",
      "v5", "v6", "v7", "v8", "v9", "v10", "v11", "v12", "v13", "v14",
      "v15", "y_sum")
  }

  /** Dense-neighbour CAVLC sweep (m25): each asset is one IDR picture
    * (a single I_16x16 macroblock, luma DC zero, QPy 28) whose 16 AC
    * blocks carry graded coefficient densities (0/3/5/10/15 nonzero
    * levels in a fixed layout), chosen so the 9.2.1 neighbour-average
    * nC walks through EVERY coeff_token column of Table 9-5 — 0<=nC<2
    * (blk0/blk8 + the DC block), 2<=nC<4 (blk1/2/3/11/12), 4<=nC<8
    * (blk4/7/13) and the nC>=8 FLC (blk5/6/9/10/14/15, including a
    * ZERO block coded in the FLC column) — and back down across each
    * boundary. Levels are a fixed ±pattern per density class scaled by
    * a per-doc integer G ∈ {±1,±2,±3}: at QPy 28 the AC dequant
    * (8.5.12.1) and inverse core transform (8.5.12.2) are exactly
    * LINEAR in G (every intermediate is even, so the spec's >>1
    * butterflies lose nothing), which makes the whole reconstruction
    * closed-form: pixel = clip(128 + (G·T0[cls][pos] + 32) >> 6) with
    * T0 a 4x16 constant matrix derived by an independent transcription
    * of the dequant+transform (tools comment in the oracle). A single
    * wrong bit in any new VLC table desyncs the reader and garbles
    * every later block, so the oracle pins the dense-neighbour entropy
    * path end-to-end.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]), like every codec query. */
  private def m25: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      val g = (1 + (id % 3)).toInt * (if (id % 2 == 0) 1 else -1)
      val pats = Map(
        'A' -> Array(2, -1, 1),
        'B' -> Array(1, 2, -1, -2, 1),
        'C' -> Array(2, 1, -1, 1, -2, 1, 1, -1, 1, -1),
        'D' -> Array(1, -1, 1, -1, 2, -2, 1, 1, -1, 1, -1, 1, 1, -1, 1),
        'E' -> Array.empty[Int])
      val cls = "ABECDCABCEBDADCB" // z-scan blk0..blk15 density classes
      val ac = Array.tabulate(16) { blk =>
        val a = new Array[Int](15)
        val e = pats(cls(blk))
        var k = 0
        while (k < e.length) { a(k) = e(k) * g; k += 1 }
        a
      }
      val dc = Array.fill(4, 4)(0)
      val es = graft.operators.H264.encodeSps(1, 1, 0) ++
        graft.operators.H264.encodePps() ++
        graft.operators.H264Cavlc.encodeIntra16Frame(1, 1, Array(dc),
          qp = 28, idrPicId = (id % 65536).toInt, acLevels = Array(ac))
      val frames = graft.operators.H264Cavlc.decodeIntra16Frames(es)
      require(frames.size == 1)
      val (w, h, y) = frames.head
      var s = 0L; var ck = 0L; var i = 0
      while (i < y.length) {
        val v = (y(i) & 0xFF).toLong
        s += v; ck += v * (i + 1); i += 1
      }
      // probes: the (0,0) pixel of one block per density class
      def px(x: Int, yy: Int) = y(yy * 16 + x) & 0xFF
      (id, w, h, px(0, 0), px(4, 0), px(4, 4), px(8, 0), px(0, 4), s, ck)
    }.toDF("doc_id", "width", "height", "p_a", "p_b", "p_c", "p_d",
      "p_e", "y_sum", "y_checksum")
  }

  /** Multi-slice decode on the oracle gate (m24): each asset is one
    * IDR picture coded as TWO slices ({MB0, MB1} / {MB2, MB3} of a
    * 2x2-MB frame) — the unit real encoders split pictures into
    * precisely so a fleet can entropy-decode them in parallel, and the
    * semantics a parallel decoder must honour: prediction and nC
    * availability STOP at the slice boundary and QPy re-anchors per
    * slice. The fixture pins exactly that: MB2 sits below MB0 but
    * CANNOT see it (other slice — its DC prediction falls back to
    * 128), while the single-slice coding of the same levels would
    * chain through; MB3 predicts from MB2 alone. The oracle replays
    * the four per-MB uniform values with the boundary fallbacks and
    * the per-MB position-weight constants of the 32x32 plane.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]); at 100 TB the same slice
    * independence is what lets one picture's slices decode on
    * different executors. */
  private def m24: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      val as = Array((id % 13).toInt - 6, ((id / 13) % 7).toInt - 3,
        ((id / 7) % 9).toInt - 4, ((id / 3) % 5).toInt - 2)
      val dc = as.map { a =>
        val m = Array.fill(4, 4)(0); m(0)(0) = a; m
      }
      val es = graft.operators.H264.encodeSps(2, 2, 0) ++
        graft.operators.H264.encodePps() ++
        graft.operators.H264Cavlc.encodeIntra16Frame(2, 2, dc, qp = 24,
          idrPicId = (id % 65536).toInt, sliceStarts = Array(0, 2))
      val frames = graft.operators.H264Cavlc.decodeIntra16Frames(es)
      require(frames.size == 1)
      val (w, h, y) = frames.head
      var s = 0L; var ck = 0L; var i = 0
      while (i < y.length) {
        val v = (y(i) & 0xFF).toLong
        s += v; ck += v * (i + 1); i += 1
      }
      def mb(mx: Int, my: Int) = y((my * 16 + 8) * 32 + mx * 16 + 8) & 0xFF
      (id, w, h, 2, mb(0, 0), mb(1, 0), mb(0, 1), mb(1, 1), s, ck)
    }.toDF("doc_id", "width", "height", "n_slices", "v0", "v1", "v2",
      "v3", "y_sum", "y_checksum")
  }

  /** Chroma AC reconstruction on the oracle gate (m23): each asset is
    * one I_16x16_2_2_0 macroblock (Table 7-11 mb_type 11 —
    * CodedBlockPatternChroma = 2), so both chroma components carry
    * ChromaACLevel residuals: four 4x4 blocks each, entropy-coded with
    * nC off the per-component chroma TotalCoeff grids (9.2.1),
    * dequantized at QPc (8.5.12.1 — QP 24 maps to itself on Table
    * 8-12), and reconstructed through the full 4x4 butterfly on top of
    * the 2x2-Hadamard chroma DC (80x at QPc 24). The same m21 block
    * families cover all three dequant position classes and both >>1
    * halving patterns, per component; luma stays DC-only (uniform
    * 40x), isolating the chroma path. The oracle replays every chroma
    * pixel in closed form; position-weighted per-plane checksums pin
    * the raster layout of both components independently.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]) like every m-family decode. */
  private def m23: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      val a0 = (id % 41).toInt - 20
      val dc = Array.fill(4, 4)(0); dc(0)(0) = a0
      val cb = Array(
        Array((id % 7).toInt - 3, ((id / 7) % 5).toInt - 2),
        Array(((id / 5) % 3).toInt - 1, ((id / 3) % 3).toInt - 1))
      val cr = Array(
        Array((id % 9).toInt - 4, ((id / 9) % 3).toInt - 1),
        Array(((id / 2) % 3).toInt - 1, ((id / 11) % 3).toInt - 1))
      def acOf(off: Int) = Array.tabulate(4) { b =>
        val a = new Array[Int](15)
        val c = ((id + 11 * b + off) % 7).toInt - 3
        b match {
          case 0 => a(2) = c // scan k=3 -> (2,0), even-even class
          case 1 => a(4) = c // k=5 -> (0,2)
          case 2 => a(0) = c // k=1 -> (0,1), mixed class
          case _ => a(3) = c // k=4 -> (1,1), odd-odd class
        }
        a
      }
      val es = graft.operators.H264.encodeSps(1, 1, 0) ++
        graft.operators.H264.encodePps() ++
        graft.operators.H264Cavlc.encodeIntra16Frame(1, 1, Array(dc),
          qp = 24, idrPicId = (id % 65536).toInt,
          cbDc = Array(cb), crDc = Array(cr),
          cbAc = Array(acOf(0)), crAc = Array(acOf(3)))
      val frames = graft.operators.H264Cavlc.decodeIntra16FramesYuv(es)
      require(frames.size == 1)
      val (w, h, y, cbP, crP) = frames.head
      def stats(p: Array[Byte]): (Long, Long) = {
        var s = 0L; var ck = 0L; var i = 0
        while (i < p.length) {
          val v = (p(i) & 0xFF).toLong
          s += v; ck += v * (i + 1); i += 1
        }
        (s, ck)
      }
      val (ys, _) = stats(y)
      val (cbs, cbk) = stats(cbP)
      val (crs, crk) = stats(crP)
      (id, w, h, ys, cbs, cbk, crs, crk, cbP(0) & 0xFF, crP(63) & 0xFF)
    }.toDF("doc_id", "width", "height", "y_sum", "cb_sum", "cb_checksum",
      "cr_sum", "cr_checksum", "cb00", "cr77")
  }

  /** GIF87a/LZW on the oracle gate (m22): each asset's deterministic
    * gray plane round-trips the REAL GIF codec — LSB-first
    * variable-width LZW (the container + bit packing are pinned to a
    * hand-derived spec vector in GifGraySpec), 256-entry gray global
    * color table — and a second constant plane per asset crosses the
    * decoder's KwKwK materialization path. A hash match proves the
    * LZW dictionary build/rebuild and the sub-block framing are
    * lossless on every asset; the oracle replays the SOURCE formula,
    * so any codec drift (a mis-packed width boundary, an off-by-one
    * in the dictionary lag) breaks equality.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]) like every m-family decode. */
  private def m22: Q = (spark, dir) => {
    import spark.implicits._
    val (w, h) = (24, 16)
    docIds(spark, dir).as[Long].map { id =>
        val px = Array.tabulate(w * h)(i => ((id * 31 + i) % 256).toByte)
        val gif = graft.operators.GifGray.encode(w, h, px)
        val (dw, dh, dec) = graft.operators.GifGray.decode(gif)
        var s = 0L; var ck = 0L; var i = 0
        while (i < dec.length) {
          val v = (dec(i) & 0xFF).toLong
          s += v; ck += v * (i + 1); i += 1
        }
        val cpx = Array.fill(64)((id % 256).toByte)
        val (_, _, cdec) =
          graft.operators.GifGray.decode(graft.operators.GifGray.encode(8, 8, cpx))
        var cs = 0L; var p = 0
        while (p < cdec.length) { cs += cdec(p) & 0xFF; p += 1 }
        (id, dw, dh, s, ck, cs)
      }
      .toDF("doc_id", "width", "height", "gray_sum", "gray_checksum",
        "const_sum")
  }

  /** CAVLC AC residual reconstruction on the oracle gate (m21): each
    * asset is one I_16x16_2_0_15 macroblock (Table 7-11 mb_type 15 —
    * DC prediction, CodedBlockPatternLuma = 15), so ALL 16 luma 4x4
    * blocks are entropy-coded Intra16x16ACLevel residuals with
    * neighbour-derived nC (9.2.1) on top of the Hadamard-spread DC.
    * Four block families, one planted coefficient each (TotalCoeff
    * <= 1 keeps every nC inside the conformance-pinned 0 <= nC < 2
    * coeff_token column while exercising every decode stage):
    *  - blocks 0-3:   scan k=3 -> (2,0), even-even dequant class
    *    (LevelScale 160 at QP 24): a vertical +,-,-,+ stripe pattern
    *  - blocks 4-7:   scan k=5 -> (0,2): the same pattern horizontally
    *  - blocks 8-11:  scan k=1 -> (0,1), mixed class (208): the
    *    butterfly's >>1 halving column pattern 2,1,-1,-2 (x104)
    *  - blocks 12-15: scan k=4 -> (1,1), odd-odd class (256): the
    *    full separable 2,1,-1,-2 x 2,1,-1,-2 surface (x64)
    * Every planted LevelScale is even, so the >>1 halvings are exact
    * divisions and each pixel has the closed form
    * clip(128 + floor((40*a0 + h + 32) / 64)) that the oracle replays
    * per (block, y, x); the position-weighted whole-plane checksum
    * pins the z-scan block layout, the zig-zag placement, the
    * position-classed dequant and the butterfly signs at once.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]) like every m-family decode. */
  private def m21: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      val a0 = (id % 41).toInt - 20
      val dc = Array.fill(4, 4)(0); dc(0)(0) = a0
      val ac = Array.tabulate(16) { b =>
        val a = new Array[Int](15)
        if (b < 4) a(2) = ((id + 7 * b) % 7).toInt - 3
        else if (b < 8) a(4) = ((id + 5 * b) % 7).toInt - 3
        else if (b < 12) a(0) = ((id + 3 * b) % 5).toInt - 2
        else a(3) = ((id + b) % 5).toInt - 2
        a
      }
      val es = graft.operators.H264.encodeSps(1, 1, 0) ++
        graft.operators.H264.encodePps() ++
        graft.operators.H264Cavlc.encodeIntra16Frame(1, 1, Array(dc),
          qp = 24, idrPicId = (id % 65536).toInt, acLevels = Array(ac))
      val frames = graft.operators.H264Cavlc.decodeIntra16Frames(es)
      require(frames.size == 1)
      val (w, h, y) = frames.head
      var s = 0L; var ck = 0L; var i = 0
      while (i < y.length) {
        val v = (y(i) & 0xFF).toLong
        s += v; ck += v * (i + 1); i += 1
      }
      (id, w, h, y(0) & 0xFF, y(3) & 0xFF, y(12) & 0xFF,
        y(8 * 16) & 0xFF, y(12 * 16 + 12) & 0xFF, s, ck)
    }.toDF("doc_id", "width", "height", "p00", "p03", "p0c", "p80",
      "pcc", "y_sum", "y_checksum")
  }

  /** All four Intra_16x16 luma prediction modes on the oracle gate
    * (m20): each asset is a 2x2-macroblock IDR picture whose MBs use
    * DC (no neighbours), horizontal (copies the left MB's edge),
    * vertical (copies the top MB's edge) and PLANE prediction (the
    * 8.3.3.4 gradient from the left/top/corner edges) in raster
    * order, each with its own CAVLC-coded luma DC level — so the
    * reconstruction CHAINS: MB0 is uniform v0, MB1/MB2 copy v0 and
    * add their residual, and MB3's plane predictor sees uniform
    * borders v1 (top), v2 (left) and corner v0, collapsing 8.3.3.4 to
    * a = 16(v1+v2), b = (40(v1-v0)+32)>>6, c = (40(v2-v0)+32)>>6 —
    * a true non-uniform gradient the oracle recomputes per pixel.
    * Position-weighted whole-plane checksum pins every pixel of all
    * four MBs.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]) like every m-family decode. */
  private def m20: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      def dcOf(c0: Int) = {
        val a = Array.fill(4, 4)(0); a(0)(0) = c0; a
      }
      val dc = Array(
        dcOf((id % 13).toInt - 6), dcOf((id % 5).toInt - 2),
        dcOf(((id / 5) % 5).toInt - 2), dcOf(((id / 3) % 5).toInt - 2))
      // raster order: DC, horizontal (left avail), vertical (top
      // avail), plane (both)
      val modes = Array(2, 1, 0, 3)
      val es = graft.operators.H264.encodeSps(2, 2, 0) ++
        graft.operators.H264.encodePps() ++
        graft.operators.H264Cavlc.encodeIntra16Frame(2, 2, dc, qp = 24,
          idrPicId = (id % 65536).toInt, predModes = modes)
      val frames = graft.operators.H264Cavlc.decodeIntra16Frames(es)
      require(frames.size == 1)
      val (w, h, y) = frames.head
      var s = 0L; var ck = 0L; var i = 0
      while (i < y.length) {
        val v = (y(i) & 0xFF).toLong
        s += v; ck += v * (i + 1); i += 1
      }
      (id, w, h, y(0) & 0xFF, y(16) & 0xFF, y(16 * 32) & 0xFF,
        y(16 * 32 + 16) & 0xFF, s, ck)
    }.toDF("doc_id", "width", "height", "v0", "v1", "v2", "v3corner",
      "y_sum", "y_checksum")
  }

  /** COLOR image codec on the oracle-checked path (m19): the PNG
    * codec's truecolor extension (IHDR color type 2, bpp = 3 filter
    * offsets) round-trips a deterministic RGB plane per asset with
    * per-doc filter = doc_id % 5 (every RFC 2083 filter type crosses
    * the gate at pixel width), then the REAL integer BT.601 color →
    * gray kernel ((77R + 150G + 29B) >> 8) runs on the decoded
    * pixels — the conversion every gray-plane operator (dHash,
    * resize, scene cuts) sits behind for color inputs. The oracle
    * recomputes byte sums, a position-weighted RGB checksum, and the
    * gray sum from the plane formula — a hash match proves DEFLATE
    * round-trips the 3-channel filtered scanlines losslessly AND
    * pins the fixed-point luma arithmetic.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]) like every m-family decode. */
  private def m19: Q = (spark, dir) => {
    import spark.implicits._
    val (w, h) = (12, 8)
    docIds(spark, dir).as[Long].map { id =>
        val rgb = Array.tabulate(w * h * 3)(i => ((id * 31 + i) % 256).toByte)
        val png = Multimodal.encodePngRgb8(w, h, rgb, (id % 5).toInt)
        val (dw, dh, dec) = Multimodal.decodePngRgb8(png)
        val gray = Multimodal.rgbToGray8(dec)
        var rgbSum = 0L; var rgbCk = 0L; var i = 0
        while (i < dec.length) {
          val v = (dec(i) & 0xFF).toLong
          rgbSum += v; rgbCk += v * (i + 1); i += 1
        }
        var graySum = 0L; var p = 0
        while (p < gray.length) { graySum += gray(p) & 0xFF; p += 1 }
        (id, dw, dh, rgbSum, rgbCk, graySum)
      }
      .toDF("doc_id", "width", "height", "rgb_sum", "rgb_checksum",
        "gray_sum")
  }

  /** Spectral audio features (m18): the frame → transform → band
    * energy → log-compress front-end of an audio featurization
    * pipeline, with the REAL fast Walsh–Hadamard transform as the
    * integer-exact spectral kernel (a float FFT/mel bank can't be
    * equality-oracled; the WHT is a true orthogonal transform with
    * the same pipeline shape and replays in SQL through
    * c(k) = Σ (−1)^popcount(k AND n) x(n)). Each asset's synthetic
    * PCM (m13's formula) round-trips the REAL RIFF/WAVE codec, then
    * per complete 32-sample frame: in-place FWHT butterfly, four
    * Hadamard-ordered 8-coefficient band energies Σc² (≤ 3.3e12,
    * BIGINT-exact), and the whole-bit log compression
    * bits(e + 1) — the t29 integer-bits idiom as the feature scale.
    * Parseval (Σc² = 32·Σx²) is pinned in MultimodalSpec, so the
    * butterfly is checked against the direct definition, not just
    * the oracle.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]); O(frames · 32 log 32) integer
    * ops. */
  private def m18: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].flatMap { id =>
      val n = (64 + (id % 32) * 2).toInt
      val pcm = Array.tabulate(n)(i => ((id * 7 + i * 13) % 20000).toShort)
      val wav = Multimodal.encodeWavPcm16(8000, pcm)
      val (_, _, dec) = Multimodal.decodeWavPcm16(wav)
      (0 until dec.length / 32).map { f =>
        val frame = Array.tabulate(32)(i => dec(f * 32 + i).toLong)
        val c = Multimodal.fwht(frame)
        val e = new Array[Long](4)
        var k = 0
        while (k < 32) { e(k / 8) += c(k) * c(k); k += 1 }
        def bits(v: Long): Int = java.lang.Long.toBinaryString(v + 1).length
        (id, f.toLong, e(0), e(1), e(2), e(3),
          bits(e(0)), bits(e(1)), bits(e(2)), bits(e(3)))
      }
    }.toDF("doc_id", "frame_idx", "e0", "e1", "e2", "e3",
      "b0", "b1", "b2", "b3")
  }

  /** Chroma-residual pixel reconstruction (m17): the first COLOR
    * transform-coded video path — each asset is an SPS + PPS + one IDR
    * picture coded as a single I_16x16_2_1_0 macroblock (Table 7-11
    * mb_type 7: Intra_16x16 DC prediction, CodedBlockPatternChroma =
    * 1), carrying a luma 4x4 DC block (two planted levels -> two
    * vertical half-stripes) AND 2x2 ChromaDCLevel blocks for Cb and
    * Cr with four hash-planted levels each, CAVLC-coded with the
    * nC == -1 coeff_token column and chroma total_zeros Table 9-9,
    * decoded through [[graft.operators.H264Cavlc.decodeIntra16FramesYuv]]:
    * 2x2 inverse Hadamard (8.5.7), QPc mapping (Table 8-12; QP 24 maps
    * to itself), chroma DC dequant (8.5.10 — exactly 80x at QPc 24),
    * DC-only core transform, chroma DC prediction (8.3.4.1; no
    * neighbours -> 128). Each chroma quadrant value is closed-form:
    * q_ij = clip(128 + floor((80*f_ij + 32)/64)) with f_ij the +-1
    * 2x2 Hadamard combination of the four levels; luma stripes are
    * m16's 40x form. Position-weighted checksums over all three
    * planes pin the quadrant LAYOUT, so a drift anywhere in the
    * chroma entropy decode, transform, dequant, prediction, or
    * raster placement breaks the hash.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]) like every m-family decode. */
  private def m17: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      val a0 = (id % 13).toInt - 6
      val a1 = ((id / 13) % 5).toInt - 2
      val dc = Array.fill(4, 4)(0)
      dc(0)(0) = a0; dc(0)(1) = a1
      val cb = Array(
        Array((id % 7).toInt - 3, ((id / 7) % 5).toInt - 2),
        Array(((id / 5) % 3).toInt - 1, ((id / 3) % 3).toInt - 1))
      val cr = Array(
        Array((id % 9).toInt - 4, ((id / 9) % 3).toInt - 1),
        Array(((id / 2) % 3).toInt - 1, ((id / 11) % 3).toInt - 1))
      val es = graft.operators.H264.encodeSps(1, 1, 0) ++
        graft.operators.H264.encodePps() ++
        graft.operators.H264Cavlc.encodeIntra16Frame(1, 1, Array(dc),
          qp = 24, idrPicId = (id % 65536).toInt,
          cbDc = Array(cb), crDc = Array(cr))
      val frames = graft.operators.H264Cavlc.decodeIntra16FramesYuv(es)
      require(frames.size == 1)
      val (w, h, y, cbP, crP) = frames.head
      def ck(p: Array[Byte]): Long = {
        var s = 0L; var i = 0
        while (i < p.length) { s += (p(i) & 0xFF).toLong * (i + 1); i += 1 }
        s
      }
      def quad(p: Array[Byte], bi: Int, bj: Int): Int =
        p((bi * 4) * 8 + bj * 4) & 0xFF
      (id, w, h, y(0) & 0xFF, y(8) & 0xFF,
        quad(cbP, 0, 0), quad(cbP, 0, 1), quad(cbP, 1, 0), quad(cbP, 1, 1),
        quad(crP, 0, 0), quad(crP, 0, 1), quad(crP, 1, 0), quad(crP, 1, 1),
        ck(y), ck(cbP), ck(crP))
    }.toDF("doc_id", "width", "height", "y0", "y1",
      "cb00", "cb01", "cb10", "cb11", "cr00", "cr01", "cr10", "cr11",
      "y_checksum", "cb_checksum", "cr_checksum")
  }

  /** CAVLC transform-coded pixel reconstruction (m16): the first
    * ENTROPY-CODED (not raw-sample) video path — each asset is an SPS +
    * PPS + one IDR picture coded as a single I_16x16_2_0_0 macroblock
    * (Table 7-11 mb_type 3): four hash-planted luma DC coefficient
    * levels in row 0 of the DC block (zig-zag positions 0,1,5,6),
    * CAVLC-coded per clause 9.2 (coeff_token, trailing-one signs,
    * level prefix/suffix, total_zeros, run_before all live), decoded
    * through [[graft.operators.H264Cavlc.decodeIntra16Frames]]:
    * inverse 4x4 Hadamard (8.5.6), QP-24 dequant (8.5.10), DC-only
    * core transform, Intra_16x16 DC prediction. Row-0-only DC levels
    * make the reconstruction four vertical 4-column stripes whose
    * values the oracle recomputes in closed form: stripe_j =
    * 128 + floor((40*t_j + 32)/64) with t_j the +-1 Hadamard
    * combination of the four levels (dequant at QP 24 is exactly
    * 40x). The full-plane weighted checksum pins the stripe LAYOUT,
    * not just the values — a drift anywhere in the entropy decode,
    * transform, dequant, prediction, or raster placement breaks it.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]) like every m-family decode. */
  private def m16: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      val c0 = (id % 41).toInt - 20
      val c1 = (id % 7).toInt - 3
      val c2 = ((id / 7) % 3).toInt - 1
      val c3 = ((id / 3) % 3).toInt - 1
      val dc = Array.fill(4, 4)(0)
      dc(0)(0) = c0; dc(0)(1) = c1; dc(0)(2) = c2; dc(0)(3) = c3
      val es = graft.operators.H264.encodeSps(1, 1, 0) ++
        graft.operators.H264.encodePps() ++
        graft.operators.H264Cavlc.encodeIntra16Frame(1, 1, Array(dc),
          qp = 24, idrPicId = (id % 65536).toInt)
      val frames = graft.operators.H264Cavlc.decodeIntra16Frames(es)
      require(frames.size == 1)
      val (w, h, luma) = frames.head
      var s = 0L; var ck = 0L; var i = 0
      while (i < luma.length) {
        val v = (luma(i) & 0xFF).toLong
        s += v; ck += v * (i + 1); i += 1
      }
      def stripe(j: Int): Int = luma(4 * j) & 0xFF // row 0, col 4j
      (id, w, h, stripe(0), stripe(1), stripe(2), stripe(3), s, ck)
    }.toDF("doc_id", "width", "height", "s0", "s1", "s2", "s3",
      "luma_sum", "luma_checksum")
  }

  /** Shot detection over REAL decoded video frames (m15): m8's SAD cut
    * logic upgraded from payload byte slices to DECODED pixels — each
    * asset is a multi-frame all-I_PCM H.264 stream (3 + id%3 pictures;
    * one planted regime change at frame 1 + id%2 shifts every pixel),
    * every picture decoded through the real [[H264.decodeIPcmFrames]]
    * syntax walk, and adjacent decoded planes compared by
    * sum-of-absolute-differences. Pixel values wrap mod 256, so the
    * per-pixel drift of 7 gives |diff| 7 on 498 of the 512 pixels and
    * 249 (= 256−7) on the 14 that wrap: within-regime SAD = 498·7 +
    * 14·249 = 6972, well under the 20480 threshold. The regime
    * boundary shifts by 19007 ≡ 63 (mod 256): |diff| 63 on 386
    * pixels, 193 on the 126 that wrap, SAD = 386·63 + 126·193 =
    * 48636, well over — so n_cuts pins that the decoder reproduced
    * every plane exactly, not just checksums.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]); decode cost is linear in coded
    * bytes. */
  private def m15: Q = (spark, dir) => {
    import spark.implicits._
    val cutThreshold = 40L * 512L
    docIds(spark, dir).as[Long].map { id =>
      val nf = (3 + id % 3).toInt
      val fc = (1 + id % 2).toInt
      def plane(f: Int): Array[Byte] = Array.tabulate(32 * 16) { i =>
        val shift = if (f >= fc) 19000L else 0L
        ((id * 31 + f * 7 + shift + i) % 256).toByte
      }
      val es = scala.collection.mutable.ArrayBuffer[Byte]()
      es ++= graft.operators.H264.encodeSps(2, 1, 0)
      es ++= graft.operators.H264.encodePps()
      (0 until nf).foreach { f =>
        es ++= graft.operators.H264.encodeIPcmFrame(2, 1, plane(f),
          frameNum = f)
      }
      val frames = graft.operators.H264.decodeIPcmFrames(es.toArray)
      val sads = frames.sliding(2).collect {
        case Seq((_, _, a), (_, _, b)) =>
          var s = 0L; var i = 0
          while (i < a.length) {
            s += math.abs((a(i) & 0xFF) - (b(i) & 0xFF)); i += 1
          }
          s
      }.toSeq
      (id, frames.length, sads.sum, sads.max, sads.count(_ > cutThreshold).toLong)
    }.toDF("doc_id", "n_frames", "total_sad", "max_sad", "n_cuts")
  }

  /** H.264 pixel reconstruction (m14): REAL decoded video pixels — each
    * asset's 32x16 luma plane is coded as a spec-conformant SPS + PPS +
    * all-I_PCM IDR slice (raw samples in the bitstream per ITU-T H.264
    * 7.3.5; full slice-header and macroblock_layer syntax, emulation
    * prevention live on the zero-heavy sample runs) and decoded back
    * through [[graft.operators.H264.decodeIPcm]], SPS bottom-crop
    * applied (doc_id % 3 map-unit rows cropped x2 chroma units). The
    * oracle recomputes every DISPLAYED pixel from the plane formula, so
    * a drift anywhere in slice-header syntax, MB walking, alignment,
    * EP bytes, or crop arithmetic breaks the hash. Transform-coded MBs
    * remain out of scope (the entropy decoder is the documented
    * boundary); I_PCM is the profile subset where pixel reconstruction
    * is exact and library-free.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]) like every m-family decode. */
  private def m14: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      val crop = (id % 3).toInt
      val plane = Array.tabulate(32 * 16)(i => ((id * 31 + i) % 256).toByte)
      val es = graft.operators.H264.encodeSps(2, 1, crop) ++
        graft.operators.H264.encodePps() ++
        graft.operators.H264.encodeIPcmFrame(2, 1, plane)
      val (w, h, dec) = graft.operators.H264.decodeIPcm(es)
      var s = 0L; var c = 0L; var i = 0
      while (i < dec.length) {
        val v = (dec(i) & 0xFF).toLong
        s += v; c += v * (i + 1); i += 1
      }
      (id, w, h, s, c)
    }.toDF("doc_id", "width", "height", "luma_sum", "luma_checksum")
  }

  /** Audio resample (m13): the sample-rate-conversion stage of an audio
    * pipeline. Each asset's synthetic 16-bit PCM (even length 64..126,
    * planted from doc_id) round-trips the REAL RIFF/WAVE codec (m3's),
    * then two REAL integer DSP kernels run on the decoded samples: 2:1
    * pair-average downsample and 1:2 linear-interpolation upsample —
    * both floor-division exact, so the oracle recomputes every output
    * sample from the PCM formula. Position-weighted checksums pin the
    * full output sequences.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]); kernels are O(samples) integer
    * ops — the multimodal analogue of the t-family's codegen'd scans. */
  private def m13: Q = (spark, dir) => {
    import spark.implicits._
    docIds(spark, dir).as[Long].map { id =>
      val n = (64 + (id % 32) * 2).toInt
      val pcm = Array.tabulate(n)(i => ((id * 7 + i * 13) % 20000).toShort)
      val wav = Multimodal.encodeWavPcm16(8000, pcm)
      val (_, _, dec) = Multimodal.decodeWavPcm16(wav)
      val down = Multimodal.downsamplePcm2(dec)
      val up = Multimodal.upsamplePcm2Linear(dec)
      def sums(p: Array[Short]): (Long, Long) = {
        var s = 0L; var c = 0L; var i = 0
        while (i < p.length) {
          val v = p(i).toLong
          s += v; c += v * (i + 1); i += 1
        }
        (s, c)
      }
      val (dnSum, dnCk) = sums(down)
      val (upSum, upCk) = sums(up)
      (id, dnSum, dnCk, upSum, upCk)
    }.toDF("doc_id", "down_sum", "down_checksum", "up_sum", "up_checksum")
  }

  /** Image resize (m12): the thumbnail/downsample stage every
    * multimodal training pipeline runs before featurization. Each
    * asset's 16x12 gray plane round-trips the REAL 24bpp BMP codec
    * (m4's), then two REAL integer resize kernels run on the decoded
    * plane: nearest-neighbor to 7x5 (non-integer ratios, so the floor
    * mapping is actually exercised) and 2x2 box-average to 8x6. The
    * outputs are pinned by position-weighted checksums + plain sums —
    * the oracle recomputes every output pixel from the plane formula
    * via the same floor arithmetic, so a one-pixel drift anywhere in
    * encode → decode → either kernel breaks the hash.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]) like every m-family decode;
    * the kernels are O(outputPixels) integer ops with no allocation
    * beyond the output plane. */
  private def m12: Q = (spark, dir) => {
    import spark.implicits._
    val W = 16; val H = 12; val NW = 7; val NH = 5
    docIds(spark, dir).as[Long].map { id =>
      val plane = Array.tabulate(W * H)(i => ((id * 31 + i) % 256).toByte)
      val bmp = Multimodal.encodeBmp24(W, H, plane)
      val (_, _, dec) = Multimodal.decodeBmp24(bmp)
      val nn = Multimodal.resizeNearest(dec, W, H, NW, NH)
      val bx = Multimodal.downsampleBox2(dec, W, H)
      def sums(p: Array[Byte]): (Long, Long) = {
        var s = 0L; var c = 0L; var i = 0
        while (i < p.length) {
          val v = (p(i) & 0xFF).toLong
          s += v; c += v * (i + 1); i += 1
        }
        (s, c)
      }
      val (nnSum, nnCk) = sums(nn)
      val (bxSum, bxCk) = sums(bx)
      (id, nnSum, nnCk, bxSum, bxCk)
    }.toDF("doc_id", "nn_sum", "nn_checksum", "box_sum", "box_checksum")
  }

  /** Perceptual-hash image dedup (m11): m9's dHashes grouped by EXACT
    * hash equality — the LAION-style first dedup pass (hash every
    * image, drop hash-equal copies, keeper = lowest id). Group rows,
    * not pair rows: the synthetic planes make near-all-ones hashes
    * common, so a pair listing would be quadratic in the biggest
    * clique while the group view stays O(distinct hashes) — the same
    * reason production pHash dedup dedups by key, not by pairwise
    * comparison. id_sum pins the exact membership of every group.
    * Scale: the m9 map is zero-shuffle; the grouping is one
    * shuffle-on-hash with map-side combine. */
  private def m11: Q = (spark, dir) =>
    m9(spark, dir)
      .groupBy(col("dhash_lo"), col("dhash_hi"))
      .agg(count(lit(1)).as("n_images"),
        min(col("doc_id")).as("keeper_id"),
        sum(col("doc_id")).as("id_sum"))

  /** H.264 metadata probe (m10): per-asset synthetic-but-CONFORMANT
    * Annex-B streams (real SPS bits, real slice headers, real
    * emulation-prevention bytes — [[graft.operators.H264]]'s encoder,
    * geometry planted from asset_id) probed through the real bitstream
    * parser. The oracle recomputes the planted geometry by formula, so
    * any drift anywhere in encode → EBSP → NAL split → Exp-Golomb SPS
    * parse → crop arithmetic → slice-header frame counting breaks the
    * hash — the t10 salted-fixture pattern applied to video.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]), like every m-family decode. */
  private def m10: Q = (spark, dir) => {
    import spark.implicits._
    val fixtures = docIds(spark, dir).as[Long].map { id =>
        val es = graft.operators.H264.syntheticStream(
          widthMbs = (4 + id % 7).toInt,
          heightMapUnits = (3 + id % 5).toInt,
          cropBottom = (id % 3).toInt,
          frames = (3 + id % 11).toInt)
        (id, es)
      }.toDF("asset_id", "payload")
    Multimodal.videoProbe(fixtures)
  }

  /** Image perceptual hash (m9): dHash — the image-dedup primitive
    * (LAION-style near-dup detection hashes every image; equal or
    * near-equal hashes mark duplicates). Each asset's 9x8 gray plane round-trips
    * the REAL 24bpp BMP codec (m4's), then 64 adjacent-pixel
    * comparisons become the hash, carried as two 32-bit halves so the
    * oracle's integer math stays overflow-free. All deterministic byte
    * arithmetic — the oracle recomputes the exact bits.
    *
    * Scale: id-spread per-asset map (one 8-byte-id exchange, see [[docIds]]); downstream near-dup grouping is
    * a groupBy on the hash (or banded hamming join, exactly d4's
    * simhash machinery — same band-bucket-verify pipeline). */
  private def m9: Q = (spark, dir) => {
    import spark.implicits._
    val W = 9
    val H = 8
    docIds(spark, dir).as[Long].map { id =>
      val plane = Array.tabulate(W * H)(i => ((id * 31 + i) % 256).toByte)
      val bmp = Multimodal.encodeBmp24(W, H, plane)
      val (_, _, dec) = Multimodal.decodeBmp24(bmp)
      var lo = 0L
      var hi = 0L
      var n = 0L
      var r = 0
      while (r < H) {
        var c = 0
        while (c < 8) {
          val a = dec(r * W + c) & 0xFF
          val b = dec(r * W + c + 1) & 0xFF
          if (b > a) {
            val bit = r * 8 + c
            if (bit < 32) lo |= 1L << bit else hi |= 1L << (bit - 32)
            n += 1
          }
          c += 1
        }
        r += 1
      }
      (id, lo, hi, n)
    }.toDF("doc_id", "dhash_lo", "dhash_hi", "n_set")
  }

  /** Video scene-cut detection (m8): the shot-boundary primitive — each
    * asset's payload is framed into fixed 64-byte frames and adjacent
    * frames compared by sum-of-absolute-differences (the SAD metric
    * real shot detectors threshold); a pair above the threshold is a
    * cut. All integer byte math, so the oracle recomputes the exact
    * cut count / SAD totals from the same bytes via hex slicing.
    *
    * Scale: embarrassingly parallel — one streaming pass per asset,
    * no shuffle at all (the per-asset flatMap is the whole operator);
    * real decoders slot in behind the same frame iterator. */
  private def m8: Q = (spark, dir) => {
    import spark.implicits._
    val F = 64
    val threshold = F * 24L
    t(spark, dir, "documents")
      .select(col("doc_id").cast("long"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        val nf = p.length / F
        if (nf < 2) Iterator.empty
        else {
          var total = 0L
          var mx = 0L
          var cuts = 0L
          var k = 1
          while (k < nf) {
            var d = 0L
            var i = 0
            while (i < F) {
              d += math.abs((p((k - 1) * F + i) & 0xFF) - (p(k * F + i) & 0xFF))
              i += 1
            }
            total += d
            if (d > mx) mx = d
            if (d > threshold) cuts += 1
            k += 1
          }
          Iterator((id, nf.toLong, cuts, total, mx))
        }
      }
      .toDF("asset_id", "n_frames", "n_cuts", "total_diff", "max_diff")
  }

  /** Audio frame features (m7): the filter stage of an audio training
    * pipeline — per-entity waveforms round-trip through the REAL RIFF/WAV
    * PCM16 codec (m3's), then fixed 32-sample framing with integer-exact
    * per-frame energy (Σs²) and zero-crossing counts (the VAD/silence
    * trim primitives). The oracle recomputes both straight from the
    * deterministic sample definition, so any corruption anywhere in
    * encode → decode → framing breaks the hash.
    *
    * Scale: one shuffle on the asset key (user_id here = one audio
    * asset); each group materializes only its own waveform — the codec
    * and framing are per-asset streaming passes, nothing driver-side. */
  private def m7: Q = (spark, dir) => {
    import spark.implicits._
    val sr = 8000
    val frame = 32
    t(spark, dir, "events")
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("value").cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (uid, it) =>
        // deterministic sample order; sign alternates by event_id parity
        // so zero crossings are exercised; |value*50| <= 28011 fits PCM16
        val samples = it.toArray.sortBy(_._2)
          .map { case (_, eid, v) =>
            val m = (v * 50).toInt
            (if (eid % 2 == 0) m else -m).toShort
          }
        val wav = Multimodal.encodeWavPcm16(sr, samples)
        val (_, _, decoded) = Multimodal.decodeWavPcm16(wav)
        decoded.grouped(frame).zipWithIndex.map { case (fr, idx) =>
          var sumSq = 0L
          var zc = 0L
          var i = 0
          while (i < fr.length) {
            sumSq += fr(i).toLong * fr(i)
            if (i > 0 && ((fr(i) >= 0) != (fr(i - 1) >= 0))) zc += 1
            i += 1
          }
          (uid, idx.toLong, fr.length.toLong, sumSq, zc)
        }
      }
      .toDF("user_id", "frame_idx", "n_samples", "sum_sq", "n_zero_cross")
  }

  /** Binary asset stats + round-trip through fixed-size chunking: chunk
    * count must match octet math and reassembled digests must equal the
    * original (any payload corruption in the shuffle breaks the hash). */
  private def m1: Q = (spark, dir) => {
    val assets = t(spark, dir, "documents")
      .select(col("doc_id").as("asset_id"),
        encode(col("text"), "UTF-8").as("payload"))
    val chunked = Multimodal.chunk(assets, 256)
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(expr("octet_length(chunk)")).as("n_bytes_chunked"))
    assets
      .select(col("asset_id"),
        expr("octet_length(payload)").as("n_bytes"),
        md5(col("payload")).as("digest"))
      .join(chunked, "asset_id")
  }

  /** Video-style frame sampling through Multimodal.stubSampleFrames
    * (every 3rd fixed-size frame) in a typed per-batch pass — the real
    * pipeline shape for frame extraction; the deterministic byte math
    * (frame counts, first-sampled-frame digest) is what the oracle
    * pins. Assets shorter than one frame yield zero frames and a null
    * digest. */
  private def m2: Q = (spark, dir) => {
    import spark.implicits._
    val frameBytes = 128
    val everyK = 3
    t(spark, dir, "documents")
      .select(col("doc_id").cast("long"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val frames = Multimodal.stubSampleFrames(payload, frameBytes, everyK)
        val digest = frames.headOption.map { f =>
          f.map("%02x".format(_)).mkString
        }.orNull
        (id, payload.length / frameBytes, frames.length, digest)
      }
      .toDF("asset_id", "n_frames", "n_sampled", "first_frame_hex")
      .select(col("asset_id"), col("n_frames").cast("long").as("n_frames"),
        col("n_sampled").cast("long").as("n_sampled"), col("first_frame_hex"))
  }

  /** REAL audio codec on the oracle-checked path: each user's event
    * values become a 16-bit PCM waveform, encoded as an actual
    * RIFF/WAVE file (Multimodal.encodeWavPcm16), decoded back with the
    * real chunk-walking parser, and reduced to features. The oracle
    * computes the same features straight from the source integers —
    * a hash match proves the container round-trip is lossless. One
    * shuffle on user_id; payload bytes are built post-shuffle and never
    * move again. */
  private def m3: Q = (spark, dir) => {
    import spark.implicits._
    val sr = 8000
    t(spark, dir, "events")
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("value").cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroups { (uid, it) =>
        // deterministic sample order; value*50 <= 28011 fits 16-bit PCM
        val samples = it.toArray.sortBy(_._2)
          .map { case (_, _, v) => (v * 50).toInt.toShort }
        val wav = Multimodal.encodeWavPcm16(sr, samples)
        val (rate, channels, decoded) = Multimodal.decodeWavPcm16(wav)
        val (dur, rms, _) = Multimodal.pcmFeatures(rate, decoded)
        (uid, rate, channels, decoded.length.toLong, dur, rms)
      }
      .toDF("user_id", "sample_rate", "channels", "n_samples",
        "duration_sec", "rms")
  }

  /** REAL image codec on the oracle-checked path, the m3 pattern for
    * BMP: a deterministic 16x8 luma plane per doc (pixel i =
    * (doc_id*31+i) mod 256) is encoded as an actual 24bpp BMP
    * (Multimodal.encodeBmp24), decoded back with the real parser, and
    * reduced to dimensions + mean luma; the oracle computes the same
    * mean from the closed form — a hash match proves the BMP container
    * and BT.601 gray identity are lossless. */
  private def m4: Q = (spark, dir) => {
    import spark.implicits._
    val (w, h) = (16, 8)
    docIds(spark, dir).as[Long]
      .map { id =>
        val luma = Array.tabulate(w * h)(i => ((id * 31 + i) % 256).toByte)
        val bmp = Multimodal.encodeBmp24(w, h, luma)
        val (dw, dh, plane) = Multimodal.decodeBmp24(bmp)
        var sum = 0L
        var i = 0
        while (i < plane.length) { sum += plane(i) & 0xFF; i += 1 }
        (id, dw, dh, bmp.length.toLong, sum.toDouble / plane.length)
      }
      .toDF("doc_id", "width", "height", "bmp_bytes", "mean_luma")
  }

  /** REAL lossy DCT codec on the oracle-checked path: constant 8x8
    * tiles with even offsets from 128 quantize to a DC-only spectrum
    * with zero rounding error (DC = 8*(v-128), quantizer 16), so the
    * baseline-JPEG round-trip through JpegGray.encode/decode is
    * BIT-EXACT and the oracle computes the decoded mean in closed form
    * — a hash match proves FDCT, quantization, Huffman entropy coding,
    * byte stuffing, the marker parser, and the IDCT all at once. The
    * lossy AC path is PSNR-bounded in MultimodalSpec. */
  private def m6: Q = (spark, dir) => {
    import spark.implicits._
    val (w, h) = (16, 16) // 4 constant tiles
    docIds(spark, dir).as[Long]
      .map { id =>
        val luma = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val tile = (y / 8) * 2 + (x / 8)
            luma(y * w + x) = (128 + 2 * ((id * 11 + tile * 7) % 60) - 60).toByte
            x += 1
          }
          y += 1
        }
        val jpg = JpegGray.encode(w, h, luma)
        val (dw, dh, plane) = JpegGray.decode(jpg)
        var sum = 0L
        var i = 0
        while (i < plane.length) { sum += plane(i) & 0xFF; i += 1 }
        (id, dw, dh, sum.toDouble / plane.length)
      }
      .toDF("doc_id", "width", "height", "mean_luma")
  }

  /** REAL compressed image codec on the oracle-checked path: the m4
    * deterministic plane, encoded as an actual zlib-compressed PNG
    * (Multimodal.encodePngGray8, per-doc filter = doc_id % 5 so every
    * RFC 2083 filter type crosses the gate), decoded back with the real
    * inflate + unfilter parser, and reduced to dimensions + mean luma.
    * The oracle computes the mean from the closed form — a hash match
    * proves DEFLATE round-trips the filtered scanlines losslessly.
    * Payload size is filter/deflate-dependent, so unlike m4 the byte
    * count is not part of the checked output. */
  private def m5: Q = (spark, dir) => {
    import spark.implicits._
    val (w, h) = (16, 8)
    docIds(spark, dir).as[Long]
      .map { id =>
        val luma = Array.tabulate(w * h)(i => ((id * 31 + i) % 256).toByte)
        val png = Multimodal.encodePngGray8(w, h, luma, (id % 5).toInt)
        val (dw, dh, plane) = Multimodal.decodePngGray8(png)
        var sum = 0L
        var i = 0
        while (i < plane.length) { sum += plane(i) & 0xFF; i += 1 }
        (id, dw, dh, sum.toDouble / plane.length)
      }
      .toDF("doc_id", "width", "height", "mean_luma")
  }

  def oracles: Map[String, String] = Map(
    // m38: implicit weighted bi-prediction replayed closed form. The
    // weights are pure POC arithmetic: w1 = 8t toward the future
    // reference, w0 = 64 - 8t toward the past one (t = the B's
    // doc-selected POC in 1..7); uni macroblocks stay unweighted.
    "m38_video_implicit_wp" ->
      """WITH f AS (SELECT doc_id,
        | (doc_id + 0) % 4 AS f0, (doc_id + 1) % 4 AS f1,
        | (doc_id + 2) % 4 AS f2, (doc_id + 3) % 4 AS f3,
        | 1 + doc_id % 7 AS t
        | FROM documents),
        |v AS (SELECT doc_id, t,
        | 128 + (160*f0 + 32)//64 AS v0,
        | v0 + (160*f1 + 32)//64 AS v1,
        | v0 + (160*f2 + 32)//64 AS v2,
        | (v1 + v2 + 1)//2 + (160*f3 + 32)//64 AS v3
        | FROM f),
        |p AS (SELECT doc_id, t, v0, v1, v2, v3,
        | (CASE (doc_id // 1) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 0) % 5 - 2) AS p0,
        | (CASE (doc_id // 3) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 1) % 5 - 2) AS p1,
        | (CASE (doc_id // 5) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 2) % 5 - 2) AS p2,
        | (CASE (doc_id // 7) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 3) % 5 - 2) AS p3
        | FROM v),
        |w AS (SELECT doc_id, p0, p1, p2, p3,
        | (((CASE (doc_id // 9) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |    WHEN 2 THEN v2 ELSE v3 END)*(64 - 8*t)
        |  + (CASE (doc_id // 11) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |    WHEN 2 THEN p2 ELSE p3 END)*(8*t) + 32)//64)
        |   + 10*((doc_id + 6) % 5 - 2) AS w0v,
        | (((CASE (doc_id // 13) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |    WHEN 2 THEN v2 ELSE v3 END)*(64 - 8*t)
        |  + (CASE (doc_id // 17) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |    WHEN 2 THEN p2 ELSE p3 END)*(8*t) + 32)//64) AS w1v,
        | CASE (doc_id // 19) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END AS w2v,
        | CASE (doc_id // 21) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |   WHEN 2 THEN p2 ELSE p3 END AS w3v
        | FROM p)
        |SELECT doc_id, 32 AS width, 32 AS height,
        | CAST(p0 AS INTEGER) AS p0, CAST(p1 AS INTEGER) AS p1,
        | CAST(p2 AS INTEGER) AS p2, CAST(p3 AS INTEGER) AS p3,
        | CAST(w0v AS INTEGER) AS w0, CAST(w1v AS INTEGER) AS w1,
        | CAST(w2v AS INTEGER) AS w2, CAST(w3v AS INTEGER) AS w3,
        | CAST(256*(w0v + w1v + w2v + w3v) AS BIGINT) AS y2_sum
        |FROM w""".stripMargin,
    // m37: explicit weighted prediction replayed closed form. The P
    // chain scales through ((v*wP + 16) >> 5) + oP before its
    // residual; the B values run the per-list weights, and the Bi
    // macroblock is the exact two-weight sum — weights chosen so no
    // Clip1 binds, so the SQL stays pure integer arithmetic.
    "m37_video_weighted_pred" ->
      """WITH f AS (SELECT doc_id,
        | (doc_id + 0) % 4 AS f0, (doc_id + 1) % 4 AS f1,
        | (doc_id + 2) % 4 AS f2, (doc_id + 3) % 4 AS f3,
        | 24 + doc_id % 17 AS wp, 2*((doc_id % 11) - 5) AS op,
        | 26 + doc_id % 7 AS w0, (doc_id % 7) - 3 AS o0,
        | 30 + doc_id % 5 AS w1, (doc_id % 5) - 2 AS o1
        | FROM documents),
        |v AS (SELECT doc_id, wp, op, w0, o0, w1, o1,
        | 128 + (160*f0 + 32)//64 AS v0,
        | v0 + (160*f1 + 32)//64 AS v1,
        | v0 + (160*f2 + 32)//64 AS v2,
        | (v1 + v2 + 1)//2 + (160*f3 + 32)//64 AS v3
        | FROM f),
        |p AS (SELECT doc_id, w0, o0, w1, o1, v0, v1, v2, v3,
        | ((CASE (doc_id // 1) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END)*wp + 16)//32 + op
        |   + 10*((doc_id + 0) % 5 - 2) AS p0,
        | ((CASE (doc_id // 3) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END)*wp + 16)//32 + op
        |   + 10*((doc_id + 1) % 5 - 2) AS p1,
        | ((CASE (doc_id // 5) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END)*wp + 16)//32 + op
        |   + 10*((doc_id + 2) % 5 - 2) AS p2,
        | ((CASE (doc_id // 7) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END)*wp + 16)//32 + op
        |   + 10*((doc_id + 3) % 5 - 2) AS p3
        | FROM v),
        |w AS (SELECT doc_id, p0, p1, p2, p3,
        | ((CASE (doc_id // 9) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |    WHEN 2 THEN p2 ELSE p3 END)*w0 + 16)//32 + o0
        |   + 10*((doc_id + 6) % 5 - 2) AS w0v,
        | ((CASE (doc_id // 11) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |    WHEN 2 THEN v2 ELSE v3 END)*w1 + 16)//32 + o1 AS w1v,
        | ((CASE (doc_id // 13) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |    WHEN 2 THEN p2 ELSE p3 END)*w0
        |  + (CASE (doc_id // 17) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |    WHEN 2 THEN v2 ELSE v3 END)*w1 + 32)//64
        |  -- (o0+o1+1) >> 1 is a FLOOR shift; DuckDB // truncates, so
        |  -- bias the (possibly negative) operand positive first
        |   + ((o0 + o1 + 1 + 8)//2 - 4) + 10*((doc_id + 8) % 5 - 2) AS w2v,
        | ((CASE (doc_id // 19) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |    WHEN 2 THEN p2 ELSE p3 END)*w0 + 16)//32 + o0 AS w3v
        | FROM p)
        |SELECT doc_id, 32 AS width, 32 AS height,
        | CAST(p0 AS INTEGER) AS p0, CAST(p1 AS INTEGER) AS p1,
        | CAST(p2 AS INTEGER) AS p2, CAST(p3 AS INTEGER) AS p3,
        | CAST(w0v AS INTEGER) AS w0, CAST(w1v AS INTEGER) AS w1,
        | CAST(w2v AS INTEGER) AS w2, CAST(w3v AS INTEGER) AS w3,
        | CAST(256*(w0v + w1v + w2v + w3v) AS BIGINT) AS y2_sum
        |FROM w""".stripMargin,
    // m36: temporal direct replayed closed form. DSF = 64 makes the
    // skip MB's list0 read shift exactly 4 px left: four columns of
    // v0 then twelve of v1, each averaged against flat p1 — the
    // split IS the DistScaleFactor check. MB2 reads v (list0[0] =
    // the PAST picture under POC ordering), not p.
    "m36_video_temporal_direct" ->
      """WITH f AS (SELECT doc_id,
        | (doc_id + 0) % 4 AS f0, (doc_id + 1) % 4 AS f1,
        | (doc_id + 2) % 4 AS f2, (doc_id + 3) % 4 AS f3
        | FROM documents),
        |v AS (SELECT doc_id,
        | 128 + (160*f0 + 32)//64 AS v0,
        | v0 + (160*f1 + 32)//64 AS v1,
        | v0 + (160*f2 + 32)//64 AS v2,
        | (v1 + v2 + 1)//2 + (160*f3 + 32)//64 AS v3
        | FROM f),
        |p AS (SELECT doc_id, v0, v1, v2, v3,
        | v0 + 10*((doc_id + 0) % 5 - 2) AS p0,
        | v0 + 10*((doc_id + 1) % 5 - 2) AS p1,
        | (CASE (doc_id // 5) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 2) % 5 - 2) AS p2,
        | (CASE (doc_id // 7) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 3) % 5 - 2) AS p3
        | FROM v),
        |w AS (SELECT doc_id, p0, p1, p2, p3,
        | (v0 + p0 + 1)//2 + 10*((doc_id + 6) % 5 - 2) AS w0,
        | (v0 + p1 + 1)//2 AS w1a,
        | (v1 + p1 + 1)//2 AS w1b,
        | CASE (doc_id // 9) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END AS w2,
        | ((CASE (doc_id // 11) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |    WHEN 2 THEN v2 ELSE v3 END)
        |  + (CASE (doc_id // 13) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |    WHEN 2 THEN p2 ELSE p3 END) + 1)//2
        |  + 10*((doc_id + 9) % 5 - 2) AS w3
        | FROM p)
        |SELECT doc_id, 32 AS width, 32 AS height,
        | CAST(p0 AS INTEGER) AS p0, CAST(p1 AS INTEGER) AS p1,
        | CAST(p2 AS INTEGER) AS p2, CAST(p3 AS INTEGER) AS p3,
        | CAST(w0 AS INTEGER) AS w0,
        | CAST(w1a AS INTEGER) AS w1a, CAST(w1b AS INTEGER) AS w1b,
        | CAST(w2 AS INTEGER) AS w2, CAST(w3 AS INTEGER) AS w3,
        | CAST(256*(w0 + w2 + w3) + 64*w1a + 192*w1b AS BIGINT)
        |   AS y2_sum
        |FROM w""".stripMargin,
    // m35: the B_8x8 sweep replayed closed form — v/p chains as m30;
    // one flat value per SUB-PARTITION (list routing picks the p- or
    // v-chain; Bi and the directZeroPrediction quadrant land exact
    // rounded averages); the y-sum weighs every sub-partition by its
    // pixel area (8x8 = 64, 8x4/4x8 = 32, 4x4 = 16).
    "m35_video_b8x8" ->
      """WITH f AS (SELECT doc_id,
        | (doc_id + 0) % 4 AS f0, (doc_id + 1) % 4 AS f1,
        | (doc_id + 2) % 4 AS f2, (doc_id + 3) % 4 AS f3
        | FROM documents),
        |v AS (SELECT doc_id,
        | 128 + (160*f0 + 32)//64 AS v0,
        | v0 + (160*f1 + 32)//64 AS v1,
        | v0 + (160*f2 + 32)//64 AS v2,
        | (v1 + v2 + 1)//2 + (160*f3 + 32)//64 AS v3
        | FROM f),
        |p AS (SELECT doc_id, v0, v1, v2, v3,
         | (CASE (doc_id // 1) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 0) % 5 - 2) AS p0,
         | (CASE (doc_id // 3) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 1) % 5 - 2) AS p1,
         | (CASE (doc_id // 5) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 2) % 5 - 2) AS p2,
         | (CASE (doc_id // 7) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 3) % 5 - 2) AS p3
         | FROM v),
        |w AS (SELECT doc_id,
         | (CASE (doc_id // 9) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
 |   WHEN 2 THEN p2 ELSE p3 END) AS a1,
         | (CASE (doc_id // 11) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) AS a2,
         | ((CASE (doc_id // 13) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
 |   WHEN 2 THEN p2 ELSE p3 END) + (CASE (doc_id // 17) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) + 1)//2 AS a3,
         | (p0 + v0 + 1)//2 AS a4,
         | (CASE (doc_id // 19) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
 |   WHEN 2 THEN p2 ELSE p3 END) AS m1s0,
         | (CASE (doc_id // 21) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
 |   WHEN 2 THEN p2 ELSE p3 END) AS m1s1,
         | (CASE (doc_id // 23) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
 |   WHEN 2 THEN p2 ELSE p3 END) AS m1s2,
         | (CASE (doc_id // 25) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
 |   WHEN 2 THEN p2 ELSE p3 END) AS m1s3,
         | (CASE (doc_id // 29) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
 |   WHEN 2 THEN p2 ELSE p3 END) AS m1s4,
         | (CASE (doc_id // 31) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
 |   WHEN 2 THEN p2 ELSE p3 END) AS m1s5,
         | (CASE (doc_id // 37) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
 |   WHEN 2 THEN p2 ELSE p3 END) AS m1s6,
         | (CASE (doc_id // 41) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
 |   WHEN 2 THEN p2 ELSE p3 END) AS m1s7,
         | (CASE (doc_id // 43) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
 |   WHEN 2 THEN p2 ELSE p3 END) AS m1s8,
         | (CASE (doc_id // 47) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) AS m2s0,
         | (CASE (doc_id // 53) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) AS m2s1,
         | (CASE (doc_id // 59) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) AS m2s2,
         | (CASE (doc_id // 61) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) AS m2s3,
         | (CASE (doc_id // 67) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) AS m2s4,
         | (CASE (doc_id // 71) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) AS m2s5,
         | (CASE (doc_id // 73) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) AS m2s6,
         | (CASE (doc_id // 79) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) AS m2s7,
         | (CASE (doc_id // 83) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) AS m2s8,
         | ((CASE (doc_id // 89) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
 |   WHEN 2 THEN p2 ELSE p3 END) + (CASE (doc_id // 137) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) + 1)//2 AS m3s0,
         | ((CASE (doc_id // 97) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
 |   WHEN 2 THEN p2 ELSE p3 END) + (CASE (doc_id // 139) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) + 1)//2 AS m3s1,
         | ((CASE (doc_id // 101) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
 |   WHEN 2 THEN p2 ELSE p3 END) + (CASE (doc_id // 149) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) + 1)//2 AS m3s2,
         | ((CASE (doc_id // 103) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
 |   WHEN 2 THEN p2 ELSE p3 END) + (CASE (doc_id // 151) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) + 1)//2 AS m3s3,
         | ((CASE (doc_id // 107) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
 |   WHEN 2 THEN p2 ELSE p3 END) + (CASE (doc_id // 157) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) + 1)//2 AS m3s4,
         | ((CASE (doc_id // 109) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
 |   WHEN 2 THEN p2 ELSE p3 END) + (CASE (doc_id // 163) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) + 1)//2 AS m3s5,
         | ((CASE (doc_id // 113) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
 |   WHEN 2 THEN p2 ELSE p3 END) + (CASE (doc_id // 167) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) + 1)//2 AS m3s6,
         | ((CASE (doc_id // 127) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
 |   WHEN 2 THEN p2 ELSE p3 END) + (CASE (doc_id // 173) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) + 1)//2 AS m3s7,
         | ((CASE (doc_id // 131) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
 |   WHEN 2 THEN p2 ELSE p3 END) + (CASE (doc_id // 179) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
 |   WHEN 2 THEN v2 ELSE v3 END) + 1)//2 AS m3s8
         | FROM p)
        |SELECT doc_id, 32 AS width, 32 AS height,
         | CAST(a1 AS INTEGER) AS a1, CAST(a2 AS INTEGER) AS a2,
         | CAST(a3 AS INTEGER) AS a3, CAST(a4 AS INTEGER) AS a4,
         | CAST(m1s0 AS INTEGER) AS u0, CAST(m1s2 AS INTEGER) AS u1,
         | CAST(m1s4 AS INTEGER) AS u2, CAST(m1s8 AS INTEGER) AS u3,
         | CAST(m2s0 AS INTEGER) AS w0, CAST(m2s2 AS INTEGER) AS w1,
         | CAST(m2s4 AS INTEGER) AS w2, CAST(m2s8 AS INTEGER) AS w3,
         | CAST(m3s0 AS INTEGER) AS b0, CAST(m3s2 AS INTEGER) AS b1,
         | CAST(m3s4 AS INTEGER) AS b2, CAST(m3s8 AS INTEGER) AS b3,
         | CAST(64*(a1 + a2 + a3 + a4)
         |  + 32*(m1s0 + m1s1 + m1s2 + m1s3) + 16*(m1s4 + m1s5 + m1s6 + m1s7) + 64*m1s8
         |  + 32*(m2s0 + m2s1 + m2s2 + m2s3) + 16*(m2s4 + m2s5 + m2s6 + m2s7) + 64*m2s8
         |  + 32*(m3s0 + m3s1 + m3s2 + m3s3) + 16*(m3s4 + m3s5 + m3s6 + m3s7) + 64*m3s8
         |  AS BIGINT) AS y2_sum
        |FROM w""".stripMargin,
    // m34: the B two-partition GOP replayed closed form — v/p chains
    // as m30, then one flat value per PARTITION: list routing picks
    // the p-chain (L0 -> the P frame) or the v-chain (L1 -> the I
    // frame), Bi partitions land the exact rounded average, and the
    // MB0/MB3 residuals ride both of their partitions.
    "m34_video_bparts" ->
      """WITH f AS (SELECT doc_id,
        | (doc_id + 0) % 4 AS f0, (doc_id + 1) % 4 AS f1,
        | (doc_id + 2) % 4 AS f2, (doc_id + 3) % 4 AS f3
        | FROM documents),
        |v AS (SELECT doc_id,
        | 128 + (160*f0 + 32)//64 AS v0,
        | v0 + (160*f1 + 32)//64 AS v1,
        | v0 + (160*f2 + 32)//64 AS v2,
        | (v1 + v2 + 1)//2 + (160*f3 + 32)//64 AS v3
        | FROM f),
        |p AS (SELECT doc_id, v0, v1, v2, v3,
        | (CASE (doc_id // 1) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 0) % 5 - 2) AS p0,
        | (CASE (doc_id // 3) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 1) % 5 - 2) AS p1,
        | (CASE (doc_id // 5) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 2) % 5 - 2) AS p2,
        | (CASE (doc_id // 7) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 3) % 5 - 2) AS p3
        | FROM v),
        |w AS (SELECT doc_id,
        | (CASE (doc_id // 9) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |   WHEN 2 THEN p2 ELSE p3 END)
        |   + 10*((doc_id + 8) % 5 - 2) AS w0t,
        | (CASE (doc_id // 11) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END)
        |   + 10*((doc_id + 8) % 5 - 2) AS w0b,
        | ((CASE (doc_id // 13) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |    WHEN 2 THEN p2 ELSE p3 END)
        |  + (CASE (doc_id // 17) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |    WHEN 2 THEN v2 ELSE v3 END) + 1)//2 AS w1l,
        | CASE (doc_id // 19) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |   WHEN 2 THEN p2 ELSE p3 END AS w1r,
        | CASE (doc_id // 21) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END AS w2t,
        | ((CASE (doc_id // 23) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |    WHEN 2 THEN p2 ELSE p3 END)
        |  + (CASE (doc_id // 27) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |    WHEN 2 THEN v2 ELSE v3 END) + 1)//2 AS w2b,
        | (CASE (doc_id // 29) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |   WHEN 2 THEN p2 ELSE p3 END)
        |   + 10*((doc_id + 9) % 5 - 2) AS w3l,
        | (CASE (doc_id // 31) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |   WHEN 2 THEN p2 ELSE p3 END)
        |   + 10*((doc_id + 9) % 5 - 2) AS w3r
        | FROM p)
        |SELECT doc_id, 32 AS width, 32 AS height,
        | CAST(w0t AS INTEGER) AS w0t, CAST(w0b AS INTEGER) AS w0b,
        | CAST(w1l AS INTEGER) AS w1l, CAST(w1r AS INTEGER) AS w1r,
        | CAST(w2t AS INTEGER) AS w2t, CAST(w2b AS INTEGER) AS w2b,
        | CAST(w3l AS INTEGER) AS w3l, CAST(w3r AS INTEGER) AS w3r,
        | CAST(128*(w0t + w0b + w1l + w1r + w2t + w2b + w3l + w3r)
        |   AS BIGINT) AS y2_sum
        |FROM w""".stripMargin,
    // m33: the 8.7 strong filter replayed closed form. Flat A | B
    // macroblocks at QP 36 (alpha 50, deep threshold (50>>2)+2 = 14):
    // step s < 14 -> the 3-tap branch rewrites p2..q2; 14 <= s < 50 ->
    // only p0/q0 move (each to the OTHER side's 3:1 average); s >= 50
    // -> the edge is left alone. Same formulas for both orientations.
    // aftv/afth = the SEQUENTIAL-ORDER aftershock: MB1's internal
    // bS=3 edge (offset 4) runs after the MB-edge strong filter and
    // its p1-adjustment re-touches the q2 sample by (2*e2 - e1) >> 1
    // where e1/e2 are q1/q2's strong-filter drops — a function of s
    // alone, equal to -1 exactly for s in {3, 4, 11, 12} (the clip
    // only needs tC0(36, bS=3) >= 1). A decoder that filters from a
    // pre-filter snapshot instead of in place misses it.
    "m33_video_deblock" ->
      """WITH base AS (SELECT doc_id,
        | doc_id % 7 AS av, doc_id % 25 AS bv,
        | (doc_id // 7) % 7 AS ah, (doc_id // 25) % 25 AS bh
        | FROM documents),
        |vals AS (SELECT doc_id,
        | 128 + (160*av + 32)//64 AS va,
        | (160*bv + 32)//64 AS sv,
        | 128 + (160*ah + 32)//64 AS ha,
        | (160*bh + 32)//64 AS sh
        | FROM base),
        |f AS (SELECT doc_id, va, sv, ha, sh,
        | va + sv AS vb, ha + sh AS hb,
        | CASE WHEN sv < 14 THEN (7*va + vb + 4)//8 ELSE va END AS vp2,
        | CASE WHEN sv < 14 THEN (3*va + vb + 2)//4 ELSE va END AS vp1,
        | CASE WHEN sv < 14 THEN (5*va + 3*vb + 4)//8
        |   WHEN sv < 50 THEN (3*va + vb + 2)//4 ELSE va END AS vp0,
        | CASE WHEN sv < 14 THEN (5*vb + 3*va + 4)//8
        |   WHEN sv < 50 THEN (3*vb + va + 2)//4 ELSE vb END AS vq0,
        | CASE WHEN sv < 14 THEN (3*vb + va + 2)//4 ELSE vb END AS vq1,
        | CASE WHEN sv < 14 THEN (7*vb + va + 4)//8 ELSE vb END AS vq2,
        | CASE WHEN sh < 14 THEN (7*ha + hb + 4)//8 ELSE ha END AS hp2,
        | CASE WHEN sh < 14 THEN (3*ha + hb + 2)//4 ELSE ha END AS hp1,
        | CASE WHEN sh < 14 THEN (5*ha + 3*hb + 4)//8
        |   WHEN sh < 50 THEN (3*ha + hb + 2)//4 ELSE ha END AS hp0,
        | CASE WHEN sh < 14 THEN (5*hb + 3*ha + 4)//8
        |   WHEN sh < 50 THEN (3*hb + ha + 2)//4 ELSE hb END AS hq0,
        | CASE WHEN sh < 14 THEN (3*hb + ha + 2)//4 ELSE hb END AS hq1,
        | CASE WHEN sh < 14 THEN (7*hb + ha + 4)//8 ELSE hb END AS hq2,
        | CASE WHEN sv IN (3, 4, 11, 12) THEN -1 ELSE 0 END AS aftv,
        | CASE WHEN sh IN (3, 4, 11, 12) THEN -1 ELSE 0 END AS afth
        | FROM vals)
        |SELECT doc_id, 32 AS width, 16 AS height,
        | CAST(va AS INTEGER) AS vp3,
        | CAST(vp2 AS INTEGER) AS vp2, CAST(vp1 AS INTEGER) AS vp1,
        | CAST(vp0 AS INTEGER) AS vp0, CAST(vq0 AS INTEGER) AS vq0,
        | CAST(vq1 AS INTEGER) AS vq1, CAST(vq2 + aftv AS INTEGER) AS vq2,
        | CAST(vb AS INTEGER) AS vq3,
        | CAST(16*(13*va + 13*vb + vp2 + vp1 + vp0 + vq0 + vq1 + vq2 + aftv)
        |   AS BIGINT) AS ysum_v,
        | CAST(ha AS INTEGER) AS hp3,
        | CAST(hp2 AS INTEGER) AS hp2, CAST(hp1 AS INTEGER) AS hp1,
        | CAST(hp0 AS INTEGER) AS hp0, CAST(hq0 AS INTEGER) AS hq0,
        | CAST(hq1 AS INTEGER) AS hq1, CAST(hq2 + afth AS INTEGER) AS hq2,
        | CAST(hb AS INTEGER) AS hq3,
        | CAST(16*(13*ha + 13*hb + hp2 + hp1 + hp0 + hq0 + hq1 + hq2 + afth)
        |   AS BIGINT) AS ysum_h
        |FROM f""".stripMargin,
    // m39: the 8.7.2.4 NORMAL filter with LIVE tC0, replayed closed
    // form. Both sides of every live edge are flat, so delta =
    // clip(+-tc, (3d+4)>>3) with tc = tC0 + 2, and the p1/q1
    // adjustments are clip(+-tC0, .). Stream A: bS=1 MB edge (tC0=2),
    // step sv gated at alpha=50. Stream B: two bS=2 edges (tC0=3) —
    // MB edge step sv+10c, then the internal x=20 edge step -10c whose
    // p2 is the MB edge's q1 OUTPUT (sequential in-place order).
    // NOTE: DuckDB's // TRUNCATES toward zero while the decoder's >>
    // floors — every division whose numerator can go negative is
    // spelled FLOOR(x / k.0); the rest stay // (nonnegative there).
    "m39_video_deblock_tc0" ->
      """WITH base AS (SELECT doc_id,
        | doc_id % 7 AS a, doc_id % 25 AS b,
        | 1 + (doc_id // 175) % 3 AS c
        | FROM documents),
        |v AS (SELECT doc_id, c,
        | 128 + (160*a + 32)//64 AS va,
        | (160*b + 32)//64 AS sv
        | FROM base),
        |v2 AS (SELECT doc_id, c, va, sv,
        | va + sv AS vb, va + sv + 10*c AS vbp, sv + 10*c AS d1
        | FROM v),
        |ea AS (SELECT doc_id, c, va, sv, vb, vbp, d1,
        | CASE WHEN sv < 50
        |   THEN va + LEAST(2, ((sv+1)//2)//2) ELSE va END AS ap1,
        | CASE WHEN sv < 50
        |   THEN va + LEAST(4, (3*sv+4)//8) ELSE va END AS ap0,
        | CASE WHEN sv < 50
        |   THEN vb - LEAST(4, (3*sv+4)//8) ELSE vb END AS aq0,
        | CASE WHEN sv < 50
        |   THEN vb + GREATEST(-2,
        |     CAST(FLOOR((va + (sv+1)//2 - vb) / 2.0) AS INTEGER))
        |   ELSE vb END AS aq1,
        | CASE WHEN d1 < 50
        |   THEN va + LEAST(3, ((d1+1)//2)//2) ELSE va END AS bp1a,
        | CASE WHEN d1 < 50
        |   THEN va + LEAST(5, (3*d1+4)//8) ELSE va END AS bp0a,
        | CASE WHEN d1 < 50
        |   THEN vbp - LEAST(5, (3*d1+4)//8) ELSE vbp END AS bq0a,
        | CASE WHEN d1 < 50
        |   THEN vbp + GREATEST(-3,
        |     CAST(FLOOR((va + (d1+1)//2 - vbp) / 2.0) AS INTEGER))
        |   ELSE vbp END AS bq1a
        | FROM v2),
        |eb AS (SELECT doc_id, va, vb, vbp, ap1, ap0, aq0, aq1,
        | bp1a, bp0a, bq0a, bq1a,
        | vbp + GREATEST(-3, LEAST(3,
        |   CAST(FLOOR((bq1a + vb + 5*c - 2*vbp) / 2.0) AS INTEGER))) AS bp1b,
        | vbp + GREATEST(-5,
        |   CAST(FLOOR((4 - 30*c) / 8.0) AS INTEGER)) AS bp0b,
        | vb - GREATEST(-5,
        |   CAST(FLOOR((4 - 30*c) / 8.0) AS INTEGER)) AS bq0b,
        | vb + LEAST(3, (5*c)//2) AS bq1b
        | FROM ea)
        |SELECT doc_id, 32 AS width, 16 AS height,
        | CAST(va AS INTEGER) AS ap2,
        | CAST(ap1 AS INTEGER) AS ap1, CAST(ap0 AS INTEGER) AS ap0,
        | CAST(aq0 AS INTEGER) AS aq0, CAST(aq1 AS INTEGER) AS aq1,
        | CAST(vb AS INTEGER) AS aq2,
        | CAST(16*(14*va + ap1 + ap0 + aq0 + aq1 + 14*vb) AS BIGINT)
        |   AS ysum_a,
        | CAST(bp1a AS INTEGER) AS bp1a, CAST(bp0a AS INTEGER) AS bp0a,
        | CAST(bq0a AS INTEGER) AS bq0a, CAST(bq1a AS INTEGER) AS bq1a,
        | CAST(bp1b AS INTEGER) AS bp1b, CAST(bp0b AS INTEGER) AS bp0b,
        | CAST(bq0b AS INTEGER) AS bq0b, CAST(bq1b AS INTEGER) AS bq1b,
        | CAST(16*(14*va + bp1a + bp0a + bq0a + bq1a
        |   + bp1b + bp0b + bq0b + bq1b + 10*vb) AS BIGINT) AS ysum_b
        |FROM eb""".stripMargin,
    // m41: per-slice deblocking idc replayed closed form — the same
    // m39 stream-A normal-filter formulas (bS=1, tC0(36,1)=2, tc=4,
    // gate at alpha=50) on the horizontal slice-boundary edge, with
    // stream B raw (q0's slice idc 2 isolates the cross-slice edge)
    // and stream C identical to A (the p-side slice's idc is not
    // consulted).
    "m41_video_slice_deblock" ->
      """WITH v AS (SELECT doc_id,
        | 128 + (160*(doc_id % 7) + 32)//64 AS va,
        | (160*(doc_id % 25) + 32)//64 AS sv
        | FROM documents),
        |f AS (SELECT doc_id, va, sv, va + sv AS vb,
        | CASE WHEN sv < 50
        |   THEN va + LEAST(2, ((sv+1)//2)//2) ELSE va END AS ap1,
        | CASE WHEN sv < 50
        |   THEN va + LEAST(4, (3*sv+4)//8) ELSE va END AS ap0,
        | CASE WHEN sv < 50
        |   THEN va + sv - LEAST(4, (3*sv+4)//8)
        |   ELSE va + sv END AS aq0,
        | CASE WHEN sv < 50
        |   THEN va + sv + GREATEST(-2,
        |     CAST(FLOOR((va + (sv+1)//2 - va - sv) / 2.0) AS INTEGER))
        |   ELSE va + sv END AS aq1
        | FROM v)
        |SELECT doc_id, 16 AS width, 32 AS height,
        | CAST(va AS INTEGER) AS ap2,
        | CAST(ap1 AS INTEGER) AS ap1, CAST(ap0 AS INTEGER) AS ap0,
        | CAST(aq0 AS INTEGER) AS aq0, CAST(aq1 AS INTEGER) AS aq1,
        | CAST(vb AS INTEGER) AS aq2,
        | CAST(16*(14*va + ap1 + ap0 + aq0 + aq1 + 14*vb) AS BIGINT)
        |   AS ysum_a,
        | CAST(va AS INTEGER) AS b14, CAST(va AS INTEGER) AS b15,
        | CAST(vb AS INTEGER) AS b16, CAST(vb AS INTEGER) AS b17,
        | CAST(256*(va + vb) AS BIGINT) AS ysum_b,
        | CAST(aq0 AS INTEGER) AS c_q0,
        | CAST(16*(14*va + ap1 + ap0 + aq0 + aq1 + 14*vb) AS BIGINT)
        |   AS ysum_c
        |FROM f""".stripMargin,
    // m40: constrained intra replayed closed form. The P picture is
    // [P_L0 copy of va + chroma DC residual (+4*level at QP 36) |
    // intra I_16x16_2_0_0]; unconstrained the intra MB predicts va /
    // 128+4*level off its inter neighbour, constrained it falls back
    // to 128 on all three components. Same slice bytes decode under
    // both PPS flags — only prediction moves, never the parse.
    "m40_video_constrained_intra" ->
      """WITH v AS (SELECT doc_id,
        | 128 + (160*(doc_id % 7) + 32)//64 AS va,
        | 4*(doc_id % 5) AS dcb,
        | 4*((doc_id // 5) % 5) AS dcr
        | FROM documents)
        |SELECT doc_id, 32 AS width, 16 AS height,
        | CAST(va AS INTEGER) AS u_y0,
        | CAST(va AS INTEGER) AS u_y1,
        | CAST(128 + dcb AS INTEGER) AS u_cb1,
        | CAST(128 + dcr AS INTEGER) AS u_cr1,
        | CAST(512*va AS BIGINT) AS ysum_u,
        | CAST(128*(128 + dcb) AS BIGINT) AS cbsum_u,
        | CAST(128*(128 + dcr) AS BIGINT) AS crsum_u,
        | CAST(128 AS INTEGER) AS c_y1,
        | CAST(128 AS INTEGER) AS c_cb1,
        | CAST(128 AS INTEGER) AS c_cr1,
        | CAST(256*(va + 128) AS BIGINT) AS ysum_c,
        | CAST(64*(128 + dcb) + 64*128 AS BIGINT) AS cbsum_c,
        | CAST(64*(128 + dcr) + 64*128 AS BIGINT) AS crsum_c
        |FROM v""".stripMargin,
    // m42: the non-monotone-POC P GOP replayed closed form — the I
    // frame's v chain as m30/m31, frame 1's p values off doc-selected
    // v sources with a NEVER-ZERO residual, then frame 2's picks
    // resolve ref 0 -> p (the decode-RECENT P1, poc 2) and ref 1 -> v
    // (the IDR, poc 8). A POC-descending list0 resolves every pick the
    // other way round, so this oracle distinguishes the orderings.
    "m42_video_poc_order" ->
      """WITH f AS (SELECT doc_id,
        | (doc_id + 0) % 4 AS f0, (doc_id + 1) % 4 AS f1,
        | (doc_id + 2) % 4 AS f2, (doc_id + 3) % 4 AS f3
        | FROM documents),
        |v AS (SELECT doc_id,
        | 128 + (160*f0 + 32)//64 AS v0,
        | v0 + (160*f1 + 32)//64 AS v1,
        | v0 + (160*f2 + 32)//64 AS v2,
        | (v1 + v2 + 1)//2 + (160*f3 + 32)//64 AS v3
        | FROM f),
        |p AS (SELECT doc_id, v0, v1, v2, v3,
        | (CASE (doc_id // 2) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 0) % 4 + 1) AS p0,
        | (CASE (doc_id // 3) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 2) % 4 + 1) AS p1,
        | (CASE (doc_id // 5) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 4) % 4 + 1) AS p2,
        | (CASE (doc_id // 7) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 6) % 4 + 1) AS p3
        | FROM v),
        |e AS (SELECT doc_id,
        | (CASE WHEN (doc_id // 2) % 2 = 0
        |   THEN CASE (doc_id // 3) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |     WHEN 2 THEN p2 ELSE p3 END
        |   ELSE CASE (doc_id // 3) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |     WHEN 2 THEN v2 ELSE v3 END END)
        |   + 10*((doc_id + 6) % 5 - 2) AS e0,
        | CASE WHEN (doc_id // 5) % 2 = 0
        |   THEN CASE (doc_id // 7) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |     WHEN 2 THEN p2 ELSE p3 END
        |   ELSE CASE (doc_id // 7) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |     WHEN 2 THEN v2 ELSE v3 END END AS e1,
        | CASE WHEN (doc_id // 7) % 2 = 0
        |   THEN CASE (doc_id // 11) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |     WHEN 2 THEN p2 ELSE p3 END
        |   ELSE CASE (doc_id // 11) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |     WHEN 2 THEN v2 ELSE v3 END END AS e2,
        | CASE WHEN (doc_id // 11) % 2 = 0
        |   THEN CASE (doc_id // 13) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |     WHEN 2 THEN p2 ELSE p3 END
        |   ELSE CASE (doc_id // 13) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |     WHEN 2 THEN v2 ELSE v3 END END AS e3
        | FROM p)
        |SELECT doc_id, 32 AS width, 32 AS height,
        | CAST(e0 AS INTEGER) AS e0, CAST(e1 AS INTEGER) AS e1,
        | CAST(e2 AS INTEGER) AS e2, CAST(e3 AS INTEGER) AS e3,
        | CAST(256*(e0 + e1 + e2 + e3) AS BIGINT) AS y2_sum
        |FROM e""".stripMargin,
    // m45: the video fingerprint replayed — m9's dHash comparison on
    // the planted pixel formula (off + (g*131 + f*17 + i*7) % 156,
    // the constant off cancels in every > but is replayed anyway),
    // bit b's pixel index i = (b//8)*9 + (b%8), the (f+1)-weighted
    // per-half fold, then the keeper/count group-join.
    "m45_video_phash_dedup" ->
      """WITH v AS (SELECT doc_id, doc_id % 200 AS g,
        |    (doc_id // 200) % 100 AS off,
        |    3 + (doc_id % 200) % 4 AS nf
        |  FROM documents),
        |h AS (SELECT doc_id, nf,
        |  CAST(list_sum(list_transform(range(0, nf), f -> (f + 1) *
        |    list_sum(list_transform(range(0, 32), b ->
        |      CASE WHEN off + (g*131 + f*17 + ((b//8)*9 + (b%8) + 1)*7) % 156
        |             > off + (g*131 + f*17 + ((b//8)*9 + (b%8))*7) % 156
        |      THEN (1::BIGINT << b) ELSE 0 END)))) AS BIGINT) AS v_lo,
        |  CAST(list_sum(list_transform(range(0, nf), f -> (f + 1) *
        |    list_sum(list_transform(range(32, 64), b ->
        |      CASE WHEN off + (g*131 + f*17 + ((b//8)*9 + (b%8) + 1)*7) % 156
        |             > off + (g*131 + f*17 + ((b//8)*9 + (b%8))*7) % 156
        |      THEN (1::BIGINT << (b - 32)) ELSE 0 END)))) AS BIGINT) AS v_hi
        |  FROM v),
        |grp AS (SELECT v_lo, v_hi, min(doc_id) AS keeper,
        |    count(*) AS n_dups
        |  FROM h GROUP BY 1, 2)
        |SELECT h.doc_id, h.v_lo, h.v_hi, CAST(h.nf AS INTEGER) AS n_frames,
        |  grp.keeper, grp.n_dups, h.doc_id > grp.keeper AS is_dup
        |FROM h JOIN grp ON h.v_lo = grp.v_lo AND h.v_hi = grp.v_hi""".stripMargin,
    // m44: the fingerprint replayed from first principles — the same
    // bit_count-parity FWHT replay as m18 over the role-dependent PCM
    // synth, band energies -> integer ratio quantization (g^2 cancels
    // exactly in (16*e)//tot, which is what makes the 2x-gain copy an
    // exact duplicate), 5-bit packing via shifts, then the same
    // keeper/count group-join.
    "m44_audio_fingerprint" ->
      """WITH d AS (SELECT doc_id, doc_id // 4 AS g, doc_id % 4 AS role
        |  FROM documents),
        |sa AS (SELECT doc_id, t.i,
        |    CASE role
        |      WHEN 0 THEN (g*997 + t.i*t.i*31 + t.i*13) % 15000
        |      WHEN 1 THEN 2 * ((g*997 + t.i*t.i*31 + t.i*13) % 15000)
        |      WHEN 2 THEN (g*997 + t.i*t.i*31 + t.i*13) % 15000
        |        + (t.i % 5) * 900
        |      ELSE (g*997 + 1234 + t.i*t.i*17 + t.i*29) % 15000 END AS s
        |  FROM d CROSS JOIN range(0, 96) t(i)),
        |co AS (SELECT doc_id, sa.i // 32 AS f, tk.k,
        |    SUM((CASE WHEN bit_count(tk.k & (sa.i % 32)) % 2 = 0
        |         THEN 1 ELSE -1 END) * sa.s) AS c
        |  FROM sa CROSS JOIN range(0, 32) tk(k)
        |  GROUP BY 1, 2, 3),
        |en AS (SELECT doc_id, f, k // 8 AS band,
        |    CAST(SUM(c*c) AS BIGINT) AS e
        |  FROM co GROUP BY 1, 2, 3),
        |tot AS (SELECT doc_id, f, SUM(e) AS te FROM en GROUP BY 1, 2),
        |fp AS (SELECT en.doc_id,
        |    CAST(SUM(((16 * e) // te) * (1::BIGINT << (5*(f*4 + band))))
        |      AS BIGINT) AS fp
        |  FROM en JOIN tot USING (doc_id, f) GROUP BY en.doc_id),
        |gr AS (SELECT fp, MIN(doc_id) AS keeper, COUNT(*) AS n_dups
        |  FROM fp GROUP BY fp)
        |SELECT fp.doc_id, fp.fp, gr.keeper, gr.n_dups,
        |  fp.doc_id > gr.keeper AS is_dup
        |FROM fp JOIN gr USING (fp)""".stripMargin,
    // m43: the frame_num-wrap GOP replayed closed form (MaxFrameNum
    // 16 via the SPS's log2_max_frame_num). 14 all-skip pictures keep
    // the plane at the IDR's v chain; f15's p values copy doc-selected
    // v macroblocks (+never-zero residual); the wrapped f0w copies f15
    // with 32-px vectors whose out-of-frame halves CLAMP into
    // column/row 1; the B averages f15 at +16 px (exactly mvCol/2 —
    // DSF 128 from the wrapped tb=1/td=2) with f0w at -16 px (clamping
    // into column/row 0).
    "m43_video_frame_num_wrap" ->
      """WITH f AS (SELECT doc_id,
        | (doc_id + 0) % 4 AS f0, (doc_id + 1) % 4 AS f1,
        | (doc_id + 2) % 4 AS f2, (doc_id + 3) % 4 AS f3
        | FROM documents),
        |v AS (SELECT doc_id,
        | 128 + (160*f0 + 32)//64 AS v0,
        | v0 + (160*f1 + 32)//64 AS v1,
        | v0 + (160*f2 + 32)//64 AS v2,
        | (v1 + v2 + 1)//2 + (160*f3 + 32)//64 AS v3
        | FROM f),
        |a AS (SELECT doc_id, v0, v1, v2, v3,
        | (doc_id // 2) % 2 AS ax0, (doc_id // 3) % 2 AS ax1,
        | (doc_id // 5) % 2 AS ax2, (doc_id // 7) % 2 AS ax3,
        | (doc_id // 11) % 2 AS ay0, (doc_id // 13) % 2 AS ay1,
        | (doc_id // 17) % 2 AS ay2, (doc_id // 19) % 2 AS ay3
        | FROM v),
        |p AS (SELECT *,
        | (CASE (doc_id // 3) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 0) % 4 + 1) AS p0,
        | (CASE (doc_id // 5) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 3) % 4 + 1) AS p1,
        | (CASE (doc_id // 7) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 6) % 4 + 1) AS p2,
        | (CASE (doc_id // 11) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 9) % 4 + 1) AS p3
        | FROM a),
        |w AS (SELECT *,
        | (CASE 2*ay0 + ax0 WHEN 0 THEN p0 WHEN 1 THEN p1
        |   WHEN 2 THEN p2 ELSE p3 END) + 10*((doc_id + 1) % 4 + 1) AS w0,
        | (CASE WHEN ay1 = 1 THEN p3 ELSE p1 END)
        |   + 10*((doc_id + 3) % 4 + 1) AS w1,
        | (CASE WHEN ax2 = 1 THEN p3 ELSE p2 END)
        |   + 10*((doc_id + 5) % 4 + 1) AS w2,
        | p3 + 10*((doc_id + 7) % 4 + 1) AS w3
        | FROM p),
        |b AS (SELECT *,
        | ((CASE 2*ay0 + ax0 WHEN 0 THEN p0 WHEN 1 THEN p1
        |    WHEN 2 THEN p2 ELSE p3 END) + w0 + 1)//2
        |   + 10*((doc_id + 6) % 5 - 2) AS b0,
        | ((CASE WHEN ay1 = 1 THEN p3 ELSE p1 END)
        |   + (CASE WHEN ax1 = 1 THEN w0 ELSE w1 END) + 1)//2 AS b1,
        | ((CASE WHEN ax2 = 1 THEN p3 ELSE p2 END)
        |   + (CASE WHEN ay2 = 1 THEN w0 ELSE w2 END) + 1)//2 AS b2,
        | (p3 + (CASE 2*ay3 + ax3 WHEN 0 THEN w3 WHEN 1 THEN w2
        |    WHEN 2 THEN w1 ELSE w0 END) + 1)//2 AS b3
        | FROM w)
        |SELECT doc_id, 32 AS width, 32 AS height,
        | CAST(p0 AS INTEGER) AS p0, CAST(p1 AS INTEGER) AS p1,
        | CAST(p2 AS INTEGER) AS p2, CAST(p3 AS INTEGER) AS p3,
        | CAST(w0 AS INTEGER) AS w0, CAST(w1 AS INTEGER) AS w1,
        | CAST(w2 AS INTEGER) AS w2, CAST(w3 AS INTEGER) AS w3,
        | CAST(b0 AS INTEGER) AS b0, CAST(b1 AS INTEGER) AS b1,
        | CAST(b2 AS INTEGER) AS b2, CAST(b3 AS INTEGER) AS b3,
        | CAST(256*(b0 + b1 + b2 + b3) AS BIGINT) AS yb_sum
        |FROM b""".stripMargin,
    // m32: the spatial-direct B replayed closed form — v/p/q chains as
    // m30 (q = P2 off P1), then colZero_m = "P1 MB m sourced itself"
    // ((doc_id // k_m) % 4 = m); w1 (direct) reads q1 when zeroed else
    // the MB0-vector shifted column-1 source; w2 (skip) collapses to
    // q2 when EITHER its own colZero fires or MB1's did (the median
    // MVP picked up MB1's zeroed quadrant), else follows MB0's column.
    "m32_video_direct" ->
      """WITH f AS (SELECT doc_id,
        | (doc_id + 0) % 4 AS f0, (doc_id + 1) % 4 AS f1,
        | (doc_id + 2) % 4 AS f2, (doc_id + 3) % 4 AS f3
        | FROM documents),
        |v AS (SELECT doc_id,
        | 128 + (160*f0 + 32)//64 AS v0,
        | v0 + (160*f1 + 32)//64 AS v1,
        | v0 + (160*f2 + 32)//64 AS v2,
        | (v1 + v2 + 1)//2 + (160*f3 + 32)//64 AS v3
        | FROM f),
        |p AS (SELECT doc_id, v0, v1, v2, v3,
        | (CASE (doc_id // 1) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 0) % 5 - 2) AS p0,
        | (CASE (doc_id // 3) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 1) % 5 - 2) AS p1,
        | (CASE (doc_id // 5) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 2) % 5 - 2) AS p2,
        | (CASE (doc_id // 7) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 3) % 5 - 2) AS p3
        | FROM v),
        |q AS (SELECT doc_id, p0, p1, p2, p3,
        | (CASE (doc_id // 9) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |   WHEN 2 THEN p2 ELSE p3 END) + 10*((doc_id + 4) % 5 - 2) AS q0,
        | (CASE (doc_id // 11) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |   WHEN 2 THEN p2 ELSE p3 END) + 10*((doc_id + 5) % 5 - 2) AS q1,
        | (CASE (doc_id // 13) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |   WHEN 2 THEN p2 ELSE p3 END) + 10*((doc_id + 6) % 5 - 2) AS q2,
        | (CASE (doc_id // 15) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |   WHEN 2 THEN p2 ELSE p3 END) + 10*((doc_id + 7) % 5 - 2) AS q3
        | FROM p),
        |b AS (SELECT doc_id, p0, p1, p2, p3, q0, q1, q2, q3,
        | (doc_id // 17) % 4 AS s0,
        | CASE WHEN (doc_id // 3) % 4 = 1 THEN 1 ELSE 0 END AS cz1,
        | CASE WHEN (doc_id // 5) % 4 = 2 THEN 1 ELSE 0 END AS cz2
        | FROM q),
        |w AS (SELECT doc_id, q0, q1, q2, q3,
        | (CASE s0 WHEN 0 THEN q0 WHEN 1 THEN q1 WHEN 2 THEN q2
        |   ELSE q3 END) + 10*((doc_id + 8) % 5 - 2) AS w0,
        | (CASE WHEN cz1 = 1 THEN q1
        |   WHEN s0 >= 2 THEN q3 ELSE q1 END)
        |   + 10*((doc_id + 9) % 5 - 2) AS w1,
        | CASE WHEN cz2 = 1 OR cz1 = 1 THEN q2
        |   WHEN s0 % 2 = 1 THEN q3 ELSE q2 END AS w2,
        | ((CASE (doc_id // 19) % 4 WHEN 0 THEN q0 WHEN 1 THEN q1
        |    WHEN 2 THEN q2 ELSE q3 END)
        |  + (CASE (doc_id // 21) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |    WHEN 2 THEN p2 ELSE p3 END) + 1)//2
        |  + 10*((doc_id + 11) % 5 - 2) AS w3
        | FROM b)
        |SELECT doc_id, 32 AS width, 32 AS height,
        | CAST(q0 AS INTEGER) AS q0, CAST(q1 AS INTEGER) AS q1,
        | CAST(q2 AS INTEGER) AS q2, CAST(q3 AS INTEGER) AS q3,
        | CAST(w0 AS INTEGER) AS w0, CAST(w1 AS INTEGER) AS w1,
        | CAST(w2 AS INTEGER) AS w2, CAST(w3 AS INTEGER) AS w3,
        | CAST(256*(w0 + w1 + w2 + w3) AS BIGINT) AS y3_sum
        |FROM w""".stripMargin,
    // m31: the multi-reference P replayed closed form — frame-0 and
    // frame-1 chains as m30, then pick(ref, src) = ref 0 -> p[src]
    // (the recent P frame), ref 1 -> v[src] (the I frame).
    "m31_video_multiref" ->
      """WITH f AS (SELECT doc_id,
        | (doc_id + 0) % 4 AS f0, (doc_id + 1) % 4 AS f1,
        | (doc_id + 2) % 4 AS f2, (doc_id + 3) % 4 AS f3
        | FROM documents),
        |v AS (SELECT doc_id,
        | 128 + (160*f0 + 32)//64 AS v0,
        | v0 + (160*f1 + 32)//64 AS v1,
        | v0 + (160*f2 + 32)//64 AS v2,
        | (v1 + v2 + 1)//2 + (160*f3 + 32)//64 AS v3
        | FROM f),
        |p AS (SELECT doc_id, v0, v1, v2, v3,
        | (CASE (doc_id // 1) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 0) % 5 - 2) AS p0,
        | (CASE (doc_id // 3) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 1) % 5 - 2) AS p1,
        | (CASE (doc_id // 5) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 2) % 5 - 2) AS p2,
        | (CASE (doc_id // 7) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 3) % 5 - 2) AS p3
        | FROM v),
        |e AS (SELECT doc_id, v0, v1, v2, v3, p0, p1, p2, p3,
        | (CASE WHEN (doc_id // 2) % 2 = 0
        |   THEN CASE (doc_id // 3) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |     WHEN 2 THEN p2 ELSE p3 END
        |   ELSE CASE (doc_id // 3) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |     WHEN 2 THEN v2 ELSE v3 END END)
        |   + 10*((doc_id + 6) % 5 - 2) AS e0,
        | CASE WHEN (doc_id // 5) % 2 = 0
        |   THEN CASE (doc_id // 7) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |     WHEN 2 THEN p2 ELSE p3 END
        |   ELSE CASE (doc_id // 7) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |     WHEN 2 THEN v2 ELSE v3 END END AS e1a,
        | CASE WHEN (doc_id // 9) % 2 = 0
        |   THEN CASE (doc_id // 11) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |     WHEN 2 THEN p2 ELSE p3 END
        |   ELSE CASE (doc_id // 11) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |     WHEN 2 THEN v2 ELSE v3 END END AS e1b,
        | CASE WHEN (doc_id // 13) % 2 = 0
        |   THEN CASE (doc_id // 23) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |     WHEN 2 THEN p2 ELSE p3 END
        |   ELSE CASE (doc_id // 23) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |     WHEN 2 THEN v2 ELSE v3 END END AS q0,
        | CASE WHEN (doc_id // 15) % 2 = 0
        |   THEN CASE (doc_id // 25) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |     WHEN 2 THEN p2 ELSE p3 END
        |   ELSE CASE (doc_id // 25) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |     WHEN 2 THEN v2 ELSE v3 END END AS q1,
        | CASE WHEN (doc_id // 17) % 2 = 0
        |   THEN CASE (doc_id // 27) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |     WHEN 2 THEN p2 ELSE p3 END
        |   ELSE CASE (doc_id // 27) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |     WHEN 2 THEN v2 ELSE v3 END END AS q2,
        | CASE WHEN (doc_id // 19) % 2 = 0
        |   THEN CASE (doc_id // 29) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |     WHEN 2 THEN p2 ELSE p3 END
        |   ELSE CASE (doc_id // 29) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |     WHEN 2 THEN v2 ELSE v3 END END AS q3,
        | CASE WHEN (doc_id // 31) % 2 = 0
        |   THEN CASE (doc_id // 33) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |     WHEN 2 THEN p2 ELSE p3 END
        |   ELSE CASE (doc_id // 33) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |     WHEN 2 THEN v2 ELSE v3 END END AS e3
        | FROM p)
        |SELECT doc_id, 32 AS width, 32 AS height,
        | CAST(e0 AS INTEGER) AS e0,
        | CAST(e1a AS INTEGER) AS e1a, CAST(e1b AS INTEGER) AS e1b,
        | CAST(q0 AS INTEGER) AS f0, CAST(q1 AS INTEGER) AS f1,
        | CAST(q2 AS INTEGER) AS f2, CAST(q3 AS INTEGER) AS f3,
        | CAST(e3 AS INTEGER) AS e3,
        | CAST(256*e0 + 128*(e1a + e1b) + 64*(q0 + q1 + q2 + q3)
        |   + 256*e3 AS BIGINT) AS y2_sum
        |FROM e""".stripMargin,
    // m30: the IPB GOP replayed closed form — frame-0 chain, P values
    // p_m = v[src] + 10*c, B values off the doc-selected lists with
    // the exact rounded bi-average, intra tail as the neighbour mean.
    "m30_video_bipred" ->
      """WITH f AS (SELECT doc_id,
        | (doc_id + 0) % 4 AS f0, (doc_id + 1) % 4 AS f1,
        | (doc_id + 2) % 4 AS f2, (doc_id + 3) % 4 AS f3
        | FROM documents),
        |v AS (SELECT doc_id,
        | 128 + (160*f0 + 32)//64 AS v0,
        | v0 + (160*f1 + 32)//64 AS v1,
        | v0 + (160*f2 + 32)//64 AS v2,
        | (v1 + v2 + 1)//2 + (160*f3 + 32)//64 AS v3
        | FROM f),
        |p AS (SELECT doc_id, v0, v1, v2, v3,
        | (CASE (doc_id // 1) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 0) % 5 - 2) AS p0,
        | (CASE (doc_id // 3) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 1) % 5 - 2) AS p1,
        | (CASE (doc_id // 5) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 2) % 5 - 2) AS p2,
        | (CASE (doc_id // 7) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 3) % 5 - 2) AS p3
        | FROM v),
        |b AS (SELECT doc_id, p0, p1, p2, p3,
        | (CASE (doc_id // 9) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |   WHEN 2 THEN p2 ELSE p3 END) + 10*((doc_id + 3) % 5 - 2) AS w0,
        | (CASE (doc_id // 11) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + 10*((doc_id + 4) % 5 - 2) AS w1,
        | ((CASE (doc_id // 13) % 4 WHEN 0 THEN p0 WHEN 1 THEN p1
        |    WHEN 2 THEN p2 ELSE p3 END)
        |  + (CASE (doc_id // 17) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |    WHEN 2 THEN v2 ELSE v3 END) + 1)//2
        |  + 10*((doc_id + 5) % 5 - 2) AS w2,
        | (w1 + w2 + 1)//2 AS w3
        | FROM p)
        |SELECT doc_id, 32 AS width, 32 AS height,
        | CAST(p0 AS INTEGER) AS p0, CAST(p1 AS INTEGER) AS p1,
        | CAST(p2 AS INTEGER) AS p2, CAST(p3 AS INTEGER) AS p3,
        | CAST(w0 AS INTEGER) AS w0, CAST(w1 AS INTEGER) AS w1,
        | CAST(w2 AS INTEGER) AS w2, CAST(w3 AS INTEGER) AS w3,
        | CAST(256*(w0 + w1 + w2 + w3) AS BIGINT) AS y2_sum
        |FROM b""".stripMargin,
    // m29: frame-0 chain as m28, then one flat value per partition —
    // source MB picked by (doc_id // period) % 4 per partition,
    // uniform 10c residuals on the P_8x8 and 16x16 MBs.
    "m29_video_inter_parts" ->
      """WITH f AS (SELECT doc_id,
        | (doc_id + 0) % 4 AS f0, (doc_id + 1) % 4 AS f1,
        | (doc_id + 2) % 4 AS f2, (doc_id + 3) % 4 AS f3
        | FROM documents),
        |v AS (SELECT doc_id,
        | 128 + (160*f0 + 32)//64 AS v0,
        | v0 + (160*f1 + 32)//64 AS v1,
        | v0 + (160*f2 + 32)//64 AS v2,
        | (v1 + v2 + 1)//2 + (160*f3 + 32)//64 AS v3
        | FROM f),
        |p AS (SELECT doc_id, v0, v1, v2, v3,
        | CASE (doc_id // 1) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END AS a0,
        | CASE (doc_id // 3) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END AS a1,
        | CASE (doc_id // 5) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END AS b0,
        | CASE (doc_id // 7) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END AS b1,
        | CASE WHEN (doc_id // 2) % 2 = 1
        |   THEN 10*((doc_id + 4) % 7 - 3) ELSE 0 END AS r2,
        | CASE WHEN doc_id % 2 = 1
        |   THEN 10*((doc_id + 2) % 7 - 3) ELSE 0 END AS r3,
        | (CASE (doc_id // 23) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + r2 AS q0,
        | (CASE (doc_id // 29) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + r2 AS q1,
        | (CASE (doc_id // 31) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + r2 AS q2,
        | (CASE (doc_id // 37) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + r2 AS q3,
        | (CASE (doc_id // 41) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + r2 AS q4,
        | (CASE (doc_id // 43) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + r2 AS q5,
        | (CASE (doc_id // 47) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + r2 AS q6,
        | (CASE (doc_id // 53) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + r2 AS q7,
        | (CASE (doc_id // 59) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + r2 AS q8,
        | (CASE (doc_id // 19) % 4 WHEN 0 THEN v0 WHEN 1 THEN v1
        |   WHEN 2 THEN v2 ELSE v3 END) + r3 AS w3
        | FROM v)
        |SELECT doc_id, 32 AS width, 32 AS height,
        | CAST(a0 AS INTEGER) AS a0, CAST(a1 AS INTEGER) AS a1,
        | CAST(b0 AS INTEGER) AS b0, CAST(b1 AS INTEGER) AS b1,
        | CAST(q0 AS INTEGER) AS q0, CAST(q1 AS INTEGER) AS q1,
        | CAST(q2 AS INTEGER) AS q2, CAST(q3 AS INTEGER) AS q3,
        | CAST(q4 AS INTEGER) AS q4, CAST(q5 AS INTEGER) AS q5,
        | CAST(q6 AS INTEGER) AS q6, CAST(q7 AS INTEGER) AS q7,
        | CAST(q8 AS INTEGER) AS q8,
        | CAST(w3 AS INTEGER) AS w3,
        | CAST(128*(a0 + a1 + b0 + b1) + 32*(q0 + q1 + q2 + q3)
        |   + 16*(q4 + q5 + q6 + q7) + 64*q8
        |   + 256*w3 AS BIGINT) AS y1_sum
        |FROM p""".stripMargin,
    // m28: the two-frame GOP replayed closed form. Frame 0: I16-DC
    // chain at QPy 36 (spread(f) = (160f+32)//64, f in 0..3 so the
    // floor runs on a positive numerator); frame 1: skip copies v0,
    // the moved MB adds the exactly-linear 10c luma DC on its
    // doc-selected source, the clamped fractional MB lands on v0
    // whatever its fraction (6-tap over a constant is the constant),
    // the intra MB is the rounded average of its MC'd neighbours, and
    // the chroma sums replay the 4c DC drops plus the 8.3.4.1
    // per-block intra chroma prediction of the last MB.
    "m28_video_inter_p" ->
      """WITH f AS (SELECT doc_id,
        | (doc_id + 0) % 4 AS f0, (doc_id + 1) % 4 AS f1,
        | (doc_id + 2) % 4 AS f2, (doc_id + 3) % 4 AS f3
        | FROM documents),
        |v AS (SELECT doc_id,
        | 128 + (160*f0 + 32)//64 AS v0,
        | v0 + (160*f1 + 32)//64 AS v1,
        | v0 + (160*f2 + 32)//64 AS v2,
        | (v1 + v2 + 1)//2 + (160*f3 + 32)//64 AS v3
        | FROM f),
        |p AS (SELECT doc_id, v0, v1, v2, v3,
        | v0 AS w0,
        | (CASE doc_id % 3 WHEN 0 THEN v1 WHEN 1 THEN v0 ELSE v3 END)
        |   + CASE WHEN doc_id % 2 = 1
        |       THEN 10*((doc_id + 2) % 7 - 3) ELSE 0 END AS w1,
        | v0 + CASE WHEN (doc_id // 2) % 2 = 1
        |       THEN 10*((doc_id + 4) % 7 - 3) ELSE 0 END AS w2,
        | (w1 + w2 + 1)//2 AS w3,
        | 128 + 4*((doc_id + 1) % 5 - 2) AS tcb,
        | 128 + 4*((doc_id + 5) % 5 - 2) AS lcb,
        | 128 + 4*((doc_id + 3) % 5 - 2) AS tcr,
        | 128 + 4*((doc_id + 7) % 5 - 2) AS lcr
        | FROM v)
        |SELECT doc_id, 32 AS width, 32 AS height,
        | CAST(v0 AS INTEGER) AS v0, CAST(v1 AS INTEGER) AS v1,
        | CAST(v2 AS INTEGER) AS v2, CAST(v3 AS INTEGER) AS v3,
        | CAST(w0 AS INTEGER) AS w0, CAST(w1 AS INTEGER) AS w1,
        | CAST(w2 AS INTEGER) AS w2, CAST(w3 AS INTEGER) AS w3,
        | CAST(64*(128 + tcb + lcb)
        |   + 16*(2*((tcb + lcb + 1)//2) + tcb + lcb) AS BIGINT) AS cb_sum,
        | CAST(64*(128 + tcr + lcr)
        |   + 16*(2*((tcr + lcr + 1)//2) + tcr + lcr) AS BIGINT) AS cr_sum,
        | CAST(256*(v0 + v1 + v2 + v3 + w0 + w1 + w2 + w3) AS BIGINT)
        |   AS y_sum
        |FROM p""".stripMargin,
    // m27: the mixed I_16x16 / I_8x8 / I_4x4 picture replayed closed
    // form. QPy 36 makes both residual paths exactly linear (8x8 DC
    // dequant 320c then (320c+32)>>6 = 5c; 4x4 DC 640c -> 10c), the
    // I_8x8 MBs reconstruct flat per block (uniform or paired-flat
    // edges through the 8.3.2.2.1 filter), and the I_4x4 chain is the
    // m26 recurrence with BOTH neighbours available — T from the row
    // above (128 off the flat I_8x8 syntax MB for the top row), L from
    // the left column (the residual I_8x8 MB's u0/u3 blocks). Chain
    // order is z-scan; mode by (doc_id+blk)%4 among T / L / avg / L.
    "m27_video_intra8x8" ->
      """WITH k AS (SELECT doc_id,
        | CASE WHEN doc_id % 2 = 1 THEN doc_id % 7 - 3 ELSE 0 END AS c0,
        | CASE WHEN (doc_id // 2) % 2 = 1 THEN (doc_id + 10) % 7 - 3 ELSE 0 END AS c2,
        | CASE WHEN (doc_id // 4) % 2 = 1 THEN (doc_id + 15) % 7 - 3 ELSE 0 END AS c3,
        | 1 + doc_id % 15 AS mask FROM documents),
        |u AS (SELECT doc_id, mask,
        | 128 + 5*c0 AS u0, 128 + 5*c0 + 5*c2 AS u2,
        | 128 + 5*c0 + 5*c3 AS u3 FROM k),
        |r AS (SELECT doc_id, u0, u2, u3,
        | CASE WHEN mask % 2 = 1 THEN 10*((doc_id + 0) % 3 - 1) ELSE 0 END AS r0,
        | CASE WHEN mask % 2 = 1 THEN 10*((doc_id + 3) % 3 - 1) ELSE 0 END AS r1,
        | CASE WHEN mask % 2 = 1 THEN 10*((doc_id + 6) % 3 - 1) ELSE 0 END AS r2,
        | CASE WHEN mask % 2 = 1 THEN 10*((doc_id + 9) % 3 - 1) ELSE 0 END AS r3,
        | CASE WHEN (mask // 2) % 2 = 1 THEN 10*((doc_id + 12) % 3 - 1) ELSE 0 END AS r4,
        | CASE WHEN (mask // 2) % 2 = 1 THEN 10*((doc_id + 15) % 3 - 1) ELSE 0 END AS r5,
        | CASE WHEN (mask // 2) % 2 = 1 THEN 10*((doc_id + 18) % 3 - 1) ELSE 0 END AS r6,
        | CASE WHEN (mask // 2) % 2 = 1 THEN 10*((doc_id + 21) % 3 - 1) ELSE 0 END AS r7,
        | CASE WHEN (mask // 4) % 2 = 1 THEN 10*((doc_id + 24) % 3 - 1) ELSE 0 END AS r8,
        | CASE WHEN (mask // 4) % 2 = 1 THEN 10*((doc_id + 27) % 3 - 1) ELSE 0 END AS r9,
        | CASE WHEN (mask // 4) % 2 = 1 THEN 10*((doc_id + 30) % 3 - 1) ELSE 0 END AS r10,
        | CASE WHEN (mask // 4) % 2 = 1 THEN 10*((doc_id + 33) % 3 - 1) ELSE 0 END AS r11,
        | CASE WHEN (mask // 8) % 2 = 1 THEN 10*((doc_id + 36) % 3 - 1) ELSE 0 END AS r12,
        | CASE WHEN (mask // 8) % 2 = 1 THEN 10*((doc_id + 39) % 3 - 1) ELSE 0 END AS r13,
        | CASE WHEN (mask // 8) % 2 = 1 THEN 10*((doc_id + 42) % 3 - 1) ELSE 0 END AS r14,
        | CASE WHEN (mask // 8) % 2 = 1 THEN 10*((doc_id + 45) % 3 - 1) ELSE 0 END AS r15
        | FROM u),
        |v AS (SELECT doc_id, u0, u2, u3,
        | (CASE (doc_id + 0) % 4 WHEN 0 THEN 128
        |   WHEN 2 THEN (128 + u0 + 1)//2 ELSE u0 END) + r0 AS b0,
        | (CASE (doc_id + 1) % 4 WHEN 0 THEN 128
        |   WHEN 2 THEN (128 + b0 + 1)//2 ELSE b0 END) + r1 AS b1,
        | (CASE (doc_id + 2) % 4 WHEN 0 THEN b0
        |   WHEN 2 THEN (b0 + u0 + 1)//2 ELSE u0 END) + r2 AS b2,
        | (CASE (doc_id + 3) % 4 WHEN 0 THEN b1
        |   WHEN 2 THEN (b1 + b2 + 1)//2 ELSE b2 END) + r3 AS b3,
        | (CASE (doc_id + 4) % 4 WHEN 0 THEN 128
        |   WHEN 2 THEN (128 + b1 + 1)//2 ELSE b1 END) + r4 AS b4,
        | (CASE (doc_id + 5) % 4 WHEN 0 THEN 128
        |   WHEN 2 THEN (128 + b4 + 1)//2 ELSE b4 END) + r5 AS b5,
        | (CASE (doc_id + 6) % 4 WHEN 0 THEN b4
        |   WHEN 2 THEN (b4 + b3 + 1)//2 ELSE b3 END) + r6 AS b6,
        | (CASE (doc_id + 7) % 4 WHEN 0 THEN b5
        |   WHEN 2 THEN (b5 + b6 + 1)//2 ELSE b6 END) + r7 AS b7,
        | (CASE (doc_id + 8) % 4 WHEN 0 THEN b2
        |   WHEN 2 THEN (b2 + u3 + 1)//2 ELSE u3 END) + r8 AS b8,
        | (CASE (doc_id + 9) % 4 WHEN 0 THEN b3
        |   WHEN 2 THEN (b3 + b8 + 1)//2 ELSE b8 END) + r9 AS b9,
        | (CASE (doc_id + 10) % 4 WHEN 0 THEN b8
        |   WHEN 2 THEN (b8 + u3 + 1)//2 ELSE u3 END) + r10 AS b10,
        | (CASE (doc_id + 11) % 4 WHEN 0 THEN b9
        |   WHEN 2 THEN (b9 + b10 + 1)//2 ELSE b10 END) + r11 AS b11,
        | (CASE (doc_id + 12) % 4 WHEN 0 THEN b6
        |   WHEN 2 THEN (b6 + b9 + 1)//2 ELSE b9 END) + r12 AS b12,
        | (CASE (doc_id + 13) % 4 WHEN 0 THEN b7
        |   WHEN 2 THEN (b7 + b12 + 1)//2 ELSE b12 END) + r13 AS b13,
        | (CASE (doc_id + 14) % 4 WHEN 0 THEN b12
        |   WHEN 2 THEN (b12 + b11 + 1)//2 ELSE b11 END) + r14 AS b14,
        | (CASE (doc_id + 15) % 4 WHEN 0 THEN b13
        |   WHEN 2 THEN (b13 + b14 + 1)//2 ELSE b14 END) + r15 AS b15
        | FROM r)
        |SELECT doc_id, 32 AS width, 32 AS height,
        | CAST(u0 AS INTEGER) AS u0, CAST(u2 AS INTEGER) AS u2,
        | CAST(u3 AS INTEGER) AS u3,
        | CAST(b0 AS INTEGER) AS b0, CAST(b1 AS INTEGER) AS b1,
        | CAST(b2 AS INTEGER) AS b2, CAST(b3 AS INTEGER) AS b3,
        | CAST(b4 AS INTEGER) AS b4, CAST(b5 AS INTEGER) AS b5,
        | CAST(b6 AS INTEGER) AS b6, CAST(b7 AS INTEGER) AS b7,
        | CAST(b8 AS INTEGER) AS b8, CAST(b9 AS INTEGER) AS b9,
        | CAST(b10 AS INTEGER) AS b10, CAST(b11 AS INTEGER) AS b11,
        | CAST(b12 AS INTEGER) AS b12, CAST(b13 AS INTEGER) AS b13,
        | CAST(b14 AS INTEGER) AS b14, CAST(b15 AS INTEGER) AS b15,
        | CAST(65536 + 64*(2*u0 + u2 + u3)
        |   + 16*(b0+b1+b2+b3+b4+b5+b6+b7+b8+b9+b10+b11+b12+b13+b14+b15)
        |   AS BIGINT) AS y_sum
        |FROM v""".stripMargin,
    // m26: the I_4x4 flat-block recurrence replayed with DuckDB lateral
    // column references — per block, pred source by the fixture's mode
    // rule (top row -> left value, left column -> top value, interior
    // by (doc_id+blk)%4 among T / L / rounded-average / L), plus the
    // exact 4*c flat residual (QPy 28: (256c+32)>>6 = 4c), gated by the
    // same CBP mask bit the encoder derives. Chain order is z-scan.
    "m26_video_intra4x4" ->
      """WITH c AS (SELECT doc_id,
        | 1 + doc_id % 15 AS mask FROM documents),
        |k AS (SELECT doc_id,
        | CASE WHEN mask % 2 = 1 THEN (doc_id + 0) % 7 - 3 ELSE 0 END AS c0,
        | CASE WHEN mask % 2 = 1 THEN (doc_id + 5) % 7 - 3 ELSE 0 END AS c1,
        | CASE WHEN mask % 2 = 1 THEN (doc_id + 10) % 7 - 3 ELSE 0 END AS c2,
        | CASE WHEN mask % 2 = 1 THEN (doc_id + 15) % 7 - 3 ELSE 0 END AS c3,
        | CASE WHEN (mask // 2) % 2 = 1 THEN (doc_id + 20) % 7 - 3 ELSE 0 END AS c4,
        | CASE WHEN (mask // 2) % 2 = 1 THEN (doc_id + 25) % 7 - 3 ELSE 0 END AS c5,
        | CASE WHEN (mask // 2) % 2 = 1 THEN (doc_id + 30) % 7 - 3 ELSE 0 END AS c6,
        | CASE WHEN (mask // 2) % 2 = 1 THEN (doc_id + 35) % 7 - 3 ELSE 0 END AS c7,
        | CASE WHEN (mask // 4) % 2 = 1 THEN (doc_id + 40) % 7 - 3 ELSE 0 END AS c8,
        | CASE WHEN (mask // 4) % 2 = 1 THEN (doc_id + 45) % 7 - 3 ELSE 0 END AS c9,
        | CASE WHEN (mask // 4) % 2 = 1 THEN (doc_id + 50) % 7 - 3 ELSE 0 END AS c10,
        | CASE WHEN (mask // 4) % 2 = 1 THEN (doc_id + 55) % 7 - 3 ELSE 0 END AS c11,
        | CASE WHEN (mask // 8) % 2 = 1 THEN (doc_id + 60) % 7 - 3 ELSE 0 END AS c12,
        | CASE WHEN (mask // 8) % 2 = 1 THEN (doc_id + 65) % 7 - 3 ELSE 0 END AS c13,
        | CASE WHEN (mask // 8) % 2 = 1 THEN (doc_id + 70) % 7 - 3 ELSE 0 END AS c14,
        | CASE WHEN (mask // 8) % 2 = 1 THEN (doc_id + 75) % 7 - 3 ELSE 0 END AS c15
        | FROM c),
        |v AS (SELECT doc_id,
        | 128 + 4*c0 AS v0,
        | v0 + 4*c1 AS v1,
        | v0 + 4*c2 AS v2,
        | (CASE (doc_id + 3) % 4 WHEN 0 THEN v1
        |   WHEN 2 THEN (v2 + v1 + 1)//2 ELSE v2 END) + 4*c3 AS v3,
        | v1 + 4*c4 AS v4,
        | v4 + 4*c5 AS v5,
        | (CASE (doc_id + 6) % 4 WHEN 0 THEN v4
        |   WHEN 2 THEN (v3 + v4 + 1)//2 ELSE v3 END) + 4*c6 AS v6,
        | (CASE (doc_id + 7) % 4 WHEN 0 THEN v5
        |   WHEN 2 THEN (v6 + v5 + 1)//2 ELSE v6 END) + 4*c7 AS v7,
        | v2 + 4*c8 AS v8,
        | (CASE (doc_id + 9) % 4 WHEN 0 THEN v3
        |   WHEN 2 THEN (v8 + v3 + 1)//2 ELSE v8 END) + 4*c9 AS v9,
        | v8 + 4*c10 AS v10,
        | (CASE (doc_id + 11) % 4 WHEN 0 THEN v9
        |   WHEN 2 THEN (v10 + v9 + 1)//2 ELSE v10 END) + 4*c11 AS v11,
        | (CASE (doc_id + 12) % 4 WHEN 0 THEN v6
        |   WHEN 2 THEN (v9 + v6 + 1)//2 ELSE v9 END) + 4*c12 AS v12,
        | (CASE (doc_id + 13) % 4 WHEN 0 THEN v7
        |   WHEN 2 THEN (v12 + v7 + 1)//2 ELSE v12 END) + 4*c13 AS v13,
        | (CASE (doc_id + 14) % 4 WHEN 0 THEN v12
        |   WHEN 2 THEN (v11 + v12 + 1)//2 ELSE v11 END) + 4*c14 AS v14,
        | (CASE (doc_id + 15) % 4 WHEN 0 THEN v13
        |   WHEN 2 THEN (v14 + v13 + 1)//2 ELSE v14 END) + 4*c15 AS v15
        | FROM k)
        |SELECT doc_id, 16 AS width, 16 AS height,
        | CAST(v0 AS INTEGER) AS v0, CAST(v1 AS INTEGER) AS v1,
        | CAST(v2 AS INTEGER) AS v2, CAST(v3 AS INTEGER) AS v3,
        | CAST(v4 AS INTEGER) AS v4, CAST(v5 AS INTEGER) AS v5,
        | CAST(v6 AS INTEGER) AS v6, CAST(v7 AS INTEGER) AS v7,
        | CAST(v8 AS INTEGER) AS v8, CAST(v9 AS INTEGER) AS v9,
        | CAST(v10 AS INTEGER) AS v10, CAST(v11 AS INTEGER) AS v11,
        | CAST(v12 AS INTEGER) AS v12, CAST(v13 AS INTEGER) AS v13,
        | CAST(v14 AS INTEGER) AS v14, CAST(v15 AS INTEGER) AS v15,
        | CAST(16*(v0+v1+v2+v3+v4+v5+v6+v7+v8+v9+v10+v11+v12+v13+v14+v15)
        |   AS BIGINT) AS y_sum
        |FROM v""".stripMargin,
    // m25: closed-form replay of the dense-CAVLC picture. t0(cls,pos)
    // is the inverse-transform output of each density class's fixed
    // level pattern, derived by an INDEPENDENT transcription of the
    // 8.5.12.1 dequant at QPy 28 (LevelScale = 16*normAdjust(4) =
    // {256,400,320} by position class, shift 0) and the 8.5.12.2
    // butterfly — both exactly linear in the per-doc scale G because
    // every >>1 operand is even. pixel = clip(128 + (G*t0 + 32) >> 6);
    // the +64000/-1000 keeps the floor division on a positive
    // numerator (|G*t0| <= 6996), the m24 offset idiom.
    "m25_video_dense_cavlc" ->
      """WITH base AS (SELECT doc_id,
        |   CAST((1 + doc_id % 3) *
        |        (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS G
        | FROM documents),
        |px AS (SELECT base.doc_id,
        |   (blk.oy + rr.r) * 16 + blk.ox + cc.c AS idx,
        |   LEAST(255, GREATEST(0,
        |     128 + (base.G * COALESCE(t0.t, 0) + 32 + 64000) // 64 - 1000))
        |     AS v
        | FROM base
        | CROSS JOIN (VALUES
        |   (0,'A',0,0),(1,'B',4,0),(2,'E',0,4),(3,'C',4,4),
        |   (4,'D',8,0),(5,'C',12,0),(6,'A',8,4),(7,'B',12,4),
        |   (8,'C',0,8),(9,'E',4,8),(10,'B',0,12),(11,'D',4,12),
        |   (12,'A',8,8),(13,'D',12,8),(14,'C',8,12),(15,'B',12,12))
        |   blk(b, cls, ox, oy)
        | CROSS JOIN range(4) rr(r) CROSS JOIN range(4) cc(c)
        | LEFT JOIN (VALUES
        |   ('A',0,576),('A',1,256),('A',2,-384),('A',3,-704),
        |   ('A',4,224),('A',5,-96),('A',6,-736),('A',7,-1056),
        |   ('A',8,544),('A',9,224),('A',10,-416),('A',11,-736),
        |   ('A',12,1216),('A',13,896),('A',14,256),('A',15,-64),
        |   ('B',0,160),('B',1,-112),('B',2,368),('B',3,1120),
        |   ('B',4,752),('B',5,280),('B',6,360),('B',7,912),
        |   ('B',8,912),('B',9,40),('B',10,-680),('B',11,-528),
        |   ('B',12,480),('B',13,-592),('B',14,-1712),('B',15,-1760),
        |   ('C',0,712),('C',1,356),('C',2,476),('C',3,-648),
        |   ('C',4,1464),('C',5,908),('C',6,-12),('C',7,-1976),
        |   ('C',8,264),('C',9,948),('C',10,1228),('C',11,-776),
        |   ('C',12,-1288),('C',13,-164),('C',14,356),('C',15,-1848),
        |   ('D',0,772),('D',1,-700),('D',2,-580),('D',3,-388),
        |   ('D',4,-28),('D',5,-484),('D',6,-2204),('D',7,2332),
        |   ('D',8,92),('D',9,356),('D',10,-1764),('D',11,-348),
        |   ('D',12,1212),('D',13,1980),('D',14,-700),('D',15,452))
        |   t0(cls, pos, t)
        |   ON t0.cls = blk.cls AND t0.pos = 4 * rr.r + cc.c)
        |SELECT doc_id, 16 AS width, 16 AS height,
        | CAST(MAX(CASE WHEN idx = 0 THEN v END) AS INTEGER) AS p_a,
        | CAST(MAX(CASE WHEN idx = 4 THEN v END) AS INTEGER) AS p_b,
        | CAST(MAX(CASE WHEN idx = 68 THEN v END) AS INTEGER) AS p_c,
        | CAST(MAX(CASE WHEN idx = 8 THEN v END) AS INTEGER) AS p_d,
        | CAST(MAX(CASE WHEN idx = 64 THEN v END) AS INTEGER) AS p_e,
        | CAST(SUM(v) AS BIGINT) AS y_sum,
        | CAST(SUM(v * (idx + 1)) AS BIGINT) AS y_checksum
        |FROM px GROUP BY doc_id""".stripMargin,
    // m22: round-trip identity — the decoded plane must equal the
    // source formula, so the oracle recomputes sums from the formula;
    // the constant plane is 64 copies of doc_id % 256
    "m22_gif_lzw_roundtrip" ->
      """SELECT doc_id, 24 AS width, 16 AS height,
        | CAST(list_sum(list_transform(range(0, 384), i ->
        |   (doc_id*31 + i) % 256)) AS BIGINT) AS gray_sum,
        | CAST(list_sum(list_transform(range(0, 384), i ->
        |   ((doc_id*31 + i) % 256) * (i+1))) AS BIGINT) AS gray_checksum,
        | CAST(64 * (doc_id % 256) AS BIGINT) AS const_sum
        |FROM documents""".stripMargin,
    // m24: the slice-boundary prediction chain in closed form — v0
    // anchors at 128, v1 chains off v0 (same slice), v2 RE-ANCHORS at
    // 128 (its top neighbour is in the other slice), v3 chains off v2;
    // weights are the per-MB position sums of the 32x32 plane
    "m24_video_multi_slice" ->
      """WITH a AS (SELECT doc_id,
        |   CAST(doc_id % 13 AS BIGINT) - 6 AS a0,
        |   CAST((doc_id//13) % 7 AS BIGINT) - 3 AS a1,
        |   CAST((doc_id//7) % 9 AS BIGINT) - 4 AS a2,
        |   CAST((doc_id//3) % 5 AS BIGINT) - 2 AS a3
        | FROM documents),
        |v AS (SELECT doc_id,
        |   LEAST(255, GREATEST(0, 128 + (40*a0 + 6432)//64 - 100)) AS v0,
        |   (40*a1 + 6432)//64 - 100 AS r1,
        |   LEAST(255, GREATEST(0, 128 + (40*a2 + 6432)//64 - 100)) AS v2,
        |   (40*a3 + 6432)//64 - 100 AS r3
        | FROM a),
        |u AS (SELECT doc_id, v0,
        |   LEAST(255, GREATEST(0, v0 + r1)) AS v1, v2,
        |   LEAST(255, GREATEST(0, v2 + r3)) AS v3
        | FROM v)
        |SELECT doc_id, 32 AS width, 32 AS height, 2 AS n_slices,
        | CAST(v0 AS INTEGER) AS v0, CAST(v1 AS INTEGER) AS v1,
        | CAST(v2 AS INTEGER) AS v2, CAST(v3 AS INTEGER) AS v3,
        | CAST(256*(v0 + v1 + v2 + v3) AS BIGINT) AS y_sum,
        | CAST(63616*v0 + 67712*v1 + 194688*v2 + 198784*v3 AS BIGINT)
        |   AS y_checksum
        |FROM u""".stripMargin,
    // m23: every chroma pixel of both 8x8 planes in closed form — f2
    // is the +-1 2x2 Hadamard of the planted DC levels (80x dequant at
    // QPc 24), the AC families are m21's four patterns at chroma
    // scale, and luma is the uniform 40x DC spread
    "m23_video_chroma_ac" ->
      """WITH base AS (SELECT doc_id,
        |   CAST(doc_id % 41 AS BIGINT) - 20 AS a0,
        |   CAST(doc_id % 7 AS BIGINT) - 3 AS b0,
        |   CAST((doc_id//7) % 5 AS BIGINT) - 2 AS b1,
        |   CAST((doc_id//5) % 3 AS BIGINT) - 1 AS b2,
        |   CAST((doc_id//3) % 3 AS BIGINT) - 1 AS b3,
        |   CAST(doc_id % 9 AS BIGINT) - 4 AS r0,
        |   CAST((doc_id//9) % 3 AS BIGINT) - 1 AS r1,
        |   CAST((doc_id//2) % 3 AS BIGINT) - 1 AS r2,
        |   CAST((doc_id//11) % 3 AS BIGINT) - 1 AS r3
        | FROM documents),
        |px AS (SELECT doc_id, comp.k AS comp, b.b, yy.y, xx.x,
        |   CASE WHEN comp.k = 0 THEN
        |     CASE b.b WHEN 0 THEN b0+b1+b2+b3 WHEN 1 THEN b0-b1+b2-b3
        |              WHEN 2 THEN b0+b1-b2-b3 ELSE b0-b1-b2+b3 END
        |   ELSE
        |     CASE b.b WHEN 0 THEN r0+r1+r2+r3 WHEN 1 THEN r0-r1+r2-r3
        |              WHEN 2 THEN r0+r1-r2-r3 ELSE r0-r1-r2+r3 END END AS f2,
        |   (doc_id + 11*b.b + comp.k*3) % 7 - 3 AS c,
        |   CASE WHEN yy.y IN (0,3) THEN 1 ELSE -1 END AS sy,
        |   CASE WHEN xx.x IN (0,3) THEN 1 ELSE -1 END AS sx,
        |   CASE yy.y WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN -1 ELSE -2 END AS vy,
        |   CASE xx.x WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN -1 ELSE -2 END AS vx,
        |   (b.b//2)*4 + yy.y AS gy, (b.b%2)*4 + xx.x AS gx
        | FROM base CROSS JOIN (VALUES (0),(1)) comp(k)
        |   CROSS JOIN range(0,4) b(b)
        |   CROSS JOIN range(0,4) yy(y) CROSS JOIN range(0,4) xx(x)),
        |v AS (SELECT doc_id, comp, gy*8 + gx AS gidx,
        |   LEAST(255, GREATEST(0, 128 + (80*f2
        |     + CASE b WHEN 0 THEN 160*c*sy WHEN 1 THEN 160*c*sx
        |              WHEN 2 THEN 104*c*vx ELSE 64*c*vy*vx END
        |     + 6432) // 64 - 100)) AS pv
        | FROM px),
        |agg AS (SELECT doc_id,
        |   CAST(SUM(CASE WHEN comp=0 THEN pv END) AS BIGINT) AS cb_sum,
        |   CAST(SUM(CASE WHEN comp=0 THEN pv*(gidx+1) END) AS BIGINT) AS cb_checksum,
        |   CAST(SUM(CASE WHEN comp=1 THEN pv END) AS BIGINT) AS cr_sum,
        |   CAST(SUM(CASE WHEN comp=1 THEN pv*(gidx+1) END) AS BIGINT) AS cr_checksum,
        |   CAST(MAX(CASE WHEN comp=0 AND gidx=0 THEN pv END) AS INTEGER) AS cb00,
        |   CAST(MAX(CASE WHEN comp=1 AND gidx=63 THEN pv END) AS INTEGER) AS cr77
        | FROM v GROUP BY doc_id)
        |SELECT base.doc_id, 16 AS width, 16 AS height,
        | CAST(256 * LEAST(255, GREATEST(0,
        |   128 + (40*a0 + 6432) // 64 - 100)) AS BIGINT) AS y_sum,
        | cb_sum, cb_checksum, cr_sum, cr_checksum, cb00, cr77
        |FROM base JOIN agg USING (doc_id)""".stripMargin,
    // m21: every pixel of the 16x16 plane recomputed in closed form —
    // per (block b, y, x): the planted level per family, the even
    // LevelScales (160/208/256 -> exact >>1 halvings), the butterfly
    // sign patterns (1,-1,-1,1) and (2,1,-1,-2), DC at 40*a0, and the
    // shared floor((.. + 32)/64) rounding (offset +6400 keeps // a
    // floor on negatives); z-scan block offsets reconstruct the
    // global raster index for the weighted checksum
    "m21_video_ac_residuals" ->
      """WITH px AS (
        | SELECT d.doc_id, b.b, yy.y, xx.x,
        |   CAST(d.doc_id % 41 AS BIGINT) - 20 AS a0,
        |   CASE WHEN b.b < 4  THEN (d.doc_id + 7*b.b) % 7 - 3
        |        WHEN b.b < 8  THEN (d.doc_id + 5*b.b) % 7 - 3
        |        WHEN b.b < 12 THEN (d.doc_id + 3*b.b) % 5 - 2
        |        ELSE               (d.doc_id + b.b) % 5 - 2 END AS c,
        |   CASE WHEN yy.y IN (0, 3) THEN 1 ELSE -1 END AS sy,
        |   CASE WHEN xx.x IN (0, 3) THEN 1 ELSE -1 END AS sx,
        |   CASE yy.y WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN -1 ELSE -2 END AS vy,
        |   CASE xx.x WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN -1 ELSE -2 END AS vx,
        |   8*((b.b//4)%2) + 4*(b.b%2) + xx.x AS gx,
        |   8*(b.b//8) + 4*((b.b//2)%2) + yy.y AS gy
        | FROM documents d
        |   CROSS JOIN range(0,16) b(b)
        |   CROSS JOIN range(0,4) yy(y)
        |   CROSS JOIN range(0,4) xx(x)),
        |v AS (
        | SELECT doc_id, gy*16 + gx AS gidx,
        |   LEAST(255, GREATEST(0, 128 +
        |     (40*a0
        |      + CASE WHEN b < 4  THEN 160*c*sy
        |             WHEN b < 8  THEN 160*c*sx
        |             WHEN b < 12 THEN 104*c*vx
        |             ELSE             64*c*vy*vx END
        |      + 6432) // 64 - 100)) AS pv
        | FROM px)
        |SELECT doc_id, 16 AS width, 16 AS height,
        | CAST(MAX(CASE WHEN gidx = 0 THEN pv END) AS INTEGER) AS p00,
        | CAST(MAX(CASE WHEN gidx = 3 THEN pv END) AS INTEGER) AS p03,
        | CAST(MAX(CASE WHEN gidx = 12 THEN pv END) AS INTEGER) AS p0c,
        | CAST(MAX(CASE WHEN gidx = 128 THEN pv END) AS INTEGER) AS p80,
        | CAST(MAX(CASE WHEN gidx = 204 THEN pv END) AS INTEGER) AS pcc,
        | CAST(SUM(pv) AS BIGINT) AS y_sum,
        | CAST(SUM(pv * (gidx + 1)) AS BIGINT) AS y_checksum
        |FROM v GROUP BY doc_id""".stripMargin,
    // m10: the engine parses real H.264 bits; the oracle replays the
    // PLANTED geometry (4:2:0 frame-coded: CropUnitY=2, so bottom crop
    // removes 2 rows per unit; an IDR every 8th frame starting at 0 →
    // (frames-1)//8 + 1; NALs = SPS + per-frame AUD+slice)
    "m10_video_probe" ->
      """SELECT doc_id AS asset_id,
        | 16 * (4 + doc_id % 7) AS width,
        | 16 * (3 + doc_id % 5) - 2 * (doc_id % 3) AS height,
        | 3 + doc_id % 11 AS n_frames,
        | (doc_id % 11 + 2) // 8 + 1 AS n_idr,
        | 1 + 2 * (3 + doc_id % 11) AS n_nals
        |FROM documents""".stripMargin,
    "m1_binary_assets" ->
      """SELECT doc_id AS asset_id,
        | octet_length(encode(text)) AS n_bytes,
        | md5(text) AS digest,
        | CAST((octet_length(encode(text)) - 1) // 256 + 1 AS BIGINT) AS n_chunks,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes_chunked
        |FROM documents""".stripMargin,
    "m2_frame_sample" ->
      """SELECT doc_id AS asset_id,
        | CAST(octet_length(encode(text)) // 128 AS BIGINT) AS n_frames,
        | CAST((octet_length(encode(text)) // 128 + 2) // 3 AS BIGINT) AS n_sampled,
        | CASE WHEN octet_length(encode(text)) >= 128
        |      THEN lower(substring(hex(encode(text)), 1, 256)) END AS first_frame_hex
        |FROM documents""".stripMargin,
    "m11_image_dedup_groups" ->
      """WITH h AS (SELECT doc_id,
        | CAST(list_sum(list_transform(range(0, 32), b ->
        |   CASE WHEN ((doc_id*31 + (b//8)*9 + (b%8) + 1) % 256)
        |          > ((doc_id*31 + (b//8)*9 + (b%8)) % 256)
        |   THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS dhash_lo,
        | CAST(list_sum(list_transform(range(32, 64), b ->
        |   CASE WHEN ((doc_id*31 + (b//8)*9 + (b%8) + 1) % 256)
        |          > ((doc_id*31 + (b//8)*9 + (b%8)) % 256)
        |   THEN (1::BIGINT << (b - 32)) ELSE 0 END)) AS BIGINT) AS dhash_hi
        |FROM documents)
        |SELECT dhash_lo, dhash_hi, COUNT(*) AS n_images,
        | MIN(doc_id) AS keeper_id, CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM h GROUP BY dhash_lo, dhash_hi""".stripMargin,
    // m15: adjacent-frame SAD recomputed from the per-frame plane
    // formula (regime shift of 19000 at frame fc); decoded pixels must
    // match the formula for every frame or some SAD drifts
    "m15_decoded_scene_cuts" ->
      """WITH g AS (SELECT doc_id, CAST(3 + doc_id % 3 AS INTEGER) AS nf,
        |    1 + doc_id % 2 AS fc FROM documents),
        |pairs AS (SELECT doc_id, nf,
        |    CAST(list_sum(list_transform(range(0, 512), i ->
        |      abs(((doc_id*31 + f*7 + CASE WHEN f >= fc THEN 19000 ELSE 0 END + i) % 256)
        |        - ((doc_id*31 + (f+1)*7 + CASE WHEN f+1 >= fc THEN 19000 ELSE 0 END + i) % 256))))
        |      AS BIGINT) AS sad
        |  FROM g CROSS JOIN UNNEST(range(0, 4)) t(f) WHERE f < nf - 1)
        |SELECT doc_id, nf AS n_frames,
        |  CAST(SUM(sad) AS BIGINT) AS total_sad,
        |  CAST(MAX(sad) AS BIGINT) AS max_sad,
        |  CAST(SUM(CASE WHEN sad > 40*512 THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts
        |FROM pairs GROUP BY doc_id, nf""".stripMargin,
    // m16: stripe values recomputed in closed form — t_j is the +-1
    // Hadamard combination of the four planted DC levels, dequant at
    // QP 24 is exactly 40x, the DC-only core transform is
    // floor((dc+32)/64) (offset +6400 keeps // a floor on negatives),
    // and the full-plane weighted checksum uses the per-stripe
    // position-weight sums 7840 + 256*j
    // m20: the mode chain in closed form — v0 uniform, v1/v2 edge
    // copies + residual, MB3's plane gradient recomputed per pixel
    // (a = 16(v1+v2), b/c the 40x-dequant slopes); weights 63616/
    // 67712/194688 are the per-MB position sums in the 32x32 frame,
    // 529 + 32*(i//16) + i%16 the per-pixel weight inside MB3
    "m20_video_pred_modes" -> {
      def r(c: String) = s"((40*($c) + 6432) // 64 - 100)"
      s"""WITH c AS (SELECT doc_id,
         |   CAST(doc_id % 13 AS BIGINT) - 6 AS c0,
         |   CAST(doc_id % 5 AS BIGINT) - 2 AS c1,
         |   CAST((doc_id // 5) % 5 AS BIGINT) - 2 AS c2,
         |   CAST((doc_id // 3) % 5 AS BIGINT) - 2 AS c3
         | FROM documents),
         |v AS (SELECT doc_id,
         |   LEAST(255, GREATEST(0, 128 + ${r("c0")})) AS v0,
         |   ${r("c1")} AS r1, ${r("c2")} AS r2, ${r("c3")} AS r3 FROM c),
         |vv AS (SELECT doc_id, v0,
         |   LEAST(255, GREATEST(0, v0 + r1)) AS v1,
         |   LEAST(255, GREATEST(0, v0 + r2)) AS v2, r3 FROM v),
         |p3 AS (SELECT doc_id, v0, v1, v2,
         |   list_transform(range(0, 256), i ->
         |     LEAST(255, GREATEST(0,
         |       LEAST(255, GREATEST(0,
         |         (16*(v2 + v1) + ${r("v1 - v0")} * ((i % 16) - 7)
         |          + ${r("v2 - v0")} * ((i // 16) - 7) + 16) // 32))
         |       + r3))) AS p FROM vv)
         |SELECT doc_id, 32 AS width, 32 AS height,
         |  CAST(v0 AS INTEGER) AS v0, CAST(v1 AS INTEGER) AS v1,
         |  CAST(v2 AS INTEGER) AS v2, CAST(p[1] AS INTEGER) AS v3corner,
         |  CAST(256*(v0 + v1 + v2) + list_sum(p) AS BIGINT) AS y_sum,
         |  CAST(63616*v0 + 67712*v1 + 194688*v2 +
         |    list_sum(list_transform(range(0, 256), i ->
         |      p[i + 1] * (529 + 32*(i // 16) + (i % 16)))) AS BIGINT)
         |    AS y_checksum
         |FROM p3""".stripMargin
    },
    // m19: round-trip is lossless, so every output recomputes from the
    // plane formula; gray replays the exact fixed-point luma
    "m19_png_color" ->
      """SELECT doc_id, 12 AS width, 8 AS height,
        | CAST(list_sum(list_transform(range(0, 288), i ->
        |   (doc_id*31 + i) % 256)) AS BIGINT) AS rgb_sum,
        | CAST(list_sum(list_transform(range(0, 288), i ->
        |   ((doc_id*31 + i) % 256) * (i+1))) AS BIGINT) AS rgb_checksum,
        | CAST(list_sum(list_transform(range(0, 96), p ->
        |   (77*((doc_id*31 + 3*p) % 256) + 150*((doc_id*31 + 3*p+1) % 256)
        |    + 29*((doc_id*31 + 3*p+2) % 256)) // 256)) AS BIGINT) AS gray_sum
        |FROM documents""".stripMargin,
    // m18: the WHT replayed straight from the popcount identity over
    // the PCM formula; band energies pivot via MAX CASE, bits via bin
    "m18_audio_wht_features" ->
      """WITH g AS (SELECT doc_id, 64 + (doc_id % 32) * 2 AS n FROM documents),
        |fr AS (SELECT doc_id, unnest(range(0, n // 32)) AS frame_idx FROM g),
        |co AS (SELECT doc_id, frame_idx, k,
        |        SUM((CASE WHEN bit_count(k & s) % 2 = 0 THEN 1 ELSE -1 END)
        |            * ((doc_id*7 + (frame_idx*32 + s)*13) % 20000)) AS c
        |       FROM fr CROSS JOIN range(0, 32) tk(k)
        |               CROSS JOIN range(0, 32) ts(s)
        |       GROUP BY doc_id, frame_idx, k),
        |en AS (SELECT doc_id, frame_idx, k // 8 AS band,
        |        CAST(SUM(c*c) AS BIGINT) AS e
        |       FROM co GROUP BY 1, 2, 3)
        |SELECT doc_id, frame_idx,
        | MAX(CASE WHEN band = 0 THEN e END) AS e0,
        | MAX(CASE WHEN band = 1 THEN e END) AS e1,
        | MAX(CASE WHEN band = 2 THEN e END) AS e2,
        | MAX(CASE WHEN band = 3 THEN e END) AS e3,
        | CAST(length(bin(MAX(CASE WHEN band = 0 THEN e END) + 1)) AS INTEGER) AS b0,
        | CAST(length(bin(MAX(CASE WHEN band = 1 THEN e END) + 1)) AS INTEGER) AS b1,
        | CAST(length(bin(MAX(CASE WHEN band = 2 THEN e END) + 1)) AS INTEGER) AS b2,
        | CAST(length(bin(MAX(CASE WHEN band = 3 THEN e END) + 1)) AS INTEGER) AS b3
        |FROM en GROUP BY doc_id, frame_idx""".stripMargin,
    // m17: every plane value recomputed in closed form — luma stripes
    // at 40x dequant (QP 24), chroma quadrants at 80x dequant (QPc 24)
    // over the 2x2 Hadamard of the planted levels; checksum weights are
    // the per-region position sums (16x16 halves: 15936/16960; 8x8
    // quadrants: 232/296/744/808)
    "m17_video_chroma_pixels" -> {
      def px(m: Int, f: String) =
        s"CAST(LEAST(255, GREATEST(0, 128 + (($m*($f) + 6432) // 64) - 100)) AS INTEGER)"
      s"""WITH c AS (SELECT doc_id,
         |   CAST(doc_id % 13 AS BIGINT) - 6 AS a0,
         |   CAST((doc_id // 13) % 5 AS BIGINT) - 2 AS a1,
         |   CAST(doc_id % 7 AS BIGINT) - 3 AS b0,
         |   CAST((doc_id // 7) % 5 AS BIGINT) - 2 AS b1,
         |   CAST((doc_id // 5) % 3 AS BIGINT) - 1 AS b2,
         |   CAST((doc_id // 3) % 3 AS BIGINT) - 1 AS b3,
         |   CAST(doc_id % 9 AS BIGINT) - 4 AS r0,
         |   CAST((doc_id // 9) % 3 AS BIGINT) - 1 AS r1,
         |   CAST((doc_id // 2) % 3 AS BIGINT) - 1 AS r2,
         |   CAST((doc_id // 11) % 3 AS BIGINT) - 1 AS r3
         | FROM documents),
         |v AS (SELECT doc_id,
         |   ${px(40, "a0+a1")} AS y0, ${px(40, "a0-a1")} AS y1,
         |   ${px(80, "b0+b1+b2+b3")} AS cb00, ${px(80, "b0-b1+b2-b3")} AS cb01,
         |   ${px(80, "b0+b1-b2-b3")} AS cb10, ${px(80, "b0-b1-b2+b3")} AS cb11,
         |   ${px(80, "r0+r1+r2+r3")} AS cr00, ${px(80, "r0-r1+r2-r3")} AS cr01,
         |   ${px(80, "r0+r1-r2-r3")} AS cr10, ${px(80, "r0-r1-r2+r3")} AS cr11
         | FROM c)
         |SELECT doc_id, 16 AS width, 16 AS height,
         | y0, y1, cb00, cb01, cb10, cb11, cr00, cr01, cr10, cr11,
         | CAST(15936*y0 + 16960*y1 AS BIGINT) AS y_checksum,
         | CAST(232*cb00 + 296*cb01 + 744*cb10 + 808*cb11 AS BIGINT) AS cb_checksum,
         | CAST(232*cr00 + 296*cr01 + 744*cr10 + 808*cr11 AS BIGINT) AS cr_checksum
         |FROM v""".stripMargin
    },
    "m16_video_cavlc_pixels" ->
      """WITH c AS (SELECT doc_id,
        |   CAST(doc_id % 41 AS BIGINT) - 20 AS c0,
        |   CAST(doc_id % 7 AS BIGINT) - 3 AS c1,
        |   CAST((doc_id // 7) % 3 AS BIGINT) - 1 AS c2,
        |   CAST((doc_id // 3) % 3 AS BIGINT) - 1 AS c3
        | FROM documents),
        |t AS (SELECT doc_id,
        |   c0+c1+c2+c3 AS t0, c0+c1-c2-c3 AS t1,
        |   c0-c1-c2+c3 AS t2, c0-c1+c2-c3 AS t3 FROM c),
        |s AS (SELECT doc_id,
        |   CAST(LEAST(255, GREATEST(0, 128 + ((40*t0 + 6432) // 64) - 100)) AS INTEGER) AS s0,
        |   CAST(LEAST(255, GREATEST(0, 128 + ((40*t1 + 6432) // 64) - 100)) AS INTEGER) AS s1,
        |   CAST(LEAST(255, GREATEST(0, 128 + ((40*t2 + 6432) // 64) - 100)) AS INTEGER) AS s2,
        |   CAST(LEAST(255, GREATEST(0, 128 + ((40*t3 + 6432) // 64) - 100)) AS INTEGER) AS s3
        | FROM t)
        |SELECT doc_id, 16 AS width, 16 AS height, s0, s1, s2, s3,
        | CAST(64*(s0+s1+s2+s3) AS BIGINT) AS luma_sum,
        | CAST(7840*s0 + 8096*s1 + 8352*s2 + 8608*s3 AS BIGINT)
        |   AS luma_checksum
        |FROM s""".stripMargin,
    // m14: displayed pixels recomputed from the plane formula — height
    // shrinks by the SPS bottom crop (2 rows per crop unit), indices
    // stay row-major in the 32-wide plane because the crop is
    // bottom-only
    "m14_video_pixels" ->
      """SELECT doc_id, 32 AS width,
        | CAST(16 - 2*(doc_id % 3) AS INTEGER) AS height,
        | CAST(list_sum(list_transform(range(0, 512), i ->
        |   CASE WHEN i < 32*(16 - 2*(doc_id % 3))
        |        THEN (doc_id*31 + i) % 256 ELSE 0 END)) AS BIGINT) AS luma_sum,
        | CAST(list_sum(list_transform(range(0, 512), i ->
        |   CASE WHEN i < 32*(16 - 2*(doc_id % 3))
        |        THEN ((doc_id*31 + i) % 256) * (i+1) ELSE 0 END)) AS BIGINT)
        |   AS luma_checksum
        |FROM documents""".stripMargin,
    // m13: every output sample recomputed from the PCM formula
    // s(x) = (doc_id*7 + x*13) % 20000 with the kernels' floor
    // arithmetic; n = 64 + (doc_id%32)*2 (even), down has n//2
    // samples, up has 2n with the final sample repeated
    "m13_audio_resample" ->
      """WITH g AS (SELECT doc_id, 64 + (doc_id % 32) * 2 AS n FROM documents),
        |dn AS (SELECT doc_id,
        |    CAST(SUM(v) AS BIGINT) AS down_sum,
        |    CAST(SUM(v * (i+1)) AS BIGINT) AS down_checksum
        |  FROM (SELECT doc_id, i,
        |      ((doc_id*7 + (2*i)*13) % 20000
        |       + (doc_id*7 + (2*i+1)*13) % 20000) // 2 AS v
        |    FROM g CROSS JOIN range(0, 63) t(i) WHERE i < n // 2) x
        |  GROUP BY doc_id),
        |up AS (SELECT doc_id,
        |    CAST(SUM(v) AS BIGINT) AS up_sum,
        |    CAST(SUM(v * (j+1)) AS BIGINT) AS up_checksum
        |  FROM (SELECT doc_id, j,
        |      CASE WHEN j % 2 = 0 THEN (doc_id*7 + (j//2)*13) % 20000
        |           WHEN j // 2 < n - 1 THEN
        |             ((doc_id*7 + (j//2)*13) % 20000
        |              + (doc_id*7 + (j//2+1)*13) % 20000) // 2
        |           ELSE (doc_id*7 + (n-1)*13) % 20000 END AS v
        |    FROM g CROSS JOIN range(0, 252) t(j) WHERE j < 2 * n) x
        |  GROUP BY doc_id)
        |SELECT dn.doc_id, down_sum, down_checksum, up_sum, up_checksum
        |FROM dn JOIN up ON dn.doc_id = up.doc_id""".stripMargin,
    // m12: every output pixel recomputed from the plane formula
    // (doc_id*31 + rowMajorIdx) % 256 with the kernels' own floor
    // arithmetic — nearest: src = (y*12//5)*16 + (x*16//7); box: mean
    // of the 2x2 block, truncating — then the same weighted checksums
    "m12_image_resize" ->
      """WITH nn AS (SELECT doc_id,
        |    CAST(list_sum(list_transform(range(0, 35), i ->
        |      (doc_id*31 + ((i//7)*12//5)*16 + ((i%7)*16//7)) % 256))
        |      AS BIGINT) AS nn_sum,
        |    CAST(list_sum(list_transform(range(0, 35), i ->
        |      ((doc_id*31 + ((i//7)*12//5)*16 + ((i%7)*16//7)) % 256) * (i+1)))
        |      AS BIGINT) AS nn_checksum
        |  FROM documents),
        |bx AS (SELECT doc_id,
        |    CAST(list_sum(list_transform(range(0, 48), i ->
        |      ((doc_id*31 + (i//8)*2*16 + (i%8)*2) % 256
        |       + (doc_id*31 + (i//8)*2*16 + (i%8)*2 + 1) % 256
        |       + (doc_id*31 + ((i//8)*2+1)*16 + (i%8)*2) % 256
        |       + (doc_id*31 + ((i//8)*2+1)*16 + (i%8)*2 + 1) % 256) // 4))
        |      AS BIGINT) AS box_sum,
        |    CAST(list_sum(list_transform(range(0, 48), i ->
        |      (((doc_id*31 + (i//8)*2*16 + (i%8)*2) % 256
        |        + (doc_id*31 + (i//8)*2*16 + (i%8)*2 + 1) % 256
        |        + (doc_id*31 + ((i//8)*2+1)*16 + (i%8)*2) % 256
        |        + (doc_id*31 + ((i//8)*2+1)*16 + (i%8)*2 + 1) % 256) // 4) * (i+1)))
        |      AS BIGINT) AS box_checksum
        |  FROM documents)
        |SELECT nn.doc_id, nn_sum, nn_checksum, box_sum, box_checksum
        |FROM nn JOIN bx ON nn.doc_id = bx.doc_id""".stripMargin,
    "m9_image_dhash" ->
      """SELECT doc_id,
        | CAST(list_sum(list_transform(range(0, 32), b ->
        |   CASE WHEN ((doc_id*31 + (b//8)*9 + (b%8) + 1) % 256)
        |          > ((doc_id*31 + (b//8)*9 + (b%8)) % 256)
        |   THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS dhash_lo,
        | CAST(list_sum(list_transform(range(32, 64), b ->
        |   CASE WHEN ((doc_id*31 + (b//8)*9 + (b%8) + 1) % 256)
        |          > ((doc_id*31 + (b//8)*9 + (b%8)) % 256)
        |   THEN (1::BIGINT << (b - 32)) ELSE 0 END)) AS BIGINT) AS dhash_hi,
        | CAST(list_sum(list_transform(range(0, 64), b ->
        |   CASE WHEN ((doc_id*31 + (b//8)*9 + (b%8) + 1) % 256)
        |          > ((doc_id*31 + (b//8)*9 + (b%8)) % 256)
        |   THEN 1 ELSE 0 END)) AS BIGINT) AS n_set
        |FROM documents""".stripMargin,
    "m8_scene_cuts" ->
      """WITH d AS (SELECT doc_id, hex(encode(text)) AS h,
        |    CAST(octet_length(encode(text)) // 64 AS BIGINT) AS nf
        |  FROM documents),
        |diffs AS (SELECT doc_id, nf,
        |    list_sum(list_transform(range(0, 64), i ->
        |      abs(('0x' || substring(h, CAST(((k-1)*64+i)*2+1 AS INTEGER), 2))::INTEGER
        |        - ('0x' || substring(h, CAST((k*64+i)*2+1 AS INTEGER), 2))::INTEGER)))
        |      AS diff
        |  FROM d, UNNEST(range(1, nf)) AS t(k) WHERE nf >= 2)
        |SELECT doc_id AS asset_id, nf AS n_frames,
        | CAST(SUM(CASE WHEN diff > 64*24 THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
        | CAST(SUM(diff) AS BIGINT) AS total_diff,
        | CAST(MAX(diff) AS BIGINT) AS max_diff
        |FROM diffs GROUP BY doc_id, nf""".stripMargin,
    "m7_audio_frames" ->
      """WITH s AS (SELECT user_id, event_id,
        |    CAST(trunc(value * 50) AS BIGINT)
        |      * (CASE WHEN event_id % 2 = 0 THEN 1 ELSE -1 END) AS s,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS pos
        |  FROM events),
        |f AS (SELECT user_id, pos // 32 AS frame_idx, s, pos,
        |    LAG(s) OVER (PARTITION BY user_id, pos // 32 ORDER BY pos) AS prev
        |  FROM s)
        |SELECT user_id, frame_idx, COUNT(*) AS n_samples,
        | CAST(SUM(s * s) AS BIGINT) AS sum_sq,
        | CAST(SUM(CASE WHEN prev IS NOT NULL AND ((prev < 0) <> (s < 0))
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_cross
        |FROM f GROUP BY user_id, frame_idx""".stripMargin,
    "m3_wav_roundtrip" ->
      """SELECT user_id, 8000 AS sample_rate, 1 AS channels,
        | COUNT(*) AS n_samples,
        | CAST(COUNT(*) AS DOUBLE) / 8000 AS duration_sec,
        | sqrt(CAST(SUM(s * s) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS rms
        |FROM (SELECT user_id, CAST(trunc(value * 50) AS BIGINT) AS s
        |      FROM events)
        |GROUP BY user_id""".stripMargin,
    "m4_bmp_roundtrip" ->
      """SELECT doc_id, 16 AS width, 8 AS height,
        | CAST(54 + 48 * 8 AS BIGINT) AS bmp_bytes,
        | CAST(list_sum(list_transform(range(0, 128),
        |   i -> (doc_id * 31 + i) % 256)) AS DOUBLE) / 128 AS mean_luma
        |FROM documents""".stripMargin,
    "m5_png_roundtrip" ->
      """SELECT doc_id, 16 AS width, 8 AS height,
        | CAST(list_sum(list_transform(range(0, 128),
        |   i -> (doc_id * 31 + i) % 256)) AS DOUBLE) / 128 AS mean_luma
        |FROM documents""".stripMargin,
    "m6_jpeg_roundtrip" ->
      """SELECT doc_id, 16 AS width, 16 AS height,
        | CAST(list_sum(list_transform(range(0, 4),
        |   t -> 128 + 2 * ((doc_id * 11 + t * 7) % 60) - 60)) AS DOUBLE) / 4
        |   AS mean_luma
        |FROM documents""".stripMargin
  )
}
