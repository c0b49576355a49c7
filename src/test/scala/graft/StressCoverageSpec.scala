package graft

import org.scalatest.funsuite.AnyFunSuite

/** The battery-coverage-by-construction guard (VERDICT r18 item 5):
  * every catalog query must either carry a BENCH_STRESS scaling curve
  * (listed in [[BenchStress.Heavy]]) or be EXPLICITLY exempted here
  * with the reason class it falls under. A new query that lands in
  * `SparkEntry.queries` without touching either list fails this suite,
  * so battery coverage can no longer erode silently.
  */
class StressCoverageSpec extends AnyFunSuite {

  /** Queries that deliberately carry no stress curve. Reason classes:
    *  - fixed-size: the query's input is scale-free by construction
    *    (probe/eval tables, k-row sketches over bounded keys), so a
    *    blown-up corpus would not change what it measures;
    *  - operand-measured: a thin composition/eval whose expensive
    *    operands carry their own battery rows;
    *  - store-kernel: embedded-store admin paths (compaction,
    *    retention, snapshot, CDC, split) measured by Store*Spec and
    *    the connector suite rather than corpus curves;
    *  - stream-covered: streaming member whose state/shuffle shape is
    *    measured through another c-row of the same state class.
    */
  private val exempt: Map[String, String] = Map(
    // store-kernel / connector admin paths
    "c1_logstore_roundtrip" -> "store-kernel",
    "c2_logstore_json_value" -> "store-kernel",
    "c4_split_reroute" -> "store-kernel",
    "c6_snapshot_read" -> "store-kernel",
    "c8_incremental_read" -> "store-kernel",
    "c10_optimize_compact" -> "store-kernel",
    "c11_retention_expire" -> "store-kernel",
    // streaming members measured through a same-state-class c-row
    "c3_stream_hourly" -> "stream-covered (c5/c18 carry the curves)",
    "c7_stream_enrich" -> "stream-covered",
    "c9_stream_sessions" -> "stream-covered (c22 timer sessions)",
    "c12_stream_kmv" -> "stream-covered (sketch-state class)",
    "c13_stream_cms" -> "stream-covered (sketch-state class)",
    "c14_stream_hll" -> "stream-covered (sketch-state class)",
    "c15_stream_minhash" -> "stream-covered (sketch-state class)",
    "c16_stream_kll" -> "stream-covered (sketch-state class)",
    "c17_stream_bloom" -> "stream-covered (sketch-state class)",
    "c19_stream_anomaly" -> "stream-covered (c3 agg class)",
    "c21_stream_asof_enrich" -> "stream-covered (c18 join class)",
    // fixed-size or operand-measured dedup/sim/eval members
    "d5_dedup_embedding" -> "operand-measured (d17/d8 carry curves)",
    "d6_decontaminate" -> "operand-measured (d12/d16 class)",
    "d7_dedup_simhash128" -> "operand-measured (d4 class)",
    "d8_dedup_semantic" -> "operand-measured (d17 class)",
    "d11_bloom_decontaminate" -> "operand-measured (d12 class)",
    "d14_embedding_decontaminate" -> "operand-measured (d17 class)",
    "d18_incremental_dedup" -> "fixed-size (incoming batch bounded)",
    "s1_ann_cosine" -> "operand-measured (s17 carries the shape)",
    "s7_kmeans" -> "operand-measured (s13 carries the seed curve)",
    "s8_knn_classify" -> "operand-measured (s1 shape)",
    "s9_cluster_purity" -> "operand-measured",
    "s10_mmr_select" -> "fixed-size (poolK-bounded greedy)",
    "s11_range_search" -> "operand-measured (s1 shape)",
    "s14_ann_recall" -> "operand-measured (s1/s2 join)",
    // sketches over bounded key populations
    "k1_sketch_rollup" -> "fixed-size (bounded key grid)",
    "k2_freq_sketch" -> "fixed-size",
    "k3_hll_users" -> "fixed-size",
    "k4_heavy_hitters" -> "fixed-size",
    "k5_kll_quantiles" -> "fixed-size",
    "k7_sketch_error" -> "operand-measured",
    // relational members whose shape another q-row measures
    "q1_pricing_summary" -> "operand-measured (q30/q31 agg/join class)",
    "q2_parts_by_brand" -> "operand-measured",
    "q3_top_orders" -> "operand-measured",
    "q4_order_priority" -> "operand-measured",
    "q5_nation_revenue" -> "operand-measured",
    "q6_forecast_revenue" -> "operand-measured",
    "q7_rank_window" -> "operand-measured (TopK class)",
    "q8_segment_stats" -> "operand-measured",
    "q9_union_distinct" -> "operand-measured",
    "q10_anti_join" -> "operand-measured",
    "q11_rollup" -> "operand-measured",
    "q12_events_hourly" -> "operand-measured",
    "q13_attribution_join" -> "operand-measured (c18 carries it)",
    "q14_json_extract" -> "operand-measured",
    "q15_cube" -> "operand-measured",
    "q16_except" -> "operand-measured",
    "q17_sessionize" -> "operand-measured (c22 state class)",
    "q18_asof_join" -> "operand-measured (c21 carries it)",
    "q19_intersect" -> "operand-measured",
    "q20_window_suite" -> "operand-measured",
    "q21_pivot" -> "operand-measured",
    "q22_region_revenue" -> "operand-measured",
    "q23_revenue_leader" -> "operand-measured",
    "q24_moving_revenue" -> "operand-measured",
    "q25_small_order_revenue" -> "operand-measured",
    "q26_percentiles" -> "operand-measured",
    "q27_interval_join" -> "operand-measured",
    "q28_funnel" -> "operand-measured",
    "q29_grouping_sets" -> "operand-measured",
    "q30_bucketed_revenue" -> "operand-measured (q31 join class)",
    "q32_dpp_join" -> "operand-measured",
    "q33_anomalous_hours" -> "operand-measured",
    // text members measured through a same-shape t-row
    "t1_token_stats" -> "operand-measured (zero-shuffle map class)",
    "t2_quality_score" -> "operand-measured",
    "t3_lang_guess" -> "operand-measured",
    "t4_fingerprint" -> "operand-measured",
    "t5_bpe_tokens" -> "operand-measured",
    "t6_rolling_fingerprint" -> "operand-measured",
    "t7_split_assign" -> "operand-measured",
    "t8_rare_tokens" -> "operand-measured (t19 class)",
    "t9_lang_quota" -> "operand-measured",
    "t10_redact_pii" -> "operand-measured (t39 carries the chain)",
    "t11_repetition" -> "operand-measured (t31 class)",
    "t12_vocab_encode" -> "operand-measured",
    "t13_token_chunks" -> "operand-measured (t14 class)",
    "t16_epoch_mix" -> "operand-measured (t15 class)",
    "t17_bpe_tokenize" -> "operand-measured (t23 carries the curve)",
    "t18_source_mix" -> "operand-measured",
    "t19_bigram_mass" -> "operand-measured (t24/t29 class)",
    "t20_hashed_features" -> "operand-measured",
    "t25_stratified_sample" -> "operand-measured (t15 class)",
    "t26_rouge_overlap" -> "fixed-size (pairing bounded)",
    "t27_quality_classifier" -> "operand-measured (t28 class)",
    "t30_overlap_chunks" -> "operand-measured (t13/t14 class)",
    "t31_repetition_filters" -> "operand-measured (t28 class)",
    // multimodal members: the codec decode maps carry curves via the
    // m22-m44 rows; the bounded feature/probe members are scale-free
    "m1_binary_assets" -> "operand-measured (decode-map class)",
    "m2_frame_sample" -> "operand-measured",
    "m3_wav_roundtrip" -> "operand-measured",
    "m4_bmp_roundtrip" -> "operand-measured",
    "m5_png_roundtrip" -> "operand-measured",
    "m6_jpeg_roundtrip" -> "operand-measured",
    "m7_audio_frames" -> "operand-measured",
    "m8_scene_cuts" -> "operand-measured",
    "m9_image_dhash" -> "operand-measured",
    "m10_video_probe" -> "operand-measured",
    "m11_image_dedup_groups" -> "operand-measured (d9 + m9)",
    "m12_image_resize" -> "operand-measured",
    "m13_audio_resample" -> "operand-measured",
    "m14_video_pixels" -> "operand-measured (m25/m26 class)",
    "m15_decoded_scene_cuts" -> "operand-measured",
    "m16_video_cavlc_pixels" -> "operand-measured",
    "m17_video_chroma_pixels" -> "operand-measured",
    "m18_audio_wht_features" -> "operand-measured (m44 class)",
    "m19_png_color" -> "operand-measured",
    "m20_video_pred_modes" -> "operand-measured",
    "m21_video_ac_residuals" -> "operand-measured",
    "m23_video_chroma_ac" -> "operand-measured",
    "m24_video_multi_slice" -> "operand-measured",
    "m34_video_bparts" -> "operand-measured (m30/m31 class)",
    "m35_video_b8x8" -> "operand-measured",
    "m36_video_temporal_direct" -> "operand-measured (m32 class)",
    "m37_video_weighted_pred" -> "operand-measured",
    "m38_video_implicit_wp" -> "operand-measured",
    // prep pipelines: p1/p2 thin compositions; percentile readouts are
    // sub-rows of p25/p50/p75/p95 outputs
    "p1_prep_pipeline" -> "operand-measured (p6/p7 carry pipelines)",
    "p2_prep_pipeline_v2" -> "operand-measured"
  )

  test("every catalog query is stress-curved or explicitly exempted") {
    val heavy = BenchStress.Heavy.toSet
    val all = SparkEntry.queries.keySet
    val unclassified = (all -- heavy -- exempt.keySet).toSeq.sorted
    assert(unclassified.isEmpty,
      s"\nqueries with neither a BENCH_STRESS row nor an exemption " +
        s"(add to BenchStress.Heavy or StressCoverageSpec.exempt):\n  " +
        unclassified.mkString("\n  "))
    val stale = (heavy -- all).toSeq.sorted
    assert(stale.isEmpty, s"Heavy entries not in the catalog: $stale")
    val doubly = (heavy & exempt.keySet).toSeq.sorted
    assert(doubly.isEmpty, s"both curved and exempted: $doubly")
  }
}
