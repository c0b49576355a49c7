package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the properties that make these queries
  * scale (SCALE.md) are asserted on the optimized physical plans, so a
  * future refactor can't silently trade them away. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q1: shipdate filter is pushed to the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q1: scan reads only referenced columns") {
    val p = plan("q1_pricing_summary")
    assert(!p.contains("l_orderkey"), p) // unreferenced column must be pruned
  }

  test("q3: dimension joins broadcast, no sort-merge join") {
    val p = plan("q3_top_orders")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q5: all dimension joins broadcast") {
    val p = plan("q5_nation_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("s1: query side broadcast (corpus never shuffled for the join)") {
    val p = plan("s1_ann_cosine")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("s1: cosine scoring is the native expression, not interpreted HOFs") {
    // aggregate(zip_with(...)) lambdas evaluate outside whole-stage
    // codegen; the scoring projection must use DotProduct instead
    val p = plan("s1_ann_cosine")
    assert(p.contains("dotproduct") || p.contains("DotProduct"), p)
    assert(!p.contains("aggregate(zip_with"), p)
    assert(!p.contains("ArrayAggregate"), p)
  }

  test("s1: candidates are pruned per partition before the rank window") {
    // a bare row_number window would funnel |Q|x|C| scored rows into
    // |Q| reducers; TopK.perKey's local prune must sit below the window
    val p = plan("s1_ann_cosine")
    assert(p.contains("MapPartitions"), p)
    assert(p.contains("Window"), p)
    assert(p.indexOf("Window") < p.indexOf("MapPartitions"), // plans print top-down
      "prune must run before the window:\n" + p)
  }

  test("t30: chunks derive per-row — no join, no window, no extra shuffle") {
    // the chunk table must come straight off the token array (explode
    // of a sequence); a window or join here means someone rebuilt it
    // as a self-join, which shuffles the corpus twice at 100 TB
    val p = plan("t30_overlap_chunks")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("q33: stats broadcast back onto the hour grid; events shuffle once") {
    // the per-type 3-number stat table must broadcast (it is |types|
    // rows); a sort-merge join here re-shuffles the hour grid
    val p = plan("q33_anomalous_hours")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q34: latest-per-key is a combined hash aggregate, never a window sort") {
    val p = plan("q34_latest_state")
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_max") || p.contains("HashAggregate"), p)
  }

  test("q32: the fact scan carries a dynamic partition pruning filter") {
    // the dim filter is only knowable at runtime; the partitioned fact
    // scan must subscribe to it via a dynamicpruning expression — a
    // plain scan here means DPP was lost and 100 TB reads all 7/7ths
    val p = plan("q32_dpp_join")
    assert(p.toLowerCase.contains("dynamicpruning"), p)
    assert(p.contains("PartitionFilters"), p)
  }

  test("q1: aggregation is partial+final (map-side combine)") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("HashAggregate"), p)
    // partial agg appears below the exchange: two HashAggregate nodes
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("d5: exact embedding pairs avoid the nested-loop join") {
    val p = plan("d5_dedup_embedding")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q18: as-of join is a window over one shuffle, not a range join") {
    val p = plan("q18_asof_join")
    assert(p.contains("Window"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q27: keyless interval join is bin-bucketed, not nested-loop") {
    val p = plan("q27_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q11: rollup levels re-aggregate the base, no Expand of raw rows") {
    val p = plan("q11_rollup")
    assert(!p.contains("Expand"), p)
  }

  test("q7: the global window runs over locally pruned input") {
    // the prune stage (typed mapPartitions) must sit below the window
    val p = plan("q7_rank_window")
    assert(p.contains("Window"), p)
    assert(p.contains("MapPartitions") || p.contains("mapPartitions"), p)
  }

  test("d8: semantic dedup shuffles once on the cluster key, no join") {
    // each vector moves once (cluster-key exchange for the grouped
    // scan); a join/cartesian here would mean the O(n²) wall came back
    val p = plan("d8_dedup_semantic")
    assert("Exchange".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p)
  }

  test("t13: chunk explode is a zero-shuffle generator") {
    val p = plan("t13_token_chunks")
    assert(p.contains("Generate"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("t12: the encode pass is zero-shuffle (dictionary is broadcast, not joined)") {
    val p = plan("t12_vocab_encode")
    assert(!p.contains("Exchange") && !p.contains("Join"), p)
  }

  test("t14: packing windows partition by bucket — no global single-reducer sort") {
    val p = plan("t14_pack_sequences")
    assert(p.contains("Window"), p)
    assert(p.contains("hashpartitioning(bucket"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("t15: the corpus rank window partitions by bucket; only the 256-row count table sees a global order") {
    val p = plan("t15_global_shuffle")
    assert(p.contains("row_number"), p)
    assert(p.contains("hashpartitioning(bucket"), p)
    // the corpus-side row_number window must be bucket-partitioned, not
    // a global sort: its Window node names both fp and bucket
    assert("""Window \[row_number.*bucket""".r.findFirstIn(p).isDefined, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("d11: the decontamination scan is zero-shuffle, probe inside codegen") {
    val p = plan("d11_bloom_decontaminate")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      "the bloom probe must be a scan-side filter, not a join:\n" + p)
    assert(p.contains("bloom_might_contain"), p)
    // codegen'd spans print as "*(n) Filter ..." in the plan string
    assert("""\*\(\d+\) Filter NOT bloom_might_contain""".r
      .findFirstIn(p).isDefined, p)
  }

  test("d10: segment dedup has no quadratic stage (equi-joins only)") {
    val p = plan("d10_segment_dedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("d12: n-gram decontamination is equi-joins only") {
    val p = plan("d12_ngram_decontaminate")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("t16: the epoch mix is a generator over a broadcast join — one corpus shuffle at most") {
    val p = plan("t16_epoch_mix")
    assert(p.contains("Generate"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("t18: the rank window and the stratum aggregate share one exchange") {
    val p = plan("t18_source_mix")
    // one shuffle on (source, lang): the window's clustering is reused
    // by the final aggregate — a second exchange would mean Catalyst
    // stopped recognizing the shared partitioning
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }

  test("t19: the bigram frequency table broadcasts back, fact side never shuffles for the join") {
    val p = plan("t19_bigram_mass")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("t20: feature hashing is one map-side-combined shuffle, no vocabulary join") {
    val p = plan("t20_hashed_features")
    assert(!p.contains("Join"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q23: the argmax is a broadcast of the 1-row max, no window, one lineitem scan") {
    val p = plan("q23_revenue_leader")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), p)
    // the persisted supplier aggregate is the shared subplan: BOTH its
    // consumers (max + equality filter) must read the InMemoryRelation
    // (the string reprints the cached child per use; execution scans
    // lineitem once, at materialization) — the classic Q15 double-scan
    // trap is two independent FileScan subtrees with no cache
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p)
  }

  test("q25: the correlated scalar-aggregate is a window — one lineitem scan, one shuffle") {
    val p = plan("q25_small_order_revenue")
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), p) // no agg-then-self-join double scan
    assert("lineitem\\.parquet".r.findAllIn(p).size === 1, p)
  }

  test("k2: sketches aggregate under ObjectHashAggregate with partial merge") {
    val p = plan("k2_freq_sketch")
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q22: all five dimension joins broadcast and every join filter reaches a scan") {
    // at sf0.1 (PLANS.md) this holds too: 5 BHJ, 6 pushed filters. At
    // 100× customer/supplier outgrow the threshold and AQE degrades
    // those to SMJ — acceptable; no hint pins the broadcast.
    val p = plan("q22_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size === 5, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert("PushedFilters: \\[IsNotNull".r.findAllIn(p).size >= 5, p)
  }

  test("q28: funnel stages join per-user MIN tables, never raw-event × raw-event") {
    // each stage is an agg-then-equi-join on user_id; the failure mode
    // is a range/theta join over raw events (nested-loop at scale). At
    // sf0.1 AQE picks SMJ for the biggest stage join — still an
    // equi-join; what must never appear is a non-equi fallback.
    val p = plan("q28_funnel")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 4, p) // per-stage MINs combine map-side
  }

  test("q30: the bucketed fact-fact join runs with ZERO join-side exchanges") {
    // both tables bucketBy(8, order key): the join must read co-located
    // buckets directly — any Exchange under it means the pre-shuffled
    // layout was silently ignored (the aggregation above keeps its own
    // exchange). At smoke scale the optimizer would BROADCAST the tiny
    // orders side (also shuffle-free, but not the layout under test),
    // so pin the shuffle-join path for the assertion.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan("q30_bucketed_revenue")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      val joinIdx = p.indexOf("MergeJoin") max p.indexOf("ShuffledHashJoin")
      val belowJoin = p.substring(joinIdx)
      assert(!belowJoin.contains("Exchange hashpartitioning"), p)
      assert("Bucketed: true".r.findAllIn(p).size >= 2, p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q31: the salted join shuffles on (key, salt), spreading hot keys") {
    // with broadcast off (the regime where salting matters), the join
    // must be a shuffle join whose clustering includes the salt column —
    // that inclusion IS the skew mitigation: a hot suppkey's rows land
    // on `factor` reducers instead of one.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan("q31_salted_join")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      val joinLine = p.linesIterator
        .find(l => l.contains("MergeJoin") || l.contains("ShuffledHashJoin"))
        .getOrElse("")
      assert(joinLine.contains("__salt"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("t32/t33/t36/t37: no global-window rank of the stat table — GlobalRank bins instead") {
    // the round-12 scale-killer: ntile/row_number OVER () with no
    // PARTITION BY funnels the per-doc stat table through ONE reducer.
    // All four now rank via GlobalRank (range-bucket + per-bin
    // row_number + broadcast prefix offsets); the builtin ntile must
    // not reappear, and every input-side rank window must partition by
    // the bin column. (The <=P-row offsets table keeps its global
    // window — the t15 count-table exemption.)
    for (q <- Seq("t32_ccnet_buckets", "t33_dsir_select",
        "t36_lm_perplexity_filter", "t37_mixture_interleave")) {
      val p = plan(q)
      assert(!p.contains("ntile("), s"$q reverted to builtin ntile:\n$p")
      assert(p.contains("windowspecdefinition(__gr_bin"),
        s"$q rank window is not bin-partitioned:\n$p")
      // the only row_number windows over the stat table are bin-keyed
      val rnGlobal = p.linesIterator.exists(l =>
        l.contains("row_number") && l.contains("windowspecdefinition(") &&
          !l.contains("windowspecdefinition(__gr_bin") &&
          !l.contains("windowspecdefinition(source"))
      assert(!rnGlobal, s"$q has a partition-less row_number window:\n$p")
    }
  }
}
