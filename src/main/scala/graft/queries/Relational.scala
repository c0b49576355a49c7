package graft.queries

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational query catalog over the TPC-H-ish test tables.
  *
  * Re-expresses, Spark-first, the query semantics the reference exercises
  * end-to-end (SURVEY.md §2.5: projection/cast, aggregation, event-time
  * windows, stream-stream-style self-join, union, limit — reference
  * examples at LoghubMicroBatchSourceSuite.scala:381-459,
  * StructuredLoghubWordCount.scala:77, LoghubRelationSuite.scala:163-172)
  * plus the standard OLAP surface (joins incl. semi/anti, rollup, ranking
  * windows) a user of the connector would run in Spark on ingested logs.
  *
  * Scale notes (100 TB): every aggregation is a partial (map-side) +
  * final hash aggregate; dimension joins broadcast (nation/region/
  * customer/part are tiny vs lineitem); fact-fact joins shuffle on the
  * join key only after filters are pushed to the parquet scan.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "q1_pricing_summary" -> q1,
    "q2_parts_by_brand" -> q2,
    "q3_top_orders" -> q3,
    "q4_order_priority" -> q4,
    "q5_nation_revenue" -> q5,
    "q6_forecast_revenue" -> q6,
    "q7_rank_window" -> q7,
    "q8_segment_stats" -> q8,
    "q9_union_distinct" -> q9,
    "q10_anti_join" -> q10,
    "q11_rollup" -> q11,
    "q12_events_hourly" -> q12,
    "q13_attribution_join" -> q13,
    "q14_json_extract" -> q14,
    "q15_cube" -> q15,
    "q16_except" -> q16,
    "q17_sessionize" -> q17,
    "q18_asof_join" -> q18,
    "q19_intersect" -> q19,
    "q20_window_suite" -> q20,
    "q21_pivot" -> q21,
    "q22_region_revenue" -> q22,
    "q23_revenue_leader" -> q23,
    "q24_moving_revenue" -> q24,
    "q25_small_order_revenue" -> q25,
    "q26_percentiles" -> q26,
    "q27_interval_join" -> q27,
    "q28_funnel" -> q28,
    "q29_grouping_sets" -> q29,
    "q30_bucketed_revenue" -> q30,
    "q31_salted_join" -> q31,
    "q32_dpp_join" -> q32,
    "q33_anomalous_hours" -> q33,
    "q34_latest_state" -> q34,
    "q35_incremental_rollup" -> q35,
    "q36_scd2_history" -> q36,
    "q38_cohort_retention" -> q38,
    "q39_zorder_layout" -> q39,
    "q40_gapfill_ffill" -> q40,
    "q41_graph_rank" -> q41
  )

  /** Incremental materialized-view maintenance (q35): the daily-rollup
    * pattern a 100 TB warehouse runs instead of full recomputes — a
    * STORED per-type state (count, exact decimal sum, min/max, and a
    * mergeable HLL user sketch) built from the accumulated base is
    * combined with the incoming delta's partial aggregates; the base
    * rows are never rescanned. Every aggregate is ALGEBRAIC
    * (count/sum/min/max merge by their own operation; distinct-count
    * merges as the k3 HLL register-max), so merged(base ⊕ delta) is
    * provably the full-scan result — which is exactly what the oracle
    * computes: the full-table rollup, HLL replayed register-for-
    * register. Decimal partial sums keep the double cast lossless
    * across the two-level fold (the dsum6 discipline).
    *
    * Scale: the delta-sized scan + two |types|-row merges; at
    * production scale the base state is a table, not a subquery —
    * the identity proven here is what makes that table correct. */
  private def q35: Q = (spark, dir) => {
    import graft.functions.Sketches.{hll_build, hll_estimate, hll_merge}
    val ev = t(spark, dir, "events")
      .select(col("event_type"), col("user_id").cast(LongType).as("user_id"),
        col("value"), epochS(col("ts")).as("t"))
    // deterministic time split: 5 of every 7 epoch-seconds are the
    // accumulated base, the rest arrive as the delta
    val isBase = pmod(col("t"), lit(7L)) < 5
    def partials(rows: DataFrame): DataFrame = rows
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).as("s"),
        min(col("t")).as("mn"), max(col("t")).as("mx"),
        hll_build(col("user_id")).as("sk"))
    val base = partials(ev.filter(isBase)) // the stored MV state
    val delta = partials(ev.filter(!isBase)) // today's increment
    base.unionByName(delta)
      .groupBy(col("event_type"))
      .agg(sum(col("n")).cast(LongType).as("n_events"),
        sum(col("s")).cast(DoubleType).as("sum_value"),
        min(col("mn")).as("min_t"), max(col("mx")).as("max_t"),
        hll_estimate(hll_merge(col("sk"))).as("approx_users"))
  }

  /** Latest-row-per-key upsert view (q34): the CDC/materialized-state
    * read every event log serves — each user's most recent event, with
    * its full payload. The scalable shape is ONE max(struct(orderKey,
    * payload)) hash aggregate with map-side combine (plan-guarded: no
    * Window) — the row_number()-over-user window formulation funnels
    * every user's whole history through a sort before discarding all
    * but one row, which at 100 TB is a sort of the corpus. The struct
    * comparison orders by (ts, event_id) — event_id is unique, so the
    * winner is total-ordered and the payload fields after it are never
    * compared. */
  private def q34: Q = (spark, dir) =>
    t(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(struct(epochUs(col("ts")).as("ts"), col("event_id"),
        col("event_type"), col("value"))).as("m"))
      .select(col("user_id"), col("m.ts").as("last_ts"),
        col("m.event_id").as("last_event_id"),
        col("m.event_type").as("last_type"),
        col("m.value").as("last_value"))

  /** SCD2 state history (q36): compress each user's event stream into
    * validity intervals of its event_type "state" — the slowly-
    * changing-dimension type-2 table every lakehouse keeps for
    * dimension history (q34 answers "what is the state NOW"; this
    * answers "what was it at any time t"). A row opens where the state
    * CHANGES (lag-detect against the previous event under the total
    * (t, event_id) order) and closes at the next change (lead); the
    * open interval carries valid_to = -1. Both windows and the oracle
    * share the exact (epoch-seconds, event_id) ordering, so the
    * compression is deterministic and engine-exact.
    *
    * Scale: both windows partition by user_id — high cardinality, one
    * hash exchange that the second window REUSES (same partitioning,
    * no second shuffle); per-user state is a single lag/lead frame,
    * never a driver-side pass. */
  private def q36: Q = (spark, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("event_id"))
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        epochS(col("ts")).as("t"), col("event_id"))
    e.withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("valid_to",
        coalesce(lead(col("t"), 1).over(w), lit(-1L)))
      .select(col("user_id"), col("event_type"),
        col("t").as("valid_from"), col("valid_to"),
        col("event_id").as("open_event_id"))
  }

  /** Cohort retention (q38): the product-analytics staple — users
    * cohorted by their first-activity week, then for every (cohort,
    * week-offset) cell the count of that cohort's users still active
    * and the retention fraction. Weeks are pure integer arithmetic
    * (epoch-seconds div 604800), so the grid is engine-exact with no
    * date_trunc/locale semantics in play; retention is a small-int
    * division (exact in binary floating point at these cardinalities).
    *
    * Scale: one distinct on (user_id, week) — map-side combined, the
    * only corpus-sized shuffle; the per-user cohort min reuses the
    * user clustering, and the cohort-size table is |weeks| rows —
    * broadcast back onto the cells. No windows, no per-user sort. */
  private def q38: Q = (spark, dir) => {
    val uw = t(spark, dir, "events")
      .select(col("user_id"),
        expr("CAST(CAST(CAST(ts AS TIMESTAMP) AS BIGINT) DIV 604800 AS BIGINT)")
          .as("wk"))
      .distinct()
    val cohort = uw.groupBy(col("user_id")).agg(min(col("wk")).as("cwk"))
    val sizes = cohort.groupBy(col("cwk"))
      .agg(count(lit(1)).as("cohort_users"))
    val cells = uw.join(cohort, "user_id")
      .groupBy(col("cwk"), (col("wk") - col("cwk")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    cells.join(broadcast(sizes), "cwk")
      .select(col("cwk").as("cohort_week"), col("week_offset"),
        col("n_active"), col("cohort_users"),
        (col("n_active").cast(DoubleType) / col("cohort_users"))
          .as("retention"))
  }

  /** Fixed-point graph centrality (q41): PageRank-style rank flow over
    * the customer↔supplier purchase graph (distinct (o_custkey,
    * l_suppkey) pairs from lineitem⋈orders, bidirected) — the
    * domain-centrality signal web-corpus pipelines weight pages by
    * (CommonCrawl ranks hosts with exactly this harmonic/PageRank
    * family before sampling). Four damped iterations in INTEGER fixed
    * point (scale 10^6): contrib(u) = r(u) DIV outdeg(u), r'(v) =
    * 150000 + (850000 · Σ contrib) DIV 10^6 — Long sums are
    * order-free and the integer divisions replay exactly, so the
    * whole iterative computation is engine-exact with no float-fold
    * caveat, and the oracle unrolls the four iterations as CTE
    * layers. Output: per supplier, the converged-enough rank and its
    * neighbor count.
    *
    * Scale: the Pregel-lite pattern — per iteration ONE broadcast join
    * of the edge list with the |nodes|-row rank vector (the edge list
    * never shuffles) and one map-side-combined sum on dst;
    * `localCheckpoint` bounds plan lineage per round (the s7 k-means
    * precedent). The explicit broadcast holds while the rank vector
    * fits an executor (a domain-centrality graph is ~10^7 hosts =
    * hundreds of MB — it does); past that the same plan runs as a
    * shuffle join on v with the edge list pre-partitioned by src, the
    * standard GraphX/Pregel layout. Edge EXTRACTION is the
    * corpus-sized stage (the lineitem⋈orders distinct); the iteration
    * cost rides |edges|, fixed once the graph is built. */
  private def q41: Q = (spark, dir) => {
    val Scale = 1000000L
    val Base = 150000L
    val Damp = 850000L
    val Off = 10000000L
    val e0 = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(t(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct()
    // materialize the graph ONCE (without this every iteration would
    // recompute the corpus-sized extraction — measured 11s at sf0.1),
    // and carry the out-degree INSIDE the rank vector so each
    // iteration is a single broadcast join over the edge list (the
    // vector is |nodes| rows — checkpointed data loses stats, so the
    // explicit broadcast() keeps the planner off a sort-merge join of
    // the edges) plus one map-side-combined dst-sum. The edge list
    // itself never shuffles.
    val ed = e0.select(col("c").as("src"), (col("s") + lit(Off)).as("dst"))
      .unionAll(e0.select((col("s") + lit(Off)).as("src"),
        col("c").as("dst")))
      .localCheckpoint()
    val degrees = ed.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .select(col("src").as("v"), col("d")).localCheckpoint()
    // The rank chain is a SINGLE-reference plan: each layer reads
    // r(k-1) once (inside m) and the checkpointed ed/degrees tables,
    // so the unrolled 4-layer plan grows linearly and nothing is
    // recomputed — no per-iteration localCheckpoint needed (each one
    // was a blocking driver materialization; dropping the four cut
    // 2.9s -> 2.3s at sf0.1, rows identical). The fixed 4-iteration
    // count keeps the plan depth bounded at any scale; an open-ended
    // convergence loop would reintroduce per-round checkpointing (the
    // duplicateComponents shape) instead.
    var r = degrees.select(col("v"), col("d"), lit(Scale).as("r"))
    for (_ <- 1 to 4) {
      val m = ed.join(broadcast(r), col("src") === col("v"))
        .select(col("dst"), expr("r DIV d").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("m"))
      r = degrees.join(broadcast(m), col("v") === col("dst"), "left")
        .select(col("v"), col("d"), (lit(Base) +
          expr(s"($Damp * coalesce(m, CAST(0 AS BIGINT))) DIV $Scale"))
          .as("r"))
    }
    r.filter(col("v") >= Off)
      .select((col("v") - Off).as("s_suppkey"), col("r").as("rank_fp"),
        col("d").as("n_neighbors"))
  }

  /** Hourly gap-fill + forward-fill resample (q40): the metrics/IoT
    * regularization every time-series store exposes (InfluxDB's
    * `fill(previous)`, TimescaleDB's `locf`, Pandas `resample.ffill`) —
    * each user's irregular event stream becomes a DENSE hourly grid
    * from their first to their last active hour, carrying observation
    * count, the hour's last observed value, and that value forward
    * through gap hours. Floats are PICKED, never folded: the per-hour
    * representative is the max over (ts, event_id)-ordered structs (a
    * selection, engine-exact) and the fill is `last(_, ignoreNulls)`
    * under a per-user row frame — no float aggregation anywhere, so
    * the DOUBLE column hash-matches DuckDB bit-for-bit.
    *
    * Scale: one (user, hour) hash aggregate over the events, a
    * per-user bounds aggregate whose `sequence()` explode generates
    * the spine (rows ∝ user-hours, never materialized on the driver),
    * and ONE per-user window for the fill — user-partitioned, so the
    * sort parallelizes across the key population; no global order, no
    * SinglePartition exchange. The spine join shuffles on user_id
    * only. */
  private def q40: Q = (spark, dir) => {
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("value"),
        epochUs(col("ts")).as("us"))
      .withColumn("hr", expr("us DIV 3600000000"))
    val perHour = ev.groupBy(col("user_id"), col("hr"))
      .agg(count(lit(1)).as("n_obs"),
        max(struct(col("us"), col("event_id"), col("value")))
          .getField("value").as("v_last"))
    val spine = ev.groupBy(col("user_id"))
      .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"))).as("hr"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(perHour, Seq("user_id", "hr"), "left")
      .select(col("user_id"), (col("hr") * 3600L).as("hour_start"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"), col("v_last"),
        last(col("v_last"), ignoreNulls = true).over(w).as("v_ffill"))
  }

  /** Z-order clustering layout (q39): the data-layout half of
    * Delta/Iceberg's `OPTIMIZE ZORDER BY (a, b)` — rows mapped onto a
    * space-filling curve over (l_partkey, l_suppkey) so that files
    * clustered by curve position carry TIGHT min/max zone maps on BOTH
    * dimensions at once (a single-column sort gives perfect pruning on
    * one dim and none on the other; the z-curve trades a little of each
    * for locality on both — Morton 1966, the layout every lakehouse
    * OPTIMIZE implements). Each dim is min/max-normalized to a 16-bit
    * grid with pure integer arithmetic ((v − vmin)·65535 DIV
    * max(vmax − vmin, 1)), the two grids bit-interleave into a 32-bit
    * z-value (x in even bits, y in odd), and the top 8 z-bits name the
    * target file (a 16×16 grid cell ↔ 4 high bits per dim). The output
    * is the layout's MANIFEST — per bucket: row count and the zone map
    * (min/max of both dims) a scan planner would prune with. Every step
    * is integer-exact, so the whole layout replays in SQL.
    *
    * Scale: the z-value is one codegen'd projection (32 bit-ops per
    * row, no shuffle); the manifest is one map-side-combined hash
    * aggregate on the 8-bit bucket id. The min/max stats are a single
    * scalar aggregate collected once (4 longs — at 100 TB these come
    * free from table statistics). The actual file rewrite this manifest
    * describes is `repartitionByRange(bucket) .sortWithinPartitions
    * (zval) .write` — the exchange moves each row once, same as any
    * rewrite; this query is the oracle-checkable readout of where rows
    * land and how tight the resulting zone maps are. */
  private def q39: Q = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
    val st = li.agg(min(col("l_partkey")), max(col("l_partkey")),
      min(col("l_suppkey")), max(col("l_suppkey"))).head()
    val (pMin, pMax) = (st.getLong(0), st.getLong(1))
    val (sMin, sMax) = (st.getLong(2), st.getLong(3))
    // integral DIV (not Divide: long / long is DOUBLE division in
    // Spark SQL, and a float quotient half-ulp from an integer would
    // floor differently than the oracle's integer //)
    val pd = math.max(pMax - pMin, 1L)
    val sd = math.max(sMax - sMin, 1L)
    val gridded = li.select(col("l_partkey"), col("l_suppkey"),
      expr(s"(l_partkey - $pMin) * 65535 DIV $pd").as("px"),
      expr(s"(l_suppkey - $sMin) * 65535 DIV $sd").as("sy"))
    // Morton interleave: x bit i -> z bit 2i, y bit i -> z bit 2i+1.
    // Disjoint bit positions, so OR-reduce; stays one codegen'd
    // projection (shiftright/and/shiftleft are all native expressions).
    val z = (0 until 16).map { i =>
      shiftleft(shiftright(col("px"), i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(col("sy"), i).bitwiseAND(lit(1L)),
          2 * i + 1))
    }.reduce(_ bitwiseOR _)
    gridded.select(col("l_partkey"), col("l_suppkey"),
        shiftright(z, 24).cast(IntegerType).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("p_min"), max(col("l_partkey")).as("p_max"),
        min(col("l_suppkey")).as("s_min"), max(col("l_suppkey")).as("s_max"))
  }

  /** Hourly anomaly flags (q33): the monitoring/alerting readout a log
    * analytics engine exists for — per event type, flag hours whose
    * event count deviates from that type's mean by more than two
    * population standard deviations. The two-sigma test is evaluated
    * WITHOUT any float: |x − S/h| > 2σ cross-multiplies to
    * (x·h − S)² > 4·(h·SS − S²) over integer sums (S = Σn, SS = Σn²,
    * h = hours), so the flag set is engine-exact — no Welford-vs-naive
    * stddev drift, no sqrt. The cross-multiplied products run in
    * DECIMAL(38,0) (see [[twoSigmaFlag]]) mirroring the oracle's
    * HUGEINT headroom — LongType products would throw
    * ARITHMETIC_OVERFLOW under Spark 4 ANSI mode well before 100 TB.
    *
    * Scale: two map-side-combined hash aggregates (hour grid, then the
    * per-type 3-number stats) and a broadcast of |types| stat rows back
    * onto the hour grid — never a shuffle of raw events beyond the
    * first aggregate, no windows. */
  private def q33: Q = (spark, dir) => {
    val hourly = t(spark, dir, "events")
      .withColumn("es", epochS(col("ts")))
      .withColumn("hour_start", expr("es DIV 3600 * 3600"))
      .groupBy(col("event_type"), col("hour_start"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy(col("event_type"))
      .agg(sum(col("n")).as("s"), sum(sqDec(col("n"))).as("ss"),
        count(lit(1)).as("h"))
    hourly.join(broadcast(stats), "event_type")
      .select(col("event_type"), col("hour_start"), col("n"),
        twoSigmaFlag(col("n"), col("h"), col("s"), col("ss"))
          .as("is_anomaly"))
  }

  /** n² in DECIMAL(38,0) — the per-hour count squared is the first
    * place the anomaly pipeline would overflow Long under ANSI (at
    * n > ~3·10^9 events/hour), so it never touches Long arithmetic. */
  private[queries] def sqDec(n: Column): Column = {
    val d = DecimalType(38, 0)
    n.cast(d) * n.cast(d)
  }

  /** (x·h − S)² > 4·(h·SS − S²) with all operands cast to
    * DECIMAL(38,0) so the cross-multiplied products never overflow
    * Long under ANSI mode: the worst product, dev², stays exact up to
    * |dev| ~ 10^19, i.e. corpus scales far past 100 TB (the oracle's
    * HUGEINT has the same headroom, and both engines compare scale-0
    * decimals exactly, so the flag set is engine-identical). Shared by
    * q33 and the streaming c19. */
  private[queries] def twoSigmaFlag(n: Column, h: Column, s: Column,
      ss: Column): Column = {
    val d = DecimalType(38, 0)
    val (nd, hd, sd, ssd) = (n.cast(d), h.cast(d), s.cast(d), ss.cast(d))
    val dev = nd * hd - sd
    dev * dev > lit(4).cast(d) * (hd * ssd - sd * sd)
  }

  /** Dynamic-partition-pruning join (q32): the events fact is
    * materialized ONCE per (session, sf dir) as a DATE-PARTITIONED
    * parquet layout (the standard fact layout at 100 TB — one
    * directory per day), then joined to a small filtered date dim.
    * The dim filter (day-of-month % 7 = 3) is only knowable at
    * RUNTIME on the fact side, so static partition pruning can't
    * help — Catalyst's dynamic partition pruning must broadcast the
    * dim, collect its surviving dates, and prune fact PARTITIONS
    * before the scan (plan-guarded in PlanShapeSpec: the fact scan
    * carries a dynamicpruning expression). At 100 TB this is the
    * difference between scanning ~1/7th of the table and scanning
    * all of it; the one-time partitioned write is warm-up, the same
    * shared-artifact idiom as q30's bucketed tables. The oracle is
    * the identical predicate applied directly to the raw events
    * parquet — partitioning must be layout-only. */
  private val partitionedEvents = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  private def q32: Q = (spark, dir) => {
    val path = partitionedEvents.getOrElseUpdate((spark, dir), {
      val p = ConnectorQueries.tempDir("graft-events-bydate")
      t(spark, dir, "events")
        .withColumn("event_date", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("event_date").parquet(p)
      p
    })
    val fact = spark.read.parquet(path)
    val dim = t(spark, dir, "events")
      .select(to_date(col("ts")).as("d")).distinct()
      .filter(dayofmonth(col("d")) % 7 === 3)
    fact.join(dim, col("event_date") === col("d"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        dsum6(col("value")).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** Salted skew join (q31): lineitem ⋈ supplier through
    * [[graft.operators.SkewJoin.saltedInner]] — big side salted over 8
    * buckets from its row-content hash, supplier replicated 8×, so a
    * hot suppkey's rows spread over 8 reducers instead of serializing
    * on one. Salting is pure EXECUTION layout: the oracle is the plain
    * unsalted SQL join, and any row lost, duplicated, or mis-salted
    * breaks the hash. The no-broadcast salted plan shape is pinned in
    * PlanShapeSpec (at smoke scale the optimizer rightly broadcasts
    * the replicated dim; at the scale where salting matters, it
    * shuffles on (key, salt) — both correct, only one under test). */
  private def q31: Q = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
    val sup = t(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    graft.operators.SkewJoin
      .saltedInner(li, sup, "l_suppkey", "s_suppkey", factor = 8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast(DoubleType).as("revenue"))
  }

  /** Bucketed co-located fact-fact join (q30): lineitem and orders are
    * materialized ONCE per (session, sf dir) as bucketBy(order key),
    * sortBy-sorted managed tables, and the join then runs with ZERO
    * exchanges — the SortMergeJoin reads matching buckets directly
    * (plan-guarded in PlanShapeSpec). This is the pre-shuffled layout a
    * repeated fact-fact join pipeline uses at 100 TB: pay the shuffle
    * once at WRITE time, never again per query — vs q28's intended
    * shuffle-per-query fact-fact SMJ on raw parquet. The one-time
    * bucketed write is warm-up (the same shared-artifact idiom as the
    * connector ingests); every rep measures the read-side join. The
    * oracle is the identical join over the raw parquet — bucketing must
    * be layout-only, changing nothing about the result. */
  private val bucketedTables = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (String, String)]

  /** Managed-table locations outlive the in-memory catalog: a previous
    * JVM's warehouse directory blocks saveAsTable with
    * LOCATION_ALREADY_EXISTS even though DROP TABLE has nothing to
    * drop. Clear both the catalog entry and the leftover location. */
  private def resetManagedTable(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    val wh = spark.sessionState.conf.warehousePath.stripPrefix("file:")
    val dir = new java.io.File(wh, name)
    if (dir.isDirectory) {
      java.nio.file.Files.walk(dir.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    }
  }

  private def q30: Q = (spark, dir) => {
    val (liT, orT) = bucketedTables.getOrElseUpdate((spark, dir), {
      val tag = java.lang.Integer.toUnsignedString(dir.hashCode, 16)
      val li = s"graft_li_bucketed_$tag"
      val or = s"graft_or_bucketed_$tag"
      resetManagedTable(spark, li)
      resetManagedTable(spark, or)
      t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(li)
      t(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(or)
      (li, or)
    })
    spark.table(liT)
      .join(spark.table(orT), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast(DoubleType).as("revenue"))
  }

  /** Explicit GROUPING SETS (q29): the general form rollup (q11) and
    * cube (q15) are sugar for — three hand-picked aggregation levels
    * plus grouping_id to disambiguate real NULLs from subtotal rows,
    * through the SQL surface (the one catalog entry exercising
    * spark.sql end-to-end on the oracle gate).
    *
    * Scale: the GROUPING SETS clause runs over the PRE-AGGREGATED
    * (keys, n, s) base, not the raw corpus — Catalyst's Expand
    * multiplies its input by the number of grouping sets BEFORE the
    * partial agg, so expanding the 6-row base instead of the corpus
    * turns a 3x-the-data Expand into a constant-size one while the
    * answer is unchanged (decimal sums are associative, counts sum;
    * grouping_id sees the same two key columns). The driver bench
    * showed the corpus-Expand form inflating 0.75s→10.9s under a long
    * session's heap pressure — the Expand tripled the partial-agg
    * working set; this shape is also the one a 100 TB rollup needs.
    * q11 demonstrates the same re-aggregation trade hand-rolled; q29
    * keeps GROUPING SETS + grouping_id on the oracle gate. */
  private def q29: Q = (spark, dir) => {
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).as("s"))
      .createOrReplaceTempView("lineitem_q29_base")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        | grouping_id(l_returnflag, l_linestatus) AS gid,
        | SUM(n) AS n_items,
        | CAST(SUM(s) AS DOUBLE) AS sum_qty
        |FROM lineitem_q29_base
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), ())""".stripMargin)
  }

  /** Ordered event-sequence funnel (q28): per user, the earliest
    * signup, the earliest view strictly AFTER that signup, and the
    * earliest purchase strictly after that view — the product-analytics
    * "did the user progress, and when" query, where each stage's
    * predicate depends on the previous stage's RESULT (not expressible
    * as independent min()s). Three stage-filtered aggregations chained
    * by joins; left joins keep drop-offs with null later stages.
    *
    * Scale: each stage is a filtered map-side-combined aggregate on
    * user_id; the joins are all user-keyed equi-joins sharing one
    * clustering. No windows, no per-user event sorting — at 100 TB the
    * per-stage filter prunes before any shuffle. */
  private def q28: Q = (spark, dir) => {
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"), epochUs(col("ts")).as("us"))
    val su = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("us")).as("s_ts"))
    val vi = ev.filter(col("event_type") === "view")
      .join(su, "user_id").filter(col("us") > col("s_ts"))
      .groupBy(col("user_id")).agg(min(col("us")).as("v_ts"))
    val pu = ev.filter(col("event_type") === "purchase")
      .join(vi, "user_id").filter(col("us") > col("v_ts"))
      .groupBy(col("user_id")).agg(min(col("us")).as("p_ts"))
    su.join(vi, Seq("user_id"), "left").join(pu, Seq("user_id"), "left")
      .select(col("user_id"), col("s_ts"), col("v_ts"), col("p_ts"),
        (lit(1) + when(col("v_ts").isNotNull, 1).otherwise(0) +
          when(col("p_ts").isNotNull, 1).otherwise(0)).as("stage"))
  }

  /** Exact grouped quantiles (q26): per return flag, the SQL-standard
    * discrete percentiles (smallest value whose cume_dist ≥ p) plus the
    * continuous median of integer quantities. Integer inputs make the
    * continuous interpolation exact in binary floating point
    * ((a+b)·0.5 on integers ≤ 2^52 has no rounding), so the doubles
    * hash-match across engines.
    *
    * Scale: exact percentiles sort WITHIN each group — one shuffle on
    * the group key, per-group sort in the aggregate buffer. For a
    * 100 TB ungrouped quantile the KLL sketch (k1) is the scale path;
    * this is the exact grouped form for cardinality-bounded groups. */
  private def q26: Q = (spark, dir) =>
    t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast(LongType).as("qty"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY qty)").as("p25_qty"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY qty)").as("p50_qty"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY qty)").as("p75_qty"),
        expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY qty)").as("median_qty"))

  /** Keyless point-in-interval join (q27): each error event opens a
    * 2-minute incident window; count the OTHER events (any user) that
    * land inside it. With no equi-key at all, the naive plan is a
    * broadcast-nested-loop over |incidents|×|events| — the bin becomes
    * the manufactured equi-key instead (RangeJoin.pointInIntervals):
    * both sides shuffle on their time bin and only same-neighborhood
    * rows ever meet. Incidents with an empty window drop out (inner
    * semantics, mirrored by the oracle). */
  private def q27: Q = (spark, dir) => {
    val ev = t(spark, dir, "events")
      .select(col("event_id"), col("user_id"), epochUs(col("ts")).as("us"))
    val win = 120L * 1000 * 1000 // 2 minutes in µs
    val inc = t(spark, dir, "events").filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"), epochUs(col("ts")).as("s"),
        (epochUs(col("ts")) + win).as("e"))
    graft.operators.RangeJoin.pointInIntervals(inc, ev, "s", "e", "us", win)
      .filter(col("event_id") =!= col("incident_id"))
      .groupBy(col("incident_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** TPC-H Q17-style small-order revenue: lineitems whose quantity is
    * below 20% of their part's average. The correlated scalar-aggregate
    * is a WINDOW over the part key — one shuffle, ONE lineitem scan —
    * instead of the textbook agg-then-self-join (two scans, q23's
    * trap). The 0.2·avg comparison is cross-multiplied to integers
    * (5·qty·cnt < Σqty), so no engine-specific decimal division ever
    * happens and the boundary rows match exactly. */
  private def q25: Q = (spark, dir) => {
    val w = Window.partitionBy(col("l_partkey"))
    t(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity").cast(LongType).as("qty"),
        col("l_extendedprice"))
      .withColumn("sum_qty", sum(col("qty")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(lit(5) * col("qty") * col("cnt") < col("sum_qty"))
      .agg(count(lit(1)).as("n_small"),
        dsum2(col("l_extendedprice")).as("small_revenue"))
  }

  /** Event-time RANGE window (q24): per-customer trailing-90-day order
    * value — the moving-aggregate shape rows-frames can't express
    * (irregular event spacing; peers at the same timestamp are included
    * by RANGE semantics, so no tie-break is even needed). Ordered by
    * epoch seconds: a numeric RANGE frame, identical in both engines. */
  private def q24: Q = (spark, dir) => {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("order_s"))
      .rangeBetween(-90L * 86400, 0)
    t(spark, dir, "orders").filter(col("o_custkey") < 500)
      .select(col("o_custkey"), col("o_orderkey"),
        epochS(col("o_orderdate")).as("order_s"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("p"))
      .withColumn("win_revenue", sum(col("p")).over(w).cast(DoubleType))
      .select(col("o_custkey"), col("o_orderkey"), col("order_s"),
        col("win_revenue"))
  }

  /** TPC-H Q15-style revenue leader: per-supplier quarterly revenue,
    * keep the supplier(s) at the maximum (the scalar-subquery argmax
    * shape). The per-supplier aggregate is PERSISTED and passed over
    * twice (1-row max, then equality filter) — without it Catalyst
    * plans two full lineitem scans, the classic Q15 double-scan trap
    * (plan-guarded). The max broadcasts back; decimal equality is
    * exact, so ties surface instead of being broken arbitrarily. */
  private def q23: Q = (spark, dir) => {
    // CachePool bounds the pinned copies to one across bench reps.
    val rev = CachePool.persistLatest("q23.rev",
      t(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast(TimestampType))
        .filter(col("l_shipdate") < lit("1997-04-01 00:00:00").cast(TimestampType))
        .groupBy(col("l_suppkey"))
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount"))).as("rev")))
    val maxRev = rev.agg(max(col("rev")).as("maxrev"))
    rev.crossJoin(broadcast(maxRev))
      .filter(col("rev") === col("maxrev"))
      .join(broadcast(t(spark, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev").cast(DoubleType).as("total_revenue"))
  }

  /** TPC-H Q1-style pricing summary: partial+final hash agg, no shuffle of
    * raw rows beyond the 6-group key. */
  private def q1: Q = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum2(col("l_quantity")).as("sum_qty"),
        dsum2(col("l_extendedprice")).as("sum_base_price"),
        sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast(DoubleType).as("sum_disc_price"),
        sum(charge(col("l_extendedprice"), col("l_discount"), col("l_tax")))
          .cast(DoubleType).as("sum_charge"),
        count(lit(1)).as("count_order"))
  }

  /** Filter + project + agg on a small dim table. */
  private def q2: Q = (spark, dir) => {
    val p = t(spark, dir, "part")
    p.filter(col("p_size") < 30)
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_parts"),
        dsum2(col("p_retailprice")).as("sum_retail"),
        min(col("p_size")).as("min_size"),
        max(col("p_size")).as("max_size"))
  }

  /** TPC-H Q3-style: 3-way join (customer broadcast), agg, top-10 with a
    * total tie-break order so LIMIT is deterministic. */
  private def q3: Q = (spark, dir) => {
    val c = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast(TimestampType))
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-01-01 00:00:00").cast(TimestampType))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast(DoubleType).as("revenue"))
      .select(col("l_orderkey"), epochS(col("o_orderdate")).as("o_orderdate_s"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q4-style: left-semi join (EXISTS) then count by priority. */
  private def q4: Q = (spark, dir) => {
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampType))
      .filter(col("o_orderdate") < lit("1997-01-01 00:00:00").cast(TimestampType))
    val lateLi = t(spark, dir, "lineitem")
    o.join(lateLi, o("o_orderkey") === lateLi("l_orderkey") &&
        lateLi("l_shipdate") > o("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** TPC-H Q5-style: multi-way join with broadcast dims, revenue by nation. */
  private def q5: Q = (spark, dir) => {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    val li = t(spark, dir, "lineitem")
    val s = t(spark, dir, "supplier")
    val n = t(spark, dir, "nation")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast(DoubleType).as("revenue"))
  }

  /** TPC-H Q6-style: fully pushed-down filter + single exact sum. */
  private def q6: Q = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
    li.filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast(TimestampType))
      .filter(col("l_shipdate") < lit("1998-01-01 00:00:00").cast(TimestampType))
      .filter(col("l_discount").between(0.02, 0.09))
      .filter(col("l_quantity") < 24)
      .agg(
        sum((col("l_extendedprice").cast(DecimalType(18, 2)) *
          col("l_discount").cast(DecimalType(18, 2))).cast(DecimalType(18, 4)))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  /** Ranking window: top-5 line items per return flag, total tie-break.
    * Via TopK.perKey — local sort + streaming per-partition prune, so
    * the global window sees ≤ partitions×keys×5 rows instead of every
    * row shuffling onto 3 reducers (the explicit select keeps column
    * pruning at the scan despite the typed prune stage). */
  private def q7: Q = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    graft.operators.TopK.perKey(li, Seq("l_returnflag"),
        Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")),
        k = 5)
      .select(col("l_returnflag"), col("rank").as("rn"), col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice"))
  }

  /** Join + exact distinct count + raw-double min/max (no fp arithmetic). */
  private def q8: Q = (spark, dir) => {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    c.join(o, col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("c_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"))
  }

  /** Union + distinct (reference self-union test, LoghubRelationSuite:163). */
  private def q9: Q = (spark, dir) => {
    val c = t(spark, dir, "customer").select(col("c_custkey").as("custkey"))
    val o = t(spark, dir, "orders").select(col("o_custkey").as("custkey"))
    c.union(o).distinct()
  }

  /** Anti join: customers with no orders in 2001. */
  private def q10: Q = (spark, dir) => {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("2001-01-01 00:00:00").cast(TimestampType))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
  }

  /** Rollup over (returnflag, linestatus) with exact sums — derived
    * from the finest-grain base aggregate instead of `rollup()`:
    * Catalyst's Expand multiplies every input row by the number of
    * grouping sets BEFORE partial aggregation; re-aggregating the
    * 6-row base is the same answer (decimal sums are associative,
    * counts are longs) for one pass over the data. */
  private def q11: Q = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
    val base = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).as("s"))
      .cache()
    rollupLevels(base, Seq("l_returnflag", "l_linestatus"),
      Seq(Seq("l_returnflag", "l_linestatus"), Seq("l_returnflag"), Seq()))
  }

  /** Re-aggregate a (keys, n, s) base to the given grouping sets,
    * null-padding dropped keys; output (keys..., n_rows, sum_qty). */
  private def rollupLevels(base: DataFrame, keys: Seq[String],
      sets: Seq[Seq[String]]): DataFrame =
    sets.map { set =>
      val grouped =
        if (set.isEmpty) base.agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
        else base.groupBy(set.map(col): _*)
          .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
      grouped.select(
        keys.map(k => (if (set.contains(k)) col(k)
          else lit(null).cast("string").as(k))) ++
        Seq(col("n").as("n_rows"),
          col("s").cast(DoubleType).as("sum_qty")): _*)
    }.reduce(_.unionByName(_))

  /** Event-time tumbling window over the stream stand-in table (reference
    * watermark+window test, LoghubMicroBatchSourceSuite.scala:381-424).
    * Surfaced as epoch seconds of the hour bucket. */
  private def q12: Q = (spark, dir) => {
    // ts arrives as TIMESTAMP_NTZ (µs parquet); window() needs a real
    // timestamp — microsecond truncation cannot move an hour bucket.
    val ev = t(spark, dir, "events")
      .withColumn("ts_t", col("ts").cast(TimestampType))
    ev.groupBy(window(col("ts_t"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum6(col("value")).as("sum_value"))
      .select(epochS(col("window.start")).as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Self-join (reference stream-stream self-join semantics,
    * LoghubMicroBatchSourceSuite.scala:426-459): view→purchase conversion
    * within 1 hour, per user. */
  private def q13: Q = (spark, dir) => {
    val ev = t(spark, dir, "events")
    // µs-truncated epoch longs: exact integer interval arithmetic, at the
    // same precision DuckDB's epoch_us reads the µs parquet column with. Bucketed
    // interval join (RangeJoin) keeps hot users from exploding into
    // per-lifetime cross products.
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), epochUs(col("ts")).as("v_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), epochUs(col("ts")).as("p_ts"))
    graft.operators.RangeJoin.intervalJoin(v, p, "user_id", "p_user",
        "v_ts", "p_ts", lo = 0L, hi = 3600L * 1000 * 1000)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_conversions"))
  }

  /** JSON extraction from the props payload — the default-schema
    * `__value__` JSON pattern of the reference (SURVEY.md §1.2 /
    * LoghubSourceRDD.scala:154-176): schema-on-read via JSON path. */
  private def q14: Q = (spark, dir) => {
    val ev = t(spark, dir, "events")
    ev.select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
  }

  /** Cube over (returnflag, linestatus) — all 4 grouping combinations,
    * derived from the same one-pass base aggregate as q11. */
  private def q15: Q = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
    val base = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).as("s"))
      .cache()
    rollupLevels(base, Seq("l_returnflag", "l_linestatus"),
      Seq(Seq("l_returnflag", "l_linestatus"), Seq("l_returnflag"),
        Seq("l_linestatus"), Seq()))
  }

  /** Set difference: customer keys that never placed a high-priority
    * order (EXCEPT semantics = distinct). */
  private def q16: Q = (spark, dir) => {
    val o = t(spark, dir, "orders")
    val all = o.select(col("o_custkey").as("custkey"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("custkey"))
    all.except(urgent)
  }

  /** Sessionization: gap-based sessions per user (30-minute inactivity
    * gap) via lag + running sum of session-break flags — the batch
    * formulation of session windows; the streaming formulation
    * (flatMapGroupsWithState) is covered by StatefulStreamingSpec with
    * this query as its cross-check. Times at µs precision (DuckDB reads
    * the µs column). */
  private def q17: Q = (spark, dir) => {
    val ev = t(spark, dir, "events")
      .select(col("user_id"), epochUs(col("ts")).as("ts_us"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    val gapUs = 30L * 60 * 1000 * 1000
    val withBreaks = ev
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_break",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("is_break")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withBreaks.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("session_start"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"),
        sum(col("duration_us")).as("total_session_us"))
  }

  /** As-of join: each purchase picks up the latest view at-or-before its
    * timestamp, per user (graft.operators.AsOfJoin — single
    * shuffle+sort, no range-join blowup). Right side is pre-aggregated
    * to one row per (user, ts) so the carried row is deterministic.
    * DuckDB oracle uses its native ASOF JOIN (same inclusive-<=
    * semantics). */
  private def q18: Q = (spark, dir) => {
    val ev = t(spark, dir, "events")
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), epochUs(col("ts")).as("v_ts"))
      .agg(max(col("value")).as("v_value"))
      .select(col("user_id"), col("v_ts").as("ats"), col("v_ts"), col("v_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), epochUs(col("ts")).as("ats"),
        epochUs(col("ts")).as("p_ts"))
    graft.operators.AsOfJoin.asOfInner(purchases, views, "user_id", "ats",
        Seq("v_ts", "v_value"))
      .select(col("user_id"), col("event_id"), col("p_ts"), col("v_ts"),
        col("v_value"))
  }

  /** Set intersection: customers active in both 1996 and 1997
    * (INTERSECT = distinct). */
  private def q19: Q = (spark, dir) => {
    val o = t(spark, dir, "orders")
    def active(y: String, y1: String) =
      o.filter(col("o_orderdate") >= lit(s"$y-01-01 00:00:00").cast(TimestampType))
        .filter(col("o_orderdate") < lit(s"$y1-01-01 00:00:00").cast(TimestampType))
        .select(col("o_custkey").as("custkey"))
    active("1996", "1997").intersect(active("1997", "1998"))
  }

  /** Analytic-window suite over one sorted pass: lag/lead, dense_rank,
    * ntile, cume_dist per customer's order history (all exact: integer
    * ranks and a single int/int division for cume_dist). Restricted to
    * a deterministic total order. */
  private def q20: Q = (spark, dir) => {
    val o = t(spark, dir, "orders")
    // ordering by epoch seconds ≡ ordering by o_orderdate (monotone)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("order_s"), col("o_orderkey"))
    o.filter(col("o_custkey") < 200)
      .select(col("o_custkey"), col("o_orderkey"),
        epochS(col("o_orderdate")).as("order_s"))
      .withColumn("prev_s", lag(col("order_s"), 1).over(w))
      .withColumn("next_s", lead(col("order_s"), 1).over(w))
      .withColumn("dr", dense_rank().over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("cd", cume_dist().over(w))
  }

  /** Pivot: per-user event counts spread into one column per event
    * type — Spark's relational pivot re-expressed as conditional
    * aggregation so the oracle is engine-neutral ANSI. */
  private def q21: Q = (spark, dir) => {
    val ev = t(spark, dir, "events")
    val types = Seq("view", "click", "purchase")
    ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_total"),
        types.map(tp => sum(when(col("event_type") === tp, 1L).otherwise(0L))
          .as(s"n_$tp")): _*)
  }

  /** Full TPC-H Q5 join chain through region: every dimension broadcast,
    * the fact table shuffles only on its aggregation key. Completes
    * fixture coverage (region was the one unexercised table). */
  private def q22: Q = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val s = t(spark, dir, "supplier")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .cast(DoubleType).as("revenue"),
        countDistinct(col("n_name")).as("n_nations"))
  }

  def oracles: Map[String, String] = Map(
    // q35: the oracle IS the maintenance identity — it computes the
    // FULL-table rollup (no base/delta anywhere), so a hash match
    // proves merged partial states equal a fresh recompute; HLL
    // replays via k3's register chain
    "q35_incremental_rollup" ->
      s"""WITH st AS (SELECT event_type, COUNT(*) AS n_events,
         |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
         |    MIN(CAST(epoch_us(ts) // 1000000 AS BIGINT)) AS min_t,
         |    MAX(CAST(epoch_us(ts) // 1000000 AS BIGINT)) AS max_t
         |  FROM events GROUP BY 1),
         |hll AS (${SketchQueries.k3OracleSql})
         |SELECT st.event_type, st.n_events, st.sum_value, st.min_t,
         |  st.max_t, hll.approx_users
         |FROM st JOIN hll USING (event_type)""".stripMargin,
    "q36_scd2_history" ->
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(epoch_us(ts) // 1000000 AS BIGINT) AS t, event_id
        |  FROM events),
        |m AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id
        |    ORDER BY t, event_id) AS prev FROM e),
        |s AS (SELECT user_id, event_type, t, event_id FROM m
        |      WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type, t AS valid_from,
        |  COALESCE(lead(t) OVER (PARTITION BY user_id
        |    ORDER BY t, event_id), -1) AS valid_to,
        |  event_id AS open_event_id
        |FROM s""".stripMargin,
    // q41: the four fixed-point iterations unrolled as CTE layers —
    // same integer contrib/damp arithmetic (SUM widens to HUGEINT,
    // hence the BIGINT casts; // == DIV on the non-negative operands)
    "q41_graph_rank" -> {
      def layer(k: Int): String =
        s"""r$k AS (SELECT n.v, CAST(150000 + (850000 *
           |    COALESCE(x.m, 0)) // 1000000 AS BIGINT) AS r
           |  FROM n LEFT JOIN (
           |    SELECT ed.dst AS v, SUM(r${k - 1}.r // deg.d) AS m
           |    FROM ed JOIN r${k - 1} ON ed.src = r${k - 1}.v
           |      JOIN deg ON deg.src = ed.src
           |    GROUP BY 1) x ON x.v = n.v)""".stripMargin
      s"""WITH e0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |ed AS (SELECT c AS src, 10000000 + s AS dst FROM e0
         |  UNION ALL SELECT 10000000 + s AS src, c AS dst FROM e0),
         |deg AS (SELECT src, count(*) AS d FROM ed GROUP BY 1),
         |n AS (SELECT DISTINCT src AS v FROM ed),
         |r0 AS (SELECT v, CAST(1000000 AS BIGINT) AS r FROM n),
         |${layer(1)},
         |${layer(2)},
         |${layer(3)},
         |${layer(4)}
         |SELECT r4.v - 10000000 AS s_suppkey, r4.r AS rank_fp,
         |  deg.d AS n_neighbors
         |FROM r4 JOIN deg ON deg.src = r4.v
         |WHERE r4.v >= 10000000""".stripMargin
    },
    // q40: the resample replayed — same (us, event_id)-max selection
    // for the per-hour representative (a pick, so the DOUBLE passes
    // through bit-exactly), generate_series spine per user, and
    // last_value IGNORE NULLS under the identical row frame
    "q40_gapfill_ffill" ->
      """WITH ev AS (SELECT user_id, event_id, value,
        |    CAST(epoch_us(ts) AS BIGINT) AS us,
        |    CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hr
        |  FROM events),
        |ph AS (SELECT user_id, hr, count(*) AS n_obs FROM ev GROUP BY 1, 2),
        |pick AS (SELECT user_id, hr, value AS v_last FROM (
        |    SELECT user_id, hr, value, row_number() OVER (
        |      PARTITION BY user_id, hr ORDER BY us DESC, event_id DESC) AS rn
        |    FROM ev) x WHERE rn = 1),
        |b AS (SELECT user_id, min(hr) AS h0, max(hr) AS h1
        |  FROM ev GROUP BY 1),
        |spine AS (SELECT user_id, unnest(generate_series(h0, h1)) AS hr
        |  FROM b),
        |j AS (SELECT s.user_id, s.hr,
        |    COALESCE(ph.n_obs, 0) AS n_obs, pick.v_last
        |  FROM spine s
        |  LEFT JOIN ph ON ph.user_id = s.user_id AND ph.hr = s.hr
        |  LEFT JOIN pick ON pick.user_id = s.user_id AND pick.hr = s.hr)
        |SELECT user_id, hr * 3600 AS hour_start,
        |  CAST(n_obs AS BIGINT) AS n_obs, v_last,
        |  last_value(v_last IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS v_ffill
        |FROM j""".stripMargin,
    // q39: the z-layout replayed in pure integer SQL — same min/max
    // normalization (// == DIV on the non-negative operands), the
    // 16-bit Morton interleave unrolled as 32 disjoint shift-and-or
    // terms, bucket = top 8 z-bits, manifest = count + per-dim min/max
    "q39_zorder_layout" -> {
      val inter = (0 until 16).map { i =>
        s"((((px >> $i) & 1) << ${2 * i}) | (((sy >> $i) & 1) << ${2 * i + 1}))"
      }.mkString(" | ")
      s"""WITH st AS (SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
         |    min(l_suppkey) AS smin, max(l_suppkey) AS smax FROM lineitem),
         |g AS (SELECT l_partkey, l_suppkey,
         |    (l_partkey - st.pmin) * 65535 // greatest(st.pmax - st.pmin, 1) AS px,
         |    (l_suppkey - st.smin) * 65535 // greatest(st.smax - st.smin, 1) AS sy
         |  FROM lineitem, st),
         |z AS (SELECT l_partkey, l_suppkey,
         |    CAST(($inter) >> 24 AS INTEGER) AS bucket FROM g)
         |SELECT bucket, count(*) AS n_rows,
         |  min(l_partkey) AS p_min, max(l_partkey) AS p_max,
         |  min(l_suppkey) AS s_min, max(l_suppkey) AS s_max
         |FROM z GROUP BY bucket""".stripMargin
    },
    "q38_cohort_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |    CAST(epoch_us(ts) // 1000000 // 604800 AS BIGINT) AS wk
        |  FROM events),
        |co AS (SELECT user_id, min(wk) AS cwk FROM uw GROUP BY 1),
        |sz AS (SELECT cwk, count(*) AS cohort_users FROM co GROUP BY 1),
        |cells AS (SELECT co.cwk, uw.wk - co.cwk AS week_offset,
        |    count(*) AS n_active
        |  FROM uw JOIN co USING (user_id) GROUP BY 1, 2)
        |SELECT cells.cwk AS cohort_week, week_offset, n_active,
        |  cohort_users,
        |  CAST(n_active AS DOUBLE) / cohort_users AS retention
        |FROM cells JOIN sz USING (cwk)""".stripMargin,
    "q34_latest_state" ->
      """SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS last_ts,
        | event_id AS last_event_id, event_type AS last_type,
        | value AS last_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) x
        |WHERE rn = 1""".stripMargin,
    "q33_anomalous_hours" ->
      """WITH hourly AS (SELECT event_type,
        |    epoch_us(ts) // 1000000 // 3600 * 3600 AS hour_start,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |stats AS (SELECT event_type, SUM(n) AS s, SUM(n*n) AS ss,
        |    COUNT(*) AS h
        |  FROM hourly GROUP BY 1)
        |SELECT event_type, CAST(hour_start AS BIGINT) AS hour_start,
        |  CAST(n AS BIGINT) AS n,
        |  (n*h - s)*(n*h - s) > 4*(h*ss - s*s) AS is_anomaly
        |FROM hourly JOIN stats USING (event_type)""".stripMargin,
    "q32_dpp_join" ->
      """SELECT event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        | COUNT(DISTINCT user_id) AS n_users
        |FROM events WHERE day(CAST(ts AS DATE)) % 7 = 3
        |GROUP BY event_type""".stripMargin,
    "q31_salted_join" ->
      """SELECT s_nationkey, COUNT(*) AS n_items,
        | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey""".stripMargin,
    "q30_bucketed_revenue" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q29_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        | grouping(l_returnflag, l_linestatus) AS gid,
        | COUNT(*) AS n_items,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), ())""".stripMargin,
    "q28_funnel" ->
      """WITH ev AS (SELECT user_id, event_type,
        |    CAST(epoch_us(ts) AS BIGINT) AS us FROM events),
        |su AS (SELECT user_id, MIN(us) AS s_ts FROM ev
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |vi AS (SELECT ev.user_id, MIN(us) AS v_ts FROM ev JOIN su USING (user_id)
        |  WHERE event_type = 'view' AND us > s_ts GROUP BY ev.user_id),
        |pu AS (SELECT ev.user_id, MIN(us) AS p_ts FROM ev JOIN vi USING (user_id)
        |  WHERE event_type = 'purchase' AND us > v_ts GROUP BY ev.user_id)
        |SELECT su.user_id, s_ts, v_ts, p_ts,
        |  1 + CASE WHEN v_ts IS NOT NULL THEN 1 ELSE 0 END
        |    + CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END AS stage
        |FROM su LEFT JOIN vi USING (user_id) LEFT JOIN pu USING (user_id)""".stripMargin,
    // Rank-CTE formulation instead of percentile_disc/percentile_cont
    // WITHIN GROUP: the native percentile functions changed interpolation
    // semantics across DuckDB releases (r7 driver red on a newer DuckDB
    // while 1.0.0 matched Spark exactly). percentile_disc(p) == the value
    // at row_number ceil(p*n) in ascending order; ceil(k*n/4) is exact
    // integer math ((k*n+3)//4), and the continuous median is the mean of
    // the two middle ranks — constructs proven portable by green queries
    // (row_number/COUNT OVER: q25/t21; `//`: m1-m3; MAX(CASE): t21).
    // The rank-picked values are CAST to DOUBLE because Spark's
    // percentile_disc over a LongType column yields DOUBLE and the
    // comparison hashes typed values — r8's red row was dtype-only
    // (13 vs 13.0), every value numerically identical.
    "q26_percentiles" ->
      """WITH v AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY CAST(l_quantity AS BIGINT)) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag, COUNT(*) AS n_items,
        | CAST(MAX(CASE WHEN rn = (n + 3) // 4 THEN qty END) AS DOUBLE) AS p25_qty,
        | CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN qty END) AS DOUBLE) AS p50_qty,
        | CAST(MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN qty END) AS DOUBLE) AS p75_qty,
        | 0.5e0 * (MAX(CASE WHEN rn = (n + 1) // 2 THEN qty END)
        |        + MAX(CASE WHEN rn = n // 2 + 1 THEN qty END)) AS median_qty
        |FROM v GROUP BY l_returnflag""".stripMargin,
    "q27_interval_join" ->
      """WITH ev AS (SELECT event_id, user_id,
        |    CAST(epoch_us(ts) AS BIGINT) AS us FROM events),
        |inc AS (SELECT event_id AS incident_id, us AS s, us + 120000000 AS e
        |  FROM ev JOIN events USING (event_id) WHERE event_type = 'error')
        |SELECT incident_id, COUNT(*) AS n_events,
        | COUNT(DISTINCT user_id) AS n_users
        |FROM inc JOIN ev ON ev.us >= inc.s AND ev.us < inc.e
        |  AND ev.event_id <> inc.incident_id
        |GROUP BY incident_id""".stripMargin,
    "q22_region_revenue" ->
      """SELECT r_name,
        | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | COUNT(DISTINCT n_name) AS n_nations
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_parts_by_brand" ->
      """SELECT p_brand, COUNT(*) AS n_parts,
        | CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_retail,
        | MIN(p_size) AS min_size, MAX(p_size) AS max_size
        |FROM part WHERE p_size < 30 GROUP BY p_brand""".stripMargin,
    "q3_top_orders" ->
      """SELECT l_orderkey,
        | CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_s,
        | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,
    "q25_small_order_revenue" ->
      """WITH x AS (SELECT l_partkey,
        |    CAST(l_quantity AS BIGINT) AS qty, l_extendedprice,
        |    SUM(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_partkey) AS sum_qty,
        |    COUNT(*) OVER (PARTITION BY l_partkey) AS cnt
        |  FROM lineitem)
        |SELECT COUNT(*) AS n_small,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
        |FROM x WHERE 5 * qty * cnt < sum_qty""".stripMargin,
    "q24_moving_revenue" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(epoch(o_orderdate) AS BIGINT) AS order_s,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |   PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
        |   RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   AS win_revenue
        |FROM orders WHERE o_custkey < 500""".stripMargin,
    "q23_revenue_leader" ->
      """WITH rev AS (SELECT l_suppkey,
        |  SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |    AS DECIMAL(18,4))) AS rev
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |   AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        | GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev = (SELECT MAX(rev) FROM rev)""".stripMargin,
    "q5_nation_revenue" ->
      """SELECT n_name,
        | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT
        | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.09
        |  AND l_quantity < 24""".stripMargin,
    "q7_rank_window" ->
      """SELECT l_returnflag, rn, l_orderkey, l_linenumber, l_extendedprice
        |FROM (SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |        ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |      FROM lineitem) x
        |WHERE rn <= 5""".stripMargin,
    "q8_segment_stats" ->
      """SELECT c_mktsegment,
        | COUNT(DISTINCT c_custkey) AS n_customers,
        | COUNT(*) AS n_orders,
        | MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q9_union_distinct" ->
      """SELECT DISTINCT custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer
        |  UNION ALL SELECT o_custkey AS custkey FROM orders) u""".stripMargin,
    "q10_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')""".stripMargin,
    "q11_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q15_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "q16_except" ->
      """SELECT o_custkey AS custkey FROM orders
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders
        |WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    "q17_sessionize" ->
      """WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),
        |b AS (SELECT user_id, ts_us,
        |        CASE WHEN lag(ts_us) OVER w IS NULL
        |               OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
        |             ELSE 0 END AS is_break
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
        |s AS (SELECT user_id, ts_us,
        |        SUM(is_break) OVER (PARTITION BY user_id ORDER BY ts_us
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |      FROM b),
        |g AS (SELECT user_id, session_id, COUNT(*) AS n_events,
        |        MAX(ts_us) - MIN(ts_us) AS duration_us
        |      FROM s GROUP BY user_id, session_id)
        |SELECT user_id, COUNT(*) AS n_sessions,
        |  CAST(MAX(n_events) AS BIGINT) AS max_session_events,
        |  CAST(SUM(duration_us) AS BIGINT) AS total_session_us
        |FROM g GROUP BY user_id""".stripMargin,
    "q12_events_hourly" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
        | event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q13_attribution_join" ->
      """SELECT v.user_id, COUNT(*) AS n_conversions
        |FROM (SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view') v
        |JOIN (SELECT user_id AS p_user, ts AS p_ts FROM events
        |      WHERE event_type = 'purchase') p
        |  ON v.user_id = p.p_user AND p.p_ts > v.v_ts
        |  AND p.p_ts <= v.v_ts + INTERVAL 1 HOUR
        |GROUP BY v.user_id""".stripMargin,
    "q19_intersect" ->
      """SELECT o_custkey AS custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'""".stripMargin,
    "q20_window_suite" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(epoch(o_orderdate) AS BIGINT) AS order_s,
        | lag(CAST(epoch(o_orderdate) AS BIGINT)) OVER w AS prev_s,
        | lead(CAST(epoch(o_orderdate) AS BIGINT)) OVER w AS next_s,
        | CAST(dense_rank() OVER w AS INT) AS dr,
        | CAST(ntile(4) OVER w AS INT) AS quartile,
        | cume_dist() OVER w AS cd
        |FROM orders WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q21_pivot" ->
      """SELECT user_id, COUNT(*) AS n_total,
        | CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        | CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        | CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
        |FROM events GROUP BY user_id""".stripMargin,
    "q18_asof_join" ->
      """WITH v AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS v_ts,
        |             MAX(value) AS v_value
        |           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |p AS (SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS p_ts
        |      FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.event_id, p.p_ts, v.v_ts, v.v_value
        |FROM p ASOF JOIN v ON p.user_id = v.user_id AND v.v_ts <= p.p_ts""".stripMargin,
    "q14_json_extract" ->
      """SELECT event_type,
        | CAST(SUM(k) AS BIGINT) AS sum_k, COUNT(k) AS n_k,
        | MIN(k) AS min_k, MAX(k) AS max_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |      FROM events) x
        |GROUP BY event_type""".stripMargin
  )
}
