package graft.queries

import graft.Tables._
import graft.functions.Fnv64
import graft.functions.Sketches._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch queries: the two-level rollup pattern for 100 TB
  * pipelines — level 1 builds per-slice sketches (in production these
  * are persisted per day/partition), level 2 re-aggregates the sketch
  * COLUMN without touching raw data.
  *
  * Sketches are approximate ESTIMATORS but deterministic FUNCTIONS of
  * their input multiset: every hash is fixed (fnv64 → xxhash64 →
  * splitmix64), counters are integers, and the HLL harmonic sum is
  * accumulated exactly (see [[graft.functions.HllOps.estimate]]) — so
  * k2 and k3 replay value-for-value in DuckDB and get full equality
  * oracles. k1 keeps the rows-only check: its KLL quantile path is
  * sequence-order-dependent once compaction fires (which level keeps
  * which items depends on arrival order across partitions), so no
  * order-free SQL formulation exists; SketchesSpec pins its rank-error
  * and merge contracts instead. */
object SketchQueries {

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "k1_sketch_rollup" -> k1,
    "k2_freq_sketch" -> k2,
    "k3_hll_users" -> k3,
    "k4_heavy_hitters" -> k4,
    "k5_kll_quantiles" -> k5,
    "k6_kmv_overlap" -> k6,
    "k7_sketch_error" -> k7)

  /** Sketch accuracy report (k7): the estimator-vs-truth eval every
    * sketch deployment runs before trusting the estimate — per key,
    * the HLL distinct-count estimate next to the exact count and the
    * absolute error. Both sides are deterministic functions of the
    * input (the estimate via k3's exact register replay), so even the
    * ERROR column is oracle-checked value-for-value — the s14 eval
    * principle applied to sketches.
    *
    * Scale: at 100 TB the exact side is the expensive one (a
    * countDistinct shuffle); the point of the row is to certify the
    * cheap estimator against it on a sample so production can drop
    * the exact pass. */
  private def k7: Q = (spark, dir) => {
    import graft.functions.Sketches.{hll_build, hll_estimate}
    t(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(hll_estimate(hll_build(col("user_id"))).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .select(col("event_type"), col("approx_users"), col("exact_users"),
        abs(col("approx_users") - col("exact_users")).as("abs_err"))
  }

  /** Count-min frequency rollup (k2): per-source partial CMS sketches of
    * the token stream (level 1; persisted per partition in production),
    * counter-summed into one corpus sketch (level 2), then point-probed
    * for a fixed token set — heavy-hitter frequency estimation with no
    * exact token groupBy anywhere. Items are keyed by their fnv64
    * fingerprint (the shared 64-bit primitive): an 8-byte key instead of
    * a variable-width string halves the hashed bytes, and the whole
    * chain (fnv64 → xxhash64-of-long → splitmix64 row index) replays
    * exactly in the SQL oracle. Estimates never undercount; bounds
    * + the byte-exact merge contract are asserted in SketchesSpec. */
  private def k2: Q = (spark, dir) => {
    import graft.functions.{TextFunctions => TF}
    val toks = t(spark, dir, "documents")
      .select(col("source"), explode(TF.tokens(lower(col("text")))).as("tok"))
    toks.groupBy(col("source"))
      .agg(cms_build(Fnv64.fnv64(col("tok"))).as("sk"))
      .agg(cms_merge(col("sk")).as("sk"))
      .select(K2Probes.map { p =>
        cms_query(col("sk"), lit(Fnv64.hashBytes(p.getBytes("UTF-8"))))
          .as(s"est_$p")
      }: _*)
  }

  private val K2Probes = Seq("the", "data", "spark", "join", "zzz_absent")

  /** CMS-guided heavy hitters with exact verify (k4): the one-pass
    * frequent-item pattern at 100 TB — build ONE mergeable count-min
    * sketch over the token stream (a driver-held binary, like d11's
    * Bloom and the IVF centroids), broadcast it back as a scan-side
    * probe, and shuffle ONLY the rows whose estimated frequency clears
    * the threshold into the exact count. CMS never undercounts, so the
    * candidate set is a superset of the true heavy set and the exact
    * post-filter restores equality — which is exactly why the oracle
    * is plain `GROUP BY tok HAVING count >= T` with no sketch replay
    * needed: the operator is approximate in COST, exact in RESULT. */
  private def k4: Q = (spark, dir) => {
    import graft.functions.{TextFunctions => TF}
    val thr = 900L
    val toks = t(spark, dir, "documents")
      .select(explode(TF.tokens(lower(col("text")))).as("tok"))
    val sk = toks.agg(cms_build(Fnv64.fnv64(col("tok"))).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    toks.filter(cms_query(lit(sk), Fnv64.fnv64(col("tok"))) >= thr)
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= thr)
  }

  /** KMV corpus-overlap matrix (k6): per-source bottom-k sketches of
    * the 8-gram shingle space (built per doc-slice, set-union merged —
    * the two-level rollup), then every source pair's distinct / union /
    * Jaccard / intersection ESTIMATES from the sketch columns alone.
    * The cross-corpus contamination question ("how much of source A is
    * in source B") answered without ever joining shingle sets — at
    * 100 TB the per-source sketches are a few KB each and the pair
    * matrix is driver-sized. Bottom-k is a deterministic order-free
    * function of the input SET (like HLL registers / CMS counters), so
    * build, merge, and every estimator replay exactly in SQL: rank the
    * distinct hashes per source, keep r <= k, re-derive the estimates
    * with the same IEEE expressions. */
  private def k6: Q = (spark, dir) => {
    val k = 128
    val d = t(spark, dir, "documents")
    val sh = graft.operators.Dedup.docShingles(d, n = 8)
      .join(d.select(col("doc_id"), col("source")), "doc_id")
    val sk = sh
      .groupBy(col("source"), (col("doc_id") % 4).as("slice"))
      .agg(kmv_build(Fnv64.fnv64(col("shingle")), k).as("psk"))
      .groupBy(col("source"))
      .agg(kmv_merge(col("psk")).as("sk"))
    val a = sk.select(col("source").as("source_a"), col("sk").as("ska"))
    val b = sk.select(col("source").as("source_b"), col("sk").as("skb"))
    a.join(broadcast(b), col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        kmv_estimate(col("ska")).as("est_distinct_a"),
        kmv_jaccard(col("ska"), col("skb")).as("est_jaccard"),
        kmv_union_estimate(col("ska"), col("skb")).as("est_union"),
        kmv_intersect_estimate(col("ska"), col("skb")).as("est_intersect"))
  }

  /** Exact replay of k6: distinct shingles → fnv64 (recursive CTE) →
    * xxhash64-of-long → per-source DISTINCT hash ranks (bottom-k =
    * r <= 128, unsigned order — the CTE hashes are unsigned HUGEINTs);
    * pair combines re-rank the union of the two retained sets. The
    * estimators are the same IEEE doubles: exact count below k, else
    * (k-1) / (kth/2^64); Jaccard = matches / |union bottom-k|;
    * intersection = jaccard × union (same multiply order). */
  private def k6OracleSql: String = {
    val g = "18446744073709551616e0" // 2^64, exactly representable
    s"""WITH RECURSIVE
       |words AS (SELECT doc_id, source, regexp_split_to_array(lower(trim(text)), '\\s+') AS w FROM documents),
       |shr AS (SELECT doc_id, source,
       |          unnest(list_distinct(list_transform(range(1, len(w) - 6),
       |            i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7]))) AS s
       |        FROM words),
       |dsh AS (SELECT DISTINCT s FROM shr),
       |${OracleSql.fnv64Ctes(Seq("s"), "s", "dsh")},
       |spairs AS (SELECT DISTINCT shr.source, fp.fpu FROM shr JOIN fp ON fp.s = shr.s),
       |xx AS MATERIALIZED (${OracleSql.xxHashLongLayers("SELECT source, fpu FROM spairs")}),
       |dh AS (SELECT DISTINCT source, h1u FROM xx),
       |ret AS MATERIALIZED (
       |  SELECT source, h1u FROM (
       |    SELECT source, h1u, row_number() OVER (PARTITION BY source ORDER BY h1u) AS r
       |    FROM dh) WHERE r <= 128),
       |rstat AS (SELECT source, count(*) AS rcnt, max(h1u) AS rkth FROM ret GROUP BY 1),
       |srcs AS (SELECT DISTINCT source FROM documents),
       |prs AS (SELECT a.source AS sa, b.source AS sb
       |        FROM srcs a, srcs b WHERE a.source < b.source),
       |uh AS (SELECT DISTINCT p.sa, p.sb, r.h1u
       |       FROM prs p JOIN ret r ON r.source = p.sa OR r.source = p.sb),
       |uk AS MATERIALIZED (
       |  SELECT sa, sb, h1u FROM (
       |    SELECT sa, sb, h1u, row_number() OVER (PARTITION BY sa, sb ORDER BY h1u) AS r
       |    FROM uh) WHERE r <= 128),
       |pstat AS (
       |  SELECT uk.sa, uk.sb, count(*) AS cnt, max(uk.h1u) AS kth,
       |    SUM(CASE WHEN ra.h1u IS NOT NULL AND rb.h1u IS NOT NULL THEN 1 ELSE 0 END) AS m
       |  FROM uk
       |  LEFT JOIN ret ra ON ra.source = uk.sa AND ra.h1u = uk.h1u
       |  LEFT JOIN ret rb ON rb.source = uk.sb AND rb.h1u = uk.h1u
       |  GROUP BY 1, 2),
       |ests AS (
       |  SELECT sa, sb,
       |    CASE WHEN rs.rcnt < 128 THEN CAST(rs.rcnt AS DOUBLE)
       |         ELSE 127e0 / (CAST(rs.rkth AS DOUBLE) / $g) END AS est_distinct_a,
       |    CAST(m AS DOUBLE) / CAST(cnt AS DOUBLE) AS est_jaccard,
       |    CASE WHEN cnt < 128 THEN CAST(cnt AS DOUBLE)
       |         ELSE 127e0 / (CAST(kth AS DOUBLE) / $g) END AS est_union
       |  FROM pstat JOIN rstat rs ON rs.source = pstat.sa)
       |SELECT sa AS source_a, sb AS source_b, est_distinct_a, est_jaccard,
       |  est_union, est_jaccard * est_union AS est_intersect
       |FROM ests""".stripMargin
  }

  /** HLL distinct-user rollup (k3): per-(event_type, user-slice) HLL
    * registers (level 1), register-max merged per event_type (level 2),
    * then estimated — k1's cardinality half isolated so the full
    * pipeline is equality-oracled (registers, exact harmonic sum, and
    * the linear-counting branch all replay in SQL; the ln table is
    * generated from StrictMath so both engines read identical doubles). */
  private def k3: Q = (spark, dir) => {
    val ev = t(spark, dir, "events")
    ev.groupBy(col("event_type"), (col("user_id") % 16).as("slice"))
      .agg(hll_build(col("user_id")).as("sk"))
      .groupBy(col("event_type"))
      .agg(hll_estimate(hll_merge(col("sk"))).as("approx_users"))
  }

  /** KLL quantile rollup in the compaction-free regime (k5): the same
    * two-level build/merge pipeline as k1's quantile half — per-slice
    * kll_build partials, kll_merge across slices, kll_quantile probes —
    * but with sketch capacity (2^17) above the largest per-group
    * cardinality at both the oracle (sf0.01, ~2k/group) and bench
    * (sf0.1, ~20k/group) scales, so the compactor ladder never fires:
    * every item sits in level 0 at weight 1 and the quantile rank
    * arithmetic is exact. That makes the WHOLE kll_build → serialize →
    * shuffle → kll_merge → kll_quantile path a deterministic function
    * of the input multiset, replayable in SQL: quantile(q) over n
    * unit-weight items returns the sorted value at 1-based rank
    * min(n, max(1, floor(q*n))) (q*n in IEEE double both sides). k1
    * keeps the realistic 256-capacity config where compaction makes the
    * kept-item set arrival-order-dependent (rows-only + SketchesSpec
    * error bounds); k5 pins build/merge/quantile end-to-end, the same
    * isolate-the-deterministic-regime precedent as k3's HLL split. */
  private def k5: Q = (spark, dir) => {
    val cap = 1 << 17
    val ev = t(spark, dir, "events")
    ev.groupBy(col("event_type"), (col("user_id") % 16).as("slice"))
      .agg(kll_build(col("value").cast("double"), cap).as("sk"))
      .groupBy(col("event_type"))
      .agg(kll_merge(col("sk")).as("sk"))
      .select(col("event_type"),
        kll_quantile(col("sk"), 0.25).as("p25_value"),
        kll_quantile(col("sk"), 0.5).as("p50_value"),
        kll_quantile(col("sk"), 0.95).as("p95_value"))
  }

  /** Exact replay of k5: in the compaction-free regime the merged
    * sketch holds every (event_type, value) at weight 1, so
    * kll_quantile(q) is the value at 1-based rank
    * min(n, max(1, floor(q*n))) of the per-group ascending sort —
    * q*n computed double*double in both engines (the DOUBLE cast
    * matters: DuckDB would otherwise read 0.95 as DECIMAL and round
    * the 18.999... cases the other way). */
  private[queries] def k5OracleSql: String = {
    def pick(q: String, alias: String) =
      s"""max(CASE WHEN rn = least(n, greatest(1,
         |    CAST(floor(CAST($q AS DOUBLE) * CAST(n AS DOUBLE)) AS BIGINT)))
         |    THEN value END) AS $alias""".stripMargin
    s"""WITH v AS (
       |  SELECT event_type, value,
       |         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
       |         count(*) OVER (PARTITION BY event_type) AS n
       |  FROM events)
       |SELECT event_type,
       |  ${pick("0.25", "p25_value")},
       |  ${pick("0.5", "p50_value")},
       |  ${pick("0.95", "p95_value")}
       |FROM v GROUP BY event_type""".stripMargin
  }

  private def k1: Q = (spark, dir) => {
    val ev = t(spark, dir, "events")
    ev.groupBy(col("event_type"), (col("user_id") % 16).as("slice"))
      .agg(
        hll_build(col("user_id")).as("users_sk"),
        kll_build(col("value").cast("double")).as("value_sk"))
      .groupBy(col("event_type"))
      .agg(
        hll_estimate(hll_merge(col("users_sk"))).as("approx_users"),
        kll_quantile(kll_merge(col("value_sk")), 0.5).as("p50_value"),
        kll_quantile(kll_merge(col("value_sk")), 0.95).as("p95_value"))
  }

  /** Exact replay of k2: corpus tokens → fnv64 (recursive CTE) →
    * xxhash64-of-long (layered projections) → per-row splitmix64 index
    * → integer counters. The probe side is constant-folded with the
    * engine's own kernels (fnv64 + CmsOps.indexOf on literal strings),
    * so only the data-dependent counters run in SQL. A probe's estimate
    * is the min over the 4 rows of its counter cell (0 when no token
    * ever hit the cell). */
  private def k2OracleSql: String = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.LongType
    val cells = K2Probes.map { p =>
      val h = XxHash64Function.hash(
        Fnv64.hashBytes(p.getBytes("UTF-8")), LongType, 42L)
      val mins = (0 until graft.functions.CmsOps.Depth).map { d =>
        val idx = graft.functions.CmsOps.indexOf(h, d)
        s"COALESCE((SELECT c FROM cells WHERE d = $d AND idx = $idx), 0)"
      }
      s"CAST(least(${mins.mkString(", ")}) AS BIGINT) AS est_$p"
    }
    s"""WITH RECURSIVE toks AS (
       |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
       |  FROM documents),
       |dt AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
       |${OracleSql.fnv64Ctes(Seq("tok", "cnt"), "tok", "dt")},
       |xx AS MATERIALIZED (${
         OracleSql.xxHashLongLayers("SELECT tok, cnt, fpu FROM fp")}),
       |mixin AS (SELECT cnt, d, ${OracleSql.u64xor("h1u", "d")} AS mxin
       |          FROM xx CROSS JOIN range(0, 4) t(d)),
       |mx AS MATERIALIZED (${
         OracleSql.splitmixLayers("SELECT cnt, d, mxin FROM mixin")}),
       |cells AS (SELECT d, CAST(${OracleSql.u64shr("mxout", 1)} % 2048 AS BIGINT) AS idx,
       |            SUM(cnt) AS c
       |          FROM mx GROUP BY 1, 2)
       |SELECT ${cells.mkString(",\n  ")}""".stripMargin
  }

  /** Exact replay of k3: distinct (event_type, user) pairs hash through
    * xxhash64-of-long; register index = top 12 hash bits, rank =
    * leading zeros of the remaining bits (via bin() string length —
    * no float log anywhere) + 1; registers max-merge; the harmonic sum
    * is the exact integer Σ 2^(53-reg) in HUGEINT; the linear-counting
    * branch reads ln(4096/zeros) from a 4096-entry table of StrictMath
    * doubles (libm-portable by construction); ties-to-even rounding is
    * spelled out (math.rint). */
  private[queries] def k3OracleSql: String = {
    val lnRows = (1 to 4096).map { z =>
      s"($z, CAST('${StrictMath.log(4096.0 / z)}' AS DOUBLE))"
    }
    val alpha = "(0.7213e0 / (1.0e0 + 1.079e0 / 4096.0e0))"
    s"""WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
       |xx AS MATERIALIZED (${
         OracleSql.xxHashLongLayers(
           "SELECT event_type, CAST(user_id AS HUGEINT) AS fpu FROM du")}),
       |rk AS (SELECT event_type,
       |    CAST(${OracleSql.u64shr("h1u", 52)} AS BIGINT) AS idx,
       |    (h1u % 4503599627370496) * 4096 + 2048 AS rest
       |  FROM xx),
       |rnk AS (SELECT event_type, idx,
       |    least(CASE WHEN rest >= 9223372036854775808 THEN 0
       |          ELSE 64 - length(bin(CAST(rest AS BIGINT))) END + 1, 53) AS rkv
       |  FROM rk),
       |regs AS (SELECT event_type, idx, MAX(rkv) AS r FROM rnk GROUP BY 1, 2),
       |ets AS (SELECT DISTINCT event_type FROM events),
       |allr AS (SELECT ets.event_type, g.i AS idx, COALESCE(regs.r, 0) AS r
       |         FROM ets CROSS JOIN range(0, 4096) g(i)
       |         LEFT JOIN regs ON regs.event_type = ets.event_type AND regs.idx = g.i),
       |st AS (SELECT event_type,
       |         SUM(CAST(1::BIGINT << CAST(53 - r AS INTEGER) AS HUGEINT)) AS s,
       |         SUM(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS z
       |       FROM allr GROUP BY 1),
       |est0 AS (SELECT event_type, z,
       |    $alpha * 4096.0e0 * 4096.0e0 /
       |      (CAST(s AS DOUBLE) / 9007199254740992e0) AS raw
       |  FROM st),
       |lntab(lz, lnv) AS (VALUES ${lnRows.mkString(", ")}),
       |est1 AS (SELECT event_type,
       |    CASE WHEN raw <= 2.5e0 * 4096.0e0 AND est0.z > 0
       |         THEN 4096.0e0 * lntab.lnv ELSE raw END AS est
       |  FROM est0 LEFT JOIN lntab ON est0.z = lntab.lz)
       |SELECT event_type,
       |  CASE WHEN est = floor(est) + 0.5e0
       |       THEN CASE WHEN CAST(floor(est) AS BIGINT) % 2 = 0
       |                 THEN CAST(floor(est) AS BIGINT)
       |                 ELSE CAST(floor(est) AS BIGINT) + 1 END
       |       ELSE CAST(floor(est + 0.5e0) AS BIGINT) END AS approx_users
       |FROM est1""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "k7_sketch_error" ->
      s"""WITH apx AS (SELECT * FROM (${k3OracleSql}) t),
         |ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
         |       FROM events GROUP BY 1)
         |SELECT event_type, approx_users, exact_users,
         |  CAST(abs(approx_users - exact_users) AS BIGINT) AS abs_err
         |FROM apx JOIN ex USING (event_type)""".stripMargin,
    "k2_freq_sketch" -> k2OracleSql,
    "k3_hll_users" -> k3OracleSql,
    "k5_kll_quantiles" -> k5OracleSql,
    "k6_kmv_overlap" -> k6OracleSql,
    "k4_heavy_hitters" ->
      """WITH toks AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        |              FROM documents)
        |SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
        |HAVING COUNT(*) >= 900""".stripMargin)
}
