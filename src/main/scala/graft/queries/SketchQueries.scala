package graft.queries

import graft.Tables._
import graft.functions.Sketches._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch query: the two-level rollup pattern for 100 TB
  * pipelines — level 1 builds per-slice sketches (in production these
  * are persisted per day/partition), level 2 re-aggregates the sketch
  * COLUMN without touching raw data. Approximate by design ⇒ rows-only
  * driver check; accuracy bounds are asserted in SketchesSpec. */
object SketchQueries {

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "k1_sketch_rollup" -> k1,
    "k2_freq_sketch" -> k2)

  /** Count-min frequency rollup (k2): per-source partial CMS sketches of
    * the token stream (level 1; persisted per partition in production),
    * counter-summed into one corpus sketch (level 2), then point-probed
    * for a fixed token set — heavy-hitter frequency estimation with no
    * exact token groupBy anywhere. Estimates never undercount; bounds
    * + the byte-exact merge contract are asserted in SketchesSpec. */
  private def k2: Q = (spark, dir) => {
    import graft.functions.{TextFunctions => TF}
    val toks = t(spark, dir, "documents")
      .select(col("source"), explode(TF.tokens(lower(col("text")))).as("tok"))
    val probes = Seq("the", "data", "spark", "join", "zzz_absent")
    toks.groupBy(col("source")).agg(cms_build(col("tok")).as("sk"))
      .agg(cms_merge(col("sk")).as("sk"))
      .select(probes.map(p => cms_query(col("sk"), lit(p)).as(s"est_$p")): _*)
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

  def oracles: Map[String, String] = Map.empty // approximate: rows-only
}
