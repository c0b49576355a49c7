package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Exact distributed global rank / ntile — no single-partition sort.
  *
  * `row_number() OVER (ORDER BY k)` and `ntile(n) OVER (ORDER BY k)`
  * with no PARTITION BY funnel the whole input through ONE reducer: at
  * bench scale the input is a per-doc stat table and the sort is free,
  * but at 100 TB a per-doc table is 10^9–10^10 rows and a
  * single-partition sort does not degrade — it dies. This helper gives
  * bit-identical ranks/ntiles with a three-step range-bucket plan (the
  * t15 distributed-enumerate idiom, generalized to arbitrary keys):
  *
  *   1. range-repartition on the sort key (Spark's sampled
  *      RangePartitioner). Bin boundaries only affect LOAD BALANCE,
  *      never rank values: every row's bin is a monotone function of
  *      its full sort key, so bin order concatenated with within-bin
  *      order is always the total order — whatever boundaries the
  *      sample picks.
  *   2. per-bin `row_number` — parallel windows, each sorting ~1/P of
  *      the input.
  *   3. per-bin counts (a P-row aggregate off the checkpointed frame)
  *      → prefix-sum folded on the DRIVER (O(P), bounded by cluster
  *      size) → offsets handed back as a dense array literal indexed
  *      by bin (O(1) per row). global rank = offset + local rank.
  *
  * `ntile` then derives from (rank, N) by the SQL-standard fill rule —
  * the first N mod n tiles get one extra row — evaluated with integer
  * `div`/`%` only, so it is bit-identical to `ntile()` in both Spark
  * and DuckDB. Callers must pass a TOTAL order (include a unique
  * tiebreaker such as doc_id); ties across a bin boundary would
  * otherwise make within-bin numbering ambiguous.
  */
object GlobalRank {

  private val Bin = "__gr_bin"
  private val LocalRank = "__gr_r"
  private val BinCount = "__gr_n"

  /** (ranked frame with `rankCol`, total row count). The checkpointed
    * binned frame feeds both, so the input subtree is scanned once.
    */
  private def rankAndTotal(
      df: DataFrame, rankCol: String, sort: Seq[Column]): (DataFrame, Long) = {
    val bins = math.max(df.sparkSession.sessionState.conf.numShufflePartitions, 1)
    // localCheckpoint pins ONE binning for both consumers (ranks and
    // counts). Without it each branch plans its own range exchange, and
    // because row order after an upstream shuffle is nondeterministic,
    // the two RangePartitioners can SAMPLE DIFFERENT BOUNDARIES — the
    // offsets then belong to a different binning than the ranks
    // (observed: 4395/5000 wrong ranks at sf0.1 before the pin). The
    // materialized frame is the caller's stat table (a few columns per
    // row), the same cost class as d9/s13's iterative localCheckpoints.
    val binned = df
      .repartitionByRange(bins, sort: _*)
      .withColumn(Bin, spark_partition_id())
      .localCheckpoint()
    val w = Window.partitionBy(col(Bin)).orderBy(sort: _*)
    val ranked = binned.withColumn(LocalRank, row_number().over(w).cast(LongType))
    // Prefix offsets: the per-bin count table is <=P rows and `binned`
    // is already materialized by the checkpoint, so fold it on the
    // DRIVER (probe-set-sized collect, the t15 count-table class) and
    // hand the offsets back as a LITERAL array lookup — versus the
    // previous P-row window + broadcast-join form this removes two
    // exchanges, a global WindowExec and a join from every consumer's plan
    // (measured r15 at sf0.1: t36 1.76 -> 1.25s, t33 1.95 -> 1.60s,
    // t32 1.46 -> 1.30s, t37 0.66 -> 0.62s; all four consumers'
    // oracle rows unchanged). P is the partition count — bounded by
    // the cluster, not the data — so the collect stays O(P) at 100 TB.
    val cnts = binned.groupBy(col(Bin)).agg(count(lit(1)).as(BinCount))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val total = cnts.map(_._2).sum
    // Encode the offsets as a DENSE ARRAY literal indexed by bin, not a
    // map: `element_at` on a map (GetMapValue) is a LINEAR SCAN of the
    // key array per row in both interpreted and codegen paths, so a map
    // lookup costs O(N*P) total — invisible at bench P (32) but P is
    // 10^4-10^5 on a 100 TB cluster. Bins are spark_partition_id()
    // values, a dense 0..P-1 ordinal, so a zero-filled array indexed by
    // Bin+1 (element_at on arrays is positional, O(1)) gives O(N) total.
    // Empty bins get the running prefix (no row carries their bin id,
    // so the value is never read — filled only to keep the array dense).
    val cntByBin = cnts.toMap
    val offsets = Array.ofDim[Long](bins)
    var acc = 0L
    var b = 0
    while (b < bins) {
      offsets(b) = acc
      acc += cntByBin.getOrElse(b, 0L)
      b += 1
    }
    val offExpr =
      if (total == 0L) lit(0L)
      else element_at(
        array(offsets.toIndexedSeq.map(lit(_)): _*), col(Bin) + lit(1))
    val out = ranked
      .withColumn(rankCol, offExpr + col(LocalRank))
      .drop(Bin, LocalRank)
    (out, total)
  }

  /** Adds `rankCol` = exact 1-based global row number under `sort`
    * (a Seq of Columns, each optionally `.asc`/`.desc`; must be a total
    * order). Plan shape: one range exchange of the input, one hash
    * exchange for the per-bin windows, one P-row aggregate folded on
    * the driver into an O(1)-per-row array-literal lookup — never an
    * `Exchange SinglePartition` of the input, never a per-row O(P) scan.
    */
  def withGlobalRank(df: DataFrame, rankCol: String, sort: Seq[Column]): DataFrame =
    rankAndTotal(df, rankCol, sort)._1

  /** Adds `tileCol` = exact `ntile(n)` (IntegerType, matching Spark's
    * builtin) over the global `sort` order, via [[withGlobalRank]] plus
    * the SQL-standard tile rule computed in integer `div`/`%`:
    * q = N div n, rem = N % n; ranks 1..rem*(q+1) fill the first rem
    * tiles at q+1 rows each, the rest fill at q rows each.
    */
  def withNtile(df: DataFrame, tileCol: String, n: Int, sort: Seq[Column]): DataFrame = {
    require(n >= 1, s"ntile buckets must be >= 1, got $n")
    val rankCol = "__gr_rank"
    val (ranked, total) = rankAndTotal(df, rankCol, sort)
    // total is a driver-side Long now — the tile rule folds to
    // constants at plan time (no 1-row stat join in any consumer)
    val q = total / n
    val rem = total % n
    ranked
      .withColumn(tileCol,
        expr(
          s"""CAST(CASE
             |  WHEN `$rankCol` <= ${rem * (q + 1)}L
             |  THEN 1 + (`$rankCol` - 1) div ${q + 1}L
             |  ELSE ${1 + rem}L
             |       + (`$rankCol` - ${rem * (q + 1)}L - 1)
             |         div ${math.max(q, 1L)}L
             |END AS INT)""".stripMargin).cast(IntegerType))
      .drop(rankCol)
  }
}
