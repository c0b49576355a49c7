package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed interval join: pairs (l, r) with the same key and
  * `r.ts ∈ (l.ts + lo, l.ts + hi]`.
  *
  * The naive formulation — equi-join on the key, then range-filter —
  * materializes the full per-key cross product before filtering: a key
  * with n left and m right rows costs n×m regardless of how few pairs
  * fall inside the interval. Bucketing both sides by
  * `W = hi - lo`-wide time buckets joins on (key, bucket) instead:
  * a right row's bucket can only be the bucket of `l.ts + lo` or the
  * one after it, so each left row is duplicated into exactly 2
  * candidate buckets and the join touches only rows within ~2W of each
  * other. The exact range predicate then prunes candidates. Each true
  * pair is found exactly once (the right row lives in one bucket).
  *
  * At 100 TB this bounds the blowup of hot keys (a user with 10⁵
  * events joins per time-neighborhood, not per lifetime) and keeps the
  * shuffle an equi-shuffle on (key, bucket) — AQE-splittable. */
object RangeJoin {

  /** @param left      rows with `leftKey` and `leftTs` (long, any unit)
    * @param right     rows with `rightKey` and `rightTs` (same unit)
    * @param lo        exclusive lower bound offset (rightTs > leftTs + lo)
    * @param hi        inclusive upper bound offset (rightTs <= leftTs + hi);
    *                  hi > lo required; W = hi - lo is the bucket width */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      lo: Long, hi: Long): DataFrame = {
    require(hi > lo, s"empty interval ($lo, $hi]")
    val w = hi - lo
    // exact floor division, all in LONG arithmetic: pmod makes the
    // numerator an exact multiple (floor semantics for negatives), and
    // integral `div` avoids the double-rounding a `/` would introduce
    // for |ts| > 2^53
    def bucketOf(c: Column): Column =
      call_function("div", c - pmod(c, lit(w)), lit(w))
    val l = left.withColumn("__bucket__",
      explode(array(bucketOf(col(leftTs) + lit(lo)),
        bucketOf(col(leftTs) + lit(lo)) + 1)))
    val r = right.withColumn("__bucket__", bucketOf(col(rightTs)))
    l.join(r, l("__bucket__") === r("__bucket__") &&
        col(leftKey) === col(rightKey) &&
        col(rightTs) > col(leftTs) + lit(lo) &&
        col(rightTs) <= col(leftTs) + lit(hi))
      .drop("__bucket__")
  }

  /** Keyless variable-width point-in-interval join: pairs (interval,
    * point) with `point.ts ∈ [interval.start, interval.end)`.
    *
    * With no shared key, the naive plan is a broadcast-nested-loop (or
    * worse, a cartesian) over |intervals|×|points|. Binning manufactures
    * the equi-key: an interval is exploded into every `binWidth`-wide
    * bin it overlaps (⌈len/W⌉+1 of them — choose W near the typical
    * interval length so that's ~2), a point lives in exactly one bin,
    * and the join becomes an equi-join on the bin followed by the exact
    * range predicate. Each true pair is produced exactly once because
    * the point's single bin is among the interval's bins exactly once.
    *
    * At 100 TB both sides shuffle once on the bin — AQE-splittable,
    * skew visible per-bin — and only same-neighborhood rows ever meet.
    * Interval columns must be longs in the same unit as `tsCol`;
    * `end > start` required (empty intervals produce nothing). */
  def pointInIntervals(intervals: DataFrame, points: DataFrame,
      startCol: String, endCol: String, tsCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth $binWidth must be positive")
    def binOf(c: Column): Column =
      call_function("div", c - pmod(c, lit(binWidth)), lit(binWidth))
    // an empty/inverted interval must produce nothing — dropped here so
    // sequence() never sees a descending (end-1 < start) bin range
    val l = intervals.filter(col(endCol) > col(startCol)).withColumn("__bin__",
      explode(sequence(binOf(col(startCol)), binOf(col(endCol) - 1))))
    val r = points.withColumn("__bin__", binOf(col(tsCol)))
    l.join(r, l("__bin__") === r("__bin__") &&
        col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin__")
  }
}
