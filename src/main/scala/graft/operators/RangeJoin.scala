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
    // exact floor division (pmod handles negatives; the numerator is
    // then exactly divisible, so the double division is exact)
    def bucketOf(c: Column): Column =
      ((c - pmod(c, lit(w))) / lit(w)).cast("long")
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
}
