package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Key salting for skewed equi-joins — the manual mitigation for the
  * one shape AQE cannot fix: a single hot key hashes every one of its
  * rows to ONE reducer, and splitting that reducer's input (what AQE
  * skew-join does for sort-merge partitions) still leaves each split
  * joining the same dim rows, which works — but AQE only triggers on
  * sort-merge joins after a shuffle materializes, can't help a
  * shuffled-hash build side that OOMs before stats exist, and does
  * nothing for the downstream aggregation keyed on the same column.
  * Salting fixes the layout at plan time instead.
  *
  * Mechanics: every big-side row gets a deterministic salt in
  * [0, factor) derived from the row's full content hash (no RNG — the
  * same dataset salts identically on every run and every layout, the
  * t25 reproducibility contract); the dim side is replicated `factor`
  * times, one copy per salt value, so each (key, salt) pair exists on
  * exactly one replica and the joined result is IDENTICAL to the
  * unsalted join — which is exactly what the q31 oracle checks: the
  * plain SQL join, no salt anywhere. Rows of the hot key spread over
  * `factor` reducers.
  *
  * Cost model: dim shuffle volume × factor (the big side's volume is
  * unchanged). Worth it when key-histogram skew exceeds ~factor×
  * median; size `factor` ≈ ceil(hot-key share / healthy-partition
  * share). Identical-content duplicate rows share a salt by
  * construction — skew made of literal row copies should go through
  * dedup (d1) first, not a join. */
object SkewJoin {

  /** Inner equi-join `big.bigKey == dim.dimKey`, big side salted over
    * `factor` buckets, dim side replicated `factor`×. Output columns:
    * big.* ++ dim.* (the shared salt column is internal). */
  def saltedInner(big: DataFrame, dim: DataFrame,
                  bigKey: String, dimKey: String, factor: Int): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(factor))
        .cast(IntegerType))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated,
        salted("__salt") === replicated("__salt") &&
          col(bigKey) === col(dimKey))
      .drop("__salt")
  }
}
