package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet table access + oracle-parity helpers.
  *
  * Every query in the catalog must hash-match a DuckDB oracle on the same
  * parquet files, so all floating-point aggregation goes through exact
  * decimal arithmetic (order-independent) and is only cast back to double
  * at the very end; timestamps are surfaced as epoch seconds (BIGINT) to
  * dodge timestamp precision/encoding differences between engines.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Exact, order-independent sum of a 2-decimal quantity, returned as
    * double: SUM(CAST(x AS DECIMAL(18,2))) :: DOUBLE. Deterministic across
    * engines because decimal addition is exact. */
  def dsum2(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** As dsum2 but keeping 6 fractional digits (for raw measure columns). */
  def dsum6(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast(DoubleType)

  /** price * (1 - discount) with lockstep decimal casts (see oracle SQL):
    * both factors to DECIMAL(18,2), product to DECIMAL(18,4) (lossless —
    * the exact product has scale 4). */
  def discPrice(price: Column, disc: Column): Column =
    (price.cast(DecimalType(18, 2)) *
      (lit(1).cast(DecimalType(18, 2)) - disc.cast(DecimalType(18, 2))))
      .cast(DecimalType(18, 4))

  /** discPrice * (1 + tax) → DECIMAL(18,6), lossless for TPC-H-ish ranges. */
  def charge(price: Column, disc: Column, tax: Column): Column =
    (discPrice(price, disc) *
      (lit(1).cast(DecimalType(18, 2)) + tax.cast(DecimalType(18, 2))))
      .cast(DecimalType(18, 6))

  /** Timestamp → epoch seconds as BIGINT (matches DuckDB
    * CAST(epoch(ts) AS BIGINT) for whole-second values). */
  def epochS(c: Column): Column = c.cast(TimestampType).cast(LongType)

  /** Timestamp → epoch microseconds as BIGINT (matches DuckDB
    * CAST(epoch_us(ts) AS BIGINT)). The session timezone is pinned to
    * UTC, so the NTZ→TZ cast is value-preserving. */
  def epochUs(c: Column): Column = unix_micros(c.cast(TimestampType))
}
