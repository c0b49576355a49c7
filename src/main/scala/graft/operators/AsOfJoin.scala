package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `right.ts <= left.ts` (inclusive), per key — the time-series /
  * feature-lookup operator Spark has no built-in for.
  *
  * NOT implemented as a range join (`l.k = r.k AND r.ts <= l.ts` +
  * pick-latest), which explodes to every earlier right row per left row
  * before pruning. Instead both sides are unioned with a side marker
  * and sorted once per key; `last(_, ignoreNulls)` over the running
  * window carries the most recent right payload forward into each left
  * row. One shuffle on the key, one sort of |L|+|R| — the same plan
  * shape Spark uses for any window, so AQE/skew handling apply as-is.
  *
  * Tie semantics: right rows sort BEFORE left rows at equal ts, so an
  * equal-timestamp right row is visible (inclusive `<=`, matching
  * DuckDB's ASOF JOIN). The right side must be unique per (key, ts) —
  * pre-aggregate otherwise; with duplicates the carried row would
  * depend on sort stability.
  *
  * Inner semantics: left rows with no prior right row are dropped
  * (`asOfInner`); `asOfLeft` keeps them with null payload.
  */
object AsOfJoin {

  /** @param left     left rows; all columns preserved
    * @param right    right rows: key, ts, and payload columns only
    * @param key      equi-join key column name (both sides)
    * @param ts       event-time column name (both sides, orderable)
    * @param payload  right columns to carry (must not clash with left) */
  def asOfLeft(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"payload ${payload.filter(leftCols.contains)} clash with left columns")
    val l = left.withColumn("__side__", lit(1))
    val r = right.select((Seq(key, ts).map(col) :+ lit(0).as("__side__")) ++
      payload.map(col): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side__"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side__") === 1)
      .select(leftCols.map(col) ++ payload.map(col): _*)
  }

  /** Inner as-of join: drops left rows with no matching right row.
    * `nullMarker` must be a payload column that is never null on the
    * right (its null-ness after the fill means "no prior right row"). */
  def asOfInner(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String], nullMarker: String): DataFrame = {
    require(payload.contains(nullMarker), s"$nullMarker not in payload")
    asOfLeft(left, right, key, ts, payload)
      .filter(col(nullMarker).isNotNull)
  }
}
