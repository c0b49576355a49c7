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
  * and sorted once per key; the right payload travels as ONE struct
  * column carried forward with `last(_, ignoreNulls)` over the running
  * window — packing keeps all payload fields atomic (they always come
  * from the same right row, even when individual fields are null). One
  * shuffle on the key, one sort of |L|+|R| — the same plan shape Spark
  * uses for any window, so AQE/skew handling apply as-is.
  *
  * Tie semantics: right rows sort BEFORE left rows at equal ts, so an
  * equal-timestamp right row is visible (inclusive `<=`, matching
  * DuckDB's ASOF JOIN). The right side must be unique per (key, ts) —
  * pre-aggregate otherwise; with duplicates the carried row would
  * depend on sort stability.
  *
  * Inner semantics: left rows with no prior right row are dropped
  * (`asOfInner` — "no prior row" is the carried struct still being
  * null, which is unambiguous even when payload FIELDS are null);
  * `asOfLeft` keeps them with null payload.
  */
object AsOfJoin {

  /** Union + carry: returns left rows with a `__payload__` struct column
    * holding the as-of right row's payload (null = no prior right row). */
  private def carried(left: DataFrame, right: DataFrame, key: String,
      ts: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"payload ${payload.filter(leftCols.contains)} clash with left columns")
    val l = left.withColumn("__side__", lit(1))
    val r = right.select(col(key), col(ts), lit(0).as("__side__"),
      struct(payload.map(col): _*).as("__payload__"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side__"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__payload__", last(col("__payload__"), ignoreNulls = true).over(w))
      .filter(col("__side__") === 1)
  }

  /** @param left     left rows; all columns preserved
    * @param right    right rows: key, ts, and payload columns only
    * @param key      equi-join key column name (both sides)
    * @param ts       event-time column name (both sides, orderable)
    * @param payload  right columns to carry (must not clash with left) */
  def asOfLeft(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String]): DataFrame =
    carried(left, right, key, ts, payload)
      .select(left.columns.toSeq.map(col) ++
        payload.map(p => col(s"__payload__.$p").as(p)): _*)

  /** Inner as-of join: drops left rows with no matching right row (the
    * carried struct is null — no per-column marker needed, so payload
    * columns MAY be null on the right). */
  def asOfInner(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String]): DataFrame =
    carried(left, right, key, ts, payload)
      .filter(col("__payload__").isNotNull)
      .select(left.columns.toSeq.map(col) ++
        payload.map(p => col(s"__payload__.$p").as(p)): _*)
}
