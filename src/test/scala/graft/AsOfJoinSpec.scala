package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), // before any right row
    (2L, 50L, "d"),
    (3L, 7L, "e") // key with no right rows at all
  ).toDF("k", "t", "tag")

  private def right = Seq(
    (1L, 10L, 100.0), (1L, 15L, 150.0),
    (2L, 50L, 500.0), (2L, 60L, 600.0)
  ).toDF("k", "t", "v")

  test("asOfLeft: latest right at-or-before, ties inclusive, nulls kept") {
    val out = AsOfJoin.asOfLeft(left, right, "k", "t", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    assert(out === Set(
      (1L, 10L, "a", 100.0), // equal timestamp is visible (inclusive)
      (1L, 20L, "b", 150.0), // latest of the two earlier rows
      (1L, 5L, "c", null),   // before any right row
      (2L, 50L, "d", 500.0), // later right rows invisible
      (3L, 7L, "e", null)))  // key absent from right
  }

  test("asOfInner drops unmatched left rows") {
    val out = AsOfJoin.asOfInner(left, right, "k", "t", Seq("v"))
    assert(out.count() === 3)
    assert(out.filter(col("v").isNull).count() === 0)
  }

  test("null payload fields travel atomically with their right row") {
    // right row at t=20 has a null in column `a`: a left row at t=25
    // must see (null, "y") — the t=20 row whole — not "x" from t=10
    // spliced with "y" from t=20 (per-column fill would tear them)
    val r = Seq((1L, 10L, Some("x"), None: Option[String]),
      (1L, 20L, None: Option[String], Some("y")))
      .toDF("k", "t", "a", "b")
    val l = Seq((1L, 25L), (1L, 15L), (1L, 5L)).toDF("k", "t")
    val out = AsOfJoin.asOfLeft(l, r, "k", "t", Seq("a", "b"))
      .collect().map(x => (x.getLong(1), x.getString(2), x.getString(3))).toSet
    assert(out === Set(
      (25L, null, "y"), // the t=20 row, atomic
      (15L, "x", null), // the t=10 row, atomic
      (5L, null, null)))
    // inner keeps the matched-but-null-field row (no per-column marker)
    val inner = AsOfJoin.asOfInner(l, r, "k", "t", Seq("a", "b"))
      .collect().map(x => x.getLong(1)).toSet
    assert(inner === Set(25L, 15L))
  }

  test("matches the naive range-join formulation on events data") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts_us")).agg(max(col("value")).as("v_value"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    val fast = AsOfJoin.asOfInner(p, v, "user_id", "ts_us", Seq("v_value"))
      .select(col("user_id"), col("event_id"), col("v_value"))
    // naive: all earlier views per purchase, keep the latest
    val naive = p.as("p").join(v.as("v"),
        col("p.user_id") === col("v.user_id") && col("v.ts_us") <= col("p.ts_us"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("p.user_id"), col("p.event_id"))
          .orderBy(col("v.ts_us").desc)))
      .filter(col("rn") === 1)
      .select(col("p.user_id"), col("event_id"), col("v_value"))
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    assert(fast.count() > 0)
  }
}
