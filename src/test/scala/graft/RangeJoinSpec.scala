package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("boundary semantics: exclusive low, inclusive high, bucket edges") {
    val l = Seq((1L, 100L), (1L, 200L)).toDF("k", "lts")
    val r = Seq(
      (1L, 100L), // == lts: excluded (lo exclusive)
      (1L, 101L), // just inside
      (1L, 150L), // inside, crosses a bucket boundary from 100
      (1L, 200L), // == lts+hi for lts=100: included; == lts for 200: excluded
      (1L, 301L), // outside hi for both
      (2L, 150L)  // wrong key
    ).toDF("rk", "rts")
    val out = RangeJoin.intervalJoin(l, r, "k", "rk", "lts", "rts", 0L, 100L)
      .select(col("lts"), col("rts")).as[(Long, Long)].collect().toSet
    // (100,100) excluded (lo exclusive), (100,200) included (hi inclusive),
    // (200,301) excluded (301 > 300), key 2 never matches
    assert(out === Set((100L, 101L), (100L, 150L), (100L, 200L)))
  }

  test("no duplicate pairs across candidate buckets") {
    val l = (0L until 50L).map(i => (1L, i * 7)).toDF("k", "lts")
    val r = (0L until 50L).map(i => (1L, i * 11)).toDF("rk", "rts")
    val fast = RangeJoin.intervalJoin(l, r, "k", "rk", "lts", "rts", 0L, 40L)
      .select("lts", "rts")
    val naive = l.join(r, col("k") === col("rk") &&
        col("rts") > col("lts") && col("rts") <= col("lts") + 40)
      .select("lts", "rts")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    assert(fast.count() === fast.distinct().count() ||
      naive.count() === fast.count()) // multiset equality already checked
  }

  test("pointInIntervals: keyless variable-width windows match the naive join") {
    // interval widths 1..3 bins wide; [start, end) semantics at both edges
    val ivs = Seq((1L, 100L, 150L), (2L, 100L, 300L), (3L, 95L, 96L),
      (4L, 280L, 281L)).toDF("iid", "s", "e")
    val pts = Seq((10L, 99L), (11L, 100L), (12L, 149L), (13L, 150L),
      (14L, 280L), (15L, 299L), (16L, 300L), (17L, 95L)).toDF("pid", "ts")
    val fast = RangeJoin.pointInIntervals(ivs, pts, "s", "e", "ts", 100L)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    val naive = ivs.join(pts, col("ts") >= col("s") && col("ts") < col("e"))
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    assert(fast === naive)
    // spot-check edges: start inclusive, end exclusive, 1-wide interval
    assert(fast.contains((1L, 11L)) && !fast.contains((1L, 13L)))
    assert(fast.contains((3L, 17L)) && fast.contains((4L, 14L)))
    assert(fast.contains((2L, 15L)) && !fast.contains((2L, 16L)))
    // no duplicate pairs from the interval's multi-bin explode
    val all = RangeJoin.pointInIntervals(ivs, pts, "s", "e", "ts", 100L)
      .select("iid", "pid")
    assert(all.count() === all.distinct().count())
  }

  test("matches the naive range join on events data") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("v_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), unix_micros(col("ts").cast("timestamp")).as("p_ts"))
    val fast = RangeJoin.intervalJoin(v, p, "user_id", "p_user",
        "v_ts", "p_ts", 0L, 3600L * 1000 * 1000)
      .select("user_id", "v_ts", "p_ts")
    val naive = v.join(p, col("user_id") === col("p_user") &&
        col("p_ts") > col("v_ts") &&
        col("p_ts") <= col("v_ts") + lit(3600L * 1000 * 1000))
      .select("user_id", "v_ts", "p_ts")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    assert(fast.count() > 0)
  }
}
