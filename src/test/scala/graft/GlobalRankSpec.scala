package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GlobalRank

/** GlobalRank must be bit-identical to the builtin global-window
  * row_number()/ntile() — the whole point is replacing the
  * single-partition sort with an equivalent distributed plan, so any
  * divergence is a correctness bug, not an approximation. The inputs
  * here go through an upstream hash shuffle first, because that is the
  * adversarial case: post-shuffle row order is nondeterministic, which
  * is exactly what broke the unpinned two-branch binning (two
  * RangePartitioners sampling different boundaries).
  */
class GlobalRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** n rows with a non-unique key (forces tiebreak use), shuffled
    * through a hash exchange so input order is adversarial. */
  private def messy(n: Int) = {
    val s = spark
    import s.implicits._
    (0 until n)
      .map(i => ((i * 2654435761L) % 97, s"id$i"))
      .toDF("k", "id")
      .repartition(7, col("id"))
  }

  test("withGlobalRank matches row_number over a global order (asc)") {
    val df = messy(5000)
    val got = GlobalRank
      .withGlobalRank(df, "r", Seq(col("k").asc, col("id").asc))
      .select(col("id"), col("r"))
    val want = df.withColumn("r",
        row_number().over(Window.orderBy(col("k").asc, col("id").asc))
          .cast("long"))
      .select(col("id"), col("r"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("withGlobalRank matches row_number under a desc key") {
    val df = messy(3000)
    val got = GlobalRank
      .withGlobalRank(df, "r", Seq(col("k").desc, col("id").asc))
      .select(col("id"), col("r"))
    val want = df.withColumn("r",
        row_number().over(Window.orderBy(col("k").desc, col("id").asc))
          .cast("long"))
      .select(col("id"), col("r"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("withNtile matches ntile for n in {2,3,4,7} including uneven fills") {
    // 5003 is prime: every n leaves a remainder, exercising the
    // first-rem-tiles-get-one-extra fill rule
    val df = messy(5003)
    for (n <- Seq(2, 3, 4, 7)) {
      val got = GlobalRank
        .withNtile(df, "t", n, Seq(col("k").asc, col("id").asc))
        .select(col("id"), col("t"))
      val want = df.withColumn("t",
          ntile(n).over(Window.orderBy(col("k").asc, col("id").asc)))
        .select(col("id"), col("t"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"ntile($n) diverged")
      assert(got.schema("t").dataType ===
        org.apache.spark.sql.types.IntegerType)
    }
  }

  test("withNtile with fewer rows than tiles gives tile == rank") {
    val df = messy(3)
    val got = GlobalRank
      .withNtile(df, "t", 8, Seq(col("k").asc, col("id").asc))
      .select(col("id"), col("t"))
    val want = df.withColumn("t",
        ntile(8).over(Window.orderBy(col("k").asc, col("id").asc)))
      .select(col("id"), col("t"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("empty input yields empty output with the added column") {
    val df = messy(100).filter(col("k") < -1)
    val r = GlobalRank.withGlobalRank(df, "r", Seq(col("k").asc, col("id").asc))
    assert(r.count() === 0L)
    assert(r.columns.contains("r"))
    val t = GlobalRank.withNtile(df, "t", 3, Seq(col("k").asc, col("id").asc))
    assert(t.count() === 0L)
  }

  test("rank values are a permutation of 1..N (offsets consistent with bins)") {
    // the regression this suite exists for: mismatched bin boundaries
    // between the rank branch and the count branch produce offsets from
    // a DIFFERENT binning — ranks then collide or skip
    val df = messy(4096)
    val ranks = GlobalRank
      .withGlobalRank(df, "r", Seq(col("k").asc, col("id").asc))
      .select("r").as[Long](spark.implicits.newLongEncoder)
      .collect().sorted
    assert(ranks.toSeq === (1L to 4096L))
  }

  test("plan has no single-partition sort of the input (corpus window is per-bin)") {
    val df = messy(2000)
    val ranked = GlobalRank.withGlobalRank(df, "r", Seq(col("k").asc, col("id").asc))
    val p = ranked.queryExecution.executedPlan.toString
    // the input-side row_number window must partition by the bin column
    assert(p.contains("row_number"), p)
    assert(
      """Window \[row_number.*__gr_bin""".r.findFirstIn(p).isDefined ||
        p.contains("windowspecdefinition(__gr_bin"), p)
    // the builtin global-ntile path must not reappear
    assert(!p.contains("ntile("), p)
  }

  test("offset lookup is O(1) per row: dense array literal, never a map scan") {
    // GetMapValue (element_at on a map) is a LINEAR scan of the key
    // array per row — O(N*P) total where P = numShufflePartitions,
    // which is 10^4-10^5 on a 100 TB cluster. The offsets must come
    // back as element_at on a dense ARRAY literal (positional, O(1)),
    // so total lookup work is O(N) regardless of cluster size.
    import org.apache.spark.sql.catalyst.expressions.{
      CreateArray, CreateMap, ElementAt, Expression, GetMapValue}
    val df = messy(2000)
    val ranked = GlobalRank.withGlobalRank(df, "r", Seq(col("k").asc, col("id").asc))
    val all: Seq[Expression] = ranked.queryExecution.analyzed
      .collect { case p => p.expressions }.flatten
      .flatMap(e => e.collect { case x => x })
    assert(!all.exists(e =>
        e.isInstanceOf[GetMapValue] || e.isInstanceOf[CreateMap]),
      "offsets regressed to a map literal (O(P)-per-row GetMapValue scan)")
    assert(all.exists {
        case e: ElementAt => e.left.isInstanceOf[CreateArray]
        case _ => false
      }, "expected element_at(<array literal>, bin+1) in the analyzed plan")
  }
}
