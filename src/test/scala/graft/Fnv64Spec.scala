package graft

import graft.functions.Fnv64
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Fnv64Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def refHash(s: String): Long =
    Fnv64.hashBytes(s.getBytes("UTF-8"))

  test("matches published FNV-1a 64 vectors") {
    // offset basis for "" and the classic test vectors
    assert(refHash("") === 0xcbf29ce484222325L)
    assert(refHash("a") === 0xaf63dc4c8601ec8cL)
    assert(refHash("foobar") === 0x85944171f73967e8L)
  }

  test("codegen path matches the kernel function") {
    import spark.implicits._
    val inputs = Seq("", "a", "hello world", "κόσμε utf-8", "x" * 10000)
    val df = inputs.toDF("s").select(col("s"), Fnv64.fnv64(col("s")).as("h"))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach { s => assert(got(s) === refHash(s), s"input '$s'") }
  }

  test("interpreted path (no codegen) matches too") {
    import spark.implicits._
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val df = Seq("interpreted", "paths agree").toDF("s")
        .select(col("s"), Fnv64.fnv64(col("s")).as("h"))
      df.collect().foreach(r => assert(r.getLong(1) === refHash(r.getString(0))))
    }
  }

  test("agrees with the private dedup kernel hash") {
    val probe = Seq("shingle one", "", "über", "doc-42")
    probe.foreach { s =>
      assert(Fnv64.hashBytes(s.getBytes("UTF-8")) === refHash(s))
    }
    // whole-stage codegen span covers the projection ("*(n)" marker)
    val df = spark.range(10).select(Fnv64.fnv64(col("id").cast("string")).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("splitmix64 expression matches the dedup kernel, wraps instead of throwing") {
    import graft.functions.SplitMix64Expr
    import spark.implicits._
    // probe values include the overflow-triggering region near MaxValue
    // that made ANSI-mode column arithmetic unusable for the mixer
    val probes = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue,
      0x9e3779b97f4a7c15L, -6917529027641081857L)
    val offs = Seq(0L, 1L, 7L, Long.MaxValue)
    val df = probes.toDF("h")
      .select((col("h") +: offs.map(o =>
        SplitMix64Expr.splitmix64(col("h"), lit(o)).as(s"m$o"))): _*)
    val rows = df.collect().map(r => r.getLong(0) ->
      offs.indices.map(i => r.getLong(i + 1))).toMap
    probes.foreach { h =>
      offs.zipWithIndex.foreach { case (o, i) =>
        assert(rows(h)(i) === SplitMix64Expr.mix(h + o), s"h=$h off=$o")
      }
    }
    // interpreted path agrees with codegen
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val r = Seq(Long.MaxValue).toDF("h")
        .select(SplitMix64Expr.splitmix64(col("h"), lit(Long.MaxValue)))
        .head().getLong(0)
      assert(r === SplitMix64Expr.mix(Long.MaxValue + Long.MaxValue))
    }
    // SQL surface + null propagation
    graft.functions.GraftFunctions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT splitmix64(42), splitmix64(42, 3), splitmix64(CAST(NULL AS BIGINT))")
      .head()
    assert(viaSql.getLong(0) === SplitMix64Expr.mix(42L))
    assert(viaSql.getLong(1) === SplitMix64Expr.mix(45L))
    assert(viaSql.isNullAt(2))
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
