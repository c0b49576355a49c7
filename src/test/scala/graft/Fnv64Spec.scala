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
