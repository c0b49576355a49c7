package graft

import graft.functions.RollingHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RollingHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def refHash(s: String): Long =
    RollingHash.hashBytes(s.getBytes("UTF-8"))

  test("codegen path matches the reference implementation") {
    import spark.implicits._
    val inputs = Seq("", "a", "hello world", "κόσμε utf-8", "x" * 10000)
    val df = inputs.toDF("s")
      .select(col("s"), RollingHash.rolling_hash(col("s")).as("h"))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach { s => assert(got(s) === refHash(s), s"input '$s'") }
  }

  test("interpreted path (no codegen) matches too") {
    import spark.implicits._
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val df = Seq("interpreted", "paths agree").toDF("s")
        .select(col("s"), RollingHash.rolling_hash(col("s")).as("h"))
      df.collect().foreach(r => assert(r.getLong(1) === refHash(r.getString(0))))
    }
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

  test("registered SQL function works and stays in codegen") {
    RollingHash.register(spark)
    val one = spark.sql("SELECT rolling_hash('abc') AS h").first().getLong(0)
    assert(one === refHash("abc"))
    // whole-stage codegen span covers the projection ("*(n)" marker)
    val df = spark.range(10).selectExpr("rolling_hash(CAST(id AS STRING)) AS h")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("values stay within the modulus and differ across inputs") {
    val hs = (0 until 1000).map(i => refHash(s"doc-$i"))
    assert(hs.forall(h => h >= 0 && h < RollingHash.Mod))
    assert(hs.distinct.size > 990) // no mass collisions
  }
}
