package graft

import graft.operators.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("equals the plain window formulation on lineitem") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    val order = Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val fast = TopK.perKey(li, Seq("l_returnflag"), order, 5)
    val w = Window.partitionBy(col("l_returnflag")).orderBy(order: _*)
    val plain = li.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
    assert(fast.exceptAll(plain).isEmpty && plain.exceptAll(fast).isEmpty)
    assert(fast.count() === 15)
  }

  test("handles skewed partitions, k larger than some groups") {
    val df = (1 to 1000).map(i => (i % 3, i)).toDF("k", "v")
      .union(Seq((7, 42)).toDF("k", "v")) // group smaller than k
      .repartition(8)
    val out = TopK.perKey(df, Seq("k"), Seq(col("v").desc), 10).cache()
    assert(out.filter(col("k") === 7).count() === 1)
    assert(out.filter(col("k") === 0).count() === 10)
    // exact values: top-10 of v ≡ 0 mod 3 under 1000
    val top0 = out.filter(col("k") === 0).select("v").as[Int].collect().sorted
    assert(top0.toSeq === (972 to 999).filter(_ % 3 == 0).sorted)
  }
}
