package graft

import graft.functions.{DotProduct, VectorFunctions => VF}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native [[DotProduct]] expression to the higher-order-function
  * formulation it replaced: same strict left-to-right fold, same null
  * semantics, on both the codegen and interpreted paths. */
class VectorFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("bit-identical to the HOF fold on deterministic pseudo-random vectors") {
    // xorshift-ish values with wildly mixed magnitudes so any fold-order
    // difference shows up in the low bits
    val rows = (0 until 200).map { i =>
      def v(seed: Int) = (0 until 64).map { j =>
        val h = (seed * 2654435761L + j * 40503L) & 0xffffffL
        (h.toDouble - 0x800000) / (1 << (j % 17))
      }
      (i.toLong, v(i), v(i + 7))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"), VF.dot(col("a"), col("b")).as("d"))
      .as[(Long, Double)].collect().toMap
    val want = df.select(col("id"), hofDot(col("a"), col("b")).as("d"))
      .as[(Long, Double)].collect().toMap
    assert(got.size === 200)
    rows.foreach { case (id, _, _) =>
      assert(java.lang.Double.doubleToRawLongBits(got(id)) ===
        java.lang.Double.doubleToRawLongBits(want(id)), s"id=$id")
    }
  }

  test("interpreted eval matches codegen") {
    val a = Array(1.5, -2.25, 3.0, 1e-300, 1e300)
    val b = Array(2.0, 4.0, -1.0, 1e300, 1e-300)
    val expr = DotProduct(
      Bridge.toExpression(lit(a)), Bridge.toExpression(lit(b)))
    val interpreted = expr.eval(null)
    val viaPlan = Seq(1).toDF("x")
      .select(VF.dot(lit(a), lit(b)).as("d")).as[Double].head()
    assert(java.lang.Double.doubleToRawLongBits(
      interpreted.asInstanceOf[Double]) ===
      java.lang.Double.doubleToRawLongBits(viaPlan))
    // left-to-right reference fold
    var acc = 0.0
    a.indices.foreach(i => acc = acc + a(i) * b(i))
    assert(acc === viaPlan)
  }

  test("null semantics: null input, null element, length mismatch") {
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      (2L, null, Seq[java.lang.Double](3.0, 4.0)),
      (3L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),
      (4L, Seq[java.lang.Double](1.0), Seq[java.lang.Double](3.0, 4.0))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), VF.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(got(1L) === 11.0)
    assert(got(2L) === null)
    assert(got(3L) === null)
    assert(got(4L) === null)
  }

  test("SQL surface: dot_product and cosine_sim registered") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c""".stripMargin)
      .head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 1.0)
  }

  test("float arrays widen exactly: dot(float, float) == dot over toDoubleVec") {
    val df = Seq((0.1f, 0.7f), (2.5f, -3.25f), (1e-30f, 1e30f))
      .toDF("x", "y")
      .select(array(col("x"), col("y"), col("x")).as("fa"),
        array(col("y"), col("x"), col("y")).as("fb"))
    val direct = df.select(VF.dot(col("fa"), col("fb")).as("d")).as[Double].collect()
    val widened = df.select(
      VF.dot(VF.toDoubleVec(col("fa")), VF.toDoubleVec(col("fb"))).as("d"))
      .as[Double].collect()
    direct.zip(widened).foreach { case (d, w) =>
      assert(java.lang.Double.doubleToRawLongBits(d) ===
        java.lang.Double.doubleToRawLongBits(w))
    }
  }

  test("integer arrays widen: SQL dot_product over array<int>/array<bigint>") {
    // the aggregate(zip_with(...)) formulation this expression replaced
    // coerced any numeric array; pin that SQL callers keep that contract
    val r = spark.sql(
      "SELECT dot_product(array(1, 2, 3), array(4, 5, 6)) AS d, " +
        "dot_product(array(1L, 2L), array(0.5D, 0.25D)) AS m").head()
    assert(r.getDouble(0) === 32.0)
    assert(r.getDouble(1) === 1.0)
  }

  test("l1 distance: matches HOF fold, null semantics, codegen == interpreted") {
    import graft.functions.L1Distance
    val rows = (0 until 100).map { i =>
      def v(seed: Int) = (0 until 128).map { j =>
        ((seed * 2654435761L + j * 40503L) & 0xff).toInt
      }
      (i.toLong, v(i), v(i + 3))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"), VF.l1(col("a"), col("b")).as("d"))
      .as[(Long, Long)].collect().toMap
    val want = df.select(col("id"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => abs(x - y)),
          lit(0L), (acc, x) => acc + x).as("d"))
      .as[(Long, Long)].collect().toMap
    assert(got.size === 100 && got === want)
    // self-distance zero; symmetric
    assert(df.filter(VF.l1(col("a"), col("a")) =!= 0L).count() === 0)
    assert(df.filter(VF.l1(col("a"), col("b")) =!=
      VF.l1(col("b"), col("a"))).count() === 0)
    // null semantics: null input / null element / length mismatch
    val edge = Seq(
      (1L, Seq(1, 2), Seq(1, 5)),
      (2L, null, Seq(1, 2)),
      (3L, Seq(1, 2, 3), Seq(1, 2))
    ).toDF("id", "a", "b")
      .select(col("id"), VF.l1(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    assert(edge(1L) === Some(3L) && edge(2L).isEmpty && edge(3L).isEmpty)
    // interpreted eval matches the plan (codegen) path
    val a = Array(7, 0, 255, 3)
    val b = Array(0, 9, 1, 3)
    val expr = L1Distance(
      Bridge.toExpression(lit(a)), Bridge.toExpression(lit(b)))
    val viaPlan = Seq(1).toDF("x")
      .select(VF.l1(lit(a), lit(b)).as("d")).as[Long].head()
    assert(expr.eval(null).asInstanceOf[Long] === viaPlan)
    assert(viaPlan === 7L + 9L + 254L + 0L)
  }
}
