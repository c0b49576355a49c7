package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector math over Array[Float]/Array[Double] embedding columns, built
  * on the native codegen'd [[DotProduct]] expression — no UDFs, no
  * higher-order functions (Spark evaluates ArrayAggregate/ZipWith
  * lambdas interpreted, which silently kept every cosine outside
  * whole-stage codegen), so the hot path stays in the generated loop.
  *
  * Summation is a strict left-to-right fold, matching DuckDB's
  * list_dot_product on DOUBLE[] for bit-exact oracle parity.
  */
object VectorFunctions {

  /** Cast an array<float> column to array<double> (lossless widening). */
  def toDoubleVec(c: Column): Column = transform(c, x => x.cast(DoubleType))

  /** dot(a, b) as a left-to-right double fold (native expression). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(DotProduct(
      org.apache.spark.sql.graft.Bridge.expression(a),
      org.apache.spark.sql.graft.Bridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Σ |a(i) − b(i)| over integer arrays as a long (native expression);
    * the counting-filter kernel — see [[L1Distance]]. */
  def l1(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(L1Distance(
      org.apache.spark.sql.graft.Bridge.expression(a),
      org.apache.spark.sql.graft.Bridge.expression(b)))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
