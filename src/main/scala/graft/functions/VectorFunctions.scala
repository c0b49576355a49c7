package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector math over Array[Float]/Array[Double] embedding columns, built on
  * codegen'd higher-order functions (zip_with/aggregate) — no UDFs, so the
  * hot path stays inside whole-stage codegen.
  *
  * Summation is a strict left-to-right fold, matching DuckDB's
  * list_dot_product on DOUBLE[] for bit-exact oracle parity.
  */
object VectorFunctions {

  /** Cast an array<float> column to array<double> (lossless widening). */
  def toDoubleVec(c: Column): Column = transform(c, x => x.cast(DoubleType))

  /** dot(a, b) as a left-to-right double fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
