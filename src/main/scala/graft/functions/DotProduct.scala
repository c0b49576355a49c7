package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: dot product of two numeric arrays as a
  * strict left-to-right double fold — acc := acc + a(i)*b(i), ascending
  * i — bit-identical to the `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * higher-order-function formulation it replaces (and to DuckDB's
  * list_dot_product on DOUBLE[], which the similarity oracles rely on).
  *
  * The HOF version never enters whole-stage codegen: Spark evaluates
  * ArrayAggregate/ZipWith lambdas interpreted, boxing every element.
  * That cost is invisible at 64 dims x a few thousand rows but is THE
  * scan cost of brute-force / rerank cosine at 100 TB — three folds per
  * scored pair. `doGenCode` keeps the fold in the generated loop; the
  * interpreted `nullSafeEval` computes identically (VectorFunctionsSpec
  * pins both against the HOF formulation).
  *
  * Null semantics match the HOF chain exactly: any null input, any null
  * element, or a length mismatch yields null (zip_with pads the shorter
  * side with null, which poisons the sum).
  *
  * Accepts array<double> and array<float> on either side independently;
  * float elements are widened exactly, so dot(float_vec, double_vec)
  * equals dot over `toDoubleVec` of both.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case ArrayType(FloatType, _) => Some(FloatType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"dot_product needs array<double>/array<float> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  // resolved only after analysis; lazy so construction over unresolved
  // children (the Bridge wrapper) is safe
  private lazy val lf = elemType(left).contains(FloatType)
  private lazy val rf = elemType(right).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(v: String, e: Expression) =
        if (elemType(e).contains(FloatType)) s"(double) $v.getFloat($i)"
        else s"$v.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${get(a, left)} * ${get(b, right)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
