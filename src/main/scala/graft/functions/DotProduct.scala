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
  * Accepts any non-decimal numeric array element type on either side
  * independently (double, float, long, int, short, byte); every element
  * is widened exactly to double before the multiply, so
  * dot(int_vec, double_vec) equals dot over `toDoubleVec` of both —
  * matching the implicit numeric coercion the replaced
  * aggregate(zip_with(...)) formulation gave SQL callers.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t: NumericType, _) if !t.isInstanceOf[DecimalType] => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"dot_product needs arrays of non-decimal numeric elements, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  // resolved only after analysis; lazy so construction over unresolved
  // children (the Bridge wrapper) is safe. One branchless accessor per
  // side, bound once — the per-row loop stays monomorphic.
  private def accessor(e: Expression): (ArrayData, Int) => Double =
    elemType(e).get match {
      case DoubleType => (arr, i) => arr.getDouble(i)
      case FloatType => (arr, i) => arr.getFloat(i).toDouble
      case LongType => (arr, i) => arr.getLong(i).toDouble
      case IntegerType => (arr, i) => arr.getInt(i).toDouble
      case ShortType => (arr, i) => arr.getShort(i).toDouble
      case ByteType => (arr, i) => arr.getByte(i).toDouble
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
  private lazy val lGet = accessor(left)
  private lazy val rGet = accessor(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += lGet(x, i) * rGet(y, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(v: String, e: Expression) = elemType(e).get match {
        case DoubleType => s"$v.getDouble($i)"
        case FloatType => s"(double) $v.getFloat($i)"
        case LongType => s"(double) $v.getLong($i)"
        case IntegerType => s"(double) $v.getInt($i)"
        case ShortType => s"(double) $v.getShort($i)"
        case ByteType => s"(double) $v.getByte($i)"
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
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
