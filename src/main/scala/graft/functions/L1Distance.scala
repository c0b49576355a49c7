package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: L1 (Manhattan) distance of two integer
  * arrays — Σ |a(i) − b(i)| as a long. The counting-filter kernel of
  * the edit-distance dedup path: for character histograms,
  * L1(hist(a), hist(b)) / 2 is a lower bound on Levenshtein distance
  * (an insert/delete moves one count, a substitution moves two), so
  * `l1 <= 2·maxDist` is a COMPLETE pre-filter that runs in O(alphabet)
  * per pair instead of the DP kernel's O(d·n) — the filter that makes
  * banded fuzzy dedup affordable when a length band holds many
  * near-length documents.
  *
  * Same design rules as [[DotProduct]]: `doGenCode` keeps the fold in
  * whole-stage codegen (the HOF aggregate/zip_with formulation is
  * interpreted and boxes every element); null input, null element, or
  * length mismatch yields null. Integer element types only (byte to
  * long) — exact arithmetic, no float accumulation. */
case class L1Distance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (LongType | IntegerType | ShortType | ByteType), _) =>
      Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"l1_distance needs arrays of integral elements, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  private def accessor(e: Expression): (ArrayData, Int) => Long =
    elemType(e).get match {
      case LongType => (arr, i) => arr.getLong(i)
      case IntegerType => (arr, i) => arr.getInt(i).toLong
      case ShortType => (arr, i) => arr.getShort(i).toLong
      case ByteType => (arr, i) => arr.getByte(i).toLong
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
  private lazy val lGet = accessor(left)
  private lazy val rGet = accessor(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = lGet(x, i) - rGet(y, i)
      acc += (if (d < 0) -d else d)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      def get(v: String, e: Expression) = elemType(e).get match {
        case LongType => s"$v.getLong($i)"
        case IntegerType => s"(long) $v.getInt($i)"
        case ShortType => s"(long) $v.getShort($i)"
        case ByteType => s"(long) $v.getByte($i)"
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = ${get(a, left)} - ${get(b, right)};
         |    $acc += ($d < 0L) ? -$d : $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L1Distance =
    copy(left = newLeft, right = newRight)
}
