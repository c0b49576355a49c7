package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expression: the splitmix64 finalizer of `h + offset`
  * with WRAP-AROUND 64-bit semantics — bit-identical to
  * [[graft.operators.Dedup.splitmix64]] / `CmsOps.mix`, the
  * deterministic pseudo-random stream every sketch/LSH operator in the
  * engine derives its permutations and hyperplanes from.
  *
  * Why an expression and not column arithmetic: Spark 4 runs ANSI mode
  * by default, where `Column + / *` THROW on Long overflow — but a hash
  * mixer's arithmetic is wrapping by definition. Lowering the mixer to
  * built-in operators would need ansi-off or try_add chains (which
  * return null, the wrong algebra); this expression keeps the wrapping
  * semantics explicit, stays inside whole-stage codegen via
  * [[doGenCode]], and gives SQL users `splitmix64(h, i)` for free.
  *
  * Used on the c15 streaming hot path to derive per-row MinHash
  * permutation values `splitmix64(xxhash64(key), i)` for i < k.
  */
case class SplitMix64Expr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  // narrower integrals (SQL integer literals) widen losslessly
  override def inputTypes = Seq(LongType, LongType)

  override def nullSafeEval(a: Any, b: Any): Any =
    SplitMix64Expr.mix(a.asInstanceOf[Long] + b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      // Java long arithmetic wraps — exactly the mixer's contract
      s"""
         |long $x = $a + $b + 0x9e3779b97f4a7c15L;
         |$x = ($x ^ ($x >>> 30)) * 0xbf58476d1ce4e5b9L;
         |$x = ($x ^ ($x >>> 27)) * 0x94d049bb133111ebL;
         |${ev.value} = $x ^ ($x >>> 31);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SplitMix64Expr =
    copy(left = newLeft, right = newRight)
}

object SplitMix64Expr {
  @inline def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Column form: splitmix64(h + offset). */
  def splitmix64(h: org.apache.spark.sql.Column,
      offset: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.Bridge.column(SplitMix64Expr(
      org.apache.spark.sql.graft.Bridge.expression(h),
      org.apache.spark.sql.graft.Bridge.expression(offset)))
}
