package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: polynomial rolling hash over the UTF-8
  * bytes of a string — the document-fingerprinting primitive
  * (h_i = (h_{i-1} * B + byte_i) mod M, M = 2^31-1).
  *
  * Implemented with `doGenCode` so it participates in whole-stage
  * codegen (a Scala UDF would box every row and break the codegen
  * stage); the interpreted `nullSafeEval` path computes identically —
  * both are covered by RollingHashSpec.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash needs a string argument, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    RollingHash.hashBytes(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * ${RollingHash.Base}L + ($bytes[$i] & 0xFF)) % ${RollingHash.Mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  val Base = 1000003L
  val Mod = 2147483647L // 2^31 - 1 (prime): products stay < 2^52, no overflow

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * Base + (bytes(i) & 0xFF)) % Mod
      i += 1
    }
    h
  }

  /** Column form. */
  def rolling_hash(c: Column): Column =
    Bridge.column(RollingHash(Bridge.expression(c)))

  /** Register as SQL function `rolling_hash`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "built-in")
}
