package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: FNV-1a 64-bit over the UTF-8 bytes of a
  * string — the shared 64-bit fingerprint primitive (same function the
  * dedup kernels apply per-shingle via [[graft.operators.Dedup.fnv64]]).
  * A LongType fingerprint halves the shuffle width of downstream joins
  * vs the 32-char md5 hex, and `xxhash64` of a long is the short
  * fixed-length path — cheap to probe and exactly replayable in SQL.
  *
  * `doGenCode` keeps it inside whole-stage codegen; the interpreted
  * path computes identically (Fnv64Spec pins both against the kernel
  * function).
  */
case class Fnv64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fnv64 needs a string argument, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    Fnv64.hashBytes(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Fnv64.hashBytes($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Fnv64 =
    copy(child = newChild)
}

object Fnv64 {

  /** FNV-1a 64: h = (h ^ byte) * 0x100000001b3, from offset basis. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFF)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Column form. */
  def fnv64(c: Column): Column =
    Bridge.column(Fnv64(Bridge.expression(c)))
}
