package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise min aggregator over fixed-width Long signature arrays —
  * the reduce step of MinHash: one pass, mergeable (map-side partial
  * aggregation works), no row blow-up of (doc × perm) pairs.
  *
  * At 100 TB this is the difference between shuffling |shingles|×k rows
  * and shuffling one k-long array per document.
  */
class MinHashAgg(k: Int) extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)
  override def reduce(buf: Array[Long], row: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (row(i) < buf(i)) buf(i) = row(i); i += 1 }
    buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = reduce(a, b)
  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoders.longArray
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoders.longArray
}

object ExpressionEncoders {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val longArray: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object MinHashAgg {
  /** Column form: min-signature of per-row signature arrays. */
  def minSig(k: Int)(sig: Column): Column = udaf(new MinHashAgg(k)).apply(sig)
}
