package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KMV / bottom-k sketch (Bar-Yossef et al. 2002; Beyer et al. 2007):
  * keep the k smallest DISTINCT 64-bit hashes of a set. The
  * corpus-overlap primitive the HLL/CMS family can't provide — two
  * KMV sketches support set-operation ESTIMATES (union cardinality,
  * Jaccard, intersection size) without ever joining the underlying
  * data: "how much does source A overlap source B" at 100 TB is two
  * per-source sketch columns and a scalar combine.
  *
  * Like the HLL registers and CMS counters, the sketch is a
  * DETERMINISTIC, ORDER-FREE function of the input SET: "k smallest
  * distinct hashes" does not depend on arrival order or partitioning,
  * and set union is associative+commutative, so build(everything) ==
  * merge(partials) BYTE-FOR-BYTE and the whole path replays in SQL
  * (rank the distinct hashes, keep r <= k) — a full equality oracle.
  *
  * Estimators (hashes mapped to [0,1) by u = h / 2^64 unsigned):
  * - distinct:  exact |retained| while |retained| < k (the sketch IS
  *   the set); else (k-1) / u_k where u_k is the k-th smallest — the
  *   standard unbiased KMV estimator.
  * - union:     KMV of A ∪ B = k smallest of (retained_A ∪ retained_B)
  *   (true because any hash in the union's bottom-k is in its own
  *   side's bottom-k), then the distinct estimator.
  * - Jaccard:   ρ = |U_k ∩ A ∩ B| / |U_k| over the union's retained
  *   set U_k — the bottom-k values are a uniform sample of A ∪ B, so ρ
  *   estimates J(A,B); exact when both sets fit in k.
  * - intersection: ρ × union estimate (fixed multiply order).
  *
  * Hash chain: callers pre-key items with fnv64 (the shared 8-byte
  * primitive, like cms_build in k2), then xxhash64(seed 42) of that
  * long — both layers replay in the oracle's CTE machinery.
  */
object KmvOps {

  val DefaultK = 128

  /** Retained set as an unsigned-sorted long array (ascending by
    * Long.compareUnsigned), always deduplicated, length <= k. */
  final class Buffer(val k: Int) extends Serializable {
    var hashes: Array[Long] = Array.emptyLongArray
    def isEmpty: Boolean = hashes.isEmpty
  }

  @inline private def unsignedLess(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(a, b) < 0

  /** Merge `extra` hashes into buffer: union, dedup, keep bottom k. */
  def offerAll(b: Buffer, extra: Array[Long]): Unit = {
    if (extra.isEmpty) return
    val merged = new Array[Long](b.hashes.length + extra.length)
    System.arraycopy(b.hashes, 0, merged, 0, b.hashes.length)
    System.arraycopy(extra, 0, merged, b.hashes.length, extra.length)
    b.hashes = bottomK(merged, b.k)
  }

  def offer(b: Buffer, h: Long): Unit = {
    // fast path: full buffer and h above the current k-th smallest
    if (b.hashes.length == b.k && !unsignedLess(h, b.hashes(b.k - 1))) return
    offerAll(b, Array(h))
  }

  /** Unsigned-sort, dedup, truncate to k. */
  def bottomK(hs: Array[Long], k: Int): Array[Long] = {
    // unsigned order == signed order of (h ^ Long.MinValue)
    val keyed = hs.map(_ ^ Long.MinValue)
    java.util.Arrays.sort(keyed)
    val out = new Array[Long](math.min(k, keyed.length))
    var n = 0
    var i = 0
    while (i < keyed.length && n < k) {
      if (n == 0 || keyed(i) != (out(n - 1) ^ Long.MinValue)) {
        out(n) = keyed(i) ^ Long.MinValue
        n += 1
      }
      i += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** 2^64 as an EXACT double (a power of two) — scalb, not a decimal
    * literal: a short literal like 1.84467440737095520E19 sits more
    * than half an ulp from 2^64 and parses to the neighboring double,
    * silently desyncing from the SQL oracle's exact
    * 18446744073709551616e0. */
  private val TwoPow64: Double = java.lang.Math.scalb(1.0, 64)

  /** h as a uniform double in [0, 1): unsigned(h) / 2^64. */
  @inline def toUnit(h: Long): Double =
    // exact unsigned-to-double then one divide — mirrors the SQL
    // CAST(h AS DOUBLE) / 2^64 (HUGEINT h holds the unsigned value)
    unsignedToDouble(h) / TwoPow64

  def unsignedToDouble(h: Long): Double =
    if (h >= 0) h.toDouble // single round-to-nearest, bit-equal to SQL's CAST
    else
      // upper-half values (only reachable for near-k-sized sets): go
      // through BigInteger for the same SINGLE round-to-nearest the SQL
      // HUGEINT->DOUBLE cast performs — the shift-and-add formulation
      // would round twice and can differ in the last ulp
      new java.math.BigInteger(java.lang.Long.toUnsignedString(h)).doubleValue()

  /** Distinct-count estimate from a retained set. */
  def estimate(hashes: Array[Long], k: Int): Double =
    if (hashes.length < k) hashes.length.toDouble
    else (k - 1).toDouble / toUnit(hashes(k - 1))

  /** The union's retained set (bottom k of the set union). */
  def unionRetained(a: Buffer, b: Buffer): Array[Long] = {
    require(a.k == b.k, s"mismatched sketch k: ${a.k} vs ${b.k}")
    bottomK(a.hashes ++ b.hashes, a.k)
  }

  def jaccard(a: Buffer, b: Buffer): Double = {
    val u = unionRetained(a, b)
    if (u.isEmpty) return 0.0
    val sa = a.hashes.toSet
    val sb = b.hashes.toSet
    var m = 0
    var i = 0
    while (i < u.length) {
      if (sa.contains(u(i)) && sb.contains(u(i))) m += 1
      i += 1
    }
    m.toDouble / u.length
  }

  def unionEstimate(a: Buffer, b: Buffer): Double =
    estimate(unionRetained(a, b), a.k)

  def intersectEstimate(a: Buffer, b: Buffer): Double =
    jaccard(a, b) * unionEstimate(a, b)

  def serialize(b: Buffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 4 + b.hashes.length * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(b.k).putInt(b.hashes.length)
    b.hashes.foreach(buf.putLong)
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val b = new Buffer(buf.getInt)
    val n = buf.getInt
    b.hashes = Array.fill(n)(buf.getLong)
    b
  }
}

abstract class KmvAggBase extends TypedImperativeAggregate[KmvOps.Buffer]
    with UnaryLike[Expression] {
  override def merge(b: KmvOps.Buffer, o: KmvOps.Buffer): KmvOps.Buffer = {
    if (o.isEmpty) b
    else if (b.isEmpty && b.k != o.k) {
      // adopt the incoming k on first merge into a default-k buffer
      val fresh = new KmvOps.Buffer(o.k)
      KmvOps.offerAll(fresh, o.hashes)
      fresh
    } else {
      // mixing capacities would silently truncate the larger sketch's
      // retained set to the smaller k — refuse, like the combines do
      require(b.k == o.k, s"mismatched sketch k: ${b.k} vs ${o.k}")
      KmvOps.offerAll(b, o.hashes); b
    }
  }
  override def eval(b: KmvOps.Buffer): Any = KmvOps.serialize(b)
  override def serialize(b: KmvOps.Buffer): Array[Byte] = KmvOps.serialize(b)
  override def deserialize(bytes: Array[Byte]): KmvOps.Buffer =
    KmvOps.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** kmv_build(col[, k]): bottom-k sketch of the column's distinct
  * values (hashed xxhash64 seed 42, like every sketch here). */
case class KmvSketchBuild(
    child: Expression,
    k: Int = KmvOps.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KmvAggBase {
  require(k >= 2, s"kmv k must be >= 2, got $k")
  override def createAggregationBuffer(): KmvOps.Buffer = new KmvOps.Buffer(k)
  override def update(b: KmvOps.Buffer, row: InternalRow): KmvOps.Buffer = {
    val v = child.eval(row)
    if (v != null) KmvOps.offer(b, XxHash64Function.hash(v, child.dataType, 42L))
    b
  }
  override def withNewMutableAggBufferOffset(n: Int): KmvSketchBuild =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvSketchBuild =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KmvSketchBuild =
    copy(child = c)
  override def prettyName: String = "kmv_build"
}

/** kmv_merge(sketch): set-union of sketch binaries (bottom-k kept). */
case class KmvSketchMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KmvAggBase {
  override def createAggregationBuffer(): KmvOps.Buffer =
    new KmvOps.Buffer(KmvOps.DefaultK)
  override def update(b: KmvOps.Buffer, row: InternalRow): KmvOps.Buffer = {
    val v = child.eval(row)
    if (v != null) merge(b, KmvOps.deserialize(v.asInstanceOf[Array[Byte]]))
    else b
  }
  override def withNewMutableAggBufferOffset(n: Int): KmvSketchMerge =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvSketchMerge =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KmvSketchMerge =
    copy(child = c)
  override def prettyName: String = "kmv_merge"
}

/** kmv_estimate(sketch): distinct-count estimate. */
case class KmvEstimate(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any = {
    val b = KmvOps.deserialize(v.asInstanceOf[Array[Byte]])
    KmvOps.estimate(b.hashes, b.k)
  }
  override protected def withNewChildInternal(c: Expression): KmvEstimate =
    copy(child = c)
  override def prettyName: String = "kmv_estimate"
}

/** Two-sketch scalar combines: kmv_jaccard / kmv_union_estimate /
  * kmv_intersect_estimate. */
abstract class KmvBinary
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = DoubleType
  protected def combine(a: KmvOps.Buffer, b: KmvOps.Buffer): Double
  override def nullSafeEval(x: Any, y: Any): Any =
    combine(KmvOps.deserialize(x.asInstanceOf[Array[Byte]]),
      KmvOps.deserialize(y.asInstanceOf[Array[Byte]]))
}

case class KmvJaccard(left: Expression, right: Expression) extends KmvBinary {
  override protected def combine(a: KmvOps.Buffer, b: KmvOps.Buffer): Double =
    KmvOps.jaccard(a, b)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KmvJaccard = copy(left = l, right = r)
  override def prettyName: String = "kmv_jaccard"
}

case class KmvUnionEstimate(left: Expression, right: Expression) extends KmvBinary {
  override protected def combine(a: KmvOps.Buffer, b: KmvOps.Buffer): Double =
    KmvOps.unionEstimate(a, b)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KmvUnionEstimate = copy(left = l, right = r)
  override def prettyName: String = "kmv_union_estimate"
}

case class KmvIntersectEstimate(left: Expression, right: Expression) extends KmvBinary {
  override protected def combine(a: KmvOps.Buffer, b: KmvOps.Buffer): Double =
    KmvOps.intersectEstimate(a, b)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KmvIntersectEstimate = copy(left = l, right = r)
  override def prettyName: String = "kmv_intersect_estimate"
}
