package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Mergeable sketches as native Catalyst aggregates — the 100 TB
  * aggregation pattern the built-in `approx_count_distinct` /
  * `percentile_approx` don't expose: the SKETCH ITSELF is a binary
  * column, so partial sketches can be persisted (per day / per
  * partition), re-aggregated later with a merge aggregate, and finished
  * with a scalar estimator — no re-scan of raw data. (Same contract as
  * the DataSketches-style rollup pattern in Druid/Hive/BigQuery.)
  *
  * Both aggregates are `TypedImperativeAggregate`s: they run under
  * ObjectHashAggregateExec with map-side partial merge; past
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` distinct
  * groups per partition (default 128) Spark falls back to sort-based
  * aggregation — raise the threshold for high-cardinality group-bys.
  *
  * - HLL: dense HyperLogLog, p=12 (4096 1-byte registers, ~1.6% rel.
  *   std. error), xxhash64 input hashing, linear-counting small-range
  *   correction. Register-wise max is associative+commutative ⇒ merge
  *   order never changes the estimate.
  * - KLL-style quantiles: MRL/KLL compactor ladder with deterministic
  *   alternating-offset compaction (no RNG — reproducible across
  *   retries), level weights 2^i, ~O(k) space for any input size.
  */
object Sketches {

  /** Aggregate: build an HLL sketch (binary) of the column's values. */
  def hll_build(c: Column): Column =
    Bridge.column(HllSketchBuild(Bridge.expression(c)).toAggregateExpression())

  /** Aggregate: merge HLL sketch binaries into one sketch. */
  def hll_merge(c: Column): Column =
    Bridge.column(HllSketchMerge(Bridge.expression(c)).toAggregateExpression())

  /** Scalar: estimated distinct count of an HLL sketch binary. */
  def hll_estimate(c: Column): Column =
    Bridge.column(HllEstimate(Bridge.expression(c)))

  /** Aggregate: build a KLL quantile sketch (binary) of a double column. */
  def kll_build(c: Column, k: Int = 256): Column =
    Bridge.column(KllSketchBuild(Bridge.expression(c), k).toAggregateExpression())

  /** Aggregate: merge KLL sketch binaries into one sketch. */
  def kll_merge(c: Column): Column =
    Bridge.column(KllSketchMerge(Bridge.expression(c)).toAggregateExpression())

  /** Scalar: estimated q-quantile (0..1) of a KLL sketch binary. */
  def kll_quantile(c: Column, q: Double): Column =
    Bridge.column(KllQuantile(Bridge.expression(c), q))

  /** Aggregate: build a count-min frequency sketch (binary). */
  def cms_build(c: Column): Column =
    Bridge.column(CmsSketchBuild(Bridge.expression(c)).toAggregateExpression())

  /** Aggregate: merge CMS binaries by counter-wise sum. */
  def cms_merge(c: Column): Column =
    Bridge.column(CmsSketchMerge(Bridge.expression(c)).toAggregateExpression())

  /** Scalar: estimated frequency of `item` in a CMS binary (never
    * undercounts; overcount bounded by (e/width)·N w.h.p.). */
  def cms_query(sketch: Column, item: Column): Column =
    Bridge.column(CmsQuery(Bridge.expression(sketch), Bridge.expression(item)))

  /** Aggregate: KMV bottom-k sketch (binary) of the column's distinct
    * values — the set-overlap primitive (see [[KmvOps]]). */
  def kmv_build(c: Column, k: Int = KmvOps.DefaultK): Column =
    Bridge.column(KmvSketchBuild(Bridge.expression(c), k).toAggregateExpression())

  /** Aggregate: set-union merge of KMV binaries (bottom k kept). */
  def kmv_merge(c: Column): Column =
    Bridge.column(KmvSketchMerge(Bridge.expression(c)).toAggregateExpression())

  /** Scalar: estimated distinct count of a KMV binary. */
  def kmv_estimate(c: Column): Column =
    Bridge.column(KmvEstimate(Bridge.expression(c)))

  /** Scalar: estimated Jaccard similarity of two KMV binaries. */
  def kmv_jaccard(a: Column, b: Column): Column =
    Bridge.column(KmvJaccard(Bridge.expression(a), Bridge.expression(b)))

  /** Scalar: estimated |A ∪ B| from two KMV binaries. */
  def kmv_union_estimate(a: Column, b: Column): Column =
    Bridge.column(KmvUnionEstimate(Bridge.expression(a), Bridge.expression(b)))

  /** Scalar: estimated |A ∩ B| from two KMV binaries. */
  def kmv_intersect_estimate(a: Column, b: Column): Column =
    Bridge.column(KmvIntersectEstimate(Bridge.expression(a), Bridge.expression(b)))
}

// ---------------------------------------------------------------- HLL ----

object HllOps {
  val P = 12
  val M: Int = 1 << P // 4096 registers

  def emptyRegisters(): Array[Byte] = new Array[Byte](M)

  /** Offer a 64-bit hash into the registers. */
  def offerHash(regs: Array[Byte], h: Long): Unit = {
    val idx = (h >>> (64 - P)).toInt
    val rest = h << P
    // rank = leading zeros of the remaining 52 bits + 1, capped
    val rank = (java.lang.Long.numberOfLeadingZeros(rest | (1L << (P - 1))) + 1)
      .min(64 - P + 1)
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  def mergeInto(into: Array[Byte], from: Array[Byte]): Unit = {
    var i = 0
    while (i < M) { if (from(i) > into(i)) into(i) = from(i); i += 1 }
  }

  /** Max register rank: 64 - P + 1. The harmonic sum Σ 2^-reg is
    * accumulated as the EXACT integer Σ 2^(MaxRank-reg) (each term a
    * power of two ≤ 2^53; the 4096-term total needs ~66 bits, hence
    * BigInt) and converted to double ONCE — a float fold would round
    * order-dependently (mantissa span 53+12 bits > 53), which both
    * breaks SQL-oracle replay and loses small-register contributions.
    * The linear-counting ln goes through StrictMath (fdlibm,
    * bit-reproducible across JVMs/platforms — the oracle embeds the
    * same values as a 4096-entry literal table). */
  def estimate(regs: Array[Byte]): Long = {
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    val maxRank = 64 - P + 1
    var sum = BigInt(0)
    var zeros = 0
    var i = 0
    while (i < M) {
      sum += BigInt(1) << (maxRank - (regs(i) & 0xFF))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    // BigInt→double rounds to nearest once; dividing by 2^53 is an
    // exact exponent shift — same value DuckDB gets from
    // CAST(hugeint AS DOUBLE) / 2^53
    val sumD = sum.toDouble / (1L << maxRank).toDouble
    val raw = alpha * M.toDouble * M.toDouble / sumD
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * StrictMath.log(M.toDouble / zeros)
      else raw
    math.rint(est).toLong
  }
}

abstract class HllAggBase extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {
  override def createAggregationBuffer(): Array[Byte] = HllOps.emptyRegisters()
  override def merge(b: Array[Byte], o: Array[Byte]): Array[Byte] = {
    HllOps.mergeInto(b, o); b
  }
  override def eval(b: Array[Byte]): Any = b
  override def serialize(b: Array[Byte]): Array[Byte] = b
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** hll_build(col): HLL sketch of any atomic-typed column. */
case class HllSketchBuild(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends HllAggBase {
  override def update(b: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) HllOps.offerHash(b, XxHash64Function.hash(v, child.dataType, 42L))
    b
  }
  override def withNewMutableAggBufferOffset(n: Int): HllSketchBuild =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllSketchBuild =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): HllSketchBuild =
    copy(child = c)
  override def prettyName: String = "hll_build"
}

/** hll_merge(sketch): register-wise max over sketch binaries. */
case class HllSketchMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends HllAggBase {
  override def update(b: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) {
      val arr = v.asInstanceOf[Array[Byte]]
      require(arr.length == HllOps.M, s"not a p=${HllOps.P} HLL sketch")
      HllOps.mergeInto(b, arr)
    }
    b
  }
  override def withNewMutableAggBufferOffset(n: Int): HllSketchMerge =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllSketchMerge =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): HllSketchMerge =
    copy(child = c)
  override def prettyName: String = "hll_merge"
}

/** Scalar finisher: sketch binary → estimated distinct count. Runs once
  * per aggregated row, not in the per-record hot path — interpreted
  * (CodegenFallback) is fine here. */
case class HllEstimate(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HllOps.estimate(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): HllEstimate =
    copy(child = c)
  override def prettyName: String = "hll_estimate"
}

// ---------------------------------------------------------------- KLL ----

/** Compactor ladder: level i holds items of weight 2^i; each level holds
  * at most `k` items. Compaction sorts a level, promotes every other
  * item (alternating start offset per compaction — deterministic, no
  * RNG), keeps an odd leftover in place. */
class KllBuffer(val k: Int) extends Serializable {
  var levels: Array[scala.collection.mutable.ArrayBuffer[Double]] =
    Array(scala.collection.mutable.ArrayBuffer.empty[Double])
  var parities: Array[Boolean] = Array(false)
  var count: Long = 0L

  private def ensureLevel(i: Int): Unit =
    if (i >= levels.length) {
      levels = levels ++ Array.fill(i - levels.length + 1)(
        scala.collection.mutable.ArrayBuffer.empty[Double])
      parities = parities ++ Array.fill(i - parities.length + 1)(false)
    }

  def add(x: Double): Unit = {
    levels(0) += x
    count += 1
    compactCascade()
  }

  private def compactCascade(): Unit = {
    var i = 0
    while (i < levels.length) {
      if (levels(i).length > k) compactLevel(i)
      i += 1
    }
  }

  private def compactLevel(i: Int): Unit = {
    ensureLevel(i + 1)
    val sorted = levels(i).toArray
    java.util.Arrays.sort(sorted)
    val off = if (parities(i)) 1 else 0
    parities(i) = !parities(i)
    val keepOdd = sorted.length % 2 == 1
    val promoted = scala.collection.mutable.ArrayBuffer.empty[Double]
    var j = off
    val n = if (keepOdd) sorted.length - 1 else sorted.length
    while (j < n) { promoted += sorted(j); j += 2 }
    levels(i).clear()
    if (keepOdd) levels(i) += sorted(sorted.length - 1)
    levels(i + 1) ++= promoted
  }

  def mergeIn(o: KllBuffer): Unit = {
    require(o.k == k, "mismatched sketch k")
    var i = 0
    while (i < o.levels.length) {
      ensureLevel(i)
      levels(i) ++= o.levels(i)
      i += 1
    }
    count += o.count
    compactCascade()
  }

  def quantile(q: Double): Double = {
    val items = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < levels.length) {
      val w = 1L << i
      levels(i).foreach(v => items += ((v, w)))
      i += 1
    }
    if (items.isEmpty) return Double.NaN
    val sorted = items.sortBy(_._1)
    val total = sorted.map(_._2).sum
    val target = (q * total).toLong.max(1L).min(total)
    var cum = 0L
    var j = 0
    while (j < sorted.length) {
      cum += sorted(j)._2
      if (cum >= target) return sorted(j)._1
      j += 1
    }
    sorted.last._1
  }

  def serialize(): Array[Byte] = {
    val nItems = levels.map(_.length).sum
    val buf = ByteBuffer.allocate(4 + 4 + 8 + levels.length * (4 + 1) + nItems * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(k); buf.putInt(levels.length); buf.putLong(count)
    levels.indices.foreach { i =>
      buf.putInt(levels(i).length)
      buf.put(if (parities(i)) 1.toByte else 0.toByte)
      levels(i).foreach(buf.putDouble)
    }
    buf.array()
  }
}

object KllOps {
  def deserialize(bytes: Array[Byte]): KllBuffer = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val b = new KllBuffer(buf.getInt)
    val nLevels = buf.getInt
    b.count = buf.getLong
    b.levels = Array.fill(nLevels)(scala.collection.mutable.ArrayBuffer.empty[Double])
    b.parities = new Array[Boolean](nLevels)
    (0 until nLevels).foreach { i =>
      val n = buf.getInt
      b.parities(i) = buf.get() == 1
      (0 until n).foreach(_ => b.levels(i) += buf.getDouble)
    }
    b
  }
}

abstract class KllAggBase extends TypedImperativeAggregate[KllBuffer]
    with UnaryLike[Expression] {
  override def merge(b: KllBuffer, o: KllBuffer): KllBuffer = {
    // final-side buffers are created with the default k; adopt the
    // incoming k when merging into an empty buffer (mirrors the
    // KllSketchMerge.update path), and skip empty partials outright so a
    // row-less partition's default-k buffer can't poison a non-default
    // aggregation
    if (o.count == 0) b
    else if (b.count == 0 && b.k != o.k) {
      val fresh = new KllBuffer(o.k); fresh.mergeIn(o); fresh
    } else { b.mergeIn(o); b }
  }
  override def eval(b: KllBuffer): Any = b.serialize()
  override def serialize(b: KllBuffer): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): KllBuffer = KllOps.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** kll_build(col, k): quantile sketch of a numeric column (cast the
  * input to double before aggregating). */
case class KllSketchBuild(
    child: Expression,
    k: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KllAggBase {
  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)
  override def update(b: KllBuffer, row: InternalRow): KllBuffer = {
    val v = child.eval(row)
    if (v != null) b.add(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case s: Short => s.toDouble
      case by: Byte => by.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"kll_build needs a numeric column, got $other")
    })
    b
  }
  override def withNewMutableAggBufferOffset(n: Int): KllSketchBuild =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchBuild =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllSketchBuild =
    copy(child = c)
  override def prettyName: String = "kll_build"
}

/** kll_merge(sketch): merge sketch binaries. */
case class KllSketchMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KllAggBase {
  override def createAggregationBuffer(): KllBuffer = new KllBuffer(256)
  override def update(b: KllBuffer, row: InternalRow): KllBuffer = {
    val v = child.eval(row)
    if (v != null) {
      val o = KllOps.deserialize(v.asInstanceOf[Array[Byte]])
      if (b.count == 0 && b.k != o.k) {
        // adopt the incoming k on first merge into a fresh buffer
        val fresh = new KllBuffer(o.k)
        fresh.mergeIn(o)
        return fresh
      }
      b.mergeIn(o)
    }
    b
  }
  override def withNewMutableAggBufferOffset(n: Int): KllSketchMerge =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchMerge =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllSketchMerge =
    copy(child = c)
  override def prettyName: String = "kll_merge"
}

/** Scalar finisher: sketch binary → q-quantile estimate. */
case class KllQuantile(child: Expression, q: Double) extends UnaryExpression
    with CodegenFallback {
  require(q >= 0.0 && q <= 1.0, s"quantile $q out of [0,1]")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    KllOps.deserialize(v.asInstanceOf[Array[Byte]]).quantile(q)
  override protected def withNewChildInternal(c: Expression): KllQuantile =
    copy(child = c)
  override def prettyName: String = "kll_quantile"
}

// ---------------------------------------------------------------- CMS ----

/** Count-min sketch: depth x width counter matrix; an item increments
  * one counter per row (chosen by that row's hash), a point query takes
  * the MIN across rows. Estimates never undercount; the overcount is
  * bounded by (e/width) * N with probability 1 - (1/e)^depth (Cormode &
  * Muthukrishnan 2005). Counter addition is associative+commutative, so
  * build(all data) == merge(partial sketches) BYTE-FOR-BYTE — the
  * strongest possible merge contract (asserted in SketchesSpec). */
object CmsOps {
  val Depth = 4
  val Width = 2048

  def empty(): Array[Long] = new Array[Long](Depth * Width)

  /** splitmix64 finalizer — derives the per-row hash from one xxhash64
    * of the item, deterministic on every executor. */
  @inline private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Row-d counter index for a 64-bit item hash — public so the SQL
    * oracle can constant-fold probe cells and specs can pin the math. */
  def indexOf(h: Long, d: Int): Int = ((mix(h ^ d) >>> 1) % Width).toInt

  def offerHash(t: Array[Long], h: Long): Unit = {
    var d = 0
    while (d < Depth) {
      t(d * Width + indexOf(h, d)) += 1L
      d += 1
    }
  }

  def query(t: Array[Long], h: Long): Long = {
    var est = Long.MaxValue
    var d = 0
    while (d < Depth) {
      val c = t(d * Width + indexOf(h, d))
      if (c < est) est = c
      d += 1
    }
    est
  }

  /** Probe the SERIALIZED sketch in place: Depth positional 8-byte reads
    * instead of materializing the 64 KiB counter table — CmsQuery runs
    * once per SCANNED ROW when the sketch is a broadcast literal (the k4
    * heavy-hitter probe), where a per-row deserialize was the entire
    * query cost (measured 3.3 s -> the probe pass itself at sf0.1). */
  def queryBytes(bytes: Array[Byte], h: Long): Long = {
    require(bytes.length == Depth * Width * 8, s"not a ${Depth}x$Width CMS")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var est = Long.MaxValue
    var d = 0
    while (d < Depth) {
      val c = buf.getLong((d * Width + indexOf(h, d)) * 8)
      if (c < est) est = c
      d += 1
    }
    est
  }

  def mergeInto(into: Array[Long], from: Array[Long]): Unit = {
    require(from.length == Depth * Width, s"not a ${Depth}x$Width CMS")
    var i = 0
    while (i < into.length) { into(i) += from(i); i += 1 }
  }

  def serialize(t: Array[Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(t.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    buf.asLongBuffer().put(t)
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length == Depth * Width * 8, s"not a ${Depth}x$Width CMS")
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }
}

abstract class CmsAggBase extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {
  override def createAggregationBuffer(): Array[Long] = CmsOps.empty()
  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    CmsOps.mergeInto(b, o); b
  }
  override def eval(b: Array[Long]): Any = CmsOps.serialize(b)
  override def serialize(b: Array[Long]): Array[Byte] = CmsOps.serialize(b)
  override def deserialize(bytes: Array[Byte]): Array[Long] = CmsOps.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** cms_build(col): count-min sketch of the column's value frequencies. */
case class CmsSketchBuild(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends CmsAggBase {
  override def update(b: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) CmsOps.offerHash(b, XxHash64Function.hash(v, child.dataType, 42L))
    b
  }
  override def withNewMutableAggBufferOffset(n: Int): CmsSketchBuild =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsSketchBuild =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): CmsSketchBuild =
    copy(child = c)
  override def prettyName: String = "cms_build"
}

/** cms_merge(sketch): counter-wise sum over sketch binaries. */
case class CmsSketchMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends CmsAggBase {
  override def update(b: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) CmsOps.mergeInto(b, CmsOps.deserialize(v.asInstanceOf[Array[Byte]]))
    b
  }
  override def withNewMutableAggBufferOffset(n: Int): CmsSketchMerge =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsSketchMerge =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): CmsSketchMerge =
    copy(child = c)
  override def prettyName: String = "cms_merge"
}

/** Scalar finisher: estimated frequency of `item` in a CMS binary.
  * Never undercounts; overcount bounded by (e/width)*N w.h.p. */
case class CmsQuery(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(sk: Any, item: Any): Any =
    CmsOps.queryBytes(sk.asInstanceOf[Array[Byte]],
      XxHash64Function.hash(item, right.dataType, 42L))
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CmsQuery = copy(left = l, right = r)
  override def prettyName: String = "cms_query"
}
