package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Mergeable Bloom filter as a native Catalyst aggregate + membership
  * expression — the shuffle-free decontamination / anti-join primitive.
  *
  * At 100 TB the exact fingerprint anti-join (d6) shuffles the whole
  * corpus on the fingerprint; a Bloom filter of the (much smaller)
  * benchmark side is a ~MB binary artifact that BROADCASTS, turning
  * decontamination into a zero-shuffle scan-side filter. False positives
  * remove a bounded extra fraction of clean documents (conservative — the
  * safe direction for decontamination); false negatives are impossible,
  * which is the contract the spec checks.
  *
  * Same rollup pattern as `Sketches`: partial filters OR together
  * (associative + commutative), so per-partition/per-day artifacts can be
  * persisted and re-merged without rescanning raw data.
  *
  * Input values are hashed by Spark's builtin `xxhash64` (seed 42): the
  * build aggregate applies `XxHash64Function` internally and the probe
  * expression composes the engine's codegen'd `XxHash64` under itself, so
  * both sides see bit-identical 64-bit hashes and the probe stays inside
  * whole-stage codegen. The second Kirsch–Mitzenmacher hash derives from
  * the first via the murmur3 finalizer (no second pass over the value).
  *
  * Binary layout: [k: int32 BE][bit array]; numBits = (len - 4) * 8.
  */
object Bloom {

  /** Aggregate: build a Bloom filter binary over the column's values,
    * sized for `expectedItems` at `fpp` (classic m/k formulas). */
  def bloom_build(c: Column, expectedItems: Long, fpp: Double = 0.01): Column = {
    val m = BloomOps.optimalNumBits(expectedItems, fpp)
    val k = BloomOps.optimalNumHashes(expectedItems, m)
    Bridge.column(BloomBuild(Bridge.expression(c), m, k).toAggregateExpression())
  }

  /** Aggregate: OR Bloom filter binaries into one filter. */
  def bloom_merge(c: Column): Column =
    Bridge.column(BloomMerge(Bridge.expression(c)).toAggregateExpression())

  /** Scalar: might the filter contain the value? No false negatives. */
  def bloom_might_contain(filter: Column, c: Column): Column =
    Bridge.column(BloomMightContain(
      Bridge.expression(filter), Bridge.expression(xxhash64(c))))
}

object BloomOps {
  val XxSeed = 42L // Spark's builtin xxhash64 seed

  def optimalNumBits(n: Long, fpp: Double): Int = {
    val m = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2)))
    math.min(math.max(m, 64), Int.MaxValue / 8).toInt
  }

  def optimalNumHashes(n: Long, m: Long): Int =
    math.max(1, math.round(m.toDouble / math.max(n, 1) * math.log(2)).toInt)

  def alloc(numBits: Int, k: Int): Array[Byte] = {
    val nBytes = (numBits + 7) / 8
    val buf = new Array[Byte](4 + nBytes)
    buf(0) = (k >>> 24).toByte; buf(1) = (k >>> 16).toByte
    buf(2) = (k >>> 8).toByte; buf(3) = k.toByte
    buf
  }

  def numHashes(buf: Array[Byte]): Int =
    ((buf(0) & 0xFF) << 24) | ((buf(1) & 0xFF) << 16) |
      ((buf(2) & 0xFF) << 8) | (buf(3) & 0xFF)

  @inline private def numBits(buf: Array[Byte]): Long = (buf.length - 4).toLong * 8

  /** murmur3 64-bit finalizer — bijective avalanche for the derived hash. */
  @inline private def fmix64(x: Long): Long = {
    var h = x
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL
    h ^= h >>> 33; h *= 0xC4CEB9FE1A85EC53L
    h ^= h >>> 33; h
  }

  @inline private def hash2(h1: Long): Long = fmix64(h1 ^ 0x9E3779B97F4A7C15L)

  /** Kirsch–Mitzenmacher double hashing: index_i = (h1 + i*h2) mod m. */
  def add(buf: Array[Byte], h: Long): Unit = {
    val m = numBits(buf)
    val k = numHashes(buf)
    val h2 = hash2(h)
    var i = 0
    while (i < k) {
      val idx = java.lang.Math.floorMod(h + i.toLong * h2, m)
      buf(4 + (idx >>> 3).toInt) =
        (buf(4 + (idx >>> 3).toInt) | (1 << (idx & 7).toInt)).toByte
      i += 1
    }
  }

  /** Membership probe — static call target for the codegen'd filter
    * (Scala object without companion ⇒ static forwarder in Java). */
  def mightContain(buf: Array[Byte], h: Long): Boolean = {
    if (buf.length <= 4) return false
    val m = numBits(buf)
    val k = numHashes(buf)
    val h2 = hash2(h)
    var i = 0
    while (i < k) {
      val idx = java.lang.Math.floorMod(h + i.toLong * h2, m)
      if ((buf(4 + (idx >>> 3).toInt) & (1 << (idx & 7).toInt)) == 0) return false
      i += 1
    }
    true
  }

  def mergeInto(into: Array[Byte], from: Array[Byte]): Unit = {
    require(into.length == from.length &&
      numHashes(into) == numHashes(from),
      s"mismatched Bloom filters (${into.length}B/k=${numHashes(into)} vs " +
        s"${from.length}B/k=${numHashes(from)})")
    var i = 4
    while (i < into.length) { into(i) = (into(i) | from(i)).toByte; i += 1 }
  }
}

abstract class BloomAggBase extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {
  override def eval(b: Array[Byte]): Any = b
  override def serialize(b: Array[Byte]): Array[Byte] = b
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** bloom_build(col, m, k): Bloom filter of any atomic-typed column. */
case class BloomBuild(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends BloomAggBase {
  override def createAggregationBuffer(): Array[Byte] =
    BloomOps.alloc(numBits, numHashes)
  override def update(b: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null)
      BloomOps.add(b, XxHash64Function.hash(v, child.dataType, BloomOps.XxSeed))
    b
  }
  override def merge(b: Array[Byte], o: Array[Byte]): Array[Byte] = {
    BloomOps.mergeInto(b, o); b
  }
  override def withNewMutableAggBufferOffset(n: Int): BloomBuild =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomBuild =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): BloomBuild =
    copy(child = c)
  override def prettyName: String = "bloom_build"
}

/** bloom_merge(filter): bitwise OR over filter binaries. Empty input
  * yields an empty (zero-length payload) filter that matches nothing. */
case class BloomMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends BloomAggBase {
  override def createAggregationBuffer(): Array[Byte] = Array.empty[Byte]
  override def update(b: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v == null) b
    else {
      val arr = v.asInstanceOf[Array[Byte]]
      if (b.isEmpty) arr.clone()
      else { BloomOps.mergeInto(b, arr); b }
    }
  }
  override def merge(b: Array[Byte], o: Array[Byte]): Array[Byte] =
    if (o.isEmpty) b
    else if (b.isEmpty) o.clone()
    else { BloomOps.mergeInto(b, o); b }
  override def withNewMutableAggBufferOffset(n: Int): BloomMerge =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomMerge =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): BloomMerge =
    copy(child = c)
  override def prettyName: String = "bloom_merge"
}

/** bloom_might_contain(filter, hash64) — runs in the per-record hot path
  * of a decontamination scan, so it code-gens to a static probe call
  * (stays inside whole-stage codegen, unlike a Scala UDF). The value side
  * is the codegen'd builtin `xxhash64` of the probed column (composed by
  * [[Bloom.bloom_might_contain]]). */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects (binary, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = BooleanType
  override def nullSafeEval(filter: Any, h: Any): Any =
    BloomOps.mightContain(filter.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, h) =>
      s"${ev.value} = graft.functions.BloomOps.mightContain($f, $h);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BloomMightContain = copy(left = l, right = r)
  override def prettyName: String = "bloom_might_contain"
}
