package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet, Meunier,
  * AofA 2007 — public construction) as a native Catalyst
  * `TypedImperativeAggregate`: the buffer is the m = 2^p register array
  * (one byte per register), update is a 64-bit hash + max, merge is
  * element-wise max. Because max is commutative, associative and
  * idempotent, the result is EXACTLY the same under any partitioning, task
  * order, or retry — unlike a double sum, this sketch is deterministic by
  * construction, so its output is regression-pinnable and safe to gate.
  *
  * Scale shape: constant-size state (4 KiB at p=12) per group flowing
  * through Spark's standard partial → final aggregation; a 100 TB
  * distinct-count costs one scan + a shuffle of one sketch per group per
  * map task, never a shuffle of the values themselves (contrast exact
  * count(DISTINCT x), which is an expand + full reshuffle of x).
  *
  * 64-bit hashing (FNV-1a + splitmix64 finalizer, same family as
  * graft.exprs.Hashing) removes the 2^32 large-range correction of the
  * original paper; small-range linear counting is kept. Standard error is
  * ~1.04/sqrt(m) ≈ 1.6% at p = 12.
  */
case class HllDistinct(child: Expression, p: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
  private val m = 1 << p

  // Reject unhashable child types at analysis time (hashValue only handles
  // string/long/int); without this a DOUBLE or DECIMAL child passes analysis
  // and every row throws at execution.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_distinct requires a STRING, BIGINT or INT input, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_distinct"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  private def mix64(h0: Long): Long = {
    var z = h0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def hashValue(v: Any): Long = v match {
    case s: UTF8String => mix64(Hashing.utf8Hash(s))
    case l: Long       => mix64(l)
    case i: Int        => mix64(i.toLong)
    case other => throw new IllegalArgumentException(
      s"hll_distinct: unsupported input ${other.getClass}")
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = hashValue(v)
      val idx = (h >>> (64 - p)).toInt
      val w = h << p
      val rho = if (w == 0L) (64 - p + 1) else java.lang.Long.numberOfLeadingZeros(w) + 1
      if (rho > buf(idx)) buf(idx) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val alpha =
      if (m == 16) 0.673
      else if (m == 32) 0.697
      else if (m == 64) 0.709
      else 0.7213 / (1.0 + 1.079 / m)
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Math.pow(2.0, -buf(i).toDouble)
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha * m.toDouble * m.toDouble / invSum
    val est =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else e
    math.round(est)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllDistinct =
    copy(child = c)
}

/** Count-Min sketch (Cormode, Muthukrishnan, J.Algorithms 2005 — public
  * construction): d rows of w counters; update increments one counter per
  * row at h_j(x) mod w; the point estimate min_j cms[j][h_j(x)] NEVER
  * undercounts the true frequency. That one-sided error is the whole point
  * here: it makes the sketch a sound CANDIDATE FILTER for exact heavy
  * hitters (see TextOps.heavyHitters) — no true heavy hitter can be
  * filtered out, and false positives die in the exact re-count.
  *
  * Buffer is d*w longs; merge is element-wise sum, which is commutative
  * and associative, so the merged sketch is EXACTLY identical under any
  * partitioning, task order, or retry. Scale shape: constant-size state
  * (d=4, w=8192 → 256 KiB) flowing through Spark's standard partial →
  * final aggregation; a 100 TB frequency survey costs one scan plus one
  * sketch per map task through the exchange — the tokens themselves never
  * shuffle.
  */
case class CmsSketch(child: Expression, d: Int, w: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(d >= 1 && d <= 8, s"d must be in [1,8], got $d")
  require(w >= 16 && (w & (w - 1)) == 0, s"w must be a power of two >= 16, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_sketch requires a STRING, BIGINT or INT input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = v match {
        case s: UTF8String => Hashing.utf8Hash(s)
        case l: Long       => l
        case i: Int        => i.toLong
        case other => throw new IllegalArgumentException(
          s"cms_sketch: unsupported input ${other.getClass}")
      }
      var j = 0
      while (j < d) {
        buf(j * w + CmsOps.slot(base, j, w)) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): CmsSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CmsSketch =
    copy(child = c)
}

/** Static kernels shared by the CMS aggregate (update) and the CMS lookup
  * expression (probe) — the two sides MUST hash identically or the
  * no-undercount guarantee breaks. */
object CmsOps {
  /** row-j slot of a pre-hashed key: splitmix64 mix of (base, j), masked
    * to the power-of-two width. */
  def slot(base: Long, j: Int, w: Int): Int =
    (Hashing.mix(base, j) & (w - 1)).toInt

  /** min_j cms[j][h_j(key)] — never less than the true count of `key`. */
  def minCount(sketch: Array[Long], d: Int, w: Int, key: UTF8String): Long = {
    val base = Hashing.utf8Hash(key)
    var m = Long.MaxValue
    var j = 0
    while (j < d) {
      val c = sketch(j * w + slot(base, j, w))
      if (c < m) m = c
      j += 1
    }
    m
  }
}

/** Point-estimate probe against a plan-time CMS (the merged global sketch,
  * a few hundred KiB, rides the expression as a reference object and the
  * task closure). Stays inside whole-stage codegen — this is the per-token
  * hot op of the heavy-hitter candidate filter. */
case class CmsMinCount(child: Expression, sketch: Array[Long], d: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cms_min_count"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_min_count requires a STRING input, got ${other.sql}")
  }
  override protected def nullSafeEval(v: Any): Any =
    CmsOps.minCount(sketch, d, w, v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsSketch", sketch, "long[]")
    defineCodeGen(ctx, ev, v => s"graft.exprs.CmsOps.minCount($ref, $d, $w, $v)")
  }
  override protected def withNewChildInternal(c: Expression): CmsMinCount =
    copy(child = c)
}

/** Bloom filter (Bloom, CACM 1970 — public construction) as a native
  * Catalyst `TypedImperativeAggregate`: the buffer is an m-bit array packed
  * into longs, update sets k bits chosen by double hashing (Kirsch &
  * Mitzenmacher 2006: h_i = h1 + i·h2), merge is bitwise OR. OR is
  * commutative, associative and idempotent, so — like the HLL above — the
  * built filter is EXACTLY the same under any partitioning or retry.
  *
  * Purpose at 100 TB: semi-join reduction. Build the filter over the SMALL
  * join side's keys (one aggregate, constant-size state per map task), probe
  * it on the LARGE side BEFORE the join's exchange — rows whose key cannot
  * be in the small side never enter the shuffle. No false negatives, so the
  * subsequent exact join returns exactly the plain-join result; false
  * positives (rate ≈ (1 - e^{-kn/m})^k) only cost wasted shuffle bytes.
  * This is the same mechanism as Spark's own runtime bloom-pushdown
  * (InjectRuntimeFilter), expressed as an explicit, oracle-checkable
  * operator. */
case class BloomAgg(child: Expression, bits: Int, k: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(bits >= 64 && (bits & (bits - 1)) == 0,
    s"bits must be a power of two >= 64, got $bits")
  require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg requires a STRING, BIGINT or INT input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomOps.add(buf, k, BloomOps.baseHash(v))
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomAgg =
    copy(child = c)
}

/** Static kernels shared by the Bloom aggregate (insert) and the membership
  * probe (lookup) — both sides MUST hash identically or the no-false-
  * negative guarantee (and therefore join exactness) breaks. */
object BloomOps {
  def baseHash(v: Any): Long = v match {
    case s: UTF8String => Hashing.utf8Hash(s)
    case l: Long       => l
    case i: Int        => i.toLong
    case other => throw new IllegalArgumentException(
      s"bloom: unsupported input ${other.getClass}")
  }
  /** bit index of hash i: double hashing over the splitmix mixes (h2 forced
    * odd so the stride is coprime with the power-of-two width). */
  private def bitOf(base: Long, i: Int, mask: Long): Int = {
    val h1 = Hashing.mix(base, 0)
    val h2 = Hashing.mix(base, 1) | 1L
    ((h1 + i.toLong * h2) & mask).toInt
  }
  def add(words: Array[Long], k: Int, base: Long): Unit = {
    val mask = words.length.toLong * 64L - 1L
    var i = 0
    while (i < k) {
      val b = bitOf(base, i, mask)
      words(b >>> 6) |= (1L << (b & 63))
      i += 1
    }
  }
  def contains(words: Array[Long], k: Int, base: Long): Boolean = {
    val mask = words.length.toLong * 64L - 1L
    var i = 0
    while (i < k) {
      val b = bitOf(base, i, mask)
      if ((words(b >>> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }
  // codegen entry points (monomorphic per child type)
  def containsLong(words: Array[Long], k: Int, v: Long): Boolean =
    contains(words, k, v)
  def containsUtf8(words: Array[Long], k: Int, v: UTF8String): Boolean =
    contains(words, k, Hashing.utf8Hash(v))
}

/** Membership probe against a plan-time Bloom filter (the merged global
  * filter rides the expression as a reference object). This is the per-row
  * hot op of the semi-join reduction — it runs on EVERY large-side row
  * before the shuffle, so it stays inside whole-stage codegen. */
case class BloomContains(child: Expression, words: Array[Long], k: Int)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_contains"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains requires a STRING, BIGINT or INT input, got ${other.sql}")
  }
  override protected def nullSafeEval(v: Any): Any =
    BloomOps.contains(words, k, BloomOps.baseHash(v))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, v => s"graft.exprs.BloomOps.containsUtf8($ref, $k, $v)")
      case _ =>
        defineCodeGen(ctx, ev, v => s"graft.exprs.BloomOps.containsLong($ref, $k, (long)$v)")
    }
  }
  override protected def withNewChildInternal(c: Expression): BloomContains =
    copy(child = c)
}

object sketches {
  /** HLL distinct-count estimate of `col` (string or integral), 2^p
    * registers. Deterministic under any partitioning → pinnable. */
  def hll_distinct(col: Column, p: Int = 12): Column =
    ColumnBridge.column(
      HllDistinct(ColumnBridge.expression(col), p).toAggregateExpression())

  /** Count-Min sketch of `col` as array<bigint> of length d*w (row-major).
    * Deterministic under any partitioning (merge = elementwise sum). */
  def cms_sketch(col: Column, d: Int = 4, w: Int = 8192): Column =
    ColumnBridge.column(
      CmsSketch(ColumnBridge.expression(col), d, w).toAggregateExpression())

  /** CMS point estimate of `col`'s frequency (>= true count). */
  def cms_min_count(col: Column, sketch: Array[Long], d: Int, w: Int): Column =
    ColumnBridge.column(
      CmsMinCount(ColumnBridge.expression(col), sketch, d, w))

  /** Bloom filter of `col` (string or integral) as array<bigint> of packed
    * bit words. Deterministic under any partitioning (merge = bitwise OR). */
  def bloom_agg(col: Column, bits: Int = 1 << 20, k: Int = 5): Column =
    ColumnBridge.column(
      BloomAgg(ColumnBridge.expression(col), bits, k).toAggregateExpression())

  /** Membership probe of `col` against a built filter — true for every
    * inserted key (no false negatives), possibly true for others. */
  def bloom_contains(col: Column, words: Array[Long], k: Int = 5): Column =
    ColumnBridge.column(
      BloomContains(ColumnBridge.expression(col), words, k))
}
