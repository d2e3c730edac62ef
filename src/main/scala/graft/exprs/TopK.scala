package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Exact grouped top-k as a native `TypedImperativeAggregate` — the scale
  * replacement for `row_number() OVER (PARTITION BY g ORDER BY v) <= k`.
  *
  * The window form shuffles EVERY row to its group's partition and sorts
  * it there: at 10^12 rows that is a full-data exchange plus a full-data
  * sort, to keep k rows per group. This aggregate keeps a k-bounded state
  * per (task, group) during the partial phase — map-side combine discards
  * non-contenders BEFORE the exchange — so the shuffle carries at most
  * k·groups rows per map task and the sort disappears entirely (state
  * stays ordered by construction). Same trick as the kNN local heaps in
  * SpatialOps, generalized to any (value, tag) ranking.
  *
  * Ordering is the total order (value DESC, tag ASC) — ties cannot make
  * the result partitioning-dependent, so the output is deterministic and
  * SQL-oracle-able (ROW_NUMBER ... ORDER BY v DESC, tag). Inputs are
  * BIGINT value + BIGINT tag: rank on exact integers (cents, micro-units,
  * nano-cosines — the repo-wide determinism currency); the row payload
  * joins back by tag after the cut, so wide rows never ride the state.
  *
  * Buffer is a flat Array[Long] of (value, tag) pairs kept sorted (k is
  * small — single-digit to low hundreds; linear insertion beats heap
  * constant factors and serializes trivially). Merge is a bounded sorted
  * merge: commutative, associative, idempotent-free but duplicate-safe
  * under Spark's exactly-once partial aggregation contract.
  */
case class TopKAgg(valueExpr: Expression, tagExpr: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuf] with BinaryLike[Expression] {

  require(k >= 1 && k <= 65536, s"k must be in [1, 65536], got $k")

  override def left: Expression = valueExpr
  override def right: Expression = tagExpr

  override def checkInputDataTypes(): TypeCheckResult =
    (valueExpr.dataType, tagExpr.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (v, t) => TypeCheckResult.TypeCheckFailure(
        s"topk_agg requires (BIGINT value, BIGINT tag), got (${v.sql}, ${t.sql})")
    }

  private val elemType = StructType(Seq(
    StructField("v", LongType, nullable = false),
    StructField("tag", LongType, nullable = false)))
  override def dataType: DataType = ArrayType(elemType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_agg"

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val v = valueExpr.eval(input)
    val t = tagExpr.eval(input)
    if (v != null && t != null) buf.insert(v.asInstanceOf[Long], t.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = { a.mergeIn(b); a }

  override def eval(buf: TopKBuf): Any = {
    val rows = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      rows(i) = InternalRow(buf.values(i), buf.tags(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuf): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuf = TopKBuf.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKAgg =
    copy(valueExpr = l, tagExpr = r)
}

/** k-bounded sorted (value DESC, tag ASC) pair list. */
final class TopKBuf(val k: Int) {
  var size: Int = 0
  var values: Array[Long] = new Array[Long](k)
  var tags: Array[Long] = new Array[Long](k)

  @inline private def beats(v: Long, t: Long, i: Int): Boolean =
    v > values(i) || (v == values(i) && t < tags(i))

  def insert(v: Long, t: Long): Unit = {
    if (size == k && !beats(v, t, k - 1)) return
    // find insertion point (first slot this entry beats)
    var i = if (size == k) k - 1 else size
    while (i > 0 && beats(v, t, i - 1)) i -= 1
    if (i >= k) return
    val last = math.min(size, k - 1)
    var j = last
    while (j > i) { values(j) = values(j - 1); tags(j) = tags(j - 1); j -= 1 }
    values(i) = v; tags(i) = t
    if (size < k) size += 1
  }

  def mergeIn(o: TopKBuf): Unit = {
    var i = 0
    while (i < o.size) { insert(o.values(i), o.tags(i)); i += 1 }
  }

  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + size * 16)
    bb.putInt(size)
    var i = 0
    while (i < size) { bb.putLong(values(i)); bb.putLong(tags(i)); i += 1 }
    bb.array()
  }
}

object TopKBuf {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new TopKBuf(k)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.values(i) = bb.getLong; buf.tags(i) = bb.getLong; i += 1 }
    buf.size = n
    buf
  }
}

object topk {
  /** top-k (value DESC, tag ASC) pairs per group as array<struct<v,tag>>,
    * already ordered. Deterministic under any partitioning. */
  def topk_agg(value: Column, tag: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(value), ColumnBridge.expression(tag), k)
        .toAggregateExpression())
}
