package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** `bitmap_distinct(key)` — exact distinct counting as a native
  * Catalyst aggregate with a MERGEABLE bitmap buffer: the
  * TypedImperativeAggregate tier of the extension ladder (the shape
  * every sketch library — DataSketches HLL/theta, roaring-bitmap aggs
  * — plugs into Spark with). Complements [[graft.queries
  * .RelationalQueries]]'s `q_agg_bitmap`, which builds the same
  * semantics from two relational hash aggs: here the bitmap IS the
  * aggregation buffer, so one agg pass (partial on the map side,
  * merge on the reduce side) replaces the two-level word fold.
  *
  * Buffer: sparse word map `key >> 6 → 64-bit occupancy mask`
  * (roaring-lite; (>> 6, & 63) is a bijection on longs, so negative
  * keys are fine). State is O(distinct/64) words per group — the
  * reason bitmap distinct scales where `count(DISTINCT)` pays an
  * Expand + exchange of every distinct value. serialize/deserialize
  * is a flat (word, mask) pair stream, partial-aggregation safe.
  *
  * Reference behavioral note: null inputs are ignored (SQL COUNT
  * semantics); result type LONG, never null (empty group → 0).
  */
case class BitmapDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[java.lang.Long, java.lang.Long]]
  with UnaryLike[Expression] {

  private type Buf = java.util.HashMap[java.lang.Long, java.lang.Long]

  // integral child only; widen with an explicit CAST at the call site
  // (AbstractDataType/ImplicitCastInputTypes are private[sql], so the
  // check is spelled out here like CosineSimilarity does)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bitmap_distinct expects an integral key, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_distinct"

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Number].longValue()
      buf.merge(k >> 6, 1L << (k & 63),
        (a: java.lang.Long, b: java.lang.Long) => a | b: java.lang.Long)
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    b2.forEach { (w: java.lang.Long, m: java.lang.Long) =>
      b1.merge(w, m, (a: java.lang.Long, b: java.lang.Long) => a | b: java.lang.Long)
    }
    b1
  }

  override def eval(buf: Buf): Any = {
    var n = 0L
    val it = buf.values().iterator()
    while (it.hasNext) n += java.lang.Long.bitCount(it.next())
    n
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size() * 16)
    bb.putInt(buf.size())
    buf.forEach { (w: java.lang.Long, m: java.lang.Long) =>
      bb.putLong(w); bb.putLong(m)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf(Math.max(16, n * 2))
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapDistinct =
    copy(child = newChild)
}
