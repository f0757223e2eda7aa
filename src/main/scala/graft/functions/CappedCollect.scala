package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `capped_collect(child, cap)` — a size-bounded `collect_list` with an
  * EXACT group count: returns `struct(cnt: long, vals: array<childType>)`
  * where `cnt` counts every non-null input in the group but `vals`
  * stops accumulating at `cap` elements.
  *
  * This is the memory-safe primitive under the dedup family's
  * hot-bucket cap. Plain `collect_list` has an unbounded,
  * NON-SPILLABLE aggregation buffer: a viral key (10⁷ duplicates of
  * one document at 100 TB) materializes its whole group in one
  * reducer's buffer even if a filter drops it immediately after. The
  * two-phase workaround (pre-count, anti-join, then collect) bounds
  * the buffer but scans the input TWICE — painful when the input is an
  * expensive kernel projection. `capped_collect` restores the single
  * scan: the buffer holds at most `cap` values BY CONSTRUCTION, while
  * `cnt` stays exact, so the consumer can both drop over-cap groups
  * (`cnt > cap` ⇒ `vals` is incomplete and must not be used) and
  * still observe exactly how much was dropped (`cnt` is the true group
  * size — overflow metrics lose nothing).
  *
  * Completeness invariant: if the final `cnt <= cap`, then `vals`
  * contains EVERY value of the group — each partial buffer's local cnt
  * is ≤ the group total, so no partial ever hit the cap, and merge
  * concatenation (also capped) preserved every element. Element order
  * is arrival order (partial, then merge order) and NOT deterministic
  * — consumers must sort, as collect_list consumers already must.
  */
case class CappedCollect(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[CappedCollect.Buffer] with UnaryLike[Expression] {
  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("vals", ArrayType(child.dataType, containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): CappedCollect.Buffer =
    new CappedCollect.Buffer(0L, ArrayBuffer.empty)

  override def update(b: CappedCollect.Buffer, input: InternalRow): CappedCollect.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      b.cnt += 1L
      // copy: eval results may share mutable backing buffers (UTF8String
      // over a reused row, UnsafeRow cursors)
      if (b.vals.length < cap) b.vals += InternalRow.copyValue(v)
    }
    b
  }

  override def merge(b: CappedCollect.Buffer, o: CappedCollect.Buffer): CappedCollect.Buffer = {
    b.cnt += o.cnt
    var i = 0
    while (i < o.vals.length && b.vals.length < cap) {
      b.vals += o.vals(i)
      i += 1
    }
    b
  }

  override def eval(b: CappedCollect.Buffer): Any =
    InternalRow(b.cnt, new GenericArrayData(b.vals.toArray))

  // shuffle representation: the output struct itself, as one UnsafeRow
  private lazy val ser = UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(b: CappedCollect.Buffer): Array[Byte] =
    ser(InternalRow(eval(b))).getBytes

  override def deserialize(bytes: Array[Byte]): CappedCollect.Buffer = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val s = row.getStruct(0, 2)
    val vals = s.getArray(1).toObjectArray(child.dataType)
    new CappedCollect.Buffer(s.getLong(0), ArrayBuffer.from(vals))
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedCollect =
    copy(child = newChild)
  override def prettyName: String = "capped_collect"
}

object CappedCollect {
  /** Exact count + at-most-`cap` collected values (see class doc). */
  final class Buffer(var cnt: Long, val vals: ArrayBuffer[Any])

  /** Column API: `capped_collect(c, cap)` aggregate. */
  def cappedCollect(c: Column, cap: Int): Column =
    GraftColumnBridge.column(
      CappedCollect(GraftColumnBridge.expression(c), cap).toAggregateExpression())
}
