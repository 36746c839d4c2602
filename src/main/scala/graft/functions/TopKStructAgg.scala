package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k as a partial-aggregatable native aggregate: keeps the
  * k smallest struct values (natural ascending field order — put the
  * sort key first and the tiebreak id second) in a max-heap of size k.
  *
  * Why this beats `row_number() OVER (PARTITION BY key ...) <= k` for
  * the top-k-per-probe searches: the window formulation exchanges
  * EVERY candidate row (corpus × probes for ADC search) before the
  * rank cut — at a billion codes that shuffle IS the query. As an
  * aggregate, map-side partial aggregation bounds each task's
  * contribution to k rows per key BEFORE the exchange, so the shuffle
  * carries at most tasks × keys × k structs — candidate-set size drops
  * out entirely. Merge combines two heaps (associative, commutative up
  * to the total order), so the result is partitioning-independent
  * whenever the struct's field tuple is a total order (e.g. tiebreak
  * on a unique id).
  *
  * eval returns the ascending-sorted array<struct>; element i is rank
  * i+1 — `posexplode` recovers (rank-1, row).
  */
case class TopKStructAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]] {

  require(k >= 1, s"topk: k must be >= 1, got $k")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType if RowOrdering.isOrderable(s) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an orderable struct column, got $other")
    }

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val asc =
    RowOrdering.createNaturalAscendingOrdering(structType.map(_.dataType).toSeq)
  // max-heap: the heap head is the LARGEST retained struct, evicted
  // first when a smaller candidate arrives
  private lazy val desc: java.util.Comparator[InternalRow] =
    (a: InternalRow, b: InternalRow) => asc.compare(b, a)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def prettyName: String = "topk_struct"

  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    new java.util.PriorityQueue[InternalRow](k + 1, desc)

  private def offer(buf: java.util.PriorityQueue[InternalRow],
      row: InternalRow, copied: Boolean): Unit =
    if (buf.size < k) {
      buf.add(if (copied) row else row.copy())
    } else if (asc.compare(row, buf.peek()) < 0) {
      buf.poll()
      buf.add(if (copied) row else row.copy())
    }

  override def update(buf: java.util.PriorityQueue[InternalRow],
      row: InternalRow): java.util.PriorityQueue[InternalRow] = {
    val v = child.eval(row)
    // copy on retain only: Spark reuses the underlying row buffers
    if (v != null) offer(buf, v.asInstanceOf[InternalRow], copied = false)
    buf
  }

  override def merge(a: java.util.PriorityQueue[InternalRow],
      b: java.util.PriorityQueue[InternalRow]): java.util.PriorityQueue[InternalRow] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next(), copied = true) // b's rows are owned copies
    a
  }

  override def eval(buf: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = buf.toArray(new Array[InternalRow](buf.size))
    java.util.Arrays.sort(arr, (x: InternalRow, y: InternalRow) => asc.compare(x, y))
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
    val proj = UnsafeProjection.create(structType)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val bytes = proj(it.next()).getBytes
      out.writeInt(bytes.length); out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rb = new Array[Byte](len)
      in.readFully(rb)
      val row = new UnsafeRow(structType.size)
      row.pointTo(rb, len)
      buf.add(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopKStructAgg {
  /** Column API: `topKStructs(struct(ord, id, ...), k)` => the k
    * smallest structs, ascending. For descending order negate the
    * ordinal field (or wrap it in a sort-inverting transform). */
  def topKStructs(c: Column, k: Int): Column =
    Bridge.column(TopKStructAgg(Bridge.expression(c), k)
      .toAggregateExpression())
}
