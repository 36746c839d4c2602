package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-key character-n-gram counting + bounded top-K rank cut as ONE
  * native aggregate (r19, guide §4.2 "do the heavy lifting in native
  * code" / §2.3 "aggregate before you shuffle").
  *
  * Replaces, result-identically, the languageIdTrained shape
  *
  * {{{
  *   explode(transform(sequence(1, length(_t)), i -> substring(_t,i,n)))
  *     -> groupBy(_key, _g).count()                // exchange 1
  *     -> groupBy(_key).agg(topKStructs(...))      // exchange 2
  * }}}
  *
  * with `groupBy(_key).agg(gramTopK(_t, n, k))`: each input row's
  * normalized text is sliced ONCE in native code into code-point
  * n-grams folded straight into a per-key count map, so the
  * char-level explode (|text| rows per doc) never exists, the
  * (key, gram) exchange disappears, and the single remaining
  * exchange ships one vocabulary-bounded map per key per task.
  *
  * Equality inventory vs the replaced plan:
  *   - grams: Spark's `substring(_t, i, n)` is CODE-POINT based and
  *     the `length(_g) = n` filter keeps exactly the windows with n
  *     full code points — replicated by slicing on a code-point
  *     offset table (String.substring over UTF-16 offsets of code
  *     point boundaries yields the identical string).
  *   - null text contributes nothing (explode of null produced no
  *     rows); a key whose every text is null evals to an EMPTY array,
  *     and the downstream posexplode emits no rows — exactly the
  *     absent-key behavior of the explode shape.
  *   - counts are exact longs; the cut keeps the K smallest
  *     (-count, gram) structs under (long asc, UTF8-BINARY asc) —
  *     TopKStructAgg's total order term for term (gram is unique per
  *     key, so the order is total and merge-order-independent).
  *   - output rows are struct(_nc = -count, _g = gram), ascending —
  *     the array TopKStructAgg produced, so `posexplode` positions
  *     recover the same ranks.
  */
case class GramTopKAgg(child: Expression, n: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Array[Long]]] {

  require(n >= 1 && n <= 8, s"gram_topk: n must be in [1, 8], got $n")
  require(k >= 1, s"gram_topk: k must be >= 1, got $k")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string column, got $other")
    }

  private val structType = StructType(Seq(
    StructField("_nc", LongType, nullable = false),
    StructField("_g", StringType, nullable = true)))

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def prettyName: String = "gram_topk_struct"

  override def createAggregationBuffer(): java.util.HashMap[String, Array[Long]] =
    new java.util.HashMap[String, Array[Long]]()

  override def update(buf: java.util.HashMap[String, Array[Long]],
      row: InternalRow): java.util.HashMap[String, Array[Long]] = {
    val v = child.eval(row)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      // code-point boundary offsets (UTF-16 indices); gram i spans
      // code points [i, i+n) = chars [off(i), off(i+n)) — exactly
      // Spark's code-point substring(_t, i+1, n) kept by length = n
      val len = s.length
      var cp = 0
      val offs = new Array[Int](len + 1)
      var i = 0
      while (i < len) {
        offs(cp) = i
        i += Character.charCount(s.codePointAt(i))
        cp += 1
      }
      offs(cp) = len
      var g = 0
      while (g + n <= cp) {
        val gram = s.substring(offs(g), offs(g + n))
        val cell = buf.computeIfAbsent(gram, _ => new Array[Long](1))
        cell(0) += 1L
        g += 1
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[String, Array[Long]],
      b: java.util.HashMap[String, Array[Long]]): java.util.HashMap[String, Array[Long]] = {
    b.forEach { (gram, cnt) =>
      val cell = a.computeIfAbsent(gram, _ => new Array[Long](1))
      cell(0) += cnt(0)
    }
    a
  }

  override def eval(buf: java.util.HashMap[String, Array[Long]]): Any = {
    // K smallest (-count, gram-UTF8-binary) — the TopKStructAgg order
    val cmp = new java.util.Comparator[(Long, String)] {
      override def compare(x: (Long, String), y: (Long, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else java.util.Arrays.compareUnsigned(
          x._2.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          y._2.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    // max-heap of the retained K (head = largest kept, evicted first)
    val heap = new java.util.PriorityQueue[(Long, String)](k + 1,
      cmp.reversed())
    buf.forEach { (gram, cnt) =>
      val cand = (-cnt(0), gram)
      if (heap.size < k) heap.add(cand)
      else if (cmp.compare(cand, heap.peek()) < 0) {
        heap.poll(); heap.add(cand)
      }
    }
    val arr = heap.toArray(new Array[(Long, String)](heap.size))
    java.util.Arrays.sort(arr, cmp)
    new GenericArrayData(arr.map { case (nc, g) =>
      new GenericInternalRow(Array[Any](nc, UTF8String.fromString(g)))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.HashMap[String, Array[Long]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { (gram, cnt) =>
      out.writeUTF(gram) // grams are <= 8 code points, far under the cap
      out.writeLong(cnt(0))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Array[Long]] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val size = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < size) {
      val gram = in.readUTF()
      val cnt = new Array[Long](1)
      cnt(0) = in.readLong()
      buf.put(gram, cnt)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object GramTopKAgg {
  /** `gramTopK(normalizedText, n, k)`: array of the k most frequent
    * code-point n-grams across the key's rows (grams sliced per row,
    * never spanning rows; counts summed) as ascending
    * struct(_nc = -count, _g) — drop-in for the explode + count +
    * topKStructs pipeline. */
  def gramTopK(c: Column, n: Int, k: Int): Column =
    Bridge.column(GramTopKAgg(Bridge.expression(c), n, k)
      .toAggregateExpression())
}
