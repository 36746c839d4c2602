package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass 64-bit SimHash as a native TypedImperativeAggregate: the
  * buffer holds the 64 per-bit vote sums; each token OCCURRENCE votes
  * ±1 per bit of its hash (occurrence voting == frequency weighting,
  * so this equals the former groupBy(doc, tok)+weighted-sum
  * formulation while deleting that intermediate shuffle — one hash
  * aggregation instead of two). eval packs vote signs into the final
  * signature (bit set iff votes > 0, matching the expression version).
  */
case class SimHashAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      // matches expression-level xxhash64(tok): single child chained
      // from the fixed 42L seed
      val h = XxHash64Function.hash(v.asInstanceOf[UTF8String], StringType, 42L)
      var b = 0
      while (b < 64) {
        buf(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var b = 0
    while (b < 64) { if (buf(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * 64)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** Column API: 64-bit SimHash signature of the grouped token column. */
  def simhash(c: Column): Column =
    Bridge.column(SimHashAgg(Bridge.expression(c)).toAggregateExpression())
}

/** Scalar SimHash over a pre-tokenized `array<string>` column: the same
  * signature as [[SimHashAgg]] (votes are a commutative sum, so folding
  * the array in row order equals aggregating exploded occurrence rows)
  * but computed per ROW — when tokens come from `split(lower(text))`
  * the whole SimHash stage is a narrow codegen'd projection with zero
  * shuffles, mirroring MinHashArrayExpr's treatment of MinHash.
  * Occurrence voting means the input array must NOT be deduplicated
  * (frequency weighting is the point).
  */
case class SimHashArrayExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got $other")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_array"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val votes = new Array[Long](64)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h = XxHash64Function.hash(arr.getUTF8String(t), StringType, 42L)
        var b = 0
        while (b < 64) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
          b += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val votes = ctx.freshName("votes")
      val nt = ctx.freshName("nt")
      val t = ctx.freshName("t")
      val tok = ctx.freshName("tok")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val sig = ctx.freshName("sig")
      s"""
         |final long[] $votes = new long[64];
         |final int $nt = $a.numElements();
         |for (int $t = 0; $t < $nt; $t++) {
         |  if (!$a.isNullAt($t)) {
         |    final UTF8String $tok = $a.getUTF8String($t);
         |    final long $h = $xxh.hashUTF8String($tok, 42L);
         |    for (int $b = 0; $b < 64; $b++) {
         |      $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1L : -1L;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashArrayExpr {
  /** Column API: scalar `simhashArray(tokens)` => bigint signature. */
  def simhashArray(c: Column): Column =
    Bridge.column(SimHashArrayExpr(Bridge.expression(c)))
}
