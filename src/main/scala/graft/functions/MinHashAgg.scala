package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash sketch as a native TypedImperativeAggregate: the
  * buffer is the running Array[Long] of per-permutation minima,
  * updated in place per input token and merged elementwise — ONE
  * aggregate function evaluating TWO xxhash64 kernels per token per
  * 64-permutation block, versus `nHashes` separate `min(...)`
  * aggregate columns in an expression formulation. Map-side partial
  * aggregation applies like any algebraic agg: each task ships one
  * `8*nHashes`-byte sketch per doc, not its tokens.
  *
  * Hash family: permutation i (block b = i/64, rotation r = i%64) is
  * h1_b XOR rotl(h2_b, r), where (h1_b, h2_b) are the seeded xxhash64
  * chain at tags (2b+1, 2b+2). Block 0 is byte-identical to the
  * original <=64-permutation family (tags 1 and 2), so persisted
  * signatures with nHashes <= 64 remain compatible; blocks re-seed so
  * any nHashes is supported without rotation reuse.
  */
case class MinHashAgg(child: Expression, nHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(nHashes >= 1, "nHashes must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(nHashes)(Long.MaxValue)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) MinHashAgg.sketchToken(v.asInstanceOf[UTF8String], buf, nHashes)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * nHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(nHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** Column API: `minhash(col, n)` aggregate producing array<bigint>. */
  def minhash(c: Column, nHashes: Int): Column =
    Bridge.column(MinHashAgg(Bridge.expression(c), nHashes)
      .toAggregateExpression())

  /** Folds one token into a running sketch — the single definition of
    * the hash family, shared by the aggregate (per-token-row) and the
    * scalar array expression (per-doc-row) so both produce identical
    * signatures.
    */
  private[functions] def sketchToken(tok: UTF8String, buf: Array[Long],
      nHashes: Int): Unit = {
    val seedHash = XxHash64Function.hash(tok, StringType, 42L)
    var b = 0
    while (b * 64 < nHashes) {
      val h1 = XxHash64Function.hash(2 * b + 1, IntegerType, seedHash)
      val h2 = XxHash64Function.hash(2 * b + 2, IntegerType, seedHash)
      val end = math.min(64, nHashes - b * 64)
      var r = 0
      while (r < end) {
        val i = b * 64 + r
        val hi = h1 ^ java.lang.Long.rotateLeft(h2, r)
        if (hi < buf(i)) buf(i) = hi
        r += 1
      }
      b += 1
    }
  }
}

/** Scalar MinHash over a pre-tokenized `array<string>` column: the same
  * sketch as [[MinHashAgg]] (hash family shared via
  * `MinHashAgg.sketchToken`) but computed per ROW instead of per
  * group — no explode, no distinct, no aggregation shuffle. When the
  * token set of a document is a per-row function of the document (the
  * common case: `array_distinct(split(lower(text), ' '))`), the entire
  * signature stage becomes a narrow codegen'd projection; the first
  * shuffle in an LSH dedup plan is then the banded candidate join
  * itself, which is the minimum the algorithm requires.
  */
case class MinHashArrayExpr(child: Expression, nHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(nHashes >= 1, "nHashes must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_array"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val buf = Array.fill(nHashes)(Long.MaxValue)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t))
        MinHashAgg.sketchToken(arr.getUTF8String(t), buf, nHashes)
      t += 1
    }
    new GenericArrayData(buf)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val buf = ctx.freshName("buf")
      val nt = ctx.freshName("nt")
      val t = ctx.freshName("t")
      val tok = ctx.freshName("tok")
      val seedHash = ctx.freshName("seedHash")
      val b = ctx.freshName("b")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val end = ctx.freshName("end")
      val r = ctx.freshName("r")
      val hi = ctx.freshName("hi")
      // XXH64.hashInt/hashUnsafeBytesBlock are the same kernels
      // XxHash64Function dispatches to in the interpreted path, so
      // codegen and eval agree bit-for-bit.
      s"""
         |final long[] $buf = new long[$nHashes];
         |java.util.Arrays.fill($buf, Long.MAX_VALUE);
         |final int $nt = $a.numElements();
         |for (int $t = 0; $t < $nt; $t++) {
         |  if (!$a.isNullAt($t)) {
         |    final UTF8String $tok = $a.getUTF8String($t);
         |    final long $seedHash = $xxh.hashUTF8String($tok, 42L);
         |    for (int $b = 0; $b * 64 < $nHashes; $b++) {
         |      final long $h1 = $xxh.hashInt(2 * $b + 1, $seedHash);
         |      final long $h2 = $xxh.hashInt(2 * $b + 2, $seedHash);
         |      final int $end = java.lang.Math.min(64, $nHashes - $b * 64);
         |      for (int $r = 0; $r < $end; $r++) {
         |        final long $hi = $h1 ^ Long.rotateLeft($h2, $r);
         |        if ($hi < $buf[$b * 64 + $r]) $buf[$b * 64 + $r] = $hi;
         |      }
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($buf);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashArrayExpr {
  /** Column API: scalar `minhashArray(tokens, n)` => array<bigint>. */
  def minhashArray(c: Column, nHashes: Int): Column =
    Bridge.column(MinHashArrayExpr(Bridge.expression(c), nHashes))
}
