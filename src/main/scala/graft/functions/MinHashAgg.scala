package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
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

  /** Replicates expression-level `xxhash64(tok, lit(seedTag))`: Spark's
    * variadic xxhash64 chains child hashes from the fixed 42L seed.
    */
  private def chainedHash(tok: UTF8String, seedTag: Int): Long =
    XxHash64Function.hash(seedTag, IntegerType,
      XxHash64Function.hash(tok, StringType, 42L))

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val tok = v.asInstanceOf[UTF8String]
      var b = 0
      while (b * 64 < nHashes) {
        val h1 = chainedHash(tok, 2 * b + 1)
        val h2 = chainedHash(tok, 2 * b + 2)
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
}
