package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** HyperLogLog register sketches as first-class binary columns — the
  * HyperANF building block (Boldi, Rosa & Vigna, "HyperANF:
  * approximating the neighbourhood function of very large graphs",
  * WWW 2011): a vertex's h-hop reach set is carried as an m = 2^p
  * byte register array, advanced one hop by UNIONING (elementwise
  * max) the registers of its neighbours. Union is associative,
  * commutative, and idempotent, so the per-hop advance is an ordinary
  * partial-aggregatable groupBy — each map task pre-merges its
  * vertices' messages and the shuffle carries at most one m-byte
  * sketch per (task, vertex), never the reach SETS themselves. That
  * is the whole trick: the exact h-hop closure is |ball|-sized per
  * vertex (quadratic in community size), the sketch is a CONSTANT
  * m bytes per vertex at any graph size.
  *
  * Three pieces, all over plain BinaryType registers so they compose
  * with checkpoints/persistence like any other column:
  *  - [[HllInitExpr]]  : long key -> singleton sketch {key}
  *  - [[HllUnionAgg]]  : aggregate union of sketches (elementwise max)
  *  - [[HllCountExpr]] : sketch -> cardinality estimate (double)
  *
  * Hashing is xxhash64 at a fixed seed — deterministic across runs
  * and partitions, the repo-wide portability contract.
  * The estimator is the standard HLL form: alpha_m · m² / Σ 2^-reg
  * with linear counting below 2.5·m (64-bit hashes need no
  * large-range correction). Error ≈ 1.04/√m — p=12 (4 KiB/vertex)
  * gives ~1.6 %, and small balls sit in the linear-counting regime
  * where the estimate is near-exact.
  */
object HllReach {

  /** Fixed xxhash64 seed — determinism is the contract here. */
  val Seed = 42L

  /** Insert one already-hashed 64-bit key into a register array. */
  def insertHashed(reg: Array[Byte], p: Int, h: Long): Unit = {
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    // rank of the first set bit among the remaining 64-p hash bits
    val rho = if (w == 0) (64 - p + 1) else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (rho > (reg(idx) & 0xff)) reg(idx) = rho.toByte
  }

  /** 2^-r for every possible register value, precomputed once: the
    * estimator sums m of these per call, and callers evaluating many
    * sketches (the harmonic driver fast path runs V×hops estimates)
    * made Math.pow the hot op. Table values ARE Math.pow outputs, and
    * the summation order is unchanged (register-index order), so every
    * estimate is bit-identical to the direct-pow form. */
  private val Pow2Neg: Array[Double] =
    Array.tabulate(256)(r => java.lang.Math.pow(2.0, -r))

  /** Standard HLL cardinality estimate over m = reg.length registers
    * (requires m >= 128 so one alpha formula applies — enforced by the
    * p >= 7 bound on every entry point). */
  def estimate(reg: Array[Byte]): Double = {
    val m = reg.length
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = reg(i) & 0xff
      sum += Pow2Neg(r)
      if (r == 0) zeros += 1
      i += 1
    }
    val e = alpha * m * m / sum
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }

  private def requireP(p: Int): Unit =
    require(p >= 7 && p <= 16, s"hll precision p must be in [7, 16], got $p")

  /** Column API: singleton sketch containing the long `key`. */
  def hllInit(key: Column, p: Int): Column = {
    requireP(p)
    Bridge.column(HllInitExpr(Bridge.expression(key), p))
  }

  /** Column API: aggregate union of sketches. */
  def hllUnion(reg: Column, p: Int): Column = {
    requireP(p)
    Bridge.column(HllUnionAgg(Bridge.expression(reg), p).toAggregateExpression())
  }

  /** Column API: cardinality estimate of a sketch. */
  def hllCount(reg: Column): Column =
    Bridge.column(HllCountExpr(Bridge.expression(reg)))
}

/** `hll_init(key, p)`: a fresh m = 2^p register array with the single
  * key inserted (keyed by xxhash64 of the value at the fixed seed, any
  * atomic type). Runs once per vertex at hop 0 — CodegenFallback costs
  * one boundary on a vertex-sized frame, not a hot path. */
case class HllInitExpr(child: Expression, p: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_init"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.LongType
       | org.apache.spark.sql.types.IntegerType
       | org.apache.spark.sql.types.StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint/int/string key, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val reg = new Array[Byte](1 << p)
    HllReach.insertHashed(reg, p,
      XxHash64Function.hash(input, child.dataType, HllReach.Seed))
    reg
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `hll_count(reg)`: the cardinality estimate of a sketch. */
case class HllCountExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "hll_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    HllReach.estimate(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Aggregate union of HLL sketches: the buffer IS an m-byte register
  * array, update/merge are elementwise max — associative, commutative,
  * idempotent, so map-side partial aggregation applies and the result
  * is partitioning-independent. serialize is the identity. */
case class HllUnionAgg(child: Expression, p: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_union"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch column, got $other")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  private def unionInto(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(b.length == a.length,
      s"$prettyName: register width mismatch (${b.length} vs ${a.length})")
    var i = 0
    while (i < a.length) {
      if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def update(buf: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) unionInto(buf, v.asInstanceOf[Array[Byte]]) else buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = unionInto(a, b)

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
