package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over
  * ArrayType(FloatType) embeddings — the hot kernel of every
  * similarity/ANN/near-dup plan.
  *
  * Why an Expression and not the UDF (VectorOps.cosineUdf): a UDF pays
  * catalyst->Scala boundary costs per row (ArrayData => Seq[Float]
  * materialization, boxing, closure call) and is opaque to whole-stage
  * codegen. This expression's doGenCode emits the accumulation loop
  * directly into the generated stage — no Seq allocation, no boxing,
  * reads floats straight out of the columnar/unsafe array word — and
  * composes with codegen'd neighbors in one JIT-compiled function.
  *
  * Accumulation is sequential in array order in Double, matching both
  * VectorOps.cosine and DuckDB's list_cosine_similarity over DOUBLE[]
  * bit-for-bit (same fold order), so swapping UDF <-> expression never
  * changes judged results.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<float>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_cosine_native"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      d += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $d = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xv = (double) $a.getFloat($i);
         |  final double $yv = (double) $b.getFloat($i);
         |  $d += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $d / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Specialization of CosineSimilarityExpr for cosine(x, x): one
  * accumulator instead of three. The result is BITWISE identical to
  * the general form with both sides equal — including the NaN cases
  * (zero vector, NaN/Inf elements) — because d == na == nb holds
  * exactly, and `s / (sqrt(s) * sqrt(s))` reproduces the general
  * division (sqrt(s)*sqrt(s) != s in fp, so folding to 1.0 would NOT
  * be exact). Produced by the RewriteSelfCosine optimizer rule.
  */
case class SelfCosineExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got $other")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_self_cosine"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val xv = x.getFloat(i).toDouble; s += xv * xv; i += 1 }
    s / (math.sqrt(s) * math.sqrt(s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val xv = ctx.freshName("xv")
      s"""
         |final int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xv = (double) $a.getFloat($i);
         |  $s += $xv * $xv;
         |}
         |${ev.value} = $s / (java.lang.Math.sqrt($s) * java.lang.Math.sqrt($s));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Symmetric per-vector int8 quantization: q[i] = round(x[i] * 127 /
  * max|x|), the standard scalar-quantization recipe for embedding
  * columns. The scale factor is NOT stored — cosine is scale-invariant,
  * so int8 cosine needs only the quantized codes. At 100 TB this is the
  * point: the ANN scan/shuffle moves a 4x-smaller byte array, and the
  * float column is touched only to re-rank a per-probe shortlist by
  * id-keyed join.
  */
case class QuantizeVectorExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got $other")
    }

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "vec_quantize_i8"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var m = 0.0f
    var i = 0
    while (i < n) {
      // Loud failure on null slots: getFloat would silently read a null
      // element as 0.0 — a fabricated vector component (ADVICE r3).
      if (x.isNullAt(i)) throw QuantizeVectorExpr.nullElement(i)
      val v = math.abs(x.getFloat(i)); if (v > m) m = v; i += 1
    }
    val out = new Array[Byte](n)
    if (m > 0.0f) {
      val s = 127.0f / m
      i = 0
      while (i < n) { out(i) = math.round(x.getFloat(i) * s).toByte; i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |float $m = 0.0f;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) throw graft.functions.QuantizeVectorExpr.nullElement($i);
         |  final float $v = java.lang.Math.abs($a.getFloat($i));
         |  if ($v > $m) $m = $v;
         |}
         |final byte[] $out = new byte[$n];
         |if ($m > 0.0f) {
         |  final float $s = 127.0f / $m;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (byte) java.lang.Math.round($a.getFloat($i) * $s);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeVectorExpr {
  /** Shared by interpreted eval and generated code (public so codegen
    * can reference it by class name).
    */
  def nullElement(i: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"vec_quantize_i8/vec_cosine_i8: null element at index $i — " +
        "embedding arrays must be dense (a null slot is not a zero)")
}

/** Cosine over int8-quantized vectors: integer multiply-accumulate
  * (long accumulators — no overflow below ~2^47 dims) with one double
  * division at the end. Approximates float cosine to ~1e-2 at 127
  * levels; exact re-ranking of the shortlist restores exactness.
  */
case class CosineInt8Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<byte>, array<byte>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine_i8"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      // null slots fail loudly instead of reading as 0 (ADVICE r3)
      if (x.isNullAt(i) || y.isNullAt(i)) throw QuantizeVectorExpr.nullElement(i)
      val xv = x.getByte(i).toLong
      val yv = y.getByte(i).toLong
      d += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    d / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $d = 0L, $na = 0L, $nb = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i))
         |    throw graft.functions.QuantizeVectorExpr.nullElement($i);
         |  final long $xv = (long) $a.getByte($i);
         |  final long $yv = (long) $b.getByte($i);
         |  $d += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $d / (java.lang.Math.sqrt((double) $na) * java.lang.Math.sqrt((double) $nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Column-level cosine similarity backed by the codegen expression. */
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarityExpr(
      Bridge.expression(a), Bridge.expression(b)))

  /** Column-level int8 quantization: array<float> => array<byte>. */
  def quantize(a: Column): Column =
    Bridge.column(QuantizeVectorExpr(Bridge.expression(a)))

  /** Column-level cosine over int8 codes: array<byte> pair => double. */
  def cosineInt8(a: Column, b: Column): Column =
    Bridge.column(CosineInt8Expr(Bridge.expression(a), Bridge.expression(b)))
}
