package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

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

object VectorExpressions {

  /** Column-level cosine similarity backed by the codegen expression. */
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarityExpr(
      Bridge.expression(a), Bridge.expression(b)))
}
