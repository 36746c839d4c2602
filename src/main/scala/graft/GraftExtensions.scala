package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CosineInt8Expr, CosineSimilarityExpr, MinHashArrayExpr,
  NGramsGenerator, QuantizeVectorExpr, SimHashArrayExpr}

/** The library's SparkSessionExtensions entry point: lets any Spark
  * deployment pick up graft's native expressions with
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`),
  * no imperative registration calls needed — the cluster-wide,
  * config-driven wiring a shared platform wants, vs. the per-session
  * `register(spark)` helpers which remain for notebook use.
  *
  * Injects: the vec_cosine_native / ngrams SQL functions, the
  * RewriteSelfCosine optimizer rule, and the TopKPerKey planner
  * strategy.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.RewriteSelfCosine)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)

    ext.injectFunction((
      FunctionIdentifier("vec_cosine_native"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName,
        "vec_cosine_native"),
      (exprs: Seq[Expression]) => CosineSimilarityExpr(exprs(0), exprs(1))))

    ext.injectFunction((
      FunctionIdentifier("ngrams"),
      new ExpressionInfo(classOf[NGramsGenerator].getName, "ngrams"),
      (exprs: Seq[Expression]) => exprs(1) match {
        case Literal(n: Int, IntegerType) => NGramsGenerator(exprs.head, n)
        case other => throw new IllegalArgumentException(
          s"ngrams(tokens, n): n must be an INT literal, got $other")
      }))

    // arity is checked explicitly: builders receive whatever argument
    // list the user wrote, and silently ignoring extras (or throwing a
    // raw IndexOutOfBounds on too few) hides caller mistakes
    def arity(name: String, n: Int, exprs: Seq[Expression]): Unit =
      if (exprs.length != n) throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${exprs.length}")

    ext.injectFunction((
      FunctionIdentifier("minhash_array"),
      new ExpressionInfo(classOf[MinHashArrayExpr].getName, "minhash_array"),
      (exprs: Seq[Expression]) => {
        arity("minhash_array(tokens, n)", 2, exprs)
        exprs(1) match {
          case Literal(n: Int, IntegerType) => MinHashArrayExpr(exprs.head, n)
          case other => throw new IllegalArgumentException(
            s"minhash_array(tokens, n): n must be an INT literal, got $other")
        }
      }))

    ext.injectFunction((
      FunctionIdentifier("simhash_array"),
      new ExpressionInfo(classOf[SimHashArrayExpr].getName, "simhash_array"),
      (exprs: Seq[Expression]) => {
        arity("simhash_array(tokens)", 1, exprs)
        SimHashArrayExpr(exprs.head)
      }))

    ext.injectFunction((
      FunctionIdentifier("vec_quantize_i8"),
      new ExpressionInfo(classOf[QuantizeVectorExpr].getName, "vec_quantize_i8"),
      (exprs: Seq[Expression]) => {
        arity("vec_quantize_i8(vec)", 1, exprs)
        QuantizeVectorExpr(exprs.head)
      }))

    ext.injectFunction((
      FunctionIdentifier("vec_cosine_i8"),
      new ExpressionInfo(classOf[CosineInt8Expr].getName, "vec_cosine_i8"),
      (exprs: Seq[Expression]) => {
        arity("vec_cosine_i8(a, b)", 2, exprs)
        CosineInt8Expr(exprs(0), exprs(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("freq_sketch"),
      new ExpressionInfo(classOf[graft.functions.FrequentItemsAgg].getName,
        "freq_sketch"),
      (exprs: Seq[Expression]) => {
        arity("freq_sketch(col, capacity)", 2, exprs)
        exprs(1) match {
          case Literal(n: Int, IntegerType) =>
            graft.functions.FrequentItemsAgg(exprs.head, n,
              itemField = "tok", countField = "cnt").toAggregateExpression()
          case other => throw new IllegalArgumentException(
            s"freq_sketch(col, capacity): capacity must be an INT literal, got $other")
        }
      }))

    ext.injectFunction((
      FunctionIdentifier("vec_mean"),
      new ExpressionInfo(classOf[graft.functions.VectorMeanAgg].getName,
        "vec_mean"),
      (exprs: Seq[Expression]) => {
        arity("vec_mean(vec)", 1, exprs)
        graft.functions.VectorMeanAgg(exprs.head).toAggregateExpression()
      }))
  }
}
