package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Compiled vector kernels over ArrayType(FloatType) embeddings.
  *
  * Why UDFs and not SQL higher-order functions: the HOF path
  * (AGGREGATE(ZIP_WITH(...))) interprets a lambda per element —
  * measured 21–49 s for 2M pairs × 64 dims at sf0.1 (BASELINE.md),
  * ~100× slower than this JIT-compiled while-loop. A UDF is opaque to
  * Catalyst but these kernels sit at the top of the pair pipeline
  * (nothing to push below them), so the only codegen cost is the
  * boundary, not lost optimization.
  *
  * All accumulation is sequential in array order, in Double — bitwise
  * deterministic and matching DuckDB's list_cosine_similarity over
  * DOUBLE[] (verified via the oracle diff).
  */
object VectorOps {

  def dot(a: Seq[Float], b: Seq[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = a.length
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def norm(a: Seq[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = a.length
    while (i < n) { val x = a(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  val dotUdf: UserDefinedFunction = udf(dot _)
  val normUdf: UserDefinedFunction = udf(norm _)
  val cosineUdf: UserDefinedFunction = udf(cosine _)

  /** Register vec_dot / vec_norm / vec_cosine for SQL use (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("vec_dot", dotUdf)
    spark.udf.register("vec_norm", normUdf)
    spark.udf.register("vec_cosine", cosineUdf)
  }
}
