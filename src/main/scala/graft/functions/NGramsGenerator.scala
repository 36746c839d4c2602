package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-generating function (SURVEY.md §2.9 U3): a native
  * Catalyst `Generator` emitting (pos, ngram) rows per input token
  * array — the UDTF extension surface, demonstrated beyond built-in
  * explode.
  *
  * Usage (SQL): `LATERAL VIEW ngrams(split(lower(text),' '), 2) t AS
  * pos, ngram`.
  *
  * Scale: generators run inside the `Generate` physical operator —
  * rows stream through executors with no shuffle and no driver
  * involvement; output fan-out is (tokens-n+1) per doc, same cost
  * class as explode. CodegenFallback only costs the generator boundary
  * (same as built-in explode's non-codegen path in Generate outer).
  */
case class NGramsGenerator(tokens: Expression, n: Int)
    extends Generator with CodegenFallback {

  require(n >= 1, s"ngram size must be >= 1, got $n")

  override def children: Seq[Expression] = Seq(tokens)

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = tokens.eval(input).asInstanceOf[ArrayData]
    if (arr == null) Nil
    else {
      val toks = arr.toArray[UTF8String](StringType)
      val sep = UTF8String.fromString(" ")
      (0 to toks.length - n).map { i =>
        InternalRow(i + 1L,
          UTF8String.concatWs(sep, toks.slice(i, i + n).toIndexedSeq: _*))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(tokens = newChildren.head)
}

object NGramsGenerator {

  /** Register `ngrams(tokenArray, n)` in the session's function
    * registry; `n` must be an integer literal (resolved at plan time).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngrams",
      { exprs =>
        val n = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"ngrams(tokens, n): n must be an INT literal, got $other")
        }
        NGramsGenerator(exprs.head, n)
      },
      "built-in")
}
