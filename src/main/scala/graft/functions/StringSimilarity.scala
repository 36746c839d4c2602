package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro / Jaro-Winkler string similarity as native codegen
  * expressions — the record-linkage comparator the q-gram
  * edit-distance family (operators/FuzzyJoin) doesn't cover: rank-free
  * typo tolerance weighted toward agreeing prefixes, the standard
  * name/title matcher.
  *
  * Kernel contract (verified against DuckDB's
  * `jaro_winkler_similarity` on transposition, window-limit, and
  * prefix-boost edge cases): match window max(|a|,|b|)/2 - 1,
  * transpositions = half the out-of-order matches, jaro = (m/|a| +
  * m/|b| + (m-t)/m) / 3 in that fold order; Winkler boost l·0.1·(1-j)
  * applies when jaro > 0.7 with l = common prefix capped at 4. Equal
  * strings score 1, either empty scores 0.
  *
  * Byte semantics: the kernel runs over UTF-8 BYTES (no decode pass),
  * matching DuckDB's byte-oriented comparator on ASCII corpora;
  * multi-byte codepoints compare per byte, which under-counts
  * transpositions across non-ASCII text — acceptable for the dedup/
  * linkage blocking this feeds, and identical on both engines for the
  * fixture corpus.
  *
  * Why an Expression: the O(|a|·|b|-window) matching loop with its two
  * mark arrays would box per row as a UDF; here it JIT-compiles into
  * the enclosing whole-stage-codegen function as one static call on
  * the unsafe byte slices.
  */
object StringSimilarity {

  /** Plain Jaro similarity over UTF-8 bytes. */
  def jaro(a: UTF8String, b: UTF8String): Double = {
    if (a.equals(b)) return 1.0
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    (md / l1 + md / l2 + (md - t) / md) / 3.0
  }

  /** Jaro-Winkler: prefix boost above the classic 0.7 threshold. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    val s1 = a.getBytes
    val s2 = b.getBytes
    val cap = math.min(4, math.min(s1.length, s2.length))
    var l = 0
    while (l < cap && s1(l) == s2(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Column wrapper: `jaro_winkler(a, b)` as a codegen expression. */
  def jaroWinklerCol(a: Column, b: Column): Column =
    Bridge.column(JaroWinklerExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Column wrapper: plain `jaro(a, b)`. */
  def jaroCol(a: Column, b: Column): Column =
    Bridge.column(JaroExpr(Bridge.expression(a), Bridge.expression(b)))
}

abstract class StringSimExpr extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  /** Fully-qualified static kernel the generated code calls. */
  protected def kernel: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $kernel($a, $b);")
}

case class JaroWinklerExpr(left: Expression, right: Expression)
    extends StringSimExpr {
  override def prettyName: String = "jaro_winkler_native"
  override protected def kernel: String =
    "graft.functions.StringSimilarity.jaroWinkler"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimilarity.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class JaroExpr(left: Expression, right: Expression)
    extends StringSimExpr {
  override def prettyName: String = "jaro_native"
  override protected def kernel: String =
    "graft.functions.StringSimilarity.jaro"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimilarity.jaro(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
