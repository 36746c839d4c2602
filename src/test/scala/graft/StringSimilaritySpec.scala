package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.StringSimilarity
import graft.operators.FuzzyJoin

/** Kernel fixtures for Jaro / Jaro-Winkler. The expected constants
  * are the textbook values, cross-checked against DuckDB's
  * jaro_similarity / jaro_winkler_similarity (same kernel contract —
  * see the q_fuzzy_jw oracle, which diffs the two engines end-to-end
  * on 400 realistic pairs).
  */
class StringSimilaritySpec extends SparkTestBase {

  private def u(s: String) = UTF8String.fromString(s)
  private def jw(a: String, b: String) = StringSimilarity.jaroWinkler(u(a), u(b))
  private def j(a: String, b: String) = StringSimilarity.jaro(u(a), u(b))

  test("jaro/jaro-winkler: textbook fixtures") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8962962962962964) < 1e-12)
    assert(math.abs(jw("duane", "dwayne") - 0.84) < 1e-12)
    assert(math.abs(j("martha", "marhta") - 0.9444444444444445) < 1e-12)
    // below the 0.7 boost threshold: winkler == jaro even with a
    // shared prefix... CRATE/TRACE shares none; kitten/sitting is
    // above threshold but prefix length 0 -> no boost either
    assert(jw("kitten", "sitting") == j("kitten", "sitting"))
  }

  test("jaro edge contract: equal 1, empty 0, no-match 0") {
    assert(j("abc", "abc") == 1.0 && jw("abc", "abc") == 1.0)
    assert(j("", "abc") == 0.0 && j("a", "") == 0.0)
    assert(j("x", "y") == 0.0, "window 0 at length 1: no match possible")
    assert(j("ab", "cd") == 0.0)
  }

  test("prefix boost caps at 4 characters") {
    // identical 8-prefix, one trailing substitution: boost must use
    // l=4, not l=7
    val a = "abcdefgh"
    val b = "abcdefgx"
    val jj = j(a, b)
    assert(math.abs(jw(a, b) - (jj + 4 * 0.1 * (1 - jj))) < 1e-12)
  }

  test("expression evaluates identically interpreted and codegen'd") {
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("kitten", "sitting"), ("abc", "abc"), ("x", "y"))
      .toDF("a", "b")
    val viaExpr = df.select(
        StringSimilarity.jaroWinklerCol(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0))
    val direct = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("kitten", "sitting"), ("abc", "abc"), ("x", "y"))
      .map { case (a, b) => jw(a, b) }
    assert(viaExpr.toSeq == direct, "codegen path == kernel")
  }

  test("expression is null-intolerant (null in -> null out)") {
    import spark.implicits._
    val df = Seq((Some("abc"), None: Option[String]),
      (None: Option[String], Some("x")), (Some("ab"), Some("ab")))
      .toDF("a", "b")
    val out = df.select(
        StringSimilarity.jaroCol(col("a"), col("b")).as("s"))
      .collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 1.0)
  }

  test("jaroWinklerSelfJoin finds planted typo pairs, none below minSim") {
    import spark.implicits._
    // same first char, lengths within the band: the heuristic blocking
    // is complete over this corpus, so brute force is the exact truth
    val rows = Seq(
      (1L, "martha"), (2L, "marhta"), (3L, "marsha"),
      (4L, "melon"), (5L, "xylophone"))
    val out = FuzzyJoin.jaroWinklerSelfJoin(
        rows.toDF("id", "s"), "id", "s", minSim = 0.9, lenBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val brute = (for {
      (i, a) <- rows; (jj, b) <- rows if i < jj
      sim = jw(a, b) if sim >= 0.9 && a(0) == b(0) &&
        math.abs(a.length - b.length) <= 2
    } yield (i, jj) -> sim).toMap
    assert(out == brute)
    assert(out.contains((1L, 2L)) && out.contains((1L, 3L)),
      "planted near-matches found")
    assert(!out.exists(_._2 < 0.9))
  }
}
