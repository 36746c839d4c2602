package graft

import org.apache.spark.sql.functions._

import graft.operators.{RankEval, Resample, Spectral, TextAnalysis}

/** Hand-computed fixtures for the round-8 operators: power-iteration
  * spectral projection, truncated RBO, stepped time-decay sums,
  * cross-doc duplicate-n-gram fraction, and vocabulary Jaccard.
  */
class AnalyticsOpsSpec extends SparkTestBase {

  // ---- Spectral ----

  test("principalComponent is unit-norm and finds the dominant axis") {
    import spark.implicits._
    // variance concentrated on axis 0: component must align with e0
    val vecs = Seq(
      (1L, Array(10.0f, 0.1f, 0.0f)),
      (2L, Array(-9.0f, 0.2f, 0.1f)),
      (3L, Array(8.0f, -0.1f, 0.0f)),
      (4L, Array(-11.0f, 0.0f, -0.1f)),
    ).toDF("vec_id", "embedding")
    val c = Spectral.principalComponent(vecs, "vec_id", "embedding", iters = 5)
    val norm = math.sqrt(c.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"unit norm, got $norm")
    assert(math.abs(c.head.abs - 1.0) < 0.01,
      s"dominant direction is axis 0, got $c")
  }

  test("principalProjection preserves rows and bounds |proj| by |x|") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(3.0f, 4.0f)), // |x| = 5
      (2L, Array(0.0f, 0.5f)),
      (3L, Array(-1.0f, 2.0f)),
    ).toDF("vec_id", "embedding")
    val out = Spectral.principalProjection(vecs, "vec_id", "embedding", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.size == 3)
    // Cauchy-Schwarz against the unit component (rounding slack)
    assert(math.abs(out(1L)) <= 5.0 + 1e-3)
    assert(math.abs(out(2L)) <= 0.5 + 1e-3)
  }

  test("principalComponent rejects zero corpora loudly") {
    import spark.implicits._
    val vecs = Seq((1L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Spectral.principalComponent(vecs, "vec_id", "embedding", iters = 1)
    }
    assert(e.getMessage.contains("zero matvec"))
  }

  // ---- RankEval ----

  test("rbo: identical lists score the full truncated mass, disjoint score 0") {
    import spark.implicits._
    val k = 5; val p = 0.9
    val a = (1 to k).map(r => ("q1", s"item$r", r)).toDF("q", "item", "rnk")
    val b = (1 to k).map(r => ("q1", s"item$r", r)).toDF("q", "item", "rnk")
    val full = RankEval.rbo(a, b, "q", "item", "rnk", k, p)
      .collect()(0).getDouble(1)
    // identical lists: every depth overlaps fully -> Σ (1-p) p^(d-1)
    val expect = (1 to k).map(d => (1 - p) * math.pow(p, d - 1)).sum
    assert(math.abs(full - expect) < 1e-6, s"got $full want $expect")

    val c = (1 to k).map(r => ("q1", s"other$r", r)).toDF("q", "item", "rnk")
    val zero = RankEval.rbo(a, c, "q", "item", "rnk", k, p)
      .collect()(0).getDouble(1)
    assert(zero == 0.0)
  }

  test("rbo weights top ranks heavier: a swap at depth 1 costs more than at depth k") {
    import spark.implicits._
    val k = 4; val p = 0.8
    val base = (1 to k).map(r => ("q", s"i$r", r))
    def score(other: Seq[(String, String, Int)]): Double =
      RankEval.rbo(base.toDF("q", "item", "rnk"),
        other.toDF("q", "item", "rnk"), "q", "item", "rnk", k, p)
        .collect()(0).getDouble(1)
    // replace rank-1 item vs replace rank-k item with a foreign item
    val swapTop = Seq(("q", "xx", 1)) ++ base.tail
    val swapBot = base.init ++ Seq(("q", "yy", k))
    assert(score(swapTop.map(t => (t._1, t._2, t._3))) <
      score(swapBot.map(t => (t._1, t._2, t._3))))
  }

  test("rboWeights: contribution decreases with first-overlap depth") {
    val w = RankEval.rboWeights(10, 0.9)
    assert(w.size == 10)
    assert(w == w.sorted.reverse, "monotone decreasing")
    assert(w.last > 0.0)
  }

  // ---- decayedSum ----

  test("decayedSum: stepped dyadic weights, age clamping, null values") {
    import spark.implicits._
    val df = Seq(
      ("a", java.sql.Timestamp.valueOf("2024-01-31 00:00:00"), Some(8.0)),  // age 1d  -> k=0, w=1
      ("a", java.sql.Timestamp.valueOf("2024-01-20 00:00:00"), Some(8.0)),  // age 12d -> k=1, w=1/2
      ("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Some(8.0)),  // age 31d -> k=4, w=1/16
      ("a", java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), Some(8.0)),  // future  -> k=0, w=1
      ("a", java.sql.Timestamp.valueOf("2024-01-31 00:00:00"), None),       // null value
    ).toDF("k", "ts", "value")
    val r = Resample.decayedSum(df, Seq("k"), "ts", "value",
      asOf = "2024-02-01", halfLifeDays = 7).collect()(0)
    assert(r.getDouble(r.fieldIndex("decayed_sum")) == 8.0 + 4.0 + 0.5 + 8.0)
    assert(r.getDouble(r.fieldIndex("raw_sum")) == 32.0)
    assert(r.getLong(r.fieldIndex("n_rows")) == 5L)
  }

  // ---- duplicateNgramFraction ----

  test("duplicateNgramFraction: shared spans counted positionally, short docs NULL") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f"),   // spans: "a b c d e", "b c d e f"
      (2L, "a b c d e zz"),  // spans: "a b c d e", "b c d e zz"
      (3L, "x y"),           // too short: 0 spans
    ).toDF("doc_id", "text")
    val out = TextAnalysis.duplicateNgramFraction(df, "doc_id", "text",
      n = 5, minDocs = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 2L && out(1L).getLong(2) == 1L)
    assert(out(1L).getDouble(3) == 0.5)
    assert(out(2L).getLong(2) == 1L)
    assert(out(3L).getLong(1) == 0L && out(3L).isNullAt(3),
      "short doc: 0 spans, NULL fraction")
  }

  // ---- vocabJaccard ----

  test("vocabJaccard: exact set overlap over the full pair grid") {
    import spark.implicits._
    val df = Seq(
      ("s1", "a b c"),
      ("s2", "b c d"),
      ("s3", "x y"),
    ).toDF("source", "text")
    val out = TextAnalysis.vocabJaccard(df, "source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out.size == 3, "3 unordered pairs")
    assert(out(("s1", "s2")) == ((2L, 4L, 0.5)))
    assert(out(("s1", "s3"))._1 == 0L, "zero-overlap pair still present")
    assert(out(("s1", "s3"))._3 == 0.0)
  }
}
