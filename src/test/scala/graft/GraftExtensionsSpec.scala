package graft

import org.apache.spark.sql.SparkSession

/** Config-driven wiring: a session built with
  * spark.sql.extensions=graft.GraftExtensions resolves the native
  * functions with no imperative registration.
  */
class GraftExtensionsSpec extends SparkTestBase {

  test("extensions inject vec_cosine_native and ngrams into SQL") {
    spark // force the shared session first so we can restore it after
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // new session over the SAME SparkContext; extensions apply only
      // at session construction, hence the clear/rebuild dance. The
      // spark.sql.extensions conf is STATIC (read from the SparkContext
      // at first-session build), so tests must use the programmatic
      // withExtensions route; config-driven wiring behaves identically
      // on a fresh cluster.
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(!(s2 eq spark), "must be a fresh session, not the cached one")

      val cos = s2.sql(
        """SELECT vec_cosine_native(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
          |                         array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS c
          |""".stripMargin).head.getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)

      val grams = s2.sql(
        """SELECT pos, ngram
          |FROM (SELECT 'a b c' AS text)
          |LATERAL VIEW ngrams(split(text, ' '), 2) t AS pos, ngram
          |""".stripMargin).collect().map(r => (r.getLong(0), r.getString(1)))
      assert(grams.toSeq === Seq((1L, "a b"), (2L, "b c")))

      // round-3 injected functions: sketches + int8 vector kernels
      val mh = s2.sql(
        """SELECT minhash_array(split('a b a', ' '), 4) AS s,
          |       simhash_array(split('a b a', ' ')) AS h""".stripMargin).head()
      assert(mh.getSeq[Long](0).length === 4)
      val mhAgain = s2.sql(
        "SELECT minhash_array(split('a b a', ' '), 4) AS s").head().getSeq[Long](0)
      assert(mh.getSeq[Long](0) === mhAgain, "seeded sketches are stable")

      val qcos = s2.sql(
        """SELECT vec_cosine_i8(vec_quantize_i8(v), vec_quantize_i8(v)) AS c
          |FROM (SELECT array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)) AS v)
          |""".stripMargin).head().getDouble(0)
      assert(math.abs(qcos - 1.0) < 1e-9, s"self int8 cosine was $qcos")

      val hh = s2.sql(
        """SELECT freq_sketch(t, 10) AS sk
          |FROM (SELECT explode(split('a a a b b c', ' ')) AS t)
          |""".stripMargin).head().getSeq[org.apache.spark.sql.Row](0)
      assert(hh.map(r => (r.getString(0), r.getLong(1))) ===
        Seq(("a", 3L), ("b", 2L), ("c", 1L)))

      // round-4: native mean-pooling aggregate
      val vm = s2.sql(
        """SELECT vec_mean(v) AS m FROM (
          |  SELECT array(CAST(1.0 AS FLOAT), CAST(3.0 AS FLOAT)) AS v
          |  UNION ALL
          |  SELECT array(CAST(3.0 AS FLOAT), CAST(5.0 AS FLOAT)))
          |""".stripMargin).head().getSeq[Double](0)
      assert(vm === Seq(2.0, 4.0))

      // injected optimizer rule: self-cosine strength-reduces, and the
      // rewrite is value-exact incl. the zero-vector NaN case
      // non-foldable input: literal arrays would be constant-folded
      // right through the rewritten expression (which itself proves the
      // rewrite composes with ConstantFolding)
      val selfQ = s2.sql(
        """SELECT vec_cosine_native(v, v) AS c FROM (
          |  SELECT CASE WHEN id = 0
          |              THEN array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT))
          |              ELSE array(CAST(id AS FLOAT), CAST(1.0 AS FLOAT)) END AS v
          |  FROM range(2)) t""".stripMargin)
      assert(selfQ.queryExecution.optimizedPlan.toString.contains("vec_self_cosine"),
        s"RewriteSelfCosine did not fire:\n${selfQ.queryExecution.optimizedPlan}")
      val vals = selfQ.collect().map(_.getDouble(0)).sortBy(!_.isNaN)
      assert(vals(0).isNaN, "zero vector keeps its NaN cosine")
      assert(math.abs(vals(1) - 1.0) < 1e-12)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
