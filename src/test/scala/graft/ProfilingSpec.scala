package graft

import graft.operators.Profiling
import org.apache.spark.sql.functions.col

class ProfilingSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    (10L, Some("b"), Some(2.5)),
    (2L, None, Some(1.0)),
    (10L, Some("a"), None),
    (7L, Some("a"), Some(9.0))).toDF("id", "s", "x")

  test("exact profile: counts, nulls, distincts, native-type min/max") {
    val got = Profiling.profile(df, Seq("id", "s", "x"), exactDistinct = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    // min is numeric 2, not lexicographic "10"
    assert(got("id") === ((4L, 0L, 3L, "2", "10")))
    assert(got("s") === ((4L, 1L, 2L, "a", "b")))
    assert(got("x") === ((4L, 1L, 3L, "1.0", "9.0")))
  }

  test("duplicate column requests are rejected") {
    val ex = intercept[IllegalArgumentException] {
      Profiling.profile(df, Seq("id", "id"))
    }
    assert(ex.getMessage.contains("duplicate"), ex.getMessage)
  }

  test("approx (HLL) profile stays within sketch error on small data") {
    val got = Profiling.profile(df, Seq("id"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(got("id") - 3L) <= 1, s"hll said ${got("id")}")
  }

  test("single aggregation pass: plan has exactly one final hash/sort agg over the scan") {
    // exact-distinct over k columns plans one Expand (xk rows), not k scans
    val plan = Profiling.profile(df, Seq("id", "s"), exactDistinct = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
    val scans = "LocalTableScan".r.findAllIn(plan).length
    assert(scans === 1, s"expected one scan, plan:\n$plan")
  }

  test("keySkew: hand-checked distribution stats, hot key dominates top_share") {
    import spark.implicits._
    // key 'hot' x6, 'a' x2, 'b' x1, 'c' x1 => 10 rows, 4 keys
    val skewed = (Seq.fill(6)("hot") ++ Seq("a", "a", "b", "c"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "id")
    val r = Profiling.keySkew(skewed, Seq("k")).collect().head
    assert(r.getLong(0) === 10L && r.getLong(1) === 4L && r.getLong(2) === 6L)
    assert(math.abs(r.getDouble(3) - 2.5) < 1e-12, "avg rows per key")
    assert(math.abs(r.getDouble(4) - 0.6) < 1e-12, "hot key owns 60%")
    // uniform data: top_share ~ 1/n_keys
    val uniform = (0 until 12).map(i => (s"k${i % 4}", i.toLong)).toDF("k", "id")
    val u = Profiling.keySkew(uniform, Seq("k")).collect().head
    assert(math.abs(u.getDouble(4) - 0.25) < 1e-12)
    // internal count column never clobbers a caller column of that name
    val tricky = uniform.withColumnRenamed("k", "_skew0")
    assert(Profiling.keySkew(tricky, Seq("_skew0")).collect().head.getLong(1) === 4L)
  }

  test("checkConstraints: violation counts, null predicate = violation, one pass") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = Seq[(java.lang.Long, String)](
      (10L, "ok"), (200L, "ok"), (null, "ok"), (5L, "bad"),
    ).toDF("v", "s")
    val out = Profiling.checkConstraints(d, Seq(
        "v_small" -> (col("v") < 100),   // 200 fails, null fails -> 2
        "s_ok" -> (col("s") === "ok"),   // 1 violation
        "all_pass" -> col("v").isNotNull.or(col("s") === "ok"))) // 0
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out("v_small") === ((4L, 2L, false)))
    assert(out("s_ok") === ((4L, 1L, false)))
    assert(out("all_pass") === ((4L, 0L, true)))
    // one aggregation pass: a single scan in the plan tree
    val p = Profiling.checkConstraints(d, Seq("x" -> col("v").isNotNull))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("Scan".r.findAllIn(p.split("\n\n")(0)).size === 1,
      s"rules must share one scan:\n$p")
  }

  test("discretizeEquiDepth: row-preserving, consistent with the histogram") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = ((0 until 100).map(i => java.lang.Double.valueOf(i.toDouble))
      :+ null.asInstanceOf[java.lang.Double]).toDF("x")
    val out = Profiling.discretizeEquiDepth(d, "x", 4, exact = true)
    assert(out.count() === 101L, "row-preserving incl. the null row")
    assert(out.filter(col("x").isNull && col("bucket").isNull).count() === 1L)
    // per-bucket counts equal the histogram's
    val byBucket = out.filter(col("bucket").isNotNull)
      .groupBy("bucket").count().collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    val hist = Profiling.equiDepthHistogram(d, "x", 4, exact = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byBucket === hist)
  }

  test("equiDepthHistogram: exact path balances untied values; approx close") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = (0 until 100).map(i => i.toDouble).toDF("x")
    val exact = Profiling.equiDepthHistogram(d, "x", 4, exact = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(exact.keySet === Set(0L, 1L, 2L, 3L))
    assert(exact.values.map(_._1).toSeq.forall(_ === 25L),
      s"untied uniform values must split exactly: $exact")
    assert(exact(0L)._2 === 0.0 && exact(3L)._3 === 99.0)
    // bucket ranges must not overlap
    assert(exact(0L)._3 <= exact(1L)._2 && exact(2L)._3 <= exact(3L)._2)
    // approx path: every bucket within 2x of perfect depth
    val approx = Profiling.equiDepthHistogram(d, "x", 4)
      .collect().map(r => r.getLong(1))
    assert(approx.sum === 100L)
    assert(approx.forall(n => n >= 12L && n <= 40L), approx.toSeq.toString)
  }

  test("correlations: monotone nonlinear -> spearman 1, pearson < 1; ties averaged") {
    import spark.implicits._
    // y = x^3: perfectly monotone (spearman exactly 1) but not linear
    val mono = (1 to 20).map(i => ("m", i.toDouble, math.pow(i, 3)))
    // anti-monotone with TIES in x: two x values repeat; Spearman must
    // use average ranks (SciPy convention) — hand-checked value below
    val tied = Seq(
      ("t", 1.0, 9.0), ("t", 1.0, 8.0), ("t", 2.0, 7.0),
      ("t", 3.0, 6.0), ("t", 3.0, 5.0))
    val df = (mono ++ tied).toDF("g", "x", "y")
    val out = graft.operators.Profiling.correlations(df, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    val (pm, sm, nm) = out("m")
    assert(nm === 20L)
    assert(math.abs(sm - 1.0) < 1e-12, s"monotone => spearman 1, got $sm")
    assert(pm < 0.95, s"cubic is not linear: pearson $pm")
    val (_, st, nt) = out("t")
    assert(nt === 5L)
    // hand-computed: rx=[1.5,1.5,3,4.5,4.5], ry=[5,4,3,2,1] ->
    // cov=-9, sd_x=3, sd_y=sqrt(10) -> r = -3/sqrt(10)
    assert(math.abs(st - (-3.0 / math.sqrt(10.0))) < 1e-12,
      s"tied spearman $st")
  }

  test("embeddingDimStats: hand-computed per-dimension stats") {
    import spark.implicits._
    val vecs = Seq(
      Array(1.0f, 10.0f),
      Array(3.0f, 20.0f),
      Array(5.0f, 30.0f)).toDF("embedding")
    val out = Profiling.embeddingDimStats(vecs, "embedding")
      .orderBy("dim").collect()
      .map(r => (r.getAs[Long]("dim"), r.getAs[Double]("mean"),
        r.getAs[Double]("std"), r.getAs[Double]("mn"),
        r.getAs[Double]("mx"), r.getAs[Long]("n")))
    assert(out.length === 2)
    val (d0, m0, s0, mn0, mx0, n0) = out(0)
    assert(d0 === 0L && m0 === 3.0 && mn0 === 1.0 && mx0 === 5.0 && n0 === 3L)
    assert(math.abs(s0 - 2.0) < 1e-12) // sample std of 1,3,5
    val (d1, m1, s1, mn1, mx1, n1) = out(1)
    assert(d1 === 1L && m1 === 20.0 && mn1 === 10.0 && mx1 === 30.0 && n1 === 3L)
    assert(math.abs(s1 - 10.0) < 1e-12)
  }

  test("embeddingDimStats on real embeddings: dims complete, counts full") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nRows = emb.count()
    val dims = emb.selectExpr("size(embedding) AS d").distinct().collect()
    assert(dims.length === 1, "uniform embedding dimensionality")
    val d = dims.head.getInt(0)
    val out = Profiling.embeddingDimStats(emb, "embedding").collect()
    assert(out.length === d, "one row per dimension")
    assert(out.forall(_.getAs[Long]("n") === nRows), "no dropped values")
    assert(out.forall { r =>
      val (mn, mx) = (r.getAs[Double]("mn"), r.getAs[Double]("mx"))
      mn <= r.getAs[Double]("mean") && r.getAs[Double]("mean") <= mx
    })
  }

  test("mahalanobisDiag: hand-computed 1-D scores; constant dim adds 0") {
    import spark.implicits._
    // dim 0: values 0,2,4 -> mu=2, sd=2 -> z^2 = 1, 0, 1
    // dim 1: constant 7 -> sd=0 -> contributes exactly 0 everywhere
    val d = Seq((1L, Seq(0f, 7f)), (2L, Seq(2f, 7f)), (3L, Seq(4f, 7f)))
      .toDF("id", "vec")
    val got = Profiling.mahalanobisDiag(d, "id", "vec")
      .as[(Long, Double)].collect().toMap
    assert(got === Map(1L -> 1.0, 2L -> 0.0, 3L -> 1.0))
  }

  test("mahalanobisDiag: row-preserving and nonnegative on real vectors") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val got = Profiling.mahalanobisDiag(emb, "vec_id", "embedding")
    assert(got.count() === emb.count())
    import org.apache.spark.sql.functions._
    assert(got.filter(col("maha") < 0).isEmpty)
  }

  test("kAnonymity flags small and homogeneous groups; suppressBelowK enforces") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      // group (a,x): 3 rows, 3 distinct sensitive -> k ok (k=3), l ok (l=2)
      ("a", "x", 10L), ("a", "x", 20L), ("a", "x", 30L),
      // group (a,y): 2 rows -> too small
      ("a", "y", 10L), ("a", "y", 20L),
      // group (b,x): 3 rows but one sensitive value -> homogeneous
      ("b", "x", 7L), ("b", "x", 7L), ("b", "x", 7L),
    ).toDF("q1", "q2", "s")
    val rep = graft.operators.Profiling
      .kAnonymity(df, Seq("q1", "q2"), "s", k = 3, l = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))))
      .toMap
    assert(rep(("a", "x")) == ((3L, 3L, true, true)))
    assert(rep(("a", "y")) == ((2L, 2L, false, true)))
    assert(rep(("b", "x")) == ((3L, 1L, true, false)),
      "size passes but the homogeneity attack is flagged")
    val kept = graft.operators.Profiling
      .suppressBelowK(df, Seq("q1", "q2"), k = 3)
      .select("q1", "q2").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(kept == Set(("a", "x"), ("b", "x")),
      "suppression drops exactly the under-k groups, row-complete otherwise")
  }

  test("zoneMap: shard stats cover every row and bound every value") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val zm = graft.operators.Profiling
      .zoneMap(orders, "o_orderkey", 4, Seq("o_totalprice"))
      .collect()
    assert(zm.length == 4, "one row per shard")
    assert(zm.map(_.getLong(1)).sum == orders.count(), "rows partition")
    val (gmin, gmax) = {
      val r = orders.agg(
        org.apache.spark.sql.functions.min("o_totalprice"),
        org.apache.spark.sql.functions.max("o_totalprice")).collect().head
      (r.getDouble(0), r.getDouble(1))
    }
    zm.foreach { r =>
      assert(r.getDouble(2) >= gmin && r.getDouble(3) <= gmax)
      assert(r.getDouble(2) <= r.getDouble(3), "min <= max within shard")
      assert(r.getLong(4) == 0L, "fixture has no nulls")
    }
  }

  test("zoneMap counts nulls and keeps them out of min/max") {
    import spark.implicits._
    val df = Seq((1L, Some(5.0)), (2L, None), (3L, Some(1.0)))
      .toDF("k", "v")
    val zm = graft.operators.Profiling.zoneMap(df, "k", 1, Seq("v"))
      .collect().head
    assert(zm.getLong(1) == 3 && zm.getLong(4) == 1)
    assert(zm.getDouble(2) == 1.0 && zm.getDouble(3) == 5.0)
  }

  test("pseudonymize: deterministic, consistent across tables, null-preserving") {
    import spark.implicits._
    val a = Seq(Some(42L), Some(7L), None).toDF("k")
    val b = Seq(Some(42L), Some(99L)).toDF("k")
    val pa = graft.operators.Profiling.pseudonymize(a, Seq("k"), "s")
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    val pb = graft.operators.Profiling.pseudonymize(b, Seq("k"), "s")
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(pa(2) == null, "NULL stays NULL")
    assert(pa(0) == pb(0), "same (salt, value) => same token across tables")
    assert(pa(0) != pa(1) && pa(0) != pb(1), "distinct values => distinct tokens")
    // a different salt unlinks everything
    val pa2 = graft.operators.Profiling.pseudonymize(a, Seq("k"), "t")
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(pa2(0) != pa(0), "salt rotation changes every token")
  }

  test("pseudonymize framing is injective on separator-bearing strings") {
    import spark.implicits._
    // "1:2" vs "1" + ":2"-ish collisions: length prefix disambiguates
    val df = Seq("1:2", "12", ":12", "1:", "").toDF("k")
    val toks = graft.operators.Profiling.pseudonymize(df, Seq("k"), "s")
      .collect().map(_.getString(0))
    assert(toks.distinct.length == toks.length,
      "no two distinct values share a token")
  }

  test("diversity: uniform mix maxes Shannon/Simpson; singletons degrade gracefully") {
    import spark.implicits._
    import graft.operators.Profiling
    val df = (Seq.fill(3)(("u", "a")) ++ Seq.fill(3)(("u", "b")) ++
      Seq.fill(3)(("u", "c")) ++ Seq.fill(3)(("u", "d")) ++
      Seq(("s", "only")) ++
      Seq(("skew", "x"), ("skew", "x"), ("skew", "x"), ("skew", "y")))
      .toDF("g", "cat")
    val out = Profiling.diversity(df, Seq("g"), "cat").collect()
      .map(r => r.getString(0) -> r).toMap
    val u = out("u")
    assert(u.getLong(1) == 12 && u.getLong(2) == 4)
    assert(math.abs(u.getDouble(3) - math.log(4.0)) < 1e-5,
      "uniform 4-way mix: H = ln 4")
    assert(math.abs(u.getDouble(4) - 4.0) < 1e-4,
      "effective categories of a uniform 4-mix is 4")
    // unbiased Gini–Simpson: 1 − 4·(3·2)/(12·11) = 1 − 24/132
    assert(u.getDouble(5) == math.floor((1.0 - 24.0 / 132.0) * 1e6 + 0.5) / 1e6)
    val s1 = out("s")
    assert(s1.getDouble(3) == 0.0 && s1.getDouble(4) == 1.0
      && s1.isNullAt(5), "singleton group: H 0, eff 1, Simpson NULL")
    assert(out("skew").getDouble(3) < u.getDouble(3),
      "skewed mix is less diverse than uniform")
  }

  test("tCloseness: hand ordered-EMD — both skewed groups sit 15/36 " +
      "from the global mix and fail t = 0.2; the cumulative gaps " +
      "never materialize a float distribution") {
    import spark.implicits._
    val rows = Seq(("A", 0L), ("A", 0L), ("A", 1L),
      ("B", 2L), ("B", 2L), ("B", 2L))
    val out = Profiling.tCloseness(rows.toDF("g", "s"), Seq("g"),
        col("s"), t = 0.2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.size == 2)
    assert(out("A").getLong(1) == 3L
      && out("A").getDouble(2) == 0.416667
      && !out("A").getBoolean(3), out("A").toString)
    assert(out("B").getDouble(2) == 0.416667 && !out("B").getBoolean(3))
  }
}
