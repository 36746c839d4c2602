package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{Dedup, Salting}

/** The ScalaCheck property layer promised in SURVEY.md §5.3: algebraic
  * laws the engine must satisfy on ARBITRARY inputs, complementing the
  * hand-computed fixtures in the unit specs and the DuckDB oracle on
  * the judged corpus. Each law runs against generated in-memory tables
  * through the same DataFrame operators the judged queries use.
  *
  * Generators are bounded (≤ 30 rows, small key spaces) so collisions,
  * empty sides, and all-duplicate inputs are all likely — the corners
  * fixtures tend to miss.
  */
class PropertySpec extends SparkTestBase {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(12).withWorkers(1)

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, s"property '$name' failed: ${res.status}")
  }

  private val rowsGen: Gen[List[(Int, Int)]] =
    Gen.choose(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0, 5), Gen.choose(0, 99))))

  private def df(rows: List[(Int, Int)], kCol: String = "k", vCol: String = "v"): DataFrame = {
    import spark.implicits._
    rows.toDF(kCol, vCol)
  }

  test("join cardinality bounds: semi+anti partition the left; inner bounded") {
    check("join-bounds")(Prop.forAll(rowsGen, rowsGen) { (l, r) =>
      val left = df(l)
      val right = df(r, "k", "w").select(col("k")).distinct()
      val semi = left.join(right, Seq("k"), "left_semi").count()
      val anti = left.join(right, Seq("k"), "left_anti").count()
      val inner = left.join(right, Seq("k"), "inner").count()
      val outer = left.join(right, Seq("k"), "left").count()
      // right side is distinct on the key => inner == semi, and a left
      // join never loses left rows
      semi + anti == l.size.toLong && inner == semi && outer == l.size.toLong
    })
  }

  test("UNION ALL count additivity; UNION distinct bounded by the sum") {
    check("union-additivity")(Prop.forAll(rowsGen, rowsGen) { (l, r) =>
      val a = df(l); val b = df(r)
      val all = a.unionByName(b).count()
      val dist = a.unionByName(b).distinct().count()
      all == (l.size + r.size).toLong && dist <= all &&
        dist >= math.max(a.distinct().count(), b.distinct().count())
    })
  }

  test("INTERSECT is a subset of both inputs; EXCEPT+INTERSECT partition") {
    check("intersect-except")(Prop.forAll(rowsGen, rowsGen) { (l, r) =>
      val a = df(l); val b = df(r)
      val inter = a.intersect(b)
      val except = a.except(b)
      val interSet = inter.collect().map(_.toSeq).toSet
      val aSet = a.distinct().collect().map(_.toSeq).toSet
      val bSet = b.distinct().collect().map(_.toSeq).toSet
      interSet.subsetOf(aSet) && interSet.subsetOf(bSet) &&
        inter.count() + except.count() == aSet.size.toLong
    })
  }

  test("window rank totality: row_number is exactly 1..n per partition") {
    check("rank-totality")(Prop.forAll(rowsGen) { rows =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("k").orderBy(col("v"), monotonically_increasing_id())
      val ranked = df(rows).withColumn("rn", row_number().over(w))
        .groupBy("k").agg(count(lit(1)).as("n"), min("rn").as("lo"),
          max("rn").as("hi"), countDistinct("rn").as("nd"))
        .collect()
      ranked.forall { r =>
        val n = r.getLong(1)
        r.getInt(2) == 1 && r.getInt(3).toLong == n && r.getLong(4) == n
      }
    })
  }

  private val docGen: Gen[String] =
    Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("alpha", "bravo", "charlie", "delta",
        "echo", "foxtrot", "golf", "hotel")).map(_.mkString(" ")))

  test("Jaccard matches the set-theoretic definition and is symmetric") {
    check("jaccard-def")(Prop.forAll(docGen, docGen) { (ta, tb) =>
      import spark.implicits._
      def toks(t: String) = t.toLowerCase.split(" ").toSet
      val expected = {
        val (sa, sb) = (toks(ta), toks(tb))
        sa.intersect(sb).size.toDouble / sa.union(sb).size
      }
      val got = Dedup.nearJaccard(
          Seq((0L, ta), (1L, tb)).toDF("doc_id", "text"),
          "doc_id", "text", minJaccard = -1.0)
        .collect().headOption.map(_.getDouble(2)).getOrElse(0.0)
      // operator emits only token-sharing pairs; expected == 0 iff none
      val swapped = Dedup.nearJaccard(
          Seq((0L, tb), (1L, ta)).toDF("doc_id", "text"),
          "doc_id", "text", minJaccard = -1.0)
        .collect().headOption.map(_.getDouble(2)).getOrElse(0.0)
      math.abs(got - expected) < 1e-9 && math.abs(got - swapped) < 1e-9
    })
  }

  test("exact dedup is idempotent and preserves multiplicity totals") {
    check("dedup-idempotent")(Prop.forAll(rowsGen) { rows =>
      import spark.implicits._
      val docs = rows.zipWithIndex
        .map { case ((k, v), i) => (i.toLong, s"t$k") }
        .toDF("doc_id", "text")
      val once = Dedup.exact(docs, "doc_id", Seq("text"))
      val onceRows = once.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      // multiplicities add back to the input size
      val total = onceRows.map(_._3).sum
      // re-deduping the dedup output (keep_id as the id) is a no-op
      val again = Dedup.exact(
          once.select(col("keep_id").as("doc_id"), col("text")),
          "doc_id", Seq("text"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      total == rows.size.toLong &&
        again.toSet == onceRows.map { case (t, id, _) => (t, id, 1L) }.toSet
    })
  }

  test("salted join is result-identical to the plain join") {
    check("salting-identity")(Prop.forAll(rowsGen, rowsGen,
        Gen.choose(1, 8)) { (l, r, salts) =>
      val skewed = df(l)
      val small = df(r, "k", "w")
      val plain = skewed.join(small, Seq("k"), "inner")
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val salted = Salting.saltedJoin(skewed, small, Seq("k"), salts, "inner")
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      plain == salted
    })
  }

  test("binned range join == naive theta join for arbitrary intervals") {
    import spark.implicits._
    val pointsGen = Gen.choose(0, 20).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0L, 99L), Gen.choose(-50.0, 150.0))))
    val intervalsGen = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(100L, 199L),
        Gen.zip(Gen.choose(-60.0, 140.0), Gen.choose(0.0, 80.0)))))
    check("range-join-binned")(Prop.forAll(
        pointsGen, intervalsGen, Gen.oneOf(1L, 7L, 25L, 1000L)) { (ps, is, w) =>
      val points = ps.toDF("pid", "p")
      val intervals = is.map { case (id, (lo, span)) => (id, lo, lo + span) }
        .toDF("iid", "lo", "hi")
      val naive = points.join(intervals,
          col("p") >= col("lo") && col("p") < col("hi"))
        .select("pid", "iid").collect().map(_.toSeq).toSeq.sorted(RowOrd)
      val binned = graft.operators.RangeJoin
        .binned(points, intervals, "p", "lo", "hi", w)
        .select("pid", "iid").collect().map(_.toSeq).toSeq.sorted(RowOrd)
      naive == binned
    })
  }

  test("capPerKey: bounded by k, deterministic, and a subset of the input") {
    import spark.implicits._
    check("cap-per-key")(Prop.forAll(rowsGen, Gen.choose(1, 5)) { (rows, k) =>
      // unique ids so 'subset' is checkable row-wise
      val d = rows.zipWithIndex.map { case ((key, v), i) => (key, i.toLong) }
        .toDF("k", "id")
      val capped = graft.operators.Sampling.capPerKey(d, Seq("k"), "id", k)
      val perKey = capped.groupBy("k").count().collect().map(_.getLong(1))
      val ids = capped.select("id").collect().map(_.getLong(0)).toSet
      val again = graft.operators.Sampling.capPerKey(d.repartition(5), Seq("k"), "id", k)
        .select("id").collect().map(_.getLong(0)).toSet
      val allIds = d.select("id").collect().map(_.getLong(0)).toSet
      perKey.forall(_ <= k) && ids == again && ids.subsetOf(allIds)
    })
  }

  private val RowOrd: Ordering[Seq[Any]] =
    Ordering.by((s: Seq[Any]) => s.map(_.toString).mkString("|"))

  test("salted aggregation merges to the unsalted aggregate") {
    check("salted-agg")(Prop.forAll(rowsGen, Gen.choose(1, 8)) { (rows, salts) =>
      val d = df(rows)
      val plain = d.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val salted = Salting.saltedAgg(d, Seq("k"), salts,
          partial = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
          merge = Seq(sum("ps").as("s"), sum("pn").as("n")))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      plain == salted
    })
  }
}
