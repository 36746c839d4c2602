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

  test("overlap join == naive theta join for arbitrary interval pairs") {
    import spark.implicits._
    // ids assigned by index: the id pair is the operator's pair
    // identity (dropDuplicates key), so they must be unique per side
    val ivGen = Gen.choose(0, 10).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(-60.0, 140.0), Gen.choose(0.0, 80.0))))
    check("overlap-join-binned")(Prop.forAll(
        ivGen, ivGen, Gen.oneOf(1L, 7L, 25L, 1000L)) { (ls, rs, w) =>
      val left = ls.zipWithIndex.map { case ((lo, span), i) =>
        (i.toLong, lo, lo + span) }.toDF("lid", "l_lo", "l_hi")
      val right = rs.zipWithIndex.map { case ((lo, span), i) =>
        (1000L + i, lo, lo + span) }.toDF("rid", "r_lo", "r_hi")
      val naive = left.join(right,
          col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
        .select("lid", "rid").collect().map(_.toSeq).toSeq.sorted(RowOrd)
      val binned = graft.operators.RangeJoin
        .overlapBinned(left, right, "lid", "l_lo", "l_hi",
          "rid", "r_lo", "r_hi", w)
        .select("lid", "rid").collect().map(_.toSeq).toSeq.sorted(RowOrd)
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

  test("chunk() equals the sliding-window reference model") {
    import spark.implicits._
    val gen = for {
      text <- docGen
      chunkTokens <- Gen.choose(1, 8)
      stride <- Gen.choose(1, 8)
    } yield (text, chunkTokens, stride)
    check("chunk-model")(Prop.forAll(gen) { case (text, chunkTokens, stride) =>
      // limit -1 keeps trailing empty tokens, matching Spark's split()
      val toks = text.toLowerCase.split(" ", -1).toSeq
      val n = toks.size
      // reference: starts at stride steps; a non-first window whose
      // predecessor already covered the doc's end is dropped
      val keptStarts = (0 until n by stride)
        .filter(s => s == 0 || s + chunkTokens - stride < n)
      val model = keptStarts.zipWithIndex
        .map { case (s, i) =>
          (i.toLong, toks.slice(s, s + chunkTokens).mkString(" "),
            math.min(chunkTokens, n - s).toLong)
        }.toSet
      val got = graft.operators.TextAnalysis
        .chunk(Seq((0L, text)).toDF("doc_id", "text"), "doc_id", "text",
          chunkTokens, stride)
        .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3))).toSet
      // coverage: when stride <= chunkTokens the last emitted window
      // reaches the end of the doc (the containment-drop rule never
      // loses tail tokens)
      val covered = stride > chunkTokens ||
        keptStarts.lastOption.forall(_ + chunkTokens >= n)
      got == model && covered
    })
  }

  test("debounce is idempotent: survivors are always > gap apart") {
    // any kept event's gap to its RAW predecessor exceeds T, and that
    // predecessor is no earlier than the previous survivor — so
    // survivor spacing > T and a second pass drops nothing
    check("debounce idempotence")(Prop.forAll(
      Gen.choose(1, 20).flatMap(n => Gen.listOfN(n,
        Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 50L))))) { rows =>
      import spark.implicits._
      val ev = rows.zipWithIndex
        .map { case ((u, sec), i) =>
          (s"u$u", new java.sql.Timestamp(sec * 1000L), i.toLong, "t") }
        .toDF("u", "ts", "eid", "t")
      val once = graft.operators.EventWindows
        .debounce(ev, "u", "ts", "eid", "t", minGapSeconds = 5)
      val twice = graft.operators.EventWindows
        .debounce(once, "u", "ts", "eid", "t", minGapSeconds = 5)
      once.select("eid").collect().map(_.getLong(0)).toSet ==
        twice.select("eid").collect().map(_.getLong(0)).toSet
    })
  }

  test("rfm frequency/monetary scores are invariant to amount scaling") {
    import spark.implicits._
    // multiplying every amount by a positive constant permutes nothing:
    // ranks (and so f/m tiles) must not move
    val rng = new scala.util.Random(23)
    val orders = (1 to 40).map(i =>
      (s"c${i % 13}", f"2024-01-${(i % 9) + 1}%02d",
        1.0 + rng.nextInt(500)))
      .toDF("cust", "d", "amt")
      .select(col("cust"), col("d").cast("date").as("d"), col("amt"))
    def scores(df: DataFrame) =
      graft.operators.Scoring.rfm(df, "cust", "d", "amt", nTiles = 4)
        .select("customer", "r_score", "f_score", "m_score")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val base = scores(orders)
    val scaled = scores(orders.withColumn("amt", col("amt") * 7.0))
    assert(base == scaled, "rank tiles must be scale-invariant")
  }

  test("winsorize: row-preserving, band-bounded, interior passthrough") {
    import spark.implicits._
    val valuesGen = Gen.choose(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-1000.0, 1000.0)))
    val bandGen = for {
      pLo <- Gen.oneOf(0.0, 0.05, 0.25, 0.5)
      pHi <- Gen.oneOf(0.5, 0.75, 0.95, 1.0)
      if pLo <= pHi
    } yield (pLo, pHi)
    def refPct(vs: Seq[Double], p: Double): Double = {
      val s = vs.sorted
      val pos = p * (s.size - 1)
      val i = pos.toInt
      if (i + 1 < s.size) s(i) * (1 - (pos - i)) + s(i + 1) * (pos - i) else s(i)
    }
    check("winsorize-laws")(Prop.forAll(valuesGen, bandGen) { case (vs, (pLo, pHi)) =>
      val d = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val out = graft.operators.Outliers.winsorize(d, "v", pLo, pHi)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val (lo, hi) = (refPct(vs, pLo), refPct(vs, pHi))
      val tol = 1e-9 * (1 + math.abs(lo) + math.abs(hi))
      out.size == vs.size &&
        out.values.forall(v => v >= lo - tol && v <= hi + tol) &&
        vs.zipWithIndex.forall { case (v, i) =>
          // interior values pass through bit-identical
          !(v > lo + tol && v < hi - tol) || out(i.toLong) == v
        }
    })
    // full-band winsorize is the identity (clamp to [min, max])
    check("winsorize-identity")(Prop.forAll(valuesGen) { vs =>
      val d = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      graft.operators.Outliers.winsorize(d, "v", 0.0, 1.0)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap ==
        vs.zipWithIndex.map { case (v, i) => i.toLong -> v }.toMap
    })
  }

  test("simhash pigeonhole pipeline == brute-force hamming pairs") {
    import spark.implicits._
    // clustered signatures (bases + a few flipped bits) so near pairs
    // actually occur; arbitrary-long sigs would make the radius filter
    // trivially empty
    val sigsGen = for {
      n <- Gen.choose(2, 25)
      bases <- Gen.listOfN(3, Gen.choose(Long.MinValue, Long.MaxValue))
      rows <- Gen.listOfN(n, for {
        base <- Gen.oneOf(bases)
        flips <- Gen.choose(0, 6)
        bits <- Gen.listOfN(flips, Gen.choose(0, 63))
      } yield bits.foldLeft(base)((s, b) => s ^ (1L << b)))
    } yield rows
    check("simhash-pipeline")(Prop.forAll(sigsGen, Gen.choose(0, 8),
        Gen.oneOf(60, 64)) { (sigs, radius, sigBits) =>
      val d = sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "simhash")
      val got = graft.operators.Dedup
        .simHashNearDupFromSigs(d, radius, sigBits)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expected = (for {
        (a, i) <- sigs.zipWithIndex
        (b, j) <- sigs.zipWithIndex if i < j
        h = java.lang.Long.bitCount(a ^ b) if h <= radius
      } yield (i.toLong, j.toLong, h.toLong)).toSet
      got == expected
    })
  }

  test("packGreedyCapacity equals the sequential first-fit fold") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 25)
      sizes <- Gen.listOfN(n, Gen.choose(1L, 20L))
      groups <- Gen.listOfN(n, Gen.oneOf("a", "b"))
      budget <- Gen.choose(1, 30)
    } yield (sizes.zip(groups), budget)
    check("pack-greedy")(Prop.forAll(gen) { case (rows, budget) =>
      val d = rows.zipWithIndex.map { case ((sz, g), i) => (g, i.toLong, sz) }
        .toDF("grp", "id", "n")
      val got = graft.operators.Packing
        .packGreedyCapacity(d, "grp", "id", col("n"), budget)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
        .toSet
      // reference: per-group in-order fold with a running fill
      val expected = rows.zipWithIndex.groupBy(_._1._2).flatMap {
        case (g, members) =>
          var bin = 0L; var fill = 0L; var first = true
          members.sortBy(_._2).map { case ((sz, _), i) =>
            if (!first && fill + sz > budget) { bin += 1; fill = 0L }
            first = false; fill += sz
            (g, i.toLong, bin)
          }
      }.toSet
      got == expected
    })
  }

  test("packByOffset equals the exclusive-cumsum closed form") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 25)
      sizes <- Gen.listOfN(n, Gen.choose(1L, 40L))
      groups <- Gen.listOfN(n, Gen.oneOf("a", "b"))
      budget <- Gen.choose(1, 50)
    } yield (sizes.zip(groups), budget)
    check("pack-offset")(Prop.forAll(gen) { case (rows, budget) =>
      val d = rows.zipWithIndex.map { case ((sz, g), i) => (g, i.toLong, sz) }
        .toDF("grp", "id", "n")
      val got = graft.operators.Packing
        .packByOffset(d, Seq("grp"), "id", col("n"), budget)
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getLong(3), r.getLong(4))).toSet
      val expected = rows.zipWithIndex.groupBy(_._1._2).flatMap {
        case (g, members) =>
          var cum = 0L
          members.sortBy(_._2).map { case ((sz, _), i) =>
            val start = cum
            cum += sz
            (g, i.toLong, start, start / budget)
          }
      }.toSet
      got == expected
    })
  }

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

  test("connected components == union-find on arbitrary sparse graphs") {
    val edgesGen: Gen[List[(Long, Long)]] =
      Gen.choose(0, 25).flatMap(n => Gen.listOfN(n,
        Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L))))
    check("cc-union-find")(Prop.forAll(edgesGen) { es =>
      import spark.implicits._
      val clean = es.filter { case (a, b) => a != b }
      if (clean.isEmpty) true
      else {
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        clean.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val verts = clean.flatMap(e => Seq(e._1, e._2)).distinct
        val expect = verts.map(v => v -> {
          val r = find(v); verts.filter(u => find(u) == r).min
        }).toMap
        val got = graft.operators.Clustering
          .connectedComponents(clean.toDF("i", "j"), "i", "j")
          .as[(Long, Long)].collect().toMap
        got == expect
      }
    })
  }

  test("fuzzy edit-distance-1 join == brute-force levenshtein") {
    // tiny alphabet + short lengths: dense distance-0/1/2 collisions
    val wordGen = Gen.choose(0, 4).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf('a', 'b')))
    val corpusGen = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, wordGen))
    check("fuzzy-brute")(Prop.forAll(corpusGen) { words =>
      import spark.implicits._
      val d = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "s")
      val brute = d.as("a").join(d.as("b"), col("a.id") < col("b.id"))
        .withColumn("dd", levenshtein(col("a.s"), col("b.s")))
        .filter(col("dd") <= 1)
        .select(col("a.id"), col("b.id"), col("dd"))
        .as[(Long, Long, Int)].collect().toSet
      val fast = graft.operators.FuzzyJoin.editDistance1SelfJoin(d, "id", "s")
        .as[(Long, Long, Int)].collect().toSet
      fast == brute
    })
  }

  test("bigram LM: conditional probabilities sum to 1 per seen context") {
    val docGen = Gen.choose(2, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString(" ")))
    val corpusGen = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, docGen))
    check("lm-normalized")(Prop.forAll(corpusGen) { docs =>
      import spark.implicits._
      val d = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      // reconstruct the model's statistics the same way the operator does
      val bi = graft.operators.TextAnalysis
        .ngramOccurrences(d, "doc_id", "text", 2)
        .groupBy("tok").agg(count(lit(1)).as("c2"))
        .select(substring_index(col("tok"), " ", 1).as("w1"),
          substring_index(col("tok"), " ", -1).as("w2"), col("c2"))
        .as[(String, String, Long)].collect()
      val vocab = bi.map(_._2).distinct
      val k = 0.5
      bi.groupBy(_._1).forall { case (_, rows) =>
        val c1 = rows.map(_._3).sum
        val seen = rows.map(r => (r._3 + k) / (c1 + k * vocab.length)).sum
        val unseen = (vocab.length - rows.length) * (k / (c1 + k * vocab.length))
        math.abs(seen + unseen - 1.0) < 1e-9
      }
    })
  }

  test("profile invariants: nulls + distinct bounded, min <= max") {
    val optGen: Gen[List[Option[Int]]] = Gen.choose(1, 25).flatMap(n =>
      Gen.listOfN(n, Gen.option(Gen.choose(-9, 9))))
    check("profile-bounds")(Prop.forAll(optGen) { vals =>
      import spark.implicits._
      val d = vals.toDF("x")
      val r = graft.operators.Profiling.profile(d, Seq("x"), exactDistinct = true)
        .collect().head
      val (n, nNull, nDist) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val nonNull = vals.flatten
      n == vals.length && nNull == (vals.length - nonNull.length) &&
        nDist == nonNull.distinct.length &&
        (nonNull.isEmpty ||
          (r.getString(4).toInt == nonNull.min && r.getString(5).toInt == nonNull.max))
    })
  }

  test("containment dominates Jaccard and matches the set definition") {
    val corpusGen = Gen.choose(2, 6).flatMap(n =>
      Gen.listOfN(n, docGen))
    check("containment-vs-jaccard")(Prop.forAll(corpusGen) { texts =>
      import spark.implicits._
      val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val cont = Dedup.nearContainment(d, "doc_id", "text", 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val jacc = Dedup.nearJaccard(d, "doc_id", "text", 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      def sets = texts.map(_.toLowerCase.split(" ").toSet)
      // every pair sharing a token appears in both, containment >=
      // jaccard always, and containment matches |A int B| / min
      cont.keySet == jacc.keySet &&
        cont.forall { case (k, c) => c >= jacc(k) - 1e-12 } &&
        cont.forall { case ((i, j), c) =>
          val (a, b) = (sets(i.toInt), sets(j.toInt))
          math.abs(c - a.intersect(b).size.toDouble / math.min(a.size, b.size)) < 1e-12
        }
    })
  }

  test("token entropy is bounded by [0, ln(distinct)] and hits both ends") {
    val corpusGen = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, docGen))
    check("entropy-bounds")(Prop.forAll(corpusGen) { texts =>
      import spark.implicits._
      val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val rows = graft.operators.TextAnalysis.tokenEntropy(d, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      rows.length == texts.length && rows.forall { case (id, nTok, nDist, h) =>
        val toks = texts(id.toInt).toLowerCase.split(" ")
        nTok == toks.length && nDist == toks.distinct.length &&
          h >= -1e-12 && h <= math.log(nDist.toDouble) + 1e-12 &&
          // exactness at the ends: single-distinct docs are 0, uniform
          // docs are exactly ln(n)
          (nDist != 1L || math.abs(h) < 1e-12) &&
          (toks.groupBy(identity).values.map(_.length).toSet.size != 1 ||
            math.abs(h - math.log(nDist.toDouble)) < 1e-9)
      }
    })
  }

  test("qgram edit join == brute-force levenshtein on arbitrary short strings") {
    // 3-char alphabet at lengths 6-10 makes distance-<=2 pairs COMMON,
    // so the law exercises hits, not just the empty set
    val strGen = Gen.choose(6, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpusGen = Gen.choose(2, 8).flatMap(n => Gen.listOfN(n, strGen))
    check("qgram-vs-brute")(Prop.forAll(corpusGen) { strs =>
      import spark.implicits._
      val d = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "s")
      val got = graft.operators.FuzzyJoin.qgramEditJoin(d, "id", "s", maxDist = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        i <- strs.indices; j <- strs.indices if i < j
        dist = EditDistanceRef.levenshtein(strs(i), strs(j)) if dist <= 2
      } yield (i.toLong, j.toLong, dist)).toSet
      got == want
    })
  }

  test("robust z-score is affine-equivariant: z(a*x + b) == sign(a) * z(x)") {
    val valsGen = Gen.choose(3, 20).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-50, 50)))
    val abGen = Gen.zip(Gen.oneOf(-3.0, -1.0, 0.5, 2.0), Gen.choose(-10.0, 10.0))
    check("robust-z-affine")(Prop.forAll(valsGen, abGen) { (vals, ab) =>
      import spark.implicits._
      val (a, b) = ab
      val d = vals.zipWithIndex.map { case (v, i) => (i.toLong, v.toDouble) }
        .toDF("id", "x")
      def scores(df: DataFrame) =
        graft.operators.Outliers.robustZScore(df, "x", Seq.empty)
          .collect().map(r => r.getLong(0) ->
            (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      val base = scores(d)
      val trans = scores(d.withColumn("x", col("x") * a + b))
      base.keySet == trans.keySet && base.forall { case (k, zOpt) =>
        (zOpt, trans(k)) match {
          case (Some(z), Some(zt)) =>
            math.abs(zt - math.signum(a) * z) < 1e-9
          case (None, None) => true // MAD = 0 stays degenerate under affine
          case _ => false
        }
      }
    })
  }

  test("sessionize laws: session_no counts breaks; non-decreasing in time") {
    // events: (user in 0..2, minute in 0..120); gap 15 min
    val evGen = Gen.choose(1, 25).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0, 2), Gen.choose(0, 120))))
    check("sessionize-islands")(Prop.forAll(evGen) { evs =>
      import spark.implicits._
      val rows = evs.zipWithIndex.map { case ((u, m), i) =>
        (s"u$u", i.toLong, new java.sql.Timestamp(m * 60000L))
      }
      val out = graft.operators.EventWindows
        .sessionize(rows.toDF("user_id", "event_id", "ts"),
          "user_id", "ts", "event_id", 900L)
        .select("user_id", "event_id", "ts", "session_no").collect()
        .map(r => (r.getString(0), r.getLong(1),
          r.getTimestamp(2).getTime, r.getLong(3)))
      out.groupBy(_._1).forall { case (_, es) =>
        val sorted = es.sortBy(e => (e._3, e._2))
        // reference: count breaks in the sorted order
        val expected = sorted.scanLeft((0L, Long.MinValue / 2)) {
          case ((sess, prev), e) =>
            (if (e._3 - prev >= 900000L) sess + 1 else sess, e._3)
        }.tail.map(_._1)
        sorted.map(_._4).toSeq == expected.toSeq &&
          sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq
      }
    })
  }

  test("keepTopQuantile laws: size floor(f*n) per group, kept are top-ranked") {
    val rowsG = Gen.choose(1, 25).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0, 2), Gen.choose(0, 9))))
    val fracG = Gen.oneOf(0.1, 0.25, 0.5, 0.75, 1.0)
    check("quantile-curation")(Prop.forAll(rowsG, fracG) { (rows, f) =>
      import spark.implicits._
      val d = rows.zipWithIndex.map { case ((g, s), i) =>
        (s"g$g", i.toLong, s.toDouble)
      }.toDF("grp", "id", "score")
      val kept = graft.operators.Sampling
        .keepTopQuantile(d, Seq("grp"), col("score"), "id", f)
        .select("grp", "id", "score").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      val byGroup = rows.zipWithIndex.map { case ((g, s), i) =>
        (s"g$g", i.toLong, s.toDouble)
      }.groupBy(_._1)
      byGroup.forall { case (g, members) =>
        val k = kept.filter(_._1 == g).map(m => (m._2, m._3)).toSet
        val want = members.map(m => (m._2, m._3))
          .sortBy { case (id, s) => (-s, id) }
          .take(math.floor(f * members.size).toInt).toSet
        k == want
      }
    })
  }

  test("CDC law: diffSnapshots then applyChangelog reconstructs any after-state") {
    // arbitrary before/after snapshots over a shared small key space:
    // inserts, deletes, updates, and no-ops all arise
    val snapGen = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0, 9), Gen.choose(0, 99))))
    check("cdc-roundtrip")(Prop.forAll(snapGen, snapGen) { (b, a) =>
      import spark.implicits._
      // one row per key (snapshots are keyed states)
      val before = b.groupBy(_._1).map { case (k, vs) =>
        (k.toLong, vs.map(_._2).max) }.toSeq.toDF("k", "v")
      val after = a.groupBy(_._1).map { case (k, vs) =>
        (k.toLong, vs.map(_._2).max) }.toSeq.toDF("k", "v")
      val diff = graft.operators.Cdc.diffSnapshots(before, after, Seq("k"))
      val changelog = diff.withColumn("version", lit(1L))
        .withColumn("is_delete", col("op") === "delete").drop("op")
      val rebuilt = graft.operators.Cdc.applyChangelog(
          before.withColumn("version", lit(0L)), changelog, Seq("k"), "version")
        .drop("version")
      rebuilt.exceptAll(after).count() == 0L &&
        after.exceptAll(rebuilt).count() == 0L &&
        // and the diff is minimal: no update row for keys whose state
        // is equal on both sides
        diff.select(col("k"), col("op"))
          .join(before.withColumnRenamed("v", "v_before"), Seq("k"))
          .join(after.withColumnRenamed("v", "v_after"), Seq("k"))
          .filter(col("v_before") === col("v_after") && col("op") === "update")
          .count() == 0L
    })
  }

  test("equi-depth histogram partitions: counts sum to n, ranges ordered") {
    val valsGen = Gen.choose(2, 60).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 30))) // ties likely
    val bucketsGen = Gen.oneOf(2, 3, 4, 8)
    check("eqdepth-partition")(Prop.forAll(valsGen, bucketsGen) { (xs, nb) =>
      import spark.implicits._
      val df = xs.map(_.toDouble).toDF("x")
      val rows = graft.operators.Profiling
        .equiDepthHistogram(df, "x", nb, exact = true)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getDouble(3))).sortBy(_._1)
      val countsOk = rows.map(_._2).sum == xs.size.toLong
      val withinOk = rows.forall { case (_, _, lo, hi) => lo <= hi }
      // bucket value ranges never interleave (ties at a cut go low)
      val orderedOk = rows.sliding(2).forall {
        case Array((_, _, _, hi1), (_, _, lo2, _)) => hi1 <= lo2
        case _ => true
      }
      countsOk && withinOk && orderedOk
    })
  }

  test("token budget law: kept set is a per-group prefix that crosses once") {
    val rowsGen = Gen.choose(1, 20).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0, 2), Gen.choose(1, 40))))
    val budgetGen = Gen.oneOf(10L, 50L, 120L)
    check("token-budget-prefix")(Prop.forAll(rowsGen, budgetGen) { (rows, b) =>
      import spark.implicits._
      val d = rows.zipWithIndex.map { case ((g, t), i) =>
        (s"g$g", i.toLong, t.toLong) }.toDF("grp", "id", "n")
      val kept = graft.operators.Sampling
        .takeTokenBudget(d, Seq("grp"), "id", "id", col("n"), b)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val byGroup = rows.zipWithIndex.map { case ((g, t), i) =>
        (s"g$g", i.toLong, t.toLong) }.groupBy(_._1)
      byGroup.forall { case (g, members) =>
        val sorted = members.sortBy(_._2)
        // reference walk: keep while exclusive run < budget
        val want = sorted.scanLeft((0L, true)) { case ((run, _), m) =>
          (run + m._3, run < b)
        }.tail.zip(sorted).filter(_._1._2).map(_._2)
        kept.filter(_._1 == g).sortBy(_._2).toSeq == want
      }
    })
  }

  test("oovRate is always in [0,1] for arbitrary text and vocab") {
    val textGen = Gen.listOf(
      Gen.oneOf("join", "scan", "zzz", "qq", "", "a")).map(_.mkString(" "))
    val vocabGen = Gen.nonEmptyListOf(Gen.oneOf("join", "scan", "a"))
    check("oov-bounds")(Prop.forAll(Gen.listOfN(8, textGen), vocabGen) {
      (texts, vocab) =>
        import spark.implicits._
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("id", "text")
        df.select(graft.operators.TextAnalysis
            .oovRate(col("text"), vocab.distinct).as("r"))
          .collect().forall { r =>
            val v = r.getDouble(0); v >= 0.0 && v <= 1.0
          }
    })
  }

  test("BPE law: token concatenation reconstructs word+marker for any merges") {
    val wordG = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))).map(_.mkString)
    val nMergesG = Gen.choose(0, 10)
    check("bpe-roundtrip")(Prop.forAll(Gen.listOfN(6, wordG), nMergesG) {
      (words, n) =>
        val dict = words.groupBy(identity).map { case (w, ws) =>
          w -> ws.size.toLong
        }.toSeq
        val merges = graft.operators.Bpe.trainFromCounts(dict, n)
        words.forall { w =>
          val toks = graft.operators.Bpe.encodeWord(w, merges)
          toks.mkString == w + graft.operators.Bpe.EndOfWord &&
            toks.forall(_.nonEmpty)
        }
    })
  }

  test("removeRepeatedSpans law: cut set is the UNION of flagged-occurrence covers") {
    // arbitrary overlap patterns from a 2-letter token alphabet: flagged
    // 2-gram occurrences overlap, chain, and repeat within one doc —
    // the coverage rule says a token survives iff NO flagged occurrence
    // covers it, which the sequential reference below replays exactly
    val docGen = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("x", "y")).map(_.mkString(" ")))
    val n = 2
    check("remove-spans-cover-union")(
      Prop.forAll(Gen.choose(2, 6).flatMap(Gen.listOfN(_, docGen))) { texts =>
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        val tokLists = docs.map { case (id, t) => id -> t.split(" ").toList }
        val flagged = tokLists
          .flatMap { case (id, ws) =>
            ws.sliding(n).filter(_.size == n).map(g => (id, g.mkString(" "))).toList }
          .distinct.groupBy(_._2).filter(_._2.size >= 2).keySet
        val want = tokLists.map { case (id, ws) =>
          val starts = ws.sliding(n).zipWithIndex
            .filter { case (g, _) => g.size == n && flagged(g.mkString(" ")) }
            .map(_._2).toList
          val covered = starts.flatMap(s => s until s + n).toSet
          id -> ws.zipWithIndex.collect {
            case (w, i) if !covered(i) => w }.mkString(" ")
        }.toMap
        import spark.implicits._
        val got = graft.operators.TextAnalysis
          .removeRepeatedSpans(docs.toDF("doc_id", "text"),
            "doc_id", "text", n = n, minDocs = 2)
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        got == want
      })
  }

  test("discretizeEquiDepth law: row-preserving and bucket counts == histogram (exact, arbitrary ties)") {
    // values from a 6-point support: ties at every cut are likely, the
    // regime where equi-depth bucketing is easiest to get wrong
    val valsGen = Gen.choose(2, 25).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 5)))
    val bucketsGen = Gen.choose(2, 4)
    check("discretize-histogram-consistency")(
      Prop.forAll(valsGen, bucketsGen) { (vals, nb) =>
        import spark.implicits._
        val d = vals.zipWithIndex.map { case (v, i) =>
          (i.toLong, v.toDouble) }.toDF("id", "v")
        val disc = graft.operators.Profiling
          .discretizeEquiDepth(d, "v", nb, exact = true)
        val discRows = disc.collect()
        val hist = graft.operators.Profiling
          .equiDepthHistogram(d, "v", nb, exact = true)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val byBucket = discRows.groupBy(_.getAs[Int]("bucket").toLong)
          .map { case (b, rs) => b -> rs.length.toLong }
        discRows.length == vals.size && byBucket == hist
      })
  }

  test("takeTokenBudget boundary law: an exclusive run EQUAL to the budget drops the row") {
    // counts drawn from divisors of the budget so exact boundary hits
    // (run == b) occur constantly — the off-by-one regime of the
    // exclusive-sum contract (run < b keeps, run == b drops)
    val b = 100L
    val rowsGen = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0, 1), Gen.oneOf(25L, 50L, 75L, 100L))))
    check("token-budget-boundary")(Prop.forAll(rowsGen) { rows =>
      import spark.implicits._
      val d = rows.zipWithIndex.map { case ((g, t), i) =>
        (s"g$g", i.toLong, t) }.toDF("grp", "id", "n")
      val kept = graft.operators.Sampling
        .takeTokenBudget(d, Seq("grp"), "id", "id", col("n"), b)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      rows.zipWithIndex.groupBy(_._1._1).forall { case (g, members) =>
        val sorted = members.sortBy(_._2)
        var run = 0L
        sorted.forall { case ((_, t), i) =>
          val want = run < b // run == b exactly => dropped
          run += t
          kept.contains((s"g$g", i.toLong)) == want
        }
      }
    })
  }

  test("temperatureWeights laws: distribution, n-monotone, alpha=1 epochs=1") {
    // arbitrary skewed group sizes (1..40 rows over <=4 groups)
    val sizesGen = Gen.choose(1, 4).flatMap(k =>
      Gen.listOfN(k, Gen.choose(1, 40)))
    val alphaGen = Gen.oneOf(0.25, 0.5, 0.75, 1.0)
    check("temperature-weights")(Prop.forAll(sizesGen, alphaGen) { (sizes, a) =>
      import spark.implicits._
      val rows = sizes.zipWithIndex.flatMap { case (n, g) =>
        (0 until n).map(i => (s"g$g", i)) }
      val out = graft.operators.Sampling
        .temperatureWeights(rows.toDF("grp", "x"), "grp", a)
        .collect().map(r => (r.getString(0), r.getAs[Long]("n"),
          r.getAs[Double]("weight"), r.getAs[Double]("epochs")))
      val sumW = out.map(_._3).sum
      val byN = out.sortBy(_._2)
      val monotone = byN.zip(byN.tail).forall { case (s, b) => s._3 <= b._3 + 1e-12 }
      val epochsLaw = a != 1.0 ||
        out.forall(r => math.abs(r._4 - 1.0) < 1e-9)
      math.abs(sumW - 1.0) < 1e-9 && monotone && epochsLaw
    })
  }

  test("dedupBlocksAcrossDocs laws: row-preserving; clean blocks are an in-order subset") {
    // tiny vocab + short docs => shared blocks are common
    val docGen = Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc")).map(_.mkString(" ")))
    val corpusGen = Gen.choose(1, 8).flatMap(k => Gen.listOfN(k, docGen))
    val w = 2
    def blocksOf(text: String): List[String] =
      text.split(" ", -1).toList.grouped(w).map(_.mkString(" ")).toList
    check("dedup-blocks")(Prop.forAll(corpusGen) { docs =>
      import spark.implicits._
      val d = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = graft.operators.Dedup
        .dedupBlocksAcrossDocs(d, "doc_id", "text", w)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // model: holder of a block text = min doc containing it
      val holder = docs.zipWithIndex
        .flatMap { case (t, i) => blocksOf(t).map(_ -> i.toLong) }
        .groupBy(_._1).map { case (b, occ) => b -> occ.map(_._2).min }
      val expected = docs.zipWithIndex.map { case (t, i) =>
        i.toLong -> blocksOf(t).filter(b => holder(b) == i.toLong)
          .mkString(" ") }.toMap
      out.size == docs.size && out == expected
    })
  }

  test("ewma == in-memory reference fold on arbitrary keyed series with nulls") {
    val rowsGen = Gen.choose(1, 25).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0, 2),
        Gen.option(Gen.choose(-50.0, 50.0)))))
    check("ewma-reference")(Prop.forAll(rowsGen, Gen.oneOf(0.1, 0.3, 1.0)) {
      (rows, a) =>
        import spark.implicits._
        val d = rows.zipWithIndex.map { case ((k, v), i) =>
          (s"k$k", i.toLong, v) }.toDF("k", "o", "x")
        val got = graft.operators.Resample.ewma(d, "k", Seq("o"), "x", a)
          .collect().map(r => (r.getString(0), r.getLong(1)) ->
            Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
        rows.zipWithIndex.groupBy(_._1._1).forall { case (k, members) =>
          var y: Option[Double] = None
          members.sortBy(_._2).forall { case ((_, v), i) =>
            y = v match {
              case Some(x) => Some(y.fold(x)(p => (1.0 - a) * p + a * x))
              case None => y
            }
            got((s"k$k", i.toLong)) == y // bit-exact: same IEEE ops
          }
        }
    })
  }

  test("asofWithin == naive latest-match-then-mask on arbitrary event sets") {
    val sideGen = Gen.choose(0, 15).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 100L))))
    check("asof-within-reference")(Prop.forAll(
        sideGen, sideGen, Gen.oneOf(5L, 20L, 200L)) { (ls, rs, tol) =>
      import spark.implicits._
      val left = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "lt", "lid")
      val right = rs.map { case (k, t) => (k, t) }.toDF("k", "rt")
      val got = graft.operators.AsOfJoin.asofWithin(
          left, right, "k", "lt", "rt", Map("rt" -> "m"),
          within = (l, r) => l - r <= lit(tol))
        .collect().map { r =>
          val mi = r.fieldIndex("m")
          r.getAs[Long]("lid") ->
            (if (r.isNullAt(mi)) None else Some(r.getLong(mi)))
        }.toMap
      ls.zipWithIndex.forall { case ((k, lt), i) =>
        val matches = rs.filter(r => r._1 == k && r._2 <= lt).map(_._2)
        val expect = matches.sorted.lastOption.filter(m => lt - m <= tol)
        got(i.toLong) == expect
      }
    })
  }

  test("sparseCosinePairs law: an exact duplicate doc pairs at cos 1") {
    val docGen = Gen.choose(2, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd")).map(_.mkString(" ")))
    val otherGen = Gen.choose(2, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("ee", "ff", "gg")).map(_.mkString(" ")))
    check("sparse-cosine-dup")(Prop.forAll(docGen, otherGen) { (t1, t2) =>
      import spark.implicits._
      // doc 3 duplicates doc 1: their pair must verify at cos ~ 1.
      // doc 2 uses a DISJOINT vocabulary so no term reaches df == N —
      // a universal term has idf = ln(N/N) = 0 and contributes nothing
      // (plain tf-idf semantics; the judged query's maxDf < corpus
      // size keeps it out of that regime by construction).
      val d = Seq((1L, t1), (2L, t2), (3L, t1)).toDF("doc_id", "text")
      val pairs = graft.operators.TextAnalysis
        .sparseCosinePairs(d, "doc_id", "text", minCosine = 0.99, maxDf = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      pairs.exists(p => p._1 == 1L && p._2 == 3L && math.abs(p._3 - 1.0) < 1e-9)
    })
  }

  test("pageRank laws: mass conserved, ranks positive, floor respected") {
    val edgeGen = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0, 6), Gen.choose(0, 6))).map(_.filter(e => e._1 != e._2)))
    check("pagerank-mass")(Prop.forAll(edgeGen) { es =>
      es.isEmpty || {
        import spark.implicits._
        val r = graft.operators.Graph
          .pageRank(es.toDF("s", "t"), "s", "t", iters = 3)
          .as[(String, Double)].collect()
        val n = r.length
        // dangling redistribution keeps total mass at exactly 1 (up to
        // the 1e-12 per-rank rounding), and every rank is at least the
        // teleport floor (1-d)/n
        math.abs(r.map(_._2).sum - 1.0) < n * 1e-11 &&
          r.forall(_._2 >= (1.0 - 0.85) / n - 1e-11)
      }
    })
  }

  test("kmeans laws: rows preserved, ids in range, seeds at zero dist") {
    val vecGen = Gen.choose(2, 12).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(-50, 50), Gen.choose(-50, 50))))
    check("kmeans-rows")(Prop.forAll(vecGen) { pts =>
      import spark.implicits._
      val rows = pts.zipWithIndex
        .map { case ((x, y), i) => (i.toLong, Seq(x.toFloat, y.toFloat)) }
      val d = rows.toDF("id", "vec")
      val k = math.min(3, rows.size)
      // iters=0 pins assignment against raw seed centroids: the k seed
      // rows themselves must sit at distance exactly 0
      val a0 = graft.operators.Clustering
        .kmeansPortable(d, "id", "vec", k, iters = 0)
        .as[(Long, Int, Double)].collect()
      val a1 = graft.operators.Clustering
        .kmeansPortable(d, "id", "vec", k, iters = 1)
        .as[(Long, Int, Double)].collect()
      a0.length == rows.size && a1.length == rows.size &&
        (a0 ++ a1).forall(r => r._2 >= 0 && r._2 < k && r._3 >= 0.0) &&
        a0.count(_._3 == 0.0) >= k // duplicates of a seed also hit 0
    })
  }

  test("semDedup laws: survivors nonempty per cluster, dup-free at tau") {
    val vecGen = Gen.choose(2, 10).flatMap(n => Gen.listOfN(n,
      Gen.oneOf(Seq(1f, 0f), Seq(0f, 1f), Seq(1f, 0.05f), Seq(-1f, 0f))))
    check("semdedup-survivors")(Prop.forAll(vecGen) { vs =>
      import spark.implicits._
      val d = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
      val kept = graft.operators.Clustering
        .semDedup(d, "id", "vec", k = 1, iters = 0, minCosine = 0.99)
        .select("id").as[Long].collect().toSet
      // k=1: one cluster, so survivors must be pairwise below tau AND
      // every dropped row must have a kept near-dup with a lower id
      val vec = vs.map(_.map(_.toDouble))
      def cos(a: Seq[Double], b: Seq[Double]): Double = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      val keptL = kept.toList.sorted
      val noDupAmongKept = keptL.combinations(2).forall {
        case List(i, j) => cos(vec(i.toInt), vec(j.toInt)) < 0.995
        case _ => true
      }
      val droppedJustified = vs.indices.map(_.toLong).filterNot(kept.contains)
        .forall(jj => kept.exists(ii =>
          ii < jj && cos(vec(ii.toInt), vec(jj.toInt)) >= 0.985))
      kept.nonEmpty && noDupAmongKept && droppedJustified
    })
  }

  test("aucRank laws: bounds, and invariance under positive affine score maps") {
    val gen = Gen.choose(2, 25).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0, 20), Gen.oneOf(true, false))))
    check("auc-affine")(Prop.forAll(gen) { rows =>
      import spark.implicits._
      val base = rows.zipWithIndex
        .map { case ((s, l), i) => ("g", s.toDouble, l) }
        .toDF("g", "score", "lbl")
      def auc(d: DataFrame): Option[Double] = {
        val r = graft.operators.RankEval
          .aucRank(d, "g", "score", col("lbl")).collect().head
        if (r.isNullAt(1)) None else Some(r.getDouble(1))
      }
      val a1 = auc(base)
      // 3x + 7 preserves every rank and tie exactly
      val a2 = auc(base.withColumn("score", col("score") * 3 + 7))
      a1 == a2 && a1.forall(a => a >= 0.0 && a <= 1.0)
    })
  }

  test("gini laws: bounds [0,1) and exact scale invariance") {
    val gen = Gen.choose(1, 25).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 50L))).suchThat(_.sum > 0)
    check("gini-scale")(Prop.forAll(gen) { vs =>
      import spark.implicits._
      def g(mult: Long): Double = graft.operators.Profiling
        .gini(vs.map(v => ("g", v * mult)).toDF("g", "v"), Seq("g"), "v")
        .collect().head.getDouble(1)
      val g1 = g(1L)
      g1 >= 0.0 && g1 < 1.0 && g(7L) == g1
    })
  }

  test("recallAtK laws: self-recall 1, bounds, symmetry of the hit count") {
    val gen = Gen.choose(1, 8).flatMap(n => Gen.pick(n, 0 to 20))
    check("recall-self")(Prop.forAll(gen, gen) { (xs, ys) =>
      import spark.implicits._
      def ranking(ids: Seq[Int]) = ids.zipWithIndex
        .map { case (id, i) => ("q", id.toString, i + 1) }
        .toDF("q", "item", "rnk")
      val k = 5
      val re = graft.operators.RankEval
      val self = re.recallAtK(ranking(xs.toSeq), ranking(xs.toSeq),
        "q", "item", "rnk", k).collect().head.getDouble(2)
      val ab = re.recallAtK(ranking(xs.toSeq), ranking(ys.toSeq),
        "q", "item", "rnk", k).collect().head
      val ba = re.recallAtK(ranking(ys.toSeq), ranking(xs.toSeq),
        "q", "item", "rnk", k).collect().head
      val selfExpected =
        math.rint(math.min(xs.size, k).toDouble / k * 1e6) / 1e6
      self == selfExpected &&
        ab.getLong(1) == ba.getLong(1) && // |A∩B| is symmetric
        ab.getDouble(2) >= 0.0 && ab.getDouble(2) <= 1.0
    })
  }

  test("jaro-winkler laws: range, symmetry, identity on arbitrary ASCII") {
    import org.apache.spark.unsafe.types.UTF8String
    val sGen = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    check("jw-laws")(Prop.forAll(sGen, sGen) { (a, b) =>
      val f = graft.functions.StringSimilarity
      def u(s: String) = UTF8String.fromString(s)
      val ab = f.jaroWinkler(u(a), u(b))
      val ba = f.jaroWinkler(u(b), u(a))
      ab == ba && ab >= 0.0 && ab <= 1.0 &&
        f.jaroWinkler(u(a), u(a)) == 1.0 &&
        f.jaro(u(a), u(b)) <= ab + 1e-15
    })
  }

  test("kcore law: survivors shrink as k grows (same rounds)") {
    val edgeGen = Gen.choose(0, 20).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0, 8), Gen.choose(0, 8))))
    check("kcore-monotone")(Prop.forAll(edgeGen) { es =>
      import spark.implicits._
      val d = es.map { case (a, b) => (a.toString, b.toString) }.toDF("s", "t")
      def verts(k: Int): Set[String] =
        graft.operators.Graph.kcore(d, "s", "t", k, rounds = 2)
          .select("vertex").collect().map(_.getString(0)).toSet
      val v2 = verts(2)
      val v3 = verts(3)
      v3.subsetOf(v2)
    })
  }

  test("labelPropagation law: labels only ever come from the seed set") {
    val edgeGen = Gen.choose(1, 15).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0, 6), Gen.choose(0, 6))))
    val seedGen = Gen.choose(0, 4).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0, 6), Gen.oneOf("A", "B", "C"))))
    check("lp-closed")(Prop.forAll(edgeGen, seedGen) { (es, sd) =>
      import spark.implicits._
      val edges = es.map { case (a, b) => (a.toString, b.toString) }
        .toDF("s", "t")
      val seeds = sd.map { case (v, l) => (v.toString, l) }.toDF("v", "l")
      val out = graft.operators.Graph
        .labelPropagation(edges, "s", "t", seeds, "v", "l", iters = 2)
        .collect()
      val allowed = sd.map(_._2).toSet
      out.forall(r => r.isNullAt(1) || allowed(r.getString(1))) &&
        // clamping: every seed vertex present in the graph keeps a
        // seed-set label and is flagged
        out.filter(_.getBoolean(2)).forall(r => allowed(r.getString(1)))
    })
  }

  test("psi law: any distribution against itself scores exactly 0") {
    val gen = Gen.choose(1, 25).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0, 2), Gen.choose(-30, 30))))
    check("psi-self")(Prop.forAll(gen) { rows =>
      import spark.implicits._
      val d = rows.map { case (g, v) => (s"g$g", v.toDouble) }.toDF("g", "v")
      graft.operators.Profiling.psi(d, d, Seq("g"), "v", bins = 4)
        .collect().forall(_.getDouble(1) == 0.0)
    })
  }

  test("bootstrapMeanCI law: interval ordered and inside the value range") {
    val gen = Gen.choose(12, 25).flatMap(n => Gen.listOfN(n,
      Gen.choose(0L, 100L)))
    check("bootstrap-range")(Prop.forAll(gen) { vs =>
      import spark.implicits._
      val d = vs.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
        .toDF("g", "id", "v")
      val r = graft.operators.Sampling
        .bootstrapMeanCI(d, Seq("g"), "v", "id",
          replicas = 12, loRank = 2, hiRank = 11)
        .collect().head
      // empty replicas surface as NULL ranks; when both ends exist
      // they are ordered and bounded by the raw value range
      val ok = (r.isNullAt(2) || r.isNullAt(3)) || {
        val (lo, hi) = (r.getDouble(2), r.getDouble(3))
        lo <= hi && lo >= vs.min.toDouble && hi <= vs.max.toDouble
      }
      ok && r.getLong(4) == vs.size.toLong
    })
  }

  test("cohensKappa law: kappa <= 1, equal to 1 exactly at perfect agreement") {
    val gen = Gen.choose(1, 25).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.oneOf("x", "y", "z"), Gen.oneOf("x", "y", "z"))))
    check("kappa-bound")(Prop.forAll(gen) { rows =>
      import spark.implicits._
      val d = rows.toDF("a", "b")
      val r = graft.operators.RankEval
        .cohensKappa(d, col("a"), col("b")).collect().head
      val perfect = rows.forall { case (a, b) => a == b }
      r.isNullAt(3) || {
        val kp = r.getDouble(3)
        kp <= 1.0 && (!perfect || kp == 1.0)
      }
    })
  }

  test("ksTest law: bounded in [0,1], 1 on disjoint supports, 0 vs a clone") {
    check("ks-bounds")(Prop.forAll(rowsGen) { rows =>
      import spark.implicits._
      Prop(rows.nonEmpty) ==> {
        // two groups: "a" = values as-is, "b" = values shifted out of
        // a's support entirely (disjoint => KS must be exactly 1);
        // "c" = clone of a (identical multiset => KS(c vs rest)
        // bounded, KS in [0,1] always)
        val d = (rows.map(r => ("a", r._2.toDouble)) ++
          rows.map(r => ("b", r._2.toDouble + 1000.0)) ++
          rows.map(r => ("c", r._2.toDouble)))
          .toDF("g", "v")
        val out = graft.operators.Stats.ksTest(d, "g", "v").collect()
          .map(r => r.getString(0) -> r.getDouble(3)).toMap
        out("b") == 1.0 && out.values.forall(k => k >= 0.0 && k <= 1.0)
      }
    })
  }

  test("markovTransitions law: row-stochastic and pair-count-preserving") {
    check("markov-stochastic")(Prop.forAll(rowsGen) { rows =>
      import spark.implicits._
      Prop(rows.nonEmpty) ==> {
        val d = rows.zipWithIndex
          .map { case ((k, v), i) => (k, i, s"s${v % 4}") }
          .toDF("k", "o", "s")
        val out = graft.operators.Resample
          .markovTransitions(d, "k", "o", "o", "s").collect()
        val pairSum = out.map(_.getLong(2)).sum
        val expectedPairs = rows.groupBy(_._1).values
          .map(g => math.max(g.size - 1, 0)).sum
        val probByFrom = out.groupBy(_.getString(0))
          .view.mapValues(_.map(_.getDouble(3)).sum)
        pairSum == expectedPairs &&
          probByFrom.values.forall(p => math.abs(p - 1.0) < 1e-4)
      }
    })
  }

  test("kaplanMeier law: survival is non-increasing and in [0,1]") {
    check("km-monotone")(Prop.forAll(rowsGen) { rows =>
      import spark.implicits._
      Prop(rows.nonEmpty) ==> {
        val d = rows.map { case (k, v) => (v % 10, k % 2 == 0) }
          .toDF("duration", "obs")
        val curve = graft.operators.Stats
          .kaplanMeier(d, Seq.empty, "duration", col("obs"))
          .orderBy("duration").collect().map(_.getDouble(4))
        curve.forall(s => s >= 0.0 && s <= 1.0) &&
          curve.sliding(2).forall(w => w.length < 2 || w(0) >= w(1))
      }
    })
  }

  test("benford law: digit masses partition the nonzero rows") {
    check("benford-partition")(Prop.forAll(rowsGen) { rows =>
      import spark.implicits._
      val d = rows.map { case (k, v) => (k * 37 + v) / 7.0 }.toDF("v")
      val out = graft.operators.Stats.benford(d, "v").collect()
      val n = out.map(_.getLong(1)).sum
      val nonzero = rows.count { case (k, v) =>
        math.round(math.abs((k * 37 + v) / 7.0) * 100) > 0 }
      n == nonzero && out.length == 9
    })
  }

  test("weightedQuantile law: monotone in p and always an input value") {
    check("wq-monotone")(Prop.forAll(rowsGen) { rows =>
      import spark.implicits._
      Prop(rows.nonEmpty) ==> {
        val d = rows.map { case (k, v) => ("g", v.toDouble, (k + 1).toLong) }
          .toDF("g", "v", "w")
        val qs = Seq((1, 4), (1, 2), (3, 4), (1, 1)).map { case (n, den) =>
          graft.operators.Percentiles
            .weightedQuantile(d, Seq("g"), "v", "w", n, den)
            .collect().head.getDouble(2)
        }
        val values = rows.map(_._2.toDouble).toSet
        qs.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)) &&
          qs.forall(values.contains)
      }
    })
  }

  test("modularity law: bounded above by 1 and 0 for a single community") {
    check("modularity-bounds")(Prop.forAll(rowsGen) { rows =>
      import spark.implicits._
      val edges0 = rows.collect { case (k, v) if k != v % 6 =>
        (k.toLong, (v % 6).toLong) }
      Prop(edges0.nonEmpty) ==> {
        val edges = edges0.toDF("s", "d")
        val verts = edges0.flatMap(e => Seq(e._1, e._2)).distinct
        val one = verts.map(_ -> "x").toDF("v", "l")
        val own = verts.map(v => v -> s"c$v").toDF("v", "l")
        val g = graft.operators.Graph
        val qOne = g.modularity(edges, "s", "d", one, "v", "l")
          .collect().head.getDouble(0)
        val qOwn = g.modularity(edges, "s", "d", own, "v", "l")
          .collect().head.getDouble(0)
        // single community is exactly 0; singleton communities have
        // zero intra mass, so Q = -sum(d_c^2)/4m^2 < 0; both <= 1
        qOne == 0.0 && qOwn < 0.0 && qOwn >= -1.0
      }
    })
  }

  private val edgesGen: Gen[List[(String, String)]] =
    Gen.choose(1, 20).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0, 7), Gen.choose(0, 7))))
      .map(_.collect { case (a, b) if a != b => (s"v$a", s"v$b") })
      .suchThat(_.nonEmpty)

  test("betweenness2 conserves mass: scores sum to the count of " +
      "distance-2 pairs (each pair distributes exactly one unit)") {
    check("betweenness-conservation")(Prop.forAll(edgesGen) { es =>
      import spark.implicits._
      val g = es.toDF("s", "t")
      val rows = graft.operators.Graph.betweenness2(g, "s", "t").collect()
      val total = rows.map(_.getDouble(2)).sum
      // reference distance-2 pair count on the undirected simple graph
      val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
      val verts = adj.keySet.toSeq
      val d2 = (for {
        s <- verts; t <- verts if s < t
        if !adj(s).contains(t)
        if adj(s).exists(adj(t).contains) // some common neighbor
      } yield 1).size
      // each vertex's score is rounded once at 6 dp -> absolute slack
      math.abs(total - d2) < 1e-4
    })
  }

  test("ktruss invariants at ANY fixed round count: output ⊆ input, " +
      "k+1-truss ⊆ k-truss, and one more round only shrinks") {
    val p = SCTest.Parameters.default
      .withMinSuccessfulTests(6).withWorkers(1)
    val res = SCTest.check(p, Prop.forAll(edgesGen,
        Gen.choose(3, 4)) { (es, k) =>
      import spark.implicits._
      val g = es.toDF("s", "t")
      val canon = es.map { case (a, b) =>
        (Seq(a, b).min, Seq(a, b).max) }.toSet
      def truss(kk: Int, r: Int) =
        graft.operators.Graph.ktruss(g, "s", "t", kk, rounds = r)
          .collect().map(x => (x.getString(0), x.getString(1))).toSet
      val e1 = truss(k, 1)
      val e2 = truss(k, 2)
      val tighter = truss(k + 1, 1)
      e1.subsetOf(canon) && e2.subsetOf(e1) && tighter.subsetOf(e1)
    })
    assert(res.passed, s"ktruss invariants failed: ${res.status}")
  }

  test("huberMean is affine-equivariant: huber(a·x + b) = a·huber(x) + b") {
    check("huber-equivariance")(Prop.forAll(rowsGen.suchThat(_.size >= 3),
        Gen.choose(1, 5), Gen.choose(-50, 50)) { (rows, a, b) =>
      import spark.implicits._
      val base = rows.map { case (_, v) => ("g", v.toDouble) }.toDF("g", "x")
      val scaled = rows.map { case (_, v) => ("g", a * v.toDouble + b) }
        .toDF("g", "x")
      val h0 = graft.operators.Stats.huberMean(base, "g", "x")
        .collect().head.getDouble(4)
      val h1 = graft.operators.Stats.huberMean(scaled, "g", "x")
        .collect().head.getDouble(4)
      math.abs(h1 - (a * h0 + b)) < 1e-4
    })
  }
}
