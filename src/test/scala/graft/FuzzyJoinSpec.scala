package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("self-join finds substitution, insertion, deletion; not distance 2") {
    val df = Seq((1L, "cat"), (2L, "cut"), (3L, "cats"), (4L, "at"),
      (5L, "dog"), (6L, "cat")).toDF("id", "s")
    val got = FuzzyJoin.editDistance1SelfJoin(df, "id", "s")
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(got((1L, 2L)) === 1) // substitution
    assert(got((1L, 3L)) === 1) // insertion
    assert(got((1L, 4L)) === 1) // deletion
    assert(got((1L, 6L)) === 0) // exact duplicate rides along
    assert(!got.keySet.exists { case (i, j) => i == 5L || j == 5L },
      "dog is >1 away from everything")
  }

  test("matches brute-force levenshtein over a generated corpus") {
    val words = Seq("ring", "rings", "rink", "blue bolt", "blue belt",
      "blu bolt", "red widget", "red gadget", "small ring", "smal ring",
      "x", "", "xy")
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "s")
    val brute = df.as("a").join(df.as("b"), col("a.id") < col("b.id"))
      .withColumn("d", levenshtein(col("a.s"), col("b.s")))
      .filter(col("d") <= 1)
      .select(col("a.id"), col("b.id"), col("d"))
      .as[(Long, Long, Int)].collect().toSet
    val fast = FuzzyJoin.editDistance1SelfJoin(df, "id", "s")
      .as[(Long, Long, Int)].collect().toSet
    assert(fast === brute)
  }

  test("a document-length string fails loudly instead of exploding the join") {
    val df = Seq((1L, "ok"), (2L, "x" * 1001)).toDF("id", "s")
    val ex = intercept[Exception] {
      FuzzyJoin.editDistance1SelfJoin(df, "id", "s").collect()
    }
    assert(ex.getMessage.contains("longer than"), ex.getMessage)
  }

  test("two-table variant matches dirty strings to a reference list") {
    val ref = Seq((1L, "paris"), (2L, "london")).toDF("rid", "name")
    val dirty = Seq((10L, "pariss"), (11L, "lndon"), (12L, "tokyo"),
      (13L, null.asInstanceOf[String])).toDF("did", "name")
    val got = FuzzyJoin.editDistance1Join(
        dirty, "did", "name", ref, "rid", "name")
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((10L, 1L, 1), (11L, 2L, 1)))
  }

  test("qgramEditJoin == brute-force levenshtein at maxDist=2") {
    val df = Seq(
      (1L, "spark engine"), (2L, "spurk enjine"), // 2 substitutions
      (3L, "spark enginex"),                      // 1 insert vs id 1
      (4L, "wholly other"),
      (5L, "spark puddle")).toDF("id", "s")
    val got = FuzzyJoin.qgramEditJoin(df, "id", "s", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    // brute force over all 10 pairs
    val strs = Map(1L -> "spark engine", 2L -> "spurk enjine",
      3L -> "spark enginex", 4L -> "wholly other", 5L -> "spark puddle")
    val want = (for {
      i <- strs.keys; j <- strs.keys if i < j
      d = EditDistanceRef.levenshtein(strs(i), strs(j)) if d <= 2
    } yield (i, j, d)).toSet
    assert(got === want)
    // planted: (1,2) two substitutions; (1,3) one insert; (2,3) is
    // distance 3 (2 subs + 1 insert) and correctly absent
    assert(want === Set((1L, 2L, 2), (1L, 3L, 1)),
      "fixture sanity: the planted distances")
  }

  test("qgramEditJoin rejects strings too short for the recall guarantee") {
    val df = Seq((1L, "tiny!"), (2L, "spark engine")).toDF("id", "s")
    val ex = intercept[Exception] {
      FuzzyJoin.qgramEditJoin(df, "id", "s", maxDist = 2).collect()
    }
    assert(ex.getMessage.contains("cannot guarantee recall"), ex.getMessage)
  }

  test("sortedNeighborhoodJoin: adjacent-in-sort pairs found, far pairs skipped") {
    val df = Seq(
      (1L, "apple pie"), (2L, "apple pia"), // adjacent after sort
      (3L, "apricot"),                      // same block, > dist 2
      (4L, "azzzz last in block"),          // pushes 1-2 adjacency test
      (5L, "banana")).toDF("id", "s")
    val out = FuzzyJoin.sortedNeighborhoodJoin(df, "id", "s",
        window = 2, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out.keySet == Set((1L, 2L)), s"only the planted pair: $out")
    assert(out((1L, 2L)) == 1)
  }

  test("sortedNeighborhoodJoin heuristic contract: outside the window or block, no pair") {
    // w=1: "aa" and "ac" are 2 apart in sort order (ab between) -> missed
    val gap = Seq((1L, "aa"), (2L, "ab x"), (3L, "ac")).toDF("id", "s")
    val g = FuzzyJoin.sortedNeighborhoodJoin(gap, "id", "s",
      window = 1, maxDist = 2).collect()
    assert(!g.exists(r => r.getLong(0) == 1L && r.getLong(1) == 3L),
      "beyond the window: documented miss")
    // different first char: never compared even at distance 1
    val blocks = Seq((1L, "aaaa"), (2L, "baaa")).toDF("id", "s")
    assert(FuzzyJoin.sortedNeighborhoodJoin(blocks, "id", "s",
      window = 3, maxDist = 2).isEmpty)
  }

  test("sortedNeighborhoodJoin emits canonical i < j ids and respects maxDist") {
    // high id sorts FIRST: canonicalization must still put lower id left
    val df = Seq((9L, "zebra a"), (1L, "zebra b")).toDF("id", "s")
    val out = FuzzyJoin.sortedNeighborhoodJoin(df, "id", "s",
      window = 1, maxDist = 1).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 9L)
  }

  test("fellegiSunterWeights: exact m/u from a labeled pair table; " +
      "degenerate cells NULL, not infinite") {
    import spark.implicits._
    // 2 matches (f1 agrees on both, f2 on one); 3 non-matches
    // (f1 agrees once, f2 never)
    val pairs = Seq(
      (true, true, true), (true, true, false),
      (false, true, false), (false, false, false),
      (false, false, false)).toDF("lbl", "f1", "f2")
    val out = graft.operators.FuzzyJoin.fellegiSunterWeights(pairs,
        col("lbl"), Seq("f1" -> col("f1"), "f2" -> col("f2")))
      .collect().map(r => r.getString(0) -> r).toMap
    val f1 = out("f1")
    assert(f1.getLong(1) == 2L && f1.getLong(2) == 3L)
    assert(f1.getDouble(3) == 1.0 && f1.getDouble(4) == 0.333333)
    // w+ = log2((2/2)/(1/3)) = log2(3); m = 1 -> disagreement weight NULL
    assert(f1.getDouble(5) == 1.584963, f1.toString)
    assert(f1.isNullAt(6), "m = 1 must not produce -inf")
    val f2 = out("f2")
    assert(f2.getDouble(3) == 0.5 && f2.getDouble(4) == 0.0)
    assert(f2.isNullAt(5), "u = 0 must not produce +inf")
    // w- = log2((1-0.5)/(1-0)) = -1
    assert(f2.getDouble(6) == -1.0, f2.toString)
  }

  test("fellegiSunterEm: unsupervised EM recovers the labeled m/u on " +
      "a planted two-class design; deterministic re-run") {
    import spark.implicits._
    // 100 planted matches (agreement ~90%/80%/70%) among 900
    // non-matches (~10%/5%/20%). Fields draw from INDEPENDENT
    // deterministic hashes — correlated fields (e.g. all keyed on
    // i % 10) would break conditional independence and EM would
    // rightly find a different latent split than the labels
    def h(i: Int, salt: Int): Double =
      (scala.util.hashing.MurmurHash3.stringHash(s"$i#$salt")
        & 0x7fffffff) / 2147483647.0
    val rows = (0 until 1000).map { i =>
      val mt = i < 100
      val a0 = if (mt) h(i, 1) < 0.95 else h(i, 1) < 0.05
      val a1 = if (mt) h(i, 2) < 0.9 else h(i, 2) < 0.05
      val a2 = if (mt) h(i, 3) < 0.85 else h(i, 3) < 0.1
      (mt, a0, a1, a2)
    }
    val df = rows.toDF("is_match", "a0", "a1", "a2")
    val fields = Seq("f0" -> col("a0"), "f1" -> col("a1"),
      "f2" -> col("a2"))
    val labeled = graft.operators.FuzzyJoin
      .fellegiSunterWeights(df, col("is_match"), fields)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(3), r.getDouble(4)))).toMap
    val em = graft.operators.FuzzyJoin
      .fellegiSunterEm(df.select("a0", "a1", "a2"), fields, passes = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // EM's posterior-weighted m/u lands within a tenth of the
    // labeled rates (3 binary fields = 8 patterns; the ambiguous
    // patterns carry partial mass by design, so exact equality is
    // not the right claim)
    fields.map(_._1).foreach { f =>
      val (ml, ul) = labeled(f)
      val (_, me, ue) = em(f)
      assert(math.abs(me - ml) < 0.1, s"$f: em m=$me labeled m=$ml")
      assert(math.abs(ue - ul) < 0.1, s"$f: em u=$ue labeled u=$ul")
    }
    // prevalence recovers the planted 10%
    assert(math.abs(em("f0")._1 - 0.1) < 0.05, em.toString)
    // frozen params: bit-identical on re-run
    val again = graft.operators.FuzzyJoin
      .fellegiSunterEm(df.select("a0", "a1", "a2"), fields, passes = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(again == em)
    intercept[IllegalArgumentException] {
      graft.operators.FuzzyJoin.fellegiSunterEm(df, fields, passes = 9)
    }
  }
}
