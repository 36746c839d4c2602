package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Unit coverage for the text operators without a DuckDB oracle:
  * marker-based language ID and the regex (BPE-ish) token counter.
  * (tokenize/wordCounts/tfidf/textStats/quality are oracle-verified
  * via their judged queries.)
  */
class TextAnalysisSpec extends SparkTestBase {

  test("readability: hand-counted Flesch components; fragment floors at 1") {
    import spark.implicits._
    // "the cat sat. it sat!" -> words=5? chars-minus-spaces+1 counts
    // exactly the whitespace gaps: 4 spaces + 1 = 5 words; sentences:
    // runs of [.!?] -> 2; vowel groups of lowercase: e,a,a,i,a -> 5
    val docs = Seq(("en", "the cat sat. it sat!"),
      ("en", "no punctuation here")).toDF("lang", "text")
    val r = graft.operators.TextAnalysis
      .readability(docs, "text", Seq("lang")).collect().head
    assert(r.getAs[Long]("words") === 5L + 3L, r.toString)
    // doc 2 has no [.!?]: floors at 1 sentence
    assert(r.getAs[Long]("sentences") === 2L + 1L, r.toString)
    // doc2 vowel groups: o, u(+a? "punctuation" -> u,ua,io), e,e ->
    // no|punctuation|here = o + (u, ua, io) + (e, e) = 6
    assert(r.getAs[Long]("syllables") === 5L + 6L, r.toString)
    val w = 8.0; val s = 3.0; val y = 11.0
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("flesch")
      == r6(206.835 - 1.015 * (w / s) - 84.6 * (y / w)), r.toString)
    assert(r.getAs[Double]("fk_grade")
      == r6(0.39 * (w / s) + 11.8 * (y / w) - 15.59), r.toString)
    // zero-word group: NULL scores, not a crash
    val empty = Seq(("x", "")).toDF("lang", "text")
    val re = graft.operators.TextAnalysis
      .readability(empty, "text", Seq("lang")).collect().head
    assert(re.getAs[Long]("words") >= 1L || re.isNullAt(re.fieldIndex("flesch")))
  }

  test("languageId picks the language with most marker hits, 'und' if none") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the cat and the dog walk over the bridge"),
      (1L, "der hund und die katze gehen los"),
      (2L, "xyzzy plugh qwerty"),
      (3L, "the und"), // tie at 1 hit each -> deterministic (sorted langs, strict >)
    ).toDF("doc_id", "text")
    val markers = Map(
      "en" -> Seq("the", "and", "over"),
      "de" -> Seq("der", "und", "die"))
    val out = TextAnalysis.languageId(docs, "text", markers)
      .select("doc_id", "lang_pred")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) === "en")
    assert(out(1L) === "de")
    assert(out(2L) === "und", "no marker hits => undetermined")
    assert(out(3L) === "de", "ties break toward the first language in sort order")
    // score columns must not leak into the output
    val cols = TextAnalysis.languageId(docs, "text", markers).columns
    assert(!cols.exists(_.startsWith("score_")))
  }

  test("from-counts duals ≡ tokenize-from-scratch forms, row-identical") {
    import spark.implicits._
    // fixture with repeated tokens, shared vocabulary across docs,
    // empty-token runs (double spaces), and a group column — every
    // feature the duals must carry through identically
    val docs = Seq(
      (0L, "a", "spark query engine  spark spark"),
      (1L, "a", "query planner query query engine"),
      (2L, "b", "spark spark  spark engine engine"),
      (3L, "b", "lonely"),
      (4L, "a", "query spark")
    ).toDF("doc_id", "source", "text")
    val counts = TextAnalysis.tokenCounts(docs, "doc_id", "text")
      .localCheckpoint()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.toList).sortBy(_.toString).toList
    assert(rows(TextAnalysis.wordCountsFromCounts(counts))
      == rows(TextAnalysis.tokenize(docs, "doc_id", "text")
          .groupBy("tok").agg(count(lit(1)).as("cnt"))),
      "wordCounts dual")
    assert(rows(TextAnalysis.tokenEntropyFromCounts(counts))
      == rows(TextAnalysis.tokenEntropy(docs, "doc_id", "text")),
      "tokenEntropy dual")
    assert(rows(TextAnalysis.booleanRetrieveFromCounts(counts,
        Seq("spark", "query"), minMatch = 2))
      == rows(TextAnalysis.booleanRetrieve(docs, "doc_id", "text",
        Seq("spark", "query"), minMatch = 2)),
      "booleanRetrieve dual")
    assert(rows(TextAnalysis.postingListsFromCounts(counts,
        minDf = 1, maxDf = 4, maxPostings = 2))
      == rows(TextAnalysis.postingLists(docs, "doc_id", "text",
        minDf = 1, maxDf = 4, maxPostings = 2)),
      "postingLists dual")
    assert(rows(TextAnalysis.unigramDriftFromCounts(counts,
        docs.select("doc_id", "source"), "source"))
      == rows(TextAnalysis.unigramDrift(docs, "source", "text")),
      "unigramDrift dual")
    assert(rows(TextAnalysis.naiveBayesPredict(docs, "doc_id", "source",
        "text", pretok = Some(counts)))
      == rows(TextAnalysis.naiveBayesPredict(docs, "doc_id", "source", "text")),
      "naiveBayes pretok")
  }

  test("redactPii scrubs urls, emails, and long digit runs — in that order") {
    import spark.implicits._
    val df = Seq(
      ("mail me at bob.smith+x@corp.example.org today",
       "mail me at <EMAIL> today"),
      ("see https://a.example.com/path?q=1 for details",
       "see <URL> for details"),
      ("card 4111111111111 expires 12 25",
       "card <NUM> expires 12 25"), // short digit runs survive
      ("go to http://e.com/u@x.com now", "go to <URL> now"), // url wins over email
      ("clean text stays clean", "clean text stays clean"),
    ).toDF("text", "expected")
    val got = df.select(TextAnalysis.redactPii(col("text")).as("clean"),
      col("expected")).collect()
    got.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("contamination flags docs sharing n-grams with the eval set") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps high"),   // shares 'the quick brown' + 'quick brown fox'
      (2L, "completely unrelated training text"),
      (3L, "fox jumps high over fences"),       // shares no 3-gram with eval
    ).toDF("doc_id", "text")
    val eval_ = Seq((100L, "the quick brown fox sleeps")).toDF("doc_id", "text")
    val out = TextAnalysis.contamination(train, eval_, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L), s"got $out")
  }

  test("repetitionScore flags template spam, not natural text") {
    import spark.implicits._
    val df = Seq(
      (1L, "buy now buy now buy now buy now"),  // bigram 'buy now' dominates
      (2L, "the quick brown fox jumps over fences"),
      (3L, "solo"),                             // < 2 tokens => no bigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionScore(df, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(!out.contains(3L), "sub-n docs emit nothing")
    // doc 1: 7 bigrams, 'buy now' x4 => 4/7
    assert(math.abs(out(1L)._1 - 4.0 / 7) < 1e-6 && out(1L)._2 === 7L)
    // doc 2: 6 distinct bigrams => top fraction 1/6
    assert(math.abs(out(2L)._1 - 1.0 / 6) < 1e-6)
    assert(out(1L)._1 > 3 * out(2L)._1, "spam scores far above natural text")
  }

  test("chunk: overlapping windows, short tail, sub-window docs") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 12).map(i => s"w$i").mkString(" ")), // 12 tokens
      (2L, "a b c"),                                  // shorter than one window
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(df, "doc_id", "text", chunkTokens = 5, stride = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val doc1 = out.filter(_._1 == 1L)
    assert(doc1.map(_._3).toSeq === Seq(
      "w1 w2 w3 w4 w5", "w5 w6 w7 w8 w9", "w9 w10 w11 w12"),
      "stride-4 windows overlap by one token; tail is short")
    assert(doc1.map(_._4).toSeq === Seq(5L, 5L, 4L))
    val doc2 = out.filter(_._1 == 2L)
    assert(doc2.toSeq === Seq((2L, 0L, "a b c", 3L)),
      "sub-window doc yields exactly one short chunk")

    // a tail window fully contained in its predecessor is NOT emitted:
    // 9 tokens, ct=5, stride=4 => window at 8 is just token 9, already
    // covered by the window at 4 (tokens 5-9)
    val nine = Seq((3L, (1 to 9).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val chunks9 = TextAnalysis.chunk(nine, "doc_id", "text", 5, 4)
      .collect().map(_.getString(2)).toSeq
    assert(chunks9 === Seq("t1 t2 t3 t4 t5", "t5 t6 t7 t8 t9"),
      "contained tail window must be dropped")
  }

  test("regexTokenCount counts word + punctuation atoms, BPE-ish") {
    import spark.implicits._
    val df = Seq(
      ("hello world", 2),
      ("don't stop", 4),        // don ' t stop
      ("a,b", 3),               // a , b
      ("x", 1),
    ).toDF("text", "expected")
    val got = df.select(
      TextAnalysis.regexTokenCount(col("text")).as("n"), col("expected"))
      .collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1),
      s"token count mismatch: got ${r.getInt(0)}, want ${r.getInt(1)}"))
  }

  test("repeatedSpans finds cross-doc n-token spans, counts docs once") {
    import spark.implicits._
    val df = Seq(
      (0L, "the quick brown fox jumps over it"),
      (1L, "a lazy dog saw the quick brown fox jumps far away"),
      (2L, "the quick brown fox jumps the quick brown fox jumps"), // twice in ONE doc
      (3L, "nothing shared here at all today friends"),
    ).toDF("doc_id", "text")
    val spans = TextAnalysis.repeatedSpans(df, "doc_id", "text", n = 5, minDocs = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(spans("the quick brown fox jumps") === 3L,
      "doc 2's internal repeat counts it ONCE (distinct docs)")
    // sub-spans shared by the same 3 docs also qualify; nothing from doc 3
    assert(spans.keys.forall(_.split(' ').length == 5))
    assert(!spans.keys.exists(_.contains("nothing")))
    // minDocs=4 excludes everything (only 3 docs share any span)
    assert(TextAnalysis.repeatedSpans(df, "doc_id", "text", 5, 4).count() === 0L)
  }

  test("maximalRepeatedSpans: a shared block reports as ONE maximal span; " +
      "isolated anchors degenerate to the fixed-n output") {
    import spark.implicits._
    // docs 0 and 1 share a 7-token block -> every 5-gram inside it is
    // a (>=2)-doc anchor, and the 3 consecutive anchors fuse into one
    // 7-token maximal span per doc
    val df = Seq(
      (0L, "xx one two three four five six seven yy zz"),
      (1L, "aa bb one two three four five six seven cc"),
      (2L, "totally different text with no shared blocks at all"),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.maximalRepeatedSpans(df, "doc_id", "text",
        minLen = 5, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getString(3))).toSet
    assert(got === Set(
      (0L, 1L, 7, "one two three four five six seven"),
      (1L, 2L, 7, "one two three four five six seven")), got.toString)
    // isolated anchors (no adjacent flagged grams): len == minLen and
    // the span set == the fixed-n repeatedSpans detections
    val iso2 = Seq(
      (0L, "k1 k2 shared1 shared2 shared3 shared4 shared5 k3 k4"),
      (1L, "j1 shared1 shared2 shared3 shared4 shared5 j2 j3 j4"),
    ).toDF("doc_id", "text")
    val m = TextAnalysis.maximalRepeatedSpans(iso2, "doc_id", "text", 5, 2)
      .collect()
    val fixed = TextAnalysis.repeatedSpans(iso2, "doc_id", "text", 5, 2)
      .collect().map(_.getString(0)).toSet
    assert(m.forall(_.getInt(2) === 5), m.mkString(","))
    assert(m.map(_.getString(3)).toSet === fixed)
  }

  test("maximalRepeatedSpans: partner change truncates per doc (the " +
      "per-doc cut semantics)") {
    import spark.implicits._
    // doc 0 shares its left 4-gram with doc 1 and its right 4-gram
    // with doc 2, but the grams BRIDGING the halves ("u2 u3 m1 v1",
    // "u3 m1 v1 v2") appear nowhere else — so doc 0 reports two
    // separate maximal spans, NOT one fused block: a span is only as
    // long as its every interior gram is actually repeated
    val df = Seq(
      (0L, "u1 u2 u3 m1 v1 v2 v3"),
      (1L, "u1 u2 u3 m1 x1 x2 x3"),
      (2L, "y1 y2 y3 m1 v1 v2 v3"),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.maximalRepeatedSpans(df, "doc_id", "text",
        minLen = 4, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(got === Set(
      (0L, "u1 u2 u3 m1"), (0L, "m1 v1 v2 v3"),
      (1L, "u1 u2 u3 m1"),
      (2L, "m1 v1 v2 v3")), got.toString)
  }

  test("lmScore: hand-computed bigram log-probabilities") {
    import spark.implicits._
    val df = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x y"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(df, "doc_id", "text", k = 0.5)
      .as[(Long, Double)].collect().toMap
    // c2: "a b"->3, "b a"->1, "x y"->1; c1: a->3, b->1, x->1; V=3
    val pAB = math.log(3.5 / 4.5); val pLow = math.log(1.5 / 2.5)
    assert(math.abs(got(1L) - (2 * pAB + pLow) / 3) < 1e-9)
    assert(math.abs(got(2L) - pAB) < 1e-9)
    assert(math.abs(got(3L) - pLow) < 1e-9)
  }

  test("lmScoreCross: unseen bigrams get the smoothed floor, not null") {
    import spark.implicits._
    val train = Seq((1L, "a b c")).toDF("doc_id", "text")
    val score = Seq((9L, "p q")).toDF("doc_id", "text")
    val got = TextAnalysis.lmScoreCross(train, score, "doc_id", "text", k = 0.5)
      .as[(Long, Double)].collect().toMap
    // unseen bigram + unseen context, V = |{b, c}| = 2: p = 0.5/(0.5*2)
    assert(math.abs(got(9L) - math.log(0.5)) < 1e-9)
  }

  test("lmScore ranks a repeated fluent phrase above rare word salad") {
    import spark.implicits._
    val df = (1L to 5L).map(i => (i, "the cat sat on the mat")).toDF("doc_id", "text")
      .union(Seq((99L, "zqx wvk jjf pmr qqt lzn")).toDF("doc_id", "text"))
    val got = TextAnalysis.lmScore(df, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(got(1L) > got(99L))
  }

  test("normalize: lowercases, strips punctuation, collapses whitespace") {
    import spark.implicits._
    val df = Seq(
      (1L, "Hello, WORLD!!"),
      (2L, "  spaced   out\ttabs  "),
      (3L, "already clean text"),
      (4L, "__under_scores__ and #42 digits"),
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextAnalysis.normalize(col("text")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "hello world")
    assert(got(2L) === "spaced out tabs")
    assert(got(3L) === "already clean text", "clean text is a fixpoint")
    assert(got(4L) === "under scores and 42 digits")
    // idempotence: normalizing twice changes nothing
    val twice = df.select(col("doc_id"),
        TextAnalysis.normalize(TextAnalysis.normalize(col("text"))).as("n"))
      .as[(Long, String)].collect().toMap
    assert(twice === got)
  }

  test("tokenEntropy: 0 for constant docs, ln(n) for uniform docs") {
    import spark.implicits._
    val df = Seq((1L, "a a a a"), (2L, "a b c d"), (3L, "solo"),
      (4L, "a a b b c c")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(df, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L)._1 === 4L && got(1L)._2 === 1L)
    assert(math.abs(got(1L)._3) < 1e-12, "one repeated token carries no entropy")
    assert(math.abs(got(2L)._3 - math.log(4)) < 1e-12, "uniform = ln(n)")
    assert(math.abs(got(3L)._3) < 1e-12)
    assert(math.abs(got(4L)._3 - math.log(3)) < 1e-12,
      "uniform over 3 distinct tokens regardless of multiplicity")
  }

  test("tokenEntropy separates repetitive spam repetitionScore-style rules can miss") {
    import spark.implicits._
    // spam spread over TWO alternating tokens: top-1-ngram fraction is
    // only 0.5, but entropy ln(2) ~ 0.69 is far below natural text's
    val df = Seq((1L, "buy now buy now buy now buy now"),
      (2L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(df, "doc_id", "text")
      .select("doc_id", "entropy").as[(Long, Double)].collect().toMap
    assert(got(1L) < 0.8 && got(2L) > 1.9)
  }

  test("bm25: rare terms outrank common terms; ranks are dense per doc") {
    import spark.implicits._
    val df = Seq((1L, "apple banana"), (2L, "banana cherry"),
      (3L, "banana durian")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(df, "doc_id", "text", k = 2)
      .as[(Long, Long, String, Double)].collect()
    val byDoc = got.groupBy(_._1)
    assert(byDoc(1L).sortBy(_._2).map(_._3).toSeq === Seq("apple", "banana"),
      "df=1 apple must outrank df=3 banana")
    assert(got.forall(_._4 > 0.0), "idf ln(1 + x) is always positive")
    byDoc.values.foreach(rows =>
      assert(rows.map(_._2).sorted.toSeq === (1L to rows.length).toSeq))
  }

  test("removeRepeatedSpans cuts covered tokens, preserves rows and short docs") {
    import spark.implicits._
    val boiler = "click here to subscribe now"
    val df = Seq(
      (1L, s"alpha beta $boiler gamma"),
      (2L, s"$boiler delta epsilon"),
      (3L, s"unique words only in this document right here"),
      (4L, boiler),          // fully boilerplate -> ''
      (5L, "too short"),     // < n tokens: passes through
    ).toDF("doc_id", "text")
    val got = TextAnalysis.removeRepeatedSpans(df, "doc_id", "text",
        n = 5, minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "alpha beta gamma")
    assert(got(2L) === "delta epsilon")
    assert(got(3L) === "unique words only in this document right here")
    assert(got(4L) === "")
    assert(got(5L) === "too short")
    assert(got.size === 5, "row-preserving")
    // overlapping occurrences union: 6x 'spam' has 2 flagged 5-gram
    // starts (pos 0 and 1) covering all 6 tokens
    val rep = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "spam spam spam spam spam"),
      (3L, "spam spam spam spam spam x"),
    ).toDF("doc_id", "text")
    val cleaned = TextAnalysis.removeRepeatedSpans(rep, "doc_id", "text",
        n = 5, minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned === Map(1L -> "", 2L -> "", 3L -> "x"))
  }

  test("unigramDrift: identical slices score 0; drifted slice positive, exact") {
    import spark.implicits._
    val same = Seq((1L, "s1", "a b"), (2L, "s2", "a b"))
      .toDF("doc_id", "source", "text")
    val zero = TextAnalysis.unigramDrift(same, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(zero.values.forall(v => math.abs(v) < 1e-12),
      s"identical distributions must have zero KL: $zero")
    // s1 = {a:2}, s2 = {a:1, b:1}; corpus = {a:3, b:1}
    // KL(s1) = 1.0 * ln(1.0 / 0.75); KL(s2) = .5 ln(.5/.75) + .5 ln(.5/.25)
    val drifted = Seq((1L, "s1", "a a"), (2L, "s2", "a b"))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.unigramDrift(drifted, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("s1") - math.log(1.0 / 0.75)) < 1e-12)
    assert(math.abs(got("s2") -
      (0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25))) < 1e-12)
    // Gibbs: KL >= 0 on the real corpus
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val real = TextAnalysis.unigramDrift(docs, "source", "text")
    assert(real.filter(col("kl") < -1e-12).count() === 0L)
  }

  test("oovRate endpoints: all-in-vocab 0, all-oov 1, empty 0, mixed exact") {
    import spark.implicits._
    val vocab = Seq("join", "scan")
    val df = Seq(
      (1L, "join scan join"),      // all in vocab -> 0.0
      (2L, "zzz qqq"),             // all oov -> 1.0
      (3L, ""),                    // empty -> 0.0 (no NaN/null)
      (4L, "join zzz scan qqq"),   // 2/4 oov
      (5L, "JOIN Scan"),           // case folds before lookup
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextAnalysis.oovRate(col("text"), vocab).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) === 0.0)
    assert(got(2L) === 1.0)
    assert(got(3L) === 0.0)
    assert(got(4L) === 0.5)
    assert(got(5L) === 0.0)
  }

  test("bm25 tf saturation: doubling tf must not double the score (unlike tfidf)") {
    import spark.implicits._
    val df = Seq((1L, "term term term term filler"),
      (2L, "term filler aaa bbb ccc"), (3L, "zzz yyy xxx www vvv")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(df, "doc_id", "text", k = 5)
      .filter(col("tok") === "term")
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    assert(got(1L) > got(2L), "higher tf still scores higher")
    assert(got(1L) < 2.5 * got(2L),
      s"k1 saturation must compress 4x tf below 2.5x score, got ${got(1L) / got(2L)}")
  }

  test("contaminationScoreBloom: docs shorter than n score 0.0, no crash") {
    import spark.implicits._
    import graft.operators.Dedup
    val train = Seq((1L, "one two"), (2L, ""), (3L, "a b c d e"))
      .toDF("doc_id", "text")
    val evalSet = Seq((9L, "a b c d e")).toDF("doc_id", "text")
    val out = TextAnalysis.contaminationScoreBloom(train, evalSet,
        "doc_id", "text", n = 3, expectedShingles = 100L, fpp = 1e-6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) === 0.0 && out(2L) === 0.0,
      "short/empty docs have no shingles: nothing to leak")
    assert(out(3L) === 1.0, "a verbatim eval doc is fully contaminated")
  }

  test("contaminationScoreBloom: one-sided error — never misses, zero proves clean") {
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val evalSet = docs.filter(col("doc_id") % 10 === 0)
    val nsh = Dedup.shingles(train, "doc_id", "text", 3)
      .groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    val exactFrac = TextAnalysis.contamination(train, evalSet, "doc_id", "text", 3)
      .join(nsh, "doc_id")
      .select(col("doc_id"), (col("n_shared") / col("nsh")).as("f"))
    val score = TextAnalysis.contaminationScoreBloom(train, evalSet,
      "doc_id", "text", 3, expectedShingles = 100000L, fpp = 1e-6)
    val joined = score.join(exactFrac, Seq("doc_id"), "left")
      .select(col("doc_id"), col("contamination_score"),
        coalesce(col("f"), lit(0.0)).as("f")).cache()
    assert(joined.count() === train.count(), "row-preserving over train")
    // no false negatives: the bloom score can only overshoot the truth
    assert(joined.filter(col("contamination_score") < col("f") - 1e-9)
      .count() === 0L)
    assert(joined.filter(col("f") > 0 && col("contamination_score") === 0.0)
      .count() === 0L, "score 0 must prove cleanliness")
    // at fpp 1e-6 the flagged set is the exact set give or take a
    // handful of fp docs
    val exactPos = joined.filter(col("f") > 0).count()
    val bloomPos = joined.filter(col("contamination_score") > 0).count()
    assert(bloomPos >= exactPos && bloomPos <= exactPos + 5,
      s"flagged sets should nearly coincide: exact=$exactPos bloom=$bloomPos")
    joined.unpersist()
  }

  test("sparseCosinePairs: identical docs cos~1, disjoint absent, maxDf prunes") {
    import spark.implicits._
    val df = Seq(
      (1L, "aa bb cc dd"),
      (2L, "aa bb cc dd"),      // identical to 1 -> cos 1 on surviving terms
      (3L, "ee ff gg hh"),      // disjoint -> no pair
      (4L, "aa aa aa aa"))      // shares only the pruned hot term
      .toDF("doc_id", "text")
    // maxDf=2: "aa" is in 3 docs -> pruned; bb/cc/dd survive (df 2)
    val pairs = TextAnalysis.sparseCosinePairs(df, "doc_id", "text",
        minCosine = 0.01, maxDf = 2)
      .select("i", "j", "cos").as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)),
      "only the identical pair shares surviving terms")
    assert(math.abs(pairs.head._3 - 1.0) < 1e-9)
  }

  test("vocabCoverage: monotone curve, exact shares, reaches 1 at full vocab") {
    import spark.implicits._
    val df = Seq((1L, "a a a b b c"), (2L, "a b  c")).toDF("doc_id", "text")
    // counts: a=4 b=3 c=2 (empty token from the double space excluded), total 9
    val full = TextAnalysis.vocabCoverage(df, "doc_id", "text", topK = 10)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("tok"),
        r.getAs[Long]("cnt"), r.getAs[Double]("cum_share")))
    assert(full.map(t => (t._1, t._2, t._3)).toSeq ===
      Seq((1L, "a", 4L), (2L, "b", 3L), (3L, "c", 2L)))
    assert(math.abs(full(0)._4 - 4.0 / 9) < 1e-12)
    assert(math.abs(full(1)._4 - 7.0 / 9) < 1e-12)
    assert(math.abs(full(2)._4 - 1.0) < 1e-12, "full vocab covers everything")
    assert(full.map(_._4).sliding(2).forall(p => p(0) <= p(1)), "monotone")
    // topK truncates the curve without changing retained rows
    val top2 = TextAnalysis.vocabCoverage(df, "doc_id", "text", topK = 2)
      .orderBy("rank").collect().map(r => r.getAs[String]("tok"))
    assert(top2.toSeq === Seq("a", "b"))
  }

  test("sparseCosinePairs: a zero-norm doc (all terms at df == N) is excluded, not NaN") {
    import spark.implicits._
    // maxDf = corpus size: "aa" is in ALL 3 docs, so ln(N/df) = 0 and
    // doc 3 (only "aa") has zero norm. It must drop out explicitly; the
    // bb-sharing pair must still appear with finite cosine.
    val df = Seq(
      (1L, "aa bb"),
      (2L, "aa bb"),
      (3L, "aa aa"))
      .toDF("doc_id", "text")
    val pairs = TextAnalysis.sparseCosinePairs(df, "doc_id", "text",
        minCosine = 0.0, maxDf = 3)
      .select("i", "j", "cos").as[(Long, Long, Double)].collect()
    assert(pairs.forall(p => !p._3.isNaN), "no NaN cosines may survive")
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)),
      "the zero-norm doc contributes no pairs; the bb pair survives")
    assert(math.abs(pairs.head._3 - 1.0) < 1e-9)
  }

  test("sparseCosinePairs on real docs: i<j, cos in (0,1], pairs only via shared shingles") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 100)
    val p = TextAnalysis.sparseCosinePairs(docs, "doc_id", "text",
      minCosine = 0.05, maxDf = 50, shingle = 2).cache()
    assert(p.count() > 0)
    assert(p.filter(col("i") >= col("j")).count() === 0L)
    assert(p.filter(col("cos") > 1.000001 || col("cos") <= 0).count() === 0L)
    p.unpersist()
  }

  test("pmiTopPairs matches brute force on a tiny corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a b c"),
      (4L, "a c"), (5L, "b"), (6L, "c d")).toDF("doc_id", "text")
    // doc freqs: a=4 b=4 c=3 d=1; N=6
    // pairs (docs containing both): (a,b)=3 (a,c)=2 (b,c)=1 (c,d)=1
    val out = TextAnalysis.pmiTopPairs(docs, "doc_id", "text",
        minDf = 1, topK = 10)
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("t1"), r.getAs[String]("t2"),
        r.getAs[Long]("c_xy"), r.getAs[Double]("pmi")))
    val expect = Map(
      ("a", "b") -> (3L, math.log(3.0 * 6 / (4 * 4))),
      ("a", "c") -> (2L, math.log(2.0 * 6 / (4 * 3))),
      ("b", "c") -> (1L, math.log(1.0 * 6 / (4 * 3))),
      ("c", "d") -> (1L, math.log(1.0 * 6 / (3 * 1))))
    assert(out.length === expect.size)
    out.foreach { case (t1, t2, c, pmi) =>
      val (ec, epmi) = expect((t1, t2))
      assert(c === ec, s"pair ($t1,$t2) count")
      assert(math.abs(pmi - epmi) < 1e-12, s"pair ($t1,$t2) pmi")
    }
    // rank order = pmi desc: (c,d)=ln2 > (a,b)=ln1.125 > (a,c)=ln1 > (b,c)
    assert(out.map(p => (p._1, p._2)).toSeq ===
      Seq(("c", "d"), ("a", "b"), ("a", "c"), ("b", "c")))
    // minDf prunes: at minDf=3, d (df=1) drops and with it its pair
    val pruned = TextAnalysis.pmiTopPairs(docs, "doc_id", "text",
      minDf = 3, topK = 10).collect()
    assert(pruned.length === 3 && !pruned.exists(_.getAs[String]("t2") == "d"))
  }

  test("zipfFit recovers slope -1 exactly on a perfect power law") {
    import spark.implicits._
    // counts 60/r for ranks 1..5: ln(cnt) = ln 60 - 1·ln(rank), r2 = 1
    val words = Seq("a" -> 60, "b" -> 30, "c" -> 20, "d" -> 15, "e" -> 12)
    val text = words.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    val out = TextAnalysis.zipfFit(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", topK = 5).collect().head
    assert(math.abs(out.getAs[Double]("slope") + 1.0) < 1e-9)
    assert(math.abs(out.getAs[Double]("intercept") - math.log(60.0)) < 1e-9)
    assert(math.abs(out.getAs[Double]("r2") - 1.0) < 1e-9)
    assert(out.getAs[Long]("n_ranks") === 5L)
  }

  test("ngramNovelty: shared grams lower novelty, unique docs score 1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),   // grams: "a b c", "b c d"
      (2L, "a b c e"),   // grams: "a b c", "b c e" — shares "a b c" with doc 1
      (3L, "x y z w")    // grams: "x y z", "y z w" — all unique
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[Double]("novelty")))
    assert(out.toSeq === Seq((1L, 2L, 0.5), (2L, 2L, 0.5), (3L, 2L, 1.0)))
  }

  test("mlmMask: unmasking the labels reconstructs the original text") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val masked = TextAnalysis.mlmMask(docs, "doc_id", "text", rate = 0.15)
      .join(docs.select(col("doc_id"), lower(col("text")).as("orig")), "doc_id")
      .cache()
    assert(masked.count() === docs.count(), "row-preserving")
    masked.collect().foreach { r =>
      val toks = r.getAs[String]("masked_text").split(" ", -1)
      val labels = r.getAs[String]("labels")
      val pairs = if (labels.isEmpty) Array.empty[(Int, String)]
        else labels.split(",", -1).map { l =>
          val Array(p, t) = l.split(":", 2); (p.toInt, t)
        }
      assert(pairs.length === r.getAs[Long]("n_masked"),
        "labels count n_masked masked positions")
      pairs.foreach { case (p, t) =>
        assert(toks(p) === "[MASK]", s"labeled position $p is masked")
        toks(p) = t
      }
      assert(toks.count(_ == "[MASK]") === 0, "every mask is labeled")
      assert(toks.mkString(" ") === r.getAs[String]("orig"),
        s"doc ${r.getAs[Long]("doc_id")} reconstructs")
    }
    // realized rate tracks 15% over the corpus
    val agg = masked.agg(
      sum(col("n_masked")).as("m"),
      sum(size(split(col("orig"), " "))).as("t")).collect().head
    val rate = agg.getAs[Long]("m").toDouble / agg.getAs[Long]("t")
    assert(rate > 0.12 && rate < 0.18, s"realized mask rate $rate")
    masked.unpersist()
  }

  test("mlmMask is deterministic under input partitioning") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = TextAnalysis.mlmMask(docs, "doc_id", "text", rate = 0.15)
    val b = TextAnalysis.mlmMask(docs.repartition(13), "doc_id", "text", rate = 0.15)
    assert(a.exceptAll(b).count() === 0L && b.exceptAll(a).count() === 0L)
  }

  test("jsDivergence: clones score 0, disjoint vocabularies score ln 2") {
    import spark.implicits._
    val docs = Seq(("a", 1L, "x y x z"), ("b", 2L, "x y x z"),
      ("c", 3L, "p q r p")).toDF("g", "id", "text")
    val out = TextAnalysis.jsDivergence(docs, "g", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getLong(3)))).toMap
    assert(out(("a", "b")) == ((0.0, 3L)), s"identical => 0: $out")
    assert(out(("a", "c"))._1 == math.floor(math.log(2.0) * 1e6 + 0.5) / 1e6,
      s"disjoint => ln 2: $out")
    assert(out(("a", "c"))._2 == 0L)
    assert(out.size == 3, "full pair grid incl. zero-overlap pairs")
  }

  test("jsDivergence stays within [0, ln 2] on the real corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val vals = TextAnalysis.jsDivergence(docs, "lang", "text")
      .collect().map(_.getDouble(2))
    assert(vals.nonEmpty)
    assert(vals.forall(v => v >= 0.0 && v <= math.log(2.0) + 1e-9),
      s"bounds: ${vals.toList}")
  }

  test("trendingTokens: a planted riser tops the list; ranking is total-ordered") {
    import spark.implicits._
    // 'nova' appears only in the new half, background tokens in both
    val docs = (Seq.tabulate(4)(i => (i * 2L, "base words here")) ++
      Seq.tabulate(4)(i => (i * 2 + 1L, "base words here nova nova")))
      .toDF("doc_id", "text")
    val top = TextAnalysis.trendingTokens(docs, "text",
        col("doc_id") % 2 === 1, k = 3)
      .orderBy(col("score").desc, col("token")).collect()
    assert(top.head.getString(0) == "nova", s"riser first: ${top.toList}")
    assert(top.head.getLong(1) == 0 && top.head.getLong(2) == 8)
    assert(top.length == 3)
    assert(top.map(_.getDouble(3)).sliding(2)
      .forall(w => w.length < 2 || w(0) >= w(1)), "sorted by score")
  }

  test("heapsLawFit: all-fresh vocabulary fits b = 1, lnk = 0 exactly") {
    import spark.implicits._
    // every doc contributes only never-seen tokens => V_i == T_i at
    // every boundary => ln V = 0 + 1·ln T with zero residual
    val docs = Seq.tabulate(6)(d =>
      ("g", d.toLong, (0 until (d + 2)).map(j => s"w${d}_$j").mkString(" ")))
      .toDF("g", "id", "text")
    val r = TextAnalysis.heapsLawFit(docs, "g", "id", "text")
      .collect().head
    assert(r.getLong(1) == 6)
    assert(r.getDouble(2) == 1.0, s"b: $r")
    assert(r.getDouble(3) == 0.0, s"lnk: $r")
  }

  test("heapsLawFit: saturated vocabulary fits b = 0 at the vocab level") {
    import spark.implicits._
    // same 4-token vocab in every doc => V_i constant = 4, T_i grows
    val docs = Seq.tabulate(5)(d => ("g", d.toLong, "a b c d"))
      .toDF("g", "id", "text")
    val r = TextAnalysis.heapsLawFit(docs, "g", "id", "text")
      .collect().head
    assert(r.getDouble(2) == 0.0, s"flat vocab => slope 0: $r")
    assert(math.abs(r.getDouble(3) - math.log(4.0)) < 1e-5,
      s"intercept = ln 4: $r")
  }

  test("heapsLawFit: single-doc group reports NULL fit, groups independent") {
    import spark.implicits._
    val docs = Seq(("one", 1L, "a b c"),
      ("two", 1L, "a a"), ("two", 2L, "a b")).toDF("g", "id", "text")
    val out = TextAnalysis.heapsLawFit(docs, "g", "id", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("one").isNullAt(2) && out("one").isNullAt(3),
      "one boundary point cannot fix a line")
    assert(!out("two").isNullAt(2), "two distinct points fit")
  }

  // ---- collocations ----

  test("collocations: planted phrase tops the panel, counts exact") {
    import spark.implicits._
    val docs = (1 to 6).map(i => (i.toLong, "new york " + ("w" + i) * 1))
      .toDF("doc_id", "text")
      .union(Seq((7L, "old news"), (8L, "single")).toDF("doc_id", "text"))
    val out = TextAnalysis.collocations(docs, "text", minCount = 2, k = 5)
      .collect()
    assert(out.nonEmpty)
    val top = out.head
    assert(top.getString(0) == "new" && top.getString(1) == "york",
      s"planted bigram wins: ${top}")
    assert(top.getLong(2) == 6, "exact pair count")
    // hand PMI: c12=6, c_new=6, c_york=6, N=21 tokens, M=13 bigrams
    val exp = math.rint(math.log(6.0 * 21 * 21 / (13.0 * 6 * 6)) * 1e6) / 1e6
    assert(math.abs(top.getDouble(3) - exp) < 2e-6,
      s"${top.getDouble(3)} vs $exp")
  }

  test("collocations: minCount floors rare pairs, short docs skipped") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "c d"), (4L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, "text", minCount = 2, k = 10)
      .collect()
    assert(out.length == 1 && out.head.getString(0) == "a",
      "only (a, b) clears minCount = 2; single-token doc adds no pair")
  }

  // ---- textRankKeywords ----

  test("textRankKeywords: hub word outranks leaves, mass conserved") {
    import spark.implicits._
    val docs = Seq((1L, "hub x"), (2L, "hub y"), (3L, "hub z"),
      (4L, "solo")).toDF("doc_id", "text")
    val out = TextAnalysis.textRankKeywords(docs, "text", window = 2,
      iters = 3, k = 10).collect()
    assert(out.head.getString(0) == "hub", s"hub is best-connected: ${out.toSeq}")
    assert(out.length == 4, "solo never pairs -> 4 graph words")
    val mass = out.map(_.getDouble(1)).sum
    assert(math.abs(mass - 1.0) < 1e-6, s"symmetric graph conserves mass: $mass")
    assert(out.map(_.getString(0)).toSet == Set("hub", "x", "y", "z"))
  }

  test("textRankKeywords: window widens the edge set, order total") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val w1 = TextAnalysis.textRankKeywords(docs, "text", 1, 2, 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val w3 = TextAnalysis.textRankKeywords(docs, "text", 3, 2, 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // chain at window 1: ends (a, d) rank below middles (b, c);
    // window 3 makes it a clique: all equal
    assert(w1("b") > w1("a") && w1("c") > w1("d"), w1.toString)
    assert(w3.values.toSet.size == 1, s"clique equalizes: $w3")
  }

  // ---- naiveBayesPredict ----

  test("naiveBayesPredict: recovers class structure, priors carry empty docs") {
    import spark.implicits._
    val docs = Seq(
      ("d1", "A", "x x y"), ("d2", "A", "x y"),
      ("d3", "B", "z z"), ("d4", "B", "z y"),
      ("d5", "A", ""), // empty: scored on priors only (A is majority)
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.naiveBayesPredict(docs, "doc_id", "source",
        "text")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.size == 5, "every doc emits exactly one prediction")
    assert(out("d1").getString(1) == "A" && out("d2").getString(1) == "A")
    assert(out("d3").getString(1) == "B" && out("d4").getString(1) == "B")
    assert(out("d5").getString(1) == "A", "empty doc takes the prior argmax")
    // hand check d3 "z z": prior ln(3/5) + 2*ln((3+1)/(4+3)) for B
    val exp = math.floor((math.log(2.0 / 5)
      + (math.rint(2 * math.rint(math.log(4.0 / 7.0) * 1e12) / 1e12 * 1e6)
        / 1e6)) * 1e6 + 0.5) / 1e6
    assert(math.abs(out("d3").getDouble(2) - exp) < 2e-6,
      s"d3 B-score ${out("d3").getDouble(2)} vs $exp")
  }

  test("naiveBayesPredict: deterministic across runs") {
    import spark.implicits._
    val docs = Seq(
      ("a", "s1", "alpha beta beta"), ("b", "s2", "gamma gamma"),
      ("c", "s1", "alpha gamma"), ("d", "s2", "beta gamma gamma"),
    ).toDF("doc_id", "source", "text")
    def run() = TextAnalysis.naiveBayesPredict(docs, "doc_id",
      "source", "text").orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(run() == run())
  }

  test("rakeKeywords: hand degree/frequency scores, phrase boundaries, ties") {
    import spark.implicits._
    // doc1: "deep learning is deep" with stopword 'is':
    //   phrases: [deep learning], [deep]
    //   freq: deep 2, learning 1; deg: deep 2+1=3, learning 2
    //   scores: deep 1.5, learning 2.0
    //   phrase scores: "deep learning" 3.5, "deep" 1.5
    val docs = Seq((1L, "deep learning is deep")).toDF("doc_id", "text")
    val out = TextAnalysis.rakeKeywords(docs, "doc_id", "text",
        stopwords = Seq("is"), k = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("deep learning") == ((2L, 1L, 3.5)), out.toString)
    assert(out("deep") == ((1L, 1L, 1.5)), out.toString)
    // repeated phrases count occurrences once each, same score
    val rep = Seq((1L, "alpha beta is alpha beta")).toDF("doc_id", "text")
    val r2 = TextAnalysis.rakeKeywords(rep, "doc_id", "text",
        stopwords = Seq("is"), k = 10).collect()
    assert(r2.length == 1 && r2.head.getString(0) == "alpha beta"
      && r2.head.getLong(2) == 2L, r2.mkString(","))
    // k cuts on (score DESC, phrase ASC)
    val many = Seq((1L, "aa is bb is cc")).toDF("doc_id", "text")
    val top1 = TextAnalysis.rakeKeywords(many, "doc_id", "text",
        stopwords = Seq("is"), k = 1).collect()
    assert(top1.length == 1 && top1.head.getString(0) == "aa",
      "equal scores tie-break on phrase asc: " + top1.mkString(","))
  }

  test("burrowsDelta: symmetric fixture distances; identical styles " +
      "score exactly 0; zero-variance words excluded") {
    import spark.implicits._
    val docs = Seq(("g1", "a a b"), ("g2", "a b b"), ("g3", "a b"),
      ("g4", "a b")).toDF("src", "text")
    val out = graft.operators.TextAnalysis
      .burrowsDelta(docs, "src", "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // g3 and g4 write identically: delta exactly 0 over both words
    assert(out(("g3", "g4")) === ((2L, 0.0)), out.toString)
    // g1 and g2 mirror each other around g3/g4: equidistant
    assert(out(("g1", "g3"))._2 === out(("g2", "g3"))._2, out.toString)
    assert(out(("g1", "g4"))._2 === out(("g1", "g3"))._2, out.toString)
    // opposite extremes are farther apart than either is from center
    assert(out(("g1", "g2"))._2 > out(("g1", "g3"))._2, out.toString)
    // all-identical corpus: every word zero-variance -> no pair rows
    val flat = Seq(("x", "a b"), ("y", "a b")).toDF("src", "text")
    assert(graft.operators.TextAnalysis
      .burrowsDelta(flat, "src", "text", 10).collect().isEmpty)
  }

  test("vocabRichness + goodTuring: hand counts-of-counts") {
    import spark.implicits._
    // tokens: a a b c -> N=4, D=3, f1=2 (b,c), f2=1 (a)
    val docs = Seq(("g1", "a a b c")).toDF("src", "text")
    val r = graft.operators.TextAnalysis
      .vocabRichness(docs, "src", "text").collect().head
    assert(r.getLong(1) === 4L && r.getLong(2) === 3L
      && r.getLong(3) === 2L && r.getLong(4) === 1L, r.toString)
    // chao1 = 3 + 2*1/(2*2) = 3.5; coverage = 1 - 2/4 = 0.5
    assert(r.getDouble(5) === 3.5 && r.getDouble(6) === 0.5, r.toString)
    val gt = graft.operators.TextAnalysis
      .goodTuring(docs, "src", "text", maxR = 3)
      .collect().map(x => x.getLong(1) -> x).toMap
    // S(1)=2, S(2)=1: r*(1) = 2*1/2 = 1.0; S(3)=0 -> NULL r*(2);
    // empty rank 3 reports 0 types
    assert(gt(1L).getLong(2) === 2L && gt(1L).getDouble(3) === 1.0)
    assert(gt(2L).getLong(2) === 1L && gt(2L).isNullAt(3))
    assert(gt(3L).getLong(2) === 0L && gt(3L).isNullAt(3))
  }

  test("languageIdTrained: held-out docs classify to their language on " +
      "a two-language fixture; empty text -> und; deterministic re-run") {
    import spark.implicits._
    // distinct char distributions: 'en'-ish uses th/he/an grams,
    // 'xx'-ish uses zq/qz — profiles separate perfectly
    val en = Seq("the man and the hen ran then", "that hand can stand sand",
      "then the man ran and sat", "a tan cat and the fat rat")
    val xx = Seq("zqzq qzqz zqqz zzqq", "qzz zzq qqz zqz", "zqz qzq zzz qqq",
      "qz zq qzzq zqqz")
    val train = (en.take(3).map(t => ("en", t)) ++
      xx.take(3).map(t => ("xx", t))).zipWithIndex
      .map { case ((l, t), i) => (i.toLong, t, l) }
      .toDF("doc_id", "text", "lang")
    val test0 = Seq((100L, en.last), (101L, xx.last), (102L, ""))
      .toDF("doc_id", "text")
    def run() = graft.operators.TextAnalysis.languageIdTrained(
        train, test0, "doc_id", "text", "lang", n = 3, topK = 50)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val out = run()
    assert(out(100L) === "en" && out(101L) === "xx", out.toString)
    assert(out(102L) === "und", out.toString)
    assert(run() === out, "deterministic re-run")
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.languageIdTrained(
        train, test0, "doc_id", "text", "lang", n = 0)
    }
  }
  test("logDiceCollocations: hand counts — 14 + log2(2f/(fx+fy)), " +
      "frequency-stable cut order") {
    import spark.implicits._
    val docs = Seq("a b a b", "a c").toDF("text")
    val out = TextAnalysis.logDiceCollocations(docs, "text",
        minCount = 1, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // uni: a3 b2 c1; bi: ab2 ba1 ac1
    assert(out(("a", "b")) == ((2L, 13.678072)), out.toString)
    assert(out(("a", "c")) == ((1L, 13.0)))
    assert(out(("b", "a")) == ((1L, 12.678072)))
  }

  test("msttr: full 25-token segments only; short docs absent; " +
      "exact distinct ratios") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a c c d"),          // 2 full segments of 3
      (2L, "a b"),                  // too short -> absent
      (3L, "x y z x y z q"))        // 2 full segments, tail dropped
      .toDF("doc_id", "text")
    val out = TextAnalysis.msttr(docs, "doc_id", "text", segment = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == Map(1L -> ((2L, 0.666667)), 3L -> ((2L, 1.0))),
      out.toString)
    // one-row-per-document contract: a duplicated id raises loudly
    // instead of silently mis-segmenting colliding positions
    val dup = Seq((1L, "a b c"), (1L, "d e f"), (2L, "x y z"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      TextAnalysis.msttr(dup, "doc_id", "text", segment = 3).collect()
    }
    assert(e.getMessage.contains("multiple rows"), e.getMessage)
  }
  test("keyness: planted A-only vocabulary tops the G2 ranking with " +
      "the right direction; shared-rate tokens score zero") {
    import spark.implicits._
    // A: 'alpha' 8x + 'common' 8x; B: 'beta' 8x + 'common' 8x —
    // common occurs at the POOLED rate in both -> G2 exactly 0
    val docs = Seq(
      (true, Array.fill(8)("alpha").mkString(" ") + " "
        + Array.fill(8)("common").mkString(" ")),
      (false, Array.fill(8)("beta").mkString(" ") + " "
        + Array.fill(8)("common").mkString(" ")))
      .toDF("in_a", "text")
    val out = TextAnalysis.keyness(docs, "text", col("in_a"), k = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getBoolean(4)))).toMap
    assert(out("alpha")._3 == out("beta")._3
      && out("alpha")._3 > 5.0, out.toString)
    assert(out("alpha")._4 && !out("beta")._4, out.toString)
    assert(out("common") == ((8L, 8L, 0.0, false)), out.toString)
    // exclusive tokens outrank the balanced one
    assert(out("alpha")._3 > out("common")._3)
  }

  test("lexicalRichness: hand counts — hapax, Yule's K, Simpson's D") {
    import spark.implicits._
    val docs = Seq(("L", "a a b"), ("L", "c")).toDF("g", "text")
    // counts: a2 b1 c1 -> N=4 V=3 V1=2, sum c^2 = 6, sum c(c-1) = 2
    val r = TextAnalysis.lexicalRichness(docs, "g", "text")
      .collect().head
    assert(r.getLong(1) == 4L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 0.666667, r.toString)
    assert(r.getDouble(4) == 1250.0, r.toString)
    assert(r.getDouble(5) == 0.166667, r.toString)
  }

  test("colemanLiau: hand letter/sentence counts — 5 words, 14 " +
      "letters, 2 sentences give CLI -11.176") {
    import spark.implicits._
    val df = Seq(("A", "the cat sat. it ran!")).toDF("g", "text")
    val r = TextAnalysis.colemanLiau(df, "text", Seq("g"))
      .collect().head
    assert(r.getLong(2) == 14L && r.getLong(3) == 5L
      && r.getLong(4) == 2L, r.toString)
    assert(r.getDouble(5) == -11.176, r.toString)
  }

  test("rougeLead: hand lead-coverage — clipped unigram overlap 2/8 " +
      "and bigram 1/7 (punctuation-bearing tokens stay distinct); a " +
      "sentence-less doc has an empty reference and reports NULL") {
    import spark.implicits._
    val df = Seq(
      ("en", 1L, "the cat sat. the cat ran away. the dog sat."),
      ("x", 2L, "no terminator here")).toDF("g", "id", "text")
    val out = TextAnalysis.rougeLead(df, "g", "id", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    val e = out("en")
    assert(e.getLong(1) == 1L && e.getDouble(2) == 0.25
      && e.getDouble(3) == 0.142857, e.toString)
    assert(out("x").isNullAt(2) && out("x").isNullAt(3),
      out("x").toString)
  }

  test("bleuPair: one substitution in four tokens — p1 3/4, p2 1/3, " +
      "BLEU-2 exactly 0.5 at BP 1; a half-length candidate pays " +
      "e^-1 brevity") {
    import spark.implicits._
    val df = Seq(("m", 1L, "a b c d", "a b x d"),
      ("s", 2L, "a b", "a b c d")).toDF("g", "id", "c", "r")
    val out = TextAnalysis.bleuPair(df, "g", "id", col("c"), col("r"))
      .collect().map(r => r.getString(0) -> r).toMap
    val m = out("m")
    assert(m.getDouble(2) == 0.75 && m.getDouble(3) == 0.333333,
      m.toString)
    assert(m.getDouble(4) == 1.0 && m.getDouble(5) == 0.5, m.toString)
    val s = out("s")
    assert(s.getDouble(2) == 1.0 && s.getDouble(4) == 0.367879
      && s.getDouble(5) == 0.367879, s.toString)
  }

  test("jackknifeRichness: hand rare-type head — jack1 = S + f1, " +
      "jack2 = S + 2f1 - f2, exact integers") {
    import spark.implicits._
    val df = Seq(("A", "x x y z")).toDF("g", "text")
    val r = TextAnalysis.jackknifeRichness(df, "g", "text")
      .collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L
      && r.getLong(3) == 1L, r.toString)
    assert(r.getLong(4) == 5L && r.getLong(5) == 6L, r.toString)
  }

  test("brayCurtis: hand count profiles give 1 - 2*2/7; disjoint " +
      "vocabularies are exactly 1; pairs are ordered once") {
    import spark.implicits._
    val df = Seq(("A", "a a b"), ("B", "a b b c"), ("C", "q q"))
      .toDF("g", "text")
    val out = TextAnalysis.brayCurtis(df, "g", "text").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("A", "B"))
    assert(ab.getLong(2) == 3L && ab.getLong(3) == 4L
      && ab.getLong(4) == 2L, ab.toString)
    assert(ab.getDouble(5) == 0.428571, ab.toString)
    assert(out(("A", "C")).getLong(4) == 0L
      && out(("A", "C")).getDouble(5) == 1.0)
    assert(out.size == 3, out.keys.toString)
  }

  test("dispersionDp: three hand parts — burst-concentrated terms " +
      "score high, evenly-spread mass scores low, absent parts still " +
      "contribute their share mass") {
    import spark.implicits._
    val df = Seq(("p1", "a a a b"), ("p2", "a b b b"), ("p3", "c c"))
      .toDF("p", "text")
    val out = TextAnalysis.dispersionDp(df, "p", "text", topK = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1),
        r.getDouble(2)))).toMap
    // N=10, parts 4/4/2: a = (|30-16|+|10-16|+|0-8|)/(2*4*10)
    assert(out("a") == ((4L, 0.35)), out.toString)
    assert(out("b") == ((4L, 0.35)), out.toString)
    // c lives only in the small part: (|20-4|+8+8)/(2*2*10) = 0.8
    assert(out("c") == ((2L, 0.8)), out.toString)
  }
}
