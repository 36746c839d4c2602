package graft

import org.apache.spark.sql.functions._

import graft.operators.Encoding

/** Hand-computed semantics for the feature encoders. */
class EncodingSpec extends SparkTestBase {

  test("oneHot: pinned vocab, unknown and null encode as all zeros") {
    import spark.implicits._
    val df = Seq((1L, "en"), (2L, "de"), (3L, "xx"), (4L, null))
      .toDF("id", "lang")
    val out = Encoding.oneHot(df, "lang", Seq("de", "en"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Int]("lang_de"), r.getAs[Int]("lang_en"))).toMap
    assert(out === Map(1L -> ((0, 1)), 2L -> ((1, 0)),
      3L -> ((0, 0)), 4L -> ((0, 0))))
  }

  test("featureHash: repeated token accumulates; deterministic; dims bounded") {
    import spark.implicits._
    val df = Seq((1L, "spark spark spark"), (2L, "spark"), (3L, ""))
      .toDF("id", "text")
    val out = Encoding.featureHash(df, "id", "text", dim = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byDoc = out.groupBy(_._1)
    // one token, one dimension: |weight| = occurrence count, same dim
    // and sign for both docs (md5 is content-only)
    assert(byDoc(1L).length === 1 && byDoc(2L).length === 1)
    val (d1, d2) = (byDoc(1L).head, byDoc(2L).head)
    assert(d1._2 === d2._2 && math.abs(d1._3) === 3.0 && math.abs(d2._3) === 1.0)
    assert(math.signum(d1._3) === math.signum(d2._3))
    assert(!byDoc.contains(3L), "empty text has no features")
    assert(out.forall(r => r._2 >= 0 && r._2 < 16))
  }

  test("featureHash on real docs: dims within range, total |weight| <= tokens") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val fh = Encoding.featureHash(docs, "doc_id", "text", dim = 64).cache()
    assert(fh.filter(col("dim") < 0 || col("dim") >= 64).count() === 0L)
    val mass = fh.groupBy("doc_id").agg(sum(abs(col("weight"))).as("m"))
      .join(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("double").as("n")), "doc_id")
    assert(mass.filter(col("m") > col("n")).count() === 0L,
      "signed collisions can only cancel mass, never create it")
    fh.unpersist()
  }

  test("denseIds == global row_number on a total order; ids are 1..N") {
    import graft.operators.Indexing
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "n_chars")
    val got = Indexing.denseIds(docs, Seq("n_chars", "doc_id"))
      .select("doc_id", "rid")
    val naive = docs.selectExpr("doc_id",
      "cast(row_number() over (order by n_chars, doc_id) as long) as rid")
    assert(got.exceptAll(naive).count() === 0L)
    assert(naive.exceptAll(got).count() === 0L)
    val n = docs.count()
    val stats = got.agg(min("rid"), max("rid"), countDistinct("rid")).head
    assert(stats.getLong(0) === 1L && stats.getLong(1) === n
      && stats.getLong(2) === n)
  }

  test("targetEncodeLoo: leave-one-out means; singleton falls back to global") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0))
      .toDF("cat", "y")
    val out = Encoding.targetEncodeLoo(df, "cat", "y")
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(out(("a", 1.0)) === 2.5) // (2+3)/2
    assert(out(("a", 2.0)) === 2.0) // (1+3)/2
    assert(out(("a", 3.0)) === 1.5) // (1+2)/2
    assert(out(("b", 10.0)) === 4.0, "singleton -> global mean (1+2+3+10)/4")
  }

  test("targetEncodeLoo: null categories are their own group, rows never drop") {
    import spark.implicits._
    val df = Seq(Some("a") -> 1.0, Some("a") -> 3.0,
      None -> 5.0, None -> 7.0).map { case (c, y) => (c.orNull, y) }
      .toDF("cat", "y")
    val out = Encoding.targetEncodeLoo(df, "cat", "y")
    assert(out.count() === 4L,
      "a null-unsafe join would silently drop the null-category rows")
    val nulls = out.filter(col("cat").isNull)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(nulls === Map(5.0 -> 7.0, 7.0 -> 5.0),
      "null is its own leave-one-out group")
  }

  test("quantileNormalize: every group draws from the same pooled quantiles") {
    import spark.implicits._
    // pooled sorted: [1,2,10,20]; each group of 2 maps ranks 1,2 to
    // pooled indices ceil(1*4/2)=2 and ceil(2*4/2)=4 -> values 2, 20
    val df = Seq((1L, "g1", 1L), (2L, "g1", 2L),
      (3L, "g2", 10L), (4L, "g2", 20L)).toDF("id", "g", "v")
    val out = Encoding.quantileNormalize(df, Seq("g"), "v", "id")
      .select("g", "qnorm").collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(1)).sorted.toSeq }
    assert(out == Map("g1" -> Seq(2L, 20L), "g2" -> Seq(2L, 20L)),
      s"normalized multisets must coincide across groups: $out")
  }

  test("quantileNormalize: single group is the identity; rows preserved") {
    import spark.implicits._
    val df = (1L to 9L).map(i => (i, "g", i * 10)).toDF("id", "g", "v")
    val out = Encoding.quantileNormalize(df, Seq("g"), "v", "id")
    assert(out.count() == 9L)
    // one group: r == rid mapping, target index == own rank
    assert(out.filter(col("qnorm") =!= col("v")).isEmpty,
      "pooled == group distribution: qnorm must be the value itself")
  }

  test("quantileNormalize: ties map deterministically via the id tiebreak") {
    import spark.implicits._
    val df = Seq((1L, "a", 5L), (2L, "a", 5L), (3L, "b", 5L), (4L, "b", 6L))
      .toDF("id", "g", "v")
    val r1 = Encoding.quantileNormalize(df, Seq("g"), "v", "id")
      .orderBy("id").collect().map(_.getLong(3)).toSeq
    val r2 = Encoding.quantileNormalize(df, Seq("g"), "v", "id")
      .orderBy("id").collect().map(_.getLong(3)).toSeq
    assert(r1 == r2, "stable under re-execution")
  }
}
