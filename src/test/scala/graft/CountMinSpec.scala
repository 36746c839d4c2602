package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.functions.CountMin

/** Count-Min point estimates: exact in the wide regime, upper-bound
  * always, deterministic across partitionings.
  */
class CountMinSpec extends SparkTestBase {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  private def toks = TextAnalysis.tokenize(docs, "doc_id", "text")
    .filter(col("tok") =!= "")

  test("wide regime: CMS point estimates equal exact counts") {
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val est = CountMin.pointEstimates(toks, "tok", exact.select("tok"))
    val joined = exact.join(est, "tok")
      .select("tok", "cnt", "cnt_est").collect()
    assert(joined.nonEmpty)
    joined.foreach(r =>
      assert(r.getLong(1) === r.getLong(2), s"tok=${r.getString(0)}"))
  }

  test("null probe keys estimate to null, not an executor NPE") {
    import spark.implicits._
    val probes = Seq(Some("the"), None, Some("of")).toDF("tok")
    val est = CountMin.pointEstimates(toks, "tok", probes).collect()
    assert(est.length === 3)
    val byKey = est.map(r => Option(r.getString(0)) -> r.isNullAt(1)).toMap
    assert(byKey(None), "null key must yield a null estimate")
    assert(!byKey(Some("the")) && !byKey(Some("of")),
      "non-null keys still estimate")

    val longProbes = Seq(Some(1L), None).toDF("tok")
    val longToks = toks.select(length(col("tok")).cast("long").as("tok"))
    val estL = CountMin.pointEstimates(longToks, "tok", longProbes).collect()
    assert(estL.exists(r => r.isNullAt(0) && r.isNullAt(1)),
      "null integral key must yield a null estimate")
  }

  test("narrow regime: estimates never undercount (upper-bound property)") {
    // eps=0.5 -> width ~6 buckets for a 31-word vocab: heavy collisions
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val est = CountMin.pointEstimates(toks, "tok", exact.select("tok"),
      eps = 0.5, confidence = 0.9)
    val joined = exact.join(est, "tok").collect()
    joined.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"CMS undercounted ${r.getString(0)}"))
    // and with ~6 buckets for 31 keys SOMETHING must collide
    assert(joined.exists(r => r.getLong(2) > r.getLong(1)),
      "narrow sketch showed no collisions — regime check is vacuous")
  }

  test("deterministic across partitionings (fixed seed, mergeable agg)") {
    val keys = toks.select("tok").distinct()
    val a = CountMin.pointEstimates(toks, "tok", keys)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = CountMin.pointEstimates(toks.repartition(13), "tok", keys)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("integral keys: long/int columns estimate exactly in the wide regime") {
    // long keys (doc_id): the aggregate hashes integrals through the
    // long path, and pointEstimates must probe the SAME path — before
    // the dataType dispatch this was a runtime ClassCastException
    val exact = docs.groupBy("doc_id").agg(count(lit(1)).as("cnt"))
    val est = CountMin.pointEstimates(docs, "doc_id", exact.select("doc_id"))
    val joined = exact.join(est, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getLong(1) === r.getLong(2)))
    // int keys ride the identical long hash path (integralToLong)
    val di = docs.select(col("doc_id").cast("int").as("doc_id"))
    val esti = CountMin.pointEstimates(di, "doc_id", di.distinct())
      .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    val exacti = exact.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(esti === exacti)
  }

  test("mixed key families are an analysis-time error, not a wrong answer") {
    val e = intercept[IllegalArgumentException] {
      CountMin.pointEstimates(docs, "doc_id",
        docs.select(col("doc_id").cast("string").as("doc_id")))
    }
    assert(e.getMessage.contains("hash families"))
  }
}
