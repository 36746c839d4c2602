package graft

import org.apache.spark.sql.functions._

import graft.functions.FrequentItemsAgg
import graft.operators.TextAnalysis

/** Misra-Gries heavy-hitters aggregate: exact when capacity covers the
  * vocabulary, and within the n/capacity lower-bound guarantee (with no
  * heavy hitter lost) when it doesn't — across partitionings, since
  * merge must preserve both properties.
  */
class FreqSketchSpec extends SparkTestBase {

  private def sketch(df: org.apache.spark.sql.DataFrame, cap: Int): Map[String, Long] =
    df.agg(FrequentItemsAgg.freqSketch(col("tok"), cap).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select("e.tok", "e.cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("capacity >= vocabulary => sketch counts are exact") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val toks = TextAnalysis.tokenize(docs, "doc_id", "text").repartition(8)
    val exact = toks.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mg = sketch(toks, cap = exact.size + 10)
    assert(mg === exact, "no evictions can occur, so every count is true")
  }

  test("bounded capacity: lower-bound counts within n/capacity, heavy hitters kept") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val toks = TextAnalysis.tokenize(docs, "doc_id", "text").repartition(8)
    val exact = toks.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val cap = 64
    val mg = sketch(toks, cap)
    assert(mg.size <= cap, "buffer must respect capacity")
    // every estimate is a lower bound within n/cap of truth
    mg.foreach { case (tok, est) =>
      val truth = exact(tok)
      assert(est <= truth && est >= truth - n / cap,
        s"$tok: est $est outside [truth - n/cap, truth] = [${truth - n / cap}, $truth]")
    }
    // MG guarantee: anything with true count > n/cap survives
    exact.filter(_._2 > n / cap).keys.foreach(tok =>
      assert(mg.contains(tok), s"heavy hitter '$tok' was evicted"))
  }

  test("sketch is identical across partitionings (merge correctness)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val toks = TextAnalysis.tokenize(docs, "doc_id", "text")
    val a = sketch(toks.repartition(1), cap = 100000)
    val b = sketch(toks.repartition(17), cap = 100000)
    assert(a === b)
  }
}
