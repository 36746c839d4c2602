package graft

import org.apache.spark.sql.functions._

import graft.functions.MinHashAgg
import graft.operators.Dedup

/** The one-pass TypedImperativeAggregate sketch must equal the
  * expression formulation it replaced (same seeded hash family),
  * elementwise, on real data — proving the two are interchangeable and
  * that partial-aggregation merge works.
  */
class MinHashAggSpec extends SparkTestBase {

  test("native sketch == expression-based minima, elementwise, on documents") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val toks = Dedup.tokens(docs, "doc_id", "text")
      .repartition(8) // force nontrivial partial/merge paths

    // expression-based reference: the pre-MinHashAgg formulation
    def rotl(c: org.apache.spark.sql.Column, i: Int) =
      if (i % 64 == 0) c
      else shiftleft(c, i % 64).bitwiseOR(shiftrightunsigned(c, 64 - (i % 64)))
    val h1 = xxhash64(col("tok"), lit(1))
    val h2 = xxhash64(col("tok"), lit(2))
    val reference = toks.groupBy("doc_id").agg(
      (0 until 16).map(i => min(h1.bitwiseXOR(rotl(h2, i))).as(s"r$i")).head,
      (0 until 16).map(i => min(h1.bitwiseXOR(rotl(h2, i))).as(s"r$i")).tail: _*)

    val sketch = toks.groupBy("doc_id")
      .agg(MinHashAgg.minhash(col("tok"), 16).as("sig"))

    val joined = sketch.join(reference, "doc_id")
    val mismatches = (0 until 16).map(i =>
      joined.filter(element_at(col("sig"), i + 1) =!= col(s"r$i")).count()).sum
    assert(mismatches === 0, "sketch must equal the expression formulation")
    assert(sketch.count() === docs.count())
  }

  test("scalar array sketch == aggregate sketch, elementwise, on documents") {
    // minHashSignatures now computes per-row (MinHashArrayExpr); the
    // aggregate path must stay bit-identical so persisted signatures
    // and exploded-stream pipelines remain compatible.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val viaAgg = Dedup.tokens(docs, "doc_id", "text")
      .groupBy("doc_id").agg(MinHashAgg.minhash(col("tok"), 80).as("sig"))
    val viaArr = Dedup.minHashSignatures(docs, "doc_id", "text", 80)
    val joined = viaArr.join(viaAgg, "doc_id")
    val mismatches = (0 until 80).map(i =>
      joined.filter(col(s"h$i") =!= element_at(col("sig"), i + 1)).count()).sum
    assert(mismatches === 0, "scalar and aggregate sketches must agree")
  }

  test("scalar SimHash == aggregate SimHash on documents") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val viaAgg = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .groupBy("doc_id")
      .agg(graft.functions.SimHashAgg.simhash(col("tok")).as("agg_sig"))
    val viaArr = Dedup.simHash(docs, "doc_id", "text")
    val diff = viaArr.join(viaAgg, "doc_id")
      .filter(col("simhash") =!= col("agg_sig")).count()
    assert(diff === 0, "scalar and aggregate SimHash must agree")
  }

  test("scalar sketch expressions compile under codegen (no silent fallback)") {
    // Spark falls back to interpreted eval when generated Java fails to
    // compile — results stay right but the hot path silently slows.
    // Forcing fallback OFF makes any codegen bug a hard failure here.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      assert(Dedup.minHashSignatures(docs, "doc_id", "text", 24).count() > 0)
      assert(Dedup.simHash(docs, "doc_id", "text").count() > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("sketch handles empty-ish and single-token docs") {
    import spark.implicits._
    val df = Seq((1L, "solo"), (2L, "a b a")).toDF("doc_id", "text")
    val sigs = Dedup.minHashSignatures(df, "doc_id", "text", 8)
    assert(sigs.count() === 2)
    // distinct tokens per doc rides along correctly
    val ns = sigs.select("doc_id", "n").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ns === Map(1L -> 1L, 2L -> 2L))
  }
}
