package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE: the driver-side trainer against the classic hand-checkable
  * dict (Sennrich et al. 2016's low/lower/newest/widest example), the
  * real encoder, and the equality between the real left-to-right
  * merge semantics and the engine-portable replace-chain semantics
  * that backs the judged queries.
  */
class BpeSpec extends SparkTestBase {

  // The paper's toy dict: low:5 lower:2 newest:6 widest:3.
  private val paperDict =
    Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("trainFromCounts reproduces the paper example's merge order") {
    val merges = Bpe.trainFromCounts(paperDict, 5)
    // pair counts: (e,s)=9 (s,t)=9 (t,</w>)=9 tie -> lexicographic
    // min (e,s); then (es,t)=9; (est,</w>)=9; then (l,o)=7 beats
    // (o,w)=7 lexicographically; then (lo,w)=7.
    assert(merges === Seq(
      "e" -> "s", "es" -> "t", "est" -> "</w>", "l" -> "o", "lo" -> "w"))
  }

  test("encodeWord applies merges in training order: lowest -> low + est</w>") {
    val four = Bpe.trainFromCounts(paperDict, 4)
    assert(Bpe.encodeWord("lowest", four) === Seq("lo", "w", "est</w>"))
    val five = Bpe.trainFromCounts(paperDict, 5) // merge 5: (lo,w)->low
    assert(five.last === ("lo" -> "w"))
    assert(Bpe.encodeWord("lowest", five) === Seq("low", "est</w>"))
  }

  test("train on the corpus is deterministic and returns requested merges") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = Bpe.train(docs, "text", 12)
    val b = Bpe.train(docs, "text", 12)
    assert(a === b)
    assert(a.length === 12)
  }

  test("PinnedMerges provenance: full retrain at sf0.001 reproduces the table") {
    // The judged q_bpe bakes PinnedMerges as a literal replace chain in
    // both engines. This pin retrains the WHOLE table with the
    // documented training config (nMerges=48, maxVocabWords=50000), so
    // a testdata regeneration that skews the corpus word counts turns
    // into a loud red test instead of a silently-stale judged query.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val retrained = Bpe.train(docs, "text", Bpe.PinnedMerges.length)
    assert(retrained === Bpe.PinnedMerges,
      "PinnedMerges must be exactly what train() produces on sf0.001 " +
        "with nMerges=48, maxVocabWords=50000 — retrain drifted")
  }

  test("corpus alphabet stays inside [a-y ]: separator and </w> are safe") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dirty = docs.filter(not(col("text").rlike("^[a-y ]*$"))).count()
    assert(dirty === 0L)
  }

  test("portable replace-chain tokenization == real BPE on the full corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val real = Bpe.tokenize(docs, "doc_id", "text", Bpe.PinnedMerges)
    val portable = Bpe.tokenizePortable(docs, "doc_id", "text", Bpe.PinnedMerges)
    assert(real.exceptAll(portable).count() === 0L)
    assert(portable.exceptAll(real).count() === 0L)
  }

  test("tokenCount: subwords per doc >= whitespace words per doc") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val fert = Bpe.tokenCount(docs, "doc_id", "text", Bpe.PinnedMerges)
      .join(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words")), "doc_id")
    assert(fert.filter(col("n_subwords") < col("n_words")).count() === 0L)
    assert(fert.count() === docs.count())
  }

  test("round-trip: concatenating a word's subwords restores word + </w>") {
    val merges = Bpe.PinnedMerges
    for (w <- Seq("join", "window", "aggregate", "qqq", "a"))
      assert(Bpe.encodeWord(w, merges).mkString === w + Bpe.EndOfWord)
  }
}
