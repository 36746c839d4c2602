package graft

import java.util.concurrent.ConcurrentLinkedQueue

import graft.functions.Semantic

/** JVM-static call log: closures serialize the client per task, so an
  * instance field would record into task-local copies; local-mode tasks
  * share this JVM and hence this object.
  */
object MockLlmStats {
  val batches = new ConcurrentLinkedQueue[Int]()
  def reset(): Unit = batches.clear()
  def sizes: Seq[Int] = batches.toArray(Array.empty[Integer]).map(_.toInt).toSeq
}

/** Deterministic mock client: replies are pure functions of the prompt
  * (input = text after the template's ':'); batch sizes are recorded in
  * MockLlmStats so tests can assert the batching/caching contract.
  */
class MockLlm extends Semantic.LlmClient {
  override def complete(prompts: Seq[String]): Seq[String] = {
    MockLlmStats.batches.add(prompts.length)
    prompts.map { p =>
      val input = p.substring(p.indexOf(':') + 1).trim
      if (input.length > 10) s"yes: $input" else s"no: $input"
    }
  }
}

/** L9 semantic operators: llm_map / llm_filter with an injectable
  * client (no oracle possible by design — the judged surface is the
  * batching, caching, and distribution semantics).
  */
class SemanticSpec extends SparkTestBase {

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "short"),
      (1L, "a considerably longer document"),
      (2L, "short"),                          // duplicate of doc 0's text
      (3L, "another long enough document"),
      (4L, "tiny"),
    ).toDF("doc_id", "text")
  }

  test("llm_map appends a completion per row; duplicates hit the cache") {
    MockLlmStats.reset()
    val out = Semantic.llmMap(docs.repartition(1), "text",
      "classify: {input}", new MockLlm, batchSize = 16).collect()
    assert(out.length === 5)
    val byId = out.map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byId(1L) === "yes: a considerably longer document")
    assert(byId(4L) === "no: tiny")
    assert(byId(0L) === byId(2L), "identical inputs get identical outputs")
    // 5 rows, 4 distinct texts, one partition, one batch => the model
    // saw exactly 4 prompts in exactly 1 call
    assert(MockLlmStats.sizes === Seq(4), "cache deduped the repeated text")
  }

  test("llm_map batches prompts instead of one call per row") {
    MockLlmStats.reset()
    import spark.implicits._
    val many = (0L until 40L).map(i => (i, s"document number $i payload"))
      .toDF("doc_id", "text")
    Semantic.llmMap(many.repartition(1), "text", "p: {input}", new MockLlm,
      batchSize = 16).collect()
    val sizes = MockLlmStats.sizes
    assert(sizes.sum === 40, "every distinct prompt reached the model once")
    assert(sizes.forall(_ <= 16), s"no batch exceeds batchSize: $sizes")
    assert(sizes.length === 3, "40 rows / 16 per batch => 3 calls, not 40")
  }

  test("llm_join keeps pairs the model affirms, batching the verdicts") {
    import spark.implicits._
    MockLlmStats.reset()
    val left = Seq((1L, "alpha beta"), (2L, "x")).toDF("lid", "ltext")
    val right = Seq((10L, "gamma delta"), (20L, "y")).toDF("rid", "rtext")
    // mock says yes iff the combined text after ':' is > 10 chars
    val joined = Semantic.llmJoin(left, right, "ltext", "rtext",
      "related?: {left} ~ {right}", new MockLlm, batchSize = 16)
    val pairs = joined.select("lid", "rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // "alpha beta ~ gamma delta" (>10) yes; "x ~ y" (5 chars) no;
    // mixed pairs: "alpha beta ~ y" (14) yes, "x ~ gamma delta" (15) yes
    assert(pairs === Set((1L, 10L), (1L, 20L), (2L, 10L)))
    assert(joined.columns.toSeq === Seq("lid", "ltext", "rid", "rtext"))
    val sizes = MockLlmStats.sizes
    assert(sizes.sum <= 4, "4 candidate pairs => at most 4 prompts, batched")
  }

  test("llm_filter keeps only yes-verdict rows and drops the scratch column") {
    val kept = Semantic.llmFilter(docs, "text", "is long?: {input}", new MockLlm)
    assert(kept.columns.toSeq === Seq("doc_id", "text"))
    assert(kept.collect().map(_.getLong(0)).toSet === Set(1L, 3L))
  }

  test("llm_join with blocking keys: only co-blocked pairs reach the model") {
    import spark.implicits._
    MockLlmStats.reset()
    val left = Seq((1L, "cat", "alpha beta payload"), (2L, "dog", "gamma delta payload"))
      .toDF("lid", "lcat", "ltext")
    val right = Seq((10L, "cat", "epsilon zeta payload"), (20L, "dog", "eta theta payload"),
        (30L, "cat", "iota kappa payload"))
      .toDF("rid", "rcat", "rtext")
    val joined = Semantic.llmJoin(left, right, "ltext", "rtext",
      "related?: {left} ~ {right}", new MockLlm,
      blockingKeys = Seq("lcat" -> "rcat"), batchSize = 16)
    val pairs = joined.select("lid", "rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cross product is 6 pairs; blocking admits only same-category: 3
    assert(pairs === Set((1L, 10L), (1L, 30L), (2L, 20L)))
    assert(MockLlmStats.sizes.sum === 3,
      s"blocked join must prompt 3 candidates, not 6: ${MockLlmStats.sizes}")
  }

  test("input with an existing _prompt column is not clobbered") {
    import spark.implicits._
    val df = Seq((1L, "long enough document", "user data"))
      .toDF("doc_id", "text", "_prompt")
    val out = Semantic.llmMap(df, "text", "q: {input}", new MockLlm)
    assert(out.columns.toSeq === Seq("doc_id", "text", "_prompt", "llm_out"))
    val r = out.collect().head
    assert(r.getString(2) === "user data", "user's _prompt column survives")
    assert(r.getString(3) === "yes: long enough document")
  }

  test("null text => null completion, never sent to the client") {
    import spark.implicits._
    MockLlmStats.reset()
    val df = Seq((1L, "a sufficiently long text"), (2L, null))
      .toDF("doc_id", "text")
    val out = Semantic.llmMap(df.repartition(1), "text", "q: {input}", new MockLlm)
    val byId = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byId(1L) === "yes: a sufficiently long text")
    assert(byId(2L) === null, "null prompt maps to null output")
    assert(MockLlmStats.sizes.sum === 1, "the null prompt never hit the model")
    // and llm_filter drops the null-verdict row instead of crashing
    val kept = Semantic.llmFilter(df, "text", "q: {input}", new MockLlm)
    assert(kept.collect().map(_.getLong(0)).toSet === Set(1L))
  }
}
