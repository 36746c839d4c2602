package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Semantic/LLM operators (SURVEY.md §2.11 L9): llm_map / llm_filter /
  * llm_join over an injectable model client, following the batching +
  * caching design of the "SQL over LLMs" line of work (PAPERS.md).
  *
  * No network exists in this environment, so the client is a trait:
  * production wires an HTTP-backed implementation, tests wire a
  * deterministic mock. The operator owns what the engine CAN own:
  *  - batching: prompts go to the client `batchSize` at a time (LLM
  *    APIs amortize per-call overhead across a batch);
  *  - per-partition caching: duplicate prompts within a partition hit
  *    the cache, not the model (dedup-before-inference — at 100 TB
  *    input texts repeat heavily);
  *  - distribution: mapPartitions keeps inference on executors; one
  *    client per partition, no driver round-trips, no shuffle of the
  *    text payload beyond what the plan already required.
  */
object Semantic {

  /** Model client contract: complete a BATCH of prompts, one reply per
    * prompt, order-preserving. Implementations must be Serializable
    * (constructed on the driver, used on executors).
    */
  trait LlmClient extends Serializable {
    def complete(prompts: Seq[String]): Seq[String]
  }

  /** Template like "classify: {input}" compiled to a concat Column over
    * the given substitutions — prompt construction stays a codegen'd
    * expression; only the model call itself is opaque.
    */
  private def templateCol(template: String, subs: Seq[(String, Column)]): Column = {
    val marked = subs.foldLeft(template) { case (t, (name, _)) =>
      t.replace(s"{$name}", "\u0000" + name + "\u0000")
    }
    val pieces = marked.split("\u0000", -1).zipWithIndex.map { case (piece, idx) =>
      if (idx % 2 == 0) lit(piece)
      else subs.collectFirst { case (n, c) if n == piece => c }.getOrElse(
        throw new IllegalArgumentException(s"unknown placeholder {$piece}"))
    }
    concat(pieces.toIndexedSeq: _*)
  }

  /** Core executor loop: append `outCol` = completion of `promptCol`,
    * batched and cached per partition. Null prompts (e.g. a null text
    * column nulling the concat) never reach the client — they map to a
    * null completion, which llmFilter then drops.
    */
  private def completeColumn(df: DataFrame, promptCol: Column,
      outCol: String, client: LlmClient, batchSize: Int): DataFrame = {
    require(batchSize > 0)
    // collision-free temp name: if the input already had "_prompt",
    // withColumn would replace it in place and the positional
    // dropRight(1) below would strip a USER column instead
    val tmpCol = Iterator.iterate("_prompt")(_ + "_")
      .dropWhile(df.columns.contains).next()
    val withPrompt = df.withColumn(tmpCol, promptCol)
    val schema = StructType(df.schema.fields :+
      StructField(outCol, StringType, nullable = true))
    val promptIdx = withPrompt.schema.fieldIndex(tmpCol)
    withPrompt.mapPartitions { rows =>
      val cache = mutable.HashMap.empty[String, String]
      rows.grouped(batchSize).flatMap { batch =>
        val pending = batch.iterator
          .filterNot(_.isNullAt(promptIdx)).map(_.getString(promptIdx))
          .toSeq.distinct.filterNot(cache.contains)
        if (pending.nonEmpty) {
          val replies = client.complete(pending)
          require(replies.length == pending.length,
            s"client returned ${replies.length} replies for ${pending.length} prompts")
          cache ++= pending.zip(replies)
        }
        batch.map { r =>
          val out =
            if (r.isNullAt(promptIdx)) null else cache(r.getString(promptIdx))
          Row.fromSeq(r.toSeq.dropRight(1) :+ out)
        }
      }
    }(Encoders.row(schema))
  }

  /** llm_map: append `outCol` = client's completion of
    * `promptTemplate` with `{input}` replaced by the row's `textCol`.
    */
  def llmMap(df: DataFrame, textCol: String, promptTemplate: String,
      client: LlmClient, outCol: String = "llm_out",
      batchSize: Int = 16): DataFrame = {
    require(promptTemplate.contains("{input}"),
      "promptTemplate must contain {input}")
    completeColumn(df,
      templateCol(promptTemplate, Seq("input" -> col(textCol))),
      outCol, client, batchSize)
  }

  /** llm_filter: keep rows where the client's answer to
    * `questionTemplate` (same `{input}` convention) starts with "yes"
    * (case-insensitive) — the canonical LLM-judge predicate.
    */
  def llmFilter(df: DataFrame, textCol: String, questionTemplate: String,
      client: LlmClient, batchSize: Int = 16): DataFrame = {
    val out = llmMap(df, textCol, questionTemplate, client,
      outCol = "_llm_verdict", batchSize = batchSize)
    out.filter(lower(col("_llm_verdict")).startsWith("yes"))
      .drop("_llm_verdict")
  }

  /** llm_join: semantic theta-join — keep (left, right) pairs the
    * model affirms for `questionTemplate` with `{left}`/`{right}`
    * placeholders.
    *
    * The candidate set is bounded IN the API: `blockingKeys` equi-joins
    * the sides on (leftKey, rightKey) pairs before any prompt is built,
    * so only co-blocked pairs ever reach the model — the standard
    * blocking step of entity resolution, and the only shape that
    * survives 100 TB (the verdict pass costs one model call per
    * CANDIDATE, so candidate generation is the scale knob, not the
    * join). An empty `blockingKeys` falls back to the cross product
    * for small bounded inputs. Pre-computed candidate sets (LSH
    * buckets, top-k retrieval) go through `llmJoinCandidates`.
    */
  def llmJoin(left: DataFrame, right: DataFrame,
      leftTextCol: String, rightTextCol: String, questionTemplate: String,
      client: LlmClient, blockingKeys: Seq[(String, String)] = Nil,
      batchSize: Int = 16): DataFrame = {
    val pairs =
      if (blockingKeys.nonEmpty)
        left.join(right,
          blockingKeys.map { case (lk, rk) => left(lk) === right(rk) }
            .reduce(_ && _))
      else left.crossJoin(right)
    llmJoinCandidates(pairs, leftTextCol, rightTextCol, questionTemplate,
      client, batchSize)
  }

  /** Verdict pass over a caller-built candidate-pair DataFrame (each
    * row already carries both sides' text columns — from blocking, LSH
    * bucketing, ANN top-k, or any other candidate generator). Owns
    * only what the engine can own: batched, per-partition-cached,
    * executor-side model calls.
    */
  def llmJoinCandidates(pairs: DataFrame, leftTextCol: String,
      rightTextCol: String, questionTemplate: String,
      client: LlmClient, batchSize: Int = 16): DataFrame = {
    require(questionTemplate.contains("{left}") &&
      questionTemplate.contains("{right}"),
      "questionTemplate must contain {left} and {right}")
    val out = completeColumn(pairs,
      templateCol(questionTemplate,
        Seq("left" -> col(leftTextCol), "right" -> col(rightTextCol))),
      "_llm_verdict", client, batchSize)
    out.filter(lower(col("_llm_verdict")).startsWith("yes"))
      .drop("_llm_verdict")
  }
}
