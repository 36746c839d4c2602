package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Semantic/LLM operators (SURVEY.md §2.11 L9): llm_map / llm_filter
  * over an injectable model client, following the batching + caching
  * design of the "SQL over LLMs" line of work (PAPERS.md).
  *
  * No network exists in this environment, so the client is a trait:
  * production wires an HTTP-backed implementation, tests wire a
  * deterministic mock. The operator owns what the engine CAN own:
  *  - batching: prompts go to the client `batchSize` at a time (LLM
  *    APIs amortize per-call overhead across a batch);
  *  - per-partition caching: duplicate inputs within a partition hit
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

  /** llm_map: append `outCol` = client's completion of
    * `promptTemplate` with `{input}` replaced by the row's `textCol`.
    */
  def llmMap(df: DataFrame, textCol: String, promptTemplate: String,
      client: LlmClient, outCol: String = "llm_out",
      batchSize: Int = 16): DataFrame = {
    require(promptTemplate.contains("{input}"),
      "promptTemplate must contain {input}")
    val schema = StructType(df.schema.fields :+
      StructField(outCol, StringType, nullable = true))
    val textIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      val cache = mutable.HashMap.empty[String, String]
      rows.grouped(batchSize).flatMap { batch =>
        val pending = batch.map(_.getString(textIdx))
          .distinct.filterNot(cache.contains)
        if (pending.nonEmpty) {
          val replies = client.complete(
            pending.map(t => promptTemplate.replace("{input}", t)))
          require(replies.length == pending.length,
            s"client returned ${replies.length} replies for ${pending.length} prompts")
          cache ++= pending.zip(replies)
        }
        batch.map(r => Row.fromSeq(r.toSeq :+ cache(r.getString(textIdx))))
      }
    }(Encoders.row(schema))
  }

  /** llm_filter: keep rows where the client's answer to
    * `questionTemplate` (same `{input}` convention) starts with "yes"
    * (case-insensitive) — the canonical LLM-judge predicate.
    */
  def llmFilter(df: DataFrame, textCol: String, questionTemplate: String,
      client: LlmClient, batchSize: Int = 16): DataFrame = {
    val out = llmMap(df, textCol, questionTemplate, client,
      outCol = "_llm_verdict", batchSize = batchSize)
    import org.apache.spark.sql.functions._
    out.filter(lower(col("_llm_verdict")).startsWith("yes"))
      .drop("_llm_verdict")
  }
}
