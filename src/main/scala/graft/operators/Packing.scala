package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training pipelines: assign documents to
  * fixed-token-budget training bins (context windows) so short docs
  * share a window instead of wasting padding.
  *
  * Two semantics, both deterministic, named by what they guarantee:
  *
  *  - [[packByOffset]] — closed-form stream-offset packing. One
  *    running-sum window per group; any number of groups pack in
  *    parallel. Bins can overfill by one straddling document's tail.
  *  - [[packGreedyCapacity]] — capacity-strict first-fit-in-order.
  *    Sequential by definition (every cut depends on history), so it
  *    runs as a sorted per-group fold; parallelism = number of groups,
  *    which is how capacity-strict packing is sharded in production.
  */
object Packing {

  /** Stream-offset packing: concatenate documents in ascending `idCol`
    * order within each `groupCols` shard, cut the token stream every
    * `budgetTokens`, and assign each document to the bin where its
    * FIRST token lands (T5-style packing with straddle-keep: a doc
    * crossing a cut stays whole in its starting bin, so a bin can
    * exceed the budget by at most one document tail).
    *
    * Closed form over ONE exclusive running-sum window — a single sort
    * shuffle on the group key, no sequential state — so this is the
    * 100 TB path. With empty `groupCols` the window is global
    * (single-partition sort): only use ungrouped on bounded inputs;
    * shard by a group column at scale.
    *
    * Output: groupCols ++ (idCol, n_tokens, start_offset, bin).
    */
  def packByOffset(df: DataFrame, groupCols: Seq[String], idCol: String,
      tokenCount: Column, budgetTokens: Int): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens=$budgetTokens must be >= 1")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(idCol))
    df.select(groupCols.map(col) :+ col(idCol) :+
        tokenCount.cast("long").as("n_tokens"): _*)
      .withColumn("start_offset", coalesce(
        sum(col("n_tokens")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("bin", floor(col("start_offset") / lit(budgetTokens)))
  }

  /** Capacity-strict greedy packing (first-fit-in-order): walk the
    * documents of each group in ascending `idCol` order with a running
    * bin fill, and start a new bin when adding the next document would
    * exceed `budgetTokens`. A bin's total NEVER exceeds the budget
    * unless it holds a single oversized document (which gets a bin of
    * its own). Guarantees capacity at the price of sequentiality: each
    * group streams through one task in one pass with O(1) state
    * (flatMapSortedGroups — Spark sorts within the group shuffle, no
    * per-group buffering), so throughput scales with the number of
    * groups, not with documents per group.
    *
    * Output: (groupCol, idCol, n_tokens, bin). NOTE: the group column
    * comes back as STRING (it is the typed fold's grouping key) and the
    * id as BIGINT — unlike [[packByOffset]], which preserves input
    * types; re-cast before joining back on a non-string group key.
    */
  def packGreedyCapacity(df: DataFrame, groupCol: String, idCol: String,
      tokenCount: Column, budgetTokens: Int): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens=$budgetTokens must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string").as("grp"),
        col(idCol).cast("long").as("id"),
        tokenCount.cast("long").as("n_tokens"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("id")) { (grp, rows) =>
        var bin = 0L
        var fill = 0L
        var first = true
        rows.map { case (_, id, n) =>
          if (!first && fill + n > budgetTokens) { bin += 1; fill = 0L }
          first = false
          fill += n
          (grp, id, n, bin)
        }
      }
      .toDF(groupCol, idCol, "n_tokens", "bin")
  }

  /** Length-bucketed batch assembly — the padding-waste killer for
    * inference and non-packed training: documents land in a length
    * bucket (`floor(len / bucketWidth)`), each bucket is walked in
    * (length, id) order, and consecutive runs of `batchSize` documents
    * form a batch. Sequences in a batch then differ by less than
    * `bucketWidth` tokens, so pad-to-longest waste is bounded by the
    * bucket width instead of the corpus-max length.
    *
    * Closed form over ONE row_number window partitioned by bucket — a
    * single sort shuffle keyed on the bucket (parallel across buckets;
    * a skewed bucket is one sort partition, the same regime as any
    * grouped window). Deterministic: same input, same batches.
    *
    * Output: (idCol, len, bucket, batch_id, pos_in_batch) with
    * batch_id globally unique via (bucket, run index).
    */
  def bucketBatches(df: DataFrame, idCol: String, lenCol: Column,
      bucketWidth: Int, batchSize: Int): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth=$bucketWidth must be >= 1")
    require(batchSize >= 1, s"batchSize=$batchSize must be >= 1")
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("len"), col(idCol))
    df.select(col(idCol), lenCol.cast("long").as("len"))
      .withColumn("bucket", floor(col("len") / lit(bucketWidth)))
      .withColumn("_rn", row_number().over(w).cast("long") - 1L)
      .withColumn("batch_id",
        concat_ws(":", col("bucket"), floor(col("_rn") / lit(batchSize))))
      .withColumn("pos_in_batch", col("_rn") % batchSize)
      .drop("_rn")
  }
}
