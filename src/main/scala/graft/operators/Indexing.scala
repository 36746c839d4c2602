package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global indexing.
  *
  * `ROW_NUMBER() OVER (ORDER BY …)` with no PARTITION BY collapses the
  * whole dataset into ONE partition — the classic 100 TB trap (the
  * plan literally contains `Exchange SinglePartition`). The honest
  * shape is range-partition + local index + partition-count offsets:
  * the data moves through ONE range shuffle at full parallelism, the
  * only single-partition work is the P-row offset table.
  */
object Indexing {

  /** Global dense ids 1..N in `orderCols` order (which must be a TOTAL
    * order — include a unique key column, the repo-wide tie contract;
    * under ties the ids among tied rows are partitioning-dependent).
    *
    * Shape: `repartitionByRange` on the order columns (one shuffle,
    * full parallelism) → in-partition sort → a streaming
    * mapPartitions counter for the local index (O(1) state, the ewma
    * kernel pattern — a window over spark_partition_id would re-shuffle
    * the data a second time) → per-partition counts (P tiny rows) →
    * cumulative offsets broadcast back. Ids are independent of where
    * the range boundaries fall: global position in a total order is
    * partitioning-invariant.
    */
  def denseIds(df: DataFrame, orderCols: Seq[String],
      outCol: String = "rid"): DataFrame = {
    require(orderCols.nonEmpty, "denseIds needs at least one order column")
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column; pass a different outCol")
    val Seq(pid, lrn, off) = Cols.fresh("idx", 3, df)

    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+
        org.apache.spark.sql.types.StructField(pid,
          org.apache.spark.sql.types.IntegerType, nullable = false) :+
        org.apache.spark.sql.types.StructField(lrn,
          org.apache.spark.sql.types.LongType, nullable = false))
    val ranged = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    // localCheckpoint: the offset table AND the final join both consume
    // `local`; without materialization they are two INDEPENDENT
    // evaluations whose task-partition ids need not coincide (AQE may
    // even coalesce the range exchange differently per subtree), which
    // silently breaks the pid equi-join. One materialization freezes
    // the pid assignment for both consumers — the Clustering.localCheckpoint
    // precedent, state = the indexed data itself.
    val local = ranged.mapPartitions { it =>
      var n = 0L
      var p = -1
      it.map { r =>
        if (p < 0) p = org.apache.spark.TaskContext.getPartitionId()
        n += 1
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ p :+ n)
      }
    }(org.apache.spark.sql.Encoders.row(schema)).localCheckpoint()

    val offsets = local.groupBy(col(pid)).agg(count(lit(1)).as(outCol))
      .withColumn(off, coalesce(
        sum(col(outCol)).over(Window.orderBy(col(pid))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(pid), col(off))
    local.join(broadcast(offsets), Seq(pid))
      .withColumn(outCol, col(off) + col(lrn))
      .drop(pid, lrn, off)
  }
}
