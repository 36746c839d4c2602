package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Descending, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

import org.apache.spark.sql.graft.Bridge

/** Whole-operator extension (the §7.4 preference-order (c) route):
  * top-k rows per key as a first-class logical + physical operator,
  * planned through a custom Strategy registered in GraftExtensions.
  *
  * Why not row_number() OVER (PARTITION BY key ORDER BY ord)? WindowExec
  * buffers each key's ENTIRE row group before emitting rank 1 — for a
  * hot key with 10^8 rows at 100 TB that is an OOM/spill machine, just
  * to throw away all but k rows. This operator requests the same
  * clustering + intra-partition sort from the planner (so the shuffle
  * is identical) but then STREAMS: one counter per key run, O(k·row)
  * memory, emitting at most k rows per key and never materializing a
  * group.
  *
  * The exchange/sort reuse comes free: requiredChildDistribution and
  * requiredChildOrdering declare what WindowExec would have declared,
  * and Catalyst inserts (or reuses!) the exact same Exchange + Sort.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan,
    // constructor param (not a val): optimizer copies of this node must
    // keep the SAME exprId or upstream references to `rn` dangle
    rankAttr: AttributeReference = AttributeReference("rn", LongType,
      nullable = false)()) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rn is PRODUCED here, not consumed from the child
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    rankAttr: Attribute, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(keys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(keys.map(SortOrder(_, Ascending)) ++ order)

  override def outputOrdering: Seq[SortOrder] =
    keys.map(SortOrder(_, Ascending)) ++ order

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val limit = k
    val outAttrs = output
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // downstream operators (exchanges especially) require UnsafeRow
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      new Iterator[InternalRow] {
        private var curKey: InternalRow = null
        private var rank = 0L
        private var nextRow: InternalRow = null
        private var emitRank = 0L
        private val joined = new JoinedRow
        private val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

        // Lazy advance: the child's rows are REUSED buffers, so the
        // emitted row must stay untouched until the consumer asks for
        // the next one (the standard SparkPlan iterator contract);
        // eagerly pre-fetching would overwrite what we just emitted.
        private def advance(): Unit = {
          nextRow = null
          while (nextRow == null && iter.hasNext) {
            val row = iter.next()
            val key = keyProj(row)
            if (curKey == null || key != curKey) {
              curKey = key.copy() // run boundary: projections reuse buffers
              rank = 0L
            }
            rank += 1
            if (rank <= limit) { nextRow = row; emitRank = rank }
            // rows past k in the current run are skipped without buffering
          }
        }

        private var ready = false
        override def hasNext: Boolean = {
          if (!ready) { advance(); ready = true }
          nextRow != null
        }
        override def next(): InternalRow = {
          if (!ready) advance()
          ready = false
          rankRow.update(0, emitRank)
          outProj(joined(nextRow, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Plans TopKPerKeyNode; registered via GraftExtensions. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child, rankAttr) =>
      TopKPerKeyExec(keys, order, k, rankAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API. */
object TopK {
  /** Top `k` rows per distinct value of `keyCols`, ranked by
    * `orderCol` (descending when `desc`), with a `rn` rank column
    * appended. `tieBreakCols` (ascending) make ranks deterministic
    * under ties — required when the output feeds an exact comparison.
    */
  def perKey(df: DataFrame, keyCols: Seq[String], orderCol: String, k: Int,
      desc: Boolean = true, tieBreakCols: Seq[String] = Nil): DataFrame = {
    // sessions wired via GraftExtensions already have the strategy;
    // for any other session, the public experimental hook adds it
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    val plan = Bridge.logicalPlan(df)
    // resolve against the df so the node is born fully resolved
    val keyExprs = keyCols.map(c => Bridge.expression(df(c)))
    val sortOrder = SortOrder(Bridge.expression(df(orderCol)),
      if (desc) Descending else Ascending) +:
      tieBreakCols.map(c => SortOrder(Bridge.expression(df(c)), Ascending))
    Bridge.ofRows(df.sparkSession,
      TopKPerKeyNode(keyExprs, sortOrder, k, plan))
  }
}
