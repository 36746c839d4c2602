package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval joins at scale.
  *
  * Spark plans a raw `p >= lo AND p < hi` join as
  * BroadcastNestedLoopJoin (every point against every interval) — fine
  * when one side broadcasts, quadratic death when both sides are big.
  * Binning turns it into an EQUI-join: intervals explode to the bins
  * they span, points map to their one bin, and the bin key hash-joins.
  * Each matching (point, interval) pair collides in exactly the
  * point's bin, so the exact range filter after the join removes only
  * false candidates and no dedup is ever needed.
  *
  * Cost model: interval fan-out = span/binWidth + 1 rows per interval.
  * Pick binWidth near the typical interval span so fan-out is O(1);
  * the join is then one shuffle of points + exploded intervals on the
  * bin key — the shape that survives two big sides.
  */
object RangeJoin {

  /** Join `points` to every interval with lo <= point < hi (half-open),
    * via equi-join on bins of `binWidth`. Both inputs keep all their
    * columns; the bin key is internal.
    */
  def binned(points: DataFrame, intervals: DataFrame, pointCol: String,
      loCol: String, hiCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // collision-free internal key: never clobber a caller's column
    val Seq(bin) = Cols.fresh("bin", 1, points, intervals)
    val p = points.withColumn(bin,
      floor(col(pointCol) / binWidth).cast("long"))
    val i = intervals.withColumn(bin,
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(i, Seq(bin))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop(bin)
  }

  /** INTERVAL-overlap join (both sides ranged — the genomics /
    * session-overlap shape): every (left, right) pair whose CLOSED
    * intervals intersect, `lLo <= rHi AND rLo <= lHi`. Spark plans the
    * raw conjunction as a nested-loop too; both sides explode to their
    * spanned bins and hash-join on the bin key.
    *
    * Unlike [[binned]] (where the point's single bin makes each true
    * pair collide exactly once), two intervals can share SEVERAL bins,
    * so the candidate pairs pass through one `dropDuplicates` on the
    * caller-named id columns — pair-granularity state, the same
    * distinct every banded dedup join in this repo carries.
    *
    * Cost: fan-out = span/binWidth + 1 per row per side; candidates =
    * Σ_bin |L_bin|·|R_bin|. Pick binWidth near the typical span so
    * both stay O(1)·rows, and the join is one shuffle per side on the
    * bin key — the two-big-sides shape.
    */
  def overlapBinned(left: DataFrame, right: DataFrame,
      lIdCol: String, lLoCol: String, lHiCol: String,
      rIdCol: String, rLoCol: String, rHiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require((Seq(lIdCol, lLoCol, lHiCol) intersect Seq(rIdCol, rLoCol, rHiCol)).isEmpty,
      "left and right column names must be disjoint (both survive in the output)")
    val Seq(bin) = Cols.fresh("bin", 1, left, right)
    def explodeBins(df: DataFrame, lo: String, hi: String) =
      df.withColumn(bin, explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    explodeBins(left.select(lIdCol, lLoCol, lHiCol), lLoCol, lHiCol)
      .join(explodeBins(right.select(rIdCol, rLoCol, rHiCol), rLoCol, rHiCol),
        Seq(bin))
      .filter(col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol))
      .drop(bin)
      .dropDuplicates(lIdCol, rIdCol)
  }
}
