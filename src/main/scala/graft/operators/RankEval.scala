package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking-agreement metrics between two top-k lists per query key —
  * the evaluation layer for the similarity-search family: "how close
  * is the ANN/quantized/projected ranking to the exact one" as a
  * number per query, not an eyeball.
  *
  * Implemented metric: truncated rank-biased overlap (RBO, Webber et
  * al. 2010, ACM TOIS 29(4)) at depth k with persistence p — the
  * standard top-weighted list-agreement measure: agreement at depth d
  * contributes with weight p^(d-1), so swaps near rank 1 cost more
  * than swaps near rank k. This is the FIXED-DEPTH lower-bound form
  * (no extrapolation term): two identical k-lists score
  * Σ_{d=1..k} (1-p)p^(d-1) < 1, disjoint lists score 0.
  *
  * Scale shape: one equi-join of the two ranking tables on (query,
  * item) — both already top-k, so the join input is k rows per query
  * per side, NOT corpus-sized — then one query-keyed aggregation. The
  * per-depth weights fold into a k-sized literal lookup (an item
  * first co-present at depth m = max(rankA, rankB) contributes
  * Σ_{d=m..k} (1-p)p^(d-1)/d, precomputed once), so the join output
  * needs no per-depth fan-out.
  */
object RankEval {

  /** contribution(m) for a matched item whose later rank is m:
    * Σ_{d=m..k} (1-p)·p^(d-1)/d. Index 0 holds m=1.
    */
  def rboWeights(k: Int, p: Double): Seq[Double] = {
    require(k >= 1, s"rboWeights: k must be >= 1, got $k")
    require(p > 0.0 && p < 1.0, s"rboWeights: p must be in (0,1), got $p")
    (1 to k).map(m =>
      (m to k).map(d => (1 - p) * math.pow(p, d - 1) / d).sum)
  }

  /** Truncated RBO per query key between two rankings. Each input must
    * carry (qCol, idCol, rankCol) with ranks 1..k dense per query (the
    * caller's row_number over its own total order). Queries present in
    * either input emit a row; zero-overlap pairs score 0.0.
    */
  def rbo(a: DataFrame, b: DataFrame, qCol: String, idCol: String,
      rankCol: String, k: Int, p: Double): DataFrame = {
    val w = rboWeights(k, p)
    val contrib = element_at(typedLit(w),
      greatest(col("_ra"), col("_rb")).cast("int"))
    val aa = a.select(col(qCol).as("q"), col(idCol).as("item"),
      col(rankCol).cast("long").as("_ra")).filter(col("_ra") <= k)
    val bb = b.select(col(qCol).as("q"), col(idCol).as("item"),
      col(rankCol).cast("long").as("_rb")).filter(col("_rb") <= k)
    val qs = aa.select("q").unionByName(bb.select("q")).distinct()
    val matched = aa.join(bb, Seq("q", "item"))
      .groupBy("q")
      .agg(round(sum(contrib), 6).cast("double").as("rbo"),
        count(lit(1)).as("n_common"))
    qs.join(matched, Seq("q"), "left")
      .select(col("q").as(qCol),
        coalesce(col("rbo"), lit(0.0)).as("rbo"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
  }
}
