package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT percentiles without the value-buffering aggregate.
  *
  * Spark's exact `percentile` keeps a per-buffer hashmap of every
  * distinct value — on a near-unique 100 TB column that buffer is
  * unbounded (the one scale-killer the round-3 verdict flagged). This
  * computes the SAME values (bit-identical interpolation, spec-pinned
  * against `percentile` on arbitrary data) with bounded memory:
  *
  *  1. count pass (cheap, count-only scan);
  *  2. bracket pass: Greenwald-Khanna `approx_percentile` brackets
  *     around each target (rank error <= n/accuracy, widened to >= 3
  *     absolute rows for small n and GK's differing quantile
  *     definition);
  *  3. refine pass: for each bracket, the exact count of rows below it
  *     and the rows inside it (conditional count + collect_list in a
  *     single aggregation);
  *  4. driver side: sort each bracket's ~2n/accuracy values, read the
  *     two neighbors of the target rank, interpolate with Spark's own
  *     formula (higher-pos)·lo + (pos-lower)·hi.
  *
  * Driver data is brackets × (2n/accuracy) values — bounded by a
  * CONFIG, not by data (accuracy 10000 on 1e12 rows: ~2e8... pick
  * accuracy ~ n/1e4 at that scale; the `require` fails loudly if a
  * bracket exceeds `maxBracketRows` instead of OOMing silently).
  * Guarantee checks are `require`d: if GK ever under-covers a target
  * rank the call fails loudly rather than returning a wrong value.
  */
object Percentiles {

  def exactValues(df: DataFrame, valueCol: Column, ps: Seq[Double],
      accuracy: Int = 10000, maxBracketRows: Int = 1000000): Seq[Double] = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0,1]: $ps")
    val v = valueCol.cast("double")
    val vals = df.filter(v.isNotNull).select(v.as("_x"))

    // pass 0: n (cheap count-only scan). The bracket margin must be
    // ABSOLUTE in rank space too: GK's e-rank error is relative
    // (n/accuracy rows), but approx_percentile's quantile definition
    // (rank ~ p*n) differs from percentile's interpolation definition
    // (p*(n-1)) by up to one row — 3/n guarantees >= 3 rows of margin
    // at any size.
    val n = vals.count()
    require(n > 0, "exactValues: no non-null rows")
    val eps = math.max(3.0 / accuracy, 3.0 / n)

    // pass 1: GK brackets around each target
    val bracketPs = ps.flatMap(p =>
      Seq(math.max(0.0, p - eps), math.min(1.0, p + eps)))
    val brackets = vals.agg(
      approx_percentile(col("_x"), array(bracketPs.map(lit): _*),
        lit(accuracy)).as("_b")).head().getSeq[Double](0)

    // pass 2: per-target exact counts below the bracket + the bracket's
    // row values, one shared aggregation
    val aggs = ps.indices.flatMap { i =>
      val (blo, bhi) = (brackets(2 * i), brackets(2 * i + 1))
      Seq(
        sum(when(col("_x") < blo, 1L).otherwise(0L)).as(s"_c$i"),
        collect_list(when(col("_x").between(blo, bhi), col("_x")))
          .as(s"_w$i"))
    }
    val row = vals.agg(aggs.head, aggs.tail: _*).head()

    ps.indices.map { i =>
      val below = row.getLong(2 * i)
      val window = row.getSeq[Double](2 * i + 1).sorted
      require(window.length <= maxBracketRows,
        s"exactValues: bracket $i holds ${window.length} rows > " +
          s"$maxBracketRows — raise accuracy for this data size")
      val pos = ps(i) * (n - 1) // 0-based fractional rank
      val lower = math.floor(pos).toLong
      val higher = math.ceil(pos).toLong
      def at(rank0: Long): Double = { // 0-based global rank
        val j = rank0 - below
        require(j >= 0 && j < window.length,
          s"exactValues: target rank $rank0 outside bracket $i " +
            s"[$below, ${below + window.length}) — GK guarantee violated")
        window(j.toInt)
      }
      if (higher == lower) at(lower)
      else (higher - pos) * at(lower) + (pos - lower) * at(higher)
    }
  }

  /** Exact weighted quantile per group: the smallest value whose
    * cumulative weight reaches p = pNum/pDen of the total — "the
    * median order price weighted by quantity", the inventory/revenue
    * flavor of a quantile where every row counts as `weightCol` units.
    *
    * The probability is a RATIONAL (pNum/pDen), so the crossing
    * threshold ceil(W·pNum/pDen) is pure integer arithmetic — no
    * float q, no interpolation scheme, deterministic under value ties
    * (weights aggregate per distinct value first, so the cumulative
    * is a function of the value alone). Weights must be non-negative
    * integers (pre-scale fractional weights); the answer value passes
    * through untouched.
    *
    * Scale shape: one (group, value)-keyed sum shuffle, one sort
    * window per group over DISTINCT values, one min-agg — the
    * trimmedMean family. Zero-total-weight groups report NULL.
    * Output: (groupCols..., total_weight, wq).
    */
  def weightedQuantile(df: DataFrame, groupCols: Seq[String],
      valueCol: String, weightCol: String, pNum: Int, pDen: Int): DataFrame = {
    require(pDen >= 1 && pNum >= 1 && pNum <= pDen,
      s"p=$pNum/$pDen must sit in (0, 1]")
    val gcols = groupCols.map(col)
    val cells = df
      .select((gcols :+ col(valueCol).as("_v")
        :+ col(weightCol).cast("long").as("_w")): _*)
      .groupBy((gcols :+ col("_v")): _*)
      .agg(sum("_w").as("_wv"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*).orderBy("_v")
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*)
    val num = col("_tw") * pNum + pDen - 1
    cells
      .withColumn("_cum", sum("_wv").over(wOrd))
      .withColumn("_tw", sum("_wv").over(wAll))
      // ceil(W·pNum/pDen) = (W·pNum + pDen − 1 − mod) / pDen, all long
      .withColumn("_thr", ((num - pmod(num, lit(pDen.toLong))) / pDen)
        .cast("long"))
      .groupBy(gcols: _*)
      .agg(max("_tw").as("total_weight"),
        min(when(col("_cum") >= col("_thr") && col("_thr") > 0, col("_v")))
          .as("wq"))
  }

  /** Grouped quantiles through the PERSISTABLE mergeable sketch
    * ([[graft.functions.QuantileSketch]]) — the reusable backend for
    * the approx-percentile duals: one sketch per group (bounded
    * O(k·log(n/k)) state, map-side partial aggregation), one output
    * column per requested quantile, EXACT type-1 order statistics
    * while a group holds ≤ k values. The sketch column itself is a
    * plain binary — persist the grouped sketches to parquet, reload
    * in a later session, and combine with
    * [[graft.functions.QuantileSketch.mergeAgg]] instead of
    * re-scanning the corpus.
    *
    * Output: (groupCols..., n, q_<pct> per requested quantile).
    */
  def sketchQuantiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, qs: Seq[Double], k: Int): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"sketchQuantiles: quantiles must be in [0,1]: $qs")
    // output columns are named q_<rounded percent>; distinct quantiles
    // that round to the same integer percent (0.249 and 0.251 → q_25
    // twice) would produce a duplicate-column select — fail loudly
    // instead of letting the ambiguity surface downstream
    locally {
      val names = qs.map(q => math.round(q * 100))
      require(names.distinct.length == names.length,
        s"sketchQuantiles: quantiles $qs collide after rounding to " +
          s"integer percents (${names.mkString(",")}) — space them or " +
          "query the sketch column directly with QuantileSketch.quantileOf")
    }
    import graft.functions.QuantileSketch
    val gcols = groupCols.map(col)
    val grouped =
      if (groupCols.isEmpty) df.groupBy() else df.groupBy(gcols: _*)
    val sk = grouped.agg(
      QuantileSketch.sketchAgg(col(valueCol).cast("double"), k).as("_sk"))
    sk.select((gcols :+ QuantileSketch.countOf(col("_sk")).as("n")) ++
      qs.map(q => QuantileSketch.quantileOf(col("_sk"), q)
        .as(s"q_${math.round(q * 100)}")): _*)
  }
}
