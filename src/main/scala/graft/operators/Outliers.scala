package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Numeric outlier treatment for training-data quality: winsorizing
  * (clamp into a percentile band) and IQR filtering (drop far tails).
  *
  * Scale shape: the thresholds are a ONE-ROW aggregate computed
  * in-plan and broadcast-cross-joined onto the data — no driver-side
  * collect, no second pass triggered eagerly; the whole treatment is
  * one aggregate job feeding a map-side clamp/filter, the same pattern
  * as TF-IDF's in-plan corpus N.
  */
object Outliers {

  /** Backtick-quoted column reference: names with dots/spaces/hyphens
    * resolve as the literal column, not a nested-field path (ADVICE
    * r3 — the old string-interpolated `expr("percentile(name, p)")`
    * failed to parse such names entirely).
    */
  private def vcol(name: String) =
    col(s"`${name.replace("`", "``")}`")

  /** Clamp `valueCol` into its [pLo, pHi] percentile band (exact
    * percentiles, continuous interpolation — matches DuckDB
    * QUANTILE_CONT). Row count and all other columns are unchanged;
    * NULL values STAY NULL (greatest/least skip nulls, which would
    * silently substitute the lower bound — fabricated data). The
    * clamped column is retyped to double (the percentile bounds are
    * doubles, so integer inputs widen).
    *
    * The exact bounds come from [[Percentiles.exactValues]] —
    * bounded-memory (GK-bracket + exact-refine, bit-identical to the
    * value-buffering `percentile` aggregate, PercentilesSpec-pinned) —
    * so the exact path no longer degrades on high-cardinality columns;
    * it IS eager (two bound-finding jobs at construction, the
    * IvfIndex.train precedent) and fails loudly on an all-null column.
    * The clamp itself is a pure map-side literal expression — no join,
    * no exchange. [[winsorizeApprox]] remains the lazy in-plan
    * variant.
    */
  def winsorize(df: DataFrame, valueCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    require(0.0 <= pLo && pLo <= pHi && pHi <= 1.0)
    val Seq(loV, hiV) =
      Percentiles.exactValues(df, vcol(valueCol), Seq(pLo, pHi))
    df.withColumn(valueCol,
      when(vcol(valueCol).isNull, lit(null).cast("double"))
        .otherwise(least(greatest(vcol(valueCol).cast("double"),
          lit(loV)), lit(hiV))))
  }

  /** Winsorize with approximate percentile thresholds — the 100 TB
    * path. `approx_percentile` (Greenwald-Khanna) keeps an
    * O(accuracy)-bounded summary per aggregation buffer instead of
    * every distinct value; at the default accuracy 10000 the rank
    * error is <= 0.01% of n, so the clamp bounds sit within that rank
    * band of the exact ones (OutliersSpec pins the deviation on the
    * judged fixture). Same in-plan broadcast one-row-agg shape — no
    * driver collect.
    */
  def winsorizeApprox(df: DataFrame, valueCol: String,
      pLo: Double, pHi: Double, accuracy: Int = 10000): DataFrame = {
    require(0.0 <= pLo && pLo <= pHi && pHi <= 1.0)
    clampToBounds(df, valueCol, df.agg(
      approx_percentile(vcol(valueCol), lit(pLo), lit(accuracy)).cast("double"),
      approx_percentile(vcol(valueCol), lit(pHi), lit(accuracy)).cast("double")))
  }

  /** Shared clamp: attach a (lo, hi) one-row bounds aggregate via
    * broadcast cross join and clamp map-side.
    */
  private def clampToBounds(df: DataFrame, valueCol: String,
      bounds: DataFrame): DataFrame = {
    val Seq(lo, hi) = Cols.fresh("wins", 2, df)
    val named = bounds.toDF(lo, hi)
    df.crossJoin(broadcast(named))
      .withColumn(valueCol,
        when(vcol(valueCol).isNull, lit(null).cast("double"))
          .otherwise(least(greatest(vcol(valueCol).cast("double"), col(lo)), col(hi))))
      .drop(lo, hi)
  }

  /** Tukey IQR filter: keep rows with value in
    * [q1 - k*(q3-q1), q3 + k*(q3-q1)]. Null values drop (they fail the
    * predicate), matching SQL comparison semantics. Exact quartiles
    * via [[Percentiles.exactValues]] (bounded memory, bit-identical —
    * see [[winsorize]] for the eagerness note); the filter is a pure
    * map-side literal predicate, pushable to the scan.
    */
  def iqrFilter(df: DataFrame, valueCol: String, k: Double = 1.5): DataFrame = {
    require(k >= 0.0)
    val Seq(q1, q3) =
      Percentiles.exactValues(df, vcol(valueCol), Seq(0.25, 0.75))
    df.filter(vcol(valueCol) >= lit(q1 - k * (q3 - q1)) &&
      vcol(valueCol) <= lit(q3 + k * (q3 - q1)))
  }

  /** IQR filter on approximate quartiles — bounded-memory thresholds
    * for unbounded inputs; see [[winsorizeApprox]] for the error
    * contract.
    */
  def iqrFilterApprox(df: DataFrame, valueCol: String, k: Double = 1.5,
      accuracy: Int = 10000): DataFrame = {
    require(k >= 0.0)
    filterToBounds(df, valueCol, k, df.agg(
      approx_percentile(vcol(valueCol), lit(0.25), lit(accuracy)).cast("double"),
      approx_percentile(vcol(valueCol), lit(0.75), lit(accuracy)).cast("double")))
  }

  /** Robust z-score (median/MAD) anomaly scoring, optionally per
    * group: score = (x - median) / (1.4826 * MAD) with
    * MAD = median(|x - median|) and 1.4826 the normal-consistency
    * factor, so |score| > 3 reads like "3 sigma" but is immune to the
    * outliers themselves inflating the threshold (mean/stddev z-scores
    * self-mask exactly the rows they should flag). Appends `robust_z`
    * (null when the value is null or MAD = 0 — a degenerate
    * constant-majority group has no meaningful scale).
    *
    * Scale shape: two aggregate passes by construction (MAD needs the
    * median first); both stats tables are GROUP-count-sized and join
    * back broadcast, so the data itself never shuffles. Exact
    * percentile buffers per group — the unbounded-cardinality path is
    * [[robustZScoreApprox]], mirroring winsorize/winsorizeApprox.
    */
  def robustZScore(df: DataFrame, valueCol: String,
      groupCols: Seq[String]): DataFrame =
    robustZScoreWith(df, valueCol, groupCols,
      c => percentile(c, lit(0.5)))

  /** Robust z-score on approximate medians — the 100 TB path; see
    * [[winsorizeApprox]] for the accuracy contract.
    */
  def robustZScoreApprox(df: DataFrame, valueCol: String,
      groupCols: Seq[String], accuracy: Int = 10000): DataFrame =
    robustZScoreWith(df, valueCol, groupCols,
      c => approx_percentile(c, lit(0.5), lit(accuracy)).cast("double"))

  private def robustZScoreWith(df: DataFrame, valueCol: String,
      groupCols: Seq[String], median: Column => Column): DataFrame = {
    val Seq(med, mad) = Cols.fresh("rz", 2, df)
    val v = vcol(valueCol).cast("double")
    // group attach is NULL-SAFE (<=>): a null group key is a group like
    // any other — a plain equi-join would silently DROP its rows from
    // the output, the one unacceptable failure mode for a
    // row-preserving scorer
    def attach(base: DataFrame, agg: Column, as: String): DataFrame =
      if (groupCols.isEmpty) base.crossJoin(broadcast(base.agg(agg.as(as))))
      else {
        val gNames = Cols.fresh("rzg", groupCols.size, base)
        val stats = groupCols.zip(gNames).foldLeft(
          base.groupBy(groupCols.map(col): _*).agg(agg.as(as))) {
          case (d, (c, g)) => d.withColumnRenamed(c, g)
        }
        groupCols.zip(gNames)
          .foldLeft(base.join(broadcast(stats),
            groupCols.zip(gNames).map { case (c, g) => col(c) <=> col(g) }
              .reduce(_ && _))) { case (d, (_, g)) => d.drop(g) }
      }
    val withMad = attach(attach(df, median(v), med),
      median(abs(v - col(med))), mad)
    withMad
      .withColumn("robust_z",
        when(col(mad) =!= 0.0,
          (v - col(med)) / (lit(1.4826) * col(mad))))
      .drop(med, mad)
  }

  private def filterToBounds(df: DataFrame, valueCol: String, k: Double,
      bounds: DataFrame): DataFrame = {
    val Seq(q1, q3) = Cols.fresh("iqr", 2, df)
    val named = bounds.toDF(q1, q3)
    df.crossJoin(broadcast(named))
      .filter(vcol(valueCol) >= col(q1) - lit(k) * (col(q3) - col(q1)) &&
        vcol(valueCol) <= col(q3) + lit(k) * (col(q3) - col(q1)))
      .drop(q1, q3)
  }
}
