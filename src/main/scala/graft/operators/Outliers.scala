package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** Clamp `valueCol` into its [pLo, pHi] percentile band (exact
    * percentiles, continuous interpolation — matches DuckDB
    * QUANTILE_CONT). Row count and all other columns are unchanged;
    * NULL values STAY NULL (greatest/least skip nulls, which would
    * silently substitute the lower bound — fabricated data).
    */
  def winsorize(df: DataFrame, valueCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    require(0.0 <= pLo && pLo <= pHi && pHi <= 1.0)
    val Seq(lo, hi) = Cols.fresh("wins", 2, df)
    val bounds = df.agg(
      expr(s"percentile($valueCol, $pLo)").as(lo),
      expr(s"percentile($valueCol, $pHi)").as(hi))
    df.crossJoin(broadcast(bounds))
      .withColumn(valueCol,
        when(col(valueCol).isNull, lit(null).cast("double"))
          .otherwise(least(greatest(col(valueCol).cast("double"), col(lo)), col(hi))))
      .drop(lo, hi)
  }

  /** Tukey IQR filter: keep rows with value in
    * [q1 - k*(q3-q1), q3 + k*(q3-q1)]. Null values drop (they fail the
    * predicate), matching SQL comparison semantics.
    */
  def iqrFilter(df: DataFrame, valueCol: String, k: Double = 1.5): DataFrame = {
    require(k >= 0.0)
    val Seq(q1, q3) = Cols.fresh("iqr", 2, df)
    val bounds = df.agg(
      expr(s"percentile($valueCol, 0.25)").as(q1),
      expr(s"percentile($valueCol, 0.75)").as(q3))
    df.crossJoin(broadcast(bounds))
      .filter(col(valueCol) >= col(q1) - lit(k) * (col(q3) - col(q1)) &&
        col(valueCol) <= col(q3) + lit(k) * (col(q3) - col(q1)))
      .drop(q1, q3)
  }
}
