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

  /** Exact ε-neighbor counts in a 2-D feature space via grid
    * blocking — the DBSCAN core step as a distributed density
    * diagnostic: a point with fewer than `minPts` neighbors within
    * `eps` (Euclidean) is a density outlier; core points feed a
    * clustering pass (pair the cores and run
    * [[Clustering.connectedComponents]]).
    *
    * RECALL-COMPLETE by construction: coordinates quantize to
    * `scale`-scaled longs, cells are ε-sized (floor division toward
    * −∞, so negative coordinates bucket correctly), and any two
    * points within ε lie in the same or an adjacent cell — each point
    * probes its 3×3 cell neighborhood, an EQUI-join on cell keys,
    * never all-pairs. The distance test is all-integer
    * (Δx² + Δy² ≤ ε² on scaled longs): no float tolerance, boundary
    * ties count identically on any engine.
    *
    * Scale shape: one 9-way probe fan-out (in-stage generate), one
    * cell-keyed equi-join, one id-keyed count — cost ∝ points ×
    * neighborhood density, the blocked-join contract of the dedup
    * family. A hot cell (degenerate density) is an AQE skew-join
    * case, same as any skewed key. Zero-neighbor points keep their
    * row (left join + conditional count). Output: (idCol,
    * n_neighbors, is_core).
    */
  /** The shared grid-join frames: (probes with 3×3 cell fan-out, data
    * keyed by its own cell, scaled ε). Sides join on (_pcx, _pcy) ==
    * (_cx2, _cy2); the true-distance test is the caller's.
    */
  private def gridFrames(df: DataFrame, idCol: String, xCol: String,
      yCol: String, eps: Double, scale: Int): (DataFrame, DataFrame, Long) = {
    require(eps > 0, s"eps=$eps must be > 0")
    val epsI = math.round(eps * scale)
    require(epsI >= 1, s"eps*scale must round to >= 1, got $epsI")
    def cellOf(c: Column) = Stats.fdiv(c, lit(epsI)).cast("long")
    val pts = df.select(col(idCol).as("_id"),
        round(col(xCol) * scale).cast("long").as("_xi"),
        round(col(yCol) * scale).cast("long").as("_yi"))
      .withColumn("_cx", cellOf(col("_xi")))
      .withColumn("_cy", cellOf(col("_yi")))
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 }
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val probes = pts
      .withColumn("_o", explode(array(offsets: _*)))
      .select(col("_id"), col("_xi"), col("_yi"),
        (col("_cx") + col("_o.dx")).as("_pcx"),
        (col("_cy") + col("_o.dy")).as("_pcy"))
    val data = pts.select(col("_id").as("_id2"), col("_xi").as("_xi2"),
      col("_yi").as("_yi2"), col("_cx").as("_cx2"), col("_cy").as("_cy2"))
    (probes, data, epsI)
  }

  def epsNeighborCounts(df: DataFrame, idCol: String, xCol: String,
      yCol: String, eps: Double, minPts: Int,
      scale: Int = 100): DataFrame = {
    require(minPts >= 1, s"minPts=$minPts must be >= 1")
    val (probes, data, epsI) = gridFrames(df, idCol, xCol, yCol, eps, scale)
    val dx = col("_xi2") - col("_xi")
    val dy = col("_yi2") - col("_yi")
    probes
      .join(data, col("_pcx") === col("_cx2") && col("_pcy") === col("_cy2"),
        "left")
      .groupBy(col("_id").as(idCol))
      .agg(count(when(col("_id2").isNotNull && col("_id2") =!= col("_id")
          && dx * dx + dy * dy <= lit(epsI * epsI), 1))
        .as("n_neighbors"))
      .withColumn("is_core", col("n_neighbors") >= minPts)
  }

  /** Full deterministic DBSCAN labels on top of
    * [[epsNeighborCounts]]: core points cluster by min-id label
    * propagation over the core–core ε-graph
    * ([[Clustering.connectedComponents]] — the dedup family's
    * iteration, state = core vertices only); border points (non-core
    * within ε of a core) take the MIN label among their core
    * neighbors — textbook DBSCAN leaves border assignment
    * order-dependent, this total order makes it reproducible across
    * runs and engines; noise points report NULL.
    *
    * Scale shape: the [[gridFrames]] cell equi-join twice (counts +
    * pairs — same blocked cost), then CC over the core-core EDGE list
    * only, run WITH pointer jumping (`shortcut = true`): ε-chains make
    * the core graph's hop diameter ~range/ε, and plain min-label
    * propagation would need that many passes — jumping needs
    * ~log₂(diameter). Output: (idCol, n_neighbors, is_core,
    * cluster_id).
    */
  def dbscanLabels(df: DataFrame, idCol: String, xCol: String,
      yCol: String, eps: Double, minPts: Int, scale: Int = 100,
      maxIters: Int = 40): DataFrame = {
    val counts = epsNeighborCounts(df, idCol, xCol, yCol, eps, minPts, scale)
    val (probes, data, epsI) = gridFrames(df, idCol, xCol, yCol, eps, scale)
    val dx = col("_xi2") - col("_xi")
    val dy = col("_yi2") - col("_yi")
    val pairs = probes
      .join(data, col("_pcx") === col("_cx2") && col("_pcy") === col("_cy2"))
      .filter(col("_id2") =!= col("_id")
        && dx * dx + dy * dy <= lit(epsI * epsI))
      .select(col("_id"), col("_id2"))

    val cores = counts.filter(col("is_core")).select(col(idCol).as("_cv"))
    val corePairs = pairs
      .join(cores, pairs("_id") === cores("_cv")).drop("_cv")
      .join(cores, pairs("_id2") === cores("_cv")).drop("_cv")
    val cc = Clustering.connectedComponents(corePairs, "_id", "_id2",
      maxIters = maxIters, shortcut = true)
    // isolated cores (>= minPts neighbors, none of them core) have no
    // edge and miss from cc: they are their own singleton cluster
    val coreLabels = cores
      .join(cc, cores("_cv") === cc("v"), "left")
      .select(col("_cv"), coalesce(col("cluster_id"), col("_cv"))
        .as("_clu"))
    val borderLabels = pairs
      .join(counts.filter(!col("is_core")).select(col(idCol).as("_bv")),
        pairs("_id") === col("_bv"))
      .join(coreLabels, pairs("_id2") === coreLabels("_cv"))
      .groupBy(col("_bv")).agg(min("_clu").as("_bclu"))

    counts
      .join(coreLabels, counts(idCol) === coreLabels("_cv"), "left")
      .join(borderLabels, counts(idCol) === borderLabels("_bv"), "left")
      .select(counts(idCol), col("n_neighbors"), col("is_core"),
        coalesce(col("_clu"), col("_bclu")).as("cluster_id"))
  }
}
