package graft

import org.apache.spark.sql.functions._

import graft.operators.Outliers

/** Winsorizing and IQR filtering: clamp/drop semantics, row
  * preservation, in-plan thresholds (no driver action).
  */
class OutliersSpec extends SparkTestBase {

  private def values = {
    import spark.implicits._
    ((1 to 98).map(_.toDouble) ++ Seq(-1000.0, 1000.0)) // 2 wild outliers
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "value")
  }

  test("winsorize clamps into the percentile band, preserves rows and columns") {
    val out = Outliers.winsorize(values, "value", 0.05, 0.95)
    assert(out.count() === 100)
    assert(out.columns.toSeq === Seq("id", "value"))
    val (mn, mx) = out.agg(min("value"), max("value"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).head
    assert(mn > -1000.0 && mx < 1000.0, "outliers must clamp inward")
    // interior values untouched
    val v50 = out.filter(col("id") === 49L).head().getDouble(1)
    assert(v50 === 50.0)
  }

  test("winsorize preserves NULL values instead of fabricating the bound") {
    import spark.implicits._
    val withNull = values.select(col("id"),
      when(col("id") === 7L, lit(null)).otherwise(col("value")).as("value"))
    val out = Outliers.winsorize(withNull, "value", 0.05, 0.95)
    assert(out.count() === 100)
    assert(out.filter(col("id") === 7L).head().isNullAt(1),
      "a NULL input must stay NULL, not become the lower percentile")
  }

  test("iqrFilter drops exactly the far-tail rows") {
    val kept = Outliers.iqrFilter(values, "value", k = 1.5)
    assert(kept.count() === 98, "only the two wild outliers leave")
    assert(kept.filter(col("value") === -1000.0 || col("value") === 1000.0).count() === 0)
  }

  test("exact clamp is a pure map-side plan; approx bounds stay in-plan") {
    // exact path: bounds are bounded driver literals (Percentiles
    // centroid pattern) — the clamp plans NO join and NO exchange
    val exactPlan = Outliers.winsorize(values, "value", 0.05, 0.95)
      .queryExecution.executedPlan.toString
    assert(!exactPlan.contains("Exchange") && !exactPlan.contains("Join"),
      s"exact clamp must be scan -> project only:\n$exactPlan")
    // approx path: lazy one-row agg attached via broadcast, no collect
    val approxPlan = Outliers.winsorizeApprox(values, "value", 0.05, 0.95)
      .queryExecution.executedPlan.toString
    assert(approxPlan.contains("BroadcastExchange") || approxPlan.contains("Broadcast"),
      s"approx bounds must broadcast in-plan:\n$approxPlan")
  }

  test("temp threshold columns never clobber caller columns") {
    val tricky = values.withColumn("_wins0", lit("keep me"))
    val out = Outliers.winsorize(tricky, "value", 0.05, 0.95)
    assert(out.columns.contains("_wins0"))
    assert(out.select("_wins0").head().getString(0) === "keep me")
  }

  test("column names needing backticks resolve literally, not as nested paths") {
    val odd = values.withColumnRenamed("value", "my value.x")
    val out = Outliers.winsorize(odd, "my value.x", 0.05, 0.95)
    assert(out.count() === 100)
    assert(out.columns.toSeq === Seq("id", "my value.x"))
    val kept = Outliers.iqrFilter(odd, "my value.x", k = 1.5)
    assert(kept.count() === 98)
  }

  test("winsorizeApprox bounds sit within one order-statistic of the exact bounds") {
    // accuracy 10000 on n=100 keeps rank error < 1, so the approx bound
    // is an actual data value adjacent to the exact interpolated one:
    // on the 1..98 fixture adjacent order stats differ by 1.0, so every
    // clamped value deviates < 1.05 from the exact clamp.
    val exact = Outliers.winsorize(values, "value", 0.05, 0.95)
      .withColumnRenamed("value", "ev")
    val approx = Outliers.winsorizeApprox(values, "value", 0.05, 0.95)
      .withColumnRenamed("value", "av")
    assert(approx.count() === 100, "row-preserving like the exact form")
    val maxDev = exact.join(approx, "id")
      .agg(max(abs(col("ev") - col("av")))).head().getDouble(0)
    assert(maxDev <= 1.05, s"approx clamp deviated $maxDev from exact")
  }

  test("iqrFilterApprox drops the far tails like the exact filter") {
    // quartile rank error < 1 order stat => fences move by < ~2.5,
    // nowhere near the +-1000 outliers or the 1..98 interior
    val kept = Outliers.iqrFilterApprox(values, "value", k = 1.5)
    assert(kept.count() === 98)
    assert(kept.filter(col("value") === -1000.0 || col("value") === 1000.0).count() === 0)
  }

  test("robustZScore flags the planted outliers and stays calm on the interior") {
    val out = Outliers.robustZScore(values, "value", Seq.empty)
    assert(out.count() === 100)
    assert(out.columns.toSeq === Seq("id", "value", "robust_z"))
    // global median 49.5, MAD 25 (the +-1000 rows cannot inflate it —
    // the whole point vs a mean/stddev z-score)
    val wild = out.filter(abs(col("value")) === 1000.0)
      .agg(min(abs(col("robust_z")))).head().getDouble(0)
    val interior = out.filter(abs(col("value")) < 999.0)
      .agg(max(abs(col("robust_z")))).head().getDouble(0)
    assert(wild > 20.0, s"outliers must score huge, got $wild")
    assert(interior < 1.5, s"interior must stay inside ~1.3 sigma, got $interior")
  }

  test("robustZScore: MAD = 0 (constant-majority group) scores null, not infinity") {
    import spark.implicits._
    val degenerate = Seq(("a", 5.0), ("a", 5.0), ("a", 5.0), ("a", 99.0))
      .toDF("g", "value")
    val out = Outliers.robustZScore(degenerate, "value", Seq("g"))
    assert(out.count() === 4)
    assert(out.filter(col("robust_z").isNotNull).count() === 0,
      "MAD=0 has no meaningful scale; every score must be null")
  }

  test("robustZScore groups independently: each group's own median/MAD") {
    import spark.implicits._
    val twoGroups = ((1 to 9).map(v => ("lo", v.toDouble)) ++
      (101 to 109).map(v => ("hi", v.toDouble))).toDF("g", "value")
    val out = Outliers.robustZScore(twoGroups, "value", Seq("g"))
    // both groups are the same shape around different centers: the
    // per-group score distributions must be identical
    val lo = out.filter(col("g") === "lo").select("robust_z")
      .collect().map(_.getDouble(0)).sorted.toSeq
    val hi = out.filter(col("g") === "hi").select("robust_z")
      .collect().map(_.getDouble(0)).sorted.toSeq
    assert(lo === hi)
    assert(math.abs(lo.head - (-4.0 / (1.4826 * 2.0))) < 1e-12,
      "median 5, MAD 2: the smallest value scores (1-5)/(1.4826*2)")
  }

  test("robustZScore: a NULL group key is a group, not a silent row drop") {
    import spark.implicits._
    val withNullGroup = Seq(
      (1L, Option("a"), 1.0), (2L, Option("a"), 2.0), (3L, Option("a"), 3.0),
      (4L, None, 10.0), (5L, None, 20.0), (6L, None, 30.0))
      .toDF("id", "g", "value")
    val out = Outliers.robustZScore(withNullGroup, "value", Seq("g"))
    assert(out.count() === 6, "null-group rows must survive the stats join")
    // the null group gets ITS OWN median/MAD: median 20, MAD 10
    val z4 = out.filter(col("id") === 4L).select("robust_z").head().getDouble(0)
    assert(math.abs(z4 - (10.0 - 20.0) / (1.4826 * 10.0)) < 1e-12)
  }

  test("robustZScoreApprox tracks the exact scores on the judged-scale fixture") {
    val exact = Outliers.robustZScore(values, "value", Seq.empty)
      .select(col("id"), col("value"), col("robust_z").as("ez"))
    val approx = Outliers.robustZScoreApprox(values, "value", Seq.empty)
      .select(col("id"), col("robust_z").as("az"))
    assert(approx.count() === 100)
    // accuracy 10000 at n=100: rank error < 1 order stat; median/MAD
    // shift by at most one adjacent order stat (1.0 and ~1.0 here), so
    // interior scores move well under 0.1 sigma
    val maxDev = exact.join(approx, "id")
      .filter(abs(col("value")) < 999.0)
      .agg(max(abs(col("ez") - col("az")))).head().getDouble(0)
    assert(maxDev < 0.1, s"approx interior scores deviated $maxDev")
  }

  test("approx thresholds stay in-plan: broadcast bounds, no ObjectHashAggregate buffer of all values") {
    val plan = Outliers.winsorizeApprox(values, "value", 0.05, 0.95)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("Broadcast"),
      s"bounds must broadcast in-plan:\n$plan")
    assert(plan.contains("approx_percentile"),
      s"approx path must aggregate a bounded GK summary:\n$plan")
  }

  test("epsNeighborCounts matches brute force, incl. negatives and boundary") {
    import spark.implicits._
    // deterministic scatter with negative coordinates and exact-eps
    // boundary pairs (distance exactly 2.0 must count: <=)
    val rng = new scala.util.Random(7)
    val scatter = Seq.tabulate(200)(i =>
      (i.toLong, rng.nextDouble() * 20 - 10, rng.nextDouble() * 20 - 10))
    val boundary = Seq((900L, 50.0, 50.0), (901L, 52.0, 50.0),
      (902L, 50.0, 48.01))
    val df = (scatter ++ boundary).toDF("id", "x", "y")
    val eps = 2.0

    val grid = Outliers.epsNeighborCounts(df, "id", "x", "y", eps, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // brute force over 100-scaled longs — the operator's metric
    def q(v: Double) = math.round(v * 100)
    val pts = (scatter ++ boundary).map { case (i, x, y) => (i, q(x), q(y)) }
    val brute = pts.map { case (i, xi, yi) =>
      i -> pts.count { case (j, xj, yj) =>
        j != i && (xj - xi) * (xj - xi) + (yj - yi) * (yj - yi) <= 200L * 200L
      }.toLong
    }.toMap

    assert(grid.size == pts.size, "row-preserving incl. zero-neighbor points")
    assert(grid == brute, {
      val bad = grid.collect { case (k, v) if brute(k) != v => (k, v, brute(k)) }
      s"grid != brute at ${bad.take(5).toList}"
    })
    assert(grid(900L) >= 1, "exact-eps boundary pair counts (<=)")
    assert(grid(902L) >= 1, "within-eps pair counts")
  }

  test("epsNeighborCounts: isolated point reports 0 neighbors, not a dropped row") {
    import spark.implicits._
    val df = Seq((1L, 0.0, 0.0), (2L, 100.0, 100.0)).toDF("id", "x", "y")
    val out = Outliers.epsNeighborCounts(df, "id", "x", "y", 1.0, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSet == Set((1L, 0L, false), (2L, 0L, false)))
  }

  test("dbscanLabels: two blobs, a border point, and noise get textbook labels") {
    import spark.implicits._
    // blob A: 4 points pairwise within eps=2 around (0,0); blob B:
    // same around (100,0); border: within eps of A's cores but with
    // only 1 neighbor itself; noise: isolated
    val blobA = Seq((1L, 0.0, 0.0), (2L, 1.0, 0.0), (3L, 0.0, 1.0),
      (4L, 1.0, 1.0))
    val blobB = Seq((11L, 100.0, 0.0), (12L, 101.0, 0.0),
      (13L, 100.0, 1.0), (14L, 101.0, 1.0))
    val border = Seq((21L, 2.5, 0.0)) // within 2.0 of ids 2,4 only
    val noise = Seq((31L, 50.0, 50.0))
    val df = (blobA ++ blobB ++ border ++ noise).toDF("id", "x", "y")
    val out = Outliers.dbscanLabels(df, "id", "x", "y", eps = 2.0,
        minPts = 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))))
      .toMap
    blobA.foreach { case (i, _, _) =>
      assert(out(i) == ((true, Some(1L))), s"blob A core labeled 1: $out") }
    blobB.foreach { case (i, _, _) =>
      assert(out(i) == ((true, Some(11L))), s"blob B core labeled 11: $out") }
    assert(out(21L) == ((false, Some(1L))),
      s"border point joins A without being core: $out")
    assert(out(31L) == ((false, None)), s"noise stays NULL: $out")
  }

  test("dbscanLabels: isolated core (dense singleton cell) is its own cluster") {
    import spark.implicits._
    // 5 coincident points: each has 4 neighbors >= minPts, all in one
    // spot; they form one cluster labeled by the min id
    val df = Seq.tabulate(5)(i => (i + 10L, 7.0, 7.0)).toDF("id", "x", "y")
    val out = Outliers.dbscanLabels(df, "id", "x", "y", 1.0, 4)
      .collect().map(r => (r.getLong(0), r.getBoolean(2), r.getLong(3)))
    assert(out.forall(t => t._2 && t._3 == 10L), s"one min-id cluster: ${out.toList}")
  }

  test("epsNeighborCounts plans a cell equi-join, not a cartesian product") {
    import spark.implicits._
    val df = Seq.tabulate(50)(i => (i.toLong, i * 1.0, i * 2.0))
      .toDF("id", "x", "y")
    val plan = Outliers.epsNeighborCounts(df, "id", "x", "y", 2.0, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"grid blocking must stay an equi-join:\n$plan")
  }
}
