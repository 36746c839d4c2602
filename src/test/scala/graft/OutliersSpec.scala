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

  test("thresholds are in-plan: no collect, broadcast one-row bounds") {
    val plan = Outliers.winsorize(values, "value", 0.05, 0.95)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("Broadcast"),
      s"bounds must broadcast in-plan:\n$plan")
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

  test("approx thresholds stay in-plan: broadcast bounds, no ObjectHashAggregate buffer of all values") {
    val plan = Outliers.winsorizeApprox(values, "value", 0.05, 0.95)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("Broadcast"),
      s"bounds must broadcast in-plan:\n$plan")
    assert(plan.contains("approx_percentile"),
      s"approx path must aggregate a bounded GK summary:\n$plan")
  }
}
