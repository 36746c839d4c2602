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
}
