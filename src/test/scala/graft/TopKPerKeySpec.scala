package graft

import org.apache.spark.sql.functions._

import graft.plans.TopK

/** The custom top-k-per-key physical operator must equal the
  * window-function formulation row for row, while planning WITHOUT a
  * Window node and streaming each sorted run in O(k) memory.
  */
class TopKPerKeySpec extends SparkTestBase {

  test("TopK.perKey == row_number window formulation on orders") {
    import org.apache.spark.sql.expressions.Window
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")

    val viaWindow = orders
      .withColumn("rn", row_number().over(
        Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))).cast("bigint"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")

    val viaOperator = TopK.perKey(orders,
        Seq("o_custkey"), "o_totalprice", k = 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")

    val a = viaWindow.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val b = viaOperator.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(b === a)
  }

  test("plan has no Window node; sort+exchange inserted by the planner") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val df = TopK.perKey(orders, Seq("o_custkey"), "o_totalprice", 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"custom exec missing:\n$plan")
    assert(!plan.contains("Window"), s"window exec crept back in:\n$plan")
    assert(plan.contains("Sort"), "planner supplied the intra-partition sort")
    assert(plan.contains("Exchange"), "planner supplied the key clustering")
  }

  test("rank restarts per key and caps at k") {
    import spark.implicits._
    val df = Seq(
      (1L, 30.0), (1L, 20.0), (1L, 10.0), (1L, 5.0),
      (2L, 1.0),
    ).toDF("k", "v")
    val out = TopK.perKey(df, Seq("k"), "v", 2)
      .select("k", "v", "rn")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(out === Set((1L, 30.0, 1L), (1L, 20.0, 2L), (2L, 1.0, 1L)))
  }
}
