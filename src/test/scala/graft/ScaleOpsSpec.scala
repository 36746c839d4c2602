package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin
import graft.tables.Bucketing

/** Scale-path plumbing: bucketed co-located joins (no exchange),
  * Bloom pre-join pruning (exact results, less shuffle), and the
  * approximate-percentile accuracy bound.
  */
class ScaleOpsSpec extends SparkTestBase {

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // in-memory catalog forgets managed tables across JVMs but their
    // warehouse files survive — remove them or the next write errors
    val dir = new java.io.File(s"spark-warehouse/$name")
    if (dir.exists()) {
      dir.listFiles().foreach(_.delete())
      dir.delete()
    }
  }

  test("bucketed tables join AND aggregate with zero exchanges") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_name")
    dropTable("orders_b")
    dropTable("customer_b")
    Bucketing.writeBucketed(orders, "orders_b", "o_custkey", 4)
    Bucketing.writeBucketed(customer, "customer_b", "c_custkey", 4)

    // force the non-broadcast path: at real scale neither side fits
    // per-executor, and THAT is when bucketing pays — the co-located
    // SortMergeJoin reads bucket-for-bucket with no shuffle at all
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val ob = Bucketing.readBucketed(spark, "orders_b")
      val cb = Bucketing.readBucketed(spark, "customer_b")
      val joined = ob.join(cb, col("o_custkey") === col("c_custkey"))
      joined.collect() // materialize under AQE so the final plan exists
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), s"bucketed read not used:\n$plan")

      val agg = ob.groupBy("o_custkey").agg(sum("o_totalprice"))
      agg.collect()
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"groupBy on the bucket key must not shuffle:\n$aggPlan")

      // and the join result is right
      val plain = orders.join(customer, col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() === plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("Bloom pre-join prunes probe rows but returns the exact join") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val bigCust = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_acctbal") > 9000.0) // selective build side
      .select("c_custkey", "c_name")
    val plain = orders.join(bigCust, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloomed = BloomJoin.inner(orders, bigCust, "o_custkey", "c_custkey",
        expectedItems = 1000L, fpp = 0.01)
      .select("o_orderkey", "c_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bloomed === plain, "false positives must be joined away")

    val kept = BloomJoin.probeFilter(orders, bigCust,
      "o_custkey", "c_custkey", 1000L, 0.01).count()
    assert(kept < orders.count(),
      "pre-filter must actually prune non-matching probe rows")
  }

  test("Bloom pre-join dispatches on key dtype: strings work, dates fail loudly") {
    // string keys route to mightContainString (a Long-typed UDF would
    // cast the string to bigint => null => every probe row dropped)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val prio = orders.select("o_orderpriority").distinct()
      .filter(col("o_orderpriority") <= "3") // selective string build side
    val plain = orders.join(prio, Seq("o_orderpriority")).count()
    assert(plain > 0, "fixture sanity: string join matches rows")
    val bloomed = BloomJoin.inner(
        orders.withColumnRenamed("o_orderpriority", "prio"), prio,
        "prio", "o_orderpriority", 100L, 0.01).count()
    assert(bloomed === plain, "string-keyed Bloom join is exact")
    // unsupported probe dtype is an error, not an empty result: the
    // timestamp/long pair fails the family check before any UDF runs
    val e = intercept[IllegalArgumentException] {
      BloomJoin.probeFilter(orders, orders.limit(10),
        "o_orderdate", "o_custkey", 100L, 0.01).count()
    }
    assert(e.getMessage.contains("type family"))
    // CROSS-family keys (long probe vs string build) would silently
    // empty the join — the bloom was populated with strings and a long
    // probe always misses — so they must fail loudly too
    val e2 = intercept[IllegalArgumentException] {
      BloomJoin.inner(orders, prio, "o_custkey", "o_orderpriority",
        100L, 0.01).count()
    }
    assert(e2.getMessage.contains("type family"))
  }

  test("A6 scale path: approx percentile within 5% rank error of exact") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val rows = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("percentile_approx(l_extendedprice, 0.5, 100)").as("approx"),
      count(lit(1)).as("n")).head()
    val (exact, approx) = (rows.getDouble(0), rows.getDouble(1))
    // bound in RANK space: the approx median's rank must be within
    // n/accuracy of n/2 (the percentile_approx contract)
    val n = rows.getLong(2)
    val rank = li.filter(col("l_extendedprice") <= approx).count()
    assert(math.abs(rank - n / 2.0) <= n / 100.0 + 1,
      s"approx median $approx at rank $rank of $n (exact $exact)")
  }
}
