package graft

import graft.queries.Core
import graft.tables.TableLoader

/** Sanity specs for the §2.2–§2.7 relational surface on sf0.001.
  * Exact-value verification against DuckDB happens via oracle/diff.py
  * (SURVEY.md §5.2); these tests pin invariants and shapes so
  * regressions surface in `sbt test` without the python loop.
  */
class CoreSpec extends SparkTestBase {

  test("all declared core queries execute and every oracle key has a query") {
    Core.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty, s"$name has no columns")
      df.count() // forces full execution
    }
    val missing = Core.oracles.keySet -- Core.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("q_join_star returns revenue per nation, descending") {
    val rows = Core.queries("q_join_star")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val revenues = rows.map(_.getDouble(1)).toSeq
    assert(revenues == revenues.sortBy(-_), "revenue must be descending")
  }

  test("q_agg_tpch1 group count bounded by flag x status domain") {
    val n = Core.queries("q_agg_tpch1")(spark, sfDir).count()
    assert(n > 0 && n <= 6) // 3 returnflags x 2 linestatuses
  }

  test("semi + anti join partition the customer table") {
    TableLoader.registerAll(spark, sfDir)
    val customers = spark.table("customer").count()
    val withOrders = spark.sql(
      "SELECT c_custkey FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)").count()
    val anti = Core.queries("q_join_anti")(spark, sfDir).count()
    assert(withOrders + anti == customers)
  }

  test("rollup adds subtotal and grand-total rows") {
    val df = Core.queries("q_agg_rollup")(spark, sfDir)
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) == 1, "exactly one grand-total row")
    val flags = rows.filterNot(_.isNullAt(0)).map(_.getString(0)).distinct
    assert(rows.count(r => !r.isNullAt(0) && r.isNullAt(1)) == flags.length,
      "one subtotal row per returnflag")
  }

  test("window ranks are total: rn is 1..n within each partition") {
    val rows = Core.queries("q_win_rank")(spark, sfDir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, part) =>
      val rns = part.map(_.getLong(2)).sorted.toSeq
      assert(rns == (1L to part.length).toSeq)
    }
  }

  test("set ops: union-distinct is customer ∪ supplier nation keys") {
    TableLoader.registerAll(spark, sfDir)
    val expected = spark.sql(
      "SELECT DISTINCT CAST(c_nationkey AS BIGINT) FROM customer").collect().map(_.getLong(0)).toSet ++
      spark.sql("SELECT DISTINCT CAST(s_nationkey AS BIGINT) FROM supplier").collect().map(_.getLong(0)).toSet
    val got = Core.queries("q_union_distinct")(spark, sfDir).collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }
}
