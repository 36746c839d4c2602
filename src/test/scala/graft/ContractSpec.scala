package graft

/** Driver-contract sweeps over the WHOLE declared surface: properties
  * of SparkEntry itself that, broken, would not fail loudly anywhere
  * else — a typo'd oracle key silently downgrades a query to
  * rows-only checking; a duplicate output column breaks the driver's
  * sort-columns-by-name hashing.
  */
class ContractSpec extends SparkTestBase {

  test("every oracle key names a declared query; only the sanctioned query lacks an oracle") {
    val orphanOracles = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphanOracles.isEmpty,
      s"oracle SQL for undeclared queries (typo'd name?): ${orphanOracles.mkString(", ")}")
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled === Set("q_approx_distinct", "q_harmonic_approx"),
      "every query needs an oracle except the sanctioned approximate-" +
        "by-design rows (SURVEY A9, L198); " +
        s"got un-oracled: ${unoracled.mkString(", ")}")
  }

  test("every query's output schema has distinct, non-empty column names") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val cols = fn(spark, sfDir).columns.toSeq
      if (cols.distinct.size != cols.size || cols.exists(_.isEmpty))
        Some(s"$name -> ${cols.mkString(",")}")
      else None
    }
    assert(bad.isEmpty,
      s"queries with duplicate/empty output columns: ${bad.mkString("; ")}")
  }
}
