package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference library's user-facing entry point re-expressed
  * Spark-first: run an ANSI SQL query over a set of named DataFrames,
  * exactly the `sql4pandas(query, {name: frame})` call shape.
  *
  * On Spark this is a zero-copy facade: registering a DataFrame as a
  * temp view is metadata-only (the logical plan is shared, nothing
  * materializes), and the query text goes straight to Catalyst — so
  * every optimization the engine has (pushdown, pruning, broadcast,
  * AQE) applies to facade queries identically to DataFrame-API ones.
  * Views are registered in the session catalog; pass `replace = false`
  * to fail instead of silently shadowing an existing view name.
  */
object Graft {

  /** Run `query` with each (name -> frame) visible as a table. */
  def sql(spark: SparkSession, query: String,
      tables: Map[String, DataFrame] = Map.empty,
      replace: Boolean = true): DataFrame = {
    if (!replace) {
      // validate ALL names before registering ANY: failing halfway
      // would leave earlier views registered despite the throw
      val taken = tables.keys.filter(spark.catalog.tableExists).toSeq.sorted
      require(taken.isEmpty,
        s"temp view(s) already exist: ${taken.mkString(", ")} " +
          "(pass replace = true to shadow)")
    }
    tables.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    spark.sql(query)
  }

  /** Convenience: derive the session from the first frame. */
  def sql(query: String, tables: Map[String, DataFrame]): DataFrame = {
    require(tables.nonEmpty,
      "tables must be non-empty (or pass a SparkSession explicitly)")
    sql(tables.head._2.sparkSession, query, tables)
  }
}
