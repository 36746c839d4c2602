package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.tables.TableLoader

/** Shared helpers for judged query definitions.
  *
  * Every judged query is a `(SparkSession, sfDir) => DataFrame`; the
  * driver's Verify writes the result to parquet and diffs it against
  * DuckDB running the paired oracle SQL. Determinism rules (SURVEY.md
  * §5.4): total ORDER BY, decimal-exact aggregation cast to DOUBLE in
  * the output, ROUND on floating functions, explicit NULLS ordering.
  */
object QueryDefs {
  type QueryFn = (SparkSession, String) => DataFrame

  @volatile private var registeredFor: Option[(SparkSession, String)] = None

  /** Register all temp views once per (session, sfDir); re-register only
    * when the scale-factor directory changes. Registration is
    * metadata-only but reads parquet footers, so avoid repeating it for
    * each of ~40 queries in a Bench run.
    */
  def ensureTables(spark: SparkSession, sfDir: String): Unit = synchronized {
    if (!registeredFor.contains((spark, sfDir))) {
      TableLoader.registerAll(spark, sfDir)
      registeredFor = Some((spark, sfDir))
    }
  }

  /** A query defined against the registered temp views. */
  def withTables(body: SparkSession => DataFrame): QueryFn =
    (spark, sfDir) => { ensureTables(spark, sfDir); body(spark) }

  /** Like [[withTables]] but passes sfDir through — for queries that
    * key shared memoized builds (e.g. [[GraphOps.coOrderParts]]) by
    * scale-factor directory. */
  def withTablesSf(body: (SparkSession, String) => DataFrame): QueryFn =
    (spark, sfDir) => { ensureTables(spark, sfDir); body(spark, sfDir) }

  /** A query defined as Spark SQL text over the registered views. */
  def sql(text: String): QueryFn = withTables(_.sql(text))
}
