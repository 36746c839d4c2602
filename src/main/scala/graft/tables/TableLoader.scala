package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-generated parquet tables from a scale-factor
  * directory and registers them as temp views — the Spark analog of the
  * reference's `PandasCursor` registered table dict (sql4pandas keeps a
  * {name: DataFrame} map and resolves FROM/JOIN names against it; we
  * use the session catalog's temp views for the same purpose).
  *
  * Scale notes (100 TB): temp-view registration is metadata-only; the
  * scans stay lazy, so Catalyst pushes filters/projections into the
  * parquet reader per query. At real scale the same loader would point
  * at partitioned table roots instead of single files — nothing else
  * changes, partition pruning composes with the same views.
  */
object TableLoader {

  /** All tables except `events`, which needs the nanos shim. */
  val plainTables: Seq[String] = Seq(
    "region", "nation", "supplier", "customer", "part",
    "orders", "lineitem", "documents", "embeddings")

  /** Register every table in `sfDir` as a temp view on `spark`.
    *
    * `events.ts` is parquet INT64 TIMESTAMP(NANOS) which Spark 4.x
    * refuses to read natively; `spark.sql.legacy.parquet.nanosAsLong`
    * surfaces it as raw nanos (LongType) and we truncate to µs
    * TimestampType — bit-identical to DuckDB's CAST(ts AS TIMESTAMP)
    * (verified, SURVEY.md §1.3). Set at runtime because Verify/Bench
    * build their sessions without the flag.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    plainTables.foreach { name =>
      load(spark, sfDir, name).createOrReplaceTempView(name)
    }
    events(spark, sfDir).createOrReplaceTempView("events")
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** CSV scan (S5): header + explicit-or-inferred schema. At scale,
    * ALWAYS pass a schema — inference reads the whole input once
    * before the real job.
    */
  def loadCsv(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val base = spark.read.option("header", "true")
    schema.fold(base.option("inferSchema", "true"))(base.schema)
      .csv(path)
  }

  /** JSON-lines scan (S5). Same schema caveat as CSV. */
  def loadJson(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val base = spark.read
    schema.fold(base)(base.schema).json(path)
  }

  /** ORC scan/sink (S5): columnar alternative to parquet with the same
    * pushdown/pruning properties (PushedFilters reach the ORC reader).
    */
  def loadOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Parquet scan across files whose schemas EVOLVED (columns added
    * over time): mergeSchema unions the file footers' schemas; rows
    * from files missing a column read it as null. Off by default in
    * Spark because footer-merging costs a pass over file metadata —
    * turn it on per-read like this, not globally, at 100 TB.
    */
  def loadParquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** The events table with `ts` normalized to µs TimestampType.
    *
    * The fixture generator has shipped `ts` as two different physical
    * types across rounds: INT64 TIMESTAMP(NANOS) (which Spark 4.x only
    * reads via the nanosAsLong flag, as raw Long nanos) and plain
    * timestamp[us] (which Spark reads as TIMESTAMP_NTZ). Branch on the
    * type the footer actually delivered so the view's schema is a
    * stable TimestampType either way — under the UTC session both
    * paths yield bit-identical instants to DuckDB's
    * `CAST(ts AS TIMESTAMP)` (SURVEY.md §1.3).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val tsExpr = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // A Long-typed ts is assumed to be the nanosAsLong read of
        // TIMESTAMP(NANOS) — but a fixture that ever shipped plain
        // INT64 micros would ALSO arrive Long-typed and be silently
        // divided by 1000. Assert the nanos magnitude in-plan:
        // micros stay < 1e17 until year 5138 while nanos pass 1e17 in
        // 1973, so any 2020s-era micros value trips the guard loudly.
        // assert_true rides codegen, evaluates to NULL when the check
        // holds (the coalesce adds 0), and costs one comparison per
        // row — no extra job at view-registration time.
        "timestamp_micros(CAST((ts + coalesce(CAST(assert_true(" +
          "ts IS NULL OR ts >= 100000000000000000, " +
          "'events.ts: INT64 magnitude < 1e17 is not TIMESTAMP(NANOS) " +
          "-- fixture likely switched to raw micros; fix TableLoader.events'" +
          ") AS BIGINT), 0)) DIV 1000 AS LONG)) AS ts"
      case _ =>
        "CAST(ts AS TIMESTAMP) AS ts"
    }
    raw.selectExpr("event_id", tsExpr,
      "user_id", "event_type", "value", "props")
  }
}
