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

  /** Zone-map-consuming pruned read (r12 verdict item 5): evaluate a
    * [lower, upper] range predicate on `column` against each parquet
    * FILE's footer min/max statistics — one driver metadata listing,
    * no data read — and hand Spark only the files that can match; the
    * same predicate is then applied as a normal row filter, so the
    * result is ALWAYS identical to the unpruned
    * `read.filter(...)` (PartitioningSpec pins it), pruning only
    * changes which files the scan opens. This is the file-skipping
    * half of what an Iceberg/Delta mount supplies from its manifest:
    * on sorted/clustered layouts (e.g. [[graft.operators.ZOrder]]
    * output, or a repartitionByRange write) a selective range touches
    * a constant number of files regardless of table size.
    *
    * Conservative by construction: a file is skipped ONLY when footer
    * stats prove no row group can satisfy the predicate; missing
    * stats, missing column, or an unreadable footer keep the file. A
    * range predicate never matches NULL, so all-null chunks prune.
    * Bounds compare numerically for numeric columns and lexically
    * (UTF-8) for strings — the parquet stats orderings.
    */
  def loadPruned(spark: SparkSession, path: String, column: String,
      lower: Option[Any] = None, upper: Option[Any] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(lower.isDefined || upper.isDefined,
      "loadPruned: at least one of lower/upper must be set")
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val files = {
      val it = fs.listFiles(root, true)
      val b = Seq.newBuilder[org.apache.hadoop.fs.Path]
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet") && !f.getName.startsWith("_")
            && !f.getName.startsWith(".")) b += f
      }
      b.result()
    }
    // Unsigned lexicographic byte compare — parquet binary stats are
    // ordered by UNSIGNED UTF-8 bytes, and Spark's row filter compares
    // UTF8String bytes the same way. Java String.compareTo (UTF-16
    // code units) DISAGREES for supplementary-plane codepoints vs
    // U+E000..U+FFFF, which would wrongly prune matching files.
    def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }
    def cmp(a: Any, b: Any): Int = (a, b) match {
      case (x: java.lang.Number, y: java.lang.Number)
          if x.isInstanceOf[java.lang.Long] || x.isInstanceOf[Integer] =>
        java.lang.Long.compare(x.longValue, y.longValue)
      case (x: java.lang.Number, y: java.lang.Number) =>
        java.lang.Double.compare(x.doubleValue, y.doubleValue)
      case (x: org.apache.parquet.io.api.Binary, y) =>
        cmpBytes(x.getBytes,
          y.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case (x, y) => cmpBytes(
        x.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        y.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val kept = files.filter { f =>
      try {
        val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
        try {
          import scala.jdk.CollectionConverters._
          rdr.getFooter.getBlocks.asScala.exists { block =>
            block.getColumns.asScala
              .find(_.getPath.toDotString == column) match {
              case None => true // column not in this file: cannot prune
              case Some(cc) =>
                val st = cc.getStatistics
                if (st == null) true // no stats: cannot prune
                else if (!st.hasNonNullValue)
                  // hasNonNullValue=false means "no min/max recorded".
                  // That PROVES all-NULL (range never matches → prunable)
                  // only when the null count is set and covers every
                  // row; a no-stats writer or dropped oversized binary
                  // min/max also lands here and MUST keep the chunk.
                  !(st.isNumNullsSet && st.getNumNulls == block.getRowCount)
                else {
                  val geLo = lower.forall(l => cmp(st.genericGetMax, l) >= 0)
                  val leHi = upper.forall(u => cmp(st.genericGetMin, u) <= 0)
                  geLo && leHi
                }
            }
          }
        } finally rdr.close()
      } catch { case _: Throwable => true } // unreadable footer: keep
    }
    // no candidate file: one file supplies the schema and the filter
    // returns the (correct) empty result without a full-table scan
    val paths = if (kept.nonEmpty) kept else files.take(1)
    require(paths.nonEmpty, s"loadPruned: no parquet files under $path")
    val pred = (lower.map(l => col(column) >= lit(l)) ++
      upper.map(u => col(column) <= lit(u))).reduce(_ && _)
    // basePath keeps hive-style partition columns alive when reading
    // explicit file paths under a partitioned root (without it the
    // directory-encoded columns silently vanish from the schema);
    // harmless on flat single-directory layouts
    spark.read.option("basePath", path)
      .parquet(paths.map(_.toString): _*).filter(pred)
  }

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
