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

  // ---- pruned reads: footer stats + the persisted manifest ----------

  /** Per-file pruning stats for one column, the SHARED decision model
    * for both the footer path and the manifest path of [[loadPruned]]
    * — decisions are identical by construction because both paths
    * reduce to a [[ColStat]] and one [[canMatch]] call.
    *
    * `hasStats = false` means "cannot prune on bounds" (missing
    * column, no-stats writer, dropped binary min/max, unreadable
    * footer); `allNull = true` means every row of every block is
    * PROVABLY null (range predicates never match). min/max are
    * canonical strings (Long.toString / Double.toString round-trip
    * exactly; strings verbatim).
    */
  private[graft] case class ColStat(kind: String, min: String,
      max: String, allNull: Boolean, hasStats: Boolean)

  val ManifestName = "_graft_manifest.json"

  /** Test/diagnostic hook: footers opened by [[loadPruned]] since JVM
    * start — the manifest path's whole point is keeping this flat as
    * file counts grow. */
  val footerReads = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Unsigned lexicographic byte compare — parquet binary stats are
    * ordered by UNSIGNED UTF-8 bytes, and Spark's row filter compares
    * UTF8String bytes the same way. Java String.compareTo (UTF-16
    * code units) DISAGREES for supplementary-plane codepoints vs
    * U+E000..U+FFFF, which would wrongly prune matching files.
    */
  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  private def cmpStat(kind: String, stat: String, bound: Any): Int =
    kind match {
      case "long" => java.lang.Long.compare(stat.toLong, bound match {
        case n: java.lang.Number => n.longValue
        case other => other.toString.toLong
      })
      case "double" => java.lang.Double.compare(stat.toDouble, bound match {
        case n: java.lang.Number => n.doubleValue
        case other => other.toString.toDouble
      })
      case _ => cmpBytes(
        stat.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        bound.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

  /** Can a file with these stats contain a row in [lower, upper]?
    * Conservative: only a provable miss returns false. A bound that
    * cannot be parsed against the column's stat type (e.g. a string
    * bound on a long-stats column) proves nothing — keep the file
    * rather than abort the whole read with a NumberFormatException. */
  private def canMatch(cs: ColStat,
      lower: Option[Any], upper: Option[Any]): Boolean =
    if (!cs.hasStats) true
    else if (cs.allNull) false // a range predicate never matches NULL
    else try {
      lower.forall(l => cmpStat(cs.kind, cs.max, l) >= 0) &&
        upper.forall(u => cmpStat(cs.kind, cs.min, u) <= 0)
    } catch { case _: NumberFormatException => true }

  /** Read one file's footer and reduce `column`'s block statistics to
    * a [[ColStat]]. Any block that cannot prove its contents forces
    * hasStats = false for the file (keep). */
  private def footerStat(conf: org.apache.hadoop.conf.Configuration,
      f: org.apache.hadoop.fs.Path, column: String): ColStat = {
    footerReads.incrementAndGet()
    try {
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      try {
        import scala.jdk.CollectionConverters._
        var kind: String = null
        var mn: String = null
        var mx: String = null
        var sawValues = false
        var unknown = false
        rdr.getFooter.getBlocks.asScala.foreach { block =>
          block.getColumns.asScala
            .find(_.getPath.toDotString == column) match {
            case None => unknown = true // column not in this file
            case Some(cc) =>
              val st = cc.getStatistics
              if (st == null) unknown = true
              else if (!st.hasNonNullValue) {
                // "no min/max recorded" proves all-NULL only when the
                // null count is set and covers every row; a no-stats
                // writer or dropped oversized binary min/max also
                // lands here and MUST keep the file
                if (!(st.isNumNullsSet
                    && st.getNumNulls == block.getRowCount)) unknown = true
                // else: provably all-null block — contributes nothing
              } else {
                val (k, lo, hi) = (st.genericGetMin, st.genericGetMax) match {
                  case (a: org.apache.parquet.io.api.Binary,
                        b: org.apache.parquet.io.api.Binary) =>
                    ("string", a.toStringUsingUTF8, b.toStringUsingUTF8)
                  case (a: java.lang.Number, b: java.lang.Number)
                      if a.isInstanceOf[java.lang.Long]
                        || a.isInstanceOf[Integer] =>
                    ("long", a.longValue.toString, b.longValue.toString)
                  case (a: java.lang.Number, b: java.lang.Number) =>
                    ("double", a.doubleValue.toString, b.doubleValue.toString)
                  case (a, b) => ("string", a.toString, b.toString)
                }
                if (kind == null) kind = k
                if (kind != k) unknown = true
                else {
                  if (!sawValues || cmpStat(k, mn, lo) > 0) mn = lo
                  if (!sawValues || cmpStat(k, mx, hi) < 0) mx = hi
                  sawValues = true
                }
              }
          }
        }
        if (unknown) ColStat("", "", "", allNull = false, hasStats = false)
        else if (!sawValues) ColStat("", "", "", allNull = true, hasStats = true)
        else ColStat(kind, mn, mx, allNull = false, hasStats = true)
      } finally rdr.close()
    } catch { case _: Throwable => // unreadable footer: keep
      ColStat("", "", "", allNull = false, hasStats = false)
    }
  }

  private def listParquet(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
    val it = fs.listFiles(root, true)
    val b = Seq.newBuilder[org.apache.hadoop.fs.Path]
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet") && !f.getName.startsWith("_")
          && !f.getName.startsWith(".")) b += f
    }
    b.result()
  }

  private def relPath(root: org.apache.hadoop.fs.Path,
      f: org.apache.hadoop.fs.Path): String = {
    val r = root.toUri.relativize(f.toUri).getPath
    if (!r.startsWith("/")) r
    else {
      // URI.relativize against a schemeless root silently returns the
      // FULL path instead of a relative one (listFiles paths are
      // scheme-qualified) — strip the root prefix so manifest keys are
      // truly relative and interoperate with snapshot file lists
      r.stripPrefix(root.toUri.getPath.stripSuffix("/")).stripPrefix("/")
    }
  }

  /** Write the persisted pruning manifest (r13 verdict item 5): ONE
    * driver pass over the table's parquet footers emits
    * `_graft_manifest.json` at the table root with each file's
    * per-column min/max/all-null stats and its byte length — the
    * write-side half of [[loadPruned]], which then plans from one
    * sidecar read instead of O(files) footer opens. This is the
    * Iceberg/Delta manifest idea without the table format: at 100k
    * files the per-query planning cost drops from 100k footer opens
    * to one small-file read.
    *
    * Staleness contract: entries carry the file's length; a file
    * whose length changed (or a file missing from the manifest —
    * e.g. appended by [[graft.Graft.insertIntoParquet]] after the
    * manifest write) falls back to its own footer, so a stale
    * manifest degrades to the exact pre-manifest behavior, never to
    * a wrong prune. Same-length in-place rewrites are outside the
    * contract (the [[graft.operators.FixtureMeta]] "immutable while
    * in use" rule, documented not assumed). Call again after bulk
    * mutations to refresh.
    */
  def writePruningManifest(spark: SparkSession, path: String,
      columns: Seq[String]): Unit = {
    require(columns.nonEmpty, "writePruningManifest: no columns")
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val files = listParquet(fs, root)
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val entries = files.map { f =>
      val len = fs.getFileStatus(f).getLen
      val cols = columns.map { c =>
        val cs = footerStat(conf, f, c)
        c -> (("kind" -> cs.kind) ~ ("min" -> cs.min) ~ ("max" -> cs.max)
          ~ ("allNull" -> cs.allNull) ~ ("hasStats" -> cs.hasStats))
      }
      ("path" -> relPath(root, f)) ~ ("len" -> len) ~
        ("cols" -> org.json4s.JObject(cols.toList))
    }
    val doc = ("version" -> 1) ~ ("columns" -> columns) ~
      ("files" -> entries)
    val out = fs.create(new org.apache.hadoop.fs.Path(root, ManifestName),
      true)
    try out.write(JsonMethods.compact(JsonMethods.render(doc))
      .getBytes("UTF-8"))
    finally out.close()
  }

  /** Parse the manifest into relPath -> (len, col -> ColStat); None
    * when absent or unparseable (fall back to footers). */
  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path)
      : Option[Map[String, (Long, Map[String, ColStat])]] = {
    val p = new org.apache.hadoop.fs.Path(root, ManifestName)
    try {
      if (!fs.exists(p)) return None
      val in = fs.open(p)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val doc = JsonMethods.parse(txt)
      val files = (doc \ "files") match {
        case JArray(fsx) => fsx
        case _ => return None
      }
      Some(files.flatMap { e =>
        for {
          JString(rel) <- Option(e \ "path")
          JInt(len) <- Option(e \ "len")
        } yield {
          val cols = (e \ "cols") match {
            case JObject(fields) => fields.flatMap { case (c, v) =>
              for {
                JString(kind) <- Option(v \ "kind")
                JString(mn) <- Option(v \ "min")
                JString(mx) <- Option(v \ "max")
                JBool(an) <- Option(v \ "allNull")
                JBool(hs) <- Option(v \ "hasStats")
              } yield c -> ColStat(kind, mn, mx, an, hs)
            }.toMap
            case _ => Map.empty[String, ColStat]
          }
          rel -> (len.toLong, cols)
        }
      }.toMap)
    } catch { case _: Throwable => None }
  }

  /** Zone-map-consuming pruned read (r12 verdict item 5): evaluate a
    * [lower, upper] range predicate on `column` against each parquet
    * FILE's min/max statistics — driver metadata only, no data read —
    * and hand Spark only the files that can match; the same predicate
    * is then applied as a normal row filter, so the result is ALWAYS
    * identical to the unpruned `read.filter(...)` (PartitioningSpec
    * pins it), pruning only changes which files the scan opens. On
    * sorted/clustered layouts (e.g. [[graft.operators.ZOrder]] output)
    * a selective range touches a constant number of files regardless
    * of table size.
    *
    * Stats come from `_graft_manifest.json` when
    * [[writePruningManifest]] wrote one (ONE sidecar read plans the
    * whole query — the 100 TB path); files missing from the manifest
    * or whose length changed since, and tables with no manifest, fall
    * back to per-file footer opens. Both paths reduce to the same
    * [[ColStat]] + [[canMatch]] decision, so pruning is
    * result-identical by construction.
    *
    * Conservative by construction: a file is skipped ONLY when stats
    * prove no row group can satisfy the predicate; missing stats,
    * missing column, or an unreadable footer keep the file. A range
    * predicate never matches NULL, so provably-all-null files prune.
    * Bounds compare numerically for numeric columns and lexically
    * (unsigned UTF-8 bytes) for strings — the parquet stats orderings.
    */
  def loadPruned(spark: SparkSession, path: String, column: String,
      lower: Option[Any] = None, upper: Option[Any] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(lower.isDefined || upper.isDefined,
      "loadPruned: at least one of lower/upper must be set")
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val files = listParquet(fs, root)
    val manifest = readManifest(fs, root)
    val kept = files.filter { f =>
      val fromManifest = manifest.flatMap(_.get(relPath(root, f)))
        .filter { case (len, _) =>
          try fs.getFileStatus(f).getLen == len
          catch { case _: Throwable => false }
        }
        .flatMap { case (_, cols) => cols.get(column) }
      val cs = fromManifest.getOrElse(footerStat(conf, f, column))
      canMatch(cs, lower, upper)
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

  /** [[loadPruned]]'s decision core over an EXPLICIT (relPath, length)
    * file list — the entry [[Versioned.loadPruned]] feeds with a
    * snapshot's live set, so zone-map skipping composes with snapshot
    * isolation (and, because versioned files are IMMUTABLE, their
    * manifest entries never go stale — the length check always
    * passes). Returns the absolute paths that can match. */
  private[graft] def pruneFileList(spark: SparkSession, path: String,
      files: Seq[(String, Long)], column: String,
      lower: Option[Any], upper: Option[Any]): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val manifest = readManifest(fs, root)
    files.filter { case (rel, len) =>
      val f = new org.apache.hadoop.fs.Path(root, rel)
      val fromManifest = manifest.flatMap(_.get(rel))
        .filter(_._1 == len)
        .flatMap(_._2.get(column))
      val cs = fromManifest.getOrElse(footerStat(conf, f, column))
      canMatch(cs, lower, upper)
    }.map { case (rel, _) =>
      new org.apache.hadoop.fs.Path(root, rel).toString
    }
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
