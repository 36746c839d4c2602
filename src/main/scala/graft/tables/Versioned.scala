package graft.tables

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Snapshot-versioned bare-parquet tables: time travel + snapshot
  * isolation for the DML surface (r14 verdict item 2).
  *
  * The COW facade ([[graft.Graft.mergeIntoParquet]]) rewrites touched
  * partition directories IN PLACE, so a reader concurrent with a merge
  * can see a torn table and "read as of before that merge" is
  * impossible. This layer is the Iceberg/Delta snapshot idea without
  * the table format:
  *
  *   - Data files are IMMUTABLE once written; mutations only ever ADD
  *     files (append-mode writes — never dynamic overwrite, never a
  *     directory delete).
  *   - A snapshot `_graft_versions/v{N}.json` lists the files LIVE at
  *     version N (relative path + length). The snapshot file is
  *     staged to a temp name and RENAMED into place — one atomic
  *     commit after every data file is fully written, so no reader
  *     can resolve a version whose files are incomplete.
  *   - The current version is simply the max N present — no separate
  *     pointer file to swap (a pointer overwrite is delete+create on
  *     HDFS-semantics filesystems, which has a torn window; max-N
  *     needs none).
  *   - Readers resolve a snapshot once and then read only immutable
  *     files → a reader concurrent with any number of commits sees
  *     exactly the version it resolved, never a mix (snapshot
  *     isolation). [[vacuum]] is the only destructive operation and
  *     is an explicit, retention-bounded admin step.
  *
  * Contract: ONE writer at a time (commits are serialized by the
  * caller — this layer adds no lock; two concurrent writers could
  * both stage v{N+1} and one rename would fail loudly, not corrupt),
  * any number of readers. A versioned table must be read through
  * [[load]] — a plain directory read sees every generation of every
  * row and is NOT the table (the directory stopped being the source
  * of truth the moment the first commit kept history).
  *
  * Scale shape: commits touch O(files-in-touched-partitions) metadata
  * entries and the snapshot JSON is one driver-sized sidecar (the
  * [[TableLoader.writePruningManifest]] cost class — at 100k files
  * it replaces 100k-file directory listings per read with one small
  * read). Data movement is exactly the COW merge's: only touched
  * partitions are rewritten, as NEW files.
  */
object Versioned {

  val VersionsDirName = "_graft_versions"

  private def fsOf(spark: SparkSession, root: Path): FileSystem =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionsDir(root: Path) = new Path(root, VersionsDirName)

  private def snapshotPath(root: Path, v: Int) =
    new Path(versionsDir(root), f"v$v%06d.json")

  private val SnapRe = """v(\d{6})\.json""".r

  /** Recursive data-file listing: relPath -> length. Skips dotfiles,
    * underscore sidecars (_SUCCESS, the pruning manifest) and the
    * versions dir itself. */
  private def dataFiles(fs: FileSystem, root: Path): Map[String, Long] = {
    val b = Map.newBuilder[String, Long]
    // qualify the root: listFiles returns scheme-qualified paths, and
    // URI.relativize against a schemeless root silently returns the
    // FULL uri instead of a relative path
    val qroot = fs.makeQualified(root).toUri
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      val rel = qroot.relativize(st.getPath.toUri).getPath
      val name = st.getPath.getName
      if (!rel.startsWith(VersionsDirName) && !name.startsWith("_")
          && !name.startsWith(".") && name.endsWith(".parquet"))
        b += rel -> st.getLen
    }
    b.result()
  }

  /** Max committed version, or None for an unversioned directory. */
  def currentVersion(spark: SparkSession, path: String): Option[Int] = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val vd = versionsDir(root)
    if (!fs.exists(vd)) None
    else {
      val vs = fs.listStatus(vd).toSeq.map(_.getPath.getName).collect {
        case SnapRe(n) => n.toInt
      }
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  private def readSnapshot(fs: FileSystem, root: Path, v: Int)
      : Seq[(String, Long)] = {
    val p = snapshotPath(root, v)
    require(fs.exists(p), s"Versioned: no snapshot v$v at $root " +
      "(wrong version, or vacuumed past it)")
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val doc = JsonMethods.parse(txt)
    (doc \ "files") match {
      case JArray(fsx) => fsx.flatMap { e =>
        for {
          JString(rel) <- Option(e \ "path")
          JInt(len) <- Option(e \ "len")
        } yield rel -> len.toLong
      }
      case _ => sys.error(s"Versioned: unparseable snapshot $p")
    }
  }

  /** The streaming batchId a snapshot committed, if it came from the
    * micro-batch sink — the idempotence marker for replay skipping. */
  def committedBatchId(spark: SparkSession, path: String): Option[Long] = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    currentVersion(spark, path).flatMap { v =>
      val p = snapshotPath(root, v)
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      (JsonMethods.parse(txt) \ "batchId") match {
        case JInt(b) => Some(b.toLong)
        case _ => None
      }
    }
  }

  /** Stage + atomic-rename commit of snapshot v. Fails loudly if v
    * already exists (a concurrent writer won the commit). */
  private def writeSnapshot(fs: FileSystem, root: Path, v: Int,
      files: Seq[(String, Long)], batchId: Option[Long] = None): Unit = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val base = ("version" -> v) ~
      ("files" -> files.sortBy(_._1).map { case (p, l) =>
        ("path" -> p) ~ ("len" -> l) })
    val doc = batchId match {
      case Some(b) => base ~ ("batchId" -> b)
      case None => base
    }
    val vd = versionsDir(root)
    if (!fs.exists(vd)) fs.mkdirs(vd)
    val target = snapshotPath(root, v)
    require(!fs.exists(target),
      s"Versioned: snapshot v$v already exists at $root — concurrent " +
        "writer? commits must be serialized")
    val tmp = new Path(vd, f".v$v%06d.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(JsonMethods.compact(JsonMethods.render(doc))
      .getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, target),
      s"Versioned: atomic commit rename failed for $target")
  }

  /** Version an EXISTING bare-parquet directory: snapshot its current
    * files as v1. Returns 1. */
  def init(spark: SparkSession, path: String): Int = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    require(currentVersion(spark, path).isEmpty,
      s"Versioned.init: $path is already versioned")
    val files = dataFiles(fs, root).toSeq
    require(files.nonEmpty, s"Versioned.init: no parquet files at $path")
    writeSnapshot(fs, root, 1, files)
    1
  }

  /** Write `df` as a fresh versioned table at `path` (must be empty
    * or absent) and commit v1. */
  def create(spark: SparkSession, path: String, df: DataFrame,
      partitionCols: Seq[String] = Nil): Int = {
    val w = df.write.mode("errorifexists")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
    init(spark, path)
  }

  /** Read the table as of `version` (default: current). Reads ONLY
    * the snapshot's immutable files, so the result is stable under
    * any concurrent commits; hive partition columns are recovered via
    * basePath. Loud error if a listed file was vacuumed or its length
    * changed (immutability violated). */
  def load(spark: SparkSession, path: String,
      version: Option[Int] = None): DataFrame = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val v = version.orElse(currentVersion(spark, path)).getOrElse(
      sys.error(s"Versioned.load: $path is not a versioned table"))
    val files = readSnapshot(fs, root, v)
    require(files.nonEmpty,
      s"Versioned.load: v$v of $path is empty — zero files to infer a " +
        "schema from; keep a schema-bearing ancestor or read an " +
        "earlier version")
    files.foreach { case (rel, len) =>
      val p = new Path(root, rel)
      require(fs.exists(p) && fs.getFileStatus(p).getLen == len,
        s"Versioned.load: $rel of v$v is missing or resized — " +
          "vacuumed past this version, or immutability was violated")
    }
    spark.read.option("basePath", root.toString)
      .parquet(files.map(f => new Path(root, f._1).toString): _*)
  }

  /** Zone-map-pruned read of a SNAPSHOT — [[load]] composed with
    * [[TableLoader.loadPruned]]'s data skipping: the snapshot's live
    * files are filtered by their parquet min/max stats before Spark
    * ever opens them, so a selective range on a clustered versioned
    * table reads O(matching files) of the chosen VERSION. Because
    * versioned files are immutable, `_graft_manifest.json` entries
    * never go stale for them (the staleness check is byte-length) —
    * write the manifest once per table and every version plans from
    * the one sidecar. Result-identical to `load(...).filter(...)` by
    * the same conservative [[TableLoader]] decision core
    * (PartitioningSpec pins it).
    */
  def loadPruned(spark: SparkSession, path: String, column: String,
      lower: Option[Any] = None, upper: Option[Any] = None,
      version: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col => c, lit}
    require(lower.isDefined || upper.isDefined,
      "Versioned.loadPruned: at least one of lower/upper must be set")
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val v = version.orElse(currentVersion(spark, path)).getOrElse(
      sys.error(s"Versioned.loadPruned: $path is not a versioned table"))
    val files = readSnapshot(fs, root, v)
    require(files.nonEmpty, s"Versioned.loadPruned: v$v of $path is empty")
    files.foreach { case (rel, len) =>
      val p = new Path(root, rel)
      require(fs.exists(p) && fs.getFileStatus(p).getLen == len,
        s"Versioned.loadPruned: $rel of v$v is missing or resized — " +
          "vacuumed past this version, or immutability was violated")
    }
    val kept = TableLoader.pruneFileList(spark, path, files, column,
      lower, upper)
    // no candidate: one live file supplies the schema, the filter
    // returns the correct empty result
    val paths =
      if (kept.nonEmpty) kept
      else files.take(1).map(f => new Path(root, f._1).toString)
    val pred = (lower.map(l => c(column) >= lit(l)) ++
      upper.map(u => c(column) <= lit(u))).reduce(_ && _)
    spark.read.option("basePath", root.toString)
      .parquet(paths: _*).filter(pred)
  }

  /** Versioned COW MERGE: same semantics and same touched-partition
    * confinement as [[graft.Graft.mergeIntoParquet]] (partitionCols ⊆
    * on, bounded touched-value collect), but the replacement rows are
    * APPENDED as new files and the commit is a new snapshot that drops
    * the touched partitions' old files from the live set — nothing is
    * deleted, so every prior version stays readable and a concurrent
    * reader of any version never sees a torn table. An emptied
    * partition simply has no files in the new snapshot (the in-place
    * facade needed an explicit directory delete for this — here
    * history IS the mechanism). Returns the committed version.
    */
  def mergeInto(spark: SparkSession, path: String,
      source: DataFrame, on: Seq[String], partitionCols: Seq[String],
      whenMatchedUpdate: Boolean = true,
      whenMatchedDeleteIf: Option[org.apache.spark.sql.Column] = None,
      whenNotMatchedInsert: Boolean = true,
      maxTouchedPartitions: Int = 10000): Int = {
    require(partitionCols.nonEmpty, "Versioned.mergeInto: no partition columns")
    require(partitionCols.forall(on.contains),
      s"Versioned.mergeInto: partitionCols (${partitionCols.mkString(",")}) " +
        s"must be a subset of the merge keys (${on.mkString(",")})")
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val cur = currentVersion(spark, path).getOrElse(
      sys.error(s"Versioned.mergeInto: $path is not a versioned table"))
    val live = readSnapshot(fs, root, cur)
    val base = load(spark, path, Some(cur))
    // align to the read-back column order and types (the
    // mergeIntoParquet contract — union widening would break the
    // partition-value diff and SET */INSERT * schema equality)
    val src = source.select(base.columns.map(c =>
      col(c).cast(base.schema(c).dataType).as(c)).toIndexedSeq: _*)
    val touched = src.select(partitionCols.map(col): _*).distinct()
      .limit(maxTouchedPartitions + 1).collect()
    require(touched.length <= maxTouchedPartitions,
      s"Versioned.mergeInto: source touches > $maxTouchedPartitions " +
        "partitions — raise maxTouchedPartitions knowingly")
    val touchedPred = touched.map { row =>
      partitionCols.zipWithIndex
        .map { case (c, i) => col(c) <=> lit(row.get(i)) }
        .reduce(_ && _)
    }.reduceOption(_ || _).getOrElse(lit(false))
    val merged = graft.Graft.merge(base.filter(touchedPred), src, on,
      whenMatchedUpdate, whenMatchedDeleteIf, whenNotMatchedInsert)
    val before = dataFiles(fs, root)
    merged.write.mode("append").partitionBy(partitionCols: _*)
      .parquet(path)
    val after = dataFiles(fs, root)
    val newFiles = (after -- before.keySet).toSeq
    // live set: previous files OUTSIDE the touched partitions + the
    // fresh files (merged ⊆ touched because partitionCols ⊆ on)
    val touchedPrefixes = touched.map { row =>
      partitionCols.zipWithIndex.map { case (c, i) =>
        val s = Option(row.get(i)).map(_.toString)
          .getOrElse("__HIVE_DEFAULT_PARTITION__")
        s"$c=${graft.Graft.escapePathName(s)}"
      }.mkString("/") + "/"
    }
    val kept = live.filterNot { case (rel, _) =>
      touchedPrefixes.exists(rel.startsWith)
    }
    writeSnapshot(fs, root, cur + 1, kept ++ newFiles)
    cur + 1
  }

  /** Versioned INSERT: append `rows` as new files, commit previous
    * live set + the new files. Existing files stay byte-identical
    * (the insertIntoParquet contract) AND the previous version stays
    * readable. Returns the committed version. */
  def insertInto(spark: SparkSession, path: String, rows: DataFrame,
      partitionCols: Seq[String] = Nil): Int =
    insertCommit(spark, path, rows, partitionCols, None)

  /** Exactly-once micro-batch sink commit — the
    * `writeStream.foreachBatch` body for a versioned table: appends
    * the batch and commits a snapshot STAMPED with `batchId`; a
    * replayed batch (Structured Streaming re-runs the last batch
    * after recovery) whose id is ≤ the table's committed batchId is
    * SKIPPED, so restarts never double-append — the table-format
    * idempotent-sink protocol (the reason plain parquet `foreachBatch`
    * sinks are at-least-once) on the same snapshot machinery. Returns
    * the table's version after the call (unchanged on a skip;
    * PartitioningSpec pins replay == no-op and mid-stream version
    * reads).
    *
    * Usage:
    * {{{
    * ds.writeStream.foreachBatch { (b: DataFrame, id: Long) =>
    *   Versioned.insertIntoStreamBatch(spark, dir, b, cols, id); ()
    * }
    * }}}
    */
  def insertIntoStreamBatch(spark: SparkSession, path: String,
      rows: DataFrame, partitionCols: Seq[String], batchId: Long): Int = {
    val cur = currentVersion(spark, path).getOrElse(
      sys.error(s"Versioned.insertIntoStreamBatch: $path is not a " +
        "versioned table — create/init it before starting the stream"))
    committedBatchId(spark, path) match {
      case Some(last) if batchId <= last => cur // replay: idempotent skip
      case _ => insertCommit(spark, path, rows, partitionCols, Some(batchId))
    }
  }

  private def insertCommit(spark: SparkSession, path: String,
      rows: DataFrame, partitionCols: Seq[String],
      batchId: Option[Long]): Int = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val cur = currentVersion(spark, path).getOrElse(
      sys.error(s"Versioned.insertInto: $path is not a versioned table"))
    val live = readSnapshot(fs, root, cur)
    val base = load(spark, path, Some(cur))
    require(rows.columns.map(_.toLowerCase).toSet
        == base.columns.map(_.toLowerCase).toSet,
      s"Versioned.insertInto: schema mismatch — table has " +
        s"${base.columns.mkString(",")}, rows have ${rows.columns.mkString(",")}")
    val aligned = rows.select(base.columns.map(c =>
      col(c).cast(base.schema(c).dataType).as(c)).toIndexedSeq: _*)
    val before = dataFiles(fs, root)
    val w = aligned.write.mode("append")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
    val after = dataFiles(fs, root)
    writeSnapshot(fs, root, cur + 1,
      live ++ (after -- before.keySet).toSeq, batchId)
    cur + 1
  }

  /** Retention: drop all snapshots older than the newest `keepLast`
    * and physically delete data files no kept snapshot references.
    * The ONLY destructive operation in the layer; returns the deleted
    * data-file relPaths. */
  def vacuum(spark: SparkSession, path: String, keepLast: Int): Seq[String] = {
    require(keepLast >= 1, s"Versioned.vacuum: keepLast must be >= 1")
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val cur = currentVersion(spark, path).getOrElse(
      sys.error(s"Versioned.vacuum: $path is not a versioned table"))
    val vd = versionsDir(root)
    val all = fs.listStatus(vd).toSeq.map(_.getPath.getName).collect {
      case SnapRe(n) => n.toInt
    }.sorted
    val keep = all.takeRight(keepLast).toSet
    val referenced = keep.toSeq.flatMap(v =>
      readSnapshot(fs, root, v).map(_._1)).toSet
    val doomed = (dataFiles(fs, root).keySet -- referenced).toSeq.sorted
    doomed.foreach(rel => fs.delete(new Path(root, rel), false))
    all.filterNot(keep).foreach(v =>
      fs.delete(snapshotPath(root, v), false))
    doomed
  }
}
