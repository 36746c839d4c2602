package graft.tables

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit}

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
  * any number of readers. Every commit's data files are STAMPED with
  * a commit-unique prefix and the snapshot is built from the stamp —
  * never from a before/after directory diff — so even when the
  * single-writer contract is violated, the loser's files can never be
  * silently claimed by the winner's snapshot: the winner's snapshot
  * contains exactly its own files and the loser dies on the v-rename
  * collision, leaving only unreferenced orphans for [[vacuum]].
  * [[vacuum]] itself must be serialized WITH the writer (it is part
  * of the one-writer contract, not exempt from it): it deletes
  * unreferenced data files, and an in-flight commit's freshly-moved
  * files are exactly that until the snapshot renames into place. As a
  * safety margin it additionally skips unreferenced files newer than
  * the latest committed snapshot, so a vacuum racing a writer (a
  * contract violation) leaves the in-flight files alone.
  * A versioned table must be read through
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

  private def readSnapshotDoc(fs: FileSystem, root: Path, v: Int)
      : org.json4s.JValue = {
    val p = snapshotPath(root, v)
    require(fs.exists(p), s"Versioned: no snapshot v$v at $root " +
      "(wrong version, or expired/vacuumed past it)")
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    org.json4s.jackson.JsonMethods.parse(txt)
  }

  private def readSnapshot(fs: FileSystem, root: Path, v: Int)
      : Seq[(String, Long)] = {
    import org.json4s._
    (readSnapshotDoc(fs, root, v) \ "files") match {
      case JArray(fsx) => fsx.flatMap { e =>
        for {
          JString(rel) <- Option(e \ "path")
          JInt(len) <- Option(e \ "len")
        } yield rel -> len.toLong
      }
      case _ => sys.error(s"Versioned: unparseable snapshot v$v at $root")
    }
  }

  /** The snapshot's DECLARED schema, set once [[addColumn]] has evolved
    * the table (absent before any evolution — the schema is then simply
    * what the files carry). Committed forward by every subsequent
    * commit, so "the schema as of version v" time-travels with v. */
  private def snapshotSchema(fs: FileSystem, root: Path, v: Int)
      : Option[org.apache.spark.sql.types.StructType] = {
    import org.json4s._
    (readSnapshotDoc(fs, root, v) \ "schema") match {
      case JString(json) =>
        Some(org.apache.spark.sql.types.DataType.fromJson(json)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
      case _ => None
    }
  }

  /** The snapshot's rename map: declared column name → the CHAIN of
    * prior physical names still present in older live files, newest
    * first (a→b→c stores "c" -> ["b", "a"]). Written by
    * [[renameColumn]], carried forward by every commit, consumed by
    * [[alignTo]]'s coalesce. */
  private def snapshotRenames(fs: FileSystem, root: Path, v: Int)
      : Map[String, Seq[String]] = {
    import org.json4s._
    (readSnapshotDoc(fs, root, v) \ "renames") match {
      case JArray(es) => es.flatMap { e =>
        for { JString(to) <- Option(e \ "to") } yield {
          val chain = (e \ "from") match {
            case JArray(cs) => cs.collect { case JString(s) => s }
            case _ => Nil
          }
          to -> chain
        }
      }.toMap
      case _ => Map.empty
    }
  }

  /** The streaming batchId a snapshot committed, if it came from the
    * micro-batch sink — the idempotence marker for replay skipping. */
  def committedBatchId(spark: SparkSession, path: String): Option[Long] = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    currentVersion(spark, path).flatMap { v =>
      import org.json4s._
      (readSnapshotDoc(fs, root, v) \ "batchId") match {
        case JInt(b) => Some(b.toLong)
        case _ => None
      }
    }
  }

  /** Stage + atomic-rename commit of snapshot v. Fails loudly if v
    * already exists (a concurrent writer won the commit). */
  private def writeSnapshot(fs: FileSystem, root: Path, v: Int,
      files: Seq[(String, Long)], batchId: Option[Long] = None,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      renames: Map[String, Seq[String]] = Map.empty): Unit = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val base0 = ("version" -> v) ~
      ("files" -> files.sortBy(_._1).map { case (p, l) =>
        ("path" -> p) ~ ("len" -> l) })
    val base1 = schema match {
      case Some(sc) => base0 ~ ("schema" -> sc.json)
      case None => base0
    }
    val base = if (renames.nonEmpty)
      base1 ~ ("renames" -> renames.toSeq.sortBy(_._1)
        .map { case (k2, chain) => ("to" -> k2) ~ ("from" -> chain) })
    else base1
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

  /** Append `df`'s rows as STAMPED new files: the write goes to a
    * private staging dir under the versions dir (invisible to data
    * listings and plain reads), then each data file is MOVED into the
    * table under a commit-unique name prefix. The commit's file set
    * is therefore known exactly — never inferred from a before/after
    * directory diff — so a concurrent writer's files (a violated
    * single-writer contract) can never be silently claimed by this
    * commit's snapshot. Returns (relPath, len) of the moved files.
    */
  /** Output sizing for versioned writes (r19, guide §6 small-files):
    * target ~128 MB files by DERIVED partition count — the
    * optimizer's size estimate over the write target, never the
    * session's shuffle/core count (a 32-partition local session was
    * writing 32 tiny files + 32 commit renames per small delta, and
    * every later load paid the listing + footer opens). Only ever
    * REDUCES the partition count (coalesce; an over-estimate just
    * keeps more, still well-sized files), and leaves frames with no
    * usable estimate untouched, so a 100 TB write keeps its natural
    * parallelism. */
  private def sizedForWrite(df: DataFrame): DataFrame = {
    val target = 128L * 1024 * 1024
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes <= BigInt(0) || bytes >= BigInt(Long.MaxValue / 4)) df
    else {
      val want = ((bytes + target - 1) / target)
        .min(BigInt(1 << 20)).toInt.max(1)
      // coalesce never INCREASES partitions, so no current-count probe
      // (df.rdd.getNumPartitions could execute AQE stages)
      df.coalesce(want)
    }
  }

  private def stampedAppend(fs: FileSystem, root: Path,
      df: DataFrame, partitionCols: Seq[String]): Seq[(String, Long)] = {
    val stamp = java.util.UUID.randomUUID().toString
      .replace("-", "").take(16)
    val stage = new Path(versionsDir(root), s".stage-$stamp")
    val w = sizedForWrite(df).write.mode("errorifexists")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(stage.toString)
    val staged = dataFiles(fs, stage).toSeq.sortBy(_._1)
    val moved = staged.map { case (rel, len) =>
      val slash = rel.lastIndexOf('/')
      val (dirRel, name) =
        if (slash < 0) ("", rel)
        else (rel.substring(0, slash), rel.substring(slash + 1))
      val destDir = if (dirRel.isEmpty) root else new Path(root, dirRel)
      if (!fs.exists(destDir)) fs.mkdirs(destDir)
      val destName = s"g$stamp-$name"
      val dest = new Path(destDir, destName)
      require(fs.rename(new Path(stage, rel), dest),
        s"Versioned: stamped move failed for $dest")
      (if (dirRel.isEmpty) destName else s"$dirRel/$destName") -> len
    }
    fs.delete(stage, true)
    moved
  }

  /** Partition-column types whose JVM `Row.get(i).toString` rendering
    * is IDENTICAL to Spark's hive partition-directory rendering.
    * [[mergeInto]]/[[updateWhere]]/[[deleteWhere]] re-render touched
    * partition VALUES to path prefixes to drop a touched partition's
    * old files from the new snapshot — for a type whose toString
    * diverges (java.sql.Timestamp renders `2024-01-01 00:00:00.0` but
    * the directory says `2024-01-01 00%3A00%3A00`; Double `1.0E7` vs
    * `1.0E7`-vs-plain disagreements; BigDecimal scale), the prefix
    * would never match and the new snapshot would SILENTLY keep both
    * the old and the rewritten files — duplicated rows in a committed
    * snapshot. Hence: loud require, not a silent wrong table.
    */
  private def requireRenderablePartitionTypes(
      df: DataFrame, partitionCols: Seq[String], op: String): Unit = {
    import org.apache.spark.sql.types._
    val ok: Set[DataType] =
      Set(StringType, IntegerType, LongType, ShortType, ByteType,
        BooleanType, DateType)
    val bad = partitionCols.filterNot(c => ok.contains(df.schema(c).dataType))
    require(bad.isEmpty,
      s"Versioned.$op: partition column(s) ${bad.mkString(",")} have " +
        s"type(s) ${bad.map(c => df.schema(c).dataType.simpleString).mkString(",")} " +
        "whose JVM rendering differs from Spark's partition-directory " +
        "rendering — the touched-partition file drop would silently " +
        "keep stale files (duplicated rows). Partition on " +
        "string/int/long/short/byte/boolean/date, or derive a " +
        "renderable partition key (e.g. date_format the timestamp)")
  }

  /** Project `df` onto a DECLARED snapshot schema: columns the merged
    * file read carries are cast into place; columns NO live file
    * carries yet (an ADD COLUMN nothing has written to) read as typed
    * NULLs; a RENAMED column coalesces across its physical-name chain
    * (post-rename files carry the declared name, older files the
    * prior names — each file carries exactly one, so the coalesce is
    * a disjoint union, never a preference). Column order is the
    * declared order. */
  private def alignTo(df: DataFrame,
      sc: org.apache.spark.sql.types.StructType,
      renames: Map[String, Seq[String]] = Map.empty): DataFrame =
    df.select(sc.fields.map { f =>
      val sources = (f.name +: renames.getOrElse(f.name, Nil))
        .filter(s => df.columns.exists(_.equalsIgnoreCase(s)))
      sources match {
        case Nil => lit(null).cast(f.dataType).as(f.name)
        case one :: Nil => col(one).cast(f.dataType).as(f.name)
        case many => coalesce(many.map(col): _*).cast(f.dataType)
          .as(f.name)
      }
    }.toIndexedSeq: _*)

  /** ADD COLUMN schema evolution (r16 verdict item 4): commit a new
    * snapshot whose FILE LIST is unchanged but whose declared schema
    * gains `name` (nullable) at the end. No data moves — old files
    * simply yield NULL for the column on read (union-widening via
    * parquet mergeSchema), files written by later commits carry it,
    * and a mixed snapshot reads both seamlessly. Time travel returns
    * each version's OWN schema: versions before the evolution read
    * without the column (their snapshots carry no declared schema, or
    * an earlier one), versions after read with it. The declared schema
    * is carried forward by every subsequent commit
    * (insert/merge/update/delete/compact). Returns the committed
    * version.
    *
    * Scale shape: a metadata-only commit — one sidecar JSON write; a
    * 100 TB table evolves in O(1).
    */
  def addColumn(spark: SparkSession, path: String, name: String,
      dataType: org.apache.spark.sql.types.DataType): Int = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val cur = currentVersion(spark, path).getOrElse(
      sys.error(s"Versioned.addColumn: $path is not a versioned table"))
    val base = load(spark, path, Some(cur))
    require(!base.columns.exists(_.equalsIgnoreCase(name)),
      s"Versioned.addColumn: column '$name' already exists " +
        s"(table has ${base.columns.mkString(",")})")
    val live = readSnapshot(fs, root, cur)
    val renames = snapshotRenames(fs, root, cur)
    // with DROP/RENAME in the system, live files can carry LATENT
    // columns the declared schema no longer names — adding a column
    // under such a name would silently resurrect the old values
    requireNoLatentCollision(spark, root, live, renames, name,
      "addColumn")
    val evolved = org.apache.spark.sql.types.StructType(
      base.schema.fields :+ org.apache.spark.sql.types.StructField(
        name, dataType, nullable = true))
    writeSnapshot(fs, root, cur + 1, live,
      committedBatchId(spark, path), Some(evolved), renames)
    cur + 1
  }

  /** Every physical column name the snapshot's live files carry plus
    * every rename-chain source — the collision surface for
    * [[addColumn]]/[[renameColumn]]. One footer-merge schema read,
    * no data scan. */
  private def requireNoLatentCollision(spark: SparkSession, root: Path,
      live: Seq[(String, Long)], renames: Map[String, Seq[String]],
      name: String, op: String): Unit = {
    val chainNames = renames.values.flatten.map(_.toLowerCase).toSet
    val fileCols =
      if (live.isEmpty) Set.empty[String]
      else spark.read.option("basePath", root.toString)
        .option("mergeSchema", "true")
        .parquet(live.map(f => new Path(root, f._1).toString): _*)
        .schema.fieldNames.map(_.toLowerCase).toSet
    require(!chainNames.contains(name.toLowerCase)
        && !fileCols.contains(name.toLowerCase),
      s"Versioned.$op: live files still carry latent data under " +
        s"'$name' (a dropped or renamed-away column) — reusing the " +
        "name would resurrect old values; pick another name, or " +
        "compact + vacuum the old files away first")
  }

  /** DROP COLUMN schema evolution (r17 verdict item 6): commit a new
    * snapshot with the SAME file list and the declared schema minus
    * `name` — a metadata-only commit, O(1) at any table size. Old
    * files keep the bytes (history: earlier versions still read the
    * column; [[vacuum]]/[[compact]] eventually reclaim them); reads
    * of the new version simply never select it. Re-adding the same
    * name is refused while any live file still carries the latent
    * data (the [[addColumn]] guard). Hive partition-directory columns
    * cannot drop — basePath recovery and the touched-partition commit
    * math key on them. Returns the committed version.
    */
  def dropColumn(spark: SparkSession, path: String, name: String): Int = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val cur = currentVersion(spark, path).getOrElse(
      sys.error(s"Versioned.dropColumn: $path is not a versioned table"))
    val base = load(spark, path, Some(cur))
    require(base.columns.exists(_.equalsIgnoreCase(name)),
      s"Versioned.dropColumn: no column '$name' " +
        s"(table has ${base.columns.mkString(",")})")
    require(base.columns.length >= 2,
      "Versioned.dropColumn: cannot drop the last column")
    val live = readSnapshot(fs, root, cur)
    require(!live.exists(_._1.contains(s"$name=")),
      s"Versioned.dropColumn: '$name' is a hive partition-directory " +
        "column — partition layout is not evolvable in place")
    val remaining = org.apache.spark.sql.types.StructType(
      base.schema.fields.filterNot(_.name.equalsIgnoreCase(name)))
    val renames = snapshotRenames(fs, root, cur)
      .filterNot(_._1.equalsIgnoreCase(name))
    writeSnapshot(fs, root, cur + 1, live,
      committedBatchId(spark, path), Some(remaining), renames)
    cur + 1
  }

  /** RENAME COLUMN schema evolution (r17 verdict item 6): commit a
    * new snapshot whose declared schema carries `to` in `from`'s
    * place and whose rename map records the physical-name CHAIN
    * (rename of rename composes), so [[alignTo]] reads old files'
    * `from` data and new files' `to` data as ONE column — per file
    * exactly one of the names exists, so the coalesce is a disjoint
    * union. Metadata-only, O(1) at any table size; later data commits
    * write files under the new name. Renaming onto a latent file
    * column is refused (the resurrect guard); hive partition columns
    * cannot rename. Returns the committed version.
    */
  def renameColumn(spark: SparkSession, path: String, from: String,
      to: String): Int = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val cur = currentVersion(spark, path).getOrElse(
      sys.error(s"Versioned.renameColumn: $path is not a versioned table"))
    val base = load(spark, path, Some(cur))
    require(base.columns.exists(_.equalsIgnoreCase(from)),
      s"Versioned.renameColumn: no column '$from' " +
        s"(table has ${base.columns.mkString(",")})")
    require(!base.columns.exists(_.equalsIgnoreCase(to)),
      s"Versioned.renameColumn: target '$to' already exists")
    require(!from.equalsIgnoreCase(to),
      "Versioned.renameColumn: from and to are the same name")
    val live = readSnapshot(fs, root, cur)
    require(!live.exists(_._1.contains(s"$from=")),
      s"Versioned.renameColumn: '$from' is a hive partition-directory " +
        "column — partition layout is not evolvable in place")
    val renames = snapshotRenames(fs, root, cur)
    requireNoLatentCollision(spark, root, live, renames, to,
      "renameColumn")
    val chain = from +: renames.getOrElse(from, Nil)
    val newRenames =
      renames.filterNot(_._1.equalsIgnoreCase(from)) + (to -> chain)
    val evolved = org.apache.spark.sql.types.StructType(
      base.schema.fields.map(f =>
        if (f.name.equalsIgnoreCase(from)) f.copy(name = to) else f))
    writeSnapshot(fs, root, cur + 1, live,
      committedBatchId(spark, path), Some(evolved), newRenames)
    cur + 1
  }

  /** Retention expiry — the METADATA half of [[vacuum]] (r17 verdict
    * item 6): delete every snapshot document older than the newest
    * `keepLast`, leaving ALL data files in place. Expired versions
    * become loudly unavailable (the [[load]] "no snapshot" require);
    * the files they alone referenced become unreferenced and a later
    * [[vacuum]] reclaims exactly those (plus staged orphans — the
    * composition the retention story needs: expire bounds history,
    * vacuum reclaims bytes, each independently serialized with the
    * single writer). Returns the expired version numbers.
    */
  def expireSnapshots(spark: SparkSession, path: String,
      keepLast: Int): Seq[Int] = {
    require(keepLast >= 1,
      s"Versioned.expireSnapshots: keepLast must be >= 1, got $keepLast")
    val root = new Path(path)
    val fs = fsOf(spark, root)
    currentVersion(spark, path).getOrElse(
      sys.error(s"Versioned.expireSnapshots: $path is not a versioned " +
        "table"))
    val vd = versionsDir(root)
    val all = fs.listStatus(vd).toSeq.map(_.getPath.getName).collect {
      case SnapRe(n) => n.toInt
    }.sorted
    val expired = all.dropRight(keepLast)
    expired.foreach(v => fs.delete(snapshotPath(root, v), false))
    expired
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
    val w = sizedForWrite(df).write.mode("errorifexists")
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
    val declared = snapshotSchema(fs, root, v)
    val renames = declared.map(_ => snapshotRenames(fs, root, v))
      .getOrElse(Map.empty[String, Seq[String]])
    // post-evolution snapshots can mix file schemas (ADD COLUMN moves
    // no data). r18: the union read schema is CONSTRUCTED from the
    // declared schema + rename chains instead of a mergeSchema
    // footer-sweep job — sound because this layer is the only writer
    // and no operation changes a field's type, so every physical name
    // in a chain was written with its field's declared type; a chain
    // name no live file carries reads as typed NULLs (exactly what
    // the merged read gave alignTo), and dropped columns are simply
    // not requested. alignTo then presents the version's declared
    // schema unchanged.
    val paths = files.map(f => new Path(root, f._1).toString)
    val raw = declared match {
      case Some(sc) =>
        import org.apache.spark.sql.types.{StructField, StructType}
        val readFields = sc.fields.flatMap { f =>
          (f.name +: renames.getOrElse(f.name, Nil)).map(n =>
            StructField(n, f.dataType, nullable = true))
        }
        spark.read.schema(StructType(readFields.toIndexedSeq))
          .option("basePath", root.toString)
          .parquet(paths: _*)
      case None =>
        spark.read.option("basePath", root.toString)
          .option("mergeSchema", "false")
          .parquet(paths: _*)
    }
    declared.map(alignTo(raw, _, renames)).getOrElse(raw)
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
    val declared = snapshotSchema(fs, root, v)
    val raw = spark.read.option("basePath", root.toString)
      .option("mergeSchema", declared.isDefined.toString)
      .parquet(paths: _*)
    // align BEFORE the filter so a post-evolution predicate column that
    // some pruned-in files lack still resolves (as typed NULL)
    declared.map(alignTo(raw, _, snapshotRenames(fs, root, v)))
      .getOrElse(raw).filter(pred)
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
    val cur = currentVersion(spark, path).getOrElse(
      sys.error(s"Versioned.mergeInto: $path is not a versioned table"))
    val base = load(spark, path, Some(cur))
    requireRenderablePartitionTypes(base, partitionCols, "mergeInto")
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
    commitRewrite(spark, path, partitionCols, touched, merged)
  }

  /** Shared commit tail for partition-confined rewrites ([[mergeInto]],
    * [[updateWhere]], [[deleteWhere]]): stamp-append `replacement`
    * (the touched partitions' COMPLETE surviving rows), drop the
    * touched partitions' previous files from the live set, commit.
    * With `partitionCols` empty the rewrite is full-table and the new
    * snapshot is exactly the new files. The dropped-prefix set is the
    * union of the re-rendered touched VALUES (covers partitions the
    * rewrite emptied — they produce no new files) and the new files'
    * actual parent directories (authoritative for partitions that
    * received rows); partition types are pre-validated renderable so
    * the two coincide — the union is defense in depth, not a crutch.
    */
  private def commitRewrite(spark: SparkSession, path: String,
      partitionCols: Seq[String],
      touched: Array[org.apache.spark.sql.Row],
      replacement: DataFrame): Int = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val cur = currentVersion(spark, path).getOrElse(
      sys.error(s"Versioned.commitRewrite: $path is not a versioned table"))
    val live = readSnapshot(fs, root, cur)
    val declared = snapshotSchema(fs, root, cur) // carry evolution forward
    val renames = snapshotRenames(fs, root, cur)
    // appending never deletes, so `replacement` may keep reading the
    // previous version's files while the new ones are written
    val newFiles = stampedAppend(fs, root, replacement, partitionCols)
    if (partitionCols.isEmpty) {
      writeSnapshot(fs, root, cur + 1, newFiles, None, declared, renames)
    } else {
      val rendered = touched.map { row =>
        partitionCols.zipWithIndex.map { case (c, i) =>
          val s = Option(row.get(i)).map(_.toString)
            .getOrElse("__HIVE_DEFAULT_PARTITION__")
          s"$c=${graft.Graft.escapePathName(s)}"
        }.mkString("/") + "/"
      }.toSeq
      val fromFiles = newFiles.map(_._1).collect {
        case rel if rel.lastIndexOf('/') >= 0 =>
          rel.substring(0, rel.lastIndexOf('/') + 1)
      }.distinct
      val dropped = (rendered ++ fromFiles).distinct
      val kept = live.filterNot { case (rel, _) =>
        dropped.exists(rel.startsWith)
      }
      writeSnapshot(fs, root, cur + 1, kept ++ newFiles, None, declared,
        renames)
    }
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
    // stamped append (never a before/after directory diff): under a
    // violated single-writer contract a concurrent appender's files
    // could land in this commit's listing window — the stamp makes
    // file attribution exact, so the winner's snapshot provably
    // contains only its own files and the loser dies on the v-rename
    val newFiles = stampedAppend(fs, root, aligned, partitionCols)
    writeSnapshot(fs, root, cur + 1, live ++ newFiles, batchId,
      snapshotSchema(fs, root, cur), // carry evolution forward
      snapshotRenames(fs, root, cur))
    cur + 1
  }

  /** Persisted `UPDATE ... SET ... WHERE`: rows matching `cond` get
    * each SET column re-evaluated (every RHS sees the PRE-update row —
    * the ANSI swap semantics; a NULL condition row is NOT updated),
    * and the result commits as a NEW snapshot — prior versions stay
    * readable (time travel), concurrent readers never see a torn
    * table. Returns the committed version (unchanged when no row
    * matches — a no-op UPDATE mints no version).
    *
    * Scale shape: with `partitionCols`, only partitions CONTAINING a
    * matching row are rewritten (touched values collected bounded by
    * `maxTouchedPartitions`; SET on a partition column is rejected
    * loudly — it could move rows between partitions, breaking the
    * confinement); without, the whole table rewrites as new files.
    */
  def updateWhere(spark: SparkSession, path: String,
      sets: Seq[(String, org.apache.spark.sql.Column)],
      cond: org.apache.spark.sql.Column,
      partitionCols: Seq[String] = Nil,
      maxTouchedPartitions: Int = 10000): Int = {
    import org.apache.spark.sql.functions.{coalesce, when}
    require(sets.nonEmpty, "Versioned.updateWhere: empty SET list")
    val cur = currentVersion(spark, path).getOrElse(
      sys.error(s"Versioned.updateWhere: $path is not a versioned table"))
    val base = load(spark, path, Some(cur))
    sets.foreach { case (c, _) =>
      require(base.columns.exists(_.equalsIgnoreCase(c)),
        s"Versioned.updateWhere: unknown column '$c' (table has " +
          s"${base.columns.mkString(",")})")
    }
    require(!sets.exists { case (c, _) =>
        partitionCols.exists(_.equalsIgnoreCase(c)) },
      "Versioned.updateWhere: SET on a partition column would move rows " +
        "between partitions — phrase it as a mergeInto (delete + insert)")
    if (partitionCols.nonEmpty)
      requireRenderablePartitionTypes(base, partitionCols, "updateWhere")
    val hit = coalesce(cond, lit(false))
    def updated(df: DataFrame): DataFrame = df.select(df.columns.map { c =>
      sets.find(_._1.equalsIgnoreCase(c)) match {
        case Some((_, e)) => when(hit, e).otherwise(col(c))
          .cast(df.schema(c).dataType).as(c)
        case None => col(c)
      }
    }.toIndexedSeq: _*)
    if (partitionCols.isEmpty)
      commitRewrite(spark, path, Nil,
        Array.empty[org.apache.spark.sql.Row], updated(base))
    else {
      val touched = base.filter(hit).select(partitionCols.map(col): _*)
        .distinct().limit(maxTouchedPartitions + 1).collect()
      require(touched.length <= maxTouchedPartitions,
        s"Versioned.updateWhere: > $maxTouchedPartitions touched " +
          "partitions — raise maxTouchedPartitions knowingly")
      if (touched.isEmpty) cur
      else {
        val touchedPred = touched.map { row =>
          partitionCols.zipWithIndex
            .map { case (c, i) => col(c) <=> lit(row.get(i)) }
            .reduce(_ && _)
        }.reduce(_ || _)
        commitRewrite(spark, path, partitionCols, touched,
          updated(base.filter(touchedPred)))
      }
    }
  }

  /** Persisted `DELETE FROM ... WHERE`: rows where `cond` is TRUE are
    * removed (NULL-condition rows survive — ANSI), committed as a NEW
    * snapshot; prior versions stay readable. Returns the committed
    * version (unchanged when no row matches). With `partitionCols`,
    * only partitions containing a matching row are rewritten; a
    * partition the DELETE empties simply has no files in the new
    * snapshot.
    */
  def deleteWhere(spark: SparkSession, path: String,
      cond: org.apache.spark.sql.Column,
      partitionCols: Seq[String] = Nil,
      maxTouchedPartitions: Int = 10000): Int = {
    import org.apache.spark.sql.functions.{coalesce, not}
    val cur = currentVersion(spark, path).getOrElse(
      sys.error(s"Versioned.deleteWhere: $path is not a versioned table"))
    val base = load(spark, path, Some(cur))
    if (partitionCols.nonEmpty)
      requireRenderablePartitionTypes(base, partitionCols, "deleteWhere")
    val hit = coalesce(cond, lit(false))
    if (partitionCols.isEmpty)
      commitRewrite(spark, path, Nil,
        Array.empty[org.apache.spark.sql.Row], base.filter(not(hit)))
    else {
      val touched = base.filter(hit).select(partitionCols.map(col): _*)
        .distinct().limit(maxTouchedPartitions + 1).collect()
      require(touched.length <= maxTouchedPartitions,
        s"Versioned.deleteWhere: > $maxTouchedPartitions touched " +
          "partitions — raise maxTouchedPartitions knowingly")
      if (touched.isEmpty) cur
      else {
        val touchedPred = touched.map { row =>
          partitionCols.zipWithIndex
            .map { case (c, i) => col(c) <=> lit(row.get(i)) }
            .reduce(_ && _)
        }.reduce(_ || _)
        commitRewrite(spark, path, partitionCols, touched,
          base.filter(touchedPred).filter(not(hit)))
      }
    }
  }

  /** Small-file compaction: rewrite every partition directory holding
    * MORE than one live file into bin-packed larger files and commit
    * the result as a NEW snapshot — the antidote to the streaming
    * sink's one-file-set-per-micro-batch accretion (T12), with the
    * append-only contract preserved: nothing is deleted, every prior
    * version still time-travels, and the current streaming batch
    * stamp is carried FORWARD into the compaction snapshot so a
    * mid-stream compaction can never reopen replay protection.
    * Directories already at one file are left byte-untouched. Returns
    * the committed version (unchanged when nothing needs compacting).
    *
    * Scale shape: one shuffle of the compactable bytes, nothing else
    * moves. Partitioned tables repartition on the partition columns
    * (+ a deterministic row-hash salt when a directory exceeds
    * `targetFileBytes`, bounding files-per-directory at
    * ceil(dirBytes/target)); unpartitioned tables round-robin into
    * ceil(totalBytes/target) bins. Old files stay for time travel —
    * reclaim them with [[vacuum]] once history ages out.
    */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      partitionCols: Seq[String] = Nil): Int = {
    require(targetFileBytes >= 1L,
      s"Versioned.compact: targetFileBytes must be >= 1, got $targetFileBytes")
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val cur = currentVersion(spark, path).getOrElse(
      sys.error(s"Versioned.compact: $path is not a versioned table"))
    val live = readSnapshot(fs, root, cur)
    def dirOf(rel: String): String = {
      val slash = rel.lastIndexOf('/')
      if (slash < 0) "" else rel.substring(0, slash)
    }
    val byDir = live.groupBy(f => dirOf(f._1))
    val toCompact = byDir.filter(_._2.size > 1)
    if (toCompact.isEmpty) return cur
    val keep = byDir.view.filterKeys(!toCompact.contains(_))
      .values.flatten.toSeq
    val paths = toCompact.values.flatten
      .map(f => new Path(root, f._1).toString).toSeq
    val declared = snapshotSchema(fs, root, cur)
    // post-evolution directories can mix file schemas — compacting
    // with a plain read would silently drop the added column from the
    // rewritten files; union-widen and align like [[load]]
    val raw = spark.read.option("basePath", root.toString)
      .option("mergeSchema", declared.isDefined.toString)
      .parquet(paths: _*)
    val renames = snapshotRenames(fs, root, cur)
    val df = declared.map(alignTo(raw, _, renames)).getOrElse(raw)
    partitionCols.foreach(c => require(df.columns.contains(c),
      s"Versioned.compact: partition column '$c' not in the table " +
        s"(${df.columns.mkString(",")}) — pass the table's hive layout"))
    val out =
      if (partitionCols.isEmpty) {
        val totalBytes = toCompact.values.flatten.map(_._2).sum
        val nBins = math.max(1L,
          (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
        df.repartition(nBins)
      } else {
        val maxDirBytes = toCompact.values.map(_.map(_._2).sum).max
        val binsPerDir = math.max(1L,
          (maxDirBytes + targetFileBytes - 1) / targetFileBytes).toInt
        if (binsPerDir == 1)
          // all rows of a partition value hash to ONE task → exactly
          // one output file per compacted directory
          df.repartition(partitionCols.map(col): _*)
        else {
          // deterministic row-hash salt caps files-per-directory at
          // binsPerDir without a second shuffle
          val dataCols = df.columns.filterNot(partitionCols.contains)
          df.withColumn("_graft_bin",
              org.apache.spark.sql.functions.pmod(
                org.apache.spark.sql.functions.hash(
                  dataCols.map(col).toIndexedSeq: _*), lit(binsPerDir)))
            .repartition((partitionCols.map(col) :+ col("_graft_bin"))
              .toIndexedSeq: _*)
            .drop("_graft_bin")
        }
      }
    val newFiles = stampedAppend(fs, root, out, partitionCols)
    // carry the streaming stamp AND the declared schema forward
    writeSnapshot(fs, root, cur + 1, keep ++ newFiles,
      committedBatchId(spark, path), declared, renames)
    cur + 1
  }

  /** Retention: drop all snapshots older than the newest `keepLast`
    * and physically delete data files no kept snapshot references,
    * plus orphaned `.stage-*` staging directories a crashed commit
    * left under the versions dir. The ONLY destructive operation in
    * the layer; returns the deleted relPaths.
    *
    * Serialization contract: vacuum is a WRITE and must be serialized
    * with the single writer — an in-flight commit's freshly-appended
    * files are unreferenced until its snapshot renames into place, so
    * a concurrent vacuum could destroy a commit in progress. As a
    * safety margin against a violated contract, unreferenced files
    * whose modification time is NEWER than the latest committed
    * snapshot are skipped (they may belong to an in-flight writer);
    * they remain eligible for the next vacuum once a later snapshot
    * either references or supersedes them.
    */
  def vacuum(spark: SparkSession, path: String, keepLast: Int): Seq[String] = {
    require(keepLast >= 1, s"Versioned.vacuum: keepLast must be >= 1")
    val root = new Path(path)
    val fs = fsOf(spark, root)
    currentVersion(spark, path).getOrElse(
      sys.error(s"Versioned.vacuum: $path is not a versioned table"))
    val vd = versionsDir(root)
    val all = fs.listStatus(vd).toSeq.map(_.getPath.getName).collect {
      case SnapRe(n) => n.toInt
    }.sorted
    val keep = all.takeRight(keepLast).toSet
    val referenced = keep.toSeq.flatMap(v =>
      readSnapshot(fs, root, v).map(_._1)).toSet
    val latestMtime =
      fs.getFileStatus(snapshotPath(root, all.max)).getModificationTime
    val doomed = (dataFiles(fs, root).keySet -- referenced).toSeq.sorted
      .filter { rel =>
        val p = new Path(root, rel)
        fs.exists(p) && fs.getFileStatus(p).getModificationTime <= latestMtime
      }
    doomed.foreach(rel => fs.delete(new Path(root, rel), false))
    all.filterNot(keep).foreach(v =>
      fs.delete(snapshotPath(root, v), false))
    // staged-orphan sweep (r16 ADVICE): a crash between stampedAppend's
    // staging write and its cleanup delete leaves a .stage-<stamp> dir
    // under the versions dir forever — dataFiles skips the versions
    // dir, so the unreferenced-file sweep above never lists it. Same
    // in-flight safety margin as above: a stage dir NEWER than the
    // latest committed snapshot may belong to a racing writer (already
    // a contract violation) and is left alone until a later vacuum.
    val stagedOrphans = fs.listStatus(vd).toSeq.filter { st =>
      st.isDirectory && st.getPath.getName.startsWith(".stage-") &&
        st.getModificationTime <= latestMtime
    }
    stagedOrphans.foreach(st => fs.delete(st.getPath, true))
    doomed ++ stagedOrphans.map(st =>
      s"$VersionsDirName/${st.getPath.getName}")
  }
}
