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

  // ---- statement-level MERGE (r12 verdict item 4) --------------------
  //
  // Spark itself only parses MERGE INTO against catalog v2 tables; a
  // user migrating MERGE statements onto bare parquet had to hand-roll
  // the Cdc rewrite. These entry points close that gap: the DataFrame
  // form below is the kernel, [[mergeSql]] parses the statement shape,
  // and [[mergeIntoParquet]] is the copy-on-write writer that rewrites
  // only touched partitions.

  /** SCD-1 MERGE as a pure transform: per `on`-key,
    *  - source row matching a target key: deleted when
    *    `whenMatchedDeleteIf` holds (evaluated on the SOURCE row),
    *    else replaces the target row when `whenMatchedUpdate`;
    *  - source row matching nothing: inserted when
    *    `whenNotMatchedInsert`;
    *  - untouched target keys pass through.
    *
    * Requires identical target/source schemas (the `UPDATE SET * /
    * INSERT *` statement shape). The source must carry at most one row
    * per key — multiple matches have no defined winner (the ANSI MERGE
    * cardinality error; run [[graft.operators.Cdc.requireUniqueVersions]]
    * as a validation pass when unsure).
    *
    * Scale shape: routed through [[graft.operators.Cdc.applyChangelog]]
    * — with the default clause set (update + insert, no delete
    * condition) the plan is the changelog merge verbatim: ONE hash
    * shuffle of target ∪ source on the key, nothing else moves. A
    * delete condition or a disabled clause needs matched/not-matched
    * membership, adding one semi/anti join of the source against the
    * target's key column (source-sized, usually ≪ target).
    */
  def merge(target: DataFrame, source: DataFrame, on: Seq[String],
      whenMatchedUpdate: Boolean = true,
      whenMatchedDeleteIf: Option[org.apache.spark.sql.Column] = None,
      whenNotMatchedInsert: Boolean = true): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(on.nonEmpty, "merge: no key columns")
    require(target.columns.toSeq == source.columns.toSeq,
      s"merge (UPDATE SET * / INSERT *) needs identical schemas: " +
        s"${target.columns.mkString(",")} vs ${source.columns.mkString(",")}")
    val Seq(isDel, ver) = graft.operators.Cols.fresh("mrg", 2, target)
    val changes =
      if (whenMatchedUpdate && whenNotMatchedInsert
          && whenMatchedDeleteIf.isEmpty) {
        // pure upsert: matched-ness never changes the action, so skip
        // the membership probe entirely
        source.withColumn(isDel, lit(false))
      } else {
        val keys = target.select(on.map(col): _*)
        // ANSI MERGE: a NULL delete condition means the DELETE clause is
        // NOT taken (the row falls through to UPDATE). Null-safe the flag
        // here — downstream applyChangelog filters on `!isDel`, which
        // would drop a NULL-flagged change AND its displaced base row,
        // silently deleting the key. The whenMatchedUpdate=false path's
        // `filter(col(isDel))` below already drops NULLs correctly.
        val matched = source.join(keys, on, "left_semi")
          .withColumn(isDel, org.apache.spark.sql.functions.coalesce(
            whenMatchedDeleteIf.getOrElse(lit(false)), lit(false)))
        val matchedActing =
          if (whenMatchedUpdate) matched else matched.filter(col(isDel))
        val act =
          if (whenMatchedUpdate || whenMatchedDeleteIf.isDefined)
            Some(matchedActing)
          else None
        val ins =
          if (whenNotMatchedInsert)
            Some(source.join(keys, on, "left_anti")
              .withColumn(isDel, lit(false)))
          else None
        (act.toSeq ++ ins.toSeq)
          .reduceOption(_ unionByName _)
          .getOrElse(source.filter(lit(false)).withColumn(isDel, lit(false)))
      }
    graft.operators.Cdc.applyChangelog(
        target.withColumn(ver, lit(0L)),
        changes.withColumn(ver, lit(1L)),
        on, ver, isDel)
      .drop(ver)
  }

  private val MergeRe =
    ("""(?is)\s*MERGE\s+INTO\s+(\w+)\s+USING\s+(\w+)\s+ON\s+(.+?)""" +
      """((?:\s*WHEN\s+(?:NOT\s+)?MATCHED\b.*?)+)\s*""").r
  private val OnEqRe = """(?i)\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*""".r
  private val ClauseRe =
    ("""(?is)WHEN\s+(NOT\s+)?MATCHED\s*(?:AND\s+(.+?))?\s*THEN\s+""" +
      """(DELETE|UPDATE\s+SET\s+\*|INSERT\s+\*)""").r

  /** Parse the portable `MERGE INTO` statement shape onto [[merge]]:
    *
    * {{{
    * MERGE INTO <target> USING <source>
    *   ON <target>.<k> = <source>.<k> [AND ...]
    * [WHEN MATCHED AND <cond> THEN DELETE]
    * [WHEN MATCHED THEN UPDATE SET *]
    * [WHEN NOT MATCHED THEN INSERT *]
    * }}}
    *
    * `<target>`/`<source>` resolve from `tables` (the [[sql]] facade's
    * map shape). Restrictions, loudly rejected rather than silently
    * mis-executed: ON must be conjunctive same-name key equalities;
    * the only actions are `UPDATE SET *` / `INSERT *` / `DELETE`; a
    * MATCHED condition is allowed on the DELETE clause only and may
    * reference source columns (qualified with the source name).
    */
  def mergeSql(spark: SparkSession, statement: String,
      tables: Map[String, DataFrame]): DataFrame = statement match {
    case MergeRe(t, s, onText, clausesText) =>
      val target = tables.getOrElse(t,
        sys.error(s"mergeSql: unknown target table '$t' (have ${tables.keys.mkString(",")})"))
      val source = tables.getOrElse(s,
        sys.error(s"mergeSql: unknown source table '$s'"))
      val on = onText.split("(?i)\\bAND\\b").toSeq.map {
        case OnEqRe(q1, c1, q2, c2) =>
          val (tc, sc) =
            if (q1.equalsIgnoreCase(t) && q2.equalsIgnoreCase(s)) (c1, c2)
            else if (q1.equalsIgnoreCase(s) && q2.equalsIgnoreCase(t)) (c2, c1)
            else sys.error(s"mergeSql: ON term must join $t to $s: '$onText'")
          require(tc.equalsIgnoreCase(sc),
            s"mergeSql: ON keys must be same-named columns, got $tc = $sc")
          tc
        case other => sys.error(s"mergeSql: unsupported ON term '$other' " +
          "(only <target>.<k> = <source>.<k> conjunctions)")
      }
      var update = false; var insert = false
      var deleteIf: Option[org.apache.spark.sql.Column] = None
      val found = ClauseRe.findAllMatchIn(clausesText).toSeq
      require(found.nonEmpty, s"mergeSql: no WHEN clauses parsed in '$clausesText'")
      found.foreach { m =>
        val not = m.group(1) != null
        val cond = Option(m.group(2))
        val action = m.group(3).toUpperCase.replaceAll("\\s+", " ")
        (not, action) match {
          case (false, "DELETE") =>
            // the source alias makes s.<col> references resolve
            deleteIf = Some(org.apache.spark.sql.functions.expr(
              cond.getOrElse("true")))
          case (false, "UPDATE SET *") =>
            require(cond.isEmpty,
              "mergeSql: MATCHED AND <cond> is supported on DELETE only")
            update = true
          case (true, "INSERT *") =>
            require(cond.isEmpty,
              "mergeSql: NOT MATCHED AND <cond> is not supported")
            insert = true
          case other => sys.error(s"mergeSql: unsupported clause $other")
        }
      }
      merge(target, source.alias(s), on,
        whenMatchedUpdate = update,
        whenMatchedDeleteIf = deleteIf,
        whenNotMatchedInsert = insert)
    case _ => sys.error(
      "mergeSql: statement does not match the supported MERGE INTO shape")
  }

  private val UpdateRe =
    """(?is)\s*UPDATE\s+(\w+)\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*""".r
  private val DeleteRe =
    """(?is)\s*DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.+?)\s*""".r
  private val SetRe = """(?s)\s*(\w+)\s*=\s*(.+)\s*""".r

  /** Statement-level `UPDATE <t> SET c = expr[, ...] WHERE <cond>` as
    * a pure transform: rows matching the condition get each SET column
    * re-evaluated (expressions may reference any column of the row),
    * other rows pass through untouched — the second member of the DML
    * trio ([[mergeSql]], this, [[deleteSql]]) a user migrating
    * statement SQL onto bare parquet needs. SET splits on TOP-LEVEL
    * commas only (commas inside parentheses/quotes belong to the
    * expression); unknown columns are rejected loudly.
    */
  def updateSql(spark: SparkSession, statement: String,
      tables: Map[String, DataFrame]): DataFrame = statement match {
    case UpdateRe(t, setText, condText) =>
      val target = tables.getOrElse(t,
        sys.error(s"updateSql: unknown table '$t' (have ${tables.keys.mkString(",")})"))
      import org.apache.spark.sql.functions.{col, expr, when}
      val cond = expr(condText)
      val sets = splitTopLevel(setText).map {
        case SetRe(c, e) =>
          require(target.columns.contains(c),
            s"updateSql: unknown column '$c' in SET (table has " +
              s"${target.columns.mkString(",")})")
          c -> expr(e)
        case other => sys.error(s"updateSql: unsupported SET term '$other'")
      }
      // evaluate every RHS against the PRE-update row (ANSI UPDATE
      // semantics: SET a = b, b = a swaps) — build one projection
      val outCols = target.columns.map { c =>
        sets.find(_._1.equalsIgnoreCase(c)) match {
          case Some((_, e)) => when(cond, e).otherwise(col(c))
            .cast(target.schema(c).dataType).as(c)
          case None => col(c)
        }
      }
      target.select(outCols.toIndexedSeq: _*)
    case _ => sys.error(
      "updateSql: statement does not match UPDATE <t> SET ... WHERE ...")
  }

  /** Statement-level `DELETE FROM <t> WHERE <cond>`: the surviving
    * rows (cond false or NULL survives? No — ANSI deletes rows where
    * the condition is TRUE; NULL-condition rows survive, which
    * `filter(!cond)` alone would drop — hence the null-safe guard).
    */
  def deleteSql(spark: SparkSession, statement: String,
      tables: Map[String, DataFrame]): DataFrame = statement match {
    case DeleteRe(t, condText) =>
      val target = tables.getOrElse(t,
        sys.error(s"deleteSql: unknown table '$t'"))
      import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
      target.filter(not(coalesce(expr(condText), lit(false))))
    case _ => sys.error(
      "deleteSql: statement does not match DELETE FROM <t> WHERE ...")
  }

  /** Persisted statement-level `UPDATE <t> SET ... WHERE ...` against
    * a SNAPSHOT-VERSIONED parquet table ([[graft.tables.Versioned]]):
    * same parse surface as [[updateSql]], compiled onto
    * [[graft.tables.Versioned.updateWhere]] — the rewrite commits as
    * a NEW version (prior versions still time-travel, only partitions
    * containing a matching row are rewritten). The statement's table
    * name is documentation; the table IS `path`. Returns the
    * committed version.
    */
  def updateSqlVersioned(spark: SparkSession, statement: String,
      path: String, partitionCols: Seq[String] = Nil): Int =
    statement match {
      case UpdateRe(_, setText, condText) =>
        import org.apache.spark.sql.functions.expr
        val sets = splitTopLevel(setText).map {
          case SetRe(c, e) => c -> expr(e)
          case other =>
            sys.error(s"updateSqlVersioned: unsupported SET term '$other'")
        }
        graft.tables.Versioned.updateWhere(spark, path, sets,
          expr(condText), partitionCols)
      case _ => sys.error(
        "updateSqlVersioned: statement does not match UPDATE <t> SET ... WHERE ...")
    }

  /** Persisted statement-level `DELETE FROM <t> WHERE ...` against a
    * snapshot-versioned parquet table: [[deleteSql]]'s parse surface
    * onto [[graft.tables.Versioned.deleteWhere]] (ANSI: TRUE-condition
    * rows removed, NULL-condition rows survive; an emptied partition
    * simply has no files in the new snapshot). Returns the committed
    * version.
    */
  def deleteSqlVersioned(spark: SparkSession, statement: String,
      path: String, partitionCols: Seq[String] = Nil): Int =
    statement match {
      case DeleteRe(_, condText) =>
        import org.apache.spark.sql.functions.expr
        graft.tables.Versioned.deleteWhere(spark, path, expr(condText),
          partitionCols)
      case _ => sys.error(
        "deleteSqlVersioned: statement does not match DELETE FROM <t> WHERE ...")
    }

  private val InsertValuesRe =
    """(?is)\s*INSERT\s+INTO\s+(\w+)\s*(?:\(([^)]*)\))?\s*(VALUES\s*\(.+?\))\s*""".r
  private val InsertSelectRe =
    """(?is)\s*INSERT\s+INTO\s+(\w+)\s*(?:\(([^)]*)\))?\s*(SELECT\s+.+?)\s*""".r

  /** Statement-level `INSERT INTO <t> [(cols)] VALUES (...)[, ...]` /
    * `INSERT INTO <t> [(cols)] SELECT ...` as a pure transform:
    * returns target ∪ inserted — the last member of the DML quartet
    * ([[mergeSql]], [[updateSql]], [[deleteSql]], this). ANSI column
    * semantics: a column list binds the incoming columns POSITIONALLY
    * to the named target columns; unnamed target columns are filled
    * with NULL; every incoming value casts to the target column's
    * type. The SELECT form resolves table names from `tables` (the
    * facade map shape). Unknown tables/columns and arity mismatches
    * are rejected loudly.
    *
    * Scale shape: zero shuffles — a VALUES inline table is a local
    * relation unioned under the target's plan, a SELECT source keeps
    * its own plan; the union is metadata-only (no exchange; writers
    * parallelize per-source). For the persisted form see
    * [[insertIntoParquet]], which appends files without touching
    * existing ones.
    */
  def insertSql(spark: SparkSession, statement: String,
      tables: Map[String, DataFrame]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val (t, colsOpt, incoming) = statement match {
      case InsertValuesRe(tn, cs, valuesText) =>
        (tn, Option(cs), spark.sql(s"SELECT * FROM $valuesText"))
      case InsertSelectRe(tn, cs, select) =>
        tables.foreach { case (n, df) => df.createOrReplaceTempView(n) }
        (tn, Option(cs), spark.sql(select))
      case _ => sys.error(
        "insertSql: statement does not match INSERT INTO <t> [(cols)] " +
          "VALUES (...) | SELECT ...")
    }
    val target = tables.getOrElse(t, sys.error(
      s"insertSql: unknown table '$t' (have ${tables.keys.mkString(",")})"))
    val named = colsOpt match {
      case Some(cs) =>
        val names = cs.split(",").map(_.trim).toSeq
        names.foreach { c =>
          require(target.columns.exists(_.equalsIgnoreCase(c)),
            s"insertSql: unknown column '$c' in column list (table has " +
              s"${target.columns.mkString(",")})")
        }
        // ANSI rejects duplicate target columns; without this check the
        // positional map below would last-win silently, binding one
        // incoming value and dropping the other
        require(names.map(_.toLowerCase).distinct.size == names.size,
          s"insertSql: duplicate column(s) in column list: " +
            names.groupBy(_.toLowerCase).filter(_._2.size > 1)
              .keys.mkString(","))
        names
      case None => target.columns.toSeq
    }
    require(incoming.columns.length == named.size,
      s"insertSql: ${named.size} target column(s) but " +
        s"${incoming.columns.length} value(s) per row")
    // positional bind, NULL-fill the unnamed columns, cast to target types
    val pos = named.map(_.toLowerCase).zipWithIndex.toMap
    val aligned = incoming.select(target.columns.map { c =>
      pos.get(c.toLowerCase) match {
        case Some(i) => col(incoming.columns(i))
          .cast(target.schema(c).dataType).as(c)
        case None => lit(null).cast(target.schema(c).dataType).as(c)
      }
    }.toIndexedSeq: _*)
    target.unionByName(aligned)
  }

  /** Persisted INSERT for a bare-parquet table: appends the aligned
    * rows as NEW files — existing files (all partitions, touched or
    * not) stay byte-identical, the cheapest possible table mutation
    * (PartitioningSpec pins it). Pass `partitionCols` matching the
    * table's layout so new rows land in their hive directories.
    */
  def insertIntoParquet(spark: SparkSession, path: String,
      rows: DataFrame, partitionCols: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.col
    val base = spark.read.parquet(path)
    require(rows.columns.map(_.toLowerCase).toSet
        == base.columns.map(_.toLowerCase).toSet,
      s"insertIntoParquet: schema mismatch — table has " +
        s"${base.columns.mkString(",")}, rows have ${rows.columns.mkString(",")}")
    val aligned = rows.select(base.columns.map(c =>
      col(c).cast(base.schema(c).dataType).as(c)).toIndexedSeq: _*)
    val w = aligned.write.mode("append")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** Split on commas at parenthesis/quote depth zero. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    s.foreach { ch =>
      if (inStr) { cur += ch; if (ch == '\'') inStr = false }
      else ch match {
        case '\'' => inStr = true; cur += ch
        case '(' => depth += 1; cur += ch
        case ')' => depth -= 1; cur += ch
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case c => cur += c
      }
    }
    if (cur.nonEmpty) out += cur.toString
    out.result()
  }

  /** Copy-on-write MERGE into a partitioned bare-parquet table: only
    * partitions the source actually touches are rewritten; every other
    * partition's files are left byte-untouched (PartitioningSpec pins
    * it). This is the Iceberg/Delta COW pattern without the table
    * format: correctness holds because `partitionCols ⊆ on` (enforced)
    * means a key can never move between partitions, so a merge's
    * effects are confined to the source rows' own partitions.
    *
    * The touched-partition list is collected to the driver (bounded by
    * `maxTouchedPartitions` — partition VALUES are the small side by
    * construction; raise it knowingly). The merged replacement is
    * materialized via localCheckpoint before the overwrite because
    * Spark refuses to overwrite a path its own plan still reads; a
    * production deployment on a real commit protocol would stage +
    * swap instead.
    */
  def mergeIntoParquet(spark: SparkSession, path: String,
      source: DataFrame, on: Seq[String], partitionCols: Seq[String],
      whenMatchedUpdate: Boolean = true,
      whenMatchedDeleteIf: Option[org.apache.spark.sql.Column] = None,
      whenNotMatchedInsert: Boolean = true,
      maxTouchedPartitions: Int = 10000): Unit = {
    import org.apache.spark.sql.functions.{col, lit}
    require(partitionCols.nonEmpty, "mergeIntoParquet: no partition columns")
    require(partitionCols.forall(on.contains),
      s"mergeIntoParquet: partitionCols (${partitionCols.mkString(",")}) " +
        s"must be a subset of the merge keys (${on.mkString(",")}) — " +
        "otherwise a matched key could live in a partition this " +
        "copy-on-write never rewrites")
    val base = spark.read.parquet(path)
    // column order: parquet partition columns come back LAST on read;
    // realign the source to the read-back order so merge's SET */
    // INSERT * schema contract applies. CAST to the read-back types too:
    // if the union below widened a source column (Int source vs Long
    // read-back), the `touched` values collected here would compare
    // type-unequal (Seq(1) != Seq(1L)) against the merged output's
    // `surviving` values, misclassifying every touched partition as
    // emptied and deleting its freshly rewritten directory
    val src = source.select(base.columns.map(c =>
      col(c).cast(base.schema(c).dataType).as(c)).toIndexedSeq: _*)
    // The emptied-partition delete below re-renders partition VALUES to
    // directory paths; a type whose JVM toString diverges from Spark's
    // hive rendering (timestamp, float/double, decimal) would miss the
    // directory and the deleted rows would RESURRECT on the next read —
    // loud guard, same contract as Versioned.mergeInto
    locally {
      import org.apache.spark.sql.types._
      val ok: Set[DataType] =
        Set(StringType, IntegerType, LongType, ShortType, ByteType,
          BooleanType, DateType)
      val bad = partitionCols.filterNot(c => ok.contains(base.schema(c).dataType))
      require(bad.isEmpty,
        s"mergeIntoParquet: partition column(s) ${bad.mkString(",")} have " +
          "type(s) whose JVM rendering differs from Spark's partition-" +
          "directory rendering — an emptied partition could not be " +
          "deleted and its rows would resurrect. Partition on " +
          "string/int/long/short/byte/boolean/date")
    }
    val touched = src.select(partitionCols.map(col): _*).distinct()
      .limit(maxTouchedPartitions + 1).collect()
    require(touched.length <= maxTouchedPartitions,
      s"mergeIntoParquet: source touches > $maxTouchedPartitions " +
        "partitions — raise maxTouchedPartitions or fall back to a " +
        "full-table merge + rewrite")
    val touchedPred = touched.map { row =>
      partitionCols.zipWithIndex
        .map { case (c, i) => col(c) <=> lit(row.get(i)) }
        .reduce(_ && _)
    }.reduceOption(_ || _).getOrElse(lit(false))
    val merged = merge(base.filter(touchedPred), src, on,
      whenMatchedUpdate, whenMatchedDeleteIf, whenNotMatchedInsert)
      .localCheckpoint() // sever the plan's file references before overwrite
    // Dynamic overwrite only rewrites partitions PRESENT in the output.
    // A touched partition whose every row was deleted produces zero
    // output rows, so its old files would survive and the deleted rows
    // resurrect on the next read. Diff touched vs surviving partition
    // values (merged ⊆ touched because partitionCols ⊆ on pins keys to
    // their partitions) and delete the emptied directories explicitly
    // after the write.
    val surviving = merged.select(partitionCols.map(col): _*).distinct()
      .collect()
      .map(r => partitionCols.indices.map(r.get).toSeq).toSet
    val emptied = touched
      .map(r => partitionCols.indices.map(r.get).toSeq)
      .filterNot(surviving.contains)
    val prior = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.partitionBy(partitionCols: _*)
      .mode("overwrite").parquet(path)
    finally prior match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    if (emptied.nonEmpty) {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      emptied.foreach { values =>
        val rel = partitionCols.zip(values).map { case (c, v) =>
          val s = Option(v).map(_.toString)
            .getOrElse("__HIVE_DEFAULT_PARTITION__")
          s"$c=${escapePathName(s)}"
        }.mkString("/")
        val dir = new org.apache.hadoop.fs.Path(path, rel)
        if (fs.exists(dir)) fs.delete(dir, true)
      }
    }
  }

  /** Hive-style partition-path escaping, matching what Spark's writer
    * produces for directory names (ExternalCatalogUtils semantics):
    * control chars and path-hostile chars become %XX.
    */
  private[graft] def escapePathName(s: String): String = {
    def needsEscape(c: Char): Boolean =
      c < ' ' || c == '"' || c == '#' || c == '%' || c == '\'' ||
        c == '*' || c == '/' || c == ':' || c == '=' || c == '?' ||
        c == '\\' || c == '\u007F' || c == '{' || c == '[' || c == ']' ||
        c == '^'
    val sb = new StringBuilder
    s.foreach { c =>
      if (needsEscape(c)) sb.append("%%%02X".format(c.toInt))
      else sb.append(c)
    }
    sb.toString
  }
}
