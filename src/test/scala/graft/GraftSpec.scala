package graft

import org.apache.spark.sql.functions._

/** The user-facing SQL facade: `Graft.sql(query, Map(name -> frame))`
  * must behave exactly like the reference's entry point — run ANSI SQL
  * over caller-provided frames — while staying a zero-copy catalog
  * registration on Spark.
  */
class GraftSpec extends SparkTestBase {

  test("facade query == DataFrame API over the same frames") {
    import spark.implicits._
    val people = Seq(("ann", 34, "eng"), ("bo", 25, "ops"), ("cy", 41, "eng"))
      .toDF("name", "age", "team")
    val out = Graft.sql("""
        SELECT team, COUNT(*) AS n, SUM(age) AS total_age
        FROM people WHERE age >= 30 GROUP BY team ORDER BY team""",
      Map("people" -> people))
    val api = people.filter($"age" >= 30).groupBy("team")
      .agg(count(lit(1)).as("n"), sum("age").as("total_age"))
      .orderBy("team")
    assert(out.collect().toSeq === api.collect().toSeq)
  }

  test("nested query + CASE — the reference's README surface") {
    import spark.implicits._
    val df = Seq((1, -5.0), (2, 100.0), (3, 9000.0)).toDF("id", "bal")
    val rows = Graft.sql("""
        SELECT bucket, COUNT(*) AS n FROM (
          SELECT CASE WHEN bal < 0 THEN 'neg'
                      WHEN bal < 5000 THEN 'mid' ELSE 'high' END AS bucket
          FROM t) seg
        GROUP BY bucket ORDER BY bucket""", Map("t" -> df))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows === Set(("neg", 1L), ("mid", 1L), ("high", 1L)))
  }

  // ---- statement-level MERGE ----

  private def mergeFixture = {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "s", "v")
    val source = Seq((2L, "B", 99.0), (4L, "D", 77.0), (9L, "i", 9.0))
      .toDF("k", "s", "v")
    (target, source)
  }
  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("merge: default clauses = upsert (update matched, insert new, keep rest)") {
    val (t, s) = mergeFixture
    assert(rowsOf(Graft.merge(t, s, Seq("k"))) === Set(
      (1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0),
      (4L, "D", 77.0), (9L, "i", 9.0)))
  }

  test("merge: clause combinations act independently") {
    import spark.implicits._
    val (t, s) = mergeFixture
    // update only — no inserts
    assert(rowsOf(Graft.merge(t, s, Seq("k"), whenNotMatchedInsert = false))
      === Set((1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0), (4L, "D", 77.0)))
    // insert only — matched rows keep their target values
    assert(rowsOf(Graft.merge(t, s, Seq("k"), whenMatchedUpdate = false))
      === Set((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
        (4L, "d", 40.0), (9L, "i", 9.0)))
    // conditional delete beats update; NOT-matched rows meeting the
    // delete condition still insert (delete applies to MATCHED only)
    assert(rowsOf(Graft.merge(t, s, Seq("k"),
        whenMatchedDeleteIf = Some(col("v") > 80.0)))
      === Set((1L, "a", 10.0), (3L, "c", 30.0), (4L, "D", 77.0), (9L, "i", 9.0)))
    val sDel = Seq((9L, "i", 999.0)).toDF("k", "s", "v")
    assert(rowsOf(Graft.merge(t, sDel, Seq("k"),
        whenMatchedDeleteIf = Some(col("v") > 80.0)))
      .contains((9L, "i", 999.0)),
      "not-matched row meeting the delete condition must still insert")
  }

  test("merge: NULL delete condition means UPDATE, not silent deletion") {
    import spark.implicits._
    // ANSI MERGE: a NULL-valued MATCHED AND <cond> means the DELETE
    // clause is NOT taken, so the row falls through to UPDATE SET *.
    val t = Seq((1L, "a", Some(10.0)), (2L, "b", Some(20.0)))
      .toDF("k", "s", "v")
    val s = Seq((1L, "A", None: Option[Double]), (2L, "B", Some(99.0)))
      .toDF("k", "s", "v")
    val out = Graft.merge(t, s, Seq("k"),
      whenMatchedDeleteIf = Some(col("v") > 80.0))
      .as[(Long, String, Option[Double])].collect().toSet
    assert(out === Set((1L, "A", None)),
      s"NULL condition must update (k=1) and TRUE must delete (k=2): $out")
    // with update disabled, a NULL condition row passes through untouched
    val keep = Graft.merge(t, s, Seq("k"), whenMatchedUpdate = false,
      whenNotMatchedInsert = false,
      whenMatchedDeleteIf = Some(col("v") > 80.0))
      .as[(Long, String, Option[Double])].collect().toSet
    assert(keep === Set((1L, "a", Some(10.0))))
  }

  test("mergeSql parses the three-clause statement and rejects the rest") {
    val (t, s) = mergeFixture
    val out = Graft.mergeSql(spark,
      """MERGE INTO tgt USING src ON tgt.k = src.k
         WHEN MATCHED AND src.v > 80.0 THEN DELETE
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""",
      Map("tgt" -> t, "src" -> s))
    assert(rowsOf(out) === Set(
      (1L, "a", 10.0), (3L, "c", 30.0), (4L, "D", 77.0), (9L, "i", 9.0)))
    // reversed ON orientation parses too
    assert(rowsOf(Graft.mergeSql(spark,
      """MERGE INTO tgt USING src ON src.k = tgt.k
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""",
      Map("tgt" -> t, "src" -> s))) === rowsOf(Graft.merge(t, s, Seq("k"))))
    intercept[Exception](Graft.mergeSql(spark,
      "MERGE INTO tgt USING src ON tgt.k < src.k WHEN MATCHED THEN DELETE",
      Map("tgt" -> t, "src" -> s)))
    intercept[Exception](Graft.mergeSql(spark,
      """MERGE INTO tgt USING src ON tgt.k = src.k
         WHEN MATCHED THEN UPDATE SET v = 1""",
      Map("tgt" -> t, "src" -> s)))
  }

  test("updateSql: pre-update row semantics (swap), function-call SET, loud unknowns") {
    import spark.implicits._
    val t = Seq((1L, 10.0, 20.0), (2L, 30.0, 40.0)).toDF("k", "a", "b")
    // ANSI UPDATE evaluates every RHS against the OLD row: a swap works
    val swapped = Graft.updateSql(spark,
      "UPDATE t SET a = b, b = a WHERE k = 1", Map("t" -> t))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(swapped(1L) == ((20.0, 10.0)), "swap needs old-row RHS")
    assert(swapped(2L) == ((30.0, 40.0)), "non-matching rows untouched")
    // a function call with commas inside SET parses (top-level split)
    val fn = Graft.updateSql(spark,
      "UPDATE t SET a = round(a + 0.4, 0), b = greatest(b, 35.0) WHERE k = 2",
      Map("t" -> t)).collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(fn(2L) == ((30.0, 40.0)), fn.toString)
    assert(fn(1L) == ((10.0, 20.0)))
    intercept[Exception](Graft.updateSql(spark,
      "UPDATE t SET nosuch = 1 WHERE k = 1", Map("t" -> t)))
  }

  test("deleteSql: TRUE rows removed, NULL-condition rows survive") {
    import spark.implicits._
    val t = Seq((1L, Some(5.0)), (2L, Some(50.0)), (3L, None))
      .toDF("k", "v")
    val out = Graft.deleteSql(spark,
      "DELETE FROM t WHERE v > 10", Map("t" -> t))
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 3L), "NULL condition must survive an ANSI DELETE")
  }

  test("insertSql: VALUES, SELECT form, column-list NULL-fill, loud rejects") {
    import spark.implicits._
    val t = Seq((1, "a", 1.5), (2, "b", 2.5)).toDF("k", "s", "v")
    // VALUES form, full row, literal coercion to target types
    val ins = Graft.insertSql(spark,
      "INSERT INTO t VALUES (3, 'c', 3.5), (4, 'd', 4.5)", Map("t" -> t))
    assert(ins.as[(Int, String, Double)].collect().toSet
      === Set((1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5), (4, "d", 4.5)))
    // column list: positional bind, unnamed columns NULL-fill
    val part = Graft.insertSql(spark,
      "INSERT INTO t (v, k) VALUES (9.9, 9)", Map("t" -> t))
    val r9 = part.filter(col("k") === 9).collect().head
    assert(r9.isNullAt(r9.fieldIndex("s")) && r9.getDouble(2) == 9.9)
    // SELECT form resolves other frames from the map
    val src = Seq((7, "g", 7.5)).toDF("a", "b", "c")
    val sel = Graft.insertSql(spark,
      "INSERT INTO t SELECT a, b, c FROM u", Map("t" -> t, "u" -> src))
    assert(sel.count() === 3 && sel.filter(col("k") === 7).count() === 1)
    // rejects: unknown table, unknown column, arity mismatch, shape
    intercept[Exception](Graft.insertSql(spark,
      "INSERT INTO nope VALUES (1, 'x', 0.0)", Map("t" -> t)))
    intercept[Exception](Graft.insertSql(spark,
      "INSERT INTO t (zz) VALUES (1)", Map("t" -> t)))
    intercept[Exception](Graft.insertSql(spark,
      "INSERT INTO t VALUES (1, 'x')", Map("t" -> t)))
    intercept[Exception](Graft.insertSql(spark,
      "UPSERT INTO t VALUES (1, 'x', 0.0)", Map("t" -> t)))
    // duplicate target columns: ANSI rejects; pre-r15 the positional
    // map last-won silently, binding one value and dropping the other
    val dup = intercept[IllegalArgumentException](Graft.insertSql(spark,
      "INSERT INTO t (k, K) VALUES (1, 2)", Map("t" -> t)))
    assert(dup.getMessage.contains("duplicate"), dup.getMessage)
  }

  test("replace=false refuses to shadow an existing view") {
    import spark.implicits._
    val a = Seq(1).toDF("x")
    val b = Seq(2).toDF("x")
    Graft.sql(spark, "SELECT * FROM shadowed", Map("shadowed" -> a))
    intercept[Exception] {
      Graft.sql(spark, "SELECT * FROM shadowed", Map("shadowed" -> b),
        replace = false)
    }
    // original registration untouched
    assert(spark.sql("SELECT x FROM shadowed").head().getInt(0) === 1)
  }
}
