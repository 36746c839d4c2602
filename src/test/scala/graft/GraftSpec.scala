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
