package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.tables.TableLoader

/** S5 CSV/JSON sources and F10 struct/map literals + field access —
  * the ScalaTest-only rows of SURVEY.md §2 (CSV/JSON have no fixture
  * data; nested literals don't round-trip DuckDB's text formatting).
  */
class SourcesAndLiteralsSpec extends SparkTestBase {

  test("S5: CSV round-trips with explicit schema (the at-scale path)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("csvsrc").toString + "/out"
    val src = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "g,amma", -3.0))
      .toDF("id", "name", "score")
    src.write.option("header", "true").csv(dir)

    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val back = TableLoader.loadCsv(spark, dir, Some(schema))
    assert(back.schema === schema)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      === src.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet,
      "quoted comma survives the round trip")
  }

  test("S5: JSON-lines round-trips and infers nested fields") {
    import spark.implicits._
    val dir = Files.createTempDirectory("jsonsrc").toString + "/out"
    Seq((1L, "a", Seq(1, 2)), (2L, "b", Seq(3)))
      .toDF("id", "tag", "xs").write.json(dir)
    val back = TableLoader.loadJson(spark, dir)
    assert(back.select(sum(size(col("xs")))).head.getLong(0) === 3L)
    assert(back.count() === 2)
  }

  test("S5: ORC round-trips with pushdown-friendly types") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-orc").toFile.getPath + "/t"
    val df = spark.read.parquet(s"$sfDir/nation.parquet")
    df.write.orc(dir)
    val back = TableLoader.loadOrc(spark, dir)
    assert(back.schema === df.schema)
    assert(back.orderBy("n_nationkey").collect()
      === df.orderBy("n_nationkey").collect())
    // filters reach the ORC scan like parquet's
    val plan = back.filter(col("n_nationkey") === 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_nationkey"), plan)
  }

  test("S5: parquet mergeSchema reads evolved schemas, nulls for old files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-merge").toFile.getPath + "/t"
    // v1 files lack the `source` column that v2 adds
    Seq((1L, "a"), (2L, "b")).toDF("id", "text").write.parquet(dir)
    Seq((3L, "c", "web")).toDF("id", "text", "source")
      .write.mode("append").parquet(dir)
    val merged = TableLoader.loadParquetMerged(spark, dir)
      .orderBy("id").select("id", "text", "source")
      .as[(Long, String, Option[String])].collect().toSeq
    assert(merged === Seq((1L, "a", None), (2L, "b", None), (3L, "c", Some("web"))))
    // the default (non-merged) read still works off one footer
    assert(spark.read.parquet(dir).count() === 3)
  }

  test("F10: struct literals, field access, and nested projection") {
    import spark.implicits._
    val df = Seq((1L, "x", 2.0), (2L, "y", 3.0)).toDF("id", "name", "v")
      .withColumn("s", struct(col("name").as("n"), (col("v") * 2).as("v2")))
    assert(df.select(col("s.n")).collect().map(_.getString(0)).toSeq === Seq("x", "y"))
    assert(df.select(col("s").getField("v2")).collect().map(_.getDouble(0)).toSeq
      === Seq(4.0, 6.0))
    // SQL side: named_struct literal + dot access
    val viaSql = spark.sql(
      "SELECT named_struct('a', 1, 'b', 'z').a AS a_val").head.getInt(0)
    assert(viaSql === 1)
  }

  test("F10: map literals, lookup, keys/values, and map_concat") {
    import spark.implicits._
    val df = Seq(1, 2).toDF("id")
      .withColumn("m", map(lit("k1"), col("id") * 10, lit("k2"), col("id") * 100))
    assert(df.select(col("m").getItem("k1")).collect().map(_.getInt(0)).toSeq
      === Seq(10, 20))
    assert(df.select(map_keys(col("m"))).head.getSeq[String](0).sorted
      === Seq("k1", "k2"))
    val merged = df.select(
      map_concat(col("m"), map(lit("k3"), lit(7))).as("mm"))
    assert(merged.select(col("mm").getItem("k3")).head.getInt(0) === 7)
    // SQL map literal
    assert(spark.sql("SELECT map('a', 1)['a'] AS v").head.getInt(0) === 1)
  }

  test("U3 unit: ngrams generator emits positioned n-grams, skips short docs") {
    import spark.implicits._
    graft.functions.NGramsGenerator.register(spark)
    val df = Seq((1L, "a b c d"), (2L, "solo")).toDF("doc_id", "text")
    df.createOrReplaceTempView("ngram_docs")
    val out = spark.sql("""
      SELECT doc_id, pos, ngram FROM ngram_docs
      LATERAL VIEW ngrams(split(text, ' '), 3) t AS pos, ngram""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq === Seq((1L, 1L, "a b c"), (1L, 2L, "b c d")),
      "trigrams with 1-based positions; 1-token doc emits nothing")
  }
}
