package graft

import org.apache.spark.sql.functions._
import graft.operators.Cdc

/** CDC changelog merge: insert/update/delete semantics, the
  * change-beats-base tie rule, and the loud duplicate-version guard.
  */
class CdcSpec extends SparkTestBase {

  private def base = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v").withColumn("version", lit(0L))
  }

  test("upsert + delete + insert-new-key merge to the latest snapshot") {
    import spark.implicits._
    val changes = Seq(
      (2L, "b2", 21.0, 1L, false), // update existing
      (3L, "c", 30.0, 1L, true),   // delete existing
      (4L, "d", 40.0, 1L, false),  // insert brand-new key
      (2L, "b3", 22.0, 2L, false), // second generation wins over first
    ).toDF("k", "s", "v", "version", "is_delete")
    val got = Cdc.applyChangelog(base, changes, Seq("k"), "version")
      .select("k", "s", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    assert(got.toSeq === Seq((1L, "a", 10.0), (2L, "b3", 22.0), (4L, "d", 40.0)))
  }

  test("at equal version the changelog row beats the base row") {
    import spark.implicits._
    val changes = Seq((1L, "a-fixed", 11.0, 0L, false))
      .toDF("k", "s", "v", "version", "is_delete")
    val got = Cdc.applyChangelog(base, changes, Seq("k"), "version")
      .filter(col("k") === 1L).select("s", "v").collect().head
    assert(got.getString(0) === "a-fixed" && got.getDouble(1) === 11.0)
  }

  test("schema hygiene: output carries base schema; guards fire loudly") {
    import spark.implicits._
    val changes = Seq((2L, "x", 0.0, 1L, false))
      .toDF("k", "s", "v", "version", "is_delete")
    val out = Cdc.applyChangelog(base, changes, Seq("k"), "version")
    assert(out.columns.toSeq === Seq("k", "s", "v", "version"))
    // base with a tombstone column is a caller bug
    intercept[IllegalArgumentException] {
      Cdc.applyChangelog(base.withColumn("is_delete", lit(false)),
        changes, Seq("k"), "version")
    }
    // duplicate (key, version) in the changelog is a contract breach
    val dup = changes.unionByName(
      Seq((2L, "y", 1.0, 1L, false)).toDF("k", "s", "v", "version", "is_delete"))
    intercept[IllegalArgumentException] {
      Cdc.requireUniqueVersions(dup, Seq("k"), "version")
    }
    Cdc.requireUniqueVersions(changes, Seq("k"), "version") // clean passes
  }

  test("diffSnapshots classifies insert/update/delete; identical rows silent") {
    import spark.implicits._
    val before = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val after = Seq((1L, "a", 10.0), (2L, "b2", 20.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val got = Cdc.diffSnapshots(before, after, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3))).sortBy(_._1)
    assert(got.toSeq === Seq(
      (2L, "update", "b2", 20.0), // after values
      (3L, "delete", "c", 30.0),  // before values
      (4L, "insert", "d", 40.0)))
    // self-diff is empty
    assert(Cdc.diffSnapshots(before, before, Seq("k")).count() === 0L)
  }

  test("diff then apply round-trips: applyChangelog(before, diff) == after") {
    import spark.implicits._
    val before = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val after = Seq((2L, "b2", 21.0), (3L, "c", 30.0), (5L, "e", 50.0))
      .toDF("k", "s", "v")
    val diff = Cdc.diffSnapshots(before, after, Seq("k"))
    val changelog = diff
      .withColumn("version", lit(1L))
      .withColumn("is_delete", col("op") === "delete")
      .drop("op")
    val rebuilt = Cdc.applyChangelog(
        before.withColumn("version", lit(0L)), changelog, Seq("k"), "version")
      .drop("version")
    assert(rebuilt.exceptAll(after).count() === 0L)
    assert(after.exceptAll(rebuilt).count() === 0L)
  }

  test("streaming upsert: foreachBatch applies changelog micro-batches to parquet") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // the production shape: a CDC stream materialized onto storage by
    // merging each micro-batch into the parquet target
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString + "/target"
    base.write.mode("overwrite").parquet(dir)

    val input = MemoryStream[(Long, String, Double, Long, Boolean)]
    val q = input.toDF()
      .toDF("k", "s", "v", "version", "is_delete")
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val merged = Cdc.applyChangelog(
          spark.read.parquet(dir), batch, Seq("k"), "version")
        // two-phase write: parquet can't overwrite its own input mid-read
        val staged = merged.collect()
        spark.createDataFrame(
          spark.sparkContext.parallelize(staged.toIndexedSeq), merged.schema)
          .write.mode("overwrite").parquet(dir)
        ()
      }.start()
    input.addData((2L, "b2", 21.0, 1L, false), (3L, "c", 30.0, 1L, true))
    q.processAllAvailable()
    input.addData((2L, "b3", 22.0, 2L, false), (4L, "d", 40.0, 1L, false))
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(dir)
      .select("k", "s", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    assert(got.toSeq === Seq((1L, "a", 10.0), (2L, "b3", 22.0), (4L, "d", 40.0)),
      "micro-batch merges must compose to the full-changelog result")
  }

  test("idempotent: re-applying the same changelog changes nothing") {
    import spark.implicits._
    val changes = Seq(
      (2L, "b2", 21.0, 1L, false), (3L, "c", 30.0, 1L, true),
    ).toDF("k", "s", "v", "version", "is_delete")
    val once = Cdc.applyChangelog(base, changes, Seq("k"), "version")
    val twice = Cdc.applyChangelog(once, changes, Seq("k"), "version")
    assert(once.exceptAll(twice).count() === 0L)
    assert(twice.exceptAll(once).count() === 0L)
  }
}
