package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Hive-style partitioned layout: writes partition directories and
  * proves partition PRUNING — a filtered read must touch only the
  * matching directories (PartitionFilters at the scan, not a post-scan
  * filter). At 100 TB this is the first line of defense: a lang='en'
  * query over a lang-partitioned corpus never opens the other
  * languages' files.
  */
class PartitioningSpec extends SparkTestBase {

  test("partitioned write prunes directories on filtered read") {
    val dir = Files.createTempDirectory("part").toString + "/docs"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.write.partitionBy("lang").parquet(dir)

    // layout: one directory per lang value
    val langDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("lang=")).map(_.getName).toSet
    val langs = docs.select("lang").distinct()
      .collect().map(r => s"lang=${r.getString(0)}").toSet
    assert(langDirs === langs)

    val filtered = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*lang[^\\]]*\\].*"),
      s"lang filter did not reach partition pruning:\n$plan")
    // pruning proof: the scan's file listing covers ONLY the en dir
    val scannedFiles = filtered.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(scannedFiles.nonEmpty && scannedFiles.forall(_.contains("lang=en")),
      s"scan read non-matching partitions: ${scannedFiles.take(3).mkString(",")}")

    // correctness unchanged by the layout
    assert(filtered.count() === docs.filter(col("lang") === "en").count())
    // partition column round-trips (moved to directory, restored on read)
    assert(spark.read.parquet(dir).columns.toSet === docs.columns.toSet)
  }
}
