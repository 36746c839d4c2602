package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the LSH dedup stages (dev tool, not a spec). */
object LshProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 1000)
    docs.count() // warm

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }

    import graft.operators.Dedup
    time("tokens+distinct")(Dedup.tokens(docs, "doc_id", "text").count())
    time("signatures 32")(Dedup.minHashSignatures(docs, "doc_id", "text", 32).count())
    time("signatures 24")(Dedup.minHashSignatures(docs, "doc_id", "text", 24).count())
    time("candidates 8x4")(Dedup.minHashLshCandidates(docs, "doc_id", "text", 8, 4).count())
    time("candidates 8x3")(Dedup.minHashLshCandidates(docs, "doc_id", "text", 8, 3).count())
    time("full lsh 8x4")(Dedup.minHashLshNearDup(docs, "doc_id", "text", 0.95, 8, 4).count())
    time("full lsh 8x3")(Dedup.minHashLshNearDup(docs, "doc_id", "text", 0.95, 8, 3).count())
    time("exact prefix")(Dedup.nearJaccardPrefix(docs, "doc_id", "text", 0.95).count())
    spark.stop()
  }
}
