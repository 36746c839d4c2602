package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B profiler for closing the LSH-vs-exact gap (dev tool). */
object LshVariants {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 1000)
    docs.count()

    import graft.operators.Dedup
    def time(name: String)(body: => Long): Unit = {
      // min of 3: steady-state estimate per variant
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$name%-24s min ${ts.map(_._1).min}%6.2f s  " +
        f"runs ${ts.map(t => f"${t._1}%.2f").mkString(" ")}  (${ts.head._2} rows)")
    }

    time("lsh 8x3 (r3 params)")( // judged/bench params are 12x6 since r4
      Dedup.minHashLshNearDup(docs, "doc_id", "text", 0.95, 8, 3).count())
    time("lsh 7x3")(
      Dedup.minHashLshNearDup(docs, "doc_id", "text", 0.95, 7, 3).count())
    time("lsh 6x3")(
      Dedup.minHashLshNearDup(docs, "doc_id", "text", 0.95, 6, 3).count())
    time("lsh 8x4")(
      Dedup.minHashLshNearDup(docs, "doc_id", "text", 0.95, 8, 4).count())
    time("lsh 10x5")(
      Dedup.minHashLshNearDup(docs, "doc_id", "text", 0.95, 10, 5).count())
    time("lsh 12x6")(
      Dedup.minHashLshNearDup(docs, "doc_id", "text", 0.95, 12, 6).count())
    time("exact prefix")(
      Dedup.nearJaccardPrefix(docs, "doc_id", "text", 0.95).count())
    spark.stop()
  }
}
