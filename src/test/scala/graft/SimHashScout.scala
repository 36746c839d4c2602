package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch scout (dev tool, not a spec): measures the SimHash hamming
  * separation between true near-dup pairs (exact Jaccard >= tau) and
  * everything else on the documents fixture, to pick a judged radius
  * for q_dedup_simhash (the bounded exact-regime honesty pattern).
  */
object SimHashScout {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 1000)

    import graft.operators.Dedup
    val sigs = Dedup.simHash(docs, "doc_id", "text")
    val popcount = (x: org.apache.spark.sql.Column) =>
      (0 until 64).map(b => shiftright(x, b).bitwiseAND(1)).reduce(_ + _)
    val allPairs = sigs.as("a").join(sigs.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        popcount(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))

    val exact = Dedup.nearJaccard(docs, "doc_id", "text", 0.0)
      .select(col("i"), col("j"), col("jaccard"))

    val joined = allPairs.join(exact, Seq("i", "j"), "left")
      .na.fill(0.0, Seq("jaccard"))

    println("== hamming distribution for jaccard >= 0.95 (true near-dups) ==")
    joined.filter(col("jaccard") >= 0.95)
      .groupBy("hamming").count().orderBy("hamming").show(50)
    println("== lowest hammings among jaccard < 0.95 pairs ==")
    joined.filter(col("jaccard") < 0.95)
      .groupBy("hamming").count().orderBy("hamming").show(15)
    println("== pairs in the 'gap' (hamming <= 12, jaccard < 0.95): jaccard values ==")
    joined.filter(col("jaccard") < 0.95 && col("hamming") <= 12)
      .orderBy("hamming").show(30)
    spark.stop()
  }
}
