package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.IvfIndex

object IvfProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    emb.count() // warm scan
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name%-20s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val centroids = time("train k=8 it=3")(
      IvfIndex.train(emb, "vec_id", "embedding", k = 8, iters = 3, seed = 42L))
    val assigned = IvfIndex.assign(emb, "vec_id", "embedding", centroids)
    time("search np=8 k=5")(
      IvfIndex.search(assigned, emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", centroids, nprobe = 8, topK = 5).count())
    time("train it=1")(
      IvfIndex.train(emb, "vec_id", "embedding", k = 8, iters = 1, seed = 42L))
    spark.stop()
  }
}
