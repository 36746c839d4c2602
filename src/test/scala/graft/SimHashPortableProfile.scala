package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler: portable-simhash signature formulations (dev tool).
  * Variant B restates the same per-bit vote math with the bit loop
  * OUTSIDE the token fold (no per-token 60-array allocation).
  *
  * RESULT (sf0.1, recorded 2026-08-12): B computes the signature alone
  * 2x faster (0.14 s vs 0.26 s) but the FULL pigeonhole pipeline blows
  * up to ~12 s vs A's ~1.5 s. Not projection re-evaluation: moving the
  * chunk-key math after the explode (so the Generate child materializes
  * the signature once) changed nothing for either variant. The
  * remaining explanation is evaluation mode: HOFs run interpreted, and
  * B's nested fold (an inner per-bit aggregate dispatched per outer
  * step, with lambda-variable rebinding) costs far more per evaluation
  * in the join-heavy plan than A's flat zip_with loop. The zip_with
  * formulation in Dedup.simHashPortable stays; lesson: under
  * interpreted HOF evaluation, prefer one flat fold over nested
  * per-element lambda dispatch, and profile the full pipeline, not the
  * signature projection alone.
  */
object SimHashPortableProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 1000)
    docs.count()

    def time(name: String)(body: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$name%-22s min ${ts.map(_._1).min}%6.2f s  " +
        f"runs ${ts.map(t => f"${t._1}%.2f").mkString(" ")}  (${ts.head._2} rows)")
    }

    // current: zip_with 60-slot accumulator per token
    time("A zip_with fold")(
      graft.operators.Dedup.simHashPortable(docs, "doc_id", "text")
        .agg(sum(col("simhash"))).count())

    // candidate: hashes once, then bit-major scalar folds
    val b = docs.select(col("doc_id"),
      expr("""transform(split(lower(text), ' '),
              t -> cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint))""").as("hs"))
      .select(col("doc_id"),
        expr("""aggregate(sequence(0, 59), cast(0 as bigint),
                (sig, b) -> sig + IF(
                  aggregate(hs, cast(0 as bigint),
                    (s, h) -> s + IF((shiftright(h, b) & 1) = 1, 1, -1)) >= 0,
                  shiftleft(cast(1 as bigint), b), cast(0 as bigint)))""").as("simhash"))
    time("B bit-major fold")(b.agg(sum(col("simhash"))).count())

    // equality check
    val diff = graft.operators.Dedup.simHashPortable(docs, "doc_id", "text")
      .as("x").join(b.as("y"), "doc_id")
      .filter(col("x.simhash") =!= col("y.simhash")).count()
    println(s"signature mismatches: $diff")

    // full judged pipeline on each signature
    time("A full pipeline")(
      graft.operators.Dedup.simHashNearDupFromSigs(
        graft.operators.Dedup.simHashPortable(docs, "doc_id", "text"),
        maxHamming = 4, sigBits = 60).count())
    time("B full pipeline")(
      graft.operators.Dedup.simHashNearDupFromSigs(b,
        maxHamming = 4, sigBits = 60).count())
    spark.stop()
  }
}
