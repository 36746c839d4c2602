package graft

import org.apache.spark.sql.functions._

import graft.operators.Salting

/** Salting must be a pure re-shaping of the shuffle: identical results
  * to the unsalted plan, with the hot key demonstrably spread over
  * multiple salt values.
  */
class SaltingSpec extends SparkTestBase {

  /** 10_000 rows of hot key 1, a few rows each for keys 2..50. */
  private def skewed = {
    import spark.implicits._
    ((1 to 10000).map(i => (1L, i.toDouble)) ++
      (2 to 50).flatMap(k => (1 to 5).map(i => (k.toLong, i.toDouble))))
      .toDF("k", "v")
  }

  private def dim = {
    import spark.implicits._
    (1 to 50).map(k => (k.toLong, s"name$k")).toDF("k", "name")
  }

  test("saltedJoin == plain join, row for row") {
    val plain = skewed.join(dim, Seq("k")).select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val salted = Salting.saltedJoin(skewed, dim, Seq("k"), numSalts = 8)
      .select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(salted.sorted.toSeq === plain.sorted.toSeq)
  }

  test("saltedAgg == plain agg for algebraic aggregates") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Salting.saltedAgg(skewed, Seq("k"), numSalts = 8,
      partial = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      merge = Seq(sum("ps").as("s"), sum("pn").as("n")))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("saltedJoin works for left/semi/anti, rejects right/full outer") {
    // left join against a dim missing keys 40..50: unmatched LEFT rows
    // survive exactly once (small-side replication cannot duplicate them)
    val partialDim = dim.filter(col("k") <= 40)
    val plain = skewed.join(partialDim, Seq("k"), "left")
      .select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val salted = Salting.saltedJoin(skewed, partialDim, Seq("k"), 8, "left")
      .select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(salted.sortBy(t => (t._1, t._2)).toSeq ===
      plain.sortBy(t => (t._1, t._2)).toSeq)
    // right/full would replicate unmatched small-side rows per salt:
    // the API refuses instead of silently breaking the identity
    for (how <- Seq("right", "full", "full_outer")) {
      val e = intercept[IllegalArgumentException] {
        Salting.saltedJoin(skewed, dim, Seq("k"), 8, how)
      }
      assert(e.getMessage.contains("result-identical"), how)
    }
  }

  test("the hot key actually spreads across salts") {
    import spark.implicits._
    // reproduce the internal salting: hot key rows must not collapse
    // onto one salt value (that would defeat the whole point)
    val s = skewed.withColumn("_salt",
      pmod(xxhash64(struct(skewed.columns.map(col): _*)), lit(8)).cast("int"))
    val spread = s.filter($"k" === 1L).select("_salt").distinct().count()
    assert(spread >= 6, s"hot key spread over only $spread of 8 salts")
  }
}
