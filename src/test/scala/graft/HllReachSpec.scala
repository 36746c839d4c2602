package graft

import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.HllReach

/** HLL reach sketches (the HyperANF building block) and the
  * harmonicCentralityApprox dual built on them. */
class HllReachSpec extends SparkTestBase {
  import spark.implicits._

  private def sketchOf(keys: Seq[Long], p: Int): Array[Byte] = {
    val reg = new Array[Byte](1 << p)
    keys.foreach(k =>
      HllReach.insertHashed(reg, p, XxHash64Function.hash(k, LongType, HllReach.Seed)))
    reg
  }

  test("estimator accuracy: within 3*1.04/sqrt(m) across 3 decades at p=12") {
    for (n <- Seq(100, 1000, 10000, 100000)) {
      val est = HllReach.estimate(sketchOf((1L to n.toLong), 12))
      val rel = math.abs(est - n) / n
      assert(rel < 3 * 1.04 / math.sqrt(1 << 12),
        s"n=$n est=$est rel=$rel")
    }
  }

  test("union is idempotent/commutative and equals the sketch of the union set") {
    val p = 10
    val a = sketchOf(1L to 500L, p)
    val b = sketchOf(250L to 800L, p)
    val ab = sketchOf(1L to 800L, p)
    val merged = a.clone()
    b.indices.foreach { i =>
      if ((b(i) & 0xff) > (merged(i) & 0xff)) merged(i) = b(i)
    }
    assert(merged.sameElements(ab), "union of sketches != sketch of union")
    // idempotence: unioning a into itself changes nothing
    val aa = a.clone()
    a.indices.foreach { i => if ((a(i) & 0xff) > (aa(i) & 0xff)) aa(i) = a(i) }
    assert(aa.sameElements(a))
  }

  test("hllInit + hllUnion aggregate is partitioning-independent and accurate") {
    val n = 5000
    val df = spark.range(1, n + 1).toDF("id")
      .withColumn("reg", HllReach.hllInit(col("id"), 12))
    def est(parts: Int): Double =
      df.repartition(parts)
        .agg(HllReach.hllUnion(col("reg"), 12).as("u"))
        .select(HllReach.hllCount(col("u")))
        .as[Double].head()
    val e1 = est(1)
    val e7 = est(7)
    assert(e1 == e7, s"estimate must not depend on partitioning: $e1 vs $e7")
    assert(math.abs(e1 - n) / n < 0.05, s"n=$n est=$e1")
  }

  test("harmonicCentralityApprox matches exact twin on hand fixtures (linear-counting regime)") {
    // tiny balls sit deep in linear counting: estimates are near-exact
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("s", "d")
    val approx = graft.operators.Graph.harmonicCentralityApprox(path, "s", "d")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val exact = Map("a" -> 1.5, "b" -> 2.5, "c" -> 2.5, "d" -> 1.5)
    exact.foreach { case (v, h) =>
      assert(math.abs(approx(v) - h) < 0.02, s"$v: approx=${approx(v)} exact=$h")
    }
  }

  test("harmonicCentralityApprox vs exact at judged SF: mean relative error < 2%") {
    val spark0 = spark
    graft.tables.TableLoader.registerAll(spark0, sfDir)
    val edges = graft.queries.GraphOps.coOrderParts(spark0, sfDir, 5)
    val exact = graft.operators.Graph.harmonicCentrality(edges, "a", "b", maxHops = 2)
      .select(col("vertex"), col("harmonic").as("h_exact"))
    val approx = graft.operators.Graph.harmonicCentralityApprox(edges, "a", "b",
        maxHops = 2, p = 12)
      .select(col("vertex"), col("harmonic").as("h_approx"))
    val joined = exact.join(approx, Seq("vertex"))
      .select(abs(col("h_approx") - col("h_exact")) / col("h_exact"))
      .as[Double].collect()
    assert(joined.nonEmpty, "no vertices compared")
    val meanRel = joined.sum / joined.length
    assert(meanRel < 0.02, s"mean relative error $meanRel over ${joined.length} vertices")
    assert(joined.max < 0.10, s"max relative error ${joined.max}")
  }
}
