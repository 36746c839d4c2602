package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, Similarity}

/** IVF ANN: deterministic training, pruned search, recall against the
  * exact probe search it approximates. Clustered fixture mirrors
  * SimilaritySpec's (seeded, so every outcome is pinned).
  */
class IvfIndexSpec extends SparkTestBase {

  private lazy val clustered: DataFrame = {
    import spark.implicits._
    val rng = new scala.util.Random(7L)
    val rows = (0 until 30).flatMap { c =>
      val base = Array.fill(64)(rng.nextGaussian().toFloat)
      (0 until 4).map { p =>
        val v = base.map(x => x + (if (p == 0) 0f else rng.nextGaussian().toFloat * 0.05f))
        (c * 4L + p, v.toSeq)
      }
    }
    rows.toDF("vec_id", "embedding")
  }

  test("IVF search recall vs exact probe search on clustered vectors") {
    val centroids = IvfIndex.train(clustered, "vec_id", "embedding",
      k = 30, iters = 3, seed = 42L)
    assert(centroids.length === 30)
    // training is deterministic: same seed => identical centroids
    val again = IvfIndex.train(clustered, "vec_id", "embedding",
      k = 30, iters = 3, seed = 42L)
    assert(centroids.map(_._2.toSeq).toSeq === again.map(_._2.toSeq).toSeq)

    val assigned = IvfIndex.assign(clustered, "vec_id", "embedding", centroids)
    val probes = clustered.filter(col("vec_id") % 4 === 0) // cluster reps

    val ivf = IvfIndex.search(assigned, probes, "vec_id", "embedding",
        centroids, nprobe = 2, topK = 3)
      .select("probe_id", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.probeSearch(clustered, probes,
        "vec_id", "embedding", k = 3)
      .select("probe_id", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (ivf intersect exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF nprobe=2 recall $recall vs exact top-3")
  }

  test("IVF scans only the probed cells, not the corpus") {
    val centroids = IvfIndex.train(clustered, "vec_id", "embedding",
      k = 30, iters = 3, seed = 42L)
    val assigned = IvfIndex.assign(clustered, "vec_id", "embedding", centroids)
    // every vector lands in exactly one cell; cells partition the corpus
    assert(assigned.count() === 120)
    assert(assigned.select("cluster").distinct().count() > 1)
    val cellSizes = assigned.groupBy("cluster").count()
      .agg(max("count")).head.getLong(0)
    assert(cellSizes <= 40, "no degenerate giant cell on clustered data")

    // candidate volume: one probe x nprobe=1 joins at most the largest
    // cell, far below the full corpus
    val probe = clustered.filter(col("vec_id") === 0L)
    val candidates = IvfIndex.search(assigned, probe, "vec_id", "embedding",
      centroids, nprobe = 1, topK = 1000)
    assert(candidates.count() < 120, "search must not touch the whole corpus")
  }
}
