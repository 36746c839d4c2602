package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** IVF (inverted-file) approximate nearest neighbor: the second scale
  * path next to hyperplane LSH (Similarity.lshCosinePairs).
  *
  *  1. Train `k` coarse centroids with seeded deterministic k-means
  *     (Lloyd iterations as DataFrame jobs; only the k×dim centroid
  *     table ever reaches the driver — the corpus does not).
  *  2. Assign every corpus vector to its nearest centroid (one
  *     broadcast-kernel pass; the assignment is the "inverted file").
  *  3. Serve probes by scanning only the `nprobe` nearest centroid
  *     cells instead of the whole corpus — recall/cost dial, exact
  *     cosine inside the probed cells.
  *
  * At 100 TB: centroids are KBs (broadcast), assignment is a linear
  * map-only pass, and a probe touches nprobe/k of the data. All
  * randomness is seed-derived (centroid init = smallest seeded hash),
  * so train/assign/search reproduce bit-for-bit across runs/retries.
  */
object IvfIndex {

  /** Deterministic k-means over the embedding column; returns the
    * local centroid table as (clusterId -> unit-normalized vector).
    * Init picks the k vectors with smallest xxhash64(id, seed) —
    * seeded, data-independent spread.
    *
    * Training runs on a bounded deterministic sample (the
    * `maxTrainRows` smallest seeded hashes — a per-task k-heap via
    * TakeOrderedAndProject, never a full sort), the standard IVF
    * recipe: coarse codebooks need a representative sample, not the
    * corpus, so training cost is CONSTANT in corpus size while
    * assign/search stay full-corpus. The sample persists across Lloyd
    * iterations — one parquet scan total instead of one per iteration.
    */
  def train(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 5, seed: Long = 42L,
      maxTrainRows: Int = 10000): Array[(Int, Array[Double])] = {
    require(k >= 1 && iters >= 0 && maxTrainRows >= k)
    val sample = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("_h", xxhash64(col("id"), lit(seed)))
      .orderBy("_h").limit(maxTrainRows)
      .persist()

    def normalize(a: Array[Double]): Array[Double] = {
      val n = math.sqrt(a.map(x => x * x).sum)
      if (n == 0) a else a.map(_ / n)
    }
    try {
      // init = the k smallest hashes: the head of the SAME sample, so
      // no separate job beyond the sample's own materialization
      var centroids: Array[(Int, Array[Double])] = sample
        .orderBy("_h").limit(k)
        .collect().zipWithIndex
        .map { case (r, i) =>
          i -> normalize(r.getSeq[Float](1).map(_.toDouble).toArray)
        }

      for (_ <- 0 until iters) {
        val assignUdf = assigner(centroids)
        // per-cluster per-dimension means: posexplode keeps this a plain
        // (cluster, dim) hash aggregation — no vectors collect
        val means = sample.withColumn("cl", assignUdf(col("v")))
          .select(col("cl"), posexplode(col("v")).as(Seq("dim", "x")))
          .groupBy("cl", "dim").agg(avg(col("x")).as("m"))
          .collect().groupBy(_.getInt(0))
        centroids = centroids.map { case (cid, old) =>
          means.get(cid) match {
            case Some(rows) =>
              val m = new Array[Double](old.length)
              rows.foreach(r => m(r.getInt(1)) = r.getDouble(2))
              cid -> normalize(m)
            case None => cid -> old // empty cell keeps its centroid
          }
        }
      }
      centroids
    } finally sample.unpersist()
  }

  /** Persist a trained codebook: (cluster_id, centroid) rows in
    * parquet — k×dim doubles, centroid-sized by construction. At steady
    * state an IVF deployment trains once, saves, and every ingest/query
    * session [[loadCentroids]] instead of re-running Lloyd sweeps.
    */
  def saveCentroids(spark: org.apache.spark.sql.SparkSession,
      centroids: Array[(Int, Array[Double])], path: String): Unit = {
    import spark.implicits._
    centroids.toSeq.map { case (cid, c) => (cid, c.toSeq) }
      .toDF("cluster_id", "centroid")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
    FixtureMeta.write(spark, path, centroids.length,
      FixtureMeta.combine(centroids.iterator.map(centroidHash)))
  }

  /** Exact canonical hash of one codebook row (doubles via raw bits —
    * a 1-ulp drift flips it). */
  private def centroidHash(c: (Int, Array[Double])): Long =
    FixtureMeta.rowHash(
      c._1 + ":" + c._2.map(java.lang.Double.doubleToRawLongBits).mkString(","))

  /** Reload a codebook saved by [[saveCentroids]]; assign/search on the
    * reloaded centroids are bit-identical to the training session's
    * (doubles round-trip parquet exactly).
    */
  def loadCentroids(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[(Int, Array[Double])] = {
    val loaded = spark.read.parquet(path)
      .select(col("cluster_id"), col("centroid"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    // integrity gate against the save-time sidecar (no-op when absent)
    FixtureMeta.check(spark, path, loaded.length,
      FixtureMeta.combine(loaded.iterator.map(centroidHash)))
    loaded
  }

  /** Best-cluster UDF over broadcast centroids (cosine; ties to the
    * lowest cluster id). Centroids are unit vectors, so the dot
    * product ranks identically to cosine.
    */
  private def assigner(centroids: Array[(Int, Array[Double])]) = udf {
    (v: Seq[Float]) =>
      var best = -1; var bestDot = Double.NegativeInfinity
      centroids.foreach { case (cid, c) =>
        var d = 0.0; var i = 0
        while (i < c.length && i < v.length) { d += c(i) * v(i); i += 1 }
        if (d > bestDot || (d == bestDot && cid < best)) { best = cid; bestDot = d }
      }
      best
  }

  /** Top-`nprobe` cluster ids for a probe vector, nearest first. */
  private def prober(centroids: Array[(Int, Array[Double])], nprobe: Int) = udf {
    (v: Seq[Float]) =>
      centroids.map { case (cid, c) =>
        var d = 0.0; var i = 0
        while (i < c.length && i < v.length) { d += c(i) * v(i); i += 1 }
        (cid, d)
      }.sortBy { case (cid, d) => (-d, cid) }.take(nprobe).map(_._1)
  }

  /** The inverted file: corpus rows tagged with their cell. */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
      centroids: Array[(Int, Array[Double])]): DataFrame =
    emb.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
      .withColumn("cluster", assigner(centroids)(col("cv")))

  /** Top-`topK` corpus neighbors per probe, scanning only the
    * `nprobe` nearest cells per probe: probes explode to (probe,
    * cluster) pairs and equi-join the inverted file — the pruned
    * replacement for probeSearch's full corpus pass.
    */
  def search(assigned: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, centroids: Array[(Int, Array[Double])],
      nprobe: Int, topK: Int): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"))
      .withColumn("cluster", explode(prober(centroids, nprobe)(col("pv"))))
    val w = Window.partitionBy("probe_id").orderBy(Similarity.rankSafe(col("cos")).desc, col("corpus_id"))
    broadcast(p).join(assigned, Seq("cluster"))
      .filter(col("probe_id") =!= col("corpus_id"))
      .withColumn("cos", VectorExpressions.cosine(col("pv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= topK)
      .select("probe_id", "rank", "corpus_id", "cos")
  }
}
