package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Similarity search over an embedding column (ArrayType(FloatType)).
  *
  * Two paths, same semantics:
  *  - brute force: exact, O(n²) pairs — the correctness baseline and
  *    fine up to ~10⁴ vectors per comparison scope;
  *  - LSH-bucketed (random hyperplane signatures): candidates only
  *    pair up within a signature bucket, pruning the quadratic
  *    blow-up — the 100 TB path. Recall is tunable via bands ×
  *    hyperplanes-per-band; exact cosine re-scores candidates, so
  *    precision is exact and only recall is approximate.
  */
object Similarity {

  /** Undirected exact cosine pairs (id1 < id2) with cos >= minCos.
    *
    * Self-join on a non-equi condition => broadcast nested loop; the
    * smaller projection (id + vector only) is what's broadcast. At
    * cluster scale, replace with lshCandidates >> this on the pruned
    * candidate set.
    */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      minCos: Double = -1.0): DataFrame = {
    val a = emb.select(col(idCol).as("id1"), col(vecCol).as("v1"))
    val b = emb.select(col(idCol).as("id2"), col(vecCol).as("v2"))
    a.join(b, col("id1") < col("id2"))
      .withColumn("cos", VectorOps.cosineUdf(col("v1"), col("v2")))
      .filter(col("cos") >= minCos)
      .select("id1", "id2", "cos")
  }

  /** Global top-k most-similar pairs. TakeOrderedAndProject: each task
    * keeps k rows, driver merges — no global sort.
    */
  def topKPairs(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    cosinePairs(emb, idCol, vecCol)
      .orderBy(col("cos").desc, col("id1"), col("id2"))
      .limit(k)

  /** k nearest neighbors per vector (directed pairs, self excluded). */
  def knn(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val a = emb.select(col(idCol).as("id1"), col(vecCol).as("v1"))
    val b = emb.select(col(idCol).as("id2"), col(vecCol).as("v2"))
    val w = Window.partitionBy("id1").orderBy(col("cos").desc, col("id2"))
    a.join(b, col("id1") =!= col("id2"))
      .withColumn("cos", VectorOps.cosineUdf(col("v1"), col("v2")))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("id1", "rank", "id2", "cos")
  }

  /** Deterministic random hyperplanes: `planes(p)(d)` from a fixed
    * seed, so signatures are stable across runs/executors.
    */
  private def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Random-hyperplane signature (SimHash for cosine): bit p = sign of
    * dot(v, plane_p). Probability two vectors agree on a bit is
    * 1 - angle/π, so bucket collisions concentrate on high-cosine pairs.
    */
  def signatureUdf(nPlanes: Int, dim: Int, seed: Long) = {
    val planes = hyperplanes(nPlanes, dim, seed)
    udf { (v: Seq[Float]) =>
      var sig = 0L
      var p = 0
      while (p < planes.length) {
        var s = 0.0
        val plane = planes(p)
        var i = 0
        while (i < plane.length) { s += v(i) * plane(i); i += 1 }
        if (s >= 0) sig |= (1L << p)
        p += 1
      }
      sig
    }
  }

  /** ANN candidate pairs via banded hyperplane LSH: `bands` signatures
    * of `planesPerBand` bits each; vectors sharing ANY band bucket
    * become a candidate pair, then exact cosine re-scores. Each band is
    * an equi-join key => shuffle hash joins, no quadratic blow-up.
    */
  def lshCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      bands: Int = 8, planesPerBand: Int = 8, seed: Long = 42L,
      dim: Int = 64, minCos: Double = 0.0): DataFrame = {
    val banded = (0 until bands).map { bandIdx =>
      val sig = signatureUdf(planesPerBand, dim, seed + bandIdx)
      emb.select(
        col(idCol).as("id"), col(vecCol).as("v"),
        lit(bandIdx).as("band"), sig(col(vecCol)).as("sig"))
    }.reduce(_ unionByName _)
    val a = banded.select(col("band"), col("sig"), col("id").as("id1"), col("v").as("v1"))
    val b = banded.select(col("band"), col("sig"), col("id").as("id2"), col("v").as("v2"))
    a.join(b, Seq("band", "sig"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2", "v1", "v2").distinct() // a pair may collide in many bands
      .withColumn("cos", VectorOps.cosineUdf(col("v1"), col("v2")))
      .filter(col("cos") >= minCos)
      .select("id1", "id2", "cos")
  }
}
