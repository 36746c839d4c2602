package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, TPAMI 33(1)) — the
  * memory-scale path of the similarity-search family: split each
  * vector into `m` contiguous subspaces, k-means each subspace
  * independently, and represent a vector by its m nearest-centroid
  * codes. A 64-dim float vector becomes m small ints; asymmetric
  * distance computation (ADC) then approximates a probe's distance to
  * EVERY corpus vector from m table lookups, no corpus-vector floats
  * touched — the standard billion-vector ANN compression layer under
  * IVF ([[IvfIndex]] gives the pruning, PQ gives the memory).
  *
  * Portability: subspace training reuses [[Clustering.trainCentroids]]
  * verbatim (portable md5 seeding, per-step 6-dp rounding, lowest-
  * index tie rule), so codes and distances are engine-exact and a
  * DuckDB oracle unrolling the same arithmetic reproduces them.
  *
  * Scale shape: codebooks are m·k·(dim/m) doubles — driver-sized by
  * construction (the [[IvfIndex]] sanctioned-collect class); encode is
  * a narrow per-row projection with centroid literals (no join, no
  * shuffle, whole-stage codegen HOFs); ADC search broadcasts the
  * probe-side distance tables and scans the code table, never the raw
  * vectors.
  */
object ProductQuantizer {

  /** Trained codebooks: `centroids(j)(c)` is subspace j's centroid c. */
  case class Codebooks(m: Int, subDim: Int,
      centroids: Seq[Seq[Seq[Double]]])

  /** Train per-subspace codebooks over contiguous slices. `dim` must
    * divide evenly into `m` subspaces. */
  def train(vecs: DataFrame, idCol: String, vecCol: String, m: Int,
      k: Int, iters: Int, roundDp: Int = 6): Codebooks = {
    require(m >= 1, s"pq: m must be >= 1, got $m")
    val v0 = vecs.select(col(idCol).as("_id"),
      col(vecCol).cast("array<double>").as("_v"))
    val dim = v0.select(size(col("_v"))).head().getInt(0)
    require(dim % m == 0, s"pq: dim $dim must divide into $m subspaces")
    val subDim = dim / m
    val books = (0 until m).map { j =>
      val sub = v0.select(col("_id"),
        slice(col("_v"), j * subDim + 1, subDim).as("_s"))
      Clustering.trainCentroids(sub, "_id", "_s", k, iters, roundDp)
    }
    Codebooks(m, subDim, books)
  }

  /** Encode every vector: nearest centroid per subspace (rounded-
    * distance argmin, ties to the lowest code) plus the exact
    * reconstruction error — the sum of per-subspace squared distances
    * IS the squared distance to the concatenated reconstruction,
    * because subspaces partition the dimensions.
    *
    * Output: (idCol, codes array<int>, recon_err).
    */
  def encode(vecs: DataFrame, idCol: String, vecCol: String,
      cb: Codebooks, roundDp: Int = 6): DataFrame = {
    val v0 = vecs.select(col(idCol).as(idCol),
      col(vecCol).cast("array<double>").as("_v"))
    val perSub = (0 until cb.m).map { j =>
      val s = slice(col("_v"), j * cb.subDim + 1, cb.subDim)
      val dists = array(cb.centroids(j).map(c =>
        Clustering.sqDistTo(s, c, roundDp)): _*)
      ((array_position(dists, array_min(dists)) - 1).cast("int"),
        array_min(dists))
    }
    v0.select(col(idCol),
      array(perSub.map(_._1): _*).as("codes"),
      round(perSub.map(_._2).reduce(_ + _), roundDp)
        .cast("double").as("recon_err"))
  }

  /** ADC top-k search: per probe, the approximate distance to every
    * encoded vector is the sum of m distance-table lookups
    * (probe-subspace → centroid of that vector's code), rounded like
    * the encode step; top-k by the (adc, corpus id) total order.
    * The probe side must be driver-broadcastable (query batches, not
    * a corpus); the corpus side touches ONLY the code table.
    *
    * Output: (probe_id, vec_id, rank, adc).
    */
  def searchAdc(encoded: DataFrame, idCol: String, probes: DataFrame,
      probeIdCol: String, probeVecCol: String, cb: Codebooks,
      topK: Int, roundDp: Int = 6): DataFrame = {
    require(topK >= 1, s"pq: topK must be >= 1, got $topK")
    val p0 = probes.select(col(probeIdCol).as("probe_id"),
      col(probeVecCol).cast("array<double>").as("_pv"))
    // per probe: m distance tables of k entries each, as array columns
    val withTables = (0 until cb.m).foldLeft(p0) { (acc, j) =>
      val s = slice(col("_pv"), j * cb.subDim + 1, cb.subDim)
      acc.withColumn(s"_dt$j", array(cb.centroids(j).map(c =>
        Clustering.sqDistTo(s, c, roundDp)): _*))
    }.drop("_pv")
    val adc = round((0 until cb.m).map(j =>
      element_at(col(s"_dt$j"), element_at(col("codes"), j + 1) + 1))
      .reduce(_ + _), roundDp)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("adc"), col(idCol))
    encoded.crossJoin(broadcast(withTables))
      .withColumn("adc", adc.cast("double"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("probe_id"), col(idCol).as("vec_id"),
        col("rank").cast("bigint").as("rank"), col("adc"))
  }
}
