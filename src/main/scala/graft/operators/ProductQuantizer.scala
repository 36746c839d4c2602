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

  /** Per-probe distance tables: m array columns `_dtj` of k rounded
    * entries each (probe-subspace → every centroid of subspace j). */
  private def withDistTables(p0: DataFrame, cb: Codebooks,
      roundDp: Int): DataFrame =
    (0 until cb.m).foldLeft(p0) { (acc, j) =>
      val s = slice(col("_pv"), j * cb.subDim + 1, cb.subDim)
      acc.withColumn(s"_dt$j", array(cb.centroids(j).map(c =>
        Clustering.sqDistTo(s, c, roundDp)): _*))
    }

  /** ADC of a code row against the `_dtj` tables: m lookups summed
    * and rounded, exactly mirroring the encode step's arithmetic. */
  private def adcExpr(cb: Codebooks, roundDp: Int) =
    round((0 until cb.m).map(j =>
      element_at(col(s"_dt$j"), element_at(col("codes"), j + 1) + 1))
      .reduce(_ + _), roundDp).cast("double")

  /** Candidate rows → top-k per probe through the partial-aggregatable
    * bounded heap ([[graft.functions.TopKStructAgg]]): each map task
    * forwards at most k (adc, id) structs per probe, so the exchange
    * carries tasks × probes × k rows — NOT candidates × probes, which
    * is what the old `row_number() OVER (PARTITION BY probe_id ...)`
    * formulation shuffled (at a billion codes that shuffle IS the
    * query). Rank ties break by (adc, id) — a total order, so the
    * result is partitioning-independent.
    */
  private def topKPerProbe(cand: DataFrame, idCol: String,
      topK: Int): DataFrame =
    cand.groupBy("probe_id")
      .agg(graft.functions.TopKStructAgg.topKStructs(
        struct(col("adc"), col(idCol).as("_vid")), topK).as("_tk"))
      .select(col("probe_id"), posexplode(col("_tk")).as(Seq("_p", "_e")))
      .select(col("probe_id"), col("_e._vid").as("vec_id"),
        (col("_p") + 1).cast("bigint").as("rank"),
        col("_e.adc").as("adc"))

  /** ADC top-k search: per probe, the approximate distance to every
    * encoded vector is the sum of m distance-table lookups
    * (probe-subspace → centroid of that vector's code), rounded like
    * the encode step; top-k by the (adc, corpus id) total order.
    * The probe side must be driver-broadcastable (query batches, not
    * a corpus); the corpus side touches ONLY the code table, and the
    * per-probe top-k is a bounded partial aggregate (map-side k-heaps
    * merge across the exchange — see [[topKPerProbe]]).
    *
    * Output: (probe_id, vec_id, rank, adc).
    */
  def searchAdc(encoded: DataFrame, idCol: String, probes: DataFrame,
      probeIdCol: String, probeVecCol: String, cb: Codebooks,
      topK: Int, roundDp: Int = 6): DataFrame = {
    require(topK >= 1, s"pq: topK must be >= 1, got $topK")
    val p0 = probes.select(col(probeIdCol).as("probe_id"),
      col(probeVecCol).cast("array<double>").as("_pv"))
    val tables = withDistTables(p0, cb, roundDp).drop("_pv")
    topKPerProbe(
      encoded.crossJoin(broadcast(tables))
        .withColumn("adc", adcExpr(cb, roundDp)),
      idCol, topK)
  }

  // ---- IVFADC: coarse inverted-file pruning over the PQ code table --

  /** Coarse quantizer for the IVFADC layout: portable k-means over the
    * FULL vector (same seeding/rounding/tie rules as the subspace
    * training, via [[Clustering.trainCentroids]]), so cell assignment
    * is engine-exact and a SQL oracle replays it. Centroid matrix is
    * k×dim doubles — driver-sized (the [[IvfIndex]] sanctioned-collect
    * class). */
  def trainCoarse(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, roundDp: Int = 6): Seq[Seq[Double]] = {
    val v0 = vecs.select(col(idCol).as("_id"),
      col(vecCol).cast("array<double>").as("_v"))
    Clustering.trainCentroids(v0, "_id", "_v", k, iters, roundDp)
  }

  /** The IVFADC index: coarse cell + PQ codes in ONE narrow projection
    * pass over the corpus (centroid literals, no join, no shuffle).
    * Output: (idCol, cell, codes) — at scale this table (plus the two
    * driver-sized codebooks) REPLACES the raw vectors for serving.
    */
  def buildIvfPq(vecs: DataFrame, idCol: String, vecCol: String,
      coarse: Seq[Seq[Double]], cb: Codebooks,
      roundDp: Int = 6): DataFrame = {
    require(coarse.nonEmpty, "ivfpq: coarse codebook must be non-empty")
    val v0 = vecs.select(col(idCol),
      col(vecCol).cast("array<double>").as("_v"))
    val cellDists = array(coarse.map(c =>
      Clustering.sqDistTo(col("_v"), c, roundDp)): _*)
    val perSub = (0 until cb.m).map { j =>
      val s = slice(col("_v"), j * cb.subDim + 1, cb.subDim)
      val dists = array(cb.centroids(j).map(c =>
        Clustering.sqDistTo(s, c, roundDp)): _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    v0.select(col(idCol),
      (array_position(cellDists, array_min(cellDists)) - 1).cast("int")
        .as("cell"),
      array(perSub: _*).as("codes"))
  }

  /** IVFADC search (Jégou et al. 2011 §IV) — the standard
    * billion-vector layout: each probe ranks the coarse cells by
    * rounded full-vector distance, keeps the `nprobe` nearest, and
    * runs ADC ONLY against codes in those cells. vs [[searchAdc]]:
    * the crossJoin becomes a broadcast equi-join on `cell`, so the
    * scan touches ~nprobe/k_coarse of the code table; the top-k stays
    * the bounded partial aggregate. Recall at nprobe == k_coarse is
    * exactly [[searchAdc]] (every cell probed).
    *
    * Output: (probe_id, vec_id, rank, adc).
    */
  def searchIvfAdc(indexed: DataFrame, idCol: String, probes: DataFrame,
      probeIdCol: String, probeVecCol: String, coarse: Seq[Seq[Double]],
      cb: Codebooks, nprobe: Int, topK: Int,
      roundDp: Int = 6): DataFrame = {
    require(topK >= 1, s"ivfpq: topK must be >= 1, got $topK")
    require(nprobe >= 1 && nprobe <= coarse.size,
      s"ivfpq: nprobe must be in [1, ${coarse.size}], got $nprobe")
    val p0 = probes.select(col(probeIdCol).as("probe_id"),
      col(probeVecCol).cast("array<double>").as("_pv"))
    val cellDists = array(coarse.map(c =>
      Clustering.sqDistTo(col("_pv"), c, roundDp)): _*)
    // (dist, cell) structs sorted by natural ascending order = the
    // (rounded dist, lowest cell) total order; keep the first nprobe
    val rankedCells = array_sort(zip_with(cellDists,
      sequence(lit(0), lit(coarse.size - 1)),
      (d, c) => struct(d.as("d"), c.cast("int").as("c"))))
    val cells = transform(slice(rankedCells, 1, nprobe), x => x("c"))
    val probeCells = withDistTables(p0, cb, roundDp)
      .withColumn("cell", explode(cells))
      .drop("_pv")
    topKPerProbe(
      indexed.join(broadcast(probeCells), Seq("cell"))
        .withColumn("adc", adcExpr(cb, roundDp)),
      idCol, topK)
  }

  /** Residual of every vector against its coarse cell's centroid:
    * (idCol, cell, resid) — the quantity the paper-faithful IVFADC
    * (Jégou et al. 2011 §IV.B) compresses: residuals have far less
    * variance than raw vectors (the coarse centroid already explains
    * the cell's location), so the SAME PQ budget reconstructs them
    * more accurately. */
  def residuals(vecs: DataFrame, idCol: String, vecCol: String,
      coarse: Seq[Seq[Double]], roundDp: Int = 6): DataFrame = {
    require(coarse.nonEmpty, "ivfpq: coarse codebook must be non-empty")
    val v0 = vecs.select(col(idCol),
      col(vecCol).cast("array<double>").as("_v"))
    val cellDists = array(coarse.map(c =>
      Clustering.sqDistTo(col("_v"), c, roundDp)): _*)
    val coarseLit = typedLit(coarse.map(_.toSeq))
    v0.withColumn("cell",
        (array_position(cellDists, array_min(cellDists)) - 1).cast("int"))
      .select(col(idCol), col("cell"),
        zip_with(col("_v"), element_at(coarseLit, col("cell") + 1),
          (x, y) => x - y).as("resid"))
  }

  /** Residual-PQ codebooks: the coarse assignment's residuals feed
    * [[train]]'s per-subspace portable k-means verbatim. */
  def trainResidual(vecs: DataFrame, idCol: String, vecCol: String,
      coarse: Seq[Seq[Double]], m: Int, k: Int, iters: Int,
      roundDp: Int = 6): Codebooks =
    train(residuals(vecs, idCol, vecCol, coarse, roundDp),
      idCol, "resid", m, k, iters, roundDp)

  /** The residual IVFADC index: (idCol, cell, codes) where codes
    * quantize the RESIDUAL v − c_cell against residual-trained
    * codebooks — one narrow projection pass, as [[buildIvfPq]]. */
  def buildIvfPqResidual(vecs: DataFrame, idCol: String, vecCol: String,
      coarse: Seq[Seq[Double]], cb: Codebooks,
      roundDp: Int = 6): DataFrame = {
    val r = residuals(vecs, idCol, vecCol, coarse, roundDp)
    val perSub = (0 until cb.m).map { j =>
      val s = slice(col("resid"), j * cb.subDim + 1, cb.subDim)
      val dists = array(cb.centroids(j).map(c =>
        Clustering.sqDistTo(s, c, roundDp)): _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    r.select(col(idCol), col("cell"), array(perSub: _*).as("codes"))
  }

  /** Residual IVFADC search — the full Jégou §IV layout: probes rank
    * cells by raw-vector distance and keep `nprobe`; within each
    * probed cell the distance tables are built on the PROBE'S RESIDUAL
    * against that cell (q − c_cell), so the tables vary per (probe,
    * cell) — nprobe × m × k entries per probe, still
    * broadcast-bounded; ADC and the bounded top-k as [[searchIvfAdc]].
    *
    * Output: (probe_id, vec_id, rank, adc) — adc approximates
    * ‖(q − c_cell) − pq(v − c_cell)‖², the §IV.B residual ADC.
    */
  def searchIvfAdcResidual(indexed: DataFrame, idCol: String,
      probes: DataFrame, probeIdCol: String, probeVecCol: String,
      coarse: Seq[Seq[Double]], cb: Codebooks, nprobe: Int, topK: Int,
      roundDp: Int = 6): DataFrame = {
    require(topK >= 1, s"ivfpq: topK must be >= 1, got $topK")
    require(nprobe >= 1 && nprobe <= coarse.size,
      s"ivfpq: nprobe must be in [1, ${coarse.size}], got $nprobe")
    val p0 = probes.select(col(probeIdCol).as("probe_id"),
      col(probeVecCol).cast("array<double>").as("_pv"))
    val cellDists = array(coarse.map(c =>
      Clustering.sqDistTo(col("_pv"), c, roundDp)): _*)
    val rankedCells = array_sort(zip_with(cellDists,
      sequence(lit(0), lit(coarse.size - 1)),
      (d, c) => struct(d.as("d"), c.cast("int").as("c"))))
    val cells = transform(slice(rankedCells, 1, nprobe), x => x("c"))
    val coarseLit = typedLit(coarse.map(_.toSeq))
    // per (probe, cell): residual q − c_cell becomes the table input
    val probeCells = p0
      .withColumn("cell", explode(cells))
      .withColumn("_pv",
        zip_with(col("_pv"), element_at(coarseLit, col("cell") + 1),
          (x, y) => x - y))
    val tables = withDistTables(probeCells, cb, roundDp).drop("_pv")
    topKPerProbe(
      indexed.join(broadcast(tables), Seq("cell"))
        .withColumn("adc", adcExpr(cb, roundDp)),
      idCol, topK)
  }

  /** Exact rounded-squared-L2 top-k — the ground-truth twin the ADC
    * paths are graded against (recall@k via RankEval.recallAtK). The
    * probe side must be a bounded query batch (broadcast); the corpus
    * scan is the irreducible cost of exactness. Same (dist, id) total
    * order and bounded top-k aggregate as the approximate paths.
    *
    * Output: (probe_id, vec_id, rank, adc) — adc here is the EXACT
    * rounded squared distance, column-named identically so the recall
    * join needs no renames.
    */
  def searchExact(vecs: DataFrame, idCol: String, vecCol: String,
      probes: DataFrame, probeIdCol: String, probeVecCol: String,
      topK: Int, roundDp: Int = 6): DataFrame = {
    require(topK >= 1, s"pq: topK must be >= 1, got $topK")
    val v0 = vecs.select(col(idCol),
      col(vecCol).cast("array<double>").as("_cv"))
    val p0 = probes.select(col(probeIdCol).as("probe_id"),
      col(probeVecCol).cast("array<double>").as("_pv"))
    val sq = round(aggregate(
      zip_with(col("_cv"), col("_pv"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, e) => acc + e), roundDp).cast("double")
    topKPerProbe(
      v0.crossJoin(broadcast(p0)).withColumn("adc", sq),
      idCol, topK)
  }
}
