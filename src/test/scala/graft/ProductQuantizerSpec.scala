package graft

import org.apache.spark.sql.functions._

import graft.operators.{Clustering, ProductQuantizer}

/** Laws tying product quantization back to the portable k-means it is
  * built from, plus ADC search contracts.
  */
class ProductQuantizerSpec extends SparkTestBase {

  private def vecs() = {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    (0 until 60).map(i => (i.toLong, Seq.fill(8)(rng.nextDouble() * 4 - 2)))
      .toDF("id", "v")
  }

  test("m=1 PQ is exactly portable k-means (codes and distances)") {
    val df = vecs()
    val cb = ProductQuantizer.train(df, "id", "v", m = 1, k = 3, iters = 1)
    val pq = ProductQuantizer.encode(df, "id", "v", cb)
      .select(col("id"), element_at(col("codes"), 1).as("c"),
        col("recon_err"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2))))
      .toMap
    val km = Clustering.kmeansPortable(df, "id", "v", k = 3, iters = 1)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2))))
      .toMap
    assert(pq == km, "one subspace must degenerate to plain k-means")
  }

  test("subspace split: recon_err sums the per-subspace minima exactly") {
    val df = vecs()
    val cb = ProductQuantizer.train(df, "id", "v", m = 2, k = 3, iters = 1)
    assert(cb.m == 2 && cb.subDim == 4
      && cb.centroids.forall(_.forall(_.size == 4)))
    // finer codebooks can only shrink reconstruction error: k=6 vs k=2
    val coarse = ProductQuantizer.encode(df, "id", "v",
      ProductQuantizer.train(df, "id", "v", 2, 2, 1))
      .agg(sum("recon_err")).head.getDouble(0)
    val fine = ProductQuantizer.encode(df, "id", "v",
      ProductQuantizer.train(df, "id", "v", 2, 6, 1))
      .agg(sum("recon_err")).head.getDouble(0)
    assert(fine <= coarse + 1e-9,
      s"more codes must not reconstruct worse: k=6 $fine vs k=2 $coarse")
  }

  test("searchAdc: full rank lists, adc non-decreasing, total order") {
    val df = vecs()
    val cb = ProductQuantizer.train(df, "id", "v", m = 2, k = 3, iters = 1)
    val enc = ProductQuantizer.encode(df, "id", "v", cb)
    val out = ProductQuantizer.searchAdc(enc, "id",
        df.filter(col("id") < 2), "id", "v", cb, topK = 4)
      .orderBy("probe_id", "rank").collect()
    assert(out.length == 8, s"2 probes x top-4: ${out.length}")
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val adcs = rows.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(adcs.zip(adcs.tail).forall { case (a, b) => a <= b },
        s"adc must be non-decreasing in rank: ${adcs.toSeq}")
    }
  }

  test("dimension mismatch fails loudly") {
    intercept[IllegalArgumentException] {
      ProductQuantizer.train(vecs(), "id", "v", m = 3, k = 2, iters = 0)
    }
  }

  test("IVFADC at nprobe == k_coarse is exactly searchAdc (recall 1)") {
    val df = vecs()
    val coarse = ProductQuantizer.trainCoarse(df, "id", "v", k = 3, iters = 1)
    val cb = ProductQuantizer.train(df, "id", "v", m = 2, k = 3, iters = 1)
    val idx = ProductQuantizer.buildIvfPq(df, "id", "v", coarse, cb)
    val probes = df.filter(col("id") < 3)
    val full = ProductQuantizer.searchAdc(
        ProductQuantizer.encode(df, "id", "v", cb), "id",
        probes, "id", "v", cb, topK = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val ivf = ProductQuantizer.searchIvfAdc(idx, "id", probes, "id", "v",
        coarse, cb, nprobe = 3, topK = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(ivf == full, "probing every cell must reproduce the full ADC scan")
  }

  test("IVFADC pruning returns a subset ranking consistent with ADC") {
    // at nprobe < k each returned (probe, vec) must also appear in the
    // full ADC scan with an adc value IDENTICAL (same arithmetic) and
    // the pruned list must be rank-consistent (adc non-decreasing)
    val df = vecs()
    val coarse = ProductQuantizer.trainCoarse(df, "id", "v", k = 4, iters = 1)
    val cb = ProductQuantizer.train(df, "id", "v", m = 2, k = 3, iters = 1)
    val idx = ProductQuantizer.buildIvfPq(df, "id", "v", coarse, cb)
    val probes = df.filter(col("id") < 3)
    val fullAdc = ProductQuantizer.searchAdc(
        ProductQuantizer.encode(df, "id", "v", cb), "id",
        probes, "id", "v", cb, topK = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
      .toMap
    val pruned = ProductQuantizer.searchIvfAdc(idx, "id", probes, "id", "v",
      coarse, cb, nprobe = 2, topK = 4).collect()
    assert(pruned.nonEmpty)
    pruned.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(fullAdc.contains(key), s"$key not in the full ADC list")
      assert(fullAdc(key) == r.getDouble(3), s"adc mismatch for $key")
    }
    pruned.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val adcs = rows.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(adcs.zip(adcs.tail).forall { case (a, b) => a <= b })
    }
  }

  private def clustered() = {
    import spark.implicits._
    val rng = new scala.util.Random(73)
    val centers = Seq(Seq.fill(8)(5.0), Seq.fill(8)(-5.0),
      (0 until 8).map(i => if (i % 2 == 0) 5.0 else -5.0))
    (0 until 90).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(_ + rng.nextGaussian() * 0.5))
    }.toDF("id", "v")
  }

  test("residual PQ reconstructs clustered data better than plain PQ") {
    val df = clustered()
    val coarse = ProductQuantizer.trainCoarse(df, "id", "v", k = 3, iters = 2)
    val plainCb = ProductQuantizer.train(df, "id", "v", m = 2, k = 3, iters = 1)
    val plain = ProductQuantizer.encode(df, "id", "v", plainCb)
      .agg(sum("recon_err")).head.getDouble(0)
    val resCb = ProductQuantizer.trainResidual(df, "id", "v", coarse,
      m = 2, k = 3, iters = 1)
    val residual = ProductQuantizer.encode(
        ProductQuantizer.residuals(df, "id", "v", coarse), "id", "resid",
        resCb)
      .agg(sum("recon_err")).head.getDouble(0)
    assert(residual < plain,
      s"residual coding must beat raw coding on clustered data: " +
        s"$residual vs $plain")
  }

  test("residual IVFADC: pruned results subset the full probe, adc intact") {
    val df = clustered()
    val coarse = ProductQuantizer.trainCoarse(df, "id", "v", k = 3, iters = 2)
    val cb = ProductQuantizer.trainResidual(df, "id", "v", coarse,
      m = 2, k = 3, iters = 1)
    val idx = ProductQuantizer.buildIvfPqResidual(df, "id", "v", coarse, cb)
    val probes = df.filter(col("id") < 3)
    val full = ProductQuantizer.searchIvfAdcResidual(idx, "id", probes,
        "id", "v", coarse, cb, nprobe = 3, topK = 90)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
      .toMap
    val pruned = ProductQuantizer.searchIvfAdcResidual(idx, "id", probes,
      "id", "v", coarse, cb, nprobe = 1, topK = 5).collect()
    assert(pruned.nonEmpty)
    pruned.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(full.contains(key) && full(key) == r.getDouble(3),
        s"pruned row $key must appear in the full probe with the same adc")
    }
  }

  test("residual IVFADC routes every result to the probe's own cluster") {
    // the planted structure: inter-blob squared distance is ~800 while
    // intra-blob is ~2, far beyond any ADC quantization error — so at
    // nprobe 1 every returned neighbor must be a cluster-mate of the
    // probe (id % 3). Within-cluster RANK fidelity is deliberately NOT
    // pinned: with m=2, k=3 residual codes the within-blob ADC order is
    // quantization-limited, which is expected of a 6-byte code.
    val df = clustered()
    val coarse = ProductQuantizer.trainCoarse(df, "id", "v", k = 3, iters = 2)
    val cb = ProductQuantizer.trainResidual(df, "id", "v", coarse,
      m = 2, k = 3, iters = 1)
    val idx = ProductQuantizer.buildIvfPqResidual(df, "id", "v", coarse, cb)
    val probes = df.filter(col("id") < 3)
    val got = ProductQuantizer.searchIvfAdcResidual(idx, "id", probes,
        "id", "v", coarse, cb, nprobe = 1, topK = 5)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(got.keySet == Set(0L, 1L, 2L))
    got.foreach { case (pid, ids) =>
      assert(ids.size == 5, s"probe $pid returned ${ids.size} rows")
      val strays = ids.filterNot(i => i % 3 == pid % 3)
      assert(strays.isEmpty,
        s"probe $pid (cluster ${pid % 3}) returned other-cluster ids $strays")
    }
  }

  test("searchExact matches a driver-side brute force") {
    val df = vecs()
    val data = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val got = ProductQuantizer.searchExact(df, "id",
        "v", df.filter(col("id") < 2), "id", "v", topK = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    (0L until 2L).foreach { pid =>
      val pv = data(pid)
      val want = data.toSeq.map { case (id, v) =>
        val d = v.zip(pv).map { case (x, y) => (x - y) * (x - y) }.sum
        (BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, id)
      }.sorted.take(3).map(_._2)
      want.zipWithIndex.foreach { case (id, i) =>
        assert(got((pid, i + 1L)) == id,
          s"probe $pid rank ${i + 1}: want $id got ${got((pid, i + 1L))}")
      }
    }
  }
}
