package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.operators.{Dedup, IvfIndex}

/** The steady-state persistence workflows: signatures and codebooks
  * are computed ONCE, written, and reloaded by later sessions — the
  * reloaded state must drive bit-identical results, or incremental
  * pipelines silently fork from their history.
  */
class PersistenceSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("persisted SimHash signatures drive the same near-dup pairs as a fresh run") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 120)
    val sigs = Dedup.simHash(docs, "doc_id", "text")
    val direct = Dedup.simHashNearDupFromSigs(sigs, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val path = tmp("sigs")
    sigs.write.mode("overwrite").parquet(path)
    val reloaded = Dedup.simHashNearDupFromSigs(
        spark.read.parquet(path), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(reloaded === direct)
    assert(direct.nonEmpty, "fixture sanity: some near-dups exist at radius 6")
  }

  test("persisted MinHash signatures equal recomputed ones (stable hash family)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 60)
    val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", nHashes = 24)
    val path = tmp("minhash")
    sigs.write.mode("overwrite").parquet(path)
    val a = sigs.collect().map(_.toSeq).toSet
    val b = spark.read.parquet(path).collect().map(_.toSeq).toSet
    assert(a === b, "bigint signatures round-trip parquet exactly")
  }

  test("saved + reloaded IVF codebook searches bit-identically") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val probes = emb.filter(col("vec_id") < 5)
    val trained = IvfIndex.train(emb, "vec_id", "embedding", k = 4,
      iters = 2, seed = 42L)
    val path = tmp("ivf")
    IvfIndex.saveCentroids(spark, trained, path)
    val loaded = IvfIndex.loadCentroids(spark, path)
    assert(loaded.length === trained.length)
    trained.sortBy(_._1).zip(loaded).foreach { case ((ci, cv), (li, lv)) =>
      assert(ci === li)
      assert(cv.toSeq === lv.toSeq, s"centroid $ci changed across the round-trip")
    }
    def results(c: Array[(Int, Array[Double])]) =
      IvfIndex.search(IvfIndex.assign(emb, "vec_id", "embedding", c),
          probes, "vec_id", "embedding", c, nprobe = 2, topK = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(results(loaded) === results(trained))
  }

  test("saved + reloaded BPE merge table tokenizes bit-identically") {
    import graft.operators.Bpe
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString + "/merges"
    Bpe.saveMerges(spark, Bpe.PinnedMerges, dir)
    val loaded = Bpe.loadMerges(spark, dir)
    assert(loaded === Bpe.PinnedMerges, "ORDER is BPE semantics; it must survive")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = Bpe.tokenizePortable(docs, "doc_id", "text", Bpe.PinnedMerges)
    val b = Bpe.tokenizePortable(docs, "doc_id", "text", loaded)
    assert(a.exceptAll(b).count() === 0L && b.exceptAll(a).count() === 0L)
  }

  test("fixture sidecar: tampered codebook/merge parquet fails loudly at load") {
    import graft.operators.Bpe
    // centroids: save one codebook, overwrite the parquet with a
    // DIFFERENT one while keeping the original sidecar -> load throws
    val path = tmp("ivfmeta")
    IvfIndex.saveCentroids(spark,
      Array(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0)), path)
    val meta = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, graft.operators.FixtureMeta.FileName))
    IvfIndex.saveCentroids(spark,
      Array(0 -> Array(0.5, 0.5), 1 -> Array(0.0, 1.0)), path)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, graft.operators.FixtureMeta.FileName), meta)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
      path, "." + graft.operators.FixtureMeta.FileName + ".crc"))
    val e = intercept[IllegalArgumentException](
      IvfIndex.loadCentroids(spark, path))
    assert(e.getMessage.contains("sidecar"), e.getMessage)
    // merges: REORDERING the table (same rows, different ord) is a
    // semantic change and must also fail
    val dir = tmp("bpemeta") + "/merges"
    Bpe.saveMerges(spark, Seq(("a", "b"), ("c", "d")), dir)
    val meta2 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, graft.operators.FixtureMeta.FileName))
    Bpe.saveMerges(spark, Seq(("c", "d"), ("a", "b")), dir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, graft.operators.FixtureMeta.FileName), meta2)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
      dir, "." + graft.operators.FixtureMeta.FileName + ".crc"))
    val e2 = intercept[IllegalArgumentException](Bpe.loadMerges(spark, dir))
    assert(e2.getMessage.contains("sidecar"), e2.getMessage)
    // absent sidecar (legacy/hand-placed fixture) loads with no check
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(dir, graft.operators.FixtureMeta.FileName))
    assert(Bpe.loadMerges(spark, dir) === Seq(("c", "d"), ("a", "b")))
  }

  test("graph cache: write-through once, later sessions read parquet; stale source rebuilds") {
    import spark.implicits._
    val root = tmp("graphcache")
    val source = tmp("graphsource")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(source, "data.txt"), "v1")
    sys.props("graft.graph.cache") = root
    try {
      var builds = 0
      def build = { builds += 1; Seq(("1", "2", 3L)).toDF("a", "b", "cnt") }
      val first = graft.queries.GraphOps
        .throughCache(spark, "t_edges", source)(build)
        .collect().map(_.toSeq).toSet
      val second = graft.queries.GraphOps
        .throughCache(spark, "t_edges", source)(build)
        .collect().map(_.toSeq).toSet
      assert(builds == 1, s"second call must read parquet, not rebuild: $builds")
      assert(first == second)
      // refresh the source dataset at the SAME path: the content
      // fingerprint in the cache key changes, so the stale entry is
      // never matched and the next call rebuilds (r10 verdict #7 —
      // `_SUCCESS` alone trusted the cache forever)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(source, "data2.txt"), "v2-more-bytes")
      graft.queries.GraphOps.throughCache(spark, "t_edges", source)(build)
        .collect()
      assert(builds == 2, s"refreshed source must invalidate the cache: $builds")
    } finally sys.props.remove("graft.graph.cache")
  }

  test("cached co-order graph is bit-identical to a fresh build") {
    graft.queries.QueryDefs.ensureTables(spark, sfDir)
    def edgeSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
    // fresh build (cache unset): the Verify/correctness path
    val fresh = edgeSet(graft.queries.GraphOps.coOrderParts(spark, sfDir, 7))
    val root = tmp("graphcache2")
    sys.props("graft.graph.cache") = root
    try {
      // a distinct memo key (trailing slash) forces the cache path; a
      // second distinct spelling exercises the build-again route (its
      // fingerprint differs, so it gets its own cache entry). The
      // parquet READ-back path is pinned by the throughCache-level
      // test above; here the claim is bit-identity of every route.
      val written = edgeSet(
        graft.queries.GraphOps.coOrderParts(spark, sfDir + "/", 7))
      val rebuilt = edgeSet(
        graft.queries.GraphOps.coOrderParts(spark, sfDir + "_", 7))
      assert(written == fresh, "write-through must match the fresh build")
      assert(rebuilt == fresh, "every cache route must match the fresh build")
      assert(fresh.nonEmpty)
    } finally sys.props.remove("graft.graph.cache")
  }

  test("quantile sketch: parquet round trip is bit-stable; reloaded " +
      "partition sketches merge to the exact quantiles in the exact " +
      "regime") {
    import spark.implicits._
    import graft.functions.QuantileSketch
    // deterministic permutation of 1..1000 (7919 coprime to 1000)
    val vals = (1 to 1000).map(i => ((i * 7919) % 1000 + 1).toDouble)
    val df = vals.zipWithIndex
      .map { case (v, i) => (i % 4, v) }.toDF("part", "v")
    val k = 2048
    val sketches = df.groupBy("part")
      .agg(QuantileSketch.sketchAgg(col("v"), k).as("sk"))
    val dir = java.nio.file.Files.createTempDirectory("qsk").toString + "/s"
    sketches.write.parquet(dir)
    val reloaded = spark.read.parquet(dir)
    // bit stability: reload -> deserialize -> reserialize is identity
    val pre = sketches.select("part", "sk").as[(Int, Array[Byte])]
      .collect().toMap
    reloaded.select("part", "sk").as[(Int, Array[Byte])].collect()
      .foreach { case (p, bytes) =>
        assert(java.util.Arrays.equals(bytes, pre(p)), s"part $p bytes")
        assert(java.util.Arrays.equals(
          QuantileSketch.deserialize(bytes).serialize, bytes),
          s"part $p reserialize")
      }
    // merged reloaded sketches answer the exact type-1 statistics
    val merged = reloaded.agg(QuantileSketch.mergeAgg(col("sk"), k).as("sk"))
      .select(QuantileSketch.countOf(col("sk")),
        QuantileSketch.quantileOf(col("sk"), 0.25),
        QuantileSketch.quantileOf(col("sk"), 0.5),
        QuantileSketch.quantileOf(col("sk"), 0.9))
      .collect().head
    assert(merged.getLong(0) === 1000L)
    assert(merged.getDouble(1) === 250.0 && merged.getDouble(2) === 500.0
      && merged.getDouble(3) === 900.0, merged.toString)
    // empty sketch -> NULL quantile
    val empty = df.filter(col("v") < 0)
      .agg(QuantileSketch.sketchAgg(col("v"), k).as("sk"))
      .select(QuantileSketch.quantileOf(col("sk"), 0.5)).collect().head
    assert(empty.isNullAt(0))
  }

  test("quantile sketch: deviation law beyond the exact regime — " +
      "rank error bounded at small k; deterministic re-run") {
    import spark.implicits._
    import graft.functions.QuantileSketch
    val n = 10000
    val vals = (1 to n).map(i => ((i.toLong * 104729L) % n + 1).toDouble)
    val df = vals.toDF("v")
    val k = 64
    def quantiles(): Seq[Double] = {
      val sk = df.agg(QuantileSketch.sketchAgg(col("v"), k).as("sk"))
      Seq(0.1, 0.25, 0.5, 0.75, 0.9).map { q =>
        sk.select(QuantileSketch.quantileOf(col("sk"), q))
          .collect().head.getDouble(0)
      }
    }
    val est = quantiles()
    Seq(0.1, 0.25, 0.5, 0.75, 0.9).zip(est).foreach { case (q, v) =>
      // values ARE ranks here (permutation of 1..n): rank error direct
      val err = math.abs(v - q * n) / n
      assert(err <= 0.05, s"q=$q est=$v rank error $err > 5%")
    }
    assert(quantiles() === est, "deterministic compaction must reproduce")
  }

  test("quantile sketch: adversarial merge tree keeps every level " +
      "within k and count conserves the exact value count") {
    import graft.functions.QuantileSketch
    val k = 16
    def leaf(seed: Int, n: Int): QuantileSketch.Buf = {
      val b = new QuantileSketch.Buf(k)
      (1 to n).foreach(i =>
        b.update(((seed.toLong * 31L + i.toLong * 7919L) % 1000L).toDouble))
      b
    }
    // count conservation on the pure update path, deep past the exact
    // regime (many odd-size level-0 compactions at k=16)
    val single = leaf(1, 5000)
    assert(single.count === 5000L, s"update path count ${single.count}")
    // worst-case left-fold merge chain: each operand lands on level 0
    // while deeper levels fill — the prefix-only compaction scan let
    // deep levels exceed k without bound here
    val sizes = (1 to 64).map(s => 1 + (s * 7) % (k + 5))
    val chain = sizes.zipWithIndex
      .map { case (n, s) => leaf(s, n) }
      .reduceLeft((a, b) => a.merge(b))
    assert(chain.count === sizes.map(_.toLong).sum,
      s"merge chain count ${chain.count} != ${sizes.sum}")
    chain.levels.zipWithIndex.foreach { case (lv, i) =>
      assert(lv.length <= k, s"level $i holds ${lv.length} > k=$k")
    }
    // balanced merge tree: same laws
    def tree(bufs: Seq[QuantileSketch.Buf]): QuantileSketch.Buf =
      if (bufs.length == 1) bufs.head
      else tree(bufs.grouped(2).map {
        case Seq(a, b) => a.merge(b)
        case Seq(a) => a
      }.toSeq)
    val balanced = tree(sizes.zipWithIndex.map { case (n, s) => leaf(s, n) })
    assert(balanced.count === sizes.map(_.toLong).sum)
    balanced.levels.zipWithIndex.foreach { case (lv, i) =>
      assert(lv.length <= k, s"balanced level $i holds ${lv.length} > k=$k")
    }
    // the quantile from a merge-heavy tree is still rank-bounded: the
    // values are (seed*31 + i*7919) % 1000 — just sanity-pin the median
    // lands inside the value domain and the sketch stays answerable
    val med = chain.quantile(0.5)
    assert(med.exists(v => v >= 0.0 && v <= 999.0), s"median $med")
  }
}
