package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Dedup, Similarity}

/** Measured-scaling probes for the dedup / ANN / clustering family —
  * the operators whose 100 TB story rests on "work grows with
  * candidates, not with corpus²". PlanSpec pins the plan SHAPES; this
  * spec pins the measured GROWTH on a ~10× corpus blow-up, converting
  * the scale claims from plan-shape evidence to scaling evidence.
  *
  * Blow-up construction: replica i re-keys `doc_id += i·10⁶` and
  * prefixes every token with a replica tag — a bijective renaming of
  * the replica's token space, DISJOINT from every other replica's.
  * Jaccard and SimHash-Hamming structure are invariant under bijective
  * token renaming, and cross-replica token overlap is zero, so the
  * TRUE near-dup pair population grows exactly linearly in N. Any
  * clearly super-linear growth in verified pairs or wall time is an
  * algorithmic artifact (an all-pairs or per-bucket blow-up) — exactly
  * what the probe exists to catch. Quadratic growth at N=10 predicts a
  * ~100× ratio; the asserts draw the line at a generous ~3× the linear
  * prediction so machine noise can't flake them while quadratic can't
  * hide under them.
  */
class ScaleProbeSpec extends SparkTestBase {

  private val N = 10

  private lazy val docs =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").cache()
  private lazy val emb =
    spark.read.parquet(s"$sfDir/embeddings.parquet").cache()

  private def blowUpDocs(n: Int): DataFrame =
    (0 until n).map { i =>
      docs.select(
        (col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
        regexp_replace(col("text"), "(^| )", "$1r" + i + "q").as("text"))
    }.reduce(_ unionByName _)

  private def timedCount(df: DataFrame): (Long, Double) = {
    val t0 = System.nanoTime()
    val c = df.count()
    (c, (System.nanoTime() - t0) / 1e9)
  }

  /** Timing asserts are best-effort by nature: on a heavily loaded host
    * GC/scheduling noise can breach even a generous band. They stay ON
    * by default, can be disabled via GRAFT_SCALE_TIMING=off (the exact
    * row/pair-count laws remain unconditional), and retry once before
    * failing so a single scheduling spike can't flake the suite.
    */
  private val timingAsserts = !sys.env.get("GRAFT_SCALE_TIMING").contains("off")

  /** Wall-time growth bound: tN vs t1, linear prediction N with slack
    * 3× (plus a floor on t1 so a sub-100 ms base can't inflate the
    * ratio into a flake). Quadratic at N=10 predicts ~100×.
    * `remeasure` re-runs both timings for the one-retry path.
    */
  private def assertSubQuadratic(op: String, t1: Double, tN: Double,
      remeasure: () => (Double, Double) = null): Unit = {
    def ratio(a: Double, b: Double): Double = b / math.max(a, 0.1)
    val r0 = ratio(t1, tN)
    info(f"$op: t(1x)=$t1%.2fs t(${N}x)=$tN%.2fs ratio=$r0%.1f")
    if (!timingAsserts) { info(s"$op: timing assert skipped (GRAFT_SCALE_TIMING=off)"); return }
    if (r0 < 3.0 * N) return
    val rBest =
      if (remeasure == null) r0
      else { val (a, b) = remeasure(); info(f"$op retry: t(1x)=$a%.2fs t(${N}x)=$b%.2fs"); math.min(r0, ratio(a, b)) }
    assert(rBest < 3.0 * N,
      f"$op wall time grew ${rBest}%.1f× on a ${N}× corpus (twice) — " +
        "super-linear; expected ~linear growth (quadratic predicts ~100×)")
  }

  test("minHashLshNearDup: verified pairs and time grow ~linearly at 10x") {
    val d1 = blowUpDocs(1).cache(); d1.count()
    val dN = blowUpDocs(N).cache(); dN.count()
    // warmup: JVM/codegen paths for the whole pipeline
    Dedup.minHashLshNearDup(d1, "doc_id", "text", 0.8).count()
    val (p1, t1) = timedCount(Dedup.minHashLshNearDup(d1, "doc_id", "text", 0.8))
    val (pN, tN) = timedCount(Dedup.minHashLshNearDup(dN, "doc_id", "text", 0.8))
    info(s"lsh pairs: 1x=$p1 ${N}x=$pN")
    assert(p1 > 0, "probe needs a non-empty base pair population")
    // pair growth: per-replica counts vary only through LSH recall on
    // renamed hashes; exact duplicates (most of the population) are
    // always candidates, so the band is tight around N
    assert(pN >= (N - 2) * p1 && pN <= (N + 2) * p1,
      s"verified pairs grew $p1 -> $pN on a ${N}x corpus; expected ~${N}x")
    assertSubQuadratic("minHashLshNearDup", t1, tN,
      () => (timedCount(Dedup.minHashLshNearDup(d1, "doc_id", "text", 0.8))._2,
        timedCount(Dedup.minHashLshNearDup(dN, "doc_id", "text", 0.8))._2))
    d1.unpersist(); dN.unpersist()
  }

  test("simHashNearDupFromSigs: verified pairs and time grow ~linearly at 10x") {
    val s1 = Dedup.simHash(blowUpDocs(1), "doc_id", "text").cache(); s1.count()
    val sN = Dedup.simHash(blowUpDocs(N), "doc_id", "text").cache(); sN.count()
    Dedup.simHashNearDupFromSigs(s1, maxHamming = 3).count() // warmup
    val (p1, t1) = timedCount(Dedup.simHashNearDupFromSigs(s1, maxHamming = 3))
    val (pN, tN) = timedCount(Dedup.simHashNearDupFromSigs(sN, maxHamming = 3))
    info(s"simhash pairs: 1x=$p1 ${N}x=$pN")
    assert(p1 > 0, "probe needs a non-empty base pair population")
    // Hamming <= 3 of 64 bits essentially never matches unrelated docs,
    // so cross-replica pairs are ~0 and growth is per-replica-linear.
    // The base population is small (~20 pairs) and each replica's
    // renamed hashes move borderline pairs across the radius, so the
    // band is multiplicative-wide: quadratic growth would be ~100×,
    // two orders above the cap.
    assert(pN >= (0.4 * N * p1).toLong && pN <= (3.0 * N * p1).toLong,
      s"simhash pairs grew $p1 -> $pN on a ${N}x corpus; expected ~${N}x")
    assertSubQuadratic("simHashNearDupFromSigs", t1, tN,
      () => (timedCount(Dedup.simHashNearDupFromSigs(s1, maxHamming = 3))._2,
        timedCount(Dedup.simHashNearDupFromSigs(sN, maxHamming = 3))._2))
    s1.unpersist(); sN.unpersist()
  }

  test("probeSearchQuantized: fixed probes, 10x corpus -> ~linear time, exact output size") {
    val probes = emb.select("vec_id", "embedding").limit(20).cache()
    probes.count()
    def corpusTimes(n: Int): DataFrame =
      (0 until n).map { i =>
        emb.select((col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
          col("embedding"))
      }.reduce(_ unionByName _)
    val c1 = corpusTimes(1).cache(); c1.count()
    val cN = corpusTimes(N).cache(); cN.count()
    Similarity.probeSearchQuantized(c1, probes, "vec_id", "embedding", k = 10).count()
    val (r1, t1) = timedCount(
      Similarity.probeSearchQuantized(c1, probes, "vec_id", "embedding", k = 10))
    val (rN, tN) = timedCount(
      Similarity.probeSearchQuantized(cN, probes, "vec_id", "embedding", k = 10))
    // output is top-k per probe regardless of corpus size
    assert(r1 === 20L * 10 && rN === 20L * 10)
    assertSubQuadratic("probeSearchQuantized", t1, tN,
      () => (timedCount(Similarity.probeSearchQuantized(c1, probes, "vec_id", "embedding", k = 10))._2,
        timedCount(Similarity.probeSearchQuantized(cN, probes, "vec_id", "embedding", k = 10))._2))
    c1.unpersist(); cN.unpersist(); probes.unpersist()
  }

  test("connectedComponents: 10x disjoint replicas -> exactly 10x clusters, ~linear time") {
    // deterministic edge blow-up: replicate the BASE pair list itself
    // into disjoint vertex spaces, so cluster counts scale exactly
    val base = Dedup.minHashLshNearDup(docs, "doc_id", "text", 0.8)
      .select("i", "j").cache()
    base.count()
    def edgesTimes(n: Int): DataFrame =
      (0 until n).map { i =>
        base.select((col("i") + lit(i.toLong * 1000000L)).as("i"),
          (col("j") + lit(i.toLong * 1000000L)).as("j"))
      }.reduce(_ unionByName _)
    val e1 = edgesTimes(1).cache(); e1.count()
    val eN = edgesTimes(N).cache(); eN.count()
    Clustering.connectedComponents(e1, "i", "j").count() // warmup
    val t0a = System.nanoTime()
    val cc1 = Clustering.connectedComponents(e1, "i", "j")
      .agg(countDistinct("cluster_id")).head.getLong(0)
    val t1 = (System.nanoTime() - t0a) / 1e9
    val t0b = System.nanoTime()
    val ccN = Clustering.connectedComponents(eN, "i", "j")
      .agg(countDistinct("cluster_id")).head.getLong(0)
    val tN = (System.nanoTime() - t0b) / 1e9
    info(s"clusters: 1x=$cc1 ${N}x=$ccN")
    assert(cc1 > 0)
    assert(ccN === N * cc1,
      s"disjoint replicas must give exactly ${N}x clusters: $cc1 -> $ccN")
    // iteration count is set by cluster diameter, which replication
    // does not change — growth is per-pass-linear
    assertSubQuadratic("connectedComponents", t1, tN,
      () => (timedCount(Clustering.connectedComponents(e1, "i", "j"))._2,
        timedCount(Clustering.connectedComponents(eN, "i", "j"))._2))
    e1.unpersist(); eN.unpersist(); base.unpersist()
  }

  test("sparseCosinePairs: verified pairs and time grow ~linearly at 10x") {
    import graft.operators.TextAnalysis
    val d1 = blowUpDocs(1).cache(); d1.count()
    val dN = blowUpDocs(N).cache(); dN.count()
    def run(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.sparseCosinePairs(df, "doc_id", "text",
        minCosine = 0.3, maxDf = 50, shingle = 2)
    run(d1).count() // warmup
    val (p1, t1) = timedCount(run(d1))
    val (pN, tN) = timedCount(run(dN))
    info(s"sparse pairs: 1x=$p1 ${N}x=$pN")
    assert(p1 > 0, "probe needs a non-empty base pair population")
    // cross-replica shingle overlap is zero, so candidates grow
    // per-replica-linearly; the corpus-size term in idf shifts weights
    // slightly (ln(10N/df) vs ln(N/df)), moving borderline pairs
    // across the threshold — hence the wide multiplicative band.
    // Quadratic candidate growth would be ~100×.
    assert(pN >= (0.3 * N * p1).toLong && pN <= (3.0 * N * p1).toLong,
      s"sparse cosine pairs grew $p1 -> $pN on a ${N}x corpus; expected ~${N}x")
    assertSubQuadratic("sparseCosinePairs", t1, tN,
      () => (timedCount(run(d1))._2, timedCount(run(dN))._2))
    d1.unpersist(); dN.unpersist()
  }

  test("dedupBlocksAcrossDocs: row-preserving at 10x, ~linear time") {
    val d1 = blowUpDocs(1).cache(); d1.count()
    val dN = blowUpDocs(N).cache(); dN.count()
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.dedupBlocksAcrossDocs(df, "doc_id", "text", blockWords = 8)
    run(d1).count() // warmup
    val (r1, t1) = timedCount(run(d1))
    val (rN, tN) = timedCount(run(dN))
    // row-preserving makes the size law exact; the work law is the
    // window shuffle over 10x blocks
    assert(r1 === 500L && rN === 500L * N)
    assertSubQuadratic("dedupBlocksAcrossDocs", t1, tN,
      () => (timedCount(run(d1))._2, timedCount(run(dN))._2))
    d1.unpersist(); dN.unpersist()
  }

  test("plan shapes hold at 10x: banded/blocked equi-joins, no cartesian products") {
    val dN = blowUpDocs(N)
    val lshPlan = Dedup.minHashLshNearDup(dN, "doc_id", "text", 0.8)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!lshPlan.contains("CartesianProduct"),
      "LSH near-dup must stay a banded equi-join at 10x")
    val sigsN = Dedup.simHash(dN, "doc_id", "text")
    val shPlan = Dedup.simHashNearDupFromSigs(sigsN, maxHamming = 3)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!shPlan.contains("CartesianProduct"),
      "SimHash near-dup must stay a chunk-keyed equi-join at 10x")
  }

  test("pageRank: 10x disjoint replica graphs -> per-rank mass 1/Nx, ~linear time") {
    import graft.operators.Graph
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(concat(lit("p"), col("l_partkey").cast("string")).as("src"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
      .distinct()
    def graphTimes(n: Int): DataFrame =
      (0 until n).map { i =>
        val t = li.select(concat(lit(s"g$i-"), col("src")).as("s0"),
          concat(lit(s"g$i-"), col("dst")).as("d0"))
        t.select(col("s0").as("src"), col("d0").as("dst"))
          .unionByName(t.select(col("d0").as("src"), col("s0").as("dst")))
      }.reduce(_ unionByName _)
    val g1 = graphTimes(1).cache(); g1.count()
    val gN = graphTimes(N).cache(); gN.count()
    Graph.pageRank(g1, "src", "dst", iters = 2).count() // warmup
    val t0a = System.nanoTime()
    val r1 = Graph.pageRank(g1, "src", "dst", iters = 2)
      .agg(count(lit(1)), sum("rank")).head
    val t1 = (System.nanoTime() - t0a) / 1e9
    val t0b = System.nanoTime()
    val rN = Graph.pageRank(gN, "src", "dst", iters = 2)
      .agg(count(lit(1)), sum("rank")).head
    val tN = (System.nanoTime() - t0b) / 1e9
    // disjoint replication: N× vertices, total mass still exactly 1
    // (teleport (1-d)/(N·n) makes each replica an independent PageRank
    // scaled by 1/N), iteration count FIXED — growth is per-pass-linear
    assert(rN.getLong(0) === N * r1.getLong(0))
    assert(math.abs(r1.getDouble(1) - 1.0) < 1e-6 &&
      math.abs(rN.getDouble(1) - 1.0) < 1e-6)
    assertSubQuadratic("pageRank", t1, tN,
      () => (timedCount(Graph.pageRank(g1, "src", "dst", iters = 2))._2,
        timedCount(Graph.pageRank(gN, "src", "dst", iters = 2))._2))
    g1.unpersist(); gN.unpersist()
  }

  test("triangleCounts: 10x disjoint replica graphs -> exactly 10x triangles, ~linear time") {
    import graft.operators.Graph
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val base = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").cast("string").as("a"), col("y.pk").cast("string").as("b"))
      .distinct().cache()
    base.count()
    def edgesTimes(n: Int): DataFrame =
      (0 until n).map { i =>
        base.select(concat(lit(s"g$i-"), col("a")).as("a"),
          concat(lit(s"g$i-"), col("b")).as("b"))
      }.reduce(_ unionByName _)
    val e1 = edgesTimes(1).cache(); e1.count()
    val eN = edgesTimes(N).cache(); eN.count()
    Graph.triangleCounts(e1, "a", "b").count() // warmup
    def total(df: DataFrame): Long =
      Graph.triangleCounts(df, "a", "b")
        .agg(coalesce(sum("n_triangles"), lit(0L))).head.getLong(0)
    val t0a = System.nanoTime(); val c1 = total(e1)
    val t1 = (System.nanoTime() - t0a) / 1e9
    val t0b = System.nanoTime(); val cN = total(eN)
    val tN = (System.nanoTime() - t0b) / 1e9
    info(s"triangle corner-credits: 1x=$c1 ${N}x=$cN")
    assert(c1 > 0, "probe needs a non-empty base triangle population")
    assert(cN === N * c1,
      s"disjoint replicas must give exactly ${N}x triangles: $c1 -> $cN")
    assertSubQuadratic("triangleCounts", t1, tN,
      () => (timedCount(Graph.triangleCounts(e1, "a", "b"))._2,
        timedCount(Graph.triangleCounts(eN, "a", "b"))._2))
    e1.unpersist(); eN.unpersist(); base.unpersist()
  }

  test("kmeansPortable: 10x corpus -> exactly 10x assignments, ~linear time") {
    import graft.operators.Clustering
    def corpusTimes(n: Int): DataFrame =
      (0 until n).map { i =>
        emb.select((col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
          col("embedding"))
      }.reduce(_ unionByName _)
    val c1 = corpusTimes(1).cache(); c1.count()
    val cN = corpusTimes(N).cache(); cN.count()
    def run(df: DataFrame) =
      Clustering.kmeansPortable(df, "vec_id", "embedding", k = 8, iters = 1)
    run(c1).count() // warmup
    val (r1, t1) = timedCount(run(c1))
    val (rN, tN) = timedCount(run(cN))
    // assignment is a per-row projection and the update one k·dim-wide
    // hash agg: row-linear by construction, and row counts must match
    assert(r1 === c1.count() && rN === cN.count())
    assertSubQuadratic("kmeansPortable", t1, tN,
      () => (timedCount(run(c1))._2, timedCount(run(cN))._2))
    c1.unpersist(); cN.unpersist()
  }

  test("kcore: 10x disjoint replica graphs -> exactly 10x survivors, ~linear time") {
    import graft.operators.Graph
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(concat(lit("p"), col("l_partkey").cast("string")).as("src"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
      .distinct()
    def graphTimes(n: Int): DataFrame =
      (0 until n).map { i =>
        li.select(concat(lit(s"g$i-"), col("src")).as("src"),
          concat(lit(s"g$i-"), col("dst")).as("dst"))
      }.reduce(_ unionByName _)
    val g1 = graphTimes(1).cache(); g1.count()
    val gN = graphTimes(N).cache(); gN.count()
    def run(g: DataFrame) = Graph.kcore(g, "src", "dst", k = 3, rounds = 2)
    run(g1).count() // warmup
    val (c1, t1) = timedCount(run(g1))
    val (cN, tN) = timedCount(run(gN))
    // each replica is an isomorphic independent component: the peel
    // decomposes exactly, so survivors scale exactly linearly
    assert(cN === N * c1,
      s"disjoint replicas must peel independently: $c1 -> $cN")
    assertSubQuadratic("kcore", t1, tN,
      () => (timedCount(run(g1))._2, timedCount(run(gN))._2))
    g1.unpersist(); gN.unpersist()
  }

  test("labelPropagation: 10x disjoint replica graphs -> exactly 10x labeled, ~linear time") {
    import graft.operators.Graph
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(concat(lit("p"), col("l_partkey").cast("string")).as("src"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
      .distinct()
    def graphTimes(n: Int): DataFrame =
      (0 until n).map { i =>
        li.select(concat(lit(s"g$i-"), col("src")).as("src"),
          concat(lit(s"g$i-"), col("dst")).as("dst"))
      }.reduce(_ unionByName _)
    // seeds mirror per replica: every part vertex whose key ends in 0
    // carries a label derived from its tens digit — suffix-preserved
    // renaming, so the seed structure replicates exactly
    def seedsOf(g: DataFrame): DataFrame = g
      .select(col("src").as("v")).distinct()
      .filter(col("v").endsWith("0"))
      .withColumn("l", concat(lit("L"), substring(col("v"), -2, 1)))
    val g1 = graphTimes(1).cache(); g1.count()
    val gN = graphTimes(N).cache(); gN.count()
    def run(g: DataFrame) = Graph.labelPropagation(
      g, "src", "dst", seedsOf(g), "v", "l", iters = 2)
    run(g1).count() // warmup
    def labeled(g: DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val c = run(g).filter(col("label").isNotNull).count()
      (c, (System.nanoTime() - t0) / 1e9)
    }
    val (c1, t1) = labeled(g1)
    val (cN, tN) = labeled(gN)
    assert(c1 > 0, "seeds must spread somewhere on the base graph")
    assert(cN === N * c1,
      s"disjoint replicas must propagate independently: $c1 -> $cN")
    assertSubQuadratic("labelPropagation", t1, tN,
      () => (labeled(g1)._2, labeled(gN)._2))
    g1.unpersist(); gN.unpersist()
  }

  test("bipartiteProject: 10x disjoint replicas -> exactly 10x weighted pairs, ~linear time") {
    import graft.operators.Graph
    // replica i offsets BOTH sides into a disjoint key space, so each
    // replica's projection is exactly the base's — pair multiset must
    // be exactly N x and the per-left cap applies within replicas only
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("l"), col("l_partkey").as("r")).cache()
    li.count()
    def reps(n: Int): DataFrame =
      (0 until n).map { i =>
        li.select((col("l") + lit(i.toLong * 10000000L)).as("l"),
          (col("r") + lit(i.toLong * 10000000L)).as("r"))
      }.reduce(_ unionByName _)
    val r1 = reps(1).cache(); r1.count()
    val rN = reps(N).cache(); rN.count()
    def run(df: DataFrame) = Graph.bipartiteProject(df, "l", "r", 8)
    run(r1).count() // warmup
    val (p1, t1) = timedCount(run(r1))
    val w1 = run(r1).agg(sum("weight")).head.getLong(0)
    val (pN, tN) = timedCount(run(rN))
    val wN = run(rN).agg(sum("weight")).head.getLong(0)
    info(s"pairs: 1x=$p1 ${N}x=$pN; weight mass: $w1 -> $wN")
    assert(p1 > 0 && pN === N * p1, "disjoint replicas: exactly Nx pairs")
    assert(wN === N * w1, "exactly Nx weight mass")
    assertSubQuadratic("bipartiteProject", t1, tN,
      () => (timedCount(run(r1))._2, timedCount(run(rN))._2))
    r1.unpersist(); rN.unpersist(); li.unpersist()
  }

  test("epsNeighborCounts: 10x disjoint coordinate bands -> 10x identical counts, ~linear time") {
    import graft.operators.Outliers
    // replica i shifts y by i·10⁴ ≫ ε: bands never interact, so each
    // replica's neighborhood structure is EXACTLY the base's — total
    // neighbor mass must be exactly N× and any extra candidate work
    // is a blocking artifact
    val base = emb.select(col("vec_id").as("id"),
      (element_at(col("embedding"), 1) * 10.0).as("x"),
      (element_at(col("embedding"), 2) * 10.0).as("y")).cache()
    base.count()
    def bands(n: Int): DataFrame =
      (0 until n).map { i =>
        base.select((col("id") + lit(i.toLong * 1000000L)).as("id"),
          col("x"), (col("y") + lit(i * 10000.0)).as("y"))
      }.reduce(_ unionByName _)
    val b1 = bands(1).cache(); b1.count()
    val bN = bands(N).cache(); bN.count()
    def run(df: DataFrame) =
      Outliers.epsNeighborCounts(df, "id", "x", "y", eps = 1.0, minPts = 3)
    run(b1).count() // warmup
    val sum1 = run(b1).agg(sum("n_neighbors")).head.getLong(0)
    val (r1, t1) = timedCount(run(b1))
    val sumN = run(bN).agg(sum("n_neighbors")).head.getLong(0)
    val (rN, tN) = timedCount(run(bN))
    info(s"rows: 1x=$r1 ${N}x=$rN; neighbor mass: $sum1 -> $sumN")
    assert(r1 > 0 && rN === N * r1, "row-preserving at every scale")
    assert(sumN === N * sum1,
      s"disjoint bands must give exactly ${N}x neighbor mass: $sum1 -> $sumN")
    assertSubQuadratic("epsNeighborCounts", t1, tN,
      () => (timedCount(run(b1))._2, timedCount(run(bN))._2))
    b1.unpersist(); bN.unpersist(); base.unpersist()
  }

  test("postingLists: 10x corpus with 10x df gates -> same tokens, 10x df, ~linear time") {
    import graft.operators.TextAnalysis
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    base.count()
    // replicate docs verbatim under disjoint id spans: every token's
    // document frequency scales exactly 10x, so gates scaled 10x keep
    // the SAME token set and the capped postings stay cap-sized —
    // the posting table grows with the lexicon, not the corpus
    def docsTimes(n: Int): DataFrame =
      (0 until n).map { i =>
        base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          col("text"))
      }.reduce(_ unionByName _)
    val d1 = docsTimes(1).cache(); d1.count()
    val dN = docsTimes(N).cache(); dN.count()
    def run(df: DataFrame, scale: Int): DataFrame =
      TextAnalysis.postingLists(df, "doc_id", "text",
        minDf = 5 * scale, maxDf = 400 * scale, maxPostings = 20)
    run(d1, 1).count() // warmup
    val (r1, t1) = timedCount(run(d1, 1))
    val (rN, tN) = timedCount(run(dN, N))
    info(s"posting rows: 1x=$r1 ${N}x=$rN")
    assert(r1 > 0 && rN === r1,
      s"10x corpus with 10x gates must keep the token set: $r1 -> $rN")
    val df1 = run(d1, 1).agg(sum("df")).head.getLong(0)
    val dfN = run(dN, N).agg(sum("df")).head.getLong(0)
    assert(dfN === N * df1, s"true df must scale exactly ${N}x: $df1 -> $dfN")
    assertSubQuadratic("postingLists", t1, tN,
      () => (timedCount(run(d1, 1))._2, timedCount(run(dN, N))._2))
    d1.unpersist(); dN.unpersist(); base.unpersist()
  }
}
