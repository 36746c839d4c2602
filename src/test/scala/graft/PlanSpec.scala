package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import graft.SparkEntry

/** Plan-shape audits: the properties that make these plans survive a
  * 100× scale-up are asserted here so a refactor can't silently lose
  * them (filter pushdown, column pruning, broadcast joins, top-k
  * without global sort, whole-stage codegen).
  */
class PlanSpec extends SparkTestBase {

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("GLOBAL sweep: no judged query plans a CartesianProduct") {
    // the one standing exception: q_join_cross IS a cross join by
    // definition (nation × region, 125 rows, §2.3 J6)
    val exempt = Set("q_join_cross")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(exempt)
      .flatMap { name =>
        val p = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(ExplainMode.fromString("simple"))
        if (p.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"queries planning a cartesian product: ${offenders.mkString(", ")}")
  }

  test("filters reach the parquet scan (pushdown)") {
    val p = plan("q_filter_cmp")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThan[^\\]]*.*")
      || p.matches("(?s).*PushedFilters: \\[[^\\]]*LessThan[^\\]]*.*"),
      s"no comparison filter pushed to the scan:\n$p")
  }

  test("projection prunes the scan schema (column pruning)") {
    val p = plan("q_scan_project")
    // lineitem has 11+ columns; the query touches 5. The scan must not
    // read l_comment (never referenced).
    assert(!p.contains("l_comment"), s"scan reads unreferenced columns:\n$p")
  }

  test("dimension joins broadcast; the fact table never shuffles for them") {
    val p = plan("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"dim join fell back to sort-merge:\n$p")
  }

  test("global top-k uses TakeOrderedAndProject, not a full sort") {
    val p = plan("q_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), s"top-k plan regressed:\n$p")
  }

  test("every global top-k cut is TakeOrderedAndProject, not a single-partition window") {
    // r11: these operators used to rank with row_number() OVER (ORDER
    // BY …) — an Exchange SinglePartition + full sort of a candidate/
    // vocabulary-sized frame. The cut is now orderBy+limit; the only
    // window allowed is one that runs AFTER the limit (≤ k rows).
    for (name <- Seq("q_vocab_coverage", "q_zipf_fit",
        "q_pmi_pairs", "q_trending", "q_top_paths")) {
      val p = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(ExplainMode.fromString("simple"))
      assert(p.contains("TakeOrderedAndProject"),
        s"$name: top-k cut is not TakeOrderedAndProject:\n$p")
    }
    // q_link_pred takes the r18 driver fast path on fixture-sized edge
    // lists (its judged plan is a Scan ExistingRDD of the driver
    // result — asserted in the linkPrediction test below); the
    // DISTRIBUTED cut shape is pinned by direct operator call with the
    // fast path disabled.
    val lp = graft.operators.Graph.linkPrediction(
      graft.queries.GraphOps.coOrderParts(spark, sfDir, 7), "a", "b",
      maxMiddleDegree = 50, k = 20, driverMaxEdges = 0L)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(lp.contains("TakeOrderedAndProject"),
      s"linkPrediction (distributed): top-k cut is not TakeOrderedAndProject:\n$lp")
  }

  test("negativeSample indexes candidates via denseIds, not a global window") {
    // the dense 1..N candidate index must ride Indexing.denseIds
    // (range exchange + mapPartitions counter), never a bare
    // row_number() window over the whole pool on one partition
    val p = SparkEntry.queries("q_negative_sample")(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // denseIds' mapPartitions counter is localCheckpoint'ed, so it
    // surfaces as Scan ExistingRDD; the old shape was a row_number
    // Window (absent now — the only Window left is the P-row offset
    // cumsum inside denseIds)
    assert(p.contains("ExistingRDD"),
      s"q_negative_sample: denseIds kernel missing from plan:\n$p")
    assert(!p.contains("row_number"),
      s"q_negative_sample: single-partition row_number window is back:\n$p")
  }

  test("round-13 plan shapes: binned tau pair join hashes, qini rides denseIds") {
    // kendallTauBinned's cell-pair join carries a group EQUALITY, so
    // it must plan as a hash/sort-merge join with the qx inequality as
    // a residual condition — never a nested-loop over the cells
    val tau = SparkEntry.queries("q_kendall_binned")(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!tau.contains("BroadcastNestedLoopJoin")
      && !tau.contains("CartesianProduct"),
      s"q_kendall_binned: cell-pair join degenerated to nested loop:\n$tau")
    // qiniCurve ranks through Indexing.denseIds (the liftCurve
    // contract) — a bare global row_number window must never return
    val qini = SparkEntry.queries("q_qini")(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(qini.contains("ExistingRDD"),
      s"q_qini: denseIds kernel missing:\n$qini")
    assert(!qini.contains("row_number"),
      s"q_qini: single-partition row_number window is back:\n$qini")
    // breakpointScan: every corpus-sized window partitions by the
    // group key; the executed plan must not warn-shape an
    // unpartitioned sort of the cells (the bins-sized argmax window
    // partitions by _g too)
    val bp = SparkEntry.queries("q_breakpoint")(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!bp.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"),
      s"q_breakpoint: corpus window lost its group partitioning:\n$bp")
  }

  test("round-14 plan shape: linkPrediction never broadcasts the edge table") {
    // the r14 watch-item fix: join strategies are PINNED — the path-2
    // probe and the not-linked anti-join must be merge joins whatever
    // the edge frame's LogicalRDD stats claim (a cache-read frame's
    // tiny stats used to flip BOTH to full-edge-table broadcasts);
    // r15: the mids join is merge-pinned too (the degree-capped vertex
    // list is most vertices of a big graph, not broadcast-safe).
    // r19: the judged q_link_pred takes the r18 driver fast path on
    // fixture-sized inputs, so the DISTRIBUTED shape is pinned via a
    // direct operator call with the fast path disabled…
    val lp = graft.operators.Graph.linkPrediction(
      graft.queries.GraphOps.coOrderParts(spark, sfDir, 7), "a", "b",
      maxMiddleDegree = 50, k = 20, driverMaxEdges = 0L)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    val smjCount = "SortMergeJoin".r.findAllIn(lp).length
    assert(smjCount >= 3,
      s"linkPrediction (distributed): expected merge joins for the " +
        s"mids, path-2 and anti joins, got $smjCount:\n$lp")
    assert(!lp.contains("BroadcastHashJoin LeftAnti")
      && !lp.contains("LeftAnti, BuildRight"),
      s"linkPrediction (distributed): the not-linked anti-join " +
        s"broadcast the edge table:\n$lp")
    // …and the dual: under the bound the judged plan IS the collapsed
    // driver result (Scan ExistingRDD, no joins left to mis-plan).
    val judged = SparkEntry.queries("q_link_pred")(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(judged.contains("ExistingRDD"),
      s"q_link_pred: driver fast path did not engage under the bound:\n$judged")
    assert(!judged.contains("SortMergeJoin"),
      s"q_link_pred: driver-path plan still contains distributed joins:\n$judged")
  }

  test("TPC-H Q1 aggregation is partial (map-side) + final, codegen'd") {
    val df = SparkEntry.queries("q_agg_tpch1")(spark, sfDir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // partial + final pair: two HashAggregate nodes around the exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"no map-side partial aggregation:\n$p")
    // codegen spans only materialize in the executed plan under AQE
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("*("), // codegen stage markers, e.g. *(1) HashAggregate
      s"agg fell out of whole-stage codegen:\n$executed")
  }

  test("IVFADC search: cell-pruned broadcast join + k-bounded partial top-k") {
    val df = SparkEntry.queries("q_ann_ivfpq")(spark, sfDir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    // the code table equi-joins the broadcast probe×cell side — never a
    // cross join of corpus × probes
    assert(p.contains("BroadcastHashJoin"), s"expected cell equi-join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"IVFADC must not scan corpus × probes:\n$p")
    // the top-k is a partial aggregate: each map task forwards at most
    // k structs per probe BEFORE the exchange (the r9-verdict fix for
    // the row_number full-shuffle shape) — and no Window buffers groups
    assert(p.contains("partial_topk_struct"),
      s"top-k must be map-side partial-aggregated:\n$p")
    assert(!p.contains("Window"), s"window top-k shape regressed:\n$p")
  }

  test("as-of join plans exactly one hash shuffle of the unioned stream") {
    val p = plan("q_join_asof")
    // one hashpartitioning exchange feeds the window; the only other
    // exchange is the final presentation ORDER BY (rangepartitioning)
    val hashExchanges = "Arguments: hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1,
      s"as-of join should hash-shuffle once by key, found $hashExchanges:\n$p")
  }

  test("LSH candidate generation contains no nested-loop join") {
    val p = plan("q_ann_lsh")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"LSH path must stay equi-join shaped:\n$p")
  }

  test("bloom join's probe-side membership filter sits below the join") {
    val df: DataFrame = SparkEntry.queries("q_join_bloom")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    val joinIdx = p.indexOf("Join")
    val udfIdx = p.indexOf("UDF")
    assert(joinIdx >= 0, s"no join in bloom-join plan:\n$p")
    // children print below their parent: the bloom membership UDF
    // filter must be a descendant of the join (pruning before the
    // probe side shuffles), not a post-join filter above it
    assert(udfIdx > joinIdx,
      s"bloom membership filter is not below the join:\n$p")
    // and it must sit on the probe (orders) scan branch: between the
    // join and a parquet scan of orders
    val scanAfterUdf = p.indexOf("parquet", udfIdx)
    assert(scanAfterUdf >= 0,
      s"bloom filter does not guard a parquet scan branch:\n$p")
  }

  test("judged binned range join contains no nested-loop join") {
    val p = plan("q_join_range_binned")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"binned range join must stay equi-join shaped:\n$p")
  }

  test("MinHash signature and SimHash stages plan ZERO exchanges") {
    // tokenization, per-doc dedup, and sketching are per-row functions,
    // so the signature stage must be a narrow projection — any Exchange
    // here means a token-granularity shuffle crept back in (the r2
    // shape this repo deliberately deleted).
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sigPlan = graft.operators.Dedup
      .minHashSignatures(docs, "doc_id", "text", 24)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!sigPlan.contains("Exchange"),
      s"MinHash signatures must not shuffle:\n$sigPlan")
    val simPlan = graft.operators.Dedup.simHash(docs, "doc_id", "text")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!simPlan.contains("Exchange"),
      s"SimHash signatures must not shuffle:\n$simPlan")
  }

  test("LSH near-dup's first shuffle is the banded join itself") {
    val p = plan("q_dedup_lsh_jaccard")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"LSH dedup must stay equi-join shaped:\n$p")
    // signature + banding are projections; exchanges exist only for the
    // candidate join, distinct, verify joins, and final ORDER BY
    val hashExchanges = "Arguments: hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges <= 6,
      s"unexpected extra shuffles in LSH dedup ($hashExchanges):\n$p")
  }

  test("fuzzy join stays equi-join shaped; neighborhood gen never shuffles") {
    val p = plan("q_fuzzy_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"deletion-neighborhood join must not plan a quadratic join:\n$p")
    // verification rides the candidate rows: levenshtein must not add a
    // join of its own. Count in the plan TREE only (formatted explain
    // repeats every node in its details section).
    val tree = p.split("\n\n")(0)
    assert("SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findAllIn(tree).size <= 1, s"fuzzy join should be ONE candidate join:\n$p")
  }

  test("LM scoring trains from one bigram aggregation; vocab joins broadcast") {
    val p = plan("q_lm_score")
    // the only cartesian-ish shape allowed is the one-row vocab
    // cross join, which must come in as a broadcast
    assert(!p.contains("CartesianProduct"),
      s"lm score must broadcast the one-row vocab, not cartesian:\n$p")
    // ...and positively: the vocab attach is an explicit
    // BroadcastNestedLoopJoin (crossJoin(broadcast(vocab)),
    // TextAnalysis.lmScoreCross) — not left to AQE's runtime stats
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the one-row vocab must attach via BroadcastNestedLoopJoin:\n$p")
  }

  test("profile is one aggregation pass: single scan, Expand for distincts") {
    val p = plan("q_profile")
    val scans = "Scan parquet".r.findAllIn(p.split("\n\n")(0)).size
    assert(scans === 1, s"profile must scan the table once, saw $scans:\n$p")
    assert(p.contains("Expand"), s"exact-distinct profile plans via Expand:\n$p")
  }

  test("offset packing plans exactly one hash shuffle (the shard sort)") {
    // the running-sum window is the only exchange; the fingerprint-of-
    // scale claim for packByOffset is "one sort shuffle per shard key,
    // no sequential state" — pin it
    val p = plan("q_pack_offset")
    val hashExchanges = "Arguments: hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1,
      s"offset packing must shuffle once, on the shard key ($hashExchanges):\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("corpus mixing is scan + per-row filter only: zero exchanges before sort") {
    // each source must be one scan with its keep/drop predicate applied
    // map-side; the union is plan-level. The only exchange allowed is
    // the judged query's final ORDER BY (a range partition, not hash).
    val p = plan("q_mix_corpora")
    assert(!p.contains("Arguments: hashpartitioning"),
      s"mixing must not shuffle:\n$p")
  }

  test("train/valid/test split is a pure projection: zero hash exchanges") {
    // the assignment is a per-row hash expression — any exchange means
    // the split stopped being a pushable map-side decision
    val p = plan("q_split_tvt")
    assert(!p.contains("Arguments: hashpartitioning"),
      s"split must not shuffle:\n$p")
  }

  test("resample plans one hash shuffle; both window passes share it") {
    val p = plan("q_resample_interp")
    val hashExchanges = "Arguments: hashpartitioning".r.findAllIn(p).size
    // one shuffle keys the per-user windows; the grid aggregation adds
    // its own partial+final pair, so allow <= 2 hash exchanges — but
    // the two directional window passes must NOT each shuffle
    assert(hashExchanges <= 2,
      s"resample re-shuffles between window passes ($hashExchanges):\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("probe search streams the corpus once; probes broadcast") {
    val p = plan("q_simsearch_probe")
    assert(p.contains("BroadcastExchange"), s"probes must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"probe search must not go cartesian:\n$p")
    // one corpus scan + one probe scan feed the join (formatted mode
    // prints each scan node twice: tree + details => 2 scans = 4 hits);
    // a corpus self-join would double this
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 4, s"more than two scans in probe search:\n$p")
  }

  test("random projection is a narrow projection: zero exchanges, no driver matrix fetch") {
    val p = plan("q_random_projection")
    assert(!p.contains("Exchange") || !p.contains("Arguments: hashpartitioning"),
      s"projection must not shuffle:\n$p")
    assert(!p.contains("BroadcastExchange"),
      s"the sign matrix must be a plan literal, not a broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("bm25 statistics stay in-plan: df broadcast, N/avgdl as broadcast one-row agg") {
    val p = plan("q_bm25")
    assert(p.contains("BroadcastExchange"),
      s"df/stats tables must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the one-row stats attach must be a broadcast nested loop, not cartesian:\n$p")
  }

  test("key skew plans one count shuffle + a one-row reduction") {
    val p = plan("q_key_skew")
    val hashExchanges = "Arguments: hashpartitioning".r.findAllIn(p).size
    // per-key partial+final needs one hash exchange; the final one-row
    // agg runs single-partition (no second hash exchange)
    assert(hashExchanges <= 1,
      s"keySkew must shuffle once, saw $hashExchanges:\n$p")
  }

  test("incremental dedup never self-joins the corpus: banded equi-join only") {
    val p = plan("q_dedup_incremental")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"incremental dedup must stay an equi-join:\n$p")
    // both sides' signature stages are narrow projections — generators
    // (posexplode) appear, but no token-granularity aggregation feeds
    // the join (the sketch is computed per-row)
    assert(p.contains("Generate"), p)
  }

  test("sessionize: one user-keyed exchange; lag and running sum share a sort") {
    val p = plan("q_sessionize")
    val hashExchanges = "Arguments: hashpartitioning".r.findAllIn(p).size
    // 1 for the window; the final orderBy is a range exchange, not hash
    assert(hashExchanges == 1,
      s"sessionize must shuffle once on user_id ($hashExchanges):\n$p")
    val sorts = "^\\(\\d+\\) Sort".r.findAllMatchIn(
      p.linesIterator.mkString("\n")).size
    // one sort for the two stacked windows + the final global orderBy
    assert(sorts <= 2, s"windows must share one sort ($sorts):\n$p")
  }

  test("per-session stats after sessionize need no second hash exchange") {
    val events = graft.tables.TableLoader.events(spark, sfDir)
    val stats = graft.operators.EventWindows
      .sessionize(events, "user_id", "ts", "event_id", 1800L)
      .groupBy("user_id", "session_no")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val p = stats.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val hashExchanges = "Arguments: hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1,
      s"user_id partitioning already clusters (user_id, session_no) " +
        s"($hashExchanges):\n$p")
  }

  test("CDC merge shuffles once on the key; snapshot diff is one join") {
    val p = plan("q_cdc_merge")
    // base ∪ changes feed ONE row_number window: a single hash exchange
    // (plus the presentation ORDER BY as range partitioning)
    val hashExchanges = "Arguments: hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1,
      s"changelog merge must shuffle once on the key ($hashExchanges):\n$p")
    val d = plan("q_snapshot_diff")
    val tree = d.split("\n\n")(0)
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(tree).size == 1,
      s"snapshot diff must be ONE full-outer join:\n$d")
    assert(!d.contains("CartesianProduct") && !d.contains("NestedLoop"), d)
  }

  test("block dedup: ONE block explode, window holder, no self-join") {
    val p = plan("q_dedup_blocks")
    // the window formulation scans the corpus once: one Generate for
    // the block explode (an agg+join dual costs two), no join at all
    // for holder resolution
    val tree = p.split("\n\n")(0)
    assert("Generate".r.findAllIn(tree).size == 1,
      s"block dedup must explode blocks exactly once:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    // block window + doc rebuild + row-preserving join back (+
    // presentation sort as range partitioning)
    val hashExchanges = "Arguments: hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges <= 3,
      s"unexpected extra shuffles in block dedup ($hashExchanges):\n$p")
  }

  test("sparse cosine stays inverted-index equi-join shaped") {
    val p = plan("q_sparse_cosine")
    assert(!p.contains("CartesianProduct"),
      s"sparse cosine must join through the term posting lists only:\n$p")
    // the only nested-loops are replicas of the sanctioned ONE-ROW
    // corpus-N attach (crossJoin(broadcast(count)) — the tfidf
    // pattern; the weighted subtree appears once for norms and once
    // per join side, so the attach shows up to 4 times). Every one
    // must be a Cross BuildRight of that one-row aggregate; a nested
    // loop between row-bearing sides would be a quadratic join.
    val tree = p.split("\n\n")(0)
    val nested = "BroadcastNestedLoopJoin".r.findAllIn(tree).size
    val crossBuild = "BroadcastNestedLoopJoin Cross BuildRight".r.findAllIn(tree).size
    assert(nested == crossBuild && nested <= 4,
      s"unexpected nested-loop joins ($nested, $crossBuild cross-build):\n$p")
    // corpus N rides in-plan (broadcast), not a driver literal
    assert(p.contains("BroadcastExchange"), p)
  }

  test("dense ids: data rides a range partition, never a global-window collapse") {
    val p = plan("q_dense_ids")
    assert(p.contains("rangepartitioning"),
      s"dense ids must range-partition the data path:\n$p")
    // the only SinglePartition work is the P-row offset table (its
    // subtree is an aggregate of partition counts); the FULL data must
    // not flow through a single partition — which is exactly what the
    // naive ROW_NUMBER() OVER (ORDER BY ...) oracle does. A Window
    // node over the raw scan would betray that shape here.
    val tree = p.split("\n\n")(0)
    val windows = "\\bWindow\\b".r.findAllIn(tree).size
    assert(windows <= 1, s"unexpected data-path windows ($windows):\n$p")
  }

  test("no judged query collects to the driver mid-plan") {
    // structural guarantee: every queries() entry returns a DataFrame
    // whose plan tree Spark owns end-to-end; a driver-side collect in
    // an operator would have already materialized here. Spot-check the
    // tfidf plan (the r01 offender) for a single job's worth of plan.
    val p = plan("q_tfidf")
    assert(p.contains("HashAggregate"), p)
    // the in-plan corpus count appears as a broadcast exchange, not as
    // a pre-computed literal
    assert(p.contains("BroadcastExchange") || p.contains("Subquery"),
      s"corpus N must be computed in-plan:\n$p")
  }

  test("sorted-neighborhood pairing is join-free: one window, a generator, no Join node") {
    val p = plan("q_sorted_neighborhood")
    assert(!p.contains("Join"),
      s"the lead-array pairing must not plan any join:\n$p")
    assert(p.contains("Window") && p.contains("Generate"), p)
  }

  test("bootstrap CI: generator fan-out partial-aggregates before its one replica shuffle") {
    val p = plan("q_bootstrap_ci")
    assert(!p.contains("SortMergeJoin"),
      s"group-sized CI attach must broadcast:\n$p")
    assert(p.contains("Generate"), s"B-way fan-out must be a generator:\n$p")
    // corpus-order exchanges: (group, replica) partial-agg shuffle +
    // the group-keyed window/base shuffles — all group-sized or
    // (group×B)-sized; anything beyond 3 means the fan-out itself
    // started shuffling
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 3, s"unexpected exchange count $exchanges:\n$p")
  }

  test("PSI: per-side counts broadcast onto the grid; no sort-merge anywhere") {
    val p = plan("q_psi")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"bin-count attach fell back to sort-merge:\n$p")
  }

  test("Jaro-Winkler planted pairs: broadcast equi-join, codegen comparator in-plan") {
    val p = plan("q_fuzzy_jw")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("jaro"), s"native comparator missing from plan:\n$p")
  }

  test("KS test: group sizes broadcast onto the value grid, cells attach without sort-merge") {
    val p = plan("q_ks_test")
    assert(p.contains("BroadcastExchange"),
      s"group-cardinality table must broadcast onto the grid:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"grid joins must stay broadcast (groups + one-row N are tiny):\n$p")
  }

  test("Markov transitions: one key window + one pair agg, no Join node") {
    val p = plan("q_markov")
    assert(!p.contains("Join"),
      s"origin totals must ride a window, not a join:\n$p")
    assert(p.contains("Window"), p)
  }

  test("CUSUM: per-group totals broadcast; no sort-merge join") {
    val p = plan("q_cusum")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"group-sized totals attach must broadcast:\n$p")
  }

  test("zone maps: ONE aggregation pair over the scan (partial + final)") {
    val p = plan("q_zonemap")
    // tree lines only ("SortAggregate (7)") — the formatted details
    // section repeats each node as "(7) SortAggregate"
    val aggs = "(Hash|Sort|ObjectHash)Aggregate \\(".r.findAllIn(p).size
    assert(aggs == 2, s"zoneMap must scan once (got $aggs agg nodes):\n$p")
  }

  test("pseudonymize: tokens are per-row projections; the join keys on them") {
    val p = plan("q_pseudonymize")
    assert(p.contains("md5"), s"salted md5 must be in-plan:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"token join must stay an equi-join:\n$p")
  }

  test("grid density: cell fan-out is a generator feeding an equi-join") {
    val p = plan("q_density_grid")
    assert(p.contains("Generate"),
      s"3x3 probe fan-out must be an in-stage generator:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"cell join must stay an equi-join:\n$p")
  }

  test("rfm: ranks come from denseIds checkpoints, never a whole-data window") {
    val p = plan("q_rfm")
    // the rank machinery executes inside denseIds (range partition +
    // local index, lineage truncated) — the judged plan must read its
    // checkpointed output, and the only Window allowed is the P-row
    // offset cumulative over a partition-count AGGREGATE. A bare
    // ROW_NUMBER() OVER (ORDER BY ...) over the customer frame would
    // show up as an extra Window node here.
    assert(p.contains("localCheckpoint at Indexing.scala"),
      s"ranks must ride the denseIds range-partition machinery:\n$p")
    val tree = p.split("\n\n")(0)
    val windows = "\\bWindow\\b".r.findAllIn(tree).size
    assert(windows <= 1, s"unexpected data-path windows ($windows):\n$p")
  }

  test("posting lists: scan prunes to (doc_id, text); one token shuffle family") {
    val p = plan("q_posting_lists")
    assert(!p.contains("n_chars") && !p.contains("lang"),
      s"documents scan reads unreferenced columns:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"no blowup joins:\n$p")
  }

  test("attribution: both policies from one window pass, no self-join") {
    val p = plan("q_attribution")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"first+last touch must come from windows over one scan, not joins:\n$p")
  }

  test("naive bayes: the vocabulary grid broadcasts into scoring") {
    // a shuffle join here would hash the doc-token table onto
    // vocabulary-cardinality keys — skew by construction
    val p = plan("q_naive_bayes")
    assert(p.contains("BroadcastHashJoin"),
      s"the V x C grid must broadcast:\n$p")
  }

  test("collocations and textrank cut top-k without a global sort") {
    assert(plan("q_collocations").contains("TakeOrderedAndProject"),
      "PMI cut regressed to a full sort")
    assert(plan("q_textrank").contains("TakeOrderedAndProject"),
      "keyword cut regressed to a full sort")
  }

  test("confusion panel: one aggregate over the scan, no joins, no windows") {
    val p = plan("q_confusion")
    val tree = p.split("\n\n")(0)
    assert(!tree.contains("Join"), s"confusion cells need no join:\n$p")
    assert(!"\\bWindow\\b".r.findFirstIn(tree).isDefined,
      s"confusion cells need no window:\n$p")
  }

  test("languageIdTrained: the profile/doc top-K cuts are bounded heap " +
      "aggregates, not per-language sort windows") {
    // r16 verdict item 8: the old row_number() OVER (PARTITION BY lang
    // ORDER BY count, gram) sorted each language's WHOLE gram
    // vocabulary in one task. r19: gram counting + the K cut are ONE
    // native aggregate (gram_topk_struct — map-side partials ship
    // vocabulary-bounded count maps per key); the char-level explode
    // is gone, so the only Generates left are the two bounded
    // posexplodes of the K-row rank arrays, and the single window is
    // the per-DOC argmin over |langs| rows.
    val p = plan("q_langid_profile")
    val tree = p.split("\n\n")(0)
    assert(p.contains("gram_topk_struct"), // agg names live in details
      s"gram counting must ride the native gram aggregate:\n$p")
    // bounded posexplodes only: docRank ×1 + the profile subtree ×2
    // (it feeds both the langs distinct and the rank join); the old
    // char-level shape added a |text|-row explode under EVERY one
    val generates = "\\bGenerate\\b".r.findAllIn(tree).size
    assert(generates <= 3,
      s"char-level explode fan-out is back ($generates Generates):\n$p")
    val windows = "\\bWindow\\b".r.findAllIn(tree).size
    assert(windows <= 1,
      s"only the per-doc argmin window is allowed, found $windows:\n$p")
  }
}
