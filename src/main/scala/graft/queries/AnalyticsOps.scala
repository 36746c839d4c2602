package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{EventWindows, Profiling, RankEval, Resample, Scoring, Spectral, Stats, TextAnalysis}
import QueryDefs._

/** Round-8 judged queries: spectral projection, ranking-agreement
  * evaluation, time-decayed aggregation, cross-doc duplicate-n-gram
  * quality, and the source-vocabulary Jaccard matrix. Oracles replay
  * the identical arithmetic in DuckDB under the SURVEY.md §5.4
  * determinism rules (rounded quanta, total orders, exact-integer
  * ratios wherever possible).
  */
object AnalyticsOps {

  /** Two unrolled power iterations to the dominant principal
    * direction, then per-vector projections — every cross-row sum
    * 6-dp-quantized, the start vector ROUND(1/sqrt(d), 6) computed
    * from the same closed form on both engines.
    */
  val qPcaPower: QueryFn = withTables { spark =>
    Spectral.principalProjection(
        spark.table("embeddings"), "vec_id", "embedding", iters = 2)
      .orderBy("vec_id")
  }

  /** Truncated RBO@10 (p=0.9) between two user rankings per event
    * type: by 6-dp-rounded total value vs by event count. Rank
    * comparators are total orders; the depth weights are one shared
    * literal table on both engines.
    */
  val qRboEval: QueryFn = withTables { spark =>
    val ev = spark.table("events")
    def ranking(metric: Column) = ev
      .groupBy(col("event_type"), col("user_id"))
      .agg(metric.as("m"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(col("m").desc_nulls_last, col("user_id"))))
      .filter(col("rnk") <= 10)
    val byValue = ranking(round(sum(col("value")), 6))
    val byCount = ranking(count(lit(1)))
    RankEval.rbo(byValue, byCount, "event_type", "user_id", "rnk",
        k = 10, p = 0.9)
      .orderBy("event_type")
  }

  /** Stepped-half-life decayed value sums per (event_type, user):
    * weights are exact dyadic 2^(-k), so the only cross-engine float
    * work is the final 6-dp-rounded sum.
    */
  val qDecayAgg: QueryFn = withTables { spark =>
    Resample.decayedSum(spark.table("events"),
        Seq("event_type", "user_id"), "ts", "value",
        asOf = "2024-02-01", halfLifeDays = 7)
      .orderBy("event_type", "user_id")
  }

  /** Cross-document duplicate-5-gram fraction per doc (MassiveText
    * quality rule): exact integer ratio, 6-dp-rounded; short docs
    * report 0 spans and a NULL fraction.
    */
  val qDupNgrams: QueryFn = withTables { spark =>
    TextAnalysis.duplicateNgramFraction(
        spark.table("documents"), "doc_id", "text", n = 5, minDocs = 2)
      .orderBy("doc_id")
  }

  /** Pairwise source-vocabulary Jaccard matrix: pure set-overlap
    * integers until the final rounded ratio.
    */
  val qVocabJaccard: QueryFn = withTables { spark =>
    TextAnalysis.vocabJaccard(spark.table("documents"), "source", "text")
      .orderBy("g1", "g2")
  }

  /** Per-event-type ROC AUC of the value score against an
    * even-JSON-k label via the rank-sum identity: exact
    * integer/dyadic arithmetic end-to-end (tie-averaged ranks are
    * half-integers), one final rounded division.
    */
  val qAucEval: QueryFn = withTables { spark =>
    // coalesce mirrors the oracle's CASE ... ELSE 0: a row with a
    // missing/non-numeric k is a NEGATIVE on both engines, never a
    // silently-excluded NULL label
    RankEval.aucRank(spark.table("events"), "event_type", "value",
        coalesce(get_json_object(col("props"), "$.k").cast("bigint")
          % 2 === 0, lit(false)))
      .orderBy("event_type")
  }

  /** Cohen's kappa between the labeled language and a source-prior
    * classifier (each doc predicted as its source's majority
    * language): the inter-rater agreement number for "how much does
    * source determine language", all-integer until the final
    * divisions.
    */
  val qKappa: QueryFn = withTables { spark =>
    val docs = spark.table("documents")
    val pred = docs.groupBy("source", "lang")
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source")
          .orderBy(col("c").desc, col("lang").asc)))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("pred"))
    RankEval.cohensKappa(
      docs.join(broadcast(pred), Seq("source")),
      col("lang"), col("pred"))
  }

  /** Reliability table (10 bins) for a min-max-normalized value
    * "confidence" against the purchase label: confidences are
    * 6-dp-quantized BEFORE binning, so bin membership is
    * engine-portable; per-bin stats are rationals of those quanta.
    */
  val qCalibration: QueryFn = withTables { spark =>
    val ev = spark.table("events")
    val mm = ev.agg(min(col("value")).cast("double").as("_lo"),
      max(col("value")).cast("double").as("_hi"))
    val scored = ev.crossJoin(broadcast(mm))
      .withColumn("conf",
        round((col("value") - col("_lo")) / (col("_hi") - col("_lo")), 6))
    RankEval.calibrationBins(scored, col("conf"),
        col("event_type") === "purchase", bins = 10)
      .orderBy("bin")
  }

  /** PSI drift of the value distribution, first half of the month as
    * the frozen reference vs the second half, per event type: 10
    * fixed-width bins over the reference range, add-one smoothing,
    * exact integer ratios until the bins-sized log fold.
    */
  val qPsi: QueryFn = withTables { spark =>
    val ev = spark.table("events")
    val cut = col("ts").cast("date") < lit("2024-01-16").cast("date")
    Profiling.psi(ev.filter(cut), ev.filter(!cut),
        Seq("event_type"), "value", bins = 10)
      .orderBy("event_type")
  }

  /** Jaro + Jaro-Winkler over planted typo pairs (chars 4-5
    * substituted): the pair set is a fixed equi-join — no
    * set-membership boundary to disagree on — and both engines'
    * comparators run the same textbook kernel, diffed at 6 dp.
    * Exercises the native codegen expressions end-to-end.
    */
  val qFuzzyJw: QueryFn = withTables { spark =>
    val base = spark.table("part").filter(col("p_partkey") <= 400)
      .select(col("p_partkey").as("id"), col("p_name").as("s"))
    val variants = base.select(col("id"),
      concat(substring(col("s"), 1, 3), lit("zz"),
        substring(col("s"), 6, 1000000)).as("vs"))
    base.join(variants, Seq("id"))
      .select(col("id").as("i"), (col("id") + 10000).as("j"),
        round(graft.functions.StringSimilarity.jaroCol(
          col("s"), col("vs")), 6).cast("double").as("jaro"),
        round(graft.functions.StringSimilarity.jaroWinklerCol(
          col("s"), col("vs")), 6).cast("double").as("jw"))
      .orderBy("i")
  }

  /** Recall@5 of the dot-product ranking against the exact cosine
    * ranking per probe — the metric-sensitivity probe for the ANN
    * family, and recallAtK judged end-to-end. Both rankings sort raw
    * doubles whose folds are bit-identical cross-engine (index-order
    * accumulation), so the top-k SETS are exact, not fuzzy.
    */
  val qRecallMetric: QueryFn = withTables { spark =>
    val (exact, dot) = twoRankings(spark, depth = 5)
    RankEval.recallAtK(dot, exact, "probe_id", "corpus_id", "rank", k = 5)
      .orderBy("probe_id")
  }

  /** Gini concentration of document length per language: exact
    * integer sums (decimal-accumulated) to one final rounded
    * division; tie-order-invariant, so the rank windows need no
    * cross-engine total order.
    */
  val qGini: QueryFn = withTables { spark =>
    Profiling.gini(spark.table("documents"), Seq("lang"), "n_chars")
      .orderBy("lang")
  }

  /** χ² independence + Cramér's V for lang × source — the
    * significance sibling of q_mutual_info on the same cell-table
    * shape; counts exact, one cell-table-sized float fold.
    */
  val qChiSquare: QueryFn = withTables { spark =>
    Profiling.chiSquare(spark.table("documents"), "lang", "source")
  }

  /** Poisson-bootstrap 3rd/38th-of-40 order-statistic CI for mean doc
    * length per language: integer values keep every replica sum
    * exact, the md5 draws replay verbatim in the oracle, and the
    * Poisson(1) CDF thresholds are ONE Scala computation shared with
    * the oracle text.
    */
  val qBootstrapCi: QueryFn = withTables { spark =>
    graft.operators.Sampling.bootstrapMeanCI(
        spark.table("documents"), Seq("lang"), "n_chars", "doc_id",
        replicas = 40, loRank = 3, hiRank = 38)
      .orderBy("lang")
  }

  /** Blocked sorted-neighborhood dedup at window 3: planted variants
    * (a 2-char suffix append) sort adjacent to their base inside the
    * same first-char block, so the window catches them; pair SET is
    * determined by the (string, id) total order and integer
    * levenshtein — nothing float anywhere.
    */
  val qSortedNeighborhood: QueryFn = withTables { spark =>
    val base = spark.table("part").filter(col("p_partkey") <= 500)
      .select(col("p_partkey").as("id"), col("p_name").as("s"))
    val variants = base.select((col("id") + 10000).as("id"),
      concat(col("s"), lit(" x")).as("s"))
    graft.operators.FuzzyJoin.sortedNeighborhoodJoin(
        base.unionByName(variants), "id", "s", window = 3, maxDist = 2)
      .withColumn("dist", col("dist").cast("bigint"))
      .orderBy("i", "j")
  }

  /** Market-basket association between event types per user: support,
    * confidence, and lift from exact distinct-user counts — the
    * co-occurrence structure diagnostic; one self-join on the
    * (user, type)-distinct table, vocabulary-sized aggregates.
    */
  /** Item-item co-occurrence similarity panel (cosine / Jaccard /
    * Dice) over users' distinct event types — the similarity
    * complement of q_basket_lift's rules; exact integer counts, one
    * rounded division per measure.
    */
  val qItemCosine: QueryFn = withTables { spark =>
    graft.operators.Scoring.cooccurrenceSimilarity(
        spark.table("events"), "user_id", "event_type")
      .orderBy("item_a", "item_b")
  }

  /** Item-kNN "also bought" recommendations over customer–part
    * baskets: exact co-occurrence cosine, 10-NN neighbor cap, owned
    * parts anti-joined out, top-3 per customer under the (score DESC,
    * part) total order.
    */
  val qItemKnn: QueryFn = withTables { spark =>
    val hist = spark.table("lineitem")
      .filter(col("l_orderkey") % 3 === 0 && col("l_partkey") % 50 === 0)
      .join(spark.table("orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
    graft.operators.Scoring.itemKnnRecommend(hist, "cust", "part",
        topN = 3, maxNeighbors = 10)
      .withColumnRenamed("item", "part")
      .orderBy("cust", "rank")
  }

  /** Recommendation-quality panel over the q_item_knn recs: catalog
    * coverage, mean −ln-popularity novelty, and within-list cosine
    * diversity — the serving acceptance gates beside accuracy; the
    * oracle replays the full item-kNN pipeline then the panel.
    */
  val qRecEval: QueryFn = withTables { spark =>
    val hist = spark.table("lineitem")
      .filter(col("l_orderkey") % 3 === 0 && col("l_partkey") % 50 === 0)
      .join(spark.table("orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
    val recs = graft.operators.Scoring.itemKnnRecommend(hist, "cust",
        "part", topN = 3, maxNeighbors = 10)
      .select(col("cust"), col("item"))
    graft.operators.Scoring.recommendationEval(hist, "cust", "part",
      recs, "cust", "item")
  }

  /** The shared ALS ratings table: mean quantity per (customer, part)
    * basket cell on the q_item_knn slice — repeated purchases average
    * into one exact rating (decimal sum / exact count, 6-dp). */
  private def alsRatings(spark: org.apache.spark.sql.SparkSession) =
    spark.table("lineitem")
      .filter(col("l_orderkey") % 3 === 0 && col("l_partkey") % 50 === 0)
      .join(spark.table("orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .agg(round(sum(col("l_quantity").cast("decimal(38,6)"))
        .cast("double") / count(lit(1)).cast("double"), 6).as("rating"))

  /** Rank-2 ALS factorization judged on its reconstruction: 2 full
    * alternations of ridge-damped closed-form 2×2 solves (the
    * q_logistic determinism discipline — 12-dp frozen decimal
    * normal-equation sums, Cramer in doubles, 12-dp param refreeze),
    * deterministic id-derived item init; each observed (cust, part)
    * rating beside its factor dot-product prediction. The oracle
    * unrolls all four half-passes.
    */
  val qAls: QueryFn = withTables { spark =>
    graft.operators.Scoring.alsPredict(alsRatings(spark),
        "cust", "part", "rating", iters = 2, lambda = 0.1)
      .orderBy("cust", "part")
  }

  /** ALS top-3 serving over the q_als factors: every user scores the
    * bounded catalog by dot product, owned cells anti-join out, the
    * (score DESC, part) total order ranks — the latent-factor twin of
    * q_item_knn's output shape (documented swap to the ANN family
    * when the catalog stops being broadcastable).
    */
  val qAlsRecs: QueryFn = withTables { spark =>
    graft.operators.Scoring.alsRecommend(alsRatings(spark),
        "cust", "part", "rating", topN = 3, iters = 2, lambda = 0.1)
      .orderBy("cust", "rank")
  }

  /** The q_rec_eval panel over ALS recommendations instead of
    * item-kNN ones (r16 verdict item 3's composition proof): the SAME
    * recommendationEval accepts either recommender's output —
    * coverage/novelty/diversity judged on the latent-factor recs.
    */
  val qRecEvalAls: QueryFn = withTables { spark =>
    val ratings = alsRatings(spark)
    val recs = graft.operators.Scoring.alsRecommend(ratings,
        "cust", "part", "rating", topN = 3, iters = 2, lambda = 0.1)
      .select(col("cust"), col("part"))
    graft.operators.Scoring.recommendationEval(ratings, "cust", "part",
      recs, "cust", "part")
  }


  /** ABC inventory classification of parts by exact decimal revenue:
    * rank under the (revenue DESC, part) total order, class by the
    * 12-dp-frozen running share against the 80/95 cuts — the Pareto
    * stocking-policy workhorse beside q_pareto's curve.
    */
  val qAbc: QueryFn = withTables { spark =>
    graft.operators.Scoring.abcClassify(spark.table("lineitem"),
        "l_partkey", "l_extendedprice")
      .orderBy("rank")
  }

  /** Quadratic-weighted Cohen's kappa between two ordinal graders of
    * documents (char-count tier vs word-count tier): partial credit
    * by squared distance, all-integer numerator/denominator with the
    * (k−1)² normalization cancelling — one rounded division.
    */
  val qKappaWeighted: QueryFn = withTables { spark =>
    val docs = spark.table("documents")
      .select(least(floor(col("n_chars") / 300), lit(5L)).as("ra"),
        least(floor(size(filter(split(lower(col("text")), " "),
          t => t =!= "")) / lit(50)), lit(5L)).as("rb"))
    graft.operators.RankEval.weightedKappa(docs, col("ra"), col("rb"))
  }


  /** Growth accounting over daily active users: the exact
    * new/retained/resurrected decomposition of each day's DAU,
    * churn as the prev-day identity, and the quick ratio — the
    * canonical product-growth ledger beside q_stickiness.
    */
  val qGrowthAccounting: QueryFn = withTables { spark =>
    graft.operators.EventWindows.growthAccounting(spark.table("events"),
        "user_id", "ts")
      .orderBy("day")
  }

  /** Multi-window SLO burn-rate alerts over the daily error share:
    * budget 0.2, 3-day window at threshold 1.05 AND 7-day at 1.0 —
    * the SRE-workbook paging rule; exact rolling integer sums, full
    * frames required.
    */
  val qBurnRate: QueryFn = withTables { spark =>
    graft.operators.EventWindows.burnRateAlerts(spark.table("events"),
        "ts", col("event_type") === "error", budget = 0.2,
        shortDays = 3, longDays = 7,
        shortThreshold = 1.05, longThreshold = 1.0)
      .orderBy("day")
  }

  /** Exact Shapley channel attribution (the coalition-game standard
    * beside first/last-touch, position, decay, and Markov-removal):
    * the four non-conversion event types as the declared channel
    * universe, v(S) = exact count of converters whose strictly-pre-
    * first-purchase touch set fits in S, φ from the 2⁴-subset exact
    * Shapley sum with literal rational weights — touchless
    * conversions cancel in every marginal by algebra.
    */
  val qShapley: QueryFn = withTables { spark =>
    graft.operators.EventWindows.shapleyAttribution(spark.table("events"),
        "user_id", "ts", "event_type",
        Seq("click", "error", "signup", "view"), "purchase")
      .orderBy("channel")
  }

  /** Off-policy IPS/SNIPS replay: target policy "purchase after noon,
    * view before" evaluated on logged events with plug-in empirical
    * logging propensities P(event_type) — what the counterfactual
    * router would have earned, with the weights' effective sample
    * size as the honesty gauge.
    */
  val qIpsEval: QueryFn = withTables { spark =>
    val ev = spark.table("events")
      .select(col("event_type").as("action"),
        (col("value") / 100.0).as("reward"), hour(col("ts")).as("hod"))
    val props = ev.groupBy("action")
      .agg(count(lit(1)).as("_c"))
      .crossJoin(broadcast(ev.agg(count(lit(1)).as("_n"))))
      .select(col("action"),
        round(col("_c").cast("double") / col("_n").cast("double"), 12)
          .as("prop"))
    val logged = ev.join(broadcast(props), Seq("action"))
      .withColumn("target",
        when(col("hod") >= 12, "purchase").otherwise("view"))
    graft.operators.Scoring.ipsEvaluate(logged, "action", "reward",
      "prop", "target")
  }

  /** Bradley–Terry leaderboard from pairwise price contests: within
    * each mod-19 order, the pricier lineitem's part "beats" the other
    * (ties are no game); 2 fixed MM passes, sup-normalized — the
    * head-to-head preference ranker (chatbot-arena scoring) on
    * deterministic testdata games.
    */
  val qBradleyTerry: QueryFn = withTables { spark =>
    val li = spark.table("lineitem")
      .filter(col("l_orderkey") % 19 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"),
        col("l_extendedprice").as("pr"))
    val games = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(
        when(col("x.pr") > col("y.pr"), col("x.pk"))
          .when(col("x.pr") < col("y.pr"), col("y.pk")).as("w"),
        when(col("x.pr") > col("y.pr"), col("y.pk"))
          .when(col("x.pr") < col("y.pr"), col("x.pk")).as("l"))
      .filter(col("w").isNotNull)
    graft.operators.RankEval.bradleyTerry(games, "w", "l", iters = 2)
      .orderBy("item")
  }

  /** DAU / trailing-28-day-MAU stickiness per calendar day: one
    * (user, day) dedup, a bounded ×28 window-end fan for the exact
    * trailing distinct, one rounded ratio.
    */
  val qStickiness: QueryFn = withTables { spark =>
    graft.operators.EventWindows.stickiness(
        spark.table("events"), "user_id", "ts", windowDays = 28)
      .orderBy("day")
  }

  val qBasketLift: QueryFn = withTables { spark =>
    val d = spark.table("events").select("user_id", "event_type").distinct()
    val pairs = d.as("x").join(d.as("y"),
        col("x.user_id") === col("y.user_id")
          && col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("ta"), col("y.event_type").as("tb"))
      .agg(count(lit(1)).as("n_both"))
    val singles = d.groupBy("event_type").agg(count(lit(1)).as("c"))
    val nu = d.agg(countDistinct(col("user_id")).as("n_users"))
    pairs
      .join(broadcast(singles.select(col("event_type").as("ta"), col("c").as("ca"))), Seq("ta"))
      .join(broadcast(singles.select(col("event_type").as("tb"), col("c").as("cb"))), Seq("tb"))
      .crossJoin(broadcast(nu))
      .select(col("ta"), col("tb"), col("n_both"),
        round(col("n_both") / col("n_users"), 6).cast("double").as("support"),
        round(col("n_both") / col("ca"), 6).cast("double").as("confidence"),
        round((col("n_both") * col("n_users")) / (col("ca") * col("cb")), 6)
          .cast("double").as("lift"))
      .orderBy("ta", "tb")
  }

  /** Bounded level-3 apriori over (event_type × props.k-bucket) items
    * per user basket (r17 verdict item 5): frequent items → frequent
    * pairs capped to the top-50 under (count DESC, a, b) — the cap is
    * ACTIVE here (105 possible pairs) — → fully-pruned candidate
    * triples → one final count, with support and 3-way lift.
    */
  val qItemsets3: QueryFn = withTables { spark =>
    val d = spark.table("events")
      .select(col("user_id"),
        concat(col("event_type"), lit("#"),
          coalesce(get_json_object(col("props"), "$.k").cast("bigint")
            % 3, lit(0L)).cast("string")).as("item"))
    graft.operators.Baskets.frequentTriples(d, "user_id", "item",
        minSupport = 20L, topKPairs = 50)
      .orderBy("a", "b", "c")
  }

  /** k-anonymity/l-diversity audit over the (lang, source) quasi-id
    * with doc length as the sensitive attribute — all-integer counts
    * and comparisons.
    */
  val qKAnonymity: QueryFn = withTables { spark =>
    Profiling.kAnonymity(spark.table("documents"),
        Seq("lang", "source"), "n_chars", k = 5, l = 3)
      .orderBy("lang", "source")
  }

  /** t-closeness audit of the same (lang, source) quasi-groups on
    * the 100-char length bucket: ordered-EMD skew vs the global
    * distribution, exact cumulative cross-multiplied gaps, t = 0.2.
    */
  val qTCloseness: QueryFn = withTables { spark =>
    Profiling.tCloseness(spark.table("documents"),
        Seq("lang", "source"), floor(col("n_chars") / 100.0), t = 0.2)
      .orderBy("lang", "source")
  }

  // Shared scaffold for the retrieval-eval family: exact-cosine and
  // dot-product rankings per probe, both on bit-identical index-order
  // folds (see qRecallMetric).
  private def twoRankings(spark: org.apache.spark.sql.SparkSession,
      depth: Int): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import graft.operators.Similarity
    val emb = spark.table("embeddings")
    val probes = emb.filter(col("vec_id") < 20)
    val exact = Similarity.probeSearch(emb, probes, "vec_id", "embedding",
      k = depth)
    val cc = emb.select(col("vec_id").as("corpus_id"), col("embedding").as("cv"))
    val pp = probes.select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val dot = cc.join(broadcast(pp), col("probe_id") =!= col("corpus_id"))
      .withColumn("dot", expr(
        "aggregate(zip_with(pv, cv, (x, y) -> cast(x as double) * cast(y as double)), 0D, (a, b) -> a + b)"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("probe_id")
          .orderBy(col("dot").desc, col("corpus_id"))).cast("bigint"))
      .filter(col("rank") <= depth)
    (exact, dot)
  }

  /** Reciprocal-rank fusion of the cosine and dot-product rankings at
    * c=60: top-5 fused per probe — the hybrid-retrieval combiner
    * judged end-to-end. Scores are sums of ≤ 2 exact double
    * divisions; the fused rank is a total order.
    */
  val qRrfFuse: QueryFn = withTables { spark =>
    val (exact, dot) = twoRankings(spark, depth = 10)
    RankEval.rrfFuse(Seq(exact, dot), "probe_id", "corpus_id", "rank",
        depth = 10, k = 5, c = 60)
      .orderBy("probe_id", "rank")
  }

  /** nDCG@5 of the dot-product ranking against exact cosine under the
    * pinned gain contract (rel = 6 − exactRank): the graded companion
    * of recall@k; IDCG is the one shared Scala constant.
    */
  val qNdcg: QueryFn = withTables { spark =>
    val (exact, dot) = twoRankings(spark, depth = 5)
    RankEval.ndcgAtK(dot, exact, "probe_id", "corpus_id", "rank", k = 5)
      .orderBy("probe_id")
  }

  /** Quantile normalization of per-language doc lengths onto the
    * pooled distribution: rank arithmetic is exact integers, the
    * mapped value is a lookup — nothing float anywhere.
    */
  val qQuantileNorm: QueryFn = withTables { spark =>
    graft.operators.Encoding.quantileNormalize(
        spark.table("documents").select("doc_id", "lang", "n_chars"),
        Seq("lang"), "n_chars", "doc_id")
      .select("doc_id", "lang", "n_chars", "qnorm")
      .orderBy("doc_id")
  }

  /** RFM quintile scoring over orders: exact decimal(18,2) monetary
    * sums, closed-form floor((rank−1)·5/N) tiles over (metric,
    * customer) total orders — ranks from the scale-safe denseIds
    * pass, never a single-partition window.
    */
  val qRfm: QueryFn = withTables { spark =>
    Scoring.rfm(spark.table("orders"), "o_custkey", "o_orderdate",
        "o_totalprice", nTiles = 5)
      .orderBy("customer")
  }

  /** Revenue-concentration deciles (Lorenz/Pareto): exact decimal
    * bucket sums, one rounded share division, top-down cumulative.
    */
  val qPareto: QueryFn = withTables { spark =>
    Scoring.revenueConcentration(spark.table("orders"), "o_custkey",
        "o_totalprice", buckets = 10)
      .orderBy("bucket")
  }

  /** First/last-touch purchase attribution over the per-user
    * (ts, event_id) total order: exact integer channel credits,
    * no-prior-touch purchases credit 'direct'.
    */
  /** Shannon / Simpson / richness diversity of the language mix per
    * source: integer counts, frozen c·ln c decimal sums, unbiased
    * integer Gini–Simpson, one rounded expression each.
    */
  val qDiversity: QueryFn = withTables { spark =>
    graft.operators.Profiling.diversity(spark.table("documents"),
        Seq("source"), "lang")
      .orderBy("source")
  }

  /** Murphy decomposition of the binned Brier score for the
    * min-max-normalized value confidence vs the purchase label
    * (the q_calibration grid): frozen bin means, decimal REL/RES
    * folds, REL − RES + UNC identity row.
    */
  val qBrierDecomp: QueryFn = withTables { spark =>
    val ev = spark.table("events")
    val mm = ev.agg(min(col("value")).cast("double").as("_lo"),
      max(col("value")).cast("double").as("_hi"))
    val scored = ev.crossJoin(broadcast(mm))
      .withColumn("conf",
        round((col("value") - col("_lo")) / (col("_hi") - col("_lo")), 6))
    RankEval.brierDecomposition(scored, col("conf"),
      col("event_type") === "purchase", bins = 10)
  }

  /** Multi-class one-vs-rest P/R/F1 panel: actual = event_type,
    * predicted by a deterministic rule that exercises the diagonal,
    * a never-correct sink class ('bot', pred-only), and heavy
    * off-diagonal mass — all integer cells, rounded divisions.
    */
  val qF1Panel: QueryFn = withTables { spark =>
    val ev = spark.table("events").withColumn("_pred",
      when(col("event_id") % 3 === 0, col("event_type"))
        .when(col("event_id") % 3 === 1, lit("bot"))
        .otherwise(lit("click")))
    RankEval.classReport(ev, "event_type", "_pred")
      .orderBy("class")
  }

  /** Qini / uplift curve: value as the targeting score, even user_id
    * as the (deterministic) treatment arm, purchase as conversion,
    * 10 rank tiles from denseIds — integer cells, decimal qini
    * cross-products, rounded uplift rates.
    */
  val qQini: QueryFn = withTables { spark =>
    RankEval.qiniCurve(spark.table("events"), "event_id", "value",
        treated = col("user_id") % 2 === 0,
        label = col("event_type") === "purchase", buckets = 10)
      .orderBy("bucket")
  }

  /** Markov removal-effect attribution of purchase conversions
    * (horizon 8): frozen transition probabilities, decimal absorption
    * folds per step, removal effects and shares as rounded divisions.
    */
  val qMarkovAttribution: QueryFn = withTables { spark =>
    EventWindows.markovAttribution(spark.table("events"), "user_id",
        "ts", "event_id", "event_type",
        col("event_type") === "purchase", horizon = 8)
      .orderBy("channel")
  }

  /** Expected reciprocal rank of the value-ranked event list per
    * type, graded 0..4 by the JSON k (grade 4 = navigational hit that
    * stops the cascade): exact ranks, power-of-two relevances, ln-sum
    * survival with the hit-grade-max zero flag, 12-dp-frozen
    * contributions in a decimal sum.
    */
  val qErr: QueryFn = withTables { spark =>
    val ev = spark.table("events").withColumn("_grade",
      get_json_object(col("props"), "$.k").cast("bigint") % 5)
    RankEval.expectedReciprocalRank(ev, "event_type", "value",
        "event_id", "_grade", maxGrade = 4, k = 20)
      .orderBy("event_type")
  }

  /** Position-based multi-touch attribution (linear + U-shaped
    * 40/20/40) of purchase conversions over per-user touch paths:
    * integer path ranks, 6-dp-frozen credits in decimal channel sums.
    */
  /** Time-decay attribution with a 24 h half-life: per converting
    * path, touches earn e^(−Δ/τ) weights (12-dp frozen), normalized
    * per conversion — the continuous-recency fourth model of the
    * attribution family.
    */
  val qAttributionDecay: QueryFn = withTables { spark =>
    EventWindows.decayAttribution(spark.table("events"), "user_id",
        "ts", "event_id", "event_type", col("event_type") === "purchase",
        halfLifeSeconds = 86400L)
      .orderBy("channel")
  }

  val qAttributionPosition: QueryFn = withTables { spark =>
    EventWindows.positionAttribution(spark.table("events"), "user_id",
        "ts", "event_id", "event_type", col("event_type") === "purchase")
      .orderBy("channel")
  }

  val qAttribution: QueryFn = withTables { spark =>
    EventWindows.touchAttribution(spark.table("events"), "user_id", "ts",
        "event_id", "event_type", col("event_type") === "purchase")
      .orderBy("channel")
  }

  /** Inverted index over documents: true document frequencies, df
    * gates 5..400 (the stopword guard), posting lists capped at 20
    * doc-id-sorted entries and serialized comma-joined (the LISTAGG
    * scalar-compare convention).
    */
  val qPostingLists: QueryFn = withTablesSf { (spark, sfDir) =>
    TextAnalysis.postingListsFromCounts(TextMemo.tokenCounts(spark, sfDir),
        minDf = 5, maxDf = 400, maxPostings = 20)
      .orderBy("token")
  }

  /** Per-type dwell times (time to the user's next event): exact
    * integer microsecond sums, DIV to whole seconds, one rounded
    * mean division.
    */
  val qDwell: QueryFn = withTables { spark =>
    EventWindows.dwellTimes(spark.table("events"), "user_id", "ts",
        "event_id", "event_type")
      .orderBy("event_type")
  }

  /** 1-hour (user, type) debounce: survivors of the lag-gap filter —
    * all-integer microsecond comparisons.
    */
  val qDebounce: QueryFn = withTables { spark =>
    EventWindows.debounce(spark.table("events"), "user_id", "ts",
        "event_id", "event_type", minGapSeconds = 3600)
      .select("event_id", "user_id", "event_type")
      .orderBy("event_id")
  }

  /** Decile lift/gains table of value-ranked events against the
    * is-purchase label: closed-form rank tiles over a denseIds total
    * order, integer cross-product lift, one rounded division each.
    */
  val qLiftCurve: QueryFn = withTables { spark =>
    RankEval.liftCurve(spark.table("events"), "event_id", "value",
        col("event_type") === "purchase", buckets = 10)
      .orderBy("bucket")
  }

  /** Exact Brier score of the q_calibration min-max confidence
    * against is-purchase: scaled-long squared deviations in
    * decimal(38,0), one rounded division.
    */
  val qBrier: QueryFn = withTables { spark =>
    val ev = spark.table("events")
    val mm = ev.agg(min(col("value")).cast("double").as("_lo"),
      max(col("value")).cast("double").as("_hi"))
    val scored = ev.crossJoin(broadcast(mm))
      .withColumn("conf",
        round((col("value") - col("_lo")) / (col("_hi") - col("_lo")), 6))
    RankEval.brierScore(scored, col("conf"),
      col("event_type") === "purchase")
  }

  /** SPRT early-stopping gate per event type: H0 rate 0.4 vs H1 rate
    * 0.5 of P(value > 50), α = β = 0.05 — Scala-computed log
    * constants interpolated into the oracle verbatim.
    */
  val qSprt: QueryFn = withTables { spark =>
    Stats.sprt(spark.table("events"), "event_type",
        col("value") > 50.0, p0 = 0.4, p1 = 0.5)
      .orderBy("event_type")
  }

  /** Cohort LTV curves: first-day cohorts, exact scaled-long
    * cumulative value, one rounded per-user division.
    */
  val qCohortLtv: QueryFn = withTables { spark =>
    EventWindows.cohortValue(spark.table("events"), "user_id", "ts",
        "value")
      .orderBy("cohort", "day_offset")
  }

  /** 1-hour click→purchase windowed conversion: exact microsecond
    * next-event windows, one rounded rate.
    */
  val qFunnelWindowed: QueryFn = withTables { spark =>
    EventWindows.windowedConversions(spark.table("events"), "user_id",
        "ts", "event_id", "event_type", fromType = "click",
        toType = "purchase", windowSeconds = 3600)
  }

  /** Boolean AND retrieval of {spark, query} over documents: set-
    * semantics matched-term counts plus total term occurrences — the
    * posting-intersection primitive, all integers.
    */
  val qBoolSearch: QueryFn = withTablesSf { (spark, sfDir) =>
    TextAnalysis.booleanRetrieveFromCounts(TextMemo.tokenCounts(spark, sfDir),
        Seq("spark", "query"), minMatch = 2)
      .orderBy("doc_id")
  }

  /** Thresholded confusion panel of the value score at 50.0 against
    * the even-JSON-k label, per event type: exact integer cells, one
    * rounded division per rate, MCC with a decimal numerator.
    */
  val qConfusion: QueryFn = withTables { spark =>
    RankEval.confusionPanel(spark.table("events"), "event_type", "value",
        coalesce(get_json_object(col("props"), "$.k").cast("bigint")
          % 2 === 0, lit(false)), threshold = 50.0)
      .orderBy("event_type")
  }

  /** Binary log-loss of the min-max-normalized value confidence
    * against the even-JSON-k label, per event type: 6-dp-quantized
    * confidences, 12-dp-frozen ln terms in a decimal fold.
    */
  val qLogLoss: QueryFn = withTables { spark =>
    val ev = spark.table("events")
    val mm = ev.agg(min(col("value")).cast("double").as("_lo"),
      max(col("value")).cast("double").as("_hi"))
    val scored = ev.crossJoin(broadcast(mm))
      .withColumn("conf",
        round((col("value") - col("_lo")) / (col("_hi") - col("_lo")), 6))
    RankEval.logLoss(scored, "event_type", col("conf"),
        coalesce(get_json_object(col("props"), "$.k").cast("bigint")
          % 2 === 0, lit(false)))
      .orderBy("event_type")
  }

  /** Average precision of the value ranking against the even-JSON-k
    * label per event type ((value DESC, event_id) pinned total
    * order): integer ranks/cumulatives off one window, 12-dp-frozen
    * precision terms, one division by n_pos.
    */
  val qAvgPrecision: QueryFn = withTables { spark =>
    RankEval.averagePrecision(spark.table("events"), "event_type",
        "value", "event_id",
        coalesce(get_json_object(col("props"), "$.k").cast("bigint")
          % 2 === 0, lit(false)))
      .orderBy("event_type")
  }

  /** Reciprocal rank of the first top-3-by-count user inside the
    * top-10-by-value ranking, per event type (the q_rbo_eval ranking
    * fixtures): exact integer first-ranks, rr one rounded division,
    * no-hit queries report 0.
    */
  val qMrr: QueryFn = withTables { spark =>
    val ev = spark.table("events")
    def ranking(metric: Column) = ev
      .groupBy(col("event_type"), col("user_id"))
      .agg(metric.as("m"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(col("m").desc_nulls_last, col("user_id"))))
    val byValue = ranking(round(sum(col("value")), 6))
      .filter(col("rnk") <= 10)
    val relevant = ranking(count(lit(1))).filter(col("rnk") <= 3)
      .select("event_type", "user_id")
    RankEval.reciprocalRank(byValue, relevant, "event_type", "user_id",
        "rnk", depth = 10)
      .orderBy("event_type")
  }

  /** Multinomial Naive Bayes source classifier trained and scored on
    * documents (class = source, add-one smoothing over the corpus
    * vocabulary): frozen-ln grid, 6-dp-frozen per-token terms, argmax
    * on frozen scores with the class tiebreak.
    */
  val qNaiveBayes: QueryFn = withTablesSf { (spark, sfDir) =>
    TextAnalysis.naiveBayesPredict(spark.table("documents"), "doc_id",
        "source", "text",
        pretok = Some(TextMemo.tokenCounts(spark, sfDir)))
      .orderBy("doc_id")
  }

  /** Top-20 PMI collocations (adjacent bigrams, min count 5) over the
    * document corpus: exact integer counts, one frozen ln per pair,
    * (pmi DESC, w1, w2) total-order cut.
    */
  val qCollocations: QueryFn = withTables { spark =>
    TextAnalysis.collocations(spark.table("documents"), "text",
      minCount = 5, k = 20)
  }

  /** log-Dice top-20 collocations over the same bigram/unigram counts
    * as q_collocations: 14 + log₂(2f_xy/(f_x+f_y)) — the corpus-size-
    * stable strength measure; exact counts, one ln/ln2 tree, the
    * (logdice DESC, w1, w2) cut.
    */
  val qLogDice: QueryFn = withTables { spark =>
    TextAnalysis.logDiceCollocations(spark.table("documents"), "text",
      minCount = 5, k = 20)
  }

  /** Fellegi–Sunter linkage weights trained on the q_sorted_neighborhood
    * planted-duplicate design: part names + 2-char-suffix variants,
    * first-char blocked candidate pairs, label = (j == i + 10000);
    * agreement fields name-12-prefix / brand / type; exact m/u
    * counts into the log₂ weight trees.
    */
  val qLinkageWeights: QueryFn = withTables { spark =>
    val base = spark.table("part").filter(col("p_partkey") <= 500)
      .select(col("p_partkey").as("id"), col("p_name").as("nm"),
        col("p_brand").as("br"), col("p_type").as("ct"))
    val variants = base.select((col("id") + 10000).as("id"),
      concat(col("nm"), lit(" x")).as("nm"), col("br"), col("ct"))
    val u = base.unionByName(variants)
    val pairs = u.as("x").join(u.as("y"),
        substring(col("x.nm"), 1, 1) === substring(col("y.nm"), 1, 1)
          && col("x.id") < col("y.id"))
      .select(col("x.id").as("i"), col("y.id").as("j"),
        (col("y.id") === col("x.id") + 10000).as("is_match"),
        (substring(col("x.nm"), 1, 12) === substring(col("y.nm"), 1, 12))
          .as("a_name"),
        (col("x.br") === col("y.br")).as("a_brand"),
        (col("x.ct") === col("y.ct")).as("a_container"))
    graft.operators.FuzzyJoin.fellegiSunterWeights(pairs,
        col("is_match"),
        Seq("name12" -> col("a_name"), "brand" -> col("a_brand"),
          "type" -> col("a_container")))
      .orderBy("field")
  }

  /** Top-25 G² keyness of the English subcorpus against the rest:
    * exact split token counts from ONE aggregate, the Rayson–Garside
    * log-likelihood tree, integer cross-multiplied direction flag,
    * (g2 DESC, token) cut.
    */
  val qKeyness: QueryFn = withTables { spark =>
    TextAnalysis.keyness(spark.table("documents"), "text",
      col("lang") === "en", k = 25)
  }

  /** UNSUPERVISED Fellegi–Sunter (r17 verdict item 3): the
    * q_linkage_weights candidate pairs with the label WITHHELD — m/u
    * and the match prevalence estimated by 2 fixed EM passes over the
    * comparison vectors alone (12-dp-frozen E-step responsibilities,
    * 6-dp-refrozen clamped M-step params, the gmmPortable
    * discipline). The oracle unrolls both passes.
    */
  val qLinkageEm: QueryFn = withTables { spark =>
    val base = spark.table("part").filter(col("p_partkey") <= 500)
      .select(col("p_partkey").as("id"), col("p_name").as("nm"),
        col("p_brand").as("br"), col("p_type").as("ct"))
    val variants = base.select((col("id") + 10000).as("id"),
      concat(col("nm"), lit(" x")).as("nm"), col("br"), col("ct"))
    val u = base.unionByName(variants)
    val pairs = u.as("x").join(u.as("y"),
        substring(col("x.nm"), 1, 1) === substring(col("y.nm"), 1, 1)
          && col("x.id") < col("y.id"))
      .select(
        (substring(col("x.nm"), 1, 12) === substring(col("y.nm"), 1, 12))
          .as("a_name"),
        (col("x.br") === col("y.br")).as("a_brand"),
        (col("x.ct") === col("y.ct")).as("a_container"))
    graft.operators.FuzzyJoin.fellegiSunterEm(pairs,
        Seq("name12" -> col("a_name"), "brand" -> col("a_brand"),
          "type" -> col("a_container")), passes = 2)
      .orderBy("field")
  }

  /** TextRank top-20 keywords over the document corpus (window 2,
    * 3 PageRank iterations): exact distinct co-occurrence edges, the
    * 12-dp-per-iteration rank contract, (rank DESC, word) cut.
    */
  val qTextRank: QueryFn = withTables { spark =>
    TextAnalysis.textRankKeywords(spark.table("documents"), "text",
      window = 2, iters = 3, k = 20)
  }

  /** Hosmer-Lemeshow calibration test of the min-max value confidence
    * against the even-JSON-k label (10 bins): exact O/E per bin,
    * 12-dp-frozen terms, degenerate bins excluded.
    */
  val qHosmer: QueryFn = withTables { spark =>
    val ev = spark.table("events")
    val mm = ev.agg(min(col("value")).cast("double").as("_lo"),
      max(col("value")).cast("double").as("_hi"))
    val scored = ev.crossJoin(broadcast(mm))
      .withColumn("conf",
        round((col("value") - col("_lo")) / (col("_hi") - col("_lo")), 6))
    RankEval.hosmerLemeshow(scored, col("conf"),
      coalesce(get_json_object(col("props"), "$.k").cast("bigint")
        % 2 === 0, lit(false)), bins = 10)
  }

  val queries: Map[String, QueryFn] = Map(
    "q_keyness" -> qKeyness,
    "q_itemsets3" -> qItemsets3,
    "q_linkage_em" -> qLinkageEm,
    "q_hosmer" -> qHosmer,
    "q_textrank" -> qTextRank,
    "q_collocations" -> qCollocations,
    "q_logdice" -> qLogDice,
    "q_linkage_weights" -> qLinkageWeights,
    "q_naive_bayes" -> qNaiveBayes,
    "q_confusion" -> qConfusion,
    "q_log_loss" -> qLogLoss,
    "q_avg_precision" -> qAvgPrecision,
    "q_mrr" -> qMrr,
    "q_funnel_windowed" -> qFunnelWindowed,
    "q_bool_search" -> qBoolSearch,
    "q_cohort_ltv" -> qCohortLtv,
    "q_brier" -> qBrier,
    "q_sprt" -> qSprt,
    "q_lift_curve" -> qLiftCurve,
    "q_dwell" -> qDwell,
    "q_debounce" -> qDebounce,
    "q_rfm" -> qRfm,
    "q_pareto" -> qPareto,
    "q_attribution" -> qAttribution,
    "q_attribution_position" -> qAttributionPosition,
    "q_attribution_decay" -> qAttributionDecay,
    "q_err" -> qErr,
    "q_markov_attribution" -> qMarkovAttribution,
    "q_qini" -> qQini,
    "q_diversity" -> qDiversity,
    "q_brier_decomp" -> qBrierDecomp,
    "q_f1_panel" -> qF1Panel,
    "q_posting_lists" -> qPostingLists,
    "q_pca_power" -> qPcaPower,
    "q_rbo_eval" -> qRboEval,
    "q_decay_agg" -> qDecayAgg,
    "q_dup_ngrams" -> qDupNgrams,
    "q_vocab_jaccard" -> qVocabJaccard,
    "q_auc_eval" -> qAucEval,
    "q_kappa" -> qKappa,
    "q_calibration" -> qCalibration,
    "q_psi" -> qPsi,
    "q_fuzzy_jw" -> qFuzzyJw,
    "q_recall_metric" -> qRecallMetric,
    "q_gini" -> qGini,
    "q_chi_square" -> qChiSquare,
    "q_bootstrap_ci" -> qBootstrapCi,
    "q_sorted_neighborhood" -> qSortedNeighborhood,
    "q_basket_lift" -> qBasketLift,
    "q_item_cosine" -> qItemCosine,
    "q_bradley_terry" -> qBradleyTerry,
    "q_ips_eval" -> qIpsEval,
    "q_item_knn" -> qItemKnn,
    "q_rec_eval" -> qRecEval,
    "q_als" -> qAls,
    "q_als_recs" -> qAlsRecs,
    "q_rec_eval_als" -> qRecEvalAls,
    "q_shapley" -> qShapley,
    "q_burn_rate" -> qBurnRate,
    "q_growth_accounting" -> qGrowthAccounting,
    "q_abc" -> qAbc,
    "q_kappa_weighted" -> qKappaWeighted,
    "q_stickiness" -> qStickiness,
    "q_k_anonymity" -> qKAnonymity,
    "q_t_closeness" -> qTCloseness,
    "q_rrf_fuse" -> qRrfFuse,
    "q_ndcg" -> qNdcg,
    "q_quantile_norm" -> qQuantileNorm,
  )

  // Time-decay attribution tau = halfLife/ln 2 — ONE Scala double
  // interpolated into the oracle (Double.toString round-trips).
  private val decayTau: Double = 86400L / math.log(2.0)

  // Poisson(1) CDF thresholds: the ONE Scala computation
  // (Sampling.PoissonCdf) interpolated into the oracle text —
  // Double.toString round-trips, so both engines compare against the
  // identical doubles.
  private val pc = graft.operators.Sampling.PoissonCdf

  // RBO depth weights: ONE Scala computation feeds both the Spark
  // literal lookup (RankEval.rbo) and the oracle CASE below —
  // Double.toString round-trips, so both engines parse the identical
  // doubles.
  private val rboCase: String =
    RankEval.rboWeights(10, 0.9).zipWithIndex
      .map { case (w, i) => s"WHEN ${i + 1} THEN $w" }
      .mkString("CASE GREATEST(a.ra, b.rb) ", " ", " ELSE 0.0 END")

  // SPRT log constants: ONE Scala computation (Stats.sprtConstants)
  // interpolated into the oracle text — Double.toString round-trips,
  // so both engines multiply by the identical doubles.
  private val sprtC = Stats.sprtConstants(0.4, 0.5, 0.05, 0.05)

  // The q_shapley oracle is GENERATED from the same channel list and
  // factorial weights the operator uses (Double.toString round-trips,
  // so both engines multiply by identical doubles; terms in ascending
  // subset-bitmask order on both sides).
  private val shapleyOracle: String = {
    val channels = Seq("click", "error", "signup", "view")
    val n = channels.size
    def fact(i: Int): Long = (1 to i).foldLeft(1L)(_ * _.toLong)
    def weight(s: Int): Double =
      (fact(s) * fact(n - 1 - s)).toDouble / fact(n).toDouble
    val flagCols = channels.zipWithIndex.map { case (c, i) =>
      s"MAX(CASE WHEN e.event_type = '$c' THEN 1 ELSE 0 END) AS h$i"
    }.mkString(",\n               ")
    val masks = 0 until (1 << n)
    val vCols = masks.map { m =>
      val absent = (0 until n).filter(i => (m & (1 << i)) == 0)
      val cond =
        if (absent.isEmpty) "TRUE"
        else absent.map(i => s"h$i = 0").mkString(" AND ")
      s"SUM(CASE WHEN $cond THEN 1 ELSE 0 END)::BIGINT AS v$m"
    }.mkString(",\n               ")
    val full = (1 << n) - 1
    val rows = channels.zipWithIndex.map { case (c, ci) =>
      val bit = 1 << ci
      val phi = masks.filter(m => (m & bit) == 0).map { m =>
        s"${weight(Integer.bitCount(m))} * (v${m | bit} - v$m)"
      }.mkString(" + ")
      s"SELECT '$c' AS channel, CAST(ROUND($phi, 6) AS DOUBLE) AS " +
        s"shapley, v$full AS n_conversions FROM v"
    }.mkString("\n      UNION ALL\n      ")
    s"""
      WITH fp AS (SELECT user_id, MIN(ts) AS fpts FROM events
                  WHERE event_type = 'purchase' GROUP BY user_id),
      tc AS (SELECT f.user_id,
               $flagCols
             FROM fp f LEFT JOIN events e
               ON e.user_id = f.user_id AND e.ts < f.fpts
              AND e.event_type IN (${channels.map(c => s"'$c'")
                .mkString(",")})
             GROUP BY f.user_id),
      v AS (SELECT $vCols FROM tc)
      $rows
      ORDER BY channel"""
  }

  // One ALS half-pass, mirroring Scoring.alsFactors' solve tree
  // operation-for-operation: 12-dp frozen decimal normal-equation
  // sums, ridge +0.1 applied after the double cast, Cramer numerators
  // in the exact same association, 12-dp refreeze. `out` factors for
  // `outKey` are solved from `from`'s fixed factors joined on
  // `joinKey`. MATERIALIZED keeps DuckDB from exponentially inlining
  // the four-pass chain (the louvain2 lesson).
  private def alsHalfPass(out: String, outKey: String, from: String,
      joinKey: String): String = {
    val det = s"((CAST(a11 AS DOUBLE) + 0.1) * (CAST(a22 AS DOUBLE) + 0.1)" +
      s" - CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE))"
    s""",
      ${out}_agg AS MATERIALIZED (
        SELECT rat.$outKey AS k,
               SUM(CAST(ROUND(f1 * f1, 12) AS DECIMAL(38,12))) AS a11,
               SUM(CAST(ROUND(f1 * f2, 12) AS DECIMAL(38,12))) AS a12,
               SUM(CAST(ROUND(f2 * f2, 12) AS DECIMAL(38,12))) AS a22,
               SUM(CAST(ROUND(r * f1, 12) AS DECIMAL(38,12))) AS b1,
               SUM(CAST(ROUND(r * f2, 12) AS DECIMAL(38,12))) AS b2
        FROM rat JOIN $from ON $from.$joinKey = rat.$joinKey
        GROUP BY rat.$outKey),
      $out AS MATERIALIZED (
        SELECT k AS $outKey,
               CASE WHEN $det > 0.0 THEN
                 ROUND((CAST(b1 AS DOUBLE) * (CAST(a22 AS DOUBLE) + 0.1)
                   - CAST(b2 AS DOUBLE) * CAST(a12 AS DOUBLE))
                   / $det, 12)
               ELSE 0.0 END AS f1,
               CASE WHEN $det > 0.0 THEN
                 ROUND(((CAST(a11 AS DOUBLE) + 0.1) * CAST(b2 AS DOUBLE)
                   - CAST(a12 AS DOUBLE) * CAST(b1 AS DOUBLE))
                   / $det, 12)
               ELSE 0.0 END AS f2
        FROM ${out}_agg)"""
  }

  // The q_als factor chain: exact mean ratings, id-derived item init,
  // then iters=2 unrolled as four half-passes (uf1 <- if0, if1 <- uf1,
  // uf2 <- if1, if2 <- uf2); final factors are uf2/if2.
  private val alsCtes: String = """
      WITH rat AS MATERIALIZED (
        SELECT o.o_custkey AS u, l.l_partkey AS i,
               ROUND(CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,6)))
                 AS DOUBLE) / COUNT(*), 6) AS r
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_orderkey % 3 = 0 AND l.l_partkey % 50 = 0
        GROUP BY o.o_custkey, l.l_partkey),
      if0 AS MATERIALIZED (
        SELECT DISTINCT i,
               ROUND(0.5 + (i % 7) * 0.1, 12) AS f1,
               ROUND(0.3 + (i % 11) * 0.04, 12) AS f2
        FROM rat)""" +
    alsHalfPass("uf1", "u", "if0", "i") +
    alsHalfPass("if1", "i", "uf1", "u") +
    alsHalfPass("uf2", "u", "if1", "i") +
    alsHalfPass("if2", "i", "uf2", "u")

  // The ALS top-3 serving CTEs on the final factors: catalog cross
  // join, owned-cell anti-join, (score DESC, item) total order.
  private val alsRecsCtes: String = alsCtes + """,
      scored AS (
        SELECT uf2.u AS u, if2.i AS i,
               ROUND(uf2.f1 * if2.f1 + uf2.f2 * if2.f2, 6) AS score
        FROM uf2 CROSS JOIN if2
        WHERE NOT EXISTS (SELECT 1 FROM rat h
                          WHERE h.u = uf2.u AND h.i = if2.i)),
      ranked AS (
        SELECT u, i, score,
               ROW_NUMBER() OVER (PARTITION BY u
                 ORDER BY score DESC, i) AS rank
        FROM scored)"""

  // One EM pass over the linkage comparison vectors: 12-dp-frozen
  // class log-scores with every ln taken OF the previous pass's
  // frozen 6-dp params (params${t-1} is a 1-row CTE), max-shifted
  // two-class softmax at 12 dp, then the M-step's decimal folds and
  // 6-dp clamped refreeze — mirroring FuzzyJoin.fellegiSunterEm's
  // trees node for node. A degenerate pass keeps previous params.
  private def linkageEmCtes(t: Int): String = {
    def smTerm(j: Int, pc: String) =
      s"(CASE WHEN a$j THEN LN(p.$pc$j) ELSE LN(1.0 - p.$pc$j) END)"
    def clamp(v: String) =
      s"LEAST(GREATEST(ROUND($v, 6), 0.000001), 0.999999)"
    val amCols = (0 until 3).map(j => s"""
               SUM(CAST(CASE WHEN a$j THEN r ELSE 0.0 END
                 AS DECIMAL(38,12))) AS am$j,
               SUM(CASE WHEN a$j THEN 1 ELSE 0 END)::BIGINT AS ag$j""")
      .mkString(",")
    val mCols = (0 until 3).map(j => s"""
               CASE WHEN CAST(g.sr AS DOUBLE) > 0.0
                     AND CAST(g.sr AS DOUBLE) < CAST(g.n AS DOUBLE)
                 THEN ${clamp(s"CAST(g.am$j AS DOUBLE) / CAST(g.sr AS DOUBLE)")}
                 ELSE p.m$j END AS m$j,
               CASE WHEN CAST(g.sr AS DOUBLE) > 0.0
                     AND CAST(g.sr AS DOUBLE) < CAST(g.n AS DOUBLE)
                 THEN ${clamp(s"(CAST(g.ag$j AS DOUBLE) - CAST(g.am$j AS DOUBLE)) / (CAST(g.n AS DOUBLE) - CAST(g.sr AS DOUBLE))")}
                 ELSE p.u$j END AS u$j""").mkString(",")
    s""",
      e$t AS MATERIALIZED (
        SELECT a0, a1, a2,
               ROUND(LN(p.p) + ${smTerm(0, "m")} + ${smTerm(1, "m")}
                 + ${smTerm(2, "m")}, 12) AS sm,
               ROUND(LN(1.0 - p.p) + ${smTerm(0, "u")}
                 + ${smTerm(1, "u")} + ${smTerm(2, "u")}, 12) AS su
        FROM pairs CROSS JOIN params${t - 1} p),
      r$t AS (SELECT a0, a1, a2,
               ROUND(EXP(sm - GREATEST(sm, su))
                 / (EXP(sm - GREATEST(sm, su))
                   + EXP(su - GREATEST(sm, su))), 12) AS r
              FROM e$t),
      g$t AS (SELECT COUNT(*)::BIGINT AS n,
               SUM(CAST(r AS DECIMAL(38,12))) AS sr,$amCols
              FROM r$t),
      params$t AS (
        SELECT g.n,
               CASE WHEN CAST(g.sr AS DOUBLE) > 0.0
                     AND CAST(g.sr AS DOUBLE) < CAST(g.n AS DOUBLE)
                 THEN ${clamp("CAST(g.sr AS DOUBLE) / CAST(g.n AS DOUBLE)")}
                 ELSE p.p END AS p,$mCols
        FROM g$t g CROSS JOIN params${t - 1} p)"""
  }

  // q_linkage_em's oracle: the q_linkage_weights pair CTEs (label
  // withheld), literal params0 (p=0.1, m=0.9, u=0.1), two unrolled
  // EM passes, then the per-field weight trees on the final params.
  private val linkageEmOracle: String = {
    val ln2 = graft.operators.TextAnalysis.ln2
    def fieldRow(name: String, j: Int) = s"""
      SELECT '$name' AS field, n::BIGINT AS n_pairs,
             CAST(p AS DOUBLE) AS p_match, CAST(m$j AS DOUBLE) AS m,
             CAST(u$j AS DOUBLE) AS u,
             CAST(ROUND(LN(m$j / u$j) / $ln2, 6) AS DOUBLE) AS w_agree,
             CAST(ROUND(LN((1.0 - m$j) / (1.0 - u$j)) / $ln2, 6)
               AS DOUBLE) AS w_disagree
      FROM params2"""
    """
      WITH base AS (
        SELECT p_partkey AS id, p_name AS nm, p_brand AS br,
               p_type AS ct
        FROM part WHERE p_partkey <= 500),
      uu AS (SELECT * FROM base
             UNION ALL
             SELECT id + 10000, nm || ' x', br, ct FROM base),
      pairs AS MATERIALIZED (
        SELECT (SUBSTR(x.nm, 1, 12) = SUBSTR(y.nm, 1, 12)) AS a0,
               (x.br = y.br) AS a1,
               (x.ct = y.ct) AS a2
        FROM uu x JOIN uu y
          ON SUBSTR(x.nm, 1, 1) = SUBSTR(y.nm, 1, 1) AND x.id < y.id),
      params0 AS (
        SELECT CAST(0.1 AS DOUBLE) AS p,
               CAST(0.9 AS DOUBLE) AS m0, CAST(0.9 AS DOUBLE) AS m1,
               CAST(0.9 AS DOUBLE) AS m2,
               CAST(0.1 AS DOUBLE) AS u0, CAST(0.1 AS DOUBLE) AS u1,
               CAST(0.1 AS DOUBLE) AS u2)""" +
    linkageEmCtes(1) + linkageEmCtes(2) +
    fieldRow("name12", 0) + "\n      UNION ALL" +
    fieldRow("brand", 1) + "\n      UNION ALL" +
    fieldRow("type", 2) + "\n      ORDER BY field"
  }

  val oracles: Map[String, String] = Map(

    // The four unrolled ALS half-passes, then each observed cell's
    // dot-product reconstruction off the final uf2/if2 factors.
    "q_shapley" -> shapleyOracle,

    // Exact decimal revenue per part, the same total order and
    // 12-dp-frozen running shares, literal 80/95 cuts.
    "q_abc" -> """
      WITH items AS (
        SELECT l_partkey AS i,
               SUM(CAST(ROUND(l_extendedprice, 6) AS DECIMAL(38,6)))
                 AS v
        FROM lineitem GROUP BY l_partkey),
      ranked AS (
        SELECT i, v,
               ROW_NUMBER() OVER (ORDER BY v DESC, i ASC) AS rank,
               ROUND(CAST(SUM(v) OVER (ORDER BY v DESC, i ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) / CAST(SUM(v) OVER () AS DOUBLE), 12)
                 AS cum_share
        FROM items)
      SELECT i AS l_partkey, CAST(v AS DOUBLE) AS value,
             rank::BIGINT AS rank,
             CAST(cum_share AS DOUBLE) AS cum_share,
             CASE WHEN cum_share <= 0.8 OR rank = 1 THEN 'A'
                  WHEN cum_share <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM ranked
      ORDER BY rank""",

    // All-integer numerator (confusion cells) and denominator
    // (marginal grid), kappa_w = 1 - n*num/den, one rounded division.
    "q_kappa_weighted" -> """
      WITH g AS (
        SELECT LEAST(CAST(FLOOR(n_chars / 300) AS BIGINT), 5) AS ra,
               LEAST(CAST(FLOOR(LEN(LIST_FILTER(STRING_SPLIT(
                 LOWER(text), ' '), t -> t <> '')) / 50) AS BIGINT), 5)
                 AS rb
        FROM documents),
      cells AS (SELECT ra, rb, COUNT(*)::BIGINT AS n
                FROM g GROUP BY ra, rb),
      num AS (SELECT SUM(((ra - rb) * (ra - rb) * n)::HUGEINT) AS num,
                     SUM(n::HUGEINT) AS n
              FROM cells),
      am AS (SELECT ra, SUM(n)::BIGINT AS na FROM cells GROUP BY ra),
      bm AS (SELECT rb, SUM(n)::BIGINT AS nb FROM cells GROUP BY rb),
      den AS (SELECT SUM(((am.ra - bm.rb) * (am.ra - bm.rb))::HUGEINT
                       * am.na * bm.nb) AS den
              FROM am CROSS JOIN bm)
      SELECT CAST(num.n AS BIGINT) AS n,
             CAST(CASE WHEN CAST(den.den AS DOUBLE) > 0.0 THEN
               ROUND(1.0 - CAST(num.n AS DOUBLE)
                 * CAST(num.num AS DOUBLE) / CAST(den.den AS DOUBLE), 6)
             END AS DOUBLE) AS kappa_w
      FROM num CROSS JOIN den""",

    // Exact (user, day) distincts, first-seen minima, the day-1
    // self-join, and the prev-day churn identity.
    "q_growth_accounting" -> """
      WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
                  FROM events
                  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      fs AS (SELECT u, MIN(d) AS first_d FROM ud GROUP BY u),
      flags AS (
        SELECT ud.d,
               CASE WHEN ud.d = fs.first_d THEN 1 ELSE 0 END AS is_new,
               CASE WHEN y.u IS NOT NULL THEN 1 ELSE 0 END AS is_ret,
               CASE WHEN ud.d > fs.first_d AND y.u IS NULL
                    THEN 1 ELSE 0 END AS is_res
        FROM ud
        JOIN fs ON fs.u = ud.u
        LEFT JOIN ud y ON y.u = ud.u AND y.d = ud.d - 1),
      daily AS (
        SELECT d, COUNT(*)::BIGINT AS dau,
               SUM(is_new)::BIGINT AS new_users,
               SUM(is_ret)::BIGINT AS retained,
               SUM(is_res)::BIGINT AS resurrected
        FROM flags GROUP BY d),
      lagd AS (
        SELECT *, LAG(d) OVER (ORDER BY d) AS pd,
               LAG(dau) OVER (ORDER BY d) AS pdau
        FROM daily),
      fin AS (
        SELECT d, dau, new_users, retained, resurrected,
               CASE WHEN pd = d - 1 THEN pdau - retained END AS churned
        FROM lagd)
      SELECT d AS day, dau, new_users, retained, resurrected,
             CAST(churned AS BIGINT) AS churned,
             CAST(CASE WHEN churned > 0 THEN
               ROUND(CAST(new_users + resurrected AS DOUBLE)
                 / CAST(churned AS DOUBLE), 6) END AS DOUBLE)
               AS quick_ratio
      FROM fin
      ORDER BY day""",

    // Exact daily bad/total counts, rolling integer window sums, one
    // rounded division per window, full-frame gating, frozen compares.
    "q_burn_rate" -> """
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, COUNT(*)::BIGINT AS n,
               SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                 ::BIGINT AS bad
        FROM events GROUP BY 1),
      w AS (
        SELECT d, bad, n,
               ROUND(CAST(SUM(bad) OVER w3 AS DOUBLE)
                 / CAST(SUM(n) OVER w3 AS DOUBLE) / 0.2, 6) AS bs,
               ROUND(CAST(SUM(bad) OVER w7 AS DOUBLE)
                 / CAST(SUM(n) OVER w7 AS DOUBLE) / 0.2, 6) AS bl,
               COUNT(*) OVER w3 AS c3, COUNT(*) OVER w7 AS c7
        FROM daily
        WINDOW w3 AS (ORDER BY d ROWS BETWEEN 2 PRECEDING
                      AND CURRENT ROW),
               w7 AS (ORDER BY d ROWS BETWEEN 6 PRECEDING
                      AND CURRENT ROW))
      SELECT d AS day, bad, n AS total,
             CAST(bs AS DOUBLE) AS burn_short,
             CAST(bl AS DOUBLE) AS burn_long,
             (c3 = 3 AND c7 = 7 AND bs > 1.05 AND bl > 1.0) AS alert
      FROM w
      ORDER BY day""",

    "q_als" -> (alsCtes + """
      SELECT rat.u AS cust, rat.i AS part, CAST(r AS DOUBLE) AS rating,
             CAST(ROUND(uf2.f1 * if2.f1 + uf2.f2 * if2.f2, 6) AS DOUBLE)
               AS pred
      FROM rat JOIN uf2 ON uf2.u = rat.u JOIN if2 ON if2.i = rat.i
      ORDER BY cust, part"""),

    // The ALS serving CTEs; rank <= 3 under the exact (score DESC, i)
    // order both engines share.
    "q_als_recs" -> (alsRecsCtes + """
      SELECT u AS cust, i AS part, CAST(score AS DOUBLE) AS score,
             CAST(rank AS INT) AS rank
      FROM ranked WHERE rank <= 3
      ORDER BY cust, rank"""),

    // The ALS serving CTEs feeding the q_rec_eval panel verbatim
    // (hist := the rating cells, recs := the ALS top-3) — proving the
    // panel composes over either recommender.
    "q_rec_eval_als" -> (alsRecsCtes + """,
      recs AS (SELECT u, i FROM ranked WHERE rank <= 3),
      pairs AS (
        SELECT x.i AS item_a, y.i AS item_b, COUNT(*)::BIGINT AS n_both
        FROM rat x JOIN rat y ON x.u = y.u AND x.i < y.i
        GROUP BY x.i, y.i),
      singles AS (SELECT i, COUNT(*)::BIGINT AS c FROM rat GROUP BY i),
      sim AS (
        SELECT item_a, item_b,
               ROUND(n_both / SQRT(CAST(ca.c * cb.c AS DOUBLE)), 6)
                 AS cosine
        FROM pairs
        JOIN singles ca ON ca.i = pairs.item_a
        JOIN singles cb ON cb.i = pairs.item_b),
      stats AS (SELECT COUNT(DISTINCT u)::BIGINT AS hu,
                       COUNT(DISTINCT i)::BIGINT AS cat FROM rat),
      pop AS (SELECT i, COUNT(*)::BIGINT AS own FROM rat GROUP BY i),
      nov AS (
        SELECT COUNT(*)::BIGINT AS nr,
               SUM(CASE WHEN pop.own IS NOT NULL THEN
                 CAST(ROUND(-LN(CAST(pop.own AS DOUBLE)
                   / CAST(stats.hu AS DOUBLE)), 12)
                   AS DECIMAL(38,12)) END) AS snov,
               SUM(CASE WHEN pop.own IS NOT NULL THEN 1 ELSE 0 END)
                 ::BIGINT AS nnov
        FROM recs LEFT JOIN pop ON pop.i = recs.i CROSS JOIN stats),
      rstats AS (SELECT COUNT(DISTINCT u)::BIGINT AS ru,
                        COUNT(DISTINCT i)::BIGINT AS ri FROM recs),
      div AS (
        SELECT COUNT(*)::BIGINT AS np,
               SUM(CAST(ROUND(1.0 - COALESCE(s.cosine, 0.0), 12)
                 AS DECIMAL(38,12))) AS sdiv
        FROM recs a JOIN recs b ON a.u = b.u AND a.i < b.i
        LEFT JOIN sim s ON s.item_a = a.i AND s.item_b = b.i)
      SELECT ru AS n_users, nr AS n_recs, cat AS catalog_size,
             CAST(CASE WHEN cat > 0 THEN
               ROUND(CAST(ri AS DOUBLE) / CAST(cat AS DOUBLE), 6)
             END AS DOUBLE) AS coverage,
             CAST(CASE WHEN nnov > 0 THEN
               ROUND(CAST(snov AS DOUBLE) / CAST(nnov AS DOUBLE), 6)
             END AS DOUBLE) AS novelty,
             CAST(CASE WHEN np > 0 THEN
               ROUND(CAST(sdiv AS DOUBLE) / CAST(np AS DOUBLE), 6)
             END AS DOUBLE) AS intra_list_diversity
      FROM nov CROSS JOIN rstats CROSS JOIN div CROSS JOIN stats"""),

    // Exact O / decimal E per q_calibration bin; per-bin terms frozen
    // at 12 dp; degenerate (pi 0/1) bins excluded, k reports used.
    "q_hosmer" -> """
      WITH mm AS (SELECT CAST(MIN(value) AS DOUBLE) AS lo,
                         CAST(MAX(value) AS DOUBLE) AS hi FROM events),
      c AS (SELECT ROUND((value - lo) / (hi - lo), 6) AS conf,
              CASE WHEN TRY_CAST(JSON_EXTRACT_STRING(props, '$.k')
                AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END AS y
            FROM events CROSS JOIN mm),
      b AS (SELECT LEAST(CAST(FLOOR(conf * 10) AS BIGINT), 9) AS bin,
                   CAST(ROUND(conf * 1000000.0) AS BIGINT) AS cq, y
            FROM c WHERE conf IS NOT NULL),
      cells AS (SELECT bin, COUNT(*)::BIGINT AS n, SUM(y)::BIGINT AS o,
                       SUM(cq::HUGEINT) AS e
                FROM b GROUP BY bin),
      t AS (SELECT n,
              CASE WHEN CAST(e AS DOUBLE) / 1000000.0
                     / CAST(n AS DOUBLE) > 0.0
                    AND CAST(e AS DOUBLE) / 1000000.0
                     / CAST(n AS DOUBLE) < 1.0 THEN
                ROUND((CAST(o AS DOUBLE) - CAST(e AS DOUBLE) / 1000000.0)
                  * (CAST(o AS DOUBLE) - CAST(e AS DOUBLE) / 1000000.0)
                  / (CAST(n AS DOUBLE)
                    * (CAST(e AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE))
                    * (1.0 - CAST(e AS DOUBLE) / 1000000.0
                      / CAST(n AS DOUBLE))), 12)::DECIMAL(38,12)
              END AS term
            FROM cells)
      SELECT SUM(n)::BIGINT AS n, COUNT(term)::BIGINT AS k_bins,
             GREATEST(COUNT(term) - 2, 0)::BIGINT AS dof,
             CAST(CASE WHEN COUNT(term) > 0 THEN
               ROUND(CAST(SUM(term) AS DOUBLE), 6) END AS DOUBLE) AS hl
      FROM t""",

    // Distinct symmetrized co-occurrence edges + the q_pagerank
    // iteration CTEs (uniform init, 12-dp rounds); LIMIT under the
    // (rank DESC, word) total order.
    "q_textrank" -> """
      WITH t AS (SELECT LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                   x -> x <> '') AS toks
                 FROM documents),
      pr0 AS (SELECT toks[i] AS w1, toks[i + j] AS w2
              FROM t, UNNEST(RANGE(1, LEN(toks))) r(i),
                   UNNEST(RANGE(1, 3)) s(j)
              WHERE i + j <= LEN(toks) AND toks[i] <> toks[i + j]),
      e0 AS (SELECT DISTINCT w1 AS src, w2 AS dst FROM pr0
             UNION SELECT DISTINCT w2 AS src, w1 AS dst FROM pr0),
      nn AS (SELECT CAST(COUNT(DISTINCT src) AS DOUBLE) AS n FROM e0),
      deg AS (SELECT src AS v, COUNT(*) AS outdeg FROM e0 GROUP BY src),
      p0 AS (SELECT v, outdeg, 1.0 / n AS pr FROM deg CROSS JOIN nn),
      p1 AS (SELECT d.v, d.outdeg,
                    ROUND((1.0 - 0.85) / nn.n + 0.85 * c.s, 12) AS pr
             FROM deg d CROSS JOIN nn
             JOIN (SELECT e0.dst AS v, SUM(p.pr / p.outdeg) AS s
                   FROM e0 JOIN p0 p ON e0.src = p.v GROUP BY e0.dst) c
               ON c.v = d.v),
      p2 AS (SELECT d.v, d.outdeg,
                    ROUND((1.0 - 0.85) / nn.n + 0.85 * c.s, 12) AS pr
             FROM deg d CROSS JOIN nn
             JOIN (SELECT e0.dst AS v, SUM(p.pr / p.outdeg) AS s
                   FROM e0 JOIN p1 p ON e0.src = p.v GROUP BY e0.dst) c
               ON c.v = d.v),
      p3 AS (SELECT d.v, d.outdeg,
                    ROUND((1.0 - 0.85) / nn.n + 0.85 * c.s, 12) AS pr
             FROM deg d CROSS JOIN nn
             JOIN (SELECT e0.dst AS v, SUM(p.pr / p.outdeg) AS s
                   FROM e0 JOIN p2 p ON e0.src = p.v GROUP BY e0.dst) c
               ON c.v = d.v)
      SELECT v AS word, pr AS rank FROM p3
      ORDER BY pr DESC, v LIMIT 20""",

    // Exact bigram/unigram/total counts; PMI one frozen ln of a
    // HUGEINT cross-product ratio; LIMIT under a total order.
    "q_collocations" -> """
      WITH t AS (SELECT LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                   x -> x <> '') AS toks
                 FROM documents),
      uni AS (SELECT UNNEST(toks) AS w FROM t),
      uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
      nn AS (SELECT COUNT(*)::HUGEINT AS n FROM uni),
      bi AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
             FROM t, UNNEST(RANGE(1, LEN(toks))) r(i)
             WHERE LEN(toks) >= 2),
      bc AS (SELECT w1, w2, COUNT(*) AS n_pair FROM bi GROUP BY w1, w2),
      nb AS (SELECT COUNT(*)::HUGEINT AS m FROM bi)
      SELECT b.w1, b.w2, b.n_pair::BIGINT AS n_pair,
             CAST(ROUND(LN(CAST(b.n_pair::HUGEINT * n * n AS DOUBLE)
               / CAST(m * u1.c * u2.c AS DOUBLE)), 6) AS DOUBLE) AS pmi
      FROM bc b
      JOIN uc u1 ON u1.w = b.w1
      JOIN uc u2 ON u2.w = b.w2
      CROSS JOIN nn CROSS JOIN nb
      WHERE b.n_pair >= 5
      ORDER BY pmi DESC, w1, w2 LIMIT 20""",

    // Same bigram/unigram counts; logDice = 14 + ln(2f_xy/(f_x+f_y))/ln2
    // with the interpolated ln2 constant; same cut order.
    "q_logdice" -> s"""
      WITH t AS (SELECT LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                   x -> x <> '') AS toks
                 FROM documents),
      uni AS (SELECT UNNEST(toks) AS w FROM t),
      uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
      bi AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
             FROM t, UNNEST(RANGE(1, LEN(toks))) r(i)
             WHERE LEN(toks) >= 2),
      bc AS (SELECT w1, w2, COUNT(*) AS n_pair FROM bi GROUP BY w1, w2)
      SELECT b.w1, b.w2, b.n_pair::BIGINT AS n_pair,
             CAST(ROUND(14.0 + LN(CAST(2 * b.n_pair AS DOUBLE)
               / CAST(u1.c + u2.c AS DOUBLE))
               / ${graft.operators.TextAnalysis.ln2}, 6) AS DOUBLE)
               AS logdice
      FROM bc b
      JOIN uc u1 ON u1.w = b.w1
      JOIN uc u2 ON u2.w = b.w2
      WHERE b.n_pair >= 5
      ORDER BY logdice DESC, w1, w2 LIMIT 20""",

    // The planted-duplicate pair design replayed: first-char blocks,
    // label j = i + 10000, three agreement fields, exact m/u counts
    // into the same ln/ln2 weight trees.
    // Level-3 apriori: same distinct/threshold/cap/prune chain; the
    // capped pair set joins inner (rows unique) where Spark goes
    // left_semi — identical row sets.
    "q_itemsets3" -> """
      WITH d1 AS (
        SELECT DISTINCT user_id AS b,
               event_type || '#' || CAST(COALESCE(
                 TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)
                   % 3, 0) AS VARCHAR) AS i
        FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
      nb AS (SELECT COUNT(DISTINCT b)::BIGINT AS n FROM d1),
      items AS (SELECT i, COUNT(*)::BIGINT AS ci FROM d1 GROUP BY i),
      d2 AS (SELECT b, i FROM d1
             WHERE i IN (SELECT i FROM items WHERE ci >= 20)),
      pc AS (SELECT x.i AS pa, y.i AS pb, COUNT(*)::BIGINT AS cp
             FROM d2 x JOIN d2 y ON x.b = y.b AND x.i < y.i
             GROUP BY 1, 2),
      fp AS (SELECT pa, pb FROM pc WHERE cp >= 20
             ORDER BY cp DESC, pa, pb LIMIT 50),
      p2 AS (SELECT x.b, x.i AS a, y.i AS b2
             FROM d2 x JOIN d2 y ON x.b = y.b AND x.i < y.i
             JOIN fp ON fp.pa = x.i AND fp.pb = y.i),
      trip AS (
        SELECT w.a, w.b2, z.i AS c
        FROM p2 w JOIN d2 z ON w.b = z.b AND w.b2 < z.i
        JOIN fp f2 ON f2.pa = w.a AND f2.pb = z.i
        JOIN fp f3 ON f3.pa = w.b2 AND f3.pb = z.i),
      cnt3 AS (
        SELECT a, b2, c, COUNT(*)::BIGINT AS n3
        FROM trip GROUP BY a, b2, c HAVING COUNT(*) >= 20)
      SELECT t.a, t.b2 AS b, t.c, t.n3 AS n_baskets,
             CAST(ROUND(t.n3 / CAST(nb.n AS DOUBLE), 6) AS DOUBLE)
               AS support,
             CAST(ROUND((t.n3 * CAST(nb.n AS DOUBLE)
                 * CAST(nb.n AS DOUBLE))
               / (CAST(ia.ci AS DOUBLE) * ib.ci * ic.ci), 6) AS DOUBLE)
               AS lift
      FROM cnt3 t
      CROSS JOIN nb
      JOIN items ia ON ia.i = t.a
      JOIN items ib ON ib.i = t.b2
      JOIN items ic ON ic.i = t.c
      ORDER BY a, b, c""",

    // Split token counts in one aggregate, the same G2 tree, integer
    // cross-multiplied direction, (g2 DESC, token) cut.
    "q_keyness" -> """
      WITH toks AS (
        SELECT (lang = 'en') AS inn,
               UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS w
        FROM documents),
      counts AS (
        SELECT w,
               SUM(CASE WHEN inn THEN 1 ELSE 0 END)::BIGINT AS a,
               SUM(CASE WHEN inn THEN 0 ELSE 1 END)::BIGINT AS b
        FROM toks WHERE w <> '' GROUP BY w),
      tot AS (SELECT SUM(a)::BIGINT AS ta, SUM(b)::BIGINT AS tb
              FROM counts)
      SELECT w AS token, a AS count_a, b AS count_b,
             CAST(ROUND(2.0 * (
               (CASE WHEN a > 0 THEN CAST(a AS DOUBLE)
                   * LN(CAST(a AS DOUBLE)
                     / (CAST(ta AS DOUBLE)
                       * (CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
                       / (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE))))
                 ELSE 0.0 END)
               + (CASE WHEN b > 0 THEN CAST(b AS DOUBLE)
                   * LN(CAST(b AS DOUBLE)
                     / (CAST(tb AS DOUBLE)
                       * (CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
                       / (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE))))
                 ELSE 0.0 END)), 6) AS DOUBLE) AS g2,
             (CAST(a AS HUGEINT) * tb > CAST(b AS HUGEINT) * ta)
               AS overused_in_a
      FROM counts CROSS JOIN tot
      ORDER BY g2 DESC, token
      LIMIT 25""",

    "q_linkage_em" -> linkageEmOracle,

    "q_linkage_weights" -> s"""
      WITH base AS (
        SELECT p_partkey AS id, p_name AS nm, p_brand AS br,
               p_type AS ct
        FROM part WHERE p_partkey <= 500),
      u AS (SELECT * FROM base
            UNION ALL
            SELECT id + 10000, nm || ' x', br, ct FROM base),
      pairs AS (
        SELECT x.id AS i, y.id AS j,
               (y.id = x.id + 10000) AS is_match,
               (SUBSTR(x.nm, 1, 12) = SUBSTR(y.nm, 1, 12)) AS a0,
               (x.br = y.br) AS a1,
               (x.ct = y.ct) AS a2
        FROM u x JOIN u y
          ON SUBSTR(x.nm, 1, 1) = SUBSTR(y.nm, 1, 1) AND x.id < y.id),
      agg AS (
        SELECT SUM(CASE WHEN is_match THEN 1 ELSE 0 END)::BIGINT AS nm,
               SUM(CASE WHEN NOT is_match THEN 1 ELSE 0 END)::BIGINT
                 AS nu,
               SUM(CASE WHEN is_match AND a0 THEN 1 ELSE 0 END)::BIGINT
                 AS am0,
               SUM(CASE WHEN NOT is_match AND a0 THEN 1 ELSE 0 END)
                 ::BIGINT AS au0,
               SUM(CASE WHEN is_match AND a1 THEN 1 ELSE 0 END)::BIGINT
                 AS am1,
               SUM(CASE WHEN NOT is_match AND a1 THEN 1 ELSE 0 END)
                 ::BIGINT AS au1,
               SUM(CASE WHEN is_match AND a2 THEN 1 ELSE 0 END)::BIGINT
                 AS am2,
               SUM(CASE WHEN NOT is_match AND a2 THEN 1 ELSE 0 END)
                 ::BIGINT AS au2
        FROM pairs),
      f AS (
        SELECT 'brand' AS field, nm, nu, am1 AS am, au1 AS au FROM agg
        UNION ALL
        SELECT 'type', nm, nu, am2, au2 FROM agg
        UNION ALL
        SELECT 'name12', nm, nu, am0, au0 FROM agg)
      SELECT field, nm AS n_match, nu AS n_unmatch,
             CAST(CASE WHEN nm > 0 THEN
               ROUND(CAST(am AS DOUBLE) / CAST(nm AS DOUBLE), 6) END
               AS DOUBLE) AS m,
             CAST(CASE WHEN nu > 0 THEN
               ROUND(CAST(au AS DOUBLE) / CAST(nu AS DOUBLE), 6) END
               AS DOUBLE) AS u,
             CAST(CASE WHEN nm > 0 AND nu > 0 AND am > 0 AND au > 0
               THEN ROUND(LN((CAST(am AS DOUBLE) / CAST(nm AS DOUBLE))
                   / (CAST(au AS DOUBLE) / CAST(nu AS DOUBLE)))
                 / ${graft.operators.TextAnalysis.ln2}, 6) END AS DOUBLE)
               AS w_agree,
             CAST(CASE WHEN nm > 0 AND nu > 0 AND am < nm AND au < nu
               THEN ROUND(LN((1.0 - CAST(am AS DOUBLE)
                     / CAST(nm AS DOUBLE))
                   / (1.0 - CAST(au AS DOUBLE) / CAST(nu AS DOUBLE)))
                 / ${graft.operators.TextAnalysis.ln2}, 6) END AS DOUBLE)
               AS w_disagree
      FROM f
      ORDER BY field""",

    // Same counts / smoothed-grid / frozen-ln pipeline; scores are
    // 6-dp-frozen decimal sums so the argmax order is engine-portable.
    "q_naive_bayes" -> """
      WITH toks AS (
        SELECT doc_id AS id, source AS cls,
               UNNEST(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                                  t -> t <> '')) AS tok
        FROM documents),
      dt AS (SELECT id, tok, COUNT(*) AS cnt FROM toks GROUP BY id, tok),
      ct AS (SELECT cls, tok, COUNT(*) AS ctc FROM toks GROUP BY cls, tok),
      tot AS (SELECT cls, COUNT(*) AS tot FROM toks GROUP BY cls),
      voc AS (SELECT DISTINCT tok FROM toks),
      vn AS (SELECT COUNT(*) AS v FROM voc),
      nd AS (SELECT COUNT(*) AS nd FROM documents),
      pri AS (SELECT source AS cls,
                ROUND(LN(CAST(COUNT(*) AS DOUBLE)
                  / CAST(MAX(nd.nd) AS DOUBLE)), 12)::DECIMAL(38,12)
                  AS prior
              FROM documents CROSS JOIN nd GROUP BY source),
      grid AS (SELECT voc.tok, t.cls,
                 ROUND(LN(CAST(COALESCE(c.ctc, 0) + 1 AS DOUBLE)
                   / CAST(t.tot + vn.v AS DOUBLE)), 12)::DECIMAL(38,12)
                   AS lnp
               FROM voc CROSS JOIN tot t
               LEFT JOIN ct c ON c.tok = voc.tok AND c.cls = t.cls
               CROSS JOIN vn),
      contrib AS (SELECT d.id, g.cls,
                    SUM(ROUND(CAST(d.cnt AS DOUBLE)
                      * CAST(g.lnp AS DOUBLE), 6)::DECIMAL(38,6)) AS tsum
                  FROM dt d JOIN grid g ON d.tok = g.tok
                  GROUP BY d.id, g.cls),
      sc AS (SELECT doc.doc_id AS id, p.cls,
               ROUND(CAST(p.prior AS DOUBLE)
                 + COALESCE(CAST(c.tsum AS DOUBLE), 0.0), 6) AS score
             FROM documents doc CROSS JOIN pri p
             LEFT JOIN contrib c ON c.id = doc.doc_id AND c.cls = p.cls),
      r AS (SELECT id, cls, score,
              ROW_NUMBER() OVER (PARTITION BY id
                ORDER BY score DESC, cls) AS rn
            FROM sc)
      SELECT id AS doc_id, cls AS pred, CAST(score AS DOUBLE) AS score
      FROM r WHERE rn = 1 ORDER BY doc_id""",

    // Exact integer cells; each rate ONE rounded division spelled
    // identically; MCC numerator in HUGEINT, denominator the same
    // left-associated product of four double factors under the sqrt.
    "q_confusion" -> """
      WITH l AS (SELECT event_type,
               CASE WHEN TRY_CAST(JSON_EXTRACT_STRING(props, '$.k')
                 AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END AS y,
               CASE WHEN value >= 50.0 THEN 1 ELSE 0 END AS p
             FROM events WHERE value IS NOT NULL),
      c AS (SELECT event_type,
              SUM(y * p)::BIGINT AS tp, SUM((1 - y) * p)::BIGINT AS fp,
              SUM(y * (1 - p))::BIGINT AS fn,
              SUM((1 - y) * (1 - p))::BIGINT AS tn
            FROM l GROUP BY event_type)
      SELECT event_type, tp, fp, fn, tn,
        CAST(ROUND((CAST(tp AS DOUBLE) + CAST(tn AS DOUBLE))
          / CAST(tp + fp + fn + tn AS DOUBLE), 6) AS DOUBLE) AS accuracy,
        CAST(CASE WHEN tp + fp > 0 THEN ROUND(CAST(tp AS DOUBLE)
          / (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)), 6) END
          AS DOUBLE) AS precision,
        CAST(CASE WHEN tp + fn > 0 THEN ROUND(CAST(tp AS DOUBLE)
          / (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE)), 6) END
          AS DOUBLE) AS recall,
        CAST(CASE WHEN 2 * tp + fp + fn > 0 THEN
          ROUND(2.0 * CAST(tp AS DOUBLE) / (2.0 * CAST(tp AS DOUBLE)
            + CAST(fp AS DOUBLE) + CAST(fn AS DOUBLE)), 6) END
          AS DOUBLE) AS f1,
        CAST(CASE WHEN tp + fp > 0 AND tp + fn > 0 AND tn + fp > 0
            AND tn + fn > 0 THEN
          ROUND(CAST(tp::HUGEINT * tn - fp::HUGEINT * fn AS DOUBLE)
            / SQRT(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
              * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)), 6)
          END AS DOUBLE) AS mcc
      FROM c ORDER BY event_type""",

    // 6-dp conf quanta; clamp endpoints computed as 1.0 - 0.000001 on
    // both engines; per-row ln terms frozen at 12 dp into
    // DECIMAL(38,12); one rounded mean.
    "q_log_loss" -> """
      WITH mm AS (SELECT CAST(MIN(value) AS DOUBLE) AS lo,
                         CAST(MAX(value) AS DOUBLE) AS hi FROM events),
      c AS (SELECT event_type,
              ROUND((value - lo) / (hi - lo), 6) AS conf,
              CASE WHEN TRY_CAST(JSON_EXTRACT_STRING(props, '$.k')
                AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END AS y
            FROM events CROSS JOIN mm WHERE value IS NOT NULL),
      t AS (SELECT event_type,
              ROUND(CASE WHEN y = 1
                THEN -LN(LEAST(GREATEST(conf, 0.000001), 1.0 - 0.000001))
                ELSE -LN(1.0 - LEAST(GREATEST(conf, 0.000001),
                  1.0 - 0.000001)) END, 12)::DECIMAL(38,12) AS term
            FROM c)
      SELECT event_type, COUNT(*)::BIGINT AS n,
             CAST(ROUND(CAST(SUM(term) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE) AS logloss
      FROM t GROUP BY event_type ORDER BY event_type""",

    // (value DESC, event_id) pinned total order; integer rank and
    // cumulative-positive; positive rows' cumPos/k frozen at 12 dp;
    // AP one division by n_pos.
    "q_avg_precision" -> """
      WITH l AS (SELECT event_type, value, event_id,
               CASE WHEN TRY_CAST(JSON_EXTRACT_STRING(props, '$.k')
                 AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END AS y
             FROM events WHERE value IS NOT NULL),
      r AS (SELECT event_type, y,
              ROW_NUMBER() OVER (PARTITION BY event_type
                ORDER BY value DESC, event_id) AS k,
              SUM(y) OVER (PARTITION BY event_type
                ORDER BY value DESC, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
            FROM l),
      t AS (SELECT event_type, y,
              CASE WHEN y = 1 THEN ROUND(CAST(cp AS DOUBLE)
                / CAST(k AS DOUBLE), 12)::DECIMAL(38,12) END AS prec
            FROM r)
      SELECT event_type, COUNT(*)::BIGINT AS n,
             SUM(y)::BIGINT AS n_pos,
             CAST(CASE WHEN SUM(y) > 0 THEN
               ROUND(CAST(SUM(prec) AS DOUBLE)
                 / CAST(SUM(y) AS DOUBLE), 6) END AS DOUBLE) AS ap
      FROM t GROUP BY event_type ORDER BY event_type""",

    // The q_rbo_eval ranking CTEs; first_rank an exact integer MIN,
    // rr one rounded division, no-hit queries 0.
    "q_mrr" -> """
      WITH ag AS (SELECT event_type, user_id, ROUND(SUM(value), 6) AS m
                  FROM events GROUP BY event_type, user_id),
      ar AS (SELECT event_type, user_id,
               ROW_NUMBER() OVER (PARTITION BY event_type
                 ORDER BY m DESC NULLS LAST, user_id) AS ra
             FROM ag),
      bg AS (SELECT event_type, user_id, COUNT(*) AS m
             FROM events GROUP BY event_type, user_id),
      br AS (SELECT event_type, user_id,
               ROW_NUMBER() OVER (PARTITION BY event_type
                 ORDER BY m DESC NULLS LAST, user_id) AS rb
             FROM bg),
      rel AS (SELECT DISTINCT event_type, user_id FROM br WHERE rb <= 3),
      hit AS (SELECT a.event_type, MIN(a.ra) AS first_rank
              FROM ar a JOIN rel r ON a.event_type = r.event_type
                AND a.user_id = r.user_id
              WHERE a.ra <= 10 GROUP BY a.event_type),
      q AS (SELECT DISTINCT event_type FROM rel)
      SELECT q.event_type, h.first_rank,
             CAST(COALESCE(ROUND(1.0 / h.first_rank, 6), 0.0) AS DOUBLE)
               AS rr
      FROM q LEFT JOIN hit h USING (event_type)
      ORDER BY event_type""",

    // Same strictly-following IGNORE NULLS window, integer micros
    // comparison, one rounded rate.
    "q_funnel_windowed" -> """
      WITH nx AS (
        SELECT event_type, EPOCH_US(ts) AS us,
               FIRST_VALUE(CASE WHEN event_type = 'purchase'
                             THEN EPOCH_US(ts) END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                 AS nxt
        FROM events)
      SELECT COUNT(*)::BIGINT AS n_from,
             SUM(CASE WHEN nxt IS NOT NULL
                       AND nxt - us <= 3600000000::BIGINT
                  THEN 1 ELSE 0 END)::BIGINT AS n_converted,
             CAST(CASE WHEN COUNT(*) > 0 THEN
               ROUND(SUM(CASE WHEN nxt IS NOT NULL
                           AND nxt - us <= 3600000000::BIGINT
                        THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6)
             END AS DOUBLE) AS conversion_rate
      FROM nx WHERE event_type = 'click'""",

    // Same lowercase whitespace tokens, set-semantics distinct match
    // counts, total-occurrence grades — all integers.
    "q_bool_search" -> """
      SELECT doc_id, COUNT(DISTINCT tok)::BIGINT AS n_matched,
             COUNT(*)::BIGINT AS tf_total
      FROM (
        SELECT doc_id,
               UNNEST(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                 t -> t <> '')) AS tok
        FROM documents)
      WHERE tok IN ('spark', 'query')
      GROUP BY doc_id
      HAVING COUNT(DISTINCT tok) >= 2
      ORDER BY doc_id""",

    // Same first-day cohorts and scaled-long cumulative (window sum
    // cast ::BIGINT — the HUGEINT class), one rounded division.
    "q_cohort_ltv" -> """
      WITH u AS (
        SELECT user_id AS uu, CAST(ts AS DATE) AS d,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS q
        FROM events),
      f AS (SELECT uu, MIN(d) AS f0 FROM u GROUP BY uu),
      cells AS (
        SELECT f.f0 AS cohort, DATEDIFF('day', f.f0, u.d)::BIGINT
                 AS day_offset,
               COUNT(DISTINCT u.uu)::BIGINT AS n_active,
               SUM(u.q)::BIGINT AS v
        FROM u JOIN f ON u.uu = f.uu
        GROUP BY 1, 2),
      w AS (
        SELECT cohort, day_offset, n_active,
               SUM(v) OVER (PARTITION BY cohort ORDER BY day_offset)
                 ::BIGINT AS cum,
               MAX(CASE WHEN day_offset = 0 THEN n_active END)
                 OVER (PARTITION BY cohort)::BIGINT AS sz
        FROM cells)
      SELECT CAST(cohort AS VARCHAR) AS cohort, day_offset, n_active,
             CAST(ROUND(cum / (sz * 1000000.0), 6) AS DOUBLE)
               AS cum_value_per_user
      FROM w
      ORDER BY cohort, day_offset""",

    // Same exact integer (n, successes), the same interpolated log
    // constants, one rounded multiply-add, decisions on the ROUNDED
    // llr.
    "q_sprt" -> s"""
      WITH byg AS (
        SELECT event_type, COUNT(*)::BIGINT AS n,
               SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)::BIGINT
                 AS successes
        FROM events GROUP BY event_type),
      sc AS (
        SELECT event_type, n, successes,
               CAST(ROUND(successes * ${sprtC._1}
                 + (n - successes) * ${sprtC._2}, 6) AS DOUBLE) AS llr
        FROM byg)
      SELECT event_type, n, successes, llr,
             CASE WHEN llr >= ${sprtC._4} THEN 'accept_h1'
                  WHEN llr <= ${sprtC._3} THEN 'accept_h0'
                  ELSE 'continue' END AS decision
      FROM sc
      ORDER BY event_type""",

    // Same min-max confidence, scaled-long deviations, HUGEINT sum of
    // squares mirroring decimal(38,0), one rounded division.
    "q_brier" -> """
      WITH mm AS (SELECT CAST(MIN(value) AS DOUBLE) AS lo,
                         CAST(MAX(value) AS DOUBLE) AS hi FROM events),
      sc AS (
        SELECT CAST(ROUND((value - lo) / (hi - lo), 6) AS DOUBLE) AS conf,
               CASE WHEN event_type = 'purchase' THEN 1000000 ELSE 0 END
                 AS y
        FROM events CROSS JOIN mm),
      d AS (
        SELECT (CAST(ROUND(conf * 1000000.0) AS BIGINT) - y) AS dd
        FROM sc WHERE conf IS NOT NULL)
      SELECT CAST(ROUND(CAST(SUM(dd::HUGEINT * dd) AS DOUBLE)
               / (CAST(COUNT(*) AS DOUBLE) * 1000000000000.0), 6)
               AS DOUBLE) AS brier,
             COUNT(*)::BIGINT AS n
      FROM d""",

    // Same score-DESC total-order rank, closed-form buckets, and the
    // HUGEINT cross-product lift mirroring decimal(38,0).
    "q_lift_curve" -> """
      WITH base AS (
        SELECT event_id AS id, value AS s,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events WHERE value IS NOT NULL),
      nn AS (SELECT COUNT(*)::BIGINT AS n, SUM(y)::BIGINT AS p FROM base),
      rk AS (SELECT id, y,
               ROW_NUMBER() OVER (ORDER BY s DESC, id) AS r
             FROM base),
      b AS (SELECT (((r - 1) * 10) // n + 1)::BIGINT AS bucket,
                   COUNT(*)::BIGINT AS bn, SUM(y)::BIGINT AS bp
            FROM rk CROSS JOIN nn GROUP BY 1),
      c AS (SELECT bucket, bn, bp,
                   SUM(bn) OVER (ORDER BY bucket)::BIGINT AS cn,
                   SUM(bp) OVER (ORDER BY bucket)::BIGINT AS cp
            FROM b)
      SELECT bucket, bn AS n, bp AS n_pos,
             CAST(ROUND(bp / CAST(bn AS DOUBLE), 6) AS DOUBLE) AS rate,
             CAST(CASE WHEN p > 0 THEN
               ROUND(cp / CAST(p AS DOUBLE), 6) END AS DOUBLE)
               AS cum_capture,
             CAST(CASE WHEN p > 0 THEN
               ROUND(CAST(cp::HUGEINT * n AS DOUBLE)
                 / CAST(cn::HUGEINT * p AS DOUBLE), 6) END AS DOUBLE)
               AS lift
      FROM c CROSS JOIN nn
      ORDER BY bucket""",

    // Same user-keyed lead over the same (ts, event_id) total order;
    // totals integer-DIV'd to seconds (the HUGEINT window-sum class is
    // dodged by casting the sum back to BIGINT before dividing).
    "q_dwell" -> """
      WITH d AS (
        SELECT event_type,
               LEAD(EPOCH_US(ts)) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id)
                 - EPOCH_US(ts) AS dw
        FROM events)
      SELECT event_type, COUNT(*)::BIGINT AS n_dwells,
             (SUM(dw)::BIGINT // 1000000)::BIGINT AS total_dwell_sec,
             CAST(ROUND(SUM(dw)::BIGINT / (COUNT(*) * 1000000.0), 6)
               AS DOUBLE) AS avg_dwell_sec
      FROM d WHERE dw IS NOT NULL
      GROUP BY event_type
      ORDER BY event_type""",

    // Same (user, type)-keyed lag gap in integer microseconds.
    "q_debounce" -> """
      WITH lagd AS (
        SELECT event_id, user_id, event_type,
               EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER
                 (PARTITION BY user_id, event_type
                  ORDER BY ts, event_id) AS gap
        FROM events)
      SELECT event_id, user_id, event_type
      FROM lagd WHERE gap IS NULL OR gap > 3600000000::BIGINT
      ORDER BY event_id""",

    // Same per-customer aggregate (exact DECIMAL(18,2) revenue), the
    // same three best-first total-order ranks, and the same
    // closed-form floor tile — integer // arithmetic mirrors Spark's
    // floor(double) exactly (quotient error ~1e-15 vs the 1/N >= 1e-9
    // gap to the nearest integer boundary).
    "q_rfm" -> """
      WITH agg AS (
        SELECT o_custkey AS customer,
               MAX(CAST(o_orderdate AS DATE)) AS last_d,
               COUNT(*)::BIGINT AS frequency,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
        FROM orders GROUP BY 1),
      anchor AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS ad FROM orders),
      base AS (
        SELECT customer,
               DATE_DIFF('day', last_d, ad)::BIGINT AS recency_days,
               frequency, mon
        FROM agg CROSS JOIN anchor),
      n AS (SELECT COUNT(*)::BIGINT AS nc FROM base),
      rk AS (
        SELECT customer, recency_days, frequency, mon,
               ROW_NUMBER() OVER (ORDER BY recency_days, customer) AS rr,
               ROW_NUMBER() OVER (ORDER BY frequency DESC, customer) AS rf,
               ROW_NUMBER() OVER (ORDER BY mon DESC, customer) AS rm
        FROM base)
      SELECT customer, recency_days, frequency,
             CAST(mon AS DOUBLE) AS monetary,
             (5 - ((rr - 1) * 5) // nc)::BIGINT AS r_score,
             (5 - ((rf - 1) * 5) // nc)::BIGINT AS f_score,
             (5 - ((rm - 1) * 5) // nc)::BIGINT AS m_score,
             ((5 - ((rr - 1) * 5) // nc) * 100
              + (5 - ((rf - 1) * 5) // nc) * 10
              + (5 - ((rm - 1) * 5) // nc))::BIGINT AS rfm
      FROM rk CROSS JOIN n
      ORDER BY customer""",

    // Same revenue-DESC total-order rank, closed-form buckets, exact
    // decimal bucket sums, one rounded double division per share.
    "q_pareto" -> """
      WITH agg AS (
        SELECT o_custkey AS c,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
        FROM orders GROUP BY 1),
      n AS (SELECT COUNT(*)::BIGINT AS nc FROM agg),
      rk AS (SELECT c, mon,
               ROW_NUMBER() OVER (ORDER BY mon DESC, c) AS r
             FROM agg),
      b AS (SELECT (((r - 1) * 10) // nc + 1)::BIGINT AS bucket,
                   COUNT(*)::BIGINT AS n_customers, SUM(mon) AS bmon
            FROM rk CROSS JOIN n GROUP BY 1),
      tot AS (SELECT SUM(bmon) AS t FROM b)
      SELECT bucket, n_customers, CAST(bmon AS DOUBLE) AS revenue,
             CAST(ROUND(CAST(bmon AS DOUBLE) / CAST(t AS DOUBLE), 6)
               AS DOUBLE) AS revenue_share,
             CAST(ROUND(CAST(SUM(bmon) OVER (ORDER BY bucket) AS DOUBLE)
               / CAST(t AS DOUBLE), 6) AS DOUBLE) AS cum_share
      FROM b CROSS JOIN tot
      ORDER BY bucket""",

    // Same IGNORE NULLS first/last windows over the same per-user
    // (ts, event_id) total order; purchases with no prior
    // non-purchase event credit 'direct' on both engines.
    // Integer category cells, frozen c·ln c decimal sums, unbiased
    // integer Simpson.
    "q_diversity" -> """
      WITH cells AS (
        SELECT source, lang, COUNT(*)::BIGINT AS c
        FROM documents GROUP BY source, lang),
      agg AS (
        SELECT source, SUM(c)::BIGINT AS n, COUNT(*)::BIGINT AS k,
               CAST(SUM(CAST(ROUND(c * LN(c), 12) AS DECIMAL(38,12)))
                 AS DOUBLE) AS clnc,
               SUM(c * (c - 1))::BIGINT AS same
        FROM cells GROUP BY source),
      h AS (SELECT source, n, k, ROUND(LN(n) - clnc / n, 6) AS hh, same
            FROM agg)
      SELECT source, n, k AS richness,
             CAST(hh AS DOUBLE) AS shannon,
             CAST(ROUND(EXP(hh), 6) AS DOUBLE) AS eff_categories,
             CAST(CASE WHEN n >= 2 THEN
               ROUND(1.0 - same / CAST(n * (n - 1) AS DOUBLE), 6)
               END AS DOUBLE) AS simpson
      FROM h ORDER BY source""",

    // q_calibration's grid; frozen bin means; decimal REL/RES folds.
    "q_brier_decomp" -> """
      WITH mm AS (SELECT CAST(MIN(value) AS DOUBLE) AS lo,
                         CAST(MAX(value) AS DOUBLE) AS hi FROM events),
      scored AS (
        SELECT ROUND((value - lo) / (hi - lo), 6) AS conf,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events CROSS JOIN mm
        WHERE value IS NOT NULL AND event_type IS NOT NULL),
      cells AS (
        SELECT CAST(LEAST(FLOOR(conf * 10), 9) AS BIGINT) AS b,
               COUNT(*)::BIGINT AS nk,
               SUM(CAST(ROUND(conf * 1000000) AS BIGINT)::HUGEINT) AS cs,
               SUM(y)::BIGINT AS pk
        FROM scored GROUP BY 1),
      tot AS (SELECT SUM(nk)::BIGINT AS n, SUM(pk)::BIGINT AS p FROM cells),
      enr AS (
        SELECT b, nk,
               ROUND(CAST(cs AS DOUBLE) / 1000000.0 / nk, 12) AS cm,
               ROUND(CAST(pk AS DOUBLE) / nk, 12) AS am,
               ROUND(CAST(p AS DOUBLE) / n, 12) AS obar, n
        FROM cells CROSS JOIN tot),
      fold AS (
        SELECT n, obar, COUNT(*)::BIGINT AS k,
               CAST(SUM(CAST(ROUND(nk * (cm - am) * (cm - am), 12)
                 AS DECIMAL(38,12))) AS DOUBLE) AS rel,
               CAST(SUM(CAST(ROUND(nk * (am - obar) * (am - obar), 12)
                 AS DECIMAL(38,12))) AS DOUBLE) AS res
        FROM enr GROUP BY n, obar),
      six AS (SELECT n, k, ROUND(rel / n, 6) AS rel6, ROUND(res / n, 6)
                AS res6, ROUND(obar * (1.0 - obar), 6) AS unc6
              FROM fold)
      SELECT n, k AS k_bins,
             CAST(rel6 AS DOUBLE) AS reliability,
             CAST(res6 AS DOUBLE) AS resolution,
             CAST(unc6 AS DOUBLE) AS uncertainty,
             CAST(ROUND(rel6 - res6 + unc6, 6) AS DOUBLE) AS brier_binned
      FROM six""",

    // One (actual, pred) cell aggregate; class-keyed set algebra;
    // rounded divisions with NULL zero-denominators.
    "q_f1_panel" -> """
      WITH ev AS (
        SELECT event_type AS a,
               CASE WHEN event_id % 3 = 0 THEN event_type
                    WHEN event_id % 3 = 1 THEN 'bot'
                    ELSE 'click' END AS p
        FROM events
        WHERE event_type IS NOT NULL),
      cells AS (SELECT a, p, COUNT(*)::BIGINT AS c FROM ev GROUP BY a, p),
      act AS (SELECT a, SUM(c)::BIGINT AS n_actual FROM cells GROUP BY a),
      prd AS (SELECT p, SUM(c)::BIGINT AS n_pred FROM cells GROUP BY p),
      tp AS (SELECT a AS cl, c AS tp FROM cells WHERE a = p),
      classes AS (SELECT a AS cl FROM act UNION SELECT p FROM prd),
      base AS (
        SELECT classes.cl AS class,
               COALESCE(n_actual, 0)::BIGINT AS n_actual,
               COALESCE(n_pred, 0)::BIGINT AS n_pred,
               COALESCE(tp, 0)::BIGINT AS tp
        FROM classes
        LEFT JOIN act ON act.a = classes.cl
        LEFT JOIN prd ON prd.p = classes.cl
        LEFT JOIN tp ON tp.cl = classes.cl),
      pr AS (
        SELECT class, n_actual, n_pred, tp,
               CASE WHEN n_pred > 0
                 THEN ROUND(tp / CAST(n_pred AS DOUBLE), 6) END AS precision,
               CASE WHEN n_actual > 0
                 THEN ROUND(tp / CAST(n_actual AS DOUBLE), 6) END AS recall
        FROM base)
      SELECT class, n_actual, n_pred, tp,
             CAST(precision AS DOUBLE) AS precision,
             CAST(recall AS DOUBLE) AS recall,
             CAST(CASE WHEN precision IS NOT NULL AND recall IS NOT NULL
                    AND precision + recall > 0 THEN
               ROUND(2.0 * precision * recall / (precision + recall), 6)
               END AS DOUBLE) AS f1
      FROM pr ORDER BY class""",

    // Global (score DESC, id) rank tiles, integer arm cells, the
    // decimal qini correction.
    "q_qini" -> """
      WITH base AS (
        SELECT event_id AS id, value AS s,
               CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t,
               CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
                 THEN 1 ELSE 0 END AS yt,
               CASE WHEN user_id % 2 <> 0 AND event_type = 'purchase'
                 THEN 1 ELSE 0 END AS yc
        FROM events
        WHERE value IS NOT NULL AND user_id IS NOT NULL
          AND event_type IS NOT NULL),
      nn AS (SELECT COUNT(*)::BIGINT AS n FROM base),
      rk AS (SELECT t, yt, yc,
               ROW_NUMBER() OVER (ORDER BY s DESC, id ASC) AS r
             FROM base),
      pb AS (
        SELECT (FLOOR((r - 1) * 10 / n) + 1)::BIGINT AS bucket,
               SUM(t)::BIGINT AS n_treated,
               SUM(1 - t)::BIGINT AS n_control,
               SUM(yt)::BIGINT AS conv_treated,
               SUM(yc)::BIGINT AS conv_control
        FROM rk CROSS JOIN nn GROUP BY 1),
      cum AS (
        SELECT *,
               SUM(n_treated) OVER wc AS cnt, SUM(n_control) OVER wc AS cnc,
               SUM(conv_treated) OVER wc AS cyt,
               SUM(conv_control) OVER wc AS cyc
        FROM pb
        WINDOW wc AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW))
      SELECT bucket, n_treated, n_control, conv_treated, conv_control,
             CAST(CASE WHEN n_treated > 0 AND n_control > 0 THEN
               ROUND(conv_treated / CAST(n_treated AS DOUBLE)
                 - conv_control / CAST(n_control AS DOUBLE), 6)
               END AS DOUBLE) AS uplift,
             CAST(CASE WHEN cnc > 0 THEN
               ROUND(CAST(cyt AS DOUBLE)
                 - CAST(cyc::HUGEINT * cnt AS DOUBLE)
                   / CAST(cnc AS DOUBLE), 6) END AS DOUBLE) AS qini
      FROM cum ORDER BY bucket""",

    // Full replay: path windows, frozen transition probabilities, 8
    // unrolled absorption steps, removal effects + shares.
    "q_markov_attribution" -> """
      WITH base AS (
        SELECT user_id AS u, ts, event_id AS eid,
               'ch:' || event_type AS et,
               event_type = 'purchase' AS conv
        FROM events),
      wp AS (
        SELECT *, COUNT(CASE WHEN conv THEN 1 END) OVER
            (PARTITION BY u ORDER BY ts, eid
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS path
        FROM base),
      touches AS (SELECT u, path, ts, eid, et FROM wp WHERE NOT conv),
      convp AS (SELECT DISTINCT u, path FROM wp WHERE conv),
      seq AS (
        SELECT t.u, t.path, t.et,
               ROW_NUMBER() OVER (PARTITION BY t.u, t.path
                                  ORDER BY t.ts, t.eid) AS r,
               COUNT(*) OVER (PARTITION BY t.u, t.path) AS k,
               LEAD(t.et) OVER (PARTITION BY t.u, t.path
                                ORDER BY t.ts, t.eid) AS nxt,
               CASE WHEN c.u IS NOT NULL THEN 1 ELSE 0 END AS cv
        FROM touches t LEFT JOIN convp c
          ON c.u = t.u AND c.path = t.path),
      trans AS (
        SELECT 'START' AS src, et AS dst FROM seq WHERE r = 1
        UNION ALL
        SELECT et, nxt FROM seq WHERE nxt IS NOT NULL
        UNION ALL
        SELECT et, CASE WHEN cv = 1 THEN 'CONV' ELSE 'NULL' END
        FROM seq WHERE r = k
        UNION ALL
        SELECT 'START', 'CONV' FROM convp c
        WHERE NOT EXISTS (SELECT 1 FROM touches t
                          WHERE t.u = c.u AND t.path = c.path)),
      probs AS (
        SELECT src, dst,
               ROUND(COUNT(*) / CAST(SUM(COUNT(*))
                 OVER (PARTITION BY src) AS DOUBLE), 12) AS p
        FROM trans GROUP BY src, dst),
      channels AS (
        SELECT DISTINCT st FROM (
          SELECT src AS st FROM probs UNION ALL SELECT dst FROM probs)
        WHERE st LIKE 'ch:%'),
      scen AS (SELECT st AS sc FROM channels
               UNION ALL SELECT 'none'),
      tscen AS (
        SELECT sc, src,
               CASE WHEN dst = sc THEN 'NULL' ELSE dst END AS dst2, p
        FROM probs CROSS JOIN scen WHERE src <> sc),
      v0 AS (SELECT DISTINCT sc, src, 0.0 AS v FROM tscen),
      v1 AS (
        SELECT sc, src,
               ROUND(CAST(SUM(CAST(ROUND(p * val, 12) AS DECIMAL(38,12)))
                 AS DOUBLE), 12) AS v
        FROM (SELECT t.sc, t.src, t.p,
                CASE WHEN t.dst2 = 'CONV' THEN 1.0
                     WHEN t.dst2 = 'NULL' THEN 0.0
                     ELSE COALESCE(pv.v, 0.0) END AS val
              FROM tscen t LEFT JOIN v0 pv
                ON pv.sc = t.sc AND pv.src = t.dst2)
        GROUP BY sc, src),
      v2 AS (
        SELECT sc, src,
               ROUND(CAST(SUM(CAST(ROUND(p * val, 12) AS DECIMAL(38,12)))
                 AS DOUBLE), 12) AS v
        FROM (SELECT t.sc, t.src, t.p,
                CASE WHEN t.dst2 = 'CONV' THEN 1.0
                     WHEN t.dst2 = 'NULL' THEN 0.0
                     ELSE COALESCE(pv.v, 0.0) END AS val
              FROM tscen t LEFT JOIN v1 pv
                ON pv.sc = t.sc AND pv.src = t.dst2)
        GROUP BY sc, src),
      v3 AS (
        SELECT sc, src,
               ROUND(CAST(SUM(CAST(ROUND(p * val, 12) AS DECIMAL(38,12)))
                 AS DOUBLE), 12) AS v
        FROM (SELECT t.sc, t.src, t.p,
                CASE WHEN t.dst2 = 'CONV' THEN 1.0
                     WHEN t.dst2 = 'NULL' THEN 0.0
                     ELSE COALESCE(pv.v, 0.0) END AS val
              FROM tscen t LEFT JOIN v2 pv
                ON pv.sc = t.sc AND pv.src = t.dst2)
        GROUP BY sc, src),
      v4 AS (
        SELECT sc, src,
               ROUND(CAST(SUM(CAST(ROUND(p * val, 12) AS DECIMAL(38,12)))
                 AS DOUBLE), 12) AS v
        FROM (SELECT t.sc, t.src, t.p,
                CASE WHEN t.dst2 = 'CONV' THEN 1.0
                     WHEN t.dst2 = 'NULL' THEN 0.0
                     ELSE COALESCE(pv.v, 0.0) END AS val
              FROM tscen t LEFT JOIN v3 pv
                ON pv.sc = t.sc AND pv.src = t.dst2)
        GROUP BY sc, src),
      v5 AS (
        SELECT sc, src,
               ROUND(CAST(SUM(CAST(ROUND(p * val, 12) AS DECIMAL(38,12)))
                 AS DOUBLE), 12) AS v
        FROM (SELECT t.sc, t.src, t.p,
                CASE WHEN t.dst2 = 'CONV' THEN 1.0
                     WHEN t.dst2 = 'NULL' THEN 0.0
                     ELSE COALESCE(pv.v, 0.0) END AS val
              FROM tscen t LEFT JOIN v4 pv
                ON pv.sc = t.sc AND pv.src = t.dst2)
        GROUP BY sc, src),
      v6 AS (
        SELECT sc, src,
               ROUND(CAST(SUM(CAST(ROUND(p * val, 12) AS DECIMAL(38,12)))
                 AS DOUBLE), 12) AS v
        FROM (SELECT t.sc, t.src, t.p,
                CASE WHEN t.dst2 = 'CONV' THEN 1.0
                     WHEN t.dst2 = 'NULL' THEN 0.0
                     ELSE COALESCE(pv.v, 0.0) END AS val
              FROM tscen t LEFT JOIN v5 pv
                ON pv.sc = t.sc AND pv.src = t.dst2)
        GROUP BY sc, src),
      v7 AS (
        SELECT sc, src,
               ROUND(CAST(SUM(CAST(ROUND(p * val, 12) AS DECIMAL(38,12)))
                 AS DOUBLE), 12) AS v
        FROM (SELECT t.sc, t.src, t.p,
                CASE WHEN t.dst2 = 'CONV' THEN 1.0
                     WHEN t.dst2 = 'NULL' THEN 0.0
                     ELSE COALESCE(pv.v, 0.0) END AS val
              FROM tscen t LEFT JOIN v6 pv
                ON pv.sc = t.sc AND pv.src = t.dst2)
        GROUP BY sc, src),
      v8 AS (
        SELECT sc, src,
               ROUND(CAST(SUM(CAST(ROUND(p * val, 12) AS DECIMAL(38,12)))
                 AS DOUBLE), 12) AS v
        FROM (SELECT t.sc, t.src, t.p,
                CASE WHEN t.dst2 = 'CONV' THEN 1.0
                     WHEN t.dst2 = 'NULL' THEN 0.0
                     ELSE COALESCE(pv.v, 0.0) END AS val
              FROM tscen t LEFT JOIN v7 pv
                ON pv.sc = t.sc AND pv.src = t.dst2)
        GROUP BY sc, src),
      starts AS (SELECT sc, v FROM v8 WHERE src = 'START'),
      pb AS (SELECT v AS pbase FROM starts WHERE sc = 'none'),
      rem AS (
        SELECT sc, v,
               CASE WHEN pbase > 0.0
                 THEN ROUND(1.0 - v / pbase, 6) END AS re
        FROM starts CROSS JOIN pb WHERE sc <> 'none'),
      shr AS (SELECT sc, v, re, SUM(re) OVER () AS resum FROM rem)
      SELECT SUBSTR(sc, 4) AS channel,
             CAST(ROUND(v, 6) AS DOUBLE) AS p_conv_removed,
             CAST(re AS DOUBLE) AS removal_effect,
             CAST(CASE WHEN resum > 0.0 THEN ROUND(re / resum, 6) END
               AS DOUBLE) AS share
      FROM shr
      UNION ALL
      SELECT '__base__', CAST(ROUND(pbase, 6) AS DOUBLE), 0.0,
             CAST(NULL AS DOUBLE)
      FROM pb
      ORDER BY channel""",

    // Cascade-model replay: same rank/clamp, power-of-two relevances,
    // ln-survival windows, frozen contributions.
    "q_err" -> """
      WITH pts AS (
        SELECT event_type AS g, value AS s, event_id AS t,
               LEAST(GREATEST(
                 CAST(json_extract_string(props, '$.k') AS BIGINT) % 5,
                 0), 4) AS gr
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 5
              IS NOT NULL),
      rk AS (SELECT g, gr,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY s DESC, t ASC)
                 AS r
             FROM pts),
      top AS (SELECT g, gr, r, (POWER(2.0, gr) - 1.0) / 16.0 AS rr
              FROM rk WHERE r <= 20),
      w AS (
        SELECT g, r, rr,
               COALESCE(MAX(CASE WHEN rr = 1.0 THEN 1 ELSE 0 END) OVER
                 (PARTITION BY g ORDER BY r
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS hitone,
               COALESCE(SUM(CASE WHEN rr < 1.0 THEN LN(1.0 - rr)
                            ELSE 0.0 END) OVER
                 (PARTITION BY g ORDER BY r
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
                 AS lnprev
        FROM top),
      c AS (SELECT g, CASE WHEN hitone = 1 THEN 0.0
                      ELSE ROUND(rr / r * EXP(lnprev), 12) END AS c
            FROM w)
      SELECT g AS event_type, COUNT(*)::BIGINT AS n_ranked,
             CAST(ROUND(CAST(SUM(CAST(c AS DECIMAL(38,12))) AS DOUBLE), 6)
               AS DOUBLE) AS err
      FROM c GROUP BY g ORDER BY g""",

    // Path ids from the same prior-conversion count window; integer
    // ranks; frozen fractional credits in decimal channel sums.
    // The q_attribution_position path CTEs + per-touch e^(−Δ/τ)
    // weights (12-dp frozen), per-path decimal window normalizer,
    // channel-keyed decimal credit sum.
    "q_attribution_decay" -> s"""
      WITH base AS (
        SELECT user_id AS u, ts, event_id AS eid, event_type AS et,
               event_type = 'purchase' AS conv
        FROM events),
      wp AS (
        SELECT *, COUNT(CASE WHEN conv THEN 1 END) OVER
            (PARTITION BY u ORDER BY ts, eid
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS path
        FROM base),
      touches AS (
        SELECT u, path, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS tts, et
        FROM wp WHERE NOT conv),
      convs AS (
        SELECT u, path, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS cts
        FROM wp WHERE conv),
      weighted AS (
        SELECT t.u, t.path, t.et,
               CAST(ROUND(EXP(CAST(t.tts - c.cts AS DOUBLE)
                 / $decayTau), 12) AS DECIMAL(38,12)) AS w
        FROM touches t JOIN convs c USING (u, path)),
      normed AS (
        SELECT et,
               CAST(ROUND(CAST(w AS DOUBLE)
                 / CAST(SUM(w) OVER (PARTITION BY u, path) AS DOUBLE),
                 12) AS DECIMAL(38,12)) AS cr
        FROM weighted),
      credits AS (
        SELECT et AS channel, 1::BIGINT AS t, cr FROM normed
        UNION ALL
        SELECT 'direct', 1::BIGINT, CAST(1.0 AS DECIMAL(38,12))
        FROM convs c
        WHERE NOT EXISTS (SELECT 1 FROM touches t
                          WHERE t.u = c.u AND t.path = c.path))
      SELECT channel, SUM(t)::BIGINT AS touches,
             CAST(ROUND(CAST(SUM(cr) AS DOUBLE), 6) AS DOUBLE)
               AS decay_credit
      FROM credits GROUP BY channel
      ORDER BY channel""",

    "q_attribution_position" -> """
      WITH base AS (
        SELECT user_id AS u, ts, event_id AS eid, event_type AS et,
               event_type = 'purchase' AS conv
        FROM events),
      wp AS (
        SELECT *, COUNT(CASE WHEN conv THEN 1 END) OVER
            (PARTITION BY u ORDER BY ts, eid
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS path
        FROM base),
      touches AS (SELECT u, path, ts, eid, et FROM wp WHERE NOT conv),
      convp AS (SELECT DISTINCT u, path FROM wp WHERE conv),
      ranked AS (
        SELECT t.u, t.path, t.et,
               ROW_NUMBER() OVER (PARTITION BY t.u, t.path
                                  ORDER BY t.ts, t.eid) AS r,
               COUNT(*) OVER (PARTITION BY t.u, t.path) AS k
        FROM touches t JOIN convp USING (u, path)),
      credits AS (
        SELECT et AS channel, 1::BIGINT AS t,
               CAST(ROUND(1.0 / k, 6) AS DECIMAL(38,6)) AS lin,
               CAST(CASE WHEN k = 1 THEN 1.0
                         WHEN k = 2 THEN 0.5
                         WHEN r = 1 OR r = k THEN 0.4
                         ELSE ROUND(0.2 / (k - 2), 6) END
                 AS DECIMAL(38,6)) AS ucr
        FROM ranked
        UNION ALL
        SELECT 'direct', 1::BIGINT,
               CAST(1.0 AS DECIMAL(38,6)), CAST(1.0 AS DECIMAL(38,6))
        FROM convp c
        WHERE NOT EXISTS (SELECT 1 FROM touches t
                          WHERE t.u = c.u AND t.path = c.path))
      SELECT channel, SUM(t)::BIGINT AS touches,
             CAST(SUM(lin) AS DOUBLE) AS linear_credit,
             CAST(SUM(ucr) AS DOUBLE) AS u_credit
      FROM credits GROUP BY channel
      ORDER BY channel""",

    "q_attribution" -> """
      WITH scored AS (
        SELECT event_type,
               FIRST_VALUE(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS fc,
               LAST_VALUE(CASE WHEN event_type <> 'purchase'
                            THEN event_type END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS lc
        FROM events),
      conv AS (SELECT COALESCE(fc, 'direct') AS fch,
                      COALESCE(lc, 'direct') AS lch
               FROM scored WHERE event_type = 'purchase'),
      u AS (SELECT fch AS channel, 1::BIGINT AS f, 0::BIGINT AS l
            FROM conv
            UNION ALL
            SELECT lch, 0::BIGINT, 1::BIGINT FROM conv)
      SELECT channel, SUM(f)::BIGINT AS first_touch,
             SUM(l)::BIGINT AS last_touch
      FROM u GROUP BY channel
      ORDER BY channel""",

    // Same per-doc token dedup, df gates on the TRUE document
    // frequency, doc-id-ordered rank cap, and comma-joined sorted
    // serialization (STRING_AGG skips the over-cap NULLs exactly as
    // collect_list does).
    "q_posting_lists" -> """
      WITH toks AS (
        SELECT doc_id AS d,
               UNNEST(LIST_DISTINCT(LIST_FILTER(
                 STRING_SPLIT(LOWER(text), ' '), t -> t <> ''))) AS token
        FROM documents),
      dfc AS (SELECT token, COUNT(*)::BIGINT AS df FROM toks
              GROUP BY token HAVING COUNT(*) BETWEEN 5 AND 400),
      capped AS (
        SELECT t.token, t.d, dfc.df,
               ROW_NUMBER() OVER (PARTITION BY t.token ORDER BY t.d) AS rk
        FROM toks t JOIN dfc ON t.token = dfc.token)
      SELECT token, MAX(df)::BIGINT AS df,
             STRING_AGG(CASE WHEN rk <= 20 THEN CAST(d AS VARCHAR) END,
               ',' ORDER BY d) AS postings
      FROM capped GROUP BY token
      ORDER BY token""",

    // Two unrolled matrix-free power iterations: per-row dots fold in
    // index order (LIST_SUM over LIST_TRANSFORM = the aggregate/
    // zip_with fold), cross-row dimension sums rounded at 6 dp, the
    // renormalization running on identical rounded inputs (/, sqrt
    // are IEEE-exact).
    "q_pca_power" -> """
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings WHERE embedding IS NOT NULL),
      u0 AS (SELECT ROUND(1.0 / SQRT(MIN(LEN(v))), 6) AS u FROM v),
      d1 AS (SELECT vec_id, v,
               ROUND(LIST_SUM(LIST_TRANSFORM(v, x -> x * u)), 6) AS dot
             FROM v CROSS JOIN u0),
      ex1 AS (SELECT UNNEST(v) AS x, GENERATE_SUBSCRIPTS(v, 1) AS i, dot FROM d1),
      y1 AS (SELECT i, ROUND(SUM(x * dot), 6) AS y FROM ex1 GROUP BY i),
      n1 AS (SELECT SQRT(SUM(y * y)) AS nrm FROM y1),
      c1 AS (SELECT LIST(ROUND(y / nrm, 6) ORDER BY i) AS c
             FROM y1 CROSS JOIN n1),
      d2 AS (SELECT vec_id, v,
               ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(v) + 1),
                 i -> v[i] * c[i])), 6) AS dot
             FROM v CROSS JOIN c1),
      ex2 AS (SELECT UNNEST(v) AS x, GENERATE_SUBSCRIPTS(v, 1) AS i, dot FROM d2),
      y2 AS (SELECT i, ROUND(SUM(x * dot), 6) AS y FROM ex2 GROUP BY i),
      n2 AS (SELECT SQRT(SUM(y * y)) AS nrm FROM y2),
      c2 AS (SELECT LIST(ROUND(y / nrm, 6) ORDER BY i) AS c
             FROM y2 CROSS JOIN n2)
      SELECT vec_id,
             CAST(ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(v) + 1),
               i -> v[i] * c[i])), 6) AS DOUBLE) AS proj
      FROM v CROSS JOIN c2
      ORDER BY vec_id""",

    "q_rbo_eval" -> s"""
      WITH ag AS (SELECT event_type, user_id, ROUND(SUM(value), 6) AS m
                  FROM events GROUP BY event_type, user_id),
      ar AS (SELECT event_type, user_id,
               ROW_NUMBER() OVER (PARTITION BY event_type
                 ORDER BY m DESC NULLS LAST, user_id) AS ra
             FROM ag),
      bg AS (SELECT event_type, user_id, COUNT(*) AS m
             FROM events GROUP BY event_type, user_id),
      br AS (SELECT event_type, user_id,
               ROW_NUMBER() OVER (PARTITION BY event_type
                 ORDER BY m DESC NULLS LAST, user_id) AS rb
             FROM bg),
      m AS (SELECT a.event_type,
              ROUND(SUM($rboCase), 6) AS rbo,
              COUNT(*) AS n_common
            FROM ar a JOIN br b
              ON a.event_type = b.event_type AND a.user_id = b.user_id
            WHERE a.ra <= 10 AND b.rb <= 10
            GROUP BY a.event_type),
      q AS (SELECT DISTINCT event_type FROM events)
      SELECT q.event_type,
             CAST(COALESCE(m.rbo, 0.0) AS DOUBLE) AS rbo,
             COALESCE(m.n_common, 0)::BIGINT AS n_common
      FROM q LEFT JOIN m USING (event_type)
      ORDER BY event_type""",

    // weight = 1/2^k with integer k: exact dyadic on both engines, no
    // libm anywhere; ages clamp to [0, 52] half-lives.
    "q_decay_agg" -> """
      SELECT event_type, user_id,
             CAST(ROUND(SUM(value * (1.0 / POWER(2.0,
               LEAST(GREATEST(FLOOR(DATE_DIFF('day', CAST(ts AS DATE),
                 DATE '2024-02-01') / 7), 0), 52)))), 6) AS DOUBLE)
               AS decayed_sum,
             CAST(ROUND(SUM(value), 6) AS DOUBLE) AS raw_sum,
             COUNT(*) AS n_rows
      FROM events
      GROUP BY event_type, user_id
      ORDER BY event_type, user_id""",

    "q_dup_ngrams" -> """
      WITH t AS (SELECT doc_id, STRING_SPLIT(LOWER(text), ' ') AS toks
                 FROM documents),
      sh AS (SELECT doc_id, ARRAY_TO_STRING(toks[i:i+4], ' ') AS tok
             FROM t, UNNEST(RANGE(1, GREATEST(LEN(toks) - 3, 1))) r(i)),
      f AS (SELECT tok, COUNT(DISTINCT doc_id) AS ndocs FROM sh GROUP BY tok),
      per AS (SELECT s.doc_id, COUNT(*) AS n_spans,
                SUM(CASE WHEN f.ndocs >= 2 THEN 1 ELSE 0 END) AS n_dup
              FROM sh s JOIN f USING (tok) GROUP BY s.doc_id)
      SELECT d.doc_id,
             COALESCE(p.n_spans, 0)::BIGINT AS n_spans,
             COALESCE(p.n_dup, 0)::BIGINT AS n_dup_spans,
             CAST(ROUND(p.n_dup * 1.0 / p.n_spans, 6) AS DOUBLE) AS dup_frac
      FROM documents d LEFT JOIN per p USING (doc_id)
      ORDER BY d.doc_id""",

    "q_vocab_jaccard" -> """
      WITH gt AS (SELECT DISTINCT source AS g,
                    UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS tok
                  FROM documents),
      gv AS (SELECT g, tok FROM gt WHERE tok <> ''),
      sizes AS (SELECT g, COUNT(*) AS s FROM gv GROUP BY g),
      inter AS (SELECT a.g AS g1, b.g AS g2, COUNT(*) AS i
                FROM gv a JOIN gv b USING (tok)
                WHERE a.g < b.g GROUP BY a.g, b.g)
      SELECT s1.g AS g1, s2.g AS g2,
             COALESCE(i.i, 0)::BIGINT AS n_inter,
             (s1.s + s2.s - COALESCE(i.i, 0))::BIGINT AS n_union,
             CAST(ROUND(COALESCE(i.i, 0) * 1.0
               / (s1.s + s2.s - COALESCE(i.i, 0)), 6) AS DOUBLE) AS jaccard
      FROM sizes s1 JOIN sizes s2 ON s1.g < s2.g
      LEFT JOIN inter i ON i.g1 = s1.g AND i.g2 = s2.g
      ORDER BY g1, g2""",

    // Rank-sum AUC: tie-averaged rank = RANK + (ties-1)/2 (a dyadic
    // half-integer), so the sums are exact and the single division is
    // the only float, rounded at 6 dp on both engines.
    "q_auc_eval" -> """
      WITH l AS (SELECT event_type, value,
                   CASE WHEN TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)
                     % 2 = 0 THEN 1 ELSE 0 END AS lbl
                 FROM events WHERE value IS NOT NULL),
      r AS (SELECT event_type, lbl,
              RANK() OVER (PARTITION BY event_type ORDER BY value)
                + (COUNT(*) OVER (PARTITION BY event_type, value) - 1.0)
                  / 2.0 AS avgrank
            FROM l),
      a AS (SELECT event_type,
              SUM(CASE WHEN lbl = 1 THEN avgrank END) AS rsum,
              SUM(lbl) AS n_pos, SUM(1 - lbl) AS n_neg
            FROM r GROUP BY event_type)
      SELECT event_type,
             CAST(CASE WHEN n_pos > 0 AND n_neg > 0
               THEN ROUND((rsum - n_pos * (n_pos + 1) / 2.0)
                 / (n_pos * n_neg), 6) END AS DOUBLE) AS auc,
             n_pos::BIGINT AS n_pos, n_neg::BIGINT AS n_neg
      FROM a ORDER BY event_type""",

    // Kappa: contingency cells / marginals / chance mass are exact
    // integers; p_o, p_e, kappa are single divisions of those integers.
    "q_kappa" -> """
      WITH pred AS (
        SELECT source, lang AS pred FROM (
          SELECT source, lang, COUNT(*) AS c,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY COUNT(*) DESC, lang) AS rn
          FROM documents GROUP BY source, lang) WHERE rn = 1),
      j AS (SELECT d.lang AS ca, p.pred AS cb
            FROM documents d JOIN pred p USING (source)),
      cells AS (SELECT ca, cb, COUNT(*) AS n FROM j GROUP BY ca, cb),
      ma AS (SELECT ca, SUM(n) AS na FROM cells GROUP BY ca),
      mb AS (SELECT cb, SUM(n) AS nb FROM cells GROUP BY cb),
      ag AS (SELECT SUM(CASE WHEN ca = cb THEN n ELSE 0 END) AS n_agree,
                    SUM(n) AS n_total FROM cells),
      ch AS (SELECT COALESCE(SUM(ma.na * mb.nb), 0) AS chance_num
             FROM ma JOIN mb ON ma.ca = mb.cb)
      SELECT n_total::BIGINT AS n,
             CAST(ROUND(n_agree / n_total, 6) AS DOUBLE) AS p_o,
             CAST(ROUND(chance_num / (n_total * n_total), 6) AS DOUBLE) AS p_e,
             CAST(CASE WHEN chance_num < n_total * n_total
               THEN ROUND((n_agree * n_total - chance_num)
                 / (n_total * n_total - chance_num), 6) END AS DOUBLE) AS kappa
      FROM ag CROSS JOIN ch""",

    // Reliability bins: conf quantized at 6 dp BEFORE floor(conf*10),
    // so bin membership can't straddle an engine ulp; per-bin stats
    // are rationals of the quanta.
    "q_calibration" -> """
      WITH mm AS (SELECT CAST(MIN(value) AS DOUBLE) AS lo,
                         CAST(MAX(value) AS DOUBLE) AS hi FROM events),
      c AS (SELECT ROUND((value - lo) / (hi - lo), 6) AS conf,
              CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS lbl
            FROM events CROSS JOIN mm),
      b AS (SELECT LEAST(CAST(FLOOR(conf * 10) AS INT), 9) AS bin, conf, lbl
            FROM c)
      SELECT bin, COUNT(*) AS n,
             CAST(ROUND(SUM(lbl) / COUNT(*), 6) AS DOUBLE) AS accuracy,
             CAST(ROUND(SUM(conf) / COUNT(*), 6) AS DOUBLE) AS mean_conf
      FROM b GROUP BY bin ORDER BY bin""",

    // PSI: bin edges freeze on the reference min/max; the bin
    // expression FLOOR((v-lo)*10/(hi-lo)) is the identical IEEE
    // arithmetic on both engines; add-one-smoothed ratios stay exact
    // integers until the bins-sized log fold.
    "q_psi" -> """
      WITH ref AS (SELECT event_type, value FROM events
                   WHERE CAST(ts AS DATE) < DATE '2024-01-16'),
      cur AS (SELECT event_type, value FROM events
              WHERE NOT (CAST(ts AS DATE) < DATE '2024-01-16')),
      mm AS (SELECT CAST(MIN(value) AS DOUBLE) AS lo,
                    CAST(MAX(value) AS DOUBLE) AS hi FROM ref),
      rb AS (SELECT event_type,
               CASE WHEN hi = lo THEN 0
                 ELSE LEAST(GREATEST(CAST(FLOOR((value - lo) * 10
                   / (hi - lo)) AS INT), 0), 9) END AS bin,
               COUNT(*) AS cr
             FROM ref CROSS JOIN mm GROUP BY 1, 2),
      cb AS (SELECT event_type,
               CASE WHEN hi = lo THEN 0
                 ELSE LEAST(GREATEST(CAST(FLOOR((value - lo) * 10
                   / (hi - lo)) AS INT), 0), 9) END AS bin,
               COUNT(*) AS cc
             FROM cur CROSS JOIN mm GROUP BY 1, 2),
      -- group universe = ref UNION cur, matching the operator (a type
      -- living only in rows BOTH filters exclude must not appear)
      g AS (SELECT DISTINCT event_type FROM ref
            UNION SELECT DISTINCT event_type FROM cur),
      grid AS (SELECT event_type, r.bin FROM g
               CROSS JOIN (SELECT UNNEST(RANGE(0, 10)) AS bin) r),
      per AS (SELECT grid.event_type, grid.bin,
                COALESCE(rb.cr, 0) AS cr, COALESCE(cb.cc, 0) AS cc
              FROM grid
              LEFT JOIN rb ON rb.event_type = grid.event_type
                AND rb.bin = grid.bin
              LEFT JOIN cb ON cb.event_type = grid.event_type
                AND cb.bin = grid.bin),
      tot AS (SELECT event_type, bin, cr, cc,
                SUM(cr) OVER (PARTITION BY event_type) AS nr,
                SUM(cc) OVER (PARTITION BY event_type) AS nc
              FROM per)
      SELECT event_type,
             CAST(ROUND(SUM(((cr + 1) / (nr + 10) - (cc + 1) / (nc + 10))
               * LN(((cr + 1) / (nr + 10)) / ((cc + 1) / (nc + 10)))), 6)
               AS DOUBLE) AS psi,
             MAX(nr)::BIGINT AS n_ref, MAX(nc)::BIGINT AS n_cur
      FROM tot GROUP BY event_type ORDER BY event_type""",

    // Both comparators verified same-kernel against DuckDB's
    // implementations (match window, transposition halving, 0.7
    // boost threshold, prefix cap 4) — the pair set is a fixed
    // equi-join so only VALUES are diffed, at 6 dp.
    "q_fuzzy_jw" -> """
      WITH b AS (SELECT p_partkey AS id, p_name AS s
                 FROM part WHERE p_partkey <= 400),
      v AS (SELECT id, SUBSTR(s, 1, 3) || 'zz' || SUBSTR(s, 6) AS vs FROM b)
      SELECT b.id AS i, b.id + 10000 AS j,
             CAST(ROUND(JARO_SIMILARITY(b.s, v.vs), 6) AS DOUBLE) AS jaro,
             CAST(ROUND(JARO_WINKLER_SIMILARITY(b.s, v.vs), 6) AS DOUBLE) AS jw
      FROM b JOIN v USING (id) ORDER BY i""",

    // Two exact rankings (cosine vs dot) on bit-identical index-order
    // folds, intersected at depth 5: the top-k SETS are exact on both
    // engines, so only the rational recall is rounded.
    "q_recall_metric" -> """
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      p AS (SELECT vec_id AS probe_id, v AS pv FROM v WHERE vec_id < 20),
      c AS (SELECT vec_id AS corpus_id, v AS cv FROM v),
      pairs AS (SELECT probe_id, corpus_id,
                  LIST_COSINE_SIMILARITY(pv, cv) AS cos,
                  LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(pv) + 1),
                    i -> pv[i] * cv[i])) AS dot
                FROM p JOIN c ON probe_id <> corpus_id),
      ex AS (SELECT probe_id, corpus_id, ROW_NUMBER() OVER (
               PARTITION BY probe_id ORDER BY cos DESC, corpus_id) AS r
             FROM pairs),
      ap AS (SELECT probe_id, corpus_id, ROW_NUMBER() OVER (
               PARTITION BY probe_id ORDER BY dot DESC, corpus_id) AS r
             FROM pairs),
      h AS (SELECT e.probe_id, COUNT(*) AS n_hit
            FROM ex e JOIN ap a ON e.probe_id = a.probe_id
              AND e.corpus_id = a.corpus_id
            WHERE e.r <= 5 AND a.r <= 5 GROUP BY e.probe_id)
      SELECT q.probe_id, COALESCE(h.n_hit, 0)::BIGINT AS n_hit,
             CAST(ROUND(COALESCE(h.n_hit, 0) / 5.0, 6) AS DOUBLE) AS recall
      FROM (SELECT DISTINCT probe_id FROM p) q
      LEFT JOIN h USING (probe_id)
      ORDER BY probe_id""",

    // Gini from the sorted-rank identity: Σ i·x and Σ x are exact
    // integers (HUGEINT here, decimal(38,0) in Spark), G =
    // (2·s1 − (n+1)·sx)/(n·sx) in one rounded division; rank
    // assignment among ties cannot change s1.
    "q_gini" -> """
      WITH r AS (SELECT lang, n_chars,
                   ROW_NUMBER() OVER (PARTITION BY lang
                     ORDER BY n_chars, doc_id) AS rn
                 FROM documents),
      a AS (SELECT lang, SUM(rn * n_chars) AS s1, SUM(n_chars) AS sx,
                   COUNT(*) AS n
            FROM r GROUP BY lang)
      SELECT lang,
             CAST(CASE WHEN sx > 0 THEN ROUND(
               CAST(2 * s1 - (n + 1) * sx AS DOUBLE)
                 / CAST(n * sx AS DOUBLE), 6) END AS DOUBLE) AS gini,
             n::BIGINT AS n
      FROM a ORDER BY lang""",

    // χ² without the empty-cell grid: Σ_observed (O−E)²/E +
    // (N − Σ_observed E) — the trailing term is the zero-O cells'
    // expected mass; V reuses the UNROUNDED χ².
    "q_chi_square" -> """
      WITH cells AS (SELECT lang AS a, source AS b, COUNT(*) AS o
                     FROM documents GROUP BY 1, 2),
      ma AS (SELECT a, SUM(o) AS na FROM cells GROUP BY a),
      mb AS (SELECT b, SUM(o) AS nb FROM cells GROUP BY b),
      nn AS (SELECT CAST(SUM(o) AS DOUBLE) AS n FROM cells),
      rc AS (SELECT (SELECT COUNT(*) FROM ma) AS r,
                    (SELECT COUNT(*) FROM mb) AS c),
      -- null-safe marginal attach: the Spark operator keeps NULL
      -- categories as real levels (joins with <=>), and rc counts them
      -- too — a plain USING join would drop their cells while dof
      -- still counted the level
      x AS (SELECT SUM((o - na * nb / n) * (o - na * nb / n)
                     / (na * nb / n)) + MAX(n) - SUM(na * nb / n) AS chi2,
                   MAX(n) AS nd, MAX((r - 1) * (c - 1)) AS dof,
                   CAST(MAX(LEAST(r, c) - 1) AS DOUBLE) AS minrc
            FROM cells
            JOIN ma ON cells.a IS NOT DISTINCT FROM ma.a
            JOIN mb ON cells.b IS NOT DISTINCT FROM mb.b
            CROSS JOIN nn CROSS JOIN rc)
      SELECT CAST(ROUND(chi2, 6) AS DOUBLE) AS chi2,
             dof::BIGINT AS dof,
             CAST(CASE WHEN minrc > 0 THEN
               ROUND(SQRT(chi2 / (CAST(nd AS BIGINT) * minrc)), 6)
             END AS DOUBLE) AS cramers_v,
             CAST(nd AS BIGINT) AS n
      FROM x""",

    // Poisson bootstrap: the identical md5 draw, threshold CASE, and
    // order-statistic picks; integer replica sums, one division each.
    "q_bootstrap_ci" -> s"""
      WITH d AS (SELECT lang, doc_id, n_chars FROM documents),
      f AS (SELECT lang, doc_id, n_chars, r.b,
              ('0x' || SUBSTR(MD5('boot:' || b || ':' || doc_id), 1, 15))::BIGINT
                / 1152921504606846976.0 AS u
            FROM d CROSS JOIN (SELECT UNNEST(RANGE(0, 40)) AS b) r),
      k AS (SELECT lang, b, n_chars,
              CASE WHEN u < ${pc(0)} THEN 0 WHEN u < ${pc(1)} THEN 1
                   WHEN u < ${pc(2)} THEN 2 WHEN u < ${pc(3)} THEN 3
                   WHEN u < ${pc(4)} THEN 4 WHEN u < ${pc(5)} THEN 5
                   ELSE 6 END AS k
            FROM f),
      rep AS (SELECT lang, b, SUM(k * n_chars) AS s, SUM(k) AS m
              FROM k GROUP BY lang, b),
      rm AS (SELECT lang, b,
               CASE WHEN m > 0 THEN ROUND(s / m, 6) END AS mu FROM rep),
      rk AS (SELECT lang, b, mu, ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY mu ASC NULLS LAST, b) AS r FROM rm),
      ci AS (SELECT lang, MAX(CASE WHEN r = 3 THEN mu END) AS ci_lo,
                    MAX(CASE WHEN r = 38 THEN mu END) AS ci_hi
             FROM rk GROUP BY lang),
      base AS (SELECT lang, ROUND(SUM(n_chars) / COUNT(*), 6) AS mean,
                      COUNT(*) AS n
               FROM d GROUP BY lang)
      SELECT base.lang, CAST(mean AS DOUBLE) AS mean,
             CAST(ci_lo AS DOUBLE) AS ci_lo, CAST(ci_hi AS DOUBLE) AS ci_hi,
             n::BIGINT AS n
      FROM base JOIN ci USING (lang) ORDER BY lang""",

    // Same (block, sort-position) pairing: positions from the
    // identical (string, id) total order, distances integer.
    "q_sorted_neighborhood" -> """
      WITH u AS (
        SELECT p_partkey AS id, p_name AS s FROM part WHERE p_partkey <= 500
        UNION ALL
        SELECT p_partkey + 10000, p_name || ' x'
        FROM part WHERE p_partkey <= 500),
      r AS (SELECT id, s, SUBSTR(s, 1, 1) AS blk,
              ROW_NUMBER() OVER (PARTITION BY SUBSTR(s, 1, 1)
                ORDER BY s, id) AS pos
            FROM u)
      SELECT LEAST(a.id, b.id) AS i, GREATEST(a.id, b.id) AS j,
             CAST(LEVENSHTEIN(a.s, b.s) AS BIGINT) AS dist
      FROM r a JOIN r b
        ON a.blk = b.blk AND b.pos - a.pos BETWEEN 1 AND 3
      WHERE LEVENSHTEIN(a.s, b.s) <= 2
      ORDER BY i, j""",

    // Exact distinct-user counts; support/confidence/lift are single
    // divisions of those integers.
    // The q_basket_lift distinct/pairs/singles CTEs with the
    // similarity ratios: cos n/√(ca·cb), jaccard, dice.
    // (user, day) dedup, the same ×28 window-end fan, exact distinct
    // per window end, one rounded ratio.
    "q_stickiness" -> """
      WITH cells AS (
        SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      dau AS (
        SELECT d AS day, COUNT(DISTINCT u)::BIGINT AS dau
        FROM cells GROUP BY d),
      fan AS (
        SELECT DISTINCT u, d + CAST(i.i AS INTEGER) AS day
        FROM cells CROSS JOIN (SELECT UNNEST(RANGE(0, 28)) AS i) i),
      mau AS (SELECT day, COUNT(*)::BIGINT AS mau FROM fan GROUP BY day)
      SELECT dau.day AS day, dau, mau,
             CAST(ROUND(dau / CAST(mau AS DOUBLE), 6) AS DOUBLE)
               AS stickiness
      FROM dau JOIN mau ON dau.day = mau.day
      ORDER BY day""",

    // The q_item_cosine pair math on customer-part baskets, symmetric
    // 10-NN cap under (cosine DESC, neighbor), owned anti-join, 6-dp
    // decimal score sums, top-3 window.
    "q_item_knn" -> """
      WITH hist AS (
        SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS i
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_orderkey % 3 = 0 AND l.l_partkey % 50 = 0),
      pairs AS (
        SELECT x.i AS item_a, y.i AS item_b, COUNT(*)::BIGINT AS n_both
        FROM hist x JOIN hist y ON x.u = y.u AND x.i < y.i
        GROUP BY x.i, y.i),
      singles AS (SELECT i, COUNT(*)::BIGINT AS c FROM hist GROUP BY i),
      sim AS (
        SELECT item_a, item_b,
               ROUND(n_both / SQRT(CAST(ca.c * cb.c AS DOUBLE)), 6)
                 AS cosine
        FROM pairs
        JOIN singles ca ON ca.i = pairs.item_a
        JOIN singles cb ON cb.i = pairs.item_b),
      nbrs AS (
        SELECT item_a AS f, item_b AS t, cosine FROM sim
        UNION ALL SELECT item_b, item_a, cosine FROM sim),
      capped AS (
        SELECT f, t, cosine FROM (
          SELECT f, t, cosine,
                 ROW_NUMBER() OVER (PARTITION BY f
                   ORDER BY cosine DESC, t) AS rn
          FROM nbrs)
        WHERE rn <= 10),
      cand AS (
        SELECT h.u, c.t AS item,
               SUM(CAST(c.cosine AS DECIMAL(38,6))) AS s
        FROM hist h JOIN capped c ON c.f = h.i
        WHERE NOT EXISTS (SELECT 1 FROM hist o
                          WHERE o.u = h.u AND o.i = c.t)
        GROUP BY h.u, c.t),
      ranked AS (
        SELECT u, item, CAST(s AS DOUBLE) AS score,
               ROW_NUMBER() OVER (PARTITION BY u
                 ORDER BY CAST(s AS DOUBLE) DESC, item) AS rank
        FROM cand)
      SELECT u AS cust, item AS part, score, CAST(rank AS INT) AS rank
      FROM ranked WHERE rank <= 3
      ORDER BY cust, rank""",


    // The q_item_knn pipeline CTEs verbatim, then the panel: exact
    // ownership counts, 12-dp -ln popularity terms, pair diversity
    // with never-co-bought defaulting to 1.
    "q_rec_eval" -> """
      WITH hist AS (
        SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS i
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_orderkey % 3 = 0 AND l.l_partkey % 50 = 0),
      pairs AS (
        SELECT x.i AS item_a, y.i AS item_b, COUNT(*)::BIGINT AS n_both
        FROM hist x JOIN hist y ON x.u = y.u AND x.i < y.i
        GROUP BY x.i, y.i),
      singles AS (SELECT i, COUNT(*)::BIGINT AS c FROM hist GROUP BY i),
      sim AS (
        SELECT item_a, item_b,
               ROUND(n_both / SQRT(CAST(ca.c * cb.c AS DOUBLE)), 6)
                 AS cosine
        FROM pairs
        JOIN singles ca ON ca.i = pairs.item_a
        JOIN singles cb ON cb.i = pairs.item_b),
      nbrs AS (
        SELECT item_a AS f, item_b AS t, cosine FROM sim
        UNION ALL SELECT item_b, item_a, cosine FROM sim),
      capped AS (
        SELECT f, t, cosine FROM (
          SELECT f, t, cosine,
                 ROW_NUMBER() OVER (PARTITION BY f
                   ORDER BY cosine DESC, t) AS rn
          FROM nbrs)
        WHERE rn <= 10),
      cand AS (
        SELECT h.u, c.t AS item,
               SUM(CAST(c.cosine AS DECIMAL(38,6))) AS s
        FROM hist h JOIN capped c ON c.f = h.i
        WHERE NOT EXISTS (SELECT 1 FROM hist o
                          WHERE o.u = h.u AND o.i = c.t)
        GROUP BY h.u, c.t),
      recs AS (
        SELECT u, item AS i FROM (
          SELECT u, item,
                 ROW_NUMBER() OVER (PARTITION BY u
                   ORDER BY CAST(s AS DOUBLE) DESC, item) AS rank
          FROM cand)
        WHERE rank <= 3),
      stats AS (SELECT COUNT(DISTINCT u)::BIGINT AS hu,
                       COUNT(DISTINCT i)::BIGINT AS cat FROM hist),
      pop AS (SELECT i, COUNT(*)::BIGINT AS own FROM hist GROUP BY i),
      nov AS (
        SELECT COUNT(*)::BIGINT AS nr,
               SUM(CASE WHEN pop.own IS NOT NULL THEN
                 CAST(ROUND(-LN(CAST(pop.own AS DOUBLE)
                   / CAST(stats.hu AS DOUBLE)), 12)
                   AS DECIMAL(38,12)) END) AS snov,
               SUM(CASE WHEN pop.own IS NOT NULL THEN 1 ELSE 0 END)
                 ::BIGINT AS nnov
        FROM recs LEFT JOIN pop ON pop.i = recs.i CROSS JOIN stats),
      rstats AS (SELECT COUNT(DISTINCT u)::BIGINT AS ru,
                        COUNT(DISTINCT i)::BIGINT AS ri FROM recs),
      div AS (
        SELECT COUNT(*)::BIGINT AS np,
               SUM(CAST(ROUND(1.0 - COALESCE(s.cosine, 0.0), 12)
                 AS DECIMAL(38,12))) AS sdiv
        FROM recs a JOIN recs b ON a.u = b.u AND a.i < b.i
        LEFT JOIN sim s ON s.item_a = a.i AND s.item_b = b.i)
      SELECT ru AS n_users, nr AS n_recs, cat AS catalog_size,
             CAST(CASE WHEN cat > 0 THEN
               ROUND(CAST(ri AS DOUBLE) / CAST(cat AS DOUBLE), 6)
             END AS DOUBLE) AS coverage,
             CAST(CASE WHEN nnov > 0 THEN
               ROUND(CAST(snov AS DOUBLE) / CAST(nnov AS DOUBLE), 6)
             END AS DOUBLE) AS novelty,
             CAST(CASE WHEN np > 0 THEN
               ROUND(CAST(sdiv AS DOUBLE) / CAST(np AS DOUBLE), 6)
             END AS DOUBLE) AS intra_list_diversity
      FROM nov CROSS JOIN rstats CROSS JOIN div CROSS JOIN stats""",

    // Empirical logging propensities, hour-gated target policy, 12-dp
    // frozen rw/w/w² decimal sums, one rounded division per estimate.
    "q_ips_eval" -> """
      WITH ev AS (
        SELECT event_type AS action, value / 100.0 AS reward,
               HOUR(ts) AS hod
        FROM events),
      pc AS (SELECT action, COUNT(*)::BIGINT AS c FROM ev GROUP BY action),
      nt AS (SELECT COUNT(*)::BIGINT AS n FROM ev),
      props AS (
        SELECT action,
               ROUND(CAST(c AS DOUBLE) / CAST(n AS DOUBLE), 12) AS prop
        FROM pc, nt),
      logged AS (
        SELECT ev.action, reward, prop,
               CASE WHEN hod >= 12 THEN 'purchase' ELSE 'view' END
                 AS target
        FROM ev JOIN props ON props.action = ev.action),
      wt AS (
        SELECT reward,
               CASE WHEN action = target AND prop > 0.0 THEN 1.0 / prop
                    ELSE 0.0 END AS w,
               CASE WHEN action = target THEN 1 ELSE 0 END AS m
        FROM logged),
      agg AS (
        SELECT COUNT(*)::BIGINT AS n, SUM(m)::BIGINT AS n_matched,
               SUM(CAST(ROUND(reward * w, 12) AS DECIMAL(38,12))) AS srw,
               SUM(CAST(ROUND(w, 12) AS DECIMAL(38,12))) AS sw,
               SUM(CAST(ROUND(w * w, 12) AS DECIMAL(38,12))) AS sww
        FROM wt)
      SELECT n, n_matched,
             CAST(ROUND(CAST(srw AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS DOUBLE) AS ips,
             CAST(CASE WHEN CAST(sw AS DOUBLE) > 0.0 THEN
               ROUND(CAST(srw AS DOUBLE) / CAST(sw AS DOUBLE), 6) END
               AS DOUBLE) AS snips,
             CAST(CASE WHEN CAST(sww AS DOUBLE) > 0.0 THEN
               ROUND(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                 / CAST(sww AS DOUBLE), 6) END AS DOUBLE) AS ess
      FROM agg""",

    // Same pair-contest games, directed pair stats from both
    // orientations, two unrolled MM passes (12-dp decimal pair terms,
    // sup-normalized state).
    "q_bradley_terry" -> """
      WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk,
                         l_extendedprice AS pr
                  FROM lineitem WHERE l_orderkey % 19 = 0),
      gm AS (SELECT CASE WHEN x.pr > y.pr THEN x.pk
                         WHEN x.pr < y.pr THEN y.pk END AS w,
                    CASE WHEN x.pr > y.pr THEN y.pk
                         WHEN x.pr < y.pr THEN x.pk END AS l
             FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
      g AS (SELECT CAST(w AS VARCHAR) AS w, CAST(l AS VARCHAR) AS l
            FROM gm WHERE w IS NOT NULL
              AND CAST(w AS VARCHAR) <> CAST(l AS VARCHAR)),
      dir AS (SELECT w AS i, l AS j, 1 AS win FROM g
              UNION ALL SELECT l, w, 0 FROM g),
      stats AS (SELECT i, j, COUNT(*)::BIGINT AS n,
                       SUM(win)::BIGINT AS wi
                FROM dir GROUP BY i, j),
      tot AS (SELECT i, SUM(n)::BIGINT AS n_games,
                     SUM(wi)::BIGINT AS n_wins
              FROM stats GROUP BY i),
      d1 AS (SELECT i,
                    SUM(CAST(ROUND(CAST(n AS DOUBLE) / (1.0 + 1.0), 12)
                      AS DECIMAL(38,12))) AS d,
                    SUM(wi) AS ww
             FROM stats GROUP BY i),
      r1 AS (SELECT i, CASE WHEN CAST(d AS DOUBLE) > 0.0 THEN
                 CAST(ww AS DOUBLE) / CAST(d AS DOUBLE)
               ELSE 0.0 END AS r
             FROM d1),
      m1 AS (SELECT MAX(r) AS mx FROM r1),
      v1 AS (SELECT i, CASE WHEN mx > 0.0 THEN ROUND(r / mx, 12)
                            ELSE 0.0 END AS s
             FROM r1, m1),
      d2 AS (SELECT st.i AS i,
                    SUM(CAST(ROUND(CAST(n AS DOUBLE) / (a.s + b.s), 12)
                      AS DECIMAL(38,12))) AS d,
                    SUM(wi) AS ww
             FROM stats st JOIN v1 a ON a.i = st.i
                           JOIN v1 b ON b.i = st.j
             GROUP BY st.i),
      r2 AS (SELECT i, CASE WHEN CAST(d AS DOUBLE) > 0.0 THEN
                 CAST(ww AS DOUBLE) / CAST(d AS DOUBLE)
               ELSE 0.0 END AS r
             FROM d2),
      m2 AS (SELECT MAX(r) AS mx FROM r2),
      v2 AS (SELECT i, CASE WHEN mx > 0.0 THEN ROUND(r / mx, 12)
                            ELSE 0.0 END AS s
             FROM r2, m2)
      SELECT tot.i AS item, n_games, n_wins,
             CAST(ROUND(v2.s, 6) AS DOUBLE) AS score
      FROM tot JOIN v2 ON v2.i = tot.i
      ORDER BY item""",

    "q_item_cosine" -> """
      WITH d AS (SELECT DISTINCT user_id, event_type FROM events
                 WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
      pairs AS (SELECT x.event_type AS item_a, y.event_type AS item_b,
                       COUNT(*)::BIGINT AS n_both
                FROM d x JOIN d y ON x.user_id = y.user_id
                  AND x.event_type < y.event_type
                GROUP BY 1, 2),
      s AS (SELECT event_type, COUNT(*)::BIGINT AS c FROM d
            GROUP BY event_type)
      SELECT item_a, item_b, n_both,
             CAST(ROUND(n_both / SQRT(CAST(sa.c * sb.c AS DOUBLE)), 6)
               AS DOUBLE) AS cosine,
             CAST(ROUND(n_both / CAST(sa.c + sb.c - n_both AS DOUBLE), 6)
               AS DOUBLE) AS jaccard,
             CAST(ROUND((n_both * 2.0) / CAST(sa.c + sb.c AS DOUBLE), 6)
               AS DOUBLE) AS dice
      FROM pairs
      JOIN s sa ON sa.event_type = item_a
      JOIN s sb ON sb.event_type = item_b
      ORDER BY item_a, item_b""",

    "q_basket_lift" -> """
      WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
      pairs AS (SELECT x.event_type AS ta, y.event_type AS tb,
                       COUNT(*) AS n_both
                FROM d x JOIN d y ON x.user_id = y.user_id
                  AND x.event_type < y.event_type
                GROUP BY 1, 2),
      s AS (SELECT event_type, COUNT(*) AS c FROM d GROUP BY event_type),
      nu AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM d)
      SELECT ta, tb, n_both,
             CAST(ROUND(n_both / n_users, 6) AS DOUBLE) AS support,
             CAST(ROUND(n_both / sa.c, 6) AS DOUBLE) AS confidence,
             CAST(ROUND((n_both * n_users) / (sa.c * sb.c), 6) AS DOUBLE)
               AS lift
      FROM pairs
      JOIN s sa ON sa.event_type = ta
      JOIN s sb ON sb.event_type = tb
      CROSS JOIN nu
      ORDER BY ta, tb""",

    // RRF: same two rankings, same 1/(60+r) sums (<= 2 IEEE-commutative
    // terms), same (score DESC, item) fused order.
    "q_rrf_fuse" -> """
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      p AS (SELECT vec_id AS probe_id, v AS pv FROM v WHERE vec_id < 20),
      c AS (SELECT vec_id AS corpus_id, v AS cv FROM v),
      pairs AS (SELECT probe_id, corpus_id,
                  LIST_COSINE_SIMILARITY(pv, cv) AS cos,
                  LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(pv) + 1),
                    i -> pv[i] * cv[i])) AS dot
                FROM p JOIN c ON probe_id <> corpus_id),
      ex AS (SELECT probe_id, corpus_id, ROW_NUMBER() OVER (
               PARTITION BY probe_id ORDER BY cos DESC, corpus_id) AS r
             FROM pairs),
      ap AS (SELECT probe_id, corpus_id, ROW_NUMBER() OVER (
               PARTITION BY probe_id ORDER BY dot DESC, corpus_id) AS r
             FROM pairs),
      u AS (SELECT probe_id, corpus_id, r FROM ex WHERE r <= 10
            UNION ALL
            SELECT probe_id, corpus_id, r FROM ap WHERE r <= 10),
      sc AS (SELECT probe_id, corpus_id, SUM(1.0 / (60 + r)) AS s,
                    COUNT(*) AS n_lists
             FROM u GROUP BY 1, 2),
      rk AS (SELECT probe_id, corpus_id, s, n_lists, ROW_NUMBER() OVER (
               PARTITION BY probe_id ORDER BY s DESC, corpus_id) AS rnk
             FROM sc)
      SELECT probe_id, corpus_id AS item,
             CAST(ROUND(s, 6) AS DOUBLE) AS rrf,
             rnk::BIGINT AS rank, n_lists::BIGINT AS n_lists
      FROM rk WHERE rnk <= 5
      ORDER BY probe_id, rank""",

    // nDCG@5 with the pinned rel = 6 - exactRank gains; IDCG is the
    // interpolated Scala constant, so only DCG is per-engine float.
    "q_ndcg" -> s"""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      p AS (SELECT vec_id AS probe_id, v AS pv FROM v WHERE vec_id < 20),
      c AS (SELECT vec_id AS corpus_id, v AS cv FROM v),
      pairs AS (SELECT probe_id, corpus_id,
                  LIST_COSINE_SIMILARITY(pv, cv) AS cos,
                  LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(pv) + 1),
                    i -> pv[i] * cv[i])) AS dot
                FROM p JOIN c ON probe_id <> corpus_id),
      ex AS (SELECT probe_id, corpus_id, ROW_NUMBER() OVER (
               PARTITION BY probe_id ORDER BY cos DESC, corpus_id) AS r
             FROM pairs),
      ap AS (SELECT probe_id, corpus_id, ROW_NUMBER() OVER (
               PARTITION BY probe_id ORDER BY dot DESC, corpus_id) AS r
             FROM pairs),
      dcg AS (SELECT a.probe_id,
                SUM((POWER(2.0, 6 - e.r) - 1.0) / LOG2(a.r + 1)) AS d
              FROM ap a JOIN ex e ON a.probe_id = e.probe_id
                AND a.corpus_id = e.corpus_id
              WHERE a.r <= 5 AND e.r <= 5
              GROUP BY a.probe_id)
      SELECT q.probe_id,
             CAST(ROUND(COALESCE(dcg.d, 0.0) / ${RankEval.idcgAtK(5)}, 6)
               AS DOUBLE) AS ndcg
      FROM (SELECT DISTINCT probe_id FROM p) q
      LEFT JOIN dcg USING (probe_id)
      ORDER BY probe_id""",

    // Quantile normalization: in-group ranks, pooled global ranks,
    // target = ceil(r*N/n) in exact integer arithmetic, value lookup
    // by index join.
    "q_quantile_norm" -> """
      WITH r AS (SELECT doc_id, lang, n_chars,
                   ROW_NUMBER() OVER (PARTITION BY lang
                     ORDER BY n_chars, doc_id) AS qr,
                   COUNT(*) OVER (PARTITION BY lang) AS qn
                 FROM documents),
      g AS (SELECT n_chars AS pooled,
              ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rid
            FROM documents),
      nn AS (SELECT COUNT(*) AS qtot FROM documents)
      SELECT r.doc_id, r.lang, r.n_chars, g.pooled AS qnorm
      FROM r CROSS JOIN nn
      JOIN g ON g.rid = (r.qr * nn.qtot + r.qn - 1) // r.qn
      ORDER BY r.doc_id""",

    // All-integer governance audit: group sizes + distinct sensitive
    // values + the two threshold booleans.
    // The k-anonymity cell fold + an explicit domain grid with
    // cumulative cross-multiplied gaps; HUGEINT numerators, one
    // division per quasi-group.
    "q_t_closeness" -> """
      WITH cells AS (
        SELECT lang, source, CAST(FLOOR(n_chars / 100.0) AS BIGINT) AS s,
               COUNT(*)::BIGINT AS c
        FROM documents
        WHERE CAST(FLOOR(n_chars / 100.0) AS BIGINT) IS NOT NULL
        GROUP BY 1, 2, 3),
      dom AS (SELECT DISTINCT s FROM cells),
      gcum AS (SELECT s AS sg,
                      SUM(cg) OVER (ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS cumg
               FROM (SELECT s, SUM(c)::BIGINT AS cg FROM cells
                     GROUP BY s)),
      na AS (SELECT SUM(c)::BIGINT AS nn, COUNT(DISTINCT s)::BIGINT AS m
             FROM cells),
      grp AS (SELECT lang, source, SUM(c)::BIGINT AS ng
              FROM cells GROUP BY 1, 2),
      grid AS (SELECT g.lang, g.source, g.ng, d.s,
                      COALESCE(cells.c, 0)::BIGINT AS cc
               FROM grp g CROSS JOIN dom d
               LEFT JOIN cells ON cells.lang = g.lang
                 AND cells.source = g.source AND cells.s = d.s),
      cum AS (SELECT lang, source, ng, s,
                     SUM(cc) OVER (PARTITION BY lang, source ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
              FROM grid),
      gap AS (SELECT lang, source, ng, m, nn,
                     ABS(cum::HUGEINT * nn - ng::HUGEINT * cumg) AS gap
              FROM cum JOIN gcum ON gcum.sg = cum.s CROSS JOIN na)
      SELECT lang, source, ng AS n_rows,
             CAST(CASE WHEN m >= 2 THEN
               ROUND(CAST(SUM(gap) AS DOUBLE)
                 / ((CAST(m AS DOUBLE) - 1.0) * CAST(ng AS DOUBLE)
                   * CAST(nn AS DOUBLE)), 6) END AS DOUBLE)
               AS t_closeness,
             CASE WHEN m >= 2 THEN
               (ROUND(CAST(SUM(gap) AS DOUBLE)
                 / ((CAST(m AS DOUBLE) - 1.0) * CAST(ng AS DOUBLE)
                   * CAST(nn AS DOUBLE)), 6) <= 0.2) END AS t_close
      FROM gap GROUP BY lang, source, ng, m, nn
      ORDER BY lang, source""",

    "q_k_anonymity" -> """
      SELECT lang, source, COUNT(*) AS n_rows,
             COUNT(DISTINCT n_chars) AS n_sensitive,
             COUNT(*) >= 5 AS k_anonymous,
             COUNT(DISTINCT n_chars) >= 3 AS l_diverse
      FROM documents
      GROUP BY lang, source
      ORDER BY lang, source""",
  )
}
