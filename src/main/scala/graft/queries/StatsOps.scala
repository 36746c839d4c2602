package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Graph, Outliers, Profiling, Resample, Stats, TextAnalysis}
import QueryDefs._

/** Judged queries for the distribution-statistics layer (operators
  * in [[graft.operators.Stats]]): KS shift detection, two-proportion
  * z-tests, Theil's U, CUSUM changepoints, and seasonality indices.
  * Oracles replay the identical arithmetic in DuckDB under the
  * SURVEY.md §5.4 determinism rules.
  */
object StatsOps {

  /** Two-sample KS statistic of each event type's value distribution
    * against the pooled rest: exact integer ECDF numerators on the
    * (distinct value × group) grid, one final rounded division.
    */
  val qKsTest: QueryFn = withTables { spark =>
    Stats.ksTest(spark.table("events"), "event_type", "value")
      .orderBy("event_type")
  }

  /** The 100 TB dual judged: same KS contract evaluated on 16
    * equi-width bins of the global value range (the PSI edge freeze),
    * so the ECDF grid is 16 × groups regardless of value cardinality.
    */
  val qKsBinned: QueryFn = withTables { spark =>
    Stats.ksTestBinned(spark.table("events"), "event_type", "value",
        bins = 16)
      .orderBy("event_type")
  }

  /** Mann–Whitney U rank-sum shift test per event type vs the pooled
    * rest: exact doubled-average-rank integers, decimal(38,0) tie
    * cubes, one identically-spelled float z (IEEE /, sqrt), 6 dp.
    */
  val qMannWhitney: QueryFn = withTables { spark =>
    Stats.mannWhitney(spark.table("events"), "event_type", "value")
      .orderBy("event_type")
  }

  /** 16-bin Mann-Whitney over the q_ks_binned histogram cells: the
    * bins-bounded grid replaces the distinct-value prefix window —
    * the shape that survives a continuous value column at 100 TB.
    */
  val qMwBinned: QueryFn = withTables { spark =>
    Stats.mannWhitneyBinned(spark.table("events"), "event_type", "value",
        bins = 16)
      .orderBy("event_type")
  }

  /** One-sample exponential KS on per-user inter-arrival seconds per
    * event type: is the arrival process memoryless? Group-rate MLE,
    * global 16-bin grid, 12-dp frozen edge terms.
    */
  val qKsExponential: QueryFn = withTables { spark =>
    // lag order at SECOND resolution (the gap unit) + event_id — the
    // oracle replays exactly this order; µs-resolution ordering would
    // fork same-second ties between the engines
    val w = Window.partitionBy("user_id").orderBy("_sec", "event_id")
    val gaps = spark.table("events")
      .withColumn("_sec", unix_timestamp(col("ts")))
      .withColumn("_gap", col("_sec") - lag("_sec", 1).over(w))
      .filter(col("_gap").isNotNull)
      .select(col("event_type"), col("_gap"))
    Stats.ksExponentialBinned(gaps, "event_type", "_gap", bins = 16)
      .orderBy("event_type")
  }

  /** Wilcoxon signed-rank on paired per-user half-month spend (exact
    * integer cents — value has 2 decimals, so the sums and diffs are
    * pure longs), per event type: the PAIRED location test next to
    * q_mann_whitney's independent-samples one.
    */
  val qWilcoxon: QueryFn = withTables { spark =>
    val cents = round(col("value") * 100).cast("long")
    val paired = spark.table("events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(when(col("ts") < lit("2024-01-16").cast("timestamp"),
          cents).otherwise(lit(0L))).as("x"),
        sum(when(col("ts") >= lit("2024-01-16").cast("timestamp"),
          cents).otherwise(lit(0L))).as("y"))
    graft.operators.Stats.wilcoxonSignedRank(paired, "event_type", "x", "y")
      .orderBy("event_type")
  }

  /** McNemar's paired-classifier test per source: two deterministic
    * "is this document English" rules scored against the lang label —
    * only the disagreements carry the statistic; all-integer counts,
    * one rounded division.
    */
  val qMcnemar: QueryFn = withTables { spark =>
    val label = col("lang") === "en"
    graft.operators.Stats.mcnemar(spark.table("documents"), "source",
        (col("n_chars") > 500) === label,
        (length(col("text")) > 550) === label)
      .orderBy("source")
  }

  /** Hill tail-index of document length over the top-100 order
    * statistics: scaled-long log ratios (the heapsLawFit quantum),
    * one exact sum, one rounded mean, alpha = 1/H.
    */
  val qHill: QueryFn = withTables { spark =>
    graft.operators.Stats.hillTailIndex(spark.table("documents"),
      "n_chars", "doc_id", k = 100)
  }

  /** Two IPF raking iterations toward uniform lang x source marginals
    * on documents: per-cell reweighting via window sums over the
    * levels-bounded cell table, weights 12-dp-quantized per half-step.
    */
  val qIpfRake: QueryFn = withTables { spark =>
    graft.operators.Sampling.rakeWeights(spark.table("documents"),
        "lang", "source", iters = 2)
      .orderBy("lang", "source")
  }

  /** Kruskal-Wallis H across all five event types at once: the
    * k-group rank ANOVA over 6-dp-quantized values, doubled-rank
    * integers, tie-corrected, one float tree.
    */
  val qKruskal: QueryFn = withTables { spark =>
    graft.operators.Stats.kruskalWallis(spark.table("events"),
      "event_type", "value")
  }

  /** Cliff's delta per event type vs the pooled complement: the
    * ordinal effect-size companion of q_mann_whitney, one extra
    * rounded expression over the same exact U.
    */
  val qCliffsDelta: QueryFn = withTables { spark =>
    graft.operators.Stats.cliffsDelta(spark.table("events"),
        "event_type", "value")
      .orderBy("event_type")
  }

  /** Empirical-Bayes shrunk success rates (value > 50) per event
    * type: beta-binomial method-of-moments prior from the group
    * rates, 12-dp-frozen moments, one float tree.
    */
  val qEbShrink: QueryFn = withTables { spark =>
    graft.operators.Stats.ebShrinkRates(spark.table("events"),
        "event_type", col("value") > 50.0)
      .orderBy("event_type")
  }

  /** Pettitt changepoint on the daily integer-cents spend series per
    * event type: pure-integer doubled-rank U_t, (|U| DESC, t) argmax.
    */
  val qPettitt: QueryFn = withTables { spark =>
    val cells = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("v"))
    graft.operators.Stats.pettitt(cells, "event_type", "d", "v")
      .withColumn("at_order", col("at_order").cast("string"))
      .orderBy("event_type")
  }

  /** Theil-Sen robust slope of daily spend vs day index per event
    * type: rounded pairwise slopes over the calendar-bounded cells,
    * exact lower medians for slope and intercept.
    */
  val qTheilSen: QueryFn = withTables { spark =>
    val cells = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg((sum(round(col("value") * 100).cast("long")).cast("double")
        / 100.0).as("y"))
      .select(col("event_type"),
        datediff(col("d"), lit("2024-01-01").cast("date")).as("x"),
        col("y"))
    graft.operators.Stats.theilSen(cells, "event_type", "x", "y")
      .orderBy("event_type")
  }

  /** Max drawdown of the running (value - 100) total per event type,
    * ordered by event_id: integer cumulative/running-max windows,
    * first-trough tie rule.
    */
  val qDrawdown: QueryFn = withTables { spark =>
    graft.operators.Resample.maxDrawdown(
        spark.table("events").withColumn("step", col("value") - 100.0),
        "event_type", "event_id", "step")
      .orderBy("event_type")
  }

  /** Online Page-CUSUM drift detector trace per event type (target
    * 100, slack 5, threshold 500), ordered by event_id: the integer
    * prefix-min unrolling of S = max(0, S + step).
    */
  val qCusumDetect: QueryFn = withTables { spark =>
    graft.operators.Stats.cusumDetect(spark.table("events"),
        "event_type", "event_id", "value",
        target = 100.0, slack = 5.0, threshold = 500.0)
      .orderBy("event_type", "event_id")
  }

  /** Rolling 7-day Pearson correlation between daily spend (cents)
    * and daily event count per event type: decimal(38,0) moment
    * windows into one float tree, NULL during warm-up.
    */
  val qRollingCorr: QueryFn = withTables { spark =>
    val cells = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("x"),
        count(lit(1)).as("y"))
    graft.operators.Stats.rollingCorr(cells, "event_type", "d",
        "x", "y", window = 7)
      .withColumn("d", col("d").cast("string"))
      .orderBy("event_type", "d")
  }

  /** Kendall tau-b on the daily (day index, spend) cells per event
    * type: integer concordant/discordant pair counts with tie
    * correction, one float tree.
    */
  val qKendall: QueryFn = withTables { spark =>
    val cells = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      .select(col("event_type"),
        datediff(col("d"), lit("2024-01-01").cast("date")).as("x"),
        col("y"))
    graft.operators.Stats.kendallTau(cells, "event_type", "x", "y")
      .orderBy("event_type")
  }

  /** Welch's heteroscedastic one-way ANOVA of value across event
    * types: frozen per-group mean/variance/weight, decimal cross-group
    * folds, one rounded F-star / dof2 pair.
    */
  val qWelchAnova: QueryFn = withTables { spark =>
    graft.operators.Stats.welchAnova(spark.table("events"),
      "event_type", "value")
  }

  /** Theil T / Theil L / Atkinson(1) inequality of order value by
    * priority: cent-quantized positive values, frozen per-row ln
    * terms in decimal sums, one rounded division per index.
    */
  val qInequality: QueryFn = withTables { spark =>
    graft.operators.Stats.inequality(spark.table("orders"),
        Seq("o_orderpriority"), "o_totalprice")
      .orderBy("o_orderpriority")
  }

  /** Binned Kendall tau-b of (value, user_id) per event type, judged
    * on the RAW event stream (no pre-aggregation — that is the dual's
    * point) at 16×16 cells: integer cell counts and pair products,
    * one rounded tau expression. StatsSpec pins |Δtau| vs the exact
    * twin on a bounded fixture.
    */
  val qKendallBinned: QueryFn = withTables { spark =>
    graft.operators.Stats.kendallTauBinned(spark.table("events"),
        "event_type", "value", "user_id", bins = 16)
      .orderBy("event_type")
  }

  /** Wald-Wolfowitz runs test of value around its per-type median,
    * ordered by event_id: exact lower-median split, integer run
    * count, one z tree.
    */
  val qRunsTest: QueryFn = withTables { spark =>
    graft.operators.Stats.runsTest(spark.table("events"),
        "event_type", "event_id", "value")
      .orderBy("event_type")
  }

  /** Robust median/MAD outlier profile of value per event type:
    * exact integer lower medians, the 6745·|x−med| > 35000·MAD
    * integer outlier rule, descaled display medians.
    */
  val qRobustOutliers: QueryFn = withTables { spark =>
    Stats.robustOutliers(spark.table("events"), "event_type", "value")
      .orderBy("event_type")
  }

  /** Two-proportion z-test of P(value > 50) per event type vs the
    * rest, with the Wilson 95% interval for the group rate — exact
    * counts into an identically-spelled float tree (IEEE sqrt).
    */
  val qPropZtest: QueryFn = withTables { spark =>
    Stats.propZTest(spark.table("events"), "event_type",
        col("value") > 50.0)
      .orderBy("event_type")
  }

  /** Theil's uncertainty coefficient lang↔source: the asymmetric
    * "how much does source determine language" number that NMI
    * (q_mutual_info) symmetrizes away.
    */
  val qTheilsU: QueryFn = withTables { spark =>
    Stats.theilsU(spark.table("documents"), "lang", "source")
  }

  /** Max CUSUM departure of each event type's value series (ts,
    * event_id order): all-integer n·S_k − k·T scoring over 6-dp
    * quanta, first-argmax tie-break, one final rounded division.
    */
  val qCusum: QueryFn = withTables { spark =>
    Stats.cusum(spark.table("events"), "event_type", "ts", "event_id",
        "value")
      .orderBy("event_type")
  }

  /** Day-of-week seasonality index per event type: exact rational
    * (sum_dow·n_all)/(n_dow·sum_all) of scaled-long quanta, portable
    * epoch-arithmetic day-of-week (0 = Monday).
    */
  val qSeasonality: QueryFn = withTables { spark =>
    Stats.seasonalityIndex(spark.table("events"), "event_type", "ts",
        "value")
      .orderBy("event_type", "dow")
  }

  /** First-order event-type transition matrix over per-user event
    * sequences in (ts, event_id) total order — exact integer
    * pair-count ratios, one rounded division.
    */
  val qMarkov: QueryFn = withTables { spark =>
    Resample.markovTransitions(spark.table("events"), "user_id", "ts",
        "event_id", "event_type")
      .orderBy("from_state", "to_state")
  }

  /** Data-skipping zone maps for orders sharded 8 ways on the md5 of
    * the order key: per-shard min/max/null-count for price, date, and
    * status — pure pass-through values, no rounding contract.
    */
  val qZonemap: QueryFn = withTables { spark =>
    Profiling.zoneMap(spark.table("orders"), "o_orderkey", 8,
        Seq("o_totalprice", "o_orderdate", "o_orderstatus"))
      .orderBy("shard")
  }

  /** Referential-consistency proof for deterministic pseudonymization:
    * customer and orders keys are tokenized INDEPENDENTLY under the
    * same salt, then joined ON THE TOKENS — order counts per token
    * must equal the plaintext join's counts.
    */
  val qPseudonymize: QueryFn = withTables { spark =>
    val c = Profiling.pseudonymize(
      spark.table("customer").select(col("c_custkey")),
      Seq("c_custkey"), "graft-r8")
    val o = Profiling.pseudonymize(
      spark.table("orders").select(col("o_custkey")),
      Seq("o_custkey"), "graft-r8")
    c.join(o, c("c_custkey") === o("o_custkey"))
      .groupBy(c("c_custkey").as("token"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("token")
  }

  /** Exact ε-neighbor counts over the (value, props.k) plane via the
    * recall-complete 3×3 grid equi-join: all-integer distance test on
    * scaled longs, density outliers = non-core points.
    */
  val qDensityGrid: QueryFn = withTables { spark =>
    val pts = spark.table("events").select(col("event_id"),
      col("value"),
      coalesce(get_json_object(col("props"), "$.k").cast("bigint"),
        lit(0L)).as("k"))
    Outliers.epsNeighborCounts(pts, "event_id", "value", "k",
        eps = 5.0, minPts = 10)
      .orderBy("event_id")
  }

  /** Deterministic DBSCAN over a 1000-event slice of the (value,
    * props.k) plane: core clusters by min-id label propagation over
    * the core–core ε-graph, border points take the MIN core-neighbor
    * label, noise stays NULL — all-integer geometry, total-order
    * labels. (The slice keeps the oracle's recursive transitive
    * closure tractable; the Spark side is the same blocked join + CC
    * at any scale.)
    */
  val qDbscan: QueryFn = withTables { spark =>
    val pts = spark.table("events").filter(col("event_id") < 1000)
      .select(col("event_id"), col("value"),
        coalesce(get_json_object(col("props"), "$.k").cast("bigint"),
          lit(0L)).as("k"))
    Outliers.dbscanLabels(pts, "event_id", "value", "k",
        eps = 5.0, minPts = 8)
      .orderBy("event_id")
  }

  /** Kaplan–Meier time-to-conversion curve: each user's duration runs
    * from their first event to their FIRST PURCHASE (observed) or to
    * their last event (right-censored — no purchase seen); exact
    * at-risk/exit integers, the ln/exp product chain, explicit
    * exact-zero handling.
    */
  /** Aalen–Johansen cumulative incidence with purchase vs error as
    * competing first events (earlier date wins, purchase on ties),
    * censored at last activity: CIF_k = Σ S(s−)·d_k/n over the
    * all-cause survival — the competing-risks correction of
    * q_kaplan_meier's single-cause curve.
    */
  val qCumInc: QueryFn = withTables { spark =>
    val s = spark.table("events").groupBy("user_id")
      .agg(min(col("ts").cast("date")).as("_first"),
        max(col("ts").cast("date")).as("_last"),
        min(when(col("event_type") === "purchase",
          col("ts").cast("date"))).as("_fp"),
        min(when(col("event_type") === "error",
          col("ts").cast("date"))).as("_fe"))
    val cause = when(col("_fp").isNotNull
        && (col("_fe").isNull || col("_fp") <= col("_fe")), "purchase")
      .when(col("_fe").isNotNull, "error")
    val eventDate = when(cause === "purchase", col("_fp"))
      .when(cause === "error", col("_fe"))
    val subjects = s.select(col("user_id"),
      datediff(coalesce(eventDate, col("_last")), col("_first"))
        .cast("bigint").as("duration"),
      cause.as("cause"))
    Stats.competingRisks(subjects, Seq.empty, "duration", "cause")
      .orderBy("cause", "duration")
  }

  val qKaplanMeier: QueryFn = withTables { spark =>
    val subjects = spark.table("events").groupBy("user_id")
      .agg(min(col("ts").cast("date")).as("_first"),
        max(col("ts").cast("date")).as("_last"),
        min(when(col("event_type") === "purchase",
          col("ts").cast("date"))).as("_firstp"))
      .select(col("user_id"),
        datediff(coalesce(col("_firstp"), col("_last")), col("_first"))
          .cast("bigint").as("duration"),
        col("_firstp").isNotNull.as("observed"))
    Stats.kaplanMeier(subjects, Seq.empty, "duration", col("observed"))
      .orderBy("duration")
  }

  /** Kaplan–Meier with the Greenwood log(−log) 95% band on the
    * q_kaplan_meier subjects: same cells/windows, one Greenwood
    * cumulative, one band tree per row rounded at 6 dp.
    */
  val qKmCi: QueryFn = withTables { spark =>
    val subjects = spark.table("events").groupBy("user_id")
      .agg(min(col("ts").cast("date")).as("_first"),
        max(col("ts").cast("date")).as("_last"),
        min(when(col("event_type") === "purchase",
          col("ts").cast("date"))).as("_firstp"))
      .select(col("user_id"),
        datediff(coalesce(col("_firstp"), col("_last")), col("_first"))
          .cast("bigint").as("duration"),
        col("_firstp").isNotNull.as("observed"))
    Stats.kaplanMeierCI(subjects, Seq.empty, "duration", col("observed"))
      .orderBy("duration")
  }

  /** Dickey–Fuller unit-root t on the per-type daily-spend series
    * (exact integer cents per day): one lag window, decimal moments,
    * one rounded β/t tree.
    */
  val qDickeyFuller: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
    graft.operators.Stats.dickeyFuller(daily, "event_type", "d", "y")
      .orderBy("event_type")
  }

  /** Two-segment breakpoint scan of value over the day index per
    * event type (16 bins): decimal moment cells, one cumulative
    * window, identical cost trees, (gain DESC, edge) argmax.
    */
  val qBreakpoint: QueryFn = withTables { spark =>
    val pts = spark.table("events")
      .withColumn("dayx",
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .cast("double"))
    graft.operators.Stats.breakpointScan(pts, "event_type", "dayx",
        "value", bins = 16)
      .orderBy("event_type")
  }

  /** Entropy rate of each user's event-type chain, global group:
    * exact transition cells, frozen −(c/n)·ln(c/rowtot) terms in a
    * decimal sum, one rounded H/perplexity pair.
    */
  val qMarkovEntropy: QueryFn = withTables { spark =>
    graft.operators.Stats.markovEntropyRate(
      spark.table("events").withColumn("g", lit("all")),
      "g", "user_id", "ts", "event_id", "event_type")
  }

  /** Yuen's 20%-trimmed t between click and purchase spend: exact
    * order-statistic trim bounds, Winsorized decimal moments, one
    * rounded t/dof tree.
    */
  val qYuen: QueryFn = withTables { spark =>
    graft.operators.Stats.yuenT(
      spark.table("events")
        .filter(col("event_type").isin("click", "purchase")),
      "event_type", "value", trimPct = 20)
  }

  /** ANOVA effect sizes (η², ω²) of event value across types — the
    * q_anova fold verbatim plus two rounded ratios.
    */
  val qAnovaEffect: QueryFn = withTables { spark =>
    graft.operators.Stats.anovaEffectSizes(spark.table("events"),
      "event_type", "value")
  }

  /** Restricted mean survival time to first purchase within τ = 10
    * days (the q_kaplan_meier subjects): frozen KM steps, exact
    * segment widths, decimal area fold.
    */
  val qRmst: QueryFn = withTables { spark =>
    val subjects = spark.table("events").groupBy("user_id")
      .agg(min(col("ts").cast("date")).as("_first"),
        max(col("ts").cast("date")).as("_last"),
        min(when(col("event_type") === "purchase",
          col("ts").cast("date"))).as("_firstp"))
      .select(col("user_id"),
        datediff(coalesce(col("_firstp"), col("_last")), col("_first"))
          .cast("bigint").as("duration"),
        col("_firstp").isNotNull.as("observed"))
    graft.operators.Stats.restrictedMeanSurvival(subjects, Seq.empty,
      "duration", col("observed"), tau = 10L)
  }

  /** Cox proportional hazards of log-spend on time-to-first-purchase
    * (the q_kaplan_meier/q_c_index subjects): 3 fixed Newton
    * iterations, Breslow ties, frozen exp terms in decimal cell sums,
    * reverse-cumulative risk sets, one hazard-ratio row.
    */
  val qCoxPh: QueryFn = withTables { spark =>
    val subjects = spark.table("events").groupBy("user_id")
      .agg(min(col("ts").cast("date")).as("_first"),
        max(col("ts").cast("date")).as("_last"),
        min(when(col("event_type") === "purchase",
          col("ts").cast("date"))).as("_firstp"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("_spend"))
      .select(lit("all").as("g"),
        datediff(coalesce(col("_firstp"), col("_last")), col("_first"))
          .cast("bigint").as("duration"),
        col("_firstp").isNotNull.as("observed"),
        log(lit(1.0) + col("_spend")).as("xcov"))
    graft.operators.Stats.coxPH(subjects, "g", "duration",
      col("observed"), "xcov", iters = 3)
  }

  /** One-lag Granger F of yesterday's clicks on today's purchases
    * (global daily count series, exact integers): one lag window,
    * nine decimal moments, the closed-form 2-var OLS trees.
    */
  val qGranger: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("ts").cast("date").as("d"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
      .withColumn("g", lit("all"))
    graft.operators.Stats.grangerF(daily, "g", "d", "y", "x")
  }

  /** Doubly-robust AIPW ATE of the q_psm_ate treatment (hour-gated by
    * user class) on spend with hour as the covariate: logistic
    * propensity (2 Newton steps, 6-dp published params, clipped to
    * [.01, .99]) + per-arm closed-form outcome OLS, 12-dp frozen
    * per-row contributions — reportable beside q_psm_ate's stratified
    * estimate.
    */
  val qAipw: QueryFn = withTables { spark =>
    val ev = spark.table("events")
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(hour(col("ts")).cast("double").as("x"),
        (col("user_id") % 24 < hour(col("ts"))).as("t"),
        col("value").as("y"))
    graft.operators.Stats.aipwAte(ev, col("t"), "y", "x", iters = 2)
  }

  /** Double-ML partialling-out effect of the q_aipw treatment on
    * spend per event type (r17 verdict item 2): ridge nuisance fits
    * of y and t on (hour, day-of-month) at λ = 0.5, residual-on-
    * residual OLS through the origin, HC0 sandwich se from exact
    * 4th-order decimal folds of the 6-dp-frozen residuals.
    */
  val qDml: QueryFn = withTables { spark =>
    val ev = spark.table("events")
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type").as("g"),
        hour(col("ts")).cast("double").as("x1"),
        dayofmonth(col("ts")).cast("double").as("x2"),
        when(col("user_id") % 24 < hour(col("ts")), 1.0)
          .otherwise(0.0).as("t"),
        col("value").as("y"))
    graft.operators.Stats.doubleMlAte(ev, "g", col("t"), "y",
        Seq("x1", "x2"), lambda = 0.5)
      .orderBy("g")
  }

  /** Gumbel return levels of daily maximum spend per event type:
    * moment fit on the block maxima (6-dp μ̂/β̂), the 30- and
    * 365-period levels — "how bad is the 1-in-T worst day".
    */
  val qGumbel: QueryFn = withTables { spark =>
    val maxima = spark.table("events")
      .groupBy(col("event_type").as("g"), col("ts").cast("date").as("d"))
      .agg(max("value").as("v"))
    graft.operators.Stats.gumbelReturnLevels(maxima, Seq("g"), "v",
        Seq(30, 365))
      .orderBy("g", "return_period")
  }

  /** Chapman capture–recapture estimate of the TRUE user population
    * from two observation windows (first vs second half of month):
    * exact mark counts, the bias-corrected Lincoln–Petersen estimate
    * + its classical se.
    */
  val qLincoln: QueryFn = withTables { spark =>
    graft.operators.Stats.captureRecapture(spark.table("events"),
      "user_id", dayofmonth(col("ts")) <= 15, dayofmonth(col("ts")) > 15)
  }

  /** Two-way fixed-effects (within) slope of spend-per-event on daily
    * event volume over a (user-bucket × day) panel: unit effects soak
    * up who, day effects soak up when — the modern panel-DiD
    * workhorse; 12-dp frozen means, decimal product folds.
    */
  val qTwfe: QueryFn = withTables { spark =>
    val panel = spark.table("events")
      .groupBy((col("user_id") % 20).as("u"),
        col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value") * 1e6).cast("bigint")) / 1e6
          / count(lit(1)), 6).cast("double").as("y"),
        count(lit(1)).cast("double").as("x"))
    graft.operators.Stats.twoWayFixedEffects(panel, "u", "d", "y", "x")
  }

  /** Always-valid sequential monitoring (mSPRT) of daily mean spend
    * per event type against μ₀ = 100 (σ² = 5000, τ² = 1000): the
    * peek-anytime p-value stream a monitoring dashboard reads —
    * running exact cumulatives, 12-dp-frozen ln Λ, supermartingale
    * max, one rounded exp per day.
    */
  val qMsprt: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value") * 1e6).cast("bigint")) / 1e6
        / count(lit(1)), 6).cast("double").as("x"))
    graft.operators.Stats.msprt(daily, "event_type", "d", "x",
        mu0 = 100.0, sigma2 = 5000.0, tau2 = 1000.0)
      .orderBy("event_type", "d")
  }

  /** Two-sample Hotelling T² of (quantity, extended price) between
    * the A and R return flags — the multivariate mean test where two
    * marginal t's would double-count the strong quantity↔price
    * correlation; exact decimal co-moments, closed-form 2×2
    * adjugate/det, the exact-F transform.
    */
  val qHotelling: QueryFn = withTables { spark =>
    graft.operators.Stats.hotellingT2(
      spark.table("lineitem")
        .filter(col("l_returnflag").isin("A", "R"))
        .select(col("l_returnflag").as("g"),
          col("l_quantity").cast("double").as("x1"),
          col("l_extendedprice").cast("double").as("x2")),
      "g", "x1", "x2")
  }

  /** TOST equivalence of high-value shares between click and view
    * events at margin 0.05 — "are the rates the same to within 5
    * points", the ship question plain significance can't answer.
    */
  val qTostProp: QueryFn = withTables { spark =>
    graft.operators.Stats.tostProportions(
      spark.table("events")
        .filter(col("event_type").isin("click", "view"))
        .select(col("event_type").as("g"), col("value")),
      "g", col("value") > 100, delta = 0.05)
  }

  /** Binned two-sample energy distance between click and purchase
    * spend (64 cells): exact integer bin-pair sums, the 2A−B−C
    * statistic and its n₁n₂/(n₁+n₂) test form — the any-difference
    * omnibus beside q_ks_binned's largest-gap test.
    */
  val qEnergyDist: QueryFn = withTables { spark =>
    graft.operators.Stats.energyDistanceBinned(
      spark.table("events")
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type").as("g"), col("value").as("v")),
      "g", "v", bins = 64)
  }

  /** Beta-binomial overdispersion of daily purchase-hour coverage:
    * each day is a 24-trial unit (hours), success = the hour saw a
    * purchase; MoM ρ̂/α/β quantify whether days vary more than one
    * coin explains — the fitted shrinkage prior for q_eb_shrink-style
    * pipelines.
    */
  val qBetaBinomial: QueryFn = withTables { spark =>
    val days = spark.table("events")
      .groupBy(col("ts").cast("date").as("d"))
      .agg(countDistinct(when(col("event_type") === "purchase",
        hour(col("ts")))).as("k"))
      .withColumn("m", lit(24L))
    graft.operators.Stats.betaBinomialMom(days, "k", "m")
  }

  /** Two-sample Poisson rate test: error events per unit traffic,
    * first half of month vs second — Wald z on exact counts and
    * exposures.
    */
  val qPoissonTest: QueryFn = withTables { spark =>
    graft.operators.Stats.poissonRateTest(
      spark.table("events")
        .withColumn("g", when(dayofmonth(col("ts")) <= 15, "h1")
          .otherwise("h2")),
      "g", col("event_type") === "error", lit(1.0))
  }

  /** Engle–Granger cointegration of cumulative purchase spend on
    * cumulative click spend (two trending daily series): the
    * q_lin_fit equilibrium OLS + the q_dickey_fuller unit-root
    * regression on its 6-dp residuals — strongly negative adf_t =
    * mean-reverting equilibrium error.
    */
  val qEngleGranger: QueryFn = withTables { spark =>
    val w = org.apache.spark.sql.expressions.Window.orderBy("d")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val daily = spark.table("events")
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("ts").cast("date").as("d"))
      .agg(sum(when(col("event_type") === "click",
          round(col("value") * 100).cast("long")).otherwise(0L)).as("_xc"),
        sum(when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(0L)).as("_yc"))
      // calendar-bounded cumulative (days, not rows — not a hazard)
      .withColumn("x", sum("_xc").over(w) / 100.0)
      .withColumn("y", sum("_yc").over(w) / 100.0)
      .withColumn("g", lit("all"))
    graft.operators.Stats.engleGranger(daily, "g", "d", "y", "x")
  }

  /** Jonckheere–Terpstra ordered-alternative test: do order totals
    * increase along the priority tiers ('1-URGENT'..'5-LOW' — the
    * natural label order IS the hypothesis order)? Exact integer 2·JT
    * from per-group cumulative counts on the value grid; z against
    * the no-ties null.
    */
  val qJonckheere: QueryFn = withTables { spark =>
    graft.operators.Stats.jonckheereTerpstra(
      spark.table("orders").select(col("o_orderpriority").as("g"),
        col("o_totalprice").cast("double").as("v")), "g", "v")
  }

  /** Brunner–Munzel relative-effect test of purchase vs click spend —
    * the variance-robust Mann–Whitney replacement: doubled-midrank
    * machinery, exact integer deviation cores, the reference
    * W/df/p̂ trees.
    */
  val qBrunnerMunzel: QueryFn = withTables { spark =>
    graft.operators.Stats.brunnerMunzel(
      spark.table("events")
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type").as("g"), col("value").as("v")),
      "g", "v")
  }

  /** Kendall's W concordance of the days' agreement on the event-type
    * spend ranking (the q_friedman cells): tie-corrected W from
    * doubled midranks — the effect size beside q_friedman's χ².
    */
  val qKendallW: QueryFn = withTables { spark =>
    graft.operators.Stats.kendallW(dayCellsN(spark), "x", "event_type",
      "y")
  }

  /** Theta-method (θ=2) 3-step forecast of the daily spend series per
    * event type: closed-form trend on exact decimal moments (a, b
    * frozen at 6 dp), 6-dp theta line, SES via the holt fold with
    * β = 0, equal-weight trend/SES combination — the M3 baseline
    * beater; the oracle replays trend + recursion bit-exactly.
    */
  val qThetaForecast: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value") * 1e6).cast("bigint")) / 1e6, 6)
        .cast("double").as("x"))
    graft.operators.Resample.thetaForecast(daily, "event_type", Seq("d"),
        "x", alpha = 0.3, horizon = 3)
      .orderBy("event_type", "h")
  }

  /** Croston intermittent-demand forecast of daily high-value event
    * counts (value > 300 — 2-6 demand days per type in 30): separate
    * SES on demand sizes and inter-demand intervals (α = 0.4), rate
    * forecast z/p; the oracle replays the exact state machine in a
    * recursive CTE.
    */
  val qCroston: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(sum(when(col("value") > 300, 1L).otherwise(0L))
        .cast("double").as("x"))
    graft.operators.Resample.crostonForecast(daily, "event_type", Seq("d"),
        "x", alpha = 0.4)
      .orderBy("event_type")
  }

  /** TSB forecast of rare high-value demand (daily count of value >
    * 400 events, mostly zeros): probability updates EVERY period —
    * the obsolescence-aware member beside q_croston.
    */
  val qTsb: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(sum(when(col("value") > 400, 1L).otherwise(0L))
        .cast("double").as("x"))
    graft.operators.Resample.tsbForecast(daily, "event_type", Seq("d"),
        "x", alphaP = 0.2, alphaZ = 0.3)
      .orderBy("event_type")
  }

  /** Croston with the Syntetos–Boylan approximation: the judged
    * q_croston recursion plus the (1 − α/2) bias correction — the
    * standard intermittent-demand estimator pair.
    */
  val qCrostonSba: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(sum(when(col("value") > 300, 1L).otherwise(0L))
        .cast("double").as("x"))
    graft.operators.Resample.crostonForecast(daily, "event_type",
        Seq("d"), "x", alpha = 0.4)
      .withColumn("sba",
        when(col("size_level").isNotNull,
          round(lit(1.0 - 0.4 / 2.0)
            * (col("size_level") / col("interval_level")), 6))
          .cast("double"))
      .orderBy("event_type")
  }

  /** Multiplicative Holt–Winters (weekly seasonal) 7-step forecast of
    * the strictly-positive daily spend series — the proportional-
    * seasonality twin of q_hw_forecast: ratio seasonal ring, 6-dp
    * updates, (level + h·trend)·s forecasts; LIST-state recursive
    * oracle.
    */
  val qHwMult: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value") * 1e6).cast("bigint")) / 1e6, 6)
        .cast("double").as("x"))
    graft.operators.Resample.holtWintersMultForecast(daily, "event_type",
        Seq("d"), "x", alpha = 0.3, beta = 0.2, gamma = 0.1,
        period = 7, horizon = 7)
      .orderBy("event_type", "h")
  }

  /** Instrumental-variable Wald/2SLS slope of spend on hour-of-day
    * per event type, instrumented by day-of-month parity: exact
    * decimal moments, Wald ratio vs the naive OLS slope, first-stage
    * F as the weak-instrument gauge.
    */
  val qIvWald: QueryFn = withTables { spark =>
    val ev = spark.table("events")
      .select(col("event_type").as("g"), col("value").as("y"),
        hour(col("ts")).cast("double").as("x"),
        (dayofmonth(col("ts")) % 2).cast("double").as("z"))
    graft.operators.Stats.ivWald(ev, "g", "y", "x", "z")
      .orderBy("g")
  }

  /** Sharp regression discontinuity of extended price on quantity at
    * the 25.5 cutoff (bandwidth 20) per return flag: per-side
    * closed-form OLS on exact decimal moments, effect = the intercept
    * jump at the cutoff.
    */
  val qRdd: QueryFn = withTables { spark =>
    graft.operators.Stats.regressionDiscontinuity(
        spark.table("lineitem").withColumn("g", col("l_returnflag")),
        "g", "l_quantity", "l_extendedprice",
        cutoff = 25.5, bandwidth = 20.0)
      .orderBy("g")
  }

  /** Covariate balance (standardized mean differences) for the
    * afternoon-treatment split over spend, day-of-month, and a user
    * class: one melted aggregate, exact decimal moments, sample
    * variances, the |SMD| ≲ 0.1 balance diagnostic.
    */
  val qSmd: QueryFn = withTables { spark =>
    val ev = spark.table("events")
      .select((hour(col("ts")) >= 12).as("t"), col("value"),
        dayofmonth(col("ts")).cast("double").as("dom"),
        (col("user_id") % 97).cast("double").as("ucls"))
    graft.operators.Stats.balanceSmd(ev, col("t"),
        Seq("value", "dom", "ucls"))
      .orderBy("covariate")
  }

  /** Quantity-weighted median price per return flag: rational p=1/2,
    * pure integer crossing threshold, value passes through untouched.
    */
  val qWeightedMedian: QueryFn = withTables { spark =>
    graft.operators.Percentiles.weightedQuantile(spark.table("lineitem"),
        Seq("l_returnflag"), "l_extendedprice", "l_quantity",
        pNum = 1, pDen = 2)
      .orderBy("l_returnflag")
  }

  /** Heaps'-law vocabulary-growth fit per source: exact integer
    * least-squares over ROUND(ln·10⁶) scaled boundary points.
    */
  val qHeaps: QueryFn = withTables { spark =>
    TextAnalysis.heapsLawFit(spark.table("documents"), "source",
        "doc_id", "text")
      .orderBy("source")
  }

  /** Benford first-digit profile of order totals: integer-string
    * leading digits, exact count ratios, shared expected literals.
    */
  val qBenford: QueryFn = withTables { spark =>
    Stats.benford(spark.table("orders"), "o_totalprice")
      .orderBy("digit")
  }

  /** Assortativity of the part co-order graph by brand: Newman
    * modularity of the p_brand attribute partition — all-integer
    * (4m·intra − Σd_c²) numerator, one rounded division.
    */
  val qModularity: QueryFn = withTablesSf { (spark, sfDir) =>
    val labels = spark.table("part")
      .select(col("p_partkey").as("v"), col("p_brand").as("lbl"))
    Graph.modularity(GraphOps.coOrderParts(spark, sfDir, 7), "a", "b",
      labels, "v", "lbl")
  }

  /** Degree assortativity of the part co-order graph: exact integer
    * moment sums over both edge directions, one IEEE sqrt + rounded
    * division.
    */
  val qAssortativity: QueryFn = withTablesSf { (spark, sfDir) =>
    Graph.assortativity(GraphOps.coOrderParts(spark, sfDir, 7), "a", "b")
  }

  /** Daily-sum autocorrelation at lags 1..3 per event type: exact
    * decimal centered moments, one rounded division per lag.
    */
  val qAcf: QueryFn = withTables { spark =>
    Resample.autocorrelation(spark.table("events"), "event_type", "ts",
        "value", maxLag = 3)
      .orderBy("event_type", "lag")
  }

  /** DFT periodogram of each event type's daily spend at candidate
    * periods 2..14 (r17 verdict item 4): driver-literal cos/sin
    * tables (no in-plan libm trig), exact decimal centering, 12-dp
    * term freezes into decimal folds, parsimony-tied dominant flag.
    */
  val qPeriodogram: QueryFn = withTables { spark =>
    Resample.periodogram(spark.table("events"), "event_type", "ts",
        "value", minPeriod = 2, maxPeriod = 14)
      .orderBy("event_type", "period")
  }

  /** 3-step Holt (level+trend) forecast of each event type's daily
    * value series: exact scaled-long daily sums into the 6-dp-rounded
    * two-state recursion (α=0.3, β=0.2), forecasts from the final
    * state — the oracle unrolls the identical recursion in a
    * recursive CTE with all-DOUBLE arithmetic (decimal literals cast,
    * so both engines run the same IEEE ops).
    */
  val qHoltForecast: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value") * 1e6).cast("bigint")) / 1e6, 6)
        .cast("double").as("x"))
    Resample.holtForecast(daily, "event_type", Seq("d"), "x",
        alpha = 0.3, beta = 0.2, horizon = 3)
      .orderBy("event_type", "h")
  }

  /** Damped-trend Holt 5-step forecast of the daily spend series
    * (α=0.3, β=0.2, φ=0.9): the overshoot-proof member of the
    * q_holt_forecast family — forecasts flatten toward l + bφ/(1−φ)
    * via driver-literal damping sums.
    */
  val qHoltDamped: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value") * 1e6).cast("bigint")) / 1e6, 6)
        .cast("double").as("x"))
    Resample.holtDampedForecast(daily, "event_type", Seq("d"), "x",
        alpha = 0.3, beta = 0.2, phi = 0.9, horizon = 5)
      .orderBy("event_type", "h")
  }

  /** Holt-Winters additive (weekly seasonal) 7-step forecast of the
    * daily spend series per event type: the q_holt_forecast recursion
    * plus a 7-slot seasonal ring, every update 6-dp-rounded, the
    * oracle replaying it through a LIST-state recursive CTE.
    */
  val qHwForecast: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value") * 1e6).cast("bigint")) / 1e6, 6)
        .cast("double").as("x"))
    Resample.holtWintersForecast(daily, "event_type", Seq("d"), "x",
        alpha = 0.3, beta = 0.2, gamma = 0.1, period = 7, horizon = 7)
      .orderBy("event_type", "h")
  }

  /** Chi-squared independence of lang × source on documents, with
    * Cramér's V: exact integer contingency marginals, per-cell terms
    * 12-dp-quantized into an exact decimal sum, one float tree.
    */
  val qChiSquared: QueryFn = withTables { spark =>
    Stats.chiSquared(spark.table("documents"), "lang", "source")
  }

  /** Jarque-Bera normality screen of value per event type: cent-scaled
    * decimal(38,0) moment sums S1..S4 into identically-spelled
    * central-moment trees (the scale cancels in g1/g2).
    */
  val qJarqueBera: QueryFn = withTables { spark =>
    Stats.jarqueBera(spark.table("events"), "event_type", "value")
      .orderBy("event_type")
  }

  /** Binned two-sample Cramér-von Mises of value per event type vs
    * the pooled rest: the q_ks_binned cells with a weighted squared
    * gap sum (decimal-exact) instead of the max gap.
    */
  val qCvmBinned: QueryFn = withTables { spark =>
    Stats.cvmBinned(spark.table("events"), "event_type", "value", bins = 16)
      .orderBy("event_type")
  }

  /** Benjamini-Hochberg FDR over the per-event-type binned-KS battery:
    * asymptotic KS p-values (one 9-dp-rounded exp tree) ranked by
    * (p, event_type), step-up cutoff at alpha = 0.1.
    */
  val qFdrBh: QueryFn = withTables { spark =>
    val ks = Stats.ksTestBinned(spark.table("events"), "event_type",
      "value", bins = 16)
    val withP = ks.withColumn("p",
      least(lit(1.0), round(lit(2.0) * exp(lit(-2.0) * col("ks") * col("ks")
        * col("n_group").cast("double") * col("n_rest").cast("double")
        / (col("n_group") + col("n_rest")).cast("double")), 9)))
    Stats.fdrBh(withP, "p", Seq("event_type"), alpha = 0.1)
      .orderBy("event_type")
  }

  /** Holm step-down on the q_fdr_bh battery — the FWER gate beside
    * BH's FDR: reject in ascending-p order until the first failure of
    * p ≤ α/(m−rank+1); adjusted p as the 9-dp-frozen running max.
    */
  val qFdrHolm: QueryFn = withTables { spark =>
    val ks = Stats.ksTestBinned(spark.table("events"), "event_type",
      "value", bins = 16)
    val withP = ks.withColumn("p",
      least(lit(1.0), round(lit(2.0) * exp(lit(-2.0) * col("ks") * col("ks")
        * col("n_group").cast("double") * col("n_rest").cast("double")
        / (col("n_group") + col("n_rest")).cast("double")), 9)))
    Stats.holm(withP, "p", Seq("event_type"), alpha = 0.1)
      .orderBy("event_type")
  }

  /** Hochberg step-up over the SAME battery as q_fdr_holm: identical
    * α/(m−j+1) thresholds walked from the largest p down — one
    * strong test rescues borderline siblings Holm abandons.
    */
  val qHochberg: QueryFn = withTables { spark =>
    val ks = Stats.ksTestBinned(spark.table("events"), "event_type",
      "value", bins = 16)
    val withP = ks.withColumn("p",
      least(lit(1.0), round(lit(2.0) * exp(lit(-2.0) * col("ks") * col("ks")
        * col("n_group").cast("double") * col("n_rest").cast("double")
        / (col("n_group") + col("n_rest")).cast("double")), 9)))
    Stats.hochberg(withP, "p", Seq("event_type"), alpha = 0.1)
      .orderBy("event_type")
  }

  /** WAPE + signed bias of the season-7 naive forecast on the
    * q_forecast_acc cells: the volume-weighted error pct and the
    * persistent over/under-forecast reading.
    */
  val qForecastBias: QueryFn = withTables { spark =>
    Resample.forecastBias(dayCells(spark), "event_type", "x", "y",
        season = 7)
      .orderBy("event_type")
  }

  /** Passing–Bablok method comparison of the rounded-dollar daily
    * mean against the raw daily mean per event type: K-shifted
    * median of pairwise slopes on calendar-bounded cells.
    */
  val qPassingBablok: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value"), 6).cast("decimal(38,6)"))
          .cast("double") / count(lit(1)).cast("double"), 6).as("x"),
        round(sum(round(round(col("value"), 0), 6).cast("decimal(38,6)"))
          .cast("double") / count(lit(1)).cast("double"), 6).as("y"))
    Stats.passingBablok(daily, "event_type", "x", "y")
      .orderBy("event_type")
  }

  /** Benjamini–Yekutieli over the SAME battery as q_fdr_bh — the
    * arbitrary-dependence FDR gate (these per-type KS screens share
    * the pooled rest, the textbook dependent battery): the BH walk
    * with the threshold deflated by c(m) = Σ1/i, computed from the
    * battery's own ranks and frozen at 12 dp.
    */
  val qFdrBy: QueryFn = withTables { spark =>
    val ks = Stats.ksTestBinned(spark.table("events"), "event_type",
      "value", bins = 16)
    val withP = ks.withColumn("p",
      least(lit(1.0), round(lit(2.0) * exp(lit(-2.0) * col("ks") * col("ks")
        * col("n_group").cast("double") * col("n_rest").cast("double")
        / (col("n_group") + col("n_rest")).cast("double")), 9)))
    Stats.fdrBy(withP, "p", Seq("event_type"), alpha = 0.1)
      .orderBy("event_type")
  }

  /** NB2 overdispersion fit of per-customer order counts by market
    * segment: exact integer power sums, method-of-moments dispersion
    * α̂ = (s²−x̄)/x̄², the count-data sibling of q_beta_binomial.
    */
  val qNegbin: QueryFn = withTables { spark =>
    val cnts = spark.table("orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      .join(spark.table("customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"), col("n_orders"))
    Stats.negbinFit(cnts, "segment", "n_orders").orderBy("segment")
  }

  /** Cochrane–Orcutt AR(1) FGLS of the daily mean spend trend per
    * event type: OLS on (day index, daily mean), lag-1 residual ρ̂,
    * quasi-differenced re-fit with the intercept rescaled — the
    * serial-correlation-honest trend beside q_hac_se's corrected SE;
    * all folds 12-dp frozen decimals, day means exact.
    */
  val qCochraneOrcutt: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value"), 6).cast("decimal(38,6)"))
        .cast("double") / count(lit(1)).cast("double"), 6).as("y"))
    // x re-bases to the series' own first day: epoch-day indices
    // (~2e4) push x² past the 12-dp double quantum and the frozen
    // folds stop being engine-identical — small x keeps every term
    // inside the representable 12-dp regime
    val minD = daily.groupBy("event_type").agg(min(col("d")).as("_d0"))
    val pts = daily.join(minD, "event_type")
      .withColumn("x", datediff(col("d"), col("_d0")).cast("double"))
    Stats.cochraneOrcutt(pts, "event_type", "d", "x", "y")
      .orderBy("event_type")
  }

  /** Westgard multi-rule QC over the daily mean spend per event type:
    * z against the series' full-run exact-decimal mean/sd, the five
    * classic rules (1_3s/2_2s/R_4s/4_1s/10x) as frozen-value window
    * logic — the lab-grade control chart a metric monitor runs.
    */
  val qWestgard: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value"), 6).cast("decimal(38,6)"))
        .cast("double") / count(lit(1)).cast("double"), 6).as("v"))
    Stats.westgardRules(daily, "event_type", "d", "v")
      .orderBy("event_type", "d")
  }

  /** Synthetic-control gap analysis: 'purchase' daily mean spend as
    * the treated series, click/signup/view as donors, the
    * q_ols_multi3 Cramer fit on the pre-2024-01-16 window projecting
    * the counterfactual over the whole month — post-period gaps are
    * the effect series.
    */
  val qSynthControl: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value"), 6).cast("decimal(38,6)"))
        .cast("double") / count(lit(1)).cast("double"), 6).as("v"))
    Stats.synthControl(daily, "event_type", "d", "v",
        treated = "purchase", donors = Seq("click", "signup", "view"),
        treatStart = "2024-01-16")
      .orderBy("d")
  }

  /** PRR/ROR disproportionality per brand on lineitem returns: which
    * brands' items come back disproportionately — exact 2×2 cells
    * per brand vs the rest, ln-scale 95% CI with the pinned z.
    */
  val qPrr: QueryFn = withTables { spark =>
    val li = spark.table("lineitem")
      .join(spark.table("part"), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_returnflag"))
    Stats.prrPanel(li, "p_brand", col("l_returnflag") === "R")
      .orderBy("p_brand")
  }


  /** Local-level Kalman filter over the daily mean spend per type:
    * adaptive-gain smoothing with 6-dp-frozen (level, P, K) per step —
    * the principled upgrade over the fixed-gain EWMA; oracle replays
    * the recursion in a recursive CTE.
    */
  val qKalman: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value"), 6).cast("decimal(38,6)"))
        .cast("double") / count(lit(1)).cast("double"), 6).as("v"))
    Resample.kalmanLocalLevel(daily, "event_type", Seq("d"), "v",
        q = 0.5, r = 4.0)
      .select(col("event_type"), col("d"),
        col("v").cast("double").as("v"), col("level"), col("gain"))
      .orderBy("event_type", "d")
  }

  /** Laspeyres/Paasche/Fisher price indices between the two mod-2
    * order halves over the common part basket: exact matched-model
    * unit prices and quantities, 12-dp-frozen p·q folds.
    */
  val qPriceIndex: QueryFn = withTables { spark =>
    val li = spark.table("lineitem")
      .select(col("l_partkey").as("item"),
        (col("l_orderkey") % 2).cast("int").as("period"),
        (col("l_extendedprice") / col("l_quantity")).as("price"),
        col("l_quantity").as("qty"))
    Stats.priceIndex(li, "item", "period", "price", "qty")
  }

  /** Seasonal (weekly) Mann–Kendall trend test on daily spend per
    * type: within-season pairs only, per-season tie-corrected
    * variance summed, the continuity-corrected z.
    */
  val qMkSeasonal: QueryFn = withTables { spark =>
    Stats.mannKendallSeasonal(spark.table("events"), "event_type",
        "ts", "value", period = 7)
      .orderBy("event_type")
  }


  /** Rank-biserial effect size beside the q_mann_whitney U test:
    * r = 1 − 2U/(n₁n₂) — the "how often does one group beat the
    * other" translation of U; one rounded division on the exact U.
    */
  val qRankBiserial: QueryFn = withTables { spark =>
    Stats.mannWhitney(spark.table("events"), "event_type", "value")
      .withColumn("rank_biserial",
        when(col("n_rest") > 0,
          round(lit(1.0) - lit(2.0) * col("u")
            / (col("n_group") * col("n_rest")).cast("double"), 6))
          .cast("double"))
      .orderBy("event_type")
  }

  /** KS model statistic on the q_roc_curve sweep: max |TPR − FPR|
    * with the peak threshold — the credit-scoring separation number.
    */
  val qKsModel: QueryFn = withTables { spark =>
    graft.operators.RankEval.ksStatistic(spark.table("events"), "value",
      coalesce(get_json_object(col("props"), "$.k").cast("bigint")
        % 2 === 0, lit(false)), bins = 20)
  }

  /** RiskMetrics EWMA volatility (λ = 0.94) of daily mean-spend
    * returns per type, with the one-sided 95% VaR multiplier — the
    * finance-standard vol tracker on the judged EWMA recursion.
    */
  val qRiskmetrics: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value"), 6).cast("decimal(38,6)"))
        .cast("double") / count(lit(1)).cast("double"), 6).as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("d")
    val rets = daily
      .withColumn("_prev", lag(col("v"), 1).over(w))
      .filter(col("_prev").isNotNull && col("_prev") =!= 0.0)
      .withColumn("ret", round(col("v") / col("_prev") - 1.0, 6))
      .withColumn("_r2", round(col("ret") * col("ret"), 12))
      .select("event_type", "d", "ret", "_r2")
    Resample.ewma(rets, "event_type", Seq("d"), "_r2", alpha = 0.06,
        outCol = "_s2")
      .select(col("event_type"), col("d"), col("ret").cast("double")
          .as("ret"),
        round(sqrt(col("_s2")), 6).cast("double").as("vol"),
        round(lit(Stats.MdeZ(("alpha", 0.10))) * sqrt(col("_s2")), 6)
          .cast("double").as("var95"))
      .orderBy("event_type", "d")
  }

  /** Variance inflation factors for the q_ols_multi3 covariates:
    * each VIF from the shared nine exact power sums — the
    * multicollinearity gate before trusting the t panel.
    */
  val qVif: QueryFn = withTables { spark =>
    Stats.vif3(spark.table("lineitem"),
        Seq("l_quantity", "l_discount", "l_tax"))
      .orderBy("covariate")
  }

  /** Process capability Cp/Cpk of spend per event type against the
    * declared [0, 800] tolerance band — "is in-control good ENOUGH",
    * the q_westgard companion.
    */
  val qCpk: QueryFn = withTables { spark =>
    Stats.processCapability(spark.table("events"), "event_type",
        "value", lsl = 0.0, usl = 800.0)
      .orderBy("event_type")
  }


  /** X-bar/R Shewhart chart over daily 5-sample subgroups of spend
    * per type (first five events per day under the event order):
    * exact subgroup means/ranges, n=5 constants A2/D3/D4 declared,
    * frozen-value flags — the subgroup SPC pair beside q_westgard's
    * individual rules.
    */
  val qXbarR: QueryFn = withTables { spark =>
    val ev = spark.table("events").withColumn("d", col("ts").cast("date"))
    Stats.xbarRChart(ev, "event_type", "d", Seq("ts", "event_id"),
        "value", sampleN = 5, a2 = 0.577, d3 = 0.0, d4 = 2.114)
      .orderBy("event_type", "d")
  }

  /** One-sweep Tukey median polish of the (event_type × day-of-week)
    * mean-spend grid: row/column effects as exact odd-count medians,
    * 6-dp-frozen residuals — the robust two-way decomposition.
    */
  val qMedianPolish: QueryFn = withTables { spark =>
    val grid = spark.table("events")
      .groupBy(col("event_type"),
        pmod(datediff(col("ts").cast("date"),
          to_date(lit("1970-01-01"))), lit(7)).cast("int").as("dow"))
      .agg(round(sum(round(col("value"), 6).cast("decimal(38,6)"))
        .cast("double") / count(lit(1)).cast("double"), 6).as("v"))
    Stats.medianPolish(grid, "event_type", "dow", "v")
      .orderBy("event_type", "dow")
  }


  /** Hurst exponent by R/S analysis over scales {5, 10, 15} on the
    * daily mean spend per type — the long-memory diagnostic (≈0.5
    * random walk, >0.5 persistent, <0.5 mean-reverting); exact block
    * folds, frozen ratios, ln(w) as interpolated literal digits.
    */
  val qHurst: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value"), 6).cast("decimal(38,6)"))
        .cast("double") / count(lit(1)).cast("double"), 6).as("v"))
    Stats.hurstRS(daily, "event_type", "d", "v",
        windows = Seq(5, 10, 15))
      .orderBy("event_type")
  }


  /** Annualized Sharpe ratio of daily mean-spend returns per type
    * (√252 interpolated digits): exact decimal power sums over the
    * 6-dp returns, one rounded ratio — the q_riskmetrics companion
    * summary.
    */
  val qSharpe: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value"), 6).cast("decimal(38,6)"))
        .cast("double") / count(lit(1)).cast("double"), 6).as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("d")
    val rets = daily
      .withColumn("_prev", lag(col("v"), 1).over(w))
      .filter(col("_prev").isNotNull && col("_prev") =!= 0.0)
      .select(col("event_type"),
        round(col("v") / col("_prev") - 1.0, 6).as("_r"))
    val agg = rets
      .withColumn("_r1", col("_r").cast("decimal(38,6)"))
      .withColumn("_r2", round(col("_r") * col("_r"), 12)
        .cast("decimal(38,12)"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum("_r1").as("_s1"),
        sum("_r2").as("_s2"))
    val nD = col("n_days").cast("double")
    val mean = col("_s1").cast("double") / nD
    val variance = (col("_s2").cast("double") -
      col("_s1").cast("double") * col("_s1").cast("double") / nD) /
      (nD - 1.0)
    agg.select(col("event_type"),
        col("n_days").cast("bigint").as("n_days"),
        round(mean, 6).cast("double").as("mean_ret"),
        when(col("n_days") >= 2 && variance > 0.0,
          round(sqrt(variance), 6)).cast("double").as("sd_ret"),
        when(col("n_days") >= 2 && variance > 0.0,
          round(mean / sqrt(variance) * lit(math.sqrt(252.0)), 6))
          .cast("double").as("sharpe_annual"))
      .orderBy("event_type")
  }

  /** Annualized Sortino ratio on the q_sharpe returns: mean excess
    * over the POPULATION downside deviation √(Σ min(r,0)²/n) × √252 —
    * the risk gauge that stops punishing upside volatility; exact
    * decimal folds of the 12-dp-frozen downside squares.
    */
  val qSortino: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value"), 6).cast("decimal(38,6)"))
        .cast("double") / count(lit(1)).cast("double"), 6).as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("d")
    val rets = daily
      .withColumn("_prev", lag(col("v"), 1).over(w))
      .filter(col("_prev").isNotNull && col("_prev") =!= 0.0)
      .select(col("event_type"),
        round(col("v") / col("_prev") - 1.0, 6).as("_r"))
    val agg = rets
      .withColumn("_r1", col("_r").cast("decimal(38,6)"))
      .withColumn("_d2", when(col("_r") < 0.0,
        round(col("_r") * col("_r"), 12)).otherwise(lit(0.0))
        .cast("decimal(38,12)"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum("_r1").as("_s1"),
        sum("_d2").as("_sd"))
    val nD = col("n_days").cast("double")
    val mean = col("_s1").cast("double") / nD
    val dvar = col("_sd").cast("double") / nD
    agg.select(col("event_type"),
        col("n_days").cast("bigint").as("n_days"),
        round(mean, 6).cast("double").as("mean_ret"),
        when(col("n_days") >= 2 && dvar > 0.0,
          round(sqrt(dvar), 6)).cast("double").as("downside_dev"),
        when(col("n_days") >= 2 && dvar > 0.0,
          round(mean / sqrt(dvar) * lit(math.sqrt(252.0)), 6))
          .cast("double").as("sortino_annual"))
      .orderBy("event_type")
  }

  /** Calmar ratio per type: annualized mean daily-spend return over
    * the maximum peak-to-trough drawdown FRACTION of the daily level
    * series (running max via one window) — the drawdown family's
    * summary ratio beside q_drawdown's absolute panel.
    */
  val qCalmar: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value"), 6).cast("decimal(38,6)"))
        .cast("double") / count(lit(1)).cast("double"), 6).as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("d")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withDd = daily
      .withColumn("_runmax", max(col("v")).over(wRun))
      .withColumn("_dd", when(col("_runmax") > 0.0,
        round(lit(1.0) - col("v") / col("_runmax"), 6)))
      .withColumn("_prev", lag(col("v"), 1).over(w))
      .withColumn("_r", when(col("_prev").isNotNull
        && col("_prev") =!= 0.0,
        round(col("v") / col("_prev") - 1.0, 6)))
    val agg = withDd.groupBy("event_type")
      .agg(sum(when(col("_r").isNotNull, 1L).otherwise(0L)).as("n_days"),
        sum(col("_r").cast("decimal(38,6)")).as("_s1"),
        max(col("_dd")).as("_mdd"))
    val nD = col("n_days").cast("double")
    val mean = col("_s1").cast("double") / nD
    agg.select(col("event_type"),
        col("n_days").cast("bigint").as("n_days"),
        when(col("n_days") >= 1, round(mean, 6))
          .cast("double").as("mean_ret"),
        col("_mdd").cast("double").as("max_drawdown"),
        when(col("n_days") >= 1 && col("_mdd") > 0.0,
          round(mean * 252.0 / col("_mdd"), 6))
          .cast("double").as("calmar"))
      .orderBy("event_type")
  }

  /** Historical VaR/CVaR at α = 0.1 of the q_sharpe daily returns:
    * the exact ⌈αn⌉-th order statistic and the exact decimal mean of
    * the rank-selected tail — the historical-simulation risk pair.
    */
  val qVarCvar: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value"), 6).cast("decimal(38,6)"))
        .cast("double") / count(lit(1)).cast("double"), 6).as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("d")
    val rets = daily
      .withColumn("_prev", lag(col("v"), 1).over(w))
      .filter(col("_prev").isNotNull && col("_prev") =!= 0.0)
      .select(col("event_type"),
        round(col("v") / col("_prev") - 1.0, 6).as("r"))
    Stats.varCvar(rets, "event_type", "r", alpha = 0.1)
      .orderBy("event_type")
  }

  /** Omega ratio at threshold 0 on the q_sharpe daily returns: the
    * FULL-distribution gain/loss ratio Σmax(r,0)/Σmax(−r,0) — unlike
    * Sharpe/Sortino it uses every moment, not just the first two;
    * exact decimal(38,6) partial-moment sums of the 6-dp returns.
    */
  val qOmegaRatio: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value"), 6).cast("decimal(38,6)"))
        .cast("double") / count(lit(1)).cast("double"), 6).as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("d")
    val rets = daily
      .withColumn("_prev", lag(col("v"), 1).over(w))
      .filter(col("_prev").isNotNull && col("_prev") =!= 0.0)
      .select(col("event_type"),
        round(col("v") / col("_prev") - 1.0, 6).as("_r"))
    val agg = rets.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("_r") > 0.0, col("_r")).otherwise(lit(0.0))
          .cast("decimal(38,6)")).as("_gs"),
        sum(when(col("_r") < 0.0, -col("_r")).otherwise(lit(0.0))
          .cast("decimal(38,6)")).as("_ls"))
    agg.select(col("event_type"),
        col("n_days").cast("bigint").as("n_days"),
        round(col("_gs").cast("double"), 6).cast("double").as("gain_sum"),
        round(col("_ls").cast("double"), 6).cast("double").as("loss_sum"),
        when(col("_ls").cast("double") > 0.0,
          round(col("_gs").cast("double") / col("_ls").cast("double"), 6))
          .cast("double").as("omega"))
      .orderBy("event_type")
  }

  /** Ulcer index + Martin ratio per type: RMS of the running-max
    * drawdown FRACTIONS (q_calmar's dd series) — depth × duration of
    * underwater stretches, where max-drawdown sees only the single
    * worst dip; Martin = annualized mean return over the 6-dp-frozen
    * index.
    */
  val qUlcer: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value"), 6).cast("decimal(38,6)"))
        .cast("double") / count(lit(1)).cast("double"), 6).as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("d")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withDd = daily
      .withColumn("_runmax", max(col("v")).over(wRun))
      .withColumn("_dd", when(col("_runmax") > 0.0,
        round(lit(1.0) - col("v") / col("_runmax"), 6)))
      .withColumn("_prev", lag(col("v"), 1).over(w))
      .withColumn("_r", when(col("_prev").isNotNull
        && col("_prev") =!= 0.0,
        round(col("v") / col("_prev") - 1.0, 6)))
    val agg = withDd.groupBy("event_type")
      .agg(sum(when(col("_dd").isNotNull, 1L).otherwise(0L)).as("n_days"),
        sum(round(col("_dd") * col("_dd"), 12).cast("decimal(38,12)"))
          .as("_sd2"),
        sum(when(col("_r").isNotNull, 1L).otherwise(0L)).as("_nr"),
        sum(col("_r").cast("decimal(38,6)")).as("_s1"))
    agg
      .withColumn("_ui", when(col("n_days") >= 1,
        round(sqrt(col("_sd2").cast("double")
          / col("n_days").cast("double")), 6)))
      .select(col("event_type"),
        col("n_days").cast("bigint").as("n_days"),
        col("_ui").cast("double").as("ulcer_index"),
        when(col("_ui") > 0.0 && col("_nr") >= 1,
          round(col("_s1").cast("double") / col("_nr").cast("double")
            * 252.0 / col("_ui"), 6))
          .cast("double").as("martin"))
      .orderBy("event_type")
  }

  /** Kelly criterion from the q_sharpe daily returns treated as
    * win/loss bets: f* = p − (1−p)/b with p the win share among
    * non-zero days and b the average-win/average-loss payoff — the
    * growth-optimal bet fraction; exact integer counts + decimal
    * partial-moment sums, p and b frozen at 12 dp before the tree.
    */
  val qKelly: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value"), 6).cast("decimal(38,6)"))
        .cast("double") / count(lit(1)).cast("double"), 6).as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("d")
    val rets = daily
      .withColumn("_prev", lag(col("v"), 1).over(w))
      .filter(col("_prev").isNotNull && col("_prev") =!= 0.0)
      .select(col("event_type"),
        round(col("v") / col("_prev") - 1.0, 6).as("_r"))
    val agg = rets.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("_r") > 0.0, 1L).otherwise(0L)).as("n_wins"),
        sum(when(col("_r") < 0.0, 1L).otherwise(0L)).as("n_losses"),
        sum(when(col("_r") > 0.0, col("_r")).otherwise(lit(0.0))
          .cast("decimal(38,6)")).as("_gs"),
        sum(when(col("_r") < 0.0, -col("_r")).otherwise(lit(0.0))
          .cast("decimal(38,6)")).as("_ls"))
    val ok = col("n_wins") >= 1 && col("n_losses") >= 1
    val p = round(col("n_wins").cast("double")
      / (col("n_wins") + col("n_losses")).cast("double"), 12)
    val b = round((col("_gs").cast("double")
      / col("n_wins").cast("double"))
      / (col("_ls").cast("double") / col("n_losses").cast("double")), 12)
    agg.select(col("event_type"),
        col("n_days").cast("bigint").as("n_days"),
        col("n_wins").cast("bigint").as("n_wins"),
        col("n_losses").cast("bigint").as("n_losses"),
        when(ok, round(p, 6)).cast("double").as("p_win"),
        when(ok, round(b, 6)).cast("double").as("payoff_b"),
        when(ok && b > 0.0,
          round(p - (lit(1.0) - p) / b, 6)).cast("double").as("kelly"))
      .orderBy("event_type")
  }

  /** Scott's π between the priority digit and the spend bucket (the
    * q_gwet_ac1 fixture): squared-averaged-marginal chance term —
    * the two-rater limit of Fleiss' κ.
    */
  val qScottPi: QueryFn = withTables { spark =>
    val rated = spark.table("orders")
      .select(substring(col("o_orderpriority"), 1, 1).as("a"),
        least(lit(5L), lit(1L) + floor(col("o_totalprice") / 100000.0)
          .cast("long")).cast("string").as("b"))
    Stats.scottPi(rated, "a", "b")
  }

  /** I-MR chart of daily spend per event type: individuals vs
    * x̄ ± 2.66·MR̄ bands, moving ranges vs 3.267·MR̄ — the SPC chart
    * for unsubgrouped KPI series.
    */
  val qImrChart: QueryFn = withTables { spark =>
    Resample.imrChart(spark.table("events"), "event_type", "ts",
        "value")
      .orderBy("event_type", "day")
  }

  /** Delta-method CI for revenue-per-event as a USER-clustered ratio
    * metric per event type: Σx/Σy over users with the one-pass
    * moment-identity variance — the A/B panel's ratio-metric member.
    */
  val qDeltaMethod: QueryFn = withTables { spark =>
    val ev = spark.table("events").withColumn("one", lit(1.0))
    Stats.deltaMethodRatio(ev, "event_type", "user_id", "value", "one")
      .orderBy("event_type")
  }


  /** Taguchi Cpm of event value against the q_cpk spec band [0, 800]
    * with target 100: the loss-function capability that punishes
    * off-target centering.
    */
  val qCpm: QueryFn = withTables { spark =>
    Stats.taguchiCpm(spark.table("events"), "event_type", "value",
        lsl = 0.0, usl = 800.0, target = 100.0)
      .orderBy("event_type")
  }

  /** Cochran's C variance-outlier screen across the five event
    * types' value variances: frozen per-group variances, explicit
    * smallest-label tie break on the argmax.
    */
  val qCochranC: QueryFn = withTables { spark =>
    Stats.cochranC(spark.table("events"), "event_type", "value")
  }

  /** Spend-concentration HHI per event type over users: exact
    * decimal-cents share algebra (shares never float), plus the
    * size-adjusted normalization.
    */
  val qHhi: QueryFn = withTables { spark =>
    Stats.herfindahl(spark.table("events"), "event_type", "user_id",
        "value")
      .orderBy("event_type")
  }

  /** u-chart of high-value events PER ACTIVE USER per day (defect =
    * value > 120, unit = user): unbounded-rate bands ū ± 3√(ū/n_d),
    * LCL clamped at 0 only.
    */
  val qUChart: QueryFn = withTables { spark =>
    Resample.uChart(spark.table("events"), "ts", "user_id",
        col("value") > 120.0)
      .orderBy("day")
  }

  /** Actuarial life table of the q_kaplan_meier subjects in 3-day
    * intervals: half-exposure censoring adjustment, 6-dp frozen
    * conditional q, the KM ln-fold survival.
    */
  val qLifeTable: QueryFn = withTables { spark =>
    val subjects = spark.table("events").groupBy("user_id")
      .agg(min(col("ts").cast("date")).as("_first"),
        max(col("ts").cast("date")).as("_last"),
        min(when(col("event_type") === "purchase",
          col("ts").cast("date"))).as("_firstp"))
      .select(col("user_id"),
        datediff(coalesce(col("_firstp"), col("_last")), col("_first"))
          .cast("bigint").as("duration"),
        col("_firstp").isNotNull.as("observed"))
    Stats.lifeTable(subjects, "duration", col("observed"), width = 3L)
      .orderBy("interval_start")
  }

  /** Lag-1 binary transfer entropy click→purchase on the daily spend
    * series: exact up/down state counts, window-summed marginals,
    * 12-dp frozen terms — the directional companion of q_xcorr.
    */
  val qTransferEntropy: QueryFn = withTables { spark =>
    Resample.transferEntropy(spark.table("events"), "event_type",
      "ts", "value", sourceKey = "click", targetKey = "purchase")
  }

  /** p-chart over daily high-value-event shares (defect = value >
    * 120): exact counts, 6-dp frozen center line, per-day clamped
    * 3σ binomial bands.
    */
  val qPChart: QueryFn = withTables { spark =>
    Resample.pChart(spark.table("events"), "ts", col("value") > 120.0)
      .orderBy("day")
  }

  /** Gwet's AC1 agreement between the ORDER PRIORITY digit and the
    * spend-derived priority bucket (1..5 by 100k steps): the
    * prevalence-stable chance correction over the union category
    * space.
    */
  val qGwetAc1: QueryFn = withTables { spark =>
    val rated = spark.table("orders")
      .select(substring(col("o_orderpriority"), 1, 1).as("a"),
        least(lit(5L), lit(1L) + floor(col("o_totalprice") / 100000.0)
          .cast("long")).cast("string").as("b"))
    Stats.gwetAc1(rated, "a", "b")
  }

  /** Bowker symmetry test on the same priority-vs-spend-bucket
    * confusion: directional misclassification asymmetry, exact
    * off-diagonal pair folds.
    */
  val qBowker: QueryFn = withTables { spark =>
    val rated = spark.table("orders")
      .select(substring(col("o_orderpriority"), 1, 1).as("a"),
        least(lit(5L), lit(1L) + floor(col("o_totalprice") / 100000.0)
          .cast("long")).cast("string").as("b"))
    Stats.bowkerTest(rated, "a", "b")
  }

  /** KPSS level-stationarity test on daily spend per type (lags 3,
    * Bartlett kernel): the ADF complement — exact decimal cumsums and
    * co-moments, pinned 0.463 critical value.
    */
  val qKpss: QueryFn = withTables { spark =>
    Resample.kpss(spark.table("events"), "event_type", "ts", "value",
        lags = 3)
      .orderBy("event_type")
  }

  /** Lo–MacKinlay variance ratio at q = 5 on daily-spend first
    * differences per type: overlapping 5-day sums, exact decimal
    * moments, the homoscedastic z.
    */
  val qVarianceRatio: QueryFn = withTables { spark =>
    Resample.varianceRatio(spark.table("events"), "event_type", "ts",
        "value", q = 5)
      .orderBy("event_type")
  }

  /** Wallis–Moore turning-points randomness gate on the daily spend
    * series per type: exact strict peak/trough counts, closed-form
    * moments, one rounded z.
    */
  val qTurningPoints: QueryFn = withTables { spark =>
    Resample.turningPoints(spark.table("events"), "event_type", "ts",
        "value")
      .orderBy("event_type")
  }

  /** Cox–Stuart paired-halves sign test for monotone trend on the
    * daily spend series per type.
    */
  val qCoxStuart: QueryFn = withTables { spark =>
    Resample.coxStuart(spark.table("events"), "event_type", "ts",
        "value")
      .orderBy("event_type")
  }

  /** Two-level binary segmentation of daily spend vs day index per
    * type: the q_breakpoint split, then the best split of EACH
    * resulting segment from the same prefix sums — the changepoint
    * hierarchy at the judged fixed depth.
    */
  val qBinseg: QueryFn = withTables { spark =>
    val pts = spark.table("events")
      .withColumn("dayx",
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .cast("double"))
    Stats.binarySegmentation(pts, "event_type", "dayx", "value",
        bins = 16)
      .orderBy("event_type", "segment")
  }

  /** Effective sample size of the daily spend series per event type
    * under its lag-1..3 autocorrelation: the q_acf machinery, rounded
    * acf values summed as exact scaled longs, one rounded division.
    */
  val qEss: QueryFn = withTables { spark =>
    Resample.effectiveSampleSize(spark.table("events"), "event_type",
        "ts", "value", maxLag = 3)
      .orderBy("event_type")
  }

  /** Misra-Gries heavy hitters of lang per source, capacity 16: the
    * judged slice runs in the sketch's EXACT regime (7 langs < 16 —
    * no decrement can fire anywhere), so the oracle is a plain GROUP
    * BY; the map-side-bounded shuffle shape is what's being judged.
    */
  val qHeavyHitters: QueryFn = withTables { spark =>
    val hh = spark.table("documents")
      .groupBy(col("source"))
      .agg(graft.functions.FrequentItemsAgg
        .frequentItems(col("lang"), 16).as("_hh"))
    hh.select(col("source"), posexplode(col("_hh")).as(Seq("_p", "_e")))
      .select(col("source"), col("_e.item").as("lang"),
        (col("_p") + 1).cast("bigint").as("rank"), col("_e.n").as("n"))
      .orderBy("source", "rank")
  }

  /** OLS of daily spend (integer cents) on the day index per event
    * type, with R²: six decimal moment sums into identically-spelled
    * slope/intercept/R² trees.
    */
  val qLinFit: QueryFn = withTables { spark =>
    val cells = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      .select(col("event_type"),
        datediff(col("d"), lit("2024-01-01").cast("date")).as("x"),
        col("y"))
    Stats.linearFit(cells, "event_type", "x", "y").orderBy("event_type")
  }

  /** Multi-covariate OLS: l_extendedprice on (l_quantity, l_discount)
    * per return flag — β, se(β), t, R² from ten decimal(38,0) Gram
    * moments and one closed-form 2×2 Cramer solve. The quantity
    * coefficient is the real signal (extendedprice ≈ qty × unit
    * price); discount is noise, so its t hovers near zero — both the
    * strong- and null-effect se/t paths are exercised.
    */
  val qOlsMulti: QueryFn = withTables { spark =>
    Stats.linearFitMulti(spark.table("lineitem"), "l_returnflag",
        Seq("l_quantity", "l_discount"), "l_extendedprice")
      .orderBy("l_returnflag")
  }

  /** Distribution-free median CI of event value per type: counting-
    * selected order statistics (x_(k), x_(n+1-k)) with the pinned-z
    * rank bound, plus the exact lower median.
    */
  val qMedianCi: QueryFn = withTables { spark =>
    Stats.medianCI(spark.table("events"), "event_type", "value")
      .orderBy("event_type")
  }

  /** Minimum detectable effect of event value per type at α = 0.05,
    * power 0.8 — the experiment-sizing number computed before any
    * A/B read: exact decimal moments, pinned z constants, one MDE
    * tree.
    */
  val qMde: QueryFn = withTables { spark =>
    Stats.minDetectableEffect(spark.table("events"), "event_type",
        "value")
      .orderBy("event_type")
  }

  /** Price elasticity of demand — the log-log regression pattern:
    * slope of ln(quantity) on ln(unit price) per return flag IS the
    * elasticity (% quantity change per % price change); reuses the
    * linearFit decimal-moment machinery on ln-transformed points
    * (identical libm doubles on both engines, then the 1e6 freeze).
    */
  val qElasticity: QueryFn = withTables { spark =>
    val pts = spark.table("lineitem")
      .filter(col("l_quantity") > 0 && col("l_extendedprice") > 0)
      .select(col("l_returnflag"),
        log(col("l_extendedprice") / col("l_quantity")).as("ln_price"),
        log(col("l_quantity")).as("ln_qty"))
    Stats.linearFit(pts, "l_returnflag", "ln_price", "ln_qty")
      .withColumnRenamed("slope", "elasticity")
      .orderBy("l_returnflag")
  }

  /** Weighted least squares: extendedprice on quantity per return
    * flag, rows weighted by (1 − discount) — seven HUGEINT weighted
    * moments (triple products for wx², wy², wxy), the linearFit trees
    * with Σw in n's place.
    */
  val qWls: QueryFn = withTables { spark =>
    val li = spark.table("lineitem")
      .withColumn("w", lit(1.0) - col("l_discount"))
    Stats.weightedLinearFit(li, "l_returnflag", "l_quantity",
        "l_extendedprice", "w")
      .orderBy("l_returnflag")
  }

  /** Standardized ridge at λ = 0.5 on the q_ols_multi design — the
    * same ten Gram moments with the covariate variances inflated by
    * (1 + λ); coefficients shrink toward 0 vs the OLS twin.
    */
  val qRidge: QueryFn = withTables { spark =>
    Stats.ridgeFit(spark.table("lineitem"), "l_returnflag",
        Seq("l_quantity", "l_discount"), "l_extendedprice", lambda = 0.5)
      .orderBy("l_returnflag")
  }

  /** The p = 3 tier: + l_tax as the third covariate — fifteen Gram
    * moments, the 3×3 centered Cramer determinants and adjugate
    * diagonals as writable float trees (the closed-form family's
    * judged ceiling).
    */
  val qOlsMulti3: QueryFn = withTables { spark =>
    Stats.linearFitMulti3(spark.table("lineitem"), "l_returnflag",
        Seq("l_quantity", "l_discount", "l_tax"), "l_extendedprice")
      .orderBy("l_returnflag")
  }

  /** Logistic regression of purchase-vs-rest on scaled event value
    * per user-cohort: 3 FIXED Newton iterations from (0,0), 12-dp
    * frozen gradient/Hessian terms in decimal sums, the closed 2×2
    * solve — the coxPH determinism contract on the classification
    * side. The oracle unrolls the identical iterations.
    */
  val qLogistic: QueryFn = withTables { spark =>
    val ev = spark.table("events")
      .select(pmod(col("user_id"), lit(3)).cast("int").as("cohort"),
        (col("value") / 100.0).as("x"),
        (col("event_type") === "purchase").as("is_purchase"))
    Stats.logisticFit(ev, "cohort", "x", col("is_purchase"), iters = 3)
      .orderBy("cohort")
  }

  /** ICC(1,1) of daily dollar spend with DAYS as subjects and the five
    * event types as the k measurements (complete panels only): how
    * much of the daily-spend variance is the day itself vs the type —
    * the continuous-measurement member of the agreement tier.
    */
  val qIcc: QueryFn = withTables { spark =>
    Stats.icc(dayCellsN(spark), "x", "y", k = 5)
  }

  /** Gamma GLM (log link) of positive event value on scaled
    * hour-of-day per event type: 2 fixed IRLS passes, each ONE OLS
    * solve on the working response (constant weights under the log
    * link) — the spend/latency error model completing the GLM family.
    */
  val qGamma: QueryFn = withTables { spark =>
    val ev = spark.table("events").filter(col("value") > 0.0)
      .select(col("event_type"), col("value"),
        (hour(col("ts")) / 10.0).as("x"))
    Stats.gammaFit(ev, "event_type", "x", "value", iters = 2)
      .orderBy("event_type")
  }

  /** Propensity-stratified ATE of odd-cohort "treatment" on event
    * value with hour-of-day as the confounder: logistic propensity
    * (2 Newton steps), 5 equal-width score strata, size-weighted
    * within-stratum differences — the observational-causal estimator
    * beside q_cuped/q_did.
    */
  val qPsmAte: QueryFn = withTables { spark =>
    // treatment probability rises with hour (user_id % 24 < hour), so
    // the propensity genuinely varies and the strata spread
    val ev = spark.table("events")
      .select((col("user_id") % 24 < hour(col("ts"))).as("treated"),
        col("value"), hour(col("ts")).cast("double").as("hod"))
    Stats.propensityStratifiedAte(ev, col("treated"), "value", "hod",
        nStrata = 5, iters = 2)
      .orderBy("stratum")
  }

  /** One-vs-rest multiclass logistic over the five event types on
    * scaled value: the k = 5 binary purchase-style fits in one
    * per-iteration aggregate (2 FIXED Newton steps each), reported
    * per class — the multiclass linear classifier beside
    * q_naive_bayes. The oracle replicates rows per class and unrolls
    * the identical iterations.
    */
  val qLogisticMulti: QueryFn = withTables { spark =>
    val ev = spark.table("events")
      .select(col("event_type"), (col("value") / 100.0).as("x"))
    Stats.logisticMulti(ev, "event_type", "x", iters = 2)
      .orderBy("class")
  }

  /** Two-covariate logistic regression of purchase-vs-rest on scaled
    * value and hour-of-day per user cohort: 3 FIXED Newton iterations,
    * each a 3×3 Cramer solve on the frozen-weight Hessian — the
    * multivariate tier of q_logistic.
    */
  val qLogistic2: QueryFn = withTables { spark =>
    val ev = spark.table("events")
      .select(pmod(col("user_id"), lit(3)).cast("int").as("cohort"),
        (col("value") / 100.0).as("x1"),
        (hour(col("ts")) / 10.0).as("x2"),
        (col("event_type") === "purchase").as("is_purchase"))
    Stats.logisticFit2(ev, "cohort", "x1", "x2", col("is_purchase"),
        iters = 3)
      .orderBy("cohort")
  }

  /** Poisson regression of daily event counts on the scaled day
    * index per event type — the GLM trio's count member: 3 FIXED
    * Newton iterations from the Laplace-smoothed log-mean, 12-dp
    * frozen μ-weighted gradient/Hessian terms, the same closed 2×2
    * solve as q_logistic; e^β is the per-decade-of-days rate ratio.
    */
  val qPoisson: QueryFn = withTables { spark =>
    val cells = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).cast("double").as("y"))
      .select(col("event_type"),
        (datediff(col("d"), lit("2024-01-01").cast("date")) / 10.0)
          .as("x"),
        col("y"))
    Stats.poissonFit(cells, "event_type", "x", "y", iters = 3)
      .orderBy("event_type")
  }

  /** Top-10 most influential daily-spend cells of each type's trend
    * fit by Cook's distance — leverage, studentized residual, D — the
    * influence member of the regression-diagnostics suite.
    */
  val qInfluence: QueryFn = withTables { spark =>
    val cells = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      .select(col("event_type"),
        datediff(col("d"), lit("2024-01-01").cast("date")).as("x"),
        col("y"))
    Stats.regressionInfluence(cells, "event_type", "x", "y", topK = 10)
  }

  /** Chow structural-break test of the daily-spend regression at day
    * 30 per event type: twelve side-conditional decimal moments, three
    * dickeyFuller SSE trees, one F.
    */
  val qChow: QueryFn = withTables { spark =>
    val cells = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      .select(col("event_type"),
        datediff(col("d"), lit("2024-01-01").cast("date")).as("x"),
        col("y"))
    Stats.chowTest(cells, "event_type", "x", "y", breakX = 30.0)
      .orderBy("event_type")
  }

  /** Breusch–Pagan (Koenker) heteroscedasticity test on the
    * q_lin_fit daily-spend cells: the q_durbin_watson residuals,
    * squared + 6-dp frozen, refit on the day index; BP = n·R²_aux.
    */
  val qBreuschPagan: QueryFn = withTables { spark =>
    val cells = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      .select(col("event_type"),
        datediff(col("d"), lit("2024-01-01").cast("date")).as("x"),
        col("y"))
    Stats.breuschPagan(cells, "event_type", "x", "y")
      .orderBy("event_type")
  }

  /** Goldfeld–Quandt split-sample heteroscedasticity test on the
    * q_breusch_pagan cells: tail SSE ratio with the middle 20%
    * dropped — shape-free where BP assumes linear variance.
    */
  val qGoldfeldQuandt: QueryFn = withTables { spark =>
    val cells = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      .select(col("event_type"),
        datediff(col("d"), lit("2024-01-01").cast("date")).as("x"),
        col("y"))
    Stats.goldfeldQuandt(cells, "event_type", "x", "y", dropFrac = 0.2)
      .orderBy("event_type")
  }

  /** Breusch–Godfrey LM serial-correlation test on the same cells:
    * the auxiliary e on (x, e_lag) fit — valid where the e-on-e_lag
    * shortcut is biased by autocorrelated x.
    */
  val qBreuschGodfrey: QueryFn = withTables { spark =>
    val cells = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      .select(col("event_type"),
        datediff(col("d"), lit("2024-01-01").cast("date")).as("x"),
        col("y"))
    Stats.breuschGodfrey(cells, "event_type", "x", "y")
      .orderBy("event_type")
  }

  /** Two-cohort log-rank on time-to-first-purchase (the
    * q_kaplan_meier subjects split by user parity): grid at-risk
    * counts, 12-dp decimal E/V term sums, one z tree.
    */
  val qLogRank: QueryFn = withTables { spark =>
    val subjects = spark.table("events").groupBy("user_id")
      .agg(min(col("ts").cast("date")).as("_first"),
        max(col("ts").cast("date")).as("_last"),
        min(when(col("event_type") === "purchase",
          col("ts").cast("date"))).as("_firstp"))
      .select(pmod(col("user_id"), lit(2)).cast("int").as("cohort"),
        datediff(coalesce(col("_firstp"), col("_last")), col("_first"))
          .cast("bigint").as("duration"),
        col("_firstp").isNotNull.as("observed"))
    Stats.logRank(subjects, "cohort", "duration", col("observed"))
      .orderBy("cohort")
  }

  /** PACF at lags 1..3 of the daily spend series per event type:
    * the q_acf values through the closed-form Durbin-Levinson unroll.
    */
  val qPacf: QueryFn = withTables { spark =>
    Stats.pacf(spark.table("events"), "event_type", "ts", "value")
      .orderBy("event_type", "lag")
  }

  /** Split-conformal 90% quantile of value per event type: counting
    * order statistic over (group, value) cells, identically-spelled
    * ceil for k.
    */
  val qConformal: QueryFn = withTables { spark =>
    Stats.conformalQuantile(spark.table("events"), "event_type", "value",
        alpha = 0.1)
      .orderBy("event_type")
  }

  /** Cochran-Armitage trend of the high-value (>100) rate across
    * calendar weeks per event type: exact decimal bucket sums into
    * one z tree.
    */
  val qTrendTest: QueryFn = withTables { spark =>
    val e = spark.table("events")
    val epoch = unix_timestamp(col("ts"))
    val week = ((epoch - pmod(epoch, lit(604800L))) / lit(604800L))
      .cast("long")
    Stats.cochranArmitage(e, "event_type", week, col("value") > 100)
      .orderBy("event_type")
  }

  /** Isotonic (PAV) calibration of P(lang = en) against doc length
    * per source: 12 frozen equi-width bins, minimax closed form over
    * bins-cubed cell triples, 6-dp rates selected before min/max.
    */
  val qIsotonic: QueryFn = withTables { spark =>
    Stats.isotonicCalibration(spark.table("documents"), "source",
        "n_chars", col("lang") === "en", bins = 12)
      .orderBy("source", "bin")
  }

  /** Cohen's d of value per event type vs the pooled rest: exact
    * decimal moments into one identically-spelled float tree.
    */
  val qCohensD: QueryFn = withTables { spark =>
    Stats.cohensD(spark.table("events"), "event_type", "value")
      .orderBy("event_type")
  }

  /** Burstiness (Fano factor) of daily event counts per event type:
    * exact decimal moments, one rounded division.
    */
  val qFano: QueryFn = withTables { spark =>
    Resample.fanoFactor(spark.table("events"), "event_type", "ts")
      .orderBy("event_type")
  }

  /** Per-user behavioral perplexity under the corpus's own Markov
    * transition model: quantized-log exact sums, one rounded exp.
    */
  val qMarkovPerplexity: QueryFn = withTables { spark =>
    Resample.markovPerplexity(spark.table("events"), "user_id", "ts",
        "event_id", "event_type")
      .orderBy("user_id")
  }

  /** Best decision-stump split of doc length against the is-English
    * label per source: exact integer class prefixes, one
    * identically-spelled Gini float tree, (gain DESC, threshold ASC)
    * argmax.
    */
  val qBestSplit: QueryFn = withTables { spark =>
    Stats.bestSplit(spark.table("documents"), "source", "n_chars",
        col("lang") === "en")
      .orderBy("source")
  }

  /** Lead/lag cross-correlation between event types' daily series at
    * lags 0..2: calendar-aligned strict inner join, exact decimal
    * Pearson moments, one rounded division with IEEE sqrt.
    */
  val qXcorr: QueryFn = withTables { spark =>
    Resample.crossCorrelation(spark.table("events"), "event_type", "ts",
        "value", maxLag = 2)
      .orderBy("group_a", "group_b", "lag")
  }

  /** Decile-by-decile drift of value between the first and second
    * half-month per event type: pure order statistics at explicit
    * integer ranks, one rounded subtraction.
    */
  val qQqDrift: QueryFn = withTables { spark =>
    Stats.qqDrift(spark.table("events"), "event_type", "value",
        col("ts") >= lit("2024-01-16").cast("timestamp"), nQuantiles = 10)
      .orderBy("event_type", "quantile")
  }

  /** 10%-trimmed mean of value per event type: deterministic
    * sorted-multiset trim, exact scaled-integer mean.
    */
  val qTrimmedMean: QueryFn = withTables { spark =>
    Stats.trimmedMean(spark.table("events"), "event_type", "value",
        trim = 0.1)
      .orderBy("event_type")
  }

  /** Part co-purchase projection of lineitem with the skew cap:
    * exact integer co-order weights, hot orders (> 8 parts) dropped
    * deterministically by degree before the self-join.
    */
  val qBipartite: QueryFn = withTables { spark =>
    Graph.bipartiteProject(spark.table("lineitem"), "l_orderkey",
        "l_partkey", maxPerLeft = 8)
      .orderBy("a", "b")
  }

  /** Adamic–Adar link prediction on the co-order part graph: top-20
    * not-yet-linked pairs by hub-discounted common neighbors, hub
    * middles (> 50 neighbors) dropped by exact degree.
    */
  val qLinkPred: QueryFn = withTablesSf { (spark, sfDir) =>
    Graph.linkPrediction(GraphOps.coOrderParts(spark, sfDir, 7), "a", "b",
        maxMiddleDegree = 50, k = 20)
      .orderBy(col("adamic_adar").desc, col("a"), col("b"))
  }

  /** Jaccard link prediction on the q_link_pred candidates: the
    * neighbor-overlap score common/(deg a + deg b − common) — exact
    * integers into one rounded division, same degree cap, anti-join,
    * and (score DESC, a, b) top-20.
    */
  val qLinkPredJaccard: QueryFn = withTablesSf { (spark, sfDir) =>
    Graph.linkPredictionJaccard(GraphOps.coOrderParts(spark, sfDir, 7),
        "a", "b", maxMiddleDegree = 50, k = 20)
      .orderBy(col("jaccard").desc, col("a"), col("b"))
  }

  /** Functional-dependency audit source → lang on documents: exact
    * integer group/violation counts, one rounded rate.
    */
  val qFdCheck: QueryFn = withTables { spark =>
    Profiling.functionalDependency(spark.table("documents"),
        Seq("source"), "lang")
  }

  /** Pairwise Jensen–Shannon divergence between source unigram
    * distributions — symmetric, bounded, defined for disjoint
    * vocabularies; shared ln 2 literal.
    */
  val qJsd: QueryFn = withTables { spark =>
    TextAnalysis.jsDivergence(spark.table("documents"), "source", "text")
      .orderBy("g1", "g2")
  }

  /** Top-20 trending tokens between the even-doc and odd-doc halves:
    * exact add-one-smoothed growth cross-ratios, (score, token)
    * total-order ranking.
    */
  val qTrending: QueryFn = withTables { spark =>
    TextAnalysis.trendingTokens(spark.table("documents"), "text",
        col("doc_id") % 2 === 1, k = 20)
      .orderBy(col("score").desc, col("token"))
  }

  /** One-way ANOVA F across all five event types: exact decimal
    * moments, 12-dp-frozen between-group terms, one float tree.
    */
  val qAnova: QueryFn = withTables { spark =>
    graft.operators.Stats.anovaF(spark.table("events"),
      "event_type", "value")
  }

  /** Brown–Forsythe (median-centered Levene) variance-homogeneity
    * test: the q_robust_outliers lower-median per group feeds exact
    * integer |x − med| deviations into the shared ANOVA fold.
    */
  val qLevene: QueryFn = withTables { spark =>
    graft.operators.Stats.brownForsythe(spark.table("events"),
      "event_type", "value")
  }

  /** Durbin–Watson serial-correlation diagnostic on the q_lin_fit
    * daily-cell series: residuals from the same exact-moment OLS,
    * 6-dp-rounded, squared-term sums frozen at 12 dp.
    */
  val qDurbinWatson: QueryFn = withTables { spark =>
    val cells = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      .select(col("event_type"),
        datediff(col("d"), lit("2024-01-01").cast("date")).as("x"),
        col("y"))
    graft.operators.Stats.durbinWatson(cells, "event_type", "x", "y")
      .orderBy("event_type")
  }

  /** Grubbs single-outlier screen per event type: G = max |x−mean|/s
    * with the suspect value, arg-max deterministic via (z, x)
    * lexicographic order.
    */
  val qGrubbs: QueryFn = withTables { spark =>
    graft.operators.Stats.grubbs(spark.table("events"),
        "event_type", "value")
      .orderBy("event_type")
  }

  /** Welch's unequal-variance t of each event type's value against
    * the pooled rest: exact decimal moments per side, t and the
    * Welch–Satterthwaite dof as identically-spelled float trees.
    */
  /** Student's pooled-variance t of each event type vs the rest —
    * the equal-variance classical t beside q_welch_t; exact-integer
    * dof n − 2.
    */
  val qStudentT: QueryFn = withTables { spark =>
    graft.operators.Stats.studentT(spark.table("events"),
        "event_type", "value")
      .orderBy("event_type")
  }

  val qWelchT: QueryFn = withTables { spark =>
    graft.operators.Stats.welchT(spark.table("events"),
        "event_type", "value")
      .orderBy("event_type")
  }

  /** Huber robust mean of event value per type: exact median/MAD seed,
    * 2 fixed IRLS passes with 12-dp-frozen weights at k = 1.345 —
    * between the median's breakdown and the mean's efficiency.
    */
  val qHuber: QueryFn = withTables { spark =>
    graft.operators.Stats.huberMean(spark.table("events"),
        "event_type", "value", k = 1.345, iters = 2)
      .orderBy("event_type")
  }

  /** AR(1) one-step forecast with a 95% prediction interval on the
    * daily series: band from the innovation variance γ0(1−φ²) over
    * exact decimal moments — the uncertainty the point forecasters
    * omit.
    */
  val qForecastInterval: QueryFn = withTables { spark =>
    Resample.arForecastInterval(spark.table("events"), "event_type",
        "ts", "value", z = 1.96)
      .orderBy("event_type")
  }

  /** TOST equivalence of each event type's mean value vs the pooled
    * rest at ±100 margin: both one-sided Welch t's vs 1.645, the
    * "same within a margin" gate a plain difference test can't give.
    */
  val qTost: QueryFn = withTables { spark =>
    graft.operators.Stats.tostEquivalence(spark.table("events"),
        "event_type", "value", margin = 100.0, tCrit = 1.645)
      .orderBy("event_type")
  }

  /** Bartlett's variance-homogeneity K² across all five event types:
    * the parametric dual of q_levene — 12-dp-frozen ln terms, scale
    * offsets cancelling between pooled and per-group logs.
    */
  val qBartlett: QueryFn = withTables { spark =>
    graft.operators.Stats.bartlett(spark.table("events"),
      "event_type", "value")
  }

  /** Mood's median test: k×2 above/below-grand-median counts into
    * the chiSquared fold; the grand lower median comes off the
    * (group × value) grid with no global sort.
    */
  val qMoodMedian: QueryFn = withTables { spark =>
    graft.operators.Stats.moodMedian(spark.table("events"),
      "event_type", "value")
  }

  /** Tukey–Kramer HSD pairwise panel over the five event types: the
    * q_anova MSW under every pairwise studentized range statistic.
    */
  val qTukeyHsd: QueryFn = withTables { spark =>
    graft.operators.Stats.tukeyHsd(spark.table("events"),
        "event_type", "value")
      .orderBy("group_a", "group_b")
  }

  /** Daily cents-spend cells per event type — the shared series for
    * the decomposition / forecast-accuracy pair (the q_lin_fit cells).
    */
  private def dayCells(spark: org.apache.spark.sql.SparkSession) =
    spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      .select(col("event_type"),
        datediff(col("d"), lit("2024-01-01").cast("date")).as("x"),
        col("y"))

  /** Classical additive decomposition of daily spend per event type,
    * weekly period: centered 7-day MA trend, zero-sum day-of-week
    * seasonal profile, residual — all 6-dp frozen with decimal sums.
    */
  val qDecompose: QueryFn = withTables { spark =>
    Resample.decomposeAdditive(dayCells(spark), "event_type", "x", "y",
        period = 7)
      .orderBy("event_type", "x")
  }

  /** Seasonal-naive forecast accuracy (MAE / sMAPE / MASE) of the
    * same daily cells at season 7 — exact integer errors, 12-dp
    * frozen sMAPE terms, MASE as one exact cross-ratio.
    */
  val qForecastAcc: QueryFn = withTables { spark =>
    Resample.forecastAccuracy(dayCells(spark), "event_type", "x", "y",
        season = 7)
      .orderBy("event_type")
  }

  /** G-test (likelihood-ratio χ²) of lang × source independence on
    * documents: the information-theoretic twin of q_chi_squared —
    * exact integer cells, 12-dp-frozen ln terms, one doubled fold.
    */
  val qGTest: QueryFn = withTables { spark =>
    Stats.gTest(spark.table("documents"), "lang", "source")
  }

  /** Binned two-sample Anderson–Darling of value per event type vs
    * the pooled rest: the q_cvm_binned cells with the H(1−H) tail
    * weighting — the extremes-sensitive member of the EDF trio.
    */
  val qAdBinned: QueryFn = withTables { spark =>
    Stats.adBinned(spark.table("events"), "event_type", "value", bins = 16)
      .orderBy("event_type")
  }

  /** Daily cells in DOLLARS with event counts — the (x, y, n) panel
    * for the self-centering drift / confound / reliability quartet.
    */
  private def dayCellsN(spark: org.apache.spark.sql.SparkSession) =
    spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("_cents"),
        count(lit(1)).as("n"))
      .select(col("event_type"),
        datediff(col("d"), lit("2024-01-01").cast("date")).as("x"),
        (col("_cents") / 100.0).as("y"), col("n"))

  /** Page–Hinkley self-centering drift detector over daily dollar
    * spend per event type (δ=0, λ=2000): decimal-exact cumulative
    * deviations, running-min excursion, first alarm day.
    */
  val qPageHinkley: QueryFn = withTables { spark =>
    Stats.pageHinkley(dayCellsN(spark), "event_type", "x", "y",
        delta = 0.0, lambda = 2000.0)
      .orderBy("event_type")
  }

  /** Partial correlation of daily spend and event count controlling
    * for the day index, per event type: "do spend and volume move
    * together beyond both trending with time".
    */
  val qPartialCorr: QueryFn = withTables { spark =>
    Stats.partialCorr(dayCellsN(spark), "event_type", "x", "y", "n")
      .orderBy("event_type")
  }

  /** Cronbach's alpha of the five event types' daily spend series as
    * parallel items over day blocks: complete-case blocks, exact
    * decimal moments, 12-dp-frozen per-item variances.
    */
  val qCronbach: QueryFn = withTables { spark =>
    Stats.cronbachAlpha(dayCellsN(spark), "x", "event_type", "y")
  }

  /** Mantel–Haenszel stratified 2×2: does user parity move the
    * high-value rate after holding event type constant — common odds
    * ratio + uncorrected CMH χ² from 12-dp-frozen stratum terms.
    */
  val qMantelHaenszel: QueryFn = withTables { spark =>
    val e = spark.table("events")
      .withColumn("exposed", col("user_id") % 2 === 0)
      .withColumn("hi", col("value") > 50.0)
    Stats.mantelHaenszel(e, "event_type", "exposed", "hi")
  }

  /** Friedman test of the five event types across matched day blocks
    * on daily dollar spend: within-block doubled mid-ranks, exact
    * decimal rank-sum squares, the classic uncorrected χ²_F.
    */
  val qFriedman: QueryFn = withTables { spark =>
    Stats.friedman(dayCellsN(spark), "x", "event_type", "y")
  }

  /** Quade test over the q_friedman blocks: within-block ranks
    * weighted by the cross-block rank of each block's raw range —
    * exact 4S integers, one rounded F tree.
    */
  val qQuade: QueryFn = withTables { spark =>
    Stats.quadeTest(dayCellsN(spark), "x", "event_type", "y")
  }

  /** Ansari–Bradley rank-dispersion test of each event type's values
    * vs the pooled rest: both-ends doubled scores, exact realized-
    * score finite-population moments.
    */
  val qAnsariBradley: QueryFn = withTables { spark =>
    Stats.ansariBradley(spark.table("events"), "event_type", "value")
      .orderBy("event_type")
  }

  /** Diebold–Mariano equal-accuracy test (lags 2) of the lag-1 naive
    * vs trailing-3-day-mean forecasts of daily spend per type: the
    * KPSS a-unit cancellation carries the whole statistic on exact
    * decimal folds.
    */
  val qDieboldMariano: QueryFn = withTables { spark =>
    Resample.dieboldMariano(spark.table("events"), "event_type", "ts",
        "value", lags = 2)
      .orderBy("event_type")
  }

  /** Permutation entropy (m = 3) of the daily spend series per type:
    * exact ordinal-pattern counts, the entropy-precedent ln terms,
    * normalized by ln 6.
    */
  val qPermEntropy: QueryFn = withTables { spark =>
    Resample.permutationEntropy(spark.table("events"), "event_type",
        "ts", "value")
      .orderBy("event_type")
  }

  /** Theil's U2 forecast-quality ratio per type: in-sample one-step
    * Holt errors over naive lag-1 errors — U2 < 1 means the smoother
    * actually earns its keep; 6-dp frozen states and errors, exact
    * decimal squared folds.
    */
  val qTheilU2: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value") * 1e6).cast("bigint")) / 1e6, 6)
        .cast("double").as("x"))
    val sm = Resample.holt(daily, "event_type", Seq("d"), "x",
      alpha = 0.3, beta = 0.2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("d")
    val scored = sm
      .withColumn("_fl", lag(col("level"), 1).over(w))
      .withColumn("_ft", lag(col("trend"), 1).over(w))
      .withColumn("_px", lag(col("x"), 1).over(w))
      .filter(col("_fl").isNotNull && col("_px").isNotNull)
      .withColumn("_em",
        round(col("x") - round(col("_fl") + col("_ft"), 6), 6))
      .withColumn("_en", round(col("x") - col("_px"), 6))
    val agg = scored.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(round(col("_em") * col("_em"), 12).cast("decimal(38,12)"))
          .as("_sm"),
        sum(round(col("_en") * col("_en"), 12).cast("decimal(38,12)"))
          .as("_sn"))
    agg.select(col("event_type"),
        col("n_days").cast("bigint").as("n_days"),
        when(col("_sn").cast("double") > 0.0,
          round(sqrt(col("_sm").cast("double")
            / col("_sn").cast("double")), 6))
          .cast("double").as("u2"))
      .orderBy("event_type")
  }

  /** Neyman allocation of a 1000-row budget across event types on
    * value variability: n_h ∝ N_h·S_h — the variance-minimizing
    * stratified design, frozen sd/share trees.
    */
  val qNeyman: QueryFn = withTables { spark =>
    graft.operators.Sampling.neymanAllocation(spark.table("events"),
        "event_type", "value", budget = 1000)
      .orderBy("event_type")
  }

  /** Kish design effect of the q_ipf_rake weights: deff = n·Σw²/
    * (Σw)² — what the raking balance cost in effective sample.
    */
  val qDesignEffect: QueryFn = withTables { spark =>
    graft.operators.Sampling.designEffect(
      graft.operators.Sampling.rakeWeights(spark.table("documents"),
        "lang", "source", iters = 2), "n", "weight")
  }

  /** Mood squared-rank dispersion test of each event type's values
    * vs the pooled rest: center-out quadratic scores on the doubled
    * machinery, exact realized-score moments.
    */
  val qMoodDispersion: QueryFn = withTables { spark =>
    Stats.moodDispersion(spark.table("events"), "event_type", "value")
      .orderBy("event_type")
  }

  /** Lepage location-scale omnibus per event type vs the rest:
    * L = z_W² + z_AB² from the frozen component z's — the drift
    * gate when neither a pure shift nor a pure spread is the known
    * alternative.
    */
  val qLepage: QueryFn = withTables { spark =>
    Stats.lepage(spark.table("events"), "event_type", "value")
      .orderBy("event_type")
  }

  /** Trigg tracking signal (α=0.3, β=0.2) on daily spend per type:
    * the forecast-drift alarm — smoothed-error/MAD against the
    * classic 0.51 threshold, 6-dp frozen state machine.
    */
  val qTrigg: QueryFn = withTables { spark =>
    Resample.triggTrackingSignal(spark.table("events"), "event_type",
        "ts", "value", alpha = 0.3, beta = 0.2)
      .orderBy("event_type", "day")
  }

  /** GM(1,1) grey forecast (h = 1..3) of daily spend per type: the
    * small-sample exponential forecaster — closed-form LS on the
    * accumulated series, frozen params inside the EXP tree.
    */
  val qGrey: QueryFn = withTables { spark =>
    Resample.greyForecast(spark.table("events"), "event_type", "ts",
        "value", horizon = 3)
      .orderBy("event_type", "h")
  }

  /** Deming regression (λ = 1, orthogonal) of the rounded-dollar
    * reading on the raw value per event type — the q_bland_altman
    * pair's calibration line with both axes noisy; closed-form slope
    * from exact decimal moments.
    */
  val qDeming: QueryFn = withTables { spark =>
    Stats.demingRegression(
        spark.table("events").withColumn("rounded",
          round(col("value"), 0)),
        "event_type", "value", "rounded", lambda = 1.0)
      .orderBy("event_type")
  }

  /** Breslow–Day homogeneity of the q_mantel_haenszel stratified
    * odds ratios: does the pooled or_mh average genuinely different
    * per-stratum effects? Frozen ψ̂, interval-selected quadratic
    * roots, 12-dp term fold.
    */
  val qBreslowDay: QueryFn = withTables { spark =>
    val e = spark.table("events")
      .withColumn("exposed", col("user_id") % 2 === 0)
      .withColumn("hi", col("value") > 50.0)
    Stats.breslowDay(e, "event_type", "exposed", "hi")
  }

  /** Generalized ESD (k = 3) outlier screen of event values per
    * type: iterated Grubbs on (value, count) cells with the
    * filter-on-frozen-max winner pass and one-occurrence decrements.
    */
  val qGesd: QueryFn = withTables { spark =>
    Stats.gesd(spark.table("events"), "event_type", "value", k = 3)
      .orderBy("event_type", "pass")
  }

  /** Normalized spectral entropy of the q_periodogram powers per
    * type: how concentrated is the daily series' energy across the
    * candidate periods — 0 = one pure cycle, 1 = white-ish.
    */
  val qSpectralEntropy: QueryFn = withTables { spark =>
    val pg = Resample.periodogram(spark.table("events"), "event_type",
      "ts", "value", minPeriod = 2, maxPeriod = 14)
    val tot = pg.groupBy("event_type")
      .agg(sum(col("power").cast("decimal(38,6)")).as("_tp"),
        count(lit(1)).as("_np"))
    pg.join(broadcast(tot), "event_type")
      .withColumn("_pr", col("power").cast("double")
        / col("_tp").cast("double"))
      .groupBy("event_type")
      .agg(max("_np").as("_npx"), max(col("_tp").cast("double")).as("_tpd"),
        sum(when(col("_pr") > 0.0,
          round(col("_pr") * log(col("_pr")), 12)).otherwise(lit(0.0))
          .cast("decimal(38,12)")).as("_spl"))
      .select(col("event_type"),
        col("_npx").cast("bigint").as("n_periods"),
        when(col("_tpd") > 0.0,
          round(-col("_spl").cast("double") / lit(math.log(13.0)), 6))
          .cast("double").as("h_norm"))
      .orderBy("event_type")
  }

  /** Binned distance correlation of value vs hour-of-day per event
    * type: the dependence gauge that sees the nonlinear couplings
    * q_corr scores as zero — exact integer bin-gap folds over the
    * bins⁴-bounded pair table.
    */
  val qDcor: QueryFn = withTables { spark =>
    Stats.distanceCorrelationBinned(
        spark.table("events").withColumn("hr",
          hour(col("ts")).cast("double")),
        "event_type", "value", "hr", bins = 16)
      .orderBy("event_type")
  }

  /** Page's L ordered-alternative test over the q_friedman blocks
    * (treatment order = event-type label order): same prep, exact
    * integer L, one z tree.
    */
  val qPageTrend: QueryFn = withTables { spark =>
    Stats.pageTrend(dayCellsN(spark), "x", "event_type", "y")
  }

  /** Hodges–Lehmann shift between click and purchase daily spend
    * (bounded daily cells — the documented pre-aggregation escape
    * hatch for the quadratic pair space): exact integer differences,
    * exact lower median, one descaled round.
    */
  val qHodgesLehmann: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg((sum(round(col("value") * 100).cast("long")) / 100.0).as("y"))
    Stats.hodgesLehmann(daily, "event_type", "y")
  }

  /** Conover squared-ranks variance test of value across event types:
    * frozen group means, 6-dp deviations, doubled pooled mid-ranks
    * from value-cell cumulatives, exact decimal rank powers, one
    * rounded T tree.
    */
  val qConover: QueryFn = withTables { spark =>
    Stats.conoverSquaredRanks(spark.table("events"), "event_type",
      "value")
  }

  /** One-sample binned KS of value against the uniform law on its
    * global range, per event type: fully integer D numerator, one
    * rounded division.
    */
  val qKsUniform: QueryFn = withTables { spark =>
    Stats.ksUniformBinned(spark.table("events"), "event_type", "value",
        bins = 16)
      .orderBy("event_type")
  }

  /** Dunn's post-hoc pairwise panel after q_kruskal: pooled doubled
    * mid-ranks on the value vocabulary, tie-corrected σ², one z per
    * event-type pair.
    */
  val qDunn: QueryFn = withTables { spark =>
    Stats.dunnTest(spark.table("events"), "event_type", "value")
      .orderBy("group_a", "group_b")
  }

  /** Ljung–Box portmanteau whiteness test over the q_acf daily value
    * series (m=3): 12-dp-frozen ρ²/(n−k) terms into one decimal fold,
    * Q read against χ²(3).
    */
  val qLjungBox: QueryFn = withTables { spark =>
    Resample.ljungBox(spark.table("events"), "event_type", "ts",
        "value", maxLag = 3)
      .orderBy("event_type")
  }

  /** AR(2) Yule–Walker fit + one-step forecast of the same daily
    * series: φ's from the 6-dp lag-1/2 autocorrelations, forecast
    * anchored on the exact-decimal mean and the last two day cells.
    */
  val qAr2Forecast: QueryFn = withTables { spark =>
    Resample.arForecast(spark.table("events"), "event_type", "ts",
        "value")
      .orderBy("event_type")
  }

  /** AR(3) Yule–Walker fit + one-step forecast of the same daily
    * series: φ's from the Durbin–Levinson unroll over the 6-dp
    * lag-1..3 autocorrelations (the q_pacf recursion), forecast
    * anchored on the exact-decimal mean and the last three day cells.
    */
  val qArpForecast: QueryFn = withTables { spark =>
    Resample.arpForecast(spark.table("events"), "event_type", "ts",
        "value", p = 3)
      .orderBy("event_type")
  }

  /** SARIMA-lite: AR(2) on the lag-7 seasonally-differenced daily
    * series, integrated back through the x_{n+1−7} anchor — the
    * explicit-model cousin of q_hw_forecast's smoother, sharing the
    * Durbin–Levinson trees with q_arp_forecast.
    */
  val qArpSeasonal: QueryFn = withTables { spark =>
    Resample.seasonalArpForecast(spark.table("events"), "event_type",
        "ts", "value", season = 7, p = 2)
      .orderBy("event_type")
  }

  /** MA(1) method-of-moments fit + one-step forecast of the same
    * daily series: θ from the invertible root of ρ1 = θ/(1+θ²)
    * (defined iff |ρ1| < 0.5), last innovation by an explicit 8-term
    * truncated inversion over the final day cells, forecast
    * x̂ = μ + θ·ε_n — the short-shock-memory complement of
    * q_arp_forecast's AR fits.
    */
  val qMaForecast: QueryFn = withTables { spark =>
    Resample.maForecast(spark.table("events"), "event_type", "ts",
        "value")
      .orderBy("event_type")
  }

  /** ARMA(1,1) method-of-moments fit + one-step forecast of the same
    * daily series: φ = ρ2/ρ1, θ the invertible root of
    * θ² + Bθ + 1 = 0 (B from the mixed lag-1 moment), ε_n by a
    * 7-term truncated inversion of d_t = (x_t−μ) − φ(x_{t−1}−μ) —
    * the mixed Box–Jenkins member joining q_arp_forecast and
    * q_ma_forecast. Exact-AR(1) series rightly report NULL θ
    * (ρ1 = φ, no moment signal).
    */
  val qArmaForecast: QueryFn = withTables { spark =>
    Resample.armaForecast(spark.table("events"), "event_type", "ts",
        "value")
      .orderBy("event_type")
  }

  /** AR-order selection by relative AIC over the Durbin–Levinson
    * PACF diagonal: ΔAIC_p = n·ln Π_{k≤p}(1−φ_kk²) + 2p for p ≤ 3
    * (γ0 cancels against the white-noise base), best_p the
    * parsimony-tied argmin — "which q_arp_forecast order?".
    */
  val qArOrder: QueryFn = withTables { spark =>
    Resample.arOrderSelect(spark.table("events"), "event_type", "ts",
        "value")
      .orderBy("event_type")
  }

  /** Cochran's Q across the five event types over matched day blocks
    * on the binary "daily spend above $1,500" outcome: the 0/1 member
    * of the matched-blocks family, exact-integer throughout.
    */
  val qCochranQ: QueryFn = withTables { spark =>
    Stats.cochranQ(dayCellsN(spark), "x", "event_type",
      col("y") > 1500.0)
  }

  /** Sample-ratio-mismatch gate: user_id % 10 buckets on events
    * against the declared uniform 1/10 design — χ² goodness-of-fit
    * with 12-dp-frozen terms.
    */
  val qSrm: QueryFn = withTables { spark =>
    val e = spark.table("events")
      .withColumn("bucket", (col("user_id") % 10).cast("string"))
    Stats.chiSquaredGof(e, "bucket",
      (0 to 9).map(i => i.toString -> 0.1))
  }

  /** Fleiss' kappa across the first-20-events-per-day panels (rater
    * count fixed at 20 by a (ts, event_id) total-order cut; short days
    * drop out via the operator's complete-panel contract), category =
    * event type: exact integer moments, one rounded κ tree.
    */
  val qFleissKappa: QueryFn = withTables { spark =>
    val rated = spark.table("events")
      .withColumn("_d", col("ts").cast("date"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy("_d").orderBy(col("ts"), col("event_id"))))
      .filter(col("_rn") <= 20)
      .select(datediff(col("_d"), lit("2024-01-01").cast("date")).as("s"),
        col("event_type"))
    Stats.fleissKappa(rated, "s", "event_type", r = 20)
  }

  /** One-sided Fisher's exact test of user parity × value > 95 on one
    * day's events (the small-sample regime the test exists for):
    * frozen ln-factorial ladder, 12-dp-frozen tail terms, one rounded
    * sum.
    */
  val qFisherExact: QueryFn = withTables { spark =>
    val day = spark.table("events")
      .filter(col("ts").cast("date") === lit("2024-01-15").cast("date")
        && col("value").isNotNull)
    Stats.fisherExactGreater(day, col("user_id") % 2 === 0,
      col("value") > 95.0)
  }

  /** CUPED adjustment of per-user second-half spend by first-half
    * spend (arm = user parity): pooled θ from exact decimal moments
    * frozen at 12 dp, adjusted means and the variance-reduction ratio
    * as single rounded trees.
    */
  val qCuped: QueryFn = withTables { spark =>
    val cut = lit("2024-01-16").cast("date")
    val u = spark.table("events")
      .groupBy("user_id")
      .agg(
        (sum(when(col("ts").cast("date") < cut,
          round(col("value") * 100).cast("long")).otherwise(0L))
          / 100.0).as("pre"),
        (sum(when(col("ts").cast("date") >= cut,
          round(col("value") * 100).cast("long")).otherwise(0L))
          / 100.0).as("post"))
      .withColumn("arm",
        when(col("user_id") % 2 === 0, "treat").otherwise("control"))
    Stats.cuped(u, "arm", "pre", "post").orderBy("arm")
  }

  /** Difference-in-differences of event value across (user parity ×
    * second-half-of-month): four exact-moment cells, DiD and its
    * normal-approximation SE as single rounded trees.
    */
  val qDid: QueryFn = withTables { spark =>
    Stats.diffInDiff(spark.table("events"),
      col("user_id") % 2 === 0,
      col("ts").cast("date") >= lit("2024-01-16").cast("date"),
      "value")
  }

  /** Hierarchical forecast reconciliation (h = 1..3): bottom-up
    * (each type's own Holt forecast) beside top-down (the TOTAL
    * series' Holt forecast split by exact historical spend shares) —
    * the two classic coherent answers whose gap reads aggregation
    * bias; shares are exact cents ratios frozen at 12 dp.
    */
  val qReconcile: QueryFn = withTables { spark =>
    val daily = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value") * 1e6).cast("bigint")) / 1e6, 6)
        .cast("double").as("x"))
    val bu = Resample.holtForecast(daily, "event_type", Seq("d"), "x",
      alpha = 0.3, beta = 0.2, horizon = 3)
      .select(col("event_type"), col("h"), col("forecast").as("_bu"))
    val totalDaily = spark.table("events")
      .groupBy(col("ts").cast("date").as("d"))
      .agg(round(sum(round(col("value") * 1e6).cast("bigint")) / 1e6, 6)
        .cast("double").as("x"))
      .withColumn("g", lit("all"))
    val tot = Resample.holtForecast(totalDaily, "g", Seq("d"), "x",
      alpha = 0.3, beta = 0.2, horizon = 3)
      .select(col("h").as("_h"), col("forecast").as("_tf"))
    val cents = spark.table("events")
      .groupBy(col("event_type").as("_gc"))
      .agg(sum(round(col("value") * 1e6).cast("bigint")).as("_c"))
    val grand = cents.agg(sum("_c").as("_tc"))
    val shares = cents.crossJoin(broadcast(grand))
      .select(col("_gc"), round(col("_c").cast("double")
        / col("_tc").cast("double"), 12).as("_sh"))
    bu.join(broadcast(shares), col("event_type") === col("_gc"))
      .join(broadcast(tot), col("h") === col("_h"))
      .select(col("event_type"), col("h").cast("bigint").as("h"),
        round(col("_sh"), 6).cast("double").as("share"),
        col("_bu").cast("double").as("forecast_bu"),
        round(col("_tf") * col("_sh"), 6).cast("double")
          .as("forecast_td"))
      .orderBy("event_type", "h")
  }

  /** Mean pinball loss of each type's own exact q90 on event values:
    * the proper quantile scoring-rule baseline every quantile model
    * must beat.
    */
  val qPinball: QueryFn = withTables { spark =>
    Stats.pinballLoss(spark.table("events"), "event_type", "value",
        tau = 0.9)
      .orderBy("event_type")
  }

  /** Winkler interval score of the in-sample Gaussian 95% interval
    * on event values per type: width plus 2/α-priced misses —
    * vagueness and cowardice both cost.
    */
  val qIntervalScore: QueryFn = withTables { spark =>
    Stats.intervalScore(spark.table("events"), "event_type", "value")
      .orderBy("event_type")
  }

  /** Event-study panel of the q_did design by relative WEEK to the
    * 2024-01-16 adoption: pre-period effects read parallel trends,
    * post periods trace the dynamics the pooled DiD averages away.
    */
  val qEventStudy: QueryFn = withTables { spark =>
    Stats.eventStudy(spark.table("events"),
        col("user_id") % 2 === 0,
        floor(datediff(col("ts").cast("date"),
          lit("2024-01-16").cast("date")) / lit(7)),
        "value")
      .orderBy("rel_period")
  }

  /** D'Agostino–Pearson K² normality omnibus on event values per
    * type: the finite-sample-honest sibling of q_jarque_bera —
    * exact power sums through the staged 12-dp transform chain.
    */
  val qDagostino: QueryFn = withTables { spark =>
    Stats.dagostinoK2(spark.table("events"), "event_type", "value")
      .orderBy("event_type")
  }

  /** Absolute-risk panel of the q_mantel_haenszel 2×2 per event
    * type: RD with the Wald se, RR, NNT, and the attributable
    * fraction — the honest absolute view beside q_odds_ratio.
    */
  val qRiskPanel: QueryFn = withTables { spark =>
    Stats.riskPanel(spark.table("events"), "event_type",
        col("user_id") % 2 === 0, col("value") > 50.0)
      .orderBy("event_type")
  }

  /** Directly standardized high-value rate per event type over
    * hour-of-day strata (pooled reference): removes the hour-mix
    * confound the crude rates carry.
    */
  val qDirectStd: QueryFn = withTables { spark =>
    Stats.directStandardization(spark.table("events"), "event_type",
        hour(col("ts")), col("value") > 120.0)
      .orderBy("event_type")
  }

  /** Paired sign test of value vs the rounded-dollar reading per
    * type (the q_deming pair): exact integer signs, ties drop, one
    * rounded z — the assumption-free floor under the paired family.
    */
  val qSignTest: QueryFn = withTables { spark =>
    Stats.signTest(
        spark.table("events").withColumn("rounded",
          round(col("value"), 0)),
        "event_type", "value", "rounded")
      .orderBy("event_type")
  }

  /** Goh–Barabási burstiness + memory of per-user inter-event gaps
    * per type: the arrival-process signature beside q_fano's count
    * dispersion — exact integer gap moments and lag-1 co-moments.
    */
  val qBurstiness: QueryFn = withTables { spark =>
    Resample.gapBurstiness(spark.table("events"), "event_type",
        "user_id", "ts", "event_id")
      .orderBy("event_type")
  }

  /** Temperature scaling of the centered-value logit against the
    * even-JSON-k label (the q_roc_curve pair): 4 clamped Newton
    * passes on the inverse temperature — the post-hoc calibration
    * repair beside ECE's diagnosis.
    */
  val qTempScaling: QueryFn = withTables { spark =>
    Stats.temperatureScaling(
      spark.table("events")
        .withColumn("s", (col("value") - 100.0) / 50.0),
      "s",
      coalesce(get_json_object(col("props"), "$.k").cast("bigint")
        % 2 === 0, lit(false)),
      passes = 4)
  }

  /** Sequential two-player Elo of click vs purchase daily spend
    * (winner = higher exact cents): the online pairwise tracker
    * beside q_bradley_terry's batch MLE — 6-dp state machine,
    * 10^x spelled exp(x·ln 10).
    */
  val qElo: QueryFn = withTables { spark =>
    def side(t: String) = spark.table("events")
      .filter(col("event_type") === t)
      .groupBy(col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as(s"c_$t"))
    val matches = side("click").join(side("purchase"), Seq("d"))
      .select(col("d"),
        when(col("c_click") > col("c_purchase"), 1.0)
          .when(col("c_click") === col("c_purchase"), 0.5)
          .otherwise(0.0).as("s"))
    Resample.eloTwoPlayer(matches, Seq("d"), "s")
      .select(col("d").as("day"), col("s"), col("expected_a"),
        col("rating_a"), col("rating_b"))
      .orderBy("day")
  }

  /** Triple difference on the q_did design with a user-mod-3
    * eligibility stratum: DDD nets the ineligible stratum's own
    * drift out of the DiD — eight exact cells, one fold.
    */
  val qDdd: QueryFn = withTables { spark =>
    Stats.tripleDiff(spark.table("events"),
      col("user_id") % 2 === 0,
      col("ts").cast("date") >= lit("2024-01-16").cast("date"),
      col("user_id") % 3 === 0,
      "value")
  }

  /** Schnabel multi-occasion capture–recapture of the user
    * population from daily sightings: pooled catch/recapture
    * evidence across every day, exact integer folds.
    */
  val qSchnabel: QueryFn = withTables { spark =>
    val s = spark.table("events")
      .select(col("user_id"),
        datediff(col("ts").cast("date"),
          lit("2024-01-01").cast("date")).as("occ"))
    Stats.schnabel(s, "user_id", "occ")
  }

  /** Randomization-inference p-value for the q_did effect: 19 md5
    * placebo unit assignments, rank of the observed DiD among them —
    * the permutation answer the normal se can't give on skewed
    * spend.
    */
  val qRandInference: QueryFn = withTables { spark =>
    Stats.randomizationInference(spark.table("events"), "user_id",
      col("user_id") % 2 === 0,
      col("ts").cast("date") >= lit("2024-01-16").cast("date"),
      "value", b = 19)
  }

  /** Mann–Kendall monotonic-trend test on daily dollar spend per
    * event type: exact integer S with tie-corrected variance,
    * continuity-corrected z keyed on the integer sign of S.
    */
  val qMannKendall: QueryFn = withTables { spark =>
    Stats.mannKendall(spark.table("events"), "event_type", "ts", "value")
      .orderBy("event_type")
  }

  /** Cross-correlation of daily spend vs daily volume per event type
    * at lags −3..3 ("does spend lead volume"): the q_acf machinery on
    * two measures, exact decimal numerators, one rounded division per
    * lag.
    */
  val qCcf: QueryFn = withTables { spark =>
    Resample.crossCorrelation(
        spark.table("events").withColumn("one", lit(1.0)),
        "event_type", "ts", "value", "one", maxLag = 3)
      .orderBy("event_type", "lag")
  }

  /** Balanced two-way ANOVA with interaction on a 30-per-cell cut of
    * (event type × user parity): exact decimal moments, each SS/F one
    * rounded tree; the balance and grid-completeness guards ride the
    * lazy plan.
    */
  val qAnovaTwoWay: QueryFn = withTables { spark =>
    val cut = spark.table("events")
      .filter(col("value").isNotNull)
      .withColumn("par", col("user_id") % 2)
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("event_type"), col("par"))
          .orderBy(col("ts"), col("event_id"))))
      .filter(col("_rn") <= 30)
    Stats.anovaTwoWay(cut, "event_type", "par", "value")
  }

  /** Nelson–Aalen cumulative hazard on the q_kaplan_meier subjects:
    * 12-dp-frozen d/n steps into an order-fixed decimal cumulative —
    * no transcendentals at all.
    */
  /** Weibull shape/scale per user-parity cohort from the Nelson–
    * Aalen regression: ln H on ln t is a line under Weibull; slope =
    * shape, e^(−intercept/slope) = characteristic life.
    */
  val qWeibull: QueryFn = withTables { spark =>
    val subjects = spark.table("events").groupBy("user_id")
      .agg(min(col("ts").cast("date")).as("_first"),
        max(col("ts").cast("date")).as("_last"),
        min(when(col("event_type") === "purchase",
          col("ts").cast("date"))).as("_firstp"))
      .select(pmod(col("user_id"), lit(2)).cast("int").as("cohort"),
        datediff(coalesce(col("_firstp"), col("_last")), col("_first"))
          .cast("bigint").as("duration"),
        col("_firstp").isNotNull.as("observed"))
    Stats.weibullFit(subjects, "cohort", "duration", col("observed"))
      .orderBy("cohort")
  }

  val qNelsonAalen: QueryFn = withTables { spark =>
    val subjects = spark.table("events").groupBy("user_id")
      .agg(min(col("ts").cast("date")).as("_first"),
        max(col("ts").cast("date")).as("_last"),
        min(when(col("event_type") === "purchase",
          col("ts").cast("date"))).as("_firstp"))
      .select(col("user_id"),
        datediff(coalesce(col("_firstp"), col("_last")), col("_first"))
          .cast("bigint").as("duration"),
        col("_firstp").isNotNull.as("observed"))
    Stats.nelsonAalen(subjects, Seq.empty, "duration", col("observed"))
      .orderBy("duration")
  }

  /** Best single-threshold split of value against the purchase label
    * (16-bin sweep): exact cumulative counts, 12-dp-frozen binary
    * entropies, (gain DESC, edge) argmax.
    */
  val qStump: QueryFn = withTables { spark =>
    Profiling.infoGainStump(spark.table("events"), "value",
      col("event_type") === "purchase", bins = 16)
  }

  /** Weight-of-evidence panel + information value of value against
    * the even-JSON-k label (10 bins, +0.5 adjustment everywhere):
    * frozen ln per bin, decimal IV fold.
    */
  val qWoeIv: QueryFn = withTables { spark =>
    Profiling.woeIv(spark.table("events"), "value",
        coalesce(get_json_object(col("props"), "$.k").cast("bigint")
          % 2 === 0, lit(false)), bins = 10)
      .orderBy("bin")
  }

  /** ROC curve table of value vs the even-JSON-k label over a frozen
    * 20-bin threshold grid: exact cumulative cells, one rounded
    * division per rate.
    */
  val qRocCurve: QueryFn = withTables { spark =>
    graft.operators.RankEval.rocCurve(spark.table("events"), "value",
        coalesce(get_json_object(col("props"), "$.k").cast("bigint")
          % 2 === 0, lit(false)), bins = 20)
      .orderBy("edge")
  }

  /** Krippendorff's alpha (nominal) with days as units and event
    * types as categories — the ragged-panel agreement coefficient
    * (no fixed-r cut, unlike q_fleiss_kappa): frozen per-unit pair
    * terms, exact marginals, one alpha tree.
    */
  val qKrippendorff: QueryFn = withTables { spark =>
    Stats.krippendorffAlpha(
      spark.table("events").select(col("ts").cast("date").as("day"),
        col("event_type")), "day", "event_type")
  }



  /** Goodman-Kruskal gamma + both Somers' D directions on the
    * q_kendall day cells: the tie-handling spectrum around tau-b,
    * exact C/D/tie integers, one rounded division each.
    */
  val qOrdinal: QueryFn = withTables { spark =>
    val cells = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      .select(col("event_type"),
        datediff(col("d"), lit("2024-01-01").cast("date")).as("x"),
        col("y"))
    Stats.ordinalAssociation(cells, "event_type", "x", "y")
      .orderBy("event_type")
  }

  /** Trailing-7-day rolling OLS slope of daily spend against the day
    * index per event type: the local trend needle — exact windowed
    * decimal moments, one rounded division per row.
    */
  val qRollingSlope: QueryFn = withTables { spark =>
    val cells = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg((sum(round(col("value") * 100).cast("long")) / 100.0).as("y"))
      .withColumn("x",
        datediff(col("d"), lit("2024-01-01").cast("date")).cast("double"))
    graft.operators.Stats.rollingSlope(cells, "event_type", "d",
        "x", "y", window = 7)
      .withColumn("d", col("d").cast("string"))
      .orderBy("event_type", "d")
  }

  /** Trend/seasonal strength of the q_decompose daily-cents series
    * (period 7): exact re-quantized components, one variance-ratio
    * tree per strength.
    */
  val qSeasonalStrength: QueryFn = withTables { spark =>
    val cells = spark.table("events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      .select(col("event_type"),
        datediff(col("d"), lit("2024-01-01").cast("date")).as("x"),
        col("y"))
    Resample.seasonalStrength(cells, "event_type", "x", "y", period = 7)
      .orderBy("event_type")
  }

  /** Cohen's h of the high-value share per event type vs the pooled
    * rest: the effect size q_prop_ztest's p-value leaves unstated;
    * frozen arcsine trees on exact proportions.
    */
  val qCohensH: QueryFn = withTables { spark =>
    Stats.cohensH(spark.table("events"), "event_type",
        col("value") > 50.0)
      .orderBy("event_type")
  }

  /** Woolf odds-ratio CI for user parity × high value: exact cells,
    * frozen ln/exp trees, NULL on any zero cell.
    */
  val qOddsRatio: QueryFn = withTables { spark =>
    Stats.oddsRatioCI(spark.table("events"),
      col("user_id") % 2 === 0, col("value") > 50.0)
  }

  /** Bland-Altman agreement between the raw value and its
    * whole-dollar rounding (quantization bias + limits): exact
    * decimal moments, sd frozen before the ± arms.
    */
  val qBlandAltman: QueryFn = withTables { spark =>
    Stats.blandAltman(
      spark.table("events").withColumn("rounded",
        round(col("value"), 0)), "value", "rounded")
  }

  /** Newey-West HAC standard error of each type's daily mean value
    * (Bartlett m=3), beside the i.i.d. se: the honest uncertainty for
    * a sticky series — the q_acf fold with the fixed-weight kernel
    * combination.
    */
  val qHacSe: QueryFn = withTables { spark =>
    Resample.hacSe(spark.table("events"), "event_type", "ts", "value",
        maxLag = 3)
      .orderBy("event_type")
  }

  /** Harrell's C of total spend as a conversion-risk score on the
    * q_kaplan_meier subjects ("do spenders convert first"): exact
    * pair counts, one rounded division.
    */
  val qCIndex: QueryFn = withTables { spark =>
    val subjects = spark.table("events").groupBy("user_id")
      .agg(min(col("ts").cast("date")).as("_first"),
        max(col("ts").cast("date")).as("_last"),
        min(when(col("event_type") === "purchase",
          col("ts").cast("date"))).as("_firstp"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("risk"))
      .select(col("user_id"),
        datediff(coalesce(col("_firstp"), col("_last")), col("_first"))
          .cast("bigint").as("duration"),
        col("_firstp").isNotNull.as("observed"), col("risk"))
    Stats.concordanceIndex(subjects, "duration", col("observed"),
      "risk")
  }

  val queries: Map[String, QueryFn] = Map(
    "q_c_index" -> qCIndex,
    "q_hac_se" -> qHacSe,
    "q_cohens_h" -> qCohensH,
    "q_odds_ratio" -> qOddsRatio,
    "q_bland_altman" -> qBlandAltman,
    "q_seasonal_strength" -> qSeasonalStrength,
    "q_rolling_slope" -> qRollingSlope,
    "q_ordinal" -> qOrdinal,
    "q_roc_curve" -> qRocCurve,
    "q_krippendorff" -> qKrippendorff,
    "q_nelson_aalen" -> qNelsonAalen,
    "q_weibull" -> qWeibull,
    "q_stump" -> qStump,
    "q_woe_iv" -> qWoeIv,
    "q_anova2" -> qAnovaTwoWay,
    "q_mann_kendall" -> qMannKendall,
    "q_ccf" -> qCcf,
    "q_cuped" -> qCuped,
    "q_did" -> qDid,
    "q_fleiss_kappa" -> qFleissKappa,
    "q_fisher_exact" -> qFisherExact,
    "q_ljung_box" -> qLjungBox,
    "q_ar2_forecast" -> qAr2Forecast,
    "q_arp_forecast" -> qArpForecast,
    "q_arp_seasonal" -> qArpSeasonal,
    "q_ma_forecast" -> qMaForecast,
    "q_arma_forecast" -> qArmaForecast,
    "q_ar_order" -> qArOrder,
    "q_tost" -> qTost,
    "q_forecast_interval" -> qForecastInterval,
    "q_huber" -> qHuber,
    "q_cuminc" -> qCumInc,
    "q_psm_ate" -> qPsmAte,
    "q_gamma" -> qGamma,
    "q_icc" -> qIcc,
    "q_logistic_multi" -> qLogisticMulti,
    "q_cochran_q" -> qCochranQ,
    "q_srm" -> qSrm,
    "q_decompose" -> qDecompose,
    "q_forecast_acc" -> qForecastAcc,
    "q_g_test" -> qGTest,
    "q_ad_binned" -> qAdBinned,
    "q_page_hinkley" -> qPageHinkley,
    "q_partial_corr" -> qPartialCorr,
    "q_cronbach" -> qCronbach,
    "q_mantel_haenszel" -> qMantelHaenszel,
    "q_friedman" -> qFriedman,
    "q_dunn" -> qDunn,
    "q_anova" -> qAnova,
    "q_levene" -> qLevene,
    "q_durbin_watson" -> qDurbinWatson,
    "q_breusch_pagan" -> qBreuschPagan,
    "q_chow" -> qChow,
    "q_influence" -> qInfluence,
    "q_grubbs" -> qGrubbs,
    "q_welch_t" -> qWelchT,
    "q_student_t" -> qStudentT,
    "q_bartlett" -> qBartlett,
    "q_mood_median" -> qMoodMedian,
    "q_tukey_hsd" -> qTukeyHsd,
    "q_ks_test" -> qKsTest,
    "q_ks_binned" -> qKsBinned,
    "q_prop_ztest" -> qPropZtest,
    "q_mann_whitney" -> qMannWhitney,
    "q_mw_binned" -> qMwBinned,
    "q_wilcoxon" -> qWilcoxon,
    "q_mcnemar" -> qMcnemar,
    "q_hill" -> qHill,
    "q_ipf_rake" -> qIpfRake,
    "q_kruskal" -> qKruskal,
    "q_cliffs_delta" -> qCliffsDelta,
    "q_eb_shrink" -> qEbShrink,
    "q_pettitt" -> qPettitt,
    "q_theil_sen" -> qTheilSen,
    "q_drawdown" -> qDrawdown,
    "q_cusum_detect" -> qCusumDetect,
    "q_rolling_corr" -> qRollingCorr,
    "q_kendall" -> qKendall,
    "q_kendall_binned" -> qKendallBinned,
    "q_welch_anova" -> qWelchAnova,
    "q_inequality" -> qInequality,
    "q_km_ci" -> qKmCi,
    "q_dickey_fuller" -> qDickeyFuller,
    "q_granger" -> qGranger,
    "q_iv_wald" -> qIvWald,
    "q_rdd" -> qRdd,
    "q_smd" -> qSmd,
    "q_theta_forecast" -> qThetaForecast,
    "q_croston" -> qCroston,
    "q_hw_mult" -> qHwMult,
    "q_aipw" -> qAipw,
    "q_dml" -> qDml,
    "q_engle_granger" -> qEngleGranger,
    "q_energy_dist" -> qEnergyDist,
    "q_hotelling" -> qHotelling,
    "q_msprt" -> qMsprt,
    "q_twfe" -> qTwfe,
    "q_gumbel" -> qGumbel,
    "q_lincoln" -> qLincoln,
    "q_tost_prop" -> qTostProp,
    "q_beta_binomial" -> qBetaBinomial,
    "q_poisson_test" -> qPoissonTest,
    "q_jonckheere" -> qJonckheere,
    "q_brunner_munzel" -> qBrunnerMunzel,
    "q_kendall_w" -> qKendallW,
    "q_cox_ph" -> qCoxPh,
    "q_breakpoint" -> qBreakpoint,
    "q_markov_entropy" -> qMarkovEntropy,
    "q_yuen" -> qYuen,
    "q_anova_effect" -> qAnovaEffect,
    "q_rmst" -> qRmst,
    "q_page_trend" -> qPageTrend,
    "q_ks_uniform" -> qKsUniform,
    "q_ks_exponential" -> qKsExponential,
    "q_hodges_lehmann" -> qHodgesLehmann,
    "q_conover" -> qConover,
    "q_runs_test" -> qRunsTest,
    "q_robust_outliers" -> qRobustOutliers,
    "q_theils_u" -> qTheilsU,
    "q_cusum" -> qCusum,
    "q_seasonality" -> qSeasonality,
    "q_markov" -> qMarkov,
    "q_zonemap" -> qZonemap,
    "q_pseudonymize" -> qPseudonymize,
    "q_density_grid" -> qDensityGrid,
    "q_dbscan" -> qDbscan,
    "q_kaplan_meier" -> qKaplanMeier,
    "q_benford" -> qBenford,
    "q_modularity" -> qModularity,
    "q_assortativity" -> qAssortativity,
    "q_acf" -> qAcf,
    "q_periodogram" -> qPeriodogram,
    "q_kpss" -> qKpss,
    "q_variance_ratio" -> qVarianceRatio,
    "q_turning_points" -> qTurningPoints,
    "q_cox_stuart" -> qCoxStuart,
    "q_p_chart" -> qPChart,
    "q_gwet_ac1" -> qGwetAc1,
    "q_bowker" -> qBowker,
    "q_life_table" -> qLifeTable,
    "q_transfer_entropy" -> qTransferEntropy,
    "q_cpm" -> qCpm,
    "q_cochran_c" -> qCochranC,
    "q_hhi" -> qHhi,
    "q_u_chart" -> qUChart,
    "q_chi_squared" -> qChiSquared,
    "q_conformal" -> qConformal,
    "q_heavy_hitters" -> qHeavyHitters,
    "q_lin_fit" -> qLinFit,
    "q_logistic" -> qLogistic,
    "q_logistic2" -> qLogistic2,
    "q_poisson" -> qPoisson,
    "q_ols_multi" -> qOlsMulti,
    "q_ols_multi3" -> qOlsMulti3,
    "q_ridge" -> qRidge,
    "q_wls" -> qWls,
    "q_elasticity" -> qElasticity,
    "q_mde" -> qMde,
    "q_median_ci" -> qMedianCi,
    "q_log_rank" -> qLogRank,
    "q_pacf" -> qPacf,
    "q_trend_test" -> qTrendTest,
    "q_isotonic" -> qIsotonic,
    "q_jarque_bera" -> qJarqueBera,
    "q_cvm_binned" -> qCvmBinned,
    "q_fdr_bh" -> qFdrBh,
    "q_fdr_by" -> qFdrBy,
    "q_fdr_holm" -> qFdrHolm,
    "q_negbin" -> qNegbin,
    "q_cochrane_orcutt" -> qCochraneOrcutt,
    "q_westgard" -> qWestgard,
    "q_synth_control" -> qSynthControl,
    "q_kalman" -> qKalman,
    "q_price_index" -> qPriceIndex,
    "q_mk_seasonal" -> qMkSeasonal,
    "q_rank_biserial" -> qRankBiserial,
    "q_ks_model" -> qKsModel,
    "q_riskmetrics" -> qRiskmetrics,
    "q_vif" -> qVif,
    "q_cpk" -> qCpk,
    "q_xbar_r" -> qXbarR,
    "q_median_polish" -> qMedianPolish,
    "q_hurst" -> qHurst,
    "q_sharpe" -> qSharpe,
    "q_sortino" -> qSortino,
    "q_calmar" -> qCalmar,
    "q_var_cvar" -> qVarCvar,
    "q_omega_ratio" -> qOmegaRatio,
    "q_ulcer" -> qUlcer,
    "q_kelly" -> qKelly,
    "q_scott_pi" -> qScottPi,
    "q_imr_chart" -> qImrChart,
    "q_delta_method" -> qDeltaMethod,
    "q_quade" -> qQuade,
    "q_ansari_bradley" -> qAnsariBradley,
    "q_diebold_mariano" -> qDieboldMariano,
    "q_perm_entropy" -> qPermEntropy,
    "q_deming" -> qDeming,
    "q_breslow_day" -> qBreslowDay,
    "q_gesd" -> qGesd,
    "q_spectral_entropy" -> qSpectralEntropy,
    "q_dcor" -> qDcor,
    "q_mood_dispersion" -> qMoodDispersion,
    "q_lepage" -> qLepage,
    "q_trigg" -> qTrigg,
    "q_grey" -> qGrey,
    "q_theil_u2" -> qTheilU2,
    "q_neyman" -> qNeyman,
    "q_design_effect" -> qDesignEffect,
    "q_hochberg" -> qHochberg,
    "q_forecast_bias" -> qForecastBias,
    "q_passing_bablok" -> qPassingBablok,
    "q_goldfeld_quandt" -> qGoldfeldQuandt,
    "q_breusch_godfrey" -> qBreuschGodfrey,
    "q_ddd" -> qDdd,
    "q_schnabel" -> qSchnabel,
    "q_rand_inference" -> qRandInference,
    "q_elo" -> qElo,
    "q_temp_scaling" -> qTempScaling,
    "q_sign_test" -> qSignTest,
    "q_burstiness" -> qBurstiness,
    "q_risk_panel" -> qRiskPanel,
    "q_direct_std" -> qDirectStd,
    "q_event_study" -> qEventStudy,
    "q_dagostino" -> qDagostino,
    "q_pinball" -> qPinball,
    "q_interval_score" -> qIntervalScore,
    "q_reconcile" -> qReconcile,
    "q_binseg" -> qBinseg,
    "q_croston_sba" -> qCrostonSba,
    "q_prr" -> qPrr,
    "q_ess" -> qEss,
    "q_holt_forecast" -> qHoltForecast,
    "q_holt_damped" -> qHoltDamped,
    "q_tsb" -> qTsb,
    "q_hw_forecast" -> qHwForecast,
    "q_xcorr" -> qXcorr,
    "q_best_split" -> qBestSplit,
    "q_markov_perplexity" -> qMarkovPerplexity,
    "q_fano" -> qFano,
    "q_cohens_d" -> qCohensD,
    "q_jsd" -> qJsd,
    "q_trending" -> qTrending,
    "q_qq_drift" -> qQqDrift,
    "q_trimmed_mean" -> qTrimmedMean,
    "q_bipartite" -> qBipartite,
    "q_fd_check" -> qFdCheck,
    "q_link_pred" -> qLinkPred,
    "q_link_pred_jaccard" -> qLinkPredJaccard,
    "q_weighted_median" -> qWeightedMedian,
    "q_heaps" -> qHeaps)


  // One R/S scale of the q_hurst oracle: full w-blocks, exact block
  // sums, population sd, the 12-dp cumulative-deviation tree off the
  // exact running sum, 6-dp ratios and their decimal mean — the
  // hurstRS trees node for node, ln(w) as the interpolated Scala
  // double.
  private def hurstScaleCtes(w: Int): String = {
    val wd = s"$w.0"
    s"""
      b$w AS (SELECT g, x, ((i - 1) // $w) AS b, i FROM si),
      st$w AS (
        SELECT g, b, COUNT(*)::BIGINT AS n,
               SUM(CAST(x AS DECIMAL(38,6))) AS s1,
               SUM(CAST(ROUND(x * x, 12) AS DECIMAL(38,12))) AS s2
        FROM b$w GROUP BY g, b),
      stf$w AS (
        SELECT g, b,
               ROUND(CAST(s1 AS DOUBLE) / $wd, 6) AS mu,
               CASE WHEN (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                   * CAST(s1 AS DOUBLE) / $wd) / $wd > 0.0
                 THEN ROUND(SQRT((CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / $wd)
                   / $wd), 6) END AS sd
        FROM st$w WHERE n = $w),
      cum$w AS (
        SELECT bb.g, bb.b, s.sd,
               ROUND(CAST(SUM(CAST(bb.x AS DECIMAL(38,6)))
                   OVER (PARTITION BY bb.g, bb.b ORDER BY bb.i)
                 AS DOUBLE)
                 - (ROW_NUMBER() OVER (PARTITION BY bb.g, bb.b
                     ORDER BY bb.i)) * s.mu, 12) AS cum
        FROM b$w bb JOIN stf$w s ON s.g = bb.g AND s.b = bb.b),
      rs$w AS (
        SELECT g, b,
               ROUND((MAX(cum) - MIN(cum)) / MAX(sd), 6) AS rs
        FROM cum$w WHERE sd IS NOT NULL GROUP BY g, b),
      m$w AS (
        SELECT g, ${math.log(w.toDouble)} AS lnw,
               ROUND(CAST(SUM(CAST(rs AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS mrs
        FROM rs$w GROUP BY g)"""
  }

  private val hurstOracle: String = s"""
      WITH daily AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6)))
                 AS DOUBLE) / COUNT(*), 6) AS v
        FROM events GROUP BY 1, 2),
      si AS (SELECT g, ROUND(v, 6) AS x,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY d) AS i
             FROM daily),${hurstScaleCtes(5)},${hurstScaleCtes(10)},${hurstScaleCtes(15)},
      scales AS (SELECT * FROM m5 UNION ALL SELECT * FROM m10
                 UNION ALL SELECT * FROM m15),
      pts AS (SELECT g, lnw, ROUND(LN(mrs), 12) AS lnrs
              FROM scales WHERE mrs > 0.0),
      agg AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(CAST(ROUND(lnw, 12) AS DECIMAL(38,12))) AS sx,
               SUM(CAST(ROUND(lnrs, 12) AS DECIMAL(38,12))) AS sy,
               SUM(CAST(ROUND(lnw * lnw, 12) AS DECIMAL(38,12))) AS sxx,
               SUM(CAST(ROUND(lnw * lnrs, 12) AS DECIMAL(38,12))) AS sxy
        FROM pts GROUP BY g)
      SELECT g AS event_type, n AS n_scales,
             CAST(CASE WHEN n >= 2
                        AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
               THEN ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
             END AS DOUBLE) AS hurst
      FROM agg ORDER BY event_type"""


  // One segment's OLS cost from SQL sum expressions — the
  // binarySegmentation cost tree node for node (mean-only fallback on
  // constant x). Exact integer segment sums enter, doubles come out.
  private def segCostSql(n: String, sx: String, sy: String,
      sxx: String, syy: String, sxy: String): String = {
    val nd = s"CAST($n AS DOUBLE)"
    val cxx = s"($nd * CAST($sxx AS DOUBLE) - CAST($sx AS DOUBLE) " +
      s"* CAST($sx AS DOUBLE))"
    val cyy = s"($nd * CAST($syy AS DOUBLE) - CAST($sy AS DOUBLE) " +
      s"* CAST($sy AS DOUBLE))"
    val cxy = s"($nd * CAST($sxy AS DOUBLE) - CAST($sx AS DOUBLE) " +
      s"* CAST($sy AS DOUBLE))"
    s"""(CASE WHEN $n >= 2 AND $cxx > 0.0
          THEN ($cyy - $cxy * $cxy / $cxx) / ($nd * $nd)
          WHEN $n >= 1 THEN $cyy / ($nd * $nd)
          ELSE 0.0 END)"""
  }

  // q_binseg's oracle: the q_breakpoint cell/prefix machinery, the
  // level-1 winner joined back for its prefix row, then each side's
  // candidate scan off segment-sum differences of the SAME prefixes.
  private val binsegOracle: String = {
    def segDiff(a: String, b: String): String = {
      val parts = Seq("n", "sx", "sy", "sxx", "syy", "sxy").map { k =>
        val ka = if (a == "t") s"c.${k}t" else if (a == "l") s"c.${k}l"
          else s"b.${k}1"
        val kb = if (b == "") "" else if (b == "t") s"c.${k}t"
          else if (b == "l") s"c.${k}l" else s"b.${k}1"
        if (kb.isEmpty) ka else s"($ka - $kb)"
      }
      segCostSql(parts(0), parts(1), parts(2), parts(3), parts(4),
        parts(5))
    }
    val costL1 = segDiff("l", "")
    val costR1 = segDiff("t", "l")
    val costT1 = segDiff("t", "")
    val parentL = segDiff("1", "")
    val subLR = segDiff("1", "l")
    val parentR = segDiff("t", "1")
    val subRL = segDiff("l", "1")
    val thr = "ROUND((CAST(e.lo AS DOUBLE) / 1000000.0) " +
      "+ CAST(Q + 1 AS DOUBLE) " +
      "* (CAST(e.hi - e.lo AS DOUBLE) / 1000000.0) / 16, 6)"
    s"""
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(CAST(DATEDIFF('day', DATE '2024-01-01',
                 CAST(ts AS DATE)) AS DOUBLE) * 1000000.0) AS BIGINT) AS x,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS y
        FROM events WHERE value IS NOT NULL),
      edges AS (SELECT g, MIN(x) AS lo, MAX(x) AS hi,
                       COUNT(*)::BIGINT AS ng
                FROM pts GROUP BY g),
      cells AS (
        SELECT g, q, COUNT(*)::BIGINT AS n, SUM(x::HUGEINT) AS sx,
               SUM(y::HUGEINT) AS sy, SUM(x::HUGEINT * x) AS sxx,
               SUM(y::HUGEINT * y) AS syy, SUM(x::HUGEINT * y) AS sxy
        FROM (SELECT p.g,
                (CASE WHEN e.hi > e.lo
                   THEN LEAST(FLOOR(CAST(p.x - e.lo AS DOUBLE) * 16
                     / CAST(e.hi - e.lo AS DOUBLE)), 15)
                   ELSE 0 END)::BIGINT AS q, x, y
              FROM pts p JOIN edges e USING (g))
        GROUP BY g, q),
      cums AS (
        SELECT g, q,
               SUM(n) OVER wc AS nl, SUM(sx) OVER wc AS sxl,
               SUM(sy) OVER wc AS syl, SUM(sxx) OVER wc AS sxxl,
               SUM(syy) OVER wc AS syyl, SUM(sxy) OVER wc AS sxyl,
               SUM(n) OVER wa AS nt, SUM(sx) OVER wa AS sxt,
               SUM(sy) OVER wa AS syt, SUM(sxx) OVER wa AS sxxt,
               SUM(syy) OVER wa AS syyt, SUM(sxy) OVER wa AS sxyt
        FROM cells
        WINDOW wc AS (PARTITION BY g ORDER BY q
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wa AS (PARTITION BY g)),
      l1scan AS (
        SELECT c.g, c.q, c.nl, c.nt,
               ROUND($costT1 - $costL1 - $costR1, 6) AS gain,
               ROW_NUMBER() OVER (PARTITION BY c.g
                 ORDER BY ROUND($costT1 - $costL1 - $costR1, 6) DESC,
                   c.q ASC) AS rk
        FROM cums c WHERE c.q < 15 AND c.nl < c.nt),
      best AS (SELECT g, q AS q1, gain AS g1 FROM l1scan WHERE rk = 1),
      b1 AS (SELECT c.g, b.q1, b.g1, c.nl AS n1, c.sxl AS sx1,
                    c.syl AS sy1, c.sxxl AS sxx1, c.syyl AS syy1,
                    c.sxyl AS sxy1
             FROM cums c JOIN best b ON b.g = c.g AND b.q1 = c.q),
      allrow AS (
        SELECT e.g, 'all' AS segment, e.ng AS n_seg,
               CASE WHEN b.g1 IS NOT NULL AND e.ng >= 4
                     AND e.hi > e.lo THEN b.q1 + 1 END AS edge,
               CASE WHEN b.g1 IS NOT NULL AND e.ng >= 4
                     AND e.hi > e.lo
                 THEN ${thr.replace("Q", "b.q1")} END AS threshold,
               CASE WHEN b.g1 IS NOT NULL AND e.ng >= 4
                     AND e.hi > e.lo
                 THEN ROUND(b.g1 / 1000000000000.0, 6) END AS gain
        FROM edges e LEFT JOIN b1 b ON b.g = e.g),
      lcand AS (
        SELECT c.g, c.q, b.n1 AS n_seg, e.lo, e.hi,
               ROUND($parentL - $costL1 - $subLR, 6) AS gain,
               ROW_NUMBER() OVER (PARTITION BY c.g
                 ORDER BY ROUND($parentL - $costL1 - $subLR, 6) DESC,
                   c.q ASC) AS rk
        FROM cums c JOIN b1 b ON b.g = c.g JOIN edges e ON e.g = c.g
        WHERE c.q < b.q1 AND c.nl < b.n1 AND b.n1 >= 4),
      lrow AS (
        SELECT g, 'left' AS segment, n_seg, q + 1 AS edge,
               ${thr.replace("Q", "q").replace("e.lo", "lo")
                 .replace("e.hi", "hi")} AS threshold,
               ROUND(gain / 1000000000000.0, 6) AS gain
        FROM lcand WHERE rk = 1),
      rcand AS (
        SELECT c.g, c.q, (c.nt - b.n1) AS n_seg, e.lo, e.hi,
               ROUND($parentR - $subRL - $costR1, 6) AS gain,
               ROW_NUMBER() OVER (PARTITION BY c.g
                 ORDER BY ROUND($parentR - $subRL - $costR1, 6) DESC,
                   c.q ASC) AS rk
        FROM cums c JOIN b1 b ON b.g = c.g JOIN edges e ON e.g = c.g
        WHERE c.q > b.q1 AND c.q < 15 AND c.nl < c.nt
          AND c.nl > b.n1 AND (c.nt - b.n1) >= 4),
      rrow AS (
        SELECT g, 'right' AS segment, n_seg, q + 1 AS edge,
               ${thr.replace("Q", "q").replace("e.lo", "lo")
                 .replace("e.hi", "hi")} AS threshold,
               ROUND(gain / 1000000000000.0, 6) AS gain
        FROM rcand WHERE rk = 1)
      SELECT g AS event_type, segment,
             CAST(n_seg AS BIGINT) AS n_seg,
             CAST(edge AS BIGINT) AS edge,
             CAST(threshold AS DOUBLE) AS threshold,
             CAST(gain AS DOUBLE) AS gain
      FROM (SELECT * FROM allrow
            UNION ALL SELECT * FROM lrow
            UNION ALL SELECT * FROM rrow)
      ORDER BY event_type, segment"""
  }

  // The pinned MDE z-sum (z_{0.975} + z_{0.8}) — ONE Scala constant
  // interpolated into the oracle; Double.toString round-trips, so both
  // engines multiply by the identical double.
  private val mdeC: Double =
    Stats.MdeZ(("alpha", 0.05)) + Stats.MdeZ(("power", 0.8))

  // One generated temperature-scaling Newton pass: the 12-dp frozen
  // g/h folds at w_{i-1}, then the clamped 12-dp w update.
  private def tempPass(i: Int): String = s"""
      p$i AS (SELECT w, COUNT(*)::BIGINT AS n,
                    CAST(SUM(y) AS BIGINT) AS np,
                    SUM(CAST(ROUND(s * (1.0 / (1.0 + EXP(-(w * s)))
                      - y), 12) AS DECIMAL(38,12))) AS g,
                    SUM(CAST(ROUND(s * s
                      * (1.0 / (1.0 + EXP(-(w * s))))
                      * (1.0 - 1.0 / (1.0 + EXP(-(w * s)))), 12)
                      AS DECIMAL(38,12))) AS h
              FROM rows0 CROSS JOIN w${i - 1} GROUP BY w),
      w$i AS (SELECT CASE WHEN CAST(h AS DOUBLE) > 0.0 THEN
                       ROUND(GREATEST(0.001, LEAST(64.0,
                         w - CAST(g AS DOUBLE) / CAST(h AS DOUBLE))),
                         12)
                     ELSE w END AS w
              FROM p$i)"""

  // One generated gESD pass: moments → frozen z → frozen-max winner
  // (ties to the largest value via the two-pass filter) → decrement.
  private def gesdPass(i: Int): String = s"""
      m$i AS (SELECT g AS gm, SUM(c)::BIGINT AS n,
                    SUM(c::HUGEINT * xq) AS s1,
                    SUM(c::HUGEINT * xq * xq) AS q1
              FROM c$i GROUP BY g),
      s$i AS (SELECT c$i.g AS g, xq, c, n,
                    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                    (CAST(n AS DOUBLE) * CAST(q1 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                      / (CAST(n AS DOUBLE)
                        * (CAST(n AS DOUBLE) - 1.0)) AS vr
              FROM c$i JOIN m$i ON m$i.gm = c$i.g),
      z$i AS (SELECT g, xq, c, n,
                    CASE WHEN vr > 0.0 THEN SQRT(vr) END AS sd,
                    CASE WHEN vr > 0.0 THEN
                      ROUND(ABS(CAST(xq AS DOUBLE) - mu) / SQRT(vr), 6)
                    ELSE 0.0 END AS z
              FROM s$i),
      mz$i AS (SELECT g AS gz, MAX(z) AS mz FROM z$i GROUP BY g),
      w$i AS (SELECT g AS gw, MAX(xq) AS wx
              FROM z$i JOIN mz$i ON gz = z$i.g
              WHERE z = mz GROUP BY g),
      o$i AS (SELECT z$i.g AS g, $i AS pass, n AS n_remaining,
                    ROUND(CAST(xq AS DOUBLE) / 1000000.0, 6) AS suspect,
                    CASE WHEN sd IS NOT NULL AND n >= 3 THEN z END AS r
              FROM z$i JOIN w$i ON gw = z$i.g AND xq = wx),
      c${i + 1} AS (SELECT z$i.g AS g, xq,
                          CASE WHEN xq = wx THEN c - 1 ELSE c END AS c
                    FROM z$i JOIN w$i ON gw = z$i.g
                    WHERE CASE WHEN xq = wx THEN c - 1 ELSE c END > 0)"""

  // The q_did oracle generalized to the 2×2×2 design: per-cell picks,
  // both stratum DiD trees, the eight-term se sum in the SAME key
  // order as the Spark fold.
  private val dddOracle: String = {
    val keys = for (t <- 0 to 1; p <- 0 to 1; s <- 0 to 1)
      yield (t, p, s)
    def nm(pfx: String, k: (Int, Int, Int)) = s"$pfx${k._1}${k._2}${k._3}"
    val picks = keys.flatMap { k =>
      Seq(
        s"MAX(CASE WHEN t = ${k._1} AND p = ${k._2} AND s = ${k._3} " +
          s"THEN n END) AS ${nm("n", k)}",
        s"MAX(CASE WHEN t = ${k._1} AND p = ${k._2} AND s = ${k._3} " +
          s"THEN sv END) AS ${nm("s", k)}",
        s"MAX(CASE WHEN t = ${k._1} AND p = ${k._2} AND s = ${k._3} " +
          s"THEN q END) AS ${nm("q", k)}")
    }.mkString(",\n              ")
    def m(t: Int, p: Int, s: Int) =
      s"CAST(s$t$p$s AS DOUBLE) / CAST(n$t$p$s AS DOUBLE)"
    def did(s: Int) =
      s"((${m(1, 1, s)} - ${m(1, 0, s)}) - (${m(0, 1, s)} - ${m(0, 0, s)}))"
    val haveAll = keys.map(k => s"${nm("n", k)} IS NOT NULL")
      .mkString(" AND ")
    val allBig = keys.map(k => s"${nm("n", k)} >= 2").mkString(" AND ")
    val seSum = keys.map { case (t, p, s) =>
      s"""(CAST(n$t$p$s AS DOUBLE) * CAST(q$t$p$s AS DOUBLE)
                 - CAST(s$t$p$s AS DOUBLE) * CAST(s$t$p$s AS DOUBLE))
                 / (CAST(n$t$p$s AS DOUBLE)
                   * (CAST(n$t$p$s AS DOUBLE) - 1.0))
                 / CAST(n$t$p$s AS DOUBLE)"""
    }.mkString("\n               + ")
    s"""
      WITH pts AS (
        SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t,
               CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                 THEN 1 ELSE 0 END AS p,
               CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS s,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL),
      cells AS (SELECT t, p, s, COUNT(*)::BIGINT AS n,
                       SUM(v::HUGEINT) AS sv, SUM(v::HUGEINT * v) AS q
                FROM pts GROUP BY 1, 2, 3),
      f AS (SELECT SUM(n) AS n,
              $picks
            FROM cells)
      SELECT CAST(n AS BIGINT) AS n,
        CAST(CASE WHEN $haveAll THEN
          ROUND(${did(1)} / 1000000.0, 6) END AS DOUBLE) AS did_s1,
        CAST(CASE WHEN $haveAll THEN
          ROUND(${did(0)} / 1000000.0, 6) END AS DOUBLE) AS did_s0,
        CAST(CASE WHEN $haveAll THEN
          ROUND((${did(1)} - ${did(0)}) / 1000000.0, 6) END
          AS DOUBLE) AS ddd,
        CAST(CASE WHEN $haveAll AND $allBig THEN
          ROUND(SQRT(($seSum) / 1000000000000.0), 6) END
          AS DOUBLE) AS se
      FROM f"""
  }

  // Shared CTE text for the periodogram family (q_periodogram,
  // q_spectral_entropy): the acf cells/centering + the driver-literal
  // trig VALUES table, ending at `pw` (g, p, power).
  private val periodogramCtes: String = s"""WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      st AS (SELECT g, COUNT(*)::HUGEINT AS n, SUM(x)::HUGEINT AS s,
                    MIN(day) AS mind
             FROM cells GROUP BY g),
      a AS (SELECT c.g, c.day, st.n AS n, st.mind,
                   st.n * c.x - st.s AS aa
            FROM cells c JOIN st ON c.g = st.g),
      trig(p, k, c, sv) AS (VALUES
        ${(2 to 14).flatMap(p => (0 until p).map(k =>
          s"($p, $k, ${math.cos(2.0 * math.Pi * k / p)}, " +
            s"${math.sin(2.0 * math.Pi * k / p)})"))
          .mkString(",\n        ")}),
      terms AS (
        SELECT a.g, t.p, a.n,
               ROUND(CAST(a.aa AS DOUBLE)
                 / (CAST(a.n AS DOUBLE) * 1000000.0) * t.c, 12) AS ct,
               ROUND(CAST(a.aa AS DOUBLE)
                 / (CAST(a.n AS DOUBLE) * 1000000.0) * t.sv, 12) AS stt
        FROM a JOIN trig t ON t.k = (a.day - a.mind) % t.p),
      folded AS (
        SELECT g, p, MAX(CAST(n AS DOUBLE)) AS nd,
               SUM(CAST(ct AS DECIMAL(38,12))) AS cs,
               SUM(CAST(stt AS DECIMAL(38,12))) AS ss
        FROM terms GROUP BY g, p),
      pw AS (
        SELECT g, p,
               ROUND((CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE)
                 + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)) / nd, 6)
                 AS power
        FROM folded)"""

  val oracles: Map[String, String] = Map(

    "q_hurst" -> hurstOracle,
    "q_binseg" -> binsegOracle,

    // Lagged 6-dp returns, exact decimal power sums, the Sharpe tree
    // with the interpolated sqrt(252) digits.
    "q_sharpe" -> s"""
      WITH daily AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6)))
                 AS DOUBLE) / COUNT(*), 6) AS v
        FROM events GROUP BY 1, 2),
      lagd AS (SELECT g, d, v,
                      LAG(v) OVER (PARTITION BY g ORDER BY d) AS pv
               FROM daily),
      rets AS (SELECT g, ROUND(v / pv - 1.0, 6) AS r
               FROM lagd WHERE pv IS NOT NULL AND pv <> 0.0),
      agg AS (SELECT g, COUNT(*)::BIGINT AS n,
                     SUM(CAST(r AS DECIMAL(38,6))) AS s1,
                     SUM(CAST(ROUND(r * r, 12) AS DECIMAL(38,12)))
                       AS s2
              FROM rets GROUP BY g)
      SELECT g AS event_type, n AS n_days,
             CAST(ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS DOUBLE) AS mean_ret,
             CAST(CASE WHEN ok THEN ROUND(sd, 6) END AS DOUBLE)
               AS sd_ret,
             CAST(CASE WHEN ok THEN
               ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / sd
                 * ${math.sqrt(252.0)}, 6) END AS DOUBLE)
               AS sharpe_annual
      FROM (
        SELECT g, n, s1,
               SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                   * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0)) AS sd,
               (n >= 2 AND (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                   * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0) > 0.0) AS ok
        FROM agg)
      ORDER BY event_type""",

    // The q_sharpe returns CTEs with the downside fold: population
    // downside deviation, one rounded ratio ×√252 interpolated.
    "q_sortino" -> s"""
      WITH daily AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6)))
                 AS DOUBLE) / COUNT(*), 6) AS v
        FROM events GROUP BY 1, 2),
      lagd AS (SELECT g, d, v,
                      LAG(v) OVER (PARTITION BY g ORDER BY d) AS pv
               FROM daily),
      rets AS (SELECT g, ROUND(v / pv - 1.0, 6) AS r
               FROM lagd WHERE pv IS NOT NULL AND pv <> 0.0),
      agg AS (SELECT g, COUNT(*)::BIGINT AS n,
                     SUM(CAST(r AS DECIMAL(38,6))) AS s1,
                     SUM(CAST(CASE WHEN r < 0.0 THEN ROUND(r * r, 12)
                       ELSE 0.0 END AS DECIMAL(38,12))) AS sd2
              FROM rets GROUP BY g)
      SELECT g AS event_type, n AS n_days,
             CAST(ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS DOUBLE) AS mean_ret,
             CAST(CASE WHEN n >= 2
                        AND CAST(sd2 AS DOUBLE) / CAST(n AS DOUBLE) > 0.0
               THEN ROUND(SQRT(CAST(sd2 AS DOUBLE) / CAST(n AS DOUBLE)),
                 6) END AS DOUBLE) AS downside_dev,
             CAST(CASE WHEN n >= 2
                        AND CAST(sd2 AS DOUBLE) / CAST(n AS DOUBLE) > 0.0
               THEN ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
                 / SQRT(CAST(sd2 AS DOUBLE) / CAST(n AS DOUBLE))
                 * ${math.sqrt(252.0)}, 6) END AS DOUBLE)
               AS sortino_annual
      FROM agg
      ORDER BY event_type""",

    // Running max over the level series for the drawdown fraction,
    // the q_sharpe returns for the annualized numerator.
    "q_calmar" -> """
      WITH daily AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6)))
                 AS DOUBLE) / COUNT(*), 6) AS v
        FROM events GROUP BY 1, 2),
      rund AS (SELECT g, d, v,
                      MAX(v) OVER (PARTITION BY g ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS runmax,
                      LAG(v) OVER (PARTITION BY g ORDER BY d) AS pv
               FROM daily),
      per AS (SELECT g,
                     CASE WHEN runmax > 0.0
                       THEN ROUND(1.0 - v / runmax, 6) END AS dd,
                     CASE WHEN pv IS NOT NULL AND pv <> 0.0
                       THEN ROUND(v / pv - 1.0, 6) END AS r
              FROM rund),
      agg AS (SELECT g,
                     SUM(CASE WHEN r IS NOT NULL THEN 1 ELSE 0 END)
                       ::BIGINT AS n,
                     SUM(CAST(r AS DECIMAL(38,6))) AS s1,
                     MAX(dd) AS mdd
              FROM per GROUP BY g)
      SELECT g AS event_type, n AS n_days,
             CAST(CASE WHEN n >= 1 THEN
               ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) END
               AS DOUBLE) AS mean_ret,
             CAST(mdd AS DOUBLE) AS max_drawdown,
             CAST(CASE WHEN n >= 1 AND mdd > 0.0 THEN
               ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) * 252.0
                 / mdd, 6) END AS DOUBLE) AS calmar
      FROM agg
      ORDER BY event_type""",

    // Rank-based tail selection: the rank-r value and first-r
    // multiset are tie-invariant, so ROW_NUMBER without a tiebreak
    // mirrors exactly; CEIL on the identical double product.
    "q_var_cvar" -> """
      WITH daily AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6)))
                 AS DOUBLE) / COUNT(*), 6) AS v
        FROM events GROUP BY 1, 2),
      lagd AS (SELECT g, d, v,
                      LAG(v) OVER (PARTITION BY g ORDER BY d) AS pv
               FROM daily),
      rets AS (SELECT g, ROUND(ROUND(v / pv - 1.0, 6), 6) AS r
               FROM lagd WHERE pv IS NOT NULL AND pv <> 0.0),
      ranked AS (
        SELECT g, r,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY r) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS n
        FROM rets),
      sel AS (SELECT g, r, rn, n,
                     CAST(CEIL(0.1 * n) AS BIGINT) AS rr
              FROM ranked)
      SELECT g AS event_type, MAX(n)::BIGINT AS n,
             MAX(rr)::BIGINT AS n_tail,
             CAST(MAX(CASE WHEN rn = rr THEN r END) AS DOUBLE)
               AS var_alpha,
             CAST(ROUND(CAST(SUM(CASE WHEN rn <= rr
                 THEN CAST(r AS DECIMAL(38,6)) END) AS DOUBLE)
               / CAST(MAX(rr) AS DOUBLE), 6) AS DOUBLE) AS cvar_alpha
      FROM sel GROUP BY g
      ORDER BY event_type""",

    // The q_sharpe returns CTEs with decimal(38,6) partial-moment
    // sums; one rounded gain/loss ratio, NULL on a loss-free group.
    "q_omega_ratio" -> """
      WITH daily AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6)))
                 AS DOUBLE) / COUNT(*), 6) AS v
        FROM events GROUP BY 1, 2),
      lagd AS (SELECT g, d, v,
                      LAG(v) OVER (PARTITION BY g ORDER BY d) AS pv
               FROM daily),
      rets AS (SELECT g, ROUND(v / pv - 1.0, 6) AS r
               FROM lagd WHERE pv IS NOT NULL AND pv <> 0.0),
      agg AS (SELECT g, COUNT(*)::BIGINT AS n,
                     SUM(CAST(CASE WHEN r > 0.0 THEN r ELSE 0.0 END
                       AS DECIMAL(38,6))) AS gs,
                     SUM(CAST(CASE WHEN r < 0.0 THEN -r ELSE 0.0 END
                       AS DECIMAL(38,6))) AS ls
              FROM rets GROUP BY g)
      SELECT g AS event_type, n AS n_days,
             CAST(ROUND(CAST(gs AS DOUBLE), 6) AS DOUBLE) AS gain_sum,
             CAST(ROUND(CAST(ls AS DOUBLE), 6) AS DOUBLE) AS loss_sum,
             CAST(CASE WHEN CAST(ls AS DOUBLE) > 0.0 THEN
               ROUND(CAST(gs AS DOUBLE) / CAST(ls AS DOUBLE), 6) END
               AS DOUBLE) AS omega
      FROM agg
      ORDER BY event_type""",

    // The q_calmar drawdown-fraction series squared into a
    // decimal(38,12) fold; 6-dp-frozen ulcer index inside the Martin
    // tree.
    "q_ulcer" -> """
      WITH daily AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6)))
                 AS DOUBLE) / COUNT(*), 6) AS v
        FROM events GROUP BY 1, 2),
      rund AS (SELECT g, d, v,
                      MAX(v) OVER (PARTITION BY g ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS runmax,
                      LAG(v) OVER (PARTITION BY g ORDER BY d) AS pv
               FROM daily),
      per AS (SELECT g,
                     CASE WHEN runmax > 0.0
                       THEN ROUND(1.0 - v / runmax, 6) END AS dd,
                     CASE WHEN pv IS NOT NULL AND pv <> 0.0
                       THEN ROUND(v / pv - 1.0, 6) END AS r
              FROM rund),
      agg AS (SELECT g,
                     SUM(CASE WHEN dd IS NOT NULL THEN 1 ELSE 0 END)
                       ::BIGINT AS n,
                     SUM(CAST(ROUND(dd * dd, 12) AS DECIMAL(38,12)))
                       AS sd2,
                     SUM(CASE WHEN r IS NOT NULL THEN 1 ELSE 0 END)
                       ::BIGINT AS nr,
                     SUM(CAST(r AS DECIMAL(38,6))) AS s1
              FROM per GROUP BY g),
      fin AS (SELECT g, n, nr, s1,
                     CASE WHEN n >= 1 THEN
                       ROUND(SQRT(CAST(sd2 AS DOUBLE)
                         / CAST(n AS DOUBLE)), 6) END AS ui
              FROM agg)
      SELECT g AS event_type, n AS n_days,
             CAST(ui AS DOUBLE) AS ulcer_index,
             CAST(CASE WHEN ui > 0.0 AND nr >= 1 THEN
               ROUND(CAST(s1 AS DOUBLE) / CAST(nr AS DOUBLE) * 252.0
                 / ui, 6) END AS DOUBLE) AS martin
      FROM fin
      ORDER BY event_type""",

    // Win/loss partial moments from the q_sharpe returns; p and b
    // frozen at 12 dp before the Kelly tree.
    "q_kelly" -> """
      WITH daily AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6)))
                 AS DOUBLE) / COUNT(*), 6) AS v
        FROM events GROUP BY 1, 2),
      lagd AS (SELECT g, d, v,
                      LAG(v) OVER (PARTITION BY g ORDER BY d) AS pv
               FROM daily),
      rets AS (SELECT g, ROUND(v / pv - 1.0, 6) AS r
               FROM lagd WHERE pv IS NOT NULL AND pv <> 0.0),
      agg AS (SELECT g, COUNT(*)::BIGINT AS n,
                     SUM(CASE WHEN r > 0.0 THEN 1 ELSE 0 END)::BIGINT
                       AS w,
                     SUM(CASE WHEN r < 0.0 THEN 1 ELSE 0 END)::BIGINT
                       AS l,
                     SUM(CAST(CASE WHEN r > 0.0 THEN r ELSE 0.0 END
                       AS DECIMAL(38,6))) AS gs,
                     SUM(CAST(CASE WHEN r < 0.0 THEN -r ELSE 0.0 END
                       AS DECIMAL(38,6))) AS ls
              FROM rets GROUP BY g),
      fin AS (SELECT g, n, w, l,
                     (w >= 1 AND l >= 1) AS ok,
                     ROUND(CAST(w AS DOUBLE) / CAST(w + l AS DOUBLE),
                       12) AS p,
                     ROUND((CAST(gs AS DOUBLE) / CAST(w AS DOUBLE))
                       / (CAST(ls AS DOUBLE) / CAST(l AS DOUBLE)), 12)
                       AS b
              FROM agg)
      SELECT g AS event_type, n AS n_days, w AS n_wins, l AS n_losses,
             CAST(CASE WHEN ok THEN ROUND(p, 6) END AS DOUBLE)
               AS p_win,
             CAST(CASE WHEN ok THEN ROUND(b, 6) END AS DOUBLE)
               AS payoff_b,
             CAST(CASE WHEN ok AND b > 0.0 THEN
               ROUND(p - (1.0 - p) / b, 6) END AS DOUBLE) AS kelly
      FROM fin
      ORDER BY event_type""",

    // The q_gwet_ac1 fold shape with the squared-averaged-marginal
    // chance term p_e = Σπ² (no k−1 division).
    "q_scott_pi" -> """
      WITH rated AS (
        SELECT SUBSTR(o_orderpriority, 1, 1) AS a,
               CAST(LEAST(5, 1 + CAST(FLOOR(o_totalprice / 100000.0)
                 AS BIGINT)) AS VARCHAR) AS b
        FROM orders
        WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
      nn AS (SELECT COUNT(*)::BIGINT AS n,
                    SUM(CASE WHEN a = b THEN 1 ELSE 0 END)::BIGINT
                      AS agree
             FROM rated),
      am AS (SELECT a AS c, COUNT(*)::BIGINT AS ca FROM rated GROUP BY a),
      bm AS (SELECT b AS c, COUNT(*)::BIGINT AS cb FROM rated GROUP BY b),
      cats AS (
        SELECT COUNT(*)::BIGINT AS k,
               SUM(CAST(ROUND(pi * pi, 12) AS DECIMAL(38,12))) AS spi2
        FROM (
          SELECT ROUND((CAST(COALESCE(am.ca, 0) AS DOUBLE)
                   / CAST(nn.n AS DOUBLE)
                 + CAST(COALESCE(bm.cb, 0) AS DOUBLE)
                   / CAST(nn.n AS DOUBLE)) / 2.0, 12) AS pi
          FROM am FULL OUTER JOIN bm ON bm.c = am.c
          CROSS JOIN nn)),
      fin AS (
        SELECT nn.n, cats.k,
               ROUND(CAST(agree AS DOUBLE) / CAST(nn.n AS DOUBLE), 12)
                 AS po,
               ROUND(CAST(cats.spi2 AS DOUBLE), 12) AS pe
        FROM nn CROSS JOIN cats)
      SELECT n, k AS n_categories,
             CAST(ROUND(po, 6) AS DOUBLE) AS po,
             CAST(ROUND(pe, 6) AS DOUBLE) AS pe,
             CAST(CASE WHEN pe < 1.0 THEN
               ROUND((po - pe) / (1.0 - pe), 6) END AS DOUBLE)
               AS scott_pi
      FROM fin""",

    // Day cells, exact long moving ranges, 6-dp-frozen x̄/MR̄ inside
    // the 2.66/3.267 band trees.
    "q_imr_chart" -> """
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      wm AS (SELECT g, day, x,
                    ABS(x - LAG(x) OVER (PARTITION BY g ORDER BY day))
                      AS mr
             FROM cells),
      f AS (SELECT g AS gm, COUNT(*)::BIGINT AS n,
                   SUM(CAST(x AS DECIMAL(38,0))) AS sx,
                   SUM(CASE WHEN mr IS NOT NULL THEN 1 ELSE 0 END)
                     ::BIGINT AS nmr,
                   SUM(CAST(mr AS DECIMAL(38,0))) AS smr
            FROM wm GROUP BY g),
      j AS (SELECT wm.g, wm.day, wm.x, wm.mr,
                   ROUND(CAST(sx AS DOUBLE)
                     / (CAST(n AS DOUBLE) * 1000000.0), 6) AS xbar,
                   CASE WHEN nmr >= 1 THEN
                     ROUND(CAST(smr AS DOUBLE)
                       / (CAST(nmr AS DOUBLE) * 1000000.0), 6) END
                     AS mrbar,
                   ROUND(CAST(wm.x AS DOUBLE) / 1000000.0, 6) AS v,
                   ROUND(CAST(wm.mr AS DOUBLE) / 1000000.0, 6) AS mrv
            FROM wm JOIN f ON f.gm = wm.g)
      SELECT g AS event_type, day, CAST(v AS DOUBLE) AS x,
             CAST(mrv AS DOUBLE) AS moving_range,
             CAST(xbar AS DOUBLE) AS center,
             CAST(ROUND(xbar - 2.66 * mrbar, 6) AS DOUBLE) AS lcl,
             CAST(ROUND(xbar + 2.66 * mrbar, 6) AS DOUBLE) AS ucl,
             CAST(ROUND(3.267 * mrbar, 6) AS DOUBLE) AS mr_ucl,
             COALESCE(v > ROUND(xbar + 2.66 * mrbar, 6)
               OR v < ROUND(xbar - 2.66 * mrbar, 6)
               OR mrv > ROUND(3.267 * mrbar, 6), FALSE)
               AS out_of_control
      FROM j
      ORDER BY event_type, day""",

    // Per-user (x, y) units, one decimal(38,12) moment fold, 12-dp
    // frozen R inside the moment-identity variance tree, pinned
    // z = 1.959964.
    "q_delta_method" -> """
      WITH units AS (
        SELECT event_type AS g, user_id AS u,
               ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6)))
                 AS DOUBLE), 6) AS x,
               ROUND(CAST(SUM(CAST(ROUND(1.0, 6) AS DECIMAL(38,6)))
                 AS DOUBLE), 6) AS y
        FROM events GROUP BY 1, 2),
      f AS (SELECT g, COUNT(*)::BIGINT AS n,
                   SUM(CAST(x AS DECIMAL(38,12))) AS sx,
                   SUM(CAST(y AS DECIMAL(38,12))) AS sy,
                   SUM(CAST(ROUND(x * x, 12) AS DECIMAL(38,12))) AS sxx,
                   SUM(CAST(ROUND(x * y, 12) AS DECIMAL(38,12))) AS sxy,
                   SUM(CAST(ROUND(y * y, 12) AS DECIMAL(38,12))) AS syy
            FROM units GROUP BY g),
      rr AS (SELECT g, n, sx, sy, sxx, sxy, syy,
                    CASE WHEN n >= 2 AND CAST(sy AS DOUBLE) <> 0.0 THEN
                      ROUND(CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE),
                        12) END AS r
             FROM f),
      vv AS (SELECT g, n, r,
                    CAST(sxx AS DOUBLE) - 2.0 * r * CAST(sxy AS DOUBLE)
                      + r * r * CAST(syy AS DOUBLE) AS ss,
                    (CAST(sxx AS DOUBLE)
                      - 2.0 * r * CAST(sxy AS DOUBLE)
                      + r * r * CAST(syy AS DOUBLE))
                      / (CAST(n AS DOUBLE)
                        * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                        * CAST(n AS DOUBLE)) AS vr
             FROM rr)
      SELECT g AS event_type, n AS n_units,
             CAST(ROUND(r, 6) AS DOUBLE) AS ratio,
             CAST(CASE WHEN r IS NOT NULL AND ss > 0.0 THEN
               ROUND(SQRT(vr), 6) END AS DOUBLE) AS se,
             CAST(CASE WHEN r IS NOT NULL AND ss > 0.0 THEN
               ROUND(r - 1.959964 * SQRT(vr), 6) END AS DOUBLE)
               AS ci_lo,
             CAST(CASE WHEN r IS NOT NULL AND ss > 0.0 THEN
               ROUND(r + 1.959964 * SQRT(vr), 6) END AS DOUBLE)
               AS ci_hi
      FROM vv
      ORDER BY event_type""",

    // Per-user lag gaps, global 16-bin grid with empty bins advancing
    // the reference, group-MLE rate, 12-dp frozen |ECDF − expCDF|.
    "q_ks_exponential" -> """
      WITH ev AS (
        SELECT user_id, event_type, event_id,
               CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec
        FROM events),
      gaps AS (
        SELECT event_type AS g,
               sec - LAG(sec) OVER (PARTITION BY user_id
                 ORDER BY ts_order, event_id) AS v
        FROM (SELECT user_id, event_type, event_id, sec,
                     sec AS ts_order FROM ev) t),
      gv AS (SELECT g, v FROM gaps WHERE v IS NOT NULL),
      st AS (SELECT CAST(MAX(v) AS DOUBLE) AS hi FROM gv),
      cells AS (
        SELECT g,
               CAST(LEAST(FLOOR(v * 16 / hi), 15) AS BIGINT) AS q,
               COUNT(*)::BIGINT AS c,
               SUM(CAST(ROUND(v * 1000000.0) AS BIGINT)::HUGEINT) AS sx
        FROM gv CROSS JOIN st WHERE hi > 0.0
        GROUP BY g, 2),
      grps AS (SELECT g, SUM(c)::BIGINT AS n, SUM(sx) AS sxg
               FROM cells GROUP BY g),
      grid AS (
        SELECT gr.g, v.qq, gr.n, gr.sxg, COALESCE(ce.c, 0)::BIGINT AS c
        FROM (SELECT UNNEST(RANGE(0, 16)) AS qq) v
        CROSS JOIN grps gr
        LEFT JOIN cells ce ON ce.g IS NOT DISTINCT FROM gr.g
                          AND ce.q IS NOT DISTINCT FROM v.qq),
      cum AS (
        SELECT g, qq, n, sxg,
               SUM(c) OVER (PARTITION BY g ORDER BY qq) AS cum
        FROM grid),
      terms AS (
        SELECT g, n,
               CAST(n AS DOUBLE) * 1000000.0 / CAST(sxg AS DOUBLE)
                 AS lam,
               ROUND(ABS(CAST(cum AS DOUBLE) / CAST(n AS DOUBLE)
                 - (1.0 - EXP(-(CAST(n AS DOUBLE) * 1000000.0
                     / CAST(sxg AS DOUBLE))
                   * ((SELECT hi FROM st) * CAST(qq + 1 AS DOUBLE)
                      / 16)))), 12) AS term
        FROM cum)
      SELECT g AS event_type, MAX(n)::BIGINT AS n,
             CAST(ROUND(MAX(lam), 12) AS DOUBLE) AS rate,
             CAST(ROUND(MAX(term), 6) AS DOUBLE) AS ks
      FROM terms GROUP BY g
      ORDER BY event_type""",

    // Counting-selected order statistics over (group, value) cells;
    // k from one pinned-z double tree, identical both engines.
    "q_median_ci" -> s"""
      WITH cells AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS v,
               COUNT(*)::BIGINT AS c
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      r AS (
        SELECT g, v, c,
               SUM(c) OVER (PARTITION BY g ORDER BY v) AS cum,
               SUM(c) OVER (PARTITION BY g) AS n
        FROM cells),
      kk AS (
        SELECT *,
               GREATEST(1, CAST(FLOOR((CAST(n AS DOUBLE)
                 - ${Stats.MdeZ(("alpha", 0.05))}
                 * SQRT(CAST(n AS DOUBLE))) / 2.0) AS BIGINT)) AS k,
               CAST(FLOOR((CAST(n AS DOUBLE) + 1.0) / 2.0) AS BIGINT)
                 AS mr
        FROM r),
      agg AS (
        SELECT g, MAX(n)::BIGINT AS n,
               MIN(CASE WHEN cum >= mr THEN v END) / 1000000.0
                 AS median_lo,
               MIN(CASE WHEN cum >= k THEN v END) / 1000000.0 AS lo,
               MIN(CASE WHEN cum >= n + 1 - k THEN v END) / 1000000.0
                 AS hi
        FROM kk GROUP BY g)
      SELECT g AS event_type, n,
             CAST(median_lo AS DOUBLE) AS median_lo,
             CAST(CASE WHEN n >= 6 THEN lo END AS DOUBLE) AS ci_lo,
             CAST(CASE WHEN n >= 6 THEN hi END AS DOUBLE) AS ci_hi
      FROM agg ORDER BY event_type""",

    // Exact decimal moments, pinned z-sum constant, sd/mean/MDE each
    // one identically-spelled rounded tree.
    "q_mde" -> s"""
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL),
      st AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(x::HUGEINT) AS sx, SUM(x::HUGEINT * x) AS q
        FROM pts GROUP BY g),
      fl AS (
        SELECT g, n,
               (CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS vs,
               CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0 AS mean
        FROM st),
      f2 AS (
        SELECT g, n, vs, mean, SQRT(vs) / 1000000.0 AS sd FROM fl),
      f3 AS (
        SELECT g, n, vs, mean, sd,
               $mdeC * sd * SQRT(2.0 / CAST(n AS DOUBLE)) AS mde
        FROM f2)
      SELECT g AS event_type, n,
             CAST(ROUND(mean, 6) AS DOUBLE) AS mean,
             CAST(CASE WHEN n >= 2 AND vs > 0.0 THEN ROUND(sd, 6) END
               AS DOUBLE) AS sd,
             CAST(CASE WHEN n >= 2 AND vs > 0.0 THEN ROUND(mde, 6) END
               AS DOUBLE) AS mde_abs,
             CAST(CASE WHEN n >= 2 AND vs > 0.0 AND mean <> 0.0 THEN
               ROUND(mde / mean, 6) END AS DOUBLE) AS mde_rel
      FROM f3 ORDER BY event_type""",

    // The q_kaplan_meier subjects + exact integer pair counts;
    // C = (2c + t)/(2p) one rounded division.
    "q_c_index" -> """
      WITH subj AS (
        SELECT user_id,
               DATE_DIFF('day', MIN(CAST(ts AS DATE)),
                 COALESCE(MIN(CASE WHEN event_type = 'purchase'
                                THEN CAST(ts AS DATE) END),
                          MAX(CAST(ts AS DATE)))) AS duration,
               MIN(CASE WHEN event_type = 'purchase'
                     THEN CAST(ts AS DATE) END) IS NOT NULL AS observed,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS risk
        FROM events GROUP BY user_id),
      pts AS (SELECT CAST(duration AS BIGINT) AS t,
                     CASE WHEN observed THEN 1 ELSE 0 END AS e,
                     CAST(ROUND(risk * 1000000.0) AS BIGINT) AS r
              FROM subj
              WHERE duration IS NOT NULL AND risk IS NOT NULL),
      pr AS (SELECT COUNT(*)::HUGEINT AS np,
               SUM(CASE WHEN a.r > b.r THEN 1 ELSE 0 END)::HUGEINT AS c,
               SUM(CASE WHEN a.r = b.r THEN 1 ELSE 0 END)::HUGEINT
                 AS tie
             FROM (SELECT t, r FROM pts WHERE e = 1) a
             JOIN pts b ON a.t < b.t),
      n AS (SELECT COUNT(*)::BIGINT AS n FROM pts)
      SELECT n,
             COALESCE(np, 0)::BIGINT AS n_pairs,
             COALESCE(c, 0)::BIGINT AS concordant,
             COALESCE(tie, 0)::BIGINT AS tied,
             CAST(CASE WHEN np > 0 THEN
               ROUND(CAST(2 * c + tie AS DOUBLE)
                 / CAST(2 * np AS DOUBLE), 6) END AS DOUBLE) AS c_index
      FROM n CROSS JOIN pr""",

    // The q_acf fold; Bartlett weights 1.5/1.0/0.5 are exact binary
    // literals, the kernel sum is one fixed expression tree, each se
    // one rounded tree (n^2 * 1e6 descale folded in).
    "q_hac_se" -> """
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      st AS (SELECT g, COUNT(*)::HUGEINT AS n, SUM(x)::HUGEINT AS s
             FROM cells GROUP BY g),
      a AS (SELECT c.g, c.day, st.n * c.x - st.s AS aa, st.s
            FROM cells c JOIN st ON c.g = st.g),
      lagged AS (
        SELECT g, aa, s,
               LEAD(aa, 1) OVER w AS l1,
               LEAD(aa, 2) OVER w AS l2,
               LEAD(aa, 3) OVER w AS l3
        FROM a WINDOW w AS (PARTITION BY g ORDER BY day)),
      agg AS (
        SELECT g, COUNT(*)::BIGINT AS n_days, MAX(s) AS sm,
               SUM(aa * aa) AS d0,
               SUM(aa * l1) AS n1, SUM(aa * l2) AS n2,
               SUM(aa * l3) AS n3
        FROM lagged GROUP BY g)
      SELECT g AS event_type, n_days,
        CAST(ROUND(CAST(sm AS DOUBLE) / CAST(n_days AS DOUBLE)
          / 1000000.0, 6) AS DOUBLE) AS mean,
        CAST(CASE WHEN n_days > 3 AND CAST(d0 AS DOUBLE) > 0.0 THEN
          ROUND(SQRT(CAST(d0 AS DOUBLE))
            / (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE))
            / 1000000.0, 6) END AS DOUBLE) AS se_iid,
        CAST(CASE WHEN n_days > 3
            AND CAST(d0 AS DOUBLE) + 1.5 * CAST(n1 AS DOUBLE)
              + 1.0 * CAST(n2 AS DOUBLE) + 0.5 * CAST(n3 AS DOUBLE)
              > 0.0 THEN
          ROUND(SQRT(CAST(d0 AS DOUBLE) + 1.5 * CAST(n1 AS DOUBLE)
              + 1.0 * CAST(n2 AS DOUBLE) + 0.5 * CAST(n3 AS DOUBLE))
            / (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE))
            / 1000000.0, 6) END AS DOUBLE) AS se_hac
      FROM agg ORDER BY event_type""",

    // Exact side-vs-rest counts; the arcsine tree spelled once and
    // frozen at 6 dp.
    "q_cohens_h" -> """
      WITH g AS (SELECT event_type,
                   COUNT(*)::BIGINT AS n,
                   SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)::BIGINT
                     AS s
                 FROM events WHERE value IS NOT NULL
                 GROUP BY event_type),
      t AS (SELECT SUM(n)::BIGINT AS nt, SUM(s)::BIGINT AS st FROM g)
      SELECT event_type, n AS n_g, (nt - n)::BIGINT AS n_rest,
             CAST(ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS DOUBLE) AS p_g,
             CAST(CASE WHEN nt - n > 0 THEN
               ROUND(CAST(st - s AS DOUBLE) / CAST(nt - n AS DOUBLE), 6)
               END AS DOUBLE) AS p_rest,
             CAST(CASE WHEN n > 0 AND nt - n > 0 THEN
               ROUND(2.0 * ASIN(SQRT(CAST(s AS DOUBLE)
                   / CAST(n AS DOUBLE)))
                 - 2.0 * ASIN(SQRT(CAST(st - s AS DOUBLE)
                   / CAST(nt - n AS DOUBLE))), 6) END AS DOUBLE) AS h
      FROM g CROSS JOIN t ORDER BY event_type""",

    // Exact 2x2 cells; ln OR frozen at 12 dp, one exp tree per bound;
    // any zero cell -> NULL (Woolf is undefined there).
    "q_odds_ratio" -> """
      WITH base AS (
        SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS e,
               CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS o
        FROM events WHERE value IS NOT NULL),
      cells AS (SELECT COALESCE(SUM(e * o), 0)::BIGINT AS a,
                       COALESCE(SUM(e * (1 - o)), 0)::BIGINT AS b,
                       COALESCE(SUM((1 - e) * o), 0)::BIGINT AS c,
                       COALESCE(SUM((1 - e) * (1 - o)), 0)::BIGINT AS d
                FROM base)
      SELECT a, b, c, d,
        CAST(CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
          ROUND(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
            / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)), 6) END
          AS DOUBLE) AS odds_ratio,
        CAST(CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
          ROUND(EXP(ROUND(LN(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
              / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE))), 12)
            - 1.959964 * SQRT(1.0 / CAST(a AS DOUBLE)
              + 1.0 / CAST(b AS DOUBLE) + 1.0 / CAST(c AS DOUBLE)
              + 1.0 / CAST(d AS DOUBLE))), 6) END AS DOUBLE) AS ci_lo,
        CAST(CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
          ROUND(EXP(ROUND(LN(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
              / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE))), 12)
            + 1.959964 * SQRT(1.0 / CAST(a AS DOUBLE)
              + 1.0 / CAST(b AS DOUBLE) + 1.0 / CAST(c AS DOUBLE)
              + 1.0 / CAST(d AS DOUBLE))), 6) END AS DOUBLE) AS ci_hi
      FROM cells""",

    // Exact 1e6-quantized differences; bias/sd/limits spelled once,
    // sd frozen before the +/- arms.
    "q_bland_altman" -> """
      WITH d AS (
        SELECT CAST(ROUND(value * 1000000.0) AS BIGINT)
               - CAST(ROUND(ROUND(value, 0) * 1000000.0) AS BIGINT) AS dd
        FROM events
        WHERE value IS NOT NULL AND ROUND(value, 0) IS NOT NULL),
      m AS (SELECT COUNT(*)::BIGINT AS n, SUM(dd::HUGEINT) AS s,
                   SUM(dd::HUGEINT * dd) AS q
            FROM d)
      SELECT n,
        CAST(CASE WHEN n > 0 THEN ROUND(CAST(s AS DOUBLE)
          / CAST(n AS DOUBLE) / 1000000.0, 6) END AS DOUBLE) AS bias,
        CAST(CASE WHEN n >= 2 THEN
          ROUND(SQRT((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
            / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
            / 1000000.0, 6) END AS DOUBLE) AS sd,
        CAST(CASE WHEN n >= 2 THEN
          ROUND(ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
              / 1000000.0, 6)
            - 1.96 * ROUND(SQRT((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
              / 1000000.0, 6), 6) END AS DOUBLE) AS loa_lo,
        CAST(CASE WHEN n >= 2 THEN
          ROUND(ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
              / 1000000.0, 6)
            + 1.96 * ROUND(SQRT((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
              / 1000000.0, 6), 6) END AS DOUBLE) AS loa_hi
      FROM m""",

    // The q_decompose CTEs; components re-quantized to exact 1e6
    // longs, HUGEINT variance moments, one strength tree each.
    "q_seasonal_strength" -> """
      WITH cells AS (
        SELECT event_type AS g,
               DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS y
        FROM events GROUP BY 1, CAST(ts AS DATE)),
      pts AS (
        SELECT g, CAST(x AS BIGINT) AS x,
               CAST(ROUND(y * 1000000.0) AS BIGINT) AS yq
        FROM cells WHERE x IS NOT NULL AND y IS NOT NULL),
      ma AS (
        SELECT g, x, yq, COUNT(*) OVER w7 AS nw, SUM(yq) OVER w7 AS s7
        FROM pts WINDOW w7 AS (PARTITION BY g ORDER BY x
          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      tr AS (
        SELECT g, x, yq,
               CASE WHEN nw = 7 THEN
                 ROUND(s7 / 7.0 / 1000000.0, 6) END AS trend,
               ((x % 7) + 7) % 7 AS phase
        FROM ma),
      det AS (
        SELECT g, x, yq, trend, phase,
               ROUND(yq / 1000000.0 - trend, 6) AS det
        FROM tr),
      pm AS (
        SELECT g, phase,
               ROUND(CAST(SUM(CAST(det AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*), 6) AS smean
        FROM det WHERE det IS NOT NULL GROUP BY g, phase),
      ct AS (
        SELECT g, ROUND(CAST(SUM(CAST(smean AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*), 6) AS c
        FROM pm GROUP BY g),
      j AS (
        SELECT d.g, d.x, d.yq, d.trend,
               ROUND(pm.smean - ct.c, 6) AS scenter
        FROM det d LEFT JOIN pm ON d.g = pm.g AND d.phase = pm.phase
        LEFT JOIN ct ON d.g = ct.g),
      comp AS (
        SELECT g,
               CAST(ROUND(ROUND(yq / 1000000.0 - trend - scenter, 6)
                 * 1000000.0) AS BIGINT) AS r,
               CAST(ROUND(scenter * 1000000.0) AS BIGINT)
                 + CAST(ROUND(ROUND(yq / 1000000.0 - trend - scenter, 6)
                   * 1000000.0) AS BIGINT) AS sr,
               CAST(ROUND(trend * 1000000.0) AS BIGINT)
                 + CAST(ROUND(ROUND(yq / 1000000.0 - trend - scenter, 6)
                   * 1000000.0) AS BIGINT) AS tr
        FROM j WHERE trend IS NOT NULL),
      m AS (SELECT g, COUNT(*)::BIGINT AS n,
              SUM(r::HUGEINT) AS s1, SUM(r::HUGEINT * r) AS q1,
              SUM(sr::HUGEINT) AS s2, SUM(sr::HUGEINT * sr) AS q2,
              SUM(tr::HUGEINT) AS s3, SUM(tr::HUGEINT * tr) AS q3
            FROM comp GROUP BY g)
      SELECT g AS event_type, n,
        CAST(CASE WHEN n >= 3 AND (CAST(n AS DOUBLE) * CAST(q3 AS DOUBLE)
            - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE))
            / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) > 0.0 THEN
          ROUND(GREATEST(0.0, 1.0 -
            ((CAST(n AS DOUBLE) * CAST(q1 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
            / ((CAST(n AS DOUBLE) * CAST(q3 AS DOUBLE)
              - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE))
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))), 6)
          END AS DOUBLE) AS trend_strength,
        CAST(CASE WHEN n >= 3 AND (CAST(n AS DOUBLE) * CAST(q2 AS DOUBLE)
            - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
            / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) > 0.0 THEN
          ROUND(GREATEST(0.0, 1.0 -
            ((CAST(n AS DOUBLE) * CAST(q1 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
            / ((CAST(n AS DOUBLE) * CAST(q2 AS DOUBLE)
              - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))), 6)
          END AS DOUBLE) AS seasonal_strength
      FROM m ORDER BY event_type""",

    // The q_rolling_corr windowed-moment machinery with the slope
    // projection: one rounded division of exact integers per row.
    "q_rolling_slope" -> """
      WITH cells AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS y,
               CAST(DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE))
                 AS DOUBLE) AS x
        FROM events GROUP BY 1, 2),
      sc AS (SELECT g, d,
                    CAST(ROUND(x * 1000000.0) AS BIGINT)::HUGEINT AS qx,
                    CAST(ROUND(y * 1000000.0) AS BIGINT)::HUGEINT AS qy
             FROM cells),
      w AS (
        SELECT g, d,
               COUNT(*) OVER fr AS n,
               SUM(qx) OVER fr AS sx, SUM(qy) OVER fr AS sy,
               SUM(qx * qx) OVER fr AS sxx,
               SUM(qx * qy) OVER fr AS sxy
        FROM sc
        WINDOW fr AS (PARTITION BY g ORDER BY d
          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      SELECT g AS event_type, CAST(d AS VARCHAR) AS d, n::BIGINT AS n,
             CAST(CASE WHEN n >= 7
                    AND CAST(n::HUGEINT * sxx - sx * sx AS DOUBLE) > 0.0
               THEN ROUND(CAST(n::HUGEINT * sxy - sx * sy AS DOUBLE)
                 / CAST(n::HUGEINT * sxx - sx * sx AS DOUBLE), 6)
             END AS DOUBLE) AS slope
      FROM w
      ORDER BY event_type, d""",

    // The q_kendall CTEs with the gamma / Somers' D projections: one
    // rounded division each on the same exact integers.
    "q_ordinal" -> """
      WITH cells AS (
        SELECT event_type AS g,
               DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS y
        FROM events GROUP BY event_type, CAST(ts AS DATE)),
      wid AS (SELECT g, x, y,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY x, y) AS rid
              FROM cells),
      pr AS (
        SELECT a.g,
               CASE WHEN (a.x < b.x AND a.y < b.y)
                      OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END AS con,
               CASE WHEN (a.x < b.x AND a.y > b.y)
                      OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END AS dis
        FROM wid a JOIN wid b ON a.g = b.g AND a.rid < b.rid),
      pa AS (SELECT g, SUM(con)::BIGINT AS concordant,
                    SUM(dis)::BIGINT AS discordant
             FROM pr GROUP BY g),
      tx AS (SELECT g, SUM(t * (t - 1))::BIGINT AS n1d
             FROM (SELECT g, x, COUNT(*) AS t FROM cells GROUP BY g, x)
             GROUP BY g),
      ty AS (SELECT g, SUM(t * (t - 1))::BIGINT AS n2d
             FROM (SELECT g, y, COUNT(*) AS t FROM cells GROUP BY g, y)
             GROUP BY g),
      base AS (SELECT g, COUNT(*)::BIGINT AS n FROM cells GROUP BY g)
      SELECT base.g AS event_type, base.n,
             COALESCE(pa.concordant, 0)::BIGINT AS concordant,
             COALESCE(pa.discordant, 0)::BIGINT AS discordant,
             CAST(CASE WHEN pa.concordant + pa.discordant > 0 THEN
               ROUND(CAST(pa.concordant - pa.discordant AS DOUBLE)
                 / CAST(pa.concordant + pa.discordant AS DOUBLE), 6)
               END AS DOUBLE) AS gamma,
             CAST(CASE WHEN
                 CAST(base.n * (base.n - 1) - tx.n1d AS DOUBLE) / 2.0
                 > 0.0 THEN
               ROUND(CAST(pa.concordant - pa.discordant AS DOUBLE)
                 / (CAST(base.n * (base.n - 1) - tx.n1d AS DOUBLE)
                   / 2.0), 6) END AS DOUBLE) AS somers_d_yx,
             CAST(CASE WHEN
                 CAST(base.n * (base.n - 1) - ty.n2d AS DOUBLE) / 2.0
                 > 0.0 THEN
               ROUND(CAST(pa.concordant - pa.discordant AS DOUBLE)
                 / (CAST(base.n * (base.n - 1) - ty.n2d AS DOUBLE)
                   / 2.0), 6) END AS DOUBLE) AS somers_d_xy
      FROM base LEFT JOIN pa ON pa.g = base.g
      JOIN tx ON tx.g = base.g JOIN ty ON ty.g = base.g
      ORDER BY base.g""",

    // Exact cumulative (bin, label) cells on the frozen 20-bin grid;
    // score >= threshold predicts positive; one division per rate.
    "q_roc_curve" -> """
      WITH mm AS (SELECT CAST(MIN(value) AS DOUBLE) AS lo,
                         CAST(MAX(value) AS DOUBLE) AS hi FROM events),
      cells AS (
        SELECT CASE WHEN hi = lo THEN 0
                 ELSE LEAST(GREATEST(CAST(FLOOR((value - lo) * 20
                   / (hi - lo)) AS INT), 0), 19) END AS bin,
               CASE WHEN TRY_CAST(JSON_EXTRACT_STRING(props, '$.k')
                 AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END AS y
        FROM events CROSS JOIN mm WHERE value IS NOT NULL),
      agg AS (SELECT bin, COUNT(*)::BIGINT AS n, SUM(y)::BIGINT AS p
              FROM cells GROUP BY bin),
      cum AS (
        SELECT bin,
               SUM(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS nl,
               SUM(p) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS pl,
               SUM(n) OVER () AS nt, SUM(p) OVER () AS pt
        FROM agg WHERE 1 = 1),
      sw AS (
        SELECT bin, nl, pl, nt, pt,
               pt - pl AS tp, (nt - nl) - (pt - pl) AS fp,
               pl AS fn, nl - pl AS tn
        FROM cum WHERE bin < 19)
      SELECT (bin + 1)::BIGINT AS edge,
             CAST(ROUND(lo + CAST(bin + 1 AS DOUBLE) * (hi - lo) / 20,
               6) AS DOUBLE) AS threshold,
             tp::BIGINT AS tp, fp::BIGINT AS fp, fn::BIGINT AS fn,
             tn::BIGINT AS tn,
             CAST(CASE WHEN tp + fn > 0 THEN ROUND(CAST(tp AS DOUBLE)
               / CAST(tp + fn AS DOUBLE), 6) END AS DOUBLE) AS tpr,
             CAST(CASE WHEN fp + tn > 0 THEN ROUND(CAST(fp AS DOUBLE)
               / CAST(fp + tn AS DOUBLE), 6) END AS DOUBLE) AS fpr,
             CAST(CASE WHEN tp + fp > 0 THEN ROUND(CAST(tp AS DOUBLE)
               / CAST(tp + fp AS DOUBLE), 6) END AS DOUBLE) AS precision
      FROM sw CROSS JOIN mm ORDER BY edge""",

    // The q_roc_curve cells/sweep, then the peak |TPR - FPR| with its
    // threshold, ties to the lowest edge.
    "q_ks_model" -> """
      WITH mm AS (SELECT CAST(MIN(value) AS DOUBLE) AS lo,
                         CAST(MAX(value) AS DOUBLE) AS hi FROM events),
      cells AS (
        SELECT CASE WHEN hi = lo THEN 0
                 ELSE LEAST(GREATEST(CAST(FLOOR((value - lo) * 20
                   / (hi - lo)) AS INT), 0), 19) END AS bin,
               CASE WHEN TRY_CAST(JSON_EXTRACT_STRING(props, '$.k')
                 AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END AS y
        FROM events CROSS JOIN mm WHERE value IS NOT NULL),
      agg AS (SELECT bin, COUNT(*)::BIGINT AS n, SUM(y)::BIGINT AS p
              FROM cells GROUP BY bin),
      cum AS (
        SELECT bin,
               SUM(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS nl,
               SUM(p) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS pl,
               SUM(n) OVER () AS nt, SUM(p) OVER () AS pt
        FROM agg WHERE 1 = 1),
      sw AS (
        SELECT bin, nl, pl, nt, pt,
               pt - pl AS tp, (nt - nl) - (pt - pl) AS fp,
               pl AS fn, nl - pl AS tn
        FROM cum WHERE bin < 19),
      rates AS (
        SELECT (bin + 1)::BIGINT AS edge,
               ROUND(lo + CAST(bin + 1 AS DOUBLE) * (hi - lo) / 20, 6)
                 AS threshold,
               CASE WHEN tp + fn > 0 THEN ROUND(CAST(tp AS DOUBLE)
                 / CAST(tp + fn AS DOUBLE), 6) END AS tpr,
               CASE WHEN fp + tn > 0 THEN ROUND(CAST(fp AS DOUBLE)
                 / CAST(fp + tn AS DOUBLE), 6) END AS fpr
        FROM sw CROSS JOIN mm),
      dd AS (SELECT edge, threshold,
                    ROUND(ABS(tpr - fpr), 6) AS d
             FROM rates)
      SELECT CAST(d AS DOUBLE) AS ks, at_edge, 
             CAST(threshold AS DOUBLE) AS at_threshold
      FROM (SELECT *, edge AS at_edge,
                   ROW_NUMBER() OVER (ORDER BY d DESC, edge) AS rn
            FROM dd)
      WHERE rn = 1""",

    // Lagged returns, 12-dp squared returns, the q_ewma recursion at
    // lambda = 0.94, vol and the one-sided 95% z multiplier.
    "q_riskmetrics" -> s"""
      WITH RECURSIVE daily AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6)))
                 AS DOUBLE) / COUNT(*), 6) AS v
        FROM events GROUP BY 1, 2),
      lagd AS (SELECT g, d, v,
                      LAG(v) OVER (PARTITION BY g ORDER BY d) AS pv
               FROM daily),
      rets AS (SELECT g, d,
                      ROUND(v / pv - 1.0, 6) AS ret,
                      ROUND(ROUND(v / pv - 1.0, 6)
                        * ROUND(v / pv - 1.0, 6), 12) AS r2,
                      ROW_NUMBER() OVER (PARTITION BY g ORDER BY d)
                        AS i
               FROM lagd WHERE pv IS NOT NULL AND pv <> 0.0),
      rec AS (
        SELECT g, i, d, ret, r2 AS y FROM rets WHERE i = 1
        UNION ALL
        SELECT rets.g, rets.i, rets.d, rets.ret,
               CASE WHEN rets.r2 IS NULL THEN rec.y
                    WHEN rec.y IS NULL THEN rets.r2
                    ELSE (1.0 - 0.06) * rec.y + 0.06 * rets.r2 END
        FROM rec JOIN rets ON rets.g = rec.g AND rets.i = rec.i + 1)
      SELECT g AS event_type, d, CAST(ret AS DOUBLE) AS ret,
             CAST(ROUND(SQRT(y), 6) AS DOUBLE) AS vol,
             CAST(ROUND(${Stats.MdeZ(("alpha", 0.10))} * SQRT(y), 6)
               AS DOUBLE) AS var95
      FROM rec
      ORDER BY event_type, d""",

    // The q_ols_multi3 quantized power sums; each auxiliary R² a 2x2
    // Cramer on the centered cross-products; VIF = 1/(1 - rounded R²).
    "q_vif" -> """
      WITH pts AS (
        SELECT CAST(ROUND(l_quantity * 1000000.0) AS BIGINT) AS x1,
               CAST(ROUND(l_discount * 1000000.0) AS BIGINT) AS x2,
               CAST(ROUND(l_tax * 1000000.0) AS BIGINT) AS x3
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
          AND l_tax IS NOT NULL),
      s AS (
        SELECT COUNT(*)::BIGINT AS n,
               SUM(x1::HUGEINT) AS s1, SUM(x2::HUGEINT) AS s2,
               SUM(x3::HUGEINT) AS s3,
               SUM(x1::HUGEINT * x1) AS q11, SUM(x2::HUGEINT * x2) AS q22,
               SUM(x3::HUGEINT * x3) AS q33, SUM(x1::HUGEINT * x2) AS q12,
               SUM(x1::HUGEINT * x3) AS q13, SUM(x2::HUGEINT * x3) AS q23
        FROM pts),
      fl AS (
        SELECT n,
               CAST(n AS DOUBLE) * CAST(q11 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS s11,
               CAST(n AS DOUBLE) * CAST(q22 AS DOUBLE)
                 - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS s22,
               CAST(n AS DOUBLE) * CAST(q33 AS DOUBLE)
                 - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE) AS s33,
               CAST(n AS DOUBLE) * CAST(q12 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS s12,
               CAST(n AS DOUBLE) * CAST(q13 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE) AS s13,
               CAST(n AS DOUBLE) * CAST(q23 AS DOUBLE)
                 - CAST(s2 AS DOUBLE) * CAST(s3 AS DOUBLE) AS s23
        FROM s),
      rows3 AS (
        SELECT 'l_quantity' AS covariate, n, s11 AS sjj, s22 AS skk,
               s33 AS sll, s23 AS skl, s12 AS skj, s13 AS slj FROM fl
        UNION ALL
        SELECT 'l_discount', n, s22, s11, s33, s13, s12, s23 FROM fl
        UNION ALL
        SELECT 'l_tax', n, s33, s11, s22, s12, s13, s23 FROM fl),
      g AS (
        SELECT covariate, n, sjj, skl, skj, slj, skk, sll,
               skk * sll - skl * skl AS det
        FROM rows3),
      r AS (
        SELECT covariate, n, sjj, det,
               CASE WHEN n >= 4 AND det > 0.0 AND sjj > 0.0 THEN
                 ROUND((((skj * sll - slj * skl) / det) * skj
                   + ((skk * slj - skl * skj) / det) * slj) / sjj, 6)
               END AS r2
        FROM g)
      SELECT covariate,
             CAST(r2 AS DOUBLE) AS r2,
             CAST(CASE WHEN r2 IS NOT NULL AND r2 < 1.0 THEN
               ROUND(1.0 / (1.0 - r2), 6) END AS DOUBLE) AS vif
      FROM r
      ORDER BY covariate""",

    // Exact decimal power sums per type; Cp/Cpk as identically-
    // spelled trees against the literal [0, 800] band.
    // The q_cpk power-sum CTEs with the Taguchi denominator
    // sqrt(var + (mean - T)^2).
    "q_cpm" -> """
      WITH pts AS (
        SELECT event_type AS g, ROUND(value, 6) AS v FROM events
        WHERE value IS NOT NULL),
      st AS (SELECT g, COUNT(*)::BIGINT AS n,
                    SUM(CAST(v AS DECIMAL(38,6))) AS s1,
                    SUM(CAST(ROUND(v * v, 12) AS DECIMAL(38,12))) AS s2
             FROM pts GROUP BY g)
      SELECT g AS event_type, n,
             CAST(ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS DOUBLE) AS mean,
             CAST(CASE WHEN n >= 2 AND vr > 0.0 THEN ROUND(SQRT(vr), 6)
               END AS DOUBLE) AS sd,
             CAST(CASE WHEN n >= 2 AND tau2 > 0.0 THEN
               ROUND((800.0 - 0.0) / (6.0 * SQRT(tau2)), 6) END
               AS DOUBLE) AS cpm
      FROM (
        SELECT g, n, s1,
               (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                   * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0) AS vr,
               (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                   * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0)
                 + (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) - 100.0)
                   * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) - 100.0)
                 AS tau2
        FROM st)
      ORDER BY event_type""",

    // Per-group frozen variances, totals, and the explicit
    // smallest-label winner among frozen-max ties.
    "q_cochran_c" -> """
      WITH pts AS (
        SELECT CAST(event_type AS VARCHAR) AS g, ROUND(value, 6) AS v
        FROM events WHERE value IS NOT NULL),
      st AS (SELECT g, COUNT(*)::BIGINT AS n,
                    SUM(CAST(v AS DECIMAL(38,6))) AS s1,
                    SUM(CAST(ROUND(v * v, 12) AS DECIMAL(38,12))) AS s2
             FROM pts GROUP BY g),
      perg AS (
        SELECT g,
               CASE WHEN n >= 2 THEN
                 ROUND((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                     * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0), 6) END AS var,
               (CASE WHEN n >= 2 THEN
                 ROUND((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                     * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0), 6) END IS NOT NULL
                AND CASE WHEN n >= 2 THEN
                 ROUND((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                     * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0), 6) END > 0.0) AS ok
        FROM st),
      tot AS (
        SELECT SUM(CASE WHEN ok THEN 1 ELSE 0 END)::BIGINT AS k,
               SUM(CASE WHEN NOT ok THEN 1 ELSE 0 END)::BIGINT AS ex,
               SUM(CASE WHEN ok THEN CAST(var AS DECIMAL(38,12)) END)
                 AS sv,
               MAX(CASE WHEN ok THEN var END) AS mv
        FROM perg),
      winner AS (
        SELECT MIN(p.g) AS wg
        FROM perg p CROSS JOIN tot t
        WHERE p.ok AND p.var = t.mv)
      SELECT k,
             CAST(CASE WHEN k >= 2 THEN
               ROUND(mv / CAST(sv AS DOUBLE), 6) END AS DOUBLE)
               AS c_stat,
             CASE WHEN k >= 1 THEN wg END AS max_var_group,
             CAST(CASE WHEN k >= 1 THEN mv END AS DOUBLE) AS max_var,
             ex AS n_excluded
      FROM tot CROSS JOIN winner""",

    // Entity volumes in exact cents; HHI = Q/S^2 on decimal ints.
    "q_hhi" -> """
      WITH ent AS (
        SELECT event_type AS g, user_id AS e,
               SUM(CAST(ROUND(value * 100) AS HUGEINT)) AS v
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
        HAVING SUM(CAST(ROUND(value * 100) AS HUGEINT)) > 0),
      agg AS (
        SELECT g, COUNT(*)::BIGINT AS n, SUM(v) AS s,
               SUM(v * v) AS q
        FROM ent GROUP BY g)
      SELECT g AS event_type, n AS n_entities,
             CAST(ROUND(CAST(q AS DOUBLE)
               / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)), 6) AS DOUBLE)
               AS hhi,
             CAST(CASE WHEN n >= 2 THEN
               ROUND((ROUND(CAST(q AS DOUBLE)
                   / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)), 6)
                 - 1.0 / CAST(n AS DOUBLE))
                 / (1.0 - 1.0 / CAST(n AS DOUBLE)), 6) END AS DOUBLE)
               AS hhi_normalized
      FROM agg
      ORDER BY event_type""",

    // Exact distinct units per day, frozen center, unbounded-rate
    // bands with only the LCL clamped.
    "q_u_chart" -> """
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               COUNT(DISTINCT user_id)::BIGINT AS n_units,
               SUM(CASE WHEN COALESCE(value > 120.0, FALSE)
                 THEN 1 ELSE 0 END)::BIGINT AS n_defects
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      daily2 AS (SELECT * FROM daily WHERE n_units > 0),
      tot AS (SELECT SUM(n_units)::BIGINT AS tn,
                     SUM(n_defects)::BIGINT AS tc
              FROM daily2),
      lim AS (
        SELECT day, n_units, n_defects,
               ROUND(CAST(tc AS DOUBLE) / CAST(tn AS DOUBLE), 6)
                 AS ubar,
               ROUND(3.0 * SQRT(
                 ROUND(CAST(tc AS DOUBLE) / CAST(tn AS DOUBLE), 6)
                 / CAST(n_units AS DOUBLE)), 6) AS hw,
               ROUND(CAST(n_defects AS DOUBLE)
                 / CAST(n_units AS DOUBLE), 6) AS u
        FROM daily2 CROSS JOIN tot)
      SELECT day, n_units, n_defects, CAST(u AS DOUBLE) AS u,
             CAST(ubar AS DOUBLE) AS center,
             CAST(ROUND(ubar + hw, 6) AS DOUBLE) AS ucl,
             CAST(ROUND(GREATEST(0.0, ubar - hw), 6) AS DOUBLE) AS lcl,
             (u > ROUND(ubar + hw, 6)
               OR u < ROUND(GREATEST(0.0, ubar - hw), 6))
               AS out_of_control
      FROM lim
      ORDER BY day""",

    "q_cpk" -> """
      WITH pts AS (
        SELECT event_type AS g, ROUND(value, 6) AS v FROM events
        WHERE value IS NOT NULL),
      st AS (SELECT g, COUNT(*)::BIGINT AS n,
                    SUM(CAST(v AS DECIMAL(38,6))) AS s1,
                    SUM(CAST(ROUND(v * v, 12) AS DECIMAL(38,12))) AS s2
             FROM pts GROUP BY g)
      SELECT g AS event_type, n,
             CAST(ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS DOUBLE) AS mean,
             CAST(CASE WHEN ok THEN ROUND(sd, 6) END AS DOUBLE) AS sd,
             CAST(CASE WHEN ok THEN ROUND((800.0 - 0.0) / (6.0 * sd), 6)
               END AS DOUBLE) AS cp,
             CAST(CASE WHEN ok THEN
               ROUND(LEAST(800.0 - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE),
                   CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) - 0.0)
                 / (3.0 * sd), 6) END AS DOUBLE) AS cpk
      FROM (
        SELECT g, n, s1,
               SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                   * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0)) AS sd,
               (n >= 2 AND (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                   * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0) > 0.0) AS ok
        FROM st)
      ORDER BY event_type""",

    // First-five-per-day subgroups under the event total order, exact
    // means/ranges, decimal center lines, literal n=5 constants.
    "q_xbar_r" -> """
      WITH sample AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS sg,
               ROUND(value, 6) AS v,
               ROW_NUMBER() OVER (PARTITION BY event_type,
                 CAST(ts AS DATE)
                 ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        FROM events WHERE value IS NOT NULL),
      subs AS (
        SELECT g, sg, COUNT(*)::BIGINT AS n,
               ROUND(CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE) / 5,
                 6) AS xbar,
               ROUND(MAX(v) - MIN(v), 6) AS r
        FROM sample WHERE rn <= 5 GROUP BY g, sg),
      fs AS (SELECT * FROM subs WHERE n = 5),
      cen AS (
        SELECT g,
               ROUND(CAST(SUM(CAST(xbar AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS xbb,
               ROUND(CAST(SUM(CAST(r AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS rb
        FROM fs GROUP BY g)
      SELECT fs.g AS event_type, fs.sg AS d,
             CAST(xbar AS DOUBLE) AS xbar, CAST(r AS DOUBLE) AS r,
             CAST(ROUND(xbb + 0.577 * rb, 6) AS DOUBLE) AS ucl_x,
             CAST(ROUND(xbb - 0.577 * rb, 6) AS DOUBLE) AS lcl_x,
             CAST(ROUND(2.114 * rb, 6) AS DOUBLE) AS ucl_r,
             CAST(ROUND(0.0 * rb, 6) AS DOUBLE) AS lcl_r,
             (xbar > ROUND(xbb + 0.577 * rb, 6)
              OR xbar < ROUND(xbb - 0.577 * rb, 6)) AS out_x,
             (r > ROUND(2.114 * rb, 6) OR r < ROUND(0.0 * rb, 6))
               AS out_r
      FROM fs JOIN cen ON cen.g = fs.g
      ORDER BY event_type, d""",

    // Exact daily-mean grid, odd-count exact medians per row then per
    // column of the centered residuals, 6-dp frozen at every step.
    "q_median_polish" -> """
      WITH grid AS (
        SELECT event_type AS r0,
               (CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                 % 7)::INT AS c0,
               ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6)))
                 AS DOUBLE) / COUNT(*), 6) AS v0
        FROM events GROUP BY 1, 2),
      cells AS (SELECT r0, c0, ROUND(v0, 6) AS v FROM grid),
      re AS (SELECT r0, ROUND(MEDIAN(v), 6) AS re
             FROM cells GROUP BY r0),
      cent AS (
        SELECT c.r0, c.c0, c.v, re.re,
               ROUND(c.v - re.re, 6) AS d
        FROM cells c JOIN re ON re.r0 = c.r0),
      ce AS (SELECT c0, ROUND(MEDIAN(d), 6) AS ce
             FROM cent GROUP BY c0)
      SELECT cent.r0 AS event_type, cent.c0 AS dow,
             CAST(v AS DOUBLE) AS value,
             CAST(re AS DOUBLE) AS row_effect,
             CAST(ce.ce AS DOUBLE) AS col_effect,
             CAST(ROUND(d - ce.ce, 6) AS DOUBLE) AS residual
      FROM cent JOIN ce ON ce.c0 = cent.c0
      ORDER BY event_type, dow""",

    // Per-unit pair terms frozen at 12 dp into DECIMAL(38,12); exact
    // integer marginals (the /(r-1) collapses out of row sums).
    "q_krippendorff" -> """
      WITH cells AS (
        SELECT CAST(ts AS DATE) AS u, event_type AS c,
               COUNT(*)::BIGINT AS n
        FROM events GROUP BY 1, 2),
      units AS (SELECT u, SUM(n)::BIGINT AS r FROM cells GROUP BY u
                HAVING SUM(n) >= 2),
      kept AS (SELECT c.u, c.c, c.n, un.r
               FROM cells c JOIN units un ON c.u = un.u),
      dis AS (
        SELECT COALESCE(SUM(ROUND(
                 (CAST(a.n AS DOUBLE) * CAST(b.n AS DOUBLE))
                 / (CAST(a.r AS DOUBLE) - 1.0), 12)::DECIMAL(38,12)),
               0::DECIMAL(38,12)) AS dnum
        FROM kept a JOIN kept b ON a.u = b.u AND a.c <> b.c),
      marg AS (
        SELECT SUM(nc::HUGEINT) AS nn, SUM(nc::HUGEINT * nc) AS sq,
               COUNT(*)::BIGINT AS k
        FROM (SELECT c, SUM(n) AS nc FROM kept GROUP BY c)),
      nu AS (SELECT COUNT(*)::BIGINT AS nu FROM units)
      SELECT nu AS n_units, CAST(nn AS BIGINT) AS n_ratings,
             k AS k_categories,
             CAST(CASE WHEN nn > 1 THEN ROUND(CAST(dnum AS DOUBLE)
               / CAST(nn AS DOUBLE), 6) END AS DOUBLE) AS d_o,
             CAST(CASE WHEN nn > 1 THEN ROUND(
               (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
                 - CAST(sq AS DOUBLE))
               / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)), 6)
               END AS DOUBLE) AS d_e,
             CAST(CASE WHEN nn > 1
                 AND (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
                   - CAST(sq AS DOUBLE))
                 / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0))
                 > 0.0 THEN
               ROUND(1.0 - (CAST(dnum AS DOUBLE) / CAST(nn AS DOUBLE))
                 / ((CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
                     - CAST(sq AS DOUBLE))
                   / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0))),
                 6) END AS DOUBLE) AS alpha
      FROM dis CROSS JOIN marg CROSS JOIN nu""",


    // The q_kaplan_meier cells; frozen d/n steps into an order-fixed
    // DECIMAL(38,12) cumulative — no ln/exp anywhere.
    // Parity-cohort NA CTEs + LN points + the q_lin_fit trees + one
    // scale tree e^(−intercept/slope).
    "q_weibull" -> """
      WITH subj AS (
        SELECT CAST(user_id % 2 AS INTEGER) AS g,
               DATE_DIFF('day', MIN(CAST(ts AS DATE)),
                 COALESCE(MIN(CASE WHEN event_type = 'purchase'
                                THEN CAST(ts AS DATE) END),
                          MAX(CAST(ts AS DATE)))) AS duration,
               MIN(CASE WHEN event_type = 'purchase'
                     THEN CAST(ts AS DATE) END) IS NOT NULL AS observed
        FROM events GROUP BY user_id),
      cells AS (
        SELECT g, duration,
               SUM(CASE WHEN observed THEN 1 ELSE 0 END)::BIGINT
                 AS n_events,
               SUM(CASE WHEN observed THEN 0 ELSE 1 END)::BIGINT
                 AS n_censored
        FROM subj GROUP BY g, duration),
      na AS (
        SELECT g, duration, n_events,
               (SUM(n_events + n_censored) OVER (PARTITION BY g)
                 - COALESCE(SUM(n_events + n_censored) OVER
                     (PARTITION BY g ORDER BY duration
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), 0))::BIGINT AS n_at_risk
        FROM cells),
      na2 AS (
        SELECT g, duration, n_events,
               SUM(ROUND(CAST(n_events AS DOUBLE)
                     / CAST(n_at_risk AS DOUBLE), 12)::DECIMAL(38,12))
                 OVER (PARTITION BY g ORDER BY duration
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS hsum
        FROM na),
      steps AS (
        SELECT g, duration,
               CAST(ROUND(CAST(hsum AS DOUBLE), 6) AS DOUBLE)
                 AS cum_hazard
        FROM na2 WHERE n_events > 0),
      pts0 AS (
        SELECT g, LN(CAST(duration AS DOUBLE)) AS lt, LN(cum_hazard) AS lh
        FROM steps WHERE duration > 0 AND cum_hazard > 0.0),
      pts AS (
        SELECT g, CAST(ROUND(lt * 1000000.0) AS BIGINT) AS xq,
               CAST(ROUND(lh * 1000000.0) AS BIGINT) AS yq
        FROM pts0 WHERE lt IS NOT NULL AND lh IS NOT NULL),
      s AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(xq::HUGEINT) AS sx, SUM(yq::HUGEINT) AS sy,
               SUM(xq::HUGEINT * xq) AS sxx, SUM(yq::HUGEINT * yq) AS syy,
               SUM(xq::HUGEINT * yq) AS sxy
        FROM pts GROUP BY g),
      d AS (
        SELECT g, n,
               CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
               CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS denx,
               CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny,
               CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        FROM s),
      fit AS (
        SELECT g, n,
               CAST(CASE WHEN denx > 0.0 THEN ROUND(num / denx, 6) END
                 AS DOUBLE) AS shape,
               CAST(CASE WHEN denx > 0.0 THEN
                 ROUND(syd / CAST(n AS DOUBLE) / 1000000.0
                   - num / denx * (sxd / CAST(n AS DOUBLE) / 1000000.0),
                   6)
               END AS DOUBLE) AS icpt,
               CAST(CASE WHEN denx > 0.0 AND deny > 0.0 THEN
                 ROUND(num * num / (denx * deny), 6)
               END AS DOUBLE) AS r2
        FROM d)
      SELECT g AS cohort, n, shape,
             CAST(CASE WHEN shape IS NOT NULL AND shape <> 0.0 THEN
               ROUND(EXP(-icpt / shape), 6) END AS DOUBLE) AS scale,
             r2
      FROM fit ORDER BY cohort""",

    "q_nelson_aalen" -> """
      WITH subj AS (
        SELECT user_id,
               DATE_DIFF('day', MIN(CAST(ts AS DATE)),
                 COALESCE(MIN(CASE WHEN event_type = 'purchase'
                                THEN CAST(ts AS DATE) END),
                          MAX(CAST(ts AS DATE)))) AS duration,
               MIN(CASE WHEN event_type = 'purchase'
                     THEN CAST(ts AS DATE) END) IS NOT NULL AS observed
        FROM events GROUP BY user_id),
      cells AS (
        SELECT duration,
               SUM(CASE WHEN observed THEN 1 ELSE 0 END)::BIGINT
                 AS n_events,
               SUM(CASE WHEN observed THEN 0 ELSE 1 END)::BIGINT
                 AS n_censored
        FROM subj GROUP BY duration),
      na AS (
        SELECT duration, n_events, n_censored,
               ((SELECT SUM(n_events + n_censored) FROM cells)
                 - COALESCE(SUM(n_events + n_censored) OVER
                     (ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), 0))::BIGINT AS n_at_risk
        FROM cells),
      na2 AS (
        SELECT duration, n_events, n_censored, n_at_risk,
               SUM(ROUND(CAST(n_events AS DOUBLE)
                     / CAST(n_at_risk AS DOUBLE), 12)::DECIMAL(38,12))
                 OVER (ORDER BY duration ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS hsum
        FROM na)
      SELECT duration, n_at_risk, n_events, n_censored,
             CAST(ROUND(CAST(hsum AS DOUBLE), 6) AS DOUBLE) AS cum_hazard
      FROM na2 WHERE n_events > 0 ORDER BY duration""",

    // Exact cumulative split counts off the frozen 16-bin grid;
    // binary entropies 12-dp frozen; (gain DESC, edge) argmax.
    "q_stump" -> """
      WITH mm AS (SELECT CAST(MIN(value) AS DOUBLE) AS lo,
                         CAST(MAX(value) AS DOUBLE) AS hi FROM events),
      cells AS (
        SELECT CASE WHEN hi = lo THEN 0
                 ELSE LEAST(GREATEST(CAST(FLOOR((value - lo) * 16
                   / (hi - lo)) AS INT), 0), 15) END AS bin,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events CROSS JOIN mm WHERE value IS NOT NULL),
      agg AS (SELECT bin, COUNT(*)::BIGINT AS n, SUM(y)::BIGINT AS p
              FROM cells GROUP BY bin),
      cum AS (
        SELECT bin,
               SUM(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS nl,
               SUM(p) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS pl,
               SUM(n) OVER () AS nt, SUM(p) OVER () AS pt
        FROM agg),
      sw AS (
        SELECT bin + 1 AS edge, nl, pl, nt, pt, nt - nl AS nr,
               pt - pl AS pr
        FROM cum WHERE bin < 15),
      gq AS (
        SELECT edge, nl, nr, nt, pt,
          ROUND(
            ROUND(CASE WHEN pt > 0 AND pt < nt THEN
              -(CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE))
                * LN(CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE))
              - ((CAST(nt AS DOUBLE) - CAST(pt AS DOUBLE))
                  / CAST(nt AS DOUBLE))
                * LN((CAST(nt AS DOUBLE) - CAST(pt AS DOUBLE))
                  / CAST(nt AS DOUBLE)) ELSE 0.0 END, 12)
            - (CAST(nl AS DOUBLE) / CAST(nt AS DOUBLE))
              * ROUND(CASE WHEN pl > 0 AND pl < nl THEN
                -(CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
                  * LN(CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
                - ((CAST(nl AS DOUBLE) - CAST(pl AS DOUBLE))
                    / CAST(nl AS DOUBLE))
                  * LN((CAST(nl AS DOUBLE) - CAST(pl AS DOUBLE))
                    / CAST(nl AS DOUBLE)) ELSE 0.0 END, 12)
            - (CAST(nr AS DOUBLE) / CAST(nt AS DOUBLE))
              * ROUND(CASE WHEN pr > 0 AND pr < nr THEN
                -(CAST(pr AS DOUBLE) / CAST(nr AS DOUBLE))
                  * LN(CAST(pr AS DOUBLE) / CAST(nr AS DOUBLE))
                - ((CAST(nr AS DOUBLE) - CAST(pr AS DOUBLE))
                    / CAST(nr AS DOUBLE))
                  * LN((CAST(nr AS DOUBLE) - CAST(pr AS DOUBLE))
                    / CAST(nr AS DOUBLE)) ELSE 0.0 END, 12), 6) AS gain
        FROM sw)
      SELECT nt::BIGINT AS n, pt::BIGINT AS n_pos, edge::BIGINT AS edge,
             CAST(ROUND(lo + CAST(edge AS DOUBLE) * (hi - lo) / 16, 6)
               AS DOUBLE) AS threshold,
             nl::BIGINT AS n_left, nr::BIGINT AS n_right,
             CAST(gain AS DOUBLE) AS gain
      FROM gq CROSS JOIN mm
      ORDER BY gain DESC, edge LIMIT 1""",

    // +0.5-adjusted WoE per fixed bin (empty bins still emit); IV
    // terms 12-dp frozen into a DECIMAL(38,12) fold.
    "q_woe_iv" -> """
      WITH mm AS (SELECT CAST(MIN(value) AS DOUBLE) AS lo,
                         CAST(MAX(value) AS DOUBLE) AS hi FROM events),
      cells AS (
        SELECT CASE WHEN hi = lo THEN 0
                 ELSE LEAST(GREATEST(CAST(FLOOR((value - lo) * 10
                   / (hi - lo)) AS INT), 0), 9) END AS bin,
               CASE WHEN TRY_CAST(JSON_EXTRACT_STRING(props, '$.k')
                 AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END AS g
        FROM events CROSS JOIN mm WHERE value IS NOT NULL),
      agg AS (SELECT bin, SUM(g)::BIGINT AS gc,
                     SUM(1 - g)::BIGINT AS bc
              FROM cells GROUP BY bin),
      grid AS (
        SELECT r.bin, COALESCE(a.gc, 0) AS gc, COALESCE(a.bc, 0) AS bc
        FROM (SELECT UNNEST(RANGE(0, 10))::INT AS bin) r
        LEFT JOIN agg a ON a.bin = r.bin),
      tot AS (
        SELECT bin, gc, bc, SUM(gc) OVER () AS gt, SUM(bc) OVER () AS bt
        FROM grid),
      w AS (
        SELECT bin, gc, bc, gt, bt,
               ROUND(LN(((CAST(gc AS DOUBLE) + 0.5) / CAST(gt AS DOUBLE))
                 / ((CAST(bc AS DOUBLE) + 0.5) / CAST(bt AS DOUBLE))),
                 12) AS woe
        FROM tot),
      w2 AS (
        SELECT bin, gc, bc, gt, bt, woe,
               SUM(CASE WHEN gt > 0 AND bt > 0 THEN
                 ROUND(((CAST(gc AS DOUBLE) + 0.5) / CAST(gt AS DOUBLE)
                   - (CAST(bc AS DOUBLE) + 0.5) / CAST(bt AS DOUBLE))
                   * woe, 12)::DECIMAL(38,12) END) OVER () AS ivs
        FROM w)
      SELECT bin::BIGINT AS bin, gc AS n_good, bc AS n_bad,
             CAST(CASE WHEN gt > 0 AND bt > 0 THEN ROUND(woe, 6) END
               AS DOUBLE) AS woe,
             CAST(ROUND(CAST(ivs AS DOUBLE), 6) AS DOUBLE) AS iv
      FROM w2 ORDER BY bin""",

    // Exact HUGEINT moments off the same 30-per-cell cut; SS and F
    // trees spelled once each, SS descaled by 1e12.
    "q_anova2" -> """
      WITH cut AS (
        SELECT event_type AS a, user_id % 2 AS b, value,
               ROW_NUMBER() OVER (PARTITION BY event_type, user_id % 2
                 ORDER BY ts, event_id) AS rn
        FROM events WHERE value IS NOT NULL),
      pts AS (SELECT a, b, CAST(ROUND(value * 1000000.0) AS BIGINT) AS v
              FROM cut WHERE rn <= 30),
      cells AS (SELECT a, b, COUNT(*)::BIGINT AS n,
                       SUM(v::HUGEINT) AS s, SUM(v::HUGEINT * v) AS q
                FROM pts GROUP BY a, b),
      al AS (SELECT SUM(sa * sa) AS sa2, COUNT(*)::BIGINT AS ka
             FROM (SELECT a, SUM(s) AS sa FROM cells GROUP BY a)),
      bl AS (SELECT SUM(sb * sb) AS sb2, COUNT(*)::BIGINT AS kb
             FROM (SELECT b, SUM(s) AS sb FROM cells GROUP BY b)),
      g AS (SELECT SUM(s * s) AS sc2, SUM(s) AS st, SUM(q) AS qt,
                   MAX(n) AS n FROM cells),
      f AS (SELECT ka, kb, n,
              CAST(ka AS DOUBLE) AS kad, CAST(kb AS DOUBLE) AS kbd,
              CAST(n AS DOUBLE) AS nd, CAST(sa2 AS DOUBLE) AS sad,
              CAST(sb2 AS DOUBLE) AS sbd, CAST(sc2 AS DOUBLE) AS scd,
              CAST(st AS DOUBLE) AS std_, CAST(qt AS DOUBLE) AS qtd
            FROM g CROSS JOIN al CROSS JOIN bl),
      z AS (SELECT ka, kb, n, kad, kbd, nd,
              std_ * std_ / (kad * kbd * nd) AS corr,
              sad / (kbd * nd) AS ta, sbd / (kad * nd) AS tb,
              scd / nd AS tc, qtd
            FROM f)
      SELECT ka AS k_a, kb AS k_b, n AS n_cell,
        CAST(ROUND((ta - corr) / 1000000000000.0, 6) AS DOUBLE) AS ss_a,
        CAST(ROUND((tb - corr) / 1000000000000.0, 6) AS DOUBLE) AS ss_b,
        CAST(ROUND(((tc - corr) - (ta - corr) - (tb - corr))
          / 1000000000000.0, 6) AS DOUBLE) AS ss_ab,
        CAST(ROUND((qtd - tc) / 1000000000000.0, 6) AS DOUBLE)
          AS ss_within,
        CAST(CASE WHEN n >= 2 AND qtd - tc > 0.0 AND ka >= 2 THEN
          ROUND(((ta - corr) / (kad - 1.0))
            / ((qtd - tc) / (kad * kbd * nd - kad * kbd)), 6) END
          AS DOUBLE) AS f_a,
        CAST(CASE WHEN n >= 2 AND qtd - tc > 0.0 AND kb >= 2 THEN
          ROUND(((tb - corr) / (kbd - 1.0))
            / ((qtd - tc) / (kad * kbd * nd - kad * kbd)), 6) END
          AS DOUBLE) AS f_b,
        CAST(CASE WHEN n >= 2 AND qtd - tc > 0.0 AND ka >= 2 AND kb >= 2
          THEN ROUND(((tc - corr) - (ta - corr) - (tb - corr))
            / ((kad - 1.0) * (kbd - 1.0))
            / ((qtd - tc) / (kad * kbd * nd - kad * kbd)), 6) END
          AS DOUBLE) AS f_ab
      FROM z""",

    // Exact integer S over the day-pair join; tie-corrected variance
    // as one decimal subtraction cast once; z branches on integer S.
    "q_mann_kendall" -> """
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      s AS (SELECT a.g,
              SUM(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1
                ELSE 0 END)::HUGEINT AS s
            FROM cells a JOIN cells b ON a.g = b.g AND a.day < b.day
            GROUP BY a.g),
      t AS (SELECT g, SUM(tt::HUGEINT * (tt - 1) * (2 * tt + 5)) AS tsum
            FROM (SELECT g, x, COUNT(*) AS tt FROM cells GROUP BY g, x)
            GROUP BY g),
      n AS (SELECT g, COUNT(*)::BIGINT AS n FROM cells GROUP BY g),
      f AS (SELECT n.g, n.n, COALESCE(s.s, 0) AS s,
              CAST(n.n::HUGEINT * (n.n - 1) * (2 * n.n + 5) - t.tsum
                AS DOUBLE) / 18.0 AS vs
            FROM n LEFT JOIN s ON n.g = s.g LEFT JOIN t ON n.g = t.g)
      SELECT g AS event_type, n AS n_days, s::BIGINT AS s,
             CAST(ROUND(vs, 6) AS DOUBLE) AS var_s,
             CAST(CASE WHEN vs > 0.0 THEN
               CASE WHEN s > 0
                 THEN ROUND((CAST(s AS DOUBLE) - 1.0) / SQRT(vs), 6)
                 WHEN s < 0
                 THEN ROUND((CAST(s AS DOUBLE) + 1.0) / SQRT(vs), 6)
                 ELSE 0.0 END END AS DOUBLE) AS z
      FROM f ORDER BY event_type""",

    // The q_acf centered-integer machinery on two measures; per-lag
    // numerators and both D's exact HUGEINT sums; denominators
    // multiplied as doubles.
    "q_ccf" -> """
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x,
               SUM(CAST(ROUND(1.0 * 1000000.0) AS BIGINT))::BIGINT AS y
        FROM events GROUP BY 1, 2),
      st AS (SELECT g, COUNT(*)::HUGEINT AS n, SUM(x)::HUGEINT AS sx,
                    SUM(y)::HUGEINT AS sy
             FROM cells GROUP BY g),
      a AS (SELECT c.g, c.day, st.n * c.x - st.sx AS ax,
                   st.n * c.y - st.sy AS ay
            FROM cells c JOIN st ON c.g = st.g),
      lagged AS (
        SELECT g, ax, ay,
               LEAD(ax, 1) OVER w AS lx1, LEAD(ax, 2) OVER w AS lx2,
               LEAD(ax, 3) OVER w AS lx3,
               LEAD(ay, 1) OVER w AS ly1, LEAD(ay, 2) OVER w AS ly2,
               LEAD(ay, 3) OVER w AS ly3
        FROM a WINDOW w AS (PARTITION BY g ORDER BY day)),
      agg AS (
        SELECT g, COUNT(*)::BIGINT AS n_days,
               SUM(ax * ax) AS dx, SUM(ay * ay) AS dy,
               SUM(ax * ay) AS n0,
               SUM(ax * ly1) AS np1, SUM(ax * ly2) AS np2,
               SUM(ax * ly3) AS np3,
               SUM(ay * lx1) AS nn1, SUM(ay * lx2) AS nn2,
               SUM(ay * lx3) AS nn3
        FROM lagged GROUP BY g)
      SELECT g AS event_type, lag,
             CAST(CASE WHEN dx > 0 AND dy > 0 THEN
               ROUND(CAST(num AS DOUBLE)
                 / SQRT(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)), 6)
             END AS DOUBLE) AS ccf, n_days
      FROM (
        SELECT g, -3 AS lag, nn3 AS num, dx, dy, n_days FROM agg
        UNION ALL SELECT g, -2, nn2, dx, dy, n_days FROM agg
        UNION ALL SELECT g, -1, nn1, dx, dy, n_days FROM agg
        UNION ALL SELECT g, 0, n0, dx, dy, n_days FROM agg
        UNION ALL SELECT g, 1, np1, dx, dy, n_days FROM agg
        UNION ALL SELECT g, 2, np2, dx, dy, n_days FROM agg
        UNION ALL SELECT g, 3, np3, dx, dy, n_days FROM agg)
      ORDER BY event_type, lag""",

    // Pooled theta = one 12-dp-frozen division of HUGEINT moments;
    // adjusted means / variance-reduction are single rounded trees on
    // exact per-arm moments (scale cancels in theta and the ratio).
    "q_cuped" -> """
      WITH u AS (
        SELECT user_id,
               CASE WHEN user_id % 2 = 0 THEN 'treat'
                 ELSE 'control' END AS arm,
               SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                 THEN CAST(ROUND(value * 100) AS BIGINT)
                 ELSE 0 END) / 100.0 AS pre,
               SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                 THEN CAST(ROUND(value * 100) AS BIGINT)
                 ELSE 0 END) / 100.0 AS post
        FROM events GROUP BY user_id),
      pts AS (SELECT arm,
                CAST(ROUND(pre * 1000000.0) AS BIGINT) AS x,
                CAST(ROUND(post * 1000000.0) AS BIGINT) AS y
              FROM u WHERE pre IS NOT NULL AND post IS NOT NULL),
      g AS (SELECT COUNT(*)::BIGINT AS n, SUM(x::HUGEINT) AS sx,
                   SUM(y::HUGEINT) AS sy, SUM(x::HUGEINT * x) AS sxx,
                   SUM(x::HUGEINT * y) AS sxy FROM pts),
      a AS (SELECT arm, COUNT(*)::BIGINT AS na, SUM(x::HUGEINT) AS sxa,
                   SUM(y::HUGEINT) AS sya, SUM(x::HUGEINT * x) AS sxxa,
                   SUM(y::HUGEINT * y) AS syya,
                   SUM(x::HUGEINT * y) AS sxya
            FROM pts GROUP BY arm),
      t AS (SELECT a.arm, a.na,
              CAST(a.na AS DOUBLE) AS nad, CAST(a.sxa AS DOUBLE) AS sxad,
              CAST(a.sya AS DOUBLE) AS syad,
              CAST(a.sxxa AS DOUBLE) AS sxxad,
              CAST(a.syya AS DOUBLE) AS syyad,
              CAST(a.sxya AS DOUBLE) AS sxyad,
              CAST(g.n AS DOUBLE) AS nd, CAST(g.sx AS DOUBLE) AS sxd,
              CAST(g.n AS DOUBLE) * CAST(g.sxx AS DOUBLE)
                - CAST(g.sx AS DOUBLE) * CAST(g.sx AS DOUBLE) AS den,
              ROUND((CAST(g.n AS DOUBLE) * CAST(g.sxy AS DOUBLE)
                  - CAST(g.sx AS DOUBLE) * CAST(g.sy AS DOUBLE))
                / (CAST(g.n AS DOUBLE) * CAST(g.sxx AS DOUBLE)
                  - CAST(g.sx AS DOUBLE) * CAST(g.sx AS DOUBLE)), 12)
                AS theta
            FROM a CROSS JOIN g)
      SELECT arm, na AS n,
             CAST(CASE WHEN den > 0.0 THEN ROUND(theta, 6) END
               AS DOUBLE) AS theta,
             CAST(ROUND(syad / nad / 1000000.0, 6) AS DOUBLE)
               AS mean_post,
             CAST(CASE WHEN den > 0.0 THEN
               ROUND((syad / nad - theta * (sxad / nad - sxd / nd))
                 / 1000000.0, 6) END AS DOUBLE) AS mean_adj,
             CAST(CASE WHEN den > 0.0 AND na >= 2
                 AND (nad * syyad - syad * syad) / (nad * (nad - 1.0))
                   > 0.0 THEN
               ROUND(1.0 -
                 ((nad * syyad - syad * syad) / (nad * (nad - 1.0))
                  + theta * theta * ((nad * sxxad - sxad * sxad)
                    / (nad * (nad - 1.0)))
                  - 2.0 * theta * ((nad * sxyad - sxad * syad)
                    / (nad * (nad - 1.0))))
                 / ((nad * syyad - syad * syad) / (nad * (nad - 1.0))),
                 6) END AS DOUBLE) AS var_reduction
      FROM t ORDER BY arm""",

    // Four exact-moment cells off one aggregate; the DiD and SE trees
    // are spelled once each, descaled at the end.
    "q_ddd" -> dddOracle,

    // Both holt recursions (per-type and the total series) + exact
    // cents shares; the top-down split on the frozen share.
    "q_reconcile" -> """
      WITH RECURSIVE s AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               CAST(ROUND(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))
                 / 1000000.0, 6) AS DOUBLE) AS x
        FROM events GROUP BY 1, 2),
      si AS (SELECT g, d, x,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY d) AS i
             FROM s),
      rec AS (
        SELECT g, i, x AS level, CAST(0.0 AS DOUBLE) AS trend
        FROM si WHERE i = 1
        UNION ALL
        SELECT si.g, si.i,
               ROUND(CAST(0.3 AS DOUBLE) * si.x
                 + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
                   * (r.level + r.trend), 6),
               ROUND(CAST(0.2 AS DOUBLE)
                   * (ROUND(CAST(0.3 AS DOUBLE) * si.x
                       + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
                         * (r.level + r.trend), 6) - r.level)
                 + (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE)) * r.trend, 6)
        FROM rec r JOIN si ON si.g = r.g AND si.i = r.i + 1),
      fin AS (SELECT g, level, trend,
                ROW_NUMBER() OVER (PARTITION BY g ORDER BY i DESC) AS rn
              FROM rec),
      bu AS (SELECT g, CAST(h.h AS BIGINT) AS h,
               CAST(ROUND(level + h.h * trend, 6) AS DOUBLE) AS fbu
             FROM fin CROSS JOIN (VALUES (1), (2), (3)) h(h)
             WHERE rn = 1),
      s2 AS (
        SELECT 'all' AS g, CAST(ts AS DATE) AS d,
               CAST(ROUND(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))
                 / 1000000.0, 6) AS DOUBLE) AS x
        FROM events GROUP BY 2),
      si2 AS (SELECT g, d, x,
                ROW_NUMBER() OVER (PARTITION BY g ORDER BY d) AS i
              FROM s2),
      rec2 AS (
        SELECT g, i, x AS level, CAST(0.0 AS DOUBLE) AS trend
        FROM si2 WHERE i = 1
        UNION ALL
        SELECT si2.g, si2.i,
               ROUND(CAST(0.3 AS DOUBLE) * si2.x
                 + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
                   * (r.level + r.trend), 6),
               ROUND(CAST(0.2 AS DOUBLE)
                   * (ROUND(CAST(0.3 AS DOUBLE) * si2.x
                       + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
                         * (r.level + r.trend), 6) - r.level)
                 + (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE)) * r.trend, 6)
        FROM rec2 r JOIN si2 ON si2.g = r.g AND si2.i = r.i + 1),
      fin2 AS (SELECT level, trend,
                 ROW_NUMBER() OVER (ORDER BY i DESC) AS rn
               FROM rec2),
      tf AS (SELECT CAST(h.h AS BIGINT) AS h,
               CAST(ROUND(level + h.h * trend, 6) AS DOUBLE) AS tfv
             FROM fin2 CROSS JOIN (VALUES (1), (2), (3)) h(h)
             WHERE rn = 1),
      cents AS (SELECT event_type AS gc,
                       SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))
                         ::BIGINT AS c
                FROM events GROUP BY 1),
      grand AS (SELECT SUM(c)::BIGINT AS tc FROM cents),
      sh AS (SELECT gc, ROUND(CAST(c AS DOUBLE) / CAST(tc AS DOUBLE),
               12) AS shv
             FROM cents CROSS JOIN grand)
      SELECT bu.g AS event_type, bu.h AS h,
             CAST(ROUND(shv, 6) AS DOUBLE) AS share,
             CAST(fbu AS DOUBLE) AS forecast_bu,
             CAST(ROUND(tfv * shv, 6) AS DOUBLE) AS forecast_td
      FROM bu JOIN sh ON sh.gc = bu.g JOIN tf ON tf.h = bu.h
      ORDER BY event_type, h""",

    // The varCvar rank-selected order statistic as the predictor;
    // per-row losses with the SCALA-computed 1−τ digits interpolated.
    "q_pinball" -> s"""
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS y
        FROM events WHERE value IS NOT NULL),
      rk AS (SELECT g, y,
                    ROW_NUMBER() OVER (PARTITION BY g ORDER BY y) AS rn,
                    COUNT(*) OVER (PARTITION BY g) AS n
             FROM pts),
      qh AS (SELECT g AS gq, y AS q FROM rk
             WHERE rn = CAST(CEIL(0.9 * n) AS BIGINT)),
      sc AS (SELECT pts.g, q,
                    ROUND((CASE WHEN y > q THEN
                        0.9 * CAST(y - q AS DOUBLE)
                      ELSE ${1.0 - 0.9} * CAST(q - y AS DOUBLE) END)
                      / 1000000.0, 12) AS l
             FROM pts JOIN qh ON gq = pts.g)
      SELECT g AS event_type, COUNT(*)::BIGINT AS n,
             CAST(ROUND(CAST(MAX(q) AS DOUBLE) / 1000000.0, 6)
               AS DOUBLE) AS q_hat,
             CAST(ROUND(CAST(SUM(CAST(l AS DECIMAL(38,12))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE) AS pinball
      FROM sc GROUP BY g
      ORDER BY event_type""",

    // Grubbs-style moments into 6-dp frozen Gaussian bounds; per-row
    // Winkler penalties at the Scala-computed 2/α digits.
    "q_interval_score" -> s"""
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS y
        FROM events WHERE value IS NOT NULL),
      mom AS (SELECT g AS gm, COUNT(*)::BIGINT AS n,
                     SUM(y::HUGEINT) AS s1, SUM(y::HUGEINT * y) AS q1
              FROM pts GROUP BY g),
      bb AS (SELECT gm, n,
               CASE WHEN n >= 2 AND vr > 0.0 THEN
                 ROUND(mu - 1.959964 * SQRT(vr), 6) END AS lo,
               CASE WHEN n >= 2 AND vr > 0.0 THEN
                 ROUND(mu + 1.959964 * SQRT(vr), 6) END AS hi
             FROM (SELECT gm, n,
                     CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
                       / 1000000.0 AS mu,
                     (CAST(n AS DOUBLE) * CAST(q1 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                       / (CAST(n AS DOUBLE)
                         * (CAST(n AS DOUBLE) - 1.0))
                       / 1000000000000.0 AS vr
                   FROM mom)),
      sc AS (SELECT pts.g, lo, hi,
                    ROUND((hi - lo)
                      + CASE WHEN yd < lo THEN
                          ${2.0 / 0.05} * (lo - yd) ELSE 0.0 END
                      + CASE WHEN yd > hi THEN
                          ${2.0 / 0.05} * (yd - hi) ELSE 0.0 END, 12)
                      AS s,
                    CASE WHEN yd >= lo AND yd <= hi THEN 1 ELSE 0 END
                      AS inb
             FROM (SELECT g, CAST(y AS DOUBLE) / 1000000.0 AS yd
                   FROM pts) pts
             JOIN bb ON bb.gm = pts.g)
      SELECT g AS event_type, COUNT(*)::BIGINT AS n,
             CAST(MAX(lo) AS DOUBLE) AS lo,
             CAST(MAX(hi) AS DOUBLE) AS hi,
             CAST(CASE WHEN MAX(lo) IS NOT NULL THEN
               ROUND(CAST(SUM(inb) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) END AS DOUBLE)
               AS coverage,
             CAST(CASE WHEN MAX(lo) IS NOT NULL THEN
               ROUND(CAST(SUM(CAST(s AS DECIMAL(38,12))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) END AS DOUBLE)
               AS interval_score
      FROM sc GROUP BY g
      ORDER BY event_type""",

    // The q_did cell machinery per relative week with the k = −1
    // reference row broadcast; the 4-cell Wald se per period.
    "q_event_study" -> """
      WITH pts AS (
        SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t,
               CAST(FLOOR(DATEDIFF('day', DATE '2024-01-16',
                 CAST(ts AS DATE)) / 7) AS BIGINT) AS k,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL),
      cells AS (SELECT t, k, COUNT(*)::BIGINT AS n,
                       SUM(v::HUGEINT) AS s, SUM(v::HUGEINT * v) AS q
                FROM pts GROUP BY 1, 2),
      pk AS (SELECT k,
               MAX(CASE WHEN t = 1 THEN n END) AS nt,
               MAX(CASE WHEN t = 0 THEN n END) AS nc,
               MAX(CASE WHEN t = 1 THEN s END) AS st,
               MAX(CASE WHEN t = 0 THEN s END) AS sc,
               MAX(CASE WHEN t = 1 THEN q END) AS qt,
               MAX(CASE WHEN t = 0 THEN q END) AS qc
             FROM cells GROUP BY k),
      rf AS (SELECT nt AS rnt, nc AS rnc, st AS rst, sc AS rsc,
                    qt AS rqt, qc AS rqc
             FROM pk WHERE k = -1)
      SELECT k AS rel_period,
             COALESCE(nt, 0)::BIGINT AS n_treated,
             COALESCE(nc, 0)::BIGINT AS n_control,
             CAST(CASE WHEN nt IS NOT NULL AND nc IS NOT NULL
                        AND rnt IS NOT NULL AND rnc IS NOT NULL THEN
               ROUND(((CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
                   - CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE))
                 - (CAST(rst AS DOUBLE) / CAST(rnt AS DOUBLE)
                   - CAST(rsc AS DOUBLE) / CAST(rnc AS DOUBLE)))
                 / 1000000.0, 6) END AS DOUBLE) AS effect,
             CAST(CASE WHEN nt >= 2 AND nc >= 2 AND rnt >= 2
                        AND rnc >= 2 THEN
               ROUND(SQRT(((CAST(nt AS DOUBLE) * CAST(qt AS DOUBLE)
                     - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                   / (CAST(nt AS DOUBLE) * (CAST(nt AS DOUBLE) - 1.0))
                   / CAST(nt AS DOUBLE)
                 + (CAST(nc AS DOUBLE) * CAST(qc AS DOUBLE)
                     - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
                   / (CAST(nc AS DOUBLE) * (CAST(nc AS DOUBLE) - 1.0))
                   / CAST(nc AS DOUBLE)
                 + (CAST(rnt AS DOUBLE) * CAST(rqt AS DOUBLE)
                     - CAST(rst AS DOUBLE) * CAST(rst AS DOUBLE))
                   / (CAST(rnt AS DOUBLE) * (CAST(rnt AS DOUBLE) - 1.0))
                   / CAST(rnt AS DOUBLE)
                 + (CAST(rnc AS DOUBLE) * CAST(rqc AS DOUBLE)
                     - CAST(rsc AS DOUBLE) * CAST(rsc AS DOUBLE))
                   / (CAST(rnc AS DOUBLE) * (CAST(rnc AS DOUBLE) - 1.0))
                   / CAST(rnc AS DOUBLE)) / 1000000000000.0), 6) END
               AS DOUBLE) AS se
      FROM pk CROSS JOIN rf
      ORDER BY rel_period""",

    // The jarque_bera power sums through the staged 12-dp transform
    // chain — one CTE per frozen Spark column, the signed cube root
    // as SIGN·EXP(LN/3) on the frozen base.
    "q_dagostino" -> """
      WITH s0 AS (
        SELECT event_type AS g, CAST(ROUND(value * 100) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL),
      sm AS (SELECT g, COUNT(*)::BIGINT AS n, SUM(x::HUGEINT) AS s1,
                    SUM(x::HUGEINT * x) AS s2,
                    SUM(x::HUGEINT * x * x) AS s3,
                    SUM(x::HUGEINT * x * x * x) AS s4
             FROM s0 GROUP BY g),
      c1 AS (SELECT g, n, s1, s2, s3, s4,
                    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                    CAST(n AS DOUBLE) AS nd
             FROM sm),
      c2 AS (SELECT g, n, nd,
                    CAST(s2 AS DOUBLE) / nd - mu * mu AS m2,
                    (CAST(s3 AS DOUBLE) / nd
                      - 3.0 * mu * (CAST(s2 AS DOUBLE) / nd))
                      + 2.0 * mu * mu * mu AS m3,
                    (CAST(s4 AS DOUBLE) / nd
                      - 4.0 * mu * (CAST(s3 AS DOUBLE) / nd))
                      + 6.0 * mu * mu * (CAST(s2 AS DOUBLE) / nd)
                      - 3.0 * mu * mu * mu * mu AS m4
             FROM c1),
      c3 AS (SELECT g, n, nd,
                    CASE WHEN n >= 8 AND m2 > 0.0 THEN
                      ROUND(m3 / SQRT(m2 * m2 * m2), 12) END AS g1,
                    CASE WHEN n >= 8 AND m2 > 0.0 THEN
                      ROUND(m4 / (m2 * m2), 12) END AS g2
             FROM c2),
      c4 AS (SELECT *,
                    ROUND(g1 * SQRT((nd + 1.0) * (nd + 3.0)
                      / (6.0 * (nd - 2.0))), 12) AS y,
                    ROUND(3.0 * (nd * nd + 27.0 * nd - 70.0)
                        * (nd + 1.0) * (nd + 3.0)
                      / ((nd - 2.0) * (nd + 5.0) * (nd + 7.0)
                        * (nd + 9.0)), 12) AS b2
             FROM c3),
      c5 AS (SELECT *,
                    ROUND(-1.0 + SQRT(2.0 * (b2 - 1.0)), 12) AS w2
             FROM c4),
      c6 AS (SELECT *,
                    1.0 / SQRT(LN(SQRT(w2))) AS dl,
                    SQRT(2.0 / (w2 - 1.0)) AS al
             FROM c5),
      c7 AS (SELECT *, ROUND(y / al, 12) AS ya FROM c6),
      c8 AS (SELECT *,
                    CASE WHEN w2 > 1.0 THEN
                      ROUND(dl * LN(ya + SQRT(ya * ya + 1.0)), 6) END
                      AS z1,
                    ROUND(3.0 * (nd - 1.0) / (nd + 1.0), 12) AS eb,
                    ROUND(24.0 * nd * (nd - 2.0) * (nd - 3.0)
                      / ((nd + 1.0) * (nd + 1.0) * (nd + 3.0)
                        * (nd + 5.0)), 12) AS vb
             FROM c7),
      c9 AS (SELECT *,
                    ROUND((g2 - eb) / SQRT(vb), 12) AS xs,
                    ROUND(6.0 * (nd * nd - 5.0 * nd + 2.0)
                      / ((nd + 7.0) * (nd + 9.0))
                      * SQRT(6.0 * (nd + 3.0) * (nd + 5.0)
                        / (nd * (nd - 2.0) * (nd - 3.0))), 12) AS sb
             FROM c8),
      c10 AS (SELECT *,
                     ROUND(6.0 + 8.0 / sb * (2.0 / sb
                       + SQRT(1.0 + 4.0 / (sb * sb))), 12) AS aa
              FROM c9),
      c11 AS (SELECT *,
                     ROUND((1.0 - 2.0 / aa)
                       / (1.0 + xs * SQRT(2.0 / (aa - 4.0))), 12) AS bb
              FROM c10),
      c12 AS (SELECT *,
                     CASE WHEN bb <> 0.0 THEN
                       SIGN(bb) * EXP(LN(ABS(bb)) / 3.0) END AS cr
              FROM c11),
      c13 AS (SELECT *,
                     CASE WHEN aa > 4.0 AND cr IS NOT NULL THEN
                       ROUND(((1.0 - 2.0 / (9.0 * aa)) - cr)
                         / SQRT(2.0 / (9.0 * aa)), 6) END AS z2
              FROM c12)
      SELECT g AS event_type, n,
             CAST(z1 AS DOUBLE) AS skew_z,
             CAST(z2 AS DOUBLE) AS kurt_z,
             CAST(CASE WHEN z1 IS NOT NULL AND z2 IS NOT NULL THEN
               ROUND(z1 * z1 + z2 * z2, 6) END AS DOUBLE) AS k2
      FROM c13
      ORDER BY event_type""",

    // Exact 2×2 arm counts, 12-dp frozen risks, one rounded closed
    // form per panel number.
    "q_risk_panel" -> """
      WITH rows0 AS (
        SELECT event_type AS g, (user_id % 2 = 0) AS e,
               (value > 50.0) AS o
        FROM events),
      tab AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(CASE WHEN e AND o THEN 1 ELSE 0 END)::BIGINT AS a,
               SUM(CASE WHEN e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS b,
               SUM(CASE WHEN NOT e AND o THEN 1 ELSE 0 END)::BIGINT AS c,
               SUM(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)::BIGINT
                 AS d
        FROM rows0 WHERE e IS NOT NULL AND o IS NOT NULL GROUP BY g),
      t2 AS (SELECT g, n, a + b AS n1, c + d AS n0,
               CASE WHEN a + b >= 1 AND c + d >= 1 THEN
                 ROUND(CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE), 12)
                 END AS r1,
               CASE WHEN a + b >= 1 AND c + d >= 1 THEN
                 ROUND(CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE), 12)
                 END AS r0
             FROM tab),
      t3 AS (SELECT *, ROUND(r1 - r0, 12) AS rd FROM t2)
      SELECT g AS event_type, n,
             CAST(ROUND(r1, 6) AS DOUBLE) AS risk_exposed,
             CAST(ROUND(r0, 6) AS DOUBLE) AS risk_unexposed,
             CAST(ROUND(rd, 6) AS DOUBLE) AS rd,
             CAST(ROUND(SQRT(r1 * (1.0 - r1) / CAST(n1 AS DOUBLE)
               + r0 * (1.0 - r0) / CAST(n0 AS DOUBLE)), 6) AS DOUBLE)
               AS se_rd,
             CAST(CASE WHEN r0 > 0.0 THEN ROUND(r1 / r0, 6) END
               AS DOUBLE) AS rr,
             CAST(CASE WHEN rd <> 0.0 THEN ROUND(1.0 / ABS(rd), 6) END
               AS DOUBLE) AS nnt,
             CAST(CASE WHEN r0 > 0.0 AND r1 > 0.0 THEN
               ROUND((r1 / r0 - 1.0) / (r1 / r0), 6) END AS DOUBLE)
               AS af_exposed
      FROM t3
      ORDER BY event_type""",

    // Exact (group, hour) cells, pooled 12-dp weights, the weighted
    // term fold with uncovered strata counted loudly.
    "q_direct_std" -> """
      WITH cells AS (
        SELECT event_type AS g, HOUR(ts) AS s, COUNT(*)::BIGINT AS n,
               SUM(CASE WHEN value > 120.0 THEN 1 ELSE 0 END)::BIGINT
                 AS k
        FROM events
        WHERE (value > 120.0) IS NOT NULL AND HOUR(ts) IS NOT NULL
        GROUP BY 1, 2),
      pl AS (SELECT s AS sp, SUM(n)::BIGINT AS ns FROM cells GROUP BY s),
      tt AS (SELECT SUM(ns)::BIGINT AS nt, COUNT(*)::BIGINT AS nstrata
             FROM pl),
      gs AS (SELECT g AS gg, SUM(n)::BIGINT AS ng, SUM(k)::BIGINT AS kg
             FROM cells GROUP BY g),
      grid AS (
        SELECT gg, ng, kg, sp, ns, cells.n AS cn, cells.k AS ck
        FROM gs CROSS JOIN pl
        LEFT JOIN cells ON cells.g = gs.gg AND cells.s = pl.sp),
      t AS (SELECT gg, ng, kg, nstrata,
              ROUND(CAST(ns AS DOUBLE) / CAST(nt AS DOUBLE), 12) AS w,
              CASE WHEN cn IS NOT NULL AND cn >= 1 THEN
                ROUND(CAST(ck AS DOUBLE) / CAST(cn AS DOUBLE), 12) END
                AS r
            FROM grid CROSS JOIN tt)
      SELECT gg AS event_type, ng AS n,
             CAST(ROUND(CAST(kg AS DOUBLE) / CAST(ng AS DOUBLE), 6)
               AS DOUBLE) AS crude_rate,
             CAST(ROUND(CAST(SUM(CAST(ROUND(w * COALESCE(r, 0.0), 12)
               AS DECIMAL(38,12))) AS DOUBLE), 6) AS DOUBLE)
               AS std_rate,
             MAX(nstrata)::BIGINT AS n_strata,
             SUM(CASE WHEN r IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_strata_missing
      FROM t GROUP BY gg, ng, kg
      ORDER BY event_type""",

    // Exact integer paired signs on the quantized pair; ties drop.
    "q_sign_test" -> """
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT)
                 - CAST(ROUND(ROUND(value, 0) * 1000000.0) AS BIGINT)
                 AS d
        FROM events
        WHERE value IS NOT NULL AND ROUND(value, 0) IS NOT NULL),
      f AS (SELECT g, COUNT(*)::BIGINT AS n,
                   SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END)::BIGINT AS np,
                   SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END)::BIGINT AS nm
            FROM pts GROUP BY g)
      SELECT g AS event_type, n, np AS n_plus, nm AS n_minus,
             CAST(CASE WHEN np + nm >= 1 THEN
               ROUND((2.0 * np - CAST(np + nm AS DOUBLE))
                 / SQRT(CAST(np + nm AS DOUBLE)), 6) END AS DOUBLE)
               AS z
      FROM f
      ORDER BY event_type""",

    // The ks_exponential gap construction + lag-1 pair co-moments;
    // B and M each one rounded tree over HUGEINT folds.
    "q_burstiness" -> """
      WITH ev AS (
        SELECT event_type AS g, user_id AS u, event_id AS id,
               CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec
        FROM events WHERE ts IS NOT NULL),
      gp AS (SELECT g, u, id, sec,
                    sec - LAG(sec) OVER
                      (PARTITION BY u ORDER BY sec, id) AS gap
             FROM ev),
      g2 AS (SELECT g, gap,
                    LEAD(gap) OVER (PARTITION BY u ORDER BY sec, id)
                      AS nxt
             FROM (SELECT * FROM gp WHERE gap IS NOT NULL)),
      f AS (SELECT g, COUNT(*)::BIGINT AS n,
                   SUM(gap::HUGEINT) AS s1,
                   SUM(gap::HUGEINT * gap) AS s2,
                   SUM(CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END)
                     ::BIGINT AS npr,
                   SUM(CASE WHEN nxt IS NOT NULL THEN gap::HUGEINT END)
                     AS px,
                   SUM(CASE WHEN nxt IS NOT NULL THEN nxt::HUGEINT END)
                     AS py,
                   SUM(CASE WHEN nxt IS NOT NULL
                     THEN gap::HUGEINT * nxt END) AS pxy,
                   SUM(CASE WHEN nxt IS NOT NULL
                     THEN gap::HUGEINT * gap END) AS pxx,
                   SUM(CASE WHEN nxt IS NOT NULL
                     THEN nxt::HUGEINT * nxt END) AS pyy
            FROM g2 GROUP BY g)
      SELECT g AS event_type, n AS n_gaps, npr AS n_pairs,
             CAST(CASE WHEN n >= 2
                        AND (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                          / (CAST(n AS DOUBLE)
                            * (CAST(n AS DOUBLE) - 1.0)) >= 0.0
                        AND SQRT((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                          / (CAST(n AS DOUBLE)
                            * (CAST(n AS DOUBLE) - 1.0)))
                          + CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
                          > 0.0 THEN
               ROUND((SQRT((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                 - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 / (SQRT((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                 + CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 6) END
               AS DOUBLE) AS burstiness,
             CAST(CASE WHEN npr >= 2
                        AND CAST(npr AS DOUBLE) * CAST(pxx AS DOUBLE)
                          - CAST(px AS DOUBLE) * CAST(px AS DOUBLE)
                          > 0.0
                        AND CAST(npr AS DOUBLE) * CAST(pyy AS DOUBLE)
                          - CAST(py AS DOUBLE) * CAST(py AS DOUBLE)
                          > 0.0 THEN
               ROUND((CAST(npr AS DOUBLE) * CAST(pxy AS DOUBLE)
                   - CAST(px AS DOUBLE) * CAST(py AS DOUBLE))
                 / SQRT((CAST(npr AS DOUBLE) * CAST(pxx AS DOUBLE)
                     - CAST(px AS DOUBLE) * CAST(px AS DOUBLE))
                   * (CAST(npr AS DOUBLE) * CAST(pyy AS DOUBLE)
                     - CAST(py AS DOUBLE) * CAST(py AS DOUBLE))), 6)
               END AS DOUBLE) AS memory
      FROM f
      ORDER BY event_type""",

    // Four unrolled clamped-Newton passes + a final fold at w4; the
    // logistic 12-dp freeze discipline in 1-D.
    "q_temp_scaling" -> s"""
      WITH rows0 AS (
        SELECT ROUND((value - 100.0) / 50.0, 6) AS s,
               CASE WHEN TRY_CAST(JSON_EXTRACT_STRING(props, '$$.k')
                 AS BIGINT) % 2 = 0 THEN 1.0 ELSE 0.0 END AS y
        FROM events WHERE (value - 100.0) / 50.0 IS NOT NULL),
      w0 AS (SELECT CAST(1.0 AS DOUBLE) AS w),
      ${(1 to 4).map(tempPass).mkString(",\n      ")},
      p5 AS (SELECT w, COUNT(*)::BIGINT AS n,
                    CAST(SUM(y) AS BIGINT) AS np
             FROM rows0 CROSS JOIN w4 GROUP BY w)
      SELECT n, np AS n_pos,
             CAST(ROUND(w, 6) AS DOUBLE) AS inv_temp,
             CAST(CASE WHEN w > 0.0 THEN ROUND(1.0 / w, 6) END
               AS DOUBLE) AS temperature
      FROM p5""",

    // Daily cents match series, the 6-dp Elo recursion unrolled in a
    // recursive CTE; 10^x as EXP(x·ln 10) with the interpolated
    // literal.
    "q_elo" -> s"""
      WITH RECURSIVE ca AS (
        SELECT CAST(ts AS DATE) AS d,
               SUM(CAST(ROUND(value * 100) AS BIGINT))::BIGINT AS c
        FROM events WHERE event_type = 'click' GROUP BY 1),
      pb AS (
        SELECT CAST(ts AS DATE) AS d,
               SUM(CAST(ROUND(value * 100) AS BIGINT))::BIGINT AS c
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      mm AS (SELECT ca.d,
                    CAST(CASE WHEN ca.c > pb.c THEN 1.0
                              WHEN ca.c = pb.c THEN 0.5
                              ELSE 0.0 END AS DOUBLE) AS s
             FROM ca JOIN pb ON pb.d = ca.d),
      si AS (SELECT d, s, ROW_NUMBER() OVER (ORDER BY d) AS i FROM mm),
      rec AS (
        SELECT d, s, i,
               ROUND(1.0 / (1.0 + EXP((2.0 * 1500.0 - 2.0 * 1500.0)
                 * ${math.log(10.0)} / 400.0)), 6) AS e,
               ROUND(1500.0 + 32.0 * (s
                 - ROUND(1.0 / (1.0 + EXP((2.0 * 1500.0 - 2.0 * 1500.0)
                   * ${math.log(10.0)} / 400.0)), 6)), 6) AS r
        FROM si WHERE i = 1
        UNION ALL
        SELECT si.d, si.s, si.i,
               ROUND(1.0 / (1.0 + EXP((2.0 * 1500.0 - 2.0 * rec.r)
                 * ${math.log(10.0)} / 400.0)), 6),
               ROUND(rec.r + 32.0 * (si.s
                 - ROUND(1.0 / (1.0 + EXP((2.0 * 1500.0 - 2.0 * rec.r)
                   * ${math.log(10.0)} / 400.0)), 6)), 6)
        FROM rec JOIN si ON si.i = rec.i + 1)
      SELECT d AS day, s, CAST(e AS DOUBLE) AS expected_a,
             CAST(r AS DOUBLE) AS rating_a,
             CAST(ROUND(2.0 * 1500.0 - r, 6) AS DOUBLE) AS rating_b
      FROM rec
      ORDER BY day""",

    // Distinct sightings, first-occasion fold, one exclusive
    // cumulative window; the Chapman-corrected Schnabel division.
    "q_schnabel" -> """
      WITH s0 AS (
        SELECT DISTINCT CAST(user_id AS VARCHAR) AS id,
               DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE))
                 ::BIGINT AS o
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      fr AS (SELECT id, MIN(o) AS f FROM s0 GROUP BY id),
      po AS (SELECT o, COUNT(*)::BIGINT AS c,
                    SUM(CASE WHEN f < o THEN 1 ELSE 0 END)::BIGINT AS r
             FROM s0 JOIN fr USING (id) GROUP BY o),
      fc AS (SELECT f AS o, COUNT(*)::BIGINT AS nf FROM fr GROUP BY f),
      occ AS (SELECT po.o, c, r,
                     COALESCE(SUM(COALESCE(nf, 0)) OVER (ORDER BY po.o
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0)::BIGINT AS m
              FROM po LEFT JOIN fc ON fc.o = po.o),
      mk AS (SELECT COUNT(*)::BIGINT AS nm FROM fr)
      SELECT COUNT(*)::BIGINT AS n_occasions,
             MAX(nm)::BIGINT AS n_marked,
             SUM(r)::BIGINT AS sum_recaptures,
             CAST(ROUND(CAST(SUM(c::HUGEINT * m) AS DOUBLE)
               / (CAST(SUM(r::HUGEINT) AS DOUBLE) + 1.0), 6)
               AS DOUBLE) AS n_hat
      FROM occ CROSS JOIN mk""",

    // B+1 exploded md5-portable assignments (b = 0 observed), the
    // q_did mean tree per b frozen at 6 dp, exact rank fold.
    "q_rand_inference" -> """
      WITH base AS (
        SELECT CAST(user_id AS VARCHAR) AS u,
               CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t0,
               CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                 THEN 1 ELSE 0 END AS p,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
      bs AS (SELECT * FROM base
             CROSS JOIN (SELECT UNNEST(RANGE(0, 20)) AS b)),
      tt AS (SELECT b, p, v,
               CASE WHEN b = 0 THEN t0 ELSE
                 CASE WHEN ('0x' || SUBSTR(MD5(u || ':'
                     || CAST(b AS VARCHAR)), 1, 15))::BIGINT
                   / 1152921504606846976.0 < 0.5 THEN 1 ELSE 0 END
               END AS t
             FROM bs),
      cells AS (SELECT b, t, p, COUNT(*)::BIGINT AS n,
                       SUM(v::HUGEINT) AS s
                FROM tt GROUP BY 1, 2, 3),
      perb AS (SELECT b,
                 MAX(CASE WHEN t = 0 AND p = 0 THEN n END) AS nc0,
                 MAX(CASE WHEN t = 0 AND p = 1 THEN n END) AS nc1,
                 MAX(CASE WHEN t = 1 AND p = 0 THEN n END) AS nt0,
                 MAX(CASE WHEN t = 1 AND p = 1 THEN n END) AS nt1,
                 MAX(CASE WHEN t = 0 AND p = 0 THEN s END) AS sc0,
                 MAX(CASE WHEN t = 0 AND p = 1 THEN s END) AS sc1,
                 MAX(CASE WHEN t = 1 AND p = 0 THEN s END) AS st0,
                 MAX(CASE WHEN t = 1 AND p = 1 THEN s END) AS st1
               FROM cells GROUP BY b),
      dids AS (
        SELECT b,
               CASE WHEN nc0 IS NOT NULL AND nc1 IS NOT NULL
                     AND nt0 IS NOT NULL AND nt1 IS NOT NULL THEN
                 ROUND(((CAST(st1 AS DOUBLE) / CAST(nt1 AS DOUBLE)
                     - CAST(st0 AS DOUBLE) / CAST(nt0 AS DOUBLE))
                   - (CAST(sc1 AS DOUBLE) / CAST(nc1 AS DOUBLE)
                     - CAST(sc0 AS DOUBLE) / CAST(nc0 AS DOUBLE)))
                   / 1000000.0, 6) END AS did
        FROM perb),
      obs AS (SELECT did AS o FROM dids WHERE b = 0)
      SELECT COUNT(*)::BIGINT AS n_placebos,
             CAST(MAX(o) AS DOUBLE) AS did_obs,
             SUM(CASE WHEN ABS(did) >= ABS(o) THEN 1 ELSE 0 END)
               ::BIGINT AS n_ge,
             CAST(ROUND((CAST(SUM(CASE WHEN ABS(did) >= ABS(o)
                   THEN 1 ELSE 0 END) AS DOUBLE) + 1.0)
               / (CAST(COUNT(*) AS DOUBLE) + 1.0), 6) AS DOUBLE)
               AS p_value
      FROM dids CROSS JOIN obs
      WHERE b >= 1""",

    "q_did" -> """
      WITH pts AS (
        SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t,
               CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                 THEN 1 ELSE 0 END AS p,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL),
      cells AS (SELECT t, p, COUNT(*)::BIGINT AS n, SUM(v::HUGEINT) AS s,
                       SUM(v::HUGEINT * v) AS q
                FROM pts GROUP BY t, p),
      f AS (SELECT SUM(n) AS n,
              MAX(CASE WHEN t = 0 AND p = 0 THEN n END) AS nc0,
              MAX(CASE WHEN t = 0 AND p = 1 THEN n END) AS nc1,
              MAX(CASE WHEN t = 1 AND p = 0 THEN n END) AS nt0,
              MAX(CASE WHEN t = 1 AND p = 1 THEN n END) AS nt1,
              MAX(CASE WHEN t = 0 AND p = 0 THEN s END) AS sc0,
              MAX(CASE WHEN t = 0 AND p = 1 THEN s END) AS sc1,
              MAX(CASE WHEN t = 1 AND p = 0 THEN s END) AS st0,
              MAX(CASE WHEN t = 1 AND p = 1 THEN s END) AS st1,
              MAX(CASE WHEN t = 0 AND p = 0 THEN q END) AS qc0,
              MAX(CASE WHEN t = 0 AND p = 1 THEN q END) AS qc1,
              MAX(CASE WHEN t = 1 AND p = 0 THEN q END) AS qt0,
              MAX(CASE WHEN t = 1 AND p = 1 THEN q END) AS qt1
            FROM cells)
      SELECT CAST(n AS BIGINT) AS n,
        CAST(CASE WHEN nc0 IS NOT NULL THEN ROUND(CAST(sc0 AS DOUBLE)
          / CAST(nc0 AS DOUBLE) / 1000000.0, 6) END AS DOUBLE) AS m_c0,
        CAST(CASE WHEN nc1 IS NOT NULL THEN ROUND(CAST(sc1 AS DOUBLE)
          / CAST(nc1 AS DOUBLE) / 1000000.0, 6) END AS DOUBLE) AS m_c1,
        CAST(CASE WHEN nt0 IS NOT NULL THEN ROUND(CAST(st0 AS DOUBLE)
          / CAST(nt0 AS DOUBLE) / 1000000.0, 6) END AS DOUBLE) AS m_t0,
        CAST(CASE WHEN nt1 IS NOT NULL THEN ROUND(CAST(st1 AS DOUBLE)
          / CAST(nt1 AS DOUBLE) / 1000000.0, 6) END AS DOUBLE) AS m_t1,
        CAST(CASE WHEN nc0 IS NOT NULL AND nc1 IS NOT NULL
            AND nt0 IS NOT NULL AND nt1 IS NOT NULL THEN
          ROUND(((CAST(st1 AS DOUBLE) / CAST(nt1 AS DOUBLE)
              - CAST(st0 AS DOUBLE) / CAST(nt0 AS DOUBLE))
            - (CAST(sc1 AS DOUBLE) / CAST(nc1 AS DOUBLE)
              - CAST(sc0 AS DOUBLE) / CAST(nc0 AS DOUBLE)))
            / 1000000.0, 6) END AS DOUBLE) AS did,
        CAST(CASE WHEN nc0 >= 2 AND nc1 >= 2 AND nt0 >= 2 AND nt1 >= 2
          THEN ROUND(SQRT(
            ((CAST(nt1 AS DOUBLE) * CAST(qt1 AS DOUBLE)
                - CAST(st1 AS DOUBLE) * CAST(st1 AS DOUBLE))
              / (CAST(nt1 AS DOUBLE) * (CAST(nt1 AS DOUBLE) - 1.0))
              / CAST(nt1 AS DOUBLE)
            + (CAST(nt0 AS DOUBLE) * CAST(qt0 AS DOUBLE)
                - CAST(st0 AS DOUBLE) * CAST(st0 AS DOUBLE))
              / (CAST(nt0 AS DOUBLE) * (CAST(nt0 AS DOUBLE) - 1.0))
              / CAST(nt0 AS DOUBLE)
            + (CAST(nc1 AS DOUBLE) * CAST(qc1 AS DOUBLE)
                - CAST(sc1 AS DOUBLE) * CAST(sc1 AS DOUBLE))
              / (CAST(nc1 AS DOUBLE) * (CAST(nc1 AS DOUBLE) - 1.0))
              / CAST(nc1 AS DOUBLE)
            + (CAST(nc0 AS DOUBLE) * CAST(qc0 AS DOUBLE)
                - CAST(sc0 AS DOUBLE) * CAST(sc0 AS DOUBLE))
              / (CAST(nc0 AS DOUBLE) * (CAST(nc0 AS DOUBLE) - 1.0))
              / CAST(nc0 AS DOUBLE)) / 1000000000000.0), 6) END
          AS DOUBLE) AS se
      FROM f""",

    // Exact integer moments over complete 20-rating day panels; p_bar
    // / p_e / kappa identically-spelled float trees of those integers.
    "q_fleiss_kappa" -> """
      WITH rated AS (
        SELECT DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS s,
               event_type AS c,
               ROW_NUMBER() OVER (PARTITION BY CAST(ts AS DATE)
                 ORDER BY ts, event_id) AS rn
        FROM events),
      pts AS (SELECT s, c FROM rated WHERE rn <= 20),
      kept AS (SELECT s FROM pts GROUP BY s HAVING COUNT(*) = 20),
      cells AS (SELECT p.s, p.c, COUNT(*) AS n
                FROM pts p JOIN kept k ON p.s = k.s GROUP BY p.s, p.c),
      m AS (SELECT SUM(n::HUGEINT * n) AS s2,
                   COUNT(DISTINCT s) AS nsub FROM cells),
      bc AS (SELECT SUM(cj::HUGEINT * cj) AS sc2, COUNT(*) AS ncat
             FROM (SELECT c, SUM(n) AS cj FROM cells GROUP BY c))
      SELECT nsub::BIGINT AS n_subjects, CAST(20 AS BIGINT) AS r,
             ncat::BIGINT AS k_categories,
             CAST(CASE WHEN nsub > 0 THEN ROUND(
               (CAST(s2 AS DOUBLE) - CAST(nsub AS DOUBLE) * 20)
               / ((CAST(nsub AS DOUBLE) * 20) * 19.0), 6) END
               AS DOUBLE) AS p_bar,
             CAST(CASE WHEN nsub > 0 THEN ROUND(
               CAST(sc2 AS DOUBLE) / ((CAST(nsub AS DOUBLE) * 20)
                 * (CAST(nsub AS DOUBLE) * 20)), 6) END
               AS DOUBLE) AS p_e,
             CAST(CASE WHEN nsub > 0 AND CAST(sc2 AS DOUBLE)
                 / ((CAST(nsub AS DOUBLE) * 20)
                   * (CAST(nsub AS DOUBLE) * 20)) < 1.0 THEN ROUND(
               ((CAST(s2 AS DOUBLE) - CAST(nsub AS DOUBLE) * 20)
                 / ((CAST(nsub AS DOUBLE) * 20) * 19.0)
                - CAST(sc2 AS DOUBLE) / ((CAST(nsub AS DOUBLE) * 20)
                  * (CAST(nsub AS DOUBLE) * 20)))
               / (1.0 - CAST(sc2 AS DOUBLE) / ((CAST(nsub AS DOUBLE) * 20)
                  * (CAST(nsub AS DOUBLE) * 20))), 6) END
               AS DOUBLE) AS kappa
      FROM m CROSS JOIN bc""",

    // Order-fixed cumulative DECIMAL(38,12) ln-factorial ladder;
    // each hypergeometric tail term's exponent is exact decimal
    // arithmetic on six ladder values, exp frozen at 12 dp.
    "q_fisher_exact" -> """
      WITH base AS (
        SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS e,
               CASE WHEN value > 95.0 THEN 1 ELSE 0 END AS o
        FROM events
        WHERE CAST(ts AS DATE) = DATE '2024-01-15'
          AND value IS NOT NULL),
      cells AS (SELECT COALESCE(SUM(e * o), 0)::BIGINT AS a,
                       COALESCE(SUM(e * (1 - o)), 0)::BIGINT AS b,
                       COALESCE(SUM((1 - e) * o), 0)::BIGINT AS c,
                       COALESCE(SUM((1 - e) * (1 - o)), 0)::BIGINT AS d
                FROM base),
      c2 AS (SELECT *, a + b + c + d AS n, a + b AS r1, c + d AS r2,
                    a + c AS c1 FROM cells),
      seq AS (SELECT UNNEST(RANGE(0, (SELECT n FROM c2) + 1)) AS i),
      lf AS (SELECT i, SUM(CASE WHEN i >= 2
                 THEN ROUND(LN(CAST(i AS DOUBLE)), 12)::DECIMAL(38,12)
                 ELSE 0::DECIMAL(38,12) END)
               OVER (ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lf
             FROM seq),
      -- lookups via ONE ordered LIST instead of nine lf self-joins:
      -- duckdb's join-order search explodes past ~4 copies of the
      -- windowed CTE; the list is the same frozen ladder verbatim
      lfa AS (SELECT LIST(lf ORDER BY i) AS arr FROM lf),
      aps AS (SELECT UNNEST(RANGE((SELECT a FROM c2),
                (SELECT LEAST(r1, c1) FROM c2) + 1)) AS ap),
      t AS (SELECT c2.a, c2.b, c2.c, c2.d, c2.n,
              ROUND(EXP(CAST(arr[c2.r1 + 1] + arr[c2.r2 + 1]
                - arr[c2.n + 1] + arr[c2.c1 + 1] + arr[c2.n - c2.c1 + 1]
                - arr[aps.ap + 1] - arr[c2.r1 - aps.ap + 1]
                - arr[c2.c1 - aps.ap + 1]
                - arr[c2.r2 - c2.c1 + aps.ap + 1]
                AS DOUBLE)), 12)::DECIMAL(38,12) AS p
            FROM aps CROSS JOIN c2 CROSS JOIN lfa)
      SELECT a, b, c, d, n,
             CAST(ROUND(CAST(SUM(p) AS DOUBLE), 6) AS DOUBLE) AS p_greater
      FROM t GROUP BY a, b, c, d, n""",
    // Same grid construction: per-(group,value) counts, group sizes
    // broadcast onto the distinct-value table, per-group cumulative by
    // value, global cumulative recovered in-grid as the sum of
    // per-group cumulatives at each value. Integer numerators; one
    // rounded division.
    "q_ks_test" -> """
      WITH cells AS (
        SELECT event_type AS g, ROUND(value, 6) AS q, COUNT(*) AS c
        FROM events GROUP BY 1, 2),
      grps AS (SELECT g, SUM(c)::BIGINT AS ng FROM cells GROUP BY g),
      vals AS (SELECT DISTINCT q FROM cells),
      nn AS (SELECT SUM(c)::BIGINT AS n FROM cells),
      grid AS (
        SELECT gr.g, v.q, gr.ng, COALESCE(ce.c, 0)::BIGINT AS c
        FROM vals v CROSS JOIN grps gr
        LEFT JOIN cells ce ON ce.g IS NOT DISTINCT FROM gr.g
                          AND ce.q IS NOT DISTINCT FROM v.q),
      cum AS (
        SELECT g, q, ng,
               SUM(c) OVER (PARTITION BY g ORDER BY q NULLS FIRST) AS cg
        FROM grid),
      cum2 AS (
        SELECT g, q, ng, cg,
               SUM(cg) OVER (PARTITION BY q) AS call
        FROM cum)
      SELECT g AS event_type, MAX(ng) AS n_group,
             MAX(n) - MAX(ng) AS n_rest,
             CASE WHEN MAX(n) - MAX(ng) > 0 THEN
               CAST(ROUND(MAX(ABS(cg * (n - ng) - (call - cg) * ng))
                 / CAST(MAX(ng) * (MAX(n) - MAX(ng)) AS DOUBLE), 6)
                 AS DOUBLE)
             END AS ks
      FROM cum2 CROSS JOIN nn
      GROUP BY g
      ORDER BY event_type""",

    // The q_ks_test grid machinery on 16 equi-width bins of the
    // global [min,max] (floor-scaled, top edge clamped into the last
    // bin); a NULL value stays its own level on both engines, with
    // the window ordering pinned NULLS FIRST to match Spark.
    "q_ks_binned" -> """
      WITH st AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
      cells AS (
        SELECT event_type AS g,
               (CASE WHEN value IS NOT NULL THEN
                  CASE WHEN hi > lo
                    THEN LEAST(FLOOR((value - lo) * 16 / (hi - lo)), 15)
                    ELSE 0 END
                END)::BIGINT AS q,
               COUNT(*) AS c
        FROM events CROSS JOIN st GROUP BY 1, 2),
      grps AS (SELECT g, SUM(c)::BIGINT AS ng FROM cells GROUP BY g),
      vals AS (SELECT DISTINCT q FROM cells),
      nn AS (SELECT SUM(c)::BIGINT AS n FROM cells),
      grid AS (
        SELECT gr.g, v.q, gr.ng, COALESCE(ce.c, 0)::BIGINT AS c
        FROM vals v CROSS JOIN grps gr
        LEFT JOIN cells ce ON ce.g IS NOT DISTINCT FROM gr.g
                          AND ce.q IS NOT DISTINCT FROM v.q),
      cum AS (
        SELECT g, q, ng,
               SUM(c) OVER (PARTITION BY g ORDER BY q NULLS FIRST) AS cg
        FROM grid),
      cum2 AS (
        SELECT g, q, ng, cg,
               SUM(cg) OVER (PARTITION BY q) AS call
        FROM cum)
      SELECT g AS event_type, MAX(ng) AS n_group,
             MAX(n) - MAX(ng) AS n_rest,
             CASE WHEN MAX(n) - MAX(ng) > 0 THEN
               CAST(ROUND(MAX(ABS(cg * (n - ng) - (call - cg) * ng))
                 / CAST(MAX(ng) * (MAX(n) - MAX(ng)) AS DOUBLE), 6)
                 AS DOUBLE)
             END AS ks
      FROM cum2 CROSS JOIN nn
      GROUP BY g
      ORDER BY event_type""",

    // The q_kendall day cells; HUGEINT moment sums mirroring
    // decimal(38,0), the identical slope/intercept/R^2 float trees.
    // Exact HUGEINT moments per group, 12-dp-frozen s1²/ng terms in
    // DECIMAL(38,12), the identical F tree.
    "q_anova" -> """
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL),
      byg AS (
        SELECT g, COUNT(*)::BIGINT AS ng, SUM(x::HUGEINT) AS s1,
               SUM(x::HUGEINT * x) AS q1
        FROM pts GROUP BY g),
      agg AS (
        SELECT SUM(ng)::BIGINT AS n, COUNT(*)::BIGINT AS k,
               CAST(SUM(s1) AS DOUBLE) AS s, CAST(SUM(q1) AS DOUBLE) AS q,
               CAST(SUM(CAST(ROUND(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                 / ng, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sb
        FROM byg),
      d AS (SELECT n, k, sb - s * s / CAST(n AS DOUBLE) AS ssb,
                   q - sb AS ssw FROM agg)
      SELECT n, k, (k - 1)::BIGINT AS dof_between,
             (n - k)::BIGINT AS dof_within,
             CAST(CASE WHEN k >= 2 AND n > k AND ssw > 0.0 THEN
               ROUND((ssb / CAST(k - 1 AS DOUBLE))
                 / (ssw / CAST(n - k AS DOUBLE)), 6) END AS DOUBLE) AS f
      FROM d""",

    // The q_robust_outliers lower-median CTEs feeding |x - med| into
    // the q_anova fold.
    "q_levene" -> """
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL),
      r1 AS (
        SELECT g, x,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY x) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS nn
        FROM pts),
      m1 AS (
        SELECT g, x,
               MAX(CASE WHEN rn = (nn + 1) // 2 THEN x END)
                 OVER (PARTITION BY g) AS med
        FROM r1),
      z AS (SELECT g, ABS(x - med) AS x FROM m1),
      byg AS (
        SELECT g, COUNT(*)::BIGINT AS ng, SUM(x::HUGEINT) AS s1,
               SUM(x::HUGEINT * x) AS q1
        FROM z GROUP BY g),
      agg AS (
        SELECT SUM(ng)::BIGINT AS n, COUNT(*)::BIGINT AS k,
               CAST(SUM(s1) AS DOUBLE) AS s, CAST(SUM(q1) AS DOUBLE) AS q,
               CAST(SUM(CAST(ROUND(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                 / ng, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sb
        FROM byg),
      d AS (SELECT n, k, sb - s * s / CAST(n AS DOUBLE) AS ssb,
                   q - sb AS ssw FROM agg)
      SELECT n, k, (k - 1)::BIGINT AS dof_between,
             (n - k)::BIGINT AS dof_within,
             CAST(CASE WHEN k >= 2 AND n > k AND ssw > 0.0 THEN
               ROUND((ssb / CAST(k - 1 AS DOUBLE))
                 / (ssw / CAST(n - k AS DOUBLE)), 6) END AS DOUBLE) AS f
      FROM d""",

    // The DW fit/residual CTEs + h/r/D trees; (D DESC, g, x, y) top-10.
    "q_influence" -> """
      WITH cells AS (
        SELECT event_type AS g,
               DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS y
        FROM events GROUP BY 1, CAST(ts AS DATE)),
      pts AS (
        SELECT g, CAST(ROUND(x * 1000000.0) AS BIGINT) AS xq,
               CAST(ROUND(y * 1000000.0) AS BIGINT) AS yq
        FROM cells WHERE x IS NOT NULL AND y IS NOT NULL),
      mom AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(xq::HUGEINT) AS sx, SUM(yq::HUGEINT) AS sy,
               SUM(xq::HUGEINT * xq) AS sxx, SUM(xq::HUGEINT * yq) AS sxy
        FROM pts GROUP BY g),
      fit AS (
        SELECT g, n,
               CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS denx,
               CAST(sx AS DOUBLE) AS sxd,
               CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0 THEN
                 (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS b,
               (CAST(sy AS DOUBLE) - CASE WHEN CAST(n AS DOUBLE)
                      * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0 THEN
                 (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END
                 * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS a
        FROM mom),
      withe AS (
        SELECT pts.g, xq, yq, n, denx, sxd,
               ROUND((CAST(yq AS DOUBLE) - b * CAST(xq AS DOUBLE) - a)
                 / 1000000.0, 6) AS e
        FROM pts JOIN fit ON pts.g IS NOT DISTINCT FROM fit.g),
      sset AS (
        SELECT g, SUM(CAST(ROUND(e * e, 12) AS DECIMAL(38,12))) AS sse
        FROM withe GROUP BY g),
      diag AS (
        SELECT w.g, xq, yq, e, n, denx, sxd,
               CAST(sse AS DOUBLE) AS ssed,
               1.0 / CAST(n AS DOUBLE)
                 + (CAST(xq AS DOUBLE) - sxd / CAST(n AS DOUBLE))
                 * (CAST(xq AS DOUBLE) - sxd / CAST(n AS DOUBLE))
                 * CAST(n AS DOUBLE) / denx AS h
        FROM withe w JOIN sset ON w.g IS NOT DISTINCT FROM sset.g),
      d2 AS (
        SELECT g, xq, yq, h,
               e / SQRT(ssed / (CAST(n AS DOUBLE) - 2.0) * (1.0 - h))
                 AS r
        FROM diag
        WHERE n >= 3 AND denx > 0.0 AND ssed > 0.0)
      SELECT g AS event_type,
             CAST(xq / 1000000.0 AS DOUBLE) AS x,
             CAST(yq / 1000000.0 AS DOUBLE) AS y,
             CAST(ROUND(h, 6) AS DOUBLE) AS leverage,
             CAST(ROUND(r, 6) AS DOUBLE) AS std_resid,
             CAST(ROUND((r * r / 2.0) * (h / (1.0 - h)), 6) AS DOUBLE)
               AS cooks_d
      FROM d2
      ORDER BY ROUND((r * r / 2.0) * (h / (1.0 - h)), 6) DESC, g, x, y
      LIMIT 10""",

    // Twelve side-conditional HUGEINT moments (pooled = exact sums of
    // the sides), the dickeyFuller SSE tree per segment, one F.
    "q_chow" -> """
      WITH cells AS (
        SELECT event_type AS g,
               DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS y
        FROM events GROUP BY 1, CAST(ts AS DATE)),
      pts AS (
        SELECT g, x < 30.0 AS l,
               CAST(ROUND(x * 1000000.0) AS BIGINT) AS xq,
               CAST(ROUND(y * 1000000.0) AS BIGINT) AS yq
        FROM cells WHERE x IS NOT NULL AND y IS NOT NULL),
      m AS (
        SELECT g,
               SUM(CASE WHEN l THEN 1 ELSE 0 END)::BIGINT AS nL,
               SUM(CASE WHEN l THEN xq::HUGEINT ELSE 0 END) AS sxL,
               SUM(CASE WHEN l THEN yq::HUGEINT ELSE 0 END) AS syL,
               SUM(CASE WHEN l THEN xq::HUGEINT * xq ELSE 0 END) AS sxxL,
               SUM(CASE WHEN l THEN xq::HUGEINT * yq ELSE 0 END) AS sxyL,
               SUM(CASE WHEN l THEN yq::HUGEINT * yq ELSE 0 END) AS syyL,
               SUM(CASE WHEN NOT l THEN 1 ELSE 0 END)::BIGINT AS nR,
               SUM(CASE WHEN NOT l THEN xq::HUGEINT ELSE 0 END) AS sxR,
               SUM(CASE WHEN NOT l THEN yq::HUGEINT ELSE 0 END) AS syR,
               SUM(CASE WHEN NOT l THEN xq::HUGEINT * xq ELSE 0 END)
                 AS sxxR,
               SUM(CASE WHEN NOT l THEN xq::HUGEINT * yq ELSE 0 END)
                 AS sxyR,
               SUM(CASE WHEN NOT l THEN yq::HUGEINT * yq ELSE 0 END)
                 AS syyR
        FROM pts GROUP BY g),
      mp AS (
        SELECT *, nL + nR AS nP, sxL + sxR AS sxP, syL + syR AS syP,
               sxxL + sxxR AS sxxP, sxyL + sxyR AS sxyP,
               syyL + syyR AS syyP
        FROM m),
      t AS (
        SELECT g, nL, nR, nP,
               CAST(nL AS DOUBLE) * CAST(sxxL AS DOUBLE)
                 - CAST(sxL AS DOUBLE) * CAST(sxL AS DOUBLE) AS dxL,
               (CAST(nL AS DOUBLE) * CAST(syyL AS DOUBLE)
                  - CAST(syL AS DOUBLE) * CAST(syL AS DOUBLE)
                - (CAST(nL AS DOUBLE) * CAST(sxyL AS DOUBLE)
                   - CAST(sxL AS DOUBLE) * CAST(syL AS DOUBLE))
                  / (CAST(nL AS DOUBLE) * CAST(sxxL AS DOUBLE)
                     - CAST(sxL AS DOUBLE) * CAST(sxL AS DOUBLE))
                  * (CAST(nL AS DOUBLE) * CAST(sxyL AS DOUBLE)
                     - CAST(sxL AS DOUBLE) * CAST(syL AS DOUBLE)))
                 / CAST(nL AS DOUBLE) AS sseL,
               CAST(nR AS DOUBLE) * CAST(sxxR AS DOUBLE)
                 - CAST(sxR AS DOUBLE) * CAST(sxR AS DOUBLE) AS dxR,
               (CAST(nR AS DOUBLE) * CAST(syyR AS DOUBLE)
                  - CAST(syR AS DOUBLE) * CAST(syR AS DOUBLE)
                - (CAST(nR AS DOUBLE) * CAST(sxyR AS DOUBLE)
                   - CAST(sxR AS DOUBLE) * CAST(syR AS DOUBLE))
                  / (CAST(nR AS DOUBLE) * CAST(sxxR AS DOUBLE)
                     - CAST(sxR AS DOUBLE) * CAST(sxR AS DOUBLE))
                  * (CAST(nR AS DOUBLE) * CAST(sxyR AS DOUBLE)
                     - CAST(sxR AS DOUBLE) * CAST(syR AS DOUBLE)))
                 / CAST(nR AS DOUBLE) AS sseR,
               CAST(nP AS DOUBLE) * CAST(sxxP AS DOUBLE)
                 - CAST(sxP AS DOUBLE) * CAST(sxP AS DOUBLE) AS dxP,
               (CAST(nP AS DOUBLE) * CAST(syyP AS DOUBLE)
                  - CAST(syP AS DOUBLE) * CAST(syP AS DOUBLE)
                - (CAST(nP AS DOUBLE) * CAST(sxyP AS DOUBLE)
                   - CAST(sxP AS DOUBLE) * CAST(syP AS DOUBLE))
                  / (CAST(nP AS DOUBLE) * CAST(sxxP AS DOUBLE)
                     - CAST(sxP AS DOUBLE) * CAST(sxP AS DOUBLE))
                  * (CAST(nP AS DOUBLE) * CAST(sxyP AS DOUBLE)
                     - CAST(sxP AS DOUBLE) * CAST(syP AS DOUBLE)))
                 / CAST(nP AS DOUBLE) AS sseP
        FROM mp)
      SELECT g AS event_type, CAST(nP AS BIGINT) AS n,
             nL AS n_left, nR AS n_right,
             CAST(CASE WHEN nL >= 3 AND nR >= 3 AND dxL > 0.0
                    AND dxR > 0.0 AND dxP > 0.0
                    AND sseL + sseR > 0.0 THEN
               ROUND(((sseP - sseL - sseR) / 2.0)
                 / ((sseL + sseR) / (CAST(nP AS DOUBLE) - 4.0)), 6)
             END AS DOUBLE) AS f
      FROM t ORDER BY event_type""",

    // The q_durbin_watson residual CTEs, squared residuals 6-dp
    // frozen, the q_lin_fit auxiliary trees, BP = n·R².
    // The q_lin_fit cells ranked by (xq, yq); exact rank-cut tails,
    // the chow SSE trees, one rounded ratio (equal-k dofs cancel).
    "q_goldfeld_quandt" -> s"""
      WITH cells AS (
        SELECT event_type AS g,
               DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS y
        FROM events GROUP BY 1, CAST(ts AS DATE)),
      pts AS (
        SELECT g, CAST(ROUND(x * 1000000.0) AS BIGINT) AS xq,
               CAST(ROUND(y * 1000000.0) AS BIGINT) AS yq
        FROM cells WHERE x IS NOT NULL AND y IS NOT NULL),
      ranked AS (
        SELECT g, xq, yq,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY xq, yq) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS n,
               CAST(FLOOR(CAST(COUNT(*) OVER (PARTITION BY g) AS DOUBLE)
                 * ${(1.0 - 0.2) / 2.0}) AS BIGINT) AS k
        FROM pts),
      sided AS (
        SELECT g, xq, yq, n, k,
               CASE WHEN rn <= k THEN 'lo'
                    WHEN rn > n - k THEN 'hi' END AS side
        FROM ranked),
      sums AS (
        SELECT g, side, MAX(n)::BIGINT AS nn, MAX(k)::BIGINT AS kk,
               COUNT(*)::BIGINT AS ns,
               SUM(xq::HUGEINT) AS sx, SUM(yq::HUGEINT) AS sy,
               SUM(xq::HUGEINT * xq) AS sxx,
               SUM(xq::HUGEINT * yq) AS sxy,
               SUM(yq::HUGEINT * yq) AS syy
        FROM sided WHERE side IS NOT NULL GROUP BY g, side),
      sse AS (
        SELECT g, side, nn, kk,
               CASE WHEN CAST(ns AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0 THEN
                 CAST(ns AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                 - (CAST(ns AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   * (CAST(ns AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(ns AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS sse
        FROM sums)
      SELECT lo.g AS event_type, lo.nn AS n, lo.kk AS k,
             CAST(CASE WHEN lo.kk >= 3 AND lo.sse > 0.0
                        AND hi.sse IS NOT NULL THEN
               ROUND(hi.sse / lo.sse, 6) END AS DOUBLE) AS f_gq
      FROM (SELECT * FROM sse WHERE side = 'lo') lo
      JOIN (SELECT * FROM sse WHERE side = 'hi') hi
        ON hi.g IS NOT DISTINCT FROM lo.g
      ORDER BY event_type""",

    // The q_durbin_watson residual CTEs + the q_ols_multi Cramer
    // chain on (x, e_lag, e); BG = n_aux·R², one rounded product.
    "q_breusch_godfrey" -> """
      WITH cells AS (
        SELECT event_type AS g,
               DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS y
        FROM events GROUP BY 1, CAST(ts AS DATE)),
      pts AS (
        SELECT g, CAST(ROUND(x * 1000000.0) AS BIGINT) AS xq,
               CAST(ROUND(y * 1000000.0) AS BIGINT) AS yq
        FROM cells WHERE x IS NOT NULL AND y IS NOT NULL),
      mom AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(xq::HUGEINT) AS sx, SUM(yq::HUGEINT) AS sy,
               SUM(xq::HUGEINT * xq) AS sxx, SUM(xq::HUGEINT * yq) AS sxy
        FROM pts GROUP BY g),
      fit AS (
        SELECT g, n,
               CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0 THEN
                 (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS b,
               (CAST(sy AS DOUBLE) - CASE WHEN CAST(n AS DOUBLE)
                      * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0 THEN
                 (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END
                 * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS a
        FROM mom),
      res AS (
        SELECT pts.g, pts.xq,
               ROUND((CAST(yq AS DOUBLE) - b * CAST(xq AS DOUBLE) - a)
                 / 1000000.0, 6) AS e,
               LAG(ROUND((CAST(yq AS DOUBLE) - b * CAST(xq AS DOUBLE)
                 - a) / 1000000.0, 6)) OVER
                 (PARTITION BY pts.g ORDER BY xq, yq) AS el
        FROM pts JOIN fit ON pts.g IS NOT DISTINCT FROM fit.g),
      aux AS (
        SELECT g,
               CAST(ROUND(xq / 1000000.0 * 1000000.0) AS BIGINT) AS x1,
               CAST(ROUND(el * 1000000.0) AS BIGINT) AS x2,
               CAST(ROUND(e * 1000000.0) AS BIGINT) AS y
        FROM res
        WHERE el IS NOT NULL AND xq / 1000000.0 IS NOT NULL
          AND e IS NOT NULL),
      s AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(x1::HUGEINT) AS s1, SUM(x2::HUGEINT) AS s2,
               SUM(y::HUGEINT) AS sy,
               SUM(x1::HUGEINT * x1) AS s11, SUM(x2::HUGEINT * x2) AS s22,
               SUM(x1::HUGEINT * x2) AS s12, SUM(x1::HUGEINT * y) AS s1y,
               SUM(x2::HUGEINT * y) AS s2y, SUM(y::HUGEINT * y) AS syy
        FROM aux GROUP BY g),
      fl AS (
        SELECT g, n,
               CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS cs11,
               CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE)
                 - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS cs22,
               CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS cs12,
               CAST(n AS DOUBLE) * CAST(s1y AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) AS cs1y,
               CAST(n AS DOUBLE) * CAST(s2y AS DOUBLE)
                 - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) AS cs2y,
               CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS csyy
        FROM s),
      g1 AS (SELECT *, cs11 * cs22 - cs12 * cs12 AS det FROM fl),
      g2 AS (
        SELECT *,
               (cs1y * cs22 - cs2y * cs12) / det AS b1,
               (cs2y * cs11 - cs1y * cs12) / det AS b2
        FROM g1),
      r2t AS (
        SELECT g, n,
               CASE WHEN n >= 4 AND det > 0.0 AND csyy > 0.0 THEN
                 ROUND((b1 * cs1y + b2 * cs2y) / csyy, 6) END AS r2
        FROM g2)
      SELECT g AS event_type, n AS n_aux,
             CAST(r2 AS DOUBLE) AS r2_aux,
             CAST(CASE WHEN r2 IS NOT NULL THEN
               ROUND(CAST(n AS DOUBLE) * r2, 6) END AS DOUBLE) AS bg
      FROM r2t
      ORDER BY event_type""",

    "q_breusch_pagan" -> """
      WITH cells AS (
        SELECT event_type AS g,
               DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS y
        FROM events GROUP BY 1, CAST(ts AS DATE)),
      pts AS (
        SELECT g, CAST(ROUND(x * 1000000.0) AS BIGINT) AS xq,
               CAST(ROUND(y * 1000000.0) AS BIGINT) AS yq
        FROM cells WHERE x IS NOT NULL AND y IS NOT NULL),
      mom AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(xq::HUGEINT) AS sx, SUM(yq::HUGEINT) AS sy,
               SUM(xq::HUGEINT * xq) AS sxx, SUM(xq::HUGEINT * yq) AS sxy
        FROM pts GROUP BY g),
      fit AS (
        SELECT g, n,
               CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS denx,
               CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0 THEN
                 (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS b,
               (CAST(sy AS DOUBLE) - CASE WHEN CAST(n AS DOUBLE)
                      * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0 THEN
                 (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END
                 * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS a
        FROM mom),
      res AS (
        SELECT pts.g, pts.xq / 1000000.0 AS x,
               ROUND(ROUND((CAST(yq AS DOUBLE) - b * CAST(xq AS DOUBLE)
                 - a) / 1000000.0, 6)
                 * ROUND((CAST(yq AS DOUBLE) - b * CAST(xq AS DOUBLE)
                 - a) / 1000000.0, 6), 6) AS e2
        FROM pts JOIN fit ON pts.g IS NOT DISTINCT FROM fit.g),
      pts2 AS (
        SELECT g, CAST(ROUND(x * 1000000.0) AS BIGINT) AS xq,
               CAST(ROUND(e2 * 1000000.0) AS BIGINT) AS yq
        FROM res WHERE x IS NOT NULL AND e2 IS NOT NULL),
      s2 AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(xq::HUGEINT) AS sx, SUM(yq::HUGEINT) AS sy,
               SUM(xq::HUGEINT * xq) AS sxx, SUM(yq::HUGEINT * yq) AS syy,
               SUM(xq::HUGEINT * yq) AS sxy
        FROM pts2 GROUP BY g),
      d2 AS (
        SELECT g, n,
               CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
               CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS denx,
               CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny
        FROM s2),
      r2t AS (
        SELECT g, n,
               CAST(CASE WHEN denx > 0.0 AND deny > 0.0 THEN
                 ROUND(num * num / (denx * deny), 6)
               END AS DOUBLE) AS r2_aux
        FROM d2)
      SELECT g AS event_type, n, r2_aux,
             CAST(CASE WHEN r2_aux IS NOT NULL THEN
               ROUND(CAST(n AS DOUBLE) * r2_aux, 6) END AS DOUBLE) AS bp
      FROM r2t ORDER BY event_type""",

    // q_lin_fit cells + exact-moment OLS, 6-dp residuals, lag window,
    // 12-dp-frozen squared-term sums, one rounded division.
    "q_durbin_watson" -> """
      WITH cells AS (
        SELECT event_type AS g,
               DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS y
        FROM events GROUP BY 1, CAST(ts AS DATE)),
      pts AS (
        SELECT g, CAST(ROUND(x * 1000000.0) AS BIGINT) AS xq,
               CAST(ROUND(y * 1000000.0) AS BIGINT) AS yq
        FROM cells WHERE x IS NOT NULL AND y IS NOT NULL),
      mom AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(xq::HUGEINT) AS sx, SUM(yq::HUGEINT) AS sy,
               SUM(xq::HUGEINT * xq) AS sxx, SUM(xq::HUGEINT * yq) AS sxy
        FROM pts GROUP BY g),
      fit AS (
        SELECT g, n,
               CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS denx,
               CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0 THEN
                 (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS b,
               (CAST(sy AS DOUBLE) - CASE WHEN CAST(n AS DOUBLE)
                      * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0 THEN
                 (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END
                 * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS a
        FROM mom),
      res AS (
        SELECT pts.g,
               ROUND((CAST(yq AS DOUBLE) - b * CAST(xq AS DOUBLE) - a)
                 / 1000000.0, 6) AS e,
               LAG(ROUND((CAST(yq AS DOUBLE) - b * CAST(xq AS DOUBLE) - a)
                 / 1000000.0, 6)) OVER
                 (PARTITION BY pts.g ORDER BY xq, yq) AS ep
        FROM pts JOIN fit ON pts.g IS NOT DISTINCT FROM fit.g)
      SELECT g AS event_type, COUNT(*)::BIGINT AS n,
             CAST(CASE WHEN COUNT(*) >= 3 AND CAST(SUM(CAST(ROUND(e * e, 12)
                    AS DECIMAL(38,12))) AS DOUBLE) > 0.0 THEN
               ROUND(CAST(SUM(CASE WHEN ep IS NOT NULL THEN
                       CAST(ROUND((e - ep) * (e - ep), 12)
                         AS DECIMAL(38,12)) END) AS DOUBLE)
                 / CAST(SUM(CAST(ROUND(e * e, 12) AS DECIMAL(38,12)))
                     AS DOUBLE), 6)
             END AS DOUBLE) AS dw
      FROM res GROUP BY g
      ORDER BY event_type""",

    // Exact moments -> mean/sd doubles, 6-dp z per row, arg-max by
    // (z DESC, x DESC).
    "q_grubbs" -> """
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS xq
        FROM events WHERE value IS NOT NULL),
      mom AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(xq::HUGEINT) AS s1, SUM(xq::HUGEINT * xq) AS q1
        FROM pts GROUP BY g),
      m2 AS (
        SELECT g, n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
               (CAST(n AS DOUBLE) * CAST(q1 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS v
        FROM mom),
      m3 AS (SELECT g, n, mu,
                    CASE WHEN v > 0.0 THEN SQRT(v) END AS sd FROM m2),
      zs AS (
        SELECT pts.g, n, mu, sd, xq,
               CASE WHEN sd IS NOT NULL THEN
                 ROUND(ABS(CAST(xq AS DOUBLE) - mu) / sd, 6)
               ELSE 0.0 END AS z
        FROM pts JOIN m3 ON pts.g IS NOT DISTINCT FROM m3.g),
      top AS (
        SELECT g, n, mu, sd, xq, z,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY z DESC, xq DESC)
                 AS rn
        FROM zs)
      SELECT g AS event_type, n,
             CAST(ROUND(mu / 1000000.0, 6) AS DOUBLE) AS mean,
             CAST(ROUND(sd / 1000000.0, 6) AS DOUBLE) AS sd,
             CAST(CASE WHEN sd IS NOT NULL AND n >= 3 THEN
               ROUND(xq / 1000000.0, 6) END AS DOUBLE) AS suspect,
             CAST(CASE WHEN sd IS NOT NULL AND n >= 3 THEN z END
               AS DOUBLE) AS g
      FROM top WHERE rn = 1
      ORDER BY event_type""",

    // The q_cohens_d side-vs-rest HUGEINT moments; t and dof as the
    // identical Welch float trees.
    // The q_welch_t moment CTEs with the POOLED variance: sp2 =
    // ((n1-1)v1 + (n2-1)v2)/(n1+n2-2), exact-integer dof.
    "q_student_t" -> """
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL),
      byg AS (
        SELECT g, COUNT(*)::BIGINT AS n1, SUM(x::HUGEINT) AS s1,
               SUM(x::HUGEINT * x) AS q1
        FROM pts GROUP BY g),
      tot AS (SELECT SUM(n1)::BIGINT AS n, SUM(s1) AS s, SUM(q1) AS q
              FROM byg),
      j AS (
        SELECT g, n1, (n - n1)::BIGINT AS n2,
               CAST(n1 AS DOUBLE) AS n1d, CAST(n - n1 AS DOUBLE) AS n2d,
               CAST(s1 AS DOUBLE) AS s1d, CAST(q1 AS DOUBLE) AS q1d,
               CAST(s - s1 AS DOUBLE) AS s2d, CAST(q - q1 AS DOUBLE) AS q2d
        FROM byg, tot),
      w AS (
        SELECT g, n1, n2, n1d, n2d, s1d, s2d,
               (n1d * q1d - s1d * s1d) / (n1d * (n1d - 1.0)) AS v1,
               (n2d * q2d - s2d * s2d) / (n2d * (n2d - 1.0)) AS v2
        FROM j),
      o AS (
        SELECT g, n1, n2, n1d, n2d, s1d, s2d,
               ((n1d - 1.0) * v1 + (n2d - 1.0) * v2)
                 / (n1d + n2d - 2.0) AS sp2
        FROM w)
      SELECT g AS event_type, n1 AS n_group, n2 AS n_rest,
             CAST(CASE WHEN n1 >= 2 AND n2 >= 2 AND sp2 > 0.0 THEN
               ROUND((s1d / n1d - s2d / n2d)
                 / SQRT(sp2 * (1.0 / n1d + 1.0 / n2d)), 6)
             END AS DOUBLE) AS t,
             CAST(CASE WHEN n1 >= 2 AND n2 >= 2 AND sp2 > 0.0 THEN
               n1 + n2 - 2 END AS BIGINT) AS dof
      FROM o ORDER BY event_type""",

    // The q_welch_t moment CTEs + the pre-scaled margin trees; the
    // verdict compares the ROUNDED one-sided t's against the literal
    // critical value.
    "q_tost" -> """
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL),
      byg AS (
        SELECT g, COUNT(*)::BIGINT AS n1, SUM(x::HUGEINT) AS s1,
               SUM(x::HUGEINT * x) AS q1
        FROM pts GROUP BY g),
      tot AS (SELECT SUM(n1)::BIGINT AS n, SUM(s1) AS s, SUM(q1) AS q
              FROM byg),
      j AS (
        SELECT g, n1, (n - n1)::BIGINT AS n2,
               CAST(n1 AS DOUBLE) AS n1d, CAST(n - n1 AS DOUBLE) AS n2d,
               CAST(s1 AS DOUBLE) AS s1d, CAST(q1 AS DOUBLE) AS q1d,
               CAST(s - s1 AS DOUBLE) AS s2d, CAST(q - q1 AS DOUBLE) AS q2d
        FROM byg, tot),
      w AS (
        SELECT g, n1, n2, n1d, n2d, s1d, s2d,
               (n1d * q1d - s1d * s1d) / (n1d * (n1d - 1.0)) / n1d AS w1,
               (n2d * q2d - s2d * s2d) / (n2d * (n2d - 1.0)) / n2d AS w2
        FROM j),
      o AS (
        SELECT g, n1, n2,
               (n1 >= 2 AND n2 >= 2 AND w1 + w2 > 0.0) AS ok,
               s1d / n1d - s2d / n2d AS md, w1, w2, n1d, n2d
        FROM w),
      r AS (
        SELECT g, n1, n2, ok, w1, w2, n1d, n2d,
               CASE WHEN ok THEN ROUND(md / 1000000.0, 6) END
                 AS mean_diff,
               CASE WHEN ok THEN
                 ROUND((md + 100.0 * 1000000.0) / SQRT(w1 + w2), 6)
               END AS t_lower,
               CASE WHEN ok THEN
                 ROUND((md - 100.0 * 1000000.0) / SQRT(w1 + w2), 6)
               END AS t_upper
        FROM o)
      SELECT g AS event_type, n1 AS n_group, n2 AS n_rest,
             CAST(mean_diff AS DOUBLE) AS mean_diff,
             CAST(t_lower AS DOUBLE) AS t_lower,
             CAST(t_upper AS DOUBLE) AS t_upper,
             CAST(CASE WHEN ok AND w1 * w1 / (n1d - 1.0)
                 + w2 * w2 / (n2d - 1.0) > 0.0 THEN
               ROUND((w1 + w2) * (w1 + w2)
                 / (w1 * w1 / (n1d - 1.0) + w2 * w2 / (n2d - 1.0)), 6)
             END AS DOUBLE) AS dof,
             CASE WHEN ok THEN
               (t_lower > 1.645 AND t_upper < -1.645) END AS equivalent
      FROM r ORDER BY event_type""",

    "q_welch_t" -> """
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL),
      byg AS (
        SELECT g, COUNT(*)::BIGINT AS n1, SUM(x::HUGEINT) AS s1,
               SUM(x::HUGEINT * x) AS q1
        FROM pts GROUP BY g),
      tot AS (SELECT SUM(n1)::BIGINT AS n, SUM(s1) AS s, SUM(q1) AS q
              FROM byg),
      j AS (
        SELECT g, n1, (n - n1)::BIGINT AS n2,
               CAST(n1 AS DOUBLE) AS n1d, CAST(n - n1 AS DOUBLE) AS n2d,
               CAST(s1 AS DOUBLE) AS s1d, CAST(q1 AS DOUBLE) AS q1d,
               CAST(s - s1 AS DOUBLE) AS s2d, CAST(q - q1 AS DOUBLE) AS q2d
        FROM byg, tot),
      w AS (
        SELECT g, n1, n2, n1d, n2d, s1d, s2d,
               (n1d * q1d - s1d * s1d) / (n1d * (n1d - 1.0)) / n1d AS w1,
               (n2d * q2d - s2d * s2d) / (n2d * (n2d - 1.0)) / n2d AS w2
        FROM j),
      o AS (
        SELECT g, n1, n2,
               (n1 >= 2 AND n2 >= 2 AND w1 + w2 > 0.0) AS ok,
               s1d / n1d - s2d / n2d AS md, w1, w2, n1d, n2d
        FROM w)
      SELECT g AS event_type, n1 AS n_group, n2 AS n_rest,
             CAST(CASE WHEN ok THEN
               ROUND(md / SQRT(w1 + w2), 6) END AS DOUBLE) AS t,
             CAST(CASE WHEN ok AND w1 * w1 / (n1d - 1.0)
                 + w2 * w2 / (n2d - 1.0) > 0.0 THEN
               ROUND((w1 + w2) * (w1 + w2)
                 / (w1 * w1 / (n1d - 1.0) + w2 * w2 / (n2d - 1.0)), 6)
             END AS DOUBLE) AS dof
      FROM o ORDER BY event_type""",

    // Per-group variances from exact moments in SCALED units (the ln
    // offsets cancel), ln frozen at 12 dp BEFORE the (n-1) multiply.
    "q_bartlett" -> """
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL),
      byg AS (
        SELECT g, COUNT(*)::BIGINT AS ng, SUM(x::HUGEINT) AS s1,
               SUM(x::HUGEINT * x) AS q1
        FROM pts GROUP BY g),
      v AS (
        SELECT ng, CAST(ng AS DOUBLE) AS ngd,
               (CAST(ng AS DOUBLE) * CAST(q1 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                 / (CAST(ng AS DOUBLE) * (CAST(ng AS DOUBLE) - 1.0)) AS vv
        FROM byg WHERE ng >= 2),
      f AS (SELECT * FROM v WHERE vv > 0.0),
      agg AS (
        SELECT SUM(ng)::BIGINT AS n, COUNT(*)::BIGINT AS k,
               CAST(SUM(CAST(ROUND((ngd - 1.0) * ROUND(LN(vv), 12), 6)
                 AS DECIMAL(38,6))) AS DOUBLE) AS sln,
               CAST(SUM(CAST(ROUND((ngd - 1.0) * vv, 6)
                 AS DECIMAL(38,6))) AS DOUBLE) AS ssw,
               CAST(SUM(CAST(ROUND(1.0 / (ngd - 1.0), 12)
                 AS DECIMAL(38,12))) AS DOUBLE) AS sinv
        FROM f)
      SELECT n, k AS k_used,
             CAST(CASE WHEN k >= 2 AND n > k THEN
               ROUND((CAST(n - k AS DOUBLE)
                   * ROUND(LN(ssw / CAST(n - k AS DOUBLE)), 12) - sln)
                 / (1.0 + (sinv - 1.0 / CAST(n - k AS DOUBLE))
                   / (3.0 * (CAST(k AS DOUBLE) - 1.0))), 6)
             END AS DOUBLE) AS k2
      FROM agg""",

    // Grand LOWER median off the global value cumulative, then the
    // k x 2 chi-squared fold with 12-dp-frozen terms.
    "q_mood_median" -> """
      WITH cells AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS q,
               COUNT(*)::BIGINT AS c
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      nn AS (SELECT SUM(c)::BIGINT AS n FROM cells),
      vals AS (SELECT q, SUM(c) AS cq FROM cells GROUP BY q),
      cum AS (SELECT q, SUM(cq) OVER (ORDER BY q) AS call FROM vals),
      med AS (SELECT MIN(q) AS med FROM cum, nn WHERE call * 2 >= n),
      tab AS (
        SELECT g, SUM(CASE WHEN q <= med THEN c ELSE 0 END)::BIGINT AS lo,
               SUM(c)::BIGINT AS ng
        FROM cells, med GROUP BY g),
      tot AS (SELECT SUM(lo)::BIGINT AS tlo, SUM(ng)::BIGINT AS tn,
                     COUNT(*)::BIGINT AS k FROM tab),
      terms AS (
        SELECT tn, k, lo, ng,
               CAST(ng AS DOUBLE) * CAST(tlo AS DOUBLE)
                 / CAST(tn AS DOUBLE) AS elo,
               CAST(ng AS DOUBLE) * CAST(tn - tlo AS DOUBLE)
                 / CAST(tn AS DOUBLE) AS ehi
        FROM tab, tot)
      SELECT MAX(tn) AS n, MAX(k) AS k,
             CAST(CASE WHEN MIN(CASE WHEN elo > 0.0 AND ehi > 0.0
                 THEN 1 ELSE 0 END) = 1 AND MAX(k) >= 2 THEN
               ROUND(CAST(SUM(CASE WHEN elo > 0.0 AND ehi > 0.0 THEN
                 CAST(ROUND((CAST(lo AS DOUBLE) - elo)
                     * (CAST(lo AS DOUBLE) - elo) / elo
                   + (CAST(ng - lo AS DOUBLE) - ehi)
                     * (CAST(ng - lo AS DOUBLE) - ehi) / ehi, 12)
                 AS DECIMAL(38,12)) END) AS DOUBLE), 6)
             END AS DOUBLE) AS chi2,
             (MAX(k) - 1)::BIGINT AS dof
      FROM terms""",

    // The q_lin_fit day cells; centered 7-row MA, pmod phases,
    // decimal(38,6) phase-mean sums — every round replayed.
    "q_decompose" -> """
      WITH cells AS (
        SELECT event_type AS g,
               DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS y
        FROM events GROUP BY 1, CAST(ts AS DATE)),
      pts AS (
        SELECT g, CAST(x AS BIGINT) AS x,
               CAST(ROUND(y * 1000000.0) AS BIGINT) AS yq
        FROM cells WHERE x IS NOT NULL AND y IS NOT NULL),
      ma AS (
        SELECT g, x, yq, COUNT(*) OVER w7 AS nw, SUM(yq) OVER w7 AS s7
        FROM pts WINDOW w7 AS (PARTITION BY g ORDER BY x
          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      tr AS (
        SELECT g, x, yq,
               CASE WHEN nw = 7 THEN
                 ROUND(s7 / 7.0 / 1000000.0, 6) END AS trend,
               ((x % 7) + 7) % 7 AS phase
        FROM ma),
      det AS (
        SELECT g, x, yq, trend, phase,
               ROUND(yq / 1000000.0 - trend, 6) AS det
        FROM tr),
      pm AS (
        SELECT g, phase,
               ROUND(CAST(SUM(CAST(det AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*), 6) AS smean
        FROM det WHERE det IS NOT NULL GROUP BY g, phase),
      ct AS (
        SELECT g, ROUND(CAST(SUM(CAST(smean AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*), 6) AS c
        FROM pm GROUP BY g),
      j AS (
        SELECT d.g, d.x, d.yq, d.trend,
               ROUND(pm.smean - ct.c, 6) AS scenter
        FROM det d LEFT JOIN pm ON d.g = pm.g AND d.phase = pm.phase
        LEFT JOIN ct ON d.g = ct.g)
      SELECT g AS event_type, x,
             CAST(ROUND(yq / 1000000.0, 6) AS DOUBLE) AS y,
             CAST(trend AS DOUBLE) AS trend,
             CAST(CASE WHEN trend IS NOT NULL THEN scenter END
               AS DOUBLE) AS seasonal,
             CAST(CASE WHEN trend IS NOT NULL THEN
               ROUND(yq / 1000000.0 - trend - scenter, 6) END
               AS DOUBLE) AS resid
      FROM j ORDER BY event_type, x""",

    // Same cells; exact integer |e| sums, 12-dp sMAPE terms, MASE as
    // one integer cross-ratio.
    "q_forecast_acc" -> """
      WITH cells AS (
        SELECT event_type AS g,
               DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS y
        FROM events GROUP BY 1, CAST(ts AS DATE)),
      pts AS (
        SELECT g, CAST(x AS BIGINT) AS x,
               CAST(ROUND(y * 1000000.0) AS BIGINT) AS yq
        FROM cells WHERE x IS NOT NULL AND y IS NOT NULL),
      lg AS (
        SELECT g, yq,
               LAG(yq, 7) OVER (PARTITION BY g ORDER BY x) AS ys,
               LAG(yq, 1) OVER (PARTITION BY g ORDER BY x) AS y1
        FROM pts),
      e AS (
        SELECT g, ABS(yq - ys) AS es, ABS(yq - y1) AS e1,
               CASE WHEN ys IS NOT NULL THEN
                 CASE WHEN ABS(yq) + ABS(ys) = 0 THEN 0.0
                 ELSE ROUND(2.0 * ABS(yq - ys)
                   / CAST(ABS(yq) + ABS(ys) AS DOUBLE), 12) END
               END AS sm
        FROM lg)
      SELECT g AS event_type, COUNT(*)::BIGINT AS n,
             CAST(CASE WHEN COUNT(es) > 0 THEN
               ROUND(CAST(SUM(es::HUGEINT) AS DOUBLE) / COUNT(es)
                 / 1000000.0, 6) END AS DOUBLE) AS mae,
             CAST(CASE WHEN COUNT(es) > 0 THEN
               ROUND(CAST(SUM(CAST(sm AS DECIMAL(38,12))) AS DOUBLE)
                 / COUNT(es), 6) END AS DOUBLE) AS smape,
             CAST(CASE WHEN COUNT(es) > 0 AND COUNT(e1) > 0
                 AND SUM(e1) > 0 THEN
               ROUND(CAST(SUM(es::HUGEINT) AS DOUBLE) * COUNT(e1)
                 / (CAST(SUM(e1::HUGEINT) AS DOUBLE) * COUNT(es)), 6)
             END AS DOUBLE) AS mase
      FROM e GROUP BY g ORDER BY event_type""",

    // The q_anova MSW (12-dp-frozen s1^2/ng fold) under every
    // pairwise mean difference; Tukey-Kramer q float tree.
    "q_tukey_hsd" -> """
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL),
      byg AS (
        SELECT g, COUNT(*)::BIGINT AS ng, SUM(x::HUGEINT) AS s1,
               SUM(x::HUGEINT * x) AS q1
        FROM pts GROUP BY g),
      ms AS (
        SELECT SUM(ng)::BIGINT AS n, COUNT(*)::BIGINT AS k,
               CAST(SUM(q1) AS DOUBLE) AS q,
               CAST(SUM(CAST(ROUND(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                 / ng, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sb
        FROM byg),
      m AS (SELECT CASE WHEN n > k THEN
              (q - sb) / CAST(n - k AS DOUBLE) END AS msw FROM ms),
      pair AS (
        SELECT a.g AS group_a, b.g AS group_b, a.ng AS n_a, b.ng AS n_b,
               CAST(a.s1 AS DOUBLE) / CAST(a.ng AS DOUBLE)
                 - CAST(b.s1 AS DOUBLE) / CAST(b.ng AS DOUBLE) AS d,
               msw
        FROM byg a JOIN byg b ON a.g < b.g, m)
      SELECT group_a, group_b, n_a, n_b,
             CAST(ROUND(d / 1000000.0, 6) AS DOUBLE) AS diff,
             CAST(CASE WHEN msw > 0.0 THEN
               ROUND(d / SQRT(msw / 2.0 * (1.0 / CAST(n_a AS DOUBLE)
                 + 1.0 / CAST(n_b AS DOUBLE))), 6) END AS DOUBLE) AS q
      FROM pair ORDER BY group_a, group_b""",

    // The q_chi_squared cells/marginals with the likelihood-ratio
    // fold: ln frozen at 12 dp BEFORE the O multiply, 6-dp terms.
    "q_g_test" -> """
      WITH cells AS (
        SELECT lang AS a, source AS b, COUNT(*)::BIGINT AS o
        FROM documents GROUP BY 1, 2),
      rows_ AS (SELECT a, SUM(o)::BIGINT AS r FROM cells GROUP BY a),
      cols_ AS (SELECT b, SUM(o)::BIGINT AS c FROM cells GROUP BY b),
      tot AS (SELECT SUM(o)::HUGEINT AS n FROM cells),
      la AS (SELECT COUNT(*)::BIGINT AS ra FROM rows_),
      lb AS (SELECT COUNT(*)::BIGINT AS cb FROM cols_),
      terms AS (
        SELECT ROUND(CAST(ce.o AS DOUBLE)
                 * ROUND(LN(CAST(ce.o::HUGEINT * n AS DOUBLE)
                     / CAST(r.r::HUGEINT * c.c AS DOUBLE)), 12), 6)
                 ::DECIMAL(38,6) AS term
        FROM cells ce
        JOIN rows_ r ON ce.a IS NOT DISTINCT FROM r.a
        JOIN cols_ c ON ce.b IS NOT DISTINCT FROM c.b
        CROSS JOIN tot),
      s AS (SELECT SUM(term) AS sg FROM terms)
      SELECT CAST(n AS BIGINT) AS n, ra AS n_a_levels, cb AS n_b_levels,
             (ra - 1) * (cb - 1) AS dof,
             CAST(CASE WHEN ra - 1 > 0 AND cb - 1 > 0 THEN
               ROUND(2.0 * CAST(sg AS DOUBLE), 6) END AS DOUBLE) AS g
      FROM s CROSS JOIN tot CROSS JOIN la CROSS JOIN lb""",

    // The q_cvm_binned grid with the H(1-H) Anderson-Darling weight;
    // per-cell terms 12-dp frozen, H=1 cells excluded.
    "q_ad_binned" -> """
      WITH st AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
      cells AS (
        SELECT event_type AS g,
               (CASE WHEN value IS NOT NULL THEN
                  CASE WHEN hi > lo
                    THEN LEAST(FLOOR((value - lo) * 16 / (hi - lo)), 15)
                    ELSE 0 END
                END)::BIGINT AS q,
               COUNT(*) AS c
        FROM events CROSS JOIN st GROUP BY 1, 2),
      grps AS (SELECT g, SUM(c)::BIGINT AS ng FROM cells GROUP BY g),
      vals AS (SELECT DISTINCT q FROM cells),
      nn AS (SELECT SUM(c)::BIGINT AS n FROM cells),
      grid AS (
        SELECT gr.g, v.q, gr.ng, COALESCE(ce.c, 0)::BIGINT AS c
        FROM vals v CROSS JOIN grps gr
        LEFT JOIN cells ce ON ce.g IS NOT DISTINCT FROM gr.g
                          AND ce.q IS NOT DISTINCT FROM v.q),
      cum AS (
        SELECT g, q, ng, c,
               SUM(c) OVER (PARTITION BY g ORDER BY q NULLS FIRST) AS cg
        FROM grid),
      cum2 AS (
        SELECT g, q, ng, cg,
               SUM(cg) OVER (PARTITION BY q) AS call,
               SUM(c) OVER (PARTITION BY q) AS w
        FROM cum),
      termd AS (
        SELECT g, ng, n,
               CASE WHEN call > 0 AND call < n AND ng < n THEN
                 ROUND(CAST(w::HUGEINT
                       * ((cg * (n - ng) - (call - cg) * ng)::HUGEINT)
                       * ((cg * (n - ng) - (call - cg) * ng)::HUGEINT)
                     AS DOUBLE) * CAST(n AS DOUBLE)
                   / (CAST(ng AS DOUBLE) * CAST(n - ng AS DOUBLE)
                     * CAST(call AS DOUBLE) * CAST(n - call AS DOUBLE)),
                   12)::DECIMAL(38,12)
               END AS term
        FROM cum2 CROSS JOIN nn)
      SELECT g AS event_type, MAX(ng) AS n_group,
             MAX(n) - MAX(ng) AS n_rest,
             CAST(CASE WHEN MAX(n) - MAX(ng) > 0 THEN
               ROUND(CAST(SUM(term) AS DOUBLE), 6) END AS DOUBLE) AS ad
      FROM termd GROUP BY g ORDER BY event_type""",

    // Daily dollar cells; running mean as exact rational, 6-dp-frozen
    // deviations into DECIMAL(38,6) cumulative sums, running-min
    // excursion, first day over lambda=2000.
    "q_page_hinkley" -> """
      WITH cells AS (
        SELECT event_type AS g,
               DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM events GROUP BY 1, CAST(ts AS DATE)),
      pts AS (
        SELECT g, CAST(x AS BIGINT) AS x,
               CAST(ROUND((cents / 100.0) * 1000000.0) AS BIGINT) AS v
        FROM cells WHERE x IS NOT NULL),
      w AS (
        SELECT g, x, v, ROW_NUMBER() OVER wx AS t,
               SUM(v::HUGEINT) OVER wx AS s
        FROM pts WINDOW wx AS (PARTITION BY g ORDER BY x
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      dev AS (
        SELECT g, x,
               ROUND(v / 1000000.0
                 - ROUND(CAST(s AS DOUBLE) / t / 1000000.0, 6)
                 - 0.0, 6)::DECIMAL(38,6) AS dev
        FROM w),
      m AS (
        SELECT g, x, SUM(dev) OVER wx AS m
        FROM dev WINDOW wx AS (PARTITION BY g ORDER BY x
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      ph AS (
        SELECT g, x, m - MIN(m) OVER wx AS ph
        FROM m WINDOW wx AS (PARTITION BY g ORDER BY x
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT g AS event_type, COUNT(*)::BIGINT AS n,
             CAST(ROUND(CAST(MAX(ph) AS DOUBLE), 6) AS DOUBLE) AS ph_max,
             MIN(CASE WHEN ph > 2000.0 THEN x END)::BIGINT AS alarm_x
      FROM ph GROUP BY g ORDER BY event_type""",

    // Ten HUGEINT cross-moments per event type; pairwise r frozen at
    // 12 dp, the partial-r tree rounded 6 dp.
    "q_partial_corr" -> """
      WITH cells AS (
        SELECT event_type AS g,
               DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS xd,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                 AS cents,
               COUNT(*)::BIGINT AS nev
        FROM events GROUP BY 1, CAST(ts AS DATE)),
      pts AS (
        SELECT g, CAST(ROUND(xd * 1000000.0) AS BIGINT) AS x,
               CAST(ROUND((cents / 100.0) * 1000000.0) AS BIGINT) AS y,
               CAST(ROUND(nev * 1000000.0) AS BIGINT) AS z
        FROM cells WHERE xd IS NOT NULL),
      mom AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(x::HUGEINT) AS sx, SUM(y::HUGEINT) AS sy,
               SUM(z::HUGEINT) AS sz,
               SUM(x::HUGEINT * x) AS sxx, SUM(y::HUGEINT * y) AS syy,
               SUM(z::HUGEINT * z) AS szz, SUM(x::HUGEINT * y) AS sxy,
               SUM(x::HUGEINT * z) AS sxz, SUM(y::HUGEINT * z) AS syz
        FROM pts GROUP BY g),
      r AS (
        SELECT g, n, CAST(n AS DOUBLE) AS nd,
               CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
               CAST(sz AS DOUBLE) AS szd, CAST(sxx AS DOUBLE) AS sxxd,
               CAST(syy AS DOUBLE) AS syyd, CAST(szz AS DOUBLE) AS szzd,
               CAST(sxy AS DOUBLE) AS sxyd, CAST(sxz AS DOUBLE) AS sxzd,
               CAST(syz AS DOUBLE) AS syzd
        FROM mom),
      rr AS (
        SELECT g, n,
               CASE WHEN n >= 3 AND nd * syyd - syd * syd > 0.0
                     AND nd * szzd - szd * szd > 0.0 THEN
                 ROUND((nd * syzd - syd * szd)
                   / SQRT((nd * syyd - syd * syd)
                     * (nd * szzd - szd * szd)), 12) END AS ryz,
               CASE WHEN n >= 3 AND nd * sxxd - sxd * sxd > 0.0
                     AND nd * syyd - syd * syd > 0.0 THEN
                 ROUND((nd * sxyd - sxd * syd)
                   / SQRT((nd * sxxd - sxd * sxd)
                     * (nd * syyd - syd * syd)), 12) END AS ryx,
               CASE WHEN n >= 3 AND nd * sxxd - sxd * sxd > 0.0
                     AND nd * szzd - szd * szd > 0.0 THEN
                 ROUND((nd * sxzd - sxd * szd)
                   / SQRT((nd * sxxd - sxd * sxd)
                     * (nd * szzd - szd * szd)), 12) END AS rzx
        FROM r)
      SELECT g AS event_type, n,
             CAST(ROUND(ryz, 6) AS DOUBLE) AS r_yz,
             CAST(ROUND(ryx, 6) AS DOUBLE) AS r_yx,
             CAST(ROUND(rzx, 6) AS DOUBLE) AS r_zx,
             CAST(CASE WHEN (1.0 - ryx * ryx) * (1.0 - rzx * rzx) > 0.0
               THEN ROUND((ryz - ryx * rzx)
                 / SQRT((1.0 - ryx * ryx) * (1.0 - rzx * rzx)), 6)
             END AS DOUBLE) AS r_partial
      FROM rr ORDER BY event_type""",

    // Complete day blocks only; per-item variances 12-dp frozen into
    // DECIMAL(38,12), block-total variance, one alpha tree.
    "q_cronbach" -> """
      WITH cells AS (
        SELECT event_type AS i,
               DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS b,
               CAST(ROUND((CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                 AS BIGINT) / 100.0) * 1000000.0) AS BIGINT) AS v
        FROM events GROUP BY 1, CAST(ts AS DATE)),
      k AS (SELECT COUNT(DISTINCT i)::BIGINT AS k FROM cells),
      blocks AS (
        SELECT b, COUNT(*)::BIGINT AS ni, SUM(v::HUGEINT) AS tot
        FROM cells GROUP BY b),
      complete AS (
        SELECT b, tot FROM blocks CROSS JOIN k WHERE ni = k),
      items AS (
        SELECT SUM(CASE WHEN cnt >= 2 THEN
                 ROUND((CAST(cnt AS DOUBLE) * CAST(q AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                   / (CAST(cnt AS DOUBLE) * (CAST(cnt AS DOUBLE) - 1.0)),
                   12)::DECIMAL(38,12) END) AS svi
        FROM (
          SELECT c.i, COUNT(*)::BIGINT AS cnt,
                 SUM(c.v::HUGEINT) AS s, SUM(c.v::HUGEINT * c.v) AS q
          FROM cells c JOIN complete cb ON c.b = cb.b
          GROUP BY c.i)),
      totals AS (
        SELECT COUNT(*)::BIGINT AS nb, SUM(tot) AS st,
               SUM(tot * tot) AS qt
        FROM complete)
      SELECT nb AS n_blocks, k,
             CAST(CASE WHEN k >= 2 AND nb >= 2
                 AND (CAST(nb AS DOUBLE) * CAST(qt AS DOUBLE)
                   - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                   / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0))
                   > 0.0 THEN
               ROUND(CAST(k AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0)
                 * (1.0 - CAST(svi AS DOUBLE)
                   / ((CAST(nb AS DOUBLE) * CAST(qt AS DOUBLE)
                     - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                     / (CAST(nb AS DOUBLE)
                       * (CAST(nb AS DOUBLE) - 1.0)))), 6)
             END AS DOUBLE) AS alpha
      FROM totals CROSS JOIN items CROSS JOIN k""",

    // Per-stratum 2x2 integer cells; a*d/n, b*c/n, E[a], Var terms
    // 12-dp frozen into DECIMAL(38,12) sums; OR and chi2 one tree.
    "q_mantel_haenszel" -> """
      WITH tab AS (
        SELECT event_type AS s,
               SUM(CASE WHEN user_id % 2 = 0 AND value > 50.0
                 THEN 1 ELSE 0 END)::BIGINT AS a,
               SUM(CASE WHEN user_id % 2 = 0 AND NOT value > 50.0
                 THEN 1 ELSE 0 END)::BIGINT AS b,
               SUM(CASE WHEN NOT user_id % 2 = 0 AND value > 50.0
                 THEN 1 ELSE 0 END)::BIGINT AS c,
               SUM(CASE WHEN NOT user_id % 2 = 0 AND NOT value > 50.0
                 THEN 1 ELSE 0 END)::BIGINT AS d
        FROM events WHERE value IS NOT NULL GROUP BY 1),
      t2 AS (SELECT *, (a + b + c + d)::BIGINT AS n FROM tab
             WHERE a + b + c + d >= 2),
      agg AS (
        SELECT COUNT(*)::BIGINT AS n_strata, SUM(n)::BIGINT AS n,
               SUM(a)::BIGINT AS sa,
               SUM(ROUND(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                 / CAST(n AS DOUBLE), 12)::DECIMAL(38,12)) AS sad,
               SUM(ROUND(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
                 / CAST(n AS DOUBLE), 12)::DECIMAL(38,12)) AS sbc,
               SUM(ROUND((CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
                 * (CAST(a AS DOUBLE) + CAST(c AS DOUBLE))
                 / CAST(n AS DOUBLE), 12)::DECIMAL(38,12)) AS sea,
               SUM(ROUND((CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
                 * (CAST(c AS DOUBLE) + CAST(d AS DOUBLE))
                 * (CAST(a AS DOUBLE) + CAST(c AS DOUBLE))
                 * (CAST(b AS DOUBLE) + CAST(d AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                   * (CAST(n AS DOUBLE) - 1.0)), 12)::DECIMAL(38,12))
                 AS sva
        FROM t2)
      SELECT n_strata, n,
             CAST(CASE WHEN CAST(sbc AS DOUBLE) > 0.0 THEN
               ROUND(CAST(sad AS DOUBLE) / CAST(sbc AS DOUBLE), 6)
             END AS DOUBLE) AS or_mh,
             CAST(CASE WHEN CAST(sva AS DOUBLE) > 0.0 THEN
               ROUND((CAST(sa AS DOUBLE) - CAST(sea AS DOUBLE))
                 * (CAST(sa AS DOUBLE) - CAST(sea AS DOUBLE))
                 / CAST(sva AS DOUBLE), 6)
             END AS DOUBLE) AS cmh_chi2
      FROM agg""",

    // Complete day blocks; doubled within-block mid-ranks 2r+c-1,
    // HUGEINT rank-sum squares, the classic uncorrected chi2_F tree.
    // Exact integer pair differences over bounded daily cells; exact
    // lower median of the pair multiset.
    "q_hodges_lehmann" -> """
      WITH daily AS (
        SELECT event_type AS g,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS y
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY event_type, CAST(ts AS DATE)),
      pts AS (SELECT g, CAST(ROUND(y * 1000000.0) AS BIGINT) AS x
              FROM daily),
      lab AS (SELECT COUNT(DISTINCT g)::BIGINT AS k,
                     MIN(g) AS g1, MAX(g) AS g2 FROM pts),
      a AS (SELECT x AS xa FROM pts, lab WHERE g = g1),
      b AS (SELECT x AS xb FROM pts, lab WHERE g = g2),
      d AS (SELECT xb - xa AS dd FROM a CROSS JOIN b),
      m AS (SELECT dd, ROW_NUMBER() OVER (ORDER BY dd) AS rn,
                   COUNT(*) OVER () AS mm FROM d),
      med AS (SELECT MAX(dd) AS med, MAX(mm)::BIGINT AS npairs
              FROM m WHERE rn = CAST(FLOOR((mm + 1) / 2) AS BIGINT)),
      sz AS (SELECT MIN_BY(n, g) AS n1, MAX_BY(n, g) AS n2
             FROM (SELECT g, COUNT(*)::BIGINT AS n FROM pts GROUP BY g))
      SELECT g1, g2, k AS k_groups, n1, n2,
             COALESCE(npairs, 0)::BIGINT AS n_pairs,
             CAST(CASE WHEN k = 2
               THEN ROUND(CAST(med AS DOUBLE) / 1000000.0, 6)
               END AS DOUBLE) AS hl_shift
      FROM lab CROSS JOIN med CROSS JOIN sz""",

    // Frozen group means, 6-dp deviations, doubled mid-ranks from
    // value-cell cumulatives, exact decimal rank powers, the same T.
    "q_conover" -> """
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL),
      means AS (
        SELECT g AS gm,
               ROUND(CAST(SUM(x::HUGEINT) AS DOUBLE) / COUNT(*), 12)
                 AS mu
        FROM pts GROUP BY g),
      devs AS (
        SELECT g, ROUND(ABS(CAST(x AS DOUBLE) - mu), 6) AS u
        FROM pts JOIN means ON means.gm = pts.g),
      cells AS (SELECT g, u, COUNT(*)::BIGINT AS c
                FROM devs GROUP BY g, u),
      tot AS (
        SELECT uv, e,
               COALESCE(SUM(e) OVER (ORDER BY uv
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 ::BIGINT AS cbelow
        FROM (SELECT u AS uv, SUM(c)::BIGINT AS e FROM cells GROUP BY u)),
      wr AS (
        SELECT g, c, (2 * cbelow + e + 1)::HUGEINT AS m2
        FROM cells JOIN tot ON tot.uv = cells.u),
      byg AS (
        SELECT g, SUM(c)::BIGINT AS ng,
               SUM(c::HUGEINT * m2 * m2) AS sg,
               SUM(c::HUGEINT * m2 * m2 * m2 * m2) AS s4
        FROM wr GROUP BY g),
      agg AS (
        SELECT SUM(ng)::BIGINT AS n, COUNT(*)::BIGINT AS k,
               CAST(SUM(CAST(ROUND(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                 / ng, 12) AS DECIMAL(38,12))) AS DOUBLE) AS ssg,
               CAST(SUM(sg) AS DOUBLE) AS ss, CAST(SUM(s4) AS DOUBLE) AS sq
        FROM byg),
      fin AS (
        SELECT n, k, ssg, ss / n AS sbar, sq FROM agg),
      fin2 AS (
        SELECT n, k, ssg, sbar,
               (sq - CAST(n AS DOUBLE) * sbar * sbar)
                 / CAST(n - 1 AS DOUBLE) AS d2
        FROM fin)
      SELECT n, k, (k - 1)::BIGINT AS dof,
             CAST(CASE WHEN k >= 2 AND n >= 2 AND d2 > 0.0 THEN
               ROUND((ssg - CAST(n AS DOUBLE) * sbar * sbar) / d2, 6)
               END AS DOUBLE) AS t
      FROM fin2""",

    // q_friedman's prep + label-order treatment positions + the exact
    // integer L fold and z tree.
    "q_page_trend" -> """
      WITH cells AS (
        SELECT event_type AS i,
               DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS b,
               CAST(ROUND((CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                 AS BIGINT) / 100.0) * 1000000.0) AS BIGINT) AS v
        FROM events GROUP BY 1, CAST(ts AS DATE)),
      k AS (SELECT COUNT(DISTINCT i)::BIGINT AS k FROM cells),
      complete AS (
        SELECT b FROM cells CROSS JOIN k
        GROUP BY b, k HAVING COUNT(DISTINCT i) = MAX(k)),
      ranked AS (
        SELECT c.i,
               2 * RANK() OVER (PARTITION BY c.b ORDER BY c.v)
                 + COUNT(*) OVER (PARTITION BY c.b, c.v) - 1 AS m2
        FROM cells c JOIN complete cb ON c.b = cb.b),
      pert AS (
        SELECT i, SUM(m2::HUGEINT) AS r2, COUNT(*)::BIGINT AS nb
        FROM ranked GROUP BY i),
      pos AS (SELECT i, r2, nb,
                ROW_NUMBER() OVER (ORDER BY i) AS c FROM pert),
      agg AS (
        SELECT MAX(nb)::BIGINT AS n, COUNT(*)::BIGINT AS kk,
               SUM(c::HUGEINT * r2) AS l2
        FROM pos)
      SELECT n AS n_blocks, kk AS k,
             CAST(l2 AS DOUBLE) / 2.0 AS l_stat,
             CAST(CASE WHEN kk >= 3 AND n >= 1 THEN
               ROUND((CAST(l2 AS DOUBLE)
                   - CAST(n AS DOUBLE) * CAST(kk AS DOUBLE)
                     * CAST(kk + 1 AS DOUBLE) * CAST(kk + 1 AS DOUBLE)
                     / 2.0)
                 / (2.0 * SQRT(CAST(n AS DOUBLE) * CAST(kk AS DOUBLE)
                     * CAST(kk AS DOUBLE) * CAST(kk + 1 AS DOUBLE)
                     * CAST(kk * kk - 1 AS DOUBLE) / 144.0)), 6)
             END AS DOUBLE) AS z
      FROM agg""",

    // Fully integer one-sample D: the grid keeps empty bins honest.
    "q_ks_uniform" -> """
      WITH st AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
      cells AS (
        SELECT g, q, COUNT(*)::BIGINT AS c FROM (
          SELECT event_type AS g,
                 (CASE WHEN hi > lo
                    THEN LEAST(FLOOR((value - lo) * 16 / (hi - lo)), 15)
                    END)::BIGINT AS q
          FROM events CROSS JOIN st WHERE value IS NOT NULL)
        WHERE q IS NOT NULL GROUP BY g, q),
      groups AS (SELECT g, SUM(c)::BIGINT AS n FROM cells GROUP BY g),
      grid AS (
        SELECT gg.g, gg.n, gg.qq, COALESCE(c.c, 0)::BIGINT AS c
        FROM (SELECT g, n, qq
              FROM groups, UNNEST(RANGE(0, 16)) r(qq)) gg
        LEFT JOIN cells c ON c.g = gg.g AND c.q = gg.qq),
      cum AS (
        SELECT g, n, qq,
               SUM(c) OVER (PARTITION BY g ORDER BY qq
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM grid)
      SELECT g AS event_type, MAX(n)::BIGINT AS n,
             CAST(ROUND(CAST(MAX(ABS(cum * 16 - n * (qq + 1))) AS DOUBLE)
               / CAST(MAX(n) * 16 AS DOUBLE), 6) AS DOUBLE) AS ks
      FROM cum GROUP BY g ORDER BY g""",

    "q_friedman" -> """
      WITH cells AS (
        SELECT event_type AS i,
               DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS b,
               CAST(ROUND((CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                 AS BIGINT) / 100.0) * 1000000.0) AS BIGINT) AS v
        FROM events GROUP BY 1, CAST(ts AS DATE)),
      k AS (SELECT COUNT(DISTINCT i)::BIGINT AS k FROM cells),
      complete AS (
        SELECT b FROM cells CROSS JOIN k
        GROUP BY b, k HAVING COUNT(DISTINCT i) = MAX(k)),
      ranked AS (
        SELECT c.i,
               2 * RANK() OVER (PARTITION BY c.b ORDER BY c.v)
                 + COUNT(*) OVER (PARTITION BY c.b, c.v) - 1 AS m2
        FROM cells c JOIN complete cb ON c.b = cb.b),
      pert AS (
        SELECT i, SUM(m2::HUGEINT) AS r2, COUNT(*)::BIGINT AS nb
        FROM ranked GROUP BY i),
      agg AS (
        SELECT MAX(nb)::BIGINT AS n, COUNT(*)::BIGINT AS kk,
               SUM(r2 * r2) AS sr2
        FROM pert)
      SELECT n AS n_blocks, kk AS k, (kk - 1)::BIGINT AS dof,
             CAST(CASE WHEN kk >= 2 AND n >= 1 THEN
               ROUND(3.0 * CAST(sr2 AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(kk AS DOUBLE)
                     * (CAST(kk AS DOUBLE) + 1.0))
                 - 3.0 * CAST(n AS DOUBLE)
                   * (CAST(kk AS DOUBLE) + 1.0), 6)
             END AS DOUBLE) AS chi2
      FROM agg""",

    // Centered decimal moments, the closed-form Deming root, frozen
    // slope inside the intercept tree.
    "q_deming" -> """
      WITH pts AS (
        SELECT event_type AS g, ROUND(value, 6) AS x,
               ROUND(ROUND(value, 0), 6) AS y
        FROM events
        WHERE value IS NOT NULL AND ROUND(value, 0) IS NOT NULL),
      f AS (SELECT g, COUNT(*)::BIGINT AS n,
                   SUM(CAST(x AS DECIMAL(38,12))) AS sx,
                   SUM(CAST(y AS DECIMAL(38,12))) AS sy,
                   SUM(CAST(ROUND(x * x, 12) AS DECIMAL(38,12))) AS sxx,
                   SUM(CAST(ROUND(x * y, 12) AS DECIMAL(38,12))) AS sxy,
                   SUM(CAST(ROUND(y * y, 12) AS DECIMAL(38,12))) AS syy
            FROM pts GROUP BY g),
      t AS (SELECT g, n, sx, sy,
                   CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                     * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS cxx,
                   CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                     * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS cxy,
                   CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                     * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS cyy
            FROM f),
      b AS (SELECT g, n, sx, sy,
                   CASE WHEN n >= 2 AND cxy <> 0.0 THEN
                     ROUND((cyy - 1.0 * cxx
                       + SQRT((cyy - 1.0 * cxx) * (cyy - 1.0 * cxx)
                         + 4.0 * cxy * cxy)) / (2.0 * cxy), 6) END AS sl
            FROM t)
      SELECT g AS event_type, n,
             CAST(sl AS DOUBLE) AS slope,
             CAST(ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
               - sl * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6)
               AS DOUBLE) AS intercept
      FROM b
      ORDER BY event_type""",

    // The q_mantel_haenszel table fold + the per-stratum quadratic
    // with the interval-selected root and the exact psi = 1 linear
    // fallback; 12-dp terms, loud exclusion counts.
    "q_breslow_day" -> """
      WITH rows0 AS (
        SELECT event_type AS s, (user_id % 2 = 0) AS e,
               (value > 50.0) AS o
        FROM events),
      tab AS (
        SELECT s,
               SUM(CASE WHEN e AND o THEN 1 ELSE 0 END)::BIGINT AS a,
               SUM(CASE WHEN e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS b,
               SUM(CASE WHEN NOT e AND o THEN 1 ELSE 0 END)::BIGINT AS c,
               SUM(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)::BIGINT
                 AS d
        FROM rows0 WHERE e IS NOT NULL AND o IS NOT NULL GROUP BY s),
      tab2 AS (SELECT s, a, b, c, d, a + b + c + d AS n FROM tab
               WHERE a + b + c + d >= 2),
      ps AS (SELECT CASE WHEN CAST(sbc AS DOUBLE) > 0.0 THEN
               ROUND(CAST(sad AS DOUBLE) / CAST(sbc AS DOUBLE), 6) END
               AS psi
             FROM (SELECT
               SUM(CAST(ROUND(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                 / CAST(n AS DOUBLE), 12) AS DECIMAL(38,12))) AS sad,
               SUM(CAST(ROUND(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
                 / CAST(n AS DOUBLE), 12) AS DECIMAL(38,12))) AS sbc
             FROM tab2)),
      w1 AS (SELECT a, n, a + b AS r1i, a + c AS c1i, psi,
                    CAST(a + b AS DOUBLE) AS r1,
                    CAST(a + c AS DOUBLE) AS c1,
                    CAST(n AS DOUBLE) AS nd
             FROM tab2 CROSS JOIN ps WHERE psi IS NOT NULL),
      w2 AS (SELECT *, GREATEST(0.0, r1 + c1 - nd) AS lo,
                    LEAST(r1, c1) AS hi, psi - 1.0 AS aa,
                    (nd - r1 - c1) + psi * (r1 + c1) AS bb,
                    psi * r1 * c1 AS cc
             FROM w1),
      w3 AS (SELECT *, bb * bb - 4.0 * aa * cc AS dsc FROM w2),
      w4 AS (SELECT *, CASE WHEN psi = 1.0 THEN cc / bb
                            WHEN (bb - SQRT(dsc)) / (2.0 * aa) >= lo
                             AND (bb - SQRT(dsc)) / (2.0 * aa) <= hi
                            THEN (bb - SQRT(dsc)) / (2.0 * aa)
                            ELSE (bb + SQRT(dsc)) / (2.0 * aa) END AS at
             FROM w3),
      w5 AS (SELECT *, (at > lo AND at < hi AND r1i >= 1 AND c1i >= 1
                        AND r1i < n AND c1i < n) AS ok
             FROM w4),
      w6 AS (SELECT ok, psi, CASE WHEN ok THEN
               ROUND((CAST(a AS DOUBLE) - at) * (CAST(a AS DOUBLE) - at)
                 * (1.0 / at + 1.0 / (r1 - at) + 1.0 / (c1 - at)
                   + 1.0 / (nd - r1 - c1 + at)), 12) END AS term
             FROM w5)
      SELECT SUM(CASE WHEN ok THEN 1 ELSE 0 END)::BIGINT
               AS n_strata_used,
             SUM(CASE WHEN ok THEN 0 ELSE 1 END)::BIGINT
               AS n_strata_excluded,
             CAST(MAX(psi) AS DOUBLE) AS or_mh,
             CAST(CASE WHEN SUM(CASE WHEN ok THEN 1 ELSE 0 END) >= 2
               THEN ROUND(CAST(SUM(CAST(term AS DECIMAL(38,12)))
                 AS DOUBLE), 6) END AS DOUBLE) AS bd_chi2,
             CAST(CASE WHEN SUM(CASE WHEN ok THEN 1 ELSE 0 END) >= 2
               THEN SUM(CASE WHEN ok THEN 1 ELSE 0 END) - 1 END
               AS BIGINT) AS dof
      FROM w6""",

    // Three unrolled grubbs passes on (value, count) cells with the
    // frozen-max winner filter and one-occurrence decrements.
    "q_gesd" -> s"""
      WITH c1 AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS xq,
               COUNT(*)::BIGINT AS c
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      ${(1 to 3).map(gesdPass).mkString(",\n      ")}
      SELECT g AS event_type, pass, n_remaining,
             CAST(suspect AS DOUBLE) AS suspect, CAST(r AS DOUBLE) AS r
      FROM (SELECT * FROM o1 UNION ALL SELECT * FROM o2
            UNION ALL SELECT * FROM o3)
      ORDER BY event_type, pass""",

    // Global frozen bin edges, exact integer bin-gap folds over the
    // per-group cell pair table, the three V-statistic trees.
    "q_dcor" -> """
      WITH src AS (SELECT event_type AS g, value AS x,
                          CAST(HOUR(ts) AS DOUBLE) AS y
                   FROM events),
      st AS (SELECT MIN(x) AS xlo, MAX(x) AS xhi,
                    MIN(y) AS ylo, MAX(y) AS yhi FROM src),
      cells AS (
        SELECT g,
               CAST(CASE WHEN xhi > xlo THEN
                 LEAST(CAST(FLOOR((x - xlo) * 16 / (xhi - xlo))
                   AS BIGINT), 15) ELSE 0 END AS BIGINT) AS bx,
               CAST(CASE WHEN yhi > ylo THEN
                 LEAST(CAST(FLOOR((y - ylo) * 16 / (yhi - ylo))
                   AS BIGINT), 15) ELSE 0 END AS BIGINT) AS by,
               COUNT(*)::BIGINT AS w
        FROM src CROSS JOIN st
        WHERE x IS NOT NULL AND y IS NOT NULL
        GROUP BY 1, 2, 3),
      pr AS (SELECT p.g AS g, p.bx AS bx, p.by AS by, p.w AS w,
                    (p.w::HUGEINT * q.w)::HUGEINT AS ww,
                    ABS(p.bx - q.bx) AS dx, ABS(p.by - q.by) AS dy,
                    q.w AS w2
             FROM cells p JOIN cells q ON p.g = q.g),
      rs AS (SELECT g, bx, by, MAX(w) AS wc,
                    SUM(w2::HUGEINT * dx) AS rx,
                    SUM(w2::HUGEINT * dy) AS ry,
                    SUM(ww * dx * dy) AS axy, SUM(ww * dx * dx) AS axx,
                    SUM(ww * dy * dy) AS ayy,
                    SUM(ww * dx) AS bx2, SUM(ww * dy) AS by2
             FROM pr GROUP BY g, bx, by),
      f AS (SELECT g, SUM(wc)::BIGINT AS n,
                   SUM(axy) AS a, SUM(axx) AS ax, SUM(ayy) AS ay,
                   SUM(bx2) AS bxs, SUM(by2) AS bys,
                   SUM(wc::HUGEINT * rx * ry) AS c,
                   SUM(wc::HUGEINT * rx * rx) AS cx,
                   SUM(wc::HUGEINT * ry * ry) AS cy
            FROM rs GROUP BY g),
      v AS (SELECT g, n,
                   CAST(a AS DOUBLE) / (CAST(n AS DOUBLE)
                       * CAST(n AS DOUBLE))
                     - 2.0 * CAST(c AS DOUBLE)
                       / ((CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                         * CAST(n AS DOUBLE))
                     + CAST(bxs AS DOUBLE) * CAST(bys AS DOUBLE)
                       / ((CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                     AS vcov,
                   CAST(ax AS DOUBLE) / (CAST(n AS DOUBLE)
                       * CAST(n AS DOUBLE))
                     - 2.0 * CAST(cx AS DOUBLE)
                       / ((CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                         * CAST(n AS DOUBLE))
                     + CAST(bxs AS DOUBLE) * CAST(bxs AS DOUBLE)
                       / ((CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                     AS vx,
                   CAST(ay AS DOUBLE) / (CAST(n AS DOUBLE)
                       * CAST(n AS DOUBLE))
                     - 2.0 * CAST(cy AS DOUBLE)
                       / ((CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                         * CAST(n AS DOUBLE))
                     + CAST(bys AS DOUBLE) * CAST(bys AS DOUBLE)
                       / ((CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                     AS vy
            FROM f)
      SELECT g AS event_type, n,
             CAST(ROUND(vcov, 12) AS DOUBLE) AS dcov2,
             CAST(CASE WHEN vx > 0.0 AND vy > 0.0 THEN
               ROUND(SQRT(GREATEST(0.0, vcov) / SQRT(vx * vy)), 6) END
               AS DOUBLE) AS dcor
      FROM v
      ORDER BY event_type""",

    // The q_friedman prep CTEs + a cross-block range rank: exact 4S
    // integers (q2·(m2−k−1)), HUGEINT A/B folds, the 16s/ns
    // cancelling in one rounded F tree.
    "q_quade" -> """
      WITH cells AS (
        SELECT event_type AS i,
               DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS b,
               CAST(ROUND((CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                 AS BIGINT) / 100.0) * 1000000.0) AS BIGINT) AS v
        FROM events GROUP BY 1, CAST(ts AS DATE)),
      k AS (SELECT COUNT(DISTINCT i)::BIGINT AS k FROM cells),
      complete AS (
        SELECT b FROM cells CROSS JOIN k
        GROUP BY b, k HAVING COUNT(DISTINCT i) = MAX(k)),
      ranked AS (
        SELECT c.b, c.i, c.v,
               2 * RANK() OVER (PARTITION BY c.b ORDER BY c.v)
                 + COUNT(*) OVER (PARTITION BY c.b, c.v) - 1 AS m2
        FROM cells c JOIN complete cb ON c.b = cb.b),
      ranges AS (SELECT b, MAX(v) - MIN(v) AS d FROM ranked GROUP BY b),
      q2 AS (SELECT b, 2 * RANK() OVER (ORDER BY d)
                       + COUNT(*) OVER (PARTITION BY d) - 1 AS q2
             FROM ranges),
      scored AS (
        SELECT r.i, q2.q2 * (r.m2 - (k.k + 1)) AS s4
        FROM ranked r JOIN q2 ON q2.b = r.b CROSS JOIN k),
      pert AS (SELECT i, SUM(s4::HUGEINT) AS t4,
                      SUM(s4::HUGEINT * s4) AS a16,
                      COUNT(*)::BIGINT AS nb
               FROM scored GROUP BY i),
      agg AS (SELECT MAX(nb)::BIGINT AS n, COUNT(*)::BIGINT AS kk,
                     SUM(a16) AS a, SUM(t4 * t4) AS bnum
              FROM pert)
      SELECT n AS n_blocks, kk AS k, (kk - 1)::BIGINT AS df1,
             ((n - 1) * (kk - 1))::BIGINT AS df2,
             CAST(CASE WHEN n >= 2 AND kk >= 2
                        AND CAST(n AS DOUBLE) * CAST(a AS DOUBLE)
                          - CAST(bnum AS DOUBLE) > 0.0 THEN
               ROUND((CAST(n AS DOUBLE) - 1.0) * CAST(bnum AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(a AS DOUBLE)
                   - CAST(bnum AS DOUBLE)), 6) END AS DOUBLE) AS f_stat
      FROM agg""",

    // The q_mann_whitney cell/prefix machinery with both-ends doubled
    // scores A2 = min(D, 2(N+1)−D) and the exact realized-score
    // finite-population moments.
    "q_ansari_bradley" -> """
      WITH cells AS (
        SELECT event_type AS g, ROUND(value, 6) AS q, COUNT(*)::BIGINT AS c
        FROM events GROUP BY 1, 2),
      tot AS (SELECT q AS tq, SUM(c)::BIGINT AS e FROM cells GROUP BY q),
      tot2 AS (
        SELECT tq, e,
               COALESCE(SUM(e) OVER (ORDER BY tq NULLS FIRST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 ::BIGINT AS cbelow
        FROM tot),
      nn0 AS (SELECT SUM(e)::BIGINT AS n FROM tot),
      sc AS (SELECT tq, e,
                    LEAST(2 * cbelow + e + 1,
                      2 * (n + 1) - (2 * cbelow + e + 1)) AS a2
             FROM tot2 CROSS JOIN nn0),
      nn AS (SELECT MAX(n0.n)::BIGINT AS n,
                    SUM(e::HUGEINT * a2)::HUGEINT AS t2,
                    SUM(e::HUGEINT * a2 * a2)::HUGEINT AS t2sq
             FROM sc CROSS JOIN nn0 n0),
      perg AS (
        SELECT g, SUM(c)::BIGINT AS ng,
               SUM(c::HUGEINT * a2)::HUGEINT AS sa2
        FROM cells JOIN sc ON cells.q IS NOT DISTINCT FROM sc.tq
        GROUP BY g)
      SELECT g AS event_type, ng AS n_group, (n - ng)::BIGINT AS n_rest,
             CAST(CAST(sa2 AS DOUBLE) / 2.0 AS DOUBLE) AS ab_stat,
             CAST(CASE WHEN n - ng > 0
                        AND CAST(ng AS DOUBLE) * CAST(n - ng AS DOUBLE)
                          / (CAST(n AS DOUBLE) - 1.0)
                          * ((CAST(t2sq AS DOUBLE) - CAST(t2 AS DOUBLE)
                              * CAST(t2 AS DOUBLE) / CAST(n AS DOUBLE))
                            / CAST(n AS DOUBLE)) > 0.0 THEN
               ROUND((CAST(sa2 AS DOUBLE)
                   - CAST(ng AS DOUBLE) * CAST(t2 AS DOUBLE)
                     / CAST(n AS DOUBLE))
                 / SQRT(CAST(ng AS DOUBLE) * CAST(n - ng AS DOUBLE)
                   / (CAST(n AS DOUBLE) - 1.0)
                   * ((CAST(t2sq AS DOUBLE) - CAST(t2 AS DOUBLE)
                       * CAST(t2 AS DOUBLE) / CAST(n AS DOUBLE))
                     / CAST(n AS DOUBLE))), 6) END AS DOUBLE) AS z
      FROM perg CROSS JOIN nn
      ORDER BY event_type""",

    // The q_holt_forecast recursive state CTE + one-step-ahead and
    // naive errors; exact decimal squared folds, one rounded ratio.
    "q_theil_u2" -> """
      WITH RECURSIVE s AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               CAST(ROUND(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))
                 / 1000000.0, 6) AS DOUBLE) AS x
        FROM events GROUP BY 1, 2),
      si AS (SELECT g, d, x,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY d) AS i
             FROM s),
      rec AS (
        SELECT g, i, x AS level, CAST(0.0 AS DOUBLE) AS trend
        FROM si WHERE i = 1
        UNION ALL
        SELECT si.g, si.i,
               ROUND(CAST(0.3 AS DOUBLE) * si.x
                 + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
                   * (r.level + r.trend), 6),
               ROUND(CAST(0.2 AS DOUBLE)
                   * (ROUND(CAST(0.3 AS DOUBLE) * si.x
                       + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
                         * (r.level + r.trend), 6) - r.level)
                 + (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE)) * r.trend, 6)
        FROM rec r JOIN si ON si.g = r.g AND si.i = r.i + 1),
      sc AS (
        SELECT si.g,
               ROUND(si.x - ROUND(r.level + r.trend, 6), 6) AS em,
               ROUND(si.x - sp.x, 6) AS en
        FROM si
        JOIN rec r ON r.g = si.g AND r.i = si.i - 1
        JOIN si sp ON sp.g = si.g AND sp.i = si.i - 1),
      agg AS (SELECT g, COUNT(*)::BIGINT AS n,
                     SUM(CAST(ROUND(em * em, 12) AS DECIMAL(38,12)))
                       AS sm,
                     SUM(CAST(ROUND(en * en, 12) AS DECIMAL(38,12)))
                       AS sn
              FROM sc GROUP BY g)
      SELECT g AS event_type, n AS n_days,
             CAST(CASE WHEN CAST(sn AS DOUBLE) > 0.0 THEN
               ROUND(SQRT(CAST(sm AS DOUBLE) / CAST(sn AS DOUBLE)), 6)
               END AS DOUBLE) AS u2
      FROM agg
      ORDER BY event_type""",

    // The grubbs moment trees into the frozen sd/share/allocation
    // chain.
    "q_neyman" -> """
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS xq
        FROM events WHERE value IS NOT NULL),
      mom AS (SELECT g, COUNT(*)::BIGINT AS n, SUM(xq::HUGEINT) AS s1,
                     SUM(xq::HUGEINT * xq) AS q1
              FROM pts GROUP BY g),
      sd AS (SELECT g, n,
                    CASE WHEN n >= 2 AND vr > 0.0 THEN
                      ROUND(SQRT(vr) / 1000000.0, 6) ELSE 0.0 END AS sd
             FROM (SELECT g, n,
                     (CAST(n AS DOUBLE) * CAST(q1 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                       / (CAST(n AS DOUBLE)
                         * (CAST(n AS DOUBLE) - 1.0)) AS vr
                   FROM mom)),
      ns AS (SELECT g, n, sd, ROUND(CAST(n AS DOUBLE) * sd, 6) AS nsv
             FROM sd),
      tot AS (SELECT SUM(CAST(nsv AS DECIMAL(38,6))) AS tns FROM ns),
      sh AS (SELECT g, n, sd,
                    CASE WHEN CAST(tns AS DOUBLE) > 0.0 THEN
                      ROUND(nsv / CAST(tns AS DOUBLE), 12)
                    ELSE 0.0 END AS share
             FROM ns CROSS JOIN tot)
      SELECT g AS event_type, n AS n_rows, CAST(sd AS DOUBLE) AS sd,
             CAST(ROUND(share, 6) AS DOUBLE) AS share,
             CAST(ROUND(share * 1000, 0) AS BIGINT) AS alloc
      FROM sh
      ORDER BY event_type""",

    // The q_ipf_rake unrolled half-steps + the Kish fold over the
    // cell table; frozen deff inside n_eff.
    "q_design_effect" -> """
      WITH cells AS (
        SELECT lang AS a, source AS b, COUNT(*)::BIGINT AS c
        FROM documents GROUP BY 1, 2),
      tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS nt FROM cells),
      la AS (SELECT CAST(COUNT(*) AS DOUBLE) AS la
             FROM (SELECT DISTINCT a FROM cells)),
      lb AS (SELECT CAST(COUNT(*) AS DOUBLE) AS lb
             FROM (SELECT DISTINCT b FROM cells)),
      w0 AS (SELECT a, b, c, nt, la, lb, 1.0 AS w
             FROM cells CROSS JOIN tot CROSS JOIN la CROSS JOIN lb),
      r1 AS (SELECT a, b, c, nt, la, lb,
               ROUND(w * (nt / la)
                 / SUM(c * w) OVER (PARTITION BY a), 12) AS w
             FROM w0),
      c1 AS (SELECT a, b, c, nt, la, lb,
               ROUND(w * (nt / lb)
                 / SUM(c * w) OVER (PARTITION BY b), 12) AS w
             FROM r1),
      r2 AS (SELECT a, b, c, nt, la, lb,
               ROUND(w * (nt / la)
                 / SUM(c * w) OVER (PARTITION BY a), 12) AS w
             FROM c1),
      c2 AS (SELECT a, b, c, CAST(w AS DOUBLE) AS w
             FROM (SELECT a, b, c,
                     ROUND(w * (nt / lb)
                       / SUM(c * w) OVER (PARTITION BY b), 12) AS w
                   FROM r2)),
      f AS (SELECT SUM(c)::BIGINT AS n,
                   SUM(CAST(ROUND(c * w, 12) AS DECIMAL(38,12))) AS sw,
                   SUM(CAST(ROUND(c * ROUND(w * w, 12), 12)
                     AS DECIMAL(38,12))) AS sw2
            FROM c2),
      dd AS (SELECT n,
                    CASE WHEN CAST(sw AS DOUBLE) > 0.0 THEN
                      ROUND(CAST(n AS DOUBLE) * CAST(sw2 AS DOUBLE)
                        / (CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)), 6)
                    END AS deff
             FROM f)
      SELECT n, CAST(deff AS DOUBLE) AS deff,
             CAST(ROUND(CAST(n AS DOUBLE) / deff, 6) AS DOUBLE) AS n_eff
      FROM dd""",

    // The q_ansari_bradley machinery with the center-out quadratic
    // score M4 = (D − (N+1))².
    "q_mood_dispersion" -> """
      WITH cells AS (
        SELECT event_type AS g, ROUND(value, 6) AS q, COUNT(*)::BIGINT AS c
        FROM events GROUP BY 1, 2),
      tot AS (SELECT q AS tq, SUM(c)::BIGINT AS e FROM cells GROUP BY q),
      tot2 AS (
        SELECT tq, e,
               COALESCE(SUM(e) OVER (ORDER BY tq NULLS FIRST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 ::BIGINT AS cbelow
        FROM tot),
      nn0 AS (SELECT SUM(e)::BIGINT AS n FROM tot),
      sc AS (SELECT tq, e,
                    ((2 * cbelow + e + 1) - (n + 1))::HUGEINT
                      * ((2 * cbelow + e + 1) - (n + 1)) AS m4
             FROM tot2 CROSS JOIN nn0),
      nn AS (SELECT MAX(n0.n)::BIGINT AS n,
                    SUM(e::HUGEINT * m4)::HUGEINT AS t2,
                    SUM(e::HUGEINT * m4 * m4)::HUGEINT AS t2sq
             FROM sc CROSS JOIN nn0 n0),
      perg AS (
        SELECT g, SUM(c)::BIGINT AS ng,
               SUM(c::HUGEINT * m4)::HUGEINT AS sm4
        FROM cells JOIN sc ON cells.q IS NOT DISTINCT FROM sc.tq
        GROUP BY g)
      SELECT g AS event_type, ng AS n_group, (n - ng)::BIGINT AS n_rest,
             CAST(CAST(sm4 AS DOUBLE) / 4.0 AS DOUBLE) AS mood_stat,
             CAST(CASE WHEN n - ng > 0
                        AND CAST(ng AS DOUBLE) * CAST(n - ng AS DOUBLE)
                          / (CAST(n AS DOUBLE) - 1.0)
                          * ((CAST(t2sq AS DOUBLE) - CAST(t2 AS DOUBLE)
                              * CAST(t2 AS DOUBLE) / CAST(n AS DOUBLE))
                            / CAST(n AS DOUBLE)) > 0.0 THEN
               ROUND((CAST(sm4 AS DOUBLE)
                   - CAST(ng AS DOUBLE) * CAST(t2 AS DOUBLE)
                     / CAST(n AS DOUBLE))
                 / SQRT(CAST(ng AS DOUBLE) * CAST(n - ng AS DOUBLE)
                   / (CAST(n AS DOUBLE) - 1.0)
                   * ((CAST(t2sq AS DOUBLE) - CAST(t2 AS DOUBLE)
                       * CAST(t2 AS DOUBLE) / CAST(n AS DOUBLE))
                     / CAST(n AS DOUBLE))), 6) END AS DOUBLE) AS z
      FROM perg CROSS JOIN nn
      ORDER BY event_type""",

    // Both component chains (the q_mann_whitney U/z and the
    // q_ansari_bradley score z) joined; L over the frozen 6-dp z's.
    "q_lepage" -> """
      WITH cells AS (
        SELECT event_type AS g, ROUND(value, 6) AS q, COUNT(*)::BIGINT AS c
        FROM events GROUP BY 1, 2),
      tot AS (SELECT q AS tq, SUM(c)::BIGINT AS e FROM cells GROUP BY q),
      tot2 AS (
        SELECT tq, e,
               COALESCE(SUM(e) OVER (ORDER BY tq NULLS FIRST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 ::BIGINT AS cbelow
        FROM tot),
      nn AS (SELECT SUM(e)::BIGINT AS n,
                    SUM(e::HUGEINT * e * e - e)::HUGEINT AS ties
             FROM tot),
      pergw AS (
        SELECT g, SUM(c)::BIGINT AS n_group,
               SUM(c::HUGEINT * (2 * cbelow + e + 1))::HUGEINT AS r1d
        FROM cells JOIN tot2 ON cells.q IS NOT DISTINCT FROM tot2.tq
        GROUP BY g),
      zw AS (
        SELECT g, n_group, n_rest,
               CAST(CASE WHEN n_rest > 0 AND var > 0 THEN
                 ROUND((u - CAST(n_group AS DOUBLE) * n_rest / 2.0)
                   / SQRT(var), 6) END AS DOUBLE) AS zloc
        FROM (
          SELECT g, n_group, (n - n_group)::BIGINT AS n_rest,
                 CAST(2::HUGEINT * n_group * (n - n_group)
                   + n_group::HUGEINT * (n_group + 1) - r1d AS DOUBLE)
                   / 2.0 AS u,
                 CAST(n_group AS DOUBLE) * (n - n_group)
                   * ((CAST(n AS DOUBLE) + 1.0)
                      - CAST(ties AS DOUBLE)
                        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                   / 12.0 AS var,
                 n
          FROM pergw CROSS JOIN nn)),
      sc AS (SELECT tq, e,
                    LEAST(2 * cbelow + e + 1,
                      2 * (n + 1) - (2 * cbelow + e + 1)) AS a2
             FROM tot2 CROSS JOIN nn),
      nnab AS (SELECT MAX(n0.n)::BIGINT AS n,
                      SUM(e::HUGEINT * a2)::HUGEINT AS t2,
                      SUM(e::HUGEINT * a2 * a2)::HUGEINT AS t2sq
               FROM sc CROSS JOIN nn n0),
      pergab AS (
        SELECT g, SUM(c)::BIGINT AS ng,
               SUM(c::HUGEINT * a2)::HUGEINT AS sa2
        FROM cells JOIN sc ON cells.q IS NOT DISTINCT FROM sc.tq
        GROUP BY g),
      zab AS (
        SELECT g,
               CAST(CASE WHEN n - ng > 0
                          AND CAST(ng AS DOUBLE) * CAST(n - ng AS DOUBLE)
                            / (CAST(n AS DOUBLE) - 1.0)
                            * ((CAST(t2sq AS DOUBLE) - CAST(t2 AS DOUBLE)
                                * CAST(t2 AS DOUBLE) / CAST(n AS DOUBLE))
                              / CAST(n AS DOUBLE)) > 0.0 THEN
                 ROUND((CAST(sa2 AS DOUBLE)
                     - CAST(ng AS DOUBLE) * CAST(t2 AS DOUBLE)
                       / CAST(n AS DOUBLE))
                   / SQRT(CAST(ng AS DOUBLE) * CAST(n - ng AS DOUBLE)
                     / (CAST(n AS DOUBLE) - 1.0)
                     * ((CAST(t2sq AS DOUBLE) - CAST(t2 AS DOUBLE)
                         * CAST(t2 AS DOUBLE) / CAST(n AS DOUBLE))
                       / CAST(n AS DOUBLE))), 6) END AS DOUBLE) AS zdisp
        FROM pergab CROSS JOIN nnab)
      SELECT zw.g AS event_type, zw.n_group, zw.n_rest,
             zw.zloc AS z_location, zab.zdisp AS z_dispersion,
             CAST(CASE WHEN zloc IS NOT NULL AND zdisp IS NOT NULL THEN
               ROUND(zloc * zloc + zdisp * zdisp, 6) END AS DOUBLE)
               AS lepage
      FROM zw JOIN zab ON zab.g = zw.g
      ORDER BY event_type""",

    // The holt-family recursive CTE replaying the 6-dp (f, E, MAD)
    // state machine; the engine computes 1−α/1−β as the identical
    // IEEE differences.
    "q_trigg" -> """
      WITH RECURSIVE cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      si AS (SELECT g, day,
                    ROUND(CAST(x AS DOUBLE) / 1000000.0, 6) AS v,
                    ROW_NUMBER() OVER (PARTITION BY g ORDER BY day) AS i
             FROM cells),
      rec AS (
        SELECT g, i, day, v, v AS f,
               CAST(0.0 AS DOUBLE) AS em, CAST(0.0 AS DOUBLE) AS mad,
               CAST(NULL AS DOUBLE) AS fc, CAST(NULL AS DOUBLE) AS e,
               CAST(NULL AS DOUBLE) AS trk
        FROM si WHERE i = 1
        UNION ALL
        SELECT si.g, si.i, si.day, si.v,
               ROUND(CAST(0.3 AS DOUBLE) * si.v
                 + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE)) * r.f, 6),
               ROUND(CAST(0.2 AS DOUBLE) * ROUND(si.v - r.f, 6)
                 + (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE)) * r.em,
                 6),
               ROUND(CAST(0.2 AS DOUBLE) * ABS(ROUND(si.v - r.f, 6))
                 + (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE)) * r.mad,
                 6),
               r.f,
               ROUND(si.v - r.f, 6),
               CASE WHEN ROUND(CAST(0.2 AS DOUBLE)
                   * ABS(ROUND(si.v - r.f, 6))
                 + (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE)) * r.mad,
                 6) > 0.0 THEN
                 ROUND(ROUND(CAST(0.2 AS DOUBLE) * ROUND(si.v - r.f, 6)
                     + (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE))
                       * r.em, 6)
                   / ROUND(CAST(0.2 AS DOUBLE)
                       * ABS(ROUND(si.v - r.f, 6))
                     + (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE))
                       * r.mad, 6), 6) END
        FROM rec r JOIN si ON si.g = r.g AND si.i = r.i + 1)
      SELECT g AS event_type, day, CAST(v AS DOUBLE) AS x,
             CAST(fc AS DOUBLE) AS forecast, CAST(e AS DOUBLE) AS err,
             CAST(trk AS DOUBLE) AS tracking,
             (trk IS NOT NULL AND ABS(trk) > 0.51) AS alert
      FROM rec
      ORDER BY event_type, day""",

    // Day cells, one window cumsum, the closed-form GM(1,1) LS with
    // 12-dp frozen params inside the EXP forecast tree.
    "q_grey" -> """
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      pts AS (
        SELECT g, day,
               ROW_NUMBER() OVER w AS rn,
               ROUND(CAST(x AS DOUBLE) / 1000000.0, 6) AS v,
               CASE WHEN LAG(x1c, 1) OVER w IS NOT NULL THEN
                 ROUND(CAST(x1c + LAG(x1c, 1) OVER w AS DOUBLE)
                   / 2000000.0, 6) END AS z
        FROM (SELECT g, day, x,
                     SUM(x) OVER (PARTITION BY g ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS x1c
              FROM cells)
        WINDOW w AS (PARTITION BY g ORDER BY day)),
      first AS (SELECT g AS gf, v AS v1 FROM pts WHERE rn = 1),
      f AS (SELECT g, COUNT(*)::BIGINT AS m, MAX(rn)::BIGINT AS n,
                   SUM(CAST(z AS DECIMAL(38,12))) AS sz,
                   SUM(CAST(v AS DECIMAL(38,12))) AS sv,
                   SUM(CAST(ROUND(z * z, 12) AS DECIMAL(38,12))) AS szz,
                   SUM(CAST(ROUND(z * v, 12) AS DECIMAL(38,12))) AS szv
            FROM pts WHERE z IS NOT NULL GROUP BY g),
      p AS (SELECT g, n, v1,
                   CASE WHEN m >= 3
                         AND CAST(m AS DOUBLE) * CAST(szz AS DOUBLE)
                           - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
                           <> 0.0 THEN
                     ROUND((CAST(sz AS DOUBLE) * CAST(sv AS DOUBLE)
                         - CAST(m AS DOUBLE) * CAST(szv AS DOUBLE))
                       / (CAST(m AS DOUBLE) * CAST(szz AS DOUBLE)
                         - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)),
                       12) END AS a,
                   ROUND((CAST(szz AS DOUBLE) * CAST(sv AS DOUBLE)
                       - CAST(sz AS DOUBLE) * CAST(szv AS DOUBLE))
                     / (CAST(m AS DOUBLE) * CAST(szz AS DOUBLE)
                       - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)), 12)
                     AS b
            FROM f JOIN first ON gf = f.g)
      SELECT g AS event_type, CAST(h.h AS BIGINT) AS h,
             CAST(ROUND(a, 6) AS DOUBLE) AS a,
             CAST(ROUND(b, 6) AS DOUBLE) AS b,
             CAST(CASE WHEN a <> 0.0 THEN
               ROUND((v1 - b / a) * (1.0 - EXP(a))
                 * EXP(-a * (CAST(n AS DOUBLE) + CAST(h.h AS DOUBLE)
                   - 1.0)), 6) END AS DOUBLE) AS forecast
      FROM p CROSS JOIN (VALUES (1), (2), (3)) h(h)
      WHERE a IS NOT NULL
      ORDER BY event_type, h""",

    // Descaled per-day errors, 6-dp loss differential requantized to
    // exact longs, the KPSS a-unit cancellation: DM = n·S/√(A₀+2ΣwA),
    // Bartlett weights interpolated as the identical Scala doubles.
    "q_diebold_mariano" -> s"""
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      wd AS (SELECT g, day, x,
                    LAG(x, 1) OVER w AS p1, LAG(x, 2) OVER w AS p2,
                    LAG(x, 3) OVER w AS p3
             FROM cells WINDOW w AS (PARTITION BY g ORDER BY day)),
      dd AS (
        SELECT g, day,
               CAST(ROUND(ROUND(
                   (CAST(x - p1 AS DOUBLE) / 1000000.0)
                     * (CAST(x - p1 AS DOUBLE) / 1000000.0)
                   - (CAST(3 * x - p1 - p2 - p3 AS DOUBLE) / 3000000.0)
                     * (CAST(3 * x - p1 - p2 - p3 AS DOUBLE) / 3000000.0),
                 6) * 1000000.0) AS BIGINT) AS d6
        FROM wd WHERE p3 IS NOT NULL),
      st AS (SELECT g AS gm, COUNT(*)::HUGEINT AS n,
                    SUM(d6)::HUGEINT AS s
             FROM dd GROUP BY g),
      cen AS (SELECT dd.g, dd.day, st.s,
                     (st.n * d6::HUGEINT - st.s) AS a
              FROM dd JOIN st ON st.gm = dd.g),
      le AS (SELECT g, s, a,
                    LEAD(a, 1) OVER w AS l1, LEAD(a, 2) OVER w AS l2
             FROM cen WINDOW w AS (PARTITION BY g ORDER BY day)),
      f AS (SELECT g, COUNT(*)::BIGINT AS nd, MAX(s) AS sm,
                   SUM(a * a) AS a0, SUM(a * l1) AS a1,
                   SUM(a * l2) AS a2v
            FROM le GROUP BY g)
      SELECT g AS event_type, nd AS n_days,
             CAST(ROUND(CAST(sm AS DOUBLE)
               / (CAST(nd AS DOUBLE) * 1000000.0), 6) AS DOUBLE)
               AS mean_d,
             CAST(CASE WHEN nd >= 4 AND CAST(a0 AS DOUBLE)
                 + ${2.0 * (1.0 - 1.0 / 3)} * CAST(a1 AS DOUBLE)
                 + ${2.0 * (1.0 - 2.0 / 3)} * CAST(a2v AS DOUBLE) > 0.0
               THEN ROUND(CAST(nd AS DOUBLE) * CAST(sm AS DOUBLE)
                 / SQRT(CAST(a0 AS DOUBLE)
                   + ${2.0 * (1.0 - 1.0 / 3)} * CAST(a1 AS DOUBLE)
                   + ${2.0 * (1.0 - 2.0 / 3)} * CAST(a2v AS DOUBLE)),
                 6) END AS DOUBLE) AS dm
      FROM f
      ORDER BY event_type""",

    // Exact 3-bit ordinal-pattern codes on the day cells, the
    // entropy-precedent p·ln p terms frozen at 12 dp, ln 6
    // interpolated.
    "q_perm_entropy" -> s"""
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      wins AS (SELECT g, x,
                      LEAD(x, 1) OVER w AS b, LEAD(x, 2) OVER w AS c
               FROM cells WINDOW w AS (PARTITION BY g ORDER BY day)),
      codes AS (
        SELECT g,
               (CASE WHEN x <= b THEN 4 ELSE 0 END
                + CASE WHEN x <= c THEN 2 ELSE 0 END
                + CASE WHEN b <= c THEN 1 ELSE 0 END) AS code
        FROM wins WHERE c IS NOT NULL),
      cnt AS (SELECT g, code, COUNT(*)::BIGINT AS cnt
              FROM codes GROUP BY 1, 2),
      pp AS (SELECT g, cnt, SUM(cnt) OVER (PARTITION BY g) AS n
             FROM cnt),
      f AS (SELECT g, MAX(n)::BIGINT AS nw, COUNT(*)::BIGINT AS np,
                   SUM(CAST(ROUND((CAST(cnt AS DOUBLE)
                       / CAST(n AS DOUBLE))
                     * LN(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)), 12)
                     AS DECIMAL(38,12))) AS spl
            FROM pp GROUP BY g)
      SELECT g AS event_type, nw AS n_windows, np AS n_patterns,
             CAST(ROUND(-CAST(spl AS DOUBLE) / ${math.log(6.0)}, 6)
               AS DOUBLE) AS h_norm
      FROM f
      ORDER BY event_type""",

    // The q_mann_whitney doubled-rank machinery feeding the pairwise
    // Dunn z panel with the tie-corrected pooled variance.
    "q_dunn" -> """
      WITH cells AS (
        SELECT event_type AS g, ROUND(value, 6) AS q, COUNT(*)::BIGINT AS c
        FROM events GROUP BY 1, 2),
      tot AS (SELECT q AS tq, SUM(c)::BIGINT AS e FROM cells GROUP BY q),
      tot2 AS (
        SELECT tq, e,
               COALESCE(SUM(e) OVER (ORDER BY tq NULLS FIRST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 ::BIGINT AS cbelow
        FROM tot),
      nn AS (SELECT SUM(e)::BIGINT AS n,
                    SUM(e::HUGEINT * e * e - e)::HUGEINT AS ties
             FROM tot),
      perg AS (
        SELECT g, SUM(c)::BIGINT AS ng,
               SUM(c::HUGEINT * (2 * cbelow + e + 1))::HUGEINT AS r2
        FROM cells JOIN tot2 ON cells.q IS NOT DISTINCT FROM tot2.tq
        GROUP BY g),
      pair AS (
        SELECT a.g AS group_a, b.g AS group_b,
               a.ng AS n_a, b.ng AS n_b, a.r2 AS r2a, b.r2 AS r2b,
               CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 12.0
                 - CAST(ties AS DOUBLE)
                   / (12.0 * (CAST(n AS DOUBLE) - 1.0)) AS sig2
        FROM perg a JOIN perg b ON a.g < b.g CROSS JOIN nn)
      SELECT group_a, group_b, n_a, n_b,
             CAST(ROUND(CAST(r2a AS DOUBLE)
               / (2.0 * CAST(n_a AS DOUBLE)), 6) AS DOUBLE)
               AS mean_rank_a,
             CAST(ROUND(CAST(r2b AS DOUBLE)
               / (2.0 * CAST(n_b AS DOUBLE)), 6) AS DOUBLE)
               AS mean_rank_b,
             CAST(CASE WHEN sig2 > 0.0 THEN
               ROUND((CAST(r2a AS DOUBLE) / CAST(n_a AS DOUBLE)
                   - CAST(r2b AS DOUBLE) / CAST(n_b AS DOUBLE)) / 2.0
                 / SQRT(sig2 * (1.0 / CAST(n_a AS DOUBLE)
                   + 1.0 / CAST(n_b AS DOUBLE))), 6)
             END AS DOUBLE) AS z
      FROM pair ORDER BY group_a, group_b""",

    // The q_logistic iteration scheme with μ = EXP(a + b·x) weights
    // and the Laplace-smoothed log-mean init — three unrolled Newton
    // CTEs + the final observed-information pass.
    "q_poisson" -> """
      WITH cells AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS DOUBLE) AS y
        FROM events GROUP BY 1, 2),
      pts AS (
        SELECT g,
               ROUND(DATEDIFF('day', DATE '2024-01-01', d) / 10.0, 6) AS x,
               y
        FROM cells WHERE d IS NOT NULL),
      p0 AS (
        SELECT g, ROUND(LN((SUM(y) + 1.0)
                 / CAST(COUNT(*) + 1 AS DOUBLE)), 12) AS a,
               0.0 AS b
        FROM pts GROUP BY g),
      pr1 AS (
        SELECT pts.g, x, y, a, b, EXP(a + b * x) AS m
        FROM pts JOIN p0 USING (g)),
      t1 AS (
        SELECT g, MAX(a) AS a, MAX(b) AS b,
               SUM(CAST(ROUND(y - m, 12) AS DECIMAL(38,12))) AS g0,
               SUM(CAST(ROUND(x * (y - m), 12) AS DECIMAL(38,12))) AS g1,
               SUM(CAST(ROUND(m, 12) AS DECIMAL(38,12))) AS h00,
               SUM(CAST(ROUND(x * m, 12) AS DECIMAL(38,12))) AS h01,
               SUM(CAST(ROUND(x * x * m, 12) AS DECIMAL(38,12))) AS h11
        FROM pr1 GROUP BY g),
      d1 AS (
        SELECT *, CAST(h00 AS DOUBLE) * CAST(h11 AS DOUBLE)
                  - CAST(h01 AS DOUBLE) * CAST(h01 AS DOUBLE) AS det
        FROM t1),
      p1 AS (
        SELECT g,
          CASE WHEN det > 0.0 THEN ROUND(a
            + (CAST(g0 AS DOUBLE) * CAST(h11 AS DOUBLE)
               - CAST(g1 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE a END AS a,
          CASE WHEN det > 0.0 THEN ROUND(b
            + (CAST(g1 AS DOUBLE) * CAST(h00 AS DOUBLE)
               - CAST(g0 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE b END AS b
        FROM d1),
      pr2 AS (
        SELECT pts.g, x, y, a, b, EXP(a + b * x) AS m
        FROM pts JOIN p1 USING (g)),
      t2 AS (
        SELECT g, MAX(a) AS a, MAX(b) AS b,
               SUM(CAST(ROUND(y - m, 12) AS DECIMAL(38,12))) AS g0,
               SUM(CAST(ROUND(x * (y - m), 12) AS DECIMAL(38,12))) AS g1,
               SUM(CAST(ROUND(m, 12) AS DECIMAL(38,12))) AS h00,
               SUM(CAST(ROUND(x * m, 12) AS DECIMAL(38,12))) AS h01,
               SUM(CAST(ROUND(x * x * m, 12) AS DECIMAL(38,12))) AS h11
        FROM pr2 GROUP BY g),
      d2 AS (
        SELECT *, CAST(h00 AS DOUBLE) * CAST(h11 AS DOUBLE)
                  - CAST(h01 AS DOUBLE) * CAST(h01 AS DOUBLE) AS det
        FROM t2),
      p2 AS (
        SELECT g,
          CASE WHEN det > 0.0 THEN ROUND(a
            + (CAST(g0 AS DOUBLE) * CAST(h11 AS DOUBLE)
               - CAST(g1 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE a END AS a,
          CASE WHEN det > 0.0 THEN ROUND(b
            + (CAST(g1 AS DOUBLE) * CAST(h00 AS DOUBLE)
               - CAST(g0 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE b END AS b
        FROM d2),
      pr3 AS (
        SELECT pts.g, x, y, a, b, EXP(a + b * x) AS m
        FROM pts JOIN p2 USING (g)),
      t3 AS (
        SELECT g, MAX(a) AS a, MAX(b) AS b,
               SUM(CAST(ROUND(y - m, 12) AS DECIMAL(38,12))) AS g0,
               SUM(CAST(ROUND(x * (y - m), 12) AS DECIMAL(38,12))) AS g1,
               SUM(CAST(ROUND(m, 12) AS DECIMAL(38,12))) AS h00,
               SUM(CAST(ROUND(x * m, 12) AS DECIMAL(38,12))) AS h01,
               SUM(CAST(ROUND(x * x * m, 12) AS DECIMAL(38,12))) AS h11
        FROM pr3 GROUP BY g),
      d3 AS (
        SELECT *, CAST(h00 AS DOUBLE) * CAST(h11 AS DOUBLE)
                  - CAST(h01 AS DOUBLE) * CAST(h01 AS DOUBLE) AS det
        FROM t3),
      p3 AS (
        SELECT g,
          CASE WHEN det > 0.0 THEN ROUND(a
            + (CAST(g0 AS DOUBLE) * CAST(h11 AS DOUBLE)
               - CAST(g1 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE a END AS a,
          CASE WHEN det > 0.0 THEN ROUND(b
            + (CAST(g1 AS DOUBLE) * CAST(h00 AS DOUBLE)
               - CAST(g0 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE b END AS b
        FROM d3),
      pr4 AS (
        SELECT pts.g, x, y, a, b, EXP(a + b * x) AS m
        FROM pts JOIN p3 USING (g)),
      t4 AS (
        SELECT g, MAX(a) AS a, MAX(b) AS b,
               COUNT(*)::BIGINT AS n, SUM(y) AS sum_y,
               SUM(CAST(ROUND(m, 12) AS DECIMAL(38,12))) AS h00,
               SUM(CAST(ROUND(x * m, 12) AS DECIMAL(38,12))) AS h01,
               SUM(CAST(ROUND(x * x * m, 12) AS DECIMAL(38,12))) AS h11,
               SUM(CAST(ROUND((y - m) * (y - m) / m, 12)
                 AS DECIMAL(38,12))) AS chi
        FROM pr4 GROUP BY g),
      d4 AS (
        SELECT *, CAST(h00 AS DOUBLE) * CAST(h11 AS DOUBLE)
                  - CAST(h01 AS DOUBLE) * CAST(h01 AS DOUBLE) AS det
        FROM t4)
      SELECT g AS event_type, n,
             CAST(ROUND(sum_y, 6) AS DOUBLE) AS sum_y,
             CAST(ROUND(a, 6) AS DOUBLE) AS alpha,
             CAST(ROUND(b, 6) AS DOUBLE) AS beta,
             CAST(CASE WHEN det > 0.0 THEN
               ROUND(SQRT(CAST(h00 AS DOUBLE) / det), 6) END
               AS DOUBLE) AS se_beta,
             CAST(CASE WHEN det > 0.0 THEN
               ROUND(b / SQRT(CAST(h00 AS DOUBLE) / det), 6) END
               AS DOUBLE) AS z_beta,
             CAST(ROUND(EXP(b), 6) AS DOUBLE) AS rate_ratio,
             CAST(CASE WHEN n > 2 THEN
               ROUND(CAST(chi AS DOUBLE) / (CAST(n AS DOUBLE) - 2.0), 6)
             END AS DOUBLE) AS dispersion,
             CAST(CASE WHEN det > 0.0 AND n > 2 THEN
               ROUND(SQRT(CAST(h00 AS DOUBLE) / det)
                 * SQRT(CAST(chi AS DOUBLE) / (CAST(n AS DOUBLE) - 2.0)),
                 6)
             END AS DOUBLE) AS se_beta_quasi
      FROM d4 ORDER BY event_type""",

    // q_logistic's scheme at 3 parameters: per iteration a 3x3
    // first-row-cofactor Cramer solve on the frozen-weight Hessian.
    "q_logistic2" -> """
      WITH pts AS (
        SELECT CAST(user_id % 3 AS INTEGER) AS g,
               ROUND(value / 100.0, 6) AS x1,
               ROUND(HOUR(ts) / 10.0, 6) AS x2,
               CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
        FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
      p0 AS (SELECT DISTINCT g, 0.0 AS a, 0.0 AS b1, 0.0 AS b2 FROM pts),
      pr1 AS (
        SELECT pts.g, x1, x2, y, a, b1, b2,
               1.0 / (1.0 + EXP(-(a + b1 * x1 + b2 * x2))) AS p
        FROM pts JOIN p0 USING (g)),
      t1 AS (
        SELECT g, MAX(a) AS a, MAX(b1) AS b1, MAX(b2) AS b2,
               COUNT(*)::BIGINT AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               SUM(CAST(ROUND(y - p, 12) AS DECIMAL(38,12))) AS g0,
               SUM(CAST(ROUND(x1 * (y - p), 12) AS DECIMAL(38,12))) AS g1,
               SUM(CAST(ROUND(x2 * (y - p), 12) AS DECIMAL(38,12))) AS g2,
               SUM(CAST(ROUND(p * (1.0 - p), 12) AS DECIMAL(38,12)))
                 AS h00,
               SUM(CAST(ROUND(x1 * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h01,
               SUM(CAST(ROUND(x2 * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h02,
               SUM(CAST(ROUND(x1 * x1 * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h11,
               SUM(CAST(ROUND(x1 * x2 * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h12,
               SUM(CAST(ROUND(x2 * x2 * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h22
        FROM pr1 GROUP BY g),
      d1 AS (
        SELECT *,
          CAST(h00 AS DOUBLE) * (CAST(h11 AS DOUBLE) * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(h12 AS DOUBLE))
            - CAST(h01 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(h02 AS DOUBLE))
            + CAST(h02 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(h12 AS DOUBLE)
              - CAST(h11 AS DOUBLE) * CAST(h02 AS DOUBLE)) AS det,
          CAST(g0 AS DOUBLE) * (CAST(h11 AS DOUBLE) * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(h12 AS DOUBLE))
            - CAST(h01 AS DOUBLE) * (CAST(g1 AS DOUBLE)
              * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(g2 AS DOUBLE))
            + CAST(h02 AS DOUBLE) * (CAST(g1 AS DOUBLE)
              * CAST(h12 AS DOUBLE)
              - CAST(h11 AS DOUBLE) * CAST(g2 AS DOUBLE)) AS det0,
          CAST(h00 AS DOUBLE) * (CAST(g1 AS DOUBLE) * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(g2 AS DOUBLE))
            - CAST(g0 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(h02 AS DOUBLE))
            + CAST(h02 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(g2 AS DOUBLE)
              - CAST(g1 AS DOUBLE) * CAST(h02 AS DOUBLE)) AS det1,
          CAST(h00 AS DOUBLE) * (CAST(h11 AS DOUBLE) * CAST(g2 AS DOUBLE)
              - CAST(g1 AS DOUBLE) * CAST(h12 AS DOUBLE))
            - CAST(h01 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(g2 AS DOUBLE)
              - CAST(g1 AS DOUBLE) * CAST(h02 AS DOUBLE))
            + CAST(g0 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(h12 AS DOUBLE)
              - CAST(h11 AS DOUBLE) * CAST(h02 AS DOUBLE)) AS det2
        FROM t1),
      p1 AS (
        SELECT g,
          CASE WHEN det > 0.0 THEN ROUND(a + det0 / det, 12)
          ELSE a END AS a,
          CASE WHEN det > 0.0 THEN ROUND(b1 + det1 / det, 12)
          ELSE b1 END AS b1,
          CASE WHEN det > 0.0 THEN ROUND(b2 + det2 / det, 12)
          ELSE b2 END AS b2
        FROM d1),
      pr2 AS (
        SELECT pts.g, x1, x2, y, a, b1, b2,
               1.0 / (1.0 + EXP(-(a + b1 * x1 + b2 * x2))) AS p
        FROM pts JOIN p1 USING (g)),
      t2 AS (
        SELECT g, MAX(a) AS a, MAX(b1) AS b1, MAX(b2) AS b2,
               COUNT(*)::BIGINT AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               SUM(CAST(ROUND(y - p, 12) AS DECIMAL(38,12))) AS g0,
               SUM(CAST(ROUND(x1 * (y - p), 12) AS DECIMAL(38,12))) AS g1,
               SUM(CAST(ROUND(x2 * (y - p), 12) AS DECIMAL(38,12))) AS g2,
               SUM(CAST(ROUND(p * (1.0 - p), 12) AS DECIMAL(38,12)))
                 AS h00,
               SUM(CAST(ROUND(x1 * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h01,
               SUM(CAST(ROUND(x2 * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h02,
               SUM(CAST(ROUND(x1 * x1 * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h11,
               SUM(CAST(ROUND(x1 * x2 * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h12,
               SUM(CAST(ROUND(x2 * x2 * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h22
        FROM pr2 GROUP BY g),
      d2 AS (
        SELECT *,
          CAST(h00 AS DOUBLE) * (CAST(h11 AS DOUBLE) * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(h12 AS DOUBLE))
            - CAST(h01 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(h02 AS DOUBLE))
            + CAST(h02 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(h12 AS DOUBLE)
              - CAST(h11 AS DOUBLE) * CAST(h02 AS DOUBLE)) AS det,
          CAST(g0 AS DOUBLE) * (CAST(h11 AS DOUBLE) * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(h12 AS DOUBLE))
            - CAST(h01 AS DOUBLE) * (CAST(g1 AS DOUBLE)
              * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(g2 AS DOUBLE))
            + CAST(h02 AS DOUBLE) * (CAST(g1 AS DOUBLE)
              * CAST(h12 AS DOUBLE)
              - CAST(h11 AS DOUBLE) * CAST(g2 AS DOUBLE)) AS det0,
          CAST(h00 AS DOUBLE) * (CAST(g1 AS DOUBLE) * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(g2 AS DOUBLE))
            - CAST(g0 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(h02 AS DOUBLE))
            + CAST(h02 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(g2 AS DOUBLE)
              - CAST(g1 AS DOUBLE) * CAST(h02 AS DOUBLE)) AS det1,
          CAST(h00 AS DOUBLE) * (CAST(h11 AS DOUBLE) * CAST(g2 AS DOUBLE)
              - CAST(g1 AS DOUBLE) * CAST(h12 AS DOUBLE))
            - CAST(h01 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(g2 AS DOUBLE)
              - CAST(g1 AS DOUBLE) * CAST(h02 AS DOUBLE))
            + CAST(g0 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(h12 AS DOUBLE)
              - CAST(h11 AS DOUBLE) * CAST(h02 AS DOUBLE)) AS det2
        FROM t2),
      p2 AS (
        SELECT g,
          CASE WHEN det > 0.0 THEN ROUND(a + det0 / det, 12)
          ELSE a END AS a,
          CASE WHEN det > 0.0 THEN ROUND(b1 + det1 / det, 12)
          ELSE b1 END AS b1,
          CASE WHEN det > 0.0 THEN ROUND(b2 + det2 / det, 12)
          ELSE b2 END AS b2
        FROM d2),
      pr3 AS (
        SELECT pts.g, x1, x2, y, a, b1, b2,
               1.0 / (1.0 + EXP(-(a + b1 * x1 + b2 * x2))) AS p
        FROM pts JOIN p2 USING (g)),
      t3 AS (
        SELECT g, MAX(a) AS a, MAX(b1) AS b1, MAX(b2) AS b2,
               COUNT(*)::BIGINT AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               SUM(CAST(ROUND(y - p, 12) AS DECIMAL(38,12))) AS g0,
               SUM(CAST(ROUND(x1 * (y - p), 12) AS DECIMAL(38,12))) AS g1,
               SUM(CAST(ROUND(x2 * (y - p), 12) AS DECIMAL(38,12))) AS g2,
               SUM(CAST(ROUND(p * (1.0 - p), 12) AS DECIMAL(38,12)))
                 AS h00,
               SUM(CAST(ROUND(x1 * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h01,
               SUM(CAST(ROUND(x2 * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h02,
               SUM(CAST(ROUND(x1 * x1 * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h11,
               SUM(CAST(ROUND(x1 * x2 * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h12,
               SUM(CAST(ROUND(x2 * x2 * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h22
        FROM pr3 GROUP BY g),
      d3 AS (
        SELECT *,
          CAST(h00 AS DOUBLE) * (CAST(h11 AS DOUBLE) * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(h12 AS DOUBLE))
            - CAST(h01 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(h02 AS DOUBLE))
            + CAST(h02 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(h12 AS DOUBLE)
              - CAST(h11 AS DOUBLE) * CAST(h02 AS DOUBLE)) AS det,
          CAST(g0 AS DOUBLE) * (CAST(h11 AS DOUBLE) * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(h12 AS DOUBLE))
            - CAST(h01 AS DOUBLE) * (CAST(g1 AS DOUBLE)
              * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(g2 AS DOUBLE))
            + CAST(h02 AS DOUBLE) * (CAST(g1 AS DOUBLE)
              * CAST(h12 AS DOUBLE)
              - CAST(h11 AS DOUBLE) * CAST(g2 AS DOUBLE)) AS det0,
          CAST(h00 AS DOUBLE) * (CAST(g1 AS DOUBLE) * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(g2 AS DOUBLE))
            - CAST(g0 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(h02 AS DOUBLE))
            + CAST(h02 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(g2 AS DOUBLE)
              - CAST(g1 AS DOUBLE) * CAST(h02 AS DOUBLE)) AS det1,
          CAST(h00 AS DOUBLE) * (CAST(h11 AS DOUBLE) * CAST(g2 AS DOUBLE)
              - CAST(g1 AS DOUBLE) * CAST(h12 AS DOUBLE))
            - CAST(h01 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(g2 AS DOUBLE)
              - CAST(g1 AS DOUBLE) * CAST(h02 AS DOUBLE))
            + CAST(g0 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(h12 AS DOUBLE)
              - CAST(h11 AS DOUBLE) * CAST(h02 AS DOUBLE)) AS det2
        FROM t3),
      p3 AS (
        SELECT g,
          CASE WHEN det > 0.0 THEN ROUND(a + det0 / det, 12)
          ELSE a END AS a,
          CASE WHEN det > 0.0 THEN ROUND(b1 + det1 / det, 12)
          ELSE b1 END AS b1,
          CASE WHEN det > 0.0 THEN ROUND(b2 + det2 / det, 12)
          ELSE b2 END AS b2
        FROM d3),
      pr4 AS (
        SELECT pts.g, x1, x2, y, a, b1, b2,
               1.0 / (1.0 + EXP(-(a + b1 * x1 + b2 * x2))) AS p
        FROM pts JOIN p3 USING (g)),
      t4 AS (
        SELECT g, MAX(a) AS a, MAX(b1) AS b1, MAX(b2) AS b2,
               COUNT(*)::BIGINT AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               SUM(CAST(ROUND(y - p, 12) AS DECIMAL(38,12))) AS g0,
               SUM(CAST(ROUND(x1 * (y - p), 12) AS DECIMAL(38,12))) AS g1,
               SUM(CAST(ROUND(x2 * (y - p), 12) AS DECIMAL(38,12))) AS g2,
               SUM(CAST(ROUND(p * (1.0 - p), 12) AS DECIMAL(38,12)))
                 AS h00,
               SUM(CAST(ROUND(x1 * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h01,
               SUM(CAST(ROUND(x2 * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h02,
               SUM(CAST(ROUND(x1 * x1 * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h11,
               SUM(CAST(ROUND(x1 * x2 * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h12,
               SUM(CAST(ROUND(x2 * x2 * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h22
        FROM pr4 GROUP BY g),
      d4 AS (
        SELECT *,
          CAST(h00 AS DOUBLE) * (CAST(h11 AS DOUBLE) * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(h12 AS DOUBLE))
            - CAST(h01 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(h02 AS DOUBLE))
            + CAST(h02 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(h12 AS DOUBLE)
              - CAST(h11 AS DOUBLE) * CAST(h02 AS DOUBLE)) AS det,
          CAST(g0 AS DOUBLE) * (CAST(h11 AS DOUBLE) * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(h12 AS DOUBLE))
            - CAST(h01 AS DOUBLE) * (CAST(g1 AS DOUBLE)
              * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(g2 AS DOUBLE))
            + CAST(h02 AS DOUBLE) * (CAST(g1 AS DOUBLE)
              * CAST(h12 AS DOUBLE)
              - CAST(h11 AS DOUBLE) * CAST(g2 AS DOUBLE)) AS det0,
          CAST(h00 AS DOUBLE) * (CAST(g1 AS DOUBLE) * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(g2 AS DOUBLE))
            - CAST(g0 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(h22 AS DOUBLE)
              - CAST(h12 AS DOUBLE) * CAST(h02 AS DOUBLE))
            + CAST(h02 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(g2 AS DOUBLE)
              - CAST(g1 AS DOUBLE) * CAST(h02 AS DOUBLE)) AS det1,
          CAST(h00 AS DOUBLE) * (CAST(h11 AS DOUBLE) * CAST(g2 AS DOUBLE)
              - CAST(g1 AS DOUBLE) * CAST(h12 AS DOUBLE))
            - CAST(h01 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(g2 AS DOUBLE)
              - CAST(g1 AS DOUBLE) * CAST(h02 AS DOUBLE))
            + CAST(g0 AS DOUBLE) * (CAST(h01 AS DOUBLE)
              * CAST(h12 AS DOUBLE)
              - CAST(h11 AS DOUBLE) * CAST(h02 AS DOUBLE)) AS det2
        FROM t4)
      SELECT g AS cohort, n, n_pos,
             CAST(ROUND(a, 6) AS DOUBLE) AS alpha,
             CAST(ROUND(b1, 6) AS DOUBLE) AS b1,
             CAST(ROUND(b2, 6) AS DOUBLE) AS b2,
             CAST(CASE WHEN det > 0.0 THEN
               ROUND(SQRT((CAST(h00 AS DOUBLE) * CAST(h22 AS DOUBLE)
                 - CAST(h02 AS DOUBLE) * CAST(h02 AS DOUBLE)) / det), 6)
             END AS DOUBLE) AS se_b1,
             CAST(CASE WHEN det > 0.0 THEN
               ROUND(SQRT((CAST(h00 AS DOUBLE) * CAST(h11 AS DOUBLE)
                 - CAST(h01 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det), 6)
             END AS DOUBLE) AS se_b2,
             CAST(CASE WHEN det > 0.0 THEN
               ROUND(b1 / SQRT((CAST(h00 AS DOUBLE) * CAST(h22 AS DOUBLE)
                 - CAST(h02 AS DOUBLE) * CAST(h02 AS DOUBLE)) / det), 6)
             END AS DOUBLE) AS z_b1,
             CAST(CASE WHEN det > 0.0 THEN
               ROUND(b2 / SQRT((CAST(h00 AS DOUBLE) * CAST(h11 AS DOUBLE)
                 - CAST(h01 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det), 6)
             END AS DOUBLE) AS z_b2
      FROM d4 ORDER BY cohort""",

    // Three unrolled Newton iterations from (0,0) + the final
    // observed-information pass — every per-row term 12-dp frozen into
    // decimal sums, the 2×2 solve one identical float tree (the
    // q_cox_ph discipline on the classification side).
    // The q_logistic Newton unroll (2 updates + a final stats pass)
    // over class-replicated points: y = 1 iff the row's event type is
    // the replica's class — the OvR decomposition, all five panels in
    // each GROUP BY.
    "q_logistic_multi" -> """
      WITH pts AS (
        SELECT c.class AS g, ROUND(value / 100.0, 6) AS x,
               CASE WHEN event_type = c.class THEN 1.0 ELSE 0.0 END AS y
        FROM events
        CROSS JOIN (SELECT DISTINCT event_type AS class FROM events) c
        WHERE value IS NOT NULL),
      p0 AS (SELECT DISTINCT g, 0.0 AS a, 0.0 AS b FROM pts),
      pr1 AS (
        SELECT pts.g, x, y, a, b,
               1.0 / (1.0 + EXP(-(a + b * x))) AS p
        FROM pts JOIN p0 USING (g)),
      t1 AS (
        SELECT g, MAX(a) AS a, MAX(b) AS b,
               SUM(CAST(ROUND(y - p, 12) AS DECIMAL(38,12))) AS g0,
               SUM(CAST(ROUND(x * (y - p), 12) AS DECIMAL(38,12))) AS g1,
               SUM(CAST(ROUND(p * (1.0 - p), 12) AS DECIMAL(38,12)))
                 AS h00,
               SUM(CAST(ROUND(x * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h01,
               SUM(CAST(ROUND(x * x * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h11
        FROM pr1 GROUP BY g),
      d1 AS (
        SELECT *, CAST(h00 AS DOUBLE) * CAST(h11 AS DOUBLE)
                  - CAST(h01 AS DOUBLE) * CAST(h01 AS DOUBLE) AS det
        FROM t1),
      p1 AS (
        SELECT g,
          CASE WHEN det > 0.0 THEN ROUND(a
            + (CAST(g0 AS DOUBLE) * CAST(h11 AS DOUBLE)
               - CAST(g1 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE a END AS a,
          CASE WHEN det > 0.0 THEN ROUND(b
            + (CAST(g1 AS DOUBLE) * CAST(h00 AS DOUBLE)
               - CAST(g0 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE b END AS b
        FROM d1),
      pr2 AS (
        SELECT pts.g, x, y, a, b,
               1.0 / (1.0 + EXP(-(a + b * x))) AS p
        FROM pts JOIN p1 USING (g)),
      t2 AS (
        SELECT g, MAX(a) AS a, MAX(b) AS b,
               SUM(CAST(ROUND(y - p, 12) AS DECIMAL(38,12))) AS g0,
               SUM(CAST(ROUND(x * (y - p), 12) AS DECIMAL(38,12))) AS g1,
               SUM(CAST(ROUND(p * (1.0 - p), 12) AS DECIMAL(38,12)))
                 AS h00,
               SUM(CAST(ROUND(x * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h01,
               SUM(CAST(ROUND(x * x * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h11
        FROM pr2 GROUP BY g),
      d2 AS (
        SELECT *, CAST(h00 AS DOUBLE) * CAST(h11 AS DOUBLE)
                  - CAST(h01 AS DOUBLE) * CAST(h01 AS DOUBLE) AS det
        FROM t2),
      p2 AS (
        SELECT g,
          CASE WHEN det > 0.0 THEN ROUND(a
            + (CAST(g0 AS DOUBLE) * CAST(h11 AS DOUBLE)
               - CAST(g1 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE a END AS a,
          CASE WHEN det > 0.0 THEN ROUND(b
            + (CAST(g1 AS DOUBLE) * CAST(h00 AS DOUBLE)
               - CAST(g0 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE b END AS b
        FROM d2),
      pr3 AS (
        SELECT pts.g, x, y, a, b,
               1.0 / (1.0 + EXP(-(a + b * x))) AS p
        FROM pts JOIN p2 USING (g)),
      t3 AS (
        SELECT g, MAX(a) AS a, MAX(b) AS b,
               COUNT(*)::BIGINT AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
               SUM(CAST(ROUND(p * (1.0 - p), 12) AS DECIMAL(38,12)))
                 AS h00,
               SUM(CAST(ROUND(x * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h01,
               SUM(CAST(ROUND(x * x * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h11
        FROM pr3 GROUP BY g),
      d3 AS (
        SELECT *, CAST(h00 AS DOUBLE) * CAST(h11 AS DOUBLE)
                  - CAST(h01 AS DOUBLE) * CAST(h01 AS DOUBLE) AS det
        FROM t3)
      -- + 0.0 normalizes DuckDB's ROUND(-3e-7, 6) = -0.0 to the +0.0
      -- Spark's BigDecimal rounding always produces (sign-less zero)
      SELECT g AS class, n, n_pos,
             CAST(ROUND(a, 6) + 0.0 AS DOUBLE) AS alpha,
             CAST(ROUND(b, 6) + 0.0 AS DOUBLE) AS beta,
             CAST(CASE WHEN det > 0.0 THEN
               ROUND(SQRT(CAST(h00 AS DOUBLE) / det), 6) END
               AS DOUBLE) AS se_beta,
             CAST(CASE WHEN det > 0.0 THEN
               ROUND(b / SQRT(CAST(h00 AS DOUBLE) / det), 6) + 0.0 END
               AS DOUBLE) AS z_beta,
             CAST(ROUND(EXP(b), 6) AS DOUBLE) AS odds_ratio
      FROM d3 ORDER BY class""",

    // Day-subject cells (the q_cochran_q prelude at dollar scale),
    // complete-panel filter, the q_anova decimal fold with days as
    // groups, MSB/MSW descaled by 1e12, one ICC tree.
    "q_icc" -> """
      WITH cells AS (
        SELECT event_type,
               DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS y
        FROM events GROUP BY 1, 2),
      pts AS (
        SELECT x AS g, CAST(ROUND(y * 1000000.0) AS BIGINT) AS v
        FROM cells WHERE y IS NOT NULL),
      complete AS (
        SELECT g FROM pts GROUP BY g HAVING COUNT(*) = 5),
      kept AS (SELECT pts.g, v FROM pts JOIN complete USING (g)),
      byg AS (
        SELECT g, COUNT(*)::BIGINT AS ng, SUM(v::HUGEINT) AS s1,
               SUM(v::HUGEINT * v) AS q1
        FROM kept GROUP BY g),
      agg AS (
        SELECT SUM(ng)::BIGINT AS n, COUNT(*)::BIGINT AS kk,
               CAST(SUM(s1) AS DOUBLE) AS s, CAST(SUM(q1) AS DOUBLE) AS q,
               CAST(SUM(CAST(ROUND(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                 / ng, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sb
        FROM byg),
      ss AS (
        SELECT n, kk, sb - s * s / CAST(n AS DOUBLE) AS ssb,
               q - sb AS ssw
        FROM agg),
      ms AS (
        SELECT n, kk,
               ssb / CAST(kk - 1 AS DOUBLE) AS msb,
               ssw / CAST(n - kk AS DOUBLE) AS msw
        FROM ss)
      SELECT kk AS n_subjects, CAST(5 AS INT) AS k,
             CAST(CASE WHEN kk >= 2 AND n > kk THEN
               ROUND(msb / 1000000000000.0, 6) END AS DOUBLE) AS msb,
             CAST(CASE WHEN kk >= 2 AND n > kk THEN
               ROUND(msw / 1000000000000.0, 6) END AS DOUBLE) AS msw,
             CAST(CASE WHEN kk >= 2 AND n > kk
                    AND msb + 4.0 * msw > 0.0
                  THEN ROUND((msb - msw) / (msb + 4.0 * msw), 6)
             END AS DOUBLE) AS icc
      FROM ms""",

    // Working-response OLS per pass (constant IRLS weights under the
    // log link): z = η + (y−μ)/μ, 12-dp frozen z/xz/x/x² decimal sums,
    // ln-mean init, 2 unrolled passes + final stats.
    "q_gamma" -> """
      WITH pts AS (
        SELECT event_type AS g,
               ROUND(HOUR(ts) / 10.0, 6) AS x,
               CAST(value AS DOUBLE) AS y
        FROM events
        WHERE value > 0.0 AND ts IS NOT NULL AND value IS NOT NULL),
      p0 AS (
        SELECT g, ROUND(LN(SUM(y) / CAST(COUNT(*) AS DOUBLE)), 12) AS a,
               0.0 AS b
        FROM pts GROUP BY g),
      pr1 AS (
        SELECT pts.g, x, y, a, b,
               a + b * x AS eta, EXP(a + b * x) AS mu
        FROM pts JOIN p0 USING (g)),
      t1 AS (
        SELECT g, MAX(a) AS a, MAX(b) AS b, COUNT(*)::BIGINT AS n,
               SUM(CAST(ROUND(eta + (y - mu) / mu, 12)
                 AS DECIMAL(38,12))) AS sz,
               SUM(CAST(ROUND(x * (eta + (y - mu) / mu), 12)
                 AS DECIMAL(38,12))) AS sxz,
               SUM(CAST(ROUND(x, 12) AS DECIMAL(38,12))) AS sx,
               SUM(CAST(ROUND(x * x, 12) AS DECIMAL(38,12))) AS sxx
        FROM pr1 GROUP BY g),
      d1 AS (
        SELECT *, CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS det
        FROM t1),
      p1 AS (
        SELECT g,
          CASE WHEN det > 0.0 THEN
            ROUND((CAST(sz AS DOUBLE)
              - (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE)) / det
                * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 12)
          ELSE a END AS a,
          CASE WHEN det > 0.0 THEN
            ROUND((CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE)) / det, 12)
          ELSE b END AS b
        FROM d1),
      pr2 AS (
        SELECT pts.g, x, y, a, b,
               a + b * x AS eta, EXP(a + b * x) AS mu
        FROM pts JOIN p1 USING (g)),
      t2 AS (
        SELECT g, MAX(a) AS a, MAX(b) AS b, COUNT(*)::BIGINT AS n,
               SUM(CAST(ROUND(eta + (y - mu) / mu, 12)
                 AS DECIMAL(38,12))) AS sz,
               SUM(CAST(ROUND(x * (eta + (y - mu) / mu), 12)
                 AS DECIMAL(38,12))) AS sxz,
               SUM(CAST(ROUND(x, 12) AS DECIMAL(38,12))) AS sx,
               SUM(CAST(ROUND(x * x, 12) AS DECIMAL(38,12))) AS sxx
        FROM pr2 GROUP BY g),
      d2 AS (
        SELECT *, CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS det
        FROM t2),
      p2 AS (
        SELECT g,
          CASE WHEN det > 0.0 THEN
            ROUND((CAST(sz AS DOUBLE)
              - (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE)) / det
                * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 12)
          ELSE a END AS a,
          CASE WHEN det > 0.0 THEN
            ROUND((CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE)) / det, 12)
          ELSE b END AS b
        FROM d2),
      pr3 AS (
        SELECT pts.g, x, y, a, b, EXP(a + b * x) AS mu
        FROM pts JOIN p2 USING (g)),
      t3 AS (
        SELECT g, MAX(a) AS a, MAX(b) AS b, COUNT(*)::BIGINT AS n,
               SUM(CAST(ROUND(x, 12) AS DECIMAL(38,12))) AS sx,
               SUM(CAST(ROUND(x * x, 12) AS DECIMAL(38,12))) AS sxx,
               SUM(CAST(ROUND((y - mu) * (y - mu) / (mu * mu), 12)
                 AS DECIMAL(38,12))) AS chi
        FROM pr3 GROUP BY g),
      d3 AS (
        SELECT *, CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS det,
               SQRT(CAST(chi AS DOUBLE) / (CAST(n AS DOUBLE) - 2.0)
                 * (CAST(n AS DOUBLE) / (CAST(n AS DOUBLE)
                    * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))) AS se
        FROM t3)
      SELECT g AS event_type, n,
             CAST(ROUND(a, 6) AS DOUBLE) AS alpha,
             CAST(ROUND(b, 6) AS DOUBLE) AS beta,
             CAST(CASE WHEN det > 0.0 AND n > 2 THEN ROUND(se, 6) END
               AS DOUBLE) AS se_beta,
             CAST(CASE WHEN det > 0.0 AND n > 2 THEN ROUND(b / se, 6) END
               AS DOUBLE) AS z_beta,
             CAST(ROUND(EXP(b), 6) AS DOUBLE) AS rate_ratio,
             CAST(CASE WHEN n > 2 THEN
               ROUND(CAST(chi AS DOUBLE) / (CAST(n AS DOUBLE) - 2.0), 6)
             END AS DOUBLE) AS dispersion
      FROM d3 ORDER BY event_type""",

    // The q_logistic unroll (2 steps, one global group) fits the
    // propensity; scores use the 6-dp published alpha/beta; strata are
    // equal-width on the rounded score; the ATE folds 12-dp stratum
    // terms weighted over the USED strata.
    "q_psm_ate" -> """
      WITH pts AS (
        SELECT ROUND(CAST(HOUR(ts) AS DOUBLE), 6) AS x,
               CASE WHEN user_id % 24 < HOUR(ts) THEN 1.0 ELSE 0.0 END
                 AS t,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS y
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      pr1 AS (
        SELECT x, t, y, 0.0 AS a, 0.0 AS b,
               1.0 / (1.0 + EXP(-(0.0 + 0.0 * x))) AS p
        FROM pts),
      t1 AS (
        SELECT MAX(a) AS a, MAX(b) AS b,
               SUM(CAST(ROUND(t - p, 12) AS DECIMAL(38,12))) AS g0,
               SUM(CAST(ROUND(x * (t - p), 12) AS DECIMAL(38,12))) AS g1,
               SUM(CAST(ROUND(p * (1.0 - p), 12) AS DECIMAL(38,12)))
                 AS h00,
               SUM(CAST(ROUND(x * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h01,
               SUM(CAST(ROUND(x * x * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h11
        FROM pr1),
      d1 AS (
        SELECT *, CAST(h00 AS DOUBLE) * CAST(h11 AS DOUBLE)
                  - CAST(h01 AS DOUBLE) * CAST(h01 AS DOUBLE) AS det
        FROM t1),
      p1 AS (
        SELECT
          CASE WHEN det > 0.0 THEN ROUND(a
            + (CAST(g0 AS DOUBLE) * CAST(h11 AS DOUBLE)
               - CAST(g1 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE a END AS a,
          CASE WHEN det > 0.0 THEN ROUND(b
            + (CAST(g1 AS DOUBLE) * CAST(h00 AS DOUBLE)
               - CAST(g0 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE b END AS b
        FROM d1),
      pr2 AS (
        SELECT x, t, y, a, b,
               1.0 / (1.0 + EXP(-(a + b * x))) AS p
        FROM pts, p1),
      t2 AS (
        SELECT MAX(a) AS a, MAX(b) AS b,
               SUM(CAST(ROUND(t - p, 12) AS DECIMAL(38,12))) AS g0,
               SUM(CAST(ROUND(x * (t - p), 12) AS DECIMAL(38,12))) AS g1,
               SUM(CAST(ROUND(p * (1.0 - p), 12) AS DECIMAL(38,12)))
                 AS h00,
               SUM(CAST(ROUND(x * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h01,
               SUM(CAST(ROUND(x * x * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h11
        FROM pr2),
      d2 AS (
        SELECT *, CAST(h00 AS DOUBLE) * CAST(h11 AS DOUBLE)
                  - CAST(h01 AS DOUBLE) * CAST(h01 AS DOUBLE) AS det
        FROM t2),
      p2 AS (
        SELECT
          CASE WHEN det > 0.0 THEN ROUND(a
            + (CAST(g0 AS DOUBLE) * CAST(h11 AS DOUBLE)
               - CAST(g1 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE a END AS a,
          CASE WHEN det > 0.0 THEN ROUND(b
            + (CAST(g1 AS DOUBLE) * CAST(h00 AS DOUBLE)
               - CAST(g0 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE b END AS b
        FROM d2),
      fit AS (SELECT ROUND(a, 6) AS alpha, ROUND(b, 6) AS beta FROM p2),
      scored AS (
        SELECT t, y,
               CAST(LEAST(FLOOR(
                 ROUND(1.0 / (1.0 + EXP(-(alpha + beta * x))), 6) * 5),
                 4) AS INT) AS stratum
        FROM pts, fit),
      panel AS (
        SELECT stratum,
               SUM(CASE WHEN t = 1.0 THEN 1 ELSE 0 END)::BIGINT
                 AS n_treat,
               SUM(CASE WHEN t = 0.0 THEN 1 ELSE 0 END)::BIGINT
                 AS n_ctrl,
               SUM(CASE WHEN t = 1.0 THEN y::HUGEINT END) AS sy1,
               SUM(CASE WHEN t = 0.0 THEN y::HUGEINT END) AS sy0
        FROM scored GROUP BY stratum),
      means AS (
        SELECT stratum, n_treat, n_ctrl,
               CASE WHEN n_treat > 0 THEN
                 ROUND(CAST(sy1 AS DOUBLE) / CAST(n_treat AS DOUBLE)
                   / 1000000.0, 6) END AS y_treat,
               CASE WHEN n_ctrl > 0 THEN
                 ROUND(CAST(sy0 AS DOUBLE) / CAST(n_ctrl AS DOUBLE)
                   / 1000000.0, 6) END AS y_ctrl
        FROM panel),
      diffs AS (
        SELECT *, CASE WHEN n_treat > 0 AND n_ctrl > 0 THEN
                 ROUND(y_treat - y_ctrl, 6) END AS diff
        FROM means),
      used AS (SELECT SUM(n_treat + n_ctrl) AS nu FROM diffs
               WHERE diff IS NOT NULL),
      atev AS (
        SELECT CAST(ROUND(CAST(SUM(CAST(ROUND(diff
                 * CAST(n_treat + n_ctrl AS DOUBLE)
                 / CAST(nu AS DOUBLE), 12) AS DECIMAL(38,12)))
               AS DOUBLE), 6) AS DOUBLE) AS ate
        FROM diffs, used WHERE diff IS NOT NULL)
      SELECT stratum, n_treat, n_ctrl,
             CAST(y_treat AS DOUBLE) AS y_treat,
             CAST(y_ctrl AS DOUBLE) AS y_ctrl,
             CAST(diff AS DOUBLE) AS diff, ate
      FROM diffs, atev ORDER BY stratum""",

    "q_logistic" -> """
      WITH pts AS (
        SELECT CAST(user_id % 3 AS INTEGER) AS g,
               ROUND(value / 100.0, 6) AS x,
               CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
        FROM events WHERE value IS NOT NULL),
      p0 AS (SELECT DISTINCT g, 0.0 AS a, 0.0 AS b FROM pts),
      pr1 AS (
        SELECT pts.g, x, y, a, b,
               1.0 / (1.0 + EXP(-(a + b * x))) AS p
        FROM pts JOIN p0 USING (g)),
      t1 AS (
        SELECT g, MAX(a) AS a, MAX(b) AS b,
               SUM(CAST(ROUND(y - p, 12) AS DECIMAL(38,12))) AS g0,
               SUM(CAST(ROUND(x * (y - p), 12) AS DECIMAL(38,12))) AS g1,
               SUM(CAST(ROUND(p * (1.0 - p), 12) AS DECIMAL(38,12)))
                 AS h00,
               SUM(CAST(ROUND(x * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h01,
               SUM(CAST(ROUND(x * x * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h11
        FROM pr1 GROUP BY g),
      d1 AS (
        SELECT *, CAST(h00 AS DOUBLE) * CAST(h11 AS DOUBLE)
                  - CAST(h01 AS DOUBLE) * CAST(h01 AS DOUBLE) AS det
        FROM t1),
      p1 AS (
        SELECT g,
          CASE WHEN det > 0.0 THEN ROUND(a
            + (CAST(g0 AS DOUBLE) * CAST(h11 AS DOUBLE)
               - CAST(g1 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE a END AS a,
          CASE WHEN det > 0.0 THEN ROUND(b
            + (CAST(g1 AS DOUBLE) * CAST(h00 AS DOUBLE)
               - CAST(g0 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE b END AS b
        FROM d1),
      pr2 AS (
        SELECT pts.g, x, y, a, b,
               1.0 / (1.0 + EXP(-(a + b * x))) AS p
        FROM pts JOIN p1 USING (g)),
      t2 AS (
        SELECT g, MAX(a) AS a, MAX(b) AS b,
               SUM(CAST(ROUND(y - p, 12) AS DECIMAL(38,12))) AS g0,
               SUM(CAST(ROUND(x * (y - p), 12) AS DECIMAL(38,12))) AS g1,
               SUM(CAST(ROUND(p * (1.0 - p), 12) AS DECIMAL(38,12)))
                 AS h00,
               SUM(CAST(ROUND(x * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h01,
               SUM(CAST(ROUND(x * x * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h11
        FROM pr2 GROUP BY g),
      d2 AS (
        SELECT *, CAST(h00 AS DOUBLE) * CAST(h11 AS DOUBLE)
                  - CAST(h01 AS DOUBLE) * CAST(h01 AS DOUBLE) AS det
        FROM t2),
      p2 AS (
        SELECT g,
          CASE WHEN det > 0.0 THEN ROUND(a
            + (CAST(g0 AS DOUBLE) * CAST(h11 AS DOUBLE)
               - CAST(g1 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE a END AS a,
          CASE WHEN det > 0.0 THEN ROUND(b
            + (CAST(g1 AS DOUBLE) * CAST(h00 AS DOUBLE)
               - CAST(g0 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE b END AS b
        FROM d2),
      pr3 AS (
        SELECT pts.g, x, y, a, b,
               1.0 / (1.0 + EXP(-(a + b * x))) AS p
        FROM pts JOIN p2 USING (g)),
      t3 AS (
        SELECT g, MAX(a) AS a, MAX(b) AS b,
               SUM(CAST(ROUND(y - p, 12) AS DECIMAL(38,12))) AS g0,
               SUM(CAST(ROUND(x * (y - p), 12) AS DECIMAL(38,12))) AS g1,
               SUM(CAST(ROUND(p * (1.0 - p), 12) AS DECIMAL(38,12)))
                 AS h00,
               SUM(CAST(ROUND(x * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h01,
               SUM(CAST(ROUND(x * x * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h11
        FROM pr3 GROUP BY g),
      d3 AS (
        SELECT *, CAST(h00 AS DOUBLE) * CAST(h11 AS DOUBLE)
                  - CAST(h01 AS DOUBLE) * CAST(h01 AS DOUBLE) AS det
        FROM t3),
      p3 AS (
        SELECT g,
          CASE WHEN det > 0.0 THEN ROUND(a
            + (CAST(g0 AS DOUBLE) * CAST(h11 AS DOUBLE)
               - CAST(g1 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE a END AS a,
          CASE WHEN det > 0.0 THEN ROUND(b
            + (CAST(g1 AS DOUBLE) * CAST(h00 AS DOUBLE)
               - CAST(g0 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE b END AS b
        FROM d3),
      pr4 AS (
        SELECT pts.g, x, y, a, b,
               1.0 / (1.0 + EXP(-(a + b * x))) AS p
        FROM pts JOIN p3 USING (g)),
      t4 AS (
        SELECT g, MAX(a) AS a, MAX(b) AS b,
               COUNT(*)::BIGINT AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
               SUM(CAST(ROUND(p * (1.0 - p), 12) AS DECIMAL(38,12)))
                 AS h00,
               SUM(CAST(ROUND(x * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h01,
               SUM(CAST(ROUND(x * x * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h11
        FROM pr4 GROUP BY g),
      d4 AS (
        SELECT *, CAST(h00 AS DOUBLE) * CAST(h11 AS DOUBLE)
                  - CAST(h01 AS DOUBLE) * CAST(h01 AS DOUBLE) AS det
        FROM t4)
      SELECT g AS cohort, n, n_pos,
             CAST(ROUND(a, 6) AS DOUBLE) AS alpha,
             CAST(ROUND(b, 6) AS DOUBLE) AS beta,
             CAST(CASE WHEN det > 0.0 THEN
               ROUND(SQRT(CAST(h00 AS DOUBLE) / det), 6) END
               AS DOUBLE) AS se_beta,
             CAST(CASE WHEN det > 0.0 THEN
               ROUND(b / SQRT(CAST(h00 AS DOUBLE) / det), 6) END
               AS DOUBLE) AS z_beta,
             CAST(ROUND(EXP(b), 6) AS DOUBLE) AS odds_ratio
      FROM d4 ORDER BY cohort""",

    // ln-transformed points (identical libm doubles), then the
    // q_lin_fit moment CTEs and trees verbatim; slope = elasticity.
    "q_elasticity" -> """
      WITH pts0 AS (
        SELECT l_returnflag AS g,
               LN(l_extendedprice / l_quantity) AS lp,
               LN(l_quantity) AS lq
        FROM lineitem
        WHERE l_quantity > 0 AND l_extendedprice > 0),
      pts AS (
        SELECT g, CAST(ROUND(lp * 1000000.0) AS BIGINT) AS xq,
               CAST(ROUND(lq * 1000000.0) AS BIGINT) AS yq
        FROM pts0 WHERE lp IS NOT NULL AND lq IS NOT NULL),
      s AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(xq::HUGEINT) AS sx, SUM(yq::HUGEINT) AS sy,
               SUM(xq::HUGEINT * xq) AS sxx, SUM(yq::HUGEINT * yq) AS syy,
               SUM(xq::HUGEINT * yq) AS sxy
        FROM pts GROUP BY g),
      d AS (
        SELECT g, n,
               CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
               CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS denx,
               CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny,
               CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        FROM s)
      SELECT g AS l_returnflag, n,
             CAST(CASE WHEN denx > 0.0 THEN ROUND(num / denx, 6) END
               AS DOUBLE) AS elasticity,
             CAST(CASE WHEN denx > 0.0 THEN
               ROUND(syd / CAST(n AS DOUBLE) / 1000000.0
                 - num / denx * (sxd / CAST(n AS DOUBLE) / 1000000.0), 6)
             END AS DOUBLE) AS intercept,
             CAST(CASE WHEN denx > 0.0 AND deny > 0.0 THEN
               ROUND(num * num / (denx * deny), 6)
             END AS DOUBLE) AS r2
      FROM d
      ORDER BY l_returnflag""",

    // Seven HUGEINT weighted moments (triple products wx², wy², wxy),
    // the q_lin_fit trees with Σw in n's place, Σw descaled once.
    "q_wls" -> """
      WITH pts AS (
        SELECT l_returnflag AS g,
               CAST(ROUND(l_quantity * 1000000.0) AS BIGINT) AS x,
               CAST(ROUND(l_extendedprice * 1000000.0) AS BIGINT) AS y,
               CAST(ROUND((1.0 - l_discount) * 1000000.0) AS BIGINT) AS w
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
          AND l_discount IS NOT NULL),
      pos AS (SELECT * FROM pts WHERE w > 0),
      s AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(w::HUGEINT) AS sw,
               SUM(w::HUGEINT * x) AS swx, SUM(w::HUGEINT * y) AS swy,
               SUM(w::HUGEINT * x * x) AS swxx,
               SUM(w::HUGEINT * y * y) AS swyy,
               SUM(w::HUGEINT * x * y) AS swxy
        FROM pos GROUP BY g),
      fl AS (
        SELECT g, n, CAST(sw AS DOUBLE) AS swd,
               CAST(swx AS DOUBLE) AS swxd, CAST(swy AS DOUBLE) AS swyd,
               CAST(sw AS DOUBLE) * CAST(swxy AS DOUBLE)
                 - CAST(swx AS DOUBLE) * CAST(swy AS DOUBLE) AS num,
               CAST(sw AS DOUBLE) * CAST(swxx AS DOUBLE)
                 - CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE) AS denx,
               CAST(sw AS DOUBLE) * CAST(swyy AS DOUBLE)
                 - CAST(swy AS DOUBLE) * CAST(swy AS DOUBLE) AS deny
        FROM s)
      SELECT g AS l_returnflag, n,
             CAST(ROUND(swd / 1000000.0, 6) AS DOUBLE) AS sum_w,
             CAST(CASE WHEN denx > 0.0 THEN ROUND(num / denx, 6) END
               AS DOUBLE) AS slope,
             CAST(CASE WHEN denx > 0.0 THEN
               ROUND(swyd / swd / 1000000.0
                 - num / denx * (swxd / swd / 1000000.0), 6)
             END AS DOUBLE) AS intercept,
             CAST(CASE WHEN denx > 0.0 AND deny > 0.0 THEN
               ROUND(num * num / (denx * deny), 6)
             END AS DOUBLE) AS r2
      FROM fl ORDER BY l_returnflag""",

    // The q_ols_multi moments with the covariate variances inflated
    // by (1 + λ) = 1.5 — the standardized-ridge Cramer trees.
    "q_ridge" -> """
      WITH pts AS (
        SELECT l_returnflag AS g,
               CAST(ROUND(l_quantity * 1000000.0) AS BIGINT) AS x1,
               CAST(ROUND(l_discount * 1000000.0) AS BIGINT) AS x2,
               CAST(ROUND(l_extendedprice * 1000000.0) AS BIGINT) AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
          AND l_extendedprice IS NOT NULL),
      s AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(x1::HUGEINT) AS s1, SUM(x2::HUGEINT) AS s2,
               SUM(y::HUGEINT) AS sy,
               SUM(x1::HUGEINT * x1) AS s11, SUM(x2::HUGEINT * x2) AS s22,
               SUM(x1::HUGEINT * x2) AS s12, SUM(x1::HUGEINT * y) AS s1y,
               SUM(x2::HUGEINT * y) AS s2y, SUM(y::HUGEINT * y) AS syy
        FROM pts GROUP BY g),
      fl AS (
        SELECT g, n, CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
               CAST(sy AS DOUBLE) AS syd,
               (CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) * 1.5 AS cs11,
               (CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE)
                 - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)) * 1.5 AS cs22,
               CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS cs12,
               CAST(n AS DOUBLE) * CAST(s1y AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) AS cs1y,
               CAST(n AS DOUBLE) * CAST(s2y AS DOUBLE)
                 - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) AS cs2y,
               CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS csyy
        FROM s),
      g1 AS (
        SELECT *, cs11 * cs22 - cs12 * cs12 AS det FROM fl),
      g2 AS (
        SELECT *,
               (cs1y * cs22 - cs2y * cs12) / det AS b1,
               (cs2y * cs11 - cs1y * cs12) / det AS b2
        FROM g1),
      g3 AS (
        SELECT *,
               (syd - b1 * s1d - b2 * s2d) / CAST(n AS DOUBLE) AS b0s
        FROM g2)
      SELECT g AS l_returnflag, n, CAST(0.5 AS DOUBLE) AS lambda,
             CAST(CASE WHEN n >= 3 AND det > 0.0
               THEN ROUND(b0s / 1000000.0, 6) END AS DOUBLE) AS b0,
             CAST(CASE WHEN n >= 3 AND det > 0.0
               THEN ROUND(b1, 6) END AS DOUBLE) AS b1,
             CAST(CASE WHEN n >= 3 AND det > 0.0
               THEN ROUND(b2, 6) END AS DOUBLE) AS b2,
             CAST(CASE WHEN n >= 3 AND det > 0.0 AND csyy > 0.0
               THEN ROUND((b1 * cs1y + b2 * cs2y) / csyy, 6) END
               AS DOUBLE) AS r2
      FROM g3 ORDER BY l_returnflag""",

    // Fifteen HUGEINT Gram moments, the 3×3 first-row cofactor
    // expansions (det + three replaced-column Cramer determinants +
    // adjugate diagonals) — identical left-associated float trees.
    "q_ols_multi3" -> """
      WITH pts AS (
        SELECT l_returnflag AS g,
               CAST(ROUND(l_quantity * 1000000.0) AS BIGINT) AS x1,
               CAST(ROUND(l_discount * 1000000.0) AS BIGINT) AS x2,
               CAST(ROUND(l_tax * 1000000.0) AS BIGINT) AS x3,
               CAST(ROUND(l_extendedprice * 1000000.0) AS BIGINT) AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
          AND l_tax IS NOT NULL AND l_extendedprice IS NOT NULL),
      s AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(x1::HUGEINT) AS s1, SUM(x2::HUGEINT) AS s2,
               SUM(x3::HUGEINT) AS s3, SUM(y::HUGEINT) AS sy,
               SUM(x1::HUGEINT * x1) AS q11, SUM(x2::HUGEINT * x2) AS q22,
               SUM(x3::HUGEINT * x3) AS q33, SUM(x1::HUGEINT * x2) AS q12,
               SUM(x1::HUGEINT * x3) AS q13, SUM(x2::HUGEINT * x3) AS q23,
               SUM(x1::HUGEINT * y) AS q1y, SUM(x2::HUGEINT * y) AS q2y,
               SUM(x3::HUGEINT * y) AS q3y, SUM(y::HUGEINT * y) AS qyy
        FROM pts GROUP BY g),
      fl AS (
        SELECT g, n, CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
               CAST(s3 AS DOUBLE) AS s3d, CAST(sy AS DOUBLE) AS syd,
               CAST(n AS DOUBLE) * CAST(q11 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS s11,
               CAST(n AS DOUBLE) * CAST(q22 AS DOUBLE)
                 - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS s22,
               CAST(n AS DOUBLE) * CAST(q33 AS DOUBLE)
                 - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE) AS s33,
               CAST(n AS DOUBLE) * CAST(q12 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS s12,
               CAST(n AS DOUBLE) * CAST(q13 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE) AS s13,
               CAST(n AS DOUBLE) * CAST(q23 AS DOUBLE)
                 - CAST(s2 AS DOUBLE) * CAST(s3 AS DOUBLE) AS s23,
               CAST(n AS DOUBLE) * CAST(q1y AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) AS s1y,
               CAST(n AS DOUBLE) * CAST(q2y AS DOUBLE)
                 - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) AS s2y,
               CAST(n AS DOUBLE) * CAST(q3y AS DOUBLE)
                 - CAST(s3 AS DOUBLE) * CAST(sy AS DOUBLE) AS s3y,
               CAST(n AS DOUBLE) * CAST(qyy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS syy
        FROM s),
      g1 AS (
        SELECT *,
               s11 * (s22 * s33 - s23 * s23)
                 - s12 * (s12 * s33 - s23 * s13)
                 + s13 * (s12 * s23 - s22 * s13) AS det,
               s1y * (s22 * s33 - s23 * s23)
                 - s12 * (s2y * s33 - s23 * s3y)
                 + s13 * (s2y * s23 - s22 * s3y) AS det1,
               s11 * (s2y * s33 - s23 * s3y)
                 - s1y * (s12 * s33 - s23 * s13)
                 + s13 * (s12 * s3y - s2y * s13) AS det2,
               s11 * (s22 * s3y - s2y * s23)
                 - s12 * (s12 * s3y - s2y * s13)
                 + s1y * (s12 * s23 - s22 * s13) AS det3
        FROM fl),
      g2 AS (
        SELECT *, det1 / det AS b1, det2 / det AS b2, det3 / det AS b3
        FROM g1),
      g3 AS (
        SELECT *,
               (syd - b1 * s1d - b2 * s2d - b3 * s3d)
                 / CAST(n AS DOUBLE) AS b0s,
               (syy - b1 * s1y - b2 * s2y - b3 * s3y)
                 / CAST(n AS DOUBLE) AS sse
        FROM g2),
      g4 AS (
        SELECT *, sse / (CAST(n AS DOUBLE) - 4.0) AS s2m FROM g3),
      g5 AS (
        SELECT *,
               SQRT(s2m * CAST(n AS DOUBLE)
                 * (s22 * s33 - s23 * s23) / det) AS se1,
               SQRT(s2m * CAST(n AS DOUBLE)
                 * (s11 * s33 - s13 * s13) / det) AS se2,
               SQRT(s2m * CAST(n AS DOUBLE)
                 * (s11 * s22 - s12 * s12) / det) AS se3
        FROM g4)
      SELECT g AS l_returnflag, n,
             CAST(CASE WHEN n >= 5 AND det > 0.0
               THEN ROUND(b0s / 1000000.0, 6) END AS DOUBLE) AS b0,
             CAST(CASE WHEN n >= 5 AND det > 0.0
               THEN ROUND(b1, 6) END AS DOUBLE) AS b1,
             CAST(CASE WHEN n >= 5 AND det > 0.0
               THEN ROUND(b2, 6) END AS DOUBLE) AS b2,
             CAST(CASE WHEN n >= 5 AND det > 0.0
               THEN ROUND(b3, 6) END AS DOUBLE) AS b3,
             CAST(CASE WHEN n >= 5 AND det > 0.0 AND sse > 0.0
               THEN ROUND(se1, 6) END AS DOUBLE) AS se_b1,
             CAST(CASE WHEN n >= 5 AND det > 0.0 AND sse > 0.0
               THEN ROUND(se2, 6) END AS DOUBLE) AS se_b2,
             CAST(CASE WHEN n >= 5 AND det > 0.0 AND sse > 0.0
               THEN ROUND(se3, 6) END AS DOUBLE) AS se_b3,
             CAST(CASE WHEN n >= 5 AND det > 0.0 AND sse > 0.0
               THEN ROUND(b1 / se1, 6) END AS DOUBLE) AS t_b1,
             CAST(CASE WHEN n >= 5 AND det > 0.0 AND sse > 0.0
               THEN ROUND(b2 / se2, 6) END AS DOUBLE) AS t_b2,
             CAST(CASE WHEN n >= 5 AND det > 0.0 AND sse > 0.0
               THEN ROUND(b3 / se3, 6) END AS DOUBLE) AS t_b3,
             CAST(CASE WHEN n >= 5 AND det > 0.0 AND syy > 0.0
               THEN ROUND((b1 * s1y + b2 * s2y + b3 * s3y) / syy, 6) END
               AS DOUBLE) AS r2
      FROM g5 ORDER BY l_returnflag""",

    // Ten HUGEINT Gram moments, n-scaled centered moments, one 2×2
    // Cramer solve + adjugate-diagonal standard errors — every derived
    // quantity the identical left-associated float tree, 6 dp.
    "q_ols_multi" -> """
      WITH pts AS (
        SELECT l_returnflag AS g,
               CAST(ROUND(l_quantity * 1000000.0) AS BIGINT) AS x1,
               CAST(ROUND(l_discount * 1000000.0) AS BIGINT) AS x2,
               CAST(ROUND(l_extendedprice * 1000000.0) AS BIGINT) AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
          AND l_extendedprice IS NOT NULL),
      s AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(x1::HUGEINT) AS s1, SUM(x2::HUGEINT) AS s2,
               SUM(y::HUGEINT) AS sy,
               SUM(x1::HUGEINT * x1) AS s11, SUM(x2::HUGEINT * x2) AS s22,
               SUM(x1::HUGEINT * x2) AS s12, SUM(x1::HUGEINT * y) AS s1y,
               SUM(x2::HUGEINT * y) AS s2y, SUM(y::HUGEINT * y) AS syy
        FROM pts GROUP BY g),
      fl AS (
        SELECT g, n, CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
               CAST(sy AS DOUBLE) AS syd,
               CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS cs11,
               CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE)
                 - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS cs22,
               CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS cs12,
               CAST(n AS DOUBLE) * CAST(s1y AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) AS cs1y,
               CAST(n AS DOUBLE) * CAST(s2y AS DOUBLE)
                 - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) AS cs2y,
               CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS csyy
        FROM s),
      g1 AS (
        SELECT *, cs11 * cs22 - cs12 * cs12 AS det FROM fl),
      g2 AS (
        SELECT *,
               (cs1y * cs22 - cs2y * cs12) / det AS b1,
               (cs2y * cs11 - cs1y * cs12) / det AS b2
        FROM g1),
      g3 AS (
        SELECT *,
               (syd - b1 * s1d - b2 * s2d) / CAST(n AS DOUBLE) AS b0s,
               (csyy - b1 * cs1y - b2 * cs2y) / CAST(n AS DOUBLE) AS sse
        FROM g2),
      g4 AS (
        SELECT *, sse / (CAST(n AS DOUBLE) - 3.0) AS s2m FROM g3),
      g5 AS (
        SELECT *,
               SQRT(s2m * CAST(n AS DOUBLE) * cs22 / det) AS se1,
               SQRT(s2m * CAST(n AS DOUBLE) * cs11 / det) AS se2,
               SQRT(s2m * (1.0 / CAST(n AS DOUBLE)
                 + (s1d * s1d * cs22 - 2.0 * s1d * s2d * cs12
                    + s2d * s2d * cs11)
                   / (CAST(n AS DOUBLE) * det))) AS se0
        FROM g4)
      SELECT g AS l_returnflag, n,
             CAST(CASE WHEN n >= 4 AND det > 0.0
               THEN ROUND(b0s / 1000000.0, 6) END AS DOUBLE) AS b0,
             CAST(CASE WHEN n >= 4 AND det > 0.0
               THEN ROUND(b1, 6) END AS DOUBLE) AS b1,
             CAST(CASE WHEN n >= 4 AND det > 0.0
               THEN ROUND(b2, 6) END AS DOUBLE) AS b2,
             CAST(CASE WHEN n >= 4 AND det > 0.0 AND sse > 0.0
               THEN ROUND(se0 / 1000000.0, 6) END AS DOUBLE) AS se_b0,
             CAST(CASE WHEN n >= 4 AND det > 0.0 AND sse > 0.0
               THEN ROUND(se1, 6) END AS DOUBLE) AS se_b1,
             CAST(CASE WHEN n >= 4 AND det > 0.0 AND sse > 0.0
               THEN ROUND(se2, 6) END AS DOUBLE) AS se_b2,
             CAST(CASE WHEN n >= 4 AND det > 0.0 AND sse > 0.0
               THEN ROUND(b1 / se1, 6) END AS DOUBLE) AS t_b1,
             CAST(CASE WHEN n >= 4 AND det > 0.0 AND sse > 0.0
               THEN ROUND(b2 / se2, 6) END AS DOUBLE) AS t_b2,
             CAST(CASE WHEN n >= 4 AND det > 0.0 AND csyy > 0.0
               THEN ROUND((b1 * cs1y + b2 * cs2y) / csyy, 6) END
               AS DOUBLE) AS r2
      FROM g5 ORDER BY l_returnflag""",

    "q_lin_fit" -> """
      WITH cells AS (
        SELECT event_type AS g,
               DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS y
        FROM events GROUP BY 1, CAST(ts AS DATE)),
      pts AS (
        SELECT g, CAST(ROUND(x * 1000000.0) AS BIGINT) AS xq,
               CAST(ROUND(y * 1000000.0) AS BIGINT) AS yq
        FROM cells WHERE x IS NOT NULL AND y IS NOT NULL),
      s AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(xq::HUGEINT) AS sx, SUM(yq::HUGEINT) AS sy,
               SUM(xq::HUGEINT * xq) AS sxx, SUM(yq::HUGEINT * yq) AS syy,
               SUM(xq::HUGEINT * yq) AS sxy
        FROM pts GROUP BY g),
      d AS (
        SELECT g, n,
               CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
               CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS denx,
               CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny,
               CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        FROM s)
      SELECT g AS event_type, n,
             CAST(CASE WHEN denx > 0.0 THEN ROUND(num / denx, 6) END
               AS DOUBLE) AS slope,
             CAST(CASE WHEN denx > 0.0 THEN
               ROUND(syd / CAST(n AS DOUBLE) / 1000000.0
                 - num / denx * (sxd / CAST(n AS DOUBLE) / 1000000.0), 6)
             END AS DOUBLE) AS intercept,
             CAST(CASE WHEN denx > 0.0 AND deny > 0.0 THEN
               ROUND(num * num / (denx * deny), 6)
             END AS DOUBLE) AS r2
      FROM d
      ORDER BY event_type""",

    // The q_kaplan_meier subjects split by user parity; at-risk from
    // the full exit history, grid totals by time partition, E/V terms
    // 12-dp-rounded into exact DECIMAL(38,12) sums, one z tree.
    "q_log_rank" -> """
      WITH subj AS (
        SELECT CAST(user_id % 2 AS INTEGER) AS g,
               DATEDIFF('day', MIN(CAST(ts AS DATE)),
                 COALESCE(MIN(CASE WHEN event_type = 'purchase'
                                THEN CAST(ts AS DATE) END),
                          MAX(CAST(ts AS DATE)))) AS t,
               (MIN(CASE WHEN event_type = 'purchase'
                      THEN CAST(ts AS DATE) END) IS NOT NULL) AS obs
        FROM events GROUP BY user_id),
      cells AS (
        SELECT g, t, SUM(CASE WHEN obs THEN 1 ELSE 0 END)::BIGINT AS d,
               COUNT(*)::BIGINT AS x
        FROM subj GROUP BY 1, 2),
      grps AS (SELECT g, SUM(x)::BIGINT AS ng FROM cells GROUP BY g),
      times AS (
        SELECT t FROM (SELECT t, SUM(d) AS dt FROM cells GROUP BY t)
        WHERE dt > 0),
      risk AS (
        SELECT gr.g, tm.t, gr.ng,
               (gr.ng - COALESCE(SUM(c2.x), 0))::BIGINT AS nrisk
        FROM times tm CROSS JOIN grps gr
        LEFT JOIN cells c2 ON c2.g = gr.g AND c2.t < tm.t
        GROUP BY 1, 2, 3),
      grid AS (
        SELECT r.g, r.t, r.ng, r.nrisk, COALESCE(ce.d, 0)::BIGINT AS d
        FROM risk r LEFT JOIN cells ce ON ce.g = r.g AND ce.t = r.t),
      tot AS (
        SELECT g, t, ng, nrisk, d,
               SUM(d) OVER (PARTITION BY t) AS dt,
               SUM(nrisk) OVER (PARTITION BY t) AS nt
        FROM grid),
      terms AS (
        SELECT g, ng, d,
               ROUND(CAST(dt AS DOUBLE)
                 * (CAST(nrisk AS DOUBLE) / CAST(nt AS DOUBLE)), 12)
                 ::DECIMAL(38,12) AS te,
               (CASE WHEN nt > 1 THEN
                  ROUND(CAST(dt AS DOUBLE)
                    * (CAST(nrisk AS DOUBLE) / CAST(nt AS DOUBLE))
                    * (1.0 - CAST(nrisk AS DOUBLE) / CAST(nt AS DOUBLE))
                    * CAST(nt - dt AS DOUBLE)
                    / CAST(nt - 1 AS DOUBLE), 12)
                ELSE 0.0 END)::DECIMAL(38,12) AS tv
        FROM tot),
      agg AS (
        SELECT g, MAX(ng) AS ng, SUM(d)::BIGINT AS o,
               SUM(te) AS e, SUM(tv) AS v
        FROM terms GROUP BY g)
      SELECT g AS cohort, ng AS n_subjects, o,
             CAST(ROUND(CAST(e AS DOUBLE), 6) AS DOUBLE) AS e,
             CAST(CASE WHEN CAST(v AS DOUBLE) > 0.0 THEN
               ROUND((CAST(o AS DOUBLE) - CAST(e AS DOUBLE))
                 / SQRT(CAST(v AS DOUBLE)), 6)
             END AS DOUBLE) AS z
      FROM agg
      ORDER BY cohort""",

    // The q_acf CTEs, pivoted wide, through the closed-form
    // Durbin-Levinson unroll with RAW (unrounded) intermediate phis.
    "q_pacf" -> """
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      st AS (SELECT g, COUNT(*)::HUGEINT AS n, SUM(x)::HUGEINT AS s
             FROM cells GROUP BY g),
      a AS (SELECT c.g, c.day, st.n * c.x - st.s AS aa
            FROM cells c JOIN st ON c.g = st.g),
      lagged AS (
        SELECT g, aa,
               LEAD(aa, 1) OVER w AS l1,
               LEAD(aa, 2) OVER w AS l2,
               LEAD(aa, 3) OVER w AS l3
        FROM a WINDOW w AS (PARTITION BY g ORDER BY day)),
      agg AS (
        SELECT g, SUM(aa * aa) AS dd,
               SUM(aa * l1) AS n1, SUM(aa * l2) AS n2, SUM(aa * l3) AS n3
        FROM lagged GROUP BY g),
      wide AS (
        SELECT g,
               CAST(CASE WHEN dd <> 0 THEN
                 ROUND(CAST(n1 AS DOUBLE) / CAST(dd AS DOUBLE), 6)
               END AS DOUBLE) AS r1,
               CAST(CASE WHEN dd <> 0 THEN
                 ROUND(CAST(n2 AS DOUBLE) / CAST(dd AS DOUBLE), 6)
               END AS DOUBLE) AS r2,
               CAST(CASE WHEN dd <> 0 THEN
                 ROUND(CAST(n3 AS DOUBLE) / CAST(dd AS DOUBLE), 6)
               END AS DOUBLE) AS r3
        FROM agg),
      c1 AS (
        SELECT g, r1, r2, r3,
               (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22
        FROM wide),
      c2 AS (SELECT g, r1, r2, r3, p22, r1 * (1.0 - p22) AS p21 FROM c1),
      fin AS (
        SELECT g,
               CAST(ROUND(r1, 6) AS DOUBLE) AS p1,
               CAST(CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL
                      AND 1.0 - r1 * r1 <> 0.0 THEN ROUND(p22, 6)
                    END AS DOUBLE) AS p2,
               CAST(CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL
                      AND r3 IS NOT NULL AND 1.0 - r1 * r1 <> 0.0
                      AND 1.0 - p21 * r1 - p22 * r2 <> 0.0 THEN
                 ROUND((r3 - p21 * r2 - p22 * r1)
                   / (1.0 - p21 * r1 - p22 * r2), 6)
               END AS DOUBLE) AS p3
        FROM c2)
      SELECT g AS event_type, lag, pacf FROM (
        SELECT g, 1::BIGINT AS lag, p1 AS pacf FROM fin
        UNION ALL SELECT g, 2, p2 FROM fin
        UNION ALL SELECT g, 3, p3 FROM fin)
      ORDER BY event_type, lag""",

    // Exact-regime heavy hitters (7 langs < capacity 16): the sketch
    // counts equal plain GROUP BY counts; (n DESC, lang) total order.
    "q_heavy_hitters" -> """
      WITH counts AS (
        SELECT source, lang, COUNT(*)::BIGINT AS n
        FROM documents WHERE lang IS NOT NULL
        GROUP BY 1, 2)
      SELECT source, lang,
             ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY n DESC, lang)::BIGINT AS rank, n
      FROM counts
      ORDER BY source, rank""",

    // Counting order statistic: first (group, value) cell whose
    // cumulative count reaches k, with k from the identical ceil tree.
    "q_conformal" -> """
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS q
        FROM events WHERE value IS NOT NULL),
      cells AS (SELECT g, q, COUNT(*)::BIGINT AS c FROM pts GROUP BY 1, 2),
      grp AS (SELECT g, SUM(c)::BIGINT AS n FROM cells GROUP BY g),
      cum AS (
        SELECT g, q, SUM(c) OVER (PARTITION BY g ORDER BY q) AS cum
        FROM cells),
      kk AS (
        SELECT g, n,
               LEAST(n, CEIL((1.0 - 0.1) * CAST(n + 1 AS DOUBLE))::BIGINT)
                 AS k
        FROM grp)
      SELECT c.g AS event_type, MAX(k.n) AS n, MAX(k.k) AS k,
             CAST(ROUND(MIN(c.q) / 1000000.0, 6) AS DOUBLE) AS qhat
      FROM cum c JOIN kk k ON c.g IS NOT DISTINCT FROM k.g
                          AND c.cum >= k.k
      GROUP BY c.g
      ORDER BY event_type""",

    // Same week bucketing as the q_acf day trick (604800 s), exact
    // HUGEINT bucket sums mirroring decimal(38,0), one z tree.
    "q_trend_test" -> """
      WITH base AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 604800 + 604800)
                   % 604800)) // 604800 AS s,
               CASE WHEN value > 100 THEN 1 ELSE 0 END AS y
        FROM events),
      cells AS (
        SELECT g, s, COUNT(*)::BIGINT AS n, SUM(y)::BIGINT AS p
        FROM base GROUP BY 1, 2),
      sums AS (
        SELECT g, SUM(n)::BIGINT AS n, SUM(p)::BIGINT AS n_pos,
               COUNT(*)::BIGINT AS n_buckets,
               SUM((s * p)::HUGEINT) AS t1, SUM((s * n)::HUGEINT) AS t2,
               SUM(s::HUGEINT * s * n) AS t3
        FROM cells GROUP BY g)
      SELECT g AS event_type, n, n_pos, n_buckets,
             CAST(CASE WHEN n_pos > 0 AND n_pos < n AND n_buckets > 1 THEN
               ROUND((CAST(t1 AS DOUBLE)
                   - CAST(t2 AS DOUBLE)
                     * (CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)))
                 / SQRT(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
                     * (1.0 - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(t3 AS DOUBLE)
                        - CAST(t2 AS DOUBLE) * CAST(t2 AS DOUBLE)
                          / CAST(n AS DOUBLE))), 6)
             END AS DOUBLE) AS z
      FROM sums
      ORDER BY event_type""",

    // Frozen [min,max] cells, prefix sums, the minimax PAV closed
    // form over (i, j, t) cell triples, interval rates 6-dp-rounded
    // BEFORE min/max selection.
    "q_isotonic" -> """
      WITH st AS (SELECT MIN(n_chars) AS lo, MAX(n_chars) AS hi
                  FROM documents),
      binned AS (
        SELECT source AS g,
               (CASE WHEN hi > lo
                  THEN LEAST(FLOOR((n_chars - lo) * 12 / (hi - lo)), 11)
                  ELSE 0 END)::BIGINT AS b,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents CROSS JOIN st
        WHERE n_chars IS NOT NULL),
      cells AS (
        SELECT g, b, COUNT(*)::BIGINT AS n, SUM(y)::BIGINT AS p
        FROM binned GROUP BY 1, 2),
      cp AS (
        SELECT g, b, n, p,
               ROW_NUMBER() OVER w AS t,
               SUM(n) OVER w AS cn, SUM(p) OVER w AS cpp
        FROM cells WINDOW w AS (PARTITION BY g ORDER BY b)),
      pairs AS (
        SELECT i.g, i.t AS i, j.t AS j,
               ROUND((j.cpp - (i.cpp - i.p))
                 / CAST(j.cn - (i.cn - i.n) AS DOUBLE), 6) AS avg
        FROM cp i JOIN cp j ON i.g IS NOT DISTINCT FROM j.g
                           AND i.t <= j.t),
      inner_ AS (
        SELECT p.g, t.t AS tt, p.i, MIN(p.avg) AS minj
        FROM pairs p JOIN cp t ON p.g IS NOT DISTINCT FROM t.g
                              AND p.i <= t.t AND p.j >= t.t
        GROUP BY 1, 2, 3),
      fit AS (SELECT g, tt, MAX(minj) AS rate_iso FROM inner_
              GROUP BY 1, 2)
      SELECT c.g AS source, c.b AS bin, c.n AS n, c.p AS n_pos,
             CAST(ROUND(c.p / CAST(c.n AS DOUBLE), 6) AS DOUBLE)
               AS rate_raw,
             CAST(f.rate_iso AS DOUBLE) AS rate_iso
      FROM cp c JOIN fit f ON c.g IS NOT DISTINCT FROM f.g
                          AND c.t = f.tt
      ORDER BY source, bin""",

    // Exact integer contingency marginals; each cell term is the same
    // (o·N − r·c)²/(N·r·c) double tree rounded at 12 dp into an exact
    // DECIMAL(38,12) sum (order-free on both engines), then one
    // rounded cast for chi2 and the same sqrt tree for V.
    "q_chi_squared" -> """
      WITH cells AS (
        SELECT lang AS a, source AS b, COUNT(*)::BIGINT AS o
        FROM documents GROUP BY 1, 2),
      rows_ AS (SELECT a, SUM(o)::BIGINT AS r FROM cells GROUP BY a),
      cols_ AS (SELECT b, SUM(o)::BIGINT AS c FROM cells GROUP BY b),
      tot AS (SELECT SUM(o)::HUGEINT AS n FROM cells),
      la AS (SELECT COUNT(*)::BIGINT AS ra FROM rows_),
      lb AS (SELECT COUNT(*)::BIGINT AS cb FROM cols_),
      terms AS (
        SELECT CAST(ce.o::HUGEINT * n - r.r::HUGEINT * c.c AS DOUBLE)
                 AS numd,
               CAST(n AS DOUBLE) * CAST(r.r AS DOUBLE)
                 * CAST(c.c AS DOUBLE) AS den
        FROM cells ce
        JOIN rows_ r ON ce.a IS NOT DISTINCT FROM r.a
        JOIN cols_ c ON ce.b IS NOT DISTINCT FROM c.b
        CROSS JOIN tot),
      s AS (SELECT SUM(ROUND(numd * numd / den, 12)::DECIMAL(38,12))
              AS chi FROM terms)
      SELECT CAST(n AS BIGINT) AS n, ra AS n_a_levels, cb AS n_b_levels,
             (ra - 1) * (cb - 1) AS dof,
             CAST(ROUND(CAST(chi AS DOUBLE), 6) AS DOUBLE) AS chi2,
             CAST(CASE WHEN ra - 1 > 0 AND cb - 1 > 0 THEN
               ROUND(SQRT(CAST(chi AS DOUBLE)
                 / (CAST(n AS DOUBLE)
                    * CAST(LEAST(ra - 1, cb - 1) AS DOUBLE))), 6)
             END AS DOUBLE) AS cramers_v
      FROM s CROSS JOIN tot CROSS JOIN la CROSS JOIN lb""",

    // Cent-scaled HUGEINT moment sums mirroring decimal(38,0); the
    // central-moment, g1/g2 and JB trees spelled exactly as the
    // operator's Column expressions (left-associative, same literals).
    "q_jarque_bera" -> """
      WITH pts AS (
        SELECT event_type AS g, CAST(ROUND(value * 100.0) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL),
      agg AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(x::HUGEINT) AS s1, SUM(x::HUGEINT * x) AS s2,
               SUM(x::HUGEINT * x * x) AS s3,
               SUM(x::HUGEINT * x * x * x) AS s4
        FROM pts GROUP BY g),
      m AS (
        SELECT g, n, CAST(n AS DOUBLE) AS nd,
               CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
               CAST(s2 AS DOUBLE) AS s2d, CAST(s3 AS DOUBLE) AS s3d,
               CAST(s4 AS DOUBLE) AS s4d
        FROM agg),
      c AS (
        SELECT g, n, nd,
               s2d / nd - mu * mu AS m2,
               s3d / nd - 3.0 * mu * (s2d / nd) + 2.0 * mu * mu * mu AS m3,
               s4d / nd - 4.0 * mu * (s3d / nd)
                 + 6.0 * mu * mu * (s2d / nd)
                 - 3.0 * mu * mu * mu * mu AS m4
        FROM m),
      gg AS (
        SELECT g, n, nd, m2,
               m3 / SQRT(m2 * m2 * m2) AS g1,
               m4 / (m2 * m2) - 3.0 AS g2
        FROM c)
      SELECT g AS event_type, n,
             CAST(CASE WHEN n >= 2 AND m2 > 0.0 THEN ROUND(g1, 6) END
               AS DOUBLE) AS skewness,
             CAST(CASE WHEN n >= 2 AND m2 > 0.0 THEN ROUND(g2, 6) END
               AS DOUBLE) AS kurtosis,
             CAST(CASE WHEN n >= 2 AND m2 > 0.0 THEN
               ROUND(nd / 6.0 * (g1 * g1 + g2 * g2 / 4.0), 6) END
               AS DOUBLE) AS jb
      FROM gg
      ORDER BY event_type""",

    // The q_ks_binned cell/grid/cumulative CTEs verbatim, plus the
    // per-bin total weight w; the statistic integrates w·num² in
    // HUGEINT and divides once.
    "q_cvm_binned" -> """
      WITH st AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
      cells AS (
        SELECT event_type AS g,
               (CASE WHEN value IS NOT NULL THEN
                  CASE WHEN hi > lo
                    THEN LEAST(FLOOR((value - lo) * 16 / (hi - lo)), 15)
                    ELSE 0 END
                END)::BIGINT AS q,
               COUNT(*) AS c
        FROM events CROSS JOIN st GROUP BY 1, 2),
      grps AS (SELECT g, SUM(c)::BIGINT AS ng FROM cells GROUP BY g),
      vals AS (SELECT DISTINCT q FROM cells),
      nn AS (SELECT SUM(c)::BIGINT AS n FROM cells),
      grid AS (
        SELECT gr.g, v.q, gr.ng, COALESCE(ce.c, 0)::BIGINT AS c
        FROM vals v CROSS JOIN grps gr
        LEFT JOIN cells ce ON ce.g IS NOT DISTINCT FROM gr.g
                          AND ce.q IS NOT DISTINCT FROM v.q),
      cum AS (
        SELECT g, q, ng, c,
               SUM(c) OVER (PARTITION BY g ORDER BY q NULLS FIRST) AS cg
        FROM grid),
      cum2 AS (
        SELECT g, q, ng, cg,
               SUM(cg) OVER (PARTITION BY q) AS call,
               SUM(c) OVER (PARTITION BY q) AS w
        FROM cum),
      numd AS (
        SELECT g, ng, w,
               (cg * (n - ng) - (call - cg) * ng)::HUGEINT AS num
        FROM cum2 CROSS JOIN nn)
      SELECT g AS event_type, MAX(ng) AS n_group,
             MAX(n) - MAX(ng) AS n_rest,
             CASE WHEN MAX(n) - MAX(ng) > 0 THEN
               CAST(ROUND(CAST(SUM(w::HUGEINT * num * num) AS DOUBLE)
                 / (CAST(MAX(n) AS DOUBLE) * CAST(MAX(n) AS DOUBLE)
                    * CAST(MAX(ng) AS DOUBLE)
                    * CAST(MAX(n) - MAX(ng) AS DOUBLE)), 6)
                 AS DOUBLE)
             END AS cvm
      FROM numd CROSS JOIN nn
      GROUP BY g
      ORDER BY event_type""",

    // The q_ks_binned battery feeding the asymptotic KS p (one
    // 9-dp-rounded EXP tree), then BH: (p, event_type) rank order,
    // the p·m ≤ rank·alpha compare (products only — no division),
    // integer step-up cutoff.
    // The q_fdr_bh battery through `withp`, then the Holm step-down
    // tail: first failing rank caps rejections; p_adj = running max of
    // 9-dp-frozen min(1, (m−rank+1)·p).
    "q_fdr_holm" -> """
      WITH st AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
      cells AS (
        SELECT event_type AS g,
               (CASE WHEN value IS NOT NULL THEN
                  CASE WHEN hi > lo
                    THEN LEAST(FLOOR((value - lo) * 16 / (hi - lo)), 15)
                    ELSE 0 END
                END)::BIGINT AS q,
               COUNT(*) AS c
        FROM events CROSS JOIN st GROUP BY 1, 2),
      grps AS (SELECT g, SUM(c)::BIGINT AS ng FROM cells GROUP BY g),
      vals AS (SELECT DISTINCT q FROM cells),
      nn AS (SELECT SUM(c)::BIGINT AS n FROM cells),
      grid AS (
        SELECT gr.g, v.q, gr.ng, COALESCE(ce.c, 0)::BIGINT AS c
        FROM vals v CROSS JOIN grps gr
        LEFT JOIN cells ce ON ce.g IS NOT DISTINCT FROM gr.g
                          AND ce.q IS NOT DISTINCT FROM v.q),
      cum AS (
        SELECT g, q, ng,
               SUM(c) OVER (PARTITION BY g ORDER BY q NULLS FIRST) AS cg
        FROM grid),
      cum2 AS (
        SELECT g, q, ng, cg,
               SUM(cg) OVER (PARTITION BY q) AS call
        FROM cum),
      kst AS (
        SELECT g AS event_type, MAX(ng) AS n_group,
               MAX(n) - MAX(ng) AS n_rest,
               CASE WHEN MAX(n) - MAX(ng) > 0 THEN
                 CAST(ROUND(MAX(ABS(cg * (n - ng) - (call - cg) * ng))
                   / CAST(MAX(ng) * (MAX(n) - MAX(ng)) AS DOUBLE), 6)
                   AS DOUBLE)
               END AS ks
        FROM cum2 CROSS JOIN nn
        GROUP BY g),
      withp AS (
        SELECT event_type, n_group, n_rest, ks,
               LEAST(1.0, ROUND(2.0 * EXP(-2.0 * ks * ks
                 * CAST(n_group AS DOUBLE) * CAST(n_rest AS DOUBLE)
                 / CAST(n_group + n_rest AS DOUBLE)), 9)) AS p
        FROM kst),
      ranked AS (
        SELECT event_type, n_group, n_rest, ks, p,
               ROW_NUMBER() OVER (ORDER BY p, event_type) AS rank,
               COUNT(*) OVER () AS m
        FROM withp),
      adj AS (
        SELECT *,
               MAX(ROUND(LEAST(1.0, p * (m - rank + 1)), 9))
                 OVER (ORDER BY rank) AS p_adj
        FROM ranked),
      kf AS (SELECT MIN(rank) AS kfail FROM ranked
             WHERE p * (m - rank + 1) > 0.1)
      SELECT event_type, n_group, n_rest, ks, p,
             rank::BIGINT AS rank, m::BIGINT AS m,
             CAST(p_adj AS DOUBLE) AS p_adj,
             rank < COALESCE(kfail, m + 1) AS significant
      FROM adj CROSS JOIN kf
      ORDER BY event_type""",

    // The q_fdr_holm battery CTEs with the reverse-running-min p_adj
    // and the step-UP max-qualifying-rank cutoff.
    "q_hochberg" -> """
      WITH st AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
      cells AS (
        SELECT event_type AS g,
               (CASE WHEN value IS NOT NULL THEN
                  CASE WHEN hi > lo
                    THEN LEAST(FLOOR((value - lo) * 16 / (hi - lo)), 15)
                    ELSE 0 END
                END)::BIGINT AS q,
               COUNT(*) AS c
        FROM events CROSS JOIN st GROUP BY 1, 2),
      grps AS (SELECT g, SUM(c)::BIGINT AS ng FROM cells GROUP BY g),
      vals AS (SELECT DISTINCT q FROM cells),
      nn AS (SELECT SUM(c)::BIGINT AS n FROM cells),
      grid AS (
        SELECT gr.g, v.q, gr.ng, COALESCE(ce.c, 0)::BIGINT AS c
        FROM vals v CROSS JOIN grps gr
        LEFT JOIN cells ce ON ce.g IS NOT DISTINCT FROM gr.g
                          AND ce.q IS NOT DISTINCT FROM v.q),
      cum AS (
        SELECT g, q, ng,
               SUM(c) OVER (PARTITION BY g ORDER BY q NULLS FIRST) AS cg
        FROM grid),
      cum2 AS (
        SELECT g, q, ng, cg,
               SUM(cg) OVER (PARTITION BY q) AS call
        FROM cum),
      kst AS (
        SELECT g AS event_type, MAX(ng) AS n_group,
               MAX(n) - MAX(ng) AS n_rest,
               CASE WHEN MAX(n) - MAX(ng) > 0 THEN
                 CAST(ROUND(MAX(ABS(cg * (n - ng) - (call - cg) * ng))
                   / CAST(MAX(ng) * (MAX(n) - MAX(ng)) AS DOUBLE), 6)
                   AS DOUBLE)
               END AS ks
        FROM cum2 CROSS JOIN nn
        GROUP BY g),
      withp AS (
        SELECT event_type, n_group, n_rest, ks,
               LEAST(1.0, ROUND(2.0 * EXP(-2.0 * ks * ks
                 * CAST(n_group AS DOUBLE) * CAST(n_rest AS DOUBLE)
                 / CAST(n_group + n_rest AS DOUBLE)), 9)) AS p
        FROM kst),
      ranked AS (
        SELECT event_type, n_group, n_rest, ks, p,
               ROW_NUMBER() OVER (ORDER BY p, event_type) AS rank,
               COUNT(*) OVER () AS m
        FROM withp),
      adj AS (
        SELECT *,
               MIN(ROUND(LEAST(1.0, p * (m - rank + 1)), 9))
                 OVER (ORDER BY rank
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                 AS p_adj
        FROM ranked),
      km AS (SELECT MAX(rank) AS kmax FROM ranked
             WHERE p * (m - rank + 1) <= 0.1)
      SELECT event_type, n_group, n_rest, ks, p,
             rank::BIGINT AS rank, m::BIGINT AS m,
             CAST(p_adj AS DOUBLE) AS p_adj,
             COALESCE(rank <= kmax, FALSE) AS significant
      FROM adj CROSS JOIN km
      ORDER BY event_type""",

    // The q_theil_sen cells + exact integer season-7 errors; two
    // exact-sum ratios.
    "q_forecast_bias" -> """
      WITH cells AS (
        SELECT event_type AS g,
               DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               SUM(CAST(ROUND(value * 100) AS BIGINT))::BIGINT AS y
        FROM events GROUP BY event_type, CAST(ts AS DATE)),
      pts AS (SELECT g, x,
                     CAST(ROUND(y * 1000000.0) AS BIGINT) AS yq
              FROM cells),
      wd AS (SELECT g, yq,
                    LAG(yq, 7) OVER (PARTITION BY g ORDER BY x) AS ys
             FROM pts),
      er AS (SELECT g, yq, yq - ys AS e FROM wd WHERE ys IS NOT NULL),
      agg AS (SELECT g, COUNT(*)::BIGINT AS n,
                     SUM(ABS(e)::HUGEINT) AS sae,
                     SUM(e::HUGEINT) AS se,
                     SUM(ABS(yq)::HUGEINT) AS say
              FROM er GROUP BY g)
      SELECT g AS event_type, n,
             CAST(CASE WHEN CAST(say AS DOUBLE) > 0.0 THEN
               ROUND(CAST(sae AS DOUBLE) / CAST(say AS DOUBLE), 6) END
               AS DOUBLE) AS wape,
             CAST(CASE WHEN CAST(say AS DOUBLE) > 0.0 THEN
               ROUND(CAST(se AS DOUBLE) / CAST(say AS DOUBLE), 6) END
               AS DOUBLE) AS bias
      FROM agg
      ORDER BY event_type""",

    // The q_theil_sen pairwise machinery with the PB exclusions and
    // the K-shifted lower median.
    "q_passing_bablok" -> """
      WITH cells AS (
        SELECT event_type AS g,
               ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6)))
                 AS DOUBLE) / COUNT(*), 6) AS x,
               ROUND(CAST(SUM(CAST(ROUND(ROUND(value, 0), 6)
                 AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS y
        FROM events GROUP BY event_type, CAST(ts AS DATE)),
      pairs AS (
        SELECT a.g, ROUND((b.y - a.y) / (b.x - a.x), 6) AS s
        FROM cells a JOIN cells b ON a.g = b.g AND a.x < b.x),
      fil AS (SELECT g, s FROM pairs WHERE s <> -1.0),
      smed AS (
        SELECT g, s,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY s) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS nq,
               SUM(CASE WHEN s < -1.0 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY g) AS k
        FROM fil),
      sm AS (SELECT g, MAX(nq)::BIGINT AS n_pairs,
                    MAX(k)::BIGINT AS k_neg,
                    MAX(CASE WHEN rn = (nq + 1) // 2 + k THEN s END)
                      AS slope
             FROM smed GROUP BY g),
      imed AS (
        SELECT c.g, ROUND(c.y - sm.slope * c.x, 6) AS i,
               ROW_NUMBER() OVER (PARTITION BY c.g
                 ORDER BY ROUND(c.y - sm.slope * c.x, 6)) AS rn,
               COUNT(*) OVER (PARTITION BY c.g) AS nq
        FROM cells c JOIN sm ON sm.g = c.g
        WHERE sm.slope IS NOT NULL),
      im AS (SELECT g, i AS intercept FROM imed WHERE rn = (nq + 1) // 2),
      base AS (SELECT g, COUNT(*)::BIGINT AS n FROM cells GROUP BY g)
      SELECT base.g AS event_type, base.n,
             COALESCE(sm.n_pairs, 0)::BIGINT AS n_pairs,
             COALESCE(sm.k_neg, 0)::BIGINT AS k_neg,
             CAST(sm.slope AS DOUBLE) AS slope,
             CAST(im.intercept AS DOUBLE) AS intercept
      FROM base LEFT JOIN sm ON sm.g = base.g
      LEFT JOIN im ON im.g = base.g
      ORDER BY base.g""",

    "q_fdr_bh" -> """
      WITH st AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
      cells AS (
        SELECT event_type AS g,
               (CASE WHEN value IS NOT NULL THEN
                  CASE WHEN hi > lo
                    THEN LEAST(FLOOR((value - lo) * 16 / (hi - lo)), 15)
                    ELSE 0 END
                END)::BIGINT AS q,
               COUNT(*) AS c
        FROM events CROSS JOIN st GROUP BY 1, 2),
      grps AS (SELECT g, SUM(c)::BIGINT AS ng FROM cells GROUP BY g),
      vals AS (SELECT DISTINCT q FROM cells),
      nn AS (SELECT SUM(c)::BIGINT AS n FROM cells),
      grid AS (
        SELECT gr.g, v.q, gr.ng, COALESCE(ce.c, 0)::BIGINT AS c
        FROM vals v CROSS JOIN grps gr
        LEFT JOIN cells ce ON ce.g IS NOT DISTINCT FROM gr.g
                          AND ce.q IS NOT DISTINCT FROM v.q),
      cum AS (
        SELECT g, q, ng,
               SUM(c) OVER (PARTITION BY g ORDER BY q NULLS FIRST) AS cg
        FROM grid),
      cum2 AS (
        SELECT g, q, ng, cg,
               SUM(cg) OVER (PARTITION BY q) AS call
        FROM cum),
      kst AS (
        SELECT g AS event_type, MAX(ng) AS n_group,
               MAX(n) - MAX(ng) AS n_rest,
               CASE WHEN MAX(n) - MAX(ng) > 0 THEN
                 CAST(ROUND(MAX(ABS(cg * (n - ng) - (call - cg) * ng))
                   / CAST(MAX(ng) * (MAX(n) - MAX(ng)) AS DOUBLE), 6)
                   AS DOUBLE)
               END AS ks
        FROM cum2 CROSS JOIN nn
        GROUP BY g),
      withp AS (
        SELECT event_type, n_group, n_rest, ks,
               LEAST(1.0, ROUND(2.0 * EXP(-2.0 * ks * ks
                 * CAST(n_group AS DOUBLE) * CAST(n_rest AS DOUBLE)
                 / CAST(n_group + n_rest AS DOUBLE)), 9)) AS p
        FROM kst),
      ranked AS (
        SELECT event_type, n_group, n_rest, ks, p,
               ROW_NUMBER() OVER (ORDER BY p, event_type) AS rank,
               COUNT(*) OVER () AS m
        FROM withp),
      km AS (SELECT MAX(rank) AS kmax FROM ranked
             WHERE p * m <= rank * 0.1)
      SELECT event_type, n_group, n_rest, ks, p,
             rank::BIGINT AS rank, m::BIGINT AS m,
             COALESCE(rank <= kmax, FALSE) AS significant
      FROM ranked CROSS JOIN km
      ORDER BY event_type""",

    // The q_fdr_bh battery verbatim with the BY harmonic deflation:
    // c(m) = Σ1/rank over the battery's own ranks, 12-dp frozen, and
    // the step-up compares p·m·c(m) against rank·α.
    "q_fdr_by" -> """
      WITH st AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
      cells AS (
        SELECT event_type AS g,
               (CASE WHEN value IS NOT NULL THEN
                  CASE WHEN hi > lo
                    THEN LEAST(FLOOR((value - lo) * 16 / (hi - lo)), 15)
                    ELSE 0 END
                END)::BIGINT AS q,
               COUNT(*) AS c
        FROM events CROSS JOIN st GROUP BY 1, 2),
      grps AS (SELECT g, SUM(c)::BIGINT AS ng FROM cells GROUP BY g),
      vals AS (SELECT DISTINCT q FROM cells),
      nn AS (SELECT SUM(c)::BIGINT AS n FROM cells),
      grid AS (
        SELECT gr.g, v.q, gr.ng, COALESCE(ce.c, 0)::BIGINT AS c
        FROM vals v CROSS JOIN grps gr
        LEFT JOIN cells ce ON ce.g IS NOT DISTINCT FROM gr.g
                          AND ce.q IS NOT DISTINCT FROM v.q),
      cum AS (
        SELECT g, q, ng,
               SUM(c) OVER (PARTITION BY g ORDER BY q NULLS FIRST) AS cg
        FROM grid),
      cum2 AS (
        SELECT g, q, ng, cg,
               SUM(cg) OVER (PARTITION BY q) AS call
        FROM cum),
      kst AS (
        SELECT g AS event_type, MAX(ng) AS n_group,
               MAX(n) - MAX(ng) AS n_rest,
               CASE WHEN MAX(n) - MAX(ng) > 0 THEN
                 CAST(ROUND(MAX(ABS(cg * (n - ng) - (call - cg) * ng))
                   / CAST(MAX(ng) * (MAX(n) - MAX(ng)) AS DOUBLE), 6)
                   AS DOUBLE)
               END AS ks
        FROM cum2 CROSS JOIN nn
        GROUP BY g),
      withp AS (
        SELECT event_type, n_group, n_rest, ks,
               LEAST(1.0, ROUND(2.0 * EXP(-2.0 * ks * ks
                 * CAST(n_group AS DOUBLE) * CAST(n_rest AS DOUBLE)
                 / CAST(n_group + n_rest AS DOUBLE)), 9)) AS p
        FROM kst),
      ranked AS (
        SELECT event_type, n_group, n_rest, ks, p,
               ROW_NUMBER() OVER (ORDER BY p, event_type) AS rank,
               COUNT(*) OVER () AS m
        FROM withp),
      rankedc AS (
        SELECT *, ROUND(SUM(1.0 / rank) OVER (), 12) AS cm FROM ranked),
      km AS (SELECT MAX(rank) AS kmax FROM rankedc
             WHERE p * CAST(m AS DOUBLE) * cm <= CAST(rank AS DOUBLE) * 0.1)
      SELECT event_type, n_group, n_rest, ks, p,
             rank::BIGINT AS rank, m::BIGINT AS m,
             CAST(cm AS DOUBLE) AS cm,
             COALESCE(rank <= kmax, FALSE) AS significant
      FROM rankedc CROSS JOIN km
      ORDER BY event_type""",

    // Exact integer power sums per segment, NB2 dispersion
    // (s²−x̄)/x̄² and variance ratio as identically-spelled double
    // trees; degenerate groups NULL.
    "q_negbin" -> """
      WITH cnt AS (SELECT o_custkey, COUNT(*)::BIGINT AS x
                   FROM orders GROUP BY o_custkey),
      tc AS (SELECT c.c_mktsegment AS g, cnt.x
             FROM cnt JOIN customer c ON c.c_custkey = cnt.o_custkey),
      agg AS (SELECT g, COUNT(*)::BIGINT AS n,
                     SUM(x)::HUGEINT AS s1,
                     SUM(x * x)::HUGEINT AS s2
              FROM tc GROUP BY g)
      SELECT g AS segment, n,
             CAST(ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS DOUBLE) AS mean,
             CAST(CASE WHEN n >= 2 THEN
               ROUND((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                   * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0), 6) END AS DOUBLE) AS variance,
             CAST(CASE WHEN n >= 2
                        AND CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) > 0.0
               THEN ROUND(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                     * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0)
                   - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 / ((CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))), 6)
               END AS DOUBLE) AS dispersion,
             CAST(CASE WHEN n >= 2
                        AND CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) > 0.0
               THEN ROUND(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                     * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0))
                 / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 6)
               END AS DOUBLE) AS var_ratio,
             CASE WHEN n >= 2
                   AND CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) > 0.0
               THEN (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                   * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0)
                 > CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
             END AS overdispersed
      FROM agg ORDER BY segment""",

    // Daily exact means, 12-dp-frozen OLS power sums, lag-1 residual
    // ρ̂, quasi-differenced second OLS, intercept rescaled by 1/(1−ρ̂)
    // — every tree spelled as the operator computes it.
    "q_cochrane_orcutt" -> """
      WITH daily AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6)))
                 AS DOUBLE) / COUNT(*), 6) AS y0
        FROM events GROUP BY 1, 2),
      mnd AS (SELECT g, MIN(d) AS d0 FROM daily GROUP BY g),
      pts AS (
        SELECT daily.g, d,
               ROUND(CAST(d - d0 AS DOUBLE), 6) AS x,
               ROUND(y0, 6) AS y
        FROM daily JOIN mnd ON mnd.g = daily.g),
      o1 AS (
        SELECT g, COUNT(*)::BIGINT AS n1,
               SUM(CAST(ROUND(x, 12) AS DECIMAL(38,12))) AS sx,
               SUM(CAST(ROUND(y, 12) AS DECIMAL(38,12))) AS sy,
               SUM(CAST(ROUND(x * x, 12) AS DECIMAL(38,12))) AS sxx,
               SUM(CAST(ROUND(x * y, 12) AS DECIMAL(38,12))) AS sxy
        FROM pts GROUP BY g),
      p1 AS (
        SELECT g, n1, sx, sy,
               CASE WHEN n1 >= 2
                     AND CAST(n1 AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
                 THEN ROUND((CAST(n1 AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n1 AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 12)
               END AS b1
        FROM o1),
      p2 AS (
        SELECT g, n1, b1,
               CASE WHEN b1 IS NOT NULL THEN
                 ROUND((CAST(sy AS DOUBLE) - b1 * CAST(sx AS DOUBLE))
                   / CAST(n1 AS DOUBLE), 12) END AS a1
        FROM p1),
      res AS (
        SELECT r.g, r.d, r.x, r.y,
               ROUND(r.y - (p.a1 + p.b1 * r.x), 12) AS e
        FROM pts r JOIN p2 p ON p.g = r.g),
      lagd AS (
        SELECT g, d, x, y, e,
               LAG(e) OVER w AS el,
               LAG(x) OVER w AS xl,
               LAG(y) OVER w AS yl
        FROM res WINDOW w AS (PARTITION BY g ORDER BY d)),
      rho AS (
        SELECT g,
               CASE WHEN CAST(SUM(CAST(ROUND(el * el, 12)
                   AS DECIMAL(38,12))) AS DOUBLE) > 0.0
                 THEN ROUND(CAST(SUM(CAST(ROUND(e * el, 12)
                     AS DECIMAL(38,12))) AS DOUBLE)
                   / CAST(SUM(CAST(ROUND(el * el, 12)
                     AS DECIMAL(38,12))) AS DOUBLE), 12) END AS rho
        FROM lagd WHERE el IS NOT NULL GROUP BY g),
      star AS (
        SELECT l.g, l.x - r.rho * l.xl AS xs, l.y - r.rho * l.yl AS ys
        FROM lagd l JOIN rho r ON r.g = l.g
        WHERE l.el IS NOT NULL AND r.rho IS NOT NULL),
      o2 AS (
        SELECT g, COUNT(*)::BIGINT AS n2,
               SUM(CAST(ROUND(xs, 12) AS DECIMAL(38,12))) AS sx,
               SUM(CAST(ROUND(ys, 12) AS DECIMAL(38,12))) AS sy,
               SUM(CAST(ROUND(xs * xs, 12) AS DECIMAL(38,12))) AS sxx,
               SUM(CAST(ROUND(xs * ys, 12) AS DECIMAL(38,12))) AS sxy
        FROM star GROUP BY g),
      q1 AS (
        SELECT g, n2, sx, sy,
               CASE WHEN n2 >= 2
                     AND CAST(n2 AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
                 THEN ROUND((CAST(n2 AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n2 AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 12)
               END AS b2
        FROM o2),
      q2 AS (
        SELECT g, b2,
               CASE WHEN b2 IS NOT NULL THEN
                 ROUND((CAST(sy AS DOUBLE) - b2 * CAST(sx AS DOUBLE))
                   / CAST(n2 AS DOUBLE), 12) END AS a2
        FROM q1)
      SELECT p2.g AS event_type, p2.n1 AS n,
             CAST(ROUND(p2.a1, 6) AS DOUBLE) AS alpha_ols,
             CAST(ROUND(p2.b1, 6) AS DOUBLE) AS beta_ols,
             CAST(ROUND(rho.rho, 6) AS DOUBLE) AS rho,
             CAST(CASE WHEN rho.rho IS NOT NULL AND rho.rho <> 1.0
               THEN ROUND(q2.a2 / (1.0 - rho.rho), 6) END AS DOUBLE)
               AS alpha_fgls,
             CAST(ROUND(q2.b2, 6) AS DOUBLE) AS beta_fgls
      FROM p2 LEFT JOIN rho ON rho.g = p2.g
      LEFT JOIN q2 ON q2.g = p2.g
      ORDER BY event_type""",

    // Daily exact means, full-run z from exact-decimal power sums,
    // the five Westgard rules as identical frozen-value window logic.
    "q_westgard" -> """
      WITH daily AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6)))
                 AS DOUBLE) / COUNT(*), 6) AS v0
        FROM events GROUP BY 1, 2),
      pts AS (SELECT g, d, ROUND(v0, 6) AS v FROM daily),
      st AS (SELECT g, COUNT(*)::BIGINT AS n,
                    SUM(CAST(v AS DECIMAL(38,6))) AS s1,
                    SUM(CAST(ROUND(v * v, 12) AS DECIMAL(38,12))) AS s2
             FROM pts GROUP BY g),
      wz AS (
        SELECT r.g, r.d, r.v,
               CASE WHEN st.n >= 2
                     AND (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                         * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                       / (CAST(n AS DOUBLE) - 1.0) > 0.0
                 THEN ROUND((r.v - ROUND(CAST(s1 AS DOUBLE)
                       / CAST(n AS DOUBLE), 6))
                   / ROUND(SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                         * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                       / (CAST(n AS DOUBLE) - 1.0)), 6), 6) END AS z
        FROM pts r JOIN st ON st.g = r.g),
      fl AS (
        SELECT g, d, v, z,
               LAG(z) OVER w AS z1,
               SUM(CASE WHEN z > 1.0 THEN 1 ELSE 0 END) OVER w4 AS p4,
               SUM(CASE WHEN z < -1.0 THEN 1 ELSE 0 END) OVER w4 AS n4,
               SUM(CASE WHEN z > 0.0 THEN 1 ELSE 0 END) OVER w10 AS p10,
               SUM(CASE WHEN z < 0.0 THEN 1 ELSE 0 END) OVER w10 AS n10,
               COUNT(z) OVER w4 AS c4,
               COUNT(z) OVER w10 AS c10
        FROM wz
        WINDOW w AS (PARTITION BY g ORDER BY d),
               w4 AS (PARTITION BY g ORDER BY d
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
               w10 AS (PARTITION BY g ORDER BY d
                       ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
      SELECT g AS event_type, d,
             CAST(v AS DOUBLE) AS value, CAST(z AS DOUBLE) AS z,
             COALESCE(ABS(z) > 3.0, FALSE) AS r_13s,
             COALESCE((z > 2.0 AND z1 > 2.0) OR (z < -2.0 AND z1 < -2.0),
               FALSE) AS r_22s,
             COALESCE((z > 2.0 AND z1 < -2.0) OR (z < -2.0 AND z1 > 2.0),
               FALSE) AS r_4s,
             (c4 = 4 AND (p4 = 4 OR n4 = 4)) AS r_41s,
             (c10 = 10 AND (p10 = 10 OR n10 = 10)) AS r_10x
      FROM fl ORDER BY event_type, d""",

    // The exact daily means, then the 6-dp-frozen Kalman recursion
    // (level, P, K) carried through a recursive CTE.
    "q_kalman" -> """
      WITH RECURSIVE daily AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6)))
                 AS DOUBLE) / COUNT(*), 6) AS v
        FROM events GROUP BY 1, 2),
      si AS (SELECT g, d, v,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY d) AS i
             FROM daily),
      rec AS (
        SELECT g, i, d, v, ROUND(v, 6) AS level,
               CAST(4.0 AS DOUBLE) AS p,
               CAST(NULL AS DOUBLE) AS k
        FROM si WHERE i = 1
        UNION ALL
        SELECT si.g, si.i, si.d, si.v,
               ROUND(r.level
                 + ROUND(ROUND(r.p + 0.5, 6)
                     / (ROUND(r.p + 0.5, 6) + 4.0), 6)
                   * (si.v - r.level), 6),
               ROUND((1.0 - ROUND(ROUND(r.p + 0.5, 6)
                     / (ROUND(r.p + 0.5, 6) + 4.0), 6))
                 * ROUND(r.p + 0.5, 6), 6),
               ROUND(ROUND(r.p + 0.5, 6)
                 / (ROUND(r.p + 0.5, 6) + 4.0), 6)
        FROM rec r JOIN si ON si.g = r.g AND si.i = r.i + 1)
      SELECT g AS event_type, d, CAST(v AS DOUBLE) AS v,
             CAST(level AS DOUBLE) AS level, CAST(k AS DOUBLE) AS gain
      FROM rec
      ORDER BY event_type, d""",

    // Matched-model basket between the mod-2 halves: exact unit
    // prices (decimal mean, 6 dp), exact quantities, 12-dp frozen
    // p·q folds, three rounded index trees.
    "q_price_index" -> """
      WITH li AS (
        SELECT l_partkey AS i, (l_orderkey % 2)::INT AS p,
               CAST(ROUND(l_extendedprice / l_quantity, 6)
                 AS DECIMAL(38,6)) AS pr,
               CAST(l_quantity AS BIGINT) AS q
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
      cells AS (
        SELECT i, p,
               ROUND(CAST(SUM(pr) AS DOUBLE) / COUNT(*), 6) AS price,
               SUM(q)::BIGINT AS qty
        FROM li GROUP BY i, p),
      j AS (
        SELECT a.i, a.price AS p0, a.qty AS q0, b.price AS p1,
               b.qty AS q1
        FROM (SELECT * FROM cells WHERE p = 0) a
        JOIN (SELECT * FROM cells WHERE p = 1) b ON b.i = a.i),
      agg AS (
        SELECT COUNT(*)::BIGINT AS n_items,
               SUM(CAST(ROUND(p1 * CAST(q0 AS DOUBLE), 12)
                 AS DECIMAL(38,12))) AS l1,
               SUM(CAST(ROUND(p0 * CAST(q0 AS DOUBLE), 12)
                 AS DECIMAL(38,12))) AS l0,
               SUM(CAST(ROUND(p1 * CAST(q1 AS DOUBLE), 12)
                 AS DECIMAL(38,12))) AS pa1,
               SUM(CAST(ROUND(p0 * CAST(q1 AS DOUBLE), 12)
                 AS DECIMAL(38,12))) AS pa0
        FROM j)
      SELECT n_items,
             CAST(CASE WHEN CAST(l0 AS DOUBLE) > 0.0 THEN
               ROUND(CAST(l1 AS DOUBLE) / CAST(l0 AS DOUBLE), 6) END
               AS DOUBLE) AS laspeyres,
             CAST(CASE WHEN CAST(pa0 AS DOUBLE) > 0.0 THEN
               ROUND(CAST(pa1 AS DOUBLE) / CAST(pa0 AS DOUBLE), 6) END
               AS DOUBLE) AS paasche,
             CAST(CASE WHEN CAST(l0 AS DOUBLE) > 0.0
                        AND CAST(pa0 AS DOUBLE) > 0.0 THEN
               ROUND(SQRT(CAST(l1 AS DOUBLE) / CAST(l0 AS DOUBLE)
                 * (CAST(pa1 AS DOUBLE) / CAST(pa0 AS DOUBLE))), 6) END
               AS DOUBLE) AS fisher
      FROM agg""",

    // The q_mann_kendall machinery restricted to same-season (epoch
    // day mod 7) pairs; per-season tie-corrected variance numerators
    // summed exactly, one /18 and the continuity-corrected z.
    "q_mk_seasonal" -> """
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      sc AS (SELECT g, day, x,
                    ((day % 7) + 7) % 7 AS s
             FROM cells),
      st AS (
        SELECT a.g, SUM(CASE WHEN b.x > a.x THEN 1
                             WHEN b.x < a.x THEN -1 ELSE 0 END)
                 ::HUGEINT AS sstat
        FROM sc a JOIN sc b
          ON a.g IS NOT DISTINCT FROM b.g AND a.s = b.s
         AND a.day < b.day
        GROUP BY a.g),
      ns AS (SELECT g, s, COUNT(*)::BIGINT AS n FROM sc GROUP BY g, s),
      ties AS (
        SELECT g, s, SUM(t::HUGEINT * (t - 1) * (t * 2 + 5)) AS tt
        FROM (SELECT g, s, x, COUNT(*)::BIGINT AS t
              FROM sc GROUP BY g, s, x)
        GROUP BY g, s),
      vt AS (
        SELECT ns.g,
               SUM(ns.n::HUGEINT * (ns.n - 1) * (ns.n * 2 + 5)
                 - COALESCE(ties.tt, 0)) AS vn,
               COUNT(*)::BIGINT AS nseason
        FROM ns LEFT JOIN ties
          ON ties.g IS NOT DISTINCT FROM ns.g AND ties.s = ns.s
        GROUP BY ns.g),
      nt AS (SELECT g, COUNT(*)::BIGINT AS n FROM sc GROUP BY g)
      SELECT nt.g AS event_type, nt.n AS n_days, vt.nseason AS n_seasons,
             CAST(COALESCE(st.sstat, 0) AS BIGINT) AS s,
             CAST(ROUND(CAST(vt.vn AS DOUBLE) / 18.0, 6) AS DOUBLE)
               AS var_s,
             CAST(CASE WHEN CAST(vt.vn AS DOUBLE) / 18.0 > 0.0 THEN
               CASE WHEN st.sstat > 0 THEN
                      ROUND((CAST(st.sstat AS DOUBLE) - 1.0)
                        / SQRT(CAST(vt.vn AS DOUBLE) / 18.0), 6)
                    WHEN st.sstat < 0 THEN
                      ROUND((CAST(st.sstat AS DOUBLE) + 1.0)
                        / SQRT(CAST(vt.vn AS DOUBLE) / 18.0), 6)
                    ELSE 0.0 END END AS DOUBLE) AS z
      FROM nt LEFT JOIN st ON st.g IS NOT DISTINCT FROM nt.g
      LEFT JOIN vt ON vt.g IS NOT DISTINCT FROM nt.g
      ORDER BY event_type""",

    // The q_ols_multi3 quantized Cramer machinery fitted on the
    // pre-window, 6-dp coefficients projected over the whole series;
    // gap = actual - synthetic, both from the same unrounded tree.
    "q_synth_control" -> """
      WITH daily AS (
        SELECT event_type AS u, CAST(ts AS DATE) AS d,
               ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6)))
                 AS DOUBLE) / COUNT(*), 6) AS v
        FROM events GROUP BY 1, 2),
      wide AS (
        SELECT y.d, y.v AS y, d1.v AS x1, d2.v AS x2, d3.v AS x3
        FROM (SELECT d, v FROM daily WHERE u = 'purchase') y
        JOIN (SELECT d, v FROM daily WHERE u = 'click') d1 ON d1.d = y.d
        JOIN (SELECT d, v FROM daily WHERE u = 'signup') d2 ON d2.d = y.d
        JOIN (SELECT d, v FROM daily WHERE u = 'view') d3 ON d3.d = y.d),
      pts AS (
        SELECT CAST(ROUND(x1 * 1000000.0) AS BIGINT) AS x1,
               CAST(ROUND(x2 * 1000000.0) AS BIGINT) AS x2,
               CAST(ROUND(x3 * 1000000.0) AS BIGINT) AS x3,
               CAST(ROUND(y * 1000000.0) AS BIGINT) AS y
        FROM wide WHERE d < DATE '2024-01-16'),
      s AS (
        SELECT COUNT(*)::BIGINT AS n,
               SUM(x1::HUGEINT) AS s1, SUM(x2::HUGEINT) AS s2,
               SUM(x3::HUGEINT) AS s3, SUM(y::HUGEINT) AS sy,
               SUM(x1::HUGEINT * x1) AS q11, SUM(x2::HUGEINT * x2) AS q22,
               SUM(x3::HUGEINT * x3) AS q33, SUM(x1::HUGEINT * x2) AS q12,
               SUM(x1::HUGEINT * x3) AS q13, SUM(x2::HUGEINT * x3) AS q23,
               SUM(x1::HUGEINT * y) AS q1y, SUM(x2::HUGEINT * y) AS q2y,
               SUM(x3::HUGEINT * y) AS q3y
        FROM pts),
      fl AS (
        SELECT n, CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
               CAST(s3 AS DOUBLE) AS s3d, CAST(sy AS DOUBLE) AS syd,
               CAST(n AS DOUBLE) * CAST(q11 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS s11,
               CAST(n AS DOUBLE) * CAST(q22 AS DOUBLE)
                 - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS s22,
               CAST(n AS DOUBLE) * CAST(q33 AS DOUBLE)
                 - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE) AS s33,
               CAST(n AS DOUBLE) * CAST(q12 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS s12,
               CAST(n AS DOUBLE) * CAST(q13 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE) AS s13,
               CAST(n AS DOUBLE) * CAST(q23 AS DOUBLE)
                 - CAST(s2 AS DOUBLE) * CAST(s3 AS DOUBLE) AS s23,
               CAST(n AS DOUBLE) * CAST(q1y AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) AS s1y,
               CAST(n AS DOUBLE) * CAST(q2y AS DOUBLE)
                 - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) AS s2y,
               CAST(n AS DOUBLE) * CAST(q3y AS DOUBLE)
                 - CAST(s3 AS DOUBLE) * CAST(sy AS DOUBLE) AS s3y
        FROM s),
      g1 AS (
        SELECT *,
               s11 * (s22 * s33 - s23 * s23)
                 - s12 * (s12 * s33 - s23 * s13)
                 + s13 * (s12 * s23 - s22 * s13) AS det,
               s1y * (s22 * s33 - s23 * s23)
                 - s12 * (s2y * s33 - s23 * s3y)
                 + s13 * (s2y * s23 - s22 * s3y) AS det1,
               s11 * (s2y * s33 - s23 * s3y)
                 - s1y * (s12 * s33 - s23 * s13)
                 + s13 * (s12 * s3y - s2y * s13) AS det2,
               s11 * (s22 * s3y - s2y * s23)
                 - s12 * (s12 * s3y - s2y * s13)
                 + s1y * (s12 * s23 - s22 * s13) AS det3
        FROM fl),
      g2 AS (
        SELECT *, det1 / det AS b1r, det2 / det AS b2r, det3 / det AS b3r
        FROM g1),
      coefs AS (
        SELECT CASE WHEN n >= 5 AND det > 0.0 THEN
                 ROUND((syd - b1r * s1d - b2r * s2d - b3r * s3d)
                   / CAST(n AS DOUBLE) / 1000000.0, 6) END AS b0,
               CASE WHEN n >= 5 AND det > 0.0 THEN ROUND(b1r, 6) END AS b1,
               CASE WHEN n >= 5 AND det > 0.0 THEN ROUND(b2r, 6) END AS b2,
               CASE WHEN n >= 5 AND det > 0.0 THEN ROUND(b3r, 6) END AS b3
        FROM g2)
      SELECT w.d AS d,
             CAST(ROUND(w.y, 6) AS DOUBLE) AS actual,
             CAST(ROUND(c.b0 + c.b1 * w.x1 + c.b2 * w.x2 + c.b3 * w.x3,
               6) AS DOUBLE) AS synthetic,
             CAST(ROUND(w.y - (c.b0 + c.b1 * w.x1 + c.b2 * w.x2
               + c.b3 * w.x3), 6) AS DOUBLE) AS gap,
             (w.d >= DATE '2024-01-16') AS post
      FROM wide w CROSS JOIN coefs c
      ORDER BY d""",

    // Exact 2x2 cells per brand vs rest; PRR/ROR/CI as
    // identically-spelled trees with the interpolated z constant.
    "q_prr" -> s"""
      WITH li AS (
        SELECT p.p_brand AS i,
               CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS f
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      cells AS (SELECT i, COUNT(*)::BIGINT AS n, SUM(f)::BIGINT AS a
                FROM li GROUP BY i),
      tot AS (SELECT SUM(n)::BIGINT AS tn, SUM(a)::BIGINT AS ta
              FROM cells)
      SELECT i AS p_brand, n, a AS n_flagged,
             CAST(CASE WHEN ok THEN ROUND(prr, 6) END AS DOUBLE) AS prr,
             CAST(CASE WHEN ok THEN ROUND(ad / (bd * cd), 6) END
               AS DOUBLE) AS ror,
             CAST(CASE WHEN ok THEN
               ROUND(EXP(LN(prr) - ${Stats.MdeZ(("alpha", 0.05))} * se), 6)
             END AS DOUBLE) AS prr_lo,
             CAST(CASE WHEN ok THEN
               ROUND(EXP(LN(prr) + ${Stats.MdeZ(("alpha", 0.05))} * se), 6)
             END AS DOUBLE) AS prr_hi
      FROM (
        SELECT i, n, a,
               (CAST(a AS DOUBLE) / (CAST(a AS DOUBLE)
                   + CAST(n - a AS DOUBLE)))
                 / (CAST(ta - a AS DOUBLE) / (CAST(ta - a AS DOUBLE)
                   + CAST(tn - n - (ta - a) AS DOUBLE))) AS prr,
               CAST(a AS DOUBLE) * CAST(tn - n - (ta - a) AS DOUBLE)
                 AS ad,
               CAST(n - a AS DOUBLE) AS bd,
               CAST(ta - a AS DOUBLE) AS cd,
               SQRT(1.0 / CAST(a AS DOUBLE)
                 - 1.0 / (CAST(a AS DOUBLE) + CAST(n - a AS DOUBLE))
                 + 1.0 / CAST(ta - a AS DOUBLE)
                 - 1.0 / (CAST(ta - a AS DOUBLE)
                   + CAST(tn - n - (ta - a) AS DOUBLE))) AS se,
               (a > 0 AND n - a > 0 AND ta - a > 0
                 AND tn - n - (ta - a) > 0) AS ok
        FROM cells CROSS JOIN tot)
      ORDER BY p_brand""",

    // The q_acf CTEs verbatim; the 6-dp acf values are exact 1e-6
    // multiples, so their sum is an exact scaled long, and ESS is one
    // identically-spelled rounded division.
    "q_ess" -> """
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      st AS (SELECT g, COUNT(*)::HUGEINT AS n, SUM(x)::HUGEINT AS s
             FROM cells GROUP BY g),
      a AS (SELECT c.g, c.day, st.n * c.x - st.s AS aa
            FROM cells c JOIN st ON c.g = st.g),
      lagged AS (
        SELECT g, aa,
               LEAD(aa, 1) OVER w AS l1,
               LEAD(aa, 2) OVER w AS l2,
               LEAD(aa, 3) OVER w AS l3
        FROM a WINDOW w AS (PARTITION BY g ORDER BY day)),
      agg AS (
        SELECT g, COUNT(*)::BIGINT AS n_days, SUM(aa * aa) AS d,
               SUM(aa * l1) AS n1, SUM(aa * l2) AS n2, SUM(aa * l3) AS n3
        FROM lagged GROUP BY g),
      acfs AS (
        SELECT g, n_days,
               CAST(CASE WHEN d <> 0 THEN
                 ROUND(CAST(nk AS DOUBLE) / CAST(d AS DOUBLE), 6)
               END AS DOUBLE) AS acf
        FROM (
          SELECT g, n1 AS nk, d, n_days FROM agg
          UNION ALL SELECT g, n2, d, n_days FROM agg
          UNION ALL SELECT g, n3, d, n_days FROM agg)),
      s AS (
        SELECT g, MAX(n_days) AS n_days,
               SUM(CAST(ROUND(acf * 1000000.0) AS BIGINT)) AS sq,
               COUNT(acf) AS nk, COUNT(*) AS k
        FROM acfs GROUP BY g),
      fin AS (
        SELECT g, n_days,
               CAST(CASE WHEN nk = k THEN ROUND(sq / 1000000.0, 6) END
                 AS DOUBLE) AS acf_sum
        FROM s)
      SELECT g AS event_type, n_days, acf_sum,
             CAST(CASE WHEN acf_sum IS NOT NULL
                    AND 1.0 + 2.0 * acf_sum > 0.0 THEN
               ROUND(CAST(n_days AS DOUBLE) / (1.0 + 2.0 * acf_sum), 6)
             END AS DOUBLE) AS ess
      FROM fin
      ORDER BY event_type""",

    // Same scaled-long quantization, the same lower-median ranks
    // ((n+1) // 2) for median and MAD, and the same integer
    // cross-multiplied outlier rule — no float enters any decision.
    // The q_robust_outliers median/MAD CTEs seed μ0 and the frozen
    // scale; two unrolled IRLS passes with 12-dp weights and 6-dp
    // weighted values in decimal sums.
    "q_huber" -> """
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL),
      r1 AS (
        SELECT g, x,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY x) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS n
        FROM pts),
      m1 AS (
        SELECT g, x, n,
               MAX(CASE WHEN rn = (n + 1) // 2 THEN x END)
                 OVER (PARTITION BY g) AS med
        FROM r1),
      a1 AS (SELECT g, x, n, med, ABS(x - med) AS ad0 FROM m1),
      r2 AS (
        SELECT g, x, n, med, ad0,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY ad0) AS rna
        FROM a1),
      m2 AS (
        SELECT g, x, n, med,
               MAX(CASE WHEN rna = (n + 1) // 2 THEN ad0 END)
                 OVER (PARTITION BY g) AS mad
        FROM r2),
      p0 AS (SELECT g, CAST(MAX(med) AS DOUBLE) AS m FROM m2 GROUP BY g),
      i1 AS (
        SELECT m2.g, x, mad, m,
               CAST(mad AS DOUBLE) * (1.4826 * 1.345) AS ks,
               ABS(CAST(x AS DOUBLE) - m) AS ad
        FROM m2 JOIN p0 ON p0.g = m2.g),
      w1 AS (
        SELECT g, x, mad, m,
               ROUND(CASE WHEN ad <= ks THEN 1.0 ELSE ks / ad END, 12)
                 AS w
        FROM i1),
      t1 AS (
        SELECT g, MAX(m) AS mp,
               SUM(CAST(w AS DECIMAL(38,12))) AS sw,
               SUM(CAST(ROUND(w * x, 6) AS DECIMAL(38,6))) AS swx
        FROM w1 GROUP BY g),
      p1 AS (
        SELECT g, CASE WHEN CAST(sw AS DOUBLE) > 0.0 THEN
            ROUND(CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE), 6)
          ELSE mp END AS m
        FROM t1),
      i2 AS (
        SELECT m2.g, x, mad, m,
               CAST(mad AS DOUBLE) * (1.4826 * 1.345) AS ks,
               ABS(CAST(x AS DOUBLE) - m) AS ad
        FROM m2 JOIN p1 ON p1.g = m2.g),
      w2 AS (
        SELECT g, x, mad, m,
               ROUND(CASE WHEN ad <= ks THEN 1.0 ELSE ks / ad END, 12)
                 AS w
        FROM i2),
      t2 AS (
        SELECT g, MAX(m) AS mp,
               SUM(CAST(w AS DECIMAL(38,12))) AS sw,
               SUM(CAST(ROUND(w * x, 6) AS DECIMAL(38,6))) AS swx
        FROM w2 GROUP BY g),
      p2 AS (
        SELECT g, CASE WHEN CAST(sw AS DOUBLE) > 0.0 THEN
            ROUND(CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE), 6)
          ELSE mp END AS m
        FROM t2),
      agg AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               CAST(ROUND(MAX(med) / 1000000.0, 6) AS DOUBLE) AS median,
               CAST(ROUND(MAX(mad) / 1000000.0, 6) AS DOUBLE) AS mad
        FROM m2 GROUP BY g)
      SELECT agg.g AS event_type, n, median, mad,
             CAST(ROUND(p2.m / 1000000.0, 6) AS DOUBLE) AS huber_mean
      FROM agg JOIN p2 ON p2.g = agg.g
      ORDER BY event_type""",

    "q_robust_outliers" -> """
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL),
      r1 AS (
        SELECT g, x,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY x) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS n
        FROM pts),
      m1 AS (
        SELECT g, x, n,
               MAX(CASE WHEN rn = (n + 1) // 2 THEN x END)
                 OVER (PARTITION BY g) AS med
        FROM r1),
      a1 AS (SELECT g, n, med, ABS(x - med) AS ad FROM m1),
      r2 AS (
        SELECT g, n, med, ad,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY ad) AS rna
        FROM a1),
      m2 AS (
        SELECT g, n, med, ad,
               MAX(CASE WHEN rna = (n + 1) // 2 THEN ad END)
                 OVER (PARTITION BY g) AS mad
        FROM r2),
      agg AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               CAST(ROUND(MAX(med) / 1000000.0, 6) AS DOUBLE) AS median,
               CAST(ROUND(MAX(mad) / 1000000.0, 6) AS DOUBLE) AS mad,
               SUM(CASE WHEN mad > 0 AND ad * 6745 > mad * 35000
                    THEN 1 ELSE 0 END)::BIGINT AS n_outliers
        FROM m2 GROUP BY g)
      SELECT g AS event_type, n, median, mad, n_outliers,
             CAST(CASE WHEN mad > 0.0 THEN
               ROUND(n_outliers / CAST(n AS DOUBLE), 6) END AS DOUBLE)
               AS outlier_rate
      FROM agg
      ORDER BY event_type""",

    // Same doubled-average-rank integers (D = 2·C + E + 1), HUGEINT
    // tie cubes mirroring decimal(38,0), and the identically-spelled
    // tie-corrected z tree (coefficients cast to DOUBLE).
    // Integer pair concordance with tie correction; scaling cancels
    // out of every comparison, so the oracle compares raw values.
    // The q_anova moment fold + the two effect-size ratios.
    "q_anova_effect" -> """
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL),
      byg AS (
        SELECT g, COUNT(*)::BIGINT AS ng, SUM(x::HUGEINT) AS s1,
               SUM(x::HUGEINT * x) AS q1
        FROM pts GROUP BY g),
      agg AS (
        SELECT SUM(ng)::BIGINT AS n, COUNT(*)::BIGINT AS k,
               CAST(SUM(s1) AS DOUBLE) AS s, CAST(SUM(q1) AS DOUBLE) AS q,
               CAST(SUM(CAST(ROUND(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                 / ng, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sb
        FROM byg),
      d AS (SELECT n, k, sb - s * s / CAST(n AS DOUBLE) AS ssb,
                   q - sb AS ssw FROM agg),
      e AS (SELECT n, k, ssb, ssw, ssb + ssw AS sst,
                   ssw / CAST(n - k AS DOUBLE) AS msw FROM d)
      SELECT n, k,
             CAST(CASE WHEN k >= 2 AND n > k AND sst > 0.0
               THEN ROUND(ssb / sst, 6) END AS DOUBLE) AS eta2,
             CAST(CASE WHEN k >= 2 AND n > k AND sst > 0.0 AND ssw > 0.0
               THEN ROUND(GREATEST(0.0,
                 (ssb - CAST(k - 1 AS DOUBLE) * msw) / (sst + msw)), 6)
               END AS DOUBLE) AS omega2
      FROM e""",

    // q_kaplan_meier's frozen survival steps, exact segment widths,
    // decimal area fold + the tau tail.
    "q_rmst" -> """
      WITH subj AS (
        SELECT user_id,
               DATE_DIFF('day', MIN(CAST(ts AS DATE)),
                 COALESCE(MIN(CASE WHEN event_type = 'purchase'
                                THEN CAST(ts AS DATE) END),
                          MAX(CAST(ts AS DATE)))) AS duration,
               MIN(CASE WHEN event_type = 'purchase'
                     THEN CAST(ts AS DATE) END) IS NOT NULL AS observed
        FROM events GROUP BY user_id),
      cells AS (
        SELECT duration,
               SUM(CASE WHEN observed THEN 1 ELSE 0 END)::BIGINT
                 AS n_events,
               SUM(CASE WHEN observed THEN 0 ELSE 1 END)::BIGINT
                 AS n_censored
        FROM subj GROUP BY duration),
      km AS (
        SELECT duration, n_events, n_censored,
               ((SELECT SUM(n_events + n_censored) FROM cells)
                 - COALESCE(SUM(n_events + n_censored) OVER
                     (ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), 0))::BIGINT AS n_at_risk
        FROM cells),
      km2 AS (
        SELECT duration, n_events, n_at_risk,
               SUM(CASE WHEN n_events < n_at_risk
                    THEN LN(1.0 - n_events / CAST(n_at_risk AS DOUBLE))
                    ELSE 0.0 END) OVER (ORDER BY duration) AS lnsum,
               MAX(CASE WHEN n_events = n_at_risk THEN 1 ELSE 0 END)
                 OVER (ORDER BY duration) AS hitzero
        FROM km),
      curve AS (
        SELECT duration,
               CAST(CASE WHEN hitzero = 1 THEN 0.0
                    ELSE ROUND(EXP(lnsum), 6) END AS DOUBLE) AS survival
        FROM km2 WHERE n_events > 0),
      win AS (SELECT duration, survival FROM curve WHERE duration <= 10),
      stepped AS (
        SELECT duration, survival,
               COALESCE(LAG(survival) OVER (ORDER BY duration), 1.0)
                 AS sprev,
               COALESCE(LAG(duration) OVER (ORDER BY duration), 0)
                 AS tprev,
               MAX(duration) OVER () AS lastd
        FROM win),
      terms AS (
        SELECT CAST(ROUND(sprev * (duration - tprev), 12)
                 AS DECIMAL(38,12)) AS seg,
               CAST(CASE WHEN duration = lastd
                 THEN ROUND(survival * (10 - duration), 12)
                 ELSE 0.0 END AS DECIMAL(38,12)) AS tail
        FROM stepped)
      SELECT COUNT(*)::BIGINT AS n_events_used,
             CAST(COALESCE(ROUND(CAST(SUM(seg) AS DOUBLE)
               + CAST(SUM(tail) AS DOUBLE), 6), 10.0) AS DOUBLE) AS rmst,
             10::BIGINT AS tau
      FROM terms""",

    // Per-group equi-width cells, one cumulative window, the identical
    // three cost trees, (gain DESC, edge) argmax, degenerate NULLs.
    "q_breakpoint" -> """
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(CAST(DATEDIFF('day', DATE '2024-01-01',
                 CAST(ts AS DATE)) AS DOUBLE) * 1000000.0) AS BIGINT) AS x,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS y
        FROM events WHERE value IS NOT NULL),
      edges AS (SELECT g, MIN(x) AS lo, MAX(x) AS hi,
                       COUNT(*)::BIGINT AS ng
                FROM pts GROUP BY g),
      cells AS (
        SELECT g, q, COUNT(*)::BIGINT AS n, SUM(x::HUGEINT) AS sx,
               SUM(y::HUGEINT) AS sy, SUM(x::HUGEINT * x) AS sxx,
               SUM(y::HUGEINT * y) AS syy, SUM(x::HUGEINT * y) AS sxy
        FROM (SELECT p.g,
                (CASE WHEN e.hi > e.lo
                   THEN LEAST(FLOOR(CAST(p.x - e.lo AS DOUBLE) * 16
                     / CAST(e.hi - e.lo AS DOUBLE)), 15)
                   ELSE 0 END)::BIGINT AS q, x, y
              FROM pts p JOIN edges e USING (g))
        GROUP BY g, q),
      cums AS (
        SELECT g, q,
               SUM(n) OVER wc AS nl, SUM(sx) OVER wc AS sxl,
               SUM(sy) OVER wc AS syl, SUM(sxx) OVER wc AS sxxl,
               SUM(syy) OVER wc AS syyl, SUM(sxy) OVER wc AS sxyl,
               SUM(n) OVER wa AS nt, SUM(sx) OVER wa AS sxt,
               SUM(sy) OVER wa AS syt, SUM(sxx) OVER wa AS sxxt,
               SUM(syy) OVER wa AS syyt, SUM(sxy) OVER wa AS sxyt
        FROM cells
        WINDOW wc AS (PARTITION BY g ORDER BY q
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wa AS (PARTITION BY g)),
      cen AS (
        SELECT g, q, nl, nt,
               CAST(nl AS DOUBLE) * CAST(sxxl AS DOUBLE)
                 - CAST(sxl AS DOUBLE) * CAST(sxl AS DOUBLE) AS cxxl,
               CAST(nl AS DOUBLE) * CAST(syyl AS DOUBLE)
                 - CAST(syl AS DOUBLE) * CAST(syl AS DOUBLE) AS cyyl,
               CAST(nl AS DOUBLE) * CAST(sxyl AS DOUBLE)
                 - CAST(sxl AS DOUBLE) * CAST(syl AS DOUBLE) AS cxyl,
               CAST(nt - nl AS DOUBLE) * CAST(sxxt - sxxl AS DOUBLE)
                 - CAST(sxt - sxl AS DOUBLE) * CAST(sxt - sxl AS DOUBLE)
                 AS cxxr,
               CAST(nt - nl AS DOUBLE) * CAST(syyt - syyl AS DOUBLE)
                 - CAST(syt - syl AS DOUBLE) * CAST(syt - syl AS DOUBLE)
                 AS cyyr,
               CAST(nt - nl AS DOUBLE) * CAST(sxyt - sxyl AS DOUBLE)
                 - CAST(sxt - sxl AS DOUBLE) * CAST(syt - syl AS DOUBLE)
                 AS cxyr,
               CAST(nt AS DOUBLE) * CAST(sxxt AS DOUBLE)
                 - CAST(sxt AS DOUBLE) * CAST(sxt AS DOUBLE) AS cxxt,
               CAST(nt AS DOUBLE) * CAST(syyt AS DOUBLE)
                 - CAST(syt AS DOUBLE) * CAST(syt AS DOUBLE) AS cyyt,
               CAST(nt AS DOUBLE) * CAST(sxyt AS DOUBLE)
                 - CAST(sxt AS DOUBLE) * CAST(syt AS DOUBLE) AS cxyt
        FROM cums),
      costs AS (
        SELECT g, q, nl, nt,
               CASE WHEN nl >= 2 AND cxxl > 0.0
                 THEN (cyyl - cxyl * cxyl / cxxl)
                   / (CAST(nl AS DOUBLE) * CAST(nl AS DOUBLE))
                 WHEN nl >= 1
                 THEN cyyl / (CAST(nl AS DOUBLE) * CAST(nl AS DOUBLE))
                 ELSE 0.0 END AS cl,
               CASE WHEN nt - nl >= 2 AND cxxr > 0.0
                 THEN (cyyr - cxyr * cxyr / cxxr)
                   / (CAST(nt - nl AS DOUBLE) * CAST(nt - nl AS DOUBLE))
                 WHEN nt - nl >= 1
                 THEN cyyr / (CAST(nt - nl AS DOUBLE)
                   * CAST(nt - nl AS DOUBLE))
                 ELSE 0.0 END AS cr,
               CASE WHEN nt >= 2 AND cxxt > 0.0
                 THEN (cyyt - cxyt * cxyt / cxxt)
                   / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE))
                 WHEN nt >= 1
                 THEN cyyt / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE))
                 ELSE 0.0 END AS ct0
        FROM cen),
      scan AS (
        SELECT g, q, nt,
               ROUND(ct0 - cl - cr, 6) AS gain,
               ROUND(ct0, 6) AS ct, ROUND(cl + cr, 6) AS cs,
               ROW_NUMBER() OVER (PARTITION BY g
                 ORDER BY ROUND(ct0 - cl - cr, 6) DESC, q ASC) AS rk
        FROM costs WHERE q < 15 AND nl < nt),
      best AS (SELECT * FROM scan WHERE rk = 1)
      SELECT e.g AS event_type, e.ng AS n,
             CAST(CASE WHEN b.gain IS NOT NULL AND b.nt >= 4
                    AND e.hi > e.lo THEN b.q + 1 END AS BIGINT) AS edge,
             CAST(CASE WHEN b.gain IS NOT NULL AND b.nt >= 4
                    AND e.hi > e.lo THEN
               ROUND((CAST(e.lo AS DOUBLE) / 1000000.0)
                 + CAST(b.q + 1 AS DOUBLE)
                   * (CAST(e.hi - e.lo AS DOUBLE) / 1000000.0) / 16, 6)
               END AS DOUBLE) AS threshold,
             CAST(CASE WHEN b.ct IS NOT NULL
               THEN ROUND(b.ct / 1000000000000.0, 6) END AS DOUBLE)
               AS cost_total,
             CAST(CASE WHEN b.cs IS NOT NULL
               THEN ROUND(b.cs / 1000000000000.0, 6) END AS DOUBLE)
               AS cost_split,
             CAST(CASE WHEN b.gain IS NOT NULL AND b.nt >= 4
                    AND e.hi > e.lo
               THEN ROUND(b.gain / 1000000000000.0, 6) END AS DOUBLE)
               AS gain
      FROM edges e LEFT JOIN best b ON b.g = e.g
      ORDER BY e.g""",

    // One lead window per user chain, states² cells, frozen
    // -(c/n)·ln(c/rowtot) terms in a decimal sum.
    "q_markov_entropy" -> """
      WITH tr AS (
        SELECT st, nx FROM (
          SELECT event_type AS st,
                 LEAD(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS nx
          FROM events WHERE event_type IS NOT NULL)
        WHERE nx IS NOT NULL),
      cells AS (SELECT st, nx, COUNT(*)::BIGINT AS c
                FROM tr GROUP BY st, nx),
      en AS (SELECT c, SUM(c) OVER (PARTITION BY st) AS rowtot,
                    SUM(c) OVER () AS n
             FROM cells),
      terms AS (SELECT n,
                  CAST(ROUND((CAST(c AS DOUBLE) / n)
                    * -LN(CAST(c AS DOUBLE) / rowtot), 12)
                    AS DECIMAL(38,12)) AS term
                FROM en)
      SELECT 'all' AS g, MAX(n)::BIGINT AS n_transitions,
             CAST(ROUND(CAST(SUM(term) AS DOUBLE), 6) AS DOUBLE)
               AS entropy_rate,
             CAST(ROUND(EXP(ROUND(CAST(SUM(term) AS DOUBLE), 6)), 6)
               AS DOUBLE) AS perplexity
      FROM terms""",

    // Exact order-statistic trim bounds, Winsorized HUGEINT moments,
    // the identical Yuen t/dof trees.
    "q_yuen" -> """
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS x
        FROM events
        WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')),
      rk AS (SELECT g, x,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY x) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS n
             FROM pts),
      b AS (SELECT g, x, rn, n,
              CAST(FLOOR(n * 20 / 100) AS BIGINT) AS gt FROM rk),
      bounds AS (SELECT g, MAX(CASE WHEN rn = gt + 1 THEN x END) AS lov,
                        MAX(CASE WHEN rn = n - gt THEN x END) AS hiv
                 FROM b GROUP BY g),
      w AS (SELECT b.g, b.n, b.gt, b.rn, b.x,
              CASE WHEN rn <= gt THEN lov
                   WHEN rn > n - gt THEN hiv ELSE x END AS wv
            FROM b JOIN bounds ON bounds.g = b.g),
      byg AS (
        SELECT g, MAX(n)::BIGINT AS ng, MAX(gt)::BIGINT AS gt,
               SUM(CASE WHEN rn > gt AND rn <= n - gt
                   THEN x::HUGEINT ELSE 0 END) AS tsum,
               SUM(wv::HUGEINT) AS ws, SUM(wv::HUGEINT * wv) AS wq
        FROM w GROUP BY g),
      st AS (
        SELECT g, ng, ng - 2 * gt AS h,
               ROUND(CAST(tsum AS DOUBLE) / (ng - 2 * gt) / 1000000.0, 12)
                 AS tm,
               ROUND((CAST(ng AS DOUBLE) * CAST(wq AS DOUBLE)
                 - CAST(ws AS DOUBLE) * CAST(ws AS DOUBLE))
                 / (CAST(ng AS DOUBLE) * CAST(ng - 1 AS DOUBLE))
                 / 1000000000000.0, 12) AS s2w
        FROM byg),
      dd AS (SELECT g, ng, h, tm,
               CASE WHEN h >= 2 THEN
                 ROUND(CAST(ng - 1 AS DOUBLE) * s2w
                   / (CAST(h AS DOUBLE) * CAST(h - 1 AS DOUBLE)), 12) END
                 AS d
             FROM st),
      two AS (
        SELECT (SELECT COUNT(*) FROM dd)::BIGINT AS k,
               a.g AS g1, bb.g AS g2, a.ng AS n1, bb.ng AS n2,
               a.h AS h1, bb.h AS h2, a.tm AS tm1, bb.tm AS tm2,
               a.d AS d1, bb.d AS d2
        FROM (SELECT * FROM dd ORDER BY g LIMIT 1) a,
             (SELECT * FROM dd ORDER BY g DESC LIMIT 1) bb)
      SELECT g1, g2, k AS k_groups, n1, n2,
             CAST(CASE WHEN k = 2 AND d1 IS NOT NULL AND d2 IS NOT NULL
                    AND d1 + d2 > 0.0 AND h1 >= 2 AND h2 >= 2 THEN
               ROUND((tm1 - tm2) / SQRT(d1 + d2), 6) END AS DOUBLE) AS t,
             CAST(CASE WHEN k = 2 AND d1 IS NOT NULL AND d2 IS NOT NULL
                    AND d1 + d2 > 0.0 AND h1 >= 2 AND h2 >= 2 THEN
               ROUND((d1 + d2) * (d1 + d2)
                 / (d1 * d1 / CAST(h1 - 1 AS DOUBLE)
                   + d2 * d2 / CAST(h2 - 1 AS DOUBLE)), 6)
               END AS DOUBLE) AS dof
      FROM two""",

    // Welch 1951: frozen per-group moments, decimal folds, the same
    // left-assoc float trees.
    "q_welch_anova" -> """
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL),
      byg0 AS (
        SELECT g, COUNT(*)::BIGINT AS ng, SUM(x::HUGEINT) AS s1,
               SUM(x::HUGEINT * x) AS q1
        FROM pts GROUP BY g),
      byg1 AS (
        SELECT g, ng,
               ROUND(CAST(s1 AS DOUBLE) / ng / 1000000.0, 12) AS m,
               ROUND((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)
                 * CAST(s1 AS DOUBLE) / ng) / (ng - 1)
                 / 1000000000000.0, 12) AS v
        FROM byg0 WHERE ng >= 2),
      byg AS (SELECT g, ng, m, ROUND(ng / v, 12) AS w
              FROM byg1 WHERE v > 0.0),
      tot AS (
        SELECT SUM(ng)::BIGINT AS n, COUNT(*)::BIGINT AS k,
               SUM(CAST(w AS DECIMAL(38,12))) AS bigw,
               SUM(CAST(ROUND(w * m, 12) AS DECIMAL(38,12))) AS wm
        FROM byg),
      mb AS (SELECT n, k, CAST(bigw AS DOUBLE) AS wd,
                    ROUND(CAST(wm AS DOUBLE) / CAST(bigw AS DOUBLE), 12)
                      AS mbar
             FROM tot),
      fold AS (
        SELECT n, k,
               CAST(SUM(CAST(ROUND(w * (m - mbar) * (m - mbar), 12)
                 AS DECIMAL(38,12))) AS DOUBLE) AS num,
               CAST(SUM(CAST(ROUND((1.0 - w / wd) * (1.0 - w / wd)
                 / (ng - 1), 12) AS DECIMAL(38,12))) AS DOUBLE) AS lam
        FROM byg CROSS JOIN mb GROUP BY n, k, wd, mbar)
      SELECT n, k AS k_used, (k - 1)::BIGINT AS dof1,
             CAST(CASE WHEN k >= 2 AND lam > 0.0 THEN
               ROUND(CAST(k * k - 1 AS DOUBLE) / (3.0 * lam), 6)
               END AS DOUBLE) AS dof2,
             CAST(CASE WHEN k >= 2 THEN
               ROUND((num / CAST(k - 1 AS DOUBLE))
                 / (1.0 + (2.0 * CAST(k - 2 AS DOUBLE)
                   / CAST(k * k - 1 AS DOUBLE)) * lam), 6)
               END AS DOUBLE) AS f
      FROM fold""",

    // Cent-quantized positive values; per-row frozen ln terms in
    // decimal sums; the three rounded indices.
    "q_inequality" -> """
      WITH pts AS (
        SELECT g, x FROM (
          SELECT o_orderpriority AS g,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x
          FROM orders)
        WHERE x IS NOT NULL AND x > 0),
      means AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               ROUND(CAST(SUM(x::HUGEINT) AS DOUBLE) / COUNT(*), 12) AS mu
        FROM pts GROUP BY g),
      terms AS (SELECT p.g, n, x / mu AS r
                FROM pts p JOIN means USING (g)),
      agg AS (
        SELECT g, n,
               CAST(SUM(CAST(ROUND(r * LN(r), 12) AS DECIMAL(38,12)))
                 AS DOUBLE) AS t,
               CAST(SUM(CAST(ROUND(-LN(r), 12) AS DECIMAL(38,12)))
                 AS DOUBLE) AS l
        FROM terms GROUP BY g, n)
      SELECT g AS o_orderpriority, n,
             CAST(ROUND(t / n, 6) AS DOUBLE) AS theil_t,
             CAST(ROUND(l / n, 6) AS DOUBLE) AS theil_l,
             CAST(ROUND(1.0 - EXP(-(l / n)), 6) AS DOUBLE) AS atkinson1
      FROM agg ORDER BY g""",

    // Same equi-width binning as q_mw_binned, cell-pair concordance
    // with the doubled tie correction — every count an exact integer,
    // one rounded tau_b division.
    "q_kendall_binned" -> """
      WITH st AS (SELECT MIN(value) AS lox, MAX(value) AS hix,
                         MIN(user_id) AS loy, MAX(user_id) AS hiy
                  FROM events),
      pts AS (
        SELECT event_type AS g,
               (CASE WHEN hix > lox
                  THEN LEAST(FLOOR((value - lox) * 16 / (hix - lox)), 15)
                  ELSE 0 END)::BIGINT AS qx,
               (CASE WHEN hiy > loy
                  THEN LEAST(FLOOR((user_id - loy) * 16 / (hiy - loy)), 15)
                  ELSE 0 END)::BIGINT AS qy
        FROM events CROSS JOIN st
        WHERE value IS NOT NULL AND user_id IS NOT NULL),
      cells AS (SELECT g, qx, qy, COUNT(*)::BIGINT AS c
                FROM pts GROUP BY 1, 2, 3),
      pa AS (
        SELECT a.g,
               SUM(CASE WHEN a.qy < b.qy THEN a.c * b.c ELSE 0 END)
                 ::BIGINT AS con,
               SUM(CASE WHEN a.qy > b.qy THEN a.c * b.c ELSE 0 END)
                 ::BIGINT AS dis
        FROM cells a JOIN cells b ON a.g = b.g AND a.qx < b.qx
        GROUP BY a.g),
      tx AS (SELECT g, SUM(t * (t - 1))::BIGINT AS n1d
             FROM (SELECT g, qx, SUM(c) AS t FROM cells GROUP BY g, qx)
             GROUP BY g),
      ty AS (SELECT g, SUM(t * (t - 1))::BIGINT AS n2d
             FROM (SELECT g, qy, SUM(c) AS t FROM cells GROUP BY g, qy)
             GROUP BY g),
      base AS (SELECT g, SUM(c)::BIGINT AS n FROM cells GROUP BY g)
      SELECT base.g AS event_type, base.n,
             CAST(base.n * (base.n - 1) / 2 AS BIGINT) AS n_pairs,
             COALESCE(pa.con, 0)::BIGINT AS concordant,
             COALESCE(pa.dis, 0)::BIGINT AS discordant,
             CAST(CASE WHEN
                 (CAST(base.n * (base.n - 1) - tx.n1d AS DOUBLE) / 2.0)
                 * (CAST(base.n * (base.n - 1) - ty.n2d AS DOUBLE) / 2.0)
                 > 0.0 THEN
               ROUND(CAST(COALESCE(pa.con, 0) - COALESCE(pa.dis, 0)
                   AS DOUBLE)
                 / SQRT(
                   (CAST(base.n * (base.n - 1) - tx.n1d AS DOUBLE) / 2.0)
                   * (CAST(base.n * (base.n - 1) - ty.n2d AS DOUBLE) / 2.0)),
                 6) END AS DOUBLE) AS tau_b
      FROM base LEFT JOIN pa ON pa.g = base.g
      JOIN tx ON tx.g = base.g JOIN ty ON ty.g = base.g
      ORDER BY base.g""",

    "q_kendall" -> """
      WITH cells AS (
        SELECT event_type AS g,
               DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS y
        FROM events GROUP BY event_type, CAST(ts AS DATE)),
      wid AS (SELECT g, x, y,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY x, y) AS rid
              FROM cells),
      pr AS (
        SELECT a.g,
               CASE WHEN (a.x < b.x AND a.y < b.y)
                      OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END AS con,
               CASE WHEN (a.x < b.x AND a.y > b.y)
                      OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END AS dis
        FROM wid a JOIN wid b ON a.g = b.g AND a.rid < b.rid),
      pa AS (SELECT g, COUNT(*)::BIGINT AS n_pairs,
                    SUM(con)::BIGINT AS concordant,
                    SUM(dis)::BIGINT AS discordant
             FROM pr GROUP BY g),
      tx AS (SELECT g, SUM(t * (t - 1))::BIGINT AS n1d
             FROM (SELECT g, x, COUNT(*) AS t FROM cells GROUP BY g, x)
             GROUP BY g),
      ty AS (SELECT g, SUM(t * (t - 1))::BIGINT AS n2d
             FROM (SELECT g, y, COUNT(*) AS t FROM cells GROUP BY g, y)
             GROUP BY g),
      base AS (SELECT g, COUNT(*)::BIGINT AS n FROM cells GROUP BY g)
      SELECT base.g AS event_type, base.n,
             COALESCE(pa.n_pairs, 0)::BIGINT AS n_pairs,
             COALESCE(pa.concordant, 0)::BIGINT AS concordant,
             COALESCE(pa.discordant, 0)::BIGINT AS discordant,
             CAST(CASE WHEN
                 (CAST(base.n * (base.n - 1) - tx.n1d AS DOUBLE) / 2.0)
                 * (CAST(base.n * (base.n - 1) - ty.n2d AS DOUBLE) / 2.0)
                 > 0.0 THEN
               ROUND(CAST(pa.concordant - pa.discordant AS DOUBLE)
                 / SQRT(
                   (CAST(base.n * (base.n - 1) - tx.n1d AS DOUBLE) / 2.0)
                   * (CAST(base.n * (base.n - 1) - ty.n2d AS DOUBLE) / 2.0)),
                 6) END AS DOUBLE) AS tau_b
      FROM base LEFT JOIN pa ON pa.g = base.g
      JOIN tx ON tx.g = base.g JOIN ty ON ty.g = base.g
      ORDER BY base.g""",

    // Lower-median dichotomy, integer runs, the identical z tree.
    "q_runs_test" -> """
      WITH pts AS (
        SELECT event_type AS g, event_id AS o,
               CAST(ROUND(value * 1000000) AS BIGINT) AS q
        FROM events WHERE value IS NOT NULL),
      m AS (SELECT g, o, q,
              ROW_NUMBER() OVER (PARTITION BY g ORDER BY q) AS rn,
              COUNT(*) OVER (PARTITION BY g) AS n
            FROM pts),
      med AS (SELECT g, MAX(CASE WHEN rn = (n + 1) // 2 THEN q END) AS medq
              FROM m GROUP BY g),
      f AS (SELECT m.g, m.o, m.q > med.medq AS above
            FROM m JOIN med ON med.g = m.g WHERE m.q <> med.medq),
      r AS (SELECT g, o, above,
              LAG(above) OVER (PARTITION BY g ORDER BY o) AS prev
            FROM f),
      agg AS (
        SELECT g, COUNT(*)::BIGINT AS n_used,
               SUM(CASE WHEN above THEN 1 ELSE 0 END)::BIGINT AS n_above,
               SUM(CASE WHEN NOT above THEN 1 ELSE 0 END)::BIGINT AS n_below,
               SUM(CASE WHEN prev IS NULL OR prev <> above
                   THEN 1 ELSE 0 END)::BIGINT AS runs
        FROM r GROUP BY g)
      SELECT g AS event_type, n_used, n_above, n_below, runs,
             CAST(CASE WHEN n_above > 0 AND n_below > 0 AND
                 2.0 * n_above * n_below
                   * (2.0 * n_above * n_below - n_above - n_below)
                   / ((n_above + n_below) * (n_above + n_below)
                      * (n_above + n_below - 1.0)) > 0.0 THEN
               ROUND((CAST(runs AS DOUBLE)
                   - (2.0 * n_above * n_below / (n_above + n_below) + 1.0))
                 / SQRT(2.0 * n_above * n_below
                   * (2.0 * n_above * n_below - n_above - n_below)
                   / ((n_above + n_below) * (n_above + n_below)
                      * (n_above + n_below - 1.0))), 6)
             END AS DOUBLE) AS z
      FROM agg
      ORDER BY g""",

    // Prefix-min unrolling of the Page recurrence, integer compare.
    "q_cusum_detect" -> """
      WITH pts AS (
        SELECT event_type AS g, event_id AS o,
               CAST(ROUND(value * 1000000) AS BIGINT) - 105000000 AS q
        FROM events WHERE value IS NOT NULL),
      c1 AS (SELECT g, o,
               SUM(q) OVER (PARTITION BY g ORDER BY o) AS p
             FROM pts),
      c2 AS (SELECT g, o,
               p - LEAST(0, MIN(p) OVER (PARTITION BY g ORDER BY o))
                 AS sc
             FROM c1)
      SELECT g AS event_type, o AS event_id,
             CAST(ROUND(sc / 1e6, 6) AS DOUBLE) AS s,
             sc > 500000000 AS alarm
      FROM c2
      ORDER BY event_type, event_id""",

    // Scaled-integer moment windows into the identical r tree.
    "q_rolling_corr" -> """
      WITH cells AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS x,
               COUNT(*)::BIGINT AS y
        FROM events GROUP BY 1, 2),
      sc AS (SELECT g, d, CAST(x * 1000000 AS HUGEINT) AS qx,
                    CAST(y * 1000000 AS HUGEINT) AS qy
             FROM cells),
      w AS (
        SELECT g, d,
               COUNT(*) OVER fr AS n,
               SUM(qx) OVER fr AS sx, SUM(qy) OVER fr AS sy,
               SUM(qx * qx) OVER fr AS sxx,
               SUM(qy * qy) OVER fr AS syy,
               SUM(qx * qy) OVER fr AS sxy
        FROM sc
        WINDOW fr AS (PARTITION BY g ORDER BY d
          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      SELECT g AS event_type, CAST(d AS VARCHAR) AS d, n::BIGINT AS n,
             CAST(CASE WHEN n >= 7
                    AND CAST(n::HUGEINT * sxx - sx * sx AS DOUBLE) > 0.0
                    AND CAST(n::HUGEINT * syy - sy * sy AS DOUBLE) > 0.0
               THEN ROUND(CAST(n::HUGEINT * sxy - sx * sy AS DOUBLE)
                 / SQRT(CAST(n::HUGEINT * sxx - sx * sx AS DOUBLE)
                        * CAST(n::HUGEINT * syy - sy * sy AS DOUBLE)), 6)
             END AS DOUBLE) AS r
      FROM w
      ORDER BY event_type, d""",

    // Day cells in exact cents, doubled within-group ranks, integer
    // U_t = t(N+1) - R2_t, (|U| DESC, t) argmax.
    "q_pettitt" -> """
      WITH cells AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS v
        FROM events GROUP BY 1, 2),
      rk AS (
        SELECT g, d,
               2 * (RANK() OVER (PARTITION BY g ORDER BY v) - 1)
                 + COUNT(*) OVER (PARTITION BY g, v) + 1 AS dd
        FROM cells),
      u AS (
        SELECT g, d,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY d)
                   * (COUNT(*) OVER (PARTITION BY g) + 1)
                 - SUM(dd) OVER (PARTITION BY g ORDER BY d) AS uu,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY d) AS t,
               COUNT(*) OVER (PARTITION BY g) AS n
        FROM rk),
      best AS (
        SELECT g, n, uu, d,
               ROW_NUMBER() OVER (PARTITION BY g
                 ORDER BY ABS(uu) DESC, t) AS rk2
        FROM u WHERE t < n)
      SELECT g AS event_type, n::BIGINT AS n, uu::BIGINT AS u_max,
             ABS(uu)::BIGINT AS k_stat, CAST(d AS VARCHAR) AS at_order
      FROM best WHERE rk2 = 1
      ORDER BY event_type""",

    // Calendar cells, rounded pairwise slopes, exact lower medians.
    "q_theil_sen" -> """
      WITH cells AS (
        SELECT event_type AS g,
               DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0 AS y
        FROM events GROUP BY event_type, CAST(ts AS DATE)),
      pairs AS (
        SELECT a.g, ROUND((b.y - a.y) / (b.x - a.x), 6) AS s
        FROM cells a JOIN cells b ON a.g = b.g AND a.x < b.x),
      smed AS (
        SELECT g, COUNT(*) OVER (PARTITION BY g)::BIGINT AS n_pairs, s,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY s) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS nq
        FROM pairs),
      sm AS (SELECT g, n_pairs, s AS slope FROM smed
             WHERE rn = (nq + 1) // 2),
      imed AS (
        SELECT c.g, ROUND(c.y - sm.slope * c.x, 6) AS i,
               ROW_NUMBER() OVER (PARTITION BY c.g
                 ORDER BY ROUND(c.y - sm.slope * c.x, 6)) AS rn,
               COUNT(*) OVER (PARTITION BY c.g) AS nq
        FROM cells c JOIN sm ON sm.g = c.g),
      im AS (SELECT g, i AS intercept FROM imed WHERE rn = (nq + 1) // 2),
      base AS (SELECT g, COUNT(*)::BIGINT AS n FROM cells GROUP BY g)
      SELECT base.g AS event_type, base.n,
             COALESCE(sm.n_pairs, 0)::BIGINT AS n_pairs,
             CAST(sm.slope AS DOUBLE) AS slope,
             CAST(im.intercept AS DOUBLE) AS intercept
      FROM base LEFT JOIN sm ON sm.g = base.g
      LEFT JOIN im ON im.g = base.g
      ORDER BY base.g""",

    // Integer cumulative + running max, first-trough tie rule.
    "q_drawdown" -> """
      WITH pts AS (
        SELECT event_type AS g, event_id AS o,
               CAST(ROUND((value - 100.0) * 1e6) AS BIGINT) AS q
        FROM events WHERE value IS NOT NULL),
      c1 AS (SELECT g, o,
               SUM(q) OVER (PARTITION BY g ORDER BY o) AS cum
             FROM pts),
      c2 AS (SELECT g, o,
               MAX(cum) OVER (PARTITION BY g ORDER BY o) - cum AS dd,
               COUNT(*) OVER (PARTITION BY g) AS n
             FROM c1),
      best AS (SELECT g, n, dd, o,
               ROW_NUMBER() OVER (PARTITION BY g
                 ORDER BY dd DESC, o) AS rk
             FROM c2)
      SELECT g AS event_type, n::BIGINT AS n,
             CAST(ROUND(dd / 1e6, 6) AS DOUBLE) AS max_drawdown,
             o AS at_order
      FROM best WHERE rk = 1
      ORDER BY event_type""",

    // The q_mann_whitney rank CTEs, k-group squared rank sums, the
    // identical H float tree.
    "q_kruskal" -> """
      WITH cells AS (
        SELECT event_type AS g, ROUND(value, 6) AS q, COUNT(*)::BIGINT AS c
        FROM events GROUP BY 1, 2),
      tot AS (SELECT q AS tq, SUM(c)::BIGINT AS e FROM cells GROUP BY q),
      tot2 AS (
        SELECT tq, e,
               COALESCE(SUM(e) OVER (ORDER BY tq NULLS FIRST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 ::BIGINT AS cbelow
        FROM tot),
      nn AS (SELECT SUM(e)::BIGINT AS n,
                    SUM(e::HUGEINT * e * e - e)::HUGEINT AS ties
             FROM tot),
      perg AS (
        SELECT g, SUM(c)::BIGINT AS ng,
               SUM(c::HUGEINT * (2 * cbelow + e + 1))::HUGEINT AS r2
        FROM cells JOIN tot2 ON cells.q IS NOT DISTINCT FROM tot2.tq
        GROUP BY g),
      agg AS (
        SELECT MAX(n)::BIGINT AS n, COUNT(*)::BIGINT AS k,
               MAX(CAST(ties AS DOUBLE)) AS td,
               MAX(CAST(n AS DOUBLE)) AS nd,
               CAST(SUM(CAST(ROUND(CAST(r2 * r2 AS DOUBLE) / ng, 12)
                 AS DECIMAL(38,12))) AS DOUBLE) AS sumterm
        FROM perg CROSS JOIN nn)
      SELECT n, k, (k - 1)::BIGINT AS dof,
             CAST(CASE WHEN k >= 2
                    AND 1.0 - td / (nd * nd * nd - nd) > 0.0 THEN
               ROUND((3.0 / (nd * (nd + 1.0)) * sumterm
                      - 3.0 * (nd + 1.0))
                 / (1.0 - td / (nd * nd * nd - nd)), 6) END AS DOUBLE) AS h
      FROM agg""",

    // The q_mann_whitney CTEs with delta = 1 - 2u/(ng*nr) (u is the
    // complement-wins convention) as the final projection.
    "q_cliffs_delta" -> """
      WITH cells AS (
        SELECT event_type AS g, ROUND(value, 6) AS q, COUNT(*)::BIGINT AS c
        FROM events GROUP BY 1, 2),
      tot AS (SELECT q AS tq, SUM(c)::BIGINT AS e FROM cells GROUP BY q),
      tot2 AS (
        SELECT tq, e,
               COALESCE(SUM(e) OVER (ORDER BY tq NULLS FIRST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 ::BIGINT AS cbelow
        FROM tot),
      nn AS (SELECT SUM(e)::BIGINT AS n FROM tot),
      perg AS (
        SELECT g, SUM(c)::BIGINT AS n_group,
               SUM(c::HUGEINT * (2 * cbelow + e + 1))::HUGEINT AS r1d
        FROM cells JOIN tot2 ON cells.q IS NOT DISTINCT FROM tot2.tq
        GROUP BY g),
      stat AS (
        SELECT g, n_group, (n - n_group)::BIGINT AS n_rest,
               CAST(2::HUGEINT * n_group * (n - n_group)
                 + n_group::HUGEINT * (n_group + 1) - r1d AS DOUBLE)
                 / 2.0 AS u
        FROM perg CROSS JOIN nn)
      SELECT g AS event_type, n_group, n_rest,
             CAST(CASE WHEN n_rest > 0 THEN
               ROUND(1.0 - 2.0 * u / (CAST(n_group AS DOUBLE) * n_rest), 6)
             END AS DOUBLE) AS delta
      FROM stat
      ORDER BY event_type""",

    // Group rates, 12-dp-frozen beta-binomial moments, the identical
    // shrinkage tree.
    "q_eb_shrink" -> """
      WITH byg AS (
        SELECT event_type, COUNT(*)::BIGINT AS n,
               SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)::BIGINT
                 AS successes
        FROM events GROUP BY 1),
      byg2 AS (SELECT event_type, n, successes,
                      CAST(successes AS DOUBLE) / n AS p FROM byg),
      pr AS (SELECT COUNT(*)::BIGINT AS k, ROUND(AVG(p), 12) AS m,
                    ROUND(VAR_SAMP(p), 12) AS v
             FROM byg2),
      pr2 AS (SELECT k, m, v,
                     CASE WHEN k >= 2 AND v > 0.0 AND m > 0.0 AND m < 1.0
                            AND m * (1.0 - m) > v
                       THEN m * (m * (1.0 - m) / v - 1.0) END AS alpha
              FROM pr),
      pr3 AS (SELECT k, m, v, alpha, (1.0 - m) / m * alpha AS beta FROM pr2)
      SELECT event_type, n, successes,
             CAST(ROUND(p, 6) AS DOUBLE) AS rate,
             CAST(CASE WHEN alpha IS NOT NULL THEN
               ROUND((successes + alpha) / (n + alpha + beta), 6)
             END AS DOUBLE) AS shrunk_rate
      FROM byg2 CROSS JOIN pr3
      ORDER BY event_type""",

    // Integer-cents pairing, doubled |d|-ranks, the identical z tree.
    "q_wilcoxon" -> """
      WITH p AS (
        SELECT event_type, user_id,
               SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                   THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS x,
               SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                   THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS y
        FROM events GROUP BY 1, 2),
      ac AS (SELECT event_type AS gm, COUNT(*)::BIGINT AS n_pairs
             FROM p GROUP BY 1),
      d0 AS (SELECT event_type AS g, y - x AS d FROM p),
      cells AS (
        SELECT g, ABS(d) AS ad, COUNT(*)::BIGINT AS e,
               SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END)::BIGINT AS pp
        FROM d0 WHERE d <> 0 GROUP BY 1, 2),
      cb AS (
        SELECT g, ad, e, pp,
               COALESCE(SUM(e) OVER (PARTITION BY g ORDER BY ad
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 ::BIGINT AS cbel
        FROM cells),
      perg AS (
        SELECT g, SUM(e)::BIGINT AS n_nonzero,
               SUM(pp::HUGEINT * (2 * cbel + e + 1))::HUGEINT AS wp2,
               SUM(e::HUGEINT * e * e - e)::HUGEINT AS ties
        FROM cb GROUP BY g),
      j AS (
        SELECT ac.gm, ac.n_pairs,
               COALESCE(perg.n_nonzero, 0)::BIGINT AS n_nonzero,
               CAST(perg.wp2 AS DOUBLE) / 2.0 AS w_plus,
               CAST(perg.wp2 AS DOUBLE) AS wp2d,
               CAST(perg.ties AS DOUBLE) AS tiesd,
               CAST(COALESCE(perg.n_nonzero, 0) AS DOUBLE) AS nd
        FROM ac LEFT JOIN perg ON perg.g IS NOT DISTINCT FROM ac.gm)
      SELECT gm AS event_type, n_pairs, n_nonzero, w_plus,
             CAST(CASE WHEN n_nonzero > 0
                    AND nd * (nd + 1.0) * (2.0 * nd + 1.0) / 6.0
                        - tiesd / 12.0 > 0.0 THEN
               ROUND((wp2d - nd * (nd + 1.0) / 2.0)
                 / SQRT(nd * (nd + 1.0) * (2.0 * nd + 1.0) / 6.0
                        - tiesd / 12.0), 6) END AS DOUBLE) AS z
      FROM j
      ORDER BY event_type""",

    // Discordant-pair counts + one rounded division.
    "q_mcnemar" -> """
      WITH t AS (
        SELECT source,
               ((n_chars > 500) = (lang = 'en')) AS acr,
               ((LENGTH(text) > 550) = (lang = 'en')) AS bcr
        FROM documents),
      agg AS (
        SELECT source, COUNT(*)::BIGINT AS n,
               SUM(CASE WHEN acr AND NOT bcr THEN 1 ELSE 0 END)::BIGINT AS b,
               SUM(CASE WHEN bcr AND NOT acr THEN 1 ELSE 0 END)::BIGINT AS c
        FROM t GROUP BY source)
      SELECT source, n, b, c,
             CAST(CASE WHEN b + c > 0 THEN
               ROUND(CAST((b - c) * (b - c) AS DOUBLE) / (b + c), 6)
             END AS DOUBLE) AS mcnemar
      FROM agg
      ORDER BY source""",

    // Top-101 order statistics, scaled-long log ratios, rounded mean.
    "q_hill" -> """
      WITH top AS (
        SELECT CAST(n_chars AS DOUBLE) AS x, doc_id,
               ROW_NUMBER() OVER (ORDER BY CAST(n_chars AS DOUBLE) DESC,
                 doc_id) AS rn
        FROM documents WHERE n_chars > 0
        ORDER BY CAST(n_chars AS DOUBLE) DESC, doc_id LIMIT 101),
      tl AS (SELECT x AS xt FROM top WHERE rn = 101),
      ls AS (
        SELECT CAST(ROUND(LN(x / xt) * 1000000) AS BIGINT) AS l, xt
        FROM top CROSS JOIN tl WHERE rn <= 100),
      agg AS (SELECT COUNT(*)::BIGINT AS kk, SUM(l)::BIGINT AS s,
                     MAX(xt) AS xtail
              FROM ls)
      SELECT 100::BIGINT AS k, CAST(xtail AS DOUBLE) AS x_tail,
             CAST(ROUND(s / (100 * 1e6), 6) AS DOUBLE) AS hill,
             CAST(CASE WHEN ROUND(s / (100 * 1e6), 6) > 0.0 THEN
               ROUND(1.0 / ROUND(s / (100 * 1e6), 6), 6)
             END AS DOUBLE) AS alpha
      FROM agg WHERE kk = 100""",

    // Two unrolled raking iterations (row step then column step per
    // iteration), weights 12-dp-quantized per half-step.
    "q_ipf_rake" -> """
      WITH cells AS (
        SELECT lang AS a, source AS b, COUNT(*)::BIGINT AS c
        FROM documents GROUP BY 1, 2),
      tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS nt FROM cells),
      la AS (SELECT CAST(COUNT(*) AS DOUBLE) AS la
             FROM (SELECT DISTINCT a FROM cells)),
      lb AS (SELECT CAST(COUNT(*) AS DOUBLE) AS lb
             FROM (SELECT DISTINCT b FROM cells)),
      w0 AS (SELECT a, b, c, nt, la, lb, 1.0 AS w
             FROM cells CROSS JOIN tot CROSS JOIN la CROSS JOIN lb),
      r1 AS (SELECT a, b, c, nt, la, lb,
               ROUND(w * (nt / la)
                 / SUM(c * w) OVER (PARTITION BY a), 12) AS w
             FROM w0),
      c1 AS (SELECT a, b, c, nt, la, lb,
               ROUND(w * (nt / lb)
                 / SUM(c * w) OVER (PARTITION BY b), 12) AS w
             FROM r1),
      r2 AS (SELECT a, b, c, nt, la, lb,
               ROUND(w * (nt / la)
                 / SUM(c * w) OVER (PARTITION BY a), 12) AS w
             FROM c1),
      c2 AS (SELECT a, b, c, nt, la, lb,
               ROUND(w * (nt / lb)
                 / SUM(c * w) OVER (PARTITION BY b), 12) AS w
             FROM r2)
      SELECT a AS lang, b AS source, c AS n, CAST(w AS DOUBLE) AS weight
      FROM c2
      ORDER BY lang, source""",

    // q_ks_binned's equi-width cell CTE feeding q_mann_whitney's
    // doubled-rank machinery verbatim.
    "q_mw_binned" -> """
      WITH st AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
      cells AS (
        SELECT event_type AS g,
               (CASE WHEN value IS NOT NULL THEN
                  CASE WHEN hi > lo
                    THEN LEAST(FLOOR((value - lo) * 16 / (hi - lo)), 15)
                    ELSE 0 END
                END)::BIGINT AS q,
               COUNT(*)::BIGINT AS c
        FROM events CROSS JOIN st GROUP BY 1, 2),
      tot AS (SELECT q AS tq, SUM(c)::BIGINT AS e FROM cells GROUP BY q),
      tot2 AS (
        SELECT tq, e,
               COALESCE(SUM(e) OVER (ORDER BY tq NULLS FIRST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 ::BIGINT AS cbelow
        FROM tot),
      nn AS (SELECT SUM(e)::BIGINT AS n,
                    SUM(e::HUGEINT * e * e - e)::HUGEINT AS ties
             FROM tot),
      perg AS (
        SELECT g, SUM(c)::BIGINT AS n_group,
               SUM(c::HUGEINT * (2 * cbelow + e + 1))::HUGEINT AS r1d
        FROM cells JOIN tot2 ON cells.q IS NOT DISTINCT FROM tot2.tq
        GROUP BY g),
      stat AS (
        SELECT g, n_group, (n - n_group)::BIGINT AS n_rest,
               CAST(2::HUGEINT * n_group * (n - n_group)
                 + n_group::HUGEINT * (n_group + 1) - r1d AS DOUBLE)
                 / 2.0 AS u,
               CAST(n_group AS DOUBLE) * (n - n_group)
                 * ((CAST(n AS DOUBLE) + 1.0)
                    - CAST(ties AS DOUBLE)
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                 / 12.0 AS var,
               n
        FROM perg CROSS JOIN nn)
      SELECT g AS event_type, n_group, n_rest, u,
             CAST(CASE WHEN n_rest > 0 AND var > 0 THEN
               ROUND((u - CAST(n_group AS DOUBLE) * n_rest / 2.0)
                 / SQRT(var), 6) END AS DOUBLE) AS z
      FROM stat
      ORDER BY event_type""",

    // The q_mann_whitney machinery plus the rank-biserial effect size
    // r = 1 - 2U/(n1*n2), one rounded division on the exact U.
    "q_rank_biserial" -> """
      WITH cells AS (
        SELECT event_type AS g, ROUND(value, 6) AS q, COUNT(*)::BIGINT AS c
        FROM events GROUP BY 1, 2),
      tot AS (SELECT q AS tq, SUM(c)::BIGINT AS e FROM cells GROUP BY q),
      tot2 AS (
        SELECT tq, e,
               COALESCE(SUM(e) OVER (ORDER BY tq NULLS FIRST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 ::BIGINT AS cbelow
        FROM tot),
      nn AS (SELECT SUM(e)::BIGINT AS n,
                    SUM(e::HUGEINT * e * e - e)::HUGEINT AS ties
             FROM tot),
      perg AS (
        SELECT g, SUM(c)::BIGINT AS n_group,
               SUM(c::HUGEINT * (2 * cbelow + e + 1))::HUGEINT AS r1d
        FROM cells JOIN tot2 ON cells.q IS NOT DISTINCT FROM tot2.tq
        GROUP BY g),
      stat AS (
        SELECT g, n_group, (n - n_group)::BIGINT AS n_rest,
               CAST(2::HUGEINT * n_group * (n - n_group)
                 + n_group::HUGEINT * (n_group + 1) - r1d AS DOUBLE)
                 / 2.0 AS u,
               CAST(n_group AS DOUBLE) * (n - n_group)
                 * ((CAST(n AS DOUBLE) + 1.0)
                    - CAST(ties AS DOUBLE)
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                 / 12.0 AS var,
               n
        FROM perg CROSS JOIN nn)
      SELECT g AS event_type, n_group, n_rest, u,
             CAST(CASE WHEN n_rest > 0 AND var > 0 THEN
               ROUND((u - CAST(n_group AS DOUBLE) * n_rest / 2.0)
                 / SQRT(var), 6) END AS DOUBLE) AS z,
             CAST(CASE WHEN n_rest > 0 THEN
               ROUND(1.0 - 2.0 * u
                 / CAST(n_group * n_rest AS DOUBLE), 6) END AS DOUBLE)
               AS rank_biserial
      FROM stat
      ORDER BY event_type""",

    "q_mann_whitney" -> """
      WITH cells AS (
        SELECT event_type AS g, ROUND(value, 6) AS q, COUNT(*)::BIGINT AS c
        FROM events GROUP BY 1, 2),
      tot AS (SELECT q AS tq, SUM(c)::BIGINT AS e FROM cells GROUP BY q),
      tot2 AS (
        SELECT tq, e,
               COALESCE(SUM(e) OVER (ORDER BY tq NULLS FIRST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 ::BIGINT AS cbelow
        FROM tot),
      nn AS (SELECT SUM(e)::BIGINT AS n,
                    SUM(e::HUGEINT * e * e - e)::HUGEINT AS ties
             FROM tot),
      perg AS (
        SELECT g, SUM(c)::BIGINT AS n_group,
               SUM(c::HUGEINT * (2 * cbelow + e + 1))::HUGEINT AS r1d
        FROM cells JOIN tot2 ON cells.q IS NOT DISTINCT FROM tot2.tq
        GROUP BY g),
      stat AS (
        SELECT g, n_group, (n - n_group)::BIGINT AS n_rest,
               CAST(2::HUGEINT * n_group * (n - n_group)
                 + n_group::HUGEINT * (n_group + 1) - r1d AS DOUBLE)
                 / 2.0 AS u,
               CAST(n_group AS DOUBLE) * (n - n_group)
                 * ((CAST(n AS DOUBLE) + 1.0)
                    - CAST(ties AS DOUBLE)
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                 / 12.0 AS var,
               n
        FROM perg CROSS JOIN nn)
      SELECT g AS event_type, n_group, n_rest, u,
             CAST(CASE WHEN n_rest > 0 AND var > 0 THEN
               ROUND((u - CAST(n_group AS DOUBLE) * n_rest / 2.0)
                 / SQRT(var), 6) END AS DOUBLE) AS z
      FROM stat
      ORDER BY event_type""",

    // Identical float tree: pooled-variance z, Wilson score interval
    // with z0² spelled 1.96*1.96 on both engines.
    "q_prop_ztest" -> """
      WITH byg AS (
        SELECT event_type, COUNT(*)::BIGINT AS n,
               SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)::BIGINT
                 AS successes
        FROM events GROUP BY event_type),
      tot AS (SELECT SUM(n)::BIGINT AS tn, SUM(successes)::BIGINT AS tx
              FROM byg)
      SELECT event_type, n, successes,
        CAST(ROUND(successes / CAST(n AS DOUBLE), 6) AS DOUBLE) AS rate,
        CAST(CASE WHEN tn > n
                   AND tx / CAST(tn AS DOUBLE) > 0.0
                   AND tx / CAST(tn AS DOUBLE) < 1.0 THEN
          ROUND((successes / CAST(n AS DOUBLE)
                 - (tx - successes) / CAST(tn - n AS DOUBLE))
            / SQRT(tx / CAST(tn AS DOUBLE)
                   * (1.0 - tx / CAST(tn AS DOUBLE))
                   * (1.0 / CAST(n AS DOUBLE)
                      + 1.0 / CAST(tn - n AS DOUBLE))), 6)
        END AS DOUBLE) AS z,
        CAST(ROUND(
          (successes / CAST(n AS DOUBLE)
             + 1.96 * 1.96 / (2.0 * CAST(n AS DOUBLE)))
            / (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE))
          - 1.96 * SQRT(successes / CAST(n AS DOUBLE)
                * (1.0 - successes / CAST(n AS DOUBLE))
                / CAST(n AS DOUBLE)
              + 1.96 * 1.96
                / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
            / (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE)), 6)
          AS DOUBLE) AS wilson_lo,
        CAST(ROUND(
          (successes / CAST(n AS DOUBLE)
             + 1.96 * 1.96 / (2.0 * CAST(n AS DOUBLE)))
            / (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE))
          + 1.96 * SQRT(successes / CAST(n AS DOUBLE)
                * (1.0 - successes / CAST(n AS DOUBLE))
                / CAST(n AS DOUBLE)
              + 1.96 * 1.96
                / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
            / (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE)), 6)
          AS DOUBLE) AS wilson_hi
      FROM byg CROSS JOIN tot
      ORDER BY event_type""",

    // The q_mutual_info cell CTE with the two asymmetric ratios.
    "q_theils_u" -> """
      WITH cells AS (
        SELECT lang AS a, source AS b, COUNT(*) AS cab
        FROM documents GROUP BY lang, source),
      ma AS (SELECT a, SUM(cab)::BIGINT AS ca FROM cells GROUP BY a),
      mb AS (SELECT b, SUM(cab)::BIGINT AS cb FROM cells GROUP BY b),
      nn AS (SELECT SUM(cab)::DOUBLE AS n FROM cells)
      SELECT CAST(ROUND(CASE WHEN -SUM((cab / n) * LN(ca / n)) > 0
               THEN SUM((cab / n) * LN((cab * n) / (ca * cb)))
                    / (-SUM((cab / n) * LN(ca / n))) END, 6) AS DOUBLE)
               AS u_a_given_b,
             CAST(ROUND(CASE WHEN -SUM((cab / n) * LN(cb / n)) > 0
               THEN SUM((cab / n) * LN((cab * n) / (ca * cb)))
                    / (-SUM((cab / n) * LN(cb / n))) END, 6) AS DOUBLE)
               AS u_b_given_a,
             SUM(cab)::BIGINT AS n_rows
      FROM cells JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN nn""",

    // Same scaled-long moments (rest = global − group, exact), the
    // same sample-variance and pooled-d float tree (scale cancels, so
    // everything stays in scaled units on both engines). The + 0.0
    // normalizes SIGNED ZERO: a tiny negative d rounds to -0.0 under
    // DuckDB's double ROUND but to +0.0 under Spark's BigDecimal
    // rounding (BigDecimal has no signed zero), and the driver's
    // repr-based compare distinguishes them.
    "q_cohens_d" -> """
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL),
      byg AS (
        SELECT g, COUNT(*)::BIGINT AS n1,
               SUM(x::HUGEINT) AS s1, SUM(x::HUGEINT * x) AS q1
        FROM pts GROUP BY g),
      tot AS (SELECT SUM(n1)::BIGINT AS n, SUM(s1) AS s, SUM(q1) AS q
              FROM byg),
      m AS (
        SELECT g, n1, (n - n1)::BIGINT AS n2,
               s1, (s - s1) AS s2, q1, (q - q1) AS q2
        FROM byg CROSS JOIN tot),
      d AS (
        SELECT g, n1, n2,
               ((CAST(n1 AS DOUBLE) - 1.0)
                  * ((CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                     / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)))
                + (CAST(n2 AS DOUBLE) - 1.0)
                  * ((CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE)
                      - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
                     / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0))))
               / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0) AS pool,
               CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                 - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS md
        FROM m)
      SELECT g AS event_type, n1 AS n_group, n2 AS n_rest,
             CAST(CASE WHEN n1 >= 2 AND n2 >= 2 AND pool > 0 THEN
               ROUND(md / SQRT(pool), 6) + 0.0 END AS DOUBLE) AS cohens_d
      FROM d
      ORDER BY event_type""",

    // Same q_acf day cells (counts only), HUGEINT moments mirroring
    // decimal(38,0), population variance over observed days, one
    // rounded division.
    "q_fano" -> """
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               COUNT(*)::BIGINT AS n
        FROM events GROUP BY 1, 2),
      agg AS (
        SELECT g, COUNT(*)::BIGINT AS n_days,
               SUM(n)::HUGEINT AS s,
               SUM(n::HUGEINT * n)::HUGEINT AS q
        FROM cells GROUP BY g)
      SELECT g AS event_type, n_days, CAST(s AS BIGINT) AS n_events,
             CAST(CASE WHEN s > 0 THEN
               ROUND(CAST(n_days::HUGEINT * q - s * s AS DOUBLE)
                 / CAST(n_days::HUGEINT * s AS DOUBLE), 6)
             END AS DOUBLE) AS fano
      FROM agg
      ORDER BY event_type""",

    // The q_markov probability CTE (6-dp rounded), logs quantized to
    // scaled longs BEFORE the per-user sum (exact mean), one rounded
    // exp.
    "q_markov_perplexity" -> """
      WITH pairs AS (
        SELECT user_id, event_type AS f,
               LEAD(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS t
        FROM events),
      cnt AS (
        SELECT f, t, COUNT(*)::BIGINT AS n
        FROM pairs WHERE t IS NOT NULL GROUP BY f, t),
      probs AS (
        SELECT f, t,
               CAST(ROUND(n / CAST(SUM(n) OVER (PARTITION BY f)
                 AS DOUBLE), 6) AS DOUBLE) AS p
        FROM cnt),
      scored AS (
        SELECT pr.user_id,
               CAST(ROUND(LN(p.p) * 1000000.0) AS BIGINT) AS lq
        FROM (SELECT user_id, f, t FROM pairs WHERE t IS NOT NULL) pr
        JOIN probs p ON pr.f IS NOT DISTINCT FROM p.f
                    AND pr.t IS NOT DISTINCT FROM p.t)
      SELECT user_id, COUNT(*)::BIGINT AS n_steps,
             CAST(ROUND(EXP(-(SUM(lq)::BIGINT / (COUNT(*) * 1000000.0))),
               6) AS DOUBLE) AS perplexity
      FROM scored
      GROUP BY user_id
      ORDER BY user_id""",

    // Same integer class cells/prefixes and the same left-associated
    // Gini gain tree (parent − (nl/n)·giniL − (nr/n)·giniR), argmax
    // on (gain DESC, threshold ASC).
    "q_best_split" -> """
      WITH cells AS (
        SELECT source AS g, ROUND(n_chars, 6) AS q,
               SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS c1,
               SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::BIGINT AS c0
        FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
      pref AS (
        SELECT g, q, c1, c0,
               SUM(c1) OVER (PARTITION BY g ORDER BY q NULLS FIRST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 ::BIGINT AS p1,
               SUM(c0) OVER (PARTITION BY g ORDER BY q NULLS FIRST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 ::BIGINT AS p0,
               SUM(c1) OVER (PARTITION BY g)::BIGINT AS n1,
               SUM(c0) OVER (PARTITION BY g)::BIGINT AS n0
        FROM cells),
      sc AS (
        SELECT g, q, n1, n0, p1,
               (p1 + p0)::BIGINT AS nl,
               (n1 + n0 - p1 - p0)::BIGINT AS nr
        FROM pref WHERE n1 + n0 - p1 - p0 > 0),
      gn AS (
        SELECT g, q, n1, n0,
               ROUND(
                 (1.0 - (CAST(n1 AS DOUBLE) / (n1 + n0))
                          * (CAST(n1 AS DOUBLE) / (n1 + n0))
                      - (CAST((n1 + n0) - n1 AS DOUBLE) / (n1 + n0))
                          * (CAST((n1 + n0) - n1 AS DOUBLE) / (n1 + n0)))
                 - (CAST(nl AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))
                     * (1.0 - (CAST(p1 AS DOUBLE) / nl)
                              * (CAST(p1 AS DOUBLE) / nl)
                            - (CAST(nl - p1 AS DOUBLE) / nl)
                              * (CAST(nl - p1 AS DOUBLE) / nl))
                 - (CAST(nr AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))
                     * (1.0 - (CAST(n1 - p1 AS DOUBLE) / nr)
                              * (CAST(n1 - p1 AS DOUBLE) / nr)
                            - (CAST(nr - (n1 - p1) AS DOUBLE) / nr)
                              * (CAST(nr - (n1 - p1) AS DOUBLE) / nr)),
                 6) AS gain
        FROM sc),
      best AS (
        SELECT g, q, n1, n0, gain,
               ROW_NUMBER() OVER (PARTITION BY g
                 ORDER BY gain DESC, q ASC) AS rn
        FROM gn)
      SELECT g AS source, (n1 + n0)::BIGINT AS n, n1 AS n_pos,
             CAST(q AS DOUBLE) AS threshold,
             CAST(gain AS DOUBLE) AS gini_gain
      FROM best WHERE rn = 1
      ORDER BY source""",

    // Same daily cells as q_acf, the same calendar-shifted inner
    // join, HUGEINT Pearson moments mirroring decimal(38,0), one
    // rounded division with IEEE sqrt.
    "q_xcorr" -> """
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      lags AS (SELECT UNNEST([0, 1, 2]) AS lag),
      joined AS (
        SELECT a.g AS ga, b.g AS gb, l.lag, a.x AS xa, b.x AS xb
        FROM cells a CROSS JOIN lags l
        JOIN cells b ON a.day + l.lag = b.day AND a.g <> b.g),
      agg AS (
        SELECT ga, gb, lag::BIGINT AS lag, COUNT(*)::BIGINT AS n_days,
               SUM(xa::HUGEINT) AS sx, SUM(xb::HUGEINT) AS sy,
               SUM(xa::HUGEINT * xa) AS sxx, SUM(xb::HUGEINT * xb) AS syy,
               SUM(xa::HUGEINT * xb) AS sxy
        FROM joined GROUP BY 1, 2, 3),
      v AS (
        SELECT ga, gb, lag, n_days,
               CAST(n_days::HUGEINT * sxx - sx * sx AS DOUBLE) AS vx,
               CAST(n_days::HUGEINT * syy - sy * sy AS DOUBLE) AS vy,
               CAST(n_days::HUGEINT * sxy - sx * sy AS DOUBLE) AS cov
        FROM agg)
      SELECT ga AS group_a, gb AS group_b, lag, n_days,
             CAST(CASE WHEN vx > 0 AND vy > 0 THEN
               ROUND(cov / SQRT(vx * vy), 6) END AS DOUBLE) AS xcorr
      FROM v
      ORDER BY group_a, group_b, lag""",

    // Same exact scaled-long daily sums, the same 6-dp-rounded Holt
    // recursion unrolled day by day, forecasts from the last state.
    // Every coefficient is CAST to DOUBLE: a bare 0.3 literal is
    // DECIMAL in DuckDB and (1 - 0.3) would be an EXACT 0.7 where the
    // Spark kernel computes the IEEE double 1.0-0.3 — casting first
    // makes both engines run the identical float ops.
    // The q_holt_forecast recursion plus a 7-slot LIST seasonal ring:
    // init l0 = round6(list_sum(first 7)/7), s_i = round6(x_i - l0);
    // each step re-spells the operator's rounded level inside the
    // trend update (the holt precedent), ring = seas[2:] || [s_new].







    // Same block maxima, exact moment sums, 6-dp frozen mu/beta,
    // identical return-level trees (literal sqrt(6) and pi digits).
    "q_gumbel" -> """
      WITH bm AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d, MAX(value) AS v
        FROM events GROUP BY 1, 2),
      pts AS (SELECT g, CAST(ROUND(v * 1000000.0) AS BIGINT) AS x
              FROM bm),
      sums AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(x::HUGEINT) AS sx, SUM(x::HUGEINT * x) AS sxx
        FROM pts GROUP BY g),
      fit0 AS (
        SELECT g, n,
               CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
                 AS meanv,
               (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                   * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0)
                 / 1000000000000.0 AS vr
        FROM sums),
      fit AS (
        SELECT g, n,
               CASE WHEN n >= 2 AND vr > 0.0 THEN
                 ROUND(SQRT(vr) * 2.449489742783178
                   / 3.141592653589793, 6) END AS beta,
               meanv
        FROM fit0),
      fit2 AS (
        SELECT g, n, beta,
               CASE WHEN beta IS NOT NULL THEN
                 ROUND(meanv - 0.5772156649015329 * beta, 6) END AS mu
        FROM fit)
      SELECT g, n, mu, beta,
             CAST(t.t AS BIGINT) AS return_period,
             CAST(ROUND(mu - beta
               * LN(-LN(1.0 - 1.0 / CAST(t.t AS DOUBLE))), 6)
               AS DOUBLE) AS return_level
      FROM fit2 CROSS JOIN (VALUES (30), (365)) t(t)
      ORDER BY g, return_period""",

    // Same dedup-to-marks aggregate and the identical Chapman trees.
    "q_lincoln" -> """
      WITH marks AS (
        SELECT user_id AS id,
               MAX(CASE WHEN DAY(ts) <= 15 THEN 1 ELSE 0 END) AS in1,
               MAX(CASE WHEN DAY(ts) > 15 THEN 1 ELSE 0 END) AS in2
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
      agg AS (
        SELECT SUM(in1)::BIGINT AS n1, SUM(in2)::BIGINT AS n2,
               SUM(CASE WHEN in1 = 1 AND in2 = 1 THEN 1 ELSE 0 END)
                 ::BIGINT AS m
        FROM marks)
      SELECT n1, n2, m,
             CAST(CASE WHEN n1 > 0 AND n2 > 0 THEN
               ROUND((CAST(n1 AS DOUBLE) + 1.0)
                 * (CAST(n2 AS DOUBLE) + 1.0)
                 / (CAST(m AS DOUBLE) + 1.0) - 1.0, 6)
             END AS DOUBLE) AS n_hat,
             CAST(CASE WHEN n1 > 0 AND n2 > 0 THEN
               ROUND(SQRT((CAST(n1 AS DOUBLE) + 1.0)
                 * (CAST(n2 AS DOUBLE) + 1.0)
                 * (CAST(n1 AS DOUBLE) - CAST(m AS DOUBLE))
                 * (CAST(n2 AS DOUBLE) - CAST(m AS DOUBLE))
                 / ((CAST(m AS DOUBLE) + 1.0) * (CAST(m AS DOUBLE) + 1.0)
                   * (CAST(m AS DOUBLE) + 2.0))), 6)
             END AS DOUBLE) AS se
      FROM agg""",

    // Same panel, 12-dp frozen unit/time/grand means, identical
    // demeaned 12-dp product folds and beta/se/t trees.
    "q_twfe" -> """
      WITH panel AS (
        SELECT user_id % 20 AS u, CAST(ts AS DATE) AS d,
               CAST(ROUND(CAST(SUM(CAST(ROUND(value * 1000000.0)
                   AS BIGINT)) AS DOUBLE) / 1000000.0
                 / COUNT(*), 6) AS DOUBLE) AS y,
               CAST(COUNT(*) AS DOUBLE) AS x
        FROM events GROUP BY 1, 2),
      pts AS (
        SELECT u, d,
               CAST(ROUND(y * 1000000.0) AS BIGINT) AS yq,
               CAST(ROUND(x * 1000000.0) AS BIGINT) AS xq
        FROM panel),
      um AS (
        SELECT u,
               ROUND(CAST(SUM(yq::HUGEINT) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) / 1000000.0, 12) AS yu,
               ROUND(CAST(SUM(xq::HUGEINT) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) / 1000000.0, 12) AS xu
        FROM pts GROUP BY u),
      tm AS (
        SELECT d,
               ROUND(CAST(SUM(yq::HUGEINT) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) / 1000000.0, 12) AS yt,
               ROUND(CAST(SUM(xq::HUGEINT) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) / 1000000.0, 12) AS xt
        FROM pts GROUP BY d),
      gm AS (
        SELECT ROUND(CAST(SUM(yq::HUGEINT) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) / 1000000.0, 12) AS yg,
               ROUND(CAST(SUM(xq::HUGEINT) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) / 1000000.0, 12) AS xg,
               COUNT(DISTINCT u)::BIGINT AS nu,
               COUNT(DISTINCT d)::BIGINT AS nt
        FROM pts),
      dm AS (
        SELECT CAST(p.yq AS DOUBLE) / 1000000.0 - um.yu - tm.yt + gm.yg
                 AS dy,
               CAST(p.xq AS DOUBLE) / 1000000.0 - um.xu - tm.xt + gm.xg
                 AS dx
        FROM pts p JOIN um ON um.u = p.u JOIN tm ON tm.d = p.d
        CROSS JOIN gm),
      sums AS (
        SELECT COUNT(*)::BIGINT AS n,
               SUM(CAST(ROUND(dx * dx, 12) AS DECIMAL(38,12))) AS sxx,
               SUM(CAST(ROUND(dx * dy, 12) AS DECIMAL(38,12))) AS sxy,
               SUM(CAST(ROUND(dy * dy, 12) AS DECIMAL(38,12))) AS syy
        FROM dm),
      fin AS (
        SELECT n, gm.nu, gm.nt,
               CAST(sxy AS DOUBLE) / CAST(sxx AS DOUBLE) AS beta,
               CAST(n AS DOUBLE) - CAST(gm.nu AS DOUBLE)
                 - CAST(gm.nt AS DOUBLE) + 1.0 - 1.0 AS dof,
               CAST(syy AS DOUBLE) - CAST(sxy AS DOUBLE)
                 / CAST(sxx AS DOUBLE) * CAST(sxy AS DOUBLE) AS sse,
               CAST(sxx AS DOUBLE) AS sxxd
        FROM sums CROSS JOIN gm)
      SELECT n, nu AS n_units, nt AS n_times,
             CAST(CASE WHEN sxxd > 0.0 THEN ROUND(beta, 6) END
               AS DOUBLE) AS beta,
             CAST(CASE WHEN sxxd > 0.0 AND dof > 0.0 AND sse > 0.0
               THEN ROUND(SQRT(sse / dof / sxxd), 6) END AS DOUBLE)
               AS se,
             CAST(CASE WHEN sxxd > 0.0 AND dof > 0.0 AND sse > 0.0
               THEN ROUND(beta / SQRT(sse / dof / sxxd), 6)
               END AS DOUBLE) AS t
      FROM fin""",

    // Same daily means, exact HUGEINT cumulatives, identical 12-dp
    // ln-lambda tree + running max + rounded exp.
    "q_msprt" -> """
      WITH daily AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               CAST(ROUND(CAST(SUM(CAST(ROUND(value * 1000000.0)
                   AS BIGINT)) AS DOUBLE) / 1000000.0
                 / COUNT(*), 6) AS DOUBLE) AS x
        FROM events GROUP BY 1, 2),
      pts AS (
        SELECT g, d,
               CAST(ROUND((x - 100.0) * 1000000.0) AS BIGINT) AS xq
        FROM daily),
      cum AS (
        SELECT g, d,
               COUNT(*) OVER (PARTITION BY g ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 ::BIGINT AS n,
               SUM(xq::HUGEINT) OVER (PARTITION BY g ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        FROM pts),
      lam AS (
        SELECT g, d, n,
               ROUND(0.5 * LN(5000.0
                   / (5000.0 + CAST(n AS DOUBLE) * 1000.0))
                 + 1000.0 * (CAST(s AS DOUBLE) / 1000000.0)
                   * (CAST(s AS DOUBLE) / 1000000.0)
                   / (2.0 * 5000.0
                     * (5000.0 + CAST(n AS DOUBLE) * 1000.0)), 12)
                 AS lnl
        FROM cum),
      mx AS (
        SELECT g, d, n, lnl,
               MAX(lnl) OVER (PARTITION BY g ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
        FROM lam)
      SELECT g AS event_type, d, n,
             CAST(lnl AS DOUBLE) AS lambda_ln,
             CAST(ROUND(LEAST(1.0, EXP(-m)), 6) AS DOUBLE)
               AS p_always_valid
      FROM mx
      ORDER BY event_type, d""",

    // Same 1e6 quantization, exact HUGEINT co-moments, identical
    // corrected-cross-product / adjugate / T2 / F trees.
    "q_hotelling" -> """
      WITH rows0 AS (
        SELECT l_returnflag AS g,
               CAST(ROUND(CAST(l_quantity AS DOUBLE) * 1000000.0)
                 AS BIGINT) AS a,
               CAST(ROUND(CAST(l_extendedprice AS DOUBLE) * 1000000.0)
                 AS BIGINT) AS b
        FROM lineitem WHERE l_returnflag IN ('A', 'R')),
      agg AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(a::HUGEINT) AS sa, SUM(b::HUGEINT) AS sb,
               SUM(a::HUGEINT * a) AS saa, SUM(b::HUGEINT * b) AS sbb,
               SUM(a::HUGEINT * b) AS sab
        FROM rows0 GROUP BY g),
      j AS (
        SELECT x.g AS g1, x.n AS n1, x.sa AS sa1, x.sb AS sb1,
               x.saa AS saa1, x.sbb AS sbb1, x.sab AS sab1,
               y.g AS g2, y.n AS n2, y.sa AS sa2, y.sb AS sb2,
               y.saa AS saa2, y.sbb AS sbb2, y.sab AS sab2
        FROM agg x JOIN agg y ON x.g = 'A' AND y.g = 'R'),
      c1 AS (
        SELECT *,
          (CAST(saa1 AS DOUBLE) - CAST(sa1 AS DOUBLE) * CAST(sa1 AS DOUBLE)
             / CAST(n1 AS DOUBLE))
          + (CAST(saa2 AS DOUBLE) - CAST(sa2 AS DOUBLE) * CAST(sa2 AS DOUBLE)
             / CAST(n2 AS DOUBLE)) AS sxx,
          (CAST(sbb1 AS DOUBLE) - CAST(sb1 AS DOUBLE) * CAST(sb1 AS DOUBLE)
             / CAST(n1 AS DOUBLE))
          + (CAST(sbb2 AS DOUBLE) - CAST(sb2 AS DOUBLE) * CAST(sb2 AS DOUBLE)
             / CAST(n2 AS DOUBLE)) AS syy,
          (CAST(sab1 AS DOUBLE) - CAST(sa1 AS DOUBLE) * CAST(sb1 AS DOUBLE)
             / CAST(n1 AS DOUBLE))
          + (CAST(sab2 AS DOUBLE) - CAST(sa2 AS DOUBLE) * CAST(sb2 AS DOUBLE)
             / CAST(n2 AS DOUBLE)) AS sxy,
          CAST(sa1 AS DOUBLE) / CAST(n1 AS DOUBLE)
            - CAST(sa2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS da,
          CAST(sb1 AS DOUBLE) / CAST(n1 AS DOUBLE)
            - CAST(sb2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS db,
          CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) AS nn
        FROM j),
      c2 AS (
        SELECT *, sxx * syy - sxy * sxy AS det,
               (da * (syy * da - sxy * db)
                 + db * (sxx * db - sxy * da)) AS qn
        FROM c1),
      c3 AS (
        SELECT *, CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / nn
                 * (nn - 2.0) * (qn / det) AS t2
        FROM c2)
      SELECT g1 AS group_a, g2 AS group_b,
             n1 AS n_a, n2 AS n_b,
             CAST(CASE WHEN n1 >= 2 AND n2 >= 2 AND det > 0.0
               THEN ROUND(t2, 6) END AS DOUBLE) AS t2,
             CAST(CASE WHEN n1 >= 2 AND n2 >= 2 AND det > 0.0
                    AND nn > 3.0
               THEN ROUND((nn - 3.0) / (2.0 * (nn - 2.0)) * t2, 6)
               END AS DOUBLE) AS f
      FROM c3""",

    // Exact counts, 12-dp rates, identical unpooled-se z trees.
    "q_tost_prop" -> """
      WITH rows0 AS (
        SELECT event_type AS g,
               CASE WHEN value > 100 THEN 1 ELSE 0 END AS k
        FROM events WHERE event_type IN ('click', 'view')),
      agg AS (SELECT g, COUNT(*)::BIGINT AS n, SUM(k)::BIGINT AS sk
              FROM rows0 GROUP BY g),
      j AS (
        SELECT x.g AS group_a, x.n AS n1, x.sk AS k1,
               y.g AS group_b, y.n AS n2, y.sk AS k2
        FROM agg x JOIN agg y ON x.g = 'click' AND y.g = 'view'),
      c1 AS (
        SELECT *, ROUND(CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE), 12) AS p1,
               ROUND(CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE), 12) AS p2
        FROM j),
      c2 AS (
        SELECT *, p1 - p2 AS diff,
               SQRT(p1 * (1.0 - p1) / CAST(n1 AS DOUBLE)
                 + p2 * (1.0 - p2) / CAST(n2 AS DOUBLE)) AS se
        FROM c1)
      SELECT group_a, group_b, n1 AS n_a, k1 AS k_a, n2 AS n_b,
             k2 AS k_b,
             CAST(ROUND(diff, 6) AS DOUBLE) AS diff,
             CAST(CASE WHEN n1 >= 1 AND n2 >= 1 AND se > 0.0
               THEN ROUND((diff + 0.05) / se, 6) END AS DOUBLE)
               AS z_lower,
             CAST(CASE WHEN n1 >= 1 AND n2 >= 1 AND se > 0.0
               THEN ROUND((0.05 - diff) / se, 6) END AS DOUBLE)
               AS z_upper,
             CAST(CASE WHEN n1 >= 1 AND n2 >= 1 AND se > 0.0
               THEN ROUND(LEAST((diff + 0.05) / se, (0.05 - diff) / se), 6)
               END AS DOUBLE) AS z_tost
      FROM c2""",

    // Same frozen-grid binning, exact HUGEINT bin-pair sums, the
    // identical 2A-B-C trees.
    "q_energy_dist" -> """
      WITH base AS (
        SELECT event_type AS g, value AS v FROM events
        WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
      st AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM base),
      cells AS (
        SELECT g,
               CASE WHEN hi > lo THEN LEAST(CAST(FLOOR((v - lo) * 64
                 / (hi - lo)) AS BIGINT), 63) ELSE 0 END AS b,
               COUNT(*)::BIGINT AS c
        FROM base, st GROUP BY 1, 2),
      sa AS (SELECT SUM(x.c::HUGEINT * y.c * ABS(x.b - y.b)) AS s
             FROM cells x, cells y
             WHERE x.g = 'click' AND y.g = 'purchase'),
      sb AS (SELECT SUM(x.c::HUGEINT * y.c * ABS(x.b - y.b)) AS s
             FROM cells x, cells y
             WHERE x.g = 'click' AND y.g = 'click'),
      sc AS (SELECT SUM(x.c::HUGEINT * y.c * ABS(x.b - y.b)) AS s
             FROM cells x, cells y
             WHERE x.g = 'purchase' AND y.g = 'purchase'),
      ns AS (
        SELECT SUM(CASE WHEN g = 'click' THEN c ELSE 0 END)::BIGINT AS n1,
               SUM(CASE WHEN g = 'purchase' THEN c ELSE 0 END)::BIGINT
                 AS n2
        FROM cells),
      fin AS (
        SELECT n1, n2,
               CAST(sa.s AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS a,
               CAST(sb.s AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)) AS b,
               CAST(sc.s AS DOUBLE)
                 / (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS c
        FROM sa, sb, sc, ns)
      SELECT 'click' AS group_a, 'purchase' AS group_b,
             n1 AS n_a, n2 AS n_b,
             CAST(ROUND(a, 6) AS DOUBLE) AS a_cross,
             CAST(ROUND(b, 6) AS DOUBLE) AS b_within,
             CAST(ROUND(c, 6) AS DOUBLE) AS c_within,
             CAST(ROUND(2.0 * a - b - c, 6) AS DOUBLE) AS energy_d,
             CAST(ROUND(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
               * (2.0 * a - b - c), 6) AS DOUBLE) AS t_stat
      FROM fin""",

    // Same daily 24-trial panel, 12-dp rate sums, identical MoM trees.
    "q_beta_binomial" -> """
      WITH days AS (
        SELECT CAST(ts AS DATE) AS d,
               COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                 THEN HOUR(ts) END)::BIGINT AS k
        FROM events GROUP BY 1),
      r0 AS (
        SELECT k, 24::BIGINT AS m,
               ROUND(CAST(k AS DOUBLE) / CAST(24 AS DOUBLE), 12) AS p
        FROM days),
      agg AS (
        SELECT COUNT(*)::BIGINT AS nu,
               MIN(m)::BIGINT AS mmin, MAX(m)::BIGINT AS mmax,
               SUM(k)::BIGINT AS sk, SUM(m)::BIGINT AS sm,
               SUM(CAST(p AS DECIMAL(38,12))) AS sp,
               SUM(CAST(p AS DECIMAL(38,12))
                 * CAST(p AS DECIMAL(38,12))) AS spp
        FROM r0),
      fin AS (
        SELECT nu, mmin,
               CAST(sk AS DOUBLE) / CAST(sm AS DOUBLE) AS p,
               (CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE)
                  * CAST(sp AS DOUBLE) / CAST(nu AS DOUBLE))
                 / (CAST(nu AS DOUBLE) - 1.0) AS s2,
               CAST(mmin AS DOUBLE) AS m
        FROM agg),
      fin2 AS (
        SELECT nu, mmin, p,
               (m * s2 / (p * (1.0 - p)) - 1.0) / (m - 1.0) AS rho
        FROM fin)
      SELECT nu AS n_units, mmin AS trials,
             CAST(ROUND(p, 6) AS DOUBLE) AS p_hat,
             CAST(CASE WHEN nu >= 2 AND p > 0.0 AND p < 1.0 AND mmin >= 2
               THEN ROUND(rho, 6) END AS DOUBLE) AS rho,
             CAST(CASE WHEN nu >= 2 AND p > 0.0 AND p < 1.0 AND mmin >= 2
                    AND rho > 0.0 AND rho < 1.0
               THEN ROUND(p * (1.0 / rho - 1.0), 6)
               END AS DOUBLE) AS alpha,
             CAST(CASE WHEN nu >= 2 AND p > 0.0 AND p < 1.0 AND mmin >= 2
                    AND rho > 0.0 AND rho < 1.0
               THEN ROUND((1.0 - p) * (1.0 / rho - 1.0), 6)
               END AS DOUBLE) AS beta
      FROM fin2""",

    // Exact counts and 1e6-quantized exposures; identical Wald trees.
    "q_poisson_test" -> """
      WITH r0 AS (
        SELECT CASE WHEN DAY(ts) <= 15 THEN 'h1' ELSE 'h2' END AS g,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS k,
               1000000::BIGINT AS t
        FROM events),
      agg AS (SELECT g, SUM(k)::HUGEINT AS sk, SUM(t)::HUGEINT AS st
              FROM r0 GROUP BY g),
      a AS (SELECT g AS group_a, sk AS k1, st AS t1 FROM agg
            WHERE g = 'h1'),
      b AS (SELECT g AS group_b, sk AS k2, st AS t2 FROM agg
            WHERE g = 'h2'),
      fin AS (
        SELECT group_a, group_b, k1, k2,
               CAST(t1 AS DOUBLE) / 1000000.0 AS te1,
               CAST(t2 AS DOUBLE) / 1000000.0 AS te2
        FROM a CROSS JOIN b),
      fin2 AS (
        SELECT group_a, group_b, k1, k2, te1, te2,
               CAST(k1 AS DOUBLE) / te1 AS r1,
               CAST(k2 AS DOUBLE) / te2 AS r2
        FROM fin)
      SELECT group_a, group_b,
             CAST(k1 AS BIGINT) AS k_a, CAST(k2 AS BIGINT) AS k_b,
             CAST(CASE WHEN te1 > 0 THEN ROUND(r1, 6) END AS DOUBLE)
               AS rate_a,
             CAST(CASE WHEN te2 > 0 THEN ROUND(r2, 6) END AS DOUBLE)
               AS rate_b,
             CAST(CASE WHEN te1 > 0 AND te2 > 0 AND r2 > 0.0
               THEN ROUND(r1 / r2, 6) END AS DOUBLE) AS ratio,
             CAST(CASE WHEN te1 > 0 AND te2 > 0 AND (k1 > 0 OR k2 > 0)
               THEN ROUND((r1 - r2) / SQRT(CAST(k1 AS DOUBLE)
                 / (te1 * te1) + CAST(k2 AS DOUBLE) / (te2 * te2)), 6)
               END AS DOUBLE) AS z
      FROM fin2""",

    // The q_lin_fit equilibrium trees on the cumulative series, 6-dp
    // residuals, then the q_dickey_fuller no-constant regression.
    "q_engle_granger" -> """
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               SUM(CASE WHEN event_type = 'click'
                 THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS xc,
               SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS yc
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY 1),
      cum AS (
        SELECT d,
               SUM(xc) OVER (ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / 100.0 AS x,
               SUM(yc) OVER (ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / 100.0 AS y
        FROM daily),
      pts AS (
        SELECT d, x, y,
               CAST(ROUND(x * 1000000.0) AS BIGINT) AS xq,
               CAST(ROUND(y * 1000000.0) AS BIGINT) AS yq
        FROM cum),
      s AS (
        SELECT COUNT(*)::BIGINT AS n,
               SUM(xq::HUGEINT) AS sx, SUM(yq::HUGEINT) AS sy,
               SUM(xq::HUGEINT * xq) AS sxx, SUM(yq::HUGEINT * yq) AS syy,
               SUM(xq::HUGEINT * yq) AS sxy
        FROM pts),
      dd AS (
        SELECT n,
               CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
               CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS denx,
               CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny,
               CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        FROM s),
      fit AS (
        SELECT n,
               CASE WHEN denx > 0.0 THEN ROUND(num / denx, 6) END AS slope,
               CASE WHEN denx > 0.0 THEN
                 ROUND(syd / CAST(n AS DOUBLE) / 1000000.0
                   - num / denx * (sxd / CAST(n AS DOUBLE) / 1000000.0), 6)
               END AS intercept,
               CASE WHEN denx > 0.0 AND deny > 0.0 THEN
                 ROUND(num * num / (denx * deny), 6) END AS r2
        FROM dd),
      resid AS (
        SELECT p.d,
               CAST(ROUND(ROUND(p.y - (f.intercept + f.slope * p.x), 6)
                 * 1000000.0) AS BIGINT) AS rv
        FROM pts p, fit f),
      pairs AS (
        SELECT lagv AS xx, rv - lagv AS yy FROM (
          SELECT rv, LAG(rv) OVER (ORDER BY d) AS lagv FROM resid)
        WHERE lagv IS NOT NULL),
      s2 AS (
        SELECT COUNT(*)::BIGINT AS n,
               SUM(xx::HUGEINT) AS sx, SUM(yy::HUGEINT) AS sy,
               SUM(xx::HUGEINT * xx) AS sxx, SUM(yy::HUGEINT * yy) AS syy,
               SUM(xx::HUGEINT * yy) AS sxy
        FROM pairs),
      d2 AS (
        SELECT n,
               CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS cxx,
               CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cxy,
               CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS cyy
        FROM s2),
      adf AS (
        SELECT CASE WHEN n >= 3 AND cxx > 0.0
                 THEN ROUND(cxy / cxx, 6) END AS gamma,
               CASE WHEN n >= 3 AND cxx > 0.0
                    AND cyy - cxy / cxx * cxy > 0.0 THEN
                 ROUND((cxy / cxx)
                   / SQRT((((cyy - cxy / cxx * cxy) / CAST(n AS DOUBLE))
                       / (CAST(n AS DOUBLE) - 2.0))
                     / (cxx / CAST(n AS DOUBLE))), 6)
               END AS adf_t
        FROM d2)
      SELECT 'all' AS g, f.n, f.slope AS beta, f.intercept, f.r2,
             a.gamma, a.adf_t
      FROM fit f CROSS JOIN adf a""",

    // The q_psm_ate logistic unroll verbatim; per-arm closed-form OLS
    // moments; the identical clipped AIPW contribution tree.
    // Double-ML: the ridgeFit Cramer trees for BOTH nuisance targets
    // (6-dp frozen coefficients), 6-dp residuals re-quantized to 1e6
    // longs, exact HUGEINT 2nd/3rd/4th-order folds, the frozen-theta
    // sandwich se — every tree spelled from the Spark code.
    "q_dml" -> """
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(CAST(HOUR(ts) AS DOUBLE) * 1000000.0)
                 AS BIGINT) AS x1,
               CAST(ROUND(CAST(DAY(ts) AS DOUBLE) * 1000000.0)
                 AS BIGINT) AS x2,
               CAST(ROUND((CASE WHEN user_id % 24 < HOUR(ts) THEN 1.0
                 ELSE 0.0 END) * 1000000.0) AS BIGINT) AS t,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS y
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      grm AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(CAST(x1 AS HUGEINT)) AS s1,
               SUM(CAST(x2 AS HUGEINT)) AS s2,
               SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(t AS HUGEINT)) AS st,
               SUM(CAST(x1 AS HUGEINT) * x1) AS s11,
               SUM(CAST(x2 AS HUGEINT) * x2) AS s22,
               SUM(CAST(x1 AS HUGEINT) * x2) AS s12,
               SUM(CAST(x1 AS HUGEINT) * y) AS s1y,
               SUM(CAST(x2 AS HUGEINT) * y) AS s2y,
               SUM(CAST(x1 AS HUGEINT) * t) AS s1t,
               SUM(CAST(x2 AS HUGEINT) * t) AS s2t
        FROM pts GROUP BY g),
      ctr AS (
        SELECT g, n,
               CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
               CAST(sy AS DOUBLE) AS syd, CAST(st AS DOUBLE) AS std,
               (CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) * 1.5 AS c11,
               (CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE)
                 - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)) * 1.5 AS c22,
               CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS c12,
               CAST(n AS DOUBLE) * CAST(s1y AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) AS c1y,
               CAST(n AS DOUBLE) * CAST(s2y AS DOUBLE)
                 - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) AS c2y,
               CAST(n AS DOUBLE) * CAST(s1t AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(st AS DOUBLE) AS c1t,
               CAST(n AS DOUBLE) * CAST(s2t AS DOUBLE)
                 - CAST(s2 AS DOUBLE) * CAST(st AS DOUBLE) AS c2t
        FROM grm),
      coefs AS (
        SELECT g, n,
               CASE WHEN n >= 3 AND c11 * c22 - c12 * c12 > 0.0 THEN
                 ROUND(((syd - ((c1y * c22 - c2y * c12)
                     / (c11 * c22 - c12 * c12)) * s1d
                   - ((c2y * c11 - c1y * c12)
                     / (c11 * c22 - c12 * c12)) * s2d)
                   / CAST(n AS DOUBLE)) / 1000000.0, 6) END AS by0,
               CASE WHEN n >= 3 AND c11 * c22 - c12 * c12 > 0.0 THEN
                 ROUND((c1y * c22 - c2y * c12)
                   / (c11 * c22 - c12 * c12), 6) END AS by1,
               CASE WHEN n >= 3 AND c11 * c22 - c12 * c12 > 0.0 THEN
                 ROUND((c2y * c11 - c1y * c12)
                   / (c11 * c22 - c12 * c12), 6) END AS by2,
               CASE WHEN n >= 3 AND c11 * c22 - c12 * c12 > 0.0 THEN
                 ROUND(((std - ((c1t * c22 - c2t * c12)
                     / (c11 * c22 - c12 * c12)) * s1d
                   - ((c2t * c11 - c1t * c12)
                     / (c11 * c22 - c12 * c12)) * s2d)
                   / CAST(n AS DOUBLE)) / 1000000.0, 6) END AS bt0,
               CASE WHEN n >= 3 AND c11 * c22 - c12 * c12 > 0.0 THEN
                 ROUND((c1t * c22 - c2t * c12)
                   / (c11 * c22 - c12 * c12), 6) END AS bt1,
               CASE WHEN n >= 3 AND c11 * c22 - c12 * c12 > 0.0 THEN
                 ROUND((c2t * c11 - c1t * c12)
                   / (c11 * c22 - c12 * c12), 6) END AS bt2
        FROM ctr),
      resid AS (
        SELECT p.g, c.n,
               CAST(ROUND(ROUND(p.y / 1000000.0 - c.by0
                 - c.by1 * (p.x1 / 1000000.0)
                 - c.by2 * (p.x2 / 1000000.0), 6) * 1000000.0)
                 AS BIGINT) AS eyl,
               CAST(ROUND(ROUND(p.t / 1000000.0 - c.bt0
                 - c.bt1 * (p.x1 / 1000000.0)
                 - c.bt2 * (p.x2 / 1000000.0), 6) * 1000000.0)
                 AS BIGINT) AS etl
        FROM pts p JOIN coefs c ON c.g = p.g),
      folded AS (
        SELECT g, n,
               SUM(CAST(etl AS HUGEINT) * etl) AS a2,
               SUM(CAST(etl AS HUGEINT) * eyl) AS ab,
               SUM(CAST(etl AS HUGEINT) * etl * eyl * eyl) AS m22,
               SUM(CAST(etl AS HUGEINT) * etl * etl * eyl) AS m31,
               SUM(CAST(etl AS HUGEINT) * etl * etl * etl) AS m40
        FROM resid GROUP BY g, n),
      fin AS (
        SELECT g, n,
               CASE WHEN a2 IS NOT NULL AND CAST(a2 AS DOUBLE) > 0.0
                 THEN ROUND(CAST(ab AS DOUBLE) / CAST(a2 AS DOUBLE), 6)
               END AS th,
               CAST(a2 AS DOUBLE) AS a2d, CAST(m22 AS DOUBLE) AS m22d,
               CAST(m31 AS DOUBLE) AS m31d, CAST(m40 AS DOUBLE) AS m40d
        FROM folded)
      SELECT g, n, CAST(0.5 AS DOUBLE) AS lambda,
             CAST(th AS DOUBLE) AS theta,
             CASE WHEN th IS NOT NULL THEN
               CAST(ROUND(SQRT(m22d - 2.0 * th * m31d
                 + th * th * m40d) / a2d, 6) AS DOUBLE)
             END AS se_theta,
             CASE WHEN th IS NOT NULL
                   AND m22d - 2.0 * th * m31d + th * th * m40d > 0.0
               THEN CAST(ROUND(th / (SQRT(m22d - 2.0 * th * m31d
                 + th * th * m40d) / a2d), 6) AS DOUBLE)
             END AS t_theta
      FROM fin
      ORDER BY g""",

    "q_aipw" -> """
      WITH pts AS (
        SELECT ROUND(CAST(HOUR(ts) AS DOUBLE), 6) AS x,
               CASE WHEN user_id % 24 < HOUR(ts) THEN 1.0 ELSE 0.0 END
                 AS t,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS y
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      pr1 AS (
        SELECT x, t, y, 0.0 AS a, 0.0 AS b,
               1.0 / (1.0 + EXP(-(0.0 + 0.0 * x))) AS p
        FROM pts),
      t1 AS (
        SELECT MAX(a) AS a, MAX(b) AS b,
               SUM(CAST(ROUND(t - p, 12) AS DECIMAL(38,12))) AS g0,
               SUM(CAST(ROUND(x * (t - p), 12) AS DECIMAL(38,12))) AS g1,
               SUM(CAST(ROUND(p * (1.0 - p), 12) AS DECIMAL(38,12)))
                 AS h00,
               SUM(CAST(ROUND(x * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h01,
               SUM(CAST(ROUND(x * x * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h11
        FROM pr1),
      d1 AS (
        SELECT *, CAST(h00 AS DOUBLE) * CAST(h11 AS DOUBLE)
                  - CAST(h01 AS DOUBLE) * CAST(h01 AS DOUBLE) AS det
        FROM t1),
      p1 AS (
        SELECT
          CASE WHEN det > 0.0 THEN ROUND(a
            + (CAST(g0 AS DOUBLE) * CAST(h11 AS DOUBLE)
               - CAST(g1 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE a END AS a,
          CASE WHEN det > 0.0 THEN ROUND(b
            + (CAST(g1 AS DOUBLE) * CAST(h00 AS DOUBLE)
               - CAST(g0 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE b END AS b
        FROM d1),
      pr2 AS (
        SELECT x, t, y, a, b,
               1.0 / (1.0 + EXP(-(a + b * x))) AS p
        FROM pts, p1),
      t2 AS (
        SELECT MAX(a) AS a, MAX(b) AS b,
               SUM(CAST(ROUND(t - p, 12) AS DECIMAL(38,12))) AS g0,
               SUM(CAST(ROUND(x * (t - p), 12) AS DECIMAL(38,12))) AS g1,
               SUM(CAST(ROUND(p * (1.0 - p), 12) AS DECIMAL(38,12)))
                 AS h00,
               SUM(CAST(ROUND(x * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h01,
               SUM(CAST(ROUND(x * x * (p * (1.0 - p)), 12)
                 AS DECIMAL(38,12))) AS h11
        FROM pr2),
      d2 AS (
        SELECT *, CAST(h00 AS DOUBLE) * CAST(h11 AS DOUBLE)
                  - CAST(h01 AS DOUBLE) * CAST(h01 AS DOUBLE) AS det
        FROM t2),
      p2 AS (
        SELECT
          CASE WHEN det > 0.0 THEN ROUND(a
            + (CAST(g0 AS DOUBLE) * CAST(h11 AS DOUBLE)
               - CAST(g1 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE a END AS a,
          CASE WHEN det > 0.0 THEN ROUND(b
            + (CAST(g1 AS DOUBLE) * CAST(h00 AS DOUBLE)
               - CAST(g0 AS DOUBLE) * CAST(h01 AS DOUBLE)) / det, 12)
          ELSE b END AS b
        FROM d2),
      fit AS (SELECT ROUND(a, 6) AS alpha, ROUND(b, 6) AS beta FROM p2),
      arms AS (
        SELECT t, COUNT(*)::BIGINT AS n,
               SUM(CAST(ROUND(x * 1000000.0) AS BIGINT)::HUGEINT) AS sx,
               SUM(y::HUGEINT) AS sy,
               SUM(CAST(ROUND(x * 1000000.0) AS BIGINT)::HUGEINT
                 * CAST(ROUND(x * 1000000.0) AS BIGINT)) AS sxx,
               SUM(CAST(ROUND(x * 1000000.0) AS BIGINT)::HUGEINT * y)
                 AS sxy
        FROM pts GROUP BY t),
      afit AS (
        SELECT t, n,
               CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
                 THEN ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
                 ELSE 0.0 END AS b,
               CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
                 THEN ROUND((CAST(sy AS DOUBLE)
                     - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE) / 1000000.0, 6)
                 ELSE ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                   / 1000000.0, 6) END AS a
        FROM arms),
      f1 AS (SELECT a AS a1, b AS b1 FROM afit WHERE t = 1.0),
      f0 AS (SELECT a AS a0, b AS b0 FROM afit WHERE t = 0.0),
      scored AS (
        SELECT t, y,
               LEAST(GREATEST(
                 ROUND(1.0 / (1.0 + EXP(-(alpha + beta * x))), 6),
                 0.01), 0.99) AS e,
               a1 + b1 * x AS m1,
               a0 + b0 * x AS m0
        FROM pts, fit, f1, f0),
      terms AS (
        SELECT t, y,
               ROUND(m1 - m0
                 + t * (CAST(y AS DOUBLE) / 1000000.0 - m1) / e
                 - (1.0 - t) * (CAST(y AS DOUBLE) / 1000000.0 - m0)
                   / (1.0 - e), 12) AS term
        FROM scored),
      agg AS (
        SELECT COUNT(*)::BIGINT AS n,
               SUM(CASE WHEN t = 1.0 THEN 1 ELSE 0 END)::BIGINT
                 AS n_treat,
               SUM(CAST(term AS DECIMAL(38,12))) AS s,
               SUM(CASE WHEN t = 1.0 THEN y::HUGEINT END) AS sy1,
               SUM(CASE WHEN t = 0.0 THEN y::HUGEINT END) AS sy0
        FROM terms)
      SELECT n, n_treat,
             CAST(CASE WHEN n_treat > 0 AND n_treat < n THEN
               ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6)
             END AS DOUBLE) AS ate_aipw,
             CAST(CASE WHEN n_treat > 0 AND n_treat < n THEN
               ROUND(CAST(sy1 AS DOUBLE) / CAST(n_treat AS DOUBLE)
                   / 1000000.0
                 - CAST(sy0 AS DOUBLE)
                   / (CAST(n AS DOUBLE) - CAST(n_treat AS DOUBLE))
                   / 1000000.0, 6)
             END AS DOUBLE) AS ate_naive
      FROM agg""",

    // Exact 2·JT from the same per-group exclusive cumulatives on the
    // value grid; the identical mean/variance/z double trees.
    "q_jonckheere" -> """
      WITH cells AS (
        SELECT o_orderpriority AS g,
               ROUND(CAST(o_totalprice AS DOUBLE), 6) AS q,
               COUNT(*)::BIGINT AS c
        FROM orders GROUP BY 1, 2),
      vals AS (SELECT DISTINCT q FROM cells),
      gs AS (SELECT DISTINCT g FROM cells),
      grid AS (
        SELECT gs.g, vals.q, COALESCE(c.c, 0)::BIGINT AS c0
        FROM vals CROSS JOIN gs
        LEFT JOIN cells c ON c.g = gs.g AND c.q = vals.q),
      cum AS (
        SELECT g, q, c0,
               COALESCE(SUM(c0) OVER (PARTITION BY g ORDER BY q
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0)::BIGINT AS cb
        FROM grid),
      jt AS (
        SELECT SUM(j.c::HUGEINT * (2 * i.cb + i.c0)) AS jt2
        FROM cum i JOIN cells j ON i.q = j.q AND i.g < j.g),
      ns AS (
        SELECT COUNT(*)::BIGINT AS k, SUM(n)::BIGINT AS nn,
               SUM(n::HUGEINT * n) AS sn2,
               SUM(n::HUGEINT * n * (2 * n + 3)) AS sn23
        FROM (SELECT g, SUM(c)::BIGINT AS n FROM cells GROUP BY g)),
      fin AS (
        SELECT jt2, k, nn,
               (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
                 - CAST(sn2 AS DOUBLE)) / 4.0 AS mean,
               (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
                   * (2.0 * CAST(nn AS DOUBLE) + 3.0)
                 - CAST(sn23 AS DOUBLE)) / 72.0 AS var
        FROM jt CROSS JOIN ns)
      SELECT nn AS n, k,
             CAST(ROUND(CAST(jt2 AS DOUBLE) / 2.0, 6) AS DOUBLE) AS jt,
             CAST(CASE WHEN k >= 2 AND var > 0.0 THEN
               ROUND((CAST(jt2 AS DOUBLE) / 2.0 - mean) / SQRT(var), 6)
             END AS DOUBLE) AS z
      FROM fin""",

    // The doubled-midrank machinery with exact integer 2nD deviation
    // cores and the reference W/df/p-hat trees.
    "q_brunner_munzel" -> """
      WITH cells AS (
        SELECT event_type AS g, ROUND(value, 6) AS q, COUNT(*)::BIGINT AS c
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY 1, 2),
      tot AS (
        SELECT q AS tq, SUM(c)::BIGINT AS e,
               COALESCE(SUM(SUM(c)) OVER (ORDER BY q
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0)::BIGINT AS cball
        FROM cells GROUP BY q),
      mid AS (
        SELECT c.g, c.q, c.c,
               2 * t.cball + t.e + 1 AS m2c,
               2 * COALESCE(SUM(c.c) OVER (PARTITION BY c.g ORDER BY c.q
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + c.c + 1 AS m2w
        FROM cells c JOIN tot t ON c.q = t.tq),
      p1 AS (
        SELECT g, SUM(c)::BIGINT AS n,
               SUM(c::HUGEINT * m2c) AS t2
        FROM mid GROUP BY g),
      dev AS (
        SELECT m.g, MAX(p.n) AS n, MAX(p.t2) AS t2,
               SUM(m.c::HUGEINT
                 * (p.n::HUGEINT * (m.m2c - m.m2w) - p.t2
                    + p.n::HUGEINT * (p.n + 1))
                 * (p.n::HUGEINT * (m.m2c - m.m2w) - p.t2
                    + p.n::HUGEINT * (p.n + 1))) AS sd2
        FROM mid m JOIN p1 p ON p.g = m.g GROUP BY m.g),
      gstats AS (
        SELECT g, n, t2, sd2,
               CAST(t2 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE)) AS mr,
               CASE WHEN n > 1 THEN CAST(sd2 AS DOUBLE)
                 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                   * (CAST(n AS DOUBLE) - 1.0)) END AS s2,
               ROW_NUMBER() OVER (ORDER BY g) AS rn
        FROM dev),
      ab AS (
        SELECT a.g AS group_a, b.g AS group_b,
               a.n AS n1, b.n AS n2, a.mr AS mr1, b.mr AS mr2,
               a.s2 AS s21, b.s2 AS s22,
               CAST(a.n AS DOUBLE) * a.s2
                 + CAST(b.n AS DOUBLE) * b.s2 AS vsum
        FROM gstats a JOIN gstats b ON a.rn = 1 AND b.rn = 2)
      SELECT group_a, group_b, n1 AS n_a, n2 AS n_b,
             CAST(ROUND((mr2 - (CAST(n2 AS DOUBLE) + 1.0) / 2.0)
               / CAST(n1 AS DOUBLE), 6) AS DOUBLE) AS p_hat,
             CAST(CASE WHEN vsum > 0.0 THEN
               ROUND(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * (mr2 - mr1)
                 / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                   * SQRT(vsum)), 6) END AS DOUBLE) AS w,
             CAST(CASE WHEN vsum > 0.0 AND n1 > 1 AND n2 > 1 THEN
               ROUND(vsum * vsum
                 / ((CAST(n1 AS DOUBLE) * s21) * (CAST(n1 AS DOUBLE) * s21)
                     / (CAST(n1 AS DOUBLE) - 1.0)
                   + (CAST(n2 AS DOUBLE) * s22) * (CAST(n2 AS DOUBLE) * s22)
                     / (CAST(n2 AS DOUBLE) - 1.0)), 6)
             END AS DOUBLE) AS df
      FROM ab""",

    // The q_friedman prep verbatim + per-block tie sums; the identical
    // tie-corrected W tree.
    "q_kendall_w" -> """
      WITH cells AS (
        SELECT event_type AS i,
               DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS b,
               CAST(ROUND((CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                 AS BIGINT) / 100.0) * 1000000.0) AS BIGINT) AS v
        FROM events GROUP BY 1, CAST(ts AS DATE)),
      k AS (SELECT COUNT(DISTINCT i)::BIGINT AS k FROM cells),
      complete AS (
        SELECT b FROM cells CROSS JOIN k
        GROUP BY b, k HAVING COUNT(DISTINCT i) = MAX(k)),
      ranked AS (
        SELECT c.i, c.b, c.v,
               2 * RANK() OVER (PARTITION BY c.b ORDER BY c.v)
                 + COUNT(*) OVER (PARTITION BY c.b, c.v) - 1 AS m2
        FROM cells c JOIN complete cb ON c.b = cb.b),
      pert AS (
        SELECT i, SUM(m2::HUGEINT) AS r2, COUNT(*)::BIGINT AS nb
        FROM ranked GROUP BY i),
      agg AS (
        SELECT MAX(nb)::BIGINT AS m, COUNT(*)::BIGINT AS kk,
               SUM(r2 * r2) AS sr2q
        FROM pert),
      ties AS (
        SELECT COALESCE(SUM(t::HUGEINT * t * t - t), 0) AS st
        FROM (SELECT b, v, COUNT(*)::BIGINT AS t
              FROM ranked GROUP BY b, v)),
      fin AS (
        SELECT m, kk,
               12.0 * (CAST(sr2q AS DOUBLE) / 4.0)
                 - 3.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)
                   * CAST(kk AS DOUBLE) * (CAST(kk AS DOUBLE) + 1.0)
                   * (CAST(kk AS DOUBLE) + 1.0) AS num,
               CAST(m AS DOUBLE) * CAST(m AS DOUBLE) * CAST(kk AS DOUBLE)
                   * (CAST(kk AS DOUBLE) * CAST(kk AS DOUBLE) - 1.0)
                 - CAST(m AS DOUBLE) * CAST(st AS DOUBLE) AS den
        FROM agg CROSS JOIN ties)
      SELECT m AS n_blocks, kk AS k,
             CAST(CASE WHEN m >= 1 AND den > 0.0
               THEN ROUND(num / den, 6) END AS DOUBLE) AS w
      FROM fin""",

    // Trend by the identical closed-form double tree (a, b frozen at
    // 6 dp), 6-dp theta line, SES recursion with trend pinned 0, the
    // same equal-weight combination.
    "q_theta_forecast" -> """
      WITH RECURSIVE s AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               CAST(ROUND(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))
                 / 1000000.0, 6) AS DOUBLE) AS x
        FROM events GROUP BY 1, 2),
      si AS (SELECT g, d, x,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY d) AS i,
               CAST(ROUND(x * 1000000.0) AS BIGINT) AS xq
             FROM s),
      sums AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(i::HUGEINT) AS st, SUM(xq::HUGEINT) AS sx,
               SUM(i::HUGEINT * xq) AS stx, SUM(i::HUGEINT * i) AS stt
        FROM si GROUP BY g),
      fl AS (
        SELECT g, n,
               CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                 - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) AS det,
               CAST(st AS DOUBLE) AS std, CAST(sx AS DOUBLE) AS sxd,
               CAST(stx AS DOUBLE) AS stxd
        FROM sums),
      ab0 AS (
        SELECT g, n, det,
               (CAST(n AS DOUBLE) * stxd - std * sxd) / det AS bs,
               std, sxd
        FROM fl),
      ab AS (
        SELECT g, n,
               CASE WHEN det > 0.0 THEN ROUND(
                 ((sxd - bs * std) / CAST(n AS DOUBLE)) / 1000000.0, 6)
                 ELSE ROUND(sxd / CAST(n AS DOUBLE) / 1000000.0, 6)
               END AS a,
               CASE WHEN det > 0.0 THEN ROUND(bs / 1000000.0, 6)
                 ELSE 0.0 END AS b
        FROM ab0),
      th AS (
        SELECT si.g, si.i, si.x,
               ROUND(2.0 * si.x - (ab.a + ab.b * si.i), 6) AS l2
        FROM si JOIN ab ON ab.g = si.g),
      rec AS (
        SELECT g, i, l2 AS level FROM th WHERE i = 1
        UNION ALL
        SELECT th.g, th.i,
               ROUND(0.3 * th.l2 + (1.0 - 0.3) * (r.level + 0.0), 6)
        FROM rec r JOIN th ON th.g = r.g AND th.i = r.i + 1),
      fin AS (SELECT g, level,
                ROW_NUMBER() OVER (PARTITION BY g ORDER BY i DESC) AS rn
              FROM rec)
      SELECT fin.g AS event_type, CAST(h.h AS BIGINT) AS h,
             CAST(ROUND((ab.a + ab.b * (CAST(ab.n AS DOUBLE) + h.h)) * 0.5
               + fin.level * 0.5, 6) AS DOUBLE) AS forecast
      FROM fin JOIN ab ON ab.g = fin.g
      CROSS JOIN (VALUES (1), (2), (3)) h(h)
      WHERE fin.rn = 1
      ORDER BY event_type, h""",

    // The exact Croston state machine: (z, p, q) recursion with 6-dp
    // updates, demand init z = r6(x)/p = r6(q), q reset on demand.
    "q_croston" -> """
      WITH RECURSIVE s AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               CAST(SUM(CASE WHEN value > 300 THEN 1 ELSE 0 END)
                 AS DOUBLE) AS x
        FROM events GROUP BY 1, 2),
      si AS (SELECT g, x,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY d) AS i
             FROM s),
      rec AS (
        SELECT g, i,
               CAST(CASE WHEN x > 0.0 THEN ROUND(x, 6) END AS DOUBLE) AS z,
               CAST(CASE WHEN x > 0.0 THEN 1.0 END AS DOUBLE) AS p,
               CASE WHEN x > 0.0 THEN 1 ELSE 2 END AS q,
               CASE WHEN x > 0.0 THEN 1 ELSE 0 END::BIGINT AS nd,
               1::BIGINT AS n
        FROM si WHERE i = 1
        UNION ALL
        SELECT si.g, si.i,
               CASE WHEN si.x > 0.0 AND r.z IS NULL THEN ROUND(si.x, 6)
                    WHEN si.x > 0.0
                      THEN ROUND(0.4 * si.x + (1.0 - 0.4) * r.z, 6)
                    ELSE r.z END,
               CASE WHEN si.x > 0.0 AND r.z IS NULL
                      THEN ROUND(CAST(r.q AS DOUBLE), 6)
                    WHEN si.x > 0.0
                      THEN ROUND(0.4 * CAST(r.q AS DOUBLE)
                        + (1.0 - 0.4) * r.p, 6)
                    ELSE r.p END,
               CASE WHEN si.x > 0.0 THEN 1 ELSE r.q + 1 END,
               r.nd + CASE WHEN si.x > 0.0 THEN 1 ELSE 0 END,
               r.n + 1
        FROM rec r JOIN si ON si.g = r.g AND si.i = r.i + 1),
      fin AS (SELECT g, n, nd, z, p,
                ROW_NUMBER() OVER (PARTITION BY g ORDER BY i DESC) AS rn
              FROM rec)
      SELECT g AS event_type, n AS n_periods, nd AS n_demands,
             z AS size_level, p AS interval_level,
             CAST(CASE WHEN z IS NOT NULL
               THEN ROUND(z / p, 6) END AS DOUBLE) AS forecast
      FROM fin WHERE rn = 1
      ORDER BY event_type""",

    // The q_croston recursion verbatim plus the Syntetos-Boylan
    // (1 - alpha/2) bias multiplier on the raw ratio.
    "q_croston_sba" -> """
      WITH RECURSIVE s AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               CAST(SUM(CASE WHEN value > 300 THEN 1 ELSE 0 END)
                 AS DOUBLE) AS x
        FROM events GROUP BY 1, 2),
      si AS (SELECT g, x,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY d) AS i
             FROM s),
      rec AS (
        SELECT g, i,
               CAST(CASE WHEN x > 0.0 THEN ROUND(x, 6) END AS DOUBLE) AS z,
               CAST(CASE WHEN x > 0.0 THEN 1.0 END AS DOUBLE) AS p,
               CASE WHEN x > 0.0 THEN 1 ELSE 2 END AS q,
               CASE WHEN x > 0.0 THEN 1 ELSE 0 END::BIGINT AS nd,
               1::BIGINT AS n
        FROM si WHERE i = 1
        UNION ALL
        SELECT si.g, si.i,
               CASE WHEN si.x > 0.0 AND r.z IS NULL THEN ROUND(si.x, 6)
                    WHEN si.x > 0.0
                      THEN ROUND(0.4 * si.x + (1.0 - 0.4) * r.z, 6)
                    ELSE r.z END,
               CASE WHEN si.x > 0.0 AND r.z IS NULL
                      THEN ROUND(CAST(r.q AS DOUBLE), 6)
                    WHEN si.x > 0.0
                      THEN ROUND(0.4 * CAST(r.q AS DOUBLE)
                        + (1.0 - 0.4) * r.p, 6)
                    ELSE r.p END,
               CASE WHEN si.x > 0.0 THEN 1 ELSE r.q + 1 END,
               r.nd + CASE WHEN si.x > 0.0 THEN 1 ELSE 0 END,
               r.n + 1
        FROM rec r JOIN si ON si.g = r.g AND si.i = r.i + 1),
      fin AS (SELECT g, n, nd, z, p,
                ROW_NUMBER() OVER (PARTITION BY g ORDER BY i DESC) AS rn
              FROM rec)
      SELECT g AS event_type, n AS n_periods, nd AS n_demands,
             z AS size_level, p AS interval_level,
             CAST(CASE WHEN z IS NOT NULL
               THEN ROUND(z / p, 6) END AS DOUBLE) AS forecast,
             CAST(CASE WHEN z IS NOT NULL
               THEN ROUND(0.8 * (z / p), 6) END AS DOUBLE) AS sba
      FROM fin WHERE rn = 1
      ORDER BY event_type""",

    // The q_hw_forecast LIST recursion with the multiplicative
    // level/season updates and the (l + h·b)·s forecast.
    "q_hw_mult" -> """
      WITH RECURSIVE s AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               CAST(ROUND(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))
                 / 1000000.0, 6) AS DOUBLE) AS x
        FROM events GROUP BY 1, 2),
      si AS (SELECT g, d, x,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY d) AS i
             FROM s),
      init AS (
        SELECT g, ROUND(LIST_SUM(l7) / 7, 6) AS l0, l7
        FROM (SELECT g, LIST(x ORDER BY i) AS l7
              FROM si WHERE i <= 7 GROUP BY g)
        WHERE LEN(l7) = 7),
      rec AS (
        SELECT g, 7 AS i, l0 AS level, CAST(0.0 AS DOUBLE) AS trend,
               LIST_TRANSFORM(l7, v -> ROUND(v / l0, 6)) AS seas
        FROM init
        UNION ALL
        SELECT si.g, si.i,
               ROUND(0.3 * (si.x / r.seas[1])
                 + (1.0 - 0.3) * (r.level + r.trend), 6),
               ROUND(0.2 * (ROUND(0.3 * (si.x / r.seas[1])
                     + (1.0 - 0.3) * (r.level + r.trend), 6) - r.level)
                 + (1.0 - 0.2) * r.trend, 6),
               r.seas[2:] || [ROUND(0.1 * (si.x / (r.level + r.trend))
                 + (1.0 - 0.1) * r.seas[1], 6)]
        FROM rec r JOIN si ON si.g = r.g AND si.i = r.i + 1),
      fin AS (SELECT g, level, trend, seas,
                ROW_NUMBER() OVER (PARTITION BY g ORDER BY i DESC) AS rn
              FROM rec)
      SELECT g AS event_type, CAST(h.h AS BIGINT) AS h,
             CAST(ROUND((level + h.h * trend)
               * seas[((h.h - 1) % 7) + 1], 6) AS DOUBLE) AS forecast
      FROM fin CROSS JOIN (VALUES (1), (2), (3), (4), (5), (6), (7)) h(h)
      WHERE rn = 1
      ORDER BY event_type, h""",

    "q_hw_forecast" -> """
      WITH RECURSIVE s AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               CAST(ROUND(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))
                 / 1000000.0, 6) AS DOUBLE) AS x
        FROM events GROUP BY 1, 2),
      si AS (SELECT g, d, x,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY d) AS i
             FROM s),
      init AS (
        SELECT g, ROUND(LIST_SUM(l7) / 7, 6) AS l0, l7
        FROM (SELECT g, LIST(x ORDER BY i) AS l7
              FROM si WHERE i <= 7 GROUP BY g)
        WHERE LEN(l7) = 7),
      rec AS (
        SELECT g, 7 AS i, l0 AS level, CAST(0.0 AS DOUBLE) AS trend,
               LIST_TRANSFORM(l7, v -> ROUND(v - l0, 6)) AS seas
        FROM init
        UNION ALL
        SELECT si.g, si.i,
               ROUND(0.3 * (si.x - r.seas[1])
                 + (1.0 - 0.3) * (r.level + r.trend), 6),
               ROUND(0.2 * (ROUND(0.3 * (si.x - r.seas[1])
                     + (1.0 - 0.3) * (r.level + r.trend), 6) - r.level)
                 + (1.0 - 0.2) * r.trend, 6),
               r.seas[2:] || [ROUND(0.1 * (si.x - r.level - r.trend)
                 + (1.0 - 0.1) * r.seas[1], 6)]
        FROM rec r JOIN si ON si.g = r.g AND si.i = r.i + 1),
      fin AS (SELECT g, level, trend, seas,
                ROW_NUMBER() OVER (PARTITION BY g ORDER BY i DESC) AS rn
              FROM rec)
      SELECT g AS event_type, CAST(h.h AS BIGINT) AS h,
             CAST(ROUND(level + h.h * trend
               + seas[((h.h - 1) % 7) + 1], 6) AS DOUBLE) AS forecast
      FROM fin CROSS JOIN (VALUES (1), (2), (3), (4), (5), (6), (7)) h(h)
      WHERE rn = 1
      ORDER BY event_type, h""",

    // The TSB state machine unrolled: per-period probability decay /
    // bump, size SES on demand days only, NULL size until the first
    // demand, the p*z rate at the final state.
    "q_tsb" -> """
      WITH RECURSIVE s AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               CAST(SUM(CASE WHEN value > 400 THEN 1 ELSE 0 END)
                 AS DOUBLE) AS x
        FROM events GROUP BY 1, 2),
      si AS (SELECT g, d, x,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY d) AS i
             FROM s),
      rec AS (
        SELECT g, i,
               CASE WHEN x > 0.0 THEN CAST(1.0 AS DOUBLE)
                    ELSE CAST(0.0 AS DOUBLE) END AS p,
               CASE WHEN x > 0.0 THEN ROUND(x, 6) END AS z,
               CASE WHEN x > 0.0 THEN 1 ELSE 0 END AS nd
        FROM si WHERE i = 1
        UNION ALL
        SELECT si.g, si.i,
               CASE WHEN si.x > 0.0
                 THEN ROUND(r.p + CAST(0.2 AS DOUBLE)
                   * (CAST(1.0 AS DOUBLE) - r.p), 6)
                 ELSE ROUND((CAST(1.0 AS DOUBLE)
                   - CAST(0.2 AS DOUBLE)) * r.p, 6) END,
               CASE WHEN si.x > 0.0 THEN
                 (CASE WHEN r.z IS NULL THEN ROUND(si.x, 6)
                  ELSE ROUND(CAST(0.3 AS DOUBLE) * si.x
                    + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
                      * r.z, 6) END)
               ELSE r.z END,
               r.nd + CASE WHEN si.x > 0.0 THEN 1 ELSE 0 END
        FROM rec r JOIN si ON si.g = r.g AND si.i = r.i + 1),
      fin AS (SELECT g, i, p, z, nd,
                ROW_NUMBER() OVER (PARTITION BY g ORDER BY i DESC) AS rn
              FROM rec)
      SELECT g AS event_type, i::BIGINT AS n_periods,
             nd::BIGINT AS n_demands,
             CAST(p AS DOUBLE) AS prob_level,
             CAST(z AS DOUBLE) AS size_level,
             CAST(CASE WHEN z IS NOT NULL THEN ROUND(p * z, 6) END
               AS DOUBLE) AS forecast
      FROM fin WHERE rn = 1
      ORDER BY event_type""",

    // The q_holt_forecast recursion with the phi-damped trees and
    // interpolated cumulative damping sums per horizon step.
    "q_holt_damped" -> s"""
      WITH RECURSIVE s AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               CAST(ROUND(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))
                 / 1000000.0, 6) AS DOUBLE) AS x
        FROM events GROUP BY 1, 2),
      si AS (SELECT g, d, x,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY d) AS i
             FROM s),
      rec AS (
        SELECT g, i, x AS level, CAST(0.0 AS DOUBLE) AS trend
        FROM si WHERE i = 1
        UNION ALL
        SELECT si.g, si.i,
               ROUND(CAST(0.3 AS DOUBLE) * si.x
                 + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
                   * (r.level + CAST(0.9 AS DOUBLE) * r.trend), 6),
               ROUND(CAST(0.2 AS DOUBLE)
                   * (ROUND(CAST(0.3 AS DOUBLE) * si.x
                       + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
                         * (r.level + CAST(0.9 AS DOUBLE) * r.trend),
                       6) - r.level)
                 + (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE))
                   * (CAST(0.9 AS DOUBLE) * r.trend), 6)
        FROM rec r JOIN si ON si.g = r.g AND si.i = r.i + 1),
      fin AS (SELECT g, level, trend,
                ROW_NUMBER() OVER (PARTITION BY g ORDER BY i DESC) AS rn
              FROM rec)
      SELECT g AS event_type, CAST(h.h AS BIGINT) AS h,
             CAST(ROUND(level + h.dmp * trend, 6) AS DOUBLE) AS forecast
      FROM fin CROSS JOIN (VALUES
        ${(1 to 5).scanLeft(0.0)((a, i) => a + math.pow(0.9, i)).tail
          .zipWithIndex.map { case (d2, i) => s"(${i + 1}, $d2)" }
          .mkString(", ")}) h(h, dmp)
      WHERE rn = 1
      ORDER BY event_type, h""",

    "q_holt_forecast" -> """
      WITH RECURSIVE s AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               CAST(ROUND(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))
                 / 1000000.0, 6) AS DOUBLE) AS x
        FROM events GROUP BY 1, 2),
      si AS (SELECT g, d, x,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY d) AS i
             FROM s),
      rec AS (
        SELECT g, i, x AS level, CAST(0.0 AS DOUBLE) AS trend
        FROM si WHERE i = 1
        UNION ALL
        SELECT si.g, si.i,
               ROUND(CAST(0.3 AS DOUBLE) * si.x
                 + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
                   * (r.level + r.trend), 6),
               ROUND(CAST(0.2 AS DOUBLE)
                   * (ROUND(CAST(0.3 AS DOUBLE) * si.x
                       + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
                         * (r.level + r.trend), 6) - r.level)
                 + (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE)) * r.trend, 6)
        FROM rec r JOIN si ON si.g = r.g AND si.i = r.i + 1),
      fin AS (SELECT g, level, trend,
                ROW_NUMBER() OVER (PARTITION BY g ORDER BY i DESC) AS rn
              FROM rec)
      SELECT g AS event_type, CAST(h.h AS BIGINT) AS h,
             CAST(ROUND(level + h.h * trend, 6) AS DOUBLE) AS forecast
      FROM fin CROSS JOIN (VALUES (1), (2), (3)) h(h)
      WHERE rn = 1
      ORDER BY event_type, h""",

    // Same scaled-long running sums over the same (ts, event_id)
    // total order; integer |n·S_k − k·T| scoring, first-argmax.
    "q_cusum" -> """
      WITH scored AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS qv,
               ROW_NUMBER() OVER w AS k,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) OVER w AS s
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
      tot AS (SELECT g, COUNT(*)::BIGINT AS n, SUM(qv)::BIGINT AS t
              FROM scored GROUP BY g),
      dev AS (
        SELECT s.g, t.n, s.k, ABS(t.n * s.s - s.k * t.t) AS num
        FROM scored s JOIN tot t ON s.g IS NOT DISTINCT FROM t.g)
      SELECT g AS event_type, n,
             CAST(ROUND(num / (n * 1000000.0), 6) AS DOUBLE) AS cusum,
             k AS at_k
      FROM (SELECT g, n, k, num,
                   ROW_NUMBER() OVER (PARTITION BY g
                     ORDER BY num DESC, k ASC) AS rn
            FROM dev)
      WHERE rn = 1
      ORDER BY event_type""",

    // Portable epoch day-of-week ((days + 3) mod 7, 0 = Monday) and
    // the exact rational index over scaled-long sums.
    "q_seasonality" -> """
      WITH cells AS (
        SELECT event_type,
               CAST((((CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                      - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400
                          + 86400) % 86400)) // 86400 + 3) % 7 + 7) % 7
                 AS INT) AS dow,
               COUNT(*)::BIGINT AS n,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS s
        FROM events GROUP BY 1, 2),
      tot AS (SELECT event_type, SUM(n)::BIGINT AS tn, SUM(s)::BIGINT AS ts
              FROM cells GROUP BY event_type)
      SELECT c.event_type, c.dow, c.n,
             CAST(CASE WHEN t.ts <> 0 THEN
               ROUND((c.s * t.tn) / CAST(c.n * t.ts AS DOUBLE), 6)
             END AS DOUBLE) AS seasonality
      FROM cells c JOIN tot t
        ON c.event_type IS NOT DISTINCT FROM t.event_type
      ORDER BY c.event_type, c.dow""",

    // Same LEAD over the same (ts, event_id) total order; sequence
    // ends (lead NULL) are dropped on both engines.
    "q_markov" -> """
      WITH pairs AS (
        SELECT event_type AS from_state,
               LEAD(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS to_state
        FROM events),
      cnt AS (
        SELECT from_state, to_state, COUNT(*)::BIGINT AS n_pairs
        FROM pairs WHERE to_state IS NOT NULL
        GROUP BY from_state, to_state)
      SELECT from_state, to_state, n_pairs,
             CAST(ROUND(n_pairs / CAST(SUM(n_pairs) OVER
               (PARTITION BY from_state) AS DOUBLE), 6) AS DOUBLE)
               AS prob
      FROM cnt
      ORDER BY from_state, to_state""",

    // Same md5 shard arithmetic as q_shard_assign; min/max/null-count
    // pass values through untouched.
    "q_zonemap" -> """
      SELECT CAST(('0x' || SUBSTR(MD5(CAST(o_orderkey AS VARCHAR)), 1, 15))
               ::BIGINT % 8 AS INT) AS shard,
             COUNT(*)::BIGINT AS n_rows,
             MIN(o_totalprice) AS min_o_totalprice,
             MAX(o_totalprice) AS max_o_totalprice,
             SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS nulls_o_totalprice,
             MIN(o_orderdate) AS min_o_orderdate,
             MAX(o_orderdate) AS max_o_orderdate,
             SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS nulls_o_orderdate,
             MIN(o_orderstatus) AS min_o_orderstatus,
             MAX(o_orderstatus) AS max_o_orderstatus,
             SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS nulls_o_orderstatus
      FROM orders
      GROUP BY shard
      ORDER BY shard""",

    // The plaintext join restated over tokens: identical salted
    // length-prefixed md5 encoding on both engines.
    "q_pseudonymize" -> """
      SELECT MD5('graft-r8:'
               || CAST(LENGTH(CAST(c_custkey AS VARCHAR)) AS VARCHAR)
               || ':' || CAST(c_custkey AS VARCHAR)) AS token,
             COUNT(*)::BIGINT AS n_orders
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY token
      ORDER BY token""",

    // Same 100-scaled quantization, ε-sized floor-division cells
    // (exact-division arithmetic, sign-safe), 3×3 probe fan-out, and
    // the all-integer Δx²+Δy² ≤ (100ε)² test.
    "q_density_grid" -> """
      WITH pts AS (
        SELECT event_id AS id,
               CAST(ROUND(value * 100) AS BIGINT) AS xi,
               CAST(ROUND(COALESCE(
                 CAST(json_extract_string(props, '$.k') AS BIGINT), 0)
                 * 100) AS BIGINT) AS yi
        FROM events),
      cells AS (
        SELECT id, xi, yi,
               (xi - ((xi % 500 + 500) % 500)) // 500 AS cx,
               (yi - ((yi % 500 + 500) % 500)) // 500 AS cy
        FROM pts),
      probes AS (
        SELECT c.id, c.xi, c.yi,
               c.cx + d.dx AS pcx, c.cy + e.dy AS pcy
        FROM cells c
        CROSS JOIN (VALUES (-1), (0), (1)) d(dx)
        CROSS JOIN (VALUES (-1), (0), (1)) e(dy)),
      cnt AS (
        SELECT p.id,
               COUNT(CASE WHEN c2.id IS NOT NULL AND c2.id <> p.id
                      AND (c2.xi - p.xi) * (c2.xi - p.xi)
                          + (c2.yi - p.yi) * (c2.yi - p.yi) <= 250000
                     THEN 1 END)::BIGINT AS n_neighbors
        FROM probes p
        LEFT JOIN cells c2 ON p.pcx = c2.cx AND p.pcy = c2.cy
        GROUP BY p.id)
      SELECT id AS event_id, n_neighbors, n_neighbors >= 10 AS is_core
      FROM cnt
      ORDER BY event_id""",

    // Same grid geometry as q_density_grid (ε=5 ⇒ 500-scaled cells,
    // ε² = 250 000), then the q_dedup_clusters recursive min-label
    // closure over core-core edges, isolated-core self-labels, and
    // min-core-neighbor border labels.
    "q_dbscan" -> """
      WITH RECURSIVE
      pts AS (
        SELECT event_id AS id,
               CAST(ROUND(value * 100) AS BIGINT) AS xi,
               CAST(ROUND(COALESCE(
                 CAST(json_extract_string(props, '$.k') AS BIGINT), 0)
                 * 100) AS BIGINT) AS yi
        FROM events WHERE event_id < 1000),
      cells AS (
        SELECT id, xi, yi,
               (xi - ((xi % 500 + 500) % 500)) // 500 AS cx,
               (yi - ((yi % 500 + 500) % 500)) // 500 AS cy
        FROM pts),
      probes AS (
        SELECT c.id, c.xi, c.yi,
               c.cx + d.dx AS pcx, c.cy + e.dy AS pcy
        FROM cells c
        CROSS JOIN (VALUES (-1), (0), (1)) d(dx)
        CROSS JOIN (VALUES (-1), (0), (1)) e(dy)),
      pairs AS (
        SELECT p.id AS i, c2.id AS j
        FROM probes p JOIN cells c2
          ON p.pcx = c2.cx AND p.pcy = c2.cy
        WHERE c2.id <> p.id
          AND (c2.xi - p.xi) * (c2.xi - p.xi)
              + (c2.yi - p.yi) * (c2.yi - p.yi) <= 250000),
      cnt AS (
        SELECT p.id,
               COUNT(CASE WHEN c2.id IS NOT NULL AND c2.id <> p.id
                      AND (c2.xi - p.xi) * (c2.xi - p.xi)
                          + (c2.yi - p.yi) * (c2.yi - p.yi) <= 250000
                     THEN 1 END)::BIGINT AS n_neighbors
        FROM probes p
        LEFT JOIN cells c2 ON p.pcx = c2.cx AND p.pcy = c2.cy
        GROUP BY p.id),
      cores AS (SELECT id FROM cnt WHERE n_neighbors >= 8),
      coreedges AS (
        SELECT i AS src, j AS dst FROM pairs
        WHERE i IN (SELECT id FROM cores)
          AND j IN (SELECT id FROM cores)),
      reach AS (
        SELECT src AS v, src AS lbl FROM coreedges
        UNION
        SELECT e.dst AS v, r.lbl
        FROM reach r JOIN coreedges e ON e.src = r.v),
      corelbl AS (
        SELECT c.id, COALESCE(m.lbl, c.id) AS clu
        FROM cores c
        LEFT JOIN (SELECT v, MIN(lbl) AS lbl FROM reach GROUP BY v) m
          ON m.v = c.id),
      borderlbl AS (
        SELECT p.i AS id, MIN(cl.clu) AS clu
        FROM pairs p JOIN corelbl cl ON p.j = cl.id
        WHERE p.i NOT IN (SELECT id FROM cores)
        GROUP BY p.i)
      SELECT cnt.id AS event_id, cnt.n_neighbors,
             cnt.n_neighbors >= 8 AS is_core,
             COALESCE(c.clu, b.clu) AS cluster_id
      FROM cnt
      LEFT JOIN corelbl c ON cnt.id = c.id
      LEFT JOIN borderlbl b ON cnt.id = b.id
      ORDER BY event_id""",

    // Leading digits from BIGINT string formatting (portable, unlike
    // double formatting); expected masses are the Stats.benfordExpected
    // Scala doubles interpolated verbatim into this SQL.
    "q_benford" -> s"""
      WITH q AS (
        SELECT CAST(ROUND(ABS(o_totalprice) * 100) AS BIGINT) AS q
        FROM orders),
      d AS (SELECT CAST(SUBSTR(CAST(q AS VARCHAR), 1, 1) AS INT) AS digit
            FROM q WHERE q > 0),
      cnt AS (SELECT digit, COUNT(*)::BIGINT AS n FROM d GROUP BY digit),
      tot AS (SELECT SUM(n)::BIGINT AS t FROM cnt),
      grid AS (SELECT CAST(UNNEST(RANGE(1, 10)) AS INT) AS digit),
      expd AS (SELECT digit, CASE digit ${(1 to 9).map(i =>
        s"WHEN $i THEN CAST(${graft.operators.Stats.benfordExpected(i - 1)} AS DOUBLE)")
        .mkString(" ")} END AS e FROM grid)
      SELECT g.digit, COALESCE(c.n, 0)::BIGINT AS n,
             CAST(ROUND(COALESCE(c.n, 0) / CAST(t AS DOUBLE), 6)
               AS DOUBLE) AS observed_p,
             CAST(ROUND(e, 6) AS DOUBLE) AS expected_p,
             CAST(ROUND(ABS(COALESCE(c.n, 0) / CAST(t AS DOUBLE) - e), 6)
               AS DOUBLE) AS abs_dev
      FROM grid g
      LEFT JOIN cnt c ON g.digit = c.digit
      JOIN expd ex ON ex.digit = g.digit
      CROSS JOIN tot
      ORDER BY g.digit""",

    // Same string-canonical dedup, label joins, and the all-integer
    // modularity numerator.
    "q_modularity" -> """
      WITH li AS (
        SELECT l_orderkey AS ok, l_partkey AS pk
        FROM lineitem WHERE l_orderkey % 7 = 0),
      pairs AS (
        SELECT DISTINCT
               LEAST(CAST(x.pk AS VARCHAR), CAST(y.pk AS VARCHAR)) AS a,
               GREATEST(CAST(x.pk AS VARCHAR), CAST(y.pk AS VARCHAR)) AS b
        FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
      lab AS (SELECT CAST(p_partkey AS VARCHAR) AS v, p_brand AS l
              FROM part),
      led AS (
        SELECT p.a, p.b, la.l AS la, lb.l AS lb
        FROM pairs p
        JOIN lab la ON p.a = la.v
        JOIN lab lb ON p.b = lb.v),
      stats AS (
        SELECT COUNT(*)::BIGINT AS m,
               SUM(CASE WHEN la = lb THEN 1 ELSE 0 END)::BIGINT AS intra
        FROM led),
      degs AS (
        SELECT v, l, COUNT(*)::BIGINT AS d
        FROM (SELECT a AS v, la AS l FROM led
              UNION ALL SELECT b AS v, lb AS l FROM led)
        GROUP BY v, l),
      comm AS (SELECT l, SUM(d)::BIGINT AS dc FROM degs GROUP BY l),
      agg AS (
        SELECT COUNT(*)::BIGINT AS n_communities,
               SUM(dc * dc)::BIGINT AS sumdc2
        FROM comm)
      SELECT CAST(CASE WHEN m > 0 THEN
               ROUND((4 * m * intra - sumdc2) / (4.0 * m * m), 6)
             END AS DOUBLE) AS modularity,
             m AS m_edges, n_communities
      FROM agg CROSS JOIN stats""",

    // Same ceil(q·n/10) order-statistic ranks over the same
    // (group, half, value) sort; values pass through untouched.
    "q_qq_drift" -> """
      WITH ranked AS (
        SELECT event_type AS g,
               (ts >= TIMESTAMP '2024-01-16') AS cur, value AS v,
               ROW_NUMBER() OVER (PARTITION BY event_type,
                 (ts >= TIMESTAMP '2024-01-16') ORDER BY value) AS rn
        FROM events),
      counts AS (SELECT g, cur, COUNT(*)::BIGINT AS n
                 FROM ranked GROUP BY g, cur),
      targets AS (
        SELECT g, cur, q.quantile,
               CAST(((q.quantile * n + 9)
                 - ((q.quantile * n + 9) % 10)) / 10 AS BIGINT) AS r
        FROM counts
        CROSS JOIN (SELECT UNNEST(RANGE(1, 10)) AS quantile) q),
      cuts AS (
        SELECT t.g, t.cur, t.quantile, rk.v
        FROM targets t JOIN ranked rk
          ON rk.g = t.g AND rk.cur = t.cur AND rk.rn = t.r),
      ref AS (SELECT g, quantile, v AS v_ref FROM cuts WHERE NOT cur),
      cur_ AS (SELECT g, quantile, v AS v_cur FROM cuts WHERE cur)
      SELECT COALESCE(r.g, c.g) AS event_type,
             CAST(COALESCE(r.quantile, c.quantile) AS INT) AS quantile,
             v_ref, v_cur,
             CAST(ROUND(v_cur - v_ref, 6) AS DOUBLE) AS delta
      FROM ref r FULL JOIN cur_ c
        ON r.g = c.g AND r.quantile = c.quantile
      ORDER BY event_type, quantile""",

    // Same floor(n·0.1) per-side trim over the same sorted multiset;
    // exact scaled-integer mean.
    "q_trimmed_mean" -> """
      WITH ranked AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS q,
               ROW_NUMBER() OVER (PARTITION BY event_type
                 ORDER BY CAST(ROUND(value * 1000000.0) AS BIGINT)) AS rn
        FROM events),
      counts AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               CAST(FLOOR(COUNT(*) * 0.1) AS BIGINT) AS t
        FROM ranked GROUP BY g)
      SELECT r.g AS event_type, MAX(c.n) AS n,
             MAX(c.t) AS n_trimmed_each_side,
             CAST(ROUND(SUM(r.q) / (COUNT(*) * 1000000.0), 6) AS DOUBLE)
               AS trimmed_mean
      FROM ranked r JOIN counts c ON r.g = c.g
      WHERE r.rn > c.t AND r.rn <= c.n - c.t
      GROUP BY r.g
      ORDER BY event_type""",

    // Same distinct membership, the same degree-cap filter BEFORE the
    // self-join, canonical string order.
    "q_bipartite" -> """
      WITH m AS (
        SELECT DISTINCT CAST(l_orderkey AS VARCHAR) AS l,
               CAST(l_partkey AS VARCHAR) AS r
        FROM lineitem),
      keep AS (SELECT l FROM m GROUP BY l HAVING COUNT(*) <= 8),
      capped AS (SELECT m.l, m.r FROM m JOIN keep ON m.l = keep.l)
      SELECT x.r AS a, y.r AS b, COUNT(*)::BIGINT AS weight
      FROM capped x JOIN capped y ON x.l = y.l AND x.r < y.r
      GROUP BY x.r, y.r
      ORDER BY a, b""",

    // Same canonical/symmetric edges, the same middle-degree cap
    // before the path-2 join, anti-join of existing edges, and the
    // same rounded-score total-order ranking.
    "q_link_pred" -> """
      WITH li AS (
        SELECT l_orderkey AS ok, l_partkey AS pk
        FROM lineitem WHERE l_orderkey % 7 = 0),
      canon AS (
        SELECT DISTINCT
               LEAST(CAST(x.pk AS VARCHAR), CAST(y.pk AS VARCHAR)) AS a,
               GREATEST(CAST(x.pk AS VARCHAR), CAST(y.pk AS VARCHAR)) AS b
        FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
      sym AS (SELECT a, b FROM canon
              UNION ALL SELECT b AS a, a AS b FROM canon),
      degs AS (SELECT a AS v, COUNT(*)::BIGINT AS deg
               FROM sym GROUP BY a),
      mids AS (SELECT v, deg FROM degs WHERE deg <= 50),
      via AS (SELECT s.a AS x, s.b AS u, m.deg
              FROM sym s JOIN mids m ON s.b = m.v),
      cands AS (
        SELECT v.x AS pa, r.b AS pb, v.deg AS mdeg
        FROM via v JOIN sym r ON v.u = r.a
        WHERE v.x < r.b),
      scored AS (
        SELECT pa, pb, COUNT(*)::BIGINT AS common_neighbors,
               SUM(CASE WHEN mdeg > 1
                     THEN 1.0 / LN(CAST(mdeg AS DOUBLE)) END) AS aa
        FROM cands GROUP BY pa, pb),
      nonedge AS (
        SELECT s.* FROM scored s
        LEFT JOIN canon c ON s.pa = c.a AND s.pb = c.b
        WHERE c.a IS NULL)
      SELECT pa AS a, pb AS b, common_neighbors,
             CAST(ROUND(aa, 6) AS DOUBLE) AS adamic_adar
      FROM (SELECT *, ROW_NUMBER() OVER
              (ORDER BY ROUND(aa, 6) DESC, pa, pb) AS rn
            FROM nonedge)
      WHERE rn <= 20
      ORDER BY adamic_adar DESC, a, b""",

    // The q_link_pred path-2/anti-join CTEs with the Jaccard score:
    // common/(deg a + deg b − common), endpoint degrees from the same
    // symmetric counts, one rounded division, the same top-20 order.
    "q_link_pred_jaccard" -> """
      WITH li AS (
        SELECT l_orderkey AS ok, l_partkey AS pk
        FROM lineitem WHERE l_orderkey % 7 = 0),
      canon AS (
        SELECT DISTINCT
               LEAST(CAST(x.pk AS VARCHAR), CAST(y.pk AS VARCHAR)) AS a,
               GREATEST(CAST(x.pk AS VARCHAR), CAST(y.pk AS VARCHAR)) AS b
        FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
      sym AS (SELECT a, b FROM canon
              UNION ALL SELECT b AS a, a AS b FROM canon),
      degs AS (SELECT a AS v, COUNT(*)::BIGINT AS deg
               FROM sym GROUP BY a),
      mids AS (SELECT v FROM degs WHERE deg <= 50),
      via AS (SELECT s.a AS x, s.b AS u
              FROM sym s JOIN mids m ON s.b = m.v),
      cands AS (
        SELECT v.x AS pa, r.b AS pb
        FROM via v JOIN sym r ON v.u = r.a
        WHERE v.x < r.b),
      scored AS (
        SELECT pa, pb, COUNT(*)::BIGINT AS common_neighbors
        FROM cands GROUP BY pa, pb),
      nonedge AS (
        SELECT s.* FROM scored s
        LEFT JOIN canon c ON s.pa = c.a AND s.pb = c.b
        WHERE c.a IS NULL),
      jsc AS (
        SELECT n.pa, n.pb, n.common_neighbors,
               ROUND(CAST(n.common_neighbors AS DOUBLE)
                 / CAST(da.deg + db.deg - n.common_neighbors AS DOUBLE),
                 6) AS j
        FROM nonedge n
        JOIN degs da ON da.v = n.pa
        JOIN degs db ON db.v = n.pb)
      SELECT pa AS a, pb AS b, common_neighbors,
             CAST(j AS DOUBLE) AS jaccard
      FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY j DESC, pa, pb) AS rn
            FROM jsc)
      WHERE rn <= 20
      ORDER BY jaccard DESC, a, b""",

    // Same DISTINCT (det, dep) with NULL as a level, the same
    // violation fold.
    "q_fd_check" -> """
      WITH pd AS (
        SELECT source, COUNT(*)::BIGINT AS nd
        FROM (SELECT DISTINCT source, lang FROM documents)
        GROUP BY source)
      SELECT COUNT(*)::BIGINT AS n_groups,
             SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END)::BIGINT
               AS n_violating,
             CAST(ROUND(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END)
               / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE)
               AS violation_rate,
             MAX(nd) AS max_distinct_dep
      FROM pd""",

    // Same shared-token self-join decomposition; one-sided mass from
    // the shared sums; TextAnalysis.ln2 interpolated verbatim.
    "q_jsd" -> s"""
      WITH toks AS (
        SELECT source AS g,
               UNNEST(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                 t -> t <> '')) AS tok
        FROM documents),
      cnt AS (SELECT g, tok, COUNT(*)::BIGINT AS c
              FROM toks GROUP BY g, tok),
      tot AS (SELECT g, SUM(c)::BIGINT AS n FROM cnt GROUP BY g),
      p AS (SELECT c.g, c.tok, c.c / CAST(t.n AS DOUBLE) AS p
            FROM cnt c JOIN tot t ON c.g = t.g),
      shared AS (
        SELECT a.g AS g1, b.g AS g2, COUNT(*)::BIGINT AS n_shared,
               SUM(a.p * LN(2.0 * a.p / (a.p + b.p))
                   + b.p * LN(2.0 * b.p / (a.p + b.p))) AS st,
               SUM(a.p) AS sa, SUM(b.p) AS sb
        FROM p a JOIN p b ON a.tok = b.tok AND a.g < b.g
        GROUP BY a.g, b.g),
      grid AS (SELECT a.g AS g1, b.g AS g2
               FROM tot a CROSS JOIN tot b WHERE a.g < b.g)
      SELECT g.g1, g.g2,
             CAST(ROUND((COALESCE(st, 0.0)
               + ((1.0 - COALESCE(sa, 0.0)) + (1.0 - COALESCE(sb, 0.0)))
                 * ${graft.operators.TextAnalysis.ln2}) / 2.0, 6)
               AS DOUBLE) AS jsd,
             COALESCE(n_shared, 0)::BIGINT AS n_shared
      FROM grid g
      LEFT JOIN shared s ON g.g1 = s.g1 AND g.g2 = s.g2
      ORDER BY g.g1, g.g2""",

    // Same halves, the same exact cross-ratio, the same rounded-score
    // total-order ranking.
    "q_trending" -> """
      WITH toks AS (
        SELECT (doc_id % 2 = 1) AS isnew,
               UNNEST(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                 t -> t <> '')) AS tok
        FROM documents),
      cnt AS (
        SELECT tok,
               SUM(CASE WHEN isnew THEN 0 ELSE 1 END)::BIGINT AS c_old,
               SUM(CASE WHEN isnew THEN 1 ELSE 0 END)::BIGINT AS c_new
        FROM toks GROUP BY tok),
      tot AS (SELECT SUM(c_old)::BIGINT AS n1, SUM(c_new)::BIGINT AS n2,
                     COUNT(*)::BIGINT AS v
              FROM cnt),
      scored AS (
        SELECT tok AS token, c_old, c_new,
               CAST(ROUND(((c_new + 1) * (n1 + v))
                 / CAST((c_old + 1) * (n2 + v) AS DOUBLE), 6)
                 AS DOUBLE) AS score
        FROM cnt CROSS JOIN tot)
      SELECT token, c_old, c_new, score
      FROM (SELECT *, ROW_NUMBER() OVER
              (ORDER BY score DESC, token ASC) AS rn
            FROM scored)
      WHERE rn <= 20
      ORDER BY score DESC, token""",

    // Same canonical dedup + symmetric union; HUGEINT moment sums,
    // identical sqrt/division tree.
    "q_assortativity" -> """
      WITH li AS (
        SELECT l_orderkey AS ok, l_partkey AS pk
        FROM lineitem WHERE l_orderkey % 7 = 0),
      canon AS (
        SELECT DISTINCT
               LEAST(CAST(x.pk AS VARCHAR), CAST(y.pk AS VARCHAR)) AS a,
               GREATEST(CAST(x.pk AS VARCHAR), CAST(y.pk AS VARCHAR)) AS b
        FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
      sym AS (SELECT a, b FROM canon
              UNION ALL SELECT b AS a, a AS b FROM canon),
      degs AS (SELECT a AS v, COUNT(*)::BIGINT AS deg
               FROM sym GROUP BY a),
      ends AS (
        SELECT da.deg AS dx, db.deg AS dy
        FROM sym s
        JOIN degs da ON s.a = da.v
        JOIN degs db ON s.b = db.v),
      mom AS (
        SELECT COUNT(*)::HUGEINT AS n,
               SUM(dx)::HUGEINT AS sx, SUM(dy)::HUGEINT AS sy,
               SUM(dx * dy)::HUGEINT AS sxy,
               SUM(dx * dx)::HUGEINT AS sxx,
               SUM(dy * dy)::HUGEINT AS syy
        FROM ends),
      nv AS (SELECT COUNT(*)::BIGINT AS n_vertices FROM degs)
      SELECT CAST(CASE WHEN n * sxx - sx * sx <> 0
                        AND n * syy - sy * sy <> 0 THEN
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
             END AS DOUBLE) AS assortativity,
             CAST(FLOOR(CAST(n AS BIGINT) / 2.0) AS BIGINT) AS m_edges,
             n_vertices
      FROM mom CROSS JOIN nv""",

    // Same daily cells (portable epoch day), HUGEINT centered terms
    // n·x − S, the same three LEADs over the observed-day order.
    // The KM subjects bucketed to 3-day intervals; half-exposure
    // adjustment, frozen q, the KM ln-fold with exhaustion gate.
    "q_life_table" -> """
      WITH subj AS (
        SELECT user_id,
               DATE_DIFF('day', MIN(CAST(ts AS DATE)),
                 COALESCE(MIN(CASE WHEN event_type = 'purchase'
                                THEN CAST(ts AS DATE) END),
                          MAX(CAST(ts AS DATE)))) AS duration,
               MIN(CASE WHEN event_type = 'purchase'
                     THEN CAST(ts AS DATE) END) IS NOT NULL AS observed
        FROM events GROUP BY user_id),
      cells AS (
        SELECT CAST(FLOOR(duration / 3) AS BIGINT) AS iv,
               SUM(CASE WHEN observed THEN 1 ELSE 0 END)::BIGINT AS d,
               SUM(CASE WHEN observed THEN 0 ELSE 1 END)::BIGINT AS c
        FROM subj WHERE duration IS NOT NULL GROUP BY 1),
      lt AS (
        SELECT iv, d, c,
               ((SELECT SUM(d + c) FROM cells)
                 - COALESCE(SUM(d + c) OVER
                     (ORDER BY iv ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), 0))::BIGINT AS entering
        FROM cells),
      lt2 AS (
        SELECT iv, d, c, entering,
               CAST(entering AS DOUBLE) - CAST(c AS DOUBLE) / 2.0
                 AS eff,
               ROUND(CAST(d AS DOUBLE)
                 / (CAST(entering AS DOUBLE)
                   - CAST(c AS DOUBLE) / 2.0), 6) AS q
        FROM lt),
      lt3 AS (
        SELECT iv, d, c, entering, eff, q,
               SUM(CASE WHEN q < 1.0 THEN LN(1.0 - q) ELSE 0.0 END)
                 OVER (ORDER BY iv) AS lnsum,
               MAX(CASE WHEN q >= 1.0 THEN 1 ELSE 0 END)
                 OVER (ORDER BY iv) AS hitzero
        FROM lt2)
      SELECT (iv * 3)::BIGINT AS interval_start,
             entering AS n_entering, d AS n_events, c AS n_censored,
             CAST(ROUND(eff, 6) AS DOUBLE) AS effective,
             CAST(q AS DOUBLE) AS q,
             CAST(CASE WHEN hitzero = 1 THEN 0.0
                  ELSE ROUND(EXP(lnsum), 6) END AS DOUBLE) AS survival
      FROM lt3
      ORDER BY interval_start""",

    // Day cells for the two types joined on day; up/down states via
    // LAG, next-state via LEAD over the global day order; the <=8-row
    // joint table's window marginals; 12-dp terms into a decimal sum.
    "q_transfer_entropy" -> """
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY 1, 2),
      joined AS (
        SELECT t.day, t.x AS xt, s.x AS xs
        FROM (SELECT day, x FROM cells WHERE g = 'purchase') t
        JOIN (SELECT day, x FROM cells WHERE g = 'click') s
          ON s.day = t.day),
      states AS (
        SELECT day,
               CASE WHEN xt > pt THEN 1 ELSE 0 END AS st,
               CASE WHEN xs > ps THEN 1 ELSE 0 END AS ss
        FROM (SELECT day, xt, xs,
                     LAG(xt) OVER w AS pt, LAG(xs) OVER w AS ps
              FROM joined WINDOW w AS (ORDER BY day))
        WHERE pt IS NOT NULL),
      trans AS (
        SELECT st, ss, LEAD(st) OVER (ORDER BY day) AS sn
        FROM states),
      joint AS (
        SELECT sn, st, ss, COUNT(*)::BIGINT AS c3
        FROM trans WHERE sn IS NOT NULL GROUP BY sn, st, ss),
      terms AS (
        SELECT ROUND(CAST(c3 AS DOUBLE) / CAST(n AS DOUBLE)
                 * LN((CAST(c3 AS DOUBLE) * cx)
                   / (CAST(cxy AS DOUBLE) * cxx)), 12) AS term, n
        FROM (
          SELECT c3,
                 SUM(c3) OVER (PARTITION BY st, ss) AS cxy,
                 SUM(c3) OVER (PARTITION BY sn, st) AS cxx,
                 SUM(c3) OVER (PARTITION BY st) AS cx,
                 SUM(c3) OVER () AS n
          FROM joint))
      SELECT MAX(n)::BIGINT AS n_transitions,
             CAST(CASE WHEN MAX(n) >= 2 THEN
               ROUND(CAST(SUM(CAST(term AS DECIMAL(38,12))) AS DOUBLE),
                 6) END AS DOUBLE) AS te
      FROM terms""",

    // Exact day counts, frozen center, per-day clamped bands.
    "q_p_chart" -> """
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*)::BIGINT AS n,
               SUM(CASE WHEN COALESCE(value > 120.0, FALSE)
                 THEN 1 ELSE 0 END)::BIGINT AS n_defect
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
      tot AS (SELECT SUM(n)::BIGINT AS tn, SUM(n_defect)::BIGINT AS td
              FROM daily),
      lim AS (
        SELECT day, n, n_defect,
               ROUND(CAST(td AS DOUBLE) / CAST(tn AS DOUBLE), 6)
                 AS pbar,
               ROUND(3.0 * SQRT(
                 ROUND(CAST(td AS DOUBLE) / CAST(tn AS DOUBLE), 6)
                 * (1.0 - ROUND(CAST(td AS DOUBLE)
                     / CAST(tn AS DOUBLE), 6))
                 / CAST(n AS DOUBLE)), 6) AS hw,
               ROUND(CAST(n_defect AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 AS p
        FROM daily CROSS JOIN tot)
      SELECT day, n, n_defect, CAST(p AS DOUBLE) AS p,
             CAST(pbar AS DOUBLE) AS center,
             CAST(ROUND(LEAST(1.0, pbar + hw), 6) AS DOUBLE) AS ucl,
             CAST(ROUND(GREATEST(0.0, pbar - hw), 6) AS DOUBLE) AS lcl,
             (p > ROUND(LEAST(1.0, pbar + hw), 6)
               OR p < ROUND(GREATEST(0.0, pbar - hw), 6))
               AS out_of_control
      FROM lim
      ORDER BY day""",

    // Union category space (full-outer marginal fold), 12-dp frozen
    // po/pe, the averaged-marginal chance term.
    "q_gwet_ac1" -> """
      WITH rated AS (
        SELECT SUBSTR(o_orderpriority, 1, 1) AS a,
               CAST(LEAST(5, 1 + CAST(FLOOR(o_totalprice / 100000.0)
                 AS BIGINT)) AS VARCHAR) AS b
        FROM orders
        WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
      nn AS (SELECT COUNT(*)::BIGINT AS n,
                    SUM(CASE WHEN a = b THEN 1 ELSE 0 END)::BIGINT
                      AS agree
             FROM rated),
      am AS (SELECT a AS c, COUNT(*)::BIGINT AS ca FROM rated GROUP BY a),
      bm AS (SELECT b AS c, COUNT(*)::BIGINT AS cb FROM rated GROUP BY b),
      cats AS (
        SELECT COUNT(*)::BIGINT AS k,
               SUM(CAST(ROUND(pi * (1.0 - pi), 12) AS DECIMAL(38,12)))
                 AS spi
        FROM (
          SELECT ROUND((CAST(COALESCE(am.ca, 0) AS DOUBLE)
                   / CAST(nn.n AS DOUBLE)
                 + CAST(COALESCE(bm.cb, 0) AS DOUBLE)
                   / CAST(nn.n AS DOUBLE)) / 2.0, 12) AS pi
          FROM am FULL OUTER JOIN bm ON bm.c = am.c
          CROSS JOIN nn)),
      fin AS (
        SELECT nn.n, cats.k,
               ROUND(CAST(agree AS DOUBLE) / CAST(nn.n AS DOUBLE), 12)
                 AS po,
               CASE WHEN cats.k >= 2 THEN
                 ROUND(CAST(cats.spi AS DOUBLE)
                   / (CAST(cats.k AS DOUBLE) - 1.0), 12) END AS pe
        FROM nn CROSS JOIN cats)
      SELECT n, k AS n_categories,
             CAST(ROUND(po, 6) AS DOUBLE) AS po,
             CAST(ROUND(pe, 6) AS DOUBLE) AS pe,
             CAST(CASE WHEN pe IS NOT NULL AND pe < 1.0 THEN
               ROUND((po - pe) / (1.0 - pe), 6) END AS DOUBLE) AS ac1
      FROM fin""",

    // Upper/lower triangle full-outer fold, 12-dp terms, exact dof.
    "q_bowker" -> """
      WITH rated AS (
        SELECT SUBSTR(o_orderpriority, 1, 1) AS a,
               CAST(LEAST(5, 1 + CAST(FLOOR(o_totalprice / 100000.0)
                 AS BIGINT)) AS VARCHAR) AS b
        FROM orders
        WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
      cells AS (SELECT a AS i, b AS j, COUNT(*)::BIGINT AS n
                FROM rated GROUP BY a, b),
      tot AS (SELECT SUM(n)::BIGINT AS t FROM cells),
      up AS (SELECT i AS pi, j AS pj, n AS nij FROM cells WHERE i < j),
      down AS (SELECT j AS pi, i AS pj, n AS nji FROM cells WHERE i > j),
      pairs AS (
        SELECT COALESCE(nij, 0) AS nij, COALESCE(nji, 0) AS nji
        FROM up FULL OUTER JOIN down USING (pi, pj)),
      terms AS (
        SELECT ROUND(CAST(nij - nji AS DOUBLE) * (nij - nji)
                 / CAST(nij + nji AS DOUBLE), 12) AS term
        FROM pairs WHERE nij + nji > 0)
      SELECT t.t AS n, COUNT(*)::BIGINT AS n_pairs_tested,
             CAST(CASE WHEN COUNT(*) >= 1 THEN
               ROUND(CAST(SUM(CAST(term AS DECIMAL(38,12))) AS DOUBLE),
                 6) END AS DOUBLE) AS chi2
      FROM terms CROSS JOIN tot t
      GROUP BY t.t""",

    // The q_acf cell/centering CTEs + a decimal window cumsum; the
    // Bartlett weights interpolated as the identical Scala doubles;
    // rejection vs the pinned 0.463 constant.
    "q_kpss" -> s"""
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      st AS (SELECT g, COUNT(*)::HUGEINT AS n, SUM(x)::HUGEINT AS s
             FROM cells GROUP BY g),
      a AS (SELECT c.g, c.day, st.n * c.x - st.s AS aa
            FROM cells c JOIN st ON c.g = st.g),
      cs AS (SELECT g, day, aa,
                    SUM(aa) OVER (PARTITION BY g ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS s_t
             FROM a),
      led AS (SELECT g, aa, s_t,
                     LEAD(aa, 1) OVER w AS l1,
                     LEAD(aa, 2) OVER w AS l2,
                     LEAD(aa, 3) OVER w AS l3
              FROM cs WINDOW w AS (PARTITION BY g ORDER BY day)),
      agg AS (SELECT g, COUNT(*)::BIGINT AS n,
                     SUM(s_t * s_t) AS ss, SUM(aa * aa) AS d0,
                     SUM(aa * l1) AS d1, SUM(aa * l2) AS d2,
                     SUM(aa * l3) AS d3
              FROM led GROUP BY g)
      SELECT g AS event_type, n AS n_days,
             CAST(CASE WHEN ok THEN ROUND(st2, 6) END AS DOUBLE)
               AS kpss_stat,
             CASE WHEN ok THEN ROUND(st2, 6) > 0.463 END AS reject_5pct
      FROM (
        SELECT g, n, ss,
               CAST(ss AS DOUBLE) / (CAST(n AS DOUBLE)
                 * (CAST(d0 AS DOUBLE)
                   + ${2.0 * (1.0 - 1.0 / 4)} * CAST(d1 AS DOUBLE)
                   + ${2.0 * (1.0 - 2.0 / 4)} * CAST(d2 AS DOUBLE)
                   + ${2.0 * (1.0 - 3.0 / 4)} * CAST(d3 AS DOUBLE)))
                 AS st2,
               (n >= 3 AND CAST(d0 AS DOUBLE)
                   + ${2.0 * (1.0 - 1.0 / 4)} * CAST(d1 AS DOUBLE)
                   + ${2.0 * (1.0 - 2.0 / 4)} * CAST(d2 AS DOUBLE)
                   + ${2.0 * (1.0 - 3.0 / 4)} * CAST(d3 AS DOUBLE) > 0.0
                 AND ss IS NOT NULL) AS ok
        FROM agg)
      ORDER BY event_type""",

    // Overlapping q-sums via a bounded-following window frame; the
    // centered moments as closed forms of HUGEINT folds; the
    // homoscedastic z constant interpolated.
    "q_variance_ratio" -> s"""
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      lagd AS (SELECT g, day, x,
                      LAG(x) OVER (PARTITION BY g ORDER BY day) AS pv
               FROM cells),
      diffs AS (SELECT g, day, x - pv AS d
                FROM lagd WHERE pv IS NOT NULL),
      winq AS (SELECT g, d,
                      SUM(d) OVER (PARTITION BY g ORDER BY day
                        ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS qs,
                      (LEAD(d, 4) OVER (PARTITION BY g ORDER BY day)
                        IS NOT NULL) AS fullw
               FROM diffs),
      agg AS (SELECT g, COUNT(*)::BIGINT AS n,
                     SUM(CAST(d AS HUGEINT)) AS sd,
                     SUM(CAST(d AS HUGEINT) * d) AS sd2,
                     SUM(CASE WHEN fullw THEN CAST(qs AS HUGEINT) END)
                       AS sq,
                     SUM(CASE WHEN fullw
                       THEN CAST(qs AS HUGEINT) * qs END) AS sq2,
                     SUM(CASE WHEN fullw THEN 1 ELSE 0 END)::BIGINT AS m
              FROM winq GROUP BY g)
      SELECT g AS event_type, n AS n_diffs,
             CAST(CASE WHEN ok THEN ROUND(vr, 6) END AS DOUBLE) AS vr,
             CAST(CASE WHEN ok THEN
               ROUND(SQRT(CAST(n AS DOUBLE)) * (vr - 1.0)
                 / ${math.sqrt(2.0 * (2.0 * 5 - 1.0) * (5 - 1.0) / (3.0 * 5))},
                 6) END AS DOUBLE) AS z
      FROM (
        SELECT g, n, m,
               ((CAST(sq2 AS DOUBLE)
                   - ${2.0 * 5} * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
                     * CAST(sq AS DOUBLE)
                   + CAST(m AS DOUBLE) * ${5.0} * ${5.0}
                     * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)))
                 / (${5.0} * CAST(m AS DOUBLE)))
               / ((CAST(sd2 AS DOUBLE) - CAST(sd AS DOUBLE)
                   * CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0)) AS vr,
               (n >= 6 AND m >= 1
                 AND (CAST(sd2 AS DOUBLE) - CAST(sd AS DOUBLE)
                     * CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0) > 0.0) AS ok
        FROM agg)
      ORDER BY event_type""",

    "q_turning_points" -> """
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      marked AS (
        SELECT g,
               CASE WHEN pv IS NOT NULL AND nx IS NOT NULL
                     AND ((x > pv AND x > nx) OR (x < pv AND x < nx))
                 THEN 1 ELSE 0 END AS tp
        FROM (SELECT g, x,
                     LAG(x) OVER w AS pv, LEAD(x) OVER w AS nx
              FROM cells WINDOW w AS (PARTITION BY g ORDER BY day))),
      agg AS (SELECT g, COUNT(*)::BIGINT AS n, SUM(tp)::BIGINT AS t
              FROM marked GROUP BY g)
      SELECT g AS event_type, n AS n_days, t AS turning_points,
             CAST(CASE WHEN ok THEN ROUND(e, 6) END AS DOUBLE)
               AS expected,
             CAST(CASE WHEN ok THEN
               ROUND((CAST(t AS DOUBLE) - e) / SQRT(v), 6) END
               AS DOUBLE) AS z
      FROM (
        SELECT g, n, t,
               2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0 AS e,
               (16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0 AS v,
               (n >= 3 AND (16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0
                 > 0.0) AS ok
        FROM agg)
      ORDER BY event_type""",

    "q_cox_stuart" -> """
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      idx AS (SELECT g, x,
                     ROW_NUMBER() OVER (PARTITION BY g ORDER BY day)
                       AS rn,
                     COUNT(*) OVER (PARTITION BY g) AS nn,
                     CAST(CEIL(COUNT(*) OVER (PARTITION BY g) / 2.0)
                       AS BIGINT) AS c
              FROM cells),
      pairs AS (
        SELECT a.g, a.nn, b.x - a.x AS diff
        FROM idx a JOIN idx b
          ON b.g = a.g AND b.rn = a.rn + a.c),
      agg AS (SELECT g, MAX(nn)::BIGINT AS n, COUNT(*)::BIGINT
                       AS n_pairs,
                     SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END)::BIGINT
                       AS n_plus,
                     SUM(CASE WHEN diff <> 0 THEN 1 ELSE 0 END)::BIGINT
                       AS m
              FROM pairs GROUP BY g)
      SELECT g AS event_type, n AS n_days, n_pairs, n_plus,
             CAST(CASE WHEN m >= 1 THEN
               ROUND((2.0 * n_plus - CAST(m AS DOUBLE))
                 / SQRT(CAST(m AS DOUBLE)), 6) END AS DOUBLE) AS z
      FROM agg
      ORDER BY event_type""",

    // The q_acf cell/centering CTEs + a generated (period, phase,
    // cos, sin) VALUES table whose entries are THE SAME Scala
    // math.cos/math.sin doubles the Spark plan carries as literals
    // (no engine libm trig anywhere); 12-dp descaled term freezes,
    // DECIMAL(38,12) folds, the (power DESC, period) parsimony rank.
    "q_periodogram" -> s"""
      $periodogramCtes
      SELECT g AS event_type, p::INT AS period,
             CAST(power AS DOUBLE) AS power,
             (ROW_NUMBER() OVER (PARTITION BY g
                ORDER BY power DESC, p) = 1) AS dominant
      FROM pw
      ORDER BY event_type, period""",

    // The q_periodogram CTEs + the entropy-precedent p·ln p fold over
    // the normalized 6-dp powers; ln 13 interpolated.
    "q_spectral_entropy" -> s"""
      $periodogramCtes,
      tot AS (SELECT g, SUM(CAST(power AS DECIMAL(38,6))) AS tp,
                     COUNT(*)::BIGINT AS np
              FROM pw GROUP BY g),
      pp AS (SELECT pw.g, tp, np,
                    CAST(pw.power AS DOUBLE) / CAST(tp AS DOUBLE) AS pr
             FROM pw JOIN tot ON tot.g = pw.g),
      f AS (SELECT g, MAX(np)::BIGINT AS np,
                   MAX(CAST(tp AS DOUBLE)) AS tpd,
                   SUM(CAST(CASE WHEN pr > 0.0 THEN
                     ROUND(pr * LN(pr), 12) ELSE 0.0 END
                     AS DECIMAL(38,12))) AS spl
            FROM pp GROUP BY g)
      SELECT g AS event_type, np AS n_periods,
             CAST(CASE WHEN tpd > 0.0 THEN
               ROUND(-CAST(spl AS DOUBLE) / ${math.log(13.0)}, 6) END
               AS DOUBLE) AS h_norm
      FROM f
      ORDER BY event_type""",

    "q_acf" -> """
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      st AS (SELECT g, COUNT(*)::HUGEINT AS n, SUM(x)::HUGEINT AS s
             FROM cells GROUP BY g),
      a AS (SELECT c.g, c.day, st.n * c.x - st.s AS aa
            FROM cells c JOIN st ON c.g = st.g),
      lagged AS (
        SELECT g, aa,
               LEAD(aa, 1) OVER w AS l1,
               LEAD(aa, 2) OVER w AS l2,
               LEAD(aa, 3) OVER w AS l3
        FROM a WINDOW w AS (PARTITION BY g ORDER BY day)),
      agg AS (
        SELECT g, COUNT(*)::BIGINT AS n_days, SUM(aa * aa) AS d,
               SUM(aa * l1) AS n1, SUM(aa * l2) AS n2, SUM(aa * l3) AS n3
        FROM lagged GROUP BY g)
      SELECT g AS event_type, lag,
             CAST(CASE WHEN d <> 0 THEN
               ROUND(CAST(nk AS DOUBLE) / CAST(d AS DOUBLE), 6)
             END AS DOUBLE) AS acf, n_days
      FROM (
        SELECT g, 1 AS lag, n1 AS nk, d, n_days FROM agg
        UNION ALL SELECT g, 2, n2, d, n_days FROM agg
        UNION ALL SELECT g, 3, n3, d, n_days FROM agg)
      ORDER BY event_type, lag""",

    // The q_acf CTEs verbatim, then the Ljung-Box fold: each rounded
    // rho's squared term over (n - k) frozen at 12 dp into a decimal
    // sum, Q = n(n+2)*sum as one rounded float tree.
    "q_ljung_box" -> """
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      st AS (SELECT g, COUNT(*)::HUGEINT AS n, SUM(x)::HUGEINT AS s
             FROM cells GROUP BY g),
      a AS (SELECT c.g, c.day, st.n * c.x - st.s AS aa
            FROM cells c JOIN st ON c.g = st.g),
      lagged AS (
        SELECT g, aa,
               LEAD(aa, 1) OVER w AS l1,
               LEAD(aa, 2) OVER w AS l2,
               LEAD(aa, 3) OVER w AS l3
        FROM a WINDOW w AS (PARTITION BY g ORDER BY day)),
      agg AS (
        SELECT g, COUNT(*)::BIGINT AS n_days, SUM(aa * aa) AS d,
               SUM(aa * l1) AS n1, SUM(aa * l2) AS n2, SUM(aa * l3) AS n3
        FROM lagged GROUP BY g),
      rho AS (
        SELECT g, lag, n_days,
               CASE WHEN d <> 0 THEN
                 ROUND(CAST(nk AS DOUBLE) / CAST(d AS DOUBLE), 6)
               END AS r
        FROM (
          SELECT g, 1 AS lag, n1 AS nk, d, n_days FROM agg
          UNION ALL SELECT g, 2, n2, d, n_days FROM agg
          UNION ALL SELECT g, 3, n3, d, n_days FROM agg)),
      fold AS (
        SELECT g, MAX(n_days) AS n_days, COUNT(r) AS nk, COUNT(*) AS k,
               SUM(CAST(ROUND(r * r / CAST(n_days - lag AS DOUBLE), 12)
                 AS DECIMAL(38,12))) AS t
        FROM rho GROUP BY g)
      SELECT g AS event_type, n_days, 3 AS m,
             CAST(CASE WHEN nk = k AND n_days > 3 THEN
               ROUND(CAST(n_days AS DOUBLE) * CAST(n_days + 2 AS DOUBLE)
                 * CAST(t AS DOUBLE), 6)
             END AS DOUBLE) AS q
      FROM fold ORDER BY event_type""",

    // The q_acf CTEs at maxLag 2, the exact-decimal day-cell mean,
    // the last-two-cells window, and the same Yule-Walker phi and
    // forecast float trees.
    // Lag-7 seasonal difference of the day cells, then the q_arp
    // AR(2) pipeline on the DIFFERENCED series, integrated back
    // through the rn=7 anchor of the ORIGINAL cells.
    "q_arp_seasonal" -> """
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      dcells AS (
        SELECT g, day, x - xs AS x FROM (
          SELECT g, day, x,
                 LAG(x, 7) OVER (PARTITION BY g ORDER BY day) AS xs
          FROM cells)
        WHERE xs IS NOT NULL),
      st AS (SELECT g, COUNT(*)::HUGEINT AS n, SUM(x)::HUGEINT AS s
             FROM dcells GROUP BY g),
      a AS (SELECT c.g, c.day, st.n * c.x - st.s AS aa
            FROM dcells c JOIN st ON c.g = st.g),
      lagged AS (
        SELECT g, aa,
               LEAD(aa, 1) OVER w AS l1,
               LEAD(aa, 2) OVER w AS l2
        FROM a WINDOW w AS (PARTITION BY g ORDER BY day)),
      agg AS (
        SELECT g, COUNT(*)::BIGINT AS n_days, SUM(aa * aa) AS d,
               SUM(aa * l1) AS n1, SUM(aa * l2) AS n2
        FROM lagged GROUP BY g),
      rho AS (
        SELECT g, n_days,
               CASE WHEN d <> 0 THEN
                 ROUND(CAST(n1 AS DOUBLE) / CAST(d AS DOUBLE), 6)
               END AS r1,
               CASE WHEN d <> 0 THEN
                 ROUND(CAST(n2 AS DOUBLE) / CAST(d AS DOUBLE), 6)
               END AS r2
        FROM agg),
      mu AS (
        SELECT g, ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                 / 1000000.0, 6) AS mu
        FROM st),
      lastt AS (
        SELECT g,
               MAX(CASE WHEN rn = 1 THEN xr END) AS xn,
               MAX(CASE WHEN rn = 2 THEN xr END) AS xn1
        FROM (
          SELECT g, ROUND(x / 1000000.0, 6) AS xr,
                 ROW_NUMBER() OVER (PARTITION BY g ORDER BY day DESC)
                   AS rn
          FROM dcells)
        WHERE rn <= 2 GROUP BY g),
      anchor AS (
        SELECT g, ROUND(x / 1000000.0, 6) AS xa FROM (
          SELECT g, x,
                 ROW_NUMBER() OVER (PARTITION BY g ORDER BY day DESC)
                   AS rn
          FROM cells)
        WHERE rn = 7),
      f AS (
        SELECT rho.g AS g, n_days, mu, xn, xn1, xa,
               CASE WHEN n_days >= 3 AND r1 IS NOT NULL
                      AND r2 IS NOT NULL AND 1.0 - r1 * r1 > 0.0 THEN
                 ROUND(r1 * (1.0 - (r2 - r1 * r1) / (1.0 - r1 * r1)), 6)
               END AS phi1,
               CASE WHEN n_days >= 3 AND r1 IS NOT NULL
                      AND r2 IS NOT NULL AND 1.0 - r1 * r1 > 0.0 THEN
                 ROUND((r2 - r1 * r1) / (1.0 - r1 * r1), 6) END AS phi2
        FROM rho JOIN mu ON rho.g = mu.g JOIN lastt ON rho.g = lastt.g
        LEFT JOIN anchor ON rho.g = anchor.g),
      f2 AS (
        SELECT g, n_days, phi1, phi2, xa, mu,
               CASE WHEN phi1 IS NOT NULL THEN
                 ROUND(mu + phi1 * (xn - mu) + phi2 * (xn1 - mu), 6)
               END AS diff_forecast
        FROM f)
      SELECT g AS event_type, n_days,
             CAST(phi1 AS DOUBLE) AS phi1, CAST(phi2 AS DOUBLE) AS phi2,
             CAST(NULL AS DOUBLE) AS phi3,
             CAST(diff_forecast AS DOUBLE) AS diff_forecast,
             CAST(CASE WHEN xa IS NOT NULL
                    AND COALESCE(diff_forecast, mu) IS NOT NULL THEN
               ROUND(xa + COALESCE(diff_forecast, mu), 6) END
               AS DOUBLE) AS forecast
      FROM f2 ORDER BY event_type""",

    // The q_ar2_forecast cells + a lag-3 column, then the Durbin–
    // Levinson level-2/3 unroll (identical spelling to q_pacf) and the
    // three-term forecast tree anchored on μ and the last three cells.
    "q_arp_forecast" -> """
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      st AS (SELECT g, COUNT(*)::HUGEINT AS n, SUM(x)::HUGEINT AS s
             FROM cells GROUP BY g),
      a AS (SELECT c.g, c.day, st.n * c.x - st.s AS aa
            FROM cells c JOIN st ON c.g = st.g),
      lagged AS (
        SELECT g, aa,
               LEAD(aa, 1) OVER w AS l1,
               LEAD(aa, 2) OVER w AS l2,
               LEAD(aa, 3) OVER w AS l3
        FROM a WINDOW w AS (PARTITION BY g ORDER BY day)),
      agg AS (
        SELECT g, COUNT(*)::BIGINT AS n_days, SUM(aa * aa) AS d,
               SUM(aa * l1) AS n1, SUM(aa * l2) AS n2, SUM(aa * l3) AS n3
        FROM lagged GROUP BY g),
      rho AS (
        SELECT g, n_days,
               CASE WHEN d <> 0 THEN
                 ROUND(CAST(n1 AS DOUBLE) / CAST(d AS DOUBLE), 6)
               END AS r1,
               CASE WHEN d <> 0 THEN
                 ROUND(CAST(n2 AS DOUBLE) / CAST(d AS DOUBLE), 6)
               END AS r2,
               CASE WHEN d <> 0 THEN
                 ROUND(CAST(n3 AS DOUBLE) / CAST(d AS DOUBLE), 6)
               END AS r3
        FROM agg),
      mu AS (
        SELECT g, ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                 / 1000000.0, 6) AS mu
        FROM st),
      lastt AS (
        SELECT g,
               MAX(CASE WHEN rn = 1 THEN xr END) AS xn,
               MAX(CASE WHEN rn = 2 THEN xr END) AS xn1,
               MAX(CASE WHEN rn = 3 THEN xr END) AS xn2
        FROM (
          SELECT g, ROUND(x / 1000000.0, 6) AS xr,
                 ROW_NUMBER() OVER (PARTITION BY g ORDER BY day DESC)
                   AS rn
          FROM cells)
        WHERE rn <= 3 GROUP BY g),
      dl1 AS (
        SELECT rho.g AS g, n_days, r1, r2, r3, mu, xn, xn1, xn2,
               (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22
        FROM rho JOIN mu ON rho.g = mu.g JOIN lastt ON rho.g = lastt.g),
      dl2 AS (SELECT *, r1 * (1.0 - p22) AS p21 FROM dl1),
      dl3 AS (
        SELECT *,
               (r3 - p21 * r2 - p22 * r1)
                 / (1.0 - p21 * r1 - p22 * r2) AS p33,
               1.0 - p21 * r1 - p22 * r2 AS den3
        FROM dl2),
      f AS (
        SELECT g, n_days, mu, xn, xn1, xn2,
               CASE WHEN n_days >= 4 AND r1 IS NOT NULL
                      AND r2 IS NOT NULL AND r3 IS NOT NULL
                      AND 1.0 - r1 * r1 > 0.0 AND den3 <> 0.0 THEN
                 ROUND(p21 - p33 * p22, 6) END AS phi1,
               CASE WHEN n_days >= 4 AND r1 IS NOT NULL
                      AND r2 IS NOT NULL AND r3 IS NOT NULL
                      AND 1.0 - r1 * r1 > 0.0 AND den3 <> 0.0 THEN
                 ROUND(p22 - p33 * p21, 6) END AS phi2,
               CASE WHEN n_days >= 4 AND r1 IS NOT NULL
                      AND r2 IS NOT NULL AND r3 IS NOT NULL
                      AND 1.0 - r1 * r1 > 0.0 AND den3 <> 0.0 THEN
                 ROUND(p33, 6) END AS phi3
        FROM dl3)
      SELECT g AS event_type, n_days,
             CAST(phi1 AS DOUBLE) AS phi1, CAST(phi2 AS DOUBLE) AS phi2,
             CAST(phi3 AS DOUBLE) AS phi3,
             CAST(CASE WHEN phi1 IS NOT NULL THEN
               ROUND(mu + phi1 * (xn - mu) + phi2 * (xn1 - mu)
                 + phi3 * (xn2 - mu), 6)
             END AS DOUBLE) AS forecast
      FROM f ORDER BY event_type""",

    // The q_arp_forecast cells + lag-1 acf, θ from the invertible
    // MA(1) moment root, ε_n as the explicit 8-term truncated
    // inversion (powers spelled as literal products), forecast
    // μ + θ·ε_n.
    "q_ma_forecast" -> """
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      st AS (SELECT g, COUNT(*)::HUGEINT AS n, SUM(x)::HUGEINT AS s
             FROM cells GROUP BY g),
      a AS (SELECT c.g, c.day, st.n * c.x - st.s AS aa
            FROM cells c JOIN st ON c.g = st.g),
      lagged AS (
        SELECT g, aa, LEAD(aa, 1) OVER w AS l1
        FROM a WINDOW w AS (PARTITION BY g ORDER BY day)),
      agg AS (
        SELECT g, COUNT(*)::BIGINT AS n_days, SUM(aa * aa) AS d,
               SUM(aa * l1) AS n1
        FROM lagged GROUP BY g),
      rho AS (
        SELECT g, n_days,
               CASE WHEN d <> 0 THEN
                 ROUND(CAST(n1 AS DOUBLE) / CAST(d AS DOUBLE), 6)
               END AS r1
        FROM agg),
      mu AS (
        SELECT g, ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                 / 1000000.0, 6) AS mu
        FROM st),
      lastt AS (
        SELECT g,
               MAX(CASE WHEN rn = 1 THEN xr END) AS x1,
               MAX(CASE WHEN rn = 2 THEN xr END) AS x2,
               MAX(CASE WHEN rn = 3 THEN xr END) AS x3,
               MAX(CASE WHEN rn = 4 THEN xr END) AS x4,
               MAX(CASE WHEN rn = 5 THEN xr END) AS x5,
               MAX(CASE WHEN rn = 6 THEN xr END) AS x6,
               MAX(CASE WHEN rn = 7 THEN xr END) AS x7,
               MAX(CASE WHEN rn = 8 THEN xr END) AS x8
        FROM (
          SELECT g, ROUND(x / 1000000.0, 6) AS xr,
                 ROW_NUMBER() OVER (PARTITION BY g ORDER BY day DESC)
                   AS rn
          FROM cells)
        WHERE rn <= 8 GROUP BY g),
      th AS (
        SELECT rho.g AS g, n_days, r1, mu,
               x1, x2, x3, x4, x5, x6, x7, x8,
               CASE WHEN n_days >= 2 AND r1 IS NOT NULL
                      AND ABS(r1) < 0.5 THEN
                 ROUND(CASE WHEN r1 = 0.0 THEN 0.0 ELSE
                   (1.0 - SQRT(1.0 - 4.0 * r1 * r1)) / (2.0 * r1)
                 END, 6) END AS theta
        FROM rho JOIN mu ON rho.g = mu.g
                 JOIN lastt ON rho.g = lastt.g),
      e AS (
        SELECT *,
               CASE WHEN theta IS NOT NULL THEN ROUND(
                 (COALESCE(x1, mu) - mu)
                 + (-theta) * (COALESCE(x2, mu) - mu)
                 + (-theta) * (-theta) * (COALESCE(x3, mu) - mu)
                 + (-theta) * (-theta) * (-theta)
                   * (COALESCE(x4, mu) - mu)
                 + (-theta) * (-theta) * (-theta) * (-theta)
                   * (COALESCE(x5, mu) - mu)
                 + (-theta) * (-theta) * (-theta) * (-theta) * (-theta)
                   * (COALESCE(x6, mu) - mu)
                 + (-theta) * (-theta) * (-theta) * (-theta) * (-theta)
                   * (-theta) * (COALESCE(x7, mu) - mu)
                 + (-theta) * (-theta) * (-theta) * (-theta) * (-theta)
                   * (-theta) * (-theta) * (COALESCE(x8, mu) - mu),
                 6) END AS eps
        FROM th)
      SELECT g AS event_type, n_days, CAST(r1 AS DOUBLE) AS rho1,
             CAST(theta AS DOUBLE) AS theta, CAST(eps AS DOUBLE) AS eps,
             CAST(CASE WHEN eps IS NOT NULL THEN
               ROUND(mu + theta * eps, 6) END AS DOUBLE) AS forecast
      FROM e ORDER BY event_type""",

    // The q_ma_forecast cells + lag-1 acf; γ0 from the exact decimal
    // moments, band = forecast ± z·√(γ0(1−φ²)).
    "q_forecast_interval" -> """
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      st AS (SELECT g, COUNT(*)::HUGEINT AS n, SUM(x::HUGEINT) AS s,
                    SUM(x::HUGEINT * x) AS q
             FROM cells GROUP BY g),
      mo AS (
        SELECT g,
               ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                 / 1000000.0, 6) AS mu,
               CASE WHEN n >= 2 THEN
                 ROUND((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                   / 1000000000000.0, 6) END AS gamma0
        FROM st),
      a AS (SELECT c.g, c.day, st.n * c.x - st.s AS aa
            FROM cells c JOIN st ON c.g = st.g),
      lagged AS (
        SELECT g, aa, LEAD(aa, 1) OVER w AS l1
        FROM a WINDOW w AS (PARTITION BY g ORDER BY day)),
      agg AS (
        SELECT g, COUNT(*)::BIGINT AS n_days, SUM(aa * aa) AS d,
               SUM(aa * l1) AS n1
        FROM lagged GROUP BY g),
      rho AS (
        SELECT g, n_days,
               CASE WHEN d <> 0 THEN
                 ROUND(CAST(n1 AS DOUBLE) / CAST(d AS DOUBLE), 6)
               END AS r1
        FROM agg),
      lastt AS (
        SELECT g, MAX(CASE WHEN rn = 1 THEN xr END) AS xn
        FROM (
          SELECT g, ROUND(x / 1000000.0, 6) AS xr,
                 ROW_NUMBER() OVER (PARTITION BY g ORDER BY day DESC)
                   AS rn
          FROM cells)
        WHERE rn = 1 GROUP BY g),
      f AS (
        SELECT rho.g AS g, n_days, mu, gamma0, xn,
               CASE WHEN n_days >= 2 AND r1 IS NOT NULL THEN r1 END
                 AS phi1
        FROM rho JOIN mo ON rho.g = mo.g
                 JOIN lastt ON rho.g = lastt.g),
      o AS (
        SELECT g, n_days, phi1, gamma0,
               CASE WHEN phi1 IS NOT NULL AND ABS(phi1) < 1.0
                      AND gamma0 IS NOT NULL THEN
                 ROUND(mu + phi1 * (xn - mu), 6) END AS forecast,
               CASE WHEN phi1 IS NOT NULL AND ABS(phi1) < 1.0
                      AND gamma0 IS NOT NULL
                      AND gamma0 * (1.0 - phi1 * phi1) >= 0.0 THEN
                 ROUND(SQRT(gamma0 * (1.0 - phi1 * phi1)), 6)
               END AS se
        FROM f)
      SELECT g AS event_type, n_days,
             CAST(phi1 AS DOUBLE) AS phi1, CAST(gamma0 AS DOUBLE)
               AS gamma0,
             CAST(forecast AS DOUBLE) AS forecast,
             CAST(se AS DOUBLE) AS se,
             CAST(CASE WHEN se IS NOT NULL THEN
               ROUND(forecast - 1.96 * se, 6) END AS DOUBLE) AS lo,
             CAST(CASE WHEN se IS NOT NULL THEN
               ROUND(forecast + 1.96 * se, 6) END AS DOUBLE) AS hi
      FROM o ORDER BY event_type""",

    // The q_ma_forecast skeleton at two lags: φ = ρ2/ρ1, B from the
    // mixed moment, the invertible quadratic root, then the 7-term
    // truncated inversion of d_t = (x_t−μ) − φ(x_{t−1}−μ).
    "q_arma_forecast" -> """
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      st AS (SELECT g, COUNT(*)::HUGEINT AS n, SUM(x)::HUGEINT AS s
             FROM cells GROUP BY g),
      a AS (SELECT c.g, c.day, st.n * c.x - st.s AS aa
            FROM cells c JOIN st ON c.g = st.g),
      lagged AS (
        SELECT g, aa,
               LEAD(aa, 1) OVER w AS l1,
               LEAD(aa, 2) OVER w AS l2
        FROM a WINDOW w AS (PARTITION BY g ORDER BY day)),
      agg AS (
        SELECT g, COUNT(*)::BIGINT AS n_days, SUM(aa * aa) AS d,
               SUM(aa * l1) AS n1, SUM(aa * l2) AS n2
        FROM lagged GROUP BY g),
      rho AS (
        SELECT g, n_days,
               CASE WHEN d <> 0 THEN
                 ROUND(CAST(n1 AS DOUBLE) / CAST(d AS DOUBLE), 6)
               END AS r1,
               CASE WHEN d <> 0 THEN
                 ROUND(CAST(n2 AS DOUBLE) / CAST(d AS DOUBLE), 6)
               END AS r2
        FROM agg),
      mu AS (
        SELECT g, ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                 / 1000000.0, 6) AS mu
        FROM st),
      lastt AS (
        SELECT g,
               MAX(CASE WHEN rn = 1 THEN xr END) AS x1,
               MAX(CASE WHEN rn = 2 THEN xr END) AS x2,
               MAX(CASE WHEN rn = 3 THEN xr END) AS x3,
               MAX(CASE WHEN rn = 4 THEN xr END) AS x4,
               MAX(CASE WHEN rn = 5 THEN xr END) AS x5,
               MAX(CASE WHEN rn = 6 THEN xr END) AS x6,
               MAX(CASE WHEN rn = 7 THEN xr END) AS x7,
               MAX(CASE WHEN rn = 8 THEN xr END) AS x8
        FROM (
          SELECT g, ROUND(x / 1000000.0, 6) AS xr,
                 ROW_NUMBER() OVER (PARTITION BY g ORDER BY day DESC)
                   AS rn
          FROM cells)
        WHERE rn <= 8 GROUP BY g),
      ph AS (
        SELECT rho.g AS g, n_days, r1, r2, mu,
               x1, x2, x3, x4, x5, x6, x7, x8,
               CASE WHEN n_days >= 3 AND r1 IS NOT NULL
                      AND r2 IS NOT NULL AND r1 <> 0.0 THEN
                 ROUND(r2 / r1, 6) END AS phi
        FROM rho JOIN mu ON rho.g = mu.g
                 JOIN lastt ON rho.g = lastt.g),
      bb AS (
        SELECT *,
               (2.0 * r1 * phi - 1.0 - phi * phi) / (r1 - phi) AS b
        FROM ph),
      th AS (
        SELECT *,
               CASE WHEN phi IS NOT NULL AND ABS(phi) < 1.0
                      AND r1 - phi <> 0.0
                      AND b * b - 4.0 >= 0.0 THEN
                 ROUND(CASE WHEN b > 0.0 THEN
                     (-b + SQRT(b * b - 4.0)) / 2.0
                   ELSE (-b - SQRT(b * b - 4.0)) / 2.0 END, 6)
               END AS thr
        FROM bb),
      tv AS (
        SELECT *, CASE WHEN ABS(thr) < 1.0 THEN thr END AS theta
        FROM th),
      e AS (
        SELECT *,
               CASE WHEN theta IS NOT NULL THEN ROUND(
                 ((COALESCE(x1, mu) - mu)
                    - phi * (COALESCE(x2, mu) - mu))
                 + (-theta) * ((COALESCE(x2, mu) - mu)
                    - phi * (COALESCE(x3, mu) - mu))
                 + (-theta) * (-theta) * ((COALESCE(x3, mu) - mu)
                    - phi * (COALESCE(x4, mu) - mu))
                 + (-theta) * (-theta) * (-theta)
                   * ((COALESCE(x4, mu) - mu)
                      - phi * (COALESCE(x5, mu) - mu))
                 + (-theta) * (-theta) * (-theta) * (-theta)
                   * ((COALESCE(x5, mu) - mu)
                      - phi * (COALESCE(x6, mu) - mu))
                 + (-theta) * (-theta) * (-theta) * (-theta) * (-theta)
                   * ((COALESCE(x6, mu) - mu)
                      - phi * (COALESCE(x7, mu) - mu))
                 + (-theta) * (-theta) * (-theta) * (-theta) * (-theta)
                   * (-theta) * ((COALESCE(x7, mu) - mu)
                      - phi * (COALESCE(x8, mu) - mu)),
                 6) END AS eps
        FROM tv)
      SELECT g AS event_type, n_days,
             CAST(r1 AS DOUBLE) AS rho1, CAST(r2 AS DOUBLE) AS rho2,
             CAST(CASE WHEN theta IS NOT NULL THEN phi END AS DOUBLE)
               AS phi,
             CAST(theta AS DOUBLE) AS theta, CAST(eps AS DOUBLE) AS eps,
             CAST(CASE WHEN eps IS NOT NULL THEN
               ROUND(mu + phi * (COALESCE(x1, mu) - mu) + theta * eps,
                 6) END AS DOUBLE) AS forecast
      FROM e ORDER BY event_type""",

    // The q_arp_forecast acf fold + Durbin–Levinson diagonal, then
    // ΔAIC_p = n·ln Π(1−φ_kk²) + 2p and the parsimony argmin.
    "q_ar_order" -> """
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      st AS (SELECT g, COUNT(*)::HUGEINT AS n, SUM(x)::HUGEINT AS s
             FROM cells GROUP BY g),
      a AS (SELECT c.g, c.day, st.n * c.x - st.s AS aa
            FROM cells c JOIN st ON c.g = st.g),
      lagged AS (
        SELECT g, aa,
               LEAD(aa, 1) OVER w AS l1,
               LEAD(aa, 2) OVER w AS l2,
               LEAD(aa, 3) OVER w AS l3
        FROM a WINDOW w AS (PARTITION BY g ORDER BY day)),
      agg AS (
        SELECT g, COUNT(*)::BIGINT AS n_days, SUM(aa * aa) AS d,
               SUM(aa * l1) AS n1, SUM(aa * l2) AS n2, SUM(aa * l3) AS n3
        FROM lagged GROUP BY g),
      rho AS (
        SELECT g, n_days,
               CASE WHEN d <> 0 THEN
                 ROUND(CAST(n1 AS DOUBLE) / CAST(d AS DOUBLE), 6)
               END AS r1,
               CASE WHEN d <> 0 THEN
                 ROUND(CAST(n2 AS DOUBLE) / CAST(d AS DOUBLE), 6)
               END AS r2,
               CASE WHEN d <> 0 THEN
                 ROUND(CAST(n3 AS DOUBLE) / CAST(d AS DOUBLE), 6)
               END AS r3
        FROM agg),
      dl1 AS (
        SELECT g, n_days, r1, r2, r3,
               (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22
        FROM rho),
      dl2 AS (SELECT *, r1 * (1.0 - p22) AS p21 FROM dl1),
      dl3 AS (
        SELECT *,
               (r3 - p21 * r2 - p22 * r1)
                 / (1.0 - p21 * r1 - p22 * r2) AS p33,
               1.0 - p21 * r1 - p22 * r2 AS den3
        FROM dl2),
      f AS (
        SELECT g, n_days,
               CASE WHEN n_days >= 2 AND r1 IS NOT NULL
                      AND r1 * r1 < 1.0 THEN
                 ROUND(CAST(n_days AS DOUBLE) * LN(1.0 - r1 * r1)
                   + 2.0, 6) END AS aic1,
               CASE WHEN n_days >= 3 AND r1 IS NOT NULL
                      AND r1 * r1 < 1.0 AND r2 IS NOT NULL
                      AND 1.0 - r1 * r1 > 0.0
                      AND p22 * p22 < 1.0 THEN
                 ROUND(CAST(n_days AS DOUBLE)
                   * LN((1.0 - r1 * r1) * (1.0 - p22 * p22))
                   + 4.0, 6) END AS aic2,
               CASE WHEN n_days >= 4 AND r1 IS NOT NULL
                      AND r1 * r1 < 1.0 AND r2 IS NOT NULL
                      AND 1.0 - r1 * r1 > 0.0 AND p22 * p22 < 1.0
                      AND r3 IS NOT NULL AND den3 <> 0.0
                      AND p33 * p33 < 1.0 THEN
                 ROUND(CAST(n_days AS DOUBLE)
                   * LN((1.0 - r1 * r1) * (1.0 - p22 * p22)
                        * (1.0 - p33 * p33))
                   + 6.0, 6) END AS aic3
        FROM dl3)
      SELECT g AS event_type, n_days,
             CAST(aic1 AS DOUBLE) AS aic1, CAST(aic2 AS DOUBLE) AS aic2,
             CAST(aic3 AS DOUBLE) AS aic3,
             CAST(CASE
               WHEN aic3 IS NOT NULL AND aic3 < 0.0
                    AND (aic1 IS NULL OR aic3 < aic1)
                    AND (aic2 IS NULL OR aic3 < aic2) THEN 3
               WHEN aic2 IS NOT NULL AND aic2 < 0.0
                    AND (aic1 IS NULL OR aic2 < aic1) THEN 2
               WHEN aic1 IS NOT NULL AND aic1 < 0.0 THEN 1
               ELSE 0 END AS INT) AS best_p
      FROM f ORDER BY event_type""",

    "q_ar2_forecast" -> """
      WITH cells AS (
        SELECT event_type AS g,
               (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                - ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 86400 + 86400)
                   % 86400)) // 86400 AS day,
               SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))::BIGINT AS x
        FROM events GROUP BY 1, 2),
      st AS (SELECT g, COUNT(*)::HUGEINT AS n, SUM(x)::HUGEINT AS s
             FROM cells GROUP BY g),
      a AS (SELECT c.g, c.day, st.n * c.x - st.s AS aa
            FROM cells c JOIN st ON c.g = st.g),
      lagged AS (
        SELECT g, aa,
               LEAD(aa, 1) OVER w AS l1,
               LEAD(aa, 2) OVER w AS l2
        FROM a WINDOW w AS (PARTITION BY g ORDER BY day)),
      agg AS (
        SELECT g, COUNT(*)::BIGINT AS n_days, SUM(aa * aa) AS d,
               SUM(aa * l1) AS n1, SUM(aa * l2) AS n2
        FROM lagged GROUP BY g),
      rho AS (
        SELECT g, n_days,
               CASE WHEN d <> 0 THEN
                 ROUND(CAST(n1 AS DOUBLE) / CAST(d AS DOUBLE), 6)
               END AS r1,
               CASE WHEN d <> 0 THEN
                 ROUND(CAST(n2 AS DOUBLE) / CAST(d AS DOUBLE), 6)
               END AS r2
        FROM agg),
      mu AS (
        SELECT g, ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                 / 1000000.0, 6) AS mu
        FROM st),
      lastt AS (
        SELECT g,
               MAX(CASE WHEN rn = 1 THEN xr END) AS xn,
               MAX(CASE WHEN rn = 2 THEN xr END) AS xn1
        FROM (
          SELECT g, ROUND(x / 1000000.0, 6) AS xr,
                 ROW_NUMBER() OVER (PARTITION BY g ORDER BY day DESC)
                   AS rn
          FROM cells)
        WHERE rn <= 2 GROUP BY g),
      f AS (
        SELECT rho.g AS g, n_days, r1, r2, mu, xn, xn1,
               CASE WHEN n_days >= 3 AND 1.0 - r1 * r1 > 0.0 THEN
                 ROUND(r1 * (1.0 - r2) / (1.0 - r1 * r1), 6) END AS phi1,
               CASE WHEN n_days >= 3 AND 1.0 - r1 * r1 > 0.0 THEN
                 ROUND((r2 - r1 * r1) / (1.0 - r1 * r1), 6) END AS phi2
        FROM rho JOIN mu ON rho.g = mu.g JOIN lastt ON rho.g = lastt.g)
      SELECT g AS event_type, n_days,
             CAST(phi1 AS DOUBLE) AS phi1, CAST(phi2 AS DOUBLE) AS phi2,
             CAST(CASE WHEN phi1 IS NOT NULL THEN
               ROUND(mu + phi1 * (xn - mu) + phi2 * (xn1 - mu), 6)
             END AS DOUBLE) AS forecast
      FROM f ORDER BY event_type""",

    // Same day cells, the same complete-case/dup contracts as
    // q_friedman, and the exact-integer Cochran fold with ONE
    // rounded division.
    "q_cochran_q" -> """
      WITH cells AS (
        SELECT event_type AS i,
               DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS b,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY 1, 2),
      flags AS (
        SELECT b, i,
               CASE WHEN cents / 100.0 > 1500.0 THEN 1 ELSE 0 END AS x
        FROM cells),
      k AS (SELECT COUNT(DISTINCT i) AS kk FROM flags),
      complete AS (
        SELECT b FROM flags GROUP BY b
        HAVING COUNT(DISTINCT i) = (SELECT kk FROM k)),
      kept AS (SELECT f.* FROM flags f JOIN complete c ON f.b = c.b),
      byt AS (SELECT i, SUM(x)::HUGEINT AS cj, COUNT(*)::BIGINT AS nb
              FROM kept GROUP BY i),
      byb AS (SELECT SUM(ri * ri)::HUGEINT AS sr2, SUM(ri)::HUGEINT AS nt
              FROM (SELECT b, SUM(x)::HUGEINT AS ri
                    FROM kept GROUP BY b)),
      f AS (SELECT MAX(nb) AS n, COUNT(*) AS kk,
              SUM(cj * cj)::HUGEINT AS sc2 FROM byt)
      SELECT n::BIGINT AS n_blocks, kk::BIGINT AS k,
             (kk - 1)::BIGINT AS dof,
             CAST(CASE WHEN kk >= 2 AND n >= 1
                    AND CAST(kk * nt - sr2 AS DOUBLE) > 0.0 THEN
               ROUND(CAST(kk - 1 AS DOUBLE)
                 * CAST(kk * sc2 - nt * nt AS DOUBLE)
                 / CAST(kk * nt - sr2 AS DOUBLE), 6)
             END AS DOUBLE) AS q
      FROM f CROSS JOIN byb""",

    // user_id % 10 buckets vs the declared uniform design: absent
    // buckets pay full E, terms frozen at 12 dp into the decimal fold.
    "q_srm" -> """
      WITH obs AS (
        SELECT CAST(user_id % 10 AS VARCHAR) AS c, COUNT(*)::BIGINT AS o
        FROM events GROUP BY 1),
      exp AS (
        SELECT CAST(i AS VARCHAR) AS ec, CAST(0.1 AS DOUBLE) AS w
        FROM range(10) t(i)),
      j AS (
        SELECT ec, COALESCE(o, 0)::BIGINT AS o, w
        FROM exp LEFT JOIN obs ON obs.c = exp.ec),
      n AS (SELECT SUM(o)::BIGINT AS nt FROM j),
      t AS (SELECT o, CAST(nt AS DOUBLE) * w AS e, nt FROM j
            CROSS JOIN n)
      SELECT MAX(nt)::BIGINT AS n, COUNT(*)::BIGINT AS k,
             (COUNT(*) - 1)::BIGINT AS dof,
             CAST(CASE WHEN MAX(nt) > 0 THEN
               ROUND(CAST(SUM(CAST(ROUND(
                 (CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e,
                 12) AS DECIMAL(38,12))) AS DOUBLE), 6)
             END AS DOUBLE) AS chi2
      FROM t""",

    // Same time-to-first-purchase durations, the same exclusive
    // prior-exits window for at-risk counts, and the same guarded
    // ln/exp product chain with the exact-zero cumulative flag.
    // q_kaplan_meier's CTEs + the Greenwood cumulative + the log-log
    // band tree, identically spelled.
    "q_km_ci" -> """
      WITH subj AS (
        SELECT user_id,
               DATE_DIFF('day', MIN(CAST(ts AS DATE)),
                 COALESCE(MIN(CASE WHEN event_type = 'purchase'
                                THEN CAST(ts AS DATE) END),
                          MAX(CAST(ts AS DATE)))) AS duration,
               MIN(CASE WHEN event_type = 'purchase'
                     THEN CAST(ts AS DATE) END) IS NOT NULL AS observed
        FROM events GROUP BY user_id),
      cells AS (
        SELECT duration,
               SUM(CASE WHEN observed THEN 1 ELSE 0 END)::BIGINT
                 AS n_events,
               SUM(CASE WHEN observed THEN 0 ELSE 1 END)::BIGINT
                 AS n_censored
        FROM subj GROUP BY duration),
      km AS (
        SELECT duration, n_events, n_censored,
               ((SELECT SUM(n_events + n_censored) FROM cells)
                 - COALESCE(SUM(n_events + n_censored) OVER
                     (ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), 0))::BIGINT AS n_at_risk
        FROM cells),
      km2 AS (
        SELECT duration, n_events, n_censored, n_at_risk,
               SUM(CASE WHEN n_events < n_at_risk
                    THEN LN(1.0 - n_events / CAST(n_at_risk AS DOUBLE))
                    ELSE 0.0 END) OVER (ORDER BY duration) AS lnsum,
               SUM(CASE WHEN n_events < n_at_risk
                    THEN n_events / CAST(n_at_risk
                           * (n_at_risk - n_events) AS DOUBLE)
                    ELSE 0.0 END) OVER (ORDER BY duration) AS gw,
               MAX(CASE WHEN n_events = n_at_risk THEN 1 ELSE 0 END)
                 OVER (ORDER BY duration) AS hitzero
        FROM km)
      SELECT duration, n_at_risk, n_events, n_censored,
             CAST(CASE WHEN hitzero = 1 THEN 0.0
                  ELSE ROUND(EXP(lnsum), 6) END AS DOUBLE) AS survival,
             CAST(CASE WHEN hitzero = 1 OR lnsum >= 0.0 OR gw <= 0.0
                  THEN NULL
                  ELSE ROUND(EXP(EXP(1.96 * (SQRT(gw) / -lnsum)) * lnsum),
                             6) END AS DOUBLE) AS ci_lo,
             CAST(CASE WHEN hitzero = 1 OR lnsum >= 0.0 OR gw <= 0.0
                  THEN NULL
                  ELSE ROUND(EXP(EXP(-1.96 * (SQRT(gw) / -lnsum)) * lnsum),
                             6) END AS DOUBLE) AS ci_hi
      FROM km2
      WHERE n_events > 0
      ORDER BY duration""",

    // 3 unrolled Newton iterations + the final observed-information
    // pass — every freeze identical to the operator.
    "q_cox_ph" -> """
      WITH subj0 AS (
        SELECT user_id,
               DATE_DIFF('day', MIN(CAST(ts AS DATE)),
                 COALESCE(MIN(CASE WHEN event_type = 'purchase'
                                THEN CAST(ts AS DATE) END),
                          MAX(CAST(ts AS DATE)))) AS t,
               CASE WHEN MIN(CASE WHEN event_type = 'purchase'
                     THEN CAST(ts AS DATE) END) IS NOT NULL
                 THEN 1 ELSE 0 END AS e,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS spend
        FROM events GROUP BY user_id),
      subj AS (SELECT t, e, ROUND(LN(1.0 + spend), 6) AS x FROM subj0),
      b0 AS (SELECT 0.0 AS b),
      terms1 AS (
        SELECT t, e, x,
               CAST(ROUND(EXP(b0.b * x), 12) AS DECIMAL(38,12)) AS ex,
               CAST(ROUND(x * EXP(b0.b * x), 12) AS DECIMAL(38,12))
                 AS xex,
               CAST(ROUND(x * x * EXP(b0.b * x), 12)
                 AS DECIMAL(38,12)) AS xxex
        FROM subj CROSS JOIN b0),
      cells1 AS (
        SELECT t, SUM(ex) AS s0c, SUM(xex) AS s1c, SUM(xxex) AS s2c,
               SUM(e)::BIGINT AS d,
               SUM(CAST(x * e AS DECIMAL(38,6))) AS sx,
               COUNT(*)::BIGINT AS nc
        FROM terms1 GROUP BY t),
      w1 AS (
        SELECT *,
               SUM(s0c) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS s0,
               SUM(s1c) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS s1,
               SUM(s2c) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS s2
        FROM cells1),
      g1 AS (
        SELECT SUM(nc)::BIGINT AS n, SUM(d)::BIGINT AS ne,
               SUM(CASE WHEN d > 0 THEN CAST(ROUND(CAST(sx AS DOUBLE)
                     - d * (CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE)), 12)
                     AS DECIMAL(38,12))
                   ELSE CAST(0.0 AS DECIMAL(38,12)) END) AS u,
               SUM(CASE WHEN d > 0 THEN CAST(ROUND(d
                     * (CAST(s2 AS DOUBLE) / CAST(s0 AS DOUBLE)
                       - (CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE))
                         * (CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE))), 12)
                     AS DECIMAL(38,12))
                   ELSE CAST(0.0 AS DECIMAL(38,12)) END) AS i
        FROM w1),
      b1 AS (
        SELECT CASE WHEN CAST(i AS DOUBLE) > 0.0
               THEN ROUND(b0.b + CAST(u AS DOUBLE) / CAST(i AS DOUBLE),
                          12)
               ELSE b0.b END AS b
        FROM g1 CROSS JOIN b0),
      terms2 AS (
        SELECT t, e, x,
               CAST(ROUND(EXP(b1.b * x), 12) AS DECIMAL(38,12)) AS ex,
               CAST(ROUND(x * EXP(b1.b * x), 12) AS DECIMAL(38,12))
                 AS xex,
               CAST(ROUND(x * x * EXP(b1.b * x), 12)
                 AS DECIMAL(38,12)) AS xxex
        FROM subj CROSS JOIN b1),
      cells2 AS (
        SELECT t, SUM(ex) AS s0c, SUM(xex) AS s1c, SUM(xxex) AS s2c,
               SUM(e)::BIGINT AS d,
               SUM(CAST(x * e AS DECIMAL(38,6))) AS sx,
               COUNT(*)::BIGINT AS nc
        FROM terms2 GROUP BY t),
      w2 AS (
        SELECT *,
               SUM(s0c) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS s0,
               SUM(s1c) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS s1,
               SUM(s2c) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS s2
        FROM cells2),
      g2 AS (
        SELECT SUM(nc)::BIGINT AS n, SUM(d)::BIGINT AS ne,
               SUM(CASE WHEN d > 0 THEN CAST(ROUND(CAST(sx AS DOUBLE)
                     - d * (CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE)), 12)
                     AS DECIMAL(38,12))
                   ELSE CAST(0.0 AS DECIMAL(38,12)) END) AS u,
               SUM(CASE WHEN d > 0 THEN CAST(ROUND(d
                     * (CAST(s2 AS DOUBLE) / CAST(s0 AS DOUBLE)
                       - (CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE))
                         * (CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE))), 12)
                     AS DECIMAL(38,12))
                   ELSE CAST(0.0 AS DECIMAL(38,12)) END) AS i
        FROM w2),
      b2 AS (
        SELECT CASE WHEN CAST(i AS DOUBLE) > 0.0
               THEN ROUND(b1.b + CAST(u AS DOUBLE) / CAST(i AS DOUBLE),
                          12)
               ELSE b1.b END AS b
        FROM g2 CROSS JOIN b1),
      terms3 AS (
        SELECT t, e, x,
               CAST(ROUND(EXP(b2.b * x), 12) AS DECIMAL(38,12)) AS ex,
               CAST(ROUND(x * EXP(b2.b * x), 12) AS DECIMAL(38,12))
                 AS xex,
               CAST(ROUND(x * x * EXP(b2.b * x), 12)
                 AS DECIMAL(38,12)) AS xxex
        FROM subj CROSS JOIN b2),
      cells3 AS (
        SELECT t, SUM(ex) AS s0c, SUM(xex) AS s1c, SUM(xxex) AS s2c,
               SUM(e)::BIGINT AS d,
               SUM(CAST(x * e AS DECIMAL(38,6))) AS sx,
               COUNT(*)::BIGINT AS nc
        FROM terms3 GROUP BY t),
      w3 AS (
        SELECT *,
               SUM(s0c) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS s0,
               SUM(s1c) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS s1,
               SUM(s2c) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS s2
        FROM cells3),
      g3 AS (
        SELECT SUM(nc)::BIGINT AS n, SUM(d)::BIGINT AS ne,
               SUM(CASE WHEN d > 0 THEN CAST(ROUND(CAST(sx AS DOUBLE)
                     - d * (CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE)), 12)
                     AS DECIMAL(38,12))
                   ELSE CAST(0.0 AS DECIMAL(38,12)) END) AS u,
               SUM(CASE WHEN d > 0 THEN CAST(ROUND(d
                     * (CAST(s2 AS DOUBLE) / CAST(s0 AS DOUBLE)
                       - (CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE))
                         * (CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE))), 12)
                     AS DECIMAL(38,12))
                   ELSE CAST(0.0 AS DECIMAL(38,12)) END) AS i
        FROM w3),
      b3 AS (
        SELECT CASE WHEN CAST(i AS DOUBLE) > 0.0
               THEN ROUND(b2.b + CAST(u AS DOUBLE) / CAST(i AS DOUBLE),
                          12)
               ELSE b2.b END AS b
        FROM g3 CROSS JOIN b2),
      terms4 AS (
        SELECT t, e, x,
               CAST(ROUND(EXP(b3.b * x), 12) AS DECIMAL(38,12)) AS ex,
               CAST(ROUND(x * EXP(b3.b * x), 12) AS DECIMAL(38,12))
                 AS xex,
               CAST(ROUND(x * x * EXP(b3.b * x), 12)
                 AS DECIMAL(38,12)) AS xxex
        FROM subj CROSS JOIN b3),
      cells4 AS (
        SELECT t, SUM(ex) AS s0c, SUM(xex) AS s1c, SUM(xxex) AS s2c,
               SUM(e)::BIGINT AS d,
               SUM(CAST(x * e AS DECIMAL(38,6))) AS sx,
               COUNT(*)::BIGINT AS nc
        FROM terms4 GROUP BY t),
      w4 AS (
        SELECT *,
               SUM(s0c) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS s0,
               SUM(s1c) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS s1,
               SUM(s2c) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS s2
        FROM cells4),
      g4 AS (
        SELECT SUM(nc)::BIGINT AS n, SUM(d)::BIGINT AS ne,
               SUM(CASE WHEN d > 0 THEN CAST(ROUND(CAST(sx AS DOUBLE)
                     - d * (CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE)), 12)
                     AS DECIMAL(38,12))
                   ELSE CAST(0.0 AS DECIMAL(38,12)) END) AS u,
               SUM(CASE WHEN d > 0 THEN CAST(ROUND(d
                     * (CAST(s2 AS DOUBLE) / CAST(s0 AS DOUBLE)
                       - (CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE))
                         * (CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE))), 12)
                     AS DECIMAL(38,12))
                   ELSE CAST(0.0 AS DECIMAL(38,12)) END) AS i
        FROM w4),
      fin AS (SELECT * FROM g4 CROSS JOIN b3)
      SELECT 'all' AS g, n, ne AS n_events,
             CAST(ROUND(b, 6) AS DOUBLE) AS beta,
             CAST(ROUND(EXP(b), 6) AS DOUBLE) AS hazard_ratio,
             CAST(CASE WHEN CAST(i AS DOUBLE) > 0.0
               THEN ROUND(1.0 / SQRT(CAST(i AS DOUBLE)), 6)
               END AS DOUBLE) AS se
      FROM fin""",

    // One lag window, nine HUGEINT moments, the identical restricted/
    // unrestricted OLS trees and F ratio.
    "q_granger" -> """
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                 ::BIGINT AS x,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 ::BIGINT AS y
        FROM events GROUP BY 1),
      pts0 AS (SELECT 'all' AS g, d,
                 CAST(ROUND(y * 1000000.0) AS BIGINT) AS yv,
                 CAST(ROUND(x * 1000000.0) AS BIGINT) AS xv
               FROM daily),
      tri AS (
        SELECT g, yv AS y, l, x FROM (
          SELECT g, yv,
                 LAG(yv) OVER (PARTITION BY g ORDER BY d) AS l,
                 LAG(xv) OVER (PARTITION BY g ORDER BY d) AS x
          FROM pts0)
        WHERE l IS NOT NULL AND x IS NOT NULL),
      sums AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(y::HUGEINT) AS sy, SUM(l::HUGEINT) AS sl,
               SUM(x::HUGEINT) AS sx,
               SUM(y::HUGEINT * y) AS syy0, SUM(l::HUGEINT * l) AS sll0,
               SUM(x::HUGEINT * x) AS sxx0, SUM(y::HUGEINT * l) AS syl0,
               SUM(y::HUGEINT * x) AS syx0, SUM(l::HUGEINT * x) AS slx0
        FROM tri GROUP BY g),
      fl AS (
        SELECT g, n,
               CAST(n AS DOUBLE) * CAST(sll0 AS DOUBLE)
                 - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) AS sll,
               CAST(n AS DOUBLE) * CAST(sxx0 AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS sxx,
               CAST(n AS DOUBLE) * CAST(slx0 AS DOUBLE)
                 - CAST(sl AS DOUBLE) * CAST(sx AS DOUBLE) AS slx,
               CAST(n AS DOUBLE) * CAST(syl0 AS DOUBLE)
                 - CAST(sl AS DOUBLE) * CAST(sy AS DOUBLE) AS sly,
               CAST(n AS DOUBLE) * CAST(syx0 AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS sxy,
               CAST(n AS DOUBLE) * CAST(syy0 AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS syy
        FROM sums),
      sol AS (
        SELECT g, n, sll, sxx, slx, sly, sxy, syy,
               sly / sll AS br,
               sll * sxx - slx * slx AS det
        FROM fl),
      sol2 AS (
        SELECT g, n, sll, det, sly, sxy, syy,
               (syy - br * sly) / CAST(n AS DOUBLE) AS sser,
               (sly * sxx - sxy * slx) / det AS b1,
               (sxy * sll - sly * slx) / det AS b2
        FROM sol),
      sol3 AS (
        SELECT g, n, sll, det, b2,
               sser,
               (syy - b1 * sly - b2 * sxy) / CAST(n AS DOUBLE) AS sseu
        FROM sol2)
      SELECT g, n,
             CAST(CASE WHEN n >= 4 AND sll > 0.0 AND det > 0.0
                    AND sseu > 0.0
               THEN ROUND(b2, 6) END AS DOUBLE) AS beta_x,
             CAST(CASE WHEN n >= 4 AND sll > 0.0 AND det > 0.0
                    AND sseu > 0.0 THEN
               ROUND((sser - sseu) / (sseu / (CAST(n AS DOUBLE) - 3.0)), 6)
               END AS DOUBLE) AS f
      FROM sol3""",

    // Same 1e6 quantization, exact HUGEINT moments, and the identical
    // Wald / OLS / first-stage-F double trees.
    "q_iv_wald" -> """
      WITH pts AS (
        SELECT event_type AS g,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS y,
               CAST(ROUND(CAST(HOUR(ts) AS DOUBLE) * 1000000.0)
                 AS BIGINT) AS x,
               CAST(ROUND(CAST(DAY(ts) % 2 AS DOUBLE) * 1000000.0)
                 AS BIGINT) AS z
        FROM events WHERE value IS NOT NULL),
      sums AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(y::HUGEINT) AS sy, SUM(x::HUGEINT) AS sx,
               SUM(z::HUGEINT) AS sz,
               SUM(x::HUGEINT * x) AS sxx0, SUM(z::HUGEINT * z) AS szz0,
               SUM(z::HUGEINT * x) AS szx0, SUM(z::HUGEINT * y) AS szy0,
               SUM(x::HUGEINT * y) AS sxy0
        FROM pts GROUP BY g),
      fl AS (
        SELECT g, n,
               CAST(n AS DOUBLE) * CAST(sxx0 AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS mxx,
               CAST(n AS DOUBLE) * CAST(szz0 AS DOUBLE)
                 - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) AS mzz,
               CAST(n AS DOUBLE) * CAST(szx0 AS DOUBLE)
                 - CAST(sz AS DOUBLE) * CAST(sx AS DOUBLE) AS mzx,
               CAST(n AS DOUBLE) * CAST(szy0 AS DOUBLE)
                 - CAST(sz AS DOUBLE) * CAST(sy AS DOUBLE) AS mzy,
               CAST(n AS DOUBLE) * CAST(sxy0 AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS mxy
        FROM sums),
      r AS (SELECT g, n, mxx, mzz, mzx, mzy, mxy,
                   (mzx * mzx) / (mzz * mxx) AS r2 FROM fl)
      SELECT g, n,
             CAST(CASE WHEN n >= 3 AND mzz > 0.0 AND mxx > 0.0
                    AND mzx <> 0.0
               THEN ROUND(mzy / mzx, 6) END AS DOUBLE) AS beta_iv,
             CAST(CASE WHEN n >= 3 AND mzz > 0.0 AND mxx > 0.0
               THEN ROUND(mxy / mxx, 6) END AS DOUBLE) AS beta_ols,
             CAST(CASE WHEN n >= 3 AND mzz > 0.0 AND mxx > 0.0
                    AND r2 < 1.0
               THEN ROUND((CAST(n AS DOUBLE) - 2.0) * r2 / (1.0 - r2), 6)
               END AS DOUBLE) AS first_stage_f
      FROM r ORDER BY g""",

    // Same bandwidth filter, 1e6-quantized centered x, per-side
    // conditional HUGEINT sums, and the identical raw-moment OLS trees.
    "q_rdd" -> """
      WITH band AS (
        SELECT l_returnflag AS g,
               CAST(ROUND((l_quantity - 25.5) * 1000000.0) AS BIGINT) AS x,
               CAST(ROUND(l_extendedprice * 1000000.0) AS BIGINT) AS y
        FROM lineitem
        WHERE l_quantity >= 25.5 - 20.0 AND l_quantity <= 25.5 + 20.0),
      b2 AS (SELECT g, x, y,
                    CASE WHEN x >= 0 THEN 1 ELSE 0 END AS r FROM band),
      sums AS (
        SELECT g,
               SUM(CASE WHEN r = 0 THEN 1 ELSE 0 END)::BIGINT AS nl,
               SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END)::BIGINT AS nr,
               SUM(CASE WHEN r = 0 THEN x::HUGEINT ELSE 0 END) AS sxl,
               SUM(CASE WHEN r = 0 THEN y::HUGEINT ELSE 0 END) AS syl,
               SUM(CASE WHEN r = 0 THEN x::HUGEINT * x ELSE 0 END) AS sxxl,
               SUM(CASE WHEN r = 0 THEN x::HUGEINT * y ELSE 0 END) AS sxyl,
               SUM(CASE WHEN r = 1 THEN x::HUGEINT ELSE 0 END) AS sxr,
               SUM(CASE WHEN r = 1 THEN y::HUGEINT ELSE 0 END) AS syr,
               SUM(CASE WHEN r = 1 THEN x::HUGEINT * x ELSE 0 END) AS sxxr,
               SUM(CASE WHEN r = 1 THEN x::HUGEINT * y ELSE 0 END) AS sxyr
        FROM b2 GROUP BY g),
      fits AS (
        SELECT g, nl, nr,
               CAST(nl AS DOUBLE) * CAST(sxxl AS DOUBLE)
                 - CAST(sxl AS DOUBLE) * CAST(sxl AS DOUBLE) AS dl,
               (CAST(syl AS DOUBLE) * CAST(sxxl AS DOUBLE)
                 - CAST(sxl AS DOUBLE) * CAST(sxyl AS DOUBLE)) AS al0,
               (CAST(nl AS DOUBLE) * CAST(sxyl AS DOUBLE)
                 - CAST(sxl AS DOUBLE) * CAST(syl AS DOUBLE)) AS bl0,
               CAST(nr AS DOUBLE) * CAST(sxxr AS DOUBLE)
                 - CAST(sxr AS DOUBLE) * CAST(sxr AS DOUBLE) AS dr,
               (CAST(syr AS DOUBLE) * CAST(sxxr AS DOUBLE)
                 - CAST(sxr AS DOUBLE) * CAST(sxyr AS DOUBLE)) AS ar0,
               (CAST(nr AS DOUBLE) * CAST(sxyr AS DOUBLE)
                 - CAST(sxr AS DOUBLE) * CAST(syr AS DOUBLE)) AS br0
        FROM sums),
      vals AS (
        SELECT g, nl, nr, dl, dr,
               (al0 / dl) / 1000000.0 AS al, bl0 / dl AS bl,
               (ar0 / dr) / 1000000.0 AS ar, br0 / dr AS br
        FROM fits)
      SELECT g, nl AS n_left, nr AS n_right,
             CAST(CASE WHEN nl >= 2 AND dl > 0.0
               THEN ROUND(al, 6) END AS DOUBLE) AS left_at_cutoff,
             CAST(CASE WHEN nr >= 2 AND dr > 0.0
               THEN ROUND(ar, 6) END AS DOUBLE) AS right_at_cutoff,
             CAST(CASE WHEN nl >= 2 AND dl > 0.0 AND nr >= 2 AND dr > 0.0
               THEN ROUND(ar - al, 6) END AS DOUBLE) AS effect,
             CAST(CASE WHEN nl >= 2 AND dl > 0.0
               THEN ROUND(bl, 6) END AS DOUBLE) AS slope_left,
             CAST(CASE WHEN nr >= 2 AND dr > 0.0
               THEN ROUND(br, 6) END AS DOUBLE) AS slope_right
      FROM vals ORDER BY g""",

    // Same melt, per-arm conditional HUGEINT sums, sample variances,
    // and the identical scaled-mean / pooled-sd trees.
    "q_smd" -> """
      WITH base AS (
        SELECT (HOUR(ts) >= 12) AS t, value,
               CAST(DAY(ts) AS DOUBLE) AS dom,
               CAST(user_id % 97 AS DOUBLE) AS ucls
        FROM events),
      melted AS (
        SELECT t, 'value' AS c,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS v FROM base
        UNION ALL
        SELECT t, 'dom', CAST(ROUND(dom * 1000000.0) AS BIGINT) FROM base
        UNION ALL
        SELECT t, 'ucls', CAST(ROUND(ucls * 1000000.0) AS BIGINT) FROM base),
      sums AS (
        SELECT c,
               SUM(CASE WHEN t THEN 1 ELSE 0 END)::BIGINT AS nt,
               SUM(CASE WHEN NOT t THEN 1 ELSE 0 END)::BIGINT AS nc,
               SUM(CASE WHEN t THEN v::HUGEINT ELSE 0 END) AS st,
               SUM(CASE WHEN t THEN v::HUGEINT * v ELSE 0 END) AS qt,
               SUM(CASE WHEN NOT t THEN v::HUGEINT ELSE 0 END) AS sc,
               SUM(CASE WHEN NOT t THEN v::HUGEINT * v ELSE 0 END) AS qc
        FROM melted WHERE v IS NOT NULL GROUP BY c),
      d AS (
        SELECT c, nt, nc,
               CAST(st AS DOUBLE) / CAST(nt AS DOUBLE) AS mt,
               CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE) AS mc,
               (CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                  / CAST(nt AS DOUBLE)) / (CAST(nt AS DOUBLE) - 1.0) AS vt,
               (CAST(qc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
                  / CAST(nc AS DOUBLE)) / (CAST(nc AS DOUBLE) - 1.0) AS vc
        FROM sums),
      p AS (SELECT c, nt, nc, mt, mc, (vt + vc) / 2.0 AS pooled FROM d)
      SELECT c AS covariate, nt AS n_treat, nc AS n_control,
             CAST(CASE WHEN nt >= 1
               THEN ROUND(mt / 1000000.0, 6) END AS DOUBLE) AS mean_treat,
             CAST(CASE WHEN nc >= 1
               THEN ROUND(mc / 1000000.0, 6) END AS DOUBLE) AS mean_control,
             CAST(CASE WHEN nt >= 2 AND nc >= 2 AND pooled > 0.0
               THEN ROUND((mt - mc) / SQRT(pooled), 6)
               END AS DOUBLE) AS smd
      FROM p ORDER BY covariate""",

    // One lag window over the daily series, decimal moments, the same
    // left-assoc beta/t tree.
    "q_dickey_fuller" -> """
      WITH daily AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS d,
               SUM(CAST(ROUND(value * 100) AS BIGINT))::BIGINT AS y
        FROM events GROUP BY 1, 2),
      pts0 AS (
        SELECT g, d, CAST(ROUND(y * 1000000.0) AS BIGINT) AS yv
        FROM daily),
      pairs AS (
        SELECT g, x, yv - x AS yy FROM (
          SELECT g, yv, LAG(yv) OVER (PARTITION BY g ORDER BY d) AS x
          FROM pts0)
        WHERE x IS NOT NULL),
      sums AS (
        SELECT g, COUNT(*)::BIGINT AS n,
               SUM(x::HUGEINT) AS sx, SUM(yy::HUGEINT) AS sy,
               SUM(x::HUGEINT * x) AS sxx0, SUM(yy::HUGEINT * yy) AS syy0,
               SUM(x::HUGEINT * yy) AS sxy0
        FROM pairs GROUP BY g),
      fl AS (
        SELECT g, n,
               CAST(n AS DOUBLE) * CAST(sxx0 AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS sxx,
               CAST(n AS DOUBLE) * CAST(sxy0 AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS sxy,
               CAST(n AS DOUBLE) * CAST(syy0 AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS syy
        FROM sums),
      b AS (SELECT g, n, sxx, sxy, syy, sxy / sxx AS beta FROM fl),
      e AS (SELECT g, n, sxx, syy, sxy, beta,
                   (syy - beta * sxy) / CAST(n AS DOUBLE) AS sse
            FROM b)
      SELECT g AS event_type, n,
             CAST(CASE WHEN n >= 3 AND sxx > 0.0
               THEN ROUND(beta, 6) END AS DOUBLE) AS beta,
             CAST(CASE WHEN n >= 3 AND sxx > 0.0
                    AND syy - beta * sxy > 0.0 THEN
               ROUND(beta / SQRT((sse / (CAST(n AS DOUBLE) - 2.0))
                 / (sxx / CAST(n AS DOUBLE))), 6) END AS DOUBLE) AS t_df
      FROM e ORDER BY g""",

    // The q_kaplan_meier machinery on the ALL-CAUSE exits for S(s−)
    // (exclusive-prior ln fold, 12-dp frozen), then per-cause 12-dp
    // decimal increments cumulated over the (cause, duration) order.
    "q_cuminc" -> """
      WITH s AS (
        SELECT user_id,
               MIN(CAST(ts AS DATE)) AS first,
               MAX(CAST(ts AS DATE)) AS last,
               MIN(CASE WHEN event_type = 'purchase'
                     THEN CAST(ts AS DATE) END) AS fp,
               MIN(CASE WHEN event_type = 'error'
                     THEN CAST(ts AS DATE) END) AS fe
        FROM events GROUP BY user_id),
      subj AS (
        SELECT user_id,
               CASE WHEN fp IS NOT NULL AND (fe IS NULL OR fp <= fe)
                      THEN 'purchase'
                    WHEN fe IS NOT NULL THEN 'error' END AS cause,
               DATE_DIFF('day', first,
                 COALESCE(CASE WHEN fp IS NOT NULL
                                 AND (fe IS NULL OR fp <= fe) THEN fp
                               WHEN fe IS NOT NULL THEN fe END,
                          last)) AS duration
        FROM s),
      cells AS (
        SELECT duration, COUNT(*)::BIGINT AS exits,
               SUM(CASE WHEN cause IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                 AS dtot
        FROM subj GROUP BY duration),
      km AS (
        SELECT duration, dtot,
               ((SELECT SUM(exits) FROM cells)
                 - COALESCE(SUM(exits) OVER
                     (ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), 0))::BIGINT AS n_at_risk
        FROM cells),
      km2 AS (
        SELECT duration, n_at_risk,
               COALESCE(SUM(CASE WHEN dtot < n_at_risk
                    THEN LN(1.0 - dtot / CAST(n_at_risk AS DOUBLE))
                    ELSE 0.0 END) OVER
                 (ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), 0.0) AS lnprev,
               COALESCE(MAX(CASE WHEN dtot = n_at_risk THEN 1 ELSE 0 END)
                 OVER (ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS zeroprev
        FROM km),
      sm AS (
        SELECT duration, n_at_risk,
               CASE WHEN zeroprev = 1 THEN 0.0
                    ELSE ROUND(EXP(lnprev), 12) END AS sprev
        FROM km2),
      cc AS (SELECT cause, duration, COUNT(*)::BIGINT AS n_events
             FROM subj WHERE cause IS NOT NULL GROUP BY cause, duration),
      inc AS (
        SELECT cc.cause, cc.duration, sm.n_at_risk, cc.n_events,
               CAST(ROUND(sprev * n_events
                 / CAST(sm.n_at_risk AS DOUBLE), 12)
                 AS DECIMAL(38,12)) AS inc
        FROM cc JOIN sm ON sm.duration = cc.duration),
      cum AS (
        SELECT cause, duration, n_at_risk, n_events,
               SUM(inc) OVER (PARTITION BY cause ORDER BY duration) AS c
        FROM inc)
      SELECT cause, duration, n_at_risk, n_events,
             CAST(ROUND(CAST(c AS DOUBLE), 6) AS DOUBLE) AS cif
      FROM cum ORDER BY cause, duration""",

    "q_kaplan_meier" -> """
      WITH subj AS (
        SELECT user_id,
               DATE_DIFF('day', MIN(CAST(ts AS DATE)),
                 COALESCE(MIN(CASE WHEN event_type = 'purchase'
                                THEN CAST(ts AS DATE) END),
                          MAX(CAST(ts AS DATE)))) AS duration,
               MIN(CASE WHEN event_type = 'purchase'
                     THEN CAST(ts AS DATE) END) IS NOT NULL AS observed
        FROM events GROUP BY user_id),
      cells AS (
        SELECT duration,
               SUM(CASE WHEN observed THEN 1 ELSE 0 END)::BIGINT
                 AS n_events,
               SUM(CASE WHEN observed THEN 0 ELSE 1 END)::BIGINT
                 AS n_censored
        FROM subj GROUP BY duration),
      km AS (
        SELECT duration, n_events, n_censored,
               ((SELECT SUM(n_events + n_censored) FROM cells)
                 - COALESCE(SUM(n_events + n_censored) OVER
                     (ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), 0))::BIGINT AS n_at_risk
        FROM cells),
      km2 AS (
        SELECT duration, n_events, n_censored, n_at_risk,
               SUM(CASE WHEN n_events < n_at_risk
                    THEN LN(1.0 - n_events / CAST(n_at_risk AS DOUBLE))
                    ELSE 0.0 END) OVER (ORDER BY duration) AS lnsum,
               MAX(CASE WHEN n_events = n_at_risk THEN 1 ELSE 0 END)
                 OVER (ORDER BY duration) AS hitzero
        FROM km)
      SELECT duration, n_at_risk, n_events, n_censored,
             CAST(CASE WHEN hitzero = 1 THEN 0.0
                  ELSE ROUND(EXP(lnsum), 6) END AS DOUBLE) AS survival
      FROM km2
      WHERE n_events > 0
      ORDER BY duration""",

    // Same per-distinct-value weight cells, the same integer ceil
    // threshold (tw+1 − mod)/2, the same min-crossing pick.
    "q_weighted_median" -> """
      WITH cells AS (
        SELECT l_returnflag AS g, l_extendedprice AS v,
               SUM(CAST(l_quantity AS BIGINT))::BIGINT AS wv
        FROM lineitem GROUP BY 1, 2),
      c2 AS (
        SELECT g, v, wv,
               SUM(wv) OVER (PARTITION BY g ORDER BY v) AS cum,
               SUM(wv) OVER (PARTITION BY g) AS tw
        FROM cells)
      SELECT g AS l_returnflag, MAX(tw)::BIGINT AS total_weight,
             MIN(CASE WHEN cum >= ((tw + 1) - ((tw + 1) % 2)) // 2
                       AND tw > 0
                  THEN v END) AS wq
      FROM c2 GROUP BY g
      ORDER BY g""",

    // Same first-occurrence cumulative vocabulary, the same scaled-ln
    // boundary points, and the same exact-integer regression rationals
    // (HUGEINT here, decimal(38,0) on the Spark side) converted to
    // double once.
    "q_heaps" -> """
      WITH toks AS (
        SELECT source AS g, doc_id AS d,
               UNNEST(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                 t -> t <> '')) AS tok
        FROM documents),
      perdoc AS (
        SELECT g, d, COUNT(*)::BIGINT AS td FROM toks GROUP BY g, d),
      firstocc AS (
        SELECT g, tok, MIN(d) AS d FROM toks GROUP BY g, tok),
      newperdoc AS (
        SELECT g, d, COUNT(*)::BIGINT AS vd FROM firstocc GROUP BY g, d),
      pts AS (
        SELECT p.g,
               CAST(ROUND(LN(SUM(p.td) OVER w) * 1000000.0) AS BIGINT)
                 AS x,
               CAST(ROUND(LN(SUM(COALESCE(n.vd, 0)) OVER w)
                 * 1000000.0) AS BIGINT) AS y
        FROM perdoc p
        LEFT JOIN newperdoc n ON p.g = n.g AND p.d = n.d
        WINDOW w AS (PARTITION BY p.g ORDER BY p.d)),
      sums AS (
        SELECT g, COUNT(*)::HUGEINT AS n,
               SUM(x)::HUGEINT AS sx, SUM(y)::HUGEINT AS sy,
               SUM(x * y)::HUGEINT AS sxy, SUM(x * x)::HUGEINT AS sxx
        FROM pts GROUP BY g)
      SELECT g AS source, CAST(n AS BIGINT) AS n_docs,
             CAST(CASE WHEN n * sxx - sx * sx <> 0 THEN
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6)
             END AS DOUBLE) AS heaps_b,
             CAST(CASE WHEN n * sxx - sx * sx <> 0 THEN
               ROUND(CAST(sy * (n * sxx - sx * sx)
                     - (n * sxy - sx * sy) * sx AS DOUBLE)
                 / CAST(n * (n * sxx - sx * sx) AS DOUBLE)
                 / 1000000.0, 6)
             END AS DOUBLE) AS heaps_lnk
      FROM sums
      ORDER BY source""")
}
