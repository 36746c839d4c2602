package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-agreement metrics between two top-k lists per query key —
  * the evaluation layer for the similarity-search family: "how close
  * is the ANN/quantized/projected ranking to the exact one" as a
  * number per query, not an eyeball.
  *
  * Implemented metric: truncated rank-biased overlap (RBO, Webber et
  * al. 2010, ACM TOIS 29(4)) at depth k with persistence p — the
  * standard top-weighted list-agreement measure: agreement at depth d
  * contributes with weight p^(d-1), so swaps near rank 1 cost more
  * than swaps near rank k. This is the FIXED-DEPTH lower-bound form
  * (no extrapolation term): two identical k-lists score
  * Σ_{d=1..k} (1-p)p^(d-1) < 1, disjoint lists score 0.
  *
  * Scale shape: one equi-join of the two ranking tables on (query,
  * item) — both already top-k, so the join input is k rows per query
  * per side, NOT corpus-sized — then one query-keyed aggregation. The
  * per-depth weights fold into a k-sized literal lookup (an item
  * first co-present at depth m = max(rankA, rankB) contributes
  * Σ_{d=m..k} (1-p)p^(d-1)/d, precomputed once), so the join output
  * needs no per-depth fan-out.
  */
object RankEval {

  /** contribution(m) for a matched item whose later rank is m:
    * Σ_{d=m..k} (1-p)·p^(d-1)/d. Index 0 holds m=1.
    */
  def rboWeights(k: Int, p: Double): Seq[Double] = {
    require(k >= 1, s"rboWeights: k must be >= 1, got $k")
    require(p > 0.0 && p < 1.0, s"rboWeights: p must be in (0,1), got $p")
    (1 to k).map(m =>
      (m to k).map(d => (1 - p) * math.pow(p, d - 1) / d).sum)
  }

  /** Truncated RBO per query key between two rankings. Each input must
    * carry (qCol, idCol, rankCol) with ranks 1..k dense per query (the
    * caller's row_number over its own total order). Queries present in
    * either input emit a row; zero-overlap pairs score 0.0.
    */
  def rbo(a: DataFrame, b: DataFrame, qCol: String, idCol: String,
      rankCol: String, k: Int, p: Double): DataFrame = {
    val w = rboWeights(k, p)
    val contrib = element_at(typedLit(w),
      greatest(col("_ra"), col("_rb")).cast("int"))
    val aa = a.select(col(qCol).as("q"), col(idCol).as("item"),
      col(rankCol).cast("long").as("_ra")).filter(col("_ra") <= k)
    val bb = b.select(col(qCol).as("q"), col(idCol).as("item"),
      col(rankCol).cast("long").as("_rb")).filter(col("_rb") <= k)
    val qs = aa.select("q").unionByName(bb.select("q")).distinct()
    val matched = aa.join(bb, Seq("q", "item"))
      .groupBy("q")
      .agg(round(sum(contrib), 6).cast("double").as("rbo"),
        count(lit(1)).as("n_common"))
    qs.join(matched, Seq("q"), "left")
      .select(col("q").as(qCol),
        coalesce(col("rbo"), lit(0.0)).as("rbo"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
  }

  /** Per-group ROC AUC of a score against a binary label via the
    * rank-sum (Mann–Whitney U) identity:
    * AUC = (Σ avgrank⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻), where avgrank is the
    * tie-averaged ascending rank of the score within the group. Tie
    * averaging uses RANK + (ties−1)/2 — a dyadic half-integer, so the
    * whole computation is exact integer/dyadic arithmetic until the
    * single final division (rounded at 6 dp). Degenerate groups (no
    * positives or no negatives) report NULL auc, never a division
    * blow-up.
    *
    * Scale shape: one window over (group, score) for the rank, one
    * tie-count window on the same partitioning (no second exchange —
    * both windows hash-partition by the group key), one group-keyed
    * aggregation. No joins, no driver collect; the per-group sort is
    * the necessary cost of an exact AUC and parallelizes across
    * groups.
    */
  def aucRank(df: DataFrame, groupCol: String, scoreCol: String,
      labelCol: Column): DataFrame = {
    val byGroup = Window.partitionBy(col(groupCol))
    val rnk = rank().over(byGroup.orderBy(col(scoreCol)))
    val ties = count(lit(1)).over(
      Window.partitionBy(col(groupCol), col(scoreCol)))
    val ranked = df
      // unscored rows carry no rank information AND engines disagree
      // on where NULLs sort (Spark asc = NULLS FIRST, DuckDB = NULLS
      // LAST) — excluding them is both the standard AUC contract and
      // the only portable one
      .filter(col(scoreCol).isNotNull)
      .withColumn("_lbl", labelCol.cast("int"))
      // rows with an unknown label are excluded BEFORE ranking: the
      // evaluation set is (scored AND labeled) rows — leaving them in
      // would shift every real row's rank while contributing to
      // neither class
      .filter(col("_lbl").isNotNull)
      .withColumn("_avgrank",
        rnk.cast("double") + (ties.cast("double") - 1.0) / 2.0)
    ranked.groupBy(col(groupCol))
      .agg(
        sum(when(col("_lbl") === 1, col("_avgrank"))).as("_rsum"),
        sum(col("_lbl")).cast("long").as("n_pos"),
        sum(lit(1) - col("_lbl")).cast("long").as("n_neg"))
      .select(col(groupCol),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((col("_rsum") - col("n_pos") * (col("n_pos") + 1) / 2.0)
            / (col("n_pos") * col("n_neg")), 6))
          .cast("double").as("auc"),
        col("n_pos"), col("n_neg"))
  }

  /** Cohen's kappa between two categorical raters on the same rows:
    * κ = (p_o − p_e) / (1 − p_e) with p_o the observed agreement rate
    * and p_e = Σ_c rowmarg_c·colmarg_c / N² the chance agreement. All
    * counts are exact integers; the two probabilities and κ are formed
    * in one final double expression (rounded at 6 dp by the caller's
    * projection). Returns a single row (n, p_o, p_e, kappa); a
    * degenerate table where p_e = 1 (both raters constant and equal)
    * reports NULL kappa.
    *
    * Scale shape: one cell-count aggregation over (raterA, raterB) —
    * the contingency table, category²-sized — then marginals
    * re-aggregate the cell table; nothing after the first shuffle
    * touches corpus-sized data. Same pattern as Profiling.mutualInfo.
    */
  def cohensKappa(df: DataFrame, raterA: Column, raterB: Column)
      : DataFrame = {
    val cells = df.select(raterA.as("ca"), raterB.as("cb"))
      .groupBy("ca", "cb").agg(count(lit(1)).as("n"))
    val aMarg = cells.groupBy("ca").agg(sum("n").as("na"))
    val bMarg = cells.groupBy("cb").agg(sum("n").as("nb"))
    val agree = cells.agg(
      sum(when(col("ca") === col("cb"), col("n")).otherwise(lit(0L)))
        .as("n_agree"),
      sum(col("n")).as("n_total"))
    val chance = aMarg
      .join(bMarg, col("ca") === col("cb"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("chance_num"))
    agree.crossJoin(broadcast(chance))
      .select(
        col("n_total").cast("long").as("n"),
        round(col("n_agree") / col("n_total"), 6).cast("double").as("p_o"),
        round(col("chance_num") / (col("n_total") * col("n_total")), 6)
          .cast("double").as("p_e"),
        when(col("chance_num") < col("n_total") * col("n_total"),
          round((col("n_agree") * col("n_total") - col("chance_num"))
            / (col("n_total") * col("n_total") - col("chance_num")), 6))
          .cast("double").as("kappa"))
  }

  /** Recall@k of an approximate ranking against the exact one, per
    * query key: |approx-top-k ∩ exact-top-k| / k — THE acceptance
    * number for every ANN/quantized/projected search path (RBO above
    * grades rank ORDER; this grades set membership, which is what a
    * retrieval cache actually serves). Both inputs carry (qCol, idCol,
    * rankCol); rows ranked > k are ignored. Queries present in the
    * EXACT input emit a row (an approx-only query key is a bug the
    * join surfaces as recall 0).
    *
    * Scale shape: one equi-join of two k-row-per-query tables + one
    * query-keyed count — identical to [[rbo]], never corpus-sized.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame, qCol: String,
      idCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, s"recallAtK: k must be >= 1, got $k")
    val aa = approx.select(col(qCol).as("q"), col(idCol).as("item"),
      col(rankCol).cast("long").as("_ra")).filter(col("_ra") <= k)
    val ee = exact.select(col(qCol).as("q"), col(idCol).as("item"),
      col(rankCol).cast("long").as("_re")).filter(col("_re") <= k)
    val hits = aa.join(ee, Seq("q", "item"))
      .groupBy("q").agg(count(lit(1)).as("n_hit"))
    ee.select("q").distinct()
      .join(hits, Seq("q"), "left")
      .select(col("q").as(qCol),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)) / k.toDouble, 6)
          .cast("double").as("recall"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — THE standard
    * hybrid-retrieval combiner (lexical BM25 list + dense ANN list →
    * one ranking): score(item) = Σ_lists 1/(c + rank), missing-from-a-
    * list contributes nothing, then re-rank by (score DESC, item).
    * Every score is a sum of at most |lists| double divisions of
    * small integers — IEEE-identical cross-engine — and the output
    * rank is a total order.
    *
    * Each input carries (qCol, idCol, rankCol); rows ranked > depth
    * are ignored; `c` is the classic dampening constant (60). Returns
    * (qCol, item, rrf, rank) for the top `k` fused items per query.
    *
    * Scale shape: a union of k-row-per-query tables, one (query,
    * item) sum, one per-query top-k window — never corpus-sized.
    */
  def rrfFuse(lists: Seq[DataFrame], qCol: String, idCol: String,
      rankCol: String, depth: Int, k: Int, c: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: need at least one ranking")
    require(depth >= 1 && k >= 1 && c >= 0,
      s"rrfFuse: depth/k >= 1, c >= 0, got ($depth, $k, $c)")
    val normalized = lists.map(_.select(col(qCol).as("q"),
        col(idCol).as("item"), col(rankCol).cast("long").as("_r"))
      .filter(col("_r") <= depth))
    val scored = normalized.reduce(_ unionByName _)
      .groupBy("q", "item")
      .agg(sum(lit(1.0) / (lit(c) + col("_r"))).as("_score"),
        count(lit(1)).as("n_lists"))
    val w = Window.partitionBy("q")
      .orderBy(col("_score").desc, col("item").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q").as(qCol), col("item"),
        round(col("_score"), 6).cast("double").as("rrf"),
        col("rank"), col("n_lists"))
  }

  /** Ideal DCG at depth k under the [[ndcgAtK]] gain contract
    * (relevance k, k-1, …, 1 in ideal order): computed ONCE here and
    * shared verbatim with any oracle — the rboWeights pattern.
    */
  def idcgAtK(k: Int): Double = {
    require(k >= 1, s"idcgAtK: k must be >= 1, got $k")
    (1 to k).map(i =>
      (math.pow(2.0, k + 1 - i) - 1) / (math.log(i + 1) / math.log(2.0))).sum
  }

  /** nDCG@k of an approximate ranking against the exact one, with the
    * PINNED gain contract rel(item) = k+1−exactRank for items in the
    * exact top-k (0 otherwise): the graded companion of [[recallAtK]]
    * (set membership) and [[rbo]] (order agreement) — it rewards
    * putting the exact best items EARLY. Under this contract the
    * ideal ranking is the exact one, so IDCG is the [[idcgAtK]]
    * constant and nDCG = DCG/IDCG needs no per-query ideal sort.
    *
    * DCG terms (2^rel−1)/log2(pos+1) are double arithmetic on small
    * integers; the per-query sum is k terms — rounded at 6 dp.
    * Queries in the exact input always emit; an approx list that
    * misses every exact top-k item scores 0.
    *
    * Scale shape: one equi-join of two k-row-per-query tables + one
    * query-keyed sum ([[rbo]] shape).
    */
  def ndcgAtK(approx: DataFrame, exact: DataFrame, qCol: String,
      idCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, s"ndcgAtK: k must be >= 1, got $k")
    val idcg = idcgAtK(k)
    val aa = approx.select(col(qCol).as("q"), col(idCol).as("item"),
      col(rankCol).cast("long").as("_pos")).filter(col("_pos") <= k)
    val ee = exact.select(col(qCol).as("q"), col(idCol).as("item"),
      col(rankCol).cast("long").as("_er")).filter(col("_er") <= k)
    val dcg = aa.join(ee, Seq("q", "item"))
      .withColumn("_rel", lit(k + 1) - col("_er"))
      .groupBy("q")
      .agg(sum((pow(lit(2.0), col("_rel")) - 1.0)
        / log2(col("_pos") + 1)).as("_dcg"))
    ee.select("q").distinct()
      .join(dcg, Seq("q"), "left")
      .select(col("q").as(qCol),
        round(coalesce(col("_dcg"), lit(0.0)) / idcg, 6)
          .cast("double").as("ndcg"))
  }

  /** Expected calibration error over `bins` fixed-width confidence
    * bins: ECE = Σ_b (n_b/N)·|acc_b − conf̄_b|, plus the per-bin
    * reliability table (bin, n, accuracy, mean confidence). The
    * confidence must already be in [0,1] and 6-dp-quantized by the
    * caller — bin assignment floor(conf·bins) on a rounded quantum is
    * engine-portable (conf = 1.0 clamps into the last bin). Counts are
    * exact; accuracies and mean confidences are rationals of rounded
    * quanta.
    *
    * Scale shape: one bin-keyed aggregation (bins-sized output), the
    * scalar ECE folds the bin table — corpus-sized data is touched
    * exactly once.
    */
  def calibrationBins(df: DataFrame, confCol: Column, labelCol: Column,
      bins: Int): DataFrame = {
    require(bins >= 1, s"calibrationBins: bins must be >= 1, got $bins")
    // isNotNull guard: least() skips nulls, so a NULL confidence would
    // otherwise silently land in the top bin instead of staying NULL.
    val bin = when(confCol.isNotNull,
      least(floor(confCol * bins), lit((bins - 1).toLong))).cast("bigint")
    val perBin = df
      .select(bin.as("bin"), confCol.as("_conf"),
        labelCol.cast("int").as("_lbl"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum("_lbl").as("_npos"),
        sum("_conf").as("_csum"))
    perBin.select(
      col("bin"), col("n"),
      round(col("_npos") / col("n"), 6).cast("double").as("accuracy"),
      round(col("_csum") / col("n"), 6).cast("double").as("mean_conf"))
  }

  /** Scalar ECE from the `calibrationBins` reliability table: needs
    * the table's (n, accuracy, mean_conf) columns. One fold over the
    * bins-sized table.
    */
  def eceFromBins(binsDf: DataFrame): DataFrame =
    binsDf.agg(
      round(sum(col("n") * abs(col("accuracy") - col("mean_conf")))
        / sum(col("n")), 6).cast("double").as("ece"),
      sum(col("n")).cast("long").as("n"))

  /** Expected Reciprocal Rank (Chapelle et al., CIKM 2009) — the
    * cascade-model ranking metric next to nDCG (L115): the user scans
    * down the list and stops at position i with probability R_i =
    * (2^g − 1)/2^maxGrade; ERR = Σ_i (1/i)·R_i·Π_{j<i}(1−R_j). Unlike
    * nDCG it PENALIZES relevant results placed under other relevant
    * results — the "one good answer satisfies" regime of QA-style
    * retrieval.
    *
    * Exactness: ranks come from the (score DESC, tie ASC) total
    * order; R is exact in doubles (powers of two); the survival
    * product rides a ln-sum window with an explicit hit-grade-max
    * flag so a preceding R = 1 zeroes the tail EXACTLY (the
    * kaplanMeier pattern — no ln(0) reaches either engine); each
    * position's contribution is frozen at 12 dp into an order-free
    * decimal(38,12) sum, ERR rounds at 6. NULL grades are excluded;
    * grades clamp to [0, maxGrade].
    *
    * Scale shape: one group-keyed rank window cut to k (rows past k
    * never contribute), then windows over ≤ k rows per group.
    * Output: (group, n_ranked, err).
    */
  def expectedReciprocalRank(df: DataFrame, groupCol: String,
      scoreCol: String, tieCol: String, gradeCol: String,
      maxGrade: Int, k: Int): DataFrame = {
    require(maxGrade >= 1 && maxGrade <= 30,
      s"expectedReciprocalRank: maxGrade must be in [1, 30], got $maxGrade")
    require(k >= 1, "expectedReciprocalRank: k must be >= 1")
    val wRank = Window.partitionBy("_g")
      .orderBy(col("_s").desc, col("_t").asc)
    val denom = math.pow(2.0, maxGrade)
    val wOrd = Window.partitionBy("_g").orderBy("_rnk")
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    df.filter(col(gradeCol).isNotNull)
      .select(col(groupCol).as("_g"), col(scoreCol).as("_s"),
        col(tieCol).as("_t"),
        least(greatest(col(gradeCol).cast("long"), lit(0L)),
          lit(maxGrade.toLong)).as("_gr"))
      .withColumn("_rnk", row_number().over(wRank))
      .filter(col("_rnk") <= k)
      .withColumn("_rel", (pow(lit(2.0), col("_gr")) - 1.0) / lit(denom))
      .withColumn("_hitone",
        coalesce(max(when(col("_rel") === 1.0, 1).otherwise(0)).over(wPrev),
          lit(0)))
      .withColumn("_lnprev",
        coalesce(sum(when(col("_rel") < 1.0, log(lit(1.0) - col("_rel")))
          .otherwise(lit(0.0))).over(wPrev), lit(0.0)))
      .withColumn("_c",
        when(col("_hitone") === 1, lit(0.0))
          .otherwise(round(col("_rel") / col("_rnk") * exp(col("_lnprev")), 12)))
      .groupBy(col("_g").as(groupCol))
      .agg(count(lit(1)).cast("bigint").as("n_ranked"),
        round(sum(col("_c").cast("decimal(38,12)")).cast("double"), 6)
          .cast("double").as("err"))
  }

  /** Multi-class one-vs-rest classification report — per class c:
    * tp = |actual=c ∧ pred=c|, precision = tp/|pred=c|, recall =
    * tp/|actual=c|, F1 = 2PR/(P+R) — the per-class table behind
    * "macro-F1" that the binary [[confusionPanel]] can't produce, and
    * the standard acceptance gate for any multi-class router (e.g.
    * [[TextAnalysis.naiveBayesPredict]]'s output against its labels).
    * Classes present only in predictions (or only in labels) still get
    * a row — silently dropping them hides exactly the failure mode
    * (a class the model never predicts) the report exists to catch.
    *
    * Exactness: every count is an exact integer from ONE
    * (actual, pred) cell aggregation; P/R/F1 are one rounded division
    * each (zero denominators → NULL; F1 NULL when P+R = 0 or either
    * is NULL). NULL actual/pred rows are excluded (unlabeled).
    *
    * Scale shape: one (actual, pred) shuffle — cells are
    * classes²-bounded regardless of corpus size — then class-keyed
    * joins over class-sized tables. Output: (class, n_actual,
    * n_pred, tp, precision, recall, f1).
    */
  def classReport(df: DataFrame, actualCol: String, predCol: String)
      : DataFrame = {
    val cells = df
      .filter(col(actualCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(actualCol).as("_a"), col(predCol).as("_p"))
      .agg(count(lit(1)).as("_c"))
    val act = cells.groupBy(col("_a").as("_ca"))
      .agg(sum("_c").as("n_actual"))
    val prd = cells.groupBy(col("_p").as("_cp"))
      .agg(sum("_c").as("n_pred"))
    val tp = cells.filter(col("_a") <=> col("_p"))
      .select(col("_a").as("_ct"), col("_c").as("tp"))
    val classes = act.select(col("_ca").as("class"))
      .unionByName(prd.select(col("_cp").as("class"))).distinct()
    classes
      .join(act, col("class") <=> col("_ca"), "left").drop("_ca")
      .join(prd, col("class") <=> col("_cp"), "left").drop("_cp")
      .join(tp, col("class") <=> col("_ct"), "left").drop("_ct")
      .select(col("class"),
        coalesce(col("n_actual"), lit(0L)).cast("bigint").as("n_actual"),
        coalesce(col("n_pred"), lit(0L)).cast("bigint").as("n_pred"),
        coalesce(col("tp"), lit(0L)).cast("bigint").as("tp"))
      .withColumn("precision",
        when(col("n_pred") > 0, round(col("tp") / col("n_pred"), 6))
          .cast("double"))
      .withColumn("recall",
        when(col("n_actual") > 0, round(col("tp") / col("n_actual"), 6))
          .cast("double"))
      .withColumn("f1",
        when(col("precision").isNotNull && col("recall").isNotNull
            && col("precision") + col("recall") > 0,
          round(lit(2.0) * col("precision") * col("recall")
            / (col("precision") + col("recall")), 6)).cast("double"))
  }

  /** Murphy decomposition of the binned Brier score —
    * brier_binned = REL − RES + UNC over the [[calibrationBins]] grid:
    * reliability REL = Σ n_k(p̄_k − ō_k)²/N penalizes miscalibration
    * (ECE's squared sibling), resolution RES = Σ n_k(ō_k − ō)²/N
    * rewards bins that SEPARATE outcomes, uncertainty UNC = ō(1−ō) is
    * the data's irreducible floor. The decomposition answers what a
    * single Brier number (L156) can't: is the score bad because the
    * model is miscalibrated (fix with [[Stats.isotonicCalibration]])
    * or because it doesn't discriminate (no post-hoc fix exists).
    *
    * Exactness: confidences caller-quantized at 6 dp (the
    * calibrationBins contract) so bin conf sums are exact decimals of
    * 1e6-scaled longs; counts exact integers; p̄/ō per bin are
    * 12-dp-frozen doubles; each bin's REL/RES term freezes at 12 dp
    * into order-free decimal(38,12) sums; the three components round
    * at 6 dp. Unscored/unlabeled rows are excluded.
    *
    * Scale shape: one bin-keyed aggregation + a bins-sized fold —
    * corpus size never passes the first shuffle. Output: ONE row
    * (n, k_bins, reliability, resolution, uncertainty, brier_binned).
    */
  def brierDecomposition(df: DataFrame, confCol: Column, labelCol: Column,
      bins: Int): DataFrame = {
    require(bins >= 1, s"brierDecomposition: bins must be >= 1, got $bins")
    val dec12 = "decimal(38,12)"
    val bin = least(floor(confCol * bins), lit((bins - 1).toLong)).cast("bigint")
    val cells = df
      .filter(confCol.isNotNull && labelCol.isNotNull)
      .select(bin.as("_b"),
        round(confCol * 1e6).cast("long").as("_cq"),
        labelCol.cast("int").as("_y"))
      .groupBy("_b")
      .agg(count(lit(1)).as("_nk"),
        sum(col("_cq").cast("decimal(38,0)")).as("_cs"),
        sum("_y").as("_pk"))
    val tot = cells.agg(sum("_nk").as("_n"), sum("_pk").as("_p"))
    cells.crossJoin(broadcast(tot))
      .withColumn("_conf", round(col("_cs").cast("double") / 1e6 / col("_nk"), 12))
      .withColumn("_acc", round(col("_pk").cast("double") / col("_nk"), 12))
      .withColumn("_obar", round(col("_p").cast("double") / col("_n"), 12))
      .groupBy("_n", "_p", "_obar")
      .agg(count(lit(1)).as("_k"),
        sum(round(col("_nk") * (col("_conf") - col("_acc"))
          * (col("_conf") - col("_acc")), 12).cast(dec12)).as("_rel"),
        sum(round(col("_nk") * (col("_acc") - col("_obar"))
          * (col("_acc") - col("_obar")), 12).cast(dec12)).as("_res"))
      .withColumn("_reld", round(col("_rel").cast("double") / col("_n"), 6))
      .withColumn("_resd", round(col("_res").cast("double") / col("_n"), 6))
      .withColumn("_unc",
        round(col("_obar") * (lit(1.0) - col("_obar")), 6))
      .select(col("_n").cast("bigint").as("n"),
        col("_k").cast("bigint").as("k_bins"),
        col("_reld").cast("double").as("reliability"),
        col("_resd").cast("double").as("resolution"),
        col("_unc").cast("double").as("uncertainty"),
        round(col("_reld") - col("_resd") + col("_unc"), 6)
          .cast("double").as("brier_binned"))
  }

  /** Hosmer–Lemeshow goodness-of-fit over fixed-width confidence
    * bins: HL = Σ_g (O_g − E_g)²/(n_g·π̄_g·(1−π̄_g)) vs χ²(k−2) — the
    * TEST companion of [[calibrationBins]]/ECE (ECE sizes the
    * miscalibration; HL asks whether it's beyond chance). O = observed
    * positives, E = Σ conf, π̄ = E/n per bin.
    *
    * Exactness: confidences are caller-quantized at 6 dp (the
    * [[calibrationBins]] contract), so E is an exact decimal sum of
    * 1e6-scaled longs; O and n are exact integers; each bin's term is
    * ONE identically-spelled float tree frozen at 12 dp into an
    * order-free decimal(38,12) sum. Degenerate bins (π̄ = 0 or 1 —
    * zero variance, the classic HL exclusion) are dropped and k
    * reports the bins USED. Unscored/unlabeled rows are excluded.
    *
    * Scale shape: one bin-keyed aggregation + a bins-sized fold.
    * Output: ONE row (n, k_bins, dof, hl).
    */
  def hosmerLemeshow(df: DataFrame, confCol: Column, label: Column,
      bins: Int): DataFrame = {
    require(bins >= 3, s"hosmerLemeshow: bins must be >= 3, got $bins")
    val bin = when(confCol.isNotNull,
      least(floor(confCol * bins), lit((bins - 1).toLong))).cast("bigint")
    val cells = df.filter(confCol.isNotNull && label.isNotNull)
      .select(bin.as("_bin"),
        round(confCol * 1e6).cast("long").as("_c"),
        when(label, 1L).otherwise(0L).as("_y"))
      .groupBy("_bin")
      .agg(count(lit(1)).as("_n"), sum("_y").as("_o"),
        sum(col("_c").cast("decimal(38,0)")).as("_e"))
    val nd = col("_n").cast("double")
    val ed = col("_e").cast("double") / 1e6
    val pi = ed / nd
    val term = when(pi > 0.0 && pi < 1.0,
      round((col("_o").cast("double") - ed)
        * (col("_o").cast("double") - ed)
        / (nd * pi * (lit(1.0) - pi)), 12).cast("decimal(38,12)"))
    cells.select(col("_n"), term.as("_t"))
      .agg(sum("_n").as("n"), count(col("_t")).as("_k"),
        sum("_t").as("_hl"))
      .select(col("n").cast("bigint").as("n"),
        col("_k").cast("bigint").as("k_bins"),
        greatest(col("_k") - 2, lit(0L)).cast("bigint").as("dof"),
        when(col("_k") > 0, round(col("_hl").cast("double"), 6))
          .cast("double").as("hl"))
  }

  /** Exact Brier score of probabilistic predictions against boolean
    * outcomes: mean (conf − y)² — the proper-scoring sibling of
    * [[calibrationBins]]/ECE. Confidences quantize to 1e-6-scaled
    * longs, squared deviations accumulate in decimal(38,0) (exact,
    * shuffle-order-proof — a float sum of squares drifts with
    * partition order), ONE rounded division at the end. NULL
    * confidences are excluded (not scored as wrong).
    *
    * Output: one row (brier, n).
    */
  def brierScore(df: DataFrame, confCol: Column, label: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val d = (round(confCol * 1e6).cast("long")
      - when(label, 1000000L).otherwise(0L))
    df.filter(confCol.isNotNull)
      .select(((d * d).cast(dec)).as("_d2"))
      .agg(count(lit(1)).as("n"), sum("_d2").as("_s"))
      .select(
        round(col("_s").cast("double")
          / (col("n").cast("double") * 1e12), 6)
          .cast("double").as("brier"),
        col("n"))
  }

  /** Thresholded confusion panel per group: tp/fp/fn/tn plus
    * accuracy, precision, recall, F1, and Matthews correlation — the
    * one-table answer to "how does this score behave as a classifier
    * at THIS operating point", the fixed-threshold companion of
    * [[aucRank]] (which integrates over all thresholds) and
    * [[liftCurve]] (which sweeps rank tiles).
    *
    * Exactness: the four cells are exact integers (predicted =
    * score ≥ threshold, a literal); each rate is ONE rounded division
    * of those integers; MCC's numerator tp·tn − fp·fn is formed in
    * decimal(38,0) (each product overflows a long past ~3e9 rows) and
    * its denominator is the identically-spelled √ of four double
    * factors — any zero factor → NULL mcc (the undefined case), empty
    * rate denominators → NULL, never a division blow-up. Unscored or
    * unlabeled rows are excluded (the [[aucRank]] contract).
    *
    * Scale shape: one group-keyed aggregation over the scan — no
    * windows, no joins; output is groups-sized.
    */
  def confusionPanel(df: DataFrame, groupCol: String, scoreCol: String,
      label: Column, threshold: Double): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df
      .filter(col(scoreCol).isNotNull && label.isNotNull)
      .select(col(groupCol),
        when(label, 1L).otherwise(0L).as("_y"),
        when(col(scoreCol) >= threshold, 1L).otherwise(0L).as("_p"))
      .groupBy(col(groupCol))
      .agg(sum(col("_y") * col("_p")).as("tp"),
        sum((lit(1L) - col("_y")) * col("_p")).as("fp"),
        sum(col("_y") * (lit(1L) - col("_p"))).as("fn"),
        sum((lit(1L) - col("_y")) * (lit(1L) - col("_p"))).as("tn"))
    val n = (col("tp") + col("fp") + col("fn") + col("tn")).cast("double")
    def d(c: Column) = c.cast("double")
    cells.select(col(groupCol),
      col("tp").cast("long").as("tp"), col("fp").cast("long").as("fp"),
      col("fn").cast("long").as("fn"), col("tn").cast("long").as("tn"),
      round((d(col("tp")) + d(col("tn"))) / n, 6)
        .cast("double").as("accuracy"),
      when(col("tp") + col("fp") > 0,
        round(d(col("tp")) / (d(col("tp")) + d(col("fp"))), 6))
        .cast("double").as("precision"),
      when(col("tp") + col("fn") > 0,
        round(d(col("tp")) / (d(col("tp")) + d(col("fn"))), 6))
        .cast("double").as("recall"),
      when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
        round(lit(2.0) * d(col("tp"))
          / (lit(2.0) * d(col("tp")) + d(col("fp")) + d(col("fn"))), 6))
        .cast("double").as("f1"),
      when(col("tp") + col("fp") > 0 && col("tp") + col("fn") > 0
          && col("tn") + col("fp") > 0 && col("tn") + col("fn") > 0,
        round((col("tp").cast(dec) * col("tn")
            - col("fp").cast(dec) * col("fn")).cast("double")
          / sqrt(d(col("tp") + col("fp")) * d(col("tp") + col("fn"))
            * d(col("tn") + col("fp")) * d(col("tn") + col("fn"))), 6))
        .cast("double").as("mcc"))
  }

  /** Per-group log-loss (binary cross-entropy) of a probabilistic
    * confidence against a boolean outcome: −mean(y·ln p̂ + (1−y)·
    * ln(1−p̂)) with p̂ clamped to [eps, 1−eps] — the proper scoring
    * rule that punishes CONFIDENT wrong answers where [[brierScore]]
    * saturates (a wrong 0.999999 costs ~13.8 nats here, 1.0 there).
    *
    * Exactness: the caller supplies a 6-dp-quantized confidence (the
    * [[calibrationBins]] contract) so the clamped p̂ is the same
    * double on any engine; each row's −ln term is frozen at 12 dp
    * into an order-free decimal(38,12) sum (the ln-freeze discipline:
    * a 1-ulp libm difference dies at the 12th decimal, not in a
    * float accumulation), and the mean is ONE rounded division.
    * Unscored/unlabeled rows are excluded. Output: (group, n,
    * logloss).
    *
    * Scale shape: one group-keyed aggregation over the scan.
    */
  def logLoss(df: DataFrame, groupCol: String, confCol: Column,
      label: Column, eps: Double = 1e-6): DataFrame = {
    require(eps > 0.0 && eps < 0.5, s"logLoss: eps in (0, 0.5), got $eps")
    val p = least(greatest(confCol.cast("double"), lit(eps)),
      lit(1.0 - eps))
    val term = round(when(label, -log(p)).otherwise(-log(lit(1.0) - p)), 12)
      .cast("decimal(38,12)")
    df.filter(confCol.isNotNull && label.isNotNull)
      .select(col(groupCol), term.as("_t"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum("_t").as("_s"))
      .select(col(groupCol), col("n").cast("long").as("n"),
        round(col("_s").cast("double") / col("n").cast("double"), 6)
          .cast("double").as("logloss"))
  }

  /** Per-group average precision (the area under the precision–recall
    * curve in its standard discrete form): rank rows by (score DESC,
    * id ASC — a pinned total order), then AP = (1/n_pos)·Σ_{k : y_k=1}
    * cumPos(k)/k. The class-imbalance-honest companion of [[aucRank]]
    * — ROC AUC stays rosy when negatives dominate; AP collapses
    * toward the positive prevalence.
    *
    * Exactness: ranks and cumulative-positive counts are exact
    * integers off ONE window (the rank and running-sum windows share
    * (group, score DESC, id) partitioning+ordering — one exchange,
    * one sort); each positive row's precision cumPos/k is frozen at
    * 12 dp into an order-free decimal(38,12) sum; AP is ONE rounded
    * division by n_pos. No positives → NULL ap. Ties broken by id —
    * the pinned-tiebreak contract, documented rather than
    * tie-averaged (same rule as every other ranked operator here).
    *
    * Scale shape: one window + one group-keyed aggregation; the
    * per-group sort is the necessary cost of an exact AP and
    * parallelizes across groups ([[aucRank]]'s cost class).
    */
  def averagePrecision(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, label: Column): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val base = df
      .filter(col(scoreCol).isNotNull && label.isNotNull)
      .select(col(groupCol), col(scoreCol), col(idCol),
        when(label, 1L).otherwise(0L).as("_y"))
    base
      .withColumn("_k", row_number().over(w).cast("long"))
      .withColumn("_cp",
        sum("_y").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col(groupCol), col("_y"),
        when(col("_y") === 1L,
          round(col("_cp").cast("double") / col("_k").cast("double"), 12)
            .cast("decimal(38,12)")).as("_prec"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum("_y").as("n_pos"),
        sum("_prec").as("_s"))
      .select(col(groupCol), col("n").cast("long").as("n"),
        col("n_pos").cast("long").as("n_pos"),
        when(col("n_pos") > 0,
          round(col("_s").cast("double") / col("n_pos").cast("double"), 6))
          .cast("double").as("ap"))
  }

  /** Reciprocal rank of the FIRST relevant item per query: the
    * navigational-retrieval number ("how far down is the first right
    * answer") that [[recallAtK]] (set membership) and [[ndcgAtK]]
    * (graded order) both blur. `ranked` carries (qCol, idCol,
    * rankCol) with ranks from the caller's total order; `relevant`
    * carries the (qCol, idCol) relevance set. Queries in the RELEVANT
    * input always emit (no relevant item inside `depth` → first_rank
    * NULL, rr 0.0 — the standard truncated-MRR convention); rr is one
    * rounded division of exact integers, so a downstream MRR is an
    * order-free mean of 6-dp quanta.
    *
    * Scale shape: one equi-join of a depth-bounded ranking against
    * the relevance set + one query-keyed min — the [[rbo]] cost
    * class, never corpus-sized.
    */
  def reciprocalRank(ranked: DataFrame, relevant: DataFrame,
      qCol: String, idCol: String, rankCol: String, depth: Int)
      : DataFrame = {
    require(depth >= 1, s"reciprocalRank: depth must be >= 1, got $depth")
    val rr = ranked
      .select(col(qCol).as("q"), col(idCol).as("item"),
        col(rankCol).cast("long").as("_r"))
      .filter(col("_r") <= depth)
      .join(relevant.select(col(qCol).as("q"), col(idCol).as("item"))
        .distinct(), Seq("q", "item"))
      .groupBy("q").agg(min("_r").as("first_rank"))
    relevant.select(col(qCol).as("q")).distinct()
      .join(rr, Seq("q"), "left")
      .select(col("q").as(qCol), col("first_rank"),
        coalesce(round(lit(1.0) / col("first_rank"), 6), lit(0.0))
          .cast("double").as("rr"))
  }

  /** ROC curve table over a fixed threshold grid: for each of the
    * B−1 interior edges of the score's frozen [min, max] bin grid,
    * the full confusion row (score ≥ threshold predicts positive —
    * the [[confusionPanel]] contract) plus TPR/FPR/precision — the
    * PLOTTABLE curve behind [[aucRank]]'s one number, and the
    * operating-point menu a threshold picker actually reads.
    *
    * Exactness: bin cells (one (bin, label) aggregate) and their
    * cumulative counts are exact integers; thresholds are lo +
    * q·(hi−lo)/B on identical doubles; each rate is ONE rounded
    * division. Unscored/unlabeled rows are excluded. Degenerate rate
    * denominators → NULL, never a blow-up.
    *
    * Scale shape: one scan → bins-bounded cells → bins-bounded
    * windows; B−1 output rows. (An EXACT every-distinct-score curve
    * is a per-row window sort — use [[aucRank]] for the exact scalar
    * and this grid for the plot.)
    */
  def rocCurve(df: DataFrame, scoreCol: String, label: Column,
      bins: Int): DataFrame = {
    require(bins >= 2, s"rocCurve: bins must be >= 2, got $bins")
    val v = col(scoreCol)
    val edges = df.filter(v.isNotNull)
      .agg(min(v).cast("double").as("_lo"), max(v).cast("double").as("_hi"))
    val cells = df.filter(v.isNotNull && label.isNotNull)
      .crossJoin(broadcast(edges))
      .select(
        when(col("_hi") === col("_lo"), lit(0))
          .otherwise(least(greatest(
            floor((v.cast("double") - col("_lo")) * bins
              / (col("_hi") - col("_lo"))).cast("int"),
            lit(0)), lit(bins - 1))).as("_bin"),
        when(label, 1L).otherwise(0L).as("_y"))
      .groupBy("_bin")
      .agg(count(lit(1)).as("_n"), sum("_y").as("_p"))
    val wOrd = Window.orderBy("_bin") // bins-bounded
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy()
    // split after bin q: bins <= q predict NEGATIVE (below threshold)
    val cum = cells
      .withColumn("_nl", sum("_n").over(wOrd))
      .withColumn("_pl", sum("_p").over(wOrd))
      .withColumn("_nt", sum("_n").over(wAll))
      .withColumn("_pt", sum("_p").over(wAll))
      .filter(col("_bin") < bins - 1)
    val tp = col("_pt") - col("_pl")
    val fp = (col("_nt") - col("_nl")) - tp
    val fn = col("_pl")
    val tn = col("_nl") - col("_pl")
    def rate(num: Column, den: Column) =
      when(den > 0, round(num.cast("double") / den.cast("double"), 6))
        .cast("double")
    cum
      .crossJoin(broadcast(edges))
      .select(
        (col("_bin") + 1).cast("bigint").as("edge"),
        round(col("_lo") + (col("_bin") + 1).cast("double")
          * (col("_hi") - col("_lo")) / bins, 6)
          .cast("double").as("threshold"),
        tp.cast("bigint").as("tp"), fp.cast("bigint").as("fp"),
        fn.cast("bigint").as("fn"), tn.cast("bigint").as("tn"),
        rate(tp, tp + fn).as("tpr"),
        rate(fp, fp + tn).as("fpr"),
        rate(tp, tp + fp).as("precision"))
  }

  /** Lift / gains curve: rank the population by score DESC (id
    * tiebreak — a total order), cut into `buckets` closed-form rank
    * tiles, and report each bucket's response rate plus the
    * cumulative capture and lift of targeting the top buckets — the
    * standard "how much better than random is mailing the top decile"
    * model-evaluation table.
    *
    * Exactness: bucket/cumulative counts are pure integers; lift =
    * (cum_pos·N) / (cum_n·P) with the integer cross-products
    * accumulated in decimal(38,0) (N·cum_pos overflows a long at
    * corpus scale) and ONE rounded division; rate and capture are one
    * rounded division each; an all-negative population reports NULL
    * capture/lift. Ranks come from [[Indexing.denseIds]] — never a
    * single-partition window over the data.
    *
    * Output: (bucket, n, n_pos, rate, cum_capture, lift).
    */
  /** Qini / uplift curve — the treatment-effect analogue of
    * [[liftCurve]]: rank EVERYONE by the uplift model's score, cut
    * into rank tiles, and per cumulative depth report
    * qini(k) = conv_T(k) − conv_C(k)·(n_T(k)/n_C(k)) — incremental
    * conversions attributable to treating the top-k, the curve whose
    * area is THE uplift-model acceptance number (a model that only
    * finds sure-things hugs zero; random targeting is the straight
    * line to qini(N)).
    *
    * Exactness: tile and cumulative counts are pure integers (ranks
    * from [[Indexing.denseIds]], never a single-partition window);
    * the qini correction's integer cross-products accumulate in
    * decimal(38,0) before ONE rounded division; per-tile uplift is
    * two rounded rates. Rows missing score/treatment/label are
    * excluded; tiles with an empty control (or treated) arm report
    * NULL uplift, and qini is NULL until the cumulative control arm
    * is nonempty.
    *
    * Output: (bucket, n_treated, n_control, conv_treated,
    * conv_control, uplift, qini).
    */
  def qiniCurve(df: DataFrame, idCol: String, scoreCol: String,
      treated: Column, label: Column, buckets: Int): DataFrame = {
    require(buckets >= 2, s"qiniCurve: buckets must be >= 2, got $buckets")
    val dec = "decimal(38,0)"
    val base = df.filter(col(scoreCol).isNotNull
        && treated.isNotNull && label.isNotNull)
      .select(col(idCol).as("_id"), (-col(scoreCol)).as("_negs"),
        when(treated, 1L).otherwise(0L).as("_t"),
        when(treated && label, 1L).otherwise(0L).as("_yt"),
        when(!treated && label, 1L).otherwise(0L).as("_yc"))
      .localCheckpoint() // rank pass + the count aggregate re-read it
    val nn = base.agg(count(lit(1)).as("_n"))
    val perBucket = Indexing.denseIds(base, Seq("_negs", "_id"), "_rk")
      .crossJoin(broadcast(nn))
      .withColumn("bucket",
        (floor((col("_rk") - 1) * buckets / col("_n")) + 1).cast("bigint"))
      .groupBy("bucket")
      .agg(sum("_t").as("n_treated"),
        sum(lit(1L) - col("_t")).as("n_control"),
        sum("_yt").as("conv_treated"), sum("_yc").as("conv_control"))
    val wc = Window.orderBy("bucket") // buckets-sized frame
      .rowsBetween(Window.unboundedPreceding, 0)
    perBucket
      .withColumn("_cnt", sum("n_treated").over(wc))
      .withColumn("_cnc", sum("n_control").over(wc))
      .withColumn("_cyt", sum("conv_treated").over(wc))
      .withColumn("_cyc", sum("conv_control").over(wc))
      .select(col("bucket"),
        col("n_treated").cast("bigint").as("n_treated"),
        col("n_control").cast("bigint").as("n_control"),
        col("conv_treated").cast("bigint").as("conv_treated"),
        col("conv_control").cast("bigint").as("conv_control"),
        when(col("n_treated") > 0 && col("n_control") > 0,
          round(col("conv_treated") / col("n_treated").cast("double")
            - col("conv_control") / col("n_control").cast("double"), 6))
          .cast("double").as("uplift"),
        when(col("_cnc") > 0,
          round(col("_cyt").cast("double")
            - (col("_cyc").cast(dec) * col("_cnt")).cast("double")
              / col("_cnc").cast("double"), 6))
          .cast("double").as("qini"))
  }

  def liftCurve(df: DataFrame, idCol: String, scoreCol: String,
      label: Column, buckets: Int): DataFrame = {
    require(buckets >= 2, s"liftCurve: buckets must be >= 2, got $buckets")
    val dec = "decimal(38,0)"
    val base = df.filter(col(scoreCol).isNotNull)
      .select(col(idCol).as("_id"), (-col(scoreCol)).as("_negs"),
        when(label, 1L).otherwise(0L).as("_y"))
      .localCheckpoint() // rank pass + the N/P aggregate re-read it
    val nn = base.agg(count(lit(1)).as("_n"), sum("_y").as("_p"))
    val perBucket = Indexing.denseIds(base, Seq("_negs", "_id"), "_rk")
      .crossJoin(broadcast(nn))
      .withColumn("bucket",
        (floor((col("_rk") - 1) * buckets / col("_n")) + 1).cast("bigint"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("_y").as("n_pos"),
        max("_n").as("_n"), max("_p").as("_p"))
    val wc = Window.orderBy("bucket") // buckets-sized frame
      .rowsBetween(Window.unboundedPreceding, 0)
    perBucket
      .withColumn("_cn", sum("n").over(wc))
      .withColumn("_cp", sum("n_pos").over(wc))
      .select(col("bucket"), col("n"), col("n_pos"),
        round(col("n_pos") / col("n").cast("double"), 6)
          .cast("double").as("rate"),
        when(col("_p") > 0,
          round(col("_cp") / col("_p").cast("double"), 6))
          .cast("double").as("cum_capture"),
        when(col("_p") > 0,
          round((col("_cp").cast(dec) * col("_n")).cast("double")
            / (col("_cn").cast(dec) * col("_p")).cast("double"), 6))
          .cast("double").as("lift"))
  }

  /** Bradley–Terry strength scores from pairwise game outcomes — the
    * pairwise-preference ranker behind every "which model/doc/variant
    * wins head-to-head" leaderboard (LLM eval's chatbot-arena
    * scoring, A/B/n taste tests, sports tables): P(i beats j) =
    * w_i/(w_i + w_j), fit by FIXED iterations of Hunter's MM update
    * w_i ← W_i / Σ_j n_ij/(w_i + w_j) (W_i = i's total wins, n_ij =
    * games between i and j), sup-normalized each pass so the scale
    * gauge is pinned (BT is identified only up to a constant factor).
    *
    * Determinism (the fixed-iteration house contract): per pass each
    * pair term freezes at 12 dp into an order-free decimal sum; the
    * raw update is one division; the max-normalized score re-freezes
    * at 12 dp; final report at 6 dp. A zero-win item's score is
    * exactly 0 (W_i = 0), an undefeated item stays finite (the MM
    * denominator never vanishes while it has games). Draws carry no
    * information under BT — feed decided games only.
    *
    * Scale shape: games aggregate once to (i, j, n, wins) pair stats
    * — everything iterative joins THAT, never the raw games; per pass
    * one broadcast of the item-sized state into the pair table + one
    * item-keyed decimal sum + a scalar max. The state must be
    * broadcastable: item count is guarded at `maxItems` (pair stats
    * stay distributed — items are the small side by construction of
    * any leaderboard).
    *
    * Output: (item, n_games, n_wins, score), score ∈ [0, 1],
    * 1 = strongest.
    */
  def bradleyTerry(games: DataFrame, winnerCol: String, loserCol: String,
      iters: Int = 2, maxItems: Int = 100000): DataFrame = {
    require(iters >= 1 && iters <= 8,
      s"bradleyTerry: iters must be in [1, 8], got $iters")
    val g = games
      .filter(col(winnerCol).isNotNull && col(loserCol).isNotNull)
      .select(col(winnerCol).cast("string").as("_w"),
        col(loserCol).cast("string").as("_l"))
      .filter(col("_w") =!= col("_l"))
    // directed pair stats: (i, j, n games, wins of i over j)
    val stats = g.select(col("_w").as("i"), col("_l").as("j"),
        lit(1L).as("_win"))
      .unionByName(g.select(col("_l").as("i"), col("_w").as("j"),
        lit(0L).as("_win")))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"), sum("_win").as("_wi"))
      .localCheckpoint() // re-read every iteration
    // each game lands once in orientation (i, opponent), so per-i sums
    // need no dedup factor
    val totals = stats.groupBy("i")
      .agg(sum("n").cast("bigint").as("n_games"),
        sum("_wi").cast("bigint").as("n_wins"))
    val items = stats.select(col("i")).distinct()
      .limit(maxItems + 1).localCheckpoint()
    require(items.count() <= maxItems,
      s"bradleyTerry: > $maxItems items — the per-pass state broadcast " +
        "needs a bounded leaderboard; bucket items first or raise " +
        "maxItems knowingly")
    var scores = items.withColumn("_s", lit(1.0))
    for (_ <- 1 to iters) {
      val si = scores.select(col("i"), col("_s").as("_si"))
      val sj = scores.select(col("i").as("_j"), col("_s").as("_sj"))
      val denom = stats
        .join(broadcast(si), Seq("i"))
        .join(broadcast(sj), col("j") === col("_j")).drop("_j")
        // floor the pair denominator: both sup-normalized scores can
        // round to exactly 0.0 at 12 dp under extreme score spread,
        // and n/0 = Infinity would NULL out under the decimal cast and
        // silently drop the term from the MM sum — the floor keeps the
        // term finite (and huge, as MM intends for a near-zero pair)
        .withColumn("_t",
          round(col("n").cast("double")
            / greatest(col("_si") + col("_sj"), lit(1e-12)), 12))
        .groupBy("i")
        .agg(sum(col("_t").cast("decimal(38,12)")).as("_d"),
          sum("_wi").as("_W"))
      val raw = denom.select(col("i"),
        when(col("_d").cast("double") > 0.0,
          col("_W").cast("double") / col("_d").cast("double"))
          .otherwise(lit(0.0)).as("_r"))
      val mx = raw.agg(max("_r").as("_mx"))
      scores = raw.crossJoin(broadcast(mx))
        .select(col("i"),
          when(col("_mx") > 0.0, round(col("_r") / col("_mx"), 12))
            .otherwise(lit(0.0)).as("_s"))
        .localCheckpoint()
    }
    totals.join(scores, Seq("i"))
      .select(col("i").as("item"), col("n_games"), col("n_wins"),
        round(col("_s"), 6).cast("double").as("score"))
  }
  /** Quadratic-WEIGHTED Cohen's kappa for ORDINAL raters — partial
    * credit by squared distance, the agreement standard for graded
    * labels (quality tiers, severity scores) where plain
    * [[cohensKappa]] treats off-by-one like opposite-ends:
    * κ_w = 1 − Σ(i−j)²·o_ij / Σ(i−j)²·e_ij with e from the marginal
    * product; the usual (k−1)² weight normalization cancels in the
    * ratio, so EVERYTHING is exact integer arithmetic — numerator
    * from the confusion cells, denominator from the marginals grid
    * (category-vocabulary-sized cross join), one rounded division:
    * κ_w = 1 − n·Σ(i−j)²o / Σ(i−j)²·na_i·nb_j. Perfect chance
    * disagreement 0 → NULL. Output: (n, kappa_w).
    */
  def weightedKappa(df: DataFrame, raterA: Column, raterB: Column)
      : DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df.select(raterA.cast("long").as("ca"),
        raterB.cast("long").as("cb"))
      .filter(col("ca").isNotNull && col("cb").isNotNull)
      .groupBy("ca", "cb").agg(count(lit(1)).as("n"))
      .localCheckpoint() // marginals + numerator both read it
    val num = cells.agg(
      sum(((col("ca") - col("cb")) * (col("ca") - col("cb"))
        * col("n")).cast(dec)).as("_num"),
      sum(col("n").cast(dec)).as("_n"))
    val aMarg = cells.groupBy("ca").agg(sum("n").as("na"))
    val bMarg = cells.groupBy("cb").agg(sum("n").as("nb"))
    val den = aMarg.crossJoin(bMarg)
      .agg(sum(((col("ca") - col("cb")) * (col("ca") - col("cb")))
        .cast(dec) * col("na") * col("nb")).as("_den"))
    num.crossJoin(broadcast(den))
      .select(col("_n").cast("bigint").as("n"),
        when(col("_den").cast("double") > 0.0,
          round(lit(1.0) - col("_n").cast("double")
            * col("_num").cast("double") / col("_den").cast("double"),
            6))
          .cast("double").as("kappa_w"))
  }
  /** Kolmogorov–Smirnov MODEL statistic — the credit-scoring
    * separation standard on [[rocCurve]]'s threshold sweep: KS =
    * max_t |TPR(t) − FPR(t)|, with the threshold where the gap peaks
    * (ties to the lowest edge). A binned-threshold KS, like the curve
    * it reads — exact cells, 6-dp-frozen rates, a bins-bounded argmax
    * window. Output: one row — (ks, at_edge, at_threshold).
    */
  def ksStatistic(df: DataFrame, scoreCol: String, label: Column,
      bins: Int): DataFrame = {
    val roc = rocCurve(df, scoreCol, label, bins)
    roc
      .withColumn("_d", round(abs(col("tpr") - col("fpr")), 6))
      .withColumn("_rn", row_number().over(
        Window.orderBy(col("_d").desc, col("edge").asc)))
      .filter(col("_rn") === 1)
      .select(col("_d").cast("double").as("ks"),
        col("edge").as("at_edge"),
        col("threshold").as("at_threshold"))
  }
}
