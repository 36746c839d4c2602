package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column profiling (the ANALYZE-style data-quality report): per-column
  * row count, null count, distinct count, min and max — for any subset
  * of columns, in ONE aggregation pass over the table.
  *
  * Scale design: everything is a partial-aggregatable expression, so
  * the scan streams once and the shuffle carries one partial row per
  * task. Distinct counts default to HyperLogLog
  * (`approx_count_distinct`, mergeable sketch, bounded memory) — the
  * only honest default at 100 TB; `exactDistinct = true` swaps in
  * exact COUNT(DISTINCT), which Spark plans via Expand (input rows x
  * profiled columns before the shuffle) — bounded scopes only, and
  * what the judged query uses so the oracle can restate it.
  *
  * Output is tall — one row per profiled column — because profile
  * consumers join/filter on the column name; min/max are cast to
  * string AFTER aggregating on the native type (a lexicographic
  * min over stringified ints would be wrong).
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    require(cols.distinct == cols,
      s"profile: duplicate columns in ${cols.mkString(",")}")
    def distinctAgg(c: String): Column =
      if (exactDistinct) countDistinct(col(c)) else approx_count_distinct(col(c))
    val structs = cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("col_name"),
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("n_null"),
        distinctAgg(c).cast("bigint").as("n_distinct"),
        min(col(c)).cast("string").as("min_val"),
        max(col(c)).cast("string").as("max_val")).as(s"_p$i")
    }
    df.agg(structs.head, structs.tail: _*)
      .select(explode(array(cols.indices.map(i => col(s"_p$i")): _*)).as("p"))
      .select("p.*")
  }

  /** Key-skew diagnostic — the "should I salt this join?" report:
    * distribution of rows per key for a prospective join/group key.
    * One shuffle (the per-key count) followed by a one-row aggregate;
    * the output is constant-sized at any SF, so this is the probe you
    * run BEFORE committing a 100 TB shuffle, not after it dies.
    *
    * `top_share` = largest key's fraction of all rows: ~1/n_keys means
    * uniform; approaching 1.0 means one hot key will pin a single
    * reducer and the join wants `Salting.saltedJoin` or AQE skew
    * handling. `avg_rows` spots the complementary pathology (billions
    * of near-empty groups).
    */
  def keySkew(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keySkew: no key columns given")
    val Seq(kc) = Cols.fresh("skew", 1, df) // never collides with a key col
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as(kc))
      .agg(
        sum(kc).cast("bigint").as("n_rows"),
        count(lit(1)).cast("bigint").as("n_keys"),
        max(kc).cast("bigint").as("max_rows"),
        (sum(kc) * lit(1.0) / count(lit(1))).as("avg_rows"),
        (max(kc) * lit(1.0) / sum(kc)).as("top_share"))
  }

  /** Declarative data-quality gate (the Deequ/Great-Expectations
    * shape): each rule is a boolean Column; the report counts the rows
    * violating each — NULL predicate results count as violations (a
    * rule that cannot evaluate has not passed).
    *
    * Scale design: ALL rules evaluate in ONE aggregation pass — one
    * scan, one one-row partial-aggregatable agg, however many rules —
    * then a rule-count-sized unpivot of that single row. Constant
    * output at any SF; nothing wide ever shuffles.
    */
  def checkConstraints(df: DataFrame,
      rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "checkConstraints: no rules given")
    require(rules.map(_._1).distinct.size == rules.size,
      "checkConstraints: rule names must be unique")
    val aggs = count(lit(1)).cast("bigint").as("_n") +: rules.map {
      case (name, pred) =>
        sum(when(pred, 0L).otherwise(1L)).cast("bigint").as(s"_v_$name")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map { case (name, _) =>
      struct(lit(name).as("rule"), col("_n").as("n_rows"),
        col(s"_v_$name").as("n_violations"),
        (col(s"_v_$name") === 0L).as("pass"))
    }
    row.select(explode(array(stacked: _*)).as("r")).select("r.*")
  }

  /** Equi-depth histogram: `nBuckets` buckets holding ~equal row
    * counts, bucket edges at the value quantiles — the histogram that
    * stays informative under skew (equi-width puts 99% of a heavy-tail
    * in bucket 0). Cut points come from ONE one-row percentile
    * aggregate attached as an in-plan broadcast (no driver collect,
    * the winsorize shape); bucket assignment is a map-side fold over
    * the cuts; the final count is a bucket-count-sized hash agg.
    *
    * `exact = true` (judged regime) computes cuts via
    * [[Percentiles.exactValues]] — bounded-memory exact percentiles
    * (approx-bracket + exact-refine, bit-identical to the `percentile`
    * aggregate, spec-pinned), NOT the value-buffering aggregate; it is
    * eager (two cut-finding jobs at construction, the IvfIndex.train
    * precedent — Bench times them inside the query). Default is
    * in-plan `approx_percentile` (Greenwald-Khanna, lazy). Ties at a
    * cut land in the lower bucket; buckets are exactly equal-depth
    * only when values are untied.
    */
  def equiDepthHistogram(df: DataFrame, valueCol: String, nBuckets: Int,
      exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(nBuckets >= 2, "equiDepthHistogram: need at least 2 buckets")
    val v = col(valueCol).cast("double")
    val ps = (1 until nBuckets).map(_.toDouble / nBuckets)
    // collision-free internal cuts column (an input `_cuts` column
    // would silently shadow a hard-coded name)
    val Seq(cutsCol) = Cols.fresh("cuts", 1, df)
    val withCuts =
      if (exact) {
        val cutVals = Percentiles.exactValues(df, v, ps, accuracy)
        df.filter(v.isNotNull)
          .withColumn(cutsCol, array(cutVals.map(lit): _*))
      } else {
        val cuts = df.agg(
          approx_percentile(v, array(ps.map(lit): _*), lit(accuracy))
            .as(cutsCol))
        df.filter(v.isNotNull)
          .crossJoin(broadcast(cuts)) // one-row threshold attach
      }
    val bucket = aggregate(col(cutsCol), lit(0),
      (acc, c) => acc + when(v > c, 1).otherwise(0))
    withCuts
      .groupBy(bucket.cast("bigint").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(v).as("lo"), max(v).as("hi"))
  }

  /** Quantile discretization (feature binning): attach each ROW's
    * equi-depth bucket id — [[equiDepthHistogram]]'s assignment step
    * without the final aggregation, for feeding binned features
    * downstream. Row-preserving: NULL values get a NULL bucket. Same
    * exact/approx dual cut paths; the exact path is a pure map-side
    * literal fold (no join), the approx path an in-plan one-row
    * broadcast.
    */
  def discretizeEquiDepth(df: DataFrame, valueCol: String, nBuckets: Int,
      exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(nBuckets >= 2, "discretizeEquiDepth: need at least 2 buckets")
    val v = col(valueCol).cast("double")
    val ps = (1 until nBuckets).map(_.toDouble / nBuckets)
    def bucketOf(cuts: Column): Column =
      when(v.isNull, lit(null).cast("int"))
        .otherwise(aggregate(cuts, lit(0),
          (acc, c) => acc + when(v > c, 1).otherwise(0)))
    if (exact) {
      val cutVals = Percentiles.exactValues(df, v, ps, accuracy)
      df.withColumn("bucket", bucketOf(array(cutVals.map(lit): _*)))
    } else {
      val Seq(cc) = Cols.fresh("disc", 1, df)
      val cuts = df.agg(approx_percentile(v, array(ps.map(lit): _*),
        lit(accuracy)).as(cc))
      df.crossJoin(broadcast(cuts))
        .withColumn("bucket", bucketOf(col(cc)))
        .drop(cc)
    }
  }

  /** Per-group Pearson AND Spearman correlation between two numeric
    * columns — the monotone-association dual Pearson misses (Spearman
    * is Pearson over AVERAGE ranks, the Kendall-free fractional-rank
    * convention, so ties are handled exactly like pandas/SciPy).
    *
    * Shape: two rank windows (one sort per column within each group,
    * the same shuffle) + one hash agg; average rank for a tie class
    * of size c at min-rank r is r + (c-1)/2, built from RANK and a
    * per-value COUNT window — no per-group collects, no second pass.
    * NULL rows in either column are dropped up front (pairwise
    * deletion, the pandas default).
    */
  def correlations(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val clean = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val Seq(rx, ry) = Cols.fresh("rank", 2, df)
    def avgRank(c: String): Column = {
      val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(c))
      val ties = Window.partitionBy((groupCols :+ c).map(col): _*)
      rank().over(w) + (count(lit(1)).over(ties) - 1) / 2.0
    }
    clean
      .withColumn(rx, avgRank(xCol))
      .withColumn(ry, avgRank(yCol))
      .groupBy(groupCols.map(col): _*)
      .agg(
        corr(col(xCol), col(yCol)).as("pearson"),
        corr(col(rx), col(ry)).as("spearman"),
        count(lit(1)).as("n"))
  }

  /** Per-dimension statistics of an embedding column — mean, sample
    * stddev, min, max, and non-null count for each coordinate. The
    * embedding-health profile: a dimension with ~zero variance is dead
    * capacity (collapse), a runaway mean/max marks scaling bugs, and
    * (mean, std) per dimension are exactly the whitening constants a
    * normalization pass needs.
    *
    * Scale shape: one posexplode fan-out (rows × dims) into one hash
    * aggregate keyed by dimension — output is DIMS-sized regardless of
    * corpus size, every aggregate partial/mergeable, no joins. Values
    * are widened float→double BEFORE aggregating (exact widening; the
    * sums then carry double precision).
    */
  def embeddingDimStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("dim").cast("bigint").as("dim"), col("x").cast("double").as("x"))
      .groupBy("dim")
      .agg(avg(col("x")).as("mean"),
        stddev_samp(col("x")).as("std"),
        min(col("x")).as("mn"),
        max(col("x")).as("mx"),
        count(col("x")).as("n"))

  /** Per-row diagonal-covariance Mahalanobis score over an embedding
    * column: Σ_i ((x_i − μ_i)/σ_i)², the standard cheap embedding-space
    * outlier flag (full-covariance Mahalanobis needs a dim×dim inverse;
    * the diagonal form is the per-dim z-score energy and scales to any
    * corpus). Dims with σ = 0 (or undefined, n < 2) carry no signal and
    * contribute exactly 0 on both engines.
    *
    * In-plan end to end: the [[embeddingDimStats]] aggregation collapses
    * to ONE row of (μ[], σ[]) arrays via dim-sorted collect lists,
    * broadcast back over the corpus, and the per-row sum runs in
    * `zip_with`/`aggregate` HOFs inside whole-stage codegen — no second
    * shuffle, no driver collect. μ/σ are rounded to `roundDp` before
    * use and the score after, so an oracle replaying the same
    * arithmetic is bit-exact (SURVEY.md §5.4).
    *
    * Returns the input's id column plus `maha` (rounded score).
    */
  def mahalanobisDiag(df: DataFrame, idCol: String, vecCol: String,
      roundDp: Int = 6): DataFrame = {
    val stats = embeddingDimStats(df, vecCol)
      .select(col("dim"), round(col("mean"), roundDp).as("mu"),
        round(col("std"), roundDp).as("sd"))
      .agg(array_sort(collect_list(struct(col("dim"), col("mu")))).as("mus"),
        array_sort(collect_list(struct(col("dim"), col("sd")))).as("sds"))
      .select(transform(col("mus"), s => s.getField("mu")).as("mu"),
        transform(col("sds"), s => s.getField("sd")).as("sd"))
    df.select(col(idCol), col(vecCol).cast("array<double>").as("_v"))
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        round(aggregate(
          zip_with(
            zip_with(col("_v"), col("mu"), (x, m) => x - m),
            col("sd"),
            (d, s) => when(s.isNotNull && s > 0.0, (d / s) * (d / s))
              .otherwise(0.0)),
          lit(0.0), (acc, e) => acc + e), roundDp).as("maha"))
  }

  /** Per-shard content checksums — the dataset-fingerprint a pipeline
    * records next to every materialized snapshot so a later run (or a
    * consumer cluster) can verify "same rows, same bytes" without
    * re-reading both copies row-by-row. Each row digests to a 60-bit
    * integer (md5 over key + content columns, separator-framed so
    * column boundaries can't alias), shards by the
    * [[Sampling.assignShards]] draw of the key, and each shard reports
    * its row count and the XOR of its digests.
    *
    * XOR, not SUM: order-independent AND overflow-free (a 60-bit sum
    * overflows an int64 silently past ~2^4 rows × 2^60; XOR stays in
    * range at any cardinality), so the checksum is partitioning-,
    * retry-, and engine-independent. The whole thing is one projection
    * at the scan plus ONE shard-keyed aggregate with map-side
    * partials; output is nShards rows regardless of corpus size.
    *
    * Caveat the honest way: XOR cancels PAIRS of identical digests, so
    * a table that gains the same row TWICE keeps its checksum. The row
    * COUNT column catches exactly that case — compare both.
    */
  def shardChecksum(df: DataFrame, keyCol: String,
      contentCols: Seq[String], nShards: Int): DataFrame = {
    require(contentCols.nonEmpty, "shardChecksum needs content columns")
    val Seq(dg) = Cols.fresh("ck", 1, df)
    // Length-prefixed framing (injective): each field encodes as
    // "<charlen>:<value>", NULL as "-". Tokens are self-delimiting (a
    // parser reads '-', or digits up to the first ':' then exactly
    // that many chars), so no combination of values -- including
    // values containing any would-be separator byte -- can alias
    // another row's encoding. This closes the collision class a fixed
    // sentinel left open: a value EQUAL to the sentinel digested the
    // same as NULL, and embedded separator bytes could still alias
    // the frame.
    val digest = conv(substring(md5(concat(
      (keyCol +: contentCols).map { c =>
        val s = col(c).cast("string")
        coalesce(concat(length(s).cast("string"), lit(":"), s), lit("-"))
      }: _*)), 1, 15),
      16, 10).cast("long")
    Sampling.assignShards(df, keyCol, nShards)
      .withColumn(dg, digest)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        // bit_xor is SQL-registered but has no Column builder in this
        // Spark -- expr() over the fresh internal column keeps codegen
        expr(s"bit_xor($dg)").as("checksum"))
      .orderBy("shard")
  }

  /** Mutual information between two categorical columns, with the
    * marginal entropies and the normalized coefficient — the
    * dataset-composition diagnostic ("how much does source determine
    * language?") that catches stratification accidents a pair of
    * histograms can't. All probabilities are exact integer ratios
    * (cell/N); logs are taken at the very end over those ratios, so
    * the only float work is the final vocabulary²-sized sum.
    *
    * MI = Σ_ab (c_ab/N) ln(c_ab·N / (c_a·c_b)), H = -Σ (c/N) ln(c/N),
    * NMI = MI / max(H_a, H_b) (0 when both entropies are 0 — two
    * constant columns carry no information to normalize by).
    *
    * Scale shape: ONE (a,b)-keyed count shuffle; marginals re-aggregate
    * that cell table (cells ≤ |A|·|B|, vocabulary-sized); everything
    * after the first count is cell-table-sized, attached broadcast.
    * Null categories are their own level (dropping them would hide
    * exactly the missing-data structure this op exists to surface).
    */
  def mutualInfo(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("_a"), col(bCol).as("_b"))
      .agg(count(lit(1)).as("_cab"))
    // Null-safe (<=>) marginal attach: a NULL category is a real level,
    // and a plain equi-join would silently drop its cells from the
    // MI/entropy sums while n_rows still counted them.
    val ma = cells.groupBy(col("_a").as("_a_m")).agg(sum("_cab").as("_ca"))
    val mb = cells.groupBy(col("_b").as("_b_m")).agg(sum("_cab").as("_cb"))
    val n = cells.agg(sum("_cab").cast("double").as("_n"))
    val joined = cells
      .join(broadcast(ma), col("_a") <=> col("_a_m")).drop("_a_m")
      .join(broadcast(mb), col("_b") <=> col("_b_m")).drop("_b_m")
      .crossJoin(broadcast(n))
    val pab = col("_cab") / col("_n")
    val pa = col("_ca") / col("_n")
    val pb = col("_cb") / col("_n")
    // H_a over the cell table: Σ_b p_ab = p_a, so -Σ_cells p_ab·ln p_a
    // = -Σ_a p_a·ln p_a exactly (same trick for H_b) — no second scan.
    joined.agg(
      sum(pab * log((col("_cab") * col("_n")) / (col("_ca") * col("_cb")))).as("mi"),
      (-sum(pab * log(pa))).as("h_a"),
      (-sum(pab * log(pb))).as("h_b"),
      sum(col("_cab")).as("n_rows"))
      .withColumn("nmi",
        when(greatest(col("h_a"), col("h_b")) > 0.0,
          col("mi") / greatest(col("h_a"), col("h_b"))).otherwise(lit(0.0)))
  }

  /** Pearson χ² test of independence between two categorical columns,
    * with Cramér's V effect size — the significance-flavored sibling
    * of [[mutualInfo]] (same one-shuffle cell-table shape; MI answers
    * "how much information", χ²/V answer "is the association beyond
    * chance, and how strong on [0,1]").
    *
    * Empty-cell handling without materializing the r×c grid: expected
    * masses sum to N over ALL cells, so
    * χ² = Σ_observed (O−E)²/E + (N − Σ_observed E) — the second term
    * is exactly the Σ E of the zero-O cells. All counts/marginals are
    * exact integers; E and the χ² fold are the only float work
    * (cell-table-sized), rounded at 6 dp. Cramér's V =
    * √(χ²/(N·(min(r,c)−1))), NULL when either column is constant.
    * NULL categories are real levels (the mutualInfo contract).
    *
    * Returns one row: (chi2, dof, cramers_v, n).
    */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("_a"), col(bCol).as("_b"))
      .agg(count(lit(1)).as("_o"))
    val ma = cells.groupBy(col("_a").as("_a_m")).agg(sum("_o").as("_na"))
    val mb = cells.groupBy(col("_b").as("_b_m")).agg(sum("_o").as("_nb"))
    val n = cells.agg(sum("_o").cast("double").as("_n"))
    // level counts from the MARGINAL tables (one row per level, NULL
    // included) — count_distinct would silently drop a NULL level
    val rc = ma.agg(count(lit(1)).as("_r"))
      .crossJoin(mb.agg(count(lit(1)).as("_c")))
    val e = col("_na") * col("_nb") / col("_n")
    cells
      .join(broadcast(ma), col("_a") <=> col("_a_m")).drop("_a_m")
      .join(broadcast(mb), col("_b") <=> col("_b_m")).drop("_b_m")
      .crossJoin(broadcast(n))
      .crossJoin(broadcast(rc))
      .agg(
        (sum((col("_o") - e) * (col("_o") - e) / e)
          + max(col("_n")) - sum(e)).as("_chi2"),
        max(col("_n")).cast("long").as("n"),
        max((col("_r") - 1) * (col("_c") - 1)).as("dof"),
        max(least(col("_r"), col("_c")) - 1).cast("double").as("_minrc"))
      .select(
        round(col("_chi2"), 6).cast("double").as("chi2"),
        col("dof"),
        when(col("_minrc") > 0,
          round(sqrt(col("_chi2") / (col("n") * col("_minrc"))), 6))
          .cast("double").as("cramers_v"),
        col("n"))
  }

  /** k-anonymity / l-diversity audit over a quasi-identifier
    * combination — the release-governance gate for training corpora
    * with user-linked metadata: a quasi-identifier group smaller than
    * `k` re-identifies its members; a group whose sensitive column
    * takes fewer than `l` distinct values leaks the attribute even at
    * size >= k (homogeneity attack).
    *
    * Returns one row per quasi-group: (quasiCols..., n_rows,
    * n_sensitive, k_anonymous, l_diverse) — all exact integers and
    * integer comparisons, nothing float. One aggregation; the
    * count_distinct shuffles (group, sensitive) pairs, bounded by the
    * group-count × sensitive-domain, not the corpus.
    *
    * [[suppressBelowK]] is the enforcement half: drop every row whose
    * quasi-group fails k — the standard suppression remedy.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity: need quasi-identifier columns")
    require(k >= 1 && l >= 1, s"kAnonymity: k, l >= 1, got ($k, $l)")
    val gcols = quasiCols.map(col)
    df.groupBy(gcols: _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .select((gcols :+ col("n_rows") :+ col("n_sensitive")
        :+ (col("n_rows") >= k).as("k_anonymous")
        :+ (col("n_sensitive") >= l).as("l_diverse")): _*)
  }

  /** t-closeness audit over a quasi-identifier combination — the
    * third rung of the release-governance ladder ([[kAnonymity]]'s
    * k stops re-identification, l stops homogeneity; t stops the
    * SKEW attack: a group can be l-diverse yet still reveal that its
    * members are overwhelmingly in the top bucket): for an ORDINAL
    * sensitive column, the Earth-Mover distance between the group's
    * distribution and the global one,
    * t = Σ_j |P_cum(j) − Q_cum(j)| / (m − 1) over the m ordered
    * domain values.
    *
    * Exactness: the float distributions never materialize —
    * |a_j·N − n_g·A_j| on exact cumulative integers folds in
    * decimal(38,0), ONE division per group by (m−1)·n_g·N. The
    * domain grid is explicit (a value a group never takes still
    * moves its cumulative gap). m < 2 reports NULL. Scale shape:
    * one (quasi, s) cell shuffle, a domain-bounded broadcast grid,
    * domain-ordered windows on grid-sized frames. Output:
    * (quasiCols..., n_rows, t_closeness, t_close) with the flag
    * against `t`.
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: Column, t: Double): DataFrame = {
    require(quasiCols.nonEmpty, "tCloseness: need quasi-identifier columns")
    require(t > 0.0 && t < 1.0, s"tCloseness: t must be in (0,1), got $t")
    val dec = "decimal(38,0)"
    val gcols = quasiCols.map(col)
    val cells = df.select((gcols :+ sensitiveCol.cast("long").as("_s")): _*)
      .filter(col("_s").isNotNull)
      .groupBy((gcols :+ col("_s")): _*).agg(count(lit(1)).as("_c"))
      .localCheckpoint() // domain + global + grid join read it
    val domain = cells.select(col("_s")).distinct()
    val global = cells.groupBy(col("_s").as("_sg"))
      .agg(sum("_c").as("_cg"))
      .withColumn("_cumg", sum("_cg").over(Window.orderBy("_sg")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val nAll = cells.agg(sum("_c").as("_nn"),
      countDistinct(col("_s")).as("_m"))
    val groups = cells.groupBy(gcols: _*).agg(sum("_c").as("_ng"))
    val grid = groups.crossJoin(broadcast(domain))
      .join(cells, quasiCols :+ "_s", "left")
      .withColumn("_cc", coalesce(col("_c"), lit(0L)))
      .withColumn("_cum", sum("_cc").over(
        Window.partitionBy(gcols: _*).orderBy("_s")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(global), col("_s") === col("_sg")).drop("_sg")
      .crossJoin(broadcast(nAll))
      .withColumn("_gap", abs((col("_cum").cast(dec) * col("_nn"))
        .cast(dec) - (col("_ng").cast(dec) * col("_cumg")).cast(dec)))
    grid.groupBy((gcols :+ col("_ng") :+ col("_m") :+ col("_nn")): _*)
      .agg(sum(col("_gap")).as("_sgap"))
      .select((gcols :+ col("_ng").cast("bigint").as("n_rows") :+
        when(col("_m") >= 2,
          round(col("_sgap").cast("double")
            / ((col("_m").cast("double") - 1.0)
              * col("_ng").cast("double") * col("_nn").cast("double")),
            6)).cast("double").as("t_closeness") :+
        when(col("_m") >= 2,
          round(col("_sgap").cast("double")
            / ((col("_m").cast("double") - 1.0)
              * col("_ng").cast("double") * col("_nn").cast("double")),
            6) <= t).as("t_close")): _*)
  }

  /** Suppression remedy: keep only rows whose quasi-group has >= k
    * members. One aggregation + one group-keyed semi-join (the
    * group-size table is group-count-sized — broadcast at scale).
    */
  def suppressBelowK(df: DataFrame, quasiCols: Seq[String], k: Int)
      : DataFrame = {
    require(quasiCols.nonEmpty, "suppressBelowK: need quasi-identifier columns")
    val big = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= k)
      .drop("_n")
    df.join(broadcast(big), quasiCols, "left_semi")
  }

  /** Gini coefficient of a non-negative numeric column per group — the
    * inequality/concentration diagnostic for corpus composition ("is
    * token mass concentrated in a few giant documents/sources?"):
    * 0 = perfectly even, →1 = all mass on one row.
    *
    * Computed from the sorted-rank identity
    * G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ) with xᵢ ascending —
    * tie-ORDER-invariant (equal values occupy a fixed position set, so
    * any rank assignment among them yields the same Σ i·xᵢ), which
    * makes the row_number total-order requirement moot cross-engine.
    * Sums accumulate in decimal(38,0) (exact integers; DuckDB's
    * HUGEINT mirror), so the only float is the final rounded division.
    *
    * Scale shape: one per-group sort window (the necessary cost of a
    * rank statistic, parallel across groups) + one group agg. Groups
    * too large to sort should use the binned approximation over
    * [[equiDepthHistogram]] instead.
    */
  /** Categorical diversity profile per group — "how varied is this
    * slice's category mix" in the three standard numbers a corpus-
    * composition dashboard quotes: richness (distinct categories),
    * Shannon entropy H = ln n − (Σ c·ln c)/n in nats with effective
    * categories e^H (the 'true diversity' of order 1), and the
    * UNBIASED Gini–Simpson index 1 − Σ c(c−1)/(n(n−1)) (probability
    * two draws WITHOUT replacement differ — all-integer, no float
    * freedom). The category-mix sibling of [[gini]]'s value
    * concentration; the drift family (PSI/JSD) compares two mixes,
    * this profiles one.
    *
    * Exactness: counts are exact integers; each c·ln c term is frozen
    * at 12 dp into an order-free decimal(38,12) sum (the mutualInfo
    * discipline); H, e^H, and the Simpson division are each one
    * rounded float expression. NULL categories are a real level (the
    * chiSquare convention). Singleton groups: H = 0, Simpson NULL
    * (no unordered pair exists).
    *
    * Scale shape: one (group, category) count shuffle, then
    * category-cardinality-sized folds. Output: (group..., n,
    * richness, shannon, eff_categories, simpson).
    */
  def diversity(df: DataFrame, groupCols: Seq[String], catCol: String)
      : DataFrame = {
    require(groupCols.nonEmpty, "diversity: need at least one group column")
    val gcols = groupCols.map(col)
    val cells = df.groupBy(gcols :+ col(catCol): _*)
      .agg(count(lit(1)).as("_c"))
    val dec12 = "decimal(38,12)"
    cells.groupBy(gcols: _*)
      .agg(sum("_c").as("_n"), count(lit(1)).as("_k"),
        sum(round(col("_c") * log(col("_c")), 12).cast(dec12)).as("_clnc"),
        sum(col("_c") * (col("_c") - 1)).as("_same"))
      .withColumn("_h",
        round(log(col("_n")) - col("_clnc").cast("double") / col("_n"), 6))
      .select(gcols ++ Seq(
        col("_n").cast("bigint").as("n"),
        col("_k").cast("bigint").as("richness"),
        col("_h").cast("double").as("shannon"),
        round(exp(col("_h")), 6).cast("double").as("eff_categories"),
        when(col("_n") >= 2,
          round(lit(1.0) - col("_same").cast("double")
            / (col("_n") * (col("_n") - 1)).cast("double"), 6))
          .cast("double").as("simpson")): _*)
  }

  def gini(df: DataFrame, groupCols: Seq[String], valueCol: String)
      : DataFrame = {
    require(groupCols.nonEmpty, "gini: need at least one group column")
    // the exact-sum path accumulates in decimal(38,0), which would
    // silently ROUND fractional values — enforce the integer contract
    // loudly (fractional columns: pre-scale to a fixed-point integer,
    // e.g. round(v * 1e6))
    val vType = df.schema(valueCol).dataType
    val integral = vType match {
      case _: org.apache.spark.sql.types.ByteType => true
      case _: org.apache.spark.sql.types.ShortType => true
      case _: org.apache.spark.sql.types.IntegerType => true
      case _: org.apache.spark.sql.types.LongType => true
      case d: org.apache.spark.sql.types.DecimalType => d.scale == 0
      case _ => false
    }
    require(integral,
      s"gini: '$valueCol' is $vType — the exact decimal(38,0) sums would " +
        "silently round fractional values; pre-scale to integers " +
        "(e.g. round(v * 1e6) as a fixed-point column) and re-run")
    val gcols = groupCols.map(col)
    val v = col(valueCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*).orderBy(v.asc)
    df.filter(v.isNotNull)
      .withColumn("_rn", row_number().over(w))
      .groupBy(gcols: _*)
      .agg(
        sum((col("_rn") * v).cast("decimal(38,0)")).as("_s1"),
        sum(v.cast("decimal(38,0)")).as("_sx"),
        count(lit(1)).as("n"))
      .select((gcols :+
        when(col("_sx") > 0,
          round((lit(2) * col("_s1") - (col("n") + 1) * col("_sx"))
            .cast("double")
            / (col("n") * col("_sx")).cast("double"), 6))
          .cast("double").as("gini")
        :+ col("n")): _*)
  }

  /** Population Stability Index between a reference and a current
    * sample of a numeric column, per group: the standard model/data
    * monitoring drift score. Values bin into `bins` fixed-width
    * buckets over the REFERENCE's global [min, max] (the production
    * convention: edges freeze with the reference snapshot; current
    * values outside clamp into the edge bins). Counts take add-one
    * smoothing over the full group×bin grid so empty bins never blow
    * up the log:
    *
    *   p_b = (c_ref_b + 1)/(n_ref + bins),
    *   q_b = (c_cur_b + 1)/(n_cur + bins),
    *   PSI = Σ_b (p_b − q_b)·ln(p_b/q_b)
    *
    * Complements [[graft.operators.TextAnalysis.unigramDrift]] (KL on
    * token distributions): PSI is symmetric-ish, bounded by its
    * smoothing, and the score monitoring dashboards expect. Ratios
    * stay exact integers until the final bins-sized log sum; bin
    * assignment is a fixed IEEE expression (sub/mul/div/floor — all
    * correctly rounded, so both engines agree bit-for-bit).
    *
    * Scale shape: one min/max aggregate over the reference (one-row
    * broadcast), one (group, bin) count per side — corpus touched once
    * per side — then grid completion and the PSI fold over the
    * group×bins-sized table. The grid comes from the distinct-group
    * table × a `sequence` explode, never from corpus data.
    */
  def psi(ref: DataFrame, cur: DataFrame, groupCols: Seq[String],
      valueCol: String, bins: Int): DataFrame = {
    require(bins >= 2, s"psi: bins must be >= 2, got $bins")
    require(groupCols.nonEmpty, "psi: need at least one group column")
    val gcols = groupCols.map(col)
    val v = col(valueCol)
    val edges = ref.filter(v.isNotNull)
      .agg(min(v).cast("double").as("_lo"), max(v).cast("double").as("_hi"))
    def binned(df: DataFrame): DataFrame = df
      .filter(v.isNotNull)
      .crossJoin(broadcast(edges))
      .select((gcols :+
        when(col("_hi") === col("_lo"), lit(0))
          .otherwise(least(greatest(
            floor((v.cast("double") - col("_lo")) * bins
              / (col("_hi") - col("_lo"))).cast("int"),
            lit(0)), lit(bins - 1))).as("bin")): _*)
      .groupBy((gcols :+ col("bin")): _*)
      .agg(count(lit(1)).as("cnt"))
    val refCounts = binned(ref)
    val curCounts = binned(cur)
    val groups = ref.select(gcols: _*).unionByName(cur.select(gcols: _*))
      .distinct()
    val grid = groups.select((gcols :+
      explode(sequence(lit(0), lit(bins - 1))).as("bin")): _*)
    val joinKeys = groupCols :+ "bin"
    val perBin = grid
      .join(refCounts.withColumnRenamed("cnt", "_cr"), joinKeys, "left")
      .join(curCounts.withColumnRenamed("cnt", "_cc"), joinKeys, "left")
      .select((gcols :+ col("bin")
        :+ coalesce(col("_cr"), lit(0L)).as("_cr")
        :+ coalesce(col("_cc"), lit(0L)).as("_cc")): _*)
    val nr = sum(col("_cr")).over(
      org.apache.spark.sql.expressions.Window.partitionBy(gcols: _*))
    val nc = sum(col("_cc")).over(
      org.apache.spark.sql.expressions.Window.partitionBy(gcols: _*))
    val p = (col("_cr") + 1).cast("double") / (col("_nr") + bins)
    val q = (col("_cc") + 1).cast("double") / (col("_nc") + bins)
    perBin
      .withColumn("_nr", nr).withColumn("_nc", nc)
      .groupBy(gcols: _*)
      .agg(round(sum((p - q) * log(p / q)), 6).cast("double").as("psi"),
        max(col("_nr")).cast("long").as("n_ref"),
        max(col("_nc")).cast("long").as("n_cur"))
  }

  /** Functional-dependency audit: does `detCols → depCol` hold — the
    * schema-contract check behind "is doc_id really a key", "does
    * source determine lang", "is this denormalized column consistent".
    * A determinant group violates iff it maps to more than one
    * dependent value; NULL dependents are a real level (two rows
    * (k, NULL) and (k, 'x') ARE an inconsistency).
    *
    * All exact integers to one rounded rate. Scale shape: one
    * (det, dep) distinct shuffle, one det-keyed count, a one-row
    * fold. Output one row: (n_groups, n_violating, violation_rate,
    * max_distinct_dep).
    */
  def functionalDependency(df: DataFrame, detCols: Seq[String],
      depCol: String): DataFrame = {
    require(detCols.nonEmpty, "functionalDependency needs determinants")
    val dcols = detCols.map(col)
    val perDet = df
      .select((dcols :+ col(depCol).as("_dep")): _*)
      .distinct()
      .groupBy(dcols: _*)
      .agg(count(lit(1)).as("_nd"))
    perDet.agg(
      count(lit(1)).as("n_groups"),
      sum(when(col("_nd") > 1, 1L).otherwise(0L)).as("n_violating"),
      round(sum(when(col("_nd") > 1, 1L).otherwise(0L))
        / count(lit(1)).cast("double"), 6).cast("double")
        .as("violation_rate"),
      max("_nd").as("max_distinct_dep"))
  }

  /** Zone maps — per-shard (min, max, null-count) for each listed
    * column, the data-skipping index a 100 TB layout lives on: a
    * reader with a predicate consults the shard-sized map and prunes
    * every shard whose [min, max] cannot match, the same contract as
    * parquet row-group statistics and Delta/Iceberg file stats, here
    * materialized as a queryable table (and, composed with
    * [[ZOrder.clusterByZ]]'s range partitioning, the ranges become
    * tight on every clustered column at once).
    *
    * ONE hash aggregation keyed by the [[Sampling.assignShards]] md5
    * shard; output is nShards rows regardless of input size. No value
    * arithmetic — mins/maxes pass fixture values through exactly, so
    * there is no rounding contract.
    */
  def zoneMap(df: DataFrame, keyCol: String, nShards: Int,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "zoneMap needs at least one column")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    }
    Sampling.assignShards(df, keyCol, nShards)
      .groupBy("shard")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Single-feature decision stump by information gain: sweep the
    * B−1 interior edges of a fixed-width bin grid over the feature
    * and report the threshold whose split maximizes label-entropy
    * reduction — "how separable is the label on THIS feature, and
    * where" in one number + one cut point; the supervised companion
    * of [[mutualInfo]] (which needs categorical sides) and the
    * 1-feature special case of what a tree trainer repeats.
    *
    * gain(q) = H(N⁺, N) − (n_L/N)·H(n⁺_L, n_L) − (n_R/N)·H(n⁺_R, n_R)
    * with all counts exact integers from ONE (bin, label) aggregate's
    * cumulatives; each binary entropy H is one identically-spelled
    * double tree frozen at 12 dp (pure 0/1 mixtures contribute an
    * exact 0 by the x·ln x limit, never a ln(0)); the argmax is a
    * (gain DESC, edge ASC) total order. Edges freeze on the feature's
    * [min, max] (the [[psi]] grid); threshold = lo + q·(hi−lo)/B on
    * identical doubles. Degenerate: constant feature or single-class
    * label → gain 0 at the first edge.
    *
    * Scale shape: one scan → (bin, label) cells → bins-bounded
    * windows; the sweep never touches corpus-sized data. Output: ONE
    * row (n, n_pos, edge, threshold, n_left, n_right, gain).
    */
  def infoGainStump(df: DataFrame, featureCol: String, label: Column,
      bins: Int): DataFrame = {
    require(bins >= 2, s"infoGainStump: bins must be >= 2, got $bins")
    val v = col(featureCol)
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
    // cumulative (left-side) counts AT each bin; the split edge after
    // bin q sends bins <= q left
    val cum = cells
      .withColumn("_nl", sum("_n").over(wOrd))
      .withColumn("_pl", sum("_p").over(wOrd))
      .withColumn("_nt", sum("_n").over(wAll))
      .withColumn("_pt", sum("_p").over(wAll))
      .filter(col("_bin") < bins - 1) // interior edges only
    def h(p: Column, n: Column): Column = {
      val pd = p.cast("double"); val nd = n.cast("double")
      round(when(p > 0 && p < n,
        -(pd / nd) * log(pd / nd)
          - ((nd - pd) / nd) * log((nd - pd) / nd))
        .otherwise(lit(0.0)), 12)
    }
    val nr = col("_nt") - col("_nl")
    val pr = col("_pt") - col("_pl")
    val gain = round(h(col("_pt"), col("_nt"))
      - (col("_nl").cast("double") / col("_nt").cast("double"))
        * h(col("_pl"), col("_nl"))
      - (nr.cast("double") / col("_nt").cast("double")) * h(pr, nr), 6)
    cum
      .select(col("_nt").cast("bigint").as("n"),
        col("_pt").cast("bigint").as("n_pos"),
        (col("_bin") + 1).cast("bigint").as("edge"),
        col("_nl").cast("bigint").as("n_left"),
        nr.cast("bigint").as("n_right"),
        gain.cast("double").as("gain"))
      .crossJoin(broadcast(edges))
      .withColumn("threshold",
        round(col("_lo") + col("edge").cast("double")
          * (col("_hi") - col("_lo")) / bins, 6).cast("double"))
      .withColumn("_rk", row_number().over(
        Window.orderBy(col("gain").desc, col("edge").asc)))
      .filter(col("_rk") === 1)
      .select("n", "n_pos", "edge", "threshold", "n_left", "n_right",
        "gain")
  }

  /** Weight-of-evidence / information-value binning — the credit-
    * scoring screen "how much does THIS score separate the classes,
    * bin by bin": WoE_i = ln((g_i+0.5)/G / ((b_i+0.5)/B)) over fixed-
    * width bins with the classical +0.5 adjustment applied EVERYWHERE
    * (an empty-side bin would otherwise be ±∞; one convention for all
    * bins keeps the panel comparable), IV = Σ ((g_i+0.5)/G −
    * (b_i+0.5)/B)·WoE_i. Rule of thumb: IV < 0.02 useless, > 0.5
    * suspicious.
    *
    * Exactness: counts exact integers; G/B are the raw totals; each
    * WoE is one frozen-12-dp ln of one double ratio; IV terms freeze
    * at 12 dp into an order-free decimal(38,12) sum; IV and WoE round
    * at 6 dp. Empty bins on the grid still emit (their adjusted WoE
    * is the all-smoothing value — visible, not silently dropped).
    * G = 0 or B = 0 (single-class data) → NULL woe/iv.
    *
    * Scale shape: one scan → bin cells → a bins-bounded grid fold.
    * Output: one row per bin (bin, n_good, n_bad, woe, iv) with iv
    * repeated (the panel's scalar).
    */
  def woeIv(df: DataFrame, scoreCol: String, good: Column,
      bins: Int): DataFrame = {
    require(bins >= 2, s"woeIv: bins must be >= 2, got $bins")
    val v = col(scoreCol)
    val edges = df.filter(v.isNotNull)
      .agg(min(v).cast("double").as("_lo"), max(v).cast("double").as("_hi"))
    val cells = df.filter(v.isNotNull && good.isNotNull)
      .crossJoin(broadcast(edges))
      .select(
        when(col("_hi") === col("_lo"), lit(0))
          .otherwise(least(greatest(
            floor((v.cast("double") - col("_lo")) * bins
              / (col("_hi") - col("_lo"))).cast("int"),
            lit(0)), lit(bins - 1))).as("_bin"),
        when(good, 1L).otherwise(0L).as("_g"))
      .groupBy("_bin")
      .agg(sum("_g").as("_gc"), sum(lit(1L) - col("_g")).as("_bc"))
    val grid = df.sparkSession.range(bins.toLong)
      .select(col("id").cast("int").as("_bin"))
      .join(cells, Seq("_bin"), "left")
      .select(col("_bin"),
        coalesce(col("_gc"), lit(0L)).as("_gc"),
        coalesce(col("_bc"), lit(0L)).as("_bc"))
    val wAll = Window.partitionBy()
    val withTot = grid
      .withColumn("_G", sum("_gc").over(wAll))
      .withColumn("_B", sum("_bc").over(wAll))
    val gs = (col("_gc").cast("double") + 0.5) / col("_G").cast("double")
    val bs = (col("_bc").cast("double") + 0.5) / col("_B").cast("double")
    val woe = round(log(gs / bs), 12)
    val ivTerm = round((gs - bs) * woe, 12).cast("decimal(38,12)")
    withTot
      .withColumn("_woe", when(col("_G") > 0 && col("_B") > 0, woe))
      .withColumn("_ivt",
        when(col("_G") > 0 && col("_B") > 0, ivTerm))
      .withColumn("iv",
        round(sum("_ivt").over(wAll).cast("double"), 6).cast("double"))
      .select(col("_bin").cast("bigint").as("bin"),
        col("_gc").cast("bigint").as("n_good"),
        col("_bc").cast("bigint").as("n_bad"),
        round(col("_woe"), 6).cast("double").as("woe"),
        col("iv"))
  }

  /** Deterministic pseudonymization: replace each listed column with
    * the md5 of a salted, length-prefixed encoding of its value — the
    * release-governance step between [[kAnonymity]]'s audit and
    * shipping a dataset: identifiers become opaque tokens, but the
    * SAME (salt, value) always maps to the SAME token, so joins and
    * group-bys across pseudonymized tables still line up (run every
    * table through the same salt). NULL stays NULL (a token for NULL
    * would conflate all missing values into one linkable group).
    *
    * The length-prefix framing is the [[shardChecksum]] injectivity
    * contract: no value can alias another's encoding, including
    * values containing the separator. Pure per-row codegen
    * projection — zero shuffles; reversal is by rainbow table only,
    * so treat the salt as a secret and rotate it per release.
    */
  def pseudonymize(df: DataFrame, cols: Seq[String],
      salt: String): DataFrame = {
    require(cols.nonEmpty, "pseudonymize needs at least one column")
    cols.foldLeft(df) { (acc, c) =>
      val s = col(c).cast("string")
      acc.withColumn(c,
        when(col(c).isNotNull,
          md5(concat(lit(salt), lit(":"),
            length(s).cast("string"), lit(":"), s))))
    }
  }
}
