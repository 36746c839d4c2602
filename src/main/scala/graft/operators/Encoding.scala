package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-engineering encoders — the training-prep transforms a
  * pipeline runs between curation and tensorization: one-hot for
  * bounded categoricals, the hashing trick for unbounded token
  * spaces, leave-one-out target encoding for high-cardinality
  * categoricals.
  *
  * All three are deterministic and oracle-replayable: one-hot and
  * target encoding are pure relational algebra; feature hashing uses
  * the md5-portable draw (the mixCorpora/splitPortable family) so an
  * external engine derives the identical dimension and sign per
  * token.
  */
object Encoding {

  /** One-hot encode `colName` into one 0/1 int column per entry of
    * `values` (named `<prefix>_<value>`). The vocabulary is
    * CALLER-PINNED: at scale the value set comes from a profiling
    * pass or a schema contract, never a silent driver collect mid
    * plan — and a pinned list keeps train/serve skew impossible.
    * Unseen values encode as all zeros (handle-unknown = ignore);
    * NULL encodes as all zeros too.
    *
    * Pure per-row projections at the scan — no shuffle, no state.
    */
  def oneHot(df: DataFrame, colName: String, values: Seq[String],
      prefix: Option[String] = None): DataFrame = {
    require(values.nonEmpty, "oneHot needs a pinned, non-empty vocabulary")
    require(values.distinct.size == values.size,
      s"oneHot vocabulary has duplicates: ${values.mkString(",")}")
    val pre = prefix.getOrElse(colName)
    val clash = values.map(v => s"${pre}_$v").filter(df.columns.contains)
    require(clash.isEmpty,
      s"oneHot output would overwrite existing columns: ${clash.mkString(",")}" +
        " — pass a different prefix")
    values.foldLeft(df) { (d, v) =>
      d.withColumn(s"${pre}_$v",
        when(col(colName) === v, 1).otherwise(0))
    }
  }

  /** Hashing-trick token features (Weinberger et al. — the
    * fixed-dimension encoder for unbounded vocabularies): each token
    * occurrence votes ±1 into dimension md5(token) mod `dim`, sign
    * from the next md5 hex digit's parity (the signed variant that
    * keeps collision noise zero-mean). Output is the sparse form —
    * one (doc_id, dim, weight) row per touched dimension — ready for
    * a groupBy-free pivot or a sparse tensor writer.
    *
    * Scale shape: per-row tokenize + hash (pushes to the scan), ONE
    * (doc, dim)-granularity hash agg. No vocabulary state anywhere —
    * that is the point of the trick.
    */
  def featureHash(df: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    df.select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("_h", conv(substring(md5(col("tok")), 1, 15), 16, 10)
        .cast("long"))
      .withColumn("_sgn", when(
        conv(substring(md5(col("tok")), 16, 1), 16, 10).cast("long") % 2 === 0,
        1.0).otherwise(-1.0))
      .groupBy(col("doc_id"), (col("_h") % dim).as("dim"))
      .agg(sum(col("_sgn")).as("weight"))
  }

  /** Leave-one-out target encoding for a categorical column: each
    * row's encoding is the target mean of its category EXCLUDING the
    * row itself — (sum_cat - y) / (n_cat - 1) — the standard
    * leakage-guard (plain mean encoding lets each row see its own
    * label). Singleton categories fall back to the global mean.
    *
    * Shape: one category-sized agg joined back (broadcast while the
    * category table is dim-sized; drop the hint and it degrades to an
    * ordinary key-shuffle join at extreme cardinality) + the global
    * mean as a one-row in-plan broadcast. No per-row second pass.
    */
  def targetEncodeLoo(df: DataFrame, catCol: String, targetCol: String,
      outCol: String = "te"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column; pass a different outCol")
    val Seq(s, n, g, ck) = Cols.fresh("te", 4, df)
    val stats = df.groupBy(col(catCol))
      .agg(sum(col(targetCol)).as(s), count(lit(1)).as(n))
      .withColumnRenamed(catCol, ck)
    val global = df.agg(avg(col(targetCol)).as(g))
    // NULL-SAFE join: a null category is its own LOO group (groupBy
    // already emits its stats row) — a plain equi-join would silently
    // DROP every null-category row from a training-prep transform
    df.join(broadcast(stats), col(catCol) <=> col(ck))
      .crossJoin(broadcast(global))
      .withColumn(outCol,
        when(col(n) > 1, (col(s) - col(targetCol)) / (col(n) - 1))
          .otherwise(col(g)))
      .drop(s, n, g, ck)
  }

  /** Per-group feature scaling: z-score (sample std) and min-max in
    * one pass — the normalization step that runs per stratum
    * (per-sensor, per-event-type, per-feature-family) so one group's
    * range never squashes another's. Degenerate groups stay NULL, not
    * NaN: a single-row or constant group has no spread to scale by,
    * and NULL propagates honestly through training-prep filters where
    * NaN poisons comparisons silently.
    *
    * Shape: one group-keyed stats aggregate joined back broadcast
    * (group count is strata-sized by definition), row-preserving — the
    * [[targetEncodeLoo]] join pattern, null-safe on the group key so
    * null-group rows scale within their own group.
    */
  def scaleNumeric(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val v = col(valueCol).cast("double")
    val Seq(gk, mu, sd, mn, mx) = Cols.fresh("sc", 5, df)
    val stats = df.groupBy(col(groupCol).as(gk))
      .agg(avg(v).as(mu), stddev_samp(v).as(sd),
        min(v).as(mn), max(v).as(mx))
    df.join(broadcast(stats), col(groupCol) <=> col(gk))
      .withColumn("z",
        when(col(sd) > 0.0, (v - col(mu)) / col(sd)))
      .withColumn("minmax",
        when(col(mx) > col(mn), (v - col(mn)) / (col(mx) - col(mn))))
      .drop(gk, mu, sd, mn, mx)
  }

  /** Quantile normalization onto the pooled distribution — the
    * batch-effect corrector (microarray lineage, here: make each
    * source/language's length or score distribution comparable): the
    * row at in-group rank r of n maps to the POOLED value at global
    * rank ceil(r·N/n). After normalization every group's value
    * multiset draws from the same pooled quantiles, preserving only
    * within-group order.
    *
    * Pinned contract (everything integer, engine-portable): in-group
    * rank r = row_number over (value, id) — `idCol` must be unique,
    * the repo-wide total-order tie rule; pooled rank table = global
    * dense ids over (value, id) via [[Indexing.denseIds]] (range
    * shuffle + offsets — NO single-partition global window); target
    * index = (r·N + n − 1) div n, exact integer arithmetic; the
    * mapped value attaches by an index equi-join.
    *
    * Scale shape: one group-keyed window (rank + size share the
    * partitioning), one range shuffle for the pooled ranks, one
    * corpus-sized equi-join on the computed index. No driver state.
    *
    * Returns the input columns + `qnorm` (the mapped pooled value).
    */
  def quantileNormalize(df: DataFrame, groupCols: Seq[String],
      valueCol: String, idCol: String): DataFrame = {
    require(groupCols.nonEmpty, "quantileNormalize: need group columns")
    val gcols = groupCols.map(col)
    val v = col(valueCol)
    val byGroup = Window.partitionBy(gcols: _*)
    val ranked = df.filter(v.isNotNull)
      .withColumn("_qr", row_number().over(
        byGroup.orderBy(v.asc, col(idCol).asc)).cast("long"))
      .withColumn("_qn", count(lit(1)).over(byGroup))
    val pooled = Indexing.denseIds(
        df.filter(v.isNotNull).select(v.as("_pv"), col(idCol).as("_pid")),
        Seq("_pv", "_pid"), outCol = "_rid")
      .select(col("_rid"), col("_pv"))
    val total = pooled.agg(count(lit(1)).as("_qtot"))
    ranked
      .crossJoin(broadcast(total))
      .withColumn("_target",
        expr("(_qr * _qtot + _qn - 1) DIV _qn"))
      .join(pooled, col("_target") === col("_rid"))
      .withColumn("qnorm", col("_pv"))
      .drop("_qr", "_qn", "_qtot", "_target", "_rid", "_pv")
  }
}
