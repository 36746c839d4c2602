package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture merge: apply a changelog (upserts + deletes) to
  * a base snapshot, keeping the LATEST version of each key — the
  * dataset-refresh step (SCD type 1 / Delta MERGE semantics) restated
  * as a plain deterministic DataFrame transform, so it runs on bare
  * parquet with no table-format dependency.
  *
  * Winner per key = max (version, change-beats-base): at EQUAL version
  * the changelog row wins (a change at the snapshot's version must
  * apply); above that, version order is total per key by contract —
  * `requireUniqueVersions` makes a violated contract loud instead of
  * silently picking an arbitrary winner.
  *
  * Scale shape: ONE hash shuffle of base ∪ changes on the key (the
  * row_number window); the delete filter is map-side. At 100 TB the
  * changelog is usually ≪ base — the union reads each side once and
  * nothing else moves.
  */
object Cdc {

  /** `deleteCol`: boolean column in `changes` marking tombstones
    * (absent from `base`; attached as false). Output drops tombstone
    * winners and carries base's schema.
    */
  def applyChangelog(base: DataFrame, changes: DataFrame,
      keyCols: Seq[String], versionCol: String,
      deleteCol: String = "is_delete"): DataFrame = {
    require(keyCols.nonEmpty, "applyChangelog: no key columns")
    require(changes.columns.contains(deleteCol),
      s"changes must carry a boolean '$deleteCol' tombstone column")
    require(!base.columns.contains(deleteCol),
      s"base must not carry '$deleteCol'")
    val Seq(src, rn) = Cols.fresh("cdc", 2, base)
    val tagged = base.withColumn(deleteCol, lit(false)).withColumn(src, lit(0))
      .unionByName(changes.withColumn(src, lit(1)))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col(src).desc)
    tagged
      .withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1 && !col(deleteCol))
      .drop(src, rn, deleteCol)
  }

  /** Loud contract check for [[applyChangelog]]: within a key, every
    * changelog version must be distinct (ties across base/changes are
    * resolved by the change-wins rule; ties WITHIN the changelog have
    * no defined winner). One aggregation; run it on bounded scopes or
    * samples — it is a validation pass, not part of the merge plan.
    */
  def requireUniqueVersions(changes: DataFrame, keyCols: Seq[String],
      versionCol: String): Unit = {
    val dups = changes.groupBy((keyCols :+ versionCol).map(col): _*)
      .count().filter(col("count") > 1).limit(1).collect()
    require(dups.isEmpty,
      s"changelog has duplicate (key, $versionCol) rows: ${dups.mkString}")
  }
}
