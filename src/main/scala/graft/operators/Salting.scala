package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting.
  *
  * AQE's skew-join rule splits oversized SORT-MERGE partitions at
  * runtime, but it cannot help a skewed hash AGGREGATION, and it never
  * fires when the plan broadcast-joins or the skew hides behind a
  * single monster key (one key = one partition is unsplittable without
  * changing the key). Salting changes the key: append a deterministic
  * salt in [0, numSalts) to the skewed side, replicate the small side
  * once per salt value, and the hot key's rows spread across numSalts
  * reducers.
  *
  * Both helpers are result-identical to their unsalted forms (specs
  * assert this); they only re-shape the shuffle.
  */
object Salting {

  /** Deterministic pseudo-random salt per row: hash of the whole row,
    * mod numSalts. No `rand()` — rows land on the same salt on retry /
    * speculative re-execution, which non-deterministic salting breaks.
    */
  private def rowSalt(df: DataFrame, numSalts: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col): _*)), lit(numSalts)).cast("int")

  /** Join types for which replicate-the-small-side salting is
    * result-identical to the unsalted join. Right/full outer are NOT:
    * an unmatched small-side row exists once per salt replica, so it
    * would surface `numSalts` times in the output.
    */
  private val saltableJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti")

  /** Equi-join a skew-keyed large table against a small-enough-to-
    * replicate table: large side gets a salt column, small side is
    * exploded once per salt, join key becomes (keys..., salt). The hot
    * key's probe rows now hash to `numSalts` distinct reducers.
    *
    * `how` is restricted to inner/left/left_semi/left_anti — the types
    * where the replicated small side never contributes unmatched rows,
    * keeping the result-identical contract honest.
    */
  def saltedJoin(skewed: DataFrame, small: DataFrame, keys: Seq[String],
      numSalts: Int, how: String = "inner"): DataFrame = {
    require(numSalts > 0)
    require(saltableJoinTypes.contains(how.toLowerCase.replace("_", "")),
      s"saltedJoin is result-identical only for inner/left/semi/anti joins; " +
        s"'$how' would replicate unmatched small-side rows numSalts times")
    val s = skewed.withColumn("_salt", rowSalt(skewed, numSalts))
    val d = small.withColumn("_salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    s.join(d, keys :+ "_salt", how).drop("_salt")
  }

  /** Two-phase skew-safe aggregation: partial-aggregate on
    * (keys, salt) — hot keys split across reducers — then merge the
    * partials per key. Caller supplies algebraic partial and merge
    * aggregates (sum/count/min/max compose; avg = sum+count merged).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], numSalts: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(numSalts > 0 && partial.nonEmpty && merge.nonEmpty)
    df.withColumn("_salt", rowSalt(df, numSalts))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}
