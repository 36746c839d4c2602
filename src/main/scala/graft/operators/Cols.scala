package graft.operators

import org.apache.spark.sql.DataFrame

/** Internal-column hygiene shared by operators that add temporary
  * working columns: generated names never collide with caller columns,
  * so no user data is silently clobbered and dropped.
  */
private[graft] object Cols {

  /** `k` fresh column names based on `base`, absent from every input. */
  def fresh(base: String, k: Int, dfs: DataFrame*): Seq[String] = {
    val taken = dfs.flatMap(_.columns).toSet
    Iterator.from(0).map(i => s"_${base}$i")
      .filter(n => !taken.contains(n)).take(k).toSeq
  }
}
