package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: connected components over a near-dup
  * pair list, and the canonical-document dedup built on it.
  *
  * Pair generators (Dedup.minHashLshNearDup / simHashNearDup /
  * nearNgramJaccard) emit EDGES — (i, j) pairs over the similarity
  * threshold. A real dedup must then pick ONE survivor per transitive
  * group (A~B, B~C means A, B, C are one duplicate cluster even when
  * A~C itself is below threshold), which is connected components over
  * the pair graph.
  *
  * Scale design: min-label propagation on DataFrames. State is one
  * (vertex, label) row per vertex that appears in >= 1 pair — NOT per
  * corpus document, and near-dup edge lists are tiny relative to the
  * corpus — and each iteration is two shuffles (edge join + min-agg)
  * over that state. Iteration count is bounded by the cluster graph's
  * DIAMETER, which for duplicate clusters is small (near-cliques: every
  * member overlaps most others), so the loop typically converges in
  * 2-4 passes. Each pass is `localCheckpoint`ed: lineage is truncated
  * so the plan does not grow with iterations and no stage is
  * re-executed (at cluster scale with executor loss in play, swap in
  * reliable `checkpoint` — same call shape). The driver holds only the
  * one-row convergence count, never the labels.
  *
  * Deterministic: labels move monotonically down to the component-min
  * vertex id; no randomness, no tie-breaks.
  */
object Clustering {

  /** Connected components of the undirected graph given as an edge
    * list. Returns one row per distinct vertex: (v, cluster_id) where
    * cluster_id is the MINIMUM vertex id reachable from v.
    *
    * Fails loudly (IllegalStateException) if `maxIters` passes do not
    * converge — for near-dup graphs that means the edge list is not the
    * near-clique family this is tuned for, and silently-partial labels
    * would merge or split clusters downstream.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 25): DataFrame = {
    // null endpoints carry no connectivity and would propagate null
    // labels through least(); drop them up front
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    // Symmetric closure: propagation below follows edges src -> dst
    // only, so both directions must exist for labels to flow both ways.
    val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint() // the loop re-joins this every pass: compute once
    var labels = sym.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("cluster_id"))
      .localCheckpoint()
    var pass = 0
    var converged = false
    while (!converged && pass < maxIters) {
      // Each vertex pulls the minimum label among its neighbors; the
      // left join keeps isolated-after-distinct vertices (none exist
      // under symmetric closure, but the shape stays total either way).
      val nbrMin = sym
        .join(labels, sym("dst") === labels("v"))
        .groupBy(col("src").as("v2"))
        .agg(min(col("cluster_id")).as("nbr_min"))
      val next = labels
        .join(nbrMin, labels("v") === nbrMin("v2"), "left")
        .select(col("v"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"),
          (coalesce(col("nbr_min"), col("cluster_id")) < col("cluster_id"))
            .as("_chg"))
        .localCheckpoint()
      // One tiny driver-side scalar per pass; labels never leave the
      // executors. limit(1) short-circuits the scan on non-converged
      // passes.
      converged = next.filter(col("_chg")).limit(1).isEmpty
      labels = next.drop("_chg")
      pass += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: not converged after $maxIters passes " +
          "(graph diameter exceeds maxIters; raise it for long-chain graphs)")
    labels
  }

  /** Canonical-document dedup: drop every document that is a
    * NON-minimum member of its duplicate cluster. Documents absent from
    * the pair list are their own cluster and always survive. The
    * anti-join keys are the (few) cluster losers, so the corpus-side
    * table streams through one broadcast-able join at scale.
    */
  def keepCanonical(df: DataFrame, idCol: String, pairs: DataFrame,
      srcCol: String, dstCol: String): DataFrame = {
    val losers = connectedComponents(pairs, srcCol, dstCol)
      .filter(col("v") =!= col("cluster_id"))
      .select(col("v").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
