package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity clustering: connected components over accepted duplicate pairs —
  * the step after the reference's pipeline (pairs → classifier → entities).
  * Iterative minimum-label propagation:
  *
  *   label(v) ← min(label(v), min over neighbours' labels)
  *
  * run until a fixpoint. Per iteration: one shuffle join + one aggregate —
  * the standard large-graph CC shape (converges in O(diameter) rounds;
  * dedup graphs are near-cliques, so typically 2-3). `localCheckpoint`
  * every iteration truncates the growing lineage so plans stay constant
  * size at any round count.
  */
object Clustering {

  /** @param pairs (id1, id2) accepted duplicate pairs (any orientation)
    * @return (id, component) — component is the minimum member id;
    *         only ids appearing in pairs are returned (singletons are
    *         their own trivial entity). */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges0 = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .union(pairs.select(col("id2"), col("id1")))
      .distinct()
      .localCheckpoint()
    // size the iteration shuffles to the graph, not the session default —
    // per-round overhead dominates when the vertex set is far smaller than
    // the input that produced it
    val parallelism = math.max(1, math.min(
      pairs.sparkSession.sparkContext.defaultParallelism,
      (edges0.count() / 500000L).toInt + 1))
    val edges = edges0.repartition(parallelism, col("dst")).localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .repartition(parallelism, col("id"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // neighbour propagation: min label over adjacent vertices
      val neighbourMin = edges
        .join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("id2"))
        .agg(min(col("component")).as("ncomp"))
      val propagated = labels
        .join(neighbourMin, labels("id") === neighbourMin("id2"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("ncomp"), col("component")))
            .as("component"))
      // pointer doubling (path compression): jump to the component's own
      // component — turns O(diameter) convergence into O(log diameter),
      // which matters when near-dup chains form long paths
      val m = propagated.select(col("id").as("mid"), col("component").as("mcomp"))
      val next = propagated
        .join(m, propagated("component") === m("mid"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("mcomp"), col("component")))
            .as("component"))
        .localCheckpoint()
      val changed = next.alias("n")
        .join(labels.alias("o"), col("n.id") === col("o.id"))
        .filter(col("n.component") =!= col("o.component"))
        .count()
      labels = next
      converged = changed == 0L
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIter iterations")
    labels
  }
}
