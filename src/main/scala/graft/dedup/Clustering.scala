package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity clustering: connected components over accepted duplicate pairs —
  * the step after the reference's pipeline (pairs → classifier → entities).
  * Iterative minimum-label propagation:
  *
  *   label(v) ← min(label(v), min over neighbours' labels)
  *
  * run until a fixpoint, with pointer doubling (label(v) ← label(label(v)))
  * each round so chains converge in O(log diameter) instead of O(diameter).
  *
  * Per-iteration cost is kept to exactly two shuffle joins plus one trivial
  * aggregate:
  *  - self-loop edges fold the "keep your own label" step into the
  *    neighbour-min aggregate (no separate left-join back onto labels);
  *  - the self-loop row also carries each vertex's OLD label through the
  *    aggregate, so convergence is detected by a trivial filter-count over
  *    the just-checkpointed frame — no change-comparison join against the
  *    previous labels.
  * `localCheckpoint` every iteration truncates the growing lineage so plans
  * stay constant size at any round count.
  */
object Clustering {

  /** @param pairs (id1, id2) accepted duplicate pairs (any orientation)
    * @return (id, component) — component is the minimum member id;
    *         only ids appearing in pairs are returned (singletons are
    *         their own trivial entity). */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .union(pairs.select(col("id2"), col("id1")))
      .distinct()
      .localCheckpoint()
    // size the iteration shuffles to the graph, not the session default —
    // per-round overhead dominates when the vertex set is far smaller than
    // the input that produced it
    val parallelism = math.max(1, math.min(
      pairs.sparkSession.sparkContext.defaultParallelism,
      (sym.count() / 500000L).toInt + 1))
    // self-loops: min over neighbours then includes the vertex's own label,
    // so propagation is a single join+aggregate with no left-join fixup
    val edges = sym
      .union(sym.select(col("src"), col("src").as("dst")).distinct())
      .repartition(parallelism, col("dst"))
      .localCheckpoint()
    // the self-loop rows ARE the vertex list: seed labels from the already
    // checkpointed edges (no extra distinct shuffle or checkpoint), and the
    // dst-alias keeps them co-partitioned with the propagation join key
    var labels = edges.filter(col("src") === col("dst"))
      .select(col("dst").as("id"), col("dst").as("component"))
    var iter = 0
    var converged = false
    val verbose = sys.props.contains("graft.cc.verbose") ||
      sys.env.contains("GRAFT_CC_VERBOSE")
    while (iter < maxIter && !converged) {
      val t0 = System.nanoTime()
      // neighbour propagation: min label over adjacent vertices. The
      // self-loop row contributes the vertex's own label (so min = new
      // label, no coalesce-with-old join) AND smuggles the old label out of
      // the aggregate for join-free change detection below.
      val propagated = edges
        .join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("id"))
        .agg(min(col("component")).as("component"),
          min(when(col("dst") === col("src"), col("component"))).as("old"))
      // pointer doubling (path compression): jump to the component's own
      // component — O(log diameter) convergence for long near-dup chains
      val m = propagated.select(col("id").as("mid"), col("component").as("mcomp"))
      val next = propagated
        .join(m, propagated("component") === m("mid"), "left")
        .select(col("id"), col("old"),
          least(col("component"), coalesce(col("mcomp"), col("component")))
            .as("component"))
        .localCheckpoint()
      // cheap scan of the just-checkpointed frame — no join with old labels
      val changed = next.filter(col("component") =!= col("old")).count()
      labels = next.select(col("id"), col("component"))
      converged = changed == 0L
      iter += 1
      if (verbose) println(
        f"PROBE cc_iter $iter changed=$changed ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    require(converged, s"connected components did not converge in $maxIter iterations")
    labels
  }
}
