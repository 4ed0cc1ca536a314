package graft.dedup

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import scala.collection.mutable

/** Entity clustering: connected components over accepted duplicate pairs —
  * the step after the reference's pipeline (pairs → classifier → entities).
  *
  * Two physical strategies behind one contract (the standard shape for
  * production CC — e.g. Kiveris et al., "Connected Components in MapReduce
  * and Beyond", SoCC'14 finish small graphs locally):
  *
  *  - **single-task union-find** when the edge list fits one executor task
  *    (≤ `localThreshold` edges, default 5M ≈ hundreds of MB of hash-map).
  *    The dup-pair graph is the OUTPUT of the similarity filter, orders of
  *    magnitude smaller than the corpus, so this is the common case even at
  *    100 TB corpus scale — and it removes all per-iteration job overhead.
  *  - **iterative min-label propagation + pointer doubling** above the
  *    threshold: label(v) ← min over neighbours, then label(v) ←
  *    label(label(v)), until fixpoint — O(log diameter) rounds, exactly two
  *    shuffle joins + one trivial aggregate per round. Self-loop edges fold
  *    the "keep your own label" step into the neighbour-min aggregate and
  *    carry each vertex's OLD label out of it, so convergence detection is
  *    a filter-count over the just-checkpointed frame (no comparison join).
  *    `localCheckpoint` every round truncates lineage so plans stay
  *    constant-size at any round count.
  *
  * Both paths emit identical output (component = minimum member id under
  * the column type's ordering); `ClusteringSpec` asserts the equivalence.
  */
object Clustering {

  /** @param pairs (id1, id2) accepted duplicate pairs (any orientation)
    * @param localThreshold edge count at or below which the single-task
    *        union-find runs instead of the iterative loop
    * @return (id, component) — component is the minimum member id;
    *         only ids appearing in pairs are returned (singletons are
    *         their own trivial entity). */
  def connectedComponents(
      pairs: DataFrame,
      maxIter: Int = 20,
      localThreshold: Long = 5000000L): DataFrame = {
    val sym = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .union(pairs.select(col("id2"), col("id1")))
      .distinct()
      .localCheckpoint()
    val edgeCount = sym.count()
    if (edgeCount <= localThreshold) return localUnionFind(sym)
    // size the iteration shuffles to the graph, not the session default —
    // per-round overhead dominates when the vertex set is far smaller than
    // the input that produced it
    val parallelism = math.max(1, math.min(
      pairs.sparkSession.sparkContext.defaultParallelism,
      (edgeCount / 500000L).toInt + 1))
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

  /** INCREMENTAL connected components — update a standing (id, component)
    * assignment with a batch of NEW edges, reading only the standing
    * table and the delta (never the base edge list): the incremental face
    * of [[connectedComponents]], and the missing piece between the
    * LSH-band admission (which emits a batch's incident candidate pairs —
    * `lshAdmitAgainstIndex`) and cluster-level consumers (q131's keeper
    * election, canonical-doc routing).
    *
    * HOW: because `component` is the MINIMUM member id, every standing
    * component is internally connected by construction, so connectivity
    * over base ∪ delta factors through the CONTRACTION graph — each new
    * edge's endpoints mapped to their standing component label (or
    * themselves when unseen). CC runs on that graph only
    * (O(|delta|) edges), and its min-label output is exact: the min over
    * a merged group of labels-that-are-mins IS the global min member id,
    * so the result equals the from-scratch `connectedComponents` of
    * base ∪ delta edges, row for row (the ClusteringSpec law and q265's
    * DuckDB oracle).
    *
    * Scale shape: the corpus-sized standing table is touched by exactly
    * ONE broadcast join against the relabel map (components whose label
    * changed — bounded by 2·|delta| regardless of corpus size, so the
    * broadcast is delta-sized); the only iterative work is CC over the
    * contracted delta. Nothing re-reads base text or base edges, and
    * untouched components pass through byte-identical.
    *
    * @param standing (id, component) — a [[connectedComponents]] result
    *        (component = min member id; singletons may be absent, they
    *        are their own trivial component)
    * @param newPairs (id1, id2) new edges (any orientation); endpoints
    *        may be standing ids, brand-new ids, or a mix
    * @return (id, component) for standing ids ∪ delta endpoints */
  def incrementalComponents(standing: DataFrame,
      newPairs: DataFrame): DataFrame = {
    val s1 = standing.select(col("id").as("id1"), col("component").as("c1"))
    val s2 = standing.select(col("id").as("id2"), col("component").as("c2"))
    val contracted = newPairs
      .join(s1, Seq("id1"), "left")
      .join(s2, Seq("id2"), "left")
      .select(coalesce(col("c1"), col("id1")).as("id1"),
        coalesce(col("c2"), col("id2")).as("id2"))
    // (old label | new id) -> merged min label, delta-sized
    val merged = connectedComponents(contracted)
    // standing components whose label changes — ≤ 2·|delta| rows
    val relabel = broadcast(merged
      .filter(col("id") =!= col("component"))
      .select(col("id").as("component"), col("component").as("newc")))
    val updatedStanding = standing.join(relabel, Seq("component"), "left")
      .select(col("id"),
        coalesce(col("newc"), col("component")).as("component"))
    // delta endpoints the standing table has never seen get their merged
    // label directly (each appears in the contracted graph by definition)
    val newIds = newPairs.select(col("id1").as("id"))
      .union(newPairs.select(col("id2")))
      .distinct()
      .join(standing.select(col("id")), Seq("id"), "left_anti")
    val newAssigned = newIds
      .join(merged.withColumnRenamed("id", "mid"),
        newIds("id") === col("mid"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
    updatedStanding.unionByName(newAssigned)
  }

  /** Path-compressed union-find over the whole (small) edge list in ONE
    * executor task — no driver collect, no per-iteration jobs. Id ordering
    * must MATCH Spark's `min` so both strategies pick the same component
    * representative: for strings that is UTF8String's binary order
    * (unsigned UTF-8 bytes), which differs from Java's UTF-16
    * `String.compareTo` for supplementary-plane characters; numeric types
    * use their natural ordering. */
  private def localUnionFind(sym: DataFrame): DataFrame = {
    val spark = sym.sparkSession
    val idType = sym.schema("src").dataType
    val outSchema = StructType(Seq(
      org.apache.spark.sql.types.StructField("id", idType),
      org.apache.spark.sql.types.StructField("component", idType)))
    def lt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: String, y: String) =>
        val xb = x.getBytes("UTF-8")
        val yb = y.getBytes("UTF-8")
        val n = math.min(xb.length, yb.length)
        var i = 0
        while (i < n) {
          val c = (xb(i) & 0xff) - (yb(i) & 0xff)
          if (c != 0) return c < 0
          i += 1
        }
        xb.length < yb.length
      case _ => a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    }
    val rows = sym.rdd.coalesce(1).mapPartitions { it =>
      val parent = mutable.HashMap.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      def add(x: Any): Unit = if (!parent.contains(x)) parent(x) = x
      it.foreach { row =>
        val a = row.get(0)
        val b = row.get(1)
        add(a); add(b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(rb) = ra
      }
      // component label = min member id per root
      val minOf = mutable.HashMap.empty[Any, Any]
      parent.keysIterator.foreach { m =>
        val r = find(m)
        if (!minOf.contains(r) || lt(m, minOf(r))) minOf(r) = m
      }
      parent.keysIterator.map(m => Row(m, minOf(find(m))))
    }
    spark.createDataFrame(rows, outSchema)
  }
}
