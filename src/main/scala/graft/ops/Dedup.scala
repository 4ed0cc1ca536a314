package graft.ops

import graft.Tables
import graft.dedup._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup (entity-resolution) queries over the driver's test tables —
  * the reference's flagship semantics re-targeted at `customer`
  * (FIXTURES.md §2 steers dedup-style queries at c_name / c_nationkey so
  * the DuckDB oracle stays expressible via its `levenshtein()`).
  */
object Dedup {

  /** Blocking fn #1 = nation key (priority), #2 = last two chars of the name
    * (overlapping, so the exactly-once guard is actually exercised); three
    * features mirroring the reference comparator kinds (Levenshtein ×2 +
    * numeric diff).
    */
  val customerConfig: DedupConfig = DedupConfig(
    idColumn = "c_custkey",
    blockingKeys = Seq(col("c_nationkey"), expr("right(c_name, 2)")),
    features = Seq(
      Feature("name_sim", "c_name", Comparators.levSim),
      Feature("seg_sim", "c_mktsegment", Comparators.levSim),
      Feature("bal_diff", "c_acctbal", (a, b) => abs(a - b))
    ))

  /** Declarative (inverted-index self-join) variant — the Catalyst-planned
    * physical strategy. */
  def pairsNaive(spark: SparkSession, sfDir: String): DataFrame =
    DedupPipeline
      .pairFeatures(Tables(spark, sfDir, "customer"), customerConfig)

  /** Triangle (skew-managed) physical variant — same pair set and features
    * as [[pairsNaive]], so it shares the same oracle; k=32 mirrors the
    * local[32] execution slots. */
  def pairsTriangle(spark: SparkSession, sfDir: String): DataFrame =
    TrianglePipeline
      .pairFeatures(Tables(spark, sfDir, "customer"), customerConfig, k = 32)

  /** Entity clustering: connected components over high-similarity customer
    * pairs (name_sim ≥ 0.9) — the step after pair scoring. The oracle
    * reproduces the fixpoint with a recursive reachability CTE. Uses a
    * single-feature config so only the one comparator the filter needs is
    * evaluated over the candidate pairs. */
  def entityClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val cfg = customerConfig.copy(features =
      customerConfig.features.filter(_.name == "name_sim"))
    // persist is a deliberate pushdown barrier: without it Catalyst merges
    // the sim threshold into the join condition AHEAD of the cheap id<
    // guard, evaluating levenshtein for both orientations of every
    // candidate (2x the comparator work)
    val pairs = DedupPipeline
      .pairFeatures(Tables(spark, sfDir, "customer"), cfg)
      .persist()
    // connectedComponents consumes pairs EAGERLY (its result is
    // localCheckpoint-backed), so the cache can be released right away
    try graft.dedup.Clustering.connectedComponents(
      pairs.filter(col("name_sim") >= 0.9).select("id1", "id2"))
    finally pairs.unpersist(false)
  }

  val entityClustersSql: String = """
    WITH RECURSIVE p AS (
      SELECT id1, id2 FROM (
        WITH bkv AS (
          SELECT c_custkey AS id, 1 AS k, trim(CAST(c_nationkey AS VARCHAR)) AS v FROM customer
          UNION ALL
          SELECT c_custkey, 2, trim(right(c_name, 2)) FROM customer
        ), pair AS (
          SELECT a.id AS id1, b.id AS id2
          FROM bkv a JOIN bkv b ON a.k = b.k AND a.v = b.v AND a.id < b.id
          GROUP BY 1, 2
        )
        SELECT pr.id1, pr.id2,
          CASE WHEN length(trim(t1.c_name)) = 0 AND length(trim(t2.c_name)) = 0 THEN 1.0
               ELSE 1.0 - CAST(levenshtein(trim(t1.c_name), trim(t2.c_name)) AS DOUBLE)
                    / greatest(length(trim(t1.c_name)), length(trim(t2.c_name))) END AS name_sim
        FROM pair pr
        JOIN customer t1 ON pr.id1 = t1.c_custkey
        JOIN customer t2 ON pr.id2 = t2.c_custkey)
      WHERE name_sim >= 0.9),
    e AS (SELECT id1 AS src, id2 AS dst FROM p UNION SELECT id2, id1 FROM p),
    nodes AS (SELECT DISTINCT src AS id FROM e),
    reach(a, b) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src)
    SELECT a AS id, min(b) AS component FROM reach GROUP BY a
  """

  val pairsOracleSql: String = """
    WITH bkv AS (
      SELECT c_custkey AS id, 1 AS k, trim(CAST(c_nationkey AS VARCHAR)) AS v FROM customer
      UNION ALL
      SELECT c_custkey, 2, trim(right(c_name, 2)) FROM customer
    ), pair AS (
      SELECT a.id AS id1, b.id AS id2
      FROM bkv a JOIN bkv b ON a.k = b.k AND a.v = b.v AND a.id < b.id
      GROUP BY 1, 2
    )
    SELECT p.id1, p.id2,
      CASE WHEN length(trim(t1.c_name)) = 0 AND length(trim(t2.c_name)) = 0 THEN 1.0
           ELSE 1.0 - CAST(levenshtein(trim(t1.c_name), trim(t2.c_name)) AS DOUBLE)
                / greatest(length(trim(t1.c_name)), length(trim(t2.c_name))) END AS name_sim,
      CASE WHEN length(trim(t1.c_mktsegment)) = 0 AND length(trim(t2.c_mktsegment)) = 0 THEN 1.0
           ELSE 1.0 - CAST(levenshtein(trim(t1.c_mktsegment), trim(t2.c_mktsegment)) AS DOUBLE)
                / greatest(length(trim(t1.c_mktsegment)), length(trim(t2.c_mktsegment))) END AS seg_sim,
      abs(t1.c_acctbal - t2.c_acctbal) AS bal_diff
    FROM pair p
    JOIN customer t1 ON p.id1 = t1.c_custkey
    JOIN customer t2 ON p.id2 = t2.c_custkey
    ORDER BY p.id1, p.id2
  """
}
