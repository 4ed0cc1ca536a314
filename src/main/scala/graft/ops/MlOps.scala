package graft.ops

import graft.ml.DedupMl
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ML-surface query for the driver gate: trains the duplicate classifier on
  * a deterministic slice of the customer pair-features (heuristic labels —
  * the test tables carry no ground truth) and scores it. Not
  * SQL-expressible, so it has no DuckDB oracle (rows-only check); the real
  * reference-parity ML validation lives in graft.ml.FebrlMlSpec against the
  * Febrl fixtures.
  */
object MlOps {

  /** q54: the deterministic 10k-pair feature slice that feeds q33's
    * classifier — plain SQL (blocking self-join + comparators + top-k by
    * id), so unlike the GBT scores it IS fully oracle-checkable. Keeping it
    * as its own gate query means q33's only unchecked part is the model
    * output itself. The pair LIMIT is applied before feature projection so
    * the comparator kernel runs on 10k pairs, not the full candidate set. */
  def q54DupFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.Tables
    import graft.dedup.DedupPipeline
    // deterministic training slice: bounds candidate generation at any sf
    // (covers all of sf0.01; a demo classifier doesn't need every pair)
    val customer = Tables(spark, sfDir, "customer")
      .filter(col("c_custkey") < 3000)
    val cfg = Dedup.customerConfig
    val pairIds = DedupPipeline.candidatePairs(customer, cfg)
      .select("id1", "id2").orderBy("id1", "id2").limit(10000)
    // when/otherwise (not a bare cast) so a NULL name_sim labels 0.0 like
    // the oracle's CASE — unreachable on non-null TPC-H names, but the
    // config is reusable on nullable columns
    DedupPipeline.featuresFor(customer, cfg, pairIds)
      .withColumn("label", when(col("name_sim") > 0.55, 1.0).otherwise(0.0))
  }

  val q54DupFeaturesSql: String = """
    WITH cust AS (SELECT * FROM customer WHERE c_custkey < 3000),
    bkv AS (
      SELECT c_custkey AS id, 1 AS k, trim(CAST(c_nationkey AS VARCHAR)) AS v FROM cust
      UNION ALL
      SELECT c_custkey, 2, trim(right(c_name, 2)) FROM cust
    ), pair AS (
      SELECT a.id AS id1, b.id AS id2
      FROM bkv a JOIN bkv b ON a.k = b.k AND a.v = b.v AND a.id < b.id
      GROUP BY 1, 2
      ORDER BY 1, 2 LIMIT 10000
    )
    SELECT p.id1, p.id2,
      CASE WHEN length(trim(t1.c_name)) = 0 AND length(trim(t2.c_name)) = 0 THEN 1.0
           ELSE 1.0 - CAST(levenshtein(trim(t1.c_name), trim(t2.c_name)) AS DOUBLE)
                / greatest(length(trim(t1.c_name)), length(trim(t2.c_name))) END AS name_sim,
      CASE WHEN length(trim(t1.c_mktsegment)) = 0 AND length(trim(t2.c_mktsegment)) = 0 THEN 1.0
           ELSE 1.0 - CAST(levenshtein(trim(t1.c_mktsegment), trim(t2.c_mktsegment)) AS DOUBLE)
                / greatest(length(trim(t1.c_mktsegment)), length(trim(t2.c_mktsegment))) END AS seg_sim,
      abs(t1.c_acctbal - t2.c_acctbal) AS bal_diff,
      CASE WHEN (CASE WHEN length(trim(t1.c_name)) = 0 AND length(trim(t2.c_name)) = 0 THEN 1.0
           ELSE 1.0 - CAST(levenshtein(trim(t1.c_name), trim(t2.c_name)) AS DOUBLE)
                / greatest(length(trim(t1.c_name)), length(trim(t2.c_name))) END) > 0.55
           THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS label
    FROM pair p
    JOIN cust t1 ON p.id1 = t1.c_custkey
    JOIN cust t2 ON p.id2 = t2.c_custkey
  """

  /** q33: train (seeded GBT, small) + score — M1-M7 end-to-end over the
    * [[q54DupFeatures]] slice (which carries its own full value-level
    * oracle; only the scored output here is rows-only). */
  def q33DupScore(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = Seq("name_sim", "seg_sim", "bal_diff")
    val pairs = q54DupFeatures(spark, sfDir)
    val ml = graft.CachedFrames.track(DedupMl.toMlFrame(pairs, feats))
    val (model, _) = DedupMl.train(ml, maxIter = 5)
    DedupMl.score(model, ml)
  }
}
