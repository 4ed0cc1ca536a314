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

  /** q33: train (seeded GBT, small) + score — M1-M7 end-to-end. The pair
    * LIMIT is applied before feature projection so the comparator kernel
    * runs on 10k pairs, not the full candidate set. */
  def q33DupScore(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.Tables
    import graft.dedup.DedupPipeline
    val feats = Seq("name_sim", "seg_sim", "bal_diff")
    // deterministic training slice: bounds candidate generation at any sf
    // (covers all of sf0.01; a demo classifier doesn't need every pair)
    val customer = Tables(spark, sfDir, "customer")
      .filter(col("c_custkey") < 3000)
    val cfg = Dedup.customerConfig
    val pairIds = DedupPipeline.candidatePairs(customer, cfg)
      .select("id1", "id2").orderBy("id1", "id2").limit(10000)
    val pairs = DedupPipeline.featuresFor(customer, cfg, pairIds)
      .withColumn("label", (col("name_sim") > 0.55).cast("double"))
    val ml = graft.CachedFrames.track(DedupMl.toMlFrame(pairs, feats))
    val (model, _) = DedupMl.train(ml, maxIter = 5)
    DedupMl.score(model, ml)
  }
}
