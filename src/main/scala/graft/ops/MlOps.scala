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

  /** q33: train (seeded GBT, small) + score — M1-M7 end-to-end. */
  def q33DupScore(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = Seq("name_sim", "seg_sim", "bal_diff")
    val pairs = Dedup.pairsNaive(spark, sfDir)
      .withColumn("label", (col("name_sim") > 0.55).cast("double"))
      .orderBy("id1", "id2")
      .limit(10000)
    val ml = DedupMl.toMlFrame(pairs, feats).cache()
    val (model, _) = DedupMl.train(ml, maxIter = 5)
    DedupMl.score(model, ml)
  }
}
