package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.GBTClassifier
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-classifier training / scoring on pair-feature frames — the
  * reference's TrainDupClassifier / ApplyDupClassifier (SURVEY.md §2.8,
  * `/root/reference/.../TrainDupClassifier.scala:44-132`,
  * `ApplyDupClassifier.scala:44-93`) as a DataFrame-native module.
  *
  * Differences from the reference, deliberate:
  *   - features stay a typed array column end-to-end (array_to_vector at the
  *     ML boundary) instead of CSV round-tripping;
  *   - the confusion matrix is ONE groupBy("label","prediction") pass, not
  *     4 filter+count jobs over an uncached frame (the reference re-scores
  *     the test set 5×, `TrainDupClassifier.scala:70-74`);
  *   - predictions keep their DataFrame lineage (no RDD downgrade) so the
  *     final global sort is a Catalyst range-partitioned SortExec.
  */
object DedupMl {

  /** Confusion-matrix-derived metrics (reference `TrainDupClassifier.scala:76-86`). */
  final case class Metrics(tp: Long, tn: Long, fp: Long, fn: Long) {
    def total: Long = tp + tn + fp + fn
    def accuracy: Double = (tp + tn).toDouble / total
    def precision: Double = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
    def recall: Double = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
    def f1: Double =
      if (precision + recall == 0) 0.0 else 2 * precision * recall / (precision + recall)
  }

  /** Pair-feature frame (id1, id2, label, f1..fn) → ML frame
    * (id, label, features: Vector). */
  def toMlFrame(pairs: DataFrame, featureCols: Seq[String]): DataFrame =
    pairs.select(
      concat_ws(",", col("id1").cast("string"), col("id2").cast("string")).as("id"),
      col("label").cast("double").as("label"),
      array_to_vector(array(featureCols.map(c => col(c).cast("double")): _*))
        .as("features"))

  /** M1-M3: 70/30 split + GBT pipeline fit (reference hyperparameters:
    * maxIter=100, maxDepth=3, seed=647 — `TrainDupClassifier.scala:49-61`). */
  def train(
      ml: DataFrame,
      maxIter: Int = 100,
      maxDepth: Int = 3,
      seed: Long = 647L): (PipelineModel, DataFrame) = {
    val Array(trainDf, testDf) = ml.randomSplit(Array(0.7, 0.3), seed)
    val gbt = new GBTClassifier()
      .setLabelCol("label").setFeaturesCol("features")
      .setMaxIter(maxIter).setMaxDepth(maxDepth)
      .setFeatureSubsetStrategy("auto").setSeed(seed)
    val model = new Pipeline().setStages(Array(gbt)).fit(trainDf)
    (model, testDf)
  }

  /** M4+A4+M5: score and reduce to a confusion matrix in one aggregation. */
  def evaluate(model: PipelineModel, testDf: DataFrame): Metrics = {
    val cells = model.transform(testDf)
      .groupBy(col("label"), col("prediction")).count()
      .collect()
      .map(r => ((r.getDouble(0), r.getDouble(1)), r.getLong(2)))
      .toMap
    Metrics(
      tp = cells.getOrElse((1.0, 1.0), 0L),
      tn = cells.getOrElse((0.0, 0.0), 0L),
      fp = cells.getOrElse((0.0, 1.0), 0L),
      fn = cells.getOrElse((1.0, 0.0), 0L))
  }

  /** M7+O2: score unlabeled pairs, project (id, prediction), global sort
    * (reference `ApplyDupClassifier.scala:74-82`). */
  def score(model: PipelineModel, ml: DataFrame): DataFrame =
    model.transform(ml)
      .select(col("id"), col("prediction"))
      .orderBy(col("prediction"), col("id"))
}
