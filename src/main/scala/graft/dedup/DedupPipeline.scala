package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dis-Dedup semantics, Spark-first.
  *
  * The reference's whole `GenerateLabeledPoints` job
  * (`/root/reference/.../GenerateLabeledPoints.scala:47-111`) is semantically a
  * *block self-join*: explode each tuple into its blocking keys, join tuples
  * sharing a key, compare each pair exactly once (in its lowest-ordinal shared
  * block), and project per-column similarity features.
  *
  * This file is the declarative formulation — an inverted-index self-join that
  * Catalyst plans with whole-stage codegen, partial aggregation and AQE skew
  * handling. At 100 TB this is the standard scalable candidate-generation
  * shape: the shuffle keys are (k, v) for the join and (id1, id2) for the
  * exactly-once dedup, both well-distributed unless one block dominates — in
  * which case [[TrianglePipeline]] (the reference's skew-aware physical
  * strategy) is the opt-in alternative.
  */
object DedupPipeline {

  /** (id, k, v) inverted index: one row per tuple per blocking key.
    * Reference: `Util.getBKVs` (Util.scala:45-58) — null key value ⇒ "".
    */
  def blockIndex(df: DataFrame, cfg: DedupConfig): DataFrame = {
    val bkvs = array(cfg.blockingKeys.zipWithIndex.map { case (c, i) =>
      struct(lit(i + 1).as("k"), coalesce(trim(c.cast("string")), lit("")).as("v"))
    }: _*)
    df.select(col(cfg.idColumn).as("id"), explode(bkvs).as("bkv"))
      .select(col("id"), col("bkv.k").as("k"), col("bkv.v").as("v"))
  }

  /** Distinct candidate pairs (id1 < id2) sharing at least one blocking key,
    * tagged with the lowest shared ordinal `bk` — each pair EXACTLY ONCE even
    * when it co-occurs in blocks of several blocking functions (reference
    * guard: `Compare.scala:94,106` + `Util.lowestCommonBlockNum`).
    *
    * Shape at scale: shuffle #1 on (k, v) for the self-join (AQE splits skewed
    * blocks), shuffle #2 on (id1, id2) for the min-aggregation; partial
    * aggregation runs map-side so replicated pairs collapse before the wire.
    */
  def candidatePairs(df: DataFrame, cfg: DedupConfig): DataFrame = {
    val idx = blockIndex(df, cfg)
    val a = idx.alias("a")
    val b = idx.alias("b")
    a.join(b,
        col("a.k") === col("b.k") && col("a.v") === col("b.v") &&
          col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(min(col("a.k")).as("bk"))
  }

  /** Join a pair list (id1, id2) back to the source tuples and project the
    * similarity features (+ optional ground-truth label). Shared by the naive
    * and triangle physical variants so feature semantics are defined once.
    */
  def featuresFor(df: DataFrame, cfg: DedupConfig, pairs: DataFrame): DataFrame = {
    val t1 = df.alias("t1")
    val t2 = df.alias("t2")
    val id1 = col("t1." + cfg.idColumn)
    val id2 = col("t2." + cfg.idColumn)
    val featCols: Seq[Column] = cfg.features.map { f =>
      f.cmp(col("t1." + f.column), col("t2." + f.column)).as(f.name)
    }
    val labelCols: Seq[Column] = cfg.label.toSeq.map(fn => fn(id1, id2).as("label"))
    pairs
      .join(t1, pairs("id1") === id1)
      .join(t2, pairs("id2") === id2)
      .select((Seq(pairs("id1"), pairs("id2")) ++ labelCols ++ featCols): _*)
  }

  /** End-to-end: blocking → exactly-once candidate pairs → feature projection.
    * Equivalent to one full run of the reference's flagship job, minus the
    * CSV encode at the sink (kept typed; encode belongs to the writer).
    */
  def pairFeatures(df: DataFrame, cfg: DedupConfig): DataFrame =
    featuresFor(df, cfg, candidatePairs(df, cfg).select("id1", "id2"))
}
