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

  /** Right-size a narrow input before the expanding block self-join.
    *
    * The join's OUTPUT is quadratic in block sizes, so its cost must be
    * spread across every core even when the INPUT is one small parquet file
    * (local test scales) or a handful of partitions — otherwise Spark
    * happily broadcast-joins the tiny index and evaluates millions of
    * comparator rows in a single task. When the input already has ≥
    * defaultParallelism partitions (any real cluster scale) this is a no-op,
    * so no extra shuffle is ever paid at 100 TB.
    */
  private[dedup] def parallelize(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

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

  /** Candidate pairs (id1 < id2) sharing at least one blocking key, tagged
    * with the lowest shared ordinal `bk` — each pair EXACTLY ONCE even when
    * it co-occurs in blocks of several blocking functions.
    *
    * Exactly-once uses the reference's own guard (`Compare.scala:94,106` +
    * `Util.lowestCommonBlockNum`) rather than a groupBy(id1, id2)
    * dedup — the groupBy formulation re-shuffles every replicated pair
    * (Σ n_b² rows) a second time, which dominated the 20k-record Febrl run.
    * Because two tuples can only share a block AT THE SAME ordinal (a
    * blocking function emits exactly one key per tuple), the lowest shared
    * ordinal is `min{ i : v_i(a) = v_i(b) }` — a chain of plain scalar
    * comparisons over the carried key-value columns, fully inside
    * whole-stage codegen (an earlier array-HOF formulation of this guard
    * evaluated interpreted lambdas per joined row and was 2× slower).
    *
    * Shape at scale: ONE shuffle on (k, v) for the self-join (AQE splits
    * skewed blocks); the guard is O(#blockingFns) codegen'd comparisons
    * per candidate.
    */
  def candidatePairs(df: DataFrame, cfg: DedupConfig): DataFrame = {
    val n = cfg.blockingKeys.size
    val keyCols = cfg.blockingKeys.zipWithIndex.map { case (c, i) =>
      coalesce(trim(c.cast("string")), lit("")).as(s"bv$i")
    }
    val bkvs = array((0 until n).map(i =>
      struct(lit(i + 1).as("k"), col(s"bv$i").as("v"))): _*)
    val idx = parallelize(df)
      .select(col(cfg.idColumn).as("id") +: keyCols: _*)
      .select(col("id") +: (0 until n).map(i => col(s"bv$i")) :+
        explode(bkvs).as("bkv"): _*)
      .select(col("id") +: (0 until n).map(i => col(s"bv$i")) :+
        col("bkv.k").as("k") :+ col("bkv.v").as("v"): _*)
    val a = idx.alias("a")
    val b = idx.alias("b")
    // lowest shared ordinal: first i (1-based) whose key values agree
    val lcb = (0 until n).foldRight(lit(Int.MaxValue)) { case (i, rest) =>
      when(col(s"a.bv$i") === col(s"b.bv$i"), lit(i + 1)).otherwise(rest)
    }
    a.join(b,
        col("a.k") === col("b.k") && col("a.v") === col("b.v") &&
          col("a.id") < col("b.id"))
      .filter(col("a.k") === lcb)
      .select(col("a.id").as("id1"), col("b.id").as("id2"), col("a.k").as("bk"))
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
    *
    * The comparator input columns ride THROUGH the block self-join (pruned
    * to exactly the columns the features need), so features project inline
    * off the join output — no join back to the source. At cluster scale
    * that removes two full-table shuffle joins; the cost is a modestly
    * wider payload in the one block shuffle.
    */
  def pairFeatures(df: DataFrame, cfg: DedupConfig): DataFrame = {
    val n = cfg.blockingKeys.size
    val featInputs = cfg.features.map(_.column).distinct
    val keyCols = cfg.blockingKeys.zipWithIndex.map { case (c, i) =>
      coalesce(trim(c.cast("string")), lit("")).as(s"bv$i")
    }
    val bkvs = array((0 until n).map(i =>
      struct(lit(i + 1).as("k"), col(s"bv$i").as("v"))): _*)
    val idx = parallelize(df)
      .select(col(cfg.idColumn).as("id") +: (keyCols ++ featInputs.map(col)): _*)
      .withColumn("bkv", explode(bkvs))
      .withColumn("k", col("bkv.k"))
      .withColumn("v", col("bkv.v"))
      .drop("bkv")
    val a = idx.alias("a")
    val b = idx.alias("b")
    val lcb = (0 until n).foldRight(lit(Int.MaxValue)) { case (i, rest) =>
      when(col(s"a.bv$i") === col(s"b.bv$i"), lit(i + 1)).otherwise(rest)
    }
    val featCols = cfg.features.map { f =>
      f.cmp(col("a." + f.column), col("b." + f.column)).as(f.name)
    }
    val labelCols = cfg.label.toSeq.map(fn => fn(col("a.id"), col("b.id")).as("label"))
    a.join(b,
        col("a.k") === col("b.k") && col("a.v") === col("b.v") &&
          col("a.id") < col("b.id"))
      .filter(col("a.k") === lcb)
      .select((Seq(col("a.id").as("id1"), col("b.id").as("id2")) ++
        labelCols ++ featCols): _*)
  }
}
