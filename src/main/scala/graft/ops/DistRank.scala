package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Two-phase BUCKETED RANK — the distributed replacement for
  * `row_number()` over a global (or per-group) total order, the q59
  * prefix-sum idiom (`TextOps.distributedRunningSum`) specialized to ranks.
  *
  * A bare `Window.orderBy(...)` (or a `partitionBy(g)` whose one group
  * dominates) ships every row to ONE task and sorts there — the textbook
  * one-task bottleneck at 10⁸+ rows. This helper instead:
  *
  *   1. broadcasts per-group [lo, hi] bounds of the order key and assigns
  *      each row a RANGE bucket `_bkt` (a monotone function of the key, so
  *      bucket order == key order and ties never straddle buckets);
  *   2. ranks within (group, _bkt) — B-way parallel per group;
  *   3. derives per-bucket counts from that same exchange, turns them into
  *      cumulative offsets with a tiny ≤ |groups|·B-row triangular
  *      self-join (NO single-partition window anywhere in the plan), and
  *      broadcasts the offsets back: `rank = offset + local row_number`.
  *
  * The result is byte-identical to the window form for any total order
  * (callers must pass tie-break columns that make the order total).
  * Degenerate distributions (every key equal) collapse to one bucket —
  * i.e. no worse than the window they replace.
  */
object DistRank {

  /** Range buckets per group — the B-way parallelism of the rank stage.
    * 32 matches the suite's shuffle parallelism; at cluster scale this is
    * "tasks per group", not a correctness knob. */
  val RankBuckets = 32

  /** Adds BIGINT column `rankName` = 1-based rank of each row in the total
    * order (orderCol ASC, tieCols ASC) within its `groupCols` group
    * (empty = one global order). Temp columns are dropped; the input
    * column set passes through unchanged. */
  private[graft] def withBucketedRank(df: DataFrame, groupCols: Seq[String],
      orderCol: String, tieCols: Seq[String], rankName: String,
      buckets: Int = RankBuckets): DataFrame = {
    val gc = groupCols.map(col)
    val bounds = df.groupBy(gc: _*)
      .agg(min(col(orderCol)).as("_lo"), max(col(orderCol)).as("_hi"))
      .select(groupCols.map(c => col(c).as(s"_b_$c")) :+ col("_lo")
        :+ col("_hi"): _*)
    val joined =
      if (groupCols.isEmpty) df.crossJoin(broadcast(bounds))
      else df.join(broadcast(bounds),
        groupCols.map(c => col(c) <=> col(s"_b_$c")).reduce(_ && _))
    val integral = df.schema(orderCol).dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    // _bkt is wrapped non-nullable ON PURPOSE (the q59 lesson): a nullable
    // _bkt makes the counts branch's exchange canonically unequal to the
    // rank branch's, and AQE re-scans the corpus instead of reusing it
    val bkt = coalesce(
      if (integral)
        expr(s"($orderCol - _lo) DIV (((_hi - _lo) DIV $buckets) + 1)")
      else
        when(col("_hi") <= col("_lo"), lit(0L)).otherwise(least(
          lit((buckets - 1).toLong),
          floor((col(orderCol) - col("_lo")) / (col("_hi") - col("_lo"))
            * buckets).cast("long"))),
      lit(0L))
    val bucketed = joined.withColumn("_bkt", bkt)
      .drop((groupCols.map(c => s"_b_$c") :+ "_lo" :+ "_hi"): _*)
    val w = Window.partitionBy((gc :+ col("_bkt")): _*)
      .orderBy((orderCol +: tieCols).map(col): _*)
    val local = bucketed.withColumn("_lr", row_number().over(w).cast("long"))
    // cumulative offsets WITHOUT a window: a triangular self-join over the
    // ≤ |groups|·B-row counts frame keeps "Exchange SinglePartition" /
    // untagged Sort out of the plan even in the ungrouped case
    val counts = local.groupBy((gc :+ col("_bkt")): _*)
      .agg(count(lit(1)).as("_cnt"))
    val prev = counts.select(groupCols.map(c => col(c).as(s"_p_$c"))
      :+ col("_bkt").as("_pbkt") :+ col("_cnt").as("_pcnt"): _*)
    val offsets = counts.join(prev,
        groupCols.map(c => col(c) <=> col(s"_p_$c"))
          .foldLeft(col("_pbkt") < col("_bkt"))(_ && _), "left")
      .groupBy((gc :+ col("_bkt")): _*)
      .agg(coalesce(sum(col("_pcnt")), lit(0L)).as("_off"))
      .select(groupCols.map(c => col(c).as(s"_o_$c"))
        :+ col("_bkt").as("_obkt") :+ col("_off"): _*)
    local.join(broadcast(offsets),
        groupCols.map(c => col(c) <=> col(s"_o_$c"))
          .foldLeft(col("_bkt") === col("_obkt"))(_ && _))
      .withColumn(rankName, col("_lr") + col("_off"))
      .drop((groupCols.map(c => s"_o_$c")
        :+ "_obkt" :+ "_bkt" :+ "_lr" :+ "_off"): _*)
  }

  /** ANSI `ntile(buckets)` as pure integer arithmetic over a precomputed
    * rank: with n rows, the first n%B buckets take ⌈n/B⌉ rows, the rest
    * ⌊n/B⌋ — byte-identical to the window function (NOT the uniform
    * `floor(B·(rank−1)/n)+1`, which mis-sizes the tail buckets whenever
    * B ∤ n). `rank`/`n` are column NAMES of BIGINTs in scope; the
    * zero-divisor branch is unreachable (rank ≤ n keeps q=0 rows in the
    * first arm) and CASE evaluates lazily, so ANSI mode never trips. */
  private[graft] def ntileOfRank(rank: String, n: String, buckets: Int): Column =
    expr(s"""CAST(CASE
      WHEN $rank <= ($n % $buckets) * (($n DIV $buckets) + 1)
      THEN ($rank - 1) DIV (($n DIV $buckets) + 1) + 1
      ELSE ($n % $buckets)
        + ($rank - ($n % $buckets) * (($n DIV $buckets) + 1) - 1)
          DIV ($n DIV $buckets) + 1
      END AS INT)""")
}
