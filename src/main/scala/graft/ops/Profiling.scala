package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality profiling over a table — the "what is actually in this
  * corpus" pass every curation run starts with (the Deequ/TFDV column-stats
  * family). One operator, two faces:
  *
  *   - [[q105Profile]]: EXACT per-column stats (rows, nulls, distinct,
  *     min/max) — the oracle-checkable contract;
  *   - [[profileApprox]]: the same projection with `approx_count_distinct`
  *     (HLL++) in place of the exact distinct — the bounded-state shape the
  *     streaming twin and a 100 TB profiler actually run, since HLL's
  *     accumulator is constant-size per column while the exact path's
  *     partial-aggregation hash map is sized by each column's distinct-value
  *     volume.
  *
  * Plan shape (both faces): `stack` unpivots the C columns into
  * (col_name, val) rows — a pure codegen projection, C× the row count but
  * read ONCE (one scan feeds every column's stats; C separate per-column
  * jobs would scan the table C times). The exact face then aggregates
  * twice: groupBy(col_name, val) with map-side partial aggregation (heavy
  * repeated values — enum-ish columns — collapse before the shuffle), then
  * groupBy(col_name) over the surviving distinct rows. The shuffled volume
  * is bounded by distinct-value volume, not corpus volume. The approx face
  * is ONE aggregation with constant-size accumulators — no second shuffle
  * at all.
  */
object Profiling {

  /** The profiled table. Values are compared in their canonical string cast
    * (injective for the integer/varchar columns profiled here) so one
    * (col_name, val) schema covers a heterogeneous column set — exactly how
    * a schema-generic profiler has to work. */
  private val ProfiledTable = "documents"

  private def unpivoted(df: DataFrame): DataFrame = {
    val stackArgs =
      df.columns.map(c => s"'$c', CAST(`$c` AS STRING)").mkString(", ")
    df.select(expr(s"stack(${df.columns.length}, $stackArgs) AS (col_name, val)"))
  }

  /** q105: exact column profile — (col_name, n_rows, n_null, n_distinct,
    * min_val, max_val), one row per column of the documents table. */
  def q105Profile(spark: SparkSession, sfDir: String): DataFrame =
    profileExactOn(Tables(spark, sfDir, ProfiledTable))

  /** The exact face over ANY frame — what the `cli.ProfileCorpus` job runs
    * on arbitrary parquet inputs; q105 is this on the documents table. */
  def profileExactOn(df: DataFrame): DataFrame =
    unpivoted(df)
      .groupBy(col("col_name"), col("val"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("col_name"))
      .agg(
        sum(col("cnt")).as("n_rows"),
        coalesce(sum(when(col("val").isNull, col("cnt"))), lit(0L)).as("n_null"),
        count(col("val")).as("n_distinct"),
        min(col("val")).as("min_val"),
        max(col("val")).as("max_val"))

  /** The bounded-state profile: identical projection with HLL++ distinct.
    * Deterministic for a fixed value set (the sketch hashes values, so
    * arrival order and partitioning don't change the estimate) — which is
    * what lets the streaming twin pin row-equality against THIS face while
    * q105 stays the exact oracle-checked one. */
  def profileApprox(docs: DataFrame): DataFrame =
    unpivoted(docs)
      .groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        coalesce(sum(when(col("val").isNull, 1L)), lit(0L)).as("n_null"),
        approx_count_distinct(col("val")).as("n_distinct_approx"),
        min(col("val")).as("min_val"),
        max(col("val")).as("max_val"))

  val q105ProfileSql: String = {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    cols.map { c =>
      s"""SELECT '$c' AS col_name, count(*)::BIGINT AS n_rows,
        (count(*) - count($c))::BIGINT AS n_null,
        count(DISTINCT $c::VARCHAR)::BIGINT AS n_distinct,
        min($c::VARCHAR) AS min_val, max($c::VARCHAR) AS max_val
      FROM documents"""
    }.mkString("\nUNION ALL\n")
  }
}
