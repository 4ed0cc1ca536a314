package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Thin registry: implementations live under graft.ops / graft.dedup.
  */
object SparkEntry {

  /** Flagship query (the reference's GenerateLabeledPoints semantics on the
    * customer table) on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Dedup.pairsNaive(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_pairs" -> (Dedup.pairsNaive _),
    "q1_agg" -> (Relational.q1Agg _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "dedup_pairs" -> Dedup.pairsOracleSql,
    "q1_agg" -> Relational.q1AggSql
  )
}
