package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator library over the TPC-H-ish tables (SURVEY.md §2.2/2.4/
  * 2.6/2.7 generalized): each query is a DataFrame program with a DuckDB
  * oracle. Aggregate parity policy: sums over doubles are computed in exact
  * DECIMAL (associative — safe under any shuffle/partial-agg order) and cast
  * to DOUBLE at the end so both engines emit identical bits.
  */
object Relational {

  /** TPC-H Q1-shaped scan+filter+hash-aggregate over the fact table. */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("count_order"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(14,2)")).cast("double").as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(14,2)") *
          (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("sum_disc_price"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1AggSql: String = """
    SELECT l_returnflag, l_linestatus,
      count(*) AS count_order,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) *
               (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
  """
}
