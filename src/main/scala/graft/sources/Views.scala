package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL face of the engine: register every driver table as a Spark SQL
  * temp view under its canonical name, so the whole library surface is
  * reachable through `spark.sql(...)` — `SELECT ... FROM lineitem JOIN
  * orders ...` works exactly as the DataFrame formulations do (same
  * loaders, same events-ts normalization, same session). Views are
  * lazy: registration costs nothing until a SQL query scans one.
  *
  * `sql` is a register-then-run convenience for one-shot callers (the
  * ViewsSpec drives a join + agg through it and pins equality with the
  * DataFrame plan, including the physical plan being broadcast-joined
  * the same way — SQL text and DataFrame code meet in the same Catalyst
  * planner, one of the reasons the rebuild is Spark-first). */
object Views {

  def register(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach { n =>
      Tables(spark, sfDir, n).createOrReplaceTempView(n)
    }

  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    register(spark, sfDir)
    spark.sql(query)
  }
}
