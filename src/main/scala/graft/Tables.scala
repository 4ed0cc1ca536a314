package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader for the driver-generated test tables (TESTDATA.md).
  * All queries read through here so scans stay uniform (vectorized parquet,
  * pushdown-friendly — no options that would disable the native reader).
  *
  * The `events` table stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
  * reader rejects by default; `nanosAsLong` maps it to BIGINT nanos and we
  * re-derive a microsecond TimestampType `ts` (same instant DuckDB sees —
  * DuckDB also truncates nanos parquet to micros).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(floor(col("ts") / 1000L).cast("long")))
    else df
  }

  /** Right-size a narrow SCAN before kernel-heavy or expanding stages.
    *
    * A small parquet table is one file = ONE partition, which serializes
    * every codegen kernel (md5/minhash/dot-product) and everything pipelined
    * behind a broadcast join until the first shuffle. A no-op whenever the
    * input already has ≥ defaultParallelism partitions (any real cluster
    * scale), so no extra shuffle is ever paid at 100 TB. Apply at scan
    * entry points only — `rdd.getNumPartitions` on a raw scan is metadata;
    * on a frame with upstream exchanges it would trigger partial execution. */
  def parallelized(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
