package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader for the driver-generated test tables (TESTDATA.md).
  * All queries read through here so scans stay uniform (vectorized parquet,
  * pushdown-friendly — no options that would disable the native reader).
  *
  * The `events` table has stored `ts` two ways across driver generations:
  * parquet TIMESTAMP(NANOS) — which Spark's reader rejects by default, so
  * `nanosAsLong` maps it to BIGINT nanos and we re-derive a microsecond
  * TimestampType (the same instant DuckDB sees; DuckDB truncates nanos
  * parquet to micros) — and plain TIMESTAMP(MICROS), which arrives as
  * TIMESTAMP_NTZ and only needs the cast to the session-zone type every
  * downstream query (and the UTC-session oracle parity) was built on.
  * Dispatch on the landed type so both generations read identically.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventsTs(df) else df
  }

  /** Normalize the `events.ts` column to session-zone TimestampType from
    * whichever physical form the parquet landed in (see the class doc).
    * Exposed for consumers that read the table outside [[apply]] — e.g. the
    * streaming specs staging the file for a `readStream` source. */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          timestamp_micros(floor(col("ts") / 1000L).cast("long")))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }

  /** Config key for the [[parallelized]] floor; unset/empty → the session's
    * `defaultParallelism` (32 locally, total executor cores on a cluster).
    * Settable per-session (`spark.conf.set`) or at submit time
    * (`--conf spark.graft.scan.minPartitions=N`) for workloads whose
    * kernel-heavy stages want more slices than cores — no code change. */
  val MinPartitionsKey = "spark.graft.scan.minPartitions"

  /** The floor [[parallelized]] enforces: the [[MinPartitionsKey]] conf when
    * set to a positive int, else `defaultParallelism`. */
  def scanFloor(spark: SparkSession): Int =
    spark.conf.getOption(MinPartitionsKey)
      .flatMap(_.toIntOption).filter(_ > 0)
      .getOrElse(spark.sparkContext.defaultParallelism)

  /** Right-size a narrow SCAN before kernel-heavy or expanding stages.
    *
    * A small parquet table is one file = ONE partition, which serializes
    * every codegen kernel (md5/minhash/dot-product) and everything pipelined
    * behind a broadcast join until the first shuffle. A no-op whenever the
    * input already has ≥ [[scanFloor]] partitions (any real cluster scale),
    * so no extra shuffle is ever paid at 100 TB. Apply at scan entry points
    * only — `rdd.getNumPartitions` on a raw scan is metadata; on a frame
    * with upstream exchanges it would trigger partial execution. */
  def parallelized(df: DataFrame): DataFrame = {
    val p = scanFloor(df.sparkSession)
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
