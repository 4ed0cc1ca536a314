package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.1): schema-explicit readers — schema
  * inference is a full extra pass over the data at 100 TB, so every reader
  * takes a StructType — and overwrite-mode writers (SaveMode.Overwrite
  * subsumes the reference's delete-then-write,
  * `GenerateLabeledPoints.scala:103-107`).
  */
object Io {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC sink — the other columnar interchange format (predicate pushdown
    * and column pruning work the same as parquet; see IoSpec round-trip).
    * Parquet stays the default; ORC exists for ecosystems standardized on
    * it. */
  def writeOrc(df: DataFrame, path: String, partitionByCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionByCols.nonEmpty) w.partitionBy(partitionByCols: _*) else w)
      .orc(path)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Parquet is the scale sink: columnar, min/max-pruned, splittable.
    * `partitionByCols` produces hive-style directory partitioning — the
    * layout that lets downstream scans prune entire partitions. */
  def writeParquet(df: DataFrame, path: String, partitionByCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionByCols.nonEmpty) w.partitionBy(partitionByCols: _*) else w)
      .parquet(path)
  }

  /** Training-shard sink — the output half of the deterministic corpus
    * shuffle (`graft.ops.Curation.q70ShuffleShards`): rows hash-exchange to
    * their shard and sort within it, then write hive-partitioned by the
    * shard column. Because the exchange keys on the shard value, every
    * shard lands in exactly one task, so each `shard=K` directory holds ONE
    * parquet file whose row order is the training order — a reader streams
    * shard files sequentially with no further sort. Parquet preserves
    * within-file row order (row groups in write order), so the contract
    * survives the round trip (IoSpec). At 100 TB the per-task spill-sort is
    * bounded by corpus / shard-count; shard count is the knob. */
  def writeShards(df: DataFrame, path: String, shardCol: String = "shard",
                  orderCols: Seq[String] = Seq("pos")): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(col(shardCol))
      .sortWithinPartitions((shardCol +: orderCols).map(col): _*)
      .write.mode(SaveMode.Overwrite).partitionBy(shardCol).parquet(path)
  }

  /** Bucketed managed table: pre-shuffles rows into `numBuckets` hash
    * buckets of `bucketCols` AT WRITE TIME, so every later equi-join or
    * aggregation on those columns plans with NO exchange (see
    * BucketingSpec) — the pre-partitioning lever for repeatedly-joined
    * 100 TB fact tables. Bucket metadata lives in the catalog, hence
    * `saveAsTable` rather than a path write; `sortCols` additionally
    * pre-sorts within buckets so sort-merge joins skip their sort. */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
                    bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
