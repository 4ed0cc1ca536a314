package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class IoSpec extends AnyFunSuite with SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  private def sample = {
    import spark.implicits._
    Seq((1L, "a,b\"quoted\"", 1.5), (2L, null, -2.25), (3L, "plain", 0.0))
      .toDF("id", "name", "score")
  }

  test("csv round-trip preserves rows incl. quoting and nulls") {
    val dir = Files.createTempDirectory("io-csv").toString
    Io.writeCsv(sample, dir)
    val back = Io.readCsv(spark, dir, schema)
    assert(back.collect().toSet === sample.collect().toSet)
  }

  test("json round-trip preserves rows") {
    val dir = Files.createTempDirectory("io-json").toString
    Io.writeJson(sample, dir)
    val back = Io.readJson(spark, dir, schema)
    assert(back.collect().toSet === sample.collect().toSet)
  }

  test("orc round-trip preserves rows and pushes filters to the scan") {
    val dir = Files.createTempDirectory("io-orc").toString
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"n$i", i % 4)).toDF("id", "name", "bucket")
    Io.writeOrc(df, dir)
    val back = Io.readOrc(spark, dir)
    assert(back.collect().toSet === df.collect().toSet)
    // predicate pushdown reaches the ORC scan like parquet
    val plan = back.filter(col("id") === 7L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"), plan)
  }

  test("partitioned parquet round-trip prunes on the partition column") {
    val dir = Files.createTempDirectory("io-parq").toString
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"n$i", i % 4)).toDF("id", "name", "bucket")
    Io.writeParquet(df, dir, partitionByCols = Seq("bucket"))
    val back = Io.readParquet(spark, dir)
    assert(back.count() === 100L)
    // partition pruning: the filtered scan reads only bucket=2 directories
    val pruned = back.filter(col("bucket") === 2)
    assert(pruned.count() === 25L)
    val scanText = pruned.queryExecution.executedPlan.toString
    assert(scanText.contains("PartitionFilters") || pruned.inputFiles.forall(_.contains("bucket=2")))
  }

  test("shard sink: one file per shard, rows in training order within it") {
    val dir = Files.createTempDirectory("io-shards").toString
    val assigned = graft.ops.Curation.q70ShuffleShards(spark, "/root/testdata/sf0.001")
    Io.writeShards(assigned, dir)
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.length === graft.ops.Curation.ShuffleShards)
    var total = 0L
    shardDirs.foreach { sd =>
      val parts = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1, s"${sd.getName}: a shard must be ONE sorted file")
      // within-file row order IS the training order: pos reads back 1..n
      val pos = spark.read.parquet(parts.head.getPath)
        .select("pos").collect().map(_.getLong(0))
      assert(pos.toSeq === (1L to pos.length.toLong), s"${sd.getName} out of order")
      total += pos.length
    }
    assert(total === assigned.count())
  }

  test("overwrite replaces prior contents (reference S3 semantics)") {
    val dir = Files.createTempDirectory("io-ow").toString
    Io.writeParquet(sample, dir)
    Io.writeParquet(sample.limit(1), dir)
    assert(Io.readParquet(spark, dir).count() === 1L)
  }
}
