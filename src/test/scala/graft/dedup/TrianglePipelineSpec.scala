package graft.dedup

import graft.{SparkSpec, Tables}
import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrianglePipelineSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def naiveSet: Set[(Long, Long)] =
    DedupPipeline
      .candidatePairs(Tables(spark, sf, "customer"), Dedup.customerConfig)
      .select("id1", "id2")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

  private def triangleSet(k: Int): Set[(Long, Long)] =
    TrianglePipeline
      .pairFeatures(Tables(spark, sf, "customer"), Dedup.customerConfig, k)
      .select("id1", "id2")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

  test("triangle pipeline emits the same pair set as the declarative self-join, for several k") {
    val expected = naiveSet
    assert(expected.nonEmpty)
    for (k <- Seq(1, 7, 32)) {
      val got = triangleSet(k)
      assert(got.size === expected.size, s"k=$k sizes")
      assert(got === expected, s"k=$k sets")
    }
  }

  test("triangle pipeline emits each pair exactly once (no duplicate rows)") {
    val rows = TrianglePipeline
      .pairFeatures(Tables(spark, sf, "customer"), Dedup.customerConfig, 13)
      .groupBy("id1", "id2")
      .count()
      .filter(col("count") > 1)
      .count()
    assert(rows === 0L)
  }

  test("pair generation keeps >= max(k, parallelism) reducer partitions (AQE-coalesce-proof)") {
    // the reducer's input is tiny but its output quadratic: partition count
    // must come from the PLAN (explicit HashPartitioner), never from
    // input-byte-sized decisions — a regression here serializes the
    // quadratic stage (measured 6x on the sf0.1 gate)
    val pairs = TrianglePipeline
      .pairs(Tables(spark, sf, "customer"), Dedup.customerConfig, k = 8)
    val expected = math.max(8, spark.sparkContext.defaultParallelism)
    assert(pairs.rdd.getNumPartitions >= expected)
  }

  test("features match the declarative pipeline row-for-row") {
    val a = DedupPipeline
      .pairFeatures(Tables(spark, sf, "customer"), Dedup.customerConfig)
      .orderBy("id1", "id2").collect()
    val b = TrianglePipeline
      .pairFeatures(Tables(spark, sf, "customer"), Dedup.customerConfig, 16)
      .orderBy("id1", "id2").collect()
    assert(a.length === b.length)
    for ((ra, rb) <- a.zip(b)) assert(ra === rb)
  }
}
