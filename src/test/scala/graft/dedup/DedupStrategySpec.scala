package graft.dedup

import graft.{SparkSpec, Tables}
import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupStrategySpec extends AnyFunSuite with SparkSpec {

  test("maxBlockShare: uniform keys low, dominant key high") {
    import spark.implicits._
    val cfg = DedupConfig("id", Seq(col("b")), Seq.empty)
    val uniform = (1 to 100).map(i => (i.toLong, s"k${i % 10}")).toDF("id", "b")
    assert(DedupStrategy.maxBlockShare(uniform, cfg) < 0.2)
    val skewed = (1 to 100).map(i =>
      (i.toLong, if (i <= 80) "hot" else s"k$i")).toDF("id", "b")
    assert(DedupStrategy.maxBlockShare(skewed, cfg) > 0.9)
    val empty = Seq.empty[(Long, String)].toDF("id", "b")
    assert(DedupStrategy.maxBlockShare(empty, cfg) === 0.0)
  }

  test("auto strategy output equals both physical variants on real data") {
    val customer = Tables(spark, "/root/testdata/sf0.001", "customer")
    val auto = DedupStrategy
      .pairFeaturesAuto(customer, Dedup.customerConfig, k = 8)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = DedupPipeline.pairFeatures(customer, Dedup.customerConfig)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto === naive)
  }
}
