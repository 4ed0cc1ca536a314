package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scan right-sizing floor: configurable via spark.graft.scan
  * .minPartitions, and — the 100 TB property — INERT when the input
  * already meets the floor (no repartition shuffle is ever added at
  * cluster scale, where scans arrive with thousands of partitions). */
class TablesSpec extends AnyFunSuite with SparkSpec {

  private def withFloor[A](v: Option[String])(body: => A): A = {
    val prev = spark.conf.getOption(Tables.MinPartitionsKey)
    try {
      v match {
        case Some(s) => spark.conf.set(Tables.MinPartitionsKey, s)
        case None    => spark.conf.unset(Tables.MinPartitionsKey)
      }
      body
    } finally {
      spark.conf.unset(Tables.MinPartitionsKey)
      prev.foreach(spark.conf.set(Tables.MinPartitionsKey, _))
    }
  }

  test("floor defaults to defaultParallelism; conf overrides; garbage ignored") {
    val dp = spark.sparkContext.defaultParallelism
    withFloor(None) { assert(Tables.scanFloor(spark) === dp) }
    withFloor(Some("7")) { assert(Tables.scanFloor(spark) === 7) }
    // non-numeric and non-positive values fall back rather than crash
    withFloor(Some("lots")) { assert(Tables.scanFloor(spark) === dp) }
    withFloor(Some("0")) { assert(Tables.scanFloor(spark) === dp) }
  }

  test("below the floor: repartitions up to exactly the floor") {
    val one = spark.range(0, 1000, 1, numPartitions = 1).toDF("id")
    withFloor(Some("6")) {
      val out = Tables.parallelized(one)
      assert(out.rdd.getNumPartitions === 6)
      assert(out.count() === 1000L)
    }
  }

  test("inert at scale: input at or above the floor passes through untouched") {
    val wide = spark.range(0, 1000, 1, numPartitions = 8).toDF("id")
    withFloor(Some("6")) {
      val out = Tables.parallelized(wide)
      // the SAME plan object — no repartition node, no shuffle added
      assert(out eq wide)
      assert(out.rdd.getNumPartitions === 8)
    }
    withFloor(Some("8")) { // boundary: equal to the floor is already enough
      assert(Tables.parallelized(wide) eq wide)
    }
  }
}
