package graft.sources


import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-table co-located join: writing both sides bucketed on the join
  * key lets the join run with NO shuffle exchange — the pre-partitioning
  * strategy for repeatedly-joined 100 TB fact tables. */
class BucketingSpec extends AnyFunSuite with SparkSpec {

  test("join between tables bucketed on the key plans without a shuffle") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lines")
    // a crashed prior run can leave the managed location behind without a
    // catalog entry — clear the physical paths too
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    for (t <- Seq("bkt_orders", "bkt_lines"))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh, t))

    Io.writeBucketed((1L to 1000L).map(i => (i, s"o$i")).toDF("k", "ov"),
      "bkt_orders", numBuckets = 8, bucketCols = Seq("k"), sortCols = Seq("k"))
    Io.writeBucketed((1L to 3000L).map(i => (i % 1000 + 1, s"l$i")).toDF("k", "lv"),
      "bkt_lines", numBuckets = 8, bucketCols = Seq("k"))

    // force the sort-merge path (tiny test tables would broadcast)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_orders").join(spark.table("bkt_lines"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan not used:\n$plan")
      assert(joined.count() === 3000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lines")
    }
  }
}
