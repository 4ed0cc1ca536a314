package graft.sources

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class ViewsSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("spark.sql over the registered views equals the DataFrame plan, " +
      "broadcast join included") {
    import org.apache.spark.sql.functions._
    val viaSql = Views.sql(spark, sf, """
      SELECT n.n_name AS nation, sum(o.o_totalprice) AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name""")
    val viaDf = graft.Tables(spark, sf, "orders")
      .join(graft.Tables(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(graft.Tables(spark, sf, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(sum(col("o_totalprice")).as("revenue"))
    val a = viaSql.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = viaDf.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a === b)
    assert(a.nonEmpty)
    // both texts land in the same planner: the SQL plan broadcast-joins
    // the dimension tables exactly like the DataFrame plan
    viaSql.queryExecution.toRdd.count()
    val p = viaSql.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("every driver table registers and is scannable through SQL") {
    Views.register(spark, sf)
    graft.Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT count(*) AS n FROM $n").head().getLong(0) > 0L, n)
    }
  }
}
