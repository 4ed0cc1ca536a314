package graft
import org.apache.spark.sql.SparkSession

/** Diagnostic main: executes the named queries at sf0.001 and prints each
  * FINAL adaptive plan (unlike [[Explain]], which prints the pre-execution
  * plan where AQE reuse/coalesce decisions are not yet visible). Pairs with
  * [[PlanAudit]]: audit flags a query, this prints its tree for inspection.
  * Usage: runMain graft.DumpPlans q44_tf_df [more...]
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.queryExecution.toRdd.count()
      val s = df.queryExecution.executedPlan.toString
      val cut = s.indexOf("== Initial Plan ==")
      println(s"\n########## $n ##########")
      println(if (cut >= 0) s.substring(0, cut) else s)
      CachedFrames.drain()
    }
    spark.stop()
  }
}
