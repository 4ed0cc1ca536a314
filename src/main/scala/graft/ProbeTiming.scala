package graft
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (NOT committed): per-phase timing of a bench rep. */
object ProbeTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    for (n <- args; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t1 = System.nanoTime()
      val analyzed = df.queryExecution.analyzed
      val t2 = System.nanoTime()
      CachedFrames.begin(df)
      val t3 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val t4 = System.nanoTime()
      CachedFrames.drain()
      val t5 = System.nanoTime()
      def ms(a: Long, b: Long) = (b - a) / 1e6
      println(f"$n rep$rep build=${ms(t0,t1)}%.0f analyze=${ms(t1,t2)}%.0f begin=${ms(t2,t3)}%.0f exec=${ms(t3,t4)}%.0f drain=${ms(t4,t5)}%.0f ms")
    }
    spark.stop()
  }
}
