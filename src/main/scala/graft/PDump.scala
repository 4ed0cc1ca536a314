package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan-dump CLI for the audit trail: executes each named gate query at
  * sf0.001 (so AQE finalizes) and writes its FINAL physical plan to
  * /tmp/plan_<name>.txt — the raw text [[PlanAudit]] summarizes and
  * PlanSpec pins are drafted from. */
object PDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      try {
        val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        df.queryExecution.toRdd.count()
        val s = df.queryExecution.executedPlan.toString
        val cut = s.indexOf("== Initial Plan ==")
        Files.write(Paths.get(s"/tmp/plan_$n.txt"),
          (if (cut >= 0) s.substring(0, cut) else s).getBytes)
      } finally CachedFrames.drain()
    }
    spark.stop()
  }
}
