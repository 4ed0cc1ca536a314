package graft

import graft.dedup.DedupPipeline
import graft.ml.Febrl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke: run the full blocking + exactly-once pair generation on the
  * reference's 20k-record train fixture (~50M candidate pairs — the
  * workload the reference reports at ~6 min on an 8-node cluster) and print
  * pair/duplicate counts with wall time. Usage:
  *   sbt "runMain graft.ScaleSmoke [inputCsv] [--features]"
  * `--features` also evaluates the 14-comparator projection (the full job,
  * not just candidate generation); `--triangle` uses the skew-managed
  * physical strategy (k = cpus) instead of the declarative self-join.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val input = args.headOption.filterNot(_.startsWith("--"))
      .getOrElse("/root/reference/data/train.csv")
    val withFeatures = args.contains("--features")
    val triangle = args.contains("--triangle")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = Febrl.read(spark, input).cache()
    println(s"records: ${df.count()}")
    val t0 = System.nanoTime()
    val result =
      if (triangle) {
        val pf = graft.dedup.TrianglePipeline
          .pairFeatures(df, Febrl.config, k = cpus.toInt)
        pf.agg(count(lit(1)).as("pairs"),
          sum((col("label") === 1.0).cast("long")).as("dups")).head()
      } else if (withFeatures) {
        val pf = DedupPipeline.pairFeatures(df, Febrl.config)
        pf.agg(count(lit(1)).as("pairs"),
          sum((col("label") === 1.0).cast("long")).as("dups")).head()
      } else {
        DedupPipeline.candidatePairs(df, Febrl.config)
          .agg(count(lit(1)).as("pairs"), lit(-1L).as("dups")).head()
      }
    val secs = (System.nanoTime() - t0) / 1e9
    val mode = if (triangle) "triangle-full" else if (withFeatures) "full" else "candidates"
    println(f"pairs=${result.getLong(0)} dups=${result.getLong(1)} mode=$mode wall=$secs%.1f s")
    spark.stop()
  }
}
