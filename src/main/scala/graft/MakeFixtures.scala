package graft

import org.apache.spark.sql.SparkSession

/** One-shot generator for the committed binary fixtures (run from the repo
  * root): writes the deterministic synthetic media table to
  * [[graft.ops.Multimodal.FixturePath]] as a single parquet file. The
  * fixture is committed so q34's decode input is frozen bytes, not
  * re-synthesized rows. */
object MakeFixtures {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ops.Multimodal.synthesize(spark, graft.ops.Multimodal.FixtureRows)
      .repartition(1)
      .write.mode("overwrite").parquet(graft.ops.Multimodal.FixturePath)
    println(s"wrote ${graft.ops.Multimodal.FixturePath}")
    spark.stop()
  }
}
