package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main for q49 — not part of the driver contract. */
object Probe49 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val cfg = graft.ops.Dedup.customerConfig.copy(features =
      graft.ops.Dedup.customerConfig.features.filter(_.name == "name_sim"))
    val cust = Tables(spark, sfDir, "customer")
    // 1. candidate pairs only (no features)
    t("candidates_count") {
      println("PROBE n_cand " +
        graft.dedup.DedupPipeline.candidatePairs(cust, cfg).count())
    }
    // 2. pairs with the levenshtein feature, no persist
    val pf = graft.dedup.DedupPipeline.pairFeatures(cust, cfg)
    t("feat_filter_count_nopersist") {
      println("PROBE n_pairs " + pf.filter(col("name_sim") >= 0.9).count())
    }
    // 3. with the persist barrier (= what entityClusters does)
    val pairs = graft.dedup.DedupPipeline.pairFeatures(cust, cfg).persist()
    val filtered = t("persist+filter+count") {
      val f = pairs.filter(col("name_sim") >= 0.9).select("id1", "id2")
      println("PROBE n_pairs2 " + f.count())
      println("PROBE pairs_npart " + pairs.rdd.getNumPartitions)
      f
    }
    val cc = t("cc_total") {
      graft.dedup.Clustering.connectedComponents(filtered)
    }
    println(s"PROBE n_labels ${t("cc_count")(cc.count())}")
    spark.stop()
  }
}
