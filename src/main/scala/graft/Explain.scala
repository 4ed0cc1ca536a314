package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints the formatted physical plan of selected
  * queries so scan pruning (ReadSchema/PushedFilters), join strategies
  * (BroadcastHashJoin vs SortMergeJoin) and WholeStageCodegen spans can be
  * reviewed. Usage: runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q1_agg", "q2_region_revenue", "q3_priority_revenue",
                  "q7_window_topn", "q12_topk", "dedup_pairs",
                  "q27_lsh_pairs", "q47_range_join", "q53_span_dedup",
                  "q57_oov_rate", "q58_decontaminate", "q60_ivf_multiprobe",
                  "q61_tfidf_cosine", "q62_quantize_int8", "q70_shuffle_shards",
                  "q71_incremental_dedup", "q72_source_drift",
                  "q73_temperature_mix", "q74_hash_ivf",
                  "q77_apply_mixture", "q78_embedding_admission",
                  "q79_pq_encode", "q80_pq_adc", "q81_anonymize",
                  "q83_pq_rerank")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
