package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan for selected queries
  * so scan pushdown (PushedFilters/ReadSchema), join strategies and
  * WholeStageCodegen spans can be inspected. Usage:
  *   runMain graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "q_join_multi", "q_join_inner", "q_scan_pushdown",
        "q_rank_topn", "q_minhash_lsh", "q_ann_brute", "q_ann_ivf",
        "q_ann_pq", "q_ann_ivfpq", "q_embed_neardup_lsh", "q_cdc_agg",
        "q_match_recognize", "q_asof_sql", "q_format_avro",
        "q_format_proto", "q_bm25", "q_importance_resample", "q_lm_score",
        "q_semdedup", "q_chunk", "q_clean_text", "q_rag_e2e",
        "q_kmv_distinct", "q_ann_sq8")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      Registry.byName(n).run(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
