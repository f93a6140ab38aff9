package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch end-to-end driver for ad-hoc verification (see skills/verify). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("text_url_extract", "dedup_url_canonical", "cluster_kmeans", "ann_ivf_topk", "ann_knn_graph", "ann_label_audit_graph", "sample_cluster_balanced", "cluster_silhouette", "pipeline_curate_e2e", "ann_semantic_dedup", "ann_lsh_topk", "graph_pagerank_dangling").foreach { n =>
      graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
        .coalesce(1).write.mode("overwrite").parquet(s"/tmp/newq/$n")
      println(s"[drive] $n dumped")
    }
    spark.stop()
  }
}
