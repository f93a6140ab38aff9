package graft.tools
import org.apache.spark.sql.SparkSession

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/documents.parquet").write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    for (i <- 1 to 3) time(s"decon_overlap $i") {
      graft.SparkEntry.queries("decon_overlap")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    for (i <- 1 to 3) time(s"decon_crossdoc_dup $i") {
      graft.SparkEntry.queries("decon_crossdoc_dup")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // new operator: removeDupSpans
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    for (i <- 1 to 3) time(s"remove_dup_spans $i") {
      graft.pipeline.Decontaminate.removeDupSpans(docs, "text", "doc_id", n = 5)
        .write.format("noop").mode("overwrite").save()
    }
    graft.pipeline.Decontaminate.removeDupSpans(docs, "text", "doc_id", n = 5)
      .orderBy("id").show(5, truncate = 60)
    spark.stop()
  }
}
