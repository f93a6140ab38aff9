package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch end-to-end driver for ad-hoc verification (see skills/verify). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // drive the multimodal surface end-to-end on real testdata payload shapes
    for (q <- Seq("multimodal_meta", "multimodal_features")) {
      val out = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      println(s"[$q] rows=" + out.count())
      out.show(3, truncate = false)
    }
    spark.stop()
  }
}
