package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    Seq("/root/testdata/sf0.1", "/tmp/sfx1").foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = graft.pipeline.Dedup.minhashCandidates(spark, docs, "text", "doc_id").count()
      println(s"[cand] $dir docs=${docs.count()} candidates=$n")
    }
    spark.stop()
  }
}
