package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch end-to-end driver for ad-hoc verification (see skills/verify). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.01"
    val name = "analyze_interaction_pair"
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.show(20, truncate = false)
    df.coalesce(1).write.mode("overwrite").parquet(s"/tmp/drive_out/$name")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/drive_out/sql.txt"),
      graft.SparkEntry.oracleSql(name))
    spark.stop()
  }
}
