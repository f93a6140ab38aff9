package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch end-to-end driver for ad-hoc verification (see skills/verify):
  * runs the named SparkEntry queries at the given sf dir, dumps each result
  * parquet under /tmp/drive_out/<name> and its oracle SQL (when declared)
  * to /tmp/drive_out/<name>.sql for a DuckDB cross-check. */
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
    val sfDir = sys.env.getOrElse("DRIVE_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq("analyze_interaction_pair")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.show(10, truncate = false)
      df.coalesce(1).write.mode("overwrite").parquet(s"/tmp/drive_out/$name")
      graft.SparkEntry.oracleSql.get(name).foreach { sql =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"/tmp/drive_out/$name.sql"), sql)
      }
      println(s"[drive] $name dumped")
    }
    spark.stop()
  }
}
