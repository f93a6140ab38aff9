package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Scratch drive: profile the dedup_exact bench anomaly (BENCH_r01 10.7s
  * for a 5k-doc hash aggregate). Mirrors Bench's session config. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("drive")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[drive] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    // warmup like Bench does
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    time("documents raw count") {
      spark.read.parquet(s"$dir/documents.parquet").count()
    }
    time("dedup_exact run 1") {
      SparkEntry.queries("dedup_exact")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("dedup_exact run 2") {
      SparkEntry.queries("dedup_exact")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("fingerprint only") {
      spark.read.parquet(s"$dir/documents.parquet")
        .select(graft.pipeline.Text.fingerprint(col("text")).as("fp"))
        .write.format("noop").mode("overwrite").save()
    }
    time("groupBy fp only") {
      graft.pipeline.Dedup.exactReport(
        spark.read.parquet(s"$dir/documents.parquet"), "text", "doc_id")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
