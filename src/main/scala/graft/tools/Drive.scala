package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Scratch drive: time the logistic IRLS bench query after the cache-the-
  * working-set change. Mirrors Bench's session config. */
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
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    time("analyze_assoc_wide run 1") {
      SparkEntry.queries("analyze_assoc_wide")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("analyze_assoc_wide run 2") {
      SparkEntry.queries("analyze_assoc_wide")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // correctness spot-check: values unchanged by the caching
    SparkEntry.queries("analyze_assoc_wide")(spark, dir).show(false)
    spark.stop()
  }
}
