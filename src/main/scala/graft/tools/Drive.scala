package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("drive")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[drive] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    time("dedup_components run 1") {
      SparkEntry.queries("dedup_components")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("dedup_components run 2") {
      SparkEntry.queries("dedup_components")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
