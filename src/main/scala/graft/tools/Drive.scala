package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch end-to-end driver for ad-hoc verification (see skills/verify). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val names = Seq("layout_zorder", "modify_quantile_normalize")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[$n] warmup failed: ${e.getMessage}") }
    }
    (1 to 2).foreach { pass =>
      names.foreach { n =>
        System.gc()
        val fn = graft.SparkEntry.queries(n)
        time(s"$n pass $pass") {
          fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
        }
      }
    }
    spark.stop()
  }
}
