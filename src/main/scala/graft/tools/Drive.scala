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
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val fn = graft.SparkEntry.queries("genotype_maf_describe")
    fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    fn(spark, "/root/testdata/sf0.1").explain("formatted")
    (1 to 5).foreach { i =>
      time(s"maf pass $i") {
        fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
