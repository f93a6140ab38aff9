package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch driver: simulate the driver's smoke-check with a DEFAULT session
  * (ANSI on, case-insensitive) to ensure entry() has no config dependence. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("drive")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("ansi=" + spark.conf.get("spark.sql.ansi.enabled"))
    val df = graft.SparkEntry.entry(spark)
    println("entry rows=" + df.count())
    df.show(3)
    spark.stop()
  }
}
