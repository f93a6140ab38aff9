package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Scratch driver: explain-plan audit of representative queries. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("drive")
      .config("spark.sql.shuffle.partitions","4").config("spark.sql.ansi.enabled","false")
      .config("spark.sql.caseSensitive","true").config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("q1_pricing_summary", "q3_join_revenue_by_nation", "modify_rowfilter")) {
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
