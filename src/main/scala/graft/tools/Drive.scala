package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import breeze.linalg.{DenseMatrix, DenseVector}
import graft.stats.Glm

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("drive")
      .config("spark.sql.shuffle.partitions","4").config("spark.sql.ansi.enabled","false")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_extendedprice", "l_quantity").collect()
    val y = DenseVector(rows.map(_.getDouble(0)))
    val n = rows.length
    val x = DenseMatrix.zeros[Double](n, 2)
    for (i <- 0 until n) { x(i, 0) = 1.0; x(i, 1) = rows(i).getDouble(1) }
    val fit = Glm.fit(x, y, Glm.Gaussian)
    println(s"direct kernel: beta=${fit.beta.mkString(",")} se=${fit.se.mkString(",")}")
    // melt-path alignment check: ids as strings round-trip
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .withColumn("id", col("l_orderkey") * 10 + col("l_linenumber"))
    println("id distinct: " + li.select("id").distinct.count() + " of " + li.count())
    val melted = graft.modify.Modify.melt(
      li.select("id", "l_quantity").withColumn("id", col("id").cast("string")),
      Seq("l_quantity"), keep = Seq("id"))
    melted.show(3, false)
    // join melted back to original by id and compare values
    val joined = melted.join(li.select(col("id").cast("string").as("id"), col("l_quantity").as("orig")), "id")
      .withColumn("diff", abs(col("value").cast("double") - col("orig")))
    println("max diff after melt roundtrip: " + joined.agg(max("diff")).head.getDouble(0))
    spark.stop()
  }
}
