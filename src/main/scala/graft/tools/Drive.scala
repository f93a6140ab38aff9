package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch end-to-end driver for ad-hoc verification (see skills/verify). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.Similarity
    try {
      val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      // r8: deterministic Lloyd ivfTrain — same query path, real data
      val model = Similarity.ivfTrain(e, nLists = 8)
      val assigned = Similarity.ivfAssign(model, e)
      val q = Similarity.ivfQuery(model, assigned, e.filter(col("vec_id") < 5), k = 3)
      println("ivfQuery rows=" + q.count()); q.show(6)
      // r8: knnLabelAudit must forward non-default column names
      val renamed = e.withColumnRenamed("vec_id", "my_id")
        .withColumnRenamed("embedding", "my_vec").withColumnRenamed("label", "my_lab")
      val audit = Similarity.knnLabelAudit(renamed, renamed, k = 5,
        idCol = "my_id", vecCol = "my_vec", labelCol = "my_lab")
      println("labelAudit (renamed cols):"); audit.show()
      // r8: rankInverseNormal with localCheckpoint-pinned row ids
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select("l_orderkey", "l_quantity", "l_extendedprice").limit(500)
      val rint = graft.modify.Modify.rankInverseNormal(li, Seq("l_quantity"))
      println("rint rows=" + rint.count()); rint.show(3)
      // r8: htmlExtract explicit whitespace class — VT must collapse too
      import spark.implicits._
            val html = Seq((1L, "<p>ab \u000b\tc</p><script>x</script>")).toDF("id", "h")
      html.select(graft.pipeline.Text.htmlExtract(col("h"))).show(false)
    } catch { case e: Throwable => e.printStackTrace() }
    spark.stop()
  }
}
