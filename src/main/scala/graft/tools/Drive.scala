package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch end-to-end driver for ad-hoc verification (see skills/verify). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = "/root/testdata/sf0.001/documents.parquet"
    val emb = "/root/testdata/sf0.001/embeddings.parquet"
    val li = "/root/testdata/sf0.001/lineitem.parquet"
    val dir = java.nio.file.Files.createTempDirectory("drive-cg").toString
    def tryVerb(tag: String)(f: => Unit): Unit =
      try { f; println(s"[$tag] OK") }
      catch { case e: Throwable =>
        println(s"[$tag] FAILED: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}") }
    tryVerb("sample-split") { graft.cli.Cli.run(spark, List("pipeline", "sample-split", docs, s"$dir/sp",
      "--splits", "train=0.8,val=0.1,test=0.1")) }
    tryVerb("tfidf") { graft.cli.Cli.run(spark, List("pipeline", "tfidf", docs, s"$dir/tfidf", "--k", "2")) }
    tryVerb("kmeans") { graft.cli.Cli.run(spark, List("pipeline", "kmeans", emb, s"$dir/km", "--k", "4",
      "--iters", "3")) }
    tryVerb("winsorize") { graft.cli.Cli.run(spark, List("pipeline", "winsorize", li, s"$dir/wz",
      "--cols", "l_extendedprice")) }
    tryVerb("psi-drift") { graft.cli.Cli.run(spark, List("pipeline", "psi-drift", docs, s"$dir/psi",
      "--ref", docs, "--cols", "n_chars")) }
    spark.stop()
  }
}
