package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    val dir = "/root/testdata/sf0.1"
    def t(n: String) = spark.read.parquet(s"$dir/$n.parquet")
    // warm
    Seq("lineitem","orders","customer","supplier","nation").foreach(n => t(n).count())
    val li = t("lineitem"); val o = t("orders"); val c = t("customer")
    val su = t("supplier"); val na = t("nation")
    def edges = li
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(su, li("l_suppkey") === su("s_suppkey"))
      .join(broadcast(na.select(col("n_nationkey").as("__ck"), col("n_name").as("src"))),
        c("c_nationkey") === col("__ck"))
      .join(broadcast(na.select(col("n_nationkey").as("__sk"), col("n_name").as("dst"))),
        su("s_nationkey") === col("__sk"))
      .groupBy("src", "dst")
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("w"))
    (1 to 2).foreach { i =>
      time(s"edges-only pass $i") { edges.write.format("noop").mode("overwrite").save() }
    }
    (1 to 2).foreach { i =>
      time(s"pagerank pass $i") {
        graft.pipeline.Graph.pageRank(edges, "src", "dst", "w", 3, 0.85)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
