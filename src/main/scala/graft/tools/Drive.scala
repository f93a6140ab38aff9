package graft.tools
import org.apache.spark.sql.SparkSession

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val cf = graft.genomics.Genotypes.simulateCaseControl(spark,
      nSamples = 10000, nSnps = 1000, maf = 0.3,
      effectSnps = Map(0 -> 0.8, 1 -> 0.8))
    val encoded = graft.genomics.Genotypes.encode(cf, "additive")
    println(f"simulate+encode: ${(System.nanoTime()-t0)/1e9}%.1f s")
    val t1 = System.nanoTime()
    val res = graft.analyze.AssociationStudy.run(spark, encoded,
      outcomes = Seq("Outcome"),
      regressionVariables = (0 until 1000).map(s => s"SNP$s"))
    val n = res.count()
    println(f"gwas 1000 snps x 10000 samples: ${(System.nanoTime()-t1)/1e9}%.1f s, rows=$n")
    val top = res.orderBy("pvalue").select("Variable", "pvalue").limit(5).collect()
    top.foreach(r => println(s"  ${r.getString(0)}  p=${r.getDouble(1)}"))
    spark.stop()
  }
}
