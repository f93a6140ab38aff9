package graft.tools
import org.apache.spark.sql.SparkSession
import graft.io.Load
import graft.modify.Modify
import graft.describe.Describe
import graft.analyze.{AssociationStudy, Corrections}

/** Scratch driver for end-to-end verification (not part of the API). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("drive")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = Load.rawDelimited(spark, "/root/reference/tests/test_data_files/nhanes_data.csv")
    var cf = Load.withSequentialId(raw)
    cf = Modify.makeBinary(cf, only = Some(Seq("HI_CHOL","RIAGENDR")))
    cf = Modify.makeCategorical(cf, only = Some(Seq("race","agecat")))
    println("== percent_na =="); Describe.percentNa(spark, cf).show(10, false)
    println("== freq_table (race) =="); Describe.freqTable(spark, cf).filter("variable = 'race'").orderBy("value").show(false)
    println("== summarize =="); Describe.summarize(spark, cf).show(false)
    val res = AssociationStudy.run(spark, cf, outcomes = Seq("HI_CHOL"), covariates = Seq("agecat","RIAGENDR"), regressionVariables = Seq("race"))
    println("== association study (race) =="); res.show(false)
    println("== corrected pvalues ==")
    val multi = AssociationStudy.run(spark, cf, outcomes = Seq("HI_CHOL"), regressionVariables = Seq("race","agecat","RIAGENDR"))
    Corrections.addCorrectedPvalues(multi).select("Variable","pvalue","pvalue_bonferroni","pvalue_fdr").show(false)
    var cf2 = Modify.makeContinuous(cf, only = Some(Seq("WTMEC2YR")))
    cf2 = Modify.removeOutliers(cf2, "iqr", 1.5, only = Some(Seq("WTMEC2YR")))
    println("== after iqr outlier removal, percent_na WTMEC2YR ==")
    Describe.percentNa(spark, cf2).filter("variable='WTMEC2YR'").show(false)
    try { Modify.makeBinary(cf, only = Some(Seq("race"))); println("PROBE FAIL: no error") } catch { case e: Exception => println("makeBinary(race) error OK: " + e.getMessage.take(90)) }
    try { Modify.colfilter(cf, skip = Some(Seq("nope"))); println("PROBE FAIL: no error") } catch { case e: Exception => println("colfilter(nope) error OK: " + e.getMessage.take(90)) }
    try { Modify.transform(cf2, "evil_code", only=Some(Seq("WTMEC2YR"))); println("PROBE FAIL: no error") } catch { case e: Exception => println("transform(evil) error OK: " + e.getMessage.take(60)) }
    spark.stop()
  }
}
