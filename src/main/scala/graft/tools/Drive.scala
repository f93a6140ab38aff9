package graft.tools
import org.apache.spark.sql.SparkSession
import graft.io.Load
import graft.modify.Modify
import graft.analyze.AssociationStudy
import graft.survey.SurveyDesignSpec

/** Scratch driver for end-to-end verification (not part of the API). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("drive")
      .config("spark.sql.shuffle.partitions","4").config("spark.sql.ansi.enabled","false")
      .config("spark.sql.caseSensitive","true").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = Load.rawDelimited(spark, "/root/reference/tests/test_data_files/nhanes_data.csv")
    var cf = Load.withSequentialId(raw)
    cf = Modify.makeBinary(cf, only = Some(Seq("HI_CHOL","RIAGENDR")))
    cf = Modify.makeCategorical(cf, only = Some(Seq("race","agecat")))
    val design = new SurveyDesignSpec(cf.df, "id",
      strata = Some("SDMVSTRA"), cluster = Some("SDMVPSU"), nest = true,
      singleWeight = Some("WTMEC2YR"))
    val data = Modify.colfilter(cf, only = Some(Seq("HI_CHOL","RIAGENDR","race","agecat")))
    println("== full-design weighted EWAS (expect race LRT p≈0.0861, agecat p≈2.56e-60, RIAGENDR beta≈0.1514) ==")
    AssociationStudy.run(spark, data, outcomes = Seq("HI_CHOL"),
      covariates = Seq("agecat","RIAGENDR"), regressionVariables = Seq("race"),
      surveyDesign = Some(design)).show(false)
    AssociationStudy.run(spark, data, outcomes = Seq("HI_CHOL"),
      covariates = Seq("race","agecat"), regressionVariables = Seq("RIAGENDR"),
      surveyDesign = Some(design)).show(false)
    // probe: design var leaking into data must error
    try { AssociationStudy.run(spark, cf, outcomes = Seq("HI_CHOL"),
      regressionVariables = Seq("WTMEC2YR"), surveyDesign = Some(design)); println("PROBE FAIL") }
    catch { case e: Exception => println("design-var-in-data error OK: " + e.getMessage.take(100)) }
    // probe: lonely PSU with mode=fail must error on the lonely dataset
    try {
      val rawL = Load.rawDelimited(spark, "/root/reference/tests/test_data_files/nhanes_lonely_data.csv")
      val cfL = Load.withSequentialId(rawL)
      new SurveyDesignSpec(cfL.df, "id", strata = Some("SDMVSTRA"),
        cluster = Some("SDMVPSU"), nest = true, singleWeight = Some("WTMEC2YR"))
      println("PROBE FAIL: lonely psu accepted")
    } catch { case e: Exception => println("lonely-psu fail-mode error OK: " + e.getMessage.take(80)) }
    spark.stop()
  }
}
