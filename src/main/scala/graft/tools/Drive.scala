package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.io.Load
import graft.model.CladeFrame
import graft.modify.Modify
import graft.describe.{Describe, Plots}
import graft.analyze.{AssociationStudy, Corrections, InteractionStudy}
import graft.survey.SurveyDesignSpec
import graft.pipeline.{Dedup, Similarity, Text}

/** End-to-end demonstration drive: the full CLARITE-style pipeline plus the
  * training-data operators, on real fixtures. Used by the verify skill. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").appName("drive")
      .config("spark.sql.shuffle.partitions","8").config("spark.sql.ansi.enabled","false")
      .config("spark.sql.caseSensitive","true").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 1. CLARITE pipeline on the NHANES fixture
    var cf = Load.withSequentialId(Load.rawDelimited(spark,
      "/root/reference/tests/test_data_files/nhanes_data.csv"))
    cf = Modify.makeBinary(cf, only = Some(Seq("HI_CHOL","RIAGENDR")))
    cf = Modify.makeCategorical(cf, only = Some(Seq("race","agecat")))
    val design = new SurveyDesignSpec(cf.df, "id", strata = Some("SDMVSTRA"),
      cluster = Some("SDMVPSU"), nest = true, singleWeight = Some("WTMEC2YR"))
    val data = Modify.colfilter(cf, only = Some(Seq("HI_CHOL","RIAGENDR","race","agecat")))
    println("== weighted EWAS via CO-GROUP path (golden: race 0.274110, agecat 1.804e-06, RIAGENDR beta 0.212760) ==")
    val ewas = AssociationStudy.run(spark, data, Seq("HI_CHOL"),
      covariates = Seq("agecat","RIAGENDR"), regressionVariables = Seq("race"),
      surveyDesign = Some(design), broadcastBase = Some(false))
      .unionByName(AssociationStudy.run(spark, data, Seq("HI_CHOL"),
        covariates = Seq("race","agecat"), regressionVariables = Seq("RIAGENDR"),
        surveyDesign = Some(design), broadcastBase = Some(false)))
    Corrections.addCorrectedPvalues(ewas)
      .select("Variable","Beta","SE","pvalue","pvalue_fdr","error","warnings").show(false)
    println("survey table collected for broadcast path? " + design.wasCollectedForBroadcast)
    println("== interaction via CO-GROUP path (golden LRT 1.064e-07) ==")
    InteractionStudy.run(spark, data, "HI_CHOL",
      Seq(("agecat","RIAGENDR")), Seq("race"), broadcastBase = Some(false))
      .select("Term1","Term2","LRT_pvalue").show(false)

    // 2. Training-data operators on the synthetic corpus
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    println("== dedup: exact keeps " + Dedup.exact(docs, "text", "doc_id").count() +
      " of " + docs.count() + "; minhash candidates " +
      Dedup.minhashCandidates(spark, docs.limit(100), "text", "doc_id").count())
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    println("== ANN: top-3 for query 0 ==")
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), 3).show(false)
    println("== langid sample ==")
    Text.langId(docs.limit(3), "text").select("doc_id","pred_lang").show(false)
    println("== QQ prep (n=5 of n_chars) ==")
    Plots.qqPrep(spark, docs.filter(col("doc_id") < 5), Seq("n_chars")).show(false)
    spark.stop()
  }
}
