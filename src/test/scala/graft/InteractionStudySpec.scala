package graft

import graft.analyze.InteractionStudy
import graft.io.Load
import graft.modify.Modify
import graft.model.CladeFrame

/** Interaction-study golden-output parity (reference:
  * tests/r_test_output/interactions CSVs, rtol 1e-4 on LRT_pvalue and N —
  * tests/analyze/test_interaction_study.py:24-45). */
class InteractionStudySpec extends SparkSpec {

  private def golden(file: String): Map[(String, String), (Long, Double)] = {
    val lines = scala.io.Source.fromFile(refPath(s"r_test_output/interactions/$file"))
      .getLines().toSeq
    val header = lines.head.split(",")
    val t1 = header.indexOf("Term1"); val t2 = header.indexOf("Term2")
    val ni = header.indexOf("N"); val pi = header.indexOf("LRT_pvalue")
    lines.tail.map { l =>
      val c = l.split(",", -1)
      (c(t1), c(t2)) -> (c(ni).toDouble.toLong, c(pi).toDouble)
    }.toMap
  }

  private lazy val nhanes: CladeFrame = {
    val raw = Load.rawDelimited(spark, refPath("test_data_files/nhanes_data.csv"))
    var cf = Load.withSequentialId(raw)
    cf = Modify.makeBinary(cf, only = Some(Seq("HI_CHOL", "RIAGENDR")))
    cf = Modify.makeCategorical(cf, only = Some(Seq("race", "agecat")))
    cf
  }

  private def check(df: org.apache.spark.sql.DataFrame,
                    g: Map[(String, String), (Long, Double)]): Unit = {
    val rows = df.collect().map { r =>
      (r.getString(r.fieldIndex("Term1")), r.getString(r.fieldIndex("Term2"))) ->
        (r.getLong(r.fieldIndex("N")),
          r.getDouble(r.fieldIndex("LRT_pvalue")))
    }.toMap
    g.foreach { case ((a, b), (n, p)) =>
      val got = rows.get((a, b)).orElse(rows.get((b, a)))
      assert(got.nonEmpty, s"missing pair ($a, $b) in ${rows.keys}")
      assert(got.get._1 === n, s"($a,$b) N")
      assertRtol(got.get._2, p, 1e-4, s"($a,$b) LRT_pvalue")
    }
  }

  test("nhanes ageXgender interaction (categorical x binary, covar race)") {
    val data = Modify.colfilter(nhanes,
      only = Some(Seq("HI_CHOL", "RIAGENDR", "race", "agecat")))
    val res = InteractionStudy.run(spark, data, "HI_CHOL",
      interactions = Seq(("agecat", "RIAGENDR")), covariates = Seq("race"))
    check(res, golden("nhanes_ageXgender.csv"))
  }

  test("nhanes weightXrace interaction (continuous x categorical)") {
    var data = Modify.colfilter(nhanes,
      only = Some(Seq("HI_CHOL", "RIAGENDR", "race", "agecat", "WTMEC2YR")))
    data = Modify.makeContinuous(data, only = Some(Seq("WTMEC2YR")))
    val res = InteractionStudy.run(spark, data, "HI_CHOL",
      interactions = Seq(("WTMEC2YR", "race")),
      covariates = Seq("agecat", "RIAGENDR"))
    check(res, golden("nhanes_weightXrace.csv"))
  }

  test("nhanes pairwise interactions (all pairs, no covariates)") {
    val data = Modify.colfilter(nhanes,
      only = Some(Seq("HI_CHOL", "RIAGENDR", "race", "agecat")))
    val rvs = Seq("RIAGENDR", "race", "agecat")
    val pairs = for (i <- rvs.indices; j <- (i + 1) until rvs.size)
      yield (rvs(i), rvs(j))
    val res = InteractionStudy.run(spark, data, "HI_CHOL",
      interactions = pairs, covariates = Nil)
    check(res, golden("nhanes_pairwise.csv"))
  }
}
