package graft

import java.nio.file.Files
import graft.cli.Cli

/** In-process CLI pipeline: load -> categorize -> describe -> study,
  * with TSV + dtypes sidecar state between verbs. */
class CliSpec extends SparkSpec {

  test("load -> categorize -> association-study reproduces the golden p-value") {
    val dir = Files.createTempDirectory("graft-cli").toString
    Cli.run(spark, List("load", "from-csv",
      refPath("test_data_files/nhanes_data.csv"), s"$dir/nh"))
    assert(new java.io.File(s"$dir/nh.dtypes").exists())
    Cli.run(spark, List("modify", "categorize", s"$dir/nh", s"$dir/nh2"))
    Cli.run(spark, List("analyze", "association-study", s"$dir/nh2", s"$dir/res",
      "--outcome", "HI_CHOL", "--covariates", "agecat,RIAGENDR", "--min-n", "1"))
    val res = spark.read.option("sep", "\t").option("header", "true")
      .option("inferSchema", "true").csv(s"$dir/res")
    val race = res.filter(res("Variable") === "race").collect().head
    assertRtol(race.getDouble(race.fieldIndex("pvalue")), 7.074783e-03, 1e-4,
      "race golden p through the CLI")
  }

  test("unknown commands fail loudly") {
    intercept[IllegalArgumentException] {
      Cli.run(spark, List("frobnicate", "everything"))
    }
  }
}
