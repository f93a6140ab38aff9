package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  def refPath(p: String): String = s"/root/reference/tests/$p"

  /** rtol comparison mirroring the reference's assert_frame_equal contract
    * (atol=0, rtol=1e-4 — reference: tests/analyze/test_association_study.py:1-11). */
  def assertRtol(actual: Double, expected: Double, rtol: Double = 1e-4,
                 clue: String = ""): Unit = {
    if (expected.isNaN) assert(actual.isNaN, s"$clue: expected NaN, got $actual")
    else {
      val ok = math.abs(actual - expected) <= rtol * math.abs(expected)
      assert(ok, s"$clue: $actual != $expected (rtol $rtol)")
    }
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.caseSensitive", "true")
      // fail loudly on broken generated code instead of silently falling
      // back to interpreted execution: a doGenCode bug is a perf cliff in
      // production and must be a red test here (caught the NearestLists /
      // HyperplaneSignature / CosineSimilarity nullable-vs-codegen bug)
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
