package graft

import org.apache.spark.sql.functions._
import graft.describe.Plots
import graft.stats.Distributions

class PlotsSpec extends SparkSpec {

  test("normalPpf matches known standard-normal quantiles") {
    // scipy.stats.norm.ppf reference values
    assertRtol(Distributions.normalPpf(0.5), 0.0, 1e-10, "ppf(0.5)")
    assertRtol(Distributions.normalPpf(0.975), 1.959963984540054, 1e-10, "ppf(0.975)")
    assertRtol(Distributions.normalPpf(0.025), -1.959963984540054, 1e-10, "ppf(0.025)")
    assertRtol(Distributions.normalPpf(0.001), -3.090232306167813, 1e-10, "ppf(0.001)")
    assert(Distributions.normalPpf(0.0).isNaN)
    assert(Distributions.normalPpf(1.0).isNaN)
  }

  test("qqPrep: single-observation variable yields null sample quantile, no crash") {
    import spark.implicits._
    val df = Seq(
      (1L, java.lang.Double.valueOf(5.0), java.lang.Double.valueOf(1.0)),
      (2L, null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(2.0)),
      (3L, null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(3.0)))
      .toDF("id", "lonely", "full")
    val out = Plots.qqPrep(spark, df, Seq("lonely", "full")).collect()
    val lonely = out.filter(_.getString(0) == "lonely")
    assert(lonely.length === 1)
    assert(lonely.head.isNullAt(lonely.head.fieldIndex("sample_quantile")),
      "sd undefined at n=1 -> null standardized quantile")
    assert(out.count(_.getString(0) == "full") === 3)
  }

  test("qqPrep: no subsample under cap, exact-n seeded subsample over it") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, i.toDouble)).toDF("id", "x")

    val small = Plots.qqPrep(spark, df.filter(col("id") <= 100), Seq("x"))
    assert(small.count() === 100L) // under the 400 cap: every value kept

    val big = Plots.qqPrep(spark, df, Seq("x"), n = 400, seed = 1L)
    assert(big.count() === 400L) // subsampled to exactly n
    val again = Plots.qqPrep(spark, df, Seq("x"), n = 400, seed = 1L)
    assert(big.collect().toSeq === again.collect().toSeq) // seed-deterministic

    // standardization: mean ~0, sd ~1 over the sample quantiles
    val r = big.agg(avg("sample_quantile"), stddev_samp("sample_quantile")).head()
    assertRtol(r.getDouble(0) + 1.0, 1.0, 1e-6, "standardized mean")
    assertRtol(r.getDouble(1), 1.0, 1e-6, "standardized sd")

    // theoretical quantiles symmetric and increasing
    val th = big.orderBy("position").select("theoretical_quantile").as[Double].collect()
    assert(th.sliding(2).forall(p => p(0) < p(1)))
    assertRtol(th.head, -th.last, 1e-9, "symmetry")
  }
}
