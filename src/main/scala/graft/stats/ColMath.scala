package graft.stats

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Special functions as PURE COLUMN ALGEBRA — for statistics that must run
  * distributed (no UDF, stays in whole-stage codegen) AND replay exactly in
  * an external SQL engine (the DuckDB oracles reproduce the identical
  * arithmetic, constant for constant, operation for operation).
  *
  * Exact tail probabilities for driver-side scalar math live in
  * [[Distributions]] (commons-math); these are the documented approximations
  * for per-row / per-group columns.
  */
object ColMath {

  /** Abramowitz-Stegun 7.1.26 complementary error function for z >= 0
    * (|error| < 1.5e-7). Horner order matters: oracles replay it verbatim. */
  def erfcPos(z: Column): Column = {
    val tt = lit(1.0) / (lit(1.0) + lit(0.3275911) * z)
    tt * (lit(0.254829592) + tt * (lit(-0.284496736) +
      tt * (lit(1.421413741) + tt * (lit(-1.453152027) + tt * lit(1.061405429))))) *
      exp(-z * z)
  }

  /** erfc on the full line via the reflection erfc(-z) = 2 - erfc(z). */
  def erfc(z: Column): Column =
    when(z >= 0.0, erfcPos(z)).otherwise(lit(2.0) - erfcPos(-z))

  /** Standard-normal survival function Q(z) = 0.5 * erfc(z / sqrt 2). */
  def normalSf(z: Column): Column =
    lit(0.5) * erfc(z / lit(math.sqrt(2.0)))

  /** Chi-square survival function via the Wilson-Hilferty cube-root normal
    * approximation — accurate to ~1e-3 absolute for moderate df; a
    * SCREENING p-value (flagging/ranking), not an inference-grade tail. */
  def chi2SfWH(x: Column, df: Column): Column = {
    val k = df.cast("double")
    val z = (pow(x / k, lit(1.0) / 3.0) - (lit(1.0) - lit(2.0) / (lit(9.0) * k))) /
      sqrt(lit(2.0) / (lit(9.0) * k))
    normalSf(z)
  }

  // Acklam's inverse-normal-CDF rational approximation (|rel err| < 1.15e-9
  // over (0,1)) — three regions, plain Horner polynomials: expressible as
  // columns AND as the generated oracle SQL below, from the SAME constants.
  private val ackA = Seq(-3.969683028665376e+01, 2.209460984245205e+02,
    -2.759285104469687e+02, 1.383577518672690e+02, -3.066479806614716e+01,
    2.506628277459239e+00)
  private val ackB = Seq(-5.447609879822406e+01, 1.615858368580409e+02,
    -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
  private val ackC = Seq(-7.784894002430293e-03, -3.223964580411365e-01,
    -2.400758277161838e+00, -2.549732539343734e+00, 4.374664141464968e+00,
    2.938163982698783e+00)
  private val ackD = Seq(7.784695709041462e-03, 3.224671290700398e-01,
    2.445134137142996e+00, 3.754408661907416e+00)
  private val ackLow = 0.02425

  /** Standard-normal quantile function (inverse CDF) as column algebra —
    * Acklam's approximation. Domain (0,1); out-of-domain yields null. */
  def normalPpf(p: Column): Column = {
    def horner(cs: Seq[Double], x: Column): Column =
      cs.tail.foldLeft(lit(cs.head) * x) { (acc, c) => (acc + lit(c)) * x }
    def rat(num: Seq[Double], den: Seq[Double], x: Column): Column =
      (horner(num.dropRight(1), x) + lit(num.last)) /
        (horner(den, x) + lit(1.0))
    val qLow = sqrt(lit(-2.0) * log(p))
    val qHigh = sqrt(lit(-2.0) * log(lit(1.0) - p))
    val r = (p - 0.5) * (p - 0.5)
    val central = rat(ackA, ackB, r) * (p - 0.5)
    when(p > 0.0 && p < lit(ackLow), rat(ackC, ackD, qLow))
      .when(p >= lit(ackLow) && p <= lit(1.0 - ackLow), central)
      .when(p > lit(1.0 - ackLow) && p < 1.0, -rat(ackC, ackD, qHigh))
  }

  /** The identical Acklam formula as a SQL fragment over the scalar
    * expression `p` — oracle generators interpolate this so the DuckDB
    * replay uses the same constants and Horner order as [[normalPpf]].
    * `p` must be a simple column reference (it is repeated verbatim). */
  def normalPpfSql(p: String): String = {
    def horner(cs: Seq[Double], x: String): String =
      cs.tail.foldLeft(s"(${cs.head}) * $x") { (acc, c) => s"($acc + ($c)) * $x" }
    def rat(num: Seq[Double], den: Seq[Double], x: String): String =
      s"((${horner(num.dropRight(1), x)} + (${num.last})) / (${horner(den, x)} + 1.0))"
    val qLow = s"sqrt(-2.0 * ln($p))"
    val qHigh = s"sqrt(-2.0 * ln(1.0 - $p))"
    val r = s"(($p - 0.5) * ($p - 0.5))"
    s"""(CASE
       WHEN $p > 0.0 AND $p < $ackLow THEN ${rat(ackC, ackD, qLow)}
       WHEN $p >= $ackLow AND $p <= ${1.0 - ackLow} THEN (${rat(ackA, ackB, r)} * ($p - 0.5))
       WHEN $p > ${1.0 - ackLow} AND $p < 1.0 THEN -${rat(ackC, ackD, qHigh)}
       END)"""
  }
}
