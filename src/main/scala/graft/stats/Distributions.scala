package graft.stats

import org.apache.commons.math3.special.{Beta, Erf, Gamma}

/** Tail probabilities via commons-math3 special functions (ships with
  * Spark). Survival functions are computed from the regularized incomplete
  * gamma/beta tails directly — `1 - cdf` would lose all precision exactly
  * where EWAS needs it (p ~ 1e-30 hits are the interesting ones). */
object Distributions {

  /** P(Z > z) for standard normal. */
  def normalSf(z: Double): Double = 0.5 * Erf.erfc(z / math.sqrt(2.0))

  /** P(X > x) for chi-squared with df degrees of freedom. */
  def chi2Sf(x: Double, df: Double): Double = {
    if (x.isNaN || df <= 0) Double.NaN
    else if (x <= 0) 1.0
    else Gamma.regularizedGammaQ(df / 2.0, x / 2.0)
  }

  /** Two-sided p-value for a t statistic with df degrees of freedom:
    * 2·P(T > |t|) = I_{df/(df+t²)}(df/2, 1/2). */
  def tSfTwoSided(t: Double, df: Double): Double = {
    if (t.isNaN || df <= 0) Double.NaN
    else if (t == 0.0) 1.0
    else Beta.regularizedBeta(df / (df + t * t), df / 2.0, 0.5)
  }

  /** Two-sided p-value for a z statistic. */
  def zSfTwoSided(z: Double): Double =
    if (z.isNaN) Double.NaN else 2.0 * normalSf(math.abs(z))

  /** Standard-normal quantile function (inverse CDF). */
  def normalPpf(p: Double): Double = {
    if (p.isNaN || p <= 0.0 || p >= 1.0) Double.NaN
    else math.sqrt(2.0) * Erf.erfInv(2.0 * p - 1.0)
  }

  /** P(X > x) for F distribution with (d1, d2) dof. */
  def fSf(x: Double, d1: Double, d2: Double): Double = {
    if (x.isNaN || d1 <= 0 || d2 <= 0) Double.NaN
    else if (x <= 0) 1.0
    else Beta.regularizedBeta(d2 / (d2 + d1 * x), d2 / 2.0, d1 / 2.0)
  }
}
