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
}
