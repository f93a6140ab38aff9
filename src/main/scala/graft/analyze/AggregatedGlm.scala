package graft.analyze

import breeze.linalg.{DenseMatrix, DenseVector, inv}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{CladeFrame, VariableType}
import graft.stats.Distributions
import VariableType._

/** Distributed sufficient-statistics GLM — the 100 TB execution path for
  * mass per-variable regressions over TALL data.
  *
  * The broadcast+melt fan-out in [[AssociationStudy]] is the right shape for
  * the reference's EWAS workload (thousands of variables × modest rows).
  * When the table is instead billions of rows × a numeric variable set, the
  * data must never be collected or reshuffled. This path expresses each
  * per-variable model fit purely as AGGREGATES over the observation table:
  *
  *   - Gaussian/identity: the normal equations Z'Z·b = Z'y per variable are
  *     sums of column products under that variable's complete-case mask —
  *     ONE map-side-combined aggregation pass fits EVERY variable at once
  *     (batched to keep codegen happy); the p×p solves are driver-side
  *     microseconds. Zero shuffles of data rows; the scan streams once.
  *   - Binomial/logit: distributed IRLS — each iteration is one aggregation
  *     pass computing every variable's weighted normal equations and
  *     deviance simultaneously, with each variable's current β embedded as
  *     literals. Variables converge independently (statsmodels deviance
  *     criterion); typically < 10 passes.
  *
  * Numeric results are identical to the local Breeze kernel (same normal
  * equations, same convergence test) — asserted by the golden-output suite
  * which routes the continuous fixtures through this path.
  */
object AggregatedGlm {

  /** Max regression variables fitted per aggregation job: bounds the width
    * of a single agg (codegen/JVM method-size limits), while each batch
    * still amortizes one full scan over many models. */
  val BatchSize = 64

  val MaxIter = 100
  val Tol = 1e-8

  /** Can (outcome, covariates, rvs) run on this path? All design columns
    * must be numerically encodable without observed-level discovery. */
  def supports(cf: CladeFrame, outcome: String, covariates: Seq[String],
               rvs: Seq[String], standardize: Boolean): Boolean = {
    val oOk = cf.typeOf(outcome) == Continuous ||
      (cf.typeOf(outcome) == Binary && cf.levels.contains(outcome))
    oOk && !standardize &&
      covariates.forall(cf.typeOf(_) == Continuous) &&
      rvs.forall(cf.typeOf(_) == Continuous)
  }

  def run(spark: SparkSession, cf: CladeFrame, outcome: String,
          covariates: Seq[String], rvs: Seq[String], minN: Long): DataFrame = {
    import spark.implicits._
    val binaryOutcome = cf.typeOf(outcome) == Binary
    val yExpr: Column =
      if (!binaryOutcome) col(outcome).cast("double")
      else {
        val levels0 = cf.levels(outcome).sorted
        val levels = if (levels0 == Seq("Case", "Control")) Seq("Control", "Case") else levels0
        require(levels.size == 2, s"binary outcome $outcome needs 2 levels")
        when(col(outcome).cast("string") === levels(1), 1.0).otherwise(0.0)
      }
    val results = rvs.grouped(BatchSize).flatMap { batch =>
      if (binaryOutcome) fitBinomialBatch(cf.df, yExpr, Seq(outcome), covariates, batch, minN)
      else fitGaussianBatch(cf.df, yExpr, Seq(outcome), covariates, batch, minN)
    }.toSeq
    results.map { r =>
      AssocResult(r.variable, outcome, "continuous", None, r.converged, r.n,
        r.beta, r.se, r.pvalue, None, None, r.pvalue)
    }.toDF()
  }

  private final case class RvFit(variable: String, n: Long, converged: Boolean,
                                 beta: Option[Double], se: Option[Double],
                                 pvalue: Option[Double])

  /** Design columns for variable v: [1, covars..., v]. */
  private def design(covariates: Seq[String], v: String): Seq[Column] =
    lit(1.0) +: covariates.map(col(_).cast("double")) :+ col(v).cast("double")

  private def maskFor(yExpr: Column, covariates: Seq[String], v: String,
                      outcomeCols: Seq[String]): Column =
    (outcomeCols.map(col(_).isNotNull) ++ covariates.map(col(_).isNotNull) :+
      col(v).isNotNull).reduce(_ && _)

  /** Upper-triangle indices of a p×p symmetric matrix. */
  private def tri(p: Int): Seq[(Int, Int)] =
    for (i <- 0 until p; j <- i until p) yield (i, j)

  // ------------------------------------------------------------- Gaussian

  private def fitGaussianBatch(df: DataFrame, yExpr: Column, outCols: Seq[String],
                               covariates: Seq[String], batch: Seq[String],
                               minN: Long): Seq[RvFit] = {
    val p = covariates.size + 2 // intercept + covars + rv
    // per rv: n, y'y, Z'y (p), Z'Z upper triangle (p(p+1)/2)
    val aggs: Seq[Column] = batch.flatMap { v =>
      val z = design(covariates, v)
      val m = maskFor(yExpr, covariates, v, outCols)
      val y = when(m, yExpr)
      Seq(
        sum(when(m, 1L).otherwise(0L)).as(s"n_$v"),
        sum(y * y).as(s"yy_$v")) ++
        z.zipWithIndex.map { case (zi, i) => sum(when(m, zi) * yExpr).as(s"zy_${i}_$v") } ++
        tri(p).map { case (i, j) => sum(when(m, z(i) * z(j))).as(s"zz_${i}_${j}_$v") }
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    var idx = 0
    def nextD(): Double = { val v = if (row.isNullAt(idx)) Double.NaN else row.getDouble(idx); idx += 1; v }
    def nextL(): Long = { val v = if (row.isNullAt(idx)) 0L else row.getLong(idx); idx += 1; v }
    batch.map { v =>
      val n = nextL()
      val yy = nextD()
      val zy = DenseVector(Array.fill(p)(nextD()))
      val a = DenseMatrix.zeros[Double](p, p)
      tri(p).foreach { case (i, j) => val x = nextD(); a(i, j) = x; a(j, i) = x }
      if (n < minN || n <= p) RvFit(v, n, converged = false, None, None, None)
      else try {
        val ainv = inv(a)
        val b = ainv * zy
        val sse = math.max(yy - (b dot zy), 0.0)
        val scale = sse / (n - p)
        val se = math.sqrt(ainv(p - 1, p - 1) * scale)
        val beta = b(p - 1)
        val pv = Distributions.tSfTwoSided(beta / se, (n - p).toDouble)
        RvFit(v, n, converged = true, Some(beta), Some(se), Some(pv))
      } catch { case _: Exception => RvFit(v, n, converged = false, None, None, None) }
    }
  }

  // ------------------------------------------------------------- Binomial

  private def fitBinomialBatch(df: DataFrame, yExpr: Column, outCols: Seq[String],
                               covariates: Seq[String], batch: Seq[String],
                               minN: Long): Seq[RvFit] = {
    val p = covariates.size + 2
    val nTri = tri(p).size

    // state per rv
    val lastAinv = scala.collection.mutable.Map[String, DenseMatrix[Double]]()
    val beta = scala.collection.mutable.Map[String, DenseVector[Double]]()
    val dev = scala.collection.mutable.Map[String, Double]()
    val done = scala.collection.mutable.Map[String, Boolean]()
    val failed = scala.collection.mutable.Map[String, Boolean]()
    val ns = scala.collection.mutable.Map[String, Long]()
    batch.foreach { v => done(v) = false; failed(v) = false }

    var iter = 0
    while (iter < MaxIter && batch.exists(v => !done(v) && !failed(v))) {
      val active = batch.filter(v => !done(v) && !failed(v))
      val aggs: Seq[Column] = active.flatMap { v =>
        val z = design(covariates, v)
        val m = maskFor(yExpr, covariates, v, outCols)
        // mu: first iteration uses the statsmodels start mu=(y+1/2)/2;
        // later iterations use the current linear predictor
        val mu: Column =
          if (iter == 0) (yExpr + 0.5) / 2.0
          else {
            val b = beta(v)
            val eta = z.zipWithIndex.map { case (zi, i) => zi * lit(b(i)) }.reduce(_ + _)
            lit(1.0) / (lit(1.0) + exp(-eta))
          }
        val vfun = greatest(mu * (lit(1.0) - mu), lit(1e-10))
        val eta: Column =
          if (iter == 0) log(mu / (lit(1.0) - mu))
          else {
            val b = beta(v)
            z.zipWithIndex.map { case (zi, i) => zi * lit(b(i)) }.reduce(_ + _)
          }
        val zr = eta + (yExpr - mu) / vfun // working response
        val w = vfun
        // deviance terms for y in {0,1}
        val devTerm = lit(2.0) * (
          when(yExpr > 0, yExpr * log(yExpr / mu)).otherwise(0.0) +
          when(yExpr < 1, (lit(1.0) - yExpr) * log((lit(1.0) - yExpr) / (lit(1.0) - mu))).otherwise(0.0))
        Seq(
          sum(when(m, 1L).otherwise(0L)).as(s"n_$v"),
          sum(when(m, devTerm)).as(s"dev_$v")) ++
          z.zipWithIndex.map { case (zi, i) => sum(when(m, w * zi * zr)).as(s"wzr_${i}_$v") } ++
          tri(p).map { case (i, j) => sum(when(m, w * z(i) * z(j))).as(s"wzz_${i}_${j}_$v") }
      }
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      var idx = 0
      def nextD(): Double = { val x = if (row.isNullAt(idx)) Double.NaN else row.getDouble(idx); idx += 1; x }
      def nextL(): Long = { val x = if (row.isNullAt(idx)) 0L else row.getLong(idx); idx += 1; x }
      active.foreach { v =>
        val n = nextL(); ns(v) = n
        val newDev = nextD()
        val c = DenseVector(Array.fill(p)(nextD()))
        val a = DenseMatrix.zeros[Double](p, p)
        tri(p).foreach { case (i, j) => val x = nextD(); a(i, j) = x; a(j, i) = x }
        if (n < minN || n <= p) { failed(v) = true }
        else try {
          beta(v) = inv(a) * c
          // store A^-1 of the LAST weight update for SEs
          lastAinv(v) = inv(a)
          if (iter > 0 && math.abs(newDev - dev.getOrElse(v, Double.MaxValue)) <=
              Tol * (math.abs(newDev) + Tol)) done(v) = true
          dev(v) = newDev
        } catch { case _: Exception => failed(v) = true }
      }
      iter += 1
    }

    // one final pass at the converged betas for exact SEs (vcov must be
    // evaluated AT the final beta, matching the local kernel)
    val fitted = batch.filter(v => !failed(v) && beta.contains(v))
    if (fitted.nonEmpty) {
      val aggs: Seq[Column] = fitted.flatMap { v =>
        val z = design(covariates, v)
        val m = maskFor(yExpr, covariates, v, outCols)
        val b = beta(v)
        val eta = z.zipWithIndex.map { case (zi, i) => zi * lit(b(i)) }.reduce(_ + _)
        val mu = lit(1.0) / (lit(1.0) + exp(-eta))
        val w = greatest(mu * (lit(1.0) - mu), lit(1e-10))
        tri(p).map { case (i, j) => sum(when(m, w * z(i) * z(j))).as(s"f_${i}_${j}_$v") }
      }
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      var idx = 0
      def nextD(): Double = { val x = if (row.isNullAt(idx)) Double.NaN else row.getDouble(idx); idx += 1; x }
      fitted.foreach { v =>
        val a = DenseMatrix.zeros[Double](p, p)
        tri(p).foreach { case (i, j) => val x = nextD(); a(i, j) = x; a(j, i) = x }
        try lastAinv(v) = inv(a) catch { case _: Exception => failed(v) = true }
      }
    }

    batch.map { v =>
      if (failed(v) || !beta.contains(v))
        RvFit(v, ns.getOrElse(v, 0L), converged = false, None, None, None)
      else {
        val b = beta(v)(p - 1)
        val se = math.sqrt(lastAinv(v)(p - 1, p - 1))
        RvFit(v, ns(v), done(v), Some(b), Some(se),
          Some(Distributions.zSfTwoSided(b / se)))
      }
    }
  }


}
