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
  * When the table is instead billions of rows × a variable set whose design
  * columns are expressible without observed-level discovery, the data must
  * never be collected or reshuffled. This path expresses each per-variable
  * model fit purely as AGGREGATES over the observation table:
  *
  *   - Gaussian/identity: the normal equations Z'Z·β = Z'y per variable are
  *     sums of column products under that variable's complete-case mask —
  *     ONE map-side-combined aggregation pass fits EVERY variable at once
  *     (batched to keep codegen happy); the p×p solves are driver-side
  *     microseconds. Zero shuffles of data rows; the scan streams once.
  *     Categorical variables with KNOWN levels (metadata) use a cheap
  *     level-count pre-pass (empty-level pruning, matching
  *     `_remove_empty_categories`) and the restricted model's statistics
  *     are the leading block of the full model's — the LRT is fully
  *     distributed with no extra scan.
  *   - Binomial/logit: distributed IRLS — each iteration is one aggregation
  *     pass computing every variable's weighted normal equations and
  *     deviance simultaneously, with each variable's current β embedded as
  *     literals. Variables converge independently (statsmodels deviance
  *     criterion); typically < 10 passes. Continuous and binary (0/1
  *     encodable) variables run here; categorical-rv logistic LRT stays on
  *     the fan-out path.
  *
  * Numeric results are identical to the local Breeze kernel (same normal
  * equations, same convergence test) — asserted by the golden-output suite
  * and by an equivalence test against the collect path.
  */
object AggregatedGlm {

  /** Max regression variables fitted per aggregation job: bounds the width
    * of a single agg (codegen/JVM method-size limits), while each batch
    * still amortizes one full scan over many models. */
  val BatchSize = 64

  val MaxIter = 100
  val Tol = 1e-8

  private def rvKindOk(cf: CladeFrame, rv: String, gaussian: Boolean): Boolean =
    cf.typeOf(rv) match {
      case Continuous  => true
      case Binary      => cf.levels.contains(rv)
      case Categorical => gaussian && cf.levels.contains(rv)
      case _           => false
    }

  /** Can (outcome, covariates, rvs) run on this path? */
  def supports(cf: CladeFrame, outcome: String, covariates: Seq[String],
               rvs: Seq[String], standardize: Boolean): Boolean = {
    val gaussian = cf.typeOf(outcome) == Continuous
    val oOk = gaussian || (cf.typeOf(outcome) == Binary && cf.levels.contains(outcome))
    oOk && !standardize &&
      covariates.forall(cf.typeOf(_) == Continuous) &&
      rvs.forall(rvKindOk(cf, _, gaussian))
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
      if (binaryOutcome)
        fitBinomialBatch(cf, cf.df, yExpr, Seq(outcome), covariates, batch, minN)
      else
        fitGaussianBatch(cf, cf.df, yExpr, Seq(outcome), covariates, batch, minN)
    }.toSeq
    results.map { r =>
      AssocResult(r.variable, outcome, r.kind, None, r.converged, r.n,
        r.beta, r.se, r.betaPvalue, r.lrtPvalue, r.diffAic, r.pvalue)
    }.toDF()
  }

  private final case class RvFit(
      variable: String, kind: String, n: Long, converged: Boolean,
      beta: Option[Double] = None, se: Option[Double] = None,
      betaPvalue: Option[Double] = None, lrtPvalue: Option[Double] = None,
      diffAic: Option[Double] = None, pvalue: Option[Double] = None)

  /** Numeric encoding of the tested column for continuous/binary rvs
    * (binary "treated as continuous 0/1", sorted second level = 1). */
  private def rvNumeric(cf: CladeFrame, v: String): Column = cf.typeOf(v) match {
    case Binary =>
      val second = cf.levels(v).sorted.lift(1)
      when(col(v).cast("string") === second.orNull, 1.0).otherwise(0.0)
    case _ => col(v).cast("double")
  }

  private def maskFor(covariates: Seq[String], v: String,
                      outcomeCols: Seq[String]): Column =
    (outcomeCols.map(col(_).isNotNull) ++ covariates.map(col(_).isNotNull) :+
      col(v).isNotNull).reduce(_ && _)

  private def tri(p: Int): Seq[(Int, Int)] =
    for (i <- 0 until p; j <- i until p) yield (i, j)

  // ------------------------------------------------------------- Gaussian

  private final case class GaussStats(n: Long, yy: Double,
                                      zy: DenseVector[Double], zz: DenseMatrix[Double])

  /** OLS solve from sufficient stats; returns (beta, Ainv, sse, llf, aic).
    * llf/aic follow statsmodels Gaussian loglike with estimated scale. */
  private def solveGauss(s: GaussStats): (DenseVector[Double], DenseMatrix[Double], Double, Double, Double) = {
    val p = s.zy.length
    val ainv = inv(s.zz)
    val b = ainv * s.zy
    val sse = math.max(s.yy - (b dot s.zy), 0.0)
    val scale = sse / (s.n - p)
    val llf = -0.5 * (sse / scale + s.n * math.log(2.0 * math.Pi * scale))
    val aic = -2.0 * llf + 2.0 * p
    (b, ainv, sse, llf, aic)
  }

  private def fitGaussianBatch(cf: CladeFrame, df: DataFrame, yExpr: Column,
                               outCols: Seq[String], covariates: Seq[String],
                               batch: Seq[String], minN: Long): Seq[RvFit] = {
    // ---- pass 0 (categorical rvs only): level counts under each rv's mask
    val catRvs = batch.filter(v => cf.typeOf(v) == Categorical)
    val levelCounts: Map[String, Seq[(String, Long)]] =
      if (catRvs.isEmpty) Map.empty
      else {
        val aggs = catRvs.flatMap { v =>
          val m = maskFor(covariates, v, outCols)
          cf.levels(v).map(lvl =>
            sum(when(m && col(v).cast("string") === lvl, 1L).otherwise(0L))
              .as(s"lc_${v}_$lvl"))
        }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        var idx = 0
        catRvs.map { v =>
          v -> cf.levels(v).map { lvl =>
            val c = if (row.isNullAt(idx)) 0L else row.getLong(idx)
            idx += 1
            (lvl, c)
          }
        }.toMap
      }

    // design columns per rv (sorted observed levels, first = reference)
    def rvColumns(v: String): Seq[Column] = cf.typeOf(v) match {
      case Categorical =>
        val observed = levelCounts(v).filter(_._2 > 0).map(_._1).sorted
        observed.drop(1).map(lvl =>
          when(col(v).cast("string") === lvl, 1.0).otherwise(0.0))
      case _ => Seq(rvNumeric(cf, v))
    }

    // ---- pass 1: full-model sufficient stats (the restricted model's
    // stats for categorical rvs are the leading block — same mask/columns)
    val p0 = covariates.size + 1
    val aggs: Seq[Column] = batch.flatMap { v =>
      val z = (lit(1.0) +: covariates.map(col(_).cast("double"))) ++ rvColumns(v)
      val p = z.size
      val m = maskFor(covariates, v, outCols)
      Seq(
        sum(when(m, 1L).otherwise(0L)).as(s"n_$v"),
        sum(when(m, yExpr * yExpr)).as(s"yy_$v")) ++
        z.zipWithIndex.map { case (zi, i) => sum(when(m, zi * yExpr)).as(s"zy_${i}_$v") } ++
        tri(p).map { case (i, j) => sum(when(m, z(i) * z(j))).as(s"zz_${i}_${j}_$v") }
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    var idx = 0
    def nextD(): Double = { val x = if (row.isNullAt(idx)) Double.NaN else row.getDouble(idx); idx += 1; x }
    def nextL(): Long = { val x = if (row.isNullAt(idx)) 0L else row.getLong(idx); idx += 1; x }

    batch.map { v =>
      val nRvCols = rvColumns(v).size
      val p = p0 + nRvCols
      val n = nextL()
      val yy = nextD()
      val zy = DenseVector(Array.fill(p)(nextD()))
      val zz = DenseMatrix.zeros[Double](p, p)
      tri(p).foreach { case (i, j) => val x = nextD(); zz(i, j) = x; zz(j, i) = x }
      val kind = cf.typeOf(v).name
      if (n < minN || n <= p || nRvCols == 0)
        RvFit(v, kind, n, converged = false)
      else try {
        val full = GaussStats(n, yy, zy, zz)
        cf.typeOf(v) match {
          case Categorical =>
            val rest = GaussStats(n, yy, zy(0 until p0).copy,
              zz(0 until p0, 0 until p0).copy)
            val (_, _, _, llfF, aicF) = solveGauss(full)
            val (_, _, _, llfR, aicR) = solveGauss(rest)
            val lrstat = -2.0 * (llfR - llfF)
            val lrdf = (p - p0).toDouble
            val lrP = Distributions.chi2Sf(lrstat, lrdf)
            RvFit(v, kind, n, converged = true,
              lrtPvalue = Some(lrP), diffAic = Some(aicF - aicR), pvalue = Some(lrP))
          case _ =>
            val (b, ainv, sse, _, _) = solveGauss(full)
            val scale = sse / (n - p)
            val se = math.sqrt(ainv(p - 1, p - 1) * scale)
            val beta = b(p - 1)
            val pv = Distributions.tSfTwoSided(beta / se, (n - p).toDouble)
            RvFit(v, kind, n, converged = true, Some(beta), Some(se), Some(pv),
              pvalue = Some(pv))
        }
      } catch { case _: Exception => RvFit(v, kind, n, converged = false) }
    }
  }

  // ------------------------------------------------------------- Binomial

  private def fitBinomialBatch(cf: CladeFrame, df: DataFrame, yExpr: Column,
                               outCols: Seq[String], covariates: Seq[String],
                               batch: Seq[String], minN: Long): Seq[RvFit] = {
    val p = covariates.size + 2

    def design(v: String): Seq[Column] =
      (lit(1.0) +: covariates.map(col(_).cast("double"))) :+ rvNumeric(cf, v)

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
        val z = design(v)
        val m = maskFor(covariates, v, outCols)
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
          lastAinv(v) = inv(a)
          if (iter > 0 && math.abs(newDev - dev.getOrElse(v, Double.MaxValue)) <=
              Tol * (math.abs(newDev) + Tol)) done(v) = true
          dev(v) = newDev
        } catch { case _: Exception => failed(v) = true }
      }
      iter += 1
    }

    // one final pass at the converged betas for exact SEs (vcov evaluated
    // AT the final beta, matching the local kernel within tolerance)
    val fitted = batch.filter(v => !failed(v) && beta.contains(v))
    if (fitted.nonEmpty) {
      val aggs: Seq[Column] = fitted.flatMap { v =>
        val z = design(v)
        val m = maskFor(covariates, v, outCols)
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
      val kind = cf.typeOf(v).name
      if (failed(v) || !beta.contains(v))
        RvFit(v, kind, ns.getOrElse(v, 0L), converged = false)
      else {
        val b = beta(v)(p - 1)
        val se = math.sqrt(lastAinv(v)(p - 1, p - 1))
        val pv = Distributions.zSfTwoSided(b / se)
        RvFit(v, kind, ns(v), done(v), Some(b), Some(se), Some(pv), pvalue = Some(pv))
      }
    }
  }
}
