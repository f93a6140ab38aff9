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
  *     Categorical variables with KNOWN levels (metadata) fit in the SAME
  *     single pass: the full design uses all-levels dummies without an
  *     intercept (same span as intercept + L-1 dummies; SSE/LRT are
  *     parameterization-invariant), level occupancy falls out of the Z'Z
  *     diagonal (empty-level pruning matching `_remove_empty_categories`,
  *     plus a stale-metadata guard), and the restricted model solves on
  *     the {intercept, covars} block of the same statistics.
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
      case Categorical => cf.levels.contains(rv)
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
        r.beta, r.se, r.betaPvalue, r.lrtPvalue, r.diffAic, r.pvalue,
        error = r.error)
    }.toDF()
  }

  private final case class RvFit(
      variable: String, kind: String, n: Long, converged: Boolean,
      beta: Option[Double] = None, se: Option[Double] = None,
      betaPvalue: Option[Double] = None, lrtPvalue: Option[Double] = None,
      diffAic: Option[Double] = None, pvalue: Option[Double] = None,
      error: Option[String] = None)

  /** Numeric encoding of the tested column for continuous/binary rvs
    * (binary "treated as continuous 0/1", sorted second level = 1). */
  private def rvNumeric(cf: CladeFrame, v: String): Column = cf.typeOf(v) match {
    case Binary =>
      val second = cf.levels(v).sorted.lift(1)
      when(col(v).cast("string") === second.orNull, 1.0).otherwise(0.0)
    case _ => col(v).cast("double")
  }

  private def tryD(c: String): Column = expr(s"try_cast(`$c` AS DOUBLE)")

  /** Complete-case mask over the EFFECTIVE design expressions: a value that
    * survives a raw null check but fails its numeric cast must not be
    * counted in n while contributing nothing to the sums. Numeric casts use
    * try_cast (ANSI-safe); binary/categorical columns are string-encoded,
    * so their raw null check is the right predicate. */
  private def maskFor(cf: CladeFrame, covariates: Seq[String], v: String,
                      outcomeCols: Seq[String]): Column = {
    def notNullFor(c: String): Column = cf.typeOf(c) match {
      case Continuous => tryD(c).isNotNull
      case _          => col(c).isNotNull
    }
    (outcomeCols.map(notNullFor) ++ covariates.map(notNullFor) :+
      notNullFor(v)).reduce(_ && _)
  }

  private def tri(p: Int): Seq[(Int, Int)] =
    for (i <- 0 until p; j <- i until p) yield (i, j)

  // ------------------------------------------------------------- Gaussian

  private final case class GaussStats(n: Long, yy: Double,
                                      zy: DenseVector[Double], zz: DenseMatrix[Double])

  /** OLS solve from sufficient stats; returns (beta, Ainv, sse, llf, aic).
    * llf/aic follow statsmodels Gaussian loglike with estimated scale. */
  private def solveGauss(s: GaussStats): (DenseVector[Double], DenseMatrix[Double], Double, Double, Double) = {
    val p = s.zy.length
    val ainv =
      try inv(s.zz)
      catch { case _: Exception => breeze.linalg.pinv(s.zz) }
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
    // Design columns per rv, ONE pass for everything:
    //  - continuous/binary: [1, covars, rv]
    //  - categorical: [1, covars, dummy(l) for EVERY declared level] — the
    //    FULL model solves on {covars, dummies} WITHOUT the intercept (the
    //    all-levels dummy block spans the same space as intercept +
    //    (L-1) dummies, and the LRT/SSE are parameterization-invariant),
    //    while the restricted model solves on the {1, covars} block of the
    //    SAME statistics. Level occupancy comes free as the dummy diagonal
    //    of Z'Z: empty levels are pruned driver-side, and a diagonal sum
    //    below n exposes stale level metadata (values outside the declared
    //    levels) instead of silently pooling rows into a reference level.
    def zColumns(v: String): Seq[Column] = {
      val base = lit(1.0) +: covariates.map(col(_).cast("double"))
      cf.typeOf(v) match {
        case Categorical => base ++ cf.levels(v).sorted.map(lvl =>
          when(col(v).cast("string") === lvl, 1.0).otherwise(0.0))
        case _ => base :+ rvNumeric(cf, v)
      }
    }
    val p0 = covariates.size + 1

    val aggs: Seq[Column] = batch.flatMap { v =>
      val z = zColumns(v)
      val p = z.size
      val m = maskFor(cf, covariates, v, outCols)
      // castfail: rows where the raw value is present but its numeric cast
      // fails — the reference's astype(float) would error the variable
      // (captured per-variable, base.py:155-195), not silently drop rows
      val castFail: Column = cf.typeOf(v) match {
        case Continuous => sum(when(col(v).isNotNull && tryD(v).isNull, 1L).otherwise(0L))
        case _          => lit(0L) // binary/categorical encode string levels
      }
      Seq(
        sum(when(m, 1L).otherwise(0L)).as(s"n_$v"),
        castFail.as(s"castfail_$v"),
        sum(when(m, yExpr * yExpr)).as(s"yy_$v")) ++
        z.zipWithIndex.map { case (zi, i) => sum(when(m, zi * yExpr)).as(s"zy_${i}_$v") } ++
        tri(p).map { case (i, j) => sum(when(m, z(i) * z(j))).as(s"zz_${i}_${j}_$v") }
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    var idx = 0
    def nextD(): Double = { val x = if (row.isNullAt(idx)) Double.NaN else row.getDouble(idx); idx += 1; x }
    def nextL(): Long = { val x = if (row.isNullAt(idx)) 0L else row.getLong(idx); idx += 1; x }

    batch.map { v =>
      val categorical = cf.typeOf(v) == Categorical
      val pAll = zColumns(v).size
      val n = nextL()
      val castFails = nextL()
      val yy = nextD()
      val zy = DenseVector(Array.fill(pAll)(nextD()))
      val zz = DenseMatrix.zeros[Double](pAll, pAll)
      tri(pAll).foreach { case (i, j) => val x = nextD(); zz(i, j) = x; zz(j, i) = x }
      val kind = cf.typeOf(v).name

      def sub(ix: Seq[Int]): GaussStats = GaussStats(n, yy,
        DenseVector(ix.map(zy(_)).toArray),
        DenseMatrix.tabulate(ix.size, ix.size)((a, b) => zz(ix(a), ix(b))))

      // drop covariates that do not vary under this mask (var from stats:
      // zz_jj/n - mean^2), matching the collect path / reference base.py
      def varying(ix: Seq[Int]): Seq[Int] = ix.filter { j =>
        val mean = zz(0, j) / n
        (zz(j, j) / n - mean * mean) > 1e-12
      }

      if (castFails > 0)
        RvFit(v, kind, n, converged = false, error = Some(
          s"NumberFormatException: $castFails value(s) of '$v' could not be cast to numeric"))
      else if (n < minN || n <= 2) RvFit(v, kind, n, converged = false,
        error = Some(s"too few complete observations (min_n filter: $n < $minN)"))
      else try {
        val covarIx = varying(1 until p0)
        if (categorical) {
          // occupied levels from the dummy diagonal
          val dummyIx = (p0 until pAll).filter(j => zz(j, j) > 0)
          val occupancy = (p0 until pAll).map(j => zz(j, j)).sum
          require(math.abs(occupancy - n) < 0.5,
            s"level metadata for $v is stale: ${n - occupancy.toLong} row(s) " +
              "hold values outside the declared levels")
          val fullIx = covarIx ++ dummyIx   // interceptless full design
          val restIx = 0 +: covarIx         // intercept + covars
          if (dummyIx.size < 2 || n <= fullIx.size + 1)
            RvFit(v, kind, n, converged = false)
          else {
            val (_, _, _, llfF, aicF) = solveGauss(sub(fullIx))
            val (_, _, _, llfR, aicR) = solveGauss(sub(restIx))
            val lrstat = -2.0 * (llfR - llfF)
            val lrdf = (fullIx.size - restIx.size).toDouble
            val lrP = Distributions.chi2Sf(lrstat, lrdf)
            RvFit(v, kind, n, converged = true,
              lrtPvalue = Some(lrP), diffAic = Some(aicF - aicR), pvalue = Some(lrP))
          }
        } else {
          // the rv itself must vary under the mask — otherwise pinv would
          // return a minimum-norm split between intercept and rv reported
          // as converged (collect path nulls this case via Term.varies)
          if (varying(Seq(pAll - 1)).isEmpty)
            RvFit(v, kind, n, converged = false,
              error = Some(s"variable '$v' does not vary"))
          else {
          val ix = (0 +: covarIx) :+ (pAll - 1)
          val p = ix.size
          if (n <= p) RvFit(v, kind, n, converged = false)
          else {
            val (b, ainv, sse, _, _) = solveGauss(sub(ix))
            val scale = sse / (n - p)
            val se = math.sqrt(ainv(p - 1, p - 1) * scale)
            val beta = b(p - 1)
            val pv = Distributions.tSfTwoSided(beta / se, (n - p).toDouble)
            RvFit(v, kind, n, converged = true, Some(beta), Some(se), Some(pv),
              pvalue = Some(pv))
          }
          }
        }
      } catch { case e: Exception => RvFit(v, kind, n, converged = false,
        error = Some(s"${e.getClass.getSimpleName}: ${e.getMessage}")) }
    }
  }

  // ------------------------------------------------------------- Binomial

  /** One IRLS state: a design (column expressions) fitted under a mask.
    * Numeric rvs have one model; categorical rvs have a full model
    * (interceptless all-levels dummies + covars — same span as intercept +
    * L-1 dummies, deviance-invariant) and a restricted model (intercept +
    * covars) under the SAME mask, so the working LRT is fully distributed. */
  private final case class IrlsModel(key: String, rv: String,
                                     cols: Seq[Column], mask: Column) {
    def p: Int = cols.size
  }

  private def fitBinomialBatch(cf: CladeFrame, df: DataFrame, yExpr: Column,
                               outCols: Seq[String], covariates: Seq[String],
                               batch: Seq[String], minN: Long): Seq[RvFit] = {
    val covarCols = covariates.map(col(_).cast("double"))

    val models: Seq[IrlsModel] = batch.flatMap { v =>
      val m = maskFor(cf, covariates, v, outCols)
      cf.typeOf(v) match {
        case Categorical =>
          val dummies = cf.levels(v).sorted.map(lvl =>
            when(col(v).cast("string") === lvl, 1.0).otherwise(0.0))
          Seq(
            IrlsModel(s"$v@full", v, covarCols ++ dummies, m),
            IrlsModel(s"$v@rest", v, lit(1.0) +: covarCols, m))
        case _ =>
          Seq(IrlsModel(v, v, (lit(1.0) +: covarCols) :+ rvNumeric(cf, v), m))
      }
    }

    val lastAinv = scala.collection.mutable.Map[String, DenseMatrix[Double]]()
    val beta = scala.collection.mutable.Map[String, DenseVector[Double]]()
    val dev = scala.collection.mutable.Map[String, Double]()
    val done = scala.collection.mutable.Map[String, Boolean]()
    val failed = scala.collection.mutable.Map[String, Boolean]()
    val ns = scala.collection.mutable.Map[String, Long]()
    val levelCounts = scala.collection.mutable.Map[String, Seq[Long]]()
    models.foreach { md => done(md.key) = false; failed(md.key) = false }
    def rvFailed(v: String): Boolean =
      models.filter(_.rv == v).exists(md => failed(md.key))

    var iter = 0
    while (iter < MaxIter &&
        models.exists(md => !done(md.key) && !failed(md.key) && !rvFailed(md.rv))) {
      val active = models.filter(md => !done(md.key) && !failed(md.key) && !rvFailed(md.rv))
      val catRvs = if (iter == 0) batch.filter(v => cf.typeOf(v) == Categorical) else Nil
      val aggs: Seq[Column] = active.flatMap { md =>
        val z = md.cols
        val p = md.p
        val m = md.mask
        // mu: first iteration uses the statsmodels start mu=(y+1/2)/2;
        // later iterations use the current linear predictor
        val mu: Column =
          if (iter == 0) (yExpr + 0.5) / 2.0
          else {
            val b = beta(md.key)
            val eta = z.zipWithIndex.map { case (zi, i) => zi * lit(b(i)) }.reduce(_ + _)
            lit(1.0) / (lit(1.0) + exp(-eta))
          }
        val vfun = greatest(mu * (lit(1.0) - mu), lit(1e-10))
        val eta: Column =
          if (iter == 0) log(mu / (lit(1.0) - mu))
          else {
            val b = beta(md.key)
            z.zipWithIndex.map { case (zi, i) => zi * lit(b(i)) }.reduce(_ + _)
          }
        val zr = eta + (yExpr - mu) / vfun // working response
        val w = vfun
        // clamp mu for the deviance exactly like the local kernel does —
        // a saturated row with opposing y must not drive deviance to Inf
        val muC = least(greatest(mu, lit(1e-10)), lit(1.0 - 1e-10))
        val devTerm = lit(2.0) * (
          when(yExpr > 0, yExpr * log(yExpr / muC)).otherwise(0.0) +
          when(yExpr < 1, (lit(1.0) - yExpr) * log((lit(1.0) - yExpr) / (lit(1.0) - muC))).otherwise(0.0))
        Seq(
          sum(when(m, 1L).otherwise(0L)).as(s"n_${md.key}"),
          sum(when(m, devTerm)).as(s"dev_${md.key}")) ++
          z.zipWithIndex.map { case (zi, i) => sum(when(m, w * zi * zr)).as(s"wzr_${i}_${md.key}") } ++
          tri(p).map { case (i, j) => sum(when(m, w * z(i) * z(j))).as(s"wzz_${i}_${j}_${md.key}") }
      } ++ catRvs.flatMap { v =>
        // iteration 0 only: masked level occupancy (empty-level df pruning
        // + stale-metadata guard), like the gaussian path's Z'Z diagonal
        val m = maskFor(cf, covariates, v, outCols)
        cf.levels(v).map(lvl =>
          sum(when(m && col(v).cast("string") === lvl, 1L).otherwise(0L))
            .as(s"lc_${v}_$lvl"))
      }
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      var idx = 0
      def nextD(): Double = { val x = if (row.isNullAt(idx)) Double.NaN else row.getDouble(idx); idx += 1; x }
      def nextL(): Long = { val x = if (row.isNullAt(idx)) 0L else row.getLong(idx); idx += 1; x }
      active.foreach { md =>
        val p = md.p
        val n = nextL(); ns(md.key) = n
        val newDev = nextD()
        val c = DenseVector(Array.fill(p)(nextD()))
        val a = DenseMatrix.zeros[Double](p, p)
        tri(p).foreach { case (i, j) => val x = nextD(); a(i, j) = x; a(j, i) = x }
        if (n < minN || n <= p) { failed(md.key) = true }
        else try {
          val ai = try inv(a) catch { case _: Exception => breeze.linalg.pinv(a) }
          beta(md.key) = ai * c
          lastAinv(md.key) = ai
          if (iter > 0 && math.abs(newDev - dev.getOrElse(md.key, Double.MaxValue)) <=
              Tol * (math.abs(newDev) + Tol)) done(md.key) = true
          dev(md.key) = newDev
        } catch { case _: Exception => failed(md.key) = true }
      }
      catRvs.foreach { v =>
        levelCounts(v) = cf.levels(v).map(_ => nextL())
      }
      iter += 1
    }

    // one final pass at the converged betas for exact SEs of numeric rvs
    // (vcov evaluated AT the final beta, matching the local kernel)
    val numericFitted = models.filter(md =>
      md.key == md.rv && !failed(md.key) && beta.contains(md.key))
    if (numericFitted.nonEmpty) {
      val aggs: Seq[Column] = numericFitted.flatMap { md =>
        val z = md.cols
        val b = beta(md.key)
        val eta = z.zipWithIndex.map { case (zi, i) => zi * lit(b(i)) }.reduce(_ + _)
        val mu = lit(1.0) / (lit(1.0) + exp(-eta))
        val w = greatest(mu * (lit(1.0) - mu), lit(1e-10))
        tri(md.p).map { case (i, j) => sum(when(md.mask, w * z(i) * z(j))).as(s"f_${i}_${j}_${md.key}") }
      }
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      var idx = 0
      def nextD(): Double = { val x = if (row.isNullAt(idx)) Double.NaN else row.getDouble(idx); idx += 1; x }
      numericFitted.foreach { md =>
        val p = md.p
        val a = DenseMatrix.zeros[Double](p, p)
        tri(p).foreach { case (i, j) => val x = nextD(); a(i, j) = x; a(j, i) = x }
        try lastAinv(md.key) = inv(a) catch { case _: Exception => failed(md.key) = true }
      }
    }

    batch.map { v =>
      val kind = cf.typeOf(v).name
      cf.typeOf(v) match {
        case Categorical =>
          val fullK = s"$v@full"; val restK = s"$v@rest"
          val n = ns.getOrElse(fullK, 0L)
          if (rvFailed(v) || !dev.contains(fullK) || !dev.contains(restK))
            RvFit(v, kind, n, converged = false, error = Some(
              if (n < minN) s"too few complete observations (min_n filter: $n < $minN)"
              else "IRLS failed (singular weighted design or aggregation failure)"))
          else {
            val occupancy = levelCounts(v)
            val nOccupied = occupancy.count(_ > 0)
            val covered = occupancy.sum
            if (math.abs(covered - n) > 0)
              throw new IllegalArgumentException(
                s"level metadata for $v is stale: ${n - covered} row(s) hold " +
                  "values outside the declared levels")
            if (nOccupied < 2) RvFit(v, kind, n, converged = false)
            else {
              val lrstat = dev(restK) - dev(fullK)
              val lrdf = (nOccupied - 1).toDouble
              val lrP = Distributions.chi2Sf(lrstat, lrdf)
              // binary-y binomial llf = -dev/2 exactly, so
              // Diff_AIC = (dev_f + 2 p_f) - (dev_r + 2 p_r) = 2*lrdf - lrstat
              val diffAic = 2.0 * lrdf - lrstat
              RvFit(v, kind, n, done(fullK) && done(restK),
                lrtPvalue = Some(lrP), diffAic = Some(diffAic), pvalue = Some(lrP))
            }
          }
        case _ =>
          if (failed(v) || !beta.contains(v))
            RvFit(v, kind, ns.getOrElse(v, 0L), converged = false, error = Some {
              val n = ns.getOrElse(v, 0L)
              if (n < minN) s"too few complete observations (min_n filter: $n < $minN)"
              else "IRLS failed (singular weighted design or aggregation failure)"
            })
          else {
            val p = beta(v).length
            val b = beta(v)(p - 1)
            val se = math.sqrt(lastAinv(v)(p - 1, p - 1))
            val pv = Distributions.zSfTwoSided(b / se)
            RvFit(v, kind, ns(v), done(v), Some(b), Some(se), Some(pv), pvalue = Some(pv))
          }
      }
    }
  }
}
