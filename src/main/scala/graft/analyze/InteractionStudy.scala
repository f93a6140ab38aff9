package graft.analyze

import breeze.linalg.DenseVector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{CladeFrame, VariableType}
import graft.stats.{DesignMatrix, Glm}
import VariableType._

/** One row of the interaction-study results table
  * (reference: interaction_regression.py:143-168). */
final case class InteractionResult(
    Term1: String,
    Term2: String,
    Outcome: String,
    Converged: Boolean,
    N: Long,
    Beta: Option[Double],
    SE: Option[Double],
    Beta_pvalue: Option[Double],
    LRT_pvalue: Option[Double])

/** One row per interaction parameter in `report_betas` mode
  * (reference: interaction_regression.py:255-295) — reduced- and full-model
  * coefficients for each interaction design column. */
final case class InteractionBetaResult(
    Term1: String, Term2: String, Outcome: String, Parameter: String,
    Converged: Boolean, N: Long, LRT_pvalue: Option[Double],
    Red_Var1_beta: Option[Double], Red_Var1_SE: Option[Double], Red_Var1_Pval: Option[Double],
    Red_Var2_beta: Option[Double], Red_Var2_SE: Option[Double], Red_Var2_Pval: Option[Double],
    Full_Var1_Var2_beta: Option[Double], Full_Var1_Var2_SE: Option[Double],
    Full_Var1_Var2_Pval: Option[Double],
    Full_Var1_beta: Option[Double], Full_Var1_SE: Option[Double], Full_Var1_Pval: Option[Double],
    Full_Var2_beta: Option[Double], Full_Var2_SE: Option[Double], Full_Var2_Pval: Option[Double])

/** Pairwise interaction study — `analyze.interaction_study`
  * (reference: clarite/modules/analyze/interaction_study.py:10-137,
  * interaction_regression.py:22-501). For each pair (v1, v2): LRT of
  * `y ~ 1 + covars + v1 + v2 + v1:v2` against the model without the
  * interaction term.
  *
  * Execution: interaction studies run over a SELECTED set of variables (all
  * pairs of a shortlist, or an explicit pair list — the all-pairs fan-out is
  * quadratic, so the variable set is small by construction). We therefore
  * broadcast the projected column block once and fan the PAIRS out across
  * executors; each task fits two local GLMs. The pair list is a Dataset, so
  * a million pairs still distributes evenly.
  */
object InteractionStudy {

  def run(
      spark: SparkSession,
      cf: CladeFrame,
      outcome: String,
      interactions: Seq[(String, String)],
      covariates: Seq[String] = Nil,
      minN: Long = 200,
      reportBetas: Boolean = false): DataFrame = {
    import spark.implicits._
    require(interactions.nonEmpty, "no interaction pairs")
    val outcomeType = cf.typeOf(outcome)
    val family = outcomeType match {
      case Continuous => Glm.Gaussian
      case Binary     => Glm.Binomial
      case t => throw new IllegalArgumentException(s"bad outcome type $t")
    }
    val vars = interactions.flatMap(p => Seq(p._1, p._2)).distinct

    // broadcast the full projected block (outcome + covars + interaction
    // vars as strings); complete-case on outcome+covars only — per-pair
    // completeness is decided in the task
    val cols = outcome +: (covariates ++ vars)
    val rows = cf.df
      .select(cols.map(c => col(c).cast("string").as(c)): _*)
      .na.drop("any", outcome +: covariates)
      .collect()
    val n0 = rows.length
    val colIdx = cols.zipWithIndex.toMap

    val yRaw = Array.tabulate(n0)(i => rows(i).getString(0))
    val y: Array[Double] = outcomeType match {
      case Continuous => yRaw.map(_.toDouble)
      case Binary =>
        val levels0 = cf.levels.getOrElse(outcome, yRaw.distinct.sorted.toSeq).sorted
        val levels =
          if (levels0 == Seq("Case", "Control")) Seq("Control", "Case") else levels0
        yRaw.map(v => if (v == levels(1)) 1.0 else 0.0)
      case _ => throw new IllegalStateException("unreachable")
    }
    val colData: Map[String, Array[String]] = (covariates ++ vars).map { c =>
      c -> Array.tabulate(n0)(i => rows(i).getString(colIdx(c)))
    }.toMap
    val typesMap = (covariates ++ vars).map(c => c -> cf.typeOf(c).name).toMap
    val levelsMap = cf.levels

    val yB = spark.sparkContext.broadcast(y)
    val colsB = spark.sparkContext.broadcast(colData)

    val outcomeName = outcome
    val pairsDs = interactions.toDS().repartition(
      math.min(interactions.size, spark.sparkContext.defaultParallelism))
    if (!reportBetas) {
      val results = pairsDs.map { case (v1, v2) =>
        fitPair(v1, v2, outcomeName, yB.value, colsB.value, typesMap, levelsMap,
          covariates, family, minN)
      }
      results.toDF().orderBy(col("LRT_pvalue").asc_nulls_last, col("Term1"), col("Term2"))
    } else {
      val results = pairsDs.flatMap { case (v1, v2) =>
        fitPairBetas(v1, v2, outcomeName, yB.value, colsB.value, typesMap,
          levelsMap, covariates, family, minN)
      }
      results.toDF().orderBy(col("LRT_pvalue").asc_nulls_last,
        col("Full_Var1_Var2_Pval").asc_nulls_last, col("Parameter"))
    }
  }

  /** report_betas mode: one row per interaction design column with reduced-
    * and full-model coefficient reports (reference:
    * interaction_regression.py:255-295). */
  private def fitPairBetas(
      v1: String, v2: String, outcome: String,
      y: Array[Double], colData: Map[String, Array[String]],
      types: Map[String, String], levels: Map[String, Seq[String]],
      covariates: Seq[String], family: Glm.Family, minN: Long): Seq[InteractionBetaResult] = {
    // failures yield a visible non-converged placeholder row, never a
    // silently-vanished pair (the reference emits 'NOT Converge' rows)
    def failRow(n: Long) = Seq(InteractionBetaResult(v1, v2, outcome,
      s"$v1:$v2", Converged = false, n, None, None, None, None, None, None,
      None, None, None, None, None, None, None, None, None, None))
    try {
      val a1 = colData(v1); val a2 = colData(v2)
      val idx = (0 until y.length).filter(i => a1(i) != null && a2(i) != null).toArray
      val n = idx.length
      if (n < minN || n < 3) return failRow(n)

      val ySub = DenseVector(idx.map(y))
      val covarTerms = covariates.map(c => term(c, types(c), idx.map(colData(c)), levels))
      val t1 = term(v1, types(v1), idx.map(a1), levels)
      val t2 = term(v2, types(v2), idx.map(a2), levels)
      if (!t1.varies || !t2.varies) return failRow(n)
      val inter = ProductTerm(t1, t2)

      val (namesRest, xRest) = DesignMatrix.build(n, covarTerms ++ Seq(t1, t2))
      val (namesFull, xFull) = DesignMatrix.build(n, covarTerms ++ Seq(t1, t2, inter))
      val rest = Glm.fit(xRest, ySub, family)
      val full = Glm.fit(xFull, ySub, family)
      val lrdf = full.p - rest.p
      val lrstat = -2.0 * (rest.llf - full.llf)
      val lrP =
        if (lrdf == 0 && lrstat == 0.0) None
        else Some(graft.stats.Distributions.chi2Sf(lrstat, lrdf.toDouble))
      val converged = full.converged && rest.converged

      def coef(names: Seq[String], fit: Glm.Fit, nm: String)
          : (Option[Double], Option[Double], Option[Double]) = {
        val i = names.indexOf(nm)
        if (i < 0) (None, None, None)
        else (Some(fit.beta(i)), Some(fit.se(i)), Some(fit.pvalue(i, family)))
      }

      inter.columns.map(_._1).map { param =>
        val Array(p1, p2) = param.split(":", 2)
        val (rb1, rs1, rp1) = coef(namesRest, rest, p1)
        val (rb2, rs2, rp2) = coef(namesRest, rest, p2)
        val (fbi, fsi, fpi) = coef(namesFull, full, param)
        val (fb1, fs1, fp1) = coef(namesFull, full, p1)
        val (fb2, fs2, fp2) = coef(namesFull, full, p2)
        InteractionBetaResult(p1, p2, outcome, param, converged, n, lrP,
          rb1, rs1, rp1, rb2, rs2, rp2, fbi, fsi, fpi, fb1, fs1, fp1, fb2, fs2, fp2)
      }
    } catch {
      case _: Exception => failRow(0)
    }
  }

  private def term(name: String, kind: String, raw: Array[String],
                   levels: Map[String, Seq[String]]): DesignMatrix.Term = kind match {
    case "continuous" =>
      DesignMatrix.ContinuousTerm(name, raw.map(_.toDouble))
    case _ =>
      // binary AND categorical enter interaction formulas as patsy
      // categoricals (dummy columns named `var[T.level]`) — the reference
      // builds these via formula strings, unlike the main-effect study's
      // "binary treated as continuous 0/1" rule
      DesignMatrix.CategoricalTerm(name, raw)
  }

  /** Interaction columns = elementwise products of the two terms' design
    * columns (level crossings for categoricals —
    * reference: interaction_regression.py:308-314). */
  private final case class ProductTerm(t1: DesignMatrix.Term, t2: DesignMatrix.Term)
      extends DesignMatrix.Term {
    def name: String = s"${t1.name}:${t2.name}"
    def columns: Seq[(String, Array[Double])] = for {
      (n1, c1) <- t1.columns; (n2, c2) <- t2.columns
    } yield s"$n1:$n2" -> Array.tabulate(c1.length)(i => c1(i) * c2(i))
    def varies: Boolean = columns.exists { case (_, v) => v.exists(_ != v(0)) }
  }

  private def fitPair(
      v1: String, v2: String, outcome: String,
      y: Array[Double], colData: Map[String, Array[String]],
      types: Map[String, String], levels: Map[String, Seq[String]],
      covariates: Seq[String], family: Glm.Family, minN: Long): InteractionResult = {
    val nullRes = InteractionResult(v1, v2, outcome, Converged = false, 0,
      None, None, None, None)
    try {
      // complete-case over the pair (covars/outcome already complete)
      val a1 = colData(v1); val a2 = colData(v2)
      val idx = (0 until y.length).filter(i => a1(i) != null && a2(i) != null).toArray
      val n = idx.length
      if (n < minN || n < 3) return nullRes.copy(N = n)

      val ySub = DenseVector(idx.map(y))
      val covarTerms = covariates.map(c =>
        term(c, types(c), idx.map(colData(c)), levels))
      val t1 = term(v1, types(v1), idx.map(a1), levels)
      val t2 = term(v2, types(v2), idx.map(a2), levels)
      if (!t1.varies || !t2.varies) return nullRes.copy(N = n)
      val inter = ProductTerm(t1, t2)

      val (_, xRest) = DesignMatrix.build(n, covarTerms ++ Seq(t1, t2))
      val (namesFull, xFull) = DesignMatrix.build(n, covarTerms ++ Seq(t1, t2, inter))
      val rest = Glm.fit(xRest, ySub, family)
      val full = Glm.fit(xFull, ySub, family)
      val lrdf = full.p - rest.p
      val lrstat = -2.0 * (rest.llf - full.llf)
      // special case lrdf==0 && lrstat==0 (reference:
      // interaction_regression.py — interaction adds no information)
      val lrP =
        if (lrdf == 0 && lrstat == 0.0) None
        else Some(graft.stats.Distributions.chi2Sf(lrstat, lrdf.toDouble))

      // single-column interaction (both terms continuous/binary): report its
      // beta like the reference does
      val interCols = inter.columns.map(_._1)
      val (beta, se, bp) =
        if (interCols.size == 1) {
          val i = namesFull.indexOf(interCols.head)
          if (i >= 0)
            (Some(full.beta(i)), Some(full.se(i)), Some(full.pvalue(i, family)))
          else (None, None, None)
        } else (None, None, None)

      InteractionResult(v1, v2, outcome, full.converged && rest.converged, n,
        beta, se, bp, lrP)
    } catch {
      case _: Exception => nullRes
    }
  }
}
