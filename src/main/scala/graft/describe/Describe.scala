package graft.describe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{CladeFrame, VariableType}
import graft.modify.Modify
import VariableType._

/** Descriptive statistics (SURVEY.md §2.5).
  *
  * Each operator returns a DataFrame (the reference returns pandas frames —
  * reference: clarite/modules/describe.py). Everything is a one-pass
  * aggregation or a single melt+groupBy shuffle; nothing is per-column jobs.
  */
object Describe {

  /** get_types: per-variable CLARITE kind
    * (reference: describe.py:138-163). Pure metadata — no job. */
  def getTypes(spark: SparkSession, cf: CladeFrame): DataFrame = {
    import spark.implicits._
    cf.variables.map(v => (v, cf.typeOf(v).name)).toDF("variable", "type")
  }

  /** summarize: variable counts per kind + row count
    * (reference: describe.py:256-287). */
  def summarize(spark: SparkSession, cf: CladeFrame): DataFrame = {
    import spark.implicits._
    val n = cf.df.count()
    VariableType.all.map(t => (t.name, cf.variablesOfType(t).size.toLong, n))
      .toDF("type", "n_variables", "n_rows")
  }

  /** percent_na: % missing per variable (reference: describe.py:166-194).
    * One aggregation pass over all columns. */
  def percentNa(spark: SparkSession, cf: CladeFrame): DataFrame = {
    import spark.implicits._
    val vars = cf.variables
    if (vars.isEmpty) return Seq.empty[(String, Double)].toDF("variable", "percent_na")
    val aggs = count(lit(1)).as("__n") +: vars.map(c => count(col(c)).as(c))
    val r = cf.df.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getLong(0).toDouble
    vars.zipWithIndex
      .map { case (c, i) => (c, if (n == 0) 0.0 else (1.0 - r.getLong(i + 1) / n) * 100.0) }
      .toDF("variable", "percent_na")
  }

  /** freq_table: per categorical/binary/constant variable, value → count;
    * non-categorical variables contribute one `<Non-Categorical Values>` row
    * (reference: describe.py:78-135). One melt + one groupBy shuffle for all
    * categorical columns together (AQE rebalances skewed variables). */
  def freqTable(spark: SparkSession, cf: CladeFrame): DataFrame = {
    import spark.implicits._
    val catCols = cf.variables.filter(c =>
      Set[VariableType](Constant, Binary, Categorical)(cf.typeOf(c)))
    val otherCols = cf.variables.filterNot(catCols.toSet)
    val catPart: Option[DataFrame] =
      if (catCols.isEmpty) None
      else Some(Modify.melt(cf.df, catCols)
        .filter(col("value").isNotNull)
        .groupBy("variable", "value").agg(count(lit(1)).as("count")))
    val otherPart: Option[DataFrame] =
      if (otherCols.isEmpty) None
      else {
        // the reference reports the NON-NA COUNT for non-categorical
        // variables (describe.py:135), not zero
        val aggs = otherCols.map(c => count(col(c)).as(c))
        val r = cf.df.agg(aggs.head, aggs.tail: _*).head()
        Some(otherCols.zipWithIndex
          .map { case (c, i) => (c, "<Non-Categorical Values>", r.getLong(i)) }
          .toDF("variable", "value", "count"))
      }
    (catPart, otherPart) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (Some(a), None)    => a
      case (None, Some(b))    => b
      case _ => Seq.empty[(String, String, Long)].toDF("variable", "value", "count")
    }
  }

  /** correlations: pairwise-complete Pearson correlation for every pair of
    * (numeric-castable) variables, |corr| >= threshold, sorted desc
    * (reference: describe.py:26-75).
    *
    * pandas `df.corr()` is pairwise-complete-observations; Spark's
    * `ml.stat.Correlation` is listwise. To keep pandas semantics we compute
    * the built-in `corr(x, y)` SQL aggregate (which IS pairwise: a row
    * enters a pair's correlation iff both values are non-null) for all
    * k·(k−1)/2 pairs in a SINGLE aggregation pass — one job, map-side
    * partials, no shuffle of row data. For k in the thousands, switch to
    * the Gramian path (assemble + `Summarizer`) and accept listwise, or
    * pre-impute; documented scale trade-off. */
  def correlations(spark: SparkSession, cf: CladeFrame,
                   threshold: Double = 0.75): DataFrame = {
    import spark.implicits._
    val vars = cf.variables.filter(c => cf.typeOf(c) == Continuous)
    val pairs = for {
      i <- vars.indices; j <- (i + 1) until vars.size
    } yield (vars(i), vars(j))
    if (pairs.isEmpty)
      return Seq.empty[(String, String, Double)].toDF("var1", "var2", "correlation")
    val aggs = pairs.map { case (a, b) =>
      corr(col(a).cast("double"), col(b).cast("double")).as(s"${a}__$b")
    }
    val r = cf.df.agg(aggs.head, aggs.tail: _*).head()
    pairs.zipWithIndex
      .collect { case ((a, b), i) if !r.isNullAt(i) => (a, b, r.getDouble(i)) }
      .filter { case (_, _, c) => math.abs(c) >= threshold }
      .sortBy { case (_, _, c) => -math.abs(c) }
      .toDF("var1", "var2", "correlation")
  }

  /** skewness: per continuous variable, population skewness g1 (scipy
    * bias=True parity; Spark's `skewness` aggregate computes exactly g1) plus
    * the D'Agostino skewtest z-statistic and two-sided p-value
    * (reference: describe.py:197-253; scipy.stats.skewtest).
    * One aggregation pass; the z transform is O(#columns) driver math. */
  def skewness(spark: SparkSession, cf: CladeFrame,
               dropna: Boolean = false): DataFrame = {
    import spark.implicits._
    val vars = cf.variables.filter(cf.typeOf(_) == Continuous)
    if (vars.isEmpty)
      return Seq.empty[(String, String, Double, Double, Double)]
        .toDF("variable", "type", "skew", "zscore", "pvalue_2sided")
    val aggs = vars.flatMap(c => Seq(
      org.apache.spark.sql.functions.skewness(col(c).cast("double")).as(s"s_$c"),
      count(col(c)).as(s"n_$c"))) :+ count(lit(1)).as("__rows")
    val r = cf.df.agg(aggs.head, aggs.tail: _*).head()
    val totalRows = r.getLong(2 * vars.size)
    vars.zipWithIndex.map { case (c, i) =>
      val n = r.getLong(2 * i + 1)
      // reference default dropna=False propagates NaN when the column has
      // any missing values (describe.py:249-253, scipy nan_policy)
      val hasNa = n < totalRows
      val skew =
        if (!dropna && hasNa) Double.NaN
        else if (r.isNullAt(2 * i)) Double.NaN
        else r.getDouble(2 * i)
      val (z, p) = skewTest(skew, n)
      (c, "continuous", skew, z, p)
    }.toDF("variable", "type", "skew", "zscore", "pvalue_2sided")
  }

  /** D'Agostino skewness test (scipy.stats.skewtest transform). n must be
    * >= 8 for the normal approximation; returns NaN otherwise. */
  def skewTest(g1: Double, n: Long): (Double, Double) = {
    if (n < 8 || g1.isNaN) return (Double.NaN, Double.NaN)
    val nd = n.toDouble
    val y = g1 * math.sqrt((nd + 1) * (nd + 3) / (6.0 * (nd - 2)))
    val beta2 = 3.0 * (nd * nd + 27 * nd - 70) * (nd + 1) * (nd + 3) /
      ((nd - 2) * (nd + 5) * (nd + 7) * (nd + 9))
    val w2 = -1.0 + math.sqrt(2.0 * (beta2 - 1.0))
    val delta = 1.0 / math.sqrt(0.5 * math.log(w2))
    val alpha = math.sqrt(2.0 / (w2 - 1.0))
    val yy = if (y == 0.0) 1.0 else y
    val z = delta * math.log(yy / alpha + math.sqrt(math.pow(yy / alpha, 2) + 1.0))
    val p = 2.0 * graft.stats.Distributions.normalSf(math.abs(z))
    (z, p)
  }
}
