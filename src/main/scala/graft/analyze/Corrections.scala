package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multiple-testing correction — `analyze.add_corrected_pvalues`
  * (reference: clarite/modules/analyze/utils.py:9-117), expressed as window
  * functions (SURVEY.md §2.6):
  *
  *   - Bonferroni: min(p·m, 1)
  *   - Benjamini-Hochberg FDR: rank p ascending, p·m/rank, then a running
  *     minimum from the LARGEST p downward (the monotonicity step of
  *     statsmodels' `multipletests(method="fdr_bh")`), clipped at 1.
  *
  * The result table is O(#variables) — orders of magnitude smaller than the
  * data — so the unpartitioned ordering window is a deliberate, safe choice
  * (a single tiny partition), not a scale hazard. With `groupby` keys the
  * window partitions by group after de-duplicating repeated tests, matching
  * the reference's grouped mode (utils.py:77-117).
  */
object Corrections {

  def addCorrectedPvalues(
      df: DataFrame,
      pvalue: String = "pvalue",
      groupby: Seq[String] = Nil): DataFrame = {
    if (groupby.isEmpty) addFlat(df, pvalue, Nil)
    else {
      // de-duplicate repeated tests on the group keys, correct once per
      // group, then re-join the corrected values to every original row
      val dedup = df.select((groupby :+ pvalue).map(col): _*).dropDuplicates(groupby)
      val corrected = addFlat(dedup, pvalue, Nil)
        .select((groupby ++ Seq("pvalue_bonferroni", "pvalue_fdr")).map(col): _*)
      df.join(corrected, groupby, "left")
        .orderBy(col("pvalue_fdr").asc_nulls_last, col("pvalue_bonferroni").asc_nulls_last)
    }
  }

  private def addFlat(df: DataFrame, pvalue: String, partition: Seq[String]): DataFrame = {
    val p = col(pvalue)
    val part: Seq[Column] = partition.map(col)
    val wAll = if (part.isEmpty) Window.partitionBy() else Window.partitionBy(part: _*)
    val wAsc = (if (part.isEmpty) Window.partitionBy() else Window.partitionBy(part: _*))
      .orderBy(p.asc_nulls_last)
    val m = sum(when(p.isNotNull, 1L).otherwise(0L)).over(wAll)
    val rank = row_number().over(wAsc)
    val raw = p * m / rank
    // running min from the bottom of the ascending order = min over the
    // frame [current, unboundedFollowing]
    val monotone = min(when(p.isNotNull, raw)).over(
      wAsc.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    df.withColumn("pvalue_bonferroni", when(p.isNotNull, least(p * m, lit(1.0))))
      .withColumn("pvalue_fdr", when(p.isNotNull, least(monotone, lit(1.0))))
      .orderBy(col("pvalue_fdr").asc_nulls_last, col("pvalue_bonferroni").asc_nulls_last)
  }

  /** Top-N results by pvalue — the data prep behind `plot.top_results`
    * (reference: plot/top_results.py:79-83). */
  def topResults(df: DataFrame, n: Int = 20, pvalue: String = "pvalue"): DataFrame =
    df.orderBy(col(pvalue).asc_nulls_last).limit(n)

  /** Significance filter — CLI `analyze get_significant`
    * (reference: cli/commands/analyze.py:299-324). */
  def getSignificant(df: DataFrame, cutoff: Double = 0.05,
                     column: String = "pvalue_fdr"): DataFrame =
    df.filter(col(column) <= cutoff)

  /** Manhattan-plot data prep: per-result −log10(p) plus a dense x-position
    * grouped by category (reference: plot/manhattan.py:58-98 — the melt/
    * label/group-number stages, engine-mappable per SURVEY.md §2.11). */
  def manhattanPrep(df: DataFrame, pvalue: String = "pvalue",
                    category: String = "Variable"): DataFrame = {
    val w = Window.orderBy(col(category).asc_nulls_last)
    df.withColumn("neg_log_pvalue", -log10(col(pvalue)))
      .withColumn("xpos", dense_rank().over(w))
  }
}
