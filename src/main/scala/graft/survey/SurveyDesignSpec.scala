package graft.survey

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Complex-survey design specification — strata / cluster (PSU) / sampling
  * weights / finite-population correction, aligned to the observation table
  * by id (reference: clarite/modules/survey/survey_design.py:9-146).
  *
  * The per-observation survey metadata is collected to compact arrays and
  * broadcast with the analysis base block: the reference workload is tens of
  * thousands of observations (a few MB). The cluster/stratum DESIGN TOTALS
  * (clusters per stratum, stratum for cluster, fpc per cluster) are one-time
  * grouped aggregates computed BEFORE any subsetting, exactly like the
  * reference (survey_design.py:131-141); at scale they are tiny grouped aggs
  * over the design table.
  */
final class SurveyDesignSpec(
    surveyDf: DataFrame,
    idCol: String = "id",
    strata: Option[String] = None,
    cluster: Option[String] = None,
    nest: Boolean = false,
    singleWeight: Option[String] = None,
    multiWeight: Map[String, String] = Map.empty, // rv name -> weight column
    fpc: Option[String] = None,
    val singleCluster: String = "fail",
    val dropUnweighted: Boolean = false) extends Serializable {

  require(Set("fail", "adjust", "average", "certainty")(singleCluster),
    "'single_cluster' must be one of 'fail', 'adjust', 'average', 'certainty'")
  require(strata.nonEmpty || cluster.nonEmpty || singleWeight.nonEmpty || multiWeight.nonEmpty,
    "At least one of strata, cluster, or weights must be provided")

  val hasStrata: Boolean = strata.nonEmpty
  val hasCluster: Boolean = cluster.nonEmpty
  val hasWeights: Boolean = singleWeight.nonEmpty || multiWeight.nonEmpty
  val hasFpc: Boolean = fpc.nonEmpty

  /** Weight column used for a given regression variable. */
  def weightNameFor(rv: String): Option[String] =
    singleWeight.orElse(multiWeight.get(rv) match {
      case s @ Some(_) => s
      case None if multiWeight.nonEmpty =>
        throw new IllegalArgumentException(
          s"No weight found in the survey design for the '$rv' variable")
      case None => None
    })

  private val weightCols: Seq[String] = (singleWeight.toSeq ++ multiWeight.values).distinct

  // ---------------------------------------------------------------- collect
  // one collect of the (small) survey table; all downstream alignment is by
  // id string
  private val collected: Array[(String, String, String, Double, Array[Double])] = {
    val strataCol = strata.map(col(_).cast("string")).getOrElse(lit("1.0"))
    val clustColRaw = cluster.map(col(_).cast("string"))
      .getOrElse(monotonically_increasing_id().cast("string"))
    // nest: same PSU id in different strata are distinct PSUs
    // (survey_design.py:216-221)
    val clustCol =
      if (nest && hasStrata && hasCluster) concat(strataCol, lit("-"), clustColRaw)
      else clustColRaw
    val fpcCol = fpc.map(col(_).cast("double")).getOrElse(lit(0.0))
    // (fpc nulls are checked after collection — see fpcMissingCheck)
    val wCols = weightCols.map(c => col(c).cast("double"))
    val rows = surveyDf.select(
      (Seq(col(idCol).cast("string"), strataCol.as("strat"), clustCol.as("clust"),
        fpcCol.as("fpc")) ++ wCols): _*).collect()
    if (fpc.nonEmpty) {
      val bad = rows.count(_.isNullAt(3))
      require(bad == 0, s"$bad of ${rows.length} fpc values were missing")
    }
    rows.map { r =>
      val ws = Array.tabulate(weightCols.size) { i =>
        if (r.isNullAt(4 + i)) Double.NaN
        else {
          val w = r.getDouble(4 + i)
          if (w <= 0) 1e-99 else w // zero/negative weights (survey_design.py:244-247)
        }
      }
      (r.getString(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) 0.0 else r.getDouble(3), ws)
    }
  }
  require(collected.nonEmpty, "survey design is empty")
  // missing design values are a hard error with a count, like the reference
  // (survey_design.py:180-183, 206-210, 281-284)
  if (hasStrata) {
    val bad = collected.count(_._2 == null)
    require(bad == 0, s"$bad of ${collected.length} strata values were missing")
  }
  if (hasCluster) {
    val bad = collected.count(_._3 == null)
    require(bad == 0, s"$bad of ${collected.length} cluster values were missing")
  }

  val ids: Array[String] = collected.map(_._1)
  val stratOf: Map[String, String] = collected.map(r => r._1 -> r._2).toMap
  val clustOf: Map[String, String] = collected.map(r => r._1 -> r._3).toMap

  /** Normalized weights (w / mean(w), computed pre-subset —
    * survey_design.py:390) per weight column, NaN where missing. */
  val normalizedWeights: Map[String, Map[String, Double]] =
    weightCols.zipWithIndex.map { case (wc, i) =>
      val vals = collected.map(_._5(i))
      val present = vals.filter(!_.isNaN)
      val mean = if (present.isEmpty) 1.0 else present.sum / present.length
      wc -> collected.zipWithIndex.map { case (r, j) => r._1 -> (vals(j) / mean) }.toMap
    }.toMap

  // ------------------------------------------------- design totals (full)
  /** Clusters per stratum, computed on the FULL design before subsets
    * (survey_design.py:131-141). */
  val clustPerStrat: Map[String, Int] =
    collected.groupBy(_._2).view.mapValues(_.map(_._3).distinct.length).toMap

  val stratForClust: Map[String, String] =
    collected.groupBy(_._3).view.mapValues(_.head._2).toMap

  val nClustFull: Int = collected.map(_._3).distinct.length

  /** fpc as a sampling FRACTION per cluster. Values > 1 are population
    * sizes and are converted (survey_design.py:291-312): with strata, the
    * sampled stratum SIZE (row count) over the population; cluster-only
    * designs use the number of sampled clusters over the population. */
  val fpcPerClust: Map[String, Double] = {
    val raw = collected.map(_._4)
    val converted: Array[Double] =
      if (!hasFpc || raw.forall(_ <= 1.0)) raw
      else if (hasStrata) {
        val strataSize = collected.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
        collected.map(r => strataSize(r._2) / r._4)
      } else if (hasCluster) {
        val sampledClusters = nClustFull.toDouble
        collected.map(r => sampledClusters / r._4)
      } else raw // no strata/cluster: population sizes are invalid -> fail below
    require(converted.forall(f => f >= 0 && f <= 1), "Error processing FPC- invalid values")
    // FIRST value per cluster (survey_design.py:314-317)
    val m = scala.collection.mutable.LinkedHashMap[String, Double]()
    collected.map(_._3).zip(converted).foreach { case (c, f) =>
      if (!m.contains(c)) m(c) = f
    }
    m.toMap
  }

  if (hasStrata && hasCluster &&
      !Set("average", "certainty", "adjust")(singleCluster)) {
    val singles = clustPerStrat.filter(_._2 < 2)
    require(singles.isEmpty,
      s"One or more strata have single clusters: ${singles.keys.mkString(", ")}. " +
        "Adjust the 'single_cluster' SurveyDesignSpec parameter or reassign " +
        "the singular cluster to avoid this error.")
  }

  // ----------------------------------------------------------------- subset
  private var subsetIds: Option[Set[String]] = None
  var subsetCount: Int = 0

  /** Restrict analysis to a subpopulation; the design totals above remain
    * computed on the full design (survey_design.py:552-578). The predicate
    * is evaluated NOW against the given table (which may contain columns
    * later dropped from the analysis data — the reference materializes the
    * boolean mask the same way), keeping the ids where it is true. */
  def subset(df: DataFrame, predicate: Column): SurveyDesignSpec = {
    val keep = df.filter(predicate)
      .select(col(idCol).cast("string")).collect().map(_.getString(0)).toSet
    subsetIds = Some(subsetIds.map(_ intersect keep).getOrElse(keep))
    subsetCount += 1
    this
  }

  /** Filter for the analysis data: id ∈ subset. At parity scale this is a
    * broadcast hash-set predicate; at 100 TB the subset would instead stay
    * a DataFrame and this becomes a LEFT SEMI join on id. */
  def subsetFilter: Option[Column] =
    subsetIds.map(ids => col(idCol).cast("string").isInCollection(ids))

  /** Ids kept by the subsets (None = no subset applied). */
  def subsetIdSet: Option[Set[String]] = subsetIds

  /** Like weightNameFor but Left(error) instead of throwing — one variable
    * without a mapped weight must null that variable, not abort the study
    * (reference: weighted_glm_regression.py per-variable error capture). */
  def weightNameEither(rv: String): Either[String, Option[String]] =
    try Right(weightNameFor(rv))
    catch { case e: IllegalArgumentException => Left(e.getMessage) }

  /** Per-observation survey metadata as a DataFrame — the feed for the
    * co-group execution path, which must not materialize observation-scale
    * data on the driver. Columns: id (string), __strat, __clust, plus one
    * normalized weight column per distinct weight (`__w_<name>`). The
    * normalization means and design totals are the (tiny) aggregates this
    * spec already computed. */
  def surveyRowsDf: DataFrame = {
    val strataCol = strata.map(col(_).cast("string")).getOrElse(lit("1.0"))
    val clustColRaw = cluster.map(col(_).cast("string"))
      .getOrElse(monotonically_increasing_id().cast("string"))
    val clustCol =
      if (nest && hasStrata && hasCluster) concat(strataCol, lit("-"), clustColRaw)
      else clustColRaw
    val wMeans: Map[String, Double] = weightCols.map { wc =>
      val present = collected.map(_._5(weightCols.indexOf(wc))).filter(!_.isNaN)
      wc -> (if (present.isEmpty) 1.0 else present.sum / present.length)
    }.toMap
    val wExprs = weightCols.map { wc =>
      (when(col(wc).isNull, lit(null))
        .when(col(wc).cast("double") <= 0, lit(1e-99 / wMeans(wc)))
        .otherwise(col(wc).cast("double") / wMeans(wc))).as(s"__w_$wc")
    }
    surveyDf.select(
      (Seq(col(idCol).cast("string").as(idCol), strataCol.as("__strat"),
        clustCol.as("__clust")) ++ wExprs): _*)
  }

  /** Distinct weight column names (order matches surveyRowsDf). */
  def weightColumnNames: Seq[String] = weightCols

  /** Survey variables must not appear in the analysis data
    * (survey_design.py:488-535). */
  def validateAgainstData(dataColumns: Seq[String]): Unit = {
    val reserved = strata.toSeq ++ cluster.toSeq ++ fpc.toSeq ++ weightCols
    val overlap = reserved.filter(dataColumns.contains)
    require(overlap.isEmpty,
      s"Survey design variables should not be included in the data: ${overlap.mkString(", ")}")
  }
}
