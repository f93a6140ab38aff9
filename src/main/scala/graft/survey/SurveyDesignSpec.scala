package graft.survey

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Complex-survey design specification — strata / cluster (PSU) / sampling
  * weights / finite-population correction, aligned to the observation table
  * by id (reference: clarite/modules/survey/survey_design.py:9-146).
  *
  * Construction is DISTRIBUTED: validations (missing strata/cluster/fpc
  * counts, empty design), weight normalization means, and the
  * cluster/stratum DESIGN TOTALS (clusters per stratum, stratum for
  * cluster, fpc per cluster — survey_design.py:131-141) are Spark
  * aggregations whose results are tiny (O(#strata + #clusters) rows). The
  * survey table itself is NEVER collected for the co-group execution path —
  * per-observation metadata reaches the kernels via `surveyRowsDf` joins.
  * Only the legacy broadcast execution path (which by contract collects its
  * base block) lazily materializes id-aligned maps, and only when used.
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

  // ------------------------------------------------- projected design frame
  private def strataCol: Column = strata.map(col(_).cast("string")).getOrElse(lit("1.0"))

  /** No-cluster designs treat every observation as its own PSU; the
    * pseudo-cluster id derives DETERMINISTICALLY from the observation id
    * (a monotonically_increasing_id here could disagree between jobs). */
  private def clustColRaw: Column = cluster.map(col(_).cast("string"))
    .getOrElse(concat(lit("r"), col(idCol).cast("string")))

  /** nest: same PSU id in different strata are distinct PSUs
    * (survey_design.py:216-221). */
  private def clustCol: Column =
    if (nest && hasStrata && hasCluster) concat(strataCol, lit("-"), clustColRaw)
    else clustColRaw

  /** Zero/negative weights become 1e-99 (survey_design.py:244-247); nulls
    * stay null (missing weight). */
  private def clampedW(wc: String): Column =
    when(col(wc).isNull, lit(null).cast("double"))
      .when(col(wc).cast("double") <= 0, lit(1e-99))
      .otherwise(col(wc).cast("double"))

  private def designProj: DataFrame = surveyDf.select(
    (Seq(col(idCol).cast("string").as(idCol), strataCol.as("__strat"),
      clustCol.as("__clust"),
      fpc.map(col(_).cast("double")).getOrElse(lit(0.0)).as("__fpc")) ++
      weightCols.map(wc => clampedW(wc).as(s"__w_$wc"))): _*)

  // ------------------------------------- one aggregation pass: validations,
  // weight means, full-design cluster count (results are a single row)
  private val (nRows: Long, nClustFull: Long, weightMeans: Map[String, Double]) = {
    val aggs: Seq[Column] = Seq(
      count(lit(1)),
      // no-cluster: every row is its own PSU — a countDistinct over the
      // per-row pseudo ids would be a full distinct shuffle for a number
      // that is simply the row count
      if (hasCluster) countDistinct(col("__clust")) else count(lit(1)),
      sum(when(col("__strat").isNull, 1L).otherwise(0L)),
      sum(when(col("__clust").isNull, 1L).otherwise(0L)),
      sum(when(col("__fpc").isNull, 1L).otherwise(0L))) ++
      weightCols.map(wc => avg(col(s"__w_$wc")))
    val r = designProj.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getLong(0)
    require(n > 0, "survey design is empty")
    def cnt(i: Int): Long = if (r.isNullAt(i)) 0L else r.getLong(i)
    // missing design values are a hard error with a count, like the
    // reference (survey_design.py:180-183, 206-210, 281-284)
    if (hasStrata)
      require(cnt(2) == 0, s"${cnt(2)} of $n strata values were missing")
    if (hasCluster)
      require(cnt(3) == 0, s"${cnt(3)} of $n cluster values were missing")
    if (hasFpc)
      require(cnt(4) == 0, s"${cnt(4)} of $n fpc values were missing")
    val means = weightCols.zipWithIndex.map { case (wc, i) =>
      wc -> (if (r.isNullAt(5 + i)) 1.0 else r.getDouble(5 + i))
    }.toMap
    (n, r.getLong(1), means)
  }

  // ------------------------------------------------- design totals (full)
  // grouped aggregates collected at O(#strata) / O(#clusters) — computed on
  // the FULL design before subsets (survey_design.py:131-141). No-cluster
  // designs (every observation its own PSU) never build the per-cluster
  // table — #clusters == #rows there, and an O(rows) driver map is a scale
  // bug; they use the O(#strata) [[stratumTotals]] instead.
  /** (cluster, stratum, rows-in-cluster, raw fpc) — one row per cluster.
    * CLUSTERED designs only. */
  private lazy val clusterTable: Array[(String, String, Long, Double)] =
    designProj.groupBy("__clust")
      .agg(first("__strat").as("s"), count(lit(1)).as("n"), min("__fpc").as("f"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) 0.0 else r.getDouble(3)))

  /** No-cluster designs: per-stratum totals on the FULL design — PSU count
    * (= rows: each observation is its own PSU) and Σ(1 − fpc fraction),
    * plus the population-form flag. All O(#strata); fpc values > 1 are
    * population sizes converted per the reference's rules
    * (survey_design.py:291-312 — with strata, stratum size over population;
    * population-form fpc without strata or clusters is invalid). */
  @transient private lazy val noClustTotals
      : (Map[String, (Long, Double)], Boolean) = {
    val aggs = Seq(count(lit(1)).as("n")) ++ (if (hasFpc) Seq(
      sum("__fpc").as("sf"), sum(lit(1.0) / col("__fpc")).as("sinv"),
      min("__fpc").as("mn"), max("__fpc").as("mx")) else Nil)
    val rows = designProj.groupBy("__strat").agg(aggs.head, aggs.tail: _*).collect()
    if (!hasFpc)
      (rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(1).toDouble)).toMap, false)
    else {
      val anyPop = rows.exists(r => r.getDouble(r.fieldIndex("mx")) > 1.0)
      val m = rows.map { r =>
        val s = r.getString(0); val nh = r.getLong(1)
        val (sumFrac, ok) =
          if (!anyPop) (r.getDouble(r.fieldIndex("sf")),
            r.getDouble(r.fieldIndex("mn")) >= 0.0)
          else if (hasStrata) (nh.toDouble * r.getDouble(r.fieldIndex("sinv")),
            r.getDouble(r.fieldIndex("mn")) >= nh.toDouble)
          else (r.getDouble(r.fieldIndex("sf")), false)
        require(ok, "Error processing FPC- invalid values")
        s -> (nh, nh.toDouble - sumFrac)
      }.toMap
      (m, anyPop)
    }
  }

  /** Per-stratum (full-design PSU count, Σ(1−fpc fraction)) for no-cluster
    * designs — the kernel's replacement for the per-pseudo-cluster maps. */
  def stratumTotals: Map[String, (Long, Double)] =
    if (hasCluster) Map.empty else noClustTotals._1

  /** Clusters per stratum on the full design (rows per stratum when every
    * observation is its own PSU). */
  lazy val clustPerStrat: Map[String, Int] =
    if (hasCluster) clusterTable.groupBy(_._2).view.mapValues(_.length).toMap
    else noClustTotals._1.map { case (s, (n, _)) => s -> n.toInt }

  /** Cluster → stratum on the full design — CLUSTERED designs only (empty
    * for no-cluster designs, whose kernel path never enumerates PSUs). */
  lazy val stratForClust: Map[String, String] =
    if (hasCluster) clusterTable.map(c => c._1 -> c._2).toMap else Map.empty

  /** fpc as a sampling FRACTION per cluster. Values > 1 are population
    * sizes and are converted (survey_design.py:291-312): with strata, the
    * sampled stratum SIZE (row count) over the population; cluster-only
    * designs use the number of sampled clusters over the population.
    * CLUSTERED designs only — no-cluster fpc rides per-row. */
  lazy val fpcPerClust: Map[String, Double] = {
    if (!hasFpc || !hasCluster) Map.empty
    else {
      val anyPop = clusterTable.exists(_._4 > 1.0)
      val strataSize: Map[String, Double] =
        if (anyPop && hasStrata)
          clusterTable.groupBy(_._2).view.mapValues(_.map(_._3).sum.toDouble).toMap
        else Map.empty
      val m = clusterTable.map { case (c, s, _, f) =>
        val conv =
          if (!anyPop) f
          else if (hasStrata) strataSize(s) / f
          else nClustFull.toDouble / f
        c -> conv
      }.toMap
      require(m.values.forall(f => f >= 0 && f <= 1),
        "Error processing FPC- invalid values")
      m
    }
  }

  // eager design-rule checks that the reference performs at construction
  if (hasFpc) { if (hasCluster) fpcPerClust else noClustTotals }
  if (hasStrata && hasCluster &&
      !Set("average", "certainty", "adjust")(singleCluster)) {
    val singles = clustPerStrat.filter(_._2 < 2)
    require(singles.isEmpty,
      s"One or more strata have single clusters: ${singles.keys.mkString(", ")}. " +
        "Adjust the 'single_cluster' SurveyDesignSpec parameter or reassign " +
        "the singular cluster to avoid this error.")
  }

  // --------------------------------------- broadcast-path feed (LAZY collect)
  // Only the broadcast execution path needs id-aligned driver-side maps; it
  // collects its base block by contract, so collecting the survey columns is
  // the same order of driver memory. The co-group path NEVER triggers this.
  @transient private var broadcastCollected = false

  /** True iff the id-aligned maps below were ever materialized — the
    * co-group path must keep this false (asserted in tests). */
  def wasCollectedForBroadcast: Boolean = broadcastCollected

  @transient private lazy val collected
      : Array[(String, String, String, Double, Array[Double])] = {
    broadcastCollected = true
    designProj.collect().map { r =>
      val ws = Array.tabulate(weightCols.size) { i =>
        if (r.isNullAt(4 + i)) Double.NaN else r.getDouble(4 + i)
      }
      (r.getString(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) 0.0 else r.getDouble(3), ws)
    }
  }

  def ids: Array[String] = collected.map(_._1)
  lazy val stratOf: Map[String, String] = collected.map(r => r._1 -> r._2).toMap
  lazy val clustOf: Map[String, String] = collected.map(r => r._1 -> r._3).toMap

  /** Per-row fpc FRACTION by id — BROADCAST-PATH feed for no-cluster
    * designs (the co-group path reads the `__fpc` column of
    * [[surveyRowsDf]] instead). Empty when clustered or fpc-less. */
  @transient lazy val fpcFracOf: Map[String, Double] =
    if (!hasFpc || hasCluster) Map.empty
    else {
      val (totals, anyPop) = noClustTotals
      collected.map { r =>
        val f = r._4
        r._1 -> (if (!anyPop) f else totals(r._2)._1.toDouble / f)
      }.toMap
    }

  /** Normalized weights (w / mean(w), computed pre-subset —
    * survey_design.py:390) per weight column, NaN where missing. */
  lazy val normalizedWeights: Map[String, Map[String, Double]] =
    weightCols.zipWithIndex.map { case (wc, i) =>
      val mean = weightMeans(wc)
      wc -> collected.map(r => r._1 -> (r._5(i) / mean)).toMap
    }.toMap

  // ----------------------------------------------------------------- subset
  @transient private var subsetKeepDf: Option[DataFrame] = None
  var subsetCount: Int = 0

  /** Restrict analysis to a subpopulation; the design totals above remain
    * computed on the full design (survey_design.py:552-578). The predicate
    * is evaluated against the given table (which may contain columns later
    * dropped from the analysis data — the reference materializes the
    * boolean mask the same way). The kept-id set stays a DATAFRAME —
    * nothing is collected here; the co-group path applies it as a left-semi
    * join, and only the broadcast path materializes it (lazily, like the
    * rest of its feed). */
  def subset(df: DataFrame, predicate: Column): SurveyDesignSpec = {
    val keep = df.filter(predicate).select(col(idCol).cast("string").as(idCol))
    subsetKeepDf = Some(subsetKeepDf.map(_.join(keep, Seq(idCol), "left_semi"))
      .getOrElse(keep))
    subsetCount += 1
    this
  }

  /** Kept ids as a DataFrame (single `idCol` string column) — the scale
    * path's subset representation; apply with a LEFT SEMI join. */
  def subsetKeepIdsDf: Option[DataFrame] = subsetKeepDf

  @transient private lazy val subsetIds: Option[Set[String]] = subsetKeepDf.map { d =>
    broadcastCollected = true
    d.collect().map(_.getString(0)).toSet
  }

  /** Filter for the analysis data: id ∈ subset as a broadcast hash-set
    * predicate — BROADCAST-PATH ONLY (materializes the id set on the
    * driver; the co-group path uses [[subsetKeepIdsDf]] instead). */
  def subsetFilter: Option[Column] =
    subsetIds.map(ids => col(idCol).cast("string").isInCollection(ids))

  /** Ids kept by the subsets (None = no subset applied) — broadcast-path
    * only, see [[subsetFilter]]. */
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
    val wExprs = weightCols.map { wc =>
      (clampedW(wc) / weightMeans(wc)).as(s"__w_$wc")
    }
    // per-row fpc FRACTION rides LAST (positional readers unchanged):
    // populated only for no-cluster designs with fpc; population-form
    // values convert via the tiny per-stratum row-count map (when-chain
    // over O(#strata) literals — no join, stays codegen'd)
    val fpcExpr: Column =
      if (!hasFpc || hasCluster) lit(0.0).as("__fpc")
      else {
        val (totals, anyPop) = noClustTotals
        val fRaw = col(fpc.get).cast("double")
        (if (!anyPop) fRaw
         else totals.foldLeft(lit(Double.NaN)) { case (acc, (s, (nh, _))) =>
           when(strataCol === lit(s), lit(nh.toDouble) / fRaw).otherwise(acc)
         }).as("__fpc")
      }
    surveyDf.select(
      (Seq(col(idCol).cast("string").as(idCol), strataCol.as("__strat"),
        clustCol.as("__clust")) ++ wExprs :+ fpcExpr): _*)
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
