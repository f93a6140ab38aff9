package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-call corpus curation: the standard web-scale training-data pipeline
  * composed from this library's operators, in the order production
  * pipelines run them (cheap row-local filters first, shuffling steps
  * last, so every shuffle sees an already-shrunk corpus):
  *
  *   1. language filter        — [[Text.langId]] n-gram heuristic (row-local)
  *   2. quality filter         — [[Text.gopherQualityFlags]] rules (row-local)
  *   3. exact dedup            — [[Dedup.exact]] fingerprint keep-min
  *   4. near dedup (optional)  — [[Dedup.nearDedup]] MinHash-LSH →
  *                               n-gram-Jaccard verify → components
  *   5. decontamination        — [[Decontaminate.overlapReport]] n-gram
  *                               overlap vs a broadcast eval corpus
  *   6. importance sampling    — [[Sampling.importanceSample]] quality-
  *                               weighted keep probability (deterministic)
  *
  * Every decision is deterministic (hash-keyed, never RNG), so the same
  * input produces the same corpus on any cluster, partitioning, or re-run.
  * The composition stays LAZY through steps 1-2 and 5-6 (one fused scan
  * each side of the dedup shuffles); only dedup materializes exchanges.
  *
  * This is deliberately a THIN composition — each step is the public
  * operator, so a pipeline that needs different stages (or stage order)
  * composes them directly. [[curateReport]] runs the same pipeline with a
  * per-stage surviving-row count for audit.
  */
object Curation {

  final case class CurationConfig(
    langs: Set[String] = Set("en"),
    applyGopherRules: Boolean = true,
    nearDupThreshold: Option[Double] = Some(0.8),
    evalCorpus: Option[DataFrame] = None,
    contaminationNgram: Int = 8,
    keepProbability: Option[Column] = None)

  /** Stage list for a config, each (name, transform). */
  private def stages(spark: SparkSession, textCol: String, idCol: String,
                     cfg: CurationConfig): Seq[(String, DataFrame => DataFrame)] = {
    val langStage: DataFrame => DataFrame = df =>
      Text.langId(df, textCol).filter(col("pred_lang").isin(cfg.langs.toSeq: _*))
        .drop("pred_lang")
    val qualityStage: DataFrame => DataFrame = df =>
      if (!cfg.applyGopherRules) df
      else Text.gopherQualityFlags(df, textCol).filter(col("gopher_keep"))
        .drop(Text.gopherQualityFlags(df.limit(0), textCol).columns
          .filterNot(df.columns.contains): _*)
    val exactStage: DataFrame => DataFrame = df => Dedup.exact(df, textCol, idCol)
    val nearStage: DataFrame => DataFrame = df => cfg.nearDupThreshold match {
      case Some(th) => Dedup.nearDedup(spark, df, textCol, idCol, threshold = th)
      case None => df
    }
    val deconStage: DataFrame => DataFrame = df => cfg.evalCorpus match {
      case Some(ev) =>
        val report = Decontaminate.overlapReport(df, ev, textCol, idCol,
          n = cfg.contaminationNgram)
          .filter(col("contaminated")).select(col("id"))
        df.join(report, df(idCol).cast("string") === report("id").cast("string"),
          "left_anti")
      case None => df
    }
    val sampleStage: DataFrame => DataFrame = df => cfg.keepProbability match {
      case Some(p) => Sampling.importanceSample(df, p, col(idCol))
      case None => df
    }
    Seq("lang" -> langStage, "quality" -> qualityStage,
      "dedup_exact" -> exactStage, "dedup_near" -> nearStage,
      "decontaminate" -> deconStage, "sample" -> sampleStage)
  }

  /** The curated corpus (lazy where the operators allow). */
  def curate(spark: SparkSession, docs: DataFrame, textCol: String,
             idCol: String, cfg: CurationConfig = CurationConfig()): DataFrame =
    stages(spark, textCol, idCol, cfg).foldLeft(docs) { case (df, (_, f)) => f(df) }

  /** Same pipeline, plus a per-stage audit: returns (curated corpus,
    * report of (stage, rows_in, rows_out, rows_dropped)). The report COSTS
    * one count action per stage — an audit/debug path, not the production
    * path. */
  def curateReport(spark: SparkSession, docs: DataFrame, textCol: String,
                   idCol: String, cfg: CurationConfig = CurationConfig())
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    var current = docs
    var in = docs.count()
    val rows = stages(spark, textCol, idCol, cfg).map { case (name, f) =>
      current = f(current)
      val out = current.count()
      val r = (name, in, out, in - out)
      in = out
      r
    }
    (current, rows.toDF("stage", "rows_in", "rows_out", "rows_dropped"))
  }
}
