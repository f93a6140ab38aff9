package graft.genomics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{CladeFrame, VariableType}

/** Genotype columns and dosage encodings (reference: the pandas-genomics
  * `GenotypeDtype` accessor used at glm_regression.py:364-384 and
  * interaction_study.py:66-89).
  *
  * Spark-native representation (SURVEY.md §1.3): a diploid call is an
  * `array<int>` of allele indices (0 = ref, 1 = alt, -1 = missing) —
  * columnar, null-free at the array level, and every encoding below is pure
  * codegen'd column algebra (no UDFs), so encodings fuse into the scan at
  * any scale.
  */
object Genotypes {

  /** Count of alternate alleles (any index >= 1 counts — multi-allelic
    * calls are alternate, not silently ref), null when any call is missing
    * (negative index). */
  private def altCount(g: Column): Column =
    when(isnull(g) || exists(g, _ < 0), lit(null))
      .otherwise(aggregate(g, lit(0), (acc, a) => acc + when(a >= 1, 1).otherwise(0)))

  /** additive: 0/1/2 alt-allele dosage. */
  def additive(g: Column): Column = altCount(g).cast("double")

  /** dominant: 1 if any alt allele. */
  def dominant(g: Column): Column =
    when(altCount(g) >= 1, 1.0).otherwise(when(altCount(g).isNotNull, 0.0))

  /** recessive: 1 only for homozygous alt. */
  def recessive(g: Column): Column =
    when(altCount(g) === 2, 1.0).otherwise(when(altCount(g).isNotNull, 0.0))

  /** codominant: the genotype as a 3-level categorical ("0","1","2"). */
  def codominant(g: Column): Column = altCount(g).cast("string")

  /** edge: heterozygote coded with a per-variant weight alpha
    * (pandas-genomics EDGE encoding); hom-ref = 0, hom-alt = 1. */
  def edge(g: Column, alpha: Double): Column = {
    val c = altCount(g)
    when(c === 1, alpha).when(c === 2, 1.0).when(c === 0, 0.0)
  }

  /** Encode every genotype-kind variable of `cf` in place, returning a
    * frame where those columns are continuous dosages (or 3-level
    * categoricals for codominant) — the per-variable transform the study
    * runners apply before fitting (reference: glm_regression.py:364-384). */
  def encode(cf: CladeFrame, encoding: String,
             edgeAlphas: Map[String, Double] = Map.empty): CladeFrame = {
    val genoCols = cf.variablesOfType(VariableType.Genotype)
    if (genoCols.isEmpty) return cf
    val enc: (String, Column) => Column = (name, g) => encoding match {
      case "additive"   => additive(g)
      case "dominant"   => dominant(g)
      case "recessive"  => recessive(g)
      case "codominant" => codominant(g)
      case "edge" => edge(g, edgeAlphas.getOrElse(name,
        throw new IllegalArgumentException(s"edge encoding needs alpha for $name")))
      case other => throw new IllegalArgumentException(s"unknown encoding: $other")
    }
    // ONE projection for every genotype column — a foldLeft(withColumn)
    // chain re-analyzes a growing plan per column (quadratic at genomic
    // widths)
    val df = cf.df.select(cf.df.columns.map { c =>
      if (genoCols.contains(c)) enc(c, col(c)).as(c) else col(c)
    }: _*)
    val newTypes = genoCols.map(c => c ->
      (if (encoding == "codominant") VariableType.Categorical else VariableType.Continuous))
    val newLevels =
      if (encoding == "codominant") genoCols.map(_ -> Seq("0", "1", "2")).toMap
      else Map.empty[String, Seq[String]]
    cf.copy(df = df, types = cf.types ++ newTypes, levels = cf.levels ++ newLevels)
  }

  /** Variant metadata carried alongside a genotype COLUMN — the Spark-native
    * analogue of the variant object inside pandas-genomics' GenotypeDtype
    * (reference context: glm_regression.py:364-384, where EDGE bookkeeping
    * and MAF summaries read it). Keyed by column name in an
    * O(#variant-columns) driver map: variant metadata is schema-scale,
    * never data-scale. */
  final case class VariantInfo(variantId: String, chrom: String, pos: Long,
                               ref: String, alt: String)

  /** MAF + genotype-count describe over genotype columns: ONE stack
    * generator melts every column to (variable, call) and ONE grouped
    * aggregation produces the table — no per-column pass and no wide-agg
    * codegen cliff at genomic width. Output per variant: call counts,
    * alt-allele frequency, minor-allele frequency, plus (variant_id, chrom,
    * pos, ref, alt) when variant info is provided. */
  def describeMaf(cf: CladeFrame,
                  variantInfo: Map[String, VariantInfo] = Map.empty,
                  only: Option[Seq[String]] = None): DataFrame = {
    val all = cf.variablesOfType(VariableType.Genotype)
    val cols = only.map(sel => all.filter(sel.contains)).getOrElse(all)
    require(cols.nonEmpty, "no genotype variables to describe")
    // chunked melt: ONE stack over a million variant columns would build a
    // single parser-breaking expression; 512-column chunks union instead,
    // and each branch's scan prunes to exactly its chunk's columns
    val melted = cols.grouped(512).map { chunk =>
      cf.df.selectExpr(
        s"stack(${chunk.size}, ${chunk.map(c => s"'$c', `$c`").mkString(", ")}) AS (variable, g)")
    }.reduce(_ unionByName _)
    val agg = melted.select(col("variable"), altCount(col("g")).as("ac"))
      .groupBy("variable").agg(
        count(lit(1)).as("n_total"),
        count(col("ac")).as("n_obs"),
        sum(when(col("ac") === 0, 1L).otherwise(0L)).as("n_hom_ref"),
        sum(when(col("ac") === 1, 1L).otherwise(0L)).as("n_het"),
        sum(when(col("ac") === 2, 1L).otherwise(0L)).as("n_hom_alt"),
        sum(col("ac")).as("alt_alleles"))
      .withColumn("n_missing", col("n_total") - col("n_obs"))
      .withColumn("alt_freq",
        col("alt_alleles").cast("double") / (lit(2.0) * col("n_obs")))
      .withColumn("maf", least(col("alt_freq"), lit(1.0) - col("alt_freq")))
      .drop("n_total")
    val out =
      if (variantInfo.isEmpty) agg
      else {
        val spark = cf.df.sparkSession
        import spark.implicits._
        val infoDf = cols.flatMap(c => variantInfo.get(c).map(vi =>
          (c, vi.variantId, vi.chrom, vi.pos, vi.ref, vi.alt)))
          .toDF("variable", "variant_id", "chrom", "pos", "ref", "alt")
        agg.join(broadcast(infoDf), Seq("variable"), "left")
      }
    out.orderBy("variable")
  }

  /** Hardy-Weinberg equilibrium chi-square QC per variant — the standard
    * pre-GWAS variant filter (het excess/deficit signals genotyping error).
    * Same one-melt-one-aggregation shape as [[describeMaf]]; everything
    * downstream of the counts is pure column algebra on the O(#variants)
    * aggregate, so the whole test is SQL-replayable (oracled): expected
    * counts from the observed allele frequency, 1-df chi-square, and the
    * p-value via the Abramowitz-Stegun 7.1.26 erfc polynomial
    * (|error| < 1.5e-7 — a QC flag, not an inference p; monomorphic
    * variants get null chi2/p). `failAt` adds a boolean `hwe_fail`. */
  def hweTest(cf: CladeFrame, only: Option[Seq[String]] = None,
              failAt: Double = 1e-6): DataFrame = {
    val all = cf.variablesOfType(VariableType.Genotype)
    val cols = only.map(sel => all.filter(sel.contains)).getOrElse(all)
    require(cols.nonEmpty, "no genotype variables to test")
    val melted = cols.grouped(512).map { chunk =>
      cf.df.selectExpr(
        s"stack(${chunk.size}, ${chunk.map(c => s"'$c', `$c`").mkString(", ")}) AS (variable, g)")
    }.reduce(_ unionByName _)
    val counts = melted.select(col("variable"), altCount(col("g")).as("ac"))
      .groupBy("variable").agg(
        count(col("ac")).as("n_obs"),
        sum(when(col("ac") === 0, 1L).otherwise(0L)).as("n_hom_ref"),
        sum(when(col("ac") === 1, 1L).otherwise(0L)).as("n_het"),
        sum(when(col("ac") === 2, 1L).otherwise(0L)).as("n_hom_alt"),
        sum(col("ac")).as("alt_alleles"))
    val n = col("n_obs").cast("double")
    val p = col("alt_alleles").cast("double") / (lit(2.0) * n)
    val q = lit(1.0) - col("p")
    val eRR = col("n_obs").cast("double") * col("q") * col("q")
    val eHet = lit(2.0) * col("n_obs").cast("double") * col("p") * col("q")
    val eAA = col("n_obs").cast("double") * col("p") * col("p")
    def d2(o: Column, e: Column): Column = (o.cast("double") - e) * (o.cast("double") - e) / e
    // 1-df chi2 sf = erfc(sqrt(x/2)); A-S 7.1.26 column form (ColMath)
    val z = sqrt(col("hwe_chi2") / 2.0)
    counts
      .withColumn("p", p).withColumn("q", q)
      .withColumn("hwe_chi2",
        when(col("p") > 0.0 && col("p") < 1.0 && n > 0,
          d2(col("n_hom_ref"), eRR) + d2(col("n_het"), eHet) + d2(col("n_hom_alt"), eAA)))
      .withColumn("hwe_p", when(col("hwe_chi2").isNotNull,
        graft.stats.ColMath.erfcPos(z)))
      .withColumn("hwe_fail",
        when(col("hwe_p").isNotNull, col("hwe_p") < failAt).otherwise(lit(false)))
      .select(col("variable"), col("n_obs"), col("n_hom_ref"), col("n_het"),
        col("n_hom_alt"), col("p").as("alt_freq"), col("hwe_chi2"),
        col("hwe_p"), col("hwe_fail"))
      .orderBy("variable")
  }

  /** EDGE alpha lookup keyed by VARIANT ID with column-name fallback: the
    * reference's encoding_info table carries variant ids from the genotype
    * dtype, not DataFrame column names. */
  def edgeAlphasFor(info: DataFrame, variantInfo: Map[String, VariantInfo],
                    genoCols: Seq[String]): Map[String, Double] = {
    val byId = edgeAlphasFrom(info)
    genoCols.flatMap { c =>
      byId.get(variantInfo.get(c).map(_.variantId).getOrElse(c))
        .orElse(byId.get(c))
        .map(c -> _)
    }.toMap
  }

  /** Parse the reference's EDGE weights-table contract: one row per variant
    * with columns "Variant ID" and "Alpha Value" (pandas-genomics
    * `encode_edge(encoding_info)`; reference: glm_regression.py:383-384).
    * Snake-case variants of the names are accepted too. The table is
    * O(#variant COLUMNS), so collecting it is bounded by schema width, not
    * data size. */
  def edgeAlphasFrom(info: DataFrame): Map[String, Double] = {
    val norm = info.columns.map(_.toLowerCase.replace(" ", "_"))
    val vi = norm.indexWhere(_ == "variant_id")
    val ai = norm.indexWhere(c => c == "alpha_value" || c == "alpha")
    require(vi >= 0 && ai >= 0,
      s"edge_encoding_info needs 'Variant ID' and 'Alpha Value' columns, got ${info.columns.mkString(", ")}")
    info.select(col(info.columns(vi)).cast("string"), col(info.columns(ai)).cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  /** The study runners' encoding hook (reference: association_study.py:20-21,
    * interaction_study.py:16 — `encoding=` / `edge_encoding_info=`): encode
    * any genotype-kind columns before fitting; a no-op on frames without
    * genotypes. */
  def encodeForStudy(cf: CladeFrame, encoding: String,
                     edgeEncodingInfo: Option[DataFrame],
                     variantInfo: Map[String, VariantInfo] = Map.empty): CladeFrame = {
    val genoCols = cf.variablesOfType(VariableType.Genotype)
    if (genoCols.isEmpty) cf
    else if (encoding == "edge") {
      val info = edgeEncodingInfo.getOrElse(throw new IllegalArgumentException(
        "'edge_encoding_info' must be provided when using edge encoding"))
      encode(cf, "edge", edgeAlphasFor(info, variantInfo, genoCols))
    } else encode(cf, encoding)
  }

  /** Deterministic variant metadata for [[simulateCaseControl]]'s SNPs —
    * the simulator's companion table for MAF/EDGE bookkeeping tests. */
  def simulatedVariantInfo(nSnps: Int): Map[String, VariantInfo] =
    (0 until nSnps).map { s =>
      s"SNP$s" -> VariantInfo(s"rs${1000 + s}", ((s % 22) + 1).toString,
        10000L + 137L * s, "A", "G")
    }.toMap

  /** Seeded case/control genotype simulator (a BAMS-like generator,
    * reference fixture: tests/analyze/conftest.py:47-119): `nSnps` random
    * SNPs with the given minor-allele frequency, `effectSnps` contributing
    * log-odds `beta` per alt allele, plus an optional purely-interactive
    * pair that shifts odds only when BOTH are alt-carrying. Fully
    * distributed: one `spark.range`, per-row deterministic RNG seeded by
    * (seed, sample id). */
  def simulateCaseControl(
      spark: SparkSession,
      nSamples: Int,
      nSnps: Int,
      maf: Double = 0.3,
      effectSnps: Map[Int, Double] = Map.empty,
      interactionPair: Option[(Int, Int, Double)] = None,
      seed: Long = 42L): CladeFrame = {
    import spark.implicits._
    val rows = spark.range(nSamples).as[Long].mapPartitions { it =>
      it.map { i =>
        // splitmix64-scramble the per-row seed: java.util.Random's first
        // draws from SEQUENTIAL seeds are correlated, which visibly biased
        // the first SNP's allele frequency (0.22 observed for maf=0.3)
        var z = seed * 1000003L + i + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        val rnd = new scala.util.Random(z ^ (z >>> 31))
        val genos = Array.tabulate(nSnps) { _ =>
          Array(
            if (rnd.nextDouble() < maf) 1 else 0,
            if (rnd.nextDouble() < maf) 1 else 0)
        }
        def dose(s: Int) = genos(s).count(_ == 1)
        var logit = -0.5
        effectSnps.foreach { case (s, b) => logit += b * dose(s) }
        interactionPair.foreach { case (a, b, g) =>
          if (dose(a) > 0 && dose(b) > 0) logit += g
        }
        val p = 1.0 / (1.0 + math.exp(-logit))
        val outcome = if (rnd.nextDouble() < p) "Case" else "Control"
        (i, outcome, genos)
      }
    }
    val df = rows.toDF("id", "Outcome", "genos")
    val withSnps = df.select(
      col("id") +: col("Outcome") +:
        (0 until nSnps).map(s => col("genos").getItem(s).as(s"SNP$s")): _*)
    CladeFrame(withSnps)
      .withTypes((0 until nSnps).map(s => s"SNP$s" -> (VariableType.Genotype: VariableType)).toMap
        ++ Map("Outcome" -> VariableType.Binary))
      .withLevels(Map("Outcome" -> Seq("Case", "Control")))
  }
}
