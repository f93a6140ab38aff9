package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / mixture operators for training-data pipelines
  * (driver mandate — corpus curation beyond the reference surface).
  *
  * Everything is keyed on a cryptographic hash of a caller-chosen key column,
  * never on RNG state: the same row always makes the same decision, on any
  * cluster, at any partitioning, on re-runs — the property training-data
  * pipelines need for reproducible corpus releases (and the property that
  * makes every operator here replayable as an ANSI-SQL oracle).
  *
  * Scale notes:
  *  - hashSample: per-row predicate, zero shuffle, combines with pushdown.
  *  - stratifiedSample: rank-per-stratum rides Spark's WindowGroupLimit
  *    (rank <= literal k): each input partition keeps only its local top-k
  *    BEFORE the shuffle, so the stratum sort never materializes.
  *  - domainMix: exact mode ranks inside each domain (one shuffle; quotas
  *    are a broadcast O(#domains) table); threshold mode is the 100 TB
  *    path — zero row shuffle, one O(#domains) aggregate + broadcast join.
  */
object Sampling {

  /** 15-hex-digit decision bucket of a key: uniform on [0, 16^15), stable
    * across engines (md5 of the key's canonical string form). 15 digits =
    * 60 bits — comfortably below 2^53 so thresholds stay exact in doubles
    * and in every SQL engine's NUMERIC. */
  def hashBucket(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, 15)

  /** `fraction` as a 15-hex-digit threshold string: a row is kept iff
    * hashBucket(key) < hexThreshold(fraction) (lexicographic compare of
    * equal-length lowercase hex = numeric compare). */
  def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1]: $fraction")
    val space = BigInt(16).pow(15)
    val scaled = (BigDecimal(fraction) * BigDecimal(space)).toBigInt
    val s = scaled.min(space - 1).max(BigInt(0)).toString(16)
    ("0" * (15 - s.length)) + s
  }

  /** Deterministic Bernoulli sample: keep each row with probability
    * `fraction`, decided solely by the key hash. */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(hashBucket(key) < lit(hexThreshold(fraction)))

  /** Deterministic named-split assignment (train/val/test): adds `out` =
    * the first split name whose cumulative 15-hex threshold exceeds the
    * row's [[hashBucket]]. Fractions must sum to 1; the last split absorbs
    * the rounding tail so every row is assigned. Zero shuffle — a pure
    * projection that composes with pushdown, and the decision is
    * membership-stable: adding or removing OTHER rows never moves a row
    * across splits (unlike ntile/percent_rank splits).
    *
    * Leakage control: pass a CONTENT key ([[graft.pipeline.Text.fingerprint]]
    * of the text, or a dup-group representative) instead of a row id and
    * exact duplicates land in the same split — near-dup groups stay
    * train-or-eval, never both. */
  def splitAssign(df: DataFrame, key: Column, splits: Seq[(String, Double)],
                  out: String = "split"): DataFrame = {
    require(splits.size >= 2, s"need >= 2 splits: ${splits.size}")
    require(splits.map(_._1).distinct.size == splits.size, "split names must be distinct")
    require(splits.forall(_._2 > 0), s"fractions must be positive: $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1: ${splits.map(_._2).sum}")
    val bucket = hashBucket(key)
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).drop(1)
    val assigned = splits.init.zip(cum).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), c)) =>
        val cond = bucket < lit(hexThreshold(c))
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
    }
    df.withColumn(out, assigned.get.otherwise(splits.last._1))
  }

  /** Exactly-k-per-stratum deterministic sample: within each stratum, rank
    * rows by (key hash, key) and keep the first k. The literal rank bound
    * keeps the plan on WindowGroupLimit (per-partition top-k pushdown), so
    * a billion-row stratum shuffles only ~k rows per input partition. */
  def stratifiedSample(df: DataFrame, strataCols: Seq[String], k: Int,
                       key: Column): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(hashBucket(key), key.cast("string"))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Seeded per-row shuffle key: md5 of "seed:key". Changing the seed is a
    * fresh independent permutation (epoch reshuffles); same seed + same key
    * = same position on any cluster. Key must be non-null. */
  def shuffleKey(key: Column, seed: String): Column =
    md5(concat(lit(seed + ":"), key.cast("string")).cast("binary"))

  /** Deterministic global corpus shuffle: appends `shuffle_pos` (0-based),
    * the row's position in the seeded permutation. Training-data pipelines
    * need a reproducible global order (shard assignment, resume points) —
    * RNG-based `orderBy(rand())` changes on re-run and retry.
    *
    * Distributed as a RANGE sort (no single-partition ordering window):
    * `orderBy` range-partitions on the hash key, `zipWithIndex` assigns
    * global positions from per-partition counts — one count job + the sort,
    * at any scale. */
  def shufflePositions(df: DataFrame, key: Column, seed: String): DataFrame = {
    val spark = df.sparkSession
    val width = df.schema.size
    val outSchema = org.apache.spark.sql.types.StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField("shuffle_pos",
        org.apache.spark.sql.types.LongType, nullable = false))
    val outRdd = df.withColumn("__sk", shuffleKey(key, seed))
      .orderBy(col("__sk"), key.cast("string"))
      .rdd.zipWithIndex()
      .map { case (r, i) => org.apache.spark.sql.Row.fromSeq(r.toSeq.take(width) :+ i) }
    spark.createDataFrame(outRdd, outSchema)
  }

  /** The write-side companion of [[shufflePositions]]: range-partition the
    * seeded permutation into `numShards` contiguous shards and sort within
    * each — `.write.parquet(...)` then yields shard files that, read in
    * shard order, replay the exact global shuffle order without ever
    * materializing a global sort on one node. Shard boundaries come from
    * Spark's range sampler, so shards are near-equal in rows. */
  def shuffledShards(df: DataFrame, key: Column, seed: String,
                     numShards: Int): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val sk = shuffleKey(key, seed)
    df.repartitionByRange(numShards, sk, key.cast("string"))
      .sortWithinPartitions(sk, key.cast("string"))
  }

  /** Importance (per-row-probability) sampling: keep each row with its OWN
    * probability `prob` (a Column — e.g. a quality-classifier score or a
    * length-saturation curve), decided by the deterministic key hash. The
    * quality-weighted downsampling step of corpus curation ("keep good docs
    * with p≈1, bad docs with p≈0.1") as a zero-shuffle predicate.
    *
    * Decision rule: hashBucket(key) < hex(floor(clamp(prob)·16^15)) — the
    * row's 60-bit uniform against a per-row hex threshold, so the decision
    * replays bit-identically in any SQL engine (the probability only enters
    * through floor(p·2^60), which is exact IEEE in both). */
  def importanceSample(df: DataFrame, prob: Column, key: Column): DataFrame = {
    val space = lit(math.pow(16.0, 15.0))                  // 2^60, exact double
    val maxT = lit(1152921504606846975L)                   // 16^15 − 1
    val clamped = least(greatest(prob.cast("double"), lit(0.0)), lit(1.0))
    val threshold = lower(lpad(hex(
      least(floor(clamped * space).cast("long"), maxT)), 15, "0"))
    df.filter(hashBucket(key) < threshold)
  }

  /** Deterministic weighted sampling WITHOUT replacement, exactly k rows
    * (per stratum if `strataCols` non-empty): Efraimidis–Spirakis A-ES —
    * each row draws u ∈ (0,1] from its key hash and scores u^(1/w); the k
    * largest scores are a weighted-without-replacement sample. The
    * quality-weighted "pick the best k docs, favoring high scores but not
    * deterministically top-k" curation step, reproducible on any cluster.
    *
    * u uses 13 hex digits (52 bits): v+1 ≤ 2^52 is exact in a double and
    * 16^13 is a power of two, so u is EXACT IEEE in every engine and the
    * oracle replays the same doubles. Rows with weight ≤ 0 or null rank
    * strictly below every positive-weight row (score −1). Global k rides
    * sort+limit (TakeOrderedAndProject — per-partition top-k, no global
    * sort); per-stratum k rides WindowGroupLimit like [[stratifiedSample]].
    * Adds `es_score` (the selection score) to the output. */
  def weightedSample(df: DataFrame, weight: Column, key: Column, k: Int,
                     strataCols: Seq[String] = Nil): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (conv(substring(md5(key.cast("string").cast("binary")), 1, 13), 16, 10)
      .cast("double") + 1.0) / math.pow(16.0, 13.0)
    val w0 = weight.cast("double")
    val score = when(w0.isNotNull && w0 > 0.0, pow(u, lit(1.0) / w0))
      .otherwise(lit(-1.0))
    val scored = df.withColumn("es_score", score)
    if (strataCols.isEmpty)
      scored.orderBy(col("es_score").desc, key.cast("string").asc).limit(k)
    else {
      val win = Window.partitionBy(strataCols.map(col): _*)
        .orderBy(col("es_score").desc, key.cast("string").asc)
      scored.withColumn("__rn", row_number().over(win))
        .filter(col("__rn") <= k)
        .drop("__rn")
    }
  }

  /** Static domain-mixture resampling (downsample-only): given target
    * proportions per domain (e.g. The Pile / Gopher-style corpus weights),
    * keep the LARGEST subset whose domain shares match the targets.
    *
    * Feasible total T = min over targeted domains of count_d / weight_d;
    * each domain keeps quota_d = floor(weight_d * T) rows. Domains absent
    * from `targets` (or with weight 0) are dropped — the mixture is the
    * contract.
    *
    * exact=true  — rank rows per domain by key hash and keep the first
    *               quota_d: output counts are EXACTLY the quotas.
    * exact=false — per-domain hash threshold at rate quota_d/count_d:
    *               zero-shuffle scale path, counts binomial around quota.
    *
    * NOTE: the quota computation is an O(#domains) counts ACTION over
    * `df` that runs before the returned plan — when `df` sits atop an
    * expensive pipeline (joins, components, verification chains),
    * persist/localCheckpoint it first or the upstream computes TWICE
    * (pipeline_release_e2e measured 26.8s→16.0s at sfx10 from exactly
    * this; same applies to [[temperatureMix]]). */
  def domainMix(df: DataFrame, domainCol: String, targets: Map[String, Double],
                key: Column, exact: Boolean = true): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ >= 0.0),
      "targets must be non-negative weights")
    val spark = df.sparkSession
    import spark.implicits._
    // O(#domains) metadata aggregate — never row-scale
    val counts = df.groupBy(col(domainCol).as("__domain"))
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => r.getAs[Any]("__domain").toString -> r.getAs[Long]("__n"))
      .toMap
    val present = targets.filter { case (d, w) => w > 0.0 && counts.getOrElse(d, 0L) > 0L }
    require(present.nonEmpty, "no targeted domain present in the data")
    val feasibleT = present.map { case (d, w) => counts(d) / w }.min
    val quotas = present.map { case (d, w) =>
      val q = math.min(counts(d), math.floor(w * feasibleT + 1e-9).toLong)
      (d, q, hexThreshold(math.min(1.0, q.toDouble / counts(d))))
    }.toSeq.toDF("__domain", "__quota", "__thresh")
    val joined = df.join(broadcast(quotas),
      col(domainCol).cast("string") === col("__domain"), "inner")
    val kept =
      if (exact) {
        val w = Window.partitionBy(col(domainCol))
          .orderBy(hashBucket(key), key.cast("string"))
        joined.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= col("__quota"))
      } else joined.filter(hashBucket(key) < col("__thresh"))
    kept.drop("__domain", "__quota", "__thresh", "__rn")
  }

  /** Data-constrained epoch allocation (repetition budgeting): spread a
    * total token `budget` across domains with at most `maxEpochs` passes
    * over any domain, WATER-FILLING the unsaturated ones — the standard
    * answer to "our budget exceeds the corpus, how many times do we
    * repeat each domain" (repetition caps because repeated data decays in
    * value). Contract: every domain receives min(cap_d, L) tokens where
    * cap_d = n_d·maxEpochs and the waterline L is the unique level with
    * Σ min(cap_d, L) = budget (budget ≥ Σ cap degenerates to all caps;
    * small domains saturate at maxEpochs, large ones share the line).
    *
    * Exactness discipline (the micro-nats/IEEE-sqrt family): counts,
    * caps, the saturation prefix sums, and the crossing search are all
    * int64 — partitioning-invariant and engine-exact — and L is ONE
    * division of two exact int64s, so every downstream double is
    * identically rounded in any engine. Driver state is O(#domains)
    * aggregates ([[domainMix]] precedent). Returns per domain
    * (domain, n_tokens, cap, alloc, epochs) with epochs = alloc/n. */
  def epochMix(df: DataFrame, domainCol: String, tokens: Column,
               budget: Long, maxEpochs: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1: $maxEpochs")
    val spark = df.sparkSession
    import spark.implicits._
    // O(#domains) metadata aggregate — never row-scale
    val counts = df.groupBy(col(domainCol).cast("string").as("__domain"))
      .agg(sum(tokens.cast("long")).as("__n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .filter(_._2 > 0L)
      .sortBy { case (d, n) => (Math.multiplyExact(n, maxEpochs), d) }
    require(counts.nonEmpty, "no domain with positive token count")
    val caps = counts.map { case (_, n) => Math.multiplyExact(n, maxEpochs) }
    val totalCap = caps.foldLeft(0L)(Math.addExact)
    val dCount = counts.length
    // crossing search in exact int64: smallest j (domains 0..j-1 saturate)
    // with prefix(j) + (D-j)·cap_j >= budget
    val alloc: Array[Double] =
      if (budget >= totalCap) caps.map(_.toDouble).toArray
      else {
        var prefix = 0L
        var j = 0
        while (j < dCount &&
          Math.addExact(prefix, Math.multiplyExact(caps(j), (dCount - j).toLong)) < budget) {
          prefix = Math.addExact(prefix, caps(j)); j += 1
        }
        // L: one exact-int64 division -> identically rounded everywhere
        val line = (budget - prefix).toDouble / (dCount - j).toDouble
        Array.tabulate(dCount)(i => if (i < j) caps(i).toDouble else line)
      }
    counts.zipWithIndex.map { case ((d, n), i) =>
      (d, n, caps(i), alloc(i), alloc(i) / n.toDouble)
    }.toSeq.toDF("domain", "n_tokens", "cap", "alloc", "epochs")
  }

  /** Corpus-release shard manifest: deterministic shard assignment (the
    * seeded shuffle key modulo `numShards` — membership-stable and
    * engine-replayable, unlike repartitionByRange's sampled bounds) plus
    * per-shard doc counts and an ORDER-FREE integer content checksum
    * (sum of the 40-bit prefix of each row's content fingerprint — exact
    * int64 far past any realistic shard size, so any engine, any
    * partitioning, any retry produces the same manifest). This is the
    * artifact a reproducible corpus release ships: a reader can re-derive
    * it after download and diff against the published table.
    *
    * Scale shape: zero-shuffle projections + ONE map-side-combined
    * aggregation to O(numShards) rows. Exactness bound: 40-bit sigs in an
    * int64 sum stay exact below 2^23 (~8.4M) documents PER SHARD — size
    * `numShards` to keep shards under that (any sane shard is), and note
    * a violation cannot pass silently: the SQL replay sums in unbounded
    * precision, so an engine-side wrap surfaces as a verification
    * mismatch. */
  def shardManifest(df: DataFrame, content: Column, key: Column,
                    seed: String, numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    val shard = pmod(
      conv(substring(shuffleKey(key, seed), 1, 13), 16, 10).cast("long"),
      lit(numShards.toLong))
    val sig = conv(substring(md5(content.cast("binary")), 1, 10), 16, 10).cast("long")
    df.select(shard.as("shard_id"), sig.as("__sig"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("__sig").as("content_checksum"))
  }

  /** Temperature-flattened domain mixture — the multilingual/multi-domain
    * sampling rule p_d ∝ n_d^τ (τ < 1 upweights tail domains relative to
    * their natural share; UniMax/mT5-style): keep the LARGEST subset
    * whose domain composition follows n_d^τ, via [[domainMix]]'s quota
    * algebra. τ = 0.5 is the cross-engine-replayable sweet spot: IEEE 754
    * REQUIRES sqrt to be correctly rounded, so the oracle's weights are
    * bitwise identical (pow carries no such guarantee). Weights are
    * deliberately UNNORMALIZED — the quota algebra is scale-invariant,
    * and skipping the Σ n^τ normalizer removes the one summation-order-
    * dependent float in the pipeline. O(#domains) driver metadata only. */
  def temperatureMix(df: DataFrame, domainCol: String, tau: Double,
                     key: Column, exact: Boolean = true): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1]: $tau")
    val counts = df.groupBy(col(domainCol).as("__d"))
      .agg(count(lit(1)).as("__n")).collect()
      .map(r => r.getAs[Any]("__d").toString -> r.getAs[Long]("__n"))
    val targets = counts.map { case (d, n) =>
      d -> (if (tau == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, tau))
    }.toMap
    domainMix(df, domainCol, targets, key, exact)
  }

  /** NEAR-dup-leakage-safe split: every document of a dedup component (the
    * `(id, component)` output of [[Dedup.components]] over verified
    * near-dup pairs) is assigned to the SAME train/val/test split, decided
    * by the hash of the component representative alone; documents in no
    * component key on their own id (a singleton IS its representative).
    * [[splitAssign]] on a content fingerprint already co-locates EXACT
    * duplicates — this closes the remaining eval-contamination hole, where
    * a lightly-edited copy of a training document lands in the test split.
    *
    * Adds `group` (the representative as string) and `out` (the split
    * name) to `docs`.
    *
    * Scale shape: `components` holds one row per document that is in some
    * dup group — orders of magnitude smaller than the corpus. The left
    * join is a broadcast when Spark's stats allow it, else one
    * co-partitioned equi-join on id; the split decision itself is the
    * usual zero-shuffle hash projection, and stays membership-stable
    * (re-running after adding documents never moves an untouched group). */
  def componentSplit(docs: DataFrame, components: DataFrame, idCol: String,
                     splits: Seq[(String, Double)], out: String = "split",
                     group: String = "split_group"): DataFrame = {
    val comp = components.select(col("id").cast("string").as("__cs_id"),
      col("component").cast("string").as("__cs_comp"))
    val rep = coalesce(col("__cs_comp"), col(idCol).cast("string"))
    val keyed = docs.join(comp, docs(idCol).cast("string") === col("__cs_id"), "left")
      .withColumn(group, rep)
    splitAssign(keyed, col(group), splits, out).drop("__cs_id", "__cs_comp")
  }

  /** DSIR-style data selection scores (Data Selection via Importance
    * Resampling, Xie et al. 2023): per-document log-likelihood ratio
    * between a TARGET-domain unigram model and the raw-corpus unigram
    * model, add-1 smoothed over the shared vocabulary —
    * `score = Σ_w c_w(doc) · [ln p_target(w) − ln p_raw(w)]`. High scores
    * = "looks like the target domain"; feed them to [[weightedSample]] /
    * a top-k cut to select pretraining data that matches a quality or
    * domain reference corpus.
    *
    * Determinism contract: per-word log-ratios are quantized to integer
    * MICRO-NATS (`lam_unats`) before the per-document sum, so the
    * aggregation is exact int64 arithmetic — no float-summation-order
    * sensitivity across partitionings or engines (the NOTES.md sig6
    * discipline). The log inputs are exact int64-ratio doubles, so both
    * engines round the same value.
    *
    * Scale shape: the corpus is scanned once into (doc, word)
    * multiplicities (map-side combined); the λ table is VOCAB-sized and
    * joins by word (broadcast when stats allow); totals ride as one
    * broadcast row. No row-scale driver state, no window over the corpus. */
  def dsirScores(df: DataFrame, textCol: String, idCol: String,
                 isTarget: Column): DataFrame = {
    val toks = df.select(col(idCol).as("__id"), isTarget.as("__t"),
        explode(split(Text.normalized(col(textCol)), " ")).as("word"))
      .filter(col("word") =!= "")
    val counts = toks.groupBy("word").agg(
      count(lit(1)).as("c_all"),
      sum(when(col("__t"), 1L).otherwise(0L)).as("c_tgt"))
    val tot = broadcast(counts.agg(sum("c_all").as("n_raw"),
      sum("c_tgt").as("n_tgt"), count(lit(1)).as("vocab")))
    val lam = counts.crossJoin(tot)
      .withColumn("lam_unats", round(
          (log((col("c_tgt") + 1).cast("double") /
               (col("n_tgt") + col("vocab")).cast("double")) -
           log((col("c_all") + 1).cast("double") /
               (col("n_raw") + col("vocab")).cast("double"))) * 1e6)
        .cast("long"))
      .select("word", "lam_unats")
    toks.groupBy("__id", "word").agg(count(lit(1)).as("__c"))
      .join(lam, Seq("word"))
      .groupBy("__id")
      .agg(sum("__c").as("n_tokens"),
        sum(col("__c") * col("lam_unats")).as("score_unats"))
      .withColumnRenamed("__id", idCol)
      .withColumn("score", col("score_unats").cast("double") / 1e6)
  }

  /** Curriculum INTERLEAVE ordering (r13 VERDICT #3): assign each row an
    * exact difficulty-quantile bucket (ntile semantics: the first n mod k
    * buckets take the extra row) and a deterministic output position that
    * round-robins the buckets — position = rank_in_bucket · k + bucket —
    * so a reader consuming the corpus in position order sees one easy,
    * one medium, ..., one hard, repeat: the standard curriculum/difficulty
    * mixing step before sharding training data.
    *
    * No global window anywhere: ONE Tungsten range sort on
    * (difficulty, id) — the [[graft.modify.Modify.rintMap]] machinery —
    * then a per-partition counting pass gives each partition its global
    * start offset, and bucket / rank_in_bucket / position are all
    * CLOSED-FORM arithmetic on the global rank (ntile of rank r with n
    * rows and k buckets is pure integer math), computed in a streaming
    * mapPartitions with a running index. Two jobs total, both scans of
    * the sorted frame; nothing is collected beyond the O(partitions)
    * offset array. Ties order by id, so the output is bit-stable under
    * any partitioning and replayable as a row_number() oracle.
    *
    * Returns (id, difficulty, bucket, rank_in_bucket, position); rows with
    * NULL/NaN difficulty are excluded (they have no quantile). */
  def curriculumOrder(df: DataFrame, difficultyCol: String, idCol: String,
                      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val spark = df.sparkSession
    val proj = df.select(col(idCol).as("id"),
        col(difficultyCol).cast("double").as("difficulty"))
      .filter(col("difficulty").isNotNull && !isnan(col("difficulty")))
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val sorted = proj.repartitionByRange(parts, col("difficulty"), col("id"))
      .sortWithinPartitions("difficulty", "id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val perPart = sorted.rdd.mapPartitionsWithIndex { (pi, it) =>
        var c = 0L; it.foreach(_ => c += 1L); Iterator.single((pi, c))
      }.collect().sortBy(_._1).map(_._2)
      val starts = perPart.scanLeft(0L)(_ + _)
      val n = starts.last
      val q = n / k; val m = n % k // ntile: first m buckets hold q+1 rows
      val idType = sorted.schema("id").dataType
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("difficulty",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("bucket",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rank_in_bucket",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("position",
          org.apache.spark.sql.types.LongType)))
      val rows = sorted.rdd.mapPartitionsWithIndex { (pi, it) =>
        var r = starts(pi)
        it.map { row =>
          val (b, rib) =
            if (r < m * (q + 1)) { val b = r / (q + 1); (b, r - b * (q + 1)) }
            else { val r2 = r - m * (q + 1); (m + r2 / q, r2 % q) }
          r += 1
          org.apache.spark.sql.Row(row.get(0), row.getDouble(1),
            b, rib, rib * k + b)
        }
      }
      // the output is computed in one pass over the persisted sort; eager
      // materialization via localCheckpoint releases it deterministically
      spark.createDataFrame(rows, outSchema).localCheckpoint()
    } finally sorted.unpersist(blocking = false)
  }

  /** Contrastive training-pair construction from duplicate components —
    * the SimCSE/retriever-training feed: for every non-representative
    * member of a duplicate group, one POSITIVE pair (anchor → its group
    * representative = the `component` value) and up to `negK`
    * deterministic NEGATIVES drawn by circular hash order. Negatives:
    * every doc gets a global position p by seeded-md5 order (one
    * Tungsten range sort + partition-offset running index — zero
    * windows, the curriculumOrder machinery via row ranks replayable as
    * `row_number() OVER (ORDER BY md5(seed:id), id)`); anchor at p takes
    * partners at (p + j) mod n for j = 1..negK, SKIPPING partners in the
    * anchor's own component (so a "negative" is never a known
    * duplicate — some anchors may therefore carry fewer than negK
    * negatives, by contract, rather than backfilled ones that would need
    * data-dependent iteration). Changing `seed` is a fresh negative
    * draw; same seed = byte-stable pairs (the release-reproducibility
    * contract). Ids ride as strings (the dedup grouping convention).
    * `components` is any (id, component) table — exact groups, minhash
    * star, prefix star, winnow star all fit. Returns
    * (anchor, partner, kind) with kind in ('pos', 'neg'). */
  def contrastivePairs(docs: DataFrame, components: DataFrame,
                       idCol: String, negK: Int = 2,
                       seed: String = "cp1"): DataFrame = {
    require(negK >= 0, s"negK must be >= 0: $negK")
    val spark = docs.sparkSession
    val ids = docs.select(col(idCol).cast("string").as("id"))
    val comp = components.select(col("id").cast("string").as("id"),
      col("component").cast("string").as("component"))
    val withComp = ids.join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
      .localCheckpoint() // three consumers: positives, anchor lookup, negative verify
    val pos = withComp.filter(col("id") =!= col("component"))
      .select(col("id").as("anchor"), col("component").as("partner"),
        lit("pos").as("kind"))
    if (negK == 0) return pos
    // global circular positions by seeded hash: range sort + per-partition
    // offset running index (zero windows)
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val hashed = withComp
      .withColumn("__h", md5(concat(lit(seed + ":"), col("id"))))
      .repartitionByRange(parts, col("__h"), col("id"))
      .sortWithinPartitions("__h", "id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val perPart = hashed.rdd.mapPartitionsWithIndex { (pi, it) =>
        var c = 0L; it.foreach(_ => c += 1L); Iterator.single((pi, c))
      }.collect().sortBy(_._1).map(_._2)
      val starts = perPart.scanLeft(0L)(_ + _)
      val n = starts.last
      // the circle has only n-1 distinct non-self partners: j beyond
      // that wraps onto already-drawn positions (j=n is the anchor
      // itself), which would emit byte-identical duplicate negative
      // rows — cap, don't dedup after the fact
      val kEff = math.min(negK.toLong, math.max(n - 1, 0L)).toInt
      if (kEff == 0) return pos
      val posSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("component",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("p",
          org.apache.spark.sql.types.LongType)))
      val positioned = spark.createDataFrame(
        hashed.rdd.mapPartitionsWithIndex { (pi, it) =>
          var r = starts(pi)
          it.map { row =>
            val out = org.apache.spark.sql.Row(row.getString(0), row.getString(1), r)
            r += 1; out
          }
        }, posSchema).localCheckpoint()
      // anchors = positioned rows whose id is a non-representative member —
      // the same predicate that defined `pos`. Filtering `positioned`
      // directly is row-for-row identical to the old distinct+join (the
      // (id, component) pair rides every positioned row), and drops one
      // shuffle (distinct) plus one join from the plan.
      val anchors = positioned.filter(col("id") =!= col("component"))
        .select(col("id").as("anchor"), col("component").as("__acomp"), col("p"))
      val negs = anchors
        .select(col("anchor"), col("__acomp"), col("p"),
          explode(array((1 to kEff).map(lit): _*)).as("__j"))
        .withColumn("__tp", (col("p") + col("__j")) % lit(n))
        .join(positioned.select(col("p").as("__tp"), col("id").as("partner"),
          col("component").as("__pcomp")), Seq("__tp"))
        .filter(col("__pcomp") =!= col("__acomp"))
        .select(col("anchor"), col("partner"), lit("neg").as("kind"))
      pos.unionByName(negs)
    } finally hashed.unpersist(blocking = false)
  }
}
