package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming drift gate (VERDICT r11 #5): score each CLOSED event-time
  * window of a value stream against a STATIC reference distribution, with
  * PSI + binned-KS verdicts — the production monitor between a corpus
  * release (the reference) and live traffic (the stream).
  *
  * Composition of two proven pieces: the batch drift stack's equi-depth
  * binning ([[graft.describe.Describe.psiDrift]] — reference edges from
  * one batched exact-quantile pass, zero-shuffle bin predicate, one
  * aggregation per side) and the streaming discipline every stateful op
  * here follows (watermarked windowed aggregation = bounded state; a
  * SECOND aggregation over a streaming aggregate is not expressible in
  * append mode, so the per-window scoring runs in `foreachBatch` over the
  * closed windows — which arrive complete, because every (window, bin)
  * row of a window closes at the same watermark crossing).
  *
  * Scale shape: the reference profile is O(bins) driver metadata baked
  * into the plan as literals (never a join); the stream shuffles only
  * (window, bin) keys — at most `bins` rows per window alive in state;
  * scoring is column algebra over a bins-length fold. Batch ≡ stream by
  * construction (shared [[windowedBinCounts]] + [[scoreBinned]]), parity-
  * tested on a MemoryStream like dedup_stream_batch. */
object DriftMonitor {

  /** Static reference profile: `edges` = the reference's equi-depth
    * interior quantile edges (bins-1 of them, type-7), `props` = the
    * reference's own per-bin proportions (length bins, sums to 1),
    * `n` = reference row count. O(bins) driver metadata. */
  final case class DriftReference(edges: Seq[Double], props: Seq[Double], n: Long) {
    require(edges.nonEmpty && props.length == edges.length + 1,
      s"need bins-1 edges and bins proportions: ${edges.length} vs ${props.length}")
    def bins: Int = props.length
  }

  /** Build the profile from a reference frame: one batched exact-quantile
    * pass for the edges (type-7, = DuckDB quantile_cont) + one
    * aggregation for the per-bin counts. Nulls excluded (psiDrift's
    * contract). */
  def buildReference(reference: DataFrame, valueCol: String,
                     bins: Int = 10): DriftReference = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    val edges = graft.modify.Modify.exactQuantilesAll(reference, Seq(valueCol),
        (1 until bins).map(_.toDouble / bins))(valueCol)
      .getOrElse(throw new IllegalArgumentException(
        s"reference column $valueCol has no non-null values"))
    val nonNull = reference.filter(col(valueCol).isNotNull)
    val counts = nonNull
      .groupBy(binOf(col(valueCol), edges).as("__bin"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    DriftReference(edges,
      (0 until bins).map(b => counts.getOrElse(b, 0L).toDouble / n), n)
  }

  /** Equi-depth bin index: count of edges the value exceeds — the same
    * zero-shuffle predicate chain as psiDrift (NaN and -inf land in bin
    * 0, +inf in the last bin). */
  private def binOf(v: Column, edges: Seq[Double]): Column =
    edges.map(b => when(v > b, 1).otherwise(0)).reduce(_ + _)

  /** Shared windowed bin counts — the ONLY aggregation. Streaming callers
    * watermark `tsCol` first so window state closes; the append-mode
    * output is (window, __bin, __n) rows of CLOSED windows. */
  def windowedBinCounts(events: DataFrame, tsCol: String, valueCol: String,
                        ref: DriftReference, windowLen: String): DataFrame =
    events.filter(col(valueCol).isNotNull)
      .withColumn("__bin", binOf(col(valueCol).cast("double"), ref.edges))
      .groupBy(window(col(tsCol), windowLen), col("__bin"))
      .agg(count(lit(1)).as("__n"))

  /** Per-window scoring over closed (window, __bin, __n) rows: PSI with
    * the eps floor (psiDrift's formula, reference proportions as plan
    * literals), binned two-sample KS (sup over bin boundaries of the
    * |reference CDF − window CDF| gap — exact at the edges, no unbinned
    * sort needed in a stream), and the standard PSI verdict bands
    * (< warn stable, < action warning, else action). Pure column algebra
    * — runs identically on a batch frame and inside foreachBatch. */
  def scoreBinned(binned: DataFrame, ref: DriftReference, eps: Double = 1e-6,
                  warn: Double = 0.1, action: Double = 0.25): DataFrame = {
    require(eps > 0 && warn > 0 && action > warn,
      s"need 0 < eps, 0 < warn < action: ($eps, $warn, $action)")
    val agged = binned.groupBy(col("window"))
      .agg(sum(col("__n")).as("n"),
        map_from_entries(collect_list(struct(col("__bin"), col("__n")))).as("__m"))
    val t = col("n").cast("double")
    def qRaw(b: Column): Column =
      coalesce(element_at(col("__m"), b), lit(0L)).cast("double") / t
    scoreFolded(agged, ref, eps, warn, action, qRaw)
  }

  /** The shared psi/ks/loc bin folds over any per-window frame exposing
    * `window` + `n` and a per-bin proportion accessor — ONE definition so
    * the map-keyed ([[scoreBinned]]) and vector ([[scoreVector]]) forms
    * can never drift apart bit-wise. */
  private def scoreFolded(agged: DataFrame, ref: DriftReference, eps: Double,
                          warn: Double, action: Double,
                          qRaw: Column => Column): DataFrame = {
    val bins = ref.bins
    val propsLit = array(ref.props.map(lit): _*)
    val psi = aggregate(sequence(lit(0), lit(bins - 1)), lit(0.0),
      (acc, b) => {
        val p = greatest(element_at(propsLit, b + 1), lit(eps))
        val q = greatest(qRaw(b), lit(eps))
        acc + (p - q) * log(p / q)
      })
    val ks = aggregate(sequence(lit(0), lit(bins - 1)),
      struct(lit(0.0).as("cp"), lit(0.0).as("cq"), lit(0.0).as("sup")),
      (st, b) => {
        val cp = st.getField("cp") + element_at(propsLit, b + 1)
        val cq = st.getField("cq") + qRaw(b)
        struct(cp.as("cp"), cq.as("cq"),
          greatest(st.getField("sup"), abs(cp - cq)).as("sup"))
      },
      st => st.getField("sup"))
    // location-shift signal for the CUSUM stage: mean bin index of the
    // window minus the reference's mean bin index (Σ b·p_b, a driver
    // constant) — in "bins" units, positive when mass moved up. Folded in
    // the same fixed bin order as psi/ks so every engine replays it.
    val muRef = (0 until bins).map(b => b * ref.props(b)).sum
    val loc = aggregate(sequence(lit(0), lit(bins - 1)), lit(0.0),
      (acc, b) => acc + b.cast("double") * qRaw(b)) - lit(muRef)
    agged.select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("n"),
        psi.as("psi"), ks.as("ks_binned"), loc.as("loc_shift"))
      .withColumn("verdict",
        when(col("psi") >= action, "action")
          .when(col("psi") >= warn, "warning").otherwise("stable"))
  }

  /** ONE-aggregation per-window bin-count VECTOR: per-bin conditional
    * sums inside the windowed aggregation itself, so no second streaming
    * aggregation is needed and the scoring becomes a STATELESS projection
    * ([[scoreVector]]) — which is what lets a downstream stateful
    * operator (the durable CUSUM) legally chain in append mode. Same
    * counts as [[windowedBinCounts]], different shape: one row per
    * window, `__bins[b]` = count in bin b (bins that the (window, bin)
    * form omits appear as 0 — scoreBinned coalesces the same way). */
  def windowedBinVector(events: DataFrame, tsCol: String, valueCol: String,
                        ref: DriftReference, windowLen: String): DataFrame =
    events.filter(col(valueCol).isNotNull)
      .withColumn("__bin", binOf(col(valueCol).cast("double"), ref.edges))
      .groupBy(window(col(tsCol), windowLen))
      .agg(count(lit(1)).as("n"),
        array((0 until ref.bins).map(b =>
          sum(when(col("__bin") === b, 1L).otherwise(0L))): _*).as("__bins"))

  /** Stateless scoring over [[windowedBinVector]] rows — the same
    * [[scoreFolded]] expressions with the array accessor, so
    * scoreVector(windowedBinVector(df)) ≡ scoreBinned(windowedBinCounts
    * (df)) bit-wise (parity-tested). */
  def scoreVector(binned: DataFrame, ref: DriftReference, eps: Double = 1e-6,
                  warn: Double = 0.1, action: Double = 0.25): DataFrame = {
    require(eps > 0 && warn > 0 && action > warn,
      s"need 0 < eps, 0 < warn < action: ($eps, $warn, $action)")
    val t = col("n").cast("double")
    def qRaw(b: Column): Column = element_at(col("__bins"), b + 1).cast("double") / t
    scoreFolded(binned, ref, eps, warn, action, qRaw)
  }

  /** CUSUM over the WINDOW SEQUENCE (VERDICT r12 #5) — the cross-window
    * stage PSI/KS don't have: a small persistent location shift that never
    * trips a single window's PSI accumulates here. The cusumHourly
    * prefix-form rewrite on `loc_shift`: with e±_w = d_w ∓/± `slack`,
    * S⁺ = P⁺ − min(0, runmin P⁺) and S⁻ = max(0, runmax P⁻) − P⁻ —
    * running-frame sums, no per-row recursion. `cusum_alarm` fires when
    * either side exceeds `threshold` (in bins·windows units).
    *
    * The window is ordered over WINDOWS — calendar-bounded (time range /
    * window length), never corpus-bounded; the literal partition key keeps
    * the single-partition plan warning-free (the zipf discipline). Windows
    * with zero valid rows produce no row and contribute no term. */
  def cusumBinnedScores(scored: DataFrame, slack: Double = 0.0,
                        threshold: Double = 1.0): DataFrame = {
    require(slack >= 0, s"slack must be >= 0: $slack")
    require(threshold > 0, s"threshold must be > 0: $threshold")
    val w = Window.partitionBy(lit(0)).orderBy("window_start")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("__pu", sum(col("loc_shift") - lit(slack)).over(w))
      .withColumn("__pd", sum(col("loc_shift") + lit(slack)).over(w))
      .withColumn("cusum_up", col("__pu") - least(lit(0.0), min(col("__pu")).over(w)))
      .withColumn("cusum_dn", greatest(lit(0.0), max(col("__pd")).over(w)) - col("__pd"))
      .withColumn("cusum_alarm",
        greatest(col("cusum_up"), col("cusum_dn")) > threshold)
      .drop("__pu", "__pd")
  }

  /** Driver-side CUSUM tracker for the STREAMING gate: windows close in
    * event-time order across micro-batches, so the recurrence carries as
    * O(1) driver state (two prefix sums + their running extrema) — the
    * same sequential adds the batch window-frame sums perform, so stream
    * and batch agree to the last bit (parity-tested). */
  final class CusumTracker(slack: Double, threshold: Double) {
    require(slack >= 0 && threshold > 0,
      s"need slack >= 0 and threshold > 0: ($slack, $threshold)")
    private var pu = 0.0; private var pd = 0.0
    private var minPu = 0.0; private var maxPd = 0.0
    /** Advance by one window's loc_shift; returns (cusum_up, cusum_dn, alarm). */
    def step(d: Double): (Double, Double, Boolean) = synchronized {
      pu += d - slack; pd += d + slack
      minPu = math.min(minPu, pu); maxPd = math.max(maxPd, pd)
      val up = pu - minPu; val dn = maxPd - pd
      (up, dn, math.max(up, dn) > threshold)
    }
  }

  /** Batch shape (the oracled one): windows scored over a static frame. */
  def windowedDrift(events: DataFrame, tsCol: String, valueCol: String,
                    ref: DriftReference, windowLen: String, eps: Double = 1e-6,
                    warn: Double = 0.1, action: Double = 0.25): DataFrame =
    scoreBinned(windowedBinCounts(events, tsCol, valueCol, ref, windowLen),
      ref, eps, warn, action)

  /** Streaming gate: watermarked windowed bin counts; each micro-batch of
    * CLOSED windows is scored with [[scoreBinned]], the cross-window CUSUM
    * is advanced through a [[CusumTracker]] (closed windows arrive in
    * event-time order — the watermark is monotone — so the O(1) driver
    * state replays [[cusumBinnedScores]] exactly), and the result is
    * handed to `onBatch` (alert sink, metrics table append, ...). The
    * per-micro-batch collect is CLOSED WINDOWS only — calendar-bounded
    * rows of O(bins) aggregates, never event-scale.
    *
    * Failure semantics (r13 ADVICE): foreachBatch is at-least-once, so a
    * retried/replayed micro-batch is detected by its batchId and SKIPPED
    * entirely — double-stepping the CUSUM prefix sums would diverge from
    * the batch [[cusumBinnedScores]] parity (the replayed windows' scores
    * were already delivered once).
    *
    * DEMO/TEST ONLY: the tracker here is DRIVER state and dies with the
    * query — a restart from checkpoint silently resets the CUSUM.
    * Production (and the CLI `stream drift` verb) uses
    * [[durableDriftMonitor]], which holds the same four prefix/extremum
    * numbers in the checkpointed state store and resumes exactly. */
  def startDriftMonitor(events: DataFrame, tsCol: String, valueCol: String,
                        ref: DriftReference, windowLen: String,
                        watermark: String, eps: Double = 1e-6,
                        warn: Double = 0.1, action: Double = 0.25,
                        slack: Double = 0.0, cusumThreshold: Double = 1.0)
                       (onBatch: DataFrame => Unit): StreamingQuery = {
    val tracker = new CusumTracker(slack, cusumThreshold)
    val lastApplied = new java.util.concurrent.atomic.AtomicLong(Long.MinValue)
    windowedBinCounts(events.withWatermark(tsCol, watermark), tsCol, valueCol,
        ref, windowLen)
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        if (batchId > lastApplied.get) {
          lastApplied.set(batchId)
          val spark = b.sparkSession
          val scored = scoreBinned(b, ref, eps, warn, action)
          val rows = scored.orderBy("window_start").collect()
          val li = scored.schema.fieldIndex("loc_shift")
          val out = rows.map { r =>
            val (up, dn, alarm) = tracker.step(r.getDouble(li))
            org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(up, dn, alarm))
          }
          val schema = org.apache.spark.sql.types.StructType(scored.schema.fields ++ Seq(
            org.apache.spark.sql.types.StructField("cusum_up", org.apache.spark.sql.types.DoubleType),
            org.apache.spark.sql.types.StructField("cusum_dn", org.apache.spark.sql.types.DoubleType),
            org.apache.spark.sql.types.StructField("cusum_alarm", org.apache.spark.sql.types.BooleanType)))
          onBatch(spark.createDataFrame(
            spark.sparkContext.parallelize(out.toSeq, 1), schema))
        }
      }
      .start()
  }

  /** A scored closed window (the [[scoreVector]] row shape, typed). */
  final case class ScoredWindow(window_start: java.sql.Timestamp,
                                window_end: java.sql.Timestamp, n: Long,
                                psi: Double, ks_binned: Double,
                                loc_shift: Double, verdict: String)

  /** [[ScoredWindow]] + the CUSUM columns [[cusumBinnedScores]] appends. */
  final case class DriftCusumRow(window_start: java.sql.Timestamp,
                                 window_end: java.sql.Timestamp, n: Long,
                                 psi: Double, ks_binned: Double,
                                 loc_shift: Double, verdict: String,
                                 cusum_up: Double, cusum_dn: Double,
                                 cusum_alarm: Boolean)

  /** The four CUSUM recurrence numbers (two prefix sums + their running
    * extrema) — the whole cross-window state, checkpointed. */
  final case class CusumState(pu: Double, pd: Double, minPu: Double,
                              maxPd: Double)

  /** Checkpointed CUSUM over scored closed windows: the
    * [[CusumTracker]] recurrence as a single-key `transformWithState`
    * processor. Windows CLOSE in event-time order across micro-batches
    * (monotone watermark), but several may close in ONE batch in
    * arbitrary row order — sorted by window_start before stepping, the
    * same order the batch window frame sums in, with the same float
    * associativity (pu + (d − slack)), so stream ≡ batch to the last
    * bit. State commits atomically with the batch offsets: replays
    * re-step from the pre-batch state (no batchId dedup needed) and a
    * restart CONTINUES the recurrence. */
  final class CusumProcessor(slack: Double, threshold: Double)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Int, ScoredWindow, DriftCusumRow] {
    import org.apache.spark.sql.streaming.ValueState
    @transient private var st: ValueState[CusumState] = _
    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[CusumState]("cusum",
        org.apache.spark.sql.Encoders.product[CusumState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Int, rows: Iterator[ScoredWindow],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[DriftCusumRow] = {
      var s = Option(st.get()).getOrElse(CusumState(0.0, 0.0, 0.0, 0.0))
      val out = rows.toArray.sortBy(_.window_start.getTime).map { r =>
        val pu = s.pu + (r.loc_shift - slack)
        val pd = s.pd + (r.loc_shift + slack)
        s = CusumState(pu, pd, math.min(s.minPu, pu), math.max(s.maxPd, pd))
        val up = pu - s.minPu; val dn = s.maxPd - pd
        DriftCusumRow(r.window_start, r.window_end, r.n, r.psi, r.ks_binned,
          r.loc_shift, r.verdict, up, dn, math.max(up, dn) > threshold)
      }
      st.update(s)
      out.iterator
    }
  }

  /** RESTART-DURABLE drift gate (VERDICT r14 #2): the same windowed
    * PSI/KS/loc scoring as [[startDriftMonitor]], but expressed as ONE
    * windowed aggregation ([[windowedBinVector]]) + stateless scoring
    * ([[scoreVector]]) + a checkpointed CUSUM (`transformWithState`), so
    * the whole pipeline — window state AND the cross-window recurrence —
    * survives kill-and-restart from the checkpoint (parity-tested
    * against batch [[cusumBinnedScores]] ACROSS a restart). Emits one
    * append-mode row per closed window; attach
    * `.writeStream.option("checkpointLocation", ...)`. Requires the
    * RocksDB state store (the production backend). */
  def durableDriftMonitor(events: DataFrame, tsCol: String, valueCol: String,
                          ref: DriftReference, windowLen: String,
                          watermark: String, eps: Double = 1e-6,
                          warn: Double = 0.1, action: Double = 0.25,
                          slack: Double = 0.0, cusumThreshold: Double = 1.0)
      : org.apache.spark.sql.Dataset[DriftCusumRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    scoreVector(windowedBinVector(events.withWatermark(tsCol, watermark),
        tsCol, valueCol, ref, windowLen), ref, eps, warn, action)
      .as[ScoredWindow]
      .groupByKey(_ => 0)
      .transformWithState(new CusumProcessor(slack, cusumThreshold),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
  }
}
