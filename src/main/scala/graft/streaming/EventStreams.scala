package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is batch-only (SURVEY.md §1.1); streaming is part of the
  * driver-mandated Spark-first extension surface. The SAME transforms run
  * in batch (tested against the DuckDB oracle) and on a `readStream` source
  * — one definition, two execution modes, which is the point of Structured
  * Streaming.
  */
object EventStreams {

  /** Tumbling-window aggregation per event type. In streaming mode callers
    * add `.withWatermark("ts", "...")` upstream; the aggregation itself is
    * identical. */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming variant with watermarking (late data bounded). */
  def tumblingCountsStream(events: DataFrame, windowLen: String = "1 hour",
                           watermark: String = "2 hours"): DataFrame =
    tumblingCounts(events.withWatermark("ts", watermark), windowLen)

  /** Windowed trending-term counts over a text stream: explode words,
    * count per (event-time window, word). Batch and stream share the
    * aggregation (stream callers get the watermark, so window state closes
    * and memory stays bounded); ranking/top-k belongs DOWNSTREAM of the
    * emitted windows — a second aggregation over a streaming aggregate is
    * not expressible in append mode, and the closed windows are tiny. */
  def trendingTerms(df: DataFrame, textCol: String, tsCol: String,
                    windowLen: String = "1 hour",
                    watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(df)(w => df.withWatermark(tsCol, w))
    src.select(window(col(tsCol), windowLen).as("w"),
        explode(filter(split(lower(trim(col(textCol))), "\\s+"),
          w => length(w) > 0)).as("word"))
      .groupBy(col("w.start").as("window_start"), col("word"))
      .agg(count(lit(1)).as("n"))
  }

  /** Streaming exact dedup: drop re-deliveries of the same key within the
    * watermark horizon — the ingestion-side half of the dedup pipeline
    * (the batch side dedups the corpus; this keeps an at-least-once event
    * source from inflating it). `dropDuplicates` on (key, event-time)
    * bounds its state table by the watermark, which is what makes it safe
    * at an unbounded 100 TB stream — an unwatermarked dropDuplicates
    * accumulates state forever. Works identically in batch mode (where it
    * is a plain distinct-by-key). */
  def dedupStream(events: DataFrame, keyCols: Seq[String] = Seq("event_id"),
                  watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicates(keyCols :+ "ts")

  /** Sessionization via the BUILT-IN `session_window` aggregation — the
    * "compose existing ops" preference when only aggregates per session are
    * needed (count/sum/min/max): Catalyst owns merging, watermarking, and
    * state. The custom-state variants below exist for semantics
    * session_window cannot express (emit-on-close rows, per-session custom
    * logic). Works identically in batch and streaming. */
  def sessionizeNative(events: DataFrame, gapSeconds: Long = 1800): DataFrame =
    events.groupBy(col("user_id"), session_window(col("ts"), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        col("n_events"), col("total_value"))

  /** Stream-stream interval join: each `points` row pairs with the
    * `intervals` rows of the same `keys` whose `[intervalTs, intervalTs +
    * lag]` window contains `pointTs` — the streaming twin of
    * `pipeline.Joins.rangeJoin` (clicks↔purchase-windows, events↔feature
    * windows). Both sides carry watermarks and the join condition bounds
    * event time on BOTH streams, so Spark can expire join state — the
    * requirement for an unbounded stream-stream join (an unbounded-state
    * join is rejected by the engine in append mode). Works identically in
    * batch mode. Output = points.* ++ intervals.* minus the right-side
    * keys; the two time columns must be named differently. */
  def intervalJoinStream(points: DataFrame, intervals: DataFrame,
                         keys: Seq[String], pointTs: String, intervalTs: String,
                         lag: String = "1 hour",
                         watermark: String = "2 hours"): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(pointTs != intervalTs,
      "point and interval time columns must have distinct names")
    val l = points.withWatermark(pointTs, watermark).alias("l")
    val r = intervals.withWatermark(intervalTs, watermark).alias("r")
    val cond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _) &&
      col(s"l.$pointTs") >= col(s"r.$intervalTs") &&
      col(s"l.$pointTs") <= col(s"r.$intervalTs") + expr(s"INTERVAL $lag")
    keys.foldLeft(l.join(r, cond, "inner"))((df, k) => df.drop(col(s"r.$k")))
  }

  /** Hourly resample with gap-fill: a complete per-key hour spine (no
    * missing hours) carrying observed counts (0 in gaps) and a
    * forward-filled mean value (the last observed hour's mean, the
    * time-series "ffill" primitive for downstream feature windows).
    *
    * Scale shape: the spine is `sequence(min_hour, max_hour)` exploded from
    * ONE broadcast aggregate row cross-joined with the distinct keys —
    * O(hours × keys) rows regardless of event volume; the only row-scale
    * shuffle is the hourly aggregation. The forward-fill window partitions
    * by key, so fill parallelism = key cardinality (hours per key stay
    * within one task — bounded by calendar length, not data size). */
  def resampleHourly(events: DataFrame, keyCol: String = "event_type",
                     tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val hour = date_trunc("hour", col(tsCol))
    val hourly = events.groupBy(col(keyCol), hour.as("hour"))
      .agg(count(lit(1)).as("__n"), avg(col(valueCol)).as("__av"))
    val bounds = events.agg(min(hour).as("__mn"), max(hour).as("__mx"))
    val spine = events.select(col(keyCol)).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(keyCol),
        explode(sequence(col("__mn"), col("__mx"), expr("INTERVAL 1 HOUR"))).as("hour"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq(keyCol, "hour"), "left")
      .select(col(keyCol), col("hour"),
        coalesce(col("__n"), lit(0L)).as("n"),
        last(col("__av"), ignoreNulls = true).over(w).as("ffill_avg"))
  }

  /** Per-key moments of the hourly count distribution (mean_n, sd_n) — the
    * reference table the anomaly monitors score against. Two shuffles, the
    * second over O(hours × keys) rows. */
  def hourlyMoments(events: DataFrame, keyCol: String = "event_type",
                    tsCol: String = "ts"): DataFrame =
    events
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col(keyCol))
      .agg(avg(col("n")).as("mean_n"), stddev_samp(col("n")).as("sd_n"))

  private def flagAnomalies(hourly: DataFrame, moments: DataFrame,
                            keyCol: String, zThreshold: Double): DataFrame =
    hourly.join(broadcast(moments), Seq(keyCol))
      .withColumn("z", (col("n") - col("mean_n")) / col("sd_n"))
      .filter(col("sd_n") > 0 && abs(col("z")) > zThreshold)
      .select(col(keyCol), col("hour"), col("n"), col("z"))

  /** DAU / WAU / MAU — per calendar day, the distinct users active that
    * day, in the trailing 7 days, and in the trailing 30 days. The
    * standard engagement rollup, shaped for scale: events first collapse
    * to the DISTINCT (day, user) table (one row-scale shuffle, map-side
    * combined), then each user-day EXPLODES into the ≤30 future days it
    * contributes to — bounded replication of the already-tiny distinct
    * table (the interval-join discipline), never a sliding self-join —
    * and one distinct-aggregation per target day finishes it. Days with
    * no activity are absent (the grid semi-join drops synthetic trailing
    * days). Returns (day, dau, wau, mau). */
  def activeUsers(events: DataFrame, tsCol: String = "ts",
                  userCol: String = "user_id"): DataFrame = {
    val ud = events
      .filter(col(tsCol).isNotNull && col(userCol).isNotNull)
      .select(to_date(date_trunc("day", col(tsCol))).as("day"),
        col(userCol).as("__u"))
      .distinct()
      .localCheckpoint() // reused by the grid + three sweep passes
    val grid = ud.select(col("day")).distinct()
    // SWEEP-LINE, not window explosion: a user counts toward the w-day
    // window of day t iff t falls inside one of the user's merged
    // [activeDay, activeDay + w] coverage segments (gaps-and-islands over
    // the user's sorted active days), so each segment contributes a +1
    // delta at its start and a -1 past its end, and the per-day count is
    // the running delta sum. Row-scale work stays O(distinct user-days):
    // one user-partitioned window pass + a map-side-combined delta
    // aggregation per window size — a 30x per-user-day explode (the naive
    // shape) measured x6 per decade at sf10; this is the same cost as the
    // distinct itself. The final cumulative runs on DAY-scale metadata
    // (calendar-bounded at any corpus size).
    val wSpec = Window.partitionBy("__u").orderBy("day")
    val withPrev = ud.withColumn("__prev", lag(col("day"), 1).over(wSpec))
    def coverage(w: Int, name: String): DataFrame = {
      val isStart = col("__prev").isNull ||
        datediff(col("day"), col("__prev")) > w
      val segs = withPrev
        .withColumn("__seg", sum(when(isStart, 1).otherwise(0)).over(wSpec))
        .groupBy(col("__u"), col("__seg"))
        .agg(min(col("day")).as("__s"), date_add(max(col("day")), w + 1).as("__e1"))
      val deltas = segs.select(explode(array(
          struct(col("__s").as("d"), lit(1L).as("v")),
          struct(col("__e1").as("d"), lit(-1L).as("v")))).as("x"))
        .groupBy(col("x.d").as("d")).agg(sum(col("x.v")).as("__delta"))
      // day-scale: per emitted day, the sum of deltas at or before it
      grid.join(deltas, deltas("d") <= grid("day"))
        .groupBy("day").agg(sum(col("__delta")).as(name))
    }
    grid
      .join(coverage(0, "dau"), Seq("day"))
      .join(coverage(6, "wau"), Seq("day"))
      .join(coverage(29, "mau"), Seq("day"))
  }

  /** CUSUM change-point detection over hourly event volumes — the
    * sequential-shift companion to [[hourlyAnomaly]]'s pointwise z-test
    * (a slow 10% drift never crosses a z threshold; its cumulative sum
    * does). Per key, the one-sided CUSUM against the series' own mean:
    * S_t = max(0, S_{t-1} + (x_t − μ − slack)), alarm when S_t >
    * threshold.
    *
    * EXACT-int64 discipline (the KS/Mann-Whitney family): the recurrence
    * is rewritten through its prefix form S_t = P_t − min(0, min_{j≤t}
    * P_j) with P scaled by n_hours — e_t = n·x_t − Σx − n·slack is exact
    * int64, so the running sum, running min, sup, and every alarm
    * comparison (against n·threshold) are integer-exact and
    * partitioning/engine-invariant; only the reported max_cusum divides
    * back once. `slack` and `threshold` are in COUNTS (derive from a
    * reference sd upstream if desired — keeping them integral is what
    * keeps the whole statistic exact). Windows are per-key sequences of
    * O(#hours) aggregates; nothing row-scale past the first groupBy.
    * Returns (key, n_hours, total, max_cusum, n_alarms,
    * first_alarm_hour — null when no alarm). */
  def cusumHourly(events: DataFrame, keyCol: String = "event_type",
                  tsCol: String = "ts", slack: Long = 0L,
                  threshold: Long = 10L): DataFrame = {
    require(slack >= 0, s"slack must be >= 0: $slack")
    require(threshold > 0, s"threshold must be > 0: $threshold")
    val hourly = events
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy(col(keyCol))
      .agg(sum(col("n")).as("__sx"), count(lit(1)).as("__nh"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = col("__nh") * col("n") - col("__sx") - col("__nh") * lit(slack)
    val withS = hourly.join(broadcast(stats), Seq(keyCol))
      .withColumn("__p", sum(e).over(w))
      .withColumn("__s", col("__p") - least(lit(0L), min(col("__p")).over(w)))
      .withColumn("__alarm", col("__s") > col("__nh") * lit(threshold))
    withS.groupBy(col(keyCol))
      .agg(max(col("__nh")).as("n_hours"), max(col("__sx")).as("total"),
        (max(col("__s")).cast("double") / max(col("__nh"))).as("max_cusum"),
        count(when(col("__alarm"), 1)).as("n_alarms"),
        min(when(col("__alarm"), col("hour"))).as("first_alarm_hour"))
  }

  /** Hourly volume anomalies: hours whose event count deviates more than
    * `zThreshold` sample standard deviations from that key's own mean hourly
    * count; the tiny per-key moments broadcast back onto the hourly frame.
    * Self-referential batch form — [[hourlyAnomalyStream]] is the live
    * monitor scoring against a static reference. */
  def hourlyAnomaly(events: DataFrame, keyCol: String = "event_type",
                    tsCol: String = "ts", zThreshold: Double = 2.0): DataFrame = {
    val hourly = events
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n"))
    flagAnomalies(hourly, hourlyMoments(events, keyCol, tsCol), keyCol, zThreshold)
  }

  /** Streaming twin: the hourly aggregate runs on the watermarked stream
    * (state bounded, windows close as the watermark passes) and each closed
    * hour is scored against a STATIC `moments` reference
    * ([[hourlyMoments]] over history, refreshed out-of-band) — a streaming
    * aggregate cannot be re-aggregated for its own moments in append mode,
    * and a monitor should score against yesterday's normal anyway. The
    * stream-static join broadcasts: moments is O(#keys). */
  def hourlyAnomalyStream(events: DataFrame, moments: DataFrame,
                          keyCol: String = "event_type", tsCol: String = "ts",
                          zThreshold: Double = 2.0,
                          watermark: String = "2 hours"): DataFrame = {
    val hourly = events.withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), window(col(tsCol), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol), col("window.start").as("hour"), col("n"))
    flagAnomalies(hourly, moments, keyCol, zThreshold)
  }

  /** SCD-type-2 history: collapse an event stream into per-key state
    * validity intervals [valid_from, valid_to) — consecutive repeats of
    * the same state merge, the open current state carries a null valid_to.
    * Two windows, both partitioned by key (parallelism = key cardinality;
    * per-key history is calendar-bounded, never corpus-bounded).
    * `tieCol` breaks equal-timestamp ties deterministically. */
  def scd2History(events: DataFrame, keyCol: String = "user_id",
                  tsCol: String = "ts", stateCol: String = "event_type",
                  tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__t"), col(tieCol))
    val changes = events
      .select(col(keyCol), col(tieCol), unix_micros(col(tsCol)).as("__t"),
        col(stateCol))
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(stateCol))
    changes
      .withColumn("valid_to", lead(col("__t"), 1).over(w))
      .select(col(keyCol), col(stateCol), col("__t").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }

  final case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  /** Per-user lifetime counters on the NEW arbitrary-state API
    * (`transformWithState`, Spark 4): typed `ValueState` with an optional
    * TTL so abandoned users age out of the store instead of accumulating
    * forever — the unbounded-key-space hygiene `flatMapGroupsWithState`
    * lacks. Each micro-batch emits the updated lifetime totals for the
    * users it touched (Update mode). Requires the RocksDB state store —
    * which is the production backend anyway. */
  class RunningTotalsProcessor(ttl: Option[java.time.Duration] = None)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Double), UserTotals] {
    import org.apache.spark.sql.streaming.{TTLConfig, ValueState}
    @transient private var totals: ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      val cfg = ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
      totals = getHandle.getValueState[(Long, Double)]("totals",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaDouble), cfg)
    }
    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTotals] = {
      var (n, v) = Option(totals.get()).getOrElse((0L, 0.0))
      rows.foreach { r => n += 1; v += r._2 }
      totals.update((n, v))
      Iterator.single(UserTotals(key, n, v))
    }
  }

  /** Lifetime (n_events, total_value) per user over an event stream via
    * [[RunningTotalsProcessor]]. Update-mode output: one refreshed row per
    * touched user per micro-batch. */
  def runningTotalsStream(spark: SparkSession, events: DataFrame,
                          ttl: Option[java.time.Duration] = None)
      : org.apache.spark.sql.Dataset[UserTotals] = {
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor(ttl),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  final case class SessionState(start: Long, last: Long, n: Long, value: Double)
  final case class Session(user_id: Long, session_start: Long, session_end: Long,
                           n_events: Long, total_value: Double)

  /** Gap-based sessionization with custom state — BATCH semantics: the
    * input is complete, so the trailing open session per user is emitted
    * too. (Streaming mode must NOT use this shape: re-emitting the open
    * session every micro-batch duplicates sessions — use
    * [[sessionizeStream]], which holds the open session in state and emits
    * it only on gap timeout.) This is the canonical custom-state pattern
    * the driver mandate names (flatMapGroupsWithState). */
  def sessionize(spark: SparkSession, events: DataFrame,
                 gapSeconds: Long = 1800): org.apache.spark.sql.Dataset[Session] = {
    import spark.implicits._
    val typed = events.select(
      col("user_id").cast("long"),
      unix_timestamp(col("ts")).cast("long").as("epoch"),
      col("value").cast("double"))
      .as[(Long, Long, Double)]

    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[SessionState]) =>
          // Sort within group: batch mode delivers unordered rows; bounded
          // per-user volume (sessions are per-entity, not global).
          val sorted = rows.toSeq.sortBy(_._2)
          val out = scala.collection.mutable.ArrayBuffer[Session]()
          var st = state.getOption.orNull
          sorted.foreach { case (_, t, v) =>
            if (st == null) st = SessionState(t, t, 0, 0.0)
            else if (t - st.last > gapSeconds) {
              out += Session(user, st.start, st.last, st.n, st.value)
              st = SessionState(t, t, 0, 0.0)
            }
            st = st.copy(last = t, n = st.n + 1, value = st.value + v)
          }
          if (st != null) out += Session(user, st.start, st.last, st.n, st.value)
          state.update(if (st == null) SessionState(0, 0, 0, 0) else st)
          out.iterator
      }
  }

  /** Streaming sessionization: closed sessions are emitted as gaps are
    * observed within the data; the open session is held in state with an
    * EVENT-TIME timeout at `last + gapSeconds` and emitted (state removed)
    * once the watermark passes it — no duplicate emissions, bounded state,
    * and fully deterministic/testable (closure is driven by data time via
    * the watermark, not by wall clock). `watermarkDelay` bounds late data
    * exactly as in the tumbling aggregation. */
  def sessionizeStream(spark: SparkSession, events: DataFrame,
                       gapSeconds: Long = 1800,
                       watermarkDelay: String = "0 seconds"): org.apache.spark.sql.Dataset[Session] = {
    import spark.implicits._
    val typed = events
      .withWatermark("ts", watermarkDelay)
      .select(
        col("user_id").cast("long"),
        unix_timestamp(col("ts")).cast("long").as("epoch"),
        col("value").cast("double"),
        col("ts")) // watermark column must survive the projection
      .as[(Long, Long, Double, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(Session(user, st.start, st.last, st.n, st.value))
          } else {
            val sorted = rows.toSeq.sortBy(_._2)
            val out = scala.collection.mutable.ArrayBuffer[Session]()
            var st = state.getOption.orNull
            sorted.foreach { case (_, t, v, _) =>
              if (st == null) st = SessionState(t, t, 0, 0.0)
              else if (t - st.last > gapSeconds) {
                out += Session(user, st.start, st.last, st.n, st.value)
                st = SessionState(t, t, 0, 0.0)
              }
              st = st.copy(last = t, n = st.n + 1, value = st.value + v)
            }
            if (st != null) {
              state.update(st) // open session stays in state, not emitted
              state.setTimeoutTimestamp((st.last + gapSeconds) * 1000)
            }
            out.iterator
          }
      }
  }

  final case class GramFlag(wstart: java.sql.Timestamp, novel: Long)

  /** STREAMING novelty monitor — the live form of
    * [[graft.pipeline.Text.noveltyDaily]]'s crawl-health signal: per
    * event-time window, how many of the window's distinct word n-grams
    * were never seen in ANY earlier window. A crawl whose per-window
    * novelty decays to ~0 is re-fetching what it already has, visible
    * while the crawl runs instead of at the next batch report.
    *
    * Shape: grams are 8-byte fingerprints (the house dedup contract) from
    * a codegen'd projection; per-gram state is O(1) — (seenEver,
    * lastWindowStart) — keyed by the fingerprint, so the state store is
    * bounded by the corpus's DISTINCT gram vocabulary (the same bound the
    * batch operator's shuffle carries), NOT by stream length; the
    * per-window rollup is a plain windowed aggregation over the flagged
    * first-in-window rows.
    *
    * Ordering contract (documented, parity-tested): windows must arrive
    * NON-DECREASING per gram — the chronological-ingestion shape of a
    * crawl log. Within a micro-batch rows are sorted by window, so any
    * intra-batch disorder is absorbed; a window OLDER than a gram's last
    * emitted window (cross-batch disorder) is dropped for that gram, the
    * same rows a watermark would have excluded. Under that contract the
    * final per-window table equals the batch replay exactly
    * (MemoryStream≡noveltyDaily parity-tested).
    *
    * Returns the per-window aggregate (wstart, n_grams, n_novel, novelty);
    * run with Complete/Update output (the rollup re-aggregates as windows
    * fill). */
  def noveltyStream(spark: SparkSession, docs: DataFrame, textCol: String,
                    tsCol: String, windowLen: String = "1 day",
                    n: Int = 3): DataFrame = {
    import spark.implicits._
    val fname = s"ngram_window_hashes_$n"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fname, exprs => graft.functions.NgramWindowHashes(exprs.head, n), "scala_udf")
    val grams = docs
      .select(window(col(tsCol), windowLen).getField("start").as("wstart"),
        explode(coalesce(array_distinct(call_function(fname,
          filter(split(lower(trim(col(textCol))), "\\s+"),
            w => length(w) > 0))), array().cast("array<long>"))).as("gh"))
      .as[(java.sql.Timestamp, Long)]
    val flagged = grams.groupByKey(_._2)
      .flatMapGroupsWithState[(Boolean, Long), GramFlag](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[(Boolean, Long)]) =>
          var (seen, lastW) = state.getOption.getOrElse((false, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer[GramFlag]()
          rows.toSeq.map(_._1).sortBy(_.getTime).foreach { w =>
            if (w.getTime > lastW) {
              out += GramFlag(w, if (!seen) 1L else 0L)
              seen = true; lastW = w.getTime
            } // == lastW: duplicate within the window; < lastW: late, dropped
          }
          state.update((seen, lastW))
          out.iterator
      }
    flagged.groupBy(col("wstart"))
      .agg(count(lit(1)).as("n_grams"), sum(col("novel")).as("n_novel"))
      .withColumn("novelty",
        when(col("n_grams") > 0,
          col("n_novel").cast("double") / col("n_grams")).otherwise(0.0))
  }
}
