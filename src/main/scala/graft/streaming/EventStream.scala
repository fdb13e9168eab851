package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming extension (north-star surface, SURVEY.md §1.4): the same
  * transforms run batch (for the DuckDB oracle) and streaming (Structured
  * Streaming with watermarks / stateful sessionization). The reference has
  * no streaming path (SURVEY.md §2.6) — this is beyond-reference surface
  * built on the `events` table shape.
  */
object EventStream {

  /** Tumbling-window counts per event type. Batch and streaming share this
    * plan; the streaming caller adds `withWatermark("ts", …)` upstream. */
  def windowedCounts(df: DataFrame, dur: String = "1 hour"): DataFrame =
    slidingCounts(df, dur, dur)

  /** Sliding-window variant: each event lands in `dur / slide` overlapping
    * windows (`slide == dur` degenerates to tumbling). Same batch/streaming
    * duality; state per open window is bounded by the watermark. */
  def slidingCounts(df: DataFrame, dur: String, slide: String): DataFrame =
    df.groupBy(window(col("ts"), dur, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("v"))

  /** Batch sessionization by inactivity gap: a session starts when the gap
    * from the previous event of the same user exceeds `gapSec`. Pure window
    * functions — the oracle-checkable twin of the stateful streaming
    * version below. */
  def sessionizeBatch(df: DataFrame, gapSec: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // microsecond arithmetic: exact, no sub-second truncation ambiguity
    val newSession = when(
      unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser)) > gapSec * 1000000L ||
        lag(col("ts"), 1).over(byUser).isNull, lit(1)).otherwise(lit(0))
    df.withColumn("new_s", newSession)
      .withColumn("session_idx",
        sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))) / lit(1000000L))
          .cast("long").as("duration_sec"))
  }

  /** Streaming exact dedup: drop re-delivered events by id, with state
    * bounded by the watermark window (the streaming twin of
    * `ext.Dedup.exact` — at-least-once sources at 100 TB/day need the
    * watermark bound or the state grows forever). */
  def dedupStream(df: DataFrame, idCol: String = "event_id",
      watermark: String = "1 hour"): DataFrame =
    df.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Attribution pairs: every `toType` event within `withinSec` seconds
    * AFTER a `fromType` event of the same user (view→buy attribution).
    * Batch form — the oracle-checkable twin of [[attributionStreaming]]. */
  def attribution(df: DataFrame, fromType: String, toType: String,
      withinSec: Long): DataFrame =
    attributionPlan(
      df.filter(col("event_type") === fromType),
      df.filter(col("event_type") === toType), withinSec)

  /** Ordered funnel completion: per user, the EARLIEST chain of `steps`
    * event types in order (t₁ = min ts of step 1; tᵢ = min ts of step i
    * strictly after tᵢ₋₁), kept when the whole chain closes within
    * `withinSec` of t₁. The greedy earliest chain is the standard funnel
    * semantics: if any ordered chain completes, the earliest-per-step one
    * does too (each greedy tᵢ is ≤ any other valid chain's tᵢ, by
    * induction), so greedy completion ⇔ completion.
    *
    * Shape at 100 TB: k−1 per-user min-aggregations, each a
    * USER-CARDINALITY-sized table joined back on `user_id` — partial
    * aggregation collapses each step's events map-side, AQE picks the
    * join strategy as step tables shrink down the funnel (conversion
    * decays, so later steps broadcast). No per-user event sorting, no
    * window over the full stream, no state beyond one timestamp per user
    * per step. Output: (user_id, t1_us … tk_us) in epoch micros. */
  def funnel(df: DataFrame, steps: Seq[String], withinSec: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got $steps")
    val first = df.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("t1_us"))
    val chain = steps.zipWithIndex.tail.foldLeft(first) { case (acc, (step, i)) =>
      df.filter(col("event_type") === step)
        .select(col("user_id"), unix_micros(col("ts")).as("_us"))
        .join(acc, "user_id")
        .filter(col("_us") > col(s"t${i}_us"))
        .groupBy((col("user_id") +: (1 to i).map(j => col(s"t${j}_us"))): _*)
        .agg(min(col("_us")).as(s"t${i + 1}_us"))
    }
    chain.filter(
      col(s"t${steps.size}_us") <= col("t1_us") + lit(withinSec * 1000000L))
  }

  /** Weekly cohort retention: users grouped by the week of their first
    * event (the cohort), counted once per later week they were active in.
    * Weeks are epoch-micros integer weeks (floor(us / 7 days)) — no
    * calendar/timezone arithmetic, identical on any engine.
    *
    * Shape at 100 TB: one per-user min (user-cardinality), one distinct
    * over (user, week) — both collapse map-side — then a user-keyed join
    * and a tiny (cohorts × offsets) count. Output: (cohort_week,
    * week_offset, n_users), offset 0 = the cohort's own week. */
  def cohortRetention(df: DataFrame): DataFrame = {
    val WeekUs = 7L * 86400L * 1000000L
    // integer `div`, not `/` (Divide on longs is double division)
    val weeks = df.select(col("user_id"),
      expr(s"unix_micros(ts) div ${WeekUs}L").as("week"))
    val cohort = weeks.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    weeks.distinct()
      .join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** KAPLAN–MEIER conversion curve (product-limit estimator): time from
    * each user's FIRST event to their FIRST `targetType` event; users
    * who never convert are right-censored at their last observed event —
    * the survival-analysis answer to "how long until users buy" that a
    * naive mean-of-converters biases (it silently drops everyone still
    * running). Per distinct duration (integer seconds): users at risk,
    * conversions `d`, censored `c`, and S(t) = Π_{t_j ≤ t} (1 − d_j/n_j)
    * — the probability a user has NOT converted by t. Deaths and censors
    * sharing a timestamp follow the standard convention (both counted at
    * risk at that time).
    *
    * S(t) evaluates as `exp(Σ ln(1 − d/n))` down the duration-ordered
    * window — zero-conversion rows add ln(1) = 0 — one fixed form both
    * engines replay; rounded at 6 dp (libm ulp). A row where every
    * remaining user converts (d = n_risk, necessarily the last row) is
    * pinned to survival 0 EXPLICITLY: its factor is ln(0), which DuckDB
    * faults on and Spark nulls, so neither engine may evaluate it.
    *
    * Shape at 100 TB: ONE groupBy(user) pass over the events; the curve
    * table is distinct-duration-sized and carries the windows. */
  def kaplanMeier(df: DataFrame, targetType: String): DataFrame = {
    val perUser = df.groupBy(col("user_id")).agg(
      min(unix_micros(col("ts"))).as("t0"),
      max(unix_micros(col("ts"))).as("tmax"),
      min(when(col("event_type") === targetType,
        unix_micros(col("ts")))).as("tev"))
    val durs = perUser.select(
      expr("(coalesce(tev, tmax) - t0) div 1000000").as("dur"),
      col("tev").isNotNull.cast("int").as("ev"))
    val byDur = durs.groupBy(col("dur")).agg(
      sum(col("ev")).cast("long").as("d"),
      (count(lit(1)) - sum(col("ev"))).cast("long").as("c"))
    val w = Window.orderBy(col("dur").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = sum(col("d") + col("c")).over(Window.partitionBy())
    byDur
      .withColumn("cum_all", sum(col("d") + col("c")).over(w))
      .withColumn("n_risk", tot - (col("cum_all") - (col("d") + col("c"))))
      .withColumn("_lnf", when(col("d") < col("n_risk"),
        log(lit(1.0) -
          col("d").cast("double") / col("n_risk").cast("double")))
        .otherwise(lit(0.0)))
      .withColumn("_dead",
        max(when(col("d") === col("n_risk"), 1).otherwise(0)).over(w))
      .withColumn("survival", when(col("_dead") === 1, lit(0.0))
        .otherwise(round(exp(sum(col("_lnf")).over(w)), 6)))
      .select(col("dur"), col("n_risk"), col("d"), col("c"),
        col("survival"))
  }

  /** Windowed HOT-VALUES monitor: per tumbling window, the Misra–Gries
    * candidate set over `valueCol` — the continuous twin of
    * [[graft.ext.TextAnalysis.heavyHitters]]'s first pass. State per
    * window is bounded by `capacity` counters regardless of value
    * cardinality (the property that makes it streamable: an exact
    * per-value count would hold the full vocabulary in state forever);
    * the retained set provably contains every value with frequency
    * > n/(capacity+1) in its window. Candidates, not counts — recount
    * the flagged values exactly downstream when counts matter.
    *
    * The same call runs batch or streaming (add `withWatermark` upstream
    * on a stream); [[graft.agg.MisraGriesAgg]] merges are what Structured
    * Streaming's partial aggregation replays per micro-batch. */
  def hotValues(df: DataFrame, valueCol: String, dur: String = "1 hour",
      capacity: Int = 64): DataFrame =
    df.groupBy(window(col("ts"), dur))
      .agg(graft.agg.MisraGriesAgg(col(valueCol), capacity).as("hot"))
      .select(col("window.start").as("ws"), col("hot"))

  /** EXPONENTIAL TIME-DECAY AGGREGATE per user: every event's value is
    * weighted `2^(−age/halfLife)` (age against the corpus' max event
    * time) and summed — the standard recency-weighted engagement /
    * popularity feature (an unweighted lifetime sum treats a click from
    * last year like one from this morning). `decayed_count` is the same
    * decay over 1s — the recency-weighted event count, and the
    * normalizer if a decayed MEAN is wanted.
    *
    * The weight is written as `exp(−ln2 · ageDays / halfLife)` with ln 2
    * fixed to [[graft.ext.Eval.Ln2]] — one constant an external checker
    * can interpolate to replay the exact IEEE arithmetic.
    *
    * Shape at 100 TB: a 1-row max() pull broadcast back, then one
    * map-side-combined groupBy — the decay is a shuffle-free projection.
    * Incremental form: `decayed(t2) = decayed(t1) · 2^(−Δt/halfLife) +
    * newEvents(t1..t2)` — a nightly job never rescans history. */
  def timeDecayedValue(df: DataFrame, halfLifeDays: Double): DataFrame = {
    require(halfLifeDays > 0, s"halfLifeDays $halfLifeDays")
    val tmax = df.agg(max(unix_micros(col("ts"))).as("_tmax"))
    df.crossJoin(broadcast(tmax))
      .withColumn("_w", exp(lit(-graft.ext.Eval.Ln2) *
        ((col("_tmax") - unix_micros(col("ts"))).cast("double") /
          lit(86400000000.0)) / lit(halfLifeDays)))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value") * col("_w")), 6).as("decayed_value"),
        round(sum(col("_w")), 6).as("decayed_count"))
  }

  final case class DecayState(lastMs: Long, value: Double, count: Double,
      n: Long)
  final case class DecayOut(user_id: Long, n: Long, decayed_value: Double,
      decayed_count: Double, as_of: Timestamp)

  /** ONLINE per-user decayed engagement — the SERVING twin of
    * [[timeDecayedValue]]: `mapGroupsWithState` holds (lastTs, decayed
    * value, decayed count) per user and each event decays the running
    * state by its time gap before adding itself — exactly the
    * incremental identity the batch op documents, run continuously.
    * LATE events (event-time ≤ the state's clock) are added at their
    * correctly-decayed weight `2^(−(last−t)/h)` WITHOUT rewinding the
    * clock, so replays and out-of-order arrivals converge to the same
    * state as an in-order feed (suite-pinned across micro-batches).
    *
    * State is 3 doubles + 2 longs per user — bounded by user
    * cardinality, not event rate. Emits the updated state per user per
    * micro-batch (Update mode); the state decays to each user's OWN
    * last event (`as_of`) — a reader aligning users to one instant
    * applies `2^(−(t−as_of)/halfLife)`, pure arithmetic. */
  def decayStream(ds: Dataset[Event], halfLifeDays: Double,
      watermark: String = "10 minutes"): Dataset[DecayOut] = {
    import ds.sparkSession.implicits._
    require(halfLifeDays > 0, s"halfLifeDays $halfLifeDays")
    def w(deltaMs: Long): Double = math.exp(-graft.ext.Eval.Ln2 *
      (deltaMs.toDouble / 86400000.0) / halfLifeDays)
    ds.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .mapGroupsWithState[DecayState, DecayOut](
        GroupStateTimeout.NoTimeout()) {
        (userId: Long, events: Iterator[Event],
            state: GroupState[DecayState]) =>
          val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var s = state.getOption
            .getOrElse(DecayState(Long.MinValue, 0.0, 0.0, 0L))
          sorted.foreach { e =>
            val t = e.ts.getTime
            s = if (s.n == 0L)
              DecayState(t, e.value, 1.0, 1L)
            else if (t <= s.lastMs) {
              // late arrival: weight it as of the state's clock
              val k = w(s.lastMs - t)
              DecayState(s.lastMs, s.value + e.value * k, s.count + k,
                s.n + 1)
            } else {
              val k = w(t - s.lastMs)
              DecayState(t, s.value * k + e.value, s.count * k + 1.0,
                s.n + 1)
            }
          }
          state.update(s)
          DecayOut(userId, s.n, s.value, s.count, new Timestamp(s.lastMs))
      }
  }

  /** First-order Markov TRANSITION MATRIX over per-user event sequences:
    * for every ordered (from_type → to_type) adjacency, the transition
    * count and the row-conditional probability P(to | from). The standard
    * journey-analysis / next-event-model summary.
    *
    * Deterministic: per-user order is (ts, event_id) — the id breaks
    * equal-timestamp ties. Probabilities are integer-ratio doubles and
    * stay unrounded (exact divisions are bit-identical cross-engine).
    *
    * Shape at 100 TB: ONE shuffle by user for the lead() window (per-user
    * sequences are the data's natural grain; no global order), then a
    * map-side-combined count into a (|types|²)-row table; the per-from
    * totals join is a sum over that tiny table, never the events. */
  def transitionMatrix(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val adj = df
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = adj.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    adj.join(totals, "from_type")
      .withColumn("p", col("n").cast("double") / col("n_from").cast("double"))
      .select("from_type", "to_type", "n", "n_from", "p")
  }

  /** Stream-stream interval join with event-time bounds: watermarks on both
    * sides let Spark expire join state once `withinSec` (+ watermark delay)
    * has passed — bounded state on an unbounded stream, the shape a
    * 100 TB/day attribution pipeline needs. Pass the SAME source stream
    * twice (filtered per side) or two independent streams. */
  def attributionStreaming(from: DataFrame, to: DataFrame, fromType: String,
      toType: String, withinSec: Long, watermark: String = "10 minutes"): DataFrame =
    attributionPlan(
      from.filter(col("event_type") === fromType).withWatermark("ts", watermark),
      to.filter(col("event_type") === toType).withWatermark("ts", watermark),
      withinSec)

  private def attributionPlan(a: DataFrame, b: DataFrame,
      withinSec: Long): DataFrame = {
    val from = a.select(col("user_id"), col("event_id").as("from_id"),
      col("ts").as("from_ts"))
    val to = b.select(col("user_id").as("user_b"),
      col("event_id").as("to_id"), col("ts").as("to_ts"))
    from.join(to,
      col("user_id") === col("user_b") &&
      col("to_ts") > col("from_ts") &&
      col("to_ts") <= col("from_ts") + expr(s"INTERVAL $withinSec SECONDS"))
      .select(col("user_id"), col("from_id"), col("to_id"),
        col("from_ts"), col("to_ts"))
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionOut(user_id: Long, n_events: Long, duration_sec: Long)
  final case class SessionState(first: Long, last: Long, n: Long)

  /** Streaming sessionization with explicit state: one [[SessionState]] per
    * user, emitted when the WATERMARK passes `last event + gap` (event-time
    * timeout) — session closure depends only on the data, so a replay of
    * the same stream emits identical sessions (a processing-time timeout
    * would close sessions on wall clock, nondeterministically). The
    * stateful analog of [[sessionizeBatch]] — bounded state per key, the
    * 100 TB-stream shape.
    *
    * Event-time tradeoffs callers must size `watermark` for:
    *   - NO FLUSH ON IDLE: the watermark only advances when newer events
    *     arrive, so on an idle or terminated stream the tail sessions stay
    *     open in state and are never emitted (a processing-time timeout
    *     would eventually flush them, at the cost of replay determinism).
    *     For a drain-at-shutdown use [[drainSessions]] (file sources) or
    *     inject [[drainSentinel]] into the source yourself.
    *   - LATENESS BOUND: events later than `watermark` behind the stream
    *     maximum are dropped by `withWatermark` before they reach state —
    *     a larger watermark admits later data but delays session closure
    *     and grows state residency by the same margin. */
  def sessionizeStreaming(ds: Dataset[Event], gapSec: Long,
      watermark: String = "10 minutes"): Dataset[SessionOut] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, events: Iterator[Event], state: GroupState[SessionState]) =>
          // State holds epoch MILLISECONDS (not truncated seconds) so
          // sub-second gaps straddling gapSec agree with the microsecond
          // arithmetic of [[sessionizeBatch]]; duration converts to whole
          // seconds only at emission (floor, matching the batch cast).
          def emit(s: SessionState) =
            SessionOut(userId, s.n, (s.last - s.first) / 1000L)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(emit(s))
          } else {
            val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var out = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last > gapSec * 1000L =>
                  out ::= emit(s)
                  cur = Some(SessionState(t, t, 1))
                case Some(s) =>
                  cur = Some(SessionState(s.first, t, s.n + 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // fire once the watermark passes the inactivity gap; clamp
              // above the current watermark (Spark rejects a timeout at or
              // behind it when every event in the batch arrived late)
              state.setTimeoutTimestamp(math.max(
                s.last + gapSec * 1000L, state.getCurrentWatermarkMs() + 1L))
            }
            out.reverseIterator
          }
      }
  }

  /** Drain sentinel for [[sessionizeStreaming]]: a single synthetic event
    * whose timestamp sits past `maxEventTs + gapSec + watermarkSec`, so once
    * it flows through the stream the watermark passes `last + gap` for
    * EVERY session open at `maxEventTs` and one more micro-batch emits them
    * all. The sentinel's own single-event session stays behind in state —
    * the watermark never passes it — so the drained output needs no
    * filtering; its ids are `Long.MinValue` should a caller want to guard
    * anyway. Watermark is taken in seconds (the string form
    * sessionizeStreaming accepts is sugar for exactly this number). */
  def drainSentinel(maxEventTs: Timestamp, gapSec: Long,
      watermarkSec: Long): Event =
    Event(Long.MinValue,
      new Timestamp(maxEventTs.getTime + (gapSec + watermarkSec + 2L) * 1000L),
      Long.MinValue, "__drain__", 0.0)

  /** Drain a FILE-SOURCE sessionization stream at shutdown: appends one
    * [[drainSentinel]] parquet row to `sourceDir`, so restarting the query
    * on its existing checkpoint (state intact) closes and emits every open
    * tail session in the next micro-batch. Returns the sentinel written.
    * Idempotence: the sentinel timestamp derives from the REAL events only
    * (prior sentinels are excluded from the max), so a repeat drain
    * appends an identical row and flushes nothing further.
    *
    * THE SENTINEL STAYS IN THE DATA: batch consumers of `sourceDir` (and
    * the initial watermark of any NEW stream started over it) see the
    * synthetic row unless they strip it — pass the DataFrame through
    * [[withoutDrainSentinels]] first. */
  def drainSessions(spark: SparkSession, sourceDir: String, gapSec: Long,
      watermarkSec: Long): Event = {
    import spark.implicits._
    val maxTs = withoutDrainSentinels(spark.read.parquet(sourceDir))
      .agg(max(col("ts"))).first().getTimestamp(0)
    require(maxTs != null, s"no events with a timestamp under $sourceDir")
    val s = drainSentinel(maxTs, gapSec, watermarkSec)
    Seq(s).toDF().write.mode("append").parquet(sourceDir)
    s
  }

  /** Strip [[drainSessions]] sentinels from an event frame — for batch
    * reads of a drained source directory, or before re-streaming it. The
    * sentinel key is `event_id = Long.MinValue`, unreachable for real
    * events (ids are non-negative in every source this engine writes). */
  def withoutDrainSentinels(df: DataFrame): DataFrame =
    df.filter(col("event_id") =!= lit(Long.MinValue))

  /** REGULAR-GRID RESAMPLE with forward fill: per user, a dense daily
    * time grid from their first to their last event day, carrying the
    * day's LAST observed value (by (ts, event_id) — deterministic under
    * equal timestamps) forward across event-less days. The standard
    * irregular-events → model-ready-features step (a daily "state of the
    * user" table a training pipeline joins against); gaps become explicit
    * repeated rows instead of silent holes.
    *
    * Shape at 100 TB: one shuffle by user for the per-day top-1 and span
    * aggregation (map-side combined to users×days), the grid explodes
    * from 2 timestamps per user (never a global calendar cross join), and
    * the forward fill is a running `last(ignoreNulls)` over the same
    * user partitioning — Catalyst reuses one exchange for all three.
    * Output: (user_id, bucket, fill) — fill is an exact data value, no
    * arithmetic, so no rounding grain is needed. */
  def resampleFill(df: DataFrame): DataFrame = {
    val daily = df
      .withColumn("bucket", date_trunc("day", col("ts")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"), col("bucket"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("bucket"), col("value"))
    val grid = df
      .groupBy(col("user_id"))
      .agg(date_trunc("day", min(col("ts"))).as("d0"),
        date_trunc("day", max(col("ts"))).as("d1"))
      .select(col("user_id"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("bucket"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "bucket"), "left")
      .withColumn("fill", last(col("value"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("bucket"), col("fill"))
  }
}
