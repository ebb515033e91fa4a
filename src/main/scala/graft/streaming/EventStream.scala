package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming twins of the batch event operators
  * ([[graft.events.Events]]): the same aggregation logic lifted onto an
  * unbounded source with event-time watermarks. `readStream` on the same
  * schema → these transforms → `writeStream` is the full deployment; the
  * specs drive them with an in-memory source and the batch operators as
  * the oracle.
  *
  * Differences from batch, forced by streaming semantics (documented here
  * so they read as design, not drift):
  *
  *  - Time must be a real `TimestampType` column (watermarks and
  *    `window`/`session_window` operate on event time, not on our integer
  *    epoch-µs), so the raw epoch-ns long converts via `timestamp_micros`
  *    — the same ns→µs truncation as the batch path.
  *  - Exact `count(DISTINCT)` is not executable incrementally; the
  *    streaming rollup uses `approx_count_distinct` (HLL sketch, mergeable
  *    state) and names the column `n_users_approx` to keep the contrast
  *    honest.
  *  - Sessionization uses the built-in `session_window` gap-state operator
  *    rather than lag+running-sum (window functions over unbounded input
  *    don't stream); session identity is (user, window start) instead of a
  *    per-user ordinal.
  */
object EventStream {

  /** Event-time column from the raw epoch-ns BIGINT `ts` — the batch
    * operators' shared ns→µs floor ([[graft.events.Events.tsUs]]), lifted
    * to the TimestampType watermarks require. */
  private[streaming] val eventTime: Column =
    timestamp_micros(graft.events.Events.tsUs)

  private val valueCents: Column = graft.events.Events.valueCents.cast("long")

  /** Streaming tumbling one-hour rollup per event type — the
    * [[graft.events.Events.hourlyRollup]] logic under a watermark. Late
    * rows beyond `watermarkDelay` are dropped; state for closed windows is
    * evicted, so state size is O(open windows × event types), constant in
    * stream length.
    */
  def hourlyRollup(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events.select(eventTime.as("event_time"), col("event_type"), col("user_id"),
        valueCents.as("value_cents"),
        graft.events.Events.propsK.as("k"))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct("user_id").as("n_users_approx"),
        sum("value_cents").as("sum_value_cents"),
        sum("k").as("sum_k"))
      .select(unix_micros(col("window.start")).as("hour_us"), col("event_type"),
        col("n_events"), col("n_users_approx"), col("sum_value_cents"), col("sum_k"))

  /** Epoch-µs per day (the batch retention/WAU day arithmetic). */
  private val DayUs = 86400000000L

  /** Streaming EXACT daily active users — the dedup-then-count spelling
    * that recovers an exact distinct where the naive aggregate cannot
    * stream (this file's header note: `count(DISTINCT)` is not
    * incrementally executable; `approx_count_distinct` is the one-shot
    * workaround the hourly rollup uses). Here the distinct is made
    * MERGEABLE instead of approximated: `dropDuplicatesWithinWatermark`
    * on (user, day) evicts each key once the watermark passes, so every
    * (user, day) survives exactly once into a plain streamable count —
    * exact, with state bounded by one 16-byte key per active (user,
    * day) inside the horizon. The 1-day tumbling window aligns to UTC
    * epoch days, bit-identical to the batch family's pmod
    * floor-division day index ([[graft.events.Events.retention]] —
    * same spelling, so pre-epoch days floor the same way). The batch
    * [[graft.events.Events.rollingActiveUsers]] at window 1 is the
    * nightly-sweep twin (spec-pinned equality).
    *
    * EXACTNESS PRECONDITION on the delay: WithinWatermark only dedups
    * occurrences arriving within the delay of each other, and a (user,
    * day) key legitimately spans 24 h of event time — a delay under a
    * day lets a morning and an evening visit of the SAME user count
    * twice once other traffic advances the watermark between them. The
    * default is therefore one day PLUS the late-arrival tolerance
    * (25 h), and callers lowering it are trading exactness away
    * knowingly. */
  def dailyActives(events: DataFrame,
      watermarkDelay: String = "25 hours"): DataFrame =
    events.select(eventTime.as("event_time"), col("user_id"))
      .withWatermark("event_time", watermarkDelay)
      .withColumn("day",
        expr(graft.events.Events.dayOf("unix_micros(event_time)", "DIV")))
      .dropDuplicatesWithinWatermark("user_id", "day")
      .groupBy(window(col("event_time"), "1 day"))
      .agg(count(lit(1)).as("n_active"))
      .select(expr(s"unix_micros(window.start) DIV $DayUs").as("day"),
        col("n_active"))

  /** Streaming producer of the mergeable sketch artifact — the stream
    * face of [[graft.events.Events.hourlyUserSketches]]: per closed
    * (hour, event_type) window, the Datasketches-HLL user sketch as a
    * plain binary column plus the event count. This is the stream→batch
    * handoff the sketch family exists for: the stream persists ~KB-sized
    * hour sketches as they close (state = open windows only, evicted by
    * the watermark), and the nightly batch re-rolls them to any coarser
    * grain with [[graft.events.Events.dailyActiveFromSketches]] WITHOUT
    * ever rescanning raw events — the continuous version of the
    * sketch-cube pattern. Same lgK as batch, so stream- and
    * batch-produced sketches union freely (the spec pins the composed
    * stream→union path against exact distincts). Unlike the rollup's
    * scalar `approx_count_distinct`, the emitted SKETCH keeps the
    * estimate mergeable downstream — a scalar estimate is a dead end. */
  def hourlyUserSketches(events: DataFrame,
      watermarkDelay: String = "2 hours"): DataFrame =
    events.select(eventTime.as("event_time"), col("event_type"),
        col("user_id"))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id"),
          lit(graft.events.Events.HllLgK)).as("users_hll"),
        count(lit(1)).as("n_events"))
      .select(unix_micros(col("window.start")).as("hour_us"),
        col("event_type"), col("users_hll"), col("n_events"))

  /** Streaming producer of KMV sketch shards — the stream face of
    * [[graft.events.Audience.kmvSketches]], per closed (hour,
    * event_type) window: the K smallest distinct user-id hashes as an
    * ascending array, built by the same bounded-state
    * [[graft.events.KmvAgg]] the batch path runs (same portable hash
    * seed, so stream- and batch-produced shards are interchangeable).
    * Where the HLL emit face ([[hourlyUserSketches]]) gives mergeable
    * UNION estimates, this one keeps INTERSECTION/Jaccard reachable
    * downstream — KMV is the sketch HLL cannot replace. State per open
    * window is ≤K longs per type, evicted by the watermark; the nightly
    * [[graft.events.Audience.kmvFromWindowSketches]] re-roll then
    * folds the closed shards to any coarser grain without rescanning
    * raw events, and the result merges into
    * [[graft.events.Audience.incrementalKmv]] like any batch shard
    * (exactness spec-pinned end to end). */
  def windowedKmvSketches(events: DataFrame,
      watermarkDelay: String = "2 hours",
      k: Int = graft.events.Audience.KmvK): DataFrame = {
    val kmv = udaf(new graft.events.KmvAgg(k),
      org.apache.spark.sql.Encoders.scalaLong)
    events.select(eventTime.as("event_time"), col("event_type"),
        graft.events.Audience.userHash(col("user_id")).as("h"))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(kmv(col("h")).as("s"))
      .select(unix_micros(col("window.start")).as("hour_us"),
        col("event_type"), col("s.hs").as("hs"))
  }

  /** Streaming hour × event-type pivot — the stream face of
    * [[graft.events.Events.eventPivot]]. `Dataset.pivot` itself is
    * unsupported on streaming relations (RelationalGroupedDataset
    * pivot needs the full child to resolve even declared values), so
    * this is the conditional-aggregate spelling the batch pivot LOWERS
    * TO — same declared [[graft.events.Events.PivotTypes]] columns,
    * same zero-fill, bit-identical rows (spec-pinned vs batch). State
    * is one row of |types| longs per open hour window, evicted as the
    * watermark passes. */
  def hourlyPivot(events: DataFrame,
      watermarkDelay: String = "2 hours"): DataFrame = {
    val types = graft.events.Events.PivotTypes
    val aggs = types.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t"))
    events.select(eventTime.as("event_time"), col("event_type"))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), "1 hour"))
      .agg(aggs.head, aggs.tail: _*)
      .select(unix_micros(col("window.start")).as("hour_us") +:
        types.map(t => col(s"n_$t")): _*)
  }

  /** Streaming gap sessionization — [[graft.events.Events.sessionize]]
    * through the `session_window` state operator: per-user windows merge
    * while events arrive within `gap`, close when the watermark passes
    * start + gap. State is per OPEN session only.
    */
  def sessionize(events: DataFrame, gap: String = "4 hours",
      watermarkDelay: String = "2 hours"): DataFrame =
    events.select(col("user_id"), eventTime.as("event_time"),
        valueCents.as("value_cents"))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("event_time"), gap))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("event_time"))).as("session_start_us"),
        max(unix_micros(col("event_time"))).as("session_end_us"),
        sum("value_cents").as("sum_value_cents"))
      .select(col("user_id"), col("n_events"), col("session_start_us"),
        col("session_end_us"), col("sum_value_cents"))
}
