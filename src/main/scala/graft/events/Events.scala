package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over
  * `events(event_id, ts, user_id, event_type, value, props)`.
  *
  * The fixture's `ts` arrives as epoch-nanos BIGINT — [[graft.Tables.events]]
  * normalizes every parquet representation it has shipped as (INT64
  * TIMESTAMP(NANOS) via `spark.sql.legacy.parquet.nanosAsLong`, or
  * TIMESTAMP(MICROS) ×1000) to that one type. All time arithmetic here
  * is integer epoch-microseconds (`ts div 1000`, matching DuckDB's
  * µs-truncating parquet read bit-for-bit), deliberately: timestamps never
  * round-trip through timezone-dependent types, so the results are
  * deterministic across engines, sessions, and timezones.
  *
  * `value` is quantized to exact integer cents (`floor(v·100 + 0.5)`) before
  * any aggregation — summing doubles is order-dependent and would make
  * results depend on partitioning; summing int64 cents is exact and
  * associative. Same rule the graph/text operators follow: floats at the
  * edges, integers in the aggregates.
  *
  * Both operators are the batch shape of their Structured Streaming twins:
  * [[hourlyRollup]] is a tumbling window (groupBy window(ts) + watermark in
  * streaming) and [[sessionize]] is session-window state
  * (flatMapGroupsWithState / session_window in streaming). The aggregation
  * logic is identical; only the source/trigger changes.
  */
object Events {

  /** Epoch-µs from the raw epoch-ns long. FLOOR division, not `DIV`:
    * `DIV` truncates toward zero, which diverges from DuckDB's ns→µs
    * epoch conversion (a floor) for pre-epoch timestamps (-1500 ns is
    * -2 µs, not -1). `ts - pmod(ts, 1000)` is exactly divisible, so the
    * DIV afterwards is exact for every int64. Shared by the streaming
    * twins ([[graft.streaming.EventStream]], [[graft.streaming.DocStream]])
    * so batch and streaming cannot drift. */
  private[graft] val tsUs: Column =
    expr("CAST((ts - pmod(ts, 1000)) DIV 1000 AS BIGINT)")

  /** Exact integer cents. floor(v·100 + 0.5) rather than round(): the two
    * engines disagree on round-half-to-even vs half-away at exact .5
    * doubles; floor(x + 0.5) is the same IEEE ops in both. Shared by the
    * streaming twins. */
  private[graft] val valueCents: Column = floor(col("value") * lit(100.0) + lit(0.5))

  /** `props.$.k` as BIGINT-or-NULL. try_cast, NOT cast: Spark 4 runs
    * ANSI mode by default, where cast crashes the job on k = 5.7 or
    * "abc"; try_cast yields NULL in every mode, matching the oracle's
    * integer-regex guard. Shared by the streaming twin. */
  private[graft] val propsK: Column =
    expr("try_cast(get_json_object(props, '$.k') AS BIGINT)")

  /** Gap-based sessionization: a new session starts when a user is idle
    * longer than `gapSeconds`. Classic two-window plan — lag() flags
    * session starts, a running sum numbers them — then one aggregation
    * per (user, session). Both windows and the final groupBy share the
    * SAME `user_id` hash partitioning, so Catalyst plans ONE shuffle and
    * two in-partition sorts; per-user state never crosses executors.
    */
  def sessionize(events: DataFrame, gapSeconds: Long = 14400L): DataFrame = {
    val gapUs = gapSeconds * 1000000L
    val e = events.select(col("user_id"), col("event_id"),
      tsUs.as("ts_us"), valueCents.as("value_cents"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val flagged = e.withColumn("new_sess",
      when(col("ts_us") - lag("ts_us", 1).over(w) > gapUs, 1L).otherwise(0L))
    val numbered = flagged.withColumn("session_seq",
      sum("new_sess").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    numbered.groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("session_start_us"),
        max("ts_us").as("session_end_us"),
        sum("value_cents").as("sum_value_cents"))
  }

  def sessionizeSql(gapSeconds: Long = 14400L): String = {
    val gapUs = gapSeconds * 1000000L
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       |    CAST(floor(value * 100e0 + 0.5e0) AS BIGINT) AS value_cents
       |  FROM events
       |), flagged AS (
       |  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER
       |      (PARTITION BY user_id ORDER BY ts_us, event_id) > $gapUs
       |    THEN 1 ELSE 0 END AS new_sess
       |  FROM e
       |), numbered AS (
       |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
       |  FROM flagged
       |)
       |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  min(ts_us) AS session_start_us,
       |  max(ts_us) AS session_end_us,
       |  CAST(sum(value_cents) AS BIGINT) AS sum_value_cents
       |FROM numbered GROUP BY user_id, session_seq
       |ORDER BY user_id, session_seq, n_events, session_start_us, session_end_us,
       |  sum_value_cents""".stripMargin
  }

  /** Tumbling one-hour rollup per event type, with a JSON payload field
    * extracted from `props`. One partial-aggregated shuffle on
    * (hour, event_type); the hour key is pure integer arithmetic on
    * epoch-µs (no timezone truncation). `n_users` is an exact distinct —
    * Spark expands it to a two-phase aggregate automatically.
    */
  def hourlyRollup(events: DataFrame): DataFrame = {
    val hourUs = 3600000000L
    events.select(
        (tsUs - (tsUs % hourUs)).as("hour_us"),
        col("event_type"),
        col("user_id"),
        valueCents.as("value_cents"),
        propsK.as("k"))
      .groupBy("hour_us", "event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"),
        sum("value_cents").as("sum_value_cents"),
        sum("k").as("sum_k"))
  }

  def hourlyRollupSql: String =
    s"""WITH e AS (
       |  SELECT epoch_us(ts) - (epoch_us(ts) % 3600000000) AS hour_us,
       |    event_type, user_id,
       |    CAST(floor(value * 100e0 + 0.5e0) AS BIGINT) AS value_cents,
       |    CASE WHEN json_valid(props)
       |        AND regexp_matches(trim(json_extract_string(props, '$$.k')), '^[+-]?[0-9]+$$')
       |      THEN CAST(trim(json_extract_string(props, '$$.k')) AS BIGINT) END AS k
       |  FROM events
       |)
       |SELECT hour_us, event_type,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       |  CAST(sum(value_cents) AS BIGINT) AS sum_value_cents,
       |  CAST(sum(k) AS BIGINT) AS sum_k
       |FROM e GROUP BY hour_us, event_type
       |ORDER BY hour_us, event_type, n_events, n_users, sum_value_cents, sum_k""".stripMargin

  /** Per-user top-k events by value — the ranking-window operator (the
    * reference has none; SURVEY §2.5 lists the category as an extension).
    * One hash partition by user_id + in-partition sort; output bounded at
    * k rows per user. Ties broken by event_id (unique), so the ranking is
    * total and both engines agree row-for-row.
    */
  def topEventsPerUser(events: DataFrame, k: Int = 3): DataFrame = {
    val e = events.select(col("user_id"), col("event_id"),
      tsUs.as("ts_us"), valueCents.as("value_cents"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("value_cents").desc, col("event_id"))
    e.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("user_id"), col("rnk"), col("event_id"),
        col("ts_us"), col("value_cents"))
  }

  /** Default funnel for the query entry: the fixture's browse → engage
    * → convert ordering. */
  val FunnelStages: Seq[String] = Seq("view", "click", "purchase")

  /** Ordered three-stage funnel — the product-analytics staple "who
    * viewed, then clicked, then purchased": per user, the timestamp of
    * the FIRST stage-1 event, the first stage-2 event STRICTLY AFTER
    * it, and the first stage-3 event strictly after that, plus the
    * stage index reached (0..3). Sequential minima, not per-type minima
    * — a purchase before the first view must not count, which is what
    * makes a funnel a funnel (and what a single groupBy with three
    * conditional mins gets wrong).
    *
    * Scale shape: three filtered partial-aggregated minima chained by
    * user_id equi-joins plus the per-user assembly joins — every join
    * and every aggregate in the plan keys on user_id, so Catalyst
    * reuses ONE hash partitioning across the whole chain (the
    * sessionize discipline); each stage relation only SHRINKS (stage k
    * rows ⊆ stage k-1 users), so the later joins are the cheap ones.
    * Per-user event lists are never collected — state per stage is one
    * (user, min) row. */
  def funnel(events: DataFrame,
      stages: Seq[String] = FunnelStages): DataFrame = {
    require(stages.length == 3, s"funnel wants exactly 3 stages (got $stages)")
    val e = events.select(col("user_id"), col("event_type"), tsUs.as("ts_us"))
    val users = e.select("user_id").distinct()
    val s1 = e.filter(col("event_type") === stages(0))
      .groupBy("user_id").agg(min("ts_us").as("t1_us"))
    val s2 = e.filter(col("event_type") === stages(1))
      .join(s1, "user_id").filter(col("ts_us") > col("t1_us"))
      .groupBy("user_id").agg(min("ts_us").as("t2_us"))
    val s3 = e.filter(col("event_type") === stages(2))
      .join(s2, "user_id").filter(col("ts_us") > col("t2_us"))
      .groupBy("user_id").agg(min("ts_us").as("t3_us"))
    users.join(s1, Seq("user_id"), "left")
      .join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"), col("t1_us"), col("t2_us"), col("t3_us"),
        when(col("t3_us").isNotNull, 3L)
          .when(col("t2_us").isNotNull, 2L)
          .when(col("t1_us").isNotNull, 1L)
          .otherwise(0L).as("stage"))
  }

  def funnelSql(stages: Seq[String] = FunnelStages): String = {
    require(stages.length == 3, s"funnelSql wants exactly 3 stages (got $stages)")
    val Seq(a, b, c) = stages
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
       |), u AS (
       |  SELECT DISTINCT user_id FROM e
       |), s1 AS (
       |  SELECT user_id, min(ts_us) AS t1_us FROM e
       |  WHERE event_type = '$a' GROUP BY user_id
       |), s2 AS (
       |  SELECT e.user_id, min(ts_us) AS t2_us
       |  FROM e JOIN s1 ON s1.user_id = e.user_id
       |  WHERE event_type = '$b' AND ts_us > t1_us GROUP BY e.user_id
       |), s3 AS (
       |  SELECT e.user_id, min(ts_us) AS t3_us
       |  FROM e JOIN s2 ON s2.user_id = e.user_id
       |  WHERE event_type = '$c' AND ts_us > t2_us GROUP BY e.user_id
       |)
       |SELECT u.user_id, t1_us, t2_us, t3_us,
       |  CAST(CASE WHEN t3_us IS NOT NULL THEN 3
       |            WHEN t2_us IS NOT NULL THEN 2
       |            WHEN t1_us IS NOT NULL THEN 1
       |            ELSE 0 END AS BIGINT) AS stage
       |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
       |  LEFT JOIN s3 USING (user_id)
       |ORDER BY user_id, t1_us, t2_us, t3_us, stage""".stripMargin
  }

  /** Conversion window for the [[funnelWindowed]] query entry: 48 h. */
  val FunnelWindowSeconds: Long = 172800L

  /** [[funnel]] with a CONVERSION WINDOW — the semantics attribution
    * actually uses: stages 2 and 3 only count within `windowSeconds` of
    * the user's stage-1 time (a purchase three months after the first
    * view is not this campaign's conversion). Same sequential-minimum
    * chain with the window bound added to each qualifying filter; the
    * unbounded [[funnel]] is the windowSeconds → ∞ limit. Stage times
    * keep [[funnel]]'s strict ordering (t1 < t2 < t3 ≤ t1 + window).
    *
    * Scale shape: identical to [[funnel]] — the window bound is a
    * per-row predicate on the already-joined (ts, t1) pair, free. */
  def funnelWindowed(events: DataFrame,
      windowSeconds: Long = FunnelWindowSeconds,
      stages: Seq[String] = FunnelStages): DataFrame = {
    require(stages.length == 3, s"funnel wants exactly 3 stages (got $stages)")
    require(windowSeconds >= 1, s"windowSeconds must be >= 1 (got $windowSeconds)")
    val windowUs = windowSeconds * 1000000L
    val e = events.select(col("user_id"), col("event_type"), tsUs.as("ts_us"))
    val users = e.select("user_id").distinct()
    val s1 = e.filter(col("event_type") === stages(0))
      .groupBy("user_id").agg(min("ts_us").as("t1_us"))
    val s2 = e.filter(col("event_type") === stages(1))
      .join(s1, "user_id")
      .filter(col("ts_us") > col("t1_us") &&
        col("ts_us") <= col("t1_us") + windowUs)
      .groupBy("user_id").agg(min("ts_us").as("t2_us"), min("t1_us").as("t1w_us"))
    val s3 = e.filter(col("event_type") === stages(2))
      .join(s2, "user_id")
      .filter(col("ts_us") > col("t2_us") &&
        col("ts_us") <= col("t1w_us") + windowUs)
      .groupBy("user_id").agg(min("ts_us").as("t3_us"))
    users.join(s1, Seq("user_id"), "left")
      .join(s2.select(col("user_id"), col("t2_us")), Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"), col("t1_us"), col("t2_us"), col("t3_us"),
        when(col("t3_us").isNotNull, 3L)
          .when(col("t2_us").isNotNull, 2L)
          .when(col("t1_us").isNotNull, 1L)
          .otherwise(0L).as("stage"))
  }

  def funnelWindowedSql(windowSeconds: Long = FunnelWindowSeconds,
      stages: Seq[String] = FunnelStages): String = {
    require(stages.length == 3, s"funnelSql wants exactly 3 stages (got $stages)")
    val windowUs = windowSeconds * 1000000L
    val Seq(a, b, c) = stages
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
       |), u AS (
       |  SELECT DISTINCT user_id FROM e
       |), s1 AS (
       |  SELECT user_id, min(ts_us) AS t1_us FROM e
       |  WHERE event_type = '$a' GROUP BY user_id
       |), s2 AS (
       |  SELECT e.user_id, min(ts_us) AS t2_us, min(t1_us) AS t1w_us
       |  FROM e JOIN s1 ON s1.user_id = e.user_id
       |  WHERE event_type = '$b' AND ts_us > t1_us
       |    AND ts_us <= t1_us + $windowUs
       |  GROUP BY e.user_id
       |), s3 AS (
       |  SELECT e.user_id, min(ts_us) AS t3_us
       |  FROM e JOIN s2 ON s2.user_id = e.user_id
       |  WHERE event_type = '$c' AND ts_us > t2_us
       |    AND ts_us <= t1w_us + $windowUs
       |  GROUP BY e.user_id
       |)
       |SELECT u.user_id, t1_us, t2_us, t3_us,
       |  CAST(CASE WHEN t3_us IS NOT NULL THEN 3
       |            WHEN t2_us IS NOT NULL THEN 2
       |            WHEN t1_us IS NOT NULL THEN 1
       |            ELSE 0 END AS BIGINT) AS stage
       |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
       |  LEFT JOIN s3 USING (user_id)
       |ORDER BY user_id, t1_us, t2_us, t3_us, stage""".stripMargin
  }

  /** Epoch-µs per day. */
  private[graft] val DayUs = 86400000000L

  /** Floor-division day index from epoch-µs — the [[tsUs]] pmod
    * discipline (`%` truncates toward zero in both engines, so the
    * double-pmod makes the subtraction exactly divisible and the
    * truncating integer division a true floor for pre-epoch
    * timestamps). `divOp` is the engine's integer-divide spelling
    * (Spark `DIV`, DuckDB `//`). */
  private[graft] def dayOf(c: String, divOp: String): String =
    s"($c - (($c % $DayUs + $DayUs) % $DayUs)) $divOp $DayUs"

  /** Cohort retention — the "do users come back" matrix every activity
    * dashboard leads with: users cohorted by the DAY of their first
    * event, counted on each later day-offset they were active.
    * `n_users` at offset 0 is the cohort size (everyone is active on
    * their first day); a user active twice in one day counts once.
    *
    * Scale shape: the (user, day) distinct collapse is the one shuffle
    * proportional to input; the first-day minimum and the cohort join
    * reuse the same user_id partitioning (no second full shuffle —
    * the funnel discipline), and the final rollup aggregates the
    * ≤|user-days| relation partial-aggregated on (cohort_day, offset).
    * Exactly one row per (user, offset) survives the join, so the
    * count is exact without a distinct. */
  def retention(events: DataFrame): DataFrame = {
    val days = events.select(col("user_id"), tsUs.as("ts_us"))
      .select(col("user_id"), expr(dayOf("ts_us", "DIV")).as("day"))
      .distinct()
    val first = days.groupBy("user_id").agg(min("day").as("cohort_day"))
    days.join(first, "user_id")
      .withColumn("offset_days", col("day") - col("cohort_day"))
      .groupBy("cohort_day", "offset_days")
      .agg(count(lit(1)).as("n_users"))
  }

  def retentionSql: String = {
    val day = dayOf("epoch_us(ts)", "//")
    s"""WITH days AS (
       |  SELECT DISTINCT user_id, $day AS day FROM events
       |), first AS (
       |  SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id
       |)
       |SELECT cohort_day, day - cohort_day AS offset_days,
       |  CAST(count(*) AS BIGINT) AS n_users
       |FROM days JOIN first USING (user_id)
       |GROUP BY cohort_day, offset_days
       |ORDER BY cohort_day, offset_days, n_users""".stripMargin
  }

  /** Rolling 7-day active users ("WAU per day") — for every day in the
    * observed span, the count of DISTINCT users with ≥1 event in the
    * trailing `windowDays` window. The sliding-window DISTINCT
    * aggregate no plain groupBy expresses: a distinct count is not
    * subtractable, so the production spelling materializes coverage —
    * each (user, active-day) row covers the `windowDays` report days it
    * is visible to, exploded MAP-SIDE from a bounded literal range
    * (never a range join), distinct-collapsed, counted per report day.
    *
    * Scale shape: the (user, day) collapse is one input-sized shuffle
    * (shared spelling with [[retention]]); the coverage explode
    * multiplies it by the CONSTANT window factor — the standard
    * space-for-associativity trade of sliding distinct counts — and the
    * final partial-agg count runs on the collapsed coverage. The span
    * cap (report days past the last observed day are trailing ghosts)
    * attaches as a 1-row broadcast on a checkpointed constant key. */
  def rollingActiveUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"rollingActiveUsers needs windowDays >= 1")
    // `k` is attached BEFORE the checkpoint so it reaches the span join
    // as a real (non-foldable) column on BOTH sides — a lit(1) added on
    // the probe side post-hoc folds, leaving no equi-key, and Catalyst
    // plans the BroadcastNestedLoopJoin the plan audit forbids (the
    // graphSummary constant-key discipline)
    val days = events.select(tsUs.as("ts_us"), col("user_id"))
      .select(col("user_id"), expr(dayOf("ts_us", "DIV")).as("day"))
      .distinct().withColumn("k", lit(1)).localCheckpoint()
    val span = days.agg(max("day").as("hi"))
      .withColumn("k", lit(1)).localCheckpoint()
    days
      .select(col("user_id"), col("k"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("off"), col("day"))
      .select(col("user_id"), col("k"), (col("day") + col("off")).as("day"))
      .distinct()
      .join(broadcast(span), Seq("k"))
      .filter(col("day") <= col("hi"))
      .groupBy("day").agg(count(lit(1)).as("n_active"))
  }

  def rollingActiveUsersSql(windowDays: Int = 7): String = {
    val day = dayOf("epoch_us(ts)", "//")
    s"""WITH days AS (
       |  SELECT DISTINCT user_id, $day AS day FROM events
       |), span AS (
       |  SELECT max(day) AS hi FROM days
       |), cover AS (
       |  SELECT DISTINCT user_id, day + t.off AS day
       |  FROM days, range(0, $windowDays) t(off)
       |)
       |SELECT c.day AS day, CAST(count(*) AS BIGINT) AS n_active
       |FROM cover c, span WHERE c.day <= span.hi
       |GROUP BY c.day
       |ORDER BY day, n_active""".stripMargin
  }

  /** DAU/MAU stickiness — the product-health ratio every growth report
    * leads with: per day in the observed span, the daily actives, the
    * trailing-`windowDays` actives (default 30), and their ratio in
    * exact millionths ("what fraction of the monthly audience showed up
    * today"). DAU comes straight off the distinct (user, day) relation;
    * MAU is [[rollingActiveUsers]]' bounded coverage explode at the
    * wider window; the two join on the day key. Days with window
    * coverage but no same-day activity report dau = 0 (the denominator
    * population — a ratio whose zero days are absent can't be
    * averaged).
    *
    * Scale shape: [[rollingActiveUsers]]' cost at the wider window plus
    * one extra partial-agg count over the already-collapsed day
    * relation and a day-keyed join of two ≤|days|-row relations. */
  def stickiness(events: DataFrame, windowDays: Int = 30): DataFrame = {
    require(windowDays >= 1, s"stickiness needs windowDays >= 1")
    // `k` attached BEFORE the checkpoint (the rollingActiveUsers
    // foldable-key lesson: a lit(1) added on the probe side folds away
    // and the span attach degenerates to a nested-loop join)
    val days = events.select(tsUs.as("ts_us"), col("user_id"))
      .select(col("user_id"), expr(dayOf("ts_us", "DIV")).as("day"))
      .distinct().withColumn("k", lit(1)).localCheckpoint()
    val dau = days.groupBy("day").agg(count(lit(1)).as("dau"))
    val span = days.agg(max("day").as("hi"))
      .withColumn("k", lit(1)).localCheckpoint()
    val mau = days
      .select(col("user_id"), col("k"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("off"), col("day"))
      .select(col("user_id"), col("k"), (col("day") + col("off")).as("day"))
      .distinct()
      .join(broadcast(span), Seq("k"))
      .filter(col("day") <= col("hi"))
      .groupBy("day").agg(count(lit(1)).as("mau"))
    mau.join(dau, Seq("day"), "left")
      .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"), col("mau"),
        expr("(coalesce(dau, 0L) * 1000000L) div mau")
          .as("stickiness_millionths"))
  }

  def stickinessSql(windowDays: Int = 30): String = {
    val day = dayOf("epoch_us(ts)", "//")
    s"""WITH days AS (
       |  SELECT DISTINCT user_id, $day AS day FROM events
       |), dau AS (
       |  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM days GROUP BY day
       |), span AS (
       |  SELECT max(day) AS hi FROM days
       |), cover AS (
       |  SELECT DISTINCT user_id, day + t.off AS day
       |  FROM days, range(0, $windowDays) t(off)
       |), mau AS (
       |  SELECT c.day AS day, CAST(count(*) AS BIGINT) AS mau
       |  FROM cover c, span WHERE c.day <= span.hi
       |  GROUP BY c.day
       |)
       |SELECT m.day AS day, coalesce(dau, 0) AS dau, mau,
       |  CAST((coalesce(dau, 0) * 1000000) // mau AS BIGINT)
       |    AS stickiness_millionths
       |FROM mau m LEFT JOIN dau d ON d.day = m.day
       |ORDER BY day, dau, mau, stickiness_millionths""".stripMargin
  }

  /** As-of join — attribute each `anchorType` event to the SAME user's
    * most recent `matchType` event at-or-before it (last-touch
    * attribution: "which view led to this purchase"). This is the
    * operator family Spark has no built-in for (ASOF JOIN in DuckDB/
    * QuestDB terms), spelled the scale-safe way: UNION the two sides
    * tagged, ONE running `last(..., ignoreNulls)` window per user in
    * event-time order, keep the anchor rows. Composition over a custom
    * SparkStrategy deliberately (the brief's preference order (a)): the
    * union-window spelling is a single user_id shuffle + one
    * in-partition sort — the same plan a hand-built sort-merge as-of
    * physical operator would produce — with zero operator-maintenance
    * surface.
    *
    * Never the naive spelling (anchor ⋈ match ON same user AND
    * m.ts ≤ a.ts, then argmax): that inequality join expands every
    * (anchor, prior-match) pair — quadratic per user before the argmax
    * collapses it. Here nothing expands: each input row is ONE row in
    * the window.
    *
    * Tie semantics, deterministic by construction: a match at the SAME
    * µs as the anchor counts as prior (matches sort before anchors at
    * equal ts via the tag key); among equal-ts matches the largest
    * event_id wins. Anchors with no prior match keep NULL match
    * columns (the "unattributed" rows a funnel report needs).
    *
    * Scale shape: one hash shuffle on user_id + one sort — per-user
    * state in the window frame is TWO scalars (last match id/ts), so a
    * celebrity user with 10⁸ events streams through its sort group
    * without memory growth. At 100 TB the same plan rides a
    * user_id-bucketed event store with zero Exchange (the
    * [[graft.sources.Sinks]] bucketed-write discipline). */
  def asofAttribution(events: DataFrame, anchorType: String = "purchase",
      matchType: String = "view"): DataFrame = {
    require(anchorType != matchType,
      s"asofAttribution needs distinct event types (got '$anchorType' twice)")
    val e = events
      .filter(col("event_type").isin(anchorType, matchType))
      .select(col("user_id"), col("event_id"), tsUs.as("ts_us"),
        when(col("event_type") === anchorType, lit(1L)).otherwise(lit(0L))
          .as("tag"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "tag", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // both window expressions in ONE select → ONE Window node (two
    // chained withColumn calls would stack two Window operators over the
    // same spec; Catalyst does not collapse them, and the SQL spelling's
    // single WINDOW clause — the plan-equality twin — plans fused)
    e.select(col("user_id"), col("event_id"), col("ts_us"), col("tag"),
        last(when(col("tag") === 0L, col("event_id")), ignoreNulls = true)
          .over(w).as("match_id"),
        last(when(col("tag") === 0L, col("ts_us")), ignoreNulls = true)
          .over(w).as("match_ts_us"))
      .filter(col("tag") === 1L)
      .select(col("event_id").as("anchor_id"), col("user_id"),
        col("ts_us").as("anchor_ts_us"), col("match_id"), col("match_ts_us"),
        (col("ts_us") - col("match_ts_us")).as("lag_us"))
  }

  /** Oracle twin of [[asofAttribution]] — the identical union-window
    * spelling (DuckDB's own ASOF JOIN keyword is avoided on purpose:
    * its tie-breaking among equal-ts matches is unspecified, and the
    * gate needs bit-identical rows). */
  def asofAttributionSql(anchorType: String = "purchase",
      matchType: String = "view"): String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       |    CASE WHEN event_type = '$anchorType' THEN 1 ELSE 0 END AS tag
       |  FROM events WHERE event_type IN ('$anchorType', '$matchType')
       |), w AS (
       |  SELECT *,
       |    last_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
       |      OVER win AS match_id,
       |    last_value(CASE WHEN tag = 0 THEN ts_us END IGNORE NULLS)
       |      OVER win AS match_ts_us
       |  FROM e
       |  WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, tag, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |)
       |SELECT event_id AS anchor_id, user_id, ts_us AS anchor_ts_us,
       |  match_id, match_ts_us, ts_us - match_ts_us AS lag_us
       |FROM w WHERE tag = 1
       |ORDER BY anchor_id, user_id, anchor_ts_us, match_id, match_ts_us,
       |  lag_us""".stripMargin

  /** Floor-division bucket of an epoch-µs NAMED column — FLOOR, not
    * `DIV` alone (the [[tsUs]] pre-epoch lesson: truncation toward zero
    * puts −1 µs and +1 µs in the same bucket). The pmod subtraction
    * makes the numerator exactly divisible, so the `DIV` afterwards is
    * exact — pure int64 arithmetic, the [[dayOf]] spelling at an
    * arbitrary width. */
  private def bucketOf(c: String, widthUs: Long): Column =
    expr(s"($c - (($c % ${widthUs}L + ${widthUs}L) % ${widthUs}L))" +
      s" DIV ${widthUs}L")

  /** Range join — for each `anchorType` event, the count of
    * `nearType` events ANYWHERE in the system in the trailing
    * `(anchor_ts − window, anchor_ts]` interval ("purchases during an
    * error storm"), plus the latest such timestamp. This is the other
    * operator family Spark lacks (interval/range join), spelled the
    * bucketed way every large engine uses underneath:
    *
    *  - near rows land in ONE time bucket of width = the window;
    *  - each anchor probes exactly TWO buckets (its own and the
    *    previous — a trailing window of width w can only intersect
    *    them), exploded map-side from a 2-element literal array;
    *  - an EQUI-join on the bucket key + the residual range predicate.
    *
    * A near row in range sits in exactly one of the two probed buckets,
    * so each (anchor, near) pair matches ONCE — no post-join dedup.
    * Never the naive spelling (a pure `ON near_ts BETWEEN …` inequality
    * join): with no equi-key Catalyst can only plan a
    * BroadcastNestedLoopJoin — the plan audit forbids it, and at 100 TB
    * it is a cross product. A wider window generalizes by probing
    * ⌈w/bucket⌉+1 buckets; the 2-probe constant here is the w = bucket
    * special case.
    *
    * Scale shape: one equi-shuffle on the bucket key (probe side 2×
    * anchors, build side = near rows); a hot bucket (error storm) is a
    * skewed EQUI-join key, which AQE splits — exactly what it cannot do
    * for a nested-loop range predicate. LEFT join keeps quiet-period
    * anchors with n_near = 0. */
  def nearbyEventCounts(events: DataFrame, anchorType: String = "purchase",
      nearType: String = "error", windowSeconds: Long = 300L): DataFrame = {
    require(windowSeconds >= 1,
      s"nearbyEventCounts needs windowSeconds >= 1 (got $windowSeconds)")
    val winUs = windowSeconds * 1000000L
    val near = events.filter(col("event_type") === nearType)
      .select(col("event_id").as("near_id"), tsUs.as("near_ts_us"))
      .withColumn("bucket", bucketOf("near_ts_us", winUs))
    val probes = events.filter(col("event_type") === anchorType)
      .select(col("event_id").as("anchor_id"), col("user_id"),
        tsUs.as("anchor_ts_us"))
      .withColumn("bucket", explode(array(
        bucketOf("anchor_ts_us", winUs) - 1L,
        bucketOf("anchor_ts_us", winUs))))
    probes.join(near,
        probes("bucket") === near("bucket") &&
          col("near_ts_us") > col("anchor_ts_us") - winUs &&
          col("near_ts_us") <= col("anchor_ts_us"),
        "left")
      .groupBy("anchor_id", "user_id", "anchor_ts_us")
      .agg(count(col("near_id")).as("n_near"),
        max(col("near_ts_us")).as("latest_near_ts_us"))
  }

  /** Oracle twin of [[nearbyEventCounts]] — DuckDB gets the DIRECT
    * inequality join (its IEJoin handles it at oracle scale); the
    * bucketed rewrite is the Spark side's scale spelling, and the gate
    * proves them row-identical. */
  def nearbyEventCountsSql(anchorType: String = "purchase",
      nearType: String = "error", windowSeconds: Long = 300L): String = {
    val winUs = windowSeconds * 1000000L
    s"""WITH a AS (
       |  SELECT event_id AS anchor_id, user_id, epoch_us(ts) AS anchor_ts_us
       |  FROM events WHERE event_type = '$anchorType'
       |), n AS (
       |  SELECT event_id AS near_id, epoch_us(ts) AS near_ts_us
       |  FROM events WHERE event_type = '$nearType'
       |)
       |SELECT anchor_id, user_id, anchor_ts_us,
       |  CAST(count(near_id) AS BIGINT) AS n_near,
       |  max(near_ts_us) AS latest_near_ts_us
       |FROM a LEFT JOIN n ON near_ts_us > anchor_ts_us - $winUs
       |  AND near_ts_us <= anchor_ts_us
       |GROUP BY anchor_id, user_id, anchor_ts_us
       |ORDER BY anchor_id, user_id, anchor_ts_us, n_near,
       |  latest_near_ts_us""".stripMargin
  }

  /** The fixed event-type vocabulary [[eventPivot]] widens over —
    * declared, not discovered: leaving `pivot` values unspecified makes
    * Spark run a corpus-sized distinct+collect pre-pass at PLAN time to
    * find the columns (and makes the output schema data-dependent,
    * which no downstream table contract survives). A new event type is
    * a schema change and should look like one. */
  val PivotTypes: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  /** Hour × event-type PIVOT — the wide activity matrix (one column per
    * type) a dashboard or feature store consumes, the relational PIVOT
    * operator surface: `groupBy(hour).pivot(type, declared).count`,
    * zero-filled. Compiles to ONE partial-aggregated shuffle on the
    * hour key with the per-type counts as conditional aggregates — the
    * same plan as hand-written `sum(when(...))` columns, which is
    * exactly what the oracle twin spells.
    *
    * Scale shape: one shuffle keyed on hour (≤ hours-in-horizon groups,
    * each holding |types| longs); the pivot never widens the shuffle
    * because the column set is declared up front. */
  def eventPivot(events: DataFrame): DataFrame = {
    val hourUs = 3600000000L
    PivotTypes.foldLeft(
      events.select((tsUs - (tsUs % hourUs)).as("hour_us"),
          col("event_type"))
        .groupBy("hour_us")
        .pivot("event_type", PivotTypes)
        .agg(count(lit(1)))
    )((df, t) => df.withColumn(s"n_$t", coalesce(col(t), lit(0L))))
      .select(col("hour_us") +: PivotTypes.map(t => col(s"n_$t")): _*)
  }

  /** Oracle twin of [[eventPivot]] — the conditional-aggregate
    * spelling the pivot compiles to. */
  def eventPivotSql: String = {
    val cols = PivotTypes.map(t =>
      s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t")
      .mkString(",\n  ")
    s"""SELECT epoch_us(ts) - (epoch_us(ts) % 3600000000) AS hour_us,
       |  $cols
       |FROM events
       |GROUP BY 1
       |ORDER BY hour_us, ${PivotTypes.map("n_" + _).mkString(", ")}""".stripMargin
  }

  /** Event-type transition matrix — the user-journey Markov model every
    * product-analytics suite fits: for each ordered pair of event types,
    * how often type B IMMEDIATELY follows type A in some user's
    * event-time sequence, with the conditional transition probability
    * P(B|A) in exact millionths (the [[graft.text.TextAnalysis.lmScore]]
    * integer discipline — no float division until nothing is left to
    * compare across engines). "view mostly leads to click, error leads
    * to error" reads straight off the result; a funnel hypothesis comes
    * FROM this matrix before anyone hard-codes stages into [[funnel]].
    *
    * Adjacency is per user in (ts, event_id) order — the sessionize
    * total order — via ONE lag window on the same user_id partitioning
    * every other per-user operator shares. Each event contributes
    * exactly one transition (from its predecessor); each user's first
    * event contributes none.
    *
    * Scale shape: one user_id shuffle + sort for the lag (the
    * sessionize plan), one partial-agg shuffle collapsing to the
    * ≤ |types|² matrix, then the probability normalization runs as a
    * window over THAT tiny relation — corpus-size-independent. */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val counts = events
      .select(col("user_id"), col("event_id"), tsUs.as("ts_us"),
        col("event_type"))
      .withColumn("from_type", lag("event_type", 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("n_from",
        sum("n").over(Window.partitionBy("from_type")))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(n * 1000000L) div n_from").as("p_millionths"))
  }

  /** Oracle twin of [[eventTransitions]] — same lag/count/window
    * normalization chain. */
  def eventTransitionsSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
       |  FROM events
       |), p AS (
       |  SELECT lag(event_type) OVER
       |      (PARTITION BY user_id ORDER BY ts_us, event_id) AS from_type,
       |    event_type AS to_type
       |  FROM e
       |), c AS (
       |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
       |  FROM p WHERE from_type IS NOT NULL GROUP BY from_type, to_type
       |)
       |SELECT from_type, to_type, n,
       |  CAST((n * 1000000) // sum(n) OVER (PARTITION BY from_type)
       |    AS BIGINT) AS p_millionths
       |FROM c
       |ORDER BY from_type, to_type, n, p_millionths""".stripMargin

  /** Count floor for [[eventJourneys]] — journeys below it are noise
    * rows a dashboard never reads; the filter is DISTRIBUTED (the
    * vocab_mincount lesson: a top-k spelling would be a global
    * TakeOrdered — this is a partial-agg + filter, no total order). */
  val MinJourneyCount: Long = 3L

  /** Common 3-step user journeys — [[eventTransitions]] widened one
    * step: how often the consecutive type sequence (t1 → t2 → t3)
    * appears in some user's event-time order, kept when it appears at
    * least `minCount` times. The "what do users actually do" report
    * product analytics builds funnels FROM; second-order where the
    * transition matrix is first-order, so it distinguishes
    * view→click→purchase from error→click→purchase when the matrix
    * cannot.
    *
    * Scale shape: TWO lag columns over the one shared (user_id, ts,
    * event_id) window sort (one shuffle — both lags ride the same
    * partitioning), then a partial-agg shuffle to ≤ \|types\|³ rows and
    * a map filter. No global order anywhere. */
  def eventJourneys(events: DataFrame,
      minCount: Long = MinJourneyCount): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    events
      .select(col("user_id"), col("event_id"), tsUs.as("ts_us"),
        col("event_type"))
      .withColumn("t2", lag("event_type", 1).over(w))
      .withColumn("t1", lag("event_type", 2).over(w))
      .filter(col("t1").isNotNull)
      .groupBy(col("t1"), col("t2"), col("event_type").as("t3"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Oracle twin of [[eventJourneys]]. */
  def eventJourneysSql(minCount: Long = MinJourneyCount): String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
       |  FROM events
       |), p AS (
       |  SELECT
       |    lag(event_type, 2) OVER
       |      (PARTITION BY user_id ORDER BY ts_us, event_id) AS t1,
       |    lag(event_type, 1) OVER
       |      (PARTITION BY user_id ORDER BY ts_us, event_id) AS t2,
       |    event_type AS t3
       |  FROM e
       |)
       |SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
       |FROM p WHERE t1 IS NOT NULL
       |GROUP BY t1, t2, t3 HAVING count(*) >= $minCount
       |ORDER BY t1, t2, t3, n""".stripMargin

  /** Per-(hour, event_type) Datasketches-HLL user sketches — the
    * MERGEABLE partial aggregate a 100 TB rollup pipeline persists
    * instead of raw ids: exact distinct counts don't re-aggregate (a
    * day's distinct is not the sum of its hours' distincts), so any
    * coarser grain normally means a full rescan of the events store.
    * The sketch column (lgK=12, ~1.6 KB worst case, rel. err ≈ 1.6 %)
    * re-rolls to ANY coarser grain by [[dailyActiveFromSketches]]-style
    * union without touching the raw events again — the standard
    * sketch-cube pattern (Spark's own `hll_sketch_agg` family, public
    * Apache Datasketches).
    *
    * Deliberately NOT an oracle-gated `queries` entry: a sketch
    * estimate is a property of the sketch implementation, not of the
    * data, so a DuckDB twin would pin DuckDB's (different) sketch — the
    * gate that makes sense is behavioral and lives in EventsSpec:
    * exactness in the sparse regime, bounded relative error dense, and
    * union-vs-direct merge consistency. The estimate itself IS
    * deterministic for a given input multiset (HLL registers are
    * max-folds — order- and partitioning-independent), so runs don't
    * flake.
    *
    * Scale shape: one partial-agg shuffle on (hour, type) — map-side
    * sketches combine before the exchange, the whole point of a
    * mergeable aggregate; `n_events` rides the same shuffle free. */
  def hourlyUserSketches(events: DataFrame): DataFrame = {
    val hourUs = 3600000000L
    events.select(
        (tsUs - (tsUs % hourUs)).as("hour_us"),
        col("event_type"), col("user_id"))
      .groupBy("hour_us", "event_type")
      .agg(hll_sketch_agg(col("user_id"), lit(HllLgK)).as("users_hll"),
        count(lit(1)).as("n_events"))
  }

  /** lgConfigK for the sketch family: 2¹² registers. */
  val HllLgK: Int = 12

  /** Re-roll persisted [[hourlyUserSketches]] to per-day distinct-user
    * estimates WITHOUT rescanning events — union the hour sketches
    * under each (day, type) and estimate. Input is the sketch relation
    * (possibly re-read from parquet: the sketch is a plain binary
    * column); cost is one partial-agg shuffle over the ≤ |hours ×
    * types| relation — corpus-size-independent, which is the entire
    * point. */
  def dailyActiveFromSketches(sketches: DataFrame): DataFrame = {
    val dayUs = DayUs
    sketches.select(
        (col("hour_us") - ((col("hour_us") % dayUs + dayUs) % dayUs) )
          .as("day_start_us"),
        col("event_type"), col("users_hll"), col("n_events"))
      .groupBy("day_start_us", "event_type")
      .agg(hll_sketch_estimate(
          hll_union_agg(col("users_hll"), lit(false))).as("est_users"),
        sum("n_events").as("n_events"))
  }

  def topEventsPerUserSql(k: Int = 3): String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       |    CAST(floor(value * 100e0 + 0.5e0) AS BIGINT) AS value_cents
       |  FROM events
       |), ranked AS (
       |  SELECT *, CAST(row_number() OVER
       |    (PARTITION BY user_id ORDER BY value_cents DESC, event_id) AS BIGINT) AS rnk
       |  FROM e
       |)
       |SELECT user_id, rnk, event_id, ts_us, value_cents
       |FROM ranked WHERE rnk <= $k
       |ORDER BY user_id, rnk, event_id, ts_us, value_cents""".stripMargin
}
