package graft.events

import org.apache.spark.sql.DataFrame

/** The event-analytics family as SPARK SQL over a registered `events`
  * view — the second domain of the SQL entry surface (the graph family
  * is [[graft.graph.GraphSql]]): each spelling is written to OPTIMIZE
  * TO THE SAME PHYSICAL PLAN as its [[Events]] DataFrame twin
  * (GraphSqlSpec's sweep asserts canonicalized plan equality plus
  * result agreement for every `sqlQueries` entry), so SQL users inherit
  * the single-user_id-partitioning funnel chain, the sessionize
  * one-shuffle window pair, and the day arithmetic unchanged.
  *
  * Spellings mirror the DataFrame construction expression-for-
  * expression: the shared epoch-µs floor ([[Events.tsUs]]), the exact
  * integer cents fold, the pmod day index, `L`-suffixed long literals
  * and `D`-suffixed doubles where the DataFrame side uses typed
  * literals (the GraphSql `3.0D` lesson — "same result" and "same
  * plan" are held apart by a literal's parsed type).
  *
  * Deliberately absent, with the reason each time: `events_wau` (its
  * span cap rides a localCheckpoint — the constant-key discipline — and
  * no single SQL text expresses that, the same boundary that keeps the
  * iterative graph family DataFrame-only) and `events_funnel` (probed:
  * the result-identical SQL spelling optimizes to a DIFFERENT physical
  * plan — CTE statistics flip the stage-3 join's broadcast side — and a
  * join hint to force it back would make the spelling a second plan to
  * maintain, exactly what this surface exists to avoid). */
object EventsSql {

  /** Register the event relation as the `events` temp view. */
  def registerEvents(events: DataFrame, view: String = "events"): Unit =
    events.createOrReplaceTempView(view)

  /** The [[Events.tsUs]] expression as SQL text (identical string —
    * `expr` parses the same tree either way). */
  private val tsUs = "CAST((ts - pmod(ts, 1000)) DIV 1000 AS BIGINT)"

  /** The [[Events.valueCents]] fold with the D-suffixed double
    * literals the Column spelling carries. */
  private val valueCents = "floor(value * 100.0D + 0.5D)"

  /** The [[Events.propsK]] ANSI-safe JSON extraction. */
  private val propsK = "try_cast(get_json_object(props, '$.k') AS BIGINT)"

  /** [[Events.hourlyRollup]] as SQL. */
  def hourlyRollupSql(view: String = "events"): String = {
    val hourUs = 3600000000L
    s"""SELECT hour_us, event_type, count(1) AS n_events,
       |  count(DISTINCT user_id) AS n_users,
       |  sum(value_cents) AS sum_value_cents, sum(k) AS sum_k
       |FROM (
       |  SELECT $tsUs - ($tsUs % ${hourUs}L) AS hour_us, event_type, user_id,
       |    $valueCents AS value_cents, $propsK AS k
       |  FROM $view
       |)
       |GROUP BY hour_us, event_type""".stripMargin
  }

  /** [[Events.sessionize]] as SQL — the same lag-flag + running-sum
    * window pair over ONE user_id partitioning. */
  def sessionizeSql(gapSeconds: Long = 14400L,
      view: String = "events"): String = {
    val gapUs = gapSeconds * 1000000L
    s"""WITH e AS (
       |  SELECT user_id, event_id, $tsUs AS ts_us, $valueCents AS value_cents
       |  FROM $view
       |),
       |flagged AS (
       |  SELECT *, CASE WHEN ts_us - lag(ts_us, 1) OVER
       |      (PARTITION BY user_id ORDER BY ts_us, event_id) > ${gapUs}L
       |    THEN 1L ELSE 0L END AS new_sess
       |  FROM e
       |),
       |numbered AS (
       |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
       |    ORDER BY ts_us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
       |  FROM flagged
       |)
       |SELECT user_id, session_seq, count(1) AS n_events,
       |  min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
       |  sum(value_cents) AS sum_value_cents
       |FROM numbered GROUP BY user_id, session_seq""".stripMargin
  }

  /** [[Events.topEventsPerUser]] as SQL. */
  def topEventsPerUserSql(k: Int = 3, view: String = "events"): String =
    s"""SELECT user_id, rnk, event_id, ts_us, value_cents FROM (
       |  SELECT user_id, event_id, ts_us, value_cents,
       |    CAST(row_number() OVER (PARTITION BY user_id
       |      ORDER BY value_cents DESC, event_id) AS BIGINT) AS rnk
       |  FROM (
       |    SELECT user_id, event_id, $tsUs AS ts_us, $valueCents AS value_cents
       |    FROM $view
       |  )
       |) WHERE rnk <= $k""".stripMargin

  /** [[Events.retention]] as SQL — the pmod day index verbatim. */
  def retentionSql(view: String = "events"): String = {
    val day = Events.dayOf("ts_us", "DIV")
    s"""WITH days AS (
       |  SELECT DISTINCT user_id, $day AS day FROM (
       |    SELECT user_id, $tsUs AS ts_us FROM $view
       |  )
       |),
       |first AS (
       |  SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id
       |)
       |SELECT cohort_day, offset_days, count(1) AS n_users FROM (
       |  SELECT cohort_day, day - cohort_day AS offset_days
       |  FROM days JOIN first USING (user_id)
       |)
       |GROUP BY cohort_day, offset_days""".stripMargin
  }

  /** [[Events.asofAttribution]] as SQL — the identical union-tag +
    * running `last(..., true)` window pair (ignoreNulls as the boolean
    * second argument, Spark's spelling). */
  def asofAttributionSql(anchorType: String = "purchase",
      matchType: String = "view", view: String = "events"): String =
    s"""SELECT event_id AS anchor_id, user_id, ts_us AS anchor_ts_us,
       |  match_id, match_ts_us, ts_us - match_ts_us AS lag_us
       |FROM (
       |  SELECT *,
       |    last(CASE WHEN tag = 0L THEN event_id END, true) OVER win
       |      AS match_id,
       |    last(CASE WHEN tag = 0L THEN ts_us END, true) OVER win
       |      AS match_ts_us
       |  FROM (
       |    SELECT user_id, event_id, $tsUs AS ts_us,
       |      CASE WHEN event_type = '$anchorType' THEN 1L ELSE 0L END AS tag
       |    FROM $view WHERE event_type IN ('$anchorType', '$matchType')
       |  )
       |  WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, tag, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |)
       |WHERE tag = 1L""".stripMargin

  /** [[Events.nearbyEventCounts]] as SQL — the same two-bucket probe
    * explode + equi-join with the residual range predicate. */
  def nearbyEventCountsSql(anchorType: String = "purchase",
      nearType: String = "error", windowSeconds: Long = 300L,
      view: String = "events"): String = {
    val winUs = windowSeconds * 1000000L
    def bucketOf(c: String) =
      s"($c - (($c % ${winUs}L + ${winUs}L) % ${winUs}L)) DIV ${winUs}L"
    s"""SELECT anchor_id, user_id, anchor_ts_us,
       |  count(near_id) AS n_near, max(near_ts_us) AS latest_near_ts_us
       |FROM (
       |  SELECT p.*, explode(array(${bucketOf("anchor_ts_us")} - 1L,
       |    ${bucketOf("anchor_ts_us")})) AS bucket
       |  FROM (
       |    SELECT event_id AS anchor_id, user_id, $tsUs AS anchor_ts_us
       |    FROM $view WHERE event_type = '$anchorType'
       |  ) p
       |) probes
       |LEFT JOIN (
       |  SELECT *, ${bucketOf("near_ts_us")} AS bucket FROM (
       |    SELECT event_id AS near_id, $tsUs AS near_ts_us
       |    FROM $view WHERE event_type = '$nearType'
       |  )
       |) near
       |ON probes.bucket = near.bucket
       |  AND near_ts_us > anchor_ts_us - ${winUs}L
       |  AND near_ts_us <= anchor_ts_us
       |GROUP BY anchor_id, user_id, anchor_ts_us""".stripMargin
  }

  /** [[Events.eventTransitions]] as Spark SQL — the lag/count/window
    * normalization chain verbatim. */
  def eventTransitionsSparkSql(view: String = "events"): String =
    s"""SELECT from_type, to_type, n,
       |  (n * 1000000L) div n_from AS p_millionths
       |FROM (
       |  SELECT from_type, to_type, n,
       |    sum(n) OVER (PARTITION BY from_type) AS n_from
       |  FROM (
       |    SELECT from_type, event_type AS to_type, count(1) AS n
       |    FROM (
       |      SELECT *, lag(event_type, 1) OVER
       |          (PARTITION BY user_id ORDER BY ts_us, event_id) AS from_type
       |      FROM (
       |        SELECT user_id, event_id, $tsUs AS ts_us, event_type FROM $view
       |      )
       |    )
       |    WHERE from_type IS NOT NULL
       |    GROUP BY from_type, event_type
       |  )
       |)""".stripMargin
}
