package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.functions._

/** One input event after projection (epoch-µs time, exact cents). */
case class UserEvent(user_id: Long, ts_us: Long, value_cents: Long)

/** The custom per-user state: a running activity summary. */
case class UserActivityState(n_events: Long, first_us: Long, last_us: Long,
    sum_value_cents: Long)

/** Emitted row: the summary, flagged final when the idle timeout fired. */
case class UserActivitySummary(user_id: Long, n_events: Long, first_us: Long,
    last_us: Long, sum_value_cents: Long, is_final: Boolean)

/** Custom streaming state via `mapGroupsWithState` — the escape hatch for
  * state machines the built-in operators (`window`, `session_window`,
  * `dropDuplicatesWithinWatermark`) cannot express. Here: a per-user
  * running activity summary that emits an updated row per micro-batch
  * and a FINAL row when the user goes idle past `idleTimeout` (processing
  * time), after which state is dropped — bounded state, explicit
  * lifecycle, exactly the shape a custom sessionizer/limiter/enricher
  * plugs into. The per-user totals are pinned against the batch
  * aggregates in `EventStreamSpec`.
  */
object UserActivity {

  private def updateState(userId: Long, events: Iterator[UserEvent],
      state: GroupState[UserActivityState], idleTimeoutMs: Long): UserActivitySummary = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      UserActivitySummary(userId, s.n_events, s.first_us, s.last_us,
        s.sum_value_cents, is_final = true)
    } else {
      val prev = state.getOption.getOrElse(UserActivityState(0L, Long.MaxValue, Long.MinValue, 0L))
      val next = events.foldLeft(prev) { (acc, e) =>
        UserActivityState(acc.n_events + 1, math.min(acc.first_us, e.ts_us),
          math.max(acc.last_us, e.ts_us), acc.sum_value_cents + e.value_cents)
      }
      state.update(next)
      state.setTimeoutDuration(idleTimeoutMs)
      UserActivitySummary(userId, next.n_events, next.first_us, next.last_us,
        next.sum_value_cents, is_final = false)
    }
  }

  /** `events(event_id, ts epoch-ns, user_id, event_type, value, props)`
    * stream → per-user running summaries. Use `OutputMode.Update`. */
  def summaries(events: DataFrame, idleTimeoutMs: Long = 3600000L): Dataset[UserActivitySummary] = {
    implicit val evEnc = Encoders.product[UserEvent]
    implicit val outEnc = Encoders.product[UserActivitySummary]
    implicit val stEnc = Encoders.product[UserActivityState]
    implicit val longEnc = Encoders.scalaLong
    events.select(col("user_id"),
        graft.events.Events.tsUs.as("ts_us"),
        graft.events.Events.valueCents.cast("long").as("value_cents"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.ProcessingTimeTimeout)(
        (id: Long, it: Iterator[UserEvent], st: GroupState[UserActivityState]) =>
          updateState(id, it, st, idleTimeoutMs))
  }
}
