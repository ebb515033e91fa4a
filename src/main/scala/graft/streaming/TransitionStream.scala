package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.functions._

/** The last event a user's chain ended on — all a transition needs to
  * continue across triggers. One (Long, Long, String) per user; the
  * event_id rides along so the cross-trigger tie-break is the SAME
  * (ts_us, event_id) total order the batch lag window uses. */
case class TransLast(ts_us: Long, event_id: Long, event_type: String)

/** One emitted transition occurrence: user, the adjacent (from → to)
  * types, and the LATER event's time (the transition "happens" when its
  * second event arrives — also what makes the row joinable back to that
  * event). */
case class TransitionRow(user_id: Long, from_type: String, to_type: String,
    ts_us: Long)

/** The streaming twin of the batch user-journey transition matrix
  * ([[graft.events.Events.eventTransitions]]) — adjacency decided AT
  * INGEST: per user, each arriving event emits one (from_type, to_type)
  * occurrence row against its predecessor in (ts_us, event_id) order,
  * via `flatMapGroupsWithState` (per-event output, the [[AttribStream]]
  * rationale — `mapGroupsWithState` could only surface one row per user
  * per trigger). The matrix itself stays a downstream `groupBy` — the
  * occurrence stream is the reusable artifact (count it windowed, join
  * it to campaigns, feed the Markov fit), exactly how
  * [[DocStream.nearDupIntraStream]] leaves pair aggregation to its
  * consumer.
  *
  * Delivery contract ([[FunnelStream]]'s, verbatim): within a trigger
  * the group's events re-sort by (event time, event_id) before folding,
  * so in-trigger disorder is free; ACROSS triggers each user's events
  * must arrive in event-time order for stream ≡ batch (spec-pinned,
  * including the shuffled-single-trigger case). A cross-trigger
  * straggler older than the stored last event still emits a transition
  * — against the stored last, not its true predecessor; the batch sweep
  * over the horizon is the reconciliation story, the engine-wide
  * stream/batch split.
  *
  * State lifecycle: one [[TransLast]] per user seen (~40 bytes),
  * forward-moving; NoTimeout here, bounded in production by the
  * [[UserActivity]] idle-timeout policy — eviction is orthogonal to the
  * adjacency logic. Each user's first-ever event emits nothing, exactly
  * like the batch lag's first row.
  */
object TransitionStream {

  /** `events(event_id, ts epoch-ns, user_id, event_type, value, props)`
    * stream → transition occurrence rows. Use `OutputMode.Append`. */
  def transitions(events: DataFrame): Dataset[TransitionRow] = {
    implicit val evEnc = Encoders.product[FunnelEvent]
    implicit val stEnc = Encoders.product[TransLast]
    implicit val outEnc = Encoders.product[TransitionRow]
    implicit val longEnc = Encoders.scalaLong
    events.select(col("user_id"),
        graft.events.Events.tsUs.as("ts_us"),
        col("event_id"), col("event_type"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (id: Long, it: Iterator[FunnelEvent],
            state: org.apache.spark.sql.streaming.GroupState[TransLast]) => {
          val ordered = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var last = state.getOption
          val out = Seq.newBuilder[TransitionRow]
          ordered.foreach { e =>
            last.foreach(p =>
              out += TransitionRow(id, p.event_type, e.event_type, e.ts_us))
            last = Some(TransLast(e.ts_us, e.event_id, e.event_type))
          }
          last.foreach(state.update)
          out.result().iterator
        })
  }
}
