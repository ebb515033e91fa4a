package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.functions._

/** One attribution-relevant event after projection (epoch-µs via the
  * shared [[graft.events.Events.tsUs]] arithmetic — batch and stream
  * cannot drift). `tag` carries the batch operator's union ordering key
  * (0 = match/view, 1 = anchor/purchase) so the in-trigger re-sort uses
  * the IDENTICAL total order as the batch window's
  * (ts_us, tag, event_id). */
case class AttribEvent(user_id: Long, ts_us: Long, event_id: Long, tag: Long)

/** Per-user attribution state: the most recent match event seen, 16
  * bytes, [[FunnelStream.Unset]]-style sentinel when none yet. Unlike
  * the funnel's forward-only triple this state is LAST-WRITER (each new
  * view replaces the previous), but it is still monotone in event time
  * under ordered delivery — which is what makes it streamable. */
case class AttribState(match_id: Long, match_ts_us: Long)

/** Emitted once per anchor event: the batch
  * [[graft.events.Events.asofAttribution]] row shape. */
case class Attribution(anchor_id: Long, user_id: Long, anchor_ts_us: Long,
    match_id: Option[Long], match_ts_us: Option[Long], lag_us: Option[Long])

/** The streaming twin of the batch as-of join
  * ([[graft.events.Events.asofAttribution]]) — last-touch attribution
  * decided AT INGEST: per user, a 16-byte "most recent view" state;
  * every purchase flowing past emits one attribution row against it.
  * `flatMapGroupsWithState` rather than [[FunnelStream]]'s
  * `mapGroupsWithState` because the output is per ANCHOR EVENT, not per
  * user per trigger (a trigger carrying three purchases emits three
  * rows).
  *
  * Delivery contract (the [[FunnelStream]] contract, test-pinned):
  * within a trigger the group's events re-sort by (ts_us, tag,
  * event_id) — the batch window's exact total order, so equal-ts
  * view-before-purchase ties and the largest-event_id-wins rule hold
  * bit-identically; ACROSS triggers each user's events must arrive in
  * event-time order for stream ≡ batch. A view arriving in a later
  * trigger with an EARLIER timestamp than an already-emitted purchase
  * cannot retro-attribute it (emitted rows are immutable); re-running
  * the batch operator over the horizon is the reconciliation story,
  * exactly as for the funnel and the dedup family.
  *
  * State lifecycle: NoTimeout (16 bytes × |users seen|); a production
  * deployment bounds it with the [[UserActivity]] idle timeout —
  * eviction policy is orthogonal to the attribution logic. */
object AttribStream {

  /** Long.MinValue, not -1 — the [[FunnelStream.Unset]] rationale:
    * epoch-µs -1 is a legitimate pre-epoch event time. */
  private[streaming] val Unset = Long.MinValue

  /** `events(event_id, ts epoch-ns, user_id, event_type, value, props)`
    * stream → one attribution row per `anchorType` event. Use
    * `OutputMode.Append`. */
  def attributions(events: DataFrame, anchorType: String = "purchase",
      matchType: String = "view"): Dataset[Attribution] = {
    require(anchorType != matchType,
      s"attributions needs distinct event types (got '$anchorType' twice)")
    implicit val evEnc = Encoders.product[AttribEvent]
    implicit val stEnc = Encoders.product[AttribState]
    implicit val outEnc = Encoders.product[Attribution]
    implicit val longEnc = Encoders.scalaLong
    events
      .filter(col("event_type").isin(anchorType, matchType))
      .select(col("user_id"),
        graft.events.Events.tsUs.as("ts_us"),
        col("event_id"),
        when(col("event_type") === anchorType, lit(1L)).otherwise(lit(0L))
          .as("tag"))
      .as[AttribEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (id: Long, it: Iterator[AttribEvent], state: GroupState[AttribState]) => {
          var st = state.getOption.getOrElse(AttribState(Unset, Unset))
          val out = Seq.newBuilder[Attribution]
          // in-trigger re-sort: the iterator carries no order guarantee;
          // (ts_us, tag, event_id) is the batch window's total order
          for (e <- it.toSeq.sortBy(e => (e.ts_us, e.tag, e.event_id))) {
            if (e.tag == 0L) st = AttribState(e.event_id, e.ts_us)
            else if (st.match_ts_us == Unset)
              out += Attribution(e.event_id, id, e.ts_us, None, None, None)
            else
              out += Attribution(e.event_id, id, e.ts_us,
                Some(st.match_id), Some(st.match_ts_us),
                Some(e.ts_us - st.match_ts_us))
          }
          state.update(st)
          out.result().iterator
        })
  }
}
