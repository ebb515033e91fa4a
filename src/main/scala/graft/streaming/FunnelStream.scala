package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.functions._

/** One funnel-relevant event after projection (epoch-µs, the shared
  * [[graft.events.Events.tsUs]] arithmetic — batch and stream cannot
  * drift). */
case class FunnelEvent(user_id: Long, ts_us: Long, event_id: Long,
    event_type: String)

/** Per-user funnel state: the three sequential first-times,
  * [[FunnelStream.Unset]] (Long.MinValue — no representable event time;
  * -1 would collide with 1969-12-31T23:59:59.999999Z) = unset. 24 bytes
  * per user, FIXED — the state can only move forward (unset → set,
  * values never change once set), which is what makes the funnel
  * state-machine streamable at all. */
case class FunnelState(t1_us: Long, t2_us: Long, t3_us: Long)

/** Emitted per user per trigger: the batch [[graft.events.Events.funnel]]
  * row shape (nullable stage times + the stage index reached). */
case class FunnelProgress(user_id: Long, t1_us: Option[Long],
    t2_us: Option[Long], t3_us: Option[Long], stage: Long)

/** The streaming twin of the batch ordered funnel
  * ([[graft.events.Events.funnel]]) — stage progression decided AT
  * INGEST instead of by a nightly sweep, via `mapGroupsWithState` (the
  * custom-state escape hatch, [[UserActivity]]'s shape): per user, a
  * 24-byte forward-only state machine takes the first stage-1 time, the
  * first stage-2 time strictly after it, and the first stage-3 time
  * strictly after that.
  *
  * Delivery contract (documented, test-pinned): within a trigger the
  * group's events are re-sorted by (event time, event_id) before
  * folding, so in-trigger disorder is free; ACROSS triggers each user's
  * events must arrive in event-time order for stream ≡ batch. The
  * forward-only state cannot re-open a decided stage — a stage-1 event
  * arriving in a later trigger with an EARLIER timestamp than the
  * recorded t1 is ignored (the batch sweep would recompute; re-running
  * batch over the horizon is the reconciliation story, exactly as for
  * the dedup family's stream/batch split). Equality with the batch
  * operator on ordered delivery is pinned in EventStreamSpec, including
  * the out-of-order-within-a-trigger case.
  *
  * State lifecycle: NoTimeout here (state is 24 bytes × |users seen|);
  * a production deployment bounds it with the [[UserActivity]] idle
  * timeout — the eviction policy is orthogonal to the funnel logic. */
object FunnelStream {

  /** Long.MinValue, not -1: epoch-µs -1 is a legitimate pre-epoch event
    * time the batch funnel handles, and a sentinel colliding with it
    * would silently re-open a decided stage. MinValue is ~292 million
    * years before the epoch — no representable input reaches it. */
  private[streaming] val Unset = Long.MinValue

  /** `events(event_id, ts epoch-ns, user_id, event_type, value, props)`
    * stream → per-user funnel progress rows. Use `OutputMode.Update`. */
  def progress(events: DataFrame,
      stages: Seq[String] = graft.events.Events.FunnelStages)
      : Dataset[FunnelProgress] = {
    require(stages.length == 3, s"funnel wants exactly 3 stages (got $stages)")
    val (s1, s2, s3) = (stages(0), stages(1), stages(2))
    implicit val evEnc = Encoders.product[FunnelEvent]
    implicit val stEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[FunnelProgress]
    implicit val longEnc = Encoders.scalaLong
    events.select(col("user_id"),
        graft.events.Events.tsUs.as("ts_us"),
        col("event_id"), col("event_type"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (id: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState]) => {
          val prev = state.getOption.getOrElse(FunnelState(Unset, Unset, Unset))
          // in-trigger re-sort: the iterator carries no order guarantee
          val next = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
            .foldLeft(prev) { (acc, e) =>
              if (acc.t1_us == Unset)
                if (e.event_type == s1) acc.copy(t1_us = e.ts_us) else acc
              else if (acc.t2_us == Unset)
                if (e.event_type == s2 && e.ts_us > acc.t1_us)
                  acc.copy(t2_us = e.ts_us) else acc
              else if (acc.t3_us == Unset)
                if (e.event_type == s3 && e.ts_us > acc.t2_us)
                  acc.copy(t3_us = e.ts_us) else acc
              else acc
            }
          state.update(next)
          def opt(v: Long): Option[Long] = if (v == Unset) None else Some(v)
          val stage =
            if (next.t3_us != Unset) 3L
            else if (next.t2_us != Unset) 2L
            else if (next.t1_us != Unset) 1L
            else 0L
          FunnelProgress(id, opt(next.t1_us), opt(next.t2_us),
            opt(next.t3_us), stage)
        })
  }
}
