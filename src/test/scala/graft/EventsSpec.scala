package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.events.Events

class EventsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  /** ts is epoch-NANOS (the nanosAsLong read shape of the fixture). */
  def events(rows: (Long, Long, Long, String, Double, String)*) =
    rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  val T: Long = 1704067200L * 1000000000L // 2024-01-01T00:00:00Z in ns
  val H: Long = 3600L * 1000000000L       // one hour in ns

  test("golden: gap sessionization splits on idle > 4h, aggregates exact cents") {
    val out = Events.sessionize(events(
      (0L, T, 1L, "view", 1.00, "{}"),
      (1L, T + H, 1L, "click", 2.23, "{}"),      // 1h gap → same session
      (2L, T + 10 * H, 1L, "view", 3.00, "{}"),  // 9h gap → new session
      (3L, T, 2L, "view", 5.55, "{}")))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("session_start_us"),
          r.getAs[Long]("session_end_us"), r.getAs[Long]("sum_value_cents"))).toMap
    assert(out.size === 3)
    assert(out((1L, 0L)) === (2L, T / 1000, (T + H) / 1000, 323L)) // 100 + 223
    assert(out((1L, 1L)) === (1L, (T + 10 * H) / 1000, (T + 10 * H) / 1000, 300L))
    assert(out((2L, 0L)) === (1L, T / 1000, T / 1000, 555L))
  }

  test("golden: hourly rollup groups by integer hour, extracts props.k") {
    val out = Events.hourlyRollup(events(
      (0L, T + 1, 1L, "view", 1.00, """{"k": 5}"""),
      (1L, T + 2, 2L, "view", 2.00, """{"k": 7}"""),
      (2L, T + 3, 1L, "view", 3.00, """{"k": 1}"""),
      (3L, T + H, 1L, "click", 4.00, """{"k": 2}""")))
      .collect().map(r => (r.getAs[Long]("hour_us"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_users"),
          r.getAs[Long]("sum_value_cents"), r.getAs[Long]("sum_k"))).toMap
    val h0 = T / 1000
    assert(out((h0, "view")) === (3L, 2L, 600L, 13L))
    assert(out((h0 + 3600000000L, "click")) === (1L, 1L, 400L, 2L))
  }

  test("sessionization is stable under input order") {
    val rows = Seq(
      (0L, T, 1L, "view", 1.0, "{}"),
      (1L, T + H, 1L, "view", 1.0, "{}"),
      (2L, T + 10 * H, 1L, "view", 1.0, "{}"))
    val a = Events.sessionize(events(rows: _*)).collect().toSet
    val b = Events.sessionize(events(rows.reverse: _*)).collect().toSet
    assert(a === b)
  }

  test("hourly rollup tolerates non-integer and malformed props.k (ANSI-safe)") {
    // Spark 4 defaults to ANSI mode, where a plain cast('5.7' as long)
    // kills the job; try_cast must map these to NULL (excluded from sum_k)
    val out = Events.hourlyRollup(events(
      (0L, T, 1L, "view", 1.00, """{"k": 5}"""),
      (1L, T + 1, 1L, "view", 1.00, """{"k": 5.7}"""),
      (2L, T + 2, 1L, "view", 1.00, """{"k": "abc"}"""),
      (3L, T + 3, 1L, "view", 1.00, "not json")))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("sum_k"))).toMap
    assert(out("view") === (4L, 5L))
  }

  test("topEventsPerUser ranks by value desc with event_id tiebreak, bounded at k") {
    val out = Events.topEventsPerUser(events(
      (0L, T, 1L, "buy", 5.00, "{}"),
      (1L, T + 1, 1L, "buy", 9.00, "{}"),
      (2L, T + 2, 1L, "buy", 9.00, "{}"), // tie with 1 → later event_id ranks lower
      (3L, T + 3, 1L, "buy", 1.00, "{}"),
      (4L, T + 4, 1L, "buy", 0.50, "{}"), // 5th → cut at k=3
      (5L, T, 2L, "buy", 2.00, "{}")), k = 3)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("rnk")) ->
        r.getAs[Long]("event_id")).toMap
    assert(out((1L, 1L)) === 1L)
    assert(out((1L, 2L)) === 2L)
    assert(out((1L, 3L)) === 0L)
    assert(out((2L, 1L)) === 5L)
    assert(out.size === 4) // user 1 capped at 3, user 2 has 1
  }

  def funnelOf(rows: (Long, Long, Long, String, Double, String)*)
      : Map[Long, (Option[Long], Option[Long], Option[Long], Long)] =
    Events.funnel(events(rows: _*)).collect().map { r =>
      def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      r.getAs[Long]("user_id") -> ((opt(1), opt(2), opt(3), r.getAs[Long]("stage")))
    }.toMap

  test("funnel golden: sequential stages, with each partial depth") {
    val out = funnelOf(
      // user 1 completes in order
      (0L, T, 1L, "view", 0.0, "{}"),
      (1L, T + H, 1L, "click", 0.0, "{}"),
      (2L, T + 2 * H, 1L, "purchase", 0.0, "{}"),
      // user 2 stalls after the click
      (3L, T, 2L, "view", 0.0, "{}"),
      (4L, T + H, 2L, "click", 0.0, "{}"),
      // user 3 only views
      (5L, T, 3L, "view", 0.0, "{}"),
      // user 4 never views
      (6L, T, 4L, "click", 0.0, "{}"))
    val t = T / 1000; val h = H / 1000
    assert(out(1L) === ((Some(t), Some(t + h), Some(t + 2 * h), 3L)))
    assert(out(2L) === ((Some(t), Some(t + h), None, 2L)))
    assert(out(3L) === ((Some(t), None, None, 1L)))
    assert(out(4L) === ((None, None, None, 0L)))
  }

  test("funnel: out-of-order events don't count (a purchase before the view)") {
    // purchase, THEN view, THEN click: the purchase precedes t2, so the
    // funnel stops at stage 2 — the property a per-type min gets wrong
    val out = funnelOf(
      (0L, T, 1L, "purchase", 0.0, "{}"),
      (1L, T + H, 1L, "view", 0.0, "{}"),
      (2L, T + 2 * H, 1L, "click", 0.0, "{}"))
    assert(out(1L) === ((Some((T + H) / 1000), Some((T + 2 * H) / 1000), None, 2L)))
    // and a second purchase after the click completes it
    val done = funnelOf(
      (0L, T, 1L, "purchase", 0.0, "{}"),
      (1L, T + H, 1L, "view", 0.0, "{}"),
      (2L, T + 2 * H, 1L, "click", 0.0, "{}"),
      (3L, T + 3 * H, 1L, "purchase", 0.0, "{}"))
    assert(done(1L)._4 === 3L)
  }

  test("funnel: stage-2 min is the first qualifying event, not the global min") {
    // two clicks: one before the first view (disqualified), one after
    val out = funnelOf(
      (0L, T, 1L, "click", 0.0, "{}"),
      (1L, T + H, 1L, "view", 0.0, "{}"),
      (2L, T + 5 * H, 1L, "click", 0.0, "{}"))
    assert(out(1L)._2 === Some((T + 5 * H) / 1000))
  }

  test("funnelWindowed: the window truncates stages; wide window equals funnel") {
    val rows = Seq(
      // user 1: click at +1h (inside a 2h window), purchase at +3h (outside)
      (0L, T, 1L, "view", 0.0, "{}"),
      (1L, T + H, 1L, "click", 0.0, "{}"),
      (2L, T + 3 * H, 1L, "purchase", 0.0, "{}"),
      // user 2: click only at +3h — outside the window entirely
      (3L, T, 2L, "view", 0.0, "{}"),
      (4L, T + 3 * H, 2L, "click", 0.0, "{}"))
    val out = Events.funnelWindowed(events(rows: _*), windowSeconds = 7200L)
      .collect().map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        r.getAs[Long]("user_id") -> ((opt(1), opt(2), opt(3), r.getAs[Long]("stage")))
      }.toMap
    val t = T / 1000; val h = H / 1000
    assert(out(1L) === ((Some(t), Some(t + h), None, 2L)))
    assert(out(2L) === ((Some(t), None, None, 1L)))
    // a window wider than the data span reproduces the unbounded funnel
    val wide = Events.funnelWindowed(events(rows: _*), windowSeconds = 864000L)
      .collect().map(_.toSeq).toSet
    val unbounded = Events.funnel(events(rows: _*)).collect().map(_.toSeq).toSet
    assert(wide === unbounded)
  }

  test("funnelWindowed: the window anchors at t1, not at t2") {
    // click at +1h, purchase at +2.5h: inside 2h of the CLICK but
    // outside 2h of the first view — must not count
    val rows = Seq(
      (0L, T, 1L, "view", 0.0, "{}"),
      (1L, T + H, 1L, "click", 0.0, "{}"),
      (2L, T + 5 * H / 2, 1L, "purchase", 0.0, "{}"))
    val out = Events.funnelWindowed(events(rows: _*), windowSeconds = 7200L)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("stage")).toMap
    assert(out(1L) === 2L)
  }

  val D: Long = 24L * H // one day in ns

  test("retention golden: day-zero cohort sizes and comeback offsets") {
    val out = Events.retention(events(
      // user 1: active day 0 and day 2; twice on day 0 (counts once)
      (0L, T, 1L, "view", 0.0, "{}"),
      (1L, T + H, 1L, "click", 0.0, "{}"),
      (2L, T + 2 * D, 1L, "view", 0.0, "{}"),
      // user 2: same cohort day, never returns
      (3L, T + 2 * H, 2L, "view", 0.0, "{}"),
      // user 3: cohort day 1, returns day 2 (offset 1)
      (4L, T + D, 3L, "view", 0.0, "{}"),
      (5L, T + 2 * D, 3L, "view", 0.0, "{}")))
      .collect().map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("offset_days"))
        -> r.getAs[Long]("n_users")).toMap
    val d0 = T / 1000 / 86400000000L
    assert(out === Map(
      (d0, 0L) -> 2L, (d0, 2L) -> 1L,
      (d0 + 1, 0L) -> 1L, (d0 + 1, 1L) -> 1L))
  }

  test("rollingActiveUsers golden: trailing window, distinct users, span cap") {
    val out = Events.rollingActiveUsers(events(
      // user 1 active day 0 (twice — counts once) and day 8
      (0L, T, 1L, "view", 0.0, "{}"),
      (1L, T + H, 1L, "click", 0.0, "{}"),
      (2L, T + 8 * D, 1L, "view", 0.0, "{}"),
      // user 2 active day 1 only
      (3L, T + D, 2L, "view", 0.0, "{}")))
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Long]("n_active")).toMap
    val d0 = T / 1000 / 86400000000L
    // days 0..6 see user 1 (day-0 activity); days 1..7 see user 2;
    // day 8 sees user 1 again; days past the last observed day (8) are
    // capped out
    assert(out === Map(
      d0 -> 1L, (d0 + 1) -> 2L, (d0 + 2) -> 2L, (d0 + 3) -> 2L,
      (d0 + 4) -> 2L, (d0 + 5) -> 2L, (d0 + 6) -> 2L, (d0 + 7) -> 1L,
      (d0 + 8) -> 1L))
  }

  test("rollingActiveUsers: window 1 is exactly the daily-active count") {
    val rows = (0 until 30).map(i =>
      (i.toLong, T + (i % 5) * D + (i % 7) * H, (i % 4).toLong, "view", 0.0, "{}"))
    val wau1 = Events.rollingActiveUsers(events(rows: _*), windowDays = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val daily = Events.retention(events(rows: _*)) // reuse: days relation twin
    // independent recomputation from the raw rows
    val expect = rows.groupBy { case (_, ts, _, _, _, _) => ts / 1000 / 86400000000L }
      .map { case (d, rs) => (d, rs.map(_._3).distinct.size.toLong) }.toSet
    assert(wau1 === expect)
    assert(daily.count() > 0) // retention sanity on the same fixture
  }

  test("stickiness golden: dau over trailing window; zero-dau days present") {
    // day 0: users 1, 2; day 2: user 1 — window 3 covers days 0..4
    // (capped at 2): mau(0)=2, mau(1)=2, mau(2)=2; dau(1)=0
    val out = Events.stickiness(events(
        (0L, T, 1L, "view", 0.0, "{}"),
        (1L, T + H, 2L, "view", 0.0, "{}"),
        (2L, T + 2 * D, 1L, "view", 0.0, "{}")), windowDays = 3)
      .collect().map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("dau"), r.getAs[Long]("mau"),
          r.getAs[Long]("stickiness_millionths"))).toMap
    val d0 = T / 1000 / 86400000000L
    assert(out === Map(
      d0 -> ((2L, 2L, 1000000L)),
      (d0 + 1) -> ((0L, 2L, 0L)),
      (d0 + 2) -> ((1L, 2L, 500000L))))
  }

  test("stickiness at window 1 is identically 1.0 on active days") {
    import org.apache.spark.sql.functions.col
    val rows = (0 until 25).map(i =>
      (i.toLong, T + (i % 6) * D + (i % 4) * H, (i % 5).toLong, "view", 0.0, "{}"))
    val out = Events.stickiness(events(rows: _*), windowDays = 1)
    assert(out.filter(col("stickiness_millionths") =!= 1000000L).count() === 0L)
  }

  test("retention: offset 0 counts every user exactly once") {
    import org.apache.spark.sql.functions.{col, sum}
    val rows = (0 until 40).map(i =>
      (i.toLong, T + (i % 7) * D + (i % 5) * H, (i % 11).toLong, "view", 0.0, "{}"))
    val total = Events.retention(events(rows: _*))
      .filter(col("offset_days") === 0L)
      .agg(sum("n_users")).first().getLong(0)
    assert(total === rows.map(_._3).distinct.size.toLong)
  }

  test("asof golden: last prior view wins; equal-ts view counts; no-match keeps NULLs") {
    val out = Events.asofAttribution(events(
      (0L, T, 1L, "view", 0.0, "{}"),
      (1L, T + H, 1L, "view", 0.0, "{}"),
      (2L, T + 2 * H, 1L, "purchase", 9.0, "{}"),   // → view 1
      (3L, T + 3 * H, 1L, "view", 0.0, "{}"),       // AFTER purchase 2 — must not attach to it
      (4L, T + 3 * H, 1L, "purchase", 9.0, "{}"),   // equal-ts view 3 counts as prior
      (5L, T, 2L, "purchase", 9.0, "{}"),           // user 2 has no view at all
      (6L, T + H, 3L, "view", 0.0, "{}"),
      (7L, T, 3L, "purchase", 9.0, "{}")))          // view is strictly later → NULL
      .collect().map(r => r.getAs[Long]("anchor_id") ->
        (Option(r.getAs[java.lang.Long]("match_id")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("lag_us")).map(_.toLong))).toMap
    assert(out.size === 4)
    assert(out(2L) === (Some(1L), Some(H / 1000)))
    assert(out(4L) === (Some(3L), Some(0L)))
    assert(out(5L) === (None, None))
    assert(out(7L) === (None, None))
  }

  test("asof tie among equal-ts views: the largest event_id wins") {
    val out = Events.asofAttribution(events(
      (10L, T, 1L, "view", 0.0, "{}"),
      (11L, T, 1L, "view", 0.0, "{}"),
      (12L, T + 1, 1L, "purchase", 9.0, "{}")))
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("match_id") === 11L)
  }

  test("asof equals the naive per-anchor argmax on mixed traffic") {
    val rows = (0 until 120).map { i =>
      val typ = (i % 4) match {
        case 0 => "purchase"; case 3 => "click"; case _ => "view"
      }
      (i.toLong, T + ((i * 37) % 50) * H, (i % 5).toLong, typ, 1.0, "{}")
    }
    val df = events(rows: _*)
    val got = Events.asofAttribution(df).collect()
      .map(r => r.getAs[Long]("anchor_id") ->
        Option(r.getAs[java.lang.Long]("match_id")).map(_.toLong)).toMap
    // naive: for each purchase, among views of the same user with
    // ts <= purchase ts, the (ts, event_id)-max
    val views = rows.filter(_._4 == "view")
    val expected = rows.filter(_._4 == "purchase").map { p =>
      val prior = views.filter(v => v._3 == p._3 && v._2 <= p._2)
      p._1 -> (if (prior.isEmpty) None
               else Some(prior.maxBy(v => (v._2, v._1))._1))
    }.toMap
    assert(got === expected)
  }

  test("nearby golden: trailing window boundaries are (t-w, t]") {
    val S: Long = 1000000000L // one second in ns
    val w = 300L              // default 5-minute window
    val out = Events.nearbyEventCounts(events(
      (0L, T + 1000 * S, 1L, "purchase", 9.0, "{}"),
      (1L, T + 1000 * S, 9L, "error", 0.0, "{}"),          // == anchor ts → IN
      (2L, T + (1000 - w) * S, 9L, "error", 0.0, "{}"),    // == t - w exactly → OUT
      (3L, T + (1000 - w + 1) * S, 9L, "error", 0.0, "{}"),// just inside → IN
      (4L, T + 1001 * S, 9L, "error", 0.0, "{}"),          // after anchor → OUT
      (5L, T + 5000 * S, 2L, "purchase", 9.0, "{}")))      // quiet period → 0
      .collect().map(r => r.getAs[Long]("anchor_id") ->
        (r.getAs[Long]("n_near"),
          Option(r.getAs[java.lang.Long]("latest_near_ts_us")).map(_.toLong)))
      .toMap
    assert(out.size === 2)
    assert(out(0L) === (2L, Some((T + 1000 * S) / 1000)))
    assert(out(5L) === (0L, None))
  }

  test("eventJourneys golden: consecutive triples per user, count floor") {
    // user 1: view,click,view,click → triples (v,c,v), (c,v,c)
    // user 2: view,click,view      → triple  (v,c,v)
    // user 3: two events: no triple
    val rows = Seq(
      (0L, T, 1L, "view"), (1L, T + H, 1L, "click"),
      (2L, T + 2 * H, 1L, "view"), (3L, T + 3 * H, 1L, "click"),
      (4L, T, 2L, "view"), (5L, T + H, 2L, "click"), (6L, T + 2 * H, 2L, "view"),
      (7L, T, 3L, "view"), (8L, T + H, 3L, "click"))
      .map { case (id, ts, u, t) => (id, ts, u, t, 0.0, "{}") }
    val all = Events.eventJourneys(events(rows: _*), minCount = 1L)
      .collect().map(r => (r.getAs[String]("t1"), r.getAs[String]("t2"),
        r.getAs[String]("t3")) -> r.getAs[Long]("n")).toMap
    assert(all === Map(("view", "click", "view") -> 2L,
      ("click", "view", "click") -> 1L))
    // the floor drops the singleton journey
    val floored = Events.eventJourneys(events(rows: _*), minCount = 2L)
      .collect().map(r => (r.getAs[String]("t1"), r.getAs[String]("t2"),
        r.getAs[String]("t3"))).toSet
    assert(floored === Set(("view", "click", "view")))
  }

  test("eventPivot golden: one wide zero-filled row per hour") {
    val out = Events.eventPivot(events(
        (0L, T, 1L, "view", 0.0, "{}"),
        (1L, T + H / 2, 2L, "view", 0.0, "{}"),
        (2L, T + H / 2, 1L, "click", 0.0, "{}"),
        (3L, T + H, 3L, "purchase", 0.0, "{}")))
      .collect().map(r => r.getAs[Long]("hour_us") ->
        Events.PivotTypes.map(t => r.getAs[Long](s"n_$t"))).toMap
    // hour 0: 2 views + 1 click; hour 1: 1 purchase; all else zero
    assert(out(T / 1000) === Seq(1L, 0L, 0L, 0L, 2L))
    assert(out(T / 1000 + 3600000000L) === Seq(0L, 0L, 1L, 0L, 0L))
    assert(out.size === 2)
  }

  test("eventTransitions golden: adjacency per user, conditional millionths") {
    val out = Events.eventTransitions(events(
      (0L, T, 1L, "view", 0.0, "{}"),
      (1L, T + H, 1L, "click", 0.0, "{}"),
      (2L, T + 2 * H, 1L, "view", 0.0, "{}"),
      (3L, T + 3 * H, 1L, "click", 0.0, "{}"),
      (4L, T, 2L, "view", 0.0, "{}"),
      (5L, T + H, 2L, "error", 0.0, "{}"),
      (6L, T, 3L, "view", 0.0, "{}")))   // singleton user: no transition
      .collect().map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("p_millionths"))).toMap
    // from view: click ×2, error ×1 → 666666 / 333333; from click: view ×1
    assert(out.size === 3)
    assert(out(("view", "click")) === (2L, 666666L))
    assert(out(("view", "error")) === (1L, 333333L))
    assert(out(("click", "view")) === (1L, 1000000L))
  }

  test("eventTransitions: transition mass = events minus one per active user") {
    import org.apache.spark.sql.functions.{col, sum => fsum}
    val rows = (0 until 90).map(i =>
      (i.toLong, T + ((i * 13) % 40) * H,
        (i % 7).toLong, Seq("view", "click", "purchase")(i % 3), 0.0, "{}"))
    val total = Events.eventTransitions(events(rows: _*))
      .agg(fsum("n")).first().getLong(0)
    assert(total === (rows.size - rows.map(_._3).distinct.size).toLong)
  }

  test("HLL sketches: exact in the sparse regime, hour→day re-roll matches direct") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    // 120 users × 3 hours across 2 days, overlapping user sets per hour
    val rows = for (h <- 0 until 6; u <- 0 until 120; if (u + h) % 3 != 0)
      yield ((h * 1000 + u).toLong, T + h * 8 * H, u.toLong, "view", 0.0, "{}")
    val df = events(rows: _*)
    val sk = Events.hourlyUserSketches(df)
    // per-hour estimates: HLL is exact at this cardinality (sparse mode)
    val perHour = sk.collect().map(r => r.getAs[Long]("hour_us") ->
      r.getAs[Long]("n_events")).toMap
    assert(perHour.size === 6)
    // day re-roll from the persisted sketches — never touching raw events
    val daily = Events.dailyActiveFromSketches(sk).collect()
      .map(r => r.getAs[Long]("day_start_us") ->
        (r.getAs[Long]("est_users"), r.getAs[Long]("n_events"))).toMap
    val exact = df.select(col("user_id"),
        org.apache.spark.sql.functions.expr(
          "CAST((ts - pmod(ts, 1000)) DIV 1000 AS BIGINT)").as("ts_us"))
      .select(col("user_id"),
        org.apache.spark.sql.functions.expr(
          "(ts_us - ((ts_us % 86400000000 + 86400000000) % 86400000000)) AS day_start_us"))
      .groupBy("day_start_us").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getAs[Long]("day_start_us") -> r.getAs[Long]("n")).toMap
    assert(daily.keySet === exact.keySet)
    for ((day, (est, _)) <- daily)
      assert(est === exact(day), s"day $day: sparse-regime estimate must be exact")
    // event counts ride the sketch shuffle unchanged
    assert(daily.values.map(_._2).sum === rows.size.toLong)
  }

  test("HLL sketches: bounded error dense, and union ≈ direct on the same rows") {
    import org.apache.spark.sql.functions.lit
    // 50k distinct users in one day, spread over 10 hours — well past
    // the sparse→dense promotion for lgK=12
    val rows = (0 until 50000).map(u =>
      (u.toLong, T + (u % 10) * H, u.toLong, "view", 0.0, "{}"))
    val df = events(rows: _*)
    val daily = Events.dailyActiveFromSketches(Events.hourlyUserSketches(df))
      .collect()
    assert(daily.length === 1)
    val est = daily.head.getAs[Long]("est_users")
    // lgK=12 → rel std err ≈ 1.04/√4096 ≈ 1.6%; 4σ bound
    assert(math.abs(est - 50000L) <= 50000L * 65 / 1000,
      s"dense estimate $est drifted > 6.5% from 50000")
    // direct one-shot daily sketch agrees with the hour-union path
    // (registers are max-folds; tolerance covers sketch-mode artifacts)
    val direct = df.groupBy()
      .agg(org.apache.spark.sql.functions.hll_sketch_estimate(
        org.apache.spark.sql.functions.hll_sketch_agg(
          org.apache.spark.sql.functions.col("user_id"),
          lit(Events.HllLgK))).as("est"))
      .first().getAs[Long]("est")
    assert(math.abs(est - direct) <= math.max(direct / 100L, 1L),
      s"union path $est vs direct $direct diverged > 1%")
  }

  test("nearby equals the naive inequality join regardless of bucket alignment") {
    val S: Long = 1000000000L
    // timestamps scattered across bucket boundaries (300 s buckets)
    val rows = (0 until 150).map { i =>
      val typ = if (i % 3 == 0) "purchase" else "error"
      (i.toLong, T + ((i * 97) % 1800).toLong * S, (i % 4).toLong, typ, 0.0, "{}")
    }
    val winUs = 300L * 1000000L
    val got = Events.nearbyEventCounts(events(rows: _*)).collect()
      .map(r => r.getAs[Long]("anchor_id") -> r.getAs[Long]("n_near")).toMap
    val errors = rows.filter(_._4 == "error").map(_._2 / 1000)
    val expected = rows.filter(_._4 == "purchase").map { p =>
      val t = p._2 / 1000
      p._1 -> errors.count(e => e > t - winUs && e <= t).toLong
    }.toMap
    assert(got === expected)
  }
}
