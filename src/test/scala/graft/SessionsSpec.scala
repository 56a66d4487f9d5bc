package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessions

class SessionsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("sessionize splits strictly beyond the gap; boundary gap stays in-session") {
    // user 1: 0,10 | 50,80  (40min gap splits; the exactly-30min gap
    // 50->80 does NOT — the split is strict '>')
    // user 2: one lone event
    val ev = Seq(
      (1L, 1L, ts(0)), (2L, 1L, ts(10)), (3L, 1L, ts(50)), (4L, 1L, ts(80)),
      (5L, 2L, ts(7)))
      .toDF("event_id", "user_id", "ts")
    val got = Sessions.sessionize(ev, gapMinutes = 30)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getTimestamp(3), r.getTimestamp(4))).toMap
    assert(got.size === 3)
    assert(got((1L, 1L)) === ((2L, ts(0), ts(10))))
    assert(got((1L, 2L)) === ((2L, ts(50), ts(80))))
    assert(got((2L, 1L)) === ((1L, ts(7), ts(7))))
  }

  test("funnel honors strict event-time order between stages") {
    // user 1 completes signup -> click -> purchase in order.
    // user 2 clicked BEFORE signing up and never clicked after: falls
    // out at stage 2 (and the pre-signup purchase cannot count either).
    // user 3 signs up, clicks, but purchases BEFORE the click.
    val ev = Seq(
      (1L, 1L, "signup", ts(0)), (2L, 1L, "click", ts(5)),
      (3L, 1L, "purchase", ts(9)),
      (4L, 2L, "click", ts(1)), (5L, 2L, "signup", ts(2)),
      (6L, 2L, "purchase", ts(3)),
      (7L, 3L, "signup", ts(0)), (8L, 3L, "purchase", ts(4)),
      (9L, 3L, "click", ts(6)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = Sessions.funnel(ev).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("signup") === 3L)
    assert(got("click_after") === 2L)     // users 1, 3
    assert(got("purchase_after") === 1L)  // user 1 only
  }

  test("cohort retention counts a user once per active week offset") {
    // Weeks are Monday-truncated; 2026-08-10 is a Monday. User 1's
    // first event is in week 0, active again in week 2 (twice — counted
    // once). User 2 starts a week later (its own cohort).
    def at(day: Int, hour: Int) =
      Timestamp.valueOf(f"2026-08-$day%02d $hour%02d:00:00")
    val ev = Seq(
      (1L, 1L, at(10, 9)), (2L, 1L, at(24, 9)), (3L, 1L, at(25, 10)),
      (4L, 2L, at(17, 8)))
      .toDF("event_id", "user_id", "ts")
    val got = Sessions.cohortRetention(ev).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w0 = Timestamp.valueOf("2026-08-10 00:00:00")
    val w1 = Timestamp.valueOf("2026-08-17 00:00:00")
    assert(got === Map(
      (w0, 0L) -> 1L, (w0, 2L) -> 1L, (w1, 0L) -> 1L))
  }

  test("hourly resample fills gap hours with explicit zeros") {
    def at(hour: Int) = Timestamp.valueOf(f"2026-08-10 $hour%02d:00:30")
    val ev = Seq(
      (1L, 1L, "click", at(1)), (2L, 1L, "click", at(1)),
      (3L, 2L, "view", at(3))) // hour 2 has NO events: must appear as 0
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = Sessions.resampleHourly(ev).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    def h(hour: Int) = Timestamp.valueOf(f"2026-08-10 $hour%02d:00:00")
    // 3 hours x 2 types = 6 rows, zeros explicit
    assert(got.size === 6)
    assert(got((h(1), "click")) === 2L)
    assert(got((h(2), "click")) === 0L)
    assert(got((h(2), "view")) === 0L)
    assert(got((h(3), "view")) === 1L)
  }

  test("rolling metrics window the gap-filled series (zeros pull the average down)") {
    def at(hour: Int) = Timestamp.valueOf(f"2026-08-10 $hour%02d:00:30")
    // clicks at hours 1 and 3 with a silent hour 2: the 2-bucket moving
    // average at hour 3 must average against the EXPLICIT zero of hour
    // 2, not against hour 1.
    val ev = Seq(
      (1L, 1L, "click", at(1)), (2L, 1L, "click", at(1)),
      (3L, 2L, "click", at(3)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = Sessions.rollingMetrics(ev, windowBuckets = 2).collect()
      .map(r => (r.getTimestamp(0).toString.substring(11, 13), r.getString(1))
        -> (r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    assert(got(("01", "click")) === ((2L, 2.0, 2L)))
    assert(got(("02", "click")) === ((0L, 1.0, 2L))) // (2+0)/2
    assert(got(("03", "click")) === ((1L, 0.5, 3L))) // (0+1)/2
  }

  test("trend: exact slope/intercept on a planted linear series; flat series slope 0") {
    // type "up": value = 2·day + 1 sampled at days 0,1,2 (hour-aligned
    // timestamps) → slope exactly 2, intercept exactly 1.
    // type "flat": constant 5 → slope 0, intercept 5.
    def dayTs(d: Int) = new Timestamp(d * 86400000L)
    val ev = Seq(
      (1L, 1L, dayTs(0), "up", 1.0), (2L, 1L, dayTs(1), "up", 3.0),
      (3L, 1L, dayTs(2), "up", 5.0),
      (4L, 2L, dayTs(0), "flat", 5.0), (5L, 2L, dayTs(2), "flat", 5.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Sessions.trendByType(ev).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got("up") === ((3L, 3.0, 2.0, 1.0)))
    assert(got("flat") === ((2L, 5.0, 0.0, 5.0)))
  }

  test("resample and rolling metrics return empty (not NPE) on an empty events table") {
    val ev = Seq.empty[(Long, Long, String, Timestamp)]
      .toDF("event_id", "user_id", "event_type", "ts")
    val rs = Sessions.resampleHourly(ev)
    assert(rs.columns.toSeq === Seq("bucket", "event_type", "n"))
    assert(rs.count() === 0)
    assert(Sessions.rollingMetrics(ev).count() === 0)
  }

  test("funnel stage names are data, not SQL: quotes in a stage label are safe") {
    val ev = Seq((1L, 1L, "sign'up", ts(0)), (2L, 1L, "cl'ick", ts(5)),
      (3L, 1L, "pur'chase", ts(9)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = Sessions.funnel(ev, Seq("sign'up", "cl'ick", "pur'chase"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === Map(
      "sign'up" -> 1L, "cl'ick_after" -> 1L, "pur'chase_after" -> 1L))
  }

  test("funnel costs ONE user-key shuffle: windows and per-user agg share the exchange") {
    val plan = Sessions.funnel(Tables.events(spark, sf0001))
      .queryExecution.executedPlan.toString
    val userExchanges = "hashpartitioning\\(user_id".r
      .findAllIn(plan).length
    assert(userExchanges === 1,
      s"expected exactly 1 user_id hash exchange, plan:\n$plan")
  }

  test("hourly anomalies flag only |z| >= threshold and skip zero-variance types") {
    def h(hr: Long) = new Timestamp(hr * 3600000L)
    // type A: counts 1,1,1,1,6 over five hours — mu=2, sigma=2, so only
    // the 6-count hour has |z| = 2. type B: constant 3 per hour — sigma=0,
    // no well-defined z, must be skipped entirely (never a div-by-zero).
    val rows =
      (1 to 4).map(i => (i.toLong, 1L, "A", h(i))) ++
        (1 to 6).map(i => (100L + i, 1L, "A", h(5))) ++
        (1 to 3).flatMap(hr => (1 to 3).map(i =>
          (200L + hr * 10 + i, 1L, "B", h(hr))))
    val ev = rows.toDF("event_id", "user_id", "event_type", "ts")
    val got = Sessions.hourlyAnomalies(ev, zThreshold = 2.0).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq((h(5), "A", 6L, 2.0)))
  }

  test("hourly anomalies: empty input yields an empty frame, not a failure") {
    val ev = Seq.empty[(Long, Long, String, Timestamp)]
      .toDF("event_id", "user_id", "event_type", "ts")
    assert(Sessions.hourlyAnomalies(ev).collect().isEmpty)
  }
}
