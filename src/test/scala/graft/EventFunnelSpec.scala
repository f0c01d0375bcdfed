package graft

import graft.operators.Relational

/** The ordered conversion funnel: strictly-after semantics (an event
  * BEFORE the previous stage's first reach must not count), exact
  * integer time-to-stage sums, and sequential attrition. */
class EventFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def funnel(rows: Seq[(Long, String, Long)]) =
    Relational.eventFunnel(rows.toDF("user_id", "event_type", "us"))
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq

  test("ordering is strict: pre-view clicks do not convert") {
    val got = funnel(Seq(
      // user 1: full ordered journey, deltas 10/30/60
      (1L, "view", 100L), (1L, "click", 110L),
      (1L, "signup", 130L), (1L, "purchase", 160L),
      // user 2: clicked BEFORE the first view — click must not count,
      // so signup (after view but with no valid click) cannot either
      (2L, "click", 90L), (2L, "view", 100L), (2L, "signup", 120L),
      // user 3: view then click only; an EARLIER second click (105)
      // after the view is the first valid reach, not the later one
      (3L, "view", 100L), (3L, "click", 140L), (3L, "click", 105L),
      // user 4: never viewed — enters no stage
      (4L, "click", 100L), (4L, "purchase", 110L)))
    assert(got == Seq(
      (1L, "view", 3L, 0L),         // users 1, 2, 3
      (2L, "click", 2L, 10L + 5L),  // user 1 (+10), user 3 (+5)
      (3L, "signup", 1L, 30L),      // user 1 only — user 2's click was invalid
      (4L, "purchase", 1L, 60L)), s"got $got")
  }

  test("transition matrix: session gap excludes, probabilities exact") {
    val gap = Relational.SessionGapUs
    val rows = Seq(
      // user 1, one session: view->click, click->view, view->click
      (1L, 1L, "view", 0L), (1L, 2L, "click", 10L),
      (1L, 3L, "view", 20L), (1L, 4L, "click", 30L),
      // user 1, NEW session after the gap: view->purchase; the
      // click->view step across the gap must NOT count
      (1L, 5L, "view", 30L + gap + 1), (1L, 6L, "purchase", 40L + gap),
      // user 2: single event — no transition
      (2L, 7L, "view", 0L))
      .toDF("user_id", "event_id", "event_type", "us")
    val got = Relational.eventTransitions(rows).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq(
      ("click", "view", 1L, 1.0),            // 1 of 1 from click
      ("view", "click", 2L, 2.0 / 3.0),      // 2 of 3 from view
      ("view", "purchase", 1L, 1.0 / 3.0)),  // 1 of 3 from view
      s"got $got")
  }

  test("same-timestamp events do not satisfy strictly-after") {
    val got = funnel(Seq(
      (1L, "view", 100L), (1L, "click", 100L), (1L, "click", 101L)))
    // the t=100 click ties the view and must not count; t=101 does
    assert(got(1) == ((2L, "click", 1L, 1L)), s"got $got")
  }

  test("retention triangle matches a driver-side reference") {
    val d = "/root/testdata/sf0.001"
    val events = Tables.events(spark, d)
      .selectExpr("user_id", "CAST(to_date(ts) AS STRING) AS day").collect()
      .map(r => (r.getLong(0), r.getString(1))).distinct
    val firstDay = events.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    def off(day: String, cohort: String): Long =
      java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(cohort), java.time.LocalDate.parse(day))
    val tri = events.groupBy { case (u, day) => (firstDay(u), off(day, firstDay(u))) }
      .view.mapValues(_.length.toLong).toMap
    val want = tri.toSeq.map { case ((c, o), n) =>
      (c, o, n, tri((c, 0L)), n.toDouble / tri((c, 0L)))
    }.sortBy(r => (r._1, r._2))
    val got = Relational.qRetention(spark, d).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == want, "retention diverged from the reference triangle")
    assert(got.map(_._2).max > 5, "triangle should span multiple offsets")
    assert(got.forall { case (_, o, n, sz, _) => o == 0L || n <= sz },
      "no offset may exceed its cohort size")
  }

  test("real table: attrition is monotone and stages populated") {
    val rows = Relational.qEventFunnel(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(rows.map(_._1) == Seq(1L, 2L, 3L, 4L))
    val counts = rows.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"funnel counts must be non-increasing: $counts")
    assert(counts.head > 0 && counts.last > 0,
      s"every stage should be reachable on this data: $counts")
  }
}
