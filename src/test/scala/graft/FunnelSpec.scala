package graft

import org.apache.spark.sql.functions._

/** The custom whole-operator tier (FunnelMatch LogicalPlan →
  * FunnelStrategy → FunnelMatchExec): greedy first-match funnel
  * semantics and plan shape.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ensureStrategy(): Unit =
    if (!spark.experimental.extraStrategies.contains(graft.plans.FunnelStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.FunnelStrategy

  private val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
  private def at(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)

  test("greedy first-match funnel counts ordered steps per key") {
    ensureStrategy()
    val ev = Seq(
      // full funnel in order
      (1L, at(0), 1L, "signup"), (1L, at(1), 2L, "click"), (1L, at(2), 3L, "purchase"),
      // click BEFORE signup doesn't count; purchase can't skip click
      (2L, at(0), 4L, "click"), (2L, at(1), 5L, "signup"), (2L, at(2), 6L, "purchase"),
      // no step-0 event at all
      (3L, at(0), 7L, "view"),
      // same-ts tie: click's larger event_id orders it after the signup
      (4L, at(0), 8L, "signup"), (4L, at(0), 9L, "click"), (4L, at(1), 10L, "purchase"),
      // same-ts tie the other way: click sorts BEFORE the signup
      (5L, at(0), 12L, "signup"), (5L, at(0), 11L, "click"), (5L, at(1), 13L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.plans.FunnelMatch.of(ev, "user_id", "ts", "event_id",
        "event_type", Seq("signup", "click", "purchase"))
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 3, 2L -> 1, 3L -> 0, 4L -> 3, 5L -> 1), s"got $got")
  }

  test("conversion window bounds steps to the step-0 anchor") {
    ensureStrategy()
    val ev = Seq(
      // completes within 5 minutes of the signup anchor
      (1L, at(0), 1L, "signup"), (1L, at(2), 2L, "click"), (1L, at(4), 3L, "purchase"),
      // click inside, purchase outside the window
      (2L, at(0), 4L, "signup"), (2L, at(3), 5L, "click"), (2L, at(9), 6L, "purchase"),
      // first click outside the window; a LATER in-window click can't
      // exist (time moved on) — greedy anchor never re-arms, steps = 1
      (3L, at(0), 7L, "signup"), (3L, at(8), 8L, "click"), (3L, at(9), 9L, "purchase"),
      // a second signup after window expiry does NOT re-anchor
      (4L, at(0), 10L, "signup"), (4L, at(10), 11L, "signup"),
      (4L, at(11), 12L, "click"), (4L, at(12), 13L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.plans.FunnelMatch.of(ev, "user_id", "ts", "event_id",
        "event_type", Seq("signup", "click", "purchase"),
        withinUs = 5L * 60 * 1000000)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 1), s"got $got")
    // unbounded default is unchanged by the window plumbing
    val unb = graft.plans.FunnelMatch.of(ev, "user_id", "ts", "event_id",
        "event_type", Seq("signup", "click", "purchase"))
      .as[(Long, Int)].collect().toMap
    assert(unb === Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3), s"got $unb")
  }

  test("funnel plans one clustering exchange and streams in FunnelMatchExec") {
    ensureStrategy()
    val ev = TestData.events(spark, sf("sf0.001"))
      .select("user_id", "ts", "event_id", "event_type")
    val df = graft.plans.FunnelMatch.of(ev, "user_id", "ts", "event_id",
      "event_type", Seq("signup", "click", "purchase"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(p.contains("FunnelMatch"), p.take(600))
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
      s"exactly ONE clustering shuffle regardless of step count:\n${p.take(800)}")
    assert(p.contains("Sort [user_id"), "in-partition (key, ts, tie) sort required")
  }
}
