package graft.ops

import java.sql.Timestamp

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Fixture specs for the event-time operators' cores — shapes the synthetic
  * events table cannot produce (it is single-cohort: every user first
  * appears in week one). */
class EventsSpec extends AnyFunSuite with SparkSpec {

  private def at(day: Int): Timestamp =
    // epoch-week arithmetic: day 0 = 1970-01-01, week = day DIV 7
    new Timestamp(day.toLong * 86400L * 1000L)

  test("q102 cohort retention: multi-cohort matrix with returns, gaps, and " +
      "a null user dropped") {
    import spark.implicits._
    val events = Seq(
      // cohort week 0: users 1, 2
      (Some(1L), at(0)), (Some(1L), at(1)),   // u1 week 0 (twice — dedups)
      (Some(2L), at(2)),
      (Some(1L), at(7)),                       // u1 returns week 1
      (Some(1L), at(21)),                      // u1 returns week 3 (gap at 2)
      (Some(2L), at(14)),                      // u2 returns week 2
      // cohort week 1: user 3, never returns
      (Some(3L), at(8)),
      // null user: no cohort
      (Option.empty[Long], at(0))
    ).toDF("user_id", "ts")
    val got = Events.cohortRetentionOn(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    graft.CachedFrames.drain()
    assert(got === Map(
      (0L, 0L) -> ((2L, 2L, 1.0)),   // both cohort-0 users active week 0
      (0L, 1L) -> ((1L, 2L, 0.5)),   // only u1 back in week 1
      (0L, 2L) -> ((1L, 2L, 0.5)),   // only u2 back in week 2
      (0L, 3L) -> ((1L, 2L, 0.5)),   // only u1 back in week 3
      (1L, 0L) -> ((1L, 1L, 1.0)))) // u3's cohort, never returns
  }
}
