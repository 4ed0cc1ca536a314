package graft

import org.scalatest.funsuite.AnyFunSuite

/** The per-query contention sentinel (r4 post-mortem: the suite-level
  * sentinel missed a recorded 5.24 s for a 0.55 s query because contention
  * inflated min and median together). Pure-logic tests — no Spark session. */
class BenchSentinelSpec extends AnyFunSuite {

  private def q(median: Double, min: Double = -1, max: Double = -1) =
    Bench.QStat(median, if (min < 0) median else min,
      if (max < 0) median else max, failures = 0)

  test("query with median > 2x its min is flagged, re-measured, cleaner stat wins") {
    val stats = Map("q1" -> q(5.0, min = 0.6, max = 6.0), "q2" -> q(1.0))
    var calls = List.empty[String]
    val (cleaned, flagged) = Bench.applyPerQuerySentinel(stats, Map.empty, { n =>
      calls ::= n; q(0.7, min = 0.6, max = 0.8)
    })
    assert(flagged === List("q1"))
    assert(calls === List("q1")) // q2 untouched
    assert(cleaned("q1").median === 0.7)
    assert(cleaned("q2") === stats("q2"))
  }

  test("synthetic contention across ALL reps (tight min) escapes the intra-rep " +
    "check but trips the previous-round comparison") {
    // the r4 failure mode: contention for the whole window -> median ~ min
    val stats = Map("q47" -> q(5.2, min = 4.9, max = 5.4))
    val prev = Map("q47" -> 0.6)
    val (cleaned, flagged) =
      Bench.applyPerQuerySentinel(stats, prev, _ => q(0.55, 0.5, 0.6))
    assert(flagged === List("q47"))
    assert(cleaned("q47").median === 0.55)
  }

  test("a retry slower than the original never replaces it") {
    val stats = Map("q1" -> q(5.0, min = 1.0))
    val (cleaned, flagged) =
      Bench.applyPerQuerySentinel(stats, Map.empty, _ => q(9.0, 8.0, 9.5))
    assert(flagged === List("q1"))
    assert(cleaned("q1").median === 5.0)
  }

  test("clean stats pass through with no re-measurement") {
    val stats = Map("q1" -> q(1.0, min = 0.9), "q2" -> q(2.0, min = 1.8))
    val prev = Map("q1" -> 0.9, "q2" -> 1.9)
    val (cleaned, flagged) = Bench.applyPerQuerySentinel(stats, prev,
      n => fail(s"unexpected re-measure of $n"))
    assert(flagged.isEmpty)
    assert(cleaned === stats)
  }

  test("a query absent from the previous record only gets the intra-rep check") {
    val stats = Map("q60" -> q(3.0, min = 2.9))
    val (_, flagged) = Bench.applyPerQuerySentinel(stats, Map.empty,
      n => fail(s"unexpected re-measure of $n"))
    assert(flagged.isEmpty)
  }

  test("statOf uses successful rep times only; all-failed yields NaN") {
    // a failed rep's (fast) wall time must not deflate the stats
    val s = Bench.statOf(Seq(2.0, 2.2), failures = 1)
    assert(s.median === 2.2 && s.min === 2.0 && s.max === 2.2 && s.failures === 1)
    val dead = Bench.statOf(Seq.empty, failures = 3)
    assert(dead.median.isNaN && dead.min.isNaN && dead.max.isNaN)
    assert(dead.failures === 3)
  }

  test("mergePasses compares only queries measured in both passes, backfills failures") {
    val nan = Bench.QStat(Double.NaN, Double.NaN, Double.NaN, failures = 3)
    // the retry lost q2 entirely — its smaller subset sum must not win
    val first = Map("q1" -> q(1.0), "q2" -> q(5.0))
    assert(Bench.mergePasses(first, Map("q1" -> q(2.0), "q2" -> nan)) === first)
    // a genuinely cleaner retry wins, and backfills the query IT failed
    // from the first pass instead of dropping it from the record
    val m = Bench.mergePasses(first, Map("q1" -> q(0.5), "q2" -> nan))
    assert(m("q1").median === 0.5)
    assert(m("q2").median === 5.0 && m("q2").failures === 0)
  }

  test("parseQueryMedians reads a recorded bench line") {
    val line = """{"metric":"total","value":40.9,"unit":"sec","reps":3,""" +
      """"failures":{},"queries":{"q1_agg":0.51,"q47_range_join":0.55},""" +
      """"queries_min":{"q1_agg":0.49,"q47_range_join":0.52},"sf":"sf0.1"}"""
    val m = Bench.parseQueryMedians(line)
    assert(m === Map("q1_agg" -> 0.51, "q47_range_join" -> 0.55))
    assert(Bench.parseQueryMedians("not json at all") === Map.empty)
  }
}
