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

  test("drift adjudication: >25%-over-prev movers are re-measured, top-K " +
    "by ABSOLUTE excess, both numbers recorded, cleaner median kept") {
    // six movers over prev=10: excesses 8, 6, 5, 4, 3, 2.6 — TopK=5 keeps
    // the first five and drops q_f despite it exceeding the 1.25× band
    val stats = Map(
      "q_a" -> q(18.0), "q_b" -> q(16.0), "q_c" -> q(15.0),
      "q_d" -> q(14.0), "q_e" -> q(13.0), "q_f" -> q(12.6),
      "q_ok" -> q(10.1), // within the band: 10.1 < 1.25 × 10
      "q_new" -> q(99.0)) // no prev record: never flags
    val prev = stats.keys.filterNot(_ == "q_new").map(_ -> 10.0).toMap
    var calls = List.empty[String]
    val (cleaned, drift) = Bench.applyDriftAdjudication(stats, prev, { n =>
      calls ::= n
      if (n == "q_a") q(10.2) else q(stats(n).median) // q_a was ambient
    })
    assert(calls.toSet === Set("q_a", "q_b", "q_c", "q_d", "q_e"))
    assert(drift.keySet === calls.toSet)
    // the record self-adjudicates: suite AND solo AND prev all present
    assert(drift("q_a") === Bench.DriftRow(18.0, 10.2, 10.0))
    assert(drift("q_b") === Bench.DriftRow(16.0, 16.0, 10.0))
    // ambient mover keeps the cleaner number; real movers keep theirs
    assert(cleaned("q_a").median === 10.2)
    assert(cleaned("q_b") === stats("q_b"))
    assert(cleaned("q_f") === stats("q_f")) // beyond top-K: untouched
    assert(cleaned("q_ok") === stats("q_ok"))
    assert(cleaned("q_new") === stats("q_new"))
  }

  test("drift adjudication: NaN suite medians never flag; a NaN solo " +
    "re-measure is recorded but never replaces the suite stat") {
    val stats = Map("q_nan" -> Bench.QStat(Double.NaN, Double.NaN,
      Double.NaN, 3), "q_m" -> q(20.0))
    val (cleaned, drift) = Bench.applyDriftAdjudication(stats,
      Map("q_nan" -> 1.0, "q_m" -> 10.0),
      _ => Bench.QStat(Double.NaN, Double.NaN, Double.NaN, 1))
    assert(drift.keySet === Set("q_m"))
    assert(drift("q_m").solo.isNaN)
    assert(cleaned("q_m") === stats("q_m"))
    assert(cleaned("q_nan") === stats("q_nan"))
  }

  test("statOf uses successful rep times only; all-failed yields NaN") {
    // a failed rep's (fast) wall time must not deflate the stats
    val s = Bench.statOf(Seq(2.0, 2.2), failures = 1)
    assert(s.median === 2.2 && s.min === 2.0 && s.max === 2.2 && s.failures === 1)
    val dead = Bench.statOf(Seq.empty, failures = 3)
    assert(dead.median.isNaN && dead.min.isNaN && dead.max.isNaN)
    assert(dead.failures === 3)
  }

  test("mergePasses compares only queries measured in both passes, sums failures") {
    val nan = Bench.QStat(Double.NaN, Double.NaN, Double.NaN, failures = 3)
    // the retry lost q2 entirely — its smaller subset sum must not win;
    // but the retry's 3 failed reps still surface on the kept stat
    val first = Map("q1" -> q(1.0), "q2" -> q(5.0))
    val kept = Bench.mergePasses(first, Map("q1" -> q(2.0), "q2" -> nan))
    assert(kept("q1") === q(1.0))
    assert(kept("q2").median === 5.0 && kept("q2").failures === 3)
    // a genuinely cleaner retry wins, and backfills the query IT failed
    // from the first pass instead of dropping it from the record
    val m = Bench.mergePasses(first, Map("q1" -> q(0.5), "q2" -> nan))
    assert(m("q1").median === 0.5)
    // the backfilled stat carries the failed pass's rep failures — an
    // all-reps-failed pass must stay visible in the JSON record no matter
    // which direction the merge went
    assert(m("q2").median === 5.0 && m("q2").failures === 3)
    // symmetric case: first pass failed all reps, clean RETRY is chosen —
    // the first pass's failures must not be erased by the winning stat
    val n = Bench.mergePasses(Map("q1" -> q(9.0), "q2" -> nan),
      Map("q1" -> q(1.0), "q2" -> q(4.0)))
    assert(n("q2").median === 4.0 && n("q2").failures === 3)
  }

  test("mergePasses keeps a query present in only ONE pass (JVM died " +
    "mid-pass: key absent, not NaN)") {
    // q2 only in the first pass, q3 only in the retry — both must survive
    // the merge from whichever pass measured them, in either win direction
    val u = Bench.mergePasses(Map("q1" -> q(1.0), "q2" -> q(5.0)),
      Map("q1" -> q(2.0), "q3" -> q(7.0)))
    assert(u.keySet === Set("q1", "q2", "q3"))
    assert(u("q1") === q(1.0) && u("q2") === q(5.0) && u("q3") === q(7.0))
    val v = Bench.mergePasses(Map("q1" -> q(2.0), "q2" -> q(5.0)),
      Map("q1" -> q(1.0), "q3" -> q(7.0)))
    assert(v.keySet === Set("q1", "q2", "q3"))
    assert(v("q1") === q(1.0) && v("q2") === q(5.0) && v("q3") === q(7.0))
  }

  test("load1 parses the 1-minute field; unparseable reads as NaN, which " +
    "never flags contention") {
    assert(Bench.load1("6.03 8.10 9.77") === 6.03)
    assert(Bench.load1("").isNaN)
    assert(!(Bench.load1("") > 8.0)) // NaN > threshold is false: no retry
  }

  test("latestFirst orders bench wrappers newest-round-first (the drift " +
    "baseline picks the most recent record, never the all-time best)") {
    assert(Bench.latestFirst(Seq("BENCH_r2.json", "BENCH_r15.json",
      "BENCH_r9.json")) ===
      Seq("BENCH_r15.json", "BENCH_r9.json", "BENCH_r2.json"))
    assert(Bench.latestFirst(Nil) === Nil)
  }

  test("latestHistoryMedians picks the newest NON-contended history line, " +
    "skips unparseable ones, and degrades to the newest parseable line " +
    "when every record self-labels contended") {
    def line(c: Boolean, q: Double) =
      s"""{"ts":"t","sf":"sf0.1","contended":$c,"queries":{"q1_agg":$q}}"""
    // newest (last) line wins when clean
    assert(Bench.latestHistoryMedians(Seq(line(false, 1.0), line(false, 2.0)))
      === Map("q1_agg" -> 2.0))
    // a contended newest line is skipped for the clean one below it
    assert(Bench.latestHistoryMedians(Seq(line(false, 1.0), line(true, 9.0)))
      === Map("q1_agg" -> 1.0))
    // an unparseable newest line falls through (the r5 truncated-tail
    // class, now at the history layer)
    assert(Bench.latestHistoryMedians(Seq(line(false, 1.0), "garbage"))
      === Map("q1_agg" -> 1.0))
    // all contended: the newest parseable record still beats no baseline
    assert(Bench.latestHistoryMedians(Seq(line(true, 3.0), line(true, 4.0)))
      === Map("q1_agg" -> 4.0))
    assert(Bench.latestHistoryMedians(Nil) === Map.empty)
  }

  test("sameSf matches a history line's self-labeled sf exactly — a local " +
    "sf0.001 experiment never becomes an sf0.1 run's yardstick") {
    val line = """{"ts":"t","sf":"/root/testdata/sf0.001","contended":false,""" +
      """"queries":{"q1_agg":0.01}}"""
    assert(Bench.sameSf(line, "/root/testdata/sf0.001"))
    assert(!Bench.sameSf(line, "/root/testdata/sf0.1"))
    assert(!Bench.sameSf("""{"queries":{"q1_agg":1.0}}""", "/root/testdata/sf0.1"))
  }

  test("load5 parses the 5-minute field (the r15 warm-close gate); " +
    "unparseable reads as NaN, which never blocks a start") {
    assert(Bench.load5("6.03 8.10 9.77") === 8.10)
    assert(Bench.load5("").isNaN)
    assert(Bench.load5("1.0").isNaN) // missing field: same safe fallback
    assert(!(Bench.load5("") > 8.0))
  }

  test("parseQueryMedians reads a recorded bench line") {
    val line = """{"metric":"total","value":40.9,"unit":"sec","reps":3,""" +
      """"failures":{},"queries":{"q1_agg":0.51,"q47_range_join":0.55},""" +
      """"queries_min":{"q1_agg":0.49,"q47_range_join":0.52},"sf":"sf0.1"}"""
    val m = Bench.parseQueryMedians(line)
    assert(m === Map("q1_agg" -> 0.51, "q47_range_join" -> 0.55))
    assert(Bench.parseQueryMedians("not json at all") === Map.empty)
  }

  test("parseQueryMedians reads the r18 field order (min/max maps BEFORE " +
      "the medians, summary fields last) without matching queries_min") {
    // the r18 emission layout: the driver wrapper keeps only a 2000-char
    // TAIL of the line, so the medians map prints directly before the
    // {failures, contended, metric, unit, value, sf} summary — and the
    // regex must skip the queries_min/queries_max maps that now precede it
    val line = """{"reps":3,"remeasured":[],"drift":{},""" +
      """"queries_min":{"q1_agg":0.40,"q47_range_join":0.50},""" +
      """"queries_max":{"q1_agg":0.60,"q47_range_join":0.70},""" +
      """"queries":{"q1_agg":0.510000,"q47_range_join":0.550000},""" +
      """"failures":{},"contended":false,""" +
      """"metric":"total","unit":"sec","value":1.06,"sf":"sf0.1"}"""
    assert(Bench.parseQueryMedians(line) ===
      Map("q1_agg" -> 0.51, "q47_range_join" -> 0.55))
    // a truncated TAIL of that line (the wrapper's 2000-char window) still
    // carries parseable medians plus the headline value
    val tail = line.substring(line.indexOf(""""queries":"""))
    assert(Bench.parseQueryMedians("{" + tail) ===
      Map("q1_agg" -> 0.51, "q47_range_join" -> 0.55))
    assert(tail.contains(""""value":"""))
  }

  test("parseQueryMedians reads the driver wrapper's escaped, truncated tail") {
    // the r5 failure mode's sibling: the driver stores the bench line
    // ESCAPED inside a "tail" string that may be cut off mid-object
    val wrapper = """{"n": 5, "rc": 0, "tail": "{\"metric\":\"total\",""" +
      """\"queries\":{\"q1_agg\":0.51,\"q38_approx_stats\":71.55,\"q8_win"""
    val m = Bench.parseQueryMedians(wrapper)
    assert(m === Map("q1_agg" -> 0.51, "q38_approx_stats" -> 71.55))
  }

  test("r5 post-mortem: sustained contention (median~min) is caught by the " +
    "cross-round check and re-measured") {
    // recorded r5 stats: contention spanned all reps, so median ~ min and
    // the 2x-min intra-rep check is structurally blind — only the
    // previous-round comparison can fire
    val stats = Map(
      "q38_approx_stats" -> q(71.55, min = 65.7, max = 73.0),
      "q8_window_running" -> q(47.01, min = 45.2, max = 48.1),
      "q59_pack_sequences" -> q(30.55, min = 29.8, max = 31.2),
      "q72_source_drift" -> q(19.02, min = 18.5, max = 19.6),
      "q1_agg" -> q(0.51, min = 0.49, max = 0.55))
    // prev = min across historical records (r4 medians / clean re-measures)
    val prev = Map("q38_approx_stats" -> 0.50, "q8_window_running" -> 0.35,
      "q59_pack_sequences" -> 0.29, "q72_source_drift" -> 1.39,
      "q1_agg" -> 0.45)
    val clean = Map("q38_approx_stats" -> q(0.50), "q8_window_running" -> q(0.35),
      "q59_pack_sequences" -> q(0.29), "q72_source_drift" -> q(1.39))
    val (cleaned, flagged) =
      Bench.applyPerQuerySentinel(stats, prev, n => clean(n))
    assert(flagged === List("q38_approx_stats", "q59_pack_sequences",
      "q72_source_drift", "q8_window_running"))
    assert(cleaned("q38_approx_stats").median === 0.50)
    assert(cleaned("q72_source_drift").median === 1.39)
    assert(cleaned("q1_agg") === stats("q1_agg")) // in-band query untouched
  }

  test("shared-artifact groups name only registered queries, generator " +
    "first, no query in two groups") {
    val all = Bench.SharedGroups.values.flatten.toSeq
    assert(all.distinct === all) // a query must not be billed under two groups
    all.foreach(n => assert(SparkEntry.queries.contains(n), n))
    // q67 IS the postings artifact (the winnow every member tracks) — it
    // must pay that materialization, so it leads the graph group's
    // measurement order; q68 follows as the edge-list generator
    assert(Bench.SharedGroups("graph").take(2) ===
      Seq("q67_winnowing", "q68_containment"))
  }

  test("mergeMin takes the per-query minimum across record sources") {
    val merged = Bench.mergeMin(Seq(
      Map("q1" -> 0.6, "q2" -> 5.0),        // contaminated older record
      Map("q1" -> 0.5, "q3" -> 1.0),        // cleaner newer record
      Map.empty[String, Double]))           // unparseable wrapper
    assert(merged === Map("q1" -> 0.5, "q2" -> 5.0, "q3" -> 1.0))
  }
}
