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

  test("q108 drift: hand-computed TVD and chi2 on a crafted two-day fixture, gap days emit nothing") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    // day 0: values 10, 30      -> buckets 0, 1     -> p = [.5, .5, 0, ...]
    // day 1: values 5,20,30,80  -> buckets 0,0,1,3  -> p = [.5, .25, 0, .25, ...]
    // day 3: isolated (day 2 missing) -> must not appear in the output
    val ev = Seq(
      (0L, 10.0), (0L, 30.0),
      (86400L, 5.0), (86400L, 20.0), (86400L, 30.0), (86400L, 80.0),
      (3L * 86400L, 100.0))
      .toDF("sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Events.valueDriftOn(ev).collect()
    graft.CachedFrames.drain()
    assert(got.length === 1)
    val r = got.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 4L)
    // fold adds bucket contributions in bucket order; zeros are exact
    assert(r.getDouble(2) === (0.0 + 0.25 + 0.0 + 0.25) / 2.0)
    val chi2 = ((0.25 - 0.5) * (0.25 - 0.5)) / (0.25 + 0.5) + (0.25 * 0.25) / 0.25
    assert(r.getDouble(3) === chi2)
  }

  test("q108 drift: NULL values leave the histogram AND n_events; negatives clamp into bucket 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    // day 0: -3.0 (clamps to bucket 0), 30 (bucket 1)
    // day 1: NULL (dropped entirely), 10 (bucket 0), 30 (bucket 1)
    // identical normalized histograms -> tvd = chi2 = 0; day 1 counts 2 rows
    val ev = Seq(
      (0L, Some(-3.0)), (0L, Some(30.0)),
      (86400L, None: Option[Double]), (86400L, Some(10.0)), (86400L, Some(30.0)))
      .toDF("sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Events.valueDriftOn(ev).collect()
    graft.CachedFrames.drain()
    assert(got.length === 1)
    val r = got.head
    assert(r.getLong(0) === 1L)
    assert(r.getLong(1) === 2L, "NULL must not count toward n_events")
    assert(r.getDouble(2) === 0.0 && r.getDouble(3) === 0.0)
  }

  test("q108 drift on the synthetic table: every adjacent day pair scored, metrics in range") {
    val got = Events.q108ValueDrift(spark, "/root/testdata/sf0.001").collect()
    graft.CachedFrames.drain()
    val days = got.map(_.getLong(0)).sorted
    assert(days.length === 29) // 30 consecutive days -> 29 adjacent pairs
    assert(days.zip(days.tail).forall { case (a, b) => b == a + 1 })
    got.foreach { r =>
      assert(r.getLong(1) > 0L)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0, r.toString)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 2.0, r.toString)
    }
  }

  test("q123 SCD intervals: runs compress, intervals chain, the current run stays open") {
    val sf = "/root/testdata/sf0.001"
    val rows = Events.q123ScdIntervals(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (uid, rs) =>
      val byRun = rs.sortBy(_.getInt(1))
      // run ids are 1..n and intervals chain: each run's valid_to equals the
      // next run's valid_from; only the LAST run is open (null valid_to)
      assert(byRun.map(_.getInt(1)).toSeq === (1 to byRun.length))
      byRun.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.isNullAt(4) && a.getLong(4) === b.getLong(3), s"user $uid")
          // adjacent runs never share a type — else they'd be one run
          assert(a.getString(2) !== b.getString(2), s"user $uid")
        case _ => ()
      }
      assert(byRun.last.isNullAt(4), s"user $uid last run must be open")
      assert(byRun.forall(_.getLong(5) >= 1L))
    }
    // compression is real: total runs < total events
    val nEvents = spark.read.parquet(s"$sf/events.parquet").count()
    assert(rows.length.toLong < nEvents)
  }

  test("q124 event paths: leaderboard is consistent with a recount of its own paths") {
    val rows = Events.q124EventPaths(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length <= Events.PathTopK && rows.nonEmpty)
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "sorted by count desc")
    rows.foreach { r =>
      val parts = r.getString(0).split(">")
      assert(parts.length === Events.PathLen, r.getString(0))
      assert(r.getLong(1) >= 1L)
    }
  }

  test("q126 rolling anomaly: spike flags after warm-up, warm-up never flags, the window excludes the spike itself") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    // user 1: six steady 10.00s, then a 50.00 spike, then back to 10.00.
    // user 2: a wild jump at its SECOND event — history too short to flag.
    val ev = Seq(
      (1L, 1L, 0L, 10.0), (1L, 2L, 60L, 10.0), (1L, 3L, 120L, 10.0),
      (1L, 4L, 180L, 10.0), (1L, 5L, 240L, 10.0), (1L, 6L, 300L, 10.0),
      (1L, 7L, 360L, 50.0),                     // 6 steady priors -> flag
      (1L, 8L, 420L, 10.0),                     // spike inflates var -> no flag
      (2L, 9L, 0L, 10.0), (2L, 10L, 60L, 500.0) // 1 prior < MinPrior -> no flag
    ).toDF("user_id", "event_id", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Events.rollingAnomalyOn(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    graft.CachedFrames.drain()
    // exactly the spike: 6-row window, mean 10.00; cross-multiplied test is
    // (6*5000 - 6000)^2 = 5.76e8 > 9 * (6*6e6 - 3.6e7) = 0
    assert(got.toSeq === Seq((1L, 7L, 360L, 5000L, 6L, 10.0)))
  }

  test("q126 rolling anomaly: a zero-variance window flags ANY deviation, and the integer test is two-sided") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    // five identical values then a DOWNWARD step of one cent: variance 0,
    // deviation != 0 -> flagged (strict > on the cross-multiplied form)
    val ev = (1 to 5).map(i => (1L, i.toLong, i * 60L, 2.00))
      .:+((1L, 6L, 360L, 1.99))
      .toDF("user_id", "event_id", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Events.rollingAnomalyOn(ev).collect()
    graft.CachedFrames.drain()
    assert(got.map(_.getLong(1)).toSeq === Seq(6L))
    assert(got.head.getLong(3) === 199L) // floor(1.99*100 + 0.5)
  }

  test("q126 rolling anomaly: the DECIMAL sigma test stays exact at $50M " +
    "events (a BIGINT s2 would wrap at |cents| ~ 5e9)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    // six identical $50M events (cents 5e9: s2 = 6·2.5e19 overflows BIGINT),
    // then a $51M jump — zero prior variance, so the jump MUST flag and the
    // steady rows must not; wrapped arithmetic scrambles exactly this
    val v = 5.0e7
    val ev = ((1 to 6).map(i => (1L, i.toLong, i * 60L, v)) :+
        ((1L, 7L, 7 * 60L, v * 1.02)))
      .toDF("user_id", "event_id", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Events.rollingAnomalyOn(ev).collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    graft.CachedFrames.drain()
    assert(got.keySet === Set(7L)) // only the jump flags
    assert(got(7L) === math.floor(v * 1.02 * 100.0 + 0.5).toLong)
  }

  test("q132 Markov transitions: hand-computed counts and row-normalized probabilities on a crafted stream") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    // user 1: A B A B   -> A>B, B>A, A>B ; user 2: A B -> A>B
    val ev = Seq(
      (1L, 1L, 0L, "A"), (1L, 2L, 60L, "B"), (1L, 3L, 120L, "A"),
      (1L, 4L, 180L, "B"),
      (2L, 5L, 0L, "A"), (2L, 6L, 60L, "B"))
      .toDF("user_id", "event_id", "sec", "event_type")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Events.markovTransitionsOn(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    graft.CachedFrames.drain()
    assert(got === Map(
      ("A", "B") -> ((3L, 3L, 1.0)),  // every A is followed by B
      ("B", "A") -> ((1L, 1L, 1.0)))) // the one non-terminal B goes back to A
    // each user's last event produces no transition: 6 events, 4 transitions
    assert(got.values.map(_._1).sum === 4L)
  }

  test("q134 RFM: hand-checked quintiles on ten crafted users, exact money sums, null rows excluded") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    // user u (1..10): last event at u*100 s, u events, each worth u dollars
    // -> every dimension orders users 1..10 identically; ntile(5) over 10
    // rows = 2 per bucket, so scores are ceil(u/2) across all three
    val rows = (1L to 10L).flatMap { u =>
      (1L to u).map(i => (Option(u), u * 100L + i, Option(u.toDouble)))
    } :+ ((Option.empty[Long], 1L, Option(9.0))) :+ ((Option(1L), 2L, Option.empty[Double]))
    val ev = rows.zipWithIndex
      .map { case ((uid, sec, v), i) => (uid, i.toLong + 1L, sec, v) }
      .toDF("user_id", "event_id", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Events.rfmOn(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7)))).toMap
    graft.CachedFrames.drain()
    assert(got.keySet === (1L to 10L).toSet) // the null rows contributed nothing
    (1L to 10L).foreach { u =>
      val s = ((u + 1) / 2).toInt
      assert(got(u) === ((u * 100L + u, u, u * u * 100L, s, s, s,
        s * 100 + s * 10 + s)), s"user $u")
    }
  }

  test("q134 RFM distributed rank equals the ntile windows on a skewed, " +
    "non-divisible fixture (ties, n % buckets != 0)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // 23 users (23 % 5 != 0 — remainder buckets differ in size), heavy ties
    // on every metric (spend/count collide mod 4), one whale user
    val rows = (1L to 23L).flatMap { u =>
      val k = u % 4 + 1
      (1L to k).map(i => (u, u * 50L + i, (k * 3).toDouble))
    } ++ (1L to 40L).map(i => (99L, 5000L + i, 0.07))
    val ev = rows.zipWithIndex
      .map { case ((uid, sec, v), i) => (uid, i.toLong + 1L, sec, v) }
      .toDF("user_id", "event_id", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Events.rfmOn(ev, cache = false).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    // reference: the single-partition ntile windows rfmOn replaced
    val per = ev.select(col("user_id"), unix_timestamp(col("ts")).as("eps"),
        expr("CAST(floor(value * 100.0D + 0.5D) AS BIGINT)").as("cents"))
      .groupBy(col("user_id"))
      .agg(max(col("eps")).as("last_eps"), count(lit(1)).as("n_events"),
        sum(col("cents")).as("sum_cents"))
    val ref = per
      .withColumn("r_score", ntile(Events.RfmBuckets)
        .over(Window.orderBy(col("last_eps").asc, col("user_id").asc)))
      .withColumn("f_score", ntile(Events.RfmBuckets)
        .over(Window.orderBy(col("n_events").asc, col("user_id").asc)))
      .withColumn("m_score", ntile(Events.RfmBuckets)
        .over(Window.orderBy(col("sum_cents").asc, col("user_id").asc)))
      .withColumn("rfm",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(got === ref)
  }

  test("q138 stickiness: hand-checked trailing windows, repeat-visit dedup, null-user exclusion") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    // u1 active every day 0-9 (twice on day 0 — presence must dedup),
    // u2 only day 3, u3 days 0 and 9; plus a null-user row that counts nowhere
    val secs: Seq[(Option[Long], Long)] =
      (0L to 9L).map(d => (Option(1L), d * 86400L + 10L)) ++
        Seq((Option(1L), 50L), (Option(2L), 3L * 86400L + 5L),
          (Option(3L), 7L), (Option(3L), 9L * 86400L + 99L),
          (Option.empty[Long], 4L * 86400L + 1L))
    val ev = secs.zipWithIndex
      .map { case ((uid, sec), i) => (uid, i.toLong + 1L, sec) }
      .toDF("user_id", "event_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Events.stickinessOn(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    graft.CachedFrames.drain()
    val dau = Map(0L -> 2L, 3L -> 2L, 9L -> 2L).withDefaultValue(1L)
    // trailing-7 active sets: u3's day-0 visit ages out after day 6, u2's
    // day-3 visit enters at day 3 and persists through day 9
    val wau = Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 3L,
      5L -> 3L, 6L -> 3L, 7L -> 2L, 8L -> 2L, 9L -> 3L)
    assert(got.keySet === (0L to 9L).toSet)
    (0L to 9L).foreach { d =>
      assert(got(d) === ((dau(d), wau(d), dau(d).toDouble / wau(d).toDouble)),
        s"day $d")
    }
  }

  test("q141 activity trend: hand-computed OLS slopes (rising, falling, " +
    "single-day null), null users excluded") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    // u1: days 0,1,2 with 2,4,6 events -> slope 2; u2: one day -> NULL;
    // u3: days 10,20 with 5,1 -> slope -0.4; null user ignored
    val rows: Seq[(Option[Long], Long)] =
      (for { (d, y) <- Seq((0L, 2), (1L, 4), (2L, 6)); i <- 1 to y }
        yield (Option(1L), d * 86400L + i)) ++
      (1 to 3).map(i => (Option(2L), 5L * 86400L + i)) ++
      (for { (d, y) <- Seq((10L, 5), (20L, 1)); i <- 1 to y }
        yield (Option(3L), d * 86400L + i)) ++
      Seq((Option.empty[Long], 86400L))
    val ev = rows.zipWithIndex
      .map { case ((u, sec), i) => (u, i.toLong + 1L, sec) }
      .toDF("user_id", "event_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Events.activityTrendOn(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got === Map(
      1L -> ((3L, 12L, Some(2.0))),
      2L -> ((1L, 3L, None)),
      3L -> ((2L, 6L, Some(-0.4)))))
  }

  test("q148 ewma: hand-computed tap weights over the active-day sequence " +
    "(gap days skipped, not zero-filled), single-day user, null user dropped") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    // u1 active days 10, 11, 13 (12 is a gap) with 2, 4, 8 events:
    //   num = 8*2^19 + 4*2^18 + 2*2^17 = 5505024, den = 2^19+2^18+2^17
    //        = 917504 -> ewma = 6.0 exactly
    // u2: one day with 3 events -> ewma = 3.0
    val rows: Seq[(Option[Long], Long)] =
      (for { (d, y) <- Seq((10L, 2), (11L, 4), (13L, 8)); i <- 1 to y }
        yield (Option(1L), d * 86400L + i)) ++
      (1 to 3).map(i => (Option(2L), 20L * 86400L + i)) ++
      Seq((Option.empty[Long], 86400L))
    val ev = rows.zipWithIndex
      .map { case ((u, sec), i) => (u, i.toLong + 1L, sec) }
      .toDF("user_id", "event_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Events.ewmaOn(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(got === Map(
      1L -> ((3L, 13L, 5505024L, 917504L, 6.0)),
      2L -> ((1L, 20L, 3L * (1L << 19), 1L << 19, 3.0))))
  }

  test("q151 cusum: hand-computed integer walk (level shift peaks, " +
    "constant series scores zero at its first day)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    // A: days 0..3 with 1,1,5,5 -> n=4 tot=12, nM=-8,-16,-8,0,
    //    cusum_n = 0,0,8,16 -> max 16 at day 3, max_cusum 4.0
    // B: days 0..2 constant 2 -> cusum_n all 0, peak = earliest day 0
    val rows: Seq[(String, Long)] =
      (for { (d, y) <- Seq((0L, 1), (1L, 1), (2L, 5), (3L, 5)); i <- 1 to y }
        yield ("A", d * 86400L + i)) ++
      (for { d <- 0L to 2L; i <- 1 to 2 } yield ("B", d * 86400L + i))
    val ev = rows.zipWithIndex
      .map { case ((t, sec), i) => (t, i.toLong + 1L, sec) }
      .toDF("event_type", "event_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Events.cusumOn(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(got === Map(
      "A" -> ((4L, 12L, 16L, 3L, 4.0)),
      "B" -> ((3L, 6L, 0L, 0L, 0.0))))
  }

  test("q152 itemsets: pair and triple supports on hand-built baskets, " +
    "below-support itemsets dropped, duplicate events collapse") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    // users 1-6: {A,B,C}; users 7-9: {A,B}; user 10: {A,D}
    // supports: A|B=9, A|C=6, B|C=6, A|B|C=6; A|D=1 (dropped)
    val rows: Seq[(Option[Long], String)] =
      (for { u <- 1L to 6L; t <- Seq("A", "B", "C", "C") }
        yield (Option(u), t)) ++
      (for { u <- 7L to 9L; t <- Seq("A", "B") } yield (Option(u), t)) ++
      Seq((Option(10L), "A"), (Option(10L), "D"),
        (Option.empty[Long], "A"))
    val ev = rows.zipWithIndex
      .map { case ((u, t), i) => (u, t, i.toLong + 1L, 86400L + i) }
      .toDF("user_id", "event_type", "event_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Events.itemsetsOn(ev).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got === Map(
      "A|B" -> ((2, 9L)), "A|C" -> ((2, 6L)), "B|C" -> ((2, 6L)),
      "A|B|C" -> ((3, 6L))))
  }

  test("q155 conversion lag: first-view anchoring (a purchase BEFORE any " +
    "view does not convert), rank-exact percentiles over the two lags") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val rows: Seq[(Long, String, Long)] = Seq(
      (1L, "view", 100L), (1L, "purchase", 160L),          // lag 60
      (2L, "purchase", 50L), (2L, "view", 80L), (2L, "purchase", 200L), // 120
      (3L, "view", 10L),                                   // never converts
      (4L, "purchase", 10L))                               // no prior view
    val ev = rows.zipWithIndex
      .map { case ((u, t, sec), i) => (u, t, i.toLong + 1L, sec) }
      .toDF("user_id", "event_type", "event_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Events.conversionLagOn(ev).collect()
    assert(got.length === 1)
    // n=2: p50 at rank (2+1)//2=1 -> 60; p90/p99 at rank 2 -> 120
    assert((got(0).getLong(0), got(0).getLong(1), got(0).getLong(2),
      got(0).getLong(3)) === ((2L, 60L, 120L, 120L)))
  }

  test("q157 burstiness: exact -1 for a metronome, a hand-exact bursty " +
    "user (varn is a perfect square), degenerate users NULL") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val rows: Seq[(Long, Long)] = Seq(
      (1L, 0L), (1L, 10L), (1L, 20L), (1L, 30L), // gaps 10,10,10 -> B=-1
      (2L, 0L), (2L, 1L), (2L, 100L), // gaps 1,99: varn=9604=98^2 -> -1/99
      (3L, 5L),                       // no gaps
      (4L, 7L), (4L, 7L))             // one zero gap -> below min
    val ev = rows.zipWithIndex
      .map { case ((u, sec), i) => (u, i.toLong + 1L, sec) }
      .toDF("user_id", "event_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Events.burstinessOn(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(got === Map(
      1L -> ((4L, 3L, Some(-1.0))),
      2L -> ((3L, 2L, Some(-2.0 / 198.0))),
      3L -> ((1L, 0L, None)),
      4L -> ((2L, 1L, None))))
  }

  test("q160 cuped: hand-computed theta and adjusted means replayed in the " +
    "operator's exact double order") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    // days 0..3 -> mid = 2; x = pre cents, y = post cents per user:
    // u0:(100,200) u2:(300,400) | u1:(100,300) u3:(500,500)
    val rows: Seq[(Long, Long, Double)] = Seq(
      (0L, 0L, 1.0), (0L, 3L, 2.0), (2L, 0L, 3.0), (2L, 3L, 4.0),
      (1L, 0L, 1.0), (1L, 3L, 3.0), (3L, 0L, 5.0), (3L, 3L, 5.0))
    val ev = rows.zipWithIndex
      .map { case ((u, d, v), i) => (u, i.toLong + 1L, d * 86400L + 1L, v) }
      .toDF("user_id", "event_id", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Events.cupedOn(ev).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // pooled: n=4 sx=1000 sy=1400 sxy=420000 sxx=360000
    // covn=280000 varn=440000
    val theta = 280000.0 / 440000.0
    val adj0 = (600.0 / 2.0 - theta * (400.0 / 2.0 - 1000.0 / 4.0)) / 100.0
    val adj1 = (800.0 / 2.0 - theta * (600.0 / 2.0 - 1000.0 / 4.0)) / 100.0
    assert(got === Map(
      0 -> ((2L, theta, 600.0 / (100.0 * 2.0), adj0)),
      1 -> ((2L, theta, 800.0 / (100.0 * 2.0), adj1))))
    // the adjustment moved the estimates toward each other (whale noise out)
    assert(adj0 > 3.0 && adj1 < 4.0)
  }

  test("q161 srm: a balanced day passes, a skewed day flags at the exact " +
    "cross-multiplied 3.8415 boundary, repeat activity collapses") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    // day 0: users 0..9 (5/5 split, one user twice) -> chi2=0, no flag
    // day 1: users 0,2,4,6,8,10 vs 1 -> (6-1)^2/7 = 25/7 < 3.8415: no flag
    // day 2: 0,2,4,6,8,10 vs none -> 36/6 = 6 > 3.8415: flag
    val rows: Seq[(Long, Long)] =
      (0L to 9L).map(u => (u, 0L)) ++ Seq((0L, 0L)) ++
      (Seq(0L, 2L, 4L, 6L, 8L, 10L, 1L).map(u => (u, 1L))) ++
      (Seq(0L, 2L, 4L, 6L, 8L, 10L).map(u => (u, 2L)))
    val ev = rows.zipWithIndex
      .map { case ((u, d), i) => (u, i.toLong + 1L, d * 86400L + i) }
      .toDF("user_id", "event_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Events.srmCheckOn(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5)))).toMap
    assert(got === Map(
      0L -> ((10L, 5L, 5L, 0.0, false)),
      1L -> ((7L, 6L, 1L, 25.0 / 7.0, false)),
      2L -> ((6L, 6L, 0L, 6.0, true))))
  }

  test("q162 winsorized means: pooled p99 cap clips exactly the top two " +
    "users, one in each arm; raw means stay whale-skewed") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    // users 1..200, user u spends u dollars once -> y = 100u cents;
    // pooled cap at rank ceil(0.99*200)=198 -> 19800; users 199 & 200 clip
    val rows: Seq[(Long, Double)] = (1L to 200L).map(u => (u, u.toDouble))
    val ev = rows.zipWithIndex
      .map { case ((u, v), i) => (u, i.toLong + 1L, 86400L + i, v) }
      .toDF("user_id", "event_id", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Events.winsorizedMeansOn(ev).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // odd arm: sum odd = 100^2 -> raw 100.0; winsorized replaces 19900
    // with 19800 -> (9801*100 + 19800)/1e4 = 99.99
    // even arm: raw 101.0; 20000 -> 19800 -> (9900*100 + 19800)/1e4 = 100.98
    assert(got === Map(
      1 -> ((100L, 19800L, 100.0, 99.99)),
      0 -> ((100L, 19800L, 101.0, 100.98))))
  }

  test("q171 periodic-refresh law: merging per-wave user totals and " +
    "recomputing equals the full MDE — a cross-wave user merges before " +
    "the variance (which is not additive)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, sum => fsum}
    // user 1 spends in BOTH waves — summing per-wave variances would be
    // wrong; summing per-user totals first is the law
    val base = Seq((1L, 1.00), (2L, 2.00), (3L, 3.00)).toDF("user_id", "value")
    val delta = Seq((1L, 5.00), (4L, 1.50), (6L, 2.25)).toDF("user_id", "value")
    val union = base.unionByName(delta)
    val merged = Events.spendByUser(base)
      .unionByName(Events.spendByUser(delta))
      .groupBy(col("user_id")).agg(fsum(col("y")).as("y"))
    val incremental = Events.mdeOfUsers(merged).collect().map(_.toSeq).toSet
    val full = Events.mdeOn(union).collect().map(_.toSeq).toSet
    assert(incremental === full)
    assert(full.head(3) != null) // both arms have n >= 2 → a real MDE
  }

  test("q181 churn labels: label comes from week w+1 only, the censored " +
    "final week never emits, features roll up exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    // user 1: wk0 (two events, two days) and wk1 → label TRUE at wk0
    // user 2: wk0 only → label FALSE at wk0
    // user 3: wk1 only → right-censored, no row at all
    val events = Seq(
      (1L, 100L, 1.00), (1L, 90000L, 2.00), (1L, 604900L, 1.00),
      (2L, 200L, 5.00),
      (3L, 605000L, 9.00))
      .toDF("user_id", "e", "value")
      .withColumn("ts", expr("timestamp_seconds(e)"))
    val got = Events.churnLabelsOn(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    graft.CachedFrames.drain()
    assert(got === Map(
      (1L, 0L) -> ((2L, 2L, 300L, true)),
      (2L, 0L) -> ((1L, 1L, 500L, false))))
  }

  test("q177 Benford: hand digits count exactly, absent digits still " +
    "report zero, deviations use the shared literal expectations") {
    import spark.implicits._
    // cents: 100 → digit 1, 250/299 → digit 2, 999 → digit 9; no 3..8
    val events = Seq(1.00, 2.50, 2.99, 9.99).toDF("value")
    val got = Events.benfordOn(events).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet === (1 to 9).toSet)
    assert(got(1)._1 === 1L && got(2)._1 === 2L && got(9)._1 === 1L)
    (3 to 8).foreach(d => assert(got(d)._1 === 0L))
    assert(got(2)._2 === 0.5)
    (1 to 9).foreach { d =>
      assert(got(d)._3 === Events.BenfordP(d - 1))
      assert(got(d)._4 === got(d)._2 - Events.BenfordP(d - 1))
    }
  }

  test("q174 MAD: hand fixture — median is the rank-ceil(n/2) value, MAD " +
    "ignores the whale that would quadruple a variance") {
    import spark.implicits._
    // per-user cents: 100, 200, 300, 1000 → median = rank-2 value = 200;
    // |y-200| = 100, 0, 100, 800 → MAD = rank-2 value = 100
    val events = Seq((1L, 1.00), (2L, 2.00), (3L, 3.00), (4L, 10.00))
      .toDF("user_id", "value")
    val got = Events.madOn(events).collect()(0)
    graft.CachedFrames.drain()
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ===
      ((4L, 200L, 100L)))
    assert(got.getDouble(3) === 2.0 && got.getDouble(4) === 1.0)
  }

  test("q171 MDE: hand moments reproduce the z-formula bitwise; a " +
    "one-user arm reports NULL instead of dividing by zero") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // v0 = users 2,4 (y = 100, 300 cents) → s² = 20000; v1 = users 1,3
    // (y = 300, 400 cents: 1.00+2.00 and 4.00) → s² = 5000
    val events = Seq((1L, 1.00), (1L, 2.00), (3L, 4.00), (2L, 1.00),
      (4L, 3.00)).toDF("user_id", "value")
    val got = Events.mdeOn(events).collect()(0)
    assert((got.getLong(0), got.getLong(1)) === ((2L, 2L)))
    assert(got.getDouble(2) === 2.0) // mean0 = (100+300)/2/100
    val expected = (Events.MdeZAlpha + Events.MdeZPower) *
      math.sqrt(20000.0 / 2.0 + 5000.0 / 2.0) / 100.0
    assert(got.getDouble(3) === expected)
    assert(got.getDouble(4) === expected / 2.0)
    // n1 = 1: variance undefined → NULL mde, NULL relative
    val lone = Seq((1L, 5.00), (2L, 1.00), (4L, 2.00))
      .toDF("user_id", "value")
    val l = Events.mdeOn(lone).select(col("mde_abs"), col("mde_rel"))
      .collect()(0)
    assert(l.isNullAt(0) && l.isNullAt(1))
  }

  test("q190 Mann–Whitney engine: U and the tie-corrected z are bitwise " +
    "equal to the plain-Scala brute pair count on a tie-heavy fixture; " +
    "an all-tied sample reports NULL z") {
    import spark.implicits._
    // (q, pos, neg) blocks with heavy ties across the arms
    val blocks = Seq((10L, 3L, 1L), (20L, 0L, 4L), (30L, 2L, 2L),
      (40L, 1L, 0L), (50L, 2L, 3L))
    val perScore = blocks.map { case (q, p, n) => (q.toDouble, p, n) }
      .toDF("q", "pos", "neg")
    // brute: U = #(pos value > neg value) + ties/2, via expansion
    val posVals = blocks.flatMap { case (q, p, _) => Seq.fill(p.toInt)(q) }
    val negVals = blocks.flatMap { case (q, _, n) => Seq.fill(n.toInt)(q) }
    val u2Brute = (for (a <- posVals; b <- negVals) yield {
      if (a > b) BigInt(2) else if (a == b) BigInt(1) else BigInt(0)
    }).sum
    val np = posVals.size; val nn = negVals.size; val bigNv = np + nn
    val tcorr = blocks.map { case (_, p, n) =>
      val t = BigInt(p + n); t * t * t - t
    }.sum
    val varTerm = BigInt(bigNv).pow(3) - bigNv - tcorr
    val zBrute = (u2Brute - BigInt(np) * nn).toDouble /
      (2 * math.sqrt((BigInt(np) * nn).toDouble * varTerm.toDouble /
        (BigInt(12) * bigNv * (bigNv - 1)).toDouble))
    val got = Events.mwuOfCounts(perScore).collect()(0)
    graft.CachedFrames.drain()
    assert((got.getLong(0), got.getLong(1)) === ((np.toLong, nn.toLong)))
    assert(got.getDouble(2) === u2Brute.toDouble / 2)
    assert(got.getDouble(3) === zBrute) // bitwise
    // every observation tied at one value → σ² = 0 → NULL, not ±Inf
    val tied = Seq((7.0, 3L, 4L)).toDF("q", "pos", "neg")
    val t = Events.mwuOfCounts(tied).collect()(0)
    graft.CachedFrames.drain()
    assert(t.getDouble(2) === 6.0) // all 12 pairs tied: U = n₀n₁/2
    assert(t.isNullAt(3))
  }

  test("q206 window funnel: boundary deadlines are inclusive, a click " +
    "before the first view does not anchor, a purchase one second past " +
    "the 24h line is out") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val H = 3600L; val D = 86400L
    val rows = Seq(
      // u1: click exactly at v+1h (IN), purchase exactly at c+24h (IN)
      (1L, "view", 1000L), (1L, "click", 1000L + H),
      (1L, "purchase", 1000L + H + D),
      // u2: pre-view click ignored; first click after view at v+1h+1 (OUT)
      (2L, "click", 500L), (2L, "view", 1000L), (2L, "click", 1000L + H + 1),
      // u3: same-second click (IN); purchase at c+24h+1 (OUT)
      (3L, "view", 2000L), (3L, "click", 2000L),
      (3L, "purchase", 2000L + D + 1),
      // u4: view only
      (4L, "view", 9000L),
      // u5: purchase before the qualifying click does not count; the one
      // after it is inside the window (IN)
      (5L, "view", 100L), (5L, "click", 200L), (5L, "purchase", 50L),
      (5L, "purchase", 300L))
    val ev = rows.toDF("user_id", "event_type", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val r = Events.windowFunnelOn(ev).collect()(0)
    graft.CachedFrames.drain()
    // viewers: u1..u5 = 5; clicked in 1h: u1, u3, u5 = 3; purchased: u1, u5
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((5L, 3L, 2L)))
    assert(r.getDouble(3) === 3.0 / 5.0)
    assert(r.getDouble(4) === 2.0 / 3.0)
  }

  test("q208 new vs returning: first-seen day counts as new, later days " +
    "as returning, duplicate same-day events collapse, null user drops") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val D = 86400L
    val rows = Seq(
      (Some(1L), 10L), (Some(1L), 20L),          // u1 day 0 (dedups), new
      (Some(2L), D + 5L),                        // u2 day 1, new
      (Some(1L), D + 9L),                        // u1 day 1, returning
      (Some(1L), 3 * D + 1L),                    // u1 day 3, returning
      (Option.empty[Long], 10L))                 // dropped
    val ev = rows.toDF("user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Events.newReturningOn(ev).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    graft.CachedFrames.drain()
    assert(got === Map(
      0L -> ((1L, 1L, 0L, 1.0)),
      1L -> ((2L, 1L, 1L, 0.5)),
      3L -> ((1L, 0L, 1L, 0.0))))
  }

  test("q209 traffic grid: the dow/hour keys land where the epoch says " +
    "(day 0 was a Thursday), the grid is the observed cross, and an " +
    "independent fixture scores lift 1 everywhere") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val D = 86400L; val H = 3600L
    // epoch 0 = Thu 00:00 → dow (0+4)%7 = 4; +3 days = Sunday → dow 0
    val ev = Seq(0L, 3 * D + 13 * H + 59L, 10 * D + 23 * H)
      .toDF("sec").withColumn("ts", timestamp_seconds(col("sec")))
    val got = Events.trafficGridOn(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    graft.CachedFrames.drain()
    // 10 days later = Sunday again (3 % 7 == 10 % 7)
    assert(got.filter(_._2 > 0) ===
      Map((4L, 0L) -> 1L, (0L, 13L) -> 1L, (0L, 23L) -> 1L))
    assert(got.keySet === (for (d <- Seq(4L, 0L); h <- Seq(0L, 13L, 23L))
      yield (d, h)).toSet)
    // perfectly independent 2×2 arrival pattern → lift exactly 1
    val ind = (Seq.fill(4)((0L, 0L)) ++ Seq.fill(2)((0L, 1L)) ++
      Seq.fill(2)((1L, 0L)) ++ Seq.fill(1)((1L, 1L)))
      .map { case (d, h) => d * D + h * H }
      .toDF("sec").withColumn("ts", timestamp_seconds(col("sec")))
    val lifts = Events.trafficGridOn(ind).collect().map(_.getDouble(5))
    graft.CachedFrames.drain()
    assert(lifts.forall(_ === 1.0))
  }

  test("q219 Kruskal-Wallis: H and the tie-corrected H match the plain-" +
    "Scala midrank formula bitwise on a tie-heavy 3-group fixture; an " +
    "all-tied sample reports NULL") {
    import spark.implicits._
    val samples = Seq(
      (10L, "a"), (10L, "a"), (20L, "a"),
      (10L, "b"), (30L, "b"), (30L, "b"),
      (20L, "c"), (40L, "c"))
    def kw(xs: Seq[(Long, String)]): (Double, Option[Double]) = {
      val n = xs.size
      val byV = xs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val sortedV = byV.keys.toSeq.sorted
      val cumBefore = sortedV.scanLeft(0L)((acc, v) => acc + byV(v))
        .zip(sortedV :+ -1L).map(_.swap).toMap // v -> cum before
      def mr2(v: Long): Long = 2 * cumBefore(v) + byV(v) + 1
      val groups = xs.groupBy(_._2).toSeq.sortBy(_._1)
      val s = groups.map { case (_, g) =>
        val r2 = g.map(e => BigInt(mr2(e._1))).sum
        r2.toDouble * r2.toDouble / (4.0 * g.size.toDouble)
      }.foldLeft(0.0)(_ + _)
      val h = 12.0 * s / (BigInt(n) * (n + 1)).toDouble - 3.0 * (n + 1).toDouble
      val tie = byV.values.map(c => BigInt(c) * c * c - c).sum
      val cnum = BigInt(n).pow(3) - n - tie
      val hc = if (cnum > 0)
        Some(h / (cnum.toDouble / (BigInt(n).pow(3) - n).toDouble)) else None
      (h, hc)
    }
    val (hExp, hcExp) = kw(samples)
    val r = Events.valueKwOn(samples.toDF("q", "t")).collect()(0)
    graft.CachedFrames.drain()
    assert(r.getLong(0) === samples.size.toLong)
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(3) === hExp) // bitwise
    assert(Some(r.getDouble(4)) === hcExp)
    // every observation tied at one value → correction 0 → NULL
    val tied = Seq.fill(4)((7L, "a")) ++ Seq.fill(3)((7L, "b"))
    val r2 = Events.valueKwOn(tied.toDF("q", "t")).collect()(0)
    graft.CachedFrames.drain()
    assert(r2.isNullAt(4))
  }

  test("q215 type trends: per-type MK matches the plain-Scala formula " +
    "bitwise — a rising type, a constant type at NULL z, and a sparse " +
    "type judged on the GLOBAL zero-filled calendar") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val D = 86400L
    def mk(c: Seq[Long]): (Long, Long, Option[Double]) = {
      val n = c.size
      val s = (for (i <- c.indices; j <- i + 1 until n)
        yield (c(j) compare c(i)).sign.toLong).sum
      val tie = c.groupBy(identity).values.map(_.size.toLong)
        .map(t => t * (t - 1) * (t * 2 + 5)).sum
      val vn = n.toLong * (n - 1) * (n * 2 + 5) - tie
      val z = if (vn > 0) Some((if (s > 0) (s - 1).toDouble
        else if (s < 0) (s + 1).toDouble else 0.0) /
        math.sqrt(vn.toDouble / 18.0)) else None
      (s, vn, z)
    }
    // calendar spans days 0..3 (set by 'up'); counts per type per day:
    // up: [1,2,3,4]; flat: [2,2,2,2]; sparse: day 1 and 3 only → [0,2,0,1]
    val rows =
      (0 to 3).flatMap(d => Seq.fill(d + 1)(("up", d.toLong))) ++
      (0 to 3).flatMap(d => Seq.fill(2)(("flat", d.toLong))) ++
      (Seq.fill(2)(("sparse", 1L)) :+ (("sparse", 3L)))
    val ev = rows.toDF("event_type", "d")
      .withColumn("ts", timestamp_seconds(col("d") * D + 7L))
    val got = Events.typeTrendsOn(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
      .toMap
    graft.CachedFrames.drain()
    val series = Map("up" -> Seq(1L, 2L, 3L, 4L),
      "flat" -> Seq(2L, 2L, 2L, 2L), "sparse" -> Seq(0L, 2L, 0L, 1L))
    assert(got.keySet === series.keySet)
    series.foreach { case (t, c) =>
      val (s, vn, z) = mk(c)
      assert(got(t) === ((4L, s, vn, z)), t) // bitwise incl. NULL for flat
    }
  }

  test("q210 lifetime percentiles: rank-exact span picks on a hand " +
    "fixture with two single-day users and a long tail") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val D = 86400L
    // spans per user: u1 0, u2 0, u3 2, u4 5, u5 40
    val rows = Seq((1L, 0L), (1L, 100L), (2L, 5 * D),
      (3L, 0L), (3L, 2 * D + 7L),
      (4L, D), (4L, 6 * D),
      (5L, 0L), (5L, 40 * D + 3L))
    val ev = rows.toDF("user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val r = Events.lifetimePercentilesOn(ev).collect()(0)
    graft.CachedFrames.drain()
    // ranks over sorted spans [0,0,2,5,40]: p50 → rank 3 = 2,
    // p90 → rank ⌈4.5⌉ = 5 = 40, p99 → rank 5 = 40
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((5L, 2L, 40L, 40L, 2L)))
    assert(r.getDouble(5) === 2.0 / 5.0)
  }

  // the trend-family fixture: days 0,1,2,4,5 with a GAP at day 3 — the
  // dense series must read [3,1,4,0,1,5]; intra-day offsets exercise the
  // floor-to-day key
  private def trendEvents() = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val perDay = Seq(0 -> 3, 1 -> 1, 2 -> 4, 4 -> 1, 5 -> 5)
    perDay.flatMap { case (d, n) =>
      (0 until n).map(i => d.toLong * 86400L + (i * 40009L) % 86400L)
    }.toDF("sec").withColumn("ts", timestamp_seconds(col("sec")))
  }
  private val trendSeries = Seq(3L, 1L, 4L, 0L, 1L, 5L)

  test("q198 ACF: bitwise equal to the plain-Scala exact-deviation formula " +
    "on a gapped series (the gap day zero-fills), lags with no pairs " +
    "absent") {
    val c = trendSeries; val n = c.size; val tot = c.sum
    val dev = c.map(x => BigInt(n) * x - tot)
    val den = dev.map(d => d * d).sum
    val expected = (1 to 5).map { k =>
      val num = (0 until n - k).map(t => dev(t) * dev(t + k)).sum
      (k.toLong, (n - k).toLong, num.toDouble / den.toDouble)
    }
    val got = Events.acfOn(trendEvents()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    graft.CachedFrames.drain()
    assert(got.toSeq === expected) // lags 6,7 have no pairs on 6 days
  }

  test("q199 Mann–Kendall: S, the tie-corrected variance numerator and z " +
    "are bitwise equal to the plain-Scala formula; a constant series " +
    "reports NULL z") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val c = trendSeries; val n = c.size
    val s = (for (i <- c.indices; j <- i + 1 until n)
      yield (c(j) compare c(i)).sign.toLong).sum
    val tieTerm = c.groupBy(identity).values.map(_.size.toLong)
      .map(t => t * (t - 1) * (t * 2 + 5)).sum
    val varNum = n.toLong * (n - 1) * (n * 2 + 5) - tieTerm
    val zExp = (if (s > 0) (s - 1).toDouble
                else if (s < 0) (s + 1).toDouble else 0.0) /
      math.sqrt(varNum.toDouble / 18.0)
    val got = Events.mannKendallOn(trendEvents()).collect()(0)
    graft.CachedFrames.drain()
    assert(got.getLong(0) === n.toLong)
    assert(got.getLong(1) === s)
    assert(got.getLong(2) === varNum)
    assert(got.getDouble(3) === zExp) // bitwise
    // constant series: every pair tied → var_num = 0 → NULL z, S = 0
    val const = Seq(0L, 86400L, 2 * 86400L).toDF("sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val g2 = Events.mannKendallOn(const).collect()(0)
    graft.CachedFrames.drain()
    assert(g2.getLong(1) === 0L && g2.getLong(2) === 0L && g2.isNullAt(3))
  }

  test("q200 Theil–Sen: the rank-exact median of pairwise slopes matches " +
    "the plain-Scala sort on both an odd and an even pair count") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    def bruteMedian(c: Seq[Long]): (Long, Double) = {
      val slopes = (for (i <- c.indices; j <- i + 1 until c.size)
        yield (c(j) - c(i)).toDouble / (j - i).toDouble).sorted
      val m = slopes.size
      (m.toLong, (slopes((m + 1) / 2 - 1) + slopes(m / 2)) / 2.0)
    }
    val r1 = Events.theilSenOn(trendEvents()).collect()(0)
    graft.CachedFrames.drain()
    assert((r1.getLong(0), r1.getDouble(1)) === bruteMedian(trendSeries))
    // even pair count: 4 dense days → 6 pairs; includes a gap day
    val ev = Seq(0 -> 2, 1 -> 7, 3 -> 1).flatMap { case (d, n) =>
      (0 until n).map(i => d.toLong * 86400L + i * 977L)
    }.toDF("sec").withColumn("ts", timestamp_seconds(col("sec")))
    val r2 = Events.theilSenOn(ev).collect()(0)
    graft.CachedFrames.drain()
    assert((r2.getLong(0), r2.getDouble(1)) ===
      bruteMedian(Seq(2L, 7L, 0L, 1L)))
  }

  test("q222 ANOVA core: exact eta2/F on hand series — a perfect cycle " +
    "hits eta2 = 1 with NULL F, a half-explained series gets the exact " +
    "ratio, a constant series reports NULL/NULL") {
    import spark.implicits._
    def run(cs: Seq[Long], period: Int) = {
      val dense = cs.zipWithIndex.map { case (c, d) => (d.toLong, c) }
        .toDF("day", "c")
      val r = Events.seasonalAnovaOn(dense, period).collect()(0)
      graft.CachedFrames.drain()
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    }
    // [1,5,1,5] % 2: SSW = 0 → eta2 exactly 1, F undefined (not +Inf)
    assert(run(Seq(1L, 5L, 1L, 5L), 2) === ((4L, 2L, Some(1.0), None)))
    // [1,5,3,3] % 2: ssb_scaled = 64, n·sstn = 128 → eta2 = 0.5;
    // F = (64/1) / ((128−64)/2) = 2.0 — both exact in doubles
    assert(run(Seq(1L, 5L, 3L, 3L), 2) === ((4L, 2L, Some(0.5), Some(2.0))))
    // constant series: SST = 0 → NULL/NULL, never a division error
    assert(run(Seq(2L, 2L, 2L, 2L), 2) === ((4L, 2L, None, None)))
    // period > n: every group a singleton → SSB = SST, eta2 = 1, NULL F
    // (n = k leaves no within degrees of freedom)
    assert(run(Seq(1L, 9L), 7) === ((2L, 2L, Some(1.0), None)))
    // the group-generic face (q237's path) with STRING group keys folds
    // in key order and reproduces the same exact numbers
    val sg = Seq(("a", 1L), ("b", 5L), ("a", 3L), ("b", 3L))
      .toDF("g", "c")
    val rs = Events.anovaOfGroups(sg).collect()(0)
    graft.CachedFrames.drain()
    assert((rs.getLong(0), rs.getLong(1), rs.getDouble(2),
      rs.getDouble(3)) === ((4L, 2L, 0.5, 2.0)))
  }

  test("q229 dow residuals: a planted spike flags on the exact integer " +
    "rule, quiet days don't, and a constant dow group reports NULL z " +
    "and false") {
    import spark.implicits._
    // days 0..13 (two full weeks): dow 0 gets [10, 94] — a spike;
    // every other dow gets [10, 10] — constant groups
    val dense = (0L to 13L).map(d => (d, if (d == 7L) 94L else 10L))
      .toDF("day", "c")
    val got = try Events.dowAnomaliesOn(dense).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        r.getBoolean(6)))).toMap
      finally graft.CachedFrames.drain()
    assert(got.size === 14)
    // dow 0: n=2, S=104, mean 52, var_num = 2·(100+8836) − 104² = 7056
    // x(day 7) = 94·2 − 104 = 84 → z = 84/√7056 = 1 exactly — but the
    // FLAG rule is x² > 9·var_num: 7056 > 63504 is false for n=2 (a
    // two-point group can never exceed |z| = 1) — pin that honesty
    assert(got(7L) === ((0L, 94L, 2L, 52.0, Some(1.0), false)))
    assert(got(0L) === ((0L, 10L, 2L, 52.0, Some(-1.0), false)))
    // constant dow group: var 0 → NULL z, never flagged
    assert(got(1L) === ((1L, 10L, 2L, 10.0, None, false)))
    // a 4-point group with one spike DOES flag: days {0,7,14,21} dow 0,
    // c = [10,10,10,100] → x = 100·4−130 = 270, var_num = 4·10300−130²
    // = 24300; x² = 72900 > 9·24300 = 218700? no — use a sharper spike
    // c = [1,1,1,97]: S=100, Q=9412, x = 97·4−100 = 288,
    // var_num = 4·9412−10000 = 27648, x² = 82944 > 9·27648 = 248832? no.
    // Population z in an n-point group is bounded by √(n−1) ≈ 1.73 at
    // n = 4 — so pin the EXACT bound instead with threshold-2 groups of
    // n = 14: thirteen 10s and one 100
    val wide = ((0L to 13L).map(d => (d * 7L, if (d == 13L) 100L else 10L))
      ++ Seq((1L, 5L), (2L, 5L))).toDF("day", "c")
    val g2 = try Events.dowAnomaliesOn(wide).collect()
      .map(r => r.getLong(0) -> r.getBoolean(6)).toMap
      finally graft.CachedFrames.drain()
    // dow-0 group n=14: S = 230, Q = 11300, x = 100·14 − 230 = 1170,
    // var_num = 14·11300 − 230² = 105300; x² = 1368900 > 9·105300 =
    // 947700 → flagged
    assert(g2(91L) === true)
    assert(g2(0L) === false)
  }

  test("q248 session funnel: conversion only counts INSIDE a session — a " +
    "purchase after a 30-min break is a return visit; ordering within " +
    "the session is enforced; same-second follows count") {
    import spark.implicits._
    def ev(id: Long, uid: Long, sec: Long, t: String) =
      (id, Some(uid), new Timestamp(sec * 1000L), t)
    val events = Seq(
      // u1 session 0: view → click (same second) → purchase: FULL funnel
      ev(1, 1, 100, "view"), ev(2, 1, 100, "click"), ev(3, 1, 200, "purchase"),
      // u1 session 1 (gap > 1800): view, click BEFORE the view — click
      // does NOT qualify (ordering), so no funnel
      ev(4, 1, 5000, "click"), ev(5, 1, 5010, "view"),
      // u2 session 0: view → click, purchase lands in the NEXT session →
      // view_click counts, full funnel does NOT
      ev(6, 2, 100, "view"), ev(7, 2, 150, "click"),
      ev(8, 2, 99999, "purchase"),
      // u3: one session, no view at all
      ev(9, 3, 100, "click"), ev(10, 3, 150, "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val r = Events.sessionFunnelOn(events).collect()(0)
    graft.CachedFrames.drain()
    // sessions: u1×2, u2×2, u3×1 = 5; views: u1s0, u1s1, u2s0 = 3;
    // view→click: u1s0, u2s0 = 2; full: u1s0 = 1
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((5L, 3L, 2L, 1L)))
    assert(r.getDouble(4) === 2.0 / 3.0)
    assert(r.getDouble(5) === 0.5)
  }

  test("q247 MAD outliers: an outage (zero-filled) day and a spike day " +
    "flag, ordinary days don't, and the integer threshold is exact; the " +
    "degenerate MAD=0 series flags every deviating day") {
    import spark.implicits._
    // 11 observed days, day 5 MISSING (the outage — zero-filled to 0),
    // day 9 a 100-event spike; the rest 8-12 events
    val counts = Map(0 -> 10, 1 -> 9, 2 -> 11, 3 -> 10, 4 -> 12,
      6 -> 8, 7 -> 10, 8 -> 11, 9 -> 100, 10 -> 10, 11 -> 9)
    val events = counts.toSeq.flatMap { case (d, c) =>
      (1 to c).map(i => (d.toLong * 100 + i, at(d)))
    }.toDF("event_id", "ts")
    val got = Events.madOutlierDaysOn(events).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    graft.CachedFrames.drain()
    // dense calendar: days 0..11 (12 rows, incl. the zero-filled day 5)
    assert(got.keySet === (0L to 11L).toSet)
    // sorted counts: 0,8,9,9,10,10,10,10,11,11,12,100 → median pick at
    // rank (12+1) DIV 2 = 6 → 10; deviations sorted:
    // 0,0,0,0,1,1,1,1,2,2,10,90 → MAD pick at rank 6 → 1
    assert(got(0L) === ((10L, 10L, 1L, 0L, false)))
    assert(got(5L) === ((0L, 10L, 1L, 10L, true)))   // the outage flags
    assert(got(9L) === ((100L, 10L, 1L, 90L, true))) // the spike flags
    assert(got(4L) === ((12L, 10L, 1L, 2L, false)))  // 2 ≤ 4.4478·1
    // threshold exactness: deviation 4 would NOT flag (4·10⁴ < 44478·1),
    // deviation 5 would (5·10⁴ > 44478) — day 6 (8 events, dev 2) doesn't
    assert(got(6L)._5 === false)
    // degenerate series: over half the days tied → MAD 0, every
    // deviating day flags
    val flat = (0 to 6).flatMap(d =>
      (1 to (if (d == 3) 7 else 5)).map(i => (d.toLong * 100 + i, at(d))))
      .toDF("event_id", "ts")
    val g2 = Events.madOutlierDaysOn(flat).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(5)))).toMap
    graft.CachedFrames.drain()
    assert(g2(3L) === ((0L, true)))
    assert(g2(0L) === ((0L, false)))
  }
}
