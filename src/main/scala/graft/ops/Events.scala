package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time analytics over the `events` table — the batch formulations of
  * the streaming operator surface (SURVEY.md §2.9): tumbling/sliding windows
  * via the built-in `window()` generator, gap-based sessionization via
  * analytic windows. Window starts are surfaced as epoch seconds (BIGINT) so
  * parity with DuckDB's `time_bucket` needs no timestamp-typing agreement.
  *
  * The same transforms run unchanged under Structured Streaming
  * (`readStream` + watermark) — see graft.streaming for that wiring; batch
  * keeps them DuckDB-oracle-checkable.
  */
object Events {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,6)")

  /** Tumbling 10-minute windows: count + exact sum of `value` per
    * (window, event_type). One shuffle on the composite key; the window
    * struct is computed map-side (no generator explosion for tumbling). */
  def q17WindowTumbling(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "events")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  val q17WindowTumblingSql: String = """
    SELECT CAST(floor(epoch(time_bucket(INTERVAL '10 minutes', ts))) AS BIGINT) AS win_start,
      event_type, count(*) AS n,
      CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
  """

  /** Sliding windows (width 10 min, slide 5 min): each event lands in exactly
    * two windows — Spark's `window()` generator replicates rows before the
    * aggregate shuffle, the oracle unions two shifted tumbling passes. */
  def q18WindowSliding(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "events")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("win_start"), col("n"), col("sum_value"))

  val q18WindowSlidingSql: String = """
    WITH tagged AS (
      SELECT CAST(floor(epoch(time_bucket(INTERVAL '5 minutes', ts))) AS BIGINT) AS b, value FROM events
    ), exploded AS (
      SELECT b AS win_start, value FROM tagged
      UNION ALL
      SELECT b - 300, value FROM tagged
    )
    SELECT win_start, count(*) AS n,
      CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM exploded
    GROUP BY 1
  """

  /** Gap-based sessionization (30-min inactivity) with analytic windows:
    * session boundaries via lag + running sum, then per-user session stats.
    * Gap math runs on epoch seconds so both engines compare identical
    * integers. At scale this is one shuffle on user_id reused by both window
    * specs and the final aggregation (same partitioning). */
  def q19Sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val events = Tables(spark, sfDir, "events")
      .withColumn("eps", unix_timestamp(col("ts")))
      .withColumn("gap", col("eps") - lag(col("eps"), 1).over(byUser))
      .withColumn("is_new", when(col("gap") > 1800, 1).otherwise(0))
      .withColumn("sess", sum(col("is_new"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    events
      .groupBy(col("user_id"), col("sess"))
      .agg(count(lit(1)).as("sess_events"),
        (max(col("eps")) - min(col("eps"))).as("sess_secs"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        max(col("sess_events")).as("max_session_events"),
        sum(col("sess_secs")).as("total_session_secs"))
  }

  val q19SessionizeSql: String = """
    WITH e AS (
      SELECT user_id, event_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS eps FROM events
    ), flagged AS (
      SELECT user_id, eps, ts, event_id,
        CASE WHEN eps - lag(eps) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
             THEN 1 ELSE 0 END AS is_new
      FROM e
    ), numbered AS (
      SELECT user_id, eps,
        CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess
      FROM flagged
    ), sessions AS (
      SELECT user_id, sess, count(*) AS sess_events,
        max(eps) - min(eps) AS sess_secs
      FROM numbered GROUP BY user_id, sess
    )
    SELECT user_id, count(*) AS n_sessions,
      max(sess_events) AS max_session_events,
      CAST(sum(sess_secs) AS BIGINT) AS total_session_secs
    FROM sessions GROUP BY user_id
  """

  /** Hourly distinct users + volume — distinct-agg over an event-time bucket. */
  def q20HourlyUniques(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "events")
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_start"))
      .agg(
        countDistinct(col("user_id")).as("uniques"),
        count(lit(1)).as("n"))

  val q20HourlyUniquesSql: String = """
    SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_start,
      count(DISTINCT user_id) AS uniques, count(*) AS n
    FROM events
    GROUP BY 1
  """

  /** As-of join: for every purchase, the most recent prior click by the
    * same user. Composed as ONE sort-based analytic window (last non-null
    * over an unbounded-preceding-to-1-preceding frame) instead of a range
    * join — the scalable as-of shape: a single shuffle on user_id, no pair
    * explosion, no driver state. */
  def q36AsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables(spark, sfDir, "events")
      .withColumn("eps", unix_timestamp(col("ts")))
      .withColumn("click_eps",
        when(col("event_type") === "click", col("eps")))
      .withColumn("last_click_eps", last(col("click_eps"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("eps").as("purchase_eps"),
        col("last_click_eps"),
        (col("eps") - col("last_click_eps")).as("secs_since_click"))
  }

  val q36AsofJoinSql: String = """
    WITH e AS (
      SELECT event_id, user_id, ts, event_type,
        CAST(floor(epoch(ts)) AS BIGINT) AS eps,
        CASE WHEN event_type = 'click' THEN CAST(floor(epoch(ts)) AS BIGINT) END AS click_eps
      FROM events),
    x AS (
      SELECT event_id, user_id, event_type, eps,
        last_value(click_eps IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_eps
      FROM e)
    SELECT event_id, user_id, eps AS purchase_eps, last_click_eps,
      eps - last_click_eps AS secs_since_click
    FROM x WHERE event_type = 'purchase'
  """

  /** q66: ordered funnel analysis — per user, the first `view`, the first
    * `click` strictly after it, and the first `purchase` strictly after
    * that (the classic conversion funnel; each stage anchored to the
    * previous one, so an early purchase before any click does not count).
    * Shape: one conditional aggregation per stage, all keyed on user_id; each
    * stage shuffles only per-user partial mins (map-side combined), never raw
    * events. The explicit `user_id IS NOT NULL` on the shared base (funnels
    * key on identity; a null user has no funnel) is ALSO what lets AQE reuse
    * the view-stage shuffle: without it the inner click join infers the
    * isnotnull into its copy of the view subtree only, the two subtrees go
    * canonically unequal, and the corpus is scanned twice (q59 bug class). */
  def q66Funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("eps"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("eps")).as("view_s"))
    val c = e.filter(col("event_type") === "click").as("c")
      .join(v, "user_id")
      .filter(col("eps") > col("view_s"))
      .groupBy(col("user_id")).agg(min(col("eps")).as("click_s"))
    val p = e.filter(col("event_type") === "purchase").as("p")
      .join(c, "user_id")
      .filter(col("eps") > col("click_s"))
      .groupBy(col("user_id")).agg(min(col("eps")).as("purchase_s"))
    v.join(c.select(col("user_id"), col("click_s")), Seq("user_id"), "left")
      .join(p.select(col("user_id"), col("purchase_s")), Seq("user_id"), "left")
      .select(col("user_id"), col("view_s"), col("click_s"), col("purchase_s"),
        (lit(1) + when(col("click_s").isNotNull, 1).otherwise(0)
          + when(col("purchase_s").isNotNull, 1).otherwise(0)).as("stages"))
  }

  val q66FunnelSql: String = """
    WITH e AS (
      SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS eps
      FROM events WHERE user_id IS NOT NULL),
    v AS (SELECT user_id, min(eps) AS view_s FROM e
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.eps) AS click_s
          FROM e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.eps > v.view_s
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.eps) AS purchase_s
          FROM e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.eps > c.click_s
          GROUP BY e.user_id)
    SELECT v.user_id, v.view_s, c.click_s, p.purchase_s,
      CAST(1 + CASE WHEN c.click_s IS NOT NULL THEN 1 ELSE 0 END
        + CASE WHEN p.purchase_s IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS stages
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
  """

  /** q64: click→view attribution interval join, single-sourced with the
    * STREAMING formulation ([[graft.streaming.EventStreams.attributionJoin]]
    * — watermarks no-op on a batch frame, so this oracle gates the exact
    * join the stream-stream operator runs). Every click pairs with the
    * same user's views in the preceding 10 minutes. */
  def q64Attribution(spark: SparkSession, sfDir: String): DataFrame =
    graft.streaming.EventStreams.attributionJoin(Tables(spark, sfDir, "events"))

  // the JOIN compares raw timestamps exactly like the Spark side (which
  // must keep event-time columns intact for streaming watermark eviction);
  // flooring to epoch seconds happens only in the output projection. A
  // floored-join formulation would admit same-second view-after-click
  // pairs the operator excludes — a latent divergence on sub-second data.
  val q64AttributionSql: String = """
    WITH v AS (SELECT user_id, ts AS view_ts, value AS view_value
          FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click')
    SELECT c.user_id,
      CAST(floor(epoch(c.click_ts)) AS BIGINT) AS click_s,
      CAST(floor(epoch(v.view_ts)) AS BIGINT) AS view_s,
      v.view_value
    FROM c JOIN v ON c.user_id = v.user_id
      AND v.view_ts <= c.click_ts
      AND v.view_ts >= c.click_ts - INTERVAL 600 SECOND
  """

  /** q102: cohort retention matrix — users grouped by first-seen epoch
    * week, each cell counting how many of a cohort's users were active
    * `week_offset` weeks later, plus the classic retention rate. THE
    * product-analytics staple the event surface was missing next to
    * funnel (q66) and attribution (q64). Weeks are epoch-week integers
    * (floor(eps / 604800) — FLOOR division, so pre-epoch timestamps land
    * on the same week in Spark, in the DuckDB oracle's `//`, and in the
    * streaming twin's `Math.floorDiv`) — no calendar/timezone arithmetic
    * to diverge on.
    *
    * Scale shape: ONE corpus-sized exchange — the per-user groupBy whose
    * `collect_set(wk)` state is bounded by the number of distinct weeks a
    * user can be active (52/year), not by event volume, with the week
    * dedup folded map-side into the set build. Everything after is
    * |cohorts| × |offsets| sized: the cell counts and the cohort sizes
    * are aggregates of the per-user frame (cached — two consumers), and
    * the sizes broadcast back for the rate projection. Retention is one
    * IEEE division of integer-valued counts, so the oracle compares
    * bitwise. */
  def q102CohortRetention(spark: SparkSession, sfDir: String): DataFrame =
    cohortRetentionOn(Tables(spark, sfDir, "events"))

  /** q102's core over any (user_id, ts) event frame — the spec drives this
    * with a crafted multi-cohort fixture the synthetic table (one cohort —
    * every user is first seen in week one) cannot exercise. */
  private[graft] def cohortRetentionOn(events: DataFrame): DataFrame = {
    val per = graft.CachedFrames.track(
      events
        .filter(col("user_id").isNotNull)
        // floor (not DIV's truncate-toward-zero): pre-epoch timestamps must
        // land on the same week as the DuckDB oracle's `//` and the
        // streaming twin's Math.floorDiv (EventStreams.scala)
        .select(col("user_id"),
          expr("CAST(floor(unix_timestamp(ts) / 604800.0D) AS BIGINT)")
            .as("wk"))
        .groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort_wk"), collect_set(col("wk")).as("wks")))
    val cells = per
      .select(col("cohort_wk"), explode(col("wks")).as("wk"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
    val sizes = per.groupBy(col("cohort_wk"))
      .agg(count(lit(1)).as("cohort_size"))
    cells.join(broadcast(sizes), Seq("cohort_wk"))
      .select(col("cohort_wk"), col("week_offset"), col("active_users"),
        col("cohort_size"),
        (col("active_users").cast("double") / col("cohort_size").cast("double"))
          .as("retention"))
  }

  /** Histogram grain for q108: 20 fixed buckets of width 25 cover the
    * events table's value range at every SF; the last bucket absorbs the
    * tail so the distribution vector length never depends on the data. */
  private val DriftBuckets = 20
  private val DriftWidth = 25.0

  /** q108: day-over-day value-distribution drift — the monitoring pass that
    * tells a pipeline operator "today's data stopped looking like
    * yesterday's" (the events-stream sibling of q72's source drift and
    * q88's embedding drift). Per adjacent calendar-day pair it reports
    * total-variation distance (½ Σ|p_b − q_b|) and the χ²-style divergence
    * Σ (p−q)²/(p+q) between the two days' 20-bucket value histograms.
    * Both are RATIONAL in the bucket probabilities — no ln() — so the
    * numbers are bitwise-portable to the DuckDB oracle (the same reason
    * q92 scores in integer bits; PSI's ln(p/q) would put libm between the
    * engines). Days with no predecessor (gaps, the first day) emit nothing.
    *
    * Scale shape (100 TB): ONE corpus-sized aggregation —
    * groupBy(day, bucket) with map-side combine — collapses the stream to
    * ≤ days × 20 rows; everything after (dense vector build, the
    * adjacent-day self-join on day = day+1) runs on that calendar-bounded
    * frame. The distribution vector is built bucket-ordered so the
    * zip_with/aggregate fold order is fixed — deterministic IEEE sums
    * without decimal scaffolding. No window-over-everything: the
    * day-to-previous-day pairing is an equi-join, not a global sort. */
  def q108ValueDrift(spark: SparkSession, sfDir: String): DataFrame =
    valueDriftOn(Tables(spark, sfDir, "events"))

  private[graft] def valueDriftOn(events: DataFrame): DataFrame =
    driftFromCells(driftCellsOn(events))

  /** Phase 1 — the only corpus-sized work: (day, bucket) → count. This is
    * also the STREAMING face ([[graft.streaming.EventStreams.driftCellStream]]
    * runs it verbatim as an Update-mode aggregation, ≤ days × buckets Longs
    * of state); batch continues into [[driftFromCells]], a streaming sink
    * merges the cell deltas last-write-wins and runs the same finalization
    * over the merged table. */
  private[graft] def driftCellsOn(events: DataFrame): DataFrame =
    events
      // NULL values carry no distribution information — excluded from the
      // histogram AND from n_events (otherwise least() would skip the NULL
      // and silently file the row under the top bucket); negative values
      // clamp into bucket 0 the same way the tail clamps into the last
      // bucket, so every counted row lands inside the fixed vector and the
      // day's probabilities always sum to 1
      .filter(col("value").isNotNull)
      // day key floors (not DIV's truncate-toward-zero) so pre-epoch
      // timestamps agree with the oracle's `//`; the bucket clamps BEFORE
      // the INT cast — Spark saturates an overflowing double→INT cast while
      // DuckDB errors, so the cast must only ever see an in-range value
      .select(expr("CAST(floor(unix_timestamp(ts) / 86400.0D) AS BIGINT)")
          .as("day"),
        expr(s"CAST(greatest(least(floor(value / $DriftWidth), " +
          s"${DriftBuckets - 1}.0D), 0.0D) AS INT)").as("bucket"))
      .groupBy(col("day"), col("bucket")).agg(count(lit(1)).as("n"))

  /** Phase 2 — calendar-bounded finalization: dense vectors, the
    * adjacent-day equi-join, the ordered TVD/χ² folds. */
  private[graft] def driftFromCells(counts: DataFrame): DataFrame = {
    val daily = graft.CachedFrames.track(counts.groupBy(col("day"))
      .agg(sum(col("n")).as("n_events"),
        map_from_entries(collect_list(struct(col("bucket"), col("n")))).as("m"))
      .withColumn("p", expr(
        s"""transform(sequence(0, ${DriftBuckets - 1}),
           |  b -> coalesce(CAST(element_at(m, b) AS DOUBLE), 0.0D)
           |         / CAST(n_events AS DOUBLE))""".stripMargin))
      .drop("m"))
    daily
      .join(daily.select((col("day") + 1).as("day"), col("p").as("prev_p")), "day")
      .withColumn("tvd", expr(
        """aggregate(zip_with(p, prev_p, (a, b) -> abs(a - b)),
          |  0.0D, (acc, x) -> acc + x) / 2.0D""".stripMargin))
      .withColumn("chi2", expr(
        """aggregate(zip_with(p, prev_p,
          |    (a, b) -> CASE WHEN a + b > 0.0D
          |                THEN (a - b) * (a - b) / (a + b) ELSE 0.0D END),
          |  0.0D, (acc, x) -> acc + x)""".stripMargin))
      .select(col("day"), col("n_events"), col("tvd"), col("chi2"))
  }

  val q108ValueDriftSql: String = s"""
    WITH c AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        CAST(greatest(least(floor(value / $DriftWidth),
                            ${DriftBuckets - 1}.0), 0.0) AS INTEGER) AS bucket,
        count(*) AS n
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    tot AS (SELECT day, CAST(sum(n) AS BIGINT) AS n_events FROM c GROUP BY 1),
    grid AS (SELECT t.day, t.n_events, b.b AS bucket
      FROM tot t, range($DriftBuckets) b(b)),
    dense AS (
      SELECT g.day, g.n_events, g.bucket,
        coalesce(CAST(c.n AS DOUBLE), 0.0) / CAST(g.n_events AS DOUBLE) AS p
      FROM grid g LEFT JOIN c ON g.day = c.day AND g.bucket = c.bucket),
    vec AS (SELECT day, n_events, list(p ORDER BY bucket) AS p
      FROM dense GROUP BY 1, 2)
    SELECT a.day, a.n_events,
      list_reduce(list_prepend(0.0::DOUBLE,
        list_transform(list_zip(a.p, b.p), z -> abs(z[1] - z[2]))),
        (acc, x) -> acc + x) / 2.0 AS tvd,
      list_reduce(list_prepend(0.0::DOUBLE,
        list_transform(list_zip(a.p, b.p),
          z -> CASE WHEN z[1] + z[2] > 0.0
                 THEN (z[1] - z[2]) * (z[1] - z[2]) / (z[1] + z[2])
                 ELSE 0.0 END)),
        (acc, x) -> acc + x) AS chi2
    FROM vec a JOIN vec b ON a.day = b.day + 1
  """

  val q102CohortRetentionSql: String = """
    WITH w AS (
      SELECT DISTINCT user_id,
        CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk
      FROM events WHERE user_id IS NOT NULL),
    f AS (SELECT user_id, min(wk) AS cohort_wk FROM w GROUP BY 1),
    cells AS (
      SELECT f.cohort_wk, w.wk - f.cohort_wk AS week_offset,
        count(*) AS active_users
      FROM w JOIN f USING (user_id) GROUP BY 1, 2),
    sizes AS (SELECT cohort_wk, count(*) AS cohort_size FROM f GROUP BY 1)
    SELECT c.cohort_wk, c.week_offset, c.active_users, s.cohort_size,
      CAST(c.active_users AS DOUBLE) / CAST(s.cohort_size AS DOUBLE) AS retention
    FROM cells c JOIN sizes s USING (cohort_wk)
  """

  /** q123: SCD2-style RUN intervals — each user's event-type sequence
    * compressed into validity intervals: one row per maximal run of equal
    * consecutive types, with [valid_from, valid_to) epoch bounds (open
    * current run = NULL valid_to) and the run's event count. The type-2
    * slowly-changing-dimension build every lakehouse does to a change
    * stream, and the run-length face of q19's gap sessions.
    *
    * Determinism: the per-user order is (ts, event_id) — event_id makes it
    * total, the q19 convention — so run boundaries are identical in both
    * engines. Scale shape: one user-keyed exchange; both windows and the
    * run rollup live inside the user partition (state bounded per user),
    * and the interval chaining runs on the already-compressed runs frame. */
  def q123ScdIntervals(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val runs = Tables(spark, sfDir, "events")
      .withColumn("eps", unix_timestamp(col("ts")))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(byUser).isNull ||
          col("event_type") =!= lag(col("event_type"), 1).over(byUser), 1)
          .otherwise(0))
      .withColumn("run_id", sum(col("chg"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("run_id"))
      .agg(min(col("event_type")).as("event_type"),
        min(col("eps")).as("valid_from_s"),
        count(lit(1)).as("n_events"))
    val byRun = Window.partitionBy(col("user_id")).orderBy(col("run_id"))
    runs
      .withColumn("valid_to_s", lead(col("valid_from_s"), 1).over(byRun))
      .select(col("user_id"), col("run_id").cast("int").as("run_id"),
        col("event_type"), col("valid_from_s"), col("valid_to_s"),
        col("n_events"))
  }

  val q123ScdIntervalsSql: String = """
    WITH e AS (
      SELECT user_id, event_type, ts, event_id,
        CAST(floor(epoch(ts)) AS BIGINT) AS eps,
        CASE WHEN lag(event_type, 1) OVER w IS NULL
               OR event_type <> lag(event_type, 1) OVER w THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    r AS (
      SELECT user_id, event_type, eps,
        sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id -- guard:ok internal run key, CAST AS INTEGER at output
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      FROM e),
    runs AS (
      SELECT user_id, run_id, min(event_type) AS event_type,
        min(eps) AS valid_from_s, count(*) AS n_events
      FROM r GROUP BY 1, 2)
    SELECT user_id, CAST(run_id AS INTEGER) AS run_id, event_type,
      valid_from_s,
      lead(valid_from_s, 1) OVER (PARTITION BY user_id ORDER BY run_id)
        AS valid_to_s,
      n_events
    FROM runs
  """

  /** q124 tuning: path length (consecutive events) and the leaderboard cut. */
  val PathLen = 3
  val PathTopK = 20

  /** q124: EVENT-PATH mining — the [[PathTopK]] most frequent runs of
    * [[PathLen]] consecutive event types across all users, the
    * product-analytics "common paths" view next to q66's fixed funnel
    * (funnel counts ONE hypothesized order; this discovers the orders).
    *
    * Scale shape: the lead() windows live inside the user partition (one
    * user-keyed exchange), the path counts combine map-side, and the
    * leaderboard is a TakeOrderedAndProject — no global sort. Ordering is
    * total via (ts, event_id), so the mined paths are deterministic. */
  def q124EventPaths(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables(spark, sfDir, "events")
      .withColumn("e2", lead(col("event_type"), 1).over(byUser))
      .withColumn("e3", lead(col("event_type"), 2).over(byUser))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(PathTopK)
  }

  val q124EventPathsSql: String = s"""
    WITH p AS (
      SELECT event_type || '>' || lead(event_type, 1) OVER w
          || '>' || lead(event_type, 2) OVER w AS path,
        lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT path, count(*) AS n
    FROM p WHERE e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path ASC
    LIMIT $PathTopK
  """

  /** q126 tuning: trailing window size, the minimum history before a
    * verdict, and the squared z-score cut (9 = |z| > 3). */
  val AnomalyWin = 20
  val AnomalyMinPrior = 5
  val AnomalyZ2 = 9L

  /** q126: ROLLING per-user ANOMALY flags — an event is anomalous when its
    * value sits more than 3 sigma from the mean of that user's previous
    * [[AnomalyWin]] values (at least [[AnomalyMinPrior]] of history; the
    * window EXCLUDES the current row, so a spike can't vouch for itself).
    * The per-entity outlier monitor next to q108's corpus-level drift.
    *
    * Exactness contract: values quantize to integer cents
    * (floor(v·100 + ½) — two IEEE ops, both engines identical), and the
    * 3-sigma test is cross-multiplied into pure integer arithmetic:
    *   (n·x − Σv)² > 9·(n·Σv² − (Σv)²)
    * — no square root, no division, no float accumulation, so the flag set
    * is bitwise-portable. Only the reported window mean divides (one exact
    * cast, one IEEE division).
    *
    * Scale shape: one user-keyed exchange; the analytic window is
    * ROWS-bounded ([[AnomalyWin]] preceding), so Spark's WindowExec keeps
    * O(window) state per user — no per-user materialization, no global
    * sort. The streaming twin ([[graft.streaming.EventStreams]]) carries
    * the same window as ≤ [[AnomalyWin]] Longs of keyed state. */
  def q126RollingAnomaly(spark: SparkSession, sfDir: String): DataFrame =
    rollingAnomalyOn(Tables(spark, sfDir, "events"))

  private[graft] def rollingAnomalyOn(events: DataFrame): DataFrame = {
    val wnd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-AnomalyWin, -1)
    // the sigma test runs in DECIMAL so it stays EXACT at large amounts:
    // a BIGINT form wraps silently in Spark once |cents| ≳ 5e7 in a window
    // (while DuckDB raises), silently corrupting the flag set. Headroom of
    // the decimal form: s2 ≤ W·c² needs c ≤ 2e18 (DECIMAL(37) terms), the
    // 9·(n·s2−s1²) product ≤ 3600·c² needs c ≲ 1.6e17 — a $1.6e15 single
    // event; past that Spark/DuckDB both ERROR (decimal overflow / HUGEINT
    // range), never wrap. The oracle mirrors in HUGEINT (exact int128).
    val dev = col("n_win") * col("cents") - col("s1") // |dev| ≤ 2W·c: BIGINT-safe
    events
      .filter(col("value").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_timestamp(col("ts")).as("eps"),
        expr("CAST(floor(value * 100.0D + 0.5D) AS BIGINT)").as("cents"))
      .withColumn("n_win", count(col("cents")).over(wnd))
      .withColumn("s1", sum(col("cents")).over(wnd))
      .withColumn("s2", sum(col("cents").cast("decimal(18,0)")
        * col("cents").cast("decimal(18,0)")).over(wnd))
      .filter(col("n_win") >= AnomalyMinPrior &&
        dev.cast("decimal(19,0)") * dev.cast("decimal(19,0)")
          > lit(AnomalyZ2) * (col("n_win").cast("decimal(2,0)") * col("s2")
            - col("s1").cast("decimal(19,0)") * col("s1").cast("decimal(19,0)")))
      .select(col("user_id"), col("event_id"), col("eps"), col("cents"),
        col("n_win"),
        (col("s1").cast("double") / (lit(100.0) * col("n_win").cast("double")))
          .as("mean_w"))
  }

  val q126RollingAnomalySql: String = s"""
    WITH e AS (
      SELECT user_id, event_id, ts,
        CAST(floor(epoch(ts)) AS BIGINT) AS eps,
        CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
    w AS (
      SELECT user_id, event_id, eps, cents,
        count(cents) OVER wnd AS n_win,
        CAST(sum(cents) OVER wnd AS BIGINT) AS s1,
        sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) OVER wnd AS s2 -- guard:ok internal HUGEINT window sum, WHERE-only
      FROM e
      WINDOW wnd AS (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN $AnomalyWin PRECEDING AND 1 PRECEDING))
    SELECT user_id, event_id, eps, cents, n_win,
      CAST(s1 AS DOUBLE) / (100.0 * CAST(n_win AS DOUBLE)) AS mean_w
    FROM w
    WHERE n_win >= $AnomalyMinPrior
      AND CAST(n_win * cents - s1 AS HUGEINT) * CAST(n_win * cents - s1 AS HUGEINT)
        > $AnomalyZ2 * (CAST(n_win AS HUGEINT) * s2
          - CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT))
  """

  /** q132: MARKOV TRANSITION MATRIX over event types — for every observed
    * (current → next) pair within a user's (ts, event_id)-ordered stream,
    * the transition count and conditional probability P(next | current).
    * The normalized behavior model behind q124's raw path counts: q66
    * tests one hypothesized order, q124 lists frequent orders, q132 gives
    * the one-step dynamics (what a session simulator or next-event
    * predictor consumes). Probabilities are one exact-cast IEEE division
    * of integer counts — bitwise-portable.
    *
    * Scale shape: one user-keyed exchange for the lead() window, then a
    * map-side-combinable groupBy collapsing the stream to ≤ |types|² rows;
    * the row-normalization window runs on that types-bounded frame. */
  def q132MarkovTransitions(spark: SparkSession, sfDir: String): DataFrame =
    markovTransitionsOn(Tables(spark, sfDir, "events"))

  private[graft] def markovTransitionsOn(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val tw = Window.partitionBy(col("cur"))
    events
      .withColumn("nxt", lead(col("event_type"), 1).over(byUser))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_cur", sum(col("n")).over(tw))
      .withColumn("p", col("n").cast("double") / col("n_cur").cast("double"))
      .select(col("cur"), col("nxt"), col("n"), col("n_cur"), col("p"))
  }

  val q132MarkovTransitionsSql: String = """
    WITH t AS (
      SELECT event_type AS cur, lead(event_type, 1) OVER w AS nxt
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    c AS (
      SELECT cur, nxt, count(*) AS n FROM t WHERE nxt IS NOT NULL GROUP BY 1, 2)
    SELECT cur, nxt, n,
      CAST(sum(n) OVER (PARTITION BY cur) AS BIGINT) AS n_cur,
      CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY cur) AS DOUBLE) AS p
    FROM c
  """

  /** q134 tuning: quantile buckets per RFM dimension. */
  val RfmBuckets = 5

  /** q134: RFM SEGMENTATION — each user scored 1–[[RfmBuckets]] on Recency
    * (last event time), Frequency (event count) and Monetary (value sum,
    * integer cents), by ntile over a (metric, user_id) TOTAL order; higher
    * score = more recent / more active / more spend. The classic
    * product-analytics segmentation next to q102's retention — "534" reads
    * as churn-risk big spender. The ntile boundaries are rank arithmetic
    * over a total order, so both engines cut identically; the only
    * non-integer never exists — every output column is exact.
    *
    * Scale shape: events collapse FIRST to one row per user (map-side
    * combinable rollup; the cents idiom keeps the money sum exact), and
    * each score is the q59 TWO-PHASE BUCKETED RANK over that cached
    * |users|-bounded frame ([[DistRank.withBucketedRank]]) with the ntile
    * cut applied as integer rank arithmetic ([[DistRank.ntileOfRank]] —
    * byte-identical to the window function) — NO single-partition window
    * anywhere in the plan, so a 10⁹-user rollup ranks B-way parallel
    * instead of sorting three times on one task. The three user-keyed
    * score join-backs are |users|-bounded shuffles. */
  def q134RfmSegments(spark: SparkSession, sfDir: String): DataFrame =
    rfmOn(Tables(spark, sfDir, "events"))

  /** `cache = false` exists for PLAN tests only: an InMemoryRelation whose
    * cached plan carries its own AdaptiveSparkPlan truncates the outer
    * `executedPlan.toString` at the nesting point (a Spark tree-printing
    * quirk), which would hide the rank machinery from the plan pins. */
  private[graft] def rfmOn(events: DataFrame, cache: Boolean = true): DataFrame = {
    // cached: feeds the 1-row count, three rank passes, and the final join
    val rollup = events
      .filter(col("user_id").isNotNull && col("value").isNotNull)
      .select(col("user_id"), unix_timestamp(col("ts")).as("eps"),
        expr("CAST(floor(value * 100.0D + 0.5D) AS BIGINT)").as("cents"))
      .groupBy(col("user_id"))
      .agg(max(col("eps")).as("last_eps"), count(lit(1)).as("n_events"),
        sum(col("cents")).as("sum_cents"))
    val per = if (cache) graft.CachedFrames.track(rollup) else rollup
    val n = per.agg(count(lit(1)).as("_n"))
    def score(metric: String, name: String): DataFrame =
      DistRank.withBucketedRank(per.select(col("user_id"), col(metric)),
          Nil, metric, Seq("user_id"), "_rank")
        .crossJoin(broadcast(n))
        .select(col("user_id"),
          DistRank.ntileOfRank("_rank", "_n", RfmBuckets).as(name))
    per
      .join(score("last_eps", "r_score"), Seq("user_id"))
      .join(score("n_events", "f_score"), Seq("user_id"))
      .join(score("sum_cents", "m_score"), Seq("user_id"))
      .withColumn("rfm",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
      .select(col("user_id"), col("last_eps"), col("n_events"),
        col("sum_cents"), col("r_score"), col("f_score"), col("m_score"),
        col("rfm"))
  }

  val q134RfmSegmentsSql: String = s"""
    WITH per AS (
      SELECT user_id,
        max(CAST(floor(epoch(ts)) AS BIGINT)) AS last_eps,
        count(*) AS n_events,
        CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
          AS sum_cents
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL
      GROUP BY 1),
    scored AS (
      SELECT user_id, last_eps, n_events, sum_cents,
        CAST(ntile($RfmBuckets) OVER (ORDER BY last_eps ASC, user_id ASC)
          AS INTEGER) AS r_score,
        CAST(ntile($RfmBuckets) OVER (ORDER BY n_events ASC, user_id ASC)
          AS INTEGER) AS f_score,
        CAST(ntile($RfmBuckets) OVER (ORDER BY sum_cents ASC, user_id ASC)
          AS INTEGER) AS m_score
      FROM per)
    SELECT user_id, last_eps, n_events, sum_cents, r_score, f_score, m_score,
      r_score * 100 + f_score * 10 + m_score AS rfm
    FROM scored
  """

  /** q138 tuning: trailing window for the active-user denominator. */
  val StickinessWindowDays = 7

  /** q138: STICKINESS — per day, DAU (distinct users that day), trailing
    * [[StickinessWindowDays]]-day WAU (distinct users over days d−6…d) and
    * the DAU/WAU ratio, the engagement headline metric next to q102's
    * cohort retention. Early days carry partial trailing windows — exactly
    * what a live dashboard shows. The ratio is ONE division of two exact
    * BIGINTs, so the doubles match bitwise; the day key is q108's
    * floor-division idiom (pre-epoch-safe cross-engine).
    *
    * Scale shape: the stream collapses FIRST to distinct (day, user)
    * presence rows — the only corpus-sized work. The trailing window is a
    * range join against the |days| frame, which is TIME-BOUNDED (30 rows
    * here, a few thousand on any real lake) and broadcast, so each
    * presence row fans out ≤ 7×, then a map-side-combinable distinct count
    * per day. No per-user state, no corpus-wide sort. */
  def q138Stickiness(spark: SparkSession, sfDir: String): DataFrame =
    stickinessOn(Tables(spark, sfDir, "events"))

  /** `cache = false` is the PlanSpec seam (see [[rfmOn]]: a cached plan's
    * nested AdaptiveSparkPlan truncates the printed outer tree). */
  private[graft] def stickinessOn(events: DataFrame,
      cache: Boolean = true): DataFrame = {
    // persist: presence feeds the DAU rollup and the WAU range join
    val du0 = events
      .filter(col("user_id").isNotNull)
      .select(expr("CAST(floor(unix_timestamp(ts) / 86400.0D) AS BIGINT)")
        .as("day"), col("user_id"))
      .distinct()
    val du = if (cache) graft.CachedFrames.track(du0) else du0
    val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val days = dau.select(col("day").as("d"))
    val wau = du.join(broadcast(days),
        col("day").between(col("d") - (StickinessWindowDays - 1), col("d")))
      .groupBy(col("d")).agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, dau("day") === wau("d"))
      .select(col("day"), col("dau"), col("wau"),
        (col("dau").cast("double") / col("wau").cast("double")).as("stickiness"))
  }

  val q138StickinessSql: String = s"""
    WITH du AS (
      SELECT DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day, user_id
      FROM events WHERE user_id IS NOT NULL),
    dau AS (SELECT day, count(*) AS dau FROM du GROUP BY 1),
    wau AS (
      SELECT d.day AS day, count(DISTINCT u.user_id) AS wau
      FROM dau d JOIN du u
        ON u.day BETWEEN d.day - ${StickinessWindowDays - 1} AND d.day
      GROUP BY 1)
    SELECT dau.day, dau.dau, wau.wau,
      CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
    FROM dau JOIN wau ON dau.day = wau.day
  """

  /** q141: ACTIVITY TREND per user — the ordinary-least-squares slope of
    * daily event counts over the user's active days,
    * slope = (k·Σxy − Σx·Σy) / (k·Σxx − Σx²): events/day of drift, the
    * "engagement is decaying" feature a churn model consumes next to
    * q102's cohort view and q138's aggregate stickiness (those say THAT
    * users leave; the slope says WHO is fading, before they do). Users
    * with one active day (or a degenerate x-spread) report NULL — no
    * trend is measurable. All five sums are exact BIGINTs (day keys
    * ~2·10⁴, counts bounded by activity: every product sits far below
    * 2⁵³, so the final casts are exact and the one division matches
    * bitwise).
    *
    * Scale shape: events collapse to (user, day) counts map-side (the
    * q138 presence idiom with a count instead of a distinct), then a
    * second map-side-combinable rollup to ONE row per user carrying the
    * five sums; the slope is a projection. Two compact-key exchanges,
    * no window, no sort, no join. */
  def q141ActivityTrend(spark: SparkSession, sfDir: String): DataFrame =
    activityTrendOn(Tables(spark, sfDir, "events"))

  private[graft] def activityTrendOn(events: DataFrame): DataFrame =
    events.filter(col("user_id").isNotNull)
      .select(col("user_id"),
        expr("CAST(floor(unix_timestamp(ts) / 86400.0D) AS BIGINT)").as("day"))
      .groupBy(col("user_id"), col("day")).agg(count(lit(1)).as("y"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_days"), sum(col("day")).as("sx"),
        sum(col("y")).as("n_events"), sum(col("day") * col("y")).as("sxy"),
        sum(col("day") * col("day")).as("sxx"))
      .withColumn("slope", when(
        col("n_days") > 1 &&
          (col("n_days") * col("sxx") - col("sx") * col("sx")) =!= 0,
        (col("n_days") * col("sxy") - col("sx") * col("n_events")).cast("double")
          / (col("n_days") * col("sxx") - col("sx") * col("sx")).cast("double")))
      .select(col("user_id"), col("n_days"), col("n_events"), col("slope"))

  val q141ActivityTrendSql: String = """
    WITH daily AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        count(*) AS y
      FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
    s AS (
      SELECT user_id, count(*) AS n_days,
        CAST(sum(day) AS BIGINT) AS sx,
        CAST(sum(y) AS BIGINT) AS n_events,
        CAST(sum(day * y) AS BIGINT) AS sxy,
        CAST(sum(day * day) AS BIGINT) AS sxx
      FROM daily GROUP BY 1)
    SELECT user_id, n_days, n_events,
      CASE WHEN n_days > 1 AND (n_days * sxx - sx * sx) <> 0
        THEN CAST(CAST(n_days * sxy - sx * n_events AS VARCHAR) AS DOUBLE)
          / CAST(CAST(n_days * sxx - sx * sx AS VARCHAR) AS DOUBLE)
      END AS slope
    FROM s
  """

  /** q148 tuning: EWMA taps kept (α = 1/2; truncation error < 2^-taps,
    * below double resolution at 20). */
  private[graft] val EwmaTaps = 20

  /** q148: truncated EWMA of per-user daily activity (α = 1/2) — the
    * "current engagement level" feature that weights yesterday twice as
    * hard as the day before, where q141's OLS slope answers "which way" and
    * this answers "how much, right now". α = 1/2 is the IEEE move: every
    * weight is a power of two, so the weighted sum is EXACT in BIGINT
    * (weight 2^(taps−1−j) for the j-th most recent active day, renormalized
    * over the days actually present) and the only double is the final
    * num/den division, which both engines round identically. The window is
    * the user's ACTIVE-day sequence (gaps don't decay — the streaming twin
    * applies the same contract), truncated to [[EwmaTaps]] taps.
    *
    * Scale shape: the daily rollup is one map-side-combined groupBy; the
    * tap chain is [[EwmaTaps]] `lag`s over ONE per-user window (per-user
    * partitions are each tiny — the calendar bounds |days|/user — so
    * unlike a global orderBy this parallelizes across users), and the
    * final-day pick is a window max in the SAME partition order, no extra
    * exchange. One shuffle total after the rollup. */
  def q148Ewma(spark: SparkSession, sfDir: String): DataFrame =
    ewmaOn(Tables(spark, sfDir, "events"))

  private[graft] def ewmaOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val wAll = Window.partitionBy(col("user_id"))
    val num = (0 until EwmaTaps).map { j =>
      coalesce(lag(col("y"), j).over(w), lit(0L)) *
        lit(1L << (EwmaTaps - 1 - j))
    }.reduce(_ + _)
    val den = (0 until EwmaTaps).map { j =>
      when(lag(col("y"), j).over(w).isNotNull,
        lit(1L << (EwmaTaps - 1 - j))).otherwise(lit(0L))
    }.reduce(_ + _)
    events.filter(col("user_id").isNotNull)
      .select(col("user_id"),
        expr("CAST(floor(unix_timestamp(ts) / 86400.0D) AS BIGINT)").as("day"))
      .groupBy(col("user_id"), col("day")).agg(count(lit(1)).as("y"))
      .withColumn("ewma_num", num)
      .withColumn("ewma_den", den)
      .withColumn("n_days", count(lit(1)).over(wAll))
      .withColumn("_mx", max(col("day")).over(wAll))
      .filter(col("day") === col("_mx"))
      .select(col("user_id"), col("n_days"), col("day").as("last_day"),
        col("ewma_num"), col("ewma_den"),
        (col("ewma_num").cast("double") / col("ewma_den").cast("double"))
          .as("ewma"))
  }

  /** The q148 oracle replays the identical tap chain. */
  val q148EwmaSql: String = {
    val num = (0 until EwmaTaps).map { j =>
      s"COALESCE(lag(y, $j) OVER w, 0) * ${1L << (EwmaTaps - 1 - j)}"
    }.mkString("\n        + ")
    val den = (0 until EwmaTaps).map { j =>
      s"CASE WHEN lag(y, $j) OVER w IS NOT NULL THEN ${1L << (EwmaTaps - 1 - j)} ELSE 0 END"
    }.mkString("\n        + ")
    s"""
    WITH daily AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        count(*) AS y
      FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
    taps AS (
      SELECT user_id, day,
        $num AS ewma_num,
        CAST($den AS BIGINT) AS ewma_den,
        count(*) OVER (PARTITION BY user_id) AS n_days,
        max(day) OVER (PARTITION BY user_id) AS mx
      FROM daily
      WINDOW w AS (PARTITION BY user_id ORDER BY day))
    SELECT user_id, n_days, day AS last_day, ewma_num, ewma_den,
      CAST(ewma_num AS DOUBLE) / CAST(ewma_den AS DOUBLE) AS ewma
    FROM taps WHERE day = mx
    """
  }

  /** q151: CUSUM change-point score per event type — for each type's daily
    * count series, S_t = max(0, S_{t-1} + (c_t − μ)) with μ = the type's
    * own mean daily count, reported as the series MAX and its (earliest)
    * peak day: the standard "did the rate shift, and when" detector that a
    * point threshold misses (a sustained small drift accumulates; one
    * noisy day doesn't). All integer: with P_t the prefix sum and
    * nM_t = n·P_t − t·total (the mean-centered walk cross-multiplied by
    * n = |days|), S_t·n = nM_t − min(0, min_{i≤t} nM_i) exactly — no
    * rational μ ever materializes. The display column divides by n once.
    *
    * Scale shape: the heavy input collapses in ONE map-side-combined
    * (type, day) count; everything after runs on |types|·|days| rows —
    * calendar-bounded by construction, so the per-type windows are tiny
    * regardless of corpus size (the q126 contract: windows over inherently
    * small series, never over raw events). */
  def q151Cusum(spark: SparkSession, sfDir: String): DataFrame =
    cusumOn(Tables(spark, sfDir, "events"))

  private[graft] def cusumOn(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wAll = Window.partitionBy(col("event_type"))
    val walk = events
      .select(col("event_type"),
        expr("CAST(floor(unix_timestamp(ts) / 86400.0D) AS BIGINT)").as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c"))
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("p", sum(col("c")).over(w))
      .withColumn("n_days", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("c")).over(wAll))
      .withColumn("nm", col("n_days") * col("p") - col("t") * col("total"))
      .withColumn("cusum_n",
        col("nm") - least(lit(0L), min(col("nm")).over(w)))
    val mx = walk.groupBy(col("event_type"))
      .agg(max(col("cusum_n")).as("max_cusum_n"))
    walk.join(mx, Seq("event_type"))
      .filter(col("cusum_n") === col("max_cusum_n"))
      .groupBy(col("event_type"), col("n_days"), col("total"),
        col("max_cusum_n"))
      .agg(min(col("day")).as("peak_day"))
      .select(col("event_type"), col("n_days"), col("total"),
        col("max_cusum_n"), col("peak_day"),
        (col("max_cusum_n").cast("double") / col("n_days").cast("double"))
          .as("max_cusum"))
  }

  val q151CusumSql: String = """
    WITH daily AS (
      SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        count(*) AS c
      FROM events GROUP BY 1, 2),
    walk AS (
      SELECT event_type, day, c,
        CAST(row_number() OVER w AS BIGINT) AS t,
        CAST(sum(c) OVER w AS BIGINT) AS p, -- guard:ok internal prefix walk, outputs are BIGINT products
        count(*) OVER (PARTITION BY event_type) AS n_days,
        CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS total
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)),
    cs AS (
      SELECT event_type, day, n_days, total,
        (n_days * p - t * total)
          - least(0, min(n_days * p - t * total) OVER w2) AS cusum_n
      FROM walk
      WINDOW w2 AS (PARTITION BY event_type ORDER BY day)),
    mx AS (SELECT event_type, max(cusum_n) AS max_cusum_n
           FROM cs GROUP BY 1)
    SELECT c.event_type, c.n_days, c.total, m.max_cusum_n,
      min(c.day) AS peak_day,
      CAST(m.max_cusum_n AS DOUBLE) / CAST(c.n_days AS DOUBLE) AS max_cusum
    FROM cs c JOIN mx m
      ON c.event_type = m.event_type AND c.cusum_n = m.max_cusum_n
    GROUP BY 1, 2, 3, 4, 6
  """

  /** q152 tuning: minimum users supporting an itemset. */
  private[ops] val ItemsetMinSupport = 5L

  /** q152: FREQUENT EVENT-TYPE ITEMSETS (Apriori at sizes 2 and 3) — which
    * COMBINATIONS of behaviors co-occur in the same user, with support =
    * number of users exhibiting all members. q132's Markov matrix sees
    * only adjacent transitions; this sees the unordered basket ("users who
    * purchase AND search AND share"), the cross-feature signal cohort
    * definitions are built from. Counts are exact; lift-style ratios are
    * left to the consumer so the row stays integer-only.
    *
    * Scale shape: everything flows from ONE distinct (user, type) collapse
    * — after it, each user contributes at most C(T,2)+C(T,3) rows where T
    * is the EVENT-TYPE VOCABULARY (schema-bounded, not data-sized), so
    * the user-keyed self-joins are bounded fan-out equi-joins and the
    * support counts combine map-side. The raw event table is touched
    * exactly once. */
  def q152Itemsets(spark: SparkSession, sfDir: String): DataFrame =
    itemsetsOn(Tables(spark, sfDir, "events"))

  private[graft] def itemsetsOn(events: DataFrame): DataFrame = {
    val ut = graft.CachedFrames.track(
      events.filter(col("user_id").isNotNull)
        .select(col("user_id"), col("event_type")).distinct())
    val pairs = graft.CachedFrames.track(
      ut.select(col("user_id"), col("event_type").as("t1"))
        .join(ut.select(col("user_id"), col("event_type").as("t2")),
          Seq("user_id"))
        .filter(col("t1") < col("t2")))
    val p2 = pairs.groupBy(col("t1"), col("t2"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= ItemsetMinSupport)
      .select(concat_ws("|", col("t1"), col("t2")).as("itemset"),
        lit(2).as("size"), col("support"))
    val p3 = pairs
      .join(ut.select(col("user_id"), col("event_type").as("t3")),
        Seq("user_id"))
      .filter(col("t3") > col("t2"))
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= ItemsetMinSupport)
      .select(concat_ws("|", col("t1"), col("t2"), col("t3")).as("itemset"),
        lit(3).as("size"), col("support"))
    p2.unionByName(p3)
  }

  val q152ItemsetsSql: String = s"""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
      WHERE user_id IS NOT NULL),
    pr AS (
      SELECT a.user_id, a.event_type AS t1, b.event_type AS t2
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type)
    SELECT concat_ws('|', t1, t2) AS itemset, 2 AS size,
      count(*) AS support
    FROM pr GROUP BY t1, t2 HAVING count(*) >= $ItemsetMinSupport
    UNION ALL
    SELECT concat_ws('|', t1, t2, c.event_type) AS itemset, 3 AS size,
      count(*) AS support
    FROM pr JOIN ut c
      ON pr.user_id = c.user_id AND c.event_type > pr.t2
    GROUP BY t1, t2, c.event_type HAVING count(*) >= $ItemsetMinSupport
  """

  /** q155's rank-exact percentile grid: (name, a, b) → value at rank
    * ⌈a·n/b⌉ (the q140 convention). */
  private[ops] val LagPercentiles =
    Seq(("p50_s", 1L, 2L), ("p90_s", 9L, 10L), ("p99_s", 99L, 100L))

  /** q155: CONVERSION LATENCY percentiles — per user, the seconds from the
    * FIRST `view` to the first `purchase` at-or-after it; p50/p90/p99 are
    * rank-exact (value at rank ⌈q·n⌉ — no interpolation, no sketch, the
    * q140 convention). q66 counts who converts; this measures how long the
    * converted took — the number an SLA or attribution window is set from.
    * All integer seconds; nothing floats.
    *
    * Scale shape: first-view anchoring is one per-user window pass (the
    * q36 as-of idiom — running min inside the user partition, no range
    * join), per-user lags collapse in the same exchange, and the global
    * percentile rank is [[DistRank.withBucketedRank]] with NO group — the
    * q59 two-phase engine, so a billion converted users rank B-way
    * parallel instead of on one task. Output is ONE row. */
  def q155ConversionLag(spark: SparkSession, sfDir: String): DataFrame =
    conversionLagOn(Tables(spark, sfDir, "events"))

  /** The per-user lag table q155 ranks — factored so the streaming twin's
    * spec can pin row equality against it. */
  private[graft] def conversionLags(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.filter(col("user_id").isNotNull)
      .withColumn("eps", unix_timestamp(col("ts")))
      .withColumn("tv",
        min(when(col("event_type") === "view", col("eps"))).over(byUser))
      .filter(col("event_type") === "purchase" && col("tv").isNotNull)
      .groupBy(col("user_id"))
      .agg(min(col("eps") - col("tv")).as("lag_s"))
  }

  private[graft] def conversionLagOn(events: DataFrame): DataFrame = {
    // cached: feeds the bucketed rank (bounds + rank + offsets) and the
    // 1-row count — five consumers of one per-user collapse
    val lags = graft.CachedFrames.track(conversionLags(events))
    val n = lags.agg(count(lit(1)).as("n_converted"))
    val aggs = LagPercentiles.map { case (name, a, b) =>
      max(when(col("_r") ===
        expr(s"($a * n_converted + ${b - 1}) DIV $b"), col("lag_s"))).as(name)
    }
    DistRank.withBucketedRank(lags, Seq(), "lag_s", Seq("user_id"), "_r")
      .crossJoin(broadcast(n))
      .groupBy(col("n_converted"))
      .agg(aggs.head, aggs.tail: _*)
  }

  val q155ConversionLagSql: String = {
    val picks = LagPercentiles.map { case (name, a, b) =>
      s"CAST(max(CASE WHEN rnk = ($a * n + ${b - 1}) // $b THEN lag_s END) AS BIGINT) AS $name"
    }.mkString(",\n      ")
    s"""
    WITH e AS (
      SELECT user_id, event_id, event_type, ts,
        CAST(floor(epoch(ts)) AS BIGINT) AS eps
      FROM events WHERE user_id IS NOT NULL),
    f AS (
      SELECT user_id, event_type, eps,
        min(CASE WHEN event_type = 'view' THEN eps END)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tv
      FROM e),
    lg AS (
      SELECT user_id, min(eps - tv) AS lag_s
      FROM f WHERE event_type = 'purchase' AND tv IS NOT NULL GROUP BY 1),
    r AS (
      SELECT lag_s,
        row_number() OVER (ORDER BY lag_s, user_id) AS rnk,
        count(*) OVER () AS n
      FROM lg)
    SELECT max(n) AS n_converted,
      $picks
    FROM r GROUP BY n
    """
  }

  /** q157: per-user BURSTINESS of inter-event gaps — Goh-Barabási
    * B = (σ−μ)/(σ+μ) over the user's gap sequence: −1 = perfectly regular
    * (heartbeat/bot cadence), 0 = Poisson, → 1 = bursty human sessions.
    * The cadence fingerprint q19's session stats don't capture (two users
    * with identical session counts can have opposite B). Multiplying
    * through by n_gaps gives B = (√varn − Σg)/(√varn + Σg) with
    * varn = n·Σg² − (Σg)² EXACT in BIGINT — one sqrt of an exact integer
    * (IEEE-correctly-rounded in both engines), one fixed-order division.
    * Degenerate (all gaps zero) reports NULL.
    *
    * Scale shape: one user-keyed exchange shared by the gap window and the
    * moment rollup; products stay ≤ n·gap² ≈ 1e17 at a year-long horizon —
    * inside 2⁶³ (headroom documented, the q130 discipline). */
  def q157Burstiness(spark: SparkSession, sfDir: String): DataFrame =
    burstinessOn(Tables(spark, sfDir, "events"))

  private[graft] def burstinessOn(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events.filter(col("user_id").isNotNull)
      .withColumn("eps", unix_timestamp(col("ts")))
      .withColumn("gap", col("eps") - lag(col("eps"), 1).over(byUser))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count(col("gap")).as("n_gaps"),
        sum(col("gap")).as("sum_gap"),
        sum(col("gap") * col("gap")).as("sum_gap2"))
      .withColumn("varn",
        col("n_gaps") * col("sum_gap2") - col("sum_gap") * col("sum_gap"))
      .withColumn("burstiness", when(
        col("n_gaps") >= 2 && (col("varn") > 0 || col("sum_gap") > 0),
        (sqrt(col("varn").cast("double")) - col("sum_gap").cast("double"))
          / (sqrt(col("varn").cast("double")) + col("sum_gap").cast("double"))))
      .select(col("user_id"), col("n_events"), col("n_gaps"),
        col("sum_gap"), col("burstiness"))
  }

  val q157BurstinessSql: String = """
    WITH e AS (
      SELECT user_id, event_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS eps
      FROM events WHERE user_id IS NOT NULL),
    g AS (
      SELECT user_id,
        eps - lag(eps) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS gap
      FROM e),
    s AS (
      SELECT user_id, count(*) AS n_events, count(gap) AS n_gaps,
        CAST(sum(gap) AS BIGINT) AS sum_gap,
        CAST(sum(gap * gap) AS BIGINT) AS sum_gap2
      FROM g GROUP BY 1)
    SELECT user_id, n_events, n_gaps, sum_gap,
      CASE WHEN n_gaps >= 2
          AND (n_gaps * sum_gap2 - sum_gap * sum_gap > 0 OR sum_gap > 0)
        THEN (sqrt(CAST(n_gaps * sum_gap2 - sum_gap * sum_gap AS DOUBLE))
              - CAST(sum_gap AS DOUBLE))
          / (sqrt(CAST(n_gaps * sum_gap2 - sum_gap * sum_gap AS DOUBLE))
              + CAST(sum_gap AS DOUBLE))
      END AS burstiness
    FROM s
  """

  /** q160: CUPED-ADJUSTED experiment readout (Deng et al., WSDM 2013) —
    * users split into variants by the deterministic assignment
    * user_id % 2, the observation window split at the corpus midpoint day;
    * each user's PRE-period spend is the covariate x, POST-period spend
    * the metric y, and the pooled θ = cov(x,y)/var(x) shrinks y to
    * y − θ·(x − x̄): the industry-standard variance-reduction step that
    * makes small lifts resolvable. Heavy whales inflate both periods, so
    * the adjustment cancels exactly the between-user noise an unadjusted
    * diff-of-means drowns in.
    *
    * Exactness: spend quantizes to integer cents (the q126 contract); all
    * five pooled moments are exact — cross products accumulate in
    * DECIMAL(38,0)/HUGEINT (the q142 ladder; n·Σxy stays ~1e22 ≪ 1e38) —
    * and θ plus the two per-variant means are a FIXED-ORDER chain of
    * exact-cast double ops, mirrored verbatim in the oracle. Zero pre-
    * period variance degrades θ to 0 (adjusted ≡ raw) in both engines.
    *
    * Scale shape: one user-keyed collapse (map-side combinable sums gated
    * by one broadcast midpoint row), then a 1-row pooled rollup and a
    * 2-row variant rollup — nothing after the collapse scales with users.
    * Variants ride the same collapse; no second scan. */
  def q160Cuped(spark: SparkSession, sfDir: String): DataFrame =
    cupedOn(Tables(spark, sfDir, "events"))

  private[graft] def cupedOn(events: DataFrame): DataFrame = {
    val days = events.filter(col("user_id").isNotNull)
      .select(col("user_id"),
        expr("CAST(floor(unix_timestamp(ts) / 86400.0D) AS BIGINT)").as("day"),
        expr("CAST(floor(value * 100.0D + 0.5D) AS BIGINT)").as("cents"))
    val mid = days.agg(
      expr("(min(day) + max(day) + 1) DIV 2").as("mid_day"))
    // cached: feeds the pooled moments AND the per-variant rollup
    val users = graft.CachedFrames.track(days.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(sum(when(col("day") < col("mid_day"), col("cents"))
          .otherwise(0L)).as("x"),
        sum(when(col("day") >= col("mid_day"), col("cents"))
          .otherwise(0L)).as("y"))
      .withColumn("variant", (col("user_id") % 2).cast("int")))
    val pooled = users.agg(count(lit(1)).as("n_g"),
      sum(col("x")).as("sx_g"), sum(col("y")).as("sy_g"),
      sum(col("x").cast("decimal(19,0)") * col("y").cast("decimal(19,0)"))
        .as("sxy"),
      sum(col("x").cast("decimal(19,0)") * col("x").cast("decimal(19,0)"))
        .as("sxx"))
      .withColumn("covn", col("n_g").cast("decimal(38,0)") * col("sxy")
        - col("sx_g").cast("decimal(38,0)") * col("sy_g").cast("decimal(38,0)"))
      .withColumn("varn", col("n_g").cast("decimal(38,0)") * col("sxx")
        - col("sx_g").cast("decimal(38,0)") * col("sx_g").cast("decimal(38,0)"))
      .withColumn("theta", when(col("varn") =!= 0,
        col("covn").cast("double") / col("varn").cast("double"))
        .otherwise(lit(0.0)))
      .select(col("n_g"), col("sx_g"), col("theta"))
    users.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x")).as("sx_v"), sum(col("y")).as("sy_v"))
      .crossJoin(broadcast(pooled))
      .select(col("variant"), col("n_users"), col("theta"),
        (col("sy_v").cast("double") / (lit(100.0) * col("n_users").cast("double")))
          .as("mean_y"),
        ((col("sy_v").cast("double") / col("n_users").cast("double")
          - col("theta") * (col("sx_v").cast("double") / col("n_users").cast("double")
            - col("sx_g").cast("double") / col("n_g").cast("double"))) / lit(100.0))
          .as("mean_y_adj"))
  }

  val q160CupedSql: String = """
    WITH d AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events WHERE user_id IS NOT NULL),
    mid AS (SELECT (min(day) + max(day) + 1) // 2 AS mid_day FROM d),
    u AS (
      SELECT user_id,
        CAST(sum(CASE WHEN day < mid_day THEN cents ELSE 0 END) AS BIGINT) AS x,
        CAST(sum(CASE WHEN day >= mid_day THEN cents ELSE 0 END) AS BIGINT) AS y,
        CAST(user_id % 2 AS INTEGER) AS variant
      FROM d, mid GROUP BY 1),
    p AS (
      SELECT count(*) AS n_g,
        CAST(sum(x) AS BIGINT) AS sx_g, CAST(sum(y) AS BIGINT) AS sy_g,
        sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy, -- guard:ok internal moment, outputs are doubles
        sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx -- guard:ok internal moment, outputs are doubles
      FROM u),
    t AS (
      SELECT n_g, sx_g,
        CASE WHEN CAST(n_g AS HUGEINT) * sxx
            - CAST(sx_g AS HUGEINT) * CAST(sx_g AS HUGEINT) <> 0
          THEN CAST(CAST(CAST(n_g AS HUGEINT) * sxy
              - CAST(sx_g AS HUGEINT) * CAST(sy_g AS HUGEINT) AS VARCHAR) AS DOUBLE)
            / CAST(CAST(CAST(n_g AS HUGEINT) * sxx
              - CAST(sx_g AS HUGEINT) * CAST(sx_g AS HUGEINT) AS VARCHAR) AS DOUBLE)
          ELSE 0.0 END AS theta
      FROM p),
    v AS (
      SELECT variant, count(*) AS n_users,
        CAST(sum(x) AS BIGINT) AS sx_v, CAST(sum(y) AS BIGINT) AS sy_v
      FROM u GROUP BY 1)
    SELECT v.variant, v.n_users, t.theta,
      CAST(sy_v AS DOUBLE) / (100.0 * CAST(n_users AS DOUBLE)) AS mean_y,
      (CAST(sy_v AS DOUBLE) / CAST(n_users AS DOUBLE)
        - t.theta * (CAST(sx_v AS DOUBLE) / CAST(n_users AS DOUBLE)
          - CAST(sx_g AS DOUBLE) / CAST(n_g AS DOUBLE))) / 100.0 AS mean_y_adj
    FROM v, t
  """

  /** q161: per-day SAMPLE-RATIO-MISMATCH check — the A/B guardrail run
    * before anyone reads q160's lifts: under the deterministic 50/50
    * user_id % 2 assignment, each day's ACTIVE-user split should be
    * binomial-balanced; χ² = (n0−n1)²/n (the two-cell Pearson statistic)
    * flags days where assignment and activity correlate (bot floods,
    * logging loss on one arm — the failures that silently bias every
    * downstream metric). The flag compares 10000·(n0−n1)² > 38415·n —
    * the 3.8415 critical value of χ²₁ cross-multiplied to EXACT integers,
    * so both engines flag identically and the only double is the display
    * χ² itself (one exact-cast division).
    *
    * Scale shape: one distinct (day, user) collapse (map-side partial),
    * then a |days|-row rollup — the q138 presence shape; nothing after
    * the collapse scales with events. */
  def q161SrmCheck(spark: SparkSession, sfDir: String): DataFrame =
    srmCheckOn(Tables(spark, sfDir, "events"))

  private[graft] def srmCheckOn(events: DataFrame): DataFrame =
    events.filter(col("user_id").isNotNull)
      .select(
        expr("CAST(floor(unix_timestamp(ts) / 86400.0D) AS BIGINT)").as("day"),
        col("user_id"))
      .distinct()
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n_v0"),
        sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("n_v1"))
      .withColumn("chi2",
        ((col("n_v0") - col("n_v1")) * (col("n_v0") - col("n_v1")))
          .cast("double") / col("n_users").cast("double"))
      .withColumn("srm_flag",
        lit(10000L) * (col("n_v0") - col("n_v1")) * (col("n_v0") - col("n_v1"))
          > lit(38415L) * col("n_users"))

  val q161SrmCheckSql: String = """
    WITH p AS (
      SELECT DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        user_id
      FROM events WHERE user_id IS NOT NULL),
    s AS (
      SELECT day, count(*) AS n_users,
        CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_v0,
        CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_v1
      FROM p GROUP BY 1)
    SELECT day, n_users, n_v0, n_v1,
      CAST((n_v0 - n_v1) * (n_v0 - n_v1) AS DOUBLE)
        / CAST(n_users AS DOUBLE) AS chi2,
      10000 * (n_v0 - n_v1) * (n_v0 - n_v1) > 38415 * n_users AS srm_flag
    FROM s
  """

  /** q171 tuning: the z constants — 1.96 (two-sided α = 0.05) and 0.8416
    * (80% power), written as FULL double literals interpolated into BOTH
    * engines' expressions (the MmrLambda discipline: never derive one
    * float constant from another at runtime). */
  private[ops] val MdeZAlpha = 1.959963984540054
  private[ops] val MdeZPower = 0.8416212335729143

  /** q171: MINIMUM DETECTABLE EFFECT for the user_id % 2 experiment — the
    * power-analysis readout that belongs NEXT TO q160/q161/q162: given the
    * realized per-variant sample sizes and spend variances, the smallest
    * absolute (and relative) lift a two-sample z-test at α = 0.05 /
    * 80% power can resolve: MDE = (z_α/2 + z_β)·√(s₀²/n₀ + s₁²/n₁).
    * Read BEFORE the experiment: a planned lift below this line cannot be
    * detected at this traffic, so the run would be theater — the single
    * most-skipped check in A/B practice.
    *
    * Exactness: spend quantizes to integer cents; per-variant Σy and Σy²
    * accumulate exactly (Σy² in DECIMAL(38,0)/HUGEINT, the q142 ladder),
    * so each sample variance is ONE division of exact-cast doubles
    * (numerator n·Σy²−(Σy)², denominator n·(n−1), both exact integers);
    * the MDE chain (÷n, +, √, ×, ÷100) is a fixed-order double chain
    * mirrored verbatim in the oracle, and √ is IEEE-correctly-rounded in
    * both engines (the q153/q157 contract). Either variant with n < 2
    * reports NULL, never a division blowup.
    *
    * Scale shape: one map-side user collapse, then a 1-row conditional
    * rollup over users — both-variant moments in ONE aggregate, no pivot,
    * no second scan; nothing after the collapse scales with events. */
  def q171MinDetectableEffect(spark: SparkSession, sfDir: String): DataFrame =
    mdeOn(Tables(spark, sfDir, "events"))

  private[graft] def mdeOn(events: DataFrame): DataFrame =
    mdeOfUsers(spendByUser(events))

  /** q171's collapse stage — the REFRESH seam (the q163 pattern): per-wave
    * user totals merge by summing `y` per user (a user active in both
    * waves must merge BEFORE the variance, which is not additive across
    * waves — EventsSpec pins the law). */
  private[graft] def spendByUser(events: DataFrame): DataFrame =
    events.filter(col("user_id").isNotNull)
      .select(col("user_id"),
        expr("CAST(floor(value * 100.0D + 0.5D) AS BIGINT)").as("cents"))
      .groupBy(col("user_id")).agg(sum(col("cents")).as("y"))

  /** MDE from ANY (user_id, y) per-user totals frame. */
  private[graft] def mdeOfUsers(totals: DataFrame): DataFrame = {
    val users = totals.withColumn("v", (col("user_id") % 2).cast("int"))
    def side(v: Int, n: String, sy: String, syy: String) = Seq(
      count(when(col("v") === v, 1)).as(n),
      sum(when(col("v") === v, col("y")).otherwise(0L)).as(sy),
      sum(when(col("v") === v,
        col("y").cast("decimal(19,0)") * col("y").cast("decimal(19,0)"))
        .otherwise(lit(0).cast("decimal(19,0)"))).as(syy))
    val cols = side(0, "n0", "sy0", "syy0") ++ side(1, "n1", "sy1", "syy1")
    val m = users.agg(cols.head, cols.tail: _*)
    def s2(n: String, sy: String, syy: String) =
      (col(n).cast("decimal(38,0)") * col(syy)
        - col(sy).cast("decimal(38,0)") * col(sy).cast("decimal(38,0)"))
        .cast("double") /
        (col(n).cast("decimal(38,0)") * (col(n) - 1).cast("decimal(38,0)"))
          .cast("double")
    m.select(col("n0"), col("n1"),
      (col("sy0").cast("double") / col("n0").cast("double") / lit(100.0))
        .as("mean0"),
      when(col("n0") >= 2 && col("n1") >= 2,
        (lit(MdeZAlpha) + lit(MdeZPower))
          * sqrt(s2("n0", "sy0", "syy0") / col("n0").cast("double")
            + s2("n1", "sy1", "syy1") / col("n1").cast("double"))
          / lit(100.0)).as("mde_abs"))
      .withColumn("mde_rel",
        when(col("mean0") > 0.0, col("mde_abs") / col("mean0")))
  }

  val q171MinDetectableEffectSql: String = s"""
    WITH u AS (
      SELECT user_id,
        CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS y,
        CAST(user_id % 2 AS INTEGER) AS v
      FROM events WHERE user_id IS NOT NULL GROUP BY 1),
    m AS (
      SELECT
        count(CASE WHEN v = 0 THEN 1 END) AS n0,
        CAST(sum(CASE WHEN v = 0 THEN y ELSE 0 END) AS BIGINT) AS sy0,
        sum(CASE WHEN v = 0 THEN CAST(y AS HUGEINT) * CAST(y AS HUGEINT) ELSE 0::HUGEINT END) AS syy0, -- guard:ok internal moment; outputs are doubles
        count(CASE WHEN v = 1 THEN 1 END) AS n1,
        CAST(sum(CASE WHEN v = 1 THEN y ELSE 0 END) AS BIGINT) AS sy1,
        sum(CASE WHEN v = 1 THEN CAST(y AS HUGEINT) * CAST(y AS HUGEINT) ELSE 0::HUGEINT END) AS syy1 -- guard:ok internal moment; outputs are doubles
      FROM u),
    r AS (
      SELECT n0, n1,
        CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE) / 100.0 AS mean0,
        CASE WHEN n0 >= 2 AND n1 >= 2 THEN
          ($MdeZAlpha + $MdeZPower)
            * sqrt(
              CAST(CAST(CAST(n0 AS HUGEINT) * syy0
                  - CAST(sy0 AS HUGEINT) * CAST(sy0 AS HUGEINT) AS VARCHAR) AS DOUBLE)
                / CAST(CAST(CAST(n0 AS HUGEINT) * (n0 - 1) AS VARCHAR) AS DOUBLE)
                / CAST(n0 AS DOUBLE)
              + CAST(CAST(CAST(n1 AS HUGEINT) * syy1
                  - CAST(sy1 AS HUGEINT) * CAST(sy1 AS HUGEINT) AS VARCHAR) AS DOUBLE)
                / CAST(CAST(CAST(n1 AS HUGEINT) * (n1 - 1) AS VARCHAR) AS DOUBLE)
                / CAST(n1 AS DOUBLE))
            / 100.0
        END AS mde_abs
      FROM m)
    SELECT n0, n1, mean0, mde_abs,
      CASE WHEN mean0 > 0.0 THEN mde_abs / mean0 END AS mde_rel
    FROM r
  """

  /** q174: MEDIAN ABSOLUTE DEVIATION of per-user spend — the robust
    * dispersion number next to q171's variance: one whale moves a
    * variance arbitrarily but moves the MAD not at all, so MAD is what
    * outlier fences (the classic |y − med| > k·MAD cut) and q162's cap
    * choice should be read against. Both the median and the MAD are
    * RANK-EXACT (value at rank ⌈n/2⌉ under the total order (value,
    * user_id) — the q140/q155 convention, no interpolation), so every
    * reported cent is a real user's cents and both engines agree
    * bitwise; the dollar conversions are single divisions.
    *
    * Scale shape: one map-side user collapse (cached — it feeds both
    * rank passes), then TWO ungrouped [[DistRank]] layouts (spend, then
    * |spend − median| with the 1-row median broadcast back) — a billion
    * users rank B-way parallel, never on one task; each pick is a 1-row
    * conditional-max rollup. */
  def q174SpendMad(spark: SparkSession, sfDir: String): DataFrame =
    madOn(Tables(spark, sfDir, "events"))

  private[graft] def madOn(events: DataFrame): DataFrame = {
    val users = graft.CachedFrames.track(
      events.filter(col("user_id").isNotNull)
        .select(col("user_id"),
          expr("CAST(floor(value * 100.0D + 0.5D) AS BIGINT)").as("cents"))
        .groupBy(col("user_id")).agg(sum(col("cents")).as("y")))
    val n = users.agg(count(lit(1)).as("n_users"))
    val med = DistRank.withBucketedRank(users, Seq(), "y", Seq("user_id"), "_r")
      .crossJoin(broadcast(n))
      .agg(max(when(col("_r") === expr("(n_users + 1) DIV 2"), col("y")))
        .as("median_cents"))
    val devs = graft.CachedFrames.track(users.crossJoin(broadcast(med))
      .select(col("user_id"), col("median_cents"),
        abs(col("y") - col("median_cents")).as("d")))
    DistRank.withBucketedRank(devs, Seq(), "d", Seq("user_id"), "_r")
      .crossJoin(broadcast(n))
      .groupBy(col("n_users"), col("median_cents"))
      .agg(max(when(col("_r") === expr("(n_users + 1) DIV 2"), col("d")))
        .as("mad_cents"))
      .select(col("n_users"), col("median_cents"), col("mad_cents"),
        (col("median_cents").cast("double") / lit(100.0)).as("median"),
        (col("mad_cents").cast("double") / lit(100.0)).as("mad"))
  }

  val q174SpendMadSql: String = """
    WITH u AS (
      SELECT user_id,
        CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS y
      FROM events WHERE user_id IS NOT NULL GROUP BY 1),
    r AS (
      SELECT y, row_number() OVER (ORDER BY y, user_id) AS rnk,
        count(*) OVER () AS n
      FROM u),
    m AS (
      SELECT max(n) AS n_users,
        CAST(max(CASE WHEN rnk = (n + 1) // 2 THEN y END) AS BIGINT)
          AS median_cents
      FROM r GROUP BY n),
    d AS (
      SELECT u.user_id, m.median_cents, abs(u.y - m.median_cents) AS d,
        m.n_users
      FROM u, m),
    r2 AS (
      SELECT d, median_cents, n_users,
        row_number() OVER (ORDER BY d, user_id) AS rnk
      FROM d)
    SELECT CAST(max(n_users) AS BIGINT) AS n_users, median_cents,
      CAST(max(CASE WHEN rnk = (n_users + 1) // 2 THEN d END) AS BIGINT)
        AS mad_cents,
      CAST(median_cents AS DOUBLE) / 100.0 AS median,
      CAST(CAST(max(CASE WHEN rnk = (n_users + 1) // 2 THEN d END) AS VARCHAR) AS DOUBLE)
        / 100.0 AS mad
    FROM r2 GROUP BY n_users, median_cents
  """

  /** q177 tuning: the Benford expectations log₁₀(1 + 1/d) for d = 1..9,
    * computed ONCE here and interpolated as the identical literal into
    * both engines' expressions (the MmrLambda discipline — the engines
    * never run their own log). */
  private[ops] val BenfordP: Seq[Double] =
    (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** q177: BENFORD FIRST-DIGIT AUDIT of transaction amounts — the
    * classic forensic screen: organically generated monetary amounts
    * follow log₁₀(1 + 1/d) first-significant-digit frequencies, while
    * fabricated, capped, or bot-generated values pile up on specific
    * digits. Run next to q151's CUSUM and q161's SRM as the third fraud/
    * integrity guardrail over the events stream. Per digit: exact count,
    * observed frequency (one division), the Benford expectation (a
    * literal — see [[BenfordP]]), and the deviation (one subtraction) —
    * max |deviation| is the usual flag statistic and is order-free to
    * compute downstream. Digits with zero occurrences still report (the
    * 9-row grid is the driver, not the data).
    *
    * Scale shape: one map-side digit rollup (≤ 9 groups — the perfect
    * combine), a 1-row total, and a 9-row literal grid left-join. Nothing
    * scales past the scan. */
  def q177BenfordAudit(spark: SparkSession, sfDir: String): DataFrame =
    benfordOn(Tables(spark, sfDir, "events"))

  /** q177's counting stage — SINGLE-SOURCED with the streaming twin
    * ([[graft.streaming.EventStreams.benfordStream]] IS this aggregation
    * on an unbounded frame), so a digit-extraction tweak cannot diverge
    * the spec-pinned batch ≡ streaming contract. */
  private[graft] def benfordCounts(events: DataFrame): DataFrame =
    benfordCountsOfCents(events.select(
      expr("CAST(floor(value * 100.0D + 0.5D) AS BIGINT)").as("cents")))

  /** The digit rollup over ANY `cents` frame — amount-source-generic
    * (q228 runs it on order totals). Non-positive amounts have no first
    * significant digit and are excluded in both engines. */
  private[graft] def benfordCountsOfCents(cents: DataFrame): DataFrame =
    cents.filter(col("cents") >= 1L)
      .select(expr("CAST(substring(CAST(cents AS STRING), 1, 1) AS INT)")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_events"))

  private[graft] def benfordOn(events: DataFrame): DataFrame =
    benfordOfCents(events.select(
      expr("CAST(floor(value * 100.0D + 0.5D) AS BIGINT)").as("cents")))

  /** The full 9-row audit over ANY `cents` frame — [[benfordOn]]'s
    * source-generic face. */
  private[graft] def benfordOfCents(centsDf: DataFrame): DataFrame = {
    val spark = centsDf.sparkSession
    val counts = benfordCountsOfCents(centsDf)
    val n = counts.agg(coalesce(sum(col("n_events")), lit(0L)).as("_n"))
    val pCase = BenfordP.zipWithIndex
      .map { case (p, i) => s"WHEN ${i + 1} THEN ${p}D" }
      .mkString("CASE digit ", " ", " END")
    spark.range(1, 10).select(col("id").cast("int").as("digit"))
      .join(counts, Seq("digit"), "left")
      .crossJoin(broadcast(n))
      .select(col("digit"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        when(col("_n") > 0, coalesce(col("n_events"), lit(0L)).cast("double")
          / col("_n").cast("double")).as("freq"),
        expr(pCase).as("benford_p"))
      .withColumn("dev", col("freq") - col("benford_p"))
  }

  val q177BenfordAuditSql: String = benfordSqlFromCents(
    "SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents FROM events")

  /** The audit oracle parameterized by the cents source — [[benfordOfCents]]'s
    * oracle face (q177 events values, q228 order totals). */
  private[graft] def benfordSqlFromCents(centsSql: String): String = {
    // `e0` forces a native DOUBLE literal: a bare decimal literal is
    // DECIMAL in DuckDB and the DECIMAL→DOUBLE cast is NOT the correctly-
    // rounded string→double parse (observed 1-ulp divergence on d = 3)
    val pCase = BenfordP.zipWithIndex
      .map { case (p, i) => s"WHEN ${i + 1} THEN ${p}e0" }
      .mkString("CASE g.digit ", " ", " END")
    s"""
    WITH c AS (
      SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit,
        count(*) AS n_events
      FROM ($centsSql) WHERE cents >= 1
      GROUP BY 1),
    t AS (SELECT CAST(coalesce(sum(n_events), 0) AS BIGINT) AS n FROM c), -- guard:ok internal total; outputs below are CAST
    g AS (SELECT unnest(generate_series(1, 9)) AS digit)
    SELECT CAST(g.digit AS INTEGER) AS digit,
      CAST(coalesce(c.n_events, 0) AS BIGINT) AS n_events,
      CASE WHEN t.n > 0 THEN
        CAST(coalesce(c.n_events, 0) AS DOUBLE) / CAST(t.n AS DOUBLE)
      END AS freq,
      ($pCase) AS benford_p,
      (CASE WHEN t.n > 0 THEN
        CAST(coalesce(c.n_events, 0) AS DOUBLE) / CAST(t.n AS DOUBLE)
      END) - ($pCase) AS dev
    FROM g LEFT JOIN c ON g.digit = c.digit, t
  """
  }

  /** q181: CHURN LABEL BUILDING — the supervised-dataset generator: one
    * row per (user, active week) with this week's activity features
    * (events, distinct active days, spend cents) and the LABEL "was the
    * user active in week w+1". The canonical example of what a training-
    * data engine exists to do — turn a raw event log into leakage-free
    * (features from week w only, label from w+1 only) supervised rows —
    * and the labels are exact set membership, not model output, so the
    * whole table oracle-checks. The final calendar week is EXCLUDED: its
    * label is unknowable (right-censored), and emitting it would be
    * silent label noise.
    *
    * Scale shape: one map-side (user, week) rollup, a 1-row max-week
    * broadcast, and the label is a self equi-join of the rollup on
    * (user, week+1) — |user-weeks| keyed, never events². Everything
    * combines map-side before the one exchange. */
  def q181ChurnLabels(spark: SparkSession, sfDir: String): DataFrame =
    churnLabelsOn(Tables(spark, sfDir, "events"))

  private[graft] def churnLabelsOn(events: DataFrame): DataFrame = {
    val uw = graft.CachedFrames.track(
      events.filter(col("user_id").isNotNull)
        .select(col("user_id"),
          expr("CAST(floor(unix_timestamp(ts) / 604800.0D) AS BIGINT)")
            .as("wk"),
          expr("CAST(floor(unix_timestamp(ts) / 86400.0D) AS BIGINT)")
            .as("day"),
          expr("CAST(floor(value * 100.0D + 0.5D) AS BIGINT)").as("cents"))
        .groupBy(col("user_id"), col("wk"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("day")).as("n_days"),
          sum(col("cents")).as("spend_cents")))
    val maxWk = uw.agg(max(col("wk")).as("_max_wk"))
    val next = uw.select(col("user_id").as("_nu"), (col("wk") - 1).as("_nw"))
    uw.crossJoin(broadcast(maxWk))
      .filter(col("wk") < col("_max_wk")) // censored final week excluded
      .join(next, col("user_id") === col("_nu") && col("wk") === col("_nw"),
        "left")
      .select(col("user_id"), col("wk"), col("n_events"), col("n_days"),
        col("spend_cents"), col("_nu").isNotNull.as("active_next_wk"))
  }

  val q181ChurnLabelsSql: String = """
    WITH uw AS (
      SELECT user_id,
        CAST(floor(epoch(ts) / 604800.0) AS BIGINT) AS wk,
        count(*) AS n_events,
        count(DISTINCT CAST(floor(epoch(ts) / 86400.0) AS BIGINT)) AS n_days,
        CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
          AS spend_cents
      FROM events WHERE user_id IS NOT NULL
      GROUP BY 1, 2),
    mx AS (SELECT max(wk) AS max_wk FROM uw)
    SELECT a.user_id, a.wk,
      CAST(a.n_events AS BIGINT) AS n_events,
      CAST(a.n_days AS BIGINT) AS n_days,
      a.spend_cents,
      b.user_id IS NOT NULL AS active_next_wk
    FROM uw a
    LEFT JOIN uw b ON a.user_id = b.user_id AND b.wk = a.wk + 1, mx
    WHERE a.wk < mx.max_wk
  """

  /** q162's cap quantile: winsorize at the pooled p99 (rank-exact, the
    * q140/q155 convention). */
  private[ops] val WinsorA = 99L
  private[ops] val WinsorB = 100L

  /** q162: WINSORIZED variant means — per-user total spend capped at the
    * POOLED rank-exact p99 before averaging, the standard metric-capping
    * step between q161's guardrail and q160's adjustment: one whale in one
    * arm moves a raw mean by more than any plausible treatment effect, and
    * capping at a shared quantile bounds that influence without dropping
    * the user. The cap is pooled across variants on purpose (a per-variant
    * cap would let the treatment change its own cap — a bias, not a
    * robustness gain).
    *
    * Exactness: totals are integer cents, the cap is the value at rank
    * ⌈0.99·n⌉ (no interpolation), min(y, cap) is integer, and the two
    * means are one exact-cast division each.
    *
    * Scale shape: one user-keyed collapse (cached — feeds the rank and
    * the rollup), the pooled rank is [[DistRank.withBucketedRank]] with
    * NO group (B-way parallel, no single-partition sort), the cap rides a
    * 1-row broadcast, and the variant rollup combines map-side. */
  def q162WinsorizedMeans(spark: SparkSession, sfDir: String): DataFrame =
    winsorizedMeansOn(Tables(spark, sfDir, "events"))

  private[graft] def winsorizedMeansOn(events: DataFrame): DataFrame = {
    val users = graft.CachedFrames.track(events.filter(col("user_id").isNotNull)
      .select(col("user_id"),
        expr("CAST(floor(value * 100.0D + 0.5D) AS BIGINT)").as("cents"))
      .groupBy(col("user_id"))
      .agg(sum(col("cents")).as("y"))
      .withColumn("variant", (col("user_id") % 2).cast("int")))
    val n = users.agg(count(lit(1)).as("n_g"))
    val cap = DistRank.withBucketedRank(users, Seq(), "y", Seq("user_id"), "_r")
      .crossJoin(broadcast(n))
      .agg(max(when(col("_r") ===
        expr(s"($WinsorA * n_g + ${WinsorB - 1}) DIV $WinsorB"), col("y")))
        .as("cap_cents"))
    users.crossJoin(broadcast(cap))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"), sum(col("y")).as("sy"),
        sum(least(col("y"), col("cap_cents"))).as("syw"),
        max(col("cap_cents")).as("cap_cents"))
      .select(col("variant"), col("n_users"), col("cap_cents"),
        (col("sy").cast("double") / (lit(100.0) * col("n_users").cast("double")))
          .as("mean_raw"),
        (col("syw").cast("double") / (lit(100.0) * col("n_users").cast("double")))
          .as("mean_winsorized"))
  }

  val q162WinsorizedMeansSql: String = s"""
    WITH u AS (
      SELECT user_id,
        CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS y,
        CAST(user_id % 2 AS INTEGER) AS variant
      FROM events WHERE user_id IS NOT NULL GROUP BY 1),
    r AS (
      SELECT y, row_number() OVER (ORDER BY y, user_id) AS rnk,
        count(*) OVER () AS n
      FROM u),
    c AS (
      SELECT max(CASE WHEN rnk = ($WinsorA * n + ${WinsorB - 1}) // $WinsorB
        THEN y END) AS cap_cents FROM r)
    SELECT variant, count(*) AS n_users, c.cap_cents,
      CAST(sum(y) AS DOUBLE) / (100.0 * CAST(count(*) AS DOUBLE)) AS mean_raw,
      CAST(sum(least(y, c.cap_cents)) AS DOUBLE)
        / (100.0 * CAST(count(*) AS DOUBLE)) AS mean_winsorized
    FROM u, c GROUP BY 1, 3
  """

  /** q190: MANN–WHITNEY U TEST of per-user spend between the experiment
    * variants — the NONPARAMETRIC significance test the parametric family
    * (q161 lift, q171 MDE, q162 winsorized means) lacks: spend is heavy-
    * tailed, a few whales dominate the t-statistic, and the rank test is
    * the one an experimentation readout trusts on such data. U counts
    * variant-1-beats-variant-0 pairs (ties half); z is the tie-corrected
    * normal approximation z = (U − n₀n₁/2) / σ with
    * σ² = n₀n₁((N³−N) − Σ(t³−t)) / (12N(N−1)) over tie-group sizes t.
    * Compare |z| to 1.96 — no erf in the gate (not bitwise-portable).
    *
    * Exactness: 2U accumulates exactly as Σ pos·(2·cumneg + neg) in
    * DECIMAL(38,0)/HUGEINT (the q167 rank-sum engine — U = AUC·n₀n₁ up to
    * scale); the tie term Σ(t³−t) and every σ² factor are exact integers
    * (N³ exact to N ≈ 4.6e12 users); z is a fixed-order double chain whose
    * only non-arithmetic op is sqrt (IEEE-correctly-rounded both engines).
    * Pinned bitwise against a plain-Scala BigInt brute pair count.
    *
    * Scale shape: q171's user collapse (the same refresh seam), a
    * ≤|distinct spends| per-score rollup, the ungrouped [[DistRank]]
    * layout + one slim bucketed q59 prefix sum, ONE 1-row rollup. No
    * SinglePartition window (PlanSpec pin). */
  def q190SpendMwu(spark: SparkSession, sfDir: String): DataFrame =
    mwuOfUsers(spendByUser(Tables(spark, sfDir, "events")))

  /** The U-test over ANY (user_id, y) per-user totals frame (variant =
    * user_id % 2, the q171 assignment). */
  private[graft] def mwuOfUsers(totals: DataFrame): DataFrame =
    mwuOfCounts(totals
      .select(col("y").as("q"), (col("user_id") % 2 === 1).as("t"))
      .groupBy(col("q"))
      .agg(sum(when(col("t"), 1L).otherwise(0L)).as("pos"),
        sum(when(col("t"), 0L).otherwise(1L)).as("neg")))

  /** The tie-corrected engine over ANY (q, pos, neg) per-score counts —
    * fixture-testable against the brute pair count. */
  private[graft] def mwuOfCounts(perScore: DataFrame): DataFrame = {
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val ranked = graft.CachedFrames.track(
      graft.ops.DistRank.withBucketedRank(perScore, Seq(), "q", Seq(), "_pos"))
    val slim = ranked.select(
      expr("substring(CAST(q AS STRING), 1, 0)").as("source"),
      col("_pos").as("doc_id"), col("neg"))
    val run = graft.ops.TextOps
      .distributedRunningSum(slim, "neg", Seq("doc_id"), slim)
      .select(col("doc_id").as("_rpos"),
        (col("running") - col("neg")).as("cumneg"))
    val m = ranked.join(run, col("_pos") === col("_rpos"))
      .agg(sum(col("pos")).as("np"), sum(col("neg")).as("nn"),
        sum(d38(col("pos")) * (col("cumneg") * 2 + col("neg"))
          .cast("decimal(38,0)")).as("u2"),
        sum(d38(col("pos") + col("neg")) * d38(col("pos") + col("neg"))
          * d38(col("pos") + col("neg"))
          - d38(col("pos") + col("neg"))).as("tcorr"))
    val bigN = d38(col("np")) + d38(col("nn"))
    // (N³−N) − Σ(t³−t): exact DECIMAL to N ≈ 4.6e12; kept SEPARATE from
    // the np·nn factor (their exact product would hit the DECIMAL(38,0)
    // ceiling near N ≈ 3e7) — σ² multiplies the two exact-cast factors in
    // the double domain, the same fixed ((a·b)/c) chain as the oracle
    val varTerm = bigN * bigN * bigN - bigN - col("tcorr")
    m.select(col("np").as("n1"), col("nn").as("n0"),
      // U exactly: u2/2 — halving a binary integer is exact in a double
      (col("u2").cast("double") / lit(2)).as("u"),
      when(col("np") > 0 && col("nn") > 0 && varTerm > 0,
        // z = (u2 − n0·n1) / (2σ); σ² = np·nn·((N³−N)−T) / (12N(N−1))
        (col("u2") - d38(col("np")) * d38(col("nn"))).cast("double")
          / (lit(2) * sqrt(
            (d38(col("np")) * d38(col("nn"))).cast("double")
              * varTerm.cast("double")
              / (lit(12) * bigN * (bigN - 1)).cast("double")))).as("z"))
  }

  val q190SpendMwuSql: String = s"""
    WITH u AS (
      SELECT user_id,
        CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS y
      FROM events WHERE user_id IS NOT NULL GROUP BY 1),
    s AS (
      SELECT y AS q,
        CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS pos,
        CAST(sum(CASE WHEN user_id % 2 = 1 THEN 0 ELSE 1 END) AS BIGINT)
          AS neg
      FROM u GROUP BY 1),
    c AS (
      SELECT q, pos, neg,
        coalesce(CAST(sum(neg) OVER (ORDER BY q
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
          AS cumneg
      FROM s),
    m AS (
      SELECT CAST(sum(pos) AS BIGINT) AS np, CAST(sum(neg) AS BIGINT) AS nn,
        sum(CAST(pos AS HUGEINT) * (cumneg * 2 + neg)) AS u2, -- guard:ok internal HUGEINT; outputs below are exact-cast
        sum(CAST(pos + neg AS HUGEINT) * (pos + neg) * (pos + neg) -- guard:ok internal HUGEINT tie term; outputs below are exact-cast
          - (pos + neg)) AS tcorr
      FROM c)
    SELECT np AS n1, nn AS n0,
      CAST(CAST(u2 AS VARCHAR) AS DOUBLE) / 2 AS u,
      CASE WHEN np > 0 AND nn > 0 AND
          (CAST(np + nn AS HUGEINT) * (np + nn) * (np + nn) - (np + nn)
            - tcorr) > 0 THEN
        CAST(CAST(u2 - CAST(np AS HUGEINT) * nn AS VARCHAR) AS DOUBLE)
          / (2 * sqrt(
            CAST(CAST(CAST(np AS HUGEINT) * nn AS VARCHAR) AS DOUBLE)
              * CAST(CAST(CAST(np + nn AS HUGEINT) * (np + nn) * (np + nn)
                - (np + nn) - tcorr AS VARCHAR) AS DOUBLE)
              / CAST(CAST(12 * CAST(np + nn AS HUGEINT)
                * (np + nn - 1) AS VARCHAR) AS DOUBLE)))
      END AS z
    FROM m
  """

  /** q206 tuning: funnel deadlines (view→click, click→purchase). */
  private[graft] val FunnelClickWindowSec = 3600L
  private[graft] val FunnelPurchaseWindowSec = 86400L

  /** q206: TIME-WINDOW FUNNEL — the deadline-constrained conversion
    * summary q66's unconstrained stage count can't express: a user
    * converts stage 1 only if their first click lands within ONE HOUR of
    * their first view, and stage 2 only if the first purchase after that
    * click lands within 24 HOURS of it. The funnel a growth dashboard
    * actually reports ("1-hour CTR", "24-hour purchase conversion") —
    * without the deadline, a purchase six months later inflates the rate
    * with conversions the campaign didn't cause. q155 measures HOW LONG
    * the converted took; this fixes the horizon FIRST and counts who
    * makes it.
    *
    * Conventions (mirrored verbatim in the oracle): anchor = first view;
    * qualifying click = FIRST click at-or-after the anchor (`>=` — a
    * same-second click counts), in only if ≤ anchor + 3600; qualifying
    * purchase = first purchase at-or-after that click, in only if ≤
    * click + 86400. Counts exact; rates single divisions.
    *
    * Scale shape: one cached (user, type, eps) projection, three
    * user-keyed map-side min-rollups chained by equi-joins (the q66
    * shape), three 1-row counts on broadcasts. No window, no sort. */
  def q206WindowFunnel(spark: SparkSession, sfDir: String): DataFrame =
    windowFunnelOn(Tables(spark, sfDir, "events"))

  /** The constrained-funnel core over ANY events frame. */
  private[graft] def windowFunnelOn(events: DataFrame): DataFrame = {
    val e = graft.CachedFrames.track(events.filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("eps")))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("eps")).as("v"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("eps") >= col("v"))
      .groupBy(col("user_id"))
      .agg(min(col("eps")).as("c"), min(col("v")).as("v"))
      .filter(col("c") <= col("v") + FunnelClickWindowSec)
    val p = e.filter(col("event_type") === "purchase")
      .join(c.select(col("user_id"), col("c")), "user_id")
      .filter(col("eps") >= col("c"))
      .groupBy(col("user_id"))
      .agg(min(col("eps")).as("p"), min(col("c")).as("c"))
      .filter(col("p") <= col("c") + FunnelPurchaseWindowSec)
    v.agg(count(lit(1)).as("n_viewers"))
      .crossJoin(broadcast(c.agg(count(lit(1)).as("n_clicked_in_1h"))))
      .crossJoin(broadcast(p.agg(count(lit(1)).as("n_purchased_in_24h"))))
      .select(col("n_viewers"), col("n_clicked_in_1h"),
        col("n_purchased_in_24h"),
        when(col("n_viewers") > 0, col("n_clicked_in_1h").cast("double")
          / col("n_viewers").cast("double")).as("click_rate"),
        when(col("n_clicked_in_1h") > 0,
          col("n_purchased_in_24h").cast("double")
            / col("n_clicked_in_1h").cast("double")).as("purchase_rate"))
  }

  val q206WindowFunnelSql: String = s"""
    WITH e AS (
      SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS eps
      FROM events WHERE user_id IS NOT NULL),
    v AS (SELECT user_id, min(eps) AS v FROM e
          WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, min(e.eps) AS c, min(v.v) AS v
          FROM e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.eps >= v.v GROUP BY 1
          HAVING min(e.eps) <= min(v.v) + $FunnelClickWindowSec),
    p AS (SELECT e.user_id, min(e.eps) AS p, min(c.c) AS c
          FROM e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.eps >= c.c GROUP BY 1
          HAVING min(e.eps) <= min(c.c) + $FunnelPurchaseWindowSec),
    m AS (SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_viewers,
        (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_clicked_in_1h,
        (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchased_in_24h)
    SELECT n_viewers, n_clicked_in_1h, n_purchased_in_24h,
      CASE WHEN n_viewers > 0 THEN
        CAST(n_clicked_in_1h AS DOUBLE) / CAST(n_viewers AS DOUBLE) END
        AS click_rate,
      CASE WHEN n_clicked_in_1h > 0 THEN
        CAST(n_purchased_in_24h AS DOUBLE)
          / CAST(n_clicked_in_1h AS DOUBLE) END AS purchase_rate
    FROM m
  """

  /** q208: NEW vs RETURNING daily actives — per day, how many of the
    * day's distinct active users are seen for the FIRST time vs have
    * history. The acquisition/retention split every traffic dashboard
    * leads with: a DAU spike that is all new users is a campaign landing,
    * the same spike in returning users is a habit forming — q138's
    * stickiness ratio can't tell them apart, and q102's cohort matrix is
    * the full-detail view this one-line-per-day summary fronts.
    *
    * Exactness: counts exact (distinct presence, min-day first-seen);
    * frac_new is one division.
    *
    * Scale shape: ONE distinct (user, day) collapse feeds both the
    * first-seen min-rollup and the presence frame (cached); one user-keyed
    * equi-join back; a |days|-row map-side rollup. */
  def q208NewReturning(spark: SparkSession, sfDir: String): DataFrame =
    newReturningOn(Tables(spark, sfDir, "events"))

  /** The split core over ANY events frame — fixture-testable. */
  private[graft] def newReturningOn(events: DataFrame): DataFrame = {
    val presence = graft.CachedFrames.track(
      events.filter(col("user_id").isNotNull)
        .select(col("user_id"),
          expr("CAST(floor(unix_timestamp(ts) / 86400.0D) AS BIGINT)")
            .as("day"))
        .distinct())
    val first = presence.groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"))
    presence.join(first, "user_id")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
          .as("n_new"))
      .select(col("day"), col("n_active"), col("n_new"),
        (col("n_active") - col("n_new")).as("n_returning"),
        (col("n_new").cast("double") / col("n_active").cast("double"))
          .as("frac_new"))
  }

  val q208NewReturningSql: String = """
    WITH p AS (
      SELECT DISTINCT user_id,
        CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
      FROM events WHERE user_id IS NOT NULL),
    f AS (SELECT user_id, min(day) AS first_day FROM p GROUP BY 1)
    SELECT p.day, CAST(count(*) AS BIGINT) AS n_active,
      CAST(sum(CASE WHEN p.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
        AS n_new,
      CAST(count(*) - sum(CASE WHEN p.day = f.first_day THEN 1 ELSE 0 END)
        AS BIGINT) AS n_returning,
      CAST(sum(CASE WHEN p.day = f.first_day THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(count(*) AS DOUBLE) AS frac_new
    FROM p JOIN f USING (user_id) GROUP BY 1
  """

  /** q219: KRUSKAL–WALLIS TEST of `value` across event types — the
    * k-group generalization of q190's Mann–Whitney (k = 2): does the
    * transaction-value distribution differ BY BEHAVIOR, as one rank-based
    * H statistic (χ²_{k−1} under the null) immune to the whale tail that
    * dominates any variance-based ANOVA. Ties get exact MIDRANKS (doubled
    * midranks stay integers: 2·cum_before + cnt_at_value + 1) and the
    * standard tie correction 1 − ΣT/(N³−N).
    *
    * Exactness: per-value/per-group counts, doubled rank sums R2_i and
    * the tie term are exact DECIMAL(38,0)/HUGEINT; each group's
    * Σ-term R2_i²/(4n_i) is a fixed chain on exact-cast doubles, and the
    * cross-group sum folds in EVENT-TYPE ORDER via an ordered-list
    * reduce in both engines (the q108 ordered-fold idiom — re-ordered
    * double accumulation is the one non-portable step, so it is pinned);
    * H's final chain is written in the identical op order in both
    * engines. NULL values are excluded; an all-tied sample reports NULL
    * h_tie_corrected (correction 0), never ±Inf.
    *
    * Scale shape: one map-side (value, type) collapse; per-value totals
    * feed q190's ungrouped [[DistRank]] + q59 prefix-sum engine for
    * cum_before; midranks join back value-keyed; the fold runs over
    * ≤|types| rows. */
  def q219ValueKw(spark: SparkSession, sfDir: String): DataFrame =
    valueKwOn(Tables(spark, sfDir, "events")
      .filter(col("value").isNotNull)
      .select(expr("CAST(floor(value * 100.0D + 0.5D) AS BIGINT)").as("q"),
        col("event_type").as("t")))

  /** The KW core over ANY (q, t) sample frame — fixture-testable. */
  private[graft] def valueKwOn(samples: DataFrame): DataFrame = {
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val cells = graft.CachedFrames.track(
      samples.groupBy(col("q"), col("t")).agg(count(lit(1)).as("c")))
    val perValue = graft.CachedFrames.track(
      cells.groupBy(col("q")).agg(sum(col("c")).as("ca")))
    val ranked = graft.CachedFrames.track(
      DistRank.withBucketedRank(perValue, Seq(), "q", Seq(), "_pos"))
    val slim = ranked.select(
      expr("substring(CAST(q AS STRING), 1, 0)").as("source"),
      col("_pos").as("doc_id"), col("ca"))
    val run = graft.ops.TextOps
      .distributedRunningSum(slim, "ca", Seq("doc_id"), slim)
      .select(col("doc_id").as("_rp"), (col("running") - col("ca")).as("cb"))
    // doubled midrank per value: 2·cum_before + cnt_at_value + 1
    val mid = ranked.join(run, col("_pos") === col("_rp"))
      .select(col("q"), col("ca"),
        (col("cb") * 2 + col("ca") + 1).as("mr2"))
    val groups = cells.join(mid.select(col("q"), col("mr2")), "q")
      .groupBy(col("t"))
      .agg(sum(col("c")).as("ni"),
        sum(d38(col("c")) * d38(col("mr2"))).as("r2"))
    val ties = perValue.agg(
      sum(d38(col("ca")) * d38(col("ca")) * d38(col("ca")) - d38(col("ca")))
        .as("tie_term"),
      sum(col("ca")).as("n"))
    val folded = groups
      .select(col("t"), col("ni"),
        ((col("r2").cast("double") * col("r2").cast("double"))
          / (lit(4.0) * col("ni").cast("double"))).as("term"))
      .agg(count(lit(1)).as("k"), expr(
        """aggregate(transform(sort_array(collect_list(struct(t, term))),
          |  x -> x.term), 0.0D, (a, x) -> a + x)""".stripMargin).as("s"))
    // r17: ONE ties broadcast — cnum/cden are functions of the same (n,
    // tie_term) row the h leg already carries, so the second broadcast
    // barrier the old plan paid was pure overhead (identical expressions,
    // identical values)
    folded.crossJoin(broadcast(ties))
      .select(col("n").as("n_total"), col("k").as("n_groups"),
        col("tie_term").cast("double").as("tie_term"),
        (lit(12.0) * col("s")
          / (d38(col("n")) * (d38(col("n")) + 1)).cast("double")
          - lit(3.0) * (col("n") + 1).cast("double")).as("h"),
        ((d38(col("n")) * d38(col("n")) * d38(col("n")) - d38(col("n"))
          - col("tie_term"))).as("cnum"),
        (d38(col("n")) * d38(col("n")) * d38(col("n")) - d38(col("n")))
          .as("cden"))
      .select(col("n_total"), col("n_groups"), col("tie_term"), col("h"),
        when(col("cnum") > 0,
          col("h") / (col("cnum").cast("double")
            / col("cden").cast("double"))).as("h_tie_corrected"))
  }

  val q219ValueKwSql: String = """
    WITH s0 AS (
      SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS q, event_type AS t
      FROM events WHERE value IS NOT NULL),
    cells AS (SELECT q, t, CAST(count(*) AS BIGINT) AS c
              FROM s0 GROUP BY 1, 2),
    pv AS (SELECT q, CAST(sum(c) AS BIGINT) AS ca FROM cells GROUP BY 1),
    mid AS (
      SELECT q, ca,
        (coalesce(CAST(sum(ca) OVER (ORDER BY q
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0))
          * 2 + ca + 1 AS mr2
      FROM pv),
    g AS (
      SELECT cells.t, CAST(sum(cells.c) AS BIGINT) AS ni,
        sum(CAST(cells.c AS HUGEINT) * mid.mr2) AS r2 -- guard:ok internal HUGEINT; the term below is exact-cast
      FROM cells JOIN mid ON cells.q = mid.q GROUP BY 1),
    tt AS (
      SELECT sum(CAST(ca AS HUGEINT) * ca * ca - ca) AS tie_term, -- guard:ok internal HUGEINT; outputs below are exact-cast
        CAST(sum(ca) AS BIGINT) AS n
      FROM pv),
    f AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
        list_reduce(list_prepend(0e0, list(
          CAST(CAST(r2 AS VARCHAR) AS DOUBLE)
            * CAST(CAST(r2 AS VARCHAR) AS DOUBLE)
            / (4e0 * CAST(ni AS DOUBLE)) ORDER BY t)),
          (a, x) -> a + x) AS s
      FROM g)
    SELECT tt.n AS n_total, f.k AS n_groups,
      CAST(CAST(tt.tie_term AS VARCHAR) AS DOUBLE) AS tie_term,
      12e0 * f.s
        / CAST(CAST(CAST(tt.n AS HUGEINT) * (tt.n + 1) AS VARCHAR) AS DOUBLE)
        - 3e0 * CAST(tt.n + 1 AS DOUBLE) AS h,
      CASE WHEN (CAST(tt.n AS HUGEINT) * tt.n * tt.n - tt.n - tt.tie_term)
          > 0 THEN
        (12e0 * f.s
          / CAST(CAST(CAST(tt.n AS HUGEINT) * (tt.n + 1) AS VARCHAR)
            AS DOUBLE)
          - 3e0 * CAST(tt.n + 1 AS DOUBLE))
        / (CAST(CAST(CAST(tt.n AS HUGEINT) * tt.n * tt.n - tt.n
            - tt.tie_term AS VARCHAR) AS DOUBLE)
          / CAST(CAST(CAST(tt.n AS HUGEINT) * tt.n * tt.n - tt.n
            AS VARCHAR) AS DOUBLE))
      END AS h_tie_corrected
    FROM f, tt
  """

  /** q215: PER-TYPE TREND TABLE — q199's Mann–Kendall test run for EVERY
    * event type over the shared global calendar: which behaviors are
    * monotonically growing or dying, each with its tie-corrected z. The
    * grouped companion q199's corpus-total cannot provide (purchases can
    * crater inside a flat total), and the significance layer over q151's
    * per-type CUSUM localization. A type absent on a live day counts 0
    * (the [[denseSeries]] contract per type, over the GLOBAL [min, max]
    * calendar so every type is judged on the same window); a type whose
    * series is constant reports NULL z, never ±Inf.
    *
    * Exactness: q199's — S and var_num exact BIGINTs, z's only
    * non-arithmetic op is sqrt, identical op order in both engines.
    *
    * Scale shape: one map-side (type, day) rollup; the dense frame is
    * |types|·|days| (schema × calendar — never data-sized); the pair walk
    * is TYPE-KEYED equi-join (not a cross), the declared calendar-bounded
    * q199 contract per type; ≤|types| rows out. */
  def q215TypeTrends(spark: SparkSession, sfDir: String): DataFrame =
    typeTrendsOn(Tables(spark, sfDir, "events"))

  /** The grouped-MK core over ANY events frame — fixture-testable. */
  private[graft] def typeTrendsOn(events: DataFrame): DataFrame = {
    val obs = events.select(col("event_type"),
        expr("CAST(floor(unix_timestamp(ts) / 86400.0D) AS BIGINT)")
          .as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c"))
    val cal = obs.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val dense = graft.CachedFrames.track(
      obs.select(col("event_type")).distinct()
        .crossJoin(cal)
        .join(obs, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("c"), lit(0L)).as("c")))
    val s = dense.as("a").join(dense.as("b"),
        col("a.event_type") === col("b.event_type")
          && col("b.day") > col("a.day"))
      .groupBy(col("a.event_type").as("event_type"))
      .agg(sum(when(col("b.c") > col("a.c"), 1L)
        .when(col("b.c") < col("a.c"), -1L).otherwise(0L)).as("s_stat"))
    val ties = dense.groupBy(col("event_type"), col("c"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"))
      .agg(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5))
        .as("tie_term"))
    dense.groupBy(col("event_type")).agg(count(lit(1)).as("n_days"))
      .join(ties, "event_type")
      .join(s, Seq("event_type"), "left")
      .select(col("event_type"), col("n_days"),
        coalesce(col("s_stat"), lit(0L)).as("s_stat"),
        (col("n_days") * (col("n_days") - 1) * (col("n_days") * 2 + 5)
          - col("tie_term")).as("var_num"))
      .select(col("event_type"), col("n_days"), col("s_stat"),
        col("var_num"),
        when(col("var_num") > 0,
          (when(col("s_stat") > 0, (col("s_stat") - 1).cast("double"))
            .when(col("s_stat") < 0, (col("s_stat") + 1).cast("double"))
            .otherwise(lit(0.0)))
            / sqrt(col("var_num").cast("double") / lit(18.0))).as("z"))
  }

  val q215TypeTrendsSql: String = """
    WITH obs AS (
      SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    bnd AS (SELECT min(day) AS d0, max(day) AS d1 FROM obs),
    cal AS (SELECT unnest(generate_series(bnd.d0, bnd.d1)) AS day FROM bnd),
    ty AS (SELECT DISTINCT event_type FROM obs),
    dense AS (
      SELECT ty.event_type, cal.day, coalesce(o.c, CAST(0 AS BIGINT)) AS c
      FROM ty CROSS JOIN cal
        LEFT JOIN obs o ON o.event_type = ty.event_type AND o.day = cal.day),
    s AS (
      SELECT a.event_type,
        CAST(sum(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1
          ELSE 0 END) AS BIGINT) AS s_stat
      FROM dense a JOIN dense b
        ON a.event_type = b.event_type AND b.day > a.day
      GROUP BY 1),
    tg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS t
           FROM dense GROUP BY event_type, c),
    tt AS (SELECT event_type,
             CAST(sum(t * (t - 1) * (t * 2 + 5)) AS BIGINT) AS tie_term
           FROM tg GROUP BY 1),
    n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
          FROM dense GROUP BY 1),
    v AS (
      SELECT n.event_type, n.n_days,
        coalesce(s.s_stat, CAST(0 AS BIGINT)) AS s_stat,
        n.n_days * (n.n_days - 1) * (n.n_days * 2 + 5) - tt.tie_term
          AS var_num
      FROM n JOIN tt USING (event_type) LEFT JOIN s USING (event_type))
    SELECT event_type, n_days, s_stat, var_num,
      CASE WHEN var_num > 0 THEN
        (CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
              WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
              ELSE 0e0 END)
          / sqrt(CAST(var_num AS DOUBLE) / 18e0) END AS z
    FROM v
  """

  /** q210: USER-LIFETIME PERCENTILES — rank-exact p50/p90/p99 of the
    * first-to-last-activity span in days, plus the single-day-user share.
    * The longevity summary between q102's full cohort matrix and q181's
    * churn labels: "how long does a user stay" as three numbers a
    * retention target is set against, with the one-session-and-gone share
    * (span 0) broken out because it dominates the span distribution's
    * head and would otherwise read as "p50 = 0" without explanation.
    *
    * Exactness: spans are exact integer days; percentiles are rank-exact
    * order-statistic picks (value at rank ⌈q·n⌉ under the (span, user_id)
    * total order — the q140 convention, no interpolation); the share is
    * one division.
    *
    * Scale shape: ONE (user) min/max rollup of the stream, an ungrouped
    * bucketed [[DistRank]] layout over the |users|-row frame (no
    * single-partition sort), conditional-max picks folded map-side into
    * one row. */
  def q210LifetimePercentiles(spark: SparkSession,
      sfDir: String): DataFrame =
    lifetimePercentilesOn(Tables(spark, sfDir, "events"))

  /** The lifetime core over ANY events frame — fixture-testable. */
  private[graft] def lifetimePercentilesOn(events: DataFrame): DataFrame = {
    val spans = graft.CachedFrames.track(
      events.filter(col("user_id").isNotNull)
        .select(col("user_id"),
          expr("CAST(floor(unix_timestamp(ts) / 86400.0D) AS BIGINT)")
            .as("day"))
        .groupBy(col("user_id"))
        .agg((max(col("day")) - min(col("day"))).as("span")))
    val n = spans.agg(count(lit(1)).as("n_users"))
    val picks = graft.ops.TextOps.LengthPercentiles.map { case (name, a, b) =>
      max(when(col("_r") ===
        expr(s"($a * n_users + ${b - 1}) DIV $b"), col("span")))
        .as(s"${name}_days")
    }
    val aggs = picks :+
      sum(when(col("span") === 0, 1L).otherwise(0L)).as("n_single_day")
    DistRank.withBucketedRank(spans, Seq(), "span", Seq("user_id"), "_r")
      .crossJoin(broadcast(n))
      .groupBy(col("n_users"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("n_users"), col("p50_days"), col("p90_days"),
        col("p99_days"), col("n_single_day"),
        (col("n_single_day").cast("double") / col("n_users").cast("double"))
          .as("single_day_share"))
  }

  val q210LifetimePercentilesSql: String = {
    val cases = graft.ops.TextOps.LengthPercentiles.map { case (name, a, b) =>
      s"max(CASE WHEN rk = ($a * n_users + ${b - 1}) // $b THEN span END) AS ${name}_days"
    }.mkString(",\n      ")
    s"""
    WITH s AS (
      SELECT user_id,
        max(CAST(floor(epoch(ts)) AS BIGINT) // 86400)
          - min(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS span
      FROM events WHERE user_id IS NOT NULL GROUP BY 1),
    r AS (
      SELECT span,
        row_number() OVER (ORDER BY span ASC, user_id ASC) AS rk,
        count(*) OVER () AS n_users
      FROM s)
    SELECT CAST(n_users AS BIGINT) AS n_users,
      $cases,
      CAST(sum(CASE WHEN span = 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_single_day,
      CAST(sum(CASE WHEN span = 0 THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(n_users AS DOUBLE) AS single_day_share
    FROM r GROUP BY n_users
  """
  }

  /** q209: DAY-OF-WEEK × HOUR TRAFFIC GRID — the 7×24 contingency of
    * event arrivals through the q197 grid core: observed, expected under
    * dow⊥hour independence, Pearson residual and lift per cell, empty
    * cells included. The expectation is the marginal product, so lift
    * measures the INTERACTION — "is the hourly shape different on
    * weekends" — which a raw heatmap conflates with the marginals
    * themselves. The capacity-planning and anomaly-baseline artifact the
    * q126/q148/q151 monitors should be parameterized from. Keys are pure
    * integer arithmetic (day = ⌊epoch/86400⌋, dow = (day+4) mod 7 with
    * 0 = Sunday, hour = ⌊(epoch mod 86400)/3600⌋ — epoch day 0 was a
    * Thursday), identical in both engines.
    *
    * Scale shape: ONE map-side (dow, hour) rollup of the stream, then
    * [[Curation.contingencyGridOn]]'s label-space-bounded grid (≤168
    * cells). */
  def q209TrafficGrid(spark: SparkSession, sfDir: String): DataFrame =
    trafficGridOn(Tables(spark, sfDir, "events"))

  /** The grid wiring over ANY events frame — fixture-testable. */
  private[graft] def trafficGridOn(events: DataFrame): DataFrame =
    Curation.contingencyGridOn(events
      .select(
        expr("pmod(CAST(floor(unix_timestamp(ts) / 86400.0D) AS BIGINT)" +
          " + 4, 7)").as("dow"),
        expr("CAST(pmod(unix_timestamp(ts), 86400) DIV 3600 AS BIGINT)")
          .as("hour")),
      "dow", "hour")

  val q209TrafficGridSql: String = """
    WITH e AS (
      SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7 AS dow,
        (CAST(floor(epoch(ts)) AS BIGINT) % 86400) // 3600 AS hour
      FROM events),
    cells AS (
      SELECT dow, hour, CAST(count(*) AS BIGINT) AS o
      FROM e GROUP BY 1, 2),
    r AS (SELECT dow, CAST(sum(o) AS BIGINT) AS rl FROM cells GROUP BY 1),
    c AS (SELECT hour, CAST(sum(o) AS BIGINT) AS cs FROM cells GROUP BY 1),
    n AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM cells)
    SELECT r.dow, c.hour,
      coalesce(cells.o, CAST(0 AS BIGINT)) AS n_obs,
      CAST(CAST(CAST(r.rl AS HUGEINT) * c.cs AS VARCHAR) AS DOUBLE)
        / CAST(n.nn AS DOUBLE) AS expected,
      CAST(CAST(CAST(coalesce(cells.o, CAST(0 AS BIGINT)) AS HUGEINT) * n.nn
          - CAST(r.rl AS HUGEINT) * c.cs AS VARCHAR) AS DOUBLE)
        / sqrt(CAST(CAST(CAST(n.nn AS HUGEINT) * r.rl * c.cs AS VARCHAR)
          AS DOUBLE)) AS residual,
      CAST(CAST(CAST(coalesce(cells.o, CAST(0 AS BIGINT)) AS HUGEINT) * n.nn
          AS VARCHAR) AS DOUBLE)
        / CAST(CAST(CAST(r.rl AS HUGEINT) * c.cs AS VARCHAR) AS DOUBLE)
        AS lift
    FROM r CROSS JOIN c CROSS JOIN n
      LEFT JOIN cells ON cells.dow = r.dow AND cells.hour = c.hour
  """

  /** The CALENDAR-DENSE daily event-count series shared by the trend
    * family (q198 ACF, q199 Mann–Kendall, q200 Theil–Sen): one map-side
    * (day) rollup of the raw stream, then a zero-fill over the full
    * [min, max] calendar — a quiet day is a 0 observation, not a missing
    * one, or every lag/trend statistic silently conflates "no traffic"
    * with "no data". The calendar explode rides the 1-row bounds frame;
    * the zero-fill join is |days|-sized (calendar-bounded — decades are
    * ~1e4 rows — never data-sized). */
  private[graft] def denseDaily(events: DataFrame): DataFrame =
    denseSeries(events
      .select(expr("CAST(floor(unix_timestamp(ts) / 86400.0D) AS BIGINT)")
        .as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("c")))

  /** Zero-fill ANY integer-keyed (day, c) observation frame over its full
    * [min, max] key range — the series-generic seam the trend family
    * shares (daily event counts for q198–q200, calendar months of revenue
    * for q214: a key with no observations is a 0, not a gap). */
  private[graft] def denseSeries(obs: DataFrame): DataFrame =
    obs.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(obs, Seq("day"), "left")
      .select(col("day"), coalesce(col("c"), lit(0L)).as("c"))

  /** The dense-daily CTE chain shared by the q198/q199/q200 oracles —
    * same floor-epoch day key as q108/q151, zero-filled over
    * generate_series(min, max) (inclusive both ends, as Spark's
    * `sequence`). */
  /** The zero-fill chain over an `obs(day, c)` CTE — [[denseSeries]]'s
    * oracle face, shared by the daily and monthly trend oracles. */
  private[graft] val DenseFromObsCte: String = """
    bnd AS (SELECT min(day) AS d0, max(day) AS d1 FROM obs),
    cal AS (SELECT unnest(generate_series(bnd.d0, bnd.d1)) AS day FROM bnd),
    dense AS (
      SELECT cal.day, coalesce(o.c, CAST(0 AS BIGINT)) AS c
      FROM cal LEFT JOIN obs o ON o.day = cal.day)"""

  private[graft] val DailyDenseCte: String = s"""
    obs AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1),
    $DenseFromObsCte"""

  /** q198 horizon: lags 1..7 — the daily series' weekly seasonality. */
  private[graft] val AcfMaxLag = 7

  /** q198: AUTOCORRELATION of the daily event-count series at lags 1–7 —
    * the load-pattern fingerprint the anomaly family reads raw (q126
    * z-scores, q148 EWMA, q151 CUSUM all assume independent days; ACF
    * measures how wrong that is). acf(7) ≈ acf(1)'s peak says weekly
    * seasonality; a slow decay says traffic is trending (difference it
    * before alerting). Quiet days count as 0 via [[denseDaily]].
    *
    * Exactness: with S = Σc and n days, acf(k) multiplied through by n²
    * is Σ(n·c_t − S)(n·c_{t+k} − S) / Σ(n·c_t − S)² — both sums exact in
    * DECIMAL(38,0)/HUGEINT (deviations ≤ n·max_c ≈ 1e17 at 1e13
    * events/day over 30 years; squares 1e34, summed over 1e4 days ≈ 1e38
    * — at the ladder's ceiling, documented), one final division.
    * Constant series → NULL (0/0 guarded in both engines).
    *
    * Scale shape: ONE map-side day rollup of the stream; everything after
    * is calendar-bounded. The lag pairing is a 7-way explode + equi-join
    * on day+lag (no range/theta join), the denominator a 1-row broadcast. */
  def q198Acf(spark: SparkSession, sfDir: String): DataFrame =
    acfOn(Tables(spark, sfDir, "events"))

  /** The ACF core over ANY (day, c) integer series — fixture-testable. */
  private[graft] def acfOn(events: DataFrame): DataFrame = {
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val dense = graft.CachedFrames.track(denseDaily(events))
    val stats = dense.agg(count(lit(1)).as("n"), sum(col("c")).as("tot"))
    val dev = graft.CachedFrames.track(dense.crossJoin(broadcast(stats))
      .select(col("day"),
        (d38(col("n")) * d38(col("c")) - d38(col("tot"))).as("dev")))
    val den = dev.agg(sum(col("dev") * col("dev")).as("dd"))
    dev.select(col("day"), col("dev"),
        explode(sequence(lit(1L), lit(AcfMaxLag.toLong))).as("lag"))
      .withColumn("day2", col("day") + col("lag"))
      .join(dev.select(col("day").as("day2"), col("dev").as("dev2")),
        Seq("day2"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("dev") * col("dev2")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        when(col("dd") =!= 0,
          col("num").cast("double") / col("dd").cast("double")).as("acf"))
  }

  val q198AcfSql: String = s"""
    WITH $DailyDenseCte,
    s AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS tot
          FROM dense),
    dev AS (SELECT dense.day, CAST(s.n AS HUGEINT) * dense.c - s.tot AS dev
            FROM dense, s),
    den AS (SELECT sum(dev * dev) AS dd FROM dev), -- guard:ok internal HUGEINT energy; acf below is exact-cast
    p AS (SELECT b.day - a.day AS lag, a.dev AS da, b.dev AS db
          FROM dev a JOIN dev b ON b.day - a.day BETWEEN 1 AND $AcfMaxLag)
    SELECT p.lag, CAST(count(*) AS BIGINT) AS n_pairs,
      CASE WHEN den.dd <> 0 THEN
        CAST(CAST(sum(p.da * p.db) AS VARCHAR) AS DOUBLE) / CAST(CAST(den.dd AS VARCHAR) AS DOUBLE) END AS acf
    FROM p, den GROUP BY 1, den.dd
  """

  /** q199: MANN–KENDALL TREND TEST on the daily event-count series — is
    * traffic monotonically drifting, without assuming linearity or any
    * distribution? S counts up-pairs minus down-pairs over all day pairs;
    * the tie-corrected variance n(n−1)(2n+5)/18 − Σt(t−1)(2t+5)/18 gives
    * the normal z (continuity-corrected toward 0). |z| > 1.96 is the alarm
    * the q151 CUSUM localizes and the q200 slope then SIZES. Quiet days
    * count as 0 via [[denseDaily]].
    *
    * Exactness: S and the variance numerator are exact BIGINTs (n ≤ 1e4
    * calendar days → n³ ≈ 1e12, far inside BIGINT); z divides by
    * sqrt(var_num/18) in the same fixed op order both engines, sqrt being
    * IEEE-correctly-rounded (portable, unlike ln/exp).
    *
    * Scale shape: the stream is touched ONCE (the day rollup); the pair
    * walk is a declared calendar-bounded self-cross of the |days|-row
    * dense frame (~5·10⁷ pairs at 30 years — trivially distributed,
    * NEVER data-sized; the q29 bounded-batch contract applied to time). */
  def q199MannKendall(spark: SparkSession, sfDir: String): DataFrame =
    mannKendallOn(Tables(spark, sfDir, "events"))

  /** The MK core over ANY (day, c) integer series — fixture-testable. */
  private[graft] def mannKendallOn(events: DataFrame): DataFrame =
    mannKendallOfSeries(graft.CachedFrames.track(denseDaily(events)))

  /** MK over an ALREADY-DENSE series frame (the q214 reuse seam). */
  private[graft] def mannKendallOfSeries(dense: DataFrame): DataFrame = {
    val s = dense.as("a").crossJoin(dense.as("b"))
      .filter(col("b.day") > col("a.day"))
      .agg(coalesce(sum(when(col("b.c") > col("a.c"), 1L)
        .when(col("b.c") < col("a.c"), -1L).otherwise(0L)), lit(0L))
        .as("s_stat"))
    val ties = dense.groupBy(col("c")).agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)),
        lit(0L)).as("tie_term"))
    dense.agg(count(lit(1)).as("n_days"))
      .crossJoin(broadcast(ties)).crossJoin(broadcast(s))
      .select(col("n_days"), col("s_stat"),
        (col("n_days") * (col("n_days") - 1) * (col("n_days") * 2 + 5)
          - col("tie_term")).as("var_num"))
      .select(col("n_days"), col("s_stat"), col("var_num"),
        when(col("var_num") > 0,
          (when(col("s_stat") > 0, (col("s_stat") - 1).cast("double"))
            .when(col("s_stat") < 0, (col("s_stat") + 1).cast("double"))
            .otherwise(lit(0.0)))
            / sqrt(col("var_num").cast("double") / lit(18.0))).as("z"))
  }

  val q199MannKendallSql: String = s"""
    WITH $DailyDenseCte,
    s AS (SELECT coalesce(CAST(sum(CASE WHEN b.c > a.c THEN 1
            WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT),
            CAST(0 AS BIGINT)) AS s_stat
          FROM dense a JOIN dense b ON b.day > a.day),
    tg AS (SELECT CAST(count(*) AS BIGINT) AS t FROM dense GROUP BY c),
    tt AS (SELECT coalesce(CAST(sum(t * (t - 1) * (t * 2 + 5)) AS BIGINT),
             CAST(0 AS BIGINT)) AS tie_term FROM tg),
    v AS (SELECT n.n_days, s.s_stat,
            n.n_days * (n.n_days - 1) * (n.n_days * 2 + 5) - tt.tie_term
              AS var_num
          FROM (SELECT CAST(count(*) AS BIGINT) AS n_days FROM dense) n,
            s, tt)
    SELECT n_days, s_stat, var_num,
      CASE WHEN var_num > 0 THEN
        (CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
              WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
              ELSE 0e0 END)
          / sqrt(CAST(var_num AS DOUBLE) / 18e0) END AS z
    FROM v
  """

  /** q200: THEIL–SEN ROBUST SLOPE of the daily event-count series — the
    * trend's SIZE in events/day, as the exact median of all pairwise
    * slopes. Immune to the flash-crowd outlier days that drag an OLS fit
    * (breakdown point 29%); the estimator a capacity forecast should use
    * once q199 says the trend is real. Quiet days count as 0 via
    * [[denseDaily]].
    *
    * Exactness: each pairwise slope is ONE correctly-rounded division of
    * exact BIGINTs (bitwise-portable per IEEE); the median is a RANK-EXACT
    * pick — the two middle order statistics via [[DistRank]] (never an
    * approximate percentile), averaged in the same fixed (a+b)/2 order
    * both engines ((v+v)/2 ≡ v exactly, so odd counts are unharmed).
    *
    * Scale shape: same as q199 — one stream rollup, then a declared
    * calendar-bounded pair cross of the |days|-row frame; the rank layout
    * is [[DistRank]]'s bucketed engine (no SinglePartition sort). */
  def q200TheilSen(spark: SparkSession, sfDir: String): DataFrame =
    theilSenOn(Tables(spark, sfDir, "events"))

  /** The slope core over ANY (day, c) integer series — fixture-testable. */
  private[graft] def theilSenOn(events: DataFrame): DataFrame =
    theilSenOfSeries(graft.CachedFrames.track(denseDaily(events)),
      "slope_per_day")

  /** Theil–Sen over an ALREADY-DENSE series frame; the slope column name
    * carries the step unit (per-day for q200, cents-per-month for q214). */
  private[graft] def theilSenOfSeries(dense: DataFrame,
      slopeName: String): DataFrame = {
    val slopes = dense.as("a").crossJoin(dense.as("b"))
      .filter(col("b.day") > col("a.day"))
      .select(((col("b.c") - col("a.c")).cast("double")
        / (col("b.day") - col("a.day")).cast("double")).as("slope"),
        col("a.day").as("da"), col("b.day").as("db"))
    val ranked = graft.CachedFrames.track(
      DistRank.withBucketedRank(slopes, Seq(), "slope", Seq("da", "db"),
        "_r"))
    ranked.crossJoin(broadcast(ranked.agg(count(lit(1)).as("m"))))
      .agg(max(col("m")).as("n_pairs"),
        ((max(when(col("_r") === expr("(m + 1) DIV 2"), col("slope")))
          + max(when(col("_r") === expr("m DIV 2 + 1"), col("slope"))))
          / lit(2.0)).as(slopeName))
  }

  val q200TheilSenSql: String = s"""
    WITH $DailyDenseCte,
    p AS (SELECT CAST(b.c - a.c AS DOUBLE) / CAST(b.day - a.day AS DOUBLE)
            AS slope, a.day AS da, b.day AS db
          FROM dense a JOIN dense b ON b.day > a.day),
    r AS (SELECT slope, row_number() OVER (ORDER BY slope, da, db) AS rnk,
            CAST(count(*) OVER () AS BIGINT) AS m FROM p)
    SELECT CAST(max(m) AS BIGINT) AS n_pairs,
      (max(CASE WHEN rnk = (m + 1) // 2 THEN slope END)
        + max(CASE WHEN rnk = m // 2 + 1 THEN slope END)) / 2e0
        AS slope_per_day
    FROM r
  """

  /** q222: DAY-OF-WEEK EFFECT — one-way ANOVA of the dense daily event
    * count grouped by day-of-week: how much of the daily-volume variance
    * the weekly cycle EXPLAINS (η² = SSB/SST) and whether it is
    * significant (the F statistic, F_{k−1, n−k} under the null). The
    * quantified version of what q198's acf(7) hints and what q209's grid
    * shows cell-by-cell — and the go/no-go for seasonal adjustment before
    * the anomaly family (q126/q148/q151): η² near 0 says the weekly
    * baseline is flat and plain z-scores are fine; η² large says alarms
    * must be conditioned on dow or Monday forever pages. Runs on the
    * zero-filled calendar ([[denseDaily]]) — a quiet Sunday is DATA for
    * the dow effect, not a gap.
    *
    * Exactness: per-group sums and the scaled total SS (n·Σc² − S²) are
    * exact DECIMAL(38,0)/HUGEINT; each group's scaled between-SS term
    * (n·S_g − n_g·S)²/n_g is a fixed chain on exact-cast doubles, and the
    * cross-group sum folds in GROUP-KEY ORDER in both engines (the q219
    * ordered-fold idiom — re-ordered double accumulation is the one
    * non-portable step). η² = Σterm / (n·(n·Σc² − S²)) — the scaling
    * cancels exactly. A constant series (SST = 0) reports NULL η²/F; a
    * perfect weekly cycle (SSW = 0) reports η² = 1 and NULL F, never ±Inf.
    *
    * Scale shape: ONE map-side day rollup (the shared dense artifact),
    * then a ≤period-row group rollup and a 1-row total; the fold runs
    * over ≤period rows. Never a join against data. */
  def q222DowEffect(spark: SparkSession, sfDir: String): DataFrame =
    seasonalAnovaOn(denseDaily(Tables(spark, sfDir, "events")), 7)

  /** The one-way-ANOVA core over ANY dense (day, c) series, grouped by
    * `day % period` — series-generic (q225 reuses it on calendar months
    * of revenue cents). */
  private[graft] def seasonalAnovaOn(dense: DataFrame,
      period: Int): DataFrame =
    anovaOfGroups(dense.select((col("day") % period).as("g"), col("c")))

  /** The same core over ANY pre-grouped (g, c) observation frame —
    * group-generic (q237's stratification DEFF runs it with g = source,
    * c = quantized quality). */
  private[graft] def anovaOfGroups(obs: DataFrame): DataFrame = {
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val g = graft.CachedFrames.track(obs)
    val per = g.groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(col("c")).as("sg"))
    val tot = g.agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
      sum(d38(col("c")) * d38(col("c"))).as("c2"))
    val x = (d38(col("n")) * d38(col("sg"))
      - d38(col("ng")) * d38(col("s"))).cast("double")
    val folded = per.crossJoin(broadcast(tot))
      .select(col("g"), (x * x / col("ng").cast("double")).as("term"))
      .agg(count(lit(1)).as("k"), expr(
        """aggregate(transform(sort_array(collect_list(struct(g, term))),
          |  x -> x.term), 0.0D, (a, x) -> a + x)""".stripMargin).as("ssb"))
    val sstn = d38(col("n")) * col("c2") - d38(col("s")) * d38(col("s"))
    val nsst = (d38(col("n")) * sstn).cast("double")
    folded.crossJoin(broadcast(tot))
      .select(col("n").as("n_obs"), col("k").as("n_groups"),
        when(sstn > 0, col("ssb") / nsst).as("eta2"),
        when(sstn > 0 && col("k") > 1 && col("n") > col("k")
          && (nsst - col("ssb")) > 0,
          (col("ssb") / (col("k") - 1).cast("double"))
            / ((nsst - col("ssb"))
              / (col("n") - col("k")).cast("double"))).as("f_stat"))
  }

  /** The ANOVA oracle chain over a `dense(day, c)` CTE — [[seasonalAnovaOn]]'s
    * oracle face, parameterized by the period (q222 dow = 7, q225
    * month-of-year = 12). */
  private[graft] def seasonalAnovaSqlFromDense(period: Int): String = s"""
    g AS (SELECT day % $period AS g, c FROM dense),
    $AnovaSqlFromG"""

  /** The chain over a pre-built `g(g, c)` CTE — [[anovaOfGroups]]'s
    * oracle face. */
  private[graft] val AnovaSqlFromG: String = s"""
    per AS (SELECT g, CAST(count(*) AS BIGINT) AS ng,
              CAST(sum(c) AS BIGINT) AS sg FROM g GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s,
              sum(CAST(c AS HUGEINT) * c) AS c2 -- guard:ok internal HUGEINT; outputs below are exact-cast
            FROM g),
    tx AS (SELECT per.g, per.ng,
             CAST(CAST(CAST(tot.n AS HUGEINT) * per.sg
               - CAST(per.ng AS HUGEINT) * tot.s AS VARCHAR) AS DOUBLE) AS x
           FROM per, tot),
    fd AS (SELECT CAST(count(*) AS BIGINT) AS k,
             list_reduce(list_prepend(0e0,
               list(x * x / CAST(ng AS DOUBLE) ORDER BY g)),
               (a, b) -> a + b) AS ssb
           FROM tx),
    vv AS (SELECT tot.n,
             CAST(tot.n AS HUGEINT) * tot.c2
               - CAST(tot.s AS HUGEINT) * tot.s AS sstn -- guard:ok internal HUGEINT; outputs below are exact-cast
           FROM tot)
    SELECT vv.n AS n_obs, fd.k AS n_groups,
      CASE WHEN vv.sstn > 0 THEN fd.ssb
        / CAST(CAST(CAST(vv.n AS HUGEINT) * vv.sstn AS VARCHAR) AS DOUBLE)
        END AS eta2,
      CASE WHEN vv.sstn > 0 AND fd.k > 1 AND vv.n > fd.k
          AND (CAST(CAST(CAST(vv.n AS HUGEINT) * vv.sstn AS VARCHAR)
            AS DOUBLE) - fd.ssb) > 0 THEN
        (fd.ssb / CAST(fd.k - 1 AS DOUBLE))
          / ((CAST(CAST(CAST(vv.n AS HUGEINT) * vv.sstn AS VARCHAR)
            AS DOUBLE) - fd.ssb) / CAST(vv.n - fd.k AS DOUBLE)) END
        AS f_stat
    FROM fd, vv"""

  val q222DowEffectSql: String = s"""
    WITH $DailyDenseCte,
    ${seasonalAnovaSqlFromDense(7)}
  """

  /** q237: STRATIFICATION DESIGN EFFECT — the variance payoff of
    * source-stratified PROPORTIONAL sampling for estimating mean document
    * quality: DEFF = Var_prop/Var_srs = SSW/SST = 1 − η² of quality
    * across sources (exactly the [[anovaOfGroups]] identity, with groups
    * = sources instead of calendar cells). DEFF 0.8 means a stratified
    * sample needs 20% fewer documents for the same precision — the
    * BEFORE-number for q52's stratified sampler and the proportional
    * baseline q180's Neyman allocator improves on; η² ≈ 0 says
    * stratifying by source buys nothing for this metric. Lives in Events
    * next to its core; the quality projection is [[TextOps]]'s (the
    * init-time reference direction Events→TextOps already exists — the
    * reverse would re-open the Ols deadlock class).
    *
    * Exactness: quality enters quantized at 1e-9 (the q227 convention —
    * both engines quantize the bitwise-portable score identically); then
    * the ANOVA core's contract — exact DECIMAL(38,0)/HUGEINT sums, the
    * ≤|sources|-term between-SS fold in group-key order, single final
    * divisions. A constant-quality corpus reports NULL η²/F/DEFF.
    *
    * Scale shape: ONE scored-corpus pass into a ≤|sources|-row rollup
    * + a 1-row total; the fold runs over ≤|sources| rows. */
  /** q247 tuning: the outlier threshold 3·1.4826 (three robust sigmas;
    * 1.4826 is the Gaussian MAD consistency constant) as the EXACT
    * integer cross-multiplication 44478/10⁴ — the whole query then
    * contains no floating point at all. */
  private[ops] val MadThresholdNum = 44478L
  private[ops] val MadThresholdDen = 10000L

  /** q247: ROBUST OUTLIER DAYS — flag calendar days whose event count
    * deviates from the series median by more than 3 robust sigmas
    * (MAD · 1.4826), the data-quality screen that survives exactly the
    * outliers it hunts (a mean/stddev z-score — q126's per-user form —
    * is dragged by the outage day it is trying to flag; the median and
    * MAD are not). Quiet days count as 0 via the dense calendar, so a
    * total outage IS a candidate row, not a gap.
    *
    * Exactness: TOTAL — counts, the rank-exact median pick, per-day
    * |c − med|, the MAD pick and the 44478·mad vs 10⁴·dev comparison are
    * all exact integers; the query emits no floating point. A degenerate
    * series (over half the days tied at the median) has MAD 0 and every
    * deviating day flags — the standard MAD edge, reported not patched.
    *
    * Scale shape: one day rollup (map-side), the zero-filled calendar,
    * and TWO ungrouped bucketed [[DistRank]] layouts (count order, then
    * deviation order — the q223 two-layout precedent); |days| rows out,
    * no global-ORDER window. */
  def q247MadOutlierDays(spark: SparkSession, sfDir: String): DataFrame =
    madOutlierDaysOn(Tables(spark, sfDir, "events"))

  /** The robust-outlier core over ANY events frame — fixture-testable. */
  private[graft] def madOutlierDaysOn(events: DataFrame): DataFrame = {
    val dense = graft.CachedFrames.track(denseDaily(events))
    val n = dense.agg(count(lit(1)).as("n"))
    def medianOf(df: DataFrame, valueCol: String, name: String): DataFrame =
      DistRank.withBucketedRank(df, Seq(), valueCol, Seq("day"), "_r")
        .crossJoin(broadcast(n))
        .agg(max(when(col("_r") === expr("(n + 1) DIV 2"), col(valueCol)))
          .as(name))
    val med = medianOf(dense, "c", "med")
    val dev = graft.CachedFrames.track(dense.crossJoin(broadcast(med))
      .select(col("day"), col("c"), col("med"),
        abs(col("c") - col("med")).as("deviation")))
    val mad = medianOf(dev.select(col("day"), col("deviation")),
      "deviation", "mad")
    dev.crossJoin(broadcast(mad))
      .select(col("day"), col("c").as("n_events"), col("med"), col("mad"),
        col("deviation"),
        (col("deviation") * MadThresholdDen >
          lit(MadThresholdNum) * col("mad")).as("is_outlier"))
  }

  val q247MadOutlierDaysSql: String = s"""
    WITH $DailyDenseCte,
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dense),
    r1 AS (SELECT day, c,
             row_number() OVER (ORDER BY c, day) AS rk FROM dense),
    med AS (SELECT CAST(max(CASE WHEN rk = (n + 1) // 2 THEN c END)
              AS BIGINT) AS med
            FROM r1, nn),
    dev AS (SELECT dense.day, dense.c, med.med,
              abs(dense.c - med.med) AS deviation
            FROM dense, med),
    r2 AS (SELECT day, deviation,
             row_number() OVER (ORDER BY deviation, day) AS rk FROM dev),
    mad AS (SELECT CAST(max(CASE WHEN rk = (n + 1) // 2 THEN deviation END)
              AS BIGINT) AS mad
            FROM r2, nn)
    SELECT dev.day, dev.c AS n_events, dev.med, mad.mad,
      CAST(dev.deviation AS BIGINT) AS deviation,
      dev.deviation * $MadThresholdDen > $MadThresholdNum * mad.mad
        AS is_outlier
    FROM dev, mad
  """

  /** q248: SESSION-SCOPED FUNNEL — the view → click → purchase conversion
    * counted WITHIN one 30-minute-gap session (q19's boundaries): a click
    * qualifies only at-or-after the session's first view, a purchase only
    * at-or-after that qualifying click, and nothing carries across a
    * session break. The complement of q206's wall-clock deadlines: q206
    * asks "did they convert within an hour", this asks "did they convert
    * without leaving" — the funnel a UX review reads, where a purchase in
    * the NEXT session is a return visit, not a conversion.
    *
    * Conventions (mirrored verbatim in the oracle): session = q19's
    * user-partitioned 30-min-gap numbering; anchor = the session's MIN
    * view epoch-second; qualifying click = min click eps ≥ anchor;
    * qualifying purchase = min purchase eps ≥ that click (`>=` — a
    * same-second follow counts). Counts exact; rates single divisions;
    * 1 row out.
    *
    * Scale shape: the sessionization windows are USER-partitioned (q19's
    * — never a global ORDER window); then one per-(session, type)
    * min-rollup and two session-keyed equi-joins (q206's chain at
    * session grain), collapsing to a 1-row conditional rollup. */
  def q248SessionFunnel(spark: SparkSession, sfDir: String): DataFrame =
    sessionFunnelOn(Tables(spark, sfDir, "events"))

  /** The session-funnel core over ANY events frame — fixture-testable. */
  private[graft] def sessionFunnelOn(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sess = graft.CachedFrames.track(events
      .withColumn("eps", unix_timestamp(col("ts")))
      .withColumn("gap", col("eps") - lag(col("eps"), 1).over(byUser))
      .withColumn("is_new", when(col("gap") > 1800, 1).otherwise(0))
      .withColumn("sess", sum(col("is_new"))
        .over(byUser.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .select(col("user_id"), col("sess"), col("event_type"), col("eps")))
    val views = sess.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("sess")).agg(min(col("eps")).as("fv"))
    val clicks = sess.filter(col("event_type") === "click")
      .join(views, Seq("user_id", "sess"))
      .filter(col("eps") >= col("fv"))
      .groupBy(col("user_id"), col("sess"), col("fv"))
      .agg(min(col("eps")).as("fc"))
    val purchases = sess.filter(col("event_type") === "purchase")
      .join(clicks.select(col("user_id"), col("sess"), col("fc")),
        Seq("user_id", "sess"))
      .filter(col("eps") >= col("fc"))
      .groupBy(col("user_id"), col("sess"))
      .agg(min(col("eps")).as("fp"))
    val nSess = sess.select(col("user_id"), col("sess")).distinct()
      .agg(count(lit(1)).as("n_sessions"))
    val nV = views.agg(count(lit(1)).as("n_with_view"))
    val nC = clicks.agg(count(lit(1)).as("n_view_click"))
    val nP = purchases.agg(count(lit(1)).as("n_full_funnel"))
    nSess.crossJoin(broadcast(nV)).crossJoin(broadcast(nC))
      .crossJoin(broadcast(nP))
      .select(col("n_sessions"), col("n_with_view"), col("n_view_click"),
        col("n_full_funnel"),
        when(col("n_with_view") > 0, col("n_view_click").cast("double")
          / col("n_with_view").cast("double")).as("click_rate"),
        when(col("n_view_click") > 0, col("n_full_funnel").cast("double")
          / col("n_view_click").cast("double")).as("purchase_rate"))
  }

  val q248SessionFunnelSql: String = """
    WITH e AS (
      SELECT user_id, event_id, ts, event_type,
        CAST(floor(epoch(ts)) AS BIGINT) AS eps
      FROM events),
    flagged AS (
      SELECT user_id, event_type, eps,
        CASE WHEN eps - lag(eps) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) > 1800
          THEN 1 ELSE 0 END AS is_new,
        ts, event_id
      FROM e),
    numbered AS (
      SELECT user_id, event_type, eps,
        CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS sess
      FROM flagged),
    v AS (SELECT user_id, sess, CAST(min(eps) AS BIGINT) AS fv
          FROM numbered WHERE event_type = 'view' GROUP BY 1, 2),
    c AS (SELECT n.user_id, n.sess, CAST(min(n.eps) AS BIGINT) AS fc
          FROM numbered n JOIN v
            ON n.user_id = v.user_id AND n.sess = v.sess
          WHERE n.event_type = 'click' AND n.eps >= v.fv
          GROUP BY 1, 2),
    p AS (SELECT n.user_id, n.sess
          FROM numbered n JOIN c
            ON n.user_id = c.user_id AND n.sess = c.sess
          WHERE n.event_type = 'purchase' AND n.eps >= c.fc
          GROUP BY 1, 2),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions
          FROM (SELECT DISTINCT user_id, sess FROM numbered)),
    nv AS (SELECT CAST(count(*) AS BIGINT) AS n_with_view FROM v),
    nc AS (SELECT CAST(count(*) AS BIGINT) AS n_view_click FROM c),
    np AS (SELECT CAST(count(*) AS BIGINT) AS n_full_funnel FROM p)
    SELECT t.n_sessions, nv.n_with_view, nc.n_view_click, np.n_full_funnel,
      CASE WHEN nv.n_with_view > 0 THEN
        CAST(nc.n_view_click AS DOUBLE) / CAST(nv.n_with_view AS DOUBLE)
      END AS click_rate,
      CASE WHEN nc.n_view_click > 0 THEN
        CAST(np.n_full_funnel AS DOUBLE) / CAST(nc.n_view_click AS DOUBLE)
      END AS purchase_rate
    FROM t, nv, nc, np
  """

  def q237SamplingDeff(spark: SparkSession, sfDir: String): DataFrame =
    anovaOfGroups(graft.ops.TextOps.qualityScored(spark, sfDir)
      .select(col("source").as("g"),
        expr("CAST(floor(quality_score * 1000000000.0D + 0.5D) AS BIGINT)")
          .as("c")))
      .select(col("n_obs").as("n_docs"), col("n_groups").as("n_sources"),
        col("eta2"), col("f_stat"),
        (lit(1.0) - col("eta2")).as("deff_prop"))

  val q237SamplingDeffSql: String = s"""
    SELECT n_obs AS n_docs, n_groups AS n_sources, eta2, f_stat,
      1e0 - eta2 AS deff_prop
    FROM (
      WITH g AS (
        SELECT source AS g,
          CAST(floor((${graft.ops.TextOps.qualityFromStatsSql})
            * 1000000000.0 + 0.5) AS BIGINT) AS c
        FROM (SELECT doc_id, source,
            ${graft.ops.TextOps.nCharsSql} AS n_chars_m,
            ${graft.ops.TextOps.nTokensSql} AS n_tokens,
            CAST(${graft.ops.TextOps.hitsSql("en")} AS DOUBLE) AS n_stop,
            ${graft.ops.TextOps.nPunctSql} AS n_punct
          FROM documents)),
      $AnovaSqlFromG
    ) t
  """

  /** q229: DOW-ADJUSTED DAILY ANOMALY TABLE — every calendar day scored
    * against ITS OWN day-of-week's distribution: observed count, the dow
    * mean, the population z within the dow group, and an outlier verdict
    * at |z| > 3. The operational face of q222's η²: q126/q148/q151 alarm
    * on the raw series where every Monday looks like a spike; this is the
    * seasonally-conditioned residual view they should read instead once
    * q222 says the cycle is real. The flag is computed as an EXACT
    * integer comparison — (c·n_g − S_g)² > 9·(n_g·ΣC² − S_g²) — so the
    * verdict never hinges on a float rounding; z itself is one division
    * and one IEEE sqrt on exact-cast numerators (portable). Population σ
    * (flagged day included — the standard masking caveat at these group
    * sizes); a constant dow group reports NULL z and false.
    *
    * Scale shape: the shared dense-daily rollup, a ≤7-row broadcast of
    * group stats joined back to the |days| calendar frame. Calendar-
    * bounded output, never data-sized. */
  def q229DowAnomalies(spark: SparkSession, sfDir: String): DataFrame =
    dowAnomaliesOn(denseDaily(Tables(spark, sfDir, "events")))

  /** The residual table over ANY dense (day, c) series — fixture-
    * testable. */
  private[graft] def dowAnomaliesOn(dense: DataFrame): DataFrame = {
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val g = graft.CachedFrames.track(
      dense.select(col("day"), (col("day") % 7).as("dow"), col("c")))
    val per = g.groupBy(col("dow")).agg(count(lit(1)).as("ng"),
      sum(col("c")).as("sg"),
      sum(d38(col("c")) * d38(col("c"))).as("qg"))
    val x = d38(col("c")) * d38(col("ng")) - d38(col("sg"))
    val varn = d38(col("ng")) * col("qg") - d38(col("sg")) * d38(col("sg"))
    g.join(broadcast(per), "dow")
      .select(col("day"), col("dow"), col("c"), col("ng").as("n_dow"),
        (col("sg").cast("double") / col("ng").cast("double")).as("mean_dow"),
        when(varn > 0, x.cast("double") / sqrt(varn.cast("double"))).as("z"),
        (x * x > lit(9).cast("decimal(38,0)") * varn).as("outlier"))
  }

  val q229DowAnomaliesSql: String = s"""
    WITH $DailyDenseCte,
    gd AS (SELECT day, day % 7 AS dow, c FROM dense),
    per AS (SELECT dow, CAST(count(*) AS BIGINT) AS ng,
              CAST(sum(c) AS BIGINT) AS sg,
              sum(CAST(c AS HUGEINT) * c) AS qg -- guard:ok internal HUGEINT; outputs below are exact-cast
            FROM gd GROUP BY 1)
    SELECT gd.day, gd.dow, gd.c, per.ng AS n_dow,
      CAST(per.sg AS DOUBLE) / CAST(per.ng AS DOUBLE) AS mean_dow,
      CASE WHEN CAST(per.ng AS HUGEINT) * per.qg
          - CAST(per.sg AS HUGEINT) * per.sg > 0 THEN
        CAST(CAST(CAST(gd.c AS HUGEINT) * per.ng - per.sg AS VARCHAR)
          AS DOUBLE)
        / sqrt(CAST(CAST(CAST(per.ng AS HUGEINT) * per.qg
            - CAST(per.sg AS HUGEINT) * per.sg AS VARCHAR) AS DOUBLE)) END
        AS z,
      (CAST(gd.c AS HUGEINT) * per.ng - per.sg)
          * (CAST(gd.c AS HUGEINT) * per.ng - per.sg)
        > 9 * (CAST(per.ng AS HUGEINT) * per.qg
          - CAST(per.sg AS HUGEINT) * per.sg) AS outlier
    FROM gd JOIN per USING (dow)
  """
}
