package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event record for the streaming surface (matches the batch `events`
  * table's core columns). */
final case class Event(ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** A completed inactivity-gap session. */
final case class Session(user_id: Long, start_s: Long, end_s: Long, n_events: Long)

/** Keyed sessionization state: the not-yet-watermark-sealed sessions of one
  * user, as (start, end, count) intervals. Events only ever ADD, so maximal
  * gap-≤-threshold intervals are a lossless, compact encoding — state is
  * bounded by the number of open sessions in the watermark horizon, not the
  * number of events. */
final case class SessionBuffer(sessions: Seq[Session])

/** A (source, doc_id) arrival for quota admission. */
final case class SourceDoc(source: String, doc_id: Long)

/** Per-document quota verdict. */
final case class QuotaVerdict(source: String, doc_id: Long, admitted: Boolean)

/** A (source, doc_id, n_tokens) arrival for token-budget admission. */
final case class WeightedDoc(source: String, doc_id: Long, n_tokens: Long)

/** A (user_id, ts) arrival for streaming cohort retention. */
final case class UserEvent(user_id: Long, ts: java.sql.Timestamp)

/** Keyed SCD state: one user's OPEN run (the current event-type interval). */
final case class RunState(run_id: Int, event_type: String,
    valid_from_s: Long, n_events: Long)

/** A CLOSED validity interval emitted by the streaming SCD builder. */
final case class ClosedRun(user_id: Long, run_id: Int, event_type: String,
    valid_from_s: Long, valid_to_s: Long, n_events: Long)

/** A (user_id, event) value arrival for the rolling-anomaly gate. `ts_us`
  * is event time in MICROSECONDS (the batch twin orders by the full `ts`,
  * so seconds-granularity eps would mis-order same-second events); `eps`
  * and `cents` are precomputed by the caller with the batch twin's exact
  * expressions so both faces quantize identically. */
final case class UserValue(user_id: Long, event_id: Long, ts_us: Long,
    eps: Long, cents: Long)

/** Keyed rolling-anomaly state: one user's most recent values
  * (oldest first, at most [[graft.ops.Events.AnomalyWin]] entries). */
final case class RollingBuffer(cents: Seq[Long])

/** A flagged event from the rolling-anomaly gate — the batch twin's row. */
final case class AnomalyFlag(user_id: Long, event_id: Long, eps: Long,
    cents: Long, n_win: Long, mean_w: Double)

/** One changelog row of the streaming retention matrix: add (+1) or
  * retract (−1) one user from a (cohort_wk, week_offset) cell. */
final case class RetentionDelta(cohort_wk: Long, week_offset: Long, delta: Int)

/** Keyed retention state: a user's cohort week and every distinct active
  * week seen — bounded by weeks-per-user (52/year), never event volume. */
final case class RetentionState(cohort_wk: Long, weeks: Seq[Long])

/** One stream arrival for the activity-trend monitor: the user and the
  * event's epoch-day key (the q138/q141 floor-division idiom). */
final case class UserDay(user_id: Long, day: Long)

/** Per-user first/open-day state for [[EventStreams.newReturningStream]]. */
final case class NewRetState(firstDay: Long, lastDay: Long)

/** One newly-opened (user, day) presence, tagged new-vs-returning. */
final case class DayPresence(day: Long, is_new: Boolean)

/** An order arrival (floor-epoch day key) for the cadence monitor. */
final case class OrderArrival(o_custkey: Long, o_orderkey: Long, od: Long)

/** Keyed cadence state: one customer's latest (day, orderkey) anchor. */
final case class LastOrder(day: Long, okey: Long)

/** One closed inter-order gap — batch q224's gap row. */
final case class OrderGap(o_custkey: Long, o_orderkey: Long, gap_days: Long)

/** Per-user OLS accumulator: five closed-day sums plus the OPEN day's
  * (key, count) — SEVEN Longs of state total, independent of history
  * length. */
final case class TrendState(nDays: Long, sx: Long, sy: Long, sxy: Long,
  sxx: Long, curDay: Long, curY: Long)

final case class TrendRow(user_id: Long, n_days: Long, n_events: Long,
  slope: Option[Double])

/** Per-user EWMA ring: the last ≤ EwmaTaps−1 CLOSED daily counts (oldest
  * first) plus the OPEN day's (key, count) and the lifetime active-day
  * total — ≤ EwmaTaps+2 Longs of state, independent of history length. */
final case class EwmaState(nDays: Long, ys: Seq[Long], curDay: Long,
  curY: Long)

final case class EwmaRow(user_id: Long, n_days: Long, last_day: Long,
  ewma_num: Long, ewma_den: Long, ewma: Double)

final case class UserTyped(user_id: Long, event_id: Long, eps: Long,
  event_type: String)

/** Per-user conversion anchor: the first view's epoch second (MinValue =
  * none yet) and whether the conversion already emitted — TWO fields of
  * state per user, forever. */
final case class ConvState(firstViewS: Long, emitted: Boolean)

final case class ConvLag(user_id: Long, lag_s: Long)

/** Churn-label event: (user, week, day, cents) — the projection q181's
  * rollup consumes, pre-split so the stream state stays integer-only. */
final case class ChurnEvent(user_id: Long, wk: Long, day: Long, cents: Long)

/** Per-user open week: the week id, its event count, its ≤7 distinct days,
  * its spend — BOUNDED state (one open week per user, forever). */
final case class ChurnState(wk: Long, nEvents: Long, days: Seq[Long],
  spend: Long)

final case class ChurnLabel(user_id: Long, wk: Long, n_events: Long,
  n_days: Long, spend_cents: Long, active_next_wk: Boolean)

/** Structured Streaming formulations of the event-time operators whose batch
  * twins live in graft.ops.Events (SURVEY.md §2.9): the SAME window
  * transforms run on a `readStream` source with a watermark, and
  * sessionization becomes explicit keyed state via flatMapGroupsWithState.
  *
  * Scale notes: state is partitioned by user_id across executors (the
  * standard keyed-state shard layout); the watermark bounds state size —
  * sessions idle past the gap are emitted and evicted on event-time timeout.
  */
object EventStreams {

  /** Tumbling 10-minute counts/sums per event_type with a watermark —
    * streaming twin of Events.q17WindowTumbling. Works identically on batch
    * frames (watermark is a no-op there). */
  def tumblingCounts(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact deduplication: drop records whose key was already seen
    * within the watermark horizon — the streaming counterpart of the batch
    * hash-groupBy dedup (state holds one entry per key and is evicted once
    * the watermark passes, so memory is bounded by the horizon, not the
    * stream length). */
  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String],
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming NEAR-duplicate suppression over a document stream
    * (ts, doc_id, text): fingerprint each document with the SAME codegen
    * SimHash the batch near-dup family uses (q28/q37, single-sourced in
    * [[graft.ops.NearDup.withSimhash]]) and drop any document whose
    * fingerprint was already seen within the watermark horizon.
    * Fingerprint equality is the high-precision end of near-dup matching
    * (identical bit-votes ⇒ near-identical token sets — tolerant of token
    * order and duplication, unlike the exact-text dedup above); banded
    * multi-table Hamming matching stays a batch concern. State is one
    * 8-byte key per unique fingerprint in the horizon — watermark-bounded
    * like every other state here. */
  def nearDedupStream(
      docs: DataFrame,
      watermark: String = "30 minutes"): DataFrame =
    graft.ops.NearDup.withSimhash(docs)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("simhash")

  /** Inactivity-gap sessionization with keyed event-time state — streaming
    * twin of Events.q19Sessionize.
    *
    * A session is only EMITTED once the watermark has sealed it (watermark >
    * session end + gap), so a late-but-within-watermark event can still
    * extend a session, or even BRIDGE two previously-separate sessions into
    * one — exactly the batch semantics over the admitted event set. Until
    * sealed, sessions live in [[SessionBuffer]] state as (start, end, count)
    * intervals; arrival order never matters because each invocation re-merges
    * the interval set (events only add, so intervals never split). The
    * event-time timeout (tail end + gap) guarantees idle users flush. */
  def sessionize(
      events: Dataset[Event],
      gapSec: Long = 1800L,
      watermark: String = "30 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._

    // merge intervals whose gap is within threshold; input in any order
    def merge(sessions: Seq[Session]): List[Session] =
      sessions.sortBy(s => (s.start_s, s.end_s)).foldLeft(List.empty[Session]) {
        case (Nil, s) => s :: Nil
        case (cur :: done, s) =>
          if (s.start_s - cur.end_s > gapSec) s :: cur :: done
          else cur.copy(end_s = math.max(cur.end_s, s.end_s),
            n_events = cur.n_events + s.n_events) :: done
      }.reverse

    def fn(userId: Long, batch: Iterator[Event],
           state: GroupState[SessionBuffer]): Iterator[Session] = {
      val incoming = batch.map { e =>
        val s = e.ts.getTime / 1000L
        Session(userId, s, s, 1L)
      }.toSeq
      val all = merge(state.getOption.map(_.sessions).getOrElse(Seq.empty) ++ incoming)
      val wmSec = state.getCurrentWatermarkMs() / 1000L
      // sealed ⟺ no admissible future event (ts ≥ watermark) can extend it.
      // Sessions work in whole seconds (the batch twin's epoch math), so an
      // event second eps == end + gap still merges — seal strictly after.
      // Session ends are increasing, so `closed` is a prefix of `all`.
      val (closed, open) = all.partition(s => s.end_s + gapSec < wmSec)
      if (open.isEmpty) state.remove()
      else {
        state.update(SessionBuffer(open))
        // arm at the FIRST ms where the second-floored seal above is true
        // ((end+gap+1) s, not (end+gap) s): a sub-second watermark advance
        // past end+gap would otherwise fire the timeout, seal nothing, and
        // re-arm — withholding the tail forever on an idle stream
        state.setTimeoutTimestamp(math.max(
          (open.last.end_s + gapSec + 1L) * 1000L,
          state.getCurrentWatermarkMs() + 1L))
      }
      closed.iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Watermarked stream-stream interval join — the remaining core
    * Structured Streaming primitive next to windows, dedup and keyed state:
    * attribute each `click` to every `view` by the same user within the
    * preceding `horizonSec`. Both sides carry watermarks and the join
    * condition bounds their event-time distance, which is exactly what
    * lets the engine evict buffered rows once the watermark passes — state
    * stays horizon-bounded on both sides no matter how long the streams
    * run. Works identically on batch frames (same function, watermarks
    * no-op), which is how the spec checks stream/batch agreement. */
  def attributionJoin(
      events: DataFrame,
      horizonSec: Long = 600L,
      watermark: String = "30 minutes"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"), col("value").as("view_value"))
      .withWatermark("view_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    clicks.join(views,
        col("user_id") === col("click_user") &&
          col("view_ts") <= col("click_ts") &&
          col("view_ts") >= col("click_ts") - expr(s"INTERVAL '$horizonSec' SECOND"))
      .select(col("user_id"),
        unix_timestamp(col("click_ts")).as("click_s"),
        unix_timestamp(col("view_ts")).as("view_s"),
        col("view_value"))
  }

  /** Streaming corpus admission — the stream-static twin of the batch
    * delta-vs-corpus check ([[graft.ops.Curation.q71IncrementalDedup]]),
    * with IDENTICAL verdict semantics (EventStreamsSpec pins row-set
    * equality against q71 on the sf tables): each arriving (ts, doc_id,
    * text) document probes the STATIC corpus index and emits `dup_exact`
    * (normalized digest present), `dup_near` (rotation-band SimHash
    * collision within the same Hamming bound as q71), or `new`, plus the
    * smallest matching corpus id.
    *
    * Statelessness is the design constraint: a streaming groupBy would
    * need a state store, so instead the static side is organized so every
    * stream row resolves its verdict ROW-LOCALLY — the digest index
    * collapses to one row per digest, and the band index to one row per
    * (table, bucket) cell carrying its (cid, simhash) entries as an array.
    * The stream side computes its per-table buckets as scalar columns
    * (same [[graft.ops.NearDup.rotBucket]] formula as the batch banding,
    * no explode), left-joins one broadcast cell frame per table, and takes
    * the min matching cid across tables with a codegen'd array filter —
    * no watermark, no state store, exactly-once per input row. In
    * production the index frames are the persisted corpus index
    * (q25/q28's outputs), not a re-derivation; cell arrays are bounded by
    * cell size = corpus / 2^prefixBits, the same quantity that bounds the
    * batch band join's work per key. */
  /** Streaming per-source quota admission — the ingestion rate-limiter:
    * admit the first `k` documents of each source, reject the rest. Keyed
    * state is ONE Long per source (the admitted count), so state size is
    * |sources| regardless of stream length — no watermark needed because
    * nothing is ever evicted or timed out.
    *
    * Twin of [[graft.ops.Curation.q94SourceQuota]], which resolves the same
    * policy in batch as a per-source cutoff (doc_id stands in for arrival
    * order). A group's micro-batch iterator carries no ordering guarantee,
    * so arrivals are admitted in doc_id order WITHIN each micro-batch
    * (sorted; micro-batch-sized buffer, not stream-sized) — feed batches
    * that are id-ordered across batch boundaries and the stream's verdicts
    * equal the batch twin's exactly (spec-pinned). When arrivals are OUT
    * OF ORDER across batches, row-level verdicts may differ from the
    * batch twin (the stream grants by arrival, the twin by id — grants
    * are never revoked), but the quota invariant survives: exactly k
    * admitted per source offering ≥ k documents, each verdict emitted
    * once (the relaxed contract, spec-pinned adversarially). */
  def sourceQuotaStream(docs: Dataset[SourceDoc],
      k: Int = graft.ops.Curation.SourceQuotaK): Dataset[QuotaVerdict] = {
    import docs.sparkSession.implicits._
    def fn(source: String, batch: Iterator[SourceDoc],
           state: GroupState[Long]): Iterator[QuotaVerdict] = {
      var n = state.getOption.getOrElse(0L)
      val out = batch.toSeq.sortBy(_.doc_id).map { d =>
        val admit = n < k
        if (admit) n += 1
        QuotaVerdict(source, d.doc_id, admit)
      }
      state.update(n)
      out.iterator
    }
    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Streaming TOKEN-budget admission — the stream twin of
    * [[graft.ops.Curation.q99TokenBudget]], with the same state economics
    * as [[sourceQuotaStream]]: ONE Long per source (the cumulative token
    * count of every document seen, admitted or not — the batch twin's
    * prefix sum is over ALL docs, so rejected docs still consume the
    * counter; that is exactly what makes one Long sufficient). A document
    * admits iff the pre-sum is still under the budget — the crossing
    * document admits in full, later documents never reclaim leftover
    * budget (a cutoff, not bin packing). Arrivals are n-tokens-weighted
    * but otherwise follow sourceQuotaStream's ordering contract: id-sorted
    * within each micro-batch, and verdicts equal the batch twin exactly
    * when batches arrive id-ordered across boundaries (spec-pinned). */
  def tokenBudgetStream(docs: Dataset[WeightedDoc],
      budget: Long = graft.ops.Curation.SourceTokenBudget): Dataset[QuotaVerdict] = {
    import docs.sparkSession.implicits._
    def fn(source: String, batch: Iterator[WeightedDoc],
           state: GroupState[Long]): Iterator[QuotaVerdict] = {
      var used = state.getOption.getOrElse(0L)
      val out = batch.toSeq.sortBy(_.doc_id).map { d =>
        val admit = used < budget
        used += d.n_tokens
        QuotaVerdict(source, d.doc_id, admit)
      }
      state.update(used)
      out.iterator
    }
    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Streaming ROLLING-ANOMALY gate — the stream twin of
    * [[graft.ops.Events.q126RollingAnomaly]]: per user, flag a value more
    * than 3 sigma from the mean of the previous
    * [[graft.ops.Events.AnomalyWin]] values (≥
    * [[graft.ops.Events.AnomalyMinPrior]] of history; the window excludes
    * the current row). State is ONE bounded ring buffer per user — at most
    * AnomalyWin Longs — so total state is users × window, never event
    * volume. The sigma test is the batch twin's cross-multiplied form in
    * exact arithmetic (BigInt here, DECIMAL there), so flags are
    * bitwise-portable at any amount magnitude.
    *
    * Ordering contract ([[sourceQuotaStream]]'s): rows sort by
    * (ts_us, event_id) within each micro-batch; when batches arrive
    * time-ordered across boundaries the flag set equals the batch twin
    * exactly (spec-pinned). Out-of-order arrival across batches degrades
    * gracefully — each event is judged against the window the monitor had
    * at arrival, the live-alerting semantics an anomaly sink wants. */
  def rollingAnomalyStream(events: Dataset[UserValue]): Dataset[AnomalyFlag] = {
    import events.sparkSession.implicits._
    val w = graft.ops.Events.AnomalyWin
    val minP = graft.ops.Events.AnomalyMinPrior
    val z2 = graft.ops.Events.AnomalyZ2
    def fn(user: Long, batch: Iterator[UserValue],
           state: GroupState[RollingBuffer]): Iterator[AnomalyFlag] = {
      var buf = state.getOption.map(_.cents.toVector).getOrElse(Vector.empty[Long])
      val out = Vector.newBuilder[AnomalyFlag]
      batch.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        val n = buf.size.toLong
        if (n >= minP) {
          // BigInt keeps the sigma test EXACT at any magnitude — the batch
          // twin computes it in DECIMAL for the same reason (a Long form
          // wraps once |cents| ≳ 5e7 in a window, corrupting flags)
          val s1 = buf.sum
          val s2 = buf.iterator.map(c => BigInt(c) * BigInt(c)).sum
          val dev = BigInt(n) * BigInt(e.cents) - BigInt(s1)
          if (dev * dev > BigInt(z2) * (BigInt(n) * s2 - BigInt(s1) * BigInt(s1)))
            out += AnomalyFlag(user, e.event_id, e.eps, e.cents, n,
              s1.toDouble / (100.0 * n))
        }
        buf = (buf :+ e.cents).takeRight(w)
      }
      state.update(RollingBuffer(buf))
      out.result().iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** LIVE ACTIVITY TREND — the streaming twin of batch q141: per user, the
    * running OLS slope of daily event counts, refreshed on every
    * micro-batch that touches the user (Update mode; the latest row per
    * user IS the batch answer over everything ingested so far —
    * spec-pinned against [[graft.ops.Events.q141ActivityTrend]]).
    *
    * State is SEVEN Longs per user ([[TrendState]]: five closed-day sums +
    * the open day's key and count) — constant in history length, the whole
    * point: the batch twin re-reads all events, the monitor never does.
    * Slope arithmetic is the batch twin's verbatim (exact Long sums, one
    * double division), so emitted slopes are bitwise-equal.
    *
    * Ordering contract ([[sourceQuotaStream]]'s): day keys arrive
    * non-decreasing per user (rows sort by day within each micro-batch);
    * a same-day tail arriving in a later batch folds into the still-open
    * day correctly. A day REOPENED after later days arrived would
    * double-count — the same in-order contract every twin here declares. */
  def activityTrendStream(events: Dataset[UserDay]): Dataset[TrendRow] = {
    import events.sparkSession.implicits._
    def fn(user: Long, batch: Iterator[UserDay],
           state: GroupState[TrendState]): TrendRow = {
      var s = state.getOption
        .getOrElse(TrendState(0L, 0L, 0L, 0L, 0L, Long.MinValue, 0L))
      batch.toSeq.sortBy(_.day).foreach { e =>
        if (e.day == s.curDay) s = s.copy(curY = s.curY + 1)
        else if (s.curY > 0L)
          s = TrendState(s.nDays + 1L, s.sx + s.curDay, s.sy + s.curY,
            s.sxy + s.curDay * s.curY, s.sxx + s.curDay * s.curDay,
            e.day, 1L)
        else s = s.copy(curDay = e.day, curY = 1L)
      }
      state.update(s)
      // snapshot: fold the OPEN day virtually (state keeps it open so a
      // same-day tail in the next batch still lands in it)
      val (k, sx, sy, sxy, sxx) =
        if (s.curY > 0L) (s.nDays + 1L, s.sx + s.curDay, s.sy + s.curY,
          s.sxy + s.curDay * s.curY, s.sxx + s.curDay * s.curDay)
        else (s.nDays, s.sx, s.sy, s.sxy, s.sxx)
      val den = k * sxx - sx * sx
      val slope = if (k > 1L && den != 0L)
        Some((k * sxy - sx * sy).toDouble / den.toDouble) else None
      TrendRow(user, k, sy, slope)
    }
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }

  /** Live EWMA engagement — q148's truncated α = 1/2 smoother kept current
    * over an event stream. State is the ring of the last ≤ EwmaTaps−1
    * CLOSED daily counts plus the open day ([[EwmaState]] — bounded Longs
    * per user, the q126 ring-buffer contract), so each snapshot replays the
    * exact power-of-two tap chain the batch window computes: after any
    * prefix of the time-ordered stream, rows equal q148 run over that
    * prefix (EventStreamsSpec pins it against real events split inside a
    * day). Same integer exactness — the only double is the final division. */
  def ewmaStream(events: Dataset[UserDay]): Dataset[EwmaRow] = {
    import events.sparkSession.implicits._
    val taps = graft.ops.Events.EwmaTaps
    def fn(user: Long, batch: Iterator[UserDay],
           state: GroupState[EwmaState]): EwmaRow = {
      var s = state.getOption.getOrElse(EwmaState(0L, Vector.empty, Long.MinValue, 0L))
      batch.toSeq.sortBy(_.day).foreach { e =>
        if (e.day == s.curDay) s = s.copy(curY = s.curY + 1L)
        else if (s.curY > 0L)
          s = EwmaState(s.nDays + 1L,
            (s.ys :+ s.curY).takeRight(taps - 1), e.day, 1L)
        else s = s.copy(curDay = e.day, curY = 1L)
      }
      state.update(s)
      // snapshot: fold the OPEN day virtually (it stays open in state so a
      // same-day tail in the next batch still lands in it)
      val seq = if (s.curY > 0L) s.ys :+ s.curY else s.ys
      val win = seq.takeRight(taps)
      val num = win.reverseIterator.zipWithIndex
        .map { case (y, j) => y * (1L << (taps - 1 - j)) }.sum
      val den = win.reverseIterator.zipWithIndex
        .map { case (_, j) => 1L << (taps - 1 - j) }.sum
      EwmaRow(user, s.nDays + (if (s.curY > 0L) 1L else 0L), s.curDay,
        num, den, num.toDouble / den.toDouble)
    }
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }

  /** Live conversion feed — one Append row per user the moment their first
    * qualifying purchase lands (first purchase at-or-after the first view:
    * exactly the rows q155's percentiles rank). State is [[ConvState]] —
    * two fields per user, forever — so the feed is the incremental face of
    * q155's per-user collapse; EventStreamsSpec pins row equality against
    * [[graft.ops.Events.conversionLags]] on real events split mid-stream. */
  def conversionLagStream(events: Dataset[UserTyped]): Dataset[ConvLag] = {
    import events.sparkSession.implicits._
    def fn(user: Long, batch: Iterator[UserTyped],
           state: GroupState[ConvState]): Iterator[ConvLag] = {
      var s = state.getOption.getOrElse(ConvState(Long.MinValue, false))
      val out = Vector.newBuilder[ConvLag]
      batch.toSeq.sortBy(e => (e.eps, e.event_id)).foreach { e =>
        if (e.event_type == "view" && s.firstViewS == Long.MinValue)
          s = s.copy(firstViewS = e.eps)
        else if (e.event_type == "purchase" && !s.emitted &&
            s.firstViewS != Long.MinValue) {
          out += ConvLag(user, e.eps - s.firstViewS)
          s = s.copy(emitted = true)
        }
      }
      state.update(s)
      out.result().iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Static-index admission: the corpus index is derived once and never
    * changes mid-run, so stream ids are assumed DISJOINT from corpus ids
    * (q71's batch-vs-corpus contract; the twin-equality spec runs on that
    * split). For an index that grows as batches are admitted — where a
    * replayed batch could meet its own rows — use
    * [[admissionIngestStream]], whose probe excludes self-matches. */
  def admissionStream(docs: DataFrame, corpus: DataFrame): DataFrame =
    withTextAdmission(docs, corpus).select(col("ts"), col("doc_id"),
      col("text_verdict").as("verdict"), col("text_match").as("match_id"))

  /** The text-probe CORE of [[admissionStream]]: append (text_verdict,
    * text_match) to the stream frame keeping every input column, so the
    * joint gate can chain the semantic probe on the same pass. */
  private def withTextAdmission(docs: DataFrame, corpus: DataFrame): DataFrame = {
    import graft.ops.NearDup
    val cfg = NearDup.DefaultSimHash
    val maxH = graft.ops.Curation.IncrementalMaxHamming
    val byDigest = corpus
      .select(md5(lower(trim(col("text")))).as("ck"), col("doc_id").as("cid"))
      .groupBy(col("ck")).agg(min(col("cid")).as("exact_match"))
    val cBands = NearDup.simhashBandsOn(NearDup.withSimhash(corpus))
      .select(col("t"), col("bucket"), col("doc_id").as("cid"),
        col("simhash").as("csim"))
    val cells = (0 until cfg.tables).map { r =>
      cBands.filter(col("t") === r)
        .groupBy(col("bucket"))
        .agg(collect_list(struct(col("cid"), col("csim"))).as(s"entries_$r"))
        .withColumnRenamed("bucket", s"bucket_$r")
    }
    val probed = (0 until cfg.tables).foldLeft(
      NearDup.withSimhash(docs).withColumn("ck", md5(lower(trim(col("text")))))) {
      (s, r) =>
        s.withColumn(s"bucket_$r", NearDup.rotBucket(col("simhash"), r, cfg))
          .join(broadcast(cells(r)), Seq(s"bucket_$r"), "left")
    }.join(broadcast(byDigest), Seq("ck"), "left")
    // per-table min matching cid; a missed join leaves entries_r null and
    // filter/transform/array_min propagate it, which least() then skips
    val nearMatch = (0 until cfg.tables).map { r =>
      expr(s"""array_min(transform(
        filter(entries_$r, e -> bit_count(simhash ^ e.csim) <= $maxH),
        e -> e.cid))""")
    }.reduceLeft(least(_, _))
    val helperCols = Seq("ck", "simhash") ++
      (0 until cfg.tables).flatMap(r => Seq(s"bucket_$r", s"entries_$r"))
    probed
      .withColumn("text_verdict",
        when(col("exact_match").isNotNull, lit("dup_exact"))
          .when(nearMatch.isNotNull, lit("dup_near"))
          .otherwise(lit("new")))
      .withColumn("text_match", coalesce(col("exact_match"), nearMatch))
      .drop(helperCols :+ "exact_match": _*)
  }

  /** Streaming EMBEDDING admission — the stream-static twin of the batch
    * semantic delta-vs-corpus check ([[graft.ops.Embeddings.q78EmbeddingAdmission]]),
    * completing the admission surface: text exact/near ([[admissionStream]])
    * AND embedding space, both batch and streaming. Each arriving
    * (ts, vec_id, embedding) row probes the STANDING corpus's hash-seeded
    * IVF index and emits `dup_semantic` (some same-cell corpus vector with
    * cosine ≥ the q48/q78 bound) or `new`, plus the smallest matching
    * corpus id and the best cosine seen (NULL when the cell is empty).
    *
    * Statelessness, row-locally: the whole codebook rides in as ONE
    * broadcast row (k=16 cells × 64 dims), so the nearest-centroid argmin
    * is an `array_min` over a transform — the exact (d2 ASC, cell ASC)
    * tie-break of the batch assignment — and the cell's corpus entries
    * arrive as one broadcast array per cell, filtered/min'd/max'd with
    * codegen HOFs. No watermark, no state store, exactly-once per row;
    * EventStreamsSpec pins row-set equality (including best_cos bitwise)
    * against q78 on the sf slice via a Trigger.AvailableNow run. For the
    * PERSISTED-artifact loop — probe the index as it exists now, append
    * the admitted vectors' cell rows back — see [[vectorIngestStream]]. */
  def embeddingAdmissionStream(vecs: DataFrame, corpus: DataFrame): DataFrame = {
    import graft.ops.Embeddings
    val (centsRow, cells) = Embeddings.admissionIndexFrames(corpus)
    Embeddings.admitVectorsAgainstIndex(vecs, centsRow, cells)
  }

  /** Streaming JOINT multimodal admission — the q104 policy as ONE
    * stateless pass over a (ts, doc_id, text, embedding) stream: the
    * semantic probe appends its verdict first (broadcast codebook row +
    * cell entry arrays), the text probe chains on the same frame
    * (broadcast digest/band index), and a row admits only when BOTH say
    * `new`, with per-modality reasons kept. Still no watermark and no
    * state store — the joint gate is a composition of two row-local
    * broadcast probes, which is exactly why it can run at ingestion line
    * rate. EventStreamsSpec pins row equality against the q104 batch gate
    * on the same split. */
  def jointAdmissionStream(docs: DataFrame, corpusDocs: DataFrame,
      corpusVecs: DataFrame): DataFrame = {
    import graft.ops.Embeddings
    val (centsRow, cells) = Embeddings.admissionIndexFrames(corpusVecs)
    val sem = Embeddings.admitVectorsAgainstIndex(docs, centsRow, cells)
      .withColumnRenamed("verdict", "sem_verdict")
      .withColumnRenamed("match_id", "sem_match")
      .drop("best_cos")
    withTextAdmission(sem, corpusDocs)
      .select(col("ts"), col("doc_id"), col("text_verdict"), col("sem_verdict"),
        (col("text_verdict") === "new" && col("sem_verdict") === "new").as("admit"))
  }

  /** The full streaming INGESTION loop over the persisted text admission
    * index — what [[admissionStream]] (static index) cannot do: each
    * micro-batch probes the index as it exists NOW, writes its verdicts,
    * and appends the admitted (`new`) documents' digest/band rows back to
    * the index, so a later batch's exact copy of an earlier batch's
    * admitted document is caught as `dup_exact`. This is the production
    * admission loop the BuildCorpusIndex/AdmitBatch/ExtendCorpusIndex CLI
    * jobs run one batch at a time, as one continuous `foreachBatch` query.
    * An UNSEEDED index directory bootstraps: the first batch probes empty
    * frames, admits wholesale, and its append creates the index — no
    * separate BuildCorpusIndex step needed to start a fresh corpus
    * (spec-pinned in CliSpec's from-nothing case).
    *
    * Delivery contract: verdicts are idempotent under foreachBatch's
    * at-least-once retries — each batch overwrites its own `batch=<id>`
    * subdirectory, and the probe's batch-set exclusion (see
    * `admitAgainstIndex`) means a replayed batch never matches the rows
    * its failed attempt appended, even when the batch contains duplicate
    * texts. Index appends are at-least-once — a retried append leaves
    * duplicate rows that are HARMLESS for verdicts (admission is
    * min/exists over matches) and reclaimed by the CompactCorpusIndex
    * job, exactly the append-shaped maintenance the index layout was
    * designed for. Within one micro-batch, documents are judged against
    * the standing index only (q71's batch-vs-corpus contract) —
    * intra-batch duplicates are upstream exact-dedup's job.
    *
    * Scale shape per batch: both probes broadcast BATCH-side keys against
    * the streamed index (never shuffled/collected); the append writes
    * only the admitted docs' derived rows. */
  /** Scheme-aware existence probe for persisted-index bootstrap: resolves
    * through the Hadoop FileSystem for the path's scheme, so an HDFS/S3
    * index directory is SEEN on restart. A driver-local `java.io.File`
    * check is always false for remote schemes, which would silently treat
    * a standing index as empty on every restart — tolerable for the
    * duplicate-tolerant gram/digest indexes (one batch of missed
    * cross-batch matches), fatal for the graph loop, whose edge
    * denominators depend on the standing postings being seen. */
  private def indexExists(spark: org.apache.spark.sql.SparkSession,
      dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The tombstoned ids of a persisted index dir
    * ([[graft.cli.TombstoneIndex]] appends them; [[graft.ops.IndexFamily]]
    * applies them on the generic CLI read) — None when no tombstone dir
    * exists. Every ingestion loop applies these to its loaded artifact, so
    * an append-only GDPR delete is visible to the very NEXT micro-batch's
    * probe: a deleted doc stops matching immediately, without the loop
    * ever rewriting the artifact (the next Extend/Forget compaction makes
    * the deletion physical). One distinct id frame, anti-joined exactly
    * like the loops' own replay exclusions. */
  private def tombstoneIds(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, idCol: String): Option[DataFrame] =
    if (indexExists(spark, s"$indexDir/tombstones"))
      Some(spark.read.parquet(s"$indexDir/tombstones")
        .select(col(idCol)).distinct())
    else None

  def admissionIngestStream(docs: DataFrame, indexDir: String,
      verdictsDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        try {
          // bootstrap: with no seeded index yet (first run on an empty
          // directory), probe against empty frames — the first batch
          // admits wholesale and its append CREATES the index
          val (digests0, bands0) =
            if (indexExists(spark, s"$indexDir/digests"))
              (spark.read.parquet(s"$indexDir/digests"),
                spark.read.parquet(s"$indexDir/bands"))
            else {
              val (d, b) = graft.ops.Curation.corpusIndexFrames(
                batch.toDF().limit(0))
              (d, b)
            }
          // append-only deletions (TombstoneIndex) are visible to the
          // very next batch's probe — a deleted doc stops matching here
          val (digests, bands) =
            tombstoneIds(spark, indexDir, "doc_id") match {
              case Some(ids) =>
                graft.ops.Curation.forgetFromIndex(digests0, bands0, ids)
              case None => (digests0, bands0)
            }
          val verdicts = graft.CachedFrames.track(
            graft.ops.Curation.admitAgainstIndex(batch.toDF(), digests, bands))
          verdicts.write.mode("overwrite")
            .parquet(s"$verdictsDir/batch=$batchId")
          val admitted = batch.toDF().join(
            verdicts.filter(col("verdict") === "new").select("doc_id"), Seq("doc_id"))
          val (d2, b2) = graft.ops.Curation.corpusIndexFrames(admitted)
          d2.write.mode("append").parquet(s"$indexDir/digests")
          b2.write.mode("append").parquet(s"$indexDir/bands")
        } finally graft.CachedFrames.drain()
    }

  /** Substring-dedup INGESTION loop over the persisted gram index — the
    * incremental face of q166/q184 run as one continuous `foreachBatch`
    * query (the BuildSubstrIndex/AdmitSubstrings/ExtendSubstrIndex CLI
    * loop without the per-batch hand-holding): each micro-batch computes
    * its removal plan against the index as it exists NOW
    * ([[graft.ops.TextOps.substrAdmitAgainstIndex]] — the immutable-base
    * contract: arriving doc_ids follow everything already ingested, the
    * monotone ingest-id precondition the site packing already imposes),
    * writes the plan to its own `batch=<id>` directory, and appends the
    * batch's distinct grams back — so a LATER batch quoting an EARLIER
    * batch's passage is caught, which a static index cannot do.
    *
    * Bootstrap: an unseeded index directory probes an empty frame — the
    * first batch's plan is its own within-batch q166 plan and its append
    * CREATES the index (in the family's writer-attributed shape).
    * Idempotency under at-least-once retries: plans overwrite their own
    * `batch=<id>` subdirectory; the persisted grams are WRITER-ATTRIBUTED
    * ([[graft.ops.TextOps.substrIndexPostingsFrame]] — one (doc_id, gram)
    * row per distinct gram of each doc, the substr index family's
    * artifact) so a replayed batch anti-joins out the rows its own failed
    * append wrote before probing (self-inclusion would mark every
    * replayed site redundant against itself — a gram-only index cannot be
    * repaired read-side); residual duplicate gram ROWS from a retried
    * append stay harmless because the probe dedups grams inside
    * substrAdmitAgainstIndex. A LEGACY gram-only directory keeps working
    * — admission unchanged, appends stay gram-only, replay repair
    * unavailable until the index is rebuilt attributed.
    *
    * Scale shape per batch: the batch explodes per-row (q166's shape);
    * the index probe is one gram-keyed join; the append writes only the
    * batch's distinct grams. The standing index is never re-scanned as
    * text. */
  def substrIngestStream(docs: DataFrame, indexDir: String,
      plansDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        try {
          // the persisted grams carry the writing doc_id (see
          // substrIndexPostingsFrame — the substr family's artifact) so a
          // replayed batch can exclude the rows its failed first attempt
          // appended — without the anti-join a half-committed retry probes
          // an index containing the batch itself and marks every replayed
          // site redundant. A LEGACY gram-only index (pre-attribution
          // builds) is read AS-IS: admission works unchanged, the
          // anti-join is skipped (nothing to attribute a replay by — one
          // replayed batch may self-match, the bounded price of running
          // over an un-upgraded artifact), and appends stay gram-only so
          // the directory never holds two schemas at once.
          val attributed = !indexExists(spark, s"$indexDir/grams") ||
            spark.read.parquet(s"$indexDir/grams").columns.contains("doc_id")
          // the replay exclusion and the tombstone exclusion are the SAME
          // anti-join — a tombstoned doc's postings stop matching on the
          // very next batch (legacy gram-only dirs can't carry tombstones:
          // TombstoneIndex refuses to create them)
          val excluded = tombstoneIds(spark, indexDir, "doc_id") match {
            case Some(ids) =>
              batch.toDF().select(col("doc_id")).distinct().unionByName(ids)
            case None => batch.toDF().select(col("doc_id")).distinct()
          }
          val index =
            if (!indexExists(spark, s"$indexDir/grams"))
              graft.ops.TextOps.substrIndexFrame(batch.toDF().limit(0))
            else if (attributed)
              spark.read.parquet(s"$indexDir/grams")
                .join(excluded, Seq("doc_id"), "left_anti")
                .select(col("gram"))
            else spark.read.parquet(s"$indexDir/grams").select(col("gram"))
          graft.ops.TextOps.substrAdmitAgainstIndex(batch.toDF(), index)
            .write.mode("overwrite").parquet(s"$plansDir/batch=$batchId")
          (if (attributed)
            graft.ops.TextOps.substrIndexPostingsFrame(batch.toDF())
          else graft.ops.TextOps.substrIndexFrame(batch.toDF()))
            .write.mode("append").parquet(s"$indexDir/grams")
        } finally graft.CachedFrames.drain()
    }

  /** Containment-graph INGESTION loop over the persisted fingerprint
    * postings — the incremental face of q68/q238 run as one continuous
    * `foreachBatch` query (the BuildGraphIndex/AdmitDocs/ExtendGraphIndex
    * CLI loop without the per-batch hand-holding): each micro-batch
    * computes its INCIDENT containment edges against the postings as they
    * exist NOW ([[graft.ops.TextOps.graphAdmitAgainstIndex]] — including
    * the df-cap crossings the batch itself causes), writes them to its own
    * `batch=<id>` directory, and appends the batch's winnowed postings
    * back — so a LATER batch quoting an EARLIER batch's passage is caught,
    * which a static edge list cannot do.
    *
    * Unlike the substring index (existence-only grams, duplicate-tolerant
    * by construction), the graph index COUNTS postings for the df cap, so
    * at-least-once replays of the fps append would inflate document
    * frequencies. TWO read-side repairs make replay idempotent: (1)
    * duplicate posting ROWS collapse under one distinct() — legitimate
    * postings are unique per (doc_id, fp) by construction (winnowing
    * dedups per doc), so only replay can duplicate them; (2) the loaded
    * postings are ANTI-JOINED on the batch's own doc_ids before the
    * admission — a replay whose failed first attempt appended but did not
    * commit would otherwise probe an index already CONTAINING the batch
    * (self-inclusion distinct() cannot see: every batch-carried
    * fingerprint's df double-counted, fingerprints near the cap spuriously
    * dropped, and each batch doc priced in BOTH denominator branches).
    * With the exclusion, the replayed batch sees exactly the pre-batch
    * index and overwrites `batch=<id>` with the same rows the first
    * attempt computed. df and sizes are DERIVED from the repaired postings
    * per batch (an O(|postings|) rollup — never a text re-scan; the price
    * of append-only maintenance, reclaimed by running the CLI trio's
    * ExtendGraphIndex compaction, whose persisted df/sizes restore the
    * bounded-lookup admission).
    *
    * Bootstrap: an unseeded index dir probes an empty frame — the first
    * batch's edges are its own within-batch containment and its append
    * CREATES the postings. */
  /** With `patchesDir` set, each micro-batch ALSO writes the base↔base
    * edge patch its admission implies
    * ([[graft.ops.TextOps.graphRetireOnAdmit]]) to `patch_batch=<id>` —
    * which upgrades the loop from "incident edges per batch" to FULL
    * standing-artifact maintenance: applying batch k's patch to the
    * artifact and unioning batch k's incident edges reproduces the
    * from-scratch edge list of the grown corpus, batch after batch
    * (spec-pinned across two batches at a binding fixture cap). `dfCap`/
    * `minShared` default to the production constants; fixtures narrow
    * them to drive the crossing branches through the STREAM. */
  def graphIngestStream(docs: DataFrame, indexDir: String,
      edgesDir: String, patchesDir: Option[String] = None,
      dfCap: Int = graft.ops.TextOps.ContainDfCap,
      minShared: Int = graft.ops.TextOps.ContainMinShared): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        try {
          // batch replay exclusion + tombstone exclusion share one
          // anti-join; df/sizes re-derive below, so a deletion's df
          // shrinkage (fingerprints un-dropping) prices correctly too
          val gexcluded = tombstoneIds(spark, indexDir, "doc_id") match {
            case Some(ids) =>
              batch.toDF().select(col("doc_id")).distinct().unionByName(ids)
            case None => batch.toDF().select(col("doc_id")).distinct()
          }
          val fps = graft.CachedFrames.track(
            if (indexExists(spark, s"$indexDir/fps"))
              spark.read.parquet(s"$indexDir/fps").distinct()
                .join(gexcluded, Seq("doc_id"), "left_anti")
            else graft.ops.TextOps.graphIndexFps(batch.toDF().limit(0)))
          val df = graft.CachedFrames.track(
            graft.ops.TextOps.graphIndexDfOf(fps))
          val sizes = graft.ops.TextOps.graphIndexSizesOf(fps, dfCap)
          graft.ops.TextOps.graphAdmitAgainstIndex(batch.toDF(), fps, df,
              sizes, dfCap, minShared)
            .write.mode("overwrite").parquet(s"$edgesDir/batch=$batchId")
          patchesDir.foreach { p =>
            graft.ops.TextOps.graphRetireOnAdmit(batch.toDF(), fps, df,
                sizes, dfCap, minShared)
              .write.mode("overwrite").parquet(s"$p/patch_batch=$batchId")
          }
          graft.ops.TextOps.graphIndexFps(batch.toDF())
            .write.mode("append").parquet(s"$indexDir/fps")
        } finally graft.CachedFrames.drain()
    }

  /** Near-dup candidate INGESTION loop over the persisted LSH-band index
    * ([[graft.ops.LshBandIndexFamily]]) — the incremental face of q27/q254
    * run as one continuous `foreachBatch` query: each micro-batch computes
    * its INCIDENT candidate pairs (batch↔standing and batch↔batch, the
    * q131 consolidation input) against the sig/band tables as they exist
    * NOW, writes them to its own `batch=<id>` directory, and appends the
    * batch's signature and band rows back — so a LATER batch near-duping
    * an EARLIER batch's doc is caught, which a static candidate list
    * cannot do.
    *
    * Replay idempotency comes for free from the family's table shapes:
    * both tables carry doc_id, so the loaded index anti-joins out the
    * batch's own rows (a half-committed append cannot make a replayed doc
    * its own candidate), and legitimate rows are unique per (doc_id) /
    * (doc_id, band) by construction, so one distinct() absorbs duplicate
    * appended rows.
    *
    * Bootstrap: an unseeded index dir probes empty frames — the first
    * batch's candidates are its own within-batch pairs and its append
    * CREATES the index. Scale shape per batch: |batch| text is shingled
    * and signed ONCE; the candidate join is banded (uniform keys); the
    * appends write |batch| sig rows + |batch|×numBands band rows. */
  def lshIngestStream(docs: DataFrame, indexDir: String,
      candsDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        try {
          // replay exclusion + tombstone exclusion in one anti-join
          val bids = tombstoneIds(spark, indexDir, "doc_id") match {
            case Some(ids) =>
              batch.toDF().select(col("doc_id")).distinct().unionByName(ids)
            case None => batch.toDF().select(col("doc_id")).distinct()
          }
          val (sig, bands) =
            if (indexExists(spark, s"$indexDir/sig"))
              (spark.read.parquet(s"$indexDir/sig").distinct()
                  .join(bids, Seq("doc_id"), "left_anti"),
                spark.read.parquet(s"$indexDir/bands").distinct()
                  .join(bids, Seq("doc_id"), "left_anti"))
            else {
              val empty = graft.ops.NearDup.sigFrame(batch.toDF().limit(0))
              (empty, graft.ops.NearDup.bandsFrame(empty))
            }
          graft.ops.NearDup.lshAdmitAgainstIndex(batch.toDF(), sig, bands)
            .write.mode("overwrite").parquet(s"$candsDir/batch=$batchId")
          val bsig = graft.CachedFrames.track(
            graft.ops.NearDup.sigFrame(batch.toDF()))
          bsig.write.mode("append").parquet(s"$indexDir/sig")
          graft.ops.NearDup.bandsFrame(bsig)
            .write.mode("append").parquet(s"$indexDir/bands")
        } finally graft.CachedFrames.drain()
    }

  /** CLUSTER-MAINTENANCE ingestion loop — [[lshIngestStream]] extended to
    * keep the standing near-dup COMPONENT table current per micro-batch:
    * each batch computes its incident τ edges against the lshband index
    * as it exists now, updates the standing assignment through
    * [[graft.dedup.Clustering.incrementalComponents]] (CC over the
    * delta's contraction graph + a delta-bounded relabel), and writes
    * ONLY the changed-or-new rows to `compsDir/patch_batch=<id>` — the
    * q252/q260 patch discipline applied to cluster assignments: a
    * corpus-sized table is never rewritten per batch, and the CURRENT
    * assignment is the per-id last-write-wins over the patch log
    * ([[currentComponents]]).
    *
    * Replay idempotency: the sig/band read excludes the batch's own rows
    * (and tombstones) exactly as [[lshIngestStream]]; the standing
    * assignment derivation excludes the batch's OWN patch directory, so
    * a half-committed patch from a failed attempt never feeds back; the
    * patch itself overwrites its `patch_batch=<id>` dir.
    *
    * `tau` defaults to the production [[graft.ops.NearDup.ConsolidateTau]];
    * fixtures narrow it to drive cross-component merges through the
    * stream. Scale shape per batch: one banded probe + CC over incident
    * τ edges + one broadcast relabel of the (patch-log-derived) standing
    * table; the patch write is bounded by the touched components, not
    * the corpus. */
  def componentsIngestStream(docs: DataFrame, indexDir: String,
      compsDir: String,
      tau: Double = graft.ops.NearDup.ConsolidateTau): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        try {
          val bids = tombstoneIds(spark, indexDir, "doc_id") match {
            case Some(ids) =>
              batch.toDF().select(col("doc_id")).distinct().unionByName(ids)
            case None => batch.toDF().select(col("doc_id")).distinct()
          }
          val (sig, bands) =
            if (indexExists(spark, s"$indexDir/sig"))
              (spark.read.parquet(s"$indexDir/sig").distinct()
                  .join(bids, Seq("doc_id"), "left_anti"),
                spark.read.parquet(s"$indexDir/bands").distinct()
                  .join(bids, Seq("doc_id"), "left_anti"))
            else {
              val empty = graft.ops.NearDup.sigFrame(batch.toDF().limit(0))
              (empty, graft.ops.NearDup.bandsFrame(empty))
            }
          val incident = graft.ops.NearDup
            .lshAdmitAgainstIndex(batch.toDF(), sig, bands)
            .filter(col("true_jaccard") >= tau)
            .select(col("id1"), col("id2"))
          // standing = last-write-wins over every PRIOR batch's patch —
          // the current batch's own dir is excluded so a failed earlier
          // attempt's half-committed patch never feeds back on replay
          val standing = currentComponents(spark, compsDir,
            excludeBatch = Some(batchId))
          val updated = graft.dedup.Clustering
            .incrementalComponents(standing, incident)
          val patch = updated.alias("u")
            .join(standing.alias("s"), Seq("id"), "left")
            .filter(col("s.component").isNull ||
              col("u.component") =!= col("s.component"))
            .select(col("id"), col("u.component").as("component"))
          patch.write.mode("overwrite")
            .parquet(s"$compsDir/patch_batch=$batchId")
          val bsig = graft.CachedFrames.track(
            graft.ops.NearDup.sigFrame(batch.toDF()))
          bsig.write.mode("append").parquet(s"$indexDir/sig")
          graft.ops.NearDup.bandsFrame(bsig)
            .write.mode("append").parquet(s"$indexDir/bands")
        } finally graft.CachedFrames.drain()
    }

  /** The CURRENT component assignment from a patch log
    * ([[componentsIngestStream]]'s output): per id, the row from the
    * NEWEST `patch_batch` that mentions it — one windowless max-join
    * (self-join on the per-id max batch), never a corpus rewrite to
    * read. `excludeBatch` is the loop's replay seam. Empty/missing log →
    * empty assignment (the bootstrap). */
  def currentComponents(spark: org.apache.spark.sql.SparkSession,
      compsDir: String,
      excludeBatch: Option[Long] = None): DataFrame = {
    if (!indexExists(spark, compsDir))
      return spark.range(0)
        .select(col("id"), col("id").as("component")).limit(0)
    val all0 = spark.read.parquet(compsDir)
    val all = excludeBatch match {
      case Some(b) => all0.filter(col("patch_batch") =!= b)
      case None => all0
    }
    val latest = all.groupBy(col("id"))
      .agg(max(col("patch_batch")).as("patch_batch"))
    all.join(latest, Seq("id", "patch_batch"))
      .select(col("id"), col("component"))
  }

  /** Semantic-admission INGESTION loop over the persisted VECTOR index
    * ([[graft.ops.VectorIndexFamily]]'s codebook/cells artifact) — the
    * missing fifth loop: corpus, substr, graph, and lshband each maintain
    * their persisted artifact from a stream, while the embedding side only
    * had [[embeddingAdmissionStream]], a static-index probe over a corpus
    * FRAME. This is the incremental face of q78 run as one continuous
    * `foreachBatch` query (the BuildVectorIndex/AdmitVectors/
    * ExtendVectorIndex CLI loop without the per-batch hand-holding): each
    * micro-batch probes the codebook/cells artifact as it exists NOW,
    * writes its verdicts to `batch=<id>`, and appends the admitted
    * (`new`) vectors' cell rows back — so a later batch's near-copy of an
    * earlier batch's admitted vector is caught as `dup_semantic`, which
    * the static probe cannot do.
    *
    * FROZEN-CODEBOOK contract (q78's invariant, the family's law): the
    * codebook is trained ONCE — at bootstrap, on the first batch, which
    * IS the initial standing corpus — and never shifts afterwards, so no
    * standing entry ever moves cells; periodic re-trains rewrite both
    * frames wholesale via BuildVectorIndex, exactly as for the batch CLI.
    * The first batch probes the fresh codebook against EMPTY cells (all
    * verdicts `new`, null match/best_cos) and its append CREATES the
    * cells table.
    *
    * Replay idempotency: cell appends are at-least-once, and the cells
    * table aggregates entries into per-cell ARRAYS, so the loaded index
    * is consolidated READ-SIDE each batch — entries exploded, duplicate
    * rows from retried appends collapsed under one distinct(), the
    * batch's own vec_ids anti-joined out (a half-committed append must
    * not make a replayed vector its own `dup_semantic` match at cosine
    * 1), then re-aggregated per cell. A replayed bootstrap reads the
    * codebook its failed attempt wrote (deterministic hash-seeded
    * centroids of the same batch) and sees empty standing cells after
    * the exclusion — same verdicts, same appends.
    *
    * Scale shape per batch: the codebook rides as ONE broadcast row and
    * every verdict resolves row-locally (q78's HOF probe); the
    * consolidation pass is one explode + distinct + anti-join over the
    * cells artifact (O(index entries) per batch — the price of
    * append-only maintenance, same trade as the graph loop's df
    * re-derivation; ExtendVectorIndex compaction reclaims it); the
    * append writes only the admitted vectors' cell rows. */
  def vectorIngestStream(vecs: DataFrame, indexDir: String,
      verdictsDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecs.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        import graft.ops.Embeddings
        try {
          val (centsRow, cells) =
            if (indexExists(spark, s"$indexDir/codebook")) {
              val cb = spark.read.parquet(s"$indexDir/codebook")
              // replay exclusion + tombstone exclusion in one anti-join
              val bids0 = batch.toDF().select(col("vec_id").as("cid")).distinct()
              val bids = tombstoneIds(spark, indexDir, "vec_id") match {
                case Some(ids) =>
                  bids0.unionByName(ids.select(col("vec_id").as("cid")))
                case None => bids0
              }
              val consolidated = spark.read.parquet(s"$indexDir/cells")
                .select(col("cell"), explode(col("entries")).as("e"))
                .select(col("cell"), col("e.cid").as("cid"),
                  col("e.cv").as("cv"), col("e.cn").as("cn"))
                .distinct()
                .join(bids, Seq("cid"), "left_anti")
                .groupBy(col("cell"))
                .agg(collect_list(struct(col("cid"), col("cv"), col("cn")))
                  .as("entries"))
              (cb, consolidated)
            } else {
              // bootstrap: train the codebook on the first batch (the
              // initial standing corpus), persist it FROZEN, probe empty
              val (cb, _) = Embeddings.admissionIndexFrames(batch.toDF())
              cb.write.mode("overwrite").parquet(s"$indexDir/codebook")
              (cb, Embeddings.cellsUnderCodebook(batch.toDF().limit(0), cb))
            }
          val verdicts = graft.CachedFrames.track(
            Embeddings.admitVectorsAgainstIndex(batch.toDF(), centsRow, cells))
          verdicts.write.mode("overwrite").parquet(s"$verdictsDir/batch=$batchId")
          val admitted = batch.toDF().join(
            verdicts.filter(col("verdict") === "new").select("vec_id"),
            Seq("vec_id"))
          Embeddings.cellsUnderCodebook(admitted, centsRow)
            .write.mode("append").parquet(s"$indexDir/cells")
        } finally graft.CachedFrames.drain()
    }

  /** Streaming LM quality gate — the stream-static twin of the batch
    * bigram-LM scorer ([[graft.ops.TextOps.q92LmBits]]): each arriving
    * (doc_id, text) row is scored against the STANDING corpus-trained LM
    * and emits the identical (n_tokens, sum_bits, avg_bits) columns, so an
    * ingestion pipeline can threshold quality before admission with the
    * exact numbers the batch curation computed.
    *
    * Statelessness, row-locally: the LM collapses to ONE broadcast row —
    * the unigram counts as a map column, the bigram counts keyed by
    * "w1 w2", plus the (N, V) totals — so a row's whole cost array is one
    * codegen `transform` over its tokens (map probes replace the batch
    * form's broadcast joins; same CASE, same floor/bin arithmetic) and the
    * per-doc sum is an array `aggregate`, never a streaming aggregation.
    * No watermark, no state store, exactly-once per row; EventStreamsSpec
    * pins bitwise row equality (incl. avg_bits) against q92 on the same
    * documents. The map row is BOUNDED BY CONSTRUCTION — the LM is
    * vocab-cut at [[graft.ops.TextOps.LmVocabV]] symbols plus the reserved
    * `<oov>` residual (uni_m ≤ V+1 entries, big_m ≤ (V+1)² entries), so
    * the broadcast row's size is independent of corpus token diversity; a
    * map probe that misses IS the out-of-vocab signal and falls back to
    * the `<oov>` count and bigram key, exactly as the batch joins do. */
  def lmQualityStream(docs: DataFrame, corpus: DataFrame): DataFrame = {
    import graft.ops.TextOps
    val (uni, big, nv) = TextOps.lmTables(corpus)
    // cached: the stream-static side re-executes every micro-batch — an
    // untracked lm frame would replay the corpus aggregation per trigger;
    // cached, each batch's static cost is a 1-row in-memory scan
    val lm = graft.CachedFrames.track(uni
      .agg(map_from_entries(collect_list(struct(col("w"), col("c")))).as("uni_m"))
      .crossJoin(big.agg(map_from_entries(collect_list(
        struct(concat_ws(" ", col("w1"), col("w2")), col("cb")))).as("big_m")))
      .crossJoin(nv))
    val oov = TextOps.LmOov
    docs.crossJoin(broadcast(lm))
      .withColumn("toks", expr("""split(trim(text), '\\s+')"""))
      .withColumn("bits_arr", expr(s"""
        transform(sequence(0, size(toks) - 1), i ->
          length(bin(CASE WHEN i = 0
            THEN CAST(floor((lm_n + lm_v + 1.0)
                   / (coalesce(CAST(uni_m[toks[0]] AS DOUBLE), c_oov) + 1.0)) AS BIGINT)
            ELSE CAST(floor((coalesce(CAST(uni_m[toks[i - 1]] AS DOUBLE), c_oov) + lm_v + 1.0)
                   / (CAST(coalesce(big_m[concat(
                        CASE WHEN uni_m[toks[i - 1]] IS NULL THEN '$oov' ELSE toks[i - 1] END,
                        ' ',
                        CASE WHEN uni_m[toks[i]] IS NULL THEN '$oov' ELSE toks[i] END)], 0)
                        AS DOUBLE) + 1.0)) AS BIGINT) END)))"""))
      .select(col("doc_id"),
        expr("CAST(size(toks) AS BIGINT)").as("n_tokens"),
        expr("aggregate(bits_arr, CAST(0 AS BIGINT), (a, x) -> a + x)").as("sum_bits"))
      .withColumn("avg_bits",
        col("sum_bits").cast("double") / col("n_tokens").cast("double"))
  }

  /** Streaming count-min sketch — the q95 frequency sketch maintained
    * incrementally over an unbounded document stream. The transform IS the
    * batch one ([[graft.ops.TextOps.cmsSketchOn]]): a groupBy over (row,
    * bucket) whose streaming state is the sketch itself — d×w counters by
    * construction, so no watermark is needed and the state store can never
    * grow (the defining property of a sketch, surfaced as the operator's
    * streaming contract). Run in Complete/Update mode; EventStreamsSpec
    * pins BOTH output modes against the batch sketch — Complete
    * cell-by-cell, and Update as a delta feed whose per-trigger updated
    * cells, merged last-write-wins by (row, bucket) key (the keyed-upsert
    * consumption a monitoring sink actually does), converge to the same
    * table. */
  def cmsSketchStream(docs: DataFrame): DataFrame =
    graft.ops.TextOps.cmsSketchOn(docs)

  /** Streaming column profiler — the twin of the q105 family's bounded-state
    * face ([[graft.ops.Profiling.profileApprox]]), and deliberately THAT
    * face: a streaming profile cannot hold exact distinct sets (state =
    * every value ever seen), but HLL++ registers are constant-size per
    * column and merge order-insensitively, so in Complete mode the standing
    * table converges to exactly what the batch approx profile computes on
    * the same rows — row-equal, not just close, because count/sum/min/max
    * are order-insensitive and the HLL estimate is a pure function of the
    * merged registers (spec-pinned across out-of-order batches). The
    * whole-table state is one row per column × five constant-size
    * accumulators. Shares the batch code verbatim: the stack unpivot is a
    * stateless projection, the single aggregation is the only stateful op,
    * so there is no chained-aggregation restriction to dodge. */
  def profileStream(docs: DataFrame): DataFrame =
    graft.ops.Profiling.profileApprox(docs)

  /** Streaming histogram cells for the q108 value-drift monitor — the
    * Update-mode delta-feed contract the streaming CMS already pins: the
    * stream emits, per trigger, the updated (day, bucket, n) cells its own
    * events touched; a monitoring sink merges them last-write-wins (keyed
    * upsert) and re-runs the calendar-bounded finalization
    * ([[graft.ops.Events.driftFromCells]] — dense vectors, adjacent-day
    * join, TVD/χ² folds) over the merged table, converging to exactly the
    * batch q108 rows under any arrival order (spec-pinned, including
    * events for an EARLIER day landing after a later day's). State is one
    * Long per (day, bucket) — ≤ days × 20 — and the heavy phase is this
    * single aggregation; the finalization runs on a frame the size of the
    * calendar. Shares [[graft.ops.Events.driftCellsOn]] verbatim. */
  def driftCellStream(events: DataFrame): DataFrame =
    graft.ops.Events.driftCellsOn(events)

  /** Streaming DSIR gate — the stream-static twin of the batch importance
    * weigher ([[graft.ops.TextOps.q93Dsir]]): each arriving (doc_id, text)
    * row is scored against the STANDING corpus's bucket bits-delta table
    * and emits the identical (n_grams, w_bits, selected) columns, so
    * ingestion can keep only target-distribution-up-weighted documents
    * with the exact numbers the batch selection computed.
    *
    * Statelessness, row-locally: the B-row delta table collapses to ONE
    * broadcast row as a bucket→delta map (cached — the stream-static side
    * re-executes per micro-batch), so a row's weight is one codegen
    * `transform`+`aggregate` over its own bigrams. No watermark, no state
    * store; EventStreamsSpec pins row equality against q93's batch
    * scorer on the same documents. A gram bucket the corpus never
    * produced scores by the SAME smoothing formula as everything else —
    * the delta table carries a sentinel row (see
    * [[graft.ops.TextOps.dsirDeltaTable]]) with the cr = ct = 0 delta,
    * and a map probe that misses falls back to it, so out-of-corpus
    * documents are weighted exactly as the batch formula would weight
    * them (spec-pinned against the plain-Scala oracle). */
  def dsirGateStream(docs: DataFrame, corpus: DataFrame): DataFrame = {
    import graft.ops.TextOps
    val dm = graft.CachedFrames.track(
      TextOps.dsirDeltaTable(corpus)
        .agg(map_from_entries(collect_list(struct(col("bucket"), col("d_bits"))))
          .as("delta_m")))
    docs.crossJoin(broadcast(dm))
      .withColumn("toks", expr("""split(trim(text), '\\s+')"""))
      .withColumn("bks", expr(TextOps.dsirBucketArrayExpr))
      .select(col("doc_id"),
        expr("CAST(size(bks) AS BIGINT)").as("n_grams"),
        expr(s"""aggregate(bks, CAST(0 AS BIGINT),
                 (a, b) -> a + CAST(coalesce(delta_m[b],
                   delta_m[${TextOps.DsirUnseenBucket}]) AS BIGINT))""")
          .as("w_bits"))
      .withColumn("selected", col("w_bits") > 0)
  }

  /** Streaming cohort retention — the CHANGELOG twin of the batch matrix
    * ([[graft.ops.Events.q102CohortRetention]]): per arriving (user_id,
    * ts) event, emit +1 / −1 deltas against (cohort_wk, week_offset)
    * cells such that the deltas summed per cell equal the batch matrix's
    * active_users — under ANY arrival order. A user's cohort is the MIN
    * epoch week ever seen, so a LATE-arriving earlier event legitimately
    * REWRITES the user's whole row of the matrix: the operator handles
    * that by emitting retractions (−1 for every previously-granted cell
    * of the old cohort) followed by the re-granted cells of the new one —
    * the standard changelog contract a keyed upsert/aggregating sink
    * consumes. In-order arrivals never retract (spec-pinned both ways).
    * cohort sizes need no extra feed: every user is active at offset 0,
    * so cohort_size = the (cohort_wk, 0) cell.
    *
    * State per user: cohort week + the distinct active weeks — bounded by
    * weeks-per-user (52/year), never event volume, the same bound as the
    * batch `collect_set`. No watermark needed: nothing is ever evicted,
    * and correctness under late data comes from retraction, not
    * dropping. */
  def retentionDeltaStream(events: Dataset[UserEvent]): Dataset[RetentionDelta] = {
    import events.sparkSession.implicits._
    def week(ts: java.sql.Timestamp): Long =
      Math.floorDiv(ts.getTime / 1000L, 604800L)
    def fn(uid: Long, batch: Iterator[UserEvent],
           state: GroupState[RetentionState]): Iterator[RetentionDelta] = {
      val newWks = batch.map(e => week(e.ts)).toSet
      val st = state.getOption
      val oldWeeks = st.map(_.weeks.toSet).getOrElse(Set.empty[Long])
      val allWeeks = oldWeeks ++ newWks
      if (allWeeks.isEmpty) Iterator.empty
      else {
        val cohort = allWeeks.min
        val out = scala.collection.mutable.ListBuffer.empty[RetentionDelta]
        st match {
          case Some(s) if s.cohort_wk == cohort =>
            (newWks -- oldWeeks).toSeq.sorted.foreach(w =>
              out += RetentionDelta(cohort, w - cohort, 1))
          case _ =>
            // first sight, or a late earlier event shifted the cohort:
            // retract the old row, grant the new one in full
            st.foreach(s => s.weeks.foreach(w =>
              out += RetentionDelta(s.cohort_wk, w - s.cohort_wk, -1)))
            allWeeks.toSeq.sorted.foreach(w =>
              out += RetentionDelta(cohort, w - cohort, 1))
        }
        state.update(RetentionState(cohort, allWeeks.toSeq.sorted))
        out.iterator
      }
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Streaming NB language ID — the stream-static twin of the batch
    * trained classifier ([[graft.ops.TextOps.q100NbLangid]]): each
    * arriving (doc_id, text) row is scored against the STANDING corpus's
    * trained per-bucket class costs and emits (doc_id, n_grams,
    * pred_lang), so ingestion can route/filter by language with the exact
    * argmin the batch scorer computes — labels are training-side only,
    * scoring needs none.
    *
    * Statelessness, row-locally: the ≤ B+1-row cost table collapses to
    * ONE broadcast row as a bucket → costs-array map (cached; the
    * priors ride in the same row), so a row's five class costs are five
    * codegen `aggregate`s over its own bigram buckets. A bucket the
    * corpus never produced falls back to the sentinel k = 0 cost row —
    * out-of-corpus documents score by the same smoothing formula as the
    * batch would score them (the q93 OOV contract, spec-pinned with a
    * plain-Scala oracle). No watermark, no state store. */
  def nbClassifyStream(docs: DataFrame, corpus: DataFrame): DataFrame = {
    import graft.ops.TextOps
    val (costs, priors) = TextOps.nbTables(corpus)
    val cm = graft.CachedFrames.track(costs
      .agg(map_from_entries(collect_list(struct(col("bucket"),
        array(TextOps.NbClasses.map(c => col(s"cost_$c")): _*)))).as("cost_m"))
      .crossJoin(priors))
    val sums = TextOps.NbClasses.zipWithIndex.map { case (c, i) =>
      expr(s"""aggregate(bks, CAST(0 AS BIGINT),
               (a, b) -> a + element_at(coalesce(cost_m[b], cost_m[-1]), ${i + 1}))
               + p_$c""").as(s"t_$c")
    }
    val m = least(TextOps.NbClasses.map(c => col(s"t_$c")): _*)
    val pred = TextOps.NbClasses.foldLeft(when(lit(false), lit(""))) { (w, c) =>
      w.when(col(s"t_$c") === m, lit(c))
    }
    docs.crossJoin(broadcast(cm))
      .withColumn("toks", expr("""split(trim(text), '\\s+')"""))
      .withColumn("bks", expr(TextOps.nbBucketArrayExpr))
      .select(Seq(col("doc_id"),
        expr("CAST(size(bks) AS BIGINT)").as("n_grams")) ++ sums: _*)
      .select(col("doc_id"), col("n_grams"), pred.as("pred_lang"))
  }

  /** Streaming SCD2 builder — q123's run intervals maintained incrementally:
    * one [[RunState]] per user (the OPEN interval; four fields of state,
    * bounded by the user roster), a [[ClosedRun]] emitted exactly when an
    * arriving event's type differs from the open run's. The closed-interval
    * feed is what a lakehouse MERGE consumes to append type-2 rows; the
    * open run stays in state, exactly like q123's NULL `valid_to_s` row.
    *
    * Ordering contract (the [[sourceQuotaStream]] convention, documented
    * not hidden): events are processed in (ts, event_type, value) order
    * WITHIN a micro-batch; ACROSS batches each user's events must arrive
    * in ts order — a change-data stream keyed by entity normally is. Under
    * that contract the closed feed is row-equal to q123's closed subset on
    * the same events (spec-pinned, including a run spanning two batches
    * and a same-type continuation that must NOT close). */
  def scdIntervalStream(events: Dataset[Event]): Dataset[ClosedRun] = {
    import events.sparkSession.implicits._
    def fn(userId: Long, batch: Iterator[Event],
           state: GroupState[RunState]): Iterator[ClosedRun] = {
      val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_type, e.value))
      val out = scala.collection.mutable.ArrayBuffer.empty[ClosedRun]
      var st = state.getOption
      sorted.foreach { e =>
        val eps = e.ts.getTime / 1000L
        st = st match {
          case Some(s) if s.event_type == e.event_type =>
            Some(s.copy(n_events = s.n_events + 1))
          case Some(s) =>
            out += ClosedRun(userId, s.run_id, s.event_type,
              s.valid_from_s, eps, s.n_events)
            Some(RunState(s.run_id + 1, e.event_type, eps, 1L))
          case None =>
            Some(RunState(1, e.event_type, eps, 1L))
        }
      }
      st.foreach(state.update)
      out.iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Streaming Gopher-rule gate — q112's composite rule battery applied to
    * each arriving (doc_id, text) row. The transform IS the batch one
    * ([[graft.ops.TextOps.gopherRulesOn]]): a pure per-row codegen
    * projection, so on a stream it is STATELESS by construction — no
    * watermark, no state store, exactly-once per row — and the verdicts
    * are bitwise-identical to the batch filter on the same documents
    * (spec-pinned). This is the shape an ingestion front-door wants: the
    * rule battery runs before anything stateful touches the row. */
  def gopherGateStream(docs: DataFrame): DataFrame =
    graft.ops.TextOps.gopherRulesOn(docs)

  /** Streaming Bloom decontamination gate — q114's probe side over arriving
    * (doc_id, text) rows. The STANDING benchmark's Bloom bitmap collapses
    * to ONE broadcast row (bucket → 32-bit word map; 8 KB at q114's
    * geometry regardless of benchmark size — cached, the stream-static
    * side re-executes per micro-batch), so each row's verdict is a pure
    * codegen filter+forall over its own grams: no watermark, no state
    * store, no join. Emits (doc_id, n_grams, n_bloom_hits, bloom_flag)
    * equal to the batch q114 columns on the same documents (spec-pinned).
    * This is the production front-door: the exact-set measurement twin
    * stays batch-side, the stream pays only the bitmap. */
  def bloomGateStream(docs: DataFrame, corpus: DataFrame): DataFrame = {
    import graft.ops.TextOps
    graft.functions.GraftFunctions.register(docs.sparkSession)
    TextOps.bloomProbeOn(docs,
      TextOps.bloomBitsOf(TextOps.decontamBenchGrams(corpus)))
  }

  /** Streaming contamination-rate monitor — the q122 release table kept
    * LIVE over an ingestion stream: each arriving (source, doc_id, text)
    * row passes the stateless Bloom probe ([[bloomGateStream]]'s pass with
    * `source` riding through), then ONE standing aggregation maintains
    * per-source totals and flagged counts. State is two Longs per source —
    * bounded by the source roster, never by volume — and there is no
    * watermark to tune because the counters only ever grow. Run in
    * Complete/Update mode; the spec pins the Complete-mode table equal to
    * the same rollup of the batch probe on the same documents (the Bloom
    * face of the monitor — the exact-set face stays batch-side in q122). */
  def contaminationRateStream(docs: DataFrame, corpus: DataFrame): DataFrame =
    bloomGateStream(docs, corpus)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("bloom_flag"), 1L).otherwise(0L)).as("n_flagged"))

  /** Live churn-label feed — q181's incremental face: a (user, week) label
    * row emits THE MOMENT it finalizes, i.e. when the user's first event of
    * a LATER week arrives (label = that week is w+1). State is ONE open
    * week per user ([[ChurnState]] — bounded: ≤7 day ids + three Longs).
    * The stream emits exactly the batch rows whose label is CONFIRMED by
    * later same-user activity; rows batch-q181 labels `false` because the
    * user simply went quiet stay PENDING here until that user reappears —
    * the honest streaming contract (a "churned" verdict needs either the
    * user's return or the batch's global censoring cut; EventStreamsSpec
    * pins the subset equality against [[graft.ops.Events.churnLabelsOn]]).
    *
    * Ordering contract ([[sourceQuotaStream]]'s): rows sort by (wk, day)
    * within each micro-batch; when a user's weeks arrive in order across
    * batch boundaries the emitted rows equal the confirmed-label subset of
    * the batch twin exactly (spec-pinned). A LATE event — e.wk behind the
    * user's open week — is DROPPED, never applied: Append mode cannot
    * retract the already-emitted rows its week might contradict, and
    * re-opening the stale week would both emit the open week with a wrong
    * `false` label and regress state so the open week later re-emits as a
    * duplicate (the r13 advice finding; the late-arrival fixture pins the
    * guard). */
  def churnLabelStream(events: Dataset[ChurnEvent]): Dataset[ChurnLabel] = {
    import events.sparkSession.implicits._
    def fn(user: Long, batch: Iterator[ChurnEvent],
           state: GroupState[ChurnState]): Iterator[ChurnLabel] = {
      var s = state.getOption.getOrElse(ChurnState(Long.MinValue, 0L, Nil, 0L))
      val out = scala.collection.mutable.ListBuffer.empty[ChurnLabel]
      batch.toSeq.sortBy(e => (e.wk, e.day)).foreach { e =>
        if (e.wk == s.wk)
          s = s.copy(nEvents = s.nEvents + 1L,
            days = if (s.days.contains(e.day)) s.days else s.days :+ e.day,
            spend = s.spend + e.cents)
        else if (e.wk > s.wk) {
          if (s.nEvents > 0L)
            out += ChurnLabel(user, s.wk, s.nEvents, s.days.size.toLong,
              s.spend, e.wk == s.wk + 1L)
          s = ChurnState(e.wk, 1L, Seq(e.day), e.cents)
        }
        // e.wk < s.wk: late event for a closed (possibly emitted) week —
        // dropped per the ordering contract above
      }
      state.update(s)
      out.iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Streaming Benford first-digit monitor — q177's counting stage kept
    * LIVE over an arriving (value) event stream: the fraud/synthetic-data
    * tripwire an ingestion pipeline wants watching spend as it lands, not
    * at the next batch audit. The aggregation IS the batch one
    * ([[graft.ops.Events.benfordCounts]] — single-sourced), so state is at
    * most NINE counters regardless of volume, there is no watermark to
    * tune (counters only grow), and the Complete-mode table equals the
    * batch counting stage on the same events bitwise (spec-pinned, two
    * waves). The freq/deviation decoration against [[graft.ops.Events]]'
    * Benford constants is a stateless 9-row read-side join — q177 itself —
    * kept OFF the stream so the stateful surface stays minimal. */
  def benfordStream(events: DataFrame): DataFrame =
    graft.ops.Events.benfordCounts(events)

  /** Streaming new-vs-returning monitor — q208's daily acquisition/
    * retention split kept LIVE: each user carries two Longs of state
    * (first day ever seen, last day opened); a newly-opened (user, day)
    * emits exactly one presence row tagged is_new = (day == first), and a
    * standing per-day aggregation folds the emissions into the q208
    * columns. Same-day tails fold into the open day (no re-emission), so
    * the Update-mode table equals batch q208 over any time-ordered prefix
    * (spec-pinned on real events split INSIDE a day).
    *
    * Ordering contract ([[sourceQuotaStream]]'s): day keys arrive
    * non-decreasing per user; an event from an EARLIER day landing in a
    * later micro-batch is dropped rather than reopening the day — a
    * reopened day would double-count presence, the exact failure the
    * contract exists to exclude (and the [[churnLabelStream]] guard
    * pattern). */
  def newReturningStream(events: Dataset[UserDay]): DataFrame = {
    import events.sparkSession.implicits._
    def fn(user: Long, batch: Iterator[UserDay],
           state: GroupState[NewRetState]): Iterator[DayPresence] = {
      var s = state.getOption
        .getOrElse(NewRetState(Long.MinValue, Long.MinValue))
      val out = scala.collection.mutable.ListBuffer.empty[DayPresence]
      batch.toSeq.sortBy(_.day).foreach { e =>
        if (s.firstDay == Long.MinValue) {
          s = NewRetState(e.day, e.day)
          out += DayPresence(e.day, is_new = true)
        } else if (e.day > s.lastDay) {
          s = s.copy(lastDay = e.day)
          out += DayPresence(e.day, is_new = false)
        } // same-day tail or late arrival: no new presence
      }
      state.update(s)
      out.iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"))
      .select(col("day"), col("n_active"), col("n_new"),
        (col("n_active") - col("n_new")).as("n_returning"),
        (col("n_new").cast("double") / col("n_active").cast("double"))
          .as("frac_new"))
  }

  /** Streaming split-leakage monitor — q196's counting stage kept LIVE
    * over an arriving near-dup EDGE stream against an IMMUTABLE split
    * roster (the refresh-law contract: a changed roster invalidates every
    * class's denominator, so the roster is a static side). Each edge is
    * classified by two stream-static doc-keyed joins and folded into the
    * unordered-class counters — at most SIX rows of state regardless of
    * volume, no watermark to tune (counters only grow). The Complete-mode
    * table equals the batch counting stage on the same edges bitwise
    * (spec-pinned, two waves — the q196 merge law live); the
    * share/expected/lift decoration stays OFF the stream, exactly as
    * [[benfordStream]] keeps q177's read-side math off its counters. */
  def splitLeakageStream(pairs: DataFrame, docs: DataFrame): DataFrame =
    graft.ops.TextOps.splitClassCounts(pairs,
      graft.ops.TextOps.splitTagOf(docs))

  /** The same sessionization via the BUILT-IN `session_window` aggregation —
    * Spark's native gap-session operator (merge-on-late-event, emit-on-seal
    * are handled by the engine's session-window state store). Kept alongside
    * [[sessionize]] as the compose-existing-ops formulation; the custom-state
    * version exists to cover the explicit-keyed-state operator class, and
    * `EventStreamsSpec` asserts the two emit identical sessions. */
  def sessionizeWindows(
      events: Dataset[Event],
      gapSec: Long = 1800L,
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapSec seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_timestamp(col("ts"))).as("start_s"),
        max(unix_timestamp(col("ts"))).as("end_s"))
      .select(col("user_id"), col("start_s"), col("end_s"), col("n_events"))

  /** Streaming order-cadence monitor — batch q224's gap rows
    * ([[graft.ops.Relational.orderGapsOn]]) kept LIVE: each customer
    * carries ONE (day, orderkey) state cell, and every further order
    * closes exactly one inter-order gap, emitted the moment it closes
    * (Append mode — a gap, once closed, never changes). The emitted row
    * set equals the batch gaps frame over any time-ordered prefix
    * (spec-pinned wave by wave); the rank-exact percentile readout stays
    * on the BATCH side, exactly as [[benfordStream]] keeps q177's
    * read-side math off its counters.
    *
    * Ordering contract ([[newReturningStream]]'s): per customer, arrivals
    * are non-decreasing under the (day, orderkey) total order; an order
    * from an EARLIER position landing in a later micro-batch is dropped
    * rather than closing a gap against the wrong anchor — and a replayed
    * duplicate of the CURRENT anchor is dropped too (at-least-once
    * delivery never re-emits a gap). */
  def orderGapStream(orders: Dataset[OrderArrival]): Dataset[OrderGap] = {
    def fn(cust: Long, batch: Iterator[OrderArrival],
           state: GroupState[LastOrder]): Iterator[OrderGap] = {
      var s = state.getOption.orNull
      val out = scala.collection.mutable.ListBuffer.empty[OrderGap]
      batch.toSeq.sortBy(a => (a.od, a.o_orderkey)).foreach { a =>
        if (s == null) s = LastOrder(a.od, a.o_orderkey)
        else if (a.od > s.day || (a.od == s.day && a.o_orderkey > s.okey)) {
          out += OrderGap(cust, a.o_orderkey, a.od - s.day)
          s = LastOrder(a.od, a.o_orderkey)
        } // late arrival or replayed duplicate: dropped (the contract)
      }
      state.update(s)
      out.iterator
    }
    import orders.sparkSession.implicits._
    orders.groupByKey(_.o_custkey)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
