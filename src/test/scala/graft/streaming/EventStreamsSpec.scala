package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.ops.Events
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, count, lag, lit, max, min, sum, unix_timestamp, when}
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Document stream record for the near-dedup spec. */
final case class Doc(ts: Timestamp, doc_id: Long, text: String)

class EventStreamsSpec extends AnyFunSuite with SparkSpec {

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  /** The library's 56-bit md5 prefix, in plain JVM form — the independent
    * reference the bucket-hash specs score against. */
  private def md56(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 14), 16)
  }

  test("tumbling window counts over a stream match the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val events = Seq(
      Event(ts(1), 1L, "view", 1.0), Event(ts(4), 1L, "view", 2.0),
      Event(ts(12), 2L, "click", 3.0), Event(ts(14), 1L, "view", 4.0),
      Event(ts(27), 2L, "view", 5.0))
    mem.addData(events: _*)

    val q = EventStreams.tumblingCounts(mem.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val got = spark.table("tumbling")
        .as[(Long, String, Long, Double)].collect().toSet
      val expected = EventStreams.tumblingCounts(events.toDF())
        .as[(Long, String, Long, Double)].collect().toSet
      assert(got === expected)
      assert(got.toSeq.map(_._3).sum === 5L)
    } finally q.stop()
  }

  test("file-source stream over the events table matches the batch query") {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val raw = spark.read.parquet(s"$dir/events.parquet")
    def normalize(df: org.apache.spark.sql.DataFrame) =
      graft.Tables.normalizeEventsTs(df)
    // the streaming file source needs a directory: stage the table file
    val staged = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("part-0.parquet"))
    val stream = spark.readStream.schema(raw.schema).parquet(staged.toString)
    val q = EventStreams.tumblingCounts(normalize(stream))
      .writeStream.format("memory").queryName("file_tumbling")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val got = spark.table("file_tumbling").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val expected = EventStreams.tumblingCounts(normalize(raw)).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("rolling-anomaly state carries across micro-batches; warm-up never flags") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[UserValue]
    def uv(id: Long, sec: Long, cents: Long) =
      UserValue(1L, id, sec * 1000000L, sec, cents)
    val q = EventStreams.rollingAnomalyStream(mem.toDS())
      .writeStream.format("memory").queryName("anomaly_stream")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: four steady values — under MinPrior, nothing may flag
      mem.addData(uv(1, 0, 1000), uv(2, 60, 1000), uv(3, 120, 1000),
        uv(4, 180, 1000))
      q.processAllAvailable()
      assert(spark.table("anomaly_stream").count() === 0L)
      // batch 2: two more steady values, then the spike — the six-value
      // window only exists if batch 1's buffer was recovered from state
      mem.addData(uv(5, 240, 1000), uv(6, 300, 1000), uv(7, 360, 5000))
      q.processAllAvailable()
      val got = spark.table("anomaly_stream")
        .as[AnomalyFlag].collect().toSeq
      assert(got === Seq(AnomalyFlag(1L, 7L, 360L, 5000L, 6L, 10.0)))
    } finally q.stop()
  }

  test("rolling-anomaly stream equals the batch q126 twin on time-ordered real events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = graft.Tables.normalizeEventsTs(spark.read.parquet(s"$sf/events.parquet"))
    // the batch twin's exact quantization, as stream arrivals
    val arrivals = raw
      .filter(col("value").isNotNull && col("user_id").isNotNull)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS ts_us",
        "unix_timestamp(ts) AS eps",
        "CAST(floor(value * 100.0D + 0.5D) AS BIGINT) AS cents")
      .as[UserValue].collect().sortBy(e => (e.ts_us, e.event_id))
    val mem = MemoryStream[UserValue]
    val q = EventStreams.rollingAnomalyStream(mem.toDS())
      .writeStream.format("memory").queryName("anomaly_twin")
      .outputMode(OutputMode.Append).start()
    try {
      // two time-split waves — the ordering contract's in-order arrival
      val (w1, w2) = arrivals.splitAt(arrivals.length / 2)
      mem.addData(w1.toSeq: _*); q.processAllAvailable()
      mem.addData(w2.toSeq: _*); q.processAllAvailable()
      val got = spark.table("anomaly_twin").as[AnomalyFlag].collect().toSet
      val expected = graft.ops.Events.q126RollingAnomaly(spark, sf).collect()
        .map(r => AnomalyFlag(r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
      graft.CachedFrames.drain()
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup drops within-watermark duplicate keys") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(ts(1), 1L, "view", 1.0), Event(ts(2), 1L, "view", 2.0), // dup key
      Event(ts(3), 2L, "view", 3.0), Event(ts(4), 1L, "click", 4.0))
    val q = EventStreams.dedupStream(mem.toDF(), Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val keys = spark.table("dedup_stream")
        .select("user_id", "event_type").as[(Long, String)].collect().toSet
      assert(keys === Set((1L, "view"), (2L, "view"), (1L, "click")))
      assert(spark.table("dedup_stream").count() === 3L)
    } finally q.stop()
  }

  test("streaming near-dedup drops token-permuted near-duplicates within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    mem.addData(
      Doc(ts(1), 1L, "alpha beta gamma delta"),
      // permuted + token-repeated: same distinct token set, same fingerprint
      Doc(ts(2), 2L, "delta gamma beta alpha alpha"),
      Doc(ts(3), 3L, "epsilon zeta eta theta"),
      Doc(ts(4), 4L, "epsilon zeta eta theta")) // exact duplicate
    val q = EventStreams.nearDedupStream(mem.toDF())
      .writeStream.format("memory").queryName("near_dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val ids = spark.table("near_dedup_stream")
        .select("doc_id").as[Long].collect().toSet
      assert(ids === Set(1L, 3L))
    } finally q.stop()
  }

  test("streaming source-quota admits first-k per source and matches the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val k = 3
    val mem = MemoryStream[SourceDoc]
    val q = EventStreams.sourceQuotaStream(mem.toDS(), k)
      .writeStream.format("memory").queryName("quota_stream")
      .outputMode(OutputMode.Append).start()
    try {
      // id-ordered across batch boundaries (the documented agreement
      // precondition); the counter must carry state ACROSS batches
      mem.addData(
        SourceDoc("crawl", 1L), SourceDoc("crawl", 2L), SourceDoc("books", 10L))
      q.processAllAvailable()
      mem.addData(
        SourceDoc("crawl", 3L), SourceDoc("crawl", 4L),
        SourceDoc("books", 11L), SourceDoc("books", 12L), SourceDoc("books", 13L))
      q.processAllAvailable()
      val got = spark.table("quota_stream").as[QuotaVerdict].collect()
        .map(v => (v.source, v.doc_id) -> v.admitted).toMap
      // batch twin on the same roster: first k doc_ids per source admit
      val expected = Map(
        ("crawl", 1L) -> true, ("crawl", 2L) -> true, ("crawl", 3L) -> true,
        ("crawl", 4L) -> false,
        ("books", 10L) -> true, ("books", 11L) -> true, ("books", 12L) -> true,
        ("books", 13L) -> false)
      assert(got === expected)
    } finally q.stop()
  }

  test("streaming source-quota under CROSS-BATCH out-of-order arrivals: " +
      "exactly k admitted per source (the relaxed arrival-order contract)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The documented agreement precondition (id-ordered across batch
    // boundaries) is deliberately violated here: later batches carry
    // SMALLER ids. The row-level verdicts then legitimately differ from
    // the batch twin's (the stream admits by arrival, the batch twin by
    // id), but the quota INVARIANT — exactly k admitted per source that
    // ever offers ≥ k documents, every verdict emitted exactly once —
    // must hold regardless of arrival order. Within each micro-batch,
    // admission is id-ordered (the sorted-buffer contract).
    val k = 2
    val mem = MemoryStream[SourceDoc]
    val q = EventStreams.sourceQuotaStream(mem.toDS(), k)
      .writeStream.format("memory").queryName("quota_ooo")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(SourceDoc("crawl", 7L), SourceDoc("crawl", 9L),
        SourceDoc("books", 20L))
      q.processAllAvailable()
      // out of order: ids BELOW everything already seen
      mem.addData(SourceDoc("crawl", 1L), SourceDoc("crawl", 2L),
        SourceDoc("books", 10L), SourceDoc("books", 11L))
      q.processAllAvailable()
      val got = spark.table("quota_ooo").as[QuotaVerdict].collect()
      // exactly one verdict per (source, doc_id)
      assert(got.length === got.map(v => (v.source, v.doc_id)).distinct.length)
      assert(got.length === 7)
      // the invariant: exactly k admitted per source, regardless of order
      val admitted = got.filter(_.admitted).groupBy(_.source)
        .view.mapValues(_.map(_.doc_id).toSet).toMap
      assert(admitted("crawl").size === k)
      assert(admitted("books").size === k)
      // first-arrival wins: batch-1 docs hold their grants even though
      // batch 2 brought smaller ids (crawl's quota was full; books had one
      // slot left, which goes to batch 2's smallest id)
      assert(admitted("crawl") === Set(7L, 9L))
      assert(admitted("books") === Set(20L, 10L))
    } finally q.stop()
  }

  test("checkpoint restart: the quota stream's per-source counters survive — " +
      "wave 2 resumes against wave 1's admitted count") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    // the keyed-STATE recovery contract (the admission restart specs cover
    // stateless probes): flatMapGroupsWithState counters live in the state
    // store, so a stopped query restarted over the same checkpoint must
    // grant wave 2 exactly the REMAINING quota, not a fresh one
    val k = 3
    val staged = java.nio.file.Files.createTempDirectory("quota-restart")
    val ckpt = java.nio.file.Files.createTempDirectory("quota-restart-ckpt")
    val outDir = java.nio.file.Files.createTempDirectory("quota-restart-out")
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(Seq(("", 0L)).toDF("source", "doc_id").schema)
        .parquet(staged.toString).as[SourceDoc]
      val q = EventStreams.sourceQuotaStream(stream, k)
        .writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    Seq(("crawl", 1L), ("crawl", 2L)).toDF("source", "doc_id")
      .coalesce(1).write.mode("append").parquet(staged.toString)
    runOnce() // wave 1: 2 of 3 grants spent
    Seq(("crawl", 3L), ("crawl", 4L)).toDF("source", "doc_id")
      .coalesce(1).write.mode("append").parquet(staged.toString)
    runOnce() // wave 2 must see count=2 in recovered state
    val got = spark.read.parquet(outDir.toString).collect()
      .map(r => r.getLong(1) -> r.getBoolean(2)).toMap
    assert(got === Map(1L -> true, 2L -> true, 3L -> true, 4L -> false))
  }

  test("streaming token-budget admission matches the q99 batch cutoff and " +
      "carries the token counter across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val budget = 10L
    val batch1 = Seq(WeightedDoc("crawl", 1L, 4L), WeightedDoc("crawl", 2L, 5L),
      WeightedDoc("books", 10L, 9L))
    val batch2 = Seq(WeightedDoc("crawl", 3L, 2L), WeightedDoc("crawl", 4L, 1L),
      WeightedDoc("books", 11L, 1L), WeightedDoc("books", 12L, 5L))
    val mem = MemoryStream[WeightedDoc]
    val q = EventStreams.tokenBudgetStream(mem.toDS(), budget)
      .writeStream.format("memory").queryName("token_budget")
      .outputMode(OutputMode.Append).start()
    val got = try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      spark.table("token_budget").as[QuotaVerdict].collect()
        .map(v => (v.source, v.doc_id) -> v.admitted).toMap
    } finally q.stop()
    // the batch twin over the same roster, via the SAME q99 core
    val expected = graft.ops.Curation.tokenBudgetOn(
      (batch1 ++ batch2).toDF(), budget)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getBoolean(3)).toMap
    assert(got === expected)
    // the crossing doc admits in full (books 10: pre-sum 9 < 10 at 9
    // tokens), the next is rejected even though it is tiny (a cutoff, not
    // bin packing), and crawl's counter carried 9 tokens into batch 2
    assert(got(("books", 10L)) && got(("books", 11L)) && !got(("books", 12L)))
    assert(got(("crawl", 3L)) && !got(("crawl", 4L)))
  }

  test("streaming token-budget under CROSS-BATCH out-of-order arrivals: " +
      "verdicts follow arrival order, the counter never resets") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Same relaxed contract as the quota twin: grants follow ARRIVAL order
    // (id-sorted within each micro-batch), are never revoked, and every
    // doc's tokens hit the counter whether admitted or not. The expected
    // verdicts are recomputed here from the deterministic arrival order.
    val budget = 10L
    val batches = Seq(
      Seq(WeightedDoc("crawl", 7L, 6L), WeightedDoc("crawl", 9L, 3L)),
      // out of order: smaller ids arrive after larger ones
      Seq(WeightedDoc("crawl", 1L, 5L), WeightedDoc("crawl", 2L, 1L)))
    val arrivalOrder = batches.flatMap(_.sortBy(_.doc_id))
    var used = 0L
    val expected = arrivalOrder.map { d =>
      val admit = used < budget
      used += d.n_tokens
      (d.source, d.doc_id) -> admit
    }.toMap
    val mem = MemoryStream[WeightedDoc]
    val q = EventStreams.tokenBudgetStream(mem.toDS(), budget)
      .writeStream.format("memory").queryName("token_budget_ooo")
      .outputMode(OutputMode.Append).start()
    val got = try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table("token_budget_ooo").as[QuotaVerdict].collect()
        .map(v => (v.source, v.doc_id) -> v.admitted).toMap
    } finally q.stop()
    assert(got === expected)
    // the batch-2 small ids did NOT reclaim batch-1's spent budget: doc 1
    // (5 tokens) arrives with 9 already spent — admitted as the crossing
    // doc — and doc 2 is rejected even though it is tiny
    assert(got(("crawl", 1L)) && !got(("crawl", 2L)))
  }

  test("stream-stream attribution join pairs clicks with in-horizon views only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(ts(1), 1L, "view", 10.0),  // joins the 10:05 click (4 min gap)
      Event(ts(5), 1L, "click", 0.0),
      Event(ts(15), 1L, "click", 0.0), // 14 min after the view: outside horizon
      Event(ts(10), 2L, "view", 20.0),
      Event(ts(12), 2L, "click", 0.0), // same-user, in horizon
      Event(ts(2), 3L, "click", 0.0))  // no view at all
    val q = EventStreams.attributionJoin(mem.toDF(), horizonSec = 600L)
      .writeStream.format("memory").queryName("attribution")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val got = spark.table("attribution")
        .as[(Long, Long, Long, Double)].collect().toSet
      def s(minute: Int) = ts(minute).getTime / 1000L
      assert(got === Set(
        (1L, s(5), s(1), 10.0),
        (2L, s(12), s(10), 20.0)))
    } finally q.stop()
  }

  test("file-source stream attribution join matches the batch twin on the events table") {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val raw = spark.read.parquet(s"$dir/events.parquet")
    def normalize(df: org.apache.spark.sql.DataFrame) =
      graft.Tables.normalizeEventsTs(df)
    val staged = java.nio.file.Files.createTempDirectory("events-join-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("part-0.parquet"))
    val stream = spark.readStream.schema(raw.schema).parquet(staged.toString)
    val q = EventStreams.attributionJoin(normalize(stream))
      .writeStream.format("memory").queryName("file_attribution")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val got = spark.table("file_attribution").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val expected = EventStreams.attributionJoin(normalize(raw)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("stateful sessionization emits sessions once the watermark seals them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // user 1: two sessions split by a >30min gap inside one batch;
    // the second session is the open tail (stays in state).
    mem.addData(
      Event(ts(0), 1L, "view", 1.0), Event(ts(5), 1L, "view", 1.0),
      Event(ts(50), 1L, "view", 1.0),
      Event(ts(2), 2L, "click", 1.0))

    val q = EventStreams.sessionize(mem.toDS(), gapSec = 1800L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      // nothing emitted yet: the watermark (10:20) has not passed any
      // session's end + gap, so a late event could still extend them
      assert(spark.table("sessions").as[Session].collect().isEmpty)

      // push the watermark far forward: all sessions seal and flush
      mem.addData(Event(Timestamp.valueOf("2024-01-01 13:00:00"), 3L, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Event(Timestamp.valueOf("2024-01-01 15:00:00"), 3L, "view", 1.0))
      q.processAllAvailable()
      val all = spark.table("sessions").as[Session].collect().toSet
      assert(all.contains(Session(1L, ts(0).getTime / 1000, ts(5).getTime / 1000, 2L)))
      assert(all.contains(Session(1L, ts(50).getTime / 1000, ts(50).getTime / 1000, 1L)),
        s"open tail session not flushed: $all")
      assert(all.contains(Session(2L, ts(2).getTime / 1000, ts(2).getTime / 1000, 1L)))
    } finally q.stop()
  }

  test("custom-state sessionize agrees with the built-in session_window formulation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Event(ts(0), 1L, "view", 1.0), Event(ts(5), 1L, "view", 1.0),
      Event(ts(50), 1L, "view", 1.0), Event(ts(55), 1L, "click", 1.0),
      Event(ts(2), 2L, "click", 1.0), Event(ts(59), 2L, "view", 1.0))
    val far = Seq( // watermark pushers on an unrelated key
      Event(Timestamp.valueOf("2024-01-01 15:00:00"), 9L, "view", 1.0),
      Event(Timestamp.valueOf("2024-01-01 18:00:00"), 9L, "view", 1.0))

    def run(name: String, mk: MemoryStream[Event] => org.apache.spark.sql.DataFrame):
        Set[(Long, Long, Long, Long)] = {
      val mem = MemoryStream[Event]
      mem.addData(events: _*)
      val q = mk(mem).writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        q.processAllAvailable()
        far.foreach { e => mem.addData(e); q.processAllAvailable() }
        spark.table(name).as[(Long, Long, Long, Long)].collect().toSet
          .filter(_._1 != 9L) // drop the watermark-pusher key
      } finally q.stop()
    }

    val custom = run("agree_custom",
      m => EventStreams.sessionize(m.toDS()).toDF()
        .select("user_id", "start_s", "end_s", "n_events"))
    val builtin = run("agree_builtin", m => EventStreams.sessionizeWindows(m.toDS()))
    assert(custom === builtin)
    assert(custom.nonEmpty)
  }

  test("randomized out-of-order stream agrees with the batch sessionization") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // random events for a handful of users, delivered across batches in a
    // RANDOM order that still respects the watermark (each batch's stragglers
    // stay within 30 min of the running max event time)
    val rnd = new scala.util.Random(647)
    def at(minute: Int) =
      Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")
    val all = (1 to 60).map { _ =>
      // ~10h span, ~40-min mean per-user gaps ⇒ plenty of >30-min session splits
      Event(at(rnd.nextInt(600)), 1L + rnd.nextInt(4), "view", 1.0)
    }
    // deliver in an order perturbed ±10 min from event time: intra-batch
    // disorder AND cross-batch late events, but every event stays within the
    // 30-min watermark (max disorder 20 min), so none are dropped
    val batches = all
      .sortBy(e => e.ts.getTime + (rnd.nextInt(1201) - 600) * 1000L)
      .grouped(25).toSeq

    val mem = MemoryStream[Event]
    val q = EventStreams.sessionize(mem.toDS(), gapSec = 1800L)
      .writeStream.format("memory").queryName("sessions_rand")
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      // seal everything with far-future watermark pushers
      mem.addData(Event(Timestamp.valueOf("2024-01-02 10:00:00"), 99L, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Event(Timestamp.valueOf("2024-01-02 20:00:00"), 99L, "view", 1.0))
      q.processAllAvailable()
      val streamed = spark.table("sessions_rand").as[Session].collect()
        .filter(_.user_id != 99L)
        .map(s => (s.user_id, s.start_s, s.end_s, s.n_events)).toSet

      // batch twin over the same admitted events (none were dropped: the
      // delivery order above never violates the watermark)
      val batch = all.toDF()
        .withColumn("eps", unix_timestamp(col("ts")))
        .withColumn("gap", col("eps") - lag(col("eps"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id")).orderBy(col("eps"))))
        .withColumn("is_new", when(col("gap") > 1800, 1).otherwise(0))
        .withColumn("sess", sum(col("is_new")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id")).orderBy(col("eps"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("sess"))
        .agg(min(col("eps")).as("start_s"), max(col("eps")).as("end_s"),
          count(lit(1)).as("n_events"))
        .select("user_id", "start_s", "end_s", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet

      assert(streamed === batch)
      assert(streamed.size > 4)
    } finally q.stop()
  }

  test("streaming admission verdicts agree with the batch incremental-dedup twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "one two three four five six seven")).toDF("doc_id", "text")
    val inputs = Seq(
      (1L, "  Alpha beta GAMMA delta epsilon zeta "), // equals 10 after lower+trim
      (2L, "two one three four five six seven six"),  // token-set equal to 11 -> near
      (3L, "totally disjoint vocabulary words here")) // new
    def toMapped(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => r.getLong(0) -> ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))))
      .toMap
    val mem = MemoryStream[Doc]
    mem.addData(inputs.map { case (id, text) => Doc(ts(id.toInt), id, text) }: _*)
    val q = EventStreams.admissionStream(mem.toDF(), corpus)
      .writeStream.format("memory").queryName("admission_stream")
      .outputMode(OutputMode.Append).start()
    val got = try {
      q.processAllAvailable()
      toMapped(spark.table("admission_stream")
        .select("doc_id", "verdict", "match_id").collect())
    } finally q.stop()
    assert(got === Map(
      1L -> (("dup_exact", 10L)),
      2L -> (("dup_near", 11L)),
      3L -> (("new", -1L))))
    // the batch twin returns the same verdicts on identical inputs — the
    // two formulations share the digest, fingerprint, banding and Hamming
    // bound, so they must agree row for row
    val batch = toMapped(graft.ops.Curation
      .incrementalDedupOn(inputs.toDF("doc_id", "text"), corpus)
      .select("doc_id", "verdict", "match_id").collect())
    graft.CachedFrames.drain()
    assert(batch === got)
  }

  test("AvailableNow file-source admission run equals the q71 batch output on sf0.01") {
    import org.apache.spark.sql.functions.{col, lit, to_timestamp}
    import org.apache.spark.sql.streaming.Trigger
    // the real gate slice: src0 is the arriving crawl batch, the other
    // sources are the standing corpus — exactly q71's split
    val dir = "/root/testdata/sf0.01"
    val raw = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val batchDocs = raw.filter(col("source") === "src0").drop("source")
      .withColumn("ts", to_timestamp(lit("2024-01-01 10:00:00")))
    val corpus = raw.filter(col("source") =!= "src0").drop("source")
    val staged = java.nio.file.Files.createTempDirectory("admission-e2e")
    batchDocs.coalesce(1).write.mode("overwrite").parquet(staged.toString)
    val stream = spark.readStream.schema(batchDocs.schema).parquet(staged.toString)
    def toMapped(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val q = EventStreams.admissionStream(stream, corpus)
      .writeStream.format("memory").queryName("admission_e2e")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    val got = try {
      q.awaitTermination()
      toMapped(spark.table("admission_e2e")
        .select("doc_id", "verdict", "match_id").collect())
    } finally q.stop()
    val expected = toMapped(graft.ops.Curation.q71IncrementalDedup(spark, dir)
      .select("doc_id", "verdict", "match_id").collect())
    graft.CachedFrames.drain()
    assert(got === expected)
    assert(got.size === 25 && got.exists(_._2 == "dup_near"))
  }

  test("ingestion loop maintains the index across batches: a later exact copy " +
    "of an earlier ADMITTED doc is caught — what the static-index stream cannot do") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ingest-loop")
    val (indexDir, verdictsDir, inDir, ckpt) = (s"$root/idx", s"$root/verdicts",
      s"$root/in", s"$root/ckpt")
    // standing corpus: one doc; its index is the starting state
    val corpus = Seq((100L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val (d0, b0) = graft.ops.Curation.corpusIndexFrames(corpus)
    d0.write.parquet(s"$indexDir/digests")
    b0.write.parquet(s"$indexDir/bands")
    val schema = corpus.schema
    def runAvailable(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(inDir)
      val q = EventStreams.admissionIngestStream(stream, indexDir, verdictsDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    // batch 1: one corpus dup, one brand-new doc
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    Seq((1L, "zeta eta theta iota kappa"), (2L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    runAvailable()
    // batch 2: an EXACT COPY of batch 1's admitted doc 2, plus a fresh doc
    Seq((3L, "alpha beta gamma delta epsilon"), (4L, "mu nu xi omicron pi rho"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    runAvailable()
    val verdicts = spark.read.parquet(verdictsDir)
      .select(col("doc_id"), col("verdict"), col("match_id")).collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(verdicts(1L) === (("dup_exact", 100L)))
    assert(verdicts(2L) === (("new", -1L)))
    // the loop's defining property: doc 3 matches doc 2 via the EXTENDED
    // index (the static-index stream would have admitted it as new)
    assert(verdicts(3L) === (("dup_exact", 2L)))
    assert(verdicts(4L) === (("new", -1L)))
    // and the index itself grew by exactly the admitted docs
    val cids = spark.read.parquet(s"$indexDir/digests")
      .select("cid").as[Long].collect().toSet
    assert(cids === Set(100L, 2L, 4L))
  }

  test("substring ingestion loop: a later batch quoting an EARLIER batch's " +
    "passage is caught via the extended gram index, each batch plan " +
    "equals the batch-vs-standing-corpus law, fresh docs pass intact") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("substr-loop")
    val (indexDir, plansDir, inDir, ckpt) =
      (s"$root/gidx", s"$root/plans", s"$root/in", s"$root/ckpt")
    def phrase(p: String) = (1 to 9).map(i => s"$p$i").mkString(" ")
    // standing corpus: one doc whose passage batch 1 will quote
    val base = Seq((100L, phrase("b"))).toDF("doc_id", "text")
    // seed in the family's writer-attributed (doc_id, gram) postings schema
    graft.ops.TextOps.substrIndexPostingsFrame(base)
      .write.parquet(s"$indexDir/grams")
    val schema = base.schema
    def runAvailable(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(inDir)
      val q = EventStreams.substrIngestStream(stream, indexDir, plansDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    // batch 1: a base quote (flagged vs the seeded index) + a fresh passage
    val b1 = Seq((200L, s"x ${phrase("b")} y"), (201L, phrase("f")))
    b1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    runAvailable()
    // batch 2: quotes BATCH 1's fresh passage — only the extended index
    // can catch this — plus its own fresh doc
    val b2 = Seq((300L, s"u ${phrase("f")} v"), (301L, phrase("g")))
    b2.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    runAvailable()
    val plans = spark.read.parquet(plansDir)
      .select(col("doc_id"), col("n_tokens"), col("n_removed")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(plans(200L) === ((11L, 9L))) // base quote stripped
    assert(plans(201L) === ((9L, 0L)))  // fresh at arrival time
    assert(plans(300L) === ((11L, 9L))) // batch-1 quote caught via extension
    assert(plans(301L) === ((9L, 0L)))
    // law per batch: batch 2's plan ≡ the batch plan on (base ∪ b1 ∪ b2)
    // restricted to b2 (the standing corpus at its arrival)
    val all = base.union(b1.toDF("doc_id", "text"))
      .union(b2.toDF("doc_id", "text"))
    val unionPlan = graft.ops.TextOps.substrDedupOn(all)
      .filter(col("doc_id") >= 300L)
      .select(col("doc_id"), col("n_tokens"), col("n_removed")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    graft.CachedFrames.drain()
    assert(plans.view.filterKeys(_ >= 300L).toMap === unionPlan)
    // and the grown index equals the from-scratch index of everything
    // (postings compared as (doc_id, gram) row sets — appends are pure
    // row unions of per-doc derivations, so no distinct is needed)
    val grown = spark.read.parquet(s"$indexDir/grams")
      .collect().map(_.toSeq).toSet
    val full = graft.ops.TextOps.substrIndexPostingsFrame(all)
      .collect().map(_.toSeq).toSet
    graft.CachedFrames.drain()
    assert(grown === full)
  }

  test("graph ingestion loop: each batch's incident edges equal the " +
    "batch-vs-standing-corpus law, a later batch's containment of an " +
    "EARLIER batch's doc is caught via the appended postings, and the " +
    "grown postings equal the from-scratch winnowing") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graph-loop")
    val (indexDir, edgesDir, inDir, ckpt) =
      (s"$root/gx", s"$root/edges", s"$root/in", s"$root/ckpt")
    def phrase(p: String) = (1 to 9).map(i => s"$p$i").mkString(" ")
    // standing corpus: one doc whose run batch 1 will contain
    val base = Seq((100L, phrase("b"))).toDF("doc_id", "text")
    graft.ops.TextOps.graphIndexFps(base).write.parquet(s"$indexDir/fps")
    graft.CachedFrames.drain()
    val schema = base.schema
    def runAvailable(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(inDir)
      val q = EventStreams.graphIngestStream(stream, indexDir, edgesDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    // batch 1: contains the base doc's run + a fresh doc
    val b1 = Seq((200L, s"x1 x2 ${phrase("b")} x3"), (201L, phrase("f")))
    b1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    runAvailable()
    // batch 2: contains BATCH 1's fresh doc — only the appended postings
    // can catch this — plus its own fresh doc
    val b2 = Seq((300L, s"u1 ${phrase("f")} u2"), (301L, phrase("g")))
    b2.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    runAvailable()
    def edgeSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id1"), col("id2"), col("n_shared"), col("contain1"),
        col("contain2"))
      .collect().map(_.toSeq).toSet
    val all = base.union(b1.toDF("doc_id", "text"))
      .union(b2.toDF("doc_id", "text"))
    // law per batch: batch k's edges ≡ containment over the standing
    // corpus at its arrival, restricted to batch-incident pairs
    val e1 = edgeSet(spark.read.parquet(s"$edgesDir/batch=0"))
    val t1 = try edgeSet(graft.ops.TextOps.containmentOn(
        base.union(b1.toDF("doc_id", "text")))
        .filter(col("id2") >= 200L))
      finally graft.CachedFrames.drain()
    assert(e1 === t1)
    assert(e1.exists(r => r.head == 100L && r(1) == 200L)) // base containment
    val e2 = edgeSet(spark.read.parquet(s"$edgesDir/batch=1"))
    val t2 = try edgeSet(graft.ops.TextOps.containmentOn(all)
        .filter(col("id2") >= 300L))
      finally graft.CachedFrames.drain()
    assert(e2 === t2)
    assert(e2.exists(r => r.head == 201L && r(1) == 300L)) // cross-batch
    // grown postings ≡ from-scratch winnowing of everything
    val grown = spark.read.parquet(s"$indexDir/fps")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = try graft.ops.TextOps.graphIndexFps(all)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      finally graft.CachedFrames.drain()
    assert(grown === full)
  }

  test("graph ingestion loop maintains a FULL standing edge artifact: " +
    "applying each batch's retirement patch and unioning its incident " +
    "edges reproduces the from-scratch edge list of the grown corpus, " +
    "batch after batch, at a binding fixture cap") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graph-artifact")
    val (indexDir, edgesDir, patchesDir, inDir, ckpt) =
      (s"$root/gx", s"$root/edges", s"$root/patches", s"$root/in",
        s"$root/ckpt")
    def phrase(p: String) = (1 to 9).map(i => s"$p$i").mkString(" ")
    val (toks, gA, gB) = {
      // reuse GraphIndexSpec's deterministic 7-token fixture search
      val pool = (0 until 40).map(i => s"t$i")
      def h56(s: String): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.substring(0, 14), 16)
      }
      pool.combinations(7).flatMap(_.permutations).map { t =>
        val grams = (0 to 4).map(i => t.slice(i, i + 3).mkString(" "))
        val hs = grams.map(h56)
        if (hs.slice(0, 4).min == hs(0) && hs.slice(1, 5).min == hs(4) &&
            hs(0) != hs(4)) Some((t, grams(0), grams(4))) else None
      }.collectFirst { case Some(v) => v }.get
    }
    val base = Seq((1L, toks.mkString(" ")), (2L, gA), (3L, gB))
      .toDF("doc_id", "text")
    graft.ops.TextOps.graphIndexFps(base).write.parquet(s"$indexDir/fps")
    graft.CachedFrames.drain()
    val schema = base.schema
    def runAvailable(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(inDir)
      val q = EventStreams.graphIngestStream(stream, indexDir, edgesDir,
          Some(patchesDir), dfCap = 2, minShared = 1)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    def edgeSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id1"), col("id2"), col("n_shared"), col("contain1"),
        col("contain2")).collect().map(_.toSeq).toSet
    // batch 1: D10 = gA pushes A over the cap — the patch must RETIRE
    // (1,2) and re-price (1,3); the batch itself contributes no edges
    // (its only fingerprint crossed)
    Seq((10L, gA)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(inDir)
    runAvailable()
    var artifact = try edgeSet(graft.ops.TextOps.containmentFromPostings(
        graft.ops.TextOps.graphIndexFps(base), dfCap = 2, minShared = 1))
      finally graft.CachedFrames.drain()
    def applyBatch(id: Long, corpus: org.apache.spark.sql.DataFrame): Unit = {
      val patch = spark.read.parquet(s"$patchesDir/patch_batch=$id")
      val standing = artifact.toSeq.map(r => (r(0).asInstanceOf[Long],
        r(1).asInstanceOf[Long], r(2).asInstanceOf[Long],
        r(3).asInstanceOf[Double], r(4).asInstanceOf[Double]))
        .toDF("id1", "id2", "n_shared", "contain1", "contain2")
      artifact = edgeSet(graft.ops.TextOps.applyGraphEdgePatch(standing,
        patch)) ++ edgeSet(spark.read.parquet(s"$edgesDir/batch=$id"))
      val refresh = try edgeSet(graft.ops.TextOps.containmentFromPostings(
          graft.ops.TextOps.graphIndexFps(corpus), dfCap = 2, minShared = 1))
        finally graft.CachedFrames.drain()
      assert(artifact === refresh, s"artifact law after batch $id")
    }
    val c1 = base.union(Seq((10L, gA)).toDF("doc_id", "text"))
    applyBatch(0L, c1)
    // batch 2: D11 = gB retires the LAST base edge; D12/D13 bring a fresh
    // shared trigram — the artifact ends as exactly their pair
    Seq((11L, gB), (12L, "u1 u2 u3"), (13L, "u1 u2 u3"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    runAvailable()
    val c2 = c1.union(Seq((11L, gB), (12L, "u1 u2 u3"), (13L, "u1 u2 u3"))
      .toDF("doc_id", "text"))
    applyBatch(1L, c2)
    assert(artifact === Set(Seq(12L, 13L, 1L, 1.0, 1.0)))
  }

  test("graph ingestion replay is idempotent: a half-committed postings " +
    "append is excluded by the batch doc_id anti-join, so the replayed " +
    "batch's edges equal the first attempt's against the pre-batch index") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graph-replay")
    val (indexDir, edgesDir, inDir) = (s"$root/gx", s"$root/edges", s"$root/in")
    def phrase(p: String) = (1 to 9).map(i => s"$p$i").mkString(" ")
    val base = Seq((100L, phrase("b"))).toDF("doc_id", "text")
    graft.ops.TextOps.graphIndexFps(base).write.parquet(s"$indexDir/fps")
    val b1 = Seq((200L, s"x1 x2 ${phrase("b")} x3"), (201L, phrase("f")))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    b1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    // simulate the failed first attempt: its postings append SUCCEEDED but
    // the checkpoint commit did not — the standing index already contains
    // the batch's own docs when the replay arrives
    graft.ops.TextOps.graphIndexFps(b1.toDF("doc_id", "text"))
      .write.mode("append").parquet(s"$indexDir/fps")
    graft.CachedFrames.drain()
    val ckpt = java.nio.file.Files.createTempDirectory("graph-replay-ckpt")
    val stream = spark.readStream.schema(base.schema).parquet(inDir)
    val q = EventStreams.graphIngestStream(stream, indexDir, edgesDir)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    def edgeSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id1"), col("id2"), col("n_shared"), col("contain1"),
        col("contain2"))
      .collect().map(_.toSeq).toSet
    // the replay's edges must equal the admission against the PRE-BATCH
    // index — self-inclusion would double every batch fingerprint's df
    // and price each batch doc in both denominator branches
    val replayed = edgeSet(spark.read.parquet(s"$edgesDir/batch=0"))
    val law = try edgeSet(graft.ops.TextOps.containmentOn(
        base.union(b1.toDF("doc_id", "text")))
        .filter(col("id2") >= 200L))
      finally graft.CachedFrames.drain()
    assert(replayed === law)
    assert(replayed.exists(r => r.head == 100L && r(1) == 200L))
    // and the grown postings stay exact under distinct() despite the
    // duplicate append the replay itself added
    val grown = spark.read.parquet(s"$indexDir/fps").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = try graft.ops.TextOps.graphIndexFps(
        base.union(b1.toDF("doc_id", "text")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      finally graft.CachedFrames.drain()
    assert(grown === full)
  }

  test("lsh ingestion loop: each batch's incident candidates equal the " +
    "batch-vs-standing-corpus law, a later batch's copy of an EARLIER " +
    "batch's doc is caught via the appended sig/band rows, and the grown " +
    "index equals the from-scratch build") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("lsh-loop")
    val (indexDir, candsDir, inDir, ckpt) =
      (s"$root/lx", s"$root/cands", s"$root/in", s"$root/ckpt")
    def phrase(p: String) = (1 to 9).map(i => s"$p$i").mkString(" ")
    val base = Seq((100L, phrase("b"))).toDF("doc_id", "text")
    graft.ops.IndexFamily.write(indexDir,
      graft.ops.LshBandIndexFamily.build(base), graft.ops.LshBandIndexFamily)
    graft.CachedFrames.drain()
    val schema = base.schema
    def runAvailable(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(inDir)
      val q = EventStreams.lshIngestStream(stream, indexDir, candsDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    val b1 = Seq((200L, phrase("b")), (201L, phrase("f")))
    b1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    runAvailable()
    val b2 = Seq((300L, phrase("f")), (301L, phrase("g")))
    b2.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    runAvailable()
    def pairSeq(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id1"), col("id2"), col("n_shared_bands"),
        col("est_jaccard"), col("true_jaccard"))
      .collect().map(_.toSeq).toVector.sortBy(_.toString)
    val all = base.union(b1.toDF("doc_id", "text"))
      .union(b2.toDF("doc_id", "text"))
    val c1 = pairSeq(spark.read.parquet(s"$candsDir/batch=0"))
    val t1 = try pairSeq(graft.ops.NearDup.lshPairsOn(
        base.union(b1.toDF("doc_id", "text")))
        .filter(col("id1") >= 200L || col("id2") >= 200L))
      finally graft.CachedFrames.drain()
    assert(c1 === t1)
    assert(c1.exists(r => r.head == 100L && r(1) == 200L)) // base copy
    val c2 = pairSeq(spark.read.parquet(s"$candsDir/batch=1"))
    val t2 = try pairSeq(graft.ops.NearDup.lshPairsOn(all)
        .filter(col("id1") >= 300L || col("id2") >= 300L))
      finally graft.CachedFrames.drain()
    assert(c2 === t2)
    assert(c2.exists(r => r.head == 201L && r(1) == 300L)) // cross-batch
    // grown index ≡ from-scratch build of everything
    val full = graft.ops.LshBandIndexFamily.build(all)
    try {
      assert(spark.read.parquet(s"$indexDir/bands").distinct()
        .collect().map(_.toSeq).toSet ===
        full("bands").collect().map(_.toSeq).toSet)
      assert(spark.read.parquet(s"$indexDir/sig").distinct()
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet ===
        full("sig").select(col("doc_id")).collect().map(_.getLong(0)).toSet)
    } finally graft.CachedFrames.drain()
  }

  test("lsh ingestion replay is idempotent: a half-committed sig/band " +
    "append is excluded by the doc_id anti-join, so the replayed batch's " +
    "candidates carry no duplicate join-back rows") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("lsh-replay")
    val (indexDir, candsDir, inDir) = (s"$root/lx", s"$root/cands", s"$root/in")
    def phrase(p: String) = (1 to 9).map(i => s"$p$i").mkString(" ")
    val base = Seq((100L, phrase("b"))).toDF("doc_id", "text")
    graft.ops.IndexFamily.write(indexDir,
      graft.ops.LshBandIndexFamily.build(base), graft.ops.LshBandIndexFamily)
    val b1 = Seq((200L, phrase("b")), (201L, phrase("f")))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    b1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    // the failed first attempt appended its rows; its commit did not land —
    // without the anti-join the duplicated signature rows would DOUBLE
    // every candidate row through the sig join-backs
    val bt = graft.ops.LshBandIndexFamily.build(b1.toDF("doc_id", "text"))
    bt("sig").write.mode("append").parquet(s"$indexDir/sig")
    bt("bands").write.mode("append").parquet(s"$indexDir/bands")
    graft.CachedFrames.drain()
    val ckpt = java.nio.file.Files.createTempDirectory("lsh-replay-ckpt")
    val stream = spark.readStream.schema(base.schema).parquet(inDir)
    val q = EventStreams.lshIngestStream(stream, indexDir, candsDir)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    def pairSeq(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id1"), col("id2"), col("n_shared_bands"),
        col("est_jaccard"), col("true_jaccard"))
      .collect().map(_.toSeq).toVector.sortBy(_.toString)
    val replayed = pairSeq(spark.read.parquet(s"$candsDir/batch=0"))
    val law = try pairSeq(graft.ops.NearDup.lshPairsOn(
        base.union(b1.toDF("doc_id", "text")))
        .filter(col("id1") >= 200L || col("id2") >= 200L))
      finally graft.CachedFrames.drain()
    assert(replayed === law)
  }

  test("tombstones reach the ingestion loops: a tombstoned doc stops " +
    "matching on the very next lsh micro-batch without any artifact " +
    "rewrite, survivors keep matching") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("lsh-tomb")
    val (indexDir, candsDir, inDir) = (s"$root/lx", s"$root/cands", s"$root/in")
    def phrase(p: String) = (1 to 9).map(i => s"$p$i").mkString(" ")
    val base = Seq((100L, phrase("b")), (101L, phrase("f")))
      .toDF("doc_id", "text")
    graft.ops.IndexFamily.write(indexDir,
      graft.ops.LshBandIndexFamily.build(base), graft.ops.LshBandIndexFamily)
    graft.CachedFrames.drain()
    // the GDPR delete: ONE appended id — sig/bands untouched on disk
    Seq(100L).toDF("doc_id").write.parquet(s"$indexDir/tombstones")
    val b1 = Seq((200L, phrase("b")), (201L, phrase("f")))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    b1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    val ckpt = java.nio.file.Files.createTempDirectory("lsh-tomb-ckpt")
    val stream = spark.readStream.schema(base.schema).parquet(inDir)
    val q = EventStreams.lshIngestStream(stream, indexDir, candsDir)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val pairs = spark.read.parquet(s"$candsDir/batch=0")
      .select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CachedFrames.drain()
    // doc 100 is deleted: its copy (200) must not pair with it; the
    // surviving 101 still catches ITS copy (201)
    assert(!pairs.exists(p => p._1 == 100L || p._2 == 100L))
    assert(pairs.contains((101L, 201L)))
    // and nothing rewrote the artifact: the tombstoned rows are still there
    assert(spark.read.parquet(s"$indexDir/sig")
      .filter(col("doc_id") === 100L).count() > 0)
  }

  test("tombstones reach the vector loop: batch verdicts equal the " +
    "admission law against the survivors' cells under the frozen codebook") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("vec-tomb")
    val (indexDir, verdictsDir, inDir) =
      (s"$root/vx", s"$root/verdicts", s"$root/in")
    val raw = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val b1 = raw.filter(col("vec_id") < 40)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    b1.coalesce(1).write.mode("append").parquet(inDir)
    val ckpt1 = java.nio.file.Files.createTempDirectory("vec-tomb-ckpt1")
    val q1 = EventStreams.vectorIngestStream(
        spark.readStream.schema(raw.schema).parquet(inDir),
        indexDir, verdictsDir)
      .option("checkpointLocation", ckpt1.toString)
      .trigger(Trigger.AvailableNow()).start()
    try q1.awaitTermination() finally q1.stop()
    Seq(7L).toDF("vec_id").write.parquet(s"$indexDir/tombstones")
    // batch 2 carries an exact copy of the DELETED vector 7 — without the
    // tombstone it would be dup_semantic at cosine 1 against 7
    val b2 = raw.filter(col("vec_id") === 7L)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    b2.coalesce(1).write.mode("append").parquet(inDir)
    val q2 = EventStreams.vectorIngestStream(
        spark.readStream.schema(raw.schema).parquet(inDir),
        indexDir, verdictsDir)
      .option("checkpointLocation", ckpt1.toString)
      .trigger(Trigger.AvailableNow()).start()
    try q2.awaitTermination() finally q2.stop()
    def verdictSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("verdict"), col("match_id"), col("best_cos"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -9.0 else r.getDouble(3))).toSet
    val got = verdictSet(spark.read.parquet(s"$verdictsDir/batch=1"))
    val cb = spark.read.parquet(s"$indexDir/codebook")
    val law = try verdictSet(graft.ops.Embeddings.admitVectorsAgainstIndex(
        b2, cb, graft.ops.Embeddings.cellsUnderCodebook(
          b1.filter(col("vec_id") =!= 7L), cb)))
      finally graft.CachedFrames.drain()
    assert(got === law)
    assert(!got.exists(_._3 == 7L)) // the deleted vector matches nothing
  }

  test("components ingestion loop: per-batch patches keep the standing " +
    "assignment equal to the from-scratch CC of all τ edges so far, " +
    "cross-batch pairs land via the grown index, unchanged rows never " +
    "re-patch, and the replay seam excludes the batch's own patch dir") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("comps-loop")
    val (indexDir, compsDir, inDir, ckpt) =
      (s"$root/lx", s"$root/comps", s"$root/in", s"$root/ckpt")
    def phrase(p: String) = (1 to 9).map(i => s"$p$i").mkString(" ")
    val schema = Seq((0L, "")).toDF("doc_id", "text").schema
    def runAvailable(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(inDir)
      val q = EventStreams.componentsIngestStream(stream, indexDir, compsDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    val b1 = Seq((100L, phrase("b")), (101L, phrase("f")))
    val b2 = Seq((200L, phrase("b")), (201L, phrase("g")))
    val b3 = Seq((300L, phrase("g")), (301L, phrase("b")))
    b1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    runAvailable()
    b2.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    runAvailable()
    b3.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    runAvailable()
    def asMap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), col("component")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val current = asMap(EventStreams.currentComponents(spark, compsDir))
    // law: the materialized assignment equals the from-scratch CC over
    // the τ edges of everything ingested so far
    val all = (b1 ++ b2 ++ b3).toDF("doc_id", "text")
    val scratch = try asMap(graft.dedup.Clustering.connectedComponents(
        graft.ops.NearDup.lshPairsOn(all)
          .filter(col("true_jaccard") >= graft.ops.NearDup.ConsolidateTau)
          .select(col("id1"), col("id2"))))
      finally graft.CachedFrames.drain()
    assert(current === scratch)
    // the chain grew ACROSS batches: 301 (batch 3) sits in 100's component
    // via the grown index; 300 joined 201's; edge-less 101 is absent
    assert(current(301L) === 100L && current(200L) === 100L)
    assert(current(300L) === 201L)
    assert(!current.contains(101L))
    // patch discipline: batch 3's patch carries only changed/new ids —
    // 100 and 200 were already labeled 100 and must not re-patch
    val p2 = spark.read.parquet(s"$compsDir/patch_batch=2")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(p2 === Set(201L, 300L, 301L))
    // replay seam: excluding the last batch's own patch reproduces the
    // standing state its replay would probe (the pre-batch assignment)
    val preB3 = asMap(EventStreams.currentComponents(spark, compsDir,
      excludeBatch = Some(2L)))
    assert(preB3 === Map(100L -> 100L, 200L -> 100L))
  }

  test("vector ingestion loop: the codebook trains once at bootstrap and " +
    "freezes, batch 2's verdicts equal the admit-vs-standing law under the " +
    "persisted codebook (a copy of a batch-1 vector caught at cosine 1), " +
    "and the grown cells equal the admitted set under the frozen codebook") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("vec-loop")
    val (indexDir, verdictsDir, inDir, ckpt) =
      (s"$root/vx", s"$root/verdicts", s"$root/in", s"$root/ckpt")
    val raw = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val b1 = raw.filter(col("vec_id") < 40)
    // batch 2: organic fresh vectors + an exact COPY of a batch-1 vector
    // under a fresh id — only the extended cells can catch it
    val b2 = raw.filter(col("vec_id") >= 40 && col("vec_id") < 60)
      .unionByName(raw.filter(col("vec_id") === 7L)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
    def runAvailable(): Unit = {
      val stream = spark.readStream.schema(raw.schema).parquet(inDir)
      val q = EventStreams.vectorIngestStream(stream, indexDir, verdictsDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    b1.coalesce(1).write.mode("append").parquet(inDir)
    runAvailable()
    b2.coalesce(1).write.mode("append").parquet(inDir)
    runAvailable()
    def verdictSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("verdict"), col("match_id"), col("best_cos"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        // -9.0 sentinel, not NaN: cosines live in [-1, 1] and boxed
        // NaN != NaN would break the set equality below
        if (r.isNullAt(3)) -9.0 else r.getDouble(3))).toSet
    // bootstrap: no standing corpus, so everything admits as new
    val v1 = verdictSet(spark.read.parquet(s"$verdictsDir/batch=0"))
    assert(v1.map(_._1) === b1.collect().map(_.getLong(0)).toSet)
    assert(v1.forall(v => v._2 == "new" && v._3 == -1L))
    // batch 2 ≡ the batch-vs-standing law under the PERSISTED codebook
    val cb = spark.read.parquet(s"$indexDir/codebook")
    val v2 = verdictSet(spark.read.parquet(s"$verdictsDir/batch=1"))
    val law = try verdictSet(graft.ops.Embeddings.admitVectorsAgainstIndex(
        b2, cb, graft.ops.Embeddings.cellsUnderCodebook(b1, cb)))
      finally graft.CachedFrames.drain()
    assert(v2 === law)
    // the copy is caught against its batch-1 original at cosine 1
    val copy = v2.find(_._1 == 100007L).get
    assert(copy._2 === "dup_semantic" && copy._3 === 7L)
    assert(math.abs(copy._4 - 1.0) < 1e-9)
    // grown cells ≡ every ADMITTED vector under the frozen codebook
    // (entry arrays are collect_list-ordered — compare exploded)
    def exploded(df: org.apache.spark.sql.DataFrame) = df
      .select(col("cell"), org.apache.spark.sql.functions.explode(col("entries")).as("e"))
      .select(col("cell"), col("e.cid"), col("e.cv"), col("e.cn"))
      .collect().map(_.toSeq).toSet
    val admitted = b1.unionByName(b2.join(
      spark.read.parquet(s"$verdictsDir/batch=1")
        .filter(col("verdict") === "new").select("vec_id"), Seq("vec_id")))
    val grownCells = exploded(spark.read.parquet(s"$indexDir/cells"))
    val refCells = try exploded(
        graft.ops.Embeddings.cellsUnderCodebook(admitted, cb))
      finally graft.CachedFrames.drain()
    assert(grownCells === refCells)
    assert(!grownCells.exists(_(1) == 100007L)) // the dup was NOT admitted
  }

  test("vector ingestion replay is idempotent: a half-committed cells " +
    "append is excluded by the read-side consolidation, so a replayed " +
    "vector is not its own dup_semantic match at cosine 1") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("vec-replay")
    val (indexDir, verdictsDir, inDir) =
      (s"$root/vx", s"$root/verdicts", s"$root/in")
    val raw = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val b1 = raw.filter(col("vec_id") < 40)
    val b2 = raw.filter(col("vec_id") >= 40 && col("vec_id") < 60)
    // seed the standing artifact with a bootstrap run over batch 1
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    b1.coalesce(1).write.mode("append").parquet(inDir)
    val ckpt1 = java.nio.file.Files.createTempDirectory("vec-replay-ckpt1")
    val q1 = EventStreams.vectorIngestStream(
        spark.readStream.schema(raw.schema).parquet(inDir),
        indexDir, verdictsDir)
      .option("checkpointLocation", ckpt1.toString)
      .trigger(Trigger.AvailableNow()).start()
    try q1.awaitTermination() finally q1.stop()
    val cb = spark.read.parquet(s"$indexDir/codebook")
    // the failed first attempt's cells append landed; its commit did not —
    // without the consolidation anti-join every replayed vector would
    // match ITSELF at cosine 1 and be rejected
    graft.ops.Embeddings.cellsUnderCodebook(b2, cb)
      .write.mode("append").parquet(s"$indexDir/cells")
    graft.CachedFrames.drain()
    b2.coalesce(1).write.mode("append").parquet(inDir)
    val ckpt2 = java.nio.file.Files.createTempDirectory("vec-replay-ckpt2")
    // fresh checkpoint over ONLY batch 2's files — the replay
    val stream = spark.readStream.schema(raw.schema).parquet(inDir)
    val q2 = EventStreams.vectorIngestStream(stream, indexDir, verdictsDir)
      .option("checkpointLocation", ckpt2.toString)
      .trigger(Trigger.AvailableNow()).start()
    try q2.awaitTermination() finally q2.stop()
    def verdictSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("verdict"), col("match_id"), col("best_cos"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        // -9.0 sentinel, not NaN: cosines live in [-1, 1] and boxed
        // NaN != NaN would break the set equality below
        if (r.isNullAt(3)) -9.0 else r.getDouble(3))).toSet
    // the fresh-checkpoint replay re-processed b1 ∪ b2 as one batch 0 —
    // its verdicts must equal the law against the PRE-BATCH standing
    // index (b1's cells under the frozen codebook), not the half-
    // committed one: b1's own rows excluded too, so they stay `new`
    val replayed = verdictSet(spark.read.parquet(s"$verdictsDir/batch=0"))
    val law = try verdictSet(graft.ops.Embeddings.admitVectorsAgainstIndex(
        b1.unionByName(b2), cb,
        graft.ops.Embeddings.cellsUnderCodebook(raw.limit(0), cb)))
      finally graft.CachedFrames.drain()
    assert(replayed === law)
    assert(replayed.forall(v => !(v._2 == "dup_semantic" && v._3 == v._1)))
  }

  test("substring ingestion replay is idempotent: a half-committed gram " +
    "append is excluded by the writer-attributed anti-join, so a fresh " +
    "doc is not marked redundant against itself") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("substr-replay")
    val (indexDir, plansDir, inDir) = (s"$root/gidx", s"$root/plans", s"$root/in")
    def phrase(p: String) = (1 to 9).map(i => s"$p$i").mkString(" ")
    val base = Seq((100L, phrase("b"))).toDF("doc_id", "text")
    graft.ops.TextOps.substrIndexPostingsFrame(base)
      .write.parquet(s"$indexDir/grams")
    val b1 = Seq((200L, s"x ${phrase("b")} y"), (201L, phrase("f")))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    b1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    // the failed first attempt's gram append landed; its commit did not
    graft.ops.TextOps.substrIndexPostingsFrame(b1.toDF("doc_id", "text"))
      .write.mode("append").parquet(s"$indexDir/grams")
    graft.CachedFrames.drain()
    val ckpt = java.nio.file.Files.createTempDirectory("substr-replay-ckpt")
    val stream = spark.readStream.schema(base.schema).parquet(inDir)
    val q = EventStreams.substrIngestStream(stream, indexDir, plansDir)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val plans = spark.read.parquet(plansDir)
      .select(col("doc_id"), col("n_tokens"), col("n_removed")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    graft.CachedFrames.drain()
    // the base quote is still stripped (base-attributed gram rows survive
    // the exclusion) and the fresh doc passes intact — without the
    // anti-join its own appended grams would mark all its sites redundant
    assert(plans(200L) === ((11L, 9L)))
    assert(plans(201L) === ((9L, 0L)))
  }

  test("substring ingestion over a LEGACY gram-only index: restart does not " +
    "throw on the missing doc_id column, base quotes are still caught, and " +
    "appends keep the directory single-schema (legacy stays legacy)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("substr-legacy")
    val (indexDir, plansDir, inDir) = (s"$root/gidx", s"$root/plans", s"$root/in")
    def phrase(p: String) = (1 to 9).map(i => s"$p$i").mkString(" ")
    val base = Seq((100L, phrase("b"))).toDF("doc_id", "text")
    // a pre-attribution artifact: distinct grams, no doc_id column — what
    // an older BuildSubstrIndex or ingest loop left behind
    graft.ops.TextOps.substrIndexFrame(base).write.parquet(s"$indexDir/grams")
    val b1 = Seq((200L, s"x ${phrase("b")} y"), (201L, phrase("f")))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    b1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    graft.CachedFrames.drain()
    val ckpt = java.nio.file.Files.createTempDirectory("substr-legacy-ckpt")
    val stream = spark.readStream.schema(base.schema).parquet(inDir)
    val q = EventStreams.substrIngestStream(stream, indexDir, plansDir)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val plans = spark.read.parquet(plansDir)
      .select(col("doc_id"), col("n_tokens"), col("n_removed")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(plans(200L) === ((11L, 9L))) // base quote stripped, as attributed
    assert(plans(201L) === ((9L, 0L)))
    // the append matched the standing schema — one column, never a mix —
    // and the grown index still equals the from-scratch legacy index
    val grown = spark.read.parquet(s"$indexDir/grams")
    assert(grown.columns.toSeq === Seq("gram"))
    val full = graft.ops.TextOps.substrIndexFrame(
      base.union(b1.toDF("doc_id", "text")))
      .collect().map(_.getString(0)).toSet
    assert(grown.collect().map(_.getString(0)).toSet === full)
    graft.CachedFrames.drain()
  }

  test("ingestion loop replay is harmless: duplicate index appends change no " +
    "verdict and compaction restores the clean index") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ingest-replay")
    val (indexDir, verdictsDir, inDir) = (s"$root/idx", s"$root/verdicts", s"$root/in")
    val corpus = Seq((100L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val (d0, b0) = graft.ops.Curation.corpusIndexFrames(corpus)
    d0.write.parquet(s"$indexDir/digests")
    b0.write.parquet(s"$indexDir/bands")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    // docs 5 and 6 are intra-batch copies: on replay each would match the
    // OTHER's appended rows — a plain self-guard doesn't cover them, the
    // batch-set exclusion does
    Seq((1L, "alpha beta gamma delta epsilon"), (2L, "zeta eta theta iota kappa"),
        (5L, "sigma tau upsilon phi chi"), (6L, "sigma tau upsilon phi chi"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    def runFreshCheckpoint(): Unit = {
      val ckpt = java.nio.file.Files.createTempDirectory("ingest-replay-ckpt")
      val stream = spark.readStream
        .schema(corpus.schema).parquet(inDir)
      val q = EventStreams.admissionIngestStream(stream, indexDir, verdictsDir)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    // the at-least-once failure mode: the SAME batch processes twice (fresh
    // checkpoint replays the input as batch 0 again)
    runFreshCheckpoint()
    runFreshCheckpoint()
    // verdicts: the replay OVERWROTE its batch=0 dir — one verdict per doc,
    // and every admitted doc stays `new` on replay even though its rows are
    // in the index: the probe's batch-set exclusion is what makes a
    // half-committed retry verdict-stable, including the intra-batch
    // copies 5 and 6 (each would otherwise flip to dup_exact of the other)
    val verdicts = spark.read.parquet(verdictsDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(verdicts.map(_._1) === Seq(1L, 2L, 5L, 6L))
    assert(verdicts.toMap.apply(2L) === "dup_exact")
    assert(verdicts.toMap.apply(1L) === "new")
    assert(verdicts.toMap.apply(5L) === "new")
    assert(verdicts.toMap.apply(6L) === "new")
    // the duplicated appends are visible pre-compaction...
    val rawRows = spark.read.parquet(s"$indexDir/digests").count()
    // ...and compaction collapses them to the exact clean index
    graft.cli.CompactCorpusIndex.main(Array(
      "--index", indexDir, "--output", s"$root/compacted"))
    val compact = spark.read.parquet(s"$root/compacted/digests")
    assert(compact.count() < rawRows)
    assert(compact.select("cid").as[Long].collect().toSet === Set(100L, 1L, 5L, 6L))
  }

  test("ingestion loop crash BETWEEN the verdict write and a half-finished " +
    "index append: the restarted batch re-appends without double-admitting") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    // Sharper than the whole-batch replay case: the first attempt dies at
    // the worst interior point — verdicts committed, the DIGEST append
    // done, the BAND append never started. The restarted batch re-probes
    // an index already containing its own digest rows (but not its band
    // rows); the batch-set exclusion must keep every verdict identical,
    // and the re-run append must complete the band side. Emulates the
    // foreachBatch body step-for-step up to the crash point, then runs
    // the REAL stream over a fresh checkpoint (which replays batch 0).
    val root = java.nio.file.Files.createTempDirectory("ingest-crash")
    val (indexDir, verdictsDir, inDir) = (s"$root/idx", s"$root/verdicts", s"$root/in")
    val corpus = Seq((100L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val (d0, b0) = graft.ops.Curation.corpusIndexFrames(corpus)
    d0.write.parquet(s"$indexDir/digests")
    b0.write.parquet(s"$indexDir/bands")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    val batch = Seq(
      (1L, "alpha beta gamma delta epsilon"), // new
      (2L, "zeta eta theta iota kappa"),      // dup_exact of corpus 100
      (5L, "sigma tau upsilon phi chi"),      // intra-batch copy of 6
      (6L, "sigma tau upsilon phi chi")).toDF("doc_id", "text")
    batch.coalesce(1).write.mode("append").parquet(inDir)
    // --- first attempt, by hand, crashing mid-append ---
    val digests1 = spark.read.parquet(s"$indexDir/digests")
    val bands1 = spark.read.parquet(s"$indexDir/bands")
    val v1 = graft.ops.Curation.admitAgainstIndex(batch, digests1, bands1)
    v1.write.mode("overwrite").parquet(s"$verdictsDir/batch=0")
    val admitted1 = batch.join(
      spark.read.parquet(s"$verdictsDir/batch=0")
        .filter(col("verdict") === "new").select("doc_id"), Seq("doc_id"))
    val (dApp, _) = graft.ops.Curation.corpusIndexFrames(admitted1)
    dApp.write.mode("append").parquet(s"$indexDir/digests")
    graft.CachedFrames.drain()
    // CRASH: the band append never happens, the checkpoint never commits
    val bandRowsAfterCrash = spark.read.parquet(s"$indexDir/bands").count()
    // --- restart: the real loop replays the batch over a fresh checkpoint ---
    val ckpt = java.nio.file.Files.createTempDirectory("ingest-crash-ckpt")
    val stream = spark.readStream.schema(corpus.schema).parquet(inDir)
    val q = EventStreams.admissionIngestStream(stream, indexDir, verdictsDir)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    // verdicts: one row per doc, bitwise what the clean run would say —
    // the batch's own half-appended digest rows were excluded
    val verdicts = spark.read.parquet(verdictsDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(verdicts.map(_._1) === Seq(1L, 2L, 5L, 6L))
    assert(verdicts.toMap.apply(1L) === "new")
    assert(verdicts.toMap.apply(2L) === "dup_exact")
    assert(verdicts.toMap.apply(5L) === "new")
    assert(verdicts.toMap.apply(6L) === "new")
    // the band side got its append exactly once (the restart's); the digest
    // side carries the crash's duplicate rows until compaction
    val bandCids = spark.read.parquet(s"$indexDir/bands")
      .select("cid").as[Long].collect()
    assert(spark.read.parquet(s"$indexDir/bands").count() > bandRowsAfterCrash)
    assert(bandCids.toSet === Set(100L, 1L, 5L, 6L))
    // exactly one band append: every doc carries the same per-doc band-row
    // count as the clean single-write index would
    val cleanBandRows = graft.ops.Curation.corpusIndexFrames(
      Seq((0L, "anything at all here now")).toDF("doc_id", "text"))._2.count()
    assert(bandCids.groupBy(identity).values.map(_.length.toLong).toSet
      === Set(cleanBandRows))
    val digestByCid = spark.read.parquet(s"$indexDir/digests")
      .groupBy("cid").count().as[(Long, Long)].collect().toMap
    assert(digestByCid(1L) === 2L) // crash append + restart append
    // compaction restores the exact clean index
    graft.cli.CompactCorpusIndex.main(Array(
      "--index", indexDir, "--output", s"$root/compacted"))
    assert(spark.read.parquet(s"$root/compacted/digests")
      .select("cid").as[Long].collect().toSet === Set(100L, 1L, 5L, 6L))
    assert(spark.read.parquet(s"$root/compacted/digests").count() === 4L)
  }

  test("streaming DSIR gate equals the q93 batch weigher row-for-row") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val staged = java.nio.file.Files.createTempDirectory("dsir-gate-e2e")
    docs.coalesce(1).write.mode("overwrite").parquet(staged.toString)
    val stream = spark.readStream.schema(docs.schema).parquet(staged.toString)
    def toMapped(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val q = EventStreams.dsirGateStream(stream, docs)
      .writeStream.format("memory").queryName("dsir_gate_e2e")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    val got = try {
      q.awaitTermination()
      toMapped(spark.table("dsir_gate_e2e").collect())
    } finally q.stop()
    val expected = toMapped(graft.ops.TextOps.dsirOn(docs).collect())
    graft.CachedFrames.drain()
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("streaming DSIR gate scores OUT-OF-CORPUS buckets by the smoothing " +
      "formula, not 0") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    // The gate's broadcast map only has rows for corpus-occupied buckets; a
    // stream document carrying a bucket the corpus never produced must fall
    // back to the sentinel cr = ct = 0 delta — bits(n_raw+B) − bits(n_tgt+B)
    // — not to 0. The corpus is built so that delta is nonzero (n_raw + B
    // crosses a power of two that n_tgt + B does not): one long non-target
    // doc of two repeated bigrams (549 raw grams, 2 occupied buckets) plus
    // a small English target doc.
    val corpus = Seq(
      (1L, Seq.fill(275)("el la").mkString(" ")),
      (2L, "the cat sat of the mat")).toDF("doc_id", "text")
    val streamDocs = Seq(
      (10L, "zzqx1 zzqx2 zzqx3"), // bigram buckets expected corpus-unseen
      (11L, "the cat sat of the mat")) // in-corpus copy: occupied buckets
    // plain-Scala oracle, the SAME formula for seen and unseen buckets
    def toksOf(t: String): Seq[String] = t.trim.split("\\s+").toSeq
    def bucket(g: String): Long = md56("dsir:" + g) % graft.ops.TextOps.DsirBuckets
    def bits(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong
    val stopEn = Set("the", "a", "of", "and", "to")
    val stopEs = Set("el", "la", "de", "y", "que")
    val stopDe = Set("der", "die", "und", "das", "ist")
    def lang(ts: Seq[String]): String = {
      val (e, s, d) = (ts.count(stopEn), ts.count(stopEs), ts.count(stopDe))
      if (e >= s && e >= d) "en" else if (s >= d) "es" else "de"
    }
    val corpusGrams = Seq(
      (1L, Seq.fill(275)("el la").mkString(" ")),
      (2L, "the cat sat of the mat")).flatMap { case (_, t) =>
      val ts = toksOf(t)
      if (ts.size < 2) Seq.empty
      else ts.sliding(2).map(p => (lang(ts), bucket(p.mkString(" ")))).toSeq
    }
    val nRaw = corpusGrams.size.toDouble
    val nTgt = corpusGrams.count(_._1 == "en").toDouble
    val cRaw = corpusGrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val cTgt = corpusGrams.filter(_._1 == "en").groupBy(_._2).view
      .mapValues(_.size.toLong).toMap
    val B = graft.ops.TextOps.DsirBuckets
    def delta(b: Long): Long =
      bits(math.floor((nRaw + B) / (cRaw.getOrElse(b, 0L) + 1.0)).toLong) -
        bits(math.floor((nTgt + B) / (cTgt.getOrElse(b, 0L) + 1.0)).toLong)
    // the scenario must actually exercise the fix: an unseen bucket exists
    // in the stream and its sentinel delta is nonzero
    val dUnseen = bits(math.floor(nRaw + B).toLong) - bits(math.floor(nTgt + B).toLong)
    assert(dUnseen !== 0L)
    val streamBuckets = streamDocs.flatMap { case (_, t) =>
      toksOf(t).sliding(2).map(p => bucket(p.mkString(" "))) }
    assert(streamBuckets.exists(b => !cRaw.contains(b)))
    val expected = streamDocs.map { case (id, t) =>
      val ds = toksOf(t).sliding(2).filter(_.size == 2)
        .map(p => delta(bucket(p.mkString(" ")))).toSeq
      (id, ds.size.toLong, ds.sum, ds.sum > 0L)
    }.toSet
    val staged = java.nio.file.Files.createTempDirectory("dsir-oov")
    streamDocs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(staged.toString)
    val stream = spark.readStream
      .schema(streamDocs.toDF("doc_id", "text").schema).parquet(staged.toString)
    val q = EventStreams.dsirGateStream(stream, corpus)
      .writeStream.format("memory").queryName("dsir_oov")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    val got = try {
      q.awaitTermination()
      spark.table("dsir_oov").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    } finally { q.stop(); graft.CachedFrames.drain() }
    assert(got === expected)
  }

  test("streaming LM quality gate equals the q92 batch scorer bitwise") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val staged = java.nio.file.Files.createTempDirectory("lm-quality-e2e")
    docs.coalesce(1).write.mode("overwrite").parquet(staged.toString)
    val stream = spark.readStream.schema(docs.schema).parquet(staged.toString)
    def toMapped(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val q = EventStreams.lmQualityStream(stream, docs)
      .writeStream.format("memory").queryName("lm_quality_e2e")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    val got = try {
      q.awaitTermination()
      toMapped(spark.table("lm_quality_e2e").collect())
    } finally q.stop()
    val expected = toMapped(graft.ops.TextOps.lmBitsOn(docs).collect())
    graft.CachedFrames.drain()
    assert(got === expected) // bitwise, avg_bits included
    assert(got.nonEmpty)
  }

  test("streaming joint admission equals the q104 batch gate row-for-row") {
    import org.apache.spark.sql.functions.{col, lit, to_timestamp}
    import org.apache.spark.sql.streaming.Trigger
    val dir = "/root/testdata/sf0.001"
    val bound = 100L // Embeddings.AdmitBatchBound, the q104 split
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val batch = docs.filter(col("doc_id") < bound).join(vecs, Seq("doc_id"))
      .withColumn("ts", to_timestamp(lit("2024-01-01 10:00:00")))
      .select("ts", "doc_id", "text", "embedding")
    val corpusDocs = docs.filter(col("doc_id") >= bound)
    val corpusVecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") >= bound)
    val staged = java.nio.file.Files.createTempDirectory("joint-admission")
    batch.coalesce(1).write.mode("overwrite").parquet(staged.toString)
    val stream = spark.readStream.schema(batch.schema).parquet(staged.toString)
    val q = EventStreams.jointAdmissionStream(stream, corpusDocs, corpusVecs)
      .writeStream.format("memory").queryName("joint_admission")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    val got = try {
      q.awaitTermination()
      spark.table("joint_admission").collect()
        .map(r => r.getLong(1) -> ((r.getString(2), r.getString(3), r.getBoolean(4))))
        .toMap
    } finally { q.stop(); graft.CachedFrames.drain() }
    val expected = graft.ops.Curation.q104JointAdmission(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getBoolean(3))))
      .toMap
    graft.CachedFrames.drain()
    assert(got === expected)
    // the joint gate genuinely uses both modalities on this slice
    assert(got.values.exists(v => v._1 != "new" && v._2 == "new"))
    assert(got.values.exists(v => v._1 == "new" && v._2 != "new"))
    assert(got.values.exists(_._3))
  }

  test("streaming cohort retention: changelog deltas converge to the batch " +
      "matrix, retracting when a late earlier event shifts a cohort") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(day: Int): Timestamp = new Timestamp(day.toLong * 86400L * 1000L)
    // batches 1-2 arrive event-time-ordered per user; batch 3 delivers
    // u4's EARLIEST event last — u4's cohort must shift week 1 → week 0,
    // retracting the (1, 0) grant and re-granting (0, 0) and (0, 1)
    val batches = Seq(
      Seq(UserEvent(1L, at(0)), UserEvent(2L, at(2)), UserEvent(4L, at(9))),
      Seq(UserEvent(1L, at(7)), UserEvent(2L, at(14)), UserEvent(1L, at(21)),
        UserEvent(3L, at(8))),
      Seq(UserEvent(4L, at(1)))) // late: week 0, before u4's week-1 start
    val mem = MemoryStream[UserEvent]
    val q = EventStreams.retentionDeltaStream(mem.toDS())
      .writeStream.format("memory").queryName("retention_deltas")
      .outputMode(OutputMode.Append).start()
    val (afterTwo, all) = try {
      mem.addData(batches(0): _*); q.processAllAvailable()
      mem.addData(batches(1): _*); q.processAllAvailable()
      val two = spark.table("retention_deltas").as[RetentionDelta].collect().toSeq
      mem.addData(batches(2): _*); q.processAllAvailable()
      (two, spark.table("retention_deltas").as[RetentionDelta].collect().toSeq)
    } finally q.stop()
    // in-order prefix: pure grants, no retractions
    assert(afterTwo.forall(_.delta == 1))
    // the late event forced a genuine retraction
    assert(all.exists(d => d.delta == -1 && d.cohort_wk == 1L && d.week_offset == 0L))
    // merged per cell, the changelog equals the batch matrix
    val merged = all.groupBy(d => (d.cohort_wk, d.week_offset))
      .view.mapValues(_.map(_.delta.toLong).sum).filter(_._2 != 0L).toMap
    val batchCells = graft.ops.Events.cohortRetentionOn(
      batches.flatten.map(e => (e.user_id, e.ts)).toDF("user_id", "ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    graft.CachedFrames.drain()
    assert(merged === batchCells)
    // cohort sizes ride in the offset-0 cells: week-0 has u1, u2 and the
    // shifted u4; week-1 keeps only u3 (u4's grant was retracted)
    assert(merged((0L, 0L)) === 3L)
    assert(merged((1L, 0L)) === 1L)
  }

  test("streaming NB language ID equals the q100 batch argmin and scores " +
      "out-of-corpus buckets by the sentinel cost") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    val dir = "/root/testdata/sf0.001"
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    // stream = the corpus docs; labels NOT shipped — scoring needs none
    val streamDocs = corpus.select(col("doc_id"), col("text"))
    val staged = java.nio.file.Files.createTempDirectory("nb-stream")
    streamDocs.coalesce(1).write.mode("overwrite").parquet(staged.toString)
    val stream = spark.readStream.schema(streamDocs.schema).parquet(staged.toString)
    val q = EventStreams.nbClassifyStream(stream, corpus)
      .writeStream.format("memory").queryName("nb_stream")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    val got = try {
      q.awaitTermination()
      spark.table("nb_stream").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    } finally q.stop()
    graft.CachedFrames.drain()
    // corpus docs: the batch scorer's exact argmin
    val batch = graft.ops.TextOps.nbOn(corpus).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(3)))).toMap
    graft.CachedFrames.drain()
    assert(got === batch)
    // OOV case on a corpus SMALL enough to leave buckets empty (the sf
    // slice's ~28k bigrams occupy all 256): a stream doc whose buckets
    // the trained table lacks pays n_grams × sentinel + prior per class
    val tiny = Seq(
      (1L, "the cat sat down", "en"), (2L, "el gato azul aqui", "es"),
      (3L, "der hund ist gross", "de"), (4L, "le chat noir dort", "fr"),
      (5L, "wo de mao hen hao", "zh")).toDF("doc_id", "text", "lang")
    val oov = (900001L, "zzqx7 zzqx8 zzqx9")
    val staged2 = java.nio.file.Files.createTempDirectory("nb-stream-oov")
    Seq(oov).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(staged2.toString)
    val stream2 = spark.readStream
      .schema(streamDocs.schema).parquet(staged2.toString)
    val q2 = EventStreams.nbClassifyStream(stream2, tiny)
      .writeStream.format("memory").queryName("nb_stream_oov")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    val gotOov = try {
      q2.awaitTermination()
      spark.table("nb_stream_oov").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    } finally q2.stop()
    graft.CachedFrames.drain()
    val (costsDf, priorsDf) = graft.ops.TextOps.nbTables(tiny)
    val costRows = costsDf.collect().map(r => r.getLong(0) ->
      graft.ops.TextOps.NbClasses.indices.map(i => r.getLong(i + 1))).toMap
    val priors = priorsDf.collect().head
    graft.CachedFrames.drain()
    val oovBuckets = oov._2.trim.split("\\s+").toSeq.sliding(2)
      .map(p => md56("nb:" + p.mkString(" ")) % graft.ops.TextOps.NbBuckets).toSeq
    assert(oovBuckets.forall(b => !costRows.contains(b)))
    val sentinel = costRows(-1L)
    val totals = graft.ops.TextOps.NbClasses.zipWithIndex.map { case (c, i) =>
      c -> (priors.getLong(i) + oovBuckets.size * sentinel(i))
    }
    val mn = totals.map(_._2).min
    val expPred = totals.find(_._2 == mn).get._1
    assert(gotOov(oov._1) === ((oovBuckets.size.toLong, expPred)))
  }

  test("streaming CMS sketch equals the batch sketch cell-by-cell across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val batch1 = Seq((1L, "alpha beta alpha gamma"), (2L, "beta beta delta"))
    val batch2 = Seq((3L, "alpha epsilon zeta"), (4L, "gamma gamma gamma eta"))
    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.cmsSketchStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val got = spark.table("cms_stream")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val expected = graft.ops.TextOps.cmsSketchOn(
        (batch1 ++ batch2).toDF("doc_id", "text"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming profiler equals the batch approx profile row-for-row across out-of-order batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // ids arrive out of order across triggers and a null lands mid-stream:
    // the Complete-mode standing table must still equal the batch approx
    // profile of the union, including the HLL distinct estimate (pure
    // function of the merged registers, arrival-order-free)
    val batch1 = Seq((7L, "gamma delta", "de"), (2L, "beta", null: String))
    val batch2 = Seq((1L, "alpha beta", "en"), (9L, "beta", "en"))
    val mem = MemoryStream[(Long, String, String)]
    val q = EventStreams.profileStream(mem.toDF().toDF("doc_id", "text", "lang"))
      .writeStream.format("memory").queryName("profile_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val got = spark.table("profile_stream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toSet
      val expected = graft.ops.Profiling.profileApprox(
        (batch1 ++ batch2).toDF("doc_id", "text", "lang")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toSet
      assert(got === expected)
      assert(got.map(_._1) === Set("doc_id", "text", "lang"))
      // the null was counted where it lived and nowhere else
      assert(got.find(_._1 == "lang").get._3 === 1L)
      assert(got.find(_._1 == "doc_id").get._3 === 0L)
    } finally q.stop()
  }

  test("streaming drift cells in UPDATE mode: merged deltas finalized by driftFromCells " +
      "equal batch q108 under cross-trigger out-of-order days") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    // trigger 1 carries days 0 and 2; trigger 2 goes BACK to day 0 (late
    // arrival) and fills day 1 — the merged table must still converge
    val batch1 = Seq((0L, 10.0), (0L, 30.0), (2L * 86400L, 55.0))
    val batch2 = Seq((5L, 80.0), (86400L, 20.0), (86400L, 130.0))
    def evDf(rows: Seq[(Long, Double)]) =
      rows.toDF("sec", "value").withColumn("ts", timestamp_seconds(col("sec")))
    val mem = MemoryStream[(Long, Double)]
    val updates = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Long)]
    val q = EventStreams.driftCellStream(
        mem.toDF().toDF("sec", "value")
          .withColumn("ts", timestamp_seconds(col("sec"))))
      .writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       id: Long) =>
        val rows = b.collect().map(r => (id, r.getLong(0), r.getInt(1), r.getLong(2)))
        updates.synchronized { updates ++= rows }
        ()
      }
      .start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val all = updates.synchronized(updates.toVector)
    // the monitoring-sink merge: last write wins per (day, bucket)
    val merged = all.groupBy(u => (u._2, u._3))
      .map { case (cell, us) => (cell._1, cell._2, us.maxBy(_._1)._4) }.toSeq
    val got = Events.driftFromCells(merged.toDF("day", "bucket", "n")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    val expected = Events.valueDriftOn(evDf(batch1 ++ batch2)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    graft.CachedFrames.drain()
    assert(got === expected)
    assert(got.map(_._1) === Set(1L, 2L)) // both adjacent pairs present
    // genuinely a delta feed: trigger 2 re-emitted only cells it touched
    // (day 0's updated bucket + day 1's), never day 2's untouched cell
    val second = all.filter(_._1 > all.map(_._1).min)
    assert(second.nonEmpty)
    assert(second.forall(_._2 != 2L), second.toString)
  }

  test("drift cells survive a checkpoint restart: wave-2 updates carry the " +
      "recovered wave-1 counts, merged result equals batch") {
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    // the recovery contract of the monitoring feed: the Update-mode counts
    // live in the state store, so a restarted query's deltas must be
    // CUMULATIVE (state recovered), not a recount of the new files alone
    val wave1 = Seq((0L, 10.0), (0L, 30.0), (86400L, 20.0))
    val wave2 = Seq((0L, 12.0), (86400L, 30.0)) // day 0 again after restart
    def evDf(rows: Seq[(Long, Double)]) =
      rows.toDF("sec", "value").withColumn("ts", timestamp_seconds(col("sec")))
    val staged = java.nio.file.Files.createTempDirectory("drift-restart")
    val ckpt = java.nio.file.Files.createTempDirectory("drift-restart-ckpt")
    val updates = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Long)]
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(evDf(wave1).schema)
        .parquet(staged.toString)
      val q = EventStreams.driftCellStream(stream)
        .writeStream
        .outputMode(OutputMode.Update)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                         id: Long) =>
          val rows = b.collect().map(r => (id, r.getLong(0), r.getInt(1), r.getLong(2)))
          updates.synchronized { updates ++= rows }
          ()
        }
        .start()
      try q.awaitTermination() finally q.stop()
    }
    evDf(wave1).coalesce(1).write.mode("append").parquet(staged.toString)
    runOnce()
    val afterWave1 = updates.synchronized(updates.toVector)
    evDf(wave2).coalesce(1).write.mode("append").parquet(staged.toString)
    runOnce()
    val all = updates.synchronized(updates.toVector)
    val wave2Rows = all.drop(afterWave1.size)
    // cumulative, not recounted: day 0 bucket 0 had 1 row in wave 1
    // (10.0; the 30.0 lands in bucket 1) and 1 more in wave 2 (12.0) —
    // the restarted query must report 2, where a state-less recount of
    // wave 2 alone would report 1
    assert(wave2Rows.collect { case (_, 0L, 0, n) => n } === Vector(2L))
    // batchIds continue across the restart, so last-write-wins is max-id
    val merged = all.groupBy(u => (u._2, u._3))
      .map { case (cell, us) => (cell._1, cell._2, us.maxBy(_._1)._4) }.toSeq
    val got = Events.driftFromCells(merged.toDF("day", "bucket", "n")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    val expected = Events.valueDriftOn(evDf(wave1 ++ wave2)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    graft.CachedFrames.drain()
    assert(got === expected && got.nonEmpty)
  }

  test("streaming CMS in UPDATE mode: per-trigger deltas merged last-write-wins " +
      "equal the batch sketch — the monitoring-sink contract") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    // Update mode emits, per trigger, the UPDATED VALUE of exactly the
    // (row, bucket) cells the trigger's tokens touched — not the whole
    // sketch. A monitoring sink that applies them last-write-wins (keyed
    // upsert, the natural Kafka-compacted-topic / KV-store consumption)
    // must converge to the same table the batch sketch computes.
    val batch1 = Seq((1L, "alpha beta alpha gamma"), (2L, "beta beta delta"))
    val batch2 = Seq((3L, "alpha epsilon"), (4L, "gamma gamma gamma"))
    val mem = MemoryStream[(Long, String)]
    val updates = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Long)]
    val q = EventStreams.cmsSketchStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       id: Long) =>
        val rows = b.collect().map(r => (id, r.getInt(0), r.getLong(1), r.getLong(2)))
        updates.synchronized { updates ++= rows }
        ()
      }
      .start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val all = updates.synchronized(updates.toVector)
    val merged = all.groupBy(u => (u._2, u._3))
      .map { case (cell, us) => (cell._1, cell._2, us.maxBy(_._1)._4) }.toSet
    val expected = graft.ops.TextOps.cmsSketchOn(
      (batch1 ++ batch2).toDF("doc_id", "text"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged === expected)
    // and it was genuinely a delta feed: trigger 2 re-emitted only the
    // cells its own tokens hashed into, not the whole sketch
    val secondTrigger = all.filter(_._1 > all.map(_._1).min)
    assert(secondTrigger.nonEmpty)
    assert(secondTrigger.size < expected.size)
  }

  test("checkpoint restart: admission stream resumes exactly-once — batch 2 " +
    "lands while the query is down, nothing re-emits, union equals q71") {
    import org.apache.spark.sql.functions.{col, lit, to_timestamp}
    import org.apache.spark.sql.streaming.Trigger
    // the recovery contract a production admission stream needs: the
    // file-source offset log + the parquet sink's commit log in the
    // checkpoint are the source of truth, so a stopped query restarted
    // over the same checkpoint must pick up EXACTLY the files it never
    // committed — no re-emission of batch 1, no loss of batch 2. (The
    // memory sink refuses checkpoint recovery by design, so the durable
    // file sink is the honest vehicle for this property.)
    val dir = "/root/testdata/sf0.01"
    val raw = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val batchDocs = raw.filter(col("source") === "src0").drop("source")
      .withColumn("ts", to_timestamp(lit("2024-01-01 10:00:00")))
    val corpus = raw.filter(col("source") =!= "src0").drop("source")
    val staged = java.nio.file.Files.createTempDirectory("admission-restart")
    val ckpt = java.nio.file.Files.createTempDirectory("admission-restart-ckpt")
    val outDir = java.nio.file.Files.createTempDirectory("admission-restart-out")
    def toMapped(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    def runOnce(): Set[(Long, String, Long)] = {
      val stream = spark.readStream.schema(batchDocs.schema).parquet(staged.toString)
      val q = EventStreams.admissionStream(stream, corpus)
        .writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      toMapped(spark.read.parquet(outDir.toString)
        .select("doc_id", "verdict", "match_id").collect())
    }
    batchDocs.filter(col("doc_id") % 40 === 0).coalesce(1)
      .write.mode("append").parquet(staged.toString)
    val first = runOnce()
    batchDocs.filter(col("doc_id") % 40 =!= 0).coalesce(1)
      .write.mode("append").parquet(staged.toString)
    val all = runOnce()
    val expected = toMapped(graft.ops.Curation.q71IncrementalDedup(spark, dir)
      .select("doc_id", "verdict", "match_id").collect())
    // physical row count, not the set: a re-emitted batch would show up as
    // duplicate rows that the set view silently collapses
    val rawCount = spark.read.parquet(outDir.toString).count()
    graft.CachedFrames.drain()
    assert(first.nonEmpty && (all -- first).nonEmpty)
    assert(first.subsetOf(all))
    // exactly-once across the restart: every doc verdict exactly one row
    assert(rawCount === expected.size.toLong)
    assert(all === expected)
  }

  test("AvailableNow embedding-admission run equals the q78 batch output on sf0.01") {
    import org.apache.spark.sql.functions.{col, lit, to_timestamp}
    import org.apache.spark.sql.streaming.Trigger
    // the real gate slice: vec_id < 100 is the arriving batch, the rest is
    // the standing corpus — exactly q78's split
    val dir = "/root/testdata/sf0.01"
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val bound = graft.ops.Embeddings.AdmitBatchBound
    val batchVecs = raw.filter(col("vec_id") < bound)
      .withColumn("ts", to_timestamp(lit("2024-01-01 10:00:00")))
    val corpus = raw.filter(col("vec_id") >= bound)
    val staged = java.nio.file.Files.createTempDirectory("embed-admission-e2e")
    batchVecs.coalesce(1).write.mode("overwrite").parquet(staged.toString)
    val stream = spark.readStream.schema(batchVecs.schema).parquet(staged.toString)
    // best_cos compares EXACTLY: both paths max identical IEEE cosines
    def toMapped(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toSet
    val q = EventStreams.embeddingAdmissionStream(stream, corpus)
      .writeStream.format("memory").queryName("embed_admission_e2e")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    val got = try {
      q.awaitTermination()
      toMapped(spark.table("embed_admission_e2e")
        .select("vec_id", "verdict", "match_id", "best_cos").collect())
    } finally q.stop()
    val expected = toMapped(graft.ops.Embeddings.q78EmbeddingAdmission(spark, dir)
      .select("vec_id", "verdict", "match_id", "best_cos").collect())
    graft.CachedFrames.drain()
    assert(got === expected)
    assert(got.size === bound && got.exists(_._2 == "dup_semantic"))
  }

  test("checkpoint restart: embedding admission resumes exactly-once and the " +
    "union equals q78 (including best_cos bitwise)") {
    import org.apache.spark.sql.functions.{col, lit, to_timestamp}
    import org.apache.spark.sql.streaming.Trigger
    // the vector-space twin of the text restart spec above: same recovery
    // contract, same batch-boundary kill point, plus the bitwise best_cos
    // equality the embedding twin is pinned to
    val dir = "/root/testdata/sf0.01"
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val bound = graft.ops.Embeddings.AdmitBatchBound
    val batchVecs = raw.filter(col("vec_id") < bound)
      .withColumn("ts", to_timestamp(lit("2024-01-01 10:00:00")))
    val corpus = raw.filter(col("vec_id") >= bound)
    val staged = java.nio.file.Files.createTempDirectory("embed-restart")
    val ckpt = java.nio.file.Files.createTempDirectory("embed-restart-ckpt")
    val outDir = java.nio.file.Files.createTempDirectory("embed-restart-out")
    def toMapped(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toSet
    def runOnce(): Set[(Long, String, Long, Double)] = {
      val stream = spark.readStream.schema(batchVecs.schema).parquet(staged.toString)
      val q = EventStreams.embeddingAdmissionStream(stream, corpus)
        .writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      toMapped(spark.read.parquet(outDir.toString)
        .select("vec_id", "verdict", "match_id", "best_cos").collect())
    }
    batchVecs.filter(col("vec_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(staged.toString)
    val first = runOnce()
    batchVecs.filter(col("vec_id") % 2 =!= 0).coalesce(1)
      .write.mode("append").parquet(staged.toString)
    val all = runOnce()
    val expected = toMapped(graft.ops.Embeddings.q78EmbeddingAdmission(spark, dir)
      .select("vec_id", "verdict", "match_id", "best_cos").collect())
    val rawCount = spark.read.parquet(outDir.toString).count()
    graft.CachedFrames.drain()
    assert(first.nonEmpty && (all -- first).nonEmpty)
    assert(first.subsetOf(all))
    assert(rawCount === expected.size.toLong)
    assert(all === expected)
  }

  test("late within-watermark event bridges two open sessions like the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // batch 1: 10:00 and 10:50 — a 50-min gap, i.e. two sessions so far;
    // watermark after the batch = 10:50 - 30min = 10:20
    mem.addData(Event(ts(0), 1L, "view", 1.0), Event(ts(50), 1L, "view", 1.0))
    val q = EventStreams.sessionize(mem.toDS(), gapSec = 1800L)
      .writeStream.format("memory").queryName("sessions_bridge")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      // batch 2: a LATE event at 10:25 (≥ watermark, so admitted) lands
      // between them — 25min to each side, so the two sessions must MERGE
      mem.addData(Event(ts(25), 1L, "view", 1.0))
      q.processAllAvailable()
      // seal everything
      mem.addData(Event(Timestamp.valueOf("2024-01-01 15:00:00"), 9L, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Event(Timestamp.valueOf("2024-01-01 18:00:00"), 9L, "view", 1.0))
      q.processAllAvailable()
      val user1 = spark.table("sessions_bridge").as[Session].collect()
        .filter(_.user_id == 1L).toSeq
      assert(user1 === Seq(
        Session(1L, ts(0).getTime / 1000, ts(50).getTime / 1000, 3L)),
        s"expected one bridged session, got: $user1")
    } finally q.stop()
  }

  test("streaming Gopher gate equals the q112 batch rule battery bitwise") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val staged = java.nio.file.Files.createTempDirectory("gopher-gate")
    docs.coalesce(1).write.mode("overwrite").parquet(staged.toString)
    val stream = spark.readStream.schema(docs.schema).parquet(staged.toString)
    def toMapped(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      (r.getLong(0), (1 to 6).map(r.getBoolean).toList, r.getInt(7), r.getBoolean(8))
    }.toSet
    val q = EventStreams.gopherGateStream(stream)
      .writeStream.format("memory").queryName("gopher_gate")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    val got = try {
      q.awaitTermination()
      toMapped(spark.table("gopher_gate").collect())
    } finally q.stop()
    val expected = toMapped(graft.ops.TextOps.gopherRulesOn(docs).collect())
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("streaming Bloom gate equals the q114 batch probe columns") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // stream the NON-benchmark docs (the batch output's roster)
    val arriving = docs.filter(col("doc_id") % 100 =!= 0)
    val staged = java.nio.file.Files.createTempDirectory("bloom-gate")
    arriving.coalesce(1).write.mode("overwrite").parquet(staged.toString)
    val stream = spark.readStream.schema(arriving.schema).parquet(staged.toString)
    def toMapped(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val q = EventStreams.bloomGateStream(stream, docs)
      .writeStream.format("memory").queryName("bloom_gate")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    val got = try {
      q.awaitTermination()
      toMapped(spark.table("bloom_gate").collect())
    } finally { q.stop(); graft.CachedFrames.drain() }
    val expected = toMapped(graft.ops.TextOps.q114BloomDecontam(spark, dir)
      .select("doc_id", "n_grams", "n_bloom_hits", "bloom_flag").collect())
    graft.CachedFrames.drain()
    // the gate emits a verdict for every arriving row; q114's output is the
    // >= n-gram roster — anything extra must be trivially-clean short docs
    assert(got.size.toLong === arriving.count())
    val gotByid = got.map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    val expByid = expected.map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    expByid.foreach { case (k, v) => assert(gotByid(k) === v, s"doc $k") }
    (gotByid.keySet -- expByid.keySet)
      .foreach(k => assert(gotByid(k) === ((0L, 0L, false)), s"short doc $k"))
    assert(got.nonEmpty)
  }

  test("streaming SCD builder closes runs exactly at type changes, spans batches, keeps the open run") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // user 1: view,view | (batch 2) view,buy,buy -> run 1 (view x3) closes at
    // the buy; buy run stays OPEN. user 2: buy | buy -> never closes.
    mem.addData(
      Event(ts(0), 1L, "view", 1.0), Event(ts(1), 1L, "view", 1.0),
      Event(ts(0), 2L, "buy", 1.0))
    val q = EventStreams.scdIntervalStream(mem.toDS())
      .writeStream.format("memory").queryName("scd_stream")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      assert(spark.table("scd_stream").count() === 0L) // nothing closed yet
      mem.addData(
        Event(ts(2), 1L, "view", 1.0), Event(ts(3), 1L, "buy", 1.0),
        Event(ts(4), 1L, "buy", 1.0), Event(ts(5), 2L, "buy", 1.0))
      q.processAllAvailable()
      val got = spark.table("scd_stream").as[ClosedRun].collect().toSet
      // the view-run spans batches (3 events), closes at the first buy's ts
      assert(got === Set(ClosedRun(1L, 1, "view",
        ts(0).getTime / 1000L, ts(3).getTime / 1000L, 3L)))
      // a type change in a later batch closes the open buy run too
      mem.addData(Event(ts(6), 1L, "view", 1.0))
      q.processAllAvailable()
      val got2 = spark.table("scd_stream").as[ClosedRun].collect().toSet
      assert(got2.contains(ClosedRun(1L, 2, "buy",
        ts(3).getTime / 1000L, ts(6).getTime / 1000L, 2L)))
      assert(got2.size === 2) // user 2's single run is still open
    } finally q.stop()
  }

  test("streaming SCD closed feed equals the q123 batch closed subset on real events") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    val dir = "/root/testdata/sf0.001"
    // (user_id, ts) is collision-free in the driver tables, so the stream's
    // in-batch (ts, type, value) sort and batch q123's (ts, event_id) order
    // agree; one staged file = one batch satisfies the in-order contract
    val events = spark.read.parquet(s"$dir/events.parquet")
      .select(col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val staged = java.nio.file.Files.createTempDirectory("scd-e2e")
    events.coalesce(1).write.mode("overwrite").parquet(staged.toString)
    val stream = spark.readStream.schema(events.schema).parquet(staged.toString)
      .as[Event]
    val q = EventStreams.scdIntervalStream(stream)
      .writeStream.format("memory").queryName("scd_e2e")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    val got = try {
      q.awaitTermination()
      spark.table("scd_e2e").as[ClosedRun].collect().toSet
    } finally q.stop()
    val expected = graft.ops.Events.q123ScdIntervals(spark, dir).collect()
      .filter(!_.isNullAt(4))
      .map(r => ClosedRun(r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("streaming contamination-rate monitor equals the batch probe rollup in Complete mode") {
    import org.apache.spark.sql.functions.{col, count, lit, sum, when}
    import org.apache.spark.sql.streaming.Trigger
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), col("doc_id"), col("text"))
    val arriving = docs.filter(col("doc_id") % 100 =!= 0)
    val staged = java.nio.file.Files.createTempDirectory("contam-rate")
    arriving.coalesce(2).write.mode("overwrite").parquet(staged.toString)
    val stream = spark.readStream.schema(arriving.schema)
      .option("maxFilesPerTrigger", 1).parquet(staged.toString)
    val q = EventStreams.contaminationRateStream(stream, docs)
      .writeStream.format("memory").queryName("contam_rate")
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow())
      .start()
    val got = try {
      q.awaitTermination()
      spark.table("contam_rate").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    } finally { q.stop(); graft.CachedFrames.drain() }
    val expected = graft.ops.TextOps.bloomProbeOn(arriving,
      graft.ops.TextOps.bloomBitsOf(graft.ops.TextOps.decontamBenchGrams(docs)))
      .groupBy(col("source"))
      .agg(count(lit(1)), sum(when(col("bloom_flag"), 1L).otherwise(0L)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    graft.CachedFrames.drain()
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("streaming Benford monitor equals the batch q177 counting stage in " +
    "Complete mode across staged waves") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = graft.Tables.normalizeEventsTs(
      spark.read.parquet(s"$dir/events.parquet")).select(col("value"))
    val staged = java.nio.file.Files.createTempDirectory("benford-stream")
    events.coalesce(3).write.mode("overwrite").parquet(staged.toString)
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(staged.toString)
    val q = EventStreams.benfordStream(stream)
      .writeStream.format("memory").queryName("benford_live")
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow())
      .start()
    val got = try {
      q.awaitTermination()
      spark.table("benford_live").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    } finally q.stop()
    val expected = graft.ops.Events.benfordCounts(events).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === expected)
    assert(got.keySet.subsetOf((1 to 9).toSet) && got.values.sum > 0L)
  }

  test("activity-trend stream equals batch q141 on time-ordered real " +
    "events, with state carrying open days across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = graft.Tables.normalizeEventsTs(
      spark.read.parquet(s"$sf/events.parquet"))
    val arrivals = raw.filter(col("user_id").isNotNull)
      .selectExpr("user_id",
        "CAST(floor(unix_timestamp(ts) / 86400.0D) AS BIGINT) AS day")
      .as[UserDay].collect().sortBy(_.day)
    val mem = MemoryStream[UserDay]
    val q = EventStreams.activityTrendStream(mem.toDS())
      .writeStream.format("memory").queryName("trend_twin")
      .outputMode(OutputMode.Update).start()
    try {
      // split INSIDE a day so the open-day fold crosses the batch boundary
      val cut = {
        val half = arrivals.length / 2
        val d = arrivals(half).day
        arrivals.indexWhere(_.day == d) + 1 // first row of that day + 1
      }
      val (w1, w2) = arrivals.splitAt(cut)
      mem.addData(w1.toSeq: _*); q.processAllAvailable()
      mem.addData(w2.toSeq: _*); q.processAllAvailable()
      // Update mode appends a row per (user, batch) — the LAST row per
      // user is the live answer
      val got = spark.table("trend_twin").as[TrendRow].collect()
        .zipWithIndex.groupBy(_._1.user_id)
        .map { case (u, rs) => u -> rs.maxBy(_._2)._1 }
      val expected = graft.ops.Events.q141ActivityTrend(spark, sf).collect()
        .map(r => r.getLong(0) -> TrendRow(r.getLong(0), r.getLong(1),
          r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .toMap
      graft.CachedFrames.drain()
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("ewma stream equals batch q148 on time-ordered real events, with " +
    "the tap ring carrying open days across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = graft.Tables.normalizeEventsTs(
      spark.read.parquet(s"$sf/events.parquet"))
    val arrivals = raw.filter(col("user_id").isNotNull)
      .selectExpr("user_id",
        "CAST(floor(unix_timestamp(ts) / 86400.0D) AS BIGINT) AS day")
      .as[UserDay].collect().sortBy(_.day)
    val mem = MemoryStream[UserDay]
    val q = EventStreams.ewmaStream(mem.toDS())
      .writeStream.format("memory").queryName("ewma_twin")
      .outputMode(OutputMode.Update).start()
    try {
      // split INSIDE a day so the open-day ring crosses the batch boundary
      val cut = {
        val half = arrivals.length / 2
        val d = arrivals(half).day
        arrivals.indexWhere(_.day == d) + 1
      }
      val (w1, w2) = arrivals.splitAt(cut)
      mem.addData(w1.toSeq: _*); q.processAllAvailable()
      mem.addData(w2.toSeq: _*); q.processAllAvailable()
      val got = spark.table("ewma_twin").as[EwmaRow].collect()
        .zipWithIndex.groupBy(_._1.user_id)
        .map { case (u, rs) => u -> rs.maxBy(_._2)._1 }
      val expected = graft.ops.Events.q148Ewma(spark, sf).collect()
        .map(r => r.getLong(0) -> EwmaRow(r.getLong(0), r.getLong(1),
          r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
        .toMap
      graft.CachedFrames.drain()
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("conversion-lag stream equals the batch lag table on time-ordered " +
    "real events, one Append row per converted user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = graft.Tables.normalizeEventsTs(
      spark.read.parquet(s"$sf/events.parquet"))
    val arrivals = raw.filter(col("user_id").isNotNull)
      .selectExpr("user_id", "event_id",
        "CAST(floor(unix_timestamp(ts)) AS BIGINT) AS eps", "event_type")
      .as[UserTyped].collect().sortBy(e => (e.eps, e.event_id))
    val mem = MemoryStream[UserTyped]
    val q = EventStreams.conversionLagStream(mem.toDS())
      .writeStream.format("memory").queryName("conv_twin")
      .outputMode(OutputMode.Append).start()
    try {
      val (w1, w2) = arrivals.splitAt(arrivals.length / 2)
      mem.addData(w1.toSeq: _*); q.processAllAvailable()
      mem.addData(w2.toSeq: _*); q.processAllAvailable()
      val got = spark.table("conv_twin").as[ConvLag].collect()
        .map(r => r.user_id -> r.lag_s).toMap
      // exactly ONE row per converted user (Append never re-emits)
      assert(spark.table("conv_twin").count() === got.size.toLong)
      val expected = graft.ops.Events.conversionLags(raw).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.CachedFrames.drain()
      assert(got === expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("churn-label stream emits exactly the batch rows whose label is " +
    "confirmed by later same-user activity, split mid-stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = graft.Tables.normalizeEventsTs(
      spark.read.parquet(s"$sf/events.parquet"))
    val arrivals = raw.filter(col("user_id").isNotNull)
      .selectExpr("user_id",
        "CAST(floor(unix_timestamp(ts) / 604800.0D) AS BIGINT) AS wk",
        "CAST(floor(unix_timestamp(ts) / 86400.0D) AS BIGINT) AS day",
        "CAST(floor(value * 100.0D + 0.5D) AS BIGINT) AS cents")
      .as[ChurnEvent].collect().sortBy(e => (e.wk, e.day))
    val mem = MemoryStream[ChurnEvent]
    val q = EventStreams.churnLabelStream(mem.toDS())
      .writeStream.format("memory").queryName("churn_twin")
      .outputMode(OutputMode.Append).start()
    try {
      val (w1, w2) = arrivals.splitAt(arrivals.length / 2)
      mem.addData(w1.toSeq: _*); q.processAllAvailable()
      mem.addData(w2.toSeq: _*); q.processAllAvailable()
      val got = spark.table("churn_twin").as[ChurnLabel].collect()
        .map(r => (r.user_id, r.wk) ->
          ((r.n_events, r.n_days, r.spend_cents, r.active_next_wk))).toMap
      assert(spark.table("churn_twin").count() === got.size.toLong)
      val batch = graft.ops.Events.churnLabelsOn(raw).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
        .toMap
      // a user's LAST active week before the horizon is unconfirmed in the
      // stream (needs the user's return) — everything else matches the
      // batch exactly, including the features and both label polarities
      val lastWk = arrivals.groupBy(_.user_id).view
        .mapValues(_.map(_.wk).max).toMap
      val confirmed = batch.filter { case ((u, w), _) => w < lastWk(u) }
      graft.CachedFrames.drain()
      assert(got === confirmed)
      assert(got.values.exists(_._4))
    } finally q.stop()
  }

  test("churn-label stream: a user skipping a week gets a confirmed FALSE " +
    "label on return; the still-open week stays pending") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ChurnEvent]
    val q = EventStreams.churnLabelStream(mem.toDS())
      .writeStream.format("memory").queryName("churn_gap_twin")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: wk0 → wk1 (label TRUE); user 2: wk0 → wk2 (label FALSE —
      // confirmed the moment the user RETURNS, no censoring cut needed)
      mem.addData(ChurnEvent(1L, 0L, 3L, 100L), ChurnEvent(2L, 0L, 4L, 50L))
      q.processAllAvailable()
      mem.addData(ChurnEvent(1L, 1L, 8L, 10L), ChurnEvent(2L, 2L, 15L, 10L))
      q.processAllAvailable()
      val got = spark.table("churn_gap_twin").as[ChurnLabel].collect()
        .map(r => (r.user_id, r.wk) -> r.active_next_wk).toMap
      // open weeks (1, wk1) and (2, wk2) are pending — exactly two rows
      assert(got === Map((1L, 0L) -> true, (2L, 0L) -> false))
    } finally q.stop()
  }

  test("churn-label stream drops a late event from an earlier week: no " +
    "spurious emission, no state regression, the open week still labels " +
    "correctly when its real successor arrives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ChurnEvent]
    val q = EventStreams.churnLabelStream(mem.toDS())
      .writeStream.format("memory").queryName("churn_late_twin")
      .outputMode(OutputMode.Append).start()
    try {
      // weeks 5 then 7 arrive in order: (wk5, false) emits, wk7 open
      mem.addData(ChurnEvent(1L, 5L, 36L, 10L))
      q.processAllAvailable()
      mem.addData(ChurnEvent(1L, 7L, 50L, 20L))
      q.processAllAvailable()
      // LATE: a wk6 event arrives after wk7 opened. Before the guard this
      // emitted (wk7, false) — contradicting the batch label — and
      // regressed state to wk6, priming a duplicate (user, wk7) row later
      mem.addData(ChurnEvent(1L, 6L, 44L, 5L))
      q.processAllAvailable()
      mem.addData(ChurnEvent(1L, 8L, 57L, 1L))
      q.processAllAvailable()
      val rows = spark.table("churn_late_twin").as[ChurnLabel].collect()
      val got = rows.map(r => (r.user_id, r.wk) ->
        ((r.n_events, r.active_next_wk))).toMap
      assert(rows.length === got.size, "no duplicate (user, wk) rows")
      // wk5 labeled false (wk6 never applied), wk7 labeled TRUE by wk8
      // with its event count intact; the dropped wk6 never emits
      assert(got === Map((1L, 5L) -> ((1L, false)), (1L, 7L) -> ((1L, true))))
    } finally q.stop()
  }

  test("streaming new-vs-returning monitor equals batch q208 after every " +
    "wave on time-ordered real events split inside a day") {
    import spark.implicits._
    import org.apache.spark.sql.functions.timestamp_seconds
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val arrivals = graft.Tables.normalizeEventsTs(
      spark.read.parquet(s"$sf/events.parquet"))
      .filter(col("user_id").isNotNull)
      .selectExpr("user_id",
        "CAST(floor(unix_timestamp(ts) / 86400.0D) AS BIGINT) AS day")
      .as[UserDay].collect().sortBy(_.day)
    def batchOn(rows: Seq[UserDay]) = {
      val m = graft.ops.Events.newReturningOn(
        rows.toDF("user_id", "day")
          .withColumn("ts", timestamp_seconds(col("day") * 86400L)))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
      graft.CachedFrames.drain()
      m
    }
    val mem = MemoryStream[UserDay]
    val q = EventStreams.newReturningStream(mem.toDS())
      .writeStream.format("memory").queryName("newret_twin")
      .outputMode(OutputMode.Update).start()
    try {
      val cut = {
        val half = arrivals.length / 2
        val d = arrivals(half).day
        arrivals.indexWhere(_.day == d) + 1 // split INSIDE that day
      }
      val (w1, w2) = arrivals.splitAt(cut)
      def live() = spark.table("newret_twin").collect().zipWithIndex
        .groupBy(_._1.getLong(0)).view
        .mapValues(_.maxBy(_._2)._1) // Update mode: last row per day wins
        .toMap.map { case (d, r) =>
          d -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        }
      mem.addData(w1.toSeq: _*); q.processAllAvailable()
      assert(live() === batchOn(w1.toSeq))
      mem.addData(w2.toSeq: _*); q.processAllAvailable()
      assert(live() === batchOn(arrivals.toSeq))
    } finally q.stop()
  }

  test("streaming split-leakage monitor equals the batch q196 counting " +
    "stage in Complete mode after EVERY wave (the merge law live), " +
    "against a static roster") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = (1L to 60L).toDF("doc_id")
    val base = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L), (21L, 40L))
    val delta = Seq((9L, 10L), (22L, 41L), (24L, 55L), (25L, 60L))
    def batchCounts(edges: Seq[(Long, Long)]) = {
      val m = graft.ops.TextOps.splitClassCounts(
        edges.toDF("id1", "id2"), graft.ops.TextOps.splitTagOf(docs))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      graft.CachedFrames.drain()
      m
    }
    val mem = MemoryStream[(Long, Long)]
    val q = EventStreams.splitLeakageStream(
      mem.toDF().toDF("id1", "id2"), docs)
      .writeStream.format("memory").queryName("leakage_live")
      .outputMode(OutputMode.Complete).start()
    try {
      def live() = spark.table("leakage_live").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      mem.addData(base: _*); q.processAllAvailable()
      assert(live() === batchCounts(base))
      mem.addData(delta: _*); q.processAllAvailable()
      assert(live() === batchCounts(base ++ delta))
    } finally q.stop()
  }

  test("streaming order-cadence monitor emits exactly the batch q224 gap " +
    "rows after every time-ordered wave on real orders, and drops a " +
    "replayed duplicate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val arrivals = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_custkey").isNotNull)
      .selectExpr("o_custkey", "o_orderkey",
        "CAST(floor(unix_timestamp(o_orderdate) / 86400.0D) AS BIGINT) AS od")
      .as[OrderArrival].collect().sortBy(a => (a.od, a.o_orderkey))
    def batchGaps(rows: Seq[OrderArrival]) = {
      val s = graft.ops.Relational.orderGapsOn(
        rows.toDF("o_custkey", "o_orderkey", "od"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      graft.CachedFrames.drain()
      s
    }
    val mem = MemoryStream[OrderArrival]
    val q = EventStreams.orderGapStream(mem.toDS())
      .writeStream.format("memory").queryName("gap_twin")
      .outputMode(OutputMode.Append).start()
    try {
      def live() = spark.table("gap_twin").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val (w1, w2) = arrivals.splitAt(arrivals.length / 2)
      mem.addData(w1.toSeq: _*); q.processAllAvailable()
      assert(live().toSet === batchGaps(w1.toSeq))
      assert(live().length === live().toSet.size) // no double emission
      mem.addData(w2.toSeq: _*); q.processAllAvailable()
      assert(live().toSet === batchGaps(arrivals.toSeq))
      assert(live().length === live().toSet.size)
      // at-least-once replay of already-seen anchors: nothing re-emitted
      mem.addData(w2.takeRight(3).toSeq: _*); q.processAllAvailable()
      assert(live().toSet === batchGaps(arrivals.toSeq))
      assert(live().length === live().toSet.size)
    } finally q.stop()
  }
}
