package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Regression for the cross-thread cache race behind q80's empty Verify
  * dump: concurrent runner threads build queries sharing a cached sub-plan
  * (CacheManager dedupes on the canonicalized plan), and before
  * refcounting, whichever thread finished FIRST unpersisted the entry
  * while the other thread's job still scanned it — under AQE the victim
  * query could observe the relation empty and collapse its inner joins to
  * zero rows. The contract: drain() only unpersists an entry once its
  * LAST holder has drained. */
class CachedFramesSpec extends AnyFunSuite with SparkSpec {

  private def build() =
    spark.range(1000).toDF("x").filter(col("x") % 7 === 1)

  test("a shared entry survives the first holder's drain; the last holder unpersists") {
    val mine = CachedFrames.track(build())
    assert(mine.storageLevel !== StorageLevel.NONE)

    // a second thread tracks an EQUAL plan (same canonicalized form), then
    // finishes its query and drains — the entry must stay cached for us
    val t = new Thread(() => { CachedFrames.track(build()); CachedFrames.drain() })
    t.start(); t.join()
    assert(mine.storageLevel !== StorageLevel.NONE,
      "first drain of a shared entry must not unpersist it")
    assert(mine.count() === 143)

    CachedFrames.drain() // we are the last holder
    assert(mine.storageLevel === StorageLevel.NONE)
  }

  test("independent entries still unpersist on their own thread's drain") {
    val mine = CachedFrames.track(build())
    CachedFrames.drain()
    assert(mine.storageLevel === StorageLevel.NONE)
  }

  // --- the q175 embedded-cached-plan race, closed as a class by begin() ---
  // Shape: thread B tracks (and caches) a frame; query A merely EMBEDS that
  // frame's plan without tracking it. CacheManager substitutes B's cached
  // relation into A's execution, so before begin(), B draining last
  // unpersisted the relation mid-scan and A shipped 0 rows (q80 round 7,
  // q175 round 13 — commit 9fcac12). begin() pins every tracked entry whose
  // key appears in A's plan-signature set, whichever side arrives first.

  private def runJoined(body: => Unit): Unit = {
    var err: Option[Throwable] = None
    val t = new Thread(() => try body catch { case e: Throwable => err = Some(e) })
    t.start(); t.join()
    err.foreach(throw _)
  }

  test("begin() pins an already-cached entry a query embeds, so the " +
    "tracker's drain cannot unpersist it mid-query (q175 shape)") {
    val base = build()
    // thread B: tracks the shared frame, holds it across our begin
    val bDrained = new java.util.concurrent.CountDownLatch(1)
    val bTracked = new java.util.concurrent.CountDownLatch(1)
    var bErr: Option[Throwable] = None
    val b = new Thread(() => try {
      CachedFrames.track(build())
      bTracked.countDown()
      bDrained.await()
      CachedFrames.drain()
    } catch { case e: Throwable => bErr = Some(e) })
    b.start(); bTracked.await()
    // main thread = query A: embeds base's plan WITHOUT tracking it
    val embedder = base.groupBy().agg(sum(col("x")).as("s"))
    CachedFrames.begin(embedder)
    bDrained.countDown(); b.join()
    bErr.foreach(throw _)
    assert(base.storageLevel !== StorageLevel.NONE,
      "tracker's drain must not unpersist an entry an in-flight query embeds")
    assert(embedder.collect().head.getLong(0) === (0 until 1000).filter(_ % 7 == 1).sum)
    CachedFrames.drain() // A retires: last holder, entry released
    assert(base.storageLevel === StorageLevel.NONE)
    assert(CachedFrames.entryCount === 0)
  }

  test("an entry created AFTER begin() is pinned onto the in-flight " +
    "embedder at track() time (the window a begin-time scan misses)") {
    val base = build()
    val embedder = base.filter(col("x") > 100).groupBy().count()
    CachedFrames.begin(embedder) // base not cached yet — nothing to pin yet
    // thread B now tracks the embedded plan, runs its query, and drains
    runJoined {
      CachedFrames.track(build()).count()
      CachedFrames.drain()
    }
    assert(base.storageLevel !== StorageLevel.NONE,
      "a fresh entry embedded in an in-flight query must survive its " +
        "creator's drain")
    assert(embedder.collect().head.getLong(0) ===
      (0 until 1000).count(x => x % 7 == 1 && x > 100))
    CachedFrames.drain()
    assert(base.storageLevel === StorageLevel.NONE)
    assert(CachedFrames.entryCount === 0)
  }

  test("begin() on a query embedding nothing tracked pins nothing and " +
    "leaves other threads' entries untouched") {
    val unrelated = spark.range(200).toDF("y")
    CachedFrames.begin(unrelated.groupBy().count())
    runJoined {
      val theirs = CachedFrames.track(build())
      CachedFrames.drain()
      assert(theirs.storageLevel === StorageLevel.NONE,
        "an unrelated in-flight query must not pin a foreign entry")
    }
    CachedFrames.drain()
    assert(CachedFrames.entryCount === 0)
  }

  test("drainSince keeps begin() pins — they belong to the enclosing query") {
    val base = build()
    // this thread is both the holder and the embedder: one tracked ref plus
    // one begin() pin; a nested drainSince must release neither
    CachedFrames.track(base)
    CachedFrames.begin(base.groupBy().count())
    val m = CachedFrames.mark()
    CachedFrames.track(spark.range(50).toDF("z"))
    CachedFrames.drainSince(m)
    assert(base.storageLevel !== StorageLevel.NONE,
      "nested drainSince must not release the enclosing query's pins")
    CachedFrames.drain()
    assert(base.storageLevel === StorageLevel.NONE)
    assert(CachedFrames.entryCount === 0)
  }

  test("drainSince releases only frames tracked after the mark — nested " +
    "library composition keeps the caller's caches") {
    val callers = CachedFrames.track(build())
    val m = CachedFrames.mark()
    val nested = CachedFrames.track(
      spark.range(500).toDF("x").filter(col("x") % 3 === 0))
    CachedFrames.drainSince(m)
    assert(nested.storageLevel === StorageLevel.NONE,
      "nested frame should be released")
    assert(callers.storageLevel !== StorageLevel.NONE,
      "caller's earlier frame must survive the nested drain")
    CachedFrames.drain()
    assert(callers.storageLevel === StorageLevel.NONE)
  }
}
