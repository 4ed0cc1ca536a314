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
