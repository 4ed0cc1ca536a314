package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import scala.collection.mutable
import scala.collection.mutable.ListBuffer

/** Per-thread registry of frames a query builder persists, so the runner
  * (graft.Verify / graft.Bench) can `drain()` them once the query's action
  * completes. Query builders return lazy plans, so they cannot unpersist
  * the frames themselves — but leaving every query's cache alive for a
  * whole multi-query run (as round 1 did) piles avoidable pressure on
  * executor memory and spams "already cached" warnings.
  *
  * Entries are REFERENCE-COUNTED on the canonicalized analyzed plan (the
  * same key Spark's CacheManager dedupes on): concurrent runner threads
  * that build queries sharing a sub-plan (e.g. the embeddings vector frame
  * feeding q29/q46/q74/q75/q79/q80) each take a reference, and the cache
  * entry is only unpersisted when the LAST holder drains. Without this, a
  * thread finishing first unpersists a cache another thread's RUNNING job
  * still scans — under AQE a stage re-planned at that moment can observe
  * the relation as empty and propagate an empty join result (seen as q80
  * deterministically dumping 0 rows in full Verify runs while correct in
  * isolation). Thread-local tracking + global refcounts make drain safe
  * regardless of completion order. */
object CachedFrames {
  private final class Entry(val df: DataFrame, var refs: Int)

  // guarded by its own monitor; keys are canonicalized analyzed plans,
  // the same structural identity CacheManager.lookupCachedData uses
  private val shared = mutable.Map.empty[LogicalPlan, Entry]

  private val frames = new ThreadLocal[ListBuffer[DataFrame]] {
    override def initialValue(): ListBuffer[DataFrame] = ListBuffer.empty
  }

  /** How many live entries before [[track]] warns: a healthy run holds a
    * handful of shared sub-plans per in-flight query; hundreds means some
    * thread is tracking without ever draining. */
  private val LeakWarnThreshold = 64

  /** Next entry count that triggers the leak warning; doubles on each warn
    * (guarded by `shared`'s lock). */
  private var warnAt = LeakWarnThreshold

  /** Persist `df` (first holder only) and remember it for the next
    * `drain()` on this thread.
    *
    * CONTRACT: every thread that calls track() MUST eventually call
    * `drain()` (or `drainSince(mark())` for nested composition) on that
    * SAME thread, in a `finally` — a builder invoked outside a runner, or
    * a runner that throws before its finally, pins the Entry and its
    * persisted DataFrame for the JVM lifetime (refs never reach zero).
    * [[entryCount]] is the leak diagnostic; track() warns at geometrically
    * spaced sizes (first past [[LeakWarnThreshold]], then each doubling), so
    * a continuing leak keeps signalling without spamming at a plateau. */
  def track(df: DataFrame): DataFrame = {
    val key = df.queryExecution.analyzed.canonicalized // analyze outside lock
    val (n, warn) = shared.synchronized {
      val e = shared.getOrElseUpdate(key, new Entry(df, 0))
      e.refs += 1
      if (e.refs == 1) e.df.persist()
      val w = shared.size > warnAt
      if (w) warnAt = shared.size * 2
      (shared.size, w)
    }
    if (warn)
      System.err.println(s"[CachedFrames] $n live cache entries — some " +
        "thread is tracking frames without draining (see track() contract)")
    frames.get += df
    df
  }

  /** Live shared-entry count — the observability hook for leak detection
    * in long-lived sessions (a drained steady state returns to ~0). */
  def entryCount: Int = shared.synchronized(shared.size)

  /** Release this thread's references; unpersist (non-blocking) only the
    * entries whose last holder this thread was. */
  def drain(): Unit = drainFrom(0)

  /** Position marker for [[drainSince]]: library functions that drain
    * their OWN caches mid-pipeline (e.g. `Curation.curateToShards`) must
    * not release frames their caller tracked earlier on the same thread —
    * refcounting protects cross-thread sharing, not nested same-thread
    * composition. */
  def mark(): Int = frames.get.size

  /** Release only the references tracked on this thread since `mark`. */
  def drainSince(mark: Int): Unit = drainFrom(math.max(0, mark))

  private def drainFrom(from: Int): Unit = {
    val list = frames.get
    val toRelease = list.drop(from)
    val keys = toRelease.map(_.queryExecution.analyzed.canonicalized)
    shared.synchronized {
      keys.foreach { key =>
        shared.get(key).foreach { e =>
          e.refs -= 1
          if (e.refs <= 0) {
            e.df.unpersist(false)
            shared.remove(key)
          }
        }
      }
      // recovered below the threshold: re-arm the warning for the next leak
      if (shared.size <= LeakWarnThreshold) warnAt = LeakWarnThreshold
    }
    list.remove(from, list.size - from)
  }
}
