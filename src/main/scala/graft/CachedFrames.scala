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
  * regardless of completion order.
  *
  * ==The embedded-cached-plan race, closed as a class==
  * Refcounting alone only protects entries a query TRACKS. A query whose
  * plan merely EMBEDS a sub-plan that some other query tracks (q175
  * embedding the bare `vecs` projection) holds no reference — yet at
  * physical planning Spark's CacheManager substitutes the cached relation
  * for that subtree, so the concurrent holder draining last unpersists it
  * mid-scan and the embedder silently ships 0 rows (q80 round 7, then
  * q175 round 13 — both repaired by hand-adding `track()` calls, which
  * does nothing for query #186). [[begin]] closes the class: runners call
  * it on the built DataFrame before executing, registering the query's
  * full canonicalized-subtree SIGNATURE SET as in-flight. Both directions
  * of the race are then covered without per-query code:
  *  - entries alive at `begin` whose key appears in the signature set are
  *    pinned (one reference, released by this thread's `drain`);
  *  - an entry CREATED LATER by another thread's `track` — the window a
  *    begin-time scan alone would miss, since CacheManager would still
  *    substitute it into this query's not-yet-planned action — is pinned
  *    onto every in-flight query whose signature set contains its key, at
  *    creation time, under the same lock.
  * The signature set is a static property of the analyzed plan, so the
  * guarantee is independent of WHEN Spark decides to substitute. */
object CachedFrames {
  private final class Entry(val df: DataFrame, var refs: Int)

  // guarded by its own monitor; keys are canonicalized analyzed plans,
  // the same structural identity CacheManager.lookupCachedData uses
  private val shared = mutable.Map.empty[LogicalPlan, Entry]

  // canonicalized-subtree signature sets of in-flight queries (thread id →
  // signatures) and the keys auto-pinned on each thread's behalf; both
  // guarded by `shared`'s monitor. Maps keyed by thread id rather than a
  // ThreadLocal because `track` on thread B must be able to pin an entry
  // onto in-flight thread A.
  private val active = mutable.Map.empty[Long, Set[LogicalPlan]]
  private val pins = mutable.Map.empty[Long, ListBuffer[LogicalPlan]]

  // keys (not DataFrames) tracked by this thread, in track() order
  private val frames = new ThreadLocal[ListBuffer[LogicalPlan]] {
    override def initialValue(): ListBuffer[LogicalPlan] = ListBuffer.empty
  }

  /** How many live entries before [[track]] warns: a healthy run holds a
    * handful of shared sub-plans per in-flight query; hundreds means some
    * thread is tracking without ever draining. */
  private val LeakWarnThreshold = 64

  /** Next entry count that triggers the leak warning; doubles on each warn
    * (guarded by `shared`'s lock). */
  private var warnAt = LeakWarnThreshold

  /** Every canonicalized subtree of `plan`, including subquery plans nested
    * in expressions — the set CacheManager substitution decisions are drawn
    * from (lookupCachedData matches on canonicalized subtree equality). */
  private def signatures(plan: LogicalPlan): Set[LogicalPlan] = {
    val sigs = mutable.Set.empty[LogicalPlan]
    def walk(p: LogicalPlan): Unit = p.foreach { node =>
      sigs += node
      node.subqueries.foreach(walk)
    }
    walk(plan.canonicalized)
    sigs.toSet
  }

  /** Declare a built query in-flight on this thread: every tracked entry
    * whose plan is embedded anywhere in `df`'s analyzed plan (now or until
    * this thread's next full [[drain]]) takes a reference on this thread's
    * behalf, so no concurrent drain can unpersist a relation CacheManager
    * may substitute into this query's execution. Call it AFTER the builder
    * returns and BEFORE the action; the same `finally drain()` that releases
    * tracked frames releases the pins and retires the in-flight entry.
    * Returns `df` for call-site chaining. Idempotent per query; calling it
    * again on the same thread (e.g. a grouped Bench rep running several
    * queries before one drain) widens the signature set — earlier pins are
    * kept until the drain. */
  def begin(df: DataFrame): DataFrame = {
    val sigs = signatures(df.queryExecution.analyzed) // analyze outside lock
    val tid = Thread.currentThread().getId
    shared.synchronized {
      val widened = active.get(tid).fold(sigs)(_ ++ sigs)
      active(tid) = widened
      val mine = pins.getOrElseUpdate(tid, ListBuffer.empty)
      // pin entries alive now; entries created later are pinned by track()
      sigs.foreach { key =>
        shared.get(key).foreach { e => e.refs += 1; mine += key }
      }
    }
    df
  }

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
    val tid = Thread.currentThread().getId
    val (n, warn) = shared.synchronized {
      val fresh = !shared.contains(key)
      val e = shared.getOrElseUpdate(key, new Entry(df, 0))
      e.refs += 1
      if (e.refs == 1) e.df.persist()
      // a NEWLY created entry may be embedded in a query some OTHER thread
      // already declared in-flight via begin() — CacheManager will
      // substitute this cache into that query's future planning, so pin it
      // for them here (an entry alive at their begin() was pinned there;
      // fresh-entry creation is the only path begin() cannot see)
      if (fresh) active.foreach { case (otherTid, sigs) =>
        if (otherTid != tid && sigs.contains(key)) {
          e.refs += 1
          pins.getOrElseUpdate(otherTid, ListBuffer.empty) += key
        }
      }
      val w = shared.size > warnAt
      if (w) warnAt = shared.size * 2
      (shared.size, w)
    }
    if (warn)
      System.err.println(s"[CachedFrames] $n live cache entries — some " +
        "thread is tracking frames without draining (see track() contract)")
    frames.get += key
    df
  }

  /** Live shared-entry count — the observability hook for leak detection
    * in long-lived sessions (a drained steady state returns to ~0). */
  def entryCount: Int = shared.synchronized(shared.size)

  /** Release this thread's references — tracked frames AND [[begin]] pins —
    * and retire its in-flight signature set; unpersist (non-blocking) only
    * the entries whose last holder this thread was. */
  def drain(): Unit = drainFrom(0)

  /** Position marker for [[drainSince]]: library functions that drain
    * their OWN caches mid-pipeline (e.g. `Curation.curateToShards`) must
    * not release frames their caller tracked earlier on the same thread —
    * refcounting protects cross-thread sharing, not nested same-thread
    * composition. */
  def mark(): Int = frames.get.size

  /** Release only the references tracked on this thread since `mark` —
    * [[begin]] pins and the in-flight signature set are NOT released (they
    * belong to the enclosing query, which drains fully in its own
    * `finally`). */
  def drainSince(mark: Int): Unit = drainFrom(math.max(0, mark))

  private def drainFrom(from: Int): Unit = {
    val list = frames.get
    val keys = list.drop(from).toList
    val tid = Thread.currentThread().getId
    shared.synchronized {
      // a FULL drain ends the thread's in-flight query: release its begin()
      // pins and retire the signature set so track() stops pinning for it
      val pinned: List[LogicalPlan] =
        if (from == 0) {
          active.remove(tid)
          pins.remove(tid).map(_.toList).getOrElse(Nil)
        } else Nil
      (keys ++ pinned).foreach { key =>
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
