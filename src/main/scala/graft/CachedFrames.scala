package graft

import org.apache.spark.sql.DataFrame
import scala.collection.mutable.ListBuffer

/** Per-thread registry of frames a query builder persists, so the runner
  * (graft.Verify / graft.Bench) can `drain()` them once the query's action
  * completes. Query builders return lazy plans, so they cannot unpersist
  * the frames themselves — but leaving every query's cache alive for a
  * whole 50-query run (as round 1 did) piles avoidable pressure on executor
  * memory and spams "already cached" warnings. Thread-local because Verify
  * materializes queries from a small thread pool: each runner thread drains
  * exactly the frames its own query tracked. */
object CachedFrames {
  private val frames = new ThreadLocal[ListBuffer[DataFrame]] {
    override def initialValue(): ListBuffer[DataFrame] = ListBuffer.empty
  }

  /** Persist `df` and remember it for the next `drain()` on this thread. */
  def track(df: DataFrame): DataFrame = {
    df.persist()
    frames.get += df
    df
  }

  /** Unpersist (non-blocking) everything tracked on this thread. */
  def drain(): Unit = {
    frames.get.foreach(_.unpersist(false))
    frames.get.clear()
  }
}
