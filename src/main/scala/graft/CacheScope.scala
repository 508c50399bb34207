package graft

import org.apache.spark.sql.DataFrame

/** Session cache hygiene (VERDICT r3 "What's wrong" #3): queries that cache
  * an intermediate frame register it here instead of calling `.cache()`
  * directly; whoever materializes the query (Bench, Verify, Runner, a test)
  * calls `drain()` afterwards to unpersist every registered frame. A
  * long-lived `serve` session then cannot accumulate orphaned cached
  * subtrees — `spark.catalog.clearCache()` per query papered over this in
  * Bench but not in the daemon path.
  */
object CacheScope {
  private val frames =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Cache `df` and register it for the next `drain()`. */
  def cached(df: DataFrame): DataFrame = { frames.add(df.cache()); df }

  /** Unpersist every registered frame (non-blocking). Safe to call when
    * nothing is registered, and safe to call more than once. */
  def drain(): Unit = {
    var f = frames.poll()
    while (f != null) { f.unpersist(false); f = frames.poll() }
  }
}
