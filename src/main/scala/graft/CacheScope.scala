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
    * nothing is registered, safe to call more than once, and safe when a
    * registered frame belongs to an already-stopped session (plan-only
    * consumers may build caching queries in a session that dies before
    * the next drain — its blocks died with it, so the unpersist RPC
    * failing is fine; the entry still leaves the registry either way). */
  def drain(): Unit = {
    var f = frames.poll()
    while (f != null) {
      try f.unpersist(false)
      catch { case _: Exception => () }
      f = frames.poll()
    }
  }
}
