package graft.core

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Query-scoped cache registry. Query builders return LAZY plans, so a
  * `.cache()` inside a builder cannot be unpersisted by the builder
  * itself — the materialization happens later, in the driver action
  * (Verify's parquet write, Bench's count, a spec's collect). Left
  * alone, those caches live for the session: across a 58-query battery
  * (or a long-lived service session) they accumulate without bound.
  *
  * Discipline: builders register every cache here instead of calling
  * `.cache()` directly; each driver harness calls [[drain]] once the
  * query's action has completed, then asserts the session cache manager
  * is actually empty ([[assertEmpty]]) so an unregistered cache fails
  * fast instead of leaking. The registry is a concurrent queue —
  * builders may run on the driver only, but specs run suites in
  * parallel JVMs and the queue keeps ordering irrelevant.
  */
object Caches {

  private val live =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** `.cache()` + register for the next [[drain]]. */
  def cached(df: DataFrame): DataFrame = {
    val c = df.cache()
    live.add(c)
    c
  }

  /** `.persist(level)` + register for the next [[drain]]. */
  def persisted(df: DataFrame, level: StorageLevel): DataFrame = {
    val c = df.persist(level)
    live.add(c)
    c
  }

  /** Unpersist every cache registered since the last drain. Non-blocking:
    * block eviction proceeds asynchronously; the plans are already
    * de-registered from the cache manager synchronously. Entries whose
    * owning session has already stopped (Bench's scaling ladder spins
    * up and tears down whole sessions) are skipped — their cache died
    * with the session. */
  def drain(): Unit = {
    var d = live.poll()
    while (d != null) {
      try d.unpersist(blocking = false)
      catch { case _: Throwable => () } // session gone — nothing to free
      d = live.poll()
    }
  }

  /** Assert the session holds zero cached plans — call after [[drain]]
    * in driver harnesses; trips on any cache that bypassed [[cached]]. */
  def assertEmpty(spark: SparkSession): Unit =
    require(GraftBridge.cacheManagerEmpty(spark),
      "cache manager not empty after drain — an unregistered " +
        ".cache()/persist() leaked past its query")
}
