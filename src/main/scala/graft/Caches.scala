package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Scoped registry for persisted intermediate frames shared across queries
  * (the round-1 leak: `Dedup.postings` / `LogCorpus.parsed` persisted on
  * every invocation and nothing ever unpersisted, so a long-lived session
  * accreted cached partitions).
  *
  * One live entry per family: requesting a new key under the same family
  * unpersists the previous frame first, so the session holds at most one
  * cached corpus per family no matter how many (sf, params) combinations a
  * long-lived server sees. Same-key requests return the SAME persisted
  * instance, so the "Asked to cache already cached data" re-persist warnings
  * disappear too.
  */
object Caches {
  // MEMORY_AND_DISK measured equivalent to _SER / DISK_ONLY here (the
  // columnar-batch build dominates persist cost, reread ~0.1s at sf0.1
  // for all levels — tools.CacheLevelProbe), so keep the default level.
  private val live =
    scala.collection.mutable.Map.empty[String, (String, DataFrame)]

  /** The cached frame for (family, key), building + persisting on first use.
    * A key change within a family evicts the predecessor.
    */
  def cached(family: String, key: String)(build: => DataFrame): DataFrame =
    synchronized {
      live.get(family) match {
        case Some((k, df)) if k == key => df
        case prev =>
          prev.foreach(_._2.unpersist(blocking = false))
          val df = build.persist(StorageLevel.MEMORY_AND_DISK)
          live(family) = (key, df)
          df
      }
    }

  /** Release every cached frame (test teardown / session shutdown). */
  def clear(): Unit = synchronized {
    live.values.foreach(_._2.unpersist(blocking = false))
    live.clear()
  }
}
