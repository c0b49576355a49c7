package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bounded persist helper for query builders that cache an intermediate
  * (t16's survivor table, t21's tf table, q23's revenue table). The
  * builders are re-invoked per bench rep (3x per run) and each
  * invocation builds a fresh DataFrame, so a bare `.persist()` pins a
  * new copy every rep and relies on LRU eviction to survive. Keying the
  * last persisted copy per (session, site) and unpersisting it on the
  * next invocation bounds executor storage to one live copy per site
  * regardless of rep count, without giving up the intra-plan reuse the
  * persist exists for (the returned lazy plan still reads the fresh
  * cache multiple times).
  */
private[queries] object CachePool {

  private val last =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Persist `df`, releasing whatever the previous invocation of `site`
    * pinned in this session (non-blocking unpersist).
    *
    * Same-plan re-invocations (every bench rep) are NOT released:
    * Spark's CacheManager keys cached data by canonicalized plan, so
    * the fresh persist() and the previous one share a single cache
    * entry — unpersisting the old handle would wipe the entry out from
    * under the new one (observed as q23 losing its InMemoryTableScans).
    * Only a genuinely different plan — a new sf dir — releases the
    * previous copy. */
  def persistLatest(site: String, df: DataFrame): DataFrame = {
    val p = df.persist()
    last.put((df.sparkSession, site), p).foreach { old =>
      if (!old.queryExecution.analyzed.sameResult(p.queryExecution.analyzed))
        old.unpersist(blocking = false)
    }
    p
  }
}
