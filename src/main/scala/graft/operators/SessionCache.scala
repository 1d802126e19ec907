package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, key) materialized-artifact cache — the in-session
  * stand-in for the persisted tables a 100 TB deployment keeps on
  * storage (band-signature indexes, PQ code tables, ground-truth
  * eval sets). Built once, persisted MEMORY_AND_DISK and counted
  * eagerly so a consumer finds the artifact BUILT, as in production.
  *
  * Keyed weakly by the session: a restarted session must not see a
  * predecessor's dead cached plan. The cached DataFrames strongly
  * reference their session, so the weak KEY alone can never clear
  * (value → key edge, per WeakHashMap contract) — stopped sessions
  * are swept explicitly or every dead session's plans would stay on
  * the driver heap for the JVM lifetime.
  */
private[graft] object SessionCache {

  private val caches = new java.util.WeakHashMap[
    SparkSession, java.util.concurrent.ConcurrentHashMap[String, DataFrame]]

  // Build/hit counters so a bench can label each timed window with
  // the artifact state it measured: a query whose artifacts were all
  // cache HITS times a MEMORY_AND_DISK scan, not the mining that
  // built it, and its number must say so (BENCH_map "artifact").
  private val buildsSeen = new java.util.concurrent.atomic.AtomicLong(0)
  private val hitsSeen = new java.util.concurrent.atomic.AtomicLong(0)

  /** Monotone (builds, hits) totals since JVM start — snapshot before
    * and after a timed window to classify it. */
  def stats: (Long, Long) = (buildsSeen.get(), hitsSeen.get())

  def get(s: SparkSession, key: String, build: => DataFrame): DataFrame = {
    val perSession = caches.synchronized {
      val it = caches.keySet.iterator()
      while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
      var m = caches.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]
        caches.put(s, m)
      }
      m
    }
    // NOT computeIfAbsent: an artifact's build may read ANOTHER
    // cached artifact (cc labels build over the cached pair table),
    // and a nested computeIfAbsent on one ConcurrentHashMap throws
    // "Recursive update". Check-then-putIfAbsent is reentrant; if
    // two threads race, the loser's duplicate build is unpersisted.
    val existing = perSession.get(key)
    if (existing != null) { hitsSeen.incrementAndGet(); existing }
    else {
      buildsSeen.incrementAndGet()
      val df = build
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      val prev = perSession.putIfAbsent(key, df)
      if (prev != null) { df.unpersist(); prev } else df
    }
  }
}
