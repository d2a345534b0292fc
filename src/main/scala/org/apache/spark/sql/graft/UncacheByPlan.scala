package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Unpersist a cached Dataset by its LOGICAL PLAN when the Dataset
  * object itself is no longer reachable. `CacheManager` holds every
  * `persist()`ed plan (and its `InMemoryRelation`, and through it the
  * cached blocks) STRONGLY until an explicit `uncacheQuery` — a
  * DataFrame that gets GC'd with its cache still registered leaks
  * those blocks for the life of the session, because `ContextCleaner`
  * only reclaims RDD/broadcast state whose owning objects are
  * themselves weakly reachable, which an `InMemoryRelation` held by
  * the manager never is. Consumers that track cached frames weakly
  * (see `graft.dedup.Dedup.registerPersisted`) keep the plan and call
  * this once the weak reference clears. `CacheManager` is
  * `private[sql]`, hence this shim's package. */
object UncacheByPlan {
  def uncache(session: SparkSession, plan: LogicalPlan): Unit =
    try {
      val cs = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      cs.sharedState.cacheManager
        .uncacheQuery(cs, plan, cascade = false, blocking = false)
    } catch { case _: Throwable => () }

  /** Whether CacheManager still holds an entry for `plan` — test/
    * diagnostic probe for the dead-entry sweep above. */
  def isCached(session: SparkSession, plan: LogicalPlan): Boolean =
    try {
      val cs = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      cs.sharedState.cacheManager
        .lookupCachedData(org.apache.spark.sql.classic.Dataset.ofRows(cs, plan))
        .isDefined
    } catch { case _: Throwable => false }
}
