package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry of the cache entries this library's operators
  * persist for their own multi-action lifetimes (Lloyd loops, PQ trainings,
  * candidate frames, range-exchange pins).
  *
  * The lifecycle problem it solves (VERDICT r6): an operator like
  * [[Similarity.semanticDedup]] must persist its shared frame BEFORE
  * returning — the returned DataFrame is lazy, so the cache has to outlive
  * the call — which means the operator itself can never safely unpersist.
  * Before this registry those persists were untracked: a sweep over the
  * ANN/semdedup query family accumulated orphaned cache entries until
  * someone called `spark.catalog.clearCache()`, which also nukes CALLER
  * caches. The lease registry keeps the lazy-result performance contract
  * and adds precise reclamation:
  *
  *  - [[acquire]] persists only when nothing cached the plan yet (a caller
  *    who persisted the frame for a larger composition keeps ownership —
  *    e.g. PQ.pqRecall sharing one prepared frame across training, encoding
  *    and ground truth) and records the lease;
  *  - [[releaseAll]] unpersists exactly the leased frames — sweep drivers
  *    call it after materializing each query's result, leaving any
  *    user-owned cache entries alone.
  *
  * Sessions are weak keys: a dropped SparkSession must not be pinned by its
  * outstanding leases.
  */
object CacheLease {

  private val leases =
    new java.util.WeakHashMap[SparkSession, java.util.ArrayList[DataFrame]]()

  /** Persist `df` only if nothing cached it yet; record the lease so
    * [[releaseAll]] can reclaim it. Returns whether THIS call persisted
    * (callers that unpersist early only unpersist what they persisted). */
  def acquire(df: DataFrame): Boolean = synchronized {
    if (df.storageLevel == StorageLevel.NONE) {
      df.persist()
      leases.computeIfAbsent(df.sparkSession,
        _ => new java.util.ArrayList[DataFrame]()).add(df)
      true
    } else false
  }

  /** Outstanding leases for a session (spec/diagnostic surface). */
  def leasedCount(spark: SparkSession): Int = synchronized {
    Option(leases.get(spark)).map(_.size).getOrElse(0)
  }

  /** Unpersist every frame this library leased for `spark`. Non-blocking,
    * idempotent; user-persisted frames are untouched. Call between queries
    * of a sweep, or whenever the results of the leased operators have been
    * materialized. */
  def releaseAll(spark: SparkSession): Unit = synchronized {
    Option(leases.remove(spark)).foreach { l =>
      l.forEach { df => df.unpersist(blocking = false); () }
    }
  }
}
