package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cache hygiene for long-lived library sessions.
  *
  * Registry queries may `.persist()` internal fan-out frames and do
  * NOT unpersist them (the returned plan still references them — see
  * the caching contract on [[graft.queries.QueryDef]]). Verify/Bench
  * call `spark.catalog.clearCache()` between queries; an interactive
  * session composing many registry queries would instead accumulate
  * executor storage until LRU eviction. [[withCaches]] gives such
  * callers a deterministic scope: consume the result inside, and
  * every RDD persisted during the scope is dropped on exit — without
  * touching caches the caller had created beforehand (which
  * `clearCache()` would clobber).
  */
object CacheScope {

  /** Run `f` and then unpersist every RDD that was persisted during
    * it. `f` must CONSUME its DataFrames (run the actions) — any
    * still-lazy plan returned out of the scope will recompute its
    * formerly-cached segments. Non-blocking unpersist: storage is
    * released asynchronously, safe because nothing references it. */
  def withCaches[A](spark: SparkSession)(f: => A): A = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    try f
    finally sc.getPersistentRDDs
      .filterNot { case (id, _) => before.contains(id) }
      .foreach { case (_, rdd) => rdd.unpersist(blocking = false) }
  }

  /** Evaluate one registry query under [[withCaches]]: build the
    * frame, apply the consuming `action` (count, collect, write, …),
    * release the query's internal caches, return the action's result. */
  def evaluate[A](spark: SparkSession, dir: String)(
      query: (SparkSession, String) => DataFrame)(action: DataFrame => A): A =
    withCaches(spark)(action(query(spark, dir)))
}
