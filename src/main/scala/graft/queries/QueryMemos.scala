package graft.queries

/** Registry of the driver-side TRAINING memos (BPE merge table,
  * classifier weights — deterministic artifacts memoized per sf dir so
  * the queries sharing a trained artifact don't each re-pay training;
  * ADVICE r7). Unlike persisted DataFrames, these survive
  * `spark.catalog.clearCache()`, so a bench that re-samples a training
  * query would measure its own memo: the sf10 leg recorded
  * q_bpe_merges at 0.098 s because the >4 s cold first sample tripped
  * median-of-3 and both re-samples hit the warm merge table (isolated
  * cost: 3.7 s). Bench clears these between re-samples of the SAME
  * query; the cross-query sharing within a fleet run is unchanged.
  */
object QueryMemos {

  private val memos =
    scala.collection.mutable.ArrayBuffer.empty[java.util.concurrent.ConcurrentHashMap[String, _]]

  private[queries] def register[M <: java.util.concurrent.ConcurrentHashMap[String, _]](m: M): M =
    synchronized { memos += m; m }

  /** Drop every registered training artifact (they rebuild
    * deterministically on next use). */
  def clearTraining(): Unit = synchronized { memos.foreach(_.clear()) }
}
