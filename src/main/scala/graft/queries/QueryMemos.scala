package graft.queries

/** Registry of the driver-side TRAINING memos (BPE merge table,
  * classifier weights — deterministic artifacts memoized per sf dir so
  * the queries sharing a trained artifact don't each re-pay training;
  * ADVICE r7). Unlike persisted DataFrames, these survive
  * `spark.catalog.clearCache()`, so a bench that re-samples a training
  * query would measure its own memo: the sf10 leg recorded
  * q_bpe_merges at 0.098 s because the >4 s cold first sample tripped
  * median-of-3 and both re-samples hit the warm merge table (isolated
  * cost: 3.7 s).
  *
  * Memos register with their owning query-name PREFIX (ADVICE r9: an
  * unscoped clear wiped OTHER families' not-yet-consumed memos on
  * every >4 s re-sample, so a warm family member's re-samples could
  * silently re-pay another family's training). Bench clears only the
  * memos the resampled query owns; cross-query sharing within a fleet
  * run is otherwise untouched.
  */
object QueryMemos {

  private val memos = scala.collection.mutable.ArrayBuffer
    .empty[(String, java.util.concurrent.ConcurrentHashMap[String, _])]

  /** Register a training memo owned by every query whose name starts
    * with `ownerPrefix` (e.g. "q_bpe_", "q_domain_classifier_"). */
  private[queries] def register[M <: java.util.concurrent.ConcurrentHashMap[String, _]](
      ownerPrefix: String, m: M): M =
    synchronized { memos += ownerPrefix -> m; m }

  /** Drop the training artifacts OWNED by `queryName` (they rebuild
    * deterministically on next use); other families' memos survive. */
  def clearTraining(queryName: String): Unit = synchronized {
    memos.foreach { case (prefix, m) => if (queryName.startsWith(prefix)) m.clear() }
  }

  /** Drop every registered training artifact. */
  def clearTraining(): Unit = synchronized { memos.foreach(_._2.clear()) }
}
